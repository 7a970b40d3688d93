from turkish_asr_tpu.native.loader import (
    get_lib,
    native_available,
    wav_decode_native,
    resample_native,
    levenshtein_native,
)

__all__ = [
    "get_lib",
    "native_available",
    "wav_decode_native",
    "resample_native",
    "levenshtein_native",
]
