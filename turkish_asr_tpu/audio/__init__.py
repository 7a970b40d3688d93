from turkish_asr_tpu.audio.wavio import load_audio, read_wav, write_wav, resample
from turkish_asr_tpu.audio.features import (
    AudioPreprocessor,
    mel_filterbank,
    log_mel_spectrogram,
    TARGET_SAMPLE_RATE,
)
from turkish_asr_tpu.audio.augment import SpecAugment, SpeedPerturbation, NoisePerturbation

__all__ = [
    "load_audio",
    "read_wav",
    "write_wav",
    "resample",
    "AudioPreprocessor",
    "mel_filterbank",
    "log_mel_spectrogram",
    "TARGET_SAMPLE_RATE",
    "SpecAugment",
    "SpeedPerturbation",
    "NoisePerturbation",
]
