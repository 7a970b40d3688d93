"""ctypes bindings for the native host-side ops (no pybind11 needed).

Builds libasr_native.so from src/asr_native.cpp on first use (g++ -O3),
caches it next to the source, and degrades gracefully to the pure-numpy
implementations when no compiler is available (``native_available()`` ->
False). Opt out with TASR_NATIVE=0.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "asr_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libasr_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded CDLL, or None when native is unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("TASR_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.wav_decode.restype = ctypes.c_int
        lib.wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.resample_f32.restype = ctypes.c_int64
        lib.resample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double]
        lib.levenshtein_i32.restype = ctypes.c_int64
        lib.levenshtein_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        _lib = lib
        return _lib


def native_available():
    return get_lib() is not None


def wav_decode_native(data):
    """bytes -> (float32 (channels, samples), sample_rate) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n_samples = ctypes.c_int64()
    n_channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.wav_decode(data, len(data), None,
                        ctypes.byref(n_samples), ctypes.byref(n_channels),
                        ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"Native WAV decode failed (code {rc})")
    out = np.empty((n_channels.value, n_samples.value), dtype=np.float32)
    rc = lib.wav_decode(data, len(data),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ctypes.byref(n_samples), ctypes.byref(n_channels),
                        ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"Native WAV decode failed (code {rc})")
    return out, rate.value


def flac_decode_native(data):
    """FLAC bytes -> (float32 (channels, samples), sample_rate) or None.

    Returns None when the native lib is unavailable OR the stream needs
    the Python fallback (unknown total_samples, rc=-5); raises ValueError
    for malformed streams (callers fall through to the Python oracle,
    which produces the descriptive error)."""
    lib = get_lib()
    if lib is None:
        return None
    n_samples = ctypes.c_int64()
    n_channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.flac_decode(data, len(data), None,
                         ctypes.byref(n_samples), ctypes.byref(n_channels),
                         ctypes.byref(rate))
    if rc == -5:
        return None  # unknown stream length: Python decoder counts frames
    if rc != 0:
        raise ValueError(f"Native FLAC decode failed (code {rc})")
    out = np.empty((n_channels.value, n_samples.value), dtype=np.float32)
    rc = lib.flac_decode(data, len(data),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         ctypes.byref(n_samples), ctypes.byref(n_channels),
                         ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"Native FLAC decode failed (code {rc})")
    return out, rate.value


def resample_native(waveform, orig_freq, new_freq,
                    lowpass_filter_width=6, rolloff=0.99):
    """float32 (samples,) -> resampled float32, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import math
    x = np.ascontiguousarray(waveform, dtype=np.float32)
    g = math.gcd(int(orig_freq), int(new_freq))
    target = math.ceil((new_freq // g) * len(x) / (orig_freq // g))
    out = np.empty(max(target, 1), dtype=np.float32)
    produced = lib.resample_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(orig_freq), int(new_freq), int(lowpass_filter_width),
        float(rolloff))
    return out[:produced]


def levenshtein_native(a, b):
    """Edit distance between two int32 sequences, or None."""
    lib = get_lib()
    if lib is None:
        return None
    aa = np.ascontiguousarray(a, dtype=np.int32)
    bb = np.ascontiguousarray(b, dtype=np.int32)
    return int(lib.levenshtein_i32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb)))
