"""Native C++ ops vs numpy/Python oracles."""

import numpy as np
import pytest

from turkish_asr_tpu.native.loader import (
    native_available, wav_decode_native, resample_native, levenshtein_native)


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def test_wav_decode_matches_numpy(tmp_path):
    import os
    os.environ["TASR_NATIVE"] = "0"
    try:
        from turkish_asr_tpu.audio.wavio import write_wav, read_wav
        sr = 16000
        rng = np.random.default_rng(0)
        x = np.stack([rng.standard_normal(4000), rng.standard_normal(4000)]) \
            .astype(np.float32) * 0.3
        p = str(tmp_path / "st.wav")
        write_wav(p, x, sr)
        want, sr_w = read_wav(p)  # numpy path (TASR_NATIVE=0 at loader call)
    finally:
        os.environ.pop("TASR_NATIVE")
    with open(p, "rb") as f:
        data = f.read()
    got, sr_g = wav_decode_native(data)
    assert sr_g == sr_w
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode_native(b"RIFFxxxxWAVEgarbage-but-no-chunks")


def test_resample_matches_numpy():
    from turkish_asr_tpu.audio.wavio import _resample_kernel
    import math
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(10000) * 0.2).astype(np.float32)
    for orig, new in [(8000, 16000), (22050, 16000), (48000, 16000)]:
        got = resample_native(x, orig, new)
        # numpy oracle (direct, no native dispatch)
        g = math.gcd(orig, new)
        o, n = orig // g, new // g
        kernels, width = _resample_kernel(o, n)
        target = math.ceil(n * len(x) / o)
        padded = np.pad(x, (width, width + o))
        K = kernels.shape[1]
        hops = (padded.shape[0] - K) // o + 1
        idx = np.arange(hops)[:, None] * o + np.arange(K)[None, :]
        want = np.einsum("hk,nk->hn", padded[idx], kernels).reshape(-1)[:target]
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_levenshtein_matches_python():
    from turkish_asr_tpu.utils.metrics import _edit_distance
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        got = levenshtein_native(a, b)
        # pure-Python oracle
        import os
        os.environ["TASR_NATIVE"] = "0"
        try:
            from turkish_asr_tpu.native import loader
            want = _py_lev(a, b)
        finally:
            os.environ.pop("TASR_NATIVE")
        assert got == want


def _py_lev(a, b):
    n, m = len(a), len(b)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        curr = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return prev[m]
