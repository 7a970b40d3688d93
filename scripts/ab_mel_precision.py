"""Is the fp32-'highest' mel front-end a headline-inference lever?

audio/features.py runs its two STFT/mel matmuls at precision='highest'
(bf16_6x) for torchaudio-oracle parity. At the headline config
(B=128 x 8 s greedy) measure: (a) the mel stage alone vs the whole
pipeline; (b) the mel stage at precision='high' (bf16_3x) — if the stage
is a material slice AND 'high' is materially faster, a documented
inference-only precision knob could be worth its parity risk; otherwise
record the dead end.

Timing per AGENTS.md: chained scan iterations, fetch-sync.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import _flagship, _make_pipeline, _waves, BATCH, SECONDS, \
    _chained_timer
from turkish_asr_tpu.audio import features
from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.ops.flash_attention import make_flash_attention


def timeit(label, fn, pstate, w, n, iters=8):
    sec = _chained_timer(fn, pstate, w, n, iters)
    rtfx = BATCH * SECONDS / sec
    print(f"{label:22s} {sec * 1e3:8.2f} ms/iter  {rtfx:10.1f} RTFx",
          flush=True)
    return sec


def main():
    cfg, params, state = _flagship()
    w, n = _waves(BATCH, SECONDS)

    full = _make_pipeline(cfg, make_flash_attention())
    t_full = timeit("full greedy pipeline", full, (params, state), w, n)

    def mel_only(pstate, waveforms, wav_lengths):
        feats, fl = log_mel_spectrogram(waveforms, wav_lengths,
                                        n_mels=cfg.n_mels)
        return feats, fl

    t_mel = timeit("mel stage (highest)", mel_only, (params, state), w, n)

    # Patch the module-level precision the two front-end matmuls use
    # (jax.clear_caches: mel_only is re-traced, not replayed).
    orig = features._STFT_PRECISION
    try:
        features._STFT_PRECISION = "high"
        jax.clear_caches()
        t_high = timeit("mel stage (high)", mel_only, (params, state), w, n)
    finally:
        features._STFT_PRECISION = orig

    print(f"mel share of pipeline: {100 * t_mel / t_full:.1f}%  "
          f"(high saves {1e3 * (t_mel - t_high):.2f} ms/iter -> "
          f"{100 * (t_mel - t_high) / t_full:.1f}% of the headline)",
          flush=True)


if __name__ == "__main__":
    main()
