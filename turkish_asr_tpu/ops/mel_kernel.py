"""Pallas fused log-mel front-end kernel.

Fuses framing + windowed-DFT matmul + power + mel-filterbank matmul +
log10 into one VMEM-resident pass per frame tile (the jnp path
materializes the (B, T, n_fft) frame tensor in HBM and makes several
elementwise passes over (B, T, n_bins)-sized intermediates).

Tiling: grid (B, T_tiles); frame tiles overlap in the waveform, so the
hop-reshaped waveform stays in HBM (memory_space=ANY) and each program
DMAs its own overlapping hop-span into VMEM scratch (async copy + wait).

Mosaic layout constraints shape the design:
- VMEM cannot reshape across the lane dim -> the (B, hops, lane) reshape
  happens on the host side.
- HBM->VMEM DMA lane extents must be 128-aligned -> each hop row is padded
  from hop (160) to LANE (256) samples.
- concat/lane-slices of misaligned offsets are unsupported -> the frame
  concat is decomposed into per-chunk matmuls against row-bands of a
  zero-padded DFT matrix (the pad rows multiply zeros and contribute
  nothing), so the kernel contains only aligned full-lane ops.

The surrounding dB-clamp + CMVN stages need per-utterance global
reductions and stay in jnp (one cheap fused XLA pass).

Used by audio/features.py when enabled; the jnp path remains the
always-available fallback and oracle (parity tested).
"""

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 256  # hop rows padded to this many samples (128-aligned, >= n_fft-2*hop remainder handling)


@lru_cache(maxsize=4)
def _padded_dft(n_fft, win_length, hop):
    """DFT matrix rearranged into ceil(n_fft/hop) LANE-row bands.

    Band c rows [0:hop] hold M[c*hop:(c+1)*hop] (the last band holds the
    remainder rows); rows [hop:LANE] are zero, matching the zero lane
    padding of the hop-reshaped waveform.
    """
    from turkish_asr_tpu.audio.features import _windowed_dft_matrix
    M = _windowed_dft_matrix(n_fft, win_length)          # (n_fft, 2*n_bins)
    n_chunks = -(-n_fft // hop)
    out = np.zeros((n_chunks * LANE, M.shape[1]), dtype=np.float32)
    for c in range(n_chunks):
        rows = M[c * hop:min((c + 1) * hop, n_fft)]
        out[c * LANE:c * LANE + rows.shape[0]] = rows
    return out


def _kernel(wh_hbm, dft_ref, fb_ref, out_ref, scratch, sem, *,
            block_t, n_fft, hop, n_bins, n_mels, span_hops):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start_hop = t * block_t

    dma = pltpu.make_async_copy(
        wh_hbm.at[b, pl.ds(start_hop, span_hops), :], scratch, sem)
    dma.start()
    dma.wait()

    wh = scratch[:]                                     # (span_hops, LANE)
    n_chunks = -(-n_fft // hop)

    def band_dot(piece, c):
        return jax.lax.dot_general(
            piece, dft_ref[c * LANE:(c + 1) * LANE, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    spec = band_dot(wh[0:block_t], 0)
    for c in range(1, n_chunks):
        spec = spec + band_dot(wh[c:block_t + c], c)
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    mel = jax.lax.dot_general(
        power, fb_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    out_ref[0] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_frames", "n_fft", "hop",
                                             "n_mels", "win_length",
                                             "block_t"))
def fused_log_mel(padded_waveform, *, n_frames, n_fft=400, hop=160,
                  win_length=400, n_mels=80, fb=None, block_t=256):
    """(B, P) reflect-padded waveform -> (B, n_frames, n_mels) raw log-mel
    (before top_db clamp and CMVN). P must cover the last tile's hop span;
    the caller pads (see audio/features.py).
    """
    B, P = padded_waveform.shape
    n_bins = n_fft // 2 + 1
    tiles = pl.cdiv(n_frames, block_t)
    n_chunks = -(-n_fft // hop)
    span_hops = -(-(block_t + n_chunks) // 8) * 8  # 8-aligned sublanes
    needed_hops = (tiles - 1) * block_t + span_hops
    total_hops = P // hop
    assert total_hops >= needed_hops, (
        f"padded waveform too short: {total_hops} hops < {needed_hops}")

    # Host-side hop reshape with zero lane padding to LANE samples.
    wh = padded_waveform[:, :total_hops * hop].reshape(B, total_hops, hop)
    wh = jnp.pad(wh, ((0, 0), (0, 0), (0, LANE - hop)))

    dft = jnp.asarray(_padded_dft(n_fft, win_length, hop))

    grid = (B, tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t, n_fft=n_fft, hop=hop,
                          n_bins=n_bins, n_mels=n_mels, span_hops=span_hops),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # whole wh in HBM
            pl.BlockSpec((n_chunks * LANE, 2 * n_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, n_mels), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, tiles * block_t, n_mels),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span_hops, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(wh, dft, fb)
    return out[:, :n_frames]
