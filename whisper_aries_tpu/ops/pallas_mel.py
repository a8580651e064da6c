"""Fused Pallas log-mel front-end.

The north-star TPU design calls for the STFT+mel pipeline as one fused
kernel (BASELINE.json north_star: "the log-mel front-end (STFT + mel
filterbank on 30s windows) becomes a fused Pallas kernel"). Per grid step,
entirely in VMEM:

    DMA an audio slab from HBM (as rows of one hop = 160 samples)
    -> windowed DFT as THREE partial MXU matmuls (rows r, r+1, r+2 hold
       each frame's 480-sample span; the Hann*cos/-sin bank is split into
       three 160-row slabs, zero-padded past sample 400) — this avoids
       any in-kernel reshape/concat, which Mosaic's vector layouts reject
    -> power -> mel projection (fourth matmul) -> log10

so neither the framed tensor (B, 3000, 400) nor the spectrogram
(B, 3000, 201) ever exists in HBM — only the (B, 3000, n_mels) result.
The dynamic-range floor (global max - 8) and (x+4)/4 scaling need a global
reduction and stay in XLA (fused elementwise pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisper_aries_tpu.audio.mel import (
    HOP_LENGTH,
    N_FFT,
    mel_filterbank,
)

FRAME_BLOCK = 200  # frames per grid step (divisible by 8); 3000/200 = 15


@functools.lru_cache(maxsize=2)
def _filters(n_mels: int):
    n = np.arange(N_FFT, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))
    k = np.arange(N_FFT // 2 + 1, dtype=np.float64)
    phase = 2.0 * np.pi * k[:, None] * n[None, :] / N_FFT
    cos_f = (np.cos(phase) * window).astype(np.float32)
    sin_f = (-np.sin(phase) * window).astype(np.float32)
    dft = np.concatenate([cos_f.T, sin_f.T], axis=1)  # (400, 402)
    # audio rows are one hop (160 samples) padded to 256 lanes for Mosaic's
    # (8,128) tiling; build three 256-row DFT slabs to match — slab k holds
    # the window*DFT coefficients for samples [k*160, k*160+160) of the
    # frame in its first 160 rows and zeros elsewhere (so lane padding and
    # the samples beyond 400 contribute nothing)
    ROW = 256
    dft3 = np.zeros((3 * ROW, dft.shape[1]), np.float32)
    for kk in range(3):
        lo, hi = kk * HOP_LENGTH, min((kk + 1) * HOP_LENGTH, N_FFT)
        dft3[kk * ROW : kk * ROW + (hi - lo)] = dft[lo:hi]
    melw = mel_filterbank(n_mels).T.copy()  # (201, n_mels)
    return dft3, melw


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(audio: jax.Array, n_mels: int = 80,
                   interpret: bool = False) -> jax.Array:
    """audio (B, 480000) -> Whisper log-mel features (B, n_mels, 3000)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if audio.ndim == 1:
        audio = audio[None]
    B, n_samples = audio.shape
    n_frames = n_samples // HOP_LENGTH
    assert n_frames % FRAME_BLOCK == 0, n_frames
    pad = N_FFT // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    # lay audio out as rows of one hop, lane-padded to 256 (Mosaic tiling);
    # 8+ extra rows of tail room so every block can DMA an 8-aligned
    # (fb+8)-row slab
    x = jnp.pad(x, ((0, 0), (0, 9 * HOP_LENGTH)))
    n_rows = x.shape[1] // HOP_LENGTH
    ROW = 256
    rows = x[:, : n_rows * HOP_LENGTH].reshape(B, n_rows, HOP_LENGTH)
    x2d = jnp.pad(rows, ((0, 0), (0, 0), (0, ROW - HOP_LENGTH)))

    dft_np, melw_np = _filters(n_mels)
    dft = jnp.asarray(dft_np)  # (768, 402)
    melw = jnp.asarray(melw_np)  # (201, n_mels)

    fb = FRAME_BLOCK
    H = ROW

    def kernel(x_hbm, dft_ref, mel_ref, out_ref):
        # successive slabs overlap by one frame, which BlockSpec tiling can't
        # express — DMA the rows manually (guide: Async DMA).
        b = pl.program_id(0)
        i = pl.program_id(1)

        def body(scratch, sem):
            # slab row count (fb+8) and offset (i*fb, fb % 8 == 0) are both
            # 8-aligned as Mosaic's tiling requires
            dma = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(i * fb, fb + 8), :], scratch, sem
            )
            dma.start()
            dma.wait()
            # frame r spans rows r, r+1, r+2. Row-offset views like
            # scratch[1:fb+1] are sublane-unaligned; build the shifted views
            # with pltpu.roll instead (wraparound rows land beyond row fb and
            # are sliced away), keeping every slice 8-aligned at offset 0.
            # roll takes non-negative shifts: rolling down by n-1 rows is
            # the same as shifting up by one (rolled[i] = orig[i+1])
            nrows = fb + 8
            r1 = pltpu.roll(scratch[:], shift=nrows - 1, axis=0)
            r2 = pltpu.roll(scratch[:], shift=nrows - 2, axis=0)
            spec = jnp.dot(scratch[0:fb], dft_ref[0:H],
                           preferred_element_type=jnp.float32)
            spec += jnp.dot(r1[0:fb], dft_ref[H : 2 * H],
                            preferred_element_type=jnp.float32)
            spec += jnp.dot(r2[0:fb], dft_ref[2 * H : 3 * H],
                            preferred_element_type=jnp.float32)
            nf = N_FFT // 2 + 1
            power = spec[:, :nf] ** 2 + spec[:, nf:] ** 2  # (fb, 201)
            mels = jnp.dot(power, mel_ref[:],
                           preferred_element_type=jnp.float32)
            out_ref[0] = jnp.log(jnp.maximum(mels, 1e-10)) * np.float32(
                1.0 / np.log(10.0)
            )

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((fb + 8, ROW), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    n_blocks = n_frames // fb
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # audio rows stay in HBM
            pl.BlockSpec((3 * H, 2 * (N_FFT // 2 + 1)), lambda b, i: (0, 0)),
            pl.BlockSpec((N_FFT // 2 + 1, n_mels), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, fb, n_mels), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x2d, dft, melw)
    log_spec = jnp.swapaxes(out, 1, 2)  # (B, n_mels, n_frames)
    gmax = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    return (log_spec + 4.0) / 4.0
