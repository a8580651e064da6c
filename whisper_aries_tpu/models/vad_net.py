"""Learned voice-activity detector (Silero-VAD replacement).

The reference runs Silero VAD through faster-whisper's ONNX session
(reference requirements.txt:37, vad_filter=True at
final_optimized_transcriber.py:440). This is the JAX-native equivalent with
the same contract as vad/energy.py: one speech probability per 512-sample
(32 ms) frame at 16 kHz, so the downstream segment state machine
(vad/segments.py) is scorer-agnostic.

Architecture (matches the shipped weights/vad.safetensors layout):
  * stem — three strided 1-D convs (stride 8 each: 8^3 = 512 samples/frame),
    kernel 15, channels 1 -> 16 -> 32 -> 64, on RMS-normalised waveform;
  * ctx — three dilated (1, 2, 4) kernel-3 residual convs at frame rate for
    ±multi-frame temporal context;
  * head — per-frame logistic regression on the 64-d frame features.

Weights are trained in-repo on the synthetic formant-speech corpus
(training/diarize_train.py::train_vad; zero-egress), shipped at
whisper_aries_tpu/weights/vad.safetensors, and gated by
tests/test_training.py::test_shipped_vad_weights_beat_energy_scorer.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

FRAME = 512  # samples per probability frame (Silero v4 hop)
# Absolute silence gate for the (level-invariant) learned scorer: frames
# quieter than this RMS (~-56 dBFS) are never speech.
SILENCE_RMS_FLOOR = 1.5e-3


@dataclass(frozen=True)
class VadDims:
    stem_channels: Tuple[int, int, int] = (16, 32, 64)
    stem_kernel: int = 15
    stem_stride: int = 8
    ctx_layers: int = 3
    ctx_kernel: int = 3
    hidden: int = 64


def init_vad(dims: VadDims = VadDims(), key=None) -> Dict[str, Any]:
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, dims.ctx_layers + 4)
    stem = []
    c_in = 1
    for i, c_out in enumerate(dims.stem_channels):
        w = 0.2 * jax.random.normal(ks[i], (c_out, c_in, dims.stem_kernel))
        stem.append({"w": w.astype(np.float32),
                     "b": np.zeros((c_out,), np.float32)})
        c_in = c_out
    ctx = []
    h = dims.hidden
    for i in range(dims.ctx_layers):
        w = 0.1 * jax.random.normal(ks[3 + i], (h, h, dims.ctx_kernel))
        ctx.append({"w": w.astype(np.float32),
                    "b": np.zeros((h,), np.float32)})
    head = {
        "w": (0.1 * jax.random.normal(ks[-1], (h, 1))).astype(np.float32),
        "b": np.zeros((1,), np.float32),
    }
    return {"stem": stem, "ctx": ctx, "head": head}


def _conv1d(x, p, stride: int = 1, dilation: int = 1):
    """x (B, C_in, T) conv with torch-layout weights (C_out, C_in, K), SAME."""
    import jax
    import jax.numpy as jnp

    w = jnp.asarray(p["w"])
    k = w.shape[2]
    span = (k - 1) * dilation
    pad = (span // 2, span - span // 2)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + jnp.asarray(p["b"])[None, :, None]


def vad_forward(params: Dict[str, Any], audio, dims: Optional[VadDims] = None,
                valid_len=None):
    """audio (B, T) or (T,) float32 -> speech probabilities (B, T // 512).

    The waveform is RMS-normalised per example (robust to recording level;
    the classifier learns spectral/temporal structure, not absolute
    energy), striding 512x down through the stem, then classified per frame.

    ``valid_len`` ((B,) int, optional): number of REAL samples per example
    when the tail is zero-padded to a fixed chunk shape. The RMS is then
    computed over the real samples only — zeros contribute nothing to the
    sum, so dividing by the padded length would over-amplify a short tail
    (e.g. 2 s of audio in a 19.2 s chunk gets ~3x extra gain) and skew the
    tail-frame probabilities vs training-shaped input.
    """
    import jax
    import jax.numpy as jnp

    dims = dims or VadDims()
    x = jnp.asarray(audio, jnp.float32)
    if x.ndim == 1:
        x = x[None]
    T = (x.shape[1] // FRAME) * FRAME
    x = x[:, :T]
    denom = (jnp.minimum(jnp.asarray(valid_len, jnp.float32), T)[:, None]
             if valid_len is not None
             else jnp.float32(T))
    rms = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)
                   / jnp.maximum(denom, 1.0))
    x = x / jnp.maximum(rms, 1e-3)
    h = x[:, None, :]  # (B, 1, T)
    for p in params["stem"]:
        h = jax.nn.relu(_conv1d(h, p, stride=dims.stem_stride))
    for i, p in enumerate(params["ctx"]):
        h = h + jax.nn.relu(_conv1d(h, p, dilation=2 ** i))
    feats = h.transpose(0, 2, 1)  # (B, F, hidden)
    logit = jnp.dot(feats, jnp.asarray(params["head"]["w"])) \
        + jnp.asarray(params["head"]["b"])
    return jax.nn.sigmoid(logit[..., 0])


#: chunk shape for the engine-facing scorer — fixed so arbitrary-length
#: files reuse ONE compiled program (40-90 s per fresh jit on the TPU tunnel)
_CHUNK_FRAMES = 600          # 19.2 s
_CHUNK = _CHUNK_FRAMES * FRAME


def make_nn_speech_scorer(params: Dict[str, Any],
                          dims: Optional[VadDims] = None):
    """Adapter with the vad/energy.py::get_speech_probs contract:
    fn(mono float32 numpy audio) -> (n_frames,) float32 numpy probabilities.

    Long files are scored in fixed 19.2 s chunks batched per call, so every
    invocation hits the same compiled shape."""
    import jax
    import jax.numpy as jnp

    dims = dims or VadDims()
    fwd = jax.jit(lambda a, v: vad_forward(params, a, dims, valid_len=v))

    def scorer(audio: np.ndarray) -> np.ndarray:
        a = np.asarray(audio, np.float32)
        n_frames = len(a) // FRAME
        if n_frames == 0:
            return np.zeros((0,), np.float32)
        a = a[: n_frames * FRAME]
        n_chunks = int(np.ceil(len(a) / _CHUNK))
        padded = np.zeros((n_chunks * _CHUNK,), np.float32)
        padded[: len(a)] = a
        # the final chunk is zero-padded: pass each chunk's real-sample
        # count so RMS normalisation ignores the padding
        valid = np.full((n_chunks,), _CHUNK, np.int32)
        if n_chunks:
            valid[-1] = len(a) - (n_chunks - 1) * _CHUNK
        probs = np.asarray(fwd(jnp.asarray(padded.reshape(n_chunks, _CHUNK)),
                               jnp.asarray(valid)))
        probs = probs.reshape(-1)[:n_frames].astype(np.float32)
        # The net is level-invariant (per-chunk RMS normalisation), so a
        # digitally-silent/noise-floor file is out of distribution — gate
        # with an absolute per-frame floor (~-56 dBFS; Silero similarly
        # never fires on near-digital silence).
        frame_rms = np.sqrt(
            (a.reshape(n_frames, FRAME).astype(np.float64) ** 2).mean(axis=1)
        ).astype(np.float32)
        return np.where(frame_rms > SILENCE_RMS_FLOOR, probs, 0.0)

    return scorer


def load_vad_params(path) -> Optional[Dict[str, Any]]:
    """Load vad.safetensors from a file or directory; None when absent."""
    from whisper_aries_tpu.utils.params_io import load_params_into

    p = Path(path)
    if p.is_dir():
        p = p / "vad.safetensors"
    if not p.exists():
        return None
    try:
        return load_params_into(init_vad(), str(p))
    except Exception:
        return None
