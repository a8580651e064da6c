"""Speaker segmentation + embedding nets (pyannote-3.1 replacement).

The reference loads pyannote/speaker-diarization-3.1 — a trained local
segmentation model (powerset multi-speaker activity over 10 s windows) plus
a speaker-embedding model feeding agglomerative clustering
(conversation_transcriber.py:85-98). These are the JAX-native equivalents,
trained in-repo on the synthetic formant-speech corpus
(training/diarize_train.py; zero-egress) and shipped in
whisper_aries_tpu/weights/.

  * ``SegmentationNet``: log-mel (B, 80, F) -> per-20 ms-frame log-probs over
    the 7 powerset classes of <=2 simultaneously-active local speakers
    (pyannote 3.1's output space). Conv stem (stride 2) + sinusoidal
    positions + 3 pre-LN transformer blocks.
  * ``EmbeddingNet``: log-mel of a 2 s crop -> L2-normalised 192-d speaker
    vector (x-vector-style: conv frame features + attentive stats pooling),
    GE2E-trained.
  * ``melstats_embedding``: the classical long-term-mel-statistics fallback
    used when no checkpoint ships (diarize/pipeline.py "classical" mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

#: the 7 powerset classes over 3 local speakers with <=2 active
#: (pyannote 3.1's constraint): index -> active-speaker tuple
POWERSET: Tuple[Tuple[int, ...], ...] = (
    (), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
)


@dataclass(frozen=True)
class SegDims:
    n_mels: int = 80
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 3
    ffn: int = 512
    n_classes: int = len(POWERSET)


@dataclass(frozen=True)
class EmbDims:
    n_mels: int = 80
    channels: Tuple[int, int, int] = (64, 128, 256)
    kernel: int = 3
    emb_dim: int = 192


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------


def init_segmentation(dims: SegDims = SegDims(), key=None) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    if key is None:
        key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 10)
    d, L = dims.d_model, dims.n_layers

    def dense_i(k, k_in, n_out, layers, bias=True, scale=0.05):
        p = {"w": (scale * jax.random.normal(k, (layers, k_in, n_out))
                   ).astype(jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((layers, n_out), jnp.float32)
        return p

    def ln_i(layers):
        return {"scale": jnp.ones((layers, d), jnp.float32),
                "bias": jnp.zeros((layers, d), jnp.float32)}

    return {
        "conv1": {"w": (0.1 * jax.random.normal(
            ks[0], (d, dims.n_mels, 3))).astype(jnp.float32),
            "b": jnp.zeros((d,), jnp.float32)},
        "conv2": {"w": (0.1 * jax.random.normal(
            ks[1], (d, d, 3))).astype(jnp.float32),
            "b": jnp.zeros((d,), jnp.float32)},
        "blocks": {
            "ln1": ln_i(L),
            "attn": {
                "q": dense_i(ks[2], d, d, L),
                "k": dense_i(ks[3], d, d, L, bias=False),
                "v": dense_i(ks[4], d, d, L),
                "o": dense_i(ks[5], d, d, L),
            },
            "ln2": ln_i(L),
            "mlp": {
                "fc1": dense_i(ks[6], d, dims.ffn, L),
                "fc2": dense_i(ks[7], dims.ffn, d, L),
            },
        },
        "ln_out": {"scale": jnp.ones((d,), jnp.float32),
                   "bias": jnp.zeros((d,), jnp.float32)},
        "head": {"w": (0.05 * jax.random.normal(
            ks[8], (d, dims.n_classes))).astype(jnp.float32),
            "b": jnp.zeros((dims.n_classes,), jnp.float32)},
    }


def segmentation_forward(params: Dict[str, Any], mel,
                         dims: SegDims = SegDims()):
    """log-mel (B, n_mels, F) -> per-frame class LOG-probs (B, F//2, 7)."""
    import jax
    import jax.numpy as jnp

    from whisper_aries_tpu.models.whisper import (
        _attention_xla,
        _conv1d_shifted,
        _merge_heads,
        _split_heads,
        sinusoids,
    )
    from whisper_aries_tpu.models.layers import dense, gelu, layer_norm

    x = jnp.asarray(mel, jnp.float32).transpose(0, 2, 1)  # (B, F, n_mels)
    x = gelu(_conv1d_shifted(params["conv1"], x, stride=1))
    x = gelu(_conv1d_shifted(params["conv2"], x, stride=2))
    x = x + jnp.asarray(sinusoids(x.shape[1], dims.d_model))

    def block(x, p):
        h = layer_norm(p["ln1"], x)
        q = _split_heads(dense(p["attn"]["q"], h), dims.n_heads)
        k = _split_heads(dense(p["attn"]["k"], h), dims.n_heads)
        v = _split_heads(dense(p["attn"]["v"], h), dims.n_heads)
        x = x + dense(p["attn"]["o"], _merge_heads(_attention_xla(q, k, v)))
        h = layer_norm(p["ln2"], x)
        x = x + dense(p["mlp"]["fc2"], gelu(dense(p["mlp"]["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = layer_norm(params["ln_out"], x)
    return jax.nn.log_softmax(dense(params["head"], x), axis=-1)


def powerset_to_multilabel(logp) -> np.ndarray:
    """(B, F, 7) class log-probs -> (B, F, 3) per-speaker activity probs:
    each speaker's probability is the summed probability of the powerset
    classes that contain it (pyannote 3.1's powerset-to-multilabel map)."""
    probs = np.exp(np.asarray(logp))
    members = np.zeros((len(POWERSET), 3), np.float32)
    for ci, ms in enumerate(POWERSET):
        for m in ms:
            members[ci, m] = 1.0
    return probs @ members


def powerset_decode(logp, marginal_floor: float = 0.4) -> np.ndarray:
    """(..., 7) class log-probs -> (..., 3) BINARY per-speaker activity.

    Hard argmax over the powerset classes (pyannote 3.1's decoding rule:
    the winning class's members are active), UNIONed with the summed
    marginal probability exceeding ``marginal_floor`` — recall insurance
    for frames where the net splits mass across several classes sharing
    a speaker yet the empty class narrowly wins the argmax."""
    logp = np.asarray(logp)
    members = np.zeros((len(POWERSET), 3), np.float32)
    for ci, ms in enumerate(POWERSET):
        for m in ms:
            members[ci, m] = 1.0
    cls = np.argmax(logp, axis=-1)
    hard = members[cls]
    marginals = np.exp(logp) @ members
    return np.maximum(hard, (marginals > marginal_floor).astype(np.float32))


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def init_embedding(dims: EmbDims = EmbDims(), key=None) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    if key is None:
        key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 6)
    convs = []
    c_in = dims.n_mels
    for i, c_out in enumerate(dims.channels):
        convs.append({
            "w": (0.1 * jax.random.normal(
                ks[i], (c_out, c_in, dims.kernel))).astype(jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32),
        })
        c_in = c_out
    c = dims.channels[-1]
    return {
        "convs": convs,
        "proj": {"w": (0.1 * jax.random.normal(ks[3], (c, c))
                       ).astype(jnp.float32),
                 "b": jnp.zeros((c,), jnp.float32)},
        "att": {"w": (0.1 * jax.random.normal(ks[4], (c, 1))
                      ).astype(jnp.float32),
                "b": jnp.zeros((1,), jnp.float32)},
        "emb": {"w": (0.1 * jax.random.normal(ks[5], (2 * c, dims.emb_dim))
                      ).astype(jnp.float32),
                "b": jnp.zeros((dims.emb_dim,), jnp.float32)},
    }


def embedding_forward(params: Dict[str, Any], mel,
                      dims: Optional[EmbDims] = None):
    """log-mel (B, n_mels, T) -> L2-normalised speaker vectors (B, 192).

    Conv frame encoder (strides 2, 2, 1) + attentive statistics pooling
    (attention-weighted mean ++ std) + linear projection — the x-vector
    recipe pyannote's embedding models follow."""
    import jax
    import jax.numpy as jnp

    from whisper_aries_tpu.models.layers import dense, gelu
    from whisper_aries_tpu.models.whisper import _conv1d_shifted

    dims = dims or EmbDims()
    x = jnp.asarray(mel, jnp.float32).transpose(0, 2, 1)  # (B, T, n_mels)
    for i, p in enumerate(params["convs"]):
        x = gelu(_conv1d_shifted(p, x, stride=2 if i < 2 else 1))
    g = jnp.tanh(dense(params["proj"], x))          # (B, T', C)
    scores = dense(params["att"], g)                # (B, T', 1)
    a = jax.nn.softmax(scores, axis=1)
    mu = jnp.sum(a * x, axis=1)                     # (B, C)
    ex2 = jnp.sum(a * x * x, axis=1)
    sd = jnp.sqrt(jax.nn.relu(ex2 - mu * mu) + 1e-6)
    emb = dense(params["emb"], jnp.concatenate([mu, sd], axis=-1))
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def melstats_embedding(mel: np.ndarray) -> np.ndarray:
    """Classical fallback speaker signature: long-term log-mel statistics.

    (B, n_mels, T) -> (B, 2*n_mels) L2-normalised [mean ++ std] — no
    learned weights, used when no embedding checkpoint ships
    (diarize/pipeline.py classical mode)."""
    m = np.asarray(mel, np.float32)
    mu = m.mean(axis=2)
    sd = m.std(axis=2)
    emb = np.concatenate([mu, sd], axis=1)
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    return emb / np.maximum(norm, 1e-8)
