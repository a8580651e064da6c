"""Shared neural-net building blocks (pytree-parameter style).

A dense layer is the dict {"w": (K, N), "b": optional (N,)} — or its
int8-quantized form {"q": int8 (K, N), "s": f32 (N,), "b": optional},
produced by ops.quant.quantize_model_params (the CTranslate2-equivalent
COMPUTE_TYPE=int8 scheme; reference README.md:178). ``dense`` dispatches on
the presence of "q" so every call site is quantization-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def dense(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """x (..., K) @ layer params -> (..., N), in x.dtype."""
    if "q" in p:
        from whisper_aries_tpu.ops.quant import quant_matmul

        y = quant_matmul(x, p["q"], p["s"])
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype))
    b = p.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layer_norm(p: Dict[str, Any], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in f32 (bf16-safe)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GeLU — matches torch.nn.GELU default used by HF Whisper."""
    return jax.nn.gelu(x, approximate=False)
