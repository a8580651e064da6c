"""int8 weight quantization (CTranslate2-equivalent compute path).

The reference's entire int8 story lives inside CTranslate2 (reference
requirements.txt:9, COMPUTE_TYPE=int8 at README.md:178): per-output-channel
symmetric scales over the weight matrix, dequantised on the fly inside the
GEMM. This module reproduces that scheme for the JAX model:

  * ``quantize_int8`` — per-column (output-channel) absmax scaling to int8,
  * ``quant_matmul`` — activation(bf16/f32) x int8-weight matmul that
    dequantises tile-by-tile inside a Pallas kernel on TPU (halving the
    HBM weight traffic that bounds autoregressive decode) with an XLA
    fallback elsewhere,
  * ``quantize_model_params`` — walks a Whisper param tree and converts
    every transformer dense layer; layer norms, conv stems, embeddings and
    biases stay bf16/f32 (as CTranslate2 does).

A quantized dense layer is the pytree {"q": int8 (K, N), "s": f32 (N,),
"b": optional bias}; ``models.layers.dense`` dispatches on the presence of
"q".
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w: jax.Array | np.ndarray) -> Tuple[jax.Array, jax.Array]:
    """(..., K, N) float weights -> (int8 values (..., K, N), f32 scales
    (..., N)). Symmetric per-output-channel absmax scaling (CTranslate2's
    scheme); leading dims (e.g. the stacked-layer axis) are preserved.
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(w / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int8(q: jax.Array, scale: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: x (M, K) @ dequant(wq (K, N)) -> (M, N)
# ---------------------------------------------------------------------------

def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quant_matmul_pallas(x: jax.Array, q: jax.Array, s: jax.Array,
                         block_m: int = 256, block_n: int = 256,
                         block_k: int = 512,
                         interpret: bool = False) -> jax.Array:
    """TPU kernel: per-tile int8->f32 dequant fused into the MXU matmul.

    Grid is (M tiles, N tiles, K tiles) with K innermost; each k step
    accumulates one K-slab into the f32 output block, so the int8 weights
    are read from HBM exactly once at half the bandwidth of bf16 weights.
    M is tiled too (the encoder feeds M ~ batch x 1500 rows; an untiled M
    would blow the ~128 MB VMEM budget).
    """
    from jax.experimental import pallas as pl

    M, K = x.shape
    K2, N = q.shape
    assert K == K2
    # pad to hardware-friendly tiles; shrink the M tile for small inputs
    # (decode steps have M = batch x beam ~ tens of rows)
    bm = min(block_m, _pad_to(max(M, 8), 8))
    Mp = _pad_to(max(M, 8), bm)
    Kp = _pad_to(K, block_k)
    Np = _pad_to(N, block_n)
    xp = jnp.zeros((Mp, Kp), x.dtype).at[:M, :K].set(x)
    qp = jnp.zeros((Kp, Np), jnp.int8).at[:K, :N].set(q)
    sp = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(s)

    def kernel(x_ref, q_ref, s_ref, out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # dequant to bf16: the MXU runs bf16 x bf16 -> f32 at full rate
        # (an f32 matmul here would be ~8x slower and negate the win)
        w = (q_ref[:].astype(jnp.float32) * s_ref[0, :][None, :]).astype(
            jnp.bfloat16
        )
        out_ref[:] += jnp.dot(
            x_ref[:].astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )

    grid = (Mp // bm, Np // block_n, Kp // block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, k: (i, j)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, qp, sp)
    return out[:M, :N]


def _quant_matmul_xla(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    w = q.astype(x.dtype) * s.astype(x.dtype)[None, :]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _quant_matmul_outscale(x: jax.Array, q: jax.Array,
                           s: jax.Array) -> jax.Array:
    """Dequant moved to the OUTPUT side: per-output-channel scales commute
    with the contraction, ``x @ (q * s[None, :]) == (x @ q) * s[None, :]``,
    so the scale multiply touches the (M, N) result instead of the (K, N)
    weight — ~K/M times less dequant work at decode shapes (M = batch x
    beam ~ 1e2 rows, K = 1280..5120), and XLA fuses it into the dot's
    f32 epilogue next to the bias add instead of emitting a separate
    (K, N)-sized convert+multiply (the op-count tax that made int8 SLOWER
    than bf16 in the round-2 bench, ROADMAP "int8 weights 127.7x vs
    155x").

    Numerics are BETTER than weight-side dequant: int8 values in
    [-127, 127] are exact in bf16 (8 mantissa bits), so the bf16 GEMM sees
    the unrounded quantized weight, and the scale is applied in f32 —
    weight-side dequant rounds q*s to bf16 first.
    """
    y = jnp.dot(x.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return y * s[None, :]


def _quant_matmul_int8io(x: jax.Array, q: jax.Array, s: jax.Array
                         ) -> jax.Array:
    """True int8 MXU path: dynamic per-row activation quantization, then a
    native s8 x s8 -> s32 dot_general (2x the bf16 MXU rate on v5e) and a
    per-row x per-column rescale. This is CTranslate2's int8 GEMM scheme
    (per-channel weight scales, per-row dynamic activation scales), so the
    accuracy contract matches the reference's COMPUTE_TYPE=int8.
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (M, 1)
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx * s[None, :]


@functools.partial(jax.jit, static_argnames=())
def quant_matmul(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """(..., K) @ int8 (K, N) with per-N scales -> (..., K->N) in x.dtype.

    Implementations, selectable via ARIES_QUANT_IMPL:
      * "outscale" (default): bf16 x int8-as-bf16 GEMM with the per-channel
        scale applied to the OUTPUT (scales commute with the contraction) —
        fewest ops, best numerics; the dequant fuses into the dot epilogue.
      * "pallas" (TPU): fused per-tile dequant-to-bf16 kernel (bf16 MXU
        rate, half weight bandwidth; exact bf16 activation numerics).
      * "native": s8 x s8 -> s32 dot_general with dynamic per-row activation
        quantization — CTranslate2's exact GEMM scheme and nominally 2x the
        MXU rate, but XLA's current TPU lowering measured far slower end to
        end; kept for numerics comparison and future XLA versions.
      * "xla": weight-side dequantized matmul (reference/debug).
    """
    import os

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    impl = os.environ.get("ARIES_QUANT_IMPL", "outscale")
    if jax.default_backend() != "tpu" and impl == "pallas":
        impl = "xla"
    if impl == "pallas":
        out = _quant_matmul_pallas(x2, q, s)
    elif impl == "native":
        out = _quant_matmul_int8io(x2, q, s)
    elif impl == "outscale":
        out = _quant_matmul_outscale(x2, q, s)
    else:
        out = _quant_matmul_xla(x2, q, s)
    return out.reshape(*lead, q.shape[1]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Param-tree conversion
# ---------------------------------------------------------------------------

_DENSE_KEYS = ("q", "k", "v", "o", "fc1", "fc2")


def _quantize_dense(p: Dict[str, Any]) -> Dict[str, Any]:
    qv, sv = quantize_int8(p["w"])
    out = {"q": qv, "s": sv}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def quantize_model_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every transformer dense layer of a Whisper param tree.

    Conv stems, layer norms, embeddings, and biases stay in their original
    dtype; attention/MLP weight matrices become int8+scales.
    """

    def convert_block(block: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(block)
        for attn_key in ("attn", "cross"):
            if attn_key in block:
                out[attn_key] = {
                    k: _quantize_dense(v) if k in _DENSE_KEYS else v
                    for k, v in block[attn_key].items()
                }
        if "mlp" in block:
            out["mlp"] = {
                k: _quantize_dense(v) if k in _DENSE_KEYS else v
                for k, v in block["mlp"].items()
            }
        return out

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for part in ("encoder", "decoder"):
        if part in params and "blocks" in params[part]:
            out[part] = dict(params[part])
            out[part]["blocks"] = convert_block(params[part]["blocks"])
    return out
