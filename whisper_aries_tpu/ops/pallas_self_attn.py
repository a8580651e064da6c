"""Pallas decode-step self-attention over an int8-quantized KV cache.

Companion to ops/pallas_cross_attn.py: the decode loop's OTHER big HBM
stream is the growing self-attention cache — at large-v3 beam search it is
also the buffer whose 2x reorder-gather transient limits the window batch.
Quantizing it to int8 on write (symmetric per-position scales, exactly the
cross-KV scheme) halves the per-step read, halves the beam reorder-gather
traffic, and halves the cache's HBM footprint (ROADMAP round-2 lever #1).

Layout contract (one decoder layer, one decode position, S=1):
    q:    (B, H, 1, dh)  bf16/f32
    k8:   (B, H, dh, T)  int8, time-minor (see models/whisper.py on tiling)
    ks:   (B, H, 1, T)   f32 per-position scales (include 1/sqrt(dh))
    v8:   (B, H, dh, T)  int8
    vs:   (B, H, 1, T)   f32
    mask: (1, 1, 1, T)   f32 additive row (0 at attendable positions,
                         -inf elsewhere) — encodes causal progress AND the
                         left-pad valid_start in one shared row
    -> out (B, H, 1, dh) f32
Grid (B, H): one head's K/V slab (2 x dh x T int8) streams through VMEM,
fused dequant + masked softmax + PV — the bf16 K/V never exist in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _row_block(n: int, dh: int, t: int, budget: int = 2 << 20) -> int:
    """Largest divisor of ``n`` whose int8 K slab (rows x dh x t) stays
    under ``budget`` bytes — keeps per-program work large (a (B, H) grid of
    one-head programs measured 6.5x slower end to end: 128k program
    launches per decode step swamped the actual 2-4 us of DMA each)."""
    cap = max(1, budget // max(1, dh * t))
    if n <= cap:
        return n
    best = 1
    # Mosaic: block second-minor dim must be divisible by 8 or be the
    # full dimension
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap and (d % 8 == 0 or d == n):
            best = d
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_q8_step(q: jax.Array, k8: jax.Array, ks: jax.Array,
                           v8: jax.Array, vs: jax.Array, mask: jax.Array,
                           interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl

    B, H, G, dh = q.shape
    T = k8.shape[3]
    # (B, H) merge into one row axis (layout-preserving reshapes); the grid
    # blocks over rows so each program streams a multi-megabyte K/V slab
    N = B * H
    BN = _row_block(N, dh, T)
    q2 = q.reshape(N, G * dh)          # G == 1 at decode steps
    k2 = k8.reshape(N, dh, T)
    v2 = v8.reshape(N, dh, T)
    ks2 = ks.reshape(N, T)
    vs2 = vs.reshape(N, T)
    m2 = mask.reshape(1, T)

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, out_ref):
        qb = q_ref[...].astype(jnp.float32)           # (BN, dh)
        kf = k_ref[...].astype(jnp.float32)           # (BN, dh, T)
        # per-row dot over dh as broadcast-multiply + sublane reduction
        # (one (1, dh) x (dh, T) matmul per row would unroll BN MXU calls)
        logits = jnp.sum(qb[:, :, None] * kf, axis=1)  # (BN, T)
        logits = logits * ks_ref[...] + m_ref[...]     # scales fold 1/sqrt(dh)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs_ref[...]                           # (BN, T)
        vf = v_ref[...].astype(jnp.float32)            # (BN, dh, T)
        out_ref[...] = jnp.sum(pv[:, None, :] * vf, axis=2)  # (BN, dh)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, dh), jnp.float32),
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((BN, G * dh), lambda n: (n, 0)),
            pl.BlockSpec((BN, dh, T), lambda n: (n, 0, 0)),
            pl.BlockSpec((BN, T), lambda n: (n, 0)),
            pl.BlockSpec((BN, dh, T), lambda n: (n, 0, 0)),
            pl.BlockSpec((BN, T), lambda n: (n, 0)),
            pl.BlockSpec((1, T), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BN, dh), lambda n: (n, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * G * T * dh * 2,
            bytes_accessed=N * (2 * T * dh + 2 * 4 * T + G * dh * 8),
            transcendentals=N * G * T,
        ),
        interpret=interpret,
    )(q2, k2, ks2, v2, vs2, m2)
    return out.reshape(B, H, G, dh)


def self_attention_q8_reference(q, k8, ks, v8, vs, mask):
    """XLA reference (CPU/tests): identical math, materialized dequant."""
    logits = jnp.einsum("bhgd,bhdt->bhgt", q.astype(jnp.float32),
                        k8.astype(jnp.float32))
    logits = logits * ks + mask
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhgt,bhdt->bhgd", p * vs, v8.astype(jnp.float32))


def self_attention_q8_auto(q, k8, ks, v8, vs, mask):
    """Dispatch: the XLA einsum reference everywhere (measured at decode
    shapes, rows=200, T=112: XLA int8 einsum 0.46 ms/call vs 0.51 ms for
    the row-blocked Pallas kernel — XLA fuses the dequant; every variant
    is per-op-overhead-dominated at these sizes, so fewest ops wins)."""
    return self_attention_q8_reference(q, k8, ks, v8, vs, mask)
