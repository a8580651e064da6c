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


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention_q8_step(q: jax.Array, k8: jax.Array, ks: jax.Array,
                           v8: jax.Array, vs: jax.Array, mask: jax.Array,
                           interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl

    B, H, G, dh = q.shape
    T = k8.shape[3]

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, out_ref):
        qb = q_ref[0, 0].astype(jnp.float32)          # (G, dh)
        kf = k_ref[0, 0].astype(jnp.float32)          # (dh, T)
        raw = jax.lax.dot_general(
            qb, kf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (G, T)
        logits = raw * ks_ref[0, 0] + m_ref[0, 0]     # scales fold 1/sqrt(dh)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs_ref[0, 0]
        vf = v_ref[0, 0].astype(jnp.float32)          # (dh, T)
        out_ref[0, 0] = jax.lax.dot_general(
            pv, vf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, G, dh), jnp.float32),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, G, dh), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, dh, T), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, T), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, dh, T), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, T), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, T), lambda b, h: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, G, dh), lambda b, h: (b, h, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * G * T * dh * 2,
            bytes_accessed=B * H * (2 * T * dh + 2 * 4 * T + G * dh * 6),
            transcendentals=B * H * G * T,
        ),
        interpret=interpret,
    )(q, k8, ks, v8, vs, mask)


def self_attention_q8_reference(q, k8, ks, v8, vs, mask):
    """XLA reference (CPU/tests): identical math, materialized dequant."""
    logits = jnp.einsum("bhgd,bhdt->bhgt", q.astype(jnp.float32),
                        k8.astype(jnp.float32))
    logits = logits * ks + mask
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhgt,bhdt->bhgd", p * vs, v8.astype(jnp.float32))


def self_attention_q8_auto(q, k8, ks, v8, vs, mask):
    if jax.default_backend() == "tpu":
        return self_attention_q8_step(q, k8, ks, v8, vs, mask)
    return self_attention_q8_reference(q, k8, ks, v8, vs, mask)
