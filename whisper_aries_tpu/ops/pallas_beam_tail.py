"""Fused beam-expansion tail (TPU Pallas): filters + log_softmax + top-k.

After the decode-step megakernel returns logits, expand()
(decoding/generate.py) still runs ~15 full-vocab XLA passes per step:
the timestamp-grammar filters (_apply_filters), a (B*K, V) log_softmax,
score accumulation, eot-column routing, and the K unrolled argmax+mask
top-k passes over the (B, K*V) candidate expansion. Each is a separate
XLA op with ~40 us fixed overhead on this chip, so the tail costs ~2 ms
of an ~11 ms step (scripts/profile_beam_tail.py) while touching only
~25 MB — pure op-count tax, the same regime the megakernel removed for
the layer stack.

This kernel runs the whole tail as ONE program, gridded over the B
windows. Per window it holds the (K, V) logits block in VMEM (~1 MB)
and produces three (1, 128)-padded row vectors: the K surviving
candidate scores, their flat k*V+v indices, and the per-beam eot
continuation scores. Everything downstream in expand() (finished-buffer
routing, ancestry bookkeeping, token DUS) operates on (B, K) tensors
and stays in XLA.

Semantics are exactly expand()'s (verbatim golden model in
beam_tail_reference, parity-tested in tests/test_decode.py):

  * additive suppress mask, no_timestamps/sot ban, SuppressBlank at the
    first sampled position;
  * timestamp grammar: pair alternation, monotonic floor, initial
    timestamp window, total-ts-probability-beats-text forcing (on raw
    filtered logits — shift-invariant, no materialised log_softmax);
  * per-row log_softmax, sum_logprob accumulation;
  * eot scores read from the total BEFORE the eot column is masked out
    of the flat expansion;
  * top-k as K global-max passes with first-index (lowest k*V+v) tie
    resolution — identical to _top_k_unrolled's argmax semantics.

Row scalars (sum_logprob, last/penultimate/max-timestamp token per
beam) travel in SMEM; (K, 1) column vectors are assembled from them
with K unrolled selects and broadcast across lanes.

Reference parity anchor: the sampling/scoring loop of CTranslate2's
beam search (the reference's WhisperModel engine, SURVEY.md N1) — same
role, fused TPU-native design.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.finfo(np.float32).min)
_I32_BIG = np.int32(2**31 - 1)


def _make_kernel(K: int, V: int, tsb: int, eot: int, blank: int,
                 no_ts: int, init_cap: int, with_timestamps: bool,
                 suppress_blank: bool):
    """Kernel body for static dims/ids. Grid: (B,) windows."""

    def kernel(logits_ref,      # (1, K, V) f32 VMEM block
               sup_ref,         # (1, V) f32 VMEM block (shared)
               sum_ref,         # (B, K) f32 SMEM (whole)
               last_ref,        # (B, K) i32 SMEM
               pen_ref,         # (B, K) i32 SMEM
               mts_ref,         # (B, K) i32 SMEM
               isf_ref,         # (1,)   i32 SMEM — is_first_sample
               score_ref,       # (1, 8, 128) f32 VMEM out
               idx_ref,         # (1, 8, 128) i32 VMEM out
               eot_ref):        # (1, 8, 128) f32 VMEM out
        w = pl.program_id(0)
        isf = isf_ref[0] != 0

        vidx = jax.lax.broadcasted_iota(jnp.int32, (K, V), 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (K, V), 0)
        f = logits_ref[0] + sup_ref[...]            # (1,V) row broadcast
        # mask the lane pad (V is not a multiple of 128; pad lanes carry
        # garbage on load) together with the never-sampled specials
        f = jnp.where(vidx == no_ts, NEG, f)
        if suppress_blank:
            blank_mask = (vidx == blank) | (vidx == eot)
            f = jnp.where(blank_mask & isf, NEG, f)

        def col(ref):
            # (K, 1) column vector from K SMEM scalars of row w
            c = jnp.zeros((K, 1), jnp.float32)
            rio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            for k in range(K):
                c = jnp.where(rio == k, ref[w, k].astype(jnp.float32), c)
            return c

        if with_timestamps:
            last = col(last_ref)
            pen = col(pen_ref)
            mts = col(mts_ref)
            last_was = last >= tsb                       # (K, 1)
            pen_was = pen >= tsb
            ts_region = vidx >= tsb
            text_region = vidx < eot
            f = jnp.where((last_was & pen_was) & ts_region, NEG, f)
            f = jnp.where((last_was & ~pen_was) & text_region, NEG, f)
            has_ts = mts >= tsb
            floor = jnp.where(last_was & ~pen_was, mts, mts + 1.0)
            mono_bad = (ts_region & (vidx.astype(jnp.float32) < floor)
                        & has_ts)
            f = jnp.where(mono_bad, NEG, f)
            f = jnp.where((vidx < tsb) & isf, NEG, f)
            f = jnp.where((vidx > init_cap) & isf, NEG, f)
            # force a timestamp when total ts probability beats every
            # text token (shift-invariant: runs on raw filtered logits)
            fts = jnp.where(ts_region, f, NEG)
            m = jnp.max(fts, -1, keepdims=True)
            ts_lp = m + jnp.log(jnp.sum(jnp.exp(fts - m), -1,
                                        keepdims=True))
            max_text = jnp.max(jnp.where(ts_region, NEG, f), -1,
                               keepdims=True)
            f = jnp.where((ts_lp > max_text) & ~ts_region, NEG, f)
        else:
            f = jnp.where(vidx >= tsb, NEG, f)

        # per-row log_softmax + score accumulation. Subtract the max
        # FIRST (jax.nn.log_softmax's form): on a fully-masked row
        # m2 = f32-min and (m2 + log V) absorbs the log term, which
        # would make f - z come out 0 instead of -log(V)
        m2 = jnp.max(f, -1, keepdims=True)
        sh = f - m2
        lp = sh - jnp.log(jnp.sum(jnp.exp(sh), -1, keepdims=True))
        total = lp + col(sum_ref)                    # (K, V)

        # eot continuation scores (before the column is masked out of
        # the flat expansion); one-lane masked sum == extract
        eot_lane = vidx == eot
        eot_scores = jnp.sum(jnp.where(eot_lane, total, 0.0), -1,
                             keepdims=True)          # (K, 1)
        total = jnp.where(eot_lane, NEG, total)

        # top-K over the flat (K*V) expansion: K global-max passes,
        # ties to the LOWEST flat index (== argmax-first semantics)
        flat_idx = ridx * V + vidx
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        scores = jnp.full((1, 128), NEG, jnp.float32)
        idxs = jnp.zeros((1, 128), jnp.int32)
        for j in range(K):
            mj = jnp.max(total)
            ij = jnp.min(jnp.where(total == mj, flat_idx, _I32_BIG))
            scores = jnp.where(lane128 == j, mj, scores)
            idxs = jnp.where(lane128 == j, ij, idxs)
            total = jnp.where(flat_idx == ij, -jnp.inf, total)

        eot_out = jnp.full((1, 128), NEG, jnp.float32)
        rio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        for k in range(K):
            ek = jnp.sum(jnp.where(rio == k, eot_scores, 0.0))
            eot_out = jnp.where(lane128 == k, ek, eot_out)

        # outputs are (1, 8, 128) blocks — Mosaic needs the last two
        # block dims x8/x128; broadcast the row vector over the 8 pad
        # sublanes, callers read [:, 0, :K]
        score_ref[...] = jnp.broadcast_to(scores, (8, 128))[None]
        idx_ref[...] = jnp.broadcast_to(idxs, (8, 128))[None]
        eot_ref[...] = jnp.broadcast_to(eot_out, (8, 128))[None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("K", "tsb", "eot", "blank", "no_ts", "init_cap",
                     "with_timestamps", "suppress_blank", "interpret"),
)
def beam_tail(
    logits_flat: jax.Array,     # (B*K, V) f32 — FILTER-READY logits
    sum_logprob: jax.Array,     # (B, K) f32
    last_tok: jax.Array,        # (B, K) i32
    penult_tok: jax.Array,      # (B, K) i32
    max_ts_tok: jax.Array,      # (B, K) i32
    suppress_mask: jax.Array,   # (V,) f32 additive
    is_first: jax.Array,        # scalar bool/i32
    K: int, tsb: int, eot: int, blank: int, no_ts: int, init_cap: int,
    with_timestamps: bool = True, suppress_blank: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused expand() tail. Returns (live_score (B, K) f32,
    top_idx (B, K) i32 flat k*V+v, eot_scores (B, K) f32)."""
    BK, V = logits_flat.shape
    B = BK // K
    kernel = _make_kernel(K, V, tsb, eot, blank, no_ts, init_cap,
                          with_timestamps, suppress_blank)
    isf = jnp.asarray(is_first, jnp.int32).reshape(1)
    score, idx, eot_s = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # (1, K, V) blocks: Mosaic requires the LAST TWO block dims
            # be x8/x128 or equal the array dims — K and V both qualify
            # as full dims of the (B, K, V) view
            pl.BlockSpec((1, K, V), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, V), lambda w: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda w: (w, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(logits_flat.reshape(B, K, V), suppress_mask[None, :], sum_logprob,
      last_tok.astype(jnp.int32), penult_tok.astype(jnp.int32),
      max_ts_tok.astype(jnp.int32), isf)
    return score[:, 0, :K], idx[:, 0, :K], eot_s[:, 0, :K]
