"""Fused all-layers encoder megakernel (TPU Pallas), cursor-addressable.

Why this exists: at batch 36-48 the decode megakernel sits AT its HBM
DMA floor (~14.4 ms/step, scripts/profile_mega_step.py), while the
XLA encoder is MXU-bound at the chip's measured ~61 TFLOP/s issue rate
(scripts/probe_mxu.py, scripts/probe_encode_cost.py) — large-v3 is
~2.25 TFLOP per 30 s window, ~37 ms/window. The two stages run serially
on the single TPU core, so the chip alternates between a DMA-starved
MXU (decode) and an idle DMA engine (encode). This module makes the
encoder's work CURSOR-ADDRESSABLE: it is decomposed into a flat list of
~15-30 us micro-ops (column blocks of one window-layer) indexed by a
single integer, so the whole encoder can run

  * standalone, as this file's all-layers Pallas kernel (one program
    for the full 32-layer stack, int8 weights streamed once per layer
    — the COMPUTE_TYPE=int8 reference scheme, ops/quant.py grid), or
  * INTERLEAVED INTO THE DECODE MEGAKERNEL's per-window loop slots
    ("encode-while-decode": the NEXT batch's encoder micro-ops fill the
    decode kernel's DMA-wait gaps; ops/pallas_decode_layers.py), with a
    standalone call finishing whatever cursor range decode's early exit
    left over.

Layout: activations are TRANSPOSED — xeT (Ne, d, Tp) bf16, aliased
in-out (Tp = x128-padded n_audio_ctx). The transposed layout is what
kills the per-block head transposes that the row-major decode kernel
pays (ROADMAP: 6 x ~3.6 us per (layer, window)): every GEMM here is
dot_general(w (K, N), h (K, bq), contract K) -> (N, bq), whose (N, bq)
output reshapes to heads (H, dh, bq) as a free MAJOR split, and both
attention dots use the exact operand patterns the decode kernel already
proved on this Mosaic backend ((H, dh, bq) x (H, dh, Tp) batched over
H; probs x values contracting the minor). The single残 transpose per
q-block is the same tiny MXU-identity trick as decode's heads_to_rows.

Micro-op schedule (bq=128 column blocks, Tb = Tp/bq):
  per window-layer wl = le*Ne + w, r in [0, 4*Tb):
    r <  Tb : kv micro    jb=r       — ln1 + K,V col GEMMs into VMEM slabs
    r < 2Tb : q-attn micro jb=r-Tb   — ln1 + Q GEMM + full attention over
                                       the K/V slabs + O GEMM + residual
    else    : MLP half    jb=(r-2Tb)//2, half=(r-2Tb)%2 — ln2 + fc1-half
                                       + erf-GeLU + fc2-half partial (A
                                       stashes the f32 partial, B adds,
                                       scales, residual)
  global micro m: le = m // (Ne*4Tb), w = (m % (Ne*4Tb)) // 4Tb.
  K/V phase must finish before the q phase reads the slabs — sequential
  m guarantees it WITHIN one kernel invocation. The K/V slabs live in
  scratch VMEM and do not survive a kernel-call boundary, so a cursor
  split across calls is legal only at WINDOW-LAYER boundaries (multiples
  of 4Tb = enc_micro_counts()[0]); the resumed call re-fetches the
  current layer's weights via the SMEM last-layer state.

Numerics: LN f32 over the sublane (d) axis; GEMMs bf16 x int8-as-bf16
with f32 accumulation, per-output-channel scale + bias on the f32
accumulator (ops/quant.py outscale; q's 1/sqrt(dh) folds into its scale
AND bias at pack time); softmax f32 over the lane (Tp) axis with padded
keys killed by iota mask; erf-GeLU via the Abramowitz-Stegun fit
(_erf_as). fc2 is computed as two ff-half contractions summed in f32 —
associativity differs from a single dot, so the jnp reference below
mirrors the split (and every per-block GEMM shape) exactly; the
interpret-mode parity test is bit-exact modulo isolated 1-bf16-ulp
flips from XLA CPU epilogue-fusion rounding (tests/test_encoder_mega).

Reference parity anchor: CTranslate2's int8 encoder (the reference's
WhisperModel engine quantizes encoder and decoder alike under
COMPUTE_TYPE=int8, reference README.md:178; SURVEY.md N1).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_aries_tpu.ops.pallas_decode_layers import _erf_as

NEG = float(np.finfo(np.float32).min)

#: static column ids inside the (Le, ff, 128) transposed vector pack
#: (only the first 15 lanes are used; the minor is 128 because an HBM
#: DMA slice must be lane-tile-aligned — a (ff, 16) slab does not DMA).
#: every per-channel vector the kernel consumes is a COLUMN here, so the
#: (d|ff, bq) f32 GEMM accumulators scale/bias with a (len, 1) slice
#: that lane-broadcasts — no (1, VEC) row-vector relayouts in-kernel.
_VC = {
    "ln1s": 0, "ln1b": 1, "qb": 2, "vb": 3, "ob": 4,
    "ln2s": 5, "ln2b": 6, "f2b": 7,
    "sq": 8, "sk": 9, "sv": 10, "so": 11, "sf2": 12,
    "f1b": 13, "sf1": 14,
}


def pack_encoder_weights(blocks: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Stacked encoder blocks -> the kernel's int8 weight pack.

    Accepts the tree in either form ({"q","s","b"} already-quantized or
    {"w","b"} float — quantized here with the ops/quant.py grid).

    Layout: wqkvo8 (Le, d, 4d) int8 = [q | k | v | o] column-concat;
    wf18 (Le, d, ff); wf28 (Le, ff, d); vecsT (Le, ff, 128) f32 holding
    every LN/bias/dequant-scale vector as a zero-padded COLUMN (_VC ids;
    f1b/sf1 use the full ff length, all others the first d rows). q's
    scale and bias are pre-multiplied by dh**-0.5 (whisper's q scaling)
    so the kernel applies them in the one outscale it already does."""
    from whisper_aries_tpu.ops.quant import quantize_int8

    attn = blocks["attn"]
    mlp = blocks["mlp"]

    def as_q8(p):
        if "q" in p:
            return jnp.asarray(p["q"]), jnp.asarray(p["s"], jnp.float32)
        return quantize_int8(p["w"])

    q_q, s_q = as_q8(attn["q"])
    q_k, s_k = as_q8(attn["k"])
    q_v, s_v = as_q8(attn["v"])
    q_o, s_o = as_q8(attn["o"])
    q_f1, s_f1 = as_q8(mlp["fc1"])
    q_f2, s_f2 = as_q8(mlp["fc2"])

    Le, d, _ = q_q.shape
    ff = q_f1.shape[-1]
    dh = None  # folded below from the caller's head count? no: use d//H
    # q scaling: whisper applies dh**-0.5 to q before the k dot. The
    # head count is not passed here; the fold uses the UNIVERSAL whisper
    # head width dh=64 (every published checkpoint, PRESETS table).
    rsq = float(64) ** -0.5

    def v(x):
        return jnp.asarray(x).astype(jnp.float32)

    cols = jnp.zeros((Le, ff, 128), jnp.float32)

    def put(name, vec, length):
        nonlocal cols
        return cols.at[:, :length, _VC[name]].set(v(vec))

    cols = put("ln1s", blocks["ln1"]["scale"], d)
    cols = put("ln1b", blocks["ln1"]["bias"], d)
    cols = put("qb", v(attn["q"]["b"]) * rsq, d)
    cols = put("vb", attn["v"]["b"], d)
    cols = put("ob", attn["o"]["b"], d)
    cols = put("ln2s", blocks["ln2"]["scale"], d)
    cols = put("ln2b", blocks["ln2"]["bias"], d)
    cols = put("f2b", mlp["fc2"]["b"], d)
    cols = put("sq", s_q * rsq, d)
    cols = put("sk", s_k, d)
    cols = put("sv", s_v, d)
    cols = put("so", s_o, d)
    cols = put("sf2", s_f2, d)
    cols = put("f1b", mlp["fc1"]["b"], ff)
    cols = put("sf1", s_f1, ff)

    return {
        "wqkvo8": jnp.concatenate([q_q, q_k, q_v, q_o], axis=-1),
        "wf18": q_f1,
        "wf28": q_f2,
        "vecsT": cols,
    }


def enc_micro_counts(n_windows: int, n_layers: int, Tp: int,
                     bq: int = 128) -> Tuple[int, int]:
    """(micros per window-layer, total micros) for the schedule above."""
    Tb = Tp // bq
    per_wl = 4 * Tb
    return per_wl, n_layers * n_windows * per_wl


# ---------------------------------------------------------------------------
# jnp reference (CPU tests / documentation of the exact kernel math)
# ---------------------------------------------------------------------------

def fused_encoder_layers_reference(
    xeT: jax.Array,               # (Ne, d, Tp) bf16 — post conv-stem+pos
    wepack: Dict[str, jax.Array],
    n_head: int,
    T: int,                       # real (unpadded) frame count
    bq: int = 128,
) -> jax.Array:
    """The kernel's math in plain jnp — bit-for-bit in interpret mode.

    Mirrors the kernel EXACTLY, including its BLOCKING: every GEMM is a
    bq-column block (XLA's f32 dot rounding can differ with output
    width, so full-width GEMMs here would drift ~1e-5 from the kernel —
    the per-block shapes are part of the bit-exact contract). bf16 MXU
    dots with f32 accumulation, outscale+bias on the accumulator,
    per-q-block bf16 cast before the O GEMM, ff-half split fc2 summed
    in f32, _erf_as GeLU. Returns the updated (Ne, d, Tp) activations
    (ln_post stays outside, like the decode kernel's final LN + vocab
    GEMM)."""
    Ne, d, Tp = xeT.shape
    H = n_head
    dh = d // H
    Le = wepack["wqkvo8"].shape[0]
    ff = wepack["wf18"].shape[-1]
    ffh = ff // 2
    Tb = Tp // bq
    dt = xeT.dtype
    sq2 = np.float32(1.0 / np.sqrt(2.0))

    def ln(xb, s, b):
        xf = xb.astype(jnp.float32)
        mu = xf.mean(axis=0, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=0, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * s + b).astype(dt)

    def gemm(w8, h, s, b=None):
        y = jax.lax.dot_general(
            w8.astype(jnp.bfloat16), h.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * s
        return y if b is None else y + b

    x = xeT
    for le in range(Le):
        vc = wepack["vecsT"][le]                     # (ff, 128)

        def col(name, length=d):
            return vc[:length, _VC[name]:_VC[name] + 1]

        w4 = wepack["wqkvo8"][le]
        w1 = wepack["wf18"][le]
        w2 = wepack["wf28"][le]
        out_layers = []
        for w in range(Ne):
            xw = x[w]                                # (d, Tp)

            def blk(z, jb):
                return z[:, jb * bq:(jb + 1) * bq]

            # kv phase: per-block K/V GEMMs into the slabs
            kts = jnp.zeros((H, dh, Tp), dt)
            vts = jnp.zeros((H, dh, Tp), dt)
            for jb in range(Tb):
                h = ln(blk(xw, jb), col("ln1s"), col("ln1b"))
                kf = gemm(w4[:, d:2 * d], h, col("sk"))
                vf = gemm(w4[:, 2 * d:3 * d], h, col("sv"), col("vb"))
                kts = kts.at[:, :, jb * bq:(jb + 1) * bq].set(
                    kf.astype(dt).reshape(H, dh, bq))
                vts = vts.at[:, :, jb * bq:(jb + 1) * bq].set(
                    vf.astype(dt).reshape(H, dh, bq))

            # q-attention phase: per-block full attention + residual
            qouts = []
            for jb in range(Tb):
                xb = blk(xw, jb)
                h = ln(xb, col("ln1s"), col("ln1b"))
                qf = gemm(w4[:, :d], h, col("sq"), col("qb"))  # rsq in
                q3 = qf.astype(dt).reshape(H, dh, bq)
                lg = jax.lax.dot_general(
                    q3, kts,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, bq, Tp)
                ci = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 2)
                lg = jnp.where(ci < T, lg, NEG)
                mx = jnp.max(lg, -1, keepdims=True)
                ex = jnp.exp(lg - mx)
                sm = jnp.sum(ex, -1, keepdims=True)
                att = jax.lax.dot_general(
                    ex.astype(dt), vts,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, bq, dh)
                att = att * (1.0 / sm)
                attT = att.astype(dt).transpose(0, 2, 1).reshape(d, bq)
                of = gemm(w4[:, 3 * d:], attT, col("so"), col("ob"))
                qouts.append((xb.astype(jnp.float32) + of).astype(dt))
            xw = jnp.concatenate(qouts, axis=1)

            # MLP phase: per-block, ff-half split summed in f32
            mouts = []
            for jb in range(Tb):
                xb = blk(xw, jb)
                h = ln(xb, col("ln2s"), col("ln2b"))
                acc = None
                for hf in range(2):
                    sl = slice(hf * ffh, (hf + 1) * ffh)
                    h1 = gemm(w1[:, sl], h,
                              vc[sl, _VC["sf1"]:_VC["sf1"] + 1],
                              vc[sl, _VC["f1b"]:_VC["f1b"] + 1])
                    g = (0.5 * h1 * (1.0 + _erf_as(h1 * sq2))).astype(dt)
                    part = jax.lax.dot_general(
                        w2[sl].astype(jnp.bfloat16), g,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
                out = acc * col("sf2") + col("f2b")
                mouts.append((xb.astype(jnp.float32) + out).astype(dt))
            xw = jnp.concatenate(mouts, axis=1)
            out_layers.append(xw)
        x = jnp.stack(out_layers, axis=0)
    return x


# ---------------------------------------------------------------------------
# The micro-op body (shared: standalone grid kernel + decode-kernel rider)
# ---------------------------------------------------------------------------

def make_enc_micro(Ne: int, Le: int, d: int, ff: int, H: int, Tp: int,
                   T: int, dtype, bq: int = 128, phases: str = "kqm"):
    """Build the cursor-indexed micro-op body.

    Returns (micro, n_micros, per_wl): ``micro(m, xe, wq_ref, wf1_ref,
    wf2_ref, vec_ref, bufs, sems)`` executes micro-op ``m`` (no-op when
    m is out of [0, n_micros)). ``xe`` is the ALIASED activations ref —
    all reads AND writes go through it (reading the donated input ref
    after a write is stale in interpret mode; one ref is also what the
    hardware really has). ``bufs``/``sems`` come from
    ``enc_scratch_shapes`` below. The body is branch-dispatched with
    pl.when so it can sit inside another kernel's loop (the decode
    megakernel's window slots)."""
    dh = d // H
    ffh = ff // 2
    Tb = Tp // bq
    per_wl = 4 * Tb
    n_micros = Le * Ne * per_wl
    sq2 = np.float32(1.0 / np.sqrt(2.0))

    def micro(m, xe, wq_ref, wf1_ref, wf2_ref, vec_ref,
              bufs, sems):
        (wqb, wf1b, wf2b, vecb, kts, vts, xb, accb, outb, lstate) = bufs
        (sem_we, sem_x, sem_o) = sems

        live = (m >= 0) & (m < n_micros)
        mc = jnp.clip(m, 0, n_micros - 1)
        le = mc // (Ne * per_wl)
        rr = mc - le * (Ne * per_wl)
        w = rr // per_wl
        r = rr - w * per_wl
        is_kv = r < Tb
        is_qa = (r >= Tb) & (r < 2 * Tb)
        mr = r - 2 * Tb
        is_m0 = (r >= 2 * Tb) & (jax.lax.rem(mr, 2) == 0)
        is_m1 = (r >= 2 * Tb) & (jax.lax.rem(mr, 2) == 1)
        jb = jnp.where(is_kv, r,
                       jnp.where(is_qa, r - Tb, mr // 2))

        # ---- layer weight fetch: first live micro of each layer ----
        # (19.7 MB at ~570 GB/s = ~35 us once per Ne*per_wl micros).
        # Keyed off the SMEM last-layer state (NOT rr==0) so a cursor
        # resume that starts at window w>0 of a layer still fetches; the
        # host kernel inits lstate[0] = -1 at grid step 0.
        @pl.when(live & (lstate[0] != le))
        def _():
            for ref, buf in ((wq_ref, wqb), (wf1_ref, wf1b),
                             (wf2_ref, wf2b), (vec_ref, vecb)):
                pltpu.make_async_copy(ref.at[le], buf, sem_we).start()
            for ref, buf in ((wq_ref, wqb), (wf1_ref, wf1b),
                             (wf2_ref, wf2b), (vec_ref, vecb)):
                pltpu.make_async_copy(ref.at[le], buf, sem_we).wait()
            lstate[0] = le

        def colv(name, length=d):
            return vecb[:length, _VC[name]:_VC[name] + 1]

        # ---- x column block fetch (every micro reads its block) ----
        @pl.when(live)
        def _():
            cp = pltpu.make_async_copy(
                xe.at[w, :, pl.ds(jb * bq, bq)], xb, sem_x)
            cp.start()
            cp.wait()

        def lnb(sname, bname):
            xf = xb[:].astype(jnp.float32)
            mu = jnp.mean(xf, axis=0, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=0, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            return (y * colv(sname) + colv(bname)).astype(dtype)

        def gemmT(w8, h, s, b=None):
            y = jax.lax.dot_general(
                w8.astype(jnp.bfloat16), h.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y * s
            return y if b is None else y + b

        def wb_resid(of):
            res = (xb[:].astype(jnp.float32) + of).astype(dtype)
            outb[:] = res
            cp = pltpu.make_async_copy(
                outb, xe.at[w, :, pl.ds(jb * bq, bq)], sem_o)
            cp.start()
            cp.wait()

        # ---- kv micro: K,V column GEMMs into the VMEM slabs ----
        @pl.when(live & is_kv if "k" in phases else jnp.bool_(False))
        def _():
            h = lnb("ln1s", "ln1b")
            kf = gemmT(wqb[:, d:2 * d], h, colv("sk"))
            vf = gemmT(wqb[:, 2 * d:3 * d], h, colv("sv"), colv("vb"))
            kts[:, :, pl.ds(jb * bq, bq)] = (
                kf.astype(dtype).reshape(H, dh, bq))
            vts[:, :, pl.ds(jb * bq, bq)] = (
                vf.astype(dtype).reshape(H, dh, bq))

        # ---- q-attention micro: full attention for one q block ----
        # LATE-DIVIDE softmax (scripts/probe_qa_bisect.py): normalisation
        # happens AFTER the PV dot — att (H, bq, dh) scales by the
        # (H, bq, 1) exp-sum reciprocal, dh-wide instead of Tp-wide (164k
        # vs 3.9M multiplies). The unnormalised exp max is 1.0 (row max
        # subtracted), so the bf16 probs cast keeps the same relative
        # precision as normalised probs. The Tp-pad kill stays the 3D
        # iota+where: every (1, 1, Tp)-row-mask broadcast over the
        # bq=128 SUBLANE dim SIGABRTs Mosaic's ApplyVectorLayoutPass
        # (vector_extract_slice 16-vs-1 inside scf.if — probe FAILED
        # rows), as does the V-major PV dot that would kill the identity
        # transpose.
        @pl.when(live & is_qa if "q" in phases else jnp.bool_(False))
        def _():
            h = lnb("ln1s", "ln1b")
            qf = gemmT(wqb[:, :d], h, colv("sq"), colv("qb"))
            q3 = qf.astype(dtype).reshape(H, dh, bq)
            lg = jax.lax.dot_general(
                q3, kts[:],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (H, bq, Tp)
            ci = jax.lax.broadcasted_iota(jnp.int32, (H, bq, Tp), 2)
            lg = jnp.where(ci < T, lg, NEG)
            mx = jnp.max(lg, -1, keepdims=True)
            ex = jnp.exp(lg - mx)
            sm = jnp.sum(ex, -1, keepdims=True)       # (H, bq, 1)
            att = jax.lax.dot_general(
                ex.astype(dtype), vts[:],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (H, bq, dh)
            # explicit reciprocal-multiply: a / would invite XLA's
            # div->recip*mul rewrite in ONE of kernel/reference, breaking
            # the bit-exact interpret contract
            att = att * (1.0 / sm)                    # lane broadcast
            # MXU-identity bq<->dh swap (decode's heads_to_rows trick)
            i_b = (jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
                   ).astype(dtype)
            attT = jax.lax.dot_general(
                att.astype(dtype), i_b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (H, dh, bq)
            attr = attT.astype(dtype).reshape(d, bq)
            of = gemmT(wqb[:, 3 * d:4 * d], attr, colv("so"), colv("ob"))
            wb_resid(of)

        # ---- MLP half A: fc1a + GeLU + fc2a partial (f32 stash) ----
        @pl.when(live & is_m0 if "m" in phases else jnp.bool_(False))
        def _():
            h = lnb("ln2s", "ln2b")
            h1 = gemmT(wf1b[:, :ffh], h,
                       vecb[:ffh, _VC["sf1"]:_VC["sf1"] + 1],
                       vecb[:ffh, _VC["f1b"]:_VC["f1b"] + 1])
            g = (0.5 * h1 * (1.0 + _erf_as(h1 * sq2))).astype(dtype)
            accb[:] = jax.lax.dot_general(
                wf2b[:ffh].astype(jnp.bfloat16), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- MLP half B: fc1b + GeLU + fc2b + scale/bias + residual ----
        @pl.when(live & is_m1 if "m" in phases else jnp.bool_(False))
        def _():
            h = lnb("ln2s", "ln2b")
            h1 = gemmT(wf1b[:, ffh:], h,
                       vecb[ffh:, _VC["sf1"]:_VC["sf1"] + 1],
                       vecb[ffh:, _VC["f1b"]:_VC["f1b"] + 1])
            g = (0.5 * h1 * (1.0 + _erf_as(h1 * sq2))).astype(dtype)
            part = jax.lax.dot_general(
                wf2b[ffh:].astype(jnp.bfloat16), g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            of = (accb[:] + part) * colv("sf2") + colv("f2b")
            wb_resid(of)

    return micro, n_micros, per_wl


def enc_scratch_shapes(d: int, ff: int, H: int, Tp: int, dtype,
                       bq: int = 128):
    """VMEM scratch + semaphores for make_enc_micro (order matters)."""
    dh = d // H
    bufs = [
        pltpu.VMEM((d, 4 * d), jnp.int8),       # wqb
        pltpu.VMEM((d, ff), jnp.int8),          # wf1b
        pltpu.VMEM((ff, d), jnp.int8),          # wf2b
        pltpu.VMEM((ff, 128), jnp.float32),     # vecb
        pltpu.VMEM((H, dh, Tp), dtype),         # kts
        pltpu.VMEM((H, dh, Tp), dtype),         # vts
        pltpu.VMEM((d, bq), dtype),             # xb
        pltpu.VMEM((d, bq), jnp.float32),       # accb
        pltpu.VMEM((d, bq), dtype),             # outb
        pltpu.SMEM((1,), jnp.int32),            # lstate (last layer)
    ]
    sems = [pltpu.SemaphoreType.DMA,            # sem_we
            pltpu.SemaphoreType.DMA,            # sem_x
            pltpu.SemaphoreType.DMA]            # sem_o
    return bufs, sems


# ---------------------------------------------------------------------------
# Standalone all-layers kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("n_head", "T", "bq", "interpret",
                                    "phases"))
def fused_encoder_layers(
    xeT: jax.Array,                # (Ne, d, Tp) bf16, aliased in-out
    wepack: Dict[str, jax.Array],
    n_head: int,
    T: int,
    c0: "jax.Array | int" = 0,     # first micro to run (cursor resume)
    c1: "jax.Array | int | None" = None,   # one-past-last micro
    bq: int = 128,
    interpret: bool = False,
    phases: str = "kqm",       # phase-profiling knob (subset of "kqm")
) -> jax.Array:
    """Run encoder micro-ops [c0, c1) over the full layer stack.

    With c0=0, c1=None this is the complete post-stem encoder (ln_post
    stays in XLA). A non-zero c0 finishes a run the decode-kernel rider
    started; c0/c1 are dynamic (scalar-prefetch — no recompile) and must
    sit on window-layer boundaries (see the schedule note above). Grid
    steps outside [c0, c1) early-out at only the grid overhead."""
    Ne, d, Tp = xeT.shape
    Le = wepack["wqkvo8"].shape[0]
    ff = wepack["wf18"].shape[-1]
    micro, n_micros, _ = make_enc_micro(Ne, Le, d, ff, n_head, Tp, T,
                                        xeT.dtype, bq=bq, phases=phases)
    bufs_sh, sems_sh = enc_scratch_shapes(d, ff, n_head, Tp, xeT.dtype,
                                          bq=bq)
    if c1 is None:
        c1 = n_micros

    def kernel(cr_ref, xe_in, wq_ref, wf1_ref, wf2_ref, vec_ref,
               xe_out, *scratch):
        del xe_in  # aliased with xe_out; all access via the out ref
        i = pl.program_id(0)
        bufs = scratch[:10]
        sems = scratch[10:]
        lstate = bufs[9]

        # grid step 0 always runs (even when dead): init the last-layer
        # state so the first LIVE micro always fetches its weights
        @pl.when(i == 0)
        def _():
            lstate[0] = -1

        # outside [c0, c1) -> negative -> make_enc_micro's `live` guard
        m = jnp.where((i >= cr_ref[0]) & (i < cr_ref[1]), i, -1)
        micro(m, xe_out, wq_ref, wf1_ref, wf2_ref, vec_ref,
              bufs, sems)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_micros,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=bufs_sh + sems_sh,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(xeT.shape, xeT.dtype)],
        input_output_aliases={1: 0},   # operand 1 = xeT (after c0 scalar)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(c0, jnp.int32),
                 jnp.asarray(c1, jnp.int32)]), xeT, wepack["wqkvo8"],
      wepack["wf18"], wepack["wf28"], wepack["vecsT"])
    return out[0]


# ---------------------------------------------------------------------------
# XLA pre/post stages (conv stem in, ln_post out)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dims", "Tp"))
def encode_pre(params: Dict[str, Any], mel: jax.Array, dims,
               Tp: Optional[int] = None) -> jax.Array:
    """mel (Ne, n_mels, 2T) -> TRANSPOSED padded activations (Ne, d, Tp).

    The conv stem + positional embedding stay in XLA (two small convs);
    the transpose/pad is a one-time relayout (~0.3 ms at batch 48)."""
    from whisper_aries_tpu.models.whisper import _conv1d_shifted
    from whisper_aries_tpu.models.layers import gelu

    enc = params["encoder"]
    if mel.ndim == 2:
        mel = mel[None]
    x = mel.transpose(0, 2, 1)
    x = gelu(_conv1d_shifted(enc["conv1"], x, stride=1))
    x = gelu(_conv1d_shifted(enc["conv2"], x, stride=2))
    x = x + enc["pos_emb"][: x.shape[1]].astype(x.dtype)
    T = x.shape[1]
    if Tp is None:
        Tp = ((T + 127) // 128) * 128
    xT = x.transpose(0, 2, 1)                       # (Ne, d, T)
    if Tp != T:
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, Tp - T)))
    return xT


@functools.partial(jax.jit, static_argnames=("T",))
def encode_post(params: Dict[str, Any], xeT: jax.Array, T: int
                ) -> jax.Array:
    """(Ne, d, Tp) kernel output -> (Ne, T, d) encoded audio (ln_post)."""
    from whisper_aries_tpu.models.layers import layer_norm

    x = xeT[:, :, :T].transpose(0, 2, 1)
    return layer_norm(params["encoder"]["ln_post"], x)
