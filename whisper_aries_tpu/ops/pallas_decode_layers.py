"""Fused all-layers decode-step megakernel (TPU Pallas), v2.

The beam decode step is HBM-stream-bound once op overhead is gone: this
chip moves HBM->VMEM at ~566-575 GB/s regardless of DMA chunk size
>= 256 KB, stride, or the number of concurrent chains
(scripts/probe_dma.py), and the scoped-VMEM ceiling is NOT 16 MB — that
is the compiler default, and pltpu.CompilerParams(vmem_limit_bytes=...)
raises it to ~100 MB (scripts/probe_vmem.py). v1 of this kernel (chunked
weight GEMMs, per-chunk cross fetches, serial self K-then-V fetches:
~13k DMAs/step) measured ~22.7 ms/step against a 12.8 ms stream
roofline. v2 is designed to the measured cost model:

  * ~80 DMAs/layer, all >=256 KB: whole weight tensors, whole per-window
    KV slabs. No chunk loops.
  * int8 weights (CTranslate2's COMPUTE_TYPE=int8, ops/quant.py grid)
    streamed whole-tensor and dequantised on the OUTPUT side of each
    GEMM (scales commute with the contraction; quant.py "outscale") —
    halves the 1.5 GB/step weight stream AND makes int8 the fastest
    compute mode (it previously lost to bf16 in the op-bound XLA path,
    ROADMAP round-2 matrix).
  * packed self-cache (L, Bw, 2H, dh, M) — K and V arrive in ONE DMA per
    window, and only the x128-rounded VALID prefix of the minor axis is
    fetched (static bucket branches on the scalar-prefetched position):
    the self stream shrinks from full-M 2.5 GB/step to ~(posk/M) of
    that. Measured: 9.5 ms/step at bucket 1, 10.8 ms at bucket 4 —
    at the DMA roofline (scripts/profile_mega_step.py).
  * the CACHE APPEND happens IN-KERNEL: scripts/profile_mega_step.py
    measured the XLA-side dynamic_update_slice append at 13.6 ms/step —
    MORE than the entire 32-layer kernel — because a lane-unaligned
    dynamic DUS on the 2.5 GB cache lowers to a full rewrite (plus a
    K=5-minor padded 5D transpose). Mosaic cannot write unaligned lane
    slices either, so the kernel instead (a) fetches a window whose
    extent covers the 256-wide ALIGNED tile window containing the
    append columns, (b) places the new K/V rows at the right lanes via
    a one-hot PLACEMENT MATMUL (the MXU does the unaligned shift),
    (c) selects them into the fetched tiles, and (d) DMAs the 256-wide
    window back to the cache, which is an ALIASED output
    (input_output_aliases) so the rest of the buffer is untouched.
    Self-attention reads the post-insert tiles, so the ancestry mask
    includes the own position (ancestry_mask include_own=True).
  * packed whole-window cross KV + scales: 2 DMAs/window (v1: 12),
    full-width attention, no flash chunking.
  * every GEMM runs bf16 x bf16 -> f32 on the MXU. int8 weight/KV values
    in [-127, 127] are EXACT in bf16, so this matches the XLA reference
    math while avoiding ~1/8-rate f32 MXU dots (v1's cross dots were
    f32).

Replaces (when enabled): the layer loop of models/whisper.py::
decoder_step for S==1 ancestry-mode beam steps (beam_reorder="mega", the
TPU default). Embedding, the final LayerNorm + vocab GEMM, and the beam
machinery stay in XLA. Weights MUST be int8 (pack_layer_weights
quantises a bf16 tree with the ops/quant.py grid if needed, so callers
can pass either).

Numerics: LN in f32; GEMMs bf16 x bf16 with f32 accumulation, per-output
-channel scale + bias applied to the f32 accumulator (quant.py
_quant_matmul_outscale); self-attention logits f32 with the additive
ancestry mask over the post-append cache; cross-attention is the int8
math of ops/pallas_cross_attn.py::cross_attention_q8_reference
(logits*ks, probs*vs) over the full window width; erf GeLU via the
Abramowitz-Stegun fit (_erf_as). Parity is tested against the XLA beam
decode with the SAME quantised weights in interpret mode
(tests/test_decode.py::test_beam_mega_kernel_parity).

Mosaic lowering rules this design is shaped by (probed on this backend):
  * lane-splitting value reshapes ((R, d) -> (.., H, dh)) do not lower;
    ROW splits/merges at 8-row granularity, 2D transposes, and batched
    3D dot_generals do. Head axes therefore come from transpose ->
    leading-split ((KP, d) -> (d, KP) -> (H, dh, KP)) and return through
    a tiny identity matmul.
  * every DMA slice needs tile-aligned extents and PROVABLY tile-aligned
    dynamic offsets (`t * 128` qualifies): hence the x128-padded K-minor
    cache minor with one 128-lane slack tile (init_kv_cache), the x128
    fetch buckets, the tile-aligned append window, and the (L, Bw, 2HP,
    TaP) padded-head cross-scale layout (pack_cross_mega).
  * rows pad K -> KP=8 per window (batched-dot lowering merges
    (H, K, dh) -> (H*K, dh) and needs 8-row alignment); the pad rows
    carry garbage that the padded amask (NEG rows) and the placement
    matrix's j < K guard discard.

Reference parity anchor: CTranslate2's fused int8 decode step (the
reference's WhisperModel engine, SURVEY.md N1) — same motivation,
TPU-native design.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.finfo(np.float32).min)


def _erf_as(x: jax.Array) -> jax.Array:
    """Abramowitz & Stegun 7.1.26 erf approximation (|error| < 1.5e-7).

    Mosaic's TPU lowering implements neither ``erf`` nor ``erfc``; this
    rational fit runs on the VPU (exp + 5-term Horner) and its error is
    ~2 decades below bf16 activation resolution, so the kernel's GeLU is
    numerically indistinguishable from the exact-erf XLA path."""
    xf = x.astype(jnp.float32)
    a = jnp.abs(xf)
    t = 1.0 / (1.0 + np.float32(0.3275911) * a)
    poly = t * (np.float32(0.254829592) + t * (
        np.float32(-0.284496736) + t * (np.float32(1.421413741) + t * (
            np.float32(-1.453152027) + t * np.float32(1.061405429)))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(xf) * y


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_layer_weights(blocks: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Stacked decoder blocks -> the kernel's int8 weight pack.

    Accepts the fused-qkv tree in EITHER form: already int8-quantised
    ({"q","s","b"} dense dicts from ops/quant.py::quantize_model_params)
    or bf16/f32 ({"w","b"}), which is quantised here with the identical
    per-output-channel grid — so beam_reorder="mega" is CTranslate2's
    COMPUTE_TYPE=int8 regardless of what the caller loaded.

    Layout: wq8 (L, d, 6d) int8 = [qkv | o | cq | co] column-concat;
    wf18 (L, d, ff); wf28 (L, ff, d). All small per-layer vectors — LN
    scales/biases, GEMM biases, AND the dequant scales — pack into ONE
    (L, 1, VEC) f32 array so each layer costs a single small DMA:
      [ln1.s, ln1.b, qkv.b, o.b, lnc.s, lnc.b, cq.b, co.b,
       ln2.s, ln2.b, fc1.b, fc2.b,
       s_qkv(3d), s_o(d), s_cq(d), s_co(d), s_f1(ff), s_f2(d)]
    """
    from whisper_aries_tpu.ops.quant import quantize_int8

    attn = blocks["attn"]
    cross = blocks["cross"]
    mlp = blocks["mlp"]
    if "qkv" not in attn:
        raise ValueError("pack_layer_weights needs the fused-qkv tree")

    def as_q8(p):
        if "q" in p:
            return jnp.asarray(p["q"]), jnp.asarray(p["s"], jnp.float32)
        q, s = quantize_int8(p["w"])
        return q, s

    q_qkv, s_qkv = as_q8(attn["qkv"])
    q_o, s_o = as_q8(attn["o"])
    q_cq, s_cq = as_q8(cross["q"])
    q_co, s_co = as_q8(cross["o"])
    q_f1, s_f1 = as_q8(mlp["fc1"])
    q_f2, s_f2 = as_q8(mlp["fc2"])

    def v(x):
        return jnp.asarray(x).astype(jnp.float32)

    vecs = jnp.concatenate([
        v(blocks["ln1"]["scale"]), v(blocks["ln1"]["bias"]),
        v(attn["qkv"]["b"]), v(attn["o"]["b"]),
        v(blocks["ln_cross"]["scale"]), v(blocks["ln_cross"]["bias"]),
        v(cross["q"]["b"]), v(cross["o"]["b"]),
        v(blocks["ln2"]["scale"]), v(blocks["ln2"]["bias"]),
        v(mlp["fc1"]["b"]), v(mlp["fc2"]["b"]),
        s_qkv, s_o, s_cq, s_co, s_f1, s_f2,
    ], axis=-1)
    # (L, 1, VEC): the layer axis must stay OUTSIDE the tiled (last two)
    # dims so the kernel's .at[l] slice needs no 8-row alignment
    vecs = vecs[:, None, :]
    return {
        "vecs": vecs,                                        # (L, 1, VEC)
        "wq8": jnp.concatenate([q_qkv, q_o, q_cq, q_co], axis=-1),
        "wf18": q_f1,                                        # (L, d, ff)
        "wf28": q_f2,                                        # (L, ff, d)
    }


def _vec_offsets(d: int, ff: int):
    sizes = [d, d, 3 * d, d, d, d, d, d, d, d, ff, d,   # LN/bias segments
             3 * d, d, d, d, ff, d]                      # dequant scales
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return offs, int(offs[-1])


# ---------------------------------------------------------------------------
# jnp reference (CPU tests / documentation of the exact math)
# ---------------------------------------------------------------------------

def fused_decoder_layers_reference(
    x: jax.Array,                 # (R, d) bf16/f32, R = Bw*K
    wpack: Dict[str, jax.Array],
    ckv: jax.Array,               # (L, Bw, 2H, dh, M) packed self-cache
    xkv8: jax.Array,              # (L, Bw, 2H, dh, TaP) packed int8 cross
    xsc: jax.Array,               # (L, Bw, 2HP, TaP) f32 packed scales
    amask: jax.Array,             # (Bw, K, M) f32 additive (hist+own+vs)
    pos: jax.Array,               # scalar int32
    n_head: int, beam_k: int,
    ksc: "jax.Array | None" = None,  # (L, Bw, 2HP, M) f32 — int8 cache
    cmask: "jax.Array | None" = None,  # (>=K, Ta) per-row cross mask
) -> Tuple[jax.Array, ...]:
    """The math the kernel implements, in plain jnp (CPU tests).

    Returns (x_out (R, d), the appended cache (L, Bw, 2H, dh, M)[, the
    appended scales]) — int8 ``ckv`` (with ``ksc``) mirrors the kernel's
    in-kernel quantize-on-append self-cache. ``cmask`` (when given)
    replaces the scale-0 TaP-pad kill with the kernel's per-row additive
    mask — required for the grouped-windows layout, where other windows'
    columns carry nonzero scales."""
    L, Bw, H2, dh, M = ckv.shape
    H = n_head
    HP = xsc.shape[2] // 2
    K = beam_k
    R, d = x.shape
    ff = wpack["wf18"].shape[-1]
    offs, _ = _vec_offsets(d, ff)
    self_int8 = ckv.dtype == jnp.int8

    def ln(xx, s, b, eps=1e-5):
        xf = xx.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(xx.dtype)

    def gemm(h, w8, si, bi):
        # quant.py _quant_matmul_outscale numerics EXACTLY: bf16 x
        # int8-as-bf16 MXU dot, f32 accumulation, output-side scale,
        # f32 bias add (bf16 even off-TPU — outscale hard-casts too)
        y = jnp.dot(h.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = y * vec[int(offs[si]):int(offs[si + 1])][None, :]
        return y + vec[int(offs[bi]):int(offs[bi + 1])][None, :]

    new_layers = []
    new_scales = []
    for l in range(L):
        vec = wpack["vecs"][l, 0]
        h = ln(x, vec[int(offs[0]):int(offs[1])],
               vec[int(offs[1]):int(offs[2])])
        qkv = gemm(h, wpack["wq8"][l][:, :3 * d], 12, 2).astype(h.dtype)
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

        def slab(z):  # (R, d) -> K-minor (Bw, H, dh, K)
            return z.reshape(Bw, K, H, dh).transpose(0, 2, 3, 1)

        new_kv = jnp.concatenate([slab(k), slab(v)], axis=1)  # (Bw,2H,..)
        if self_int8:
            # per-(slot, head) absmax-over-dh quantization (quant_heads)
            nf = new_kv.astype(jnp.float32)
            am = jnp.max(jnp.abs(nf), axis=2)          # (Bw, 2H, K)
            sc = jnp.where(am > 0.0, am / 127.0, 1.0)
            q8 = jnp.clip(jnp.round(nf / sc[:, :, None, :]), -127, 127)
            new_kv = q8.astype(jnp.int8)
            scp = jnp.zeros((Bw, 2 * HP, K), jnp.float32)
            scp = scp.at[:, :H].set(sc[:, :H])
            scp = scp.at[:, HP:HP + H].set(sc[:, H:2 * H])
            ksc_l = jax.lax.dynamic_update_slice(
                ksc[l], scp, (0, 0, pos * K))
            new_scales.append(ksc_l)
        ckv_l = jax.lax.dynamic_update_slice(
            ckv[l], new_kv.astype(ckv.dtype), (0, 0, 0, pos * K))
        new_layers.append(ckv_l)
        # ancestry self-attention over the appended cache (amask includes
        # the own position: t == pos, j == k)
        qw = (q.astype(jnp.float32) * (dh ** -0.5)).astype(q.dtype)
        qw = qw.reshape(Bw, K, H, dh).transpose(0, 2, 1, 3)   # (Bw,H,K,dh)
        lg = jnp.einsum("whkd,whdm->whkm", qw,
                        ckv_l[:, :H].astype(qw.dtype),
                        preferred_element_type=jnp.float32)
        if self_int8:
            lg = lg * ksc_l[:, :H][:, :, None, :]
        lg = lg + amask[:, None]
        pr = jax.nn.softmax(lg, axis=-1)
        if self_int8:
            pr = pr * ksc_l[:, HP:HP + H][:, :, None, :]
        pr = pr.astype(x.dtype)
        att = jnp.einsum("whkm,whdm->whkd", pr,
                         ckv_l[:, H:].astype(pr.dtype),
                         preferred_element_type=jnp.float32)
        att = att.transpose(0, 2, 1, 3).reshape(R, d).astype(x.dtype)
        x = x + gemm(att, wpack["wq8"][l][:, 3 * d:4 * d], 13, 3
                     ).astype(x.dtype)

        h = ln(x, vec[int(offs[4]):int(offs[5])],
               vec[int(offs[5]):int(offs[6])])
        cq = gemm(h, wpack["wq8"][l][:, 4 * d:5 * d], 14, 6).astype(h.dtype)
        qx = cq.reshape(Bw, K, H, dh).transpose(0, 2, 1, 3)  # (Bw,H,K,dh)
        ks = xsc[l][:, :H]                     # (Bw, H, TaP)
        vs = xsc[l][:, HP:HP + H]
        lgx = jnp.einsum("whkd,whdt->whkt", qx.astype(jnp.float32),
                         xkv8[l][:, :H].astype(jnp.float32))
        lgx = lgx * ks[:, :, None, :]
        if cmask is not None:
            lgx = lgx + cmask[:K][None, None]            # per-row mask
        else:
            lgx = jnp.where(ks[:, :, None, :] == 0.0, NEG, lgx)  # pad kill
        px = jax.nn.softmax(lgx, axis=-1) * vs[:, :, None, :]
        atx = jnp.einsum("whkt,whdt->whkd", px,
                         xkv8[l][:, H:].astype(jnp.float32))
        atx = atx.transpose(0, 2, 1, 3).reshape(R, d).astype(x.dtype)
        x = x + gemm(atx, wpack["wq8"][l][:, 5 * d:6 * d], 15, 7
                     ).astype(x.dtype)

        h = ln(x, vec[int(offs[8]):int(offs[9])],
               vec[int(offs[9]):int(offs[10])])
        h1 = gemm(h, wpack["wf18"][l], 16, 10)
        # the kernel's A-S erf fit, not lax.erf: this function is the
        # golden model of the KERNEL's math, and in int8 self-cache mode
        # a 1e-6 erf delta flips quantized values at rounding boundaries
        h1 = (0.5 * h1 * (1.0 + _erf_as(h1 / np.sqrt(2.0)))
              ).astype(h.dtype)
        x = x + gemm(h1, wpack["wf28"][l], 17, 11).astype(h1.dtype)
    if self_int8:
        return (x, jnp.stack(new_layers, axis=0),
                jnp.stack(new_scales, axis=0))
    return x, jnp.stack(new_layers, axis=0)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_kernel(RP: int, d: int, ff: int, H: int, dh: int, Bw: int,
                 K: int, KP: int, M: int, Ta: int, HP: int, dtype,
                 self_int8: bool):
    """Build the layer-grid kernel body for static dims.

    ``self_int8``: the self-cache is int8 with per-(slot, head) f32
    scales in a companion (L, Bw, 2HP, M) array — the kernel quantises
    the appended K/V in-kernel (absmax over dh, the ops/quant.py grid)
    and applies the scales on the logits (k) / probabilities (v) exactly
    like the int8 cross attention. Halves the dominant self stream and
    the cache HBM. When False the scale operands are unused dummies."""
    offs, VEC = _vec_offsets(d, ff)
    rsq = float(dh) ** -0.5
    n_bk = max(2, M // 128)   # x128 fetch buckets (M has a slack tile)
    cdt = jnp.int8 if self_int8 else dtype

    def kernel(posk_ref,                                    # SMEM (1,)
               x_ref,                                       # (RP, d) VMEM
               amask_ref,                                   # (Bw,KP,M) VMEM
               cmask_ref,                                   # (8, Ta) VMEM
               vecs_ref,                                    # (L,1,VEC) HBM
               wq_ref, wf1_ref, wf2_ref,                    # ANY int8
               ckv_in_ref,                                  # ANY bf16/int8
               xkv_ref, xsc_ref,                            # ANY
               ksc_in_ref,                                  # ANY f32 scales
               *rest):
        (x_out_ref, ckv_ref, ksc_ref) = rest[:3]
        dec_scr = rest[3:]
        (xs, wqb, wf1b, wf2b, vecv, sb, ssb, cb, csb, h3, attT, h1s,
         accs,
         sem_v, sem_wq, sem_wf1, sem_wf2, sem_s, sem_ss, sem_c,
         sem_cs, sem_wb, sem_wbs) = dec_scr
        l = pl.program_id(0)
        nL = pl.num_programs(0)
        posk = posk_ref[0]
        # append window: the K new lanes land at [posk, posk+K). ~96% of
        # steps (posk % 128 <= 128-K) they fit ONE 128-lane tile; the
        # rest straddle two, where the slack tile in M guarantees
        # atile*128 + 256 <= M. Narrow (128-wide) appends halve the
        # placement/select work AND the write-back bytes vs an
        # always-256 window.
        atile = posk // 128
        aoff = posk - atile * 128
        straddle = aoff + K > 128
        # fetch extent: the x128 tiles covering the post-append valid
        # prefix [0, posk+K) — which also covers the append window
        bid = jnp.clip((posk + K + 127) // 128, 2, n_bk)

        def w_get(ref, buf, sem, li):
            slot = jax.lax.rem(li, 2)
            return pltpu.make_async_copy(ref.at[li], buf.at[slot],
                                         sem.at[slot])

        def w_start_all(li):
            w_get(vecs_ref, vecv, sem_v, li).start()
            w_get(wq_ref, wqb, sem_wq, li).start()
            w_get(wf1_ref, wf1b, sem_wf1, li).start()
            w_get(wf2_ref, wf2b, sem_wf2, li).start()

        def s_copy(slot, li, w):
            # bucketed fetch: only the x128 tiles covering the valid
            # history + append window stream; the VMEM tail beyond stays
            # ZERO (init below) so the full-M dots read 0s that the NEG
            # amask kills — correctness never depends on the bucket.
            for bi in range(2, n_bk + 1):
                @pl.when(bid == bi)
                def _():
                    pltpu.make_async_copy(
                        ckv_in_ref.at[li, w, :, :, pl.ds(0, bi * 128)],
                        sb.at[slot, :, :, pl.ds(0, bi * 128)],
                        sem_s.at[slot]).start()
                    if self_int8:
                        pltpu.make_async_copy(
                            ksc_in_ref.at[li, w, :, pl.ds(0, bi * 128)],
                            ssb.at[slot, :, pl.ds(0, bi * 128)],
                            sem_ss.at[slot]).start()

        def s_wait(slot):
            for bi in range(2, n_bk + 1):
                @pl.when(bid == bi)
                def _():
                    pltpu.make_async_copy(
                        ckv_in_ref.at[0, 0, :, :, pl.ds(0, bi * 128)],
                        sb.at[slot, :, :, pl.ds(0, bi * 128)],
                        sem_s.at[slot]).wait()
                    if self_int8:
                        pltpu.make_async_copy(
                            ksc_in_ref.at[0, 0, :, pl.ds(0, bi * 128)],
                            ssb.at[slot, :, pl.ds(0, bi * 128)],
                            sem_ss.at[slot]).wait()

        def wb_copy(slot, li, w, wd):
            # append write-back: the wd-wide ALIGNED window, into the
            # ALIASED cache output (the rest of the buffer is untouched)
            return pltpu.make_async_copy(
                sb.at[slot, :, :, pl.ds(atile * 128, wd)],
                ckv_ref.at[li, w, :, :, pl.ds(atile * 128, wd)],
                sem_wb.at[slot])

        def wbs_copy(slot, li, w, wd):
            # scale write-back companion (int8 self-cache mode)
            return pltpu.make_async_copy(
                ssb.at[slot, :, pl.ds(atile * 128, wd)],
                ksc_ref.at[li, w, :, pl.ds(atile * 128, wd)],
                sem_wbs.at[slot])

        def wb_wait(slot):
            # the wait descriptor's byte count must match the started
            # copy's, and the width is straddle-dependent — branch the
            # same way the start did (straddle is uniform per call)
            @pl.when(straddle)
            def _():
                wb_copy(slot, 0, 0, 256).wait()
                if self_int8:
                    wbs_copy(slot, 0, 0, 256).wait()

            @pl.when(jnp.logical_not(straddle))
            def _():
                wb_copy(slot, 0, 0, 128).wait()
                if self_int8:
                    wbs_copy(slot, 0, 0, 128).wait()

        def c_copy(slot, li, w):
            pltpu.make_async_copy(xkv_ref.at[li, w], cb.at[slot],
                                  sem_c.at[slot]).start()
            pltpu.make_async_copy(xsc_ref.at[li, w], csb.at[slot],
                                  sem_cs.at[slot]).start()

        def c_wait(slot):
            pltpu.make_async_copy(xkv_ref.at[0, 0], cb.at[slot],
                                  sem_c.at[slot]).wait()
            pltpu.make_async_copy(xsc_ref.at[0, 0], csb.at[slot],
                                  sem_cs.at[slot]).wait()

        @pl.when(l == 0)
        def _():
            xs[:] = x_ref[:]
            # no dead-lane hygiene needed: the self-attention dots below
            # are BUCKETED to the fetched width (pl.ds(0, bid*128)), so
            # lanes the DMA never writes are never read either.
            w_start_all(0)
            s_copy(0, 0, 0)
            c_copy(0, 0, 0)

        # prefetch the NEXT layer's weights into the other slot: slot
        # (l+1)%2 was last read by layer l-1, which completed before this
        # program ran (grid steps are sequential on one core)
        @pl.when(l + 1 < nL)
        def _():
            w_start_all(l + 1)

        slot_w = jax.lax.rem(l, 2)

        def seg(i):
            return vecv[slot_w, 0, int(offs[i]):int(offs[i + 1])]

        def lnorm(xf32, i):
            mu = jnp.mean(xf32, -1, keepdims=True)
            var = jnp.mean((xf32 - mu) ** 2, -1, keepdims=True)
            y = (xf32 - mu) * jax.lax.rsqrt(var + 1e-5)
            return (y * seg(i)[None, :] + seg(i + 1)[None, :]).astype(dtype)

        def gemm(h_in, w8, si, bi):
            # _quant_matmul_outscale numerics EXACTLY: bf16 MXU dot
            # (int8 values are exact in bf16; bf16 even in f32 interpret
            # mode, as outscale hard-casts), f32 accumulation, output
            # -side per-channel scale + f32 bias
            y = jax.lax.dot_general(
                h_in.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y * seg(si)[None, :] + seg(bi)[None, :]

        # ---- Mosaic-compatible head handling --------------------------
        # Lane-splitting reshapes ((R, d) -> (.., H, dh)) do not lower;
        # row splits, 2D transposes and batched 3D dots do (probed on
        # this backend). So per-window rows live in the window-major h3
        # buffer (dynamic dim-0 indexing is untiled and always legal)
        # and the head axis comes from a (KP, n) -> (n, KP) relayout +
        # LEADING-split reshape. The relayout runs on the MXU as an
        # identity contraction over the 8-row K axis — NOT as a VPU
        # lane-shuffle transpose: the .T path measured ~0.65 us per
        # (8, 1280) slice, 4.14 ms/step of un-hidden VPU work at B=36
        # (ROADMAP ablation), and batching the shuffles does not help
        # (scripts/probe_batched_transpose.py: batched == per-window).
        # Identity contractions are EXACT (one nonzero term), so kernel
        # math is unchanged. Dim patterns used — (((0,), (0,)), ...) and
        # the batched (((2,), (2,)), ((0,), (0,))) — are both proven to
        # lower on this backend (encoder-kernel GEMMs / the attend dots).
        i_k = (jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 1)
               ).astype(jnp.float32)
        i_k_dt = i_k.astype(dtype)
        i_kb = jnp.broadcast_to(i_k_dt[None], (Bw, KP, KP))

        def rows_to_heads(rows_kn):
            # (KP, n) dtype value -> (n, KP) via MXU identity contraction
            # over the KP rows; caller reshapes (n, KP) -> (.., dh, KP)
            # as a free leading split
            return jax.lax.dot_general(
                rows_kn, i_k_dt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (n, KP)

        def heads_to_cols(att_hkd):
            # (H, KP, dh) f32 -> (d, KP): transpose KP<->dh on the MXU
            # via the identity, then a free leading merge. The (KP, d)
            # row form is recovered for ALL windows at once after the
            # window loop by ONE batched identity dot (attT_to_rows) —
            # not per-window VPU transposes.
            t = jax.lax.dot_general(
                att_hkd, i_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (H, dh, KP)
            return t.reshape(d, KP)

        def attT_to_rows(attT_all):
            # (Bw, d, KP) dtype -> (RP, d) f32: one batched identity dot
            # (the attend-dot (((2,),(2,)),((0,),(0,))) pattern)
            r = jax.lax.dot_general(
                i_kb, attT_all,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (Bw, KP, d)
            return r.reshape(RP, d)

        # one-hot placement: P[j, c] = (c == aoff + j) for j < K — the
        # MXU shifts the new K/V rows to their (unaligned) target lanes
        # inside the aligned append window. Built at BOTH widths; the
        # straddle branch picks one.
        def place_mats(wd):
            cj = jax.lax.broadcasted_iota(jnp.int32, (KP, wd), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (KP, wd), 1)
            pp = ((cc == aoff + cj) & (cj < K)).astype(dtype)
            # full-shape select masks: Mosaic cannot relayout a broadcast
            # of a (1, 1, wd) bool into the (2H, dh, wd) where()
            ci3 = jax.lax.broadcasted_iota(jnp.int32, (2 * H, dh, wd), 2)
            li3 = (ci3 >= aoff) & (ci3 < aoff + K)      # (2H,dh,wd)
            ci2 = jax.lax.broadcasted_iota(jnp.int32, (2 * HP, wd), 1)
            li2 = (ci2 >= aoff) & (ci2 < aoff + K)      # (2HP,wd)
            return pp, pp.astype(jnp.float32), li3, li2

        pmats = {wd: place_mats(wd) for wd in (128, 256)}

        # ==================== self-attention block ====================
        pltpu.make_async_copy(vecs_ref.at[l], vecv.at[slot_w],
                              sem_v.at[slot_w]).wait()
        h = lnorm(xs[:].astype(jnp.float32), 0)
        pltpu.make_async_copy(wq_ref.at[l], wqb.at[slot_w],
                              sem_wq.at[slot_w]).wait()
        qkv = gemm(h, wqb[slot_w][:, :3 * d], 12, 2)
        h3[:] = qkv.astype(dtype).reshape(Bw, KP, 3 * d)

        def quant_heads(x_hdk):
            # (H, dh, KP) -> int8-valued f32 (H, dh, KP) + scales (H, KP)
            # — the ops/quant.py grid, per (slot, head) over dh
            xf = x_hdk.astype(jnp.float32)
            am = jnp.max(jnp.abs(xf), axis=1)           # (H, KP)
            sc = jnp.where(am > 0.0, am / 127.0, 1.0)
            q = jnp.clip(jnp.round(xf / sc[:, None, :]), -127.0, 127.0)
            return q, sc

        def self_window(w, _):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < Bw)
            def _():
                # slot (w+1)%2's append write-back (window w-1) must
                # drain before the fetch overwrites the staging buffer
                @pl.when(w >= 1)
                def _():
                    wb_wait(jax.lax.rem(w + 1, 2))
                s_copy(jax.lax.rem(w + 1, 2), l, w + 1)

            # ONE (KP, 3d) -> (3d, KP) MXU relayout covers q, k AND v;
            # head splits are then free leading-row splits
            qkvT = rows_to_heads(h3[w])                 # (3d, KP) f32
            qh3 = (qkvT[:d] * rsq).astype(dtype).reshape(H, dh, KP)
            kh3 = qkvT[d:2 * d].astype(dtype).reshape(H, dh, KP)
            vh3 = qkvT[2 * d:3 * d].astype(dtype).reshape(H, dh, KP)
            if self_int8:
                kq, ksc_new = quant_heads(kh3)
                vq, vsc_new = quant_heads(vh3)
                kh3, vh3 = kq.astype(dtype), vq.astype(dtype)
            s_wait(slot)

            # ---- in-kernel cache append (width-parameterized) ----
            def append_at(wd):
                pp, ppf, li3, li2 = pmats[wd]
                placed_k = jax.lax.dot_general(
                    kh3, pp, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (H, dh, wd)
                placed_v = jax.lax.dot_general(
                    vh3, pp, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                tile = sb[slot, :, :, pl.ds(atile * 128, wd)]
                placed = jnp.concatenate(
                    [placed_k, placed_v], axis=0).astype(cdt)  # (2H,..)
                sb[slot, :, :, pl.ds(atile * 128, wd)] = jnp.where(
                    li3, placed, tile)
                wb_copy(slot, l, w, wd).start()
                if self_int8:
                    # scales ride the same placement matmul; rows :H = k,
                    # HP:HP+H = v (8-row-padded head axis, DMA tiling)
                    ksc_p = jax.lax.dot_general(
                        ksc_new.astype(jnp.float32), ppf,
                        dimension_numbers=(((1,), (0,)), ((), ())))
                    vsc_p = jax.lax.dot_general(
                        vsc_new.astype(jnp.float32), ppf,
                        dimension_numbers=(((1,), (0,)), ((), ())))
                    stile = ssb[slot, :, pl.ds(atile * 128, wd)]
                    sc_p = jnp.concatenate([
                        ksc_p, jnp.zeros((HP - H, wd), jnp.float32),
                        vsc_p, jnp.zeros((HP - H, wd), jnp.float32),
                    ], axis=0)
                    ssb[slot, :, pl.ds(atile * 128, wd)] = jnp.where(
                        li2, sc_p, stile)
                    wbs_copy(slot, l, w, wd).start()

            @pl.when(straddle)
            def _():
                append_at(256)

            @pl.when(jnp.logical_not(straddle))
            def _():
                append_at(128)
            # ---- attention over the post-append cache ----
            # BUCKETED to the fetched width: lanes in [posk+K, bi*128)
            # are init-zeros under a NEG amask (exp -> exactly 0.0), so
            # the narrow dots are bit-identical to full-M dots while the
            # MXU/VPU work tracks the cache fill instead of staying
            # fill-independent (the full-M dots measured 3.06 ms/step of
            # UN-HIDDEN compute at B=36 — the DMA can't hide them).
            def attend(wd):
                lg = jax.lax.dot_general(
                    qh3, sb[slot, :H, :, pl.ds(0, wd)].astype(dtype),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, K, wd)
                if self_int8:
                    lg = lg * ssb[slot, :H, pl.ds(0, wd)][:, None, :]
                lg = lg + amask_ref[w, :, pl.ds(0, wd)][None]
                mx = jnp.max(lg, -1, keepdims=True)
                ex = jnp.exp(lg - mx)
                pr = ex / jnp.sum(ex, -1, keepdims=True)
                if self_int8:
                    pr = pr * ssb[slot, HP:HP + H, pl.ds(0, wd)][:, None]
                att = jax.lax.dot_general(
                    pr.astype(dtype),
                    sb[slot, H:2 * H, :, pl.ds(0, wd)].astype(dtype),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, K, dh)
                attT[w] = heads_to_cols(att).astype(dtype)

            for bi in range(2, n_bk + 1):
                @pl.when(bid == bi)
                def _(bi=bi):
                    attend(bi * 128)
            return 0

        jax.lax.fori_loop(0, Bw, self_window, 0)
        # drain the pending append write-backs: window Bw-1's, and
        # window Bw-2's (its in-loop wait site — iteration Bw-1's
        # prefetch block — never runs, as there is no window Bw)
        wb_wait(jax.lax.rem(Bw - 1, 2))
        if Bw >= 2:
            wb_wait(jax.lax.rem(Bw - 2, 2))

        # layer l+1's window-0 self fetch: both slots' reads completed
        # inside the loop above; the data is needed only after l+1's qkv
        # GEMM, a full cross+MLP block away
        @pl.when(l + 1 < nL)
        def _():
            s_copy(0, l + 1, 0)

        att_all = attT_to_rows(attT[:]).astype(dtype)   # batched relayout
        accs[:] = xs[:].astype(jnp.float32) + gemm(
            att_all, wqb[slot_w][:, 3 * d:4 * d], 13, 3)
        xs[:] = accs[:].astype(dtype)

        # ==================== cross-attention block ====================
        h = lnorm(accs[:], 4)
        cq = gemm(h, wqb[slot_w][:, 4 * d:5 * d], 14, 6)
        h3[:, :, :d] = cq.astype(dtype).reshape(Bw, KP, d)

        def cross_window(w, _):
            slot = jax.lax.rem(w, 2)

            @pl.when(w + 1 < Bw)
            def _():
                c_copy(jax.lax.rem(w + 1, 2), l, w + 1)

            qh3 = rows_to_heads(h3[w][:, :d]).astype(dtype).reshape(
                H, dh, KP)
            c_wait(slot)
            lg = jax.lax.dot_general(
                qh3, cb[slot][:H].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (H, KP, Ta)
            lg = lg * csb[slot][:H][:, None, :]         # ks (incl 1/sqrt)
            # PER-ROW mask (KP, Ta): Ta-pad kill for the beam path (all
            # rows identical), block-diagonal window isolation for the
            # grouped-windows greedy path (row j sees only window j's
            # Ta segment — group_cross_mega)
            lg = lg + cmask_ref[:, :][None]
            mx = jnp.max(lg, -1, keepdims=True)
            ex = jnp.exp(lg - mx)
            pr = ex / jnp.sum(ex, -1, keepdims=True)
            pv = (pr * csb[slot][HP:HP + H][:, None, :]).astype(dtype)
            atx = jax.lax.dot_general(
                pv, cb[slot][H:2 * H].astype(dtype),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (H, KP, dh)
            attT[w] = heads_to_cols(atx).astype(dtype)
            return 0

        jax.lax.fori_loop(0, Bw, cross_window, 0)

        # layer l+1's window-0 cross fetch (see the self-stream note)
        @pl.when(l + 1 < nL)
        def _():
            c_copy(0, l + 1, 0)

        atx_all = attT_to_rows(attT[:]).astype(dtype)   # batched relayout
        accs[:] = accs[:] + gemm(atx_all, wqb[slot_w][:, 5 * d:6 * d],
                                 15, 7)
        xs[:] = accs[:].astype(dtype)

        # ==================== MLP block ====================
        h = lnorm(accs[:], 8)
        pltpu.make_async_copy(wf1_ref.at[l], wf1b.at[slot_w],
                              sem_wf1.at[slot_w]).wait()
        h1 = gemm(h, wf1b[slot_w], 16, 10)
        # erf-GeLU with an in-kernel erf: Mosaic lowers neither erfc
        # (jax.nn.gelu exact) nor lax.erf — Abramowitz-Stegun 7.1.26 fit
        h1s[:] = (0.5 * h1 * (1.0 + _erf_as(
            h1 * np.float32(1 / np.sqrt(2.0))))).astype(dtype)
        pltpu.make_async_copy(wf2_ref.at[l], wf2b.at[slot_w],
                              sem_wf2.at[slot_w]).wait()
        accs[:] = accs[:] + gemm(h1s[:], wf2b[slot_w], 17, 11)
        xs[:] = accs[:].astype(dtype)

        @pl.when(l == nL - 1)
        def _():
            x_out_ref[:] = xs[:]

    return kernel, VEC


@functools.partial(jax.jit,
                   static_argnames=("n_head", "beam_k", "interpret",
                                    "k_stride"))
def fused_decoder_layers(
    x: jax.Array,                 # (R, d) bf16
    wpack: Dict[str, jax.Array],
    ckv: jax.Array,               # (L, Bw, 2H, dh, M) packed self-cache
    xkv8: jax.Array,              # (L, Bw, 2H, dh, TaP) packed int8 cross
    xsc: jax.Array,               # (L, Bw, 2HP, TaP) f32 packed scales
    cmask: jax.Array,             # (8, TaP) f32 — TaP-pad columns dead
    amask: jax.Array,             # (Bw, K, M) f32 (include_own mask)
    pos: jax.Array,
    n_head: int, beam_k: int,
    ksc: "jax.Array | None" = None,  # (L, Bw, 2HP, M) f32 — int8 cache
    interpret: bool = False,
    k_stride: "int | None" = None,
) -> Tuple[jax.Array, ...]:
    """Run the full decoder layer stack for one beam step.

    Returns (x_out (R, d), the APPENDED cache (L, Bw, 2H, dh, M)[, the
    appended scales]) — cache (and scales, when the cache is int8) are
    aliased in-place outputs (the kernel writes only the 256-lane append
    windows). An int8 ``ckv`` requires ``ksc``, the per-(slot, head)
    scale array; the kernel quantises appended K/V in-kernel.

    ``k_stride``: the cache minor's TRUE per-position stride when it
    differs from ``beam_k`` — the S-token verify variant appends
    S*group rows per step into a group-minor (stride=group) cache, so
    the append base lane is ``pos * k_stride`` while ``beam_k`` (=
    S*group) rows land on the S*group consecutive lanes above it
    (m = (pos+s)*group + j, rows ordered s-major). Default: beam_k."""
    L, Bw, H2, dh, M = ckv.shape
    K = beam_k
    H = n_head
    R, d = x.shape
    ff = wpack["wf18"].shape[-1]
    Ta = xkv8.shape[-1]
    HP = xsc.shape[2] // 2
    dtype = x.dtype
    self_int8 = ckv.dtype == jnp.int8
    if self_int8 and ksc is None:
        raise ValueError("int8 self-cache requires the ksc scale array")
    if M < 256:
        raise ValueError(
            "mega cache minor must be >= 256 (init_kv_cache beam_k "
            f"layout allocates the x128 slack tile); got M={M}")
    # rows pad K -> KP=8 per window: Mosaic's batched-dot lowering merges
    # (H, K, dh) -> (H*K, dh), which needs the second-minor to be a
    # multiple of the 8-row sublane tile. The pad rows carry garbage that
    # the padded amask (NEG rows) and the placement matrix discard.
    KP = ((K + 7) // 8) * 8
    RP = Bw * KP
    xp = jnp.zeros((Bw, KP, d), dtype).at[:, :K].set(
        x.reshape(Bw, K, d)).reshape(RP, d)
    amp = jnp.full((Bw, KP, M), NEG, jnp.float32).at[:, :K].set(amask)
    # the cross mask is applied PER ROW (KP, Ta) in-kernel; a beam-path
    # (8, Ta) mask (rows identical) tiles exactly to any KP
    if cmask.shape[0] != KP:
        reps = -(-KP // cmask.shape[0])
        cmask = jnp.tile(cmask, (reps, 1))[:KP]
    kernel, VEC = _make_kernel(RP, d, ff, H, dh, Bw, K, KP, M, Ta, HP,
                               dtype, self_int8)
    if ksc is None:
        # unused dummy (uniform kernel operand layout); never DMA'd
        ksc = jnp.zeros((1, 1, 8, 128), jnp.float32)

    posk = (jnp.asarray(pos, jnp.int32) * (k_stride or K)).reshape(1)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),    # x
        pl.BlockSpec(memory_space=pltpu.VMEM),    # amask
        pl.BlockSpec(memory_space=pltpu.VMEM),    # cmask
        pl.BlockSpec(memory_space=pl.ANY),        # vecs
        pl.BlockSpec(memory_space=pl.ANY),        # wq8
        pl.BlockSpec(memory_space=pl.ANY),        # wf18
        pl.BlockSpec(memory_space=pl.ANY),        # wf28
        pl.BlockSpec(memory_space=pl.ANY),        # ckv
        pl.BlockSpec(memory_space=pl.ANY),        # xkv8
        pl.BlockSpec(memory_space=pl.ANY),        # xsc
        pl.BlockSpec(memory_space=pl.ANY),        # ksc
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),    # x_out
        pl.BlockSpec(memory_space=pl.ANY),        # ckv (aliased)
        pl.BlockSpec(memory_space=pl.ANY),        # ksc (aliased)
    ]
    scratch_shapes = [
        pltpu.VMEM((RP, d), dtype),               # xs (persistent)
        pltpu.VMEM((2, d, 6 * d), jnp.int8),      # wqb
        pltpu.VMEM((2, d, ff), jnp.int8),         # wf1b
        pltpu.VMEM((2, ff, d), jnp.int8),         # wf2b
        pltpu.VMEM((2, 1, VEC), jnp.float32),     # vecv
        pltpu.VMEM((2, 2 * H, dh, M),
                   jnp.int8 if self_int8 else dtype),  # sb
        pltpu.VMEM((2, 2 * HP, M) if self_int8 else (2, 8, 128),
                   jnp.float32),                  # ssb (self scales)
        pltpu.VMEM((2, 2 * H, dh, Ta), jnp.int8),  # cb (cross kv)
        pltpu.VMEM((2, 2 * HP, Ta), jnp.float32),  # csb (cross sc)
        pltpu.VMEM((Bw, KP, 3 * d), dtype),       # h3 (window rows)
        pltpu.VMEM((Bw, d, KP), dtype),           # attT (att cols)
        pltpu.VMEM((RP, ff), dtype),              # h1s (MLP temp)
        pltpu.VMEM((RP, d), jnp.float32),         # accs
        pltpu.SemaphoreType.DMA((2,)),            # sem_v
        pltpu.SemaphoreType.DMA((2,)),            # sem_wq
        pltpu.SemaphoreType.DMA((2,)),            # sem_wf1
        pltpu.SemaphoreType.DMA((2,)),            # sem_wf2
        pltpu.SemaphoreType.DMA((2,)),            # sem_s
        pltpu.SemaphoreType.DMA((2,)),            # sem_ss
        pltpu.SemaphoreType.DMA((2,)),            # sem_c
        pltpu.SemaphoreType.DMA((2,)),            # sem_cs
        pltpu.SemaphoreType.DMA((2,)),            # sem_wb
        pltpu.SemaphoreType.DMA((2,)),            # sem_wbs
    ]
    out_shape = [
        jax.ShapeDtypeStruct((RP, d), dtype),
        jax.ShapeDtypeStruct(ckv.shape, ckv.dtype),
        jax.ShapeDtypeStruct(ksc.shape, jnp.float32),
    ]
    # operand index 8 = ckv, 11 = ksc (posk scalar-prefetch is operand
    # 0); outputs 1/2 = the appended cache and scales, aliased in-place
    aliases = {8: 1, 11: 2}
    operands = [posk, xp, amp, cmask, wpack["vecs"], wpack["wq8"],
                wpack["wf18"], wpack["wf28"], ckv, xkv8, xsc, ksc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    x_out, ckv_new, ksc_new = outs[:3]
    x_out = x_out.reshape(Bw, KP, d)[:, :K].reshape(R, d)
    return (x_out, ckv_new, ksc_new) if self_int8 else (x_out, ckv_new)
