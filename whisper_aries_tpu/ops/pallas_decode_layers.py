"""Fused all-layers decode-step megakernel (TPU Pallas).

The beam decode step is per-op-overhead-bound: the unrolled 32-layer XLA
decoder_step is ~500 ops x ~40 us fixed cost (~16 ms at batch 24 x beam 5)
against a ~5 ms HBM roofline, and every XLA-level restructuring measured
this round moved ops around without removing them (ROADMAP.md round-3
anatomy). This kernel runs the ENTIRE per-layer stack — LN1 -> fused qkv
GEMM -> ancestry self-attention (K-minor append-only cache, lazy beam
reorder) -> out proj -> LN -> int8 cross-attention -> out proj -> LN2 ->
MLP — as ONE pallas_call with grid=(n_layers,): activations stay resident
in VMEM scratch across grid steps, weights/KV stream from HBM with
double-buffered DMA, and the per-op dispatch cost is paid once per step
instead of ~500 times.

Replaces (when enabled): the layer loop of models/whisper.py::decoder_step
for S==1 ancestry-mode beam steps (beam_reorder="mega"). Embedding, the
final LayerNorm + vocab GEMM, the cache append (two dynamic_update_slice
ops over the kernel's exported slabs), and the beam machinery stay in XLA.

Numerics mirror the XLA path: LN in f32; GEMMs bf16 x bf16 with f32
accumulation; self-attention logits f32 with the additive ancestry mask
(the step's own K/V scores as an extra concatenated softmax column,
computed from VMEM); cross-attention is the int8 dequant math of
ops/pallas_cross_attn.py::cross_attention_q8_reference (logits*ks,
probs*vs, flash-accumulated over time chunks); erf GeLU via the
Abramowitz-Stegun fit (_erf_as). Parity is tested against the XLA beam
decode in interpret mode (tests/test_decode.py
::test_beam_mega_kernel_parity).

Mosaic lowering rules this design is shaped by (probed on this backend):
  * lane-splitting value reshapes ((R, d) -> (.., H, dh)) do not lower;
    ROW splits/merges at 8-row granularity, 2D transposes, and batched 3D
    dot_generals do. Head axes therefore come from transpose ->
    leading-split ((KP, d) -> (d, KP) -> (H, dh, KP)) and return through
    a tiny identity matmul.
  * every DMA slice needs the tiled (last two) dims' logical extents to
    EQUAL the physical padded ones, and dynamic offsets to be provably
    tile-aligned: hence the x128-padded K-minor cache minor
    (init_kv_cache), the (L, Bw, HP, Ta) padded-head cross-scale layout
    (pack_cross_mega), NC=256/128 weight chunks, and per-window rows held
    in a (Bw, KP=8, 3d) window-major buffer (dynamic dim-0 indexing is
    untiled and always legal).
  * rows pad K -> KP=8 per window (batched-dot lowering merges
    (H, K, dh) -> (H*K, dh) and needs 8-row alignment); the pad rows ride
    the GEMMs (~+K/KP MXU on a DMA-bound step) and are masked/discarded.

Reference parity anchor: CTranslate2's fused decode step (the reference's
WhisperModel engine, SURVEY.md N1) — same motivation, TPU-native design.
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
    """Stacked decoder blocks -> the kernel's flat weight dict.

    All small per-layer vectors (LN scales/biases, GEMM biases) pack into
    ONE (L, VEC) f32 array so each layer costs a single small DMA instead
    of nine. Layout (offsets are static per dims):
      [ln1.s, ln1.b, qkv.b, o.b, lnc.s, lnc.b, cq.b, co.b,
       ln2.s, ln2.b, fc1.b, fc2.b]
    Requires the fused-qkv tree (models/whisper.py::fuse_decoder_qkv).
    """
    attn = blocks["attn"]
    cross = blocks["cross"]
    mlp = blocks["mlp"]
    if "qkv" not in attn:
        raise ValueError("pack_layer_weights needs the fused-qkv tree")

    def v(x):
        return jnp.asarray(x).astype(jnp.float32)

    vecs = jnp.concatenate([
        v(blocks["ln1"]["scale"]), v(blocks["ln1"]["bias"]),
        v(attn["qkv"]["b"]), v(attn["o"]["b"]),
        v(blocks["ln_cross"]["scale"]), v(blocks["ln_cross"]["bias"]),
        v(cross["q"]["b"]), v(cross["o"]["b"]),
        v(blocks["ln2"]["scale"]), v(blocks["ln2"]["bias"]),
        v(mlp["fc1"]["b"]), v(mlp["fc2"]["b"]),
    ], axis=-1)
    # (L, 1, VEC): the layer axis must stay OUTSIDE the tiled (last two)
    # dims so the kernel's .at[l] slice needs no 8-row alignment
    vecs = vecs[:, None, :]
    return {
        "vecs": vecs,                                  # (L, 1, VEC) f32
        "wqkv": jnp.asarray(attn["qkv"]["w"]),         # (L, d, 3d)
        "wo": jnp.asarray(attn["o"]["w"]),             # (L, d, d)
        "wcq": jnp.asarray(cross["q"]["w"]),           # (L, d, d)
        "wco": jnp.asarray(cross["o"]["w"]),           # (L, d, d)
        "wf1": jnp.asarray(mlp["fc1"]["w"]),           # (L, d, ff)
        "wf2": jnp.asarray(mlp["fc2"]["w"]),           # (L, ff, d)
    }


def _vec_offsets(d: int, ff: int):
    sizes = [d, d, 3 * d, d, d, d, d, d, d, d, ff, d]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return offs, int(offs[-1])


# ---------------------------------------------------------------------------
# jnp reference (CPU tests / documentation of the exact math)
# ---------------------------------------------------------------------------

def fused_decoder_layers_reference(
    x: jax.Array,                 # (R, d) bf16/f32, R = Bw*K
    wpack: Dict[str, jax.Array],
    ck: jax.Array, cv: jax.Array,  # (L, Bw, H, dh, M) K-minor self-cache
    xk8: jax.Array, xks: jax.Array, xv8: jax.Array, xvs: jax.Array,
    amask: jax.Array,             # (Bw, K, M) f32 additive (own+hist+vs)
    pos: jax.Array,               # scalar int32
    n_head: int, beam_k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The math the kernel implements, in plain jnp (CPU tests)."""
    L, Bw, H, dh, M = ck.shape
    K = beam_k
    R, d = x.shape
    ff = wpack["wf1"].shape[-1]
    offs, _ = _vec_offsets(d, ff)

    def ln(xx, s, b, eps=1e-5):
        xf = xx.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(xx.dtype)

    for l in range(L):
        vec = wpack["vecs"][l, 0]

        def seg(i):
            return vec[int(offs[i]):int(offs[i + 1])]

        h = ln(x, seg(0), seg(1))
        qkv = (jnp.dot(h, wpack["wqkv"][l].astype(h.dtype),
                       preferred_element_type=jnp.float32)
               + seg(2)).astype(h.dtype)
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

        def slab(z):  # (R, d) -> K-minor (Bw, H, dh, K)
            return z.reshape(Bw, K, H, dh).transpose(0, 2, 3, 1)

        ck = jax.lax.dynamic_update_slice(
            ck, slab(k)[None].astype(ck.dtype), (l, 0, 0, 0, pos * K))
        cv = jax.lax.dynamic_update_slice(
            cv, slab(v)[None].astype(cv.dtype), (l, 0, 0, 0, pos * K))
        # ancestry self-attention over the window's K slots
        qw = (q.astype(jnp.float32) * (dh ** -0.5)).astype(q.dtype)
        qw = qw.reshape(Bw, K, H, dh).transpose(0, 2, 1, 3)   # (Bw,H,K,dh)
        lg = jnp.einsum("whkd,whdm->whkm", qw, ck[l],
                        preferred_element_type=jnp.float32)
        lg = lg + amask[:, None]
        pr = jax.nn.softmax(lg, axis=-1).astype(cv.dtype)
        att = jnp.einsum("whkm,whdm->whkd", pr, cv[l],
                         preferred_element_type=jnp.float32)
        att = att.transpose(0, 2, 1, 3).reshape(R, d).astype(x.dtype)
        x = x + (jnp.dot(att, wpack["wo"][l].astype(x.dtype),
                         preferred_element_type=jnp.float32)
                 + seg(3)).astype(x.dtype)

        h = ln(x, seg(4), seg(5))
        cq = (jnp.dot(h, wpack["wcq"][l].astype(h.dtype),
                      preferred_element_type=jnp.float32)
              + seg(6)).astype(h.dtype)
        qx = cq.reshape(Bw, K, H, dh).transpose(0, 2, 1, 3)  # (Bw,H,K,dh)
        lgx = jnp.einsum("whkd,whdt->whkt", qx.astype(jnp.float32),
                         xk8[l].astype(jnp.float32))
        lgx = lgx * xks[l]
        px = jax.nn.softmax(lgx, axis=-1) * xvs[l]
        atx = jnp.einsum("whkt,whdt->whkd", px, xv8[l].astype(jnp.float32))
        atx = atx.transpose(0, 2, 1, 3).reshape(R, d).astype(x.dtype)
        x = x + (jnp.dot(atx, wpack["wco"][l].astype(x.dtype),
                         preferred_element_type=jnp.float32)
                 + seg(7)).astype(x.dtype)

        h = ln(x, seg(8), seg(9))
        h1 = (jnp.dot(h, wpack["wf1"][l].astype(h.dtype),
                      preferred_element_type=jnp.float32) + seg(10))
        h1 = (0.5 * h1 * (1.0 + jax.lax.erf(h1 / np.sqrt(2.0)))
              ).astype(h.dtype)
        x = x + (jnp.dot(h1, wpack["wf2"][l].astype(h1.dtype),
                         preferred_element_type=jnp.float32)
                 + seg(11)).astype(h1.dtype)
    return x, ck, cv


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_kernel(RP: int, d: int, ff: int, H: int, dh: int, Bw: int,
                 K: int, KP: int, M: int, Ta: int, NC: int, CT: int,
                 HP: int, dtype):
    """Build the layer-grid kernel body for static dims.

    NC: weight chunk width (divides d, 3d and ff).
    CT: cross-attention time-chunk width (divides Ta).
    """
    offs, VEC = _vec_offsets(d, ff)
    n_d = d // NC
    n_3d = 3 * d // NC
    n_ff = ff // NC
    n_ct = Ta // CT
    rsq = float(dh) ** -0.5

    def kernel(posk_ref,                                    # SMEM (1,)
               x_ref,                                       # (RP, d) VMEM
               amask_ref,                                   # (Bw,KP,M) VMEM
               cmask_ref,                                   # (8, Ta) VMEM
               vecs_ref,                                    # (L,1,VEC) HBM
               wqkv_ref, wo_ref, wcq_ref, wco_ref,          # ANY
               wf1_ref, wf2_ref,                            # ANY
               ck_ref, cv_ref,                              # ANY
               xk8_ref, xks_ref, xv8_ref, xvs_ref,          # ANY
               x_out_ref,                                   # (RP, d) VMEM
               skout_ref, svout_ref,                        # (L,Bw,KP,d)
               xs, wa, wb, vecv, sb, cbk, cbv, csck, cscv,
               h3, skstage, svstage, h1s, accs,
               sem_w, sem_v, sem_s, sem_c, sem_wr):
        l = pl.program_id(0)
        nL = pl.num_programs(0)
        posk = posk_ref[0]

        @pl.when(l == 0)
        def _():
            xs[:] = x_ref[:]

        cvec = pltpu.make_async_copy(vecs_ref.at[l], vecv, sem_v)
        cvec.start()

        def seg(i):
            return vecv[0, int(offs[i]):int(offs[i + 1])]

        def lnorm(xf32, i):
            mu = jnp.mean(xf32, -1, keepdims=True)
            var = jnp.mean((xf32 - mu) ** 2, -1, keepdims=True)
            y = (xf32 - mu) * jax.lax.rsqrt(var + 1e-5)
            return (y * seg(i)[None, :] + seg(i + 1)[None, :]).astype(dtype)

        # ---- chunked GEMM out of HBM weights (double-buffered) ----
        def gemm_chunks(w_ref, h_in, n_chunks, out_cb, bias_seg):
            bias_base = int(offs[bias_seg])

            def get(slot, c):
                return pltpu.make_async_copy(
                    w_ref.at[l, :, pl.ds(c * NC, NC)],
                    wa.at[slot], sem_w.at[slot])

            get(0, 0).start()

            def body(c, _):
                slot = jax.lax.rem(c, 2)
                nxt = jax.lax.rem(c + 1, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    get(nxt, c + 1).start()

                get(slot, c).wait()
                blk = jnp.dot(h_in, wa[slot],
                              preferred_element_type=jnp.float32)
                # bias chunk read straight off the vec ref (Mosaic has no
                # dynamic_slice on values; pl.ds ref reads are fine)
                blk = blk + vecv[0, pl.ds(bias_base + c * NC, NC)][None, :]
                out_cb(c, blk)
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)

        # ---- Mosaic-compatible head handling --------------------------
        # Lane-splitting reshapes ((R, d) -> (.., H, dh)) do not lower;
        # row splits, 2D transposes and batched 3D dots do (probed on
        # this backend). So per-window rows move by DMA (no alignment
        # limits), the head axis comes from transpose -> LEADING-split
        # reshape ((K, d) -> (d, K) -> (H, dh, K)), and the K-sublane
        # attention output returns to row layout through a tiny identity
        # matmul ((H, K, dh) x I_K -> (H, dh, K) -> (d, K) -> (K, d)).
        i_k = (jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 1)
               ).astype(jnp.float32)

        def rows_to_heads(rows_kd):
            # (KP, d) value -> (H, dh, KP)
            return rows_kd.T.reshape(H, dh, KP)

        def heads_to_rows(att_hkd):
            # (H, KP, dh) f32 -> (KP, d): transpose KP<->dh on the MXU
            # via the identity, then leading-merge + 2D transpose
            t = jax.lax.dot_general(
                att_hkd, i_k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (H, dh, KP)
            return t.reshape(d, KP).T                   # (KP, d)

        # window-major staging buffer: per-window row access is a DYNAMIC
        # index on the untiled dim 0 (always legal), where slicing 5 rows
        # out of the (R, ...) row-major layout would need 8-row alignment.
        # GEMM chunks land via a value row-split (R, NC) -> (Bw, K, NC)
        # (row splits lower; lane splits don't).
        def h3_out(c, blk):
            h3[:, :, pl.ds(c * NC, NC)] = blk.reshape(
                Bw, KP, NC).astype(dtype)

        # ==================== self-attention block ====================
        cvec.wait()
        h = lnorm(xs[:].astype(jnp.float32), 0)
        gemm_chunks(wqkv_ref, h, n_3d, h3_out, 2)


        # ---- export the layer's new K/V slabs (the CACHE APPEND happens
        # in XLA after the kernel: writing K unaligned minor columns of
        # the tiled cache from inside the kernel is not expressible —
        # Mosaic requires lane slices to be 128-aligned. The own-position
        # scores instead come straight from VMEM as an extra concatenated
        # softmax column, so the stale cache column is never read.)
        skstage[:] = h3[:, :, d:2 * d]
        svstage[:] = h3[:, :, 2 * d:3 * d]
        dk = pltpu.make_async_copy(skstage, skout_ref.at[l], sem_wr.at[0])
        dv = pltpu.make_async_copy(svstage, svout_ref.at[l], sem_wr.at[1])
        dk.start()
        dv.start()
        # identity over dh: batched K<->dh transposes ride the MXU
        i_dh = (jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 1)
                ).astype(dtype)

        # ---- ancestry attention, double-buffered streams ---------------
        def s_get(slot, w, ref):
            return pltpu.make_async_copy(
                ref.at[l, w], sb.at[slot], sem_s.at[slot])

        s_get(0, 0, ck_ref).start()

        def self_window(w, _):
            slot = jax.lax.rem(w, 2)
            nxt = jax.lax.rem(w + 1, 2)
            qh3 = rows_to_heads(
                (h3[w][:, :d].astype(jnp.float32) * rsq
                 ).astype(dtype))                       # (H, dh, KP)
            kh3 = rows_to_heads(h3[w][:, d:2 * d])
            vh3 = rows_to_heads(h3[w][:, 2 * d:3 * d])
            # (H, K, dh) variants for the own-column math
            qT = jax.lax.dot_general(
                qh3, i_dh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (H, K, dh)
            s_get(slot, w, ck_ref).wait()
            lg = jax.lax.dot_general(
                qh3, sb[slot],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (H, K, M)
            lg = lg + amask_ref[w][None]                # hist+vs only
            # own-position score: q_k . k_k per head, straight from VMEM
            kT = jax.lax.dot_general(
                kh3.astype(jnp.float32), i_dh.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (H, K, dh)
            own = jnp.sum(qT * kT, axis=-1, keepdims=True)  # (H, K, 1)
            lg = jnp.concatenate([lg, own], axis=-1)    # (H, K, M+1)
            mx = jnp.max(lg, -1, keepdims=True)
            ex = jnp.exp(lg - mx)
            pr = (ex / jnp.sum(ex, -1, keepdims=True)).astype(dtype)
            # v streams through the same slot after k is consumed
            s_get(slot, w, cv_ref).start()
            s_get(slot, w, cv_ref).wait()
            att = jax.lax.dot_general(
                pr[:, :, :M], sb[slot],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (H, K, dh)
            vT = jax.lax.dot_general(
                vh3.astype(jnp.float32), i_dh.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (H, K, dh)
            att = att + pr[:, :, M:].astype(jnp.float32) * vT

            @pl.when(w + 1 < Bw)
            def _():
                s_get(nxt, w + 1, ck_ref).start()

            # window w's q/k/v were consumed above; reuse its q region
            h3[w, :, :d] = heads_to_rows(att).astype(dtype)
            return 0

        jax.lax.fori_loop(0, Bw, self_window, 0)
        dk.wait()
        dv.wait()

        att_all = h3[:, :, :d].reshape(RP, d)           # 8-row merge

        def res_out(c, blk):
            accs[:, pl.ds(c * NC, NC)] = (
                xs[:, pl.ds(c * NC, NC)].astype(jnp.float32) + blk)

        gemm_chunks(wo_ref, att_all, n_d, res_out, 3)
        xs[:] = accs[:].astype(dtype)

        # ==================== cross-attention block ====================
        h = lnorm(accs[:], 4)
        gemm_chunks(wcq_ref, h, n_d, h3_out, 6)

        def c_get(slot, w, t):
            # scales arrive in the (L, Bw, HP, Ta) padded-head layout
            # (models/whisper.py::pack_cross_mega — DMA tiling rules)
            return (
                pltpu.make_async_copy(
                    xk8_ref.at[l, w, :, :, pl.ds(t * CT, CT)],
                    cbk.at[slot], sem_c.at[0, slot]),
                pltpu.make_async_copy(
                    xks_ref.at[l, w, :, pl.ds(t * CT, CT)],
                    csck.at[slot], sem_c.at[1, slot]),
                pltpu.make_async_copy(
                    xv8_ref.at[l, w, :, :, pl.ds(t * CT, CT)],
                    cbv.at[slot], sem_c.at[2, slot]),
                pltpu.make_async_copy(
                    xvs_ref.at[l, w, :, pl.ds(t * CT, CT)],
                    cscv.at[slot], sem_c.at[3, slot]),
            )

        for dma in c_get(0, 0, 0):
            dma.start()

        def cross_window(w, _):
            qh3 = rows_to_heads(h3[w][:, :d])           # (H, dh, KP)
            m0 = jnp.full((H, KP, 1), NEG, jnp.float32)
            s0 = jnp.zeros((H, KP, 1), jnp.float32)
            a0 = jnp.zeros((H, KP, dh), jnp.float32)

            def chunk(t, carry):
                m, s, acc = carry
                # slot parity runs GLOBALLY across windows (w*n_ct + t):
                # with odd n_ct a per-window slot would land the next
                # window's first chunk in the wrong buffer
                g = w * n_ct + t
                slot = jax.lax.rem(g, 2)
                for dma in c_get(slot, w, t):
                    dma.wait()

                @pl.when(t + 1 < n_ct)
                def _():
                    for dma in c_get(jax.lax.rem(g + 1, 2), w, t + 1):
                        dma.start()

                @pl.when((t + 1 >= n_ct) & (w + 1 < Bw))
                def _():  # last chunk: prefetch the next window's first
                    for dma in c_get(jax.lax.rem(g + 1, 2), w + 1, 0):
                        dma.start()

                lg = jax.lax.dot_general(
                    qh3.astype(jnp.float32), cbk[slot].astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, KP, CT)
                lg = lg * csck[slot][:H].reshape(H, 1, CT)  # ks
                lg = lg + cmask_ref[0:1, pl.ds(t * CT, CT)][None]
                mn = jnp.maximum(m, jnp.max(lg, -1, keepdims=True))
                corr = jnp.exp(m - mn)
                ex = jnp.exp(lg - mn)
                pv = ex * cscv[slot][:H].reshape(H, 1, CT)  # probs * vs
                upd = jax.lax.dot_general(
                    pv, cbv[slot].astype(jnp.float32),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (H, K, dh)
                s = s * corr + jnp.sum(ex, -1, keepdims=True)
                acc = acc * corr + upd
                return (mn, s, acc)

            m, s, acc = jax.lax.fori_loop(0, n_ct, chunk, (m0, s0, a0))
            atx = acc / s
            h3[w, :, :d] = heads_to_rows(atx).astype(dtype)
            return 0

        jax.lax.fori_loop(0, Bw, cross_window, 0)

        atx_all = h3[:, :, :d].reshape(RP, d)           # 8-row merge
        gemm_chunks(wco_ref, atx_all, n_d, res_out, 7)
        xs[:] = accs[:].astype(dtype)

        # ==================== MLP block ====================
        h = lnorm(accs[:], 8)

        def f1_out(c, blk):
            # erf-GeLU with an in-kernel erf: Mosaic lowers neither erfc
            # (jax.nn.gelu exact) nor lax.erf, so erf comes from the
            # Abramowitz-Stegun 7.1.26 rational fit (|err| < 1.5e-7 —
            # two decades below bf16 activation resolution)
            g = 0.5 * blk * (1.0 + _erf_as(blk * np.float32(1 / np.sqrt(2.0))))
            h1s[:, pl.ds(c * NC, NC)] = g.astype(dtype)

        gemm_chunks(wf1_ref, h, n_ff, f1_out, 10)

        accs[:] = xs[:].astype(jnp.float32) + seg(11)[None, :]

        def f2_get(slot, c):
            return pltpu.make_async_copy(
                wf2_ref.at[l, pl.ds(c * NC, NC), :],
                wb.at[slot], sem_w.at[slot])

        f2_get(0, 0).start()

        def f2_body(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_ff)
            def _():
                f2_get(nxt, c + 1).start()

            f2_get(slot, c).wait()
            accs[:] = accs[:] + jnp.dot(
                h1s[:, pl.ds(c * NC, NC)], wb[slot],
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_ff, f2_body, 0)
        xs[:] = accs[:].astype(dtype)

        @pl.when(l == nL - 1)
        def _():
            x_out_ref[:] = xs[:]

    return kernel, VEC


@functools.partial(jax.jit,
                   static_argnames=("n_head", "beam_k", "interpret"))
def fused_decoder_layers(
    x: jax.Array,                 # (R, d) bf16
    wpack: Dict[str, jax.Array],
    ck: jax.Array, cv: jax.Array,  # (L, Bw, H, dh, M)
    xk8: jax.Array, xks: jax.Array, xv8: jax.Array, xvs: jax.Array,
    cmask: jax.Array,             # (8, Ta) f32 — Ta-pad columns dead
    amask: jax.Array,             # (Bw, K, M) f32
    pos: jax.Array,
    n_head: int, beam_k: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    L, Bw, H, dh, M = ck.shape
    K = beam_k
    R, d = x.shape
    ff = wpack["wf1"].shape[-1]
    Ta = xk8.shape[-1]
    HP = xks.shape[2]
    # chunk width must be a multiple of 128: Mosaic requires dynamic
    # vector-load offsets (the bias reads at c*NC) to be provably
    # lane-aligned. Tiny test dims (d < 128, interpret mode) fall back to
    # whatever divides.
    NC = None
    for cand in (256, 128):
        if d % cand == 0 and (3 * d) % cand == 0 and ff % cand == 0:
            NC = cand
            break
    if NC is None:
        NC = d // 4 if d % 4 == 0 else d
        while (3 * d) % NC or ff % NC:
            NC //= 2
    CT = Ta
    for cand in (512, 384, 256):
        if Ta % cand == 0:
            CT = cand
            break
    dtype = x.dtype
    # rows pad K -> KP=8 per window: Mosaic's batched-dot lowering merges
    # (H, K, dh) -> (H*K, dh), which needs the second-minor to be a
    # multiple of the 8-row sublane tile. The pad rows carry garbage that
    # the padded amask (NEG rows) and the final row slice discard; GEMMs
    # run at RP = Bw*KP rows (+K/KP MXU work on a DMA-bound step).
    KP = ((K + 7) // 8) * 8
    RP = Bw * KP
    xp = jnp.zeros((Bw, KP, d), dtype).at[:, :K].set(
        x.reshape(Bw, K, d)).reshape(RP, d)
    amp = jnp.full((Bw, KP, M), NEG, jnp.float32).at[:, :K].set(amask)
    kernel, VEC = _make_kernel(RP, d, ff, H, dh, Bw, K, KP, M, Ta, NC, CT,
                               HP, dtype)

    posk = (jnp.asarray(pos, jnp.int32) * K).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # x
            pl.BlockSpec(memory_space=pltpu.VMEM),    # amask
            pl.BlockSpec(memory_space=pltpu.VMEM),    # cmask
            pl.BlockSpec(memory_space=pltpu.HBM),  # vecs
            pl.BlockSpec(memory_space=pl.ANY),     # wqkv
            pl.BlockSpec(memory_space=pl.ANY),     # wo
            pl.BlockSpec(memory_space=pl.ANY),     # wcq
            pl.BlockSpec(memory_space=pl.ANY),     # wco
            pl.BlockSpec(memory_space=pl.ANY),     # wf1
            pl.BlockSpec(memory_space=pl.ANY),     # wf2
            pl.BlockSpec(memory_space=pl.ANY),     # ck
            pl.BlockSpec(memory_space=pl.ANY),     # cv
            pl.BlockSpec(memory_space=pl.ANY),     # xk8
            pl.BlockSpec(memory_space=pl.ANY),     # xks
            pl.BlockSpec(memory_space=pl.ANY),     # xv8
            pl.BlockSpec(memory_space=pl.ANY),     # xvs
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # x_out
            pl.BlockSpec(memory_space=pltpu.HBM),     # slabk
            pl.BlockSpec(memory_space=pltpu.HBM),     # slabv
        ],
        scratch_shapes=[
            pltpu.VMEM((RP, d), dtype),               # xs (persistent)
            pltpu.VMEM((2, d, NC), dtype),            # wa (col chunks)
            pltpu.VMEM((2, NC, d), dtype),            # wb (fc2 rows)
            pltpu.VMEM((1, VEC), jnp.float32),        # vecv
            pltpu.VMEM((2, H, dh, M), dtype),         # sb (self stream)
            pltpu.VMEM((2, H, dh, CT), jnp.int8),     # cbk (cross k)
            pltpu.VMEM((2, H, dh, CT), jnp.int8),     # cbv (cross v)
            pltpu.VMEM((2, HP, CT), jnp.float32),     # csck
            pltpu.VMEM((2, HP, CT), jnp.float32),     # cscv
            pltpu.VMEM((Bw, KP, 3 * d), dtype),       # h3 (window rows)
            pltpu.VMEM((Bw, KP, d), dtype),           # skstage
            pltpu.VMEM((Bw, KP, d), dtype),           # svstage
            pltpu.VMEM((RP, ff), dtype),              # h1s (MLP temp)
            pltpu.VMEM((RP, d), jnp.float32),         # accs
            pltpu.SemaphoreType.DMA((2,)),            # sem_w
            pltpu.SemaphoreType.DMA(()),              # sem_v
            pltpu.SemaphoreType.DMA((2,)),            # sem_s
            pltpu.SemaphoreType.DMA((4, 2)),          # sem_c
            pltpu.SemaphoreType.DMA((2,)),            # sem_wr
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((RP, d), dtype),
        jax.ShapeDtypeStruct((L, Bw, KP, d), dtype),
        jax.ShapeDtypeStruct((L, Bw, KP, d), dtype),
    ]
    x_out, slabk, slabv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(posk, xp, amp, cmask, wpack["vecs"], wpack["wqkv"], wpack["wo"],
      wpack["wcq"], wpack["wco"], wpack["wf1"], wpack["wf2"],
      ck, cv, xk8, xks, xv8, xvs)
    x_out = x_out.reshape(Bw, KP, d)[:, :K].reshape(R, d)
    return x_out, slabk, slabv
