#!/usr/bin/env python
"""Isolate the megakernel beam step's costs on TPU.

Times three scans (N iterations inside one jit — the tunnel has a ~30 ms
per-call RTT floor):
  * kernel-only: fused_decoder_layers with x fed back, fixed pos
    (measures the Pallas call alone, at a chosen cache-fill bucket)
  * full fused step: decoder_step_fused (adds embedding, amask build,
    packed-cache DUS append, final LN + vocab GEMM)
at two positions (early/late decode) to expose the valid-prefix bucket
effect on the self stream.

Usage: python scripts/profile_mega_step.py [batch] [iters]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.decoding import generate as G  # noqa: F401
from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.ops.pallas_decode_layers import (
    fused_decoder_layers, pack_layer_weights,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
K = 5
TOK = 100
P = 3

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16
params = W.fuse_decoder_qkv(W.init_params(dims, dtype=dtype))
rng = np.random.default_rng(0)
d = dims.n_text_state
H = dims.n_text_head
dh = d // H
L = dims.n_text_layer

xa = jnp.asarray(
    (0.02 * rng.standard_normal((B, 1500, 1280))).astype(np.float32), dtype)
# packed-layout precompute straight from the scan (the engine path):
# going through the unpacked quad + pack_cross_mega keeps TWO multi-GB
# cross buffers live at once and OOMs batch 48
cross_mega = jax.jit(
    W.precompute_cross_kv_int8_packed, static_argnames=("dims",)
)(params, xa, dims)
wpack = pack_layer_weights(params["decoder"]["blocks"])
Lm = P + TOK
M = ((Lm * K + 127) // 128) * 128 + 128  # init_kv_cache K-minor + slack
# zero cache: timing is data-independent (a host gaussian at this shape
# would be a 10 GB f64 array + a multi-GB tunnel upload).
# SELFKV=int8 (the TPU default since round 3) halves it + adds scales.
self_int8 = os.environ.get("SELFKV", "int8") == "int8"
cdt = jnp.int8 if self_int8 else dtype
HP = ((H + 7) // 8) * 8
ckv = jnp.zeros((dims.n_text_layer, B, 2 * H, dh, M), cdt)
ksc = (jnp.ones((dims.n_text_layer, B, 2 * HP, M), jnp.float32)
       if self_int8 else None)
anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, Lm))
x0 = jnp.asarray(
    (0.02 * rng.standard_normal((B * K, d))).astype(np.float32), dtype)
tok0 = jnp.asarray(rng.integers(0, 50000, (B * K, 1)).astype(np.int32))

print(f"B={B} K={K} M={M} TaP={cross_mega['kv8'].shape[-1]} N={N}",
      flush=True)


def timeit(name, fn, reps=3):
    t0 = time.time()
    fn()
    print(f"{name}: first (incl compile) {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3/N:.2f} ms/iter  ({min(ts):.3f}s/{N})",
          flush=True)


def kernel_only(pos):
    # note: the kernel now INCLUDES the cache append (aliased in-place
    # output) — "kernel-only" vs "full step" isolates the emb + amask +
    # vocab-GEMM + scan residue
    amask = W.ancestry_mask(anc, jnp.int32(pos), jnp.int32(0), Lm,
                            include_own=True, minor=M)

    @jax.jit
    def run(x0, wpack, ckv, ksc, km, sc, cm, amask):
        def body(carry, _):
            x, ckv, ksc = carry
            if self_int8:
                xo, ckv, ksc = fused_decoder_layers(
                    x, wpack, ckv, km, sc, cm, amask, jnp.int32(pos), H,
                    K, ksc=ksc)
            else:
                xo, ckv = fused_decoder_layers(
                    x, wpack, ckv, km, sc, cm, amask, jnp.int32(pos), H, K)
            return (xo, ckv, ksc), ()

        (x, _, _), _ = jax.lax.scan(body, (x0, ckv, ksc), None, length=N)
        return x

    return lambda: np.asarray(run(
        x0, wpack, ckv, ksc, cross_mega["kv8"], cross_mega["sc"],
        cross_mega["cmask"], amask))


def full_step(pos0):
    @jax.jit
    def run(params, wpack, tok0, ckv, cm):

        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = W.decoder_step_fused(
                params, wpack, tok, pos, cache, cm, dims,
                beam_anc=anc, beam_k=K)
            nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
            return (nxt[:, None], pos + 1, cache), ()

        cache0 = ({"kv8": ckv, "ksc": ksc} if self_int8 else {"kv": ckv})
        (tok, _, _), _ = jax.lax.scan(
            body, (tok0, jnp.int32(pos0), cache0), None, length=N)
        return tok

    return lambda: np.asarray(run(params, wpack, tok0, ckv, cross_mega))


def step_parts(pos0, vocab=False, emb=False, amask_in=True):
    """Kernel + selected residue parts — isolates what the extra XLA
    wrapper ops of decoder_step_fused cost."""
    amask0 = W.ancestry_mask(anc, jnp.int32(pos0), jnp.int32(0), Lm,
                             include_own=True, minor=M)

    @jax.jit
    def run(params, wpack, x0, tok0, ckv, cm, amask0):
        dec = params["decoder"]

        def body(carry, _):
            x, pos, ckv = carry
            if emb:
                x = (dec["tok_emb"][jnp.maximum(tok0[:, 0], 0)]
                     + dec["pos_emb"][pos]).astype(dec["tok_emb"].dtype)
            am = (amask0 if amask_in else W.ancestry_mask(
                anc, pos, jnp.int32(0), Lm, include_own=True, minor=M))
            if self_int8:
                xo, ckv, _ksc2 = fused_decoder_layers(
                    x, wpack, ckv, cm["kv8"], cm["sc"], cm["cmask"], am,
                    pos, H, K, ksc=ksc)
            else:
                xo, ckv = fused_decoder_layers(
                    x, wpack, ckv, cm["kv8"], cm["sc"], cm["cmask"], am,
                    pos, H, K)
            if vocab:
                from whisper_aries_tpu.models.layers import layer_norm
                xn = layer_norm(dec["ln"], xo)
                logits = jnp.dot(xn, dec["tok_emb"].T.astype(xn.dtype),
                                 preferred_element_type=jnp.float32)
                xo = xo + (0.0 * logits[:, 0:1]).astype(xo.dtype)
            return (xo, pos, ckv), ()

        (x, _, ckv2), _ = jax.lax.scan(
            body, (x0, jnp.int32(pos0), ckv), None, length=N)
        return x

    return lambda: np.asarray(run(params, wpack, x0, tok0, ckv,
                                  cross_mega, amask0))


timeit(f"kernel-only pos=10 (bucket {(10*K)//128 + 2}/{M//128})",
       kernel_only(10))
timeit(f"kernel-only pos={TOK-5} (bucket {((TOK-5)*K)//128 + 2}/{M//128})",
       kernel_only(TOK - 5))
timeit("kernel+vocab  pos=10", step_parts(10, vocab=True))
timeit("kernel+emb+amask pos=10", step_parts(10, emb=True, amask_in=False))
timeit("full fused step pos=10..", full_step(10))
