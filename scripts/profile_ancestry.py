#!/usr/bin/env python
"""Attribute the ancestry-mode step cost: plain decoder_step vs K-minor
ancestry decoder_step, with variants isolating the mask build, the K-minor
DUS writes, and the widened attention. Amortized 50x inside one jit
(lax.scan) — the tunnel has a ~30 ms per-call RTT floor (CLAUDE.md).

Usage: python scripts/profile_ancestry.py [batch] [iters]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
K = int(os.environ.get("PROF_BEAM", "5"))
TOK = 100

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.fuse_decoder_qkv(W.init_params(dims, dtype=dtype))
rng = np.random.default_rng(0)


def fetch(x):
    return np.asarray(x)


def timeit(name, fn, reps=3):
    t0 = time.time()
    fn()
    print(f"{name}: first (incl compile) {time.time()-t0:.2f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: steady {min(ts)*1e3/N:.2f} ms/iter ({min(ts):.3f}s/{N})",
          flush=True)


xa = jnp.asarray(0.02 * rng.standard_normal((B, 1500, 1280)), dtype)
cross = W.precompute_cross_kv_int8(params, xa, dims)
P = 3
L = P + TOK

# --- A: plain row-major decoder_step scan (the permute-mode inner cost) ---
cache_rm = W.init_kv_cache(dims, B * K, dtype=dtype, max_len=L)
tok0 = jnp.asarray(rng.integers(0, 50000, (B * K, P)).astype(np.int32))
_, cache_rm = W.decoder_step(params, tok0, jnp.int32(0), cache_rm, cross,
                             dims)


@jax.jit
def dec_plain(params, cross, cache):
    def body(carry, _):
        tok, pos, cache = carry
        logits, cache = W.decoder_step(params, tok, pos, cache, cross, dims)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), ()

    (tok, pos, cache), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache), None, length=N)
    return tok


timeit("decoder_step plain", lambda: fetch(dec_plain(params, cross, cache_rm)[0]))
del cache_rm

# --- B: K-minor ancestry decoder_step scan, anc table updated per step ---
cache_km = W.init_kv_cache(dims, B, dtype=dtype, max_len=L, beam_k=K)
tok0w = tok0[::K]
_, cache_km = W.decoder_step(params, tok0w, jnp.int32(0), cache_km, cross,
                             dims, beam_k=K)
anc0 = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, L))


@jax.jit
def dec_anc(params, cross, cache, anc):
    def body(carry, _):
        tok, pos, cache, anc = carry
        logits, cache = W.decoder_step(params, tok, pos, cache, cross, dims,
                                       beam_anc=anc, beam_k=K)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        # fake reorder: rotate ancestry like a worst-case live_src gather
        src = (jnp.arange(K, dtype=jnp.int32)[None, :] + pos) % K
        src = jnp.broadcast_to(src, (B, K))
        ident = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1))
        anc = jax.lax.dynamic_update_slice(anc, ident, (0, 0, pos))
        anc = jnp.take_along_axis(anc, src[:, :, None], axis=1)
        return (nxt[:, None], pos + 1, cache, anc), ()

    (tok, pos, cache, anc), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache, anc0), None, length=N)
    return tok


timeit("decoder_step ancestry (K-minor)",
       lambda: fetch(dec_anc(params, cross, cache_km, anc0)[0]))


# --- C: ancestry with a FROZEN mask (isolates per-step mask build cost) ---
@jax.jit
def dec_anc_frozen(params, cross, cache, anc):
    def body(carry, _):
        tok, pos, cache = carry
        logits, cache = W.decoder_step(params, tok, pos, cache, cross, dims,
                                       beam_anc=anc, beam_k=K)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), ()

    (tok, pos, cache), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache), None, length=N)
    return tok


timeit("decoder_step ancestry (frozen anc)",
       lambda: fetch(dec_anc_frozen(params, cross, cache_km, anc0)[0]))


# --- D: ancestry attention WITHOUT the K-minor cache writes (stale cache)
# — isolates the sub-lane DUS write cost from the widened attention ---
@jax.jit
def dec_anc_nowrite(params, cross, cache, anc):
    import whisper_aries_tpu.models.whisper as WW

    def body(carry, _):
        tok, pos, cache = carry
        logits, new_cache = WW.decoder_step(
            params, tok, pos, cache, cross, dims, beam_anc=anc, beam_k=K)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), ()   # DISCARD writes

    (tok, pos, cache), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache), None, length=N)
    return tok


timeit("decoder_step ancestry (writes discarded)",
       lambda: fetch(dec_anc_nowrite(params, cross, cache_km, anc0)[0]))


# --- E: plain decoder_step with writes discarded (baseline for D) ---
cache_rm2 = W.init_kv_cache(dims, B * K, dtype=dtype, max_len=L)
_, cache_rm2 = W.decoder_step(params, tok0, jnp.int32(0), cache_rm2, cross,
                              dims)


@jax.jit
def dec_plain_nowrite(params, cross, cache):
    def body(carry, _):
        tok, pos, cache = carry
        logits, _ = W.decoder_step(params, tok, pos, cache, cross, dims)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), ()

    (tok, pos, cache), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache), None, length=N)
    return tok


timeit("decoder_step plain (writes discarded)",
       lambda: fetch(dec_plain_nowrite(params, cross, cache_rm2)[0]))
