#!/usr/bin/env python
"""Split the marginal beam step into decoder_step vs beam machinery, and
time standalone replicas of the machinery's big ops (log_softmax, top_k,
one-hot cache permute) — all amortized inside one jit via lax.scan (the
tunnel has a ~30 ms per-call RTT floor; see CLAUDE.md).

Usage: python scripts/profile_beam_parts.py [batch] [iters]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
K = int(os.environ.get("PROF_BEAM", "5"))
TOK = 100

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.fuse_decoder_qkv(W.init_params(dims, dtype=dtype))
rng = np.random.default_rng(0)
V = dims.n_vocab


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
cache = W.init_kv_cache(dims, B * K, dtype=dtype, max_len=L)
tok0 = jnp.asarray(rng.integers(0, 50000, (B * K, P)).astype(np.int32))
_, cache = W.decoder_step(params, tok0, jnp.int32(0), cache, cross, dims)


# --- A: decoder_step-only scan (token feedback via argmax, no beam ops).
# params/cross are jit ARGUMENTS (closure capture bakes 4 GB constants
# and compiles take 10-25 min — CLAUDE.md).
@jax.jit
def dec_only(params, cross, cache):
    def body(carry, _):
        tok, pos, cache = carry
        logits, cache = W.decoder_step(params, tok, pos, cache, cross, dims)
        nxt = jnp.argmax(logits[:, -1, :1000], axis=-1).astype(jnp.int32)
        return (nxt[:, None], pos + 1, cache), ()

    (tok, pos, cache), _ = jax.lax.scan(
        body, (tok0[:, -1:], jnp.int32(P), cache), None, length=N)
    return tok


timeit("decoder_step only", lambda: fetch(dec_only(params, cross, cache)[0]))


# --- B: standalone log_softmax over (B*K, V) ---
logits0 = jnp.asarray(rng.standard_normal((B * K, V)).astype(np.float32))


@jax.jit
def lsm_scan(x):
    def body(c, _):
        y = jax.nn.log_softmax(c, axis=-1)
        return y * 0.999 + 0.001, ()

    y, _ = jax.lax.scan(body, x, None, length=N)
    return y


timeit("log_softmax (B*K,V)", lambda: fetch(lsm_scan(logits0)[0, :1]))


# --- C: standalone top_k(K) over (B, K*V) ---
@jax.jit
def topk_scan(x):
    def body(c, _):
        v, i = jax.lax.top_k(c.reshape(B, K * V), K)
        c = c.at[:B, :K].add(v * 1e-9)
        return c, i[0, 0]

    y, idx = jax.lax.scan(body, x, None, length=N)
    return idx


timeit("top_k(K) over (B,K*V)", lambda: fetch(topk_scan(logits0)[:1]))


# --- C2: per-row top_k(K) over (B*K, V) — the union-top-K equivalent ---
@jax.jit
def topk_rows_scan(x):
    def body(c, _):
        v, i = jax.lax.top_k(c, K)          # (B*K, K)
        c = c.at[:, :K].add(v * 1e-9)
        return c, i[0, 0]

    y, idx = jax.lax.scan(body, x, None, length=N)
    return idx


timeit("top_k(K) over rows (B*K,V)", lambda: fetch(topk_rows_scan(logits0)[:1]))


# --- C3: identity-src cond permute — does lax.cond COPY the cache? ---
ident = jnp.arange(B * K, dtype=jnp.int32)


@jax.jit
def cond_identity_scan(cache):
    def permute_all(c):
        perm = jax.nn.one_hot(ident, B * K, dtype=jnp.bfloat16)
        return {k: jnp.einsum("oi,li...->lo...", perm.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(v.dtype)
                for k, v in c.items()}

    def body(c, _):
        is_id = jnp.all(ident == jnp.arange(B * K))  # always True
        c = jax.lax.cond(is_id, lambda x: x, permute_all, c)
        return c, ()

    c, _ = jax.lax.scan(body, cache, None, length=N)
    return c


timeit("cond(identity) cache no-op",
       lambda: fetch(cond_identity_scan(cache)["k"][0, 0, 0, 0, :1]))


# --- D: one-hot cache permute (both k and v buffers), always ---
src = jnp.asarray(rng.integers(0, B * K, (B * K,)).astype(np.int32))


@jax.jit
def permute_scan(cache):
    def body(c, _):
        perm = jax.nn.one_hot(src, B * K, dtype=jnp.bfloat16)
        out = {}
        for key in sorted(c.keys()):
            y = jnp.einsum("oi,li...->lo...", perm.astype(c[key].dtype),
                           c[key], preferred_element_type=jnp.float32)
            out[key] = y.astype(c[key].dtype)
        return out, ()

    c, _ = jax.lax.scan(body, cache, None, length=N)
    return c


timeit("cache permute (always)",
       lambda: fetch(permute_scan(cache)["k"][0, 0, 0, 0, :1]))


# --- C4: manual 5-pass argmax top-k over (B, K*V) ---
@jax.jit
def topk_manual_scan(x):
    def body(c, _):
        flat = c.reshape(B, K * V)
        idxs = []
        vals = []
        for _k in range(K):
            i = jnp.argmax(flat, axis=-1)
            v = jnp.take_along_axis(flat, i[:, None], axis=1)[:, 0]
            flat = flat.at[jnp.arange(B), i].set(-jnp.inf)
            idxs.append(i)
            vals.append(v)
        c = c.at[:B, :K].add(jnp.stack(vals, 1) * 1e-9)
        return c, jnp.stack(idxs, 1)[0, 0]

    y, idx = jax.lax.scan(body, x, None, length=N)
    return idx


timeit("top_k manual 5-argmax", lambda: fetch(topk_manual_scan(logits0)[:1]))


# --- C5: approx_max_k at recall 1.0 and 0.95 ---
for recall in (1.0, 0.95):
    @jax.jit
    def topk_approx_scan(x, r=recall):
        def body(c, _):
            v, i = jax.lax.approx_max_k(
                c.reshape(B, K * V), K, recall_target=r,
                aggregate_to_topk=True,
            )
            c = c.at[:B, :K].add(v * 1e-9)
            return c, i[0, 0]

        y, idx = jax.lax.scan(body, x, None, length=N)
        return idx

    timeit(f"approx_max_k recall={recall}",
           lambda f=topk_approx_scan: fetch(f(logits0)[:1]))


# --- D2: BLOCK-DIAGONAL cache permute: per-window (B, K, K) one-hot ---
src_k = jnp.asarray(rng.integers(0, K, (B, K)).astype(np.int32))


@jax.jit
def permute_blocked_scan(cache):
    def body(c, _):
        perm = jax.nn.one_hot(src_k, K, dtype=jnp.bfloat16)  # (B, K, K)
        out = {}
        for key in sorted(c.keys()):
            x = c[key]
            Lx = x.shape[0]
            xb = x.reshape(Lx, B, K, *x.shape[2:])
            y = jnp.einsum("bok,lbk...->lbo...", perm.astype(x.dtype), xb,
                           preferred_element_type=jnp.float32)
            out[key] = y.astype(x.dtype).reshape(x.shape)
        return out, ()

    c, _ = jax.lax.scan(body, cache, None, length=N)
    return c


timeit("cache permute (blocked BxKxK)",
       lambda: fetch(permute_blocked_scan(cache)["k"][0, 0, 0, 0, :1]))


# --- D3: Pallas DMA row-permute (ops/pallas_beam_reorder.py) ---
from whisper_aries_tpu.ops.pallas_beam_reorder import permute_cache_rows


@jax.jit
def permute_pallas_scan(cache, src_bk):
    def body(c, _):
        return permute_cache_rows(c, src_bk), ()

    c, _ = jax.lax.scan(body, cache, None, length=N)
    return c


src_bk = jnp.asarray(rng.integers(0, K, (B, K)).astype(np.int32))
timeit("cache permute (pallas DMA)",
       lambda: fetch(permute_pallas_scan(cache, src_bk)["k"][0, 0, 0, 0, :1]))


# --- E: full beam body step via beam_search_decode at two token counts ---
del cache  # free the probe cache (2x1.26 GB) before the full-beam HBM bill
ids = G.DecodeSpecialIds(
    eot=50257, sot=50258, no_speech=50362, no_timestamps=50363,
    timestamp_begin=50364, blank=220, n_vocab=V)
suppress = jnp.zeros((V,), jnp.float32)
prompt = jnp.asarray(np.asarray(
    [[ids.sot, ids.sot + 1, ids.sot + 2]], np.int32).repeat(B, 0))


def beam(tok):
    return G.beam_search_decode(
        params, xa, prompt, dims, ids, suppress, jnp.int32(0),
        beam_size=K, sample_len=tok, with_timestamps=True, kv_int8=True)


for tok in (16, TOK):
    fetch(beam(tok)["tokens"][0, :1])
    ts = []
    for _ in range(3):
        t0 = time.time()
        fetch(beam(tok)["tokens"][0, :1])
        ts.append(time.time() - t0)
    print(f"beam tok={tok}: {min(ts):.3f}s", flush=True)
