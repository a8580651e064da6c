#!/usr/bin/env python
"""Decompose the per-batch rep time outside the decode loop.

Params are passed as jit ARGUMENTS — closure-captured jax Arrays become
compile-time constants (4 GB uploads, 10-25 min remote compiles).

ROADMAP's measured anatomy (3.13 s/rep at batch 40 = encoder ~1.0 s +
decode ~0.6-0.9 s + ~1.2 s "remainder") lumps prefill, cross-KV
precompute/quantization, mel, and dispatch into the remainder. This probe
times each stage as its own jitted program (same shapes as bench.py) so
the remainder is attributable. Timing per CLAUDE.md: host-fetch one
element to force completion (block_until_ready does not block on axon).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
TOK = int(os.environ.get("ARIES_PROF_TOKENS", "100"))
BEAM = int(os.environ.get("ARIES_PROF_BEAM", "5"))

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.init_params(dims, dtype=dtype)
rng = np.random.default_rng(0)


def fetch(x):
    return np.asarray(x)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)  # compile
    fetch(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms", flush=True)
    return out


audio = jnp.asarray(0.02 * rng.standard_normal((B, 480_000)), jnp.float32)

from whisper_aries_tpu.ops.pallas_mel import log_mel_pallas
from whisper_aries_tpu.audio.mel import log_mel_spectrogram

use_pallas = jax.default_backend() not in ("cpu",)
_mel_raw = log_mel_pallas if use_pallas else log_mel_spectrogram
mel_fn = jax.jit(lambda a: _mel_raw(a, n_mels=dims.n_mels))
mel = timeit("mel (pallas)" if use_pallas else "mel (xla)", mel_fn, audio)

enc = jax.jit(lambda p, m: W.encode(p, m.astype(dtype), dims))
xa = timeit("encode", enc, params, mel)

ckv_i8 = jax.jit(lambda p, a: W.precompute_cross_kv_int8(p, a, dims))
ckv_bf = jax.jit(lambda p, a: W.precompute_cross_kv(p, a, dims))
kv8 = timeit("precompute_cross_kv_int8", ckv_i8, params, xa)
_ = timeit("precompute_cross_kv (bf16)", ckv_bf, params, xa)

sp_langs = dims.n_vocab - 51766
base = dims.n_vocab - sp_langs - 1509
ids = G.DecodeSpecialIds(
    eot=base, sot=base + 1, no_speech=base + sp_langs + 6,
    no_timestamps=base + sp_langs + 7,
    timestamp_begin=base + sp_langs + 8, blank=220, n_vocab=dims.n_vocab,
)
suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
prompt = jnp.asarray(np.asarray(
    [[ids.sot, ids.sot + 1, base + sp_langs + 3]], np.int32).repeat(B, 0))

# prefill alone (beam layout: B*BEAM rows share each window's cross-KV)
cache = W.init_kv_cache(dims, B * BEAM, dtype=dtype,
                        max_len=TOK + prompt.shape[1] + 8,
                        int8=os.environ.get("ARIES_PROF_SELFKV") == "int8")
pk = jnp.repeat(prompt, BEAM, axis=0)
prefill = jax.jit(lambda p, c, kv: W.decoder_step(
    p, pk, jnp.int32(0), c, kv, dims))
_ = timeit("prefill (beam rows)", prefill, params, cache, kv8)

beam_fn = lambda p, a: G.beam_search_decode(
    p, a, prompt, dims, ids, suppress, jnp.int32(0), beam_size=BEAM,
    sample_len=TOK, with_timestamps=True, kv_int8=True)
out = timeit(f"beam_search_decode tok={TOK}", beam_fn, params, xa, reps=3)
print("n_sampled mean:", float(fetch(out["n_sampled"]).mean()), flush=True)

short = lambda p, a: G.beam_search_decode(
    p, a, prompt, dims, ids, suppress, jnp.int32(0), beam_size=BEAM,
    sample_len=8, with_timestamps=True, kv_int8=True)
_ = timeit("beam_search_decode tok=8", short, params, xa, reps=3)
