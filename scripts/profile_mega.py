#!/usr/bin/env python
"""TPU parity + timing for the megakernel beam path (beam_reorder="mega")
vs the XLA one-hot permute default: runs beam_search_decode both ways at
the bench configuration and prints tokens-equal, score deltas, and wall
times (100-token decode amortizes the tunnel RTT).

Usage: python scripts/profile_mega.py [batch] [tokens]
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
TOK = int(sys.argv[2]) if len(sys.argv) > 2 else 100
K = 5

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.init_params(dims, dtype=dtype)
if os.environ.get("MEGA_QUANT", "1") == "1":
    # the mega kernel IS the int8 compute path; quantize BOTH paths so
    # the tokens-equal check compares like with like
    from whisper_aries_tpu.ops.quant import quantize_model_params

    params = quantize_model_params(params)
params = W.fuse_decoder_qkv(params)
rng = np.random.default_rng(0)
V = dims.n_vocab
xa = jnp.asarray(0.02 * rng.standard_normal((B, 1500, 1280)), dtype)
ids = G.DecodeSpecialIds(
    eot=50257, sot=50258, no_speech=50362, no_timestamps=50363,
    timestamp_begin=50364, blank=220, n_vocab=V)
suppress = jnp.zeros((V,), jnp.float32)
prompt = jnp.asarray(np.asarray(
    [[ids.sot, ids.sot + 1, ids.sot + 2]], np.int32).repeat(B, 0))


def run(mode):
    return G.beam_search_decode(
        params, xa, prompt, dims, ids, suppress, jnp.int32(0),
        beam_size=K, sample_len=TOK, with_timestamps=True, kv_int8=True,
        beam_reorder=mode)


def fetch(r):
    return np.asarray(r["tokens"]), np.asarray(r["sum_logprob"])


for mode in ("xla", "mega"):
    t0 = time.time()
    tok, lp = fetch(run(mode))
    print(f"{mode}: first (incl compile) {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        tok, lp = fetch(run(mode))
        ts.append(time.time() - t0)
    print(f"{mode}: steady {min(ts):.3f}s  lp[:3]={lp[:3]}", flush=True)
    if mode == "xla":
        tok_ref, lp_ref = tok, lp
    else:
        eq = np.mean(tok == tok_ref)
        print(f"tokens equal frac: {eq:.4f}  "
              f"lp maxdiff: {np.abs(lp - lp_ref).max():.5f}", flush=True)
