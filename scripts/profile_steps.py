#!/usr/bin/env python
"""Marginal decode-step cost + executed-step counts + HBM bandwidth probe."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 20

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.init_params(dims, dtype=dtype)
rng = np.random.default_rng(0)


def fetch(x):
    return np.asarray(x)


# HBM bandwidth probe: big bf16 copy-scale
big = jnp.zeros((1024, 1024, 1024), jnp.bfloat16)  # 2 GB
scale_f = jax.jit(lambda x: x * jnp.bfloat16(1.0009765625))
fetch(scale_f(big)[0, 0, :1])
ts = []
for _ in range(3):
    t0 = time.time()
    fetch(scale_f(big)[0, 0, :1])
    ts.append(time.time() - t0)
bw = 2 * big.size * 2 / min(ts) / 1e9
print(f"HBM probe: {min(ts)*1e3:.1f} ms for 4 GB traffic -> ~{bw:.0f} GB/s",
      flush=True)
del big

xa = jnp.asarray(0.02 * rng.standard_normal((B, 1500, 1280)), dtype)
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


def run(kind, tok, beam=5):
    if kind == "greedy":
        out = G.greedy_decode(
            params, xa, prompt, dims, ids, suppress, jnp.int32(0),
            jnp.float32(0.0), jax.random.PRNGKey(0), sample_len=tok,
            with_timestamps=True, kv_int8=True)
    else:
        out = G.beam_search_decode(
            params, xa, prompt, dims, ids, suppress, jnp.int32(0),
            beam_size=beam, sample_len=tok, with_timestamps=True,
            kv_int8=True)
    return out


for kind in ("greedy", "beam"):
    for tok in (16, 100):
        out = run(kind, tok)
        ns = fetch(out["n_sampled"])
        ts = []
        for _ in range(3):
            t0 = time.time()
            fetch(run(kind, tok)["tokens"][0, :1])
            ts.append(time.time() - t0)
        print(f"{kind} tok={tok}: {min(ts):.3f}s  n_sampled "
              f"min/mean/max = {ns.min()}/{ns.mean():.1f}/{ns.max()}",
              flush=True)
