#!/usr/bin/env python
"""Component-level TPU timing: mel / encoder / cross-KV / greedy / beam.

Forces completion with host fetches (axon's block_until_ready is a no-op).
Usage: python scripts/profile_decode.py [batch] [tokens]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.audio.mel import log_mel_spectrogram
from whisper_aries_tpu.decoding import generate as G
from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 20
TOK = int(sys.argv[2]) if len(sys.argv) > 2 else 100
BEAM = int(os.environ.get("PROF_BEAM", "5"))

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
params = W.init_params(dims, dtype=dtype)
rng = np.random.default_rng(0)
audio = jnp.asarray(0.1 * rng.standard_normal((B, 480_000)).astype(np.float32))


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
    print(f"{name}: steady {min(ts):.3f}s", flush=True)


mel_f = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=dims.n_mels))
timeit("mel", lambda: fetch(mel_f(audio)[0, :1, :1]))
mel = mel_f(audio).astype(dtype)

timeit("encode", lambda: fetch(W.encode(params, mel, dims)[0, :1, :1]))
xa = W.encode(params, mel, dims)

pc8 = jax.jit(lambda xa: W.precompute_cross_kv_int8(params, xa, dims))
timeit("cross_kv_int8", lambda: fetch(pc8(xa)["ks"][0, 0, 0, 0, :1]))

sp_langs = max(1, dims.n_vocab - 51766)
base = dims.n_vocab - sp_langs - 1509
ids = G.DecodeSpecialIds(
    eot=base, sot=base + 1, no_speech=base + sp_langs + 6,
    no_timestamps=base + sp_langs + 7,
    timestamp_begin=base + sp_langs + 8, blank=220, n_vocab=dims.n_vocab,
)
suppress = jnp.zeros((dims.n_vocab,), jnp.float32)
prompt = jnp.asarray(
    np.asarray([[ids.sot, ids.sot + 1, base + sp_langs + 3]], np.int32
               ).repeat(B, axis=0))

timeit("greedy100", lambda: fetch(G.greedy_decode(
    params, xa, prompt, dims, ids, suppress, jnp.int32(0),
    jnp.float32(0.0), jax.random.PRNGKey(0), sample_len=TOK,
    with_timestamps=True, kv_int8=True)["tokens"][0, :1]))

timeit(f"beam{BEAM}x{TOK}", lambda: fetch(G.beam_search_decode(
    params, xa, prompt, dims, ids, suppress, jnp.int32(0),
    beam_size=BEAM, sample_len=TOK, with_timestamps=True,
    kv_int8=True)["tokens"][0, :1]))
