#!/usr/bin/env python
"""Isolate the XLA beam-tail cost per decode step on TPU.

The "beam tail" is everything expand() does after decoder_step_fused
returns logits: _apply_filters (timestamp grammar), log_softmax over V,
score accumulation, eot-column routing, and the unrolled top-k over
(B, K*V). These are ~15 full-vocab passes as separate XLA ops; this
script times the tail alone (N iterations inside one jit — the tunnel
has a ~30 ms per-call RTT floor) to bound what moving it into a Pallas
kernel could save.

Usage: python scripts/profile_beam_tail.py [batch] [iters]
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
K = 5
dims = W.PRESETS["large-v3"]
V = dims.n_vocab

sp_langs = max(1, V - 51766)
base = V - sp_langs - 1509
ids = G.DecodeSpecialIds(
    eot=base, sot=base + 1, no_speech=base + sp_langs + 6,
    no_timestamps=base + sp_langs + 7,
    timestamp_begin=base + sp_langs + 8, blank=220, n_vocab=V,
)

rng = np.random.default_rng(0)
logits0 = jnp.asarray(rng.standard_normal((B * K, V)).astype(np.float32))
suppress = jnp.zeros((V,), jnp.float32)
sum_lp0 = jnp.asarray(
    np.where(np.arange(K) == 0, 0.0, G.NEG_INF)[None, :].repeat(B, 0),
    jnp.float32)
last0 = jnp.full((B, K), 50364, jnp.int32)
pen0 = jnp.full((B, K), -1, jnp.int32)
mts0 = jnp.full((B, K), -1, jnp.int32)

print(f"B={B} K={K} V={V} N={N}", flush=True)


def tail(logits_flat, sum_logprob, last_tok, penult_tok, max_ts_tok):
    """expand()'s logits->selection segment, verbatim semantics."""
    f = G._apply_filters(
        logits_flat, ids, suppress, jnp.bool_(False),
        last_tok.reshape(-1), penult_tok.reshape(-1),
        max_ts_tok.reshape(-1), True, True,
    )
    logprobs = jax.nn.log_softmax(f, axis=-1).reshape(B, K, V)
    total = sum_logprob[:, :, None] + logprobs
    eot_scores = total[:, :, ids.eot]
    flat = total.at[:, :, ids.eot].set(G.NEG_INF).reshape(B, K * V)
    live_score, top_idx = G._top_k_unrolled(flat, K)
    return live_score, top_idx, eot_scores


@jax.jit
def run(logits0, sum_lp0, last0, pen0, mts0):
    def body(carry, _):
        sum_lp, last, pen, mts = carry
        ls, ti, es = tail(logits0, sum_lp, last, pen, mts)
        nt = (ti % V).astype(jnp.int32)
        return (ls, nt, last, jnp.maximum(mts, nt)), ()

    carry, _ = jax.lax.scan(body, (sum_lp0, last0, pen0, mts0), None,
                            length=N)
    return carry[0]


def timeit(name, fn, reps=3):
    t0 = time.time()
    np.asarray(fn())
    print(f"{name}: first (incl compile) {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1e3/N:.3f} ms/iter  ({min(ts):.3f}s/{N})",
          flush=True)


timeit("xla beam tail", lambda: run(logits0, sum_lp0, last0, pen0, mts0))
