#!/usr/bin/env python
"""Probe: speculative / multi-token decode — step-cost mechanics only.

VERDICT r3 #9: with the megakernel near its DMA floor, the remaining
structural lever is FEWER STEPS — verify S drafted tokens in one step so
the per-step weight stream (int8 ~0.77 GB) and cross-KV stream (int8
~3.2 GB at B=36) amortize over S tokens. Accept-rate is meaningless on
random weights, so this probe measures ONLY the mechanics: how does the
cost of an S-token decoder step scale with S on this chip?

Method: time the XLA ``decoder_step`` (the pre-mega path — the megakernel
itself is S=1-only; its S>1 variant is exactly the build this probe
gates) at S in {1, 2, 4}, fixed position, same cache geometry, N calls
inside one jit scan (the axon tunnel has a ~30 ms RTT floor). The
decoder is stream-bound in the same way the megakernel is (weights +
cross-KV re-stream every call), so cost(S)/cost(1) measures the
amortizable fraction directly.

Interpretation written to ROADMAP (round 4):
  * cost(S)/cost(1) ~= 1 + eps  ->  a verified token costs ~1/S of a
    decoded one; speculative decode pays IF drafts are ~free.
  * SAME-MODEL drafting is NOT free here: the cross-KV stream is
    per-WINDOW, not per-beam, so a greedy (K=1) draft step streams the
    same ~4 GB as a beam step — drafting one token costs ~1 step.
    Self-drafting is therefore a dead lever on this architecture.
  * zero-device-cost drafts (prompt-lookup / n-gram reuse of the
    already-decoded transcript) are the only candidate worth an S-token
    megakernel variant.

Usage: python scripts/probe_speculative.py [batch] [iters]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
N = int(sys.argv[2]) if len(sys.argv) > 2 else 30

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16
params = W.fuse_decoder_qkv(W.init_params(dims, dtype=dtype))
rng = np.random.default_rng(0)

xa = jnp.asarray(
    (0.02 * rng.standard_normal((B, 1500, 1280))).astype(np.float32), dtype)
cross = jax.jit(W.precompute_cross_kv, static_argnames=("dims",))(
    params, xa, dims)
Tmax = 640
cache = W.init_kv_cache(dims, B, dtype=dtype, max_len=Tmax)
POS = 256  # mid-decode: a realistic valid self-prefix


def make_scan(S: int):
    toks = jnp.full((B, S), 7, jnp.int32)

    # params/cross/toks are ARGUMENTS, not closure captures: baking them
    # in lowers ~4.6 GB of constants => 10-25 min remote compiles
    # (CLAUDE.md trap; reproduced here before this fix)
    @jax.jit
    def run(params, cross, toks, cache):
        def body(i, carry):
            cache, acc = carry
            logits, cache = W.decoder_step(
                params, toks, jnp.int32(POS), cache, cross, dims)
            return cache, acc + logits[:, -1, 0]

        _, acc = jax.lax.fori_loop(0, N, body,
                                   (cache, jnp.zeros((B,), jnp.float32)))
        return acc

    return functools.partial(run, params, cross, toks)


def main():
    print(f"backend={jax.default_backend()} B={B} N={N} Tmax={Tmax}",
          file=sys.stderr)
    base = None
    for S in (1, 2, 4):
        run = make_scan(S)
        t0 = time.time()
        np.asarray(run(cache))  # host fetch forces completion on axon
        print(f"S={S}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = run(cache)
        np.asarray(out)
        per_call = (time.time() - t0) / (reps * N) * 1e3
        if S == 1:
            base = per_call
        print(f"S={S}: {per_call:.2f} ms/call, {per_call/S:.2f} ms/token, "
              f"cost(S)/cost(1)={per_call/base:.3f} "
              f"(perfect amortization would be ~1.0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
