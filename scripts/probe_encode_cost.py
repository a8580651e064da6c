#!/usr/bin/env python
"""Measure the XLA encoder's wall cost at engine shapes on the TPU.

Motivation: at batch 36/48 the decode megakernel sits at its DMA floor
(~14.4 ms/step, scripts/profile_mega_step.py), so the remaining rep time
is the serial ENCODE stage (MXU-bound). If encode really costs ~37 ms/
window (the 61 TFLOP/s roofline at large-v3's ~2.25 TFLOP/window), it is
~40-50%% of the rep and the encode-during-decode rider is worth ~+35%%
end to end; if XLA does materially better, the rider's payoff shrinks.

Times a scan of N encodes inside ONE jit (the tunnel has a ~30 ms
per-call RTT floor) with params passed as arguments (never closure
constants — 4 GB baked constants compile for 10-25 min).

Usage: python scripts/probe_encode_cost.py [batch] [reps]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.models import whisper as W

B = int(sys.argv[1]) if len(sys.argv) > 1 else 36
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16
params = W.init_params(dims, dtype=dtype)
rng = np.random.default_rng(0)
mel = jnp.asarray(
    (0.1 * rng.standard_normal((B, dims.n_mels, 3000))).astype(np.float32),
    dtype)


@jax.jit
def run(params, mel):
    def body(c, _):
        xa = W.encode(params, mel, dims)
        # fold xa into a tiny carry so the scan can't elide iterations
        return c + xa[0, 0, :8].astype(jnp.float32), ()

    c, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), None, length=N)
    return c


print(f"B={B} N={N} backend={jax.default_backend()}", flush=True)
t0 = time.time()
np.asarray(run(params, mel))
print(f"first (incl compile): {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    t0 = time.time()
    np.asarray(run(params, mel))
    ts.append(time.time() - t0)
dt = min(ts)
print(f"encode: {dt/N*1e3:.1f} ms/batch ({dt/N/B*1e3:.2f} ms/window) "
    f"[{dt:.3f}s/{N}]", flush=True)
