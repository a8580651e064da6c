#!/usr/bin/env python
"""Probe the axon tunnel's host->device transfer behavior.

Questions the engine-path design needs answered (ROADMAP round 3):
  1. What does a 69 MB int16 upload (the 36-min bench file) actually
     sustain through the tunnel?
  2. Does chunking / thread-concurrency change the rate?
  3. Does an upload OVERLAP with already-enqueued device compute, or
     does it serialize the device queue? (Decides whether per-batch
     chunked upload pipelining can hide the transfer.)

Usage: python scripts/probe_upload.py
"""
import os
import sys
import time
import threading

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 1024 * 1024
rng = np.random.default_rng(0)
a16 = rng.integers(-30000, 30000, 36 * 60 * 16000, dtype=np.int16)
nbytes = a16.nbytes
print(f"payload: {nbytes/MB:.1f} MB int16", flush=True)


def fetch(x):
    return np.asarray(x)


# 1) whole-array upload rate
for rep in range(3):
    t0 = time.time()
    d = jax.device_put(a16)
    t_put = time.time() - t0
    fetch(jnp.sum(d.astype(jnp.int32))[None])  # force materialisation
    t_all = time.time() - t0
    print(f"whole: device_put returned {t_put:.3f}s, materialised "
          f"{t_all:.3f}s ({nbytes/MB/t_all:.1f} MB/s)", flush=True)
    del d

# 2) chunked serial + threaded
for nch in (8,):
    chunks = np.array_split(a16, nch)
    t0 = time.time()
    ds = [jax.device_put(c) for c in chunks]
    fetch(jnp.sum(ds[-1].astype(jnp.int32))[None])
    t = time.time() - t0
    print(f"chunked x{nch} serial: {t:.3f}s ({nbytes/MB/t:.1f} MB/s)",
          flush=True)
    del ds
    outs = [None] * nch

    def put(i):
        outs[i] = jax.device_put(chunks[i])

    t0 = time.time()
    th = [threading.Thread(target=put, args=(i,)) for i in range(nch)]
    [x.start() for x in th]
    [x.join() for x in th]
    for d in outs:
        fetch(jnp.sum(d.astype(jnp.int32))[None])
    t = time.time() - t0
    print(f"chunked x{nch} threaded: {t:.3f}s ({nbytes/MB/t:.1f} MB/s)",
          flush=True)
    del outs

# 3) overlap with compute: enqueue ~2 s of matmuls, then upload
w = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32),
                jnp.bfloat16)


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def burn(w, n):
    def body(c, _):
        return jnp.tanh(c @ w), ()

    out, _ = jax.lax.scan(body, w, None, length=n)
    return out


N = int(os.environ.get("BURN_ITERS", "60"))
fetch(burn(w, N)[0, :1])  # compile + calibrate
t0 = time.time()
fetch(burn(w, N)[0, :1])
t_burn = time.time() - t0
print(f"burn alone: {t_burn:.3f}s", flush=True)

t0 = time.time()
d = jax.device_put(a16)
fetch(jnp.sum(d.astype(jnp.int32))[None])
t_up = time.time() - t0
print(f"upload alone: {t_up:.3f}s", flush=True)

t0 = time.time()
r = burn(w, N)           # enqueue, async
d = jax.device_put(a16)  # upload while burning?
fetch(jnp.sum(d.astype(jnp.int32))[None])
fetch(r[0, :1])
t_both = time.time() - t0
print(f"burn + upload overlapped: {t_both:.3f}s "
      f"(serial would be {t_burn + t_up:.3f}s)", flush=True)

# 3b) upload in a background THREAD while the main thread burns
t0 = time.time()
holder = {}


def bgput():
    holder["d"] = jax.device_put(a16)


th = threading.Thread(target=bgput)
r = burn(w, N)
th.start()
fetch(r[0, :1])
th.join()
fetch(jnp.sum(holder["d"].astype(jnp.int32))[None])
t_thr = time.time() - t0
print(f"burn + threaded upload: {t_thr:.3f}s", flush=True)
