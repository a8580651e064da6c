#!/usr/bin/env python
"""TPU validation + timing for the standalone encoder megakernel.

1. Correctness at B=2, large-v3 dims: encode_pre -> fused_encoder_layers
   -> encode_post vs the bf16 XLA `models/whisper.encode` — bounded by
   int8 quantization error (the interpret-mode bit parity lives in
   tests/test_encoder_mega.py; this run catches TPU-only layout/DMA
   issues at real scale).
2. Timing at B windows (argv), vs the measured XLA baseline
   (27.63 ms/window at B=36, scripts/probe_encode_cost.py).

Usage: python scripts/probe_encoder_kernel.py [batch] [reps]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.ops.pallas_encoder_layers import (
    encode_post,
    encode_pre,
    fused_encoder_layers,
    pack_encoder_weights,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 36
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16
params = W.init_params(dims, dtype=dtype)
pack = pack_encoder_weights(params["encoder"]["blocks"])
H = dims.n_audio_head
T = dims.n_audio_ctx
rng = np.random.default_rng(0)

print(f"backend={jax.default_backend()} B={B} N={N}", flush=True)

# ---- correctness at B=2 ----
mel2 = jnp.asarray(
    (0.1 * rng.standard_normal((2, dims.n_mels, 3000))).astype(np.float32),
    dtype)
t0 = time.time()
want = np.asarray(W.encode(params, mel2, dims), np.float32)
print(f"xla encode (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
xeT = encode_pre(params, mel2, dims)
out = fused_encoder_layers(xeT, pack, H, T)
got = np.asarray(encode_post(params, out, T), np.float32)
print(f"kernel encode (incl compile): {time.time()-t0:.1f}s", flush=True)
scale = max(1.0, float(np.abs(want).max()))
err = float(np.abs(got - want).max() / scale)
print(f"B=2 rel err vs bf16 XLA: {err:.4f} (int8 bound ~0.08)", flush=True)

# ---- timing at B ----
melB = jnp.asarray(
    (0.1 * rng.standard_normal((B, dims.n_mels, 3000))).astype(np.float32),
    dtype)
xeTB = encode_pre(params, melB, dims)
xeTB = jax.block_until_ready(xeTB)
o = fused_encoder_layers(xeTB, pack, H, T)   # compile at B
np.asarray(o[0, 0, :8])
ts = []
for _ in range(3):
    t0 = time.time()
    x = xeTB
    for _ in range(N):
        x = fused_encoder_layers(x, pack, H, T)
    np.asarray(x[0, 0, :8])
    ts.append(time.time() - t0)
dt = min(ts)
print(f"kernel: {dt/N*1e3:.1f} ms/batch ({dt/N/B*1e3:.2f} ms/window) "
      f"[xla baseline 27.63 ms/window]", flush=True)
