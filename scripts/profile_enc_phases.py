#!/usr/bin/env python
"""Attribute the encoder megakernel's per-micro cost to its phases.

Runs the kernel with phase subsets disabled (static `phases` knob):
  all (kqm), no-qa (km), no-mlp (kq), none ("") — the "none" config
  measures pure grid + xb-DMA + dispatch overhead (every micro still
  fetches its x block and runs the branch plumbing).

Usage: python scripts/profile_enc_phases.py [batch] [reps]
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
    encode_pre,
    enc_micro_counts,
    fused_encoder_layers,
    pack_encoder_weights,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 36
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6

dims = W.PRESETS["large-v3"]
dtype = jnp.bfloat16
params = W.init_params(dims, dtype=dtype)
pack = pack_encoder_weights(params["encoder"]["blocks"])
H = dims.n_audio_head
T = dims.n_audio_ctx
rng = np.random.default_rng(0)
mel = jnp.asarray(
    (0.1 * rng.standard_normal((B, dims.n_mels, 3000))).astype(np.float32),
    dtype)
xeT = jax.block_until_ready(encode_pre(params, mel, dims))
Tp = xeT.shape[-1]
_, n_micros = enc_micro_counts(B, dims.n_audio_layer, Tp)
print(f"backend={jax.default_backend()} B={B} n_micros={n_micros}",
      flush=True)

res = {}
for ph in ("kqm", "km", "kq", "k", ""):
    t0 = time.time()
    o = fused_encoder_layers(xeT, pack, H, T, phases=ph)
    np.asarray(o[0, 0, :8])
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        x = xeT
        for _ in range(N):
            x = fused_encoder_layers(x, pack, H, T, phases=ph)
        np.asarray(x[0, 0, :8])
        ts.append(time.time() - t0)
    dt = min(ts) / N
    res[ph] = dt
    print(f"phases={ph!r:6}: {dt*1e3:7.1f} ms/batch "
          f"({dt/n_micros*1e6:5.2f} us/micro avg) [compile {comp:.0f}s]",
          flush=True)

per_wl = 48  # 12 kv + 12 qa + 24 mlp at Tp=1536
kv_n, qa_n, mlp_n = 12, 12, 24
base = res[""]
print(f"\noverhead (grid+xb DMA+dispatch): {base/n_micros*1e6:.2f} us/micro")
if "kqm" in res and "km" in res:
    qa = (res["kqm"] - res["km"]) / (n_micros * qa_n // per_wl)
    print(f"qa micro marginal: {qa*1e6:.1f} us")
if "km" in res and "k" in res:
    mlp = (res["km"] - res["k"]) / (n_micros * mlp_n // per_wl)
    print(f"mlp micro marginal: {mlp*1e6:.1f} us")
if "k" in res:
    kv = (res["k"] - base) / (n_micros * kv_n // per_wl)
    print(f"kv micro marginal: {kv*1e6:.1f} us")
