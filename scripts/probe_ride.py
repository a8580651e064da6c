#!/usr/bin/env python
"""Measure the encode-while-decode rider's real cost on TPU.

Runs N decode megakernel steps (large-v3 geometry, scan-in-one-jit so
the tunnel RTT amortizes) with the encoder rider at several strides and
without it. Reports ms/step, encoder micros ridden per step, and the
MARGINAL cost per ridden micro — the number that decides how much of
the encoder rides for free in the decode step's DMA slack (ROADMAP:
~4-9 ms/step of DMA-floor time the MXU idles through).

Usage: python scripts/probe_ride.py [Bw] [steps] [pos0]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.ops.pallas_decode_layers import (
    fused_decoder_layers,
    pack_layer_weights,
)
from whisper_aries_tpu.ops.pallas_encoder_layers import (
    enc_micro_counts,
    pack_encoder_weights,
)

Bw = int(sys.argv[1]) if len(sys.argv) > 1 else 36
NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 24
POS0 = int(sys.argv[3]) if len(sys.argv) > 3 else 30

dims = W.PRESETS["large-v3"]
dt = jnp.bfloat16
K = 5
H = dims.n_text_head
d = dims.n_text_state
L = dims.n_text_layer
HP = 24
Ta = 1536
M = ((224 * K + 127) // 128) * 128 + 128
rng = np.random.default_rng(0)

print(f"backend={jax.default_backend()} Bw={Bw} M={M} steps={NSTEP}",
      flush=True)

params = W.fuse_decoder_qkv(W.init_params(dims, dtype=dt))
wpack = pack_layer_weights(params["decoder"]["blocks"])
epack = pack_encoder_weights(params["encoder"]["blocks"])
EH = dims.n_audio_head
ETp = ((dims.n_audio_ctx + 127) // 128) * 128
ET = dims.n_audio_ctx

ckv = jnp.zeros((L, Bw, 2 * H, 64, M), jnp.int8)
ksc = jnp.ones((L, Bw, 2 * HP, M), jnp.float32)
# device-side fill: a host rng.integers here materialises 36 GB of int64
# (the CLAUDE.md multi-GB-host-rng trap) and stalls for ~20 min
kv8 = jax.jit(
    lambda k: jax.random.randint(
        k, (L, Bw, 2 * H, 64, Ta), -127, 128, jnp.int8)
)(jax.random.PRNGKey(0))
xsc = jnp.full((L, Bw, 2 * HP, Ta), 0.01, jnp.float32)
cmask = jnp.zeros((8, Ta), jnp.float32)
anc = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :, None],
               (Bw, 1, 224))   # Tmax*K = 1120 -> x128 pad + slack = M
xeT = jnp.asarray(0.1 * rng.standard_normal((Bw, d, ETp)), dt)
x0 = jnp.asarray(0.1 * rng.standard_normal((Bw * K, d)), dt)
per_wl, n_mic = enc_micro_counts(Bw, dims.n_audio_layer, ETp)
enc = dict(xeT=xeT, **{k: epack[k] for k in
                       ("wqkvo8", "wf18", "wf28", "vecsT")})


def run_steps(stride):
    @jax.jit
    def go(x, ckv, ksc, xeT, c):
        def body(i, carry):
            x, ckv, ksc, xeT, c = carry
            pos = POS0 + i
            amask = W.ancestry_mask(anc, pos, jnp.int32(0), 224,
                                    include_own=True, minor=M)
            if stride == 0:
                x, ckv, ksc = fused_decoder_layers(
                    x, wpack, ckv, kv8, xsc, cmask, amask, pos, H, K,
                    ksc=ksc)
            else:
                x, ckv, ksc, xeT, c = fused_decoder_layers(
                    x, wpack, ckv, kv8, xsc, cmask, amask, pos, H, K,
                    ksc=ksc, enc=dict(enc, xeT=xeT), enc_c0=c,
                    enc_n_head=EH, enc_T=ET, enc_stride=max(stride, 1))
            return (x, ckv, ksc, xeT, c)

        return jax.lax.fori_loop(0, NSTEP, body,
                                 (x, ckv, ksc, xeT, jnp.int32(c)))

    t0 = time.time()
    out = go(x0, ckv, ksc, xeT, 0)
    np.asarray(out[0][:1, :8])
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = go(x0, ckv, ksc, xeT, 0)
        np.asarray(out[0][:1, :8])
        ts.append(time.time() - t0)
    step_ms = min(ts) / NSTEP * 1e3
    c_end = int(out[4])
    return step_ms, c_end, comp


base_ms, _, comp = run_steps(0)
print(f"stride=off: {base_ms:7.2f} ms/step [compile {comp:.0f}s]",
      flush=True)
for stride in (4, 2, 1):
    try:
        ms, c_end, comp = run_steps(stride)
    except Exception as e:
        print(f"stride={stride}:  FAILED {type(e).__name__} "
              f"{str(e)[:160]}", flush=True)
        continue
    mps = c_end / NSTEP
    marg = (ms - base_ms) * 1e3 / max(mps, 1e-9)
    # standalone encoder micro cost ~31 us (profile_enc_phases); free
    # fraction = 1 - marginal/standalone
    print(f"stride={stride}:   {ms:7.2f} ms/step  {mps:6.1f} micros/step "
          f"(cursor {c_end}/{n_mic})  marginal {marg:5.1f} us/micro "
          f"[compile {comp:.0f}s]", flush=True)
