#!/usr/bin/env python
"""Does the MXU run int8 x int8 -> int32 dots at 2x the bf16 rate?

v5e datasheet: 197 bf16 TFLOP/s vs 394 int8 TOPS. If Pallas/Mosaic
lowers s8 dot_general to the native int8 MXU path, the encoder megakernel
GEMMs (and the CTranslate2-style int8 activation scheme generally) get
~2x cheaper. Measures a Pallas kernel looping dots over resident VMEM
operands (no DMA), bf16 vs int8, plus an XLA-level comparison.

Usage: python scripts/probe_int8_mxu.py
"""
import os
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = N = K = 1024
REPS = 400


def make_kernel(dtype, acc):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, c):
            p = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            # fold to keep every dot live (rotating add defeats CSE)
            return c + p[:8, :128].astype(jnp.float32) * (i % 3 + 1)

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), jnp.float32))

    return kernel


def run(dtype, acc, label):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    else:
        a = jnp.asarray(rng.standard_normal((M, K), np.float32), dtype)
        b = jnp.asarray(rng.standard_normal((K, N), np.float32), dtype)
    f = pl.pallas_call(
        make_kernel(dtype, acc),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    try:
        o = f(a, b)
        np.asarray(o)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(a, b))
        ts.append(time.time() - t0)
    dt = min(ts)
    fl = 2 * M * N * K * REPS
    print(f"{label}: {dt*1e3:.1f} ms for {REPS} dots -> "
          f"{fl/dt/1e12:.1f} T(FL)OP/s", flush=True)


print(f"backend={jax.default_backend()}", flush=True)
run(jnp.bfloat16, jnp.float32, "bf16xbf16->f32")
run(jnp.int8, jnp.int32, "s8xs8->s32")
run(jnp.int8, jnp.float32, "s8xs8->f32")
