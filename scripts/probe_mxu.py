#!/usr/bin/env python
"""Probe MXU matmul rates on this TPU: bf16xbf16->f32 vs s8xs8->s32 vs
f32xf32->f32, inside one Pallas kernel looped N times (amortizes the
~30 ms tunnel RTT). v5e nominally runs int8 at 2x the bf16 MXU rate —
if Mosaic lowers a native s8 dot, the encoder (MXU-roofline-bound,
~0.68 s of the 3.15 s bench rep) can use a Pallas int8 GEMM even though
XLA's own s8 TPU lowering measured far slower (ROADMAP round-2 matrix).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
DIM = 1024
KD = 8192  # contraction depth: 17.2 GF/dot so per-iter overheads vanish


@functools.partial(jax.jit, static_argnames=("n_iter", "kind"))
def probe(a, b, n_iter: int, kind: str):
    acc_t = jnp.int32 if kind == "s8" else jnp.float32

    def kernel(a_ref, b_ref, out_ref):
        def body(i, acc):
            y = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_t)
            return acc + y[0:1, 0:1].astype(jnp.float32)

        out_ref[:] = jax.lax.fori_loop(
            0, n_iter, body, jnp.zeros((1, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a, b)


def run(kind):
    rng = np.random.default_rng(0)
    if kind == "s8":
        a = jnp.asarray(rng.integers(-127, 127, (DIM, KD), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (KD, DIM), dtype=np.int8))
    else:
        dt = jnp.bfloat16 if kind == "bf16" else jnp.float32
        a = jnp.asarray(rng.standard_normal((DIM, KD)).astype(np.float32),
                        dt)
        b = jnp.asarray(rng.standard_normal((KD, DIM)).astype(np.float32),
                        dt)
    try:
        t0 = time.time()
        np.asarray(probe(a, b, N, kind))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(probe(a, b, N, kind))
            ts.append(time.time() - t0)
        best = min(ts)
        tf = 2 * DIM * KD * DIM * N / best / 1e12
        print(f"{kind:5s} {DIM}x{KD}x{DIM} x{N}: {best:7.4f}s  "
              f"{tf:6.1f} TFLOP/s  (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{kind}: FAIL {str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    for kind in ("bf16", "s8", "f32"):
        run(kind)
