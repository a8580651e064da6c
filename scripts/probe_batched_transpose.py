"""Probe: does Mosaic lower a BATCHED minor-dims transpose, and is it
faster than the decode megakernel's per-window 2D transposes?

Motivation (VERDICT r3 #3): the megakernel pays 6 per-(layer,window)
head transposes = 4.14 ms/step at B=36 (ROADMAP ablation). The proposed
layout rework replaces them with ONE batched (Bw, KP, 3d)->(Bw, 3d, KP)
transpose per block. This probe answers, on the real Mosaic backend:
  a) does jnp.swapaxes(x, 1, 2) lower inside a Pallas kernel at these
     shapes at all;
  b) what does it cost vs Bw serial 2D .T ops of the same data.

Run on TPU: python scripts/probe_batched_transpose.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Bw, KP, D = 36, 8, 3840
REPS = 64   # transposes per kernel call (amortize launch + tunnel RTT)


def make(variant: str):
    def kernel(x_ref, o_ref, acc):
        def body(i, _):
            h = (x_ref[:] + i).reshape(Bw, KP, D)
            if variant == "batched":
                ht = jnp.swapaxes(h, 1, 2)          # (Bw, D, KP)
                acc[:] = acc[:] + ht.sum(0).astype(jnp.float32)
            elif variant == "perwin":
                for w in range(Bw):                  # static unroll
                    acc[:] = acc[:] + h[w].T.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[:] = acc[:]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((D, KP), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((D, KP), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x)

    return run


def main():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((Bw * KP, D)),
        jnp.bfloat16)
    for variant in ("batched", "perwin"):
        try:
            run = make(variant)
            t0 = time.time()
            y = np.asarray(run(x))
            print(f"{variant}: compile+first {time.time()-t0:.1f}s "
                  f"sum={y.sum():.3f}")
            # steady state: amortize the tunnel RTT over several calls
            t0 = time.time()
            n = 8
            for _ in range(n):
                y = run(x)
            np.asarray(y)   # block (axon: block_until_ready is a no-op)
            per_call = (time.time() - t0) / n
            print(f"{variant}: {per_call*1e3:.2f} ms/call, "
                  f"{per_call/REPS*1e6:.1f} us per full-({Bw}x{KP}x{D}) "
                  f"transpose sweep")
        except Exception as e:
            print(f"{variant}: FAILED -> {type(e).__name__}: "
                  f"{str(e)[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
