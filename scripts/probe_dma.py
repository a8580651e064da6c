#!/usr/bin/env python
"""Pallas DMA cost-model probe for the megakernel (TPU).

The mega decode step issues ~13k HBM->VMEM DMAs (409/layer x 32) and
runs at ~22.7 ms vs a ~5.4 ms bandwidth roofline. This probe measures
the two constants that design decision rests on:

  * effective HBM->VMEM bandwidth vs DMA chunk size (fixed per-DMA
    overhead shows up as small-chunk bandwidth collapse), and
  * the penalty for STRIDED slices (the cross-KV chunk fetches copy
    1280 rows of 512 B out of 1536 B-wide rows — if row-descriptor
    overhead dominates, re-laying the pack time-chunk-major makes the
    fetch contiguous for free).

Each config streams ~4 GB through a double-buffered (or NS-slot) loop
inside ONE pallas_call, so the ~30 ms tunnel RTT and the per-call XLA
dispatch are amortized away. Prints one line per config:
    name  bytes/DMA  n_dma  best_s  GB/s  us/DMA
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

TARGET_BYTES = float(os.environ.get("PROBE_BYTES", 4e9))


@functools.partial(jax.jit, static_argnames=("rows", "lanes", "n_iter",
                                             "n_slots", "full_lanes"))
def probe(src, rows: int, lanes: int, n_iter: int, n_slots: int,
          full_lanes: int):
    C = src.shape[0]
    dt = src.dtype

    def kernel(src_ref, out_ref, bufs, sems):
        def get(slot, i):
            c = jax.lax.rem(i, C)
            if full_lanes == lanes:
                view = src_ref.at[c]
            else:
                view = src_ref.at[c, :, pl.ds(0, lanes)]
            return pltpu.make_async_copy(view, bufs.at[slot], sems.at[slot])

        for w in range(n_slots - 1):
            get(w, w).start()

        def body(i, acc):
            slot = jax.lax.rem(i, n_slots)

            @pl.when(i + n_slots - 1 < n_iter)
            def _():
                get(jax.lax.rem(i + n_slots - 1, n_slots),
                    i + n_slots - 1).start()

            get(slot, i).wait()
            return acc + bufs[slot][0:1, 0:1].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((1, 1),
                                                           jnp.float32))
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_slots, rows, lanes), dt),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )(src)


def run(name, rows, lanes, dtype, n_slots=2, full_lanes=None):
    full_lanes = full_lanes or lanes
    itemsize = np.dtype(dtype).itemsize
    chunk_bytes = rows * lanes * itemsize
    n_iter = max(16, int(TARGET_BYTES / chunk_bytes))
    C = 8
    rng = np.random.default_rng(0)
    if dtype == np.int8:
        src = jnp.asarray(rng.integers(-127, 127, (C, rows, full_lanes),
                                       dtype=np.int8))
    else:
        src = jnp.asarray(rng.standard_normal(
            (C, rows, full_lanes)).astype(dtype))

    t0 = time.time()
    np.asarray(probe(src, rows, lanes, n_iter, n_slots, full_lanes))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(probe(src, rows, lanes, n_iter, n_slots, full_lanes))
        ts.append(time.time() - t0)
    best = min(ts)
    gbs = chunk_bytes * n_iter / best / 1e9
    print(f"{name:36s} {chunk_bytes/1024:9.1f}KB x{n_iter:7d} "
          f"slots={n_slots} best={best:7.3f}s  {gbs:8.1f} GB/s  "
          f"{best/n_iter*1e6:7.2f} us/DMA  (compile {compile_s:.0f}s)",
          flush=True)


@functools.partial(jax.jit, static_argnames=("rows", "lanes", "n_iter",
                                              "n_streams"))
def probe_multi(src, rows: int, lanes: int, n_iter: int, n_streams: int):
    """n_streams INDEPENDENT double-buffered DMA chains, interleaved —
    tests whether the ~575 GB/s single-chain cap is per-stream (multiple
    DMA engines) or the chip's true HBM->VMEM bandwidth."""
    C = src.shape[0]
    dt = src.dtype

    def kernel(src_ref, out_ref, bufs, sems):
        def get(s, slot, i):
            c = jax.lax.rem(i * n_streams + s, C)
            return pltpu.make_async_copy(
                src_ref.at[c], bufs.at[s, slot], sems.at[s, slot])

        for s in range(n_streams):
            get(s, 0, 0).start()

        def body(i, acc):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)
            for s in range(n_streams):
                @pl.when(i + 1 < n_iter)
                def _():
                    get(s, nxt, i + 1).start()
            for s in range(n_streams):
                get(s, slot, i).wait()
                acc = acc + bufs[s, slot][0:1, 0:1].astype(jnp.float32)
            return acc

        acc = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((1, 1),
                                                           jnp.float32))
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_streams, 2, rows, lanes), dt),
            pltpu.SemaphoreType.DMA((n_streams, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(src)


def run_multi(name, rows, lanes, dtype, n_streams):
    itemsize = np.dtype(dtype).itemsize
    chunk_bytes = rows * lanes * itemsize
    n_iter = max(16, int(TARGET_BYTES / (chunk_bytes * n_streams)))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((16, rows, lanes)).astype(dtype))
    t0 = time.time()
    np.asarray(probe_multi(src, rows, lanes, n_iter, n_streams))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(probe_multi(src, rows, lanes, n_iter, n_streams))
        ts.append(time.time() - t0)
    best = min(ts)
    total = chunk_bytes * n_iter * n_streams
    print(f"{name:36s} {chunk_bytes/1024:9.1f}KB x{n_iter:7d} "
          f"streams={n_streams} best={best:7.3f}s  {total/best/1e9:8.1f} "
          f"GB/s  (compile {compile_s:.0f}s)", flush=True)


def main():
    print(f"backend={jax.default_backend()} target={TARGET_BYTES/1e9:.1f}GB",
          flush=True)
    if os.environ.get("PROBE_MULTI") == "only":
        run_multi("bf16 1MB x1 stream", 64, 8192, jnp.bfloat16, 1)
        run_multi("bf16 1MB x2 streams", 64, 8192, jnp.bfloat16, 2)
        run_multi("bf16 1MB x4 streams", 64, 8192, jnp.bfloat16, 4)
        run_multi("bf16 4MB x2 streams", 256, 8192, jnp.bfloat16, 2)
        return
    # contiguous bf16, size sweep
    run("bf16 64KB contiguous", 8, 4096, jnp.bfloat16)
    run("bf16 256KB contiguous", 16, 8192, jnp.bfloat16)
    run("bf16 1MB contiguous", 64, 8192, jnp.bfloat16)
    run("bf16 4MB contiguous", 256, 8192, jnp.bfloat16)
    # self-cache-like slab: (H*dh, M) bf16, 1.64MB contiguous
    run("selfKV slab (1280,640) bf16", 1280, 640, jnp.bfloat16)
    # cross-KV-like: (H*dh, CT) int8 out of Ta=1536-wide rows — STRIDED
    run("crossKV strided (1280,512/1536)", 1280, 512, np.int8,
        full_lanes=1536)
    # same bytes, contiguous
    run("crossKV contig (1280,512)", 1280, 512, np.int8)
    # 4-slot deep pipeline on the small chunk
    run("bf16 256KB contiguous 4slot", 16, 8192, jnp.bfloat16, n_slots=4)
    run("crossKV strided 4slot", 1280, 512, np.int8, full_lanes=1536,
        n_slots=4)
    if os.environ.get("PROBE_MULTI"):
        run_multi("bf16 1MB x1 stream", 64, 8192, jnp.bfloat16, 1)
        run_multi("bf16 1MB x2 streams", 64, 8192, jnp.bfloat16, 2)
        run_multi("bf16 1MB x4 streams", 64, 8192, jnp.bfloat16, 4)
        run_multi("bf16 4MB x2 streams", 256, 8192, jnp.bfloat16, 2)


if __name__ == "__main__":
    main()
