"""Device-mesh construction and sharding helpers.

This layer replaces the reference's entire worker-pool machinery — thread
queues, staggered startup, VRAM heuristics, per-worker model replicas
(final_optimized_transcriber.py:199-403; multi-GPU round robin at
complete_fixed_whisper.py:180-186; SURVEY §2.4) — with the TPU-native
equivalent: ONE resident compiled program and a ``jax.sharding.Mesh`` whose
``data`` axis shards the batch of 30 s windows across chips. XLA inserts the
collectives; there is no queue, no lock, no worker census.

The mesh is 1-D ("data") because Whisper large-v3 fits comfortably in a
single v5e chip's HBM (~3.2 GB int8 / ~6.4 GB bf16), so scale-out is pure
data parallelism over windows/files — the roofline-optimal layout for this
model family. The helpers still accept arbitrary axis layouts so tensor
axes can be added for models that outgrow a chip.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 0, axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D data-parallel mesh over ``n_data`` devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data and n_data > 0:
        devs = devs[:n_data]
    arr = np.array(devs).reshape((len(devs),) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names)


@functools.lru_cache(maxsize=1)
def get_mesh() -> Mesh:
    """Process-wide default mesh over every visible device."""
    return make_mesh()


def replicate_params(params: Any, mesh: Mesh) -> Any:
    """Place the parameter pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(x: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard array pytree along the leading (batch) dimension."""

    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, x)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0
                    ) -> Tuple[np.ndarray, int]:
    """Pad ``x`` along ``axis`` up to a multiple; returns (padded, n_real)."""
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple if n else multiple
    if target == n:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - n)
    return np.pad(x, pad_widths), n


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """NamedSharding for an ndim array sharded on dim 0."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _mega_path_default(beam_size: int) -> bool:
    """Whether beam decode will take the Pallas megakernel step path
    (generate.py resolves ARIES_BEAM_REORDER="default" to "mega" on TPU
    for beam search with int8 cross-KV — the engine's TPU defaults)."""
    if beam_size <= 1:
        return False  # greedy mega has its own branch (grouped windows)
    import os

    mode = os.environ.get("ARIES_BEAM_REORDER", "default")
    if mode not in ("default", "mega"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _greedy_mega_default() -> bool:
    """Whether greedy decode takes the grouped-windows megakernel
    (engine TPU default; ARIES_GREEDY_MEGA=0 opts out)."""
    import os

    if os.environ.get("ARIES_GREEDY_MEGA", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def auto_windows_per_device(
    model_name: str = "large-v3",
    beam_size: int = 5,
    sample_len: int = 224,
    hbm_bytes: Optional[int] = None,
    mega: Optional[bool] = None,
    self_kv_int8: Optional[bool] = None,
) -> int:
    """Derive the per-device window batch from available HBM.

    TPU-native replacement for the reference's VRAM-based worker heuristics
    (final_optimized_transcriber.py:219-240, complete_fixed_whisper.py:
    638-678). Two regimes:

    * ``mega`` (the TPU beam default, Pallas decode megakernel): sized by
      HBM BYTES — the kernel tiles its own windows, so the XLA 128-row
      tile cliff does not apply and throughput rises monotonically with
      batch (measured: 24→352x, 36→361x, 48→366x; 56 OOMs). Anchored at
      the measured capacity: 48 windows @ beam 5 / 108 cache positions /
      int8 self-cache in 16 GB. ``self_kv_int8=None`` assumes the engine
      TPU default (int8).
    * non-mega (XLA decode step): anchored at the batch-24 throughput
      knee and HARD-CAPPED at batch*beam <= 128 rows — per-op cost steps
      up ~2x when the row count of every decode-step GEMM crosses the
      128-lane tile (measured 24x5=120 rows → 155x, 26x5=130 → 87x).

    The engine additionally retries with a halved batch on an HBM OOM,
    so this only needs to be a good first guess. Clamped to [1, 56].
    """
    from whisper_aries_tpu.models.whisper import PRESETS

    dims = PRESETS.get(model_name, PRESETS["large-v3"])
    hbm_given = hbm_bytes is not None
    if hbm_bytes is None:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            hbm_bytes = stats.get("bytes_limit")
        except Exception:
            hbm_bytes = None
    if not hbm_bytes:
        hbm_bytes = 16 * 1024**3  # v5e default

    dh = dims.n_text_state // dims.n_text_head
    cache_len = sample_len + 8
    if mega is None:
        mega = _mega_path_default(beam_size)
    if mega:
        # BYTE model of the mega path's per-window HBM residents, anchored
        # at the measured 16 GB capacity (48 windows @ beam 5 / cache 108 /
        # int8 self-cache fit at 366x; 56 OOMs — round-3 sweep):
        #   * packed int8 cross-KV: 2 (k&v) x L x H x dh x TaP bytes
        #   * packed beam self-cache, FULL K-minor allocation (the x128-
        #     rounded (cache_len*beam + slack) minor, init_kv_cache)
        #   * ~40 MB/window of encoder/mel/logit activation transients
        if self_kv_int8 is None:
            self_kv_int8 = True  # engine TPU default (auto -> int8)
        tap = ((dims.n_audio_ctx + 127) // 128) * 128
        m_minor = ((cache_len * beam_size + 127) // 128) * 128 + 128
        kbytes = 2 * dims.n_text_layer * dims.n_text_head * dh
        cost = (kbytes * (tap + m_minor * (1 if self_kv_int8 else 2))
                + 40e6)
        anchor_cost = (2 * 32 * 20 * 64 * (1536 + 768) + 40e6)
        n = (48.0 * (hbm_bytes / (16 * 1024**3))
             * anchor_cost / max(cost, 1.0))
        # FLOOR to the x4 batch grid: n * cost is then <= the measured
        # 48-window budget (rounding up overshoots it and trips the OOM
        # halve-retry, a ~60-90 s recompile on the product path)
        return int(np.clip(int(n // 4) * 4, 1, 56))
    if beam_size <= 1 and _greedy_mega_default():
        # GREEDY grouped megakernel (Kg=4): no row-tile cliff; HBM-bound.
        # Byte model anchored at the measured 16 GB capacity/peak:
        # batch 48 -> 510-515x, 64 OOMs (round-5 sweep). Per-window
        # residents: whole-TaP int8 cross KV (the dominant stream),
        # 1/Kg of the grouped K-minor int8 self-cache, ~40 MB transients.
        kg = 4
        tap = ((dims.n_audio_ctx + 127) // 128) * 128
        m_minor = ((cache_len * kg + 127) // 128) * 128 + 128
        kbytes = 2 * dims.n_text_layer * dims.n_text_head * dh
        cost = kbytes * (tap + m_minor / kg) + 40e6
        anchor_cost = 2 * 32 * 20 * 64 * (1536 + 1152 / 4) + 40e6
        n = (48.0 * (hbm_bytes / (16 * 1024**3))
             * anchor_cost / max(cost, 1.0))
        return int(np.clip(int(n // 4) * 4, 1, 56))
    # relative cost vs the measured anchor configuration (int8 cross-KV,
    # bf16 self-cache kept twice across the beam-reorder gather)
    anchor_cost = (
        2 * 32 * 20 * 1500 * 64 * 1  # large-v3 int8 cross-KV
        + 2 * 2 * 32 * 5 * 20 * 103 * 64 * 2  # beam self-cache (x2 reorder)
    )
    cost = (
        2 * dims.n_text_layer * dims.n_text_head * dims.n_audio_ctx * dh * 1
        + 2 * 2 * dims.n_text_layer * beam_size * dims.n_text_head
        * cache_len * dh * 2
    )
    # 24 is the measured THROUGHPUT knee of the XLA step, not the HBM
    # ceiling: its batch sweep is non-monotonic (16->88x, 24->155x,
    # 26->87x — ROADMAP.md) and auto-sizing anchors at the knee
    anchor_windows = 24.0 * (hbm_bytes / (16 * 1024**3))
    n = anchor_windows * anchor_cost / max(cost, 1)
    # round to a multiple of 4: friendlier XLA tiles, and window counts
    # (files tile into whole windows) pad less often against odd batches
    n = round(n / 4.0) * 4
    # HARD CAP at the 128-row tile tier: the XLA decode step is per-op-
    # overhead-bound, and per-op cost steps up ~2x when batch*beam (the
    # row count of every decode-step GEMM) crosses the 128-lane tile
    # boundary — measured 24x5=120 rows -> 155x, 25x5=125 -> 149x,
    # 26x5=130 -> 87x, and the whole >128 tier fits
    # throughput = (batch/24)*155/2 (26->87, 32->99). Crossing the
    # boundary is never a win until batch/24 > 2, which HBM can't hold
    # at beam 5 — so cap rows at 128. (The mega path above has no such
    # cliff: the kernel tiles per-window rows itself.)
    if beam_size >= 1:
        n = min(n, (128 // beam_size // 4) * 4)
    try:
        import jax

        if not hbm_given and jax.default_backend() == "cpu":
            # CPU is the functional/test backend, usually 8 virtual
            # devices on one core: XLA:CPU compile time scales with the
            # padded batch (a 320-window program takes >10 min to build
            # for a 2-window file), and its "bytes_limit" is host RAM, so
            # the HBM anchor is meaningless there anyway. An EXPLICIT
            # hbm_bytes bypasses the clamp (tests size for TPU budgets).
            n = min(n, 2)
    except Exception:
        pass
    return int(np.clip(n, 1, 56))
