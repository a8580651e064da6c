from whisper_aries_tpu.parallel.mesh import (
    get_mesh,
    make_mesh,
    pad_to_multiple,
    replicate_params,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "make_mesh",
    "pad_to_multiple",
    "replicate_params",
    "shard_batch",
]
