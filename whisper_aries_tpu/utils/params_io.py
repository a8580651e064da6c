"""Flat safetensors <-> nested parameter pytrees.

The diarization/VAD nets (models/diarize_nets.py, models/vad_net.py) store
weights as flat safetensors files with dotted keys ("blocks.attn.q.w",
"stem.0.w", ...). These helpers map between that on-disk layout and the
nested dict/list pytrees the forward functions consume, using an init-time
template for structure (safetensors itself is schemaless).

Replaces the reference's reliance on torch.load/pyannote checkpoint formats
(conversation_transcriber.py:85-98) with a zero-pickle, zero-torch format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np


def flatten_params(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dicts/lists/tuples of arrays -> {dotted.key: np.ndarray}."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        items = params.items()
    elif isinstance(params, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(params))
    else:
        out[prefix.rstrip(".")] = np.asarray(params)
        return out
    for k, v in items:
        out.update(flatten_params(v, prefix=f"{prefix}{k}."))
    return out


def unflatten_into(template: Any, flat: Dict[str, np.ndarray],
                   prefix: str = "", asarray=None) -> Any:
    """Fill a ``template`` pytree (from an init_* function) with values from
    a flat dotted-key dict. Missing keys keep the template value; extra keys
    are ignored (callers may validate with ``flatten_params`` round trips).
    """
    if asarray is None:
        import jax.numpy as jnp

        asarray = jnp.asarray
    if isinstance(template, dict):
        return {
            k: unflatten_into(v, flat, prefix=f"{prefix}{k}.", asarray=asarray)
            for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        seq = [
            unflatten_into(v, flat, prefix=f"{prefix}{i}.", asarray=asarray)
            for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, tuple) else seq
    key = prefix.rstrip(".")
    if key in flat:
        return asarray(flat[key])
    return template


def save_params(path: str, params: Any) -> str:
    """Write a parameter pytree as a flat safetensors file."""
    from safetensors.numpy import save_file

    # ascontiguousarray is load-bearing: device fetches through the axon
    # client can come back F-ordered/strided (np.array order='K' keeps
    # that), and safetensors serializes RAW memory order while load_file
    # interprets C order — a non-contiguous leaf round-trips scrambled
    # (reproduced: seg conv1.w 95% of bytes wrong, /tmp probe, round 4)
    flat = {k: np.ascontiguousarray(np.asarray(v))
            for k, v in flatten_params(params).items()}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file(flat, str(path))
    return str(path)


def load_params_into(template: Any, path: str) -> Any:
    """Load a flat safetensors file into the structure of ``template``.

    Raises FileNotFoundError if the file is absent and ValueError when the
    file's keys don't cover the template (a silent half-load would produce a
    half-random model).
    """
    from safetensors.numpy import load_file

    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(str(p))
    flat = load_file(str(p))
    want = set(flatten_params(template).keys())
    have = set(flat.keys())
    missing = want - have
    if missing:
        raise ValueError(
            f"{path} is missing {len(missing)} parameter(s), e.g. "
            f"{sorted(missing)[:3]}"
        )
    return unflatten_into(template, flat)


def default_weights_dir() -> Path:
    """Package-shipped weights (trained in-repo: training/diarize_train.py)."""
    return Path(__file__).resolve().parent.parent / "weights"
