"""Training/engine checkpointing via Orbax.

The reference has no mid-job resume (SURVEY §5: an interrupted job stays
"running" forever) and only disk-caches model downloads. Here:
  * ``save_train_state`` / ``restore_train_state`` — async-capable Orbax
    pytree checkpoints of (params, opt_state, step) for fine-tuning runs;
  * ``export_params_safetensors`` — flatten a param tree to a
    safetensors file (the format models/loader.py and the diarization/VAD
    loaders consume), bridging training output to serving input.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def save_train_state(ckpt_dir: str, step: int, params: Any,
                     opt_state: Any = None) -> str:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    state: Dict[str, Any] = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return str(path)


def restore_train_state(ckpt_dir: str, step: Optional[int] = None
                        ) -> Tuple[int, Dict[str, Any]]:
    import orbax.checkpoint as ocp

    root = Path(ckpt_dir).absolute()
    steps = sorted(
        int(p.name.split("_")[1]) for p in root.glob("step_*") if p.is_dir()
    )
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {root}")
    step = step if step is not None else steps[-1]
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(root / f"step_{step:08d}")
    return step, state


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or k else f"{k}."))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
        return out
    out[prefix.rstrip(".")] = np.asarray(tree)
    return out


def export_params_safetensors(params: Any, path: str) -> str:
    """Flatten a pytree into dotted-key safetensors."""
    from safetensors.numpy import save_file

    flat = _flatten(params)
    save_file(flat, path)
    return path
