"""Checkpoint resolution and loading for Whisper models.

Replaces the reference's model-manager + HF-hub download path
(final_optimized_transcriber.py:269-306 constructs WhisperModel(model_size,
download_root=...)): checkpoints are plain HF-format directories
(config.json + model.safetensors + tokenizer files) resolved from a local
cache dir — zero-egress by default; ``ARIES_AUTO_DOWNLOAD=1`` enables the
huggingface_hub pull when the environment has network access.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from whisper_aries_tpu.models import whisper as W

log = logging.getLogger(__name__)

_HF_REPOS = {
    # openai/whisper-* naming on the Hub
    name: f"openai/whisper-{name}" for name in W.PRESETS
}


def _is_checkpoint_dir(p: Path) -> bool:
    return (p / "config.json").exists() and (p / "model.safetensors").exists()


def resolve_model_dir(model_name: str, cache_dir: str = "./models"
                      ) -> Optional[Path]:
    """Find a local HF-format checkpoint dir for ``model_name``.

    Search order: the name as a literal path, ``{cache_dir}/{name}``,
    ``{cache_dir}/whisper-{name}``, then (with ARIES_AUTO_DOWNLOAD=1) a
    huggingface_hub snapshot download into the cache dir. Returns None when
    nothing is available — callers fall back to random weights
    (benchmarks) or raise (production loads)."""
    candidates = [
        Path(model_name),
        Path(cache_dir) / model_name,
        Path(cache_dir) / f"whisper-{model_name}",
        Path(cache_dir) / f"openai--whisper-{model_name}",
    ]
    for c in candidates:
        if _is_checkpoint_dir(c):
            return c
    if os.environ.get("ARIES_AUTO_DOWNLOAD") == "1" and model_name in _HF_REPOS:
        try:
            from huggingface_hub import snapshot_download

            target = Path(cache_dir) / f"whisper-{model_name}"
            snapshot_download(
                _HF_REPOS[model_name],
                local_dir=str(target),
                allow_patterns=["config.json", "model.safetensors",
                                "generation_config.json", "tokenizer*",
                                "vocab.json", "merges.txt",
                                "*tokens*.json", "normalizer.json",
                                "preprocessor_config.json"],
            )
            if _is_checkpoint_dir(target):
                return target
        except Exception as e:  # no egress / no hub — stay local
            log.warning("auto-download of %s failed: %s", model_name, e)
    return None


def load_model(model_size: str, cache_dir: str = "./models",
               dtype=None, allow_random: bool = False
               ) -> Tuple[Dict[str, Any], W.WhisperDims, Optional[str]]:
    """Load (params, dims, model_dir) for ``model_size``.

    With a local checkpoint: reads config.json for the dims and converts
    the flat HF safetensors state dict (same key names as the torch state
    dict) into the scan-over-layers pytree. Without one: random init at the
    preset dims when ``allow_random`` (benchmarks, tests), else raises.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    d = resolve_model_dir(model_size, cache_dir)
    if d is None:
        if model_size in W.PRESETS and allow_random:
            dims = W.PRESETS[model_size]
            log.warning(
                "no local checkpoint for %r under %s — using RANDOM weights "
                "(identical FLOPs; transcripts are meaningless)",
                model_size, cache_dir,
            )
            return W.init_params(dims, dtype=dtype), dims, None
        raise FileNotFoundError(
            f"no local checkpoint for {model_size!r} under {cache_dir} "
            "(need config.json + model.safetensors; set "
            "ARIES_AUTO_DOWNLOAD=1 with network access, or pass "
            "allow_random=True for random-weight runs)"
        )
    from safetensors.numpy import load_file

    cfg = json.loads((d / "config.json").read_text(encoding="utf-8"))
    dims = W.dims_from_hf_config(cfg)
    sd = load_file(str(d / "model.safetensors"))
    params = W.convert_hf_state_dict(sd, dims, dtype=dtype)
    log.info("loaded %s from %s (%s)", model_size, d, dtype)
    return params, dims, str(d)


def load_alignment_heads(model_dir) -> Optional[List[Tuple[int, int]]]:
    """Per-checkpoint DTW alignment heads from generation_config.json
    (openai's published cross-attention head masks; used by
    align/word_align.py instead of the generic top-half-layers fallback)."""
    if model_dir is None:
        return None
    p = Path(model_dir) / "generation_config.json"
    if not p.exists():
        return None
    try:
        cfg = json.loads(p.read_text(encoding="utf-8"))
        heads = cfg.get("alignment_heads")
        if not heads:
            return None
        return [(int(l), int(h)) for l, h in heads]
    except Exception as e:
        log.warning("could not read alignment heads from %s: %s", p, e)
        return None
