"""Persistent XLA compilation cache setup.

Remote TPU compiles through the axon tunnel cost 40-90 s per (shape,
flag) combination; a large-v3 engine process pays ~16 minutes of them
on first use. JAX's persistent compilation cache serializes compiled
executables to disk keyed by HLO + backend, so a RESTARTED server /
CLI process skips straight to execution (measured: the cache round-trips
through the axon PJRT client — entries written and reloaded across
processes). The reference gets the equivalent for free from CTranslate2
shipping pre-compiled kernels (faster-whisper model load ~seconds,
final_optimized_transcriber.py:120-138); this closes that cold-start
gap the TPU way.

Opt-out: ``ARIES_COMPILE_CACHE=0``. An explicitly exported
``JAX_COMPILATION_CACHE_DIR`` always wins (jax reads it natively).
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at a durable directory.

    Idempotent; called from AriesTranscriber.__init__ (every engine owner
    benefits: server, CLIs, bench). Returns the directory in use, or None
    when disabled/unavailable.
    """
    global _DONE
    if os.environ.get("ARIES_COMPILE_CACHE", "1") == "0":
        return None
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    if _DONE:
        import jax

        return jax.config.jax_compilation_cache_dir
    try:
        import jax

        if cache_dir is None:
            base = os.environ.get("XDG_CACHE_HOME",
                                  os.path.expanduser("~/.cache"))
            cache_dir = os.path.join(base, "whisper_aries_tpu", "xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # tunnel compiles all cost >> 1 s; keep jax's default 1 s floor but
        # make the intent explicit (tiny host-CPU jits stay uncached)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
        return cache_dir
    except Exception:  # old jax / read-only FS: never fatal
        return None
