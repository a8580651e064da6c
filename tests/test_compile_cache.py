"""Persistent compile-cache setup (utils/compile_cache.py)."""

import os

import jax

from whisper_aries_tpu.utils import compile_cache as cc


def test_opt_out(monkeypatch):
    monkeypatch.setenv("ARIES_COMPILE_CACHE", "0")
    assert cc.enable_compile_cache() is None


def test_explicit_env_wins(monkeypatch):
    monkeypatch.delenv("ARIES_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/somewhere")
    assert cc.enable_compile_cache() == "/tmp/somewhere"


def test_enables_and_idempotent(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("ARIES_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_DONE", False)
    # jax.config.update is session-global state monkeypatch can't revert —
    # restore it by hand so later tests don't compile into a deleted tmpdir
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        d = str(tmp_path / "xla")
        got = cc.enable_compile_cache(d)
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # second call returns the configured dir without re-setup
        assert cc.enable_compile_cache("/tmp/ignored") == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min)
        cc._DONE = False
