"""utils/memory.py — the OOM heuristic the engine retry ladders key on."""

from whisper_aries_tpu.utils.memory import is_oom_error


class XlaRuntimeError(Exception):
    pass


class JaxRuntimeError(Exception):
    pass


def test_oom_spellings():
    # every observed axon/XLA phrasing must match (a miss crashes the
    # engine's OOM ladder instead of retrying at a smaller batch)
    for msg in (
        "RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes",
        "Resource exhausted: HBM",
        "TPU backend error (ResourceExhausted).",  # no separator (round 5)
        "HTTP 500: tpu_compile_helper subprocess exit code 1",
        "http://127.0.0.1:1/remote_compile: read body",
    ):
        assert is_oom_error(JaxRuntimeError(msg)), msg
    assert is_oom_error(XlaRuntimeError("failed to allocate 2.5G on device"))
    assert is_oom_error(RuntimeError("out of memory"))


def test_non_oom_not_matched():
    for e in (ValueError("shape mismatch"), KeyError("kv8"),
              RuntimeError("invalid argument")):
        assert not is_oom_error(e), e
