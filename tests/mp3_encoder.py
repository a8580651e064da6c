"""Test-only MP3 encoder: ctypes binding to the system libmp3lame.

Produces real MPEG-1/2 Layer III streams so tests can close the loop
through the native decoder (native/ariesmp3.cpp over libmpg123) without
any pre-baked binary fixtures or network access — the same pattern as
tests/flac_encoder.py for the FLAC path.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _load_lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def lame_available() -> bool:
    return _load_lame() is not None


def encode_mp3(audio: np.ndarray, sample_rate: int = 16_000,
               bitrate_kbps: int = 64) -> bytes:
    """Mono float32 [-1, 1] -> MP3 bytes via libmp3lame."""
    lame = _load_lame()
    if lame is None:
        raise RuntimeError("libmp3lame not available")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    if not gfp:
        raise RuntimeError("lame_init failed")
    try:
        for setter, val in (
            ("lame_set_num_channels", 1),
            ("lame_set_in_samplerate", sample_rate),
            ("lame_set_brate", bitrate_kbps),
            ("lame_set_mode", 3),  # MONO
            ("lame_set_quality", 2),
        ):
            fn = getattr(lame, setter)
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int]
            fn(gfp, val)
        lame.lame_init_params.argtypes = [ctypes.c_void_p]
        if lame.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")

        x = np.ascontiguousarray(np.clip(audio, -1.0, 1.0), dtype=np.float32)
        n = len(x)
        out_size = int(1.25 * n + 7200) + 7200
        out = (ctypes.c_ubyte * out_size)()
        enc = lame.lame_encode_buffer_ieee_float
        enc.restype = ctypes.c_int
        enc.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        pf = x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n1 = enc(gfp, pf, pf, n, out, out_size)
        if n1 < 0:
            raise RuntimeError(f"lame_encode_buffer failed: {n1}")
        flush = lame.lame_encode_flush
        flush.restype = ctypes.c_int
        flush.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                          ctypes.c_int]
        tail = (ctypes.c_ubyte * 7200)()
        n2 = flush(gfp, tail, 7200)
        if n2 < 0:
            raise RuntimeError(f"lame_encode_flush failed: {n2}")
        return bytes(out[:n1]) + bytes(tail[:n2])
    finally:
        lame.lame_close.argtypes = [ctypes.c_void_p]
        lame.lame_close(gfp)
