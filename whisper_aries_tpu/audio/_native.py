"""ctypes bindings to the native ariesaudio C++ runtime.

The shared library (native/ariesaudio.cpp) is the TPU-framework replacement
for the reference's libsndfile/soxr dependency internals (reference
requirements.txt:54-55; used at final_optimized_transcriber.py:85-103).
It is built on demand with `make -C native` (g++ only, no third-party deps);
when the toolchain or the .so is unavailable every call falls back to the
pure-numpy implementations in ``whisper_aries_tpu.audio.decode``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libariesaudio.so"
_PKG_DIR = Path(__file__).resolve().parent
_NATIVE_SRC_DIR = _PKG_DIR.parent.parent / "native"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> bool:
    """Best-effort build of the shared library from source."""
    makefile = _NATIVE_SRC_DIR / "Makefile"
    if not makefile.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_SRC_DIR)],
            capture_output=True,
            check=True,
            timeout=300,
        )
        return (_PKG_DIR / _LIB_NAME).exists()
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        so_path = _PKG_DIR / _LIB_NAME
        if not so_path.exists() and os.environ.get("ARIES_NO_NATIVE") != "1":
            _try_build()
        if not so_path.exists():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError:
            _load_failed = True
            return None
        lib.aries_decode_wav.restype = ctypes.c_int32
        lib.aries_decode_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.aries_resample.restype = ctypes.c_int32
        lib.aries_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.aries_free.restype = None
        lib.aries_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


_ERRORS = {
    1: "not a RIFF/WAVE file",
    2: "missing/invalid fmt chunk",
    3: "missing/empty data chunk",
    4: "unsupported sample format",
    5: "allocation failure",
    6: "bad arguments",
}


def decode_wav_native(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode WAV bytes to (mono float32 array, sample_rate) natively."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    status = lib.aries_decode_wav(
        data, len(data), ctypes.byref(out), ctypes.byref(out_len), ctypes.byref(sr)
    )
    if status != 0:
        raise ValueError(f"WAV decode failed: {_ERRORS.get(status, status)}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr, int(sr.value)


def resample_native(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase Kaiser-sinc resample via the native library."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int64()
    status = lib.aries_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0],
        sr_in,
        sr_out,
        ctypes.byref(out),
        ctypes.byref(n_out),
    )
    if status != 0:
        raise ValueError(f"resample failed: {_ERRORS.get(status, status)}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n_out.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr


def decode_flac_native(data: bytes):
    """Decode FLAC bytes to (mono float32 array, sample_rate) via the native
    decoder (native/ariesflac.cpp)."""
    import ctypes as _ct

    import numpy as _np

    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_flac_configured"):
        lib.aries_decode_flac.restype = _ct.c_int32
        lib.aries_decode_flac.argtypes = [
            _ct.c_char_p,
            _ct.c_int64,
            _ct.POINTER(_ct.POINTER(_ct.c_float)),
            _ct.POINTER(_ct.c_int64),
            _ct.POINTER(_ct.c_int32),
        ]
        lib._flac_configured = True
    out = _ct.POINTER(_ct.c_float)()
    out_len = _ct.c_int64()
    sr = _ct.c_int32()
    status = lib.aries_decode_flac(
        data, len(data), _ct.byref(out), _ct.byref(out_len), _ct.byref(sr)
    )
    if status != 0:
        raise ValueError(f"FLAC decode failed: status {status}")
    try:
        arr = _np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr, int(sr.value)


def mp3_available() -> bool:
    """True when both the native shim and the system libmpg123 are present."""
    lib = load_library()
    if lib is None:
        return False
    if not hasattr(lib, "_mp3_configured"):
        _configure_mp3(lib)
    return bool(lib.aries_mp3_available())


def _configure_mp3(lib) -> None:
    lib.aries_mp3_available.restype = ctypes.c_int32
    lib.aries_mp3_available.argtypes = []
    lib.aries_decode_mp3.restype = ctypes.c_int32
    lib.aries_decode_mp3.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib._mp3_configured = True


def decode_mp3_native(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode MP3 bytes to (mono float32, sample_rate) via the native shim
    over the system libmpg123 (native/ariesmp3.cpp)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_mp3_configured"):
        _configure_mp3(lib)
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    status = lib.aries_decode_mp3(
        data, len(data), ctypes.byref(out), ctypes.byref(out_len),
        ctypes.byref(sr)
    )
    if status != 0:
        msg = {-2: "system libmpg123 not found", -3: "decoder error"}.get(
            status, f"status {status}"
        )
        raise ValueError(f"MP3 decode failed: {msg}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr, int(sr.value)


def ogg_available() -> bool:
    """True when the native shim and system libvorbisfile are present."""
    lib = load_library()
    if lib is None:
        return False
    if not hasattr(lib, "_ogg_configured"):
        _configure_ogg(lib)
    return bool(lib.aries_ogg_available())


def _configure_ogg(lib) -> None:
    lib.aries_ogg_available.restype = ctypes.c_int32
    lib.aries_ogg_available.argtypes = []
    lib.aries_decode_ogg.restype = ctypes.c_int32
    lib.aries_decode_ogg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.aries_encode_ogg_vorbis.restype = ctypes.c_int32
    lib.aries_encode_ogg_vorbis.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._ogg_configured = True


def decode_ogg_native(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode Ogg/Vorbis bytes to (mono float32, sample_rate) via the native
    shim over system libvorbisfile (native/ariesogg.cpp)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_ogg_configured"):
        _configure_ogg(lib)
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    status = lib.aries_decode_ogg(
        data, len(data), ctypes.byref(out), ctypes.byref(out_len),
        ctypes.byref(sr)
    )
    if status != 0:
        msg = {-2: "system libvorbisfile not found",
               -3: "decoder error"}.get(status, f"status {status}")
        raise ValueError(f"OGG decode failed: {msg}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr, int(sr.value)


def av_available() -> bool:
    """True when the native shim was built with ffmpeg headers and the system
    libavformat/libavcodec/libavutil resolve at runtime (native/ariesav.cpp)."""
    lib = load_library()
    if lib is None:
        return False
    if not hasattr(lib, "_av_configured"):
        try:
            _configure_av(lib)
        except AttributeError:  # shim built without ffmpeg headers
            return False
    return bool(lib.aries_av_available())


def _configure_av(lib) -> None:
    lib.aries_av_available.restype = ctypes.c_int32
    lib.aries_av_available.argtypes = []
    lib.aries_decode_av.restype = ctypes.c_int32
    lib.aries_decode_av.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.aries_encode_m4a.restype = ctypes.c_int32
    lib.aries_encode_m4a.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._av_configured = True


def decode_av_native(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode any libavformat container (m4a/aac/wma + audio tracks of
    mp4/mkv/webm/avi/mov) to (mono float32, sample_rate) via the native shim
    over the system ffmpeg libraries (native/ariesav.cpp)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_av_configured"):
        _configure_av(lib)
    out = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_int64()
    sr = ctypes.c_int32()
    status = lib.aries_decode_av(
        data, len(data), ctypes.byref(out), ctypes.byref(out_len),
        ctypes.byref(sr)
    )
    if status != 0:
        msg = {-2: "system ffmpeg libraries not found",
               -3: "demux/decode error"}.get(status, f"status {status}")
        raise ValueError(f"AV decode failed: {msg}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(out_len.value,)).copy()
    finally:
        lib.aries_free(out)
    return arr, int(sr.value)


def encode_m4a_native(audio: np.ndarray, sample_rate: int) -> bytes:
    """Test-vector M4A/AAC encoder (native/ariesav.cpp over the system
    libavcodec); used by the test suite only."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_av_configured"):
        _configure_av(lib)
    x = np.ascontiguousarray(np.clip(audio, -1.0, 1.0), dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_ubyte)()
    out_len = ctypes.c_int64()
    status = lib.aries_encode_m4a(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sample_rate, ctypes.byref(out), ctypes.byref(out_len)
    )
    if status != 0:
        raise ValueError(f"M4A encode failed: status {status}")
    try:
        return bytes(bytearray(out[: out_len.value]))
    finally:
        lib.aries_free(out)


def encode_ogg_native(audio: np.ndarray, sample_rate: int,
                      quality: float = 0.4) -> bytes:
    """Test-vector Ogg/Vorbis encoder (native/ariesogg.cpp over
    libvorbisenc); used by the test suite only."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native ariesaudio library unavailable")
    if not hasattr(lib, "_ogg_configured"):
        _configure_ogg(lib)
    x = np.ascontiguousarray(np.clip(audio, -1.0, 1.0), dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_ubyte)()
    out_len = ctypes.c_int64()
    status = lib.aries_encode_ogg_vorbis(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sample_rate, ctypes.c_float(quality), ctypes.byref(out),
        ctypes.byref(out_len)
    )
    if status != 0:
        raise ValueError(f"OGG encode failed: status {status}")
    try:
        return bytes(bytearray(out[: out_len.value]))
    finally:
        lib.aries_free(out)
