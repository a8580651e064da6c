"""Audio decode + resample front door.

Replaces the reference's AudioPreloader decode path
(final_optimized_transcriber.py:49-135: soundfile -> stereo downmix ->
librosa.resample, with a librosa/ffmpeg fallback for video) with:

  1. the native C++ ariesaudio runtime (WAV decode + polyphase resample),
  2. a pure-numpy fallback (same semantics) when the native lib is absent,
  3. ffmpeg extraction for compressed/video containers
     (utils.extract_audio_if_needed), mirroring reference utils.py:96-130.

All public functions return mono float32 at the requested rate (16 kHz for
the ASR/diarization contract).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from whisper_aries_tpu.errors import AudioError

SAMPLE_RATE = 16_000


# ---------------------------------------------------------------------------
# Pure-numpy WAV parser (fallback, same contract as native decode)
# ---------------------------------------------------------------------------

def _decode_wav_numpy(data: bytes) -> Tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag == 0xFFFE and len(body) >= 40:
                tag = int.from_bytes(body[24:26], "little")
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise AudioError("missing fmt chunk")
    if pcm is None or len(pcm) == 0:
        raise AudioError("missing data chunk")
    tag, channels, rate, bits = fmt
    if tag == 1 and bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    elif tag == 1 and bits == 32:
        x = np.frombuffer(pcm, dtype="<i4").astype(np.float32) / 2147483648.0
    elif tag == 1 and bits == 24:
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3)
        vals = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        x = vals.astype(np.float32) / 8388608.0
    elif tag == 1 and bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif tag == 3 and bits == 32:
        x = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
    elif tag == 3 and bits == 64:
        x = np.frombuffer(pcm, dtype="<f8").astype(np.float32)
    else:
        raise AudioError(f"unsupported WAV format tag={tag} bits={bits}")
    if channels > 1:
        n = (x.shape[0] // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), rate


def _resample_numpy(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """High-quality rational resample via scipy's polyphase filter when
    available, else windowed-sinc numpy (same design as the native kernel)."""
    if sr_in == sr_out:
        return x.astype(np.float32, copy=False)
    try:
        from scipy.signal import resample_poly

        g = math.gcd(sr_in, sr_out)
        # scipy's default ('kaiser', 5.0) window only reaches ~50 dB stopband;
        # use the same beta as the native kernel for >100 dB.
        y = resample_poly(
            x.astype(np.float64), sr_out // g, sr_in // g, window=("kaiser", 12.984)
        )
        return y.astype(np.float32)
    except ImportError:
        pass
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    taps = 32  # even, so the L*taps/2 group delay is integral
    h_len = L * taps + 1  # odd length centers the filter exactly on-grid
    cutoff = 0.945 / max(L, M)
    H = (h_len - 1) // 2
    n = np.arange(h_len, dtype=np.float64)
    t = (n - H) * cutoff
    sinc = np.sinc(t)
    beta = 12.984
    w = np.i0(beta * np.sqrt(np.maximum(0.0, 1 - (2 * n / (h_len - 1) - 1) ** 2))) / np.i0(beta)
    h = np.zeros(L * (taps + 1), dtype=np.float64)
    h[:h_len] = L * cutoff * sinc * w
    n_out = (len(x) * L + M - 1) // M
    u = np.arange(n_out, dtype=np.int64) * M + H
    p = u % L
    m = u // L
    k = np.arange(taps + 1, dtype=np.int64)
    idx = m[:, None] - k[None, :]
    valid = (idx >= 0) & (idx < len(x))
    xi = np.where(valid, x[np.clip(idx, 0, len(x) - 1)], 0.0)
    hk = h[p[:, None] + k[None, :] * L]
    return (xi * hk).sum(axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def peek_wav_s16_mono(data: bytes, sample_rate: int = SAMPLE_RATE
                      ) -> Optional[np.ndarray]:
    """Raw int16 samples when ``data`` is a plain PCM16 MONO WAV already at
    ``sample_rate`` — else None.

    Fast path for the engine's 16-bit device upload (pipeline/engine.py
    ``_upload_audio``): the reference's own ingest contract is pcm_s16le
    (reference utils.py:107-123), so the dominant input is a buffer we can
    hand to the device verbatim instead of decoding to float32 and
    re-quantizing the whole file back to int16 (two extra full-file passes
    on the host).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and size >= 16:
            body = data[pos + 8 : pos + 8 + size]
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag == 0xFFFE and len(body) >= 40:
                tag = int.from_bytes(body[24:26], "little")
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            pcm = (pos + 8, size)
        pos += 8 + size + (size & 1)
    if fmt != (1, 1, sample_rate, 16) or pcm is None:
        return None
    off, size = pcm
    size = min(size, len(data) - off) & ~1
    return np.frombuffer(data, dtype="<i2", count=size // 2, offset=off)


def decode_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32, sample_rate); native fast path first."""
    from whisper_aries_tpu.audio import _native

    if _native.native_available():
        try:
            return _native.decode_wav_native(data)
        except ValueError as e:
            raise AudioError(str(e)) from e
    return _decode_wav_numpy(data)


def resample(x: np.ndarray, sr_in: int, sr_out: int = SAMPLE_RATE) -> np.ndarray:
    """Mono float32 resample; native polyphase kernel first."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    from whisper_aries_tpu.audio import _native

    if _native.native_available():
        return _native.resample_native(np.asarray(x, dtype=np.float32), sr_in, sr_out)
    return _resample_numpy(np.asarray(x, dtype=np.float32), sr_in, sr_out)


def load_audio(path: str, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Load any supported media file as mono float32 at ``sample_rate``.

    WAV is decoded natively; compressed audio / video containers go through
    ffmpeg extraction to a temp WAV first (reference behaviour:
    utils.py:96-130 + final_optimized_transcriber.py:73-80).
    """
    p = Path(path)
    if not p.exists():
        raise AudioError(f"audio file not found: {path}")
    ext = p.suffix.lower()
    tmp_path: Optional[str] = None
    try:
        if ext == ".flac":
            # native FLAC decoder (native/ariesflac.cpp) — no ffmpeg needed
            from whisper_aries_tpu.audio import _native

            if _native.native_available():
                try:
                    audio, sr = _native.decode_flac_native(p.read_bytes())
                    if sr != sample_rate:
                        audio = resample(audio, sr, sample_rate)
                    return audio
                except ValueError as e:
                    raise AudioError(f"FLAC decode failed for {path}: {e}") from e
            # fall through to ffmpeg extraction below
        if ext == ".mp3":
            # native MP3 path (native/ariesmp3.cpp over system libmpg123)
            from whisper_aries_tpu.audio import _native

            if _native.native_available() and _native.mp3_available():
                try:
                    audio, sr = _native.decode_mp3_native(p.read_bytes())
                    if sr != sample_rate:
                        audio = resample(audio, sr, sample_rate)
                    return audio
                except ValueError as e:
                    raise AudioError(f"MP3 decode failed for {path}: {e}") from e
            # fall through to ffmpeg extraction below
        if ext in (".ogg", ".oga"):
            # native Ogg/Vorbis path (native/ariesogg.cpp over libvorbisfile)
            from whisper_aries_tpu.audio import _native

            if _native.native_available() and _native.ogg_available():
                try:
                    audio, sr = _native.decode_ogg_native(p.read_bytes())
                    if sr != sample_rate:
                        audio = resample(audio, sr, sample_rate)
                    return audio
                except ValueError as e:
                    raise AudioError(f"OGG decode failed for {path}: {e}") from e
            # fall through to ffmpeg extraction below
        if ext != ".wav":
            # native libavformat/libavcodec path (native/ariesav.cpp): m4a,
            # aac, wma, opus, and the audio track of video containers — the
            # formats the reference could only reach through the ffmpeg
            # binary (utils.py:96-130) or librosa/audioread
            # (final_optimized_transcriber.py:105-112)
            from whisper_aries_tpu.audio import _native

            if _native.native_available() and _native.av_available():
                try:
                    audio, sr = _native.decode_av_native(p.read_bytes())
                    if sr != sample_rate:
                        audio = resample(audio, sr, sample_rate)
                    return audio
                except ValueError:
                    pass  # fall through to ffmpeg extraction below
        if ext != ".wav":
            from whisper_aries_tpu.utils.media import extract_audio_if_needed
            import shutil as _shutil

            if _shutil.which("ffmpeg"):
                # Force extraction for every non-wav container.
                import subprocess, tempfile

                fd, tmp_path = tempfile.mkstemp(suffix=".wav")
                os.close(fd)
                subprocess.run(
                    ["ffmpeg", "-y", "-i", str(p), "-vn", "-acodec", "pcm_s16le",
                     "-ar", str(sample_rate), "-ac", "1", tmp_path],
                    capture_output=True, check=True,
                )
                data = Path(tmp_path).read_bytes()
            else:
                raise AudioError(
                    f"cannot decode {ext} without ffmpeg; install ffmpeg or "
                    "provide a WAV file"
                )
        else:
            data = p.read_bytes()
        audio, sr = decode_wav_bytes(data)
        if sr != sample_rate:
            audio = resample(audio, sr, sample_rate)
        return audio
    finally:
        if tmp_path and os.path.exists(tmp_path):
            os.remove(tmp_path)


def write_wav(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    """Write mono float32 [-1,1] as 16-bit PCM WAV (test/tooling helper)."""
    import struct

    x = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    with open(path, "wb") as f:
        f.write(hdr + pcm)


class AudioPreloader:
    """Whole-file in-RAM audio with O(1) window slicing.

    Equivalent of the reference AudioPreloader
    (final_optimized_transcriber.py:49-135): decode once to mono float32
    16 kHz, then ``get_chunk(start_sec, end_sec)`` is a view-slice.
    """

    def __init__(self, path: str, sample_rate: int = SAMPLE_RATE):
        self.path = path
        self.sample_rate = sample_rate
        #: raw int16 samples when the source is already PCM16 mono at the
        #: target rate (the reference's pcm_s16le ingest contract) — lets
        #: the engine upload the file verbatim (_AudioUploader)
        self.audio_i16: Optional[np.ndarray] = None
        self._audio_f32: Optional[np.ndarray] = None
        if Path(path).suffix.lower() == ".wav":
            try:
                self.audio_i16 = peek_wav_s16_mono(
                    Path(path).read_bytes(), sample_rate
                )
            except OSError:
                pass
        if self.audio_i16 is None:
            self._audio_f32 = load_audio(path, sample_rate)
        n = len(self.audio_i16 if self.audio_i16 is not None
                else self._audio_f32)
        self.duration = n / sample_rate

    @property
    def audio(self) -> np.ndarray:
        """Mono float32 samples. For PCM16 sources the conversion is
        LAZY: materializing the 4-byte copy of a long file costs ~1 s of
        first-touch page faults (measured on a 36-min WAV), and the
        engine's common path (int16 span upload, VAD off or energy VAD)
        may never need it. Same float contract as load_audio's s16
        branch (x / 32768)."""
        if self._audio_f32 is None:
            self._audio_f32 = self.audio_i16.astype(np.float32) / 32768.0
        return self._audio_f32

    def get_chunk(self, start_sec: float, end_sec: float) -> np.ndarray:
        i0 = max(0, int(round(start_sec * self.sample_rate)))
        i1 = min(len(self.audio), int(round(end_sec * self.sample_rate)))
        return self.audio[i0:i1]
