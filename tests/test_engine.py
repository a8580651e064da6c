"""End-to-end engine tests on a tiny random Whisper (machinery, not WER):
window planning -> batched mel/encode/decode -> segment parsing -> outputs.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_aries_tpu.audio.decode import write_wav
from whisper_aries_tpu.decoding.tokenizer import build_special_tokens
from whisper_aries_tpu.models import whisper as W
from whisper_aries_tpu.pipeline.engine import AriesTranscriber


class TinyTokenizer:
    """10 base 'text' ids rendered a..j + derived whisper specials (2 langs)."""

    def __init__(self):
        self.specials = build_special_tokens(10, 2)

    def decode(self, ids, skip_special=True):
        return "".join(chr(ord("a") + i) for i in ids if 0 <= i < 10)

    def encode(self, text):
        return [max(0, min(9, ord(c) - ord("a"))) for c in text.strip() or "a"]

    def non_speech_tokens(self, encoder):
        return []


@pytest.fixture(scope="module")
def tiny_engine():
    tok = TinyTokenizer()
    dims = W.WhisperDims(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=tok.specials.n_vocab, n_text_ctx=448,
        n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    params = W.init_params(dims, dtype=jnp.float32)
    return AriesTranscriber(
        model_size="tiny-test", _params=params, _dims=dims, _tokenizer=tok,
        windows_per_device=1,
    )


@pytest.fixture(scope="module")
def speech_wav(tmp_path_factory):
    rng = np.random.default_rng(0)
    sr = 16000
    total = 20.0
    n = int(sr * total)
    t = np.arange(n) / sr
    x = 0.002 * rng.standard_normal(n).astype(np.float32)
    for s, e in [(1.0, 6.0), (9.0, 14.0)]:
        m = (t >= s) & (t < e)
        x[m] += (0.3 * np.sin(2 * np.pi * 280 * t[m]) *
                 (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t[m]))).astype(np.float32)
    p = tmp_path_factory.mktemp("audio") / "speech.wav"
    write_wav(str(p), x, sr)
    return str(p)


def test_transcribe_file_end_to_end(tiny_engine, speech_wav, tmp_path):
    res = tiny_engine.transcribe_file(
        speech_wav,
        language="en",
        output_formats=("txt", "json", "srt"),
        output_dir=str(tmp_path),
        beam_size=1,
        temperature=(0.0,),
        max_new_tokens=16,
    )
    assert res["success"]
    assert res["language"] == "en"
    assert res["duration"] == pytest.approx(20.0, abs=0.1)
    assert res["num_windows"] >= 1
    assert res["real_time_factor"] > 0
    # segments have the reference's field contract
    for s in res["segments"]:
        for k in ("start", "end", "text", "avg_logprob", "no_speech_prob",
                  "chunk_id", "worker_id"):
            assert k in s
        assert 0.0 <= s["start"] <= s["end"] <= 20.5
    # outputs written
    assert set(res["output_files"]) == {"txt", "json", "srt"}
    payload = json.loads(open(res["output_files"]["json"]).read())
    assert set(payload) == {"transcription", "metadata"}
    assert payload["metadata"]["total_segments"] == len(res["segments"])


def test_transcribe_no_vad_tiles_whole_file(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, language="en", output_formats=(), vad_filter=False,
        beam_size=1, temperature=(0.0,), max_new_tokens=8,
    )
    assert res["num_windows"] == 1  # 20s -> one 30s window
    assert res["success"]


def test_transcribe_beam_path(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, language="en", output_formats=(), beam_size=2,
        temperature=(0.0,), max_new_tokens=8,
    )
    assert res["success"]


def test_language_autodetect_runs(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, output_formats=(), beam_size=1, temperature=(0.0,),
        max_new_tokens=8,
    )
    assert res["language"] in ("en", "zh")  # 2-language tiny vocab
    assert 0.0 <= res["language_probability"] <= 1.0


def test_silence_yields_no_segments(tiny_engine, tmp_path):
    x = 0.001 * np.random.default_rng(1).standard_normal(16000 * 5).astype(np.float32)
    p = str(tmp_path / "silence.wav")
    write_wav(p, x, 16000)
    res = tiny_engine.transcribe_file(
        p, language="en", output_formats=(), beam_size=1, temperature=(0.0,),
        max_new_tokens=8,
    )
    assert res["num_windows"] == 0
    assert res["segments"] == []


def test_fixed_chunking_mode(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, language="en", output_formats=(), beam_size=1,
        temperature=(0.0,), max_new_tokens=8, chunking_mode="fixed",
        overlap_strategy="drop",
    )
    assert res["success"]
    assert res["num_windows"] == 1  # 20s file, 3-minute chunks -> 1 window
    # with a 30s window per chunk all segments carry chunk_id 0
    assert all(s["chunk_id"] == 0 for s in res["segments"])


def test_condition_on_previous_text_mode(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, language="en", output_formats=(), beam_size=1,
        temperature=(0.0,), max_new_tokens=8,
        condition_on_previous_text=True,
    )
    assert res["success"]
    for s in res["segments"]:
        assert s["start"] <= s["end"]


def test_translate_task_prompt(tiny_engine, speech_wav):
    res = tiny_engine.transcribe_file(
        speech_wav, language="zh", task="translate", output_formats=(),
        beam_size=1, temperature=(0.0,), max_new_tokens=8,
    )
    assert res["success"]


def test_legacy_engine_facade(tiny_engine, speech_wav, tmp_path, monkeypatch):
    from whisper_aries_tpu.pipeline.legacy import FixedUltraFastTranscriber

    monkeypatch.chdir(tmp_path)
    # first construction auto-writes the default config file
    legacy = FixedUltraFastTranscriber(
        str(tmp_path / "whisper_config.json"), _engine=tiny_engine
    )
    assert (tmp_path / "whisper_config.json").exists()
    assert legacy.config["chunk_duration"] == 240

    progress = []
    res = legacy.transcribe_ultra_fast(
        speech_wav, language="en", output_formats=(),
        progress_callback=progress.append,
    )
    assert res["success"]
    assert set(res["parallel_info"]) == {
        "workers_used", "chunks_processed", "parallel_efficiency",
        "chunks_per_minute",
    }
    assert res["performance"]["assessment"] in (
        "excellent", "great", "good", "below-realtime-target"
    )
    assert progress  # callback fired
