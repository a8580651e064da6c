"""Full-pipeline tests: run_pipeline contract, output formats, stats,
LLM-degradation, against the tiny injected engine + classical diarizer."""

import json

import numpy as np
import pytest

from whisper_aries_tpu.analyze.meeting import (
    analyze_meeting,
    build_transcript_text,
    speaker_stats,
)
from whisper_aries_tpu.pipeline.run import run_pipeline


@pytest.fixture(scope="module")
def tiny_engine():
    import jax.numpy as jnp

    from tests.test_engine import TinyTokenizer
    from whisper_aries_tpu.models import whisper as W
    from whisper_aries_tpu.pipeline.engine import AriesTranscriber

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
def conversation_wav(tmp_path_factory):
    from tests.test_diarize import synth_speaker
    from whisper_aries_tpu.audio.decode import write_wav

    a = synth_speaker(110, 500, [(0.5, 4.0)], 10.0, seed=1)
    b = synth_speaker(280, 2400, [(5.0, 9.0)], 10.0, seed=2)
    p = tmp_path_factory.mktemp("conv") / "meeting.wav"
    write_wav(str(p), a + b, 16000)
    return str(p)


@pytest.mark.slow
def test_run_pipeline_contract(tiny_engine, conversation_wav, tmp_path):
    res = run_pipeline(
        conversation_wav,
        output_dir=str(tmp_path),
        formats=["html", "json", "srt"],
        confidence_threshold=0.7,
        language="en",
        run_llm_analysis=False,
        transcriber=tiny_engine,
    )
    assert res["error"] is None
    assert res["success"], res
    assert set(res["outputs"]) == {"html", "json", "srt"}
    # metadata matches the golden contract
    md = res["metadata"]
    assert set(md) == {"audio_file", "pipeline_version", "confidence_threshold",
                       "language", "total_segments"}
    # aligned segments have exactly the golden key set
    for s in res["aligned_segments"]:
        assert set(s) == {"text", "start", "end", "speaker", "confidence"}
    # json output round-trips
    data = json.loads(open(res["outputs"]["json"], encoding="utf-8").read())
    assert set(data) == {"segments", "metadata"}
    assert data["metadata"]["total_segments"] == len(data["segments"])
    # stats block
    st = res["stats"]
    assert st["num_segments"] == len(res["aligned_segments"])
    assert st["total_duration"] >= 0
    assert "speaker_durations" in st


@pytest.mark.slow
def test_run_pipeline_llm_failure_nonfatal(tiny_engine, conversation_wav,
                                           tmp_path, monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    res = run_pipeline(
        conversation_wav,
        output_dir=str(tmp_path),
        formats=["json"],
        language="en",
        run_llm_analysis=True,  # no API key -> error recorded, still success
        transcriber=tiny_engine,
    )
    assert res["success"]
    assert "llm_analysis_error" in res


def test_run_pipeline_forwards_chunk_size(conversation_wav, tmp_path):
    """chunk_size must reach the engine (round-4 review: it was a silent
    no-op; reference contract conversation_transcriber.py:24-50)."""
    seen = {}

    class FakeTranscriber:
        def transcribe_file(self, audio_path, **kw):
            seen.update(kw)
            return {"success": True, "segments": [], "language": "en",
                    "real_time_factor": 1.0}

    res = run_pipeline(
        conversation_wav,
        output_dir=str(tmp_path),
        formats=["json"],
        chunk_size=30,
        run_llm_analysis=False,
        transcriber=FakeTranscriber(),
        diarizer=lambda *a, **k: [],
    )
    assert res["success"]
    assert seen["chunk_size"] == 30


def test_run_pipeline_missing_file(tiny_engine, tmp_path):
    res = run_pipeline(
        str(tmp_path / "nope.wav"),
        output_dir=str(tmp_path),
        formats=["json"],
        transcriber=tiny_engine,
        run_llm_analysis=False,
    )
    assert not res["success"]
    assert res["error"]


# ---------------------------------------------------------------------------
# Meeting analyzer
# ---------------------------------------------------------------------------

SEGS = [
    {"text": "hello", "start": 0.0, "end": 4.0, "speaker": "SPEAKER_00",
     "confidence": 1.0},
    {"text": "hi there", "start": 4.0, "end": 6.0, "speaker": "SPEAKER_01",
     "confidence": 0.9},
]


def test_build_transcript_text():
    text = build_transcript_text(SEGS)
    assert text.splitlines()[0] == "[SPEAKER_00] 0.00-4.00: hello"
    assert "[SPEAKER_01] 4.00-6.00: hi there" in text


def test_speaker_stats():
    st = speaker_stats(SEGS)
    assert st["SPEAKER_00"]["seconds"] == pytest.approx(4.0)
    assert st["SPEAKER_00"]["percent"] == pytest.approx(66.67, abs=0.1)
    assert st["SPEAKER_01"]["percent"] == pytest.approx(33.33, abs=0.1)


def test_analyze_meeting_with_injected_llm(tmp_path):
    p = tmp_path / "conv.json"
    p.write_text(json.dumps({"segments": SEGS, "metadata": {}}),
                 encoding="utf-8")
    captured = {}

    def fake_llm(prompt, cfg=None):
        captured["prompt"] = prompt
        return "SUMMARY: people said hello."

    outs = analyze_meeting(str(p), llm=fake_llm)
    assert "[SPEAKER_00] 0.00-4.00: hello" in captured["prompt"]
    txt = open(outs["txt"], encoding="utf-8").read()
    assert "SUMMARY: people said hello." in txt
    assert "SPEAKER_00: 4.0s (66.7%)" in txt
    html = open(outs["html"], encoding="utf-8").read()
    assert "<h2>Meeting Summary</h2>" in html
    assert outs["txt"].endswith(".meeting_summary.txt")


def test_analyze_meeting_no_key_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    p = tmp_path / "conv.json"
    p.write_text(json.dumps({"segments": SEGS}), encoding="utf-8")
    with pytest.raises(Exception):
        analyze_meeting(str(p))


def test_golden_meeting_recording_full_path(golden_dir):
    """The reference's checked-in 342-segment 4-speaker meeting: speaker
    stats, transcript building, and re-alignment at realistic scale."""
    import glob

    from whisper_aries_tpu.utils.segments import align_segments

    candidates = [
        p for p in golden_dir.rglob("*.json")
        if "meeting_summary" not in p.name
    ]
    big = max(
        candidates,
        key=lambda p: len(json.loads(p.read_text(encoding="utf-8")).get("segments", [])),
    )
    data = json.loads(big.read_text(encoding="utf-8"))
    segments = data["segments"]
    assert len(segments) >= 300  # the meeting-recording job

    st = speaker_stats(segments)
    assert sum(v["seconds"] for v in st.values()) > 0
    assert abs(sum(v["percent"] for v in st.values()) - 100) < 1e-6
    text = build_transcript_text(segments)
    assert len(text.splitlines()) == len(segments)

    # re-align the transcript against its own speaker turns: every segment
    # that had a speaker must keep it at threshold 0 (self-consistency)
    diar = [
        {"start": s["start"], "end": s["end"], "speaker": s["speaker"]}
        for s in segments if s.get("speaker")
    ]
    aligned = align_segments(segments, diar, confidence_threshold=0.0)
    for orig, new in zip(segments, aligned):
        if orig.get("speaker") and orig["end"] > orig["start"]:
            assert new["speaker"] is not None
