"""Renderer format-parity tests, including byte checks against the
reference's golden artifacts in /root/reference/api_outputs."""

import json

import pytest

from whisper_aries_tpu.render import (
    render_html,
    render_json,
    render_srt,
    render_txt,
    srt_timestamp,
)


SEGS = [
    {"text": "Hello.", "start": 0.0, "end": 1.5, "speaker": "SPEAKER_00", "confidence": 1.0},
    {"text": "How are you?", "start": 1.6, "end": 3.0, "speaker": "SPEAKER_01", "confidence": 1.0},
]


def test_srt_timestamp_truncates_ms():
    assert srt_timestamp(3.589375) == "00:00:03,589"
    assert srt_timestamp(0.91) == "00:00:00,910"
    assert srt_timestamp(3671.0019) == "01:01:11,001"
    assert srt_timestamp(0.0) == "00:00:00,000"


def test_render_srt_format():
    body = render_srt(SEGS)
    lines = body.split("\n")
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:01,500"
    assert lines[2] == "[SPEAKER_00] Hello."
    assert lines[3] == ""
    assert lines[4] == "2"


def test_render_srt_no_speaker():
    body = render_srt([{"text": "x", "start": 0, "end": 1}], include_speaker=False)
    assert body.split("\n")[2] == "x"
    # explicit null speaker renders as the literal "None" (matches goldens);
    # a missing key falls back to "Unknown".
    body2 = render_srt([{"text": "x", "start": 0, "end": 1, "speaker": None}])
    assert body2.split("\n")[2] == "[None] x"
    body3 = render_srt([{"text": "x", "start": 0, "end": 1}])
    assert body3.split("\n")[2] == "[Unknown] x"


def test_render_json_contract(tmp_path):
    path = str(tmp_path / "o.json")
    render_json(SEGS, path, metadata={"language": "en"})
    d = json.loads(open(path, encoding="utf-8").read())
    assert set(d) == {"segments", "metadata"}
    assert d["segments"][0] == SEGS[0]
    assert d["metadata"]["language"] == "en"


def test_render_html_contains_palette_and_rtl():
    segs = SEGS + [
        {"text": "مرحبا", "start": 3.1, "end": 4.0, "speaker": "SPEAKER_00",
         "confidence": 0.9, "lang": "ar"}
    ]
    html = render_html(segs, metadata={"x": 1})
    assert "#4F8EF7" in html and "#F78E4F" in html
    assert "dir='rtl'" in html
    assert "<pre>" in html
    assert "[0.00-1.50s, conf=1.00]" in html


def test_render_txt():
    assert render_txt(SEGS) == "Hello.\nHow are you?\n"
    assert render_txt(SEGS, include_speaker=True).startswith("[SPEAKER_00] Hello.")


def test_srt_matches_reference_golden(golden_dir):
    """Re-render the golden JSON segments and compare byte-for-byte with the
    golden SRT (both were produced by the reference pipeline)."""
    checked = 0
    for job in golden_dir.iterdir():
        jsons = list(job.glob("*.json"))
        srts = list(job.glob("*.srt"))
        if not jsons or not srts:
            continue
        data = json.loads(jsons[0].read_text(encoding="utf-8"))
        golden = srts[0].read_text(encoding="utf-8")
        ours = render_srt(data["segments"])
        # The golden JSON rounds start/end to 2dp while the SRT was written
        # from full precision, so timestamps may differ in the final digit;
        # compare structure + text payload lines exactly and timestamps to
        # 10ms.
        glines, olines = golden.split("\n"), ours.split("\n")
        assert len(glines) == len(olines)
        for gl, ol in zip(glines, olines):
            if "-->" in gl:
                def parse(ts):
                    h, m, rest = ts.split(":")
                    s, ms = rest.split(",")
                    return int(h) * 3600 + int(m) * 60 + int(s) + int(ms) / 1000
                g0, g1 = [parse(t.strip()) for t in gl.split("-->")]
                o0, o1 = [parse(t.strip()) for t in ol.split("-->")]
                assert abs(g0 - o0) <= 0.011 and abs(g1 - o1) <= 0.011
            else:
                assert gl == ol
        checked += 1
    assert checked >= 3


def test_html_matches_reference_goldens_byte_identical(golden_dir):
    """Re-render every golden job's JSON through render_html and require
    byte-identical output to the reference's checked-in HTML."""
    checked = 0
    for job in golden_dir.iterdir():
        if not job.is_dir():
            continue
        jsons = list(job.glob("*.json"))
        htmls = list(job.glob("*.html"))
        if not jsons or not htmls:
            continue
        data = json.loads(jsons[0].read_text(encoding="utf-8"))
        got = render_html(data["segments"], metadata=data["metadata"])
        assert got == htmls[0].read_text(encoding="utf-8"), job.name
        checked += 1
    assert checked >= 3
