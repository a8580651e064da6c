"""CLI smoke tests: argument parsing and the diarizer CLI end to end
(reference output formats verified)."""

import json
from pathlib import Path

import numpy as np
import pytest

from whisper_aries_tpu.cli import batch_transcribe as bt
from whisper_aries_tpu.cli import conversation as conv
from whisper_aries_tpu.cli import diarize as dz
from whisper_aries_tpu.cli import transcribe as tr
from whisper_aries_tpu.cli import verify_setup as vs


def test_transcribe_parser_defaults():
    args = tr.build_parser().parse_args(["x.wav"])
    assert args.model == "large-v3"
    assert args.beam_size == 1
    assert args.formats == "txt"
    args2 = tr.build_parser().parse_args(
        ["x.wav", "--model", "small", "--beam-size", "5", "--no-vad",
         "--word-timestamps"]
    )
    assert args2.model == "small" and args2.beam_size == 5
    assert args2.no_vad and args2.word_timestamps


def test_batch_parser():
    args = bt.build_parser().parse_args(["dir", "--overwrite",
                                         "--manifest", "m.json"])
    assert args.directory == "dir" and args.overwrite


def test_conversation_parser_matches_reference_flags():
    # same flag names as conversation_transcriber.py:188-195
    args = conv.build_parser().parse_args(
        ["a.wav", "--output-dir", "o", "--formats", "html,json,srt",
         "--confidence-threshold", "0.8", "--chunk-size", "180",
         "--language", "ar"]
    )
    assert args.confidence_threshold == 0.8
    assert args.chunk_size == 180
    assert args.language == "ar"


def test_batch_cli_requires_directory(tmp_path, capsys):
    rc = bt.main([str(tmp_path / "missing")])
    assert rc == 1


@pytest.mark.slow
def test_transcribe_cli_missing_file_fails(tmp_path):
    # engine raises AudioError -> CLI must not crash with traceback
    with pytest.raises(Exception):
        tr.main([str(tmp_path / "missing.wav"), "--model", "tiny",
                 "--allow-random"])


def test_diarizer_cli_end_to_end(tmp_path, capsys):
    from tests.test_diarize import synth_speaker
    from whisper_aries_tpu.audio.decode import write_wav

    a = synth_speaker(110, 500, [(0.5, 3.0)], 8.0, seed=1)
    b = synth_speaker(280, 2400, [(4.0, 7.0)], 8.0, seed=2)
    p = tmp_path / "two.wav"
    write_wav(str(p), a + b, 16000)

    rc = dz.main([str(p), "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    out = tmp_path / "out"
    csv_f = out / "two_diarization.csv"
    json_f = out / "two_diarization.json"
    txt_f = out / "two_diarization.txt"
    assert csv_f.exists() and json_f.exists() and txt_f.exists()
    # reference formats (speaker_diarizer.py:183-206)
    lines = csv_f.read_text().strip().splitlines()
    assert lines[0] == "start,end,speaker"
    data = json.loads(json_f.read_text())
    assert all(set(d) == {"start", "end", "speaker"} for d in data)
    first_txt = txt_f.read_text().splitlines()[0]
    assert "s - " in first_txt and ": SPEAKER_" in first_txt


def test_verify_setup_runs(capsys):
    rc = vs.main(["--model", "definitely-not-installed"])
    out = capsys.readouterr().out
    assert "jax" in out
    assert "checkpoint" in out
    assert rc in (0, 1)


def test_diarizer_output_formats_match_reference_goldens(tmp_path):
    """Byte-level format parity with the reference's checked-in diarization
    artifacts (speaker_diarizer.py:183-206 writers)."""
    import csv as csvmod
    from pathlib import Path as P

    turns = [
        {"start": 12.39, "end": 14.35, "speaker": "SPEAKER_01"},
        {"start": 14.98, "end": 16.83, "speaker": "SPEAKER_01"},
        {"start": 16.83, "end": 16.87, "speaker": "SPEAKER_00"},
    ]
    outs = dz.write_outputs(turns, tmp_path / "Small Talk", ["csv", "json", "txt"])
    csv_lines = open(outs["csv"]).read().splitlines()
    assert csv_lines[0] == "start,end,speaker"
    assert csv_lines[1] == "12.39,14.35,SPEAKER_01"
    assert csv_lines[3] == "16.83,16.87,SPEAKER_00"
    txt_lines = open(outs["txt"]).read().splitlines()
    assert txt_lines[0] == "12.39s - 14.35s: SPEAKER_01"
    data = json.loads(open(outs["json"]).read())
    assert data[0] == {"start": 12.39, "end": 14.35, "speaker": "SPEAKER_01"}

    # compare against the actual reference goldens line-for-line structure
    ref = P("/root/reference/Small Talk  Everyday English_diarization.csv")
    if ref.exists():
        golden_header = ref.read_text().splitlines()[0]
        assert csv_lines[0] == golden_header
