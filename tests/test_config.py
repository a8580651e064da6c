"""Config precedence tests: defaults < env < file < overrides."""

import json

from whisper_aries_tpu.config import AriesConfig, load_config, print_config


def test_defaults():
    cfg = load_config(env={})
    assert cfg.model.name == "large-v3"
    assert cfg.decode.beam_size == 1
    assert cfg.pipeline.confidence_threshold == 0.7
    assert cfg.chunking.chunk_length_minutes == 3.0
    assert cfg.chunking.overlap_seconds == 5.0
    assert cfg.vad.min_silence_duration_ms == 500
    assert cfg.vad.speech_pad_ms == 200


def test_env_layer():
    cfg = load_config(env={
        "WHISPER_MODEL_PATH": "small",
        "DEFAULT_CONFIDENCE_THRESHOLD": "0.9",
        "DEFAULT_OUTPUT_FORMATS": "json,srt",
        "ARIES_BEAM_SIZE": "5",
        "HF_TOKEN": "tok",
    })
    assert cfg.model.name == "small"
    assert cfg.pipeline.confidence_threshold == 0.9
    assert cfg.pipeline.output_formats == ("json", "srt")
    assert cfg.decode.beam_size == 5
    assert cfg.hf_token == "tok"


def test_file_overrides_env(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "model": {"name": "medium", "compute_type": "bf16"},
        "decode": {"beam_size": 3},
        "vad": {"enabled": False},
    }))
    cfg = load_config(config_file=str(p), env={"WHISPER_MODEL_PATH": "small"})
    assert cfg.model.name == "medium"
    assert cfg.model.compute_type == "bf16"
    assert cfg.decode.beam_size == 3
    assert cfg.vad.enabled is False


def test_explicit_overrides_win(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"decode": {"beam_size": 3}}))
    cfg = load_config(
        config_file=str(p),
        env={"ARIES_BEAM_SIZE": "5"},
        overrides={"decode.beam_size": 7, "model": {"name": "tiny"}},
    )
    assert cfg.decode.beam_size == 7
    assert cfg.model.name == "tiny"


def test_print_config_masks_token(capsys):
    cfg = AriesConfig(hf_token="secret")
    text = print_config(cfg)
    assert "secret" not in text
    assert "[decode]" in text
