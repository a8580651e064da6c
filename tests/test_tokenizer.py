"""Tokenizer tests: BPE correctness on a synthetic vocab, Whisper special-id
layout pinned against the publicly known id tables, and roundtrips."""

import json

import pytest

from whisper_aries_tpu.decoding.tokenizer import (
    LANGUAGES,
    WhisperTokenizer,
    build_special_tokens,
    _bytes_to_unicode,
)


def test_special_layout_v2():
    """large-v2-era multilingual: 50257 base tokens + 99 languages."""
    sp = build_special_tokens(50257, 99)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.language_tokens["en"] == 50259
    assert sp.language_tokens["su"] == 50357
    assert sp.translate == 50358
    assert sp.transcribe == 50359
    assert sp.sot_lm == 50360
    assert sp.sot_prev == 50361
    assert sp.no_speech == 50362
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.n_vocab == 51865


def test_special_layout_v3():
    """large-v3: adds <|yue|> -> everything after languages shifts by 1."""
    sp = build_special_tokens(50257, 100)
    assert sp.sot == 50258
    assert sp.language_tokens["yue"] == 50358
    assert sp.translate == 50359
    assert sp.transcribe == 50360
    assert sp.no_speech == 50363
    assert sp.no_timestamps == 50364
    assert sp.timestamp_begin == 50365
    assert sp.n_vocab == 51866


def test_timestamp_token_math():
    sp = build_special_tokens(50257, 100)
    assert sp.timestamp_to_seconds(sp.timestamp_begin) == 0.0
    assert sp.timestamp_to_seconds(sp.seconds_to_timestamp(7.32)) == pytest.approx(7.32)
    assert sp.seconds_to_timestamp(30.0) == sp.timestamp_begin + 1500
    assert sp.seconds_to_timestamp(30.0) == sp.n_vocab - 1


def test_sot_sequence():
    sp = build_special_tokens(50257, 100)
    assert sp.sot_sequence() == [sp.sot]
    assert sp.sot_sequence("en", "transcribe") == [
        sp.sot, sp.language_tokens["en"], sp.transcribe
    ]
    assert sp.sot_sequence("ar", "translate", no_timestamps=True) == [
        sp.sot, sp.language_tokens["ar"], sp.translate, sp.no_timestamps
    ]
    with pytest.raises(ValueError):
        sp.sot_sequence("xx")


def test_bytes_to_unicode_reversible():
    m = _bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


@pytest.fixture
def tiny_tokenizer(tmp_path):
    """Build a small but real byte-level BPE over ASCII."""
    b2u = _bytes_to_unicode()
    sp = b2u[ord(" ")]  # space stand-in ('Ġ')
    base = [b2u[i] for i in range(256)]
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("o", "w"), ("hell", "o"),
        (sp, "w"), (f"{sp}w", "o"), (f"{sp}wo", "r"), (f"{sp}wor", "ld"),
        ("l", "d"),
    ]
    vocab_list = base + ["".join(m) for m in merges]
    vocab = {tok: i for i, tok in enumerate(vocab_list)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges),
        encoding="utf-8",
    )
    return WhisperTokenizer.from_pretrained(str(tmp_path))


def test_bpe_merges_applied(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok.encode("hello world")
    # "hello" -> single merged token; " world" -> merged token + "ld" merge
    toks = [tok.decoder_map[i] for i in ids]
    assert toks[0] == "hello"
    assert tok.decode(ids) == "hello world"


def test_roundtrip_arbitrary_text(tiny_tokenizer):
    for text in ("hello hello world", "abc123 !?", "mixed hellold"):
        assert tiny_tokenizer.decode(tiny_tokenizer.encode(text)) == text


def test_roundtrip_unicode(tiny_tokenizer):
    # Arabic text roundtrips through byte fallback even with an ASCII vocab.
    text = "مرحبا hello"
    assert tiny_tokenizer.decode(tiny_tokenizer.encode(text)) == text


def test_decode_skips_and_renders_specials(tiny_tokenizer):
    tok = tiny_tokenizer
    sp = tok.specials
    ids = [sp.sot, sp.language_tokens["en"], sp.transcribe,
           sp.timestamp_begin] + tok.encode("hello") + [sp.eot]
    assert tok.decode(ids) == "hello"
    rendered = tok.decode(ids, skip_special=False)
    assert "<|startoftranscript|>" in rendered
    assert "<|en|>" in rendered
    assert "<|transcribe|>" in rendered
    assert "<|0.00|>" in rendered
    assert "<|endoftext|>" in rendered


def test_languages_table():
    assert len(LANGUAGES) == 100
    assert LANGUAGES[0] == "en"
    assert LANGUAGES[13] == "ar"
    assert LANGUAGES[-1] == "yue"


def test_special_layout_english_only():
    """.en models reuse GPT-2's <|endoftext|> (50256): everything shifts."""
    sp = build_special_tokens(50257, 99, english=True)
    assert sp.eot == 50256
    assert sp.sot == 50257
    assert sp.language_tokens["en"] == 50258
    assert sp.translate == 50357
    assert sp.transcribe == 50358
    assert sp.no_speech == 50361
    assert sp.no_timestamps == 50362
    assert sp.timestamp_begin == 50363
    assert sp.n_vocab == 51864


def test_from_pretrained_english_only_layout(tmp_path):
    """A .en checkpoint's vocab.json includes GPT-2's <|endoftext|>; stripping
    it must not shift the special table down by one (round-2 ADVICE fix)."""
    vocab = {f"tok{i}": i for i in range(50256)}
    vocab["<|endoftext|>"] = 50256
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (tmp_path / "merges.txt").write_text("#version: 0.2\n", encoding="utf-8")
    (tmp_path / "config.json").write_text(
        json.dumps({"vocab_size": 51864}), encoding="utf-8"
    )
    tok = WhisperTokenizer.from_pretrained(str(tmp_path))
    sp = tok.specials
    assert sp.eot == 50256
    assert sp.sot == 50257
    assert sp.transcribe == 50358
    assert sp.timestamp_begin == 50363
    assert sp.n_vocab == 51864
