"""WER metric tests."""

import pytest

from whisper_aries_tpu.eval.wer import normalize_text, wer, word_error_details


def test_normalize_basic():
    assert normalize_text("Hello, World!  ") == "hello world"
    assert normalize_text("It's fine.") == "it's fine"


def test_normalize_arabic():
    assert normalize_text("مَرْحَبًا", "ar") == normalize_text("مرحبا", "ar")
    assert normalize_text("أحمد", "ar") == normalize_text("احمد", "ar")


def test_wer_identity():
    assert wer("the stale smell of old beer", "The stale smell of old beer.") == 0.0


def test_wer_substitution():
    d = word_error_details("a b c d", "a x c d")
    assert d["substitutions"] == 1 and d["deletions"] == 0 and d["insertions"] == 0
    assert d["wer"] == pytest.approx(0.25)


def test_wer_deletion_insertion():
    d = word_error_details("a b c d", "a c d e")
    assert d["wer"] == pytest.approx(0.5)  # 1 del + 1 ins over 4
    assert d["deletions"] == 1 and d["insertions"] == 1


def test_wer_empty_cases():
    assert wer("", "") == 0.0
    assert wer("", "something") == 1.0
    assert wer("a b", "") == pytest.approx(1.0)


def test_wer_known_value():
    ref = "the quick brown fox jumps over the lazy dog"
    hyp = "the quick brown fox jumped over a lazy dog today"
    d = word_error_details(ref, hyp)
    # jumps->jumped (sub), the->a (sub), +today (ins) = 3 errors / 9 words
    assert d["wer"] == pytest.approx(3 / 9)
