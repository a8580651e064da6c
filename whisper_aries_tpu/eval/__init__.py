from whisper_aries_tpu.eval.wer import (
    normalize_text,
    wer,
    word_error_details,
)

__all__ = ["normalize_text", "wer", "word_error_details"]
