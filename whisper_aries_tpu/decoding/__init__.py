from whisper_aries_tpu.decoding.tokenizer import (
    LANGUAGES,
    SpecialTokens,
    WhisperTokenizer,
    build_special_tokens,
)
from whisper_aries_tpu.decoding.generate import (
    DecodeSpecialIds,
    beam_search_decode,
    build_suppress_mask,
    detect_language_logits,
    greedy_decode,
)
from whisper_aries_tpu.decoding.segments_parse import (
    compression_ratio,
    parse_window_tokens,
    window_quality,
)

__all__ = [
    "LANGUAGES",
    "SpecialTokens",
    "WhisperTokenizer",
    "build_special_tokens",
    "DecodeSpecialIds",
    "beam_search_decode",
    "build_suppress_mask",
    "detect_language_logits",
    "greedy_decode",
    "compression_ratio",
    "parse_window_tokens",
    "window_quality",
]
