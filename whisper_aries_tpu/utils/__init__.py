from whisper_aries_tpu.utils.segments import (
    align_segments,
    segment_overlap,
    remove_overlaps_drop,
    merge_overlapping_segments,
)
from whisper_aries_tpu.utils.media import extract_audio_if_needed
from whisper_aries_tpu.utils.memory import get_memory_usage

__all__ = [
    "align_segments",
    "segment_overlap",
    "remove_overlaps_drop",
    "merge_overlapping_segments",
    "extract_audio_if_needed",
    "get_memory_usage",
]
