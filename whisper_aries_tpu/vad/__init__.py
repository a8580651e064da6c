from whisper_aries_tpu.vad.energy import get_speech_probs
from whisper_aries_tpu.vad.segments import VadOptions, collect_speech_segments
from whisper_aries_tpu.vad.planner import Window, plan_windows, plan_chunks

__all__ = [
    "get_speech_probs",
    "VadOptions",
    "collect_speech_segments",
    "Window",
    "plan_windows",
    "plan_chunks",
]
