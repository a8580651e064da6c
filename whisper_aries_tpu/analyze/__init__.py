from whisper_aries_tpu.analyze.conversation import ConversationAnalyzer
from whisper_aries_tpu.analyze.meeting import (
    analyze_meeting,
    build_transcript_text,
    speaker_stats,
)

__all__ = [
    "ConversationAnalyzer",
    "analyze_meeting",
    "build_transcript_text",
    "speaker_stats",
]
