from whisper_aries_tpu.serve.jobstore import JobStatus, JobStore
from whisper_aries_tpu.serve.server import create_app

__all__ = ["JobStatus", "JobStore", "create_app"]
