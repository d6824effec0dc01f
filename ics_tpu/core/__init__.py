from ics_tpu.core.config import settings  # noqa: F401
