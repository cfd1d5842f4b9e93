from .windows import TIER_US, window_start_us, window_to_timestamp  # noqa: F401
from .derive import derive_transcript_columns  # noqa: F401
