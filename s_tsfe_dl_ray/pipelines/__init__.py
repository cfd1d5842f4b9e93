from .events_rollup import EVENTS_SPEC, events_tier, events_tiers  # noqa: F401
from .transcript_rollup import TRANSCRIPT_SPEC, transcript_tiers  # noqa: F401
