"""Flagship pipeline: transcript → derived columns → tiered rollup.

The engine's primary contract (BASELINE.json north_star): conversation
transcripts grouped by ``conv_id``, rolled into 1m/1h/1d tiers of
per-window points — turn counts, token-length stats, tool-call rates —
via ``map_batches`` over zero-copy Arrow with partial aggregation before
the single shuffle.

Scale notes:
- ``text`` dominates bytes; it is consumed by the stateless derive stage
  (token_len) and *never shuffled* — only integer partials cross the
  exchange (SURVEY.md §7.4).
- hot conversations are pre-combined per batch by the rollup combiner, so
  skew never concentrates raw rows on one reducer (see stages/rollup.py).
"""

from __future__ import annotations

from ray.data import Dataset

from ..functions.derive import derive_transcript_columns
from ..functions.windows import TIER_ORDER
from ..sources.parquet import read_transcripts
from ..stages.rollup import Metric, RollupSpec, cascade, finalize, rollup_partial

TRANSCRIPT_SPEC = RollupSpec(
    keys=("conv_id",),
    ts_col="ts",
    metrics=(
        # narrow_minmax: a single turn's token count always fits int32
        # (a 2^31-token turn would be a multi-GB string row)
        Metric("token_len", ("sum", "min", "max", "mean"), narrow_minmax=True),
        Metric("is_tool_call", ("sum",), public=False, indicator=True),
    ),
    count_alias="turn_count",
    rates={"tool_call_rate": "is_tool_call"},
)


def transcript_partials(path: str, tier: str = "1m") -> Dataset:
    ds = read_transcripts(path, columns=["conv_id", "ts", "text", "tool"])
    ds = ds.map_batches(
        derive_transcript_columns, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.select_columns(["conv_id", "ts", "token_len", "is_tool_call"])
    return rollup_partial(ds, TRANSCRIPT_SPEC, tier)


def transcript_tiers(
    path: str, tiers: tuple[str, ...] = TIER_ORDER, *, materialize_partials: bool = True
) -> dict[str, Dataset]:
    """1m/1h/1d tier tables for a transcripts parquet at ``path``.

    Partials are materialized between tiers (small: one row per
    (conv, window)); this keeps the cascade from re-reading + re-deriving
    the raw input once per tier.
    """
    out: dict[str, Dataset] = {}
    partial = transcript_partials(path, tiers[0])
    if materialize_partials:
        partial = partial.materialize()
    out[tiers[0]] = finalize(partial, TRANSCRIPT_SPEC)
    for tier in tiers[1:]:
        partial = cascade(partial, TRANSCRIPT_SPEC, tier)
        if materialize_partials:
            partial = partial.materialize()
        out[tier] = finalize(partial, TRANSCRIPT_SPEC)
    return out
