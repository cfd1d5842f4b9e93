"""Shared helpers for the driver-contract query modules (split out of
``__ray_entry__.py``): 6-decimal DuckDB-exact rounding, the pinned
synthesized transcript corpus, and the gap-fill flagship used by
``entry()``."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LANGS = {  # keep in sync with s_tsfe_dl_ray.stages.text._LANG_MARKERS
    "en": "the|and|of|is|was|with|that|this",
    "de": "der|die|das|und|ist|nicht|mit|ein",
    "fr": "le|la|les|et|est|une|pas|pour",
    "es": "el|los|las|es|una|por|que|para",
}
_STOP = "the|a|an|and|of|to|in|is|it|that"


def _dd_round6(x: "np.ndarray") -> "np.ndarray":
    """Bit-exact emulation of DuckDB ``round(x, 6)`` on DOUBLE:
    ``std::round(x * 1e6) / 1e6``, returning the input on inf/nan
    results.  std::round is half-away-from-zero computed EXACTLY — NOT
    ``floor(x*1e6 + 0.5)`` (that bumps values whose fraction is the
    double just below .5) and NOT ``pc.round(..., half_towards_infinity)``
    (1-ulp disagreements, e.g. 50.846000000000004 stays put under
    pyarrow but re-quantizes to 50.846 under DuckDB).  The fraction
    test is exact because ``y - floor(y)`` / ``ceil(y) - y`` are exact
    float ops (Sterbenz).  Verified bit-identical to DuckDB on 1.1M
    adversarial doubles incl. ±inf, NaN, 1e308, exact-.5 fractions at
    every magnitude."""
    y = x * 1e6
    f = np.floor(y)
    c = np.ceil(y)
    with np.errstate(invalid="ignore"):
        pos = f + (y - f >= 0.5)
        neg = c - (c - y >= 0.5)
        r = np.where(y >= 0, pos, neg) / 1e6
    return np.where(np.isfinite(r), r, x)


def _round_floats(ds):
    """Round all float64 columns to 6 decimals, matching DuckDB round
    bit-for-bit (see :func:`_dd_round6`); nulls stay nulls."""
    from ray.data import Dataset

    def rb(t: pa.Table) -> pa.Table:
        for i, f in enumerate(t.schema):
            # Ray's pandas→arrow block conversion types an ALL-NaN float
            # column as arrow `null`; restore it to float64 so degenerate
            # blocks keep a stable schema (fuzz shape3 regression)
            if pa.types.is_floating(f.type) or pa.types.is_null(f.type):
                col = pc.cast(t[f.name], pa.float64()).combine_chunks()
                nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
                vals = col.to_numpy(zero_copy_only=False)
                rounded = _dd_round6(vals)
                t = t.set_column(
                    i, f.name,
                    pa.array(rounded, pa.float64(),
                             mask=nulls if nulls.any() else None),
                )
        return t

    if isinstance(ds, Dataset):
        return ds.map_batches(rb, batch_format="pyarrow")
    if isinstance(ds, pd.DataFrame):
        return rb(pa.Table.from_pandas(ds, preserve_index=False))
    return rb(ds)


def _transcripts_for(sf_dir: str) -> str:
    """Deterministic synthesized transcript corpus for the transcript
    queries — PINNED to the driver's correctness scale (sf=0.01 → 60k
    turns) regardless of ``sf_dir``: ``oracle_sql()`` strings must
    reference one concrete parquet path, so query and oracle always read
    the SAME corpus.  Throughput scaling is bench.py's job (20M turns)."""
    from s_tsfe_dl_ray.synth import transcripts_parquet

    return transcripts_parquet(n_turns=60_000, seed=42)


def _events_gapfill(sf_dir: str, mode: str):
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    return gapfill(
        events_tier(sf_dir, "1h"),
        keys=["user_id"], tier="1h",
        count_cols=["n_events"], sum_cols=["value_sum"],
        null_cols=["value_min", "value_max"], carry_cols=["value_mean"],
        mode=mode,
    )



