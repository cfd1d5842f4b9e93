"""Salted mega-key execution for ordered per-key scans.

``grouped_apply`` requires a key's FULL history inside one partition —
fine for conversations, fatal for a key whose stream exceeds a worker's
heap (SURVEY.md §7.4 hot-key note; the reference streams one long series
without materializing it, timeseries_batch_generator.py:289-295).

This module generalizes the ``salt_every_us`` pattern proven in
``state/encode.py`` to ANY ordered scan, as a classic two-pass parallel
prefix:

    pass 1  rows → (key, time-chunk) groups → one tiny SUMMARY row per
            chunk (e.g. the chunk's sum / last ts / tail values);
    bridge  per-key sequential fold of the summaries (chunks per key are
            few — summaries are tiny) → the CARRY-IN state each chunk
            needs from everything before it;
    pass 2  rows again → same (key, chunk) groups, now with each group's
            carry routed into its partition through the shuffle itself
            (union-tagged, never broadcast, never via the driver) →
            ``apply(chunk_rows, carry_in)`` emits the final output.

The salt is a pure function of ``ts`` (computable before any shuffle),
so no partition ever holds more than one time-chunk of a hot key.  The
input is read twice (the price of a streaming two-pass scan); nothing is
ever materialized.

Carries/summaries travel as JSON strings — op-defined dicts of scalars
or small lists; Python json round-trips float64 exactly.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .rollup import _stable_pkey


def _chunk_tag(t: pa.Table, key: str, ts_col: str, salt_every_us: int,
               num_partitions: int) -> pa.Table:
    """Append chunk_salt = floor(ts/salt) and _pkey = mix(hash(key), salt)
    — the exact salting used by state/encode.py (encode.py:78-92)."""
    import polars as pl

    arr = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
    h = pl.Series(arr).hash(seed=0).to_numpy()
    ts = t[ts_col]
    if pa.types.is_timestamp(ts.type):
        # normalize to µs first: a verbatim int64 cast of a ns-precision
        # column would mis-chunk by 1000× (salt_every_us is µs by contract)
        ts = pc.cast(ts, pa.timestamp("us"))
    ts_us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    salt = np.floor_divide(ts_us, salt_every_us)
    pk = (
        (h + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        % np.uint64(num_partitions)
    ).astype(np.int64)
    t = t.append_column("chunk_salt", pa.array(salt.astype(np.int64)))
    return t.append_column("_pkey", pa.array(pk))


def salted_scan(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    salt_every_us: int,
    summarize,
    step=None,
    apply,
    fold=None,
    order_by: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Run an ordered per-key scan with (key, time-chunk) salting.

    ``summarize(chunk_df) -> dict``: the chunk's boundary summary (rows
    arrive sorted by ``order_by``).
    ``step(carry_in: dict | None, summary: dict) -> dict``: fold one
    chunk's summary into the carry; ``None`` marks the key's first chunk.
    ``apply(chunk_df, carry_in: dict | None) -> DataFrame``: produce the
    chunk's output given the carry from all earlier chunks.

    ``fold`` (alternative to ``step``, for ops that need LOOKAHEAD or
    must emit output for chunks with no input rows — e.g. gap filling
    across empty time-chunks): ``fold(salts: list[int], summaries:
    list[dict]) -> dict[int, dict]`` sees every chunk summary of one key
    at once (sorted by salt) and returns carry dicts keyed by salt —
    INCLUDING salts absent from the input; pass 2 then calls
    ``apply(empty_df, carry)`` for those row-less chunks.  Summaries are
    tiny (one per chunk), so the whole-key fold stays microscopic even
    for a key with thousands of chunks.

    Partitioning assumption: one (key, time-chunk) group is complete
    within one partition — never a whole key.
    """
    if (step is None) == (fold is None):
        raise ValueError("provide exactly one of step= or fold=")
    order_by = order_by or [ts_col]
    sort_cols = [key, "chunk_salt"] + order_by

    def tag(t: pa.Table) -> pa.Table:
        return _chunk_tag(t, key, ts_col, salt_every_us, num_partitions)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # -- pass 1: per-chunk summaries (tiny rows) --------------------------
    def summarize_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "chunk_salt": pd.Series(dtype="int64"),
                                 "_summary": pd.Series(dtype="object")})
        df = df.sort_values(sort_cols, kind="mergesort")
        out_k, out_s, out_j = [], [], []
        for (k, s), g in df.groupby([key, "chunk_salt"], sort=False):
            out_k.append(k)
            out_s.append(s)
            out_j.append(json.dumps(summarize(g)))
        return pd.DataFrame({key: out_k, "chunk_salt": out_s, "_summary": out_j})

    summaries = tagged.groupby("_pkey").map_groups(
        summarize_partition, batch_format="pandas")

    # -- bridge: per-key sequential fold over chunk summaries -------------
    # summaries are one tiny row per (key, chunk): a key with thousands of
    # chunks still folds in microseconds, and THIS grouping (key-complete)
    # only ever holds summaries, never rows
    def fold_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_salt", kind="mergesort")
        if fold is not None:
            salts = [int(s) for s in g["chunk_salt"]]
            carry_by_salt = fold(salts, [json.loads(s) for s in g["_summary"]])
            return pd.DataFrame({
                key: np.repeat(g[key].iloc[0], len(carry_by_salt)),
                "chunk_salt": np.fromiter(carry_by_salt, np.int64,
                                          len(carry_by_salt)),
                "_carry": [json.dumps(c) for c in carry_by_salt.values()],
            })
        carry = None
        outs = []
        for s_json in g["_summary"]:
            outs.append(json.dumps(carry))
            carry = step(carry, json.loads(s_json))
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "chunk_salt": g["chunk_salt"].to_numpy(),
            "_carry": outs,
        })

    from .grouped import grouped_apply

    carries = grouped_apply(summaries, keys=[key], fn=fold_key,
                            num_partitions=num_partitions)

    # -- pass 2: rows + carries co-shuffled, apply per chunk --------------
    from .dedup import _as_arrow_schema

    data_schema = _as_arrow_schema(ds)
    union_schema = pa.schema(
        list(data_schema)
        + [pa.field("chunk_salt", pa.int64()), pa.field("_carry", pa.string()),
           pa.field("_kind", pa.int8()), pa.field("_pkey", pa.int64())]
    )

    def tag_data(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return union_schema.empty_table()
        t = _chunk_tag(t, key, ts_col, salt_every_us, num_partitions)
        t = t.append_column("_carry", pa.nulls(t.num_rows, pa.string()))
        t = t.append_column("_kind", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.select(union_schema.names)

    def tag_carry(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return union_schema.empty_table()
        cols = {}
        for f in data_schema:
            if f.name == key:
                cols[f.name] = t[key].cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        cols["chunk_salt"] = t["chunk_salt"]
        cols["_carry"] = t["_carry"]
        cols["_kind"] = pa.array(np.ones(t.num_rows, np.int8))
        out = pa.table(cols)
        # identical _pkey mix as the data rows: hash(key) + salt mix
        import polars as pl

        arr = out[key].combine_chunks()
        h = pl.Series(arr).hash(seed=0).to_numpy()
        salt = out["chunk_salt"].to_numpy()
        pk = ((h + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              % np.uint64(num_partitions)).astype(np.int64)
        return out.append_column("_pkey", pa.array(pk))

    unioned = ds.map_batches(tag_data, batch_format="pyarrow").union(
        carries.map_batches(tag_carry, batch_format="pyarrow")
    )

    def apply_partition(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0 or "_kind" not in t.column_names:
            return apply(pd.DataFrame(), None) if fold is None else pd.DataFrame()
        t = t.select(union_schema.names).cast(union_schema)
        kind = t["_kind"]
        data = t.filter(pc.equal(kind, 0)).drop_columns(["_carry", "_kind", "_pkey"])
        cdf = t.filter(pc.equal(kind, 1)).select([key, "chunk_salt", "_carry"]).to_pandas()
        carry_of = {(k, s): (json.loads(c) if c is not None else None)
                    for k, s, c in zip(cdf[key], cdf["chunk_salt"], cdf["_carry"])}
        df = data.to_pandas().sort_values(sort_cols, kind="mergesort")
        outs = []
        seen = set()
        for (k, s), g in df.groupby([key, "chunk_salt"], sort=False):
            g = g.drop(columns=["chunk_salt"])
            if fold is not None:
                seen.add((k, s))
                outs.append(apply(g, carry_of.get((k, s)), k, s))
            else:
                outs.append(apply(g, carry_of.get((k, s))))
        if fold is not None:
            # chunks the fold emitted a carry for but that have no input
            # rows (e.g. fully-empty time ranges a gap spans): apply gets
            # a 0-row frame with the data columns plus (key, salt)
            empty = df.head(0).drop(columns=["chunk_salt"])
            for (k, s), c in carry_of.items():
                if (k, s) not in seen and c is not None:
                    outs.append(apply(empty, c, k, s))
        if not outs:
            return apply(pd.DataFrame(), None) if fold is None else pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    return unioned.groupby("_pkey").map_groups(apply_partition, batch_format="pyarrow")
