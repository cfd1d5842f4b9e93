"""Partitioned hash join for two large tables.

The reference has no relational joins (SURVEY.md §2.4) — this is an
engine addition for the general two-large-sides case the broadcast
pattern can't serve.  Portable implementation per the Ray guide: tag both
sides with ``_pkey = stable_hash(key) % P``, co-locate with ONE shuffle of
the tagged union, and run a vectorized pandas merge per partition.

Skew note: a hot join key concentrates its partition; the mitigation is
the usual salt-and-replicate (split the hot key's left rows across salts,
replicate the right side's rows per salt).  Not needed for the test
corpora; at 100 TB pass a larger ``num_partitions`` and salt upstream.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_partitions: int = 64,
) -> Dataset:
    """Join two Datasets on equality of ``left_on``/``right_on``.

    ``how``: inner | left.  Column collisions take pandas' default
    ``_x``/``_y`` suffixes — project/rename upstream for exact schemas.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")

    def _pa_schema(ds: Dataset) -> pa.Schema:
        s = ds.schema().base_schema
        if isinstance(s, pa.Schema):
            return s
        # pandas-block dataset (from_pandas / map_groups output): infer the
        # Arrow schema from a one-row sample — numpy object dtype is
        # ambiguous (str vs bytes) without looking at a value
        sample = ds.limit(1).to_pandas()
        return pa.Table.from_pandas(sample, preserve_index=False).schema

    left_schema = _pa_schema(left)
    right_schema = _pa_schema(right)
    left_cols = [f.name for f in left_schema]
    right_cols = [f.name for f in right_schema]
    # Dataset.union needs one schema: union of both column sets, each side
    # null-padded for the other's columns (types must agree on shared names)
    all_fields: dict[str, pa.DataType] = {}
    for f in list(left_schema) + list(right_schema):
        if f.name in all_fields and all_fields[f.name] != f.type:
            raise ValueError(
                f"column {f.name!r} has conflicting types across sides: "
                f"{all_fields[f.name]} vs {f.type}"
            )
        all_fields.setdefault(f.name, f.type)
    ordered = list(all_fields)

    def tag(col: str, side: str, own: set[str]):
        def fn(t: pa.Table) -> pa.Table:
            for name in ordered:
                if name not in own:
                    t = t.append_column(name, pa.nulls(t.num_rows, all_fields[name]))
            t = t.select(ordered)
            t = t.append_column("_pkey", _stable_pkey(t[col], num_partitions))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    tagged = left.map_batches(tag(left_on, "l", set(left_cols)), batch_format="pyarrow").union(
        right.map_batches(tag(right_on, "r", set(right_cols)), batch_format="pyarrow")
    )

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "l"][left_cols]
        r = df[df["_side"] == "r"][right_cols]
        return l.merge(r, left_on=left_on, right_on=right_on, how=how)

    def restore_types(t: pa.Table) -> pa.Table:
        # the null-padded union forces pandas to widen int64 → float64
        # (NaN for the other side's columns); restore every column to its
        # declared Arrow type so the join is type-stable.  Left-join
        # misses surface as NaN → normalized to real nulls first.
        import pyarrow.compute as pc

        cols = {}
        for name in t.column_names:
            c = t[name]
            want = all_fields.get(name)
            if want is not None and c.type != want:
                if pa.types.is_floating(c.type) and not pa.types.is_floating(want):
                    c = pc.if_else(pc.is_nan(c), pa.nulls(len(c), c.type), c)
                c = pc.cast(c, want)
            cols[name] = c
        return pa.table(cols)

    # Bound the sort's input block count: groupby's shuffle scales with
    # input blocks, and callers that loop joins (stages/cluster.py) would
    # otherwise compound block counts round over round (observed: 340
    # tiny blocks → 40 s sorts on a 13-vertex graph).  Shuffle-less
    # coalesce — the groupby re-distributes rows anyway.
    tagged = tagged.repartition(num_partitions, shuffle=False)
    return tagged.groupby("_pkey").map_groups(
        join_partition, batch_format="pandas"
    ).map_batches(restore_types, batch_format="pyarrow")


def semi_join(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    anti: bool = False,
    num_partitions: int = 64,
) -> Dataset:
    """Set-membership join: keep left rows whose ``left_on`` value exists
    in ``right[right_on]`` (``anti=True`` inverts — the NOT EXISTS shape
    gap-fill uses internally, exposed as a first-class operator).

    Cheaper than ``hash_join`` by construction: the right side is reduced
    to its per-batch DISTINCT keys before the exchange, so the shuffle
    carries left rows + right's key set only — at 100 TB a membership
    probe against a billion-key set never builds a joined row.  Left rows
    pass through exactly once (no duplication on right-side multiplicity),
    so the output schema is the left schema verbatim.
    """
    key_t = [f for f in _schema_of(right) if f.name == right_on]
    if not key_t:
        raise ValueError(f"right side has no column {right_on!r}")

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("_pkey", _stable_pkey(t[left_on], num_partitions))
        return t.append_column("_side", pa.array(["l"] * t.num_rows, pa.string()))

    def right_keys(t: pa.Table) -> pa.Table:
        # per-batch dedup combiner: only distinct keys cross the shuffle
        out = t.select([right_on]).group_by([right_on], use_threads=False).aggregate([])
        if right_on != "_rkey":
            out = out.rename_columns(["_rkey"])
        return out.append_column("_pkey", _stable_pkey(out["_rkey"], num_partitions))

    left_schema = _schema_of(left)
    left_cols = [f.name for f in left_schema]

    def widen_left(t: pa.Table) -> pa.Table:
        if "_rkey" not in t.column_names:
            t = t.append_column("_rkey", pa.nulls(t.num_rows, key_t[0].type))
        return t.select(left_cols + ["_rkey", "_pkey", "_side"])

    def widen_right(t: pa.Table) -> pa.Table:
        for f in left_schema:
            t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        t = t.append_column("_side", pa.array(["r"] * t.num_rows, pa.string()))
        return t.select(left_cols + ["_rkey", "_pkey", "_side"])

    tagged = (
        left.map_batches(tag_left, batch_format="pyarrow")
        .map_batches(widen_left, batch_format="pyarrow")
        .union(
            right.map_batches(right_keys, batch_format="pyarrow")
            .map_batches(widen_right, batch_format="pyarrow")
        )
        .repartition(num_partitions, shuffle=False)
    )

    def probe_partition(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.combine_chunks()
        is_l = pc.equal(t["_side"], "l")
        l = t.filter(is_l)
        keys = t.filter(pc.invert(is_l))["_rkey"]
        hit = pc.is_in(l[left_on], value_set=keys.combine_chunks())
        keep = pc.invert(pc.fill_null(hit, False)) if anti else pc.fill_null(hit, False)
        return l.filter(keep).select(left_cols)

    return tagged.groupby("_pkey").map_groups(probe_partition, batch_format="pyarrow")


def anti_join(left: Dataset, right: Dataset, *, left_on: str, right_on: str,
              num_partitions: int = 64) -> Dataset:
    """Left rows with NO match in the right side (NOT EXISTS)."""
    return semi_join(left, right, left_on=left_on, right_on=right_on,
                     anti=True, num_partitions=num_partitions)


def _schema_of(ds: Dataset) -> pa.Schema:
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    sample = ds.limit(1).to_pandas()
    return pa.Table.from_pandas(sample, preserve_index=False).schema
