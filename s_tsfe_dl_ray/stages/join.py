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

    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema
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

    return tagged.groupby("_pkey").map_groups(join_partition, batch_format="pandas")
