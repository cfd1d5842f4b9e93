"""Schema constants + ingest validation.

The reference declares a fixed implicit schema ``(N, T, V)`` at graph
construction and validates it by assertion (reference: utils.py:96-102
``check_inputs``; models_keras.py:625-634 channel checks).  The engine
makes the schema explicit Arrow and validates at ingest.
"""

from __future__ import annotations

import pyarrow as pa

# Primary engine input (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Driver-provided stream table (/root/testdata/sf*/events.parquet).
EVENTS_SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ]
)


class SchemaError(ValueError):
    pass


def validate_schema(actual: pa.Schema, expected: pa.Schema, *, subset: bool = True) -> None:
    """Assert `actual` carries the expected columns with expected types.

    ``subset=True`` allows extra columns in `actual` (projection happens at
    the read, so usually actual ⊆ expected is what we check per stage).
    Analog of the reference's ``check_inputs`` (utils.py:61-104).
    """
    for field in expected:
        idx = actual.get_field_index(field.name)
        if idx < 0:
            raise SchemaError(f"missing column {field.name!r}; have {actual.names}")
        have = actual.field(idx).type
        if have != field.type:
            raise SchemaError(
                f"column {field.name!r} has type {have}, expected {field.type}"
            )
    if not subset:
        extra = set(actual.names) - {f.name for f in expected}
        if extra:
            raise SchemaError(f"unexpected columns {sorted(extra)}")


def expectations_report(
    ds,
    rules: "list[dict]",
    *,
    num_partitions: int = 16,
):
    """Declarative data-contract checks — the validation layer a
    production pipeline runs before training consumes a drop: each rule
    folds to (n_checked, n_violations) combiner partials in ONE pass
    over the data, so a 100 TB contract sweep costs one read.

    Rule kinds (``{"rule": ..., "col": ..., ...}``):

    - ``not_null``                       — col must be non-null
    - ``unique``    (needs a shuffle-free probe: violations = rows −
                     distinct values, computed via a (value,count)
                     partial fold — the one rule that exchanges
                     per-value rows)
    - ``in_set``    (``values``)         — col ∈ allowed set
    - ``range``     (``lo``/``hi``, inclusive) — lo ≤ col ≤ hi
    - ``regex``     (``pattern``, RE2)   — string col fully matches

    Output: one row per rule — ``rule_id, rule, col, n_checked,
    n_violations, passed`` — the machine-readable gate a scheduler
    reads.  Reference analog: the input-shape assertions every
    reference model constructor runs (check_inputs — TSFEDL
    models_keras.py:38-60), promoted to data-plane contracts.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from .stages.rollup import _stable_pkey

    simple = [(i, r) for i, r in enumerate(rules)
              if r["rule"] != "unique"]
    uniques = [(i, r) for i, r in enumerate(rules)
               if r["rule"] == "unique"]

    def partial(t: pa.Table) -> pa.Table:
        rid, n_c, n_v = [], [], []
        for i, r in simple:
            col = t[r["col"]]
            n = t.num_rows
            if r["rule"] == "not_null":
                bad = col.null_count
            elif r["rule"] == "in_set":
                ok = pc.is_in(col, value_set=pa.array(r["values"]))
                good = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                bad = n - good  # null is not in any set
            elif r["rule"] == "range":
                ok = pc.and_(pc.greater_equal(col, r["lo"]),
                             pc.less_equal(col, r["hi"]))
                good = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                bad = n - good
            elif r["rule"] == "regex":
                ok = pc.match_substring_regex(
                    col, f"^(?:{r['pattern']})$")
                good = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                bad = n - good
            else:
                raise ValueError(f"unknown rule {r['rule']!r}")
            rid.append(i)
            n_c.append(n)
            n_v.append(int(bad))
        return pa.table({"rule_id": pa.array(rid, pa.int64()),
                         "n_checked": pa.array(n_c, pa.int64()),
                         "n_violations": pa.array(n_v, pa.int64())})

    parts = [ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)] if simple else []

    for i, r in uniques:
        col = r["col"]

        def u_partial(t: pa.Table, _c=col) -> pa.Table:
            out = (t.select([_c]).group_by([_c], use_threads=False)
                   .aggregate([([], "count_all")]))
            out = out.rename_columns([_c, "n"])
            return out.append_column(
                "_pkey", _stable_pkey(out[_c], num_partitions))

        def u_merge(df: pd.DataFrame, _i=i, _c=col) -> pd.DataFrame:
            g = df.groupby(_c, sort=False)["n"].sum()
            return pd.DataFrame({
                "rule_id": pd.Series([_i], dtype="int64"),
                "n_checked": pd.Series([int(g.sum())], dtype="int64"),
                "n_violations": pd.Series([int((g - 1).clip(lower=0)
                                               .sum())], dtype="int64"),
            })

        parts.append(
            ds.map_batches(u_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey").map_groups(u_merge, batch_format="pandas")
            # normalize to arrow blocks so the union with the simple-rule
            # branch doesn't mix block types
            .map_batches(lambda t: t, batch_format="pyarrow"))

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("rule_id", sort=True, as_index=False).sum()
        meta = {i: r for i, r in enumerate(rules)}
        g["rule"] = [meta[i]["rule"] for i in g["rule_id"]]
        g["col"] = [meta[i]["col"] for i in g["rule_id"]]
        g["passed"] = g["n_violations"] == 0
        return g[["rule_id", "rule", "col", "n_checked",
                  "n_violations", "passed"]].astype(
            {"rule_id": "int64", "n_checked": "int64",
             "n_violations": "int64"})

    return merged.repartition(1).map_batches(
        finish, batch_format="pandas").sort("rule_id")
