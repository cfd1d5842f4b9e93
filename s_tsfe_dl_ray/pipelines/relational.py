"""General (non-windowed) grouped aggregates — the engine's plain
aggregation surface, demonstrated on the TPC-H-ish ``lineitem`` table.

Same combiner discipline as the rollup core: derive → per-batch partial
aggregate (pyarrow group_by) → one small shuffle of partials → finalize
means from carried (sum, count).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def grouped_aggregate(
    ds: Dataset,
    *,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_partitions: int = 64,
) -> Dataset:
    """Generic non-windowed grouped aggregate with combiner discipline.

    ``aggs``: out_name -> (col, fn) with fn in {sum, min, max, count,
    mean}.  Per-batch pyarrow partial → coarse hash shuffle → vectorized
    per-partition merge → finalize (mean = sum/count).  The engine's
    GlobalAveragePooling/GlobalMaxPool analog (blocks_keras.py:96, 232)
    for arbitrary grouped reductions.
    """
    from ..stages.rollup import _stable_pkey

    # base (associative) columns needed
    base: set[tuple[str, str]] = set()
    for col, fn in aggs.values():
        if fn == "mean":
            base.update({(col, "sum"), (col, "count")})
        else:
            base.add((col, fn))

    def partial(t: pa.Table) -> pa.Table:
        pa_aggs = [(c, f) for c, f in sorted(base)]
        out = t.group_by(keys, use_threads=False).aggregate(pa_aggs)
        out = out.rename_columns(
            [c if c in keys else f"__{c}" for c in out.column_names]
        )
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def merge(t: pa.Table) -> pa.Table:
        m_aggs, renames = [], {}
        for name in t.column_names:
            if name in keys or name == "_pkey":
                continue
            fn = "min" if name.endswith("_min") else "max" if name.endswith("_max") else "sum"
            m_aggs.append((name, fn))
            renames[f"{name}_{fn}"] = name
        out = t.group_by(keys + ["_pkey"], use_threads=False).aggregate(m_aggs)
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    def fin(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for out_name, (col, fn) in aggs.items():
            if fn == "mean":
                cols[out_name] = pc.divide(
                    pc.cast(t[f"__{col}_sum"], pa.float64()),
                    pc.cast(t[f"__{col}_count"], pa.float64()),
                )
            else:
                cols[out_name] = t[f"__{col}_{fn}"]
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("_pkey").map_groups(merge, batch_format="pyarrow")
    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1-shaped rollup over lineitem (returnflag × linestatus)."""

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc_price)
        return t.append_column("charge", charge)

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [
                ("l_quantity", "sum"), ("l_extendedprice", "sum"),
                ("disc_price", "sum"), ("charge", "sum"),
                ("l_discount", "sum"), ("l_quantity", "count"),
            ]
        )
        renames = {
            "l_quantity_sum": "s_qty", "l_extendedprice_sum": "s_price",
            "disc_price_sum": "s_disc_price", "charge_sum": "s_charge",
            "l_discount_sum": "s_disc", "l_quantity_count": "n",
        }
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"],
    )
    partials = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    partials = partials.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"),
        Sum("s_price", alias_name="sum_base_price"),
        Sum("s_disc_price", alias_name="sum_disc_price"),
        Sum("s_charge", alias_name="sum_charge"),
        Sum("s_disc", alias_name="_s_disc"),
        Sum("n", alias_name="count_order"),
    )

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["count_order"], pa.float64())
        t = t.append_column("avg_qty", pc.divide(t["sum_qty"], n))
        t = t.append_column("avg_price", pc.divide(t["sum_base_price"], n))
        t = t.append_column("avg_disc", pc.divide(t["_s_disc"], n))
        return t.drop_columns(["_s_disc"])

    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
