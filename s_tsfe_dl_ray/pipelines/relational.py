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
