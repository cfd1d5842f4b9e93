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


from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class CustomAgg:
    """User-injected aggregate with combiner discipline (SURVEY.md §2.10
    "custom aggregate UDF injection").

    The UDF is decomposed the way any distributed aggregate must be:
    ``bases`` are the associative per-batch partials it needs (col, fn)
    with fn in {sum, min, max, count}, and ``finalize`` combines the
    merged base columns into the output — it receives the merged table
    and reads base columns as ``__{col}_{fn}``.  Anything expressible
    over associative bases works: variance/stddev via (sum, sum-of-
    squares, count), ranges via (min, max), rates, ...  Derive non-base
    inputs (e.g. x²) with a ``map_batches`` BEFORE aggregating.
    """

    bases: tuple[tuple[str, str], ...]
    finalize: Callable[[pa.Table], "pa.Array | pa.ChunkedArray"]


def grouped_aggregate(
    ds: Dataset,
    *,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    custom: dict[str, CustomAgg] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Generic non-windowed grouped aggregate with combiner discipline.

    ``aggs``: out_name -> (col, fn) with fn in {sum, min, max, count,
    mean}.  ``custom``: out_name -> :class:`CustomAgg` for arbitrary
    UDF aggregates over associative bases.  Per-batch pyarrow partial →
    coarse hash shuffle → vectorized per-partition merge → finalize
    (mean = sum/count; custom finalizers over merged bases).  The
    engine's GlobalAveragePooling/GlobalMaxPool analog
    (blocks_keras.py:96, 232) for arbitrary grouped reductions.
    """
    from ..stages.rollup import _stable_pkey

    custom = custom or {}

    # base (associative) columns needed
    base: set[tuple[str, str]] = set()
    for col, fn in aggs.values():
        if fn == "mean":
            base.update({(col, "sum"), (col, "count")})
        else:
            base.add((col, fn))
    for ca in custom.values():
        for col, fn in ca.bases:
            if fn not in ("sum", "min", "max", "count"):
                raise ValueError(f"CustomAgg base fn must be associative, got {fn!r}")
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
        for out_name, ca in custom.items():
            cols[out_name] = ca.finalize(t)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("_pkey").map_groups(merge, batch_format="pyarrow")
    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def _money_i(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.ChunkedArray:
    """TPC-H money / rate columns have ≤2 decimals: scale to exact int64.

    Summing scaled integers makes the engine's partial-sum tree EXACTLY
    equal to a sequential decimal sum regardless of association — float64
    partial sums at ~5e8 magnitude differ from DuckDB's sequential sum in
    the 6th decimal, which a round-to-6 comparator can't hide.
    """
    return pc.cast(
        pc.round(pc.multiply(pc.cast(col, pa.float64()), pa.scalar(float(scale)))),
        pa.int64(),
    )


def pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1-shaped rollup over lineitem (returnflag × linestatus).

    Exact-money discipline: qty/price/disc/tax scaled to int64 (cents),
    disc_price = price_i*(100-disc_i) (scale 1e4), charge =
    disc_price_i*(100+tax_i) (scale 1e6); sums stay integer end-to-end
    (decimal128 at the merge for overflow headroom), converted to float
    only at finalize.  Matches a DuckDB DECIMAL sum bit-for-bit after
    float64 conversion (int totals < 2^53 convert exactly).
    """

    def derive_partial(t: pa.Table) -> pa.Table:
        qty_i = _money_i(t["l_quantity"])
        price_i = _money_i(t["l_extendedprice"])
        disc_i = _money_i(t["l_discount"])
        tax_i = _money_i(t["l_tax"])
        disc_price_i = pc.multiply(price_i, pc.subtract(pa.scalar(100, pa.int64()), disc_i))
        charge_i = pc.multiply(disc_price_i, pc.add(pa.scalar(100, pa.int64()), tax_i))
        t = pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "s_qty": qty_i, "s_price": price_i, "s_disc_price": disc_price_i,
            "s_charge": charge_i, "s_disc": disc_i,
        })
        out = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("s_qty", "sum"), ("s_price", "sum"), ("s_disc_price", "sum"),
             ("s_charge", "sum"), ("s_disc", "sum"), ("s_qty", "count")]
        )
        renames = {
            "s_qty_sum": "s_qty", "s_price_sum": "s_price",
            "s_disc_price_sum": "s_disc_price", "s_charge_sum": "s_charge",
            "s_disc_sum": "s_disc", "s_qty_count": "n",
        }
        out = out.rename_columns([renames.get(c, c) for c in out.column_names])
        # decimal128 partials: exact even when the global total exceeds int64
        for c in ("s_qty", "s_price", "s_disc_price", "s_charge", "s_disc"):
            out = out.set_column(
                out.column_names.index(c), c,
                pc.cast(out[c], pa.decimal128(38, 0)),
            )
        return out

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"],
    )
    partials = ds.map_batches(derive_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("s_qty", "sum"), ("s_price", "sum"), ("s_disc_price", "sum"),
             ("s_charge", "sum"), ("s_disc", "sum"), ("n", "sum")]
        )
        return out.rename_columns(
            [c[:-4] if c.endswith("_sum") else c for c in out.column_names]
        )

    # ≤ a handful of (flag, status) groups: single-partition merge is exact
    # and tiny — partials per input block are ≤6 rows each.  batch_size=None
    # is load-bearing: the merge must see the whole repartition(1) block as
    # ONE batch or it would emit duplicate group rows silently.
    merged = partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def assert_merged(t: pa.Table) -> pa.Table:
        # ≤6 distinct (returnflag, linestatus) groups exist in TPC-H data;
        # more rows here means the single-batch merge assumption broke
        assert t.num_rows <= 6, f"pricing merge saw {t.num_rows} rows"
        return t

    merged = merged.map_batches(assert_merged, batch_format="pyarrow")

    def fin(t: pa.Table) -> pa.Table:
        f = lambda c, s: pc.divide(pc.cast(t[c], pa.float64()), pa.scalar(float(s)))
        n = pc.cast(t["n"], pa.float64())
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "sum_qty": f("s_qty", 100), "sum_base_price": f("s_price", 100),
            "sum_disc_price": f("s_disc_price", 10_000),
            "sum_charge": f("s_charge", 1_000_000),
            "count_order": t["n"],
            "avg_qty": pc.divide(f("s_qty", 100), n),
            "avg_price": pc.divide(f("s_price", 100), n),
            "avg_disc": pc.divide(f("s_disc", 100), n),
        })

    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def pivot_wide(
    ds: Dataset,
    *,
    keys: list[str],
    pivot_col: str,
    value_col: str,
    categories: list[str],
    count_alias: str = "n_rows",
    num_partitions: int = 64,
) -> Dataset:
    """Wide conditional aggregation (SQL PIVOT): one output column per
    category — ``{value}_sum_{cat} = sum(value where pivot == cat)`` —
    plus the group row count.  The long→wide reshape feature tables need.

    Execution is the plain combiner shape: the per-category columns are
    derived VECTORIZED (value × equality indicator, one kernel per
    category) inside the same fused map as the partial aggregate, so the
    exchange carries one wide partial row per (key, batch) — never the
    long rows.  ``categories`` must be enumerated by the caller (the
    output schema has to be static); discover them with a cheap
    ``grouped_distinct_count``/``top_tokens``-style pre-pass when unknown.
    Rows whose pivot value is outside ``categories`` still count in
    ``count_alias`` but contribute to no pivot column (SQL ELSE 0).
    """
    out_cols = {c: f"{value_col}_sum_{c}" for c in categories}

    def derive(t: pa.Table) -> pa.Table:
        v = t[value_col]
        for cat, out in out_cols.items():
            ind = pc.cast(pc.equal(t[pivot_col], cat), v.type)
            t = t.append_column(out, pc.multiply(v, ind))
        return t

    aggs: dict[str, tuple[str, str]] = {count_alias: (value_col, "count")}
    for out in out_cols.values():
        aggs[out] = (out, "sum")
    derived = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(
        derived, keys=keys, aggs=aggs, num_partitions=num_partitions
    )


def revenue_by_nation(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """Multi-join revenue rollup: lineitem ⋈ orders ⋈ customer ⋈ nation →
    revenue per nation (the TPC-H Q5 skeleton) — the engine's reference
    composition for CHAINED large-table joins plus a broadcast dimension.

    Scale design: the two large sides flow through partitioned hash
    joins (stages/join.py) with columns pruned at the read to exactly
    the join keys + the money column; revenue is carried as the exact
    int64 scaled product (price_i × (100 − disc_i), scale 1e4 — float
    partial sums at ~5e8 differ from a sequential decimal sum in the 6th
    decimal); the 25-row nation table is read once on the driver and
    broadcast into the final map as a plain closure array — never a
    shuffle.  Output: ``n_name, n_items, revenue_sum``.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.join import hash_join

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def rev_i(t: pa.Table) -> pa.Table:
        price_i = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_i = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue_i": pc.multiply(
                price_i, pc.subtract(pa.scalar(100, pa.int64()), disc_i)),
        })

    li = lineitem.map_batches(rev_i, batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)
    j1 = j1.map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "revenue_i": t["revenue_i"]}),
        batch_format="pyarrow")
    j2 = hash_join(j1, customer, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)

    # broadcast dimension: nationkey → name (25 rows, closure-shipped once
    # per task, never shuffled)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def add_name(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array(lut[nk], pa.string()),
            "revenue_i": t["revenue_i"],
        })

    named = j2.map_batches(add_name, batch_format="pyarrow")
    agg = grouped_aggregate(
        named, keys=["n_name"],
        aggs={"n_items": ("revenue_i", "count"),
              "revenue_sum_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "n_items": t["n_items"],
            "revenue_sum": pc.divide(
                pc.cast(t["revenue_sum_i"], pa.float64()), pa.scalar(10_000.0)),
        })

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def customer_rfm(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """RFM (recency / frequency / monetary) table per customer — the
    classic segmentation base over the star schema: days since the
    customer's last order (relative to the corpus's global latest
    order date), order count, and exact lifetime spend.

    Pure combiner: orders fold per batch to (custkey, max date, n,
    spend-cents) partials; the global anchor date is its own one-row
    combiner; money rides as int64 cents (distributed partial sums are
    associative-exact — the engine's standard money discipline).
    Scoring quintiles is a deliberate non-goal here: a global NTILE
    needs a rank exchange; the scale path is quantile boundaries over
    this (already customer-grained) table.

    Output: ``c_custkey, n_orders, recency_days, monetary`` by custkey.
    """
    import numpy as np

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "c_custkey": t["o_custkey"],
            "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
            "last_order": t["o_orderdate"],
            "spend_c": cents,
        })

    agg = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["c_custkey"],
        aggs={"n_orders": ("n_orders", "sum"),
              "last_order": ("last_order", "max"),
              "spend_c": ("spend_c", "sum")},
        num_partitions=num_partitions)

    import pyarrow.parquet as pq

    # global anchor: latest order date (footer statistics would do; one
    # tiny column scan keeps it engine-only)
    anchor = pc.max(pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"])["o_orderdate"]
    ).as_py()

    import datetime as dt

    a_us = int((anchor - dt.datetime(1970, 1, 1)).total_seconds()
               * 1_000_000)

    def fin(t: pa.Table) -> pa.Table:
        last_us = pc.cast(pc.cast(t["last_order"], pa.timestamp("us")),
                          pa.int64())
        rec_days = pc.divide(
            pc.subtract(pa.scalar(a_us, pa.int64()), last_us),
            pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "c_custkey": t["c_custkey"],
            "n_orders": t["n_orders"],
            "recency_days": rec_days,
            "monetary": pc.divide(pc.cast(t["spend_c"], pa.float64()),
                                  pa.scalar(100.0)),
        })

    return agg.map_batches(fin, batch_format="pyarrow").sort("c_custkey")


def revenue_share_hierarchy(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """Percent-of-parent OLAP rollup over the region → nation hierarchy:
    order revenue per nation with its share of the region subtotal and of
    the global total — the share-of-parent staple GROUPING SETS alone
    doesn't give (shares need the parent total next to every child row).

    Scale design: the one large-large join (orders ⋈ customer) is the
    partitioned hash join; nation and region are driver-read broadcast
    closures (25 + 5 rows); revenue rides as exact int cents so the
    share divisions see identical integers on both sides; the final
    share fold runs once on the ≤|nations| aggregate (single tiny
    partition).  Output: ``r_name, n_name, n_orders, revenue,
    share_of_region, share_of_global`` sorted by (r_name, n_name).
    """
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    j = hash_join(orders.map_batches(cents, batch_format="pyarrow",
                                     zero_copy_batch=True),
                  customer, left_on="o_custkey", right_on="c_custkey",
                  num_partitions=num_partitions)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rlut = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nkeys = nat["n_nationkey"].to_numpy()
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    rname = np.asarray([rlut[k] for k in nat["n_regionkey"].to_pylist()],
                       dtype=object)
    nlut = np.empty(int(nkeys.max()) + 1, dtype=object)
    nlut[nkeys] = nname
    rlut_arr = np.empty(int(nkeys.max()) + 1, dtype=object)
    rlut_arr[nkeys] = rname

    def add_dims(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": pa.array(rlut_arr[nk], pa.string()),
            "n_name": pa.array(nlut[nk], pa.string()),
            "cents": t["cents"],
        })

    agg = grouped_aggregate(
        j.map_batches(add_dims, batch_format="pyarrow"),
        keys=["r_name", "n_name"],
        aggs={"n_orders": ("cents", "count"), "cents": ("cents", "sum")},
        num_partitions=num_partitions)

    def shares(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "r_name": pd.Series([], dtype="object"),
                "n_name": pd.Series([], dtype="object"),
                "n_orders": pd.Series([], dtype="int64"),
                "revenue": pd.Series([], dtype="float64"),
                "share_of_region": pd.Series([], dtype="float64"),
                "share_of_global": pd.Series([], dtype="float64")})
        df = df.sort_values(["r_name", "n_name"]).reset_index(drop=True)
        c = df["cents"].to_numpy(dtype=np.float64)
        rtot = df.groupby("r_name", sort=False)["cents"].transform(
            "sum").to_numpy(dtype=np.float64)
        gtot = float(df["cents"].sum())
        return pd.DataFrame({
            "r_name": df["r_name"],
            "n_name": df["n_name"],
            "n_orders": df["n_orders"].astype(np.int64),
            "revenue": c / 100.0,
            "share_of_region": c / rtot,
            "share_of_global": c / gtot})

    return agg.repartition(1).map_batches(shares, batch_format="pandas",
                                          batch_size=None)


def rfm_segments(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """RFM quintile segmentation summary — the scoring layer
    :func:`customer_rfm` deliberately leaves out, folded on the already
    customer-grained table (the lorenz_deciles precedent: the rank
    exchange happens on keys, not events).  Each customer gets three
    quintiles, all "1 = best": q_r by (recency asc, custkey), q_f by
    (order count desc, custkey), q_m by (spend-cents desc, custkey),
    with the integer cut q = (rank−1)·5 // n + 1; the output is the
    ≤125-row segment table — how many customers sit in each
    (q_r, q_f, q_m) cell, their mean recency and total spend.

    Exactness: ranks and cuts are integer; recency/spend aggregate as
    exact int64 and divide once.  Output: ``q_r, q_f, q_m (int64),
    n_customers (int64), avg_recency_days, total_monetary``.
    """
    import numpy as np
    import pandas as pd

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "c_custkey": t["o_custkey"],
            "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
            "last_order": t["o_orderdate"],
            "spend_c": cents,
        })

    agg = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["c_custkey"],
        aggs={"n_orders": ("n_orders", "sum"),
              "last_order": ("last_order", "max"),
              "spend_c": ("spend_c", "sum")},
        num_partitions=num_partitions)

    import datetime as dt

    import pyarrow.parquet as pq

    anchor = pc.max(pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"])["o_orderdate"]
    ).as_py()
    a_us = int((anchor - dt.datetime(1970, 1, 1)).total_seconds()
               * 1_000_000)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "q_r": pd.Series([], dtype="int64"),
            "q_f": pd.Series([], dtype="int64"),
            "q_m": pd.Series([], dtype="int64"),
            "n_customers": pd.Series([], dtype="int64"),
            "avg_recency_days": pd.Series([], dtype="float64"),
            "total_monetary": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        # explicit µs view — a pandas block may carry ns resolution
        last_us = df["last_order"].to_numpy("datetime64[us]") \
            .astype(np.int64)
        rec = (np.int64(a_us) - last_us) // 86_400_000_000
        m = pd.DataFrame({
            "k": df["c_custkey"].to_numpy(np.int64),
            "rec": rec.astype(np.int64),
            "nf": df["n_orders"].to_numpy(np.int64),
            "sc": df["spend_c"].to_numpy(np.int64)})
        n = np.int64(len(m))

        def quint(order_cols, ascending):
            idx = m.sort_values(order_cols, ascending=ascending,
                                kind="mergesort").index.to_numpy()
            rn = np.empty(len(m), np.int64)
            rn[idx] = np.arange(1, len(m) + 1, dtype=np.int64)
            return (rn - 1) * 5 // n + 1

        m["q_r"] = quint(["rec", "k"], [True, True])
        m["q_f"] = quint(["nf", "k"], [False, True])
        m["q_m"] = quint(["sc", "k"], [False, True])
        g = m.groupby(["q_r", "q_f", "q_m"], sort=True, as_index=False) \
            .agg(n_customers=("k", "size"), _rec=("rec", "sum"),
                 _sc=("sc", "sum"))
        nc = g["n_customers"].to_numpy(np.int64)
        return pd.DataFrame({
            "q_r": g["q_r"].astype(np.int64),
            "q_f": g["q_f"].astype(np.int64),
            "q_m": g["q_m"].astype(np.int64),
            "n_customers": nc,
            "avg_recency_days": g["_rec"].to_numpy(np.int64)
                                .astype(np.float64)
                                / nc.astype(np.float64),
            "total_monetary": g["_sc"].to_numpy(np.int64)
                              .astype(np.float64) / 100.0})

    return agg.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def supplier_revenue_hhi(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """Supply-concentration audit per nation: the Herfindahl–Hirschman
    index of supplier revenue shares inside each nation, with the top
    supplier's share — "is this nation's supply dominated by one
    vendor" (the weighted-revenue sibling of
    stages/distinct.categorical_concentration, which counts rows).

    Scale design: supplier→nation is a tiny dimension (10k rows/SF)
    read once on the driver and broadcast as plain dict closures into
    the lineitem combiner — lineitem itself never joins or shuffles
    raw; per-batch (nation, suppkey) partials carry the exact int64
    scaled revenue (price_i × (100 − disc_i), scale 1e4 — the engine's
    revenue discipline), and the ≤ nations×suppliers partial table
    folds on one final partition where each nation's share-square sum
    runs SEQUENTIALLY in suppkey order (== the twin's ``list_reduce``).
    Output: ``n_name, n_suppliers (int64), revenue_sum, hhi,
    top_share`` sorted by nation.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    sup_nat = dict(zip(sup["s_suppkey"].to_pylist(),
                       sup["s_nationkey"].to_pylist()))
    nat_name = dict(zip(nat["n_nationkey"].to_pylist(),
                        nat["n_name"].to_pylist()))

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        price_i = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_i = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_i,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_i))
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        nk = np.array([sup_nat[k] for k in sk], dtype=np.int64)
        base = pa.table({"_nk": pa.array(nk), "_sk": t["l_suppkey"],
                         "_r": rev})
        out = base.group_by(["_nk", "_sk"], use_threads=False) \
            .aggregate([("_r", "sum")])
        return out.rename_columns(["_nk", "_sk", "_r"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_name": pd.Series([], dtype="object"),
            "n_suppliers": pd.Series([], dtype="int64"),
            "revenue_sum": pd.Series([], dtype="float64"),
            "hhi": pd.Series([], dtype="float64"),
            "top_share": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby(["_nk", "_sk"], sort=True, as_index=False)["_r"] \
            .sum()
        tot = g.groupby("_nk", sort=True).agg(
            rt=("_r", "sum"), ns=("_r", "size"), rmax=("_r", "max"))
        rows = []
        for nk, grp in g.groupby("_nk", sort=True):
            rt = np.float64(tot.loc[nk, "rt"])
            acc = np.float64(0.0)
            # suppkey-sorted sequential fold == list_reduce twin
            for r in grp["_r"].to_numpy(np.int64):
                share = np.float64(r) / rt
                acc = acc + share * share
            rows.append((nat_name[nk], int(tot.loc[nk, "ns"]),
                         np.float64(tot.loc[nk, "rt"]) / 10000.0,
                         acc,
                         np.float64(tot.loc[nk, "rmax"]) / rt))
        out = pd.DataFrame(rows, columns=["n_name", "n_suppliers",
                                          "revenue_sum", "hhi",
                                          "top_share"])
        out["n_suppliers"] = out["n_suppliers"].astype(np.int64)
        return out.sort_values("n_name", kind="mergesort") \
            .reset_index(drop=True)

    return lineitem.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(final, batch_format="pandas", batch_size=None)


def order_size_dispersion(sf_dir: str) -> Dataset:
    """Order-size profile: lineitems per order with the Poisson
    dispersion index (variance / mean from exact int64 moments) — the
    one-number "are basket sizes Poisson-like or clumped" check a
    capacity model starts from, plus the size histogram.

    Per-batch per-order count partials merge once; the moment fold is
    exact int64 (n, Σk, Σk², max) cast to float once.  Output: one row
    — ``n_orders (int64), mean_lines, var_lines, dispersion,
    max_lines (int64)``.
    """
    import numpy as np
    import pandas as pd

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["l_orderkey"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns(["l_orderkey", "_k"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_orders": pd.Series([], dtype="int64"),
                "mean_lines": pd.Series([], dtype="float64"),
                "var_lines": pd.Series([], dtype="float64"),
                "dispersion": pd.Series([], dtype="float64"),
                "max_lines": pd.Series([], dtype="int64")})
        k = df.groupby("l_orderkey", sort=False)["_k"].sum() \
            .to_numpy(np.int64)
        n = np.float64(len(k))
        s = np.float64(k.sum())
        ss = np.float64(np.dot(k, k))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            var = (ss - s * s / n) / (n - 1.0)
            disp = var / mean
        return pd.DataFrame({
            "n_orders": pd.Series([len(k)], dtype="int64"),
            "mean_lines": [mean if np.isfinite(mean) else np.nan],
            "var_lines": [var if np.isfinite(var) else np.nan],
            "dispersion": [disp if np.isfinite(disp) else np.nan],
            "max_lines": pd.Series([int(k.max())], dtype="int64")})

    return li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(final, batch_format="pandas", batch_size=None)


def customer_order_cadence(sf_dir: str, *, num_partitions: int = 64,
                           min_orders: int = 3) -> Dataset:
    """Repeat-purchase cadence per customer: mean and coefficient of
    variation of the day gaps between consecutive orders — low CV =
    subscription-like regularity, high CV = bursty; the rhythm view the
    recency/frequency RFM scores flatten away.

    Gaps are exact integer day-index differences (epoch-µs // day — the
    date_diff discipline); consecutive-gap multisets are invariant
    under same-day tie order, so no tiebreak is needed; moment sums are
    exact int64 cast once.  Customers with fewer than ``min_orders``
    orders emit nothing (at least 2 gaps are needed for a variance).
    Output: ``c_custkey, n_orders (int64), mean_gap_days, cv_gap``.
    """
    import numpy as np
    import pandas as pd

    from ..stages.grouped import grouped_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": t["o_custkey"],
            "_d": pa.array(us // 86_400_000_000)})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "n_orders": pd.Series([], dtype="int64"),
            "mean_gap_days": pd.Series([], dtype="float64"),
            "cv_gap": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values(["c_custkey", "_d"], kind="mergesort") \
            .reset_index(drop=True)
        d = m["_d"].to_numpy(np.int64)
        gap = d - np.roll(d, 1)
        firsts = m.groupby("c_custkey", sort=False).cumcount() \
            .to_numpy() == 0
        g = pd.DataFrame({"c_custkey": m["c_custkey"].to_numpy()[~firsts],
                          "_g": gap[~firsts]})
        if len(g) == 0:
            return empty
        g["_gg"] = g["_g"] * g["_g"]
        agg = g.groupby("c_custkey", sort=True, as_index=False).agg(
            _n=("_g", "size"), _s=("_g", "sum"), _ss=("_gg", "sum"))
        agg = agg[agg["_n"] >= min_orders - 1]
        if len(agg) == 0:
            return empty
        n = agg["_n"].to_numpy(np.int64).astype(np.float64)
        s = agg["_s"].to_numpy(np.int64).astype(np.float64)
        ss = agg["_ss"].to_numpy(np.int64).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            var = (ss - s * s / n) / (n - 1.0)
            cv = np.sqrt(var) / mean
        return pd.DataFrame({
            "c_custkey": agg["c_custkey"].astype(np.int64),
            "n_orders": (agg["_n"] + 1).astype(np.int64),
            "mean_gap_days": np.where(np.isfinite(mean), mean, np.nan),
            "cv_gap": np.where(np.isfinite(cv), cv, np.nan)})

    partials = orders.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return grouped_apply(partials, keys=["c_custkey"], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def monthly_revenue_yoy(sf_dir: str) -> Dataset:
    """Monthly order revenue with month-over-month and year-over-year
    growth — the finance-dashboard staple over the star schema: exact
    int-cent monthly sums, growth = (rev − rev_lag)/rev_lag against the
    observed-month sequence lags 1 and 12 (NULL while no base month
    exists or the base is 0).

    Pure combiner: per-batch (month, cents) partials merge once; the
    ≤months-row fold sorts and lags.  Output: ``month (timestamp us),
    n_orders (int64), revenue, mom_growth, yoy_growth``.
    """
    import numpy as np
    import pandas as pd

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        months = (us // 86_400_000_000).astype("datetime64[D]") \
            .astype("datetime64[M]")
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        import numpy as _np
        base = pa.table({
            "_m": pa.array(months.astype("datetime64[us]")
                           .astype(_np.int64)),
            "_one": pa.array(_np.ones(t.num_rows, _np.int64)),
            "_c": cents})
        out = base.group_by(["_m"], use_threads=False).aggregate(
            [("_one", "sum"), ("_c", "sum")])
        return out.rename_columns(["_m", "_n", "_c"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "month": pd.Series([], dtype="datetime64[us]"),
            "n_orders": pd.Series([], dtype="int64"),
            "revenue": pd.Series([], dtype="float64"),
            "mom_growth": pd.Series([], dtype="float64"),
            "yoy_growth": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("_m", sort=True, as_index=False)[["_n", "_c"]] \
            .sum()
        c = g["_c"].to_numpy(np.int64)

        def growth(lagk: int) -> np.ndarray:
            out = np.full(len(c), np.nan)
            if len(c) > lagk:
                prev = c[:-lagk].astype(np.float64)
                cur = c[lagk:].astype(np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = (cur - prev) / prev
                out[lagk:] = np.where(np.isfinite(r), r, np.nan)
            return out

        return pd.DataFrame({
            "month": pd.Series(g["_m"].to_numpy(np.int64))
                     .astype("datetime64[us]"),
            "n_orders": g["_n"].astype(np.int64),
            "revenue": c.astype(np.float64) / 100.0,
            "mom_growth": growth(1),
            "yoy_growth": growth(12)})

    return orders.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(final, batch_format="pandas", batch_size=None)
