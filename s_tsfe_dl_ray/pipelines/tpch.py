"""Decision-support join pipelines over the TPC-H-ish star schema.

The reference's data plumbing is single-table (one signal source per
experiment — data.py:99-154 reads MIT-BIH alone, keras_experiment.py:41-47
streams one KDD file); a production tier-timeseries engine additionally
has to answer the classic fact⋈dimension questions over the SAME
star-schema inputs its rollups consume.  This module composes the
engine's relational primitives — partitioned :func:`~..stages.join.hash_join`,
shuffle-light :func:`~..stages.join.semi_join`, combiner-disciplined
:func:`~.relational.grouped_aggregate`, broadcast dimension lookups —
into five TPC-H-shaped pipelines (Q3/Q4/Q10/Q14/Q18 skeletons adapted
to the columns this star schema actually has).

Scale design (every pipeline):

- **prune at the read**: ``columns=`` lists exactly what the join needs,
  and row predicates (date windows, return flags, market segment) are
  pushed into the parquet scan via ``filter=`` — at 100 TB the date
  window prunes whole row groups before a byte leaves storage;
- **money is exact int64**: revenue rides as the scaled integer product
  ``round(price*100) * (100 - round(disc*100))`` (scale 1e4) so
  distributed partial sums are associative-exact and match a sequential
  decimal sum bit-for-bit (float sums at ~5e8 differ in the 6th decimal);
- **semi joins where only existence matters**: Q4's "order had a
  returned line" never builds joined rows — the right side crosses the
  exchange as per-batch DISTINCT keys only;
- **top-k after aggregation**: sort+limit runs on the aggregated
  (orders-sized, not lineitem-sized) result with a full deterministic
  tie-break so the k-cut is stable under any partitioning.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data
from ray.data import Dataset

from .relational import grouped_aggregate
from ..stages.join import anti_join, hash_join, semi_join

def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def _revenue_i(t: pa.Table, keep: list[str]) -> pa.Table:
    """Exact scaled revenue: int64 round(price*100) * (100 - round(disc*100))."""
    price_i = pc.cast(pc.round(pc.multiply(
        t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
    disc_i = pc.cast(pc.round(pc.multiply(
        t["l_discount"], pa.scalar(100.0))), pa.int64())
    cols = {k: t[k] for k in keep}
    cols["revenue_i"] = pc.multiply(
        price_i, pc.subtract(pa.scalar(100, pa.int64()), disc_i))
    return pa.table(cols)


def q3_shipping_priority(
    sf_dir: str,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """Top-k open-order revenue (TPC-H Q3 skeleton): orders placed before
    ``cutoff`` by customers in ``segment``, revenue from lineitems shipped
    after ``cutoff``; top k by revenue.

    Shape: segment filter → semi_join orders⋉customer (orders survive
    with their own schema, no joined rows) → hash_join with the
    date-pruned lineitem side → one combiner aggregate keyed
    (l_orderkey, o_orderdate) → tiny sort+limit on the aggregate.
    Output: ``l_orderkey, o_orderdate, revenue`` (revenue desc,
    o_orderdate asc, l_orderkey asc).
    """
    cut = _ts(cutoff)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == segment)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < cut)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > cut)

    orders = semi_join(orders, cust, left_on="o_custkey", right_on="c_custkey",
                       num_partitions=num_partitions)
    li = li.map_batches(lambda t: _revenue_i(t, ["l_orderkey"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                  num_partitions=num_partitions)
    agg = grouped_aggregate(
        j, keys=["l_orderkey", "o_orderdate"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    out = agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["revenue", "o_orderdate", "l_orderkey"],
                    descending=[True, False, False]).limit(k)


def q4_priority_returns(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-07-01",
    num_partitions: int = 64,
) -> Dataset:
    """Order-priority distribution of orders with at least one RETURNED
    lineitem (TPC-H Q4 skeleton; this schema has no commit/receipt dates,
    so the EXISTS predicate is ``l_returnflag = 'R'``).

    The existence probe is a :func:`semi_join` — the lineitem side is
    reduced to per-batch DISTINCT orderkeys before the exchange, so at
    100 TB the shuffle carries the (much smaller) order rows plus a key
    set, never a joined row.  Output: ``o_orderpriority, n_orders``.
    """
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= _ts(date_from))
        & (pads.field("o_orderdate") < _ts(date_to)))
    returned = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"],
        filter=pads.field("l_returnflag") == "R")
    hit = semi_join(orders, returned, left_on="o_orderkey",
                    right_on="l_orderkey", num_partitions=num_partitions)
    return grouped_aggregate(
        hit, keys=["o_orderpriority"],
        aggs={"n_orders": ("o_orderkey", "count")},
        num_partitions=num_partitions)


def q10_returned_revenue(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-07-01",
    k: int = 20,
    num_partitions: int = 64,
) -> Dataset:
    """Top-k customers by revenue lost to returns (TPC-H Q10 skeleton):
    lineitems flagged 'R' on orders placed in the window, rolled up per
    customer, nation name attached from the broadcast dimension.

    Join order folds early: lineitem⋈orders reduces to (o_custkey,
    revenue_i) partials BEFORE the customer join, so the second exchange
    carries one row per (partition, customer), not per lineitem.
    Output: ``c_custkey, c_name, n_name, c_acctbal, revenue``.
    """
    import numpy as np
    import pyarrow.parquet as pq

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= _ts(date_from))
        & (pads.field("o_orderdate") < _ts(date_to)))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R")
    li = li.map_batches(lambda t: _revenue_i(t, ["l_orderkey"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                  num_partitions=num_partitions)
    per_cust = grouped_aggregate(
        j, keys=["o_custkey"], aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    j2 = hash_join(per_cust, cust, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def fin(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"],
            "n_name": pa.array(lut[nk], pa.string()),
            "c_acctbal": t["c_acctbal"],
            "revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    out = j2.map_batches(fin, batch_format="pyarrow")
    return out.sort(["revenue", "c_custkey"],
                    descending=[True, False]).limit(k)


def q14_promo_share(
    sf_dir: str,
    *,
    month_from: str = "1997-03-01",
    month_to: str = "1997-04-01",
    num_partitions: int = 64,
) -> Dataset:
    """Promotion revenue share for one ship-month (TPC-H Q14 skeleton):
    100 × promo revenue / total revenue where promo = ``p_type = 'PROMO'``
    (this schema's p_type is a plain category, not a 3-word string).

    Both numerator and denominator are exact int64 partial sums carried
    through ONE global combiner reduce (a single literal-key group);
    the part dimension joins via the partitioned hash join so the
    pipeline stays two-large-table-safe at any part-table size.
    Output: one row ``promo_revenue, total_revenue, promo_share``.
    """
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= _ts(month_from))
        & (pads.field("l_shipdate") < _ts(month_to)))
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    li = li.map_batches(lambda t: _revenue_i(t, ["l_partkey"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, part, left_on="l_partkey", right_on="p_partkey",
                  num_partitions=num_partitions)

    def split(t: pa.Table) -> pa.Table:
        promo = pc.cast(pc.equal(t["p_type"], "PROMO"), pa.int64())
        return pa.table({
            "_all": pa.array([1] * t.num_rows, pa.int8()),
            "promo_i": pc.multiply(t["revenue_i"], promo),
            "revenue_i": t["revenue_i"],
        })

    j = j.map_batches(split, batch_format="pyarrow")
    agg = grouped_aggregate(
        j, keys=["_all"],
        aggs={"promo_i": ("promo_i", "sum"), "revenue_i": ("revenue_i", "sum")},
        num_partitions=1)

    def fin(t: pa.Table) -> pa.Table:
        promo = pc.divide(pc.cast(t["promo_i"], pa.float64()), pa.scalar(10_000.0))
        total = pc.divide(pc.cast(t["revenue_i"], pa.float64()), pa.scalar(10_000.0))
        return pa.table({
            "promo_revenue": promo,
            "total_revenue": total,
            "promo_share": pc.multiply(pa.scalar(100.0), pc.divide(promo, total)),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def q18_large_orders(
    sf_dir: str,
    *,
    min_qty: float = 300.0,
    num_partitions: int = 64,
) -> Dataset:
    """Large-volume orders (TPC-H Q18 skeleton): orders whose total
    lineitem quantity exceeds ``min_qty``, with customer identity.

    The HAVING subquery is a combiner aggregate over lineitem (exact:
    quantities are integral, float64 partial sums are associative-exact
    for them), filtered BEFORE any join — only the few surviving hot
    orders enter the orders/customer joins.  Output: ``c_custkey,
    c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty``.
    """
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    per_order = grouped_aggregate(
        li, keys=["l_orderkey"], aggs={"sum_qty": ("l_quantity", "sum")},
        num_partitions=num_partitions)
    big = per_order.filter(
        expr=f"sum_qty > {min_qty}")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = hash_join(big, orders, left_on="l_orderkey", right_on="o_orderkey",
                  num_partitions=num_partitions)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    j2 = hash_join(j, cust, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"],
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "o_totalprice": t["o_totalprice"],
            "sum_qty": t["sum_qty"],
        })

    return j2.map_batches(fin, batch_format="pyarrow")


def q12_priority_lines(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    num_partitions: int = 64,
) -> Dataset:
    """Order-priority mix per lineitem status for a ship-year (TPC-H Q12
    skeleton; this schema has no l_shipmode/commitdate, so the group
    axis is ``l_linestatus`` and the window predicate is l_shipdate).

    high = orders with priority 1-URGENT/2-HIGH.  The join output folds
    immediately to two conditional int64 counters per batch, so the
    post-join exchange carries |linestatus| partial rows per partition.
    Output: ``l_linestatus, high_line_count, low_line_count``.
    """
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus"],
        filter=(pads.field("l_shipdate") >= _ts(date_from))
        & (pads.field("l_shipdate") < _ts(date_to)))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                  num_partitions=num_partitions)

    def split(t: pa.Table) -> pa.Table:
        hi = pc.cast(pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"])), pa.int64())
        return pa.table({
            "l_linestatus": t["l_linestatus"],
            "high_line_count": hi,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi),
        })

    j = j.map_batches(split, batch_format="pyarrow")
    return grouped_aggregate(
        j, keys=["l_linestatus"],
        aggs={"high_line_count": ("high_line_count", "sum"),
              "low_line_count": ("low_line_count", "sum")},
        num_partitions=2)


def q19_disjunctive_revenue(
    sf_dir: str,
    *,
    num_partitions: int = 64,
) -> Dataset:
    """Discounted revenue under an OR-of-ANDs brand/size/quantity
    predicate (TPC-H Q19 skeleton).  The conjunctive envelope of the
    disjunction (quantity ≤ 30, size ≤ 35) is pushed into BOTH parquet
    reads so non-candidate rows never leave storage; the residual
    disjunction is one vectorized boolean kernel after the partitioned
    hash join.  Output: one row ``n_lines, revenue``.
    """
    import numpy as np

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_quantity") >= 1)
        & (pads.field("l_quantity") <= 30))
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=(pads.field("p_size") >= 1) & (pads.field("p_size") <= 35))

    def derive(t: pa.Table) -> pa.Table:
        out = _revenue_i(t, ["l_partkey"])
        return out.append_column("l_quantity", t["l_quantity"])

    li = li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, part, left_on="l_partkey", right_on="p_partkey",
                  num_partitions=num_partitions)

    def residual(t: pa.Table) -> pa.Table:
        q, b, s = t["l_quantity"], t["p_brand"], t["p_size"]

        def branch(brand, smax, qlo, qhi):
            return pc.and_(pc.and_(pc.equal(b, brand),
                                   pc.less_equal(s, smax)),
                           pc.and_(pc.greater_equal(q, qlo),
                                   pc.less_equal(q, qhi)))

        keep = pc.or_(pc.or_(branch("Brand#12", 15, 1, 11),
                             branch("Brand#23", 25, 10, 20)),
                      branch("Brand#34", 35, 20, 30))
        sub = t.filter(keep)
        n = sub.num_rows
        return pa.table({
            "_all": pa.array(np.ones(n, dtype=np.int8)),
            "n_lines": pa.array(np.ones(n, dtype=np.int64)),
            "revenue_i": sub["revenue_i"],
        })

    j = j.map_batches(residual, batch_format="pyarrow")
    agg = grouped_aggregate(
        j, keys=["_all"],
        aggs={"n_lines": ("n_lines", "sum"),
              "revenue_i": ("revenue_i", "sum")},
        num_partitions=1)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_lines": t["n_lines"],
            "revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def q7_nation_volume(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1999-01-01",
    num_partitions: int = 64,
) -> Dataset:
    """Shipping volume between every (customer nation, supplier nation)
    pair per ship-year (TPC-H Q7 skeleton, un-filtered pair matrix).

    Join strategy for 100 TB: the two BIG joins (lineitem⋈orders on
    orderkey, +customer on custkey) run as partitioned hash joins; the
    result folds to (c_nationkey, l_suppkey, l_year) partial sums BEFORE
    the supplier join, so the supplier exchange carries at most
    |nations|×|suppliers|×|years| rows regardless of lineitem count; the
    25-row nation dimension is a broadcast lookup, never shuffled.
    Output: ``cust_nation, supp_nation, l_year, revenue``.
    """
    import numpy as np
    import pyarrow.parquet as pq

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= _ts(date_from))
        & (pads.field("l_shipdate") < _ts(date_to)))

    def derive(t: pa.Table) -> pa.Table:
        out = _revenue_i(t, ["l_orderkey", "l_suppkey"])
        return out.append_column(
            "l_year", pc.cast(pc.year(t["l_shipdate"]), pa.int64()))

    li = li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j1 = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j2 = hash_join(j1, cust, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)
    folded = grouped_aggregate(
        j2, keys=["c_nationkey", "l_suppkey", "l_year"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    j3 = hash_join(folded, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)
    pairs = grouped_aggregate(
        j3, keys=["c_nationkey", "s_nationkey", "l_year"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=8)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def fin(t: pa.Table) -> pa.Table:
        ck = t["c_nationkey"].to_numpy(zero_copy_only=False)
        sk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cust_nation": pa.array(lut[ck], pa.string()),
            "supp_nation": pa.array(lut[sk], pa.string()),
            "l_year": t["l_year"],
            "revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    return pairs.map_batches(fin, batch_format="pyarrow")


def q6_forecast_revenue(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> Dataset:
    """Forecast-revenue-change scan (TPC-H Q6 skeleton): revenue that
    would have been earned by dropping small discounts —
    ``sum(l_extendedprice * l_discount)`` over a ship-year, a discount
    band and a quantity ceiling.

    The canonical "predicate pushdown wins" query: ALL three predicates
    go into the parquet ``filter=`` so at 100 TB whole row groups are
    skipped on (shipdate, discount, quantity) statistics and only two
    float columns leave storage.  The product rides as exact int64
    (price cents × discount percent, scale 1e4) through one global
    combiner cell — a single 16-byte partial per partition crosses the
    exchange.  Output: one row ``revenue``.

    Reference analog: the one-pass masked reduction over a windowed
    stream in /root/reference/experiments/keras_experiment.py:583-593
    (score → top-k threshold over 500k held-out rows).
    """
    from .relational import grouped_aggregate

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= _ts(date_from))
        & (pads.field("l_shipdate") < _ts(date_to))
        & (pads.field("l_discount") >= disc_lo - 1e-9)
        & (pads.field("l_discount") <= disc_hi + 1e-9)
        & (pads.field("l_quantity") < max_qty))

    def derive(t: pa.Table) -> pa.Table:
        price_i = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_i = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "_all": pa.array([1] * t.num_rows, pa.int8()),
            "rev_i": pc.multiply(price_i, disc_i),
        })

    agg = grouped_aggregate(
        li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        keys=["_all"], aggs={"rev_i": ("rev_i", "sum")}, num_partitions=1)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"revenue": pc.divide(
            pc.cast(t["rev_i"], pa.float64()), pa.scalar(10_000.0))})

    return agg.map_batches(fin, batch_format="pyarrow")


def q8_market_share(
    sf_dir: str,
    *,
    target_nation: str = "BRAZIL",
    region: str = "AMERICA",
    p_type: str = "PROMO",
    num_partitions: int = 64,
) -> Dataset:
    """National market share (TPC-H Q8 skeleton): for orders by customers
    in ``region`` buying parts of ``p_type``, the share of revenue
    supplied by ``target_nation``, per order year.

    100-TB join strategy: lineitem is pre-filtered by a semi-join
    against the typed part keys (existence only — no part payload
    crosses), then hash-joined with orders and customers; the customer
    nation → region membership and the supplier nation flag are both
    O(25) broadcast lookups (nation ⋈ region folds on the driver), so
    after the two big joins the stream folds to (o_year, l_suppkey)
    int64 partials BEFORE the supplier join.  The final share divides
    two exact int64 sums per year.  Output: ``o_year, mkt_share``.
    """
    import numpy as np
    import pyarrow.parquet as pq
    from .relational import grouped_aggregate

    # driver-side 25-row dimension fold: nationkey -> in-region flag, name
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkey = {k: v for k, v in zip(reg["r_regionkey"].to_pylist(),
                                 reg["r_name"].to_pylist())}
    nk = nat["n_nationkey"].to_numpy()
    in_region = np.zeros(int(nk.max()) + 1, dtype=bool)
    is_target = np.zeros(int(nk.max()) + 1, dtype=bool)
    for k, name, rk in zip(nk, nat["n_name"].to_pylist(),
                           nat["n_regionkey"].to_pylist()):
        in_region[k] = rkey.get(rk) == region
        is_target[k] = name == target_nation

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pads.field("p_type") == p_type)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    li = semi_join(li, part, left_on="l_partkey", right_on="p_partkey",
                   num_partitions=num_partitions)
    li = li.map_batches(lambda t: _revenue_i(t, ["l_orderkey", "l_suppkey"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    j1 = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j2 = hash_join(j1, cust, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)

    def fold_in(t: pa.Table) -> pa.Table:
        ck = t["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = in_region[ck]
        sub = t.filter(pa.array(keep))
        return pa.table({
            "o_year": pc.cast(pc.year(sub["o_orderdate"]), pa.int64()),
            "l_suppkey": sub["l_suppkey"],
            "revenue_i": sub["revenue_i"],
        })

    folded = grouped_aggregate(
        j2.map_batches(fold_in, batch_format="pyarrow"),
        keys=["o_year", "l_suppkey"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    j3 = hash_join(folded, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)

    def split(t: pa.Table) -> pa.Table:
        sk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        tgt = pc.cast(pa.array(is_target[sk]), pa.int64())
        return pa.table({
            "o_year": t["o_year"],
            "target_i": pc.multiply(t["revenue_i"], tgt),
            "total_i": t["revenue_i"],
        })

    years = grouped_aggregate(
        j3.map_batches(split, batch_format="pyarrow"),
        keys=["o_year"],
        aggs={"target_i": ("target_i", "sum"), "total_i": ("total_i", "sum")},
        num_partitions=2)

    def fin(t: pa.Table) -> pa.Table:
        share = pc.divide(pc.cast(t["target_i"], pa.float64()),
                          pc.cast(t["total_i"], pa.float64()))
        return pa.table({"o_year": t["o_year"], "mkt_share": share})

    return years.map_batches(fin, batch_format="pyarrow").sort("o_year")


def q13_order_count_distribution(
    sf_dir: str,
    *,
    exclude_priority: str = "1-URGENT",
    num_partitions: int = 64,
) -> Dataset:
    """Customer order-count distribution (TPC-H Q13 skeleton; the
    NOT-LIKE comment filter becomes an order-priority exclusion on this
    schema): how many customers placed exactly k qualifying orders,
    INCLUDING the zero-order customers the left join keeps.

    Shape: orders fold to per-customer counts first (combiner — the
    exchange carries one row per customer, never per order), then a
    LEFT hash join from customer attaches counts with null→0, then a
    second tiny combiner builds the k → n_customers histogram.
    Output: ``c_count, custdist`` (custdist desc, c_count desc).
    """
    from .relational import grouped_aggregate

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderpriority") != exclude_priority)
    per_cust = grouped_aggregate(
        orders, keys=["o_custkey"], aggs={"c_count": ("o_custkey", "count")},
        num_partitions=num_partitions)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    j = hash_join(cust, per_cust, left_on="c_custkey", right_on="o_custkey",
                  how="left", num_partitions=num_partitions)

    def fold(t: pa.Table) -> pa.Table:
        cnt = pc.fill_null(pc.cast(t["c_count"], pa.int64()), 0)
        return pa.table({"c_count": cnt,
                         "custdist": pa.array([1] * t.num_rows, pa.int64())})

    hist = grouped_aggregate(
        j.map_batches(fold, batch_format="pyarrow"),
        keys=["c_count"], aggs={"custdist": ("custdist", "sum")},
        num_partitions=4)
    return hist.sort(["custdist", "c_count"], descending=[True, True])


def q15_top_supplier(
    sf_dir: str,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    num_partitions: int = 64,
) -> Dataset:
    """Top supplier(s) by ship-quarter revenue (TPC-H Q15 skeleton —
    the revenue view + max-subquery pair).

    The revenue "view" is one combiner fold of the date-pruned lineitem
    to (l_suppkey, revenue_i); the MAX subquery reduces those partials
    to a single int64 on the driver (supplier-count rows, tiny); the
    equality filter then keeps every supplier AT the max exactly —
    int64 money means no epsilon is needed, ties are exact.  Only the
    surviving row(s) join the supplier dimension.
    Output: ``s_suppkey, s_name, total_revenue``.
    """
    from .relational import grouped_aggregate

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= _ts(date_from))
        & (pads.field("l_shipdate") < _ts(date_to)))
    li = li.map_batches(lambda t: _revenue_i(t, ["l_suppkey"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    # materialize the (supplier-count-sized) fold once: both the MAX
    # subquery and the equality filter read it, and without pinning the
    # 100-TB lineitem scan would run twice
    per_supp = grouped_aggregate(
        li, keys=["l_suppkey"], aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions).materialize()
    best = int(per_supp.max("revenue_i"))
    top = per_supp.filter(expr=f"revenue_i == {best}")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    j = hash_join(top, supp, left_on="l_suppkey", right_on="s_suppkey",
                  num_partitions=8)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": t["s_suppkey"],
            "s_name": t["s_name"],
            "total_revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                       pa.scalar(10_000.0)),
        })

    return j.map_batches(fin, batch_format="pyarrow").sort("s_suppkey")


def q17_small_quantity_revenue(
    sf_dir: str,
    *,
    brand: str = "Brand#23",
    frac: float = 0.2,
    num_partitions: int = 64,
) -> Dataset:
    """Small-quantity-order revenue (TPC-H Q17 skeleton; no p_container
    on this schema, so the part predicate is brand alone): average
    yearly revenue lost if orders below ``frac`` × the part's mean
    quantity were not taken — ``sum(l_extendedprice)/7`` over lineitems
    with ``l_quantity < frac * avg(l_quantity per part)``.

    The correlated AVG subquery becomes a two-pass dance over the SAME
    brand-pruned lineitem slice: pass 1 folds (l_partkey → sum_qty, n)
    partials (combiner — exact, quantities are integral), pass 2
    re-joins those per-part stats back and applies the threshold
    vectorized.  Both passes are semi-join-pruned by the brand's part
    keys so the 100-TB lineitem is touched only where it can match.
    Output: one row ``avg_yearly``.
    """
    from .relational import grouped_aggregate

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pads.field("p_brand") == brand)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li = semi_join(li, part, left_on="l_partkey", right_on="p_partkey",
                   num_partitions=num_partitions)

    def fold_qty(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "sum_qty": pc.cast(t["l_quantity"], pa.float64()),
            "n_lines": pa.array([1] * t.num_rows, pa.int64()),
        })

    stats = grouped_aggregate(
        li.map_batches(fold_qty, batch_format="pyarrow"),
        keys=["l_partkey"],
        aggs={"sum_qty": ("sum_qty", "sum"), "n_lines": ("n_lines", "sum")},
        num_partitions=num_partitions)
    j = hash_join(li, stats, left_on="l_partkey", right_on="l_partkey",
                  num_partitions=num_partitions)

    def thresh(t: pa.Table) -> pa.Table:
        avg = pc.divide(t["sum_qty"], pc.cast(t["n_lines"], pa.float64()))
        keep = pc.less(t["l_quantity"], pc.multiply(pa.scalar(frac), avg))
        sub = t.filter(keep)
        price_i = pc.cast(pc.round(pc.multiply(
            sub["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        return pa.table({"_all": pa.array([1] * sub.num_rows, pa.int8()),
                         "price_i": price_i})

    agg = grouped_aggregate(
        j.map_batches(thresh, batch_format="pyarrow"),
        keys=["_all"], aggs={"price_i": ("price_i", "sum")},
        num_partitions=1)

    def fin(t: pa.Table) -> pa.Table:
        total = pc.divide(pc.cast(t["price_i"], pa.float64()),
                          pa.scalar(100.0))
        return pa.table({"avg_yearly": pc.divide(total, pa.scalar(7.0))})

    return agg.map_batches(fin, batch_format="pyarrow")


def q22_global_sales_opportunity(
    sf_dir: str,
    *,
    nationkeys: tuple[int, ...] = (1, 3, 5, 7, 9, 11, 13),
    dormant_since: str = "2001-01-01",
    num_partitions: int = 64,
) -> Dataset:
    """Global sales opportunity (TPC-H Q22 skeleton; no c_phone on this
    schema, so the country-code IN-list becomes a nationkey IN-list,
    and — since every synthetic customer has SOME order — "never placed
    an order" becomes "placed none since ``dormant_since``"): dormant
    customers from the listed nations with above-average positive
    account balance, grouped by nation.

    The scalar AVG subquery folds to (sum_cents, n) int64 partials on
    the driver (exact division once); the NOT EXISTS is the engine's
    anti_join — the recency predicate is pushed into the orders parquet
    read (row groups past the cutoff never leave storage) and the
    surviving keys cross the exchange as per-batch DISTINCT custkeys
    only.  Output: ``cntrycode, numcust, totacctbal``.
    """
    from .relational import grouped_aggregate

    keys = list(nationkeys)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        filter=pads.field("c_nationkey").isin(keys))

    def fold_avg(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], 0.0))
        cents = pc.cast(pc.round(pc.multiply(
            pos["c_acctbal"], pa.scalar(100.0))), pa.int64())
        return pa.table({"_all": pa.array([1] * pos.num_rows, pa.int8()),
                         "sum_c": cents,
                         "n": pa.array([1] * pos.num_rows, pa.int64())})

    avg_t = grouped_aggregate(
        cust.map_batches(fold_avg, batch_format="pyarrow"),
        keys=["_all"], aggs={"sum_c": ("sum_c", "sum"), "n": ("n", "sum")},
        num_partitions=1).take_all()
    avg_bal = (avg_t[0]["sum_c"] / 100.0) / avg_t[0]["n"]

    rich = cust.filter(expr=f"c_acctbal > {avg_bal!r}")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= _ts(dormant_since))
    no_orders = anti_join(rich, orders, left_on="c_custkey",
                          right_on="o_custkey",
                          num_partitions=num_partitions)

    def fold(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "cntrycode": pc.cast(t["c_nationkey"], pa.int64()),
            "numcust": pa.array([1] * t.num_rows, pa.int64()),
            "bal_c": cents,
        })

    agg = grouped_aggregate(
        no_orders.map_batches(fold, batch_format="pyarrow"),
        keys=["cntrycode"],
        aggs={"numcust": ("numcust", "sum"), "bal_c": ("bal_c", "sum")},
        num_partitions=4)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "cntrycode": t["cntrycode"],
            "numcust": t["numcust"],
            "totacctbal": pc.divide(pc.cast(t["bal_c"], pa.float64()),
                                    pa.scalar(100.0)),
        })

    return agg.map_batches(fin, batch_format="pyarrow").sort("cntrycode")


def q5_local_supplier_volume(
    sf_dir: str,
    *,
    region: str = "ASIA",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    num_partitions: int = 64,
) -> Dataset:
    """Local-supplier revenue per nation (TPC-H Q5 skeleton): lineitems
    whose customer AND supplier sit in the same nation of ``region``,
    orders placed in the date window; revenue summed per nation.

    Join strategy for 100 TB: the two BIG joins (lineitem⋈orders on
    orderkey, +customer on custkey) run partitioned; customers are
    pre-filtered to the region's nations (a tiny broadcast `isin` pushed
    into the parquet scan) so the customer side of the second join only
    carries the region's rows; the result folds to
    (c_nationkey, l_suppkey) partial sums BEFORE the supplier join, so
    the supplier exchange carries at most |nations|×|suppliers| rows
    regardless of lineitem count; the same-nation predicate and the
    25-row nation name lookup run on that folded table.
    Output: ``n_name, revenue`` (revenue desc).

    Reference analog: multi-source alignment in
    /root/reference/TSFEDL/data.py:99-154 (signals + annotations joined
    on record id before windowing) — here the star schema's three-way
    fact⋈dimension alignment.
    """
    import numpy as np
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = {k for k, n in zip(reg["r_regionkey"].to_pylist(),
                               reg["r_name"].to_pylist()) if n == region}
    region_nations = [int(k) for k, r in zip(nat["n_nationkey"].to_pylist(),
                                             nat["n_regionkey"].to_pylist())
                      if int(r) in rkeys]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda t: _revenue_i(t, ["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= _ts(date_from))
        & (pads.field("o_orderdate") < _ts(date_to)))
    j1 = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"],
        filter=pads.field("c_nationkey").isin(region_nations))
    j2 = hash_join(j1, cust, left_on="o_custkey", right_on="c_custkey",
                   num_partitions=num_partitions)
    folded = grouped_aggregate(
        j2, keys=["c_nationkey", "l_suppkey"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    j3 = hash_join(folded, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)

    def local_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_nationkey"], t["s_nationkey"]))

    per_nation = grouped_aggregate(
        j3.map_batches(local_only, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["c_nationkey"], aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=4)

    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def fin(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array(lut[nk], pa.string()),
            "revenue": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                 pa.scalar(10_000.0)),
        })

    return per_nation.map_batches(fin, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False])


def q9_product_profit(
    sf_dir: str,
    *,
    name_substr: str = "red",
    num_partitions: int = 64,
) -> Dataset:
    """Product-type profit per (supplier nation, order year) — TPC-H Q9
    adapted to this star schema: no ``partsupp`` table exists, so profit
    is the discounted revenue ``l_extendedprice*(1-l_discount)`` (the
    supplycost term is dropped; the join/fold SHAPE is Q9's).

    Shape: the part filter (name substring) becomes a semi join — the
    lineitem side survives with its own schema, only distinct partkeys
    cross the exchange; the big lineitem⋈orders join attaches the order
    year; partials fold to (l_suppkey, o_year) BEFORE the supplier join;
    the nation name is a broadcast lookup on the folded result.
    Output: ``n_name, o_year, profit`` (n_name asc, o_year desc).
    """
    import numpy as np
    import pyarrow.parquet as pq

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pc.match_substring(pads.field("p_name"), name_substr))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    li = semi_join(li, part, left_on="l_partkey", right_on="p_partkey",
                   num_partitions=num_partitions)
    li = li.map_batches(
        lambda t: _revenue_i(t, ["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    j1 = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)

    def derive_year(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": t["l_suppkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "revenue_i": t["revenue_i"],
        })

    folded = grouped_aggregate(
        j1.map_batches(derive_year, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["l_suppkey", "o_year"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=num_partitions)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    j2 = hash_join(folded, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)
    per_nation = grouped_aggregate(
        j2, keys=["s_nationkey", "o_year"],
        aggs={"revenue_i": ("revenue_i", "sum")},
        num_partitions=4)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def fin(t: pa.Table) -> pa.Table:
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array(lut[nk], pa.string()),
            "o_year": t["o_year"],
            "profit": pc.divide(pc.cast(t["revenue_i"], pa.float64()),
                                pa.scalar(10_000.0)),
        })

    return per_nation.map_batches(fin, batch_format="pyarrow").sort(
        ["n_name", "o_year"], descending=[False, True])


def q21_waiting_supplier(
    sf_dir: str,
    *,
    k: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """Suppliers who kept multi-supplier orders waiting — TPC-H Q21
    adapted to the available columns: no receipt/commit dates exist, so
    "the supplier everyone waited on" is the UNIQUE supplier whose line
    shipped last (strictly latest l_shipdate) in a finished ('F') order
    that involved more than one supplier.  Q21's EXISTS / NOT EXISTS
    pair maps onto ``n_supp > 1`` / ``n_at_max == 1``.

    Shape: semi join lineitem⋉F-orders (only distinct orderkeys cross),
    fold to (orderkey, suppkey, max_ship) pairs — the per-order argmax
    then runs on the PAIRS table (orders-sized, not lineitem-sized) via
    one partition-wise vectorized pass keyed by orderkey; blame counts
    fold per suppkey and the supplier name attaches by one last small
    join.  Output: ``s_name, numwait`` (numwait desc, s_name asc), top k.
    """
    import numpy as np
    import pandas as pd

    from ..stages.grouped import grouped_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=pads.field("o_orderstatus") == "F")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    li = semi_join(li, orders, left_on="l_orderkey", right_on="o_orderkey",
                   num_partitions=num_partitions)
    pairs = grouped_aggregate(
        li, keys=["l_orderkey", "l_suppkey"],
        aggs={"max_ship": ("l_shipdate", "max")},
        num_partitions=num_partitions)

    def blame(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64"),
                                 "numwait": pd.Series([], dtype="int64")})
        g = df.groupby("l_orderkey", sort=False)["max_ship"]
        omax = g.transform("max")
        n_supp = g.transform("size")
        at_max = df["max_ship"].eq(omax)
        n_at_max = at_max.groupby(df["l_orderkey"], sort=False).transform("sum")
        culprit = df.loc[(n_supp > 1) & (n_at_max == 1) & at_max, "l_suppkey"]
        out = culprit.value_counts().rename_axis("l_suppkey").reset_index(
            name="numwait")
        return out.astype({"l_suppkey": "int64", "numwait": "int64"})

    per_supp_part = grouped_apply(
        pairs, keys=["l_orderkey"], fn=blame,
        num_partitions=num_partitions, whole_partition=True)
    per_supp = grouped_aggregate(
        per_supp_part, keys=["l_suppkey"],
        aggs={"numwait": ("numwait", "sum")}, num_partitions=4)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    named = hash_join(per_supp, supp, left_on="l_suppkey",
                      right_on="s_suppkey", num_partitions=4)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"s_name": t["s_name"], "numwait": t["numwait"]})

    return named.map_batches(fin, batch_format="pyarrow").sort(
        ["numwait", "s_name"], descending=[True, False]).limit(k)


def fulfillment_latency(
    sf_dir: str,
    *,
    num_partitions: int = 64,
) -> Dataset:
    """Order-to-first-shipment latency profile per order priority — the
    operations-analytics staple over the star schema: how long after
    placement does the FIRST line ship, and does priority actually buy
    speed?

    Shape: lineitem folds to (orderkey, min shipdate) partials BEFORE
    any join (the exchange carries one row per order, not per line);
    one partitioned hash join attaches (orderdate, priority); exact
    integer day-diffs fold per priority into the discrete-quantile cut
    (``quantile_disc`` recipe — element at ⌈n·q⌉−1 — so p50/p90 are
    order statistics, not interpolations).
    Output: ``o_orderpriority, n_orders, p50_days, p90_days, max_days``.
    """
    import numpy as np

    from ..stages.grouped import grouped_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    first_ship = grouped_aggregate(
        li, keys=["l_orderkey"], aggs={"first_ship": ("l_shipdate", "min")},
        num_partitions=num_partitions)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(first_ship, orders, left_on="l_orderkey",
                  right_on="o_orderkey", num_partitions=num_partitions)

    def derive(t: pa.Table) -> pa.Table:
        ship_us = pc.cast(pc.cast(t["first_ship"], pa.timestamp("us")),
                          pa.int64()).to_numpy(zero_copy_only=False)
        ord_us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
        # FLOOR division (numpy), matching SQL `//` even if a line ever
        # ships "before" its order date (arrow's int divide truncates)
        days = (ship_us - ord_us) // 86_400_000_000
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "days": pa.array(days, pa.int64())})

    def fold(df) -> "pd.DataFrame":
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "n_orders": pd.Series([], dtype="int64"),
                "p50_days": pd.Series([], dtype="int64"),
                "p90_days": pd.Series([], dtype="int64"),
                "max_days": pd.Series([], dtype="int64")})
        rows = {"o_orderpriority": [], "n_orders": [], "p50_days": [],
                "p90_days": [], "max_days": []}
        for prio, g in df.groupby("o_orderpriority", sort=True):
            d = np.sort(g["days"].to_numpy(dtype=np.int64))
            n = len(d)
            rows["o_orderpriority"].append(prio)
            rows["n_orders"].append(n)
            rows["p50_days"].append(int(d[int(np.ceil(n * 0.5)) - 1]))
            rows["p90_days"].append(int(d[int(np.ceil(n * 0.9)) - 1]))
            rows["max_days"].append(int(d[-1]))
        out = pd.DataFrame(rows)
        return out.astype({"n_orders": "int64", "p50_days": "int64",
                           "p90_days": "int64", "max_days": "int64"})

    derived = j.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_apply(derived, keys=["o_orderpriority"], fn=fold,
                         num_partitions=8,
                         whole_partition=True).sort("o_orderpriority")


def q2_min_cost_supplier(
    sf_dir: str,
    *,
    ptype: str = "LARGE",
    size_lo: int = 10,
    size_hi: int = 20,
    region: str = "EUROPE",
    k: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """Minimum-cost supplier per part (TPC-H Q2 skeleton).  This star
    schema carries no ``partsupp``, so the supply catalog is DERIVED
    from the fact table: supplier *s* supplies part *p* iff a lineitem
    pairs them, at unit cost ``min(l_extendedprice / l_quantity)`` over
    those lines.  For parts of ``ptype`` with size in [size_lo, size_hi],
    find the ``region`` supplier(s) achieving the per-part minimum cost.

    The correlated MIN subquery is the Q15/Q17 two-fold dance: fold 1
    reduces the (part ⋉ region-supplier)-pruned lineitem to one row per
    (part, supplier) pair carrying its min unit cost; fold 2 reduces
    those pairs to one best-cost row per part; an equality join keeps
    the pairs AT the minimum — float equality is exact because both
    folds minimize over the identical set of IEEE doubles (the same
    ``price/qty`` divisions), never re-deriving them.  Supplier name /
    balance attach to the surviving (tiny) result; nation names come
    from a driver-side 25-row lookup.  Output: ``s_acctbal, s_name,
    n_name, p_partkey, unit_cost`` (acctbal desc, total tie-break,
    limit ``k`` — deterministic under any partitioning).

    Reference analog: per-record argmin selection in the reference's
    top-k thresholding (keras_experiment.py:583-593) — here as a
    distributed grouped argmin over a derived catalog.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from .relational import grouped_aggregate

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = {k_ for k_, n in zip(reg["r_regionkey"].to_pylist(),
                                 reg["r_name"].to_pylist()) if n == region}
    region_nations = [int(nk) for nk, rk in
                      zip(nat["n_nationkey"].to_pylist(),
                          nat["n_regionkey"].to_pylist()) if int(rk) in rkeys]

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=(pads.field("p_type") == ptype)
        & (pads.field("p_size") >= size_lo)
        & (pads.field("p_size") <= size_hi))
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
        filter=pads.field("s_nationkey").isin(region_nations))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    li = semi_join(li, part, left_on="l_partkey", right_on="p_partkey",
                   num_partitions=num_partitions)
    li = semi_join(li, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)

    def unit(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "unit_cost": pc.divide(t["l_extendedprice"], t["l_quantity"]),
        })

    pairs = grouped_aggregate(
        li.map_batches(unit, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_partkey", "l_suppkey"],
        aggs={"unit_cost": ("unit_cost", "min")},
        num_partitions=num_partitions)
    best = grouped_aggregate(
        pairs, keys=["l_partkey"], aggs={"best_cost": ("unit_cost", "min")},
        num_partitions=8)
    at_min = hash_join(pairs, best, left_on="l_partkey",
                       right_on="l_partkey", num_partitions=8)
    at_min = at_min.map_batches(
        lambda t: t.filter(pc.equal(t["unit_cost"], t["best_cost"])),
        batch_format="pyarrow", zero_copy_batch=True)
    named = hash_join(at_min, supp, left_on="l_suppkey",
                      right_on="s_suppkey", num_partitions=8)

    nkeys = nat["n_nationkey"].to_numpy()
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut[nkeys] = names

    def fin(t: pa.Table) -> pa.Table:
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s_acctbal": t["s_acctbal"],
            "s_name": t["s_name"],
            "n_name": pa.array(lut[nk], pa.string()),
            "p_partkey": t["l_partkey"],
            "unit_cost": t["unit_cost"],
        })

    return named.map_batches(fin, batch_format="pyarrow").sort(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        descending=[True, False, False, False]).limit(k)


def q11_important_part_values(
    sf_dir: str,
    *,
    nation: str = "NATION_7",
    frac: float = 0.001,
    num_partitions: int = 64,
) -> Dataset:
    """Important-part inventory value (TPC-H Q11 skeleton).  Without
    ``partsupp``, a part's "stock value" held by ``nation`` is derived
    from the fact table: ``sum(extendedprice_cents × quantity)`` over
    lineitems supplied by that nation's suppliers.  Keep parts whose
    value exceeds ``frac`` × the nation's total — the classic HAVING
    over a global-sum subquery.

    Scale shape: lineitem is semi-join-pruned to the nation's suppliers
    (supplier side crosses the exchange as per-batch DISTINCT keys);
    one combiner fold produces the part-count-sized value table, which
    is pinned (materialized) because BOTH the global-sum subquery and
    the filter read it — the int64 global total reduces on the driver,
    and the threshold broadcast back is one float.  Exact parity: the
    per-part values are int64 cents×qty (associative), and both engines
    compare that int against ``float(total) * frac`` in IEEE double.
    Output: ``p_partkey, part_value`` (value desc, partkey asc).
    """
    import pyarrow.parquet as pq

    from .relational import grouped_aggregate

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = [int(k) for k, n in zip(nat["n_nationkey"].to_pylist(),
                                    nat["n_name"].to_pylist()) if n == nation]
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"],
        filter=pads.field("s_nationkey").isin(nkeys))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    li = semi_join(li, supp, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)

    def fold(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table({
            "l_partkey": t["l_partkey"],
            "value_i": pc.multiply(cents, qty),
        })

    values = grouped_aggregate(
        li.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_partkey"], aggs={"value_i": ("value_i", "sum")},
        num_partitions=num_partitions).materialize()
    total = values.sum("value_i") or 0
    thr = float(total) * frac

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["value_i"], pa.scalar(thr)))
        return pa.table({
            "p_partkey": t["l_partkey"],
            "part_value": pc.divide(pc.cast(t["value_i"], pa.float64()),
                                    pa.scalar(100.0)),
        })

    return values.map_batches(fin, batch_format="pyarrow").sort(
        ["part_value", "p_partkey"], descending=[True, False])


def q16_supplier_part_counts(
    sf_dir: str,
    *,
    exclude_brand: str = "Brand#45",
    exclude_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 4, 9, 16, 25, 36, 49),
    num_partitions: int = 64,
) -> Dataset:
    """Supplier counts by part attribute (TPC-H Q16 skeleton).  The
    supply catalog is the DISTINCT (part, supplier) pairs observed in
    lineitem; suppliers with negative account balance stand in for the
    reference's complaint filter (no ``s_comment`` on this schema);
    parts keep everything except ``exclude_brand`` / ``exclude_type``,
    restricted to the ``sizes`` list.  Output: distinct-supplier count
    per (brand, type, size).

    Scale shape: the NOT-IN supplier set is an anti_join (per-batch
    DISTINCT keys cross the exchange, never joined rows); the fact
    table folds to distinct pairs FIRST (one row per pair survives the
    shuffle), then one partitioned join attaches part attributes pruned
    at the read; the two COUNT-DISTINCT levels are two combiner folds —
    dedup on (brand, type, size, supplier), then count per (brand,
    type, size).  Nothing wider than the pair table ever moves.
    Output: ``p_brand, p_type, p_size, supplier_cnt``.
    """
    from .relational import grouped_aggregate

    bad = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"],
        filter=pads.field("s_acctbal") < 0.0)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    li = anti_join(li, bad, left_on="l_suppkey", right_on="s_suppkey",
                   num_partitions=num_partitions)
    pairs = grouped_aggregate(
        li, keys=["l_partkey", "l_suppkey"],
        aggs={"_n": ("l_suppkey", "count")},
        num_partitions=num_partitions).drop_columns(["_n"])

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=(pads.field("p_brand") != exclude_brand)
        & (pads.field("p_type") != exclude_type)
        & (pads.field("p_size").isin(list(sizes))))
    j = hash_join(pairs, part, left_on="l_partkey", right_on="p_partkey",
                  num_partitions=num_partitions)
    per_supp = grouped_aggregate(
        j, keys=["p_brand", "p_type", "p_size", "l_suppkey"],
        aggs={"_n": ("l_suppkey", "count")},
        num_partitions=num_partitions)
    counts = grouped_aggregate(
        per_supp, keys=["p_brand", "p_type", "p_size"],
        aggs={"supplier_cnt": ("l_suppkey", "count")},
        num_partitions=8)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t["p_brand"],
            "p_type": t["p_type"],
            "p_size": pc.cast(t["p_size"], pa.int64()),
            "supplier_cnt": t["supplier_cnt"],
        })

    return counts.map_batches(fin, batch_format="pyarrow").sort(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        descending=[True, False, False, False])


def q20_window_demand_suppliers(
    sf_dir: str,
    *,
    name_prefix: str = "small",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    nation: str = "NATION_3",
    num_partitions: int = 64,
) -> Dataset:
    """Window-dominant part suppliers (TPC-H Q20 skeleton).  The
    reference query's ``ps_availqty > 0.5 × window demand`` needs
    ``partsupp``; the fact-table analog asks the inverse capacity
    question: which ``nation`` suppliers saw MORE THAN HALF of their
    all-time shipped quantity of ``name_prefix%`` parts inside the
    [date_from, date_to) window — i.e. demand concentrated enough that
    stock planning matters.  The nested EXISTS chain survives intact:
    part-prefix filter → per-(supplier, part) conditional fold →
    predicate → distinct suppliers → nation-pruned supplier join.

    Exactness: quantities fold as int64 (integral by construction) and
    the predicate is the integer comparison ``2×qty_win > qty_all`` —
    no float anywhere.  The prefix filter streams (``pc.starts_with``
    in the map, no driver materialization); everything after the first
    fold is supplier×part-sized.  Output: ``s_name`` sorted.
    """
    import datetime as dt

    import pyarrow.parquet as pq

    from .relational import grouped_aggregate

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    part = part.map_batches(
        lambda t: t.filter(pc.starts_with(t["p_name"],
                                          name_prefix)).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    li = semi_join(li, part, left_on="l_partkey", right_on="p_partkey",
                   num_partitions=num_partitions)

    lo = dt.datetime.fromisoformat(date_from)
    hi = dt.datetime.fromisoformat(date_to)

    def fold(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        in_win = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                         pc.less(t["l_shipdate"], pa.scalar(hi)))
        return pa.table({
            "l_suppkey": t["l_suppkey"],
            "l_partkey": t["l_partkey"],
            "qty_win": pc.if_else(in_win, qty, pa.scalar(0, pa.int64())),
            "qty_all": qty,
        })

    per_pair = grouped_aggregate(
        li.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_suppkey", "l_partkey"],
        aggs={"qty_win": ("qty_win", "sum"), "qty_all": ("qty_all", "sum")},
        num_partitions=num_partitions)

    def dominant(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(t["qty_win"], pa.scalar(2, pa.int64())),
                          t["qty_all"])
        return t.filter(keep).select(["l_suppkey"])

    hot = grouped_aggregate(
        per_pair.map_batches(dominant, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["l_suppkey"], aggs={"_n": ("l_suppkey", "count")},
        num_partitions=8)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkeys = [int(k) for k, n in zip(nat["n_nationkey"].to_pylist(),
                                    nat["n_name"].to_pylist()) if n == nation]
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filter=pads.field("s_nationkey").isin(nkeys))
    j = hash_join(hot, supp, left_on="l_suppkey", right_on="s_suppkey",
                  num_partitions=8)
    return j.map_batches(lambda t: t.select(["s_name"]),
                         batch_format="pyarrow").sort("s_name")
