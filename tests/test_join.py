"""Set-membership joins (stages/join.semi_join / anti_join)."""

from __future__ import annotations

import pandas as pd
import ray

from conftest import SF_CHECK, assert_frames_match, to_pdf


def _tables():
    """customer × URGENT orders — urgent-only so both the semi and the
    anti side are non-empty at sf0.01."""
    import pyarrow.compute as pc

    from s_tsfe_dl_ray.sources.parquet import read_table

    cust = read_table(f"{SF_CHECK}/customer.parquet",
                      columns=["c_custkey", "c_name"])
    orders = read_table(
        f"{SF_CHECK}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return cust, orders

_URGENT = "AND o.o_orderpriority = '1-URGENT'"


def test_semi_join_matches_duckdb(ddb):
    from s_tsfe_dl_ray.stages.join import semi_join

    cust, orders = _tables()
    actual = to_pdf(semi_join(cust, orders, left_on="c_custkey", right_on="o_custkey"))
    expected = ddb.sql(
        f"""SELECT c_custkey, c_name FROM '{SF_CHECK}/customer.parquet' c
            WHERE EXISTS (SELECT 1 FROM '{SF_CHECK}/orders.parquet' o
                          WHERE o.o_custkey = c.c_custkey {_URGENT})"""
    ).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)
    # right-side multiplicity must NOT duplicate left rows
    assert actual.c_custkey.is_unique


def test_semi_plus_anti_partition_left(ddb):
    """semi ∪ anti == left, disjoint — membership is a total predicate."""
    from s_tsfe_dl_ray.stages.join import anti_join, semi_join

    cust, orders = _tables()
    semi = to_pdf(semi_join(cust, orders, left_on="c_custkey", right_on="o_custkey"))
    cust2, orders2 = _tables()
    anti = to_pdf(anti_join(cust2, orders2, left_on="c_custkey", right_on="o_custkey"))
    assert set(semi.c_custkey).isdisjoint(anti.c_custkey)
    left = ddb.sql(f"SELECT c_custkey, c_name FROM '{SF_CHECK}/customer.parquet'").df()
    both = pd.concat([semi, anti], ignore_index=True)
    assert_frames_match(both, left, atol=0, rtol=0, check_kind=True)


def test_semi_join_small_synthetic():
    """Multi-block + duplicate right keys + a left key type the probe must
    not coerce."""
    from s_tsfe_dl_ray.stages.join import semi_join

    left = ray.data.from_items(
        [{"k": i, "v": f"row{i}"} for i in range(10)]
    ).repartition(4)
    right = ray.data.from_items(
        [{"rk": 2}] * 5 + [{"rk": 4}] + [{"rk": 99}]
    ).repartition(3)
    out = to_pdf(semi_join(left, right, left_on="k", right_on="rk"))
    assert sorted(out.k.tolist()) == [2, 4]
    assert list(out.columns) == ["k", "v"]
