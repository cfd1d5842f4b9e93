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


def test_interval_join_inner_and_overlap_semantics():
    """inner drops unmatched/expired points; with overlapping intervals
    the LATEST-started one wins (and a point past it resolves to no match
    even if an earlier interval still covers it — documented semantics)."""
    import numpy as np

    from s_tsfe_dl_ray.stages.asof import interval_join

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    pts = ray.data.from_items([
        {"pid": 1, "k": "a", "ts": t0 + 5 * m},    # inside iv1 only
        {"pid": 2, "k": "a", "ts": t0 + 12 * m},   # inside iv1 AND iv2 → iv2
        {"pid": 3, "k": "a", "ts": t0 + 25 * m},   # past iv2 end, iv1 covers
                                                   # → latest-start expired → none
        {"pid": 4, "k": "b", "ts": t0 + 1 * m},    # no intervals for key b
    ]).repartition(2)
    ivs = ray.data.from_items([
        {"k": "a", "lo": t0, "hi": t0 + 30 * m, "tag": "iv1"},
        {"k": "a", "lo": t0 + 10 * m, "hi": t0 + 20 * m, "tag": "iv2"},
    ])
    left = to_pdf(interval_join(
        pts, ivs, key="k", point_ts="ts", start_col="lo", end_col="hi",
        interval_cols=["tag"], how="left",
    )).sort_values("pid").reset_index(drop=True)
    assert left.tag.tolist()[0] == "iv1"
    assert left.tag.tolist()[1] == "iv2"
    assert left.tag.isna().tolist() == [False, False, True, True]
    assert left.pid.dtype.kind == "i"  # type-stable through the union

    pts2 = ray.data.from_items([
        {"pid": 1, "k": "a", "ts": t0 + 5 * m},
        {"pid": 3, "k": "a", "ts": t0 + 25 * m},
        {"pid": 4, "k": "b", "ts": t0 + 1 * m},
    ])
    inner = to_pdf(interval_join(
        pts2, ivs, key="k", point_ts="ts", start_col="lo", end_col="hi",
        interval_cols=["tag"], how="inner",
    ))
    assert inner.pid.tolist() == [1]


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


def test_bloom_prefilter_preserves_exactness():
    """semi/anti with the Bloom prefilter equal the plain exact paths —
    the bloom only shrinks the shuffle (FPs re-checked, anti misses
    bypass)."""
    from s_tsfe_dl_ray.stages.join import anti_join, semi_join

    def mk():
        left = ray.data.from_items(
            [{"k": i, "v": f"L{i}"} for i in range(200)]
        ).repartition(4)
        right = ray.data.from_items(
            [{"rk": i * 3} for i in range(40)] + [{"rk": 6}] * 5
        ).repartition(3)
        return left, right

    # tiny bitmap (256 bits for ~40 keys) to force a real FP rate: the
    # exactness guarantee must hold even when the bloom is saturated
    for bits in (1 << 8,):
        l1, r1 = mk()
        plain = to_pdf(semi_join(l1, r1, left_on="k", right_on="rk"))
        l2, r2 = mk()
        bloomed = to_pdf(semi_join(l2, r2, left_on="k", right_on="rk",
                                   bloom_bits=bits))
        assert sorted(bloomed.k) == sorted(plain.k), bits

        l3, r3 = mk()
        plain_a = to_pdf(anti_join(l3, r3, left_on="k", right_on="rk"))
        l4, r4 = mk()
        bloomed_a = to_pdf(anti_join(l4, r4, left_on="k", right_on="rk",
                                     bloom_bits=bits))
        assert sorted(bloomed_a.k) == sorted(plain_a.k), bits


def test_hash_join_full_outer():
    """Full outer: matched rows joined, left orphans right-null, right
    orphans left-null, exact under multi-block hash co-partitioning."""
    import pandas as pd
    import ray

    from s_tsfe_dl_ray.stages.join import hash_join

    l = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    r = pd.DataFrame({"rk": [2, 3, 4], "rv": [200, 300, 400]})
    out = to_pdf(hash_join(
        ray.data.from_pandas(l).repartition(2),
        ray.data.from_pandas(r).repartition(2),
        left_on="k", right_on="rk", how="outer",
    ))
    # matched
    m = out[(out.k == 2)]
    assert m.rv.tolist() == [200]
    # left orphan: right side null
    lo = out[out.k == 1]
    assert len(lo) == 1 and pd.isna(lo.rk.iloc[0]) and pd.isna(lo.rv.iloc[0])
    # right orphan: left side null
    ro = out[out.rk == 4]
    assert len(ro) == 1 and pd.isna(ro.k.iloc[0]) and pd.isna(ro.lv.iloc[0])
    assert len(out) == 4


def test_snapshot_diff_classification():
    """added/removed/changed classification with NULL-safe compare;
    unchanged keys dropped; multi-block."""
    import numpy as np
    import pandas as pd
    import ray

    from s_tsfe_dl_ray.stages.join import snapshot_diff

    old = pd.DataFrame({"k": [1, 2, 3, 4],
                        "v": [1.0, 2.0, np.nan, 4.0]})
    new = pd.DataFrame({"k": [2, 3, 4, 5],
                        "v": [2.0, np.nan, 40.0, 5.0]})
    out = to_pdf(snapshot_diff(
        ray.data.from_pandas(old).repartition(2),
        ray.data.from_pandas(new).repartition(2),
        key="k", compare_cols=["v"],
    )).set_index("k").sort_index()
    # 1 removed; 2 unchanged (dropped); 3 NULL==NULL unchanged (dropped);
    # 4 changed; 5 added
    assert out.index.tolist() == [1, 4, 5]
    assert out.change.tolist() == ["removed", "changed", "added"]


def test_referential_orphans_planted():
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.stages.join import referential_orphans

    child = ray.data.from_arrow(pa.table({"fk": [1, 1, 2, 3, 9, 9, 9, 7]}))
    parent = ray.data.from_arrow(pa.table({"pk": [1, 2, 3, 4]}))
    out = referential_orphans(
        child, parent, fk="fk", pk="pk", relationship="c.fk->p.pk"
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["relationship"] == "c.fk->p.pk"
    assert row["n_child_rows"] == 8
    assert row["n_distinct_fk"] == 5
    assert row["n_orphan_rows"] == 4   # three 9s + one 7
    assert row["n_orphan_keys"] == 2   # {9, 7}


def test_salted_join_matches_hash_join_on_skew():
    import numpy as np
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.stages.join import hash_join, salted_join

    rng = np.random.default_rng(5)
    # 80% of left rows hit two mega keys
    k = np.where(rng.random(5000) < 0.8,
                 rng.choice([7, 13], 5000),
                 rng.integers(100, 400, 5000))
    left = pa.table({"k": k, "lv": rng.integers(0, 1000, 5000)})
    rk = np.concatenate([np.array([7, 13]), np.arange(100, 350)])
    right = pa.table({"rk": rk,
                      "rv": rng.integers(0, 1000, len(rk))})
    for how in ("inner", "left"):
        a = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      left_on="k", right_on="rk", how=how).to_pandas()
        b = salted_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        left_on="k", right_on="rk", hot_keys=[7, 13],
                        salt=4, how=how).to_pandas()
        cols = sorted(a.columns)
        assert cols == sorted(b.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), how


def test_plan_compaction_bins_respect_target():
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.sources.parquet import plan_compaction

    audit = pa.table({
        "file_name": [f"f{i}" for i in range(8)],
        "compressed_bytes": [90, 70, 60, 40, 30, 20, 10, 150],
    })
    out = plan_compaction(
        ray.data.from_arrow(audit), target_bytes=100,
        bytes_col="compressed_bytes",
    ).to_pandas()
    assert set(out["file_name"]) == {f"f{i}" for i in range(8)}
    g = out.groupby("bin_id")["file_bytes"].sum()
    # every multi-file bin respects the target; oversize files get own bin
    multi = out.groupby("bin_id").size()
    for b, total in g.items():
        if multi[b] > 1:
            assert total <= 100
    assert (out[out.file_name == "f7"].bin_bytes == 150).all()
    # deterministic: rerun gives the identical plan
    out2 = plan_compaction(
        ray.data.from_arrow(audit), target_bytes=100,
        bytes_col="compressed_bytes").to_pandas()
    assert out.equals(out2)


def test_broadcast_join_inner_left_and_guards():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray

    from s_tsfe_dl_ray.stages.join import broadcast_join

    large = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 21.0])}))
    dim = pa.table({"k2": pa.array([1, 2, 5], pa.int64()),
                    "name": pa.array(["a", "b", "e"])})

    inner = broadcast_join(large, dim, left_on="k",
                           right_on="k2").to_pandas()
    assert sorted(inner["k"].tolist()) == [1, 2, 2]
    assert set(inner["name"]) == {"a", "b"}

    left = broadcast_join(large, dim, left_on="k", right_on="k2",
                          how="left").to_pandas().sort_values(
        ["k", "v"]).reset_index(drop=True)
    assert len(left) == 5
    assert left.loc[left.k == 3, "name"].isna().all()
    assert (left.loc[left.k == 2, "name"] == "b").all()

    dup = pa.table({"k2": pa.array([1, 1], pa.int64()),
                    "name": pa.array(["a", "b"])})
    with pytest.raises(ValueError):
        broadcast_join(large, dup, left_on="k", right_on="k2")

    clash = pa.table({"k2": pa.array([1], pa.int64()),
                      "v": pa.array([9.0])})
    with pytest.raises(Exception):
        broadcast_join(large, clash, left_on="k",
                       right_on="k2").to_pandas()
