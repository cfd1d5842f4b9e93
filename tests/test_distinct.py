"""Distinct-cardinality operators (stages/distinct.py): exact two-stage
count-distinct, top-k-per-group argmax, HyperLogLog sketch, and the
continuous-aggregate ``merge_partials`` refresh."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from conftest import SF_CHECK, assert_frames_match, to_pdf

EVENTS = f"{SF_CHECK}/events.parquet"


def _events_df(columns):
    import pyarrow.parquet as pq

    return pq.read_table(EVENTS, columns=columns).to_pandas()


def test_distinct_count_exact_multi_batch(ddb):
    """Members repeated across many input blocks must be counted once —
    the per-batch dedup partials only bound shuffle volume, never the
    answer."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.distinct import grouped_distinct_count

    # tiny blocks so each user's rows are split across many batches
    ds = read_table(EVENTS, columns=["user_id", "event_type"]).repartition(16)
    actual = to_pdf(grouped_distinct_count(
        ds, keys=["event_type"], member_col="user_id", out_col="n_users"
    ))
    expected = ddb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n_users "
        f"FROM '{EVENTS}' GROUP BY 1"
    ).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)


def test_top_k_deterministic_tie_break():
    """Equal counts rank by member ascending, stably, across any blocking."""
    from s_tsfe_dl_ray.stages.distinct import grouped_top_k

    rows = (
        [{"k": "a", "m": "x"}] * 3 + [{"k": "a", "m": "y"}] * 3
        + [{"k": "a", "m": "z"}] * 1 + [{"k": "b", "m": "z"}] * 2
        + [{"k": "b", "m": "w"}] * 2
    )
    ds = ray.data.from_items(rows).repartition(5)
    out = to_pdf(grouped_top_k(
        ds, keys=["k"], member_col="m", k=2, count_col="n", rank_col="rank"
    )).sort_values(["k", "rank"]).reset_index(drop=True)
    expected = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "m": ["x", "y", "w", "z"],  # ties (3,3) and (2,2) break member-asc
        "n": [3, 3, 2, 2],
        "rank": [1, 2, 1, 2],
    })
    assert_frames_match(out, expected, atol=0, rtol=0, check_kind=True)


def test_hll_accuracy_vs_exact():
    """Sketch estimate within the p=10 error envelope on real groups, and
    near-exact in the linear-counting regime (small cardinalities)."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.distinct import (
        grouped_distinct_approx, grouped_distinct_count,
    )

    ds = read_table(EVENTS, columns=["user_id", "event_type"])
    exact = to_pdf(grouped_distinct_count(
        ds, keys=["event_type"], member_col="user_id", out_col="n"
    )).set_index("event_type")["n"]
    approx = to_pdf(grouped_distinct_approx(
        read_table(EVENTS, columns=["user_id", "event_type"]),
        keys=["event_type"], member_col="user_id", out_col="n", p=10,
    )).set_index("event_type")["n"]
    assert set(exact.index) == set(approx.index)
    rel = (approx - exact).abs() / exact
    # 1.04/sqrt(1024) ≈ 3.2% std error; 5 sigma headroom for small groups
    assert (rel < 0.17).all(), rel.sort_values()


def test_hll_partial_state_is_bounded():
    """A hot key's sketch partials never exceed 2**p rows per batch — the
    property that makes this the web-scale path."""
    from s_tsfe_dl_ray.stages.distinct import _hll_rho

    members = pa.array([f"m{i}" for i in range(100_000)])
    bucket, rho = _hll_rho(members, p=8)
    assert bucket.min() >= 0 and bucket.max() < 256
    assert rho.min() >= 1 and rho.max() <= 64 - 8 + 1
    assert len(np.unique(bucket)) <= 256


def test_merge_partials_equals_direct_rollup():
    """finalize(merge(rollup(A), rollup(B))) == finalize(rollup(A ∪ B)) for
    an arbitrary split — the continuous-aggregate refresh invariant."""
    from s_tsfe_dl_ray.pipelines.events_rollup import EVENTS_SPEC
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.rollup import finalize, merge_partials, rollup_partial

    cols = ["user_id", "ts", "value"]
    full = read_table(EVENTS, columns=cols)
    direct = to_pdf(finalize(rollup_partial(full, EVENTS_SPEC, "1h"), EVENTS_SPEC))

    import pyarrow.compute as pc

    def half(keep_even: bool):
        ds = read_table(EVENTS, columns=["event_id"] + cols)

        def f(t: pa.Table) -> pa.Table:
            even = pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)
            return t.filter(even if keep_even else pc.invert(even)).select(cols)

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    merged = to_pdf(finalize(
        merge_partials(
            [rollup_partial(half(True), EVENTS_SPEC, "1h"),
             rollup_partial(half(False), EVENTS_SPEC, "1h")],
            EVENTS_SPEC,
        ),
        EVENTS_SPEC,
    ))
    # float sums re-associate across the split: compare to tight tolerance
    assert_frames_match(merged, direct, atol=1e-9, rtol=1e-12)


def test_merge_partials_empty_side():
    """Merging with an empty delta is an identity (first run of a
    continuous aggregate)."""
    from s_tsfe_dl_ray.pipelines.events_rollup import EVENTS_SPEC
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.rollup import finalize, merge_partials, rollup_partial

    import pyarrow.compute as pc

    cols = ["user_id", "ts", "value"]
    full = rollup_partial(read_table(EVENTS, columns=cols), EVENTS_SPEC, "1h")
    empty = rollup_partial(
        read_table(EVENTS, columns=cols).map_batches(
            lambda t: t.filter(pc.is_null(t["user_id"])),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        EVENTS_SPEC, "1h",
    )
    merged = to_pdf(finalize(merge_partials([full, empty], EVENTS_SPEC), EVENTS_SPEC))
    direct = to_pdf(finalize(
        rollup_partial(read_table(EVENTS, columns=cols), EVENTS_SPEC, "1h"), EVENTS_SPEC
    ))
    assert_frames_match(merged, direct, atol=0, rtol=0)


def test_heavy_hitters_bounds(ddb):
    """Misra-Gries guarantees against the exact count: every reported
    item has count_lo <= true <= count_hi, and every TRUE heavy hitter
    (count > corpus/capacity) is reported with correct ordering for the
    unambiguous head."""
    from s_tsfe_dl_ray.stages.distinct import heavy_hitters
    from s_tsfe_dl_ray.stages.text import explode_tokens
    from s_tsfe_dl_ray.sources.parquet import read_table

    DOCS = f"{SF_CHECK}/documents.parquet"
    docs = read_table(DOCS, columns=["doc_id", "text"]).repartition(16)
    toks = explode_tokens(docs)
    out = to_pdf(heavy_hitters(toks, col="token", capacity=256, k=10))
    exact = ddb.sql(f"""
        SELECT tok AS token, count(*)::BIGINT AS n FROM (
          SELECT unnest(string_split(trim(text), ' ')) AS tok FROM '{DOCS}'
        ) WHERE tok <> '' GROUP BY 1
    """).df().set_index("token")["n"]
    assert len(out) == 10
    total = int(exact.sum())
    for _, r in out.iterrows():
        true = int(exact.get(r.token, 0))
        assert r.count_lo <= true <= r.count_hi, (r.token, r.count_lo, true, r.count_hi)
    # any token with true count > total/capacity must be reported
    # (restrict to the top-10 the sketch was asked for)
    hot = exact[exact > total // 256].sort_values(ascending=False)
    for tok in hot.index[: min(3, len(hot))]:
        assert tok in set(out.token), f"true heavy hitter {tok} missing"


def test_heavy_hitters_exact_when_under_capacity():
    """A universe smaller than capacity is EXACT: count_lo == count_hi
    == true count, zero error, under any blocking."""
    from s_tsfe_dl_ray.stages.distinct import heavy_hitters

    df = pd.DataFrame({"w": ["x"] * 7 + ["y"] * 5 + ["z"] * 2})
    out = to_pdf(heavy_hitters(
        ray.data.from_pandas(df).repartition(4), col="w", capacity=16, k=3,
    ))
    assert out.w.tolist() == ["x", "y", "z"]
    assert out.count_lo.tolist() == [7, 5, 2]
    assert out.count_hi.tolist() == [7, 5, 2]


def test_benford_profile_golden():
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.distinct import benford_profile

    df = pd.DataFrame({
        "event_type": ["a"] * 6 + ["b"] * 2,
        # scaled ints: 100,1999,30000,105,12,0 -> digits 1,1,3,1,1,(drop)
        "value": [1.0, 19.99, 300.0, 1.05, 0.12, 0.0, 9.0, 0.9],
    })
    out = benford_profile(ray.data.from_pandas(df), group_col="event_type",
                          value_col="value").to_pandas()
    out = out.set_index(["event_type", "digit"])
    assert out.loc[("a", 1), "n"] == 4
    assert out.loc[("a", 3), "n"] == 1
    assert abs(out.loc[("a", 1), "frac"] - 4 / 5) < 1e-12
    assert abs(out.loc[("a", 1), "benford_p"] - np.log10(2)) < 1e-12
    # b: 9.0 -> digit 9; 0.9 -> scaled 90 -> digit 9
    assert out.loc[("b", 9), "n"] == 2
    assert len(out) == 3


def test_key_skew_profile_golden():
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.distinct import key_skew_profile

    # keys: a×6, b×2, c×1, d×1 -> rows 10, K=4
    df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 2 + ["c", "d"]})
    out = key_skew_profile(ray.data.from_pandas(df), key="k").to_pandas()
    r = out.iloc[0]
    assert r["n_keys"] == 4 and r["n_rows"] == 10
    assert r["max_per_key"] == 6
    # sorted counts [1,1,2,6]; p50: ceil(4*.5)=2nd -> 1; p99: ceil(3.96)=4th -> 6
    assert r["p50_per_key"] == 1 and r["p99_per_key"] == 6
    assert abs(r["top1_share"] - 0.6) < 1e-12
    assert abs(r["hhi"] - (36 + 4 + 1 + 1) / 100) < 1e-12


def test_count_min_sketch_guarantees():
    import numpy as np
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.stages.distinct import count_min_sketch

    rng = np.random.default_rng(31)
    # zipf-ish: a few heavy items over a long tail
    vals = np.concatenate([
        np.repeat(["hot_a", "hot_b"], [3000, 1200]),
        [f"tail{i}" for i in rng.integers(0, 5000, 6000)],
    ])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals.astype("U"), pa.string())})
    items = ["hot_a", "hot_b", "tail1", "never_seen"]
    exact = {x: int((vals == x).sum()) for x in items}
    out = count_min_sketch(
        ray.data.from_arrow(t).repartition(6), col="v",
        query_items=items, width=2048, depth=4,
    ).to_pandas().set_index("item")["est_count"]
    n = len(vals)
    for x in items:
        assert out[x] >= exact[x]                       # never undercounts
        assert out[x] <= exact[x] + (2 * n) // 2048 + 1  # CM overcount bound
    # heavy items are estimated nearly exactly at this width
    assert out["hot_a"] - exact["hot_a"] <= 30
