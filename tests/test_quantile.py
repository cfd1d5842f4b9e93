"""Exact distributed quantiles (stages/quantile.py) against DuckDB's
quantile_disc on random data, including boundary qs and single-row keys."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from conftest import SF_CHECK, to_pdf


def _run(df: pd.DataFrame, quantiles, keys=("k",), value_col="v") -> pd.DataFrame:
    from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

    out = grouped_quantiles(
        rd.from_pandas(df), value_col=value_col, keys=list(keys),
        quantiles=quantiles, num_partitions=8,
    ).to_pandas()
    return out.sort_values(list(keys)).reset_index(drop=True)


def _oracle(df: pd.DataFrame, quantiles, keys=("k",), value_col="v") -> pd.DataFrame:
    cols = ", ".join(
        f"quantile_disc({value_col}, {q}) AS c{i}" for i, q in enumerate(quantiles)
    )
    kl = ", ".join(keys)
    con = duckdb.connect()
    con.register("t", df)
    return con.sql(
        f"SELECT {kl}, {cols} FROM t GROUP BY {kl} ORDER BY {kl}"
    ).df()


def test_quantiles_match_duckdb_random_ints():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 5000),
        "v": rng.integers(0, 300, 5000),
    })
    qs = (0.5, 0.95, 0.99)
    got = _run(df, qs)
    exp = _oracle(df, qs)
    for i, col in enumerate(["q_50", "q_95", "q_99"]):
        assert got[col].tolist() == exp[f"c{i}"].tolist(), col
    assert got["q_50"].dtype == np.int64  # discrete quantile keeps the dtype


def test_quantiles_boundaries_and_tiny_keys():
    # q=0 → min, q=1 → max; keys with 1 row return that row's value
    df = pd.DataFrame({
        "k": ["x"] * 10 + ["solo"],
        "v": list(range(10)) + [42],
    })
    got = _run(df, (0.0, 1.0))
    exp = _oracle(df, (0.0, 1.0))
    assert got["q_0"].tolist() == exp["c0"].tolist() == [42, 0]
    assert got["q_100"].tolist() == exp["c1"].tolist() == [42, 9]


def test_quantiles_float_values_bit_exact():
    # discrete selection (no interpolation) must reproduce floats exactly
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.choice(["p", "q"], 800),
        "v": np.round(rng.normal(0, 10, 800), 3),  # quantized floats
    })
    got = _run(df, (0.25, 0.5, 0.75))
    exp = _oracle(df, (0.25, 0.5, 0.75))
    for i, col in enumerate(["q_25", "q_50", "q_75"]):
        assert got[col].tolist() == exp[f"c{i}"].tolist(), col


def test_quantiles_duplicate_heavy_and_empty_keys_arg():
    # heavy ties: histogram path must respect cumulative counts
    df = pd.DataFrame({"k": ["z"] * 1000, "v": [5] * 990 + [9] * 10})
    got = _run(df, (0.5, 0.99, 0.995))
    exp = _oracle(df, (0.5, 0.99, 0.995))
    assert got.iloc[0, 1:].tolist() == exp.iloc[0, 1:].tolist() == [5, 5, 9]

    from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

    with pytest.raises(ValueError):
        grouped_quantiles(rd.from_pandas(df), value_col="v", keys=[])


def test_approx_quantiles_rank_envelope(ddb):
    """t-digest sketch: for every key and q, the estimate's TRUE rank is
    within 3/delta of q (empirical envelope), merged across 16 blocks."""
    import numpy as np

    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.quantile import grouped_quantiles_approx

    EVENTS = f"{SF_CHECK}/events.parquet"
    delta = 128
    ds = read_table(EVENTS, columns=["user_id", "value"]).repartition(16)
    est = to_pdf(grouped_quantiles_approx(
        ds, value_col="value", keys=["user_id"],
        quantiles=(0.5, 0.95, 0.99), delta=delta,
    )).set_index("user_id").sort_index()
    import pyarrow.parquet as pq

    raw = pq.read_table(EVENTS, columns=["user_id", "value"]).to_pandas()
    tol = 3.0 / delta
    for uid, g in raw.groupby("user_id"):
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        for q, col in [(0.5, "q_50"), (0.95, "q_95"), (0.99, "q_99")]:
            e = est.loc[uid, col]
            rank = np.searchsorted(v, e, side="right") / n
            assert abs(rank - q) <= tol + 1.0 / n, (uid, q, rank)


def test_approx_quantiles_exact_small_key():
    """A key with fewer values than delta centroids reproduces exact
    order statistics at q=0/1 and the midpoint median."""
    import numpy as np
    import pandas as pd
    import ray

    from s_tsfe_dl_ray.stages.quantile import grouped_quantiles_approx

    df = pd.DataFrame({"k": ["a"] * 101, "v": np.arange(101, dtype=np.float64)})
    out = to_pdf(grouped_quantiles_approx(
        ray.data.from_pandas(df).repartition(1), value_col="v", keys=["k"],
        quantiles=(0.0, 0.5, 1.0), delta=512,
    ))
    assert out.q_0.iloc[0] == 0.0
    np.testing.assert_allclose(out.q_50.iloc[0], 50.0, atol=0.5)
    assert out.q_100.iloc[0] == 100.0


def test_value_profile_matches_duckdb_random_money():
    from s_tsfe_dl_ray.stages.quantile import grouped_value_profile

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", "z"], 4000),
        "v": np.round(rng.normal(0.0, 5000.0, 4000), 2),
    })
    out = grouped_value_profile(
        rd.from_pandas(df), value_col="v", keys=["k"], scale=100,
        quantiles=(0.5, 0.9), num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql("""
        WITH s AS (SELECT k, CAST(round(v * 100) AS BIGINT) AS ci FROM t)
        SELECT k, count(*)::BIGINT AS n,
               (sum(ci)::DOUBLE / 100.0) / count(*)::DOUBLE AS mean,
               sum(CASE WHEN ci < 0 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE AS share_neg,
               quantile_disc(ci, 0.5)::DOUBLE / 100.0 AS q_50,
               quantile_disc(ci, 0.9)::DOUBLE / 100.0 AS q_90
        FROM s GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_kruskal_wallis_matches_duckdb_random():
    from s_tsfe_dl_ray.stages.robust import kruskal_wallis

    rng = np.random.default_rng(12)
    for shift in (0.0, 30.0):  # null + strong-effect corpora
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 3000),
            "v": np.round(rng.normal(0.0, 50.0, 3000), 2),
        })
        df.loc[df["g"] == "c", "v"] += shift
        out = kruskal_wallis(
            rd.from_pandas(df), group_col="g", value_col="v", scale=100,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        exp = con.sql("""
            WITH v AS (SELECT g, CAST(round(v*100) AS BIGINT) AS ci FROM t),
            r AS (SELECT g, ci, AVG(rn) OVER (PARTITION BY ci) AS mr
                  FROM (SELECT g, ci, row_number() OVER (ORDER BY ci)
                          AS rn FROM v) q),
            pg AS (SELECT g, count(*)::DOUBLE AS n_g, sum(mr) AS rg
                   FROM r GROUP BY 1),
            ties AS (SELECT sum(c*c*c - c) AS t FROM
                     (SELECT count(*)::DOUBLE AS c FROM v GROUP BY ci) z),
            tot AS (SELECT count(*)::DOUBLE AS n,
                           count(DISTINCT g)::BIGINT AS k FROM v),
            s AS (SELECT list_reduce(list(rg*rg/n_g ORDER BY g),
                                     (a, x) -> a + x) AS s FROM pg)
            SELECT tot.n::BIGINT AS n, tot.k AS k_groups,
                   (tot.k - 1)::BIGINT AS dof,
                   12.0/(tot.n*(tot.n+1.0))*s.s - 3.0*(tot.n+1.0) AS h,
                   (12.0/(tot.n*(tot.n+1.0))*s.s - 3.0*(tot.n+1.0))
                   / (1.0 - ties.t/(tot.n*tot.n*tot.n - tot.n)) AS h_adj
            FROM tot, ties, s
        """).df()
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)
        if shift > 0:
            assert out["h_adj"].iloc[0] > 100.0


def test_kruskal_wallis_all_equal_values_null_hadj():
    from s_tsfe_dl_ray.stages.robust import kruskal_wallis

    df = pd.DataFrame({"g": ["a", "b"] * 50, "v": [7.25] * 100})
    out = kruskal_wallis(
        rd.from_pandas(df), group_col="g", value_col="v").to_pandas()
    assert out["h"].iloc[0] == 0.0
    assert pd.isna(out["h_adj"].iloc[0])
