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
