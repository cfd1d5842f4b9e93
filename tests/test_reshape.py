"""Reshape + quality ops: unpivot (melt), rolling median (incl. salted
mega-key parity), per-document token entropy edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from conftest import SF_CHECK, to_pdf

EVENTS = f"{SF_CHECK}/events.parquet"


def test_unpivot_round_trip():
    """melt of a wide frame: one row per (input row × value col), labels
    and values aligned, keys repeated; int+float melt via cast_to."""
    import pyarrow as pa

    from s_tsfe_dl_ray.stages.transform import unpivot

    wide = pd.DataFrame({
        "k": ["a", "b"],
        "m1": [1.5, 2.5],
        "m2": [10, 20],
    })
    out = to_pdf(unpivot(
        ray.data.from_pandas(wide), keys=["k"], value_cols=["m1", "m2"],
        cast_to=pa.float64(),
    )).sort_values(["k", "variable"]).reset_index(drop=True)
    assert out.columns.tolist() == ["k", "variable", "value"]
    assert out["k"].tolist() == ["a", "a", "b", "b"]
    assert out["variable"].tolist() == ["m1", "m2", "m1", "m2"]
    assert out["value"].tolist() == [1.5, 10.0, 2.5, 20.0]


def test_unpivot_requires_value_cols():
    import pytest

    from s_tsfe_dl_ray.stages.transform import unpivot

    with pytest.raises(ValueError):
        unpivot(ray.data.range(1), keys=["id"], value_cols=[])


def test_rolling_median_salted_parity():
    """Salted mega-key rolling median == unsalted EXACTLY (order
    statistics carry no accumulator drift across chunk boundaries)."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.transform import rolling_median

    kw = dict(keys=["user_id"], order_by=["ts", "event_id"],
              col="value", window=5, out_col="med5")
    cols = ["event_id", "user_id", "ts", "value"]
    base = to_pdf(rolling_median(read_table(EVENTS, columns=cols), **kw)) \
        .sort_values("event_id").reset_index(drop=True)
    salted = to_pdf(rolling_median(
        read_table(EVENTS, columns=cols), **kw,
        salt_every_us=2 * 86_400_000_000,
    )).sort_values("event_id").reset_index(drop=True)
    assert len(base) == len(salted) > 0
    np.testing.assert_array_equal(base.med5.to_numpy(), salted.med5.to_numpy())


def test_token_entropy_hand_cases():
    """Hand-computed entropies: uniform tokens = ln(k); constant doc = 0;
    blank doc = 0 tokens + NULL entropy; extra whitespace ignored."""
    from s_tsfe_dl_ray.stages.text import token_entropy

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "x x x x", "  ", "a  a b"],
    })
    out = to_pdf(token_entropy(ray.data.from_pandas(docs))) \
        .set_index("doc_id").sort_index()
    assert out.n_tokens.tolist() == [4, 4, 0, 3]
    np.testing.assert_allclose(out.loc[1, "token_entropy"], np.log(4), atol=1e-12)
    np.testing.assert_allclose(out.loc[2, "token_entropy"], 0.0, atol=1e-12)
    assert np.isnan(out.loc[3, "token_entropy"])
    # p = (2/3, 1/3)
    h = -(2 / 3) * np.log(2 / 3) - (1 / 3) * np.log(1 / 3)
    np.testing.assert_allclose(out.loc[4, "token_entropy"], h, atol=1e-12)


def test_grouping_sets_multiblock(ddb):
    """All three granularities from one pass match GROUP BY GROUPING SETS
    exactly across 16 input blocks; bitmask follows SQL GROUPING order."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.grouping import grouping_sets
    from conftest import assert_frames_match

    ds = read_table(EVENTS, columns=["user_id", "event_type", "value"]) \
        .repartition(16)
    actual = to_pdf(grouping_sets(
        ds, keys=["user_id", "event_type"],
        sets=[["user_id", "event_type"], ["user_id"], []],
        value_col="value", sentinels={"user_id": -1, "event_type": ""},
        count_alias="n_events",
    ))
    expected = ddb.sql(f"""
        SELECT coalesce(user_id, -1) AS user_id,
               coalesce(event_type, '') AS event_type,
               GROUPING(user_id, event_type)::BIGINT AS grouping_id,
               count(*)::BIGINT AS n_events, sum(value) AS value_sum
        FROM '{EVENTS}'
        GROUP BY GROUPING SETS ((user_id, event_type), (user_id), ())
    """).df()
    assert_frames_match(actual, expected, atol=1e-6, rtol=1e-9)
    assert set(actual.grouping_id) == {0, 1, 3}


def test_grouping_sets_validation():
    import pytest

    from s_tsfe_dl_ray.stages.grouping import grouping_sets

    with pytest.raises(ValueError):
        grouping_sets(ray.data.range(1), keys=["a"], sets=[["b"]],
                      value_col="v", sentinels={"a": -1})
    with pytest.raises(ValueError):
        grouping_sets(ray.data.range(1), keys=["a"], sets=[["a"]],
                      value_col="v", sentinels={})


def test_bm25_sanity():
    """More matching terms -> higher score; no matching term -> no row;
    rarer term outweighs a common one at equal tf."""
    from s_tsfe_dl_ray.stages.text import bm25_score

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta",          # both query terms? no: one
            "alpha alpha beta beta gamma",     # both, higher tf
            "delta epsilon zeta eta",          # none
            "beta delta delta delta",          # rare term only
        ],
    })
    # 'alpha' appears in 2 docs, 'beta' in 3 -> alpha is rarer
    out = to_pdf(bm25_score(
        ray.data.from_pandas(docs).repartition(2),
        query_terms=["alpha", "beta"],
    )).set_index("doc_id").sort_index()
    assert 3 not in out.index
    assert out.loc[2, "bm25"] > out.loc[1, "bm25"]
    assert out.loc[1, "bm25"] > 0 and out.loc[4, "bm25"] > 0


def test_percent_rank_ties_and_singletons():
    """Min-rank tie semantics (both tied rows share the lower rank) and
    0 for single-row keys, under multi-block input."""
    from s_tsfe_dl_ray.stages.transform import percent_rank

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["solo"],
        "v": [10.0, 20.0, 20.0, 30.0, 40.0, 7.0],
        "id": range(6),
    })
    out = to_pdf(percent_rank(
        ray.data.from_pandas(df).repartition(3), key="k", value_col="v",
    )).sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(
        out.pct_rank.tolist(), [0.0, 0.25, 0.25, 0.75, 1.0, 0.0])


def test_json_extract_scalar_lenient():
    """Missing keys and malformed JSON yield NULL; valid values extract
    and cast vectorized."""
    import pyarrow as pa

    from s_tsfe_dl_ray.stages.transform import json_extract_scalar

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "js": ['{"k": 7}', '{"x": 1}', 'not json', '{"k": -3}'],
    })
    out = to_pdf(json_extract_scalar(
        ray.data.from_pandas(df).repartition(2),
        col="js", path="$.k", out_col="k", cast_to=pa.int64(),
    )).sort_values("id").reset_index(drop=True)
    assert out.columns.tolist() == ["id", "k"]
    assert out.k.tolist()[0] == 7 and out.k.tolist()[3] == -3
    assert pd.isna(out.k.iloc[1]) and pd.isna(out.k.iloc[2])
