"""Distributed evaluation metrics (stages/metrics.py): confusion-matrix
aggregate and exact mid-rank AUC, including tie handling and degenerate
class cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from conftest import to_pdf


def test_auc_hand_cases():
    """Perfect separation -> 1; reversed -> 0; all-tied scores -> 0.5;
    a known small mixed case matches the pairwise definition."""
    from s_tsfe_dl_ray.stages.metrics import auc_roc

    def auc_of(scores, labels, nblocks=3):
        df = pd.DataFrame({"s": scores, "y": labels})
        out = to_pdf(auc_roc(
            ray.data.from_pandas(df).repartition(nblocks),
            score_col="s", label_col="y"))
        return float(out.auc.iloc[0])

    assert auc_of([1.0, 2.0, 3.0, 4.0], [False, False, True, True]) == 1.0
    assert auc_of([1.0, 2.0, 3.0, 4.0], [True, True, False, False]) == 0.0
    assert auc_of([5.0] * 6, [True, False] * 3) == 0.5
    # mixed with a tie: pairwise P(s+ > s-) + 0.5 P(s+ = s-)
    scores = [1.0, 2.0, 2.0, 3.0]
    labels = [False, False, True, True]
    # pairs (pos, neg): (2,1)>, (2,2)=, (3,1)>, (3,2)> -> (3 + 0.5)/4
    np.testing.assert_allclose(auc_of(scores, labels), 3.5 / 4)


def test_auc_matches_rank_reference_multiblock():
    """Histogram-merged AUC equals the direct mid-rank computation on a
    random corpus split across many blocks."""
    from s_tsfe_dl_ray.stages.metrics import auc_roc

    rng = np.random.default_rng(5)
    n = 5000
    y = rng.random(n) < 0.3
    # quantized scores -> plenty of ties
    s = np.round(rng.normal(0, 1, n) + y * 0.8, 1)
    out = to_pdf(auc_roc(
        ray.data.from_pandas(pd.DataFrame({"s": s, "y": y})).repartition(16),
        score_col="s", label_col="y"))
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(n)
    sorted_s = s[order]
    i = 0
    rank_vals = np.arange(1, n + 1, dtype=np.float64)
    while i < n:
        j = i
        while j < n and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = rank_vals[i:j].mean()
        i = j
    n_pos = y.sum()
    expected = (ranks[y].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * (n - n_pos))
    np.testing.assert_allclose(out.auc.iloc[0], expected, rtol=1e-12)
    assert out.n_pos.iloc[0] == n_pos and out.n_neg.iloc[0] == n - n_pos


def test_binary_metrics_counts_and_degenerate():
    from s_tsfe_dl_ray.stages.metrics import binary_metrics

    df = pd.DataFrame({
        "s": [0.9, 0.8, 0.3, 0.7, 0.1, 0.6],
        "y": [True, False, True, True, False, False],
    })
    out = to_pdf(binary_metrics(
        ray.data.from_pandas(df).repartition(3),
        score_col="s", label_col="y", threshold=0.5))
    r = out.iloc[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 2, 1, 1)
    np.testing.assert_allclose(r.precision, 0.5)
    np.testing.assert_allclose(r.recall, 2 / 3)
    np.testing.assert_allclose(r.f1, 2 * 0.5 * (2 / 3) / (0.5 + 2 / 3))
    np.testing.assert_allclose(r.accuracy, 0.5)
    # degenerate: no predicted positives -> precision NULL
    out2 = to_pdf(binary_metrics(
        ray.data.from_pandas(df), score_col="s", label_col="y",
        threshold=100.0))
    assert np.isnan(out2.precision.iloc[0])


def test_calibration_bins_semantics():
    """Under/overflow bins, per-bin means, multi-block merge."""
    from s_tsfe_dl_ray.stages.metrics import calibration_bins

    df = pd.DataFrame({
        "s": [-0.1, 0.05, 0.15, 0.15, 1.0, 0.95],
        "y": [True, False, True, False, True, True],
    })
    out = to_pdf(calibration_bins(
        ray.data.from_pandas(df).repartition(3),
        score_col="s", label_col="y", n_bins=10,
    )).set_index("bin")
    assert out.index.tolist() == [0, 1, 2, 10, 11]
    assert out.loc[0, "n_rows"] == 1 and out.loc[0, "positive_rate"] == 1.0
    assert out.loc[2, "n_rows"] == 2
    np.testing.assert_allclose(out.loc[2, "mean_score"], 0.15)
    np.testing.assert_allclose(out.loc[2, "positive_rate"], 0.5)
    assert out.loc[11, "n_rows"] == 1  # s >= hi overflow


def test_top_n_per_key_ties():
    from s_tsfe_dl_ray.stages.transform import top_n_per_key

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"],
        "v": [5.0, 9.0, 9.0, 1.0, 3.0],
        "id": [1, 2, 3, 4, 5],
    })
    out = to_pdf(top_n_per_key(
        ray.data.from_pandas(df).repartition(2),
        key="k", score_col="v", n=2, tiebreak_col="id",
    )).sort_values(["k", "id"]).reset_index(drop=True)
    assert out[out.k == "a"].id.tolist() == [2, 3]  # tie -> lower id first
    assert out[out.k == "b"].id.tolist() == [5]


def test_isotonic_calibration_pools_violators_and_preserves_mass():
    import numpy as np
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.metrics import isotonic_calibration

    # score 1: 4/5 positive, score 2: 1/5, score 3: 9/10
    s = [1.0] * 5 + [2.0] * 5 + [3.0] * 10
    y = [True] * 4 + [False] + [True] + [False] * 4 + [True] * 9 + [False]
    ds = ray.data.from_arrow(pa.table({
        "score": pa.array(s, pa.float64()),
        "label": pa.array(y, pa.bool_())}))
    out = isotonic_calibration(ds, score_col="score",
                               label_col="label").to_pandas()
    np.testing.assert_allclose(out["calibrated"].to_numpy(),
                               [0.5, 0.5, 0.9])
    # monotone + mass preserved
    assert (np.diff(out["calibrated"].to_numpy()) >= 0).all()
    assert float((out["calibrated"] * out["n"]).sum()) == float(
        out["n_pos"].sum())


def test_isotonic_calibration_monotone_input_is_identity_rates():
    import numpy as np
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.metrics import isotonic_calibration

    rng = np.random.default_rng(5)
    scores = np.repeat(np.arange(1, 6, dtype=float), 40)
    rates = {1: 0.1, 2: 0.3, 3: 0.5, 4: 0.7, 5: 0.9}
    labels = np.concatenate([
        (np.arange(40) < int(rates[i] * 40)) for i in range(1, 6)])
    ds = ray.data.from_arrow(pa.table({
        "score": pa.array(scores), "label": pa.array(labels)}))
    out = isotonic_calibration(ds, score_col="score",
                               label_col="label").to_pandas()
    np.testing.assert_allclose(out["calibrated"].to_numpy(),
                               [0.1, 0.3, 0.5, 0.7, 0.9])
    ds_empty = ray.data.from_arrow(pa.table({
        "score": pa.array([], pa.float64()),
        "label": pa.array([], pa.bool_())}))
    assert len(isotonic_calibration(ds_empty, score_col="score",
                                    label_col="label").to_pandas()) == 0
