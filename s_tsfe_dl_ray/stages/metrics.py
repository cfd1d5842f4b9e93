"""Distributed model-evaluation metrics over scored rows.

The reference's evaluation tail computes accuracy / AUC / F1 /
precision / recall from a scores array in memory (reference
experiments/keras_experiment.py:595-599); these operators compute the
same numbers exactly when the scored rows are a distributed table.

Both are single-exchange combiner aggregates:

- ``binary_metrics``: the 2×2 confusion matrix is four counts —
  per-batch partials, one tiny merge, derived metrics at finalize.
- ``auc_roc``: exact ROC-AUC via the Mann–Whitney rank form.  Global
  ranks normally need a sort; the (score → n_pos, n_neg) VALUE
  HISTOGRAM is sufficient (mid-rank of a tie group is a function of
  cumulative counts), so the exchange carries one row per distinct
  score, the same memory class as stages/quantile.grouped_quantiles —
  with the same caveat: quantize all-distinct continuous scores
  upstream (or accept histogram ≈ row count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def binary_metrics(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> Dataset:
    """Confusion counts + accuracy/precision/recall/f1 at a threshold
    (prediction = score >= threshold; label truthy = positive).  One
    row out; metrics NULL where undefined (zero denominators)."""

    def partial(t: pa.Table) -> pa.Table:
        pred = pc.greater_equal(pc.cast(t[score_col], pa.float64()),
                                pa.scalar(float(threshold)))
        lab = pc.cast(t[label_col], pa.bool_())
        p = pred.to_numpy(zero_copy_only=False)
        y = lab.to_numpy(zero_copy_only=False)
        tp = int(np.sum(p & y)); fp = int(np.sum(p & ~y))
        fn = int(np.sum(~p & y)); tn = int(np.sum(~p & ~y))
        return pa.table({"tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn]})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        tp, fp = int(df.tp.sum()), int(df.fp.sum())
        fn, tn = int(df.fn.sum()), int(df.tn.sum())
        n = tp + fp + fn + tn

        def div(a, b):
            return a / b if b else np.nan

        prec = div(tp, tp + fp)
        rec = div(tp, tp + fn)
        f1 = (2 * prec * rec / (prec + rec)
              if np.isfinite(prec) and np.isfinite(rec) and (prec + rec)
              else np.nan)
        return pd.DataFrame([{
            "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "accuracy": div(tp + tn, n),
            "precision": prec, "recall": rec, "f1": f1,
        }])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        # repartition(1) + batch_size=None ⇒ finalize sees every partial
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def auc_roc(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
) -> Dataset:
    """Exact ROC-AUC (Mann–Whitney with mid-rank tie handling):
    ``AUC = (Σ midrank(positives) − n₊(n₊+1)/2) / (n₊ n₋)`` — equal to
    P(score₊ > score₋) + ½P(score₊ = score₋).  One row out:
    ``n_pos, n_neg, auc`` (NULL when either class is empty)."""

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[label_col], pa.bool_()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=y.astype(np.float64),
                           minlength=len(uniq))
        nall = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "_s": pa.array(uniq),
            "_pos": pa.array(npos.astype(np.int64)),
            "_neg": pa.array((nall - npos).astype(np.int64)),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("_s", sort=True)[["_pos", "_neg"]].sum()
        pos = h["_pos"].to_numpy(dtype=np.float64)
        neg = h["_neg"].to_numpy(dtype=np.float64)
        cnt = pos + neg
        n_pos, n_neg = pos.sum(), neg.sum()
        if n_pos == 0 or n_neg == 0:
            auc = np.nan
        else:
            below = np.concatenate([[0.0], np.cumsum(cnt)[:-1]])
            midrank = below + (cnt + 1.0) / 2.0   # avg rank of the tie group
            rank_sum_pos = float((midrank * pos).sum())
            auc = (rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
        return pd.DataFrame([{
            "n_pos": int(n_pos), "n_neg": int(n_neg), "auc": auc,
        }])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def calibration_bins(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> Dataset:
    """Reliability table: scores bucketed into ``n_bins`` equal-width
    bins over [lo, hi]; per bin the count, mean score, and positive rate
    — the calibration diagnostic read next to AUC (does a 0.8 score
    mean 80%?).  SQL ``width_bucket`` semantics: values below ``lo``
    land in bin 0, at/above ``hi`` in bin n_bins+1, else
    1 + floor((s−lo)/w).  Pure combiner: (bin, n, Σscore, Σpos) partials
    per batch, one tiny merge.  Output: ``bin, n_rows, mean_score,
    positive_rate`` for non-empty bins, bin ascending."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    w = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[label_col], pa.bool_()).to_numpy(zero_copy_only=False)
        b = np.where(s < lo, 0,
                     np.where(s >= hi, n_bins + 1,
                              1 + np.floor((s - lo) / w))).astype(np.int64)
        k = n_bins + 2
        n = np.bincount(b, minlength=k)
        ssum = np.bincount(b, weights=s, minlength=k)
        pos = np.bincount(b, weights=y.astype(np.float64), minlength=k)
        keep = n > 0
        return pa.table({
            "bin": pa.array(np.arange(k)[keep]),
            "_n": pa.array(n[keep].astype(np.int64)),
            "_s": pa.array(ssum[keep]),
            "_p": pa.array(pos[keep].astype(np.int64)),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", sort=True).agg(
            _n=("_n", "sum"), _s=("_s", "sum"), _p=("_p", "sum")).reset_index()
        out = pd.DataFrame({
            "bin": g["bin"].astype(np.int64),
            "n_rows": g["_n"].astype(np.int64),
            "mean_score": g["_s"] / g["_n"],
            "positive_rate": g["_p"] / g["_n"],
        })
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def grouped_auc(
    ds: Dataset,
    *,
    key: str,
    score_col: str,
    label_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-segment exact ROC-AUC — the stratified-evaluation sibling of
    :func:`auc_roc` (a global AUC can hide a segment where the model is
    inverted; per-key AUC is the fairness/debug view).  Same mid-rank
    Mann–Whitney identity, same histogram discipline: per-batch
    ``(key, score) → (pos, neg)`` partials, ONE key-hash exchange, then
    a vectorized ranked fold across all keys in each partition (sorted
    cumulative counts + segment-offset subtraction — no per-key loop).

    Output: ``key, n_pos, n_neg (int64), auc`` (NULL when either class
    is empty for the key).
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64())
        y = pc.cast(pc.cast(t[label_col], pa.bool_()), pa.int64())
        base = pa.table({key: t[key], "_s": s, "_y": y})
        out = base.group_by([key, "_s"], use_threads=False).aggregate(
            [("_y", "sum"), ("_y", "count")]
        ).rename_columns([key, "_s", "_pos", "_cnt"])
        from .rollup import _stable_pkey

        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df.groupby([key, "_s"], sort=True)[["_pos", "_cnt"]]
            .sum().reset_index()
        )
        k = h[key].to_numpy()
        pos = h["_pos"].to_numpy(dtype=np.float64)
        cnt = h["_cnt"].to_numpy(dtype=np.float64)
        n = len(h)
        change = np.ones(n, dtype=bool)
        change[1:] = k[1:] != k[:-1]
        gid = np.cumsum(change) - 1
        firsts = np.flatnonzero(change)
        nk = int(gid[-1]) + 1 if n else 0
        # global running count, re-zeroed per key by subtracting the
        # key's offset — the vectorized per-key "ranks below this tie"
        cum = np.cumsum(cnt)
        below_global = np.concatenate([[0.0], cum[:-1]])
        offset = below_global[firsts]
        below = below_global - offset[gid]
        midrank = below + (cnt + 1.0) / 2.0
        rsp = np.bincount(gid, weights=midrank * pos, minlength=nk)
        n_pos = np.bincount(gid, weights=pos, minlength=nk)
        n_all = np.bincount(gid, weights=cnt, minlength=nk)
        n_neg = n_all - n_pos
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = (rsp - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
        auc = np.where((n_pos > 0) & (n_neg > 0), auc, np.nan)
        return pd.DataFrame({
            key: k[firsts],
            "n_pos": n_pos.astype(np.int64),
            "n_neg": n_neg.astype(np.int64),
            "auc": auc,
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(finalize, batch_format="pandas")
    )


def average_precision(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
) -> Dataset:
    """Exact average precision (area under the precision–recall curve,
    step-interpolated): AP = Σₛ ΔR(s)·P(s) over DISTINCT scores in
    decreasing order, where at threshold s the tie block's positives
    all enter at once — identical to scikit-learn's
    ``average_precision_score`` formula, made tie-robust by operating
    on the score histogram rather than an arbitrary within-tie order.

    Same scale shape as :func:`auc_roc`: per-batch (score → n_pos,
    n_neg) histogram partials — one row per distinct score crosses the
    exchange — and one vectorized fold computes the cumulative
    precision sweep.  PR-AUC is the metric that stays honest under
    class imbalance, where ROC-AUC saturates.  One row out:
    ``n_pos, n_neg, avg_precision`` (NULL when no positives).
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[label_col], pa.bool_()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=y.astype(np.float64),
                           minlength=len(uniq))
        nall = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "_s": pa.array(uniq),
            "_pos": pa.array(npos.astype(np.int64)),
            "_neg": pa.array((nall - npos).astype(np.int64)),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("_s", sort=True)[["_pos", "_neg"]].sum()[::-1]
        pos = h["_pos"].to_numpy(dtype=np.float64)
        neg = h["_neg"].to_numpy(dtype=np.float64)
        n_pos, n_neg = pos.sum(), neg.sum()
        if n_pos == 0:
            ap = np.nan
        else:
            tp = np.cumsum(pos)
            fp = np.cumsum(neg)
            mask = pos > 0
            ap = float(((pos[mask] / n_pos)
                        * (tp[mask] / (tp[mask] + fp[mask]))).sum())
        return pd.DataFrame([{
            "n_pos": int(n_pos), "n_neg": int(n_neg),
            "avg_precision": ap,
        }])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def multiclass_prf(
    ds: Dataset,
    *,
    true_col: str,
    pred_col: str,
) -> Dataset:
    """Per-class precision / recall / F1 from the multiclass confusion
    matrix — the k-class generalization of :func:`binary_metrics`
    (reference analog: the per-architecture sklearn classification
    report, /root/reference/experiments/arrythmia_experiment.py:200-204,
    here distributed and exact).

    Shape: per-batch ``(true, pred) → count`` combiner partials (≤ k²
    rows per batch, never raw rows), one tiny single-partition merge,
    then a vectorized per-class fold over the union of observed true and
    predicted classes.  Counts are exact int64; the metric divisions are
    a fixed expression tree mirrored by the SQL twin (zero denominators
    → NULL on both sides).

    Output: one row per class — ``class, n_true, n_pred, tp, precision,
    recall, f1`` sorted by class.
    """

    def partial(t: pa.Table) -> pa.Table:
        out = (t.select([true_col, pred_col])
               .group_by([true_col, pred_col], use_threads=False)
               .aggregate([([], "count_all")]))
        return out.rename_columns(["t", "p", "n"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "class": pd.Series([], dtype="object"),
                "n_true": pd.Series([], dtype="int64"),
                "n_pred": pd.Series([], dtype="int64"),
                "tp": pd.Series([], dtype="int64"),
                "precision": pd.Series([], dtype="float64"),
                "recall": pd.Series([], dtype="float64"),
                "f1": pd.Series([], dtype="float64")})
        m = df.groupby(["t", "p"], sort=False)["n"].sum().reset_index()
        classes = np.unique(np.concatenate([m["t"].to_numpy(),
                                            m["p"].to_numpy()]))
        ti = np.searchsorted(classes, m["t"].to_numpy())
        pi = np.searchsorted(classes, m["p"].to_numpy())
        n = m["n"].to_numpy(dtype=np.int64)
        k = len(classes)
        n_true = np.bincount(ti, weights=n, minlength=k).astype(np.int64)
        n_pred = np.bincount(pi, weights=n, minlength=k).astype(np.int64)
        diag = ti == pi
        tp = np.bincount(ti[diag], weights=n[diag],
                         minlength=k).astype(np.int64)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            prec = tp.astype(np.float64) / n_pred
            rec = tp.astype(np.float64) / n_true
            f1 = 2.0 * prec * rec / (prec + rec)
        out = pd.DataFrame({
            "class": classes,
            "n_true": n_true,
            "n_pred": n_pred,
            "tp": tp,
            "precision": prec,
            "recall": rec,
            "f1": f1})
        for c in ("precision", "recall", "f1"):
            v = out[c].to_numpy()
            out[c] = np.where(np.isfinite(v), v, np.nan)
        return out.sort_values("class").reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def ab_ztest(
    ds: Dataset,
    *,
    unit_col: str,
    success_col: str,
    split_fraction: float = 0.5,
    num_partitions: int = 64,
) -> Dataset:
    """Two-proportion z-test over a DETERMINISTIC hash split — the A/B
    experiment readout: units are assigned to arm B when the first 4
    hex digits of md5(unit) fall below the fraction (the engine's
    standard order-independent split, stages/transform.hash_split), a
    unit converts when ANY of its rows has a truthy ``success_col``,
    and the pooled two-proportion z statistic compares the arms.

    Shape: per-batch (unit, converted) partials → one unit-hash
    exchange dedups units exactly → four counts → one row.  Counts are
    exact ints and the z formula is a fixed expression tree mirrored by
    the SQL twin (hex-string threshold compare == numeric compare for
    fixed-width lowercase hex).  Degenerate arms (empty, or zero pooled
    variance) go NULL via 0-division on both sides.

    Output: one row — ``n_a, n_b, conv_a, conv_b, rate_a, rate_b, z``.
    """
    import hashlib

    from .rollup import _stable_pkey

    cut_hex = format(int(split_fraction * 65536), "04x")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({unit_col: pd.Series([], dtype="object"),
                                 "conv": pd.Series([], dtype="bool")})
        g = df.groupby(unit_col, sort=False)[success_col].any()
        return pd.DataFrame({unit_col: g.index.to_numpy(),
                             "conv": g.to_numpy()})

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey", _stable_pkey(t[unit_col], num_partitions))

    def count_arm(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("n_a", "n_b", "conv_a",
                                           "conv_b")})
        g = df.groupby(unit_col, sort=False)["conv"].any()
        units = g.index.to_numpy()
        conv = g.to_numpy()
        is_b = np.array([
            hashlib.md5(str(u).encode()).hexdigest()[:4] < cut_hex
            for u in units])
        return pd.DataFrame({
            "n_a": [int((~is_b).sum())],
            "n_b": [int(is_b.sum())],
            "conv_a": [int((conv & ~is_b).sum())],
            "conv_b": [int((conv & is_b).sum())]})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "n_a" not in df.columns:
            df = pd.DataFrame({c: [0] for c in ("n_a", "n_b", "conv_a",
                                                "conv_b")})
        s = df.sum()
        n_a, n_b = np.float64(s["n_a"]), np.float64(s["n_b"])
        c_a, c_b = np.float64(s["conv_a"]), np.float64(s["conv_b"])
        with np.errstate(invalid="ignore", divide="ignore"):
            rate_a = c_a / n_a
            rate_b = c_b / n_b
            pool = (c_a + c_b) / (n_a + n_b)
            z = (rate_a - rate_b) / np.sqrt(
                pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b))
        vals = [v if np.isfinite(v) else np.nan
                for v in (rate_a, rate_b, z)]
        return pd.DataFrame({
            "n_a": pd.Series([int(s["n_a"])], dtype="int64"),
            "n_b": pd.Series([int(s["n_b"])], dtype="int64"),
            "conv_a": pd.Series([int(s["conv_a"])], dtype="int64"),
            "conv_b": pd.Series([int(s["conv_b"])], dtype="int64"),
            "rate_a": [vals[0]], "rate_b": [vals[1]], "z": [vals[2]]})

    per_unit = (ds.map_batches(partial, batch_format="pandas")
                .map_batches(add_pkey, batch_format="pyarrow")
                .groupby("_pkey")
                .map_groups(lambda d: count_arm(d.drop(columns=["_pkey"])),
                            batch_format="pandas"))
    return per_unit.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def isotonic_calibration(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
) -> Dataset:
    """Isotonic (PAV) score calibration: the monotone-nondecreasing map
    score → P(label) that minimizes squared error — the nonparametric
    upgrade of the fixed-bin :func:`calibration_bins` (which can zigzag)
    and the standard post-hoc calibrator for model scores.

    Shape: the AUC value-histogram discipline — per-batch
    ``(score → n, n_pos)`` partials cross one exchange (one row per
    distinct score; quantize continuous scores upstream), then the
    pool-adjacent-violators fold runs once over the sorted histogram
    (O(distinct scores), stack-based).  Deterministic: exact integer
    weights, pooling arithmetic is plain float on exact ints.

    Output: ``score (float64), n (int64), n_pos (int64), calibrated
    (float64)`` ascending by score, ``calibrated`` monotone
    nondecreasing with Σ calibrated·n == Σ n_pos (mass preserved).  No
    SQL twin (sequential pooling); tests pin monotonicity, mass
    preservation, and a hand-computed pooling golden.
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64())
        y = pc.cast(pc.cast(t[label_col], pa.bool_()), pa.int64())
        out = (pa.table({"s": s, "y": y})
               .group_by(["s"], use_threads=False)
               .aggregate([("y", "sum"), ([], "count_all")]))
        return out.rename_columns(["s", "np", "n"])

    def pav(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "score": pd.Series([], dtype="float64"),
            "n": pd.Series([], dtype="int64"),
            "n_pos": pd.Series([], dtype="int64"),
            "calibrated": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("s", sort=True).agg(
            np=("np", "sum"), n=("n", "sum")).reset_index()
        s = g["s"].to_numpy(dtype=np.float64)
        w = g["n"].to_numpy(dtype=np.float64)
        pos = g["np"].to_numpy(dtype=np.float64)
        # stack of pooled blocks: (weight, pos_mass, end_index)
        bw, bp, be = [], [], []
        for i in range(len(s)):
            cw, cp = w[i], pos[i]
            while bw and bp[-1] * cw >= cp * bw[-1]:
                # previous block mean >= current -> pool (>= keeps ties
                # in one block, deterministic)
                cw += bw.pop()
                cp += bp.pop()
                be.pop()
            bw.append(cw)
            bp.append(cp)
            be.append(i)
        cal = np.empty(len(s))
        start = 0
        for wgt, pm, end in zip(bw, bp, be):
            cal[start:end + 1] = pm / wgt
            start = end + 1
        return pd.DataFrame({
            "score": s,
            "n": g["n"].to_numpy(dtype=np.int64),
            "n_pos": g["np"].to_numpy(dtype=np.int64),
            "calibrated": cal})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(pav, batch_format="pandas",
                                               batch_size=None)


def cuped_ab(
    ds: Dataset,
    *,
    unit_col: str,
    ts_col: str,
    split_fraction: float = 0.5,
    num_partitions: int = 64,
) -> Dataset:
    """CUPED variance-reduced A/B readout on activity counts: the
    pre-period covariate (each unit's row count before the corpus time
    midpoint) absorbs between-unit variance from the post-period metric
    (row count after the midpoint), shrinking the arm-difference
    variance by 1 − ρ² — the modern experimentation upgrade of
    :func:`ab_ztest`'s raw comparison.

        θ = cov(x, y)/var(x)  (pooled),  diff_adj = Δȳ − θ·Δx̄,
        var_reduction = var(y − θx)/var(y) = 1 − ρ²

    Shape: global (min, max) ts combiner fixes the midpoint; per-unit
    (x, y) conditional-count partials dedup through one unit-hash
    exchange; arms from the deterministic md5 split; all moments are
    exact int64 sums and the finalize expression tree is mirrored by
    the SQL twin (constant covariate → NULL θ/adj via 0-division).

    Output: one row — ``n_a, n_b, theta, diff_raw, diff_adj,
    var_reduction``.
    """
    import hashlib

    from ..pipelines.relational import grouped_aggregate
    from .rollup import _stable_pkey

    cut_hex = format(int(split_fraction * 65536), "04x")

    def mm_part(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({"_all": pa.array([1], pa.int8()),
                         "lo": pa.array([pc.min(ts).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(ts).as_py()], pa.int64())})

    mm = grouped_aggregate(
        ds.map_batches(mm_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["_all"], aggs={"lo": ("lo", "min"), "hi": ("hi", "max")},
        num_partitions=1).to_pandas()
    empty = pd.DataFrame({
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64"),
        "theta": pd.Series([], dtype="float64"),
        "diff_raw": pd.Series([], dtype="float64"),
        "diff_adj": pd.Series([], dtype="float64"),
        "var_reduction": pd.Series([], dtype="float64")})
    if len(mm) == 0 or "lo" not in mm.columns or mm["lo"].isna().all():
        import ray.data

        return ray.data.from_pandas(empty)
    mid = (int(mm["lo"].iloc[0]) + int(mm["hi"].iloc[0])) // 2

    def xy_part(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        pre = pc.cast(pc.less(ts, pa.scalar(mid, pa.int64())), pa.int64())
        post = pc.subtract(pa.scalar(1, pa.int64()), pre)
        out = (pa.table({unit_col: t[unit_col], "x": pre, "y": post})
               .group_by([unit_col], use_threads=False)
               .aggregate([("x", "sum"), ("y", "sum")]))
        out = out.rename_columns([unit_col, "x", "y"])
        return out.append_column(
            "_pkey", _stable_pkey(out[unit_col], num_partitions))

    def unit_moments(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("n", "sx", "sy", "sxx", "sxy", "syy",
                "n_a", "n_b", "sxa", "sya", "sxb", "syb")
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        g = df.groupby(unit_col, sort=False).agg(
            x=("x", "sum"), y=("y", "sum")).reset_index()
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        is_b = np.array([
            hashlib.md5(str(u).encode()).hexdigest()[:4] < cut_hex
            for u in g[unit_col].to_numpy()])
        return pd.DataFrame({
            "n": [len(g)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x * x).sum())], "sxy": [int((x * y).sum())],
            "syy": [int((y * y).sum())],
            "n_a": [int((~is_b).sum())], "n_b": [int(is_b.sum())],
            "sxa": [int(x[~is_b].sum())], "sya": [int(y[~is_b].sum())],
            "sxb": [int(x[is_b].sum())], "syb": [int(y[is_b].sum())]})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "n" not in df.columns:
            return empty
        s = df.sum()
        n = np.float64(s["n"])
        sx, sy = np.float64(s["sx"]), np.float64(s["sy"])
        sxx, sxy, syy = (np.float64(s["sxx"]), np.float64(s["sxy"]),
                         np.float64(s["syy"]))
        n_a, n_b = np.float64(s["n_a"]), np.float64(s["n_b"])
        with np.errstate(invalid="ignore", divide="ignore"):
            cxx = sxx - sx * sx / n
            cxy = sxy - sx * sy / n
            cyy = syy - sy * sy / n
            theta = cxy / cxx
            diff_raw = np.float64(s["sya"]) / n_a \
                - np.float64(s["syb"]) / n_b
            xdiff = np.float64(s["sxa"]) / n_a \
                - np.float64(s["sxb"]) / n_b
            diff_adj = diff_raw - theta * xdiff
            var_red = (cyy - cxy * cxy / cxx) / cyy
        vals = [v if np.isfinite(v) else np.nan
                for v in (theta, diff_raw, diff_adj, var_red)]
        return pd.DataFrame({
            "n_a": pd.Series([int(s["n_a"])], dtype="int64"),
            "n_b": pd.Series([int(s["n_b"])], dtype="int64"),
            "theta": [vals[0]], "diff_raw": [vals[1]],
            "diff_adj": [vals[2]], "var_reduction": [vals[3]]})

    moments = (ds.map_batches(xy_part, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("_pkey")
               .map_groups(lambda d: unit_moments(
                   d.drop(columns=["_pkey"])), batch_format="pandas"))
    return moments.repartition(1).map_batches(fin, batch_format="pandas",
                                              batch_size=None)


def expected_calibration_error(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> Dataset:
    """ECE/MCE single-number calibration summary over the
    :func:`calibration_bins` reliability table:

        ECE = Σ_b (n_b/n) · |pos_rate_b − mean_score_b|,
        MCE = max_b |pos_rate_b − mean_score_b|

    — the headline "is the model's confidence honest" metric reported
    next to AUC.  One extra tiny fold over the bin partials; weights are
    exact integer counts, the gap arithmetic mirrors the SQL twin.
    Output: one row — ``n_rows (int64), ece (float64), mce (float64)``
    (empty input emits no row).
    """
    bins = calibration_bins(ds, score_col=score_col, label_col=label_col,
                            n_bins=n_bins, lo=lo, hi=hi)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_rows": pd.Series([], dtype="int64"),
            "ece": pd.Series([], dtype="float64"),
            "mce": pd.Series([], dtype="float64")})
        if len(df) == 0 or "n_rows" not in df.columns:
            return empty
        nb = df["n_rows"].to_numpy(dtype=np.float64)
        gap = np.abs(df["positive_rate"].to_numpy(dtype=np.float64)
                     - df["mean_score"].to_numpy(dtype=np.float64))
        n = nb.sum()
        return pd.DataFrame({
            "n_rows": pd.Series([int(n)], dtype="int64"),
            "ece": [float(((nb / n) * gap).sum())],
            "mce": [float(gap.max())]})

    return bins.repartition(1).map_batches(fin, batch_format="pandas",
                                           batch_size=None)


def brier_score(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> Dataset:
    """Brier score with the Murphy decomposition over the reliability
    bins:

        brier       = E[(s − y)²]                (exact per-row pass)
        reliability = Σ_b (n_b/n)(ms_b − pr_b)²  (miscalibration, ↓ good)
        resolution  = Σ_b (n_b/n)(pr_b − ȳ)²     (discrimination, ↑ good)
        uncertainty = ȳ(1 − ȳ)

    (brier ≈ reliability − resolution + uncertainty, exact when bin
    means are used as forecasts).  One (n, Σ(s−y)², Σy) combiner pass
    fused with the :func:`calibration_bins` partials fold; the SQL twin
    mirrors every term.  Output: one row — ``n_rows, brier,
    reliability, resolution, uncertainty``.
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[label_col], pa.bool_()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        d = s - y
        return pa.table({"n": pa.array([len(s)], pa.int64()),
                         "sq": pa.array([float((d * d).sum())]),
                         "sy": pa.array([float(y.sum())])})

    bins = calibration_bins(ds, score_col=score_col, label_col=label_col,
                            n_bins=n_bins, lo=lo, hi=hi).to_pandas()
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .repartition(1)
           .map_batches(lambda df: pd.DataFrame(
               {"n": [df["n"].sum()], "sq": [df["sq"].sum()],
                "sy": [df["sy"].sum()]}) if len(df) else df,
               batch_format="pandas", batch_size=None)
           .to_pandas())
    import ray.data

    empty = pd.DataFrame({
        "n_rows": pd.Series([], dtype="int64"),
        "brier": pd.Series([], dtype="float64"),
        "reliability": pd.Series([], dtype="float64"),
        "resolution": pd.Series([], dtype="float64"),
        "uncertainty": pd.Series([], dtype="float64")})
    if len(agg) == 0 or int(agg["n"].iloc[0]) == 0:
        return ray.data.from_pandas(empty)
    n = float(agg["n"].iloc[0])
    ybar = float(agg["sy"].iloc[0]) / n
    nb = bins["n_rows"].to_numpy(dtype=np.float64)
    ms = bins["mean_score"].to_numpy(dtype=np.float64)
    pr = bins["positive_rate"].to_numpy(dtype=np.float64)
    rel = float(((nb / n) * (ms - pr) ** 2).sum())
    res = float(((nb / n) * (pr - ybar) ** 2).sum())
    return ray.data.from_pandas(pd.DataFrame({
        "n_rows": pd.Series([int(n)], dtype="int64"),
        "brier": [float(agg["sq"].iloc[0]) / n],
        "reliability": [rel],
        "resolution": [res],
        "uncertainty": [ybar * (1.0 - ybar)]}))


def gains_table(
    ds: Dataset,
    *,
    score_col: str,
    label_col: str,
    n_tiles: int = 10,
) -> Dataset:
    """Cumulative gains / lift table: for each top-k/n_tiles fraction of
    rows ranked by score DESC, the share of all positives captured and
    the lift over random targeting — the campaign-targeting readout next
    to AUC (AUC summarizes the whole curve; the gains table answers
    "what do I get if I act on the top 20%?").

    Ties need no ordering contract: the boundary tie group contributes
    PRO-RATA (positives × taken/count), the standard continuous
    definition — so the result is deterministic from the score
    HISTOGRAM alone (the AUC partial discipline: one row per distinct
    score crosses the exchange, fold once).  The SQL twin mirrors the
    clip/pro-rata expressions exactly.

    Output: one row per tile 1..n_tiles — ``tile (int64), captured_pos
    (float64), gain (float64), lift (float64)`` (NULL gain/lift when no
    positives; empty input emits no rows).
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[label_col], pa.bool_()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(s, return_inverse=True)
        return pa.table({
            "s": pa.array(uniq),
            "c": pa.array(np.bincount(inv, minlength=len(uniq))
                          .astype(np.int64)),
            "p": pa.array(np.bincount(inv, weights=y, minlength=len(uniq))
                          .astype(np.int64))})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "tile": pd.Series([], dtype="int64"),
            "captured_pos": pd.Series([], dtype="float64"),
            "gain": pd.Series([], dtype="float64"),
            "lift": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("s", sort=True).agg(
            c=("c", "sum"), p=("p", "sum")).reset_index()
        g = g.iloc[::-1].reset_index(drop=True)       # score DESC
        c = g["c"].to_numpy(dtype=np.float64)
        p = g["p"].to_numpy(dtype=np.float64)
        before = np.cumsum(c) - c
        n = c.sum()
        npos = p.sum()
        tiles = np.arange(1, n_tiles + 1, dtype=np.int64)
        cap = np.empty(len(tiles))
        for i, k in enumerate(tiles):
            target = n * float(k) / float(n_tiles)
            take = np.minimum(np.maximum(target - before, 0.0), c)
            cap[i] = float((p * (take / c)).sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            gain = cap / npos
            lift = gain / (tiles.astype(np.float64) / float(n_tiles))
        gain = np.where(np.isfinite(gain), gain, np.nan)
        lift = np.where(np.isfinite(lift), lift, np.nan)
        return pd.DataFrame({"tile": tiles, "captured_pos": cap,
                             "gain": gain, "lift": lift})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fold, batch_format="pandas",
                                               batch_size=None)


def wilson_rate_ci(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    success_value: str,
    tier: str = "1d",
    z: float = 1.959963984540054,
    num_partitions: int = 8,
) -> Dataset:
    """Per-window event-rate with its Wilson score confidence interval —
    the monitoring staple that a raw rate ± normal-approx stderr gets
    wrong at small n or extreme p (the Wilson interval never leaves
    [0, 1] and stays calibrated at n=1).  Default ``z`` is the exact
    two-sided 95% normal quantile, embedded as the same literal in the
    SQL twin.

    Shape: one combiner fold to (window → n, successes) exact int64
    counts, then a vectorized finalize evaluating the closed form —
    a fixed float64 expression tree mirrored verbatim by the SQL twin
    (same literal, same parenthesization), so both sides compute
    bit-identical doubles.  n ≥ 1 by construction, so no 0-division
    branch exists.

    Output: ``window_start (timestamp), n_events, n_success, rate,
    ci_lo, ci_hi`` per window.

    Reference analog: the reference reports point metrics only
    (accuracy/AUC in experiments); interval-aware monitoring is the
    production upgrade (keras_experiment.py:583-593 thresholds on a
    point estimate).
    """
    from ..functions.windows import window_start_us, window_to_timestamp
    from ..pipelines.relational import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "w": window_start_us(t[ts_col], tier),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "x": pc.cast(pc.equal(t[type_col], success_value), pa.int64()),
        })

    folded = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["w"], aggs={"n": ("n", "sum"), "x": ("x", "sum")},
        num_partitions=num_partitions)

    zf = np.float64(z)
    z2 = zf * zf

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        phat = x / n
        denom = 1.0 + z2 / n
        center = (phat + z2 / (2.0 * n)) / denom
        half = zf * np.sqrt(phat * (1.0 - phat) / n
                            + z2 / (4.0 * (n * n))) / denom
        return pa.table({
            "window_start": window_to_timestamp(pc.cast(t["w"], pa.int64())),
            "n_events": t["n"],
            "n_success": t["x"],
            "rate": pa.array(phat, pa.float64()),
            "ci_lo": pa.array(center - half, pa.float64()),
            "ci_hi": pa.array(center + half, pa.float64()),
        })

    return folded.map_batches(fin, batch_format="pyarrow").sort("window_start")


def pareto_coverage(
    ds: Dataset,
    *,
    key_col: str,
    value_col: str,
    share: float = 0.8,
    num_partitions: int = 8,
) -> Dataset:
    """Pareto concentration readout: the smallest number of keys (by
    descending total value) whose cumulative value reaches ``share`` of
    the corpus total — "how many users make up 80% of revenue", the
    concentration number the Gini coefficient
    (:func:`~.activity.activity_gini`) summarizes but cannot answer
    directly.

    Dataflow: one combiner fold to per-key int-cent sums (key-count
    sized), then one ordered finalize on a single partition — the same
    bounded-key-cardinality contract as the engine's gini/quantile ops.
    Exactness: cumulative sums are exact int64 in descending
    (value, key)-order; ``k`` is defined by COUNTING prefixes below the
    float target (``count(cum < share × total) + 1``) rather than by an
    argmax, so the engine and the SQL twin agree even when negative
    values make the running sum non-monotone; the two final divisions
    are identical float64 ops.

    Output: one row — ``n_keys, k_keys, share_covered, total_value``.

    Reference analog: top-k thresholding over scored records
    (keras_experiment.py:583-593) — here the threshold is derived from
    the mass distribution itself.
    """
    from ..pipelines.relational import grouped_aggregate

    def fold(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t[value_col], pa.float64()), pa.scalar(100.0))),
            pa.int64())
        return pa.table({key_col: t[key_col], "v": cents})

    per_key = grouped_aggregate(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key_col], aggs={"v": ("v", "sum")},
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_keys": pd.Series([], dtype="int64"),
                "k_keys": pd.Series([], dtype="int64"),
                "share_covered": pd.Series([], dtype="float64"),
                "total_value": pd.Series([], dtype="float64")})
        df = df.sort_values(["v", key_col], ascending=[False, True],
                            kind="mergesort")
        v = df["v"].to_numpy(dtype=np.int64)
        cum = np.cumsum(v)
        tot = np.float64(v.sum())
        target = np.float64(share) * tot
        k = min(int((cum.astype(np.float64) < target).sum()) + 1, len(v))
        return pd.DataFrame({
            "n_keys": pd.Series([len(v)], dtype="int64"),
            "k_keys": pd.Series([k], dtype="int64"),
            "share_covered": [float(np.float64(cum[k - 1]) / tot)
                              if tot != 0.0 else np.nan],
            "total_value": [float(tot / np.float64(100.0))]})

    return per_key.repartition(1).map_batches(fin, batch_format="pandas",
                                              batch_size=None)


def ndcg_at_k(
    ds: Dataset,
    *,
    key: str,
    item_col: str,
    ts_col: str,
    id_col: str,
    k: int = 5,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key NDCG@k of a history-based ranking: split each key's
    event stream at its midpoint in explicit time order, rank items by
    first-half frequency (count desc, item asc — the "recommend what
    they did before" baseline every recommender is benchmarked
    against), and score that ranking against second-half frequencies
    as graded relevance:

        DCG@k  = Σ_{i≤k} rel_i / log2(i+1)        (rank order)
        NDCG@k = DCG@k / IDCG@k                   (ideal = rel desc)

    The position-discounted companion to :func:`gains_table`
    (population-level lift) and ``events_recs_by_lift`` (association
    mining) — NDCG answers "is the per-user ranking good", which
    neither aggregate can see.

    Exactness: relevances are exact int64 counts; the ≤k-term float
    folds are ratios of sums whose reassociation noise is ~1e-15
    relative, far below the 6-decimal rounding both sides apply;
    ``log2`` is the same libm call in numpy and DuckDB.  Keys whose
    first half is empty (single-event keys) report NULL ndcg — there is
    no ranking to score; the second half is never empty by
    construction.  One ``_pkey`` exchange, pandas rank/cumsum kernels —
    no per-key Python.  Output: ``key, n_train (int64), n_test (int64),
    ndcg``.
    """
    from .grouped import grouped_apply

    def score(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_train": pd.Series([], dtype="int64"),
            "n_test": pd.Series([], dtype="int64"),
            "ndcg": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([key, ts_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        kv = df[key].to_numpy()
        change = np.flatnonzero(kv[1:] != kv[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(len(kv), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        n = np.bincount(gid).astype(np.int64)
        pos = np.arange(len(kv)) - starts[gid]
        is_train = pos < (n[gid] // 2)
        c = (pd.DataFrame({key: df[key], "_it": df[item_col],
                           "_tr": is_train.astype(np.int64),
                           "_te": (~is_train).astype(np.int64)})
             .groupby([key, "_it"], sort=False, as_index=False)
             [["_tr", "_te"]].sum())
        # ranking by first-half counts
        dr = c[c["_tr"] > 0].sort_values(
            [key, "_tr", "_it"], ascending=[True, False, True],
            kind="mergesort").copy()
        dr["_rk"] = dr.groupby(key, sort=False).cumcount() + 1
        dr = dr[dr["_rk"] <= k]
        dr["_dc"] = dr["_te"].to_numpy(np.float64) / np.log2(
            dr["_rk"].to_numpy(np.float64) + 1.0)
        dcg = dr.groupby(key, sort=False)["_dc"].sum()
        # ideal ranking by second-half counts
        ir = c[c["_te"] > 0].sort_values(
            [key, "_te", "_it"], ascending=[True, False, True],
            kind="mergesort").copy()
        ir["_rk"] = ir.groupby(key, sort=False).cumcount() + 1
        ir = ir[ir["_rk"] <= k]
        ir["_ic"] = ir["_te"].to_numpy(np.float64) / np.log2(
            ir["_rk"].to_numpy(np.float64) + 1.0)
        idcg = ir.groupby(key, sort=False)["_ic"].sum()
        out = pd.DataFrame({
            key: kv[starts],
            "n_train": n // 2,
            "n_test": n - n // 2})
        out = (out.merge(dcg.rename("_dcg"), left_on=key,
                         right_index=True, how="left")
               .merge(idcg.rename("_idcg"), left_on=key,
                      right_index=True, how="left"))
        d = out["_dcg"].to_numpy(np.float64)
        i = out["_idcg"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ndcg = d / i
        ndcg = np.where(out["n_train"].to_numpy() > 0, ndcg, np.nan)
        return pd.DataFrame({
            key: out[key],
            "n_train": out["n_train"].astype(np.int64),
            "n_test": out["n_test"].astype(np.int64),
            "ndcg": np.where(np.isfinite(ndcg), ndcg, np.nan)})

    return grouped_apply(ds, keys=[key], fn=score,
                         num_partitions=num_partitions, whole_partition=True)
