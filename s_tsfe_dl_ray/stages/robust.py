"""Robust (order-statistic / rank-based) per-key statistics.

The reference thresholds anomaly scores with order statistics over a
scored window (top-k cut of reconstruction error,
experiments/keras_experiment.py:583-593) and smooths with plain moving
averages (experiments/IGN_experiment.py:190-205); this module supplies
the robust siblings a production tier-timeseries pipeline uses when the
mean/OLS versions would chase outliers:

- :func:`grouped_mad`              — per-key median / MAD / MAD-z outlier
                                     count (the robust z-score)
- :func:`theil_sen`                — per-key median-of-pairwise-slopes
                                     robust trend (vs trend.py's OLS)
- :func:`spearman_monotonicity`    — per-key Spearman rank correlation of
                                     value against time order (monotonic
                                     drift score; rank sibling of
                                     lag1_autocorr)

Scale design: all three co-partition ONCE by hash(key) (the engine's
standard ``_pkey`` exchange) and are fully vectorized inside the
partition — pandas/numpy cython kernels across ALL keys of the
partition, no per-key Python apply.  ``theil_sen`` is the one
deliberately quadratic-per-key op (n_k(n_k-1)/2 pair slopes); it is
meant for post-rollup series (points-per-key bounded by the tier grid).
``max_key_rows`` guards it: a key exceeding the bound raises rather
than silently allocating O(n²) — window or downsample first (PAA,
rollup tiers) exactly as you would before fitting any per-series model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .grouped import grouped_apply


def grouped_mad(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    n_col: str = "n_events",
    k: float = 3.0,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key median, MAD and robust-outlier count.

    Output: one row per key — ``key, n_col, med, mad, n_outliers`` where
    ``n_outliers`` counts rows with ``|x - med| > k * 1.4826 * mad``
    (1.4826 = consistency constant making MAD estimate sigma for
    gaussians).  Keys where mad == 0 flag every ``x != med`` row —
    identical to the SQL twin's comparison, no special-casing.

    Exactness: median/MAD interpolate on DOUBLE (mean of the two middle
    order statistics) exactly like DuckDB ``median``; the threshold
    comparison uses the same float ops on both sides, so the comparison
    is bit-identical, not merely close.
    """
    kc = k * 1.4826

    def mad_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], n_col: pd.Series([], dtype="int64"),
                                 "med": [], "mad": [],
                                 "n_outliers": pd.Series([], dtype="int64")})
        g = df.groupby(key, sort=False)[value_col]
        med = g.median()
        dev = (df[value_col] - df[key].map(med)).abs()
        mad = dev.groupby(df[key], sort=False).median()
        thr = df[key].map(kc * mad)
        out_mask = dev > thr
        n = g.size()
        n_out = out_mask.groupby(df[key], sort=False).sum()
        out = pd.DataFrame({
            key: med.index.to_numpy(),
            n_col: n.reindex(med.index).to_numpy(dtype=np.int64),
            "med": med.to_numpy(),
            "mad": mad.reindex(med.index).to_numpy(),
            "n_outliers": n_out.reindex(med.index).to_numpy(dtype=np.int64),
        })
        return out.reset_index(drop=True)

    return grouped_apply(ds, keys=[key], fn=mad_partition,
                         num_partitions=num_partitions, whole_partition=True)


def theil_sen(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    slope_col: str = "sen_slope",
    max_key_rows: int = 20_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Theil–Sen robust slope: the MEDIAN of all pairwise slopes
    ``(v_j - v_i) / dt_sec`` over ordered pairs — up to ~29% outliers
    cannot move it, unlike the OLS line (stages/trend.py) they drag.

    Pairs with dt == 0 contribute nothing (the SQL twin's x/0 → NULL,
    ignored by ``median``); ``dt_sec`` is the exact µs difference /1e6
    (NOT epoch(b)-epoch(a), whose float cancellation costs ~2.4e-7 s).
    Output: ``key, n_pairs, slope_col`` (NULL slope when no valid pair).

    Scale: O(n_k²) per key by construction — run it on post-rollup /
    windowed series.  Keys with more than ``max_key_rows`` rows raise
    (window or PAA-downsample first) instead of silently allocating the
    quadratic pair block.
    """

    def sen_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_pairs": pd.Series([], dtype="int64"),
                                 slope_col: []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        keys = []
        n_pairs = []
        slopes = []
        ts_all = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v_all = df[value_col].to_numpy(dtype=np.float64)
        k_all = df[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n < 2:
                # no pair exists — key absent from output (the SQL
                # twin's pair self-join produces no row to group)
                continue
            if n > max_key_rows:
                raise ValueError(
                    f"theil_sen: key {k_all[s]!r} has {n} rows > "
                    f"max_key_rows={max_key_rows}; window or downsample first")
            t, v = ts_all[s:e], v_all[s:e]
            iu, ju = np.triu_indices(n, 1)
            dt = (t[ju] - t[iu]) / 1e6
            ok = dt > 0
            keys.append(k_all[s])
            n_pairs.append(int(ok.sum()))
            slopes.append(
                float(np.median((v[ju][ok] - v[iu][ok]) / dt[ok]))
                if ok.any() else np.nan)
        return pd.DataFrame({key: keys,
                             "n_pairs": pd.Series(n_pairs, dtype="int64"),
                             slope_col: slopes})

    return grouped_apply(ds, keys=[key], fn=sen_partition,
                         num_partitions=num_partitions, whole_partition=True)


def spearman_monotonicity(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "spearman",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Spearman rank correlation of value against time order —
    the scale-free monotonicity score (+1: strictly rising, −1: strictly
    falling, 0: no monotone drift), robust to any monotone transform of
    the values.  Value ties get AVERAGE ranks (the Spearman convention);
    time order is made unique by ``(ts, id_col)``.

    One ``_pkey`` exchange; ranks via cython ``groupby.rank`` /
    ``cumcount`` across all keys of the partition at once; the Pearson
    step runs on exact half-integer ranks (float64 sums of products of
    ranks ≤ n_k are exact for n_k < 2^17), so both sides compute from
    exact moments.  Keys with n < 2 or all-tied values give NULL,
    matching SQL ``corr``.  Output: ``key, n_events, out_col``.
    """

    def spear_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_events": pd.Series([], dtype="int64"),
                                 out_col: []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        rn = (g.cumcount() + 1).to_numpy(dtype=np.float64)
        rv = g[value_col].rank(method="average").to_numpy(dtype=np.float64)
        k_all = df[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk).astype(np.float64)
        sx = np.bincount(gid, weights=rn, minlength=nk)
        sy = np.bincount(gid, weights=rv, minlength=nk)
        sxx = np.bincount(gid, weights=rn * rn, minlength=nk)
        syy = np.bincount(gid, weights=rv * rv, minlength=nk)
        sxy = np.bincount(gid, weights=rn * rv, minlength=nk)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sxy - sx * sy / n
            corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        corr = np.where(np.isfinite(corr), corr, np.nan)
        return pd.DataFrame({
            key: k_all[starts],
            "n_events": n.astype(np.int64),
            out_col: corr,
        })

    return grouped_apply(ds, keys=[key], fn=spear_partition,
                         num_partitions=num_partitions, whole_partition=True)


def binary_changepoint(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    value_scale: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """Single-changepoint detection per key (the first split of binary
    segmentation / CUSUM's offline sibling): the split index k that
    maximizes the between-segment SSE reduction
    ``k(n−k)/n · (mean_left − mean_right)²`` over the ordered series —
    i.e. the most likely level-shift point.  The reference's anomaly
    experiments threshold per-window scores to find where a series
    changes regime (experiments/keras_experiment.py:583-593); this is
    the closed-form two-segment version as a data operator.

    Exactness discipline: values with ≤2 decimals are scaled to int64
    (``value_scale``) so the prefix sums both sides compute are EXACT
    integers — every downstream float op (means, score) is then
    bit-identical to the SQL twin and the argmax cannot flip on
    association noise.  Ties break toward the smallest k.  Keys with
    n < 2 have no split and emit nothing.  Output: ``key, n_events,
    split_k (last index of the left segment, 1-based), mean_left,
    mean_right, score`` (score in scaled units², rows-weighted).

    One ``_pkey`` co-partition; prefix sums / scores / argmax are
    numpy kernels over key boundaries — no per-key Python.
    """

    def cp_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: [], "n_events": pd.Series([], dtype="int64"),
            "split_k": pd.Series([], dtype="int64"),
            "mean_left": [], "mean_right": [], "score": []})
        if len(df) == 0:
            return empty
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        v_i = np.rint(df[value_col].to_numpy(dtype=np.float64)
                      * value_scale).astype(np.int64)
        k_all = df[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        n_per = np.bincount(gid, minlength=nk)
        cs = np.cumsum(v_i)
        base = np.concatenate([[0], cs[starts[1:] - 1]])  # sum before key
        ps = cs - base[gid]                                # exact int prefix
        tot = (ps[np.concatenate([starts[1:] - 1, [len(df) - 1]])])
        n_row = n_per[gid].astype(np.int64)
        k_row = (np.arange(len(df)) - starts[gid] + 1).astype(np.int64)
        valid = k_row < n_row                              # k < n splits only
        kf = k_row.astype(np.float64)
        nf = n_row.astype(np.float64)
        psf = ps.astype(np.float64)
        totf = tot[gid].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ml = psf / kf
            mr = (totf - psf) / (nf - kf)
            diff = ml - mr
            score = (k_row * (n_row - k_row)) / nf * diff * diff
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return empty
        # argmax per key: sort by (gid, -score, k) and take the first row
        order = idx[np.lexsort((k_row[idx], -score[idx], gid[idx]))]
        first = order[np.concatenate(
            [[True], gid[order][1:] != gid[order][:-1]])]
        return pd.DataFrame({
            key: k_all[first],
            "n_events": n_row[first],
            "split_k": k_row[first],
            "mean_left": ml[first] / value_scale,
            "mean_right": mr[first] / value_scale,
            "score": score[first],
        })

    return grouped_apply(ds, keys=[key], fn=cp_partition,
                         num_partitions=num_partitions, whole_partition=True)


def mann_whitney_u(
    ds: Dataset,
    *,
    key: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Mann–Whitney U (rank-sum) statistic between two groups —
    the nonparametric "are A's values systematically higher than B's"
    test, plus the rank-biserial effect size ``1 − 2U/(n_a·n_b)``
    (+1: every A beats every B; −1: the reverse).  The distribution-free
    sibling of comparing group means, robust to outliers and any
    monotone transform — the statistically sound version of the
    reference's compare-scores-between-classes step
    (experiments/keras_experiment.py:583-593 top-k score thresholding).

    Rows of other groups are dropped BEFORE the exchange (combiner
    discipline).  Ranks are combined average ranks per key (cython
    ``groupby.rank``); rank sums are exact half-integers in float64, so
    ``u_stat`` is bit-identical to the SQL twin, not merely close.
    Keys with n_a = 0 or n_b = 0 report their counts with NULL effect
    size (x/0).  Output: ``key, n_a, n_b, u_stat, rank_biserial``.
    """
    from .rollup import _stable_pkey

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[group_col],
                        value_set=pa.array([group_a, group_b]))
        t = t.filter(mask)
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def mw_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "u_stat": [], "rank_biserial": []})
        df = df.drop(columns=["_pkey"]).reset_index(drop=True)
        rk = df.groupby(key, sort=False)[value_col].rank(method="average")
        is_a = df[group_col] == group_a
        agg = pd.DataFrame({
            key: df[key],
            "_ra": rk.where(is_a, 0.0),
            "n_a": is_a.astype(np.int64),
            "n_b": (~is_a).astype(np.int64),
        }).groupby(key, sort=False).sum().reset_index()
        na = agg["n_a"].to_numpy(dtype=np.int64)
        nb = agg["n_b"].to_numpy(dtype=np.int64)
        ra = agg["_ra"].to_numpy(dtype=np.float64)
        u = ra - na * (na + 1) / 2.0
        with np.errstate(invalid="ignore", divide="ignore"):
            rb = 1.0 - 2.0 * u / (na * nb)
        rb = np.where(np.isfinite(rb), rb, np.nan)
        return pd.DataFrame({key: agg[key], "n_a": na, "n_b": nb,
                             "u_stat": u, "rank_biserial": rb})

    tagged = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_pkey").map_groups(mw_partition,
                                              batch_format="pandas")


def ks_test(
    ds: Dataset,
    *,
    key: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key two-sample Kolmogorov–Smirnov statistic
    ``D = max |ECDF_a − ECDF_b|`` between two groups' value
    distributions — the whole-shape sibling of :func:`mann_whitney_u`
    (which only sees location): detects variance/tail changes a rank-sum
    misses.

    ECDF steps are exact rationals (cumulative counts / group size);
    both sides compute the same float divisions, so D is bit-identical
    to the SQL twin (cumulative window counts include ties — RANGE
    frame semantics).  Keys missing either group emit nothing.  Rows of
    other groups are dropped before the exchange.  Output:
    ``key, n_a, n_b, ks_d``.
    """
    from .rollup import _stable_pkey

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[group_col],
                        value_set=pa.array([group_a, group_b]))
        t = t.filter(mask)
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def ks_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: [], "n_a": pd.Series([], dtype="int64"),
                              "n_b": pd.Series([], dtype="int64"), "ks_d": []})
        if len(df) == 0:
            return empty
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, value_col], kind="mergesort").reset_index(drop=True)
        k_all = df[key].to_numpy()
        a = (df[group_col] == group_a).to_numpy(dtype=np.int64)
        b = (df[group_col] == group_b).to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(df)]])
        nk = len(starts)
        ca = np.cumsum(a)
        cb = np.cumsum(b)
        base_a = np.concatenate([[0], ca[starts[1:] - 1]])
        base_b = np.concatenate([[0], cb[starts[1:] - 1]])
        ca = ca - base_a[gid]
        cb = cb - base_b[gid]
        # ECDF evaluated including ties: use the LAST row of each tie run
        # (cumulative count at value v == count of rows ≤ v) — identical
        # to the SQL RANGE-frame cumulative, which repeats that count on
        # every peer row (the max is unaffected, so row-wise is fine too)
        na = np.bincount(gid, weights=a, minlength=nk)
        nb = np.bincount(gid, weights=b, minlength=nk)
        same_key_next = np.zeros(len(df), dtype=bool)
        same_key_next[:-1] = k_all[1:] == k_all[:-1]
        same_val_next = np.zeros(len(df), dtype=bool)
        same_val_next[:-1] = (v[1:] == v[:-1]) & same_key_next[:-1]
        last_of_run = ~same_val_next
        with np.errstate(invalid="ignore", divide="ignore"):
            diff = np.abs(ca / na[gid] - cb / nb[gid])
        diff = np.where(last_of_run, diff, 0.0)
        d = np.zeros(nk)
        np.maximum.at(d, gid, diff)
        keep = (na > 0) & (nb > 0)
        return pd.DataFrame({
            key: k_all[starts][keep],
            "n_a": na[keep].astype(np.int64),
            "n_b": nb[keep].astype(np.int64),
            "ks_d": d[keep],
        })

    tagged = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_pkey").map_groups(ks_partition,
                                              batch_format="pandas")


def max_drawdown(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key maximum drawdown: ``max_t (running_max(value) − value)``
    in explicit time order — the worst peak-to-trough drop, THE
    stability metric for any monitored level series (and the ordered-
    scan sibling of the M4 min/max aggregate, which cannot see ordering).

    Exact: running max is a pure comparison scan (cython ``cummax``) and
    the drawdown is one float subtraction — both sides compute identical
    doubles, so the result is bit-identical to the SQL window twin.
    Output: ``key, n_events, max_drawdown`` (0.0 for a monotone-rising
    series; keys emit one row each).
    """

    def dd_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_events": pd.Series([], dtype="int64"),
                                 "max_drawdown": []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        g = df.groupby(key, sort=False)[value_col]
        dd = g.cummax() - df[value_col]
        out = pd.DataFrame({key: df[key], "_dd": dd}) \
            .groupby(key, sort=False)["_dd"].agg(n_events="size",
                                                 max_drawdown="max") \
            .reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return grouped_apply(ds, keys=[key], fn=dd_partition,
                         num_partitions=num_partitions, whole_partition=True)


def kendall_tau(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "kendall_tau",
    max_key_rows: int = 20_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Kendall tau-b of value against time order — the pair-based
    sibling of :func:`spearman_monotonicity` (which is rank-moment based);
    tau's bounded influence per pair makes it the most outlier-resistant
    of the three trend scores (OLS < Spearman < Kendall).

    Time order is made strictly unique by ``(ts, id_col)``, so the x side
    has no ties and tau-b reduces to ``(C − D) / sqrt(n0 · (C + D))`` with
    ``n0 = n(n−1)/2`` and C/D the concordant/discordant pair counts over
    time-ordered pairs; value-tied pairs count in n0 only.  NULL when
    every pair is value-tied (0/0 — matches SQL division semantics).

    Same scale contract as :func:`theil_sen`: one ``_pkey`` exchange,
    deliberately O(n_k²) per key via numpy pair blocks, guarded by
    ``max_key_rows`` — run it on post-rollup/windowed series.  Output:
    ``key, n_pairs, out_col``.
    """

    def tau_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_pairs": pd.Series([], dtype="int64"),
                                 out_col: []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        v_all = df[value_col].to_numpy(dtype=np.float64)
        k_all = df[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        keys, n_pairs, taus = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n < 2:
                continue  # the SQL pair self-join emits no row
            if n > max_key_rows:
                raise ValueError(
                    f"kendall_tau: key {k_all[s]!r} has {n} rows > "
                    f"max_key_rows={max_key_rows}; window or downsample first")
            v = v_all[s:e]
            c, dsc = _sign_pair_counts(v)
            n0 = n * (n - 1) // 2
            keys.append(k_all[s])
            n_pairs.append(n0)
            taus.append((c - dsc) / np.sqrt(float(n0) * (c + dsc))
                        if (c + dsc) > 0 else np.nan)
        return pd.DataFrame({key: keys,
                             "n_pairs": pd.Series(n_pairs, dtype="int64"),
                             out_col: taus})

    return grouped_apply(ds, keys=[key], fn=tau_partition,
                         num_partitions=num_partitions, whole_partition=True)


def _sign_pair_counts(v: np.ndarray) -> tuple[int, int]:
    """Exact (concordant, discordant) pair counts ``(#{i<j: v_j > v_i},
    #{i<j: v_j < v_i})`` in BLOCKS of rows so peak memory stays
    O(block · n) (~64 MB) instead of the O(n²) ``np.triu_indices``
    arrays (~5 GB at n = 20 000) — same comparisons, bit-identical
    counts, just chunked."""
    n = len(v)
    c = d = 0
    block = max(1, 8_000_000 // max(n, 1))
    for s in range(0, n - 1, block):
        e = min(s + block, n - 1)
        # rows s..e-1 as "i"; compare each against all j in [s, n),
        # masked to j > i — every (i < j) pair is visited exactly once
        # as the i-block sweeps
        sub = v[s:e, None] - v[None, s:]          # (e-s, n-s)
        ii, jj = np.indices(sub.shape, sparse=True)
        tri = jj > ii                              # j > i within slice
        c += int(((sub < 0) & tri).sum())          # v_j > v_i
        d += int(((sub > 0) & tri).sum())
        del sub
    return c, d


def _mk_s_varnum(v: np.ndarray) -> tuple[int, int]:
    """Mann–Kendall S and the INTEGER variance numerator
    ``n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`` for one series — kept integer so
    callers (plain and seasonal MK) can sum variance contributions
    exactly before the single /18.0."""
    n = len(v)
    c, d = _sign_pair_counts(np.asarray(v))
    s_stat = c - d
    cnt = np.unique(v, return_counts=True)[1].astype(np.int64)
    tie = int((cnt * (cnt - 1) * (2 * cnt + 5)).sum())
    return s_stat, n * (n - 1) * (2 * n + 5) - tie


def mann_kendall(
    ds: Dataset,
    *,
    key: str,
    order_col: str,
    value_col: str,
    min_n: int = 3,
    max_key_rows: int = 20_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Mann–Kendall monotone-trend TEST: ``S = Σ_{i<j}
    sign(x_j − x_i)`` over the series ordered by ``order_col``,
    tie-corrected ``Var(S) = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18``
    over value tie groups, and the continuity-corrected
    ``z = (S ∓ 1)/√Var(S)`` (0 when S = 0).  Adds the significance
    readout that :func:`kendall_tau` (the effect size) lacks — the
    classic distribution-free "is this KPI actually trending" screen.

    Duplicate ``(key, order)`` rows are SUMMED inside the partition
    fold, so upstream per-batch integer partials (e.g. value cents per
    day) stay exact across any batching — feed integer values and every
    sign/tie comparison is bit-exact against a SQL twin; the only float
    ops are the /18 and the (correctly-rounded) sqrt.

    Reference analog: trend screens over rolled-up vitals (SURVEY
    §2.5); no TSFEDL counterpart (model zoo, not stats).  Same scale
    contract as :func:`kendall_tau`: one ``_pkey`` exchange
    (grouped_apply), O(n_k²) numpy pair blocks per key bounded by
    ``max_key_rows`` — run it on pre-rolled daily/windowed series.
    Output: ``key, n_obs, s_stat, var_s, z`` (keys with fewer than
    ``min_n`` distinct order points emit no row).
    """

    def mk_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [],
                "n_obs": pd.Series([], dtype="int64"),
                "s_stat": pd.Series([], dtype="int64"),
                "var_s": pd.Series([], dtype="float64"),
                "z": pd.Series([], dtype="float64")})
        g = (df.groupby([key, order_col], sort=False, as_index=False)
             [value_col].sum())
        g = g.sort_values([key, order_col], kind="mergesort")
        v_all = g[value_col].to_numpy()
        k_all = g[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(g)]])
        keys, ns, ss, vs, zs = [], [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            n = int(e - s)
            if n < min_n:
                continue
            if n > max_key_rows:
                raise ValueError(
                    f"mann_kendall: key {k_all[s]!r} has {n} points > "
                    f"max_key_rows={max_key_rows}; window or downsample "
                    f"first")
            s_stat, var_num = _mk_s_varnum(v_all[s:e])
            var_s = var_num / 18.0
            if s_stat > 0:
                z = (s_stat - 1) / np.sqrt(var_s)
            elif s_stat < 0:
                z = (s_stat + 1) / np.sqrt(var_s)
            else:
                z = 0.0
            keys.append(k_all[s])
            ns.append(n)
            ss.append(s_stat)
            vs.append(var_s)
            zs.append(float(z))
        return pd.DataFrame({
            key: keys,
            "n_obs": pd.Series(ns, dtype="int64"),
            "s_stat": pd.Series(ss, dtype="int64"),
            "var_s": pd.Series(vs, dtype="float64"),
            "z": pd.Series(zs, dtype="float64")})

    return grouped_apply(ds, keys=[key], fn=mk_partition,
                         num_partitions=num_partitions, whole_partition=True)


def anova_oneway(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
) -> Dataset:
    """One-way ANOVA of ``value_col`` across ``group_col`` levels: does
    the metric's mean differ between groups more than within-group
    variance explains?  The k-sample extension of the engine's
    two-sample tests (:func:`mann_whitney_u`, :func:`ks_test`) and the
    continuous-response dual of the chi-square independence test
    (stages/distinct.chi2_independence) — reference analog: the
    per-class response-separation checks behind the reference's label
    remapping decisions (/root/reference/TSFEDL/data.py:99-154).

    Classic sufficient-statistics decomposition — per-batch
    ``(group, n, Σx, Σx²)`` partials (one pyarrow group_by each), then
    ONE tiny k-row final merge:
    ``SSB = Σ_g S_g²/n_g − S²/N``, ``SSW = ΣΣx² − Σ_g S_g²/n_g``,
    ``F = (SSB/(k−1)) / (SSW/(N−k))``, ``eta² = SSB/(SSB+SSW)``.
    The identical algebra runs in the SQL twin so both sides agree to
    float rounding.  Output: one row —
    ``n_rows, k_groups, f_stat, eta_sq`` (NULL F when dof degenerate).
    """

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[value_col], pa.float64())
        base = pa.table({group_col: t[group_col], "_x": x,
                         "_xx": pc.multiply(x, x)})
        out = base.group_by([group_col], use_threads=False).aggregate(
            [("_x", "count"), ("_x", "sum"), ("_xx", "sum")]
        )
        return out.rename_columns([group_col, "_n", "_s", "_ss"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)[["_n", "_s", "_ss"]].sum()
        n = float(g["_n"].sum())
        k = len(g)
        s = g["_s"].sum()
        ss = g["_ss"].sum()
        sgs = (g["_s"] * g["_s"] / g["_n"].astype(np.float64)).sum()
        ssb = sgs - s * s / n
        ssw = ss - sgs
        with np.errstate(divide="ignore", invalid="ignore"):
            f = (ssb / (k - 1)) / (ssw / (n - k)) if k > 1 and n > k else np.nan
            eta = ssb / (ssb + ssw)
        return pd.DataFrame({
            "n_rows": pd.Series([int(n)], dtype="int64"),
            "k_groups": pd.Series([k], dtype="int64"),
            "f_stat": [f if np.isfinite(f) else np.nan],
            "eta_sq": [eta if np.isfinite(eta) else np.nan],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def runs_test(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Wald–Wolfowitz runs test per key: is the sequence of
    above/below-median excursions random, or does the series cluster
    (trend/regime) or alternate (oscillation)?

    Per key, in ``order_by`` order: drop values EQUAL to the key's
    median (the standard tie convention), label the rest +/− against
    the median, count sign runs R, and standardize

        μ = 2·n₁·n₂/(n₁+n₂) + 1
        σ² = 2·n₁·n₂·(2·n₁·n₂ − n₁ − n₂) / ((n₁+n₂)²·(n₁+n₂−1))
        z = (R − μ)/σ

    The median is the exact lower-median element (``quantile_disc 0.5``
    — the element at sorted index ⌈n/2⌉−1), so the above/below labels
    and R are integer-exact and z mirrors the SQL twin bit-for-bit
    (n₁, n₂, R ride as int64; only μ, σ, z are float).  |z| > 2 ⇒ not
    random — the nonparametric sibling of :func:`~.trend.ljung_box`
    (which needs moments; this needs only order).

    One key-hash exchange, vectorized across keys inside each
    partition (sorted labels, boundary masks — no per-key Python).
    Output: ``{key}, n_obs, n_used, n_runs, z`` (z NULL when n₁ or n₂
    is 0, or σ = 0).
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "n_obs": pd.Series([], dtype="int64"),
                "n_used": pd.Series([], dtype="int64"),
                "n_runs": pd.Series([], dtype="int64"),
                "z": pd.Series([], dtype="float64")})
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all = df[key].to_numpy()
        uniq, inv = np.unique(keys_all, return_inverse=True)
        # exact lower median per key: sort (key, value), pick the element
        # at index ceil(n/2)-1 within each key segment (uniq is sorted,
        # so segment order aligns with uniq — no per-row dict lookups)
        order = np.lexsort((v, keys_all))
        ks, vs = keys_all[order], v[order]
        change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ks)]])
        n_per = ends - starts
        med_idx = starts + np.ceil(n_per / 2).astype(np.int64) - 1
        med = vs[med_idx][inv]
        keep = v != med
        sign = v > med
        # run starts among kept rows: first kept row of a key, or kept row
        # whose previous KEPT row in the same key has the opposite sign
        kk, ss = keys_all[keep], sign[keep]
        if len(kk):
            same2 = np.concatenate([[False], kk[1:] == kk[:-1]])
            new_run = ~same2 | (np.concatenate([[True], ss[1:] != ss[:-1]])
                                & same2)
        n_obs = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        n1 = np.bincount(inv, weights=(keep & sign).astype(np.float64),
                         minlength=len(uniq)).astype(np.int64)
        n2 = np.bincount(inv, weights=(keep & ~sign).astype(np.float64),
                         minlength=len(uniq)).astype(np.int64)
        n_used = n1 + n2
        r = np.zeros(len(uniq), dtype=np.int64)
        if len(kk):
            uk, invk = np.unique(kk, return_inverse=True)
            rk = np.bincount(invk, weights=new_run).astype(np.int64)
            r[np.searchsorted(uniq, uk)] = rk
        with np.errstate(invalid="ignore", divide="ignore"):
            tnn = 2.0 * n1 * n2
            nsum = (n1 + n2).astype(np.float64)
            mu = tnn / nsum + 1.0
            var = (tnn * (tnn - n1 - n2)) / (nsum * nsum * (nsum - 1.0))
            z = (r - mu) / np.sqrt(var)
        z = np.where((n1 > 0) & (n2 > 0) & np.isfinite(z), z, np.nan)
        return pd.DataFrame({key: uniq, "n_obs": n_obs, "n_used": n_used,
                             "n_runs": r, "z": z})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fold, batch_format="pandas")


def psi_daily(
    ds: Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 10,
    num_partitions: int = 16,
) -> Dataset:
    """Population Stability Index per observed day vs the PREVIOUS
    observed day — the model-monitoring drift staple (rule of thumb:
    < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted), the whole-
    distribution sibling of the two-sample KS ops.

        PSI(day) = Σ_bins (p_day − p_prev) · ln(p_day / p_prev)

    over ``n_bins`` equal-width bins of the GLOBAL [min, max] value
    range (exact combiner aggregates — no quantile estimation, no
    sample), with Laplace smoothing p = (c + ½)/(n + n_bins/2) so
    empty bins stay finite; a constant corpus (max == min) degenerates
    to a single bin and PSI 0 between all day pairs.

    Three cheap passes: global min/max combiner (one row), (day, bin)
    count combiner (partials only), and a days×bins final fold on one
    partition.  Output: ``day (µs-epoch date), n_events, psi`` — one
    row per observed day; the first observed day has no predecessor and
    reports NULL psi (so a single-day corpus still emits its row).
    """
    import pyarrow as pa

    from ..functions.windows import window_to_timestamp
    from ..pipelines.relational import grouped_aggregate

    # pass 1: exact global range
    def mm_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "_all": pa.array([1], pa.int8()),
            "lo": pa.array([pc.min(t[value_col]).as_py()], pa.float64()),
            "hi": pa.array([pc.max(t[value_col]).as_py()], pa.float64()),
        })

    mm = grouped_aggregate(
        ds.map_batches(mm_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["_all"], aggs={"lo": ("lo", "min"), "hi": ("hi", "max")},
        num_partitions=1).to_pandas()
    if (len(mm) == 0 or "lo" not in mm.columns
            or mm["lo"].isna().all()):  # empty input
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64"),
            "psi": pd.Series([], dtype="float64")}))
    lo = float(mm["lo"].iloc[0])
    hi = float(mm["hi"].iloc[0])

    def bin_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.divide(pc.cast(pc.cast(
            t[ts_col], pa.timestamp("us")), pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if hi == lo:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.floor((v - lo) * float(n_bins) / (hi - lo)).astype(
                np.int64)
            b = np.minimum(n_bins - 1, np.maximum(0, b))
        return pa.table({"day": day, "bin": pa.array(b)})

    counts = grouped_aggregate(
        ds.map_batches(bin_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["day", "bin"], aggs={"c": ("bin", "count")},
        num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "psi": pd.Series([], dtype="float64")})
        days = np.sort(df["day"].unique())
        grid = pd.MultiIndex.from_product(
            [days, range(n_bins)], names=["day", "bin"])
        c = (df.set_index(["day", "bin"])["c"]
             .reindex(grid, fill_value=0).to_numpy(dtype=np.float64)
             .reshape(len(days), n_bins))
        n = c.sum(axis=1)
        p = (c + 0.5) / (n + n_bins / 2.0)[:, None]
        cur, prev = p[1:], p[:-1]
        psi = np.concatenate(
            [[np.nan], ((cur - prev) * np.log(cur / prev)).sum(axis=1)])
        out_days = pa.array(days * 86_400_000_000, pa.int64())
        return pd.DataFrame({
            "day": window_to_timestamp(out_days).to_pandas(),
            "n_events": n.astype(np.int64),
            "psi": psi,
        })

    return counts.repartition(1).map_batches(finish, batch_format="pandas")


def trimmed_mean(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    id_col: str,
    trim: float = 0.1,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key trimmed mean: drop the ``floor(trim·n)`` smallest and
    largest observations (ties broken by ``id_col`` for a deterministic
    cut) and average the middle — the robust location estimate between
    the mean (trim 0) and the median (trim 0.5), resistant to the
    outliers that drag :func:`~..pipelines.relational.grouped_aggregate`
    means.

    One key-hash exchange; inside each partition one lexsort across all
    keys, rank-window masks per key segment, and a masked sum — no
    per-key Python.  The trimmed sum is a float64 fold over values in
    (value, id) order, mirroring the SQL twin's rank-window sum.
    Output: ``{key}, n_events, n_trimmed_each, trimmed_mean``.
    """

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
                "n_trimmed_each": pd.Series([], dtype="int64"),
                "trimmed_mean": pd.Series([], dtype="float64")})
        v = df[value_col].to_numpy(dtype=np.float64)
        i = df[id_col].to_numpy()
        k = df[key].to_numpy()
        order = np.lexsort((i, v, k))
        ks, vs = k[order], v[order]
        uniq, inv = np.unique(ks, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        rank = np.arange(len(ks)) - starts[inv]          # 0-based per key
        t = np.floor(trim * n).astype(np.int64)
        keep = (rank >= t[inv]) & (rank < (n - t)[inv])
        ssum = np.bincount(inv, weights=np.where(keep, vs, 0.0),
                           minlength=len(uniq))
        kept = (n - 2 * t).astype(np.float64)
        return pd.DataFrame({
            key: uniq,
            "n_events": n,
            "n_trimmed_each": t,
            "trimmed_mean": ssum / kept,
        })

    return grouped_apply(ds, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True).sort(key)


def tail_value_share(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    q: float = 0.99,
    value_decimals: int = 2,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key share of rows and of TOTAL VALUE contributed by values at
    or above the exact global ``quantile_disc(q)`` — the "how much of the
    mass lives in the tail" concentration probe (the single-threshold
    Lorenz-curve point; the per-key sibling of the user-level Gini op),
    matching the reference's top-k score-threshold cut
    (/root/reference/experiments/keras_experiment.py:583-593), here with
    the threshold derived exactly and the shares fully distributed.

    Two cheap passes:

    1. exact global threshold from the (value → count) distinct-value
       histogram (combiner partials; the histogram — not the rows — is
       collected, same discipline as the AUC score histogram).  Requires
       a bounded-cardinality value column (fixed-decimal metrics, counts);
       quantize upstream for continuous columns.
    2. per-key combiner: ``(key, n, n_tail, Σcents, Σcents_tail)`` where
       cents = value scaled by 10^value_decimals and rounded
       half-away-from-zero to int64 — EXACT integer sums for
       fixed-decimal columns, so the share division sees identical
       integers on both engine and SQL sides.

    Output: one row per key — ``{key}, n_rows, n_tail, row_share,
    value_share, threshold`` (threshold constant across rows; empty
    input → empty typed frame).
    """
    import ray.data

    from ..pipelines.relational import grouped_aggregate

    scale = float(10 ** value_decimals)

    def hist_part(t: pa.Table) -> pa.Table:
        out = (t.select([value_col])
               .group_by([value_col], use_threads=False)
               .aggregate([([], "count_all")]))
        return out.rename_columns([value_col, "_cnt"])

    hist = grouped_aggregate(
        ds.map_batches(hist_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[value_col], aggs={"_cnt": ("_cnt", "sum")},
        num_partitions=8).to_pandas()
    # empty input can yield a column-less frame (Ray drops empty-block
    # schemas) — guard before dropna
    if value_col in hist.columns:
        hist = hist.dropna(subset=[value_col])
    if len(hist) == 0 or value_col not in hist.columns:
        return ray.data.from_pandas(pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_rows": pd.Series([], dtype="int64"),
            "n_tail": pd.Series([], dtype="int64"),
            "row_share": pd.Series([], dtype="float64"),
            "value_share": pd.Series([], dtype="float64"),
            "threshold": pd.Series([], dtype="float64")}))
    hist = hist.sort_values(value_col).reset_index(drop=True)
    cum = hist["_cnt"].cumsum().to_numpy()
    n_total = int(cum[-1])
    # quantile_disc: element at sorted 0-based index ceil(n*q)-1
    target = max(int(np.ceil(n_total * q)), 1)
    thr = float(hist[value_col].to_numpy()[np.searchsorted(cum, target)])

    def part(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        # DuckDB round: half away from zero (not numpy's half-even)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5), v)
        cents = np.where(ok, cents, 0.0).astype(np.int64)
        tail = ok & (v >= thr)
        labs = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        labs = labs.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        k = len(uniq)
        out = pa.table({
            key: pa.array(uniq, type=t[key].type),
            "n": pa.array(np.bincount(inv, weights=ok, minlength=k).astype(np.int64)),
            "nt": pa.array(np.bincount(inv, weights=tail, minlength=k).astype(np.int64)),
            "c": pa.array(np.bincount(inv, weights=cents, minlength=k).astype(np.int64)),
            "ct": pa.array(np.bincount(inv, weights=np.where(tail, cents, 0),
                                       minlength=k).astype(np.int64)),
        })
        from .rollup import _stable_pkey
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=True)[["n", "nt", "c", "ct"]].sum().reset_index()
        n = g["n"].to_numpy(dtype=np.float64)
        c = g["c"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            row_share = np.where(n > 0, g["nt"].to_numpy() / n, np.nan)
            value_share = np.where(c != 0, g["ct"].to_numpy() / c, np.nan)
        return pd.DataFrame({
            key: g[key],
            "n_rows": g["n"].astype(np.int64),
            "n_tail": g["nt"].astype(np.int64),
            "row_share": row_share,
            "value_share": value_share,
            "threshold": np.full(len(g), thr),
        })

    return (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def hill_tail_index(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    k: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Hill estimator of the tail index over the top-``k`` order
    statistics of the POSITIVE values:

        hill = (1/k) Σ_{i=1..k} ln(x_(i)) − ln(x_(k+1))     (x desc)

    — the standard heavy-tail exponent probe (small hill → light tail,
    large → Pareto-like), completing the concentration family
    (:func:`tail_value_share`, Gini, HHI) with an actual tail-shape
    estimate.  1/hill estimates the Pareto alpha.

    Shape: per-batch ``(key, value) → count`` histogram partials cross
    ONE key-hash exchange (same memory class as the exact-quantile op —
    bounded-cardinality values; quantize continuous columns upstream);
    per-partition the top-k fold works on the DESC-sorted histogram with
    tie groups split by multiplicity, so no row expansion ever happens.
    Ties need no ordering contract: equal values contribute equal
    ln terms.  Keys with fewer than k+1 positive rows report NULL
    (same via the SQL twin's empty FILTER).

    Output: ``{key}, n_pos, x_k1, hill`` sorted by key.
    """
    from ..pipelines.relational import grouped_aggregate
    from .rollup import _stable_pkey

    kf = float(k)

    def hist_part(t: pa.Table) -> pa.Table:
        flt = t.filter(pc.greater(t[value_col], 0.0))
        out = (flt.select([key, value_col])
               .group_by([key, value_col], use_threads=False)
               .aggregate([([], "count_all")]))
        out = out.rename_columns([key, "v", "c"])
        return out.append_column(
            "_pkey", _stable_pkey(out[key], num_partitions))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series([], dtype="object"),
                "n_pos": pd.Series([], dtype="int64"),
                "x_k1": pd.Series([], dtype="float64"),
                "hill": pd.Series([], dtype="float64")})
        h = df.groupby([key, "v"], sort=False)["c"].sum().reset_index()
        h = h.sort_values([key, "v"], ascending=[True, False],
                          kind="mergesort").reset_index(drop=True)
        kk = h[key].to_numpy()
        v = h["v"].to_numpy(dtype=np.float64)
        c = h["c"].to_numpy(dtype=np.int64)
        uniq, inv = np.unique(kk, return_inverse=True)
        nk = len(uniq)
        cum = np.cumsum(c)
        seg_tot = np.bincount(inv, weights=c, minlength=nk).astype(np.int64)
        seg_end = np.cumsum(seg_tot)
        cum_in = cum - (seg_end - seg_tot)[inv]     # cum within key, desc
        before = cum_in - c
        # top-k multiset: rows starting before rank k, tie groups split
        topm = np.where(before < k, np.minimum(c, k - before), 0)
        sum_ln = np.bincount(inv, weights=np.log(v) * topm, minlength=nk)
        # x_(k+1): largest value whose cumulative count reaches k+1
        has_k1 = cum_in >= (k + 1)
        x_k1 = np.full(nk, np.nan)
        first = np.full(nk, -1, dtype=np.int64)
        idx = np.flatnonzero(has_k1)
        if len(idx):
            # first qualifying row per key segment (rows are key-grouped)
            fi = pd.Series(idx).groupby(inv[idx]).min()
            first[fi.index.to_numpy()] = fi.to_numpy()
            got = first >= 0
            x_k1[got] = v[first[got]]
        with np.errstate(invalid="ignore", divide="ignore"):
            hill = sum_ln / kf - np.log(x_k1)
        return pd.DataFrame({
            key: uniq,
            "n_pos": seg_tot,
            "x_k1": x_k1,
            "hill": np.where(np.isfinite(hill), hill, np.nan)})

    partials = ds.map_batches(hist_part, batch_format="pyarrow",
                              zero_copy_batch=True)
    return (partials.groupby("_pkey")
            .map_groups(fold, batch_format="pandas").sort(key))


def gumbel_return_level(
    ds: Dataset,
    *,
    ts_col: str,
    value_col: str,
    tier: str = "1d",
    return_period: float = 100.0,
    num_partitions: int = 8,
) -> Dataset:
    """Extreme-value return level via block maxima + Gumbel
    method-of-moments — "what daily maximum do we exceed once per
    ``return_period`` blocks", the capacity/tail-risk number a p99
    (:func:`tail_value_share`) cannot extrapolate beyond observed data.
    Fit: scale = sd·√6/π, loc = mean − γ·scale (γ = Euler–Mascheroni),
    return level = loc − scale·ln(−ln(1 − 1/T)).

    Exactness: block maxima fold as int cents (combiner max — exact and
    order-free); mean/sd derive from (n, Σ, Σ²) integer sums cast to
    float64 at the same points as the SQL twin; √6, γ, π and the
    ln(−ln(·)) term are embedded as identical LITERALS on both sides
    (libm log is not guaranteed correctly rounded, a constant is);
    n ≤ 1 or negative float-cancellation variance goes NULL via
    0-division / the twin's CASE guard (DuckDB sqrt raises on
    negatives; numpy yields NaN → NULL).

    Output: one row — ``n_blocks, mean_max, sd_max, gumbel_loc,
    gumbel_scale, return_level``.

    Reference analog: the stream experiment thresholds anomalies at a
    fixed top-k (keras_experiment.py:583-593); the return level is the
    principled extrapolated threshold.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us
    from ..pipelines.relational import grouped_aggregate

    # ln(-ln(1 - 1/T)) precomputed; np.log at runtime could differ from
    # DuckDB's ln() in the last ulp — a literal cannot
    if return_period != 100.0:
        c_rl = float(np.log(-np.log(1.0 - 1.0 / return_period)))
    else:
        c_rl = -4.600149226776579
    SQRT6 = 2.449489742783178
    GAMMA = 0.5772156649015329
    PI = 3.141592653589793

    def fold(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t[value_col], pa.float64()), pa.scalar(100.0))),
            pa.int64())
        return pa.table({"w": window_start_us(t[ts_col], tier),
                         "mx": cents})

    maxima = grouped_aggregate(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=["w"], aggs={"mx": ("mx", "max")},
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("n_blocks", "mean_max", "sd_max", "gumbel_loc",
                "gumbel_scale", "return_level")
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype="int64" if c == "n_blocks" else "float64")
                for c in cols})
        mx = df["mx"].to_numpy(dtype=np.int64)
        n = np.float64(len(mx))
        s = np.float64(mx.sum())
        ss = np.float64(np.dot(mx, mx))
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s / n
            var = (ss - s * s / n) / (n - 1.0)
            sd = np.sqrt(var)
            scale = sd * SQRT6 / PI
            loc = m - GAMMA * scale
            rl = loc - scale * c_rl
        vals = [v / 100.0 if np.isfinite(v) else np.nan
                for v in (m, sd, loc, scale, rl)]
        return pd.DataFrame({
            "n_blocks": pd.Series([len(mx)], dtype="int64"),
            "mean_max": [vals[0]], "sd_max": [vals[1]],
            "gumbel_loc": [vals[2]], "gumbel_scale": [vals[3]],
            "return_level": [vals[4]]})

    return maxima.repartition(1).map_batches(fin, batch_format="pandas",
                                             batch_size=None)


def page_hinkley(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    delta: float = 0.05,
    threshold: float = 5.0,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Page–Hinkley drift statistic (Page 1954; the standard
    online concept-drift detector in streaming-ML libraries): with
    ``μ_t`` the RUNNING mean of the series in explicit time order,
    ``m_t = Σ_{i≤t} (x_i − μ_i − δ)`` and
    ``PH = max_t (m_t − min_{j≤t} m_j)`` — the largest upward excursion
    of the deviation walk.  Unlike :func:`s_tsfe_dl_ray.stages.scan.cusum`
    (fixed target) the reference level adapts, so slow level shifts are
    detected without knowing the pre-shift mean; the reference's
    anomaly-score thresholding over a scored sequence is the same
    alarm pattern (/root/reference/experiments/keras_experiment.py
    anomaly threshold sweep).

    Exactness contract: every step is an ordered sequential fold that
    DuckDB's unbounded-preceding window executor computes in the same
    left-to-right order — cumulative sum (μ numerator), single division
    by the 1-based position, cumulative sum of ``x − μ − δ``, cumulative
    min, max — so both sides produce bit-identical doubles (the same
    precedent as ``cusum``/``events_running_sum``, fuzz-verified).
    ``drift`` compares the UNROUNDED statistic to ``threshold``.

    One ``_pkey`` exchange, grouped cython scans inside each partition —
    no per-key Python.  Output: ``key, n_events (int64), ph_stat,
    drift (bool)``; single-point keys report PH = 0.
    """

    def ph_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
                "ph_stat": pd.Series([], dtype="float64"),
                "drift": pd.Series([], dtype="bool")})
        df = df.sort_values([key, ts_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby(key, sort=False)
        x = df[value_col].astype("float64")
        pos = g.cumcount().to_numpy(np.float64) + 1.0
        mu = g[value_col].cumsum().to_numpy(np.float64) / pos
        df["_d"] = x.to_numpy(np.float64) - mu - delta
        m = df.groupby(key, sort=False)["_d"].cumsum()
        df["_m"] = m
        df["_exc"] = m - df.groupby(key, sort=False)["_m"].cummin()
        out = df.groupby(key, sort=False)["_exc"].agg(
            n_events="size", ph_stat="max").reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["drift"] = out["ph_stat"].to_numpy(np.float64) > threshold
        return out

    return grouped_apply(ds, keys=[key], fn=ph_partition,
                         num_partitions=num_partitions, whole_partition=True)


def welch_ttest(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    value_decimals: int = 2,
) -> Dataset:
    """Welch's unequal-variance t-test between two named levels of
    ``group_col`` — the parametric two-sample companion to
    :func:`mann_whitney_u` (rank-based) and :func:`anova_oneway`
    (k-sample, pooled variance): Welch drops the equal-variance
    assumption, which real telemetry almost never satisfies.

        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        ν  = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))   (Satterthwaite)

    Exactness: values are scaled to 10^value_decimals integer units
    (half-away rounding — the ``copysign(floor(abs·s+0.5))`` ==
    DuckDB ``round()`` recipe), per-group moment sums are exact int64
    through pyarrow group_by and stay integer across the merge; the
    finalize casts each moment to float64 ONCE and runs a fixed
    expression tree mirrored by the SQL twin.  Degenerate inputs
    (either group missing / n < 2 / both variances 0) yield NULLs via
    0-division.  Output: one row — ``n_a, n_b, mean_a, mean_b,
    mean_diff, t_stat, dof``.
    """
    scale = float(10 ** value_decimals)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[group_col], value_set=pa.array([group_a, group_b]))
        t = t.filter(keep)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        base = pa.table({
            "_g": t[group_col],
            "_one": pa.array(np.ones(len(v), np.int64)),
            "_s": pa.array(cents),
            "_ss": pa.array(cents * cents)})
        out = base.group_by(["_g"], use_threads=False).aggregate(
            [("_one", "sum"), ("_s", "sum"), ("_ss", "sum")])
        return out.rename_columns(["_g", "_n", "_s", "_ss"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_g", sort=True)[["_n", "_s", "_ss"]].sum()

        def mom(name):
            if name not in g.index:
                return np.float64(0), np.float64(0), np.float64(0)
            r = g.loc[name]
            return (np.float64(r["_n"]), np.float64(r["_s"]),
                    np.float64(r["_ss"]))

        na, sa, ssa = mom(group_a)
        nb, sb, ssb = mom(group_b)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            ma, mb = sa / na, sb / nb
            va = (ssa - sa * sa / na) / (na - 1.0)
            vb = (ssb - sb * sb / nb) / (nb - 1.0)
            ua, ub = va / na, vb / nb
            t_stat = (ma - mb) / np.sqrt(ua + ub)
            dof = (ua + ub) * (ua + ub) / (
                ua * ua / (na - 1.0) + ub * ub / (nb - 1.0))
        vals = [v if np.isfinite(v) else np.nan
                for v in (ma / scale, mb / scale, (ma - mb) / scale,
                          t_stat, dof)]
        return pd.DataFrame({
            "n_a": pd.Series([int(na)], dtype="int64"),
            "n_b": pd.Series([int(nb)], dtype="int64"),
            "mean_a": [vals[0]], "mean_b": [vals[1]],
            "mean_diff": [vals[2]], "t_stat": [vals[3]], "dof": [vals[4]]})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def tukey_hsd(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    value_decimals: int = 2,
) -> Dataset:
    """Tukey HSD post-hoc pairwise comparisons after
    :func:`anova_oneway`: for every unordered level pair (a < b) the
    mean difference and the studentized-range statistic

        q = |m_a − m_b| / sqrt(MSW/2 · (1/n_a + 1/n_b))

    with MSW the ANOVA within-group mean square — WHICH pairs moved is
    the question ANOVA's single F cannot answer.  The pair fan-out is
    k·(k−1)/2 rows over the tiny per-group moment table, never over the
    data.

    Exactness: int-scaled moment sums (exact int64 through pyarrow
    group_by and the merge), each cast to float64 once; the Σ_g s_g²/n_g
    fold runs in group-name order on both sides (engine: sorted cumsum;
    SQL twin: ordered-window fold) so MSW is bit-identical; mean
    differences are exact integer differences rescaled once.  Groups
    with n < 1 cannot occur; k < 2 or MSW ≤ 0 (all-constant groups)
    yields NULL q via 0-division/sqrt-of-nonpositive.  Output: one row
    per pair — ``group_a, group_b, n_a, n_b, mean_diff, q_stat`` sorted
    by (group_a, group_b).
    """
    scale = float(10 ** value_decimals)

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        base = pa.table({
            "_g": t[group_col],
            "_one": pa.array(np.ones(len(v), np.int64)),
            "_s": pa.array(cents),
            "_ss": pa.array(cents * cents)})
        out = base.group_by(["_g"], use_threads=False).aggregate(
            [("_one", "sum"), ("_s", "sum"), ("_ss", "sum")])
        return out.rename_columns(["_g", "_n", "_s", "_ss"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "group_a": pd.Series([], dtype="object"),
            "group_b": pd.Series([], dtype="object"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "mean_diff": pd.Series([], dtype="float64"),
            "q_stat": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("_g", sort=True)[["_n", "_s", "_ss"]].sum()
        k = len(g)
        if k < 2:
            return empty
        names = g.index.to_numpy()
        n = g["_n"].to_numpy(np.int64)
        nf = n.astype(np.float64)
        s = g["_s"].to_numpy(np.float64)   # exact ints → float64 once
        ss = g["_ss"].to_numpy(np.float64)
        big_n = np.float64(n.sum())
        # within-group SS folded in group-name order (matches the SQL
        # twin's ordered-window fold) — fixed expression tree below
        within = ss - s * s / nf
        # explicit left-to-right fold over sorted names (np.sum would use
        # pairwise/unrolled accumulation and break bit-parity with the
        # SQL twin's ordered-window fold); k is tiny
        ssw = np.float64(0.0)
        for w in within:
            ssw = ssw + w
        with np.errstate(invalid="ignore", divide="ignore"):
            msw = ssw / (big_n - np.float64(k))
            ia, ib = np.triu_indices(k, 1)
            mdiff = (s[ia] / nf[ia] - s[ib] / nf[ib]) / scale
            se = np.sqrt(msw / 2.0 * (1.0 / nf[ia] + 1.0 / nf[ib])) / scale
            q = np.abs(mdiff) / se
        q = np.where(np.isfinite(q), q, np.nan)
        mdiff = np.where(np.isfinite(mdiff), mdiff, np.nan)
        return pd.DataFrame({
            "group_a": names[ia], "group_b": names[ib],
            "n_a": n[ia], "n_b": n[ib],
            "mean_diff": mdiff, "q_stat": q})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def grubbs_test(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    value_decimals: int = 2,
) -> Dataset:
    """Grubbs' maximum-studentized-extreme test per group: how many
    sample standard deviations does the most extreme value sit from the
    group mean?  G > the Grubbs critical value flags a single gross
    outlier — the classic single-outlier screen a telemetry pipeline
    runs per metric before fitting anything mean-based (reference
    analog: the top-k reconstruction-error cut,
    /root/reference/experiments/keras_experiment.py:583-593; this is
    its parametric single-point sibling, vs :func:`grouped_mad`'s
    robust-z count).

    Exactness: values scale to 10^value_decimals integer units
    (copysign-floor == DuckDB round half-away), so the per-group
    (n, Σ, Σ², min, max) moments are exact int64 through the combiner
    and the merge.  The key identity: the studentized deviation is
    maximized at an extreme, so G = max(maxv − m, m − minv)/sd needs NO
    per-row second pass — the argmax branch (high vs low extreme) is a
    comparison of floats from identical expression trees on both sides.
    Degenerate groups (n < 2, zero variance) yield NULL G via
    0-division.  Output per group: ``group_col, n_rows, mean, sd,
    g_stat, outlier_value`` (the extreme attaining G; ties break to the
    high side).
    """
    scale = float(10 ** value_decimals)

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        base = pa.table({
            group_col: t[group_col],
            "_one": pa.array(np.ones(len(v), np.int64)),
            "_s": pa.array(cents),
            "_ss": pa.array(cents * cents),
            "_mn": pa.array(cents),
            "_mx": pa.array(cents)})
        out = base.group_by([group_col], use_threads=False).aggregate(
            [("_one", "sum"), ("_s", "sum"), ("_ss", "sum"),
             ("_mn", "min"), ("_mx", "max")])
        return out.rename_columns([group_col, "_n", "_s", "_ss",
                                   "_mn", "_mx"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "n_rows": pd.Series([], dtype="int64"),
                "mean": pd.Series([], dtype="float64"),
                "sd": pd.Series([], dtype="float64"),
                "g_stat": pd.Series([], dtype="float64"),
                "outlier_value": pd.Series([], dtype="float64")})
        g = df.groupby(group_col, sort=True).agg(
            _n=("_n", "sum"), _s=("_s", "sum"), _ss=("_ss", "sum"),
            _mn=("_mn", "min"), _mx=("_mx", "max")).reset_index()
        n = g["_n"].to_numpy(np.float64)
        s = g["_s"].to_numpy(np.float64)
        ss = g["_ss"].to_numpy(np.float64)
        mn = g["_mn"].to_numpy(np.float64)
        mx = g["_mx"].to_numpy(np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s / n
            # explicit n<2 guard: the naive tree gives residual/0 = ±inf
            # there, and G = dev/inf would COLLAPSE to finite 0.0 while
            # the SQL twin's x/0 is NULL — pin NaN instead
            var = np.where(n >= 2.0,
                           (ss - s * s / n) / (n - 1.0), np.nan)
            sd = np.sqrt(var)
            hi = mx - m
            lo = m - mn
            dev = np.where(hi >= lo, hi, lo)
            g_stat = dev / sd
        out_v = np.where(hi >= lo, mx, mn) / scale

        def _nn(a):
            return np.where(np.isfinite(a), a, np.nan)

        return pd.DataFrame({
            group_col: g[group_col],
            "n_rows": g["_n"].astype(np.int64),
            "mean": _nn(m / scale),
            "sd": _nn(sd / scale),
            "g_stat": _nn(g_stat),
            "outlier_value": out_v})

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def category_mix_drift(
    ds: Dataset,
    *,
    ts_col: str,
    cat_col: str,
    period: str = "1mo",
) -> Dataset:
    """Per-period chi-square drift of a categorical mix against the
    whole-corpus mix: is this month's order-priority (event-type,
    label, …) distribution the usual one, or did the mix shift?  The
    categorical sibling of :func:`psi_daily` (which bins a continuous
    value) — chi-square against the GLOBAL column totals, the standard
    monitoring statistic for label/priority drift.

    Exactness: observed cell counts and the row/column totals are exact
    int64 through the combiner; expected counts e = rowtot·coltot/N and
    each term (o−e)²/e form a fixed float tree, and the per-period SUM
    runs in sorted-category order SEQUENTIALLY on both sides (numpy
    running fold here == DuckDB ``list_reduce(list(term ORDER BY cat))``
    in the twin), so the chi-square is bit-identical — no reassociation
    noise.  Cells absent in a period count as o = 0 (the full
    period×category grid is materialized on both sides).  Output per
    period: ``period_start, n_rows (int64), n_cats (int64), chi2``
    (NULL when the corpus has a single period or category).

    Scale: per-batch (period, category) count partials cross one tiny
    exchange; the grid fold touches periods×categories rows only.
    """
    period_fn = {"1d": None, "1mo": None}
    if period not in period_fn:
        raise ValueError(f"period must be one of {sorted(period_fn)}")

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        if period == "1d":
            pstart = (us // 86_400_000_000) * 86_400_000_000
        else:
            days = us // 86_400_000_000
            # civil month floor via numpy datetime64[M]
            months = days.astype("datetime64[D]").astype("datetime64[M]")
            pstart = months.astype("datetime64[us]").astype(np.int64)
        base = pa.table({
            "_p": pa.array(pstart),
            cat_col: t[cat_col],
            "_one": pa.array(np.ones(len(us), np.int64))})
        out = base.group_by(["_p", cat_col], use_threads=False).aggregate(
            [("_one", "sum")])
        return out.rename_columns(["_p", cat_col, "_o"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "period_start": pd.Series([], dtype="datetime64[us]"),
            "n_rows": pd.Series([], dtype="int64"),
            "n_cats": pd.Series([], dtype="int64"),
            "chi2": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.groupby(["_p", cat_col], sort=True, as_index=False)["_o"] \
            .sum()
        cats = np.sort(m[cat_col].unique())
        periods = np.sort(m["_p"].unique())
        k, npd = len(cats), len(periods)
        grid = np.zeros((npd, k), np.int64)
        pi = {p: i for i, p in enumerate(periods)}
        ci = {c: j for j, c in enumerate(cats)}
        grid[[pi[p] for p in m["_p"]],
             [ci[c] for c in m[cat_col]]] = m["_o"].to_numpy(np.int64)
        rowtot = grid.sum(axis=1)
        coltot = grid.sum(axis=0)
        total = np.float64(grid.sum())
        chi2 = np.full(npd, np.nan)
        if k >= 2 and npd >= 2:
            for i in range(npd):
                acc = np.float64(0.0)
                rt = np.float64(rowtot[i])
                for j in range(k):       # sorted-category SEQUENTIAL fold
                    e = rt * np.float64(coltot[j]) / total
                    d = np.float64(grid[i, j]) - e
                    acc = acc + d * d / e
                chi2[i] = acc if np.isfinite(acc) else np.nan
        return pd.DataFrame({
            "period_start": pd.Series(periods).astype("datetime64[us]"),
            "n_rows": rowtot.astype(np.int64),
            "n_cats": np.full(npd, k, np.int64),
            "chi2": chi2})

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def pairwise_ks(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
) -> Dataset:
    """Kolmogorov–Smirnov distance between EVERY pair of groups'
    value distributions: D = max |ECDF_a − ECDF_b| over the pooled
    distinct values — the all-pairs extension of :func:`ks_test`
    (two named groups), the distribution-drift matrix a curation
    pipeline screens sources with before mixing them.

    Exactness: per-(group, value) counts are exact int64; both ECDFs
    are evaluated on the SAME pooled sorted value grid (missing values
    carry the cumulative forward — a zero-filled grid cumsum here, a
    LEFT JOIN + windowed sum in the twin); each ECDF point is one
    division of exact ints, and D is a max over identical float sets.
    NULL/NaN values are excluded on both sides.  Output per a < b
    pair: ``source_a, source_b, n_a (int64), n_b (int64), ks_d``.

    Scale: per-batch (group, value, count) combiner partials (distinct
    values only) cross one exchange to a single final partition whose
    size is groups × pooled-distinct-values — the op targets
    bounded-cardinality values (lengths, counts, scores); winsorize or
    bin first for unbounded floats.
    """

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        keep = pc.and_(pc.is_valid(v), pc.is_finite(v))
        base = pa.table({group_col: t[group_col], "_v": v}).filter(keep)
        out = base.group_by([group_col, "_v"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns([group_col, "_v", "_c"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source_a": pd.Series([], dtype="object"),
            "source_b": pd.Series([], dtype="object"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "ks_d": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.groupby([group_col, "_v"], sort=False,
                       as_index=False)["_c"].sum()
        groups = np.sort(m[group_col].unique())
        vals = np.sort(m["_v"].unique())
        k, nv = len(groups), len(vals)
        if k < 2:
            return empty
        gi = {g: i for i, g in enumerate(groups)}
        vi = {v: j for j, v in enumerate(vals)}
        grid = np.zeros((k, nv), np.int64)
        grid[[gi[g] for g in m[group_col]],
             [vi[v] for v in m["_v"]]] = m["_c"].to_numpy(np.int64)
        cum = np.cumsum(grid, axis=1)
        n = cum[:, -1].astype(np.float64)
        ecdf = cum.astype(np.float64) / n[:, None]
        rows = []
        for i in range(k):
            for j in range(i + 1, k):
                d = np.abs(ecdf[i] - ecdf[j]).max()
                rows.append((groups[i], groups[j], int(cum[i, -1]),
                             int(cum[j, -1]), d))
        out = pd.DataFrame(rows, columns=["source_a", "source_b",
                                          "n_a", "n_b", "ks_d"])
        out["n_a"] = out["n_a"].astype(np.int64)
        out["n_b"] = out["n_b"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def kruskal_wallis(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> Dataset:
    """Global Kruskal–Wallis H test — "do the value distributions differ
    across k groups?" — the k-group generalization of the engine's
    Mann–Whitney U, with exact average-rank tie handling and the
    standard tie correction ``C = 1 − Σ(t³−t)/(N³−N)``.

    Scale shape: per-batch ``(group, scaled_value) → count`` partials
    (the value-histogram discipline, stages/quantile.py) fold to one
    partition where pooled midranks come from the cumulative value
    histogram — the shuffle never carries raw rows.  Values quantize to
    int64 via the exact half-away recipe (== DuckDB ``round(x·scale)``),
    so midranks are exact half-integers and every rank sum is
    bit-identical to the SQL twin (``AVG(row_number) OVER (PARTITION BY
    value)`` midranks).  Same caveat as grouped_quantiles: a continuous
    column with ~all-distinct values degrades the histogram toward the
    row count — quantize coarser upstream when that bites.

    Output: one row ``n, k_groups, dof, h, h_adj`` (``h_adj`` NULL when
    the tie correction is 0, i.e. every value identical).
    """

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        ci = np.copysign(np.floor(np.abs(x) * scale + 0.5), x).astype(
            np.int64)
        tbl = pa.table({"g": pc.cast(t[group_col], pa.string()),
                        "_ci": pa.array(ci)})
        out = tbl.group_by(["g", "_ci"], use_threads=False).aggregate(
            [([], "count_all")])
        return out.rename_columns(["g", "_ci", "_cnt"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": pd.Series([], dtype="int64"),
                "k_groups": pd.Series([], dtype="int64"),
                "dof": pd.Series([], dtype="int64"),
                "h": [], "h_adj": []}
        if len(df) == 0:
            return pd.DataFrame(cols)
        h = (df.groupby(["g", "_ci"], sort=True)["_cnt"]
             .sum().reset_index())
        # pooled per-value totals in ascending value order → midranks
        tv = h.groupby("_ci", sort=True)["_cnt"].sum()
        tc = tv.to_numpy(dtype=np.float64)
        c_less = np.cumsum(tc) - tc
        mid = c_less + (tc + 1.0) / 2.0           # exact half-integers
        mr = pd.Series(mid, index=tv.index)
        h["_rg"] = mr.reindex(h["_ci"]).to_numpy() * h["_cnt"].to_numpy()
        g = h.groupby("g", sort=True)
        rg = g["_rg"].sum().to_numpy(dtype=np.float64)   # exact halves
        ng = g["_cnt"].sum().to_numpy(dtype=np.float64)
        n = np.float64(tc.sum())
        k = len(rg)
        # left-fold in sorted-group order == list_reduce(... ORDER BY g)
        s = np.cumsum(rg * rg / ng)[-1]
        hstat = np.float64(12.0) / (n * (n + np.float64(1.0))) * s \
            - np.float64(3.0) * (n + np.float64(1.0))
        t_term = np.float64((tc * tc * tc - tc).sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.float64(1.0) - t_term / (n * n * n - n)
            h_adj = hstat / c if c > 0 else np.float64(np.nan)
        return pd.DataFrame({
            "n": pd.Series([int(n)], dtype="int64"),
            "k_groups": pd.Series([k], dtype="int64"),
            "dof": pd.Series([k - 1], dtype="int64"),
            "h": [float(hstat)],
            "h_adj": [float(h_adj)]})

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None)
    )


def ordinal_association(
    ds: Dataset,
    *,
    col_a: str,
    col_b: str,
    num_partitions: int = 8,
) -> Dataset:
    """Goodman–Kruskal gamma + Kendall tau-b between two ORDINAL integer
    columns, computed from the contingency table — the ordered-category
    sibling of :func:`~.distinct.chi2_independence` (which ignores
    order): does more of A systematically come with more of B?

    All pair counts are EXACT int64 folds over cells: concordant
    ``C = Σ_xy O_x·O_y`` over cell pairs strictly increasing in both
    coords (each unordered row pair counted once), discordant ``D``
    over opposite-moving pairs, tie terms from the marginals
    (``T_a = Σ n_i(n_i−1)/2``).  ``gamma = (C−D)/(C+D)``;
    ``tau_b = (C−D)/√((n₀−T_a)(n₀−T_b))`` with the product taken in
    DOUBLE (n₀² overflows int64 at ~10⁸ rows).  The suffix-sum matrix
    sweep is O(r·c) after one tiny combiner exchange — row count never
    matters.  Output: one row ``n, conc, disc, gamma, tau_b`` (floats
    NULL on degenerate 0/0).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"a": pc.cast(t[col_a], pa.int64()),
                        "b": pc.cast(t[col_b], pa.int64())})
        out = tbl.combine_chunks().group_by(
            ["a", "b"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["a", "b"], agg_cols=[("o", "sum")], pkey_col="a",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n": pd.Series([], dtype="int64"),
                "conc": pd.Series([], dtype="int64"),
                "disc": pd.Series([], dtype="int64"),
                "gamma": pd.Series([], dtype="float64"),
                "tau_b": pd.Series([], dtype="float64")})
        piv = df.pivot_table(index="a", columns="b", values="o",
                             aggfunc="sum", fill_value=0).sort_index()
        o = piv.to_numpy(dtype=np.int64)
        # 2D strict suffix sums: S_lo_hi[i,j] = Σ O[i'>i, j'>j], etc.
        ext = np.zeros((o.shape[0] + 1, o.shape[1] + 1), dtype=np.int64)
        ext[:-1, :-1] = o
        suf = np.flip(np.cumsum(np.cumsum(
            np.flip(ext, (0, 1)), axis=0), axis=1), (0, 1))
        conc = int((o * suf[1:, 1:]).sum())
        # discordant: strict down-suffix per column, then a strict left
        # prefix over it — inner[i,j] = Σ_{i'>i, j'<j} O[i',j']
        down = np.flip(np.cumsum(np.flip(ext, 0), axis=0), 0)[1:, :-1]
        left_prefix = np.concatenate(
            [np.zeros((o.shape[0], 1), dtype=np.int64),
             np.cumsum(down, axis=1)[:, :-1]], axis=1)
        disc = int((o * left_prefix).sum())
        n = int(o.sum())
        n0 = n * (n - 1) // 2
        ra = o.sum(axis=1)
        cb = o.sum(axis=0)
        ta = int((ra * (ra - 1) // 2).sum())
        tb = int((cb * (cb - 1) // 2).sum())
        cd = conc - disc
        gamma = (cd / float(conc + disc)) if (conc + disc) > 0 else np.nan
        den = np.sqrt(float(n0 - ta) * float(n0 - tb))
        tau_b = cd / den if den > 0 else np.nan
        return pd.DataFrame({
            "n": pd.Series([n], dtype="int64"),
            "conc": pd.Series([conc], dtype="int64"),
            "disc": pd.Series([disc], dtype="int64"),
            "gamma": [gamma], "tau_b": [tau_b]})

    return counts.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def friedman_test(
    ds: Dataset,
    *,
    block_col: str,
    treat_col: str,
    value_col: str,
) -> Dataset:
    """Friedman test over a (block × treatment) value grid: do the
    treatments rank consistently differently across blocks?  The
    blocked sibling of :func:`~.robust` Kruskal–Wallis — e.g. blocks =
    days, treatments = event types, value = daily total.

    The grid is COMPLETED with zeros (absent (block, treatment) = "no
    activity", a legitimate total), mid-ranks are taken within each
    block, and the tie-robust form is used:

        A = Σ r_ij² − b·k·(k+1)²/4      B = Σ_j (R_j − b(k+1)/2)²
        χ²_F = (k−1)·B / A              (NULL when A = 0: all tied)

    Mid-ranks are exact .5 multiples and every sum is over small exact
    floats, so the statistic matches the SQL window-rank twin bit-for-
    bit.  One tiny (block, treat, int-sum) combiner exchange; the rank
    matrix finalizes on one partition (b×k is small by construction).
    Output: one row ``n_blocks, k_treatments, chi2_f``.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"blk": t[block_col], "trt": t[treat_col],
                        "sv": pc.cast(t[value_col], pa.int64())})
        out = tbl.combine_chunks().group_by(
            ["blk", "trt"], use_threads=False).aggregate([("sv", "sum")])
        return out.rename_columns(["blk", "trt", "sv"])

    partials = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["blk", "trt"], agg_cols=[("sv", "sum")],
        pkey_col="blk", num_partitions=8)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_blocks": pd.Series([], dtype="int64"),
                "k_treatments": pd.Series([], dtype="int64"),
                "chi2_f": pd.Series([], dtype="float64")})
        piv = df.pivot_table(index="blk", columns="trt", values="sv",
                             aggfunc="sum", fill_value=0)
        b, k = piv.shape
        if k < 2:
            return pd.DataFrame({
                "n_blocks": pd.Series([b], dtype="int64"),
                "k_treatments": pd.Series([k], dtype="int64"),
                "chi2_f": pd.Series([np.nan], dtype="float64")})
        r = piv.rank(axis=1, method="average").to_numpy(dtype=np.float64)
        rj = r.sum(axis=0)
        big_b = ((rj - b * (k + 1) / 2.0) ** 2).sum()
        big_a = (r * r).sum() - b * k * (k + 1) * (k + 1) / 4.0
        chi2 = np.float64(k - 1) * np.float64(big_b) / np.float64(big_a)
        return pd.DataFrame({
            "n_blocks": pd.Series([b], dtype="int64"),
            "k_treatments": pd.Series([k], dtype="int64"),
            "chi2_f": [float(chi2) if np.isfinite(chi2) else np.nan]})

    return partials.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def cliffs_delta(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    num_partitions: int = 8,
) -> Dataset:
    """Cliff's delta between two groups over an INTEGER value column:
    ``δ = (#(x₁ > x₀) − #(x₁ < x₀)) / (n₀·n₁)`` — the distribution-free
    effect size that accompanies the Mann–Whitney TEST (how often does
    group 1 beat group 0, net), robust where Cohen's d is not.

    ``group_col`` must be 0/1 int.  Pair counts come from per-value
    counts sorted by value — ``conc = Σ_v c₁(v)·(Σ_{v'<v} c₀(v'))``
    (one cumulative sum, exact int64; identical algebra to the SQL
    window twin), never from materialized pairs, so row count enters
    only the tiny per-value combiner.  Output: one row
    ``n_0, n_1, conc, disc, delta`` (δ NULL when either group is
    empty); no row on empty input.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"g": pc.cast(t[group_col], pa.int64()),
                        "v": pc.cast(t[value_col], pa.int64())})
        out = tbl.combine_chunks().group_by(
            ["g", "v"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["g", "v"], agg_cols=[("o", "sum")], pkey_col="v",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_0": pd.Series([], dtype="int64"),
                "n_1": pd.Series([], dtype="int64"),
                "conc": pd.Series([], dtype="int64"),
                "disc": pd.Series([], dtype="int64"),
                "delta": pd.Series([], dtype="float64")})
        piv = df.pivot_table(index="v", columns="g", values="o",
                             aggfunc="sum", fill_value=0).sort_index()
        ca = (piv[0].to_numpy(dtype=np.int64) if 0 in piv.columns
              else np.zeros(len(piv), dtype=np.int64))
        cb = (piv[1].to_numpy(dtype=np.int64) if 1 in piv.columns
              else np.zeros(len(piv), dtype=np.int64))
        below = np.concatenate([[0], np.cumsum(ca)[:-1]])
        na, nb = int(ca.sum()), int(cb.sum())
        conc = int((cb * below).sum())
        disc = int((cb * (na - below - ca)).sum())
        delta = ((conc - disc) / float(na * nb)
                 if na > 0 and nb > 0 else np.nan)
        return pd.DataFrame({
            "n_0": pd.Series([na], dtype="int64"),
            "n_1": pd.Series([nb], dtype="int64"),
            "conc": pd.Series([conc], dtype="int64"),
            "disc": pd.Series([disc], dtype="int64"),
            "delta": [delta]})

    return counts.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def durbin_watson(
    ds: Dataset,
    *,
    key: str,
    order_col: str,
    value_col: str,
    min_n: int = 3,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Durbin–Watson statistic of the OLS-detrended series: is
    what the linear trend leaves behind serially correlated (DW ≪ 2:
    momentum the trend line missed; ≈2: white noise; ≫2: alternation)?
    The regression-residual sibling of :func:`~.trend.lag1_autocorr`.

    Duplicate ``(key, order)`` rows are SUMMED first (feed integer
    values, e.g. daily cents), ``order`` is re-based to ``t − min(t)``
    per key, and everything reduces to EXACT integer moments —
    ``n, Σt, Σy, Σt², Σty, Σy²`` plus the consecutive-delta moments
    ``ΣΔy², ΣΔyΔt, ΣΔt²`` — pushed through ONE fixed float expression
    tree shared with the SQL twin::

        b   = (Σty − ΣtΣy/n) / (Σt² − ΣtΣt/n)
        den = (Σy² − ΣyΣy/n) − 2·b·sty_c + b·b·stt_c
        dw  = (ΣΔy² − 2·b·ΣΔyΔt + b·b·ΣΔt²) / den

    so both sides agree bit-for-bit (den = 0 ⇒ perfect fit ⇒ NULL).
    One ``_pkey`` exchange, vectorized inside the partition.  Output:
    ``key, n_obs, slope, dw``.
    """

    def dw_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [],
                "n_obs": pd.Series([], dtype="int64"),
                "slope": pd.Series([], dtype="float64"),
                "dw": pd.Series([], dtype="float64")})
        g = (df.groupby([key, order_col], sort=False, as_index=False)
             [value_col].sum())
        g = g.sort_values([key, order_col], kind="mergesort")
        k_all = g[key].to_numpy()
        t_raw = g[order_col].to_numpy(dtype=np.int64)
        y_i = g[value_col].to_numpy(dtype=np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(g)]])
        gid = np.repeat(np.arange(len(starts) - 1),
                        np.diff(starts))
        nk = len(starts) - 1
        # integer moments: np.bincount(weights=...) accumulates in
        # float64 and silently rounds past 2^53 (sum(y²) on cent-scale
        # daily totals reaches ~1e16) — the SQL twin sums in BIGINT, so
        # accumulate int64 exactly and cast ONCE at the expression tree
        t_i = t_raw - t_raw[starts[:-1]][gid]

        def isum(w: np.ndarray) -> np.ndarray:
            acc = np.zeros(nk, dtype=np.int64)
            np.add.at(acc, gid, w)
            return acc

        n = np.diff(starts).astype(np.float64)
        st = isum(t_i).astype(np.float64)
        sy = isum(y_i).astype(np.float64)
        stt = isum(t_i * t_i).astype(np.float64)
        sty = isum(t_i * y_i).astype(np.float64)
        syy = isum(y_i * y_i).astype(np.float64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = k_all[1:] == k_all[:-1]
        dy = np.zeros(len(g), dtype=np.int64)
        dt = np.zeros(len(g), dtype=np.int64)
        dy[1:] = y_i[1:] - y_i[:-1]
        dt[1:] = t_i[1:] - t_i[:-1]
        dy = np.where(same, dy, 0)
        dt = np.where(same, dt, 0)
        dyy = isum(dy * dy).astype(np.float64)
        dty = isum(dy * dt).astype(np.float64)
        dtt = isum(dt * dt).astype(np.float64)
        keep = n >= min_n
        with np.errstate(invalid="ignore", divide="ignore"):
            sty_c = sty - st * sy / n
            stt_c = stt - st * st / n
            syy_c = syy - sy * sy / n
            b = sty_c / stt_c
            den = syy_c - 2.0 * b * sty_c + b * b * stt_c
            dw = (dyy - 2.0 * b * dty + b * b * dtt) / den
        dw = np.where(np.isfinite(dw), dw, np.nan)
        b = np.where(np.isfinite(b), b, np.nan)
        return pd.DataFrame({
            key: k_all[starts[:-1]][keep],
            "n_obs": n[keep].astype(np.int64),
            "slope": b[keep],
            "dw": dw[keep]})

    return grouped_apply(ds, keys=[key], fn=dw_partition,
                         num_partitions=num_partitions, whole_partition=True)


def yuen_trimmed_t(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    trim_den: int = 5,
    num_partitions: int = 8,
) -> Dataset:
    """Yuen's trimmed-mean t-test between two groups (0/1 in
    ``group_col``) over an INTEGER value column — the robust two-sample
    location test that survives heavy tails where Welch's t does not:
    per group trim ``k = N // trim_den`` observations from EACH end,
    compare trimmed means with winsorized variances::

        d_g = (N_g − 1)·s²w_g / (h_g·(h_g − 1)),   h = N − 2k
        t   = (x̄t₁ − x̄t₀) / √(d₀ + d₁)
        df  = (d₀ + d₁)² / (d₀²/(h₀−1) + d₁²/(h₁−1))

    Trim counts use INTEGER division (k = N // trim_den) so both sides
    pick identical cut ranks with no 0.2·N float-floor ambiguity.  All
    selection happens on per-value count cells (one tiny combiner
    exchange): middle-section sums come from clipped cumulative counts,
    the winsorized tails from the exact (k+1)-th / (N−k)-th order
    statistics — row count never enters the fold, and every sum is an
    exact integer, so t and df flow through one fixed float tree shared
    with the SQL window twin.  Output: one row ``h_0, h_1, tmean_0,
    tmean_1, t_stat, df`` — only when both groups have h ≥ 2 (else no
    row, matching the twin's inner join).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"g": pc.cast(t[group_col], pa.int64()),
                        "v": pc.cast(t[value_col], pa.int64())})
        out = tbl.combine_chunks().group_by(
            ["g", "v"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["g", "v"], agg_cols=[("o", "sum")], pkey_col="v",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "h_0": pd.Series([], dtype="int64"),
            "h_1": pd.Series([], dtype="int64"),
            "tmean_0": pd.Series([], dtype="float64"),
            "tmean_1": pd.Series([], dtype="float64"),
            "t_stat": pd.Series([], dtype="float64"),
            "df": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        stats = {}
        for gval, sub in df.groupby("g", sort=True):
            sub = (sub.groupby("v", sort=True, as_index=False)["o"].sum())
            v = sub["v"].to_numpy(dtype=np.int64)
            o = sub["o"].to_numpy(dtype=np.int64)
            cum = np.cumsum(o)
            lo = cum - o
            n = int(cum[-1])
            k = n // trim_den
            h = n - 2 * k
            if h < 2:
                continue
            cnt_mid = np.clip(np.minimum(cum, n - k)
                              - np.maximum(lo, k), 0, None)
            mid_sum = int((v * cnt_mid).sum())
            mid_ss = int((v * v * cnt_mid).sum())
            v_low = int(v[np.searchsorted(cum, k, side="right")])
            v_high = int(v[np.searchsorted(cum, n - k, side="left")])
            win_sum = mid_sum + k * v_low + k * v_high
            win_ss = mid_ss + k * v_low * v_low + k * v_high * v_high
            tmean = mid_sum / np.float64(h)
            s2w = ((win_ss - win_sum * np.float64(win_sum) / n)
                   / np.float64(n - 1))
            # np.float64 all the way down: degenerate 0/0 later must
            # yield nan -> NULL (Python floats would raise instead)
            d = s2w * (n - 1) / np.float64(h * (h - 1))
            stats[int(gval)] = (h, np.float64(tmean), np.float64(d))
        if 0 not in stats or 1 not in stats:
            return empty
        h0, tm0, d0 = stats[0]
        h1, tm1, d1 = stats[1]
        with np.errstate(invalid="ignore", divide="ignore"):
            t_stat = (tm1 - tm0) / np.sqrt(d0 + d1)
            dfree = ((d0 + d1) * (d0 + d1)
                     / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1)))
        return pd.DataFrame({
            "h_0": pd.Series([h0], dtype="int64"),
            "h_1": pd.Series([h1], dtype="int64"),
            "tmean_0": [tm0], "tmean_1": [tm1],
            "t_stat": [float(t_stat) if np.isfinite(t_stat) else np.nan],
            "df": [float(dfree) if np.isfinite(dfree) else np.nan]})

    return counts.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def seasonal_mann_kendall(
    ds: Dataset,
    *,
    season_col: str,
    order_col: str,
    value_col: str,
    min_n: int = 2,
    max_key_rows: int = 20_000,
    num_partitions: int = 8,
) -> Dataset:
    """Seasonal (Hirsch–Slack) Mann–Kendall: run MK independently inside
    each season (e.g. weekday) and combine — ``S = Σ_s S_s``,
    ``Var = Σ_s Var_s`` — so a strong weekly cycle can't masquerade as
    (or mask) a monotone trend the way it does in plain
    :func:`mann_kendall`.

    Per-season variance contributions stay INTEGER numerators
    (`_mk_s_varnum`) and are summed exactly before the single /18.0, so
    the combined z is bit-exact against the SQL twin (7 per-season
    ``x/18.0`` floats summed in arbitrary order would not be).
    Duplicate ``(season, order)`` rows are summed first (feed integer
    values).  One season-hash exchange, one-row output:
    ``n_seasons, n_obs, s_stat, var_s, z`` (no row when no season
    reaches ``min_n``).
    """

    def mk_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "season": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="int64"),
            "vn": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        g = (df.groupby([season_col, order_col], sort=False,
                        as_index=False)[value_col].sum())
        g = g.sort_values([season_col, order_col], kind="mergesort")
        v_all = g[value_col].to_numpy()
        k_all = g[season_col].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(g)]])
        rows = []
        for s, e in zip(starts[:-1], starts[1:]):
            n = int(e - s)
            if n < min_n:
                continue
            if n > max_key_rows:
                raise ValueError(
                    f"seasonal_mann_kendall: season {k_all[s]!r} has "
                    f"{n} points > max_key_rows={max_key_rows}")
            s_stat, vn = _mk_s_varnum(v_all[s:e])
            rows.append((int(k_all[s]), n, s_stat, vn))
        if not rows:
            return empty
        a = np.array(rows, dtype=np.int64)
        return pd.DataFrame({"season": a[:, 0], "n": a[:, 1],
                             "s": a[:, 2], "vn": a[:, 3]})

    per_season = grouped_apply(ds, keys=[season_col], fn=mk_partition,
                               num_partitions=num_partitions,
                               whole_partition=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_seasons": pd.Series([], dtype="int64"),
                "n_obs": pd.Series([], dtype="int64"),
                "s_stat": pd.Series([], dtype="int64"),
                "var_s": pd.Series([], dtype="float64"),
                "z": pd.Series([], dtype="float64")})
        s = int(df["s"].sum())
        vn = int(df["vn"].sum())
        var_s = vn / 18.0
        if s > 0:
            z = (s - 1) / np.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / np.sqrt(var_s)
        else:
            z = 0.0
        return pd.DataFrame({
            "n_seasons": pd.Series([len(df)], dtype="int64"),
            "n_obs": pd.Series([int(df["n"].sum())], dtype="int64"),
            "s_stat": pd.Series([s], dtype="int64"),
            "var_s": [var_s], "z": [float(z)]})

    return per_season.repartition(1).map_batches(
        combine, batch_format="pandas", batch_size=None)


def binary_runs_test(
    ds: Dataset,
    *,
    key: str,
    flag_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Wald–Wolfowitz runs test on an explicit BINARY sequence per key
    (no median split): with n₀ zeros, n₁ ones and R observed runs,

        μ = 2·n₀·n₁/(n₀+n₁) + 1
        σ² = 2·n₀·n₁·(2·n₀·n₁ − n₀ − n₁) / ((n₀+n₁)²·(n₀+n₁−1))
        z = (R − μ)/σ

    — z ≪ 0: the two symbols clump (monologue streaks); z ≫ 0: they
    alternate more than chance (strict turn-taking).  The dialog-shaped
    sibling of :func:`runs_test`; all counts are exact ints and z flows
    through one fixed float tree (degenerate single-symbol or n=1 keys
    give 0/0 → NULL on both sides).

    One key-hash exchange, vectorized boundary counting inside the
    partition.  Output: ``key, n_zero, n_one, n_runs, z``.
    """
    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey",
                               _stable_pkey(t[key], num_partitions))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [],
                "n_zero": pd.Series([], dtype="int64"),
                "n_one": pd.Series([], dtype="int64"),
                "n_runs": pd.Series([], dtype="int64"),
                "z": pd.Series([], dtype="float64")})
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        k_all = df[key].to_numpy()
        b = df[flag_col].to_numpy(dtype=np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        gid = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        nk = len(starts) - 1
        same = np.zeros(len(df), dtype=bool)
        same[1:] = k_all[1:] == k_all[:-1]
        flip = np.zeros(len(df), dtype=np.float64)
        flip[1:] = (b[1:] != b[:-1]) & same[1:]
        n1 = np.bincount(gid, weights=b.astype(np.float64), minlength=nk)
        ntot = np.diff(starts).astype(np.float64)
        n0 = ntot - n1
        r = 1.0 + np.bincount(gid, weights=flip, minlength=nk)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = 2.0 * n0 * n1 / (n0 + n1) + 1.0
            sig2 = (2.0 * n0 * n1 * (2.0 * n0 * n1 - n0 - n1)
                    / ((n0 + n1) * (n0 + n1) * (n0 + n1 - 1.0)))
            z = (r - mu) / np.sqrt(sig2)
        z = np.where(np.isfinite(z), z, np.nan)
        return pd.DataFrame({
            key: k_all[starts[:-1]],
            "n_zero": n0.astype(np.int64),
            "n_one": n1.astype(np.int64),
            "n_runs": r.astype(np.int64),
            "z": z})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fold,
                                              batch_format="pandas")


def median_test(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    scale: int = 100,
    num_partitions: int = 8,
) -> Dataset:
    """Brown–Mood k-sample median test: counts above vs at-or-below the
    POOLED lower median per group, then the k × observed-above-levels
    chi-square — the median-only sibling of :func:`kruskal_wallis`
    (needs one order statistic, not full ranks).

    Values quantize to int64 (``round(x·scale)`` half-away recipe); the
    pooled median is the exact element at sorted index ⌈n/2⌉−1
    (== DuckDB ``quantile_disc(0.5)``), all counts are exact, and the
    grid keeps OBSERVED above-levels only so a constant corpus
    collapses to k×1 with χ² = 0 on both sides.  Per-value cells cross
    one tiny exchange; the fold is a single partition.  Output: one row
    ``n, k_groups, pooled_median, chi2``.
    """
    from .dedup import _grouped_min

    def part(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        ci = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                         v).astype(np.int64)
        out = pa.table({"ty": t[group_col], "v": pa.array(ci)})
        out = out.combine_chunks().group_by(
            ["ty", "v"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["ty", "v", "o"])

    cells = _grouped_min(
        ds.map_batches(part, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["ty", "v"], agg_cols=[("o", "sum")], pkey_col="v",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n": pd.Series([], dtype="int64"),
                "k_groups": pd.Series([], dtype="int64"),
                "pooled_median": pd.Series([], dtype="float64"),
                "chi2": pd.Series([], dtype="float64")})
        g = df.groupby(["ty", "v"], sort=True, as_index=False)["o"].sum()
        vs = g.groupby("v", sort=True)["o"].sum()
        vals = vs.index.to_numpy(dtype=np.int64)
        cum = np.cumsum(vs.to_numpy(dtype=np.int64))
        n = int(cum[-1])
        med = int(vals[np.searchsorted(cum, (n + 1) // 2, side="left")])
        g["above"] = (g["v"].to_numpy() > med).astype(np.int64)
        tab = (g.groupby(["ty", "above"], sort=True)["o"].sum()
               .unstack(fill_value=0))
        obs = tab.to_numpy(dtype=np.float64)
        rs = obs.sum(axis=1)
        cs = obs.sum(axis=0)
        e = np.outer(rs, cs) / np.float64(n)
        with np.errstate(invalid="ignore", divide="ignore"):
            chi2 = float(((obs - e) ** 2 / e).sum())
        return pd.DataFrame({
            "n": pd.Series([n], dtype="int64"),
            "k_groups": pd.Series([obs.shape[0]], dtype="int64"),
            "pooled_median": [med / np.float64(scale)],
            "chi2": [chi2 if np.isfinite(chi2) else np.nan]})

    return cells.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def xicor(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    min_n: int = 3,
    num_partitions: int = 64,
) -> Dataset:
    """Chatterjee's rank correlation ξ (Chatterjee 2021, JASA "A New
    Coefficient of Correlation") per key: does ``value_col`` depend on
    the ``order_by`` position AT ALL — linearly, periodically, or any
    other measurable way?  ξ ≈ 0 for independence, → 1 as y becomes a
    noiseless function of the order; unlike Spearman/Kendall it detects
    NON-monotone dependence (a V-shape scores 0 for both classical
    rank correlations, positive for ξ).

    Tie-robust integer formulation (the general-ties estimator)::

        r_i = #{j: y_j ≤ y_i},  l_i = #{j: y_j ≥ y_i}
        ξ   = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i))

    with i running in ``order_by`` order.  Every count is an exact
    int64 (searchsorted against the key's sorted values) and the final
    expression is one fixed float tree, so the SQL twin — max-rank via
    ``count(*) − rank() DESC + 1``, the lag-diff via ``lead`` — hashes
    identically.  Keys with zero y-variance emit NULL (denominator 0),
    matching SQL float 0/0 → NULL.

    One ``_pkey`` exchange (grouped_apply), vectorized per key inside
    the partition.  Output: ``key, n_obs, xi`` sorted upstream by the
    caller.
    """
    from .grouped import grouped_apply

    def xi_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_obs": pd.Series([], dtype="int64"),
            "xi": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([key] + order_by, kind="mergesort")
        k_all = df[key].to_numpy()
        y_all = df[value_col].to_numpy(dtype=np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        keys_o, ns, xis = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            n = int(e - s)
            if n < min_n:
                continue
            y = y_all[s:e]
            ys = np.sort(y)
            r = np.searchsorted(ys, y, side="right").astype(np.int64)
            li = n - np.searchsorted(ys, y, side="left").astype(np.int64)
            s1 = int(np.abs(np.diff(r)).sum())
            s2 = int((li * (n - li)).sum())
            with np.errstate(invalid="ignore", divide="ignore"):
                xi = 1.0 - (np.float64(n) * np.float64(s1)) \
                    / (2.0 * np.float64(s2))
            keys_o.append(k_all[s])
            ns.append(n)
            xis.append(xi if np.isfinite(xi) else np.nan)
        return pd.DataFrame({
            key: keys_o,
            "n_obs": pd.Series(ns, dtype="int64"),
            "xi": pd.Series(xis, dtype="float64")})

    return grouped_apply(ds, keys=[key], fn=xi_partition,
                         num_partitions=num_partitions,
                         whole_partition=True)


def kendalls_w(
    ds: Dataset,
    *,
    judge_col: str,
    object_col: str,
    value_col: str,
    num_partitions: int = 16,
) -> Dataset:
    """Kendall's coefficient of concordance W: do the ``judge_col``
    series agree on how the ``object_col`` instances rank by
    ``value_col``?  (Do all event types rank the same days as
    high-activity days?)  W = 1 perfect agreement, → 0 independent
    rankings — the multi-judge generalization of the pairwise rank
    correlations (Spearman is W for m = 2 up to an affine map).

    Tie-corrected estimator over the m×n complete block (only objects
    every judge scored enter — the twin's HAVING count(*) = m)::

        W = [12·Σ_d R_d² − 3·m²·n·(n+1)²] / [m²·n·(n²−1) − m·ΣT_j]

    with R_d = Σ_j avgrank_j(d) and T_j = Σ_ties (t³−t).  Average
    ranks are half-integers, so the fold carries DOUBLED ranks as exact
    int64 (12/4 → the numerator becomes 3·(ΣR2² − m²n(n+1)²)) and the
    single division is one fixed float tree — hash-exact against the
    AVG(row_number)-window SQL twin.  Degenerate cases (n < 2, or every
    judge all-tied ⇒ denominator 0) emit NULL.

    Shape: per-batch (judge, object, v) integer partials cross one
    judge-hash exchange for exact sums, then ONE tiny m×n final fold.
    Output: one row ``n_judges, n_objects, w``.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"j": t[judge_col], "o": t[object_col],
                        "v": pc.cast(t[value_col], pa.int64())})
        out = tbl.combine_chunks().group_by(
            ["j", "o"], use_threads=False).aggregate([("v", "sum")])
        return out.rename_columns(["j", "o", "v"])

    sums = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["j", "o"], agg_cols=[("v", "sum")], pkey_col="j",
        num_partitions=num_partitions)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_judges": pd.Series([], dtype="int64"),
            "n_objects": pd.Series([], dtype="int64"),
            "w": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df["j"].nunique()
        cnt = df.groupby("o", sort=False)["j"].nunique()
        keep_o = cnt[cnt == m].index
        df = df[df["o"].isin(keep_o)]
        n = df["o"].nunique()
        if n < 2 or m < 1:
            return pd.DataFrame({
                "n_judges": pd.Series([m], dtype="int64"),
                "n_objects": pd.Series([n], dtype="int64"),
                "w": pd.Series([np.nan], dtype="float64")})
        # doubled average ranks per judge: 2*avgrank over ties of v
        df = df.sort_values(["j", "v", "o"], kind="mergesort")
        rn = df.groupby("j", sort=False).cumcount().to_numpy() + 1
        df = df.assign(_rn=rn)
        g = df.groupby(["j", "v"], sort=False)["_rn"]
        # 2*avg(rn) over the tie group = (min+max) of rn (consecutive ints)
        r2 = (g.transform("min") + g.transform("max")).to_numpy(np.int64)
        df = df.assign(_r2=r2)
        R2 = df.groupby("o", sort=False)["_r2"].sum().to_numpy(np.int64)
        tie_sizes = df.groupby(["j", "v"], sort=False).size().to_numpy(
            np.int64)
        T = int((tie_sizes ** 3 - tie_sizes).sum())
        mm, nn = int(m), int(n)
        num = 3 * (int((R2.astype(object) ** 2).sum())
                   - mm * mm * nn * (nn + 1) * (nn + 1))
        den = mm * mm * nn * (nn * nn - 1) - mm * T
        w = (np.float64(num) / np.float64(den)) if den != 0 else np.nan
        return pd.DataFrame({
            "n_judges": pd.Series([mm], dtype="int64"),
            "n_objects": pd.Series([nn], dtype="int64"),
            "w": pd.Series([w], dtype="float64")})

    return sums.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)
