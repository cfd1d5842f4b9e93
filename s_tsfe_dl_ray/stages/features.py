"""Per-key series feature extraction — the tsfresh-style battery.

The reference IS a feature-extraction library (TSFE-DL: every model's
convolutional head is a learned feature extractor over a windowed
series, models_keras.py), and its experiments hand-compute classical
statistics around the models (top-k thresholds over scored windows,
keras_experiment.py:583-593).  This module supplies the classical
per-series feature vector a production pipeline computes BEFORE/WITHOUT
a model — the standard tsfresh/TSFEL catalogue members that are exactly
SQL-twinnable:

- :func:`grouped_moments`    — distributed 3rd/4th standardized central
                               moments (skewness g1, excess kurtosis g2)
- :func:`ts_feature_battery` — ordered-series features: abs energy, mean
                               absolute change, mean-crossing count,
                               count above mean, longest strike above
                               mean, first location of maximum
- :func:`ts_complexity_battery` — nonlinearity/complexity features: c3,
                               time-reversal asymmetry, CID-CE, peak
                               count, binned entropy
- :func:`ts_location_battery` — location/dispersion features: extreme
                               positions, index mass quantile, second
                               derivative, beyond-2σ ratio, uniqueness
- :func:`interarrival_stats` — event-cadence profile: gap count,
                               mean/min/max/variance of inter-arrival
                               seconds (exact µs integer core)
- :func:`energy_by_chunks`   — NTILE-segmented energy shares (where in
                               time the power sits)

Scale design: both ops ride the engine's standard ``_pkey`` exchange
(stages/grouped.grouped_apply, whole_partition=True) — ONE coarse hash
shuffle, then every statistic is a vectorized pandas/numpy kernel across
ALL keys of the partition (cython groupby sums, shift/cumsum run logic);
no per-key Python apply anywhere.  Key-complete co-location is the only
partitioning assumption.

Exactness notes (oracle parity): moments are TWO-PASS — the per-key mean
is computed first, then centered power sums.  Centered sums of ~uniform
magnitudes are well-conditioned (relative error ~1e-16·√n), so the
6-decimal driver rounding matches DuckDB computing the same two-pass
formula even though summation orders differ.  Never compute skewness
from raw power sums E[x³]-style — the cancellation there DOES flip the
6th decimal at ~1e8 magnitudes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .grouped import grouped_apply


def grouped_moments(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key mean + population skewness/excess kurtosis.

    Output: ``key, n_events, mean, skew_g1, kurt_excess`` where
    ``g1 = m3 / m2^1.5`` and ``g2 = m4 / m2² − 3`` over population
    central moments ``m_k = Σ(x−mean)^k / n``.  Keys with zero variance
    (or n == 1) yield NULL for both (0/0 → NULL, matching SQL division
    semantics).
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_events": pd.Series([], dtype="int64"),
                                 "mean": [], "skew_g1": [], "kurt_excess": []})
        g = df.groupby(key, sort=False)[value_col]
        mu = g.mean()
        d = df[value_col] - df[key].map(mu)
        kg = df[key]
        d2 = (d * d).groupby(kg, sort=False).sum()
        d3 = (d * d * d).groupby(kg, sort=False).sum()
        d4 = (d * d * d * d).groupby(kg, sort=False).sum()
        n = g.size().astype("float64")
        m2 = d2 / n
        m3 = d3 / n
        m4 = d4 / n
        with np.errstate(divide="ignore", invalid="ignore"):
            skew = m3 / np.power(m2, 1.5)
            kurt = m4 / (m2 * m2) - 3.0
        skew[m2 == 0.0] = np.nan
        kurt[m2 == 0.0] = np.nan
        return pd.DataFrame({
            key: mu.index.to_numpy(),
            "n_events": g.size().reindex(mu.index).to_numpy(dtype=np.int64),
            "mean": mu.to_numpy(),
            "skew_g1": skew.reindex(mu.index).to_numpy(),
            "kurt_excess": kurt.reindex(mu.index).to_numpy(),
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def ts_feature_battery(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Ordered per-key feature vector (time order = ``(ts_col, id_col)``).

    Output columns (one row per key):

    - ``n_events``
    - ``abs_energy``          — Σ v²
    - ``mean_abs_change``     — mean |v_{i+1} − v_i| (NULL when n < 2)
    - ``n_mean_crossings``    — # of adjacent pairs on opposite sides of
                                the key mean (sides = strict ``v > mean``)
    - ``count_above_mean``    — # of values strictly above the key mean
    - ``longest_strike_above_mean`` — longest consecutive run with
                                ``v > mean`` (0 when none)
    - ``first_loc_max``       — 1-based position (time order) of the
                                first occurrence of the maximum
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: [], "n_events": pd.Series([], dtype="int64"),
                "abs_energy": [], "mean_abs_change": [],
                "n_mean_crossings": pd.Series([], dtype="int64"),
                "count_above_mean": pd.Series([], dtype="int64"),
                "longest_strike_above_mean": pd.Series([], dtype="int64"),
                "first_loc_max": pd.Series([], dtype="int64")}
        if len(df) == 0:
            return pd.DataFrame(cols)
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        kg = df[key]
        v = df[value_col]
        g = df.groupby(key, sort=False)[value_col]
        mu = g.mean()
        mx = g.max()
        n = g.size()

        abs_energy = (v * v).groupby(kg, sort=False).sum()

        same_key = kg.eq(kg.shift())
        dv = (v - v.shift()).abs()
        mac = dv[same_key].groupby(kg[same_key], sort=False).mean()

        above = v > kg.map(mu)
        count_above = above.groupby(kg, sort=False).sum()

        crossing = same_key & (above != above.shift())
        n_cross = crossing.groupby(kg, sort=False).sum()

        # run-length of `above` streaks: new run on key change or side flip
        new_run = (~same_key) | (above != above.shift())
        run_id = new_run.cumsum()
        run_len = above.groupby(run_id, sort=False).transform("size")
        strike = run_len.where(above, 0).groupby(kg, sort=False).max()

        rn = df.groupby(key, sort=False).cumcount() + 1
        is_max = v == kg.map(mx)
        loc_max = rn.where(is_max).groupby(kg, sort=False).min()

        idx = mu.index
        return pd.DataFrame({
            key: idx.to_numpy(),
            "n_events": n.reindex(idx).to_numpy(dtype=np.int64),
            "abs_energy": abs_energy.reindex(idx).to_numpy(),
            "mean_abs_change": mac.reindex(idx).to_numpy(),
            "n_mean_crossings": n_cross.reindex(idx).to_numpy(dtype=np.int64),
            "count_above_mean": count_above.reindex(idx).to_numpy(dtype=np.int64),
            "longest_strike_above_mean": strike.reindex(idx).to_numpy(dtype=np.int64),
            "first_loc_max": loc_max.reindex(idx).to_numpy(dtype=np.int64),
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def ts_complexity_battery(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bins: int = 10,
    scale: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """Nonlinearity / complexity features per key (time order =
    ``(ts_col, id_col)``) — the tsfresh catalogue members that probe
    structure beyond second moments:

    - ``c3``             — E[x_t · x_{t+1} · x_{t+2}] (Schreiber–Schmitz
                           nonlinearity score)
    - ``time_rev_asym``  — E[x_{t+2}²·x_{t+1} − x_{t+1}·x_t²] (time-
                           reversal asymmetry, lag 1)
    - ``cid_ce``         — √Σ(Δx)² (complexity-invariant distance)
    - ``n_peaks``        — strict local maxima count (support 1)
    - ``binned_entropy`` — Shannon entropy of the ``bins``-bin equal-width
                           value histogram over [min, max]

    Exactness: the cubic statistics are the one place float partial sums
    genuinely flip the 6th decimal (|x|³ terms at ~1e14 summed per key),
    so values are scaled to exact ints (``round(x·scale)``; the synthetic
    tables carry 2-decimal values) and accumulated in extended precision
    (np.longdouble ``add.at`` — exact for partial sums < 2⁶³), then
    converted to double ONCE — the same single rounding DuckDB's
    HUGEINT ``sum(...)::DOUBLE`` performs, so both sides are
    bit-identical.  NULL when a statistic has no valid term (n < 3 for
    the cubics, n < 2 for cid_ce), matching SQL aggregates over empty
    groups.  Bin indices use the identical float expression
    ``floor((x−mn)/(mx−mn)·bins)`` on both sides (single-bin when
    mx == mn).

    One ``_pkey`` exchange; everything inside the partition is numpy
    over all keys at once.
    """
    s3 = float(scale) ** 3

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "n_events": pd.Series([], dtype="int64"),
                "c3": [], "time_rev_asym": [], "cid_ce": [],
                "n_peaks": pd.Series([], dtype="int64"),
                "binned_entropy": []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        k_all = df[key].to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)
        kq = np.round(v * scale).astype(np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk)

        # cubic statistics on exact scaled ints, extended-precision sums
        acc3 = np.zeros(nk, dtype=np.longdouble)
        acct = np.zeros(nk, dtype=np.longdouble)
        cnt3 = np.zeros(nk, dtype=np.int64)
        if len(df) >= 3:
            valid2 = gid[:-2] == gid[2:]
            g2 = gid[:-2][valid2]
            a, b, c = kq[:-2][valid2], kq[1:-1][valid2], kq[2:][valid2]
            np.add.at(acc3, g2, (a * b * c).astype(np.longdouble))
            np.add.at(acct, g2, (c * c * b - b * a * a).astype(np.longdouble))
            cnt3 = np.bincount(g2, minlength=nk)

        accc = np.zeros(nk, dtype=np.longdouble)
        cnt1 = np.zeros(nk, dtype=np.int64)
        if len(df) >= 2:
            valid1 = gid[:-1] == gid[1:]
            g1 = gid[:-1][valid1]
            dk = (kq[1:] - kq[:-1])[valid1]
            np.add.at(accc, g1, (dk * dk).astype(np.longdouble))
            cnt1 = np.bincount(g1, minlength=nk)

        n_peaks = np.zeros(nk, dtype=np.int64)
        if len(df) >= 3:
            interior = (gid[1:-1] == gid[:-2]) & (gid[1:-1] == gid[2:])
            pk = interior & (kq[:-2] < kq[1:-1]) & (kq[1:-1] > kq[2:])
            n_peaks = np.bincount(gid[1:-1][pk], minlength=nk)

        with np.errstate(divide="ignore", invalid="ignore"):
            c3 = np.where(cnt3 > 0,
                          acc3.astype(np.float64) / np.maximum(cnt3, 1) / s3,
                          np.nan)
            tra = np.where(cnt3 > 0,
                           acct.astype(np.float64) / np.maximum(cnt3, 1) / s3,
                           np.nan)
            cid = np.where(cnt1 > 0,
                           np.sqrt(accc.astype(np.float64)) / scale, np.nan)

        # binned entropy — identical float expression to the SQL twin
        g = df.groupby(key, sort=False)[value_col]
        mn = g.min().to_numpy()[gid]
        mx = g.max().to_numpy()[gid]
        width = mx - mn
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((v - mn) / width * bins)
        bin_ix = np.where(width == 0.0, 0.0,
                          np.minimum(raw, bins - 1)).astype(np.int64)
        bc = np.bincount(gid * bins + bin_ix, minlength=nk * bins) \
               .reshape(nk, bins).astype(np.float64)
        p = bc / n[:, None]
        ent = -np.sum(p * np.log(p, out=np.zeros_like(p), where=p > 0),
                      axis=1)

        firsts = np.concatenate([[0], change])
        return pd.DataFrame({
            key: k_all[firsts],
            "n_events": n.astype(np.int64),
            "c3": c3, "time_rev_asym": tra, "cid_ce": cid,
            "n_peaks": n_peaks.astype(np.int64),
            "binned_entropy": ent,
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def ts_location_battery(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    scale: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """Location / dispersion features per key (time order =
    ``(ts_col, id_col)``) — the tsfresh catalogue members about WHERE
    things happen in the series:

    - ``last_loc_max``        — last 1-based position of the maximum
    - ``first_loc_min``       — first 1-based position of the minimum
    - ``imq50_pos``           — index-mass-quantile(0.5): relative
                                position where the running |value| mass
                                first reaches half the total
    - ``mean_2nd_deriv``      — mean central second difference
                                (x_{t+2} − 2x_{t+1} + x_t)/2
    - ``ratio_beyond_2sigma`` — fraction of points with
                                |x − mean| > 2σ (population σ)
    - ``ratio_unique``        — distinct values / n

    Exactness: every comparison that could sit on a float boundary is
    carried out in EXACT integer arithmetic on ``round(x·scale)``
    (values are exact cents): the mass-quantile condition is
    ``2·prefix ≥ total`` on int64 sums, and the 2σ condition is the
    cross-multiplied ``(c·n − S)² > 4(n·SS − S²)`` — numerators of the
    rational mean/variance — evaluated in extended precision, so
    neither side ever computes a float σ.  The only float ops are the
    final single divisions, identical on both sides.
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "n_events": pd.Series([], dtype="int64"),
                "last_loc_max": pd.Series([], dtype="int64"),
                "first_loc_min": pd.Series([], dtype="int64"),
                "imq50_pos": [], "mean_2nd_deriv": [],
                "ratio_beyond_2sigma": [], "ratio_unique": []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        k_all = df[key].to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)
        c = np.round(v * scale).astype(np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk)
        rank = np.arange(len(df), dtype=np.int64) - firsts[gid] + 1

        # extreme locations on exact ints
        cmx = np.full(nk, np.iinfo(np.int64).min, dtype=np.int64)
        cmn = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        np.maximum.at(cmx, gid, c)
        np.minimum.at(cmn, gid, c)
        last_loc = np.zeros(nk, dtype=np.int64)
        at_max = c == cmx[gid]
        np.maximum.at(last_loc, gid[at_max], rank[at_max])
        first_loc = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        at_min = c == cmn[gid]
        np.minimum.at(first_loc, gid[at_min], rank[at_min])

        # index mass quantile 0.5 — exact int condition 2·prefix ≥ total
        a = np.abs(c)
        cs = np.cumsum(a)
        base = np.repeat(cs[firsts] - a[firsts], n)
        prefix = cs - base
        tot = np.zeros(nk, dtype=np.int64)
        np.add.at(tot, gid, a)
        hit = 2 * prefix >= tot[gid]
        imq = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(imq, gid[hit], rank[hit])

        # central second difference on exact ints
        sd = np.zeros(nk, dtype=np.int64)
        cnt3 = np.zeros(nk, dtype=np.int64)
        if len(df) >= 3:
            valid = gid[:-2] == gid[2:]
            g2 = gid[:-2][valid]
            d2 = (c[2:] - 2 * c[1:-1] + c[:-2])[valid]
            np.add.at(sd, g2, d2)
            cnt3 = np.bincount(g2, minlength=nk)

        # 2σ outliers via cross-multiplied rational variance (no float σ)
        S = np.zeros(nk, dtype=np.int64)
        SS = np.zeros(nk, dtype=np.int64)
        np.add.at(S, gid, c)
        np.add.at(SS, gid, c * c)
        lhs = (c * n[gid] - S[gid]).astype(np.longdouble) ** 2
        rhs = (4 * (n * SS - S * S)).astype(np.longdouble)
        beyond = np.zeros(nk, dtype=np.int64)
        over = lhs > rhs[gid]
        np.add.at(beyond, gid[over], 1)

        n_uniq = df.groupby(key, sort=False)[value_col].nunique() \
                   .to_numpy().astype(np.int64)

        with np.errstate(divide="ignore", invalid="ignore"):
            m2d = np.where(cnt3 > 0,
                           sd.astype(np.float64) / (2 * np.maximum(cnt3, 1))
                           / float(scale), np.nan)
        return pd.DataFrame({
            key: k_all[firsts],
            "n_events": n.astype(np.int64),
            "last_loc_max": last_loc,
            "first_loc_min": first_loc,
            "imq50_pos": imq.astype(np.float64) / n,
            "mean_2nd_deriv": m2d,
            "ratio_beyond_2sigma": beyond.astype(np.float64) / n,
            "ratio_unique": n_uniq.astype(np.float64) / n,
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def interarrival_stats(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    id_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key inter-arrival-gap statistics (time order =
    ``(ts_col, id_col)``): gap count, mean/min/max gap seconds, and
    population variance of the gap — the event-cadence profile used for
    rate limiting, anomaly scoring, and Poisson-ness checks.

    Exactness: gaps are exact µs int64 deltas; the MEAN is the exact
    int sum converted to double once (``sum_us::DOUBLE / n / 1e6`` —
    bit-identical to the SQL twin), min/max are exact ints divided
    once.  The variance keeps the engine's proven raw-moment shape
    (``Σd²/n − mean²`` with d = µs/1e6 per element, the SAME float
    expression on both sides — see the ``events_value_variance``
    parity note).  Keys with a single event get NULL gap stats.
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "n_events": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "mean_gap_s": [], "min_gap_s": [], "max_gap_s": [],
                "var_gap_s": []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        k_all = df[key].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk)

        same = gid[:-1] == gid[1:]
        g1 = gid[1:][same]
        dt_us = (ts[1:] - ts[:-1])[same]
        n_gaps = np.bincount(g1, minlength=nk)
        s_us = np.zeros(nk, dtype=np.int64)
        np.add.at(s_us, g1, dt_us)
        mn = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(nk, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, g1, dt_us)
        np.maximum.at(mx, g1, dt_us)
        d = dt_us.astype(np.float64) / 1e6
        sd2 = np.zeros(nk, dtype=np.float64)
        np.add.at(sd2, g1, d * d)

        with np.errstate(divide="ignore", invalid="ignore"):
            ng = np.maximum(n_gaps, 1)
            mean = s_us.astype(np.float64) / ng / 1e6
            var = sd2 / ng - mean * mean
        has = n_gaps > 0
        nanw = lambda x: np.where(has, x, np.nan)  # noqa: E731
        return pd.DataFrame({
            key: k_all[firsts],
            "n_events": n.astype(np.int64),
            "n_gaps": n_gaps.astype(np.int64),
            "mean_gap_s": nanw(mean),
            "min_gap_s": nanw(mn / 1e6),
            "max_gap_s": nanw(mx / 1e6),
            "var_gap_s": nanw(var),
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def energy_by_chunks(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_chunks: int = 10,
    scale: int = 100,
    num_partitions: int = 64,
) -> Dataset:
    """tsfresh ``energy_ratio_by_chunks``: split each key's ordered
    series into ``n_chunks`` NTILE segments (SQL ntile semantics — the
    first ``n mod k`` chunks get the extra row) and report each chunk's
    share of the total energy Σv² — the where-in-time-the-power-sits
    profile.

    Exactness: energies are exact int64 sums of ``round(v·scale)²``;
    the only float op is the final share division, identical on both
    sides.  Keys with n < n_chunks produce only their first n chunks,
    matching ntile.  Output: ``key, chunk (1-based), n_in_chunk,
    energy_frac``.
    """

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key: [], "chunk": pd.Series([], dtype="int64"),
                "n_in_chunk": pd.Series([], dtype="int64"),
                "energy_frac": []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        k_all = df[key].to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)
        kq = np.round(v * scale).astype(np.int64)
        e = kq * kq
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk)
        rank = np.arange(len(df), dtype=np.int64) - firsts[gid] + 1

        # ntile(k): first r = n mod k chunks have q+1 rows (q = n div k)
        q = n // n_chunks
        r = n % n_chunks
        qg, rg = q[gid], r[gid]
        head = rg * (qg + 1)
        in_head = rank <= head
        with np.errstate(divide="ignore", invalid="ignore"):
            chunk = np.where(
                in_head,
                (rank + qg) // np.maximum(qg + 1, 1),
                rg + (rank - head + np.maximum(qg, 1) - 1)
                // np.maximum(qg, 1))
        chunk = chunk.astype(np.int64)

        tot = np.zeros(nk, dtype=np.int64)
        np.add.at(tot, gid, e)
        cid = gid * n_chunks + (chunk - 1)
        ce = np.zeros(nk * n_chunks, dtype=np.int64)
        cn = np.zeros(nk * n_chunks, dtype=np.int64)
        np.add.at(ce, cid, e)
        np.add.at(cn, cid, 1)
        keep = cn > 0
        out_g = np.repeat(np.arange(nk), n_chunks)[keep]
        out_c = np.tile(np.arange(1, n_chunks + 1), nk)[keep]
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(tot[out_g] > 0,
                            ce[keep].astype(np.float64)
                            / np.maximum(tot[out_g], 1), np.nan)
        return pd.DataFrame({
            key: k_all[firsts][out_g],
            "chunk": out_c.astype(np.int64),
            "n_in_chunk": cn[keep].astype(np.int64),
            "energy_frac": frac,
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions, whole_partition=True)


def permutation_entropy(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Per-key order-3 permutation entropy (Bandt–Pompe): Shannon entropy
    of the distribution of ordinal patterns of consecutive value triples
    — the standard model-free complexity measure (white noise → ln 6,
    monotone ramp → 0); the classical sibling of the learned sequence
    features the reference's recurrent heads extract
    (/root/reference/TSFEDL/models_keras.py sequence branches).

    Tie rule: a later element equal to an earlier one ranks HIGHER
    (comparisons are ``>=`` toward the later position), so the pattern
    is total and the SQL twin's CASE expressions reproduce it exactly.
    A triple's pattern is encoded by three pairwise bools
    (b≥a, c≥a, c≥b) → 6 reachable codes of 8.

    One ``_pkey`` co-partition; triples never cross keys (gid-adjacency
    mask); counts via one ``bincount(gid*8+code)``.  Keys with fewer
    than 3 points emit nothing (no triple exists).
    Output: ``key, n_triples, perm_entropy``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: [],
                              "n_triples": pd.Series([], dtype="int64"),
                              "perm_entropy": []})
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        m = len(df)
        if m < 3:
            return empty
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        gid = np.zeros(m, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        a, b, c = v[:-2], v[1:-1], v[2:]
        valid = gid[:-2] == gid[2:]
        code = ((b >= a).astype(np.int64) * 4 + (c >= a) * 2 + (c >= b))
        cell = gid[:-2] * 8 + code
        counts = np.bincount(cell[valid], minlength=nk * 8).reshape(nk, 8)
        nt = counts.sum(axis=1).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            p = counts / nt[:, None]
            ent = -np.nansum(np.where(counts > 0, p * np.log(p), 0.0), axis=1)
        ok = nt > 0
        if not ok.any():
            return empty
        return pd.DataFrame({key: keys_all[starts][ok],
                             "n_triples": nt[ok].astype(np.int64),
                             "perm_entropy": ent[ok]})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(body, batch_format="pandas")


def spectral_power(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    periods: tuple[tuple[str, float], ...] = (("1d", 86_400.0),
                                              ("7d", 604_800.0)),
    num_partitions: int = 64,
) -> Dataset:
    """Per-key normalized spectral power at FIXED candidate periods — a
    Goertzel-style single-bin DFT probe ("does this series pulse daily /
    weekly?"), the frequency-domain sibling of :func:`~.trend.acf`.
    The reference is a DSP library at heart (every conv head in
    /root/reference/TSFEDL/models_keras.py is a learned FIR filter
    bank); this is the classical fixed-frequency filter a pipeline runs
    before any model.

    For each key and period P:  ``power_P = (a² + b²) / n²`` with
    ``a = Σ d·cos(2πt/P)``, ``b = Σ d·sin(2πt/P)``, d the mean-centered
    value and t the seconds since the KEY'S FIRST timestamp (per-key
    epoch keeps trig arguments small, so libm argument reduction can't
    drift between engines).  Exact µs integer deltas divide by 1e6 on
    both sides.  One ``_pkey`` co-partition, bincount sums, one output
    row per key: ``key, n_events, power_<label>...``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
        out = pa.table({key: t[key], "_ts_us": pc.cast(ts, pa.int64()),
                        value_col: t[value_col]})
        return out.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64")}
        for label, _ in periods:
            cols[f"power_{label}"] = pd.Series([], dtype="float64")
        if len(df) == 0:
            return pd.DataFrame(cols)
        df = df.drop(columns=["_pkey"]).sort_values(
            key, kind="mergesort").reset_index(drop=True)
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        ts = df["_ts_us"].to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        n = np.bincount(gid, minlength=nk).astype(np.float64)
        mean = np.bincount(gid, weights=v, minlength=nk) / n
        d = v - mean[gid]
        t0 = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(t0, gid, ts)
        trel = (ts - t0[gid]).astype(np.float64) / 1e6
        out = {key: keys_all[starts], "n_events": n.astype(np.int64)}
        for label, p_s in periods:
            ang = (2.0 * np.pi) * (trel / p_s)
            a = np.bincount(gid, weights=d * np.cos(ang), minlength=nk)
            b = np.bincount(gid, weights=d * np.sin(ang), minlength=nk)
            out[f"power_{label}"] = (a * a + b * b) / (n * n)
        return pd.DataFrame(out)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(body, batch_format="pandas")
