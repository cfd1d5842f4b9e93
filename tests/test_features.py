"""Property tests for stages/features.py and robust.kendall_tau —
hand-built goldens where the statistic has a known closed form.
(Oracle parity at sf0.01 is covered by test_entry_contract.py.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from s_tsfe_dl_ray.stages.features import grouped_moments, ts_feature_battery
from s_tsfe_dl_ray.stages.robust import kendall_tau


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return ray.data.from_pandas(df)


def test_kendall_tau_bounds_and_known_values():
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: strictly increasing -> tau = 1
    for i in range(10):
        rows.append((i, 1, t0 + pd.Timedelta(seconds=i), float(i)))
    # user 2: strictly decreasing -> tau = -1
    for i in range(10):
        rows.append((100 + i, 2, t0 + pd.Timedelta(seconds=i), float(-i)))
    # user 3: all equal -> every pair tied -> NULL
    for i in range(5):
        rows.append((200 + i, 3, t0 + pd.Timedelta(seconds=i), 7.0))
    out = kendall_tau(_events(rows), key="user_id", ts_col="ts",
                      value_col="value", id_col="event_id").to_pandas()
    out = out.set_index("user_id")
    assert out.loc[1, "kendall_tau"] == 1.0
    assert out.loc[2, "kendall_tau"] == -1.0
    assert np.isnan(out.loc[3, "kendall_tau"])
    assert out.loc[1, "n_pairs"] == 45
    assert out.loc[3, "n_pairs"] == 10


def test_grouped_moments_symmetric_and_constant():
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: symmetric {-2,-1,0,1,2} -> skew 0; m2=2, m4=34/5 -> kurt=-1.3
    for i, v in enumerate([-2.0, -1.0, 0.0, 1.0, 2.0]):
        rows.append((i, 1, t0, v))
    # user 2: constant -> NULL skew/kurt
    for i in range(4):
        rows.append((10 + i, 2, t0, 3.5))
    out = grouped_moments(
        _events(rows).drop_columns(["event_id", "ts"]),
        key="user_id", value_col="value").to_pandas().set_index("user_id")
    assert out.loc[1, "skew_g1"] == 0.0
    assert abs(out.loc[1, "kurt_excess"] - (34 / 5 / 4 - 3)) < 1e-12
    assert np.isnan(out.loc[2, "skew_g1"]) and np.isnan(out.loc[2, "kurt_excess"])
    assert out.loc[2, "mean"] == 3.5


def test_ts_feature_battery_golden():
    t0 = pd.Timestamp("2024-01-01")
    vals = [1.0, 5.0, 5.0, 1.0, 5.0, 5.0, 5.0, 1.0]  # mean = 3.5
    rows = [(i, 1, t0 + pd.Timedelta(seconds=i), v) for i, v in enumerate(vals)]
    out = ts_feature_battery(_events(rows), key="user_id", ts_col="ts",
                             value_col="value", id_col="event_id").to_pandas()
    r = out.iloc[0]
    assert r["n_events"] == 8
    assert r["abs_energy"] == sum(v * v for v in vals)
    assert abs(r["mean_abs_change"] - np.mean(np.abs(np.diff(vals)))) < 1e-12
    # above-mean pattern: F T T F T T T F -> crossings at 4 boundaries
    assert r["n_mean_crossings"] == 4
    assert r["count_above_mean"] == 5
    assert r["longest_strike_above_mean"] == 3
    assert r["first_loc_max"] == 2  # first 5.0 is at position 2 (1-based)


def test_ts_feature_battery_single_row_key():
    t0 = pd.Timestamp("2024-01-01")
    out = ts_feature_battery(_events([(0, 9, t0, 2.0)]), key="user_id",
                             ts_col="ts", value_col="value",
                             id_col="event_id").to_pandas().iloc[0]
    assert out["n_events"] == 1
    assert np.isnan(out["mean_abs_change"])
    assert out["n_mean_crossings"] == 0
    assert out["count_above_mean"] == 0  # strict > of value vs itself
    assert out["longest_strike_above_mean"] == 0
    assert out["first_loc_max"] == 1


def test_pair_cooccurrence_golden():
    from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

    # baskets: u1={a,b}, u2={a,b}, u3={a,c}, u4={c} -> 4 groups
    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (3, "c"), (4, "c")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    out = pair_cooccurrence(ray.data.from_pandas(df), group_col="user_id",
                            member_col="event_type").to_pandas()
    out = out.set_index(["member_a", "member_b"]).sort_index()
    # a∩b = {u1,u2}; n_a=3, n_b=2, n=4 -> lift = 2*4/(3*2) = 4/3
    assert out.loc[("a", "b"), "n_both"] == 2
    assert abs(out.loc[("a", "b"), "lift"] - 8 / 6) < 1e-12
    assert abs(out.loc[("a", "b"), "jaccard"] - 2 / 3) < 1e-12
    # a∩c = {u3}; lift = 1*4/(3*2) = 2/3
    assert out.loc[("a", "c"), "n_both"] == 1
    assert abs(out.loc[("a", "c"), "lift"] - 4 / 6) < 1e-12
    assert ("b", "c") not in out.index  # never co-occur -> no row


def test_doc_top_bigram_golden():
    from s_tsfe_dl_ray.stages.text import doc_top_bigram

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["x y x y x y z", "solo", "a  b a b"],  # doc3: double space
    })
    out = doc_top_bigram(ray.data.from_pandas(docs)).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "top_bigram"] == "x y"
    assert out.loc[1, "n_occ"] == 3
    assert abs(out.loc[1, "rep_frac"] - 3 * 3 / 13) < 1e-12
    # doc2 has no bigram -> no row
    assert 2 not in out.index
    # doc3: the double space yields an empty token that blocks the first
    # pair, leaving ("b","a") and ("a","b") once each -> lexicographic tie-break
    assert out.loc[3, "top_bigram"] == "a b"
    assert out.loc[3, "n_occ"] == 1


def test_ts_complexity_battery_golden():
    from s_tsfe_dl_ray.stages.features import ts_complexity_battery

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: [1, 3, 2, 5, 4] — hand-computable triple/pair stats
    vals1 = [1.0, 3.0, 2.0, 5.0, 4.0]
    for i, v in enumerate(vals1):
        rows.append((i, 1, t0 + pd.Timedelta(seconds=i), v))
    # user 2: constant series — zero complexity, single-bin entropy 0
    for i in range(4):
        rows.append((10 + i, 2, t0 + pd.Timedelta(seconds=i), 7.0))
    # user 3: two rows — cubics NULL, cid defined
    rows.append((20, 3, t0, 1.0))
    rows.append((21, 3, t0 + pd.Timedelta(seconds=1), 2.0))
    out = ts_complexity_battery(
        _events(rows), key="user_id", ts_col="ts", value_col="value",
        id_col="event_id").to_pandas().set_index("user_id")

    v = np.asarray(vals1)
    c3_exp = np.mean(v[:-2] * v[1:-1] * v[2:])
    tra_exp = np.mean(v[2:] ** 2 * v[1:-1] - v[1:-1] * v[:-2] ** 2)
    cid_exp = np.sqrt(np.sum(np.diff(v) ** 2))
    r = out.loc[1]
    assert r["n_events"] == 5
    assert abs(r["c3"] - c3_exp) < 1e-9
    assert abs(r["time_rev_asym"] - tra_exp) < 1e-9
    assert abs(r["cid_ce"] - cid_exp) < 1e-9
    # peaks: 3 (at idx 1, between 1 and 2) and 5 (at idx 3) -> 2 strict maxima
    assert r["n_peaks"] == 2
    # bins over [1,5], width 4: values 1,3,2,5,4 -> bins 0,5,2,9,7 all distinct
    assert abs(r["binned_entropy"] - np.log(5)) < 1e-12

    r2 = out.loc[2]
    assert r2["c3"] == 7.0 ** 3 and r2["time_rev_asym"] == 0.0
    assert r2["cid_ce"] == 0.0 and r2["n_peaks"] == 0
    assert r2["binned_entropy"] == 0.0  # single bin, p=1 -> entropy 0

    r3 = out.loc[3]
    assert np.isnan(r3["c3"]) and np.isnan(r3["time_rev_asym"])
    assert r3["cid_ce"] == 1.0 and r3["n_peaks"] == 0


def test_ts_location_battery_golden():
    from s_tsfe_dl_ray.stages.features import ts_location_battery

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: [5, 1, 5, 2, 5] — max at 1,3,5; min at 2
    vals1 = [5.0, 1.0, 5.0, 2.0, 5.0]
    for i, v in enumerate(vals1):
        rows.append((i, 1, t0 + pd.Timedelta(seconds=i), v))
    # user 2: one big outlier among constants -> beyond-2sigma hit
    vals2 = [1.0] * 9 + [100.0]
    for i, v in enumerate(vals2):
        rows.append((10 + i, 2, t0 + pd.Timedelta(seconds=i), v))
    out = ts_location_battery(
        _events(rows), key="user_id", ts_col="ts", value_col="value",
        id_col="event_id").to_pandas().set_index("user_id")

    r = out.loc[1]
    assert r["last_loc_max"] == 5 and r["first_loc_min"] == 2
    # |v| prefix: 5,6,11,13,18; total 18; first 2*pref>=18 at rn 3 (22>=18)
    assert abs(r["imq50_pos"] - 3 / 5) < 1e-12
    # second diffs: (5-2+5)=8, (2-10+1)=-7, (5-4+5)=6 -> sum 7, /(2*3)
    assert abs(r["mean_2nd_deriv"] - 7 / (2 * 3)) < 1e-12
    assert abs(r["ratio_unique"] - 3 / 5) < 1e-12

    r2 = out.loc[2]
    # mean 10.9, sigma ~29.7: only the 100.0 is beyond 2 sigma
    assert abs(r2["ratio_beyond_2sigma"] - 1 / 10) < 1e-12
    assert r2["last_loc_max"] == 10 and r2["first_loc_min"] == 1
    assert abs(r2["ratio_unique"] - 2 / 10) < 1e-12


def test_interarrival_stats_golden():
    from s_tsfe_dl_ray.stages.features import interarrival_stats

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: gaps of 10s, 20s, 30s -> mean 20, var ((100+400+900)/3-400)
    offs = [0, 10, 30, 60]
    for i, o in enumerate(offs):
        rows.append((i, 1, t0 + pd.Timedelta(seconds=o), 0.0))
    # user 2: single event -> NULL gap stats
    rows.append((10, 2, t0, 0.0))
    out = interarrival_stats(
        _events(rows).drop_columns(["value"]), key="user_id",
        ts_col="ts", id_col="event_id").to_pandas().set_index("user_id")
    r = out.loc[1]
    assert r["n_events"] == 4 and r["n_gaps"] == 3
    assert abs(r["mean_gap_s"] - 20.0) < 1e-12
    assert r["min_gap_s"] == 10.0 and r["max_gap_s"] == 30.0
    assert abs(r["var_gap_s"] - (1400 / 3 - 400)) < 1e-9
    r2 = out.loc[2]
    assert r2["n_gaps"] == 0 and np.isnan(r2["mean_gap_s"])
    assert np.isnan(r2["var_gap_s"])


def test_energy_by_chunks_golden():
    from s_tsfe_dl_ray.stages.features import energy_by_chunks

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: 12 rows -> ntile(10): first 2 chunks get 2 rows, rest 1
    vals = [1.0] * 12
    vals[0] = 3.0  # chunk 1 = rows 1,2 -> energy 9+1 = 10 of total 20
    for i, v in enumerate(vals):
        rows.append((i, 1, t0 + pd.Timedelta(seconds=i), v))
    # user 2: 3 rows < 10 chunks -> only chunks 1..3, one row each
    for i, v in enumerate([2.0, 0.0, 1.0]):
        rows.append((100 + i, 2, t0 + pd.Timedelta(seconds=i), v))
    out = energy_by_chunks(
        _events(rows), key="user_id", ts_col="ts", value_col="value",
        id_col="event_id").to_pandas().set_index(["user_id", "chunk"])
    total1 = 9 + 11  # 3² + 11·1²
    assert out.loc[(1, 1), "n_in_chunk"] == 2
    assert out.loc[(1, 2), "n_in_chunk"] == 2
    assert out.loc[(1, 10), "n_in_chunk"] == 1
    assert abs(out.loc[(1, 1), "energy_frac"] - 10 / total1) < 1e-12
    assert abs(out.loc[(1, 3), "energy_frac"] - 1 / total1) < 1e-12
    assert len(out.loc[1]) == 10
    assert len(out.loc[2]) == 3
    assert abs(out.loc[(2, 1), "energy_frac"] - 4 / 5) < 1e-12
    assert out.loc[(2, 2), "energy_frac"] == 0.0


def test_xicor_detects_nonmonotone_dependence():
    """Chatterjee's xi: ~0 for independence, high for a noiseless
    V-shape (which Spearman/Kendall score ~0), 1-ish for monotone."""
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.robust import xicor

    n = 400
    i = np.arange(n)
    rng = np.random.default_rng(2)
    frames = []
    frames.append(pd.DataFrame({
        "k": "vee", "i": i, "y": np.abs(i - n // 2)}))
    frames.append(pd.DataFrame({
        "k": "mono", "i": i, "y": i * 3}))
    frames.append(pd.DataFrame({
        "k": "noise", "i": i, "y": rng.integers(0, 10_000, n)}))
    df = pd.concat(frames, ignore_index=True)
    out = (xicor(ray.data.from_pandas(df).repartition(3), key="k",
                 order_by=["i"], value_col="y")
           .to_pandas().set_index("k"))
    assert out.loc["vee", "xi"] > 0.9
    assert out.loc["mono", "xi"] > 0.9
    assert abs(out.loc["noise", "xi"]) < 0.15
    # brute-force the tie-robust estimator on the V series
    y = np.abs(i - n // 2)
    ys = np.sort(y)
    r = np.searchsorted(ys, y, side="right")
    li = n - np.searchsorted(ys, y, side="left")
    exp = 1.0 - (np.float64(n) * np.abs(np.diff(r)).sum()) \
        / (2.0 * np.float64((li * (n - li)).sum()))
    assert out.loc["vee", "xi"] == exp


def test_kendalls_w_known_cases():
    """Kendall's W pins: perfect agreement -> exactly 1.0; reversed
    pair of judges (m=2) -> W near 0; ties path matches a naive
    tie-corrected implementation."""
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.robust import kendalls_w

    def run(df):
        return kendalls_w(ray.data.from_pandas(df).repartition(2),
                          judge_col="j", object_col="o",
                          value_col="v").to_pandas().iloc[0]

    # perfect agreement, no ties
    rows = [{"j": f"J{j}", "o": o, "v": (o + 1) * 10 + j}
            for j in range(4) for o in range(9)]
    r = run(pd.DataFrame(rows))
    assert r.n_judges == 4 and r.n_objects == 9 and r.w == 1.0

    # two judges, exactly reversed: W = (1 + rho)/2 with rho = -1 -> 0
    rows = ([{"j": "A", "o": o, "v": o} for o in range(10)]
            + [{"j": "B", "o": o, "v": -o} for o in range(10)])
    assert run(pd.DataFrame(rows)).w == 0.0

    # ties: naive reference implementation
    rng = np.random.default_rng(8)
    rows = [{"j": f"J{j}", "o": o, "v": int(rng.integers(0, 4))}
            for j in range(3) for o in range(12)]
    df = pd.DataFrame(rows)
    got = run(df)
    m, n = 3, 12
    R = np.zeros(n)
    T = 0
    for j, g in df.groupby("j"):
        g = g.sort_values("o")
        v = g["v"].to_numpy()
        order = np.argsort(v, kind="stable")
        ranks = np.empty(n)
        sv = v[order]
        i = 0
        while i < n:
            k = i
            while k < n and sv[k] == sv[i]:
                k += 1
            ranks[order[i:k]] = (i + 1 + k) / 2.0
            t = k - i
            T += t ** 3 - t
            i = k
        R += ranks
    W = (12 * (R ** 2).sum() - 3 * m * m * n * (n + 1) ** 2) \
        / (m * m * n * (n * n - 1) - m * T)
    assert abs(got.w - W) < 1e-12
