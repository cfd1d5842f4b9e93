"""Round-4m wave: Wilson CI, lead-lag xcorr, LOO target encoding,
Pareto coverage, interval concurrency, containment near-dup, and the
completed TPC-H sweep (Q2/Q11/Q16/Q20 are covered by the entry-contract
rehearsal; here: behavioral properties + blocking invariance)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_table(seed=31, n=3000, users=25):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, users, n)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error"], n)),
        "value": pa.array(rng.normal(50, 20, n)),
    })


def test_wilson_ci_brackets_rate():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.metrics import wilson_rate_ci

    path = "/tmp/r4m_wilson.parquet"
    pq.write_table(_events_table(), path)
    ds = ray.data.read_parquet(path)
    out = to_pdf(wilson_rate_ci(ds, ts_col="ts", type_col="event_type",
                                success_value="error", tier="1d"))
    assert len(out) >= 1
    # Wilson interval always inside [0,1] and brackets the point rate
    assert (out.ci_lo >= 0).all() and (out.ci_hi <= 1).all()
    assert (out.ci_lo <= out.rate).all() and (out.rate <= out.ci_hi).all()
    # counts are exact
    assert (out.n_success <= out.n_events).all()


def test_lead_lag_recovers_planted_lag():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import lead_lag_xcorr

    # clicks in hour h, purchases echo them exactly 2 hours later
    rng = np.random.default_rng(7)
    hours = 200
    base = 1_700_000_000_000_000
    counts = rng.integers(1, 20, hours)
    rows_ts, rows_ty = [], []
    for h in range(hours):
        for _ in range(counts[h]):
            rows_ts.append(base + h * 3_600_000_000)
            rows_ty.append("click")
        if h + 2 < hours:
            for _ in range(counts[h]):
                rows_ts.append(base + (h + 2) * 3_600_000_000)
                rows_ty.append("purchase")
    t = pa.table({
        "ts": pa.array(np.array(rows_ts, dtype=np.int64)
                       .astype("datetime64[us]")),
        "event_type": pa.array(rows_ty),
    })
    path = "/tmp/r4m_leadlag.parquet"
    pq.write_table(t, path)
    out = to_pdf(lead_lag_xcorr(
        ray.data.read_parquet(path), ts_col="ts", type_col="event_type",
        type_a="click", type_b="purchase", tier="1h", max_lag=3))
    best = out.loc[out.r.idxmax()]
    assert int(best.lag) == 2
    assert best.r > 0.95


def test_loo_target_encoding_excludes_own_row():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.transform import loo_target_encoding

    t = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "event_type": pa.array(["a", "a", "a", "b"]),
        "value": pa.array([1.0, 2.0, 6.0, 9.0]),
    })
    path = "/tmp/r4m_loo.parquet"
    pq.write_table(t, path)
    out = to_pdf(loo_target_encoding(
        ray.data.read_parquet(path), key_col="event_type",
        value_col="value", id_col="event_id")).sort_values("event_id")
    # a-rows: mean of the OTHER two values
    assert out.loo_enc.tolist()[:3] == [4.0, 3.5, 1.5]
    # b has a single row -> nothing to leave out -> NULL
    assert np.isnan(out.loo_enc.tolist()[3])


def test_pareto_coverage_known_distribution():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.metrics import pareto_coverage

    # one whale (80), four minnows (5 each): 80% of 100 needs exactly
    # the whale... 80 >= 80 -> k=1
    t = pa.table({
        "user_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "value": pa.array([80.0, 5.0, 5.0, 5.0, 5.0]),
    })
    path = "/tmp/r4m_pareto.parquet"
    pq.write_table(t, path)
    out = to_pdf(pareto_coverage(
        ray.data.read_parquet(path), key_col="user_id",
        value_col="value", share=0.8))
    assert out.n_keys.iloc[0] == 5
    assert out.k_keys.iloc[0] == 1
    assert out.share_covered.iloc[0] == pytest.approx(0.8)
    assert out.total_value.iloc[0] == pytest.approx(100.0)


def test_active_interval_counts_gap_stays_open():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.activity import active_interval_counts

    base = 1_700_000_000_000_000
    hour = 3_600_000_000
    # conv A: rows in hour 0 and hour 3 (idle hours 1-2 still count as
    # active); conv B: hour 1 only
    t = pa.table({
        "conv_id": pa.array(["A", "A", "B"]),
        "ts": pa.array(np.array(
            [base + 10, base + 3 * hour + 5, base + hour + 1],
            dtype=np.int64).astype("datetime64[us]")),
    })
    path = "/tmp/r4m_conc.parquet"
    pq.write_table(t, path)
    out = to_pdf(active_interval_counts(
        ray.data.read_parquet(path), key="conv_id", ts_col="ts",
        tier="1h"))
    assert out.n_active.tolist() == [1, 2, 1, 1]  # h0:A, h1:A+B, h2:A, h3:A


def test_containment_catches_subdocument():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.dedup import ngram_jaccard_pairs

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"pad{i}" for i in range(40))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([small, big, "totally different words here ok"]),
    })
    path = "/tmp/r4m_contain.parquet"
    pq.write_table(t, path)
    ds = ray.data.read_parquet(path)
    cont = to_pdf(ngram_jaccard_pairs(
        ds, id_col="doc_id", n=3, threshold=0.9, score="containment"))
    # the small doc is fully embedded -> containment 1.0
    assert len(cont) == 1
    assert (cont.id_a.iloc[0], cont.id_b.iloc[0]) == (1, 2)
    assert cont.containment.iloc[0] == pytest.approx(1.0)
    # jaccard on the same pair is far below 0.9 (pad dilutes the union)
    jac = to_pdf(ngram_jaccard_pairs(ds, id_col="doc_id", n=3,
                                     threshold=0.9))
    assert len(jac) == 0


def test_4m_ops_blocking_invariance():
    """The 4m ops give IDENTICAL results at 1 input block and at 7."""
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.activity import active_interval_counts
    from s_tsfe_dl_ray.stages.metrics import pareto_coverage, wilson_rate_ci
    from s_tsfe_dl_ray.stages.transform import loo_target_encoding
    from s_tsfe_dl_ray.stages.trend import lead_lag_xcorr

    path = "/tmp/r4m_blockinv.parquet"
    pq.write_table(_events_table(seed=43), path)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        return {
            "wilson": to_pdf(wilson_rate_ci(
                ds, ts_col="ts", type_col="event_type",
                success_value="error", tier="1d")),
            "leadlag": to_pdf(lead_lag_xcorr(
                ds, ts_col="ts", type_col="event_type", type_a="click",
                type_b="purchase", tier="1h", max_lag=3)),
            "loo": to_pdf(loo_target_encoding(
                ds, key_col="event_type", value_col="value",
                id_col="event_id")).sort_values("event_id")
                .reset_index(drop=True),
            "pareto": to_pdf(pareto_coverage(
                ds, key_col="user_id", value_col="value", share=0.8)),
            "conc": to_pdf(active_interval_counts(
                ds, key="user_id", ts_col="ts", tier="1h")),
        }

    a, b = run(1), run(7)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_rate_limit_drops_counts():
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.stream import rate_limit_drops

    base = 1_700_000_000_000_000
    hour = 3_600_000_000
    # user 1: 5 events in hour 0 (3 dropped at limit 2), 1 in hour 1;
    # user 2: 2 events in hour 0 (none dropped)
    ts = [base + i for i in range(5)] + [base + hour + 1] + [base, base + 9]
    uid = [1] * 6 + [2, 2]
    t = pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(np.array(ts, dtype=np.int64)
                       .astype("datetime64[us]")),
    })
    path = "/tmp/r4m_ratelimit.parquet"
    pq.write_table(t, path)
    out = to_pdf(rate_limit_drops(ray.data.read_parquet(path),
                                  key="user_id", ts_col="ts",
                                  tier="1h", limit=2))
    assert len(out) == 1
    assert out.user_id.iloc[0] == 1
    assert out.n_events.iloc[0] == 5 and out.n_dropped.iloc[0] == 3


def test_cache_savings_identity():
    """savings = 1 - total/cost and cost >= total always (prefix sums
    dominate); a 1-turn conversation saves nothing."""
    import ray

    import __ray_entry__ as em
    from s_tsfe_dl_ray.stages.dialog import context_cost

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
        "text": pa.array(["xx", "yyy", "z", "hello"]),
    })
    path = "/tmp/r4m_cache.parquet"
    pq.write_table(t, path)
    cc = context_cost(ray.data.read_parquet(path)).to_pandas()
    a = cc.set_index("conv_id")
    # conv a: chars 2,3,1 -> prefixes 2,5,6 -> cost 13, total 6
    assert a.loc["a", "context_cost"] == 13
    assert a.loc["a", "total_chars"] == 6
    # conv b: single turn -> cost == total -> ratio 0
    assert a.loc["b", "context_cost"] == a.loc["b", "total_chars"]
