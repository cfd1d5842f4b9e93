"""Ordered-scan + sessionize goldens vs DuckDB window functions."""

from __future__ import annotations

from conftest import SF_CHECK, assert_frames_match, to_pdf


def test_running_sum_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_events
    from s_tsfe_dl_ray.stages.scan import ordered_scan

    ds = read_events(SF_CHECK, columns=["event_id", "user_id", "ts", "value"])
    actual = to_pdf(
        ordered_scan(
            ds,
            keys=["user_id"],
            order_by=["ts", "event_id"],
            scans={"running_sum": ("value", "cumsum"), "running_max": ("value", "cummax")},
        )
    )
    expected = ddb.sql(
        f"""
        SELECT event_id, user_id, ts, value,
               sum(value) OVER w AS running_sum,
               max(value) OVER w AS running_max
        FROM '{SF_CHECK}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    ).df()
    assert_frames_match(actual, expected, atol=1e-8)


def test_sessionize_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_events
    from s_tsfe_dl_ray.stages.sessionize import sessionize

    ds = read_events(SF_CHECK, columns=["event_id", "user_id", "ts"])
    actual = to_pdf(
        sessionize(ds, keys=["user_id"], ts_col="ts", order_by=["ts", "event_id"], gap="30m")
    )
    expected = ddb.sql(
        f"""
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
          FROM '{SF_CHECK}/events.parquet'
        ),
        s AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM o
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_rows,
               epoch(max(ts) - min(ts)) AS duration_sec
        FROM s GROUP BY 1, 2
        """
    ).df()
    assert_frames_match(actual, expected, atol=1e-6)


def test_trailing_agg_peer_ties_and_boundaries(ddb):
    """RANGE window semantics: equal-timestamp peers include each other,
    the (ts - window) boundary is inclusive, and key groups never leak
    into each other through the offset packing."""
    import numpy as np
    import ray.data

    from s_tsfe_dl_ray.stages.scan import trailing_agg

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")  # one second
    rows = [
        # key a: two peers at t0+10s, one row exactly 60s before another
        {"rid": 1, "k": "a", "ts": t0, "v": 1.0},
        {"rid": 2, "k": "a", "ts": t0 + 10 * s, "v": 2.0},
        {"rid": 3, "k": "a", "ts": t0 + 10 * s, "v": 4.0},   # peer of rid 2
        {"rid": 4, "k": "a", "ts": t0 + 70 * s, "v": 8.0},   # t0+10 at boundary
        # key b overlaps key a's timestamps — must not cross-contaminate
        {"rid": 5, "k": "b", "ts": t0 + 5 * s, "v": 100.0},
        {"rid": 6, "k": "b", "ts": t0 + 20 * s, "v": 200.0},
    ]
    out = to_pdf(trailing_agg(
        ray.data.from_items(rows).repartition(3),
        key="k", ts_col="ts", value_col="v", window_us=60_000_000,
        sum_col="vs", count_col="n",
    )).sort_values("rid").reset_index(drop=True)
    # rid2/rid3 are peers: both see {1, 2, 4}; rid4's window [t0+10, t0+70]
    # includes the boundary peers but not t0
    assert out.vs.tolist() == [1.0, 7.0, 7.0, 14.0, 100.0, 300.0]
    assert out.n.tolist() == [1, 3, 3, 3, 1, 2]
    # DuckDB twin over the same frame
    import pandas as pd
    df = pd.DataFrame(rows)
    expected = ddb.sql(
        """SELECT rid, sum(v) OVER w AS vs, count(*) OVER w AS n FROM df
           WINDOW w AS (PARTITION BY k ORDER BY ts
               RANGE BETWEEN INTERVAL 1 MINUTE PRECEDING AND CURRENT ROW)"""
    ).df().sort_values("rid").reset_index(drop=True)
    assert out.vs.tolist() == expected.vs.tolist()
    assert out.n.tolist() == expected.n.astype(int).tolist()


def test_debounce_greedy_semantics():
    """Matches the literal greedy fold (keep if >= gap since last KEPT),
    first event always kept, invariant to blocking."""
    import numpy as np
    import pandas as pd
    import ray

    from s_tsfe_dl_ray.stages.sessionize import debounce

    t0 = 1_704_067_200_000_000
    rng = np.random.default_rng(9)
    rows = []
    for k in range(5):
        t = t0
        for _ in range(200):
            t += int(rng.integers(1, 30)) * 1_000_000
            rows.append((f"k{k}", t))
    df = pd.DataFrame(rows, columns=["k", "ts_us"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    gap = 45_000_000  # 45 s
    out = to_pdf(debounce(
        ray.data.from_pandas(df).repartition(7),
        key="k", ts_col="ts", min_gap_us=gap,
    )).sort_values(["k", "ts"]).reset_index(drop=True)
    out2 = to_pdf(debounce(
        ray.data.from_pandas(df).repartition(2),
        key="k", ts_col="ts", min_gap_us=gap,
    )).sort_values(["k", "ts"]).reset_index(drop=True)
    assert out.ts.tolist() == out2.ts.tolist()
    # literal greedy reference
    exp = []
    for k, g in df.sort_values(["k", "ts"]).groupby("k"):
        last = None
        for t in g["ts"]:
            if last is None or (t - last).value // 1000 >= gap:
                exp.append((k, t))
                last = t
    expdf = pd.DataFrame(exp, columns=["k", "ts"])
    assert out[["k", "ts"]].values.tolist() == expdf.values.tolist()
    assert 0 < len(out) < len(df)


def test_label_sessions_consistent_with_sessionize():
    """Aggregating the per-row labels reproduces sessionize()'s summary
    rows exactly (same gap, same ordering contract)."""
    import numpy as np
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.sessionize import label_sessions, sessionize

    rng = np.random.default_rng(5)
    n = 4000
    ts = np.sort(rng.integers(0, 3_600_000_000 * 50, n))
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 25, n),
        "ts": ts.astype("datetime64[us]"),
    })
    ds = ray.data.from_pandas(df)
    labeled = to_pdf(label_sessions(
        ds, key="user_id", ts_col="ts", order_by=["ts", "event_id"],
        gap="30m"))
    summary = (labeled.groupby(["user_id", "session_id"])
               .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                    n_rows=("ts", "size"))
               .reset_index())
    expected = to_pdf(sessionize(
        ray.data.from_pandas(df), keys=["user_id"], ts_col="ts",
        order_by=["ts", "event_id"], gap="30m"))
    merged = summary.merge(
        expected, on=["user_id", "session_id"],
        suffixes=("", "_exp"))
    assert len(merged) == len(expected) == len(summary)
    assert (merged.session_start == merged.session_start_exp).all()
    assert (merged.session_end == merged.session_end_exp).all()
    assert (merged.n_rows == merged.n_rows_exp).all()
