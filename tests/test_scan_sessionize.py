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
