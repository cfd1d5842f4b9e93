"""Rollup + cascade goldens vs a DuckDB oracle (SURVEY.md §5: golden
values are the analog of the reference's exact shape/param assertions,
test_keras.py:397-416)."""

from __future__ import annotations

import pandas as pd

from conftest import SF_CHECK, SF_SMOKE, assert_frames_match, to_pdf


def _events_oracle(ddb, sf_dir: str, trunc: str) -> pd.DataFrame:
    return ddb.sql(
        f"""
        SELECT user_id,
               date_trunc('{trunc}', ts)  AS window_start,
               count(*)                   AS n_events,
               sum(value)                 AS value_sum,
               min(value)                 AS value_min,
               max(value)                 AS value_max,
               avg(value)                 AS value_mean
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).df()


def test_events_rollup_1m_matches_oracle(ddb):
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier

    actual = to_pdf(events_tier(SF_CHECK, "1m"))
    expected = _events_oracle(ddb, SF_CHECK, "minute")
    assert_frames_match(actual, expected)


def test_events_cascade_matches_direct_oracle(ddb):
    """1h/1d tiers cascaded from 1m partials must equal a direct rollup of
    the raw rows (cascade exactness — SURVEY.md §5 invariant)."""
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tiers

    tiers = events_tiers(SF_CHECK)
    for tier, trunc in [("1h", "hour"), ("1d", "day")]:
        actual = to_pdf(tiers[tier])
        expected = _events_oracle(ddb, SF_CHECK, trunc)
        assert_frames_match(actual, expected)


def test_transcript_rollup_matches_oracle(ddb, transcripts_small):
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers

    tiers = transcript_tiers(transcripts_small)
    for tier, trunc in [("1m", "minute"), ("1h", "hour"), ("1d", "day")]:
        actual = to_pdf(tiers[tier])
        expected = ddb.sql(
            f"""
            WITH t AS (
              SELECT conv_id, ts,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS token_len,
                     CASE WHEN tool <> '' THEN 1 ELSE 0 END AS is_tool
              FROM '{transcripts_small}/*.parquet'
            )
            SELECT conv_id,
                   date_trunc('{trunc}', ts) AS window_start,
                   count(*)            AS turn_count,
                   sum(token_len)      AS token_len_sum,
                   min(token_len)      AS token_len_min,
                   max(token_len)      AS token_len_max,
                   avg(token_len)      AS token_len_mean,
                   avg(is_tool::DOUBLE) AS tool_call_rate
            FROM t GROUP BY 1, 2
            """
        ).df()
        assert_frames_match(actual, expected)


def test_rollup_smoke_tiny():
    """sf0.001 smoke: runs end-to-end, produces plausible window counts."""
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier

    out = to_pdf(events_tier(SF_SMOKE, "1d"))
    assert len(out) > 0
    assert out["n_events"].sum() == 1000  # all events accounted for exactly


def test_window_floor_pre_epoch(ddb):
    """pyarrow integer divide truncates toward zero; the window kernel
    must FLOOR so pre-1970 timestamps agree with DuckDB date_trunc."""
    import pyarrow as pa

    from s_tsfe_dl_ray.functions.windows import rewindow_us, window_start_us

    us_vals = [-30_000_000, -60_000_000, -90_000_001, -1, 0, 59_999_999,
               -86_400_000_000 - 1]
    ts = pa.array(us_vals, pa.timestamp("us"))
    got = window_start_us(ts, "1m").to_pylist()
    # epoch_us() keeps the comparison in integer µs — python
    # datetime.timestamp() would reinterpret DuckDB's naive values in
    # the local timezone
    exp = [
        int(r[0])
        for r in ddb.sql(
            "SELECT epoch_us(date_trunc('minute', make_timestamp(x))) FROM "
            f"(SELECT unnest({us_vals}) AS x)"
        ).fetchall()
    ]
    assert got == exp
    # cascade re-window floors too
    assert rewindow_us(pa.array([-60_000_000], pa.int64()), "1h").to_pylist() == [
        -3_600_000_000
    ]
