"""Gap-fill goldens vs DuckDB (generate_series + IGNORE NULLS windows)."""

from __future__ import annotations

from conftest import SF_CHECK, assert_frames_match, to_pdf


def _gapfill_oracle(ddb, sf_dir: str, mode: str):
    fill = {
        "ffill": """
            coalesce(t.value_mean,
                     last_value(t.value_mean IGNORE NULLS) OVER w_prev) AS value_mean,
        """,
        "interp": """
            coalesce(t.value_mean,
                     last_value(t.value_mean IGNORE NULLS) OVER w_prev
                     + (first_value(t.value_mean IGNORE NULLS) OVER w_next
                        - last_value(t.value_mean IGNORE NULLS) OVER w_prev)
                       * (epoch(g.window_start) - epoch(last_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_prev))
                       / (epoch(first_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_next)
                          - epoch(last_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_prev))
            ) AS value_mean,
        """,
    }[mode]
    return ddb.sql(
        f"""
        WITH t AS (
          SELECT user_id, date_trunc('hour', ts) AS window_start,
                 count(*) AS n_events, sum(value) AS value_sum,
                 min(value) AS value_min, max(value) AS value_max,
                 avg(value) AS value_mean
          FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        ),
        span AS (SELECT user_id, min(window_start) w0, max(window_start) w1 FROM t GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(w0, w1, INTERVAL 1 HOUR)) AS window_start
          FROM span
        )
        SELECT g.user_id, g.window_start,
               coalesce(t.n_events, 0)  AS n_events,
               coalesce(t.value_sum, 0) AS value_sum,
               t.value_min              AS value_min,
               t.value_max              AS value_max,
               {fill}
               CASE WHEN t.n_events IS NOT NULL THEN 'observed' ELSE '{mode}' END AS fill_method
        FROM grid g LEFT JOIN t USING (user_id, window_start)
        WINDOW
          w_prev AS (PARTITION BY g.user_id ORDER BY g.window_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          w_next AS (PARTITION BY g.user_id ORDER BY g.window_start
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        """
    ).df()


def _engine_gapfill(sf_dir: str, mode: str):
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    tier = events_tier(sf_dir, "1h")
    return gapfill(
        tier,
        keys=["user_id"],
        tier="1h",
        count_cols=["n_events"],
        sum_cols=["value_sum"],
        null_cols=["value_min", "value_max"],
        carry_cols=["value_mean"],
        mode=mode,
    )


def test_gapfill_ffill_matches_oracle(ddb):
    actual = to_pdf(_engine_gapfill(SF_CHECK, "ffill"))
    assert_frames_match(actual, _gapfill_oracle(ddb, SF_CHECK, "ffill"))


def test_gapfill_interp_matches_oracle(ddb):
    actual = to_pdf(_engine_gapfill(SF_CHECK, "interp"))
    assert_frames_match(actual, _gapfill_oracle(ddb, SF_CHECK, "interp"))


def test_gapfill_has_gaps(ddb):
    """The fixture really exercises the gap path."""
    out = to_pdf(_engine_gapfill(SF_CHECK, "ffill"))
    assert (out["fill_method"] == "ffill").sum() > 0
    assert (out["fill_method"] == "observed").sum() > 0
    # grid completeness: per user, windows are contiguous at 1h steps
    g = out[out.user_id == out.user_id.iloc[0]].sort_values("window_start")
    deltas = g["window_start"].diff().dropna().dt.total_seconds()
    assert (deltas == 3600).all()
