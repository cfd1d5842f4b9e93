"""DuckDB oracle twins for the driver contract, split out of
``__ray_entry__.py`` (VERDICT r4 #8) by table theme.  The shared SQL
fragments (transcript corpus path, token-length fast path, unrolled
PageRank CTE chain, rollup/gap-fill templates, lang-id cases) are built
once in :func:`build_oracle_sql` and passed to each part.  Dict ORDER is
irrelevant here — only ``registry.build_queries`` order is recorded."""

from __future__ import annotations

from ._common import (_LANGS, _STOP, _dd_round6,  # noqa: F401
                      _events_gapfill, _round_floats, _transcripts_for)

__all__ = ["build_oracle_sql"]


def _part_events(*, tp, T, TOKLEN, _REL_EDGES, INTEGRITY_SQL, _pr_steps, _pr_joined, PAGERANK_SQL, rollup, gapfill, lang_cases, lang_max, lang_ties, lang_pick, **_):
    return {
        "events_kendall_w": """
            WITH e AS (
              SELECT event_type AS j,
                     (epoch_us(ts) // 86400000000)::BIGINT AS o,
                     sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS v
              FROM events GROUP BY 1, 2
            ), mj AS (SELECT count(DISTINCT j)::BIGINT AS m FROM e),
            keep AS (
              SELECT o FROM e GROUP BY o
              HAVING count(*) = (SELECT m FROM mj)
            ), f AS (SELECT e.* FROM e JOIN keep USING (o)),
            rn AS (
              SELECT j, o, v,
                     row_number() OVER (PARTITION BY j
                                        ORDER BY v, o) AS rn
              FROM f
            ), r2 AS (
              SELECT j, o, v,
                     (min(rn) OVER (PARTITION BY j, v)
                      + max(rn) OVER (PARTITION BY j, v))::BIGINT AS r2
              FROM rn
            ), rd AS (SELECT o, sum(r2)::BIGINT AS sr FROM r2 GROUP BY o),
            t AS (SELECT j, v, count(*)::BIGINT AS c FROM f GROUP BY 1, 2),
            agg AS (
              SELECT (SELECT m FROM mj) AS m,
                     (SELECT count(*)::BIGINT FROM rd) AS n,
                     (SELECT sum(sr * sr)::BIGINT FROM rd) AS sr2,
                     (SELECT sum(c * c * c - c)::BIGINT FROM t) AS tt
            )
            SELECT m AS n_judges, n AS n_objects,
                   round(CASE WHEN (m * m * n * (n * n - 1) - m * tt) = 0
                              THEN NULL
                         ELSE (3 * (sr2 - m * m * n * (n + 1) * (n + 1)))
                                ::DOUBLE
                              / (m * m * n * (n * n - 1) - m * tt)
                         END, 6) AS w
            FROM agg
        """,
        "events_theil_users": """
            WITH s AS (
              SELECT user_id,
                     sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS v
              FROM events GROUP BY 1
            ), g AS (
              SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS x FROM s
            )
            SELECT user_id, v AS value,
                   round(v::DOUBLE / x, 6) AS share,
                   round((v::DOUBLE / x) * ln((n::DOUBLE * v) / x), 6)
                     AS theil_term
            FROM s, g WHERE v > 0 ORDER BY user_id
        """,
        "events_xicor": """
            WITH b AS (
              SELECT event_type AS ty,
                     CAST(round(value * 100) AS BIGINT) AS y,
                     ts, event_id,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     count(*) OVER (PARTITION BY event_type)
                       - rank() OVER (PARTITION BY event_type
                                      ORDER BY CAST(round(value * 100)
                                               AS BIGINT) DESC) + 1 AS r,
                     count(*) OVER (PARTITION BY event_type)
                       - rank() OVER (PARTITION BY event_type
                                      ORDER BY CAST(round(value * 100)
                                               AS BIGINT) ASC) + 1 AS l
              FROM events
            ), d AS (
              SELECT ty, n, r, l,
                     lead(r) OVER (PARTITION BY ty
                                   ORDER BY ts, event_id) AS r_next
              FROM b
            ), s AS (
              SELECT ty, max(n) AS n,
                     sum(CASE WHEN r_next IS NULL THEN 0
                              ELSE abs(r_next - r) END)::BIGINT AS s1,
                     sum(l * (n - l))::BIGINT AS s2
              FROM d GROUP BY ty HAVING max(n) >= 3
            )
            SELECT ty AS event_type, CAST(n AS BIGINT) AS n_obs,
                   round(1.0 - (n::DOUBLE * s1) / (2.0 * s2), 6) AS xi
            FROM s ORDER BY 1
        """,
        "events_rollup_1m": rollup("minute"),
        "events_rollup_1h": rollup("hour"),
        "events_rollup_1d": rollup("day"),
        "events_gapfill_ffill_1h": gapfill("ffill"),
        "events_gapfill_interp_1h": gapfill("interp"),
        "events_error_rate_1d": """
            SELECT user_id, date_trunc('day', ts) AS window_start,
                   count(*) AS n_events,
                   round(avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END), 6) AS error_rate
            FROM events GROUP BY 1, 2
        """,
        "events_top20_windows_1h": """
            SELECT * FROM (
              SELECT user_id, date_trunc('hour', ts) AS window_start,
                     count(*) AS n_events,
                     round(sum(value), 6) AS value_sum,
                     round(min(value), 6) AS value_min,
                     round(max(value), 6) AS value_max,
                     round(avg(value), 6) AS value_mean
              FROM events GROUP BY 1, 2
            ) ORDER BY value_sum DESC, user_id, window_start LIMIT 20
        """,
        "events_sessionize_30m": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
              FROM events
            ),
            s AS (
              SELECT user_id, ts,
                     (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
              FROM o
            )
            SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_rows, round(epoch(max(ts) - min(ts)), 6) AS duration_sec
            FROM s GROUP BY 1, 2
        """,
        "events_running_sum": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(sum(value) OVER w, 6) AS running_sum,
                   round(max(value) OVER w, 6) AS running_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "events_first_per_key": """
            SELECT event_id, user_id, event_type, ts, round(value, 6) AS value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "events_latest_per_key": """
            SELECT event_id, user_id, event_type, ts, round(value, 6) AS value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "events_trailing_1h": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(sum(value) OVER w, 6) AS value_sum_1h,
                   count(*) OVER w AS n_events_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        "events_value_delta": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(lag(value) OVER w, 6) AS value_prev,
                   round(value - lag(value) OVER w, 6) AS value_delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_rolling_mean5": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS value_ma5
            FROM events
        """,
        "events_standardize": """
            SELECT event_id, user_id, round(value, 6) AS value,
                   round((value - avg(value) OVER ()) / stddev_pop(value) OVER (), 6) AS value_z
            FROM events
        """,
        "events_pivot_type_sums": """
            SELECT user_id, count(value) AS n_events,
                   round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 6) AS value_sum_click,
                   round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 6) AS value_sum_view,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6) AS value_sum_purchase,
                   round(sum(CASE WHEN event_type = 'signup' THEN value ELSE 0 END), 6) AS value_sum_signup,
                   round(sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 6) AS value_sum_error
            FROM events GROUP BY 1
        """,
        "events_one_hot": """
            SELECT event_id, event_type,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS event_type_click,
                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS event_type_view,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS event_type_purchase,
                   CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS event_type_signup,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS event_type_error
            FROM events
        """,
        "events_segment_runs": """
            WITH o AS (
              SELECT user_id, event_type, ts,
                     CASE WHEN event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id, event_type, ts,
                     (sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS run_id
              FROM o
            )
            SELECT user_id, run_id, min(event_type) AS event_type,
                   min(ts) AS run_start, max(ts) AS run_end, count(*) AS n_rows
            FROM s GROUP BY 1, 2
        """,
        "events_hash_split": """
            SELECT event_id,
                   CASE WHEN substring(md5(event_id::VARCHAR), 1, 4) < '3333'
                        THEN 'test' ELSE 'train' END AS split
            FROM events
        """,
        "events_stratified_split": """
            SELECT event_id, event_type,
                   CASE WHEN substring(md5(event_type || '|' || event_id::VARCHAR), 1, 4) < '3333'
                        THEN 'test' ELSE 'train' END AS split
            FROM events
        """,
        "events_ensemble_mean": """
            SELECT event_id,
                   round((2*value + (value + 10) + sqrt(abs(value))) / 3.0, 6) AS score_mean,
                   3 AS n_members
            FROM events
        """,
        "events_asof_purchase": """
            SELECT c.event_id, c.user_id, c.event_type, c.ts,
                   round(c.value, 6) AS value,
                   p.ts AS ts_asof, round(p.value, 6) AS value_asof
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "events_retention_1h": """
            SELECT * FROM (
              SELECT user_id, date_trunc('hour', ts) AS window_start,
                     count(*) AS n_events,
                     round(sum(value), 6) AS value_sum,
                     round(min(value), 6) AS value_min,
                     round(max(value), 6) AS value_max,
                     round(avg(value), 6) AS value_mean
              FROM events GROUP BY 1, 2
            ) WHERE window_start >= TIMESTAMP '2024-01-15 00:00:00'
        """,
        "events_incremental_1h": rollup("hour"),
        "events_distinct_users_1h": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "events_click_attribution": """
            -- latest-started window semantics: ASOF picks the most recent
            -- purchase at-or-before the click; the CASE nulls it out when
            -- the 1h window has already expired (engine: interval_join)
            SELECT c.event_id, c.user_id, c.ts, round(c.value, 6) AS value,
                   CASE WHEN c.ts <= p.ts + INTERVAL 1 HOUR THEN p.ts END AS win_start,
                   CASE WHEN c.ts <= p.ts + INTERVAL 1 HOUR
                        THEN p.ts + INTERVAL 1 HOUR END AS win_end,
                   CASE WHEN c.ts <= p.ts + INTERVAL 1 HOUR
                        THEN round(p.value, 6) END AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "events_top_types_per_user": """
            SELECT user_id, event_type, n_events, rank FROM (
              SELECT user_id, event_type, count(*) AS n_events,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC, event_type) AS rank
              FROM events GROUP BY 1, 2
            ) WHERE rank <= 3
        """,
        "events_type_counts": """
            SELECT event_type, count(value) AS n_events,
                   round(sum(value), 6) AS value_sum,
                   round(min(value), 6) AS value_min,
                   round(max(value), 6) AS value_max,
                   round(avg(value), 6) AS value_mean
            FROM events GROUP BY 1
        """,
        "events_attention_pool": """
            SELECT user_id, count(value) AS n_events,
                   round(sum(exp(value / 100) * value) / sum(exp(value / 100)), 6) AS value_attn
            FROM events GROUP BY 1
        """,
        "events_sliding_features": """
            SELECT event_id, user_id, ts,
                   round(window_end_value, 6) AS window_end_value,
                   round(value_wmean, 6) AS value_wmean,
                   round(value_wmin, 6) AS value_wmin,
                   round(value_wmax, 6) AS value_wmax
            FROM (
              SELECT event_id, user_id, ts,
                     value AS window_end_value,
                     row_number() OVER w - 1 AS pos,
                     avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS value_wmean,
                     min(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS value_wmin,
                     max(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS value_wmax
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) WHERE pos >= 4 AND (pos - 4) % 3 = 0
        """,
        "events_reverse_series": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   (row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1)::BIGINT AS rev_idx
            FROM events
        """,
        "events_value_variance": """
            -- same arithmetic shape as the engine's CustomAgg finalizer
            -- (sumsq/n - (sum/n)^2), not var_pop, for float parity
            SELECT event_type, count(value) AS n_events,
                   round(sum(value*value)/count(value)
                         - (sum(value)/count(value))*(sum(value)/count(value)), 6) AS value_var,
                   round(max(value) - min(value), 6) AS value_range
            FROM events GROUP BY 1
        """,
        "events_longest_error_streak": """
            WITH r AS (
              SELECT user_id, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS isl
              FROM events
            ), runs AS (
              SELECT user_id, min(ts) AS run_start, max(ts) AS run_end,
                     count(*)::BIGINT AS n_rows
              FROM r WHERE event_type = 'error' GROUP BY user_id, isl
            )
            SELECT user_id, run_start, run_end, n_rows FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_rows DESC, run_start) AS rn
              FROM runs
            ) WHERE rn = 1
        """,
        "events_standardize_per_user": """
            SELECT event_id, user_id, round(value, 6) AS value,
                   round((value - avg(value) OVER w)
                         / stddev_samp(value) OVER w, 6) AS value_zk
            FROM events
            WINDOW w AS (PARTITION BY user_id)
        """,
        "events_funnel_24h": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t
                     AND e.ts <= s1.t + INTERVAL 24 HOUR GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                     AND e.ts <= s2.t + INTERVAL 24 HOUR GROUP BY 1)
            SELECT u.user_id, s1.t AS ts_view, s2.t AS ts_click,
                   s3.t AS ts_purchase,
                   (CASE WHEN s1.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s2.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS stages_reached
            FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)
        """,
        "events_gains": """
            WITH h AS (
              SELECT value AS s, count(*)::BIGINT AS c,
                     sum((event_type = 'purchase')::BIGINT) AS p
              FROM events GROUP BY 1
            ), w AS (
              SELECT s, c, p,
                     sum(c) OVER (ORDER BY s DESC) - c AS bef
              FROM h
            ), tot AS (
              SELECT count(*)::DOUBLE AS n,
                     sum((event_type = 'purchase')::INT)::DOUBLE AS np
              FROM events
            ), k AS (
              SELECT unnest(generate_series(1, 10)) AS tile
            ), x AS (
              SELECT k.tile,
                     sum(w.p * (least(greatest(
                         tot.n * k.tile / 10.0 - w.bef, 0.0), w.c)
                         / w.c)) AS captured
              FROM w, k, tot GROUP BY 1
            )
            SELECT x.tile::BIGINT AS tile,
                   round(x.captured, 6) AS captured_pos,
                   round(x.captured / tot.np, 6) AS gain,
                   round(x.captured / tot.np / (x.tile / 10.0), 6)
                     AS lift
            FROM x, tot ORDER BY 1
        """,
        "events_brier": """
            WITH t AS (
              SELECT value / 100.0 AS s,
                     event_type = 'purchase' AS y
              FROM events
            ), b AS (
              SELECT CASE WHEN s < 0 THEN 0
                          WHEN s >= 1 THEN 11
                          ELSE 1 + floor(s / 0.1) END::BIGINT AS bin,
                     s, y
              FROM t
            ), g AS (
              SELECT bin, count(*)::BIGINT AS nb, avg(s) AS ms,
                     avg(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS pr
              FROM b GROUP BY 1
            ), m AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(pow(s - CASE WHEN y THEN 1.0 ELSE 0.0 END, 2))
                       AS sq,
                     sum(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS sy
              FROM t
            )
            SELECT m.n::BIGINT AS n_rows,
                   round(m.sq / m.n, 6) AS brier,
                   round(sum((g.nb::DOUBLE / m.n) * pow(g.ms - g.pr, 2)),
                         6) AS reliability,
                   round(sum((g.nb::DOUBLE / m.n)
                             * pow(g.pr - m.sy / m.n, 2)), 6)
                     AS resolution,
                   round((m.sy / m.n) * (1.0 - m.sy / m.n), 6)
                     AS uncertainty
            FROM g, m GROUP BY m.n, m.sq, m.sy
        """,
        "events_ece": """
            WITH t AS (
              SELECT value / 100.0 AS s,
                     event_type = 'purchase' AS y
              FROM events
            ), b AS (
              SELECT CASE WHEN s < 0 THEN 0
                          WHEN s >= 1 THEN 11
                          ELSE 1 + floor(s / 0.1) END::BIGINT AS bin,
                     s, y
              FROM t
            ), g AS (
              SELECT bin, count(*)::BIGINT AS nb, avg(s) AS ms,
                     avg(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS pr
              FROM b GROUP BY 1
            )
            SELECT sum(nb)::BIGINT AS n_rows,
                   round(sum((nb::DOUBLE / (SELECT sum(nb) FROM g))
                             * abs(pr - ms)), 6) AS ece,
                   round(max(abs(pr - ms)), 6) AS mce
            FROM g
        """,
        "events_calibration": """
            -- binning mirrors the engine formula exactly (same double
            -- arithmetic), not width_bucket's internal variant
            WITH t AS (
              SELECT value / 100.0 AS s,
                     event_type = 'purchase' AS y
              FROM events
            ), b AS (
              SELECT CASE WHEN s < 0 THEN 0
                          WHEN s >= 1 THEN 11
                          ELSE 1 + floor(s / 0.1) END::BIGINT AS bin,
                     s, y
              FROM t
            )
            SELECT bin, count(*)::BIGINT AS n_rows,
                   round(avg(s), 6) AS mean_score,
                   round(avg(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6)
                     AS positive_rate
            FROM b GROUP BY 1
        """,
        "events_top3_by_value": """
            SELECT event_id, user_id, round(value, 6) AS value FROM (
              SELECT event_id, user_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rn
              FROM events
            ) WHERE rn <= 3
        """,
        "events_props_extract": """
            SELECT user_id,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     ::BIGINT AS k_sum,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     ::BIGINT AS k_min,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     ::BIGINT AS k_max,
                   count(json_extract_string(props, '$.k'))::BIGINT
                     AS n_events
            FROM events GROUP BY 1
        """,
        "events_binary_metrics": """
            WITH t AS (
              SELECT value >= 50.0 AS p, event_type = 'purchase' AS y
              FROM events
            ), c AS (
              SELECT sum(CASE WHEN p AND y THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END)::BIGINT AS fn,
                     sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END)::BIGINT AS tn
              FROM t
            ), d AS (
              SELECT *, tp / (tp + fp + 0.0) AS prec,
                        tp / (tp + fn + 0.0) AS rec
              FROM c
            )
            SELECT tp, fp, fn, tn,
                   round((tp + tn) / (tp + fp + fn + tn + 0.0), 6) AS accuracy,
                   round(prec, 6) AS precision, round(rec, 6) AS recall,
                   round(2 * prec * rec / (prec + rec), 6) AS f1
            FROM d
        """,
        "events_auc": """
            WITH t AS (
              SELECT value AS s, event_type = 'purchase' AS y FROM events
            ), x AS (
              SELECT s, y, row_number() OVER (ORDER BY s) AS rn FROM t
            ), m AS (
              SELECT s, avg(rn) AS mid,
                     sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
              FROM x GROUP BY 1
            ), k AS (
              SELECT count(*) FILTER (WHERE y) + 0.0 AS npos,
                     count(*) FILTER (WHERE NOT y) + 0.0 AS nneg
              FROM t
            )
            SELECT k.npos::BIGINT AS n_pos, k.nneg::BIGINT AS n_neg,
                   round(((SELECT sum(mid * np) FROM m)
                          - k.npos * (k.npos + 1) / 2)
                         / (k.npos * k.nneg), 6) AS auc
            FROM k
        """,
        "events_next_purchase": """
            WITH nx AS (
              SELECT event_id, user_id, ts, event_type,
                     min(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nts
              FROM events
            )
            SELECT event_id, user_id, ts,
                   CASE WHEN nts - ts <= INTERVAL 24 HOUR THEN nts
                        END AS ts_asof
            FROM nx WHERE event_type = 'click'
        """,
        "events_snapshot_diff": """
            WITH o AS (
              SELECT event_id, value FROM events WHERE event_id % 7 <> 0
            ), n AS (
              SELECT event_id,
                     CASE WHEN event_id % 11 = 0 THEN value + 1.0
                          ELSE value END AS value
              FROM events WHERE event_id % 5 <> 0
            )
            SELECT coalesce(o.event_id, n.event_id) AS event_id,
                   CASE WHEN o.event_id IS NULL THEN 'added'
                        WHEN n.event_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM o FULL JOIN n ON o.event_id = n.event_id
            WHERE o.event_id IS NULL OR n.event_id IS NULL
               OR o.value IS DISTINCT FROM n.value
        """,
        "events_impute_mean": """
            WITH v AS (
              SELECT event_id, user_id,
                     CASE WHEN event_type = 'error' THEN NULL
                          ELSE value END AS value
              FROM events
            )
            SELECT event_id, user_id, round(value, 6) AS value,
                   round(coalesce(value, avg(value) OVER (
                         PARTITION BY user_id)), 6) AS value_filled
            FROM v
        """,
        "events_percent_rank": """
            SELECT event_id, user_id, round(value, 6) AS value,
                   round(percent_rank() OVER (PARTITION BY user_id
                         ORDER BY value), 6) AS pct_rank
            FROM events
        """,
        "events_burstiness": """
            WITH g AS (
              SELECT user_id,
                     epoch(ts - lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id)) AS gap
              FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_gaps,
                   round(avg(gap), 6) AS gap_mean_s,
                   round(stddev_samp(gap), 6) AS gap_std_s,
                   round((stddev_pop(gap) - avg(gap))
                         / (stddev_pop(gap) + avg(gap)), 6) AS burstiness
            FROM g WHERE gap IS NOT NULL GROUP BY 1
        """,
        "events_lag1_autocorr": """
            WITH p AS (
              SELECT user_id, value,
                     lag(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_pairs,
                   round(corr(value, prev), 6) AS autocorr
            FROM p WHERE prev IS NOT NULL GROUP BY 1
        """,
        "events_sample_per_user": """
            SELECT event_id, user_id, round(value, 6) AS value FROM (
              SELECT event_id, user_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY md5(event_id::VARCHAR), event_id) AS rn
              FROM events
            ) WHERE rn <= 5
        """,
        "events_grouping_sets": """
            SELECT coalesce(user_id, -1) AS user_id,
                   coalesce(event_type, '') AS event_type,
                   GROUPING(user_id, event_type)::BIGINT AS grouping_id,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS value_sum
            FROM events
            GROUP BY GROUPING SETS ((user_id, event_type), (user_id), ())
        """,
        "events_winsorize_p95": """
            SELECT event_id, user_id, round(value, 6) AS value,
                   round(least(value, quantile_disc(value, 0.95)
                         OVER (PARTITION BY user_id)), 6) AS value_w95
            FROM events
        """,
        "events_type_corr": """
            WITH p AS (
              SELECT user_id,
                     sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS s_click,
                     sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END) AS s_view,
                     sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS s_purchase,
                     sum(CASE WHEN event_type = 'signup' THEN value ELSE 0 END) AS s_signup,
                     sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END) AS s_error
              FROM events GROUP BY 1
            )
            SELECT 'value_sum_click' AS col_a, 'value_sum_view' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_click, s_view), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_click' AS col_a, 'value_sum_purchase' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_click, s_purchase), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_click' AS col_a, 'value_sum_signup' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_click, s_signup), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_click' AS col_a, 'value_sum_error' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_click, s_error), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_view' AS col_a, 'value_sum_purchase' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_view, s_purchase), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_view' AS col_a, 'value_sum_signup' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_view, s_signup), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_view' AS col_a, 'value_sum_error' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_view, s_error), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_purchase' AS col_a, 'value_sum_signup' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_purchase, s_signup), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_purchase' AS col_a, 'value_sum_error' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_purchase, s_error), 6) AS corr FROM p
              UNION ALL
              SELECT 'value_sum_signup' AS col_a, 'value_sum_error' AS col_b,
                     count(*)::BIGINT AS n_rows,
                     round(corr(s_signup, s_error), 6) AS corr FROM p
        """,
        "events_seasonal_adjust": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   hour(ts)::BIGINT AS phase,
                   round(avg(value) OVER w, 6) AS seasonal_mean,
                   round(value - avg(value) OVER w, 6) AS residual
            FROM events
            WINDOW w AS (PARTITION BY user_id, hour(ts))
        """,
        "events_cusum": """
            -- reflected-walk identity: cusum = c - min(0, running min c)
            WITH c AS (
              SELECT event_id, user_id, ts, value,
                     sum(value - 50.0) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS c
              FROM events
            )
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(c - least(0, min(c) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)), 6)
                     AS cusum
            FROM c
        """,
        "events_cohort_retention": """
            WITH f AS (
              SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
              FROM events GROUP BY 1
            ), a AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
              FROM events
            )
            SELECT f.cohort_day, a.activity_day, count(*)::BIGINT AS n_users
            FROM a JOIN f USING (user_id) GROUP BY 1, 2
        """,
        "events_twa": """
            WITH x AS (
              SELECT user_id, value, ts,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nts
              FROM events
            )
            SELECT user_id,
                   count(*)::BIGINT AS n_segments,
                   round(sum(value * epoch(nts - ts))
                         / sum(epoch(nts - ts)), 6) AS twa
            FROM x WHERE nts IS NOT NULL GROUP BY 1
        """,
        "events_funnel": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
            SELECT u.user_id, s1.t AS ts_view, s2.t AS ts_click,
                   s3.t AS ts_purchase,
                   (CASE WHEN s1.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s2.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS stages_reached
            FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)
        """,
        "events_rolling_median5": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS value_med5
            FROM events
        """,
        "events_rolling_p90": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(quantile_disc(value, 0.9) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6)
                     AS value_p90
            FROM events
        """,
        "events_unpivot_type_sums": """
            SELECT u.user_id, 'value_sum_' || c.cat AS variable,
                   round(coalesce(s.v, 0), 6) AS value_sum
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (VALUES ('click'), ('view'), ('purchase'),
                               ('signup'), ('error')) c(cat)
            LEFT JOIN (SELECT user_id, event_type, sum(value) AS v
                       FROM events GROUP BY 1, 2) s
              ON s.user_id = u.user_id AND s.event_type = c.cat
        """,
        "events_trailing_zscore": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(avg(value) OVER w, 6) AS trailing_mean,
                   round(stddev_samp(value) OVER w, 6) AS trailing_std,
                   round((value - avg(value) OVER w)
                         / stddev_samp(value) OVER w, 6) AS zscore
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
        """,
        "events_linear_trend": """
            SELECT user_id, count(*) AS n_events,
                   round(regr_slope(value, x), 6) AS slope_per_day,
                   round(regr_intercept(value, x), 6) AS intercept,
                   round(corr(value, x), 6) AS corr_xy
            FROM (
              SELECT user_id, value,
                     epoch(ts - TIMESTAMP '2024-01-01') / 86400.0 AS x
              FROM events
            ) GROUP BY 1
        """,
        "events_m4_1h": """
            -- min/max over structs order lexicographically in DuckDB:
            -- (v, t) picks the extreme value with deterministic ts ties,
            -- (t, v) picks the first/last row with deterministic v ties
            SELECT user_id, window_start, n_rows,
                   round(pmin.v, 6) AS v_min,  pmin.t AS ts_at_min,
                   round(pmax.v, 6) AS v_max,  pmax.t AS ts_at_max,
                   round(pfirst.v, 6) AS v_first, pfirst.t AS ts_first,
                   round(plast.v, 6) AS v_last,  plast.t AS ts_last
            FROM (
              SELECT user_id, date_trunc('hour', ts) AS window_start,
                     count(*) AS n_rows,
                     min(struct_pack(v := value, t := ts)) AS pmin,
                     max(struct_pack(v := value, t := ts)) AS pmax,
                     min(struct_pack(t := ts, v := value)) AS pfirst,
                     max(struct_pack(t := ts, v := value)) AS plast
              FROM events GROUP BY 1, 2
            )
        """,
        "events_mad_per_user": """
            WITH m AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     median(value) AS med
              FROM events GROUP BY 1
            ), d AS (
              SELECT e.user_id, m.n_events, m.med,
                     abs(e.value - m.med) AS dev
              FROM events e JOIN m USING (user_id)
            ), a AS (SELECT user_id, median(dev) AS mad FROM d GROUP BY 1)
            SELECT d.user_id, min(d.n_events) AS n_events,
                   round(min(d.med), 6) AS med, round(min(a.mad), 6) AS mad,
                   sum(CASE WHEN d.dev > 3 * 1.4826 * a.mad
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM d JOIN a USING (user_id) GROUP BY d.user_id
        """,
        "events_theil_sen": """
            WITH p AS (
              SELECT a.user_id,
                     (b.value - a.value)
                       / (date_diff('microsecond', a.ts, b.ts) / 1000000.0)
                       AS slope
              FROM events a JOIN events b
                ON a.user_id = b.user_id
               AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
            )
            SELECT user_id, count(slope)::BIGINT AS n_pairs,
                   round(median(slope), 6) AS sen_slope
            FROM p GROUP BY 1
        """,
        "events_spearman_trend": """
            WITH rv AS (
              SELECT user_id, ts, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value)
                       AS rvn
              FROM events
            ), r AS (
              SELECT user_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn,
                     AVG(rvn) OVER (PARTITION BY user_id, value) AS rv
              FROM rv
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(corr(rn, rv), 6) AS spearman
            FROM r GROUP BY 1
        """,
        "events_paa8": """
            WITH r AS (
              SELECT user_id, value,
                     CAST(floor((row_number() OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 - 1) / 8.0) AS BIGINT) AS seg
              FROM events
            )
            SELECT user_id, seg, count(*)::BIGINT AS n_in_seg,
                   round(avg(value), 6) AS seg_mean
            FROM r GROUP BY 1, 2
        """,
        "events_sax4": """
            WITH s AS (
              SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
              FROM events GROUP BY 1
            ), r AS (
              SELECT user_id, value,
                     CAST(floor((row_number() OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 - 1) / 8.0) AS BIGINT) AS seg
              FROM events
            ), p AS (
              SELECT user_id, seg, count(*)::BIGINT AS n_in_seg,
                     avg(value) AS seg_mean
              FROM r GROUP BY 1, 2
            )
            SELECT p.user_id, p.seg, p.n_in_seg,
                   CASE WHEN s.sd IS NULL OR s.sd = 0 THEN NULL
                        WHEN (p.seg_mean - s.mu) / s.sd
                             < -0.6744897501960817 THEN 'a'
                        WHEN (p.seg_mean - s.mu) / s.sd < 0.0 THEN 'b'
                        WHEN (p.seg_mean - s.mu) / s.sd
                             < 0.6744897501960817 THEN 'c'
                        ELSE 'd' END AS symbol
            FROM p JOIN s USING (user_id)
        """,
        "events_value_histogram": """
            SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
                   round(CAST(floor(value / 25.0) AS BIGINT) * 25.0, 6)
                     AS bin_lo,
                   count(*)::BIGINT AS n_rows
            FROM events GROUP BY 1, 2
        """,
        "events_mode_type": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT user_id,
                   struct_extract(min(struct_pack(nn := -n, t := event_type)),
                                  't') AS mode_type,
                   max(n)::BIGINT AS n_mode
            FROM c GROUP BY 1
        """,
        "events_bollinger": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w, 6) AS bb_mean,
                   round(stddev_samp(value) OVER w, 6) AS bb_std,
                   round(avg(value) OVER w
                         + 2.0 * stddev_samp(value) OVER w, 6) AS bb_upper,
                   round(avg(value) OVER w
                         - 2.0 * stddev_samp(value) OVER w, 6) AS bb_lower
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "events_cross_corr_1h": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS w,
                     sum(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END)::BIGINT AS a_n,
                     sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END)::BIGINT AS b_n
              FROM events GROUP BY 1
            ), l AS (
              SELECT a_n, b_n, lag(a_n) OVER (ORDER BY w) AS a_prev FROM h
            )
            SELECT count(*)::BIGINT AS n_windows,
                   round(corr(a_n, b_n), 6) AS corr_lag0,
                   round(corr(a_prev, b_n), 6) AS corr_lag1
            FROM l
        """,
        "events_changepoint": """
            WITH o AS (
              SELECT user_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS k,
                     count(*) OVER (PARTITION BY user_id) AS n,
                     sum(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS ps,
                     sum(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id) AS tot
              FROM events
            ), sc AS (
              SELECT user_id, k, n,
                     ps::DOUBLE / k / 100.0 AS mean_left,
                     (tot - ps)::DOUBLE / (n - k) / 100.0 AS mean_right,
                     k * (n - k) / CAST(n AS DOUBLE)
                       * (ps::DOUBLE / k - (tot - ps)::DOUBLE / (n - k))
                       * (ps::DOUBLE / k - (tot - ps)::DOUBLE / (n - k))
                       AS score
              FROM o WHERE k < n
            ), w AS (
              SELECT user_id, max(n) AS n,
                     min(struct_pack(negs := -score, k := k,
                                     ml := mean_left, mr := mean_right)) AS s
              FROM sc GROUP BY 1
            )
            SELECT user_id, n::BIGINT AS n_events,
                   struct_extract(s, 'k')::BIGINT AS split_k,
                   round(struct_extract(s, 'ml'), 6) AS mean_left,
                   round(struct_extract(s, 'mr'), 6) AS mean_right,
                   round(-struct_extract(s, 'negs'), 6) AS score
            FROM w
        """,
        "events_acf": """
            SELECT user_id, 1::BIGINT AS lag, count(prev)::BIGINT AS n_pairs,
                   round(corr(value, prev), 6) AS autocorr
            FROM (SELECT user_id, value,
                         lag(value, 1) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev
                  FROM events) GROUP BY 1
            UNION ALL
            SELECT user_id, 2::BIGINT AS lag, count(prev)::BIGINT AS n_pairs,
                   round(corr(value, prev), 6) AS autocorr
            FROM (SELECT user_id, value,
                         lag(value, 2) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev
                  FROM events) GROUP BY 1
            UNION ALL
            SELECT user_id, 3::BIGINT AS lag, count(prev)::BIGINT AS n_pairs,
                   round(corr(value, prev), 6) AS autocorr
            FROM (SELECT user_id, value,
                         lag(value, 3) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev
                  FROM events) GROUP BY 1
        """,
        "events_mannwhitney_u": """
            WITH b AS (
              SELECT user_id, event_type, value FROM events
              WHERE event_type IN ('purchase', 'click')
            ), r AS (
              SELECT user_id, event_type,
                     AVG(rn) OVER (PARTITION BY user_id, value) AS rk
              FROM (SELECT user_id, event_type, value,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY value) AS rn
                    FROM b)
            ), u AS (
              SELECT user_id,
                     sum(CASE WHEN event_type = 'purchase'
                              THEN rk ELSE 0 END) AS r_a,
                     sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END)::BIGINT AS n_a,
                     sum(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END)::BIGINT AS n_b
              FROM r GROUP BY 1
            )
            SELECT user_id, n_a, n_b,
                   round(r_a - n_a * (n_a + 1) / 2.0, 6) AS u_stat,
                   round(1 - 2 * (r_a - n_a * (n_a + 1) / 2.0)
                             / (n_a * n_b), 6) AS rank_biserial
            FROM u
        """,
        "events_ks_test": """
            WITH b AS (
              SELECT user_id, value, event_type FROM events
              WHERE event_type IN ('view', 'error')
            ), tot AS (
              SELECT user_id,
                     sum(CASE WHEN event_type = 'view'
                              THEN 1 ELSE 0 END)::BIGINT AS na,
                     sum(CASE WHEN event_type = 'error'
                              THEN 1 ELSE 0 END)::BIGINT AS nb
              FROM b GROUP BY 1
            ), s AS (
              SELECT user_id, value,
                     sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY value) AS ca,
                     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY value) AS cb
              FROM b
            )
            SELECT s.user_id, tot.na AS n_a, tot.nb AS n_b,
                   round(max(abs(s.ca / tot.na - s.cb / tot.nb)), 6) AS ks_d
            FROM s JOIN tot USING (user_id)
            WHERE tot.na > 0 AND tot.nb > 0
            GROUP BY s.user_id, tot.na, tot.nb
        """,
        "events_resample_locf": """
            WITH span AS (
              SELECT user_id, date_trunc('hour', min(ts)) AS w0,
                     date_trunc('hour', max(ts)) AS w1
              FROM events GROUP BY 1
            ), grid AS (
              SELECT user_id,
                     unnest(generate_series(w0, w1, INTERVAL 1 HOUR)) AS ts
              FROM span
            ), pts AS (
              SELECT user_id, ts, value, 0 AS is_grid, event_id FROM events
              UNION ALL
              SELECT user_id, ts, NULL, 1, NULL FROM grid
            ), f AS (
              SELECT user_id, ts, is_grid,
                     last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_grid, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_locf
              FROM pts
            )
            SELECT user_id, ts AS sample_ts, round(value_locf, 6) AS value_locf
            FROM f WHERE is_grid = 1
        """,
        "events_user_quantiles": """
            SELECT user_id,
                   quantile_disc(value, 0.5)  AS q_50,
                   quantile_disc(value, 0.95) AS q_95,
                   quantile_disc(value, 0.99) AS q_99
            FROM events GROUP BY user_id
        """,
        "events_drawdown": """
            WITH r AS (
              SELECT user_id,
                     max(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - value AS dd
              FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(max(dd), 6) AS max_drawdown
            FROM r GROUP BY 1
        """,
        "events_hopping_1h_15m": """
            WITH x AS (
              SELECT user_id, value,
                     (epoch_us(ts) // 900000000) * 900000000 AS pane,
                     unnest([0, 1, 2, 3]) AS j
              FROM events
            )
            SELECT user_id,
                   make_timestamp(pane - j::BIGINT * 900000000) AS window_start,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS value_sum,
                   round(min(value), 6) AS value_min,
                   round(max(value), 6) AS value_max,
                   round(avg(value), 6) AS value_mean
            FROM x GROUP BY 1, 2
        """,
        "events_dominant_period": """
            WITH o AS (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ), l AS (SELECT unnest(generate_series(1, 12)) AS lag),
            c AS (
              SELECT a.user_id, l.lag, corr(a.value, b.value) AS ac
              FROM o a JOIN l ON true
              JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn - l.lag
              GROUP BY 1, 2
            )
            SELECT user_id,
                   struct_extract(min(struct_pack(na := -ac, l := lag)),
                                  'l')::BIGINT AS period,
                   round(-struct_extract(min(struct_pack(na := -ac, l := lag)),
                                         'na'), 6) AS acf_peak
            FROM c WHERE ac IS NOT NULL GROUP BY 1
        """,
        "events_type_concentration": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            ), t AS (
              SELECT user_id, sum(n)::BIGINT AS tot, count(*)::BIGINT AS k
              FROM c GROUP BY 1
            )
            SELECT c.user_id, min(t.tot) AS n_rows, min(t.k) AS n_members,
                   round(sum((c.n / t.tot) * (c.n / t.tot)), 6) AS hhi,
                   round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy,
                   round(max(c.n / t.tot), 6) AS top_share
            FROM c JOIN t USING (user_id) GROUP BY 1
        """,
        "events_daily_user_hhi": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS day, user_id,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            ), t AS (
              SELECT day, sum(n)::BIGINT AS tot, count(*)::BIGINT AS k
              FROM c GROUP BY 1
            )
            SELECT c.day, min(t.tot) AS n_rows, min(t.k) AS n_members,
                   round(sum((c.n / t.tot) * (c.n / t.tot)), 6) AS hhi,
                   round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy,
                   round(max(c.n / t.tot), 6) AS top_share
            FROM c JOIN t USING (day) GROUP BY 1
        """,
        "events_skew_kurtosis": """
            WITH m AS (
              SELECT user_id, count(*)::BIGINT AS n_events, avg(value) AS mean
              FROM events GROUP BY 1
            ), d AS (
              SELECT e.user_id, m.n_events, m.mean, e.value - m.mean AS d
              FROM events e JOIN m USING (user_id)
            ), s AS (
              SELECT user_id, min(n_events) AS n_events, min(mean) AS mean,
                     sum(d*d) / min(n_events) AS m2,
                     sum(d*d*d) / min(n_events) AS m3,
                     sum(d*d*d*d) / min(n_events) AS m4
              FROM d GROUP BY 1)
            SELECT user_id, n_events, round(mean, 6) AS mean,
                   round(m3 / pow(m2, 1.5), 6) AS skew_g1,
                   round(m4 / (m2 * m2) - 3.0, 6) AS kurt_excess
            FROM s
        """,
        "events_ts_features": """
            WITH m AS (
              SELECT user_id, count(*)::BIGINT AS n_events, avg(value) AS mu,
                     sum(value * value) AS abs_energy, max(value) AS mx
              FROM events GROUP BY 1
            ), o AS (
              SELECT e.user_id, e.value, m.mu, m.mx,
                     row_number() OVER w AS rn,
                     lag(e.value) OVER w AS pv
              FROM events e JOIN m USING (user_id)
              WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
            ), agg AS (
              SELECT user_id,
                     avg(abs(value - pv)) AS mean_abs_change,
                     sum(CASE WHEN pv IS NOT NULL
                              AND ((value > mu) != (pv > mu))
                         THEN 1 ELSE 0 END)::BIGINT AS n_mean_crossings,
                     sum(CASE WHEN value > mu THEN 1 ELSE 0 END)::BIGINT
                       AS count_above_mean,
                     min(CASE WHEN value = mx THEN rn END)::BIGINT
                       AS first_loc_max
              FROM o GROUP BY 1
            ), runs AS (
              SELECT user_id, count(*) AS len
              FROM (SELECT user_id, rn,
                           rn - row_number() OVER (
                             PARTITION BY user_id, (value > mu)
                             ORDER BY rn) AS grp
                    FROM o WHERE value > mu)
              GROUP BY user_id, grp
            ), strike AS (
              SELECT user_id, max(len)::BIGINT AS longest_strike_above_mean
              FROM runs GROUP BY 1)
            SELECT m.user_id, m.n_events, round(m.abs_energy, 6) AS abs_energy,
                   round(a.mean_abs_change, 6) AS mean_abs_change,
                   a.n_mean_crossings, a.count_above_mean,
                   coalesce(s.longest_strike_above_mean, 0)
                     AS longest_strike_above_mean,
                   a.first_loc_max
            FROM m JOIN agg a USING (user_id)
            LEFT JOIN strike s USING (user_id)
        """,
        "events_kendall_tau": """
            WITH o AS (
              SELECT user_id, value,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events
            ), p AS (
              SELECT a.user_id, b.value - a.value AS d
              FROM o a JOIN o b ON a.user_id = b.user_id AND b.rn > a.rn
            ), t AS (
              SELECT user_id, count(*)::BIGINT AS n_pairs,
                     sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS c,
                     sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS dd
              FROM p GROUP BY 1)
            SELECT user_id, n_pairs,
                   round((c - dd) / sqrt(n_pairs * (c + dd)), 6) AS kendall_tau
            FROM t
        """,
        "events_session_stats": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN date_diff('microsecond',
                                         lag(ts) OVER w, ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            ), sess AS (
              SELECT user_id, sid, count(*)::BIGINT AS n_rows,
                     date_diff('microsecond', min(ts), max(ts)) / 1000000.0
                       AS duration_sec
              FROM s GROUP BY 1, 2)
            SELECT user_id, count(*)::BIGINT AS n_sessions,
                   round(avg(n_rows), 6) AS avg_session_events,
                   max(n_rows) AS max_session_events,
                   round(avg(duration_sec), 6) AS avg_duration_sec,
                   round(max(duration_sec), 6) AS max_duration_sec
            FROM sess GROUP BY 1
        """,
        "events_recs_by_lift": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            u AS (SELECT count(DISTINCT user_id) AS nu FROM events),
            c AS (SELECT event_type, count(*)::BIGINT AS n
                  FROM d GROUP BY 1),
            p AS (
              SELECT a.event_type AS member_a, b.event_type AS member_b,
                     count(*)::BIGINT AS n_both
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2),
            pre AS (
              SELECT p.member_a, p.member_b,
                     (p.n_both * u.nu)::DOUBLE / (ca.n * cb.n) AS lift
              FROM p, u
              JOIN c ca ON ca.event_type = p.member_a
              JOIN c cb ON cb.event_type = p.member_b),
            q AS (
              SELECT member_a AS given, member_b AS rec, lift FROM pre
              UNION ALL
              SELECT member_b, member_a, lift FROM pre),
            r AS (
              SELECT given, rec, lift,
                     row_number() OVER (PARTITION BY given
                                        ORDER BY lift DESC, rec) AS rnk
              FROM q)
            SELECT given, rec, round(lift, 6) AS lift, rnk::BIGINT AS rnk
            FROM r WHERE rnk <= 3 ORDER BY 1, 4
        """,
        "events_type_cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
            u AS (SELECT count(DISTINCT user_id) AS nu FROM events),
            c AS (SELECT event_type, count(*)::BIGINT AS n FROM d GROUP BY 1),
            p AS (
              SELECT a.event_type AS member_a, b.event_type AS member_b,
                     count(*)::BIGINT AS n_both
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT p.member_a, p.member_b, p.n_both,
                   round((p.n_both * u.nu)::DOUBLE / (ca.n * cb.n), 6) AS lift,
                   round(p.n_both::DOUBLE / (ca.n + cb.n - p.n_both), 6)
                     AS jaccard
            FROM p, u
            JOIN c ca ON ca.event_type = p.member_a
            JOIN c cb ON cb.event_type = p.member_b
        """,
        "events_complexity": """
            WITH q AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS kq,
                     lag(CAST(round(value * 100) AS BIGINT)) OVER w AS pv,
                     lead(CAST(round(value * 100) AS BIGINT), 1) OVER w AS k1,
                     lead(CAST(round(value * 100) AS BIGINT), 2) OVER w AS k2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), base AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     min(value) AS mn, max(value) AS mx
              FROM events GROUP BY 1
            ), cub AS (
              SELECT user_id,
                     sum(kq * k1 * k2) AS s3,
                     sum(k2 * k2 * k1 - k1 * kq * kq) AS st,
                     count(*)::BIGINT AS cnt3
              FROM q WHERE k2 IS NOT NULL GROUP BY 1
            ), dif AS (
              SELECT user_id,
                     sum((k1 - kq) * (k1 - kq)) AS sd,
                     count(*)::BIGINT AS cnt1
              FROM q WHERE k1 IS NOT NULL GROUP BY 1
            ), pk AS (
              SELECT user_id,
                     sum(CASE WHEN pv IS NOT NULL AND k1 IS NOT NULL
                               AND pv < kq AND kq > k1
                         THEN 1 ELSE 0 END)::BIGINT AS n_peaks
              FROM q GROUP BY 1
            ), bn AS (
              SELECT e.user_id,
                     CASE WHEN b.mx = b.mn THEN 0
                          ELSE least(CAST(floor((e.value - b.mn)
                                 / (b.mx - b.mn) * 10) AS BIGINT), 9)
                     END AS bin
              FROM events e JOIN base b USING (user_id)
            ), bc AS (
              SELECT user_id, bin, count(*)::DOUBLE AS c
              FROM bn GROUP BY 1, 2
            ), ent AS (
              SELECT bc.user_id,
                     -sum((c / b.n_events) * ln(c / b.n_events))
                       AS binned_entropy
              FROM bc JOIN base b USING (user_id) GROUP BY 1)
            SELECT b.user_id, b.n_events,
                   round(CASE WHEN c.cnt3 > 0
                         THEN c.s3::DOUBLE / c.cnt3 / 1000000.0 END, 6) AS c3,
                   round(CASE WHEN c.cnt3 > 0
                         THEN c.st::DOUBLE / c.cnt3 / 1000000.0 END, 6)
                     AS time_rev_asym,
                   round(CASE WHEN d.cnt1 > 0
                         THEN sqrt(d.sd::DOUBLE) / 100.0 END, 6) AS cid_ce,
                   p.n_peaks,
                   round(e.binned_entropy, 6) AS binned_entropy
            FROM base b
            LEFT JOIN cub c USING (user_id)
            LEFT JOIN dif d USING (user_id)
            JOIN pk p USING (user_id)
            JOIN ent e USING (user_id)
        """,
        "events_location_features": """
            WITH o AS (
              SELECT user_id, value,
                     CAST(round(value * 100) AS BIGINT) AS c,
                     row_number() OVER w AS rn,
                     lead(CAST(round(value * 100) AS BIGINT), 1) OVER w AS c1,
                     lead(CAST(round(value * 100) AS BIGINT), 2) OVER w AS c2,
                     sum(abs(CAST(round(value * 100) AS BIGINT)))
                       OVER (w ROWS UNBOUNDED PRECEDING) AS pref
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), base AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     sum(c) AS s, sum(c * c) AS ss, sum(abs(c)) AS tot,
                     max(c) AS cmx, min(c) AS cmn,
                     count(DISTINCT value)::BIGINT AS n_uniq
              FROM o GROUP BY 1
            ), locs AS (
              SELECT o.user_id,
                     max(CASE WHEN o.c = b.cmx THEN o.rn END)::BIGINT
                       AS last_loc_max,
                     min(CASE WHEN o.c = b.cmn THEN o.rn END)::BIGINT
                       AS first_loc_min,
                     min(CASE WHEN 2 * o.pref >= b.tot THEN o.rn END)::BIGINT
                       AS imq_rn,
                     sum(CASE WHEN
                           (o.c * b.n_events - b.s)::HUGEINT
                           * (o.c * b.n_events - b.s)
                           > 4::HUGEINT * (b.n_events * b.ss - b.s * b.s)
                         THEN 1 ELSE 0 END)::BIGINT AS n_beyond
              FROM o JOIN base b USING (user_id) GROUP BY 1
            ), der AS (
              SELECT user_id, sum(c2 - 2 * c1 + c) AS sd,
                     count(*)::BIGINT AS cnt3
              FROM o WHERE c2 IS NOT NULL GROUP BY 1)
            SELECT b.user_id, b.n_events, l.last_loc_max, l.first_loc_min,
                   round(l.imq_rn::DOUBLE / b.n_events, 6) AS imq50_pos,
                   round(CASE WHEN d.cnt3 > 0
                         THEN d.sd::DOUBLE / (2 * d.cnt3) / 100.0 END, 6)
                     AS mean_2nd_deriv,
                   round(l.n_beyond::DOUBLE / b.n_events, 6)
                     AS ratio_beyond_2sigma,
                   round(b.n_uniq::DOUBLE / b.n_events, 6) AS ratio_unique
            FROM base b JOIN locs l USING (user_id)
            LEFT JOIN der d USING (user_id)
        """,
        "events_energy_chunks": """
            WITH o AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS kq,
                     ntile(10) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS chunk
              FROM events
            ), g AS (
              SELECT user_id, chunk::BIGINT AS chunk,
                     count(*)::BIGINT AS n_in_chunk, sum(kq * kq) AS e
              FROM o GROUP BY 1, 2)
            SELECT user_id, chunk, n_in_chunk,
                   round(e::DOUBLE / sum(e) OVER (PARTITION BY user_id), 6)
                     AS energy_frac
            FROM g
        """,
        "events_key_skew": """
            WITH c AS (
              SELECT user_id, count(*)::BIGINT AS n
              FROM events GROUP BY 1)
            SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS n_rows,
                   max(n)::BIGINT AS max_per_key,
                   quantile_disc(n, 0.5)::BIGINT AS p50_per_key,
                   quantile_disc(n, 0.99)::BIGINT AS p99_per_key,
                   round(max(n)::DOUBLE / sum(n), 6) AS top1_share,
                   round(sum(n * n)::DOUBLE / (sum(n) * sum(n)), 6) AS hhi
            FROM c
        """,
        "events_type_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS nxt
              FROM events
            ), g AS (
              SELECT event_type AS role_from, nxt AS role_to,
                     count(*)::BIGINT AS n_transitions
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT role_from, role_to, n_transitions,
                   round(n_transitions::DOUBLE
                         / sum(n_transitions) OVER (PARTITION BY role_from),
                         6) AS frac_from
            FROM g
        """,
        "events_benford": """
            WITH d AS (
              SELECT event_type,
                     substr((CAST(round(value * 100) AS BIGINT))::VARCHAR,
                            1, 1)::BIGINT AS digit
              FROM events WHERE round(value * 100) > 0
            ), g AS (
              SELECT event_type, digit, count(*)::BIGINT AS n
              FROM d GROUP BY 1, 2)
            SELECT event_type, digit, n,
                   round(n::DOUBLE
                         / sum(n) OVER (PARTITION BY event_type), 6) AS frac,
                   round(log10(1 + 1.0 / digit), 6) AS benford_p
            FROM g
        """,
        "events_interarrival": """
            WITH o AS (
              SELECT user_id,
                     date_diff('microsecond', lag(ts) OVER w, ts) AS dt_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), g AS (
              SELECT user_id, count(dt_us)::BIGINT AS n_gaps,
                     sum(dt_us) AS s_us, min(dt_us) AS mn_us,
                     max(dt_us) AS mx_us,
                     sum((dt_us / 1000000.0) * (dt_us / 1000000.0)) AS sd2
              FROM o WHERE dt_us IS NOT NULL GROUP BY 1
            ), b AS (
              SELECT user_id, count(*)::BIGINT AS n_events
              FROM events GROUP BY 1)
            SELECT b.user_id, b.n_events,
                   coalesce(g.n_gaps, 0) AS n_gaps,
                   round(g.s_us::DOUBLE / g.n_gaps / 1000000.0, 6)
                     AS mean_gap_s,
                   round(g.mn_us / 1000000.0, 6) AS min_gap_s,
                   round(g.mx_us / 1000000.0, 6) AS max_gap_s,
                   round(g.sd2 / g.n_gaps
                         - (g.s_us::DOUBLE / g.n_gaps / 1000000.0)
                           * (g.s_us::DOUBLE / g.n_gaps / 1000000.0), 6)
                     AS var_gap_s
            FROM b LEFT JOIN g USING (user_id)
        """,
        "events_expectations": """
            SELECT 0::BIGINT AS rule_id, 'not_null' AS rule,
                   'value' AS col, count(*)::BIGINT AS n_checked,
                   (count(*) - count(value))::BIGINT AS n_violations,
                   (count(*) - count(value)) = 0 AS passed
            FROM events
            UNION ALL
            SELECT 1, 'unique', 'event_id', count(*)::BIGINT,
                   (count(*) - count(DISTINCT event_id))::BIGINT,
                   count(*) = count(DISTINCT event_id)
            FROM events
            UNION ALL
            SELECT 2, 'in_set', 'event_type', count(*)::BIGINT,
                   (count(*) - count(*) FILTER (WHERE event_type IN
                     ('view','click','purchase','signup','error')))
                     ::BIGINT,
                   count(*) = count(*) FILTER (WHERE event_type IN
                     ('view','click','purchase','signup','error'))
            FROM events
            UNION ALL
            SELECT 3, 'range', 'value', count(*)::BIGINT,
                   (count(*) - count(*) FILTER
                     (WHERE value BETWEEN -1000.0 AND 1000.0))::BIGINT,
                   count(*) = count(*) FILTER
                     (WHERE value BETWEEN -1000.0 AND 1000.0)
            FROM events
            UNION ALL
            SELECT 4, 'regex', 'props', count(*)::BIGINT,
                   (count(*) - count(*) FILTER
                     (WHERE regexp_full_match(props, '\\{.*\\}')))::BIGINT,
                   count(*) = count(*) FILTER
                     (WHERE regexp_full_match(props, '\\{.*\\}'))
            FROM events
            ORDER BY 1
        """,
        "events_avg_precision": """
            WITH h AS (
              SELECT value AS s,
                     (count(*) FILTER (WHERE event_type = 'purchase'))
                       ::BIGINT AS np,
                     (count(*) FILTER (WHERE event_type != 'purchase'))
                       ::BIGINT AS nn
              FROM events GROUP BY 1),
            c AS (
              SELECT s, np, nn,
                     sum(np) OVER (ORDER BY s DESC) AS tp,
                     sum(nn) OVER (ORDER BY s DESC) AS fp,
                     sum(np) OVER () AS pos,
                     sum(nn) OVER () AS negs
              FROM h)
            SELECT min(pos)::BIGINT AS n_pos,
                   min(negs)::BIGINT AS n_neg,
                   round(sum((np::DOUBLE / pos)
                             * (tp::DOUBLE / (tp + fp))), 6)
                     AS avg_precision
            FROM c WHERE np > 0
        """,
        "events_arch_effect": """
            WITH d AS (
              SELECT user_id, ts, event_id,
                     abs(value - lag(value) OVER w) AS ad
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            l AS (SELECT user_id, ad,
                         lag(ad) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pad
                  FROM d WHERE ad IS NOT NULL)
            SELECT user_id, count(pad)::BIGINT AS n_pairs,
                   round(corr(ad, pad), 6) AS arch_corr
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "events_daily_type_entropy": """
            WITH c AS (
              SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
                     event_type, count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2),
            n AS (SELECT day, sum(c) AS n, count(*) AS n_types
                  FROM c GROUP BY 1),
            e AS (SELECT c.day,
                         sum((c.c::DOUBLE / n.n) * ln(c.c::DOUBLE / n.n))
                           AS t
                  FROM c JOIN n USING (day) GROUP BY 1),
            top AS (SELECT day,
                           min(struct_pack(negc := -c, et := event_type))
                             AS s
                    FROM c GROUP BY 1)
            SELECT make_timestamp(n.day * 86400000000) AS day,
                   n.n::BIGINT AS n_events, n.n_types::BIGINT AS n_types,
                   round(-e.t, 6) AS mix_entropy,
                   struct_extract(top.s, 'et') AS top_type,
                   round((-struct_extract(top.s, 'negc'))::DOUBLE / n.n, 6)
                     AS top_share
            FROM n JOIN e USING (day) JOIN top USING (day) ORDER BY 1
        """,
        "events_seasonal_outliers": """
            WITH r AS (
              SELECT event_type,
                     value - avg(value) OVER (PARTITION BY event_type,
                                              hour(ts)) AS resid
              FROM events),
            m AS (SELECT event_type, count(*)::BIGINT AS n_events,
                         median(resid) AS med
                  FROM r GROUP BY 1),
            d AS (SELECT r.event_type, m.n_events, m.med,
                         abs(r.resid - m.med) AS dev
                  FROM r JOIN m USING (event_type)),
            a AS (SELECT event_type, median(dev) AS mad FROM d GROUP BY 1)
            SELECT d.event_type, min(d.n_events) AS n_events,
                   round(min(d.med), 6) AS med,
                   round(min(a.mad), 6) AS mad,
                   sum(CASE WHEN d.dev > 3 * 1.4826 * a.mad
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM d JOIN a USING (event_type)
            GROUP BY d.event_type ORDER BY 1
        """,
        "events_gini_users": """
            WITH c AS (
              SELECT event_type, user_id, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT event_type, n,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY n) AS rn
              FROM c)
            SELECT event_type,
                   count(*)::BIGINT AS n_users,
                   sum(n)::BIGINT AS total_events,
                   round((2.0 * sum(rn * n)) / (count(*) * sum(n))
                         - (count(*) + 1.0) / count(*), 6) AS gini
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "events_stl_strength": """
            WITH c AS (
              SELECT event_type,
                     (epoch_us(ts) // 3600000000)::BIGINT AS hr,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
                  FROM c GROUP BY 1),
            grid AS (
              SELECT b.event_type, b.h0, b.h1, g.hr
              FROM b, LATERAL (SELECT unnest(range(b.h0, b.h1 + 1)) AS hr) g),
            y AS (
              SELECT grid.event_type, grid.h0, grid.h1, grid.hr,
                     coalesce(c.n, 0)::BIGINT AS y
              FROM grid LEFT JOIN c
                ON grid.event_type = c.event_type AND grid.hr = c.hr),
            t AS (
              SELECT *,
                     sum(y) OVER (PARTITION BY event_type ORDER BY hr
                                  ROWS BETWEEN 12 PRECEDING
                                  AND 12 FOLLOWING) AS wsum
              FROM y),
            d AS (
              SELECT event_type, hr, y, y - wsum / 25.0 AS d,
                     (hr % 24) AS phase
              FROM t WHERE hr - h0 >= 12 AND h1 - hr >= 12),
            s AS (SELECT event_type, phase, sum(d) / count(*) AS smean
                  FROM d GROUP BY 1, 2),
            r AS (
              SELECT d.event_type, d.d, d.d - s.smean AS resid,
                     d.y - s.smean AS deseason
              FROM d JOIN s USING (event_type, phase)),
            m AS (
              SELECT event_type, count(*) AS n,
                     sum(d) / count(*) AS md,
                     sum(resid) / count(*) AS mr,
                     sum(deseason) / count(*) AS mdes
              FROM r GROUP BY 1),
            v AS (
              SELECT r.event_type, min(m.n) AS n,
                     sum((r.d - m.md) * (r.d - m.md)) / min(m.n) AS var_d,
                     sum((r.resid - m.mr) * (r.resid - m.mr)) / min(m.n)
                       AS var_resid,
                     sum((r.deseason - m.mdes) * (r.deseason - m.mdes))
                       / min(m.n) AS var_des
              FROM r JOIN m ON r.event_type = m.event_type GROUP BY 1),
            span AS (SELECT event_type, (h1 - h0 + 1)::BIGINT AS n_hours
                     FROM b)
            SELECT span.event_type, span.n_hours,
                   coalesce(v.n, 0)::BIGINT AS n_valid,
                   round(v.var_resid, 6) AS var_resid,
                   CASE WHEN v.var_d > 0 THEN
                     round(CASE WHEN 1 - v.var_resid / v.var_d < 0
                           THEN 0.0 ELSE 1 - v.var_resid / v.var_d END, 6)
                   END AS seasonal_strength,
                   CASE WHEN v.var_des > 0 THEN
                     round(CASE WHEN 1 - v.var_resid / v.var_des < 0
                           THEN 0.0 ELSE 1 - v.var_resid / v.var_des END, 6)
                   END AS trend_strength
            FROM span LEFT JOIN v ON v.event_type = span.event_type
            ORDER BY span.event_type
        """,
        "events_ljung_box": """
            WITH m AS (SELECT user_id, count(*) AS n,
                              sum(value)/count(*) AS mu
                       FROM events GROUP BY 1),
            c AS (SELECT e.user_id, e.ts, e.event_id, e.value - m.mu AS d,
                         m.n
                  FROM events e JOIN m USING (user_id)),
            l AS (SELECT user_id, n, d,
                         lag(d, 1) OVER w AS d1,
                         lag(d, 2) OVER w AS d2,
                         lag(d, 3) OVER w AS d3
                  FROM c
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (SELECT user_id, min(n) AS n, sum(d*d) AS s0,
                         sum(d*d1) AS s1, sum(d*d2) AS s2, sum(d*d3) AS s3
                  FROM l GROUP BY 1)
            SELECT user_id, n::BIGINT AS n_obs,
                   round(s1/s0, 6) AS r1,
                   round(s2/s0, 6) AS r2,
                   round(s3/s0, 6) AS r3,
                   round(n*(n+2.0) * ((s1/s0)*(s1/s0)/(n-1)
                                      + (s2/s0)*(s2/s0)/(n-2)
                                      + (s3/s0)*(s3/s0)/(n-3)), 6) AS q_stat
            FROM s ORDER BY user_id
        """,
        "events_runs_test": """
            WITH med AS (
              SELECT user_id, quantile_disc(value, 0.5) AS med,
                     count(*) AS n_obs
              FROM events GROUP BY 1),
            f AS (
              SELECT e.user_id, m.n_obs, e.value > m.med AS s,
                     e.ts, e.event_id
              FROM events e JOIN med m USING (user_id)
              WHERE e.value != m.med),
            r AS (
              SELECT user_id, n_obs, s,
                     lag(s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS ps
              FROM f),
            agg AS (
              SELECT user_id, min(n_obs) AS n_obs, count(*) AS n_used,
                     (count(*) FILTER (WHERE s)) AS n1,
                     (count(*) FILTER (WHERE NOT s)) AS n2,
                     (count(*) FILTER (WHERE ps IS NULL OR s != ps))
                       AS n_runs
              FROM r GROUP BY 1)
            SELECT m2.user_id, m2.n_obs::BIGINT AS n_obs,
                   coalesce(a.n_used, 0)::BIGINT AS n_used,
                   coalesce(a.n_runs, 0)::BIGINT AS n_runs,
                   CASE WHEN a.n1 > 0 AND a.n2 > 0 THEN
                     round((a.n_runs - (2.0*a.n1*a.n2/(a.n1+a.n2) + 1.0))
                           / sqrt((2.0*a.n1*a.n2
                                   * (2.0*a.n1*a.n2 - a.n1 - a.n2))
                                  / ((a.n1+a.n2)::DOUBLE * (a.n1+a.n2)
                                     * ((a.n1+a.n2) - 1.0))), 6)
                   END AS z
            FROM med m2 LEFT JOIN agg a USING (user_id)
            ORDER BY user_id
        """,
        "events_user_lifetime": """
            SELECT user_id, count(*)::BIGINT AS n_events,
                   min(ts) AS first_seen, max(ts) AS last_seen,
                   (epoch_us(max(ts)) // 86400000000
                    - epoch_us(min(ts)) // 86400000000 + 1)::BIGINT
                     AS tenure_days,
                   count(DISTINCT epoch_us(ts) // 86400000000)::BIGINT
                     AS active_days
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "events_session_type_pairs": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id || ':' ||
                     (sum(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW))::VARCHAR AS skey,
                     event_type
              FROM o),
            d AS (SELECT DISTINCT skey, event_type FROM s),
            u AS (SELECT count(DISTINCT skey) AS ng FROM d),
            c AS (SELECT event_type, count(*)::BIGINT AS n
                  FROM d GROUP BY 1),
            p AS (
              SELECT a.event_type AS member_a, b.event_type AS member_b,
                     count(*)::BIGINT AS n_both
              FROM d a JOIN d b
                ON a.skey = b.skey AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT p.member_a, p.member_b, p.n_both,
                   round((p.n_both * u.ng)::DOUBLE / (ca.n * cb.n), 6)
                     AS lift,
                   round(p.n_both::DOUBLE / (ca.n + cb.n - p.n_both), 6)
                     AS jaccard
            FROM p, u
            JOIN c ca ON ca.event_type = p.member_a
            JOIN c cb ON cb.event_type = p.member_b
            ORDER BY p.member_a, p.member_b
        """,
        "events_peak_detect": """
            WITH RECURSIVE o AS (
              SELECT user_id, event_id, ts, value,
                     lag(value) OVER w AS pv, lead(value) OVER w AS nv
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            thr AS (SELECT user_id, quantile_disc(value, 0.9) AS p90
                    FROM events GROUP BY 1),
            cand AS (
              SELECT o.user_id, o.event_id, o.ts, o.value,
                     row_number() OVER (PARTITION BY o.user_id
                                        ORDER BY o.ts, o.event_id) AS rn
              FROM o JOIN thr USING (user_id)
              WHERE o.pv IS NOT NULL AND o.nv IS NOT NULL
                AND o.value > o.pv AND o.value > o.nv
                AND o.value > thr.p90),
            rec AS (
              SELECT user_id, event_id, ts, value, rn, TRUE AS kept,
                     ts AS last_kept
              FROM cand WHERE rn = 1
              UNION ALL
              SELECT c.user_id, c.event_id, c.ts, c.value, c.rn,
                     date_diff('microsecond', rec.last_kept, c.ts)
                       >= 60000000 AS kept,
                     CASE WHEN date_diff('microsecond', rec.last_kept,
                                         c.ts) >= 60000000
                          THEN c.ts ELSE rec.last_kept END AS last_kept
              FROM cand c
              JOIN rec ON c.user_id = rec.user_id AND c.rn = rec.rn + 1)
            SELECT user_id, event_id, ts, round(value, 6) AS value
            FROM rec WHERE kept ORDER BY user_id, rn
        """,
        "events_rr_intervals": """
            WITH RECURSIVE o AS (
              SELECT user_id, event_id, ts, value,
                     lag(value) OVER w AS pv, lead(value) OVER w AS nv
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            thr AS (SELECT user_id, quantile_disc(value, 0.9) AS p90
                    FROM events GROUP BY 1),
            cand AS (
              SELECT o.user_id, o.event_id, o.ts,
                     row_number() OVER (PARTITION BY o.user_id
                                        ORDER BY o.ts, o.event_id) AS rn
              FROM o JOIN thr USING (user_id)
              WHERE o.pv IS NOT NULL AND o.nv IS NOT NULL
                AND o.value > o.pv AND o.value > o.nv
                AND o.value > thr.p90),
            rec AS (
              SELECT user_id, event_id, ts, rn, TRUE AS kept,
                     ts AS last_kept
              FROM cand WHERE rn = 1
              UNION ALL
              SELECT c.user_id, c.event_id, c.ts, c.rn,
                     date_diff('microsecond', rec.last_kept, c.ts)
                       >= 60000000 AS kept,
                     CASE WHEN date_diff('microsecond', rec.last_kept,
                                         c.ts) >= 60000000
                          THEN c.ts ELSE rec.last_kept END AS last_kept
              FROM cand c
              JOIN rec ON c.user_id = rec.user_id AND c.rn = rec.rn + 1),
            g AS (
              SELECT user_id, rn,
                     date_diff('microsecond',
                               lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY rn), ts) AS g_us
              FROM rec WHERE kept),
            p AS (SELECT user_id, count(*) AS n
                  FROM rec WHERE kept GROUP BY 1),
            gg AS (SELECT user_id, g_us,
                          g_us - lag(g_us) OVER (PARTITION BY user_id
                                                 ORDER BY rn) AS d_us
                   FROM g WHERE g_us IS NOT NULL),
            agg AS (SELECT user_id, sum(g_us) AS gsum,
                           (count(*) FILTER (WHERE d_us IS NOT NULL))
                             AS nd,
                           sum((d_us::DOUBLE) * (d_us::DOUBLE)) AS ssq
                    FROM gg GROUP BY 1)
            SELECT p.user_id, p.n::BIGINT AS n_peaks,
                   CASE WHEN p.n >= 2 THEN
                     round((agg.gsum::DOUBLE / 1000000.0) / (p.n - 1), 6)
                   END AS mean_rr_s,
                   CASE WHEN agg.nd >= 1 THEN
                     round(sqrt(agg.ssq / 1000000000000.0 / agg.nd), 6)
                   END AS rmssd_s
            FROM p LEFT JOIN agg USING (user_id)
            ORDER BY p.user_id
        """,
        "events_holt_forecast": """
            WITH RECURSIVE base AS (
              SELECT event_id, user_id, ts, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events),
            r AS (
              SELECT event_id, user_id, ts, value, rn,
                     value::DOUBLE AS l, 0.0::DOUBLE AS b
              FROM base WHERE rn = 1
              UNION ALL
              SELECT bb.event_id, bb.user_id, bb.ts, bb.value, bb.rn,
                     0.4 * bb.value + 0.6 * (r.l + r.b) AS l,
                     0.2 * ((0.4 * bb.value + 0.6 * (r.l + r.b)) - r.l)
                       + 0.8 * r.b AS b
              FROM base bb
              JOIN r ON bb.user_id = r.user_id AND bb.rn = r.rn + 1)
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(l, 6) AS holt_level,
                   round(b, 6) AS holt_trend,
                   round(l + b, 6) AS holt_forecast
            FROM r ORDER BY user_id, rn
        """,
        "events_debounce_1m": """
            WITH RECURSIVE base AS (
              SELECT event_id, user_id, ts,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events),
            r AS (
              SELECT event_id, user_id, ts, rn, TRUE AS kept,
                     ts AS last_kept
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.event_id, b.user_id, b.ts, b.rn,
                     date_diff('microsecond', r.last_kept, b.ts)
                       >= 60000000 AS kept,
                     CASE WHEN date_diff('microsecond', r.last_kept, b.ts)
                               >= 60000000
                          THEN b.ts ELSE r.last_kept END AS last_kept
              FROM base b
              JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
            SELECT event_id, user_id, ts FROM r WHERE kept
            ORDER BY user_id, rn
        """,
        "events_ewma": """
            WITH RECURSIVE base AS (
              SELECT event_id, user_id, ts, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ), r AS (
              SELECT event_id, user_id, ts, value, rn,
                     value AS value_ewma
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.event_id, b.user_id, b.ts, b.value, b.rn,
                     0.3 * b.value + 0.7 * r.value_ewma
              FROM base b
              JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1
            )
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(value_ewma, 6) AS value_ewma
            FROM r ORDER BY user_id, rn
        """,
        "events_out_of_order": """
            WITH o AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pm
              FROM events)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   (count(*) FILTER (WHERE pm IS NOT NULL AND ts < pm))
                     ::BIGINT AS n_late,
                   round((count(*) FILTER (WHERE pm IS NOT NULL
                                           AND ts < pm))::DOUBLE
                         / count(*), 6) AS late_share,
                   round(max(CASE WHEN pm IS NOT NULL AND ts < pm THEN
                             date_diff('microsecond', ts, pm) END)
                         / 1000000.0, 6) AS max_lateness_s
            FROM o GROUP BY 1 ORDER BY 1
        """,
        "events_trimmed_mean": """
            WITH r AS (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events)
            SELECT user_id, min(n)::BIGINT AS n_events,
                   min(floor(0.1 * n))::BIGINT AS n_trimmed_each,
                   round(sum(value) FILTER (
                           WHERE rn > floor(0.1 * n)
                             AND rn <= n - floor(0.1 * n))
                         / (min(n) - 2 * min(floor(0.1 * n))), 6)
                     AS trimmed_mean
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "events_psi_daily": """
            WITH mm AS (SELECT min(value) AS lo, max(value) AS hi
                        FROM events),
            b AS (
              SELECT (epoch_us(ts) // 86400000000)::BIGINT AS day,
                     CASE WHEN mm.hi = mm.lo THEN 0
                          ELSE least(9, greatest(0,
                            floor((value - mm.lo) * 10.0
                                  / (mm.hi - mm.lo))::BIGINT))
                     END AS bin
              FROM events, mm),
            c AS (SELECT day, bin, count(*)::BIGINT AS c
                  FROM b GROUP BY 1, 2),
            days AS (SELECT DISTINCT day FROM c),
            grid AS (SELECT day, unnest(range(0, 10)) AS bin FROM days),
            d AS (SELECT grid.day, grid.bin, coalesce(c.c, 0)::BIGINT AS c
                  FROM grid LEFT JOIN c USING (day, bin)),
            s AS (SELECT day, bin,
                         sum(c) OVER (PARTITION BY day) AS n,
                         dense_rank() OVER (ORDER BY day) AS rk,
                         (c + 0.5)
                         / (sum(c) OVER (PARTITION BY day) + 5.0) AS p
                  FROM d)
            SELECT make_timestamp(cur.day * 86400000000) AS day,
                   min(cur.n)::BIGINT AS n_events,
                   round(sum((cur.p - prev.p) * ln(cur.p / prev.p)), 6)
                     AS psi
            FROM s cur LEFT JOIN s prev
              ON prev.rk = cur.rk - 1 AND prev.bin = cur.bin
            GROUP BY cur.day ORDER BY 1
        """,
        "events_hour_entropy": """
            WITH h AS (
              SELECT user_id,
                     ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS hour,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2),
            n AS (SELECT user_id, sum(c) AS n FROM h GROUP BY 1)
            SELECT h.user_id, min(n.n)::BIGINT AS n_events,
                   count(*)::BIGINT AS n_hours_active,
                   round(-sum((h.c::DOUBLE / n.n)
                              * ln(h.c::DOUBLE / n.n)), 6) AS hour_entropy
            FROM h JOIN n USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "events_record_highs": """
            WITH o AS (
              SELECT user_id, ts, value,
                     max(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prevmax
              FROM events)
            SELECT user_id,
                   count(*)::BIGINT AS n_events,
                   (count(*) FILTER (WHERE prevmax IS NULL
                                     OR value > prevmax))::BIGINT
                     AS n_records,
                   max(ts) FILTER (WHERE prevmax IS NULL
                                   OR value > prevmax) AS last_record_ts,
                   round(max(value), 6) AS record_value
            FROM o GROUP BY 1 ORDER BY 1
        """,
        "events_perm_entropy": """
            WITH l AS (
              SELECT user_id, value AS a,
                     lead(value, 1) OVER w AS b,
                     lead(value, 2) OVER w AS c
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), p AS (
              SELECT user_id,
                     (CASE WHEN b >= a THEN 4 ELSE 0 END
                      + CASE WHEN c >= a THEN 2 ELSE 0 END
                      + CASE WHEN c >= b THEN 1 ELSE 0 END) AS code
              FROM l WHERE c IS NOT NULL
            ), g AS (
              SELECT user_id, code, count(*)::BIGINT AS n
              FROM p GROUP BY 1, 2
            ), tt AS (
              SELECT user_id, sum(n)::BIGINT AS nt FROM g GROUP BY 1)
            SELECT g.user_id, min(tt.nt) AS n_triples,
                   round(-sum((g.n::DOUBLE / tt.nt)
                              * ln(g.n::DOUBLE / tt.nt)), 6)
                     AS perm_entropy
            FROM g JOIN tt USING (user_id) GROUP BY 1
        """,
        "events_ar2": """
            WITH m AS (
              SELECT user_id, avg(value) AS mean FROM events GROUP BY 1
            ), l AS (
              SELECT e.user_id, e.value - m.mean AS d,
                     lag(e.value - m.mean, 1) OVER w AS d1,
                     lag(e.value - m.mean, 2) OVER w AS d2
              FROM events e JOIN m USING (user_id)
              WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
            ), c AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     sum(d * d) AS s0, sum(d * d1) AS s1, sum(d * d2) AS s2
              FROM l GROUP BY 1)
            SELECT user_id, n_events,
                   round(CASE WHEN n_events >= 3
                              AND (s0 * s0 - s1 * s1) <> 0
                         THEN s1 * (s0 - s2) / (s0 * s0 - s1 * s1) END, 6)
                     AS phi1,
                   round(CASE WHEN n_events >= 3
                              AND (s0 * s0 - s1 * s1) <> 0
                         THEN (s2 * s0 - s1 * s1) / (s0 * s0 - s1 * s1)
                         END, 6) AS phi2
            FROM c
        """,
        "events_spectral_power": """
            WITH m AS (
              SELECT user_id, min(ts) AS t0, avg(value) AS mean,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1
            ), d AS (
              SELECT e.user_id, e.value - m.mean AS d,
                     date_diff('microsecond', m.t0, e.ts) / 1000000.0 AS t,
                     m.n
              FROM events e JOIN m USING (user_id)
            ), s AS (
              SELECT user_id, min(n) AS n,
                     sum(d * cos(2*pi() * (t / 86400.0)))  AS a1,
                     sum(d * sin(2*pi() * (t / 86400.0)))  AS b1,
                     sum(d * cos(2*pi() * (t / 604800.0))) AS a7,
                     sum(d * sin(2*pi() * (t / 604800.0))) AS b7
              FROM d GROUP BY 1)
            SELECT user_id, n AS n_events,
                   round((a1*a1 + b1*b1) / (n*n), 6) AS power_1d,
                   round((a7*a7 + b7*b7) / (n*n), 6) AS power_7d
            FROM s
        """,
        "events_column_profile": """
            SELECT 'event_type' AS col, count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0
                       END)::BIGINT AS n_nulls,
                   count(DISTINCT event_type)::BIGINT AS n_distinct,
                   NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
                   min(event_type) AS min_str, max(event_type) AS max_str
            FROM events
            UNION ALL
            SELECT 'user_id', count(*)::BIGINT,
                   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0
                       END)::BIGINT,
                   count(DISTINCT user_id)::BIGINT,
                   round(min(user_id)::DOUBLE, 6),
                   round(max(user_id)::DOUBLE, 6),
                   NULL::VARCHAR, NULL::VARCHAR
            FROM events
            UNION ALL
            SELECT 'value', count(*)::BIGINT,
                   sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
                   count(DISTINCT value)::BIGINT,
                   round(min(value), 6), round(max(value), 6),
                   NULL::VARCHAR, NULL::VARCHAR
            FROM events
            ORDER BY col
        """,
        "events_peak_rate_1h": """
            WITH c AS (
              SELECT user_id, ts,
                     count(*) OVER (PARTITION BY user_id ORDER BY ts
                                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS cnt
              FROM events
            ), s AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     min(struct_pack(nc := -cnt, ts := ts)) AS t
              FROM c GROUP BY 1)
            SELECT user_id, n_events,
                   (-(t.nc))::BIGINT AS peak_count, t.ts AS peak_at
            FROM s
        """,
        "events_decayed_type_counts": """
            WITH h AS (SELECT max(ts) AS t FROM events)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round(sum(pow(2.0,
                       -(date_diff('microsecond', e.ts, h.t)::DOUBLE
                         / 43200000000.0))), 6) AS decayed_count
            FROM events e, h GROUP BY 1
        """,
        "events_rollup_1h_delta": """
            WITH tier AS (
              SELECT user_id, date_trunc('hour', ts) AS window_start,
                     count(*)::BIGINT AS n_events
              FROM events GROUP BY 1, 2)
            SELECT user_id, window_start, n_events,
                   round(lag(n_events) OVER w::DOUBLE, 6) AS n_prev,
                   round((n_events - lag(n_events) OVER w)::DOUBLE, 6)
                     AS n_delta
            FROM tier
            WINDOW w AS (PARTITION BY user_id ORDER BY window_start)
        """,
        "events_active_users": """
            WITH pairs AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day
              FROM events
            ), d AS (
              SELECT day, count(*)::BIGINT AS dau FROM pairs GROUP BY 1
            )
            SELECT d.day, d.dau,
                   count(DISTINCT p.user_id)::BIGINT AS wau,
                   round(d.dau::DOUBLE / count(DISTINCT p.user_id), 6)
                     AS stickiness
            FROM d JOIN pairs p
              ON p.day <= d.day AND p.day > d.day - INTERVAL 7 DAY
            GROUP BY 1, 2 ORDER BY 1
        """,
        "events_new_returning": """
            WITH pairs AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day
              FROM events
            ), f AS (
              SELECT user_id, min(day) AS fday FROM pairs GROUP BY 1
            )
            SELECT p.day,
                   count(*) FILTER (WHERE p.day = f.fday)::BIGINT
                     AS new_users,
                   count(*) FILTER (WHERE p.day > f.fday)::BIGINT
                     AS returning_users
            FROM pairs p JOIN f USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "events_funnel_latency": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                   GROUP BY 1),
            lat AS (
              SELECT 'view' AS stage_from, 'click' AS stage_to,
                     date_diff('microsecond', s1.t, s2.t) AS lat_us
              FROM s2 JOIN s1 USING (user_id)
              UNION ALL
              SELECT 'click', 'purchase',
                     date_diff('microsecond', s2.t, s3.t)
              FROM s3 JOIN s2 USING (user_id)
            )
            SELECT stage_from, stage_to, count(*)::BIGINT AS n_converted,
                   round(avg(lat_us) / 1e6, 6) AS mean_s,
                   quantile_disc(lat_us, 0.5) AS q_50_us,
                   quantile_disc(lat_us, 0.9) AS q_90_us
            FROM lat GROUP BY 1, 2 ORDER BY 1
        """,
        "events_anova_f": """
            WITH g AS (
              SELECT event_type, count(*)::DOUBLE AS n,
                     sum(value) AS s, sum(value * value) AS ss
              FROM events GROUP BY 1
            ), t AS (
              SELECT sum(n) AS n, count(*)::DOUBLE AS k, sum(s) AS s,
                     sum(ss) AS ss, sum(s * s / n) AS sgs
              FROM g
            )
            SELECT n::BIGINT AS n_rows, k::BIGINT AS k_groups,
                   round(((sgs - s * s / n) / (k - 1))
                         / ((ss - sgs) / (n - k)), 6) AS f_stat,
                   round((sgs - s * s / n)
                         / ((sgs - s * s / n) + (ss - sgs)), 6) AS eta_sq
            FROM t
        """,
        "events_type_cond_entropy": """
            WITH o AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS nxt
              FROM events
            ), g AS (
              SELECT event_type AS role_from, nxt,
                     count(*)::BIGINT AS n
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
            ), t AS (
              SELECT role_from, n,
                     n::DOUBLE / sum(n) OVER (PARTITION BY role_from) AS p
              FROM g)
            SELECT role_from, sum(n)::BIGINT AS n_from,
                   round(sum(-p * log2(p)), 6) AS h_bits
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "events_session_conversion": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, event_type,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            ), g AS (
              SELECT user_id, sid,
                     max(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS conv
              FROM s GROUP BY 1, 2)
            SELECT count(*)::BIGINT AS n_sessions,
                   sum(conv)::BIGINT AS n_converted,
                   round(sum(conv)::DOUBLE / count(*), 6)
                     AS conversion_rate
            FROM g
        """,
        "events_weekly_profile": """
            SELECT isodow(ts)::BIGINT AS dow,
                   extract(hour FROM ts)::BIGINT AS hour,
                   count(*)::BIGINT AS n_events,
                   round(sum(value) / count(*), 6) AS value_mean
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_mase": """
            WITH o AS (
              SELECT user_id, value,
                     lag(value, 1) OVER w AS l1,
                     lag(value, 24) OVER w AS lm
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(avg(abs(value - lm)) / avg(abs(value - l1)), 6)
                     AS mase
            FROM o GROUP BY 1
        """,
        "events_priority_sample": """
            SELECT event_id, value,
                   md5(CAST(event_id AS VARCHAR)) AS priority
            FROM events
            ORDER BY priority LIMIT 100
        """,
        "events_k_anonymity": """
            WITH g AS (
              SELECT event_type,
                     (epoch_us(ts) // 86400000000)::BIGINT AS day,
                     ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS hour,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2, 3
            )
            SELECT sum(n)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_classes,
                   (count(*) FILTER (WHERE n < 5))::BIGINT
                     AS n_risky_classes,
                   coalesce(sum(n) FILTER (WHERE n < 5), 0)::BIGINT
                     AS n_risky_rows,
                   min(n)::BIGINT AS min_class_size
            FROM g
        """,
        "events_auc_by_user": """
            WITH t AS (
              SELECT user_id, value AS s,
                     event_type = 'purchase' AS y
              FROM events
            ), x AS (
              SELECT user_id, s, y,
                     row_number() OVER (PARTITION BY user_id ORDER BY s)
                       AS rn
              FROM t
            ), m AS (
              SELECT user_id, s, avg(rn) AS mid,
                     sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
              FROM x GROUP BY 1, 2
            ), a AS (
              SELECT user_id, sum(mid * np) AS rsp FROM m GROUP BY 1
            ), c AS (
              SELECT user_id,
                     count(*) FILTER (WHERE y) + 0.0 AS npos,
                     count(*) FILTER (WHERE NOT y) + 0.0 AS nneg
              FROM t GROUP BY 1
            )
            SELECT c.user_id, c.npos::BIGINT AS n_pos,
                   c.nneg::BIGINT AS n_neg,
                   round((a.rsp - c.npos * (c.npos + 1) / 2)
                         / (c.npos * c.nneg), 6) AS auc
            FROM c JOIN a USING (user_id)
        """,
        "events_poincare": """
            WITH o AS (
              SELECT user_id, ts,
                     lag(ts) OVER w AS p1, lag(ts, 2) OVER w AS p2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), x AS (
              SELECT user_id,
                     date_diff('microsecond', p1, ts) / 1e6 AS iv
              FROM o WHERE p1 IS NOT NULL
            ), d AS (
              SELECT user_id,
                     date_diff('microsecond', p1, ts) / 1e6
                     - date_diff('microsecond', p2, p1) / 1e6 AS dd
              FROM o WHERE p2 IS NOT NULL
            ), mx AS (
              SELECT user_id, count(*)::BIGINT AS n,
                     sum(iv) AS s1, sum(iv * iv) AS s2
              FROM x GROUP BY 1
            ), md AS (
              SELECT user_id, count(*) AS m,
                     sum(dd) AS t1, sum(dd * dd) AS t2
              FROM d GROUP BY 1
            )
            SELECT mx.user_id, mx.n AS n_intervals,
                   round(sqrt((t2 / m - (t1 / m) * (t1 / m)) / 2), 6)
                     AS sd1_s,
                   -- greatest() IGNORES NULLs (greatest(NULL,0)=0), so
                   -- single-interval keys need the explicit NULL branch
                   CASE WHEN t2 IS NULL THEN NULL
                        ELSE round(sqrt(greatest(
                          2 * (s2 / n - (s1 / n) * (s1 / n))
                          - (t2 / m - (t1 / m) * (t1 / m)) / 2, 0)), 6)
                   END AS sd2_s
            FROM mx LEFT JOIN md USING (user_id)
        """,
        "events_hrv": """
            WITH o AS (
              SELECT user_id, ts,
                     lag(ts) OVER w AS p1, lag(ts, 2) OVER w AS p2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), d AS (
              SELECT user_id,
                     date_diff('microsecond', p1, ts)
                     - date_diff('microsecond', p2, p1) AS dus
              FROM o WHERE p2 IS NOT NULL
            )
            SELECT user_id, count(*)::BIGINT AS n_diffs,
                   round(sqrt(sum((dus / 1e6) * (dus / 1e6))
                              / count(*)), 6) AS rmssd_s,
                   round((count(*) FILTER (WHERE abs(dus) > 60000000))
                         / (count(*) + 0.0), 6) AS pnn_share
            FROM d GROUP BY 1
        """,
        "events_value_ecdf": """
            SELECT event_type, CAST(t AS DOUBLE) AS threshold,
                   count(*)::BIGINT AS n_rows,
                   (count(*) FILTER (WHERE value <= t))::BIGINT AS n_le,
                   round((count(*) FILTER (WHERE value <= t))::DOUBLE
                         / count(*), 6) AS ecdf
            FROM events
            CROSS JOIN (VALUES (1.0), (5.0), (20.0), (50.0), (100.0),
                               (250.0)) ts(t)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_hill_tail": """
            WITH h AS (
              SELECT event_type, value AS v, count(*)::BIGINT AS c
              FROM events WHERE value > 0 GROUP BY 1, 2
            ), w AS (
              SELECT event_type, v, c,
                     sum(c) OVER (PARTITION BY event_type
                                  ORDER BY v DESC) AS cum
              FROM h
            )
            SELECT event_type, sum(c)::BIGINT AS n_pos,
                   round(max(v) FILTER (WHERE cum >= 101), 6) AS x_k1,
                   round((sum(ln(v) * least(c, 100 - (cum - c)))
                            FILTER (WHERE cum - c < 100)) / 100.0
                         - ln(max(v) FILTER (WHERE cum >= 101)), 6)
                     AS hill
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "events_cuped": """
            WITH mm AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts)))
                               // 2 AS mid FROM events),
            u AS (
              SELECT user_id,
                     (count(*) FILTER (WHERE epoch_us(ts) < mid))
                       ::BIGINT AS x,
                     (count(*) FILTER (WHERE epoch_us(ts) >= mid))
                       ::BIGINT AS y,
                     substring(md5(user_id::VARCHAR), 1, 4) < '8000'
                       AS grp_b
              FROM events, mm GROUP BY user_id
            ), m AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
                     sum(x * x)::DOUBLE AS sxx,
                     sum(x * y)::DOUBLE AS sxy,
                     sum(y * y)::DOUBLE AS syy,
                     (count(*) FILTER (WHERE NOT grp_b))::BIGINT AS n_a,
                     (count(*) FILTER (WHERE grp_b))::BIGINT AS n_b,
                     (sum(x) FILTER (WHERE NOT grp_b))::DOUBLE AS sxa,
                     (sum(y) FILTER (WHERE NOT grp_b))::DOUBLE AS sya,
                     (sum(x) FILTER (WHERE grp_b))::DOUBLE AS sxb,
                     (sum(y) FILTER (WHERE grp_b))::DOUBLE AS syb
              FROM u
            ), f AS (
              SELECT n_a, n_b,
                     (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
                     sya / n_a - syb / n_b AS diff_raw,
                     sxa / n_a - sxb / n_b AS xdiff,
                     syy - sy * sy / n AS cyy,
                     sxy - sx * sy / n AS cxy,
                     sxx - sx * sx / n AS cxx
              FROM m
            )
            SELECT n_a, n_b, round(theta, 6) AS theta,
                   round(diff_raw, 6) AS diff_raw,
                   round(diff_raw - theta * xdiff, 6) AS diff_adj,
                   round((cyy - cxy * cxy / cxx) / cyy, 6)
                     AS var_reduction
            FROM f
        """,
        "events_type_value_mi": """
            WITH c AS (
              SELECT event_type AS a,
                     CAST(least(floor(value / 50), 6) AS BIGINT) AS b,
                     count(*)::BIGINT AS o
              FROM events GROUP BY 1, 2
            ), ma AS (SELECT a, sum(o)::DOUBLE AS ra FROM c GROUP BY 1),
            mb AS (SELECT b, sum(o)::DOUBLE AS cb FROM c GROUP BY 1),
            nn AS (SELECT sum(o)::DOUBLE AS n FROM c),
            mi AS (
              SELECT sum((o::DOUBLE / n)
                         * ln(o::DOUBLE * n / (ra * cb))) AS mi
              FROM c JOIN ma USING (a) JOIN mb USING (b), nn
            ), ents AS (
              SELECT (SELECT -sum((ra / n) * ln(ra / n))
                      FROM ma, nn) AS h_a,
                     (SELECT -sum((cb / n) * ln(cb / n))
                      FROM mb, nn) AS h_b
            )
            SELECT (SELECT n FROM nn)::BIGINT AS n,
                   round(mi, 6) AS mi,
                   round(mi / sqrt(h_a * h_b), 6) AS nmi
            FROM mi, ents
        """,
        "events_cum_hazard": """
            WITH u AS (
              SELECT user_id,
                     (epoch_us(coalesce(
                         min(ts) FILTER (WHERE event_type = 'purchase'),
                         max(ts)))
                      - epoch_us(min(ts))) // 3600000000 AS dur,
                     (min(ts) FILTER (WHERE event_type = 'purchase'))
                       IS NOT NULL AS obs
              FROM events GROUP BY 1
            ), h AS (
              SELECT dur, (count(*) FILTER (WHERE obs))::BIGINT AS d,
                     count(*)::BIGINT AS tot
              FROM u GROUP BY 1
            ), w AS (
              SELECT dur, d,
                     sum(tot) OVER (ORDER BY dur DESC) AS n_risk
              FROM h
            ), s AS (
              SELECT dur, d, n_risk,
                     sum(d::DOUBLE / n_risk) OVER (ORDER BY dur) AS hz
              FROM w
            )
            SELECT dur AS bucket, n_risk::BIGINT AS n_risk,
                   d AS n_events, round(hz, 6) AS hazard
            FROM s WHERE d > 0 ORDER BY bucket
        """,
        "events_logrank": """
            WITH u AS (
              SELECT user_id,
                     (epoch_us(coalesce(
                         min(ts) FILTER (WHERE event_type = 'purchase'),
                         max(ts)))
                      - epoch_us(min(ts))) // 3600000000 AS dur,
                     (min(ts) FILTER (WHERE event_type = 'purchase'))
                       IS NOT NULL AS obs,
                     substring(md5(user_id::VARCHAR), 1, 4) < '8000'
                       AS grp
              FROM events GROUP BY 1
            ), h AS (
              SELECT dur,
                     (count(*) FILTER (WHERE obs AND grp))::BIGINT AS d1,
                     (count(*) FILTER (WHERE obs))::BIGINT AS d,
                     (count(*) FILTER (WHERE grp))::BIGINT AS tot1,
                     count(*)::BIGINT AS tot
              FROM u GROUP BY 1
            ), w AS (
              SELECT dur, d1, d,
                     sum(tot) OVER (ORDER BY dur DESC) AS n,
                     sum(tot1) OVER (ORDER BY dur DESC) AS n1
              FROM h
            ), e AS (
              SELECT d1, d,
                     d::DOUBLE * n1 / n AS e1,
                     CASE WHEN n > 1 THEN
                       d::DOUBLE * (n1::DOUBLE / n)
                         * (1.0 - n1::DOUBLE / n)
                         * (n - d) / (n - 1.0)
                     ELSE 0.0 END AS v
              FROM w WHERE d > 0
            )
            SELECT count(*)::BIGINT AS n_buckets,
                   sum(d1)::BIGINT AS d1,
                   round(sum(e1), 6) AS e1,
                   round(sum(v), 6) AS var,
                   round((sum(d1) - sum(e1)) / sqrt(sum(v)), 6) AS z
            FROM e
        """,
        "events_ab_ztest": """
            WITH u AS (
              SELECT user_id,
                     substring(md5(user_id::VARCHAR), 1, 4) < '8000'
                       AS grp_b,
                     bool_or(event_type = 'purchase') AS conv
              FROM events GROUP BY 1
            ), c AS (
              SELECT (count(*) FILTER (WHERE NOT grp_b))::BIGINT AS n_a,
                     (count(*) FILTER (WHERE grp_b))::BIGINT AS n_b,
                     (count(*) FILTER (WHERE NOT grp_b AND conv))::BIGINT
                       AS conv_a,
                     (count(*) FILTER (WHERE grp_b AND conv))::BIGINT
                       AS conv_b
              FROM u
            )
            SELECT n_a, n_b, conv_a, conv_b,
                   round(conv_a::DOUBLE / n_a, 6) AS rate_a,
                   round(conv_b::DOUBLE / n_b, 6) AS rate_b,
                   round((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                         / sqrt((conv_a + conv_b)::DOUBLE / (n_a + n_b)
                                * (1.0 - (conv_a + conv_b)::DOUBLE
                                         / (n_a + n_b))
                                * (1.0 / n_a + 1.0 / n_b)), 6) AS z
            FROM c
        """,
        "events_survival_km": """
            WITH u AS (
              SELECT user_id,
                     (epoch_us(coalesce(
                         min(ts) FILTER (WHERE event_type = 'purchase'),
                         max(ts)))
                      - epoch_us(min(ts))) // 3600000000 AS dur,
                     (min(ts) FILTER (WHERE event_type = 'purchase'))
                       IS NOT NULL AS obs
              FROM events GROUP BY 1
            ), h AS (
              SELECT dur, (count(*) FILTER (WHERE obs))::BIGINT AS d,
                     count(*)::BIGINT AS tot
              FROM u GROUP BY 1
            ), w AS (
              SELECT dur, d,
                     sum(tot) OVER (ORDER BY dur DESC) AS n_risk
              FROM h
            ), s AS (
              SELECT dur, d, n_risk,
                     product(1.0 - d::DOUBLE / n_risk)
                       OVER (ORDER BY dur) AS surv
              FROM w
            )
            SELECT dur AS bucket, n_risk::BIGINT AS n_risk,
                   d AS n_events, round(surv, 6) AS survival
            FROM s WHERE d > 0 ORDER BY bucket
        """,
        "events_hurst": """
            WITH o AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS c,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - 1 AS rn
              FROM events
            ), ch AS (
              SELECT user_id, rn // 32 AS chunk, rn % 32 AS i, c,
                     count(*) OVER (PARTITION BY user_id, rn // 32) AS m
              FROM o
            ), p AS (
              SELECT user_id, chunk, i,
                     sum(c) OVER (PARTITION BY user_id, chunk
                                  ORDER BY i)::DOUBLE AS pref,
                     sum(c) OVER (PARTITION BY user_id, chunk)::DOUBLE AS s,
                     sum(c * c) OVER (PARTITION BY user_id, chunk)::DOUBLE
                       AS sxx
              FROM ch WHERE m = 32
            ), d AS (
              SELECT user_id, chunk,
                     max(pref - (i + 1) * (s / 32.0))
                       - min(pref - (i + 1) * (s / 32.0)) AS r,
                     sqrt((min(sxx) - min(s) * min(s) / 32.0) / 32.0) AS sd
              FROM p GROUP BY 1, 2
            )
            SELECT user_id, count(*)::BIGINT AS n_chunks,
                   (count(*) FILTER (WHERE sd > 0))::BIGINT AS n_valid,
                   round(avg(r / sd) FILTER (WHERE sd > 0), 6) AS mean_rs,
                   round(ln(avg(r / sd) FILTER (WHERE sd > 0)) / ln(32.0),
                         6) AS hurst
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "events_granger": """
            WITH g AS (
              SELECT date_trunc('hour', ts) AS w,
                     sum((event_type = 'click')::BIGINT) AS x_n,
                     sum((event_type = 'purchase')::BIGINT) AS y_n
              FROM events GROUP BY 1
            ), s AS (
              SELECT y_n AS y,
                     lag(y_n) OVER (ORDER BY w) AS y1,
                     lag(x_n) OVER (ORDER BY w) AS x1
              FROM g
            ), m AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(y)::DOUBLE AS sy, sum(y1)::DOUBLE AS sy1,
                     sum(x1)::DOUBLE AS sx1,
                     sum(y * y)::DOUBLE AS syy,
                     sum(y * y1)::DOUBLE AS syy1,
                     sum(y * x1)::DOUBLE AS syx1,
                     sum(y1 * y1)::DOUBLE AS sy1y1,
                     sum(x1 * x1)::DOUBLE AS sx1x1,
                     sum(y1 * x1)::DOUBLE AS sy1x1
              FROM s WHERE y1 IS NOT NULL
            ), c AS (
              SELECT n,
                     syy - sy * sy / n AS cyy,
                     syy1 - sy * sy1 / n AS cyy1,
                     syx1 - sy * sx1 / n AS cyx1,
                     sy1y1 - sy1 * sy1 / n AS cy1y1,
                     sx1x1 - sx1 * sx1 / n AS cx1x1,
                     sy1x1 - sy1 * sx1 / n AS cy1x1
              FROM m
            ), f AS (
              SELECT n, cyy, cyy1, cyx1,
                     cyy - cyy1 * cyy1 / cy1y1 AS rss_r,
                     cy1y1 * cx1x1 - cy1x1 * cy1x1 AS det,
                     (cyy1 * cx1x1 - cyx1 * cy1x1)
                       / (cy1y1 * cx1x1 - cy1x1 * cy1x1) AS b_self,
                     (cy1y1 * cyx1 - cy1x1 * cyy1)
                       / (cy1y1 * cx1x1 - cy1x1 * cy1x1) AS b_cross
              FROM c
            ), r AS (
              SELECT n, rss_r, b_self, b_cross, cyy,
                     cyy - b_self * cyy1 - b_cross * cyx1 AS rss_f
              FROM f
            )
            SELECT n::BIGINT AS n_pairs,
                   round(b_self, 6) AS b_self,
                   round(b_cross, 6) AS b_cross,
                   round((rss_r - rss_f) / cyy, 6) AS delta_r2,
                   round((rss_r - rss_f) * (n - 3.0) / rss_f, 6) AS f_stat
            FROM r
        """,
        "events_tail_value_share": """
            WITH h AS (SELECT quantile_disc(value, 0.99) AS thr
                       FROM events)
            SELECT event_type, count(value)::BIGINT AS n_rows,
                   (count(*) FILTER (WHERE value >= thr))::BIGINT
                     AS n_tail,
                   round((count(*) FILTER (WHERE value >= thr))::DOUBLE
                         / count(value), 6) AS row_share,
                   round((sum(CAST(round(value * 100) AS BIGINT))
                            FILTER (WHERE value >= thr))::DOUBLE
                         / sum(CAST(round(value * 100) AS BIGINT)), 6)
                     AS value_share,
                   round(min(thr), 6) AS threshold
            FROM events, h GROUP BY 1 ORDER BY 1
        """,
        "events_wilson_ci": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS window_start,
                     count(*)::BIGINT AS n_events,
                     (count(*) FILTER (WHERE event_type = 'error'))::BIGINT
                       AS n_success
              FROM events GROUP BY 1)
            SELECT window_start, n_events, n_success,
                   round(n_success::DOUBLE / n_events::DOUBLE, 6) AS rate,
                   round((n_success::DOUBLE / n_events::DOUBLE
                          + (1.959963984540054 * 1.959963984540054)
                            / (2.0 * n_events::DOUBLE))
                         / (1.0 + (1.959963984540054 * 1.959963984540054)
                                  / n_events::DOUBLE)
                         - 1.959963984540054
                           * sqrt(n_success::DOUBLE / n_events::DOUBLE
                                  * (1.0 - n_success::DOUBLE
                                           / n_events::DOUBLE)
                                  / n_events::DOUBLE
                                  + (1.959963984540054 * 1.959963984540054)
                                    / (4.0 * (n_events::DOUBLE
                                              * n_events::DOUBLE)))
                           / (1.0 + (1.959963984540054 * 1.959963984540054)
                                    / n_events::DOUBLE), 6) AS ci_lo,
                   round((n_success::DOUBLE / n_events::DOUBLE
                          + (1.959963984540054 * 1.959963984540054)
                            / (2.0 * n_events::DOUBLE))
                         / (1.0 + (1.959963984540054 * 1.959963984540054)
                                  / n_events::DOUBLE)
                         + 1.959963984540054
                           * sqrt(n_success::DOUBLE / n_events::DOUBLE
                                  * (1.0 - n_success::DOUBLE
                                           / n_events::DOUBLE)
                                  / n_events::DOUBLE
                                  + (1.959963984540054 * 1.959963984540054)
                                    / (4.0 * (n_events::DOUBLE
                                              * n_events::DOUBLE)))
                           / (1.0 + (1.959963984540054 * 1.959963984540054)
                                    / n_events::DOUBLE), 6) AS ci_hi
            FROM c ORDER BY window_start
        """,
        "events_lead_lag": """
            WITH c AS (
              SELECT date_trunc('hour', ts) AS w,
                     count(*) FILTER (WHERE event_type = 'click') AS a_n,
                     count(*) FILTER (WHERE event_type = 'purchase') AS b_n
              FROM events GROUP BY 1),
            span AS (SELECT min(w) AS w0, max(w) AS w1 FROM c),
            grid AS (SELECT unnest(generate_series(w0, w1, INTERVAL 1 HOUR))
                       AS w FROM span),
            g AS (SELECT epoch_us(grid.w) AS wus,
                         coalesce(c.a_n, 0)::BIGINT AS x,
                         coalesce(c.b_n, 0)::BIGINT AS y
                  FROM grid LEFT JOIN c ON grid.w = c.w),
            lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3])::BIGINT AS lag),
            p AS (SELECT l.lag, a.x AS x, b.y AS y
                  FROM lags l JOIN g a ON true
                  JOIN g b ON b.wus = a.wus + l.lag * 3600000000::BIGINT),
            s AS (SELECT lag, count(*)::BIGINT AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sxx, sum(y * y) AS syy
                  FROM p GROUP BY 1)
            SELECT lag, n AS n_windows,
                   round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / sqrt((n::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)
                                * (n::DOUBLE * syy::DOUBLE
                                   - sy::DOUBLE * sy::DOUBLE)), 6) AS r
            FROM s ORDER BY lag
        """,
        "events_target_encoding": """
            WITH s AS (
              SELECT event_type,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sum_c,
                     count(value)::BIGINT AS n_v
              FROM events WHERE event_type IS NOT NULL GROUP BY 1)
            SELECT e.event_id, e.event_type,
                   round(((s.sum_c - CAST(round(e.value * 100) AS BIGINT))
                            ::DOUBLE
                          / (s.n_v - 1)::DOUBLE) / 100.0, 6) AS loo_enc
            FROM events e JOIN s USING (event_type)
        """,
        "events_pareto": """
            WITH s AS (
              SELECT user_id,
                     sum(CAST(round(value * 100) AS BIGINT)) AS v
              FROM events GROUP BY 1),
            o AS (
              SELECT v,
                     sum(v) OVER (ORDER BY v DESC, user_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     row_number() OVER (ORDER BY v DESC, user_id ASC)
                       AS rn
              FROM s),
            t AS (SELECT count(*)::BIGINT AS n_keys, sum(v) AS tot FROM s),
            kk AS (
              SELECT least((SELECT count(*) FROM o, t
                            WHERE cum::DOUBLE < 0.8 * tot::DOUBLE) + 1,
                           (SELECT n_keys FROM t))::BIGINT AS k
              FROM t)
            SELECT t.n_keys, kk.k AS k_keys,
                   round((SELECT cum FROM o WHERE rn = kk.k)::DOUBLE
                         / t.tot::DOUBLE, 6) AS share_covered,
                   round(t.tot::DOUBLE / 100.0, 6) AS total_value
            FROM t, kk WHERE t.n_keys > 0
        """,
        "events_rate_limit": """
            WITH c AS (
              SELECT user_id, date_trunc('hour', ts) AS window_start,
                     count(*)::BIGINT AS n_events
              FROM events GROUP BY 1, 2)
            SELECT user_id, window_start, n_events,
                   (n_events - 2)::BIGINT AS n_dropped
            FROM c WHERE n_events > 2
            ORDER BY user_id, window_start
        """,
        "events_top_paths": """
            WITH o AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events),
            s AS (
              SELECT user_id, event_type, ts, event_id,
                     (sum(new_session) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     )::BIGINT AS sid
              FROM o),
            r AS (
              SELECT user_id, sid, event_type,
                     row_number() OVER (PARTITION BY user_id, sid
                                        ORDER BY ts, event_id) AS rn
              FROM s),
            p AS (
              SELECT string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 5 GROUP BY user_id, sid)
            SELECT path, count(*)::BIGINT AS n_sessions
            FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20
        """,
        "events_return_level": """
            WITH b AS (
              SELECT date_trunc('day', ts) AS w,
                     max(CAST(round(value * 100) AS BIGINT)) AS mx
              FROM events GROUP BY 1),
            s AS (SELECT count(*)::BIGINT AS n, sum(mx) AS sm,
                         sum(mx * mx) AS ss
                  FROM b),
            f AS (SELECT n, sm::DOUBLE / n::DOUBLE AS m,
                         (ss::DOUBLE - sm::DOUBLE * sm::DOUBLE / n::DOUBLE)
                           / (n::DOUBLE - 1.0) AS var
                  FROM s WHERE n > 0),
            g AS (SELECT n, m, CASE WHEN var >= 0 THEN sqrt(var) END AS sd
                  FROM f),
            h AS (SELECT n, m, sd,
                         sd * 2.449489742783178 / 3.141592653589793
                           AS scale
                  FROM g),
            i AS (SELECT n, m, sd, scale,
                         m - 0.5772156649015329 * scale AS loc
                  FROM h)
            SELECT n AS n_blocks,
                   round(m / 100.0, 6) AS mean_max,
                   round(sd / 100.0, 6) AS sd_max,
                   round(loc / 100.0, 6) AS gumbel_loc,
                   round(scale / 100.0, 6) AS gumbel_scale,
                   round((loc - scale * (-4.600149226776579)) / 100.0, 6)
                     AS return_level
            FROM i
        """,
        "events_page_hinkley": """
            WITH o AS (
              SELECT user_id, ts, event_id, value,
                     sum(value) OVER w / (row_number() OVER w)::DOUBLE AS mu
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            ), m AS (
              SELECT user_id, ts, event_id,
                     sum(value - mu - 0.05) OVER w AS mt
              FROM o
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            ), r AS (
              SELECT user_id, mt - min(mt) OVER w AS exc
              FROM m
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   round(max(exc), 6) AS ph_stat,
                   max(exc) > 5.0 AS drift
            FROM r GROUP BY 1
        """,
        "events_adf": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events
            ), u AS (
              SELECT user_id FROM s GROUP BY 1
            ), l AS (
              SELECT user_id, c,
                     lag(c) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS cz
              FROM s
            ), p AS (
              SELECT user_id, (c - cz) AS y, cz AS z
              FROM l WHERE cz IS NOT NULL
            ), m AS (
              SELECT user_id, count(*)::BIGINT AS n_pairs,
                     sum(y)::DOUBLE AS sy, sum(z)::DOUBLE AS sz,
                     sum(y*y)::DOUBLE AS syy, sum(z*z)::DOUBLE AS szz,
                     sum(z*y)::DOUBLE AS szy
              FROM p GROUP BY 1
            ), c1 AS (SELECT *, n_pairs::DOUBLE AS nf FROM m),
            c2 AS (SELECT *, nf * szz - sz * sz AS den FROM c1),
            c3 AS (SELECT *, (nf * szy - sz * sy) / den AS gamma FROM c2),
            c4 AS (SELECT *, (sy - gamma * sz) / nf AS alpha FROM c3),
            c5 AS (SELECT *, syy - alpha * sy - gamma * szy AS rss FROM c4),
            c6 AS (SELECT *, rss / (nf - 2.0) * nf / den AS var_g FROM c5)
            SELECT u.user_id,
                   coalesce(c6.n_pairs, 0)::BIGINT AS n_pairs,
                   round(CASE WHEN c6.n_pairs >= 3 THEN gamma END, 6)
                     AS gamma,
                   round(CASE WHEN c6.n_pairs >= 3 AND var_g > 0
                              THEN gamma / sqrt(var_g) END, 6) AS df_t
            FROM u LEFT JOIN c6 USING (user_id)
        """,
        "events_welch_ttest": """
            WITH s AS (
              SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
              FROM events WHERE event_type IN ('click', 'purchase')
            ), g AS (
              SELECT event_type, count(*)::BIGINT AS n,
                     sum(c)::DOUBLE AS s, sum(c*c)::DOUBLE AS ss
              FROM s GROUP BY 1
            ), a AS (SELECT * FROM g WHERE event_type = 'click'),
            b AS (SELECT * FROM g WHERE event_type = 'purchase'),
            c1 AS (
              SELECT coalesce(a.n, 0)::BIGINT AS n_a,
                     coalesce(b.n, 0)::BIGINT AS n_b,
                     coalesce(a.s, 0)::DOUBLE AS sa,
                     coalesce(a.ss, 0)::DOUBLE AS ssa,
                     coalesce(b.s, 0)::DOUBLE AS sb,
                     coalesce(b.ss, 0)::DOUBLE AS ssb
              FROM (SELECT 1) LEFT JOIN a ON true LEFT JOIN b ON true
            ), c2 AS (
              SELECT *, sa / n_a::DOUBLE AS ma, sb / n_b::DOUBLE AS mb,
                     (ssa - sa * sa / n_a::DOUBLE)
                       / (n_a::DOUBLE - 1.0) AS va,
                     (ssb - sb * sb / n_b::DOUBLE)
                       / (n_b::DOUBLE - 1.0) AS vb
              FROM c1
            ), c3 AS (
              SELECT *, va / n_a::DOUBLE AS ua, vb / n_b::DOUBLE AS ub
              FROM c2
            )
            SELECT n_a, n_b,
                   round(ma / 100.0, 6) AS mean_a,
                   round(mb / 100.0, 6) AS mean_b,
                   round((ma - mb) / 100.0, 6) AS mean_diff,
                   round(CASE WHEN ua + ub > 0
                              THEN (ma - mb) / sqrt(ua + ub) END, 6)
                     AS t_stat,
                   round((ua + ub) * (ua + ub) /
                         (ua * ua / (n_a::DOUBLE - 1.0)
                          + ub * ub / (n_b::DOUBLE - 1.0)), 6) AS dof
            FROM c3
        """,
        "events_tukey_hsd": """
            WITH s AS (
              SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
              FROM events
            ), g AS (
              SELECT event_type, count(*)::BIGINT AS n,
                     sum(c)::DOUBLE AS s, sum(c*c)::DOUBLE AS ss
              FROM s GROUP BY 1
            ), w AS (
              SELECT *, ss - s * s / n::DOUBLE AS within FROM g
            ), f AS (
              SELECT *,
                     sum(within) OVER (ORDER BY event_type
                                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(n) OVER () AS big_n, count(*) OVER () AS k,
                     row_number() OVER (ORDER BY event_type) AS rn
              FROM w
            ), mt AS (
              SELECT cum / (big_n - k)::DOUBLE AS msw
              FROM f WHERE rn = k AND k >= 2
            )
            SELECT a.event_type AS group_a, b.event_type AS group_b,
                   a.n AS n_a, b.n AS n_b,
                   round((a.s / a.n::DOUBLE - b.s / b.n::DOUBLE)
                         / 100.0, 6) AS mean_diff,
                   round(CASE WHEN msw > 0 THEN
                         abs((a.s / a.n::DOUBLE - b.s / b.n::DOUBLE)
                             / 100.0)
                         / (sqrt(msw / 2.0 * (1.0 / a.n::DOUBLE
                                              + 1.0 / b.n::DOUBLE))
                            / 100.0) END, 6) AS q_stat
            FROM g a JOIN g b ON a.event_type < b.event_type, mt
        """,
        "events_ndcg": """
            WITH o AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            ), c AS (
              SELECT user_id, event_type,
                     sum(CASE WHEN rn <= n // 2 THEN 1 ELSE 0 END)::BIGINT
                       AS tr,
                     sum(CASE WHEN rn > n // 2 THEN 1 ELSE 0 END)::BIGINT
                       AS te
              FROM o GROUP BY 1, 2
            ), dr AS (
              SELECT user_id, te,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY tr DESC, event_type) AS rk
              FROM c WHERE tr > 0
            ), d AS (
              SELECT user_id,
                     sum(te::DOUBLE / log2((rk + 1)::DOUBLE)) AS dcg
              FROM dr WHERE rk <= 5 GROUP BY 1
            ), ir AS (
              SELECT user_id, te,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY te DESC, event_type) AS rk
              FROM c WHERE te > 0
            ), i AS (
              SELECT user_id,
                     sum(te::DOUBLE / log2((rk + 1)::DOUBLE)) AS idcg
              FROM ir WHERE rk <= 5 GROUP BY 1
            ), u AS (
              SELECT user_id, (max(n) // 2)::BIGINT AS n_train,
                     (max(n) - max(n) // 2)::BIGINT AS n_test
              FROM o GROUP BY 1
            )
            SELECT u.user_id, u.n_train, u.n_test,
                   round(CASE WHEN u.n_train > 0
                              THEN d.dcg / i.idcg END, 6) AS ndcg
            FROM u LEFT JOIN d USING (user_id) LEFT JOIN i USING (user_id)
        """,
        "events_cointegration": """
            WITH g AS (
              SELECT date_trunc('hour', ts) AS w,
                     sum((event_type = 'click')::BIGINT) AS x_n,
                     sum((event_type = 'purchase')::BIGINT) AS y_n
              FROM events GROUP BY 1
            ), m AS (
              SELECT count(*)::BIGINT AS nw, count(*)::DOUBLE AS n,
                     sum(x_n)::DOUBLE AS sx, sum(y_n)::DOUBLE AS sy,
                     sum(x_n * x_n)::DOUBLE AS sxx,
                     sum(x_n * y_n)::DOUBLE AS sxy
              FROM g
            ), ab AS (
              SELECT nw, n,
                     (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
                     (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n AS alpha
              FROM m
            ), e AS (
              SELECT ab.beta, ab.alpha,
                     y_n::DOUBLE - ab.alpha - ab.beta * x_n::DOUBLE AS ev,
                     lag(y_n::DOUBLE - ab.alpha - ab.beta * x_n::DOUBLE)
                       OVER (ORDER BY w) AS e1
              FROM g, ab
            ), s AS (
              SELECT sum(e1 * (ev - e1)) AS szd,
                     sum(e1 * e1) AS szz,
                     sum((ev - e1) * (ev - e1)) AS sdd,
                     count(*)::DOUBLE AS m2
              FROM e WHERE e1 IS NOT NULL
            ), f AS (
              SELECT szd / szz AS rho,
                     ((sdd - (szd / szz) * szd) / (m2 - 1.0)) / szz
                       AS var_rho
              FROM s
            )
            SELECT ab.nw AS n_windows,
                   round(CASE WHEN ab.nw >= 3 THEN ab.beta END, 6) AS beta,
                   round(CASE WHEN ab.nw >= 3 THEN ab.alpha END, 6)
                     AS alpha,
                   round(CASE WHEN ab.nw >= 3 THEN f.rho END, 6) AS rho,
                   round(CASE WHEN ab.nw >= 3 AND f.var_rho > 0
                         THEN f.rho / sqrt(f.var_rho) END, 6) AS df_t
            FROM ab, f
        """,
        "events_croston": """
            WITH g AS (
              SELECT user_id, date_trunc('day', ts) AS w,
                     count(*)::BIGINT AS d
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ), o AS (
              SELECT user_id, d,
                     epoch_us(w) // 86400000000 AS widx,
                     lag(epoch_us(w) // 86400000000)
                       OVER (PARTITION BY user_id ORDER BY w) AS pidx,
                     row_number() OVER (PARTITION BY user_id ORDER BY w)
                       AS rn
              FROM g
            ), q AS (
              SELECT user_id, rn, d::DOUBLE AS df,
                     CASE WHEN pidx IS NULL THEN 1.0
                          ELSE (widx - pidx)::DOUBLE END AS qf
              FROM o
            ), l AS (
              SELECT user_id, count(*)::BIGINT AS n_demand_periods,
                     list_reduce(list(df ORDER BY rn), (acc, x) ->
                       CASE WHEN acc = x THEN acc
                            ELSE ((1.0 - 0.3) * acc + 0.3 * x)
                                 / ((1.0 - 0.3) + 0.3) END) AS z,
                     list_reduce(list(qf ORDER BY rn), (acc, x) ->
                       CASE WHEN acc = x THEN acc
                            ELSE ((1.0 - 0.3) * acc + 0.3 * x)
                                 / ((1.0 - 0.3) + 0.3) END) AS p
              FROM q GROUP BY 1
            )
            SELECT user_id, n_demand_periods,
                   round(z, 6) AS z_hat, round(p, 6) AS p_hat,
                   round(z / p, 6) AS forecast_per_period
            FROM l
        """,
        "events_grubbs": """
            WITH m AS (
              SELECT event_type, count(*)::BIGINT AS n,
                     sum(CAST(round(value * 100.0) AS BIGINT)) AS s,
                     sum(CAST(round(value * 100.0) AS BIGINT)
                         * CAST(round(value * 100.0) AS BIGINT)) AS ss,
                     min(CAST(round(value * 100.0) AS BIGINT)) AS mn,
                     max(CAST(round(value * 100.0) AS BIGINT)) AS mx
              FROM events GROUP BY 1
            ), f AS (
              SELECT event_type, n,
                     s::DOUBLE / n::DOUBLE AS mu,
                     sqrt(CASE WHEN n >= 2 THEN
                          (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                          / (n::DOUBLE - 1.0) END) AS sd,
                     mn::DOUBLE AS mnd, mx::DOUBLE AS mxd
              FROM m
            )
            SELECT event_type, n AS n_rows,
                   round(mu / 100.0, 6) AS mean,
                   round(sd / 100.0, 6) AS sd,
                   round((CASE WHEN mxd - mu >= mu - mnd THEN mxd - mu
                               ELSE mu - mnd END) / sd, 6) AS g_stat,
                   round((CASE WHEN mxd - mu >= mu - mnd THEN mxd
                               ELSE mnd END) / 100.0, 6) AS outlier_value
            FROM f ORDER BY event_type
        """,
        "events_availability": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     epoch_us(date_trunc('hour', ts)) // 3600000000 AS w
              FROM events
            ), o AS (
              SELECT user_id, w,
                     lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw
              FROM d
            )
            SELECT user_id, count(*)::BIGINT AS n_active,
                   (max(w) - min(w) + 1)::BIGINT AS span,
                   round(count(*)::DOUBLE
                         / (max(w) - min(w) + 1)::DOUBLE, 6)
                     AS availability,
                   coalesce(max(w - pw - 1), 0)::BIGINT AS longest_gap
            FROM o GROUP BY 1
        """,
        "events_rolling_corr": """
            WITH g AS (
              SELECT date_trunc('hour', ts) AS w,
                     sum((event_type = 'click')::BIGINT) AS a,
                     sum((event_type = 'purchase')::BIGINT) AS b
              FROM events GROUP BY 1
            ), bounds AS (SELECT min(w) AS lo, max(w) AS hi FROM g),
            grid AS (
              SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS w
              FROM bounds
            ), d AS (
              SELECT grid.w, coalesce(g.a, 0)::BIGINT AS a,
                     coalesce(g.b, 0)::BIGINT AS b
              FROM grid LEFT JOIN g USING (w)
            ), r AS (
              SELECT w, count(*) OVER win AS m,
                     sum(a) OVER win AS sa, sum(b) OVER win AS sb,
                     sum(a * b) OVER win AS sab,
                     sum(a * a) OVER win AS saa,
                     sum(b * b) OVER win AS sbb
              FROM d WINDOW win AS (ORDER BY w
                                    ROWS BETWEEN 23 PRECEDING
                                             AND CURRENT ROW)
            )
            SELECT w AS window_start,
                   round((24 * sab - sa * sb)::DOUBLE
                         / (sqrt((24 * saa - sa * sa)::DOUBLE)
                            * sqrt((24 * sbb - sb * sb)::DOUBLE)), 6)
                     AS corr
            FROM r WHERE m = 24 ORDER BY 1
        """,
        "events_cohort_ltv": """
            WITH ud AS (
              SELECT user_id,
                     epoch_us(date_trunc('day', ts)) // 86400000000
                       AS d,
                     sum(CAST(round(value * 100.0) AS BIGINT)) AS cents
              FROM events GROUP BY 1, 2
            ), uc AS (
              SELECT user_id, min(d) AS cd FROM ud GROUP BY 1
            ), cs AS (
              SELECT cd, count(*)::BIGINT AS n_users FROM uc GROUP BY 1
            ), ca AS (
              SELECT uc.cd, ud.d - uc.cd AS age,
                     sum(ud.cents)::BIGINT AS cents
              FROM ud JOIN uc USING (user_id) GROUP BY 1, 2
            ), cum AS (
              SELECT cd, age,
                     sum(cents) OVER (PARTITION BY cd ORDER BY age)
                       AS cum_cents
              FROM ca
            )
            SELECT make_timestamp(cum.cd * 86400000000) AS cohort_day,
                   cum.age::BIGINT AS age_days, cs.n_users,
                   round(cum.cum_cents::DOUBLE / 100.0, 6) AS cum_value,
                   round(cum.cum_cents::DOUBLE / 100.0
                         / cs.n_users::DOUBLE, 6) AS cum_value_per_user
            FROM cum JOIN cs USING (cd) ORDER BY 1, 2
        """,
        "events_theta": """
            WITH g AS (
              SELECT user_id, date_trunc('day', ts) AS w,
                     count(*)::BIGINT AS d
              FROM events GROUP BY 1, 2
            ), o AS (
              SELECT user_id, d,
                     epoch_us(w) // 86400000000
                       - min(epoch_us(w) // 86400000000)
                           OVER (PARTITION BY user_id) AS ti,
                     row_number() OVER (PARTITION BY user_id ORDER BY w)
                       AS rn
              FROM g
            ), l AS (
              SELECT user_id, count(*)::BIGINT AS n_periods,
                     list_reduce(list(d::DOUBLE ORDER BY rn),
                       (acc, v) -> CASE WHEN acc = v THEN acc
                            ELSE ((1.0 - 0.3) * acc + 0.3 * v)
                                 / ((1.0 - 0.3) + 0.3) END) AS z,
                     sum(ti)::DOUBLE AS st,
                     sum(ti * ti)::DOUBLE AS stt,
                     sum(ti * d)::DOUBLE AS stx,
                     sum(d)::DOUBLE AS sx,
                     count(*)::DOUBLE AS nn
              FROM o GROUP BY 1
            )
            SELECT user_id, n_periods, round(z, 6) AS level,
                   round((nn * stx - st * sx)
                         / (nn * stt - st * st), 6) AS slope,
                   round(z + (nn * stx - st * sx)
                             / (nn * stt - st * st) / 2.0, 6)
                     AS theta_forecast
            FROM l
        """,
        "events_lorenz": """
            WITH c AS (
              SELECT user_id, count(*)::BIGINT AS n
              FROM events GROUP BY 1
            ), tot AS (SELECT count(*)::BIGINT AS nk,
                              sum(n)::DOUBLE AS te FROM c),
            r AS (
              SELECT n, row_number() OVER (ORDER BY n DESC, user_id)
                       AS rn
              FROM c
            ), d AS (
              SELECT ((rn - 1) * 10) // tot.nk + 1 AS decile, n
              FROM r, tot
            ), g AS (
              SELECT decile, count(*)::BIGINT AS n_users,
                     sum(n)::BIGINT AS n_events
              FROM d GROUP BY 1
            )
            SELECT decile::BIGINT AS decile, n_users, n_events,
                   round(n_events::DOUBLE / tot.te, 6) AS event_share,
                   round((sum(n_events) OVER (ORDER BY decile))::DOUBLE
                         / tot.te, 6) AS cum_share
            FROM g, tot ORDER BY 1
        """,
        "events_weekend_effect": """
            WITH s AS (
              SELECT CASE WHEN isodow(ts) >= 6 THEN 'weekend'
                          ELSE 'weekday' END AS grp,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events
            ), g AS (
              SELECT grp, count(*)::BIGINT AS n,
                     sum(c)::DOUBLE AS s, sum(c*c)::DOUBLE AS ss
              FROM s GROUP BY 1
            ), a AS (SELECT * FROM g WHERE grp = 'weekday'),
            b AS (SELECT * FROM g WHERE grp = 'weekend'),
            c1 AS (
              SELECT coalesce(a.n, 0)::BIGINT AS n_a,
                     coalesce(b.n, 0)::BIGINT AS n_b,
                     coalesce(a.s, 0)::DOUBLE AS sa,
                     coalesce(a.ss, 0)::DOUBLE AS ssa,
                     coalesce(b.s, 0)::DOUBLE AS sb,
                     coalesce(b.ss, 0)::DOUBLE AS ssb
              FROM (SELECT 1) LEFT JOIN a ON true LEFT JOIN b ON true
            ), c2 AS (
              SELECT *, sa / n_a::DOUBLE AS ma, sb / n_b::DOUBLE AS mb,
                     (ssa - sa * sa / n_a::DOUBLE)
                       / (n_a::DOUBLE - 1.0) AS va,
                     (ssb - sb * sb / n_b::DOUBLE)
                       / (n_b::DOUBLE - 1.0) AS vb
              FROM c1
            ), c3 AS (
              SELECT *, va / n_a::DOUBLE AS ua, vb / n_b::DOUBLE AS ub
              FROM c2
            )
            SELECT n_a, n_b,
                   round(ma / 100.0, 6) AS mean_a,
                   round(mb / 100.0, 6) AS mean_b,
                   round((ma - mb) / 100.0, 6) AS mean_diff,
                   round(CASE WHEN ua + ub > 0
                              THEN (ma - mb) / sqrt(ua + ub) END, 6)
                     AS t_stat,
                   round((ua + ub) * (ua + ub) /
                         (ua * ua / (n_a::DOUBLE - 1.0)
                          + ub * ub / (n_b::DOUBLE - 1.0)), 6) AS dof
            FROM c3
        """,
        "events_two_step_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                       AS nxt
              FROM events
            ), g AS (
              SELECT event_type AS role_from, nxt AS role_to,
                     count(*)::BIGINT AS n
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
            ), f AS (
              SELECT role_from, role_to,
                     n::DOUBLE / sum(n) OVER (PARTITION BY role_from)
                       AS p
              FROM g
            ), j AS (
              SELECT a.role_from, a.role_to AS mid, b.role_to,
                     a.p * b.p AS q
              FROM f a JOIN f b ON a.role_to = b.role_from
            )
            SELECT role_from, role_to,
                   round(list_reduce(list(q ORDER BY mid),
                                     (x, y) -> x + y), 6) AS p2
            FROM j GROUP BY 1, 2
        """,
        "events_interarrival_quantiles": """
            WITH o AS (
              SELECT event_type,
                     date_diff('microsecond',
                               lag(ts) OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id),
                               ts) AS gap
              FROM events
            )
            SELECT event_type, count(gap)::BIGINT AS n_gaps,
                   round(quantile_disc(gap, 0.5) / 1000000.0, 6)
                     AS p50_gap_s,
                   round(quantile_disc(gap, 0.9) / 1000000.0, 6)
                     AS p90_gap_s
            FROM o WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1
        """,
        "events_linear_attribution": """
            WITH p AS (
              SELECT user_id, ts AS pts, event_id AS pid
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT user_id, ts AS cts, event_id AS cid
              FROM events WHERE event_type = 'click'
            ), j AS (
              SELECT p.pid, c.cid, c.cts
              FROM p JOIN c ON p.user_id = c.user_id
                AND c.cts < p.pts
                AND c.cts >= p.pts - INTERVAL 24 HOUR
            ), k AS (
              SELECT pid, count(*)::BIGINT AS kk FROM j GROUP BY 1
            ), cr AS (
              SELECT j.pid, j.cid,
                     (extract(hour FROM j.cts))::BIGINT AS hour,
                     1.0 / k.kk::DOUBLE AS credit
              FROM j JOIN k USING (pid)
            )
            SELECT hour, count(*)::BIGINT AS n_credited_clicks,
                   round(list_reduce(list(credit ORDER BY pid, cid),
                                     (a, x) -> a + x), 6)
                     AS total_credit
            FROM cr GROUP BY 1 ORDER BY 1
        """,
        "events_weekly_acf": """
            WITH g AS (
              SELECT date_trunc('day', ts) AS w, count(*)::BIGINT AS c
              FROM events GROUP BY 1
            ), bounds AS (SELECT min(w) AS lo, max(w) AS hi FROM g),
            grid AS (
              SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                       AS w
              FROM bounds
            ), d AS (
              SELECT grid.w, coalesce(g.c, 0)::BIGINT AS c
              FROM grid LEFT JOIN g USING (w)
            ), l AS (
              SELECT c AS a, lead(c, 7) OVER (ORDER BY w) AS b FROM d
            ), p AS (SELECT a, b FROM l WHERE b IS NOT NULL),
            m AS (
              SELECT count(*)::BIGINT AS np, count(*)::DOUBLE AS n,
                     sum(a)::DOUBLE AS sa, sum(b)::DOUBLE AS sb,
                     sum(a * b)::DOUBLE AS sab,
                     sum(a * a)::DOUBLE AS saa,
                     sum(b * b)::DOUBLE AS sbb
              FROM p
            ), t AS (SELECT count(*)::BIGINT AS mm FROM d)
            SELECT t.mm AS n_periods, m.np AS n_pairs,
                   round(CASE WHEN m.np >= 2 THEN
                         (m.n * m.sab - m.sa * m.sb)
                         / (sqrt(m.n * m.saa - m.sa * m.sa)
                            * sqrt(m.n * m.sbb - m.sb * m.sb)) END, 6)
                     AS lag_corr
            FROM m, t
        """,
        "events_activity_streaks": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     epoch_us(date_trunc('day', ts)) // 86400000000
                       AS day
              FROM events
            ), i AS (
              SELECT user_id, day,
                     day - row_number() OVER (PARTITION BY user_id
                                              ORDER BY day) AS grp
              FROM d
            ), runs AS (
              SELECT user_id, grp, count(*)::BIGINT AS len,
                     max(day) AS last_day
              FROM i GROUP BY 1, 2
            )
            SELECT user_id, sum(len)::BIGINT AS n_active_days,
                   max(len)::BIGINT AS longest_streak,
                   (max(struct_pack(k := last_day, len := len)))
                     .len::BIGINT AS last_streak
            FROM runs GROUP BY 1 ORDER BY 1
        """,
        "events_value_deciles": """
            SELECT event_type,
                   round(quantile_disc(value, 0.1), 6) AS q_10,
                   round(quantile_disc(value, 0.2), 6) AS q_20,
                   round(quantile_disc(value, 0.3), 6) AS q_30,
                   round(quantile_disc(value, 0.4), 6) AS q_40,
                   round(quantile_disc(value, 0.5), 6) AS q_50,
                   round(quantile_disc(value, 0.6), 6) AS q_60,
                   round(quantile_disc(value, 0.7), 6) AS q_70,
                   round(quantile_disc(value, 0.8), 6) AS q_80,
                   round(quantile_disc(value, 0.9), 6) AS q_90
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "events_daily_health": """
            WITH d AS (
              SELECT date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS n,
                     sum((event_type = 'error')::BIGINT) AS e,
                     count(DISTINCT user_id)::BIGINT AS nu,
                     quantile_disc(value, 0.95) AS p95
              FROM events GROUP BY 1
            ), l AS (
              SELECT day, n, e, nu, p95,
                     lag(n, 7) OVER (ORDER BY day) AS n7
              FROM d
            )
            SELECT day, n AS n_events, e::BIGINT AS n_errors,
                   round(e::DOUBLE / n::DOUBLE, 6) AS error_rate,
                   round(p95, 6) AS p95_value,
                   nu AS n_users,
                   round((n::DOUBLE - n7::DOUBLE) / n7::DOUBLE, 6)
                     AS wow_events_delta
            FROM l ORDER BY 1
        """,
        "events_trend_census": """
            WITH s AS (
              SELECT user_id,
                     round(regr_slope(value,
                           epoch(ts - TIMESTAMP '2024-01-01')
                           / 86400.0), 6) AS sl
              FROM events GROUP BY 1
            )
            SELECT count(*)::BIGINT AS n_users,
                   (count(*) FILTER (WHERE sl > 0))::BIGINT AS n_up,
                   (count(*) FILTER (WHERE sl < 0))::BIGINT AS n_down,
                   (count(*) FILTER (WHERE sl = 0))::BIGINT AS n_flat,
                   (count(*) FILTER (WHERE sl IS NULL))::BIGINT
                     AS n_undefined
            FROM s
        """,
        "events_forecast_backtest": """
            WITH g AS (
              SELECT event_type, date_trunc('day', ts) AS w,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(w) AS lo, max(w) AS hi
              FROM g GROUP BY 1
            ), grid AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                       AS w
              FROM bounds
            ), d AS (
              SELECT grid.event_type, grid.w,
                     coalesce(g.c, 0)::BIGINT AS c
              FROM grid LEFT JOIN g USING (event_type, w)
            ), o AS (
              SELECT event_type, w, c,
                     lag(c) OVER pw AS prev,
                     list(c::DOUBLE) OVER (PARTITION BY event_type
                       ORDER BY w ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS hist
              FROM d
              WINDOW pw AS (PARTITION BY event_type ORDER BY w)
            ), e AS (
              SELECT event_type, w,
                     abs(c - prev)::BIGINT AS an,
                     abs(c::DOUBLE - list_reduce(hist, (acc, x) ->
                       CASE WHEN acc = x THEN acc
                            ELSE ((1.0 - 0.3) * acc + 0.3 * x)
                                 / ((1.0 - 0.3) + 0.3) END)) AS ae
              FROM o WHERE prev IS NOT NULL
            ), m AS (
              SELECT event_type, count(*)::BIGINT AS n_steps,
                     sum(an)::BIGINT AS sn,
                     list_reduce(list(ae ORDER BY w),
                                 (a, b) -> a + b) AS se
              FROM e GROUP BY 1
            )
            SELECT event_type, n_steps,
                   round(sn::DOUBLE / n_steps::DOUBLE, 6) AS mae_naive,
                   round(se / n_steps::DOUBLE, 6) AS mae_ewma,
                   round((se / n_steps::DOUBLE)
                         / (sn::DOUBLE / n_steps::DOUBLE), 6)
                     AS skill_ratio
            FROM m ORDER BY 1
        """,
        "events_type_persistence": """
            WITH o AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                       AS prev
              FROM events
            )
            SELECT user_id, count(prev)::BIGINT AS n_transitions,
                   (count(*) FILTER (WHERE event_type = prev))::BIGINT
                     AS n_repeats,
                   round((count(*) FILTER (WHERE event_type = prev))
                         ::DOUBLE / count(prev), 6) AS repeat_share
            FROM o WHERE prev IS NOT NULL GROUP BY 1 ORDER BY 1
        """,
        "events_type_mix_drift": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS p,
                     event_type AS cat, count(*)::BIGINT AS o
              FROM events GROUP BY 1, 2
            ), periods AS (SELECT DISTINCT p FROM c),
            cats AS (SELECT cat, sum(o)::BIGINT AS ct FROM c GROUP BY 1),
            rws AS (SELECT p, sum(o)::BIGINT AS rt FROM c GROUP BY 1),
            tot AS (SELECT sum(o)::DOUBLE AS nn,
                           count(DISTINCT p)::BIGINT AS npd,
                           count(DISTINCT cat)::BIGINT AS kk
                    FROM c),
            grid AS (
              SELECT periods.p, cats.cat, cats.ct, rws.rt,
                     coalesce(c.o, 0)::BIGINT AS o
              FROM periods CROSS JOIN cats
              JOIN rws ON rws.p = periods.p
              LEFT JOIN c ON c.p = periods.p AND c.cat = cats.cat
            ), terms AS (
              SELECT p, rt,
                     (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     / (rt::DOUBLE * ct::DOUBLE / tot.nn) AS term,
                     cat
              FROM grid, tot
            ), agg AS (
              SELECT p, min(rt) AS rt,
                     list_reduce(list(term ORDER BY cat),
                                 (a, x) -> a + x) AS chi2
              FROM terms GROUP BY 1
            )
            SELECT agg.p AS period_start, agg.rt AS n_rows,
                   tot.kk AS n_cats,
                   round(CASE WHEN tot.npd >= 2 AND tot.kk >= 2
                         THEN agg.chi2 END, 6) AS chi2
            FROM agg, tot ORDER BY 1
        """,
        "events_type_weekday_assoc": """
            WITH b AS (
              SELECT event_type AS a,
                     'd' || CAST(isodow(ts) AS VARCHAR) AS b
              FROM events
            ), o AS (
              SELECT a, b, count(*)::DOUBLE AS o FROM b GROUP BY 1, 2
            ), r AS (SELECT a, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT b, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.a = r.a AND oo.b = c.b
            ), chi AS (
              SELECT sum((obs - e) * (obs - e) / e) AS chi2 FROM cell
            ), ha AS (
              SELECT -sum((rs / t.n) * ln(rs / t.n)) AS h FROM r, t
            ), hb AS (
              SELECT -sum((cs / t.n) * ln(cs / t.n)) AS h FROM c, t
            ), hab AS (
              SELECT -sum((o.o / t.n) * ln(o.o / c.cs)) AS h
              FROM o JOIN c ON c.b = o.b, t
            ), hba AS (
              SELECT -sum((o.o / t.n) * ln(o.o / r.rs)) AS h
              FROM o JOIN r ON r.a = o.a, t
            )
            SELECT t.n::BIGINT AS n,
                   (SELECT count(*) FROM r)::BIGINT AS r_cats,
                   (SELECT count(*) FROM c)::BIGINT AS c_cats,
                   (((SELECT count(*) FROM r) - 1)
                    * ((SELECT count(*) FROM c) - 1))::BIGINT AS dof,
                   round(chi.chi2, 6) AS chi2,
                   round(CASE WHEN least((SELECT count(*) FROM r) - 1,
                                         (SELECT count(*) FROM c) - 1) > 0
                         THEN sqrt(chi.chi2 / (t.n *
                              least((SELECT count(*) FROM r) - 1,
                                    (SELECT count(*) FROM c) - 1)))
                         END, 6) AS cramers_v,
                   round((ha.h - hab.h) / ha.h, 6) AS theils_u_ab,
                   round((hb.h - hba.h) / hb.h, 6) AS theils_u_ba
            FROM t, chi, ha, hb, hab, hba
        """,
        "events_window_pairs": """
            WITH b AS (
              SELECT user_id,
                     CAST(round(value * 100) AS BIGINT) AS cv,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - 1 AS p,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            ), w AS (
              SELECT user_id, p, n,
                     list(cv) OVER (PARTITION BY user_id ORDER BY p
                                    ROWS BETWEEN 8 PRECEDING
                                             AND 1 PRECEDING) AS iw,
                     list(cv) OVER (PARTITION BY user_id ORDER BY p
                                    ROWS BETWEEN CURRENT ROW
                                             AND 3 FOLLOWING) AS lw
              FROM b
            )
            SELECT user_id, p AS anchor_idx,
                   array_to_string(iw, ',') AS input_win,
                   array_to_string(lw, ',') AS label_win
            FROM w
            WHERE p >= 8 AND p + 4 < n AND (p - 8) % 4 = 0
            ORDER BY user_id, anchor_idx
        """,
        "events_mann_kendall": """
            WITH e AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sv
              FROM events GROUP BY 1, 2
            ), p AS (
              SELECT a.user_id,
                     sum(CASE WHEN b.sv > a.sv THEN 1
                              WHEN b.sv < a.sv THEN -1
                              ELSE 0 END)::BIGINT AS s
              FROM e a JOIN e b ON a.user_id = b.user_id AND b.d > a.d
              GROUP BY 1
            ), n AS (
              SELECT user_id, count(*)::BIGINT AS n FROM e GROUP BY 1
              HAVING count(*) >= 3
            ), t AS (
              SELECT user_id,
                     sum(c * (c - 1) * (2 * c + 5))::BIGINT AS tie_term
              FROM (SELECT user_id, sv, count(*)::BIGINT AS c
                    FROM e GROUP BY 1, 2) GROUP BY 1
            )
            SELECT n.user_id, n.n AS n_obs, p.s AS s_stat,
                   round((n.n * (n.n - 1) * (2 * n.n + 5)
                          - t.tie_term)::DOUBLE / 18.0, 6) AS var_s,
                   round(CASE
                     WHEN p.s > 0 THEN (p.s - 1)::DOUBLE
                       / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                               - t.tie_term)::DOUBLE / 18.0)
                     WHEN p.s < 0 THEN (p.s + 1)::DOUBLE
                       / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                               - t.tie_term)::DOUBLE / 18.0)
                     ELSE 0.0 END, 6) AS z
            FROM n JOIN p USING (user_id) JOIN t USING (user_id)
            ORDER BY 1
        """,
        "events_friedman_types": """
            WITH e AS (
              SELECT (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     event_type AS ty,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sv
              FROM events GROUP BY 1, 2
            ), g AS (
              SELECT dd.d, tt.ty, coalesce(e.sv, 0)::BIGINT AS sv
              FROM (SELECT DISTINCT d FROM e) dd
              CROSS JOIN (SELECT DISTINCT ty FROM e) tt
              LEFT JOIN e ON e.d = dd.d AND e.ty = tt.ty
            ), r AS (
              SELECT d, ty, sv, avg(rn) OVER (PARTITION BY d, sv) AS rk
              FROM (SELECT d, ty, sv,
                           row_number() OVER (PARTITION BY d
                             ORDER BY sv, ty)::BIGINT AS rn
                    FROM g)
            ), s AS (
              SELECT count(DISTINCT d)::BIGINT AS b,
                     count(DISTINCT ty)::BIGINT AS k
              FROM g
            ), agg AS (
              SELECT (SELECT sum((rsum - b * (k + 1) / 2.0)
                                 * (rsum - b * (k + 1) / 2.0))
                      FROM (SELECT ty, sum(rk) AS rsum FROM r
                            GROUP BY 1), s) AS bb,
                     (SELECT sum(rk * rk) FROM r)
                       - (SELECT b * k * (k + 1) * (k + 1) / 4.0
                          FROM s) AS aa
            )
            SELECT s.b AS n_blocks, s.k AS k_treatments,
                   round((s.k - 1) * agg.bb / agg.aa, 6) AS chi2_f
            FROM s, agg
        """,
        "events_cliffs_delta": """
            WITH s AS (
              SELECT CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END AS g,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE event_type IN ('click', 'purchase')
            ), c AS (
              SELECT v,
                     sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS ca,
                     sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS cb
              FROM s GROUP BY 1
            ), w AS (
              SELECT v, ca, cb,
                     coalesce(sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)::BIGINT AS below_a
              FROM c
            ), t AS (
              SELECT (SELECT sum(ca) FROM c)::BIGINT AS na,
                     (SELECT sum(cb) FROM c)::BIGINT AS nb
            )
            SELECT t.na AS n_0, t.nb AS n_1,
                   sum(cb * below_a)::BIGINT AS conc,
                   sum(cb * (t.na - below_a - ca))::BIGINT AS disc,
                   round((sum(cb * below_a)
                          - sum(cb * (t.na - below_a - ca)))::DOUBLE
                         / (t.na * t.nb)::DOUBLE, 6) AS delta
            FROM w, t GROUP BY 1, 2 HAVING count(*) > 0
        """,
        "events_durbin_watson": """
            WITH e AS (
              SELECT user_id,
                     (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     sum(CAST(round(value * 100) AS BIGINT)) AS y
              FROM events GROUP BY 1, 2
            ), tt AS (
              SELECT user_id,
                     (d - min(d) OVER (PARTITION BY user_id))::BIGINT
                       AS t,
                     y
              FROM e
            ), lagd AS (
              SELECT user_id, t, y,
                     lag(t) OVER (PARTITION BY user_id ORDER BY t)
                       AS pt,
                     lag(y) OVER (PARTITION BY user_id ORDER BY t)
                       AS py
              FROM tt
            ), m AS (
              SELECT user_id,
                     count(*)::BIGINT AS n,
                     sum(t)::BIGINT AS st, sum(y)::BIGINT AS sy,
                     sum(t * t)::BIGINT AS stt,
                     sum(t * y)::BIGINT AS sty,
                     sum(y * y)::BIGINT AS syy,
                     coalesce(sum((y - py) * (y - py)) FILTER (
                       WHERE pt IS NOT NULL), 0)::BIGINT AS dyy,
                     coalesce(sum((y - py) * (t - pt)) FILTER (
                       WHERE pt IS NOT NULL), 0)::BIGINT AS dty,
                     coalesce(sum((t - pt) * (t - pt)) FILTER (
                       WHERE pt IS NOT NULL), 0)::BIGINT AS dtt
              FROM lagd GROUP BY 1 HAVING count(*) >= 3
            ), x AS (
              SELECT user_id, n, dyy, dty, dtt,
                     sty::DOUBLE - st::DOUBLE * sy::DOUBLE / n::DOUBLE
                       AS sty_c,
                     stt::DOUBLE - st::DOUBLE * st::DOUBLE / n::DOUBLE
                       AS stt_c,
                     syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE
                       AS syy_c
              FROM m
            ), bx AS (
              SELECT user_id, n, dyy, dty, dtt, sty_c, stt_c, syy_c,
                     sty_c / stt_c AS b
              FROM x
            )
            SELECT user_id, n AS n_obs, round(b, 6) AS slope,
                   round((dyy::DOUBLE - 2.0 * b * dty::DOUBLE
                          + b * b * dtt::DOUBLE)
                         / (syy_c - 2.0 * b * sty_c + b * b * stt_c),
                         6) AS dw
            FROM bx ORDER BY 1
        """,
        "events_yuen_t": """
            WITH s AS (
              SELECT CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END AS g,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE event_type IN ('click', 'purchase')
            ), c AS (
              SELECT g, v, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), w AS (
              SELECT g, v, o,
                     sum(o) OVER (PARTITION BY g ORDER BY v)::BIGINT
                       AS cum,
                     (sum(o) OVER (PARTITION BY g ORDER BY v)
                      - o)::BIGINT AS lo,
                     sum(o) OVER (PARTITION BY g)::BIGINT AS n
              FROM c
            ), k AS (
              SELECT *, (n // 5)::BIGINT AS kk FROM w
            ), a AS (
              SELECT g, max(n)::BIGINT AS n, max(kk)::BIGINT AS kk,
                     (max(n) - 2 * max(kk))::BIGINT AS h,
                     sum(v * greatest(least(cum, n - kk)
                                      - greatest(lo, kk), 0))::BIGINT
                       AS mid_sum,
                     sum(v * v * greatest(least(cum, n - kk)
                                          - greatest(lo, kk), 0))::BIGINT
                       AS mid_ss,
                     min(v) FILTER (WHERE cum > kk)::BIGINT AS v_low,
                     min(v) FILTER (WHERE cum >= n - kk)::BIGINT
                       AS v_high
              FROM k GROUP BY 1
              HAVING (max(n) - 2 * max(kk)) >= 2
            ), st AS (
              SELECT g, h,
                     mid_sum::DOUBLE / h::DOUBLE AS tmean,
                     ((mid_ss + kk * v_low * v_low
                       + kk * v_high * v_high)::DOUBLE
                      - (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        * (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        / n::DOUBLE)
                     / (n - 1)::DOUBLE
                     * (n - 1)::DOUBLE / (h * (h - 1))::DOUBLE AS d
              FROM a
            )
            SELECT a0.h AS h_0, a1.h AS h_1,
                   round(a0.tmean, 6) AS tmean_0,
                   round(a1.tmean, 6) AS tmean_1,
                   round((a1.tmean - a0.tmean)
                         / sqrt(a0.d + a1.d), 6) AS t_stat,
                   round((a0.d + a1.d) * (a0.d + a1.d)
                         / (a0.d * a0.d / (a0.h - 1)::DOUBLE
                            + a1.d * a1.d / (a1.h - 1)::DOUBLE), 6)
                     AS df
            FROM (SELECT * FROM st WHERE g = 0) a0,
                 (SELECT * FROM st WHERE g = 1) a1
        """,
        "events_seasonal_mk": """
            WITH e AS (
              SELECT (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sv
              FROM events GROUP BY 1
            ), sd AS (
              SELECT ((d + 3) % 7) + 1 AS season, d, sv FROM e
            ), p AS (
              SELECT a.season,
                     sum(CASE WHEN b.sv > a.sv THEN 1
                              WHEN b.sv < a.sv THEN -1
                              ELSE 0 END)::BIGINT AS s
              FROM sd a JOIN sd b
                ON a.season = b.season AND b.d > a.d
              GROUP BY 1
            ), n AS (
              SELECT season, count(*)::BIGINT AS n FROM sd GROUP BY 1
              HAVING count(*) >= 2
            ), t AS (
              SELECT season,
                     sum(c * (c - 1) * (2 * c + 5))::BIGINT AS tie
              FROM (SELECT season, sv, count(*)::BIGINT AS c
                    FROM sd GROUP BY 1, 2) GROUP BY 1
            ), per AS (
              SELECT n.season, n.n, coalesce(p.s, 0)::BIGINT AS s,
                     (n.n * (n.n - 1) * (2 * n.n + 5)
                      - t.tie)::BIGINT AS vn
              FROM n JOIN t USING (season)
              LEFT JOIN p USING (season)
            )
            SELECT count(*)::BIGINT AS n_seasons,
                   sum(n)::BIGINT AS n_obs,
                   sum(s)::BIGINT AS s_stat,
                   round(sum(vn)::DOUBLE / 18.0, 6) AS var_s,
                   round(CASE
                     WHEN sum(s) > 0 THEN (sum(s) - 1)::DOUBLE
                       / sqrt(sum(vn)::DOUBLE / 18.0)
                     WHEN sum(s) < 0 THEN (sum(s) + 1)::DOUBLE
                       / sqrt(sum(vn)::DOUBLE / 18.0)
                     ELSE 0.0 END, 6) AS z
            FROM per HAVING count(*) > 0
        """,
        "events_weekend_cliffs": """
            WITH e AS (
              SELECT (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sv
              FROM events GROUP BY 1
            ), s AS (
              SELECT CASE WHEN ((d + 3) % 7) + 1 >= 6
                          THEN 1 ELSE 0 END AS g,
                     sv AS v
              FROM e
            ), c AS (
              SELECT v,
                     sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS ca,
                     sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS cb
              FROM s GROUP BY 1
            ), w AS (
              SELECT v, ca, cb,
                     coalesce(sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)::BIGINT AS below_a
              FROM c
            ), t AS (
              SELECT (SELECT sum(ca) FROM c)::BIGINT AS na,
                     (SELECT sum(cb) FROM c)::BIGINT AS nb
            )
            SELECT t.na AS n_0, t.nb AS n_1,
                   sum(cb * below_a)::BIGINT AS conc,
                   sum(cb * (t.na - below_a - ca))::BIGINT AS disc,
                   round((sum(cb * below_a)
                          - sum(cb * (t.na - below_a - ca)))::DOUBLE
                         / (t.na * t.nb)::DOUBLE, 6) AS delta
            FROM w, t GROUP BY 1, 2 HAVING count(*) > 0
        """,
        "events_median_test": """
            WITH s AS (
              SELECT event_type AS ty,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ), med AS (
              SELECT quantile_disc(v, 0.5)::BIGINT AS m FROM s
            ), o AS (
              SELECT ty,
                     CASE WHEN v > (SELECT m FROM med)
                          THEN 1 ELSE 0 END AS above,
                     count(*)::DOUBLE AS o
              FROM s GROUP BY 1, 2
            ), r AS (SELECT ty, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT above, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.ty = r.ty AND oo.above = c.above)
            SELECT (SELECT n FROM t)::BIGINT AS n,
                   (SELECT count(*) FROM r)::BIGINT AS k_groups,
                   round((SELECT m FROM med)::DOUBLE / 100.0, 6)
                     AS pooled_median,
                   round(sum((obs - e) * (obs - e) / e), 6) AS chi2
            FROM cell
        """,
        "events_type_cliffs_matrix": """
            WITH e AS (
              SELECT event_type AS ty,
                     (epoch_us(ts) // 86400000000)::BIGINT AS d,
                     sum(CAST(round(value * 100) AS BIGINT)) AS sv
              FROM events GROUP BY 1, 2
            ), n AS (
              SELECT ty, count(*)::BIGINT AS n FROM e GROUP BY 1
            ), p AS (
              SELECT a.ty AS ty_a, b.ty AS ty_b,
                     sum(CASE WHEN b.sv > a.sv THEN 1
                              ELSE 0 END)::BIGINT AS conc,
                     sum(CASE WHEN b.sv < a.sv THEN 1
                              ELSE 0 END)::BIGINT AS disc
              FROM e a JOIN e b ON a.ty < b.ty
              GROUP BY 1, 2
            )
            SELECT p.ty_a, p.ty_b, na.n AS n_a, nb.n AS n_b,
                   round((p.conc - p.disc)::DOUBLE
                         / (na.n * nb.n)::DOUBLE, 6) AS delta
            FROM p JOIN n na ON na.ty = p.ty_a
            JOIN n nb ON nb.ty = p.ty_b
            ORDER BY 1, 2
        """,
    }


def _part_relational(*, tp, T, TOKLEN, _REL_EDGES, INTEGRITY_SQL, _pr_steps, _pr_joined, PAGERANK_SQL, rollup, gapfill, lang_cases, lang_max, lang_ties, lang_pick, **_):
    return {
        "lineitem_qty_xicor": """
            WITH b AS (
              SELECT l_returnflag AS g,
                     CAST(l_quantity AS BIGINT) AS y,
                     l_shipdate, l_orderkey, l_linenumber,
                     count(*) OVER (PARTITION BY l_returnflag) AS n,
                     count(*) OVER (PARTITION BY l_returnflag)
                       - rank() OVER (PARTITION BY l_returnflag
                                      ORDER BY CAST(l_quantity AS BIGINT)
                                      DESC) + 1 AS r,
                     count(*) OVER (PARTITION BY l_returnflag)
                       - rank() OVER (PARTITION BY l_returnflag
                                      ORDER BY CAST(l_quantity AS BIGINT)
                                      ASC) + 1 AS l
              FROM lineitem
            ), d AS (
              SELECT g, n, r, l,
                     lead(r) OVER (PARTITION BY g
                                   ORDER BY l_shipdate, l_orderkey,
                                            l_linenumber, y) AS r_next
              FROM b
            ), s AS (
              SELECT g, max(n) AS n,
                     sum(CASE WHEN r_next IS NULL THEN 0
                              ELSE abs(r_next - r) END)::BIGINT AS s1,
                     sum(l * (n - l))::BIGINT AS s2
              FROM d GROUP BY g HAVING max(n) >= 3
            )
            SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_obs,
                   round(1.0 - (n::DOUBLE * s1) / (2.0 * s2), 6) AS xi
            FROM s ORDER BY 1
        """,
        "customer_theil_balance": """
            WITH s AS (
              SELECT c_custkey,
                     CAST(round(c_acctbal * 100) AS BIGINT)::BIGINT AS v
              FROM customer
            ), g AS (
              SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS x FROM s
            )
            SELECT c_custkey, v AS value,
                   round(v::DOUBLE / x, 6) AS share,
                   round((v::DOUBLE / x) * ln((n::DOUBLE * v) / x), 6)
                     AS theil_term
            FROM s, g WHERE v > 0 ORDER BY c_custkey
        """,
        "supplier_theil_revenue": """
            WITH s AS (
              SELECT l_suppkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       ::BIGINT AS v
              FROM lineitem GROUP BY 1
            ), g AS (
              SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS x FROM s
            )
            SELECT l_suppkey, v AS value,
                   round(v::DOUBLE / x, 6) AS share,
                   round((v::DOUBLE / x) * ln((n::DOUBLE * v) / x), 6)
                     AS theil_term
            FROM s, g WHERE v > 0 ORDER BY l_suppkey
        """,
        "lineitem_pricing_summary": """
            -- money has ≤2 decimals: DECIMAL sums are exact, mirroring the
            -- engine's scaled-int64 combiner; avg written as sum::DOUBLE/n
            -- to match the engine's float64(exact_sum)/n bit-for-bit.
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity::DECIMAL(18,2))::DOUBLE, 6) AS sum_qty,
                   round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE, 6) AS sum_base_price,
                   round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE, 6) AS sum_disc_price,
                   round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)) * (1 + l_tax::DECIMAL(18,2)))::DOUBLE, 6) AS sum_charge,
                   count(*) AS count_order,
                   round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_qty,
                   round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_price,
                   round(sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_disc
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_lineitem_join": """
            SELECT o.o_orderstatus,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE, 6) AS revenue_sum,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE / count(*), 6) AS revenue_mean
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "customers_no_orders": """
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "revenue_by_nation": """
            WITH r AS (
              SELECT n.n_name,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                       AS revenue_i
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            )
            SELECT n_name, count(*)::BIGINT AS n_items,
                   round(sum(revenue_i) / 10000.0, 6) AS revenue_sum
            FROM r GROUP BY 1
        """,
        "tpch_q3_shipping": """
            WITH r AS (
              SELECT l.l_orderkey, o.o_orderdate,
                     sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                       / 10000.0 AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer cu ON o.o_custkey = cu.c_custkey
              WHERE cu.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-01-01'
                AND l.l_shipdate > TIMESTAMP '1998-01-01'
              GROUP BY 1, 2)
            SELECT l_orderkey, o_orderdate, round(revenue, 6) AS revenue
            FROM r ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
        """,
        "tpch_q4_priority_returns": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY 1
        """,
        "tpch_q10_returned_revenue": """
            WITH r AS (
              SELECT o.o_custkey,
                     sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                       / 10000.0 AS revenue
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1997-01-01'
                AND o.o_orderdate < TIMESTAMP '1997-07-01'
              GROUP BY 1)
            SELECT cu.c_custkey, cu.c_name, n.n_name,
                   round(cu.c_acctbal, 6) AS c_acctbal,
                   round(r.revenue, 6) AS revenue
            FROM r JOIN customer cu ON r.o_custkey = cu.c_custkey
            JOIN nation n ON cu.c_nationkey = n.n_nationkey
            ORDER BY r.revenue DESC, cu.c_custkey LIMIT 20
        """,
        "tpch_q14_promo_share": """
            WITH r AS (
              SELECT p.p_type,
                     CAST(round(l.l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS rev_i
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
                AND l.l_shipdate < TIMESTAMP '1997-04-01')
            SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN rev_i ELSE 0 END)
                         / 10000.0, 6) AS promo_revenue,
                   round(sum(rev_i) / 10000.0, 6) AS total_revenue,
                   round(100.0
                         * (sum(CASE WHEN p_type = 'PROMO' THEN rev_i ELSE 0 END)
                            / 10000.0)
                         / (sum(rev_i) / 10000.0), 6) AS promo_share
            FROM r
        """,
        "tpch_q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300.0)
            SELECT cu.c_custkey, cu.c_name, o.o_orderkey, o.o_orderdate,
                   round(o.o_totalprice, 6) AS o_totalprice,
                   round(b.sum_qty, 6) AS sum_qty
            FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
            JOIN customer cu ON o.o_custkey = cu.c_custkey
        """,
        "tpch_q12_priority_lines": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
            GROUP BY 1
        """,
        "tpch_q19_disjunctive_revenue": """
            WITH j AS (
              SELECT l_quantity, p_brand, p_size,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS revenue_i
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT count(*)::BIGINT AS n_lines,
                   round(sum(revenue_i)::DOUBLE / 10000.0, 6) AS revenue
            FROM j
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q7_nation_volume": """
            WITH r AS (
              SELECT l_orderkey, l_suppkey,
                     year(l_shipdate)::BIGINT AS l_year,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS revenue_i
              FROM lineitem
              WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1999-01-01')
            SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                   r.l_year,
                   round(sum(r.revenue_i)::DOUBLE / 10000.0, 6) AS revenue
            FROM r JOIN orders o ON r.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN supplier s ON r.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            GROUP BY 1, 2, 3
        """,
        "tpch_q6_forecast_revenue": """
            SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * CAST(round(l_discount*100) AS BIGINT))
                         / 10000.0, 6) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 - 1e-9 AND 0.07 + 1e-9
              AND l_quantity < 24
        """,
        "tpch_q8_market_share": """
            WITH j AS (
              SELECT year(o.o_orderdate)::BIGINT AS o_year,
                     CAST(round(l.l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                       AS rev_i,
                     sn.n_name AS supp_nation
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
                         AND p.p_type = 'PROMO'
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation cn ON c.c_nationkey = cn.n_nationkey
              JOIN region r ON cn.n_regionkey = r.r_regionkey
                           AND r.r_name = 'AMERICA'
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'BRAZIL'
                             THEN rev_i ELSE 0 END)::DOUBLE
                         / sum(rev_i)::DOUBLE, 6) AS mkt_share
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "tpch_q13_order_counts": """
            WITH pc AS (
              SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
              FROM customer c LEFT JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY 1)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q15_top_supplier": """
            WITH rv AS (
              SELECT l_suppkey,
                     sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT)))
                       AS rev_i
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY 1)
            SELECT s.s_suppkey, s.s_name,
                   round(rv.rev_i / 10000.0, 6) AS total_revenue
            FROM rv JOIN supplier s ON rv.l_suppkey = s.s_suppkey
            WHERE rv.rev_i = (SELECT max(rev_i) FROM rv)
            ORDER BY s.s_suppkey
        """,
        "tpch_q17_small_qty": """
            WITH li AS (
              SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
              FROM lineitem l JOIN part p
                ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'),
            st AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
                   FROM li GROUP BY 1)
            SELECT round(sum(CAST(round(li.l_extendedprice*100) AS BIGINT))
                         / 100.0 / 7.0, 6) AS avg_yearly
            FROM li JOIN st ON li.l_partkey = st.l_partkey
            WHERE li.l_quantity < 0.2 * st.avg_qty
        """,
        "tpch_q22_dormant_customers": """
            WITH cust AS (
              SELECT * FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
            a AS (
              SELECT (sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0)
                     / count(*) AS avg_bal
              FROM cust WHERE c_acctbal > 0.0)
            SELECT c_nationkey::BIGINT AS cntrycode,
                   count(*)::BIGINT AS numcust,
                   round(sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0,
                         6) AS totacctbal
            FROM cust, a
            WHERE c_acctbal > a.avg_bal
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = cust.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q5_local_suppliers": """
            WITH r AS (
              SELECT l_orderkey, l_suppkey,
                     CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))
                       AS revenue_i
              FROM lineitem)
            SELECT n_name,
                   round(sum(r.revenue_i)::DOUBLE / 10000.0, 6) AS revenue
            FROM r JOIN orders o ON r.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON r.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region rg ON n.n_regionkey = rg.r_regionkey
            WHERE rg.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
              AND o.o_orderdate >= '1997-01-01'
              AND o.o_orderdate < '1998-01-01'
            GROUP BY 1 ORDER BY revenue DESC, n_name
        """,
        "tpch_q9_product_profit": """
            WITH r AS (
              SELECT l_orderkey, l_suppkey,
                     CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))
                       AS revenue_i
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE '%red%')
            SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
                   round(sum(revenue_i)::DOUBLE / 10000.0, 6) AS profit
            FROM r JOIN orders o ON r.l_orderkey = o.o_orderkey
            JOIN supplier s ON r.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2 ORDER BY n_name, o_year DESC
        """,
        "tpch_q21_waiting_supplier": """
            WITH pairs AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS max_ship
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F' GROUP BY 1, 2
            ), ord AS (
              SELECT l_orderkey, count(*) AS n_supp, max(max_ship) AS omax
              FROM pairs GROUP BY 1
            ), blame AS (
              SELECT p.l_suppkey
              FROM pairs p JOIN ord o USING (l_orderkey)
              WHERE o.n_supp > 1 AND p.max_ship = o.omax
              QUALIFY count(*) OVER (PARTITION BY p.l_orderkey) = 1
            )
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM blame JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10
        """,
        "orders_fulfillment_latency": """
            WITH fs AS (
              SELECT l_orderkey, min(l_shipdate) AS first_ship
              FROM lineitem GROUP BY 1),
            d AS (
              SELECT o.o_orderpriority,
                     ((epoch_us(fs.first_ship) - epoch_us(o.o_orderdate))
                      // 86400000000)::BIGINT AS days
              FROM fs JOIN orders o ON fs.l_orderkey = o.o_orderkey)
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
                   quantile_disc(days, 0.5)::BIGINT AS p50_days,
                   quantile_disc(days, 0.9)::BIGINT AS p90_days,
                   max(days)::BIGINT AS max_days
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "customer_rfm": """
            WITH a AS (SELECT max(o_orderdate) AS anchor FROM orders)
            SELECT o_custkey AS c_custkey,
                   count(*)::BIGINT AS n_orders,
                   ((epoch_us(a.anchor) - epoch_us(max(o_orderdate)))
                    // 86400000000)::BIGINT AS recency_days,
                   round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         / 100.0, 6) AS monetary
            FROM orders, a
            GROUP BY o_custkey, a.anchor ORDER BY 1
        """,
        "lineitem_part_pairs": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            u AS (SELECT count(DISTINCT l_orderkey) AS ng FROM op),
            c AS (SELECT l_partkey, count(*)::BIGINT AS n FROM op GROUP BY 1),
            p AS (
              SELECT a.l_partkey AS member_a, b.l_partkey AS member_b,
                     count(*)::BIGINT AS n_both
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2)
            SELECT p.member_a, p.member_b, p.n_both,
                   round((p.n_both * u.ng)::DOUBLE / (ca.n * cb.n), 6)
                     AS lift,
                   round(p.n_both::DOUBLE / (ca.n + cb.n - p.n_both), 6)
                     AS jaccard
            FROM p, u
            JOIN c ca ON ca.l_partkey = p.member_a
            JOIN c cb ON cb.l_partkey = p.member_b
            WHERE p.n_both >= 2
            ORDER BY p.n_both DESC, p.member_a, p.member_b
        """,
        "tpch_integrity_audit": INTEGRITY_SQL,
        "orders_lineitem_join_salted": """
            SELECT o.o_orderstatus,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE, 6) AS revenue_sum,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE / count(*), 6) AS revenue_mean
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "parquet_layout_audit": """
            SELECT file_name, row_group_id::BIGINT AS row_group_id,
                   any_value(row_group_num_rows)::BIGINT AS n_rows,
                   any_value(row_group_num_columns)::BIGINT AS n_columns,
                   sum(total_compressed_size)::BIGINT AS compressed_bytes,
                   sum(total_uncompressed_size)::BIGINT
                     AS uncompressed_bytes
            FROM parquet_metadata(
              ['/root/testdata/sf0.01/events.parquet',
               '/root/testdata/sf0.01/lineitem.parquet',
               '/root/testdata/sf0.01/documents.parquet',
               '/root/testdata/sf0.01/embeddings.parquet'])
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "parquet_zonemap_audit": """
            SELECT file_name, row_group_id::BIGINT AS row_group_id,
                   replace(path_in_schema, ', ', '.')
                     AS column, num_values::BIGINT AS n_values,
                   coalesce(stats_null_count, 0)::BIGINT AS null_count,
                   (stats_min_value IS NOT NULL
                    AND stats_max_value IS NOT NULL) AS has_min_max
            FROM parquet_metadata(
              ['/root/testdata/sf0.01/events.parquet',
               '/root/testdata/sf0.01/lineitem.parquet',
               '/root/testdata/sf0.01/documents.parquet',
               '/root/testdata/sf0.01/embeddings.parquet'])
            ORDER BY 1, 2, 3
        """,
        "orders_lineitem_join_size": """
            SELECT (SELECT count(*) FROM orders)::BIGINT AS n_left,
                   (SELECT count(*) FROM lineitem)::BIGINT AS n_right,
                   (SELECT count(*) FROM orders o JOIN lineitem l
                      ON o.o_orderkey = l.l_orderkey)::BIGINT
                     AS n_join_rows,
                   (SELECT count(DISTINCT o.o_orderkey)
                      FROM orders o JOIN lineitem l
                      ON o.o_orderkey = l.l_orderkey)::BIGINT
                     AS n_matching_keys
        """,
        "lineitem_qty_price_ols": """
            SELECT l_returnflag, count(*)::BIGINT AS n_rows,
                   round(regr_slope(l_extendedprice, l_quantity), 6)
                     AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                     AS intercept,
                   round(corr(l_extendedprice, l_quantity), 6) AS corr_xy
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "revenue_share_hierarchy": """
            WITH o AS (
              SELECT r_name, n_name,
                     count(*)::BIGINT AS n_orders,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2)
            SELECT r_name, n_name, n_orders,
                   round(cents::DOUBLE / 100.0, 6) AS revenue,
                   round(cents::DOUBLE
                         / sum(cents) OVER (PARTITION BY r_name), 6)
                     AS share_of_region,
                   round(cents::DOUBLE / sum(cents) OVER (), 6)
                     AS share_of_global
            FROM o ORDER BY 1, 2
        """,
        "lineitem_brand_revenue": """
            SELECT p_brand, count(*)::BIGINT AS n_items,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100)
                                           AS BIGINT)))::DOUBLE
                         / 10000.0, 6) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q2_min_cost_supplier": """
            WITH pr AS (
              SELECT p_partkey FROM part
              WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
            sup AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            cost AS (
              SELECT l_partkey, l_suppkey,
                     min(l_extendedprice / l_quantity) AS unit_cost
              FROM lineitem
              JOIN pr ON l_partkey = p_partkey
              JOIN sup ON l_suppkey = s_suppkey
              GROUP BY 1, 2),
            best AS (
              SELECT l_partkey, min(unit_cost) AS best_cost
              FROM cost GROUP BY 1)
            SELECT round(s.s_acctbal, 6) AS s_acctbal, s.s_name, s.n_name,
                   c.l_partkey AS p_partkey,
                   round(c.unit_cost, 6) AS unit_cost
            FROM cost c
            JOIN best b ON c.l_partkey = b.l_partkey
                       AND c.unit_cost = b.best_cost
            JOIN sup s ON c.l_suppkey = s.s_suppkey
            ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p_partkey
            LIMIT 100
        """,
        "tpch_q11_important_parts": """
            WITH v AS (
              SELECT l_partkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_quantity) AS BIGINT)) AS value_i
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_7'
              GROUP BY 1)
            SELECT l_partkey AS p_partkey,
                   round(value_i / 100.0, 6) AS part_value
            FROM v
            WHERE value_i > (SELECT sum(value_i) FROM v)::DOUBLE * 0.001
            ORDER BY part_value DESC, p_partkey
        """,
        "tpch_q16_supplier_part_counts": """
            WITH bad AS (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
            pairs AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
              WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad))
            SELECT p_brand, p_type, p_size::BIGINT AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM pairs
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 16, 25, 36, 49)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20_window_demand": """
            WITH pr AS (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
            agg AS (
              SELECT l_suppkey,
                     sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                               AND l_shipdate < TIMESTAMP '1998-01-01'
                              THEN CAST(round(l_quantity) AS BIGINT)
                              ELSE 0 END) AS qty_win,
                     sum(CAST(round(l_quantity) AS BIGINT)) AS qty_all
              FROM lineitem JOIN pr ON l_partkey = p_partkey
              GROUP BY l_suppkey, l_partkey),
            hot AS (
              SELECT DISTINCT l_suppkey FROM agg
              WHERE qty_win * 2 > qty_all)
            SELECT s_name
            FROM hot
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            ORDER BY s_name
        """,
        "parts_family_clusters": """
            WITH RECURSIVE po AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
              SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
              FROM po a JOIN po b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 3
            ),
            e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ),
            reach(id, r) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            ),
            comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
            SELECT component, count(*)::BIGINT AS n_parts
            FROM comp GROUP BY 1
            ORDER BY n_parts DESC, component
        """,
        "orders_priority_drift": """
            WITH c AS (
              SELECT date_trunc('month', o_orderdate) AS p,
                     o_orderpriority AS cat, count(*)::BIGINT AS o
              FROM orders GROUP BY 1, 2
            ), periods AS (SELECT DISTINCT p FROM c),
            cats AS (SELECT cat, sum(o)::BIGINT AS ct FROM c GROUP BY 1),
            rws AS (SELECT p, sum(o)::BIGINT AS rt FROM c GROUP BY 1),
            tot AS (SELECT sum(o)::DOUBLE AS nn,
                           count(DISTINCT p)::BIGINT AS npd,
                           count(DISTINCT cat)::BIGINT AS kk
                    FROM c),
            grid AS (
              SELECT periods.p, cats.cat, cats.ct, rws.rt,
                     coalesce(c.o, 0)::BIGINT AS o
              FROM periods CROSS JOIN cats
              JOIN rws ON rws.p = periods.p
              LEFT JOIN c ON c.p = periods.p AND c.cat = cats.cat
            ), terms AS (
              SELECT p, rt,
                     (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     / (rt::DOUBLE * ct::DOUBLE / tot.nn) AS term,
                     cat
              FROM grid, tot
            ), agg AS (
              SELECT p, min(rt) AS rt,
                     list_reduce(list(term ORDER BY cat),
                                 (a, x) -> a + x) AS chi2
              FROM terms GROUP BY 1
            )
            SELECT agg.p AS period_start, agg.rt AS n_rows,
                   tot.kk AS n_cats,
                   round(CASE WHEN tot.npd >= 2 AND tot.kk >= 2
                         THEN agg.chi2 END, 6) AS chi2
            FROM agg, tot ORDER BY 1
        """,
        "lineitem_returnflag_drift": """
            WITH c AS (
              SELECT date_trunc('month', l_shipdate) AS p,
                     l_returnflag AS cat, count(*)::BIGINT AS o
              FROM lineitem GROUP BY 1, 2
            ), periods AS (SELECT DISTINCT p FROM c),
            cats AS (SELECT cat, sum(o)::BIGINT AS ct FROM c GROUP BY 1),
            rws AS (SELECT p, sum(o)::BIGINT AS rt FROM c GROUP BY 1),
            tot AS (SELECT sum(o)::DOUBLE AS nn,
                           count(DISTINCT p)::BIGINT AS npd,
                           count(DISTINCT cat)::BIGINT AS kk
                    FROM c),
            grid AS (
              SELECT periods.p, cats.cat, cats.ct, rws.rt,
                     coalesce(c.o, 0)::BIGINT AS o
              FROM periods CROSS JOIN cats
              JOIN rws ON rws.p = periods.p
              LEFT JOIN c ON c.p = periods.p AND c.cat = cats.cat
            ), terms AS (
              SELECT p, rt,
                     (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE / tot.nn)
                     / (rt::DOUBLE * ct::DOUBLE / tot.nn) AS term,
                     cat
              FROM grid, tot
            ), agg AS (
              SELECT p, min(rt) AS rt,
                     list_reduce(list(term ORDER BY cat),
                                 (a, x) -> a + x) AS chi2
              FROM terms GROUP BY 1
            )
            SELECT agg.p AS period_start, agg.rt AS n_rows,
                   tot.kk AS n_cats,
                   round(CASE WHEN tot.npd >= 2 AND tot.kk >= 2
                         THEN agg.chi2 END, 6) AS chi2
            FROM agg, tot ORDER BY 1
        """,
        "customers_rfm_segments": """
            WITH a AS (SELECT max(o_orderdate) AS anchor FROM orders),
            c AS (
              SELECT o_custkey AS k, count(*)::BIGINT AS nf,
                     ((epoch_us(a.anchor) - epoch_us(max(o_orderdate)))
                      // 86400000000)::BIGINT AS rec,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       ::BIGINT AS sc
              FROM orders, a GROUP BY o_custkey, a.anchor
            ), t AS (SELECT count(*)::BIGINT AS n FROM c),
            r AS (
              SELECT k, rec, nf, sc,
                     row_number() OVER (ORDER BY rec, k) AS rr,
                     row_number() OVER (ORDER BY nf DESC, k) AS rf,
                     row_number() OVER (ORDER BY sc DESC, k) AS rm
              FROM c
            ), q AS (
              SELECT rec, sc,
                     ((rr - 1) * 5) // t.n + 1 AS q_r,
                     ((rf - 1) * 5) // t.n + 1 AS q_f,
                     ((rm - 1) * 5) // t.n + 1 AS q_m
              FROM r, t
            )
            SELECT q_r::BIGINT AS q_r, q_f::BIGINT AS q_f,
                   q_m::BIGINT AS q_m,
                   count(*)::BIGINT AS n_customers,
                   round(sum(rec)::DOUBLE / count(*)::DOUBLE, 6)
                     AS avg_recency_days,
                   round(sum(sc)::DOUBLE / 100.0, 6) AS total_monetary
            FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "supplier_revenue_hhi": """
            WITH r AS (
              SELECT n.n_name, l.l_suppkey AS sk,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                       AS rev
              FROM lineitem l
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
            ), g AS (
              SELECT n_name, sk, sum(rev)::BIGINT AS r
              FROM r GROUP BY 1, 2
            ), tot AS (
              SELECT n_name, sum(r)::BIGINT AS rt,
                     count(*)::BIGINT AS ns, max(r)::BIGINT AS rmax
              FROM g GROUP BY 1
            ), h AS (
              SELECT g.n_name, g.sk,
                     (g.r::DOUBLE / t.rt::DOUBLE)
                     * (g.r::DOUBLE / t.rt::DOUBLE) AS sq
              FROM g JOIN tot t USING (n_name)
            ), hh AS (
              SELECT n_name, list_reduce(list(sq ORDER BY sk),
                                         (a, x) -> a + x) AS hhi
              FROM h GROUP BY 1
            )
            SELECT t.n_name, t.ns AS n_suppliers,
                   round(t.rt::DOUBLE / 10000.0, 6) AS revenue_sum,
                   round(hh.hhi, 6) AS hhi,
                   round(t.rmax::DOUBLE / t.rt::DOUBLE, 6) AS top_share
            FROM tot t JOIN hh USING (n_name) ORDER BY 1
        """,
        "parts_pagerank": PAGERANK_SQL,
        "orders_size_dispersion": """
            WITH k AS (
              SELECT l_orderkey, count(*)::BIGINT AS k
              FROM lineitem GROUP BY 1
            ), m AS (
              SELECT count(*)::BIGINT AS n_orders,
                     count(*)::DOUBLE AS n,
                     sum(k)::DOUBLE AS s, sum(k * k)::DOUBLE AS ss,
                     max(k)::BIGINT AS mx
              FROM k
            )
            SELECT n_orders,
                   round(s / n, 6) AS mean_lines,
                   round((ss - s * s / n) / (n - 1.0), 6) AS var_lines,
                   round(((ss - s * s / n) / (n - 1.0)) / (s / n), 6)
                     AS dispersion,
                   mx AS max_lines
            FROM m
        """,
        "customers_order_cadence": """
            WITH o AS (
              SELECT o_custkey AS c,
                     epoch_us(o_orderdate) // 86400000000 AS d
              FROM orders
            ), l AS (
              SELECT c, d - lag(d) OVER (PARTITION BY c ORDER BY d)
                       AS g
              FROM o
            ), m AS (
              SELECT c, count(g)::BIGINT AS ng,
                     count(g)::DOUBLE AS n,
                     sum(g)::DOUBLE AS s, sum(g * g)::DOUBLE AS ss
              FROM l WHERE g IS NOT NULL GROUP BY 1
            )
            SELECT c AS c_custkey, (ng + 1)::BIGINT AS n_orders,
                   round(s / n, 6) AS mean_gap_days,
                   round(sqrt((ss - s * s / n) / (n - 1.0)) / (s / n),
                         6) AS cv_gap
            FROM m WHERE ng >= 2 ORDER BY 1
        """,
        "orders_monthly_yoy": """
            WITH m AS (
              SELECT date_trunc('month', o_orderdate) AS month,
                     count(*)::BIGINT AS n,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       ::BIGINT AS c
              FROM orders GROUP BY 1
            ), l AS (
              SELECT month, n, c,
                     lag(c, 1) OVER (ORDER BY month) AS c1,
                     lag(c, 12) OVER (ORDER BY month) AS c12
              FROM m
            )
            SELECT month, n AS n_orders,
                   round(c::DOUBLE / 100.0, 6) AS revenue,
                   round((c::DOUBLE - c1::DOUBLE) / c1::DOUBLE, 6)
                     AS mom_growth,
                   round((c::DOUBLE - c12::DOUBLE) / c12::DOUBLE, 6)
                     AS yoy_growth
            FROM l ORDER BY 1
        """,
        "lineitem_qty_disc_chi2": """
            WITH b AS (
              SELECT 'q' || CAST((CAST(round(l_quantity) AS BIGINT) - 1)
                                 // 10 AS VARCHAR) AS a,
                     'd' || CAST(CAST(round(l_discount * 100) AS BIGINT)
                                 AS VARCHAR) AS bb
              FROM lineitem
            ), o AS (
              SELECT a, bb AS b, count(*)::DOUBLE AS o
              FROM b GROUP BY 1, 2
            ), r AS (SELECT a, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT b, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.a = r.a AND oo.b = c.b)
            SELECT (SELECT n FROM t)::BIGINT AS n,
                   (((SELECT count(*) FROM r) - 1)
                    * ((SELECT count(*) FROM c) - 1))::BIGINT AS dof,
                   round(sum((obs - e) * (obs - e) / e), 6) AS chi2,
                   round(sqrt(sum((obs - e) * (obs - e) / e)
                              / ((SELECT n FROM t)
                                 * least((SELECT count(*) FROM r) - 1,
                                         (SELECT count(*) FROM c) - 1))),
                         6) AS cramers_v
            FROM cell
        """,
        "orders_status_age": """
            WITH a AS (
              SELECT epoch_us(max(o_orderdate)) // 86400000000
                       AS aday
              FROM orders
            ), o AS (
              SELECT o_orderstatus,
                     a.aday - epoch_us(o_orderdate) // 86400000000
                       AS age
              FROM orders, a
            ), t AS (SELECT count(*)::DOUBLE AS tot FROM orders)
            SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
                   round(count(*)::DOUBLE / t.tot, 6) AS share,
                   round(sum(age)::DOUBLE / count(*)::DOUBLE, 6)
                     AS mean_age_days
            FROM o, t GROUP BY 1, t.tot ORDER BY 1
        """,
        "customer_balance_by_segment": """
            WITH s AS (
              SELECT c_mktsegment,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS ci
              FROM customer
            )
            SELECT c_mktsegment, count(*)::BIGINT AS n,
                   round((sum(ci)::DOUBLE / 100.0)
                         / count(*)::DOUBLE, 6) AS mean,
                   round(sum(CASE WHEN ci < 0 THEN 1 ELSE 0 END)::DOUBLE
                         / count(*)::DOUBLE, 6) AS share_neg,
                   round(quantile_disc(ci, 0.5)::DOUBLE / 100.0, 6)
                     AS q_50,
                   round(quantile_disc(ci, 0.9)::DOUBLE / 100.0, 6)
                     AS q_90
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "orders_priority_kruskal": """
            WITH v AS (
              SELECT o_orderpriority AS g,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS ci
              FROM orders
            ), r AS (
              SELECT g, ci, AVG(rn) OVER (PARTITION BY ci) AS mr
              FROM (SELECT g, ci,
                           row_number() OVER (ORDER BY ci) AS rn
                    FROM v) q
            ), pg AS (
              SELECT g, count(*)::DOUBLE AS n_g, sum(mr) AS rg
              FROM r GROUP BY 1
            ), ties AS (
              SELECT sum(c * c * c - c) AS t
              FROM (SELECT count(*)::DOUBLE AS c FROM v GROUP BY ci) z
            ), tot AS (
              SELECT count(*)::DOUBLE AS n,
                     count(DISTINCT g)::BIGINT AS k
              FROM v
            ), s AS (
              SELECT list_reduce(list(rg * rg / n_g ORDER BY g),
                                 (a, x) -> a + x) AS s
              FROM pg
            ), hh AS (
              SELECT 12.0 / (tot.n * (tot.n + 1.0)) * s.s
                     - 3.0 * (tot.n + 1.0) AS h,
                     1.0 - ties.t / (tot.n * tot.n * tot.n - tot.n) AS c
              FROM tot, ties, s
            )
            SELECT tot.n::BIGINT AS n, tot.k AS k_groups,
                   (tot.k - 1)::BIGINT AS dof,
                   round(hh.h, 6) AS h,
                   round(CASE WHEN hh.c > 0 THEN hh.h / hh.c END, 6)
                     AS h_adj
            FROM tot, hh
        """,
        "nation_balance_gap": """
            WITH cu AS (
              SELECT c_nationkey AS nk, count(*)::BIGINT AS n_c,
                     sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sc
              FROM customer GROUP BY 1
            ), su AS (
              SELECT s_nationkey AS nk, count(*)::BIGINT AS n_s,
                     sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS ss
              FROM supplier GROUP BY 1
            )
            SELECT n_name AS nation,
                   coalesce(cu.n_c, 0)::BIGINT AS n_customers,
                   coalesce(su.n_s, 0)::BIGINT AS n_suppliers,
                   round((cu.sc::DOUBLE / 100.0) / cu.n_c::DOUBLE, 6)
                     AS mean_cust_balance,
                   round((su.ss::DOUBLE / 100.0) / su.n_s::DOUBLE, 6)
                     AS mean_supp_balance,
                   round((cu.sc::DOUBLE / 100.0) / cu.n_c::DOUBLE
                         - (su.ss::DOUBLE / 100.0) / su.n_s::DOUBLE, 6)
                     AS balance_gap
            FROM nation
            LEFT JOIN cu ON cu.nk = n_nationkey
            LEFT JOIN su ON su.nk = n_nationkey
            ORDER BY 1
        """,
        "part_brand_price_profile": """
            WITH s AS (
              SELECT p_brand,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS ci
              FROM part
            )
            SELECT p_brand, count(*)::BIGINT AS n,
                   round((sum(ci)::DOUBLE / 100.0)
                         / count(*)::DOUBLE, 6) AS mean,
                   round(sum(CASE WHEN ci < 0 THEN 1 ELSE 0 END)::DOUBLE
                         / count(*)::DOUBLE, 6) AS share_neg,
                   round(quantile_disc(ci, 0.5)::DOUBLE / 100.0, 6)
                     AS q_50,
                   round(quantile_disc(ci, 0.9)::DOUBLE / 100.0, 6)
                     AS q_90
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "supplier_catalog_breadth": """
            WITH s AS (
              SELECT l_suppkey, l_partkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS ci,
                     CASE WHEN l_returnflag = 'R'
                          THEN 1 ELSE 0 END AS r
              FROM lineitem
            )
            SELECT l_suppkey, count(*)::BIGINT AS n_items,
                   count(DISTINCT l_partkey)::BIGINT AS n_parts,
                   round(sum(ci)::DOUBLE / 100.0, 6) AS total_extprice,
                   round(sum(r)::DOUBLE / count(*)::DOUBLE, 6)
                     AS return_share
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "orders_priority_status_chi2": """
            WITH o AS (
              SELECT o_orderpriority AS a, o_orderstatus AS b,
                     count(*)::DOUBLE AS o
              FROM orders GROUP BY 1, 2
            ), r AS (SELECT a, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT b, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.a = r.a AND oo.b = c.b)
            SELECT (SELECT n FROM t)::BIGINT AS n,
                   (((SELECT count(*) FROM r) - 1)
                    * ((SELECT count(*) FROM c) - 1))::BIGINT AS dof,
                   round(sum((obs - e) * (obs - e) / e), 6) AS chi2,
                   round(sqrt(sum((obs - e) * (obs - e) / e)
                              / ((SELECT n FROM t)
                                 * least((SELECT count(*) FROM r) - 1,
                                         (SELECT count(*) FROM c) - 1))),
                         6) AS cramers_v
            FROM cell
        """,
        "lineitem_qty_disc_gamma": """
            WITH s AS (
              SELECT ((CAST(round(l_quantity) AS BIGINT) - 1) // 10)
                       AS a,
                     CAST(round(l_discount * 100) AS BIGINT) AS b
              FROM lineitem
            ), cell AS (
              SELECT a, b, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), p AS (
              SELECT coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b > x.b), 0)::BIGINT
                       AS conc,
                     coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b < x.b), 0)::BIGINT
                       AS disc
              FROM cell x, cell y
            ), t AS (
              SELECT (SELECT sum(o) FROM cell)::BIGINT AS n,
                     (SELECT sum(t1 * (t1 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t1 FROM cell
                        GROUP BY a))::BIGINT AS ta,
                     (SELECT sum(t2 * (t2 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t2 FROM cell
                        GROUP BY b))::BIGINT AS tb
            )
            SELECT t.n, p.conc, p.disc,
                   round((p.conc - p.disc)::DOUBLE
                         / (p.conc + p.disc)::DOUBLE, 6) AS gamma,
                   round((p.conc - p.disc)::DOUBLE
                         / sqrt((t.n * (t.n - 1) // 2 - t.ta)::DOUBLE
                                * (t.n * (t.n - 1) // 2 - t.tb)::DOUBLE),
                         6) AS tau_b
            FROM t, p
        """,
        "nation_part_coverage": """
            WITH np_ AS (
              SELECT DISTINCT s.s_nationkey AS nk, l.l_partkey AS pk
              FROM lineitem l JOIN supplier s
                ON l.l_suppkey = s.s_suppkey
            ), agg AS (
              SELECT nk, count(*)::BIGINT AS n_parts_supplied
              FROM np_ GROUP BY 1
            ), su AS (
              SELECT s_nationkey AS nk, count(*)::BIGINT AS n_suppliers
              FROM supplier GROUP BY 1
            ), tp AS (SELECT count(*)::BIGINT AS total FROM part)
            SELECT n.n_name, su.n_suppliers, agg.n_parts_supplied,
                   round(agg.n_parts_supplied::DOUBLE / tp.total::DOUBLE,
                         6) AS coverage
            FROM agg JOIN su USING (nk)
            JOIN nation n ON n.n_nationkey = agg.nk
            CROSS JOIN tp
            ORDER BY 1
        """,
        "lineitem_qty_slope_by_decile": """
            WITH s AS (
              SELECT ((CAST(round(l_quantity) AS BIGINT) - 1) // 10)
                       AS qty_bin,
                     CAST(round(l_quantity) AS BIGINT) AS x,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS y
              FROM lineitem
            ), m AS (
              SELECT qty_bin, count(*)::BIGINT AS n,
                     sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                     sum(x * x)::BIGINT AS sxx,
                     sum(x * y)::BIGINT AS sxy
              FROM s GROUP BY 1
            ), b AS (
              SELECT qty_bin, n, sx, sy,
                     (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                     / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                       AS bb
              FROM m
            )
            SELECT qty_bin, n,
                   round(bb / 100.0, 6) AS slope,
                   round((sy::DOUBLE - bb * sx::DOUBLE) / n::DOUBLE
                         / 100.0, 6) AS intercept
            FROM b ORDER BY 1
        """,
        "customer_segment_yuen": """
            WITH s AS (
              SELECT CASE WHEN c_mktsegment = 'BUILDING'
                          THEN 1 ELSE 0 END AS g,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS v
              FROM customer
            ), c AS (
              SELECT g, v, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), w AS (
              SELECT g, v, o,
                     sum(o) OVER (PARTITION BY g ORDER BY v)::BIGINT
                       AS cum,
                     (sum(o) OVER (PARTITION BY g ORDER BY v)
                      - o)::BIGINT AS lo,
                     sum(o) OVER (PARTITION BY g)::BIGINT AS n
              FROM c
            ), k AS (
              SELECT *, (n // 5)::BIGINT AS kk FROM w
            ), a AS (
              SELECT g, max(n)::BIGINT AS n, max(kk)::BIGINT AS kk,
                     (max(n) - 2 * max(kk))::BIGINT AS h,
                     sum(v * greatest(least(cum, n - kk)
                                      - greatest(lo, kk), 0))::BIGINT
                       AS mid_sum,
                     sum(v * v * greatest(least(cum, n - kk)
                                          - greatest(lo, kk), 0))::BIGINT
                       AS mid_ss,
                     min(v) FILTER (WHERE cum > kk)::BIGINT AS v_low,
                     min(v) FILTER (WHERE cum >= n - kk)::BIGINT
                       AS v_high
              FROM k GROUP BY 1
              HAVING (max(n) - 2 * max(kk)) >= 2
            ), st AS (
              SELECT g, h,
                     mid_sum::DOUBLE / h::DOUBLE AS tmean,
                     ((mid_ss + kk * v_low * v_low
                       + kk * v_high * v_high)::DOUBLE
                      - (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        * (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        / n::DOUBLE)
                     / (n - 1)::DOUBLE
                     * (n - 1)::DOUBLE / (h * (h - 1))::DOUBLE AS d
              FROM a
            )
            SELECT a0.h AS h_0, a1.h AS h_1,
                   round(a0.tmean, 6) AS tmean_0,
                   round(a1.tmean, 6) AS tmean_1,
                   round((a1.tmean - a0.tmean)
                         / sqrt(a0.d + a1.d), 6) AS t_stat,
                   round((a0.d + a1.d) * (a0.d + a1.d)
                         / (a0.d * a0.d / (a0.h - 1)::DOUBLE
                            + a1.d * a1.d / (a1.h - 1)::DOUBLE), 6)
                     AS df
            FROM (SELECT * FROM st WHERE g = 0) a0,
                 (SELECT * FROM st WHERE g = 1) a1
        """,
        "lineitem_tax_disc_gamma": """
            WITH s AS (
              SELECT CAST(round(l_tax * 100) AS BIGINT) AS a,
                     CAST(round(l_discount * 100) AS BIGINT) AS b
              FROM lineitem
            ), cell AS (
              SELECT a, b, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), p AS (
              SELECT coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b > x.b), 0)::BIGINT
                       AS conc,
                     coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b < x.b), 0)::BIGINT
                       AS disc
              FROM cell x, cell y
            ), t AS (
              SELECT (SELECT sum(o) FROM cell)::BIGINT AS n,
                     (SELECT sum(t1 * (t1 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t1 FROM cell
                        GROUP BY a))::BIGINT AS ta,
                     (SELECT sum(t2 * (t2 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t2 FROM cell
                        GROUP BY b))::BIGINT AS tb
            )
            SELECT t.n, p.conc, p.disc,
                   round((p.conc - p.disc)::DOUBLE
                         / (p.conc + p.disc)::DOUBLE, 6) AS gamma,
                   round((p.conc - p.disc)::DOUBLE
                         / sqrt((t.n * (t.n - 1) // 2 - t.ta)::DOUBLE
                                * (t.n * (t.n - 1) // 2 - t.tb)::DOUBLE),
                         6) AS tau_b
            FROM t, p
        """,
        "lineitem_returnflag_median": """
            WITH s AS (
              SELECT l_returnflag AS ty,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem
            ), med AS (
              SELECT quantile_disc(v, 0.5)::BIGINT AS m FROM s
            ), o AS (
              SELECT ty,
                     CASE WHEN v > (SELECT m FROM med)
                          THEN 1 ELSE 0 END AS above,
                     count(*)::DOUBLE AS o
              FROM s GROUP BY 1, 2
            ), r AS (SELECT ty, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT above, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.ty = r.ty AND oo.above = c.above)
            SELECT (SELECT n FROM t)::BIGINT AS n,
                   (SELECT count(*) FROM r)::BIGINT AS k_groups,
                   round((SELECT m FROM med)::DOUBLE / 100.0, 6)
                     AS pooled_median,
                   round(sum((obs - e) * (obs - e) / e), 6) AS chi2
            FROM cell
        """,
        "market_balance_cliffs": """
            WITH s AS (
              SELECT 0 AS g,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS v
              FROM customer
              UNION ALL
              SELECT 1 AS g,
                     CAST(round(s_acctbal * 100) AS BIGINT) AS v
              FROM supplier
            ), c AS (
              SELECT v,
                     sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS ca,
                     sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS cb
              FROM s GROUP BY 1
            ), w AS (
              SELECT v, ca, cb,
                     coalesce(sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)::BIGINT AS below_a
              FROM c
            ), t AS (
              SELECT (SELECT sum(ca) FROM c)::BIGINT AS na,
                     (SELECT sum(cb) FROM c)::BIGINT AS nb
            )
            SELECT t.na AS n_0, t.nb AS n_1,
                   sum(cb * below_a)::BIGINT AS conc,
                   sum(cb * (t.na - below_a - ca))::BIGINT AS disc,
                   round((sum(cb * below_a)
                          - sum(cb * (t.na - below_a - ca)))::DOUBLE
                         / (t.na * t.nb)::DOUBLE, 6) AS delta
            FROM w, t GROUP BY 1, 2 HAVING count(*) > 0
        """,
        "orders_status_yuen": """
            WITH s AS (
              SELECT CASE WHEN o_orderstatus = 'O'
                          THEN 1 ELSE 0 END AS g,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS v
              FROM orders
              WHERE o_orderstatus IN ('F', 'O')
            ), c AS (
              SELECT g, v, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), w AS (
              SELECT g, v, o,
                     sum(o) OVER (PARTITION BY g ORDER BY v)::BIGINT
                       AS cum,
                     (sum(o) OVER (PARTITION BY g ORDER BY v)
                      - o)::BIGINT AS lo,
                     sum(o) OVER (PARTITION BY g)::BIGINT AS n
              FROM c
            ), k AS (
              SELECT *, (n // 5)::BIGINT AS kk FROM w
            ), a AS (
              SELECT g, max(n)::BIGINT AS n, max(kk)::BIGINT AS kk,
                     (max(n) - 2 * max(kk))::BIGINT AS h,
                     sum(v * greatest(least(cum, n - kk)
                                      - greatest(lo, kk), 0))::BIGINT
                       AS mid_sum,
                     sum(v * v * greatest(least(cum, n - kk)
                                          - greatest(lo, kk), 0))::BIGINT
                       AS mid_ss,
                     min(v) FILTER (WHERE cum > kk)::BIGINT AS v_low,
                     min(v) FILTER (WHERE cum >= n - kk)::BIGINT
                       AS v_high
              FROM k GROUP BY 1
              HAVING (max(n) - 2 * max(kk)) >= 2
            ), st AS (
              SELECT g, h,
                     mid_sum::DOUBLE / h::DOUBLE AS tmean,
                     ((mid_ss + kk * v_low * v_low
                       + kk * v_high * v_high)::DOUBLE
                      - (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        * (mid_sum + kk * v_low + kk * v_high)::DOUBLE
                        / n::DOUBLE)
                     / (n - 1)::DOUBLE
                     * (n - 1)::DOUBLE / (h * (h - 1))::DOUBLE AS d
              FROM a
            )
            SELECT a0.h AS h_0, a1.h AS h_1,
                   round(a0.tmean, 6) AS tmean_0,
                   round(a1.tmean, 6) AS tmean_1,
                   round((a1.tmean - a0.tmean)
                         / sqrt(a0.d + a1.d), 6) AS t_stat,
                   round((a0.d + a1.d) * (a0.d + a1.d)
                         / (a0.d * a0.d / (a0.h - 1)::DOUBLE
                            + a1.d * a1.d / (a1.h - 1)::DOUBLE), 6)
                     AS df
            FROM (SELECT * FROM st WHERE g = 0) a0,
                 (SELECT * FROM st WHERE g = 1) a1
        """,
        "orders_monthly_mk": """
            WITH e AS (
              SELECT 1::BIGINT AS scope,
                     (year(o_orderdate) * 12
                      + month(o_orderdate) - 1)::BIGINT AS m,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS sv
              FROM orders GROUP BY 1, 2
            ), p AS (
              SELECT a.scope,
                     sum(CASE WHEN b.sv > a.sv THEN 1
                              WHEN b.sv < a.sv THEN -1
                              ELSE 0 END)::BIGINT AS s
              FROM e a JOIN e b ON a.scope = b.scope AND b.m > a.m
              GROUP BY 1
            ), n AS (
              SELECT scope, count(*)::BIGINT AS n FROM e GROUP BY 1
              HAVING count(*) >= 3
            ), t AS (
              SELECT scope,
                     sum(c * (c - 1) * (2 * c + 5))::BIGINT AS tie_term
              FROM (SELECT scope, sv, count(*)::BIGINT AS c
                    FROM e GROUP BY 1, 2) GROUP BY 1
            )
            SELECT n.scope, n.n AS n_obs, p.s AS s_stat,
                   round((n.n * (n.n - 1) * (2 * n.n + 5)
                          - t.tie_term)::DOUBLE / 18.0, 6) AS var_s,
                   round(CASE
                     WHEN p.s > 0 THEN (p.s - 1)::DOUBLE
                       / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                               - t.tie_term)::DOUBLE / 18.0)
                     WHEN p.s < 0 THEN (p.s + 1)::DOUBLE
                       / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                               - t.tie_term)::DOUBLE / 18.0)
                     ELSE 0.0 END, 6) AS z
            FROM n JOIN p USING (scope) JOIN t USING (scope)
            ORDER BY 1
        """,
        "part_size_price_gamma": """
            WITH s AS (
              SELECT p_size::BIGINT AS a,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS b
              FROM part
            ), cell AS (
              SELECT a, b, count(*)::BIGINT AS o FROM s GROUP BY 1, 2
            ), p AS (
              SELECT coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b > x.b), 0)::BIGINT
                       AS conc,
                     coalesce(sum(x.o * y.o) FILTER (
                       WHERE y.a > x.a AND y.b < x.b), 0)::BIGINT
                       AS disc
              FROM cell x, cell y
            ), t AS (
              SELECT (SELECT sum(o) FROM cell)::BIGINT AS n,
                     (SELECT sum(t1 * (t1 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t1 FROM cell
                        GROUP BY a))::BIGINT AS ta,
                     (SELECT sum(t2 * (t2 - 1) // 2) FROM
                       (SELECT sum(o)::BIGINT AS t2 FROM cell
                        GROUP BY b))::BIGINT AS tb
            )
            SELECT t.n, p.conc, p.disc,
                   round((p.conc - p.disc)::DOUBLE
                         / (p.conc + p.disc)::DOUBLE, 6) AS gamma,
                   round((p.conc - p.disc)::DOUBLE
                         / sqrt((t.n * (t.n - 1) // 2 - t.ta)::DOUBLE
                                * (t.n * (t.n - 1) // 2 - t.tb)::DOUBLE),
                         6) AS tau_b
            FROM t, p
        """,
    }


def _part_docs(*, tp, T, TOKLEN, _REL_EDGES, INTEGRITY_SQL, _pr_steps, _pr_joined, PAGERANK_SQL, rollup, gapfill, lang_cases, lang_max, lang_ties, lang_pick, **_):
    return {
        "docs_vocab_simpson": """
            WITH tok AS (
              SELECT source,
                     unnest(string_split(text, ' ')) AS t
              FROM documents
            ), tc AS (
              SELECT source, t, count(*)::BIGINT AS n
              FROM tok WHERE t <> '' GROUP BY 1, 2
            ), s AS (
              SELECT source, sum(n * (n - 1))::BIGINT AS s2,
                     sum(n)::BIGINT AS nn
              FROM tc GROUP BY 1 HAVING sum(n) >= 2
            )
            SELECT source, nn AS n_tokens,
                   round(s2::DOUBLE / (nn::DOUBLE * (nn - 1)), 6)
                     AS simpson
            FROM s ORDER BY source
        """,
        "docs_exact_dedup": """
            SELECT md5(text) AS h, min(doc_id) AS doc_id
            FROM documents GROUP BY text
        """,
        "docs_token_stats": """
            SELECT doc_id,
                   CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS n_chars_engine,
                   round(CASE WHEN len(trim(text)) = 0 THEN 0.0
                        ELSE length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                             / len(regexp_split_to_array(trim(text), '\\s+')) END, 6) AS avg_token_len
            FROM documents
        """,
        "docs_quality": f"""
            WITH c AS (
              SELECT doc_id,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\\b({_STOP})\\b')) AS n_stop,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
              FROM documents
            )
            SELECT doc_id,
                   round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stopword_ratio,
                   round(n_punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
                   round(greatest(least(1 - 2.0 * (n_punct::DOUBLE / greatest(n_chars, 1)), 1), 0)
                         * least(n_tokens / 32.0, 1), 6) AS quality
            FROM c
        """,
        "docs_normalize": """
            SELECT doc_id,
                   nfc_normalize(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS text_norm
            FROM documents ORDER BY doc_id
        """,
        "docs_chars_quantiles": """
            SELECT source,
                   quantile_disc(n_chars, 0.5)  AS q_50,
                   quantile_disc(n_chars, 0.95) AS q_95,
                   quantile_disc(n_chars, 0.99) AS q_99
            FROM documents GROUP BY source ORDER BY source
        """,
        "docs_lang_id": f"""
            WITH c AS (
              SELECT doc_id, {lang_cases}
                     regexp_matches(text, '[一-鿿]') AS has_cjk
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN has_cjk THEN 'zh'
                        WHEN {lang_max} = 0 THEN 'und'
                        WHEN ({lang_ties}) > 1 THEN 'und'
                        {lang_pick}
                   END AS lang_pred
            FROM c
        """,
        "docs_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "docs_bpe_token_count": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                     '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'
                   ))::BIGINT AS n_tokens_bpe
            FROM documents
        """,
        "docs_bm25": """
            WITH toks AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
                FROM documents
              ) WHERE tok <> ''
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            stats AS (
              SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT count(*) FROM toks)::DOUBLE
                       / (SELECT count(*) FROM documents) AS avgdl
            ),
            dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
                    WHERE tok IN ('hash', 'join', 'shuffle') GROUP BY 1),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                   WHERE tok IN ('hash', 'join', 'shuffle') GROUP BY 1, 2)
            SELECT tf.doc_id,
                   round(sum(
                     ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ), 6) AS bm25
            FROM tf JOIN dfs USING (tok) JOIN dl USING (doc_id)
                 CROSS JOIN stats
            GROUP BY 1
        """,
        "docs_token_entropy": """
            WITH c AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
                FROM documents
              ) WHERE tok <> '' GROUP BY 1, 2
            ), h AS (
              SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                     round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS token_entropy
              FROM c GROUP BY 1
            )
            SELECT d.doc_id, coalesce(h.n_tokens, 0) AS n_tokens, h.token_entropy
            FROM documents d LEFT JOIN h USING (doc_id)
        """,
        "docs_tfidf_top3": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM toks WHERE token <> '' GROUP BY 1, 2
            ), dfreq AS (
              SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), n AS (SELECT count(*) AS n FROM documents)
            SELECT doc_id, token, tf, round(tfidf, 6) AS tfidf, rank FROM (
              SELECT tf.doc_id, tf.token, tf.tf,
                     tf.tf * ln(n.n / dfreq.df) AS tfidf,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(n.n / dfreq.df) DESC, tf.token
                     ) AS rank
              FROM tf, dfreq, n WHERE tf.token = dfreq.token
            ) WHERE rank <= 3
        """,
        "docs_top_tokens": """
            SELECT token, count(*)::BIGINT AS n FROM (
              SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents
            ) WHERE token <> ''
            GROUP BY 1 ORDER BY n DESC, token LIMIT 50
        """,
        "docs_prep_pipeline": f"""
            WITH c AS (
              SELECT doc_id, text,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     {lang_cases}
                     regexp_matches(text, '[一-鿿]') AS has_cjk
              FROM documents
            ), q AS (
              SELECT doc_id, text, n_tokens,
                     greatest(least(1 - 2.0 * (n_punct::DOUBLE / greatest(n_chars, 1)), 1), 0)
                       * least(n_tokens / 32.0, 1) AS quality,
                     CASE WHEN has_cjk THEN 'zh'
                          WHEN {lang_max} = 0 THEN 'und'
                          WHEN ({lang_ties}) > 1 THEN 'und'
                          {lang_pick}
                     END AS lang_pred
              FROM c
            )
            SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
                   round(min(quality), 6) AS quality, min(lang_pred) AS lang_pred
            FROM q WHERE quality >= 0.35 AND lang_pred = 'en'
            GROUP BY md5(text)
        """,
        "docs_ngram_jaccard": """
            WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b,
                   round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5
        """,
        "docs_chunk_windows": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            e AS (SELECT doc_id, words,
                         unnest(generate_series(0, len(words) - 1, 8)) AS off
                  FROM w)
            SELECT doc_id, off // 8 AS chunk_idx,
                   array_to_string(list_slice(words, off + 1, off + 16), ' ') AS chunk_text,
                   CAST(len(list_slice(words, off + 1, off + 16)) AS BIGINT) AS n_words
            FROM e
        """,
        "docs_redact": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\b(customer|value)\\b')) AS BIGINT)
                       AS n_redacted,
                   regexp_replace(text, '\\b(customer|value)\\b', '<PII>', 'g')
                       AS text_redacted
            FROM documents
        """,
        "docs_dedup_keep": """
            WITH RECURSIVE toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT i.id_a, i.id_b FROM inter i
              JOIN sizes sa ON sa.doc_id = i.id_a
              JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5
            ),
            e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(id, r) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            ),
            labels AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
            SELECT d.doc_id,
                   coalesce(l.component, d.doc_id) AS component,
                   CASE WHEN coalesce(l.component, d.doc_id) = d.doc_id
                        THEN 1 ELSE 0 END::BIGINT AS keep
            FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
            ORDER BY d.doc_id
        """,
        "docs_bigram_top20": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text), ' '), 1)
                       AS pos
              FROM documents
            )
            SELECT t1.tok || ' ' || t2.tok AS bigram, count(*)::BIGINT AS n
            FROM w t1 JOIN w t2
              ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
            WHERE t1.tok <> '' AND t2.tok <> ''
            GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20
        """,
        "docs_zipf_slope": """
            WITH tok AS (
              SELECT unnest(string_split(trim(text), ' ')) AS token
              FROM documents
            ), tc AS (
              SELECT token, count(*)::BIGINT AS n FROM tok
              WHERE token <> '' GROUP BY 1
            ), top AS (
              SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
              FROM tc ORDER BY n DESC, token LIMIT 100
            )
            SELECT count(*)::BIGINT AS n_tokens,
                   round(regr_slope(ln(n), ln(r)), 6) AS zipf_slope
            FROM top
        """,
        "docs_js_divergence": """
            WITH tok AS (
              SELECT source, unnest(string_split(trim(text), ' ')) AS token
              FROM documents WHERE source IN ('src0', 'src1')
            ), c AS (
              SELECT token,
                     sum(CASE WHEN source = 'src0'
                              THEN 1 ELSE 0 END)::BIGINT AS na,
                     sum(CASE WHEN source = 'src1'
                              THEN 1 ELSE 0 END)::BIGINT AS nb
              FROM tok WHERE token <> '' GROUP BY 1
            ), t AS (
              SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM c
            )
            SELECT count(*)::BIGINT AS n_tokens,
                   round(sum(
                     CASE WHEN c.na > 0
                          THEN 0.5 * (c.na / t.ta)
                               * ln(2.0 * (c.na / t.ta)
                                    / (c.na / t.ta + c.nb / t.tb))
                          ELSE 0 END
                     + CASE WHEN c.nb > 0
                            THEN 0.5 * (c.nb / t.tb)
                                 * ln(2.0 * (c.nb / t.tb)
                                      / (c.na / t.ta + c.nb / t.tb))
                            ELSE 0 END), 6) AS js_div
            FROM c, t
        """,
        "docs_vocab_stats": """
            WITH tc AS (
              SELECT token, count(*)::BIGINT AS n FROM (
                SELECT unnest(string_split(trim(text), ' ')) AS token
                FROM documents
              ) WHERE token <> '' GROUP BY 1
            )
            SELECT sum(n)::BIGINT AS n_instances,
                   count(*)::BIGINT AS n_vocab,
                   sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
                   round(count(*) / sum(n)::DOUBLE, 6) AS type_token_ratio,
                   round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 6) AS hapax_ratio
            FROM tc
        """,
        "docs_top_bigram": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text), ' '), 1)
                       AS pos
              FROM documents
            ), b AS (
              SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS bigram,
                     count(*)::BIGINT AS n
              FROM w t1 JOIN w t2
                ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
              WHERE t1.tok <> '' AND t2.tok <> ''
              GROUP BY 1, 2
            ), top AS (
              SELECT doc_id,
                     min(struct_pack(negn := -n, bigram := bigram)) AS s
              FROM b GROUP BY 1)
            SELECT t.doc_id, t.s.bigram AS top_bigram,
                   (-t.s.negn)::BIGINT AS n_occ,
                   round((-t.s.negn) * length(t.s.bigram)
                         / length(d.text)::DOUBLE, 6) AS rep_frac
            FROM top t JOIN documents d USING (doc_id)
        """,
        "docs_lexical_diversity": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
              FROM documents
            ), f AS (
              SELECT doc_id, tok, count(*)::BIGINT AS c
              FROM w WHERE tok <> '' GROUP BY 1, 2
            ), a AS (
              SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                     count(*)::BIGINT AS n_types,
                     sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_hapax
              FROM f GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(a.n_tokens, 0) AS n_tokens,
                   coalesce(a.n_types, 0) AS n_types,
                   round(CASE WHEN a.n_tokens > 0
                         THEN a.n_types::DOUBLE / a.n_tokens END, 6)
                     AS type_token_ratio,
                   round(CASE WHEN a.n_tokens > 0
                         THEN a.n_hapax::DOUBLE / a.n_tokens END, 6)
                     AS hapax_ratio
            FROM documents d LEFT JOIN a USING (doc_id)
        """,
        "docs_charlm_logloss": """
            WITH pos AS (
              SELECT doc_id, text,
                     unnest(range(2, length(text) + 1)) AS i
              FROM documents WHERE length(text) >= 2),
            bg AS (SELECT doc_id, substr(text, (i - 1)::INT, 1) AS c1,
                          substr(text, i::INT, 1) AS c2
                   FROM pos),
            cnt AS (SELECT c1, c2, count(*)::BIGINT AS n12
                    FROM bg GROUP BY 1, 2),
            c1n AS (SELECT c1, sum(n12) AS n1 FROM cnt GROUP BY 1),
            lp AS (SELECT cnt.c1, cnt.c2,
                          ln((cnt.n12 + 1.0) / (c1n.n1 + 256.0)) AS lp
                   FROM cnt JOIN c1n USING (c1))
            SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
                   round(-sum(lp.lp) / count(*), 6) AS avg_logloss
            FROM bg JOIN lp ON bg.c1 = lp.c1 AND bg.c2 = lp.c2
            GROUP BY 1 ORDER BY 1
        """,
        "docs_dup_words": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                       FROM documents)
            SELECT doc_id,
                   CAST(len(words) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(words)) AS BIGINT)
                     AS n_distinct_words,
                   round(1.0 - len(list_distinct(words))::DOUBLE
                         / len(words), 6) AS dup_word_frac
            FROM w
        """,
        "docs_mixture_sample": """
            SELECT doc_id, source FROM documents
            WHERE substring(md5(source || '|' || doc_id::VARCHAR), 1, 4)
                  < CASE source WHEN 'src0' THEN '4000'
                                WHEN 'src1' THEN 'c000'
                                ELSE '8000' END
        """,
        "docs_dup_rate_by_source": """
            WITH c AS (SELECT text, count(*) AS n FROM documents GROUP BY 1)
            SELECT source, count(*)::BIGINT AS n_docs,
                   (count(*) FILTER (WHERE c.n > 1))::BIGINT AS n_dup_docs,
                   round((count(*) FILTER (WHERE c.n > 1))::DOUBLE
                         / count(*), 6) AS dup_ratio
            FROM documents d JOIN c USING (text)
            GROUP BY 1 ORDER BY 1
        """,
        "docs_contamination": """
            WITH w AS (
              SELECT source, doc_id,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text, ' '), ' '),
                                         1) AS pos
              FROM documents
            ), t AS (
              SELECT DISTINCT a.source,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS gram
              FROM w a
              JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
              WHERE a.tok <> '' AND b.tok <> '' AND c.tok <> ''
            ), n AS (
              SELECT source, count(*)::BIGINT AS n FROM t GROUP BY 1
            ), i AS (
              SELECT x.source AS source_a, y.source AS source_b,
                     count(*)::BIGINT AS n_shared
              FROM t x JOIN t y ON x.gram = y.gram AND x.source < y.source
              GROUP BY 1, 2)
            SELECT i.source_a, i.source_b, i.n_shared,
                   round(i.n_shared::DOUBLE / least(na.n, nb.n), 6)
                     AS overlap_coef,
                   round(i.n_shared::DOUBLE / (na.n + nb.n - i.n_shared), 6)
                     AS jaccard
            FROM i JOIN n na ON na.source = i.source_a
                 JOIN n nb ON nb.source = i.source_b
            ORDER BY 1, 2
        """,
        "docs_source_lang_chi2": """
            WITH o AS (
              SELECT source AS a, lang AS b, count(*)::DOUBLE AS o
              FROM documents GROUP BY 1, 2
            ), r AS (SELECT a, sum(o) AS rs FROM o GROUP BY 1),
            c AS (SELECT b, sum(o) AS cs FROM o GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM o),
            cell AS (
              SELECT r.rs * c.cs / t.n AS e, coalesce(oo.o, 0.0) AS obs
              FROM r CROSS JOIN c CROSS JOIN t
              LEFT JOIN o oo ON oo.a = r.a AND oo.b = c.b)
            SELECT (SELECT n FROM t)::BIGINT AS n,
                   (((SELECT count(*) FROM r) - 1)
                    * ((SELECT count(*) FROM c) - 1))::BIGINT AS dof,
                   round(sum((obs - e) * (obs - e) / e), 6) AS chi2,
                   round(sqrt(sum((obs - e) * (obs - e) / e)
                              / ((SELECT n FROM t)
                                 * least((SELECT count(*) FROM r) - 1,
                                         (SELECT count(*) FROM c) - 1))),
                         6) AS cramers_v
            FROM cell
        """,
        "docs_source_ks": """
            WITH b AS (
              SELECT lang, n_chars, source FROM documents
              WHERE source IN ('src0', 'src1')
            ), tot AS (
              SELECT lang,
                     sum(CASE WHEN source = 'src0'
                              THEN 1 ELSE 0 END)::BIGINT AS na,
                     sum(CASE WHEN source = 'src1'
                              THEN 1 ELSE 0 END)::BIGINT AS nb
              FROM b GROUP BY 1
            ), s AS (
              SELECT lang, n_chars,
                     sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY lang ORDER BY n_chars) AS ca,
                     sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY lang ORDER BY n_chars) AS cb
              FROM b
            )
            SELECT s.lang, tot.na AS n_a, tot.nb AS n_b,
                   round(max(abs(s.ca / tot.na - s.cb / tot.nb)), 6) AS ks_d
            FROM s JOIN tot USING (lang)
            WHERE tot.na > 0 AND tot.nb > 0
            GROUP BY s.lang, tot.na, tot.nb
        """,
"docs_curation_job": f"""
            WITH c AS (
              SELECT doc_id, text,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     {lang_cases}
                     regexp_matches(text, '[一-鿿]') AS has_cjk
              FROM documents
            ), q AS (
              SELECT doc_id, text, n_tokens,
                     greatest(least(1 - 2.0 * (n_punct::DOUBLE / greatest(n_chars, 1)), 1), 0)
                       * least(n_tokens / 32.0, 1) AS quality,
                     CASE WHEN has_cjk THEN 'zh'
                          WHEN {lang_max} = 0 THEN 'und'
                          WHEN ({lang_ties}) > 1 THEN 'und'
                          {lang_pick}
                     END AS lang_pred
              FROM c
            )
            SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
                   round(min(quality), 6) AS quality, min(lang_pred) AS lang_pred
            FROM q WHERE quality >= 0.35 AND lang_pred = 'en'
            GROUP BY md5(text)
        """,
        "docs_split_leakage": """
            WITH d AS (
              SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ',
                                             'g'))) AS fp,
                     substring(md5(doc_id::VARCHAR), 1, 4) < '3333'
                       AS is_test
              FROM documents
            ), g AS (
              SELECT fp, count(*)::BIGINT AS n,
                     (count(*) FILTER (WHERE is_test))::BIGINT AS nt
              FROM d GROUP BY 1
            )
            SELECT sum(n - nt)::BIGINT AS n_train,
                   sum(nt)::BIGINT AS n_test,
                   (count(*) FILTER (WHERE nt > 0 AND nt < n))::BIGINT
                     AS n_leaked_fps,
                   coalesce(sum(n) FILTER (WHERE nt > 0 AND nt < n), 0)
                     ::BIGINT AS n_leaked_docs
            FROM g
        """,
        "docs_lang_confusion": f"""
            WITH c AS (
              SELECT lang, {lang_cases}
                     regexp_matches(text, '[一-鿿]') AS has_cjk
              FROM documents
            ), pr AS (
              SELECT lang AS t,
                     CASE WHEN has_cjk THEN 'zh'
                          WHEN {lang_max} = 0 THEN 'und'
                          WHEN ({lang_ties}) > 1 THEN 'und'
                          {lang_pick}
                     END AS p
              FROM c
            ), m AS (
              SELECT t, p, count(*)::BIGINT AS n FROM pr GROUP BY 1, 2
            ), cls AS (
              SELECT t AS c FROM m UNION SELECT p FROM m
            ), agg AS (
              SELECT c AS class,
                     coalesce(sum(n) FILTER (WHERE t = c), 0)::BIGINT
                       AS n_true,
                     coalesce(sum(n) FILTER (WHERE p = c), 0)::BIGINT
                       AS n_pred,
                     coalesce(sum(n) FILTER (WHERE t = c AND p = c), 0)
                       ::BIGINT AS tp
              FROM cls CROSS JOIN m GROUP BY 1
            ), met AS (
              SELECT class, n_true, n_pred, tp,
                     tp::DOUBLE / n_pred AS prec,
                     tp::DOUBLE / n_true AS rec
              FROM agg
            )
            SELECT class, n_true, n_pred, tp,
                   round(prec, 6) AS "precision",
                   round(rec, 6) AS recall,
                   round(2.0 * prec * rec / (prec + rec), 6) AS f1
            FROM met ORDER BY class
        """,
        "docs_containment": """
            WITH toks AS (SELECT doc_id, string_split(trim(text), ' ')
                            AS w FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM grams a JOIN grams b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b,
                   round(inter::DOUBLE / least(sa.sz, sb.sz), 6)
                     AS containment
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE inter::DOUBLE / least(sa.sz, sb.sz) >= 0.8
        """,
        "docs_mixture_weights": """
            WITH s AS (SELECT source, count(source)::BIGINT AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS tot, max(n) AS mx FROM s)
            SELECT source, n AS n_docs,
                   round(n::DOUBLE / tot::DOUBLE, 6) AS share,
                   round(sqrt(n::DOUBLE / mx::DOUBLE), 6) AS rel_weight
            FROM s, t ORDER BY source
        """,
        "docs_boilerplate": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents
            ), segs AS (
              SELECT doc_id, (pos - 1) // 8 AS seg,
                     string_agg(tok, ' ' ORDER BY pos) AS segment
              FROM toks GROUP BY 1, 2
            ), df AS (
              SELECT segment, count(DISTINCT doc_id)::BIGINT AS n_docs
              FROM segs GROUP BY 1
            )
            SELECT segment, n_docs FROM df WHERE n_docs >= 3
            ORDER BY n_docs DESC, segment LIMIT 20
        """,
        "docs_readability": """
            WITH c AS (
              SELECT doc_id,
                     (CASE WHEN len(trim(text)) = 0 THEN 0
                           ELSE len(regexp_split_to_array(trim(text),
                                                          '\\s+'))
                      END)::BIGINT AS n_words,
                     greatest(len(regexp_extract_all(text, '[.!?]+')),
                              1)::BIGINT AS n_sentences,
                     len(regexp_extract_all(
                       text, '[aeiouyAEIOUY]+'))::BIGINT AS n_syllables
              FROM documents
            )
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   round(206.835
                         - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                         - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE),
                         6) AS flesch
            FROM c
        """,
        "docs_distinctive_tokens": """
            WITH w AS (
              SELECT source,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok
              FROM documents
            ), t AS (
              SELECT source, tok, count(*)::BIGINT AS n
              FROM w WHERE tok <> '' GROUP BY 1, 2
            ), ns AS (
              SELECT source, sum(n)::BIGINT AS n_g FROM t GROUP BY 1
            ), ntt AS (
              SELECT tok, sum(n)::BIGINT AS n_t FROM t GROUP BY 1
            ), tot AS (SELECT sum(n)::BIGINT AS nn FROM t),
            sc AS (
              SELECT t.source, t.tok, t.n,
                     ln((t.n::DOUBLE + 0.5)
                        / ((ns.n_g - t.n)::DOUBLE + 0.5))
                     - ln(((ntt.n_t - t.n)::DOUBLE + 0.5)
                          / ((tot.nn - ns.n_g
                              - (ntt.n_t - t.n))::DOUBLE + 0.5))
                       AS score
              FROM t JOIN ns USING (source) JOIN ntt USING (tok)
                   CROSS JOIN tot
            ), r AS (
              SELECT source, tok, n, score,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY score DESC, tok) AS rn
              FROM sc
            )
            SELECT source, tok AS token, n, round(score, 6) AS score
            FROM r WHERE rn <= 5
        """,
        "docs_style_cosine": """
            WITH w AS (
              SELECT source,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok
              FROM documents
            ), t AS (
              SELECT source, tok, count(*)::BIGINT AS n
              FROM w WHERE tok <> '' GROUP BY 1, 2
            ), q AS (
              SELECT source, sum(n * n)::BIGINT AS qq FROM t GROUP BY 1
            ), p AS (
              SELECT x.source AS source_a, y.source AS source_b,
                     count(*)::BIGINT AS n_shared,
                     sum(x.n * y.n)::BIGINT AS dot
              FROM t x JOIN t y ON x.tok = y.tok
                               AND x.source < y.source
              GROUP BY 1, 2
            )
            SELECT p.source_a, p.source_b, p.n_shared,
                   round(p.dot::DOUBLE / (sqrt(qa.qq::DOUBLE)
                                          * sqrt(qb.qq::DOUBLE)), 6)
                     AS cosine
            FROM p JOIN q qa ON qa.source = p.source_a
                 JOIN q qb ON qb.source = p.source_b
        """,
        "docs_length_ks": """
            WITH gv AS (
              SELECT source AS g, n_chars::DOUBLE AS v,
                     count(*)::BIGINT AS c
              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
            ), vals AS (SELECT DISTINCT v FROM gv),
            gs AS (SELECT DISTINCT g FROM gv),
            grid AS (
              SELECT gs.g, vals.v, coalesce(gv.c, 0)::BIGINT AS c
              FROM gs CROSS JOIN vals
              LEFT JOIN gv ON gv.g = gs.g AND gv.v = vals.v
            ), cum AS (
              SELECT g, v,
                     sum(c) OVER (PARTITION BY g ORDER BY v) AS cc,
                     sum(c) OVER (PARTITION BY g) AS n
              FROM grid
            ), pr AS (
              SELECT a.g AS source_a, b.g AS source_b,
                     max(abs(a.cc::DOUBLE / a.n::DOUBLE
                             - b.cc::DOUBLE / b.n::DOUBLE)) AS d,
                     min(a.n) AS na, min(b.n) AS nb
              FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g
              GROUP BY 1, 2
            )
            SELECT source_a, source_b, na::BIGINT AS n_a,
                   nb::BIGINT AS n_b, round(d, 6) AS ks_d
            FROM pr ORDER BY 1, 2
        """,
        "docs_quality_pass_rate": """
            WITH c AS (
              SELECT source,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+')) END
                       AS n_tokens,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\\w\\s]'))
                       AS n_punct
              FROM documents
            ), s AS (
              SELECT source,
                     greatest(least(1 - 2.0 * (n_punct::DOUBLE
                                    / greatest(n_chars, 1)), 1), 0)
                     * least(n_tokens / 32.0, 1) AS quality
              FROM c
            )
            SELECT source, count(*)::BIGINT AS n_docs,
                   (count(*) FILTER (WHERE quality >= 0.5))::BIGINT
                     AS n_pass,
                   round((count(*) FILTER (WHERE quality >= 0.5))
                         ::DOUBLE / count(*), 6) AS pass_rate
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "docs_heaps_law": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok
              FROM documents
            ), t AS (
              SELECT doc_id, tok FROM w WHERE tok <> ''
            ), fo AS (
              SELECT tok, min(doc_id) AS d FROM t GROUP BY 1
            ), nt AS (
              SELECT doc_id AS d, count(*)::BIGINT AS c
              FROM t GROUP BY 1
            ), nv AS (
              SELECT d, count(*)::BIGINT AS v FROM fo GROUP BY 1
            ), base AS (
              SELECT nt.d, nt.c, coalesce(nv.v, 0)::BIGINT AS v
              FROM nt LEFT JOIN nv USING (d)
            ), cum AS (
              SELECT d, sum(c) OVER (ORDER BY d) AS ct,
                     sum(v) OVER (ORDER BY d) AS cd
              FROM base
            ), pts AS (
              SELECT d, ln(ct::DOUBLE) AS x, ln(cd::DOUBLE) AS y
              FROM cum
            ), m AS (
              SELECT count(*)::BIGINT AS nd, count(*)::DOUBLE AS n,
                     list_reduce(list(x ORDER BY d),
                                 (a, b) -> a + b) AS sx,
                     list_reduce(list(y ORDER BY d),
                                 (a, b) -> a + b) AS sy,
                     list_reduce(list(x * x ORDER BY d),
                                 (a, b) -> a + b) AS sxx,
                     list_reduce(list(x * y ORDER BY d),
                                 (a, b) -> a + b) AS sxy
              FROM pts
            ), tv AS (
              SELECT max(ct)::BIGINT AS tt, max(cd)::BIGINT AS vv
              FROM cum
            )
            SELECT m.nd AS n_docs, tv.tt AS total_tokens,
                   tv.vv AS vocab,
                   round((m.n * m.sxy - m.sx * m.sy)
                         / (m.n * m.sxx - m.sx * m.sx), 6) AS heaps_beta,
                   round((m.sy - (m.n * m.sxy - m.sx * m.sy)
                                 / (m.n * m.sxx - m.sx * m.sx) * m.sx)
                         / m.n, 6) AS heaps_lnk
            FROM m, tv
        """,
        "docs_collocations": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text), ' '),
                                         1) AS pos
              FROM documents
            ), b AS (
              SELECT t1.tok || ' ' || t2.tok AS bigram,
                     t1.tok AS ta, t2.tok AS tb, count(*)::BIGINT AS nab
              FROM w t1 JOIN w t2
                ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
              WHERE t1.tok <> '' AND t2.tok <> ''
              GROUP BY 1, 2, 3
            ), u AS (
              SELECT tok, count(*)::BIGINT AS n
              FROM w WHERE tok <> '' GROUP BY 1
            ), tot AS (
              SELECT (SELECT sum(n) FROM u)::BIGINT AS nu,
                     (SELECT sum(nab) FROM b)::BIGINT AS nb
            ), sc AS (
              SELECT b.bigram, b.nab,
                     ln((b.nab::DOUBLE / tot.nb::DOUBLE)
                        / ((ua.n::DOUBLE / tot.nu::DOUBLE)
                           * (ub.n::DOUBLE / tot.nu::DOUBLE))) AS pmi
              FROM b JOIN u ua ON ua.tok = b.ta
                   JOIN u ub ON ub.tok = b.tb
                   CROSS JOIN tot
              WHERE b.nab >= 5
            )
            SELECT bigram, nab AS n_ab, round(pmi, 6) AS pmi
            FROM sc ORDER BY sc.pmi DESC, bigram LIMIT 20
        """,
        "docs_lang_mix": """
            WITH c AS (
              SELECT source, lang, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1, 2
            ), t AS (
              SELECT source, sum(n_docs)::BIGINT AS tot,
                     (min(struct_pack(negn := -n_docs, l := lang))).l
                       AS dom
              FROM c GROUP BY 1
            )
            SELECT c.source, c.lang, c.n_docs,
                   round(c.n_docs::DOUBLE / t.tot::DOUBLE, 6) AS share,
                   (c.lang = t.dom) AS is_dominant
            FROM c JOIN t USING (source) ORDER BY 1, 2
        """,
        "docs_novelty_rate": """
            WITH w AS (
              SELECT doc_id, source,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text, ' '), ' '),
                                         1) AS pos
              FROM documents
            ), t AS (
              SELECT DISTINCT a.doc_id, a.source,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS gram
              FROM w a
              JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
              WHERE a.tok <> '' AND b.tok <> '' AND c.tok <> ''
            ), f AS (
              SELECT gram, min(doc_id) AS first_doc FROM t GROUP BY 1
            ), d AS (
              SELECT t.source,
                     count(*)::BIGINT AS n_tris,
                     sum(CASE WHEN t.doc_id = f.first_doc
                         THEN 1 ELSE 0 END)::BIGINT AS n_first
              FROM t JOIN f USING (gram) GROUP BY 1
            ), nd AS (
              SELECT source, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1
            )
            SELECT nd.source, nd.n_docs,
                   coalesce(d.n_tris, 0)::BIGINT AS n_tris,
                   coalesce(d.n_first, 0)::BIGINT AS n_first_seen,
                   round(d.n_first::DOUBLE / d.n_tris::DOUBLE, 6)
                     AS novelty_share
            FROM nd LEFT JOIN d ON d.source = nd.source
            ORDER BY 1
        """,
        "docs_editdist_pairs": """
            WITH d AS (
              SELECT doc_id, text, substring(text, 1, 12) AS p
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   levenshtein(a.text, b.text)::BIGINT AS dist
            FROM d a JOIN d b ON a.p = b.p AND a.doc_id < b.doc_id
            WHERE levenshtein(a.text, b.text) <= 10
            ORDER BY 1, 2
        """,
        "docs_editdist_clusters": """
            WITH RECURSIVE d AS (
              SELECT doc_id, text, substring(text, 1, 12) AS p
              FROM documents
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM d a JOIN d b ON a.p = b.p AND a.doc_id < b.doc_id
              WHERE levenshtein(a.text, b.text) <= 10
            ), e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), reach(id, r) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            )
            SELECT id, MIN(r) AS component FROM reach
            GROUP BY id ORDER BY id
        """,
        "docs_block_selectivity": """
            WITH b AS (
              SELECT substring(text, 1, 12) AS p, count(*)::BIGINT AS c
              FROM documents GROUP BY 1
            )
            SELECT c AS block_size, count(*)::BIGINT AS n_blocks,
                   (count(*) * (c * (c - 1) // 2))::BIGINT
                     AS n_candidate_pairs
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "docs_lang_length_kw": """
            WITH v AS (
              SELECT lang AS g,
                     CAST(round(n_chars * 1) AS BIGINT) AS ci
              FROM documents
            ), r AS (
              SELECT g, ci, AVG(rn) OVER (PARTITION BY ci) AS mr
              FROM (SELECT g, ci,
                           row_number() OVER (ORDER BY ci) AS rn
                    FROM v) q
            ), pg AS (
              SELECT g, count(*)::DOUBLE AS n_g, sum(mr) AS rg
              FROM r GROUP BY 1
            ), ties AS (
              SELECT sum(c * c * c - c) AS t
              FROM (SELECT count(*)::DOUBLE AS c FROM v GROUP BY ci) z
            ), tot AS (
              SELECT count(*)::DOUBLE AS n,
                     count(DISTINCT g)::BIGINT AS k
              FROM v
            ), s AS (
              SELECT list_reduce(list(rg * rg / n_g ORDER BY g),
                                 (a, x) -> a + x) AS s
              FROM pg
            ), hh AS (
              SELECT 12.0 / (tot.n * (tot.n + 1.0)) * s.s
                     - 3.0 * (tot.n + 1.0) AS h,
                     1.0 - ties.t / (tot.n * tot.n * tot.n - tot.n) AS c
              FROM tot, ties, s
            )
            SELECT tot.n::BIGINT AS n, tot.k AS k_groups,
                   (tot.k - 1)::BIGINT AS dof,
                   round(hh.h, 6) AS h,
                   round(CASE WHEN hh.c > 0 THEN hh.h / hh.c END, 6)
                     AS h_adj
            FROM tot, hh
        """,
    }


def _part_transcripts(*, tp, T, TOKLEN, _REL_EDGES, INTEGRITY_SQL, _pr_steps, _pr_joined, PAGERANK_SQL, rollup, gapfill, lang_cases, lang_max, lang_ties, lang_pick, **_):
    return {
        "transcripts_len_xicor": f"""
            WITH b AS (
              SELECT role,
                     CAST({TOKLEN} AS BIGINT) AS y,
                     ts, turn_idx,
                     count(*) OVER (PARTITION BY role) AS n,
                     count(*) OVER (PARTITION BY role)
                       - rank() OVER (PARTITION BY role
                                      ORDER BY CAST({TOKLEN} AS BIGINT)
                                      DESC) + 1 AS r,
                     count(*) OVER (PARTITION BY role)
                       - rank() OVER (PARTITION BY role
                                      ORDER BY CAST({TOKLEN} AS BIGINT)
                                      ASC) + 1 AS l
              FROM {T}
            ), d AS (
              SELECT role, n, r, l,
                     lead(r) OVER (PARTITION BY role
                                   ORDER BY ts, turn_idx) AS r_next
              FROM b
            ), s AS (
              SELECT role, max(n) AS n,
                     sum(CASE WHEN r_next IS NULL THEN 0
                              ELSE abs(r_next - r) END)::BIGINT AS s1,
                     sum(l * (n - l))::BIGINT AS s2
              FROM d GROUP BY role HAVING max(n) >= 3
            )
            SELECT role, CAST(n AS BIGINT) AS n_obs,
                   round(1.0 - (n::DOUBLE * s1) / (2.0 * s2), 6) AS xi
            FROM s ORDER BY 1
        """,
        "transcripts_window_pairs": f"""
            WITH b AS (
              SELECT conv_id,
                     CAST({TOKLEN} AS BIGINT) AS tl,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) - 1 AS p,
                     count(*) OVER (PARTITION BY conv_id) AS n
              FROM {T}
            ), w AS (
              SELECT conv_id, p, n,
                     list(tl) OVER (PARTITION BY conv_id ORDER BY p
                                    ROWS BETWEEN 4 PRECEDING
                                             AND 1 PRECEDING) AS iw,
                     list(tl) OVER (PARTITION BY conv_id ORDER BY p
                                    ROWS BETWEEN CURRENT ROW
                                             AND 1 FOLLOWING) AS lw
              FROM b
            )
            SELECT conv_id, p AS anchor_idx,
                   array_to_string(iw, ',') AS input_win,
                   array_to_string(lw, ',') AS label_win
            FROM w
            WHERE p >= 4 AND p + 2 < n AND (p - 4) % 2 = 0
            ORDER BY conv_id, anchor_idx
        """,
        "transcripts_pair_export_job": f"""
            WITH b AS (
              SELECT conv_id,
                     CAST({TOKLEN} AS BIGINT) AS tl,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) - 1 AS p,
                     count(*) OVER (PARTITION BY conv_id) AS n
              FROM {T}
            ), w AS (
              SELECT conv_id, p, n,
                     list(tl) OVER (PARTITION BY conv_id ORDER BY p
                                    ROWS BETWEEN 4 PRECEDING
                                             AND 1 PRECEDING) AS iw,
                     list(tl) OVER (PARTITION BY conv_id ORDER BY p
                                    ROWS BETWEEN CURRENT ROW
                                             AND 1 FOLLOWING) AS lw
              FROM b
            )
            SELECT conv_id, p AS anchor_idx,
                   array_to_string(iw, ',') AS input_win,
                   array_to_string(lw, ',') AS label_win
            FROM w
            WHERE p >= 4 AND p + 2 < n AND (p - 4) % 2 = 0
            ORDER BY conv_id, anchor_idx
        """,
        "transcripts_reply_latency": f"""
            WITH nx AS (
              SELECT conv_id, ts, role,
                     min(CASE WHEN role = 'assistant' THEN ts END) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS nxt
              FROM {T}
            )
            SELECT conv_id, count(*)::BIGINT AS n_replies,
                   round(avg(epoch(nxt - ts)), 6) AS mean_reply_s,
                   round(max(epoch(nxt - ts)), 6) AS max_reply_s
            FROM nx WHERE role = 'user' AND nxt IS NOT NULL GROUP BY 1
        """,
        "transcripts_role_funnel": f"""
            WITH u AS (SELECT DISTINCT conv_id FROM {T}),
            s1 AS (SELECT conv_id, min(ts) AS t FROM {T}
                   WHERE role = 'user' GROUP BY 1),
            s2 AS (SELECT e.conv_id, min(e.ts) AS t FROM {T} e
                   JOIN s1 ON e.conv_id = s1.conv_id
                   WHERE e.role = 'assistant' AND e.ts > s1.t GROUP BY 1),
            s3 AS (SELECT e.conv_id, min(e.ts) AS t FROM {T} e
                   JOIN s2 ON e.conv_id = s2.conv_id
                   WHERE e.role = 'tool' AND e.ts > s2.t GROUP BY 1)
            SELECT u.conv_id, s1.t AS ts_user, s2.t AS ts_assistant,
                   s3.t AS ts_tool,
                   (CASE WHEN s1.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s2.t IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS stages_reached
            FROM u LEFT JOIN s1 USING (conv_id) LEFT JOIN s2 USING (conv_id)
                   LEFT JOIN s3 USING (conv_id)
        """,
        "transcripts_rollup_1h": f"""
            SELECT conv_id, date_trunc('hour', ts) AS window_start,
                   count(*) AS turn_count,
                   (sum({TOKLEN}))::BIGINT AS token_len_sum,
                   (min({TOKLEN}))::BIGINT AS token_len_min,
                   (max({TOKLEN}))::BIGINT AS token_len_max,
                   round((sum({TOKLEN}))::DOUBLE / count(*), 6) AS token_len_mean,
                   round((sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END))::DOUBLE / count(*), 6) AS tool_call_rate
            FROM {T} GROUP BY 1, 2
        """,
        "transcripts_gapfill_ffill_1h": f"""
            WITH t AS (
              SELECT conv_id, date_trunc('hour', ts) AS window_start,
                     count(*) AS turn_count,
                     (sum({TOKLEN}))::BIGINT AS token_len_sum,
                     (min({TOKLEN}))::BIGINT AS token_len_min,
                     (max({TOKLEN}))::BIGINT AS token_len_max,
                     (sum({TOKLEN}))::DOUBLE / count(*) AS token_len_mean,
                     (sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END))::DOUBLE / count(*) AS tool_call_rate
              FROM {T} GROUP BY 1, 2
            ),
            span AS (SELECT conv_id, min(window_start) w0, max(window_start) w1 FROM t GROUP BY 1),
            grid AS (SELECT conv_id, unnest(generate_series(w0, w1, INTERVAL 1 HOUR)) AS window_start FROM span)
            SELECT g.conv_id, g.window_start,
                   coalesce(t.turn_count, 0)                   AS turn_count,
                   coalesce(t.token_len_sum, 0)                AS token_len_sum,
                   round(t.token_len_min, 6)                   AS token_len_min,
                   round(t.token_len_max, 6)                   AS token_len_max,
                   round(coalesce(t.token_len_mean,
                         last_value(t.token_len_mean IGNORE NULLS) OVER w_prev), 6) AS token_len_mean,
                   round(coalesce(t.tool_call_rate,
                         last_value(t.tool_call_rate IGNORE NULLS) OVER w_prev), 6) AS tool_call_rate,
                   CASE WHEN t.turn_count IS NOT NULL THEN 'observed' ELSE 'ffill' END AS fill_method
            FROM grid g LEFT JOIN t USING (conv_id, window_start)
            WINDOW w_prev AS (PARTITION BY g.conv_id ORDER BY g.window_start
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        """,
        "transcripts_sessions_30m": f"""
            WITH o AS (
              SELECT conv_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
              FROM {T}
            ),
            s AS (
              SELECT conv_id, ts,
                     (sum(new_session) OVER (PARTITION BY conv_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
              FROM o
            )
            SELECT conv_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_rows, round(epoch(max(ts) - min(ts)), 6) AS duration_sec
            FROM s GROUP BY 1, 2
        """,
        "transcripts_toolcall_last_user": f"""
            WITH k AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                     CASE WHEN tool <> '' THEN 'tool_call' ELSE role END AS kind
              FROM {T}
            )
            SELECT c.conv_id, c.turn_idx, c.role, c.tool, c.ts, c.kind,
                   u.ts AS ts_asof, u.turn_idx AS turn_idx_asof
            FROM (SELECT * FROM k WHERE kind = 'tool_call') c
            ASOF LEFT JOIN (SELECT * FROM k WHERE kind = 'user') u
              ON c.conv_id = u.conv_id AND c.ts >= u.ts
        """,
        "transcripts_order_fingerprint": f"""
            SELECT conv_id,
                   md5(string_agg(text, chr(31) ORDER BY turn_idx, ts)) AS fingerprint,
                   count(*) AS n_rows
            FROM {T} GROUP BY 1
        """,
        "transcripts_codec_roundtrip_oracle": f"""
            SELECT conv_id, count(*) AS n_rows, true AS roundtrip_ok
            FROM {T} GROUP BY 1
        """,
        "transcripts_role_transitions": f"""
            WITH o AS (
              SELECT conv_id, role,
                     lead(role) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS nxt
              FROM {T}
            ), g AS (
              SELECT role AS role_from, nxt AS role_to,
                     count(*)::BIGINT AS n_transitions
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT role_from, role_to, n_transitions,
                   round(n_transitions::DOUBLE
                         / sum(n_transitions) OVER (PARTITION BY role_from),
                         6) AS frac_from
            FROM g
        """,
        "transcripts_tool_streaks": f"""
            WITH o AS (
              SELECT conv_id, (tool <> '') AS flg,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS rn
              FROM {T}
            ), base AS (
              SELECT conv_id, count(*)::BIGINT AS n_turns,
                     sum(CASE WHEN flg THEN 1 ELSE 0 END)::BIGINT
                       AS n_tool_calls
              FROM o GROUP BY 1
            ), runs AS (
              SELECT conv_id, count(*) AS len
              FROM (SELECT conv_id, rn,
                           rn - row_number() OVER (
                             PARTITION BY conv_id ORDER BY rn) AS grp
                    FROM o WHERE flg)
              GROUP BY conv_id, grp)
            SELECT b.conv_id, b.n_turns, b.n_tool_calls,
                   coalesce(s.m, 0)::BIGINT AS longest_tool_streak
            FROM base b LEFT JOIN (
              SELECT conv_id, max(len) AS m FROM runs GROUP BY 1) s
            USING (conv_id)
        """,
        "transcripts_context_cost": f"""
            WITH o AS (
              SELECT conv_id, length(text)::BIGINT AS chars,
                     sum(length(text)::BIGINT) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS UNBOUNDED PRECEDING) AS pref
              FROM {T})
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   sum(chars)::BIGINT AS total_chars,
                   max(chars)::BIGINT AS max_turn_chars,
                   sum(pref)::BIGINT AS context_cost
            FROM o GROUP BY 1
        """,
        "transcripts_role_balance": f"""
            SELECT conv_id,
                   sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT
                     AS n_user,
                   sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
                     AS n_assistant,
                   sum(CASE WHEN role = 'user'
                       THEN length(text) ELSE 0 END)::BIGINT AS user_chars,
                   sum(CASE WHEN role = 'assistant'
                       THEN length(text) ELSE 0 END)::BIGINT
                     AS assistant_chars,
                   round(CASE WHEN sum(CASE WHEN role = 'user'
                                       THEN length(text) ELSE 0 END) > 0
                         THEN sum(CASE WHEN role = 'assistant'
                                  THEN length(text) ELSE 0 END)::DOUBLE
                              / sum(CASE WHEN role = 'user'
                                    THEN length(text) ELSE 0 END)
                         END, 6) AS assistant_user_ratio
            FROM {T} GROUP BY 1
        """,
        "transcripts_tool_usage": f"""
            WITH c AS (
              SELECT tool, conv_id, count(*)::BIGINT AS n,
                     sum(length(text))::BIGINT AS ch
              FROM {T} WHERE tool <> '' GROUP BY 1, 2)
            SELECT tool, sum(n)::BIGINT AS n_calls,
                   count(*)::BIGINT AS n_convs,
                   sum(ch)::BIGINT AS total_call_chars,
                   round(sum(ch)::DOUBLE / sum(n), 6) AS mean_call_chars,
                   round(sum(n)::DOUBLE / sum(sum(n)) OVER (), 6)
                     AS share_of_calls
            FROM c GROUP BY 1
        """,
        "transcripts_tool_transitions": f"""
            WITH tt AS (
              SELECT conv_id, turn_idx, tool FROM {T} WHERE tool <> ''
            ), o AS (
              SELECT conv_id, tool,
                     lead(tool) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS nxt
              FROM tt
            ), g AS (
              SELECT tool AS role_from, nxt AS role_to,
                     count(*)::BIGINT AS n_transitions
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT role_from, role_to, n_transitions,
                   round(n_transitions::DOUBLE
                         / sum(n_transitions) OVER (PARTITION BY role_from),
                         6) AS frac_from
            FROM g
        """,
        "transcripts_tool_latency": f"""
            WITH nx AS (
              SELECT conv_id, ts, role,
                     min(CASE WHEN role = 'assistant' THEN ts END) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS nxt
              FROM {T}
            )
            SELECT conv_id, count(*)::BIGINT AS n_replies,
                   round(avg(epoch(nxt - ts)), 6) AS mean_reply_s,
                   round(max(epoch(nxt - ts)), 6) AS max_reply_s
            FROM nx WHERE role = 'tool' AND nxt IS NOT NULL GROUP BY 1
        """,
        "transcripts_final_role": f"""
            WITH l AS (
              SELECT conv_id, max_by(role, turn_idx) AS role
              FROM {T} GROUP BY 1)
            SELECT role AS final_role, count(*)::BIGINT AS n_convs,
                   round(count(*)::DOUBLE / sum(count(*)) OVER (), 6)
                     AS frac
            FROM l GROUP BY 1
        """,
        "transcripts_turn_dedup": f"""
            SELECT md5(text) AS h,
                   min(conv_id || '#' || turn_idx::VARCHAR) AS turn_uid
            FROM {T} GROUP BY text
        """,
        "transcripts_len_quantiles_by_role": f"""
            SELECT role,
                   quantile_disc(length(text), 0.5)  AS q_50,
                   quantile_disc(length(text), 0.9)  AS q_90,
                   quantile_disc(length(text), 0.99) AS q_99
            FROM {T} GROUP BY role
        """,
        "transcripts_hourly_activity": f"""
            WITH c AS (
              SELECT hour(ts)::BIGINT AS hour, conv_id,
                     count(*)::BIGINT AS n,
                     sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)::BIGINT
                       AS tc
              FROM {T} GROUP BY 1, 2)
            SELECT hour, sum(n)::BIGINT AS n_turns,
                   sum(tc)::BIGINT AS n_tool_calls,
                   count(*)::BIGINT AS n_convs
            FROM c GROUP BY 1
        """,
        "transcripts_escalation": f"""
            WITH ut AS (
              SELECT conv_id, turn_idx::BIGINT AS x,
                     ({TOKLEN})::BIGINT AS y
              FROM {T} WHERE role = 'user'),
            s AS (
              SELECT conv_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(x*y) AS sxy
              FROM ut GROUP BY 1),
            sl AS (
              SELECT conv_id,
                     (n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx) AS slope
              FROM s WHERE n >= 2 AND n*sxx - sx*sx > 0)
            SELECT count(*)::BIGINT AS n_convs,
                   (count(*) FILTER (WHERE slope > 0))::BIGINT
                     AS n_escalating,
                   round((count(*) FILTER (WHERE slope > 0))::DOUBLE
                         / count(*), 6) AS escalating_share,
                   round(sum(slope) / count(*), 6) AS mean_slope
            FROM sl
        """,
        "transcripts_conv_features": f"""
            SELECT conv_id,
                   count(*)::BIGINT AS n_turns,
                   (count(*) FILTER (WHERE role = 'user'))::BIGINT
                     AS n_user,
                   (count(*) FILTER (WHERE role = 'assistant'))::BIGINT
                     AS n_assistant,
                   (count(*) FILTER (WHERE tool != ''))::BIGINT
                     AS n_tool_turns,
                   (count(DISTINCT tool)
                      FILTER (WHERE tool != ''))::BIGINT
                     AS n_distinct_tools,
                   sum({TOKLEN})::BIGINT AS total_tokens,
                   round(sum({TOKLEN})::DOUBLE / count(*), 6)
                     AS mean_tokens,
                   round(date_diff('microsecond', min(ts), max(ts))
                         / 1000000.0, 6) AS duration_s,
                   arg_min(role, turn_idx) AS first_role,
                   arg_max(role, turn_idx) AS last_role
            FROM {T} GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_effect": f"""
            WITH t AS (
              SELECT conv_id, role, {TOKLEN} AS tok,
                     lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_role
              FROM {T})
            SELECT (prev_role = 'tool') AS after_tool,
                   count(*)::BIGINT AS n_turns,
                   round(sum(tok)::DOUBLE / count(*), 6) AS mean_tokens
            FROM t
            WHERE role = 'assistant' AND prev_role IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "transcripts_position_profile": f"""
            WITH t AS (
              SELECT role, turn_idx, {TOKLEN} AS tok,
                     count(*) OVER (PARTITION BY conv_id) AS n_conv
              FROM {T})
            SELECT role,
                   least(9, (10 * turn_idx) // n_conv)::BIGINT AS decile,
                   count(*)::BIGINT AS n_turns,
                   round(sum(tok)::DOUBLE / count(*), 6) AS mean_tokens
            FROM t GROUP BY 1, 2 ORDER BY role, decile
        """,
        "transcripts_tool_cooccurrence": f"""
            WITH d AS (
              SELECT DISTINCT conv_id, tool FROM {T} WHERE tool != ''),
            u AS (SELECT count(DISTINCT conv_id) AS ng FROM d),
            c AS (SELECT tool, count(*)::BIGINT AS n FROM d GROUP BY 1),
            p AS (
              SELECT a.tool AS member_a, b.tool AS member_b,
                     count(*)::BIGINT AS n_both
              FROM d a JOIN d b
                ON a.conv_id = b.conv_id AND a.tool < b.tool
              GROUP BY 1, 2)
            SELECT p.member_a, p.member_b, p.n_both,
                   round((p.n_both * u.ng)::DOUBLE / (ca.n * cb.n), 6)
                     AS lift,
                   round(p.n_both::DOUBLE / (ca.n + cb.n - p.n_both), 6)
                     AS jaccard
            FROM p, u
            JOIN c ca ON ca.tool = p.member_a
            JOIN c cb ON cb.tool = p.member_b
            ORDER BY p.member_a, p.member_b
        """,
        "transcripts_context_budget": f"""
            WITH t AS (
              SELECT conv_id, ts, turn_idx,
                     CASE WHEN text = '' THEN 0
                          ELSE length(text) - length(replace(text, ' ', ''))
                               + 1 END AS ntok
              FROM {T}
            ), c AS (
              SELECT conv_id, ntok,
                     sum(ntok) OVER (PARTITION BY conv_id
                                     ORDER BY ts, turn_idx
                                     ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   sum(CASE WHEN cum <= 512 THEN 1 ELSE 0 END)::BIGINT
                     AS n_fit,
                   sum(ntok)::BIGINT AS tokens_total,
                   (sum(ntok) - sum(CASE WHEN cum <= 512 THEN ntok
                                    ELSE 0 END))::BIGINT AS tokens_dropped
            FROM c GROUP BY 1
        """,
        "transcripts_watermark_rollup": f"""
            WITH s AS (
              SELECT conv_id, ts, turn_idx,
                     length(text)::DOUBLE AS n_chars,
                     max(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS wm
              FROM {T}
            ), f AS (
              SELECT *, (wm IS NOT NULL
                         AND ts < wm - INTERVAL 2 MINUTE) AS late
              FROM s)
            SELECT conv_id, date_trunc('hour', ts) AS window_start,
                   sum(CASE WHEN NOT late THEN 1 ELSE 0 END)::BIGINT
                     AS n_events,
                   sum(CASE WHEN late THEN 1 ELSE 0 END)::BIGINT
                     AS n_late_dropped,
                   round(sum(CASE WHEN NOT late THEN n_chars END), 6)
                     AS value_sum
            FROM f GROUP BY 1, 2
        """,
        "transcripts_prompt_ols": f"""
            WITH tl AS (
              SELECT conv_id, turn_idx, role, ({TOKLEN})::BIGINT AS ntok
              FROM {T}
            ), p AS (
              SELECT a.ntok AS x, b.ntok AS y
              FROM tl a JOIN tl b
                ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
              WHERE a.role = 'user' AND b.role = 'assistant'
            ), m AS (
              SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx,
                     sum(y)::DOUBLE AS sy, sum(x * x)::DOUBLE AS sxx,
                     sum(x * y)::DOUBLE AS sxy, sum(y * y)::DOUBLE AS syy
              FROM p
            )
            SELECT n::BIGINT AS n_pairs,
                   round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
                     AS slope,
                   round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                          * sx) / n, 6) AS intercept,
                   round((sxy - sx * sy / n)
                         / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
                         6) AS corr_xy
            FROM m
        """,
        "transcripts_latency_by_hour": f"""
            WITH nx AS (
              SELECT conv_id, ts, role,
                     min(CASE WHEN role = 'assistant' THEN ts END) OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS nxt
              FROM {T}
            ), lat AS (
              SELECT extract(hour FROM ts)::BIGINT AS hour,
                     date_diff('microsecond', ts, nxt) AS lat_us
              FROM nx WHERE role = 'user' AND nxt IS NOT NULL
            )
            SELECT hour, count(*)::BIGINT AS n_replies,
                   round(avg(lat_us) / 1e6, 6) AS mean_s,
                   quantile_disc(lat_us, 0.5) AS p50_us,
                   quantile_disc(lat_us, 0.95) AS p95_us
            FROM lat GROUP BY 1 ORDER BY 1
        """,
        "transcripts_duration_stats": f"""
            WITH c AS (
              SELECT conv_id,
                     date_diff('microsecond', min(ts), max(ts)) AS dur_us
              FROM {T} GROUP BY 1
            )
            SELECT count(*)::BIGINT AS n_convs,
                   round(avg(dur_us) / 1e6, 6) AS mean_s,
                   quantile_disc(dur_us, 0.5) AS p50_us,
                   quantile_disc(dur_us, 0.95) AS p95_us
            FROM c
        """,
        "transcripts_token_gini": f"""
            WITH c AS (
              SELECT role, conv_id, sum({TOKLEN})::BIGINT AS n
              FROM {T} GROUP BY 1, 2),
            r AS (
              SELECT role, n,
                     row_number() OVER (PARTITION BY role
                                        ORDER BY n) AS rn
              FROM c)
            SELECT role,
                   count(*)::BIGINT AS n_convs,
                   sum(n)::BIGINT AS total_tokens,
                   round((2.0 * sum(rn * n)) / (count(*) * sum(n))
                         - (count(*) + 1.0) / count(*), 6) AS gini
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_km": f"""
            WITH u AS (
              SELECT conv_id,
                     (epoch_us(coalesce(
                         min(ts) FILTER (WHERE role = 'tool'),
                         max(ts)))
                      - epoch_us(min(ts))) // 60000000 AS dur,
                     (min(ts) FILTER (WHERE role = 'tool'))
                       IS NOT NULL AS obs
              FROM {T} GROUP BY 1
            ), h AS (
              SELECT dur, (count(*) FILTER (WHERE obs))::BIGINT AS d,
                     count(*)::BIGINT AS tot
              FROM u GROUP BY 1
            ), w AS (
              SELECT dur, d,
                     sum(tot) OVER (ORDER BY dur DESC) AS n_risk
              FROM h
            ), s AS (
              SELECT dur, d, n_risk,
                     product(1.0 - d::DOUBLE / n_risk)
                       OVER (ORDER BY dur) AS surv
              FROM w
            )
            SELECT dur AS bucket, n_risk::BIGINT AS n_risk,
                   d AS n_events, round(surv, 6) AS survival
            FROM s WHERE d > 0 ORDER BY bucket
        """,
        "transcripts_template_prefix": f"""
            WITH pre AS (
              SELECT conv_id,
                     md5(string_agg(role || ':' || text, chr(31)
                                    ORDER BY turn_idx)) AS fingerprint
              FROM {T} WHERE turn_idx < 1 GROUP BY 1)
            SELECT fingerprint, count(*)::BIGINT AS n_convs,
                   min(conv_id) AS first_conv
            FROM pre GROUP BY 1 HAVING count(*) >= 2
            ORDER BY n_convs DESC, fingerprint
        """,
        "transcripts_concurrency_1h": f"""
            WITH b AS (
              SELECT conv_id, date_trunc('hour', min(ts)) AS h0,
                     date_trunc('hour', max(ts)) AS h1
              FROM {T} GROUP BY 1),
            e AS (
              SELECT conv_id,
                     unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                       AS window_start
              FROM b)
            SELECT window_start, count(*)::BIGINT AS n_active
            FROM e GROUP BY 1 ORDER BY 1
        """,
        "transcripts_cache_savings": f"""
            WITH p AS (
              SELECT conv_id, length(text)::BIGINT AS chars,
                     sum(length(text)) OVER (PARTITION BY conv_id
                                             ORDER BY turn_idx
                                             ROWS UNBOUNDED PRECEDING)
                       AS prefix
              FROM {T}),
            c AS (
              SELECT conv_id, count(*)::BIGINT AS n_turns,
                     sum(chars) AS total, sum(prefix) AS cost
              FROM p GROUP BY 1)
            SELECT conv_id, n_turns,
                   cost::BIGINT AS billed_full_history,
                   total::BIGINT AS billed_prefix_cache,
                   round((cost - total)::DOUBLE / cost::DOUBLE, 6)
                     AS savings_ratio
            FROM c
        """,
        "transcripts_tool_latency_quantiles": f"""
            WITH o AS (
              SELECT conv_id, ts, turn_idx, role, tool,
                     first_value(CASE WHEN role = 'assistant' THEN ts END
                                 IGNORE NULLS)
                       OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                             ROWS BETWEEN 1 FOLLOWING
                                      AND UNBOUNDED FOLLOWING) AS next_a
              FROM {T}),
            l AS (
              SELECT tool,
                     date_diff('microsecond', ts, next_a) AS lat_us
              FROM o
              WHERE role = 'assistant' AND tool <> ''
                AND next_a IS NOT NULL)
            SELECT tool, count(*)::BIGINT AS n_calls,
                   quantile_disc(lat_us, 0.5)::BIGINT AS p50_us,
                   quantile_disc(lat_us, 0.9)::BIGINT AS p90_us
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "transcripts_verbosity_trend": f"""
            WITH a AS (
              SELECT conv_id, turn_idx::BIGINT AS x,
                     length(text)::BIGINT AS y
              FROM {T} WHERE role = 'assistant'
            ), m AS (
              SELECT conv_id, count(*)::BIGINT AS n,
                     sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
                     sum(x*x)::DOUBLE AS sxx, sum(x*y)::DOUBLE AS sxy
              FROM a GROUP BY 1
            )
            SELECT conv_id, n AS n_role_turns,
                   round(sy / n::DOUBLE, 6) AS mean_chars,
                   round((n::DOUBLE * sxy - sx * sy)
                         / (n::DOUBLE * sxx - sx * sx), 6)
                     AS slope_chars_per_turn
            FROM m
        """,
        "transcripts_self_repetition": f"""
            WITH w AS (
              SELECT conv_id, turn_idx,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok,
                     generate_subscripts(
                       string_split(trim(text, ' '), ' '), 1) AS pos
              FROM {T}
            ), t2 AS (
              SELECT a.conv_id, a.turn_idx::BIGINT AS turn_idx,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS gram
              FROM w a
              JOIN w b ON a.conv_id = b.conv_id
                      AND a.turn_idx = b.turn_idx AND b.pos = a.pos + 1
              JOIN w c ON a.conv_id = c.conv_id
                      AND a.turn_idx = c.turn_idx AND c.pos = a.pos + 2
              WHERE a.tok <> '' AND b.tok <> '' AND c.tok <> ''
            ), fst AS (
              SELECT conv_id, gram, min(turn_idx) AS first_turn
              FROM t2 GROUP BY 1, 2
            ), j AS (
              SELECT o.conv_id, count(*)::BIGINT AS n_grams,
                     (count(*) FILTER (
                        WHERE o.turn_idx > fst.first_turn))::BIGINT
                       AS n_repeated
              FROM t2 o JOIN fst ON o.conv_id = fst.conv_id
                               AND o.gram = fst.gram
              GROUP BY 1
            )
            SELECT conv_id, n_grams, n_repeated,
                   round(n_repeated::DOUBLE / n_grams, 6)
                     AS repeated_share
            FROM j
        """,
        "transcripts_abandonment": f"""
            WITH last AS (
              SELECT conv_id,
                     max(struct_pack(k := turn_idx, role := role,
                                     ts := ts)) AS st
              FROM {T} GROUP BY 1
            ), l AS (
              SELECT (extract(hour FROM (st).ts))::BIGINT AS hour,
                     ((st).role = 'user')::BIGINT AS ab
              FROM last
            )
            SELECT hour, count(*)::BIGINT AS n_convs,
                   sum(ab)::BIGINT AS n_abandoned,
                   round(sum(ab)::DOUBLE / count(*), 6)
                     AS abandoned_share
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_adoption": f"""
            WITH tc AS (
              SELECT tool, conv_id, min(turn_idx)::BIGINT AS fi
              FROM {T} WHERE tool <> '' GROUP BY 1, 2
            ), tot AS (
              SELECT count(DISTINCT conv_id)::DOUBLE AS nc FROM {T}
            )
            SELECT tool, count(*)::BIGINT AS n_convs,
                   round(count(*)::DOUBLE / tot.nc, 6) AS conv_share,
                   round(sum(fi)::DOUBLE / count(*)::DOUBLE, 6)
                     AS mean_first_turn
            FROM tc, tot GROUP BY tool, tot.nc ORDER BY tool
        """,
        "transcripts_readability_by_role": f"""
            WITH c AS (
              SELECT role,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+')) END
                       AS w,
                     greatest(len(regexp_extract_all(text, '[.!?]+')),
                              1) AS s,
                     len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                       AS y
              FROM {T}
            )
            SELECT role, count(*)::BIGINT AS n_turns,
                   sum(w)::BIGINT AS n_words,
                   sum(s)::BIGINT AS n_sentences,
                   sum(y)::BIGINT AS n_syllables,
                   round(206.835
                         - 1.015 * (sum(w)::DOUBLE / sum(s)::DOUBLE)
                         - 84.6 * (sum(y)::DOUBLE / sum(w)::DOUBLE), 6)
                     AS flesch
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "transcripts_echo_rate": f"""
            WITH w AS (
              SELECT conv_id, turn_idx::BIGINT AS turn_idx, role,
                     unnest(string_split(trim(text, ' '), ' ')) AS tok
              FROM {T}
            ), t AS (
              SELECT DISTINCT conv_id, turn_idx, role, tok
              FROM w WHERE tok <> ''
            ), r AS (
              -- eligibility over TOKEN-BEARING turns only (a tokenless
              -- user turn cannot be echoed; matches the engine, whose
              -- partials never see empty turns)
              SELECT DISTINCT conv_id, turn_idx, role FROM t
            ), elig AS (
              SELECT a.conv_id, a.turn_idx
              FROM r a JOIN r u ON a.conv_id = u.conv_id
                   AND u.turn_idx = a.turn_idx - 1
              WHERE a.role = 'assistant' AND u.role = 'user'
            ), at AS (
              SELECT t.conv_id, t.turn_idx, t.tok
              FROM t JOIN elig ON t.conv_id = elig.conv_id
                   AND t.turn_idx = elig.turn_idx
            ), echo AS (
              SELECT at.conv_id, count(*)::BIGINT AS ne
              FROM at JOIN t u ON u.conv_id = at.conv_id
                   AND u.turn_idx = at.turn_idx - 1
                   AND u.tok = at.tok
              GROUP BY 1
            ), den AS (
              SELECT conv_id, count(*)::BIGINT AS nt,
                     count(DISTINCT turn_idx)::BIGINT AS np
              FROM at GROUP BY 1
            )
            SELECT den.conv_id, den.np AS n_pairs,
                   den.nt AS n_assistant_tokens,
                   coalesce(echo.ne, 0)::BIGINT AS n_echo_tokens,
                   round(coalesce(echo.ne, 0)::DOUBLE / den.nt, 6)
                     AS echo_share
            FROM den LEFT JOIN echo USING (conv_id)
        """,
        "transcripts_prompt_curve": f"""
            WITH o AS (
              SELECT conv_id, turn_idx::BIGINT AS idx, role,
                     {TOKLEN} AS tok,
                     lead(role) OVER w AS nrole,
                     lead(turn_idx::BIGINT) OVER w AS nidx,
                     lead({TOKLEN}) OVER w AS ntok
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ), p AS (
              SELECT conv_id, idx, tok AS x, ntok AS y
              FROM o WHERE role = 'user' AND nrole = 'assistant'
                    AND nidx = idx + 1
            ), t2 AS (SELECT count(*)::BIGINT AS n FROM p),
            r AS (
              SELECT x, y,
                     row_number() OVER (ORDER BY x, conv_id, idx) AS rn
              FROM p
            ), d AS (
              SELECT ((rn - 1) * 10) // t2.n + 1 AS bin, x, y
              FROM r, t2
            )
            SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_pairs,
                   round(sum(x)::DOUBLE / count(*)::DOUBLE, 6)
                     AS mean_prompt_tokens,
                   round(sum(y)::DOUBLE / count(*)::DOUBLE, 6)
                     AS mean_reply_tokens
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "transcripts_depth_curve": f"""
            WITH c AS (
              SELECT conv_id, count(*)::BIGINT AS n
              FROM {T} GROUP BY 1
            ), t AS (SELECT count(*)::BIGINT AS tot FROM c),
            k AS (SELECT unnest([2, 5, 10, 20, 50]::BIGINT[])
                    AS threshold)
            SELECT k.threshold,
                   (SELECT count(*) FROM c
                    WHERE c.n >= k.threshold)::BIGINT
                     AS n_convs_reaching,
                   round((SELECT count(*) FROM c
                          WHERE c.n >= k.threshold)::DOUBLE / t.tot, 6)
                     AS share
            FROM k, t ORDER BY 1
        """,
        "transcripts_len_cliffs": f"""
            WITH s AS (
              SELECT CASE WHEN role = 'assistant'
                          THEN 1 ELSE 0 END AS g,
                     length(text)::BIGINT AS v
              FROM {T}
              WHERE role IN ('user', 'assistant')
            ), c AS (
              SELECT v,
                     sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS ca,
                     sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS cb
              FROM s GROUP BY 1
            ), w AS (
              SELECT v, ca, cb,
                     coalesce(sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0)::BIGINT AS below_a
              FROM c
            ), t AS (
              SELECT (SELECT sum(ca) FROM c)::BIGINT AS na,
                     (SELECT sum(cb) FROM c)::BIGINT AS nb
            )
            SELECT t.na AS n_0, t.nb AS n_1,
                   sum(cb * below_a)::BIGINT AS conc,
                   sum(cb * (t.na - below_a - ca))::BIGINT AS disc,
                   round((sum(cb * below_a)
                          - sum(cb * (t.na - below_a - ca)))::DOUBLE
                         / (t.na * t.nb)::DOUBLE, 6) AS delta
            FROM w, t GROUP BY 1, 2 HAVING count(*) > 0
        """,
        "transcripts_alternation_runs": f"""
            WITH s AS (
              SELECT conv_id,
                     CASE WHEN role = 'assistant' THEN 1 ELSE 0 END
                       AS b,
                     ts, turn_idx
              FROM {T}
              WHERE role IN ('user', 'assistant')
            ), l AS (
              SELECT conv_id, b,
                     lag(b) OVER (PARTITION BY conv_id
                                  ORDER BY ts, turn_idx) AS pb
              FROM s
            ), m AS (
              SELECT conv_id,
                     sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n0,
                     sum(b)::BIGINT AS n1,
                     (1 + sum(CASE WHEN pb IS NOT NULL AND b <> pb
                              THEN 1 ELSE 0 END))::BIGINT AS r
              FROM l GROUP BY 1
            )
            SELECT conv_id, n0 AS n_zero, n1 AS n_one, r AS n_runs,
                   round((r::DOUBLE
                          - ((2 * n0 * n1)::DOUBLE
                             / (n0 + n1)::DOUBLE + 1.0))
                         / sqrt((2 * n0 * n1
                                 * (2 * n0 * n1 - n0 - n1))::DOUBLE
                                / (((n0 + n1) * (n0 + n1))::DOUBLE
                                   * (n0 + n1 - 1)::DOUBLE)), 6) AS z
            FROM m ORDER BY 1
        """,
    }


def _part_emb_media(*, tp, T, TOKLEN, _REL_EDGES, INTEGRITY_SQL, _pr_steps, _pr_joined, PAGERANK_SQL, rollup, gapfill, lang_cases, lang_max, lang_ties, lang_pick, **_):
    return {
        "emb_label_centroids": """
            -- two unnests in one SELECT zip element-wise in DuckDB,
            -- giving (value, 1-based dim) pairs per embedding
            SELECT label, dim, count(*) AS n_vectors,
                   round(avg(v), 6) AS centroid
            FROM (
              SELECT label, unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding))) AS dim
              FROM embeddings
            ) GROUP BY 1, 2
        """,
        "emb_centroid_similarity": """
            WITH e AS (
              SELECT label, unnest(embedding) AS v,
                     unnest(generate_series(1, len(embedding))) AS dim
              FROM embeddings
            ), c AS (
              SELECT label, dim, avg(v) AS x FROM e GROUP BY 1, 2
            ), l AS (
              SELECT label, list(x ORDER BY dim) AS vec FROM c GROUP BY 1)
            SELECT a.label AS label_a, b.label AS label_b,
                   round(list_cosine_similarity(a.vec, b.vec), 6) AS cosine
            FROM l a JOIN l b ON a.label < b.label
        """,
        "emb_knn_top10": """
            WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS embedding
                       FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, e.embedding::DOUBLE[]) AS cos_raw
              FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id
            )
            SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_raw DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= 10
        """,
        "emb_neardup_04": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        "emb_dedup_clusters": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
            ), e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), reach(id, r) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            )
            SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id
        """,
        "emb_cosine_centroid": """
            WITH u AS (
              SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings
            ), c AS (SELECT i, avg(v) AS cv FROM u GROUP BY 1),
            nc AS (SELECT sqrt(sum(cv * cv)) AS norm_c FROM c),
            d AS (
              SELECT u.vec_id, sum(u.v * c.cv) AS dot,
                     sqrt(sum(u.v * u.v)) AS norm_u
              FROM u JOIN c USING (i) GROUP BY 1
            )
            SELECT d.vec_id,
                   round(d.dot / (d.norm_u * nc.norm_c), 6) AS cos_centroid
            FROM d, nc
        """,
        "emb_dim_variance": """
            WITH x AS (
              SELECT generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
            m AS (
              SELECT dim, count(*)::BIGINT AS n_vectors,
                     sum(v) / count(*) AS mean
              FROM x GROUP BY 1),
            d AS (
              SELECT x.dim, x.v - m.mean AS dv, m.n_vectors, m.mean
              FROM x JOIN m USING (dim))
            SELECT dim::BIGINT AS dim, min(n_vectors) AS n_vectors,
                   round(min(mean), 6) AS mean,
                   round(sum(dv*dv) / (min(n_vectors) - 1), 6) AS variance
            FROM d GROUP BY dim ORDER BY dim
        """,
        "emb_centroid_drift": """
            WITH x AS (
              SELECT label, vec_id % 2 AS half,
                     generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
            s AS (SELECT label, half, dim, sum(v) / count(*) AS c,
                         count(*) AS n
                  FROM x GROUP BY 1, 2, 3),
            hn AS (SELECT label, half, min(n) AS n FROM s GROUP BY 1, 2),
            n AS (SELECT label,
                         max(CASE WHEN half = 0 THEN n END) AS n_even,
                         max(CASE WHEN half = 1 THEN n END) AS n_odd
                  FROM hn GROUP BY 1),
            p AS (
              SELECT a.label, sum(a.c * b.c) AS dot,
                     sum(a.c * a.c) AS q0, sum(b.c * b.c) AS q1
              FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
              WHERE a.half = 0 AND b.half = 1
              GROUP BY 1)
            SELECT n.label, coalesce(n.n_even, 0)::BIGINT AS n_even,
                   coalesce(n.n_odd, 0)::BIGINT AS n_odd,
                   CASE WHEN p.q0 > 0 AND p.q1 > 0 THEN
                     round(p.dot / (sqrt(p.q0) * sqrt(p.q1)), 6)
                   END AS centroid_cosine
            FROM n LEFT JOIN p USING (label)
            ORDER BY label
        """,
        "emb_label_separability": """
            WITH x AS (
              SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
            nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nn FROM x GROUP BY 1),
            u AS (SELECT x.label, x.vec_id, x.dim,
                         CASE WHEN nrm.nn = 0 THEN 0.0
                              ELSE x.v / nrm.nn END AS uv
                  FROM x JOIN nrm USING (vec_id)),
            s AS (SELECT label, dim, sum(uv) AS s FROM u GROUP BY 1, 2),
            s2 AS (SELECT label, sum(s*s) AS s2 FROM s GROUP BY 1),
            tt AS (SELECT label, count(DISTINCT vec_id) AS n,
                          sum(uv*uv) AS t
                   FROM u GROUP BY 1)
            SELECT tt.label, tt.n::BIGINT AS n_vectors,
                   CASE WHEN tt.n > 1 THEN
                     round((s2.s2 - tt.t) / (tt.n * (tt.n - 1.0)), 6)
                   END AS mean_intra_cosine
            FROM tt JOIN s2 USING (label)
            ORDER BY label
        """,
        "emb_dedup_cluster_sizes": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) >= 0.4
            ), e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), reach(id, r) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            ), comp AS (
              SELECT id, MIN(r) AS component FROM reach GROUP BY id
            ), cs AS (
              SELECT component, count(*)::BIGINT AS cluster_size
              FROM comp GROUP BY 1)
            SELECT cluster_size, count(*)::BIGINT AS n_clusters
            FROM cs GROUP BY 1 ORDER BY 1
        """,
        "emb_quantize_error": """
            WITH u AS (
              SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings
            ), mm AS (
              SELECT i, min(x) AS mn, max(x) AS mx FROM u GROUP BY 1
            ), r AS (
              SELECT u.vec_id, u.x,
                     CASE WHEN mm.mx > mm.mn
                          THEN mm.mn
                               + round((u.x - mm.mn) / (mm.mx - mm.mn)
                                       * 255)
                                 * ((mm.mx - mm.mn) / 255)
                          ELSE mm.mn END AS recon
              FROM u JOIN mm USING (i))
            SELECT vec_id,
                   round(avg((x - recon) * (x - recon)) * 1e6, 6)
                     AS mse_e6
            FROM r GROUP BY 1 ORDER BY vec_id
        """,
        "emb_norm_stats": """
            WITH u AS (
              SELECT vec_id, label, sum(x * x) AS nsq
              FROM (SELECT vec_id, label,
                           unnest(embedding)::DOUBLE AS x
                    FROM embeddings)
              GROUP BY 1, 2
            ), n AS (SELECT label, sqrt(nsq) AS nrm FROM u)
            SELECT label, count(*)::BIGINT AS n_vecs,
                   round(avg(nrm), 6) AS norm_mean,
                   round(min(nrm), 6) AS norm_min,
                   round(max(nrm), 6) AS norm_max
            FROM n GROUP BY 1 ORDER BY 1
        """,
        "emb_dim_participation": """
            WITH x AS (
              SELECT generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
            m AS (
              SELECT dim, count(*)::BIGINT AS n_vectors,
                     sum(v) / count(*) AS mean
              FROM x GROUP BY 1),
            d AS (
              SELECT x.dim, x.v - m.mean AS dv, m.n_vectors
              FROM x JOIN m USING (dim)),
            vv AS (
              SELECT dim, min(n_vectors) AS nv,
                     sum(dv * dv) / (min(n_vectors) - 1) AS var
              FROM d GROUP BY dim),
            f AS (
              SELECT count(*)::BIGINT AS n_dims, min(nv)::BIGINT AS nv,
                     list_reduce(list(var ORDER BY dim),
                                 (a, x) -> a + x) AS s1,
                     list_reduce(list(var * var ORDER BY dim),
                                 (a, x) -> a + x) AS s2,
                     max(var) AS vmax
              FROM vv)
            SELECT n_dims, nv AS n_vectors,
                   round(s1 * s1 / s2, 6) AS participation_ratio,
                   round(vmax / s1, 6) AS top_dim_var_share
            FROM f
        """,
    }


def build_oracle_sql() -> dict[str, str]:
    # The transcript queries run over the deterministic synthesized corpus
    # (pure function of (n_turns, seed)); the driver checks at sf=0.01.
    # Materialize the cache here (pure pyarrow, no Ray) and reference the
    # parquet shards by absolute path in the SQL.
    tp = _transcripts_for("/root/testdata/sf0.01")
    T = f"read_parquet('{tp}/*.parquet')"
    # token_len fast path: texts are single-space-normalized, so token
    # count == count(' ')+1 (0 for empty) — functions/derive.py:token_count
    TOKLEN = "CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END"

    _REL_EDGES = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    INTEGRITY_SQL = "\nUNION ALL\n".join(
        f"""SELECT '{c}.{fk}->{p}.{pk}' AS relationship,
               count(*)::BIGINT AS n_child_rows,
               count(DISTINCT c.{fk})::BIGINT AS n_distinct_fk,
               (count(*) FILTER (WHERE p.{pk} IS NULL))::BIGINT
                 AS n_orphan_rows,
               (count(DISTINCT c.{fk}) FILTER (WHERE p.{pk} IS NULL))::BIGINT
                 AS n_orphan_keys
            FROM {c} c LEFT JOIN {p} p ON c.{fk} = p.{pk}"""
        for c, fk, p, pk in _REL_EDGES
    ) + "\nORDER BY relationship"

    # unrolled 20-iteration PageRank twin (recursive aggregation is not
    # portable; a generated CTE chain is) — each step's in-neighbor sum
    # folds via list_reduce in ascending-src order, matching the
    # engine's sequential per-segment loop bit for bit.  Every CTE is
    # AS MATERIALIZED: DuckDB inlines plain CTEs, which re-expands the
    # whole chain at every step (measured 489 s → 0.3 s).
    _pr_steps = []
    for _i in range(20):
        _pr_steps.append(f"""v{_i + 1} AS MATERIALIZED (
              SELECT e.t AS node,
                     (1.0 - 0.85) / nn.n::DOUBLE
                     + 0.85 * list_reduce(
                         list(v{_i}.v / deg.d::DOUBLE ORDER BY e.s),
                         (a, x) -> a + x) AS v
              FROM v{_i} JOIN e ON e.s = v{_i}.node
                   JOIN deg ON deg.s = e.s, nn
              GROUP BY e.t, nn.n
            )""")
    _pr_joined = ",\n            ".join(_pr_steps)
    PAGERANK_SQL = f"""
            WITH b AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS m
              FROM lineitem
            ), p AS MATERIALIZED (
              SELECT x.m AS a, y.m AS bb
              FROM b x JOIN b y ON x.g = y.g AND x.m < y.m
              GROUP BY 1, 2 HAVING count(*) >= 2
            ), e AS MATERIALIZED (
              SELECT a AS s, bb AS t FROM p
              UNION ALL SELECT bb, a FROM p
            ), deg AS MATERIALIZED (
              SELECT s, count(*)::BIGINT AS d FROM e GROUP BY 1
            ), nn AS MATERIALIZED (
              SELECT count(*)::BIGINT AS n FROM deg
            ),
            v0 AS MATERIALIZED (
              SELECT s AS node, 1.0 / nn.n::DOUBLE AS v FROM deg, nn
            ),
            {_pr_joined}
            SELECT deg.s AS node, deg.d AS degree,
                   round(v20.v, 6) AS pagerank
            FROM v20 JOIN deg ON deg.s = v20.node ORDER BY 1
        """

    def rollup(trunc: str) -> str:
        return f"""
        SELECT user_id,
               date_trunc('{trunc}', ts) AS window_start,
               count(*) AS n_events,
               round(sum(value), 6)  AS value_sum,
               round(min(value), 6)  AS value_min,
               round(max(value), 6)  AS value_max,
               round(avg(value), 6)  AS value_mean
        FROM events GROUP BY 1, 2
        """

    def gapfill(mode: str) -> str:
        fill = (
            "coalesce(t.value_mean, last_value(t.value_mean IGNORE NULLS) OVER w_prev)"
            if mode == "ffill"
            else """coalesce(t.value_mean,
                 last_value(t.value_mean IGNORE NULLS) OVER w_prev
                 + (first_value(t.value_mean IGNORE NULLS) OVER w_next
                    - last_value(t.value_mean IGNORE NULLS) OVER w_prev)
                   * (epoch(g.window_start) - epoch(last_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_prev))
                   / (epoch(first_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_next)
                      - epoch(last_value(CASE WHEN t.value_mean IS NOT NULL THEN g.window_start END IGNORE NULLS) OVER w_prev)))"""
        )
        return f"""
        WITH t AS (
          SELECT user_id, date_trunc('hour', ts) AS window_start,
                 count(*) AS n_events, sum(value) AS value_sum,
                 min(value) AS value_min, max(value) AS value_max,
                 avg(value) AS value_mean
          FROM events GROUP BY 1, 2
        ),
        span AS (SELECT user_id, min(window_start) w0, max(window_start) w1 FROM t GROUP BY 1),
        grid AS (SELECT user_id, unnest(generate_series(w0, w1, INTERVAL 1 HOUR)) AS window_start FROM span)
        SELECT g.user_id, g.window_start,
               coalesce(t.n_events, 0)          AS n_events,
               round(coalesce(t.value_sum, 0), 6) AS value_sum,
               round(t.value_min, 6)            AS value_min,
               round(t.value_max, 6)            AS value_max,
               round({fill}, 6)                 AS value_mean,
               CASE WHEN t.n_events IS NOT NULL THEN 'observed' ELSE '{mode}' END AS fill_method
        FROM grid g LEFT JOIN t USING (user_id, window_start)
        WINDOW
          w_prev AS (PARTITION BY g.user_id ORDER BY g.window_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          w_next AS (PARTITION BY g.user_id ORDER BY g.window_start
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        """

    lang_cases = " ".join(
        f"len(regexp_extract_all(text, '\\b({pat})\\b')) AS c_{lang}," for lang, pat in _LANGS.items()
    )
    lang_max = "greatest(c_en, c_de, c_fr, c_es)"
    lang_ties = " + ".join(f"CASE WHEN c_{l} = {lang_max} THEN 1 ELSE 0 END" for l in _LANGS)
    lang_pick = " ".join(f"WHEN c_{l} = {lang_max} THEN '{l}'" for l in _LANGS)

    ctx = dict(tp=tp, T=T, TOKLEN=TOKLEN, _REL_EDGES=_REL_EDGES, INTEGRITY_SQL=INTEGRITY_SQL, _pr_steps=_pr_steps, _pr_joined=_pr_joined, PAGERANK_SQL=PAGERANK_SQL, rollup=rollup, gapfill=gapfill, lang_cases=lang_cases, lang_max=lang_max, lang_ties=lang_ties, lang_pick=lang_pick)
    out: dict[str, str] = {}
    for part in (_part_events, _part_relational, _part_docs,
                 _part_transcripts, _part_emb_media):
        out.update(part(**ctx))
    return out
