"""Randomized differential testing: synthesize small random events
corpora (including degenerate shapes the fixed sf0.01 corpus never
exercises — single user, heavy ts ties, constant values) and check a
spread of oracle-paired queries against their own DuckDB twins on the
SAME random table.  This reuses the production query + oracle pair
verbatim — only the input changes — so a pass means the parity holds as
a property, not as a coincidence of one corpus."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import assert_frames_match, to_pdf

# events-only oracle-paired queries cheap enough to fuzz
QUERIES = [
    "events_rollup_1h",
    "events_window_pairs",
    "events_xicor",
    "events_kendall_w",
    "events_running_sum",
    "events_active_users",
    "events_new_returning",
    "events_session_conversion",
    "events_funnel_latency",
    "events_mase",
    "events_poincare",
    "events_hrv",
    "events_auc_by_user",
    "events_anova_f",
    "events_weekly_profile",
    "events_k_anonymity",
    "events_priority_sample",
    "events_cusum",
    "events_value_delta",
    "events_percent_rank",
    "events_burstiness",
    "events_lag1_autocorr",
    "events_type_transitions",
    "events_type_cond_entropy",
    "events_benford",
    "events_changepoint",
    "events_drawdown",
    "events_mad_per_user",
    "events_spearman_trend",
    "events_kendall_tau",
    "events_mann_kendall",
    "events_friedman_types",
    "events_cliffs_delta",
    "events_durbin_watson",
    "events_yuen_t",
    "events_seasonal_mk",
    "events_weekend_cliffs",
    "events_median_test",
    "events_type_cliffs_matrix",
    "events_mode_type",
    "events_value_histogram",
    "events_gini_users",
    "events_record_highs",
    "events_stl_strength",
    "events_ljung_box",
    "events_runs_test",
    "events_hour_entropy",
    "events_psi_daily",
    "events_out_of_order",
    "events_trimmed_mean",
    "events_session_type_pairs",
    "events_user_lifetime",
    "events_debounce_1m",
    "events_ewma",
    "events_holt_forecast",
    "events_peak_detect",
    "events_rr_intervals",
    "events_seasonal_outliers",
    "events_daily_type_entropy",
    "events_arch_effect",
    "events_avg_precision",
    "events_expectations",
    "events_value_ecdf",
    "events_tail_value_share",
    "events_granger",
    "events_hurst",
    "events_hill_tail",
    "events_rolling_p90",
    "events_survival_km",
    "events_ab_ztest",
    "events_logrank",
    "events_cum_hazard",
    "events_type_value_mi",
    "events_cuped",
    "events_recs_by_lift",
    "events_ece",
    "events_brier",
    "events_gains",
    "events_wilson_ci",
    "events_lead_lag",
    "events_target_encoding",
    "events_rate_limit",
    "events_top_paths",
    "events_return_level",
    # post-_dd_round6 additions: ops free of order-dependent float sums
    # (counts, md5 splits, min/max/first/last, quantile_disc picks,
    # exact ranks, single-value divisions)
    "events_one_hot",
    "events_distinct_users_1h",
    "events_first_per_key",
    "events_latest_per_key",
    "events_segment_runs",
    "events_hash_split",
    "events_stratified_split",
    "events_top_types_per_user",
    "events_type_counts",
    "events_error_rate_1d",
    "events_funnel",
    "events_funnel_24h",
    "events_cohort_retention",
    "events_retention_1h",
    "events_sessionize_30m",
    "events_m4_1h",
    "events_user_quantiles",
    "events_ks_test",
    "events_mannwhitney_u",
    "events_theil_sen",
    "events_grouping_sets",
    # 4n wave: ordered folds (page-hinkley), exact int-cent moments
    # (adf/welch/tukey) and exact-count ranking folds (ndcg)
    "events_page_hinkley",
    "events_adf",
    "events_welch_ttest",
    "events_tukey_hsd",
    "events_ndcg",
    # 4p wave: exact int64 step-1 moments (cointegration), bit-exact
    # ewm==list_reduce chains (croston)
    "events_cointegration",
    "events_croston",
    # 4q wave: int-cent extreme studentization
    "events_grubbs",
    # 4r wave: distinct-window integer arithmetic
    "events_availability",
    # 4s wave: dense-grid trailing moments; int-cent cohort cumsum
    "events_rolling_corr",
    "events_cohort_ltv",
    # 4t wave: SES==list_reduce + exact-moment drift; integer rank cut
    "events_theta",
    "events_lorenz",
    # 4u wave: welch tree on the derived ISO-weekend flag
    "events_weekend_effect",
    # 4v wave: sequential mid-state marginalization
    "events_two_step_transitions",
    # 4w wave: exact-µs gap quantile_disc picks
    "events_interarrival_quantiles",
    # 4z wave: 1/k credits folded in (pid, cid) order
    "events_linear_attribution",
    # 5a wave: dense-grid lag moments
    "events_weekly_acf",
    # 5b wave: gaps-and-islands streaks
    "events_activity_streaks",
    # 5c wave: per-type quantile_disc picks
    "events_value_deciles",
    # 5d wave: composite daily health (exact distinct + p95 + WoW lag)
    "events_daily_health",
    # 5e: sign census over the rounded slope
    "events_trend_census",
    # 5h: prefix-fold EWMA backtest; exact consecutive-pair counts
    "events_forecast_backtest",
    "events_type_persistence",
    # 5k: daily type-mix chi-square (the category_mix_drift grid fold)
    "events_type_mix_drift",
    # 5l: chi2 + Cramér's V + Theil's U contingency fold
    "events_type_weekday_assoc",
]

SHAPES = [
    # (seed, n_rows, n_users, ts tie probability, constant values?)
    (1, 3000, 40, 0.0, False),
    (2, 2000, 1, 0.5, False),     # single mega user, many ts ties
    (3, 1500, 200, 0.0, True),    # constant values (zero variance)
    (4, 1200, 30, 0.2, False),    # everything inside ONE hour, heavy ties
]


def _synth_events(tmpdir: str, seed: int, n: int, users: int,
                  tie_p: float, const: bool) -> str:
    rng = np.random.default_rng(seed)
    # span ~1 week (or 1 hour for shape4): keeps interarrival magnitudes
    # ≤ ~1e6 s — beyond that, 6-decimal rounding of a std needs > 15
    # significant digits, which NEITHER side's float64 summation order
    # can guarantee (documented capacity boundary, not an engine bug)
    span = 3_600_000_000 if seed == 4 else 604_800_000_000
    ts_us = np.sort(rng.integers(1_700_000_000_000_000,
                                 1_700_000_000_000_000 + span, n))
    if tie_p > 0:
        dup = rng.random(n) < tie_p
        ts_us[dup] = ts_us[np.maximum(np.flatnonzero(dup) - 1, 0)]
    t = pa.table({
        # event_id is the PK the (ts, event_id) tiebreak contract assumes
        # unique — duplicate ids are out of contract, so not fuzzed
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, users + 1, n)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "signup", "error"], n)),
        # full-precision doubles: 2-decimal values make window means land
        # EXACTLY on x.xxxxxx5 half-boundaries, where the 6-decimal round
        # direction depends on the last bit of the (order-dependent) float
        # sum — an inherent knife edge the engine's money paths avoid with
        # int cents, and not a parity property worth asserting
        "value": pa.array(np.full(n, 7.25) if const
                          else rng.normal(50, 20, n)),
        "props": pa.array(["{}"] * n),
    })
    d = os.path.join(tmpdir, f"fuzz_{seed}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__

    return __ray_entry__


@pytest.mark.parametrize("shape", SHAPES, ids=[f"shape{s[0]}" for s in SHAPES])
@pytest.mark.parametrize("name", QUERIES)
def test_fuzz_query_matches_oracle(tmp_path_factory, entrymod, shape, name):
    seed, n, users, tie_p, const = shape
    base = str(tmp_path_factory.getbasetemp())
    sf = _synth_events(base, seed, n, users, tie_p, const)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')")
    actual = to_pdf(entrymod.queries()[name](sf))
    expected = con.sql(entrymod.oracle_sql()[name]).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)


# ---------------------------------------------------------------------------
# transcript-op fuzz: random corpora (varying seed/size, incl. heavy ts
# ties), oracle SQL repointed from the pinned corpus to the fuzz corpus
# ---------------------------------------------------------------------------

T_QUERIES = ["transcripts_len_cliffs", "transcripts_alternation_runs",
             "transcripts_latency_by_hour", "transcripts_duration_stats",
             "transcripts_prompt_ols", "transcripts_reply_latency",
             "transcripts_escalation", "transcripts_position_profile",
             "transcripts_tool_effect", "transcripts_conv_features",
             "transcripts_token_gini", "transcripts_tool_km",
             "transcripts_cache_savings", "transcripts_self_repetition",
             "transcripts_abandonment", "transcripts_tool_adoption",
             "transcripts_readability_by_role", "transcripts_echo_rate",
             "transcripts_prompt_curve", "transcripts_depth_curve"]


def _synth_transcripts(tmpdir: str, seed: int, n: int, ties: bool) -> str:
    rng = np.random.default_rng(seed)
    n_convs = max(n // 12, 1)
    conv = np.sort(rng.integers(0, n_convs, n))
    order = np.zeros(n, dtype=np.int32)
    for i in range(1, n):
        order[i] = order[i - 1] + 1 if conv[i] == conv[i - 1] else 0
    ts = np.sort(rng.integers(1_700_000_000_000_000,
                              1_700_100_000_000_000, n))
    if ties:
        dup = rng.random(n) < 0.4
        ts[dup] = ts[np.maximum(np.flatnonzero(dup) - 1, 0)]
    roles = np.where(order % 2 == 0, "user", "assistant").astype(object)
    tool_rows = rng.random(n) < 0.07
    roles[tool_rows] = "tool"
    words = rng.integers(0, 40, n)
    text = np.array([" ".join(["w"] * int(w)) for w in words], dtype=object)
    tools = np.where(tool_rows,
                     rng.choice(["bash", "sql", "calc"], n), "")
    t = pa.table({
        "conv_id": pa.array([f"c{c}" for c in conv], pa.string()),
        "turn_idx": pa.array(order, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tools.astype(object), pa.string()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    d = os.path.join(tmpdir, f"tfuzz_{seed}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return d


@pytest.mark.parametrize("shape", [(11, 2500, False), (12, 1800, True)],
                         ids=["tshape1", "tshape2-ties"])
@pytest.mark.parametrize("name", T_QUERIES)
def test_fuzz_transcript_query_matches_oracle(tmp_path_factory, entrymod,
                                              shape, name):
    import re

    seed, n, ties = shape
    base = str(tmp_path_factory.getbasetemp())
    d = _synth_transcripts(base, seed, n, ties)
    sql = entrymod.oracle_sql()[name]
    # repoint the pinned corpus read at the fuzz corpus
    sql, n_sub = re.subn(r"read_parquet\('[^']+/\*\.parquet'\)",
                         f"read_parquet('{d}/*.parquet')", sql)
    assert n_sub >= 1
    # the engine side of these queries pins the corpus too — drive the
    # underlying stage with the fuzz table the same way the query does
    import ray.data

    from s_tsfe_dl_ray.stages.dialog import (
        conversation_duration_stats, escalation_share, position_profile,
        prompt_response_ols, reply_latency, reply_latency_by_hour)

    ds = ray.data.read_parquet(f"{d}/part-0.parquet")
    if name == "transcripts_latency_by_hour":
        out = reply_latency_by_hour(ds, order_by=["ts", "turn_idx"])
    elif name == "transcripts_duration_stats":
        out = conversation_duration_stats(ds)
    elif name == "transcripts_prompt_ols":
        out = prompt_response_ols(ds)
    elif name == "transcripts_escalation":
        out = escalation_share(ds)
    elif name == "transcripts_position_profile":
        out = position_profile(ds)
    elif name == "transcripts_tool_effect":
        from s_tsfe_dl_ray.stages.dialog import tool_effect
        out = tool_effect(ds)
    elif name == "transcripts_conv_features":
        from s_tsfe_dl_ray.stages.dialog import conversation_features
        out = conversation_features(ds)
    elif name == "transcripts_tool_km":
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import survival_km

        ev = ds.map_batches(
            lambda t: _pa.table({
                "conv_id": t["conv_id"], "ts": t["ts"],
                "event": _pc.equal(t["role"], "tool")}),
            batch_format="pyarrow")
        out = survival_km(ev, key="conv_id", ts_col="ts",
                          event_col="event",
                          bucket_us=60_000_000).sort("bucket")
    elif name == "transcripts_token_gini":
        import pyarrow as _pa

        from s_tsfe_dl_ray.functions.derive import token_count
        from s_tsfe_dl_ray.stages.activity import activity_gini

        def _derive(t: "_pa.Table") -> "_pa.Table":
            return _pa.table({"role": t["role"], "conv_id": t["conv_id"],
                              "_tok": token_count(t["text"])})

        out = activity_gini(
            ds.map_batches(_derive, batch_format="pyarrow"),
            group_col="role", key_col="conv_id",
            weight_col="_tok").map_batches(
            lambda df: df.rename(columns={"n_users": "n_convs",
                                          "total_events": "total_tokens"}),
            batch_format="pandas")
    elif name == "transcripts_cache_savings":
        import numpy as _np
        import pyarrow as _pa

        from s_tsfe_dl_ray.stages.dialog import context_cost

        def _fin(t: "_pa.Table") -> "_pa.Table":
            cost = t["context_cost"].to_numpy(
                zero_copy_only=False).astype(_np.float64)
            total = t["total_chars"].to_numpy(
                zero_copy_only=False).astype(_np.float64)
            with _np.errstate(invalid="ignore", divide="ignore"):
                ratio = (cost - total) / cost
            ratio = _np.where(_np.isfinite(ratio), ratio, _np.nan)
            return _pa.table({
                "conv_id": t["conv_id"], "n_turns": t["n_turns"],
                "billed_full_history": t["context_cost"],
                "billed_prefix_cache": t["total_chars"],
                "savings_ratio": _pa.array(ratio, _pa.float64()),
            })

        out = context_cost(ds).map_batches(_fin, batch_format="pyarrow")
    elif name == "transcripts_alternation_runs":
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.robust import binary_runs_test

        def _roleseq(t: "_pa.Table") -> "_pa.Table":
            keep = _pc.is_in(t["role"],
                             value_set=_pa.array(["user", "assistant"]))
            sub = t.filter(keep)
            return _pa.table({
                "conv_id": sub["conv_id"], "ts": sub["ts"],
                "turn_idx": sub["turn_idx"],
                "b": _pc.cast(_pc.equal(sub["role"], "assistant"),
                              _pa.int64())})

        out = binary_runs_test(
            ds.map_batches(_roleseq, batch_format="pyarrow"),
            key="conv_id", flag_col="b",
            order_by=["ts", "turn_idx"]).sort("conv_id")
    elif name == "transcripts_len_cliffs":
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        def _lenpairs(t: "_pa.Table") -> "_pa.Table":
            keep = _pc.is_in(t["role"],
                             value_set=_pa.array(["user", "assistant"]))
            sub = t.filter(keep)
            return _pa.table({
                "g": _pc.cast(_pc.equal(sub["role"], "assistant"),
                              _pa.int64()),
                "v": _pc.cast(_pc.utf8_length(sub["text"]), _pa.int64())})

        out = cliffs_delta(ds.map_batches(_lenpairs,
                                          batch_format="pyarrow"),
                           group_col="g", value_col="v")
    elif name == "transcripts_self_repetition":
        from s_tsfe_dl_ray.stages.dialog import self_repetition

        out = self_repetition(ds)
    elif name == "transcripts_abandonment":
        from s_tsfe_dl_ray.stages.dialog import abandonment_by_hour

        out = abandonment_by_hour(ds)
    elif name == "transcripts_tool_adoption":
        from s_tsfe_dl_ray.stages.dialog import tool_adoption

        out = tool_adoption(ds)
    elif name == "transcripts_readability_by_role":
        from s_tsfe_dl_ray.stages.dialog import readability_by_role

        out = readability_by_role(ds)
    elif name == "transcripts_echo_rate":
        from s_tsfe_dl_ray.stages.dialog import echo_rate

        out = echo_rate(ds)
    elif name == "transcripts_prompt_curve":
        from s_tsfe_dl_ray.stages.dialog import prompt_response_curve

        out = prompt_response_curve(ds)
    elif name == "transcripts_depth_curve":
        import numpy as _np
        import pandas as _pd

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        counts = grouped_aggregate(
            ds.map_batches(lambda t: t.select(["conv_id"]),
                           batch_format="pyarrow"),
            keys=["conv_id"], aggs={"n": ("conv_id", "count")})

        def _fin(df):
            ks = _np.array([2, 5, 10, 20, 50], _np.int64)
            n = df["n"].to_numpy(_np.int64) if len(df) else \
                _np.zeros(0, _np.int64)
            tot = _np.float64(len(n))
            reach = _np.array([(n >= kk).sum() for kk in ks], _np.int64)
            with _np.errstate(invalid="ignore", divide="ignore"):
                share = reach.astype(_np.float64) / tot
            return _pd.DataFrame({
                "threshold": ks, "n_convs_reaching": reach,
                "share": _np.where(_np.isfinite(share), share,
                                   _np.nan)})

        out = counts.repartition(1).map_batches(
            _fin, batch_format="pandas", batch_size=None)
    else:
        out = reply_latency(ds, conv_col="conv_id", ts_col="ts",
                            order_by=["ts", "turn_idx"])
    con = duckdb.connect()
    actual = to_pdf(entrymod._round_floats(out))
    expected = con.sql(sql).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)


# ---------------------------------------------------------------------------
# docs-text fuzz: adversarial text shapes (empties, whitespace runs,
# punctuation salad, unicode incl. CJK/accents) against the RE2 twins
# ---------------------------------------------------------------------------

D_QUERIES = [
    "docs_token_stats",
    "docs_quality",
    "docs_lang_id",
    "docs_normalize",
    "docs_token_entropy",
    "docs_lexical_diversity",
    "docs_vocab_stats",
    "docs_zipf_slope",
    "docs_bigram_top20",
    "docs_exact_dedup",
    "docs_charlm_logloss",
    "docs_dup_rate_by_source",
    # 4q wave: RE2 word/sentence/syllable counts
    "docs_readability",
    # 4r wave: exact-count log-odds with token-asc tiebreak
    "docs_distinctive_tokens",
    # 4s wave: exact int64 dots/norms over the shared vocabulary
    "docs_style_cosine",
    # 4t wave: pooled-grid ECDF distances
    "docs_length_ks",
    # 4v wave: exact pass counts over the bit-identical quality tree
    "docs_quality_pass_rate",
    # 4y wave: sequential OLS folds over the cumulative vocab curve
    "docs_heaps_law",
    # 5f wave: PMI over exact counts, identical float ordering
    "docs_collocations",
    # 5g: exact counts + struct argmax dominance
    "docs_lang_mix",
    # 5n: first-seen trigram share (min-doc flag, int counts)
    "docs_novelty_rate",
    # 5o: prefix-blocked byte-DP levenshtein pairs (planted dups => 0s)
    "docs_editdist_pairs",
    # 5s: closure over those pairs + blocking-selectivity audit
    "docs_editdist_clusters",
    "docs_block_selectivity",
    # 5w: kruskal reuse over n_chars (exact-int midranks)
    "docs_lang_length_kw",
]

_WORDS = ["the", "fast", "data", "merge", "la", "le", "und", "der",
          "el", "los", "a", "de"]
_PUNCT = [",", ".", "!!", "?", ";;", "(", ")", "--", "\"", "'"]
_UNICODE = ["héllo", "naïve", "Ωμέγα", "数据", "处理", "émigré", "ß"]


def _synth_docs(tmpdir: str, seed: int, unicode_heavy: bool) -> str:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(400):
        kind = rng.integers(0, 10)
        if kind == 0:
            texts.append("")                       # empty
        elif kind == 1:
            texts.append("   ")                    # whitespace only
        elif kind == 2:
            texts.append(" ".join(rng.choice(_PUNCT, 12)))  # punct salad
        else:
            pool = _WORDS + (_UNICODE if unicode_heavy else [])
            n_w = int(rng.integers(1, 60))
            toks = list(rng.choice(pool, n_w))
            if rng.random() < 0.3:                 # inject punctuation
                toks.insert(0, rng.choice(_PUNCT))
            texts.append(" ".join(toks))
    # planted duplicates for the dedup pair
    texts[5] = texts[3]
    texts[7] = texts[3]
    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 400, pa.string()),
        "source": pa.array([f"src{i % 4}" for i in range(400)], pa.string()),
        "n_chars": pa.array(np.array([len(x) for x in texts],
                                     dtype=np.int64)),
    })
    d = os.path.join(tmpdir, f"dfuzz_{seed}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("shape", [(21, False), (22, True)],
                         ids=["dshape-ascii", "dshape-unicode"])
@pytest.mark.parametrize("name", D_QUERIES)
def test_fuzz_docs_query_matches_oracle(tmp_path_factory, entrymod,
                                        shape, name):
    seed, uheavy = shape
    base = str(tmp_path_factory.getbasetemp())
    sf = _synth_docs(base, seed, uheavy)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    actual = to_pdf(entrymod.queries()[name](sf))
    expected = con.sql(entrymod.oracle_sql()[name]).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)


# ---------------------------------------------------------------------------
# embeddings fuzz: zero vectors, planted exact duplicates, extreme scales
# ---------------------------------------------------------------------------

E_QUERIES = [
    "emb_quantize_error",
    "emb_norm_stats",
    "emb_label_centroids",
    "emb_knn_top10",
    "emb_neardup_04",
    "emb_cosine_centroid",
]


def _synth_emb(tmpdir: str, seed: int, hard: bool) -> str:
    rng = np.random.default_rng(seed)
    n, d = 250, 16
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    if hard:
        # degenerate vectors live OUTSIDE the default query-id range
        # (first 10 ids): a zero vector's cosine is undefined and the
        # two sides pick different conventions (engine 0, DuckDB -1) —
        # as a NEIGHBOR it ranks below top-k either way, so parity
        # still exercises it in every distance computation
        x[100] = 0.0                     # zero vector (zero norm)
        x[101] = x[2]                    # exact duplicate of a query
        x[102] = x[2] * 1000.0           # same direction, huge scale
        x[103] = np.full(d, 1e-8, np.float32)  # near-zero norm
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x)),
        "label": pa.array((np.arange(n) % 5).astype(np.int32)),
    })
    dd = os.path.join(tmpdir, f"efuzz_{seed}")
    os.makedirs(dd, exist_ok=True)
    pq.write_table(t, os.path.join(dd, "embeddings.parquet"))
    return dd


@pytest.mark.parametrize("shape", [(31, False), (32, True)],
                         ids=["eshape-random", "eshape-degenerate"])
@pytest.mark.parametrize("name", E_QUERIES)
def test_fuzz_emb_query_matches_oracle(tmp_path_factory, entrymod,
                                       shape, name):
    seed, hard = shape
    base = str(tmp_path_factory.getbasetemp())
    sf = _synth_emb(base, seed, hard)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')")
    actual = to_pdf(entrymod.queries()[name](sf))
    expected = con.sql(entrymod.oracle_sql()[name]).df()
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)
