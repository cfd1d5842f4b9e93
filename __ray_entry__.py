"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline smoke over /root/testdata/sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for every SQL-expressible query; rows-only
queries (MinHash/SimHash LSH, IVF kNN, codec round-trip, transcript
pipelines over synthesized input) have no entry here by design.

Ray is initialised by the driver BEFORE this module is imported: nothing
below calls ``ray.init()``/``ray.shutdown()``.

Float policy: every oracle-paired float column is rounded to 6 decimals on
BOTH sides (pyarrow ``half_towards_infinity`` == DuckDB ``round`` half-away
-from-zero) so last-ulp association differences can't flip a value hash.
Residual risk (accepted, per round-2 advice): queries whose float64 sums
are irreducibly float (events_attention_pool exp-sums, events_value_variance,
events_ensemble_mean) sum partials in engine tree order vs DuckDB's
sequential order; a value landing exactly on a ...5 boundary at the 7th
decimal could flip the 6-decimal rounding.  Money/int-derivable sums are
decomposed onto exactly-summable bases (scaled int64 / decimal128) instead;
for the exp-sum/variance cases no exact base exists, so the risk is
documented here rather than hidden.

Driver row cap: the round-2 driver recorded exactly the first 50 entries
of ``queries()`` — keep oracle-paired queries within the first 50 (see the
ordering note inside ``queries()``).  With 141 registered queries (118
oracle-paired) the tail is ordered by information value: demoted veterans
with r1–r3 driver rows on record first, then the round-3/round-4 waves
(all oracle-paired, verified at driver scale by
tests/test_entry_contract.py), then the pytest-covered rows-only queries
(minhash dedup, IVF, EWMA, dup-words, mixture sampling, embedding-LSH
recall probe, simhash, rolling fingerprint, LTTB, media demos).  EWMA /
dup-words / mixture DO have exact DuckDB twins, but those live in pytest
(tests/test_ewma.py, tests/test_text.py) rather than ``oracle_sql()`` so
the driver never sees a registered oracle it cannot check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

_LANGS = {  # keep in sync with s_tsfe_dl_ray.stages.text._LANG_MARKERS
    "en": "the|and|of|is|was|with|that|this",
    "de": "der|die|das|und|ist|nicht|mit|ein",
    "fr": "le|la|les|et|est|une|pas|pour",
    "es": "el|los|las|es|una|por|que|para",
}
_STOP = "the|a|an|and|of|to|in|is|it|that"


def _dd_round6(x: "np.ndarray") -> "np.ndarray":
    """Bit-exact emulation of DuckDB ``round(x, 6)`` on DOUBLE:
    ``std::round(x * 1e6) / 1e6``, returning the input on inf/nan
    results.  std::round is half-away-from-zero computed EXACTLY — NOT
    ``floor(x*1e6 + 0.5)`` (that bumps values whose fraction is the
    double just below .5) and NOT ``pc.round(..., half_towards_infinity)``
    (1-ulp disagreements, e.g. 50.846000000000004 stays put under
    pyarrow but re-quantizes to 50.846 under DuckDB).  The fraction
    test is exact because ``y - floor(y)`` / ``ceil(y) - y`` are exact
    float ops (Sterbenz).  Verified bit-identical to DuckDB on 1.1M
    adversarial doubles incl. ±inf, NaN, 1e308, exact-.5 fractions at
    every magnitude."""
    y = x * 1e6
    f = np.floor(y)
    c = np.ceil(y)
    with np.errstate(invalid="ignore"):
        pos = f + (y - f >= 0.5)
        neg = c - (c - y >= 0.5)
        r = np.where(y >= 0, pos, neg) / 1e6
    return np.where(np.isfinite(r), r, x)


def _round_floats(ds):
    """Round all float64 columns to 6 decimals, matching DuckDB round
    bit-for-bit (see :func:`_dd_round6`); nulls stay nulls."""
    from ray.data import Dataset

    def rb(t: pa.Table) -> pa.Table:
        for i, f in enumerate(t.schema):
            # Ray's pandas→arrow block conversion types an ALL-NaN float
            # column as arrow `null`; restore it to float64 so degenerate
            # blocks keep a stable schema (fuzz shape3 regression)
            if pa.types.is_floating(f.type) or pa.types.is_null(f.type):
                col = pc.cast(t[f.name], pa.float64()).combine_chunks()
                nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
                vals = col.to_numpy(zero_copy_only=False)
                rounded = _dd_round6(vals)
                t = t.set_column(
                    i, f.name,
                    pa.array(rounded, pa.float64(),
                             mask=nulls if nulls.any() else None),
                )
        return t

    if isinstance(ds, Dataset):
        return ds.map_batches(rb, batch_format="pyarrow")
    if isinstance(ds, pd.DataFrame):
        return rb(pa.Table.from_pandas(ds, preserve_index=False))
    return rb(ds)


def _transcripts_for(sf_dir: str) -> str:
    """Deterministic synthesized transcript corpus for the transcript
    queries — PINNED to the driver's correctness scale (sf=0.01 → 60k
    turns) regardless of ``sf_dir``: ``oracle_sql()`` strings must
    reference one concrete parquet path, so query and oracle always read
    the SAME corpus.  Throughput scaling is bench.py's job (20M turns)."""
    from s_tsfe_dl_ray.synth import transcripts_parquet

    return transcripts_parquet(n_turns=60_000, seed=42)


def _events_gapfill(sf_dir: str, mode: str):
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    return gapfill(
        events_tier(sf_dir, "1h"),
        keys=["user_id"], tier="1h",
        count_cols=["n_events"], sum_cols=["value_sum"],
        null_cols=["value_min", "value_max"], carry_cols=["value_mean"],
        mode=mode,
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: full tier cascade + gap-fill over sf0.001 events."""
    return _events_gapfill("/root/testdata/sf0.001", "ffill")


def queries() -> dict[str, Callable[[str], Any]]:
    from s_tsfe_dl_ray.pipelines.events_rollup import (
        events_tier, events_tiers, events_top_windows, events_type_rate,
    )
    from s_tsfe_dl_ray.pipelines.relational import pricing_summary
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers
    from s_tsfe_dl_ray.sources.parquet import read_events, read_table
    from s_tsfe_dl_ray.stages.dedup import (
        exact_dedup_ids, first_per_key, minhash_dedup_pairs, simhash_signatures,
    )
    from s_tsfe_dl_ray.stages.gapfill import gapfill
    from s_tsfe_dl_ray.stages.scan import ordered_scan
    from s_tsfe_dl_ray.stages.sessionize import sessionize
    from s_tsfe_dl_ray.stages.similarity import (
        embedding_neardup_pairs, knn_bruteforce, knn_ivf,
    )
    from s_tsfe_dl_ray.stages.text import (
        lang_id, md5_fingerprint, quality_score, rolling_fingerprint, token_stats,
    )
    from s_tsfe_dl_ray.state.encode import decode_series, encode_series

    def q_events_rollup_1m(sf):
        return _round_floats(events_tier(sf, "1m"))

    def q_events_rollup_1h(sf):
        return _round_floats(events_tiers(sf, ("1m", "1h"))["1h"])

    def q_events_rollup_1d(sf):
        return _round_floats(events_tiers(sf, ("1m", "1h", "1d"))["1d"])

    def q_events_gapfill_ffill_1h(sf):
        return _round_floats(_events_gapfill(sf, "ffill"))

    def q_events_gapfill_interp_1h(sf):
        return _round_floats(_events_gapfill(sf, "interp"))

    def q_events_error_rate_1d(sf):
        return _round_floats(events_type_rate(sf, event_type="error", tier="1d"))

    def q_events_top20_windows_1h(sf):
        return _round_floats(events_top_windows(sf, tier="1h", k=20))

    def q_events_sessionize_30m(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(
            sessionize(ds, keys=["user_id"], ts_col="ts",
                       order_by=["ts", "event_id"], gap="30m")
        )

    def q_events_running_sum(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"running_sum": ("value", "cumsum"),
                   "running_max": ("value", "cummax")},
        ))

    def q_events_value_delta(sf):
        """SQL lag/diff as ordered-scan kinds (stages/scan.py) — the
        engine's first-difference feature for change detection; carries
        across salt-chunk boundaries in mega-key mode (test_salted)."""
        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"value_prev": ("value", "lag"),
                   "value_delta": ("value", "delta")},
        ))

    def q_events_trailing_1h(sf):
        """Trailing RANGE window (continuous sibling of the tumbling
        rollup): per event, sum/count over the user's last hour —
        offset-packed searchsorted + prefix sums, no per-key loop
        (stages/scan.trailing_agg)."""
        from s_tsfe_dl_ray.stages.scan import trailing_agg

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(trailing_agg(
            ds, key="user_id", ts_col="ts", value_col="value",
            window_us=3_600_000_000,
            sum_col="value_sum_1h", count_col="n_events_1h",
        ))

    def q_events_first_per_key(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(first_per_key(
            ds, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
        ))

    def q_events_latest_per_key(sf):
        """Late-data upsert: last-writer-wins per (user, type) — replays
        and corrections collapse to the newest version."""
        from s_tsfe_dl_ray.stages.dedup import latest_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(latest_per_key(
            ds, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
        ))

    def q_lineitem_pricing_summary(sf):
        return _round_floats(pricing_summary(sf))

    def q_events_rolling_mean5(sf):
        from s_tsfe_dl_ray.stages.transform import rolling_mean

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_mean(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=5, out_col="value_ma5",
        ))

    def q_events_ewma(sf):
        """Per-user EWMA (alpha 0.3) in explicit (ts, event_id) order —
        the recency-weighted smoother for drift/anomaly baselines.
        Bitwise-identical to the DuckDB recursive-CTE twin (also pinned
        by pytest tests/test_ewma.py, incl. salted==unsalted)."""
        from s_tsfe_dl_ray.stages.transform import ewma

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ewma(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", alpha=0.3, out_col="value_ewma",
        ))

    def q_docs_mixture_sample(sf):
        """Deterministic source-mixture downsampling (LLM data-mixing
        step): md5 hex-threshold per source, row-exact reproducible
        against the DuckDB md5 twin (also pinned by pytest
        tests/test_text.py, incl. rate-landing checks)."""
        from s_tsfe_dl_ray.stages.transform import mixture_sample

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "source"])
        return mixture_sample(
            ds, id_col="doc_id", source_col="source",
            rates={"src0": 0.25, "src1": 0.75}, default_rate=0.5,
        )

    def q_events_standardize(sf):
        from s_tsfe_dl_ray.stages.transform import standardize

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(standardize(ds, cols=["value"]))

    def q_events_one_hot(sf):
        from s_tsfe_dl_ray.stages.transform import one_hot

        ds = read_events(sf, columns=["event_id", "event_type"])
        return one_hot(ds, col="event_type",
                       categories=["click", "view", "purchase", "signup", "error"])

    def q_events_segment_runs(sf):
        from s_tsfe_dl_ray.stages.sessionize import segment_runs

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts"])
        return segment_runs(ds, keys=["user_id"], value_col="event_type",
                            ts_col="ts", order_by=["ts", "event_id"])

    def q_events_hash_split(sf):
        from s_tsfe_dl_ray.stages.transform import hash_split

        ds = read_events(sf, columns=["event_id"])
        return hash_split(ds, id_col="event_id", test_fraction=0.2)

    def q_events_stratified_split(sf):
        from s_tsfe_dl_ray.stages.transform import stratified_hash_split

        ds = read_events(sf, columns=["event_id", "event_type"])
        return stratified_hash_split(
            ds, id_col="event_id", strata_col="event_type", test_fraction=0.2
        )

    def q_events_ensemble_mean(sf):
        """Ensemble execution (KimMinGu analog, models_keras.py:1169-1242):
        three member scorers over ONE input via independent actor pools,
        union, per-row soft-vote mean."""
        from s_tsfe_dl_ray.pipelines.ensemble import ensemble_mean, ensemble_scores

        # defined in function scope so cloudpickle ships the actor class
        # by VALUE — workers need not import this module under its
        # driver-side name
        class _EnsembleMember:
            """Deterministic demo scorer (stands in for a trained model's
            forward pass); state built once per actor."""

            def __init__(self, mode: str):
                self.mode = mode

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                import numpy as np

                v = b["value"].to_numpy(dtype="float64")
                if self.mode == "double":
                    s = 2.0 * v
                elif self.mode == "shift":
                    s = v + 10.0
                else:
                    s = np.sqrt(np.abs(v))
                return pd.DataFrame({"event_id": b["event_id"], "score": s})

        ds = read_events(sf, columns=["event_id", "value"])
        scored = ensemble_scores(ds, {
            "double": (_EnsembleMember, {"mode": "double"}),
            "shift": (_EnsembleMember, {"mode": "shift"}),
            "root": (_EnsembleMember, {"mode": "root"}),
        })
        return _round_floats(ensemble_mean(scored, id_cols=["event_id"]))

    def q_events_asof_purchase(sf):
        from s_tsfe_dl_ray.stages.asof import asof_join_self

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(asof_join_self(
            ds, key="user_id", ts_col="ts",
            left_filter=("event_type", "click"),
            right_filter=("event_type", "purchase"),
            right_value_cols=["value"],
            order_tiebreak="event_id",
        ))

    def q_events_retention_1h(sf):
        from s_tsfe_dl_ray.stages.rollup import apply_retention

        tier = events_tier(sf, "1h")
        return _round_floats(apply_retention(
            tier, keep_from="2024-01-15T00:00:00"
        ))

    def q_orders_lineitem_join(sf):
        """Partitioned hash join of two large tables (orders ⋈ lineitem)
        with a grouped revenue rollup on top."""
        import ray.data

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.join import hash_join

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
        )
        lineitem = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )
        joined = hash_join(orders, lineitem, left_on="o_orderkey", right_on="l_orderkey")

        def rev_i(t: pa.Table) -> pa.Table:
            # exact money: price/discount have ≤2 decimals → int64 cents;
            # revenue_i = price_i*(100-disc_i) at scale 1e4 sums exactly
            price_i = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
            disc_i = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64())
            return t.append_column(
                "revenue_i", pc.multiply(price_i, pc.subtract(pa.scalar(100, pa.int64()), disc_i))
            )

        joined = joined.map_batches(rev_i, batch_format="pyarrow")
        agg = grouped_aggregate(
            joined, keys=["o_orderstatus"],
            aggs={"n_items": ("revenue_i", "count"), "revenue_sum_i": ("revenue_i", "sum")},
        )

        def fin(t: pa.Table) -> pa.Table:
            s = pc.divide(pc.cast(t["revenue_sum_i"], pa.float64()), pa.scalar(10_000.0))
            return pa.table({
                "o_orderstatus": t["o_orderstatus"], "n_items": t["n_items"],
                "revenue_sum": s,
                "revenue_mean": pc.divide(s, pc.cast(t["n_items"], pa.float64())),
            })

        return _round_floats(agg.map_batches(fin, batch_format="pyarrow"))

    def q_events_type_counts(sf):
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_aggregate(
            ds, keys=["event_type"],
            aggs={
                "n_events": ("value", "count"),
                "value_sum": ("value", "sum"),
                "value_min": ("value", "min"),
                "value_max": ("value", "max"),
                "value_mean": ("value", "mean"),
            },
        ))

    def q_events_attention_pool(sf):
        """Attention-reweighting analog (reference §0: aggregate → weight
        → elementwise multiply; e.g. squeeze-excite/attention blocks):
        per-key softmax-weighted value pooling,
        out = Σ exp(v/100)·v / Σ exp(v/100), decomposed into associative
        sums via CustomAgg (the score is pre-scaled so exp() stays in
        range — same expression in the SQL twin)."""
        from s_tsfe_dl_ray.pipelines.relational import CustomAgg, grouped_aggregate

        ds = read_events(sf, columns=["user_id", "value"])

        def derive(t: pa.Table) -> pa.Table:
            es = pc.exp(pc.divide(t["value"], pa.scalar(100.0)))
            t = t.append_column("es", es)
            return t.append_column("esv", pc.multiply(es, t["value"]))

        ds = ds.map_batches(derive, batch_format="pyarrow")

        def fin(t: pa.Table):
            return pc.divide(t["__esv_sum"], t["__es_sum"])

        return _round_floats(grouped_aggregate(
            ds, keys=["user_id"],
            aggs={"n_events": ("value", "count")},
            custom={"value_attn": CustomAgg(
                bases=(("es", "sum"), ("esv", "sum")), finalize=fin,
            )},
        ))

    def q_events_sliding_features(sf):
        """Reference window-generator semantics (length=5, stride=3,
        full windows only) as per-window feature rows."""
        from s_tsfe_dl_ray.stages.slide import sliding_window_features

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(sliding_window_features(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            value_col="value", length=5, stride=3,
        ))

    def q_events_reverse_series(sf):
        from s_tsfe_dl_ray.stages.slide import reverse_series

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(reverse_series(
            ds, keys=["user_id"], order_by=["ts", "event_id"]
        ))

    def q_events_value_variance(sf):
        """Custom aggregate UDF injection (SURVEY.md §2.10): population
        variance + range as user-registered aggregates decomposed into
        associative bases (sum, sum-of-squares, count / min, max)."""
        from s_tsfe_dl_ray.pipelines.relational import CustomAgg, grouped_aggregate

        ds = read_events(sf, columns=["event_type", "value"])
        ds = ds.map_batches(
            lambda t: t.append_column("value_sq", pc.multiply(t["value"], t["value"])),
            batch_format="pyarrow",
        )

        def fin_var(t: pa.Table):
            n = pc.cast(t["__value_count"], pa.float64())
            mean = pc.divide(pc.cast(t["__value_sum"], pa.float64()), n)
            meansq = pc.divide(pc.cast(t["__value_sq_sum"], pa.float64()), n)
            return pc.subtract(meansq, pc.multiply(mean, mean))

        return _round_floats(grouped_aggregate(
            ds, keys=["event_type"],
            aggs={"n_events": ("value", "count")},
            custom={
                "value_var": CustomAgg(
                    bases=(("value", "sum"), ("value_sq", "sum"), ("value", "count")),
                    finalize=fin_var,
                ),
                "value_range": CustomAgg(
                    bases=(("value", "min"), ("value", "max")),
                    finalize=lambda t: pc.subtract(t["__value_max"], t["__value_min"]),
                ),
            },
        ))

    def q_media_decode_demo(sf):
        """Multimodal image features over REAL PNG decode (stdlib zlib +
        scanline unfiltering — stages/media.py png_decode): deterministic
        synthetic PNG corpus → actor-pool decode → pixel stats."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import decode_images, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        out = decode_images(media)
        return out.select_columns(["media_id", "pixel_mean", "pixel_std"])

    def q_media_audio_demo(sf):
        """Audio features over REAL WAV decode (stdlib wave → 16-bit PCM
        — stages/media.py wav_decode) + real DSP: RMS / ZCR / spectral
        centroid."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import decode_audio, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        return decode_audio(media)

    def q_media_frames_demo(sf):
        """Video frame-sampling plumbing: evenly-spaced frame indices from
        duration × fps (one row per sampled frame)."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import sample_video_frames, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        return sample_video_frames(media, n_frames=4)

    def q_docs_top_tokens(sf):
        """Distributed word-count → global top-50 tokens (per-batch
        vectorized explode+count combiner; only distinct (token, n)
        partials cross the shuffle)."""
        from s_tsfe_dl_ray.stages.text import top_tokens

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return top_tokens(ds, k=50)

    def q_docs_simhash_pairs(sf):
        """SimHash near-dup pairs (band 4x16 bits -> exact Hamming
        verify) - rows-only (the 64-bit hash isn't SQL-reproducible)."""
        from s_tsfe_dl_ray.stages.dedup import simhash_dedup_pairs

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return simhash_dedup_pairs(ds, id_col="doc_id", max_hamming=3)

    def q_docs_prep_pipeline(sf):
        """Composite LLM training-data prep: quality filter → language
        filter → exact dedup in one streaming dataflow (one row per
        distinct kept text, smallest doc_id wins)."""
        from s_tsfe_dl_ray.pipelines.docs_prep import prep_documents

        return _round_floats(prep_documents(
            f"{sf}/documents.parquet", min_quality=0.35, keep_langs=("en",)
        ))

    def q_docs_exact_dedup(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return exact_dedup_ids(ds, text_col="text", id_col="doc_id")

    def q_docs_token_stats(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(token_stats, batch_format="pyarrow")
        return _round_floats(out.select_columns(
            ["doc_id", "n_tokens", "n_chars_engine", "avg_token_len"]
        ))

    def q_docs_quality(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(quality_score, batch_format="pyarrow")
        return _round_floats(out.select_columns(
            ["doc_id", "stopword_ratio", "punct_ratio", "quality"]
        ))

    def q_docs_normalize(sf):
        """Canonical text form (whitespace collapse → lower → NFC) — the
        pre-dedup cleanup; SQL twin uses DuckDB nfc_normalize."""
        from s_tsfe_dl_ray.stages.text import normalize_text

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(normalize_text, batch_format="pyarrow")
        return out.select_columns(["doc_id", "text_norm"]).sort("doc_id")

    def q_docs_chars_quantiles(sf):
        """Exact per-source p50/p95/p99 of n_chars via the distributed
        value-histogram quantile op (shuffle carries one row per distinct
        (source, n_chars), never raw rows)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        ds = read_table(f"{sf}/documents.parquet", columns=["source", "n_chars"])
        return grouped_quantiles(
            ds, value_col="n_chars", keys=["source"],
            quantiles=(0.5, 0.95, 0.99),
        ).sort("source")

    def q_docs_lang_id(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return lang_id(ds).select_columns(["doc_id", "lang_pred"])

    def q_docs_fingerprint(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(md5_fingerprint, batch_format="pandas")
        return out.select_columns(["doc_id", "fingerprint"])

    def q_docs_ngram_jaccard(sf):
        from s_tsfe_dl_ray.stages.dedup import ngram_jaccard_pairs

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(ngram_jaccard_pairs(
            ds, id_col="doc_id", n=3, threshold=0.5
        ))

    def q_docs_chunk_windows(sf):
        """Context-window chunking: every document → overlapping 16-word
        windows at stride 8 (the training-sample construction step of an
        LLM data pipeline; per-row fan-out, no shuffle).  SQL twin:
        generate_series offsets + list_slice."""
        from s_tsfe_dl_ray.stages.text import chunk_words

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return chunk_words(ds, chunk_len=16, stride=8)

    def q_docs_redact(sf):
        """PII-style regex scrubbing: match count + global replacement as
        pure RE2 Arrow kernels (DuckDB regexp_* is RE2 too, so the oracle
        matches byte-for-byte)."""
        from functools import partial

        from s_tsfe_dl_ray.stages.text import redact_regex

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(
            partial(redact_regex, pattern=r"\b(customer|value)\b",
                    replacement="<PII>"),
            batch_format="pyarrow",
        )
        return out.select_columns(["doc_id", "n_redacted", "text_redacted"])

    def q_docs_dup_words(sf):
        """Within-document repetition quality signal (duplicate-word
        fraction) — list_distinct oracle twin (also pinned by pytest
        tests/test_text.py)."""
        from s_tsfe_dl_ray.stages.text import dup_word_stats

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(dup_word_stats, batch_format="pyarrow")
        return _round_floats(out.select_columns(
            ["doc_id", "n_words", "n_distinct_words", "dup_word_frac"]
        ))

    def q_emb_knn_top10(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(knn_bruteforce(
            ds, query_ids=list(range(10)), k=10,
            source_path=f"{sf}/embeddings.parquet",
        ))

    def q_emb_neardup_04(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(embedding_neardup_pairs(ds, threshold=0.4))

    def q_emb_dedup_clusters(sf):
        """Transitive closure of near-dup pairs: every paired vector
        labeled with its connected component's min id (hash-to-min label
        propagation, stages/cluster.py).  Oracle: recursive CTE
        reachability min."""
        from s_tsfe_dl_ray.stages.cluster import connected_components

        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        pairs = embedding_neardup_pairs(ds, threshold=0.4)
        return connected_components(pairs).sort("id")

    def q_docs_dedup_keep(sf):
        """Corpus dedup decision: n-gram-Jaccard near-dup pairs →
        components → one survivor (min doc_id) per cluster; unpaired docs
        keep themselves."""
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.cluster import dedup_keep
        from s_tsfe_dl_ray.stages.dedup import ngram_jaccard_pairs

        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        pairs = ngram_jaccard_pairs(ds, id_col="doc_id", n=3, threshold=0.5)
        out = dedup_keep(ds.select_columns(["doc_id"]), pairs, id_col="doc_id")
        # keep as BIGINT 0/1: integers are the battle-tested comparator path
        out = out.map_batches(
            lambda t: t.set_column(
                t.column_names.index("keep"), "keep",
                pc.cast(t["keep"], pa.int64())),
            batch_format="pyarrow",
        )
        return out.sort("doc_id")

    # ---- rows-only (no SQL oracle): approximate / stateful / synthesized
    def q_docs_minhash_dedup(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.5))

    def q_docs_simhash(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return simhash_signatures(ds, id_col="doc_id")

    def q_docs_rolling_fingerprint(sf):
        ds = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(rolling_fingerprint, batch_format="pandas")
        return out.select_columns(["doc_id", "fingerprint"])

    def q_emb_knn_ivf(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(knn_ivf(ds, n_queries=10, k=10, n_clusters=8, nprobe=4))

    def q_emb_neardup_lsh(sf):
        """Banded random-projection near-dup (production-scale route);
        exact-verified, so any found pair is a true >=0.9 pair.  The sf
        embeddings are random (no >=0.9 pairs exist), so the demo plants
        deterministic seeded perturbations of the 16 lowest vec_ids — every
        planted pair must be recovered, making the row count a real recall
        probe rather than a vacuous 0.  Rows-only: recall is probabilistic
        in general (tested >=99.6% per-pair in pytest)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from s_tsfe_dl_ray.stages.similarity import embedding_neardup_lsh

        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        seeds = ds.sort("vec_id").limit(16).to_pandas()
        rng = np.random.default_rng(7)
        planted = pd.DataFrame({
            "vec_id": seeds.vec_id.to_numpy() + 10_000_000,
            "embedding": [
                np.asarray(v, dtype=np.float64)
                + rng.standard_normal(len(v)) * 0.02
                for v in seeds.embedding
            ],
        })
        corpus = ds.union(ray.data.from_pandas(planted))
        out = _round_floats(embedding_neardup_lsh(corpus, threshold=0.9))
        return out.sort(["id_a", "id_b"])

    def q_transcripts_rollup_1h(sf):
        return _round_floats(transcript_tiers(_transcripts_for(sf), ("1m", "1h"))["1h"])

    def q_transcripts_gapfill_ffill_1h(sf):
        tier = transcript_tiers(_transcripts_for(sf), ("1m", "1h"))["1h"]
        return _round_floats(gapfill(
            tier, keys=["conv_id"], tier="1h",
            count_cols=["turn_count"], sum_cols=["token_len_sum"],
            null_cols=["token_len_min", "token_len_max"],
            carry_cols=["token_len_mean", "tool_call_rate"], mode="ffill",
        ))

    def q_transcripts_role_funnel(sf):
        """Per-conversation role funnel user → assistant → tool: first
        completion of each role strictly after the previous stage — the
        transcript instance of the ordered-sequence op
        (stages/funnel.funnel)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.funnel import funnel

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "ts", "role"])
        return funnel(
            turns, key="conv_id", ts_col="ts", type_col="role",
            stages=["user", "assistant", "tool"],
        )

    def q_transcripts_reply_latency(sf):
        """Per-conversation user→assistant reply-latency stats — the
        first-order dialog health metric; conv-local reversed running
        min over the order axis, no per-conversation loop
        (stages/dialog.reply_latency)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import reply_latency

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role"])
        return _round_floats(reply_latency(
            turns, conv_col="conv_id", ts_col="ts",
            order_by=["ts", "turn_idx"]))

    def q_transcripts_sessions_30m(sf):
        """Conversation activity sessions: 30-minute inactivity splits
        within each conv (agent-transcript session analysis)."""
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.sessionize import sessionize

        ds = read_transcripts(_transcripts_for(sf), columns=["conv_id", "turn_idx", "ts"])
        return sessionize(ds, keys=["conv_id"], ts_col="ts",
                          order_by=["ts", "turn_idx"], gap="30m")

    def q_transcripts_toolcall_last_user(sf):
        """For every tool-calling assistant turn, the most recent user
        turn at or before it (as-of alignment on the primary payload)."""
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.asof import asof_join_self
        import pyarrow.compute as _pc

        ds = read_transcripts(
            _transcripts_for(sf), columns=["conv_id", "turn_idx", "role", "tool", "ts"]
        )
        ds = ds.map_batches(
            lambda t: t.append_column(
                "kind",
                _pc.if_else(_pc.not_equal(t["tool"], ""), pa.scalar("tool_call"),
                            t["role"]),
            ),
            batch_format="pyarrow",
        )
        return asof_join_self(
            ds, key="conv_id", ts_col="ts",
            left_filter=("kind", "tool_call"),
            right_filter=("kind", "user"),
            right_value_cols=["turn_idx"],
            order_tiebreak="turn_idx",
        )

    def q_transcripts_order_fingerprint(sf):
        """Per-conversation order-sensitive text fingerprint — the
        per-turn-text-equality-under-stable-ordering invariant (one row
        per conv; identical across cluster sizes/blocking)."""
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.scan import order_fingerprint

        ds = read_transcripts(_transcripts_for(sf),
                              columns=["conv_id", "turn_idx", "ts", "text"])
        return order_fingerprint(ds, key="conv_id",
                                 order_by=["turn_idx", "ts"], col="text")

    def q_transcripts_codec_roundtrip(sf):
        """Per-conversation Gorilla/delta-of-delta compress → decompress →
        exact-equality verdict + compression ratio (stateful scan op)."""
        import numpy as np
        import ray.data as rd

        from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
        from s_tsfe_dl_ray.sources.parquet import read_transcripts

        path = _transcripts_for(sf)
        ds = read_transcripts(path, columns=["conv_id", "ts", "text", "tool"])
        ds = ds.map_batches(derive_transcript_columns, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda t: t.select(["conv_id", "ts"]).append_column(
                "value", pc.cast(t["token_len"], pa.float64())
            ),
            batch_format="pyarrow",
        )
        enc = encode_series(ds, key="conv_id", ts_col="ts", value_col="value")

        def verdict(b: pd.DataFrame) -> pd.DataFrame:
            from s_tsfe_dl_ray.state.deltadelta import DeltaDeltaCodec
            from s_tsfe_dl_ray.state.gorilla import GorillaCodec

            ok = []
            for ts_blob, val_blob, n in zip(b.ts_blob, b.val_blob, b.n_rows):
                ts = DeltaDeltaCodec().decode(bytes(ts_blob))
                v = GorillaCodec().decode(bytes(val_blob))
                ok.append(bool(len(ts) == n and len(v) == n))
            return pd.DataFrame({
                "conv_id": b.conv_id, "n_rows": b.n_rows,
                "roundtrip_ok": ok,
                "compression_ratio": (b.raw_bytes / b.enc_bytes).round(4),
            })

        return enc.map_batches(verdict, batch_format="pandas")

    def q_transcripts_codec_roundtrip_oracle(sf):
        """Oracle-checkable slice of the codec round-trip: per-conv row
        counts recovered from the compressed blobs + the exactness
        verdict (the SQL twin asserts counts from the RAW corpus and
        roundtrip_ok ≡ true, so a decode losing rows hash-fails)."""
        out = q_transcripts_codec_roundtrip(sf)
        return out.select_columns(["conv_id", "n_rows", "roundtrip_ok"])

    def q_customers_no_orders(sf):
        """Distributed anti join (NOT EXISTS): the right side is reduced
        to distinct keys per batch before the exchange (stages/join.py
        semi_join — the set-op gap-fill uses internally, first-class).
        Right side restricted to urgent orders so the anti set is
        non-empty at every test scale."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.join import anti_join

        cust = read_table(f"{sf}/customer.parquet",
                          columns=["c_custkey", "c_name", "c_acctbal"])
        orders = read_table(f"{sf}/orders.parquet",
                            columns=["o_custkey", "o_orderpriority"])
        urgent = orders.map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return _round_floats(
            anti_join(cust, urgent, left_on="c_custkey", right_on="o_custkey")
        )

    def q_events_click_attribution(sf):
        """Interval (range) join: each click resolves to the most recent
        1-hour purchase attribution window still active at click time —
        the range-predicate join Ray Data lacks natively
        (stages/asof.interval_join: co-partition + merge_asof + expiry)."""
        from s_tsfe_dl_ray.stages.asof import interval_join

        clicks = read_events(
            sf, columns=["event_id", "user_id", "event_type", "ts", "value"]
        ).map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click"))
                       .select(["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

        def windows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], "purchase"))
            end = pc.add(t["ts"], pa.scalar(3_600_000_000, pa.duration("us")))
            return pa.table({
                "user_id": t["user_id"], "win_start": t["ts"],
                "win_end": end, "purchase_value": t["value"],
            })

        intervals = read_events(
            sf, columns=["user_id", "event_type", "ts", "value"]
        ).map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        return _round_floats(interval_join(
            clicks, intervals, key="user_id", point_ts="ts",
            start_col="win_start", end_col="win_end",
            interval_cols=["purchase_value"], how="left",
        ))

    def q_events_pivot_type_sums(sf):
        """Long→wide PIVOT: per-user value sums per event_type as columns
        (pipelines/relational.pivot_wide — indicator-multiply derive fused
        into the combiner; wide partials only cross the exchange)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=["click", "view", "purchase", "signup", "error"],
            count_alias="n_events",
        ))

    def q_emb_label_centroids(sf):
        """Vector aggregate: per-label embedding centroids in LONG form
        (label, dim, n_vectors, centroid) — partials are labels×dims
        rows per batch, embeddings never cross the exchange
        (stages/similarity.label_centroids)."""
        from s_tsfe_dl_ray.stages.similarity import label_centroids

        emb = read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
        return _round_floats(label_centroids(emb))

    def q_emb_centroid_similarity(sf):
        """Class-confusability matrix: pairwise cosine between label
        centroids (stages/similarity.centroid_similarity — rides the
        labels×dims combiner; the |labels|² step is a single tiny
        partition)."""
        from s_tsfe_dl_ray.stages.similarity import centroid_similarity

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["label", "embedding"])
        return _round_floats(centroid_similarity(emb))

    def q_events_linear_trend(sf):
        """Per-key OLS trend (slope/intercept/corr of value on days since
        2024-01-01) — seven raw moments per key per batch cross the
        exchange, closed-form finalize (stages/trend.grouped_linear_trend;
        the per-series model-fit analog of the reference's
        fit-per-unit loop, experiments/arrythmia_experiment.py:179)."""
        from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(grouped_linear_trend(
            ds, key="user_id", ts_col="ts", value_col="value",
            ref_ts_us=1_704_067_200_000_000,  # 2024-01-01T00:00:00Z
        ))

    def q_events_m4_1h(sf):
        """M4 visualization downsample (Jugel et al., VLDB 2014): per
        (user, hour) min/max/first/last value WITH their timestamps;
        extreme (value, ts) pairs merge lexicographically so the one
        exchange carries 8 scalars per key-window per batch
        (stages/downsample.m4_downsample)."""
        from s_tsfe_dl_ray.stages.downsample import m4_downsample

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(m4_downsample(
            ds, key="user_id", ts_col="ts", value_col="value", tier="1h",
        ))

    def q_events_trailing_zscore(sf):
        """Trailing-window anomaly score: value standardized against the
        user's own last 6h (stream analog of the reference's
        reconstruction-error thresholding) — same offset-packed prefix-sum
        dataflow as trailing_agg, plus a value² prefix
        (stages/scan.trailing_zscore)."""
        from s_tsfe_dl_ray.stages.scan import trailing_zscore

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(trailing_zscore(
            ds, key="user_id", ts_col="ts", value_col="value",
            window_us=6 * 3_600_000_000,
        ))

    def q_events_rolling_median5(sf):
        """Rolling MEDIAN (robust despiking smoother) over the user's 5
        most recent rows — order-statistic sibling of rolling_mean5, same
        grouped dataflow + salted mega-key mode
        (stages/transform.rolling_median)."""
        from s_tsfe_dl_ray.stages.transform import rolling_median

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_median(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=5, out_col="value_med5",
        ))

    def q_events_rolling_p90(sf):
        """Trailing discrete p90 over the user's 20 most recent rows —
        the spike-envelope alerting threshold; exact quantile_disc
        selection per window (stages/transform.rolling_quantile)."""
        from s_tsfe_dl_ray.stages.transform import rolling_quantile

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_quantile(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=20, q=0.9, out_col="value_p90",
        ))

    def q_docs_token_entropy(sf):
        """Per-document unigram Shannon entropy (nats) — the
        repetition/diversity corpus-quality signal; pure per-batch
        explode + group_by, no shuffle (stages/text.token_entropy)."""
        from s_tsfe_dl_ray.stages.text import token_entropy

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(token_entropy(docs))

    def q_events_unpivot_type_sums(sf):
        """Wide→long UNPIVOT closing the reshape loop: pivot_wide's
        per-type sum columns melted back to (user, variable, value_sum)
        rows — zero-copy column slices, no shuffle beyond the pivot's own
        (stages/transform.unpivot)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide
        from s_tsfe_dl_ray.stages.transform import unpivot

        cats = ["click", "view", "purchase", "signup", "error"]
        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        wide = pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=cats, count_alias="n_events",
        )
        return _round_floats(unpivot(
            wide, keys=["user_id"],
            value_cols=[f"value_sum_{c}" for c in cats],
            var_col="variable", value_col="value_sum",
        ))

    def q_events_twa(sf):
        """Per-user time-weighted (LOCF, duration-weighted) mean — the
        correct average for irregularly sampled series; lead/diff/
        weighted-sum vectorized over key-change boundaries in one
        co-partition (stages/scan.time_weighted_mean)."""
        from s_tsfe_dl_ray.stages.scan import time_weighted_mean

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(time_weighted_mean(
            ds, key="user_id", ts_col="ts", value_col="value",
            order_by=["ts", "event_id"],
        ))

    def q_events_funnel(sf):
        """Ordered funnel view → click → purchase: first completion of
        each stage strictly after the previous one, one vectorized pass
        per stage, no per-key loop (stages/funnel.funnel)."""
        from s_tsfe_dl_ray.stages.funnel import funnel

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return funnel(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        )

    def q_events_cohort_retention(sf):
        """Cohort retention matrix (first-seen day × activity day user
        counts): both grains fused into one (user, day, min_ts) combiner
        partial, one user-hash exchange, tiny days² final merge
        (stages/cohort.cohort_retention)."""
        from s_tsfe_dl_ray.stages.cohort import cohort_retention

        ds = read_events(sf, columns=["user_id", "ts"])
        return cohort_retention(ds, key="user_id", ts_col="ts", tier="1d")

    def q_docs_heavy_hitters(sf):
        """Approximate heavy hitters (Misra-Gries) over document tokens:
        bounded summaries (<= capacity rows) merged through a two-level
        tree; count_lo <= true <= count_hi guarantee (stages/
        distinct.heavy_hitters). Sketch-state-dependent -> rows-only;
        the bound guarantees are pinned by pytest against exact counts."""
        from s_tsfe_dl_ray.stages.distinct import heavy_hitters
        from s_tsfe_dl_ray.stages.text import explode_tokens

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        toks = explode_tokens(docs, id_col="doc_id", text_col="text")
        return heavy_hitters(toks, col="token", capacity=512, k=20)

    def q_events_cusum(sf):
        """One-sided CUSUM drift statistic per user (Page 1954),
        vectorized via the reflected-walk identity s = c − min(0, min c)
        — two grouped cumulative kernels, no per-row recurrence; the same
        identity makes it a plain window-function SQL twin
        (stages/scan.cusum)."""
        from s_tsfe_dl_ray.stages.scan import cusum

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(cusum(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", target=50.0,
        ))

    def q_events_seasonal_adjust(sf):
        """Seasonal-naive decomposition: value minus the user's own
        hour-of-day mean (the residual anomaly detectors should consume
        for daily-patterned series); fit+transform fused into the one
        key-hash partition (stages/trend.seasonal_adjust)."""
        from s_tsfe_dl_ray.stages.trend import seasonal_adjust

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(seasonal_adjust(
            ds, key="user_id", ts_col="ts", value_col="value",
            period="hour_of_day",
        ))

    def q_events_type_corr(sf):
        """Cross-series correlation matrix: pairwise Pearson corr of the
        per-user event-type value sums (pivot_wide → pairwise_corr) —
        K×K raw-moment partials per batch, one tiny final reduce
        (stages/trend.pairwise_corr)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide
        from s_tsfe_dl_ray.stages.trend import pairwise_corr

        cats = ["click", "view", "purchase", "signup", "error"]
        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        wide = pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=cats, count_alias="n_events",
        )
        return _round_floats(pairwise_corr(
            wide, cols=[f"value_sum_{c}" for c in cats]))

    def q_events_winsorize_p95(sf):
        """Per-user p95 clipping (one-sided winsorization): quantile_disc
        fit + clamp fused in one key-hash partition, vectorized rank
        indexing (stages/transform.winsorize)."""
        from s_tsfe_dl_ray.stages.transform import winsorize

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(winsorize(
            ds, key="user_id", value_col="value", q=0.95,
            out_col="value_w95",
        ))

    def q_events_grouping_sets(sf):
        """GROUPING SETS in one input pass: (user, type) / (user) / grand
        total, each granularity's combiner partial from the same batch
        scan, SQL GROUPING() bitmask, sentinel-coalesced rolled-up keys
        (stages/grouping.grouping_sets)."""
        from s_tsfe_dl_ray.stages.grouping import grouping_sets

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(grouping_sets(
            ds, keys=["user_id", "event_type"],
            sets=[["user_id", "event_type"], ["user_id"], []],
            value_col="value",
            sentinels={"user_id": -1, "event_type": ""},
            count_alias="n_events",
        ))

    def q_events_sample_per_user(sf):
        """Deterministic balanced subsample: 5 rows per user ranked by
        md5(event_id) — stable across cluster sizes / reruns / row order
        (stages/transform.sample_per_key)."""
        from s_tsfe_dl_ray.stages.transform import sample_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(sample_per_key(
            ds, key="user_id", id_col="event_id", n=5))

    def q_events_value_quantiles_approx(sf):
        """Approximate per-user p50/p95/p99 of the CONTINUOUS value
        column: t-digest-style centroid sketch, O(keys × delta) exchange
        rows per batch, fully vectorized across keys (stages/
        quantile.grouped_quantiles_approx). Sketch-state-dependent ->
        rows-only; the rank-error envelope is pinned by pytest."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles_approx

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_quantiles_approx(
            ds, value_col="value", keys=["user_id"],
            quantiles=(0.5, 0.95, 0.99), delta=128,
        ))

    def q_docs_bm25(sf):
        """BM25 relevance to the query {'hash', 'join', 'shuffle'}
        (Lucene idf variant): tiny stats pass (per-term df + avgdl
        partials, |query|+1 rows per batch) folded into a broadcast
        scoring closure; one vectorized scoring pass
        (stages/text.bm25_score)."""
        from s_tsfe_dl_ray.stages.text import bm25_score

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(bm25_score(
            docs, query_terms=["hash", "join", "shuffle"]))

    def q_events_burstiness(sf):
        """Per-user inter-event-gap distribution + Goh–Barabási
        burstiness index (σ−µ)/(σ+µ) — how far each key's firing pattern
        is from a uniform clock (stages/trend.interarrival_stats)."""
        from s_tsfe_dl_ray.stages.trend import interarrival_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(interarrival_stats(
            ds, key="user_id", ts_col="ts", order_by=["ts", "event_id"]))

    def q_events_lag1_autocorr(sf):
        """Per-user lag-1 autocorrelation of value (noise vs momentum in
        one number); corr over (x, lag x) pairs with SQL NULL rules
        (stages/trend.lag1_autocorr)."""
        from s_tsfe_dl_ray.stages.trend import lag1_autocorr

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(lag1_autocorr(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_percent_rank(sf):
        """Per-user empirical-CDF rank transform (distribution-free
        normalization, min-rank ties) — one sort + cumulative-max run
        propagation, no per-key loop (stages/transform.percent_rank)."""
        from s_tsfe_dl_ray.stages.transform import percent_rank

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(percent_rank(
            ds, key="user_id", value_col="value"))

    def q_events_impute_mean(sf):
        """Missing-value repair: error-turn values nulled (simulated
        sensor dropout) then imputed with the user's own mean —
        fit+fill fused in one key-hash partition
        (stages/transform.impute_mean)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.transform import impute_mean

        def null_errors(t: pa.Table) -> pa.Table:
            v = pc.if_else(pc.equal(t["event_type"], "error"),
                           pa.scalar(None, pa.float64()), t["value"])
            return t.drop_columns(["value", "event_type"]).append_column("value", v)

        ds = read_events(sf, columns=["event_id", "user_id", "event_type",
                                      "value"])
        ds = ds.map_batches(null_errors, batch_format="pyarrow")
        return _round_floats(impute_mean(ds, key="user_id", value_col="value"))

    def q_events_snapshot_diff(sf):
        """Snapshot reconciliation: two deterministic views of events
        (mod-rule deletions, insertions, and value edits) diffed to
        added/removed/changed rows per key — hash co-partition, NULL-
        safe compare (stages/join.snapshot_diff)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.join import snapshot_diff

        import numpy as np

        def old_view(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 7 != 0))

        def new_view(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % 5 != 0))
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            v = pc.if_else(pa.array(ids % 11 == 0),
                           pc.add(t["value"], 1.0), t["value"])
            return t.drop_columns(["value"]).append_column("value", v)

        base = read_events(sf, columns=["event_id", "value"])
        old = base.map_batches(old_view, batch_format="pyarrow")
        new = read_events(sf, columns=["event_id", "value"]) \
            .map_batches(new_view, batch_format="pyarrow")
        return snapshot_diff(old, new, key="event_id",
                             compare_cols=["value"])

    def q_events_holt_forecast(sf):
        """Holt double-exponential smoothing per user (level + trend +
        one-step forecast) — the classical forecast baseline; affine
        (A^n, v) salted carries (stages/transform.holt_smooth).  The
        second-order recurrence is a two-state recursive CTE (l, b
        columns; 1−α and 1−β exact in IEEE754) — external oracle;
        literal-fold + salted-parity pytest still pin it."""
        from s_tsfe_dl_ray.stages.transform import holt_smooth

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(holt_smooth(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", alpha=0.4, beta=0.2))

    def q_docs_bpe_token_count(sf):
        """Subword-style token cost estimate: GPT-2-ish pre-tokenizer
        regex matches per document — EXACT SQL twin because pyarrow and
        DuckDB share the RE2 engine (stages/text.bpe_token_count)."""
        from s_tsfe_dl_ray.stages.text import bpe_token_count

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        out = docs.map_batches(bpe_token_count, batch_format="pyarrow")
        return out.drop_columns(["text"])

    def q_events_next_purchase(sf):
        """FORWARD as-of with staleness tolerance: for each click, the
        next purchase by the same user within 24h (NULL past the
        tolerance) — direction/tolerance extension of the as-of
        operator (stages/asof.asof_join_self)."""
        from s_tsfe_dl_ray.stages.asof import asof_join_self

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        out = asof_join_self(
            ds, key="user_id", ts_col="ts",
            left_filter=("event_type", "click"),
            right_filter=("event_type", "purchase"),
            right_value_cols=[], order_tiebreak="event_id",
            direction="forward", tolerance_us=24 * 3_600_000_000,
        )
        return out.drop_columns(["event_type"])

    def q_emb_pca_top2(sf):
        """Exact distributed PCA: covariance from one (d + d² + 1)-moment
        combiner pass, driver eigh, broadcast (X−µ)W transform; sign-
        deterministic components (stages/similarity.pca_fit_transform).
        Eigendecomposition -> no SQL twin; variance-order/orthogonality/
        blocking-invariance pinned in pytest."""
        from s_tsfe_dl_ray.stages.similarity import pca_fit_transform

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(pca_fit_transform(emb, n_components=2))

    def q_emb_kmeans(sf):
        """Full-corpus Lloyd k-means: one fused assign+reduce combiner
        pass per iteration, k x d centroid state on the driver, final
        assignment pass (stages/similarity.kmeans_lloyd). Iterative ->
        no SQL twin; planted-cluster recovery and blocking invariance
        pinned in pytest."""
        from s_tsfe_dl_ray.stages.similarity import kmeans_lloyd

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return kmeans_lloyd(emb, n_clusters=8, n_iter=4)

    def q_events_binary_metrics(sf):
        """Distributed confusion matrix + accuracy/precision/recall/F1
        (prediction: value >= 50, label: purchase) — four counts per
        batch, one tiny merge; the reference's metric tail as a
        distributed aggregate (stages/metrics.binary_metrics)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import binary_metrics

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(binary_metrics(
            ds, score_col="value", label_col="label", threshold=50.0))

    def q_events_auc(sf):
        """Exact distributed ROC-AUC via the Mann–Whitney mid-rank form
        over the (score → n_pos, n_neg) value histogram — one row per
        distinct score crosses the exchange, never raw rows
        (stages/metrics.auc_roc)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import auc_roc

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(auc_roc(ds, score_col="value", label_col="label"))

    def q_events_props_extract(sf):
        """Semi-structured payload ingestion: the JSON props column's
        $.k field extracted per row (vectorized Rust json_path_match,
        no per-row json.loads) then summed per user — extraction
        feeding the standard rollup combiner
        (stages/transform.json_extract_scalar)."""
        import pyarrow as pa

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.transform import json_extract_scalar

        ds = read_events(sf, columns=["user_id", "props"])
        ext = json_extract_scalar(
            ds, col="props", path="$.k", out_col="k_value",
            cast_to=pa.int64())
        return grouped_aggregate(
            ext, keys=["user_id"],
            aggs={"k_sum": ("k_value", "sum"),
                  "k_min": ("k_value", "min"),
                  "k_max": ("k_value", "max"),
                  "n_events": ("k_value", "count")},
        )

    def q_events_calibration(sf):
        """Reliability table (calibration diagnostic next to AUC): value
        rescaled to [0,1], 10 equal-width bins, per-bin count / mean
        score / positive rate (stages/metrics.calibration_bins)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import calibration_bins

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column("label", pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(calibration_bins(
            ds, score_col="score", label_col="label", n_bins=10))

    def q_events_top3_by_value(sf):
        """Generic per-key row selection: each user's 3 highest-value
        events (full rows), deterministic ties by event_id
        (stages/transform.top_n_per_key)."""
        from s_tsfe_dl_ray.stages.transform import top_n_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(top_n_per_key(
            ds, key="user_id", score_col="value", n=3,
            tiebreak_col="event_id"))

    def q_events_debounce_1m(sf):
        """Greedy min-gap throttle (alert dedup): keep an event only if
        >= 60s since the user's last KEPT event; survivor-jump
        searchsorted walk, loop length == output size
        (stages/sessionize.debounce).  The greedy keep-chain is
        row-stepped-recursive — expressible as a recursive CTE with
        (kept, last_kept) state (the EWMA pattern), now an external
        oracle; literal-fold + blocking-invariance pytest still pin
        it."""
        from s_tsfe_dl_ray.stages.sessionize import debounce

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return debounce(ds, key="user_id", ts_col="ts",
                        min_gap_us=60_000_000, order_by=["ts", "event_id"])

    def q_events_health_report(sf):
        """Composite drift monitor (pipelines/health.series_health_report):
        seasonal_adjust → slacked CUSUM on residuals → threshold →
        debounced alerts → per-key report joined with the OLS trend —
        the round-3 timeseries operators composed end-to-end.  Contains
        debounce (greedy) -> rows-only; semantics pinned by the
        planted-drift pytest."""
        from s_tsfe_dl_ray.pipelines.health import series_health_report

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(series_health_report(
            ds, key="user_id", ts_col="ts", value_col="value",
            event_id_col="event_id",
            ref_ts_us=1_704_067_200_000_000,
            cusum_threshold=250.0, slack=10.0,
        ))

    def q_events_standardize_per_user(sf):
        """Per-key z-score (each series normalized against ITSELF) —
        the grouped sibling of the global standardize; SQL stddev_samp
        NULL semantics (stages/transform.standardize_per_key)."""
        from s_tsfe_dl_ray.stages.transform import standardize_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(standardize_per_key(
            ds, key="user_id", value_col="value", out_col="value_zk"))

    def q_events_funnel_24h(sf):
        """Funnel with a conversion window: click within 24h of the
        first view, purchase within 24h of that click — the bounded
        'converted in time' form (stages/funnel.funnel max_gap_us)."""
        from s_tsfe_dl_ray.stages.funnel import funnel

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return funnel(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
            max_gap_us=24 * 3_600_000_000,
        )

    def q_events_longest_error_streak(sf):
        """Longest consecutive error run per user — pure composition:
        segment_runs (run-length segmentation) → filter → top_n_per_key
        argmax; oracle is the classic gaps-and-islands SQL."""
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.sessionize import segment_runs
        from s_tsfe_dl_ray.stages.transform import top_n_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        runs = segment_runs(
            ds, keys=["user_id"], value_col="event_type", ts_col="ts",
            order_by=["ts", "event_id"],
        ).map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "error")),
            batch_format="pyarrow",
        )
        best = top_n_per_key(
            runs, key="user_id", score_col="n_rows", n=1,
            tiebreak_col="run_start",
        )
        return best.select_columns(["user_id", "run_start", "run_end",
                                    "n_rows"])

    def q_docs_tfidf_top3(sf):
        """Corpus-statistics feature extraction: top-3 TF-IDF terms per
        document (stages/text.tfidf_top_terms — tf final per batch, df by
        token partition, rank by doc partition; no broadcast dictionary)."""
        from s_tsfe_dl_ray.stages.text import tfidf_top_terms

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(tfidf_top_terms(docs, k=3))

    def q_events_incremental_1h(sf):
        """Continuous-aggregate refresh: history + delta rolled up
        independently, merged via ``merge_partials`` — must equal the
        direct full-table rollup (same oracle SQL shape as rollup_1h)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import events_incremental_tier

        return _round_floats(events_incremental_tier(sf, "1h"))

    def q_events_distinct_users_1h(sf):
        from s_tsfe_dl_ray.pipelines.events_rollup import events_distinct_users

        return events_distinct_users(sf, tier="1h")

    def q_events_distinct_users_approx(sf):
        """HyperLogLog sketch path (rows-only: accuracy bounded, not exact;
        tolerance-tested against the exact op in tests/test_distinct.py)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import events_distinct_users

        return events_distinct_users(sf, tier="1h", exact=False)

    def q_events_top_types_per_user(sf):
        from s_tsfe_dl_ray.pipelines.events_rollup import events_top_types_per_user

        return events_top_types_per_user(sf, k=3)

    # ---- round-4 operator wave ---------------------------------------

    def q_events_mad_per_user(sf):
        """Robust per-key location/scale: median, MAD, MAD-z outlier
        count (stages/robust.grouped_mad — one _pkey exchange, cython
        medians across all keys per partition)."""
        from s_tsfe_dl_ray.stages.robust import grouped_mad

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_mad(ds, key="user_id", value_col="value"))

    def q_events_theil_sen(sf):
        """Theil–Sen robust slope per key: median of pairwise slopes
        over exact µs time deltas (stages/robust.theil_sen)."""
        from s_tsfe_dl_ray.stages.robust import theil_sen

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(theil_sen(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_spearman_trend(sf):
        """Per-key Spearman rank corr of value vs time order — the
        scale-free monotonic-drift score (stages/robust)."""
        from s_tsfe_dl_ray.stages.robust import spearman_monotonicity

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(spearman_monotonicity(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_paa8(sf):
        """Piecewise Aggregate Approximation, segment length 8
        (stages/symbolic.paa — the pooling downsample as a transform)."""
        from s_tsfe_dl_ray.stages.symbolic import paa

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(paa(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", seg_len=8))

    def q_events_sax4(sf):
        """SAX symbolization: per-key z-norm → PAA(8) → 4-letter gaussian
        alphabet (stages/symbolic.sax)."""
        from s_tsfe_dl_ray.stages.symbolic import sax

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return sax(ds, key="user_id", order_by=["ts", "event_id"],
                   value_col="value", seg_len=8)

    def q_events_value_histogram(sf):
        """Global fixed-width value histogram — pure combiner, O(bins)
        exchange (stages/quantile.fixed_histogram)."""
        from s_tsfe_dl_ray.stages.quantile import fixed_histogram

        ds = read_events(sf, columns=["value"])
        return _round_floats(fixed_histogram(ds, value_col="value", width=25.0))

    def q_events_mode_type(sf):
        """Per-user modal event type with deterministic tie-break
        (stages/distinct.mode_per_key)."""
        from s_tsfe_dl_ray.stages.distinct import mode_per_key

        ds = read_events(sf, columns=["user_id", "event_type"])
        return mode_per_key(ds, key="user_id", cat_col="event_type")

    def q_events_bollinger(sf):
        """Trailing Bollinger bands (rolling mean ± 2·sample-std over 5
        rows, min_periods=1) per user (stages/transform.bollinger_bands)."""
        from s_tsfe_dl_ray.stages.transform import bollinger_bands

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        out = bollinger_bands(ds, keys=["user_id"],
                              order_by=["ts", "event_id"], col="value",
                              window=5, k=2.0)
        return _round_floats(out.select_columns(
            ["event_id", "user_id", "bb_mean", "bb_std", "bb_upper",
             "bb_lower"]))

    def q_revenue_by_nation(sf):
        """TPC-H Q5 skeleton: lineitem ⋈ orders ⋈ customer chained hash
        joins + broadcast nation dimension → exact scaled-int revenue per
        nation (pipelines/relational.revenue_by_nation)."""
        from s_tsfe_dl_ray.pipelines.relational import revenue_by_nation

        return _round_floats(revenue_by_nation(sf))

    def q_revenue_share_hierarchy(sf):
        """Percent-of-parent OLAP rollup: order revenue per nation with
        share-of-region and share-of-global — partitioned orders⋈customer
        hash join + broadcast dims + exact int-cent share divisions
        (pipelines/relational.revenue_share_hierarchy)."""
        from s_tsfe_dl_ray.pipelines.relational import revenue_share_hierarchy

        return _round_floats(revenue_share_hierarchy(sf))

    def q_docs_bigram_top20(sf):
        """Corpus top-20 bigrams — vectorized in-doc pair construction +
        token-hash partitioned count merge (stages/text.top_bigrams)."""
        from s_tsfe_dl_ray.stages.text import top_bigrams

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return top_bigrams(docs, k=20)

    def q_docs_zipf_slope(sf):
        """Zipf exponent of the corpus (regr_slope of ln count on ln rank
        over the top-100 tokens) — corpus-health one-number check
        (stages/text.zipf_slope)."""
        from s_tsfe_dl_ray.stages.text import zipf_slope

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(zipf_slope(docs, top_n=100))

    def q_events_cross_corr_1h(sf):
        """Lead/lag coupling of click vs purchase hourly count series:
        Pearson corr at lag 0 and with clicks lagged one observed hour
        (stages/trend.cross_series_corr)."""
        from s_tsfe_dl_ray.stages.trend import cross_series_corr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(cross_series_corr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h"))

    def q_events_changepoint(sf):
        """Single level-shift changepoint per key (binary segmentation's
        first split, exact scaled-int prefix sums so the argmax is
        bit-identical to SQL) — stages/robust.binary_changepoint."""
        from s_tsfe_dl_ray.stages.robust import binary_changepoint

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(binary_changepoint(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_acf(sf):
        """Autocorrelation function at lags 1–3 per key, long format
        (stages/trend.acf)."""
        from s_tsfe_dl_ray.stages.trend import acf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(acf(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], lags=(1, 2, 3)))

    def q_events_lttb_20(sf):
        """LTTB visual downsample to ≤20 points per key — rows-only (the
        recursive previous-point dependence has no SQL twin; property
        tests pin anchors/count/spike retention)."""
        from s_tsfe_dl_ray.stages.symbolic import lttb

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return lttb(ds, key="user_id", ts_col="ts", value_col="value",
                    n_out=20, id_col="event_id")

    def q_events_mannwhitney_u(sf):
        """Per-user Mann–Whitney U (purchase vs click values) + rank-
        biserial effect size — exact half-integer rank sums
        (stages/robust.mann_whitney_u)."""
        from s_tsfe_dl_ray.stages.robust import mann_whitney_u

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(mann_whitney_u(
            ds, key="user_id", group_col="event_type", value_col="value",
            group_a="purchase", group_b="click"))

    def q_docs_js_divergence(sf):
        """Jensen–Shannon divergence between two sources' token
        distributions — corpus-drift check (stages/text.js_divergence)."""
        from s_tsfe_dl_ray.stages.text import js_divergence

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["source", "text"])
        return _round_floats(js_divergence(
            docs, side_col="source", side_a="src0", side_b="src1"))

    def q_events_user_quantiles(sf):
        """Exact per-user p50/p95/p99 of value via the distributed
        value-histogram quantile op (stages/quantile.grouped_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        ds = read_events(sf, columns=["user_id", "value"])
        return grouped_quantiles(ds, value_col="value", keys=["user_id"],
                                 quantiles=(0.5, 0.95, 0.99))

    def q_events_ks_test(sf):
        """Per-user two-sample Kolmogorov–Smirnov D between view and
        error value distributions (stages/robust.ks_test) — exact
        rational ECDF steps, bit-identical max."""
        from s_tsfe_dl_ray.stages.robust import ks_test

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(ks_test(
            ds, key="user_id", group_col="event_type", value_col="value",
            group_a="view", group_b="error"))

    def q_events_resample_locf(sf):
        """As-of resample onto the hourly grid: last observation carried
        forward at every grid instant between each user's first and last
        event (stages/gapfill.resample_locf)."""
        from s_tsfe_dl_ray.stages.gapfill import resample_locf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(resample_locf(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id", tier="1h"))

    def q_events_drawdown(sf):
        """Per-user maximum drawdown (worst peak-to-trough drop in time
        order) — bit-exact comparison scan (stages/robust.max_drawdown)."""
        from s_tsfe_dl_ray.stages.robust import max_drawdown

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(max_drawdown(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_docs_vocab_stats(sf):
        """Corpus vocabulary health: instances / vocab / hapax counts +
        type-token and hapax ratios (stages/text.vocab_stats)."""
        from s_tsfe_dl_ray.stages.text import vocab_stats

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(vocab_stats(docs))

    def q_events_hopping_1h_15m(sf):
        """Overlapping windows: 1h windows hopping every 15 min, via pane
        composition — rows combine once into 15 min panes, each merged
        pane feeds its 4 containing windows partition-locally
        (stages/rollup.hopping_rollup; exchange == tumbling-15m cost)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import EVENTS_SPEC
        from s_tsfe_dl_ray.stages.rollup import hopping_rollup

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(hopping_rollup(
            ds, EVENTS_SPEC, size="1h", hop=15 * 60 * 1_000_000))

    def q_events_dominant_period(sf):
        """Per-user dominant period: argmax autocorrelation over lags
        1–12 (ties -> smallest lag) — seasonality probe on top of acf
        (stages/trend.dominant_period)."""
        from s_tsfe_dl_ray.stages.trend import dominant_period

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(dominant_period(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], max_lag=12))

    def q_docs_pack_512(sf):
        """Greedy first-fit-decreasing sample packing into 512-token
        bins, partition-local (stages/text.pack_sequences) — rows-only
        (the greedy assignment is order-dependent, no SQL twin; property
        tests pin budget respect / coverage / determinism)."""
        from s_tsfe_dl_ray.stages.text import pack_sequences

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return pack_sequences(docs, budget=512)

    def q_events_type_concentration(sf):
        """Per-user behavioral concentration over event types: HHI,
        Shannon entropy, top share (stages/distinct.categorical_concentration)."""
        from s_tsfe_dl_ray.stages.distinct import categorical_concentration

        ds = read_events(sf, columns=["user_id", "event_type"])
        return _round_floats(categorical_concentration(
            ds, group_col="user_id", member_col="event_type"))

    def q_events_daily_user_hhi(sf):
        """Daily traffic concentration across users (is the day dominated
        by few users?) — same op, day-grid group."""
        from s_tsfe_dl_ray.functions.windows import window_start_us, window_to_timestamp
        from s_tsfe_dl_ray.stages.distinct import categorical_concentration

        ds = read_events(sf, columns=["ts", "user_id"])
        ds = ds.map_batches(
            lambda t: pa.table({
                "day": window_to_timestamp(window_start_us(t["ts"], "1d")),
                "user_id": t["user_id"],
            }),
            batch_format="pyarrow", zero_copy_batch=True)
        return _round_floats(categorical_concentration(
            ds, group_col="day", member_col="user_id"))

    def q_emb_cosine_centroid(sf):
        """Cosine of every embedding to the corpus mean vector — global
        typicality score (stages/similarity.cosine_to_centroid)."""
        from s_tsfe_dl_ray.stages.similarity import cosine_to_centroid

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(cosine_to_centroid(emb))

    # ---- round-4b wave: TPC-H-shaped decision-support joins ----------

    def q_tpch_q3_shipping(sf):
        """Top-10 open-order revenue (Q3 skeleton): segment semi-join +
        date-pruned reads + one combiner aggregate + tiny sorted cut
        (pipelines/tpch.q3_shipping_priority)."""
        from s_tsfe_dl_ray.pipelines.tpch import q3_shipping_priority

        return _round_floats(q3_shipping_priority(sf))

    def q_tpch_q4_priority_returns(sf):
        """Priority distribution of orders with a returned line (Q4
        skeleton, EXISTS via shuffle-light semi_join)."""
        from s_tsfe_dl_ray.pipelines.tpch import q4_priority_returns

        return q4_priority_returns(sf)

    def q_tpch_q10_returned_revenue(sf):
        """Top-20 customers by returned-lineitem revenue (Q10 skeleton):
        early per-customer fold, broadcast nation dimension."""
        from s_tsfe_dl_ray.pipelines.tpch import q10_returned_revenue

        return _round_floats(q10_returned_revenue(sf))

    def q_tpch_q14_promo_share(sf):
        """Promo revenue share for one ship-month (Q14 skeleton) — exact
        int64 numerator/denominator through one global combiner."""
        from s_tsfe_dl_ray.pipelines.tpch import q14_promo_share

        return _round_floats(q14_promo_share(sf))

    def q_tpch_q18_large_orders(sf):
        """Orders whose total quantity exceeds 300 with customer identity
        (Q18 skeleton): HAVING-filter BEFORE any join."""
        from s_tsfe_dl_ray.pipelines.tpch import q18_large_orders

        return _round_floats(q18_large_orders(sf))

    def q_tpch_q12_priority_lines(sf):
        """Order-priority mix per lineitem status for a ship-year (Q12
        skeleton on this schema): conditional counters folded per batch
        after the partitioned join."""
        from s_tsfe_dl_ray.pipelines.tpch import q12_priority_lines

        return q12_priority_lines(sf)

    def q_tpch_q19_disjunctive_revenue(sf):
        """OR-of-ANDs brand/size/quantity revenue (Q19 skeleton): the
        conjunctive envelope pushed into both reads, residual disjunction
        one boolean kernel post-join."""
        from s_tsfe_dl_ray.pipelines.tpch import q19_disjunctive_revenue

        return _round_floats(q19_disjunctive_revenue(sf))

    def q_tpch_q7_nation_volume(sf):
        """Nation-pair shipping volume per year (Q7 skeleton): two big
        hash joins, early fold to (nation, supp, year) partials, nation
        dimension broadcast."""
        from s_tsfe_dl_ray.pipelines.tpch import q7_nation_volume

        return _round_floats(q7_nation_volume(sf))

    # ---- round-4b wave: per-key feature extraction ---------------------

    def q_events_skew_kurtosis(sf):
        """Distributed 3rd/4th standardized central moments per key —
        two-pass centered sums (stages/features.grouped_moments)."""
        from s_tsfe_dl_ray.stages.features import grouped_moments

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_moments(ds, key="user_id", value_col="value"))

    def q_events_ts_features(sf):
        """tsfresh-style ordered-series battery: abs energy, mean abs
        change, mean crossings, count/longest-strike above mean, first
        location of max (stages/features.ts_feature_battery)."""
        from s_tsfe_dl_ray.stages.features import ts_feature_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_feature_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_kendall_tau(sf):
        """Kendall tau-b of value vs time order per key — the bounded-
        influence trend score (stages/robust.kendall_tau)."""
        from s_tsfe_dl_ray.stages.robust import kendall_tau

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(kendall_tau(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_session_stats(sf):
        """Session-level summary per user: sessionize (30m gap) composed
        with the combiner aggregate — stage composition, no new kernel."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.sessionize import sessionize

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        sess = sessionize(ds, keys=["user_id"], ts_col="ts",
                          order_by=["ts", "event_id"], gap="30m")
        return _round_floats(grouped_aggregate(
            sess, keys=["user_id"],
            aggs={
                "n_sessions": ("session_id", "count"),
                "avg_session_events": ("n_rows", "mean"),
                "max_session_events": ("n_rows", "max"),
                "avg_duration_sec": ("duration_sec", "mean"),
                "max_duration_sec": ("duration_sec", "max"),
            }))

    def q_events_type_cooccurrence(sf):
        """Pairwise event-type co-engagement across users: support, lift,
        Jaccard (stages/distinct.pair_cooccurrence — distinct base +
        in-partition self-merge + broadcast denominators)."""
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        ds = read_events(sf, columns=["user_id", "event_type"])
        return _round_floats(pair_cooccurrence(
            ds, group_col="user_id", member_col="event_type"))

    def q_docs_top_bigram(sf):
        """Per-doc most-frequent bigram + character-coverage fraction —
        the Gopher-style repetition signal (stages/text.doc_top_bigram,
        shuffle-free)."""
        from s_tsfe_dl_ray.stages.text import doc_top_bigram

        docs = read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return _round_floats(doc_top_bigram(docs))

    def q_events_complexity(sf):
        """Nonlinearity/complexity battery per key: c3, time-reversal
        asymmetry, CID-CE, peak count, binned entropy
        (stages/features.ts_complexity_battery — exact scaled-int cubic
        sums for oracle parity)."""
        from s_tsfe_dl_ray.stages.features import ts_complexity_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_complexity_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_location_features(sf):
        """Location/dispersion battery per key: extreme positions, index
        mass quantile, mean 2nd derivative, beyond-2σ ratio, uniqueness —
        every boundary comparison in exact ints
        (stages/features.ts_location_battery)."""
        from s_tsfe_dl_ray.stages.features import ts_location_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_location_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    # ---- round-4c wave: dialog / transcript analytics -------------------

    def q_transcripts_role_transitions(sf):
        """Corpus role→next-role transition matrix with per-source-role
        fractions — the dialog Markov structure
        (stages/dialog.role_transitions)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import role_transitions

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role"])
        return _round_floats(role_transitions(turns))

    def q_transcripts_tool_streaks(sf):
        """Per-conversation agent-loop depth: tool-call count and longest
        consecutive tool-calling run (stages/dialog.tool_chain_streaks)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import tool_chain_streaks

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "tool"])
        return tool_chain_streaks(turns)

    def q_transcripts_context_cost(sf):
        """Per-conversation context economics: Σ prefix chars (the
        quadratic full-history bill), total/peak chars — exact int64
        (stages/dialog.context_cost; text never crosses the shuffle)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import context_cost

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "text"])
        return context_cost(turns)

    def q_transcripts_role_balance(sf):
        """Per-conversation user/assistant volume balance + character
        ratio — pure combiner, conditional partials folded per batch
        (stages/dialog.role_balance)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import role_balance

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "role", "text"])
        return _round_floats(role_balance(turns))

    def q_transcripts_tool_usage(sf):
        """Per-tool usage profile: calls, exact distinct conversations,
        char volume, share of all calls (stages/dialog.tool_usage)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import tool_usage

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "tool", "text"])
        return _round_floats(tool_usage(turns))

    def q_transcripts_turn_dedup(sf):
        """Exact dedup over turn texts on the graft table: md5 group →
        lexicographic-min (conv, turn) survivor — the engine's keep-first
        dedup applied to transcripts (stages/dedup.exact_dedup_ids)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dedup import exact_dedup_ids

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "text"])

        def uid(t):
            return pa.table({
                "text": t["text"],
                "turn_uid": _pc.binary_join_element_wise(
                    t["conv_id"], _pc.cast(t["turn_idx"], pa.string()), "#"),
            })

        turns = turns.map_batches(uid, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return exact_dedup_ids(turns, text_col="text", id_col="turn_uid")

    def q_transcripts_len_quantiles_by_role(sf):
        """Exact per-role p50/p90/p99 of turn character length — the
        distributed value-histogram quantile op on the transcript axis
        (stages/quantile.grouped_quantiles)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        turns = read_table(_transcripts_for(sf), columns=["role", "text"])

        def chars(t):
            return pa.table({
                "role": t["role"],
                "chars": _pc.cast(_pc.utf8_length(t["text"]), pa.int64()),
            })

        turns = turns.map_batches(chars, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return grouped_quantiles(turns, value_col="chars", keys=["role"],
                                 quantiles=(0.5, 0.9, 0.99))

    def q_transcripts_hourly_activity(sf):
        """Hour-of-day load profile: turns, tool calls, exact distinct
        active conversations per hour (stages/dialog.hourly_profile)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import hourly_profile

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "ts", "tool"])
        return hourly_profile(turns)

    def q_docs_lexical_diversity(sf):
        """Per-doc vocabulary richness: type–token ratio + hapax ratio —
        shuffle-free per-batch token histograms
        (stages/text.lexical_diversity)."""
        from s_tsfe_dl_ray.stages.text import lexical_diversity

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        return _round_floats(lexical_diversity(docs))

    def q_events_interarrival(sf):
        """Per-user event-cadence profile: gap count, mean/min/max and
        variance of inter-arrival seconds — exact µs integer core
        (stages/features.interarrival_stats)."""
        from s_tsfe_dl_ray.stages.features import interarrival_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(interarrival_stats(
            ds, key="user_id", ts_col="ts", id_col="event_id"))

    def q_events_type_transitions(sf):
        """Event-type Markov transition matrix per user stream — the
        dialog transition op generalized to event streams with a
        (ts, event_id) order tiebreak (stages/dialog.role_transitions)."""
        from s_tsfe_dl_ray.stages.dialog import role_transitions

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(role_transitions(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_transcripts_final_role(sf):
        """Conversation outcome distribution: which role speaks last —
        latest-per-key composed with a tiny fold
        (stages/dialog.final_role_distribution)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import final_role_distribution

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role"])
        return _round_floats(final_role_distribution(turns))

    def q_events_benford(sf):
        """First-significant-digit distribution per event type vs
        Benford's law — digit from the exact scaled int, never float
        log10 (stages/distinct.benford_profile)."""
        from s_tsfe_dl_ray.stages.distinct import benford_profile

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(benford_profile(
            ds, group_col="event_type", value_col="value"))

    def q_transcripts_tool_transitions(sf):
        """Tool→next-tool Markov matrix over each conversation's tool
        sequence (which tool follows which) — the transitions op on the
        tool-turn subsequence (stages/dialog.role_transitions after a
        tool filter)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import role_transitions

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "tool"])
        turns = turns.map_batches(
            lambda t: t.filter(_pc.not_equal(t["tool"], "")),
            batch_format="pyarrow", zero_copy_batch=True)
        return _round_floats(role_transitions(
            turns, conv_col="conv_id", order_col="turn_idx",
            role_col="tool"))

    def q_transcripts_tool_latency(sf):
        """Per-conversation tool→assistant consumption latency: for every
        tool turn, time to the next assistant turn — the reply-latency
        scan with swapped roles (stages/dialog.reply_latency)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import reply_latency

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role"])
        return _round_floats(reply_latency(
            turns, conv_col="conv_id", ts_col="ts",
            order_by=["ts", "turn_idx"], from_role="tool",
            to_role="assistant"))

    def q_events_key_skew(sf):
        """One-row skew diagnostic of user_id as a partition key —
        cardinality, rows-per-key quantiles, hottest-key share, HHI
        (stages/distinct.key_skew_profile; the numbers salting decisions
        are made from)."""
        from s_tsfe_dl_ray.stages.distinct import key_skew_profile

        ds = read_events(sf, columns=["user_id"])
        return _round_floats(key_skew_profile(ds, key="user_id"))

    def q_events_energy_chunks(sf):
        """NTILE(10)-segmented energy shares per user series — exact
        scaled-int energies, ntile remainders to the leading chunks
        (stages/features.energy_by_chunks)."""
        from s_tsfe_dl_ray.stages.features import energy_by_chunks

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(energy_by_chunks(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    # ---- round-4d wave: TPC-H completion over the available columns ----

    def q_tpch_q6_forecast_revenue(sf):
        """Discount-band revenue scan (Q6 skeleton): all three predicates
        pushed into the parquet read, exact int64 product through one
        global combiner cell (pipelines/tpch.q6_forecast_revenue)."""
        from s_tsfe_dl_ray.pipelines.tpch import q6_forecast_revenue

        return _round_floats(q6_forecast_revenue(sf))

    def q_tpch_q8_market_share(sf):
        """Target-nation revenue share per order year within one region
        (Q8 skeleton): semi-join part prune, broadcast nation⋈region
        flags, early (year, suppkey) fold
        (pipelines/tpch.q8_market_share)."""
        from s_tsfe_dl_ray.pipelines.tpch import q8_market_share

        return _round_floats(q8_market_share(sf))

    def q_tpch_q13_order_counts(sf):
        """Customer order-count histogram including zero-order customers
        (Q13 skeleton): combiner fold, LEFT hash join, null→0, second
        tiny fold (pipelines/tpch.q13_order_count_distribution)."""
        from s_tsfe_dl_ray.pipelines.tpch import q13_order_count_distribution

        return q13_order_count_distribution(sf)

    def q_tpch_q15_top_supplier(sf):
        """Top supplier(s) by quarter revenue (Q15 skeleton): revenue
        view folded once, exact int64 MAX subquery, equality cut
        (pipelines/tpch.q15_top_supplier)."""
        from s_tsfe_dl_ray.pipelines.tpch import q15_top_supplier

        return _round_floats(q15_top_supplier(sf))

    def q_tpch_q17_small_qty(sf):
        """Avg yearly revenue below 0.2× the part's mean quantity (Q17
        skeleton): correlated AVG as a two-pass fold+rejoin over the
        brand-pruned slice (pipelines/tpch.q17_small_quantity_revenue)."""
        from s_tsfe_dl_ray.pipelines.tpch import q17_small_quantity_revenue

        return _round_floats(q17_small_quantity_revenue(sf))

    def q_tpch_q22_dormant_customers(sf):
        """Above-average-balance customers with no recent order, by
        nation (Q22 skeleton): exact driver-side AVG fold + date-pruned
        anti_join (pipelines/tpch.q22_global_sales_opportunity)."""
        from s_tsfe_dl_ray.pipelines.tpch import q22_global_sales_opportunity

        return _round_floats(q22_global_sales_opportunity(sf))

    # ---- round-4e wave: contamination / complexity / AR fit / budget ---

    def q_docs_contamination(sf):
        """Pairwise trigram contamination between sources — distinct
        (source, gram) combiner, gram-partitioned pair expansion,
        overlap coefficient + Jaccard (stages/text.ngram_contamination)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.text import ngram_contamination

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["source", "text"])
        return _round_floats(ngram_contamination(docs, group_col="source"))

    def q_events_perm_entropy(sf):
        """Per-user order-3 permutation entropy (Bandt–Pompe ordinal
        patterns; ties rank by recency) —
        stages/features.permutation_entropy."""
        from s_tsfe_dl_ray.stages.features import permutation_entropy

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(permutation_entropy(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_ar2(sf):
        """Per-user AR(2) Yule–Walker fit from mean-centered
        autocovariance sums (stages/trend.ar2_yule_walker)."""
        from s_tsfe_dl_ray.stages.trend import ar2_yule_walker

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ar2_yule_walker(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_transcripts_context_budget(sf):
        """Per-conversation 512-token context-window truncation audit —
        leading-prefix fit counts and dropped tokens, int64-exact
        (stages/dialog.context_budget)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import context_budget

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "text"])
        return context_budget(turns, budget_tokens=512)

    def q_transcripts_watermark_rollup(sf):
        """Event-time hourly rollup with a per-conversation watermark:
        turns arriving >2 min behind the running max event time (the
        synth corpus's planted disorder) are dropped and counted —
        stages/stream.watermark_rollup."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.stream import watermark_rollup

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "text"])

        def derive(t):
            import pyarrow.compute as pc
            import pyarrow as pa

            return pa.table({
                "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
                "ts": t["ts"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.float64()),
            })

        turns = turns.map_batches(derive, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return _round_floats(watermark_rollup(
            turns, key="conv_id", ts_col="ts", arrival_col="turn_idx",
            value_col="n_chars", window="1h",
            allowed_lateness_us=120_000_000))

    def q_events_spectral_power(sf):
        """Per-user single-bin DFT power at daily/weekly periods
        (Goertzel probe over mean-centered values, per-key epoch) —
        stages/features.spectral_power."""
        from s_tsfe_dl_ray.stages.features import spectral_power

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(spectral_power(
            ds, key="user_id", ts_col="ts", value_col="value"))

    def q_events_column_profile(sf):
        """Data-quality profile of the events table: per-column row/null
        counts, exact distinct cardinality, typed min/max
        (stages/distinct.column_profile)."""
        from s_tsfe_dl_ray.stages.distinct import column_profile

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(column_profile(
            ds, columns=["user_id", "event_type", "value"]))

    def q_events_peak_rate_1h(sf):
        """Per-user peak sliding-1h event rate (rate-limit audit):
        RANGE-window count argmax via per-key-lifted binary search, µs
        integers end-to-end (stages/stream.peak_sliding_rate)."""
        from s_tsfe_dl_ray.stages.stream import peak_sliding_rate

        ds = read_events(sf, columns=["user_id", "ts"])
        return peak_sliding_rate(ds, key="user_id", ts_col="ts",
                                 window_us=3_600_000_000)

    def q_events_decayed_type_counts(sf):
        """Time-decayed popularity per event type (half-life 12 h,
        horizon = corpus max ts) — stages/distinct.decayed_counts."""
        from s_tsfe_dl_ray.stages.distinct import decayed_counts

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(decayed_counts(
            ds, key_col="event_type", ts_col="ts",
            half_life_us=43_200_000_000))

    def q_emb_dedup_cluster_sizes(sf):
        """Cluster-size histogram of the near-dup components — how much
        of the corpus is pairwise-duplicated, at what multiplicity
        (composition: connected_components → size → histogram)."""
        from s_tsfe_dl_ray.stages.cluster import connected_components
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        pairs = embedding_neardup_pairs(ds, threshold=0.4)
        comp = connected_components(pairs)

        def one(t):
            import pyarrow as pa
            import numpy as np

            return t.append_column(
                "n", pa.array(np.ones(t.num_rows, dtype=np.int64)))

        sizes = _grouped_min(
            comp.map_batches(one, batch_format="pyarrow"),
            group_cols=["component"], agg_cols=[("n", "sum")],
            pkey_col="component", num_partitions=8)

        def rename(t):
            import pyarrow as pa
            import numpy as np

            return pa.table({
                "cluster_size": t["n"],
                "n_clusters": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            })

        hist = _grouped_min(
            sizes.map_batches(rename, batch_format="pyarrow"),
            group_cols=["cluster_size"], agg_cols=[("n_clusters", "sum")],
            pkey_col="cluster_size", num_partitions=1)
        return hist.sort("cluster_size")

    def q_events_quantile_tiers_1h(sf):
        """Continuous-aggregate percentiles: hourly p50/p95/p99 produced
        by MERGING the 1m tier's t-digest state (raw data read once) —
        stages/quantile.tiered_quantile_digest.  Rows-only: sketch
        estimates are state-dependent; the cascade-vs-exact envelope is
        property-tested."""
        from s_tsfe_dl_ray.stages.quantile import tiered_quantile_digest

        ds = read_events(sf, columns=["ts", "value"])
        tiers = tiered_quantile_digest(ds, ts_col="ts", value_col="value",
                                       tiers=("1m", "1h"))
        return _round_floats(tiers["1h"].sort("window_start"))

    def q_docs_source_lang_chi2(sf):
        """Pearson χ² independence of (source, lang) + Cramér's V — the
        stratification-balance check (stages/distinct.chi2_independence)."""
        from s_tsfe_dl_ray.stages.distinct import chi2_independence

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["source", "lang"])
        return _round_floats(chi2_independence(
            docs, col_a="source", col_b="lang"))

    def q_events_rollup_1h_delta(sf):
        """Hour-over-hour change per user: the 1h rollup tier composed
        with the lag/delta ordered scan — continuous-aggregate output
        consumed as a first-class input (stage composition)."""
        tier = events_tiers(sf, ("1m", "1h"))["1h"]
        narrow = tier.select_columns(["user_id", "window_start",
                                      "n_events"])
        return _round_floats(ordered_scan(
            narrow, keys=["user_id"], order_by=["window_start"],
            scans={"n_prev": ("n_events", "lag"),
                   "n_delta": ("n_events", "delta")}))

    def q_emb_quantize_error(sf):
        """Per-vector uint8 min-max quantization reconstruction error
        (×1e6) — the embedding-store compression audit
        (stages/similarity.quantize_error)."""
        from s_tsfe_dl_ray.stages.similarity import quantize_error

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(quantize_error(emb).sort("vec_id"))

    def q_events_active_users(sf):
        """Per-day exact DAU / trailing-7-day WAU / stickiness via the
        pair-expansion distinct-window op (stages/activity.active_users)."""
        from s_tsfe_dl_ray.stages.activity import active_users

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(active_users(ds).sort("day"))

    def q_events_new_returning(sf):
        """Per-day new-vs-returning distinct user split
        (stages/activity.new_vs_returning)."""
        from s_tsfe_dl_ray.stages.activity import new_vs_returning

        ds = read_events(sf, columns=["user_id", "ts"])
        return new_vs_returning(ds).sort("day")

    def q_events_funnel_latency(sf):
        """Time-to-convert per funnel stage pair: count, exact mean
        seconds, exact discrete p50/p90 latency in microseconds
        (stages/funnel.funnel_latency)."""
        from s_tsfe_dl_ray.stages.funnel import funnel_latency

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return _round_floats(funnel_latency(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        ).sort("stage_from"))

    def q_events_anova_f(sf):
        """One-way ANOVA F / eta-squared of value across event types
        (stages/robust.anova_oneway)."""
        from s_tsfe_dl_ray.stages.robust import anova_oneway

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(anova_oneway(
            ds, group_col="event_type", value_col="value"))

    def q_transcripts_prompt_ols(sf):
        """Corpus OLS of assistant reply token length on the adjacent
        preceding user turn's token length — exact int64 moment sums
        (stages/dialog.prompt_response_ols)."""
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.dialog import prompt_response_ols

        ds = read_transcripts(
            _transcripts_for(sf),
            columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(prompt_response_ols(ds))

    def q_events_wau_hll(sf):
        """Approximate trailing-7-day active users via HLL pane
        composition — the long-window scale path for active_users
        (stages/activity.active_users_approx).  Rows-only: sketch
        estimates have no SQL twin; tests/test_activity.py pins the
        error envelope against the exact op."""
        from s_tsfe_dl_ray.stages.activity import active_users_approx

        ds = read_events(sf, columns=["user_id", "ts"])
        return active_users_approx(ds).sort("day")

    def q_tpch_integrity_audit(sf):
        """Referential-integrity audit across the star schema's seven
        FK→PK relationships: child rows / distinct keys / orphan rows /
        orphan keys per edge (stages/join.referential_orphans)."""
        from s_tsfe_dl_ray.stages.join import referential_orphans

        rels = [
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem", "l_partkey", "part", "p_partkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey"),
            ("nation", "n_regionkey", "region", "r_regionkey"),
        ]
        out = None
        for ctab, fk, ptab, pk in rels:
            child = read_table(f"{sf}/{ctab}.parquet", columns=[fk])
            parent = read_table(f"{sf}/{ptab}.parquet", columns=[pk])
            one = referential_orphans(
                child, parent, fk=fk, pk=pk,
                relationship=f"{ctab}.{fk}->{ptab}.{pk}")
            out = one if out is None else out.union(one)
        return out.sort("relationship")

    def q_events_type_cond_entropy(sf):
        """Conditional next-type entropy H(next|from) in bits per source
        event type — predictability of the per-user event-type Markov
        chain (stages/dialog.transition_entropy)."""
        from s_tsfe_dl_ray.stages.dialog import transition_entropy

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(transition_entropy(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_orders_lineitem_join_salted(sf):
        """The orders ⋈ lineitem revenue rollup routed through the
        skew-aware salted join (stages/join.salted_join): identical
        result to the plain hash join — salting only changes routing —
        so it shares the plain join's oracle."""
        import ray.data

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.join import salted_join

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
        )
        lineitem = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )
        joined = salted_join(
            lineitem, orders, left_on="l_orderkey", right_on="o_orderkey",
            hot_keys=[1, 7, 13, 32, 33], salt=4)

        def rev_i(t: pa.Table) -> pa.Table:
            price_i = pc.cast(pc.round(pc.multiply(
                t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
            disc_i = pc.cast(pc.round(pc.multiply(
                t["l_discount"], pa.scalar(100.0))), pa.int64())
            return t.append_column(
                "revenue_i", pc.multiply(
                    price_i, pc.subtract(pa.scalar(100, pa.int64()), disc_i)))

        joined = joined.map_batches(rev_i, batch_format="pyarrow")
        agg = grouped_aggregate(
            joined, keys=["o_orderstatus"],
            aggs={"n_items": ("revenue_i", "count"),
                  "revenue_sum_i": ("revenue_i", "sum")},
        )

        def fin(t: pa.Table) -> pa.Table:
            s = pc.divide(pc.cast(t["revenue_sum_i"], pa.float64()),
                          pa.scalar(10_000.0))
            return pa.table({
                "o_orderstatus": t["o_orderstatus"],
                "n_items": t["n_items"],
                "revenue_sum": s,
                "revenue_mean": pc.divide(
                    s, pc.cast(t["n_items"], pa.float64())),
            })

        return _round_floats(agg.map_batches(fin, batch_format="pyarrow"))

    def q_transcripts_latency_by_hour(sf):
        """Reply-latency SLA profile by prompt hour-of-day: count, exact
        mean, exact discrete p50/p95 (stages/dialog.reply_latency_by_hour)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import reply_latency_by_hour

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role"])
        return _round_floats(reply_latency_by_hour(
            turns, order_by=["ts", "turn_idx"]).sort("hour"))

    def q_emb_norm_stats(sf):
        """Per-label L2-norm profile of the embedding store
        (stages/similarity.norm_stats)."""
        from s_tsfe_dl_ray.stages.similarity import norm_stats

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["label", "embedding"])
        return _round_floats(norm_stats(emb).sort("label"))

    def q_emb_kmeans_silhouette(sf):
        """Per-cluster simplified silhouette of the Lloyd k-means fit
        (stages/similarity.kmeans_silhouette).  Rows-only: iterative
        fit has no SQL twin; tests/test_similarity.py pins planted
        recovery."""
        from s_tsfe_dl_ray.stages.similarity import kmeans_silhouette

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(kmeans_silhouette(emb, n_clusters=8)
                             .sort("cluster"))

    def q_events_session_conversion(sf):
        """Share of 30m inactivity-gap sessions containing a purchase
        (stages/sessionize.session_conversion)."""
        from s_tsfe_dl_ray.stages.sessionize import session_conversion

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(session_conversion(
            ds, keys=["user_id"], ts_col="ts", type_col="event_type",
            target="purchase", order_by=["ts", "event_id"], gap="30m"))

    def q_parquet_layout_audit(sf):
        """Footer-only physical-layout audit (rows / columns / bytes per
        row group) of the correctness-scale tables — PINNED to sf0.01
        like the transcript corpus so the SQL twin can name concrete
        paths (sources/parquet.parquet_layout_audit)."""
        from s_tsfe_dl_ray.sources.parquet import parquet_layout_audit

        paths = [f"/root/testdata/sf0.01/{t}.parquet"
                 for t in ("events", "lineitem", "documents", "embeddings")]
        return parquet_layout_audit(paths).sort(
            ["file_name", "row_group_id"])

    def q_emb_pq_distortion(sf):
        """Product-quantization reconstruction error (m=8 subspaces,
        16 codes) per vector (stages/similarity.pq_distortion).
        Rows-only: iterative codebook fit has no SQL twin;
        tests/test_similarity.py pins planted-codebook recovery and
        monotone-in-codes distortion."""
        from s_tsfe_dl_ray.stages.similarity import pq_distortion

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(pq_distortion(emb).sort("vec_id"))

    def q_docs_source_ks(sf):
        """Per-language two-sample KS D between src0 and src1 document
        lengths — source drift detection over the docs table, the same
        exact rational-ECDF op the events query verifies
        (stages/robust.ks_test)."""
        from s_tsfe_dl_ray.stages.robust import ks_test

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["lang", "source", "n_chars"])
        return _round_floats(ks_test(
            docs, key="lang", group_col="source", value_col="n_chars",
            group_a="src0", group_b="src1"))

    def q_events_weekly_profile(sf):
        """Hour-of-week seasonality profile: event count and mean value
        per (day-of-week, hour-of-day) cell — one combiner pass over a
        derived 168-cell key (pipelines/relational.grouped_aggregate)."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_events(sf, columns=["ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            days = us // 86_400_000_000
            # epoch day 0 = Thursday; ISO dow (Mon=1..Sun=7)
            dow = ((days + 3) % 7) + 1
            hour = (us // 3_600_000_000) % 24
            import numpy as np
            return pa.table({
                "dow": pa.array(dow.astype(np.int64)),
                "hour": pa.array(hour.astype(np.int64)),
                "value": t["value"],
            })

        cells = ds.map_batches(derive, batch_format="pyarrow",
                               zero_copy_batch=True)
        agg = grouped_aggregate(
            cells, keys=["dow", "hour"],
            aggs={"n_events": ("value", "count"),
                  "value_sum": ("value", "sum")})

        def fin(t: pa.Table) -> pa.Table:
            return pa.table({
                "dow": t["dow"], "hour": t["hour"],
                "n_events": t["n_events"],
                "value_mean": pc.divide(
                    pc.cast(t["value_sum"], pa.float64()),
                    pc.cast(t["n_events"], pa.float64())),
            })

        return _round_floats(agg.map_batches(fin, batch_format="pyarrow")
                             .sort(["dow", "hour"]))

    def q_events_mase(sf):
        """Per-user seasonal-naive vs persistence forecast skill ratio
        at lag 24 (stages/trend.naive_forecast_ratio)."""
        from s_tsfe_dl_ray.stages.trend import naive_forecast_ratio

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(naive_forecast_ratio(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", season_lag=24))

    def q_events_priority_sample(sf):
        """Deterministic distributed uniform sample: the 100 events with
        the smallest md5(event_id) priority — cluster-size- and
        layout-invariant (stages/transform.priority_sample)."""
        from s_tsfe_dl_ray.stages.transform import priority_sample

        ds = read_events(sf, columns=["event_id", "value"])
        return _round_floats(priority_sample(ds, id_col="event_id", k=100))

    def q_events_cms_user_counts(sf):
        """Count-min point-frequency estimates for five probe users —
        the sketch-family frequency member
        (stages/distinct.count_min_sketch).  Rows-only: estimates are
        hash-dependent; tests/test_distinct.py pins the never-undercount
        and bounded-overcount guarantees."""
        from s_tsfe_dl_ray.stages.distinct import count_min_sketch

        ds = read_events(sf, columns=["user_id"])
        return count_min_sketch(
            ds, col="user_id",
            query_items=[1, 2, 3, 500, 999]).sort("item")

    def q_parquet_zonemap_audit(sf):
        """Per-column zone-map/statistics audit (read-pruning health) of
        the correctness-scale tables — pinned paths like the layout
        audit (sources/parquet.parquet_zonemap_audit)."""
        from s_tsfe_dl_ray.sources.parquet import parquet_zonemap_audit

        paths = [f"/root/testdata/sf0.01/{t}.parquet"
                 for t in ("events", "lineitem", "documents", "embeddings")]
        return parquet_zonemap_audit(paths).sort(
            ["file_name", "row_group_id", "column"])

    def q_parquet_compaction_plan(sf):
        """Greedy FFD compaction plan over the layout audit (pinned
        sf0.01 paths; sources/parquet.plan_compaction).  Rows-only by
        nature (a plan, not a query); tests pin bin-capacity and
        determinism."""
        from s_tsfe_dl_ray.sources.parquet import (
            parquet_layout_audit, plan_compaction)

        paths = [f"/root/testdata/sf0.01/{t}.parquet"
                 for t in ("events", "lineitem", "documents", "embeddings")]
        return plan_compaction(parquet_layout_audit(paths),
                               target_bytes=1 << 20)

    def q_events_k_anonymity(sf):
        """k-anonymity audit (k=5) of the (event_type, hour-of-day,
        day) quasi-identifier combination
        (stages/distinct.k_anonymity_audit)."""
        from s_tsfe_dl_ray.stages.distinct import k_anonymity_audit

        ds = read_events(sf, columns=["event_type", "ts"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            import numpy as np
            return pa.table({
                "event_type": t["event_type"],
                "day": pa.array((us // 86_400_000_000).astype(np.int64)),
                "hour": pa.array(((us // 3_600_000_000) % 24)
                                 .astype(np.int64)),
            })

        qi = ds.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)
        return k_anonymity_audit(qi, qi_cols=["event_type", "day", "hour"],
                                 k=5)

    def q_events_auc_by_user(sf):
        """Stratified exact mid-rank ROC-AUC per user segment — value as
        score, purchase as positive (stages/metrics.grouped_auc)."""
        from s_tsfe_dl_ray.stages.metrics import grouped_auc

        ds = read_events(sf, columns=["user_id", "event_type", "value"])

        def lab(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"], "score": t["value"],
                "y": pc.equal(t["event_type"], pa.scalar("purchase")),
            })

        labeled = ds.map_batches(lab, batch_format="pyarrow",
                                 zero_copy_batch=True)
        return _round_floats(grouped_auc(
            labeled, key="user_id", score_col="score", label_col="y"))

    def q_events_poincare(sf):
        """Poincaré SD1/SD2 variability descriptors of per-user
        inter-event intervals — the HRV summary of the reference's
        RR-interval domain (stages/trend.poincare_descriptors)."""
        from s_tsfe_dl_ray.stages.trend import poincare_descriptors

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(poincare_descriptors(
            ds, key="user_id", order_by=["ts", "event_id"], ts_col="ts"))

    def q_events_hrv(sf):
        """RMSSD / pNN(60s) successive-difference interval stats per
        user (stages/trend.hrv_stats)."""
        from s_tsfe_dl_ray.stages.trend import hrv_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(hrv_stats(
            ds, key="user_id", order_by=["ts", "event_id"], ts_col="ts",
            pnn_threshold_s=60.0))

    def q_transcripts_duration_stats(sf):
        """Conversation wall-duration distribution: count, exact mean,
        exact discrete p50/p95
        (stages/dialog.conversation_duration_stats)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import conversation_duration_stats

        turns = read_table(_transcripts_for(sf), columns=["conv_id", "ts"])
        return _round_floats(conversation_duration_stats(turns))

    def q_orders_lineitem_join_size(sf):
        """Exact orders ⋈ lineitem cardinality WITHOUT executing the
        join — count-product combiner (stages/join.join_size)."""
        from s_tsfe_dl_ray.stages.join import join_size

        orders = read_table(f"{sf}/orders.parquet", columns=["o_orderkey"])
        lineitem = read_table(f"{sf}/lineitem.parquet",
                              columns=["l_orderkey"])
        return join_size(orders, lineitem,
                         left_on="o_orderkey", right_on="l_orderkey")

    def q_docs_curation_job(sf):
        """Durable resumable docs-curation job (quality→lang→exact
        dedup with per-bucket lineage manifests) — runs into /tmp,
        reruns skip finished buckets, result == the streaming prep
        pipeline so it shares that oracle
        (pipelines/docs_job.DocsCurationJob)."""
        import hashlib as _hl

        import ray.data

        from s_tsfe_dl_ray.pipelines.docs_job import DocsCurationJob

        tag = _hl.md5(sf.encode()).hexdigest()[:10]
        out = f"/tmp/s_tsfe_dl_ray_docs_job_{tag}"
        DocsCurationJob(f"{sf}/documents.parquet", out, n_buckets=8).run()
        ds = ray.data.read_parquet(f"{out}/curated")
        return _round_floats(ds.sort("doc_id"))

    def q_emb_knn_ivf_pq(sf):
        """IVF-PQ approximate top-10 cosine neighbors — the last rung of
        the ANN ladder (stages/similarity.knn_ivf_pq).  Rows-only:
        PQ scores are approximations; tests/test_similarity.py pins
        recall and score fidelity against brute force."""
        from s_tsfe_dl_ray.stages.similarity import knn_ivf_pq

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(knn_ivf_pq(emb, n_queries=10, k=10,
                                        n_clusters=8, nprobe=4))

    def q_tpch_q5_local_suppliers(sf):
        """Local-supplier revenue per nation (Q5 skeleton): two big hash
        joins, region pushed into the customer scan, early fold to
        (nation, supplier) partials, same-nation predicate on the fold."""
        from s_tsfe_dl_ray.pipelines.tpch import q5_local_supplier_volume

        return _round_floats(q5_local_supplier_volume(sf))

    def q_tpch_q9_product_profit(sf):
        """Product profit per (supplier nation, order year) — Q9 adapted
        (no partsupp table: profit = discounted revenue).  Part filter as
        a semi join; partials fold before the supplier join."""
        from s_tsfe_dl_ray.pipelines.tpch import q9_product_profit

        return _round_floats(q9_product_profit(sf))

    def q_tpch_q21_waiting_supplier(sf):
        """Suppliers who kept multi-supplier 'F' orders waiting — Q21
        adapted to available columns (strictly-latest l_shipdate stands
        in for the receipt-delay EXISTS/NOT-EXISTS pair)."""
        from s_tsfe_dl_ray.pipelines.tpch import q21_waiting_supplier

        return q21_waiting_supplier(sf)

    def q_tpch_q2_min_cost_supplier(sf):
        """Min-cost supplier per part (Q2 skeleton; supply catalog derived
        from lineitem, cost = min unit price): two-fold correlated MIN +
        exact float-equality cut (pipelines/tpch.q2_min_cost_supplier)."""
        from s_tsfe_dl_ray.pipelines.tpch import q2_min_cost_supplier

        return _round_floats(q2_min_cost_supplier(sf))

    def q_tpch_q11_important_parts(sf):
        """Important-part values for one nation's suppliers (Q11 skeleton):
        HAVING over a global-sum subquery — int64 cents×qty fold, driver
        scalar, broadcast threshold (pipelines/tpch.q11_important_part_values)."""
        from s_tsfe_dl_ray.pipelines.tpch import q11_important_part_values

        return _round_floats(q11_important_part_values(sf))

    def q_tpch_q16_supplier_part_counts(sf):
        """Distinct-supplier counts per part attribute (Q16 skeleton):
        NOT-IN anti_join + two-level COUNT DISTINCT as two combiner folds
        (pipelines/tpch.q16_supplier_part_counts)."""
        from s_tsfe_dl_ray.pipelines.tpch import q16_supplier_part_counts

        return q16_supplier_part_counts(sf)

    def q_tpch_q20_window_demand(sf):
        """Nation suppliers whose window demand for prefix-named parts
        exceeded half their all-time volume (Q20 skeleton): nested EXISTS
        chain, all-integer predicate (pipelines/tpch.q20_window_demand_suppliers)."""
        from s_tsfe_dl_ray.pipelines.tpch import q20_window_demand_suppliers

        return q20_window_demand_suppliers(sf)

    def q_events_wilson_ci(sf):
        """Daily error-rate with Wilson 95% score interval: one combiner
        fold to exact (n, successes) counts, closed-form finalize as a
        fixed float64 expression tree (stages/metrics.wilson_rate_ci)."""
        from s_tsfe_dl_ray.stages.metrics import wilson_rate_ci

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(wilson_rate_ci(
            ds, ts_col="ts", type_col="event_type",
            success_value="error", tier="1d"))

    def q_events_lead_lag(sf):
        """Lead-lag Pearson sweep (lags −3..+3 hours) between the click
        and purchase hourly count series on the DENSE zero-filled grid —
        which signal moves first (stages/trend.lead_lag_xcorr)."""
        from s_tsfe_dl_ray.stages.trend import lead_lag_xcorr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(lead_lag_xcorr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h", max_lag=3))

    def q_events_target_encoding(sf):
        """Leave-one-out target encoding of event_type by value: int-cent
        category fold broadcast back as a shuffle-free per-row map
        (stages/transform.loo_target_encoding)."""
        from s_tsfe_dl_ray.stages.transform import loo_target_encoding

        ds = read_events(sf, columns=["event_id", "event_type", "value"])
        return _round_floats(loo_target_encoding(
            ds, key_col="event_type", value_col="value", id_col="event_id"))

    def q_transcripts_template_prefix(sf):
        """Conversation template detection: md5 fingerprint of the opening
        (role:text) turn per conversation, groups sharing a prefix
        with ≥2 members — boilerplate/template dedup for training corpora
        (composition: order_fingerprint over the prefix slice + one
        combiner fold)."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.scan import order_fingerprint

        ds = read_transcripts(_transcripts_for(sf),
                              columns=["conv_id", "turn_idx", "role", "text"])

        def prefix_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["turn_idx"], 1))
            return pa.table({
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "rt": pc.binary_join_element_wise(t["role"], t["text"], ":"),
            })

        fp = order_fingerprint(
            ds.map_batches(prefix_rows, batch_format="pyarrow",
                           zero_copy_batch=True),
            key="conv_id", order_by=["turn_idx"], col="rt")
        agg = grouped_aggregate(
            fp, keys=["fingerprint"],
            aggs={"n_convs": ("conv_id", "count"),
                  "first_conv": ("conv_id", "min")},
            num_partitions=8)
        out = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_convs"], 2)),
            batch_format="pyarrow", zero_copy_batch=True)
        return out.sort(["n_convs", "fingerprint"],
                        descending=[True, False])

    def q_events_pareto(sf):
        """Pareto concentration: smallest user set covering 80% of total
        value — per-key int-cent fold + one ordered finalize; k defined
        by counting (not argmax) so both sides agree even with negative
        values (stages/metrics.pareto_coverage)."""
        from s_tsfe_dl_ray.stages.metrics import pareto_coverage

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(pareto_coverage(
            ds, key_col="user_id", value_col="value", share=0.8))

    def q_transcripts_concurrency_1h(sf):
        """Hourly open-conversation concurrency profile: per-conv
        (min ts, max ts) combiner fold, window-range expand, tiny count
        fold (stages/activity.active_interval_counts)."""
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.activity import active_interval_counts

        ds = read_transcripts(_transcripts_for(sf),
                              columns=["conv_id", "ts"])
        return active_interval_counts(ds, key="conv_id", ts_col="ts",
                                      tier="1h")

    def q_docs_containment(sf):
        """Sub-document duplication: word-3-gram containment
        (inter / min size) ≥ 0.8 pairs — the asymmetric overlap that
        catches quote-and-pad duplication Jaccard misses
        (stages/dedup.ngram_jaccard_pairs score='containment')."""
        from s_tsfe_dl_ray.stages.dedup import ngram_jaccard_pairs

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        return _round_floats(ngram_jaccard_pairs(
            ds, id_col="doc_id", n=3, threshold=0.8, score="containment"))

    def q_transcripts_cache_savings(sf):
        """Prefix-cache billing simulation per conversation: full-history
        re-read cost (Σ prefix chars) vs cache-hit cost (each char paid
        once) and the savings ratio — the LLM-serving economics readout
        (composition over stages/dialog.context_cost; exact int64)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import context_cost

        cc = context_cost(read_table(
            _transcripts_for(sf), columns=["conv_id", "turn_idx", "text"]))

        def fin(t: pa.Table) -> pa.Table:
            cost = t["context_cost"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            total = t["total_chars"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                ratio = (cost - total) / cost
            ratio = np.where(np.isfinite(ratio), ratio, np.nan)
            return pa.table({
                "conv_id": t["conv_id"],
                "n_turns": t["n_turns"],
                "billed_full_history": t["context_cost"],
                "billed_prefix_cache": t["total_chars"],
                "savings_ratio": pa.array(ratio, pa.float64()),
            })

        return _round_floats(cc.map_batches(fin, batch_format="pyarrow"))

    def q_events_rate_limit(sf):
        """Fixed-window rate-limiter dry run: windows where a per-user
        budget of 2 events/hour would drop traffic — one combiner fold,
        all-integer (stages/stream.rate_limit_drops)."""
        from s_tsfe_dl_ray.stages.stream import rate_limit_drops

        ds = read_events(sf, columns=["user_id", "ts"])
        return rate_limit_drops(ds, key="user_id", ts_col="ts",
                                tier="1h", limit=2)

    def q_docs_minhash_recall(sf):
        """LSH dedup quality audit: recall of the banded MinHash route
        against the exact all-pairs n-gram Jaccard ground truth on the
        SAME (non-strict) shingle basis — the acceptance gate before
        trusting banding parameters at scale (precision is 1.0 by
        construction: candidates are exact-verified).  Rows-only
        (the LSH side is not SQL-expressible); pair sets are audit-sized
        (above-threshold pairs only)."""
        import pandas as _pd

        from s_tsfe_dl_ray.stages.dedup import (minhash_dedup_pairs,
                                                ngram_jaccard_pairs)

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        truth_df = ngram_jaccard_pairs(
            ds, id_col="doc_id", n=3, threshold=0.5,
            strict=False).to_pandas()
        found_df = minhash_dedup_pairs(
            ds, id_col="doc_id", threshold=0.5).to_pandas()
        t = set(zip(truth_df.id_a, truth_df.id_b))
        f = set(zip(found_df.id_a, found_df.id_b))
        hit = len(t & f)
        return _pd.DataFrame({
            "n_true": _pd.Series([len(t)], dtype="int64"),
            "n_found": _pd.Series([len(f)], dtype="int64"),
            "n_hit": _pd.Series([hit], dtype="int64"),
            "recall": [hit / len(t) if t else float("nan")],
            "precision": [hit / len(f) if f else float("nan")],
        })

    def q_events_top_paths(sf):
        """User-journey mining: top-20 session entry paths (first 5 event
        types per 30m-gap session, joined a>b>c) with session counts —
        one key exchange + combiner count, deterministic top-k cut
        (stages/sessionize.session_paths)."""
        from s_tsfe_dl_ray.stages.sessionize import session_paths

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return session_paths(ds, key="user_id", ts_col="ts",
                             type_col="event_type",
                             order_by=["ts", "event_id"], gap="30m",
                             max_steps=5, k=20)

    def q_events_return_level(sf):
        """Tail-risk extrapolation: Gumbel method-of-moments over daily
        block maxima → 100-day return level — exact int-cent maxima and
        moment sums, shared constant literals both sides
        (stages/robust.gumbel_return_level)."""
        from s_tsfe_dl_ray.stages.robust import gumbel_return_level

        ds = read_events(sf, columns=["ts", "value"])
        return _round_floats(gumbel_return_level(
            ds, ts_col="ts", value_col="value", tier="1d",
            return_period=100.0))

    def q_docs_mixture_weights(sf):
        """Data-mixing readout: per-source corpus share and the
        sqrt-temperature sampling weight RELATIVE TO THE LARGEST source
        (sqrt(n/n_max) — a single division + sqrt, bit-deterministic;
        a sum-normalized weight would depend on float summation order).
        One combiner count fold + tiny finalize."""
        import pandas as _pd

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "source"])
        counts = grouped_aggregate(
            ds.map_batches(
                lambda t: pa.table({
                    "source": t["source"],
                    "one": pc.cast(pc.is_valid(t["source"]), pa.int64())}),
                batch_format="pyarrow"),
            keys=["source"], aggs={"n_docs": ("one", "sum")},
            num_partitions=4)

        def fin(df: _pd.DataFrame) -> _pd.DataFrame:
            if len(df) == 0:
                return _pd.DataFrame({
                    "source": _pd.Series([], dtype="object"),
                    "n_docs": _pd.Series([], dtype="int64"),
                    "share": _pd.Series([], dtype="float64"),
                    "rel_weight": _pd.Series([], dtype="float64")})
            df = df.sort_values("source", kind="mergesort")
            n = df["n_docs"].to_numpy(dtype=np.int64)
            tot = np.float64(n.sum())
            mx = np.float64(n.max())
            return _pd.DataFrame({
                "source": df["source"].to_numpy(),
                "n_docs": n,
                "share": n.astype(np.float64) / tot,
                "rel_weight": np.sqrt(n.astype(np.float64) / mx)})

        return _round_floats(counts.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None))

    def q_parts_family_clusters(sf):
        """Product-family mining: connected components over the part
        co-purchase graph (edges = pairs co-purchased in ≥3 orders) →
        component size histogram — pair_cooccurrence × the dedup
        machinery's label-propagation CC, labels checked against the
        recursive-CTE oracle."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.cluster import connected_components
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        import ray.data as _rd

        li = _rd.read_parquet(f"{sf}/lineitem.parquet",
                              columns=["l_orderkey", "l_partkey"])
        pairs = pair_cooccurrence(li, group_col="l_orderkey",
                                  member_col="l_partkey")             .filter(expr="n_both >= 3")             .map_batches(lambda t: pa.table({"id_a": t["member_a"],
                                             "id_b": t["member_b"]}),
                         batch_format="pyarrow")
        comp = connected_components(pairs, id_a="id_a", id_b="id_b")
        agg = grouped_aggregate(
            comp.map_batches(
                lambda t: pa.table({
                    "component": t["component"],
                    "one": pc.cast(pc.is_valid(t["component"]),
                                   pa.int64())}),
                batch_format="pyarrow"),
            keys=["component"], aggs={"n_parts": ("one", "sum")},
            num_partitions=4)
        return agg.sort(["n_parts", "component"],
                        descending=[True, False])

    def q_transcripts_tool_latency_quantiles(sf):
        """Per-tool SLA percentiles: p50/p90 round-trip latency (call →
        next assistant turn) in exact integer µs — tool_call_latencies ×
        grouped_quantiles, quantile_disc twin."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import tool_call_latencies
        from s_tsfe_dl_ray.stages.join import hash_join
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role",
                                    "tool"])
        lats = tool_call_latencies(turns, order_by=["ts", "turn_idx"])
        qs = grouped_quantiles(lats, value_col="lat_us", keys=["tool"],
                               quantiles=(0.5, 0.9))
        counts = grouped_aggregate(
            lats.map_batches(
                lambda t: pa.table({
                    "tool": t["tool"],
                    "one": pc.cast(pc.is_valid(t["tool"]), pa.int64())}),
                batch_format="pyarrow"),
            keys=["tool"], aggs={"n_calls": ("one", "sum")},
            num_partitions=4)
        j = hash_join(qs, counts.rename_columns({"tool": "tool_r"}),
                      left_on="tool", right_on="tool_r", num_partitions=4)
        return j.map_batches(
            lambda t: pa.table({
                "tool": t["tool"],
                "n_calls": t["n_calls"],
                "p50_us": t["q_50"],
                "p90_us": t["q_90"],
            }), batch_format="pyarrow").sort("tool")


    def q_events_page_hinkley(sf):
        """Per-user Page-Hinkley drift statistic over the running mean -
        ordered cumulative folds bit-identical to the windowed SQL twin
        (stages/robust.page_hinkley)."""
        from s_tsfe_dl_ray.stages.robust import page_hinkley

        ds = read_events(sf, columns=["user_id", "ts", "event_id", "value"])
        return _round_floats(page_hinkley(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id", delta=0.05, threshold=5.0))

    def q_events_adf(sf):
        """Lag-0 Dickey-Fuller stationarity probe per user: unit-root
        coefficient + t-stat from exact int-cent segment moments
        (stages/trend.adf_test)."""
        from s_tsfe_dl_ray.stages.trend import adf_test

        ds = read_events(sf, columns=["user_id", "ts", "event_id", "value"])
        return _round_floats(adf_test(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_welch_ttest(sf):
        """Welch unequal-variance t-test click-vs-purchase value means,
        with Satterthwaite dof - exact int-cent moments, fixed float
        tree (stages/robust.welch_ttest)."""
        from s_tsfe_dl_ray.stages.robust import welch_ttest

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(welch_ttest(
            ds, group_col="event_type", value_col="value",
            group_a="click", group_b="purchase"))

    def q_events_tukey_hsd(sf):
        """Tukey HSD post-hoc pair table after the ANOVA: which event-type
        value means differ - studentized-range q per pair from exact
        int-cent moments (stages/robust.tukey_hsd)."""
        from s_tsfe_dl_ray.stages.robust import tukey_hsd

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(tukey_hsd(
            ds, group_col="event_type", value_col="value"))

    def q_events_ndcg(sf):
        """Per-user NDCG@5 of the frequency-baseline recommender: rank
        types by first-half counts, score against second-half counts
        (stages/metrics.ndcg_at_k)."""
        from s_tsfe_dl_ray.stages.metrics import ndcg_at_k

        ds = read_events(sf, columns=["user_id", "event_type", "ts",
                                      "event_id"])
        return _round_floats(ndcg_at_k(
            ds, key="user_id", item_col="event_type", ts_col="ts",
            id_col="event_id", k=5))

    def q_transcripts_verbosity_trend(sf):
        """Per-conversation OLS slope of assistant reply length vs turn
        index - does the assistant get wordier as the dialog progresses
        (stages/dialog.verbosity_trend)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import verbosity_trend

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(verbosity_trend(turns))

    def q_docs_boilerplate(sf):
        """C4-style boilerplate detection: non-overlapping 8-word segments
        recurring across >= 3 distinct documents, deterministic top-20
        (stages/text.boilerplate_segments)."""
        from s_tsfe_dl_ray.stages.text import boilerplate_segments

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        return boilerplate_segments(ds, seg_len=8, min_docs=3, k=20)

    def q_transcripts_position_profile(sf):
        """Turn-length drift across conversation position: per (role,
        position decile) turn count + mean token length — one conv-hash
        exchange, text folded to int64 before the shuffle
        (stages/dialog.position_profile)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import position_profile

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(position_profile(turns))

    def q_emb_dim_variance(sf):
        """Per-dimension mean + sample variance of the embedding matrix
        (feature-variance profile) — two-pass centered moments, d-row
        partials per batch (stages/similarity.dim_moments)."""
        from s_tsfe_dl_ray.stages.similarity import dim_moments

        emb = read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        return _round_floats(dim_moments(emb))

    def q_events_gini_users(sf):
        """Gini coefficient of per-user activity inside each event type —
        counts fold combiner-side, rank sum exact int64
        (stages/activity.activity_gini)."""
        from s_tsfe_dl_ray.stages.activity import activity_gini

        ds = read_events(sf, columns=["event_type", "user_id"])
        return _round_floats(activity_gini(ds))

    def q_events_record_highs(sf):
        """All-time-high record statistics per user (count, last record
        time, standing record) — ordered per-key scan, vectorized
        shifted cummax (stages/scan.record_highs)."""
        from s_tsfe_dl_ray.stages.scan import record_highs

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(record_highs(ds))

    def q_events_stl_strength(sf):
        """MA-detrended STL-lite per event type: seasonal/trend strength
        from the residual variance (stages/trend.stl_lite) — combiner
        hour counts, per-key vectorized decomposition."""
        from s_tsfe_dl_ray.stages.trend import stl_lite

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(stl_lite(ds))

    def q_docs_dup_rate_by_source(sf):
        """Exact-dup contamination rate per source — text-hash partition,
        dup membership marked vectorized, per-source partials
        (stages/dedup.dup_rate_by_group)."""
        from s_tsfe_dl_ray.stages.dedup import dup_rate_by_group

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["text", "source"])
        return _round_floats(dup_rate_by_group(docs))

    def q_emb_label_separability(sf):
        """Mean pairwise intra-label cosine via the ‖Σv̂‖²−Σ‖v̂‖² combiner
        identity — O(n²) pair sum, zero pairs materialized
        (stages/similarity.label_separability)."""
        from s_tsfe_dl_ray.stages.similarity import label_separability

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
        return _round_floats(label_separability(emb).sort("label"))

    def q_events_ljung_box(sf):
        """Ljung–Box white-noise Q per user (standard full-series-moment
        acf estimator, lags 1–3) — the forecastability gate in front of
        holt/ar2 (stages/trend.ljung_box)."""
        from s_tsfe_dl_ray.stages.trend import ljung_box

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(ljung_box(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]).sort("user_id"))

    def q_lineitem_part_pairs(sf):
        """Market-basket over the star schema: part pairs co-purchased in
        the same order with support ≥ 2, lift + Jaccard — the generic
        pair_cooccurrence op composed onto (order, part) instead of
        (user, event_type)."""
        import ray.data

        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        li = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                   columns=["l_orderkey", "l_partkey"])
        pairs = pair_cooccurrence(li, group_col="l_orderkey",
                                  member_col="l_partkey")
        pairs = pairs.filter(expr="n_both >= 2")
        return _round_floats(pairs.sort(
            ["n_both", "member_a", "member_b"],
            descending=[True, False, False]))

    def q_events_als_factors(sf):
        """ALS matrix factorization of the (user × event_type) activity
        matrix — per-user taste factors from alternating optimization,
        user factors recomputed per pass, never stored
        (stages/similarity.als_factorize).  Rows-only (iterative);
        planted-block-recovery pytest."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.similarity import als_factorize

        ds = read_events(sf, columns=["user_id", "event_type"])
        ones = ds.map_batches(
            lambda t: t.append_column(
                "r", _pc.cast(_pc.equal(t["event_type"], t["event_type"]),
                              pa.float64())),
            batch_format="pyarrow")
        uf, _vf = als_factorize(ones, user_col="user_id",
                                item_col="event_type", rating_col="r",
                                rank=3, n_iter=6)
        return _round_floats(uf.sort("user_id"))

    def q_docs_word_vectors(sf):
        """Train static word embeddings FROM the corpus: exact top-V
        vocabulary → symmetric windowed co-occurrence partials → PPMI →
        eigh → 16-d vectors (stages/text.ppmi_word_vectors, the
        count-based word2vec equivalent).  Rows-only
        (eigendecomposition); context-sharing cosine pytest."""
        from s_tsfe_dl_ray.stages.text import ppmi_word_vectors

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        return _round_floats(ppmi_word_vectors(
            docs, vocab_size=64, window=2, dim=16))

    def q_events_markov_stationary(sf):
        """Per-user stationary distribution of the event-type Markov
        chain — the long-run behavior mix the user's DYNAMICS converge
        to (vs the observed frequency mix); batched power iteration
        across all keys of a partition (stages/trend.markov_stationary).
        Rows-only (eigenvector); closed-form-chain pytest."""
        from s_tsfe_dl_ray.stages.trend import markov_stationary

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type"])
        return _round_floats(markov_stationary(
            ds, key="user_id", state_col="event_type",
            order_by=["ts", "event_id"]))

    def q_lineitem_part_pagerank(sf):
        """Weighted PageRank over the part co-purchase graph (pair
        co-occurrence edges both directions, weight = co-order count) —
        the iterative rank-propagation class, one combiner pass per
        iteration (stages/cluster.pagerank).  Rows-only (iterative);
        tests pin mass conservation / ring uniformity / hub dominance."""
        import ray.data

        from s_tsfe_dl_ray.stages.cluster import pagerank
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        li = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                   columns=["l_orderkey", "l_partkey"])
        pairs = pair_cooccurrence(li, group_col="l_orderkey",
                                  member_col="l_partkey")

        def both_dirs(t: pa.Table) -> pa.Table:
            a = t["member_a"].to_numpy(zero_copy_only=False)
            b = t["member_b"].to_numpy(zero_copy_only=False)
            w = t["n_both"].to_numpy(zero_copy_only=False)
            import numpy as _np

            return pa.table({
                "src": pa.array(_np.concatenate([a, b])),
                "dst": pa.array(_np.concatenate([b, a])),
                "w": pa.array(_np.concatenate([w, w]).astype(_np.float64)),
            })

        edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
        out = pagerank(edges, src_col="src", dst_col="dst",
                       weight_col="w", n_iter=10)
        return _round_floats(out.sort("rank", descending=True).limit(50))

    def q_transcripts_escalation(sf):
        """Share of conversations whose user turns grow longer over the
        dialog (exact int OLS slope per conversation, one-row corpus
        fold) — stages/dialog.escalation_share."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import escalation_share

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(escalation_share(turns))

    def q_events_runs_test(sf):
        """Wald–Wolfowitz runs test per user (above/below exact lower
        median, integer run counts) — the order-only randomness sibling
        of ljung_box (stages/robust.runs_test)."""
        from s_tsfe_dl_ray.stages.robust import runs_test

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(runs_test(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]).sort("user_id"))

    def q_events_hour_entropy(sf):
        """Shannon entropy of each user's hour-of-day activity profile
        (cron-like vs human timing) — pure combiner, ≤24 rows per user
        per batch (stages/activity.hour_entropy)."""
        from s_tsfe_dl_ray.stages.activity import hour_entropy

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(hour_entropy(ds).sort("user_id"))

    def q_docs_compressibility(sf):
        """Per-doc zlib redundancy ratio (boilerplate/loop detector) —
        deterministic, shuffle-free; rows-only (no SQL deflate), golden
        + monotonicity pytest in tests/test_text.py
        (stages/text.compressibility)."""
        from s_tsfe_dl_ray.stages.text import compressibility

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        return _round_floats(compressibility(docs).sort("doc_id"))

    def q_docs_charlm_logloss(sf):
        """Corpus char-bigram LM perplexity proxy per doc (add-one
        smoothing, fit-combiner + broadcast-score passes) —
        stages/text.charlm_logloss."""
        from s_tsfe_dl_ray.stages.text import charlm_logloss

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        return _round_floats(charlm_logloss(docs).sort("doc_id"))

    def q_events_holt_winters(sf):
        """Additive Holt–Winters (level+trend+24h season) per event type
        over the dense hourly grid; rows-only (recursive state — no SQL
        twin; convergence + short-series pytest in tests/test_trend.py)
        — stages/trend.holt_winters."""
        from s_tsfe_dl_ray.stages.trend import holt_winters

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(holt_winters(ds))

    def q_events_psi_daily(sf):
        """Population Stability Index per observed day vs previous day
        (10 equal-width global bins, Laplace-smoothed) — the
        distribution-drift monitor (stages/robust.psi_daily)."""
        from s_tsfe_dl_ray.stages.robust import psi_daily

        ds = read_events(sf, columns=["ts", "value"])
        return _round_floats(psi_daily(ds).sort("day"))

    def q_events_out_of_order(sf):
        """Ingestion-order audit per user: late-event share and worst
        lateness in arrival (event_id) order — the watermark-tuning
        measurement (stages/scan.out_of_order_stats)."""
        from s_tsfe_dl_ray.stages.scan import out_of_order_stats

        ds = read_events(sf, columns=["event_id", "ts", "user_id"])
        return _round_floats(out_of_order_stats(ds))

    def q_events_trimmed_mean(sf):
        """10%-trimmed mean per user (deterministic (value, event_id)
        cut) — the robust location estimate between mean and median
        (stages/robust.trimmed_mean)."""
        from s_tsfe_dl_ray.stages.robust import trimmed_mean

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(trimmed_mean(
            ds, key="user_id", value_col="value", id_col="event_id"))

    def q_events_session_type_pairs(sf):
        """Session-scoped event-type co-occurrence: label_sessions →
        pair_cooccurrence composition (which types happen in the SAME
        30m session, vs the per-user lifetime variant)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence
        from s_tsfe_dl_ray.stages.sessionize import label_sessions

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type"])
        labeled = label_sessions(ds, key="user_id", ts_col="ts",
                                 order_by=["ts", "event_id"], gap="30m")

        def skey(t: pa.Table) -> pa.Table:
            sk = _pc.binary_join_element_wise(
                _pc.cast(t["user_id"], pa.string()),
                _pc.cast(t["session_id"], pa.string()), ":")
            return pa.table({"skey": sk, "event_type": t["event_type"]})

        pairs = pair_cooccurrence(
            labeled.map_batches(skey, batch_format="pyarrow"),
            group_col="skey", member_col="event_type")
        return _round_floats(pairs.sort(["member_a", "member_b"]))

    def q_emb_centroid_drift(sf):
        """Per-label even/odd-half centroid cosine (embedding-store
        drift probe) — pure combiner, embeddings never shuffled
        (stages/similarity.centroid_drift)."""
        from s_tsfe_dl_ray.stages.similarity import centroid_drift

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
        return _round_floats(centroid_drift(emb))

    def q_transcripts_turn_neardup(sf):
        """MinHash-LSH near-dup pairs over DISTINCT turn texts — the
        production dedup ladder composed onto transcripts: exact-dedup
        to one representative per text first (first_per_key on a text
        hash), then near-dup only across representatives — so the
        quadratic-ish stage sees the template pool, not every turn.
        Rows-only; planted-dup guarantees pytest-pinned on the docs
        path."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dedup import first_per_key, md5_hex, minhash_dedup_pairs

        turns = read_table(_transcripts_for(sf), columns=["text"])

        def add_key(b):
            b = b.copy()
            b["turn_id"] = md5_hex(b["text"])
            return b

        reps = first_per_key(
            turns.map_batches(add_key, batch_format="pandas"),
            keys=["turn_id"], order_by=["turn_id"])
        return _round_floats(minhash_dedup_pairs(
            reps, id_col="turn_id", threshold=0.9))

    def q_emb_index_job(sf):
        """Durable ANN index build (IVF + uint8 buckets + lineage
        manifests) then pruned-read search for the first 10 corpus
        vectors — pipelines/emb_index_job.EmbIndexJob.  Rows-only;
        determinism/resume/recall pinned in tests/test_emb_index_job.py."""
        import hashlib as _hl

        import numpy as np
        import pyarrow.parquet as pq
        import ray.data

        from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

        tag = _hl.md5(sf.encode()).hexdigest()[:10]
        out = f"/tmp/s_tsfe_dl_ray_emb_index_{tag}"
        job = EmbIndexJob(f"{sf}/embeddings.parquet", out, n_clusters=8)
        job.run()
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          filters=[("vec_id", "<", 10)])
        q = np.array([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        res = job.search(q, k=5, nprobe=4)
        return ray.data.from_pandas(res.sort_values(
            ["query_idx", "cosine", "neighbor_id"],
            ascending=[True, False, True]).reset_index(drop=True))

    def q_customer_rfm(sf):
        """RFM segmentation base per customer (recency vs global latest
        order, frequency, exact-cents monetary) — pure combiner over
        orders (pipelines/relational.customer_rfm)."""
        from s_tsfe_dl_ray.pipelines.relational import customer_rfm

        return _round_floats(customer_rfm(sf))

    def q_events_user_lifetime(sf):
        """Per-user lifetime summary: first/last seen, inclusive
        calendar tenure, exact active-day count — one combiner pass
        (stages/activity.user_lifetime)."""
        from s_tsfe_dl_ray.stages.activity import user_lifetime

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(user_lifetime(ds))

    def q_orders_fulfillment_latency(sf):
        """Order→first-shipment latency quantiles per priority (exact
        day-diff order statistics) — fold-before-join
        (pipelines/tpch.fulfillment_latency)."""
        from s_tsfe_dl_ray.pipelines.tpch import fulfillment_latency

        return fulfillment_latency(sf)

    def q_transcripts_tool_cooccurrence(sf):
        """Which TOOLS get used in the same conversation (support /
        lift / jaccard) — the generic pair_cooccurrence composed onto
        (conv_id, tool), empty-tool turns excluded."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "tool"])
        toolturns = turns.map_batches(
            lambda t: t.filter(_pc.not_equal(t["tool"], "")),
            batch_format="pyarrow", zero_copy_batch=True)
        pairs = pair_cooccurrence(toolturns, group_col="conv_id",
                                  member_col="tool")
        return _round_floats(pairs.sort(["member_a", "member_b"]))

    def q_events_bursts(sf):
        """Kleinberg two-state burst episodes per event type over the
        dense hourly grid (Viterbi over Poisson costs); rows-only —
        planted-burst recovery pinned in tests/test_trend.py
        (stages/trend.kleinberg_bursts)."""
        from s_tsfe_dl_ray.stages.trend import kleinberg_bursts

        ds = read_events(sf, columns=["event_type", "ts"])
        return kleinberg_bursts(ds)

    def q_events_peak_detect(sf):
        """R-peak-style detection per user: strict interior local maxima
        above the exact per-user p90, 60s greedy refractory period —
        the reference's QRS anchor loop as a distributed op
        (stages/scan.peak_detect)."""
        from s_tsfe_dl_ray.stages.scan import peak_detect

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(peak_detect(ds))

    def q_events_rr_intervals(sf):
        """RR-interval HRV summary over DETECTED peaks (the reference's
        literal R-peak → RR → HRV pipeline): mean interval + RMSSD per
        user (stages/scan.peak_intervals)."""
        from s_tsfe_dl_ray.stages.scan import peak_intervals

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(peak_intervals(ds))

    def q_transcripts_tool_effect(sf):
        """Assistant turn length split by whether the previous turn was
        a tool result — the tool-augmentation length probe
        (stages/dialog.tool_effect)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import tool_effect

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(tool_effect(turns))

    def q_events_seasonal_outliers(sf):
        """Robust anomaly count on DESEASONALIZED values: hour-of-day
        profile removed (stages/trend.seasonal_adjust per type),
        then the MAD outlier battery on the residuals — the
        seasonal-aware anomaly count a raw-value MAD over-flags every
        morning peak on."""
        from s_tsfe_dl_ray.stages.robust import grouped_mad
        from s_tsfe_dl_ray.stages.trend import seasonal_adjust

        ds = read_events(sf, columns=["event_type", "ts", "value"])
        adj = seasonal_adjust(ds, key="event_type", ts_col="ts",
                              value_col="value", period="hour_of_day")
        return _round_floats(grouped_mad(
            adj.select_columns(["event_type", "residual"]),
            key="event_type", value_col="residual").sort("event_type"))

    def q_transcripts_conv_features(sf):
        """The conversation-level ML feature table: role/tool counts,
        token volume, wall duration, opening/closing roles — one wide
        row per conversation (stages/dialog.conversation_features)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import conversation_features

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text",
                                    "tool", "ts"])
        return _round_floats(conversation_features(turns))

    def q_events_daily_type_entropy(sf):
        """Per-day traffic-mix entropy + dominant type/share (the
        mix-collapse monitor beside psi_daily's value drift) —
        stages/activity.daily_mix_entropy."""
        from s_tsfe_dl_ray.stages.activity import daily_mix_entropy

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(daily_mix_entropy(ds).sort("day"))

    def q_events_arch_effect(sf):
        """Volatility clustering (ARCH-effect) probe per user: lag-1
        autocorrelation of |Δvalue| — composition of the ordered-scan
        delta, an abs kernel, and the multi-lag acf stage."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.trend import acf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        d = ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"vd": ("value", "delta")})

        def absd(t: pa.Table) -> pa.Table:
            out = pa.table({
                "event_id": t["event_id"], "user_id": t["user_id"],
                "ts": t["ts"], "ad": _pc.abs(t["vd"]),
            })
            return out.filter(_pc.is_valid(out["ad"]))

        series = d.map_batches(absd, batch_format="pyarrow")
        r = acf(series, key="user_id", value_col="ad",
                order_by=["ts", "event_id"], lags=(1,))

        def fin(t: pa.Table) -> pa.Table:
            return pa.table({"user_id": t["user_id"],
                             "n_pairs": t["n_pairs"],
                             "arch_corr": t["autocorr"]})

        return _round_floats(
            r.map_batches(fin, batch_format="pyarrow").sort("user_id"))

    def q_events_avg_precision(sf):
        """Exact PR-AUC (sklearn's step-interpolated average precision,
        tie-robust over the score histogram) — the imbalance-honest
        sibling of events_auc (stages/metrics.average_precision)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import average_precision

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(average_precision(
            ds, score_col="value", label_col="label"))

    def q_events_expectations(sf):
        """Declarative data-contract sweep over the events drop
        (not-null, PK-unique, enum membership, range, RE2 shape) —
        one read, per-rule combiner folds (schema.expectations_report)."""
        from s_tsfe_dl_ray.schema import expectations_report

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
        rules = [
            {"rule": "not_null", "col": "value"},
            {"rule": "unique", "col": "event_id"},
            {"rule": "in_set", "col": "event_type",
             "values": ["view", "click", "purchase", "signup", "error"]},
            {"rule": "range", "col": "value", "lo": -1000.0, "hi": 1000.0},
            {"rule": "regex", "col": "props", "pattern": r"\{.*\}"},
        ]
        return expectations_report(ds, rules)

    def q_events_dtw_shape(sf):
        """Banded DTW distance from each type's hourly series to the
        corpus mean series (shape-anomaly ranking; Sakoe–Chiba band) —
        rows-only (DP argmin; identity/shift-tolerance pytest in
        tests/test_trend.py) — stages/trend.dtw_to_mean."""
        from s_tsfe_dl_ray.stages.trend import dtw_to_mean

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(dtw_to_mean(ds))

    def q_lineitem_qty_price_ols(sf):
        """Per-returnflag OLS of extended price on quantity — does price
        scale with quantity within each flag?  The generic two-column
        regression sketch (stages/trend.grouped_ols_xy); exchange carries
        six moments per key per batch, never rows."""
        from s_tsfe_dl_ray.stages.trend import grouped_ols_xy

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_returnflag", "l_quantity",
                                 "l_extendedprice"])
        return _round_floats(grouped_ols_xy(
            ds, key="l_returnflag", x_col="l_quantity",
            y_col="l_extendedprice").sort("l_returnflag"))

    def q_events_value_ecdf(sf):
        """Exact per-type empirical CDF at fixed probe values — the
        inverse view of the quantile ops (value → share instead of
        share → value); K+2 exact int64 counts per key per batch cross
        the exchange (stages/quantile.grouped_ecdf_at)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_ecdf_at

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_ecdf_at(
            ds, key="event_type", value_col="value",
            thresholds=(1.0, 5.0, 20.0, 50.0, 100.0, 250.0),
        ).sort(["event_type", "threshold"]))

    def q_transcripts_token_gini(sf):
        """Token-volume inequality across conversations within each
        role: Gini over per-conversation token SUMS (weighted variant of
        stages/activity.activity_gini) — are a few conversations eating
        the context budget?"""
        from s_tsfe_dl_ray.functions.derive import token_count
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.activity import activity_gini

        ds = read_transcripts(
            _transcripts_for(sf), columns=["conv_id", "role", "text"])

        def derive(t: pa.Table) -> pa.Table:
            return pa.table({"role": t["role"], "conv_id": t["conv_id"],
                             "_tok": token_count(t["text"])})

        out = activity_gini(
            ds.map_batches(derive, batch_format="pyarrow",
                           zero_copy_batch=True),
            group_col="role", key_col="conv_id", weight_col="_tok")
        return _round_floats(out.map_batches(
            lambda df: df.rename(columns={"n_users": "n_convs",
                                          "total_events": "total_tokens"}),
            batch_format="pandas"))

    def q_events_hill_tail(sf):
        """Per-type Hill estimator of the heavy-tail index over the
        top-100 order statistics (positive values; histogram-folded, no
        row expansion) — the tail-SHAPE probe completing
        tail_value_share/gini/HHI (stages/robust.hill_tail_index)."""
        from s_tsfe_dl_ray.stages.robust import hill_tail_index

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(hill_tail_index(
            ds, key="event_type", value_col="value", k=100))

    def q_events_isotonic(sf):
        """Isotonic (PAV) calibration of value → P(purchase): monotone
        nonparametric calibrator over the exact score histogram
        (stages/metrics.isotonic_calibration).  Rows-only (sequential
        pooling); monotonicity/mass/golden pytest."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import isotonic_calibration

        ds = read_events(sf, columns=["value", "event_type"])
        lab = ds.map_batches(
            lambda t: pa.table({
                "value": t["value"],
                "label": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(isotonic_calibration(
            lab, score_col="value", label_col="label"))

    def q_events_ab_ztest(sf):
        """A/B experiment readout: deterministic md5 50/50 user split,
        conversion = any purchase, pooled two-proportion z statistic
        (stages/metrics.ab_ztest)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import ab_ztest

        ds = read_events(sf, columns=["user_id", "event_type"])
        conv = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"],
                "success": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(ab_ztest(
            conv, unit_col="user_id", success_col="success",
            split_fraction=0.5))

    def q_events_survival_km(sf):
        """Kaplan–Meier time-to-first-purchase curve per user (hour
        buckets; users who never purchase are right-censored at their
        last activity) — the product-limit conversion-latency estimate
        (stages/cohort.survival_km)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import survival_km

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ev = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(survival_km(
            ev, key="user_id", ts_col="ts",
            event_col="event").sort("bucket"))

    def q_events_gains(sf):
        """Cumulative gains / lift table: positives captured by the
        top-k decile of value-ranked rows, pro-rata tie handling from
        the exact score histogram (stages/metrics.gains_table)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import gains_table

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(gains_table(
            ds, score_col="value", label_col="label").sort("tile"))

    def q_events_brier(sf):
        """Brier score + Murphy decomposition (reliability / resolution
        / uncertainty) over the reliability bins — the proper-scoring
        companion of ECE (stages/metrics.brier_score)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import brier_score

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", _pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(brier_score(
            ds, score_col="score", label_col="label"))

    def q_events_ece(sf):
        """ECE/MCE calibration summary over the reliability bins —
        same score/label derivation as events_calibration
        (stages/metrics.expected_calibration_error)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import expected_calibration_error

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", _pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(expected_calibration_error(
            ds, score_col="score", label_col="label"))

    def q_events_recs_by_lift(sf):
        """'Users who did X also did Y': top-3 recommended event types
        per given type by association lift (ties by name) — the
        recommender read-out over the pair_cooccurrence op.  Ranking on
        the UNROUNDED lift, identical doubles both sides."""
        import numpy as _np
        import pandas as _pd

        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        ds = read_events(sf, columns=["user_id", "event_type"])
        pairs = pair_cooccurrence(ds, group_col="user_id",
                                  member_col="event_type")

        def rank(df: _pd.DataFrame) -> _pd.DataFrame:
            if len(df) == 0:
                return _pd.DataFrame({
                    "given": _pd.Series([], dtype="object"),
                    "rec": _pd.Series([], dtype="object"),
                    "lift": _pd.Series([], dtype="float64"),
                    "rnk": _pd.Series([], dtype="int64")})
            both = _pd.concat([
                df.rename(columns={"member_a": "given",
                                   "member_b": "rec"}),
                df.rename(columns={"member_b": "given",
                                   "member_a": "rec"})],
                ignore_index=True)[["given", "rec", "lift"]]
            both = both.sort_values(
                ["given", "lift", "rec"],
                ascending=[True, False, True]).reset_index(drop=True)
            both["rnk"] = both.groupby(
                "given", sort=False).cumcount().to_numpy() + 1
            out = both[both["rnk"] <= 3].reset_index(drop=True)
            out["rnk"] = out["rnk"].astype(_np.int64)
            return out

        # the type vocabulary is tiny — one final partition; at larger
        # vocabularies route through grouped_apply on `given`
        return _round_floats(
            pairs.repartition(1).map_batches(rank, batch_format="pandas",
                                             batch_size=None)
            .sort(["given", "rnk"]))

    def q_emb_ivf_recall(sf):
        """ANN quality audit as a first-class query: recall@10 of the
        IVF route against the exact brute-force neighbors for the same
        10 query vectors — the acceptance gate run before trusting an
        approximate index (composition of knn_ivf × knn_bruteforce).
        Rows-only (both sides approximate/derived)."""
        import pandas as _pd

        from s_tsfe_dl_ray.stages.similarity import knn_bruteforce, knn_ivf

        ds = read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        exact = knn_bruteforce(
            ds, query_ids=list(range(10)), k=10,
            source_path=f"{sf}/embeddings.parquet").to_pandas()
        approx = knn_ivf(ds, n_queries=10, k=10, n_clusters=8,
                         nprobe=4).to_pandas()
        qcol = [c for c in exact.columns if "query" in c][0]
        ncol = [c for c in exact.columns if c != qcol
                and ("neighbor" in c or "vec" in c)][0]
        e = set(zip(exact[qcol], exact[ncol]))
        a = set(zip(approx[qcol], approx[ncol]))
        per_q = {}
        for q, nb in e:
            per_q.setdefault(q, [0, 0])
            per_q[q][1] += 1
            if (q, nb) in a:
                per_q[q][0] += 1
        rows = _pd.DataFrame({
            "query_id": sorted(per_q),
            "recall_at_10": [per_q[q][0] / per_q[q][1]
                             for q in sorted(per_q)]})
        rows["n_exact"] = [per_q[q][1] for q in sorted(per_q)]
        return rows

    def q_docs_split_leakage(sf):
        """Train/test leakage audit: deterministic 80/20 md5 split of
        the corpus, then count normalized-content fingerprints (and
        docs) that appear on BOTH sides — the contamination gate run
        before training on a deduped-but-split corpus (composition:
        md5_fingerprint × hash_split × grouped fold)."""
        import hashlib as _hl

        import numpy as _np

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        fp = ds.map_batches(md5_fingerprint, batch_format="pandas")

        def tag(df):
            h = df["doc_id"].astype(str).map(
                lambda s: _hl.md5(s.encode()).hexdigest()[:4] < "3333")
            return pd.DataFrame({"fingerprint": df["fingerprint"],
                                 "is_test": h.to_numpy()})

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        tagged = fp.map_batches(tag, batch_format="pandas")

        def part(t: pa.Table) -> pa.Table:
            it = pc.cast(t["is_test"], pa.int64())
            out = (pa.table({"fp": t["fingerprint"], "t": it})
                   .group_by(["fp"], use_threads=False)
                   .aggregate([("t", "sum"), ([], "count_all")]))
            return out.rename_columns(["fp", "nt", "n"])

        g = grouped_aggregate(
            tagged.map_batches(part, batch_format="pyarrow"),
            keys=["fp"], aggs={"nt": ("nt", "sum"), "n": ("n", "sum")})

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or "n" not in df.columns:
                df = pd.DataFrame({"n": [], "nt": []})
            n = df["n"].to_numpy(dtype=_np.int64) if len(df) else \
                _np.array([], dtype=_np.int64)
            nt = df["nt"].to_numpy(dtype=_np.int64) if len(df) else \
                _np.array([], dtype=_np.int64)
            leaked = (nt > 0) & (nt < n)
            return pd.DataFrame({
                "n_train": pd.Series([int((n - nt).sum())], dtype="int64"),
                "n_test": pd.Series([int(nt.sum())], dtype="int64"),
                "n_leaked_fps": pd.Series([int(leaked.sum())],
                                          dtype="int64"),
                "n_leaked_docs": pd.Series([int(n[leaked].sum())],
                                           dtype="int64")})

        return g.repartition(1).map_batches(fin, batch_format="pandas",
                                            batch_size=None)

    def q_transcripts_tool_km(sf):
        """Kaplan–Meier time-to-first-TOOL-CALL per conversation
        (minute buckets; conversations that never call a tool are
        right-censored at their last turn) — the survival view of tool
        adoption latency (stages/cohort.survival_km on transcripts)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.stages.cohort import survival_km

        ds = read_transcripts(_transcripts_for(sf),
                              columns=["conv_id", "ts", "role"])
        ev = ds.map_batches(
            lambda t: pa.table({
                "conv_id": t["conv_id"], "ts": t["ts"],
                "event": _pc.equal(t["role"], "tool")}),
            batch_format="pyarrow")
        return _round_floats(survival_km(
            ev, key="conv_id", ts_col="ts", event_col="event",
            bucket_us=60_000_000).sort("bucket"))

    def q_lineitem_brand_revenue(sf):
        """Revenue by part brand via the public shuffle-free
        broadcast_join (part is a driver-bounded dimension): exact
        int-cent discounted revenue per brand
        (stages/join.broadcast_join)."""
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq
        import ray.data as _rd

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.join import broadcast_join

        li = _rd.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"])
        part = _pq.read_table(f"{sf}/part.parquet",
                              columns=["p_partkey", "p_brand"])

        def rev(t: pa.Table) -> pa.Table:
            price_i = _pc.cast(_pc.round(_pc.multiply(
                t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
            disc_i = _pc.cast(_pc.round(_pc.multiply(
                t["l_discount"], pa.scalar(100.0))), pa.int64())
            return pa.table({
                "l_partkey": t["l_partkey"],
                "rev_i": _pc.multiply(price_i, _pc.subtract(
                    pa.scalar(100, pa.int64()), disc_i))})

        joined = broadcast_join(
            li.map_batches(rev, batch_format="pyarrow"),
            part, left_on="l_partkey", right_on="p_partkey", how="inner")
        agg = grouped_aggregate(
            joined, keys=["p_brand"],
            aggs={"n_items": ("rev_i", "count"),
                  "rev_i": ("rev_i", "sum")})
        return _round_floats(agg.map_batches(
            lambda t: pa.table({
                "p_brand": t["p_brand"], "n_items": t["n_items"],
                "revenue": _pc.divide(_pc.cast(t["rev_i"], pa.float64()),
                                      pa.scalar(10_000.0))}),
            batch_format="pyarrow").sort("p_brand"))

    def q_events_cuped(sf):
        """CUPED variance-reduced A/B readout: pre-midpoint activity
        absorbs between-user variance from the post-midpoint metric
        (stages/metrics.cuped_ab); exact int moments, md5 arms."""
        from s_tsfe_dl_ray.stages.metrics import cuped_ab

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(cuped_ab(
            ds, unit_col="user_id", ts_col="ts", split_fraction=0.5))

    def q_events_type_value_mi(sf):
        """Mutual information between event type and the value band
        (7 fixed 50-wide bins) + normalized MI — feature-relevance
        screening next to the chi²/Cramér's-V op
        (stages/distinct.mutual_information)."""
        import numpy as _np

        from s_tsfe_dl_ray.stages.distinct import mutual_information

        ds = read_events(sf, columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy(zero_copy_only=False)
            b = _np.minimum(_np.floor(v / 50.0), 6.0).astype(_np.int64)
            return pa.table({"event_type": t["event_type"],
                             "vband": pa.array(b)})

        return _round_floats(mutual_information(
            ds.map_batches(derive, batch_format="pyarrow"),
            col_a="event_type", col_b="vband"))

    def q_events_cum_hazard(sf):
        """Nelson–Aalen cumulative hazard of time-to-first-purchase —
        the additive sibling of the KM curve
        (stages/cohort.cumulative_hazard)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import cumulative_hazard

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ev = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(cumulative_hazard(
            ev, key="user_id", ts_col="ts",
            event_col="event").sort("bucket"))

    def q_events_logrank(sf):
        """Two-sample log-rank test on time-to-first-purchase between
        the two deterministic md5 A/B arms — the survival-curve
        companion of events_ab_ztest (same split, latency instead of
        rate; stages/cohort.logrank_test)."""
        import hashlib as _hl

        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import logrank_test

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])

        def derive_t(t: pa.Table) -> pa.Table:
            import numpy as _np
            u = t["user_id"].to_numpy(zero_copy_only=False)
            grp = _np.array([
                _hl.md5(str(x).encode()).hexdigest()[:4] < "8000"
                for x in u])
            return pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase"),
                "grp": pa.array(grp)})

        g = ds.map_batches(derive_t, batch_format="pyarrow")
        return _round_floats(logrank_test(
            g, key="user_id", ts_col="ts", event_col="event",
            group_col="grp"))

    def q_docs_lang_confusion(sf):
        """Multiclass confusion-matrix metrics for the language-ID
        model vs the corpus's true lang labels: per-class tp /
        precision / recall / F1 (stages/metrics.multiclass_prf over
        stages/text.lang_id) — the k-class generalization of
        events_binary_metrics."""
        from s_tsfe_dl_ray.stages.metrics import multiclass_prf
        from s_tsfe_dl_ray.stages.text import lang_id

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
        return _round_floats(multiclass_prf(
            lang_id(ds), true_col="lang", pred_col="lang_pred"))

    def q_events_hurst(sf):
        """Per-user Hurst exponent via single-scale rescaled range
        (32-step chunks, int-cent exactness) — long-memory /
        persistence ranking (stages/trend.hurst_rs)."""
        from s_tsfe_dl_ray.stages.trend import hurst_rs

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "value"])
        return _round_floats(hurst_rs(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], chunk_len=32))

    def q_events_granger(sf):
        """Granger-style predictive probe on the hourly count grid: does
        last hour's click count predict this hour's purchase count beyond
        purchases' own lag?  Restricted-vs-full OLS from exact int64
        moment sums, fixed expression tree mirrored by the SQL twin
        (stages/trend.granger_probe)."""
        from s_tsfe_dl_ray.stages.trend import granger_probe

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(granger_probe(
            ds, ts_col="ts", type_col="event_type",
            type_cause="click", type_effect="purchase", tier="1h"))

    def q_events_tail_value_share(sf):
        """Per-type share of rows and of total value above the exact
        global p99 (quantile_disc from the distinct-value histogram;
        int-cent sums) — the single-threshold Lorenz point
        (stages/robust.tail_value_share)."""
        from s_tsfe_dl_ray.stages.robust import tail_value_share

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(tail_value_share(
            ds, key="event_type", value_col="value", q=0.99,
        ).sort("event_type"))

    def q_events_cointegration(sf):
        """Engle–Granger cointegration probe click-vs-purchase on the
        hourly count grid: long-run OLS from exact int64 moments, then
        the lag-0 Dickey–Fuller t on its residuals
        (stages/trend.cointegration_probe)."""
        from s_tsfe_dl_ray.stages.trend import cointegration_probe

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(cointegration_probe(
            ds, ts_col="ts", type_col="event_type",
            type_x="click", type_y="purchase", tier="1h"))

    def q_transcripts_self_repetition(sf):
        """Per-conversation degenerate-loop probe: share of word-trigram
        occurrences already emitted in an EARLIER turn of the same
        conversation (stages/dialog.self_repetition)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import self_repetition

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "text"])
        return _round_floats(self_repetition(turns))

    def q_events_croston(sf):
        """Croston intermittent-demand forecast of daily purchases per
        user — twin SES chains (demand size + inter-demand interval)
        via the verified grouped ewm kernel
        (stages/trend.croston_forecast)."""
        from s_tsfe_dl_ray.stages.trend import croston_forecast

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
            batch_format="pyarrow")
        return _round_floats(croston_forecast(
            ds, key="user_id", ts_col="ts", alpha=0.3, tier="1d"))

    def q_events_grubbs(sf):
        """Grubbs' maximum-studentized-extreme outlier screen per event
        type: G = max deviation / sample sd from exact int-cent moments;
        the argmax extreme rides along (stages/robust.grubbs_test)."""
        from s_tsfe_dl_ray.stages.robust import grubbs_test

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grubbs_test(
            ds, group_col="event_type", value_col="value"))

    def q_orders_priority_drift(sf):
        """Monthly chi-square drift of the order-priority mix against
        the whole-corpus mix — exact int64 cell counts, bit-identical
        sorted-category sequential sum on both sides
        (stages/robust.category_mix_drift)."""
        from s_tsfe_dl_ray.stages.robust import category_mix_drift

        ds = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_orderpriority"])
        return _round_floats(category_mix_drift(
            ds, ts_col="o_orderdate", cat_col="o_orderpriority",
            period="1mo"))

    def q_docs_readability(sf):
        """Flesch reading-ease per document from three exact RE2 counts
        (whitespace tokens, [.!?]+ sentence runs clamped to >= 1,
        vowel-group syllables) (stages/text.flesch_readability)."""
        from s_tsfe_dl_ray.stages.text import flesch_readability

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        return _round_floats(flesch_readability(ds))

    def q_transcripts_abandonment(sf):
        """Conversation abandonment by hour of last activity: share of
        conversations whose FINAL turn is a user turn (asked, never
        answered) per hour-of-day (stages/dialog.abandonment_by_hour)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import abandonment_by_hour

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "ts"])
        return _round_floats(abandonment_by_hour(turns))

    def q_docs_distinctive_tokens(sf):
        """Top-5 distinctive tokens per source by smoothed
        log-odds-ratio vs the rest of the corpus — contrastive keyword
        extraction (stages/text.distinctive_tokens)."""
        from s_tsfe_dl_ray.stages.text import distinctive_tokens

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["source", "text"])
        return _round_floats(distinctive_tokens(
            ds, group_col="source", k=5))

    def q_events_availability(sf):
        """Per-user hourly presence profile: active-hour share of the
        first-to-last span plus the longest silent stretch
        (stages/activity.availability_profile)."""
        from s_tsfe_dl_ray.stages.activity import availability_profile

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(availability_profile(
            ds, key="user_id", ts_col="ts", tier="1h"))

    def q_transcripts_tool_adoption(sf):
        """Per-tool adoption: share of conversations reaching each tool
        and the mean first-use turn index
        (stages/dialog.tool_adoption)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import tool_adoption

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "tool"])
        return _round_floats(tool_adoption(turns))

    def q_lineitem_returnflag_drift(sf):
        """Monthly chi-square drift of the lineitem return-flag mix vs
        the whole-corpus mix — the same stage as orders_priority_drift
        on a different table (stages/robust.category_mix_drift)."""
        from s_tsfe_dl_ray.stages.robust import category_mix_drift

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_shipdate", "l_returnflag"])
        return _round_floats(category_mix_drift(
            ds, ts_col="l_shipdate", cat_col="l_returnflag",
            period="1mo"))

    def q_events_rolling_corr(sf):
        """Trailing 24h Pearson correlation between hourly click and
        purchase counts on the DENSE hour grid — exact int64 trailing
        prefix moments (stages/trend.rolling_grid_corr)."""
        from s_tsfe_dl_ray.stages.trend import rolling_grid_corr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(rolling_grid_corr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h", window=24))

    def q_events_cohort_ltv(sf):
        """Cohort lifetime-value curve: cumulative value (and per-member
        value) by signup cohort and age — exact int-cent cumsum
        (stages/cohort.cohort_ltv)."""
        from s_tsfe_dl_ray.stages.cohort import cohort_ltv

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(cohort_ltv(
            ds, key="user_id", ts_col="ts", value_col="value"))

    def q_docs_style_cosine(sf):
        """Pairwise stylistic cosine between sources over token-count
        vectors — exact int64 dots and norms, one float tree
        (stages/text.source_style_cosine)."""
        from s_tsfe_dl_ray.stages.text import source_style_cosine

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["source", "text"])
        return _round_floats(source_style_cosine(ds, group_col="source"))

    def q_events_theta(sf):
        """Theta-style one-step forecast per user over daily activity:
        SES level plus half the exact-moment OLS drift
        (stages/trend.theta_forecast)."""
        from s_tsfe_dl_ray.stages.trend import theta_forecast

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(theta_forecast(
            ds, key="user_id", ts_col="ts", alpha=0.3, tier="1d"))

    def q_docs_length_ks(sf):
        """Pairwise Kolmogorov-Smirnov distance between sources' doc
        length distributions — the distribution-drift matrix
        (stages/robust.pairwise_ks)."""
        from s_tsfe_dl_ray.stages.robust import pairwise_ks

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["source", "n_chars"])
        return _round_floats(pairwise_ks(
            ds, group_col="source", value_col="n_chars"))

    def q_events_lorenz(sf):
        """Lorenz concentration table: per rank-decile of users (by
        event count desc) the share and cumulative share of all events
        (stages/activity.lorenz_deciles)."""
        from s_tsfe_dl_ray.stages.activity import lorenz_deciles

        ds = read_events(sf, columns=["user_id"])
        return _round_floats(lorenz_deciles(ds, key_col="user_id"))

    def q_emb_dim_participation(sf):
        """Participation ratio of the per-dimension variance spectrum +
        top-dimension share — how many axes effectively carry variance
        (stages/similarity.dim_participation)."""
        from s_tsfe_dl_ray.stages.similarity import dim_participation

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["embedding"])
        return _round_floats(dim_participation(emb))

    def q_events_weekend_effect(sf):
        """Welch t-test of event values weekday vs weekend — the
        calendar-effect screen, pure composition of a derived flag and
        the existing stage (stages/robust.welch_ttest)."""
        from s_tsfe_dl_ray.stages.robust import welch_ttest

        ds = read_events(sf, columns=["ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            dow = ((us // 86_400_000_000 + 3) % 7) + 1  # ISO Mon=1
            import numpy as np
            return pa.table({
                "_wk": pa.array(np.where(dow >= 6, "weekend",
                                         "weekday").astype(object)),
                "value": t["value"]})

        flagged = ds.map_batches(derive, batch_format="pyarrow",
                                 zero_copy_batch=True)
        return _round_floats(welch_ttest(
            flagged, group_col="_wk", value_col="value",
            group_a="weekday", group_b="weekend"))

    def q_transcripts_compressibility(sf):
        """Per-conversation zlib compressibility of the ordered turn
        text — the information-density curation signal.  Rows-only:
        DuckDB has no DEFLATE; golden + invariance pytest instead
        (stages/dialog.conv_compressibility)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import conv_compressibility

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "text"])
        return _round_floats(conv_compressibility(turns))

    def q_customers_rfm_segments(sf):
        """RFM quintile segment table over the customer-grained base:
        (q_r, q_f, q_m) cell counts with mean recency and total spend —
        integer rank cuts, all-1-is-best
        (pipelines/relational.rfm_segments)."""
        from s_tsfe_dl_ray.pipelines.relational import rfm_segments

        return _round_floats(rfm_segments(sf))

    def q_docs_quality_pass_rate(sf):
        """Curation acceptance rate per source: share of docs whose
        quality score clears 0.5 — exact counts over the bit-identical
        quality tree (stages/text.quality_pass_rate)."""
        from s_tsfe_dl_ray.stages.text import quality_pass_rate

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["source", "text"])
        return _round_floats(quality_pass_rate(
            ds, group_col="source", threshold=0.5))

    def q_events_two_step_transitions(sf):
        """Two-step Markov matrix P² of the event-type chain —
        sequential mid-state fold bit-exact vs list_reduce
        (stages/dialog.two_step_transitions)."""
        from s_tsfe_dl_ray.stages.dialog import two_step_transitions

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(two_step_transitions(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_interarrival_quantiles(sf):
        """Traffic-burstiness profile per event type: p50/p90 of the
        exact integer-µs gaps between consecutive events
        (stages/quantile.interarrival_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import interarrival_quantiles

        ds = read_events(sf, columns=["event_id", "ts", "event_type"])
        return _round_floats(interarrival_quantiles(
            ds, key="event_type", ts_col="ts",
            order_by=["ts", "event_id"]))

    def q_supplier_revenue_hhi(sf):
        """Supply-concentration audit: HHI of supplier revenue shares
        per nation with the top supplier's share — broadcast dimension,
        exact int64 scaled revenue
        (pipelines/relational.supplier_revenue_hhi)."""
        from s_tsfe_dl_ray.pipelines.relational import supplier_revenue_hhi

        return _round_floats(supplier_revenue_hhi(sf))

    def q_parts_pagerank(sf):
        """PageRank hubs of the repeat-co-purchase part graph (pairs
        bought together in ≥ 2 orders — the family-clusters pruning):
        20 exact damped Jacobi iterations, bit-exact vs the
        unrolled-CTE twin (stages/cluster.pagerank)."""
        from s_tsfe_dl_ray.stages.cluster import pagerank_exact
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        li = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_orderkey", "l_partkey"])
        pairs = pair_cooccurrence(li, group_col="l_orderkey",
                                  member_col="l_partkey") \
            .filter(expr="n_both >= 2")
        return _round_floats(pagerank_exact(
            pairs, a_col="member_a", b_col="member_b",
            damping=0.85, iters=20))

    def q_docs_heaps_law(sf):
        """Heaps'-law vocabulary-growth fit over the doc-id-ordered
        cumulative curve: ln(vocab) = ln k + beta*ln(tokens), bit-exact
        sequential OLS folds (stages/text.heaps_law)."""
        from s_tsfe_dl_ray.stages.text import heaps_law

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        return _round_floats(heaps_law(ds))

    def q_transcripts_readability_by_role(sf):
        """Pooled Flesch reading ease per speaker role — exact int64
        word/sentence/syllable counts, one flesch tree per role
        (stages/dialog.readability_by_role)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import readability_by_role

        turns = _rt(_transcripts_for(sf), columns=["role", "text"])
        return _round_floats(readability_by_role(turns))

    def q_events_linear_attribution(sf):
        """Multi-touch linear attribution: each purchase splits one
        credit unit equally over the user's clicks in the preceding
        24h; credits aggregate by the click's hour-of-day with
        bit-exact ordered folds (stages/funnel.linear_attribution)."""
        from s_tsfe_dl_ray.stages.funnel import linear_attribution

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(linear_attribution(ds))

    def q_orders_size_dispersion(sf):
        """Order-size profile: lineitems per order with the Poisson
        dispersion index from exact int64 moments
        (pipelines/relational.order_size_dispersion)."""
        from s_tsfe_dl_ray.pipelines.relational import (
            order_size_dispersion)

        return _round_floats(order_size_dispersion(sf))

    def q_events_weekly_acf(sf):
        """Weekly-seasonality strength: lag-7 Pearson autocorrelation of
        daily activity counts on the dense day grid — exact int64
        moments (stages/trend.grid_lag_autocorr)."""
        from s_tsfe_dl_ray.stages.trend import grid_lag_autocorr

        ds = read_events(sf, columns=["ts"])
        return _round_floats(grid_lag_autocorr(
            ds, ts_col="ts", tier="1d", lag=7))

    def q_transcripts_echo_rate(sf):
        """Assistant parroting screen per conversation: share of
        assistant-turn distinct tokens already present in the
        immediately-preceding user turn — pooled exact counts
        (stages/dialog.echo_rate)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import echo_rate

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(echo_rate(turns))

    def q_customers_order_cadence(sf):
        """Repeat-purchase rhythm per customer: mean and CV of the
        integer day gaps between consecutive orders (>= 3 orders)
        (pipelines/relational.customer_order_cadence)."""
        from s_tsfe_dl_ray.pipelines.relational import (
            customer_order_cadence)

        return _round_floats(customer_order_cadence(sf))

    def q_events_activity_streaks(sf):
        """Consecutive-active-day streaks per user: longest run and the
        run ending at the user's final active day — gaps-and-islands
        (stages/activity.activity_streaks)."""
        from s_tsfe_dl_ray.stages.activity import activity_streaks

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(activity_streaks(
            ds, key="user_id", ts_col="ts"))

    def q_transcripts_prompt_curve(sf):
        """Reply-length response curve: user→assistant pairs binned
        into prompt-length rank deciles, mean prompt/reply tokens per
        bin (stages/dialog.prompt_response_curve)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import prompt_response_curve

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(prompt_response_curve(turns))

    def q_events_value_deciles(sf):
        """Per-type decile table of event values — nine exact
        quantile_disc picks per type
        (stages/quantile.grouped_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_quantiles(
            ds, value_col="value", keys=["event_type"],
            quantiles=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
        ).sort("event_type"))

    def q_orders_monthly_yoy(sf):
        """Monthly revenue with MoM and YoY growth over the observed
        month sequence — exact int-cent sums, lag-1/lag-12 ratios
        (pipelines/relational.monthly_revenue_yoy)."""
        from s_tsfe_dl_ray.pipelines.relational import monthly_revenue_yoy

        return _round_floats(monthly_revenue_yoy(sf))

    def q_events_daily_health(sf):
        """Composite per-day health table: volume, error rate, exact
        p95 value, distinct users, WoW volume delta
        (pipelines/events_rollup.daily_health)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import daily_health

        return _round_floats(daily_health(sf))

    def q_events_trend_census(sf):
        """Population trend census: how many users trend up / down /
        flat by the SIGN of their 6-decimal-rounded OLS slope — the
        rounding is the driver's own contract, so the classification is
        bit-exact on both sides (stages/trend.grouped_linear_trend +
        a one-row sign fold)."""
        from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        tr = _round_floats(grouped_linear_trend(
            ds, key="user_id", ts_col="ts", value_col="value",
            ref_ts_us=1_704_067_200_000_000))

        def census(df):
            s = df["slope_per_day"] if len(df) else None
            vals = {
                "n_users": len(df),
                "n_up": int((s > 0).sum()) if len(df) else 0,
                "n_down": int((s < 0).sum()) if len(df) else 0,
                "n_flat": int((s == 0).sum()) if len(df) else 0,
                "n_undefined": int(s.isna().sum()) if len(df) else 0,
            }
            return pd.DataFrame(
                {k: pd.Series([v], dtype="int64")
                 for k, v in vals.items()})

        return tr.repartition(1).map_batches(
            census, batch_format="pandas", batch_size=None)

    def q_docs_collocations(sf):
        """Top-20 collocations by PMI over adjacent token pairs
        (n_ab >= 5) — association strength vs the raw-frequency
        top_bigrams (stages/text.collocations_pmi)."""
        from s_tsfe_dl_ray.stages.text import collocations_pmi

        ds = read_table(f"{sf}/documents.parquet", columns=["text"])
        return _round_floats(collocations_pmi(ds, k=20, min_count=5))

    def q_docs_lang_mix(sf):
        """Source × declared-language mix: per source the language
        counts, share, and whether it is the source's dominant language
        (count-desc, lang-asc argmax) — the metadata-side companion of
        docs_lang_id (which predicts from text)."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["source", "lang"])
        counts = grouped_aggregate(ds, keys=["source", "lang"],
                                   aggs={"n_docs": ("lang", "count")})

        def fin(df):
            if len(df) == 0:
                return pd.DataFrame({
                    "source": pd.Series([], dtype="object"),
                    "lang": pd.Series([], dtype="object"),
                    "n_docs": pd.Series([], dtype="int64"),
                    "share": pd.Series([], dtype="float64"),
                    "is_dominant": pd.Series([], dtype="bool")})
            import numpy as np
            g = df.sort_values(["source", "lang"], kind="mergesort") \
                .reset_index(drop=True)
            tot = g.groupby("source", sort=False)["n_docs"] \
                .transform("sum").to_numpy(np.int64)
            n = g["n_docs"].to_numpy(np.int64)
            top = g.sort_values(["source", "n_docs", "lang"],
                                ascending=[True, False, True],
                                kind="mergesort") \
                .groupby("source", sort=False).head(1)
            dom = set(zip(top["source"], top["lang"]))
            return pd.DataFrame({
                "source": g["source"], "lang": g["lang"],
                "n_docs": n,
                "share": n.astype(np.float64) / tot.astype(np.float64),
                "is_dominant": [
                    (s0, l0) in dom
                    for s0, l0 in zip(g["source"], g["lang"])]})

        return _round_floats(counts.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None))

    def q_events_forecast_backtest(sf):
        """One-step forecast backtest per event type on the dense daily
        grid: EWMA-prefix vs naive-carry MAE with the skill ratio —
        bit-exact prefix folds both sides
        (stages/trend.forecast_backtest)."""
        from s_tsfe_dl_ray.stages.trend import forecast_backtest

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(forecast_backtest(
            ds, ts_col="ts", key_col="event_type", tier="1d",
            alpha=0.3))

    def q_events_type_persistence(sf):
        """Per-user behavioral stickiness: share of consecutive event
        pairs repeating the same type (the diagonal mass of the user's
        own transition matrix) (stages/scan.type_persistence)."""
        from s_tsfe_dl_ray.stages.scan import type_persistence

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(type_persistence(
            ds, key="user_id", type_col="event_type",
            order_by=["ts", "event_id"]))

    def q_lineitem_qty_disc_chi2(sf):
        """Pearson χ² independence of (quantity band, discount cents)
        on lineitem — are bigger baskets discounted differently?
        Integer band cuts, the existing chi2 stage
        (stages/distinct.chi2_independence)."""
        from s_tsfe_dl_ray.stages.distinct import chi2_independence

        li = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_quantity", "l_discount"])

        def bands(t: pa.Table) -> pa.Table:
            import numpy as np
            q = pc.cast(t["l_quantity"], pa.float64()).to_numpy(
                zero_copy_only=False)
            d = pc.cast(t["l_discount"], pa.float64()).to_numpy(
                zero_copy_only=False)
            qi = np.copysign(np.floor(np.abs(q) + 0.5), q).astype(
                np.int64)
            di = np.copysign(np.floor(np.abs(d) * 100.0 + 0.5),
                             d).astype(np.int64)
            qa = np.char.add("q", ((qi - 1) // 10).astype(str))
            db = np.char.add("d", di.astype(str))
            return pa.table({
                "qty_band": pa.array(qa.astype(object), pa.string()),
                "disc_band": pa.array(db.astype(object), pa.string())})

        banded = li.map_batches(bands, batch_format="pyarrow",
                                zero_copy_batch=True)
        return _round_floats(chi2_independence(
            banded, col_a="qty_band", col_b="disc_band"))

    def q_transcripts_depth_curve(sf):
        """Conversation depth survival curve: share of conversations
        reaching ≥ k turns for k in (2, 5, 10, 20, 50) — exact counts,
        one division per threshold."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt

        turns = _rt(_transcripts_for(sf), columns=["conv_id"])
        counts = grouped_aggregate(turns, keys=["conv_id"],
                                   aggs={"n": ("conv_id", "count")})

        def fin(df):
            import numpy as np
            ks = np.array([2, 5, 10, 20, 50], np.int64)
            if len(df) == 0:
                n = np.zeros(0, np.int64)
            else:
                n = df["n"].to_numpy(np.int64)
            tot = np.float64(len(n))
            reach = np.array([(n >= k).sum() for k in ks], np.int64)
            with np.errstate(invalid="ignore", divide="ignore"):
                share = reach.astype(np.float64) / tot
            return pd.DataFrame({
                "threshold": ks,
                "n_convs_reaching": reach,
                "share": np.where(np.isfinite(share), share, np.nan)})

        return _round_floats(counts.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None))

    def q_orders_status_age(sf):
        """Order backlog profile: per order status the count, share,
        and mean age in days vs the corpus's latest order date — exact
        integer day arithmetic (the rfm anchor recipe)."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderstatus", "o_orderdate"])

        import datetime as _dt

        import pyarrow.parquet as _pq

        anchor = pc.max(_pq.read_table(
            f"{sf}/orders.parquet",
            columns=["o_orderdate"])["o_orderdate"]).as_py()
        a_day = int((anchor - _dt.datetime(1970, 1, 1)).total_seconds()
                    * 1_000_000) // 86_400_000_000

        def derive(t: pa.Table) -> pa.Table:
            import numpy as np
            us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            age = np.int64(a_day) - us // 86_400_000_000
            return pa.table({"o_orderstatus": t["o_orderstatus"],
                             "_age": pa.array(age.astype(np.int64))})

        agg = grouped_aggregate(
            ds.map_batches(derive, batch_format="pyarrow",
                           zero_copy_batch=True),
            keys=["o_orderstatus"],
            aggs={"n_orders": ("_age", "count"),
                  "_age_sum": ("_age", "sum")})

        def fin(df):
            import numpy as np
            if len(df) == 0:
                return pd.DataFrame({
                    "o_orderstatus": pd.Series([], dtype="object"),
                    "n_orders": pd.Series([], dtype="int64"),
                    "share": pd.Series([], dtype="float64"),
                    "mean_age_days": pd.Series([], dtype="float64")})
            g = df.sort_values("o_orderstatus", kind="mergesort") \
                .reset_index(drop=True)
            n = g["n_orders"].to_numpy(np.int64)
            tot = np.float64(n.sum())
            return pd.DataFrame({
                "o_orderstatus": g["o_orderstatus"],
                "n_orders": n,
                "share": n.astype(np.float64) / tot,
                "mean_age_days": g["_age_sum"].to_numpy(np.int64)
                                 .astype(np.float64)
                                 / n.astype(np.float64)})

        return _round_floats(agg.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None))

    def q_events_type_mix_drift(sf):
        """Daily chi-square drift of the event-type mix vs the
        whole-corpus mix — the ops-monitoring daily sibling of
        orders_priority_drift (stages/robust.category_mix_drift,
        period='1d')."""
        from s_tsfe_dl_ray.stages.robust import category_mix_drift

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(category_mix_drift(
            ds, ts_col="ts", cat_col="event_type", period="1d"))

    def q_events_type_weekday_assoc(sf):
        """Directional association between event type and ISO weekday:
        χ² + Cramér's V + Theil's U(A|B)/U(B|A) from one contingency
        fold — "does the weekday predict the event mix, or only the
        other way round?" (stages/distinct.categorical_association)."""
        from s_tsfe_dl_ray.stages.distinct import categorical_association

        ds = read_events(sf, columns=["ts", "event_type"])

        def dow(t: pa.Table) -> pa.Table:
            ts = t["ts"]
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            d = pd.Series(ts.to_pandas()).dt.dayofweek.to_numpy() + 1
            lab = np.char.add("d", d.astype(str))
            return pa.table({
                "event_type": t["event_type"],
                "dow": pa.array(lab.astype(object), pa.string())})

        return _round_floats(categorical_association(
            ds.map_batches(dow, batch_format="pyarrow"),
            col_a="event_type", col_b="dow"))

    def q_customer_balance_by_segment(sf):
        """Account-balance profile per market segment: exact count /
        mean / negative share / discrete p50 & p90 from ONE
        value-histogram pass (stages/quantile.grouped_value_profile,
        cents-exact)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_value_profile

        cust = read_table(f"{sf}/customer.parquet",
                          columns=["c_mktsegment", "c_acctbal"])
        out = grouped_value_profile(
            cust, value_col="c_acctbal", keys=["c_mktsegment"],
            scale=100, quantiles=(0.5, 0.9))
        return _round_floats(out.sort("c_mktsegment"))

    def q_orders_priority_kruskal(sf):
        """Kruskal–Wallis H: do order values differ across the five
        order priorities?  Pooled midranks from the cents-exact value
        histogram, exact half-integer rank sums, tie-corrected H
        (stages/robust.kruskal_wallis)."""
        from s_tsfe_dl_ray.stages.robust import kruskal_wallis

        orders = read_table(f"{sf}/orders.parquet",
                            columns=["o_orderpriority", "o_totalprice"])
        return _round_floats(kruskal_wallis(
            orders, group_col="o_orderpriority",
            value_col="o_totalprice", scale=100))

    def q_nation_balance_gap(sf):
        """Customer-vs-supplier mean account balance per nation: two
        combiner passes (cents-exact int64 sums) union into one tiny
        per-nation merge with the broadcast 25-row nation dim — the
        cross-table 'which side of the market holds the cash here'
        readout."""
        import pyarrow.parquet as pq

        cu = read_table(f"{sf}/customer.parquet",
                        columns=["c_nationkey", "c_acctbal"])
        su = read_table(f"{sf}/supplier.parquet",
                        columns=["s_nationkey", "s_acctbal"])
        ndf = pq.read_table(f"{sf}/nation.parquet",
                            columns=["n_nationkey", "n_name"]).to_pandas()

        def _tag(nk_col: str, bal_col: str, cust: bool):
            def part(df: pd.DataFrame) -> pd.DataFrame:
                v = df[bal_col].to_numpy(dtype=np.float64)
                ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                                 v).astype(np.int64)
                g = pd.DataFrame({
                    "nk": df[nk_col].astype("int64"),
                    "n_customers": np.int64(1) if cust else np.int64(0),
                    "sc": ci if cust else np.int64(0),
                    "n_suppliers": np.int64(0) if cust else np.int64(1),
                    "ss": np.int64(0) if cust else ci,
                }).groupby("nk", sort=False).sum().reset_index()
                return g
            return part

        parts = cu.map_batches(
            _tag("c_nationkey", "c_acctbal", True),
            batch_format="pandas",
        ).union(su.map_batches(
            _tag("s_nationkey", "s_acctbal", False),
            batch_format="pandas"))

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                df = pd.DataFrame({
                    "nk": pd.Series([], dtype="int64"),
                    "n_customers": pd.Series([], dtype="int64"),
                    "sc": pd.Series([], dtype="int64"),
                    "n_suppliers": pd.Series([], dtype="int64"),
                    "ss": pd.Series([], dtype="int64")})
            agg = df.groupby("nk", sort=False).sum().reset_index()
            out = ndf.merge(agg, left_on="n_nationkey", right_on="nk",
                            how="left").sort_values("n_name")
            nc = out["n_customers"].fillna(0).to_numpy(dtype=np.float64)
            ns = out["n_suppliers"].fillna(0).to_numpy(dtype=np.float64)
            sc = out["sc"].to_numpy(dtype=np.float64)
            ss = out["ss"].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mc = (sc / 100.0) / nc
                ms = (ss / 100.0) / ns
                gap = mc - ms
            mc = np.where(np.isfinite(mc), mc, np.nan)
            ms = np.where(np.isfinite(ms), ms, np.nan)
            gap = np.where(np.isfinite(gap), gap, np.nan)
            return pd.DataFrame({
                "nation": out["n_name"].to_numpy(),
                "n_customers": nc.astype(np.int64),
                "n_suppliers": ns.astype(np.int64),
                "mean_cust_balance": mc,
                "mean_supp_balance": ms,
                "balance_gap": gap})

        return _round_floats(parts.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None))

    def q_docs_novelty_rate(sf):
        """Per-source corpus novelty: the share of each source's
        distinct doc trigrams that appear for the FIRST time (min
        doc_id) in that doc — the re-crawl/templating curation signal
        (stages/text.ngram_novelty)."""
        from s_tsfe_dl_ray.stages.text import ngram_novelty

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "source", "text"])
        return _round_floats(ngram_novelty(ds))

    def q_part_brand_price_profile(sf):
        """Retail-price profile per part brand: exact count / mean /
        negative-share / discrete p50 & p90 from one cents-exact
        value-histogram pass (stages/quantile.grouped_value_profile
        reuse on the part dim)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_value_profile

        parts = read_table(f"{sf}/part.parquet",
                           columns=["p_brand", "p_retailprice"])
        out = grouped_value_profile(
            parts, value_col="p_retailprice", keys=["p_brand"],
            scale=100, quantiles=(0.5, 0.9))
        return _round_floats(out.sort("p_brand"))

    def q_docs_editdist_pairs(sf):
        """Blocked edit-distance near-dup: doc pairs within 10 BYTE edits
        among docs sharing the same 12-codepoint prefix — the typo /
        near-rewrite dedup family member MinHash misses on short texts
        (stages/dedup.edit_distance_pairs; one block-hash exchange, one
        multi-pair vectorized byte DP, exact DuckDB ``levenshtein``
        twin)."""
        from s_tsfe_dl_ray.stages.dedup import edit_distance_pairs

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        return edit_distance_pairs(
            ds, id_col="doc_id", text_col="text",
            prefix_len=12, max_dist=10)

    def q_supplier_catalog_breadth(sf):
        """Per-supplier catalog breadth: lineitem count, DISTINCT parts
        supplied, cents-exact extended-price volume, returned-flag share
        — the assortment-vs-volume skew readout.  Batch partials
        pre-group by (suppkey, partkey) so the single supplier-hash
        exchange carries one row per supply relationship, and the
        distinct-part count is an exact partition-local fold."""
        from s_tsfe_dl_ray.stages.rollup import _stable_pkey

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_suppkey", "l_partkey",
                                 "l_extendedprice", "l_returnflag"])

        def part(df: pd.DataFrame) -> pd.DataFrame:
            v = df["l_extendedprice"].to_numpy(dtype=np.float64)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "sk": df["l_suppkey"].astype("int64"),
                "pk": df["l_partkey"].astype("int64"),
                "n": np.int64(1),
                "ci": ci,
                "r": (df["l_returnflag"].to_numpy()
                      == "R").astype(np.int64),
            }).groupby(["sk", "pk"], sort=False, as_index=False).sum()

        def add_pkey(t: pa.Table) -> pa.Table:
            return t.append_column("_pkey", _stable_pkey(t["sk"], 32))

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "l_suppkey": pd.Series([], dtype="int64"),
                    "n_items": pd.Series([], dtype="int64"),
                    "n_parts": pd.Series([], dtype="int64"),
                    "total_extprice": pd.Series([], dtype="float64"),
                    "return_share": pd.Series([], dtype="float64")})
            g = (df.groupby(["sk", "pk"], sort=False, as_index=False)
                 [["n", "ci", "r"]].sum())
            out = g.groupby("sk", sort=False).agg(
                n_items=("n", "sum"), n_parts=("pk", "size"),
                ci=("ci", "sum"), r=("r", "sum")).reset_index()
            n = out["n_items"].to_numpy(dtype=np.float64)
            return pd.DataFrame({
                "l_suppkey": out["sk"].astype("int64"),
                "n_items": out["n_items"].astype("int64"),
                "n_parts": out["n_parts"].astype("int64"),
                "total_extprice":
                    out["ci"].to_numpy(dtype=np.float64) / 100.0,
                "return_share": out["r"].to_numpy(dtype=np.float64) / n,
            })

        partials = ds.map_batches(part, batch_format="pandas")
        merged = (partials.map_batches(add_pkey, batch_format="pyarrow")
                  .groupby("_pkey").map_groups(fold, batch_format="pandas"))
        return _round_floats(merged.sort("l_suppkey"))

    def q_events_mann_kendall(sf):
        """Per-user Mann–Kendall trend TEST over daily value totals:
        S over day pairs, tie-corrected Var(S), continuity-corrected z
        (stages/robust.mann_kendall) — the distribution-free "is this
        user's spend actually trending" significance screen on top of
        the kendall_tau effect size.  Daily totals ride as cents-exact
        int partials, so every sign/tie comparison is bit-exact."""
        from s_tsfe_dl_ray.stages.robust import mann_kendall

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000,
                "sv": ci,
            }).groupby(["user_id", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        out = mann_kendall(daily, key="user_id", order_col="d",
                           value_col="sv", min_n=3)
        return _round_floats(out.sort("user_id"))

    def q_orders_priority_status_chi2(sf):
        """Priority × status independence on the orders dim: Pearson χ²
        + Cramér's V over the full contingency grid incl. unobserved
        zero cells (stages/distinct.chi2_independence reuse) — does
        urgency actually change fulfillment state?"""
        from s_tsfe_dl_ray.stages.distinct import chi2_independence

        ds = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderpriority", "o_orderstatus"])
        return _round_floats(chi2_independence(
            ds, col_a="o_orderpriority", col_b="o_orderstatus"))

    def q_lineitem_qty_disc_gamma(sf):
        """Goodman–Kruskal gamma + Kendall tau-b between quantity decile
        bin and discount level (stages/robust.ordinal_association) —
        the ORDERED-category association the chi-square sibling ignores:
        do bigger orders systematically get deeper discounts?  All pair
        counts are exact int64 suffix-sum folds over the contingency
        cells; row count never enters the pair loop."""
        from s_tsfe_dl_ray.stages.robust import ordinal_association

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_quantity", "l_discount"])

        def binify(t: pa.Table) -> pa.Table:
            q = pc.cast(t["l_quantity"], pa.float64()).to_numpy(
                zero_copy_only=False)
            d = pc.cast(t["l_discount"], pa.float64()).to_numpy(
                zero_copy_only=False)
            qa = ((np.copysign(np.floor(np.abs(q) + 0.5), q)
                   .astype(np.int64) - 1) // 10)
            db = np.copysign(np.floor(np.abs(d) * 100.0 + 0.5),
                             d).astype(np.int64)
            return pa.table({"qa": pa.array(qa), "db": pa.array(db)})

        binned = ds.map_batches(binify, batch_format="pyarrow")
        return _round_floats(ordinal_association(
            binned, col_a="qa", col_b="db"))

    def q_events_friedman_types(sf):
        """Friedman blocked-ranks test: do event types rank consistently
        differently across days (blocks = days, treatments = types,
        value = cents-exact daily total, absent cells = 0)?  The
        blocked sibling of the Kruskal–Wallis screen
        (stages/robust.friedman_test); mid-ranks are exact .5 multiples
        so the statistic matches the SQL window-rank twin bit-for-bit."""
        from s_tsfe_dl_ray.stages.robust import friedman_test

        ds = read_table(f"{sf}/events.parquet",
                        columns=["ts", "event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"d": pa.array(us // 86_400_000_000),
                             "ty": t["event_type"],
                             "ci": pa.array(ci)})

        cells = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(friedman_test(
            cells, block_col="d", treat_col="ty", value_col="ci"))

    def q_events_cliffs_delta(sf):
        """Cliff's delta of purchase vs click value (cents-exact): the
        distribution-free effect size behind the Mann–Whitney test —
        net share of cross-group pairs where a purchase outranks a
        click (stages/robust.cliffs_delta; exact cumulative pair
        counts over per-value cells, no materialized pairs)."""
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            ty = t["event_type"]
            keep = pc.is_in(ty, value_set=pa.array(["click", "purchase"]))
            sub = t.filter(keep)
            v = pc.cast(sub["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            g = pc.equal(sub["event_type"], "purchase")
            return pa.table({
                "g": pc.cast(g, pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_events_durbin_watson(sf):
        """Per-user Durbin–Watson over OLS-detrended daily value totals
        (stages/robust.durbin_watson): is what the user's trend line
        leaves behind serially correlated?  Daily totals ride as
        cents-exact int partials; slope and DW come from one fixed
        float expression tree over exact integer moments, shared with
        the SQL twin."""
        from s_tsfe_dl_ray.stages.robust import durbin_watson

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000,
                "sv": ci,
            }).groupby(["user_id", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        out = durbin_watson(daily, key="user_id", order_col="d",
                            value_col="sv", min_n=3)
        return _round_floats(out.sort("user_id"))

    def q_docs_editdist_clusters(sf):
        """Transitive closure of the prefix-blocked edit-distance pairs:
        every near-rewrite doc labeled with its connected component's
        min id (hash-to-min label propagation over the 5o pair stage) —
        completes the dedup family's editdist branch the way
        emb_dedup_clusters completes the embedding branch.  Oracle:
        recursive-CTE reachability min."""
        from s_tsfe_dl_ray.stages.cluster import connected_components
        from s_tsfe_dl_ray.stages.dedup import edit_distance_pairs

        ds = read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
        pairs = edit_distance_pairs(ds, id_col="doc_id", text_col="text",
                                    prefix_len=12, max_dist=10)
        return connected_components(pairs).sort("id")

    def q_docs_block_selectivity(sf):
        """Blocking-selectivity audit for the editdist prefix scheme:
        per block SIZE, how many blocks and how many candidate pairs
        the quadratic verify would face — the readout you compute
        BEFORE running pair expansion on a 100-TB corpus to bound its
        cost.  One block-count combiner, then a tiny count-of-counts
        fold."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/documents.parquet", columns=["text"])

        def prep(t: pa.Table) -> pa.Table:
            blk = pc.utf8_slice_codeunits(t["text"], 0, 12)
            out = pa.table({"p": blk}).combine_chunks().group_by(
                ["p"], use_threads=False).aggregate([([], "count_all")])
            return out.rename_columns(["p", "c"])

        counts = _grouped_min(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
            group_cols=["p"], agg_cols=[("c", "sum")], pkey_col="p",
            num_partitions=8)

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "block_size": pd.Series([], dtype="int64"),
                    "n_blocks": pd.Series([], dtype="int64"),
                    "n_candidate_pairs": pd.Series([], dtype="int64")})
            g = df.groupby("c", sort=True).size()
            c = g.index.to_numpy(dtype=np.int64)
            nb = g.to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "block_size": c,
                "n_blocks": nb,
                "n_candidate_pairs": nb * (c * (c - 1) // 2)})

        return (counts.repartition(1)
                .map_batches(fold, batch_format="pandas",
                             batch_size=None).sort("block_size"))

    def q_events_yuen_t(sf):
        """Yuen's trimmed-mean t-test, purchase vs click value: the
        robust location comparison that survives the heavy tails
        Welch's t chokes on (stages/robust.yuen_trimmed_t).  20% = N//5
        observations trimmed per end via exact order statistics on
        cents cells; t and df flow through one fixed float tree."""
        from s_tsfe_dl_ray.stages.robust import yuen_trimmed_t

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["event_type"],
                            value_set=pa.array(["click", "purchase"]))
            sub = t.filter(keep)
            v = pc.cast(sub["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({
                "g": pc.cast(pc.equal(sub["event_type"], "purchase"),
                             pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(yuen_trimmed_t(
            pairs, group_col="g", value_col="v", trim_den=5))

    def q_transcripts_len_cliffs(sf):
        """Cliff's delta of assistant-vs-user turn length (codepoints):
        how often does an assistant turn outweigh a user turn, net —
        the scale-free verbosity-imbalance readout
        (stages/robust.cliffs_delta reuse on the dialog surface;
        lengths are exact ints, so pair counts are exact)."""
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        turns = read_table(_transcripts_for(sf),
                           columns=["role", "text"])

        def derive(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["role"],
                            value_set=pa.array(["user", "assistant"]))
            sub = t.filter(keep)
            return pa.table({
                "g": pc.cast(pc.equal(sub["role"], "assistant"),
                             pa.int64()),
                "v": pc.cast(pc.utf8_length(sub["text"]), pa.int64())})

        pairs = turns.map_batches(derive, batch_format="pyarrow")
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_events_seasonal_mk(sf):
        """Seasonal (Hirsch–Slack) Mann–Kendall over daily value totals
        with weekday seasons: per-weekday MK S and integer variance
        numerators summed exactly before the single /18.0, so the
        weekly cycle can't fake or mask a monotone trend
        (stages/robust.seasonal_mann_kendall)."""
        from s_tsfe_dl_ray.stages.robust import seasonal_mann_kendall

        ds = read_table(f"{sf}/events.parquet", columns=["ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            d = us // 86_400_000_000
            return pd.DataFrame({
                "season": ((d + 3) % 7) + 1,   # ISO Mon=1..Sun=7
                "d": d,
                "sv": ci,
            }).groupby(["season", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        return _round_floats(seasonal_mann_kendall(
            daily, season_col="season", order_col="d", value_col="sv",
            min_n=2))

    def q_transcripts_alternation_runs(sf):
        """Per-conversation Wald–Wolfowitz runs test on the
        user/assistant role sequence (stages/robust.binary_runs_test):
        z ≪ 0 = monologue streaks, z ≫ 0 = stricter-than-chance
        turn-taking — the dialog-structure randomness screen."""
        from s_tsfe_dl_ray.stages.robust import binary_runs_test

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role"])

        def derive(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["role"],
                            value_set=pa.array(["user", "assistant"]))
            sub = t.filter(keep)
            return pa.table({
                "conv_id": sub["conv_id"],
                "ts": sub["ts"], "turn_idx": sub["turn_idx"],
                "b": pc.cast(pc.equal(sub["role"], "assistant"),
                             pa.int64())})

        seq = turns.map_batches(derive, batch_format="pyarrow")
        out = binary_runs_test(seq, key="conv_id", flag_col="b",
                               order_by=["ts", "turn_idx"])
        return _round_floats(out.sort("conv_id"))

    def q_nation_part_coverage(sf):
        """Supply-chain coverage per nation: distinct suppliers, distinct
        parts its suppliers ship, and the share of the whole part
        catalog covered — a 3-way star join where lineitem's (supp,
        part) pairs dedup through ONE hash exchange and the supplier →
        nation map rides as a broadcast dict (100 rows), never a
        shuffle."""
        import pyarrow.parquet as pq

        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        sup = pq.read_table(f"{sf}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        nat = pq.read_table(f"{sf}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        n_parts_total = pq.read_metadata(f"{sf}/part.parquet").num_rows
        sk2nk = dict(zip(sup["s_suppkey"].to_pylist(),
                         sup["s_nationkey"].to_pylist()))
        nk2name = dict(zip(nat["n_nationkey"].to_pylist(),
                           nat["n_name"].to_pylist()))
        sup_per_nation = (pd.Series(list(sk2nk.values()))
                          .value_counts().to_dict())

        li = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_suppkey", "l_partkey"])

        def to_nation_part(df: pd.DataFrame) -> pd.DataFrame:
            nk = df["l_suppkey"].map(sk2nk).astype("int64")
            return (pd.DataFrame({"nk": nk,
                                  "pk": df["l_partkey"].astype("int64")})
                    .drop_duplicates())

        pairs = li.map_batches(to_nation_part, batch_format="pandas")
        dedup = _grouped_min(pairs, group_cols=["nk", "pk"],
                             agg_cols=[("pk", "count")], pkey_col="pk")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "n_name": pd.Series([], dtype="object"),
                    "n_suppliers": pd.Series([], dtype="int64"),
                    "n_parts_supplied": pd.Series([], dtype="int64"),
                    "coverage": pd.Series([], dtype="float64")})
            g = df.groupby("nk", sort=True).size()
            nk = g.index.to_numpy(dtype=np.int64)
            np_sup = g.to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "n_name": [nk2name[int(k)] for k in nk],
                "n_suppliers": pd.Series(
                    [sup_per_nation[int(k)] for k in nk], dtype="int64"),
                "n_parts_supplied": np_sup,
                "coverage": np_sup / np.float64(n_parts_total)})

        out = (dedup.repartition(1)
               .map_batches(fold, batch_format="pandas", batch_size=None))
        return _round_floats(out.sort("n_name"))

    def q_lineitem_qty_slope_by_decile(sf):
        """Heterogeneous price sensitivity: OLS slope + intercept of
        extended price on quantity WITHIN each quantity decile bin —
        does the per-unit price change across order sizes?  All moments
        are exact int64 (qty ints × price cents) through one tiny
        exchange; the closed-form fit runs the identical float tree as
        the SQL twin."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_quantity", "l_extendedprice"])

        def part(t: pa.Table) -> pd.DataFrame:
            q = pc.cast(t["l_quantity"], pa.float64()).to_numpy(
                zero_copy_only=False)
            p = pc.cast(t["l_extendedprice"], pa.float64()).to_numpy(
                zero_copy_only=False)
            x = np.copysign(np.floor(np.abs(q) + 0.5), q).astype(np.int64)
            y = np.copysign(np.floor(np.abs(p) * 100.0 + 0.5),
                            p).astype(np.int64)
            return pd.DataFrame({
                "qty_bin": (x - 1) // 10,
                "n": np.int64(1), "sx": x, "sy": y,
                "sxx": x * x, "sxy": x * y,
            }).groupby("qty_bin", sort=False, as_index=False).sum()

        partials = ds.map_batches(part, batch_format="pyarrow")
        merged = _grouped_min(
            partials, group_cols=["qty_bin"],
            agg_cols=[("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                      ("sxx", "sum"), ("sxy", "sum")],
            pkey_col="qty_bin", num_partitions=4)

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "qty_bin": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "slope": pd.Series([], dtype="float64"),
                    "intercept": pd.Series([], dtype="float64")})
            n = df["n"].to_numpy(dtype=np.float64)
            sx = df["sx"].to_numpy(dtype=np.float64)
            sy = df["sy"].to_numpy(dtype=np.float64)
            sxx = df["sxx"].to_numpy(dtype=np.float64)
            sxy = df["sxy"].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
                a = (sy - b * sx) / n
            return pd.DataFrame({
                "qty_bin": df["qty_bin"].astype("int64"),
                "n": df["n"].astype("int64"),
                "slope": np.where(np.isfinite(b), b, np.nan) / 100.0,
                "intercept": np.where(np.isfinite(a), a, np.nan) / 100.0})

        out = (merged.repartition(1)
               .map_batches(fin, batch_format="pandas", batch_size=None))
        return _round_floats(out.sort("qty_bin"))

    def q_docs_lang_length_kw(sf):
        """Kruskal–Wallis H across languages on document length
        (n_chars): does length distribution differ by language, rank-
        robustly?  kruskal_wallis reuse at scale=1 — lengths are
        already exact ints, so pooled midranks are exact half-integers."""
        from s_tsfe_dl_ray.stages.robust import kruskal_wallis

        docs = read_table(f"{sf}/documents.parquet",
                          columns=["lang", "n_chars"])
        return _round_floats(kruskal_wallis(
            docs, group_col="lang", value_col="n_chars", scale=1))

    def q_customer_segment_yuen(sf):
        """Yuen's trimmed t: BUILDING-segment vs all-other customer
        account balances (cents-exact) — the robust 'is this segment
        richer' location test immune to balance outliers
        (stages/robust.yuen_trimmed_t reuse on the customer dim)."""
        from s_tsfe_dl_ray.stages.robust import yuen_trimmed_t

        ds = read_table(f"{sf}/customer.parquet",
                        columns=["c_mktsegment", "c_acctbal"])

        def derive(t: pa.Table) -> pa.Table:
            v = pc.cast(t["c_acctbal"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({
                "g": pc.cast(pc.equal(t["c_mktsegment"], "BUILDING"),
                             pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(yuen_trimmed_t(
            pairs, group_col="g", value_col="v", trim_den=5))

    def q_events_weekend_cliffs(sf):
        """Cliff's delta of weekend vs weekday DAILY value totals —
        the rank-robust sibling of events_weekend_effect (Welch): how
        often does a weekend day out-earn a weekday, net?  Daily cents
        ride as exact partials into the per-value cell fold
        (stages/robust.cliffs_delta reuse)."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        ds = read_table(f"{sf}/events.parquet", columns=["ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "d": us // 86_400_000_000, "sv": ci,
            }).groupby("d", sort=False, as_index=False).sum()

        daily = _grouped_min(
            ds.map_batches(part, batch_format="pyarrow"),
            group_cols=["d"], agg_cols=[("sv", "sum")], pkey_col="d",
            num_partitions=8)

        def to_pairs(t: pa.Table) -> pa.Table:
            d = t["d"].to_numpy(zero_copy_only=False)
            dow = ((d + 3) % 7) + 1          # ISO Mon=1..Sun=7
            return pa.table({
                "g": pa.array((dow >= 6).astype(np.int64)),
                "v": t["sv"]})

        pairs = daily.map_batches(to_pairs, batch_format="pyarrow")
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_lineitem_tax_disc_gamma(sf):
        """Ordinal association between tax level and discount level
        (stages/robust.ordinal_association reuse): do discounted lines
        systematically carry different tax?  Exact suffix-sum pair
        counts over the tiny levels grid."""
        from s_tsfe_dl_ray.stages.robust import ordinal_association

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_tax", "l_discount"])

        def binify(t: pa.Table) -> pa.Table:
            tx = pc.cast(t["l_tax"], pa.float64()).to_numpy(
                zero_copy_only=False)
            d = pc.cast(t["l_discount"], pa.float64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "ta": pa.array(np.copysign(
                    np.floor(np.abs(tx) * 100.0 + 0.5),
                    tx).astype(np.int64)),
                "db": pa.array(np.copysign(
                    np.floor(np.abs(d) * 100.0 + 0.5),
                    d).astype(np.int64))})

        binned = ds.map_batches(binify, batch_format="pyarrow")
        return _round_floats(ordinal_association(
            binned, col_a="ta", col_b="db"))

    def q_events_median_test(sf):
        """Brown–Mood median test across event types: per type, counts
        above vs at-or-below the POOLED cents median (exact
        quantile_disc element), then the k×2 chi-square — the
        median-based sibling of Kruskal–Wallis that only needs one
        order statistic (stages/robust.median_test)."""
        from s_tsfe_dl_ray.stages.robust import median_test

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])
        return _round_floats(median_test(
            ds, group_col="event_type", value_col="value", scale=100))

    def q_lineitem_returnflag_median(sf):
        """Brown–Mood median test of extended price across return
        flags (stages/robust.median_test reuse): do returned lines
        skew above or below the pooled price median?"""
        from s_tsfe_dl_ray.stages.robust import median_test

        ds = read_table(f"{sf}/lineitem.parquet",
                        columns=["l_returnflag", "l_extendedprice"])
        return _round_floats(median_test(
            ds, group_col="l_returnflag", value_col="l_extendedprice",
            scale=100))

    def q_market_balance_cliffs(sf):
        """Cross-table Cliff's delta: supplier (g=1) vs customer (g=0)
        account balances — the rank-robust answer to 'which side of the
        market holds the cash' that nation_balance_gap's means can't
        give when balances are heavy-tailed.  Two pruned reads union
        into the per-value cell fold (stages/robust.cliffs_delta)."""
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        cu = read_table(f"{sf}/customer.parquet", columns=["c_acctbal"])
        su = read_table(f"{sf}/supplier.parquet", columns=["s_acctbal"])

        def tag(col: str, g: int):
            def fn(t: pa.Table) -> pa.Table:
                v = pc.cast(t[col], pa.float64()).to_numpy(
                    zero_copy_only=False)
                ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                                 v).astype(np.int64)
                return pa.table({
                    "g": pa.array(np.full(len(ci), g, dtype=np.int64)),
                    "v": pa.array(ci)})
            return fn

        pairs = (cu.map_batches(tag("c_acctbal", 0),
                                batch_format="pyarrow")
                 .union(su.map_batches(tag("s_acctbal", 1),
                                       batch_format="pyarrow")))
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_orders_status_yuen(sf):
        """Yuen's trimmed t: fulfilled (F, g=0) vs open (O, g=1) order
        totals — did open orders change size, robust to total-price
        outliers (stages/robust.yuen_trimmed_t reuse)."""
        from s_tsfe_dl_ray.stages.robust import yuen_trimmed_t

        ds = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderstatus", "o_totalprice"])

        def derive(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["o_orderstatus"],
                            value_set=pa.array(["F", "O"]))
            sub = t.filter(keep)
            v = pc.cast(sub["o_totalprice"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({
                "g": pc.cast(pc.equal(sub["o_orderstatus"], "O"),
                             pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(yuen_trimmed_t(
            pairs, group_col="g", value_col="v", trim_den=5))

    def q_orders_monthly_mk(sf):
        """Mann–Kendall trend test over MONTHLY order revenue totals
        (whole-business cadence; stages/robust.mann_kendall reuse with
        a single global key) — is revenue monotonically drifting month
        over month, distribution-free?"""
        from s_tsfe_dl_ray.stages.robust import mann_kendall

        ds = read_table(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            d = us // 86_400_000_000
            # month index = year*12 + month - 1, computed from the date
            # on both sides (pd.to_datetime year/month here, DuckDB
            # year()/month() in the twin)
            ym = pd.to_datetime(d, unit="D")
            mk = (ym.year.to_numpy() * 12
                  + ym.month.to_numpy() - 1).astype(np.int64)
            v = pc.cast(t["o_totalprice"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "scope": np.int64(1), "m": mk, "sv": ci,
            }).groupby(["scope", "m"], sort=False, as_index=False).sum()

        monthly = ds.map_batches(part, batch_format="pyarrow")
        out = mann_kendall(monthly, key="scope", order_col="m",
                          value_col="sv", min_n=3)
        return _round_floats(out)

    def q_events_type_cliffs_matrix(sf):
        """Pairwise Cliff's delta matrix over the event types' DAILY
        cent totals: for every ordered type pair (a < b), the net share
        of day pairs where b's daily total beats a's — the full
        rank-robust effect-size grid behind the pairwise-KS matrix.
        Daily totals ride as exact int partials; the 5×5 grid
        finalizes on one tiny partition."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/events.parquet",
                        columns=["ts", "event_type", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "ty": t["event_type"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000, "sv": ci,
            }).groupby(["ty", "d"], sort=False, as_index=False).sum()

        daily = _grouped_min(
            ds.map_batches(part, batch_format="pyarrow"),
            group_cols=["ty", "d"], agg_cols=[("sv", "sum")],
            pkey_col="d", num_partitions=8)

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "ty_a": pd.Series([], dtype="object"),
                    "ty_b": pd.Series([], dtype="object"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                    "delta": pd.Series([], dtype="float64")})
            g = (df.groupby(["ty", "d"], sort=True, as_index=False)
                 ["sv"].sum())
            types = sorted(g["ty"].unique())
            rows = []
            for i, ta in enumerate(types):
                va = g.loc[g["ty"] == ta, "sv"].to_numpy()
                for tb in types[i + 1:]:
                    vb = g.loc[g["ty"] == tb, "sv"].to_numpy()
                    diff = vb[:, None] - va[None, :]
                    conc = int((diff > 0).sum())
                    disc = int((diff < 0).sum())
                    rows.append((ta, tb, len(va), len(vb),
                                 (conc - disc)
                                 / np.float64(len(va) * len(vb))))
            return pd.DataFrame({
                "ty_a": [r[0] for r in rows],
                "ty_b": [r[1] for r in rows],
                "n_a": pd.Series([r[2] for r in rows], dtype="int64"),
                "n_b": pd.Series([r[3] for r in rows], dtype="int64"),
                "delta": [float(r[4]) for r in rows]})

        out = (daily.repartition(1)
               .map_batches(fin, batch_format="pandas", batch_size=None))
        return _round_floats(out.sort(["ty_a", "ty_b"]))

    def q_part_size_price_gamma(sf):
        """Ordinal association between part size and retail-price cents
        (stages/robust.ordinal_association reuse): do physically bigger
        parts command higher list prices, rank-wise?"""
        from s_tsfe_dl_ray.stages.robust import ordinal_association

        ds = read_table(f"{sf}/part.parquet",
                        columns=["p_size", "p_retailprice"])

        def binify(t: pa.Table) -> pa.Table:
            p = pc.cast(t["p_retailprice"], pa.float64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "sz": pc.cast(t["p_size"], pa.int64()),
                "pr": pa.array(np.copysign(
                    np.floor(np.abs(p) * 100.0 + 0.5),
                    p).astype(np.int64))})

        binned = ds.map_batches(binify, batch_format="pyarrow")
        return _round_floats(ordinal_association(
            binned, col_a="sz", col_b="pr"))

    def q_events_window_pairs(sf):
        """Supervised (input-window, label-window) pair generation — the
        reference's forecasting batch generator as a Dataset fan-out
        (stages/slide.window_pairs; timeseries_batch_generator.py:
        186-299): per user, series ordered by (ts, event_id), anchors
        every stride=4 rows emit input v[p-8:p] / label v[p:p+4] over
        int-cent values.  Windows ride as Arrow lists in the engine; the
        query stringifies them (array_to_string twin) so the driver's
        value hash sees scalar columns."""
        from s_tsfe_dl_ray.stages.slide import window_pairs

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"])

        def cents(t: pa.Table) -> pa.Table:
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                             "event_id": t["event_id"],
                             "cv": pa.array(ci)})

        prep = ds.map_batches(cents, batch_format="pyarrow")
        out = window_pairs(prep, keys=["user_id"],
                           order_by=["ts", "event_id"], value_col="cv",
                           length=8, length_target=4, stride=4)

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["input_win"] = [",".join(map(str, a))
                               for a in df["input_win"]]
            df["label_win"] = [",".join(map(str, a))
                               for a in df["label_win"]]
            return df

        return (out.map_batches(fmt, batch_format="pandas")
                .sort(["user_id", "anchor_idx"]))

    # ORDER MATTERS: the driver records rows for exactly the FIRST 50 dict
    # entries (insertion order).  Round-5 rotation (VERDICT r4 #1): the
    # round-4/5 operator waves (robust battery MAD/Theil–Sen/Spearman/
    # Mann–Whitney/KS/changepoint/drawdown/Kendall/Cliffs/MK/Yuen, TPC-H
    # Q2/Q5/Q9/Q21 reps, survival KM/log-rank/CUPED, dialog ops, activity
    # battery, pagerank_exact, collocations, Zipf/JS-divergence, hopping
    # windows, quantize-error) had never received an external CORRECTNESS
    # row, so 30 of those queries now occupy recorded slots while the same
    # representative core of 20 long-green veterans (rollup tiers,
    # gap-fill, sessionize, scan, joins, as-of, dedup/kNN/cluster,
    # transcripts, codec round-trip, incremental refresh) is retained.
    # Every recorded slot remains oracle-paired (hash-checkable).  The
    # demoted round-3 wave follows immediately after the cap (r4 driver
    # rows on record) — still oracle-paired, still verified at driver
    # scale by tests/test_entry_contract.py.  Rows-only (no_oracle)
    # queries last.
    return {
        # -- recorded slots 1–50 (hash-checked by the driver) --------------
        # retained veterans (20):
        "events_rollup_1m": q_events_rollup_1m,
        "events_rollup_1h": q_events_rollup_1h,
        "events_rollup_1d": q_events_rollup_1d,
        "events_gapfill_ffill_1h": q_events_gapfill_ffill_1h,
        "events_gapfill_interp_1h": q_events_gapfill_interp_1h,
        "events_sessionize_30m": q_events_sessionize_30m,
        "events_running_sum": q_events_running_sum,
        "lineitem_pricing_summary": q_lineitem_pricing_summary,
        "orders_lineitem_join": q_orders_lineitem_join,
        "events_asof_purchase": q_events_asof_purchase,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "emb_knn_top10": q_emb_knn_top10,
        "emb_neardup_04": q_emb_neardup_04,
        "emb_dedup_clusters": q_emb_dedup_clusters,
        "docs_dedup_keep": q_docs_dedup_keep,
        "transcripts_rollup_1h": q_transcripts_rollup_1h,
        "transcripts_toolcall_last_user": q_transcripts_toolcall_last_user,
        "transcripts_codec_roundtrip_oracle": q_transcripts_codec_roundtrip_oracle,
        "events_incremental_1h": q_events_incremental_1h,
        # round-4/5 waves, promoted for FIRST external verification (30)
        # (VERDICT r4 #1: robust battery, TPC-H reps, survival/CUPED,
        # dialog ops, activity battery, pagerank_exact, collocations, …):
        "events_mad_per_user": q_events_mad_per_user,
        "events_theil_sen": q_events_theil_sen,
        "events_spearman_trend": q_events_spearman_trend,
        "events_mannwhitney_u": q_events_mannwhitney_u,
        "events_ks_test": q_events_ks_test,
        "events_changepoint": q_events_changepoint,
        "events_drawdown": q_events_drawdown,
        "events_hopping_1h_15m": q_events_hopping_1h_15m,
        "docs_zipf_slope": q_docs_zipf_slope,
        "docs_js_divergence": q_docs_js_divergence,
        "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
        "tpch_q5_local_suppliers": q_tpch_q5_local_suppliers,
        "tpch_q9_product_profit": q_tpch_q9_product_profit,
        "tpch_q21_waiting_supplier": q_tpch_q21_waiting_supplier,
        "events_survival_km": q_events_survival_km,
        "events_logrank": q_events_logrank,
        "events_cuped": q_events_cuped,
        "transcripts_role_transitions": q_transcripts_role_transitions,
        "transcripts_tool_streaks": q_transcripts_tool_streaks,
        "transcripts_context_cost": q_transcripts_context_cost,
        "transcripts_tool_usage": q_transcripts_tool_usage,
        "events_active_users": q_events_active_users,
        "events_funnel_latency": q_events_funnel_latency,
        "parts_pagerank": q_parts_pagerank,
        "docs_collocations": q_docs_collocations,
        "events_kendall_tau": q_events_kendall_tau,
        "events_cliffs_delta": q_events_cliffs_delta,
        "events_mann_kendall": q_events_mann_kendall,
        "events_yuen_t": q_events_yuen_t,
        "events_window_pairs": q_events_window_pairs,
        # ---- 50-row cap boundary (see ORDER MATTERS above) ---------------
        # oracle-paired overflow: checked by the rehearsal test at driver
        # scale; driver rows appear only if the cap lifts.  Demoted r3/r4
        # wave (r4 driver rows on record) first, then demoted veterans
        # (r1–r3 rows), then the rest.
        "emb_quantize_error": q_emb_quantize_error,
        "events_linear_trend": q_events_linear_trend,
        "events_m4_1h": q_events_m4_1h,
        "events_trailing_zscore": q_events_trailing_zscore,
        "events_trailing_1h": q_events_trailing_1h,
        "events_value_delta": q_events_value_delta,
        "events_rolling_median5": q_events_rolling_median5,
        "events_twa": q_events_twa,
        "events_funnel": q_events_funnel,
        "events_cohort_retention": q_events_cohort_retention,
        "events_cusum": q_events_cusum,
        "events_seasonal_adjust": q_events_seasonal_adjust,
        "events_type_corr": q_events_type_corr,
        "events_grouping_sets": q_events_grouping_sets,
        "events_burstiness": q_events_burstiness,
        "events_lag1_autocorr": q_events_lag1_autocorr,
        "events_percent_rank": q_events_percent_rank,
        "events_snapshot_diff": q_events_snapshot_diff,
        "events_binary_metrics": q_events_binary_metrics,
        "events_auc": q_events_auc,
        "events_calibration": q_events_calibration,
        "events_click_attribution": q_events_click_attribution,
        "events_distinct_users_1h": q_events_distinct_users_1h,
        "events_top_types_per_user": q_events_top_types_per_user,
        "events_pivot_type_sums": q_events_pivot_type_sums,
        "customers_no_orders": q_customers_no_orders,
        "docs_tfidf_top3": q_docs_tfidf_top3,
        "docs_bm25": q_docs_bm25,
        "docs_bpe_token_count": q_docs_bpe_token_count,
        "emb_label_centroids": q_emb_label_centroids,
        "transcripts_reply_latency": q_transcripts_reply_latency,
        "events_error_rate_1d": q_events_error_rate_1d,
        "events_top20_windows_1h": q_events_top20_windows_1h,
        "events_first_per_key": q_events_first_per_key,
        "events_latest_per_key": q_events_latest_per_key,
        "events_rolling_mean5": q_events_rolling_mean5,
        "events_standardize": q_events_standardize,
        "events_one_hot": q_events_one_hot,
        "events_segment_runs": q_events_segment_runs,
        "events_hash_split": q_events_hash_split,
        "events_stratified_split": q_events_stratified_split,
        "events_ensemble_mean": q_events_ensemble_mean,
        "events_retention_1h": q_events_retention_1h,
        "events_type_counts": q_events_type_counts,
        "events_value_variance": q_events_value_variance,
        "events_attention_pool": q_events_attention_pool,
        "events_sliding_features": q_events_sliding_features,
        "events_reverse_series": q_events_reverse_series,
        "docs_token_stats": q_docs_token_stats,
        "docs_quality": q_docs_quality,
        "docs_normalize": q_docs_normalize,
        "docs_chars_quantiles": q_docs_chars_quantiles,
        "docs_lang_id": q_docs_lang_id,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_prep_pipeline": q_docs_prep_pipeline,
        "docs_top_tokens": q_docs_top_tokens,
        "docs_chunk_windows": q_docs_chunk_windows,
        "docs_redact": q_docs_redact,
        "transcripts_gapfill_ffill_1h": q_transcripts_gapfill_ffill_1h,
        "transcripts_sessions_30m": q_transcripts_sessions_30m,
        "transcripts_order_fingerprint": q_transcripts_order_fingerprint,
        "events_winsorize_p95": q_events_winsorize_p95,
        "transcripts_role_funnel": q_transcripts_role_funnel,
        "events_sample_per_user": q_events_sample_per_user,
        "events_impute_mean": q_events_impute_mean,
        "events_next_purchase": q_events_next_purchase,
        "events_props_extract": q_events_props_extract,
        "events_standardize_per_user": q_events_standardize_per_user,
        "events_funnel_24h": q_events_funnel_24h,
        "events_longest_error_streak": q_events_longest_error_streak,
        "events_top3_by_value": q_events_top3_by_value,
        "docs_token_entropy": q_docs_token_entropy,
        "events_unpivot_type_sums": q_events_unpivot_type_sums,
        # round-4 wave (oracle-paired, past the cap — rotate into the
        # recorded 50 next round):
        "events_paa8": q_events_paa8,
        "events_sax4": q_events_sax4,
        "events_value_histogram": q_events_value_histogram,
        "events_mode_type": q_events_mode_type,
        "events_bollinger": q_events_bollinger,
        "revenue_by_nation": q_revenue_by_nation,
        "docs_bigram_top20": q_docs_bigram_top20,
        "events_cross_corr_1h": q_events_cross_corr_1h,
        "emb_cosine_centroid": q_emb_cosine_centroid,
        "events_acf": q_events_acf,
        "events_user_quantiles": q_events_user_quantiles,
        "events_resample_locf": q_events_resample_locf,
        "docs_vocab_stats": q_docs_vocab_stats,
        "events_dominant_period": q_events_dominant_period,
        "events_type_concentration": q_events_type_concentration,
        "events_daily_user_hhi": q_events_daily_user_hhi,
        "tpch_q3_shipping": q_tpch_q3_shipping,
        "tpch_q4_priority_returns": q_tpch_q4_priority_returns,
        "tpch_q10_returned_revenue": q_tpch_q10_returned_revenue,
        "tpch_q14_promo_share": q_tpch_q14_promo_share,
        "tpch_q18_large_orders": q_tpch_q18_large_orders,
        "events_skew_kurtosis": q_events_skew_kurtosis,
        "events_ts_features": q_events_ts_features,
        "events_session_stats": q_events_session_stats,
        "events_type_cooccurrence": q_events_type_cooccurrence,
        "docs_top_bigram": q_docs_top_bigram,
        "events_complexity": q_events_complexity,
        "events_location_features": q_events_location_features,
        "tpch_q12_priority_lines": q_tpch_q12_priority_lines,
        "tpch_q19_disjunctive_revenue": q_tpch_q19_disjunctive_revenue,
        "tpch_q7_nation_volume": q_tpch_q7_nation_volume,
        "transcripts_role_balance": q_transcripts_role_balance,
        "emb_centroid_similarity": q_emb_centroid_similarity,
        "transcripts_turn_dedup": q_transcripts_turn_dedup,
        "transcripts_len_quantiles_by_role": q_transcripts_len_quantiles_by_role,
        "transcripts_hourly_activity": q_transcripts_hourly_activity,
        "docs_lexical_diversity": q_docs_lexical_diversity,
        "events_interarrival": q_events_interarrival,
        "events_type_transitions": q_events_type_transitions,
        "transcripts_final_role": q_transcripts_final_role,
        "events_benford": q_events_benford,
        "transcripts_tool_transitions": q_transcripts_tool_transitions,
        "transcripts_tool_latency": q_transcripts_tool_latency,
        "events_key_skew": q_events_key_skew,
        "events_energy_chunks": q_events_energy_chunks,
        # -- rows-only (pytest-covered; minhash/ivf/ewma/dup_words sit past
        # the 50-row cap so every oracle-paired query above gets a driver
        # row — ewma and dup_words DO have DuckDB oracles, but they live
        # in pytest (test_ewma.py / test_text.py) rather than oracle_sql()
        # to avoid registering an oracle the driver would never check) ----
        "transcripts_codec_roundtrip": q_transcripts_codec_roundtrip,
        "docs_heavy_hitters": q_docs_heavy_hitters,
        "events_value_quantiles_approx": q_events_value_quantiles_approx,
        "events_holt_forecast": q_events_holt_forecast,
        "events_debounce_1m": q_events_debounce_1m,
        "events_health_report": q_events_health_report,
        "emb_pca_top2": q_emb_pca_top2,
        "emb_kmeans": q_emb_kmeans,
        "events_distinct_users_approx": q_events_distinct_users_approx,
        "docs_minhash_dedup": q_docs_minhash_dedup,
        "emb_knn_ivf": q_emb_knn_ivf,
        "events_ewma": q_events_ewma,
        "docs_dup_words": q_docs_dup_words,
        "docs_mixture_sample": q_docs_mixture_sample,
        "emb_neardup_lsh": q_emb_neardup_lsh,
        "docs_simhash_pairs": q_docs_simhash_pairs,
        "docs_simhash": q_docs_simhash,
        "docs_rolling_fingerprint": q_docs_rolling_fingerprint,
        "events_lttb_20": q_events_lttb_20,
        "docs_pack_512": q_docs_pack_512,
        "media_decode_demo": q_media_decode_demo,
        "media_audio_demo": q_media_audio_demo,
        "media_frames_demo": q_media_frames_demo,
        # round-4d wave (all oracle-paired)
        "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
        "tpch_q8_market_share": q_tpch_q8_market_share,
        "tpch_q13_order_counts": q_tpch_q13_order_counts,
        "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
        "tpch_q17_small_qty": q_tpch_q17_small_qty,
        "tpch_q22_dormant_customers": q_tpch_q22_dormant_customers,
        "docs_contamination": q_docs_contamination,
        "events_perm_entropy": q_events_perm_entropy,
        "events_ar2": q_events_ar2,
        "transcripts_context_budget": q_transcripts_context_budget,
        "transcripts_watermark_rollup": q_transcripts_watermark_rollup,
        "events_spectral_power": q_events_spectral_power,
        "events_column_profile": q_events_column_profile,
        "events_peak_rate_1h": q_events_peak_rate_1h,
        "events_decayed_type_counts": q_events_decayed_type_counts,
        "emb_dedup_cluster_sizes": q_emb_dedup_cluster_sizes,
        "events_quantile_tiers_1h": q_events_quantile_tiers_1h,
        "docs_source_lang_chi2": q_docs_source_lang_chi2,
        "events_rollup_1h_delta": q_events_rollup_1h_delta,
        "events_new_returning": q_events_new_returning,
        "events_anova_f": q_events_anova_f,
        "transcripts_prompt_ols": q_transcripts_prompt_ols,
        "events_wau_hll": q_events_wau_hll,
        "tpch_integrity_audit": q_tpch_integrity_audit,
        "events_type_cond_entropy": q_events_type_cond_entropy,
        "orders_lineitem_join_salted": q_orders_lineitem_join_salted,
        "transcripts_latency_by_hour": q_transcripts_latency_by_hour,
        "emb_norm_stats": q_emb_norm_stats,
        "emb_kmeans_silhouette": q_emb_kmeans_silhouette,
        "events_session_conversion": q_events_session_conversion,
        "parquet_layout_audit": q_parquet_layout_audit,
        "emb_pq_distortion": q_emb_pq_distortion,
        "docs_source_ks": q_docs_source_ks,
        "events_weekly_profile": q_events_weekly_profile,
        "events_mase": q_events_mase,
        "events_priority_sample": q_events_priority_sample,
        "events_cms_user_counts": q_events_cms_user_counts,
        "parquet_zonemap_audit": q_parquet_zonemap_audit,
        "parquet_compaction_plan": q_parquet_compaction_plan,
        "events_k_anonymity": q_events_k_anonymity,
        "events_auc_by_user": q_events_auc_by_user,
        "events_poincare": q_events_poincare,
        "events_hrv": q_events_hrv,
        "transcripts_duration_stats": q_transcripts_duration_stats,
        "orders_lineitem_join_size": q_orders_lineitem_join_size,
        "docs_curation_job": q_docs_curation_job,
        "docs_compressibility": q_docs_compressibility,
        "events_holt_winters": q_events_holt_winters,
        "transcripts_position_profile": q_transcripts_position_profile,
        "emb_dim_variance": q_emb_dim_variance,
        "events_gini_users": q_events_gini_users,
        "events_record_highs": q_events_record_highs,
        "events_stl_strength": q_events_stl_strength,
        "docs_dup_rate_by_source": q_docs_dup_rate_by_source,
        "emb_label_separability": q_emb_label_separability,
        "events_ljung_box": q_events_ljung_box,
        "lineitem_part_pairs": q_lineitem_part_pairs,
        "transcripts_escalation": q_transcripts_escalation,
        "events_runs_test": q_events_runs_test,
        "events_hour_entropy": q_events_hour_entropy,
        "docs_charlm_logloss": q_docs_charlm_logloss,
        "events_psi_daily": q_events_psi_daily,
        "events_out_of_order": q_events_out_of_order,
        "events_trimmed_mean": q_events_trimmed_mean,
        "lineitem_qty_price_ols": q_lineitem_qty_price_ols,
        "events_value_ecdf": q_events_value_ecdf,
        "events_tail_value_share": q_events_tail_value_share,
        "events_granger": q_events_granger,
        "events_hurst": q_events_hurst,
        "events_hill_tail": q_events_hill_tail,
        "events_ab_ztest": q_events_ab_ztest,
        "events_cum_hazard": q_events_cum_hazard,
        "events_type_value_mi": q_events_type_value_mi,
        "lineitem_brand_revenue": q_lineitem_brand_revenue,
        "transcripts_tool_km": q_transcripts_tool_km,
        "docs_split_leakage": q_docs_split_leakage,
        "emb_ivf_recall": q_emb_ivf_recall,
        "events_recs_by_lift": q_events_recs_by_lift,
        "events_ece": q_events_ece,
        "events_brier": q_events_brier,
        "events_gains": q_events_gains,
        "docs_lang_confusion": q_docs_lang_confusion,
        "transcripts_token_gini": q_transcripts_token_gini,
        "events_rolling_p90": q_events_rolling_p90,
        "revenue_share_hierarchy": q_revenue_share_hierarchy,
        "events_session_type_pairs": q_events_session_type_pairs,
        "emb_centroid_drift": q_emb_centroid_drift,
        "transcripts_turn_neardup": q_transcripts_turn_neardup,
        "emb_index_job": q_emb_index_job,
        "customer_rfm": q_customer_rfm,
        "events_user_lifetime": q_events_user_lifetime,
        "orders_fulfillment_latency": q_orders_fulfillment_latency,
        "transcripts_tool_cooccurrence": q_transcripts_tool_cooccurrence,
        "events_bursts": q_events_bursts,
        "events_peak_detect": q_events_peak_detect,
        "events_rr_intervals": q_events_rr_intervals,
        "transcripts_tool_effect": q_transcripts_tool_effect,
        "events_seasonal_outliers": q_events_seasonal_outliers,
        "transcripts_conv_features": q_transcripts_conv_features,
        "events_daily_type_entropy": q_events_daily_type_entropy,
        "events_arch_effect": q_events_arch_effect,
        "events_avg_precision": q_events_avg_precision,
        "events_expectations": q_events_expectations,
        "events_dtw_shape": q_events_dtw_shape,
        "emb_knn_ivf_pq": q_emb_knn_ivf_pq,
        "lineitem_part_pagerank": q_lineitem_part_pagerank,
        "events_markov_stationary": q_events_markov_stationary,
        "docs_word_vectors": q_docs_word_vectors,
        "events_als_factors": q_events_als_factors,
        "events_isotonic": q_events_isotonic,
        "tpch_q11_important_parts": q_tpch_q11_important_parts,
        "tpch_q16_supplier_part_counts": q_tpch_q16_supplier_part_counts,
        "tpch_q20_window_demand": q_tpch_q20_window_demand,
        "events_wilson_ci": q_events_wilson_ci,
        "events_lead_lag": q_events_lead_lag,
        "events_target_encoding": q_events_target_encoding,
        "transcripts_template_prefix": q_transcripts_template_prefix,
        "events_pareto": q_events_pareto,
        "transcripts_concurrency_1h": q_transcripts_concurrency_1h,
        "docs_containment": q_docs_containment,
        "transcripts_cache_savings": q_transcripts_cache_savings,
        "events_rate_limit": q_events_rate_limit,
        "docs_minhash_recall": q_docs_minhash_recall,
        "events_top_paths": q_events_top_paths,
        "events_return_level": q_events_return_level,
        "docs_mixture_weights": q_docs_mixture_weights,
        "parts_family_clusters": q_parts_family_clusters,
        "transcripts_tool_latency_quantiles":
            q_transcripts_tool_latency_quantiles,
        "events_page_hinkley": q_events_page_hinkley,
        "events_adf": q_events_adf,
        "events_welch_ttest": q_events_welch_ttest,
        "events_tukey_hsd": q_events_tukey_hsd,
        "events_ndcg": q_events_ndcg,
        "transcripts_verbosity_trend": q_transcripts_verbosity_trend,
        "docs_boilerplate": q_docs_boilerplate,
        "events_cointegration": q_events_cointegration,
        "transcripts_self_repetition": q_transcripts_self_repetition,
        "events_croston": q_events_croston,
        "events_grubbs": q_events_grubbs,
        "orders_priority_drift": q_orders_priority_drift,
        "docs_readability": q_docs_readability,
        "transcripts_abandonment": q_transcripts_abandonment,
        "docs_distinctive_tokens": q_docs_distinctive_tokens,
        "events_availability": q_events_availability,
        "transcripts_tool_adoption": q_transcripts_tool_adoption,
        "lineitem_returnflag_drift": q_lineitem_returnflag_drift,
        "events_rolling_corr": q_events_rolling_corr,
        "events_cohort_ltv": q_events_cohort_ltv,
        "docs_style_cosine": q_docs_style_cosine,
        "events_theta": q_events_theta,
        "docs_length_ks": q_docs_length_ks,
        "events_lorenz": q_events_lorenz,
        "emb_dim_participation": q_emb_dim_participation,
        "events_weekend_effect": q_events_weekend_effect,
        "customers_rfm_segments": q_customers_rfm_segments,
        "docs_quality_pass_rate": q_docs_quality_pass_rate,
        "events_two_step_transitions": q_events_two_step_transitions,
        "events_interarrival_quantiles": q_events_interarrival_quantiles,
        "supplier_revenue_hhi": q_supplier_revenue_hhi,
        "docs_heaps_law": q_docs_heaps_law,
        "transcripts_readability_by_role": q_transcripts_readability_by_role,
        "events_linear_attribution": q_events_linear_attribution,
        "orders_size_dispersion": q_orders_size_dispersion,
        "events_weekly_acf": q_events_weekly_acf,
        "transcripts_echo_rate": q_transcripts_echo_rate,
        "customers_order_cadence": q_customers_order_cadence,
        "events_activity_streaks": q_events_activity_streaks,
        "transcripts_prompt_curve": q_transcripts_prompt_curve,
        "events_value_deciles": q_events_value_deciles,
        "orders_monthly_yoy": q_orders_monthly_yoy,
        "events_daily_health": q_events_daily_health,
        "events_trend_census": q_events_trend_census,
        "docs_lang_mix": q_docs_lang_mix,
        "events_forecast_backtest": q_events_forecast_backtest,
        "events_type_persistence": q_events_type_persistence,
        "lineitem_qty_disc_chi2": q_lineitem_qty_disc_chi2,
        "transcripts_depth_curve": q_transcripts_depth_curve,
        "orders_status_age": q_orders_status_age,
        "events_type_mix_drift": q_events_type_mix_drift,
        "events_type_weekday_assoc": q_events_type_weekday_assoc,
        "customer_balance_by_segment": q_customer_balance_by_segment,
        "orders_priority_kruskal": q_orders_priority_kruskal,
        "nation_balance_gap": q_nation_balance_gap,
        "docs_novelty_rate": q_docs_novelty_rate,
        "part_brand_price_profile": q_part_brand_price_profile,
        "docs_editdist_pairs": q_docs_editdist_pairs,
        "supplier_catalog_breadth": q_supplier_catalog_breadth,
        "orders_priority_status_chi2": q_orders_priority_status_chi2,
        "lineitem_qty_disc_gamma": q_lineitem_qty_disc_gamma,
        "events_friedman_types": q_events_friedman_types,
        "events_durbin_watson": q_events_durbin_watson,
        "docs_editdist_clusters": q_docs_editdist_clusters,
        "docs_block_selectivity": q_docs_block_selectivity,
        "transcripts_len_cliffs": q_transcripts_len_cliffs,
        "events_seasonal_mk": q_events_seasonal_mk,
        "transcripts_alternation_runs": q_transcripts_alternation_runs,
        "nation_part_coverage": q_nation_part_coverage,
        "lineitem_qty_slope_by_decile": q_lineitem_qty_slope_by_decile,
        "docs_lang_length_kw": q_docs_lang_length_kw,
        "customer_segment_yuen": q_customer_segment_yuen,
        "events_weekend_cliffs": q_events_weekend_cliffs,
        "lineitem_tax_disc_gamma": q_lineitem_tax_disc_gamma,
        "events_median_test": q_events_median_test,
        "orders_monthly_mk": q_orders_monthly_mk,
        "events_type_cliffs_matrix": q_events_type_cliffs_matrix,
        "part_size_price_gamma": q_part_size_price_gamma,
        "lineitem_returnflag_median": q_lineitem_returnflag_median,
        "market_balance_cliffs": q_market_balance_cliffs,
        "orders_status_yuen": q_orders_status_yuen,
        # rows-only (no DEFLATE in DuckDB)
        "transcripts_compressibility": q_transcripts_compressibility,
    }


def oracle_sql() -> dict[str, str]:
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

    return {
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
        # merged history+delta partials must equal the direct rollup —
        # the oracle is the SAME SQL as events_rollup_1h on purpose
        "events_incremental_1h": rollup("hour"),
        "events_distinct_users_1h": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "customers_no_orders": """
            SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
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
        # boundary tie groups contribute pro-rata (p·take/c) so the
        # table is deterministic from the distinct-score histogram; the
        # clip expressions mirror the engine's min/max tree
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
        # every Murphy term mirrors the engine formula (pow == **);
        # exact bin weights, float bin means at the usual tolerance
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
        # weights are exact bin counts; bin means agree at the usual
        # float-partial tolerance, orders below the 6-decimal grain
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
        "docs_bpe_token_count": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                     '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'
                   ))::BIGINT AS n_tokens_bpe
            FROM documents
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
        # pure order-statistic selection (no arithmetic) — values equal
        # bit-exactly before rounding; partial head windows included
        "events_rolling_p90": """
            SELECT event_id, user_id, ts, round(value, 6) AS value,
                   round(quantile_disc(value, 0.9) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6)
                     AS value_p90
            FROM events
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
        "emb_neardup_04": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        # connected components as recursive reachability: component(v) =
        # min over everything reachable from v (tiny at sf0.01; the Ray
        # side's label propagation computes the same fixpoint partitioned)
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
        # ---- round-4 wave -------------------------------------------------
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
        # exact µs delta (date_diff), NOT epoch(b)-epoch(a) whose float
        # cancellation costs ~2.4e-7 s; x/0 → NULL drops same-ts pairs
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
        # value ranks average over ties (AVG of row_numbers per tie group)
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
        # explicit NULL for sd NULL/0 (a bare CASE would fall through NULL
        # comparisons to the last bucket); breakpoints = norm.ppf(1/4, 2/4,
        # 3/4) literals shared with stages/symbolic.BREAKPOINTS_4
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
        # struct_pack argmin: min over (-n, type) = highest count then
        # lexicographically smallest type (round-3 recipe)
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
        # exact money: int64 cents × (100 − int discount) at scale 1e4 —
        # both sides sum exact integers (same base as orders_lineitem_join)
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
        # adjacency on raw split positions (runs of spaces break pairs,
        # never bridge them)
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
        # lag over OBSERVED windows (corr ignores the NULL first lag)
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
        # exact scaled-int prefix sums both sides → bit-identical scores,
        # argmax cannot flip on association noise; ties → smallest k
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
        # every key emits a row per lag (n_pairs = 0, NULL corr when the
        # series is shorter than the lag)
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
        # exact half-integer rank sums both sides → u_stat bit-identical;
        # rank_biserial NULL when either group is empty (x/0)
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
        # RANGE-frame cumulative counts include ties, so every peer row
        # carries the full step — the max is tie-robust on both sides
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
        # union-of-grid-and-events + IGNORE NULLS carry: a grid instant
        # equal to an event ts takes that event (events sort before the
        # grid row at equal ts)
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
        # each event replicated to its 4 containing 1h-windows on the
        # 15-min hop grid (same explode the engine applies to PANES)
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
        # variable-lag pairs via a row_number self-join (SQL lag() needs a
        # constant offset); argmax via struct_pack min on (-ac, lag)
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
        # ---- round-4b wave: TPC-H-shaped joins (exact int64 money:
        # round(price*100) * (100 - round(disc*100)), scale 1e4 — float
        # partial sums differ from sequential decimal sums in the 6th
        # decimal at ~5e8 magnitudes) ------------------------------------
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
        # two-pass centered moments (NOT raw power sums — cancellation
        # there flips the 6th decimal); x/0 → NULL covers m2 == 0
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
        # x strictly ordered by (ts, event_id) → tau-b denominator is
        # sqrt(n0 · (C + D)); every factor exact in double at these sizes
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
        # duration in exact µs (date_diff), /1e6 — bit-identical to the
        # pandas total_seconds() path (same rational, same RN)
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
        # same lift computation as the co-occurrence twin, unrounded for
        # the ranking (identical doubles both sides), ties by rec name
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
        # argmax via struct_pack min (negated count) — the documented
        # lexicographic-argmin recipe; single-space split == the Ray side
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
        # cubic stats on exact scaled ints (values are exact cents →
        # round(v*100) is the same integer under banker's and half-away);
        # HUGEINT sums ::DOUBLE then /cnt/1e6 — the identical single
        # rounding the longdouble path performs.  Bin index uses the
        # SAME float expression ((v-mn)/(mx-mn)*10) both sides.
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
        # every boundary comparison on exact scaled ints: mass-quantile
        # condition 2·prefix ≥ total; the 2σ test is the cross-multiplied
        # rational (c·n − S)² > 4(n·SS − S²) — neither side computes a
        # float σ, so no ulp can flip a count
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
        # digit from the exact scaled int via ::VARCHAR (never float
        # log10 — libm boundaries at powers of ten could flip a digit)
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
        # mean = exact µs int sum ::DOUBLE /n/1e6 (bit-identical);
        # variance keeps the engine's raw-moment shape (Σd²/n − mean²)
        # with d = µs/1e6 per element — same float expression both sides
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
        # ---- round-4d wave: TPC-H completion (same exact int64 money
        # discipline as the 4b joins) -------------------------------------
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
        # per-conversation OLS slope over exact integer sums (HUGEINT on
        # the SQL side, int64 on the Ray side -> identical doubles)
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
        # one UNION ALL row per contract rule; regexp_full_match is the
        # RE2 twin of pyarrow's anchored match_substring_regex
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
        # step AP over distinct-score thresholds (sklearn formula):
        # AP = sum_s (np_s/pos) * (tp_s/(tp_s+fp_s)), score descending
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
        # lag-1 pairwise corr over the |delta| series (acf NULL rules:
        # <2 pairs or a constant side -> NULL); users with < 2 events
        # have an empty |delta| series and drop out on both sides
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
        # dominant type via the struct_pack argmin recipe (negated count,
        # then type ascending as the tie-break)
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
        # composition oracle: the seasonal_adjust phase-mean window
        # feeding the mad_per_user battery, both already-proven idioms
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
        # arg_min/arg_max on unique turn_idx = deterministic open/close
        # roles; duration via the exact date_diff microsecond recipe
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
        # two-pass centered variance (same recipe as events_skew_kurtosis:
        # raw power sums cancel catastrophically; dims via
        # generate_subscripts, 1-based like the Ray side)
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
        # rank-sum Gini: ties need no tie-break (equal values commute in
        # the rank sum); the expression mirrors the Ray float ops exactly
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
        # STL-lite: dense hour grid per key, centered 25h MA (full
        # windows only, exact int window sums), phase means of the
        # detrended series, two-pass population variances.  greatest()
        # ignores NULLs in DuckDB -> explicit CASE for the clamp.
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
        # standard time-series acf estimator (full-series mean/variance),
        # NOT pairwise Pearson: d = x - mu joined in, lagged products.
        # NULL propagation makes q_stat NULL whenever any rk is NULL.
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
        # runs test: quantile_disc(0.5) == exact lower median (the
        # documented discrete-quantile recipe); ties with the median drop
        # out on both sides; n1/n2/R ride as exact ints
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
        # char-bigram LM: substr is codepoint-based == the Ray side's
        # utf-32 codepoints; add-one smoothing over a fixed 256 denom;
        # docs with < 2 chars have no bigram and emit nothing (both sides)
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
        # session labels == the sessionize CTE (ts, event_id order);
        # then the standard distinct-pair / lift / jaccard shape over
        # (user:session) groups
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
        # candidates = strict interior local maxima above quantile_disc
        # p90; refractory period = the debounce recursive-CTE keep-chain
        # run over the candidate set
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
        # the peak_detect CTE chain + lagged gaps; gaps ride as exact
        # int microseconds; squared diffs go through DOUBLE on BOTH
        # sides (int64 d_us*d_us overflows at multi-day gaps)
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
        # two-state recursive CTE: the b_new step repeats the l_new
        # expression verbatim (same float ops -> identical doubles);
        # alpha=0.4, beta=0.2 so 1-a=0.6 and 1-b=0.8 are exact
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
        # greedy keep-chain as a row-stepped recursive CTE: kept iff
        # ts - last_kept >= gap (date_diff microseconds, the exact
        # time-delta recipe); first row of each user always survives
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
        # single-space split == the Ray tokenizer on this corpus;
        # promoted from the pytest-only twin (tests/test_text.py)
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
        # md5 hex-threshold sampling == hashlib md5 (the documented
        # deterministic-sampling twin); promoted from the pytest-only
        # twin (tests/test_text.py) to an external oracle
        "docs_mixture_sample": """
            SELECT doc_id, source FROM documents
            WHERE substring(md5(source || '|' || doc_id::VARCHAR), 1, 4)
                  < CASE source WHEN 'src0' THEN '4000'
                                WHEN 'src1' THEN 'c000'
                                ELSE '8000' END
        """,
        # the affine recurrence is bitwise-identical in float64 on both
        # sides (1-0.3 == 0.7 exactly in IEEE754); promoted from the
        # pytest-only twin (tests/test_ewma.py) to an external oracle
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
        # floor(0.1*n) is the same float64 product on both sides, so the
        # trim cut is bit-identical; (value, event_id) rank = the lexsort
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
        # PSI: equal-width bins over the exact global [min,max]; Laplace
        # smoothing (c+0.5)/(n+5); constant corpus degenerates to bin 0
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
        "docs_dup_rate_by_source": """
            WITH c AS (SELECT text, count(*) AS n FROM documents GROUP BY 1)
            SELECT source, count(*)::BIGINT AS n_docs,
                   (count(*) FILTER (WHERE c.n > 1))::BIGINT AS n_dup_docs,
                   round((count(*) FILTER (WHERE c.n > 1))::DOUBLE
                         / count(*), 6) AS dup_ratio
            FROM documents d JOIN c USING (text)
            GROUP BY 1 ORDER BY 1
        """,
        # pairwise intra-label cosine via the combiner identity
        # sum_{i!=j} vi.vj = |S|^2 - T on unit vectors; zero vectors
        # normalize to 0 on the Ray side -> explicit CASE here
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
        # ---- round-4e wave ----------------------------------------------
        # trigram positions via generate_subscripts; zero-overlap pairs
        # are omitted on BOTH sides (inner join on shared grams)
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
        # ordinal pattern code: (b>=a)*4 + (c>=a)*2 + (c>=b); later
        # element wins float ties, so the coding is total on both sides
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
        # Yule-Walker ratios are normalizer-free: raw centered lag sums
        # s0/s1/s2 compared directly; NULL for n<3 or zero denominator
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
        # per-key watermark = running max event time over ARRIVAL order
        # (turn_idx); strict µs comparison; all-late windows → NULL sum
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
        # per-key epoch keeps trig arguments small; identical float op
        # order both sides: 2*pi() * (t / P)
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
        # RANGE frame: peers (equal ts) all count; argmax ties → earliest
        # ts, via the struct_pack argmin recipe
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
        # identical float op shape both sides: pow(2, -(dt_us / hl_us))
        "events_decayed_type_counts": """
            WITH h AS (SELECT max(ts) AS t FROM events)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round(sum(pow(2.0,
                       -(date_diff('microsecond', e.ts, h.t)::DOUBLE
                         / 43200000000.0))), 6) AS decayed_count
            FROM events e, h GROUP BY 1
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
        # expected counts over ALL cells incl. unobserved zeros; identical
        # float op shape both sides: e = rs*cs/n, then (o-e)²/e
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
        # identical float op shape both sides; DuckDB round() is
        # half-away-from-zero == np.floor(v+0.5) on the nonneg scale
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
        # stickiness: BIGINT::DOUBLE / BIGINT == the engine's int64/int64
        # numpy division; WAU join window is (d-6 .. d] inclusive of d
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
        # avg(BIGINT) is an exact hugeint sum then ONE double division ==
        # the engine's float(int_sum)/n; quantile_disc == element at
        # sorted index ceil(n*q)-1 (stages/quantile.py parity);
        # date_diff('microsecond', ...) avoids epoch() float cancellation
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
        # identical sufficient-statistics algebra both sides:
        # SSB = Σ S_g²/n_g − S²/N, SSW = ΣΣx² − Σ S_g²/n_g
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
        # x/y are int64 token counts -> the moment sums are EXACT on
        # both sides; the fit expressions below mirror the engine's
        # (stages/dialog.prompt_response_ols) term for term
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
        "tpch_integrity_audit": INTEGRITY_SQL,
        # p(j|i) from exact integer transition counts; log2 both sides
        "orders_lineitem_join_salted": """
            SELECT o.o_orderstatus,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE, 6) AS revenue_sum,
                   round(sum(l.l_extendedprice::DECIMAL(18,2) * (1 - l.l_discount::DECIMAL(18,2)))::DOUBLE / count(*), 6) AS revenue_mean
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
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
        # same suffix-min pair derivation as transcripts_reply_latency;
        # avg(BIGINT µs) is exact, quantile_disc == ceil(n·q)-1 parity,
        # date_diff avoids epoch() float cancellation
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
        # per-vector norm = sqrt of the in-order 64-dim square sum ==
        # the engine's numpy sequential axis-1 sum (< pairwise block)
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
        # gaps-and-islands twin of the engine's break-scan; a session
        # converts if ANY of its events is a purchase
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
        # duckdb's parquet_metadata == the engine's pyarrow footer read;
        # paths pinned to the correctness scale (see the query docstring)
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
        "events_weekly_profile": """
            SELECT isodow(ts)::BIGINT AS dow,
                   extract(hour FROM ts)::BIGINT AS hour,
                   count(*)::BIGINT AS n_events,
                   round(sum(value) / count(*), 6) AS value_mean
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # NULL when the key is shorter than the seasonal lag (numerator
        # avg over zero rows) or the persistence error is exactly 0
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
        # md5 of the decimal id string is identical in hashlib and DuckDB
        # (the hash_split determinism contract)
        "events_priority_sample": """
            SELECT event_id, value,
                   md5(CAST(event_id AS VARCHAR)) AS priority
            FROM events
            ORDER BY priority LIMIT 100
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
        # the global events_auc mid-rank recipe, PARTITIONed per user;
        # all rank terms are integers/halves -> exact doubles both sides
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
        # identical moment algebra both sides; date_diff µs / 1e6 avoids
        # epoch() float cancellation; single-event users emit no row
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
        # pNN count compares EXACT integer µs against the integer
        # threshold; rmssd mirrors the engine's (µs/1e6)² moment sum
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
        # regr_*/corr vs raw-moment merge: same closed form over sums that
        # agree to ~1e-13 relative (conditioned x), identical at round 6
        "lineitem_qty_price_ols": """
            SELECT l_returnflag, count(*)::BIGINT AS n_rows,
                   round(regr_slope(l_extendedprice, l_quantity), 6)
                     AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                     AS intercept,
                   round(corr(l_extendedprice, l_quantity), 6) AS corr_xy
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        # exact int counts both sides; (value <= t) is NULL-false under
        # FILTER, matching the NaN-excluded numpy counts
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
        # int-cent revenue partials; parent totals via window sums over
        # identical integers, so the share divisions are bit-identical
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
        # same rank-formula twin as events_gini_users, with per-conv token
        # SUMS (exact ints) as the sorted weights
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
        # distinct-value histogram == the engine's partials, so the window
        # cumsum has no tie peers; the top-k multiset splits the boundary
        # tie group by multiplicity identically (least(c, k - before));
        # keys with < k+1 positive rows go NULL via the empty FILTER
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
        # md5 twins on both the content fingerprint and the split hash;
        # exact counts; "leaked" = fingerprint present on both sides
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
        # the KM twin on the transcript corpus: minute buckets, censored
        # at the conversation's last turn when no tool call happens
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
        # int-cent revenue (the revenue_by_nation discipline) through the
        # shuffle-free broadcast dimension join
        "lineitem_brand_revenue": """
            SELECT p_brand, count(*)::BIGINT AS n_items,
                   round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100)
                                           AS BIGINT)))::DOUBLE
                         / 10000.0, 6) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1 ORDER BY 1
        """,
        # midpoint from exact int µs; per-unit (x, y) conditional counts
        # are exact ints; pooled-theta / diff / variance-reduction trees
        # mirrored; constant covariate -> NULL via 0-division
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
        # exact contingency counts; per-cell MI terms and marginal
        # entropies mirror the engine's expression tree (unobserved
        # cells contribute nothing on either side)
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
        # same base as the KM twin; the ascending hazard-increment sum
        # (d=0 buckets add an exact 0) mirrors the window sum
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
        # at-risk suffix sums per group over exact ints; E1/V per event
        # day mirror the engine's expression tree; n=1 days pin V to an
        # exact 0 (CASE vs NaN-guard); zero total variance -> NULL z
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
        # the hash_split hex-threshold idiom (string compare == numeric
        # for fixed-width lowercase hex); exact counts, z formula tree
        # mirrored; degenerate arms go NULL via 0-division
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
        # duration arithmetic is exact int µs (first activity → first
        # purchase, censored at last activity); at-risk is a suffix sum
        # of exact ints; the product-limit factor sequence (incl. the
        # exact ×1.0 of d=0 buckets) multiplies ascending on both sides
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
        # confusion counts are exact ints; the metric divisions mirror the
        # engine's expression tree; zero denominators -> NULL both sides;
        # "precision" quoted (DuckDB type keyword)
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
        # int-cent prefix/moment sums are exact; the per-chunk finalize is
        # the same expression tree as the numpy fold; zero-variance chunks
        # filtered by sd > 0 on both sides; avg over ≤~hundreds of O(1)
        # chunk ratios is orders below the 6-decimal rounding grain
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
        # every sum is an exact integer cast to DOUBLE once; the finalize
        # arithmetic is the SAME expression tree as the numpy fold, so all
        # doubles are bit-identical; degenerate cases (constant lag,
        # collinear, perfect fit) go NULL via 0-division on both sides
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
        # quantile_disc == element at sorted index ceil(n*q)-1 (house
        # recipe); int-cent sums (round = half-away both sides) make the
        # share division see identical integers
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
        # Q2 skeleton: both engines minimize over the IDENTICAL set of
        # IEEE doubles (price/qty), so the equality cut at the per-part
        # min is exact; the ORDER BY is a total order so the LIMIT cut
        # is deterministic under any partitioning
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
        # Q11 skeleton: per-part value folds as int64 cents*qty; the
        # global total (HUGEINT in DuckDB, Python int on the Ray side,
        # both < 2^53 exact) times 0.001 is the same IEEE double, and
        # the int-vs-double comparison promotes identically
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
        # Q16 skeleton: negative acctbal stands in for the complaint
        # filter; distinct pairs then distinct suppliers per attribute
        # group — pure integer/string, no float anywhere
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
        # Q20 skeleton: all-integer predicate 2*qty_win > qty_all —
        # quantities are integral by construction, folds are int64
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
        # Wilson 95% interval: exact int counts, then the closed form as
        # a fixed float64 expression tree — same z literal, same
        # parenthesization as the engine finalize, so identical doubles
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
        # dense zero-filled hour grid (generate_series), per-lag Pearson
        # from six exact integer sums cast to DOUBLE at the same points
        # as the engine's numpy finalize; empty-overlap lags vanish on
        # both sides, zero variance goes NULL via 0-division
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
        # LOO target encoding: int-cent category sums (round-half-away
        # both sides), exact integer subtraction, two divisions in the
        # same order; n−1 = 0 and all-NULL categories go NULL identically
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
        # template detection: md5(string_agg ORDER BY) == the engine's
        # per-conversation ordered prefix fingerprint (house md5 recipe)
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
        # Pareto k: exact int-cent cumulative sums in (value desc, key)
        # order; k by COUNTING prefixes below the float target (engine
        # mirrors count+1, capped at n) — agrees even when negative
        # values make the running sum non-monotone
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
        # open-interval concurrency: per-conv hour span expanded on the
        # dense grid — pure integer window floors and counts
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
        # containment = inter / least(sz_a, sz_b): same gram pipeline as
        # docs_ngram_jaccard, asymmetric finalize — identical float64
        # division both sides
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
        # prefix-cache economics: exact int64 window cumsums; the single
        # ratio division is the same float64 op both sides; all-empty
        # conversations (cost 0) go NULL via 0-division
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
        # fixed-window rate limiter: pure integer counts and subtraction
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
        # session entry paths: gap-cumsum sessionization (house recipe),
        # ordered string_agg of the first 5 steps, count per path; the
        # (count desc, path asc) ORDER is total so the LIMIT cut is
        # deterministic
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
        # Gumbel MoM over daily block maxima: int-cent maxima (combiner
        # max is order-free), (n, Σ, Σ²) exact integer sums, fixed float
        # tree with √6 / γ / π / ln(−ln(0.99)) as shared literals; n=1
        # goes NULL via 0-division, float-cancellation-negative variance
        # via the CASE guard (numpy sqrt(neg)=NaN mirrors it)
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
        # mixing weights: exact counts; share and rel_weight are a single
        # division (+ one correctly-rounded sqrt) each — no float sum
        "docs_mixture_weights": """
            WITH s AS (SELECT source, count(source)::BIGINT AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS tot, max(n) AS mx FROM s)
            SELECT source, n AS n_docs,
                   round(n::DOUBLE / tot::DOUBLE, 6) AS share,
                   round(sqrt(n::DOUBLE / mx::DOUBLE), 6) AS rel_weight
            FROM s, t ORDER BY source
        """,
        # product families: same hash-to-min component labeling as the
        # dedup clusters, over the support>=3 co-purchase edge set
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
        # per-tool round trip: IGNORE-NULLS forward window finds the next
        # assistant turn; exact integer µs; quantile_disc == the engine's
        # sorted-index recipe
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
        # running mean + deviation walk: every step an ordered sequential
        # fold DuckDB computes left-to-right (cusum precedent)
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
        # exact int-cent moments; gamma and the DF t-stat are
        # scale-invariant, fixed expression tree mirrored in the engine
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
        # within-SS folded in group-name order (ordered window) == the
        # engine's left-to-right fold over sorted names
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
        # graded relevance = exact int counts; dcg/idcg are <=5-term sums
        # whose reassociation noise is ~1e-15 relative, far below round-6
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
        # document frequency of exact non-overlapping 8-word segments
        # (string_split keeps empties == the engine's polars split)
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
        # step-1 moments are exact int64 → the α/β doubles and the
        # per-row residual tree (y − α − β·x) are bit-identical; the
        # step-2 residual sums carry ~1e-16 reassociation noise reported
        # only through the ρ / df_t ratios, far below 6-decimal rounding.
        # Degenerate inputs (n<3, constant x, zero residual variance)
        # go NULL via 0-division / CASE on both sides.
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
        # trigram occurrences exactly like docs_contamination (single-
        # space positions, all three tokens non-empty, never crossing a
        # turn); "repeated" = turn_idx strictly greater than the
        # conversation's first turn containing that gram — exact int64
        # counts, one finite share division
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
        # both SES chains are the pandas ewm(adjust=False) C kernel ==
        # DuckDB list_reduce with the IDENTICAL per-step float tree
        # ((1−α)·acc + α·x) / ((1−α)+α), equal-skip included — verified
        # bit-exact; q_1 = 1 by Croston convention
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
        # int-cent moments exact; studentized deviation is maximized at
        # an extreme, so G needs only (n, Σ, Σ², min, max); the high/low
        # branch compares identical float trees on both sides; n<2 and
        # zero-variance degenerate to NULL via CASE / 0-division
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
        # observed/row/column totals exact int64; e = rt*ct/N and
        # (o-e)^2/e are one fixed tree; the per-period sum runs in
        # sorted-category order SEQUENTIALLY on both sides (numpy fold
        # == list_reduce) so chi2 is bit-identical, zero cells included
        # via the full period x category grid
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
        # three exact RE2 counts (pyarrow and DuckDB both embed RE2);
        # the score is one fixed float tree; zero-word docs go NULL via
        # 0/0
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
        # last turn per conversation via the struct_pack argmax (payload
        # rides along); exact hour counts, one share division
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
        # all counts exact int64, integer subtractions BEFORE the one
        # double cast, ln via the shared libm (charlm-logloss
        # precedent); top-5 ordering breaks ties on token asc so both
        # sides select identical rows
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
        # distinct (user, hour) pairs exact; span and gaps are integer
        # window-index arithmetic; availability is one division; a
        # single-hour user has no lag row -> coalesce 0 == the engine's
        # gap-0 first row
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
        # per-(tool, conv) first use exact int64; the denominator is
        # the corpus distinct-conversation count (empty-tool turns
        # count toward it but are never scored)
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
        # same grid-fold chi-square as orders_priority_drift, on the
        # lineitem return-flag mix by ship month
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
        # dense hour grid (generate_series == the engine's np.arange
        # zero-fill); all trailing moments exact int64; zero-variance
        # windows go NULL via x/0 on both sides; only full windows emit
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
        # int-cent daily sums exact; cohort = min day per user; the
        # cumulative is an exact int64 windowed sum over observed ages;
        # two divisions at the end
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
        # exact int64 pair dots and squared norms over the shared
        # vocabulary; zero-overlap pairs emit nothing on both sides
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
        # SES chain == list_reduce (croston recipe); slope from exact
        # int64 moments over the integer period index; single-period
        # keys go NULL via 0-division
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
        # both ECDFs evaluated on the SAME pooled value grid (LEFT JOIN
        # + windowed sum == the engine's zero-filled grid cumsum); each
        # point is one exact-int division; D is a max over identical
        # float sets
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
        # row_number ranking with key-asc tiebreak; integer decile cut;
        # exact int64 decile sums + cumulative, two divisions
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
        # per-dim two-pass variances (the emb_dim_variance tree); both
        # spectrum sums fold sequentially in dim order (list_reduce ==
        # the engine's d-length loop); ~1e-16 sum noise is far below
        # 6-decimal rounding of a ratio in [1, d]
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
        # the welch tree on a derived ISO-weekday flag (isodow >= 6 ==
        # the engine's ((days+3) % 7) + 1 >= 6)
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
        # the customer_rfm base + three row_number quintile cuts
        # (integer arithmetic, key-asc tiebreaks); segment aggregates
        # are exact int64 sums divided once
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
        # the docs_quality tree unrounded feeds the >= 0.5 cut, so the
        # pass counts are exact on both sides
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
        # P1 fractions are the role_transitions tree (bit-identical);
        # the mid-state marginalization folds sequentially in sorted
        # mid order on both sides
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
        # gaps are exact integer microseconds (date_diff recipe);
        # quantile_disc == element at sorted index ceil(m*q)-1; only the
        # µs→s division is float
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
        # exact int64 scaled revenue (price_i x (100 - disc_i)); each
        # nation's share-square sum folds sequentially in suppkey order
        # (list_reduce == the engine's per-nation loop)
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
        # first-occurrence counts and cumulative sums are exact int64;
        # the ln points and all OLS moment sums fold sequentially in
        # doc-id order (list_reduce == the engine loop)
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
        # the docs_readability counting trees pooled per role — exact
        # int64 sums, one flesch tree per role
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
        # pair finding is integer-µs interval arithmetic (strictly
        # before the conversion, window-start inclusive); each credit is
        # 1.0/k from an exact int64 k; per-hour sums fold sequentially
        # in (pid, cid) order on both sides
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
        # per-order line counts exact int64; classic moment tree
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
        # dense day grid (generate_series == np.arange zero-fill); all
        # moments exact int64; NULL when fewer than 2 lag pairs or zero
        # variance on either side
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
        # distinct per-turn tokens exact; eligibility = assistant turn
        # directly preceded by a user turn; pooled counts, one division
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
        # integer day-index gaps (epoch-µs // day); exact int64 moment
        # sums; the gap multiset is tie-order invariant
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
        # distinct (user, day) exact; islands via day - row_number();
        # last streak = the island holding the max day (struct argmax)
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
        # single-space token counts (TOKLEN); adjacency via lead with
        # the idx+1 guard; deterministic rank cut on (x, conv, idx);
        # bin means are exact int sums divided once
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
        # nine quantile_disc picks per type (element at sorted index
        # ceil(n*q)-1 — the house recipe)
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
        # exact int-cent monthly sums; growth lags over the observed
        # month sequence; NULL while no base month / zero base
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
        # exact counts, exact distinct users, quantile_disc p95, WoW
        # lag-7 ratio over the observed day sequence
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
        # sign census over the 6-decimal-ROUNDED slope (the driver's own
        # rounding contract), so the classification is exact
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
        # the top_bigrams adjacency; PMI is one fixed float tree over
        # exact counts (ln via the shared libm), so the (pmi desc,
        # bigram) top-20 selects identical rows
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
        # exact counts; dominance = (count desc, lang asc) argmax via
        # the struct_pack recipe (negated count, lang payload)
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
        # dense per-type day grid; naive errors exact int64; EWMA
        # prediction per step = list_reduce over the prefix window (the
        # croston tree, equal-skip included); |error| sums fold
        # sequentially in period order on both sides
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
        # exact consecutive-pair counts per user, one division
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
        # the docs chi2 tree on integer band cuts (half-away scaled
        # ints == the engine's copysign-floor)
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
        # exact per-conversation turn counts; one division per threshold
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
        # exact integer day ages vs the max-orderdate anchor (the rfm
        # recipe); exact count/sum folds, two divisions
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
        # the category_mix_drift grid fold on the daily event-type mix
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
        # contingency fold: chi2 / Cramér's V / Theil's U both ways;
        # isodow == pandas dayofweek+1; 0·ln0 cells excluded both sides
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
        # one value-histogram pass: exact cents sums, quantile_disc
        # (element at ceil(n·q)−1) back in dollars
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
        # pooled midranks = AVG(row_number) OVER (PARTITION BY value) —
        # exact half-integers, so rank sums are bit-identical; tie term
        # and H use the engine's exact expression tree
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
        # cents-exact sums per nation from BOTH sides of the market;
        # LEFT joins keep nations with no customers/suppliers (NULL
        # means, zero counts)
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
        # first-seen = min doc_id per distinct trigram; counts are ints,
        # one division per source (same trigram builder as contamination)
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
        # grouped_value_profile reuse on the part dim (cents-exact)
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
        # prefix-blocked levenshtein pairs: DuckDB levenshtein edits
        # UTF-8 BYTES while substring slices CODEPOINTS — the engine
        # mirrors exactly that mix (byte DP, codepoint block key)
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
        # per-supplier breadth: cents-exact volume, exact distinct
        # parts (one row per (supp, part) crosses the exchange)
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
        # MK trend over exact daily cent totals: S and ties are pure int
        # comparisons; var_s = exact-int numerator / 18.0; z uses the
        # correctly-rounded sqrt — identical expression tree both sides
        # (var_s = 0 forces S = 0, so the z CASE never divides by zero)
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
            WHERE p >= 8 AND p + 4 <= n AND (p - 8) % 4 = 0
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
        # chi2_independence twin on the orders dim (full grid incl.
        # unobserved zero cells, same cell algebra as qty_disc_chi2)
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
        # gamma/tau-b from exact int cell-pair folds; n0 - tie products
        # cast to DOUBLE before multiplying (n0^2 overflows int64);
        # 0/0 and x/0.0 both yield NULL = engine NaN
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
        # Friedman via window mid-ranks (avg(row_number) over the day's
        # sv tie group) on the zero-completed day x type grid; ranks are
        # exact .5 multiples so every sum is order-free
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
        # exact cumulative pair counts over per-value cells (the window
        # twin of the engine's cumsum); empty input emits NO row
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
        # DW from exact int moments through ONE fixed float tree (the
        # engine runs the identical expressions); t re-based per key
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
        # same blocked-levenshtein pair predicate as docs_editdist_pairs
        # feeding the standard recursive reachability-min closure
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
        # count-of-counts over prefix blocks; pairs = n_blocks * C(c,2)
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
        # Yuen from per-value cells: k = n//5 (integer trim — no
        # 0.2*N float-floor ambiguity), middle sums from clipped
        # cumulative counts, winsorized tails from exact order stats;
        # one fixed float tree both sides
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
        # cliffs_delta reuse on the dialog surface: exact codepoint
        # lengths, same window-cumsum pair counts
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
        # per-season S and INTEGER variance numerators summed exactly,
        # one /18.0 at the end (summing seven x/18.0 floats would be
        # order-dependent); Σvn = 0 forces ΣS = 0 so z never divides
        # by zero; no row when no season reaches 2 days
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
        # exact run/boundary counts per conversation; degenerate keys
        # (single symbol or one turn) give 0/0 -> NULL both sides
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
        # distinct (nation, part) pairs via the supplier map; coverage
        # over the full part catalog
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
        # per-decile OLS from exact int64 moments (qty ints x cents);
        # identical float tree, /100.0 back to dollars at the end
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
        # kruskal_wallis twin at scale=1 over the docs length column
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
        # yuen_trimmed_t twin on the customer dim (BUILDING vs rest)
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
        # cliffs_delta twin over daily cent totals, weekend flag from
        # the ISO dow of the epoch day
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
        # ordinal_association twin over (tax, discount) percent levels
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
        # Brown-Mood: pooled lower median (quantile_disc), k x observed
        # above-levels grid, chi2 over the full expected grid
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
        # median_test reuse over (returnflag, extendedprice cents)
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
        # cliffs_delta twin over the UNION of both balance columns
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
        # yuen_trimmed_t twin over F-vs-O order totals
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
        # mann_kendall reuse at monthly cadence over cents-exact
        # revenue totals; 'scope' is the single global key
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
        # pairwise deltas from the tiny daily-total cell cross join
        # (exact int comparisons; one division per pair)
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
        # ordinal_association twin over (size, price-cents)
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
