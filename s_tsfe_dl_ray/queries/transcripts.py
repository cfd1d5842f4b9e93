"""Transcript-corpus (dialog) query bodies.

Mechanically split out of ``__ray_entry__.py`` (VERDICT r4 #8): every
``q_*`` callable keeps its original closure shape inside :func:`build`;
the driver's recorded-50 ordering lives in ``registry.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._common import (_LANGS, _STOP, _dd_round6, _events_gapfill,
                      _round_floats, _transcripts_for)

__all__ = ["build"]


def build() -> dict:
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

    def q_transcripts_final_role(sf):
        """Conversation outcome distribution: which role speaks last —
        latest-per-key composed with a tiny fold
        (stages/dialog.final_role_distribution)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import final_role_distribution

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role"])
        return _round_floats(final_role_distribution(turns))

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

    def q_transcripts_latency_by_hour(sf):
        """Reply-latency SLA profile by prompt hour-of-day: count, exact
        mean, exact discrete p50/p95 (stages/dialog.reply_latency_by_hour)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import reply_latency_by_hour

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts", "role"])
        return _round_floats(reply_latency_by_hour(
            turns, order_by=["ts", "turn_idx"]).sort("hour"))

    def q_transcripts_duration_stats(sf):
        """Conversation wall-duration distribution: count, exact mean,
        exact discrete p50/p95
        (stages/dialog.conversation_duration_stats)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import conversation_duration_stats

        turns = read_table(_transcripts_for(sf), columns=["conv_id", "ts"])
        return _round_floats(conversation_duration_stats(turns))

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

    def q_transcripts_verbosity_trend(sf):
        """Per-conversation OLS slope of assistant reply length vs turn
        index - does the assistant get wordier as the dialog progresses
        (stages/dialog.verbosity_trend)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import verbosity_trend

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(verbosity_trend(turns))

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

    def q_transcripts_escalation(sf):
        """Share of conversations whose user turns grow longer over the
        dialog (exact int OLS slope per conversation, one-row corpus
        fold) — stages/dialog.escalation_share."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import escalation_share

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(escalation_share(turns))

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

    def q_transcripts_tool_effect(sf):
        """Assistant turn length split by whether the previous turn was
        a tool result — the tool-augmentation length probe
        (stages/dialog.tool_effect)."""
        from s_tsfe_dl_ray.sources.parquet import read_table
        from s_tsfe_dl_ray.stages.dialog import tool_effect

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(tool_effect(turns))

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

    def q_transcripts_self_repetition(sf):
        """Per-conversation degenerate-loop probe: share of word-trigram
        occurrences already emitted in an EARLIER turn of the same
        conversation (stages/dialog.self_repetition)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import self_repetition

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "text"])
        return _round_floats(self_repetition(turns))

    def q_transcripts_abandonment(sf):
        """Conversation abandonment by hour of last activity: share of
        conversations whose FINAL turn is a user turn (asked, never
        answered) per hour-of-day (stages/dialog.abandonment_by_hour)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import abandonment_by_hour

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "ts"])
        return _round_floats(abandonment_by_hour(turns))

    def q_transcripts_tool_adoption(sf):
        """Per-tool adoption: share of conversations reaching each tool
        and the mean first-use turn index
        (stages/dialog.tool_adoption)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import tool_adoption

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "tool"])
        return _round_floats(tool_adoption(turns))

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

    def q_transcripts_readability_by_role(sf):
        """Pooled Flesch reading ease per speaker role — exact int64
        word/sentence/syllable counts, one flesch tree per role
        (stages/dialog.readability_by_role)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import readability_by_role

        turns = _rt(_transcripts_for(sf), columns=["role", "text"])
        return _round_floats(readability_by_role(turns))

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

    def q_transcripts_prompt_curve(sf):
        """Reply-length response curve: user→assistant pairs binned
        into prompt-length rank deciles, mean prompt/reply tokens per
        bin (stages/dialog.prompt_response_curve)."""
        from s_tsfe_dl_ray.sources.parquet import read_table as _rt
        from s_tsfe_dl_ray.stages.dialog import prompt_response_curve

        turns = _rt(_transcripts_for(sf),
                    columns=["conv_id", "turn_idx", "role", "text"])
        return _round_floats(prompt_response_curve(turns))

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

    def q_transcripts_window_pairs(sf):
        """Supervised (input, label) window pairs over the flagship
        payload table: per conversation ordered by turn_idx, anchors
        every stride=2 turns emit input token-length window
        tl[p-4:p] / label tl[p:p+2] (stages/slide.window_pairs —
        timeseries_batch_generator.py:186-299) — the training-sample
        construction a forecasting head consumes, on dialog series."""
        from s_tsfe_dl_ray.functions.derive import token_count
        from s_tsfe_dl_ray.stages.slide import window_pairs

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "text"])

        def derive(t: pa.Table) -> pa.Table:
            return pa.table({
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                "tl": pc.cast(token_count(t["text"]), pa.int64())})

        seq = turns.map_batches(derive, batch_format="pyarrow")
        out = window_pairs(seq, keys=["conv_id"], order_by=["turn_idx"],
                           value_col="tl", length=4, length_target=2,
                           stride=2)

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["input_win"] = [",".join(map(str, a))
                               for a in df["input_win"]]
            df["label_win"] = [",".join(map(str, a))
                               for a in df["label_win"]]
            return df

        return (out.map_batches(fmt, batch_format="pandas")
                .sort(["conv_id", "anchor_idx"]))

    def q_transcripts_pair_export_job(sf):
        """Durable resumable training-pair EXPORT job
        (pipelines/export_job.WindowPairExportJob): per-conversation
        (input, label) token-length windows written as partitioned
        parquet with lineage manifests — reruns skip finished buckets;
        output equals the window_pairs stage, so it shares that SQL
        twin (stringified windows)."""
        import hashlib as _hl

        from s_tsfe_dl_ray.pipelines.export_job import WindowPairExportJob

        corpus = _transcripts_for(sf)
        # tag includes the job parameters, so a library upgrade that
        # widens the manifest schema starts a fresh tree instead of
        # tripping the (correct) param-drift refusal on the old one
        params = "nb8_L4_Lt2_S2_r1_tokens_v2"
        tag = _hl.md5(f"{corpus}|{params}".encode()).hexdigest()[:10]
        out = f"/tmp/s_tsfe_dl_ray_pair_export_{tag}"
        job = WindowPairExportJob(corpus, out, n_buckets=8,
                                  length=4, length_target=2, stride=2)
        job.run()

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["input_win"] = [",".join(map(str, a))
                               for a in df["input_win"]]
            df["label_win"] = [",".join(map(str, a))
                               for a in df["label_win"]]
            return df

        return (job.read_pairs()
                .map_batches(fmt, batch_format="pandas")
                .sort(["conv_id", "anchor_idx"]))

    def q_transcripts_len_xicor(sf):
        """Chatterjee's xi of assistant/user turn length against
        conversation position, per role (stages/robust.xicor reuse on
        the dialog payload): does verbosity depend on WHERE in the
        conversation a turn sits — monotone or not."""
        from s_tsfe_dl_ray.functions.derive import token_count
        from s_tsfe_dl_ray.stages.robust import xicor

        turns = read_table(_transcripts_for(sf),
                           columns=["conv_id", "turn_idx", "ts",
                                    "role", "text"])

        def part(t: pa.Table) -> pa.Table:
            return pa.table({
                "role": t["role"],
                "ts": t["ts"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                "y": pc.cast(token_count(t["text"]), pa.int64())})

        prep = turns.map_batches(part, batch_format="pyarrow")
        out = xicor(prep, key="role", order_by=["ts", "turn_idx"],
                    value_col="y", min_n=3)
        return _round_floats(out.sort("role"))

    return {k[2:]: v for k, v in locals().items() if k.startswith("q_")}
