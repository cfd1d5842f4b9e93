"""Conversation-structure metrics over transcript turns.

The transcripts axis of the engine: operators whose unit is a
conversation of ordered role-tagged turns (conv_id, turn_idx, ts, role)
— the same per-series ordered-scan discipline as the tier ops
(stages/scan.py), instantiated for dialog analytics.  Reference analog:
the annotation×signal alignment walk (reference TSFEDL/data.py:10-80
pairs each beat annotation with its surrounding signal window in record
order); here the "annotation" is a user turn and the "signal" is the
assistant's reply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .rollup import _stable_pkey


def reply_latency(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    role_col: str = "role",
    from_role: str = "user",
    to_role: str = "assistant",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation reply-latency distribution: for every
    ``from_role`` turn, the time until the NEXT ``to_role`` turn in
    order (any later position, SQL ``ROWS 1 FOLLOWING … UNBOUNDED``);
    aggregated to ``n_replies, mean_reply_s, max_reply_s`` per
    conversation.  The first-order dialog health metric (how fast does
    the assistant answer?).

    Vectorized, no per-conversation loop: one co-partition, then the
    "next to_role ts after each row" is a REVERSED running minimum over
    the to_role rows of the packed order axis — the mirror of the
    forward scans.  ``from_role`` turns with no later ``to_role`` turn
    (conversation tail) are excluded, matching the SQL twin's NULL
    filter; conversations with no such pair at all are dropped.
    """
    order_by = order_by or [ts_col]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[conv_col], num_partitions))

    def latency_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [conv_col] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({conv_col: [],
                                 "n_replies": pd.Series([], dtype="int64"),
                                 "mean_reply_s": [], "max_reply_s": []})
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        convs = df[conv_col].to_numpy()
        roles = df[role_col].to_numpy()
        n = len(df)
        change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        ends = np.concatenate([change, [n]])
        # next to_role ts STRICTLY AFTER each position, within the conv:
        # a conv-local REVERSED running min (grouped cummin over the
        # reversed axis — C-speed), shifted by one position
        INF = np.int64(np.iinfo(np.int64).max)
        to_ts = np.where(roles == to_role, ts, INF)
        rev_gid = gid[::-1]
        seg_change = np.ones(n, dtype=bool)
        seg_change[1:] = rev_gid[1:] != rev_gid[:-1]
        seg_idx = np.cumsum(seg_change) - 1
        run_min = pd.Series(to_ts[::-1]).groupby(seg_idx).cummin().to_numpy()
        suffix_min = run_min[::-1]                   # min over [i, conv_end)
        nxt = np.full(n, INF, dtype=np.int64)
        nxt[:-1] = suffix_min[1:]                    # min over (i, conv_end)
        nxt[ends - 1] = INF                          # last row of each conv
        is_from = roles == from_role
        valid = is_from & (nxt != INF)
        gap = np.where(valid, (nxt - ts) / 1e6, 0.0)
        k = int(gid[-1]) + 1
        cnt = np.bincount(gid, weights=valid.astype(np.float64), minlength=k)
        ssum = np.bincount(gid, weights=gap, minlength=k)
        gmax = np.full(k, -np.inf)
        np.maximum.at(gmax, gid[valid], gap[valid])
        keep = cnt > 0
        return pd.DataFrame({
            conv_col: convs[starts][keep],
            "n_replies": cnt[keep].astype(np.int64),
            "mean_reply_s": ssum[keep] / cnt[keep],
            "max_reply_s": gmax[keep],
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(latency_partition, batch_format="pandas")


def _gid(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Dense group ids over a key-sorted array → (gid, first_indices, nk)."""
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    gid = np.zeros(len(keys), dtype=np.int64)
    gid[change] = 1
    gid = np.cumsum(gid)
    firsts = np.concatenate([[0], change])
    return gid, firsts, int(gid[-1]) + 1 if len(keys) else 0


def role_transitions(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    order_by: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Corpus-wide role→next-role transition matrix (the dialog Markov
    structure): for every adjacent turn pair within a conversation
    (ordered by ``order_col``), count ``(role_from, role_to)`` and the
    fraction of all transitions leaving ``role_from``.

    Scale shape: conv-hash exchange carries only (conv, order, role);
    each partition emits at most |roles|² partial rows, so the final
    merge is a fixed-size single-partition fold regardless of corpus
    size.  Reference analog: the label-transition structure of the beat
    annotation stream (reference TSFEDL/data.py:10-80 walks annotations
    in record order).

    ``order_by`` overrides the single ``order_col`` when the order axis
    needs a tiebreak (e.g. ``["ts", "event_id"]`` for event streams).
    """
    from .grouped import grouped_apply

    order = order_by or [order_col]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"role_from": pd.Series([], dtype="object"),
                              "role_to": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([conv_col] + order, kind="mergesort")
        conv = df[conv_col].to_numpy()
        role = df[role_col].to_numpy()
        same = conv[1:] == conv[:-1]
        if not same.any():
            return empty
        pairs = pd.DataFrame({"role_from": role[:-1][same],
                              "role_to": role[1:][same]})
        out = pairs.groupby(["role_from", "role_to"], sort=False) \
                   .size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    partials = grouped_apply(ds, keys=[conv_col], fn=part,
                             num_partitions=num_partitions,
                             whole_partition=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["role_from", "role_to"], sort=True)["n"] \
              .sum().reset_index()
        tot = g.groupby("role_from")["n"].transform("sum")
        return pd.DataFrame({
            "role_from": g["role_from"], "role_to": g["role_to"],
            "n_transitions": g["n"].astype("int64"),
            "frac_from": g["n"] / tot,
        })

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def tool_chain_streaks(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation tool-call structure: total turns, tool-calling
    turns, and the longest run of CONSECUTIVE tool-calling turns (by
    ``order_col``) — the agent-loop depth signal.  Gaps-and-islands,
    vectorized across every conversation of the partition at once."""
    from .grouped import grouped_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                conv_col: pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "n_tool_calls": pd.Series([], dtype="int64"),
                "longest_tool_streak": pd.Series([], dtype="int64")})
        df = df.sort_values([conv_col, order_col], kind="mergesort")
        conv = df[conv_col].to_numpy()
        flg = (df[tool_col].to_numpy() != "")
        gid, firsts, nk = _gid(conv)
        n_turns = np.bincount(gid, minlength=nk)
        n_calls = np.bincount(gid[flg], minlength=nk)
        # island ids: a new run starts at a conv boundary or a flag flip
        start = np.ones(len(df), dtype=bool)
        start[1:] = (gid[1:] != gid[:-1]) | (flg[1:] != flg[:-1])
        run_id = np.cumsum(start) - 1
        streak = np.zeros(nk, dtype=np.int64)
        if flg.any():
            run_len = np.bincount(run_id[flg])
            run_conv = np.zeros(run_id.max() + 1, dtype=np.int64)
            run_conv[run_id[flg]] = gid[flg]
            lens = run_len[run_len > 0]
            convs_of_runs = run_conv[np.flatnonzero(run_len)]
            np.maximum.at(streak, convs_of_runs, lens)
        return pd.DataFrame({
            conv_col: conv[firsts],
            "n_turns": n_turns.astype(np.int64),
            "n_tool_calls": n_calls.astype(np.int64),
            "longest_tool_streak": streak,
        })

    return grouped_apply(ds, keys=[conv_col], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def context_cost(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation context economics: turn count, total characters,
    peak single-turn size, and ``context_cost`` = Σ_t prefix_chars(t) —
    the total characters an LLM that re-reads full history processes
    across the conversation (the quadratic context bill).

    Scale shape: character lengths are derived per batch BEFORE the
    conv exchange, so the text column never crosses the shuffle — only
    (conv, order, chars) does.  All statistics are exact int64 sums.
    """
    from .grouped import grouped_apply

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            conv_col: t[conv_col], order_col: t[order_col],
            "chars": pc.cast(pc.utf8_length(t[text_col]), pa.int64()),
        })

    narrow = ds.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                conv_col: pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "total_chars": pd.Series([], dtype="int64"),
                "max_turn_chars": pd.Series([], dtype="int64"),
                "context_cost": pd.Series([], dtype="int64")})
        df = df.sort_values([conv_col, order_col], kind="mergesort")
        conv = df[conv_col].to_numpy()
        c = df["chars"].to_numpy(dtype=np.int64)
        gid, firsts, nk = _gid(conv)
        cs = np.cumsum(c)
        base = np.zeros(len(df), dtype=np.int64)
        base[:] = np.repeat(cs[firsts] - c[firsts], np.bincount(gid))
        prefix = cs - base                       # per-conv running total
        total = np.zeros(nk, dtype=np.int64)
        cost = np.zeros(nk, dtype=np.int64)
        np.add.at(total, gid, c)
        np.add.at(cost, gid, prefix)
        mx = np.zeros(nk, dtype=np.int64)
        np.maximum.at(mx, gid, c)
        return pd.DataFrame({
            conv_col: conv[firsts],
            "n_turns": np.bincount(gid, minlength=nk).astype(np.int64),
            "total_chars": total, "max_turn_chars": mx,
            "context_cost": cost,
        })

    return grouped_apply(narrow, keys=[conv_col], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def role_balance(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation user/assistant volume balance: turn counts,
    character totals per side, and assistant:user character ratio
    (NULL when the conversation has no user characters).

    Pure combiner — conditional partials are folded per batch (text is
    reduced to two int columns before the exchange), then one conv-hash
    merge; no ordered scan needed."""
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t[text_col]), pa.int64())
        is_u = pc.equal(t[role_col], "user")
        is_a = pc.equal(t[role_col], "assistant")
        zero = pa.scalar(0, pa.int64())
        tbl = pa.table({
            conv_col: t[conv_col],
            "n_user": pc.cast(is_u, pa.int64()),
            "n_assistant": pc.cast(is_a, pa.int64()),
            "user_chars": pc.if_else(is_u, chars, zero),
            "assistant_chars": pc.if_else(is_a, chars, zero),
        })
        out = tbl.group_by(conv_col, use_threads=False).aggregate(
            [("n_user", "sum"), ("n_assistant", "sum"),
             ("user_chars", "sum"), ("assistant_chars", "sum")])
        return out.rename_columns(
            [conv_col, "n_user", "n_assistant", "user_chars",
             "assistant_chars"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = _grouped_min(
        partials, group_cols=[conv_col],
        agg_cols=[("n_user", "sum"), ("n_assistant", "sum"),
                  ("user_chars", "sum"), ("assistant_chars", "sum")],
        pkey_col=conv_col, num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"], errors="ignore")
        u = df["user_chars"].to_numpy(dtype=np.float64)
        a = df["assistant_chars"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            df["assistant_user_ratio"] = np.where(u > 0, a / u, np.nan)
        return df

    return merged.map_batches(finish, batch_format="pandas")


def tool_usage(
    ds: Dataset,
    *,
    tool_col: str = "tool",
    conv_col: str = "conv_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Per-tool usage profile over the corpus: call count, EXACT count
    of distinct conversations using the tool, character volume, mean
    call size, and share of all tool calls.

    Two-level fold: per-batch partials collapse to (tool, conv) rows,
    one conv-hash exchange dedupes/merges them exactly, and the final
    |tools|-row fold runs in a single partition (tool cardinality is
    small and fixed; nothing key-skewed ever crosses a shuffle)."""
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.not_equal(t[tool_col], ""))
        chars = pc.cast(pc.utf8_length(sub[text_col]), pa.int64())
        tbl = pa.table({
            tool_col: sub[tool_col], conv_col: sub[conv_col],
            "n_calls": pa.array(np.ones(len(sub), dtype=np.int64)),
            "sum_chars": chars,
        })
        out = tbl.group_by([tool_col, conv_col], use_threads=False) \
                 .aggregate([("n_calls", "sum"), ("sum_chars", "sum")])
        return out.rename_columns([tool_col, conv_col, "n_calls",
                                   "sum_chars"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    pairs = _grouped_min(
        partials, group_cols=[tool_col, conv_col],
        agg_cols=[("n_calls", "sum"), ("sum_chars", "sum")],
        pkey_col=conv_col, num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"], errors="ignore")
        g = df.groupby(tool_col, sort=True).agg(
            n_calls=("n_calls", "sum"),
            n_convs=(conv_col, "size"),
            total_call_chars=("sum_chars", "sum"),
        ).reset_index()
        total = g["n_calls"].sum()
        g["mean_call_chars"] = g["total_call_chars"] / g["n_calls"]
        g["share_of_calls"] = g["n_calls"] / total
        for c in ("n_calls", "n_convs", "total_call_chars"):
            g[c] = g[c].astype("int64")
        return g

    return pairs.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def hourly_profile(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    tool_col: str = "tool",
    num_partitions: int = 64,
) -> Dataset:
    """Hour-of-day activity profile over the corpus: turns, tool calls,
    and EXACT distinct active conversations per hour (0–23) — the
    load-shape / capacity-planning view of a transcript stream.

    Same two-level fold as :func:`tool_usage`: per-batch partials
    collapse to (hour, conv) rows, one conv-hash exchange merges them
    exactly, and the 24-row final fold runs in a single partition."""
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        hr = pc.cast(pc.hour(t[ts_col]), pa.int64())
        tbl = pa.table({
            "hour": hr, conv_col: t[conv_col],
            "n_turns": pa.array(np.ones(len(t), dtype=np.int64)),
            "n_tool_calls": pc.cast(pc.not_equal(t[tool_col], ""),
                                    pa.int64()),
        })
        out = tbl.group_by(["hour", conv_col], use_threads=False) \
                 .aggregate([("n_turns", "sum"), ("n_tool_calls", "sum")])
        return out.rename_columns(["hour", conv_col, "n_turns",
                                   "n_tool_calls"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    pairs = _grouped_min(
        partials, group_cols=["hour", conv_col],
        agg_cols=[("n_turns", "sum"), ("n_tool_calls", "sum")],
        pkey_col=conv_col, num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("hour", sort=True).agg(
            n_turns=("n_turns", "sum"),
            n_tool_calls=("n_tool_calls", "sum"),
            n_convs=(conv_col, "size"),
        ).reset_index()
        for c in ("hour", "n_turns", "n_tool_calls", "n_convs"):
            g[c] = g[c].astype("int64")
        return g

    return pairs.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def final_role_distribution(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
) -> Dataset:
    """How conversations END: the distribution of the final turn's role
    over the corpus (assistant-final ≈ answered, user-final ≈ abandoned,
    tool-final ≈ interrupted agent loop) — the coarse outcome label of a
    transcript store.

    Composition, no new kernel: :func:`stages.dedup.latest_per_key`
    (last-writer-wins per conversation) then a |roles|-row fold in one
    final partition.  Output: ``final_role, n_convs, frac``.
    """
    import pyarrow.compute as pc

    from .dedup import latest_per_key

    last = latest_per_key(ds, keys=[conv_col], order_by=[order_col])

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(role_col, use_threads=False) \
               .aggregate([([], "count_all")])
        return out.rename_columns([role_col, "n"])

    partials = last.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(role_col, sort=True)["n"].sum().reset_index()
        return pd.DataFrame({
            "final_role": g[role_col],
            "n_convs": g["n"].astype("int64"),
            "frac": g["n"] / g["n"].sum(),
        })

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def context_budget(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    text_col: str = "text",
    budget_tokens: int = 512,
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation context-window truncation audit: walking the
    turns in time order, how many leading turns fit inside a
    ``budget_tokens`` context window (whitespace-token prefix sums), and
    how many tokens the truncation drops — the planning number behind
    "what fraction of our transcripts even fits the model's window".

    Token counts (single-space split, '' → 0) are derived per batch
    BEFORE the conv exchange — the text never crosses the shuffle, only
    (conv, ts, order, ntok:int64).  Prefix sums are monotone
    nondecreasing so "fits" == ``cum ≤ budget`` rows form the exact
    leading run; everything is int64-exact.
    Output: ``conv_id, n_turns, n_fit, tokens_total, tokens_dropped``.
    """
    from .grouped import grouped_apply

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        txt = t[text_col]
        spaces = pc.count_substring(txt, " ")
        ntok = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int64()),
                          pc.add(pc.cast(spaces, pa.int64()),
                                 pa.scalar(1, pa.int64())))
        return pa.table({conv_col: t[conv_col], ts_col: t[ts_col],
                         order_col: t[order_col], "ntok": ntok})

    narrow = ds.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                conv_col: pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "n_fit": pd.Series([], dtype="int64"),
                "tokens_total": pd.Series([], dtype="int64"),
                "tokens_dropped": pd.Series([], dtype="int64")})
        df = df.sort_values([conv_col, ts_col, order_col], kind="mergesort")
        conv = df[conv_col].to_numpy()
        c = df["ntok"].to_numpy(dtype=np.int64)
        gid, firsts, nk = _gid(conv)
        cs = np.cumsum(c)
        base = np.repeat(cs[firsts] - c[firsts], np.bincount(gid))
        prefix = cs - base
        fits = (prefix <= budget_tokens).astype(np.int64)
        n_fit = np.zeros(nk, dtype=np.int64)
        np.add.at(n_fit, gid, fits)
        total = np.zeros(nk, dtype=np.int64)
        np.add.at(total, gid, c)
        kept = np.zeros(nk, dtype=np.int64)
        np.add.at(kept, gid, c * fits)
        return pd.DataFrame({
            conv_col: conv[firsts],
            "n_turns": np.bincount(gid, minlength=nk).astype(np.int64),
            "n_fit": n_fit,
            "tokens_total": total,
            "tokens_dropped": total - kept,
        })

    return grouped_apply(narrow, keys=[conv_col], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def prompt_response_ols(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    num_partitions: int = 64,
) -> Dataset:
    """Does a longer prompt buy a longer response?  Corpus-level OLS of
    the assistant reply's token length on the IMMEDIATELY preceding user
    turn's token length (adjacent ``turn_idx`` within a conversation) —
    the dialog sibling of the per-key trend fit
    (stages/trend.grouped_linear_trend), with the same moment-sum
    algebra.

    Token counts (single-space split, '' → 0) are derived per batch so
    text never crosses the shuffle; adjacent-pair matching happens
    inside each conv partition (vectorized shift compare, no per-conv
    loop); the moment partials (n, Σx, Σy, Σx², Σxy, Σy²) are EXACT
    int64 sums, so the final single-row merge and the SQL twin compute
    bit-identical doubles from identical integers.

    Output: one row — ``n_pairs (int64), slope, intercept, corr_xy``
    (NULL fit when degenerate).
    """
    import pyarrow.compute as pc

    from .grouped import grouped_apply

    def derive(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        spaces = pc.count_substring(txt, " ")
        ntok = pc.if_else(pc.equal(txt, ""), pa.scalar(0, pa.int64()),
                          pc.add(pc.cast(spaces, pa.int64()),
                                 pa.scalar(1, pa.int64())))
        return pa.table({conv_col: t[conv_col], order_col: t[order_col],
                         role_col: t[role_col], "_ntok": ntok})

    narrow = ds.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["_n", "_sx", "_sy", "_sxx",
                                           "_sxy", "_syy"]})
        df = df.sort_values([conv_col, order_col], kind="mergesort")
        conv = df[conv_col].to_numpy()
        idx = df[order_col].to_numpy().astype(np.int64)
        role = df[role_col].to_numpy()
        ntok = df["_ntok"].to_numpy().astype(np.int64)
        ok = (
            (conv[:-1] == conv[1:])
            & (idx[1:] == idx[:-1] + 1)
            & (role[:-1] == prompt_role)
            & (role[1:] == response_role)
        )
        x = ntok[:-1][ok]
        y = ntok[1:][ok]
        return pd.DataFrame({
            "_n": pd.Series([len(x)], dtype="int64"),
            "_sx": pd.Series([int(x.sum())], dtype="int64"),
            "_sy": pd.Series([int(y.sum())], dtype="int64"),
            "_sxx": pd.Series([int((x * x).sum())], dtype="int64"),
            "_sxy": pd.Series([int((x * y).sum())], dtype="int64"),
            "_syy": pd.Series([int((y * y).sum())], dtype="int64"),
        })

    partials = grouped_apply(narrow, keys=[conv_col], fn=part,
                             num_partitions=num_partitions,
                             whole_partition=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df["_n"].sum())
        sx, sy = float(df["_sx"].sum()), float(df["_sy"].sum())
        sxx = float(df["_sxx"].sum())
        sxy = float(df["_sxy"].sum())
        syy = float(df["_syy"].sum())
        with np.errstate(divide="ignore", invalid="ignore"):
            cov = sxy - sx * sy / n
            varx = sxx - sx * sx / n
            vary = syy - sy * sy / n
            slope = cov / varx if varx > 0 else np.nan
            intercept = (sy - slope * sx) / n if varx > 0 else np.nan
            corr = cov / np.sqrt(varx * vary) if varx > 0 and vary > 0 else np.nan
        return pd.DataFrame({
            "n_pairs": pd.Series([int(n)], dtype="int64"),
            "slope": [slope], "intercept": [intercept], "corr_xy": [corr],
        })

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def transition_entropy(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    order_by: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Conditional next-state entropy of the stream's Markov structure:
    for each ``role_from``, ``H(next | from) = −Σ_j p(j|from)·log2
    p(j|from)`` over the transition matrix — 0 bits = the next state is
    fully determined, log2(k) bits = uniformly unpredictable.  The
    summary scalar on top of :func:`role_transitions` (predictability of
    a dialog's turn structure / an event stream's type sequence).

    Same scale shape as the matrix op it composes: per-conv partials,
    |roles|²-row fold; the entropy fold is a tiny single-partition pass
    over EXACT integer counts, so the SQL twin reproduces the floats
    term for term.  Output: ``role_from, n_from (int64),
    h_bits (float64)``, one row per observed source state.
    """
    mat = role_transitions(
        ds, conv_col=conv_col, order_col=order_col, role_col=role_col,
        order_by=order_by, num_partitions=num_partitions,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_transitions"].to_numpy(dtype=np.float64)
        tot = df.groupby("role_from")["n_transitions"].transform("sum") \
                .to_numpy(dtype=np.float64)
        p = n / tot
        term = -p * np.log2(p)
        out = pd.DataFrame({"role_from": df["role_from"], "_t": term,
                            "_n": df["n_transitions"]})
        g = out.groupby("role_from", sort=True).agg(
            n_from=("_n", "sum"), h_bits=("_t", "sum")).reset_index()
        g["n_from"] = g["n_from"].astype(np.int64)
        return g

    return mat.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def reply_latency_by_hour(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    role_col: str = "role",
    from_role: str = "user",
    to_role: str = "assistant",
    quantiles: tuple[float, ...] = (0.5, 0.95),
    num_partitions: int = 8,
) -> Dataset:
    """Reply-latency SLA profile by hour of day (UTC): for every
    ``from_role`` turn with a later ``to_role`` turn in its
    conversation, bucket the latency by the PROMPT's hour-of-day and
    report count, exact mean, and exact ``quantile_disc`` percentiles —
    the "is the assistant slower at peak hours" operations view of
    :func:`reply_latency`.

    Same conv-partition suffix-min derivation as reply_latency (no
    per-conversation loop); per-partition ``(hour, lat_us) → count``
    histogram partials cross one tiny 24-key exchange
    (stages/quantile.py grouped_quantiles discipline).

    Output: ``hour (int64), n_replies (int64), mean_s (float64),
    p<pct>_us (int64)…``.
    """
    order_by = order_by or [ts_col]
    qcols = [f"p{int(q * 100)}_us" for q in quantiles]
    HOUR_US = 3_600_000_000
    INF = np.int64(np.iinfo(np.int64).max)

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[conv_col], 64))

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [conv_col] + order_by, kind="mergesort").reset_index(drop=True)
        empty = pd.DataFrame({
            "hour": pd.Series([], dtype="int64"),
            "lat_us": pd.Series([], dtype="int64"),
            "_cnt": pd.Series([], dtype="int64"),
        })
        if len(df) == 0:
            return empty
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        convs = df[conv_col].to_numpy()
        roles = df[role_col].to_numpy()
        n = len(df)
        change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        ends = np.concatenate([change, [n]])
        to_ts = np.where(roles == to_role, ts, INF)
        rev_gid = gid[::-1]
        seg_change = np.ones(n, dtype=bool)
        seg_change[1:] = rev_gid[1:] != rev_gid[:-1]
        seg_idx = np.cumsum(seg_change) - 1
        run_min = pd.Series(to_ts[::-1]).groupby(seg_idx).cummin().to_numpy()
        suffix_min = run_min[::-1]
        nxt = np.full(n, INF, dtype=np.int64)
        nxt[:-1] = suffix_min[1:]
        nxt[ends - 1] = INF
        valid = (roles == from_role) & (nxt != INF)
        if not valid.any():
            return empty
        hour = (ts[valid] // HOUR_US) % 24
        lat = nxt[valid] - ts[valid]
        out = (
            pd.DataFrame({"hour": hour, "lat_us": lat})
            .groupby(["hour", "lat_us"], sort=False)
            .size().rename("_cnt").reset_index()
        )
        out["_cnt"] = out["_cnt"].astype(np.int64)
        return out

    def add_hour_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey2", _stable_pkey(t["hour"], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby(["hour", "lat_us"], sort=True)["_cnt"].sum().reset_index()
        h["_cum"] = h.groupby("hour", sort=False)["_cnt"].cumsum()
        tot = h.groupby("hour", sort=False)["_cnt"].sum().rename("_n")
        ssum = (h["lat_us"] * h["_cnt"]).groupby(h["hour"], sort=False) \
                                        .sum().rename("_s")
        out = h[["hour"]].drop_duplicates().reset_index(drop=True)
        out = out.merge(tot, left_on="hour", right_index=True)
        out = out.merge(ssum, left_on="hour", right_index=True)
        h = h.merge(tot, left_on="hour", right_index=True)
        res = pd.DataFrame({
            "hour": out["hour"].astype(np.int64),
            "n_replies": out["_n"].astype(np.int64),
            "mean_s": (out["_s"].astype(np.float64) / out["_n"].to_numpy())
            / 1e6,
        })
        for q, col in zip(quantiles, qcols):
            target = np.maximum(np.ceil(h["_n"] * q), 1)
            hit = h[h["_cum"] >= target]
            picked = hit.groupby("hour", sort=False)["lat_us"].first().rename(col)
            res = res.merge(picked.reset_index(), on="hour", how="left")
            res[col] = res[col].astype(np.int64)
        return res

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(pairs_partition, batch_format="pandas")
        .map_batches(add_hour_pkey, batch_format="pyarrow")
        .groupby("_pkey2")
        .map_groups(merge, batch_format="pandas")
    )


def conversation_duration_stats(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    quantiles: tuple[float, ...] = (0.5, 0.95),
    num_partitions: int = 64,
) -> Dataset:
    """Corpus distribution of conversation wall durations (last turn −
    first turn): count, exact mean, exact ``quantile_disc`` percentiles
    — the capacity-planning number behind session stickiness and
    context-retention settings.

    Combiner shape: per-batch per-conv ``(min ts, max ts)`` partials
    (one pyarrow group_by), conv-hash exchange, exact per-conv duration
    inside the partition, then the (mostly-distinct) duration histogram
    folds on one final partition — the funnel_latency quantile
    discipline.  Output: one row — ``n_convs (int64), mean_s (float64),
    p<pct>_us (int64)…``.
    """
    qcols = [f"p{int(q * 100)}_us" for q in quantiles]

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            import pyarrow.compute as pc

            ts = pc.cast(ts, pa.timestamp("us"))
        base = pa.table({conv_col: t[conv_col], "_ts": ts})
        out = base.group_by([conv_col], use_threads=False).aggregate(
            [("_ts", "min"), ("_ts", "max")]
        ).rename_columns([conv_col, "_mn", "_mx"])
        return out.append_column(
            "_pkey", _stable_pkey(out[conv_col], num_partitions))

    def durations(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(conv_col, sort=False).agg(
            _mn=("_mn", "min"), _mx=("_mx", "max"))
        dur = (g["_mx"].to_numpy().astype("datetime64[us]").astype(np.int64)
               - g["_mn"].to_numpy().astype("datetime64[us]").astype(np.int64))
        h = pd.DataFrame({"_dur": dur}).groupby("_dur").size() \
                                       .rename("_cnt").reset_index()
        h["_cnt"] = h["_cnt"].astype(np.int64)
        return h

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby("_dur", sort=True)["_cnt"].sum().reset_index()
        n = int(h["_cnt"].sum())
        s = int((h["_dur"] * h["_cnt"]).sum())
        cum = h["_cnt"].cumsum()
        out = {"n_convs": pd.Series([n], dtype="int64"),
               "mean_s": [(float(s) / n) / 1e6 if n else np.nan]}
        for q, col in zip(quantiles, qcols):
            target = max(int(np.ceil(n * q)), 1)
            out[col] = pd.Series(
                [int(h["_dur"][cum >= target].iloc[0])], dtype="int64")
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(durations, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def position_profile(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    n_bins: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """Turn-length drift across conversation position: per (role,
    position decile) the turn count and mean whitespace-token length,
    where a turn's decile is ``min(n_bins-1, n_bins*turn_idx // n_conv)``
    over its conversation's turn count.

    The decile needs the conversation's total turn count, so this is one
    conv-hash exchange (the standard key-complete partitioning
    assumption) carrying only ``(conv_id, turn_idx, role, token_len)`` —
    text folds to an int64 before the shuffle; each partition folds its
    (role, decile) partial sums vectorized and a tiny final merge
    combines ≤ roles×n_bins rows.

    Reference analog: the per-position channel statistics the window
    generator exposes for model input inspection
    (/root/reference/TSFEDL/timeseries_batch_generator.py:238-256).
    Output: ``role, decile, n_turns, mean_tokens`` (role, decile asc).
    """
    import pyarrow.compute as pc

    from ..functions.derive import token_count
    from .grouped import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: t[conv_col],
            "_turn": pc.cast(t[turn_col], pa.int64()),
            role_col: t[role_col],
            "_tok": token_count(t[text_col]),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "role": pd.Series([], dtype="object"),
                "decile": pd.Series([], dtype="int64"),
                "n_turns": pd.Series([], dtype="int64"),
                "tok_sum": pd.Series([], dtype="int64"),
            })
        n_conv = df.groupby(conv_col, sort=False)["_turn"].transform("size")
        dec = (n_bins * df["_turn"].to_numpy(dtype=np.int64)
               // n_conv.to_numpy(dtype=np.int64))
        dec = np.minimum(dec, n_bins - 1)
        out = (pd.DataFrame({
            "role": df[role_col].to_numpy(),
            "decile": dec,
            "n_turns": 1,
            "tok_sum": df["_tok"].to_numpy(dtype=np.int64),
        }).groupby(["role", "decile"], sort=False, as_index=False)
            .agg(n_turns=("n_turns", "sum"), tok_sum=("tok_sum", "sum")))
        return out

    partials = grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        keys=[conv_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True)

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = t.group_by(["role", "decile"], use_threads=False).aggregate(
            [("n_turns", "sum"), ("tok_sum", "sum")])
        n = pc.cast(m["n_turns_sum"], pa.float64())
        s = pc.cast(m["tok_sum_sum"], pa.float64())
        return pa.table({
            "role": m["role"],
            "decile": m["decile"],
            "n_turns": m["n_turns_sum"],
            "mean_tokens": pc.divide(s, n),
        })

    return (partials.repartition(1)
            .map_batches(finish, batch_format="pyarrow")
            .sort(["role", "decile"]))


def escalation_share(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "user",
    num_partitions: int = 64,
) -> Dataset:
    """Escalation probe: in what share of conversations do the USER's
    turns grow longer as the conversation proceeds?  Per conversation,
    the OLS slope of user-turn token length against turn index rides as
    exact integer sums (n·Σxy − Σx·Σy over n·Σx² − (Σx)², all int64),
    so "slope > 0" is an exact predicate; the corpus folds to one row.

    Conversations with < 2 user turns or a degenerate x spread are
    excluded from the denominator (no slope exists).  One conv-hash
    exchange carrying (conv, turn, token_len); per-partition vectorized
    groupby-sums; three-number partials to the final fold.

    Output (single row): ``n_convs, n_escalating, escalating_share,
    mean_slope``.
    """
    import pyarrow.compute as pc

    from ..functions.derive import token_count
    from .grouped import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        mask = pc.equal(t[role_col], role)
        sel = t.filter(mask)
        return pa.table({
            conv_col: sel[conv_col],
            "_x": pc.cast(sel[turn_col], pa.int64()),
            "_y": token_count(sel[text_col]),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "n_convs": pd.Series([], dtype="int64"),
                "n_escalating": pd.Series([], dtype="int64"),
                "slope_sum": pd.Series([], dtype="float64"),
            })
        x = df["_x"].to_numpy(dtype=np.int64)
        y = df["_y"].to_numpy(dtype=np.int64)
        g = pd.DataFrame({
            conv_col: df[conv_col].to_numpy(),
            "_n": np.ones(len(df), dtype=np.int64),
            "_sx": x, "_sy": y, "_sxx": x * x, "_sxy": x * y,
        }).groupby(conv_col, sort=False, as_index=False).sum()
        n = g["_n"].to_numpy()
        sx = g["_sx"].to_numpy()
        sy = g["_sy"].to_numpy()
        den = n * g["_sxx"].to_numpy() - sx * sx
        num = n * g["_sxy"].to_numpy() - sx * sy
        ok = (n >= 2) & (den > 0)
        slope = num[ok].astype(np.float64) / den[ok].astype(np.float64)
        return pd.DataFrame({
            "n_convs": pd.Series([int(ok.sum())], dtype="int64"),
            "n_escalating": pd.Series([int((slope > 0).sum())],
                                      dtype="int64"),
            "slope_sum": pd.Series([float(slope.sum())], dtype="float64"),
        })

    partials = grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        keys=[conv_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n_convs"].sum())
        e = int(df["n_escalating"].sum())
        ss = float(df["slope_sum"].sum())
        return pd.DataFrame({
            "n_convs": pd.Series([n], dtype="int64"),
            "n_escalating": pd.Series([e], dtype="int64"),
            "escalating_share": [e / n if n else np.nan],
            "mean_slope": [ss / n if n else np.nan],
        })

    return partials.repartition(1).map_batches(finish, batch_format="pandas")


def tool_effect(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Does tool use change the assistant's answers?  Assistant turns
    split by whether the immediately preceding turn (turn_idx order)
    was a tool result; per group the turn count and mean token length,
    plus the difference — the cheap causal-ish probe behind "are
    tool-augmented responses shorter/longer".

    One conv-hash exchange carrying (conv, turn, role, token_len);
    vectorized shifted-role compare inside each partition; int64
    partials fold to a TWO-ROW result.  Output: ``after_tool, n_turns,
    mean_tokens`` (rows: false, true) + the engine adds nothing else —
    downstream dashboards diff the two rows.
    """
    import pyarrow.compute as pc

    from ..functions.derive import token_count
    from .grouped import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: t[conv_col],
            "_turn": pc.cast(t[turn_col], pa.int64()),
            role_col: t[role_col],
            "_tok": token_count(t[text_col]),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "after_tool": pd.Series([], dtype="bool"),
                "n_turns": pd.Series([], dtype="int64"),
                "tok_sum": pd.Series([], dtype="int64")})
        df = df.sort_values([conv_col, "_turn"], kind="mergesort")
        first = df[conv_col].ne(df[conv_col].shift(1)).to_numpy()
        prev_role = df[role_col].shift(1).to_numpy()
        is_assist = (df[role_col] == "assistant").to_numpy()
        after_tool = (~first) & (prev_role == "tool")
        sel = is_assist & ~first  # assistant turns with a previous turn
        return pd.DataFrame({
            "after_tool": after_tool[sel],
            "n_turns": np.ones(int(sel.sum()), dtype=np.int64),
            "tok_sum": df["_tok"].to_numpy(dtype=np.int64)[sel],
        }).groupby("after_tool", sort=True, as_index=False).sum()

    partials = grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        keys=[conv_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "after_tool": pd.Series([], dtype="bool"),
                "n_turns": pd.Series([], dtype="int64"),
                "mean_tokens": pd.Series([], dtype="float64")})
        g = df.groupby("after_tool", sort=True, as_index=False).sum()
        return pd.DataFrame({
            "after_tool": g["after_tool"],
            "n_turns": g["n_turns"].astype("int64"),
            "mean_tokens": g["tok_sum"].to_numpy(dtype=np.float64)
            / g["n_turns"].to_numpy(dtype=np.float64),
        })

    return partials.repartition(1).map_batches(finish,
                                               batch_format="pandas")


def conversation_features(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> Dataset:
    """The conversation-level FEATURE TABLE — one wide row per
    conversation with the descriptors a conv-level model (routing,
    quality, abuse, cost prediction) trains on: turn counts per role,
    distinct tools touched, total/mean token volume, wall duration and
    the opening/closing roles.

    This is the engine's analog of the reference's per-record feature
    extraction before windowing (data.py:99-154 derives per-segment
    descriptors); expressed as ONE combiner-friendly pass — everything
    here is a per-(conv) fold of per-row narrow values, vectorized
    across all conversations of a partition.

    Output: ``{conv_col}, n_turns, n_user, n_assistant, n_tool_turns,
    n_distinct_tools, total_tokens, mean_tokens, duration_s,
    first_role, last_role``.
    """
    import pyarrow.compute as pc

    from ..functions.derive import token_count
    from .grouped import grouped_apply

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: t[conv_col],
            "_turn": pc.cast(t[turn_col], pa.int64()),
            role_col: t[role_col],
            tool_col: t[tool_col],
            "_tok": token_count(t[text_col]),
            ts_col: t[ts_col],
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                conv_col: pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "n_user": pd.Series([], dtype="int64"),
                "n_assistant": pd.Series([], dtype="int64"),
                "n_tool_turns": pd.Series([], dtype="int64"),
                "n_distinct_tools": pd.Series([], dtype="int64"),
                "total_tokens": pd.Series([], dtype="int64"),
                "mean_tokens": pd.Series([], dtype="float64"),
                "duration_s": pd.Series([], dtype="float64"),
                "first_role": pd.Series([], dtype="object"),
                "last_role": pd.Series([], dtype="object"),
            })
        df = df.sort_values([conv_col, "_turn"], kind="mergesort")
        g = df.groupby(conv_col, sort=True)
        ts_us = df[ts_col].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        work = pd.DataFrame({
            conv_col: df[conv_col].to_numpy(),
            "_one": np.ones(len(df), dtype=np.int64),
            "_u": (df[role_col] == "user").to_numpy().astype(np.int64),
            "_a": (df[role_col] == "assistant").to_numpy().astype(np.int64),
            "_t": (df[tool_col] != "").to_numpy().astype(np.int64),
            "_tok": df["_tok"].to_numpy(dtype=np.int64),
            "_ts": ts_us,
        })
        agg = work.groupby(conv_col, sort=True, as_index=False).agg(
            n_turns=("_one", "sum"), n_user=("_u", "sum"),
            n_assistant=("_a", "sum"), n_tool_turns=("_t", "sum"),
            total_tokens=("_tok", "sum"),
            _tmin=("_ts", "min"), _tmax=("_ts", "max"))
        ndt = (df[df[tool_col] != ""].groupby(conv_col, sort=True)
               [tool_col].nunique())
        agg["n_distinct_tools"] = agg[conv_col].map(ndt).fillna(0) \
            .astype("int64")
        agg["mean_tokens"] = (agg["total_tokens"].to_numpy(np.float64)
                              / agg["n_turns"].to_numpy(np.float64))
        agg["duration_s"] = (agg["_tmax"] - agg["_tmin"]) / 1e6
        agg["first_role"] = g[role_col].first().to_numpy()
        agg["last_role"] = g[role_col].last().to_numpy()
        return agg[[conv_col, "n_turns", "n_user", "n_assistant",
                    "n_tool_turns", "n_distinct_tools", "total_tokens",
                    "mean_tokens", "duration_s", "first_role",
                    "last_role"]]

    return grouped_apply(
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        keys=[conv_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True).sort(conv_col)


def tool_call_latencies(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    role_col: str = "role",
    tool_col: str = "tool",
    num_partitions: int = 64,
) -> Dataset:
    """Per-call tool round-trip latency rows: for every assistant turn
    that CALLS a tool (non-empty ``tool_col``), the time to the NEXT
    assistant turn in the same conversation — the tool's user-visible
    round trip (call → execution → consuming reply).  Emits one
    ``(tool, lat_us)`` row per completed call; calls with no following
    assistant turn (conversation ended mid-flight) emit nothing, like
    the SQL twin's IGNORE-NULLS forward window.

    Vectorized inside each conv-hash partition: one sort, a reversed
    ``minimum.accumulate`` computes each row's nearest following
    assistant index in O(n), conv boundaries invalidated by a per-conv
    last-index clamp — no per-conversation Python.

    Feeds :func:`~.quantile.grouped_quantiles` for per-tool SLA
    percentiles (exact integer µs → ``quantile_disc`` twin).
    """
    from .grouped import grouped_apply

    order_by = order_by or [ts_col]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "tool": pd.Series([], dtype="object"),
                "lat_us": pd.Series([], dtype="int64")})
        df = df.sort_values([conv_col] + order_by, kind="mergesort")
        n = len(df)
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        conv = df[conv_col].to_numpy()
        role = df[role_col].to_numpy()
        tool = df[tool_col].to_numpy()
        idx = np.arange(n, dtype=np.int64)
        # nearest STRICTLY-following assistant index (suffix min of
        # assistant positions, shifted by one)
        a_pos = np.where(role == "assistant", idx, n)
        suffix = np.minimum.accumulate(a_pos[::-1])[::-1]
        next_a = np.full(n, n, dtype=np.int64)
        next_a[:-1] = suffix[1:]
        # conv boundary clamp: following-assistant must be in MY conv
        gid, firsts, nk = _gid(conv)
        lasts = np.concatenate([firsts[1:] - 1, [n - 1]])
        my_last = lasts[gid]
        is_call = (role == "assistant") & (tool != "") & (tool != None)  # noqa: E711
        ok = is_call & (next_a <= my_last)
        return pd.DataFrame({
            "tool": tool[ok],
            "lat_us": ts[next_a[ok]] - ts[ok],
        })

    return grouped_apply(ds, keys=[conv_col], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def verbosity_trend(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    idx_col: str = "turn_idx",
    role: str = "assistant",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation verbosity drift: OLS slope of the given role's
    reply length (chars) against turn index — does the assistant get
    wordier or terser as a conversation progresses?  The conversation-
    local sibling of :func:`prompt_response_ols` (which fits one global
    line): drift direction is a per-dialog property that the global fit
    averages away.

    All moments are exact int64 (lengths and indices are integers;
    pyarrow group_by sums stay integer), cast to float64 once in a
    fixed expression tree mirrored by the SQL twin:
    ``slope = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²)``, ``mean = Σy/n``.
    Conversations with < 2 such turns report NULL slope (0-division —
    turn indices are unique so the denominator is 0 iff n < 2).
    One key exchange of tiny moment partials — text never crosses the
    shuffle.  Output: ``conv_col, n_role_turns (int64), mean_chars,
    slope_chars_per_turn``.
    """
    from ..pipelines.relational import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t[role_col], role)
        t = t.filter(keep)
        x = pc.cast(t[idx_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.utf8_length(t[text_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            conv_col: t[conv_col],
            "_n": pa.array(np.ones(len(x), np.int64)),
            "_sx": pa.array(x), "_sy": pa.array(y),
            "_sxx": pa.array(x * x), "_sxy": pa.array(x * y)})

    moments = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[conv_col],
        aggs={"_n": ("_n", "sum"), "_sx": ("_sx", "sum"),
              "_sy": ("_sy", "sum"), "_sxx": ("_sxx", "sum"),
              "_sxy": ("_sxy", "sum")},
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        n = df["_n"].to_numpy(np.float64)
        sx = df["_sx"].to_numpy(np.float64)
        sy = df["_sy"].to_numpy(np.float64)
        sxx = df["_sxx"].to_numpy(np.float64)
        sxy = df["_sxy"].to_numpy(np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = sy / n
            den = n * sxx - sx * sx
            slope = (n * sxy - sx * sy) / den
        return pd.DataFrame({
            conv_col: df[conv_col],
            "n_role_turns": df["_n"].astype(np.int64),
            "mean_chars": np.where(np.isfinite(mean), mean, np.nan),
            "slope_chars_per_turn": np.where(np.isfinite(slope), slope,
                                             np.nan)})

    return moments.map_batches(fin, batch_format="pandas")


def self_repetition(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Degenerate-loop detection per conversation: the share of word
    TRIGRAM occurrences that already appeared in an EARLIER turn of the
    same conversation — the standard "model stuck in a repetition loop"
    probe an LLM-serving pipeline runs over transcripts (high share =
    the assistant is re-emitting earlier phrasing; the within-turn
    sibling is stages/text.dup_word_stats).

    Trigrams are built exactly like
    :func:`s_tsfe_dl_ray.stages.text.ngram_contamination` — single-space
    positions, all three tokens non-empty, adjacency never crosses a
    turn boundary.  A gram occurrence is "repeated" when its turn_idx is
    strictly greater than the conversation's FIRST turn containing that
    gram; multiple occurrences inside the first turn itself count as
    novel (matching the SQL twin's ``turn_idx > min(turn_idx)``).

    Dataflow: the batch combiner explodes trigrams and pre-sums
    (conv, turn, gram) counts, so ONE conv-hash exchange carries gram
    count rows (never raw text); each conv-complete partition computes
    first-turn via a grouped transform — no per-conversation Python.
    Conversations with no trigram at all (every turn < 3 tokens) emit
    no row, like the SQL twin's inner join.  Output: ``conv_col,
    n_grams (int64), n_repeated (int64), repeated_share``.
    """
    from .grouped import grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({conv_col: pa.array([], pa.string()),
                          idx_col: pa.array([], pa.int64()),
                          "gram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        convs = t[conv_col].combine_chunks() if isinstance(
            t[conv_col], pa.ChunkedArray) else t[conv_col]
        idxs = pc.cast(t[idx_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        parts = []
        row_off = 0
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
                   else [toks]):
            lengths = pc.list_value_length(ch).to_numpy(
                zero_copy_only=False)
            nrows = len(lengths)
            cv = convs.slice(row_off, nrows)
            ix = idxs[row_off:row_off + nrows]
            row_off += nrows
            vals = ch.flatten()
            nv = len(vals)
            if nv < 3:
                continue
            row_of = np.repeat(np.arange(nrows), lengths)
            t1 = vals.slice(0, nv - 2)
            t2 = vals.slice(1, nv - 2)
            t3 = vals.slice(2, nv - 2)
            ok = row_of[: nv - 2] == row_of[2:nv]
            ok &= pc.not_equal(t1, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t2, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t3, "").to_numpy(zero_copy_only=False)
            if not ok.any():
                continue
            okm = pa.array(ok)
            gram = pc.binary_join_element_wise(t1, t2, t3, " ").filter(okm)
            rows = row_of[: nv - 2][ok]
            parts.append(pa.table({
                conv_col: cv.take(pa.array(rows)),
                idx_col: pa.array(ix[rows]),
                "gram": gram,
                "cnt": pa.array(np.ones(len(rows), np.int64))}))
        if not parts:
            return empty
        batch = pa.concat_tables(parts).combine_chunks()
        out = batch.group_by([conv_col, idx_col, "gram"],
                             use_threads=False).aggregate([("cnt", "sum")])
        return out.rename_columns([conv_col, idx_col, "gram", "cnt"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            conv_col: pd.Series([], dtype="object"),
            "n_grams": pd.Series([], dtype="int64"),
            "n_repeated": pd.Series([], dtype="int64"),
            "repeated_share": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        first = df.groupby([conv_col, "gram"], sort=False)[idx_col] \
            .transform("min")
        rep = np.where(df[idx_col].to_numpy() > first.to_numpy(),
                       df["cnt"].to_numpy(np.int64), 0)
        out = (pd.DataFrame({conv_col: df[conv_col],
                             "_n": df["cnt"].astype("int64"),
                             "_r": rep})
               .groupby(conv_col, sort=False, as_index=False)
               [["_n", "_r"]].sum())
        n = out["_n"].to_numpy(np.float64)
        r = out["_r"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = r / n
        return pd.DataFrame({
            conv_col: out[conv_col],
            "n_grams": out["_n"].astype(np.int64),
            "n_repeated": out["_r"].astype(np.int64),
            "repeated_share": np.where(np.isfinite(share), share, np.nan)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[conv_col], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def abandonment_by_hour(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> Dataset:
    """When do conversations get abandoned?  Per hour-of-day of each
    conversation's LAST activity: how many conversations ended then, and
    what share ended on a *user* turn (a question the assistant never
    answered — the operational abandonment signal).  The time-resolved
    refinement of :func:`final_role_distribution`.

    Composition, no new kernel: :func:`stages.dedup.latest_per_key`
    (last turn per conversation, argmax by ``order_col`` — ties
    impossible under the unique-turn_idx contract), then a 24-row
    hour-count combiner.  Counts are exact int64; the share is one
    division.  Output: ``hour (int64), n_convs, n_abandoned,
    abandoned_share``, one row per hour with ≥ 1 ending.
    """
    from .dedup import latest_per_key

    last = latest_per_key(ds, keys=[conv_col], order_by=[order_col])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) % 24
        ab = pc.cast(pc.equal(t[role_col], "user"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        base = pa.table({
            "hour": pa.array(hour.astype(np.int64)),
            "_n": pa.array(np.ones(len(us), np.int64)),
            "_a": pa.array(ab)})
        out = base.group_by(["hour"], use_threads=False).aggregate(
            [("_n", "sum"), ("_a", "sum")])
        return out.rename_columns(["hour", "_n", "_a"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "hour": pd.Series([], dtype="int64"),
                "n_convs": pd.Series([], dtype="int64"),
                "n_abandoned": pd.Series([], dtype="int64"),
                "abandoned_share": pd.Series([], dtype="float64")})
        g = df.groupby("hour", sort=True)[["_n", "_a"]].sum().reset_index()
        return pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "n_convs": g["_n"].astype("int64"),
            "n_abandoned": g["_a"].astype("int64"),
            "abandoned_share": g["_a"].to_numpy(np.float64)
                               / g["_n"].to_numpy(np.float64)})

    return last.map_batches(
        partial, batch_format="pyarrow").repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def tool_adoption(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
) -> Dataset:
    """Per-tool adoption across the conversation corpus: in how many
    (and what share of) conversations does each tool appear at least
    once, and how early — mean first-use turn index.  The adoption
    companion of :func:`tool_usage` (volume) and
    :func:`tool_chain_streaks` (loop depth): adoption says which tools
    conversations REACH, not how often they fire.

    Dataflow: per-batch (tool, conv, min turn_idx) combiner partials
    cross one conv-hash exchange; each partition folds the global
    per-(tool, conv) first use vectorized, then per-tool counts and
    first-turn sums (exact int64) merge on one final partition.  The
    denominator — total distinct conversations — folds from the same
    partials (a tool='' row per conversation seen), so empty-tool turns
    are counted but never scored.  Output per tool: ``tool_col,
    n_convs (int64), conv_share, mean_first_turn``.
    """

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.cast(t[order_col], pa.int64())
        base = pa.table({tool_col: t[tool_col], conv_col: t[conv_col],
                         "_i": idx})
        out = base.group_by([tool_col, conv_col],
                            use_threads=False).aggregate([("_i", "min")])
        return out.rename_columns([tool_col, conv_col, "_i"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # each conversation lives in exactly ONE conv-hash partition, so
        # per-partition distinct-conv counts (the marker rows,
        # _is_total=1) sum to the global denominator in `final`
        empty = pd.DataFrame({
            tool_col: pd.Series([], dtype="object"),
            "_convs": pd.Series([], dtype="int64"),
            "_first_sum": pd.Series([], dtype="int64"),
            "_is_total": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.groupby([tool_col, conv_col], sort=False,
                       as_index=False)["_i"].min()
        total = m[conv_col].nunique()
        m = m[m[tool_col] != ""]
        g = m.groupby(tool_col, sort=False, as_index=False).agg(
            _convs=("_i", "size"), _first_sum=("_i", "sum"))
        g["_is_total"] = np.int64(0)
        marker = pd.DataFrame({tool_col: [""],
                               "_convs": pd.Series([total], dtype="int64"),
                               "_first_sum": pd.Series([0], dtype="int64"),
                               "_is_total": pd.Series([1], dtype="int64")})
        return pd.concat([g, marker], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            tool_col: pd.Series([], dtype="object"),
            "n_convs": pd.Series([], dtype="int64"),
            "conv_share": pd.Series([], dtype="float64"),
            "mean_first_turn": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        total = np.float64(
            df.loc[df["_is_total"] == 1, "_convs"].sum())
        tools = df[df["_is_total"] == 0]
        if len(tools) == 0:
            return empty
        g = tools.groupby(tool_col, sort=True, as_index=False)[
            ["_convs", "_first_sum"]].sum()
        n = g["_convs"].to_numpy(np.int64)
        return pd.DataFrame({
            tool_col: g[tool_col],
            "n_convs": n,
            "conv_share": n.astype(np.float64) / total,
            "mean_first_turn": g["_first_sum"].to_numpy(np.float64)
                               / n.astype(np.float64)})

    from .grouped import grouped_apply

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = grouped_apply(partials, keys=[conv_col], fn=fold,
                           num_partitions=64, whole_partition=True)
    return folded.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def conv_compressibility(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    level: int = 6,
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation DEFLATE compressibility: zlib level-``level``
    ratio of the turn texts joined in order with newlines — the
    information-density curation signal (templated / looping / spammy
    dialogs compress far below organic ones; the codec-level
    complement of :func:`self_repetition`'s trigram share and
    dup_word_stats' token ratio).  zlib is deterministic for a fixed
    level, so results are stable across partitionings and runs; there
    is no SQL twin (DuckDB has no DEFLATE) — correctness is pinned by
    a golden test and the blocking-invariance sweep.

    Dataflow: ONE conv-hash exchange of (conv, idx, text) rows; each
    conv-complete partition sorts once and compresses per conversation
    (zlib's C loop is the kernel; the Python loop is one call per
    conversation, not per turn).  Output: ``conv_col, n_turns (int64),
    raw_bytes (int64), compressed_bytes (int64), compression_ratio``
    (compressed/raw, NULL for zero-length conversations).
    """
    import zlib

    from .grouped import grouped_apply

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            conv_col: pd.Series([], dtype="object"),
            "n_turns": pd.Series([], dtype="int64"),
            "raw_bytes": pd.Series([], dtype="int64"),
            "compressed_bytes": pd.Series([], dtype="int64"),
            "compression_ratio": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values([conv_col, idx_col], kind="mergesort")
        rows = []
        for conv, g in m.groupby(conv_col, sort=False):
            blob = "\n".join(g[text_col].tolist()).encode("utf-8")
            comp = len(zlib.compress(blob, level))
            rows.append((conv, len(g), len(blob), comp))
        out = pd.DataFrame(rows, columns=[conv_col, "n_turns",
                                          "raw_bytes",
                                          "compressed_bytes"])
        raw = out["raw_bytes"].to_numpy(np.float64)
        comp = out["compressed_bytes"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = comp / raw
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["raw_bytes"] = out["raw_bytes"].astype(np.int64)
        out["compressed_bytes"] = out["compressed_bytes"].astype(np.int64)
        out["compression_ratio"] = np.where(np.isfinite(ratio), ratio,
                                            np.nan)
        return out

    return grouped_apply(ds, keys=[conv_col], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def two_step_transitions(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_by: list[str] | None = None,
) -> Dataset:
    """Two-step transition matrix P² of the role/type Markov chain:
    the probability of being in state c two steps after state a,
    marginalizing over the middle state — the multi-hop behavior view
    :func:`role_transitions` (P¹) cannot show (e.g. user→assistant→user
    round-trip mass vs user→assistant→tool escalation mass).

    P¹ comes from :func:`role_transitions`' UNROUNDED row-normalized
    fractions (bit-identical to the SQL twin); P²(a,c) = Σ_b
    P(a,b)·P(b,c) folds SEQUENTIALLY over the middle state in sorted
    order on both sides (``np.add.reduceat`` over mid-sorted products
    == ``list_reduce(list(q ORDER BY mid))``), so the result is
    bit-exact.  Pairs with no 2-path emit nothing (inner-join
    semantics).  Output: ``role_from, role_to, p2``.
    """
    trans = role_transitions(ds, conv_col=conv_col, role_col=role_col,
                             order_by=order_by)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "role_from": pd.Series([], dtype="object"),
            "role_to": pd.Series([], dtype="object"),
            "p2": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        f = df[["role_from", "role_to", "frac_from"]]
        j = f.merge(f, left_on="role_to", right_on="role_from",
                    suffixes=("_1", "_2"))
        if len(j) == 0:
            return empty
        j = pd.DataFrame({
            "role_from": j["role_from_1"], "mid": j["role_to_1"],
            "role_to": j["role_to_2"],
            "_q": j["frac_from_1"].to_numpy(np.float64)
                  * j["frac_from_2"].to_numpy(np.float64)})
        j = j.sort_values(["role_from", "role_to", "mid"],
                          kind="mergesort").reset_index(drop=True)
        key_change = (j["role_from"].ne(j["role_from"].shift())
                      | j["role_to"].ne(j["role_to"].shift()))
        starts = np.flatnonzero(key_change.to_numpy())
        # strictly SEQUENTIAL per-segment accumulation == list_reduce
        # (np.add.reduceat would switch to pairwise above 8 elements)
        q = j["_q"].to_numpy(np.float64)
        ends = np.append(starts[1:], len(q))
        p2 = np.empty(len(starts), np.float64)
        for i, (s0, e0) in enumerate(zip(starts, ends)):
            acc = q[s0]
            for x in q[s0 + 1:e0]:
                acc = acc + x
            p2[i] = acc
        heads = j.iloc[starts]
        return pd.DataFrame({
            "role_from": heads["role_from"].to_numpy(),
            "role_to": heads["role_to"].to_numpy(),
            "p2": p2})

    return trans.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def readability_by_role(
    ds: Dataset,
    *,
    role_col: str = "role",
    text_col: str = "text",
) -> Dataset:
    """Corpus-level Flesch reading ease per speaker role, on POOLED
    counts: sum each role's words / sentence runs (clamped to ≥ 1 per
    turn) / vowel-group syllables, then evaluate the Flesch tree once
    per role — do assistants write simpler prose than users paste in?
    The pooled-aggregate sibling of the per-document
    :func:`~s_tsfe_dl_ray.stages.text.flesch_readability` (a mean of
    per-turn scores would need an order-dependent float sum; pooled
    int64 counts keep the twin exact).

    Output: ``role, n_turns (int64), n_words, n_sentences,
    n_syllables (int64), flesch`` — NULL score for roles with zero
    words.
    """

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        trimmed = pc.utf8_trim_whitespace(txt)
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        n_words = pc.if_else(
            empty, pa.scalar(0, pa.int64()),
            pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1),
                    pa.int64()))
        n_sent = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(txt, r"[.!?]+"), pa.int64()),
            pa.scalar(1, pa.int64()))
        n_syl = pc.cast(
            pc.count_substring_regex(txt, r"[aeiouyAEIOUY]+"), pa.int64())
        base = pa.table({
            role_col: t[role_col],
            "_t": pa.array(np.ones(t.num_rows, np.int64)),
            "_w": n_words, "_s": n_sent, "_y": n_syl})
        out = base.group_by([role_col], use_threads=False).aggregate(
            [("_t", "sum"), ("_w", "sum"), ("_s", "sum"), ("_y", "sum")])
        return out.rename_columns([role_col, "_t", "_w", "_s", "_y"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "role": pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "n_words": pd.Series([], dtype="int64"),
                "n_sentences": pd.Series([], dtype="int64"),
                "n_syllables": pd.Series([], dtype="int64"),
                "flesch": pd.Series([], dtype="float64")})
        g = df.groupby(role_col, sort=True, as_index=False)[
            ["_t", "_w", "_s", "_y"]].sum()
        w = g["_w"].to_numpy(np.int64).astype(np.float64)
        s = g["_s"].to_numpy(np.int64).astype(np.float64)
        y = g["_y"].to_numpy(np.int64).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            score = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        return pd.DataFrame({
            "role": g[role_col],
            "n_turns": g["_t"].astype(np.int64),
            "n_words": g["_w"].astype(np.int64),
            "n_sentences": g["_s"].astype(np.int64),
            "n_syllables": g["_y"].astype(np.int64),
            "flesch": np.where(np.isfinite(score), score, np.nan)})

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def echo_rate(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Assistant parroting detector: of the DISTINCT tokens in each
    assistant turn whose immediately-preceding turn is a user turn,
    what share already appear in that user turn?  High echo = the
    assistant restates the prompt instead of answering — a standard
    transcript-quality screen beside :func:`self_repetition`
    (self-copying) and conv_compressibility (global redundancy).

    Pooled per conversation (a mean of per-turn ratios would need an
    order-dependent float sum): ``echo_share = Σ matched /
    Σ assistant-turn distinct tokens`` over ELIGIBLE turns only
    (assistant turns directly preceded by a user turn) — all exact
    int64, one division.  Tokens are the single-space convention;
    matching is exact string equality on distinct per-turn tokens.
    Conversations with no eligible pair emit nothing (both sides).

    One conv-hash exchange of distinct (conv, turn, role, token) rows;
    the per-partition fold is two vectorized merges.  Output:
    ``conv_col, n_pairs (int64), n_assistant_tokens (int64),
    n_echo_tokens (int64), echo_share``.
    """
    from .grouped import grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        toks = _explode_turn_tokens(t, conv_col, idx_col, role_col,
                                    text_col)
        return toks

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            conv_col: pd.Series([], dtype="object"),
            "n_pairs": pd.Series([], dtype="int64"),
            "n_assistant_tokens": pd.Series([], dtype="int64"),
            "n_echo_tokens": pd.Series([], dtype="int64"),
            "echo_share": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.drop_duplicates([conv_col, idx_col, "token"])
        turns = df.drop_duplicates([conv_col, idx_col])[
            [conv_col, idx_col, role_col]]
        a_turns = turns[turns[role_col] == "assistant"]
        u_turns = turns[turns[role_col] == "user"].copy()
        u_turns["_next"] = u_turns[idx_col] + 1
        elig = a_turns.merge(
            u_turns[[conv_col, "_next"]],
            left_on=[conv_col, idx_col], right_on=[conv_col, "_next"])
        if len(elig) == 0:
            return empty
        elig = elig[[conv_col, idx_col]]
        at = m.merge(elig, on=[conv_col, idx_col])
        ut = m.copy()
        ut["_next"] = ut[idx_col] + 1
        echo = at.merge(
            ut[[conv_col, "_next", "token"]],
            left_on=[conv_col, idx_col, "token"],
            right_on=[conv_col, "_next", "token"])
        den = at.groupby(conv_col, sort=True).agg(
            n_assistant_tokens=("token", "size"),
            n_pairs=(idx_col, "nunique"))
        ec = echo.groupby(conv_col, sort=True)["token"].size()
        out = den.join(ec.rename("n_echo_tokens"), how="left") \
            .reset_index()
        out["n_echo_tokens"] = out["n_echo_tokens"].fillna(0) \
            .astype(np.int64)
        nt = out["n_assistant_tokens"].to_numpy(np.int64)
        ne = out["n_echo_tokens"].to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = ne.astype(np.float64) / nt.astype(np.float64)
        return pd.DataFrame({
            conv_col: out[conv_col],
            "n_pairs": out["n_pairs"].astype(np.int64),
            "n_assistant_tokens": nt,
            "n_echo_tokens": ne,
            "echo_share": np.where(np.isfinite(share), share, np.nan)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[conv_col], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def _explode_turn_tokens(t: pa.Table, conv_col: str, idx_col: str,
                         role_col: str, text_col: str) -> pa.Table:
    """Per-batch distinct (conv, turn, role, token) rows — single-space
    tokens, empties dropped, deduped within the batch (global dedup
    happens in the conv-complete fold)."""
    toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
    convs = t[conv_col].combine_chunks() if isinstance(
        t[conv_col], pa.ChunkedArray) else t[conv_col]
    idxs = pc.cast(t[idx_col], pa.int64()).to_numpy(zero_copy_only=False)
    roles = t[role_col].combine_chunks() if isinstance(
        t[role_col], pa.ChunkedArray) else t[role_col]
    parts = []
    row_off = 0
    for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
               else [toks]):
        lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
        nrows = len(lengths)
        cv = convs.slice(row_off, nrows)
        rv = roles.slice(row_off, nrows)
        ix = idxs[row_off:row_off + nrows]
        row_off += nrows
        vals = ch.flatten()
        if len(vals) == 0:
            continue
        row_of = np.repeat(np.arange(nrows), lengths)
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            continue
        rows = row_of[keep]
        parts.append(pa.table({
            conv_col: cv.take(pa.array(rows)),
            idx_col: pa.array(ix[rows]),
            role_col: rv.take(pa.array(rows)),
            "token": vals.filter(pa.array(keep))}))
    if not parts:
        return pa.table({
            conv_col: pa.array([], t.schema.field(conv_col).type),
            idx_col: pa.array([], pa.int64()),
            role_col: pa.array([], pa.string()),
            "token": pa.array([], pa.string())})
    batch = pa.concat_tables(parts).combine_chunks()
    return batch.group_by(
        [conv_col, idx_col, role_col, "token"],
        use_threads=False).aggregate([])


def prompt_response_curve(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    n_bins: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """Reply-length response curve: user→assistant adjacent turn pairs,
    binned into ``n_bins`` rank deciles of PROMPT token length, with
    each bin's mean prompt and mean reply length — the SHAPE behind
    :func:`prompt_response_ols`'s single slope (is the response curve
    linear, saturating, or U-shaped?).

    Token counts are the engine-wide single-space convention (exact
    int64); bins are integer row_number cuts ordered by (prompt length,
    conv, turn) so ties split deterministically; bin means are exact
    int sums divided once.  Output per bin: ``bin (int64), n_pairs
    (int64), mean_prompt_tokens, mean_reply_tokens``.

    One conv-hash exchange emits only (x, y, conv, idx) pair rows; the
    rank cut folds them on one final partition (pairs ≤ turns — sample
    upstream for billion-turn stores).
    """
    from ..functions.derive import token_count
    from .grouped import grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: t[conv_col],
            idx_col: pc.cast(t[idx_col], pa.int64()),
            role_col: t[role_col],
            "_tok": pc.cast(token_count(t[text_col]), pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            conv_col: pd.Series([], dtype="object"),
            idx_col: pd.Series([], dtype="int64"),
            "_x": pd.Series([], dtype="int64"),
            "_y": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.sort_values([conv_col, idx_col], kind="mergesort") \
            .reset_index(drop=True)
        nxt_conv = m[conv_col].shift(-1)
        nxt_role = m[role_col].shift(-1)
        nxt_idx = m[idx_col].shift(-1)
        nxt_tok = m["_tok"].shift(-1)
        sel = ((m[role_col] == "user") & (nxt_role == "assistant")
               & (nxt_conv == m[conv_col])
               & (nxt_idx == m[idx_col] + 1))
        p = m[sel]
        if len(p) == 0:
            return empty
        return pd.DataFrame({
            conv_col: p[conv_col],
            idx_col: p[idx_col].astype(np.int64),
            "_x": p["_tok"].astype(np.int64),
            "_y": nxt_tok[sel].astype(np.int64)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "bin": pd.Series([], dtype="int64"),
            "n_pairs": pd.Series([], dtype="int64"),
            "mean_prompt_tokens": pd.Series([], dtype="float64"),
            "mean_reply_tokens": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values(["_x", conv_col, idx_col], kind="mergesort") \
            .reset_index(drop=True)
        n = np.int64(len(m))
        rn = np.arange(1, n + 1, dtype=np.int64)
        m["bin"] = (rn - 1) * n_bins // n + 1
        g = m.groupby("bin", sort=True, as_index=False).agg(
            n_pairs=("_x", "size"), _sx=("_x", "sum"), _sy=("_y", "sum"))
        np_ = g["n_pairs"].to_numpy(np.int64).astype(np.float64)
        return pd.DataFrame({
            "bin": g["bin"].astype(np.int64),
            "n_pairs": g["n_pairs"].astype(np.int64),
            "mean_prompt_tokens": g["_sx"].to_numpy(np.int64)
                                  .astype(np.float64) / np_,
            "mean_reply_tokens": g["_sy"].to_numpy(np.int64)
                                 .astype(np.float64) / np_})

    pairs = grouped_apply(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True),
                          keys=[conv_col], fn=fold,
                          num_partitions=num_partitions,
                          whole_partition=True)
    return pairs.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)
