"""Deterministic synthetic transcript generator (seed=42).

Produces the engine's primary input table (BASELINE.json input_hint):

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp[us])

Fixture properties (FIXTURES.md §1, mirroring the reference's test corpora
— MIT-BIH segments with annotation gaps, data.py:50-76, and the window
generator's discontinuity fixtures, timeseries_batch_generator.py:238-256):

- a few *hot* conversations get ~100× the median turn count (skew/salting
  fixture);
- some conversations contain silent spans > 1h (forces empty 1m/1h windows
  → gap-fill paths);
- a small fraction of rows are out of ``ts`` order within a conversation
  while still correct by ``turn_idx`` (verifies sort-by-(turn_idx, ts)
  stable-ordering semantics);
- text is drawn from a deterministic pool, so per-turn text equality is a
  checkable invariant.

Fully vectorized (numpy) — generating 5M turns takes a few seconds.
Everything is a pure function of (n_turns, seed); output parquet is cached
under the target directory with a params marker so repeated calls are free.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query stream group "
    "filter sort big the a vector"
).split()

_TOOLS = np.array(
    ["", "search", "bash", "python", "browser", "editor", "calc", "fetch", "sql"]
)

_ROLES = np.array(["user", "assistant", "tool"])

_EPOCH_2024_US = 1704067200000000  # 2024-01-01T00:00:00Z in us


def _text_pool(rng: np.random.Generator, n_texts: int = 4096) -> np.ndarray:
    """Deterministic pool of distinct texts with lengths ~1–2000 chars."""
    words = np.array(_WORDS)
    lengths = rng.integers(1, 320, size=n_texts)  # words per text
    out = []
    for n in lengths:
        idx = rng.integers(0, len(words), size=int(n))
        out.append(" ".join(words[idx]))
    return np.array(out, dtype=object)


def generate_transcripts_table(n_turns: int = 50_000, seed: int = 42) -> pa.Table:
    """Build the transcripts table in memory (deterministic)."""
    rng = np.random.default_rng(seed)
    pool = _text_pool(rng)

    # --- conversation lengths: lognormal-ish + 3 hot conversations -------
    median_len = 50
    n_convs = max(4, int(n_turns // median_len))
    lens = np.maximum(2, rng.geometric(1.0 / median_len, size=n_convs))
    # hot conversations (skew fixture): up to 100× the median, but bounded
    # so small corpora still contain many conversations
    hot_mult = min(100, max(2, n_turns // (10 * median_len)))
    lens[:3] = median_len * hot_mult
    # trim/pad to hit n_turns approximately
    cum = np.cumsum(lens)
    cut = int(np.searchsorted(cum, n_turns)) + 1
    lens = lens[:cut]
    total = int(lens.sum())

    conv_ids = np.char.add(
        "conv-", np.char.zfill(np.arange(len(lens)).astype(str), 6)
    )
    conv_id = np.repeat(conv_ids, lens)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])

    # --- roles: user/assistant alternating with occasional tool rows -----
    role_code = (turn_idx % 2).astype(np.int64)  # 0=user, 1=assistant
    tool_row = rng.random(total) < 0.05
    role_code[tool_row] = 2
    role = _ROLES[role_code]

    # --- tool calls on ~15% of assistant turns ---------------------------
    tool_idx = np.zeros(total, dtype=np.int64)
    assistant = role_code == 1
    called = assistant & (rng.random(total) < 0.15)
    tool_idx[called] = rng.integers(1, len(_TOOLS), size=int(called.sum()))
    tool = _TOOLS[tool_idx]

    # --- text from the pool ----------------------------------------------
    text = pool[rng.integers(0, len(pool), size=total)]

    # --- timestamps: per-conv start + 1–300 s increments, gap + disorder -
    conv_start = _EPOCH_2024_US + rng.integers(
        0, 30 * 86_400_000_000, size=len(lens)
    )
    inc = rng.integers(1_000_000, 300_000_000, size=total)  # 1–300 s in us
    # gap fixture: ~5% of conversations get one 2–6 h silent span
    gap_conv = rng.random(len(lens)) < 0.05
    gap_conv[:3] = True  # hot convs always contain gaps
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    for ci in np.flatnonzero(gap_conv):
        if lens[ci] > 4:
            pos = starts[ci] + int(rng.integers(1, lens[ci] - 1))
            inc[pos] = int(rng.integers(2 * 3_600_000_000, 6 * 3_600_000_000))
    # first increment of each conv resets the cumsum to that conv's start
    abs_cum = np.cumsum(inc)
    base = abs_cum[np.maximum(starts - 1, 0)]
    base[0] = 0
    ts = conv_start.repeat(lens) + (abs_cum - np.repeat(base, lens))
    # disorder fixture: swap ts of ~1% adjacent same-conv pairs
    cand = np.flatnonzero(
        (rng.random(total) < 0.01) & (conv_id == np.roll(conv_id, -1))
    )
    cand = cand[cand < total - 1]
    cand = cand[np.diff(cand, prepend=-2) > 1]  # avoid overlapping swaps
    ts[cand], ts[cand + 1] = ts[cand + 1].copy(), ts[cand].copy()

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def transcripts_parquet(
    n_turns: int = 50_000,
    seed: int = 42,
    base_dir: str | None = None,
) -> str:
    """Write (or reuse) the deterministic transcripts table; return its path
    (a DIRECTORY of parquet shards).

    Sharded on purpose: a single multi-GB parquet file serializes the read
    (one fragment = one read task) — measured 137 s single-task vs seconds
    sharded at 5M turns.  Never one giant file (SURVEY.md "resumable
    output" rule); ~64k rows per shard (≥ cluster cores at bench sizes so the read stage can use every core).

    Cached by (n_turns, seed) under ``base_dir``; written to a temp dir +
    rename so concurrent callers never observe partial output.
    """
    base_dir = base_dir or os.path.join(tempfile.gettempdir(), "s_tsfe_dl_ray_synth")
    os.makedirs(base_dir, exist_ok=True)
    name = f"transcripts_n{n_turns}_s{seed}_v3"
    path = os.path.join(base_dir, name)
    marker = os.path.join(base_dir, name + ".json")
    if os.path.isdir(path) and os.path.exists(marker):
        return path
    table = generate_transcripts_table(n_turns, seed)
    shard_rows = 64 * 1024
    n_shards = max(1, (table.num_rows + shard_rows - 1) // shard_rows)
    tmpdir = tempfile.mkdtemp(dir=base_dir)
    try:
        for i in range(n_shards):
            shard = table.slice(i * shard_rows, shard_rows)
            pq.write_table(
                shard,
                os.path.join(tmpdir, f"part-{i:05d}.parquet"),
                row_group_size=64 * 1024,
            )
        os.replace(tmpdir, path) if not os.path.exists(path) else None
    except BaseException:
        import shutil

        shutil.rmtree(tmpdir, ignore_errors=True)
        raise
    with open(marker, "w") as f:
        json.dump(
            {"n_turns": n_turns, "seed": seed, "rows": table.num_rows,
             "shards": n_shards}, f,
        )
    return path
