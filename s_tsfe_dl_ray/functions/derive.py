"""Derived-column projections for transcripts (vectorized Arrow kernels).

Analog of the reference's Dense per-row projections and label encodings
(models_keras.py:68-70; data.py:91-94): cheap per-row derivations done in a
stateless ``map_batches`` with ``batch_format="pyarrow"``.

- ``token_len``    — whitespace token count of ``text`` (int64)
- ``char_len``     — utf8 length of ``text`` (int64)
- ``is_tool_call`` — 1 when ``tool`` is non-empty (int64, summable → rate)
- ``text_hash``    — stable 64-bit text fingerprint, so wide ``text`` can be
  projected away before shuffles while per-turn text equality stays
  checkable (SURVEY.md §7.4 "wide text rows")
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _count_spaces_simd(arr: pa.Array, chunk_rows: int = 1024) -> np.ndarray:
    """Per-row single-space count via SIMD byte compare + segment reduce.

    ``pc.count_substring``/polars ``count_matches`` iterate match-by-match
    (~170 matches/row here → ~3.1/2.3 µs/row); a byte-level ``== 32``
    compare + ``np.add.reduceat`` counts at byte-scan speed (~1.1 µs/row,
    2.7× — measured on the 20M-turn bench corpus).  The round-2 lesson
    (CLAUDE.md): buffer-level numpy with DATA-SIZED temporaries was 7×
    slower under 32 concurrent workers (page-fault contention), so this
    processes ~1 MB row-chunks with two small REUSED scratch buffers —
    L2-resident, zero steady-state allocation.

    Caller guarantees: no nulls, string/large_string type.
    """
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    raw = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
    buf_offsets = raw[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    out = np.empty(len(arr), dtype=np.int64)
    eq_buf = np.empty(0, dtype=bool)
    i32 = np.empty(0, dtype=np.int32)
    nrows = len(arr)
    for lo in range(0, nrows, chunk_rows):
        hi = min(lo + chunk_rows, nrows)
        b0, b1 = int(buf_offsets[lo]), int(buf_offsets[hi])
        m = b1 - b0
        if m == 0:
            out[lo:hi] = 0
            continue
        if len(eq_buf) < m:
            eq_buf = np.empty(m, dtype=bool)
            i32 = np.empty(m, dtype=np.int32)
        np.equal(data[b0:b1], 32, out=eq_buf[:m])
        np.copyto(i32[:m], eq_buf[:m])
        offs = buf_offsets[lo:hi].astype(np.int64) - b0
        res = np.add.reduceat(i32[:m], offs)
        # reduceat on an empty segment (equal adjacent offsets) returns the
        # element AT the offset instead of 0 — zero-length rows fixed here
        res[buf_offsets[lo + 1 : hi + 1] == buf_offsets[lo:hi]] = 0
        out[lo:hi] = res
    return out


def token_count(text: pa.ChunkedArray | pa.Array, *, fast: bool = True) -> pa.ChunkedArray:
    """Whitespace-token count; 0 for empty/blank text.

    ``fast=True`` (default, the transcript hot path): counts single spaces
    — exact for whitespace-normalized text (the transcript corpus is).
    Null-free string columns take the SIMD byte-count path
    (:func:`_count_spaces_simd`); anything else falls back to the Arrow
    ``count_substring`` kernel (same result, ~2.7× slower).
    ``fast=False``: counts whitespace *runs* via RE2 — exact for arbitrary
    text (used by stages.text.token_stats, whose DuckDB oracle is
    regexp_split-based).
    """
    if fast:
        chunks = text.chunks if isinstance(text, pa.ChunkedArray) else [text]
        if all(
            c.null_count == 0
            and (pa.types.is_string(c.type) or pa.types.is_large_string(c.type))
            for c in chunks
        ):
            counts = np.concatenate(
                [_count_spaces_simd(c) for c in chunks]
            ) if chunks else np.empty(0, np.int64)
            if isinstance(text, pa.ChunkedArray):
                lens = pc.binary_length(text).combine_chunks().to_numpy()
            else:
                lens = pc.binary_length(text).to_numpy()
            return pa.array(np.where(lens == 0, 0, counts + 1))
        n = pc.add(pc.count_substring(text, " "), 1)
        empty = pc.equal(pc.binary_length(text), 0)
        return pc.if_else(empty, pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))
    trimmed = pc.utf8_trim_whitespace(text)
    n_spaces = pc.count_substring_regex(trimmed, r"\s+")
    n = pc.add(n_spaces, 1)
    return pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int64()),
                      pc.cast(n, pa.int64()))


def text_hash64(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Stable, vectorized 64-bit hash of a string column.

    Uses polars' xxhash-based ``.hash(seed=0)`` — PYTHONHASHSEED-independent
    (unlike ``hash()``), so hashes agree across Ray worker processes and
    across cluster sizes, and it's a single vectorized kernel (no per-row
    Python).
    """
    import polars as pl

    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    hashed = pl.Series("t", arr).hash(seed=0).to_numpy()
    return pa.array(hashed.view(np.int64))


def derive_transcript_columns(batch: pa.Table, *, with_text_hash: bool = False) -> pa.Table:
    """Stateless per-batch projection used at the head of every transcript
    pipeline.  Zero-copy Arrow in/out."""
    token_len = token_count(batch["text"])
    is_tool = pc.cast(pc.not_equal(batch["tool"], ""), pa.int64())
    batch = batch.append_column("token_len", token_len)
    batch = batch.append_column("is_tool_call", is_tool)
    if with_text_hash:
        batch = batch.append_column("text_hash", text_hash64(batch["text"]))
    return batch
