"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Large-scale training-data-pipeline ops, first-class alongside the rollup
engine.  Reference analogs: per-row projections + label encoding
(experiments/utils.py:24-107 KDD column parse/one-hot), regex label strip
(experiments/utils.py:37), per-row scoring (experiments/utils.py:139-155
``computeScore``).

All stages are vectorized ``map_batches`` bodies; the stopword/marker sets
are compiled once per actor (``__init__``), not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# ---------------------------------------------------------------------------
# token stats + quality score (pyarrow kernels, zero-copy)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")


def token_stats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_chars_engine / avg_token_len (vectorized).

    n_tokens counts whitespace-separated tokens (runs of whitespace = one
    separator); 0 for empty/blank text.
    """
    t = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(t)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    n_tokens = pc.if_else(
        empty,
        pa.scalar(0, pa.int64()),
        pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1), pa.int64()),
    )
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    non_space = pc.cast(pc.utf8_length(pc.replace_substring_regex(t, r"\s", "")), pa.int64())
    avg_tok = pc.if_else(
        pc.equal(n_tokens, 0),
        pa.scalar(0.0),
        pc.divide(pc.cast(non_space, pa.float64()), pc.cast(n_tokens, pa.float64())),
    )
    batch = batch.append_column("n_tokens", n_tokens)
    batch = batch.append_column("n_chars_engine", n_chars)
    batch = batch.append_column("avg_token_len", avg_tok)
    return batch


def quality_score(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append stopword_ratio / punct_ratio / quality heuristics.

    quality = clip(1 - punct_ratio*2, 0, 1) * clip(n_tokens/32, 0, 1)
    — a deterministic, SQL-mirrorable quality heuristic (length + noise),
    in the spirit of published quality-filtering recipes (length,
    punctuation density, stopword presence).
    """
    t = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(t)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    n_tokens = pc.if_else(
        empty,
        pa.scalar(0, pa.int64()),
        pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1), pa.int64()),
    )
    n_chars = pc.utf8_length(t)
    nt_f = pc.cast(n_tokens, pa.float64())
    stop_pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = pc.cast(pc.count_substring_regex(t, stop_pattern), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(t, r"[^\w\s]"), pa.int64())
    safe_nt = pc.max_element_wise(nt_f, pa.scalar(1.0))
    safe_nc = pc.max_element_wise(pc.cast(n_chars, pa.float64()), pa.scalar(1.0))
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), safe_nt)
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), safe_nc)
    one, zero = pa.scalar(1.0), pa.scalar(0.0)
    q = pc.multiply(
        pc.max_element_wise(
            pc.min_element_wise(pc.subtract(one, pc.multiply(punct_ratio, pa.scalar(2.0))), one),
            zero,
        ),
        pc.min_element_wise(pc.divide(nt_f, pa.scalar(32.0)), one),
    )
    batch = batch.append_column("stopword_ratio", stop_ratio)
    batch = batch.append_column("punct_ratio", punct_ratio)
    batch = batch.append_column("quality", q)
    return batch


# ---------------------------------------------------------------------------
# language ID (marker-based n-gram heuristic; actor pool compiles markers)
# ---------------------------------------------------------------------------

#: marker word lists per language (deterministic rule: argmax hit count,
#: CJK codepoints short-circuit to 'zh', ties/zero → 'und')
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was", "with", "that", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas", "pour"),
    "es": ("el", "los", "las", "es", "una", "por", "que", "para"),
}


class LangId:
    """Heuristic language ID: per-language marker-word hit counts via the
    Arrow RE2 kernel (``pc.count_substring_regex`` — one vectorized call
    per language over the whole batch, no per-row Python; VERDICT r3 #9),
    CJK-range check for zh.

    Deterministic and SQL-mirrorable EXACTLY: pyarrow and DuckDB both
    embed RE2, so the per-language counts are the same engine's answer
    twice.

    Measured inside the real job (sf0.1 documents replicated 64× = 320k
    docs, 32 CPUs, min-of-3, per the CLAUDE.md no-microbenchmark rule):
    5.73 s → 2.79 s vs the previous per-row ``re.findall`` map (2.05×).
    """

    def __init__(self):
        self.pats = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in _LANG_MARKERS.items()
        }
        self.cjk = r"[一-鿿]"
        self.langs = list(_LANG_MARKERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        counts = np.stack(
            [
                pc.count_substring_regex(texts, self.pats[lang])
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                if isinstance(texts, pa.ChunkedArray)
                else pc.count_substring_regex(texts, self.pats[lang])
                .to_numpy(zero_copy_only=False)
                for lang in self.langs
            ],
            axis=1,
        )
        best = counts.argmax(axis=1)
        best_cnt = counts.max(axis=1)
        # strict argmax: tie between top-2 → undetermined
        sorted_counts = np.sort(counts, axis=1)
        tie = (counts.shape[1] > 1) & (sorted_counts[:, -1] == sorted_counts[:, -2])
        pred = np.where(
            best_cnt == 0, "und",
            np.where(tie, "und", np.array(self.langs, dtype=object)[best]),
        )
        cjk_counts = pc.count_substring_regex(texts, self.cjk)
        if isinstance(cjk_counts, pa.ChunkedArray):
            cjk_counts = cjk_counts.combine_chunks()
        has_cjk = cjk_counts.to_numpy(zero_copy_only=False) > 0
        pred = np.where(has_cjk, "zh", pred)
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


def lang_id(ds: Dataset, *, text_col: str = "text", concurrency: int | tuple[int, int] = (1, 16)) -> Dataset:
    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    return ds.map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# document fingerprints
# ---------------------------------------------------------------------------


def md5_fingerprint(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    """Normalized-content fingerprint: md5 of lowercase
    whitespace-collapsed text (SQL twin: md5(lower(regexp_replace(...)))).
    """
    norm = (
        batch[text_col]
        .str.lower()
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
    out = batch.copy()
    out["fingerprint"] = norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    return out


def rolling_fingerprint(batch: pd.DataFrame, *, text_col: str = "text") -> pd.DataFrame:
    """Order-sensitive 61-bit polynomial rolling hash over word hashes
    (winnowing-style document fingerprint; not SQL-expressible — fold).

    Vectorized per row: stable word hashes (polars xxhash) folded with a
    fixed base mod 2^61-1.
    """
    import polars as pl

    p = (1 << 61) - 1
    base = 1_000_003
    fps = np.empty(len(batch), dtype=np.int64)
    for i, text in enumerate(batch[text_col]):
        toks = text.split()
        if not toks:
            fps[i] = 0
            continue
        hs = pl.Series(toks).hash(seed=0).to_numpy() % p
        acc = 0
        for h in hs.tolist():  # O(words); base powers folded sequentially
            acc = (acc * base + int(h)) % p
        fps[i] = acc
    out = batch.copy()
    out["fingerprint"] = fps
    return out


# ---------------------------------------------------------------------------
# corpus token frequencies (distributed word-count → top-k)
# ---------------------------------------------------------------------------


def top_tokens(
    ds: "Dataset",
    *,
    text_col: str = "text",
    k: int = 50,
    num_partitions: int = 64,
) -> "Dataset":
    """Corpus-wide token frequencies, top-``k`` by count (ties: token asc).

    The canonical distributed word-count with combiner discipline: each
    batch explodes to tokens VECTORIZED (split → flatten → value_counts,
    all Arrow kernels) and pre-aggregates to per-batch (token, n) rows,
    so the shuffle carries per-batch distinct tokens, not token
    instances; a ``_pkey`` hash merge sums counts per token and the tiny
    merged table is sorted for the global top-k.  Tokens are single-space
    splits of trimmed text with empties dropped (SQL:
    ``unnest(string_split(trim(text), ' '))``).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        # trim SPACES only (pc.utf8_trim_whitespace would also strip
        # tabs/newlines, diverging from DuckDB trim() in the SQL twin)
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks) == 0:
            return pa.table({
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = _grouped_min(
        partials, group_cols=["token"], agg_cols=[("n", "sum")], pkey_col="token"
    )
    return merged.sort(["n", "token"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# context-window chunking (training-sample construction)
# ---------------------------------------------------------------------------


def chunk_words(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 16,
    stride: int = 8,
) -> Dataset:
    """Split every document into overlapping word windows — the
    context-window chunking step of an LLM training-data pipeline
    (long documents → fixed-budget training samples with overlap).

    Chunks start at word offsets 0, ``stride``, 2·``stride``, … < n_words;
    each takes ``chunk_len`` words (the final chunks are shorter).  Pure
    per-row fan-out, so it runs embarrassingly parallel as one vectorized
    ``map_batches`` (polars split → int_ranges → explode → list.slice →
    join; no Python per-row loop) with no shuffle at any scale.  SQL twin:
    ``unnest(generate_series(0, len(words)-1, stride))`` +
    ``list_slice``.  Same windowing semantics as the reference's
    length/stride window generator (timeseries_batch_generator.py:289-295)
    applied to words instead of samples.

    Output: (id_col, chunk_idx, chunk_text, n_words), one row per chunk.
    Empty text behaves like DuckDB ``string_split``: one ``['']`` word →
    one empty chunk.
    """
    if chunk_len < 1 or stride < 1:
        raise ValueError("chunk_len and stride must be >= 1")

    def explode(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select([id_col, text_col]))
        df = df.with_columns(pl.col(text_col).str.split(" ").alias("_w"))
        df = df.with_columns(
            pl.int_ranges(0, pl.col("_w").list.len().cast(pl.Int64), stride).alias("_off")
        ).explode("_off")
        df = df.with_columns(
            (pl.col("_off") // stride).alias("chunk_idx"),
            pl.col("_w").list.slice(pl.col("_off"), chunk_len).alias("_cw"),
        )
        out = df.select(
            pl.col(id_col),
            pl.col("chunk_idx").cast(pl.Int64),
            pl.col("_cw").list.join(" ").alias("chunk_text"),
            pl.col("_cw").list.len().cast(pl.Int64).alias("n_words"),
        )
        return out.to_arrow().cast(
            pa.schema([
                (id_col, t.schema.field(id_col).type),
                ("chunk_idx", pa.int64()),
                ("chunk_text", pa.string()),
                ("n_words", pa.int64()),
            ])
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# regex redaction (PII-style scrubbing)
# ---------------------------------------------------------------------------


def redact_regex(
    batch: pa.Table,
    *,
    pattern: str,
    replacement: str = "<REDACTED>",
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> pa.Table:
    """Append ``out_col`` with every ``pattern`` match replaced and
    ``n_redacted`` with the per-row match count — the PII/URL-scrubbing
    shape of a training-data pipeline, as pure RE2 Arrow kernels
    (``count_substring_regex`` + ``replace_substring_regex``; DuckDB's
    regexp functions are RE2 too, so the SQL twin
    ``regexp_replace(text, pat, rep, 'g')`` matches byte-for-byte).
    Compose as ``ds.map_batches(partial(redact_regex, pattern=...),
    batch_format="pyarrow")`` — stateless, no shuffle.
    """
    s = batch[text_col]
    n = pc.cast(pc.count_substring_regex(s, pattern), pa.int64())
    red = pc.replace_substring_regex(s, pattern, replacement)
    return batch.append_column("n_redacted", n).append_column(out_col, red)


# ---------------------------------------------------------------------------
# within-document repetition (quality signal)
# ---------------------------------------------------------------------------


def dup_word_stats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append n_words / n_distinct_words / dup_word_frac — the
    within-document repetition quality signal (high duplicate-token
    fraction flags boilerplate/spam; the word-level analog of published
    repetition filters).  Vectorized: polars ``str.split`` +
    ``list.n_unique`` per row, no Python loop.  SQL twin:
    ``len(string_split(text, ' '))`` / ``len(list_distinct(...))``.
    """
    import polars as pl

    arr = batch[text_col]
    words = pl.Series("t", arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr).str.split(" ")
    n_words = words.list.len().cast(pl.Int64).to_arrow()
    n_distinct = words.list.n_unique().cast(pl.Int64).to_arrow()
    frac = pc.subtract(
        pa.scalar(1.0),
        pc.divide(pc.cast(n_distinct, pa.float64()), pc.cast(n_words, pa.float64())),
    )
    batch = batch.append_column("n_words", pc.cast(n_words, pa.int64()))
    batch = batch.append_column("n_distinct_words", pc.cast(n_distinct, pa.int64()))
    return batch.append_column("dup_word_frac", frac)


# ---------------------------------------------------------------------------
# text normalization (pre-dedup canonical form)
# ---------------------------------------------------------------------------


def normalize_text(
    batch: pa.Table,
    *,
    text_col: str = "text",
    out_col: str = "text_norm",
    lowercase: bool = True,
    collapse_ws: bool = True,
    nfc: bool = True,
) -> pa.Table:
    """Append a canonicalized copy of ``text_col`` (pure Arrow kernels).

    The standard pre-dedup cleanup for web corpora: whitespace runs
    collapsed to single spaces + trim → lowercase → Unicode NFC
    (combining marks composed so visually-identical strings hash
    identically).  NFC runs LAST because Arrow's ``utf8_lower``
    decomposes precomposed characters (é → e + U+0301); composing
    afterwards restores the canonical form.  Order matches the SQL twin
    exactly: ``nfc_normalize(lower(trim(regexp_replace(text, '\\s+',
    ' ', 'g'))))``.

    Reference analog: the reference's regex label strip / string cleanup
    (experiments/utils.py:37) — here a batch transform so exact dedup and
    MinHash run over canonical text.  A ``map_batches`` body; compose as
    ``ds.map_batches(normalize_text, batch_format="pyarrow")``.
    """
    s = batch[text_col]
    if collapse_ws:
        s = pc.utf8_trim_whitespace(pc.replace_substring_regex(s, r"\s+", " "))
    if lowercase:
        s = pc.utf8_lower(s)
    if nfc:
        # pyarrow 16's pc.utf8_normalize(form="NFC") decomposes but does
        # NOT re-compose (e + U+0301 stays two codepoints — verified
        # against unicodedata), so the compose step runs through Python's
        # unicodedata — but ONLY for non-ASCII rows (byte length ≠ char
        # length); the overwhelmingly-ASCII corpus path stays Arrow-only.
        import unicodedata

        arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        non_ascii = pc.not_equal(pc.binary_length(arr), pc.utf8_length(arr))
        if pc.any(non_ascii).as_py():
            vals = arr.to_pylist()
            mask = non_ascii.to_pylist()
            fixed = [
                unicodedata.normalize("NFC", v) if (m and v is not None) else v
                for v, m in zip(vals, mask)
            ]
            arr = pa.array(fixed, type=arr.type)
        s = arr
    return batch.append_column(out_col, s)


# ---------------------------------------------------------------------------
# TF-IDF salient terms (corpus-statistics feature extraction)
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Top-``k`` TF-IDF terms per document: ``tfidf = tf · ln(N/df)`` with
    ``tf`` the in-document token count, ``df`` the number of documents
    containing the token, ``N`` the corpus document count.  Ties rank by
    token ascending (row_number semantics).

    Two genuinely required exchanges, both partial-combined:

    1. tf is FINAL per batch (a document's text is one row, so its token
       counts complete inside the batch — one vectorized explode +
       group_by); only (doc, token, tf) rows shuffle by hash(token);
    2. df is a per-partition row count per token (each (doc, token) row is
       already distinct), scored in place — the idf lookup is a same-
       partition merge, never a broadcast of a corpus-wide dictionary;
    3. the scored rows re-shuffle by hash(doc) for the per-doc top-k rank.

    Tokenization matches ``top_tokens`` (and the SQL twin):
    ``string_split(trim(text), ' ')``, empties dropped.

    ``n_docs``: pass the corpus size if known; otherwise one extra
    ``ds.count()`` pass runs first (metadata-only on parquet sources).
    """
    if n_docs is None:
        n_docs = ds.count()
    n_docs = float(n_docs)

    from .rollup import _stable_pkey

    def tf_partial(t: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), lens.astype(np.int64)
        )
        flat = pc.list_flatten(toks_list)
        keep = pc.not_equal(flat, "")
        pairs = pa.table({id_col: pa.array(ids), "token": flat}).filter(keep)
        out = pairs.group_by([id_col, "token"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        out = out.rename_columns([id_col, "token", "tf"])
        return out.append_column("_pkey", _stable_pkey(out["token"], num_partitions))

    def df_score(df: pd.DataFrame) -> pd.DataFrame:
        # every (doc, token) row is distinct and the token's rows are
        # complete in this partition → df = group size; idf merged in place
        dfreq = df.groupby("token", sort=False)["tf"].transform("size")
        df = df.drop(columns=["_pkey"]).copy()
        df["tfidf"] = df["tf"].to_numpy(dtype=np.float64) * np.log(
            n_docs / dfreq.to_numpy(dtype=np.float64)
        )
        return df

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [id_col, "tfidf", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        df["rank"] = df.groupby(id_col, sort=False).cumcount() + 1
        return df[df["rank"] <= k].reset_index(drop=True)

    scored = (
        ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(df_score, batch_format="pandas")
    )

    def add_doc_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[id_col], num_partitions))

    return (
        scored.map_batches(add_doc_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(rank_partition, batch_format="pandas")
    )


def token_entropy(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "token_entropy",
) -> Dataset:
    """Per-document unigram (token) Shannon entropy in nats — the
    repetition/diversity quality signal LLM corpus filters pair with
    length and stopword ratios (low entropy ⇒ boilerplate / keyword spam;
    the Gopher-rules class of heuristics).  Counts the same whitespace
    tokens as ``top_tokens``/``tfidf_top_terms``:
    ``string_split(trim(text), ' ')`` with empty tokens dropped.

    Pure per-batch kernel (a document's text is one row, so its token
    histogram completes inside the batch — no shuffle): one vectorized
    explode, one pyarrow ``group_by`` per (doc, token), one per-doc
    reduction of ``H = ln(n) − Σ c·ln(c) / n``.  Zero-token documents get
    ``n_tokens 0`` and NULL entropy.

    Output: one row per document — ``id_col, n_tokens, out_col``.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        ids_in = t[id_col]
        toks_list = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(ids_in.to_numpy(zero_copy_only=False), lens.astype(np.int64))
        toks = toks_list.combine_chunks().flatten() if isinstance(
            toks_list, pa.ChunkedArray) else toks_list.flatten()
        exploded = pa.table({"_id": pa.array(ids, ids_in.type), "_tok": toks})
        exploded = exploded.filter(pc.not_equal(exploded["_tok"], ""))
        counts = exploded.group_by(["_id", "_tok"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        c = counts["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        gid_vals = counts["_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gid_vals, return_inverse=True)
        k = len(uniq)
        n = np.bincount(inv, weights=c, minlength=k)
        clogc = np.bincount(inv, weights=c * np.log(c), minlength=k)
        ent = np.log(n) - clogc / n  # n >= 1 by construction here
        # align back to every input document (0-token docs -> 0 / NULL);
        # np.unique returns sorted uniques, so searchsorted is an exact
        # vectorized lookup
        ids_full = ids_in.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uniq, ids_full)
        pos = np.clip(pos, 0, max(k - 1, 0))
        hit = (k > 0) & (uniq[pos] == ids_full)
        n_out = np.zeros(t.num_rows, dtype=np.int64)
        n_out[hit] = n[pos[hit]].astype(np.int64)
        e_out = np.full(t.num_rows, np.nan)
        e_out[hit] = ent[pos[hit]]
        return pa.table({
            id_col: ids_in,
            "n_tokens": pa.array(n_out),
            out_col: pa.array(e_out),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def explode_tokens(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
) -> Dataset:
    """Explode documents to one row per token (``id_col, token_col``) —
    the long form feeding token-level aggregates (heavy_hitters,
    external joins against vocabularies).  Same tokenization as
    ``top_tokens``/``tfidf_top_terms``/``token_entropy``:
    ``string_split(trim(text), ' ')`` with empty tokens dropped.
    Vectorized split + flatten per batch, no shuffle; output is larger
    than the input (one row per token) — follow with a combining
    aggregate, never a full materialize.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False),
                        lens.astype(np.int64))
        toks = toks_list.combine_chunks().flatten() if isinstance(
            toks_list, pa.ChunkedArray) else toks_list.flatten()
        out = pa.table({id_col: pa.array(ids, t[id_col].type), token_col: toks})
        return out.filter(pc.not_equal(out[token_col], ""))

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def bm25_score(
    ds: Dataset,
    *,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "bm25",
) -> Dataset:
    """BM25 relevance of every document to a bag of query terms — the
    classical lexical retrieval scorer (Robertson/Sparck Jones; the
    Lucene ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` variant), the
    first-stage ranker of retrieval/RAG data pipelines.

    Two passes, both combiner-shaped:

    1. STATS: each batch reduces to ≤ |query| + 1 rows — per-term
       document frequencies and a (docs, token-length) sum — merged to a
       tiny table the driver folds into the scoring closure (a broadcast
       of |query| floats, the canonical small-side pattern);
    2. SCORE: one vectorized pass — per batch, term counts come from one
       ``is_in``-filtered explode + group_by; only documents containing
       at least one query term are emitted.

    Tokenization matches the corpus ops (``string_split(trim(text), ' ')``,
    empties dropped).  Output: ``id_col, score_col`` (float64).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    term_set = pa.array(terms, pa.string())

    def _explode(t: pa.Table):
        toks_list = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False),
                        lens.astype(np.int64))
        toks = toks_list.combine_chunks().flatten() if isinstance(
            toks_list, pa.ChunkedArray) else toks_list.flatten()
        keep = pc.not_equal(toks, "")
        return (pa.table({"_id": pa.array(ids, t[id_col].type), "_tok": toks})
                .filter(keep))

    def stats_partial(t: pa.Table) -> pa.Table:
        ex = _explode(t)
        hits = ex.filter(pc.is_in(ex["_tok"], value_set=term_set))
        # df partial: distinct docs per term within this batch
        dfreq = (hits.group_by(["_tok", "_id"], use_threads=False)
                 .aggregate([]).group_by(["_tok"], use_threads=False)
                 .aggregate([([], "count_all")]))
        out = pa.table({
            "term": dfreq["_tok"],
            "df": pc.cast(dfreq["count_all"], pa.int64()),
            "n_docs": pa.array(np.zeros(dfreq.num_rows, dtype=np.int64)),
            "dl_sum": pa.array(np.zeros(dfreq.num_rows, dtype=np.int64)),
        })
        tot = pa.table({
            "term": pa.array([""], pa.string()),
            "df": pa.array([0], pa.int64()),
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "dl_sum": pa.array([int(ex.num_rows)], pa.int64()),
        })
        return pa.concat_tables([out, tot])

    # tiny: ≤ (|terms|+1) rows per batch; merge on the driver (the stats
    # table is the |query|-float broadcast side, never the corpus)
    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("term").sum(["df", "n_docs", "dl_sum"])
        .take_all()
    )
    n_docs = sum(r["sum(n_docs)"] for r in stats)
    dl_sum = sum(r["sum(dl_sum)"] for r in stats)
    avgdl = (dl_sum / n_docs) if n_docs else 0.0
    df_map = {r["term"]: r["sum(df)"] for r in stats if r["term"]}
    idf = {
        t: float(np.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5)
                        / (df_map.get(t, 0) + 0.5)))
        for t in terms
    }

    def score(t: pa.Table) -> pa.Table:
        ex = _explode(t)
        # per-doc token length (over ALL tokens) for the length norm
        dl_tbl = ex.group_by(["_id"], use_threads=False).aggregate(
            [([], "count_all")])
        dl_ids = dl_tbl["_id"].to_numpy(zero_copy_only=False)
        dl_n = dl_tbl["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        hits = ex.filter(pc.is_in(ex["_tok"], value_set=term_set))
        if hits.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t[id_col].type),
                score_col: pa.array([], pa.float64()),
            })
        tf_tbl = hits.group_by(["_id", "_tok"], use_threads=False).aggregate(
            [([], "count_all")])
        ids = tf_tbl["_id"].to_numpy(zero_copy_only=False)
        tf = tf_tbl["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        toks = tf_tbl["_tok"].to_numpy(zero_copy_only=False)
        # align dl to tf rows (both come from the same batch's docs)
        order = np.argsort(dl_ids, kind="stable")
        pos = np.searchsorted(dl_ids[order], ids)
        dl = dl_n[order][pos]
        terms_np = np.array(terms, dtype=object)
        idf_vals = np.array([idf[x] for x in terms])  # |query| floats
        idf_arr = idf_vals[np.searchsorted(terms_np, toks)]
        contrib = idf_arr * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl))
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.bincount(inv, weights=contrib, minlength=len(uniq))
        return pa.table({
            id_col: pa.array(uniq, t[id_col].type),
            score_col: pa.array(scores),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


#: GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead):
#: contractions, space-prefixed letter runs, digit runs, punctuation
#: runs.  Pure-whitespace tails are uncounted (the lookahead branch of
#: the original pattern), which only affects trailing-space documents.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "n_tokens_bpe"
) -> pa.Table:
    """Append a subword-style token count: matches of the GPT-2-ish
    pre-tokenizer regex — the standard first-order estimate of LLM token
    cost, finer than whitespace ``n_tokens`` (punctuation and number
    runs count separately, contractions split).  Vectorized RE2 kernel
    (``count_substring_regex``); DuckDB's regex engine is RE2 too, so
    the SQL twin (``len(regexp_extract_all(...))``) is EXACT, not
    approximate."""
    n = pc.cast(pc.count_substring_regex(batch[text_col], BPE_ISH_PATTERN),
                pa.int64())
    return batch.append_column(out_col, n)


def top_bigrams(
    ds: "Dataset",
    *,
    text_col: str = "text",
    k: int = 20,
    num_partitions: int = 64,
) -> "Dataset":
    """Corpus-wide BIGRAM frequencies, top-``k`` by count (ties: bigram
    asc) — the n=2 step of n-gram LM statistics / collocation mining
    over a training corpus (the pairwise sibling of :func:`top_tokens`).

    Adjacency is defined on the raw single-space split positions of each
    document (pairs never cross documents); a pair is kept only when
    BOTH tokens are non-empty, so runs of spaces break adjacency rather
    than bridging it — matching the SQL twin's position self-join.

    Fully vectorized combiner: split → per-chunk offsets mark document
    boundaries → one ``binary_join_element_wise`` builds every in-doc
    pair → ``value_counts`` pre-aggregates the batch; the shuffle
    carries per-batch distinct (bigram, n) rows, merged by the same
    token-hash partition sum as word count.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        parts = []
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray) else [toks]):
            vals = ch.flatten()
            nv = len(vals)
            if nv < 2:
                continue
            lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
            first = vals.slice(0, nv - 1)
            second = vals.slice(1, nv - 1)
            pair_ok = np.ones(nv - 1, dtype=bool)
            ends = np.cumsum(lengths)[:-1] - 1  # last-token index per doc
            pair_ok[ends[ends < nv - 1]] = False
            pair_ok &= pc.not_equal(first, "").to_numpy(zero_copy_only=False)
            pair_ok &= pc.not_equal(second, "").to_numpy(zero_copy_only=False)
            if not pair_ok.any():
                continue
            big = pc.binary_join_element_wise(first, second, " ")
            parts.append(big.filter(pa.array(pair_ok)))
        if not parts:
            return empty
        vc = pa.chunked_array(parts).combine_chunks().value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = _grouped_min(partials, group_cols=["bigram"],
                          agg_cols=[("n", "sum")], pkey_col="bigram",
                          num_partitions=num_partitions)
    return merged.sort(["n", "bigram"], descending=[True, False]).limit(k)


def zipf_slope(
    ds: "Dataset",
    *,
    text_col: str = "text",
    top_n: int = 100,
    num_partitions: int = 64,
) -> "Dataset":
    """Zipf exponent of the corpus: OLS slope of ``ln(count)`` on
    ``ln(rank)`` over the ``top_n`` most frequent tokens (rank 1 = most
    frequent; ties broken token-asc so the ranking is deterministic).
    Natural corpora sit near −1; a far-off slope is a cheap corpus-
    health red flag (template spam ≫ −1, shuffled noise ≈ 0).

    Dataflow: the :func:`top_tokens` combiner does the heavy lift; the
    fit runs once over ``top_n`` rows in a single tiny final partition
    (re-sorted there so rank assignment never depends on block order).
    Output: one row — ``n_tokens, zipf_slope`` (slope = covar_pop/var_pop,
    the SQL ``regr_slope`` definition; NULL when fewer than 2 tokens).
    """

    top = top_tokens(ds, text_col=text_col, k=top_n,
                     num_partitions=num_partitions)

    def fit(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
        cnt = df["n"].to_numpy(dtype=np.float64)
        m = len(cnt)
        if m < 2:
            return pd.DataFrame({"n_tokens": pd.Series([m], dtype="int64"),
                                 "zipf_slope": [np.nan]})
        x = np.log(np.arange(1, m + 1, dtype=np.float64))
        y = np.log(cnt)
        n = float(m)
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        return pd.DataFrame({"n_tokens": pd.Series([m], dtype="int64"),
                             "zipf_slope": [slope if np.isfinite(slope) else np.nan]})

    return top.repartition(1).map_batches(fit, batch_format="pandas",
                                          batch_size=None)


def js_divergence(
    ds: "Dataset",
    *,
    text_col: str = "text",
    side_col: str = "source",
    side_a: str = "src0",
    side_b: str = "src1",
    num_partitions: int = 64,
) -> "Dataset":
    """Jensen–Shannon divergence between the token distributions of two
    corpus slices — the standard bounded (0..ln 2) symmetric "how
    different are these two sources / snapshots" number, the
    distribution-drift check an LLM-corpus pipeline runs between crawls
    or between a source and the blend.

    Combiner dataflow: (1) a tiny per-side token-total pass (2 scalars,
    closure-broadcast); (2) per-batch (token, n_a, n_b) count partials →
    one token-hash exchange merges them — distinct tokens cross the
    shuffle, never token instances; (3) per-token contributions are one
    vectorized log kernel, summed in a single final partition.  Rows of
    other sides are dropped before tokenizing.  Output: one row —
    ``n_tokens`` (union vocabulary size), ``js_div``.
    """
    from .dedup import _grouped_min

    def _tokens(t: pa.Table, side: str) -> pa.Array:
        sub = t.filter(pc.equal(t[side_col], side))
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_trim(sub[text_col], " "), " "))
        return toks.filter(pc.not_equal(toks, ""))

    # pass 1: per-side instance totals (the denominators)
    def totals(t: pa.Table) -> pa.Table:
        return pa.table({
            "side": pa.array(["a", "b"]),
            "n": pa.array([len(_tokens(t, side_a)), len(_tokens(t, side_b))],
                          pa.int64()),
        })

    tot = (
        ds.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(
            lambda df: df.groupby("side", sort=True)["n"].sum().reset_index(),
            batch_format="pandas", batch_size=None)
        .take_all()  # 2 tiny rows — the broadcast small side
    )
    ta = next(r["n"] for r in tot if r["side"] == "a")
    tb = next(r["n"] for r in tot if r["side"] == "b")

    # pass 2: per-token counts, merged by token hash
    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for name, side in (("n_a", side_a), ("n_b", side_b)):
            toks = _tokens(t, side)
            if len(toks) == 0:
                continue
            vc = toks.value_counts()
            frames.append(pa.table({
                "token": vc.field("values"),
                "n_a": pc.cast(vc.field("counts") if name == "n_a"
                               else pa.nulls(len(vc), pa.int64()), pa.int64()),
                "n_b": pc.cast(vc.field("counts") if name == "n_b"
                               else pa.nulls(len(vc), pa.int64()), pa.int64()),
            }))
        if not frames:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64())})
        out = pa.concat_tables(frames)
        return pa.table({
            "token": out["token"],
            "n_a": pc.coalesce(out["n_a"], pa.scalar(0, pa.int64())),
            "n_b": pc.coalesce(out["n_b"], pa.scalar(0, pa.int64())),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = _grouped_min(partials, group_cols=["token"],
                          agg_cols=[("n_a", "sum"), ("n_b", "sum")],
                          pkey_col="token", num_partitions=num_partitions)

    def contrib(t: pa.Table) -> pa.Table:
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = na / ta
        q = nb / tb
        m = p + q
        with np.errstate(invalid="ignore", divide="ignore"):
            term = (np.where(p > 0, 0.5 * p * np.log(2.0 * p / m), 0.0)
                    + np.where(q > 0, 0.5 * q * np.log(2.0 * q / m), 0.0))
        return pa.table({"n_tokens": pa.array([len(na)], pa.int64()),
                         "js_part": pa.array([float(term.sum())])})

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame({
            "n_tokens": pd.Series([int(df["n_tokens"].sum())], dtype="int64"),
            "js_div": [float(df["js_part"].sum())],
        })

    return (
        merged.map_batches(contrib, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None)
    )


def vocab_stats(
    ds: "Dataset",
    *,
    text_col: str = "text",
    num_partitions: int = 64,
) -> "Dataset":
    """Corpus vocabulary health summary: total token instances,
    vocabulary size, hapax legomena count (tokens appearing exactly
    once), type-token ratio and hapax ratio — the two classic one-number
    checks for template spam (TTR → 0, hapax → 0) vs noise (both → 1)
    in an LLM training corpus.

    Dataflow: the word-count combiner (per-batch distinct (token, n)
    partials → one token-hash exchange) feeds per-partition scalar
    partials ``(instances, vocab, hapax)``; one tiny final sum.  Ratios
    are single exact-int divisions.  Output: one row —
    ``n_instances, n_vocab, n_hapax, type_token_ratio, hapax_ratio``.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_trim(t[text_col], " "), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    merged = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        group_cols=["token"], agg_cols=[("n", "sum")], pkey_col="token",
        num_partitions=num_partitions)

    def part_stats(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_inst": pa.array([int(n.sum())], pa.int64()),
            "_vocab": pa.array([len(n)], pa.int64()),
            "_hapax": pa.array([int((n == 1).sum())], pa.int64()),
        })

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        inst = int(df["_inst"].sum())
        vocab = int(df["_vocab"].sum())
        hapax = int(df["_hapax"].sum())
        return pd.DataFrame({
            "n_instances": pd.Series([inst], dtype="int64"),
            "n_vocab": pd.Series([vocab], dtype="int64"),
            "n_hapax": pd.Series([hapax], dtype="int64"),
            "type_token_ratio": [vocab / inst if inst else np.nan],
            "hapax_ratio": [hapax / vocab if vocab else np.nan],
        })

    return (
        merged.map_batches(part_stats, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None)
    )


def pack_sequences(
    ds: "Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_partitions: int = 64,
) -> "Dataset":
    """Greedy sample packing: assign documents to fixed-token-budget bins
    (first-fit-decreasing) — the packing step that turns chunked
    documents into dense fixed-length training samples (wasted pad
    tokens are wasted FLOPs at 100 TB).  Token counts are whitespace
    tokens (the engine's standard split).

    Packing is PARTITION-LOCAL by design — exactly how production
    pipelines do it (bins never span shards, so packing parallelizes
    embarrassingly and a resumed run repacks only its own shard).  Bin
    ids are globally unique: ``partition_id << 40 | local_bin``.
    Documents longer than the budget get a dedicated bin, flagged
    ``oversize=True`` (truncation policy is the caller's — compose with
    chunk_words upstream to pre-split).

    The FFD loop is per-partition Python over DOC rows (not tokens) —
    bounded by the block's row count and dwarfed by the tokenize cost;
    documented trade-off, the assignment is inherently sequential.
    Output: ``id_col, n_tokens, bin_id, oversize``.
    """
    from .rollup import _stable_pkey

    def tokenize(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(t[text_col], " ")
        toks = pc.split_pattern(trimmed, " ")
        flat_n = pc.list_value_length(toks)
        # empty docs tokenize to [''] — count real tokens only
        n_empty = pc.cast(pc.equal(trimmed, ""), pa.int64())
        n = pc.subtract(pc.cast(flat_n, pa.int64()), n_empty)
        out = pa.table({id_col: t[id_col], "n_tokens": n})
        return out.append_column(
            "_pkey", _stable_pkey(out[id_col], num_partitions))

    def pack_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({id_col: [], "n_tokens": pd.Series([], dtype="int64"),
                                 "bin_id": pd.Series([], dtype="int64"),
                                 "oversize": pd.Series([], dtype="bool")})
        pkey = int(df["_pkey"].iloc[0])
        df = df.drop(columns=["_pkey"]).sort_values(
            ["n_tokens", id_col], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        sizes = df["n_tokens"].to_numpy(dtype=np.int64)
        bins_free: list[int] = []
        assign = np.empty(len(df), dtype=np.int64)
        oversize = sizes > budget
        for i, sz in enumerate(sizes):
            if sz > budget:
                assign[i] = len(bins_free)
                bins_free.append(0)  # dedicated, full
                continue
            # first fit over open bins (linear scan; fine for block-sized
            # partitions — see docstring)
            for b, free in enumerate(bins_free):
                if free >= sz:
                    assign[i] = b
                    bins_free[b] = free - sz
                    break
            else:
                assign[i] = len(bins_free)
                bins_free.append(budget - sz)
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": sizes,
            "bin_id": (np.int64(pkey) << np.int64(40)) | assign,
            "oversize": oversize,
        })

    tagged = ds.map_batches(tokenize, batch_format="pyarrow",
                            zero_copy_batch=True)
    return tagged.groupby("_pkey").map_groups(pack_partition,
                                              batch_format="pandas")


def doc_top_bigram(
    ds: "Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "Dataset":
    """Per-document most-frequent word bigram and the fraction of the
    document's characters it covers — the Gopher-style repetition signal
    ("top n-gram character fraction") used to score LLM training text
    for degenerate repetition; the per-doc sibling of the corpus-level
    :func:`top_bigrams`.

    Tokenization is identical to :func:`top_bigrams` (single-space split
    of trimmed text, pairs skip empty tokens and never cross documents).
    Tie-break: highest count, then lexicographically smallest bigram.
    Documents with no valid bigram (fewer than two non-empty adjacent
    tokens) emit no row — the SQL twin's pair join produces nothing to
    group.

    Completely shuffle-free: every statistic is document-local, so each
    batch finishes its own rows (map-only at any corpus size).  Output:
    ``doc_id, top_bigram, n_occ, rep_frac`` where
    ``rep_frac = n_occ · length(top_bigram) / length(text)``.
    """

    def batch(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], t.schema.field(id_col).type),
            "top_bigram": pa.array([], pa.string()),
            "n_occ": pa.array([], pa.int64()),
            "rep_frac": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        ch = toks.chunk(0) if isinstance(toks, pa.ChunkedArray) else toks
        vals = ch.flatten()
        nv = len(vals)
        if nv < 2:
            return empty
        lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
        tok_doc = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        first = vals.slice(0, nv - 1)
        second = vals.slice(1, nv - 1)
        pair_ok = np.ones(nv - 1, dtype=bool)
        ends = np.cumsum(lengths)[:-1] - 1
        pair_ok[ends[ends < nv - 1]] = False
        pair_ok &= pc.not_equal(first, "").to_numpy(zero_copy_only=False)
        pair_ok &= pc.not_equal(second, "").to_numpy(zero_copy_only=False)
        if not pair_ok.any():
            return empty
        big = pc.binary_join_element_wise(first, second, " ").filter(
            pa.array(pair_ok))
        pair_doc = tok_doc[:-1][pair_ok] if len(tok_doc) > 1 else tok_doc[:0]
        df = pd.DataFrame({"_doc": pair_doc, "_bigram": big.to_pandas()})
        cnt = df.groupby(["_doc", "_bigram"], sort=False).size() \
                .reset_index(name="n_occ")
        cnt = cnt.sort_values(["_doc", "n_occ", "_bigram"],
                              ascending=[True, False, True], kind="mergesort")
        top = cnt.drop_duplicates("_doc")
        doc_idx = top["_doc"].to_numpy()
        ids = t[id_col].take(pa.array(doc_idx))
        text_len = pc.utf8_length(t[text_col]).take(pa.array(doc_idx)) \
                     .to_numpy(zero_copy_only=False).astype(np.float64)
        bigram = top["_bigram"].to_numpy(dtype=object)
        n_occ = top["n_occ"].to_numpy(dtype=np.int64)
        blen = np.array([len(s) for s in bigram], dtype=np.float64)
        return pa.table({
            id_col: ids,
            "top_bigram": pa.array(bigram, pa.string()),
            "n_occ": pa.array(n_occ, pa.int64()),
            "rep_frac": pa.array(n_occ * blen / text_len, pa.float64()),
        })

    return ds.map_batches(batch, batch_format="pyarrow", zero_copy_batch=True)


def lexical_diversity(
    ds: "Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "Dataset":
    """Per-document lexical-diversity signals: token count, distinct
    token (type) count, type–token ratio, and hapax-legomenon ratio
    (share of tokens occurring exactly once) — the vocabulary-richness
    class of corpus-quality heuristics, complementing
    :func:`token_entropy`.  Same whitespace tokenization as the other
    token ops (``string_split(trim(text), ' ')``, empties dropped).

    Pure per-batch kernel, no shuffle: a document's histogram completes
    inside its batch.  Zero-token documents get zero counts and NULL
    ratios (SQL ``x/0 → NULL``).

    Output: ``id_col, n_tokens, n_types, type_token_ratio, hapax_ratio``.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        ids_in = t[id_col]
        toks_list = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        ids = np.repeat(ids_in.to_numpy(zero_copy_only=False),
                        lens.astype(np.int64))
        toks = toks_list.combine_chunks().flatten() if isinstance(
            toks_list, pa.ChunkedArray) else toks_list.flatten()
        exploded = pa.table({"_id": pa.array(ids, ids_in.type), "_tok": toks})
        exploded = exploded.filter(pc.not_equal(exploded["_tok"], ""))
        counts = exploded.group_by(["_id", "_tok"], use_threads=False) \
                         .aggregate([([], "count_all")])
        c = counts["count_all"].to_numpy(zero_copy_only=False) \
                               .astype(np.int64)
        gid_vals = counts["_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gid_vals, return_inverse=True)
        k = len(uniq)
        n_tok = np.bincount(inv, weights=c.astype(np.float64), minlength=k) \
                  .astype(np.int64)
        n_typ = np.bincount(inv, minlength=k)
        n_hap = np.bincount(inv[c == 1], minlength=k)

        ids_full = ids_in.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uniq, ids_full)
        pos = np.clip(pos, 0, max(k - 1, 0))
        hit = (k > 0) & (uniq[pos] == ids_full)
        nt = np.zeros(t.num_rows, dtype=np.int64)
        ny = np.zeros(t.num_rows, dtype=np.int64)
        nh = np.zeros(t.num_rows, dtype=np.int64)
        nt[hit] = n_tok[pos[hit]]
        ny[hit] = n_typ[pos[hit]]
        nh[hit] = n_hap[pos[hit]]
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.where(nt > 0, ny / np.maximum(nt, 1).astype(np.float64),
                           np.nan)
            hr = np.where(nt > 0, nh / np.maximum(nt, 1).astype(np.float64),
                          np.nan)
        return pa.table({
            id_col: ids_in,
            "n_tokens": pa.array(nt),
            "n_types": pa.array(ny),
            "type_token_ratio": pa.array(ttr),
            "hapax_ratio": pa.array(hr),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def ngram_contamination(
    ds: "Dataset",
    *,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 64,
) -> "Dataset":
    """Pairwise token-TRIGRAM contamination between corpus groups — the
    train/test-leakage check every LLM data pipeline runs before a split
    ships: for every pair of groups (sources, splits, snapshot dates),
    how many distinct trigrams they share, as an overlap coefficient
    (|A∩B| / min(|A|,|B|)) and Jaccard (|A∩B| / |A∪B|).

    Dataflow (100-TB shape): the batch combiner builds in-doc trigrams
    exactly like :func:`top_bigrams` (single-space positions, all three
    tokens non-empty) and pre-dedupes (group, gram) per batch, so the
    ONE exchange — hash-partitioned by gram — carries distinct pairs
    only.  Each gram partition then expands its ≤|groups| source set
    into pairs locally (bounded by |groups|²; this operator assumes the
    group cardinality is modest — splits/sources, not user ids) and
    pre-sums, so the final exchange carries |groups|² counter rows per
    partition.  Group sizes ride the same stream as self-pairs
    (source_a == source_b), never a second corpus scan.
    Output: ``source_a, source_b, n_shared, overlap_coef, jaccard``
    for source_a < source_b, sorted.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string()),
                          "gram": pa.array([], pa.string())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        groups = t[group_col].combine_chunks() if isinstance(
            t[group_col], pa.ChunkedArray) else t[group_col]
        parts = []
        row_off = 0
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray) else [toks]):
            lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
            ndocs = len(lengths)
            grp = np.asarray(groups.slice(row_off, ndocs).to_pylist(),
                             dtype=object)
            row_off += ndocs
            vals = ch.flatten()
            nv = len(vals)
            if nv < 3:
                continue
            doc_of = np.repeat(np.arange(ndocs), lengths)
            t1 = vals.slice(0, nv - 2)
            t2 = vals.slice(1, nv - 2)
            t3 = vals.slice(2, nv - 2)
            ok = doc_of[: nv - 2] == doc_of[2:nv]
            ok &= pc.not_equal(t1, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t2, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t3, "").to_numpy(zero_copy_only=False)
            if not ok.any():
                continue
            okm = pa.array(ok)
            gram = pc.binary_join_element_wise(t1, t2, t3, " ").filter(okm)
            g = pa.array(grp[doc_of[: nv - 2][ok]], pa.string())
            parts.append(pa.table({"g": g, "gram": gram}))
        if not parts:
            return empty
        batch = pa.concat_tables(parts).combine_chunks()
        return batch.group_by(["g", "gram"], use_threads=False).aggregate([])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t["gram"], num_partitions))

    def pairs_body(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"source_a": pd.Series([], dtype=object),
                              "source_b": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64")})
        df = df.drop(columns=["_pkey"]).drop_duplicates(["g", "gram"])
        if len(df) == 0:
            return empty
        # per-group distinct-gram sizes ride as self-pairs
        sz = df.groupby("g", sort=False).size()
        size_rows = pd.DataFrame({"source_a": sz.index.to_numpy(dtype=object),
                                  "source_b": sz.index.to_numpy(dtype=object),
                                  "n": sz.to_numpy(dtype=np.int64)})
        df = df.sort_values(["gram", "g"], kind="mergesort").reset_index(drop=True)
        gram = df["gram"].to_numpy()
        grp = df["g"].to_numpy()
        m = len(df)
        change = np.flatnonzero(gram[1:] != gram[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends_all = np.concatenate([change, [m]])
        gidx = np.zeros(m, dtype=np.int64)
        gidx[change] = 1
        gidx = np.cumsum(gidx)
        reps = ends_all[gidx] - np.arange(m) - 1
        total = int(reps.sum())
        if total == 0:
            return pd.concat([size_rows, empty], ignore_index=True)
        a_idx = np.repeat(np.arange(m), reps)
        cum = np.concatenate([[0], np.cumsum(reps)])
        b_idx = np.arange(total) - cum[a_idx] + a_idx + 1
        pairs = pd.DataFrame({"source_a": grp[a_idx], "source_b": grp[b_idx]})
        cnt = pairs.groupby(["source_a", "source_b"], sort=False).size()
        pair_rows = cnt.reset_index(name="n")
        pair_rows["n"] = pair_rows["n"].astype(np.int64)
        return pd.concat([size_rows, pair_rows], ignore_index=True)

    tagged = partials.map_batches(add_pkey, batch_format="pyarrow")
    counts = tagged.groupby("_pkey").map_groups(pairs_body,
                                                batch_format="pandas")
    merged = _grouped_min(counts, group_cols=["source_a", "source_b"],
                          agg_cols=[("n", "sum")], pkey_col="source_a",
                          num_partitions=8)

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        sizes = df[df["source_a"] == df["source_b"]].set_index("source_a")["n"]
        pairs = df[df["source_a"] != df["source_b"]].sort_values(
            ["source_a", "source_b"], kind="mergesort").reset_index(drop=True)
        na = sizes.reindex(pairs["source_a"]).to_numpy(dtype=np.float64)
        nb = sizes.reindex(pairs["source_b"]).to_numpy(dtype=np.float64)
        inter = pairs["n"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "source_a": pairs["source_a"],
            "source_b": pairs["source_b"],
            "n_shared": pairs["n"].astype(np.int64),
            "overlap_coef": inter / np.minimum(na, nb),
            "jaccard": inter / (na + nb - inter),
        })

    return merged.repartition(1).map_batches(fin, batch_format="pandas",
                                             batch_size=None)


def compressibility(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> Dataset:
    """Per-document zlib compressibility — the classic cheap redundancy
    signal for LLM-corpus curation (boilerplate, template spam and
    generation loops compress far below natural prose; near-random
    noise compresses above 1.0).  ``ratio = deflate_len / raw_len``
    (NULL for empty docs).

    Deterministic (fixed zlib level, no dictionary), so thresholds are
    reproducible across runs and machines; shuffle-free and streaming —
    the per-doc C deflate call is the work, exactly like the md5 path
    of the hash-split ops (no Arrow kernel exists; the loop is a C call
    per row, not Python arithmetic).  Pairs with
    :func:`~.dedup.dup_rate_by_group` (exact redundancy ACROSS docs)
    by measuring redundancy WITHIN each doc.

    Reference analog: the waveform normalization/compression the
    reference applies before windowing (data.py:163-176) — here as a
    quality feature rather than a storage step.
    Output: ``{id_col}, raw_len, gz_len, ratio``.
    """
    import zlib

    def body(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].astype(str)
        raw = texts.str.encode("utf-8")
        raw_len = raw.str.len().to_numpy(dtype=np.int64)
        gz_len = np.fromiter(
            (len(zlib.compress(b, level)) for b in raw),
            dtype=np.int64, count=len(raw))
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(raw_len > 0, gz_len / raw_len, np.nan)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "raw_len": raw_len,
            "gz_len": gz_len,
            "ratio": ratio,
        })

    return ds.map_batches(body, batch_format="pandas")


def charlm_logloss(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_denom: float = 256.0,
) -> Dataset:
    """Per-document average negative log-likelihood under a corpus-wide
    character-bigram model with add-one smoothing — the classic cheap
    perplexity proxy for quality filtering (gibberish and
    wrong-language text score far above in-distribution prose).

        p(c₂|c₁) = (n(c₁c₂) + 1) / (n(c₁·) + smooth_denom)
        score(doc) = −Σ ln p(cᵢ|cᵢ₋₁) / (len−1)

    Trained-model-scorer shape with an EXACT oracle: pass 1 fits the
    bigram table as a combiner (each batch folds to (c₁, c₂, n)
    partials — bounded by the observed character-pair vocabulary, the
    documented small-side assumption), the log-prob table broadcasts
    via ``ray.put``, and pass 2 scores each batch vectorized (codepoint
    pairs → searchsorted against the sorted pair index).  Docs shorter
    than 2 characters emit nothing (no bigram exists) — same rule as
    the SQL twin.

    Characters are Unicode CODEPOINTS (mirrors DuckDB ``substr``
    semantics, not bytes).  Reference analog: the trained-scaler →
    batch-score split of the reference experiments
    (keras_experiment.py:66-88 fit, 583-593 score).
    Output: ``{id_col}, n_bigrams, avg_logloss``.
    """
    import ray

    def _codepoints(s: str) -> np.ndarray:
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    def _pairs_of(df: pd.DataFrame):
        """(doc_index_per_pair, pair_code) over all docs in the batch."""
        texts = df[text_col].astype(str).tolist()
        cps = [_codepoints(t) for t in texts]
        lens = np.array([len(c) for c in cps], dtype=np.int64)
        keep = lens >= 2
        if not keep.any():
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        flat = np.concatenate(
            [c for c, k in zip(cps, keep) if k]).astype(np.int64)
        klens = lens[keep]
        # pair start p is valid iff p and p+1 lie in the same doc:
        # knock out the last-char position of every doc but the final one
        valid = np.ones(len(flat) - 1, dtype=bool)
        ends = np.cumsum(klens)[:-1]
        valid[ends - 1] = False
        offs = np.flatnonzero(valid)
        pair = flat[offs] * (1 << 21) + flat[offs + 1]
        # doc index per pair, aligned with ascending offs
        idx = np.repeat(np.arange(len(klens)), klens - 1)
        orig = np.flatnonzero(keep)[idx]
        return orig, pair

    def fit_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, pair = _pairs_of(df)
        if len(pair) == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        uniq, cnt = np.unique(pair, return_counts=True)
        return pd.DataFrame({"pair": uniq, "n": cnt.astype(np.int64)})

    fitted = ds.map_batches(fit_partial, batch_format="pandas").to_pandas()
    tbl = fitted.groupby("pair", sort=True)["n"].sum()
    pair_keys = tbl.index.to_numpy(dtype=np.int64)
    n12 = tbl.to_numpy(dtype=np.float64)
    c1 = pair_keys >> 21
    inv1 = np.unique(c1, return_inverse=True)[1]
    n1 = np.bincount(inv1, weights=n12)[inv1]
    logp = np.log((n12 + 1.0) / (n1 + smooth_denom))
    model = ray.put((pair_keys, logp))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        keys, lp = _ray.get(model)
        orig, pair = _pairs_of(df)
        if len(pair) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                "n_bigrams": pd.Series([], dtype="int64"),
                "avg_logloss": pd.Series([], dtype="float64")})
        pos = np.searchsorted(keys, pair)
        ll = lp[pos]  # every pair was seen in fit (same corpus)
        nb = np.bincount(orig, minlength=len(df)).astype(np.int64)
        ssum = np.bincount(orig, weights=ll, minlength=len(df))
        keep = nb >= 1
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = -ssum[keep] / nb[keep]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[keep],
            "n_bigrams": nb[keep],
            "avg_logloss": avg,
        })

    return ds.map_batches(score, batch_format="pandas")


def ppmi_word_vectors(
    ds: "Dataset",
    *,
    text_col: str = "text",
    vocab_size: int = 256,
    window: int = 2,
    dim: int = 16,
    num_partitions: int = 64,
) -> "Dataset":
    """Train static word embeddings FROM the corpus: positive-PMI
    co-occurrence factorization (the count-based word2vec equivalent —
    Levy & Goldberg 2014 showed skip-gram ≈ factorized shifted PMI).
    The engine's "derive features from the data" trainer for text, the
    lexical sibling of the embedding-side PCA: corpus → top-``vocab_size``
    vocabulary → symmetric ±``window`` co-occurrence counts → PPMI →
    eigendecomposition → ``dim``-d vectors.

    Scale shape: two combiner passes over the corpus (exact token counts
    partitioned BY TOKEN, so global top-V is exact; then sparse
    (i, j, n) co-occurrence partials bounded by V² per batch) and one
    driver-side eigh on the V×V PPMI matrix — the same driver-bounded
    contract as PCA's d×d moment matrix and k-means' k×d centroids.
    Counts are exact ints; eigenvectors are sign-fixed (largest-|entry|
    positive); pairwise cosines are invariant to the remaining
    degenerate-eigenspace rotation, which is what tests pin.

    Output: ``token (string), n (int64), vector (list<float64> of dim)``
    sorted by count desc / token asc.  No SQL twin (eigendecomposition);
    tests pin that tokens sharing contexts embed close and unrelated
    ones don't.
    """
    import ray.data

    from .dedup import _grouped_min

    # ---- pass 1: exact global top-V vocabulary ------------------------
    vocab_tbl = top_tokens(ds, text_col=text_col, k=vocab_size,
                           num_partitions=num_partitions).to_pandas()
    if len(vocab_tbl) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "token": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "vector": pd.Series([], dtype="object")}))
    vcounts = dict(zip(vocab_tbl["token"], vocab_tbl["n"]))
    vocab = np.sort(vocab_tbl["token"].to_numpy())
    v = len(vocab)

    # ---- pass 2: sparse symmetric co-occurrence partials --------------
    def cooc_part(t: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        dense = None
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
                   else [toks]):
            vals = ch.flatten()
            nv = len(vals)
            if nv < 2:
                continue
            arr = vals.to_numpy(zero_copy_only=False)
            lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
            doc_id = np.repeat(np.arange(len(lengths)), lengths)
            pos = np.searchsorted(vocab, arr)
            ok = (pos < v)
            ok &= vocab[np.minimum(pos, v - 1)] == arr
            for off in range(1, window + 1):
                if nv <= off:
                    break
                keep = (doc_id[off:] == doc_id[:-off]) \
                    & ok[off:] & ok[:-off]
                if not keep.any():
                    continue
                a = pos[:-off][keep]
                b = pos[off:][keep]
                flat = np.concatenate([a * v + b, b * v + a])
                d = np.bincount(flat, minlength=v * v)
                dense = d if dense is None else dense + d
        if dense is None:
            return empty
        nz = np.flatnonzero(dense)
        return pa.table({"i": pa.array((nz // v).astype(np.int64)),
                         "j": pa.array((nz % v).astype(np.int64)),
                         "n": pa.array(dense[nz].astype(np.int64))})

    cooc = (ds.map_batches(cooc_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(lambda df: df.groupby(["i", "j"], sort=True)["n"]
                         .sum().reset_index(),
                         batch_format="pandas", batch_size=None)
            .to_pandas())

    m = np.zeros((v, v))
    if len(cooc):
        m[cooc["i"].to_numpy(), cooc["j"].to_numpy()] = \
            cooc["n"].to_numpy(dtype=np.float64)

    # ---- driver: PPMI + eigendecomposition -----------------------------
    total = m.sum()
    if total <= 0:
        vecs = np.zeros((v, dim))
    else:
        r = m.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log((m * total) / (r[:, None] * r[None, :]))
        ppmi = np.where(np.isfinite(pmi), np.maximum(pmi, 0.0), 0.0)
        w, u = np.linalg.eigh(ppmi)
        order = np.argsort(w)[::-1][:dim]
        lam = np.maximum(w[order], 0.0)
        basis = u[:, order]
        # deterministic sign: largest-|entry| component positive
        flip = basis[np.abs(basis).argmax(axis=0), np.arange(len(order))] < 0
        basis = basis * np.where(flip, -1.0, 1.0)[None, :]
        vecs = basis * np.sqrt(lam)[None, :]
        if vecs.shape[1] < dim:
            vecs = np.pad(vecs, ((0, 0), (0, dim - vecs.shape[1])))

    out = pd.DataFrame({
        "token": vocab,
        "n": np.asarray([vcounts[t] for t in vocab], dtype=np.int64),
        "vector": [row for row in vecs],
    })
    out = out.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    return ray.data.from_pandas(out)


def boilerplate_segments(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_len: int = 8,
    min_docs: int = 3,
    k: int = 20,
    num_partitions: int = 64,
) -> Dataset:
    """Corpus-level boilerplate detection — the C4/RefinedWeb "repeated
    line" curation rule re-expressed for a columnar corpus: split every
    document into non-overlapping ``seg_len``-word segments
    (:func:`chunk_words` with stride == length), count the DISTINCT
    documents containing each exact segment, and surface segments that
    recur across ≥ ``min_docs`` documents — template headers, navigation
    chrome, license blurbs — as removal candidates.  Document frequency
    (not occurrence count) is the curation signal: a segment repeated
    100× inside ONE doc is repetition (:func:`dup_word_stats`'s job),
    the same segment across 100 docs is boilerplate.

    Scale shape: the segment explode is embarrassingly parallel; only
    (segment, doc_id) pairs cross ONE segment-hash exchange (pre-deduped
    per batch by the :func:`grouped_distinct_count` partial), and the
    final sort runs over the ≥ ``min_docs`` survivors only — at 100 TB
    this is the same dataflow as the MinHash band-bucket stage.  Exact
    integer counts, deterministic (n_docs desc, segment asc) top-k.

    Output: ``segment, n_docs (int64)`` — at most ``k`` rows.
    """
    from .distinct import grouped_distinct_count

    segs = chunk_words(ds, id_col=id_col, text_col=text_col,
                       chunk_len=seg_len, stride=seg_len)
    counts = grouped_distinct_count(
        segs, keys=["chunk_text"], member_col=id_col,
        out_col="n_docs", num_partitions=num_partitions)

    def flt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_docs"], min_docs))
        return pa.table({"segment": t["chunk_text"], "n_docs": t["n_docs"]})

    return (counts.map_batches(flt, batch_format="pyarrow")
            .sort(["n_docs", "segment"], descending=[True, False])
            .limit(k))


def flesch_readability(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Flesch reading-ease score per document from three RE2 counts —
    the classic surface-form quality feature a curation pipeline ranks
    corpora by (alongside :func:`quality_score`'s ratios and the
    char-LM log-loss):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    with words = whitespace-token count (the engine-wide convention of
    :func:`token_stats`), sentences = count of ``[.!?]+`` runs clamped
    to ≥ 1 (prose without terminal punctuation reads as one sentence),
    and syllables = vowel-group runs ``[aeiouyAEIOUY]+`` (the standard
    dictionary-free proxy).  All three are exact int64 RE2 counts —
    pyarrow and DuckDB both embed RE2, so the SQL twin's
    ``regexp_extract_all`` lengths are identical and the score is one
    fixed float tree.  Zero-word docs yield NULL score.  Pure
    vectorized map — no shuffle, no state.

    Output: ``id_col, n_words, n_sentences, n_syllables, flesch``.
    """

    def fn(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        trimmed = pc.utf8_trim_whitespace(txt)
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        n_words = pc.if_else(
            empty, pa.scalar(0, pa.int64()),
            pc.cast(pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1),
                    pa.int64()))
        n_sent_raw = pc.cast(
            pc.count_substring_regex(txt, r"[.!?]+"), pa.int64())
        n_sent = pc.max_element_wise(n_sent_raw, pa.scalar(1, pa.int64()))
        n_syl = pc.cast(
            pc.count_substring_regex(txt, r"[aeiouyAEIOUY]+"), pa.int64())
        w = pc.cast(n_words, pa.float64()).to_numpy(zero_copy_only=False)
        s = pc.cast(n_sent, pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(n_syl, pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            score = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        score = np.where(np.isfinite(score), score, np.nan)
        return pa.table({
            id_col: t[id_col],
            "n_words": n_words,
            "n_sentences": n_sent,
            "n_syllables": n_syl,
            "flesch": pa.array(score, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _grouped_token_counts(t: pa.Table, group_col: str,
                          text_col: str) -> pa.Table:
    """Per-batch (group, token, _n) combiner: single-space split of
    space-trimmed text (the :func:`top_tokens` convention), empties
    dropped, counts pre-summed so only per-batch distinct (group, token)
    pairs ever cross a shuffle."""
    toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
    groups = t[group_col].combine_chunks() if isinstance(
        t[group_col], pa.ChunkedArray) else t[group_col]
    parts = []
    row_off = 0
    for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
               else [toks]):
        lengths = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
        nrows = len(lengths)
        gv = groups.slice(row_off, nrows)
        row_off += nrows
        vals = ch.flatten()
        if len(vals) == 0:
            continue
        row_of = np.repeat(np.arange(nrows), lengths)
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            continue
        parts.append(pa.table({
            group_col: gv.take(pa.array(row_of[keep])),
            "token": vals.filter(pa.array(keep)),
            "_n": pa.array(np.ones(int(keep.sum()), np.int64))}))
    if not parts:
        return pa.table({
            group_col: pa.array([], t.schema.field(group_col).type),
            "token": pa.array([], pa.string()),
            "_n": pa.array([], pa.int64())})
    batch = pa.concat_tables(parts).combine_chunks()
    out = batch.group_by([group_col, "token"],
                         use_threads=False).aggregate([("_n", "sum")])
    return out.rename_columns([group_col, "token", "_n"])


def distinctive_tokens(
    ds: Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    num_partitions: int = 64,
) -> Dataset:
    """Top-``k`` distinctive tokens per group by the smoothed
    log-odds-ratio of the token's odds inside the group vs the rest of
    the corpus (+0.5 Haldane–Anscombe smoothing, so no cell is ever
    zero) — the "what vocabulary makes this source different" keyword
    extractor, the contrastive sibling of :func:`tfidf_top_terms`
    (which scores within-document salience, not between-group
    contrast):

        score = ln((n_gt + .5)/(N_g − n_gt + .5))
              − ln(((n_t − n_gt) + .5)/((N − N_g − (n_t − n_gt)) + .5))

    Tokenization is the engine-wide single-space convention of
    :func:`top_tokens`.  All counts are exact int64 (integer
    subtractions happen BEFORE the single float cast), the score is one
    fixed float tree (ln via the shared libm on both sides — the
    charlm-logloss precedent), and top-k ordering breaks ties on token
    asc, so the SQL twin selects identical rows.

    Scale shape: per-batch (group, token, n) combiner partials cross
    ONE token-hash exchange; per-group token totals N_g come from a
    second column-pruned counting pass that folds to a ≤|groups|-row
    closure (the BM25-stats pattern) — raw tokens never cross a
    shuffle.  Each token-complete partition scores vectorized and emits
    its local per-group top-k; the ≤ partitions·groups·k candidate rows
    merge on one final partition.  Output: ``group_col, token,
    n (int64), score`` — k rows per group (fewer if the group's
    vocabulary is smaller).
    """
    from .grouped import grouped_apply

    def count_partial(t: pa.Table) -> pa.Table:
        return _grouped_token_counts(t, group_col, text_col)

    def totals_partial(t: pa.Table) -> pa.Table:
        # per-group totals must use the SAME tokenization as the
        # per-token partial (single-space split, empties dropped)
        lst = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        vals = pc.list_flatten(lst)
        nonempty = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(len(lengths)), lengths)
        cnt = np.bincount(row_of[nonempty], minlength=len(lengths)) \
            .astype(np.int64)
        base = pa.table({group_col: t[group_col], "_c": pa.array(cnt)})
        out = base.group_by([group_col], use_threads=False).aggregate(
            [("_c", "sum")])
        return out.rename_columns([group_col, "_c"])

    def totals_final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                                 "_c": pd.Series([], dtype="int64")})
        return df.groupby(group_col, sort=True, as_index=False)["_c"].sum()

    totals = (ds.map_batches(totals_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .repartition(1)
              .map_batches(totals_final, batch_format="pandas",
                           batch_size=None)).to_pandas()
    if len(totals) == 0 or group_col not in totals.columns:
        n_g, n_all = {}, 0
    else:
        n_g = dict(zip(totals[group_col], totals["_c"].astype(np.int64)))
        n_all = int(totals["_c"].sum())

    def score_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "token": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.groupby(["token", group_col], sort=False,
                       as_index=False)["_n"].sum()
        nt = m.groupby("token", sort=False)["_n"].transform("sum") \
            .to_numpy(np.int64)
        n = m["_n"].to_numpy(np.int64)
        ng = m[group_col].map(n_g).to_numpy(np.int64)
        rest = nt - n
        # integer arithmetic first, ONE float cast, fixed ln tree
        score = (np.log((n.astype(np.float64) + 0.5)
                        / ((ng - n).astype(np.float64) + 0.5))
                 - np.log((rest.astype(np.float64) + 0.5)
                          / ((n_all - ng - rest).astype(np.float64)
                             + 0.5)))
        out = pd.DataFrame({group_col: m[group_col], "token": m["token"],
                            "n": n, "score": score})
        out = out.sort_values([group_col, "score", "token"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby(group_col, sort=False).head(k) \
            .reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        out = df.sort_values([group_col, "score", "token"],
                             ascending=[True, False, True],
                             kind="mergesort")
        return out.groupby(group_col, sort=False).head(k) \
            .reset_index(drop=True)

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    scored = grouped_apply(partials, keys=["token"], fn=score_partition,
                           num_partitions=num_partitions,
                           whole_partition=True)
    return scored.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def source_style_cosine(
    ds: Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Pairwise stylistic similarity between groups: cosine between the
    groups' token-count vectors over the full shared vocabulary — the
    corpus-geometry companion of :func:`distinctive_tokens` (which
    surfaces WHAT differs; this scores HOW MUCH two sources read alike)
    and of ngram_contamination (set overlap; this is frequency-weighted).

    Exactness: per-(group, token) counts are exact int64; the pair dot
    products and the per-group squared norms are int64 sums (exact while
    < 2⁵³ when cast), so the cosine ``dot / (√q_a · √q_b)`` is one fixed
    float tree.  Pairs sharing NO token emit nothing on both sides (the
    contamination-op convention).

    Scale shape: (group, token, n) partials cross ONE token-hash
    exchange; each token-complete partition computes its pair-dot and
    norm contributions vectorized (self-merge on token, a < b) and
    emits ≤ |groups|² tiny rows; one final merge divides.  Output:
    ``source_a, source_b, n_shared (int64), cosine`` for a < b.
    """
    from .grouped import grouped_apply

    def count_partial(t: pa.Table) -> pa.Table:
        return _grouped_token_counts(t, group_col, text_col)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source_a": pd.Series([], dtype="object"),
            "source_b": pd.Series([], dtype="object"),
            "_dot": pd.Series([], dtype="int64"),
            "_shared": pd.Series([], dtype="int64"),
            "_q": pd.Series([], dtype="int64"),
            "_is_norm": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.groupby(["token", group_col], sort=False,
                       as_index=False)["_n"].sum()
        n = m["_n"].to_numpy(np.int64)
        norms = pd.DataFrame({group_col: m[group_col], "_q": n * n}) \
            .groupby(group_col, sort=False, as_index=False)["_q"].sum()
        norm_rows = pd.DataFrame({
            "source_a": norms[group_col], "source_b": "",
            "_dot": np.zeros(len(norms), np.int64),
            "_shared": np.zeros(len(norms), np.int64),
            "_q": norms["_q"].astype(np.int64),
            "_is_norm": np.ones(len(norms), np.int64)})
        pairs = m.merge(m, on="token", suffixes=("_a", "_b"))
        pairs = pairs[pairs[f"{group_col}_a"] < pairs[f"{group_col}_b"]]
        if len(pairs):
            pd_ = pd.DataFrame({
                "source_a": pairs[f"{group_col}_a"],
                "source_b": pairs[f"{group_col}_b"],
                "_d": pairs["_n_a"].to_numpy(np.int64)
                      * pairs["_n_b"].to_numpy(np.int64),
                "_s": np.ones(len(pairs), np.int64)})
            g = pd_.groupby(["source_a", "source_b"], sort=False,
                            as_index=False)[["_d", "_s"]].sum()
            pair_rows = pd.DataFrame({
                "source_a": g["source_a"], "source_b": g["source_b"],
                "_dot": g["_d"].astype(np.int64),
                "_shared": g["_s"].astype(np.int64),
                "_q": np.zeros(len(g), np.int64),
                "_is_norm": np.zeros(len(g), np.int64)})
        else:
            pair_rows = empty
        return pd.concat([pair_rows, norm_rows], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source_a": pd.Series([], dtype="object"),
            "source_b": pd.Series([], dtype="object"),
            "n_shared": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        norms = df[df["_is_norm"] == 1].groupby(
            "source_a", sort=False)["_q"].sum()
        pairs = df[df["_is_norm"] == 0]
        if len(pairs) == 0:
            return empty
        g = pairs.groupby(["source_a", "source_b"], sort=True,
                          as_index=False)[["_dot", "_shared"]].sum()
        qa = g["source_a"].map(norms).to_numpy(np.int64)
        qb = g["source_b"].map(norms).to_numpy(np.int64)
        dot = g["_dot"].to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot.astype(np.float64) / (
                np.sqrt(qa.astype(np.float64))
                * np.sqrt(qb.astype(np.float64)))
        return pd.DataFrame({
            "source_a": g["source_a"], "source_b": g["source_b"],
            "n_shared": g["_shared"].astype(np.int64),
            "cosine": np.where(np.isfinite(cos), cos, np.nan)})

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = grouped_apply(partials, keys=["token"], fn=fold,
                           num_partitions=num_partitions,
                           whole_partition=True)
    return folded.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def quality_pass_rate(
    ds: Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    threshold: float = 0.5,
) -> Dataset:
    """Curation acceptance rate per group: the share of documents whose
    :func:`quality_score` clears ``threshold`` — the per-source quality
    funnel a mixing pipeline reads before setting sampling weights
    (sources below the bar get down-weighted or re-filtered).

    The pass/fail comparison happens on the UNROUNDED quality float,
    whose expression tree is bit-identical to the SQL twin's (the
    docs_quality parity), so the counts are exact int64 and the rate is
    one division.  Pure combiner — no shuffle beyond the ≤|groups|-row
    final merge.  Output: ``group_col, n_docs (int64), n_pass (int64),
    pass_rate``.
    """

    def partial(t: pa.Table) -> pa.Table:
        scored = quality_score(t, text_col=text_col)
        ok = pc.cast(pc.greater_equal(scored["quality"],
                                      pa.scalar(float(threshold))),
                     pa.int64())
        base = pa.table({group_col: t[group_col], "_p": ok,
                         "_n": pa.array(
                             np.ones(t.num_rows, np.int64))})
        out = base.group_by([group_col], use_threads=False).aggregate(
            [("_n", "sum"), ("_p", "sum")])
        return out.rename_columns([group_col, "_n", "_p"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_pass": pd.Series([], dtype="int64"),
                "pass_rate": pd.Series([], dtype="float64")})
        g = df.groupby(group_col, sort=True, as_index=False)[
            ["_n", "_p"]].sum()
        return pd.DataFrame({
            group_col: g[group_col],
            "n_docs": g["_n"].astype(np.int64),
            "n_pass": g["_p"].astype(np.int64),
            "pass_rate": g["_p"].to_numpy(np.int64).astype(np.float64)
                         / g["_n"].to_numpy(np.int64).astype(np.float64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def heaps_law(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Heaps'-law fit of vocabulary growth: accumulate documents in
    ``id_col`` order and OLS-fit ``ln(vocab) = ln k + β·ln(tokens)``
    over the cumulative curve — the sub-linearity exponent β is the
    standard corpus-health check (β ≈ 0.5 for organic text; β → 1
    flags unbounded noise vocab, β → 0 templated text).  Complements
    the static :func:`~s_tsfe_dl_ray.stages.distinct` vocab stats with
    the GROWTH view.

    Exactness: per-doc token totals and first-occurrence counts (token
    → min doc id, one token-hash exchange) are exact int64; cumulative
    sums are int64; the ln points and all five OLS moment sums fold
    SEQUENTIALLY in doc-id order on both sides (Python loop ==
    ``list_reduce(list(… ORDER BY d))``), so the fit is bit-exact.
    Docs with zero tokens contribute no curve point (both sides).

    Partitioning note: the curve has one point per document with
    tokens, folded on one final partition — decimate (sample every
    k-th doc id) upstream for billion-doc corpora.  Output: one row —
    ``n_docs (int64), total_tokens (int64), vocab (int64), heaps_beta,
    heaps_lnk``.
    """
    from .grouped import grouped_apply

    def count_partial(t: pa.Table) -> pa.Table:
        out = _grouped_token_counts(t, id_col, text_col)
        # (id, token, n) — keep per-doc totals AND per-(token) min-doc
        return out

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    # token-hash exchange: global first-occurrence doc per token, then
    # per-doc new-token counts ride back as tiny rows
    def first_fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_d": pd.Series([], dtype="int64"),
            "_new": pd.Series([], dtype="int64"),
            "_tok": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        fo = df.groupby("token", sort=False)[id_col].min()
        new = fo.value_counts().rename_axis("_d").reset_index(name="_new")
        tot = df.groupby(id_col, sort=False)["_n"].sum() \
            .rename_axis("_d").reset_index(name="_tok")
        out = tot.merge(new, on="_d", how="left")
        out["_new"] = out["_new"].fillna(0).astype(np.int64)
        out["_d"] = out["_d"].astype(np.int64)
        out["_tok"] = out["_tok"].astype(np.int64)
        return out[["_d", "_new", "_tok"]]

    folded = grouped_apply(partials, keys=["token"], fn=first_fold,
                           num_partitions=num_partitions,
                           whole_partition=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_docs": pd.Series([], dtype="int64"),
            "total_tokens": pd.Series([], dtype="int64"),
            "vocab": pd.Series([], dtype="int64"),
            "heaps_beta": pd.Series([], dtype="float64"),
            "heaps_lnk": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.groupby("_d", sort=True, as_index=False)[["_new", "_tok"]] \
            .sum()
        ct = np.cumsum(m["_tok"].to_numpy(np.int64))
        cd = np.cumsum(m["_new"].to_numpy(np.int64))
        x = np.log(ct.astype(np.float64))
        y = np.log(cd.astype(np.float64))
        n = np.float64(len(m))
        sx = sy = sxx = sxy = np.float64(0.0)
        for i in range(len(m)):          # sequential == list_reduce twin
            sx = sx + x[i]
            sy = sy + y[i]
            sxx = sxx + x[i] * x[i]
            sxy = sxy + x[i] * y[i]
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            lnk = (sy - beta * sx) / n
        return pd.DataFrame({
            "n_docs": pd.Series([len(m)], dtype="int64"),
            "total_tokens": pd.Series([int(ct[-1])], dtype="int64"),
            "vocab": pd.Series([int(cd[-1])], dtype="int64"),
            "heaps_beta": [beta if np.isfinite(beta) else np.nan],
            "heaps_lnk": [lnk if np.isfinite(lnk) else np.nan]})

    return folded.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def collocations_pmi(
    ds: Dataset,
    *,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
    num_partitions: int = 64,
) -> Dataset:
    """Top-``k`` collocations by pointwise mutual information: adjacent
    token pairs whose co-occurrence beats the unigram-independence
    baseline —

        pmi = ln( (n_ab/N_b) / ((n_a/N_u) · (n_b/N_u)) )

    with n_ab ≥ ``min_count`` (the classic low-count PMI guard).  The
    association-strength refinement of :func:`top_bigrams` (raw
    frequency): "of course the" is frequent, "new york" is a
    collocation.

    Exactness: all counts exact int64 (the top_bigrams adjacency —
    pairs never cross documents, runs of spaces break pairs); the PMI
    ratio is one fixed float tree over the exact counts and ln is the
    shared libm, so both sides' PMI floats are bit-identical and the
    (pmi desc, bigram asc) top-k selects identical rows.

    Scale shape (VERDICT r4 #4 — bounded BY CONSTRUCTION, no driver
    vocab dict at any corpus size): unigram and bigram combiner
    partials are materialized once; the two corpus totals are
    distributed scalar sums; global unigram counts fold behind one
    token-hash exchange and are pre-filtered to ``n ≥ min_count``
    (exact: a surviving bigram's member token has n_a ≥ n_ab ≥
    min_count, so nothing scoreable is lost); then TWO keyed exchanges
    attach n_a (keyed by first token) and n_b (keyed by second) to the
    exact summed bigram counts — the driver only ever sees the two
    scalars and the final ≤ partitions·k candidates.  Output:
    ``bigram, n_ab (int64), pmi``.
    """
    from .grouped import grouped_apply

    def bigram_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "_n": pa.array([], pa.int64())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        parts = []
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
                   else [toks]):
            vals = ch.flatten()
            nv = len(vals)
            if nv < 2:
                continue
            lengths = pc.list_value_length(ch).to_numpy(
                zero_copy_only=False)
            first = vals.slice(0, nv - 1)
            second = vals.slice(1, nv - 1)
            pair_ok = np.ones(nv - 1, dtype=bool)
            ends = np.cumsum(lengths)[:-1] - 1
            pair_ok[ends[ends < nv - 1]] = False
            pair_ok &= pc.not_equal(first, "").to_numpy(
                zero_copy_only=False)
            pair_ok &= pc.not_equal(second, "").to_numpy(
                zero_copy_only=False)
            if not pair_ok.any():
                continue
            big = pc.binary_join_element_wise(first, second, " ")
            parts.append(big.filter(pa.array(pair_ok)))
        if not parts:
            return empty
        vc = pa.chunked_array(parts).combine_chunks().value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "_n": pc.cast(vc.field("counts"), pa.int64())})

    def totals_partial(t: pa.Table) -> pa.Table:
        toks = _grouped_token_counts(
            t.append_column("_g", pa.array(
                np.zeros(t.num_rows, np.int8))), "_g", text_col)
        return pa.table({"token": toks["token"], "_n": toks["_n"]})

    import ray.data

    # partials materialize ONCE (batch-local counts, far smaller than
    # the corpus) and feed the scalar totals + the keyed exchanges —
    # the corpus itself is read and tokenized exactly twice
    uni_p = ds.map_batches(totals_partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    big_p = ds.map_batches(bigram_partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    nu = int(uni_p.sum("_n") or 0)
    nb = int(big_p.sum("_n") or 0)
    empty_out = ray.data.from_pandas(pd.DataFrame({
        "bigram": pd.Series([], dtype="object"),
        "n_ab": pd.Series([], dtype="int64"),
        "pmi": pd.Series([], dtype="float64")}))
    if nb == 0 or nu == 0:
        return empty_out

    # global unigram counts, token-hash partitioned; n < min_count can
    # never belong to a surviving bigram (n_a >= n_ab >= min_count)
    def uni_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "_n": pd.Series([], dtype="int64")})
        g = df.groupby("token", sort=False, as_index=False)["_n"].sum()
        return g[g["_n"] >= min_count].reset_index(drop=True)

    uni = grouped_apply(uni_p, keys=["token"], fn=uni_fold,
                        num_partitions=num_partitions,
                        whole_partition=True).materialize()

    _E1 = {"_k": "object", "_b": "object", "_n": "int64",
           "_kind": "int64"}

    def tag_uni1(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_k": df["token"].astype(object),
            "_b": np.full(len(df), "", dtype=object),
            "_n": df["_n"].astype("int64"),
            "_kind": np.zeros(len(df), dtype=np.int64)})

    def tag_big1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in _E1.items()})
        split = df["bigram"].str.split(" ", n=1)
        return pd.DataFrame({
            "_k": split.str[0].astype(object),
            "_b": split.str[1].astype(object),
            "_n": df["_n"].astype("int64"),
            "_kind": np.ones(len(df), dtype=np.int64)})

    # exchange 1 (keyed by FIRST token): exact global n_ab + attach n_a
    def body1(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_k": pd.Series([], dtype="object"),
            "_a": pd.Series([], dtype="object"),
            "_nab": pd.Series([], dtype="int64"),
            "_na": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        lut = df[df["_kind"] == 0].set_index("_k")["_n"]
        bg = df[df["_kind"] == 1]
        if len(bg) == 0 or len(lut) == 0:
            return empty
        m = bg.groupby(["_k", "_b"], sort=False, as_index=False)["_n"].sum()
        m = m[m["_n"] >= min_count]
        if len(m) == 0:
            return empty
        na = m["_k"].map(lut)
        keep = na.notna()          # member token below min_count ⇒ drop
        m = m[keep]
        return pd.DataFrame({
            "_k": m["_b"].astype(object),          # re-key by SECOND token
            "_a": m["_k"].astype(object),
            "_nab": m["_n"].astype("int64"),
            "_na": na[keep].astype("int64")})

    ex1 = grouped_apply(
        uni.map_batches(tag_uni1, batch_format="pandas")
           .union(big_p.map_batches(tag_big1, batch_format="pandas")),
        keys=["_k"], fn=body1, num_partitions=num_partitions,
        whole_partition=True)

    _E2 = {"_k": "object", "_a": "object", "_nab": "int64",
           "_na": "int64", "_kind": "int64"}

    def tag_uni2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_k": df["token"].astype(object),
            "_a": np.full(len(df), "", dtype=object),
            "_nab": df["_n"].astype("int64"),
            "_na": np.zeros(len(df), dtype=np.int64),
            "_kind": np.zeros(len(df), dtype=np.int64)})

    def tag_big2(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in _E2.items()})
        out = df.copy()
        out["_kind"] = np.ones(len(df), dtype=np.int64)
        return out[list(_E2)]

    # exchange 2 (keyed by SECOND token): attach n_b, score, local top-k
    def body2(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "bigram": pd.Series([], dtype="object"),
            "n_ab": pd.Series([], dtype="int64"),
            "pmi": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        lut = df[df["_kind"] == 0].set_index("_k")["_nab"]
        bg = df[df["_kind"] == 1]
        if len(bg) == 0 or len(lut) == 0:
            return empty
        nbb_s = bg["_k"].map(lut)
        keep = nbb_s.notna()
        bg = bg[keep]
        if len(bg) == 0:
            return empty
        na = bg["_na"].to_numpy(np.int64)
        nbb = nbb_s[keep].astype("int64").to_numpy(np.int64)
        nab = bg["_nab"].to_numpy(np.int64)
        # fixed tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            pmi = np.log(
                (nab.astype(np.float64) / np.float64(nb))
                / ((na.astype(np.float64) / np.float64(nu))
                   * (nbb.astype(np.float64) / np.float64(nu))))
        out = pd.DataFrame({
            "bigram": (bg["_a"].astype(str) + " "
                       + bg["_k"].astype(str)).astype(object),
            "n_ab": nab, "pmi": pmi})
        out = out.sort_values(["pmi", "bigram"],
                              ascending=[False, True],
                              kind="mergesort")
        return out.head(k).reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        out = df.sort_values(["pmi", "bigram"],
                             ascending=[False, True], kind="mergesort")
        return out.head(k).reset_index(drop=True)

    scored = grouped_apply(
        uni.map_batches(tag_uni2, batch_format="pandas")
           .union(ex1.map_batches(tag_big2, batch_format="pandas")),
        keys=["_k"], fn=body2, num_partitions=num_partitions,
        whole_partition=True)
    return scored.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def ngram_novelty(
    ds: "Dataset",
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 64,
) -> "Dataset":
    """Corpus-novelty curve per source: of each document's distinct
    token trigrams, how many appear for the FIRST time in that document
    (first = minimum ``id_col`` over the corpus)?  A falling novelty
    share is the standard "this source is re-crawling / templating
    itself" curation signal — the temporal sibling of
    :func:`ngram_contamination` (cross-source overlap).

    Dataflow (100-TB shape): the batch combiner builds distinct
    ``(doc, source, gram)`` triples exactly like ngram_contamination
    (documents are single rows, so in-batch dedup is global); ONE
    exchange hash-partitioned by gram computes min-doc per gram and
    flags first-seen pairs, pre-summing per source inside the
    partition; a second tiny exchange merges |sources| counter rows.
    Per-source doc counts ride a separate one-column combiner pass —
    no second corpus scan of the text.  Output: ``source, n_docs,
    n_tris, n_first_seen, novelty_share`` sorted by source
    (``novelty_share`` NULL for sources with no trigrams).
    """
    from .dedup import _grouped_min
    from .rollup import _stable_pkey

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc": pa.array([], pa.int64()),
                          "g": pa.array([], pa.string()),
                          "gram": pa.array([], pa.string())})
        toks = pc.split_pattern(pc.utf8_trim(t[text_col], " "), " ")
        groups = t[group_col].combine_chunks() if isinstance(
            t[group_col], pa.ChunkedArray) else t[group_col]
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        row_off = 0
        for ch in (toks.chunks if isinstance(toks, pa.ChunkedArray)
                   else [toks]):
            lengths = pc.list_value_length(ch).to_numpy(
                zero_copy_only=False)
            ndocs = len(lengths)
            grp = np.asarray(groups.slice(row_off, ndocs).to_pylist(),
                             dtype=object)
            did = ids_np[row_off:row_off + ndocs]
            row_off += ndocs
            vals = ch.flatten()
            nv = len(vals)
            if nv < 3:
                continue
            doc_of = np.repeat(np.arange(ndocs), lengths)
            t1 = vals.slice(0, nv - 2)
            t2 = vals.slice(1, nv - 2)
            t3 = vals.slice(2, nv - 2)
            ok = doc_of[: nv - 2] == doc_of[2:nv]
            ok &= pc.not_equal(t1, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t2, "").to_numpy(zero_copy_only=False)
            ok &= pc.not_equal(t3, "").to_numpy(zero_copy_only=False)
            if not ok.any():
                continue
            okm = pa.array(ok)
            gram = pc.binary_join_element_wise(t1, t2, t3, " ").filter(okm)
            sel = doc_of[: nv - 2][ok]
            parts.append(pa.table({
                "doc": pa.array(did[sel]),
                "g": pa.array(grp[sel], pa.string()),
                "gram": gram}))
        if not parts:
            return empty
        batch = pa.concat_tables(parts).combine_chunks()
        return batch.group_by(["doc", "g", "gram"],
                              use_threads=False).aggregate([])

    pairs = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey", _stable_pkey(t["gram"], num_partitions))

    def flag_and_fold(df: "pd.DataFrame") -> "pd.DataFrame":
        if len(df) == 0:
            return pd.DataFrame({
                "g": pd.Series([], dtype=object),
                "n_tris": pd.Series([], dtype="int64"),
                "n_first_seen": pd.Series([], dtype="int64")})
        first = df.groupby("gram", sort=False)["doc"].transform("min")
        novel = (df["doc"].to_numpy() == first.to_numpy())
        out = pd.DataFrame({"g": df["g"],
                            "n_tris": np.int64(1),
                            "n_first_seen": novel.astype(np.int64)})
        return (out.groupby("g", sort=False).sum().reset_index())

    folded = (
        pairs.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(flag_and_fold, batch_format="pandas")
    )
    merged = _grouped_min(folded, group_cols=["g"],
                          agg_cols=[("n_tris", "sum"),
                                    ("n_first_seen", "sum")],
                          pkey_col="g", num_partitions=8)

    def doc_counts(t: pa.Table) -> pa.Table:
        out = (t.select([group_col])
               .group_by([group_col], use_threads=False)
               .aggregate([([], "count_all")]))
        return out.rename_columns(["g", "n_docs"])

    ndocs = _grouped_min(
        ds.map_batches(doc_counts, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["g"], agg_cols=[("n_docs", "sum")], pkey_col="g",
        num_partitions=8)

    # tag the two tiny partial streams and union them into one final fold
    def tag_tris(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.copy()
        df["n_docs"] = np.int64(0)
        return df[["g", "n_docs", "n_tris", "n_first_seen"]]

    def tag_docs(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "g": df["g"], "n_docs": df["n_docs"].astype("int64"),
            "n_tris": np.int64(0), "n_first_seen": np.int64(0)})

    unioned = merged.map_batches(tag_tris, batch_format="pandas").union(
        ndocs.map_batches(tag_docs, batch_format="pandas"))

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        cols = ["g", "n_docs", "n_tris", "n_first_seen"]
        if len(df) == 0:
            agg = pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "g" else "int64")
                for c in cols})
        else:
            agg = df.groupby("g", sort=True)[cols[1:]].sum().reset_index()
        nt = agg["n_tris"].to_numpy(dtype=np.float64)
        nf = agg["n_first_seen"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = nf / nt
        share = np.where(np.isfinite(share), share, np.nan)
        return pd.DataFrame({
            "source": agg["g"],
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tris": agg["n_tris"].astype("int64"),
            "n_first_seen": agg["n_first_seen"].astype("int64"),
            "novelty_share": share})

    return unioned.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def vocab_simpson(
    ds: "Dataset",
    *,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 64,
) -> "Dataset":
    """Per-group Simpson concentration of the token distribution:
    ``λ = Σ_t n_t(n_t−1) / (N(N−1))`` — the probability two tokens
    drawn WITHOUT replacement from the group are the same type.  High λ
    = template/boilerplate vocabulary, low λ = diverse prose; the
    unbiased finite-sample cousin of the token-entropy screen (entropy
    weights rare types, Simpson the dominant ones).

    Scale shape: per-batch (group, token, n) combiner partials cross
    ONE token-hash exchange; inside each token-complete partition the
    per-(group, token) counts close and fold to two int64 partials per
    group (Σ n(n−1), Σ n); a second tiny group-keyed merge emits one
    row per group.  Every count is exact int64; the single division is
    one fixed float tree, so the SQL twin hashes identically.
    Groups with N < 2 emit no row (the twin's HAVING).
    Output: ``group_col, n_tokens (int64), simpson (float64)``.
    """
    from .grouped import grouped_apply

    def count_partial(t: pa.Table) -> pa.Table:
        return _grouped_token_counts(t, group_col, text_col)

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def close_tokens(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "_s2": pd.Series([], dtype="int64"),
            "_n": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        n_t = (df.groupby([group_col, "token"], sort=False, as_index=False)
               ["_n"].sum())
        n = n_t["_n"].to_numpy(np.int64)
        n_t["_s2"] = n * (n - 1)
        out = (n_t.groupby(group_col, sort=False, as_index=False)
               .agg(_s2=("_s2", "sum"), _n=("_n", "sum")))
        return out

    closed = grouped_apply(partials, keys=["token"], fn=close_tokens,
                           num_partitions=num_partitions,
                           whole_partition=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "n_tokens": pd.Series([], dtype="int64"),
            "simpson": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby(group_col, sort=True, as_index=False).agg(
            _s2=("_s2", "sum"), _n=("_n", "sum"))
        g = g[g["_n"] >= 2]
        if len(g) == 0:
            return empty
        s2 = g["_s2"].to_numpy(np.int64).astype(np.float64)
        nn = g["_n"].to_numpy(np.int64)
        simpson = s2 / (nn.astype(np.float64) * (nn - 1).astype(np.float64))
        return pd.DataFrame({
            group_col: g[group_col],
            "n_tokens": g["_n"].astype("int64"),
            "simpson": simpson})

    return grouped_apply(closed, keys=[group_col], fn=final,
                         num_partitions=1,
                         whole_partition=True)
