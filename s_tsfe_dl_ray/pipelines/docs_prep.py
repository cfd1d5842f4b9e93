"""End-to-end training-data preparation pipeline over a document corpus:
quality scoring → language filter → exact dedup, composed from the
engine's text + dedup stages in ONE streaming dataflow.

This is the canonical LLM-data-prep composition (filter the junk, keep
one copy of each text).  Shape:

    read (pruned) → token_stats / quality_score (stateless Arrow
    kernels) → lang_id (actor pool, compiled markers) → vectorized
    filter → md5(text) → ONE ``_pkey`` hash shuffle → per-partition
    min-reduce per text-hash.

Duplicate rows of the same text share every derived metric (metrics are
pure functions of text), so the dedup reduce carries the metrics as
``min`` aggregates instead of joining winners back to the corpus — no
second pass, no broadcast of kept ids, nothing driver-side.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..sources.parquet import read_table
from ..stages.dedup import _grouped_min, md5_hex
from ..stages.text import lang_id, quality_score, token_stats


def prep_documents(
    path: str,
    *,
    min_quality: float = 0.35,
    keep_langs: tuple[str, ...] = ("en",),
) -> Dataset:
    """Filtered + deduped corpus: one row per distinct kept text with
    ``(doc_id, n_tokens, quality, lang_pred)`` (doc_id = smallest id of
    the duplicate group)."""
    ds = read_table(path, columns=["doc_id", "text"])
    ds = ds.map_batches(token_stats, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(quality_score, batch_format="pyarrow", zero_copy_batch=True)
    ds = lang_id(ds)

    langs = pa.array(list(keep_langs))

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["quality"], pa.scalar(float(min_quality))),
            pc.is_in(t["lang_pred"], value_set=langs),
        )
        return t.filter(mask)

    filtered = ds.map_batches(keep, batch_format="pyarrow")

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": md5_hex(b["text"]),
            "doc_id": b["doc_id"],
            "n_tokens": b["n_tokens"],
            "quality": b["quality"],
            "lang_pred": b["lang_pred"],
        })

    hashed = filtered.map_batches(add_hash, batch_format="pandas")
    out = _grouped_min(
        hashed,
        group_cols=["h"],
        agg_cols=[("doc_id", "min"), ("n_tokens", "min"),
                  ("quality", "min"), ("lang_pred", "min")],
        pkey_col="h",
    )
    return out.select_columns(["doc_id", "n_tokens", "quality", "lang_pred"])


def prep_documents_neardup(
    path: str,
    *,
    min_quality: float = 0.35,
    keep_langs: tuple[str, ...] = ("en",),
    ngram: int = 3,
    jaccard: float = 0.5,
) -> Dataset:
    """Near-duplicate variant of :func:`prep_documents`: the dedup step
    collapses TRANSITIVE near-duplicate clusters instead of exact-hash
    groups — the full modern prep stack in one composition:

        quality/lang filter → text normalization (whitespace/case/NFC,
        so trivially-reworded copies collide) → n-gram Jaccard pair
        detection (hot-gram-capped inverted index) → connected
        components → one survivor (min doc_id) per cluster.

    Returns the kept docs with their metrics plus ``component`` (cluster
    canonical id).  Every stage is the already-tested partitioned op;
    this function is the composition users run.
    """
    from ..stages.cluster import dedup_keep
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.text import normalize_text

    ds = read_table(path, columns=["doc_id", "text"])
    ds = ds.map_batches(token_stats, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(quality_score, batch_format="pyarrow", zero_copy_batch=True)
    ds = lang_id(ds)

    langs = pa.array(list(keep_langs))

    def keep_mask(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["quality"], pa.scalar(float(min_quality))),
            pc.is_in(t["lang_pred"], value_set=langs),
        )
        return t.filter(mask)

    filtered = ds.map_batches(keep_mask, batch_format="pyarrow")
    filtered = filtered.map_batches(normalize_text, batch_format="pyarrow")

    pairs = ngram_jaccard_pairs(
        filtered.select_columns(["doc_id", "text_norm"]).rename_columns(
            {"text_norm": "text"}
        ),
        id_col="doc_id", n=ngram, threshold=jaccard,
    )
    decided = dedup_keep(
        filtered.select_columns(
            ["doc_id", "n_tokens", "quality", "lang_pred"]
        ),
        pairs, id_col="doc_id",
    )

    def only_kept(t: pa.Table) -> pa.Table:
        return t.filter(pc.cast(t["keep"], pa.bool_())).drop_columns(["keep"])

    return decided.map_batches(only_kept, batch_format="pyarrow")
