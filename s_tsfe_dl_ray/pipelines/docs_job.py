"""Durable, resumable document-curation job: the LLM-data sibling of the
transcript rollup job (pipelines/job.py) — quality scoring → language
filter → exact dedup, written as partitioned parquet with per-bucket
lineage manifests so a failed 100 TB run resumes by SKIPPING finished
buckets instead of recomputing.

Bucketing key = md5(text): the dedup equivalence classes land whole in
one bucket, so each bucket dedups INDEPENDENTLY (bucket-local reduce is
globally exact — the same key-complete-partition argument as the rollup
job's conv buckets), output is deterministic per bucket (sorted by
doc_id, fixed compression → byte-identical reruns), and a re-run with
changed inputs is refused by the lineage hash rather than silently
mixed.  Reference analog: the reference's two-phase train/resume
checkpointing (SURVEY.md §2.3 frozen-stage resume); here the
"checkpoint" is the curated shard + its manifest.

Scale shape: ONE hash exchange of (h, doc_id, metrics) narrow rows —
text itself never crosses the shuffle (metrics are pure functions of
text, so the dedup reduce carries them as min-aggregates; the kept text
is re-read per bucket only if ``keep_text=True``... deliberately NOT
offered: curated corpora at scale store winner doc_ids + metrics, and
texts join back at consumption time via the id).
"""

from __future__ import annotations

import io
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from ..sources.parquet import read_table
from ..state import manifest as mf
from ..stages.dedup import md5_hex
from ..stages.text import lang_id, quality_score, token_stats


class DocsCurationJob:
    """``DocsCurationJob(input_path, out_dir).run()`` → summary dict.

    Output tree: ``out_dir/curated/bucket=K.parquet`` (+ ``_manifests/``)
    with columns ``doc_id, n_tokens, quality, lang_pred`` sorted by
    doc_id — one row per distinct kept text, doc_id = smallest id of the
    duplicate group.
    """

    def __init__(
        self,
        input_path: str,
        out_dir: str,
        *,
        n_buckets: int = 32,
        min_quality: float = 0.35,
        keep_langs: tuple[str, ...] = ("en",),
    ):
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self.input_path = input_path
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.min_quality = float(min_quality)
        self.keep_langs = tuple(keep_langs)

    # -- dataflow ----------------------------------------------------------

    def _input_fragments(self) -> list[str]:
        p = self.input_path
        if os.path.isdir(p):
            return [os.path.join(p, f) for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")]
        return [p]

    def _narrow_rows(self, todo: list[int]) -> Dataset:
        """Metrics + text-hash + bucket per doc; text dropped before the
        exchange; rows outside ``todo`` buckets pruned at the map."""
        ds = read_table(self.input_path, columns=["doc_id", "text"])
        ds = ds.map_batches(token_stats, batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = ds.map_batches(quality_score, batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = lang_id(ds)
        langs = list(self.keep_langs)
        minq = self.min_quality
        nb = self.n_buckets
        todo_arr = pa.array(sorted(todo))

        def narrow(b: pd.DataFrame) -> pd.DataFrame:
            h = md5_hex(b["text"])
            out = pd.DataFrame({
                "h": h,
                # bucket from the leading 12 hex digits: stable, library-
                # independent (no polars fingerprint guard needed)
                "bucket": h.str.slice(0, 12).apply(int, base=16) % nb,
                "doc_id": b["doc_id"],
                "n_tokens": b["n_tokens"],
                "quality": b["quality"],
                "lang_pred": b["lang_pred"],
            })
            keep = (out["quality"] >= minq) & out["lang_pred"].isin(langs)
            return out[keep]

        rows = ds.map_batches(narrow, batch_format="pandas")

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["bucket"], value_set=todo_arr))

        return rows.map_batches(prune, batch_format="pyarrow")

    def _write_bucket(self, g: pd.DataFrame, frag_hash: str,
                      bucket: int | None = None) -> dict:
        bucket = int(g["bucket"].iloc[0]) if bucket is None else int(bucket)
        dedup = (
            g.groupby("h", sort=False)
            .agg(doc_id=("doc_id", "min"), n_tokens=("n_tokens", "min"),
                 quality=("quality", "min"), lang_pred=("lang_pred", "min"))
            .reset_index(drop=True)
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )
        t = pa.Table.from_pandas(dedup, preserve_index=False)
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="zstd",
                       store_schema=True, write_statistics=True)
        data = buf.getvalue()
        path = os.path.join(self.out_dir, "curated",
                            f"bucket={bucket}.parquet")
        mf.atomic_write_bytes(path, data)
        rec = {
            "bucket": bucket,
            "rows": int(len(dedup)),
            "input_rows": int(len(g)),
            "input_fragments_hash": frag_hash,
            "n_buckets": self.n_buckets,
            "min_quality": self.min_quality,
            "keep_langs": list(self.keep_langs),
            "files": {f"curated/bucket={bucket}.parquet":
                      mf.file_sha256(path)},
        }
        mf.write_manifest(self.out_dir, bucket, rec)
        return rec

    # -- public API ---------------------------------------------------------

    def run(self) -> dict:
        done = mf.read_manifests(self.out_dir)
        frag_hash = mf.fragments_hash(self._input_fragments())
        stale = [b for b, rec in done.items()
                 if rec.get("input_fragments_hash") != frag_hash]
        if stale:
            raise RuntimeError(
                f"manifest buckets {stale} were built from different input "
                f"fragments; refusing to mix lineages (clear {self.out_dir})")
        param_drift = [
            b for b, rec in done.items()
            if (rec.get("n_buckets") != self.n_buckets
                or rec.get("min_quality") != self.min_quality
                or rec.get("keep_langs") != list(self.keep_langs))
        ]
        if param_drift:
            raise RuntimeError(
                f"manifest buckets {param_drift} were written with different "
                f"curation parameters; resuming would mix filter policies "
                f"(clear {self.out_dir})")
        todo = [b for b in range(self.n_buckets) if b not in done]
        if not todo:
            return {"buckets_written": 0, "buckets_skipped": len(done),
                    "rows": sum(r["rows"] for r in done.values())}

        job_frag_hash = frag_hash
        job = self

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            rec = job._write_bucket(g, job_frag_hash)
            return pd.DataFrame({
                "bucket": pd.Series([rec["bucket"]], dtype="int64"),
                "rows": pd.Series([rec["rows"]], dtype="int64"),
            })

        written = (
            self._narrow_rows(todo)
            .groupby("bucket")
            .map_groups(write_bucket, batch_format="pandas")
            .to_pandas()
        )
        if "bucket" not in written.columns:  # every todo bucket filtered empty
            written = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                    "rows": pd.Series([], dtype="int64")})
        # a todo bucket every row filtered away from produces no group —
        # record it as legitimately empty so the next run skips it too
        missing = sorted(set(todo) - set(written["bucket"].tolist()))
        for b in missing:
            self._write_bucket(_empty_bucket_frame(), frag_hash, bucket=b)
        return {
            "buckets_written": int(len(written)) + len(missing),
            "buckets_skipped": len(done),
            "rows": int(written["rows"].sum())
            + sum(r["rows"] for r in done.values()),
        }


def _empty_bucket_frame() -> pd.DataFrame:
    """Zero-row group frame (right dtypes) for a bucket whose every row
    was filtered — gets it a manifest + empty shard so resume skips it."""
    return pd.DataFrame({
        "bucket": pd.Series([], dtype="int64"),
        "h": pd.Series([], dtype="object"),
        "doc_id": pd.Series([], dtype="int64"),
        "n_tokens": pd.Series([], dtype="int64"),
        "quality": pd.Series([], dtype="float64"),
        "lang_pred": pd.Series([], dtype="object"),
    })
