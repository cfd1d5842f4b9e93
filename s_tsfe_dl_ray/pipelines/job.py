"""Resumable, checkpointed transcript rollup job.

The production entry shape of the engine (BASELINE.json north_star:
"resumes mid-rollup without recomputing completed partitions, with
per-partition lineage").

    job = TranscriptRollupJob(input_path, out_dir, tiers=("1m","1h","1d"))
    job.run()          # first run: computes + writes all buckets
    job.run()          # rerun: reads manifests, skips everything done

Dataflow (one shuffle for the rollup + one for the bucket write):

    read_parquet (column-pruned)
      → map_batches: derive token_len/is_tool_call, assign
        bucket = stable_hash(conv_id) % n_buckets     [vectorized]
      → map_batches: FILTER OUT completed buckets     [resume pruning —
        happens before any aggregation, so resumed work costs ~0]
      → rollup partials (combiner) → groupby merge    [shuffle #1]
      → cascade to coarser tiers (re-combine partials, no raw re-read)
      → finalize all tiers, union with a tier column
      → groupby(bucket).map_groups(write_bucket)      [shuffle #2; each
        bucket writes tier=*/bucket=K.parquet atomically, then its
        manifest record]

Output rows are sorted (tier, conv_id, window_start) inside each bucket
file and written with fixed parquet settings, so a resumed job's final
tree is BYTE-identical to an uninterrupted run (tested).

Scale notes: ``n_buckets`` bounds both the resume granularity and the
write-group size — at 10^12 turns you'd raise it so a bucket's tier rows
fit one worker (tier rows are per-(conv, window), orders of magnitude
smaller than raw turns).  Hot conversations are already combined by the
rollup's per-batch partials, and a conv maps to exactly one bucket, so
bucket files are self-contained per conversation (retention deletes and
late re-rollups stay per-bucket).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.derive import derive_transcript_columns
from ..functions.windows import TIER_ORDER
from ..sources.parquet import read_transcripts
from ..stages.rollup import cascade, finalize, rollup_partial
from ..state import manifest as mf
from .transcript_rollup import TRANSCRIPT_SPEC

_ENGINE_VERSION = 1


def _stable_bucket(conv_id: pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """Vectorized, process-stable key→bucket map (polars xxhash)."""
    import polars as pl

    arr = conv_id.combine_chunks() if isinstance(conv_id, pa.ChunkedArray) else conv_id
    h = pl.Series(arr).hash(seed=0).to_numpy()
    return pa.array((h % np.uint64(n_buckets)).astype(np.int64))


class TranscriptRollupJob:
    def __init__(
        self,
        input_path: str,
        out_dir: str,
        *,
        tiers: tuple[str, ...] = TIER_ORDER,
        n_buckets: int = 32,
    ):
        self.input_path = input_path
        self.out_dir = out_dir
        self.tiers = tiers
        self.n_buckets = n_buckets

    # -- stages -----------------------------------------------------------

    def _ingest(self, skip_buckets: set[int]):
        n_buckets = self.n_buckets

        def derive_and_bucket(batch: pa.Table) -> pa.Table:
            batch = derive_transcript_columns(batch)
            batch = batch.append_column("bucket", _stable_bucket(batch["conv_id"], n_buckets))
            return batch.select(["conv_id", "bucket", "ts", "token_len", "is_tool_call"])

        ds = read_transcripts(self.input_path, columns=["conv_id", "ts", "text", "tool"])
        ds = ds.map_batches(derive_and_bucket, batch_format="pyarrow", zero_copy_batch=True)
        if skip_buckets:
            done = pa.array(sorted(skip_buckets), pa.int64())
            ds = ds.map_batches(
                lambda t: t.filter(pc.invert(pc.is_in(t["bucket"], value_set=done))),
                batch_format="pyarrow",
            )
        return ds

    def _tiers_union(self, ds):
        """All finalized tiers as one dataset with a ``tier`` column.

        The bucket column survives the rollup because bucket=f(conv_id):
        it is carried as an extra group key (constant within conv).
        """
        spec = TRANSCRIPT_SPEC
        spec_b = type(spec)(
            keys=("conv_id", "bucket"),
            ts_col=spec.ts_col,
            metrics=spec.metrics,
            count_alias=spec.count_alias,
            rates=spec.rates,
        )
        partial = rollup_partial(ds, spec_b, self.tiers[0]).materialize()
        out = None
        for i, tier in enumerate(self.tiers):
            if i > 0:
                partial = cascade(partial, spec_b, tier).materialize()
            fin = finalize(partial, spec_b)
            fin = fin.map_batches(
                lambda t, tier=tier: t.append_column(
                    "tier", pa.array([tier] * len(t), pa.string())
                ),
                batch_format="pyarrow",
            )
            out = fin if out is None else out.union(fin)
        return out

    def _write_buckets(self, tiers_ds):
        out_dir, tiers, input_path = self.out_dir, self.tiers, self.input_path
        frag_hash = mf.fragments_hash(self._input_fragments())
        sort_cols = ["tier", "conv_id", "window_start"]

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            bucket = int(g["bucket"].iloc[0])
            g = g.sort_values(sort_cols, kind="mergesort")
            record = {
                "bucket": bucket,
                "engine_version": _ENGINE_VERSION,
                "input_fragments_hash": frag_hash,
                "n_convs": int(g["conv_id"].nunique()),
                "tiers": {},
            }
            for tier in tiers:
                part = g[g["tier"] == tier].drop(columns=["tier", "bucket"])
                rel = os.path.join(f"tier={tier}", mf.bucket_name(bucket) + ".parquet")
                path = os.path.join(out_dir, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                table = pa.Table.from_pandas(part.reset_index(drop=True), preserve_index=False)
                import tempfile

                fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
                os.close(fd)
                pq.write_table(table, tmp, compression="zstd", row_group_size=1 << 20)
                os.replace(tmp, path)
                record["tiers"][tier] = {
                    "rows": int(len(part)),
                    "path": rel,
                    "sha256": mf.file_sha256(path),
                }
            mf.write_manifest(out_dir, bucket, record)
            return pd.DataFrame({
                "bucket": [bucket],
                "rows": [int(len(g))],
                "n_convs": [record["n_convs"]],
            })

        return tiers_ds.groupby("bucket").map_groups(write_bucket, batch_format="pandas")

    def _input_fragments(self) -> list[str]:
        p = self.input_path
        if os.path.isdir(p):
            return [os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        return [p]

    # -- public API -------------------------------------------------------

    def run(self) -> dict:
        """Execute (or resume) the job; returns a summary dict."""
        done = mf.read_manifests(self.out_dir)
        frag_hash = mf.fragments_hash(self._input_fragments())
        stale = [b for b, rec in done.items() if rec.get("input_fragments_hash") != frag_hash]
        if stale:
            raise RuntimeError(
                f"manifest buckets {stale} were built from different input "
                f"fragments; refusing to mix lineages (clear {self.out_dir})"
            )
        todo = [b for b in range(self.n_buckets) if b not in done]
        if not todo:
            return {"completed": self.n_buckets, "newly_written": 0, "skipped": len(done)}
        ds = self._ingest(set(done))
        tiers_ds = self._tiers_union(ds)
        result = self._write_buckets(tiers_ds).to_pandas()
        # buckets whose hash range simply contained no conversations: the
        # pass covered all remaining input, so they are durably complete
        for b in todo:
            if len(result) == 0 or b not in set(result["bucket"]):
                mf.write_manifest(self.out_dir, b, {
                    "bucket": b,
                    "engine_version": _ENGINE_VERSION,
                    "input_fragments_hash": frag_hash,
                    "n_convs": 0,
                    "tiers": {t: {"rows": 0} for t in self.tiers},
                })
        return {
            "completed": len(done) + len(result),
            "newly_written": int(len(result)),
            "skipped": len(done),
            "rows_written": int(result["rows"].sum()) if len(result) else 0,
        }

    def read_tier(self, tier: str):
        """The job's output as a Dataset (all buckets of one tier)."""
        import ray.data

        ds = ray.data.read_parquet(os.path.join(self.out_dir, f"tier={tier}"))
        # drop the hive-partition column Ray infers from the tier=... path
        if "tier" in ds.schema().names:
            ds = ds.drop_columns(["tier"])
        return ds
