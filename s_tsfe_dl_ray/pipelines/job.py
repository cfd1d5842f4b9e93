"""Resumable, checkpointed transcript rollup job.

The production entry shape of the engine (BASELINE.json north_star:
"resumes mid-rollup without recomputing completed partitions, with
per-partition lineage").

    job = TranscriptRollupJob(input_path, out_dir, tiers=("1m","1h","1d"))
    job.run()          # first run: computes + writes all buckets
    job.run()          # rerun: reads manifests, skips everything done

Dataflow — ONE shuffle total:

    read_parquet (column-pruned)
      → map_batches: derive token_len/is_tool_call, assign
        bucket = stable_hash(conv_id) % n_buckets     [vectorized]
      → map_batches: FILTER OUT completed buckets     [resume pruning —
        happens before any aggregation, so resumed work costs ~0]
      → map_batches: rollup combiner (per-batch partial aggregation;
        tags _pkey = stable_hash(conv_id) % n_buckets == bucket)
      → groupby(_pkey).map_groups(write_bucket)       [THE shuffle: only
        combiner partials move]

    Inside each bucket group (pure vectorized pyarrow, no further
    exchange — exact because bucket = f(conv_id) so every conversation
    is complete within its bucket):
      merge partials → cascade 1m→1h→1d → finalize means/rates →
      sort → write tier=*/bucket=K.parquet atomically → manifest record.

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
        gapfill_mode: str | None = None,
        encode_series: bool = False,
    ):
        """``gapfill_mode``: None (tiers contain observed windows only),
        'ffill' or 'interp' — durable tiers then carry every grid window
        between each conversation's first and last, flagged by
        ``fill_method`` (gap semantics: stages/gapfill.py).

        ``encode_series``: additionally persist every conversation's
        (ts, token_len) series Gorilla/delta-of-delta-compressed under
        ``series/bucket=K.parquet``, and record the per-bucket encoder
        state hashes in the lineage manifest (BASELINE.json north_star:
        "lineage records (input fragment IDs, row counts, encoder state
        hashes)")."""
        if gapfill_mode not in (None, "ffill", "interp"):
            raise ValueError(f"bad gapfill_mode {gapfill_mode!r}")
        self.input_path = input_path
        self.out_dir = out_dir
        self.tiers = tiers
        self.n_buckets = n_buckets
        self.gapfill_mode = gapfill_mode
        self.encode_series = encode_series

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

    def _write_series_buckets(self, ds) -> dict[int, dict]:
        """Compress each conversation's (ts, token_len) series per bucket
        and write ``series/bucket=K.parquet`` atomically.  Returns per-
        bucket records (rows, conv count, combined encoder state hash)
        for embedding in the main manifest.

        Same partitioning as the tier write (bucket = stable hash of
        conv_id), so a bucket's tiers, compressed series and manifest
        always travel together.  Sort inside the bucket is (conv_id, ts)
        — ts is unique per conversation in transcripts, so the encode
        order (and therefore the byte output) is total and deterministic.
        """
        import hashlib
        import tempfile

        import numpy as np

        from ..stages.rollup import _stable_pkey
        from ..state.deltadelta import DeltaDeltaCodec
        from ..state.gorilla import GorillaCodec

        out_dir = self.out_dir
        n_buckets = self.n_buckets

        def tag(t: pa.Table) -> pa.Table:
            t = t.select(["conv_id", "ts", "token_len"])
            return t.append_column("_pkey", _stable_pkey(t["conv_id"], n_buckets))

        def encode_bucket(df: pd.DataFrame) -> pd.DataFrame:
            bucket = int(df["_pkey"].iloc[0])
            df = df.sort_values(["conv_id", "ts"], kind="mergesort")
            ts_all = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            val_all = df["token_len"].astype("float64").to_numpy()
            keys_all = df["conv_id"].to_numpy()
            change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
            bounds = np.concatenate([[0], change, [len(df)]])
            dod, gor = DeltaDeltaCodec(), GorillaCodec()
            rows = {k: [] for k in ("conv_id", "n_rows", "ts_blob", "val_blob",
                                    "ts_hash", "val_hash")}
            state = hashlib.sha256()
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                ts_blob = dod.encode(ts_all[lo:hi])
                val_blob = gor.encode(val_all[lo:hi])
                th = DeltaDeltaCodec.state_hash(ts_blob)
                vh = GorillaCodec.state_hash(val_blob)
                rows["conv_id"].append(keys_all[lo])
                rows["n_rows"].append(int(hi - lo))
                rows["ts_blob"].append(ts_blob)
                rows["val_blob"].append(val_blob)
                rows["ts_hash"].append(th)
                rows["val_hash"].append(vh)
                state.update(th.encode())
                state.update(vh.encode())
            table = pa.table({
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "ts_blob": pa.array(rows["ts_blob"], pa.binary()),
                "val_blob": pa.array(rows["val_blob"], pa.binary()),
                "ts_hash": pa.array(rows["ts_hash"], pa.string()),
                "val_hash": pa.array(rows["val_hash"], pa.string()),
            })
            rel = os.path.join("series", mf.bucket_name(bucket) + ".parquet")
            path = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
            os.close(fd)
            pq.write_table(table, tmp, compression="zstd")
            os.replace(tmp, path)
            return pd.DataFrame({
                "bucket": [bucket],
                "series_rows": [int(df.shape[0])],
                "n_convs": [len(rows["conv_id"])],
                "encoder_state_hash": [state.hexdigest()[:16]],
                "path": [rel],
            })

        tagged = ds.map_batches(tag, batch_format="pyarrow")
        res = tagged.groupby("_pkey").map_groups(
            encode_bucket, batch_format="pandas"
        ).to_pandas()
        return {
            int(r.bucket): {
                "rows": int(r.series_rows),
                "n_convs": int(r.n_convs),
                "encoder_state_hash": r.encoder_state_hash,
                "path": r.path,
            }
            for r in res.itertuples()
        }

    def _write_from_partials(self, ds, series_info: dict[int, dict] | None = None):
        """THE shuffle + bucket-local compute/write (see module doc)."""
        import tempfile

        from ..stages.rollup import (
            _PartialBatch, _merge_partials_table, cascade_table, finalize_table,
        )

        spec = TRANSCRIPT_SPEC
        out_dir, tiers = self.out_dir, self.tiers
        gapfill_mode = self.gapfill_mode
        frag_hash = mf.fragments_hash(self._input_fragments())

        def bucket_gapfill(pub: pa.Table, tier: str) -> pa.Table:
            """Bucket-local gap-fill: per-conv grid completion, no extra
            shuffle (every conversation is complete within its bucket)."""
            from ..functions.windows import TIER_US
            from ..stages.gapfill import _GapFillGroup

            inst = _GapFillGroup(
                ["conv_id"], "window_start", TIER_US[tier],
                ["turn_count"], ["token_len_sum"],
                ["token_len_min", "token_len_max"],
                ["token_len_mean", "tool_call_rate"], gapfill_mode,
            )
            df = pub.to_pandas()
            out = df.groupby("conv_id", group_keys=False, sort=False).apply(inst)
            return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)

        partials = ds.map_batches(
            _PartialBatch(spec, tiers[0], num_partitions=self.n_buckets),
            batch_format="pyarrow",
            batch_size=64 * 1024,
            zero_copy_batch=True,
        )

        series_info = series_info or {}

        def write_bucket(g: pa.Table) -> pa.Table:
            bucket = int(g["_pkey"][0].as_py())
            partial_t = _merge_partials_table(spec, g)
            record = {
                "bucket": bucket,
                "engine_version": _ENGINE_VERSION,
                "input_fragments_hash": frag_hash,
                "n_convs": int(pc.count_distinct(partial_t["conv_id"]).as_py()),
                "tiers": {},
            }
            if bucket in series_info:
                record["series"] = series_info[bucket]
            total_rows = 0
            for i, tier in enumerate(tiers):
                if i > 0:
                    partial_t = cascade_table(spec, partial_t, tier)
                pub = finalize_table(spec, partial_t)
                if gapfill_mode:
                    pub = bucket_gapfill(pub, tier)
                pub = pub.sort_by([("conv_id", "ascending"), ("window_start", "ascending")])
                rel = os.path.join(f"tier={tier}", mf.bucket_name(bucket) + ".parquet")
                path = os.path.join(out_dir, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
                os.close(fd)
                pq.write_table(pub, tmp, compression="zstd", row_group_size=1 << 20)
                os.replace(tmp, path)
                record["tiers"][tier] = {
                    "rows": int(pub.num_rows),
                    "path": rel,
                    "sha256": mf.file_sha256(path),
                }
                total_rows += pub.num_rows
            mf.write_manifest(out_dir, bucket, record)
            return pa.table({
                "bucket": pa.array([bucket], pa.int64()),
                "rows": pa.array([total_rows], pa.int64()),
                "n_convs": pa.array([record["n_convs"]], pa.int64()),
            })

        return partials.groupby("_pkey").map_groups(write_bucket, batch_format="pyarrow")

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
        series_info = (
            self._write_series_buckets(self._ingest(set(done)))
            if self.encode_series else None
        )
        result = self._write_from_partials(ds, series_info).to_pandas()
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
