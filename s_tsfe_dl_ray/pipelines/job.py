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

With ``encode_series=True`` the job still makes ONE pass and ONE shuffle,
but the exchange carries the narrow RAW rows (conv_id, ts, token_len,
is_tool_call — never text) instead of partials: the series codec needs
every (ts, value) pair of a conversation in one place, and the bucket
group then writes the compressed series AND computes partials + tiers
locally from the same rows.  (The partials-only exchange is kept for the
default path, where it is strictly smaller.)

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

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.derive import derive_transcript_columns
from ..functions.windows import TIER_ORDER, window_start_us
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


def _bucket_hash_fingerprint() -> str:
    """Fingerprint of the bucket-hash IMPLEMENTATION (not of any data).

    polars does not guarantee ``Series.hash`` stable across polars
    versions; a silent change between run and resume would reassign
    conversations to different buckets while completed-bucket manifests
    are still trusted (dropping/double-counting rows with no error).
    Hashing a fixed probe key set detects that: the fingerprint is
    recorded in every manifest and resume refuses on mismatch.
    """
    import polars as pl

    probe = ["", "conv-000000", "conv-999999", "s_tsfe_dl_ray/probe", "π-√2"]
    h = pl.Series(probe).hash(seed=0).to_numpy()
    return hashlib.sha256(h.tobytes()).hexdigest()[:16]


class TranscriptRollupJob:
    def __init__(
        self,
        input_path: str,
        out_dir: str,
        *,
        tiers: tuple[str, ...] = TIER_ORDER,
        n_buckets: int | None = None,
        gapfill_mode: str | None = None,
        encode_series: bool = False,
        series_chunk_rows: int = 1 << 22,
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
        hashes)").  Single pass, single shuffle (see module doc).

        ``n_buckets=None`` (default) auto-scales the bucket count with the
        input size (``_auto_n_buckets``) so bucket groups stay bounded at
        any corpus scale; pass an int to pin it (resume requires the same
        value — the manifest records and enforces it).

        ``series_chunk_rows``: per-codec-call row budget on the encode
        path.  A conversation longer than this encodes as multiple
        independently-decodable chunks (rows carry ``chunk_idx``; decoding
        blobs in (conv_id, chunk_idx) order reproduces the exact unchunked
        series) — the in-bucket analog of ``state/encode.py``'s
        ``salt_every_us`` hot-key salting, with row-based boundaries
        because the bucket's rows are already sorted locally, giving an
        exact per-call memory bound where a fixed time width bounds it
        only probabilistically.  Default 4M rows ≈ 64 MB of (ts, value)
        per codec call."""
        if gapfill_mode not in (None, "ffill", "interp"):
            raise ValueError(f"bad gapfill_mode {gapfill_mode!r}")
        self.input_path = input_path
        self.out_dir = out_dir
        self.tiers = tiers
        self.n_buckets = n_buckets if n_buckets is not None else self._auto_n_buckets()
        self.gapfill_mode = gapfill_mode
        self.encode_series = encode_series
        if series_chunk_rows < 2:
            raise ValueError("series_chunk_rows must be >= 2")
        self.series_chunk_rows = series_chunk_rows

    def _auto_n_buckets(self) -> int:
        """``n_buckets=None``: scale the bucket count with input size so a
        bucket group's in-memory rows stay bounded as the corpus grows.

        A bucket group holds NARROW rows (conv_id, ts, token_len,
        is_tool_call — never text; ~48 B/row in-memory) on the encode
        path, or only combiner partials on the default path.  Target
        ≈256 MiB of narrow rows per bucket, floor 32: at 20M turns this
        resolves to 32 (unchanged behavior); at 10^12 turns it resolves
        to ~180k buckets, keeping the per-group footprint flat — the
        100×-scale fix for the whole-bucket ``to_pandas`` in
        ``_write_combined`` (a single conversation larger than a bucket
        is the remaining hazard; the series codec's ``salt_every_us``
        pattern covers that case, state/encode.py:62-92).

        Derived from immutable input parquet metadata, so run and resume
        agree (and the manifest records n_buckets; resume refuses on
        mismatch)."""
        rows = 0
        for frag in self._input_fragments():
            rows += pq.ParquetFile(frag).metadata.num_rows
        target_rows = (256 << 20) // 48
        return max(32, -(-rows // target_rows))

    # -- stages -----------------------------------------------------------

    def _ingest(self, skip_buckets: set[int]):
        n_buckets = self.n_buckets

        def derive_and_bucket(batch: pa.Table) -> pa.Table:
            batch = derive_transcript_columns(batch)
            batch = batch.append_column("bucket", _stable_bucket(batch["conv_id"], n_buckets))
            return batch.select(["conv_id", "bucket", "ts", "token_len", "is_tool_call"])

        # Read-block count ≈ 2× cluster CPUs (capped at the shard count):
        # one block per shard floods the downstream sort's k-way merge
        # (measured at 20M turns: 306 blocks → SortReduce 104 core-s vs
        # 3 s at 96) while too few blocks under-parallelizes the read.
        # Scales with cluster size exactly like a multi-node deployment
        # would pick its read parallelism.
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        nfiles = (
            sum(1 for f in os.listdir(self.input_path) if f.endswith(".parquet"))
            if os.path.isdir(self.input_path) else 1
        )
        if os.environ.get("GRAFT_NBLOCKS"):
            nblocks = int(os.environ["GRAFT_NBLOCKS"])
        elif nfiles > 1:
            # target ≈ 4×CPUs (GRAFT_BLOCKS_PER_CPU), then round DOWN to an
            # even files-per-task split (306 shards into 61 tasks gives
            # 5-per-task — near-equal tasks).  4 waves of smaller tasks
            # pack straggler spread better than 2 big waves: interleaved
            # A/B at 20M turns measured 25.7 s vs 36.2 s at 8 CPUs and
            # 16.5 s vs 17.9 s at 32 (round-3; VERDICT r2 task #1a).
            target = max(int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "4")) * ncpu, 16)
            if nfiles > target:
                nblocks = nfiles // -(-nfiles // target)  # files per task rounded up
            else:
                nblocks = nfiles
        else:
            nblocks = None
        kw = {"override_num_blocks": nblocks} if nblocks else {}
        ds = read_transcripts(
            self.input_path, columns=["conv_id", "ts", "text", "tool"], **kw
        )
        ds = ds.map_batches(derive_and_bucket, batch_format="pyarrow", zero_copy_batch=True)
        if skip_buckets:
            done = pa.array(sorted(skip_buckets), pa.int64())
            ds = ds.map_batches(
                lambda t: t.filter(pc.invert(pc.is_in(t["bucket"], value_set=done))),
                batch_format="pyarrow",
            )
        return ds

    def _encode_series_bucket(self, df: pd.DataFrame, bucket: int) -> dict:
        """Compress one bucket's conversations' (ts, token_len) series and
        write ``series/bucket=K.parquet`` atomically; returns the lineage
        record (rows, conv count, combined encoder state hash).

        Sort inside the bucket is (conv_id, ts) — ts is unique per
        conversation in transcripts, so the encode order (and therefore
        the byte output) is total and deterministic."""
        from ..state.deltadelta import DeltaDeltaCodec
        from ..state.gorilla import GorillaCodec

        df = df.sort_values(["conv_id", "ts"], kind="mergesort")
        ts_all = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        val_all = df["token_len"].astype("float64").to_numpy()
        keys_all = df["conv_id"].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        bounds = np.concatenate([[0], change, [len(df)]])
        dod, gor = DeltaDeltaCodec(), GorillaCodec()
        rows = {k: [] for k in ("conv_id", "chunk_idx", "n_rows", "ts_blob",
                                "val_blob", "ts_hash", "val_hash")}
        state = hashlib.sha256()
        budget = self.series_chunk_rows
        n_convs = 0
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            n_convs += 1
            # mega-conversation guard: encode in independently-decodable
            # row-budget chunks so no codec call (or decode consumer) ever
            # holds an unbounded series (see __init__ docstring)
            for ci, a in enumerate(range(lo, hi, budget)):
                b = min(a + budget, hi)
                ts_blob = dod.encode(ts_all[a:b])
                val_blob = gor.encode(val_all[a:b])
                th = DeltaDeltaCodec.state_hash(ts_blob)
                vh = GorillaCodec.state_hash(val_blob)
                rows["conv_id"].append(keys_all[lo])
                rows["chunk_idx"].append(ci)
                rows["n_rows"].append(int(b - a))
                rows["ts_blob"].append(ts_blob)
                rows["val_blob"].append(val_blob)
                rows["ts_hash"].append(th)
                rows["val_hash"].append(vh)
                state.update(th.encode())
                state.update(vh.encode())
        table = pa.table({
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "chunk_idx": pa.array(rows["chunk_idx"], pa.int32()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "ts_blob": pa.array(rows["ts_blob"], pa.binary()),
            "val_blob": pa.array(rows["val_blob"], pa.binary()),
            "ts_hash": pa.array(rows["ts_hash"], pa.string()),
            "val_hash": pa.array(rows["val_hash"], pa.string()),
        })
        rel = os.path.join("series", mf.bucket_name(bucket) + ".parquet")
        path = os.path.join(self.out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        os.close(fd)
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
        return {
            "rows": int(df.shape[0]),
            "n_convs": n_convs,
            "encoder_state_hash": state.hexdigest()[:16],
            "path": rel,
        }

    def _write_bucket_tiers(
        self, bucket: int, partial_t: pa.Table, frag_hash: str,
        series_rec: dict | None = None, hash_fp: str | None = None,
    ) -> int:
        """Bucket-local cascade → finalize → (gap-fill) → atomic tier
        writes → manifest.  Returns total rows written.  Exact because
        every conversation is complete within its bucket."""
        from ..stages.rollup import cascade_table, finalize_table

        spec = TRANSCRIPT_SPEC
        record = {
            "bucket": bucket,
            "engine_version": _ENGINE_VERSION,
            "input_fragments_hash": frag_hash,
            "bucket_hash_fingerprint": hash_fp or _bucket_hash_fingerprint(),
            "n_buckets": self.n_buckets,
            "n_convs": int(pc.count_distinct(partial_t["conv_id"]).as_py()),
            "tiers": {},
        }
        if series_rec is not None:
            record["series"] = series_rec

        def bucket_gapfill(pub: pa.Table, tier: str) -> pa.Table:
            from ..functions.windows import TIER_US
            from ..stages.gapfill import gapfill_frame

            # ONE vectorized call for the whole bucket (every conversation
            # at once) — not a pandas apply per conversation (VERDICT r3 #6)
            out = gapfill_frame(
                pub.to_pandas(),
                keys=["conv_id"], window_col="window_start",
                tier_us=TIER_US[tier],
                count_cols=["turn_count"], sum_cols=["token_len_sum"],
                null_cols=["token_len_min", "token_len_max"],
                carry_cols=["token_len_mean", "tool_call_rate"],
                mode=self.gapfill_mode,
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        total_rows = 0
        for i, tier in enumerate(self.tiers):
            if i > 0:
                partial_t = cascade_table(spec, partial_t, tier)
            pub = finalize_table(spec, partial_t)
            if self.gapfill_mode:
                pub = bucket_gapfill(pub, tier)
            pub = pub.sort_by([("conv_id", "ascending"), ("window_start", "ascending")])
            rel = os.path.join(f"tier={tier}", mf.bucket_name(bucket) + ".parquet")
            path = os.path.join(self.out_dir, rel)
            # serialize to memory once: the manifest sha256 hashes the
            # in-memory bytes instead of re-reading the written file
            # (halves the write-stage I/O), and the atomic write keeps
            # the temp-file + rename crash safety
            import io

            buf = io.BytesIO()
            pq.write_table(pub, buf, compression="zstd", row_group_size=1 << 20)
            data = buf.getvalue()
            mf.atomic_write_bytes(path, data)
            record["tiers"][tier] = {
                "rows": int(pub.num_rows),
                "path": rel,
                "sha256": hashlib.sha256(data).hexdigest(),
            }
            total_rows += pub.num_rows
        mf.write_manifest(self.out_dir, bucket, record)
        return total_rows

    def _write_from_partials(self, ds):
        """Default path: THE shuffle carries combiner partials only."""
        from ..stages.rollup import _PartialBatch

        spec = TRANSCRIPT_SPEC
        # NO batch_size here: specifying one blocks Ray's Read→MapBatches
        # operator fusion (downstream min_rows_per_bundled_input vs a
        # row-modifying read).  Unfused, every raw batch INCLUDING TEXT
        # crosses the object store between read and derive; fused, text
        # never leaves the read task.  Input shards are 64k rows, so the
        # combiner sees the same batch geometry either way.
        partials = ds.map_batches(
            _PartialBatch(spec, self.tiers[0], num_partitions=self.n_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return self.merge_and_write(partials)

    def merge_and_write(self, partials):
        """Exchange + merge + write phase over a combiner-partials Dataset
        (``_pkey``-tagged, as produced by ``_PartialBatch``): THE shuffle,
        then per-bucket vectorized merge → tier cascade → atomic writes →
        manifests.  Split out of ``_write_from_partials`` so the bench's
        per-stage scaling isolation (bench.py --stage-scaling) can time
        exactly the production exchange+write path on a pre-materialized
        partials input."""
        from ..stages.rollup import _merge_partials_table

        spec = TRANSCRIPT_SPEC
        frag_hash = mf.fragments_hash(self._input_fragments())
        hash_fp = _bucket_hash_fingerprint()  # computed once, shipped to workers
        job = self

        def write_bucket(g: pa.Table) -> pa.Table:
            bucket = int(g["_pkey"][0].as_py())
            partial_t = _merge_partials_table(spec, g)
            n_convs = int(pc.count_distinct(partial_t["conv_id"]).as_py())
            total_rows = job._write_bucket_tiers(bucket, partial_t, frag_hash,
                                                 hash_fp=hash_fp)
            return pa.table({
                "bucket": pa.array([bucket], pa.int64()),
                "rows": pa.array([total_rows], pa.int64()),
                "n_convs": pa.array([n_convs], pa.int64()),
            })

        return partials.groupby("_pkey").map_groups(write_bucket, batch_format="pyarrow")

    def _write_combined(self, ds):
        """encode_series path: ONE shuffle of narrow raw rows per bucket;
        the bucket group writes compressed series AND computes partials +
        tiers locally from the same rows (single input pass)."""
        from ..stages.rollup import _pa_partial

        spec = TRANSCRIPT_SPEC
        frag_hash = mf.fragments_hash(self._input_fragments())
        hash_fp = _bucket_hash_fingerprint()  # computed once, shipped to workers
        first_tier = self.tiers[0]
        job = self

        def write_bucket_all(g: pa.Table) -> pa.Table:
            bucket = int(g["bucket"][0].as_py())
            series_rec = job._encode_series_bucket(
                g.select(["conv_id", "ts", "token_len"]).to_pandas(), bucket
            )
            ws = window_start_us(g[spec.ts_col], first_tier)
            # _pa_partial over the FULL bucket table already yields one row
            # per (conv, window) — no further merge pass needed
            partial_t = _pa_partial(spec, g.append_column("window_start", ws))
            n_convs = int(pc.count_distinct(partial_t["conv_id"]).as_py())
            total_rows = job._write_bucket_tiers(
                bucket, partial_t, frag_hash, series_rec=series_rec, hash_fp=hash_fp
            )
            return pa.table({
                "bucket": pa.array([bucket], pa.int64()),
                "rows": pa.array([total_rows], pa.int64()),
                "n_convs": pa.array([n_convs], pa.int64()),
            })

        return ds.groupby("bucket").map_groups(write_bucket_all, batch_format="pyarrow")

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
        fp = _bucket_hash_fingerprint()
        drift = [b for b, rec in done.items()
                 if rec.get("bucket_hash_fingerprint") != fp]
        if drift:
            raise RuntimeError(
                f"manifest buckets {drift} were written with a different "
                f"bucket-hash implementation (polars upgrade?); resuming "
                f"would reassign conversations across buckets — recompute "
                f"from scratch (clear {self.out_dir})"
            )
        nb_mismatch = [b for b, rec in done.items()
                       if rec.get("n_buckets", self.n_buckets) != self.n_buckets]
        if nb_mismatch:
            raise RuntimeError(
                f"manifest buckets {nb_mismatch} were written with a "
                f"different n_buckets; resuming would reassign "
                f"conversations across buckets (clear {self.out_dir})"
            )
        todo = [b for b in range(self.n_buckets) if b not in done]
        if not todo:
            return {"completed": self.n_buckets, "newly_written": 0, "skipped": len(done)}
        ds = self._ingest(set(done))
        writer = self._write_combined if self.encode_series else self._write_from_partials
        result = writer(ds).to_pandas()
        # buckets whose hash range simply contained no conversations: the
        # pass covered all remaining input, so they are durably complete
        for b in todo:
            if len(result) == 0 or b not in set(result["bucket"]):
                mf.write_manifest(self.out_dir, b, {
                    "bucket": b,
                    "engine_version": _ENGINE_VERSION,
                    "input_fragments_hash": frag_hash,
                    "bucket_hash_fingerprint": fp,
                    "n_buckets": self.n_buckets,
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
