"""Durable, resumable training-pair EXPORT job: the fourth durable job
beside the transcript rollup (pipelines/job.py), docs curation
(pipelines/docs_job.py) and ANN-index build (pipelines/emb_index_job.py)
— turn transcript Parquet into aligned supervised (input-window,
label-window) samples, the reference's forecasting batch generator
(experiments/timeseries_batch_generator.py:186-299) re-expressed as a
partitioned, checkpointed Dataset write instead of a driver-held
(B, L, V) tensor stream.

Per conversation ordered by ``turn_idx``, the exported rows are

    input_win = tl[p-L : p : r],   label_win = tl[p : p+Lt : r]

over the per-turn series (``window_pairs_frame`` — the same kernel the
:func:`~..stages.slide.window_pairs` stage runs), with the reference's
``end_index`` anchor bound and stride/dilation semantics.  Two
payloads: ``tokens`` (token-length series → ``list<int64>`` windows,
forecasting-shaped) and ``text`` (the turn texts themselves →
``list<string>`` windows — the actual next-turns LLM training sample).

Scale shape: ONE hash exchange of (bucket, conv_id, turn_idx, v) rows —
in ``tokens`` mode the text is consumed by the derive and never crosses
the shuffle; in ``text`` mode the text IS the exported payload, so it
crosses once (inherent to the output, same volume as the final write).
Bucket = md5(conv_id) (library-independent,
stable across runs), so every conversation lands whole in one bucket
and window generation is bucket-local and exact.  Each bucket writes
one deterministic parquet shard (sorted, fixed compression →
byte-identical reruns) plus a lineage manifest; a re-run SKIPS finished
buckets, and changed inputs or changed window parameters are refused by
the lineage/param hash rather than silently mixed.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from ..functions.derive import token_count
from ..sources.parquet import read_table
from ..stages.dedup import md5_hex
from ..stages.slide import window_pairs_frame
from ..state import manifest as mf


class WindowPairExportJob:
    """``WindowPairExportJob(input_path, out_dir).run()`` → summary dict.

    Output tree: ``out_dir/pairs/bucket=K.parquet`` (+ ``_manifests/``)
    with columns ``conv_id, anchor_idx, input_win, label_win``
    (``list<int64>`` in tokens mode, ``list<string>`` in text mode)
    sorted by (conv_id, anchor_idx).
    """

    def __init__(
        self,
        input_path: str,
        out_dir: str,
        *,
        n_buckets: int | None = None,
        length: int = 8,
        length_target: int = 4,
        stride: int = 4,
        sampling_rate: int = 1,
        payload: str = "tokens",
    ):
        if n_buckets is not None and n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        if payload not in ("tokens", "text"):
            raise ValueError("payload must be 'tokens' or 'text'")
        self.input_path = input_path
        self.out_dir = out_dir
        self.payload = payload
        self.n_buckets = (n_buckets if n_buckets is not None
                          else self._auto_n_buckets())
        self.length = int(length)
        self.length_target = int(length_target)
        self.stride = int(stride)
        self.sampling_rate = int(sampling_rate)
        # "tokens": windows over the per-turn token-length series
        # (list<int64> — forecasting-shaped).  "text": windows over the
        # turn TEXTS themselves (list<string> — the actual next-turns
        # LLM training sample; per-turn text equality rides through
        # unchanged under the stable (conv, turn_idx) ordering).

    # -- dataflow ----------------------------------------------------------

    def _auto_n_buckets(self) -> int:
        """``n_buckets=None``: scale the bucket count with input size so
        a bucket group's in-memory rows stay bounded as the corpus grows
        (the rollup job's auto-sizing, pipelines/job.py).  Tokens mode
        holds narrow ~56 B rows per turn; text mode holds the turn
        texts, so it budgets actual input bytes.  Target ≈256 MiB per
        bucket, floor 32 (unchanged behavior at bench scale); derived
        from immutable parquet metadata so run and resume agree."""
        rows = 0
        nbytes = 0
        for frag in self._input_fragments():
            md = pq.ParquetFile(frag).metadata
            rows += md.num_rows
            nbytes += sum(md.row_group(i).total_byte_size
                          for i in range(md.num_row_groups))
        if self.payload == "text":
            # parquet is compressed; assume ~3x expansion in memory
            return max(32, -(-(nbytes * 3) // (256 << 20)))
        target_rows = (256 << 20) // 56
        return max(32, -(-rows // target_rows))

    def _input_fragments(self) -> list[str]:
        p = self.input_path
        if os.path.isdir(p):
            return [os.path.join(p, f) for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")]
        return [p]

    def _params(self) -> dict:
        return {"n_buckets": self.n_buckets, "length": self.length,
                "length_target": self.length_target,
                "stride": self.stride,
                "sampling_rate": self.sampling_rate,
                "payload": self.payload}

    def _narrow_rows(self, todo: list[int]) -> Dataset:
        """(bucket, conv_id, turn_idx, v) per turn; in tokens mode the
        text folds to its token length at the map; rows outside
        ``todo`` buckets are pruned before the exchange."""
        ds = read_table(self.input_path,
                        columns=["conv_id", "turn_idx", "text"])
        nb = self.n_buckets
        todo_arr = pa.array(sorted(todo))

        text_mode = self.payload == "text"

        def narrow(t: pa.Table) -> pd.DataFrame:
            conv = t["conv_id"].to_pandas()
            h = md5_hex(conv)
            out = pd.DataFrame({
                "bucket": h.str.slice(0, 12).apply(int, base=16) % nb,
                "conv_id": conv,
                "turn_idx": pc.cast(t["turn_idx"], pa.int64())
                .to_numpy(zero_copy_only=False),
            })
            if text_mode:
                out["v"] = t["text"].to_pandas()
            else:
                out["v"] = pc.cast(token_count(t["text"]), pa.int64()) \
                    .to_numpy(zero_copy_only=False)
            return out

        rows = ds.map_batches(narrow, batch_format="pyarrow")

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["bucket"], value_set=todo_arr))

        return rows.map_batches(prune, batch_format="pyarrow")

    def _pairs_frame(self, g: pd.DataFrame) -> pd.DataFrame:
        out = window_pairs_frame(
            g, keys=["conv_id"], order_by=["turn_idx"], vcols=["v"],
            names=[("input_win", "label_win")], length=self.length,
            length_target=self.length_target, stride=self.stride,
            sampling_rate=self.sampling_rate)
        return out.sort_values(["conv_id", "anchor_idx"],
                               kind="mergesort").reset_index(drop=True)

    def _write_bucket(self, g: pd.DataFrame, frag_hash: str,
                      bucket: int | None = None) -> dict:
        bucket = int(g["bucket"].iloc[0]) if bucket is None else int(bucket)
        pairs = self._pairs_frame(g)
        if self.payload == "text":
            wtype = pa.list_(pa.string())

            def cells(col):
                return pa.array([list(a) for a in pairs[col]], wtype)
        else:
            wtype = pa.list_(pa.int64())

            def cells(col):
                return pa.array(
                    [np.asarray(a, dtype=np.int64) for a in pairs[col]],
                    wtype)

        t = pa.table({
            "conv_id": pa.array(pairs["conv_id"].to_numpy(dtype=object),
                                pa.string()),
            "anchor_idx": pa.array(
                pairs["anchor_idx"].to_numpy(dtype=np.int64)),
            "input_win": cells("input_win"),
            "label_win": cells("label_win"),
        })
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="zstd",
                       store_schema=True, write_statistics=True)
        path = os.path.join(self.out_dir, "pairs",
                            f"bucket={bucket}.parquet")
        mf.atomic_write_bytes(path, buf.getvalue())
        rec = {
            "bucket": bucket,
            "rows": int(len(pairs)),
            "input_rows": int(len(g)),
            "input_fragments_hash": frag_hash,
            **self._params(),
            "files": {f"pairs/bucket={bucket}.parquet":
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
        params = self._params()
        drift = [b for b, rec in done.items()
                 if any(rec.get(k) != v for k, v in params.items())]
        if drift:
            raise RuntimeError(
                f"manifest buckets {drift} were written with different "
                f"window parameters; resuming would mix sample semantics "
                f"(clear {self.out_dir})")
        todo = [b for b in range(self.n_buckets) if b not in done]
        if not todo:
            return {"buckets_written": 0, "buckets_skipped": len(done),
                    "rows": sum(r["rows"] for r in done.values())}

        job = self

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            rec = job._write_bucket(g, frag_hash)
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
        if "bucket" not in written.columns:
            written = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                    "rows": pd.Series([], dtype="int64")})
        missing = sorted(set(todo) - set(written["bucket"].tolist()))
        for b in missing:
            self._write_bucket(_empty_bucket_frame(), frag_hash, bucket=b)
        return {
            "buckets_written": int(len(written)) + len(missing),
            "buckets_skipped": len(done),
            "rows": int(written["rows"].sum())
            + sum(r["rows"] for r in done.values()),
        }

    def read_pairs(self):
        """The job's output as a Dataset (all buckets)."""
        import ray.data

        ds = ray.data.read_parquet(os.path.join(self.out_dir, "pairs"))
        if "bucket" in ds.schema().names:
            ds = ds.drop_columns(["bucket"])
        return ds


def _empty_bucket_frame() -> pd.DataFrame:
    return pd.DataFrame({
        "bucket": pd.Series([], dtype="int64"),
        "conv_id": pd.Series([], dtype="object"),
        "turn_idx": pd.Series([], dtype="int64"),
        "v": pd.Series([], dtype="object"),
    })
