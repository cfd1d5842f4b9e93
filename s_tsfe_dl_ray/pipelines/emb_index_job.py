"""Durable, resumable embedding ANN-index build — the third durable job
beside the transcript rollup (pipelines/job.py) and the docs curation
(pipelines/docs_job.py): IVF coarse quantizer + per-bucket uint8-
quantized vectors, written as partitioned parquet with per-bucket
lineage manifests, consumed by a pruned-read search that opens ONLY the
probed buckets.

Why a JOB and not just the `knn_ivf` operator: at 100 TB the index
build is the expensive pass (read every vector once, assign, quantize,
write), and it must survive preemption — a failed run resumes by
SKIPPING finished buckets, a changed input is refused by the lineage
hash rather than silently mixed, and a re-run is byte-identical (sorted
rows, fixed compression) so shards are content-addressable.

Determinism: the k-means fit sample is selected by a per-row hash
threshold (md5(vec_id)), NOT `random_sample` — the same rows are chosen
at any parallelism/blocking, so centroids (and therefore every bucket
file) reproduce bit-for-bit.  Reference analog: the reference's
save→load→resume weight checkpointing (SURVEY.md §2.1/§2.3); here the
"weights" are the coarse quantizer and the checkpoint is the shard +
manifest.

Scale shape: one streaming pass over the corpus; only (bucket, vec_id,
vmin, vmax, codes) crosses the bucket exchange — codes are uint8 (4–8×
narrower than float32); the centroid table is a broadcast-sized
artifact (n_clusters × d floats).
"""

from __future__ import annotations

import hashlib
import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from ..sources.parquet import read_table
from ..state import manifest as mf
from ..stages.similarity import _kmeans_fit, _l2_normalize, _stack_embeddings

_CENTROID_BUCKET = 1_000_000  # manifest slot for the phase-A artifact


def _hash_u64(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-id u64 (md5 prefix) — parallelism-independent."""
    out = np.empty(len(ids), dtype=np.uint64)
    for i, v in enumerate(ids):
        out[i] = int.from_bytes(
            hashlib.md5(str(int(v)).encode()).digest()[:8], "big")
    return out


class EmbIndexJob:
    """``EmbIndexJob(input_path, out_dir).run()`` → summary dict.

    Output tree::

        out_dir/centroids.parquet            # phase A (coarse quantizer)
        out_dir/index/bucket=K.parquet       # vec_id, vmin, vmax, codes
        out_dir/_manifests/                  # lineage per bucket (+ A)

    ``search(queries, k, nprobe)`` reads ONLY the probed bucket files.
    """

    def __init__(self, input_path: str, out_dir: str, *,
                 n_clusters: int = 16, sample_per_cluster: int = 50,
                 seed: int = 42):
        if n_clusters < 1:
            raise ValueError("n_clusters must be >= 1")
        self.input_path = input_path
        self.out_dir = out_dir
        self.n_clusters = int(n_clusters)
        self.sample_per_cluster = int(sample_per_cluster)
        self.seed = int(seed)

    # -- phase A: deterministic bounded fit --------------------------------

    def _input_fragments(self) -> list[str]:
        p = self.input_path
        if os.path.isdir(p):
            return [os.path.join(p, f) for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")]
        return [p]

    def _fit_centroids(self, frag_hash: str) -> np.ndarray:
        """Hash-threshold sample (deterministic at any parallelism) →
        driver k-means on ~sample_per_cluster·k rows → artifact+manifest."""
        ds = read_table(self.input_path, columns=["vec_id", "embedding"])
        cnt = ds.count()
        target = max(self.sample_per_cluster * self.n_clusters,
                     4 * self.n_clusters)
        frac = min(1.0, target / max(cnt, 1))
        thresh = np.uint64(min(int(frac * float(2**64 - 1)), 2**64 - 1))

        def pick(b: pd.DataFrame) -> pd.DataFrame:
            keep = _hash_u64(b["vec_id"].to_numpy()) <= thresh
            return b[keep]

        sample = (ds.map_batches(pick, batch_format="pandas")
                  .to_pandas().sort_values("vec_id"))
        if len(sample) < self.n_clusters:
            # undershoot fallback: the `target` smallest vec_ids, picked
            # by a DISTRIBUTED sort + limit so the driver pull stays
            # bounded at `target` rows — never the whole table
            sample = (read_table(self.input_path,
                                 columns=["vec_id", "embedding"])
                      .sort("vec_id").limit(int(target))
                      .to_pandas().sort_values("vec_id"))
        mat = _l2_normalize(_stack_embeddings(sample, "embedding"))
        cent = _kmeans_fit(mat, self.n_clusters)
        t = pa.table({
            "cluster": pa.array(np.arange(len(cent), dtype=np.int64)),
            "centroid": pa.array(list(cent.astype(np.float64))),
        })
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="zstd")
        path = os.path.join(self.out_dir, "centroids.parquet")
        mf.atomic_write_bytes(path, buf.getvalue())
        mf.write_manifest(self.out_dir, _CENTROID_BUCKET, {
            "bucket": _CENTROID_BUCKET,
            "input_fragments_hash": frag_hash,
            "n_clusters": self.n_clusters,
            "sample_rows": int(len(sample)),
            "files": {"centroids.parquet": mf.file_sha256(path)},
        })
        return cent

    def _load_centroids(self) -> np.ndarray:
        t = pq.read_table(os.path.join(self.out_dir, "centroids.parquet"))
        return np.stack(t["centroid"].to_numpy(zero_copy_only=False))

    # -- phase B: bucketed assign + quantize + write -----------------------

    def _write_bucket(self, g: pd.DataFrame, frag_hash: str,
                      bucket: int | None = None) -> dict:
        bucket = int(g["bucket"].iloc[0]) if bucket is None else int(bucket)
        g = g.sort_values("vec_id", kind="mergesort")
        t = pa.table({
            "vec_id": pa.array(g["vec_id"].to_numpy(dtype=np.int64)),
            "vmin": pa.array(g["vmin"].to_numpy(dtype=np.float64)),
            "vmax": pa.array(g["vmax"].to_numpy(dtype=np.float64)),
            "codes": pa.array(list(g["codes"]), pa.binary()),
        })
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="zstd",
                       store_schema=True, write_statistics=True)
        path = os.path.join(self.out_dir, "index",
                            f"bucket={bucket}.parquet")
        mf.atomic_write_bytes(path, buf.getvalue())
        rec = {
            "bucket": bucket,
            "rows": int(len(g)),
            "input_fragments_hash": frag_hash,
            "n_clusters": self.n_clusters,
            "files": {f"index/bucket={bucket}.parquet":
                      mf.file_sha256(path)},
        }
        mf.write_manifest(self.out_dir, bucket, rec)
        return rec

    def run(self) -> dict:
        done = mf.read_manifests(self.out_dir)
        frag_hash = mf.fragments_hash(self._input_fragments())
        stale = [b for b, rec in done.items()
                 if rec.get("input_fragments_hash") != frag_hash]
        if stale:
            raise RuntimeError(
                f"manifest buckets {stale} were built from different input "
                f"fragments; refusing to mix lineages (clear {self.out_dir})")
        drift = [b for b, rec in done.items()
                 if rec.get("n_clusters") != self.n_clusters]
        if drift:
            raise RuntimeError(
                f"manifest buckets {drift} were written with a different "
                f"quantizer config; resuming would mix index geometries")

        if _CENTROID_BUCKET in done:
            cent = self._load_centroids()
        else:
            cent = self._fit_centroids(frag_hash)
        done.pop(_CENTROID_BUCKET, None)

        todo = [b for b in range(self.n_clusters) if b not in done]
        if not todo:
            return {"buckets_written": 0, "buckets_skipped": len(done),
                    "rows": sum(r["rows"] for r in done.values())}

        import ray

        cent_ref = ray.put(cent)
        todo_arr = pa.array(sorted(todo))

        def assign(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            mat = _stack_embeddings(b, "embedding")
            unit = _l2_normalize(mat)
            bucket = np.argmax(unit @ c.T, axis=1).astype(np.int64)
            vmin = mat.min(axis=1)
            vmax = mat.max(axis=1)
            span = np.where(vmax > vmin, vmax - vmin, 1.0)
            codes = np.round(
                (mat - vmin[:, None]) / span[:, None] * 255.0
            ).astype(np.uint8)
            return pd.DataFrame({
                "bucket": bucket,
                "vec_id": b["vec_id"].to_numpy(dtype=np.int64),
                "vmin": vmin, "vmax": vmax,
                "codes": [c.tobytes() for c in codes],
            })

        rows = read_table(self.input_path, columns=["vec_id", "embedding"]) \
            .map_batches(assign, batch_format="pandas")
        rows = rows.map_batches(
            lambda t: t.filter(pc.is_in(t["bucket"], value_set=todo_arr)),
            batch_format="pyarrow")

        job, job_hash = self, frag_hash

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            rec = job._write_bucket(g, job_hash)
            return pd.DataFrame({
                "bucket": pd.Series([rec["bucket"]], dtype="int64"),
                "rows": pd.Series([rec["rows"]], dtype="int64")})

        written = (rows.groupby("bucket")
                   .map_groups(write_bucket, batch_format="pandas")
                   .to_pandas())
        if "bucket" not in written.columns:
            written = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                    "rows": pd.Series([], dtype="int64")})
        missing = sorted(set(todo) - set(written["bucket"].tolist()))
        for b in missing:
            self._write_bucket(pd.DataFrame({
                "bucket": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "vmin": pd.Series([], dtype="float64"),
                "vmax": pd.Series([], dtype="float64"),
                "codes": pd.Series([], dtype="object"),
            }), frag_hash, bucket=b)
        return {
            "buckets_written": int(len(written)) + len(missing),
            "buckets_skipped": len(done),
            "rows": int(written["rows"].sum())
            + sum(r["rows"] for r in done.values()),
        }

    # -- consumption: pruned-read search -----------------------------------

    def search(self, queries: np.ndarray, *, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        """Cosine top-k per query reading ONLY the probed bucket files.

        ``queries``: (q, d) float matrix.  Returns ``query_idx,
        neighbor_id, cosine`` rows (k per query, cosine from the uint8
        reconstruction — approximation bounded by the quantization
        error the `emb_quantize_error` audit measures).
        """
        cent = self._load_centroids()
        q = _l2_normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
        need = sorted(set(probes.ravel().tolist()))
        frames = []
        for b in need:
            path = os.path.join(self.out_dir, "index",
                                f"bucket={b}.parquet")
            t = pq.read_table(path)
            if t.num_rows == 0:
                continue
            codes = np.frombuffer(
                b"".join(t["codes"].to_pylist()), dtype=np.uint8
            ).reshape(t.num_rows, -1).astype(np.float64)
            vmin = t["vmin"].to_numpy()
            vmax = t["vmax"].to_numpy()
            span = np.where(vmax > vmin, vmax - vmin, 1.0)
            mat = codes / 255.0 * span[:, None] + vmin[:, None]
            frames.append((b, t["vec_id"].to_numpy(),
                           _l2_normalize(mat)))
        out = {"query_idx": [], "neighbor_id": [], "cosine": []}
        for qi in range(len(q)):
            mats, ids = [], []
            probe_set = set(probes[qi].tolist())
            for b, vid, mat in frames:
                if b in probe_set:
                    mats.append(mat)
                    ids.append(vid)
            if not mats:
                continue
            cand = np.vstack(mats)
            cid = np.concatenate(ids)
            cos = cand @ q[qi]
            top = np.argsort(-cos, kind="stable")[:k]
            out["query_idx"].extend([qi] * len(top))
            out["neighbor_id"].extend(cid[top].tolist())
            out["cosine"].extend(cos[top].tolist())
        return pd.DataFrame(out)
