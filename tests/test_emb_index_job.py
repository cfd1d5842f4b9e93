"""Durable embedding-index job: determinism, resume, lineage, recall."""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _file_hashes(out_dir: str) -> dict[str, str]:
    out = {}
    for root, _, files in os.walk(out_dir):
        for f in sorted(files):
            p = os.path.join(root, f)
            rel = os.path.relpath(p, out_dir)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

    out = str(tmp_path_factory.mktemp("embidx"))
    job = EmbIndexJob(f"{SF}/embeddings.parquet", out, n_clusters=8)
    summary = job.run()
    return job, out, summary


def test_build_covers_corpus(built):
    import pyarrow.parquet as pq

    job, out, summary = built
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert summary["rows"] == n
    assert summary["buckets_written"] == 8


def test_rerun_skips_and_is_byte_identical(built):
    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

    job, out, _ = built
    before = _file_hashes(out)
    s2 = EmbIndexJob(f"{SF}/embeddings.parquet", out, n_clusters=8).run()
    assert s2["buckets_written"] == 0 and s2["buckets_skipped"] == 8
    assert _file_hashes(out) == before


def test_resume_rebuilds_only_missing_bucket(built):
    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob
    from s_tsfe_dl_ray.state import manifest as mf

    job, out, _ = built
    before = _file_hashes(out)
    # kill one bucket's manifest + file
    victim = 3
    os.remove(mf.manifest_path(out, victim))
    os.remove(os.path.join(out, "index", f"bucket={victim}.parquet"))
    s = EmbIndexJob(f"{SF}/embeddings.parquet", out, n_clusters=8).run()
    assert s["buckets_written"] == 1 and s["buckets_skipped"] == 7
    assert _file_hashes(out) == before  # rebuilt bucket is byte-identical


def test_lineage_mismatch_refused(built, tmp_path):
    import pyarrow.parquet as pq

    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

    job, out, _ = built
    # different input (a truncated copy) against the existing manifests
    t = pq.read_table(f"{SF}/embeddings.parquet")
    other = str(tmp_path / "other.parquet")
    pq.write_table(t.slice(0, 10), other)
    with pytest.raises(RuntimeError, match="lineage"):
        EmbIndexJob(other, out, n_clusters=8).run()


def test_config_drift_refused(built):
    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

    job, out, _ = built
    with pytest.raises(RuntimeError, match="quantizer config"):
        EmbIndexJob(f"{SF}/embeddings.parquet", out, n_clusters=4).run()


def test_search_recall_vs_bruteforce(built):
    import pyarrow.parquet as pq

    job, out, _ = built
    t = pq.read_table(f"{SF}/embeddings.parquet")
    flat = np.array([np.asarray(v, dtype=np.float64)
                     for v in t["embedding"].to_pylist()])
    ids = t["vec_id"].to_numpy()
    unit = flat / np.maximum(
        np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    qn = 8
    res = job.search(flat[:qn], k=5, nprobe=4)
    hits = 0
    for qi in range(qn):
        cos = unit @ unit[qi]
        truth = set(ids[np.argsort(-cos, kind="stable")[:5]].tolist())
        got = set(res[res.query_idx == qi].neighbor_id.tolist())
        hits += len(truth & got)
    recall = hits / (qn * 5)
    assert recall >= 0.7, recall
