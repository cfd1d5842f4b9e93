"""DocsCurationJob: correctness vs the streaming prep pipeline, byte-
identical reruns, resume-skips-finished-buckets, and lineage guards."""

import glob
import hashlib
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from conftest import SF_CHECK

DOCS = f"{SF_CHECK}/documents.parquet"


def _read_curated(out_dir: str) -> pd.DataFrame:
    parts = sorted(glob.glob(os.path.join(out_dir, "curated", "*.parquet")))
    return (
        pd.concat([pq.read_table(p).to_pandas() for p in parts])
        .sort_values("doc_id").reset_index(drop=True)
    )


def _tree_hash(out_dir: str) -> dict:
    return {
        os.path.relpath(p, out_dir):
        hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(out_dir, "curated", "*")))
    }


def test_docs_job_matches_streaming_prep_and_resumes(tmp_path):
    from s_tsfe_dl_ray.pipelines.docs_job import DocsCurationJob
    from s_tsfe_dl_ray.pipelines.docs_prep import prep_documents

    out = str(tmp_path / "run1")
    job = DocsCurationJob(DOCS, out, n_buckets=8)
    s1 = job.run()
    assert s1["buckets_written"] == 8 and s1["buckets_skipped"] == 0

    curated = _read_curated(out)
    ref = (
        prep_documents(DOCS).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    cols = ["doc_id", "n_tokens", "quality", "lang_pred"]
    pd.testing.assert_frame_equal(curated[cols], ref[cols],
                                  check_dtype=False)

    # second run: everything skipped, tree untouched
    h1 = _tree_hash(out)
    s2 = DocsCurationJob(DOCS, out, n_buckets=8).run()
    assert s2["buckets_written"] == 0 and s2["buckets_skipped"] == 8
    assert s2["rows"] == s1["rows"]
    assert _tree_hash(out) == h1

    # delete one bucket's shard+manifest: only that bucket recomputes,
    # and its bytes come back identical
    os.remove(os.path.join(out, "curated", "bucket=3.parquet"))
    os.remove(os.path.join(out, "_manifest", "bucket=00003.json"))
    s3 = DocsCurationJob(DOCS, out, n_buckets=8).run()
    assert s3["buckets_written"] == 1 and s3["buckets_skipped"] == 7
    assert _tree_hash(out) == h1

    # changed parameters refuse to mix with the existing lineage
    with pytest.raises(RuntimeError, match="different curation parameters"):
        DocsCurationJob(DOCS, out, n_buckets=8, min_quality=0.9).run()
    with pytest.raises(RuntimeError, match="n_buckets|curation parameters"):
        DocsCurationJob(DOCS, out, n_buckets=4).run()


def test_docs_job_empty_buckets_get_manifests(tmp_path):
    from s_tsfe_dl_ray.pipelines.docs_job import DocsCurationJob

    out = str(tmp_path / "strict")
    # absurd quality bar: everything filtered, every bucket legitimately
    # empty — and the rerun must SKIP all of them
    job = DocsCurationJob(DOCS, out, n_buckets=4, min_quality=2.0)
    s1 = job.run()
    assert s1["rows"] == 0 and s1["buckets_written"] == 4
    s2 = DocsCurationJob(DOCS, out, n_buckets=4, min_quality=2.0).run()
    assert s2["buckets_written"] == 0 and s2["buckets_skipped"] == 4


def test_cli_entrypoints(tmp_path):
    """`python -m s_tsfe_dl_ray {rollup,curate}` run end-to-end in a
    fresh process (the `ray job submit` surface) and print ONE JSON
    summary line; a second submit resumes by skipping buckets."""
    import json
    import subprocess
    import sys

    from s_tsfe_dl_ray.synth import transcripts_parquet

    corpus = transcripts_parquet(n_turns=5_000, seed=7)
    out = str(tmp_path / "cli_rollup")
    cmd = [sys.executable, "-m", "s_tsfe_dl_ray", "rollup",
           "--input", corpus, "--out", out, "--n-buckets", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd="/root/repo", timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["newly_written"] >= 1 and s1["skipped"] == 0
    r2 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd="/root/repo", timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["newly_written"] == 0 and s2["skipped"] == 4

    outc = str(tmp_path / "cli_curate")
    cmdc = [sys.executable, "-m", "s_tsfe_dl_ray", "curate",
            "--input", DOCS, "--out", outc, "--n-buckets", "4"]
    rc = subprocess.run(cmdc, capture_output=True, text=True,
                        cwd="/root/repo", timeout=300)
    assert rc.returncode == 0, rc.stderr[-2000:]
    sc = json.loads(rc.stdout.strip().splitlines()[-1])
    assert sc["buckets_written"] == 4
    rc2 = subprocess.run(cmdc, capture_output=True, text=True,
                         cwd="/root/repo", timeout=300)
    sc2 = json.loads(rc2.stdout.strip().splitlines()[-1])
    assert sc2["buckets_written"] == 0 and sc2["buckets_skipped"] == 4


def test_docs_job_refuses_changed_input(tmp_path):
    """Lineage identity is the FRAGMENT LIST (immutable-data-lake
    assumption, same as the transcript job): a new shard appearing in
    the input directory must refuse to mix with the old manifests."""
    from s_tsfe_dl_ray.pipelines.docs_job import DocsCurationJob

    src_dir = tmp_path / "input"
    src_dir.mkdir()
    shutil.copy(DOCS, src_dir / "part-0.parquet")
    out = str(tmp_path / "out")
    DocsCurationJob(str(src_dir), out, n_buckets=4).run()
    t = pq.read_table(src_dir / "part-0.parquet")
    pq.write_table(t.slice(0, 10), src_dir / "part-1.parquet")
    with pytest.raises(RuntimeError, match="different input fragments"):
        DocsCurationJob(str(src_dir), out, n_buckets=4).run()
