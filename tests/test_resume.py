"""Checkpoint/resume: byte-identical output, no recompute of completed
partitions (SURVEY.md §5 invariant: resume-from-manifest produces
byte-identical output — analog of the reference's save/reload equality)."""

from __future__ import annotations

import os

import pytest

from s_tsfe_dl_ray.state import manifest as mf


def _tree_hashes(out_dir: str) -> dict[str, str]:
    out = {}
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, out_dir)] = mf.file_sha256(p)
    return out


@pytest.fixture(scope="module")
def small_transcripts(tmp_path_factory):
    from s_tsfe_dl_ray.synth import transcripts_parquet

    base = str(tmp_path_factory.mktemp("synth_job"))
    return transcripts_parquet(n_turns=10_000, seed=42, base_dir=base)


def test_job_runs_and_is_idempotent(small_transcripts, tmp_path):
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob

    out = str(tmp_path / "out")
    job = TranscriptRollupJob(small_transcripts, out, n_buckets=8)
    r1 = job.run()
    assert r1["completed"] == 8 and r1["newly_written"] >= 1
    hashes1 = _tree_hashes(out)
    assert hashes1, "no parquet written"

    # rerun: everything skipped, nothing rewritten
    mtimes = {p: os.path.getmtime(os.path.join(out, p)) for p in hashes1}
    r2 = job.run()
    assert r2["newly_written"] == 0 and r2["skipped"] == 8
    assert {p: os.path.getmtime(os.path.join(out, p)) for p in hashes1} == mtimes


def test_resume_is_byte_identical(small_transcripts, tmp_path):
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob

    # clean uninterrupted run
    full = str(tmp_path / "full")
    TranscriptRollupJob(small_transcripts, full, n_buckets=8).run()
    expected = _tree_hashes(full)

    # interrupted run: simulate a crash after 3 buckets by deleting the
    # other manifests + files (a crash leaves exactly this: some buckets
    # durable, some absent)
    part = str(tmp_path / "part")
    job = TranscriptRollupJob(small_transcripts, part, n_buckets=8)
    job.run()
    keep = {0, 1, 2}
    for b, rec in list(mf.read_manifests(part).items()):
        if b not in keep:
            os.unlink(mf.manifest_path(part, b))
            for tier_info in rec["tiers"].values():
                if "path" in tier_info:
                    p = os.path.join(part, tier_info["path"])
                    if os.path.exists(p):
                        os.unlink(p)

    r = job.run()  # resume
    assert r["skipped"] == 3
    assert _tree_hashes(part) == expected  # byte-identical tree


def test_job_output_matches_direct_pipeline(small_transcripts, tmp_path):
    """The checkpointed job computes the same tier table as the plain
    pipeline (bucketing must not change results)."""
    import pandas as pd

    from conftest import assert_frames_match, to_pdf
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers

    out = str(tmp_path / "out2")
    job = TranscriptRollupJob(small_transcripts, out, n_buckets=8)
    job.run()
    got = to_pdf(job.read_tier("1h"))
    expected = to_pdf(transcript_tiers(small_transcripts, tiers=("1m", "1h"))["1h"])
    assert_frames_match(got, expected)


def test_lineage_mismatch_refused(small_transcripts, tmp_path):
    """A manifest built from different input must not be silently mixed."""
    import json

    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob

    out = str(tmp_path / "out3")
    job = TranscriptRollupJob(small_transcripts, out, n_buckets=4)
    job.run()
    p = mf.manifest_path(out, 0)
    rec = json.load(open(p))
    rec["input_fragments_hash"] = "deadbeefdeadbeef"
    mf.atomic_write_bytes(p, json.dumps(rec).encode())
    with pytest.raises(RuntimeError, match="different input"):
        job.run()
