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


def test_job_gapfill_matches_standalone_stage(small_transcripts, tmp_path):
    """Job-level gap-fill (bucket-local) must equal the distributed
    gapfill stage applied to the plain pipeline's tier."""
    from conftest import assert_frames_match, to_pdf
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    out = str(tmp_path / "gf")
    job = TranscriptRollupJob(small_transcripts, out, n_buckets=8, gapfill_mode="ffill")
    job.run()
    got = to_pdf(job.read_tier("1h"))
    tier = transcript_tiers(small_transcripts, tiers=("1m", "1h"))["1h"]
    expected = to_pdf(gapfill(
        tier, keys=["conv_id"], tier="1h",
        count_cols=["turn_count"], sum_cols=["token_len_sum"],
        null_cols=["token_len_min", "token_len_max"],
        carry_cols=["token_len_mean", "tool_call_rate"], mode="ffill",
    ))
    assert_frames_match(got, expected)


def test_order_fingerprint_invariant_across_parallelism(small_transcripts):
    """Per-turn text equality under stable ordering: fingerprints are
    identical regardless of blocking/batching of the input."""
    import ray.data

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.scan import order_fingerprint

    def run(num_blocks):
        ds = ray.data.read_parquet(small_transcripts, override_num_blocks=num_blocks)
        out = to_pdf(order_fingerprint(
            ds, key="conv_id", order_by=["turn_idx", "ts"], col="text"
        ))
        return out.sort_values("conv_id").reset_index(drop=True)

    a, b = run(2), run(37)
    assert (a.conv_id == b.conv_id).all()
    assert (a.fingerprint == b.fingerprint).all()
    assert (a.n_rows == b.n_rows).all()


def test_combiner_bounds_hot_key_shuffle_rows(small_transcripts):
    """Skew handling: the shuffle carries per-batch partials, so even the
    100×-median hot conversations contribute at most (batches × windows)
    rows — never their raw turn count."""
    import ray.data

    from s_tsfe_dl_ray.pipelines.transcript_rollup import TRANSCRIPT_SPEC
    from s_tsfe_dl_ray.stages.rollup import _PartialBatch
    from s_tsfe_dl_ray.functions.derive import derive_transcript_columns

    ds = ray.data.read_parquet(small_transcripts)
    ds = ds.map_batches(derive_transcript_columns, batch_format="pyarrow")
    ds = ds.select_columns(["conv_id", "ts", "token_len", "is_tool_call"])
    partials = ds.map_batches(
        _PartialBatch(TRANSCRIPT_SPEC, "1d"), batch_format="pyarrow",
        batch_size=64 * 1024, zero_copy_batch=True,
    ).to_pandas()
    raw = ray.data.read_parquet(small_transcripts).to_pandas()
    hot = raw.conv_id.value_counts().index[0]
    hot_turns = (raw.conv_id == hot).sum()
    hot_partials = (partials.conv_id == hot).sum()
    assert hot_turns >= 1000          # fixture really is hot
    assert hot_partials < hot_turns / 5   # combiner collapsed the skew


def test_job_encode_series_manifest_hashes(small_transcripts, tmp_path):
    """encode_series=True persists compressed per-conv series per bucket
    and records encoder state hashes in the manifest; decoding the series
    files reproduces the raw (ts, token_len) series exactly."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.state.deltadelta import DeltaDeltaCodec
    from s_tsfe_dl_ray.state.gorilla import GorillaCodec

    out = str(tmp_path / "enc")
    job = TranscriptRollupJob(small_transcripts, out, n_buckets=8, encode_series=True)
    job.run()
    recs = mf.read_manifests(out)
    with_series = [r for r in recs.values() if "series" in r]
    assert with_series, "no series sections in manifests"
    for r in with_series:
        assert len(r["series"]["encoder_state_hash"]) == 16

    # decode every series file; compare against the raw corpus
    dod, gor = DeltaDeltaCodec(), GorillaCodec()
    decoded = {}
    total_rows = 0
    for r in with_series:
        t = pq.read_table(os.path.join(out, r["series"]["path"]))
        for conv, n, tsb, vb in zip(
            t["conv_id"].to_pylist(), t["n_rows"].to_pylist(),
            t["ts_blob"].to_pylist(), t["val_blob"].to_pylist(),
        ):
            ts = dod.decode(tsb)
            v = gor.decode(vb)
            assert len(ts) == len(v) == n
            decoded[conv] = (ts, v)
            total_rows += n

    raw = ray.data.read_parquet(small_transcripts).map_batches(
        derive_transcript_columns, batch_format="pyarrow"
    ).to_pandas()
    assert total_rows == len(raw)
    some = list(decoded)[:5]
    for conv in some:
        g = raw[raw.conv_id == conv].sort_values("ts")
        ts, v = decoded[conv]
        assert (g.ts.astype("datetime64[us]").astype("int64").to_numpy() == ts).all()
        assert np.array_equal(g.token_len.astype("float64").to_numpy(), v)


def test_encode_series_tiers_match_plain_job(small_transcripts, tmp_path):
    """The single-pass encode_series dataflow (raw-row shuffle, bucket
    group writes series + tiers together) produces BYTE-identical tier
    files to the default partials-only dataflow."""
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob

    a, b = str(tmp_path / "plain"), str(tmp_path / "series")
    TranscriptRollupJob(small_transcripts, a, n_buckets=8).run()
    TranscriptRollupJob(small_transcripts, b, n_buckets=8, encode_series=True).run()
    for tier in ("1m", "1h", "1d"):
        fa = sorted(os.listdir(os.path.join(a, f"tier={tier}")))
        fb = sorted(os.listdir(os.path.join(b, f"tier={tier}")))
        assert fa == fb
        for name in fa:
            pa_bytes = open(os.path.join(a, f"tier={tier}", name), "rb").read()
            pb_bytes = open(os.path.join(b, f"tier={tier}", name), "rb").read()
            assert pa_bytes == pb_bytes, f"tier={tier}/{name} differs"


def test_bucket_hash_fingerprint_drift_refused(small_transcripts, tmp_path):
    """A manifest written under a different bucket-hash implementation
    (e.g. a polars upgrade changing Series.hash) must refuse to resume."""
    import json

    import pytest

    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob

    out = str(tmp_path / "drift")
    TranscriptRollupJob(small_transcripts, out, n_buckets=4).run()
    # tamper one manifest's fingerprint to simulate a hash-impl change
    p = mf.manifest_path(out, 0)
    rec = json.load(open(p))
    rec["bucket_hash_fingerprint"] = "deadbeefdeadbeef"
    mf.write_manifest(out, 0, rec)
    with pytest.raises(RuntimeError, match="bucket-hash"):
        TranscriptRollupJob(small_transcripts, out, n_buckets=4).run()


def test_flagship_read_stage_fuses(small_transcripts, tmp_path):
    """Regression guard for the load-bearing Read→MapBatches fusion: if
    the combiner ever re-introduces a batch_size (or the read grows a
    split factor), raw batches including text start crossing the object
    store again.  The fused operator name must appear in the stats."""
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.synth import transcripts_parquet

    # fusion requires a sharded input (single files get SplitBlocks,
    # whose split factor legitimately blocks fusion) — 3 shards here
    src = transcripts_parquet(n_turns=150_000, seed=42,
                              base_dir=str(tmp_path / "synth"))
    out = str(tmp_path / "fuse")
    job = TranscriptRollupJob(src, out, n_buckets=4)
    ds = job._ingest(set())
    res = job._write_from_partials(ds)
    res.to_pandas()
    stats = res.stats()
    assert "ReadParquet->MapBatches(derive_and_bucket)" in stats, stats[:2000]


def test_encode_series_mega_conv_chunked(small_transcripts, tmp_path):
    """A conversation longer than ``series_chunk_rows`` encodes as multiple
    independently-decodable chunks (VERDICT r3 #5): decoding blobs in
    (conv_id, chunk_idx) order reproduces the exact series the unchunked
    run encodes, and resume remains byte-identical under chunking."""
    import numpy as np
    import pyarrow.parquet as pq

    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.state.deltadelta import DeltaDeltaCodec
    from s_tsfe_dl_ray.state.gorilla import GorillaCodec

    def decode_all(out_dir):
        dod, gor = DeltaDeltaCodec(), GorillaCodec()
        series: dict[str, tuple[list, list]] = {}
        chunks_per_conv: dict[str, int] = {}
        sdir = os.path.join(out_dir, "series")
        for f in sorted(os.listdir(sdir)):
            t = pq.read_table(os.path.join(sdir, f))
            # stitch in (conv_id, chunk_idx) order
            t = t.sort_by([("conv_id", "ascending"), ("chunk_idx", "ascending")])
            for conv, ci, tsb, vb in zip(
                t["conv_id"].to_pylist(), t["chunk_idx"].to_pylist(),
                t["ts_blob"].to_pylist(), t["val_blob"].to_pylist(),
            ):
                ts, v = series.setdefault(conv, ([], []))
                ts.extend(dod.decode(tsb))
                v.extend(gor.decode(vb))
                chunks_per_conv[conv] = max(chunks_per_conv.get(conv, 0), ci + 1)
        return series, chunks_per_conv

    plain = str(tmp_path / "plain")
    TranscriptRollupJob(small_transcripts, plain, n_buckets=4,
                        encode_series=True).run()
    s_plain, ch_plain = decode_all(plain)
    assert max(ch_plain.values()) == 1  # default budget: no conv chunks

    chunked = str(tmp_path / "chunked")
    TranscriptRollupJob(small_transcripts, chunked, n_buckets=4,
                        encode_series=True, series_chunk_rows=7).run()
    s_chunk, ch_chunk = decode_all(chunked)
    assert max(ch_chunk.values()) > 1, "budget 7 should force multi-chunk convs"
    assert set(s_plain) == set(s_chunk)
    for conv in s_plain:
        assert np.array_equal(np.asarray(s_plain[conv][0]), np.asarray(s_chunk[conv][0]))
        assert np.array_equal(np.asarray(s_plain[conv][1]), np.asarray(s_chunk[conv][1]))

    # chunked resume is still byte-identical: wipe half the buckets + rerun
    import shutil as _sh

    recs = mf.read_manifests(chunked)
    expected = _tree_hashes(chunked)
    for b in list(recs)[:2]:
        os.remove(mf.manifest_path(chunked, b))
        for rel in [v["path"] for v in recs[b]["tiers"].values() if "path" in v] + \
                   ([recs[b]["series"]["path"]] if "series" in recs[b] else []):
            p = os.path.join(chunked, rel)
            if os.path.exists(p):
                os.remove(p)
    TranscriptRollupJob(small_transcripts, chunked, n_buckets=4,
                        encode_series=True, series_chunk_rows=7).run()
    assert _tree_hashes(chunked) == expected


def test_window_pair_export_job(small_transcripts, tmp_path):
    """The training-pair export job: resumable, byte-identical rerun,
    and its output matches the window_pairs STAGE run directly over the
    same corpus (bucket-local kernel == exchange-based stage)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    from s_tsfe_dl_ray.functions.derive import token_count
    from s_tsfe_dl_ray.pipelines.export_job import WindowPairExportJob
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.slide import window_pairs

    out = str(tmp_path / "pairs_out")
    job = WindowPairExportJob(small_transcripts, out, n_buckets=6,
                              length=4, length_target=2, stride=2)
    r1 = job.run()
    assert r1["buckets_written"] == 6 and r1["rows"] > 0
    hashes1 = _tree_hashes(out)

    r2 = job.run()
    assert r2["buckets_written"] == 0 and r2["buckets_skipped"] == 6
    assert _tree_hashes(out) == hashes1

    # parity with the stage
    ds = read_table(small_transcripts,
                    columns=["conv_id", "turn_idx", "text"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tl": pc.cast(token_count(t["text"]), pa.int64())})

    stage = (window_pairs(ds.map_batches(derive, batch_format="pyarrow"),
                          keys=["conv_id"], order_by=["turn_idx"],
                          value_col="tl", length=4, length_target=2,
                          stride=2)
             .to_pandas())
    got = job.read_pairs().to_pandas()
    assert len(got) == r1["rows"] == len(stage)
    key = lambda df: sorted(
        (c, a, tuple(i), tuple(l))
        for c, a, i, l in zip(df.conv_id, df.anchor_idx,
                              df.input_win, df.label_win))
    assert key(got) == key(stage)

    # changed parameters refused (mixing sample semantics)
    job2 = WindowPairExportJob(small_transcripts, out, n_buckets=6,
                               length=5, length_target=2, stride=2)
    with pytest.raises(RuntimeError):
        job2.run()


def test_window_pair_export_text_mode(small_transcripts, tmp_path):
    """payload='text': list<string> windows carrying the turn texts —
    per-turn text equality under stable ordering, byte-identical rerun,
    and tokens-vs-text mode refusal on resume."""
    import pyarrow.parquet as pq

    from s_tsfe_dl_ray.pipelines.export_job import WindowPairExportJob

    out = str(tmp_path / "pairs_text")
    job = WindowPairExportJob(small_transcripts, out, n_buckets=4,
                              length=3, length_target=1, stride=1,
                              payload="text")
    r1 = job.run()
    assert r1["rows"] > 0
    h1 = _tree_hashes(out)
    assert job.run()["buckets_written"] == 0
    assert _tree_hashes(out) == h1

    got = job.read_pairs().to_pandas()
    assert got.input_win.map(len).eq(3).all()
    assert got.label_win.map(len).eq(1).all()

    # spot-check one conversation against the raw corpus ordering
    import pandas as pd
    raw = pd.read_parquet(small_transcripts,
                          columns=["conv_id", "turn_idx", "text"])
    row = got.iloc[0]
    conv = (raw[raw.conv_id == row.conv_id]
            .sort_values("turn_idx").reset_index(drop=True))
    p = int(row.anchor_idx)
    assert list(row.input_win) == conv.text.iloc[p - 3:p].tolist()
    assert list(row.label_win) == [conv.text.iloc[p]]

    # a tokens-mode resume into the text-mode tree is refused
    with pytest.raises(RuntimeError):
        WindowPairExportJob(small_transcripts, out, n_buckets=4,
                            length=3, length_target=1, stride=1).run()
