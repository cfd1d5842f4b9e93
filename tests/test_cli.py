"""The `python -m s_tsfe_dl_ray` job CLI: all three subcommands drive
their durable jobs end-to-end (ray.init guard is a no-op under the
session fixture)."""

from __future__ import annotations

import json
import shutil

SF = "/root/testdata/sf0.001"


def _run(argv, capsys) -> dict:
    from s_tsfe_dl_ray.__main__ import main

    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_curate(tmp_path, capsys):
    out = str(tmp_path / "curated")
    s = _run(["curate", "--input", f"{SF}/documents.parquet",
              "--out", out, "--n-buckets", "4"], capsys)
    assert s["buckets_written"] == 4
    s2 = _run(["curate", "--input", f"{SF}/documents.parquet",
               "--out", out, "--n-buckets", "4"], capsys)
    assert s2["buckets_written"] == 0 and s2["buckets_skipped"] == 4


def test_cli_index(tmp_path, capsys):
    out = str(tmp_path / "annidx")
    s = _run(["index", "--input", f"{SF}/embeddings.parquet",
              "--out", out, "--n-clusters", "4"], capsys)
    assert s["buckets_written"] == 4 and s["rows"] > 0


def test_cli_rollup(tmp_path, capsys):
    from s_tsfe_dl_ray.synth import transcripts_parquet

    path = transcripts_parquet(n_turns=3000, seed=42)
    out = str(tmp_path / "tiers")
    s = _run(["rollup", "--input", path, "--out", out,
              "--tiers", "1h,1d", "--n-buckets", "4"], capsys)
    assert s["newly_written"] == 4 and s["rows_written"] > 0
    shutil.rmtree(out, ignore_errors=True)
