#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "transcript_turns": ..., "turns_per_sec": ...}

Measurement discipline (round-3 fixes, per VERDICT r2 "What's wrong"):
- every operator-suite query runs in a FRESH subprocess (`--query NAME`),
  the same isolation --scaling always used — a long-lived 32-CPU Ray
  session degrades across repeated heavy runs (object-store residue:
  measured 17.5 → 40.9 → 55.6 s), which is what inflated the driver's
  r2 emb_knn (27 s vs 2.9 s fresh) number;
- ALL corpus synthesis/warming happens OUTSIDE timed regions — the r2
  driver's codec_encode 29.5 s was mostly synthesizing the 5M-turn
  corpus inside the timer on a cold cache.

--scaling: run the SAME job in two fresh processes (num_cpus=8 then 32)
on the same input and report both throughputs + scaling efficiency
(the sandbox evidence for the N→4N cluster criterion; see BASELINE.md).

Run from /root/repo (Ray workers resolve s_tsfe_dl_ray via cwd).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 20M turns: big enough that the flagship's fixed costs (dataset startup,
# sort barrier coordination, manifest writes) are amortized the way they
# would be on a 10^12-turn cluster job; the corpus is generated once and
# cached (~17 GB parquet).
BENCH_TURNS = int(os.environ.get("GRAFT_BENCH_TURNS", "20000000"))
# The codec suite query uses a 5M-turn corpus: the codec inner loop is
# per-value, so it times the codecs, not the corpus size.
CODEC_TURNS = min(BENCH_TURNS, 5_000_000)

SUITE = ("events_tiers", "events_gapfill_interp", "docs_minhash_dedup",
         "emb_knn", "codec_encode", "docs_curation", "emb_index_build",
         "pair_export")


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def _init_ray():
    # Workers inherit the raylet's env: exporting the polars thread pin
    # BEFORE ray.init guarantees every worker's polars pool is size 1
    # regardless of worker-side import order (a 32-thread pool in each of
    # 32 workers oversubscribes the hash kernels badly — see CLAUDE.md).
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # Push-based sort shuffle pipelines the map→merge exchange (measured
    # on the flagship at 32 CPUs: 9.4 s → 7.8 s best); GRAFT_SHUFFLE
    # overrides (sort_shuffle_pull_based | sort_shuffle_push_based |
    # hash_shuffle — hash_shuffle measured 3× SLOWER for the 64-partition
    # map_groups shape, its aggregator actors don't fit this job).
    from ray.data.context import ShuffleStrategy

    ctx.shuffle_strategy = ShuffleStrategy(
        os.environ.get("GRAFT_SHUFFLE", "sort_shuffle_push_based")
    )
    # Operator resource reservation (default: 50% of CPUs held back for
    # downstream ops) throttles the fused read→derive→combine stage to a
    # fraction of the machine (measured: flagship 14.3 s → 6.2 s at 8
    # CPUs with reservation off).  The flagship's downstream stages are
    # tiny (partials-only shuffle + 64 bucket writes), so reservation
    # buys nothing here.
    ctx.op_resource_reservation_enabled = False
    return ray


def _warm_dir(path: str) -> None:
    """Page-cache warm every parquet shard so timings measure
    compute+shuffle, not first disk read."""
    names = sorted(os.listdir(path)) if os.path.isdir(path) else [""]
    for name in names:
        with open(os.path.join(path, name), "rb") as f:
            while f.read(1 << 24):
                pass


def _warm_workers() -> None:
    """Pre-spawn the Ray worker pool OUTSIDE any timed region.

    A fresh `ray.init` session pays worker-process spawn + heavyweight
    imports (pandas/polars/pyarrow + this package) on its FIRST dataset
    execution — ~15 s at 32 CPUs, which is session setup, not operator
    time (a long-running cluster's workers are warm).  One trivial
    map_batches pass with per-CPU tasks forces the spawn + imports now.
    """
    import ray.data as rd

    def imp(b):
        import time as _t

        # ORDER MATTERS: the package import pins POLARS_MAX_THREADS=1 and
        # must come before polars itself or the pool sizes to all cores
        import s_tsfe_dl_ray  # noqa: F401
        from s_tsfe_dl_ray.stages import dedup, rollup, similarity, text  # noqa: F401

        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import polars  # noqa: F401

        _t.sleep(0.2)  # hold the worker so every slot spawns one
        return b

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
        imp, batch_size=None
    ).materialize()


# --------------------------------------------------------------------------
# operator-suite queries (each runs in its own fresh process via --query)
# --------------------------------------------------------------------------


def run_events_tiers() -> float:
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tiers

    def go():
        tiers = events_tiers(SF_DIR)
        return [tiers[t].count() for t in ("1m", "1h", "1d")]

    t, _ = _timed(go)
    return t


def run_events_gapfill_interp() -> float:
    from s_tsfe_dl_ray.pipelines.events_rollup import events_tier
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    def go():
        return gapfill(
            events_tier(SF_DIR, "1h"), keys=["user_id"], tier="1h",
            count_cols=["n_events"], sum_cols=["value_sum"],
            null_cols=["value_min", "value_max"], carry_cols=["value_mean"],
            mode="interp",
        ).count()

    t, _ = _timed(go)
    return t


def run_docs_minhash_dedup() -> float:
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.dedup import minhash_dedup_pairs

    def go():
        ds = read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        return minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.5).count()

    t, _ = _timed(go)
    return t


def run_emb_knn() -> float:
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.similarity import knn_bruteforce

    def go():
        ds = read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        return knn_bruteforce(ds, query_ids=list(range(10)), k=10,
                              source_path=f"{SF_DIR}/embeddings.parquet").count()

    t, _ = _timed(go)
    return t


def run_codec_encode() -> float:
    import pyarrow as pa
    import pyarrow.compute as pc

    from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
    from s_tsfe_dl_ray.sources.parquet import read_transcripts
    from s_tsfe_dl_ray.state.encode import encode_series
    from s_tsfe_dl_ray.synth import transcripts_parquet

    # corpus synthesis + page-cache warm OUTSIDE the timed region
    cpath = transcripts_parquet(n_turns=CODEC_TURNS, seed=42)
    _warm_dir(cpath)

    def go():
        ds = read_transcripts(cpath, columns=["conv_id", "ts", "text", "tool"])
        ds = ds.map_batches(derive_transcript_columns, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda t: t.select(["conv_id", "ts"]).append_column(
                "value", pc.cast(t["token_len"], pa.float64())
            ),
            batch_format="pyarrow",
        )
        return encode_series(ds, key="conv_id", ts_col="ts", value_col="value").count()

    t, _ = _timed(go)
    return t


def run_docs_curation() -> float:
    """Durable docs-curation job, cold build (fresh out dir each run)."""
    import shutil

    from s_tsfe_dl_ray.pipelines.docs_job import DocsCurationJob

    out = "/tmp/s_tsfe_dl_ray_bench_curate"
    shutil.rmtree(out, ignore_errors=True)

    def go():
        return DocsCurationJob(
            f"{SF_DIR}/documents.parquet", out, n_buckets=16).run()

    t, _ = _timed(go)
    shutil.rmtree(out, ignore_errors=True)
    return t


def run_pair_export() -> float:
    """Durable window-pair training-export job, cold build (fresh out
    dir each run) over the codec-scale transcript corpus."""
    import shutil

    from s_tsfe_dl_ray.pipelines.export_job import WindowPairExportJob
    from s_tsfe_dl_ray.synth import transcripts_parquet

    cpath = transcripts_parquet(n_turns=CODEC_TURNS, seed=42)
    _warm_dir(cpath)
    out = "/tmp/s_tsfe_dl_ray_bench_pairs"
    shutil.rmtree(out, ignore_errors=True)

    def go():
        return WindowPairExportJob(cpath, out, n_buckets=32).run()

    t, _ = _timed(go)
    shutil.rmtree(out, ignore_errors=True)
    return t


def run_emb_index_build() -> float:
    """Durable ANN-index job, cold build + a 10-query probe."""
    import shutil

    import numpy as np
    import pyarrow.parquet as pq

    from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

    out = "/tmp/s_tsfe_dl_ray_bench_embidx"
    shutil.rmtree(out, ignore_errors=True)
    t10 = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        filters=[("vec_id", "<", 10)])
    q = np.array([np.asarray(v, dtype=np.float64)
                  for v in t10["embedding"].to_pylist()])

    def go():
        job = EmbIndexJob(f"{SF_DIR}/embeddings.parquet", out, n_clusters=16)
        job.run()
        return len(job.search(q, k=10, nprobe=4))

    t, _ = _timed(go)
    shutil.rmtree(out, ignore_errors=True)
    return t


def run_one_query(name: str) -> None:
    """--query NAME: fresh Ray session, one suite query, one JSON line.
    Worker pool + input page cache warmed outside the timed region."""
    ray = _init_ray()
    _warm_workers()
    _warm_dir(SF_DIR)
    sec = globals()[f"run_{name}"]()
    ray.shutdown()
    print(json.dumps({"query": name, "sec": round(sec, 3)}))


# --------------------------------------------------------------------------
# flagship + orchestration
# --------------------------------------------------------------------------


def flagship() -> dict:
    """Flagship rollup job in THIS process (min-of-K fresh-ish: the job
    itself is rerun K times but Ray session is per-process; --scaling and
    the full bench spawn a fresh process per sample/section)."""
    ray = _init_ray()
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.synth import transcripts_parquet

    # deterministic bench input, cached across processes (synth ~seconds)
    tpath = transcripts_parquet(n_turns=BENCH_TURNS, seed=42)
    _warm_workers()
    _warm_dir(tpath)

    # min-of-3 by default: this box is a VM with ±50% run-to-run noise
    repeats = int(os.environ.get("GRAFT_JOB_REPEATS", "3"))
    out_dir = f"/tmp/bench_rollup_{NUM_CPUS}"
    best = float("inf")
    for _ in range(repeats):
        shutil.rmtree(out_dir, ignore_errors=True)
        job = TranscriptRollupJob(tpath, out_dir, n_buckets=64)
        t, _ = _timed(job.run)
        best = min(best, t)
        del job
        import gc

        gc.collect()  # release Dataset refs so plasma objects free between runs
    ray.shutdown()
    return {
        "metric": "flagship rollup job only",
        "value": round(best, 3),
        "unit": "sec",
        "queries": {"transcript_rollup_job": round(best, 3)},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "transcript_turns": BENCH_TURNS,
        "turns_per_sec": round(BENCH_TURNS / best, 1),
    }


def _spawn(argv: list[str], env_extra: dict | None = None) -> dict:
    env = dict(os.environ, **(env_extra or {}))
    out = subprocess.run(
        [sys.executable, "bench.py", *argv], env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> dict:
    # pre-generate BOTH cached corpora before any timing (the r2 driver's
    # codec number included cold 5M synthesis inside the timer)
    from s_tsfe_dl_ray.synth import transcripts_parquet

    transcripts_parquet(n_turns=BENCH_TURNS, seed=42)
    transcripts_parquet(n_turns=CODEC_TURNS, seed=42)

    # Flagship min-of-K with a FRESH PROCESS PER SAMPLE (VERDICT r3 #3):
    # repeated heavy runs inside one long-lived 32-CPU session degrade
    # (object-store residue, measured 17.5 → 40.9 → 55.6 s), and this VM's
    # box-state oscillates ±2× on a minutes timescale — independent
    # processes give min-of-K the best chance of catching a clean window.
    repeats = int(os.environ.get("GRAFT_JOB_REPEATS", "3"))
    samples = [
        _spawn(["--flagship"], {"GRAFT_JOB_REPEATS": "1"})
        for _ in range(repeats)
    ]
    result = min(samples, key=lambda r: r["value"])
    result["flagship_samples"] = [s["value"] for s in samples]
    result["metric"] = "engine bench: flagship rollup job + operator suite"
    for name in SUITE:  # fresh process per query; key names match r1/r2
        result["queries"][name] = _spawn(["--query", name])["sec"]
    result["value"] = round(sum(result["queries"].values()), 3)
    return result


def scaling() -> None:
    # N vs 4N CPUs.  Default 8→32; GRAFT_SCALE_LO=2 measures 2→8 — the
    # pair BELOW this box's all-core turbo-drop + shared-L3 saturation
    # point (bench.py --ceiling: 8→32 pure-CPU ceiling is 0.63 on this
    # VM regardless of dataflow), i.e. the regime where adding cores
    # behaves like adding nodes.  BASELINE.md reports both pairs.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = lo * 4

    # INTERLEAVED lo/hi pairs with a FRESH process per sample: long-lived
    # 32-cpu Ray sessions degrade across repeats (object-store residue),
    # this VM's noise has a heavy upper tail AND oscillates ±2× on a
    # minutes timescale — adjacent lo/hi samples see the same box state,
    # so the per-pair ratio is meaningful where sequential same-level
    # blocks are not.
    npairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "4"))
    probe_before = _dram_probe(lo, hi)
    samples: dict[int, list] = {lo: [], hi: []}
    for _ in range(npairs):
        for ncpu in (lo, hi):
            samples[ncpu].append(
                _spawn(["--flagship"],
                       {"RAY_GRAFT_CPUS": str(ncpu), "GRAFT_JOB_REPEATS": "1"})
            )
    t = {n: [r["queries"]["transcript_rollup_job"] for r in samples[n]]
         for n in (lo, hi)}
    pair_effs = [round((a / b) / (hi / lo), 3) for a, b in zip(t[lo], t[hi])]
    t_lo, t_hi = min(t[lo]), min(t[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    turns = samples[lo][0]["transcript_turns"]
    print(json.dumps({
        "metric": f"scaling efficiency (flagship rollup job, N={lo} vs 4N={hi} CPUs)",
        "transcript_turns": turns,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"samples_{lo}": t[lo],
        f"samples_{hi}": t[hi],
        f"turns_per_sec_{lo}": round(turns / t_lo, 1),
        f"turns_per_sec_{hi}": round(turns / t_hi, 1),
        "pair_efficiencies": pair_effs,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best_pair": max(pair_effs),
        "box_state_before": probe_before,
        "box_state_after": _dram_probe(lo, hi),
        "note": f"single node: {lo} vs {hi} of ONE box's cores share one memory bus and one NVMe; interleaved fresh-process pairs; dram_eff_ceiling is the box's pure-CPU DRAM-streaming scaling bound at probe time; see BASELINE.md scaling analysis + bench.py --ceiling",
    }))


def _dram_probe(lo: int, hi: int) -> dict:
    """30-second box-state probe: pure-CPU numpy streaming over a 64 MB
    working set in ``lo`` vs ``hi`` concurrent processes (no Ray, no I/O).
    Returns the DRAM-bandwidth scaling ceiling of the box AT THIS MOMENT —
    measured oscillating between 0.73 and 0.16 within one hour on this VM,
    which bounds any lo→hi efficiency a data pipeline can show.  Embedded
    in every scaling JSON so each measurement carries its own box-state
    context."""
    import multiprocessing as mp

    import numpy as np

    def worker(q, iters, size):
        a = np.random.default_rng(0).random(size)
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(iters):
            s += float(np.sum(np.sqrt(a) * a + 1.0001))
        q.put(time.perf_counter() - t0)

    per = {}
    for nproc in (lo, hi):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q, 2, 8_000_000)) for _ in range(nproc)]
        for p in ps:
            p.start()
        times = [q.get() for _ in ps]
        for p in ps:
            p.join()
        per[nproc] = sum(times) / len(times)
    return {
        f"dram_per_proc_sec_{lo}": round(per[lo], 3),
        f"dram_per_proc_sec_{hi}": round(per[hi], 3),
        "dram_eff_ceiling": round((hi * per[lo] / per[hi]) / lo / 4, 3),
    }


def _read_geom(tpath: str, ncpu: int):
    """Read the transcript corpus with the SAME block policy as the job
    (≈4 read waves per CPU, even files-per-task split)."""
    from s_tsfe_dl_ray.sources.parquet import read_transcripts

    nfiles = sum(1 for f in os.listdir(tpath) if f.endswith(".parquet"))
    target = max(int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "4")) * ncpu, 16)
    nblocks = nfiles // -(-nfiles // target) if nfiles > target else nfiles
    return read_transcripts(
        tpath, columns=["conv_id", "ts", "text", "tool"],
        override_num_blocks=nblocks,
    )


def run_stage(name: str) -> None:
    """--stage NAME: fresh Ray session, ONE flagship stage in isolation,
    fixed work.  Stage inputs are built/materialized OUTSIDE the timed
    region so each measurement covers exactly one stage:

      read     — parquet scan + decompress of the 20M-turn corpus, consumed
                 by a per-batch row count (DRAM/NVMe-bandwidth-bound);
      combine  — derive (text tokenization) + per-batch partial rollup over
                 plasma-materialized raw rows at 5M turns (the compute
                 core; plasma reads are zero-copy);
      exchange — THE shuffle + per-bucket vectorized merge + tier cascade +
                 64 atomic writes + manifests, over pre-materialized
                 partials (what a cluster's cross-node exchange does);
      e2e      — the whole fused job at 5M turns for the same-corpus
                 reference point.

    Besides the stage wall time, reports ``sec_marginal``: the same stage
    over a tiny (GRAFT_STAGE_FLOOR_TURNS, default 50k) input is timed
    back-to-back IN THE SAME PROCESS and subtracted, cancelling the
    pipeline-launch floor (streaming-executor startup + driver tail)
    under the same box state — this VM's noise is heavy-tailed enough
    (measured floor 0.2 s → 2.6 s minutes apart) that separately-sampled
    floors mislead.  Used by --stage-scaling to isolate WHICH stage owns
    the single-box 8→32 shortfall (BASELINE.md scaling analysis; VERDICT
    r2 #1 alternate done-condition: compute stages ≥0.8 with the
    DRAM-bound residual isolated per stage)."""
    import pyarrow as pa

    ray = _init_ray()
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.pipelines.transcript_rollup import TRANSCRIPT_SPEC
    from s_tsfe_dl_ray.stages.rollup import _PartialBatch
    from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
    from s_tsfe_dl_ray.synth import transcripts_parquet

    stage_turns = int(os.environ.get("GRAFT_STAGE_TURNS", "5000000"))
    floor_turns = int(os.environ.get("GRAFT_STAGE_FLOOR_TURNS", "50000"))
    turns = BENCH_TURNS if name == "read" else stage_turns

    def consume_count(ds) -> int:
        # per-batch row count: tiny rows cross the object store, the
        # stage's real output is dropped inside the task
        return int(
            ds.map_batches(
                lambda t: pa.table({"rows": [t.num_rows]}),
                batch_format="pyarrow",
            ).sum("rows")
        )

    def build(n_turns: int, tag: str):
        """Return a zero-arg closure running the stage at ``n_turns``
        (inputs built/materialized here, outside any timed region)."""
        tpath = transcripts_parquet(n_turns=n_turns, seed=42)
        _warm_dir(tpath)
        out_dir = f"/tmp/bench_stage_{NUM_CPUS}_{tag}"
        if name == "read":
            return lambda: consume_count(_read_geom(tpath, NUM_CPUS))
        if name == "combine":
            base = _read_geom(tpath, NUM_CPUS).materialize()

            def once():
                ds = base.map_batches(
                    derive_transcript_columns, batch_format="pyarrow"
                ).map_batches(
                    _PartialBatch(TRANSCRIPT_SPEC, "1m", num_partitions=64),
                    batch_format="pyarrow",
                )
                return consume_count(ds)

            return once
        if name == "exchange":
            partials = (
                _read_geom(tpath, NUM_CPUS)
                .map_batches(derive_transcript_columns, batch_format="pyarrow")
                .map_batches(
                    _PartialBatch(TRANSCRIPT_SPEC, "1m", num_partitions=64),
                    batch_format="pyarrow",
                )
                .materialize()
            )

            def once():
                shutil.rmtree(out_dir, ignore_errors=True)
                job = TranscriptRollupJob(tpath, out_dir, n_buckets=64)
                return len(job.merge_and_write(partials).to_pandas())

            return once
        if name == "e2e":
            def once():
                shutil.rmtree(out_dir, ignore_errors=True)
                job = TranscriptRollupJob(tpath, out_dir, n_buckets=64)
                return job.run()["newly_written"]

            return once
        raise SystemExit(f"unknown stage {name!r}")

    big, small = build(turns, "big"), build(floor_turns, "floor")
    _warm_workers()
    best, best_floor = float("inf"), float("inf")
    for _ in range(int(os.environ.get("GRAFT_STAGE_REPEATS", "3"))):
        tf, _ = _timed(small)   # floor first: also warms the code path
        t, _ = _timed(big)
        best, best_floor = min(best, t), min(best_floor, tf)
    ray.shutdown()
    print(json.dumps({
        "stage": name, "sec": round(best, 3),
        "sec_floor": round(best_floor, 3),
        "sec_marginal": round(best - best_floor, 3),
        "turns": turns, "floor_turns": floor_turns, "num_cpus": NUM_CPUS,
    }))


def stage_scaling() -> None:
    """--stage-scaling: each flagship stage in isolation at N and 4N CPUs
    (fresh process per sample), reporting per-stage scaling efficiency.
    Separates the dataflow's scalability from the box's shared memory
    bus/NVMe: on a multi-node cluster each node brings its own bus and
    disks, so the per-stage numbers bound what the same dataflow does
    there."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = lo * 4
    pairs = int(os.environ.get("GRAFT_STAGE_PAIRS", "2"))
    probe_before = _dram_probe(lo, hi)
    out = {}
    for stage in ("read", "combine", "exchange", "e2e"):
        samples = {lo: [], hi: []}
        # INTERLEAVED lo/hi pairs: this VM's throughput oscillates ±2× on
        # a minutes timescale, so adjacent lo/hi samples see the same box
        # state and their ratio is meaningful where sequential blocks of
        # samples are not
        for _ in range(pairs):
            for ncpu in (lo, hi):
                samples[ncpu].append(_spawn(["--stage", stage],
                                            {"RAY_GRAFT_CPUS": str(ncpu)}))
        effs = [
            round((a["sec_marginal"] / b["sec_marginal"]) / (hi / lo), 3)
            for a, b in zip(samples[lo], samples[hi])
            if b["sec_marginal"] > 0
        ]
        effs_wall = [
            round((a["sec"] / b["sec"]) / (hi / lo), 3)
            for a, b in zip(samples[lo], samples[hi])
        ]
        out[stage] = {
            "turns": samples[lo][0]["turns"],
            f"sec_{lo}": [s["sec"] for s in samples[lo]],
            f"sec_{hi}": [s["sec"] for s in samples[hi]],
            f"marginal_{lo}": [s["sec_marginal"] for s in samples[lo]],
            f"marginal_{hi}": [s["sec_marginal"] for s in samples[hi]],
            "eff_pairs_marginal": effs,
            "eff_pairs_wall": effs_wall,
            "eff_best_marginal": max(effs) if effs else None,
        }
    print(json.dumps({
        "metric": f"per-stage scaling (flagship stages in isolation, N={lo} vs 4N={hi} CPUs, interleaved pairs)",
        "stages": out,
        "box_state_before": probe_before,
        "box_state_after": _dram_probe(lo, hi),
        "note": "fixed work per stage, inputs built outside the timed region; marginal = stage wall minus same-process 50k-turn floor (cancels pipeline-launch overhead under the same box state); dram_eff_ceiling is the box's pure-CPU DRAM-streaming scaling bound at probe time; see BASELINE.md scaling analysis",
    }))


def ceiling() -> None:
    """Measure THIS BOX's 8→32-process scaling ceiling with pure-CPU
    microbenchmarks (no Ray, no I/O): the upper bound any 8-vs-32-CPU
    efficiency measurement on this machine can reach.

    Two working-set sizes separate the effects: a ~156 KB array isolates
    frequency/power inflation (all-core turbo drop under a full machine);
    a ~1.5 MB array adds shared-L3 contention — the profile that matches
    the flagship's parquet-block working sets.  See BASELINE.md.
    """
    import multiprocessing as mp

    import numpy as np

    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = lo * 4

    def worker(q, iters, size):
        a = np.random.default_rng(0).random(size)
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(iters):
            s += float(np.sum(np.sqrt(a) * a + 1.0001))
        q.put(time.perf_counter() - t0)

    out = {}
    for label, size, iters in (("l2_156KB", 20_000, 3000), ("l3_1.5MB", 200_000, 300),
                               ("dram_64MB", 8_000_000, 8)):
        per = {}
        for nproc in (lo, hi):
            q = mp.Queue()
            ps = [mp.Process(target=worker, args=(q, iters, size)) for _ in range(nproc)]
            for p in ps:
                p.start()
            times = [q.get() for _ in ps]
            for p in ps:
                p.join()
            per[nproc] = sum(times) / len(times)
        # same fixed work per process: eff ceiling = throughput ratio / 4
        out[label] = {
            f"per_proc_sec_{lo}": round(per[lo], 3),
            f"per_proc_sec_{hi}": round(per[hi], 3),
            f"eff_ceiling_{lo}_to_{hi}": round((hi * per[lo] / per[hi]) / lo / 4, 3),
        }
    print(json.dumps({
        "metric": f"box scaling ceiling (pure-CPU fixed work per process, {lo} vs {hi} procs)",
        "results": out,
        "note": f"any {lo}-vs-{hi}-CPU efficiency measured on this box is bounded by these ceilings; they are properties of the VM (all-core frequency + shared L3), not of the dataflow",
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--stage-scaling" in sys.argv:
        stage_scaling()
    elif "--stage" in sys.argv:
        run_stage(sys.argv[sys.argv.index("--stage") + 1])
    elif "--ceiling" in sys.argv:
        ceiling()
    elif "--flagship" in sys.argv:
        print(json.dumps(flagship()))
    elif "--query" in sys.argv:
        run_one_query(sys.argv[sys.argv.index("--query") + 1])
    else:
        print(json.dumps(main()))
