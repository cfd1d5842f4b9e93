#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "transcript_turns": ..., "turns_per_sec": ...}

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
# Flagship-only mode (used by --scaling): skip the operator-suite queries.
ONLY_JOB = os.environ.get("GRAFT_ONLY_JOB", "0") == "1"


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> dict:
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
    # Operator resource reservation (default: 50% of CPUs held back for
    # downstream ops) throttles the fused read→derive→combine stage to a
    # fraction of the machine (measured: flagship 14.3 s → 6.2 s at 8
    # CPUs with reservation off).  The flagship's downstream stages are
    # tiny (partials-only shuffle + 64 bucket writes), so reservation
    # buys nothing here.
    ctx.op_resource_reservation_enabled = False

    from s_tsfe_dl_ray.pipelines.events_rollup import events_tiers
    from s_tsfe_dl_ray.pipelines.job import TranscriptRollupJob
    from s_tsfe_dl_ray.sources.parquet import read_events, read_table
    from s_tsfe_dl_ray.stages.dedup import minhash_dedup_pairs
    from s_tsfe_dl_ray.stages.gapfill import gapfill
    from s_tsfe_dl_ray.stages.similarity import knn_bruteforce
    from s_tsfe_dl_ray.synth import transcripts_parquet

    # deterministic bench input, cached across processes (synth ~seconds)
    tpath = transcripts_parquet(n_turns=BENCH_TURNS, seed=42)
    # warm the page cache so we measure compute+shuffle, not first disk read
    for name in sorted(os.listdir(tpath)):
        with open(os.path.join(tpath, name), "rb") as f:
            while f.read(1 << 24):
                pass

    queries: dict[str, float] = {}

    # 1) FLAGSHIP: checkpointed transcript rollup job (derive → combiner →
    #    ONE shuffle → bucket-local cascade 1m/1h/1d + finalize → atomic
    #    write + manifests).  The headline turns/sec number; min-of-K to
    #    damp single-box IO variance (GRAFT_JOB_REPEATS, default 2).
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
    queries["transcript_rollup_job"] = best

    if ONLY_JOB:
        result = {
            "metric": "flagship rollup job only",
            "value": round(best, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in queries.items()},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "transcript_turns": BENCH_TURNS,
            "turns_per_sec": round(BENCH_TURNS / best, 1),
        }
        ray.shutdown()
        return result

    # 2) events tier cascade (read → combiner → merge → cascade ×2)
    def run_events():
        tiers = events_tiers(SF_DIR)
        return [tiers[t].count() for t in ("1m", "1h", "1d")]

    queries["events_tiers"], _ = _timed(run_events)

    # 3) gap-fill over the 1h tier (grid completion per key)
    def run_gapfill():
        from s_tsfe_dl_ray.pipelines.events_rollup import events_tier

        return gapfill(
            events_tier(SF_DIR, "1h"), keys=["user_id"], tier="1h",
            count_cols=["n_events"], sum_cols=["value_sum"],
            null_cols=["value_min", "value_max"], carry_cols=["value_mean"],
            mode="interp",
        ).count()

    queries["events_gapfill_interp"], _ = _timed(run_gapfill)

    # 4) MinHash-LSH near-dup sweep over documents
    def run_minhash():
        ds = read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        return minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.5).count()

    queries["docs_minhash_dedup"], _ = _timed(run_minhash)

    # 5) brute-force kNN over embeddings
    def run_knn():
        ds = read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        return knn_bruteforce(ds, query_ids=list(range(10)), k=10).count()

    queries["emb_knn"], _ = _timed(run_knn)

    # 6) Gorilla + delta-of-delta compression of every conversation series
    #    (capped at 5M turns: the codec inner loop is per-value, so this
    #    stage times the codecs, not the corpus size)
    def run_encode():
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
        from s_tsfe_dl_ray.sources.parquet import read_transcripts
        from s_tsfe_dl_ray.state.encode import encode_series

        cpath = transcripts_parquet(n_turns=min(BENCH_TURNS, 5_000_000), seed=42)
        ds = read_transcripts(cpath, columns=["conv_id", "ts", "text", "tool"])
        ds = ds.map_batches(derive_transcript_columns, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda t: t.select(["conv_id", "ts"]).append_column(
                "value", pc.cast(t["token_len"], pa.float64())
            ),
            batch_format="pyarrow",
        )
        return encode_series(ds, key="conv_id", ts_col="ts", value_col="value").count()

    queries["codec_encode"], _ = _timed(run_encode)

    total = sum(queries.values())
    result = {
        "metric": "engine bench: flagship rollup job + operator suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "transcript_turns": BENCH_TURNS,
        "turns_per_sec": round(BENCH_TURNS / queries["transcript_rollup_job"], 1),
    }
    ray.shutdown()
    return result


def scaling() -> None:
    lo, hi = 8, 32

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_JOB_REPEATS="1",
                   GRAFT_ONLY_JOB="1")
        out = subprocess.run(
            [sys.executable, "bench.py"], env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # min-of-4 with a FRESH process each time: long-lived 32-cpu Ray
        # sessions degrade across repeats (object-store residue) and this
        # VM's noise has a heavy upper tail, so each sample gets a clean
        # session and we keep the best
        samples = [run_once(ncpu) for _ in range(4)]
        best = min(samples, key=lambda r: r["queries"]["transcript_rollup_job"])
        return best

    r_lo, r_hi = run(lo), run(hi)
    t_lo = r_lo["queries"]["transcript_rollup_job"]
    t_hi = r_hi["queries"]["transcript_rollup_job"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling efficiency (flagship rollup job, N=8 vs 4N=32 CPUs)",
        "transcript_turns": r_lo["transcript_turns"],
        "sec_8": t_lo,
        "sec_32": t_hi,
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "note": "single node: 8 vs 32 of ONE box's cores share one memory bus and one NVMe; see BASELINE.md scaling analysis",
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        print(json.dumps(main()))
