"""``python -m s_tsfe_dl_ray`` — the job-submission entrypoint the
north rule runs through ``ray job submit`` on a real cluster:

    ray job submit --working-dir . -- \\
        python -m s_tsfe_dl_ray rollup --input <parquet dir> --out <dir>

Subcommands wrap the two durable jobs (both resumable: re-submitting
after a failure skips finished buckets via their lineage manifests):

- ``rollup``  — transcript tier rollup (pipelines/job.TranscriptRollupJob)
- ``curate``  — docs curation (pipelines/docs_job.DocsCurationJob)
- ``index``   — embedding ANN index build (pipelines/emb_index_job)
- ``export``  — supervised window-pair training export
  (pipelines/export_job.WindowPairExportJob)

This is the ONLY library-adjacent place allowed to call ``ray.init``
(guarded — under ``ray job submit`` the session already exists and the
guard is a no-op).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, logging_level="ERROR")


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_JOB_ID") or os.environ.get("RAY_ADDRESS",
                "").startswith(("ray://", "auto")))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m s_tsfe_dl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("rollup", help="transcript tier rollup job")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--tiers", default="1m,1h,1d")
    r.add_argument("--n-buckets", type=int, default=None)
    r.add_argument("--gapfill", choices=["ffill", "interp"], default=None)
    r.add_argument("--encode-series", action="store_true")

    c = sub.add_parser("curate", help="docs curation job")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--n-buckets", type=int, default=32)
    c.add_argument("--min-quality", type=float, default=0.35)
    c.add_argument("--keep-langs", default="en")

    i = sub.add_parser("index", help="embedding ANN index build job")
    i.add_argument("--input", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--n-clusters", type=int, default=16)

    e = sub.add_parser("export",
                       help="supervised window-pair training export job")
    e.add_argument("--input", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--n-buckets", type=int, default=None)
    e.add_argument("--length", type=int, default=8)
    e.add_argument("--length-target", type=int, default=4)
    e.add_argument("--stride", type=int, default=4)
    e.add_argument("--sampling-rate", type=int, default=1)
    e.add_argument("--payload", choices=["tokens", "text"],
                   default="tokens")

    args = p.parse_args(argv)
    _ensure_ray()
    if args.cmd == "rollup":
        from .pipelines.job import TranscriptRollupJob

        summary = TranscriptRollupJob(
            args.input, args.out,
            tiers=tuple(args.tiers.split(",")),
            n_buckets=args.n_buckets,
            gapfill_mode=args.gapfill,
            encode_series=args.encode_series,
        ).run()
    elif args.cmd == "curate":
        from .pipelines.docs_job import DocsCurationJob

        summary = DocsCurationJob(
            args.input, args.out,
            n_buckets=args.n_buckets,
            min_quality=args.min_quality,
            keep_langs=tuple(args.keep_langs.split(",")),
        ).run()
    elif args.cmd == "export":
        from .pipelines.export_job import WindowPairExportJob

        summary = WindowPairExportJob(
            args.input, args.out,
            n_buckets=args.n_buckets,
            length=args.length,
            length_target=args.length_target,
            stride=args.stride,
            sampling_rate=args.sampling_rate,
            payload=args.payload,
        ).run()
    else:
        from .pipelines.emb_index_job import EmbIndexJob

        summary = EmbIndexJob(
            args.input, args.out, n_clusters=args.n_clusters).run()
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
