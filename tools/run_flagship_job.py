"""Cluster job entrypoint — what ``ray job submit`` runs.

On a real fixed-size cluster::

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- \
        python tools/run_flagship_job.py \
            --pages 's3://bucket/pages/*.parquet' --out s3://bucket/enriched

The job is RESUMABLE: input files are grouped into partitions written
atomically with a lineage manifest (state/checkpoint.py); re-submitting
the identical job after a kill skips finished partitions.  In this
sandbox it runs standalone against the local pages corpus (the Jobs
CLI itself needs ray[default]'s dashboard deps, absent here — verified
standalone: first run {'done': 4}, identical re-run {'skipped': 4}).

Env: RAY_ADDRESS (default auto), HEXRAY_JOB_CPUS (local fallback).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="/tmp/hexscape_bench/pages_2000000")
    ap.add_argument("--out", default="/tmp/hexscape_job/enriched")
    ap.add_argument("--files-per-partition", type=int, default=8)
    ap.add_argument("--agg-out", default="/tmp/hexscape_job/hex_stats")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; the
        # standalone/sandbox path starts a local one
        addr = os.environ.get("RAY_ADDRESS", "local")
        ray.init(
            address=addr,
            include_dashboard=False,
            logging_level="ERROR",
            **(
                {"num_cpus": int(os.environ["HEXRAY_JOB_CPUS"])}
                if "HEXRAY_JOB_CPUS" in os.environ and addr == "local"
                else {}
            ),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from hexscape_ray.pipelines.hexagg import enriched_hex_stats, etl_enrich_resumable

    # --pages accepts a directory, a glob pattern, or a single file
    if os.path.isdir(args.pages):
        files = sorted(glob.glob(os.path.join(args.pages, "*.parquet")))
    else:
        files = sorted(glob.glob(args.pages)) or [args.pages]
    t0 = time.perf_counter()
    stats = etl_enrich_resumable(
        files, args.out, files_per_partition=args.files_per_partition
    )
    if stats.get("done", 0) + stats.get("skipped", 0) == 0:
        print(json.dumps({"job": "flagship-etl", "partitions": stats,
                          "error": "no partition finished — see manifest.jsonl"}))
        ray.shutdown()
        return 1
    agg = enriched_hex_stats(args.out)
    os.makedirs(args.agg_out, exist_ok=True)
    agg.write_parquet(args.agg_out)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "job": "flagship-etl",
                "partitions": stats,
                "wall_sec": round(wall, 2),
                "out": args.out,
                "agg_out": args.agg_out,
            }
        )
    )
    ray.shutdown()
    return 1 if stats.get("failed") else 0


if __name__ == "__main__":
    raise SystemExit(main())
