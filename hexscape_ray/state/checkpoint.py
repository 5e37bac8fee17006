"""Checkpoint–resume with per-partition lineage records.

The reference's resume unit is the per-NUTS1 qs cache file guarded by
a package-version attribute (/root/reference/R/load_corine.R:171-199,
/root/reference/R/download_corine.R:41-45): presence + matching
version ⇒ skip recompute.  The engine generalises that:

- output layout: ``out_dir/part=<pid>/`` — one directory per input
  partition, written ATOMICALLY (tmp dir + rename);
- ``manifest.jsonl``: one lineage record per finished partition —
  partition id, input fragments, row count, content hash, wall time,
  engine version + GridSpec hash (cache invalidation,
  /root/reference/R/extract_corine.R:33-36);
- failed partitions leave an error record + a quarantine entry instead
  of a half-written directory (crash forensics,
  /root/reference/R/extract_corine.R:302-307);
- resume: rerun the same call — finished partitions whose version/spec
  hash matches are skipped; everything else recomputes.

Partitions are processed as independent Dataset executions (each one
parallel across the cluster); a killed ``ray job submit`` rerun
continues from the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

from ray.data import Dataset

from hexscape_ray.config import ENGINE_VERSION


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> dict[str, dict]:
    """partition_id → latest record."""
    out: dict[str, dict] = {}
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    out[rec["partition_id"]] = rec
    return out


def _append_manifest(out_dir: str, rec: dict) -> None:
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _content_hash(part_dir: str) -> str:
    """Deterministic, order-insensitive hash of the partition's ROWS
    (file names/splits vary run-to-run; the logical content must not).
    Row-wise pandas value hashes summed mod 2^64 — identical content ⇒
    identical hash regardless of row order or file layout."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from pandas.util import hash_pandas_object

    acc = np.uint64(0)
    n = 0
    for name in sorted(os.listdir(part_dir)):
        if not name.endswith(".parquet"):
            continue
        df = pq.read_table(os.path.join(part_dir, name)).to_pandas()
        df = df[sorted(df.columns)]
        for c in df.columns:  # list/array cells (e.g. sketch columns) → bytes
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: v.tobytes() if isinstance(v, np.ndarray) else v
                )
        with np.errstate(over="ignore"):
            acc += np.uint64(hash_pandas_object(df, index=False).to_numpy().sum())
        n += len(df)
    return f"{int(acc):016x}-{n}"


def run_partitioned(
    partitions: dict[str, list[str]],
    out_dir: str,
    pipeline_fn: Callable[[list[str]], Dataset],
    spec_hash: str = "",
    fail_after: int | None = None,
    content_hashing: bool = False,
) -> dict:
    """Process ``partitions`` (partition_id → input files) resumably.

    ``pipeline_fn(input_files) -> Dataset`` builds the (lazy) per-
    partition pipeline; its output is written to
    ``out_dir/part=<pid>/``.  Returns summary stats.  ``fail_after``
    injects a crash after N completed partitions (kill–resume tests).

    ``content_hashing``: audit mode — re-read each finished partition
    and record an order-insensitive row hash in the manifest.  OFF by
    default: at 100-TB scale it doubles checkpoint I/O (every written
    byte read back through pandas), and resume correctness never
    needed it (the manifest's version/spec-hash + atomic rename are
    the resume gate).  The manifest records which mode wrote each
    partition (``content_hash`` present or ``null``).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    done = skipped = failed = 0
    for pid in sorted(partitions):
        rec = manifest.get(pid)
        if (
            rec
            and rec.get("status") == "ok"
            and rec.get("engine_version") == ENGINE_VERSION
            and rec.get("spec_hash") == spec_hash
            and os.path.isdir(os.path.join(out_dir, f"part={pid}"))  # not vanished
        ):
            skipped += 1
            continue
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure after {done} partitions")
        part_dir = os.path.join(out_dir, f"part={pid}")
        tmp_dir = os.path.join(out_dir, f".tmp-part={pid}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        t0 = time.perf_counter()
        try:
            ds = pipeline_fn(partitions[pid])
            # big files: per-file open/footer overhead costs 2-4× on
            # write AND read-back when every block becomes a tiny file
            ds.write_parquet(tmp_dir, min_rows_per_file=65536)
            # row count from parquet footers — no data-page re-read
            import pyarrow.parquet as pq

            rows = 0
            nbytes = 0
            for name in os.listdir(tmp_dir):
                if name.endswith(".parquet"):
                    fp = os.path.join(tmp_dir, name)
                    rows += pq.read_metadata(fp).num_rows
                    nbytes += os.path.getsize(fp)
            # audit-mode only: hashing re-reads every written byte
            content_hash = _content_hash(tmp_dir) if content_hashing else None
            os.rename(tmp_dir, part_dir)  # failure leaves only tmp (retried clean)
            _append_manifest(
                out_dir,
                {
                    "partition_id": pid,
                    "status": "ok",
                    "inputs": partitions[pid],
                    "rows": rows,
                    "bytes": nbytes,
                    "content_hash": content_hash,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "engine_version": ENGINE_VERSION,
                    "spec_hash": spec_hash,
                },
            )
            done += 1
        except Exception as e:  # quarantine + error record, keep going
            shutil.rmtree(tmp_dir, ignore_errors=True)
            _append_manifest(
                out_dir,
                {
                    "partition_id": pid,
                    "status": "error",
                    "inputs": partitions[pid],
                    "error": f"{type(e).__name__}: {e}",
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "engine_version": ENGINE_VERSION,
                    "spec_hash": spec_hash,
                },
            )
            failed += 1
    return {"done": done, "skipped": skipped, "failed": failed}
