"""No-Ray scaling probe for the enrich kernel: K independent worker
PROCESSES (no shared state, no scheduler, no object store) each loop
`enrich_batch` over an in-memory batch for a fixed wall-time and
report per-process docs/s as K grows.

Purpose: attribute the in-sandbox N→4N efficiency loss.  If per-proc
throughput degrades with K *without Ray*, the ceiling is the shared
socket (frequency + memory bandwidth) — an artifact separate cluster
nodes do not share — and not the engine's orchestration.  Recorded in
BASELINE.md next to the scaling numbers.

Usage: python tools/bandwidth_probe.py [docs_per_batch] [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(n_docs: int, seconds: float, out_q) -> None:
    import glob

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    from hexscape_ray.stages.textops import enrich_batch, extract_batch

    files = sorted(glob.glob("/tmp/hexscape_bench/pages_*/*.parquet"))
    t = pq.read_table(files[0], columns=["url", "html", "lang"]).slice(0, n_docs)
    batch = extract_batch(t)
    enrich_batch(batch)  # warm (token-hash memo, numpy)
    t_end = time.perf_counter() + seconds
    done = 0
    while time.perf_counter() < t_end:
        enrich_batch(batch)
        done += n_docs
    out_q.put(done / seconds)


def run(k: int, n_docs: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(n_docs, seconds, q)) for _ in range(k)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    out = {}
    for k in (1, 2, 4, 8, 16, 32):
        rate = run(k, n_docs, seconds)
        out[str(k)] = round(rate)
        print(f"k={k:2d} procs: {rate:,.0f} docs/s/proc", file=sys.stderr)
    base = out["1"]
    print(
        json.dumps(
            {
                "metric": "enrich kernel docs/s per process vs busy processes (no Ray)",
                "per_proc": out,
                "retention_at_16": round(out["16"] / base, 3),
                "retention_at_32": round(out["32"] / base, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
