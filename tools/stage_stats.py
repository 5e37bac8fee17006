"""Print per-stage ``ds.stats()`` for the flagship pipeline — the
measure-don't-guess loop (run after any stage change; SURVEY §4).

Usage: python tools/stage_stats.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from bench import ensure_pages
    from hexscape_ray.pipelines.hexagg import hex_language_mix
    from hexscape_ray.stages.textops import enrich_batch, extract_batch

    path = ensure_pages(n)
    ds = ray.data.read_parquet(path, columns=["url", "html", "lang"])
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=2048)
    ds = ds.map_batches(enrich_batch, batch_format="pyarrow", batch_size=2048)
    out = hex_language_mix(ds)
    mat = out.materialize()  # small per-hex result — fine to pin
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
