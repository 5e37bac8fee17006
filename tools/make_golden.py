"""Produce the frozen golden files (FIXTURES.md F4) at a pinned engine
version.  Run ONCE and commit the outputs; tests compare against them.
Any change to grid math / extraction / aggregation that shifts these
must be intentional and re-frozen in the same commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def main():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from hexscape_ray import grid
    from hexscape_ray.config import DEFAULT_GRID, GridSpec
    from hexscape_ray.functions.geocode import geocode_urls
    from hexscape_ray.functions.text import extract_text
    from hexscape_ray.pipelines.hexagg import hex_language_mix
    from hexscape_ray.pipelines.patches import generate_neighbours, generate_patches
    from hexscape_ray.sources.fixtures import gen_admin, gen_pages

    os.makedirs(GOLDEN, exist_ok=True)
    pages = gen_pages(n=2000)

    # 1. tile assignment: (url, r, q, cell_r0, cell_r1)
    urls = pages.column("url").to_pylist()
    x, y = geocode_urls(urls)
    r0, q0 = grid.point_to_axial(x, y, DEFAULT_GRID, 0)
    c0 = grid.point_to_cell(x, y, DEFAULT_GRID, 0)
    c1 = grid.point_to_cell(x, y, DEFAULT_GRID, 1)
    pq.write_table(
        pa.table({"url": pa.array(urls), "r": pa.array(r0), "q": pa.array(q0),
                  "cell_r0": pa.array(c0), "cell_r1": pa.array(c1)}),
        os.path.join(GOLDEN, "tile_assignment.parquet"),
    )

    # 2. per-hex aggregate
    ds = ray.data.from_arrow(pages.select(["url", "text", "lang"]))
    agg = hex_language_mix(ds).to_pandas().sort_values("cell", ignore_index=True)
    pq.write_table(pa.Table.from_pandas(agg, preserve_index=False),
                   os.path.join(GOLDEN, "hex_agg.parquet"))

    # 3. neighbours on the toy landscape
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    admin = gen_admin()
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    patches = generate_patches(country, None, spec)
    nb = (
        generate_neighbours(patches, country, spec)
        .to_pandas()
        .sort_values(["r", "q", "nb_r", "nb_q"], ignore_index=True)
    )
    pq.write_table(pa.Table.from_pandas(nb, preserve_index=False),
                   os.path.join(GOLDEN, "neighbours.parquet"))

    # 4. url → sha256(text) proving byte-identical extraction
    out = {}
    for u, h, t in zip(urls, pages.column("html").to_pylist(), pages.column("text").to_pylist()):
        ext = extract_text(h)
        assert ext == t
        out[u] = hashlib.sha256(ext.encode()).hexdigest()
    with open(os.path.join(GOLDEN, "text_by_url.sha256.json"), "w") as f:
        json.dump(out, f, sort_keys=True, indent=0)

    print("golden files written:", sorted(os.listdir(GOLDEN)))
    ray.shutdown()


if __name__ == "__main__":
    main()
