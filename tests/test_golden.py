"""Golden-file regression tests (FIXTURES.md F4): any drift in grid
math, extraction, or aggregation must be an intentional re-freeze
(tools/make_golden.py)."""

import hashlib
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_tile_assignment_frozen():
    from hexscape_ray import grid
    from hexscape_ray.config import DEFAULT_GRID
    from hexscape_ray.functions.geocode import geocode_urls
    from hexscape_ray.sources.fixtures import gen_pages

    gold = pq.read_table(os.path.join(GOLDEN, "tile_assignment.parquet"))
    pages = gen_pages(n=2000)
    urls = pages.column("url").to_pylist()
    assert urls == gold.column("url").to_pylist()
    x, y = geocode_urls(urls)
    r, q = grid.point_to_axial(x, y, DEFAULT_GRID, 0)
    assert np.array_equal(r, gold.column("r").to_numpy())
    assert np.array_equal(q, gold.column("q").to_numpy())
    c1 = grid.point_to_cell(x, y, DEFAULT_GRID, 1)
    assert np.array_equal(c1, gold.column("cell_r1").to_numpy())


def test_hex_agg_frozen(ray_session):
    import ray.data

    from hexscape_ray.pipelines.hexagg import hex_language_mix
    from hexscape_ray.sources.fixtures import gen_pages

    gold = pq.read_table(os.path.join(GOLDEN, "hex_agg.parquet")).to_pandas()
    pages = gen_pages(n=2000)
    ds = ray.data.from_arrow(pages.select(["url", "text", "lang"]))
    got = hex_language_mix(ds).to_pandas().sort_values("cell", ignore_index=True)
    assert got.columns.tolist() == gold.columns.tolist()
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c], gold[c], atol=0), c
        else:
            assert got[c].equals(gold[c]), c


def test_neighbours_frozen(ray_session):
    import pyarrow as pa

    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.patches import generate_neighbours, generate_patches
    from hexscape_ray.sources.fixtures import gen_admin

    gold = pq.read_table(os.path.join(GOLDEN, "neighbours.parquet")).to_pandas()
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    admin = gen_admin()
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    patches = generate_patches(country, None, spec)
    nb = (
        generate_neighbours(patches, country, spec)
        .to_pandas()
        .sort_values(["r", "q", "nb_r", "nb_q"], ignore_index=True)
    )
    assert len(nb) == len(gold)
    for c in ["r", "q", "nb_r", "nb_q", "Direction"]:
        assert nb[c].equals(gold[c]), c
    assert np.allclose(nb["Border"], gold["Border"], atol=1e-9)


def test_text_hashes_frozen():
    from hexscape_ray.functions.text import extract_text
    from hexscape_ray.sources.fixtures import gen_pages

    with open(os.path.join(GOLDEN, "text_by_url.sha256.json")) as f:
        gold = json.load(f)
    pages = gen_pages(n=2000)
    for u, h in zip(
        pages.column("url").to_pylist()[:500], pages.column("html").to_pylist()[:500]
    ):
        assert hashlib.sha256(extract_text(h).encode()).hexdigest() == gold[u]
