"""Kill–resume invariants (FIXTURES.md F5) + voronoi/sampling parity."""

import os

import numpy as np
import pytest
import ray.data

from hexscape_ray.config import DEFAULT_GRID
from hexscape_ray.pipelines.voronoi import (
    discretise_voronoi,
    randomise_voronoi,
    sample_points_in_polygons,
)
from hexscape_ray.state.checkpoint import read_manifest, run_partitioned


def _pipeline(files):
    from hexscape_ray.pipelines.hexagg import prepare_pages

    return prepare_pages(
        ray.data.read_parquet(files, columns=["url", "text", "lang"]), DEFAULT_GRID
    )


@pytest.fixture(scope="module")
def sharded_pages(ray_session, tmp_path_factory):
    """4 page shards as separate parquet files."""
    import pyarrow.parquet as pq

    from hexscape_ray.sources.fixtures import gen_pages

    d = tmp_path_factory.mktemp("shards")
    parts = {}
    for i in range(4):
        p = str(d / f"shard{i}.parquet")
        pq.write_table(gen_pages(n=400, seed=100 + i), p)
        parts[f"p{i}"] = [p]
    return parts


def test_kill_resume_skips_finished(sharded_pages, tmp_path):
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned(
            sharded_pages, out, _pipeline, spec_hash="h1", fail_after=2,
            content_hashing=True,
        )
    m = read_manifest(out)
    assert sum(1 for r in m.values() if r["status"] == "ok") == 2

    stats = run_partitioned(
        sharded_pages, out, _pipeline, spec_hash="h1", content_hashing=True
    )
    assert stats["skipped"] == 2 and stats["done"] == 2 and stats["failed"] == 0
    m2 = read_manifest(out)
    assert len(m2) == 4 and all(r["status"] == "ok" for r in m2.values())
    # finished partitions were NOT recomputed: content hashes stable
    for pid in ("p0", "p1"):
        assert m2[pid]["content_hash"] == m[pid]["content_hash"]
    # all partition dirs exist with rows matching the manifest
    import pyarrow.parquet as pq

    for pid, rec in m2.items():
        pdir = os.path.join(out, f"part={pid}")
        rows = sum(
            pq.read_metadata(os.path.join(pdir, f)).num_rows
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        assert rows == rec["rows"] == 400


def test_resume_output_byte_identical(sharded_pages, tmp_path):
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    with pytest.raises(RuntimeError):
        run_partitioned(
            sharded_pages, out1, _pipeline, spec_hash="h", fail_after=3,
            content_hashing=True,
        )
    run_partitioned(sharded_pages, out1, _pipeline, spec_hash="h", content_hashing=True)
    run_partitioned(sharded_pages, out2, _pipeline, spec_hash="h", content_hashing=True)
    m1, m2 = read_manifest(out1), read_manifest(out2)
    for pid in m1:
        assert m1[pid]["content_hash"] == m2[pid]["content_hash"]


def test_spec_change_invalidates(sharded_pages, tmp_path):
    out = str(tmp_path / "c")
    run_partitioned(sharded_pages, out, _pipeline, spec_hash="v1")
    stats = run_partitioned(sharded_pages, out, _pipeline, spec_hash="v2")
    assert stats["done"] == 4 and stats["skipped"] == 0


# --- voronoi / sampling --------------------------------------------------


@pytest.fixture(scope="module")
def points_ds(ray_session, fixture_dir):
    return ray.data.read_parquet(f"{fixture_dir}/points.parquet")


def test_voronoi_cell_count_and_partition(points_ds):
    out = discretise_voronoi(points_ds).to_pandas()
    assert len(out) == 200  # one cell per point (:28-31 invariant)
    # cells partition the bbox: areas sum to the landscape area (km²)
    assert abs(out["Area"].sum() - 10_000.0) < 1e-6
    # every point lies inside its own cell (containment ⇒ correct cell)
    from hexscape_ray.geom.poly import points_in_polygon
    from hexscape_ray.geom.wkb import wkb_to_rings

    for row in out.head(50).itertuples(index=False):
        rings = wkb_to_rings(row.wkb)[0]
        assert points_in_polygon([row.x], [row.y], rings)[0]


def test_sample_points_exact_count(points_ds):
    vor = discretise_voronoi(points_ds)
    pts = sample_points_in_polygons(vor.limit(40), size=7, seed=3).to_pandas()
    assert len(pts) == 40 * 7
    counts = pts.groupby("idx").size()
    assert (counts == 7).all()


def test_sample_points_deterministic_across_partitioning(points_ds):
    vor = discretise_voronoi(points_ds).limit(32)
    a = sample_points_in_polygons(vor, size=3, seed=9).to_pandas()
    b = sample_points_in_polygons(vor.repartition(5), size=3, seed=9).to_pandas()
    a = a.sort_values(["idx", "x"], ignore_index=True)
    b = b.sort_values(["idx", "x"], ignore_index=True)
    assert np.allclose(a[["x", "y"]].to_numpy(), b[["x", "y"]].to_numpy())


def test_randomise_voronoi(points_ds):
    small = points_ds.limit(60)
    out = randomise_voronoi(small, randomise_size=10, max_tries=100, seed=2)
    assert len(out) == 60
    # without-replacement: each cell used at most once
    assert out["assigned_cell"].is_unique
    # audit column present and some points moved
    assert out["RandomShift"].any()
    # determinism
    out2 = randomise_voronoi(small, randomise_size=10, max_tries=100, seed=2)
    assert np.allclose(out[["new_x", "new_y"]], out2[["new_x", "new_y"]])


def test_randomise_voronoi_mask(points_ds):
    small = points_ds.limit(60)
    ids = small.to_pandas()["idx"].tolist()
    mask = set(ids[:5])
    out = randomise_voronoi(small, randomise_size=10, max_tries=100, seed=2, mask_ids=mask)
    m = out[out["VoronoiMasked"]]
    assert set(m["idx"]) == mask
    # masked points did not move and kept their own cell
    assert (m["new_x"] == m["x"]).all() and (m["new_y"] == m["y"]).all()
    assert (m["assigned_cell"] == m["idx"]).all()
    # still without replacement overall
    assert out["assigned_cell"].is_unique


def test_etl_partitioned_by_lang(ray_session, tmp_path):
    """Hive-partitioned enriched output: per-key directories, pruned
    reads, and the aggregate over the hive root."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from hexscape_ray.pipelines.hexagg import enriched_hex_stats, etl_enrich
    from hexscape_ray.sources.fixtures import gen_pages

    src = str(tmp_path / "pages.parquet")
    pq.write_table(gen_pages(n=800, seed=31), src)
    out = str(tmp_path / "hive")
    etl_enrich(src, out, partition_cols=["lang"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) == 8
    per_dir = {
        d: ray.data.read_parquet(os.path.join(out, d)).count() for d in dirs[:2]
    }
    assert all(v > 0 for v in per_dir.values())
    agg = enriched_hex_stats(out).to_pandas()
    assert agg["n_docs"].sum() == 800


def test_resume_default_mode_no_content_hash(sharded_pages, tmp_path):
    """Default (production) mode skips the content-hash re-read —
    manifest records null — and kill–resume still works."""
    out = str(tmp_path / "nohash")
    with pytest.raises(RuntimeError):
        run_partitioned(sharded_pages, out, _pipeline, spec_hash="h", fail_after=2)
    stats = run_partitioned(sharded_pages, out, _pipeline, spec_hash="h")
    assert stats["skipped"] == 2 and stats["done"] == 2
    m = read_manifest(out)
    assert all(r["status"] == "ok" for r in m.values())
    assert all(r["content_hash"] is None for r in m.values())


def test_randomise_voronoi_additional_info(points_ds):
    """additional_info emits the reference audit-column surface
    (/root/reference/R/randomise_voronoi.R:234-244) with the
    without-replacement invariants visible in the counters."""
    from hexscape_ray.geom.wkb import wkb_to_point

    small = points_ds.limit(40)
    out = randomise_voronoi(
        small, randomise_size=10, max_tries=100, seed=2, additional_info=True
    )
    for col in (
        "shift_wkb",
        "from_wkb",
        "to_wkb",
        "cell_wkb",
        "assigned_cell_wkb",
        "n_to_candidates",
        "n_from_candidates",
        "from_times_chosen",
    ):
        assert col in out.columns, col
    # without replacement: every cell chosen exactly once
    assert (out["from_times_chosen"] == 1).all()
    assert out["from_times_chosen"].sum() == len(out)
    # pool counters: symmetric closure makes both ≥ k+1 on average
    assert (out["n_to_candidates"] >= 2).all()
    assert (out["n_from_candidates"] >= 1).all()
    # to_wkb decodes back to the new location
    x0, y0 = wkb_to_point(out["to_wkb"].iloc[0])
    assert x0 == out["new_x"].iloc[0] and y0 == out["new_y"].iloc[0]


def test_randomise_voronoi_strict_hard_fail(ray_session):
    """strict=True reproduces the reference hard-fail after max_tries
    greedy restarts (/root/reference/R/randomise_voronoi.R:222-226);
    the default falls back to a perfect matching on the same layout.
    Layout+seed found by exhaustive search: greedy exhausts on try 1."""
    px = [26.97867137638703, 4.0973523936194685, 1.6527635528529094,
          81.32702392002724, 91.27555772777217, 60.663577576717984,
          72.94965609839984, 54.362499146542284]
    py = [93.50724237877682, 81.58535541215322, 0.2738500170148095,
          85.74042765875693, 3.3585575305464355, 72.9655446429944,
          17.5655620602559, 86.31789223498866]
    import pandas as pd

    pts = ray.data.from_pandas(
        pd.DataFrame(
            {
                "idx": np.arange(8, dtype=np.int64),
                "x": np.array(px) * 1000.0,
                "y": np.array(py) * 1000.0,
            }
        )
    )
    with pytest.raises(RuntimeError, match="valid randomisation"):
        randomise_voronoi(pts, randomise_size=2, max_tries=1, seed=2, strict=True)
    # fallback path still succeeds on the identical layout
    out = randomise_voronoi(pts, randomise_size=2, max_tries=1, seed=2)
    assert len(out) == 8
    assert out["assigned_cell"].is_unique


def test_map_stage_survives_worker_crash(ray_session):
    """Ray-level fault tolerance (below the engine's checkpoint
    layer): a map task hard-kills its own worker process the FIRST
    time it sees the marker block; Ray restarts the task on a fresh
    worker and the aggregate comes out exactly right — the lineage
    retry a multi-node run leans on when a node dies mid-stage."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data

    from hexscape_ray.stages.agg import two_phase_sum

    flag = os.path.join(tempfile.gettempdir(), "hexray_crash_once_flag")
    if os.path.exists(flag):
        os.remove(flag)

    n = 20_000
    ds = ray.data.range(n, override_num_blocks=16)

    def enc(batch, flag=flag):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        if 7_777 in ids and not os.path.exists(flag):
            open(flag, "w").close()  # crash exactly once, then recover
            os._exit(1)
        return pa.table(
            {
                "k": pa.array((ids % 7).astype(np.int64)),
                "v": pa.array(ids.astype(np.int64)),
            }
        )

    out = (
        two_phase_sum(
            ds.map_batches(enc, batch_format="pyarrow"), ["k"], ["v"], count_as="n"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    ids = np.arange(n, dtype=np.int64)
    expect_v = np.bincount(ids % 7, weights=ids).astype(np.int64)
    assert np.array_equal(out["v"].to_numpy(), expect_v)
    assert int(out["n"].sum()) == n
    assert os.path.exists(flag)  # the crash really happened
    os.remove(flag)
