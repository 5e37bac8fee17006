"""generate_patches / generate_neighbours parity invariants
(SURVEY §5 table: proportions Σ=1, complete hex interior count,
neighbour counts, border shortcut)."""

import numpy as np
import pyarrow as pa
import pytest
import pyarrow.parquet as pq

from hexscape_ray.config import GridSpec
from hexscape_ray.pipelines.patches import (
    generate_neighbours,
    generate_patches,
    index_patches,
)
from hexscape_ray.stages.spatial import coverage_gap


@pytest.fixture(scope="module")
def spec():
    return GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0, min_prop=0.01)


@pytest.fixture(scope="module")
def tables(fixture_dir):
    return (
        pq.read_table(f"{fixture_dir}/admin.parquet"),
        pq.read_table(f"{fixture_dir}/landcover.parquet"),
    )


@pytest.fixture(scope="module")
def patches_df(ray_session, tables, spec):
    admin, landcover = tables
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    ds = generate_patches(country, landcover, spec)
    return ds.to_pandas()


def test_patch_count_and_area(patches_df, spec):
    # interior hexes of a 100 km square at w=10 km: tens to ~150 rows
    assert 80 <= len(patches_df) <= 200
    # interior hexes have full area; boundary ones are clipped
    full = np.isclose(patches_df["area"], spec.hex_area, rtol=1e-9)
    assert full.sum() >= 50
    assert (patches_df["area"] <= spec.hex_area * (1 + 1e-9)).all()
    assert (patches_df["area"] >= spec.min_prop * spec.hex_area).all()
    # total clipped area ≈ landscape area (hexes tile the plane)
    assert abs(patches_df["area"].sum() - 100_000.0**2) < 1.0


def test_lu_fractions_sum_to_one(patches_df):
    lu_cols = [c for c in patches_df.columns if c.startswith("LU_")]
    assert lu_cols
    s = patches_df[lu_cols].sum(axis=1)
    # land-cover has a deliberate ~0.5% gap: proportions are over the
    # covered area (area/area_sum per the reference) so still sum to 1
    assert np.allclose(s, 1.0, atol=1.5e-8)
    assert (patches_df["lu_sum"] > 0).all()


def test_index_patches_dense_and_ordered(ray_session, patches_df):
    import ray.data

    ds = ray.data.from_pandas(patches_df)
    idx = index_patches(ds).to_pandas()
    assert idx["Index"].tolist() == list(range(1, len(idx) + 1))
    ordered = idx.sort_values(["q", "r"], ignore_index=True)
    assert (idx["q"].values == ordered["q"].values).all()


def test_neighbours(ray_session, tables, spec, patches_df):
    import ray.data

    admin, _ = tables
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    nb = generate_neighbours(
        ray.data.from_pandas(patches_df), country, spec
    ).to_pandas()
    # every edge endpoint is a known patch
    keys = set(zip(patches_df["r"], patches_df["q"]))
    assert all((r, q) in keys for r, q in zip(nb["r"], nb["q"]))
    assert all((r, q) in keys for r, q in zip(nb["nb_r"], nb["nb_q"]))
    # symmetry: (a → b) implies (b → a)
    edges = set(zip(nb["r"], nb["q"], nb["nb_r"], nb["nb_q"]))
    assert all((br, bq, ar, aq) in edges for ar, aq, br, bq in edges)
    # ≤ 6 neighbours each; interior patches have exactly 6
    per = nb.groupby(["r", "q"]).size()
    assert per.max() <= 6
    full_area = spec.hex_area * (1 - spec.min_prop)
    interior = patches_df[patches_df["area"] > full_area]
    inner = per[per == 6]
    assert len(inner) >= len(interior) // 2
    # complete-area shortcut: interior-pair borders equal hex_side
    assert np.isclose(nb["Border"].max(), spec.hex_side, rtol=1e-9)
    assert set(nb["Direction"]) <= {"NE", "E", "SE", "SW", "W", "NW"}
    # directions are symmetric: E ↔ W etc.
    dmap = dict(zip(zip(nb["r"], nb["q"], nb["nb_r"], nb["nb_q"]), nb["Direction"]))
    opposite = {"E": "W", "W": "E", "NE": "SW", "SW": "NE", "NW": "SE", "SE": "NW"}
    for (ar, aq, br, bq), d in list(dmap.items())[:200]:
        assert dmap[(br, bq, ar, aq)] == opposite[d]


def test_coverage_gap(tables):
    _, landcover = tables
    gap = coverage_gap(landcover, 100_000.0**2)
    assert 0.003 < gap["prop_missing"] < 0.01  # 8 of 1600 cells
    assert gap["warn"]

def test_area_loss_audit(ray_session, tables, spec, patches_df):
    import ray.data

    from hexscape_ray.pipelines.patches import area_loss_audit

    audit = area_loss_audit(ray.data.from_pandas(patches_df), spec).to_pandas()
    assert len(audit) == len(patches_df)
    # sorted worst-first
    assert (audit["loss"].values[:-1] >= audit["loss"].values[1:] - 1e-12).all()
    # the landcover gap is ~0.5% of the landscape → losses are small
    assert audit["loss"].max() < 0.2
    assert audit["loss"].min() > -1e-9


def test_split_parts_on_island_landscape(ray_session, spec):
    """M5: a hex straddling the channel between two islands explodes
    into per-part rows with exact areas."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )

    # two islands separated by a 3 km channel (hex width 10 km spans it)
    islands = pa.table(
        {
            "code": pa.array(["W", "E"]),
            "wkb": pa.array(
                [
                    polygon_to_wkb([rect(0, 0, 48_500, 100_000)]),
                    polygon_to_wkb([rect(51_500, 0, 100_000, 100_000)]),
                ],
                type=pa.binary(),
            ),
        }
    )
    split = generate_patches(islands, None, spec, split_parts=True).to_pandas()
    merged = generate_patches(islands, None, spec, split_parts=False).to_pandas()

    assert "part" in split.columns
    per_hex = split.groupby(["r", "q"]).size()
    assert per_hex.max() == 2  # straddling hexes became two rows
    assert (per_hex == 2).sum() >= 3
    # split areas sum to the merged hex areas (same pre-split filter)
    s = split.groupby(["r", "q"])["area"].sum()
    m = merged.set_index(["r", "q"])["area"]
    joined = s.to_frame("s").join(m.to_frame("m"), how="inner")
    # hexes whose pieces were all ≥ threshold match exactly; sliver-
    # dropped pieces make split ≤ merged
    assert (joined["s"] <= joined["m"] + 1e-6).all()
    assert np.isclose(joined["s"], joined["m"]).mean() > 0.8
    # part centroids sit inside their island (x strictly off-channel)
    two = split[split.duplicated(["r", "q"], keep=False)]
    assert ((two["x"] < 48_500) | (two["x"] > 51_500)).all()


def test_split_parts_on_concave_landscape(ray_session, spec):
    """M5 residue closed in round 2: a CONCAVE single landscape polygon
    (U-shape — a fjord notch) splits straddling hexes into per-part
    rows, matching the reference's st_cast(POLYGON)
    (/root/reference/R/generate_patches.R:148-166)."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb

    # one polygon: full square minus a 3 km-wide notch from the top
    # edge down to y = 50 km (hex width 10 km spans the notch)
    u_ring = np.array(
        [
            [0, 0],
            [100_000, 0],
            [100_000, 100_000],
            [51_500, 100_000],
            [51_500, 50_000],
            [48_500, 50_000],
            [48_500, 100_000],
            [0, 100_000],
            [0, 0],
        ],
        dtype=np.float64,
    )
    land = pa.table(
        {
            "code": pa.array(["U"]),
            "wkb": pa.array([polygon_to_wkb([u_ring])], type=pa.binary()),
        }
    )
    split = generate_patches(land, None, spec, split_parts=True).to_pandas()
    merged = generate_patches(land, None, spec, split_parts=False).to_pandas()

    per_hex = split.groupby(["r", "q"]).size()
    assert per_hex.max() == 2  # notch-straddling hexes became two rows
    assert (per_hex == 2).sum() >= 3
    # split rows only where the notch is (x near 50 km, y above 50 km)
    two = split[split.duplicated(["r", "q"], keep=False)]
    assert (two["y"] > 40_000).all()
    assert ((two["x"] < 48_500) | (two["x"] > 51_500)).all()
    # areas: piece sums ≤ merged (sliver drop), mostly exact
    s = split.groupby(["r", "q"])["area"].sum()
    m = merged.set_index(["r", "q"])["area"]
    joined = s.to_frame("s").join(m.to_frame("m"), how="inner")
    assert (joined["s"] <= joined["m"] + 1e-6).all()
    assert np.isclose(joined["s"], joined["m"]).mean() > 0.8


def test_patches_with_geometry(ray_session, tables, spec):
    """with_geometry=True emits clipped-hex WKB whose decoded area
    matches the area column (the reference's geometry list-column)."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.poly import polygon_area
    from hexscape_ray.geom.wkb import wkb_to_rings

    admin, _ = tables
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    out = generate_patches(country, None, spec, with_geometry=True).to_pandas()
    assert "wkb" in out.columns
    for row in out.head(40).itertuples(index=False):
        decoded = sum(polygon_area(rings) for rings in wkb_to_rings(row.wkb))
        assert np.isclose(decoded, row.area, rtol=1e-9)


def test_generate_patches_simplify_keep(ray_session, tables, spec, patches_df):
    """M11: simplify_keep applies shared-arc topology-preserving
    simplification to the land-cover layer before the clip; LU
    fractions still sum to 1 and stay close to the unsimplified run
    (the landcover fixture is mostly rectangles, so little can move)."""
    admin, landcover = tables
    country = admin.filter(pa.compute.equal(admin.column("level"), 0))
    simp = generate_patches(
        country, landcover, spec, simplify_keep=0.5
    ).to_pandas()
    lu_cols = [c for c in simp.columns if c.startswith("LU_")]
    assert np.allclose(simp[lu_cols].sum(axis=1), 1.0)
    assert len(simp) == len(patches_df)
    a = simp.sort_values(["q", "r"], ignore_index=True)
    b = patches_df.sort_values(["q", "r"], ignore_index=True)
    # same hexes, land-use mix within a few percent of the exact layer
    assert (a["r"] == b["r"]).all() and (a["q"] == b["q"]).all()
    assert np.abs(a[lu_cols].to_numpy() - b[lu_cols].to_numpy()).max() < 0.05


def test_split_parts_on_channel_hole(ray_session, spec):
    """A HOLE crossing the landscape (an impassable river) splits the
    hexes it crosses — the trapezoid-fallback path of
    clip_polygon_components (closes the last M5 edge case)."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb

    shell = np.array(
        [[0, 0], [100_000, 0], [100_000, 100_000], [0, 100_000], [0, 0]],
        dtype=np.float64,
    )
    # 3 km-wide channel hole running almost the full height
    hole = np.array(
        [
            [48_500, 1_000],
            [51_500, 1_000],
            [51_500, 99_000],
            [48_500, 99_000],
            [48_500, 1_000],
        ],
        dtype=np.float64,
    )
    land = pa.table(
        {
            "code": pa.array(["R"]),
            "wkb": pa.array([polygon_to_wkb([shell, hole])], type=pa.binary()),
        }
    )
    split = generate_patches(land, None, spec, split_parts=True).to_pandas()
    per_hex = split.groupby(["r", "q"]).size()
    assert per_hex.max() == 2  # channel-straddling hexes became two rows
    assert (per_hex == 2).sum() >= 3
    two = split[split.duplicated(["r", "q"], keep=False)]
    assert ((two["x"] < 48_500) | (two["x"] > 51_500)).all()
    # area accounting: hole area is excluded
    merged = generate_patches(land, None, spec, split_parts=False).to_pandas()
    assert abs(split["area"].sum() - merged["area"].sum()) < merged["area"].sum() * 0.01


def test_subtract_impassable_splits_and_excludes(ray_session, spec):
    """st_difference parity: an Impassable river (land-use category)
    is subtracted from every clipped hex piece; crossing hexes split
    and the channel's area vanishes from the patch table
    (/root/reference/R/generate_patches.R:148-166)."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )

    land = pa.table(
        {
            "code": pa.array(["L"]),
            "wkb": pa.array([polygon_to_wkb([rect(0, 0, 100_000, 100_000)])], type=pa.binary()),
        }
    )
    landcover = pa.table(
        {
            "category": pa.array(["Impassable"]),
            "wkb": pa.array(
                [polygon_to_wkb([rect(48_500, 0, 51_500, 100_000)])], type=pa.binary()
            ),
        }
    )
    split = generate_patches(
        land, None, spec, split_parts=True
    ).to_pandas()
    sub = generate_patches(
        land,
        landcover,
        spec,
        split_parts=True,
        subtract_impassable=True,
    ).to_pandas()
    # crossing hexes split into two rows
    per_hex = sub.groupby(["r", "q"]).size()
    assert per_hex.max() == 2
    assert (per_hex == 2).sum() >= 3
    # channel area excluded: total drops by ~3 km × 100 km
    lost = split["area"].sum() - sub["area"].sum()
    assert abs(lost - 3_000.0 * 100_000.0) < 3_000.0 * 100_000.0 * 0.05
    # no piece centroid inside the channel
    two = sub[sub.duplicated(["r", "q"], keep=False)]
    assert ((two["x"] < 48_500) | (two["x"] > 51_500)).all()
