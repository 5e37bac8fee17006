"""discretise_habitat + generate_connectedness invariants."""

import numpy as np
import pytest
import ray.data

from hexscape_ray.config import GridSpec
from hexscape_ray.pipelines.connectedness import generate_connectedness, kernel_ring
from hexscape_ray.pipelines.habitat import (
    bandwidth_nrd,
    discretise_habitat,
    kde2d_grid,
    raster_to_hex,
    threshold_by_cumulative_area,
)

SPEC = GridSpec(hex_width=5000.0, ref_x=0.0, ref_y=100_000.0)


@pytest.fixture(scope="module")
def clustered_points(ray_session):
    rng = np.random.default_rng(8)
    a = rng.normal([25_000, 25_000], 4_000, size=(300, 2))
    b = rng.normal([70_000, 70_000], 6_000, size=(200, 2))
    pts = np.clip(np.vstack([a, b]), 0, 100_000)
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table({"x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    )


def test_bandwidth_nrd_positive():
    x = np.random.default_rng(1).normal(0, 10, 500)
    assert bandwidth_nrd(x) > 0


def test_kde2d_integrates_to_one():
    rng = np.random.default_rng(2)
    px, py = rng.normal(50, 5, 400), rng.normal(50, 5, 400)
    gx, gy, z = kde2d_grid(px, py, n=128, bbox=(0, 0, 100, 100))
    dx, dy = gx[1] - gx[0], gy[1] - gy[0]
    assert abs(z.sum() * dx * dy - 1.0) < 0.05


def test_raster_to_hex_mean(ray_session):
    gx = np.linspace(0, 100_000, 50)
    gy = np.linspace(0, 100_000, 50)
    z = np.ones((50, 50))
    out = raster_to_hex(gx, gy, z, SPEC).to_pandas()
    assert np.allclose(out["z"], 1.0)


def test_threshold_keeps_top_density(ray_session, clustered_points):
    pdf = clustered_points.to_pandas()
    gx, gy, z = kde2d_grid(
        pdf["x"].to_numpy(), pdf["y"].to_numpy(), n=64, bbox=(0, 0, 100_000, 100_000)
    )
    hexes = raster_to_hex(gx, gy, z, SPEC)
    target = 12 * SPEC.hex_area
    kept = threshold_by_cumulative_area(hexes, target, SPEC.hex_area).to_pandas()
    assert len(kept) == 12
    # kept are exactly the 12 densest
    all_z = hexes.to_pandas().sort_values("z", ascending=False)
    assert np.allclose(np.sort(kept["z"]), np.sort(all_z["z"].head(12)))


def test_discretise_habitat_components(ray_session, clustered_points):
    out = discretise_habitat(
        clustered_points, SPEC, target_area=14 * SPEC.hex_area, n_components=2
    )
    assert len(out) == 14
    assert set(out["component"]) == {0, 1}
    # the two kmeans components sit near the two true clusters
    c0 = out[out.component == 0][["cx", "cy"]].mean()
    c1 = out[out.component == 1][["cx", "cy"]].mean()
    d = np.hypot(c0[0] - c1[0], c0[1] - c1[1])
    assert d > 30_000
    assert (out["Capacity"] > 0).all()
    assert out["PatchID"].str.match(r"main_\d").all()


def test_kernel_ring_monotone():
    dr, dq, w = kernel_ring(SPEC, 3)
    assert dr.shape[0] == 37  # disk of radius 3
    centre = (dr == 0) & (dq == 0)
    assert w[centre][0] == w.max()


def test_connectedness_rows_and_normalisation(ray_session):
    import pyarrow as pa

    r, q = np.meshgrid(np.arange(10, 16), np.arange(4, 10))
    patches = ray.data.from_arrow(
        pa.table({"r": pa.array(r.ravel()), "q": pa.array(q.ravel())})
    )
    out = generate_connectedness(patches, SPEC, k=2).to_pandas()
    # per-source normalisation: Σ Connectedness = 1
    s = out.groupby(["src_r", "src_q"])["Connectedness"].sum()
    assert np.allclose(s, 1.0)
    # self-pair has the max weight per source
    for (sr, sq), g in out.groupby(["src_r", "src_q"]):
        selfrow = g[(g.dst_r == sr) & (g.dst_q == sq)]
        assert len(selfrow) == 1
        assert selfrow["Connectedness"].iloc[0] >= g["Connectedness"].max() - 1e-12
    # dense form round-trips
    ids, M = generate_connectedness(patches, SPEC, k=2, sparse=False)
    assert M.shape == (36, 36)
    assert np.allclose(M.sum(axis=1), 1.0)


def test_connectedness_subgrid_mode(ray_session):
    """Sub-grid integral (reference grid_resolution semantics):
    normalised rows, self-pair dominant, and — unlike centroid mode —
    weights reflect the area-share of each neighbour hex."""
    import pyarrow as pa

    r, q = np.meshgrid(np.arange(10, 16), np.arange(4, 10))
    patches = ray.data.from_arrow(
        pa.table({"r": pa.array(r.ravel()), "q": pa.array(q.ravel())})
    )
    out = generate_connectedness(patches, SPEC, k=2, grid_resolution=21).to_pandas()
    s = out.groupby(["src_r", "src_q"])["Connectedness"].sum()
    assert np.allclose(s, 1.0)
    mid = out[(out.src_r == 12) & (out.src_q == 7)]
    selfw = mid[(mid.dst_r == 12) & (mid.dst_q == 7)]["Connectedness"].iloc[0]
    assert selfw == mid["Connectedness"].max()
    # all six direct neighbours receive weight (grid points fall in them)
    nb = mid[(mid.dst_r != 12) | (mid.dst_q != 7)]
    from hexscape_ray import grid as hexgrid

    direct = {(12 + dr, 7 + dq) for dr, dq in hexgrid.NEIGHBOR_OFFSETS}
    got = set(zip(nb["dst_r"], nb["dst_q"]))
    assert direct <= got


def test_connectedness_subgrid_geometry_parity(ray_session):
    """Sub-grid mode with patch geometry (st_contains_properly parity,
    /root/reference/R/generate_connectedness.R:106-121): grid points
    over the sea are unassigned, so a coastline-clipped target patch
    receives LESS weight relative to an interior self patch than in
    ideal-hex mode."""
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb
    from hexscape_ray.pipelines.patches import generate_patches

    # coastline at x = 31 km: land is the left strip only
    ring = np.array(
        [[0, 0], [31_000, 0], [31_000, 100_000], [0, 100_000], [0, 0]],
        dtype=np.float64,
    )
    land = pa.table(
        {
            "code": pa.array(["L"]),
            "wkb": pa.array([polygon_to_wkb([ring])], type=pa.binary()),
        }
    )
    patches_geo = generate_patches(land, None, SPEC, with_geometry=True)
    patches_plain = patches_geo.drop_columns(["wkb"])
    geo = generate_connectedness(
        patches_geo, SPEC, k=2, grid_resolution=21
    ).to_pandas()
    ideal = generate_connectedness(
        patches_plain, SPEC, k=2, grid_resolution=21
    ).to_pandas()
    # both normalise per source
    assert np.allclose(geo.groupby(["src_r", "src_q"])["Connectedness"].sum(), 1.0)

    # pick an interior source (centroid well inside land) with a
    # coastal target (clipped hex): weight(target)/weight(self) must
    # shrink in geometry mode
    pdf = patches_geo.to_pandas()
    interior = pdf[pdf["x"] < 20_000].iloc[0]
    coastal = pdf.loc[pdf["x"].idxmax()]  # most-clipped boundary hex
    sr, sq = int(interior["r"]), int(interior["q"])

    def ratio(df, tr, tq):
        g = df[(df.src_r == sr) & (df.src_q == sq)].set_index(["dst_r", "dst_q"])
        if (tr, tq) not in g.index:
            return 0.0
        return (
            g.loc[(tr, tq), "Connectedness"] / g.loc[(sr, sq), "Connectedness"]
        )

    tr, tq = int(coastal["r"]), int(coastal["q"])
    # only meaningful when the coastal hex is inside the kernel disk
    if abs(tr - sr) <= 2 and abs(tq - sq) <= 2 and abs((tr + tq) - (sr + sq)) <= 2:
        assert ratio(geo, tr, tq) < ratio(ideal, tr, tq)
    # global direction: clipped hexes hold a smaller share of total
    # incoming weight under geometry containment
    coast_keys = set(
        zip(pdf.loc[pdf["area"] < 0.9 * SPEC.hex_area, "r"],
            pdf.loc[pdf["area"] < 0.9 * SPEC.hex_area, "q"])
    )
    def coast_share(df):
        m = df.apply(lambda row: (row.dst_r, row.dst_q) in coast_keys, axis=1)
        return df.loc[m, "Connectedness"].sum() / df["Connectedness"].sum()
    assert coast_share(geo) < coast_share(ideal)


def test_kde2d_distributed_matches_driver(ray_session, clustered_points):
    """The per-block partial kernel-sum KDE equals the single-matmul
    driver KDE up to float-sum re-association (and exactly selects the
    same thresholded hex set on the fixture)."""
    import numpy as np

    from hexscape_ray.pipelines.habitat import (
        kde2d_grid,
        kde2d_grid_distributed,
    )

    pdf = clustered_points.to_pandas()
    bbox = (0.0, 0.0, 100_000.0, 100_000.0)
    gx0, gy0, z0 = kde2d_grid(
        pdf["x"].to_numpy(), pdf["y"].to_numpy(), n=32, bbox=bbox
    )
    gx1, gy1, z1 = kde2d_grid_distributed(
        clustered_points.repartition(5), n=32, bbox=bbox
    )
    assert np.array_equal(gx0, gx1) and np.array_equal(gy0, gy1)
    assert np.allclose(z0, z1, rtol=1e-12, atol=1e-18)
    # the density RANKING (what thresholding consumes) is identical
    assert (np.argsort(z0.ravel())[::-1][:50] == np.argsort(z1.ravel())[::-1][:50]).all()
