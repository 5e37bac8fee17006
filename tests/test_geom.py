"""Geometry kernel: areas, PIP, convex clipping, WKB, spatial index."""

import numpy as np
import pytest

from hexscape_ray.geom import (
    clip_polygon_convex,
    clip_ring_convex,
    point_to_wkb,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    polygon_intersection_area_convex,
    polygon_to_wkb,
    multipolygon_to_wkb,
    ring_area,
    wkb_to_rings,
)
from hexscape_ray.geom.index import GeomIndex
from hexscape_ray.geom.poly import distance_to_polygon

SQ = np.array([[0.0, 0.0], [10, 0], [10, 10], [0, 10]])
HOLE = np.array([[4.0, 4], [6, 4], [6, 6], [4, 6]])
TRI = np.array([[0.0, 0], [4, 0], [0, 4]])


def test_areas():
    assert ring_area(SQ) == 100.0
    assert polygon_area([SQ]) == 100.0
    assert polygon_area([SQ, HOLE]) == 96.0
    assert abs(ring_area(TRI)) == 8.0


def test_centroid():
    assert np.allclose(polygon_centroid([SQ]), (5, 5))
    assert np.allclose(polygon_centroid([SQ, HOLE]), (5, 5))


def test_point_in_polygon_with_hole():
    px = np.array([5.0, 5.0, 15.0, 4.5])
    py = np.array([2.0, 5.0, 5.0, 4.5])
    got = points_in_polygon(px, py, [SQ, HOLE])
    assert got.tolist() == [True, False, False, False]


def test_clip_convex_full_and_partial():
    win = np.array([[2.0, 2], [8, 2], [8, 8], [2, 8]])
    assert polygon_intersection_area_convex([SQ], win) == 36.0
    assert polygon_intersection_area_convex([SQ, HOLE], win) == 32.0
    # window fully inside subject
    tiny = np.array([[4.5, 4.5], [5.5, 4.5], [5.5, 5.5], [4.5, 5.5]])
    assert polygon_intersection_area_convex([SQ], tiny) == 1.0
    # disjoint
    far = SQ + 100.0
    assert polygon_intersection_area_convex([far], win) == 0.0


def test_clip_cw_window_normalised():
    win_cw = np.array([[2.0, 2], [2, 8], [8, 8], [8, 2]])  # clockwise
    assert polygon_intersection_area_convex([SQ], win_cw) == 36.0


def test_clip_additivity_over_tiling():
    """Areas of clips against a tiling partition sum to the whole —
    the invariant behind per-hex land-use fractions."""
    rng = np.random.default_rng(5)
    pts = rng.random((8, 2)) * 10
    hull = _convex_hull(pts)
    total = abs(ring_area(hull))
    acc = 0.0
    for i in range(5):
        for j in range(5):
            win = np.array(
                [[i * 2.0, j * 2.0], [(i + 1) * 2.0, j * 2.0], [(i + 1) * 2.0, (j + 1) * 2.0], [i * 2.0, (j + 1) * 2.0]]
            )
            acc += polygon_intersection_area_convex([hull], win)
    assert abs(acc - total) < 1e-9


def _convex_hull(pts):
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def test_wkb_roundtrip():
    w = polygon_to_wkb([SQ, HOLE])
    back = wkb_to_rings(w)
    assert len(back) == 1 and len(back[0]) == 2
    assert np.allclose(back[0][0][:-1], SQ)
    mw = multipolygon_to_wkb([[SQ], [TRI]])
    back2 = wkb_to_rings(mw)
    assert len(back2) == 2
    from hexscape_ray.geom.wkb import wkb_to_point

    assert wkb_to_point(point_to_wkb(1.5, -2.5)) == (1.5, -2.5)


def test_distance_to_polygon():
    d = distance_to_polygon([5, -3, 13], [5, 5, 14], [SQ])
    assert d[0] == 0.0
    assert abs(d[1] - 3.0) < 1e-12
    assert abs(d[2] - 5.0) < 1e-12


def test_geom_index_assign_and_first_wins():
    polys = [[SQ], [SQ + 10.0], [SQ + 5.0]]  # third overlaps both
    idx = GeomIndex(polys)
    got = idx.assign_points(np.array([5.0, 15.0, 7.0]), np.array([5.0, 15.0, 7.0]))
    # (7,7) is inside poly 0 and poly 2 → lowest gid wins (deterministic)
    assert got.tolist() == [0, 1, 0]
    miss = idx.assign_points(np.array([-5.0]), np.array([-5.0]))
    assert miss.tolist() == [-1]


def test_geom_index_min_distance():
    idx = GeomIndex([[SQ]])
    d = idx.min_distance(np.array([5.0, 12.0]), np.array([5.0, 10.0]))
    assert d[0] == 0.0
    assert abs(d[1] - 2.0) < 1e-12


# ---------------------------------------------------------------------------
# multi-component convex clip (Weiler–Atherton, M5 concave splits)
# ---------------------------------------------------------------------------


def test_clip_parts_u_shape():
    from hexscape_ray.geom.clip import (
        clip_ring_convex_parts,
        convex_clip_bbox,
        polygon_intersection_area_convex,
    )
    from hexscape_ray.geom.poly import ring_area

    u = np.array(
        [[0, 0], [1, 0], [1, 3], [2, 3], [2, 0], [3, 0], [3, 4], [0, 4]], float
    )
    win = convex_clip_bbox(-1, -1, 4, 2)  # cuts below the U's bridge
    parts = clip_ring_convex_parts(u, win)
    assert len(parts) == 2
    areas = sorted(abs(ring_area(p)) for p in parts)
    assert np.allclose(areas, [2.0, 2.0])
    assert np.isclose(sum(areas), polygon_intersection_area_convex([u], win))


def test_clip_parts_containment_cases():
    from hexscape_ray.geom.clip import clip_ring_convex_parts, convex_clip_bbox
    from hexscape_ray.geom.poly import ring_area

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    # subject inside window → subject unchanged
    assert len(clip_ring_convex_parts(sq, convex_clip_bbox(-5, -5, 5, 5))) == 1
    # window inside subject → window
    big = np.array([[-10, -10], [10, -10], [10, 10], [-10, 10]], float)
    p = clip_ring_convex_parts(big, convex_clip_bbox(0, 0, 1, 1))
    assert len(p) == 1 and np.isclose(abs(ring_area(p[0])), 1.0)
    # disjoint → empty
    assert clip_ring_convex_parts(sq, convex_clip_bbox(5, 5, 6, 6)) == []


def test_clip_parts_area_matches_sh_on_random_concave():
    """Σ part areas == Sutherland–Hodgman area for 200 random simple
    star-shaped concave polygons × random hexagon windows."""
    from hexscape_ray.geom.clip import (
        clip_ring_convex_parts,
        polygon_intersection_area_convex,
    )
    from hexscape_ray.geom.poly import ring_area

    rng = np.random.default_rng(5)
    checked = 0
    while checked < 200:
        n = int(rng.integers(5, 16))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        if np.min(np.diff(ang)) < 1e-3:
            continue
        rad = rng.uniform(0.3, 3.0, n)
        subj = np.c_[rad * np.cos(ang), rad * np.sin(ang)]
        cx, cy = rng.uniform(-2, 2, 2)
        s = float(rng.uniform(0.3, 2.0))
        a6 = np.arange(6) * np.pi / 3 + rng.uniform(0, np.pi / 3)
        win = np.c_[cx + s * np.cos(a6), cy + s * np.sin(a6)]
        want = polygon_intersection_area_convex([subj], win)
        got = sum(abs(ring_area(p)) for p in clip_ring_convex_parts(subj, win))
        assert np.isclose(got, want, rtol=1e-8, atol=1e-10), (checked, got, want)
        checked += 1


def test_clip_polygon_parts_hole_attachment():
    from hexscape_ray.geom.clip import clip_polygon_convex_parts, convex_clip_bbox
    from hexscape_ray.geom.poly import polygon_area

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 2], [6, 2], [6, 8], [4, 8]], float)
    comps = clip_polygon_convex_parts([shell, hole], convex_clip_bbox(-1, -1, 11, 11))
    assert len(comps) == 1
    assert np.isclose(polygon_area(comps[0]), 100.0 - 12.0)


# ---------------------------------------------------------------------------
# CRS: from-scratch EPSG:4326 ↔ EPSG:3035 (ellipsoidal LAEA, M9)
# ---------------------------------------------------------------------------


def test_laea_epsg_guidance_point():
    """IOGP Guidance Note 7-2 worked example for LAEA Europe:
    50°N 5°E → E 3962799.45, N 2999718.85 (published test vector)."""
    from hexscape_ray.geom.crs import lonlat_to_epsg3035

    x, y = lonlat_to_epsg3035(np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.01
    assert abs(y[0] - 2999718.85) < 0.01


def test_laea_roundtrip_under_one_metre():
    from hexscape_ray.geom.crs import epsg3035_to_lonlat, lonlat_to_epsg3035

    rng = np.random.default_rng(1)
    lon = rng.uniform(-10, 35, 5000)
    lat = rng.uniform(35, 70, 5000)
    x, y = lonlat_to_epsg3035(lon, lat)
    lo2, la2 = epsg3035_to_lonlat(x, y)
    x2, y2 = lonlat_to_epsg3035(lo2, la2)
    assert np.max(np.hypot(x - x2, y - y2)) < 1.0  # parity bar; measured ~1e-3


def test_laea_equal_area_property():
    """LAEA preserves areas: a 0.1°×0.1° cell's projected area matches
    the ellipsoidal authalic area within 1e-6 relative."""
    from hexscape_ray.geom.crs import GRS80_A, GRS80_E2, lonlat_to_epsg3035
    from hexscape_ray.geom.poly import ring_area

    for lon0, lat0 in [(10.0, 52.0), (-5.0, 40.0), (25.0, 65.0)]:
        d = 0.1
        lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
        lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
        # densify edges so the projected quad approximates the true cell
        ring = []
        for i in range(4):
            a = np.array([lons[i], lats[i]])
            b = np.array([lons[(i + 1) % 4], lats[(i + 1) % 4]])
            for t in np.linspace(0, 1, 50, endpoint=False):
                ring.append(a + t * (b - a))
        ring = np.asarray(ring)
        X, Y = lonlat_to_epsg3035(ring[:, 0], ring[:, 1])
        got = abs(ring_area(np.c_[X, Y]))
        # ellipsoidal area of the lon/lat cell via the authalic q
        from hexscape_ray.geom.crs import _q_authalic, GRS80_E

        q1 = _q_authalic(np.sin(np.radians(lat0)), GRS80_E, GRS80_E2)
        q2 = _q_authalic(np.sin(np.radians(lat0 + d)), GRS80_E, GRS80_E2)
        want = GRS80_A**2 / 2.0 * (q2 - q1) * np.radians(d)
        assert abs(got - want) / want < 1e-6, (lon0, lat0, got, want)


# ---------------------------------------------------------------------------
# topology-preserving simplification (M11, geom/topo.py)
# ---------------------------------------------------------------------------


def _wiggly_grid(nx=3, ny=3, pts_per_edge=9, seed=7):
    """nx×ny adjacent cells whose shared boundaries are wiggly but
    IDENTICAL between neighbours (built from shared edge paths)."""
    rng = np.random.default_rng(seed)
    # horizontal/vertical edge paths between lattice corners
    def path(a, b):
        t = np.linspace(0, 1, pts_per_edge)[1:-1, None]
        mid = a + t * (b - a)
        normal = np.array([-(b - a)[1], (b - a)[0]], float)
        normal /= np.linalg.norm(normal)
        mid = mid + (rng.uniform(-0.15, 0.15, len(mid)))[:, None] * normal
        return np.vstack([a, mid, b])

    hpaths = {}
    vpaths = {}
    for j in range(ny + 1):
        for i in range(nx):
            a, b = np.array([i, j], float), np.array([i + 1, j], float)
            hpaths[(i, j)] = path(a, b) if 0 < j < ny else np.vstack([a, b])
    for j in range(ny):
        for i in range(nx + 1):
            a, b = np.array([i, j], float), np.array([i, j + 1], float)
            vpaths[(i, j)] = path(a, b) if 0 < i < nx else np.vstack([a, b])
    cells = []
    for j in range(ny):
        for i in range(nx):
            bottom = hpaths[(i, j)]
            right = vpaths[(i + 1, j)]
            top = hpaths[(i, j + 1)][::-1]
            left = vpaths[(i, j)][::-1]
            ring = np.vstack([bottom[:-1], right[:-1], top[:-1], left[:-1]])
            cells.append([ring])
    return cells


def test_simplify_shared_no_gaps():
    """Adjacent cells keep IDENTICAL simplified shared boundaries: the
    layer's total area equals the exact lattice area afterwards (no
    slivers), while most wiggle vertices are dropped."""
    from hexscape_ray.geom.poly import polygon_area
    from hexscape_ray.geom.topo import simplify_shared

    cells = _wiggly_grid()
    simp = simplify_shared(cells, keep=0.1)
    n_before = sum(len(c[0]) for c in cells)
    n_after = sum(len(c[0]) for c in simp)
    assert n_after < 0.55 * n_before
    total = sum(polygon_area(c) for c in simp)
    assert abs(total - 9.0) < 1e-9  # 3×3 unit cells exactly — gap-free


def test_simplify_shared_keep_shapes():
    """A polygon is never collapsed below 3 distinct vertices even at
    keep→0 (ms_simplify keep_shapes=TRUE semantics)."""
    from hexscape_ray.geom.poly import ring_area
    from hexscape_ray.geom.topo import simplify_shared

    tri = np.array([[0, 0], [1, 0], [0.5, 0.05], [0.5, 1]], float)
    simp = simplify_shared([[tri]], keep=0.0)
    ring = simp[0][0]
    assert ring.shape[0] >= 3
    assert abs(ring_area(ring)) > 0


def test_simplify_shared_hole_structure():
    from hexscape_ray.geom.poly import polygon_area
    from hexscape_ray.geom.topo import simplify_shared

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6.01, 5], [6, 6], [4, 6]], float)
    simp = simplify_shared([[shell, hole]], keep=0.9)
    assert len(simp[0]) == 2  # hole ring survives
    assert abs(polygon_area(simp[0]) - polygon_area([shell, hole])) < 0.2


def test_clip_components_hole_touching_boundary_splits():
    """A hole crossing the whole window (touching its boundary) splits
    the component in two — the trapezoid fallback closes the W-A ring
    clipper's documented edge case."""
    from hexscape_ray.geom.clip import clip_polygon_components, convex_clip_bbox

    shell = np.array([[-10, -10], [110, -10], [110, 110], [-10, 110]], float)
    hole = np.array([[4, -5], [6, -5], [6, 105], [4, 105]], float)  # channel
    win = convex_clip_bbox(0, 0, 10, 10)
    comps = clip_polygon_components([shell, hole], win)
    assert len(comps) == 2
    areas = sorted(round(c[0], 9) for c in comps)
    assert areas == [40.0, 40.0]
    # centroids on either side of the channel
    xs = sorted(c[1] for c in comps)
    assert xs[0] < 4 and xs[1] > 6


def test_clip_components_fast_path_matches_parts():
    """Without boundary-touching holes the component API returns the
    same areas/centroids as the ring-based parts clipper."""
    from hexscape_ray.geom.clip import (
        clip_polygon_components,
        clip_polygon_convex_parts,
        convex_clip_bbox,
    )
    from hexscape_ray.geom.poly import polygon_area, polygon_centroid

    u = np.array(
        [[0, 0], [1, 0], [1, 3], [2, 3], [2, 0], [3, 0], [3, 4], [0, 4]], float
    )
    win = convex_clip_bbox(-1, -1, 4, 2)
    comps = clip_polygon_components([u], win)
    parts = clip_polygon_convex_parts([u], win)
    assert len(comps) == len(parts) == 2
    got = sorted((round(a, 12), round(cx, 9)) for a, cx, cy, _ in comps)
    want = sorted(
        (round(polygon_area(p), 12), round(polygon_centroid(p)[0], 9))
        for p in parts
    )
    assert got == want


# ---------------------------------------------------------------------------
# general boolean ops (coverage scanline, geom/trapezoid.py)
# ---------------------------------------------------------------------------


def test_boolean_ops_basic():
    from hexscape_ray.geom.trapezoid import boolean_area, boolean_components

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)

    A, B = [[sq(0, 0, 10, 10)]], [[sq(5, 5, 15, 15)]]
    assert np.isclose(boolean_area(A, B, "union"), 175.0)
    assert np.isclose(boolean_area(A, B, "intersection"), 25.0)
    assert np.isclose(boolean_area(A, B, "difference"), 75.0)
    assert np.isclose(boolean_area(A, B, "xor"), 150.0)
    # difference that disconnects: channel through the square
    comps = boolean_components(A, [[sq(4, -1, 6, 11)]], "difference")
    assert len(comps) == 2
    assert sorted(round(c[0], 9) for c in comps) == [40.0, 40.0]
    # holed A: hole respected in the difference
    holed = [[sq(0, 0, 10, 10), sq(4, 4, 6, 6)]]
    assert np.isclose(boolean_area(holed, [[sq(0, 0, 5, 10)]], "difference"), 48.0)


def test_boolean_intersection_matches_convex_clip():
    """General scanline intersection == the SH convex clip on random
    concave subjects × hex windows (cross-validation of both kernels)."""
    from hexscape_ray.geom.clip import polygon_intersection_area_convex
    from hexscape_ray.geom.trapezoid import boolean_area

    def _is_simple(poly):
        n = len(poly)
        for i in range(n):
            p1, p2 = poly[i], poly[(i + 1) % n]
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue
                p3, p4 = poly[j], poly[(j + 1) % n]
                d1 = np.cross(p4 - p3, p1 - p3)
                d2 = np.cross(p4 - p3, p2 - p3)
                d3 = np.cross(p2 - p1, p3 - p1)
                d4 = np.cross(p2 - p1, p4 - p1)
                if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                    return False
        return True

    rng = np.random.default_rng(17)
    checked = 0
    while checked < 100:
        n = int(rng.integers(5, 14))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        if np.min(np.diff(ang)) < 1e-3:
            continue
        rad = rng.uniform(0.3, 3.0, n)
        subj = np.c_[rad * np.cos(ang), rad * np.sin(ang)]
        if not _is_simple(subj):  # contract: simple rings only
            continue
        cx, cy = rng.uniform(-2, 2, 2)
        s = float(rng.uniform(0.3, 2.0))
        a6 = np.arange(6) * np.pi / 3 + rng.uniform(0, np.pi / 3)
        win = np.c_[cx + s * np.cos(a6), cy + s * np.sin(a6)]
        want = polygon_intersection_area_convex([subj], win)
        got = boolean_area([[subj]], [[win]], "intersection")
        assert np.isclose(got, want, rtol=1e-8, atol=1e-10), (checked, got, want)
        checked += 1


def test_stitch_trapezoids_outline():
    """Trapezoid partitions stitch back to simple outlines: exact
    area, holes preserved, collinear slab joints removed."""
    from hexscape_ray.geom.poly import polygon_area, ring_area
    from hexscape_ray.geom.trapezoid import (
        component_polygon,
        region_components,
        stitch_trapezoids,
    )

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)

    # holed square: shell + hole survive the round-trip
    comps = region_components([sq(0, 0, 10, 10), sq(4, 4, 6, 6)])
    rings = stitch_trapezoids(comps[0][3])
    assert len(rings) == 2
    assert np.isclose(polygon_area(rings), 96.0)
    # concave U: stitched back to its 8 vertices
    u = np.array(
        [[0, 0], [1, 0], [1, 3], [2, 3], [2, 0], [3, 0], [3, 4], [0, 4]], float
    )
    comps = region_components([u])
    rings = stitch_trapezoids(comps[0][3])
    assert len(rings) == 1 and len(rings[0]) == 8
    assert np.isclose(abs(ring_area(rings[0])), 9.0)
    # component_polygon prefers the stitched outline
    polys, ok = component_polygon(comps[0][0], comps[0][3])
    assert ok and len(polys) == 1
