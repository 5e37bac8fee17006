"""Hex grid math: round-trips, nearest-centroid property, packing.

Parity anchor: the axial lattice of the reference
(/root/reference/R/generate_patches.R:85-122)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hexscape_ray import grid
from hexscape_ray.config import DEFAULT_GRID, GridSpec

SPEC = DEFAULT_GRID


def test_centroid_roundtrip():
    r = np.arange(-20, 80)
    q = np.arange(-20, 80)
    R, Q = [a.ravel() for a in np.meshgrid(r, q)]
    cx, cy = grid.axial_to_centroid(R, Q, SPEC, 0)
    r2, q2 = grid.point_to_axial(cx, cy, SPEC, 0)
    assert np.array_equal(r2, R)
    assert np.array_equal(q2, Q)


@settings(max_examples=50, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=100_000.0),
    st.floats(min_value=0.0, max_value=100_000.0),
)
def test_assigned_cell_is_nearest(px, py):
    r, q = grid.point_to_axial(np.array([px]), np.array([py]), SPEC, 0)
    cx, cy = grid.axial_to_centroid(r, q, SPEC, 0)
    d0 = np.hypot(px - cx, py - cy)[0]
    for dr, dq in grid.NEIGHBOR_OFFSETS:
        nx, ny = grid.axial_to_centroid(r + dr, q + dq, SPEC, 0)
        assert d0 <= np.hypot(px - nx, py - ny)[0] + 1e-9


def test_pack_unpack():
    r = np.array([-5, 0, 1000, -(2**26)])
    q = np.array([7, -7, 0, 2**26])
    res = np.array([0, 1, 2, 7])
    cell = grid.pack_cell(res, r, q)
    res2, r2, q2 = grid.unpack_cell(cell)
    assert np.array_equal(res2, res)
    assert np.array_equal(r2, r)
    assert np.array_equal(q2, q)


def test_hex_polygon_area_matches_spec():
    poly = grid.cell_polygon(np.array([3]), np.array([4]), SPEC, 0)[0]
    from hexscape_ray.geom import ring_area

    assert abs(abs(ring_area(poly)) - SPEC.hex_area) < 1e-6


def test_neighbor_cells_shape_and_distance():
    cell = grid.pack_cell(np.array([0]), np.array([10]), np.array([20]))
    nbs = grid.neighbor_cells(cell)
    assert nbs.shape == (1, 6)
    cx, cy = grid.cell_to_centroid(cell, SPEC)
    for nb in nbs[0]:
        nx, ny = grid.cell_to_centroid(np.array([nb]), SPEC)
        d = np.hypot(nx - cx, ny - cy)[0]
        # adjacent centroids are exactly hex_width apart
        assert abs(d - SPEC.hex_width) < 1e-6


def test_grid_disk_count():
    r, q = grid.grid_disk_axial(0, 0, 2)
    assert r.shape[1] == 19  # 1 + 6 + 12


def test_axial_range_covers_bbox():
    (r_lo, r_hi), (q_lo, q_hi) = grid.axial_range_for_bbox(
        0, 0, 100_000, 100_000, SPEC, 0
    )
    rng = np.random.default_rng(3)
    px = rng.random(500) * 100_000
    py = rng.random(500) * 100_000
    r, q = grid.point_to_axial(px, py, SPEC, 0)
    assert r.min() >= r_lo - 1 and r.max() <= r_hi + 1
    assert q.min() >= q_lo - 1 and q.max() <= q_hi + 1


def test_multires_nesting_convention():
    spec = GridSpec(hex_width=2000.0, ref_x=0.0, ref_y=100_000.0, resolutions=(0, 1))
    assert spec.width_at(1) == 1000.0
    px = np.array([12_345.6])
    py = np.array([67_890.1])
    c0 = grid.point_to_cell(px, py, spec, 0)
    c1 = grid.point_to_cell(px, py, spec, 1)
    res0, _, _ = grid.unpack_cell(c0)
    res1, _, _ = grid.unpack_cell(c1)
    assert res0[0] == 0 and res1[0] == 1
