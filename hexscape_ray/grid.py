"""Hex-grid math: the tile index at the heart of the engine.

Pure vectorised numpy — every function maps arrays to arrays so it can
run inside ``map_batches`` with zero Python-per-row cost.

Parity target: the axial (r, q) lattice of the reference
(/root/reference/R/generate_patches.R:85-122):

    y = ref_y - r * (hex_side + hex_height) / 2
    x = ref_x + r * hex_width / 2 + q * hex_width

which is the standard pointy-top axial grid (size s = hex_side) with r
increasing southward.  The reference only ever *tessellates* (it
enumerates (r, q) over a bbox); our engine additionally needs the
inverse map point -> cell, implemented as classic fractional-axial
cube rounding (redblobgames hex-grid algorithm, public domain).

No h3/s2 library exists in this environment, so the packed ``uint64``
cell id here plays the role H3 cell ids play in the design: a single
integer column that all groupbys / shuffles key on.  A quadtree
"square tile" id (`square_tile_id`) is provided as the S2-style
fallback index; it is also the SQL-expressible key used by the DuckDB
oracle checks.

Rounding convention: ``floor(x + 0.5)`` (half-up) everywhere, NOT
banker's rounding — chosen because it is bit-identical between numpy
and ANSI SQL (DuckDB ``floor(x + 0.5)``), which the correctness oracle
relies on.
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.config import GridSpec

# ---------------------------------------------------------------------------
# cell-id packing:  [ 8 bits res | 28 bits (r + OFFSET) | 28 bits (q + OFFSET) ]
# ---------------------------------------------------------------------------

_OFFSET = 1 << 27  # supports |r|,|q| < 2^27 — at 2 km hexes that is ~10^9 km


def pack_cell(res, r, q):
    """Pack (res, r, q) into int64 cell ids (vectorised)."""
    res = np.asarray(res, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64)
    return (res << 56) | ((r + _OFFSET) << 28) | (q + _OFFSET)


def unpack_cell(cell):
    """Inverse of :func:`pack_cell` → (res, r, q) int64 arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 56
    r = ((cell >> 28) & ((1 << 28) - 1)) - _OFFSET
    q = (cell & ((1 << 28) - 1)) - _OFFSET
    return res, r, q


def _round_half_up(x):
    return np.floor(x + 0.5)


def point_to_axial(x, y, spec: GridSpec, res: int = 0):
    """Map planar points to axial (r, q) cells at ``res`` (cube rounding).

    Fractional coords invert the reference's centroid formula
    (/root/reference/R/generate_patches.R:113-115); cube-rounding picks
    the nearest hex centroid.
    """
    w = spec.width_at(res)
    s = (2.0 * w / np.sqrt(3.0)) / 2.0  # hex side at this res
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    rf = (spec.ref_y - y) / (1.5 * s)
    qf = (x - spec.ref_x) / w - rf / 2.0

    # cube coords: cx = q, cz = r, cy = -q - r
    cx, cz = qf, rf
    cy = -qf - rf
    rx = _round_half_up(cx)
    ry = _round_half_up(cy)
    rz = _round_half_up(cz)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)

    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)

    return rz.astype(np.int64), rx.astype(np.int64)  # (r, q)


def point_to_cell(x, y, spec: GridSpec, res: int = 0):
    r, q = point_to_axial(x, y, spec, res)
    return pack_cell(res, r, q)


def axial_to_centroid(r, q, spec: GridSpec, res: int = 0):
    """Centroid (x, y) of axial cells — the reference formula verbatim."""
    w = spec.width_at(res)
    h = 2.0 * w / np.sqrt(3.0)
    s = h / 2.0
    r = np.asarray(r, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    y = spec.ref_y - r * (s + h) / 2.0
    x = spec.ref_x + r * w / 2.0 + q * w
    return x, y


def cell_to_centroid(cell, spec: GridSpec):
    res, r, q = unpack_cell(cell)
    if len(np.atleast_1d(res)) and not np.all(res == np.atleast_1d(res)[0]):
        raise ValueError("mixed resolutions in one centroid call")
    res0 = int(np.atleast_1d(res)[0]) if np.atleast_1d(res).size else 0
    return axial_to_centroid(r, q, spec, res0)


# 7-vertex pointy-top hexagon offsets relative to the centroid
# (/root/reference/R/generate_patches.R:53-64, `genpoly`).
def hex_vertex_offsets(spec: GridSpec, res: int = 0) -> np.ndarray:
    w = spec.width_at(res)
    h = 2.0 * w / np.sqrt(3.0)
    s = h / 2.0
    return np.array(
        [
            [0.0, h / 2.0],
            [w / 2.0, s / 2.0],
            [w / 2.0, -s / 2.0],
            [0.0, -h / 2.0],
            [-w / 2.0, -s / 2.0],
            [-w / 2.0, s / 2.0],
            [0.0, h / 2.0],
        ]
    )


def cell_polygon(r, q, spec: GridSpec, res: int = 0) -> np.ndarray:
    """(n, 7, 2) array of hexagon boundary vertices (closed rings)."""
    cx, cy = axial_to_centroid(r, q, spec, res)
    offs = hex_vertex_offsets(spec, res)  # (7, 2)
    cx = np.atleast_1d(cx)
    cy = np.atleast_1d(cy)
    out = np.empty((cx.size, 7, 2), dtype=np.float64)
    out[:, :, 0] = cx[:, None] + offs[None, :, 0]
    out[:, :, 1] = cy[:, None] + offs[None, :, 1]
    return out


# The 6 valid axial neighbour offsets: {-1,0,1}^2 minus (0,0) minus
# offsets with r_adj + q_adj in {-2, +2}
# (/root/reference/R/generate_neighbours.R:57-63), in the reference's
# enumeration order, with the direction each implies
# (/root/reference/R/generate_neighbours.R:149-157).
NEIGHBOR_OFFSETS = np.array(
    [(-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0)], dtype=np.int64
)
NEIGHBOR_DIRECTIONS = np.array(["NW", "NE", "W", "E", "SW", "SE"])
DIRECTION_LEVELS = ["NE", "E", "SE", "SW", "W", "NW"]  # reference factor order


def neighbor_cells(cell):
    """(n, 6) int64 array of the 6 adjacent cell ids (same res)."""
    res, r, q = unpack_cell(cell)
    r = np.atleast_1d(r)
    q = np.atleast_1d(q)
    res = np.atleast_1d(res)
    nr = r[:, None] + NEIGHBOR_OFFSETS[None, :, 0]
    nq = q[:, None] + NEIGHBOR_OFFSETS[None, :, 1]
    return pack_cell(np.repeat(res[:, None], 6, axis=1), nr, nq)


def grid_disk_axial(r, q, k: int):
    """All axial cells within hex-distance k of (r, q) — h3 grid_disk
    analogue, used by the ring-based kNN (SURVEY §2.5 J7)."""
    offs = []
    for dr in range(-k, k + 1):
        for dq in range(max(-k, -dr - k), min(k, -dr + k) + 1):
            offs.append((dr, dq))
    offs = np.array(offs, dtype=np.int64)
    r = np.atleast_1d(np.asarray(r, dtype=np.int64))
    q = np.atleast_1d(np.asarray(q, dtype=np.int64))
    return r[:, None] + offs[None, :, 0], q[:, None] + offs[None, :, 1]


def axial_range_for_bbox(xmin, ymin, xmax, ymax, spec: GridSpec, res: int = 0):
    """Candidate (r, q) ranges covering a bbox — reference semantics
    (/root/reference/R/generate_patches.R:89-101) including the
    ``tanpi(1/6)`` shear of the x range."""
    w = spec.width_at(res)
    h = 2.0 * w / np.sqrt(3.0)
    s = h / 2.0
    y_lo = (spec.ref_y - ymax) / ((s + h) / 2.0)
    y_hi = (spec.ref_y - ymin) / ((s + h) / 2.0)
    r_lo = int(np.floor(y_lo))
    r_hi = int(np.ceil(y_hi))
    shear = np.tan(np.pi / 6.0)
    x_lo = (xmin + (ymin - spec.ref_y) * shear - spec.ref_x) / w
    x_hi = (xmax + (ymax - spec.ref_y) * shear - spec.ref_x) / w
    q_lo = int(np.floor(x_lo))
    q_hi = int(np.ceil(x_hi))
    return (r_lo, r_hi), (q_lo, q_hi)


# ---------------------------------------------------------------------------
# Square (quadtree) tiles — the S2-style fallback index.
# ---------------------------------------------------------------------------


def square_tile(x, y, tile_size: float, xmin: float = 0.0, ymin: float = 0.0):
    """(tx, ty) integer tile coords: floor((x - xmin) / tile_size)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    tx = np.floor((x - xmin) / tile_size).astype(np.int64)
    ty = np.floor((y - ymin) / tile_size).astype(np.int64)
    return tx, ty


def square_tile_id(x, y, tile_size: float, xmin: float = 0.0, ymin: float = 0.0):
    """Single int64 key: tx * 2^28 + ty (both offset).  SQL equivalent:
    ``(floor((x - xmin)/ts)::BIGINT + 2^27) * 2^28
      + (floor((y - ymin)/ts)::BIGINT + 2^27)``."""
    tx, ty = square_tile(x, y, tile_size, xmin, ymin)
    return (tx + _OFFSET) * (1 << 28) + (ty + _OFFSET)
