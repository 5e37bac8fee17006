"""Polygon clipping against CONVEX clip regions (Sutherland–Hodgman).

The engine's overlay needs (st_intersection / st_difference in the
reference, /root/reference/R/generate_patches.R:134-166,252-266) are
always "arbitrary polygon x hexagon" or "cell x half-plane", and a
hexagon is convex — so Sutherland–Hodgman (subject polygon clipped by
a convex window) gives exact results for every overlay the engine
performs, without GEOS:

- area(hex ∩ landcover)    = Σ_parts area(SH-clip(part shell, hex))
                             − Σ holes area(SH-clip(hole, hex))
  (valid because holes ⊆ shell; even-odd model)
- hex − impassable (areas) = area(hex) − area(hex ∩ impassable)
- voronoi cells            = bbox clipped by bisector half-planes

Caveat (documented, as SURVEY §7 requires): SH can emit degenerate
zero-area bridges for non-convex subjects whose intersection with the
window is disconnected; areas remain correct (degenerate sections have
zero area), which is all the aggregates consume.
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.geom.poly import ring_area, _close


def clip_halfplane(ring: np.ndarray, ax: float, ay: float, nx: float, ny: float) -> np.ndarray:
    """Clip a ring to the half-plane {p : (p - a)·n <= 0} (vectorised).

    Returns an open ring (possibly empty).
    """
    r = _close(ring)
    if r.shape[0] < 4:
        return np.empty((0, 2))
    d = (r[:, 0] - ax) * nx + (r[:, 1] - ay) * ny
    inside = d <= 0.0
    pts_out = []
    n = r.shape[0] - 1
    for i in range(n):
        cur_in, nxt_in = inside[i], inside[i + 1]
        if cur_in:
            pts_out.append(r[i])
        if cur_in != nxt_in:
            t = d[i] / (d[i] - d[i + 1])
            pts_out.append(r[i] + t * (r[i + 1] - r[i]))
    if len(pts_out) < 3:
        return np.empty((0, 2))
    return np.asarray(pts_out)


def _edges_ccw(clip_ring: np.ndarray):
    """Yield (a, inward-normal-flipped) half-planes for a convex ring."""
    c = _close(clip_ring)
    if ring_area(c) < 0:  # ensure CCW so inside is left of each edge
        c = c[::-1]
    edges = []
    for i in range(c.shape[0] - 1):
        a, b = c[i], c[i + 1]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # inside (left) means cross(e, p-a) >= 0  ⇔  (p-a)·n <= 0 with
        # n = (ey, -ex) the outward normal
        edges.append((a[0], a[1], ey, -ex))
    return edges


def clip_ring_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``ring`` by convex ``clip_ring``."""
    out = np.asarray(ring, dtype=np.float64)
    for ax, ay, nx, ny in _edges_ccw(clip_ring):
        out = clip_halfplane(out, ax, ay, nx, ny)
        if out.shape[0] == 0:
            return out
    return out


def clip_polygon_convex(rings, clip_ring: np.ndarray):
    """Clip a holed polygon by a convex window → list of rings
    (clipped shell first, clipped holes after; empty list if disjoint)."""
    shell = clip_ring_convex(rings[0], clip_ring)
    if shell.shape[0] == 0:
        return []
    out = [shell]
    for hole in rings[1:]:
        h = clip_ring_convex(hole, clip_ring)
        if h.shape[0] >= 3:
            out.append(h)
    return out


def polygon_intersection_area_convex(rings, clip_ring: np.ndarray) -> float:
    """area(polygon ∩ convex window) — the hot kernel of the flagship
    per-hex land-use aggregate (/root/reference/R/generate_patches.R:252-266)."""
    clipped = clip_polygon_convex(rings, clip_ring)
    if not clipped:
        return 0.0
    a = abs(ring_area(clipped[0]))
    for hole in clipped[1:]:
        a -= abs(ring_area(hole))
    return max(a, 0.0)


def convex_clip_bbox(xmin, ymin, xmax, ymax) -> np.ndarray:
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )
