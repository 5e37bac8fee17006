"""Segment↔polygon interval math — used for exact border lengths.

The reference approximates shared-border length between adjacent
clipped hexes by buffering both and dividing the intersection area by
2·buffer (/root/reference/R/generate_neighbours.R:100-128).  With the
landscape available as explicit rings we can do better: the candidate
border is a known hex edge segment, and its length inside the
landscape polygon is computed exactly by splitting the segment at all
polygon-edge crossings and midpoint-testing each piece.
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.geom.poly import points_in_polygon, _close


def _seg_crossings(p0: np.ndarray, p1: np.ndarray, ring: np.ndarray) -> list[float]:
    """Parameters t in (0,1) where segment p0→p1 crosses ring edges."""
    r = _close(ring)
    a = r[:-1]
    b = r[1:]
    d = p1 - p0  # segment direction
    e = b - a  # edge directions
    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
    w = a - p0
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
        u = (w[:, 0] * d[1] - w[:, 1] * d[0]) / denom
    ok = (np.abs(denom) > 1e-300) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    return t[ok].tolist()


def segment_inside_length(p0, p1, polygons) -> float:
    """Length of segment p0→p1 lying inside the union of ``polygons``
    (list of ring-lists, even-odd)."""
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    ts = [0.0, 1.0]
    for rings in polygons:
        for ring in rings:
            ts.extend(_seg_crossings(p0, p1, ring))
    ts = np.unique(np.asarray(ts))
    mids = (ts[:-1] + ts[1:]) / 2.0
    mx = p0[0] + mids * (p1[0] - p0[0])
    my = p0[1] + mids * (p1[1] - p0[1])
    inside = np.zeros(mids.shape[0], dtype=bool)
    for rings in polygons:
        inside |= points_in_polygon(mx, my, rings)
    seg_len = float(np.hypot(*(p1 - p0)))
    return float(np.sum((ts[1:] - ts[:-1])[inside])) * seg_len
