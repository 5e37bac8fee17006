"""Areas, centroids, bboxes, point-in-polygon — vectorised numpy.

Replaces sf's st_area / st_centroid / st_intersects point predicates
(/root/reference/R/generate_patches.R:140,374-379,
 /root/reference/R/download_maps.R:88-119).
"""

from __future__ import annotations

import numpy as np


def _close(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] >= 1 and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    r = _close(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings) -> float:
    """Unsigned area of shell minus holes (even-odd)."""
    if not rings:
        return 0.0
    a = abs(ring_area(rings[0]))
    for hole in rings[1:]:
        a -= abs(ring_area(hole))
    return max(a, 0.0)


def polygon_centroid(rings) -> tuple[float, float]:
    """Area-weighted centroid of shell-minus-holes."""
    cx_num = cy_num = denom = 0.0
    for i, ring in enumerate(rings):
        r = _close(ring)
        x, y = r[:, 0], r[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a = 0.5 * np.sum(cross)
        if abs(a) < 1e-300:
            continue
        cx = np.sum((x[:-1] + x[1:]) * cross) / (6.0 * a)
        cy = np.sum((y[:-1] + y[1:]) * cross) / (6.0 * a)
        w = abs(a) * (1.0 if i == 0 else -1.0)
        cx_num += cx * w
        cy_num += cy * w
        denom += w
    if denom == 0.0:
        # degenerate: fall back to vertex mean of the shell
        r = np.asarray(rings[0], dtype=np.float64)
        return float(r[:, 0].mean()), float(r[:, 1].mean())
    return cx_num / denom, cy_num / denom


def rings_bbox(rings) -> tuple[float, float, float, float]:
    shell = np.asarray(rings[0], dtype=np.float64)
    return (
        float(shell[:, 0].min()),
        float(shell[:, 1].min()),
        float(shell[:, 0].max()),
        float(shell[:, 1].max()),
    )


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorised crossing-number test: bool mask over (px, py).

    Half-open edge convention: a point exactly on a horizontal edge or
    vertex resolves deterministically (no double counting).
    """
    r = _close(ring)
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    cond = (y0[None, :] <= py) != (y1[None, :] <= py)
    # x coordinate of edge at height py (guard /0 with where)
    dy = y1 - y0
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(cond, (py - y0[None, :]) / dy[None, :], 0.0)
    xint = x0[None, :] + t * (x1 - x0)[None, :]
    crossings = np.sum(cond & (px < xint), axis=1)
    return (crossings % 2).astype(bool)


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Even-odd point-in-polygon over shell + holes (vectorised)."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    crossings = np.zeros(px.shape[0], dtype=np.int64)
    for ring in rings:
        crossings += points_in_ring(px, py, ring).astype(np.int64)
    return (crossings % 2).astype(bool)


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification (M11 — the stand-in for
    rmapshaper::ms_simplify, /root/reference/R/generate_patches.R:153;
    documented deviation: not topology-preserving across neighbouring
    polygons, so area drift is audited with the A4 area-loss metric
    instead of byte-matching geometry)."""
    r = np.asarray(ring, dtype=np.float64)
    closed = r.shape[0] >= 2 and np.array_equal(r[0], r[-1])
    pts = r[:-1] if closed else r
    if pts.shape[0] <= 3:
        return r

    keep = np.zeros(pts.shape[0], dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, pts.shape[0] - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        a, b = pts[i0], pts[i1]
        ab = b - a
        seg_len2 = ab @ ab
        mid = pts[i0 + 1 : i1]
        if seg_len2 == 0:
            d = np.hypot(mid[:, 0] - a[0], mid[:, 1] - a[1])
        else:
            t = np.clip(((mid - a) @ ab) / seg_len2, 0.0, 1.0)
            proj = a + t[:, None] * ab
            d = np.hypot(mid[:, 0] - proj[:, 0], mid[:, 1] - proj[:, 1])
        j = int(np.argmax(d))
        if d[j] > tolerance:
            keep[i0 + 1 + j] = True
            stack.append((i0, i0 + 1 + j))
            stack.append((i0 + 1 + j, i1))
    out = pts[keep]
    if closed:
        out = np.vstack([out, out[:1]])
    return out


def point_segment_distance(px, py, ring: np.ndarray) -> np.ndarray:
    """Min distance from each point to the ring boundary (vectorised).

    Used for the reference's hex-centroid distance prefilter
    ``dist < hexhgt/1.9`` (/root/reference/R/generate_patches.R:103-122):
    distance-to-polygon = 0 inside, else distance to boundary.
    """
    r = _close(ring)
    a = r[:-1]  # (m, 2)
    b = r[1:]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    abx = (b[:, 0] - a[:, 0])[None, :]
    aby = (b[:, 1] - a[:, 1])[None, :]
    apx = px - a[None, :, 0]
    apy = py - a[None, :, 1]
    denom = abx * abx + aby * aby
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(denom > 0, (apx * abx + apy * aby) / denom, 0.0)
    t = np.clip(t, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return np.sqrt(np.min(dx * dx + dy * dy, axis=1))


def distance_to_polygon(px, py, rings) -> np.ndarray:
    """0 for points inside; boundary distance outside."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    d = np.full(px.shape[0], np.inf)
    for ring in rings:
        d = np.minimum(d, point_segment_distance(px, py, ring))
    inside = points_in_polygon(px, py, rings)
    d[inside] = 0.0
    return d
