"""Trapezoid decomposition of an even-odd polygonal region — the
engine's general connected-component splitter.

Closes the one case the convex-window Weiler–Atherton clipper
(geom/clip.py) documents as an edge case: a HOLE part touching the
window boundary can cut a clipped component in two (think an
impassable river reaching the hex edge).  Any even-odd ring set is
decomposed exactly into horizontal-slab trapezoids (scanline over the
vertex y-coordinates; even-odd pairing of edge crossings per slab),
adjacency between slab neighbours is overlap of their shared-boundary
x-intervals, and union-find yields the true connected components with
EXACT areas and centroids.  Component geometry is returned as the
trapezoid list (a valid MultiPolygon partition of the component;
downstream WKB uses multipolygon_to_wkb).

Public-domain technique (standard computational-geometry scanline
decomposition; cf. Chazelle's polygon-trapezoidation literature).
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.geom.poly import _close


def _region_edges(rings) -> np.ndarray:
    """(m, 4) array of non-horizontal edges x0,y0,x1,y1 from all rings."""
    out = []
    for ring in rings:
        r = _close(np.asarray(ring, dtype=np.float64))
        a, b = r[:-1], r[1:]
        keep = a[:, 1] != b[:, 1]
        if keep.any():
            out.append(np.hstack([a[keep], b[keep]]))
    if not out:
        return np.empty((0, 4))
    return np.vstack(out)


def region_components(rings, eps: float = 1e-12):
    """Even-odd region (list of rings) → list of connected components
    ``(area, cx, cy, trapezoids)`` with trapezoids as (4, 2) CCW rings.
    """
    E = _region_edges(rings)
    if E.shape[0] == 0:
        return []
    ylo = np.minimum(E[:, 1], E[:, 3])
    yhi = np.maximum(E[:, 1], E[:, 3])
    ys = np.unique(np.concatenate([E[:, 1], E[:, 3]]))

    traps = []  # (slab_idx, xL0, xR0, xL1, xR1, y0, y1)
    for si in range(ys.size - 1):
        y0, y1 = ys[si], ys[si + 1]
        if y1 - y0 <= eps:
            continue
        midy = 0.5 * (y0 + y1)
        span = (ylo <= y0 + eps) & (yhi >= y1 - eps)
        if not span.any():
            continue
        Es = E[span]
        t_mid = (midy - Es[:, 1]) / (Es[:, 3] - Es[:, 1])
        x_mid = Es[:, 0] + t_mid * (Es[:, 2] - Es[:, 0])
        order = np.argsort(x_mid, kind="stable")
        Es = Es[order]
        t0 = (y0 - Es[:, 1]) / (Es[:, 3] - Es[:, 1])
        x_at0 = Es[:, 0] + t0 * (Es[:, 2] - Es[:, 0])
        t1 = (y1 - Es[:, 1]) / (Es[:, 3] - Es[:, 1])
        x_at1 = Es[:, 0] + t1 * (Es[:, 2] - Es[:, 0])
        # even-odd: consecutive pairs bound interior intervals
        for p in range(0, Es.shape[0] - 1, 2):
            traps.append((si, x_at0[p], x_at0[p + 1], x_at1[p], x_at1[p + 1], y0, y1))

    if not traps:
        return []

    # union-find over trapezoids: same shared boundary y, overlapping x
    n = len(traps)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj

    by_slab: dict[int, list[int]] = {}
    for i, t in enumerate(traps):
        by_slab.setdefault(t[0], []).append(i)
    for si, idxs in by_slab.items():
        nxt = by_slab.get(si + 1)
        if not nxt:
            continue
        for i in idxs:
            _, _, _, aL1, aR1, _, ay1 = traps[i]
            for j in nxt:
                _, bL0, bR0, _, _, by0, _ = traps[j]
                if min(aR1, bR0) - max(aL1, bL0) > eps:
                    union(i, j)
    # slabs can be separated by an empty (skipped) slab only when the
    # region is genuinely disconnected there, so slab+1 adjacency is
    # complete for contiguous regions

    comps: dict[int, list[int]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)

    out = []
    for idxs in comps.values():
        area = 0.0
        mx = my = 0.0
        quads = []
        for i in idxs:
            _, xL0, xR0, xL1, xR1, y0, y1 = traps[i]
            w0 = xR0 - xL0
            w1 = xR1 - xL1
            h = y1 - y0
            a = 0.5 * (w0 + w1) * h
            if a <= 0:
                continue
            ring = np.array(
                [[xL0, y0], [xR0, y0], [xR1, y1], [xL1, y1]], dtype=np.float64
            )
            # exact centroid of the trapezoid via the shoelace formula
            x = ring[:, 0]
            y = ring[:, 1]
            xs = np.append(x, x[0])
            ys_ = np.append(y, y[0])
            cross = xs[:-1] * ys_[1:] - xs[1:] * ys_[:-1]
            a_sl = 0.5 * np.sum(cross)
            if abs(a_sl) > 1e-300:
                cx = np.sum((xs[:-1] + xs[1:]) * cross) / (6.0 * a_sl)
                cy = np.sum((ys_[:-1] + ys_[1:]) * cross) / (6.0 * a_sl)
            else:
                cx, cy = ring[:, 0].mean(), ring[:, 1].mean()
            area += a
            mx += cx * a
            my += cy * a
            quads.append(ring)
        if area > 0 and quads:
            out.append((area, mx / area, my / area, quads))
    return out
