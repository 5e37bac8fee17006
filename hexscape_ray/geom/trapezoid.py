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


def union_components(polygons, eps: float = 1e-12):
    """Exact UNION of possibly-OVERLAPPING even-odd polygons → list of
    connected components ``(area, cx, cy, trapezoids)``.

    Same scanline as :func:`region_components`, but per slab each
    polygon contributes its own even-odd x-intervals and a coverage
    sweep keeps the x-ranges covered by ≥ 1 polygon (boundary = the
    edge where coverage transitions 0 ↔ 1) — overlap regions are
    counted once, which even-odd alone cannot do.  Closes the
    group-union disjoint-inputs assumption (A2/U2).
    """
    per_poly_edges = [
        _region_edges(rings) for rings in polygons if len(rings)
    ]
    per_poly_edges = [E for E in per_poly_edges if E.shape[0]]
    if not per_poly_edges:
        return []
    allE = np.vstack(per_poly_edges)
    ys = np.unique(
        np.concatenate([allE[:, 1], allE[:, 3], _crossing_ys(allE)])
    )

    traps = []
    for si in range(ys.size - 1):
        y0, y1 = ys[si], ys[si + 1]
        if y1 - y0 <= eps:
            continue
        midy = 0.5 * (y0 + y1)
        # coverage events: (x_mid, delta, edge row) — +1 sorts before
        # −1 at equal x so touching intervals merge instead of pinching
        events = []
        for E in per_poly_edges:
            ylo = np.minimum(E[:, 1], E[:, 3])
            yhi = np.maximum(E[:, 1], E[:, 3])
            span = (ylo <= y0 + eps) & (yhi >= y1 - eps)
            if not span.any():
                continue
            Es = E[span]
            t_mid = (midy - Es[:, 1]) / (Es[:, 3] - Es[:, 1])
            x_mid = Es[:, 0] + t_mid * (Es[:, 2] - Es[:, 0])
            order = np.argsort(x_mid, kind="stable")
            for p in range(0, order.size - 1, 2):
                el = Es[order[p]]
                er = Es[order[p + 1]]
                events.append((x_mid[order[p]], 0, el))  # 0 = open
                events.append((x_mid[order[p + 1]], 1, er))  # 1 = close
        if not events:
            continue
        events.sort(key=lambda e: (e[0], e[1]))  # opens first at ties
        cover = 0
        left_edge = None
        for x, kind, edge in events:
            if kind == 0:
                if cover == 0:
                    left_edge = edge
                cover += 1
            else:
                cover -= 1
                if cover == 0:
                    el, er = left_edge, edge
                    t0l = (y0 - el[1]) / (el[3] - el[1])
                    t1l = (y1 - el[1]) / (el[3] - el[1])
                    t0r = (y0 - er[1]) / (er[3] - er[1])
                    t1r = (y1 - er[1]) / (er[3] - er[1])
                    traps.append(
                        (
                            si,
                            el[0] + t0l * (el[2] - el[0]),
                            er[0] + t0r * (er[2] - er[0]),
                            el[0] + t1l * (el[2] - el[0]),
                            er[0] + t1r * (er[2] - er[0]),
                            y0,
                            y1,
                        )
                    )
    return _components_from_traps(traps, eps)


def _crossing_ys(E: np.ndarray) -> np.ndarray:
    """y-coordinates of proper pairwise intersections among edges
    (x0,y0,x1,y1).  Needed as extra slab breaks whenever edges from
    DIFFERENT polygons can cross (union / boolean ops): inside a slab
    the left/right boundary edges must keep one x-order, which an
    interior crossing would violate.  O(E²) pairs — the inputs are
    small-side geometry (landscape-bounded), never the corpus."""
    m = E.shape[0]
    if m < 2:
        return np.empty(0)
    p = E[:, :2]
    r = E[:, 2:] - E[:, :2]
    out = []
    for i in range(m - 1):
        q = p[i + 1 :]
        s = r[i + 1 :]
        rxs = r[i, 0] * s[:, 1] - r[i, 1] * s[:, 0]
        qp = q - p[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / rxs
            u = (qp[:, 0] * r[i, 1] - qp[:, 1] * r[i, 0]) / rxs
        ok = (rxs != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
        if ok.any():
            out.append(p[i, 1] + t[ok] * r[i, 1])
    return np.concatenate(out) if out else np.empty(0)


_BOOL_OPS = {
    "union": lambda a, b: a or b,
    "intersection": lambda a, b: a and b,
    "difference": lambda a, b: a and not b,
    "xor": lambda a, b: a != b,
}


def boolean_components(a_polys, b_polys, op: str, eps: float = 1e-12):
    """General polygon boolean op on two LAYERS of even-odd polygons →
    connected components ``(area, cx, cy, trapezoids)``.

    ``a_polys`` / ``b_polys``: lists of ring lists (each entry one
    even-odd polygon; overlaps within a layer count once).  ``op``:
    'union' | 'intersection' | 'difference' (A − B) | 'xor'.  The same
    coverage scanline as :func:`union_components`, with two coverage
    counters and the op's predicate deciding interior intervals —
    boundaries always lie on input edges, so areas are exact.
    """
    pred = _BOOL_OPS[op]
    layers = []
    for polys in (a_polys, b_polys):
        per = [_region_edges(rings) for rings in polys if len(rings)]
        layers.append([E for E in per if E.shape[0]])
    allE = [E for per in layers for E in per]
    if not allE:
        return []
    stacked = np.vstack(allE)
    ys = np.unique(
        np.concatenate([stacked[:, 1], stacked[:, 3], _crossing_ys(stacked)])
    )

    traps = []
    for si in range(ys.size - 1):
        y0, y1 = ys[si], ys[si + 1]
        if y1 - y0 <= eps:
            continue
        midy = 0.5 * (y0 + y1)
        events = []  # (x_mid, open0/close1, layer, edge)
        for li, per in enumerate(layers):
            for E in per:
                ylo = np.minimum(E[:, 1], E[:, 3])
                yhi = np.maximum(E[:, 1], E[:, 3])
                span = (ylo <= y0 + eps) & (yhi >= y1 - eps)
                if not span.any():
                    continue
                Es = E[span]
                t_mid = (midy - Es[:, 1]) / (Es[:, 3] - Es[:, 1])
                x_mid = Es[:, 0] + t_mid * (Es[:, 2] - Es[:, 0])
                order = np.argsort(x_mid, kind="stable")
                for p in range(0, order.size - 1, 2):
                    events.append((x_mid[order[p]], 0, li, Es[order[p]]))
                    events.append((x_mid[order[p + 1]], 1, li, Es[order[p + 1]]))
        if not events:
            continue
        events.sort(key=lambda e: (e[0], e[1]))
        cov = [0, 0]
        inside = False
        left_edge = None
        for x, kind, li, edge in events:
            cov[li] += 1 if kind == 0 else -1
            now = pred(cov[0] > 0, cov[1] > 0)
            if now and not inside:
                left_edge = edge
            elif inside and not now:
                el, er = left_edge, edge
                t0l = (y0 - el[1]) / (el[3] - el[1])
                t1l = (y1 - el[1]) / (el[3] - el[1])
                t0r = (y0 - er[1]) / (er[3] - er[1])
                t1r = (y1 - er[1]) / (er[3] - er[1])
                traps.append(
                    (
                        si,
                        el[0] + t0l * (el[2] - el[0]),
                        er[0] + t0r * (er[2] - er[0]),
                        el[0] + t1l * (el[2] - el[0]),
                        er[0] + t1r * (er[2] - er[0]),
                        y0,
                        y1,
                    )
                )
            inside = now
    return _components_from_traps(traps, eps)


def boolean_area(a_polys, b_polys, op: str) -> float:
    """Exact area of the boolean combination (no component assembly)."""
    return float(sum(c[0] for c in boolean_components(a_polys, b_polys, op)))


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

    return _components_from_traps(traps, eps)


def _components_from_traps(traps, eps: float):
    """Union-find over slab trapezoids → components with exact
    area/centroid and the trapezoid rings."""
    if not traps:
        return []
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


def stitch_trapezoids(quads, eps: float = 1e-9):
    """Merge a connected component's slab trapezoids into boundary
    rings: [shell (CCW), holes (CW)…] — the simple-polygon shape the
    reference's st_cast(POLYGON) emits, instead of the raw partition.

    Interior horizontal edges cancel as the symmetric difference of
    the up-facing / down-facing interval sets at each slab boundary;
    non-horizontal edges are never shared between trapezoids (same
    slab ⇒ disjoint, different slab ⇒ different y-extent), so they
    all survive.  Remaining directed edges chain head-to-tail into
    closed rings (interior always on the left).
    """
    if not quads:
        return []
    scale = max(
        max(abs(float(q[:, 0].max())), abs(float(q[:, 1].max()))) for q in quads
    )
    grid = max(scale, 1.0) * eps

    def key(p):
        return (round(float(p[0]) / grid), round(float(p[1]) / grid))

    edges = []  # directed (start, end) tuples of float pairs
    by_y: dict = {}  # slab-boundary y → list of (x0, x1, facing)
    for q in quads:
        xL0, y0 = q[0]
        xR0, _ = q[1]
        xR1, y1 = q[2]
        xL1, _ = q[3]
        if xR0 - xL0 > 0:  # bottom edge: region above → down-facing
            by_y.setdefault(round(y0 / grid), []).append((xL0, xR0, "down", y0))
        if xR1 - xL1 > 0:  # top edge: region below → up-facing
            by_y.setdefault(round(y1 / grid), []).append((xL1, xR1, "up", y1))
        edges.append(((xR0, y0), (xR1, y1)))  # right edge (up)
        edges.append(((xL1, y1), (xL0, y0)))  # left edge (down)

    for _, ivs in by_y.items():
        y = ivs[0][3]
        xs = np.unique(
            np.concatenate([[a, b] for a, b, _, _ in ivs]).astype(np.float64)
        )
        for i in range(xs.size - 1):
            xa, xb = float(xs[i]), float(xs[i + 1])
            if xb - xa <= 0:
                continue
            xm = 0.5 * (xa + xb)
            below = any(
                f == "up" and a - grid <= xm <= b + grid for a, b, f, _ in ivs
            )
            above = any(
                f == "down" and a - grid <= xm <= b + grid for a, b, f, _ in ivs
            )
            if below and not above:  # top boundary: interior below → leftward
                edges.append(((xb, y), (xa, y)))
            elif above and not below:  # bottom boundary: interior above → rightward
                edges.append(((xa, y), (xb, y)))

    # chain directed edges into rings
    out_map: dict = {}
    for s, e in edges:
        ks, ke = key(s), key(e)
        if ks == ke:
            continue
        out_map.setdefault(ks, []).append((s, e))
    rings = []
    while any(out_map.values()):
        ks = next(k for k, v in out_map.items() if v)
        s, e = out_map[ks].pop()
        ring = [s]
        guard = 0
        while key(e) != key(ring[0]) and guard < 100_000:
            ring.append(e)
            nxt = out_map.get(key(e))
            if not nxt:
                break  # open chain (numerical gap) — drop
            s, e = nxt.pop()
            guard += 1
        else:
            arr = np.asarray(ring, dtype=np.float64)
            # drop collinear midpoints introduced by slab fragmentation
            if arr.shape[0] >= 3:
                a = arr
                prev_ = np.roll(a, 1, axis=0)
                next_ = np.roll(a, -1, axis=0)
                cross = (a[:, 0] - prev_[:, 0]) * (next_[:, 1] - a[:, 1]) - (
                    a[:, 1] - prev_[:, 1]
                ) * (next_[:, 0] - a[:, 0])
                keep = np.abs(cross) > grid * grid
                if keep.sum() >= 3:
                    arr = a[keep]
            rings.append(arr)
    # shell first (largest |area|); holes after
    from hexscape_ray.geom.poly import ring_area

    rings.sort(key=lambda r: -abs(ring_area(r)))
    return rings


def component_polygon(area: float, quads, rel_tol: float = 1e-9):
    """Component geometry as ONE even-odd ring list: the stitched
    outline when it closes and reproduces the exact area, else the
    raw trapezoid partition flattened (safety net for numerical
    chaining gaps).  Returns (polygons, stitched_ok) where polygons is
    a list of ring lists for multipolygon WKB."""
    from hexscape_ray.geom.poly import polygon_area

    rings = stitch_trapezoids(quads)
    if rings and abs(polygon_area(rings) - area) <= rel_tol * max(area, 1e-300):
        return [rings], True
    return [[q] for q in quads], False
