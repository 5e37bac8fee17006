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


# ---------------------------------------------------------------------------
# Multi-component clip: Weiler–Atherton specialised to a CONVEX window.
#
# Sutherland–Hodgman merges a disconnected intersection into one
# self-touching ring (zero-area bridges) — fine for areas, wrong for
# the reference's st_cast(POLYGON) part explosion
# (/root/reference/R/generate_patches.R:148-166).  For a convex window
# the full Weiler–Atherton machinery collapses to: collect the maximal
# in-window chains of the subject boundary, then stitch chain exits to
# the next chain entry walking the window boundary CCW (inserting the
# window corners passed).  Each stitched cycle is one connected
# component of subject ∩ window.
# ---------------------------------------------------------------------------


def _cyrus_beck(p, q, edges, eps):
    """Clip segment p→q to the convex window; returns
    (t0, t1, enter_edge, exit_edge) with 0 ≤ t0 ≤ t1 ≤ 1, or None if
    the segment misses the window.  enter/exit edge is None when the
    endpoint itself is inside (t pinned to 0/1)."""
    t0, t1 = 0.0, 1.0
    e0 = e1 = None
    for ei, (ax, ay, nx, ny) in enumerate(edges):
        dp = (p[0] - ax) * nx + (p[1] - ay) * ny
        dq = (q[0] - ax) * nx + (q[1] - ay) * ny
        if dp > eps and dq > eps:
            return None
        if dp > eps:  # entering this half-plane
            t = dp / (dp - dq)
            if t > t0:
                t0, e0 = t, ei
        elif dq > eps:  # exiting
            t = dp / (dp - dq)
            if t < t1:
                t1, e1 = t, ei
    if t0 > t1:
        return None
    return t0, t1, e0, e1


def _perimeter_param(pt, wverts, edges) -> float:
    """Position of a boundary point along the CCW window perimeter:
    ``edge_index + fraction`` (window vertex j ⇔ param j)."""
    m = wverts.shape[0]
    best, best_d = 0.0, np.inf
    for j in range(m):
        a = wverts[j]
        b = wverts[(j + 1) % m]
        abx, aby = b[0] - a[0], b[1] - a[1]
        L2 = abx * abx + aby * aby
        t = 0.0 if L2 == 0 else ((pt[0] - a[0]) * abx + (pt[1] - a[1]) * aby) / L2
        t = min(max(t, 0.0), 1.0)
        dx, dy = pt[0] - (a[0] + t * abx), pt[1] - (a[1] + t * aby)
        d = dx * dx + dy * dy
        if d < best_d:
            best_d, best = d, j + t
    return best % m


def clip_ring_convex_parts(ring: np.ndarray, clip_ring: np.ndarray, eps: float = 1e-9):
    """Clip a simple (possibly CONCAVE) ring by a convex window →
    list of simple CCW rings, one per connected component of the
    intersection.  The parity complement of ``clip_ring_convex``:
    identical total area, but disconnected pieces come back as
    separate rings instead of one bridge-merged ring.

    Tolerances: vertices within ``eps`` (scaled by window size) of the
    boundary count as inside; grazing tangencies may produce degenerate
    rings, which are dropped (area ≤ eps²)."""
    from hexscape_ray.geom.poly import points_in_ring

    subj = _close(np.asarray(ring, dtype=np.float64))
    if subj.shape[0] < 4:
        return []
    if ring_area(subj) < 0:
        subj = subj[::-1]
    win = _close(np.asarray(clip_ring, dtype=np.float64))
    if ring_area(win) < 0:
        win = win[::-1]
    wverts = win[:-1]
    edges = _edges_ccw(wverts)
    scale = max(
        wverts[:, 0].max() - wverts[:, 0].min(),
        wverts[:, 1].max() - wverts[:, 1].min(),
        1e-300,
    )
    tol = eps * scale

    # vertex classification: inside = within every half-plane
    d_all = np.empty((subj.shape[0], len(edges)))
    for ei, (ax, ay, nx, ny) in enumerate(edges):
        d_all[:, ei] = (subj[:, 0] - ax) * nx + (subj[:, 1] - ay) * ny
    v_in = (d_all <= tol).all(axis=1)

    # collect maximal in-window chains of the subject path
    chains = []  # dicts: {pts, entry(bool), exit(bool), pe, px}
    cur = None
    n = subj.shape[0] - 1
    for i in range(n):
        p, q = subj[i], subj[i + 1]
        p_in, q_in = v_in[i], v_in[i + 1]
        if p_in:
            if cur is None:
                cur = {"pts": [p], "entry": None}  # started inside (wraps)
            else:
                cur["pts"].append(p)
            if not q_in:
                cb = _cyrus_beck(p, q, edges, tol)
                x = p + cb[1] * (q - p) if cb else p
                cur["pts"].append(x)
                cur["exit"] = x
                chains.append(cur)
                cur = None
        else:
            cb = _cyrus_beck(p, q, edges, tol)
            if cb is None:
                continue
            t0, t1, _, _ = cb
            if q_in:
                x = p + t0 * (q - p)
                cur = {"pts": [x], "entry": x}
            elif t1 - t0 > eps:  # pass-through: both endpoints outside
                a = p + t0 * (q - p)
                b = p + t1 * (q - p)
                chains.append({"pts": [a, b], "entry": a, "exit": b})
    if cur is not None:  # chain wrapped past the ring start
        if chains and chains[0]["entry"] is None:
            cur["pts"].extend(chains[0]["pts"])
            cur["exit"] = chains[0]["exit"]
            chains[0] = cur
        else:  # never exited: whole ring inside the window
            return [subj[:-1].copy()]
    if not chains:
        # disjoint, or window entirely inside the subject
        if points_in_ring(wverts[:1, 0], wverts[:1, 1], subj)[0]:
            return [wverts.copy()]
        return []

    # stitch: from each chain's exit, walk the window boundary CCW to
    # the nearest chain entry (inserting window corners passed)
    m = wverts.shape[0]
    entry_params = [_perimeter_param(c["entry"], wverts, edges) for c in chains]
    exit_params = [_perimeter_param(c["exit"], wverts, edges) for c in chains]
    used = [False] * len(chains)
    out = []
    for start in range(len(chains)):
        if used[start]:
            continue
        pts = []
        ci = start
        while not used[ci]:
            used[ci] = True
            pts.extend(chains[ci]["pts"])
            te = exit_params[ci]
            # next entry strictly ahead of the exit (cyclically); a
            # coincident entry (touching) links immediately
            best_j, best_gap = None, np.inf
            for j, tn in enumerate(entry_params):
                if used[j] and j != start:
                    continue
                gap = (tn - te) % m
                if gap < best_gap:
                    best_gap, best_j = gap, j
            # insert window corners passed walking CCW from te to the
            # chosen entry: integer params k with (k − te) mod m < gap
            k0 = int(np.floor(te)) + 1
            for s in range(m):
                off = (k0 + s - te) % m
                if off >= best_gap - 1e-9:
                    break
                pts.append(wverts[(k0 + s) % m])
            if best_j == start:
                break
            ci = best_j
        arr = np.asarray(pts)
        if arr.shape[0] >= 3 and abs(ring_area(arr)) > tol * tol:
            out.append(arr)
    return out


def clip_polygon_convex_parts(rings, clip_ring: np.ndarray, eps: float = 1e-9):
    """Holed polygon ∩ convex window → list of components, each a ring
    list [shell, holes…] (even-odd).  Clipped holes attach to the
    component whose shell contains them.

    Edge case (this function only): a hole part that touches the
    window boundary keeps the even-odd AREA exact but does not further
    split its component here — use :func:`clip_polygon_components`,
    which detects that configuration and falls back to the exact
    trapezoid-decomposition splitter (geom/trapezoid.py)."""
    from hexscape_ray.geom.poly import points_in_ring

    comps = clip_ring_convex_parts(rings[0], clip_ring, eps)
    if not comps:
        return []
    out = [[c] for c in comps]
    for hole in rings[1:]:
        for hp in clip_ring_convex_parts(hole, clip_ring, eps):
            ix, iy = _interior_point(hp)
            for comp in out:
                if points_in_ring(np.array([ix]), np.array([iy]), comp[0])[0]:
                    comp.append(hp)
                    break
    return out


def clip_polygon_components(rings, clip_ring: np.ndarray, eps: float = 1e-9):
    """Holed polygon ∩ convex window → TRUE connected components as
    ``(area, cx, cy, polygons)`` tuples, ``polygons`` a list of ring
    lists ready for ``multipolygon_to_wkb``.

    Fast path: the Weiler–Atherton ring components (one simple polygon
    each, holes attached).  When a clipped HOLE part touches the window
    boundary — the configuration that can cut a component in two, which
    the ring-based clipper cannot express — the even-odd ring set is
    re-split exactly via trapezoid decomposition
    (:func:`hexscape_ray.geom.trapezoid.region_components`); those
    components' geometry is the trapezoid partition (valid MultiPolygon,
    exact area/centroid)."""
    from hexscape_ray.geom.poly import polygon_area, polygon_centroid

    comps = clip_polygon_convex_parts(rings, clip_ring, eps)
    if not comps:
        return []

    win = _close(np.asarray(clip_ring, dtype=np.float64))
    if ring_area(win) < 0:
        win = win[::-1]
    edges = _edges_ccw(win[:-1])
    scale = max(
        win[:, 0].max() - win[:, 0].min(), win[:, 1].max() - win[:, 1].min(), 1e-300
    )
    tol = eps * scale

    def touches_boundary(ring: np.ndarray) -> bool:
        d = np.full(ring.shape[0], -np.inf)
        for ax, ay, nx, ny in edges:
            d = np.maximum(d, (ring[:, 0] - ax) * nx + (ring[:, 1] - ay) * ny)
        return bool((np.abs(d) <= tol).any())

    risky = any(
        touches_boundary(np.asarray(h)) for comp in comps for h in comp[1:]
    )
    if not risky:
        return [
            (polygon_area(c), *polygon_centroid(c), [c]) for c in comps
        ]
    from hexscape_ray.geom.trapezoid import component_polygon, region_components

    flat = [r for comp in comps for r in comp]
    return [
        (a, cx, cy, component_polygon(a, quads)[0])
        for a, cx, cy, quads in region_components(flat)
    ]


def _interior_point(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside a simple ring: midpoint of the first
    crossing interval of an off-vertex horizontal chord."""
    r = _close(np.asarray(ring, dtype=np.float64))
    ys = r[:, 1]
    y = 0.49 * ys.min() + 0.51 * ys.max()  # off-centre: avoids vertex hits
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    cond = (y0 <= y) != (y1 <= y)
    if not cond.any():
        return float(r[:-1, 0].mean()), float(r[:-1, 1].mean())
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(cond, (y - y0) / (y1 - y0), 0.0)
    xs = np.sort((x0 + t * (x1 - x0))[cond])
    if xs.size >= 2:
        return float(0.5 * (xs[0] + xs[1])), float(y)
    return float(xs[0]), float(y)
