"""Topology-preserving simplification (M11): the engine's analogue of
rmapshaper::ms_simplify (/root/reference/R/generate_patches.R:153,241).

Plain per-ring Douglas–Peucker (geom.poly.simplify_ring) can open
sliver gaps between polygons that share a boundary, because the two
copies of the shared edge simplify independently.  This module uses
the public TopoJSON / mapshaper approach instead:

1. quantize vertices so shared boundaries are bit-identical;
2. cut every ring into ARCS at junction vertices (points where the set
   of adjacent (polygon, ring) users changes) and deduplicate arcs
   shared by neighbouring polygons;
3. rank every interior arc vertex by its Douglas–Peucker elimination
   threshold (the deviation at which DP would drop it) — computed ONCE
   per unique arc;
4. keep the top ``keep`` fraction of interior vertices GLOBALLY (the
   ms_simplify ``keep=`` semantics), always retaining arc endpoints;
5. rebuild rings from the simplified shared arcs — neighbours get the
   SAME simplified boundary, so no gaps/overlaps are introduced
   (``keep_shapes``: a ring is never reduced below 3 distinct points).
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.geom.poly import _close


def _quantize(ring: np.ndarray, grid: float) -> np.ndarray:
    """Snap to a grid (floor(x/grid + 0.5)) and drop repeated points."""
    r = np.asarray(ring, dtype=np.float64)
    qq = np.floor(r / grid + 0.5) * grid
    keep = np.ones(qq.shape[0], dtype=bool)
    keep[1:] = (qq[1:] != qq[:-1]).any(axis=1)
    return qq[keep]


def _dp_thresholds(pts: np.ndarray) -> np.ndarray:
    """Douglas–Peucker elimination threshold per vertex (endpoints get
    +inf): the deviation at which simplification would drop the point.
    Standard simplify-by-rank precomputation (public: Visvalingam /
    mapshaper write-ups)."""
    n = pts.shape[0]
    thr = np.zeros(n)
    thr[0] = thr[-1] = np.inf
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        a, b = pts[i0], pts[i1]
        ab = b - a
        L2 = float(ab @ ab)
        mid = pts[i0 + 1 : i1]
        if L2 == 0:
            d = np.hypot(mid[:, 0] - a[0], mid[:, 1] - a[1])
        else:
            t = np.clip(((mid - a) @ ab) / L2, 0.0, 1.0)
            proj = a + t[:, None] * ab
            d = np.hypot(mid[:, 0] - proj[:, 0], mid[:, 1] - proj[:, 1])
        j = int(np.argmax(d))
        thr[i0 + 1 + j] = d[j]
        stack.append((i0, i0 + 1 + j))
        stack.append((i0 + 1 + j, i1))
    return thr


def _extract_arcs(rings: list[np.ndarray]):
    """Cut closed rings into shared arcs.

    Returns (arcs, ring_arcs): ``arcs`` is a list of (m, 2) vertex
    arrays; ``ring_arcs[i]`` is a list of (arc_id, reversed) pairs
    reconstructing ring i.  Arcs are deduplicated across rings in
    either direction.
    """
    # vertex key → set of (ring_id, neighbour multiset signature)
    use: dict[tuple, set] = {}
    ring_keys = []
    for ri, ring in enumerate(rings):
        r = _close(ring)[:-1]
        keys = [tuple(p) for p in r]
        ring_keys.append(keys)
        n = len(keys)
        for i, k in enumerate(keys):
            use.setdefault(k, set()).add(ri)

    # junction = vertex used by a different set of rings than one of
    # its ring-neighbours, or used more than once in one ring
    junctions: set = set()
    for ri, keys in enumerate(ring_keys):
        n = len(keys)
        seen_in_ring: dict = {}
        for k in keys:
            seen_in_ring[k] = seen_in_ring.get(k, 0) + 1
        for i, k in enumerate(keys):
            if seen_in_ring[k] > 1:
                junctions.add(k)
                continue
            prev_k = keys[i - 1]
            next_k = keys[(i + 1) % n]
            if use[k] != use[prev_k] or use[k] != use[next_k]:
                junctions.add(k)

    arcs: list[np.ndarray] = []
    arc_index: dict[tuple, int] = {}  # canonical endpoints+mid key → id
    ring_arcs: list[list[tuple[int, bool]]] = []

    def _arc_key(pts: np.ndarray):
        fwd = tuple(map(tuple, pts))
        rev = tuple(map(tuple, pts[::-1]))
        return (fwd, False) if fwd <= rev else (rev, True)

    for ri, keys in enumerate(ring_keys):
        n = len(keys)
        cut = [i for i, k in enumerate(keys) if k in junctions]
        parts: list[np.ndarray] = []
        if not cut:  # isolated ring: one closed arc
            parts = [np.asarray(keys + keys[:1], dtype=np.float64)]
        else:
            for ci in range(len(cut)):
                i0 = cut[ci]
                i1 = cut[(ci + 1) % len(cut)]
                if i1 > i0:
                    seg = keys[i0 : i1 + 1]
                else:
                    seg = keys[i0:] + keys[: i1 + 1]
                parts.append(np.asarray(seg, dtype=np.float64))
        entry = []
        for pts in parts:
            key, reverse = _arc_key(pts)
            if key not in arc_index:
                arc_index[key] = len(arcs)
                arcs.append(pts[::-1] if reverse else pts)
            entry.append((arc_index[key], reverse))
        ring_arcs.append(entry)
    return arcs, ring_arcs


def simplify_shared(
    polygons: list[list[np.ndarray]],
    keep: float = 0.1,
    quant_grid: float | None = None,
) -> list[list[np.ndarray]]:
    """ms_simplify-style simplification of a polygon LAYER: shared
    boundaries stay shared (topology preserved).

    ``polygons``: list of ring lists ([shell, holes…]); returns the
    same structure.  ``keep``: global fraction of interior vertices to
    retain (ms_simplify ``keep=``).  ``quant_grid``: snap grid for
    boundary matching (default: 1e-9 of the layer bbox span).
    """
    flat: list[np.ndarray] = []
    owners: list[tuple[int, int]] = []
    for pi, rings in enumerate(polygons):
        for qi, ring in enumerate(rings):
            flat.append(np.asarray(ring, dtype=np.float64))
            owners.append((pi, qi))
    if not flat:
        return polygons
    if quant_grid is None:
        allpts = np.vstack([_close(r) for r in flat])
        span = max(np.ptp(allpts[:, 0]), np.ptp(allpts[:, 1]), 1e-300)
        quant_grid = span * 1e-9
    flat = [_quantize(_close(r), quant_grid) for r in flat]

    arcs, ring_arcs = _extract_arcs(flat)

    # global DP threshold ranking over all unique arcs
    thr_per_arc = [_dp_thresholds(a) for a in arcs]
    interior = np.concatenate(
        [t[1:-1] for t in thr_per_arc if t.shape[0] > 2] or [np.empty(0)]
    )
    if interior.size == 0:
        cutoff = 0.0
    else:
        k = max(0, min(interior.size - 1, int(np.ceil(interior.size * (1.0 - keep))) - 1))
        cutoff = np.sort(interior)[k] if keep < 1.0 else -np.inf

    simp_arcs = []
    for a, t in zip(arcs, thr_per_arc):
        m = t > cutoff
        m[0] = m[-1] = True
        simp_arcs.append(a[m])

    tmp: dict[tuple[int, int], np.ndarray] = {}
    for (pi, qi), entry in zip(owners, ring_arcs):
        pts = []
        for arc_id, reverse in entry:
            seg = simp_arcs[arc_id]
            seg = seg[::-1] if reverse else seg
            pts.append(seg[:-1])  # avoid duplicating junction vertices
        ring = np.vstack(pts)
        if ring.shape[0] < 3:
            # keep_shapes: re-add the highest-threshold interior points
            # of the ring's arcs until it has ≥ 3 distinct vertices
            cand = []
            for arc_id, reverse in entry:
                a, t = arcs[arc_id], thr_per_arc[arc_id]
                for i in range(1, a.shape[0] - 1):
                    cand.append((t[i], arc_id, i))
            cand.sort(reverse=True)
            need = 3 - ring.shape[0]
            keep_extra = {(aid, i) for _, aid, i in cand[:need]}
            pts = []
            for arc_id, reverse in entry:
                a, t = arcs[arc_id], thr_per_arc[arc_id]
                m = t > cutoff
                for aid, i in keep_extra:
                    if aid == arc_id:
                        m[i] = True
                m[0] = m[-1] = True
                seg = a[m]
                seg = seg[::-1] if reverse else seg
                pts.append(seg[:-1])
            ring = np.vstack(pts)
        tmp[(pi, qi)] = ring
    result: list[list[np.ndarray]] = []
    for pi, rings in enumerate(polygons):
        result.append([tmp[(pi, qi)] for qi in range(len(rings))])
    return result
