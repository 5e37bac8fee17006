"""Grid-bucketed bbox spatial index — the STRtree stand-in.

The reference gets an implicit GEOS STRtree inside every
``st_intersects`` call (/root/reference/R/generate_patches.R:135,259).
With no GEOS available we bucket geometry bboxes onto a uniform grid;
candidate lookup is O(cells touched), then exact predicates
(point-in-polygon / convex clip) confirm.  Built ONCE per actor in
``__init__`` (SURVEY §2.4 T1) and queried per batch.
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.geom.poly import (
    distance_to_polygon,
    points_in_polygon,
    rings_bbox,
)


class GeomIndex:
    """Index over a list of (holed) polygons given as ring lists."""

    def __init__(self, polygons, n_cells: int = 64):
        self.polygons = polygons
        boxes = np.array([rings_bbox(p) for p in polygons], dtype=np.float64)
        self.boxes = boxes
        self.xmin = float(boxes[:, 0].min())
        self.ymin = float(boxes[:, 1].min())
        self.xmax = float(boxes[:, 2].max())
        self.ymax = float(boxes[:, 3].max())
        self.nc = n_cells
        self.dx = max((self.xmax - self.xmin) / n_cells, 1e-9)
        self.dy = max((self.ymax - self.ymin) / n_cells, 1e-9)
        # bucket -> list[int geometry ids]
        self.buckets: dict[tuple[int, int], list[int]] = {}
        for gid, (bx0, by0, bx1, by1) in enumerate(boxes):
            i0, i1 = self._ix(bx0), self._ix(bx1)
            j0, j1 = self._iy(by0), self._iy(by1)
            for i in range(i0, i1 + 1):
                for j in range(j0, j1 + 1):
                    self.buckets.setdefault((i, j), []).append(gid)

    def _ix(self, x: float) -> int:
        return min(max(int((x - self.xmin) / self.dx), 0), self.nc - 1)

    def _iy(self, y: float) -> int:
        return min(max(int((y - self.ymin) / self.dy), 0), self.nc - 1)

    def candidates_bbox(self, bx0, by0, bx1, by1) -> np.ndarray:
        out: set[int] = set()
        for i in range(self._ix(bx0), self._ix(bx1) + 1):
            for j in range(self._iy(by0), self._iy(by1) + 1):
                out.update(self.buckets.get((i, j), ()))
        if not out:
            return np.empty(0, dtype=np.int64)
        cand = np.fromiter(out, dtype=np.int64)
        b = self.boxes[cand]
        keep = (b[:, 0] <= bx1) & (b[:, 2] >= bx0) & (b[:, 1] <= by1) & (b[:, 3] >= by0)
        return cand[keep]

    def assign_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """For each point, the id of the FIRST polygon containing it
        (lowest gid — deterministic), or -1.

        Vectorised per polygon over the subset of points whose bucket
        candidates include it — the engine's st_contains analogue
        (/root/reference/R/download_maps.R:88-96).
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.full(px.shape[0], -1, dtype=np.int64)
        # group points by candidate polygon to keep calls vectorised
        gi = np.clip(((px - self.xmin) / self.dx).astype(np.int64), 0, self.nc - 1)
        gj = np.clip(((py - self.ymin) / self.dy).astype(np.int64), 0, self.nc - 1)
        bucket_key = gi * self.nc + gj
        order = np.argsort(bucket_key, kind="stable")
        sk = bucket_key[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        ends = np.r_[starts[1:], sk.size]
        for s, e in zip(starts, ends):
            idxs = order[s:e]
            i, j = int(gi[idxs[0]]), int(gj[idxs[0]])
            for gid in self.buckets.get((i, j), ()):  # sorted ascending
                todo = idxs[out[idxs] == -1]
                if todo.size == 0:
                    break
                b = self.boxes[gid]
                inb = (
                    (px[todo] >= b[0])
                    & (px[todo] <= b[2])
                    & (py[todo] >= b[1])
                    & (py[todo] <= b[3])
                )
                cand = todo[inb]
                if cand.size == 0:
                    continue
                hit = points_in_polygon(px[cand], py[cand], self.polygons[gid])
                out[cand[hit]] = gid
        return out

    def min_distance(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Distance from each point to the nearest polygon (0 inside).
        Exact but brute-force over candidate polygons; used only on
        small boundary tables (distance prefilter M3)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        d = np.full(px.shape[0], np.inf)
        for rings in self.polygons:
            d = np.minimum(d, distance_to_polygon(px, py, rings))
        return d
