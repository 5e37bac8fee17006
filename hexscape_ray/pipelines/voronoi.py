"""Voronoi / point utilities: discretise_voronoi, sample_points,
randomise_voronoi (SURVEY §3.3).

Parity targets:
- ``discretise_voronoi`` (/root/reference/R/discretise_voronoi.R:21-44):
  voronoi cells over the map bbox, one cell per point (count invariant
  :28-31), clipped, with Area (km²) + centroid.  Without GEOS the cells
  are built by half-plane intersection: start from the bbox rectangle
  and clip by the perpendicular bisector against every other point —
  exact for point sets that fit a batch (the reference's regime:
  hundreds of farms).
- ``sample_points`` (/root/reference/R/sample_points.R:19-63):
  seeded rejection sampling until exactly ``size`` points per polygon.
- ``randomise_voronoi`` (/root/reference/R/randomise_voronoi.R:38-244):
  pairwise distance ranks → symmetric k-nearest pools (:138-160) →
  sequential weighted draw without replacement with global restart
  (:199-226) — an order-dependent op confined to ONE sorted partition
  (documented; points ≪ pages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from hexscape_ray.geom.clip import clip_halfplane, convex_clip_bbox
from hexscape_ray.geom.poly import points_in_polygon, polygon_centroid, ring_area
from hexscape_ray.geom.wkb import polygon_to_wkb, wkb_to_rings


def voronoi_cells(
    px: np.ndarray, py: np.ndarray, bbox: tuple[float, float, float, float]
) -> list[np.ndarray]:
    """One convex cell ring per point (half-plane intersection)."""
    base = convex_clip_bbox(*bbox)
    cells = []
    for i in range(px.shape[0]):
        ring = base
        dx = px - px[i]
        dy = py - py[i]
        d2 = dx * dx + dy * dy
        order = np.argsort(d2)  # clip by nearest bisectors first (fast shrink)
        for j in order:
            if j == i:
                continue
            mx, my = (px[i] + px[j]) / 2.0, (py[i] + py[j]) / 2.0
            ring = clip_halfplane(ring, mx, my, dx[j], dy[j])
            if ring.shape[0] == 0:
                break
        cells.append(ring)
    return cells


def discretise_voronoi(points: Dataset, bbox=(0.0, 0.0, 100_000.0, 100_000.0)) -> Dataset:
    """points(idx, x, y) → (idx, x, y, Area(km²), cx, cy, wkb).

    All points are broadcast once (the small side); each batch builds
    its own points' cells against the full set.
    """
    all_pts = points.select_columns(["idx", "x", "y"]).to_pandas()
    ref = ray.put((all_pts["x"].to_numpy(), all_pts["y"].to_numpy()))

    class CellBuilder:
        def __init__(self):
            self.px, self.py = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bx = batch["x"].to_numpy(zero_copy_only=False)
            by = batch["y"].to_numpy(zero_copy_only=False)
            base = convex_clip_bbox(*bbox)
            areas, cxs, cys, wkbs = [], [], [], []
            for i in range(bx.shape[0]):
                ring = base
                dx = self.px - bx[i]
                dy = self.py - by[i]
                d2 = dx * dx + dy * dy
                for j in np.argsort(d2):
                    if d2[j] == 0.0:
                        continue  # the point itself (or coincident twin)
                    mx, my = (bx[i] + self.px[j]) / 2.0, (by[i] + self.py[j]) / 2.0
                    ring = clip_halfplane(ring, mx, my, dx[j], dy[j])
                    if ring.shape[0] == 0:
                        break
                areas.append(abs(ring_area(ring)) / 1e6 if ring.shape[0] else 0.0)
                c = polygon_centroid([ring]) if ring.shape[0] else (bx[i], by[i])
                cxs.append(c[0])
                cys.append(c[1])
                wkbs.append(polygon_to_wkb([ring]) if ring.shape[0] else polygon_to_wkb([]))
            return (
                batch.append_column("Area", pa.array(areas))
                .append_column("cx", pa.array(cxs))
                .append_column("cy", pa.array(cys))
                .append_column("wkb", pa.array(wkbs, type=pa.binary()))
            )

    return points.map_batches(CellBuilder, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def sample_points_in_polygons(
    polys: Dataset, size: int, seed: int = 0, wkb_col: str = "wkb", id_col: str = "idx"
) -> Dataset:
    """Exactly ``size`` uniform points per polygon via seeded rejection
    sampling (per-row seed → deterministic across parallelism)."""

    def sample(batch: pa.Table) -> pa.Table:
        out_id, out_x, out_y = [], [], []
        ids = batch[id_col].to_pylist()
        for pid, buf in zip(ids, batch[wkb_col].to_pylist()):
            polys_ = wkb_to_rings(buf)
            rings = polys_[0]
            shell = np.asarray(rings[0])
            x0, y0 = shell[:, 0].min(), shell[:, 1].min()
            x1, y1 = shell[:, 0].max(), shell[:, 1].max()
            rng = np.random.default_rng((seed, int(pid)))
            got_x, got_y = [], []
            guard = 0
            while len(got_x) < size and guard < 10_000:
                need = max(size - len(got_x), 16)
                cx = x0 + rng.random(need * 4) * (x1 - x0)
                cy = y0 + rng.random(need * 4) * (y1 - y0)
                inside = np.zeros(cx.shape[0], dtype=bool)
                for rr in polys_:
                    inside |= points_in_polygon(cx, cy, rr)
                got_x.extend(cx[inside].tolist())
                got_y.extend(cy[inside].tolist())
                guard += 1
            out_id.extend([pid] * size)
            out_x.extend(got_x[:size])
            out_y.extend(got_y[:size])
        return pa.table(
            {
                id_col: pa.array(out_id),
                "x": pa.array(out_x),
                "y": pa.array(out_y),
            }
        )

    return polys.map_batches(sample, batch_format="pyarrow", batch_size=64)


def _pool_matching(pools: list[set[int]], rng) -> list[int]:
    """Seeded perfect matching point→cell over candidate pools
    (Kuhn's algorithm with randomised adjacency order)."""
    n = len(pools)
    match_cell = [-1] * n  # cell -> point
    adj = [rng.permutation(sorted(p)).tolist() for p in pools]

    def try_assign(i: int, seen: set[int]) -> bool:
        for c in adj[i]:
            if c in seen:
                continue
            seen.add(c)
            if match_cell[c] == -1 or try_assign(match_cell[c], seen):
                match_cell[c] = i
                return True
        return False

    for i in range(n):
        if not try_assign(i, set()):
            raise RuntimeError("no perfect matching over candidate pools")
    out = [-1] * n
    for c, i in enumerate(match_cell):
        if i >= 0:
            out[i] = c
    return out


def randomise_voronoi(
    points: Dataset,
    bbox=(0.0, 0.0, 100_000.0, 100_000.0),
    randomise_size: int = 5,
    candidate_points: int = 10,
    max_tries: int = 25,
    seed: int = 1,
    mask_ids: set | None = None,
    from_type: str = "point",
    additional_info: bool = False,
    strict: bool = False,
) -> pd.DataFrame:
    """Anonymise points by reassigning each to a sampled location in a
    voronoi cell drawn from its symmetric k-nearest pool, without
    replacement (each cell used at most once), with global restart on
    exhaustion — sequential semantics preserved in one seeded pass
    (/root/reference/R/randomise_voronoi.R:138-226).

    Returns a pandas frame (point-scale data): idx, x, y, new_x, new_y,
    assigned_cell, RandomShift, VoronoiMasked.

    ``mask_ids`` (§2.10 knob, /root/reference/R/randomise_voronoi.R:106-111):
    masked points are NOT moved — they keep their own cell (which stays
    consumed, preserving without-replacement) and carry the
    ``VoronoiMasked`` audit flag.

    ``additional_info`` (/root/reference/R/randomise_voronoi.R:234-244):
    adds the reference's audit-column surface — ``shift_wkb``
    (LineString original→new, RandomShift), ``from_wkb`` / ``to_wkb``
    (the rank-source geometries, FromType/ToType), ``cell_wkb`` /
    ``assigned_cell_wkb`` (own and assigned voronoi cells,
    VoronoiUnmasked/VoronoiMasked analogue), ``n_to_candidates``
    (pool size, ToCandidates), ``n_from_candidates`` (pools containing
    this point, FromCandidates) and ``from_times_chosen``
    (FromTimesChosen).
    """
    vor = discretise_voronoi(points, bbox).to_pandas().sort_values("idx", ignore_index=True)
    # from_type knob (§2.10, /root/reference/R/randomise_voronoi.R:114-133):
    # distance ranks from the raw points or from the voronoi-cell centroids
    if from_type == "voronoi":
        px = vor["cx"].to_numpy()
        py = vor["cy"].to_numpy()
    elif from_type == "point":
        px = vor["x"].to_numpy()
        py = vor["y"].to_numpy()
    else:
        raise ValueError(f"from_type must be 'point' or 'voronoi', got {from_type!r}")
    n = len(vor)
    k = min(randomise_size, n - 1)

    # pairwise distance ranks → symmetric union of row/col top-k pools
    d = np.hypot(px[:, None] - px[None, :], py[:, None] - py[None, :])
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)
    pools = [set(order[i, :k].tolist()) | {i} for i in range(n)]
    for i in range(n):
        for j in order[i, :k]:
            pools[j].add(i)  # symmetric closure (:149-160)

    cells = {
        int(row.idx): wkb_to_rings(row.wkb)[0] for row in vor.itertuples(index=False)
    }

    # masked points keep their own cell (pool collapses to {self})
    masked = np.zeros(n, dtype=bool)
    if mask_ids:
        for i in range(n):
            if int(vor["idx"].iloc[i]) in mask_ids:
                masked[i] = True
                pools[i] = {i}

    rng = np.random.default_rng(seed)
    ok = False
    for attempt in range(max_tries):
        used: set[int] = set()
        assign: list[int] = []
        ok = True
        for i in range(n):
            avail = sorted(pools[i] - used)
            if not avail:
                ok = False
                break  # global restart (:199-226)
            pick = int(rng.choice(avail))
            used.add(pick)
            assign.append(pick)
        if ok:
            break
    if not ok:
        if strict:
            # strict parity: the reference hard-fails after max_tries
            # greedy restarts (/root/reference/R/randomise_voronoi.R:
            # 222-226 "Unable to find a valid combination...")
            raise RuntimeError(
                f"unable to find a valid randomisation in {max_tries} tries "
                "(strict=True reproduces the reference hard-fail; rerun with "
                "a larger randomise_size/max_tries or strict=False)"
            )
        # Default: greedy sequential draws are often infeasible for
        # clustered pools, so fall back to a seeded perfect matching
        # (Kuhn's augmenting paths over the same pools) — documented
        # deviation: same without-replacement guarantee, not draw-order
        # faithful.
        assign = _pool_matching(pools, rng)

    new_x, new_y = [], []
    for i, cell_i in enumerate(assign):
        if masked[i]:  # masked: original location, no resample
            new_x.append(float(vor["x"].iloc[i]))
            new_y.append(float(vor["y"].iloc[i]))
            continue
        rings = cells[int(vor["idx"].iloc[cell_i])]
        shell = np.asarray(rings[0])
        x0, y0 = shell[:, 0].min(), shell[:, 1].min()
        x1, y1 = shell[:, 0].max(), shell[:, 1].max()
        r2 = np.random.default_rng((seed, i))
        while True:
            cx = x0 + r2.random() * (x1 - x0)
            cy = y0 + r2.random() * (y1 - y0)
            if points_in_polygon([cx], [cy], rings)[0]:
                new_x.append(cx)
                new_y.append(cy)
                break

    out = vor[["idx", "x", "y"]].copy()
    out["assigned_cell"] = [int(vor["idx"].iloc[a]) for a in assign]
    out["new_x"] = new_x
    out["new_y"] = new_y
    out["RandomShift"] = out["assigned_cell"] != out["idx"]
    out["VoronoiMasked"] = masked
    if additional_info:
        from hexscape_ray.geom.wkb import linestring_to_wkb, point_to_wkb

        out["shift_wkb"] = [
            linestring_to_wkb([[ox, oy], [nx, ny]])
            for ox, oy, nx, ny in zip(out["x"], out["y"], new_x, new_y)
        ]
        out["from_wkb"] = [point_to_wkb(a, b) for a, b in zip(px, py)]
        out["to_wkb"] = [point_to_wkb(a, b) for a, b in zip(new_x, new_y)]
        out["cell_wkb"] = vor["wkb"]
        own_cell_wkb = dict(zip(vor["idx"].astype(int), vor["wkb"]))
        out["assigned_cell_wkb"] = [own_cell_wkb[c] for c in out["assigned_cell"]]
        out["n_to_candidates"] = [len(p) for p in pools]
        chosen_by = np.zeros(n, dtype=np.int64)
        for p in pools:
            for j in p:
                chosen_by[j] += 1
        out["n_from_candidates"] = chosen_by
        times_chosen = np.zeros(n, dtype=np.int64)
        for a in assign:
            times_chosen[a] += 1
        out["from_times_chosen"] = times_chosen
    return out
