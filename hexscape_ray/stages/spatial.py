"""Stateful spatial stages: actor pools holding boundary polygon
indexes (the engine's STRtree stand-in, SURVEY §2.4 T1).

Boundary tables are broadcast ONCE via ``ray.put`` on the driver; each
actor decodes WKB and builds a ``GeomIndex`` in ``__init__``; batches
stream through ``__call__`` zero-copy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from hexscape_ray import grid
from hexscape_ray.config import GridSpec
from hexscape_ray.geom.clip import polygon_intersection_area_convex
from hexscape_ray.geom.index import GeomIndex
from hexscape_ray.geom.wkb import wkb_to_rings


def load_boundary_ref(table: pa.Table, wkb_col: str = "wkb", id_col: str = "code"):
    """Driver-side: decode a boundary table to (ids, flat polygon list,
    owner map) and ``ray.put`` it once for all actors.

    MultiPolygons are flattened to parts sharing one owner id, which
    preserves the reference's multipart semantics for containment
    (/root/reference/R/generate_patches.R:148-185)."""
    ids = table.column(id_col).to_pylist()
    flat, owner = [], []
    for gid, buf in enumerate(table.column(wkb_col).to_pylist()):
        for rings in wkb_to_rings(buf):
            flat.append([np.asarray(r) for r in rings])
            owner.append(gid)
    return ray.put({"ids": ids, "polygons": flat, "owner": np.asarray(owner, dtype=np.int64)})


class PolygonAssigner:
    """Point → containing polygon id, with the reference's 3-stage
    fallback collapsed to its point form: (1) exact containment via the
    index, (2) unassigned points (boundary/gap cases) fall back to the
    nearest polygon within ``max_snap_dist``
    (/root/reference/R/download_maps.R:79-129 — contains, then
    intersects, then max-overlap tie-break; for points the overlap
    tie-break degenerates to nearest-boundary)."""

    def __init__(self, boundary_ref, out_col: str = "admin_code", max_snap_dist: float = np.inf):
        b = ray.get(boundary_ref)
        self.ids = b["ids"]
        self.owner = b["owner"]
        self.index = GeomIndex(b["polygons"])
        self.out_col = out_col
        self.max_snap = max_snap_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["x"].to_numpy(zero_copy_only=False)
        py = batch["y"].to_numpy(zero_copy_only=False)
        gid = self.index.assign_points(px, py)
        miss = gid < 0
        if miss.any() and np.isfinite(self.max_snap):
            # fallback: nearest polygon (small count by construction)
            mx, my = px[miss], py[miss]
            best = np.full(mx.shape[0], -1, dtype=np.int64)
            best_d = np.full(mx.shape[0], self.max_snap)
            for fid, rings in enumerate(self.index.polygons):
                from hexscape_ray.geom.poly import distance_to_polygon

                d = distance_to_polygon(mx, my, rings)
                upd = d < best_d
                best[upd] = fid
                best_d[upd] = d[upd]
            gid[miss] = best
        codes = np.asarray(
            [self.ids[self.owner[g]] if g >= 0 else "" for g in gid], dtype=object
        )
        return batch.append_column(self.out_col, pa.array(codes, type=pa.string()))


def assign_points_to_polygons(
    points: Dataset,
    boundary: pa.Table,
    id_col: str = "code",
    out_col: str = "admin_code",
    concurrency=(1, 8),
    batch_size: int = 65536,
) -> Dataset:
    ref = load_boundary_ref(boundary, id_col=id_col)
    return points.map_batches(
        PolygonAssigner,
        fn_constructor_args=(ref, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class HexCategoryClipper:
    """Per-hex area-weighted category fractions — the A3 kernel
    (/root/reference/R/generate_patches.R:252-266).

    Actor holds the land-cover polygons (+category labels) in a
    ``GeomIndex``; each batch of (r, q) hex rows is clipped against
    candidate polygons (bbox-pruned) and emits one row per
    (r, q, category) with the exact intersection area.
    """

    def __init__(self, landcover_ref, spec: GridSpec, res: int = 0, cat_col: str = "category"):
        b = ray.get(landcover_ref)
        self.cats = b["cats"]
        self.owner = b["owner"]
        self.index = GeomIndex(b["polygons"])
        self.spec = spec
        self.res = res

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        hexes = grid.cell_polygon(r, q, self.spec, self.res)  # (n, 7, 2)
        out_r, out_q, out_cat, out_area = [], [], [], []
        for i in range(r.shape[0]):
            ring = hexes[i]
            bx0, by0 = ring[:, 0].min(), ring[:, 1].min()
            bx1, by1 = ring[:, 0].max(), ring[:, 1].max()
            cand = self.index.candidates_bbox(bx0, by0, bx1, by1)
            acc: dict[str, float] = {}
            for gid in cand:
                a = polygon_intersection_area_convex(self.index.polygons[gid], ring)
                if a > 0.0:
                    cat = self.cats[self.owner[gid]]
                    acc[cat] = acc.get(cat, 0.0) + a
            for cat, a in acc.items():
                out_r.append(r[i])
                out_q.append(q[i])
                out_cat.append(cat)
                out_area.append(a)
        return pa.table(
            {
                "r": pa.array(np.asarray(out_r, dtype=np.int64)),
                "q": pa.array(np.asarray(out_q, dtype=np.int64)),
                "category": pa.array(out_cat, type=pa.string()),
                "area": pa.array(np.asarray(out_area, dtype=np.float64)),
            }
        )


def load_landcover_ref(table: pa.Table, wkb_col: str = "wkb", cat_col: str = "category"):
    cats = table.column(cat_col).to_pylist()
    flat, owner = [], []
    for gid, buf in enumerate(table.column(wkb_col).to_pylist()):
        for rings in wkb_to_rings(buf):
            flat.append([np.asarray(rr) for rr in rings])
            owner.append(gid)
    return ray.put({"cats": cats, "polygons": flat, "owner": np.asarray(owner, dtype=np.int64)})


class LandscapeClipper:
    """Hex candidate rows → clipped area within the landscape + the
    distance prefilter (M3/M4,
    /root/reference/R/generate_patches.R:103-142): drops hexes whose
    centroid is ≥ hex_height/1.9 from the landscape, computes
    area(hex ∩ landscape) and drops slivers < min_prop · hex_area.

    ``split_parts`` (M5, :148-185): a hex cut into disjoint pieces
    explodes into one row per connected component, each with its own
    area/centroid and a ``part`` ordinal — the reference's
    st_cast(POLYGON) semantics.  Both split causes are covered:
    MULTI-PART landscapes (islands) AND a concave single polygon
    (coastline/fjord notch crossing the hex), the latter via the
    convex-window Weiler–Atherton clip, with an exact
    trapezoid-decomposition fallback when a landscape HOLE touches the
    hex boundary (``geom.clip.clip_polygon_components`` — all split
    causes covered).  Piece slivers below min_prop · hex_area are
    dropped after the split (:196-197), matching the reference's
    post-split filter.
    """

    def __init__(
        self,
        landscape_ref,
        spec: GridSpec,
        res: int = 0,
        split_parts: bool = False,
        with_geometry: bool = False,
        impassable_ref=None,
    ):
        b = ray.get(landscape_ref)
        self.index = GeomIndex(b["polygons"])
        self.spec = spec
        self.res = res
        self.split_parts = split_parts
        self.with_geometry = with_geometry
        # M5 impassable subtraction (st_difference parity,
        # /root/reference/R/generate_patches.R:148-166): polygons to
        # subtract from every clipped piece, own bbox index
        self.imp_index = (
            GeomIndex(ray.get(impassable_ref)["polygons"])
            if impassable_ref is not None
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hexscape_ray.geom.clip import (
            clip_polygon_components,
            clip_polygon_convex,
        )
        from hexscape_ray.geom.poly import polygon_area, polygon_centroid
        from hexscape_ray.geom.wkb import multipolygon_to_wkb, polygon_to_wkb

        r = batch["r"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        cx, cy = grid.axial_to_centroid(r, q, self.spec, self.res)
        dist = self.index.min_distance(cx, cy)
        keep = dist < self.spec.hex_height / 1.9  # reference constant
        r, q, cx, cy = r[keep], q[keep], cx[keep], cy[keep]
        hexes = grid.cell_polygon(r, q, self.spec, self.res)
        thresh = self.spec.min_prop * self.spec.hex_area

        out = {k: [] for k in ("r", "q", "part", "x", "y", "area", "wkb")}
        for i in range(r.shape[0]):
            ring = hexes[i]
            bx0, by0 = ring[:, 0].min(), ring[:, 1].min()
            bx1, by1 = ring[:, 0].max(), ring[:, 1].max()
            cand = self.index.candidates_bbox(bx0, by0, bx1, by1)
            pieces = []  # (area, cx, cy, polygons) per connected component
            for g in cand:
                if self.split_parts:
                    # component-exact clip: a concave landscape part OR a
                    # boundary-touching hole can cut the hex into several
                    # pieces → one entry each (exact area/centroid)
                    comps = clip_polygon_components(self.index.polygons[g], ring)
                    if self.imp_index is not None and comps:
                        # subtract impassable (st_difference :161) then
                        # re-split — the subtraction itself can cut a
                        # piece in two (a river through the hex)
                        from hexscape_ray.geom.trapezoid import (
                            boolean_components,
                            component_polygon,
                        )

                        icand = self.imp_index.candidates_bbox(bx0, by0, bx1, by1)
                        if len(icand):
                            ipolys = [self.imp_index.polygons[ic] for ic in icand]
                            comps = [
                                (na, ncx, ncy, component_polygon(na, quads)[0])
                                for _, _, _, polys in comps
                                for na, ncx, ncy, quads in boolean_components(
                                    polys, ipolys, "difference"
                                )
                            ]
                    for a, pcx, pcy, polys in comps:
                        if a > 0.0:
                            pieces.append((a, pcx, pcy, polys))
                    continue
                clipped = clip_polygon_convex(self.index.polygons[g], ring)
                if not clipped:
                    continue
                a = polygon_area(clipped)
                if a > 0.0:
                    pcx, pcy = polygon_centroid(clipped)
                    pieces.append((a, pcx, pcy, clipped))
            total = sum(p[0] for p in pieces)
            if total < thresh:
                continue  # pre-split filter (:140-141)
            if self.split_parts:
                part = 0
                for a, pcx, pcy, polys in pieces:
                    if a < thresh:  # post-split sliver drop (:196-197)
                        continue
                    out["r"].append(r[i])
                    out["q"].append(q[i])
                    out["part"].append(part)
                    out["x"].append(pcx)
                    out["y"].append(pcy)
                    out["area"].append(a)
                    if self.with_geometry:
                        out["wkb"].append(
                            polygon_to_wkb(polys[0])
                            if len(polys) == 1
                            else multipolygon_to_wkb(polys)
                        )
                    part += 1
            else:
                out["r"].append(r[i])
                out["q"].append(q[i])
                out["part"].append(0)
                out["x"].append(cx[i])
                out["y"].append(cy[i])
                out["area"].append(total)
                if self.with_geometry:
                    out["wkb"].append(multipolygon_to_wkb([p[3] for p in pieces]))
        cols = {
            "r": pa.array(np.asarray(out["r"], dtype=np.int64)),
            "q": pa.array(np.asarray(out["q"], dtype=np.int64)),
            "x": pa.array(np.asarray(out["x"], dtype=np.float64)),
            "y": pa.array(np.asarray(out["y"], dtype=np.float64)),
            "area": pa.array(np.asarray(out["area"], dtype=np.float64)),
        }
        if self.split_parts:
            cols["part"] = pa.array(np.asarray(out["part"], dtype=np.int32))
        if self.with_geometry:
            cols["wkb"] = pa.array(out["wkb"], type=pa.binary())
        return pa.table(cols)


class PolygonToPolygonAssigner:
    """Child polygon → parent polygon with the reference's exact
    3-stage fallback (/root/reference/R/download_maps.R:79-129, the
    LAU→NUTS3 assignment):

    1. parent containing the child's centroid (``st_contains``);
    2. else parents whose bbox+geometry intersect the child
       (``st_intersects``); a single hit wins;
    3. else/tie: the parent with MAX intersection area, computed with
       the general boolean-op scanline
       (``geom.trapezoid.boolean_area``) — exact for concave and
       holed children too (the round-1 convex-child assumption is
       gone).

    Emits exactly one parent per child (invariant,
    /root/reference/R/download_maps.R:94,114-120) or "" when disjoint
    from every parent.
    """

    def __init__(self, boundary_ref, wkb_col: str = "wkb", out_col: str = "parent_code"):
        b = ray.get(boundary_ref)
        self.ids = b["ids"]
        self.owner = b["owner"]
        self.index = GeomIndex(b["polygons"])
        self.wkb_col = wkb_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hexscape_ray.geom.poly import polygon_centroid, rings_bbox

        out = []
        for buf in batch[self.wkb_col].to_pylist():
            parts = wkb_to_rings(buf)
            # stage 1: centroid containment (area-weighted, all parts)
            big = max(parts, key=lambda rr: abs(_ring_area(rr[0])))
            cx, cy = polygon_centroid(big)
            gid = self.index.assign_points(np.array([cx]), np.array([cy]))[0]
            if gid >= 0:
                out.append(self.ids[self.owner[gid]])
                continue
            # stage 2/3: intersecting candidates, max-area tie-break
            from hexscape_ray.geom.trapezoid import boolean_area

            best_area, best_id = 0.0, ""
            for rings in parts:
                bx0, by0, bx1, by1 = rings_bbox(rings)
                for cand in self.index.candidates_bbox(bx0, by0, bx1, by1):
                    a = boolean_area(
                        [self.index.polygons[cand]], [rings], "intersection"
                    )
                    pid = self.ids[self.owner[cand]]
                    if a > best_area or (a == best_area and a > 0 and pid < best_id):
                        best_area, best_id = a, pid  # strict deterministic tie-break
            out.append(best_id)
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def assign_polygons_to_polygons(
    children: Dataset,
    parents: pa.Table,
    id_col: str = "code",
    wkb_col: str = "wkb",
    out_col: str = "parent_code",
    concurrency=(1, 8),
) -> Dataset:
    ref = load_boundary_ref(parents, id_col=id_col)
    return children.map_batches(
        PolygonToPolygonAssigner,
        fn_constructor_args=(ref, wkb_col, out_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )


def _ring_area(ring):
    from hexscape_ray.geom.poly import ring_area

    return ring_area(ring)


def group_union_by_class(
    landcover, class_col: str = "clc", wkb_col: str = "wkb"
) -> "Dataset":
    """A2 (/root/reference/R/extract_corine.R:153-159; load_corine
    :274-284): geometric union of polygons per land-cover class.

    Distributed as groupby(class).map_groups.  ``union_area`` and
    ``n_components`` are EXACT for overlapping inputs too (coverage
    scanline union, ``geom.trapezoid.union_components`` — overlap
    counted once); ``n_parts``/``wkb`` keep the input parts as a
    MultiPolygon (the reference's geometry list-column shape).
    Output: one row per class with merged MultiPolygon WKB, part
    count, connected-component count and exact union area.
    """
    import pandas as pd

    from hexscape_ray.geom.trapezoid import union_components
    from hexscape_ray.geom.wkb import multipolygon_to_wkb

    def union(g: pd.DataFrame) -> pd.DataFrame:
        polys = []
        for buf in g[wkb_col]:
            for rings in wkb_to_rings(buf):
                polys.append(rings)
        comps = union_components(polys)
        return pd.DataFrame(
            {
                class_col: [g[class_col].iloc[0]],
                "n_parts": [len(polys)],
                "n_components": [len(comps)],
                "union_area": [float(sum(c[0] for c in comps))],
                "wkb": [multipolygon_to_wkb(polys)],
            }
        )

    return landcover.groupby(class_col).map_groups(union, batch_format="pandas")


def affine_transform_batch(
    batch: pa.Table,
    scale: float = 1.0,
    dx: float = 0.0,
    dy: float = 0.0,
    cols=(("x", "y"),),
) -> pa.Table:
    """M9 planar affine transform (m ↔ km, datum offsets), applied
    vectorised to point-column pairs.  Full geodetic re-projection —
    the reference's st_transform at every read
    (/root/reference/R/extract_corine.R:140) — is
    ``geom.crs.crs_transform_batch`` (from-scratch ellipsoidal LAEA,
    EPSG:4326 ↔ EPSG:3035, <1e-3 m round-trip)."""
    for cx, cy in cols:
        x = np.asarray(batch[cx].to_numpy(zero_copy_only=False)) * scale + dx
        y = np.asarray(batch[cy].to_numpy(zero_copy_only=False)) * scale + dy
        batch = batch.set_column(batch.column_names.index(cx), cx, pa.array(x))
        batch = batch.set_column(batch.column_names.index(cy), cy, pa.array(y))
    return batch


def coverage_gap(landcover: pa.Table, landscape_area: float) -> dict:
    """A7 (/root/reference/R/extract_corine.R:177-205): fraction of the
    landscape not covered by land-cover polygons; warn threshold 0.1%.
    Driver-side scalar on the (small) boundary table."""
    from hexscape_ray.geom.poly import polygon_area

    covered = 0.0
    for buf in landcover.column("wkb").to_pylist():
        for rings in wkb_to_rings(buf):
            covered += polygon_area(rings)
    prop_miss = 1.0 - covered / landscape_area
    return {"covered": covered, "prop_missing": prop_miss, "warn": prop_miss > 0.001}
