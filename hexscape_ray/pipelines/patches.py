"""Tessellation pipeline: generate_patches + generate_neighbours
(SURVEY §3.2), Ray-Data-first.

Parity target:
- ``generate_patches`` (/root/reference/R/generate_patches.R:38-394):
  axial candidate grid over the landscape bbox → centroid distance
  prefilter (dist < hex_height/1.9) → clip to landscape, drop slivers
  (area < min_prop·hex_area) → per-category area fractions with the
  Σ-proportions = 1 checksum → stable (q, r) ordering + dense Index.
- ``generate_neighbours`` (/root/reference/R/generate_neighbours.R:8-179):
  6 axial offsets (J3 is pure math — no spatial join needed), complete-
  area shortcut Border = hex_side, exact in-landscape edge length for
  boundary hexes (where the reference approximates via buffering we
  compute the hex-edge ∩ landscape interval exactly — documented
  deviation), Border > min_prop·hex_side filter, direction factor
  NE/E/SE/SW/W/NW from centroid deltas.

Part splitting (M5): with ``split_parts=True`` hexes cut into
disjoint pieces — by multi-part landscapes (islands), by a CONCAVE
single landscape polygon (coastline notch), or by a HOLE crossing the
hex (impassable river) — explode into per-part rows, matching the
reference's st_cast(POLYGON)
(/root/reference/R/generate_patches.R:148-185) via the convex-window
Weiler–Atherton clip with an exact trapezoid-decomposition fallback
(``geom/clip.py::clip_polygon_components``, ``geom/trapezoid.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

from hexscape_ray import grid
from hexscape_ray.config import GridSpec
from hexscape_ray.geom.lines import segment_inside_length
from hexscape_ray.stages.agg import two_phase_sum
from hexscape_ray.stages.spatial import (
    HexCategoryClipper,
    LandscapeClipper,
    load_landcover_ref,
)


def candidate_cells(spec: GridSpec, bbox: tuple, res: int = 0, block_rows: int = 4096) -> Dataset:
    """Lazy Dataset of candidate (r, q) rows covering the bbox
    (/root/reference/R/generate_patches.R:89-122).  Generated in blocks
    so tessellation of a continent-sized bbox streams."""
    (r_lo, r_hi), (q_lo, q_hi) = grid.axial_range_for_bbox(*bbox, spec, res)
    n_r = r_hi - r_lo + 1
    n_q = q_hi - q_lo + 1
    total = n_r * n_q
    n_blocks = max(1, (total + block_rows - 1) // block_rows)

    def expand(batch: pd.DataFrame) -> pa.Table:
        out_r, out_q = [], []
        for blk in batch["id"]:
            lo = int(blk) * block_rows
            hi = min(lo + block_rows, total)
            idx = np.arange(lo, hi, dtype=np.int64)
            out_r.append(r_lo + idx // n_q)
            out_q.append(q_lo + idx % n_q)
        return pa.table(
            {"r": pa.array(np.concatenate(out_r)), "q": pa.array(np.concatenate(out_q))}
        )

    return ray.data.range(n_blocks, override_num_blocks=min(n_blocks, 64)).map_batches(
        expand, batch_format="pandas"
    )


def _simplify_landcover(landcover: pa.Table, keep: float) -> pa.Table:
    """Shared-arc simplify every land-cover polygon as ONE layer so
    category boundaries stay coincident (no slivers between adjacent
    cells of different categories — the M11 topology guarantee)."""
    from hexscape_ray.geom.topo import simplify_shared
    from hexscape_ray.geom.wkb import multipolygon_to_wkb, wkb_to_rings

    polys, row_of = [], []
    for i, buf in enumerate(landcover.column("wkb").to_pylist()):
        for rings in wkb_to_rings(buf):
            polys.append([np.asarray(r) for r in rings])
            row_of.append(i)
    simp = simplify_shared(polys, keep=keep)
    by_row: dict[int, list] = {}
    for rid, rings in zip(row_of, simp):
        by_row.setdefault(rid, []).append(rings)
    # .get: a row whose WKB yields no rings (empty/degenerate
    # multipolygon) must round-trip as an empty multipolygon, not KeyError
    wkbs = [multipolygon_to_wkb(by_row.get(i, [])) for i in range(len(landcover))]
    return landcover.set_column(
        landcover.column_names.index("wkb"), "wkb", pa.array(wkbs, type=pa.binary())
    )


def generate_patches(
    landscape: pa.Table,
    landcover: pa.Table | None,
    spec: GridSpec,
    res: int = 0,
    concurrency=(1, 8),
    split_parts: bool = False,
    with_geometry: bool = False,
    simplify_keep: float | None = None,
    subtract_impassable: bool = False,
) -> Dataset:
    """Hex patch table: (r, q, x, y, area, lu_sum, LU_<cat>...).

    ``landscape``: boundary table with a ``wkb`` column (the st_union
    of the reference is implicit — the actor index holds all parts).
    ``landcover``: optional table with ``wkb`` + ``category``; when
    given, LU_* fraction columns are produced (A3 semantics with the
    Σ = 1 invariant, /root/reference/R/generate_patches.R:312-355).
    ``simplify_keep``: when set, the land-cover polygons are
    simplified TOPOLOGY-PRESERVINGLY (shared-arc, geom/topo.py) before
    the per-hex clip — the reference's
    ``ms_simplify(keep=simplify_keep, keep_shapes=TRUE, method="dp")``
    on the per-category unions (:241); applied driver-side because the
    land-cover table is the broadcast small side.

    ``subtract_impassable`` (requires ``split_parts=True`` and a
    landcover table with an ``Impassable`` category): subtracts the
    impassable polygons from every clipped hex piece and re-splits —
    the reference's ``st_difference(patches, impassable)`` +
    ``st_cast(POLYGON)`` (:148-166), via the exact boolean-op scanline
    (geom/trapezoid.py).
    """
    from hexscape_ray.geom.poly import rings_bbox
    from hexscape_ray.geom.wkb import wkb_to_rings

    boxes = []
    for buf in landscape.column("wkb").to_pylist():
        for rings in wkb_to_rings(buf):
            boxes.append(rings_bbox(rings))
    boxes = np.asarray(boxes)
    bbox = (
        boxes[:, 0].min(),
        boxes[:, 1].min(),
        boxes[:, 2].max(),
        boxes[:, 3].max(),
    )

    land_ref = load_landcover_ref(
        landscape, cat_col="code" if "code" in landscape.column_names else "label"
    )
    # rename for LandscapeClipper's expected payload shape
    import ray as _ray

    land_ref2 = _ray.put({"polygons": _ray.get(land_ref)["polygons"]})

    imp_ref = None
    if subtract_impassable and landcover is not None:
        if not split_parts:
            raise ValueError("subtract_impassable requires split_parts=True")
        import pyarrow.compute as _pc

        imp = landcover.filter(_pc.equal(landcover.column("category"), "Impassable"))
        if imp.num_rows:
            flat = []
            for buf in imp.column("wkb").to_pylist():
                for rr in wkb_to_rings(buf):
                    flat.append([np.asarray(x) for x in rr])
            import ray as _ray2

            imp_ref = _ray2.put({"polygons": flat})

    cells = candidate_cells(spec, bbox, res)
    patches = cells.map_batches(
        LandscapeClipper,
        fn_constructor_args=(
            land_ref2,
            spec,
            res,
            split_parts,
            with_geometry,
            imp_ref,
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    if landcover is None:
        return patches

    if simplify_keep is not None:
        landcover = _simplify_landcover(landcover, simplify_keep)
    lc_ref = load_landcover_ref(landcover)
    cats = sorted(set(landcover.column("category").to_pylist()))
    cat_areas = patches.select_columns(["r", "q"]).map_batches(
        HexCategoryClipper,
        fn_constructor_args=(lc_ref, spec, res),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
    summed = two_phase_sum(cat_areas, ["r", "q", "category"], ["area"], count_as=None)

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        area_sum = float(g["area"].sum())
        row = {"r": g["r"].iloc[0], "q": g["q"].iloc[0], "lu_sum": area_sum}
        by = g.groupby("category")["area"].sum()
        for c in cats:
            row[f"LU_{c}"] = float(by.get(c, 0.0)) / area_sum if area_sum > 0 else 0.0
        if area_sum == 0:  # zero-coverage fallback → all Passable
            row["LU_Passable"] = 1.0  # (:337-343)
        return pd.DataFrame([row])

    lu = summed.groupby(["r", "q"]).map_groups(widen, batch_format="pandas")

    # join LU fractions back onto the patch rows (hash join on (r, q) —
    # both sides are per-hex tables, co-keyed)
    from hexscape_ray.stages.joins import bucketed_join

    def pack_key(batch: pa.Table) -> pa.Table:
        key = batch["r"].to_numpy(zero_copy_only=False) * (1 << 28) + batch[
            "q"
        ].to_numpy(zero_copy_only=False)
        return batch.append_column("hexkey", pa.array(key))

    left = patches.map_batches(pack_key, batch_format="pyarrow")
    right = lu.map_batches(pack_key, batch_format="pyarrow").drop_columns(["r", "q"])
    joined = bucketed_join(left, right, on="hexkey", n_buckets=16, how="left")
    return joined.drop_columns(["hexkey"])


def area_loss_audit(patches: Dataset, spec: GridSpec) -> Dataset:
    """A4 (/root/reference/R/generate_patches.R:283-288): per-hex
    covered-area ratio vs the full hexagon, sorted worst-first — the
    QA metric for clipping/simplification loss.  Requires ``lu_sum``
    (category-covered area) and ``area`` (in-landscape area)."""

    def audit(batch: pa.Table) -> pa.Table:
        area = batch["area"].to_numpy(zero_copy_only=False)
        lu = batch["lu_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            loss = 1.0 - np.where(area > 0, lu / area, 0.0)
        return pa.table(
            {
                "r": batch["r"],
                "q": batch["q"],
                "area": batch["area"],
                "covered": batch["lu_sum"],
                "loss": pa.array(loss),
            }
        )

    return patches.map_batches(audit, batch_format="pyarrow").sort(
        "loss", descending=True
    )


def index_patches(patches: Dataset) -> Dataset:
    """Deterministic dense Index after arrange(q, r)
    (/root/reference/R/generate_patches.R:188-202).  A global sort +
    zip-with-index — inherently ordered, kept as a separate opt-in step
    (the stable key (r, q) itself is what downstream shuffles use)."""
    # The per-hex table is small at any input scale (bounded by the
    # landscape, not the corpus), so the ordered dense index is built
    # driver-side; the stable key (r, q) is what big shuffles use.
    pdf = patches.to_pandas().sort_values(["q", "r"], ignore_index=True)
    pdf.insert(0, "Index", np.arange(1, len(pdf) + 1, dtype=np.int64))
    return ray.data.from_pandas(pdf)


def generate_neighbours(
    patches: Dataset,
    landscape: pa.Table,
    spec: GridSpec,
    res: int = 0,
) -> Dataset:
    """Edge table (r, q, nb_r, nb_q, Border, Direction, nb_area).

    Pure axial math for candidates (J3), complete-area shortcut
    (Border = hex_side), exact edge-in-landscape length otherwise;
    Border > min_prop·hex_side filter; reference direction factor
    (/root/reference/R/generate_neighbours.R:57-159).
    """
    import ray as _ray

    from hexscape_ray.geom.wkb import wkb_to_rings

    polys = []
    for buf in landscape.column("wkb").to_pylist():
        polys.extend([[np.asarray(r) for r in rings] for rings in wkb_to_rings(buf)])
    land_ref = _ray.put(polys)

    # patch attr lookup (area per (r,q)) — broadcast (per-hex table is
    # the SMALL side at any scale: #hexes ≪ #docs)
    attrs = patches.select_columns(["r", "q", "area"]).to_pandas()
    attr_ref = _ray.put(
        {(int(r), int(q)): float(a) for r, q, a in attrs.itertuples(index=False)}
    )

    complete_thresh = (1.0 - spec.min_prop) * spec.hex_area
    offsets = grid.NEIGHBOR_OFFSETS
    directions = grid.NEIGHBOR_DIRECTIONS
    s = spec.hex_side
    w = spec.width_at(res)
    h = 2.0 * w / np.sqrt(3.0)
    ss = h / 2.0

    # shared-edge endpoints per neighbour direction: the hex edge of
    # (r,q) facing each offset, from the vertex layout (genpoly,
    # /root/reference/R/generate_patches.R:53-64)
    verts = grid.hex_vertex_offsets(spec, res)  # 7 x 2 closed
    edge_for_offset = {
        (-1, 0): (5, 6),  # NW edge: (-w/2, s/2) → (0, h/2)
        (-1, 1): (0, 1),  # NE edge: (0, h/2) → (w/2, s/2)
        (0, 1): (1, 2),  # E edge: (w/2, s/2) → (w/2, -s/2)
        (1, 0): (2, 3),  # SE edge
        (1, -1): (3, 4),  # SW edge
        (0, -1): (4, 5),  # W edge
    }

    class EdgeBuilder:
        def __init__(self):
            self.polys = _ray.get(land_ref)
            self.attrs = _ray.get(attr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            q = batch["q"].to_numpy(zero_copy_only=False)
            area = batch["area"].to_numpy(zero_copy_only=False)
            cx, cy = grid.axial_to_centroid(r, q, spec, res)
            rows = {k: [] for k in ("r", "q", "nb_r", "nb_q", "Border", "Direction", "nb_area")}
            for i in range(r.shape[0]):
                for (dr, dq), dirn in zip(offsets, directions):
                    nb = (int(r[i] + dr), int(q[i] + dq))
                    nb_area = self.attrs.get(nb)
                    if nb_area is None:
                        continue  # neighbour hex doesn't exist (coastline)
                    if area[i] > complete_thresh and nb_area > complete_thresh:
                        border = s  # complete-area shortcut (:89-93)
                    else:
                        vi, vj = edge_for_offset[(int(dr), int(dq))]
                        p0 = (cx[i] + verts[vi, 0], cy[i] + verts[vi, 1])
                        p1 = (cx[i] + verts[vj, 0], cy[i] + verts[vj, 1])
                        border = segment_inside_length(p0, p1, self.polys)
                    if border > spec.min_prop * s:  # (:126-133)
                        rows["r"].append(r[i])
                        rows["q"].append(q[i])
                        rows["nb_r"].append(nb[0])
                        rows["nb_q"].append(nb[1])
                        rows["Border"].append(border)
                        rows["Direction"].append(dirn)
                        rows["nb_area"].append(nb_area)
            return pa.table(
                {
                    "r": pa.array(np.asarray(rows["r"], dtype=np.int64)),
                    "q": pa.array(np.asarray(rows["q"], dtype=np.int64)),
                    "nb_r": pa.array(np.asarray(rows["nb_r"], dtype=np.int64)),
                    "nb_q": pa.array(np.asarray(rows["nb_q"], dtype=np.int64)),
                    "Border": pa.array(np.asarray(rows["Border"], dtype=np.float64)),
                    "Direction": pa.array(rows["Direction"], type=pa.string()),
                    "nb_area": pa.array(np.asarray(rows["nb_area"], dtype=np.float64)),
                }
            )

    return patches.map_batches(
        EdgeBuilder, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8)
    )
