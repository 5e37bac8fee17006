"""generate_connectedness parity (A8): weighted hex-pair kernel sums.

Reference semantics (/root/reference/R/generate_connectedness.R — the
pure-R fallback at :181-235 defines them; the Rcpp class it prefers
does not exist in-tree): for every source patch, lay a fine point grid
over the neighbourhood, look up which patch each grid point falls in,
and average a distance-kernel over the points per (Source, Target)
pair; output sparse (Source, Target, Connectedness) rows (:171-176) or
the dense square matrix (:249-265).

Ray-Data form: the kernel ring is PRECOMPUTED once (T2 state: the
(2k+1)² axial offset disk with centroid-distance kernel weights, the
analogue of the reference's grid matrix) and broadcast; each batch of
source hexes expands to (Source, Target, w) rows via vectorised offset
arithmetic — no spatial join, no shuffle until the final
``groupby(Source, Target).sum`` over partials.

``kernel_fn`` is the user-extension surface (§2.10): any vectorised
distance→weight function (default exponential decay).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from hexscape_ray import grid as hexgrid
from hexscape_ray.config import GridSpec
from hexscape_ray.stages.agg import two_phase_sum


def kernel_ring(
    spec: GridSpec,
    k: int,
    kernel_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    res: int = 0,
):
    """(dr, dq, w) arrays for the axial disk of radius k with kernel
    weights of the centroid distances (the T2 kernel-grid state)."""
    if kernel_fn is None:
        scale = spec.width_at(res) * k / 3.0
        kernel_fn = lambda d: np.exp(-d / scale)  # noqa: E731
    dr, dq = hexgrid.grid_disk_axial(0, 0, k)
    dr, dq = dr[0], dq[0]
    dx, dy = hexgrid.axial_to_centroid(dr, dq, spec, res)
    ox, oy = hexgrid.axial_to_centroid(np.array([0]), np.array([0]), spec, res)
    dist = np.hypot(dx - ox[0], dy - oy[0])
    return dr, dq, kernel_fn(dist)


def generate_connectedness(
    patches: Dataset,
    spec: GridSpec,
    k: int = 3,
    kernel_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    res: int = 0,
    sparse: bool = True,
    grid_resolution: int | None = None,
):
    """patches(r, q) → (src_r, src_q, dst_r, dst_q, Connectedness).

    Pairs are emitted only for existing target patches (membership via
    a broadcast key set — per-hex tables are small at any corpus
    scale); weights normalised per source to sum to 1 over the disk
    (mean-kernel semantics, :227-234).

    ``grid_resolution``: when set, reference sub-grid parity
    (/root/reference/R/generate_connectedness.R:85-102,151-176): a
    grid_resolution² point grid is laid over the kernel disk around
    each source centroid, every point kernel-weighted by its distance
    and assigned to a target, and weights aggregate per
    (source, target) — the fine-grid integral, not the centroid
    approximation.  None = centroid mode.

    Point→target assignment in sub-grid mode: when ``patches`` carries
    a ``wkb`` geometry column (``generate_patches(with_geometry=True)``)
    points are assigned by containment in the CLIPPED patch geometry —
    the reference's ``st_contains_properly(candidates, x)`` (:106-121) —
    so points over sea/sliver-dropped area contribute zero exactly as
    the reference's ``Which == -1`` points do.  Without geometry the
    ideal containing hex is used (boundary-clipped patches then get
    slightly more weight than the reference would give them).
    """
    dr, dq, w = kernel_ring(spec, k, kernel_fn, res)
    use_geometry = grid_resolution is not None and "wkb" in patches.schema().names
    keys = patches.select_columns(
        ["r", "q", "wkb"] if use_geometry else ["r", "q"]
    ).to_pandas()
    key_set = set(zip(keys["r"].astype(int), keys["q"].astype(int)))
    width = spec.width_at(res)
    if kernel_fn is None:
        scale = width * k / 3.0
        kernel_fn = lambda d: np.exp(-d / scale)  # noqa: E731

    if grid_resolution is not None:
        if grid_resolution < 2:
            # linspace(-R, R, 1) would sample the CORNER, not the centre
            raise ValueError("grid_resolution must be >= 2")
        # relative sample grid + weights are source-independent → T2
        # state computed ONCE (the reference's precomputed grid matrix)
        R = (k + 0.5) * width
        g = grid_resolution
        ax = np.linspace(-R, R, g)
        GX, GY = np.meshgrid(ax, ax, indexing="ij")
        rel = np.stack([GX.ravel(), GY.ravel()], axis=1)  # (g², 2)
        rel_w = kernel_fn(np.hypot(rel[:, 0], rel[:, 1]))
        if use_geometry:
            # flatten clipped patch polygons + (r, q) owner arrays for
            # the broadcast geometry index (per-hex tables are
            # landscape-bounded — a correct small-side broadcast)
            from hexscape_ray.geom.wkb import wkb_to_rings

            flat, own_r, own_q = [], [], []
            for rr, qq, buf in zip(keys["r"], keys["q"], keys["wkb"]):
                for rings in wkb_to_rings(buf):
                    flat.append([np.asarray(x) for x in rings])
                    own_r.append(int(rr))
                    own_q.append(int(qq))
            geoms = (
                flat,
                np.asarray(own_r, dtype=np.int64),
                np.asarray(own_q, dtype=np.int64),
            )
        else:
            geoms = None
        ring_ref = ray.put((rel, rel_w, key_set, geoms))
    else:
        ring_ref = ray.put((dr, dq, w, key_set))

    class Expand:
        def __init__(self):
            self.dr, self.dq, self.w, self.keys = ray.get(ring_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            q = batch["q"].to_numpy(zero_copy_only=False)
            n = r.shape[0]
            m = self.dr.shape[0]
            src_r = np.repeat(r, m)
            src_q = np.repeat(q, m)
            dst_r = src_r + np.tile(self.dr, n)
            dst_q = src_q + np.tile(self.dq, n)
            ww = np.tile(self.w, n)
            keep = np.fromiter(
                ((rr, qq) in self.keys for rr, qq in zip(dst_r, dst_q)),
                dtype=bool,
                count=dst_r.shape[0],
            )
            return pa.table(
                {
                    "src_r": pa.array(src_r[keep]),
                    "src_q": pa.array(src_q[keep]),
                    "dst_r": pa.array(dst_r[keep]),
                    "dst_q": pa.array(dst_q[keep]),
                    "w": pa.array(ww[keep]),
                }
            )

    class ExpandGrid:
        """Sub-grid integral: per source, g² weighted sample points
        assigned to containing patch geometry (or ideal hex when no
        geometry is available); partials via bincount."""

        def __init__(self):
            self.rel, self.rel_w, self.keys, geoms = ray.get(ring_ref)
            if geoms is not None:
                from hexscape_ray.geom.index import GeomIndex

                flat, self.own_r, self.own_q = geoms
                self.index = GeomIndex(flat)
            else:
                self.index = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            from hexscape_ray import grid as hexgrid

            r = batch["r"].to_numpy(zero_copy_only=False)
            q = batch["q"].to_numpy(zero_copy_only=False)
            cx, cy = hexgrid.axial_to_centroid(r, q, spec, res)
            out = {kk: [] for kk in ("src_r", "src_q", "dst_r", "dst_q", "w")}
            m = self.rel.shape[0]
            for i in range(r.shape[0]):
                px = cx[i] + self.rel[:, 0]
                py = cy[i] + self.rel[:, 1]
                if self.index is not None:
                    # reference parity: containment in clipped geometry;
                    # unassigned points (sea, dropped slivers) weigh 0
                    gid = self.index.assign_points(px, py)
                    hit = gid >= 0
                    tr = self.own_r[gid[hit]]
                    tq = self.own_q[gid[hit]]
                    wts = self.rel_w[hit]
                else:
                    tr, tq = hexgrid.point_to_axial(px, py, spec, res)
                    wts = self.rel_w
                # aggregate weights per target cell via unique+bincount
                key = (tr + (1 << 20)) * (1 << 22) + (tq + (1 << 20))
                uniq, inv = np.unique(key, return_inverse=True)
                sums = np.bincount(inv, weights=wts, minlength=uniq.size)
                ur = (uniq >> 22) - (1 << 20)
                uq = (uniq & ((1 << 22) - 1)) - (1 << 20)
                for j in range(uniq.size):
                    if (int(ur[j]), int(uq[j])) in self.keys:
                        out["src_r"].append(r[i])
                        out["src_q"].append(q[i])
                        out["dst_r"].append(ur[j])
                        out["dst_q"].append(uq[j])
                        out["w"].append(sums[j] / m)  # mean over grid points
            return pa.table(
                {
                    "src_r": pa.array(np.asarray(out["src_r"], dtype=np.int64)),
                    "src_q": pa.array(np.asarray(out["src_q"], dtype=np.int64)),
                    "dst_r": pa.array(np.asarray(out["dst_r"], dtype=np.int64)),
                    "dst_q": pa.array(np.asarray(out["dst_q"], dtype=np.int64)),
                    "w": pa.array(np.asarray(out["w"], dtype=np.float64)),
                }
            )

    expand_cls = ExpandGrid if grid_resolution is not None else Expand
    pairs = patches.select_columns(["r", "q"]).map_batches(
        expand_cls, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8)
    )
    summed = two_phase_sum(pairs, ["src_r", "src_q", "dst_r", "dst_q"], ["w"], count_as=None)

    def normalise(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["Connectedness"] = g["w"] / g["w"].sum()
        return g.drop(columns=["w"])

    out = summed.groupby(["src_r", "src_q"]).map_groups(normalise, batch_format="pandas")
    if sparse:
        return out
    # dense matrix for small patch sets (:249-265)
    pdf = out.to_pandas()
    ids = sorted(key_set)
    idx = {key: i for i, key in enumerate(ids)}
    M = np.zeros((len(ids), len(ids)))
    for row in pdf.itertuples(index=False):
        M[idx[(int(row.src_r), int(row.src_q))], idx[(int(row.dst_r), int(row.dst_q))]] = (
            row.Connectedness
        )
    return ids, M
