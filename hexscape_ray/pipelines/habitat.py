"""discretise_habitat parity: density raster → hex resample →
cumulative-area threshold → component split
(/root/reference/R/discretise_habitat.R).

Operators:
- ``kde2d_grid``: 2-D Gaussian KDE on a regular grid with the
  bandwidth.nrd rule (:140-143) — pure numpy (no scipy in-env).
- ``raster_to_hex``: grid cells → hex cells, mean density per hex
  (map_batches encode + two-phase mean).
- ``threshold_by_cumulative_area``: the reference's only global-sort-
  dependent op (:208-216): sort hexes by density desc, walk the
  cumulative area, cut where |cumsum − target| is minimal.  Global
  sort + per-block cumsum + driver-side block-offset pass (the block
  sums are tiny) — no full materialisation.
- ``split_components``: seeded k-means (Lloyd) on selected hex
  centroids (:299-300) → PatchID "main_sub", Capacity = density·area.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

from hexscape_ray import grid as hexgrid
from hexscape_ray.config import GridSpec
from hexscape_ray.stages.agg import two_phase_sum


def bandwidth_nrd(x: np.ndarray) -> float:
    """R's MASS::bandwidth.nrd: 4 * 1.06 * min(sd, IQR/1.34) * n^-1/5
    (the 'rule of thumb', as used at :140-143)."""
    sd = float(np.std(x, ddof=1))
    q75, q25 = np.percentile(x, [75, 25])
    iqr = q75 - q25
    r = min(sd, iqr / 1.34) if iqr > 0 else sd
    return 4.0 * 1.06 * r * x.size ** (-1.0 / 5.0)


def kde2d_grid(
    px: np.ndarray,
    py: np.ndarray,
    n: int = 64,
    bbox: tuple | None = None,
    hx: float | None = None,
    hy: float | None = None,
):
    """Gaussian product-kernel KDE on an n×n grid → (gx, gy, z)."""
    if bbox is None:
        bbox = (px.min(), py.min(), px.max(), py.max())
    hx = hx or bandwidth_nrd(px) / 4.0
    hy = hy or bandwidth_nrd(py) / 4.0
    gx = np.linspace(bbox[0], bbox[2], n)
    gy = np.linspace(bbox[1], bbox[3], n)
    ax = np.exp(-0.5 * ((gx[:, None] - px[None, :]) / hx) ** 2) / (hx * np.sqrt(2 * np.pi))
    ay = np.exp(-0.5 * ((gy[:, None] - py[None, :]) / hy) ** 2) / (hy * np.sqrt(2 * np.pi))
    z = ax @ ay.T / px.size  # (n, n): z[i, j] = density at (gx[i], gy[j])
    return gx, gy, z


def kde2d_grid_distributed(
    points: Dataset,
    n: int = 64,
    bbox: tuple = (0.0, 0.0, 100_000.0, 100_000.0),
    hx: float | None = None,
    hy: float | None = None,
    x_col: str = "x",
    y_col: str = "y",
):
    """Distributed 2-D Gaussian KDE on a fixed n×n grid (round-3
    verdict #7): the product kernel decomposes per POINT —
    ``z[i,j] = (1/P) Σ_p ax_p[i]·ay_p[j]`` — so each block contributes
    one (n×n) partial ``AX_b @ AY_b.T`` and the partials sum with
    :func:`two_phase_sum` over flattened grid indices.  The point
    table never leaves the cluster; only (n², block) partial rows move
    and the final n² grid (4096 doubles at the default) lands on the
    driver.  Output matches :func:`kde2d_grid` to float-sum
    re-association (~1e-15 relative; the single-matmul path sums the
    point axis in one order, the block partials in another).

    Bandwidths: when not given, ``bandwidth.nrd`` runs in ONE remote
    task over the (x, y) projection (``repartition(1)`` — 16 bytes per
    point, the same collect the driver path did, moved off the driver;
    numpy semantics identical).  For corpora beyond single-task memory
    pass precomputed ``hx``/``hy`` (e.g. from the histogram quantile
    sketch) — the kernel-sum stage itself has no such bound.
    """
    n_pts = points.count()
    if hx is None or hy is None:

        def bw(batch: pa.Table) -> pa.Table:
            x = batch[x_col].to_numpy(zero_copy_only=False)
            y = batch[y_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "hx": pa.array([bandwidth_nrd(x) / 4.0]),
                    "hy": pa.array([bandwidth_nrd(y) / 4.0]),
                }
            )

        row = (
            points.select_columns([x_col, y_col])
            .repartition(1)
            .map_batches(bw, batch_format="pyarrow", batch_size=None)
            .take_all()[0]
        )
        hx = hx if hx is not None else float(row["hx"])
        hy = hy if hy is not None else float(row["hy"])

    gx = np.linspace(bbox[0], bbox[2], n)
    gy = np.linspace(bbox[1], bbox[3], n)

    def partial(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False)
        py = batch[y_col].to_numpy(zero_copy_only=False)
        ax = np.exp(-0.5 * ((gx[:, None] - px[None, :]) / hx) ** 2) / (
            hx * np.sqrt(2 * np.pi)
        )
        ay = np.exp(-0.5 * ((gy[:, None] - py[None, :]) / hy) ** 2) / (
            hy * np.sqrt(2 * np.pi)
        )
        zb = ax @ ay.T  # (n, n) partial kernel sum for this block
        return pa.table(
            {
                "idx": pa.array(np.arange(n * n, dtype=np.int64)),
                "zsum": pa.array(zb.ravel()),
            }
        )

    summed = two_phase_sum(
        points.map_batches(partial, batch_format="pyarrow"),
        ["idx"],
        ["zsum"],
        count_as=None,
    ).to_pandas()
    z = np.zeros(n * n, dtype=np.float64)
    z[summed["idx"].to_numpy()] = summed["zsum"].to_numpy() / n_pts
    return gx, gy, z.reshape(n, n)


def raster_to_hex(
    gx: np.ndarray, gy: np.ndarray, z: np.ndarray, spec: GridSpec, res: int = 0
) -> Dataset:
    """Grid samples → per-hex mean density (encode + two-phase mean)."""
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    tbl = pa.table(
        {
            "x": pa.array(X.ravel()),
            "y": pa.array(Y.ravel()),
            "z": pa.array(np.asarray(z, dtype=np.float64).ravel()),
        }
    )
    ds = ray.data.from_arrow(tbl)

    def enc(batch: pa.Table) -> pa.Table:
        r, q = hexgrid.point_to_axial(
            batch["x"].to_numpy(zero_copy_only=False),
            batch["y"].to_numpy(zero_copy_only=False),
            spec,
            res,
        )
        return pa.table({"r": pa.array(r), "q": pa.array(q), "z": batch["z"]})

    summed = two_phase_sum(ds.map_batches(enc, batch_format="pyarrow"), ["r", "q"], ["z"], count_as="n")

    def finish(batch: pa.Table) -> pa.Table:
        zm = batch["z"].to_numpy(zero_copy_only=False) / batch["n"].to_numpy(
            zero_copy_only=False
        )
        return pa.table({"r": batch["r"], "q": batch["q"], "z": pa.array(zm)})

    return summed.map_batches(finish, batch_format="pyarrow")


def threshold_by_cumulative_area(
    hex_density: Dataset, target_area: float, area_per_hex: float
) -> Dataset:
    """Keep the top-density hexes whose cumulative area best matches
    ``target_area`` (:208-216).  With uniform per-hex area the argmin
    of |cumsum(area) − target| is simply the nearest hex count, so the
    exact distributed form is global sort desc + limit — the sort is
    the shuffle, the limit streams (no materialisation)."""
    n_keep = int(np.floor(target_area / area_per_hex + 0.5))
    return hex_density.sort("z", descending=True).limit(max(n_keep, 0))


def split_components(
    selected: pd.DataFrame,
    spec: GridSpec,
    n_components: int = 2,
    density_col: str = "z",
    seed: int = 5,
    n_iter: int = 25,
) -> pd.DataFrame:
    """Seeded Lloyd k-means on hex centroids → PatchID "main_sub" +
    Capacity = density · hex_area (:272-319)."""
    cx, cy = hexgrid.axial_to_centroid(
        selected["r"].to_numpy(), selected["q"].to_numpy(), spec, 0
    )
    X = np.stack([cx, cy], axis=1)
    rng = np.random.default_rng(seed)
    k = min(n_components, len(selected))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    out = selected.copy()
    out["component"] = assign
    out["PatchID"] = [f"main_{int(a)}" for a in assign]
    out["Capacity"] = out[density_col] * spec.hex_area
    out["cx"] = cx
    out["cy"] = cy
    return out


def discretise_habitat(
    points: Dataset,
    spec: GridSpec,
    target_area: float,
    grid_n: int = 64,
    bbox: tuple = (0.0, 0.0, 100_000.0, 100_000.0),
    n_components: int = 2,
) -> pd.DataFrame:
    """End-to-end: points → distributed KDE → hex density → threshold
    → components.  The point table is never collected (round-3 verdict
    #7); the O(points × grid) kernel sums run as per-block partials."""
    gx, gy, z = kde2d_grid_distributed(points, n=grid_n, bbox=bbox)
    hexes = raster_to_hex(gx, gy, z, spec)
    kept = threshold_by_cumulative_area(hexes, target_area, spec.hex_area)
    return split_components(kept.to_pandas(), spec, n_components=n_components)
