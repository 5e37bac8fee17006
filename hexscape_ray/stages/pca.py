"""Distributed PCA over an embedding column (list<float>).

Training-data-pipeline op (dimensionality reduction / whitening before
clustering or ANN).  Scale shape:

- ``fit_pca``: one streaming pass — each batch emits the fixed-size
  moment partials (n, Σx, Σxxᵀ; d=32 → ~8 KB per block, independent
  of corpus size); the tiny per-block partial table is reduced on the
  driver (a correct small-side step, like the per-hex tables) and the
  d×d eigendecomposition runs once.  No corpus shuffle, no second
  pass over the data.
- ``transform_pca``: projection inside ``map_batches`` with the (mean,
  components) broadcast once via ``ray.put``.

Eigenvector sign is fixed deterministically (largest-|entry| positive)
so results are reproducible across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def fit_pca(emb: Dataset, k: int, col: str = "embedding"):
    """→ (mean (d,), components (k, d), explained_var (k,))."""

    def moments(batch: pa.Table) -> pa.Table:
        X = np.asarray(
            batch[col].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
        )
        n, d = X.shape
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "sx": pa.array([X.sum(axis=0)]),
                "sxx": pa.array([(X.T @ X).ravel()]),
            }
        )

    parts = emb.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sx = np.sum(np.stack(parts["sx"].to_numpy()), axis=0)
    d = sx.shape[0]
    sxx = np.sum(np.stack(parts["sxx"].to_numpy()), axis=0).reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|x| coordinate of each component
    # is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def transform_pca(
    emb: Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    col: str = "embedding",
    out_col: str = "pc",
) -> Dataset:
    """Project each embedding onto the fitted components (list<double>
    output column of length k)."""
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    def project(batch: pa.Table) -> pa.Table:
        m, C = ray.get(ref)
        X = np.asarray(
            batch[col].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
        )
        P = (X - m[None, :]) @ C.T
        return batch.drop_columns([col]).append_column(
            out_col, pa.array(list(P))
        )

    return emb.map_batches(project, batch_format="pyarrow")
