"""Model-based quality classification: distributed logistic
regression over an embedding column — the fasttext-style "quality
classifier" step of LLM curation pipelines (train on labelled
examples, score the corpus), rebuilt as full-batch gradient descent
whose per-iteration corpus pass is a map_batches partial-gradient
stage + the engine's two-phase combine.

Scale shape: per block the gradient contribution X_bᵀ(σ(X_b w) − y_b)
reduces to ONE (d+1)-row partial — the exchange never carries rows,
only (feature_idx, partial) pairs, exactly the habitat-KDE moment
pattern (pipelines/habitat.py:116-134).  The weight vector is
broadcast per iteration via ray.put; the input Dataset is re-streamed
per iteration rather than materialised (at corpus scale the re-read is
the memory-safe choice; iterations are few and fixed).

Reference parity: n/a — the reference has no ML ops; graft scope
(SURVEY §2 beyond-reference list).  Determinism: full-batch GD with
fixed iterations/step; block partials combine in materialised block
order, so a given partitioning reproduces bit-identically (cross-
partitioning agreement is up to float summation order — documented,
tested with allclose).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def train_logreg(
    ds: Dataset,
    dim: int,
    vec_col: str = "embedding",
    label_col: str = "label",
    positive=0,
    iters: int = 25,
    lr: float = 2.0,
    l2: float = 1e-3,
    pos_weight: float = 1.0,
) -> np.ndarray:
    """Binary logistic regression (y = label == positive) by full-batch
    gradient descent; returns weights (dim) + bias as one (dim+1)
    float64 vector.  ``pos_weight`` scales the positive-class error
    (set ≈ n_neg/n_pos for imbalanced curation labels — the standard
    class-weighted cross-entropy)."""
    import ray

    from hexscape_ray.stages.agg import two_phase_sum

    n_total = ds.count()
    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        wref = ray.put(w)

        def grad(batch: pa.Table) -> pa.Table:
            wv = ray.get(wref)
            X = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            y = (
                batch[label_col].to_numpy(zero_copy_only=False) == positive
            ).astype(np.float64)
            if len(y) == 0:
                return pa.table(
                    {
                        "j": pa.array([], type=pa.int64()),
                        "g": pa.array([], type=pa.float64()),
                    }
                )
            z = X @ wv[:dim] + wv[dim]
            p = 1.0 / (1.0 + np.exp(-z))
            e = (p - y) * np.where(y == 1.0, pos_weight, 1.0)
            g = np.concatenate([X.T @ e, [e.sum()]])
            return pa.table(
                {
                    "j": pa.array(np.arange(dim + 1, dtype=np.int64)),
                    "g": pa.array(g),
                }
            )

        partials = two_phase_sum(
            ds.map_batches(grad, batch_format="pyarrow"),
            ["j"],
            ["g"],
            count_as=None,
        ).to_pandas()
        gvec = np.zeros(dim + 1, dtype=np.float64)
        gvec[partials["j"].to_numpy()] = partials["g"].to_numpy()
        reg = np.concatenate([w[:dim], [0.0]])  # bias unregularised
        w = w - lr * (gvec / n_total + l2 * reg)
    return w


def score_logreg(
    ds: Dataset,
    w: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> Dataset:
    """Apply trained weights to every row: (id, label, score_pml,
    pred) with score_pml = floor(1e6·σ(x·w + b) + 0.5) — the corpus-
    scoring pass of the curation pipeline (stateless, broadcast w)."""
    import ray

    dim = len(w) - 1
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(wref)
        X = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    label_col: pa.array([], type=pa.int64()),
                    "score_pml": pa.array([], type=pa.int64()),
                    "pred": pa.array([], type=pa.bool_()),
                }
            )
        z = X @ wv[:dim] + wv[dim]
        p = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                id_col: batch[id_col],
                label_col: pa.array(
                    batch[label_col]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "score_pml": pa.array(
                    np.floor(1e6 * p + 0.5).astype(np.int64)
                ),
                "pred": pa.array(p >= 0.5),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
