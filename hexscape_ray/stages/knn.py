"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: the exact baseline — query matrix broadcast
  once via ``ray.put``; each batch does one numpy matmul against it
  and emits its local top-k; a final small groupby keeps the global
  top-k per query.  Scales linearly in corpus size with zero shuffle
  of the corpus.
- ``ivf_topk``: the scale path — k-means-style coarse centroids
  (seeded, trained on a sample), corpus bucketed by nearest centroid
  (one groupby), queries probe only ``n_probe`` buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    return vecs / norms[:, None]


class _BatchTopK:
    """Actor: holds the normalised query matrix; per batch emits the
    batch-local top-k (query_id, vec_id, cosine) triples."""

    def __init__(self, query_ref, k: int):
        qdf = ray.get(query_ref)
        self.qids = qdf["vec_id"].to_numpy()
        self.Q = _normalize(np.asarray(qdf["embedding"].tolist(), dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        V = _normalize(
            np.asarray(batch["embedding"].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        )
        sim = self.Q @ V.T  # (nq, nb)
        k = min(self.k, sim.shape[1])
        top = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = ids[top.ravel()]
        rows_s = np.take_along_axis(sim, top, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(rows_q.astype(np.int64)),
                "vec_id": pa.array(rows_v.astype(np.int64)),
                "cosine": pa.array(rows_s),
            }
        )


def brute_force_topk(corpus: Dataset, queries: pd.DataFrame, k: int = 10) -> Dataset:
    """Global top-k per query: per-batch local top-k → tiny global merge."""
    ref = ray.put(queries)
    local = corpus.map_batches(
        _BatchTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = np.floor(g["cosine"] * 1e6 + 0.5) / 1e6  # half-up: SQL-oracle parity rule
        return g

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_centroids(sample: np.ndarray, n_centroids: int, n_iter: int = 10, seed: int = 11) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample (no sklearn)."""
    rng = np.random.default_rng(seed)
    X = _normalize(sample)
    C = X[rng.choice(X.shape[0], size=min(n_centroids, X.shape[0]), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(C.shape[0]):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(
    corpus: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int = 4,
    train_sample: int = 2048,
) -> Dataset:
    """IVF ANN: bucket corpus by nearest centroid, probe n_probe buckets
    per query.  Approximate by design; recall grows with n_probe.

    Scale defaults (round-1 verdict): ``n_centroids`` derives as √n
    (clamped [16, 65536]) so bucket population stays ~√n as the corpus
    grows, and the training sample is a seeded RANDOM sample of the
    corpus (``random_sample``), not the first rows — first-rows
    sampling is biased whenever the corpus is sorted or clustered by
    write order."""
    n = corpus.count()  # parquet-metadata count, no scan
    if n_centroids is None:
        n_centroids = int(min(65536, max(16, np.sqrt(max(n, 1)))))
    # Unbiased training sample: random_sample keeps each row i.i.d.
    # with prob `frac` — materialise ALL sampled rows (±√ variation in
    # size) and, only if oversized, take a seeded uniform subsample.
    # (A limit() on the sampled STREAM would truncate to the first
    # blocks in storage order — write-order bias; round-2 advice.)
    frac = min(1.0, (2.0 * train_sample) / max(n, 1))
    sampled = (
        corpus.random_sample(frac, seed=13).to_pandas()
        if frac < 1.0
        else corpus.to_pandas()
    )
    if len(sampled) > train_sample:
        keep = np.random.RandomState(13).choice(
            len(sampled), size=train_sample, replace=False
        )
        sampled = sampled.iloc[np.sort(keep)]
    sample = np.asarray(sampled["embedding"].tolist(), dtype=np.float64)
    C = train_centroids(sample, n_centroids)
    c_ref = ray.put(C)

    class Bucketize:
        def __init__(self):
            self.C = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(
                np.asarray(
                    batch["embedding"].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
                )
            )
            b = np.argmax(V @ self.C.T, axis=1)
            return batch.append_column("ivf_bucket", pa.array(b.astype(np.int64)))

    Q = _normalize(np.asarray(queries["embedding"].tolist(), dtype=np.float64))
    qids = queries["vec_id"].to_numpy()
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    # per-query probed-bucket membership as one dense bool LUT
    # (n_centroids × nq) — a batch row is a candidate for query q iff
    # lut[bucket(row), q]
    lut = np.zeros((C.shape[0], qids.size), dtype=bool)
    lut[probe.ravel(), np.repeat(np.arange(qids.size), probe.shape[1])] = True
    q_ref = ray.put((qids, Q, lut))

    class SearchProbed:
        """Bucketize + probe-filter + batch-local top-k fused in ONE
        stateless pass — NO corpus shuffle (the round-2 form shuffled
        every row through groupby(ivf_bucket); the candidate set, and
        therefore the result, is identical: a row only ever matters to
        queries probing its bucket, which is decidable per batch)."""

        def __init__(self):
            self.C = ray.get(c_ref)
            self.qids, self.Q, self.lut = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(
                np.asarray(
                    batch["embedding"].to_numpy(zero_copy_only=False).tolist(),
                    dtype=np.float64,
                )
            )
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            b = np.argmax(V @ self.C.T, axis=1)
            cand = self.lut[b]  # (nb, nq): candidate mask
            out_q, out_v, out_s = [], [], []
            for qi in np.flatnonzero(cand.any(axis=0)):
                rows = np.flatnonzero(cand[:, qi])
                sim = V[rows] @ self.Q[qi]
                kk = min(k, rows.size)
                top = np.argpartition(-sim, kk - 1)[:kk]
                out_q.append(np.full(kk, self.qids[qi], dtype=np.int64))
                out_v.append(ids[rows[top]].astype(np.int64))
                out_s.append(sim[top])
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "vec_id": pa.array([], type=pa.int64()),
                        "cosine": pa.array([], type=pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "vec_id": pa.array(np.concatenate(out_v)),
                    "cosine": pa.array(np.concatenate(out_s)),
                }
            )

    local = corpus.map_batches(
        SearchProbed, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = np.floor(g["cosine"] * 1e6 + 0.5) / 1e6  # half-up: SQL-oracle parity rule
        return g

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


def cosine_pairs_exact(
    corpus: Dataset,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_rows: int = 4096,
) -> Dataset:
    """EXACT embedding-cosine near-dup pairs: every unordered pair
    (a < b) with cosine ≥ ``threshold`` — the exact baseline the LSH
    path (``stages.dedup.embedding_near_dup``) approximates with
    bounded recall.

    Scale shape: the corpus is normalised into row blocks held ONCE in
    the object store (``materialize`` + ``to_arrow_refs``); the
    B(B+1)/2 block pairs fan out as a task-pool ``map_batches`` over a
    tiny pair-index Dataset, each task ONE ``(bi×d)·(bj×d)ᵀ`` numpy
    matmul with zero-copy fetches of exactly its two blocks — no
    all-to-all, no corpus reshuffle, work parallelism B².  O(n²/B²)
    per task is intrinsic to EXACT all-pairs: use this as the
    ≤10M-row baseline or as the in-bucket verifier inside LSH buckets;
    beyond that the LSH path is the answer (SURVEY: dedup family).

    Cosines are computed in float64 and emitted as half-up micro units
    (``floor(c·1e6 + 0.5)``, the repo's SQL-parity rounding rule);
    thresholding happens on the raw float64 value, matching
    ``WHERE list_cosine_similarity(...) >= t``.
    """

    def prep(batch: pa.Table) -> pa.Table:
        V = np.asarray(
            batch[emb_col].to_numpy(zero_copy_only=False).tolist(),
            dtype=np.float64,
        )
        V = _normalize(V)
        return pa.table(
            {
                "id": batch[id_col].cast(pa.int64()),
                "v": pa.array(list(V)),
            }
        )

    mat = corpus.map_batches(
        prep, batch_format="pyarrow", batch_size=block_rows
    ).materialize()
    refs = mat.to_arrow_refs()
    nb = len(refs)
    pairs = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    class PairTask:
        def __init__(self, refs):
            self.refs = refs
            self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def _block(self, i: int):
            if i not in self.cache:
                t = ray.get(self.refs[i])
                ids = t["id"].to_numpy(zero_copy_only=False)
                V = np.asarray(t["v"].to_numpy(zero_copy_only=False).tolist())
                self.cache[i] = (ids, V)
            return self.cache[i]

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_m = [], [], []
            for i, j in zip(
                batch["i"].to_numpy(zero_copy_only=False),
                batch["j"].to_numpy(zero_copy_only=False),
            ):
                aid, A = self._block(int(i))
                bid, B = self._block(int(j))
                sim = A @ B.T
                ii, jj = np.nonzero(sim >= threshold)
                if i == j:  # one triangle within a block (any threshold sign)
                    keep = ii < jj
                    ii, jj = ii[keep], jj[keep]
                if ii.size == 0:
                    continue
                a, b = aid[ii], bid[jj]
                swap = a > b  # cross-block order is by id, not block index
                a2 = np.where(swap, b, a)
                b2 = np.where(swap, a, b)
                out_a.append(a2)
                out_b.append(b2)
                out_m.append(
                    np.floor(sim[ii, jj] * 1e6 + 0.5).astype(np.int64)
                )
            if not out_a:
                return pa.table(
                    {
                        "a": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "cos_micro": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                    "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                    "cos_micro": pa.array(np.concatenate(out_m)),
                }
            )

    return ray.data.from_items(pairs).map_batches(
        PairTask,
        fn_constructor_args=(refs,),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=(1, 8),
    )


def kmeans_distributed(
    ds: Dataset,
    k: int = 8,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> tuple[np.ndarray, Dataset]:
    """Full-corpus distributed spherical Lloyd's k-means (the clustering
    tier behind IVF's sample-trained ``train_centroids``): every
    iteration is ONE streaming ``map_batches`` pass that emits k partial
    moment rows per block — (cluster, count, Σvec) — so the driver only
    ever touches k·n_blocks tiny rows per iteration; the corpus itself
    never moves and is read via a materialized normalised projection.

    Init is a seeded HASH-MIN sample: the k corpus rows with the
    smallest ``splitmix64(id ^ seed)`` — deterministic under any
    partitioning/storage order (the round-2 IVF lesson: ``limit()`` on
    a sampled stream is storage-order biased).

    Returns ``(centroids, assignments)`` where assignments is a Dataset
    of (id, cluster, cos) from a final streaming pass.  Cosine/spherical
    variant: rows and centroids are L2-normalised, assignment is argmax
    dot (ties → lowest cluster id, numpy argmax semantics).
    """
    from hexscape_ray.functions.hashing import splitmix64

    def project(batch: pa.Table) -> pa.Table:
        X = np.asarray(
            batch[vec_col].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
        )
        Xn = _normalize(X)
        return pa.table(
            {
                id_col: batch[id_col],
                "__v": pa.array(list(Xn)),
            }
        )

    # one materialized normalised copy: every iteration re-reads THIS,
    # not the raw parquet + normalise chain (lazy Datasets recompute per
    # consumer — the measured round-2 two-consumer trap)
    vecs = ds.map_batches(project, batch_format="pyarrow").materialize()

    def hashmin_init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids ^ np.uint64(seed))
        take = np.argsort(h)[:k]  # batch-local candidates
        return pa.table(
            {
                "__h": pa.array(h[take].astype(np.int64)),
                "__v": batch["__v"].take(pa.array(take)),
            }
        )

    cand = vecs.map_batches(hashmin_init, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values("__h", kind="stable").head(k)
    C = _normalize(np.asarray(cand["__v"].tolist(), dtype=np.float64))

    # TWO-TIER like graph.pagerank: below ``local_rows`` vectors the
    # whole Lloyd loop runs in ONE remote task over the plasma-resident
    # blocks — 8 iterations × a streaming-pass constant (~0.4 s each on
    # this box) would dominate a small corpus.  Float summation order
    # differs from the per-block partial path, so cluster LABELS can
    # differ between tiers — already true across partitionings (see
    # semantic_dedup's docstring); keep decisions remain stable.
    local_rows = int(os.environ.get("HEXRAY_KMEANS_LOCAL_ROWS", "131072"))
    if vecs.count() <= local_rows:
        refs = vecs.to_arrow_refs()

        @ray.remote
        def lloyd_all(C0: np.ndarray, *blocks: pa.Table):
            t = pa.concat_tables(blocks)
            X = np.asarray(t["__v"].to_numpy(zero_copy_only=False).tolist())
            Cl = C0.copy()
            for _ in range(n_iter):
                assign = np.argmax(X @ Cl.T, axis=1)
                sums = np.zeros_like(Cl)
                np.add.at(sums, assign, X)
                cnt = np.bincount(assign, minlength=Cl.shape[0]).astype(np.int64)
                nonempty = cnt > 0
                Cl[nonempty] = _normalize(sums[nonempty] / cnt[nonempty, None])
            dots = X @ Cl.T
            a = np.argmax(dots, axis=1)
            at = pa.table(
                {
                    id_col: t[id_col],
                    "cluster": pa.array(a.astype(np.int64)),
                    "cos": pa.array(dots[np.arange(a.size), a]),
                }
            )
            return Cl, at

        C_final, at = ray.get(lloyd_all.remote(C, *refs))
        return C_final, ray.data.from_arrow(at)

    def partials_fn(cref):
        def fn(batch: pa.Table) -> pa.Table:
            Cm = ray.get(cref)
            X = np.asarray(batch["__v"].to_numpy(zero_copy_only=False).tolist())
            assign = np.argmax(X @ Cm.T, axis=1)
            sums = np.zeros((Cm.shape[0], X.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, X)
            cnt = np.bincount(assign, minlength=Cm.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(Cm.shape[0], dtype=np.int64)),
                    "n": pa.array(cnt),
                    "sum": pa.array(list(sums)),
                }
            )

        return fn

    for _ in range(n_iter):
        cref = ray.put(C)
        parts = vecs.map_batches(
            partials_fn(cref), batch_format="pyarrow"
        ).to_pandas()  # k rows per block — tiny
        agg_n = np.zeros(k, dtype=np.int64)
        agg_s = np.zeros_like(C)
        for cl, n_, s_ in zip(parts["cluster"], parts["n"], parts["sum"]):
            agg_n[cl] += n_
            agg_s[cl] += np.asarray(s_)
        nonempty = agg_n > 0
        C[nonempty] = _normalize(agg_s[nonempty] / agg_n[nonempty, None])

    cref = ray.put(C)

    def assign_fn(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        X = np.asarray(batch["__v"].to_numpy(zero_copy_only=False).tolist())
        dots = X @ Cm.T
        a = np.argmax(dots, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int64)),
                "cos": pa.array(dots[np.arange(a.size), a]),
            }
        )

    return C, vecs.map_batches(assign_fn, batch_format="pyarrow")


def pq_train(
    sample: np.ndarray, m: int = 8, k_centroids: int = 16, n_iter: int = 12, seed: int = 19
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI'11): split
    the (normalised) vector into ``m`` subspaces and run seeded Lloyd
    k-means with ``k_centroids`` centroids in EACH subspace
    independently.  Returns (m, k_centroids, d/m) float64.  Driver-side
    on a bounded sample — the codebook is tiny (m·k·d/m = k·d floats)
    and broadcasts via ``ray.put``."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    ds = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(k_centroids, n), ds))
    for s in range(m):
        Xs = X[:, s * ds : (s + 1) * ds]
        C = Xs[rng.choice(n, size=min(k_centroids, n), replace=False)].copy()
        for _ in range(n_iter):
            # L2 assignment: argmin ||x - c||² = argmax (x·c - ½||c||²)
            scores = Xs @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
            assign = np.argmax(scores, axis=1)
            for j in range(C.shape[0]):
                mask = assign == j
                if mask.any():
                    C[j] = Xs[mask].mean(axis=0)
        books[s] = C
    return books


def pq_encode(
    corpus: Dataset, books_ref, id_col: str = "vec_id", keep_embedding: bool = False
) -> Dataset:
    """Encode every vector to m uint8 centroid ids (one broadcast read
    of the codebooks per task, one matmul per subspace per batch) —
    the 100-TB memory path: 64-dim float32 vectors (256 B) compress to
    m bytes, so a billion-vector index fits a few workers' heaps.
    ``keep_embedding`` carries the original vector through for the
    in-stream exact-rerank path."""

    def enc(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        mm, kk, ds = books.shape
        X = _normalize(
            np.asarray(batch["embedding"].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        )
        codes = np.empty((len(batch), mm), dtype=np.uint8)
        for s in range(mm):
            Xs = X[:, s * ds : (s + 1) * ds]
            scores = Xs @ books[s].T - 0.5 * (books[s] * books[s]).sum(axis=1)[None, :]
            codes[:, s] = np.argmax(scores, axis=1)
        cols = {
            id_col: batch[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), mm
            ),
        }
        if keep_embedding:
            cols["embedding"] = batch["embedding"]
        return pa.table(cols)

    return corpus.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    corpus: Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    m: int = 8,
    k_centroids: int = 16,
    train_sample: int = 4096,
    seed: int = 19,
    rerank: int = 4,
) -> Dataset:
    """Approximate top-k per query via PQ asymmetric distance (ADC)
    with in-stream exact rerank — the classic two-tier scan: train
    codebooks on a seeded random sample, encode the corpus to m-byte
    codes, score every row with one LUT gather (query × subspace
    distance tables are (nq, m, k) floats computed once per task),
    PRUNE to the batch-local ADC top ``rerank·k``, exact-cosine only
    those pruned rows, then a tiny global merge keeps the true top-k
    of the candidates.  ADC ranks coarsely inside tight clusters (all
    members share codes) — the rerank restores fine order while the
    LUT keeps the full-batch scan O(nb·m) instead of O(nb·d).
    ``rerank=0`` gives the pure code-only scan (originals never
    touched — the persisted-codes / repeated-query mode)."""
    n = corpus.count()
    frac = min(1.0, train_sample / max(n, 1))
    samp = corpus.random_sample(frac, seed=seed).to_pandas()
    sample = np.asarray(samp["embedding"].tolist(), dtype=np.float64)
    books = pq_train(sample, m=m, k_centroids=k_centroids, seed=seed)
    books_ref = ray.put(books)
    codes = pq_encode(corpus, books_ref, keep_embedding=rerank > 0)

    qids = queries["vec_id"].to_numpy()
    Q = _normalize(np.asarray(queries["embedding"].tolist(), dtype=np.float64))
    mm, kk, ds = books.shape
    # ADC tables: squared L2 from each query subvector to each centroid
    tabs = np.empty((Q.shape[0], mm, kk))
    for s in range(mm):
        Qs = Q[:, s * ds : (s + 1) * ds]
        diff = Qs[:, None, :] - books[s][None, :, :]
        tabs[:, s, :] = (diff * diff).sum(axis=2)
    tabs_ref = ray.put(tabs)
    qids_ref = ray.put(qids)
    q_ref = ray.put(Q)

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # an empty block would make argpartition
            return pa.table(  # raise on a zero-width axis
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        T = ray.get(tabs_ref)
        qi = ray.get(qids_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        C = np.asarray(batch["pq_code"].to_numpy(zero_copy_only=False).tolist(), dtype=np.int64)
        nb = C.shape[0]
        # dist[q, row] = Σ_s T[q, s, C[row, s]] — one gather, no matmul
        flat = (np.arange(T.shape[1]) * T.shape[2])[None, :] + C  # (nb, m)
        Tq = T.reshape(T.shape[0], -1)
        d = Tq[:, flat.reshape(-1)].reshape(T.shape[0], nb, T.shape[1]).sum(axis=2)
        kq = min(max(rerank, 1) * k, nb)
        top = np.argpartition(d, kq - 1, axis=1)[:, :kq]
        out_q = np.repeat(qi, kq)
        out_v = ids[top.ravel()]
        if rerank > 0:  # exact cosine on the pruned rows only
            Qm = ray.get(q_ref)
            X = _normalize(
                np.asarray(
                    batch["embedding"].to_numpy(zero_copy_only=False).tolist(),
                    dtype=np.float64,
                )
            )
            cand = X[top.ravel()]  # (nq·kq, d)
            qrep = np.repeat(np.arange(Qm.shape[0]), kq)
            out_s = (cand * Qm[qrep]).sum(axis=1)
        else:  # code-only: report negated ADC distance as the score
            out_s = -np.take_along_axis(d, top, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q.astype(np.int64)),
                "vec_id": pa.array(out_v.astype(np.int64)),
                "score": pa.array(out_s),
            }
        )

    local = codes.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return g.reset_index(drop=True)

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


def quantize_embeddings_int8(
    emb: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Symmetric per-vector INT8 quantisation of an embedding column —
    the storage/serving compression step of an embedding pipeline
    (4× smaller than float32, 8× smaller than the float64 on disk):
    ``scale = max|x|``, ``q_i = floor(x_i·127/scale + 0.5)`` (half-up,
    the SQL-mirrorable rounding; q ∈ [-127, 127], so int8 with no
    −128 edge case).  Zero vectors quantise to all-zero codes with
    scale 0.

    Output rows carry the codes (``list<int8>``) for downstream use
    plus an integer summary that is hash-exact under any partitioning
    (per-element rounding then integer sums — no float reduction):
    ``scale_pml = floor(1e6·scale + 0.5)``, ``sum_q``, ``sum_abs_q``,
    and ``n_sat`` (elements at ±127).
    """

    def quant(batch: pa.Table) -> pa.Table:
        X = np.asarray(
            batch[vec_col].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
        )
        if X.ndim == 1:  # empty batch
            X = X.reshape(0, 0)
        scale = np.abs(X).max(axis=1) if X.shape[1] else np.zeros(len(batch))
        safe = np.where(scale > 0, scale, 1.0)
        q = np.floor(X * 127.0 / safe[:, None] + 0.5).astype(np.int64)
        q[scale == 0] = 0
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(q.astype(np.int8).ravel()), X.shape[1]
                )
                if X.shape[1]
                else pa.nulls(len(batch), pa.list_(pa.int8())),
                "scale_pml": pa.array(
                    np.floor(1e6 * scale + 0.5).astype(np.int64)
                ),
                "sum_q": pa.array(q.sum(axis=1)),
                "sum_abs_q": pa.array(np.abs(q).sum(axis=1)),
                "n_sat": pa.array(
                    (np.abs(q) == 127).sum(axis=1).astype(np.int64)
                ),
            }
        )

    return emb.map_batches(quant, batch_format="pyarrow")


def jl_project(
    ds,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Johnson–Lindenstrauss-style dense projection of an embedding
    column against a DETERMINISTIC plane matrix
    ``P[j,d] = (((j·131 + d·137) mod 1009) − 504) / 504`` — a fixed
    pseudo-random matrix whose closed form is SQL-expressible, so the
    whole linear-algebra stage carries a hash-exact oracle.

    Float-parity discipline (working-notes rule): each scalar product
    term is micro-rounded to an int64 (floor(1e6·v·p + 0.5)) and the
    PROJECTION is the integer sum of terms — order-invariant, so Ray's
    block order and DuckDB's unnest order can't diverge.  Per batch
    one (n,k,d) broadcast multiply in the fast direction (big operand
    first); no shuffle, planes are a compile-time constant."""

    def proj(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "j": pa.array([], type=pa.int64()),
                    "proj_pml": pa.array([], type=pa.int64()),
                }
            )
        E = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        d = E.shape[1]
        jj = np.arange(k, dtype=np.int64)[:, None]
        dd = np.arange(d, dtype=np.int64)[None, :]
        P = ((jj * 131 + dd * 137) % 1009 - 504) / 504.0
        terms = np.floor(1e6 * (E[:, None, :] * P[None, :, :]) + 0.5).astype(
            np.int64
        )
        proj_pml = terms.sum(axis=2)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids.astype(np.int64), k)),
                "j": pa.array(np.tile(jj.ravel(), n)),
                "proj_pml": pa.array(proj_pml.ravel()),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")
