"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

The reference has no dedup (SURVEY §2.7); the engine needs it both for
the byte-identical-text-per-url guarantee (url-exact) and as a
first-class training-data op.  All stages follow the sketch pattern:
vectorised signature computation in ``map_batches`` → explode to
(bucket, doc) rows → ``groupby(bucket)`` → candidate pairs → verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from hexscape_ray.functions.hashing import fnv1a_64_str_array, splitmix64
from hexscape_ray.functions.text import shingles

N_PERM = 64  # minhash permutations
N_BANDS = 16  # → 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS


def exact_dedup(ds: Dataset, key_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep the min-id row per identical key: hash-partition groupby on
    a content-hash column (groups stay tiny; no skew)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = fnv1a_64_str_array(batch[key_col].to_pylist()).astype(np.int64)
        return batch.append_column("__key_hash", pa.array(h))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return (
        hashed.groupby("__key_hash")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


def _token_hashes(text: str) -> np.ndarray:
    """Stable uint64 token hashes at C speed: crc32 of each token
    widened by splitmix64 (crc32 is zlib C code; the splitmix finaliser
    decorrelates the low 32 bits)."""
    from zlib import crc32

    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h32 = np.fromiter(
        (crc32(t.encode("utf-8")) for t in toks), dtype=np.uint64, count=len(toks)
    )
    return splitmix64(h32)


def _shingle_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """k-token rolling shingle hashes, fully vectorised: combine k
    shifted views with per-position odd multipliers + xor."""
    if th.size == 0:
        return np.zeros(1, dtype=np.uint64)
    if th.size < k:
        out = th[0]
        for j in range(1, th.size):
            out = splitmix64(out * _POS_MULT[j] ^ th[j])
        return np.atleast_1d(out)
    n = th.size - k + 1
    with np.errstate(over="ignore"):
        acc = th[:n] * _POS_MULT[0]
        for j in range(1, k):
            acc = acc ^ (th[j : j + n] * _POS_MULT[j])
    return splitmix64(acc)


_POS_MULT = splitmix64(np.arange(101, 133, dtype=np.uint64)) | np.uint64(1)


class MinHasher:
    """Per-doc 64-permutation MinHash signature over 5-token shingles.

    Permutation family derived once from splitmix64 (a·x+b over
    uint64); per doc: one vectorised (m, n_perm) min-reduce.  Token and
    shingle hashing are C-speed (crc32 + numpy) — no per-shingle
    Python (SURVEY §7: stay vectorised in the hot path).
    """

    def __init__(self, n_perm: int = N_PERM, shingle_k: int = 5):
        base = splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))
        self.a = base | np.uint64(1)  # odd multipliers
        self.b = splitmix64(base)
        self.k = shingle_k
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(_token_hashes(text), self.k)  # (m,) uint64
        with np.errstate(over="ignore"):
            vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)  # (n_perm,) uint64

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(t) for t in batch["text"].to_pylist()])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.astype(np.int64).ravel()), self.n_perm
                ),
            }
        )


def lsh_band_rows(sigs: Dataset, n_bands: int = N_BANDS) -> Dataset:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the
    LSH bucket key for the candidate groupby."""

    def explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["sig"].to_numpy(zero_copy_only=False).tolist(), dtype=np.uint64)
        n, p = sig.shape
        rpb = p // n_bands
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands = sig.reshape(n, n_bands, rpb)
        # hash each band's rows into one uint64
        bh = bands[:, :, 0]
        for j in range(1, rpb):
            bh = splitmix64(bh ^ bands[:, :, j])
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)),
                "band_hash": pa.array(bh.astype(np.int64).ravel()),
                "doc_id": pa.array(np.repeat(doc, n_bands)),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def minhash_candidate_pairs(ds: Dataset, id_col: str = "doc_id") -> Dataset:
    """documents(text) → LSH candidate pairs (a < b), deduplicated."""
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 8))
    bands = lsh_band_rows(sigs)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        a, b = np.meshgrid(ids, ids, indexing="ij")
        m = a < b
        return pd.DataFrame({"a": a[m], "b": b[m]})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands_hit"))
    )
    return cand


def verify_jaccard(
    pairs: pd.DataFrame, texts: dict, k: int = 5, threshold: float = 0.7
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (driver-side
    on the small candidate set — candidates ≪ corpus by LSH design)."""
    out = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa = set(shingles(texts[a], k).tolist())
        sb = set(shingles(texts[b], k).tolist())
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


class SimHasher:
    """64-bit SimHash over token hashes; near-dups = small Hamming
    distance.  Emits the signature plus its 4 16-bit sub-bands as
    bucket keys (docs within Hamming ≤ 3 share ≥ 1 exact band)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_sig = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = t.lower().split()
            if not toks:
                out_sig[i] = 0
                continue
            h = fnv1a_64_str_array(toks)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            vote = (2 * bits - 1).sum(axis=0)
            out_sig[i] = np.sum((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        t = pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out_sig.astype(np.int64))})
        for b in range(4):
            band = ((out_sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            t = t.append_column(f"sim_band{b}", pa.array(band))
        return t


def embedding_near_dup(
    emb: Dataset, threshold: float = 0.95, n_buckets: int = 8
) -> Dataset:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH
    bucketing + in-bucket exact cosine (scale path: bucket count grows
    with corpus; brute force only within buckets)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        rng = np.random.default_rng(7)  # fixed planes — deterministic
        planes = rng.standard_normal((vecs.shape[1], n_buckets))
        sign = (vecs @ planes > 0).astype(np.int64)
        bucket = (sign * (1 << np.arange(n_buckets, dtype=np.int64))[None, :]).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(bucket),
                "embedding": batch["embedding"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        ids = g["vec_id"].to_numpy()
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        sim = vn @ vn.T
        a, b = np.where(np.triu(sim >= threshold, k=1))
        return pd.DataFrame(
            {"a": ids[a], "b": ids[b], "cosine": np.round(sim[a, b], 6)}
        )

    return (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
