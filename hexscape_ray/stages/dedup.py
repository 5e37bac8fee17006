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
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from hexscape_ray.functions.hashing import (
    fnv1a_64_str_array,
    fnv1a_128_str_array,
    splitmix64,
)
from hexscape_ray.functions.text import shingles

N_PERM = 64  # minhash permutations
N_BANDS = 16  # → 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS

COARSE_TARGET_ROWS = 1 << 18  # ~262k exploded rows per coarse group


def coarse_width(n_rows_est: int) -> int:
    """Coarse-group count for the pair-generation shuffles, scaled so
    each group holds ~``COARSE_TARGET_ROWS`` exploded (band/gram/
    fingerprint) rows: bounded per-task memory and parallelism that
    GROWS with the corpus instead of the former fixed 64 groups
    (round-3 verdict #2 — at 10^12 docs a fixed 64 meant ~1/64th of all
    rows per task).  Same derivation as ``graph.connected_components``'s
    superstep width; floor 64 (unchanged behaviour at test scale), cap
    2^20 groups, rounded up to a power of two so the bucket key stays a
    bitmask.

    Pair OUTPUT is invariant to the width: the coarse key is a pure
    function of the fine key (gram / band hash), so every fine run
    always lands intact inside one coarse group for any modulus.
    """
    w = max(64, -(-int(n_rows_est) // COARSE_TARGET_ROWS))
    return int(min(1 << 20, 1 << (w - 1).bit_length()))


def _count_estimate(ds: Dataset) -> int:
    """Input-row estimate for :func:`coarse_width`: parquet-metadata
    only for the fresh reads every production query passes (derived
    datasets execute once — callers that already materialised can pass
    an explicit ``n_coarse`` instead)."""
    return ds.count()


def _pairs_via_groups(rows: Dataset, n_rows_est: int, pairs_block) -> Dataset:
    """Route exploded (bucketed) rows into the pair kernel, combine-
    placement-adaptively: below ``HEXRAY_SMALL_AGG_ROWS`` exploded rows
    the kernel runs over EVERYTHING in one ``repartition(1)`` remote
    task — Ray's sort-based groupby costs a ~6 s shuffle constant on
    this box regardless of volume (measured: it was 6 of the 8 s of
    the whole minhash pair stage on 5k docs), and the kernel itself is
    a lexsort over the full row set either way.  Above the threshold
    the count-scaled ``groupby('__coarse')`` co-locates fine runs as
    before.  Output identical: one group = all groups for these
    kernels (fine runs are detected inside the kernel)."""
    from hexscape_ray.stages.agg import SMALL_AGG_ROWS

    if n_rows_est <= SMALL_AGG_ROWS:

        def run_all(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(
                pairs_block(t.to_pandas()), preserve_index=False
            )

        return rows.repartition(1).map_batches(
            run_all, batch_format="pyarrow", batch_size=None
        )
    return rows.groupby("__coarse").map_groups(pairs_block, batch_format="pandas")


def exact_dedup(ds: Dataset, key_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep the min-id row per identical key, hash-partitioned on a
    content-hash column (groups stay tiny; no skew).  min and count
    both commute, so this rides the ADAPTIVE two-phase aggregate
    (per-block partials, combine placement by partial volume) instead
    of Ray's sort groupby and its ~2-3 s shuffle constant."""
    from hexscape_ray.stages.agg import two_phase_agg

    def add_hash(batch: pa.Table) -> pa.Table:
        h = fnv1a_64_str_array(batch[key_col].to_pylist()).astype(np.int64)
        return pa.table(
            {
                "__key_hash": pa.array(h),
                id_col: batch[id_col],
                "n_copies": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return two_phase_agg(
        hashed, ["__key_hash"], {id_col: "min", "n_copies": "sum"}
    ).select_columns([id_col, "n_copies"])


def _token_hashes(text: str) -> np.ndarray:
    return _token_hashes_from_tokens(text.lower().split())


def _token_hashes_from_tokens(toks: list[str]) -> np.ndarray:
    """Stable uint64 token hashes at C speed: crc32 of each token
    widened by splitmix64 (crc32 is zlib C code; the splitmix finaliser
    decorrelates the low 32 bits)."""
    from zlib import crc32

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
        with np.errstate(over="ignore"):
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

    Permutations are 32-bit affine maps a·x+b (mod 2^32) over the TOP
    32 bits of the 64-bit shingle hash: numpy has SIMD kernels for
    uint32 multiply but a ~100× slower scalar loop for uint64 — the
    entire hot cost of MinHash at corpus scale lives in that one
    dtype choice.  32-bit min-values are standard for MinHash-LSH
    (collision prob 2^-32 per shingle pair).

    Token hashes are memoised per instance (Zipf vocab ⇒ high hit
    rate; cache capped) — actor pools and task workers reuse the
    instance across batches.
    """

    def __init__(self, n_perm: int = N_PERM, shingle_k: int = 5):
        base = splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))
        self.a32 = (base | np.uint64(1)).astype(np.uint32) | np.uint32(1)
        self.b32 = splitmix64(base).astype(np.uint32)
        self.k = shingle_k
        self.n_perm = n_perm
        self._cache: dict[str, int] = {}

    def signature(self, text: str) -> np.ndarray:
        return self.signature_from_tokens(text.lower().split())

    def signature_from_tokens(self, toks: list[str]) -> np.ndarray:
        """Signature from a pre-tokenised (lowered) token list — the
        scalar reference path (bit-identical to signatures_batch)."""
        sh = _shingle_hashes(_token_hashes_from_tokens(toks), self.k)
        return self._sig_from_shingles(sh)

    def signatures_batch(self, toks_all: list[list[str]]) -> np.ndarray:
        """(n_docs, n_perm) signatures in ONE numpy pass over the whole
        batch: all token hashes flattened, shingles per doc via
        offsets, segmented min via ``np.minimum.reduceat`` — per-doc
        Python/numpy call overhead eliminated (the enrich hot path)."""
        n = len(toks_all)
        if n == 0:
            return np.empty((0, self.n_perm), dtype=np.uint32)
        flat = [t for toks in toks_all for t in toks]
        lens = np.fromiter((len(t) for t in toks_all), dtype=np.int64, count=n)
        return self.signatures_from_hashes(self._hash_tokens(flat), lens)

    def signatures_from_hashes(self, th: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Same kernel fed pre-flattened token hashes + per-doc lengths
        (the Arrow-native enrich path hands tokens over flat, so no
        nested Python lists are ever built).  Bit-identical to
        ``signatures_batch``."""
        n = lens.size

        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((n, self.n_perm), dtype=np.uint32)

        # shingles for ALL docs in one pass over the flat hash array:
        # position p starts a valid shingle iff p and p+k-1 are in the
        # same doc (doc_idx equality); short docs (len < k) fall back
        # to the scalar path (rare)
        k = self.k
        long_mask = lens >= k
        short_rows = np.flatnonzero(~long_mask)
        for i in short_rows:
            toks_h = th[starts[i] : starts[i] + lens[i]]
            sigs[i] = self._sig_from_shingles(_shingle_hashes(toks_h, k))
        long_rows = np.flatnonzero(long_mask)
        if long_rows.size == 0:
            return sigs
        N = th.size
        if N < k:
            return sigs
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        valid = doc_idx[: N - k + 1] == doc_idx[k - 1 :]
        with np.errstate(over="ignore"):
            acc = th[: N - k + 1] * _POS_MULT[0]
            for j in range(1, k):
                acc = acc ^ (th[j : N - k + 1 + j] * _POS_MULT[j])
        sh_all = splitmix64(acc[valid])  # doc-ordered shingles, long docs only
        sh_lens = (lens[long_rows] - k + 1).astype(np.int64)

        # flush in chunks; compute the affine map in (shingle, perm)
        # layout — the only broadcast direction numpy SIMD-vectorises
        # for uint32 — then transpose-copy so reduceat runs along the
        # contiguous axis.  CHUNK keeps the (chunk × n_perm) uint32
        # intermediate ~1 MB, i.e. cache-resident PER WORKER: measured
        # on this 32-core box, 4096 → 216k docs/s across 32 workers vs
        # 65536 → 55k (memory-bandwidth contention), and the identical
        # monolithic product is 35× slower than chunked even
        # single-threaded once the output outgrows cache.
        CHUNK = int(__import__("os").environ.get("HEXRAY_MINHASH_CHUNK", "4096"))
        bounds = np.concatenate([[0], np.cumsum(sh_lens)])
        sh32 = (sh_all >> np.uint64(32)).astype(np.uint32)
        # one reusable (CHUNK, n_perm) buffer + in-place ufuncs: the
        # naive `sh[:,None]*a+b` form allocates two ~1 MB temporaries
        # per chunk and the old transpose-copy another — measured 945
        # + 502 µs/chunk vs 425 µs for out=-fused affine + axis-0
        # reduceat (each reduction step is an elementwise min of two
        # contiguous 64-wide rows).  Arithmetic identical (uint32
        # wraparound mul+add), so signatures are bit-for-bit the same.
        buf = np.empty((CHUNK, self.n_perm), dtype=np.uint32)
        pos = 0  # index into long_rows
        while pos < long_rows.size:
            take = int(
                np.searchsorted(bounds, bounds[pos] + CHUNK, side="left") - pos
            )
            take = max(1, min(take, long_rows.size - pos))
            sh = sh32[bounds[pos] : bounds[pos + take]]
            if sh.size > buf.shape[0]:  # one oversized doc
                buf = np.empty((sh.size, self.n_perm), dtype=np.uint32)
            v = buf[: sh.size]
            with np.errstate(over="ignore"):
                np.multiply(sh[:, None], self.a32[None, :], out=v)
                np.add(v, self.b32[None, :], out=v)
            seg_starts = np.asarray(bounds[pos : pos + take] - bounds[pos])
            sigs[long_rows[pos : pos + take]] = np.minimum.reduceat(
                v, seg_starts, axis=0
            )
            pos += take
        return sigs

    def _sig_from_shingles(self, sh: np.ndarray) -> np.ndarray:
        sh32 = (np.asarray(sh, dtype=np.uint64) >> np.uint64(32)).astype(np.uint32)
        with np.errstate(over="ignore"):
            vals = self.a32[:, None] * sh32[None, :] + self.b32[:, None]
        return vals.min(axis=1)

    def _hash_tokens(self, flat: list[str]) -> np.ndarray:
        """Memoised token hashing (crc32 → splitmix64); the scalar
        splitmix is pure-int (numpy uint64 scalar ops are slow) and
        bit-identical to the vectorised one."""
        from zlib import crc32

        cache = self._cache
        M = 0xFFFFFFFFFFFFFFFF
        cap = len(cache) < 2_000_000

        def h_of(t: str) -> int:
            z = (crc32(t.encode("utf-8")) + 0x9E3779B97F4A7C15) & M
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
            z = ((z ^ (z >> 27)) * 0x94D1B2C31E8C671D) & M
            return z ^ (z >> 31)

        def gen():
            for t in flat:
                h = cache.get(t)
                if h is None:
                    h = h_of(t)
                    if cap:
                        cache[t] = h
                yield h

        return np.fromiter(gen(), dtype=np.uint64, count=len(flat))

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_all = [t.lower().split() for t in batch["text"].to_pylist()]
        sigs = self.signatures_batch(toks_all)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.astype(np.int64).ravel()), self.n_perm
                ),
            }
        )


def band_rows_block(batch: pa.Table, n_bands: int = N_BANDS) -> pa.Table:
    """One block of signatures → (band_id, band_hash, doc_id) rows —
    the LSH bucket key kernel, shared by the batch explode and the
    streaming router tasks."""
    sig = np.asarray(
        batch["sig"].to_numpy(zero_copy_only=False).tolist(), dtype=np.uint64
    )
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


def lsh_band_rows(sigs: Dataset, n_bands: int = N_BANDS) -> Dataset:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the
    LSH bucket key for the candidate groupby."""

    def explode(batch: pa.Table) -> pa.Table:
        return band_rows_block(batch, n_bands)

    return sigs.map_batches(explode, batch_format="pyarrow")


LSH_BUCKET_CAP = 64  # all-pairs below this; star edges above


def minhash_candidate_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    bucket_cap: int = LSH_BUCKET_CAP,
    n_coarse: int | None = None,
) -> Dataset:
    """documents(text) → LSH candidate pairs (a < b), deduplicated.

    Bucket blow-up guard: a band bucket with m ≤ ``bucket_cap`` docs
    emits the full m·(m−1)/2 clique; a larger bucket (a boilerplate
    cluster — think a 1M-page cookie banner) emits STAR edges to the
    bucket's min doc id instead, i.e. O(m) pairs.  Star edges preserve
    the connected component (every member links to the representative),
    which is what dedup clustering consumes; only the explicit pair
    list between non-representative members is dropped, and only for
    pathological buckets.
    """
    n_est = _count_estimate(ds) * N_BANDS
    if n_coarse is None:
        n_coarse = coarse_width(n_est)
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 8))
    bands = lsh_band_rows(sigs)

    # one fine group per (band_id, band_hash) would mean a pandas
    # DataFrame per LSH bucket — ~100 µs × #bands×#docs of pure group
    # overhead (measured 13 s at 5k docs).  Instead shuffle into
    # count-scaled COARSE groups by band-hash bucket and find the fine
    # runs inside each with one vectorised lexsort; only runs with ≥2
    # docs (the rare collisions) touch Python.
    mask = np.int64(n_coarse - 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        return batch.append_column("__coarse", pa.array(np.bitwise_and(bh, mask)))

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids = bid[order], bh[order], ids[order]
        new = np.empty(bid.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, bid.shape[0]))
        out_a, out_b = [], []
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            run = ids[s : s + m]  # sorted within the run by lexsort
            if m <= bucket_cap:
                i, j = np.triu_indices(int(m), 1)
                out_a.append(run[i])
                out_b.append(run[j])
            else:  # star edges to the min-id representative
                out_a.append(np.repeat(run[0], m - 1))
                out_b.append(run[1:])
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    from hexscape_ray.stages.agg import two_phase_sum

    pair_rows = _pairs_via_groups(
        bands.map_batches(add_bucket, batch_format="pyarrow"),
        n_est,
        pairs_block,
    )
    # adaptive-combine pair count instead of groupby().aggregate():
    # Ray's sort aggregate costs a ~6 s shuffle CONSTANT regardless of
    # pair volume (measured: this one call was 6 of the 8 s this stage
    # took on 5k docs / 256 pairs)
    return two_phase_sum(pair_rows, ["a", "b"], [], count_as="n_bands_hit")


def verify_jaccard(
    pairs: pd.DataFrame, texts: dict, k: int = 5, threshold: float = 0.7
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (driver-side
    on the small candidate set — candidates ≪ corpus by LSH design).

    Test-scale reference path; production uses
    :func:`verify_jaccard_distributed` (no corpus materialisation)."""
    out = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa = set(shingles(texts[a], k).tolist())
        sb = set(shingles(texts[b], k).tolist())
        j = len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


def verify_jaccard_distributed(
    cand: Dataset,
    docs: Dataset,
    k: int = 5,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> Dataset:
    """Exact shingle-Jaccard verification WITHOUT driver-side corpus
    materialisation: candidate (a, b) rows are joined back to the
    documents table twice with :func:`bucketed_join` (a-side then
    b-side), then each pair is verified inside ``map_batches`` where
    both texts are already co-located.  The documents table is never
    collected — only the candidate set (≪ corpus by LSH design) and
    its matched texts flow through the two shuffles.

    Emits (a, b, jaccard) for pairs with jaccard ≥ threshold, matching
    :func:`verify_jaccard` bit-for-bit on the same input.
    """
    from hexscape_ray.stages.joins import bucketed_join

    # candidates are ≪ corpus by LSH design and feed TWO lazy
    # consumers (each bucketed_join reads the schema AND the data);
    # materialising the small side prevents recomputing the whole
    # signature+LSH pipeline per consumer (measured 96 s → ~20 s at
    # sf0.1 together with the coarse-group pair stage)
    cand = cand.materialize()

    def project(key: str, txt: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({key: batch[id_col], txt: batch[text_col]})

        return fn

    docs_a = docs.map_batches(project("a", "__text_a"), batch_format="pyarrow")
    docs_b = docs.map_batches(project("b", "__text_b"), batch_format="pyarrow")
    joined = bucketed_join(
        bucketed_join(cand, docs_a, on="a", n_buckets=n_buckets),
        docs_b,
        on="b",
        n_buckets=n_buckets,
    )

    def jac(batch: pa.Table) -> pa.Table:
        ta = batch["__text_a"].to_pylist()
        tb = batch["__text_b"].to_pylist()
        n = len(batch)
        js = np.empty(n, dtype=np.float64)
        for i in range(n):
            sa = set(shingles(ta[i], k).tolist())
            sb = set(shingles(tb[i], k).tolist())
            js[i] = len(sa & sb) / max(len(sa | sb), 1)
        keep = pa.array(js >= threshold)
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "jaccard": pa.array(js)}
        ).filter(keep)

    return joined.map_batches(jac, batch_format="pyarrow")


def _lev_prefix_chunk(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Unit-cost Levenshtein distance for a CHUNK of string pairs,
    vectorised over the pair axis: the classic DP runs its L×L cell
    loop in Python but every cell update is a chunk-wide numpy min —
    ~µs/pair at chunk=4096 (cache-resident rows; see CLAUDE.md perf
    notes).  ``A``/``B`` are (P, L) padded codepoint matrices (any
    integer dtype), ``la``/``lb`` the true lengths; padding never
    corrupts the result
    because D[i, j] depends only on the first i/j chars and each
    pair's answer is read at its own (la, lb)."""
    P, L = A.shape
    res = np.empty(P, dtype=np.int64)
    m0 = la == 0
    res[m0] = lb[m0]
    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int32)[:, None], (L + 1, P)
    ).copy()
    cur = np.empty((L + 1, P), dtype=np.int32)
    cols = np.arange(P)
    for i in range(1, L + 1):
        cur[0] = i
        ai = A[:, i - 1]
        for j in range(1, L + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            np.minimum(prev[j] + 1, cur[j - 1] + 1, out=cur[j])
            np.minimum(cur[j], prev[j - 1] + cost, out=cur[j])
        m = la == i
        if m.any():
            res[m] = cur[lb[m], cols[m]]
        prev, cur = cur, prev
    return res


def edit_distance_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    len_col: str = "n_chars",
    prefix_len: int = 40,
    max_dist: int = 18,
    len_band: int = 16,
    chunk: int = 4096,
) -> Dataset:
    """Blocked EDIT-DISTANCE near-duplicate pairs — every same-block
    document pair with ``|len_a − len_b| ≤ len_band`` whose
    ``prefix_len``-char prefixes are within ``max_dist`` unit-cost
    Levenshtein edits.  The fuzzy-match tier between exact dedup and
    token-set Jaccard: catches small in-place edits (typo fixes,
    template counters) that shingle sets smear out.

    Scale shape — NO per-block all-pairs: each doc is routed to its
    home length band ``len // len_band`` AND the next band up (one
    ``flat_map``-style duplication, 2× rows), so every qualifying pair
    co-locates in exactly the band ``max(home_a, home_b)`` (bands of a
    qualifying pair differ by ≤1 by construction) where it is counted
    ONCE.  Within a band: length-sort + two-pointer window enumerates
    candidates, then the chunked pair-axis DP kernel
    (:func:`_lev_prefix_chunk`) scores them.  Group memory is bounded
    by band occupancy, not block size; ``len_band`` is the knob.

    Distances are BYTE-level over the utf-8 encoding of the
    CODEPOINT-sliced prefix — bit-identical to DuckDB 1.0's
    ``levenshtein(substr(text,1,L))`` on any corpus (its substr is
    codepoint-level but its levenshtein is byte-level; probed:
    ``levenshtein('é','e') = 2``).
    """

    def route(batch: pa.Table) -> pa.Table:
        ln = np.asarray(
            batch[len_col].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        home = ln // len_band
        t = pa.table(
            {
                id_col: batch[id_col],
                "__pfx": pc.utf8_slice_codeunits(batch[text_col], 0, prefix_len),
                block_col: batch[block_col],
                "__len": pa.array(ln),
                "__home": pa.array(home),
            }
        )
        up = t.set_column(
            t.column_names.index("__home"), "__home", pa.array(home + 1)
        )
        both = pa.concat_tables([t, up])
        band = both["__home"].to_numpy(zero_copy_only=False)
        key = pa.array(
            [
                f"{b}#{g}"
                for b, g in zip(both[block_col].to_pylist(), band)
            ]
        )
        return both.append_column("__band_key", key)

    def pairs(g: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        n = len(g)
        if n < 2:
            return out_empty
        band = int(g["__band_key"][0].as_py().rsplit("#", 1)[1])
        ln = np.asarray(g["__len"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        home = np.asarray(g["__home"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # the duplicated copy carries home+1; recover the true home band
        true_home = np.where(home == band, ln // len_band, home - 1)

        order = np.lexsort((ids, ln))
        ln, ids, true_home = ln[order], ids[order], true_home[order]
        pfx = g["__pfx"].take(pa.array(order))

        # two-pointer candidate window: for row j, partners i < j with
        # ln[j] - ln[i] <= len_band
        starts = np.searchsorted(ln, ln - len_band, side="left")
        cnt = np.arange(n) - starts
        j_idx = np.repeat(np.arange(n), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)])
        i_idx = np.arange(len(j_idx)) - offs[j_idx] + starts[j_idx]
        if len(j_idx) == 0:
            return out_empty
        # count each pair once, in the band max(home_a, home_b)
        keep = np.maximum(true_home[i_idx], true_home[j_idx]) == band
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        if len(j_idx) == 0:
            return out_empty

        # full utf-8 bytes of the codepoint-sliced prefix — NO byte
        # truncation (the ADVICE-r3 bug: [:prefix_len] after the
        # codepoint slice silently shortened non-ASCII prefixes).
        # DuckDB 1.0's levenshtein is BYTE-level while its substr is
        # codepoint-level (probed: levenshtein('é','e')=2), so byte DP
        # over the codepoint-sliced prefix is the bit-exact oracle
        # semantic on ANY corpus; the matrix width is the true max
        # byte length (≤ 4·prefix_len).
        bs = [s.encode("utf-8") for s in pfx.to_pylist()]
        maxb = max(len(b) for b in bs)
        enc = np.zeros((n, max(maxb, 1)), dtype=np.uint8)
        plen = np.empty(n, dtype=np.int64)
        for r, b in enumerate(bs):
            plen[r] = len(b)
            enc[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)

        da, db, dd = [], [], []
        for c0 in range(0, len(j_idx), chunk):
            ii = i_idx[c0 : c0 + chunk]
            jj = j_idx[c0 : c0 + chunk]
            dist = _lev_prefix_chunk(enc[ii], plen[ii], enc[jj], plen[jj])
            hit = dist <= max_dist
            if hit.any():
                a, b = ids[ii[hit]], ids[jj[hit]]
                da.append(np.minimum(a, b))
                db.append(np.maximum(a, b))
                dd.append(dist[hit])
        if not da:
            return out_empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(da)),
                "doc_b": pa.array(np.concatenate(db)),
                "dist": pa.array(np.concatenate(dd)),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("__band_key")
        .map_groups(pairs, batch_format="pyarrow")
    )


NGRAM_SHINGLES_PER_DOC_EST = 256  # distinct-shingle estimate for coarse_width


def ngram_jaccard_pairs_exact(
    ds: Dataset,
    n: int = 3,
    threshold: tuple[int, int] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
    n_coarse: int | None = None,
) -> Dataset:
    """EXACT word-n-gram Jaccard similarity for every document pair
    sharing at least one shingle, thresholded — the verification-tier
    dedup op (MinHash+LSH is the 100-TB candidate-generation path; this
    is the ground truth it approximates, run on a corpus slice or as a
    quality audit).

    Distributed shape: docs → distinct (shingle, id, set-size) rows →
    shuffle by a coarse shingle-hash bucket (count-scaled group width
    via :func:`coarse_width` — one pandas DataFrame per SHINGLE would
    be ~100 µs of group overhead each, the measured LSH-bucket lesson,
    while a fixed width caps parallelism) → fine runs per exact shingle
    string via factorize+lexsort inside each coarse group → pair
    emission (i<j, sizes carried along) → ``two_phase_sum`` pair-count
    combiner → |A∩B|; |A∪B| = sz_i + sz_j − |A∩B| needs no second join
    because sizes ride with every pair row.  The all-to-all only ever
    moves shingle rows and combined pair partials.

    Exactness: fine runs group by the shingle STRING (pandas factorize
    — hash-bucketed but collision-checked), not a 64-bit hash, so the
    intersection counts match SQL's ``JOIN ON a.g = b.g`` bit-for-bit.
    The threshold is a rational (num, den) compared in integers
    (``inter·den ≥ num·uni``) — no float enters until the final
    ``jac_pml = floor(1e6·inter/uni + 0.5)`` report column.

    Worst case is inherently quadratic (a shingle shared by m docs
    contributes m·(m−1)/2 pair rows — same cost the SQL oracle pays);
    unlike the LSH stage there is NO star-edge cap here because the
    contract is exactness.
    """
    from hexscape_ray.stages.agg import two_phase_sum

    num, den = threshold
    n_est = _count_estimate(ds) * NGRAM_SHINGLES_PER_DOC_EST
    if n_coarse is None:
        n_coarse = coarse_width(n_est)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_g: list[str] = []
        out_i: list[int] = []
        out_s: list[int] = []
        for i, t in zip(ids, texts):
            toks = t.split(" ")
            gs = {" ".join(toks[k : k + n]) for k in range(len(toks) - n + 1)}
            out_g.extend(gs)
            out_i.extend([i] * len(gs))
            out_s.extend([len(gs)] * len(gs))
        gh = fnv1a_64_str_array(out_g)
        return pa.table(
            {
                "g": pa.array(out_g, type=pa.string()),
                "i": pa.array(np.asarray(out_i, dtype=np.int64)),
                "sz": pa.array(np.asarray(out_s, dtype=np.int64)),
                "__coarse": pa.array(
                    (gh % np.uint64(n_coarse)).astype(np.int64)
                ),
            }
        )

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in ("i", "j", "si", "sj")}
            )
        codes, _ = pd.factorize(g["g"], sort=False)
        ids = g["i"].to_numpy()
        szs = g["sz"].to_numpy()
        order = np.lexsort((ids, codes))
        codes, ids, szs = codes[order], ids[order], szs[order]
        new = np.empty(codes.shape[0], dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, codes.shape[0]))
        cols = {"i": [], "j": [], "si": [], "sj": []}
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            ii, jj = np.triu_indices(int(m), 1)
            cols["i"].append(ids[s : s + m][ii])
            cols["j"].append(ids[s : s + m][jj])
            cols["si"].append(szs[s : s + m][ii])
            cols["sj"].append(szs[s : s + m][jj])
        if not cols["i"]:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in ("i", "j", "si", "sj")}
            )
        return pd.DataFrame({c: np.concatenate(v) for c, v in cols.items()})

    pair_rows = _pairs_via_groups(
        ds.map_batches(shingle_rows, batch_format="pyarrow"),
        n_est,
        pairs_block,
    )
    inter = two_phase_sum(pair_rows, ["i", "j", "si", "sj"], [], count_as="inter")

    def finish(batch: pa.Table) -> pa.Table:
        it = batch["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = (
            batch["si"].to_numpy(zero_copy_only=False)
            + batch["sj"].to_numpy(zero_copy_only=False)
            - it
        ).astype(np.int64)
        keep = it * den >= num * uni
        jac_pml = np.floor(1e6 * it / uni + 0.5).astype(np.int64)
        return pa.table(
            {
                "i": batch["i"],
                "j": batch["j"],
                "inter": pa.array(it),
                "uni": pa.array(uni),
                "jac_pml": pa.array(jac_pml),
            }
        ).filter(pa.array(keep))

    return inter.map_batches(finish, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash over token hashes; near-dups = small Hamming
    distance.  Emits the signature plus its 4 16-bit sub-bands as
    bucket keys (docs within Hamming ≤ 3 share ≥ 1 exact band).

    Vectorised whole-batch kernel (same flattened pattern as
    ``MinHasher.signatures_batch``): one fnv1a pass over every token in
    the batch, bit-unpack via ``np.unpackbits``, per-doc bit sums via
    ``np.add.reduceat`` in doc-aligned chunks sized so the (tokens × 64)
    int32 intermediate stays ~1 MB (cache-resident per worker).  The
    per-bit vote is ``2·popcount − n_tokens`` so only bit SUMS are
    segmented, and the result is bit-identical to the scalar reference
    path (``_sig_one``, kept for tests)."""

    _CHUNK_TOKENS = 4096

    @staticmethod
    def _sig_one(text: str) -> int:
        """Scalar reference: one doc → 64-bit SimHash (test oracle)."""
        toks = text.lower().split()
        if not toks:
            return 0
        h = fnv1a_64_str_array(toks)
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        return int(np.sum((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))

    def _signatures(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        out_sig = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return out_sig
        toks_all = [t.lower().split() for t in texts]
        lens = np.fromiter((len(t) for t in toks_all), dtype=np.int64, count=n)
        flat = [t for toks in toks_all for t in toks]
        if not flat:
            return out_sig
        h = fnv1a_64_str_array(flat)
        # uint64 → 64 little-endian bits per token (uint8), then per-doc
        # segmented sums; int32 is enough (doc length < 2^31 tokens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        nz = np.flatnonzero(lens > 0)
        bitsum = np.zeros((n, 64), dtype=np.int64)
        # chunk over docs so each unpacked block stays small
        pos = 0
        bounds = np.concatenate([[0], np.cumsum(lens[nz])])
        while pos < nz.size:
            take = int(
                np.searchsorted(bounds, bounds[pos] + self._CHUNK_TOKENS, side="left")
                - pos
            )
            take = max(1, min(take, nz.size - pos))
            rows = nz[pos : pos + take]
            lo = starts[rows[0]]
            hi = starts[rows[-1]] + lens[rows[-1]]
            # note: rows are doc-ordered and docs with 0 tokens occupy no
            # flat positions, so [lo, hi) covers exactly these docs
            bits = np.unpackbits(
                h[lo:hi].view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int32)
            seg = (starts[rows] - lo).astype(np.int64)
            bitsum[rows] = np.add.reduceat(bits, seg, axis=0)
            pos += take
        vote = 2 * bitsum - lens[:, None]
        sigbits = (vote > 0).astype(np.uint8)
        packed = np.ascontiguousarray(np.packbits(sigbits, axis=1, bitorder="little"))
        out_sig = packed.view(np.uint64).ravel()
        out_sig[lens == 0] = 0
        return out_sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_sig = self._signatures(batch["text"].to_pylist())
        t = pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out_sig.astype(np.int64))})
        for b in range(4):
            band = ((out_sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            t = t.append_column(f"sim_band{b}", pa.array(band))
        return t


class Winnower:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm; public): k-gram hashes, and from
    every window of ``w`` consecutive k-gram hashes keep the MINIMUM
    (rightmost on ties).  Guarantees: any shared substring of length
    ≥ w + k − 1 contributes at least one shared fingerprint, and
    sketch density is ~2/(w+1) — a position-aware near-dup family
    complementary to MinHash (order-sensitive, catches partial
    overlap/containment, not just set resemblance).

    Vectorised: shingle hashes via the MinHash rolling kernel, window
    minima via ``sliding_window_view`` + argmin (rightmost-min via
    reversed argmin), dedup of consecutive identical picks.  Emits one
    row per (doc_id, fingerprint, pos).
    """

    def __init__(self, k: int = 5, w: int = 4):
        self.k = k
        self.w = w

    def fingerprints(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """→ (fingerprint uint64, position int64) arrays for one doc."""
        th = _token_hashes(text)
        sh = _shingle_hashes(th, self.k)
        w = self.w
        if sh.size <= w:
            i = int(np.argmin(sh))
            return sh[i : i + 1], np.array([i], dtype=np.int64)
        win = np.lib.stride_tricks.sliding_window_view(sh, w)
        # rightmost minimum per window: argmin on the reversed window
        rev = win[:, ::-1]
        pick = (w - 1) - np.argmin(rev, axis=1)
        pos = pick + np.arange(win.shape[0])
        # keep each selected position once (consecutive windows often
        # re-pick the same minimum)
        keep = np.empty(pos.shape[0], dtype=bool)
        keep[0] = True
        keep[1:] = pos[1:] != pos[:-1]
        pos = pos[keep]
        return sh[pos], pos.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_fp, out_pos = [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            fp, pos = self.fingerprints(t)
            out_id.append(np.repeat(ids[i], fp.size))
            out_fp.append(fp.astype(np.int64))
            out_pos.append(pos)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "fingerprint": pa.array(np.concatenate(out_fp)),
                "pos": pa.array(np.concatenate(out_pos)),
            }
        )


WINNOW_FP_PER_DOC_EST = 64  # fingerprint-row estimate for coarse_width


def winnow_candidate_pairs(
    ds: Dataset,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    bucket_cap: int = 64,
    n_coarse: int | None = None,
) -> Dataset:
    """documents(text) → winnowing near-dup candidates (a < b,
    n_shared ≥ min_shared).  Same scale shape as MinHash-LSH: explode
    to (fingerprint, doc) rows, count-scaled coarse-group pair
    generation with the star-edge cap, then count shared fingerprints
    per pair."""
    n_est = _count_estimate(ds) * WINNOW_FP_PER_DOC_EST
    if n_coarse is None:
        n_coarse = coarse_width(n_est)
    fps = ds.map_batches(
        Winnower,
        fn_constructor_args=(k, w),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).select_columns(["doc_id", "fingerprint"])
    mask = np.int64(n_coarse - 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        fp = batch["fingerprint"].to_numpy(zero_copy_only=False)
        return batch.append_column("__coarse", pa.array(np.bitwise_and(fp, mask)))

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        fp = g["fingerprint"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        new = np.empty(fp.shape[0], dtype=bool)
        new[0] = True
        new[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, fp.shape[0]))
        out_a, out_b = [], []
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            run = np.unique(ids[s : s + m])  # same fp can repeat per doc
            m2 = run.size
            if m2 < 2:
                continue
            if m2 <= bucket_cap:
                i, j = np.triu_indices(int(m2), 1)
                out_a.append(run[i])
                out_b.append(run[j])
            else:
                out_a.append(np.repeat(run[0], m2 - 1))
                out_b.append(run[1:])
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    from hexscape_ray.stages.agg import two_phase_sum

    pair_rows = _pairs_via_groups(
        fps.map_batches(add_bucket, batch_format="pyarrow"),
        n_est,
        pairs_block,
    )
    # adaptive-combine pair count (see minhash_candidate_pairs: Ray's
    # sort aggregate costs a ~6 s constant the combine avoids)
    cand = two_phase_sum(pair_rows, ["a", "b"], [], count_as="n_shared")

    def thresh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["n_shared"], min_shared))

    return cand.map_batches(thresh, batch_format="pyarrow")


EMB_TARGET_BUCKET = 128  # expected docs per hyperplane bucket


def embedding_near_dup(
    emb: Dataset,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 1,
) -> Dataset:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH
    bucketing + in-bucket exact cosine.

    Scale path: the number of hyperplanes (→ 2^p buckets) GROWS with
    corpus size — ``p = max(8, ceil(log2(n / EMB_TARGET_BUCKET)))`` so
    the expected in-bucket population stays ~``EMB_TARGET_BUCKET`` and
    the in-bucket O(m²) cosine stays bounded as n grows (the count() is
    parquet-metadata-only, no scan).  More planes lower recall for
    borderline pairs; pass ``n_tables > 1`` to union candidates from
    independently-seeded plane sets (classic multi-table LSH) when
    recall matters more than cost.  In-bucket similarity is computed in
    row chunks so the (chunk × m) sim matrix stays cache-resident
    regardless of a skewed bucket's size.
    """
    if n_planes is None:
        n = emb.count()
        n_planes = max(8, int(np.ceil(np.log2(max(n, 2) / EMB_TARGET_BUCKET))))
    n_planes = min(n_planes, 62)  # bucket key must fit int64

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(
            batch["embedding"].to_numpy(zero_copy_only=False).tolist(), dtype=np.float64
        )
        out_id, out_bucket, out_table, out_emb = [], [], [], []
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        for t in range(n_tables):
            rng = np.random.default_rng(7 + t)  # fixed planes — deterministic
            planes = rng.standard_normal((vecs.shape[1], n_planes))
            sign = (vecs @ planes > 0).astype(np.int64)
            bucket = (sign * weights).sum(axis=1)
            out_id.append(batch["vec_id"])
            out_bucket.append(pa.array(bucket))
            out_table.append(pa.array(np.full(len(batch), t, dtype=np.int64)))
            out_emb.append(batch["embedding"])
        return pa.table(
            {
                "vec_id": pa.concat_arrays(
                    [c.combine_chunks() if hasattr(c, "combine_chunks") else c for c in out_id]
                ),
                "table_id": pa.concat_arrays([c for c in out_table]),
                "bucket": pa.concat_arrays([c for c in out_bucket]),
                "embedding": pa.concat_arrays(
                    [c.combine_chunks() if hasattr(c, "combine_chunks") else c for c in out_emb]
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        ids = g["vec_id"].to_numpy()
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vn = vecs / norms[:, None]
        m = vn.shape[0]
        chunk = max(1, (1 << 17) // max(m, 1))  # keep sim chunk ~1 M floats
        ra, rb, rs = [], [], []
        for s in range(0, m, chunk):
            sim = vn[s : s + chunk] @ vn.T
            a, b = np.where(sim >= threshold)
            keep = (a + s) < b  # upper triangle only
            ra.append(a[keep] + s)
            rb.append(b[keep])
            rs.append(sim[a[keep], b[keep]])
        a = np.concatenate(ra) if ra else np.empty(0, dtype=np.int64)
        b = np.concatenate(rb) if rb else np.empty(0, dtype=np.int64)
        s = np.concatenate(rs) if rs else np.empty(0, dtype=np.float64)
        return pd.DataFrame({"a": ids[a], "b": ids[b], "cosine": np.round(s, 6)})

    out = (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table_id", "bucket"])
        .map_groups(pairs, batch_format="pandas")
    )
    if n_tables > 1:  # same pair can surface from several tables
        from hexscape_ray.stages.agg import two_phase_agg

        out = two_phase_agg(out, ["a", "b"], {"cosine": "min"})
    return out


DUP_SPAN_GRAMS_PER_DOC_EST = 256  # k-gram row estimate for coarse_width


def duplicate_spans(
    ds: Dataset,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_coarse: int | None = None,
    min_span_tokens: int | None = None,
    occ_cap: int | None = None,
    carry_gram: bool = False,
) -> Dataset:
    """EXACT-substring duplicate detection: every MAXIMAL run of ≥ ``k``
    consecutive identical tokens shared between two documents, reported
    as ``(a_id, b_id, a_start, b_start, span_tokens)`` with 1-based
    token positions — the suffix-array dedup of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL '22), re-expressed
    as a k-gram match + gaps-and-islands merge so it runs as two keyed
    shuffles instead of a global suffix sort.

    Distributed shape: docs → positional k-gram rows (128-bit gram id,
    doc, pos) → coarse gram-hash buckets (count-scaled width via
    :func:`coarse_width`, the measured per-group-overhead lesson) →
    fine runs per gram id via lexsort → cross-doc occurrence pairs
    (a<b, both positions) → ``groupby(a,b)`` → per-pair diagonal
    islands (``diag = a_pos − b_pos``; consecutive ``a_pos`` on one
    diagonal = one maximal span of ``run + k − 1`` tokens).  Only
    occurrence-pair rows ever shuffle; no doc text moves past stage 1.

    Shuffle payload (round-3 verdict #3): each k-gram row carries a
    128-bit content id — two independent vectorised FNV-1a families
    off one Arrow buffer (:func:`fnv1a_128_str_array`) — instead of
    the ~8-token gram STRING (~50 bytes → 16), so stage-1 shuffle
    bytes drop ~4×.  Collision probability is ~n²/2^129: zero expected
    collisions below ~10^18 distinct grams, so output still matches
    the SQL islands oracle bit-for-bit; pass ``carry_gram=True`` to
    also ship the string and group on it (collision-audit mode — the
    exactness contract enforced by construction rather than by odds).

    Boilerplate grams shared by m docs cost O(m²) pairs — exactly what
    the exactness contract (and the SQL oracle) pays; at 100-TB scale
    pass ``occ_cap`` to keep only the ``occ_cap`` lowest-(doc, pos)
    occurrences per gram (boilerplate headers/footers stop contributing
    quadratic pairs, at the cost of missing spans between high-rank
    copies — the LSH star-edge trade).
    """
    n_est = _count_estimate(ds) * DUP_SPAN_GRAMS_PER_DOC_EST
    if n_coarse is None:
        n_coarse = coarse_width(n_est)
    mask = np.uint64(n_coarse - 1)

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_g: list[str] = []
        out_i: list[int] = []
        pos_arrays: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            toks = t.split(" ")
            ng = len(toks) - k + 1
            if ng <= 0:
                continue
            out_g.extend(" ".join(toks[p : p + k]) for p in range(ng))
            out_i.extend([i] * ng)
            pos_arrays.append(np.arange(1, ng + 1, dtype=np.int64))
        if not out_g:
            cols = {
                "g1": pa.array([], type=pa.int64()),
                "g2": pa.array([], type=pa.int64()),
                "i": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "__coarse": pa.array([], type=pa.int64()),
            }
            if carry_gram:
                cols["g"] = pa.array([], type=pa.string())
            return pa.table(cols)
        g1, g2 = fnv1a_128_str_array(out_g)
        cols = {
            "g1": pa.array(g1.astype(np.int64)),
            "g2": pa.array(g2.astype(np.int64)),
            "i": pa.array(np.asarray(out_i, dtype=np.int64)),
            "pos": pa.array(np.concatenate(pos_arrays)),
            "__coarse": pa.array(np.bitwise_and(g1, mask).astype(np.int64)),
        }
        if carry_gram:
            cols["g"] = pa.array(out_g, type=pa.string())
        return pa.table(cols)

    def occ_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in ("a_id", "b_id", "a_pos", "b_pos")}
            )
        if carry_gram:  # audit mode: group on the string itself
            codes, _ = pd.factorize(g["g"], sort=False)
            sort_keys: tuple = (codes,)
        else:
            sort_keys = (g["g2"].to_numpy(), g["g1"].to_numpy())
        ids = g["i"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((pos, ids) + sort_keys)
        ids, pos = ids[order], pos[order]
        new = np.empty(ids.shape[0], dtype=bool)
        new[0] = True
        if carry_gram:
            codes = codes[order]
            new[1:] = codes[1:] != codes[:-1]
        else:
            k1, k2 = sort_keys[1][order], sort_keys[0][order]
            new[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, ids.shape[0]))
        cols = {"a_id": [], "b_id": [], "a_pos": [], "b_pos": []}
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            if occ_cap is not None and m > occ_cap:
                m = occ_cap  # rows already (doc, pos)-sorted within the gram
            ii, jj = np.triu_indices(int(m), 1)
            gi, gj = ids[s : s + m], pos[s : s + m]
            cross = gi[ii] != gi[jj]  # same-doc repeats don't pair
            cols["a_id"].append(gi[ii][cross])
            cols["b_id"].append(gi[jj][cross])
            cols["a_pos"].append(gj[ii][cross])
            cols["b_pos"].append(gj[jj][cross])
        if not cols["a_id"]:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in ("a_id", "b_id", "a_pos", "b_pos")}
            )
        return pd.DataFrame({c: np.concatenate(v) for c, v in cols.items()})

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a_pos"].to_numpy()
        b = g["b_pos"].to_numpy()
        diag = a - b
        order = np.lexsort((a, diag))
        a, b, diag = a[order], b[order], diag[order]
        brk = np.empty(a.shape[0], dtype=bool)
        brk[0] = True
        brk[1:] = (diag[1:] != diag[:-1]) | (a[1:] != a[:-1] + 1)
        starts = np.flatnonzero(brk)
        runs = np.diff(np.append(starts, a.shape[0]))
        return pd.DataFrame(
            {
                "a_id": np.full(starts.size, g["a_id"].iloc[0], dtype=np.int64),
                "b_id": np.full(starts.size, g["b_id"].iloc[0], dtype=np.int64),
                "a_start": a[starts],
                "b_start": b[starts],
                "span_tokens": runs + (k - 1),
            }
        )

    spans = _pairs_via_groups(
        ds.map_batches(gram_rows, batch_format="pyarrow"),
        n_est,
        occ_pairs,
    ).groupby(["a_id", "b_id"]).map_groups(islands, batch_format="pandas")
    if min_span_tokens is not None:

        def thresh(batch: pa.Table) -> pa.Table:
            keep = pc.greater_equal(batch["span_tokens"], min_span_tokens)
            return batch.filter(keep)

        spans = spans.map_batches(thresh, batch_format="pyarrow")
    return spans


def contamination_hits(
    train: Dataset,
    eval_ds: Dataset,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Benchmark DECONTAMINATION: for every training document, the
    number of its k-gram positions that appear anywhere in the eval
    set (docs with ≥1 hit are contamination candidates to drop) — the
    train/test-overlap scrub every LLM data pipeline runs before
    training.

    Scale shape: the EVAL side is benchmark-sized by nature (thousands
    of documents, not billions), so its distinct-gram set collects to
    the driver and broadcasts once via ``ray.put``; the TRAIN side —
    the big one — streams through one ``map_batches`` doing a single
    vectorised Arrow ``is_in`` over the batch's flattened grams +
    cumsum segmented counts.  Zero shuffle, train corpus never moves.
    For an eval side too big to broadcast, use the
    :func:`duplicate_spans` coarse-bucket shape instead.
    """
    import ray

    def eval_grams(batch: pa.Table) -> pa.Table:
        gs: set[str] = set()
        for t in batch[text_col].to_pylist():
            toks = t.split(" ")
            gs.update(" ".join(toks[p : p + k]) for p in range(len(toks) - k + 1))
        return pa.table({"gram": pa.array(sorted(gs), type=pa.string())})

    egrams = pa.array(
        sorted(
            set(
                eval_ds.map_batches(eval_grams, batch_format="pyarrow")
                .to_pandas()["gram"]
                .tolist()
            )
        ),
        type=pa.string(),
    )
    gref = ray.put(egrams)

    def hits(batch: pa.Table) -> pa.Table:
        gset = ray.get(gref)
        texts = batch[text_col].to_pylist()
        flat: list[str] = []
        offs = np.empty(len(texts) + 1, dtype=np.int64)
        offs[0] = 0
        for i, t in enumerate(texts):
            toks = t.split(" ")
            ng = max(len(toks) - k + 1, 0)
            flat.extend(" ".join(toks[p : p + k]) for p in range(ng))
            offs[i + 1] = offs[i] + ng
        if not flat:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
            )
        hit = pc.is_in(pa.array(flat, type=pa.string()), value_set=gset)
        cum = np.concatenate(
            [[0], np.cumsum(hit.to_numpy(zero_copy_only=False).astype(np.int64))]
        )
        n = cum[offs[1:]] - cum[offs[:-1]]
        keep = n > 0
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(keep)),
                "n_hits": pa.array(n[keep]),
            }
        )

    return train.map_batches(hits, batch_format="pyarrow")


SEMDEDUP_TARGET_CLUSTER = 4096  # expected vectors per cluster when k derives


def semantic_dedup(
    emb: Dataset,
    k: int | None = None,
    threshold: float = 0.92,
    n_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with distributed
    spherical k-means, then WITHIN each cluster drop every vector whose
    cosine to any LOWER-id cluster member exceeds ``threshold`` — the
    embedding-space dedup tier above MinHash (catches paraphrases the
    token sketches miss).  Deterministic variant: the drop test is
    against all lower-id members (not just kept ones), so the KEEP
    decision is a pure function of the cluster contents, independent
    of scan order.  (Cluster LABELS can drift across partitionings —
    Lloyd's moment partials re-associate in float — but near-identical
    vectors always co-cluster, so keep/drop is stable; pytest-pinned.)

    Distributed shape: the k-means pass streams moment partials (the
    corpus never moves); the final centroids broadcast once and each
    batch re-derives its rows' clusters with the SAME argmax-dot rule
    (ties → lowest cluster id) — cheaper and join-free versus shipping
    the assignment stream back through a join (Acero also cannot carry
    ``list<double>`` payload columns).  The per-cluster prune runs in
    ``map_groups`` with chunked cosine blocks (cache-resident, the
    embedding_near_dup pattern).  Cross-cluster near-dups are missed by
    design — that is SemDeDup's recall/cost trade; raise ``k`` for
    smaller clusters and cheaper prunes, lower it for higher recall.

    Output: one row per vector — (id, cluster, keep, max_prior_cos
    rounded to 1e-6 parts) with ``keep=False`` for dropped near-dups.

    SCALE: the in-cluster prune is O(m²) in cluster size, so ``k``
    must GROW with the corpus — when not given it derives as
    ``ceil(n / SEMDEDUP_TARGET_CLUSTER)`` (floor 8), keeping expected
    cluster population ~4k and each prune a few ms (the paper's regime:
    tens of thousands of clusters at web scale).  A fixed small k at
    10^9 vectors would OOM the prune tasks.
    """
    import ray

    from hexscape_ray.stages.knn import _normalize, kmeans_distributed

    if k is None:
        n = emb.count()  # parquet-metadata for fresh reads
        k = max(8, -(-n // SEMDEDUP_TARGET_CLUSTER))
    cents, _ = kmeans_distributed(
        emb, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col
    )
    cref = ray.put(_normalize(np.asarray(cents, dtype=np.float64)))

    def assign_batch(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _normalize(
            np.asarray(
                batch[vec_col].to_numpy(zero_copy_only=False).tolist(),
                dtype=np.float64,
            )
        )
        cl = (X @ C.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cluster": pa.array(cl),
            }
        )

    joined = emb.map_batches(assign_batch, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.asarray(g[vec_col].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        m = Vn.shape[0]
        best = np.zeros(m, dtype=np.float64)
        chunk = max(1, (1 << 17) // max(m, 1))  # sim chunk ~1 M floats
        for s in range(1, m, chunk):
            e = min(s + chunk, m)
            sim = Vn[s:e] @ Vn[:e].T  # rows s..e vs ALL lower (and self)
            col = np.arange(e - s)
            for r in range(sim.shape[0]):  # mask self+upper triangle
                sim[r, s + r :] = -np.inf
            best[s:e] = sim.max(axis=1) if sim.shape[1] else 0.0
        best[0] = 0.0
        keep = best <= threshold
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.full(m, g["cluster"].iloc[0], dtype=np.int64),
                "keep": keep,
                "max_prior_cos_pml": np.floor(best * 1e6 + 0.5).astype(np.int64),
            }
        )

    return joined.groupby("cluster").map_groups(prune, batch_format="pandas")


def segment_dedup(
    docs: Dataset,
    width: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Line-level exact dedup (RefinedWeb/Falcon "remove repeated
    lines") generalised to fixed token-width segments — the corpus
    stores one-line documents, so the dedup unit is each consecutive
    run of ``width`` tokens (last run ragged).

    For every distinct segment the FIRST occurrence corpus-wide wins
    (rank = doc_id·2^16 + seg_idx — document order then position, the
    reference's deterministic-ordering discipline,
    /root/reference/R/generate_patches.R:188-202); output is per-doc
    kept-segment stats ``(doc_id, n_kept, kept_tokens)`` for docs that
    retain ≥1 segment (INNER semantics, mirrored by
    ``SQL_SEGMENT_DEDUP``'s join).

    Scale shape: segments NEVER ship text — a shuffle row is a 16-byte
    FNV-128 content key + one packed int64 (rank·16 + ntok); both
    aggregates are two-phase (block partials → adaptive combine), so
    the exchange only carries per-block-distinct partials.  The hash is
    computed straight off the Arrow string buffer: a segment's byte
    range [start of token t0, end of token t1] is byte-identical to
    ``' '.join(tokens[t0:t1+1])`` by definition of splitting on a
    single space, so range-hashing equals hashing the oracle's
    ``array_to_string`` segment (collision odds ~n²/2^129).
    """
    assert 1 <= width <= 15  # ntok packs into 4 bits
    from hexscape_ray.functions.hashing import (
        _FNV_OFFSET2,
        fnv1a_64_ranges,
        fnv1a_128_str_array,
    )
    from hexscape_ray.stages.agg import two_phase_agg, two_phase_sum

    W = width

    def seg_rows(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ids = np.asarray(
            batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        nd = len(arr)
        if nd == 0:
            return pa.table(
                {
                    "h1": pa.array([], type=pa.int64()),
                    "h2": pa.array([], type=pa.int64()),
                    "key": pa.array([], type=pa.int64()),
                }
            )
        assert int(ids.max(initial=0)) < (1 << 43), "doc_id overflows rank pack"
        if arr.null_count or not pa.types.is_string(arr.type):
            # scalar parity path (nulls / large_string storage)
            segs, keys = [], []
            for d, t in zip(ids, arr.to_pylist()):
                toks = (t or "").split(" ")
                n_seg = (len(toks) - 1) // W + 1
                for j in range(n_seg):
                    part = toks[j * W : (j + 1) * W]
                    segs.append(" ".join(part))
                    keys.append((((int(d) << 16) | j) << 4) | len(part))
            h1, h2 = fnv1a_128_str_array(segs)
            key = np.asarray(keys, dtype=np.int64)
        else:
            _, off_buf, data_buf = arr.buffers()
            offs = np.frombuffer(off_buf, dtype=np.int32)[
                arr.offset : arr.offset + nd + 1
            ].astype(np.int64)
            data = np.frombuffer(data_buf, dtype=np.uint8)
            sp = offs[0] + np.flatnonzero(data[offs[0] : offs[-1]] == 32)
            sp_start = np.searchsorted(sp, offs[:-1], side="left")
            sp_end = np.searchsorted(sp, offs[1:], side="left")
            n_tok = sp_end - sp_start + 1
            n_seg = (n_tok - 1) // W + 1
            assert int(n_tok.max()) <= (1 << 16), "seg_idx overflows rank pack"
            total = int(n_seg.sum())
            doc = np.repeat(np.arange(nd), n_seg)
            base = np.cumsum(n_seg) - n_seg
            j = np.arange(total, dtype=np.int64) - np.repeat(base, n_seg)
            t0 = j * W
            t1 = np.minimum(t0 + W - 1, n_tok[doc] - 1)
            if sp.size:
                prev_sp = np.clip(sp_start[doc] + t0 - 1, 0, sp.size - 1)
                next_sp = np.clip(sp_start[doc] + t1, 0, sp.size - 1)
                starts = np.where(t0 == 0, offs[:-1][doc], sp[prev_sp] + 1)
                ends = np.where(t1 == n_tok[doc] - 1, offs[1:][doc], sp[next_sp])
            else:  # every doc is a single token: one segment per doc
                starts, ends = offs[:-1][doc], offs[1:][doc]
            ntok_seg = t1 - t0 + 1
            key = ((((ids[doc] << 16) | j) << 4) | ntok_seg).astype(np.int64)
            h1 = fnv1a_64_ranges(data, starts, ends)
            h2 = fnv1a_64_ranges(data, starts, ends, offset=_FNV_OFFSET2)
        return pa.table(
            {
                "h1": pa.array(h1.astype(np.int64), type=pa.int64()),
                "h2": pa.array(h2.astype(np.int64), type=pa.int64()),
                "key": pa.array(key, type=pa.int64()),
            }
        )

    rows = docs.map_batches(seg_rows, batch_format="pyarrow")
    firsts = two_phase_agg(rows, ["h1", "h2"], {"key": "min"})

    def unpack(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(key >> 20, type=pa.int64()),
                "kept_tokens": pa.array(key & 15, type=pa.int64()),
            }
        )

    kept = two_phase_sum(
        firsts.map_batches(unpack, batch_format="pyarrow"),
        keys=["doc_id"],
        sums=["kept_tokens"],
        count_as="n_kept",
    )
    return kept.sort("doc_id")


# ---------------------------------------------------------------------------
# SQL-exact near-dup pipeline (round-4 continuation): every stage —
# trigram shingling, MinHash, LSH banding, exact set-Jaccard verify,
# cluster closure — built ONLY from primitives this repo already
# replays bit-exactly in DuckDB SQL (FNV-1a-64 per token via the
# simhash recursive CTE, splitmix64 via HUGEINT limb arithmetic,
# recursive-closure components via the group_union pattern).  This is
# the hash-exact twin of the production MinHasher family: the tuned
# crc32-based kernel stays the throughput path (crc32 has no SQL
# replay), this one is the CORRECTNESS path the driver can grade end
# to end.
# ---------------------------------------------------------------------------

NDX_N_PERM = 16
NDX_BAND_R = 2  # 8 bands × 2 rows
NDX_K = 3  # token trigrams
_NDX_BIAS = np.uint64(1) << np.uint64(63)
# per-permutation xor seeds — deterministic, embedded as literals in
# the SQL oracle (pipelines/queries.py::_ndx_sql)
NDX_PERM_C = splitmix64(np.arange(201, 201 + NDX_N_PERM, dtype=np.uint64))


def ndx_gram_rows(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """documents → DISTINCT-per-doc trigram hashes ``(doc_id, g)``.

    g = sm(sm(sm(fnv(t0)) ^ fnv(t1)) ^ fnv(t2)) over lower().split()
    token windows (sm = splitmix64, fnv = FNV-1a-64): the per-TOKEN
    hash means the SQL oracle folds FNV over DISTINCT TOKENS only
    (vocab-sized recursive CTE, the simhash trick) and the per-gram
    combine is pure modular arithmetic.  Stored as the int64 two's-
    complement reinterpret (equality semantics only — order never
    consulted).  Docs shorter than NDX_K tokens emit nothing (the SQL
    pos+2 join drops them identically)."""

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id: list[np.ndarray] = []
        out_g: list[np.ndarray] = []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            toks = t.lower().split()
            if len(toks) < NDX_K:
                continue
            h = fnv1a_64_str_array(toks)
            with np.errstate(over="ignore"):
                g = splitmix64(h)[: len(h) - 2]
                g = splitmix64(g ^ h[1:-1])
                g = splitmix64(g ^ h[2:])
            g = np.unique(g)
            out_id.append(np.full(g.size, i, dtype=np.int64))
            out_g.append(g.view(np.int64))
        if not out_id:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "g": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "g": pa.array(np.concatenate(out_g)),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def ndx_band_rows(grams: Dataset) -> Dataset:
    """gram rows → 16-perm MinHash signatures → (doc_id, band, s0, s1)
    band rows.  Per-perm value = splitmix64(g ^ C_j); the per-doc MIN
    rides the adaptive two-phase aggregate over BIASED int64 (x ^ 2^63
    reinterpreted — int64 order ≡ uint64 order), so the exchange only
    ever sees one partial row per (block, doc)."""
    from hexscape_ray.stages.agg import two_phase_agg

    def perms(batch: pa.Table) -> pa.Table:
        g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        cols: dict = {"doc_id": batch["doc_id"]}
        with np.errstate(over="ignore"):
            for j in range(NDX_N_PERM):
                s = splitmix64(g ^ NDX_PERM_C[j])
                cols[f"s{j}"] = pa.array((s ^ _NDX_BIAS).view(np.int64))
        return pa.table(cols)

    sig = two_phase_agg(
        grams.map_batches(perms, batch_format="pyarrow"),
        ["doc_id"],
        {f"s{j}": "min" for j in range(NDX_N_PERM)},
    )

    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        for b in range(NDX_N_PERM // NDX_BAND_R):
            parts.append(
                pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "band": pa.array(np.full(len(batch), b, dtype=np.int64)),
                        "s0": batch[f"s{2 * b}"],
                        "s1": batch[f"s{2 * b + 1}"],
                    }
                )
            )
        return pa.concat_tables(parts)

    return sig.map_batches(explode, batch_format="pyarrow")


def ndx_candidate_pairs(grams: Dataset, n_rows_est: int) -> Dataset:
    """band rows → (a, b, n_bands_hit) candidate pairs.  Same
    count-scaled coarse-group shuffle + in-group lexsort as
    minhash_candidate_pairs, but FULL cliques (no star-edge cap): the
    SQL oracle's bucket self-join emits every pair, so the exact twin
    must too.  Production corpora with pathological boilerplate
    buckets should use minhash_candidate_pairs (capped) for the
    throughput path."""
    bands = ndx_band_rows(grams)
    n_est = n_rows_est * (NDX_N_PERM // NDX_BAND_R)
    n_coarse = coarse_width(n_est)
    mask = np.int64(n_coarse - 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        s0 = batch["s0"].to_numpy(zero_copy_only=False)
        s1 = batch["s1"].to_numpy(zero_copy_only=False)
        bd = batch["band"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__coarse", pa.array(np.bitwise_and(s0 ^ s1 ^ bd, mask))
        )

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        bd = g["band"].to_numpy()
        s0 = g["s0"].to_numpy()
        s1 = g["s1"].to_numpy()
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, s1, s0, bd))
        bd, s0, s1, ids = bd[order], s0[order], s1[order], ids[order]
        new = np.empty(bd.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (bd[1:] != bd[:-1]) | (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, bd.shape[0]))
        out_a, out_b = [], []
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            run = ids[s : s + m]
            i, j = np.triu_indices(int(m), 1)
            out_a.append(run[i])
            out_b.append(run[j])
        if not out_a:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    from hexscape_ray.stages.agg import two_phase_sum

    pair_rows = _pairs_via_groups(
        bands.map_batches(add_bucket, batch_format="pyarrow"), n_est, pairs_block
    )
    return two_phase_sum(pair_rows, ["a", "b"], [], count_as="n_bands_hit")


def ndx_verified_pairs(ds: Dataset) -> pa.Table:
    """documents → LSH candidate pairs with EXACT set-Jaccard counts:
    (a, b, n_bands_hit, inter_grams, union_grams), sorted.

    Distributed shape: the gram table materialises ONCE and feeds both
    the signature stage and the verify stage (the two-consumer
    recompute trap); the verify never collects the corpus — gram rows
    probe a broadcast doc→(pid, side) incidence CSR (three sorted int64
    arrays, ``ray.put`` once, zero-copy ``ray.get`` per worker), explode
    to (pair, g, side) hits with one ``searchsorted`` + flat-index
    gather per batch (no per-row Python — the ``copurchase_triangles``
    kernel shape, round-4 verdict #3), and intersections reduce via two
    two-phase aggregates (MAX per (pair, gram) then SUM per pair).
    Only the LSH-bounded pair list itself ever reaches the driver."""
    import ray as _ray

    n_docs = ds.count()
    grams = ndx_gram_rows(ds).materialize()
    pair_blocks = _ray.get(ndx_candidate_pairs(grams, n_docs).to_arrow_refs())
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "n_bands_hit": pa.array([], pa.int64()),
            "inter_grams": pa.array([], pa.int64()),
            "union_grams": pa.array([], pa.int64()),
        }
    )
    pair_blocks = [t for t in pair_blocks if t.num_rows]
    if not pair_blocks:
        return empty
    ptab = pa.concat_tables(pair_blocks)
    nb = ptab["n_bands_hit"].to_numpy(zero_copy_only=False).astype(np.int64)
    a, b, ig, ug, order = exact_pair_counts(grams, ptab, "doc_id", "g")
    return pa.table(
        {
            "a": pa.array(a),
            "b": pa.array(b),
            "n_bands_hit": pa.array(nb[order]),
            "inter_grams": pa.array(ig),
            "union_grams": pa.array(ug),
        }
    )


def exact_pair_counts(
    rows: Dataset, ptab: pa.Table, id_col: str, key_col: str
) -> tuple:
    """EXACT set intersection/union sizes for a bounded candidate-pair
    list over a distributed (id, key) row table, without collecting
    the corpus: probe a broadcast id→(pid, side) incidence CSR (three
    sorted int64 arrays, ``ray.put`` once) with one searchsorted +
    flat-index gather per batch, reduce via MAX per (pair, key) then
    SUM per pair.  Shared by the ndx near-dup verify and the
    prefix-filter set-similarity join.

    Returns (a, b, inter, union, order) with pairs lexsorted by
    (a, b); ``order`` maps the caller's ptab row order to the output
    order so aligned payload columns can be carried through."""
    import ray as _ray

    from hexscape_ray.stages.agg import two_phase_agg, two_phase_sum

    a = ptab["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = ptab["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    npairs = a.size

    # id → (pid, side) incidence as a CSR over SORTED id keys: probe
    # with two searchsorted calls, expand with repeat + intra-run
    # offsets — one vectorised gather per batch
    pid_rng = np.arange(npairs, dtype=np.int64)
    doc_keys = np.concatenate([a, b])
    pid_inc = np.concatenate([pid_rng, pid_rng])
    side_inc = np.concatenate(
        [np.zeros(npairs, np.int64), np.ones(npairs, np.int64)]
    )
    o2 = np.argsort(doc_keys, kind="stable")
    inc_ref = _ray.put((doc_keys[o2], pid_inc[o2], side_inc[o2]))

    def hits(batch: pa.Table) -> pa.Table:
        doc_s, pid_s, side_s = _ray.get(inc_ref)
        d = batch[id_col].to_numpy(zero_copy_only=False)
        g = batch[key_col].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(doc_s, d, "left")
        hi = np.searchsorted(doc_s, d, "right")
        cnt = hi - lo
        keep = cnt > 0
        g, lo, cnt = g[keep], lo[keep], cnt[keep]
        total = int(cnt.sum())
        cum = np.cumsum(cnt)
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum - cnt, cnt)
        flat = np.repeat(lo, cnt) + intra
        side = side_s[flat]
        return pa.table(
            {
                "pid": pa.array(pid_s[flat]),
                "g": pa.array(np.repeat(g, cnt)),
                "a_bit": pa.array(1 - side),
                "b_bit": pa.array(side),
            }
        )

    per_gram = two_phase_agg(
        rows.map_batches(hits, batch_format="pyarrow"),
        ["pid", "g"],
        {"a_bit": "max", "b_bit": "max"},
    )

    def both(batch: pa.Table) -> pa.Table:
        ab = batch["a_bit"].to_numpy(zero_copy_only=False)
        bb = batch["b_bit"].to_numpy(zero_copy_only=False)
        return pa.table({"pid": batch["pid"], "both": pa.array(ab & bb)})

    inter_df = two_phase_sum(
        per_gram.map_batches(both, batch_format="pyarrow"), ["pid"], ["both"],
        count_as=None,
    ).to_pandas()
    ig = np.zeros(npairs, dtype=np.int64)
    ig[inter_df["pid"].to_numpy()] = inter_df["both"].to_numpy()

    def ng_rows(batch: pa.Table) -> pa.Table:
        doc_s, _, _ = _ray.get(inc_ref)
        d = batch[id_col].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(doc_s, d, "left")
        hi = np.searchsorted(doc_s, d, "right")
        return batch.filter(pa.array(hi > lo))

    sizes_df = two_phase_sum(
        rows.map_batches(ng_rows, batch_format="pyarrow"),
        [id_col],
        [],
        count_as="ng",
    ).to_pandas()
    sz_doc = sizes_df[id_col].to_numpy().astype(np.int64)
    sz_ng = sizes_df["ng"].to_numpy().astype(np.int64)
    o3 = np.argsort(sz_doc)
    sz_doc, sz_ng = sz_doc[o3], sz_ng[o3]
    ng_a = sz_ng[np.searchsorted(sz_doc, a)]
    ng_b = sz_ng[np.searchsorted(sz_doc, b)]
    return a, b, ig, ng_a + ng_b - ig, order


def ndx_winnow_rows(ds: Dataset, w: int = 4) -> Dataset:
    """SQL-exact winnowing fingerprints (Schleimer et al. 2003) over
    the ndx trigram hashes: from every window of ``w`` consecutive
    POSITIONAL gram hashes keep the minimum (RIGHTMOST on ties,
    everywhere — including docs shorter than one window), emitting the
    DISTINCT (doc_id, pos, fp) set.  Set semantics (vs the production
    Winnower's consecutive-only dedupe) make both the numpy and the
    SQL side one DISTINCT — same guarantee: any shared run of
    ≥ w + k − 1 tokens shares a fingerprint.  fp is the int64 two's-
    complement reinterpret of the uint64 hash; minima are taken in
    UNSIGNED order on both sides (SQL HUGEINT is already unsigned in
    [0, 2^64))."""

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_pos, out_fp = [], [], []
        for i, t in zip(ids, batch["text"].to_pylist()):
            toks = t.lower().split()
            if len(toks) < NDX_K:
                continue
            h = fnv1a_64_str_array(toks)
            with np.errstate(over="ignore"):
                g = splitmix64(h)[: len(h) - 2]
                g = splitmix64(g ^ h[1:-1])
                g = splitmix64(g ^ h[2:])
            n = g.size
            if n <= w:
                m = g.min()
                pos = np.array([np.flatnonzero(g == m)[-1]], dtype=np.int64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(g, w)
                pick = (w - 1) - np.argmin(win[:, ::-1], axis=1)
                pos = np.unique(pick + np.arange(win.shape[0]))
            out_id.append(np.full(pos.size, i, dtype=np.int64))
            out_pos.append(pos + 1)  # SQL gram positions are 1-based
            out_fp.append(g[pos].view(np.int64))
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "pos": pa.array(np.concatenate(out_pos)),
                "fp": pa.array(np.concatenate(out_fp)),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact-recall set-similarity self-join (prefix filtering)
# ---------------------------------------------------------------------------


def setsim_prefix_pairs(
    ds: Dataset,
    tau_num: int = 19,
    tau_den: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """ALL document pairs with token-set Jaccard >= tau_num/tau_den —
    EXACT RECALL, unlike the MinHash-LSH family (which trades recall
    for candidate volume): prefix filtering (Chaudhuri et al. ICDE'06 /
    PPJoin, Xiao et al. WWW'08).  Returns (a, b, inter_toks,
    union_toks, jac_x1m) sorted by (a, b).

    Shape (all two-phase / coarse-group, no corpus materialisation):

    1. token rows (doc, tok-hash, n) — distinct FNV-1a-64 token hashes
       per doc, vectorised; n = per-doc distinct count rides along.
    2. global document-frequency census per token (two-phase count),
       joined back adaptively (broadcast at fixture vocab, bucketed
       past the row budget).
    3. PREFIX per doc: under the global (df, tok) total order, the
       first |d| - ceil(tau*|d|) + 1 tokens.  THEOREM (prefix filter):
       any pair with J >= tau shares at least one prefix token, so
       grouping prefix rows by token loses NO qualifying pair.
    4. candidate pairs per prefix-token bucket under TWO provably-safe
       filters: LENGTH (tau*max(|a|,|b|) <= min) and POSITIONAL
       (PPJoin: from prefix positions pa, pb the overlap is bounded by
       1 + min(|a|-1-pa, |b|-1-pb), which must reach
       ceil(tau/(1+tau)*(|a|+|b|)) — measured 7.4x candidate prune on
       the degenerate 31-token fixture vocab at sf0.1, where EVERY
       "rare" token is shared by thousands of docs).  No star-edge
       cap — exact recall forbids dropping pairs.
    5. exact |A∩B| / |A∪B| per candidate, PLACEMENT-ADAPTIVE: when the
       token table fits the broadcast budget (HEXRAY_BROADCAST_ROWS)
       the pair list stays DISTRIBUTED and each batch verifies against
       a broadcast packed-key token CSR (dense-doc × token-rank codes,
       one searchsorted per expanded token — the copurchase_triangles
       kernel; the pairs-heavy shape, since degenerate vocabularies
       make candidates ≫ docs); past the budget the bounded-pair
       incidence path (``exact_pair_counts``) takes over.  Then the
       integer threshold tau_den·inter >= tau_num·union.

    Token identity is the 64-bit FNV hash (collision-audited corpus
    assumption, as in corpus_distinct_ngrams); the SQL oracle compares
    token STRINGS, so parity additionally certifies collision-freedom
    on the fixture vocab."""
    import pandas as pd
    import ray as _ray

    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.joins import adaptive_join

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_tok, out_n = [], [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            toks = t.lower().split()
            if not toks:
                continue
            h = np.unique(fnv1a_64_str_array(toks).view(np.int64))
            out_id.append(np.full(h.size, i, dtype=np.int64))
            out_tok.append(h)
            out_n.append(np.full(h.size, h.size, dtype=np.int64))
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "tok": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "tok": pa.array(np.concatenate(out_tok)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    tokens = ds.map_batches(enc, batch_format="pyarrow").materialize()
    return setsim_from_token_rows(tokens, tau_num, tau_den, id_col)


def setsim_from_token_rows(
    tokens: Dataset,
    tau_num: int = 19,
    tau_den: int = 20,
    id_col: str = "doc_id",
) -> Dataset:
    """:func:`setsim_prefix_pairs` from the (id, tok, n) token-row
    point — shared by the batch operator and the streaming-ingest
    twin (``stages/streaming.py::streaming_setsim_pairs``), whose
    shards hand over exactly this table at flush.  ``tokens`` must be
    materialized (three consumers: census, prefix map, verify)."""
    import pandas as pd
    import ray as _ray

    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.joins import adaptive_join

    n_rows = tokens.count()

    census = two_phase_sum(
        tokens.select_columns(["tok"]), ["tok"], [], count_as="df"
    )
    tok_df = adaptive_join(
        tokens,
        census,
        on="tok",
        big_schema=pa.schema(
            [(id_col, pa.int64()), ("tok", pa.int64()), ("n", pa.int64())]
        ),
        side_schema=pa.schema([("tok", pa.int64()), ("df", pa.int64())]),
    )

    n_coarse = coarse_width(n_rows)
    mask = np.int64(n_coarse - 1)

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(d)
        return t.append_column(
            "__coarse", pa.array(np.bitwise_and(h.view(np.int64), mask))
        )

    def prefix_block(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tok": np.empty(0, np.int64),
            id_col: np.empty(0, np.int64),
            "n": np.empty(0, np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(empty)
        d = g[id_col].to_numpy()
        tok = g["tok"].to_numpy()
        n = g["n"].to_numpy()
        df = g["df"].to_numpy()
        order = np.lexsort((tok, df, d))
        d, tok, n = d[order], tok[order], n[order]
        new = np.empty(d.size, dtype=bool)
        new[0] = True
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, d.size))
        rank = np.arange(d.size, dtype=np.int64) - np.repeat(starts, lens)
        # prefix length |d| - ceil(tau*|d|) + 1
        L = n - (tau_num * n + tau_den - 1) // tau_den + 1
        keep = rank < L
        return pd.DataFrame(
            {
                "tok": tok[keep],
                id_col: d[keep],
                "n": n[keep],
                "p": rank[keep],  # prefix position (positional filter)
            }
        )

    prefixes = _pairs_via_groups(
        tok_df.map_batches(add_doc_bucket, batch_format="pyarrow"),
        n_rows,
        prefix_block,
    )

    def add_tok_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__coarse",
            pa.array(
                np.bitwise_and(t["tok"].to_numpy(zero_copy_only=False), mask)
            ),
        )

    def pair_block(g: pd.DataFrame) -> pd.DataFrame:
        empty = {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
        if len(g) == 0:
            return pd.DataFrame(empty)
        tok = g["tok"].to_numpy()
        d = g[id_col].to_numpy()
        n = g["n"].to_numpy()
        p = g["p"].to_numpy()
        order = np.lexsort((d, tok))
        tok, d, n, p = tok[order], d[order], n[order], p[order]
        new = np.empty(tok.size, dtype=bool)
        new[0] = True
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, tok.size))
        out_a, out_b = [], []
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            run_d = d[s : s + m]
            run_n = n[s : s + m]
            run_p = p[s : s + m]
            i, j = np.triu_indices(int(m), 1)
            # length filter: J >= tau requires tau*max(|a|,|b|) <= min
            na, nb_ = run_n[i], run_n[j]
            ok = tau_num * np.maximum(na, nb_) <= tau_den * np.minimum(na, nb_)
            # positional filter (PPJoin): overlap <= 1 + min(remaining
            # tokens after this prefix position on either side), which
            # must reach alpha = ceil(tau/(1+tau) * (|a|+|b|))
            alpha = (tau_num * (na + nb_) + tau_num + tau_den - 1) // (
                tau_num + tau_den
            )
            ub = 1 + np.minimum(na - 1 - run_p[i], nb_ - 1 - run_p[j])
            ok &= ub >= alpha
            out_a.append(run_d[i][ok])
            out_b.append(run_d[j][ok])
        if not out_a:
            return pd.DataFrame(empty)
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = _pairs_via_groups(
        prefixes.map_batches(add_tok_bucket, batch_format="pyarrow"),
        n_rows,
        pair_block,
    )
    # materialize BEFORE the verify map: the small-tier candidate
    # dedup is a repartition(1) single task, and Ray fuses the
    # downstream map into it — without the break the verify of every
    # candidate ran serially in that one task (measured 24 s at sf0.1
    # vs ~1 s parallel over the 64k-row combine slices)
    pair_ds = (
        two_phase_sum(cand, ["a", "b"], [], count_as="__n")
        .select_columns(["a", "b"])
        .materialize()
    )

    from hexscape_ray.stages import joins as _joins

    if n_rows <= _joins.BROADCAST_ROWS:
        # pairs-heavy tier: broadcast the token table and verify the
        # (distributed) pair list batch-by-batch.  Two kernels:
        # BITSET when the vocab fits 1024 bits — per-doc bitmask rows,
        # inter = popcount(A & B) over ceil(v/64) words (degenerate
        # small-vocab corpora are exactly where candidates explode, and
        # this kernel costs ~nothing per pair; the 40M-row expansion
        # kernel it replaces was memory-bandwidth-bound: 61 s for 1.8M
        # candidates at sf0.1 vs <1 s bitset) — else a packed-key CSR
        # probe chunked by batch_size (cache-resident temporaries, the
        # HEXRAY_MINHASH_CHUNK lesson).
        tok_blocks = [
            t
            for t in _ray.get(
                tokens.select_columns([id_col, "tok"]).to_arrow_refs()
            )
            if t.num_rows
        ]
        tt = pa.concat_tables(tok_blocks)
        dd = tt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = tt["tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((kk, dd))
        dd, kk = dd[o], kk[o]
        docs_u, doc_start = np.unique(dd, return_index=True)
        doc_start = doc_start.astype(np.int64)
        doc_end = np.append(doc_start[1:], dd.size).astype(np.int64)
        vocab = np.unique(kk)
        v = vocab.size
        empty_out = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "inter_toks": pa.array([], pa.int64()),
                "union_toks": pa.array([], pa.int64()),
                "jac_x1m": pa.array([], pa.int64()),
            }
        )

        def finish(a, b, ig, la, lb):
            ug = la + lb - ig
            keep = tau_den * ig >= tau_num * ug
            return pa.table(
                {
                    "a": pa.array(a[keep].astype(np.int64)),
                    "b": pa.array(b[keep].astype(np.int64)),
                    "inter_toks": pa.array(ig[keep]),
                    "union_toks": pa.array(ug[keep]),
                    "jac_x1m": pa.array((1_000_000 * ig[keep]) // ug[keep]),
                }
            )

        if v <= 1024:
            words = -(-v // 64)
            bits = np.zeros((docs_u.size, words), dtype=np.uint64)
            dense = np.searchsorted(docs_u, dd)
            rank = np.searchsorted(vocab, kk)
            np.bitwise_or.at(
                bits,
                (dense, rank >> 6),
                np.uint64(1) << (rank.astype(np.uint64) & np.uint64(63)),
            )
            sizes = (doc_end - doc_start).astype(np.int64)
            bits_ref = _ray.put((docs_u, bits, sizes))

            def verify(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "a" not in batch.column_names:
                    return empty_out
                docs_u, bits, sizes = _ray.get(bits_ref)
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
                ia = np.searchsorted(docs_u, a)
                ib = np.searchsorted(docs_u, b)
                both = bits[ia] & bits[ib]
                # SWAR popcount per word, summed across words
                x = both
                m1 = np.uint64(0x5555555555555555)
                m2 = np.uint64(0x3333333333333333)
                m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
                x = x - ((x >> np.uint64(1)) & m1)
                x = (x & m2) + ((x >> np.uint64(2)) & m2)
                x = (x + (x >> np.uint64(4))) & m4
                pc_ = (
                    (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
                ).astype(np.int64)
                ig = pc_.sum(axis=1)
                return finish(a, b, ig, sizes[ia], sizes[ib])

        else:
            packed = (
                np.searchsorted(docs_u, dd).astype(np.int64) * v
                + np.searchsorted(vocab, kk)
            )
            csr_ref = _ray.put((docs_u, doc_start, doc_end, packed, vocab))

            def verify(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "a" not in batch.column_names:
                    return empty_out
                docs_u, ds_, de_, packed, vocab = _ray.get(csr_ref)
                v = vocab.size
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
                ia = np.searchsorted(docs_u, a)
                ib = np.searchsorted(docs_u, b)
                la = de_[ia] - ds_[ia]
                lb = de_[ib] - ds_[ib]
                # expand A's token ranks per pair, pack with B's dense
                # id, one searchsorted into packed counts the hits
                total = int(la.sum())
                cum = np.cumsum(la)
                intra = np.arange(total, dtype=np.int64) - np.repeat(
                    cum - la, la
                )
                flat = np.repeat(ds_[ia], la) + intra
                a_ranks = packed[flat] % v
                probe = np.repeat(ib.astype(np.int64) * v, la) + a_ranks
                pos = np.searchsorted(packed, probe)
                np.clip(pos, 0, packed.size - 1, out=pos)
                hit = (packed[pos] == probe).astype(np.int64)
                c = np.concatenate([[0], np.cumsum(hit)])
                ig = c[cum] - c[cum - la]
                return finish(a, b, ig, la, lb)

        # split the (possibly single-block) combined pair list so the
        # verify parallelises; 64k-pair batches keep temporaries small
        n_pairs = pair_ds.count()
        pair_ds = pair_ds.repartition(max(8, min(256, -(-n_pairs // 65536))))
        return pair_ds.map_batches(
            verify, batch_format="pyarrow", batch_size=65536
        )

    # corpus-scale tier: bounded candidate list through the shared
    # incidence-CSR verify (real vocabularies make prefix buckets
    # rare, so candidates stay ~true pairs)
    pair_blocks = [t for t in _ray.get(pair_ds.to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "inter_toks": pa.array([], pa.int64()),
            "union_toks": pa.array([], pa.int64()),
            "jac_x1m": pa.array([], pa.int64()),
        }
    )
    if not pair_blocks:
        return _ray.data.from_arrow(empty)
    ptab = pa.concat_tables(pair_blocks)
    a, b, ig, ug, _ = exact_pair_counts(
        tokens.select_columns([id_col, "tok"]), ptab, id_col, "tok"
    )
    keep = tau_den * ig >= tau_num * ug
    a, b, ig, ug = a[keep], b[keep], ig[keep], ug[keep]
    return _ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "inter_toks": pa.array(ig),
                "union_toks": pa.array(ug),
                "jac_x1m": pa.array((1_000_000 * ig) // ug),
            }
        )
    )
