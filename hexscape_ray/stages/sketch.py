"""Mergeable sketches: approximate distinct counting at corpus scale.

The exact two-level distinct (``distinct_users``) shuffles one row per
(key, member) pair — at 10^12 docs that is the corpus itself.  The
sketch path shuffles ONE fixed-size summary per key per block: each
batch emits a KMV (k-minimum-values) sketch of the members it saw;
sketches merge associatively in ``map_groups``; the estimator is
(k−1) / kth_smallest_normalised_hash.  Error ≈ 1/√(k−2)
(~10% at k=128, ~3% at k=1024).

KMV over HLL here because merge and estimate are 20 lines of numpy
with no bit-bucket bookkeeping; both are standard mergeable sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from hexscape_ray.functions.hashing import splitmix64

_M = float(2**64)


def _hash_members(values: np.ndarray) -> np.ndarray:
    """uint64 member hashes (integers mixed; strings via crc path)."""
    if values.dtype.kind in "iu":
        with np.errstate(over="ignore"):
            return splitmix64(values.astype(np.uint64))
    from zlib import crc32

    h32 = np.fromiter(
        (crc32(str(v).encode()) for v in values), dtype=np.uint64, count=len(values)
    )
    return splitmix64(h32)


def kmv_sketch_batches(
    ds: Dataset, key: str, member: str, k: int = 256
) -> Dataset:
    """Stage 1: one bottom-k sketch row per key per batch."""

    def sketch(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        h = _hash_members(batch[member].to_numpy(zero_copy_only=False))
        out_k, out_s = [], []
        order = np.argsort(keys, kind="stable")
        sk, sh = keys[order], h[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        ends = np.r_[starts[1:], sk.size]
        for s, e in zip(starts, ends):
            uniq = np.unique(sh[s:e])
            out_k.append(sk[s])
            out_s.append(uniq[:k].astype(np.int64))  # ascending bottom-k
        return pa.table(
            {
                key: pa.array(out_k),
                "kmv": pa.array([x.tolist() for x in out_s], type=pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(sketch, batch_format="pyarrow")


def kmv_merge_estimate(sketches: Dataset, key: str, k: int = 256) -> Dataset:
    """Stage 2: merge per-key sketches and estimate distinct counts."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        allh = np.unique(np.concatenate([np.asarray(x, dtype=np.uint64) for x in g["kmv"]]))
        bottom = allh[:k]
        if bottom.size < k:  # saw fewer than k distinct → exact
            est = float(bottom.size)
        else:
            kth = bottom[-1].astype(np.float64) / _M
            est = (k - 1) / kth
        return pd.DataFrame({key: [g[key].iloc[0]], "distinct_est": [est]})

    return sketches.groupby(key).map_groups(merge, batch_format="pandas")


def approx_distinct(ds: Dataset, key: str, member: str, k: int = 256) -> Dataset:
    """keyed approximate COUNT(DISTINCT member): sketch → merge."""
    return kmv_merge_estimate(kmv_sketch_batches(ds, key, member, k), key, k)


def misra_gries_heavy_hitters(
    ds: Dataset,
    col: str,
    support_num: int = 1,
    support_den: int = 200,
    k: int = 1024,
) -> Dataset:
    """EXACT frequent-items above a support threshold (count·den > num·n)
    with Misra–Gries-bounded memory — the two-pass heavy-hitter shape
    for columns whose distinct count dwarfs worker memory (hosts of a
    web crawl):

    pass 1 — each block compresses its exact value counts to ≤ ``k``
    MG counters (subtract the (k+1)-th largest count, drop ≤ 0; the
    undercount per surviving value is ≤ that pivot t_b ≤ n_b/(k+1)).
    Counters + per-block error bounds + per-block row counts travel as
    one small partial table through ``two_phase_sum`` — the shuffle
    never sees more than k+2 rows per block however many distinct
    values the block held.

    pass 2 — candidates = values whose summed counter + Σ t_b reaches
    the threshold (a GUARANTEED superset of the true heavy hitters,
    the MG invariant) are recounted exactly with a broadcast semi
    filter, and the exact threshold is applied.  Output is therefore
    bit-exact vs SQL ``HAVING count(*)·den > num·total`` whenever
    k > den/num (checked) — the sketch only bounds MEMORY, never
    changes the answer.
    """
    assert k > support_den // max(support_num, 1), "k must exceed 1/support"
    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.joins import broadcast_semi_anti

    def mg_block(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        if vals.size > k:
            t = np.partition(cnts, -(k + 1))[-(k + 1)]
            keep = cnts > t
            vals, cnts, err = vals[keep], cnts[keep] - t, int(t)
        else:
            err = 0
        return pa.table(
            {
                col: pa.array(
                    np.concatenate([vals, [0, 0]]).astype(vals.dtype)
                ),
                "cnt": pa.array(
                    np.concatenate(
                        [cnts, [err, len(batch)]]
                    ).astype(np.int64)
                ),
                # 0 = counter row, 1 = per-block error bound, 2 = row count
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(vals.size, np.int64), [1, 2]]
                    )
                ),
            }
        )

    partials = two_phase_sum(
        ds.map_batches(mg_block, batch_format="pyarrow"),
        [col, "kind"],
        ["cnt"],
        count_as=None,
    ).to_pandas()  # ≤ k·n_blocks rows: the sketch summary, driver-safe
    total = int(partials.loc[partials["kind"] == 2, "cnt"].sum())
    err = int(partials.loc[partials["kind"] == 1, "cnt"].sum())
    counters = partials[partials["kind"] == 0]
    thr_reached = (
        (counters["cnt"] + err) * support_den >= support_num * total
    )
    cand = counters.loc[thr_reached, col].to_numpy()

    exact = two_phase_sum(
        broadcast_semi_anti(ds.select_columns([col]), cand, on=col, how="semi"),
        [col],
        [],
        count_as="n_rows",
    )

    def final(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n * support_den > support_num * total))

    return exact.map_batches(final, batch_format="pyarrow")


def kmv_bottomk(ds: Dataset, member: str, k: int = 256) -> np.ndarray:
    """GLOBAL bottom-k member-hash sketch: per-block unique bottom-k
    partials (one k-sized list row per block — bottom-k is a mergeable
    reduction) combined on the coordinator.  Returns the ascending
    uint64 bottom-k of the distinct member hashes — the building block
    for KMV SET ALGEBRA (union/intersection/Jaccard estimates)."""

    def part(batch: pa.Table) -> pa.Table:
        h = _hash_members(batch[member].to_numpy(zero_copy_only=False))
        uniq = np.unique(h)[:k]
        return pa.table({"kmv": pa.array([uniq.astype(np.int64).tolist()],
                                         type=pa.list_(pa.int64()))})

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    allh = np.unique(
        np.concatenate(
            [np.asarray(r["kmv"], dtype=np.int64).view(np.uint64) for r in rows]
        )
        if rows
        else [np.empty(0, dtype=np.uint64)]
    )
    return allh[:k]


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — register-exact, SQL-replayable
# ---------------------------------------------------------------------------

_HLL_P = 8  # 256 registers; the SQL oracle is generated for this p
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 64 - _HLL_P  # 56 low bits feed rho
_HLL_RHO_MAX = _HLL_WBITS + 1  # 57 (w == 0)


def hll_partial_batches(key: str, member: str):
    """map_batches fn: rows → one (key, bucket, rho) max-partial per
    batch.  All uint64 shift/mask/compare — no 64-bit multiply in the
    hot path beyond the splitmix finaliser (SIMD-safe lesson)."""
    from hexscape_ray.functions.hashing import splitmix64

    def fn(batch: pa.Table) -> pa.Table:
        h = splitmix64(
            batch[member].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
        bucket = (h >> np.uint64(_HLL_WBITS)).astype(np.int64)
        w = h & np.uint64((1 << _HLL_WBITS) - 1)
        # vectorised bit_length(w) via the shift ladder (exact for the
        # full 56-bit domain — float tricks are not)
        bl = np.zeros(w.shape[0], dtype=np.int64)
        v = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= np.uint64(1 << s)
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += (v > 0).astype(np.int64)
        rho = _HLL_RHO_MAX - bl
        t = pa.table(
            {"__k": batch[key], "bucket": pa.array(bucket), "rho": pa.array(rho)}
        )
        out = t.group_by(["__k", "bucket"]).aggregate([("rho", "max")])
        return out.rename_columns(["__k", "bucket", "rho"])

    return fn


def hll_distinct(ds, key: str, member: str):
    """Per-``key`` approximate COUNT(DISTINCT member) via HyperLogLog:
    the shuffle moves ≤ 256 (key, bucket, rho) register rows per key
    per block — mergeable with plain MAX, so :func:`two_phase_agg`
    gives the exact global registers with partials-only exchange.

    The estimate is DETERMINISTIC given the registers and is
    reproduced BIT-EXACTLY by the SQL oracle: the harmonic-mean
    denominator Σ 2^-M_j is carried as the exact integer
    A = Σ 2^(57-M_j) (Python ints — A can reach m·2^57 = 2^65, past
    int64), split into (a_hi, a_lo) 32-bit limbs for the output; the
    float estimate mirrors the SQL parse tree term-for-term, with the
    small-range linear-counting branch (raw ≤ 2.5 m and empty
    registers exist → m·ln(m/V))."""
    import math

    from hexscape_ray.stages.agg import two_phase_agg

    regs = two_phase_agg(
        ds.map_batches(hll_partial_batches(key, member), batch_format="pyarrow"),
        ["__k", "bucket"],
        {"rho": "max"},
    )

    def finish(batch: pa.Table):
        yield hll_finish_pdf(batch.to_pandas())

    # registers are ≤ 256·n_keys rows — one remote task finishes
    return regs.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def hll_finish_pdf(pdf) -> pa.Table:
    """(__k, bucket, rho) register rows → the finished per-key HLL
    estimate table (shared by the batch and streaming paths — the
    float tree is the SQL-mirrored one)."""
    import math

    rows = []
    for k, g in pdf.groupby("__k", sort=True, dropna=False):
        rhos = g["rho"].to_numpy()
        n_present = int(rhos.shape[0])
        zeros = _HLL_M - n_present
        a = zeros * (1 << _HLL_RHO_MAX) + sum(
            1 << (_HLL_RHO_MAX - int(r)) for r in rhos
        )
        raw = (
            (0.7213 / (1.0 + 1.079 / 256.0))
            * 65536.0
            * 144115188075855872.0
            / float(a)
        )
        if raw <= 640.0 and zeros > 0:
            est = 256.0 * math.log(256.0 / float(zeros))
        else:
            est = raw
        rows.append(
            {
                "__k": k,
                "n_present": n_present,
                "zero_regs": zeros,
                "a_hi": a >> 32,
                "a_lo": a & 0xFFFFFFFF,
                "est_micro": int(math.floor(est * 1000000.0 + 0.5)),
            }
        )
    if rows:
        return pa.Table.from_pylist(rows)
    return pa.table(
        {
            "__k": pa.array([], pa.string()),
            "n_present": pa.array([], pa.int64()),
            "zero_regs": pa.array([], pa.int64()),
            "a_hi": pa.array([], pa.int64()),
            "a_lo": pa.array([], pa.int64()),
            "est_micro": pa.array([], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# AMS tug-of-war (Alon–Matias–Szegedy '96): F2 / join-size counters
# ---------------------------------------------------------------------------

# splitmix64((101+i)·golden) — frozen so the SQL oracles replay the chain
AMS_SEEDS = (
    13503535484124022352,
    2408493724061635637,
    3982550404562384204,
    13294168326748004708,
    3261115068336139168,
    3455560625584534064,
    8460542522771347084,
    6110809269160588848,
    7913444633578496900,
    5771536904359502584,
    9604845809122204929,
    11740533680882200126,
    2941170911402311377,
    2825475194127864941,
    6451737577027376737,
    14727207869371167581,
)


def ams_block_counters(keys_u64: np.ndarray) -> np.ndarray:
    """16 signed tug-of-war sums of one block's key column — the
    fully-additive AMS partial (merge = vector add, so batch two-phase
    reduction and streaming shard accumulation share this kernel)."""
    out = np.empty(16, dtype=np.int64)
    for i, seed in enumerate(AMS_SEEDS):
        bit = (splitmix64(keys_u64 ^ np.uint64(seed)) & np.uint64(1)).astype(
            np.int64
        )
        out[i] = int((2 * bit - 1).sum())
    return out
