"""Join stages.

- ``broadcast_join``: small side shipped once via ``ray.put`` and
  hash-joined inside ``map_batches`` (no shuffle) — the engine's J1/J5
  pattern (SURVEY §2.5); correct whenever one side fits in worker
  memory (dimension tables, code lookups, boundary attrs).
- ``bucketed_join``: both sides large → co-partition on
  ``hash(key) % B`` and join per bucket inside ``map_groups`` — the
  explicit partitioned hash join; B and salt documented per call site.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


class _BroadcastJoiner:
    """Actor-pool stage: resolve the broadcast ref once per actor."""

    def __init__(self, small_ref, on: str, how: str):
        self.small: pd.DataFrame = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(
    big: Dataset,
    small: pd.DataFrame,
    on: str,
    how: str = "inner",
    concurrency: int | tuple = (1, 4),
    batch_size: int = 65536,
) -> Dataset:
    ref = ray.put(small)
    return big.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def broadcast_semi_anti(
    big: Dataset,
    keys,
    on: str,
    how: str = "semi",
    batch_size: int = 65536,
    concurrency: int | tuple = (1, 8),
) -> Dataset:
    """Zero-shuffle EXISTS / NOT EXISTS against a SMALL key set — the
    blocklist/allowlist filter of a training-data pipeline (drop every
    page whose host is on a spam list; keep only docs whose id is in a
    curated sample).  ``keys`` (numpy array / pandas Series / list) is
    broadcast once via ``ray.put``; each batch keeps (``semi``) or
    drops (``anti``) rows by one vectorised Arrow ``is_in`` — the big
    side never moves, so this is the right shape whenever the key set
    fits in worker memory (millions of keys); for two genuinely large
    sides use ``bucketed_join(how='semi'|'anti')``."""
    assert how in ("semi", "anti")
    arr = pa.array(pd.unique(pd.Series(keys)))
    ref = ray.put(arr)

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # null keys match nothing: EXISTS drops them, NOT EXISTS
            # keeps them — fill null BEFORE the anti inversion
            m = pc.fill_null(pc.is_in(batch[on], value_set=self.keys), False)
            if how == "anti":
                m = pc.invert(m)
            return batch.filter(m)

    return big.map_batches(
        Filter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bloom_build(keys, bits_per_key: int = 12, n_hashes: int = 6):
    """Build a Bloom filter over an int key set → ``(bits, m, k)``.

    ``m`` is rounded to a power of two so probe positions are a mask,
    not a modulo; positions come from double hashing
    ``h1 + i·h2 (mod m)`` over two splitmix64 streams (Kirsch–
    Mitzenmacher: two independent hashes give k probes with the
    classic false-positive rate).  The inner loop ACCUMULATES ``+h2``
    instead of multiplying — numpy uint64 multiply has no SIMD path
    (measured ~100× slower; see CLAUDE.md perf notes).

    Defaults (12 bits/key, 6 probes) give ~0.3 % false positives —
    probes that survive are removed by the exact join that follows, so
    FP rate only costs shuffle volume, never correctness.
    """
    from hexscape_ray.functions.hashing import splitmix64

    ks = np.unique(np.asarray(keys, dtype=np.int64).view(np.uint64))
    m = 1 << max(6, int(np.ceil(np.log2(max(len(ks), 1) * bits_per_key + 1))))
    h1 = splitmix64(ks)
    h2 = splitmix64(h1) | np.uint64(1)
    bits = np.zeros(m >> 6, dtype=np.uint64)
    mask = np.uint64(m - 1)
    pos = h1.copy()
    for _ in range(n_hashes):
        p = pos & mask
        np.bitwise_or.at(bits, p >> np.uint64(6), np.uint64(1) << (p & np.uint64(63)))
        pos += h2
    return bits, m, n_hashes


def bloom_prefilter(
    big: Dataset,
    bloom,
    on: str,
    batch_size: int = 65536,
    concurrency: int | tuple = (1, 8),
) -> Dataset:
    """Drop rows of ``big`` whose key is DEFINITELY absent from the
    Bloom filter built by :func:`bloom_build` — the scale pattern for
    a selective join whose build side is too big to ship as an exact
    key array but whose bitset fits anywhere (12 bits/key: 100 M keys
    → 150 MB vs 800 MB of raw int64s + hash-set overhead).  Survivors
    still contain ~FP-rate impostors; ALWAYS follow with an exact join
    (broadcast or bucketed) — the bloom only cuts the rows that enter
    the expensive exchange.  One ``ray.put`` per filter, k gathers +
    shifts per batch, fully vectorised."""
    bits, m, k = bloom
    ref = ray.put(bits)
    mask64 = np.uint64(m - 1)

    class Probe:
        def __init__(self):
            from hexscape_ray.functions.hashing import splitmix64

            self.bits = ray.get(ref)
            self.splitmix64 = splitmix64

        def __call__(self, batch: pa.Table) -> pa.Table:
            kk = np.asarray(
                batch[on].to_numpy(zero_copy_only=False), dtype=np.int64
            ).view(np.uint64)
            h1 = self.splitmix64(kk)
            h2 = self.splitmix64(h1) | np.uint64(1)
            hit = np.ones(len(kk), dtype=bool)
            pos = h1
            for _ in range(k):
                p = pos & mask64
                word = self.bits[(p >> np.uint64(6)).astype(np.int64)]
                hit &= (word >> (p & np.uint64(63))) & np.uint64(1) != 0
                pos = pos + h2
            return batch.filter(pa.array(hit))

    return big.map_batches(
        Probe,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


JOIN_BUCKET_TARGET_BYTES = 64 << 20  # ~64 MB of joined input per bucket task


def _safe_size_bytes(ds: Dataset) -> int | None:
    """Metadata-only size probe: a value for a MATERIALIZED dataset or
    a bare SOURCE (read_parquet / from_arrow / from_pandas — size comes
    from file or block metadata), ``None`` for any lazy pipeline —
    probing those would execute them once and the consumer would then
    re-execute (the measured round-2/3 recompute trap that motivated
    the ``*_schema`` params)."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds.size_bytes()
        if not ds._plan._logical_plan.dag.input_dependencies:
            return ds.size_bytes()  # source op: metadata only
    except Exception:
        return None
    return None


def derive_n_buckets(*sides: Dataset, default: int = 64) -> int:
    """Bucket count for the co-partitioned joins, scaled from the
    inputs' combined size so each bucket group stays ~
    ``JOIN_BUCKET_TARGET_BYTES`` (bounded per-task memory, parallelism
    grows with data — round-3 verdict #5, mirroring the native join's
    ``num_partitions`` derivation).  Sides whose size can't be probed
    without executing them count as zero; if NO side is probe-able the
    ``default`` (the historical 64) is returned."""
    total, probed = 0, False
    for s in sides:
        b = _safe_size_bytes(s)
        if b is not None:
            total += b
            probed = True
    if not probed:
        return default
    return int(min(65536, max(default, -(-total // JOIN_BUCKET_TARGET_BYTES))))


def bucketed_join(
    left: Dataset,
    right: Dataset,
    on,
    n_buckets: int | None = None,
    how: str = "inner",
    left_schema=None,
    right_schema=None,
) -> Dataset:
    """Partitioned hash join: tag both sides with bucket = key % B (a
    cheap integer hash is enough for int keys), union with a side tag,
    then join inside each bucket group.  One shuffle total.  ``on``
    may be a single column name or a LIST of names (composite key:
    per-column hashes xor-mixed through splitmix64 so the bucket
    depends on the whole tuple).

    EXECUTION CONTRACT (round-2 verdict #8): building the union schema
    needs each side's schema up front, and ``Dataset.schema()``
    PARTIALLY EXECUTES a lazy pipeline — whose work is then REDONE when
    ``tag()`` consumes the side (Ray Data recomputes a lazy Dataset per
    consumer; the builder's measured round-2 perf trap, 96 s → 12 s on
    the minhash path).  Callers with a non-trivial upstream pipeline
    should either (a) pass ``left_schema`` / ``right_schema``
    (``ray.data.Schema`` or anything with ``.names`` / ``.types``) so
    no schema probe runs, or (b) ``materialize()`` the side first —
    a materialised side is both probed and consumed for free.  Sides
    that are direct parquet reads are fine as-is (schema comes from
    file metadata)."""

    if n_buckets is None:  # size-derived width (metadata-only probes)
        n_buckets = derive_n_buckets(left, right)
    on_cols = [on] if isinstance(on, str) else list(on)
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)

    def _arrow_type(t) -> pa.DataType:
        # pandas-backed Datasets report numpy dtypes / Python classes
        # (e.g. `str`) instead of Arrow DataTypes — normalise
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        if t is bytes:
            return pa.binary()
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    # pad each side to the union schema with typed nulls so the two
    # Datasets share one Arrow schema and can union
    all_fields = [(n, _arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    all_fields += [
        (n, _arrow_type(t))
        for n, t in zip(rschema.names, rschema.types)
        if n not in lcols
    ]

    def _col_hash(kcol) -> np.ndarray:
        from hexscape_ray.functions.hashing import fnv1a_64_str_array, splitmix64

        if pa.types.is_integer(kcol.type):
            with np.errstate(over="ignore"):
                return splitmix64(
                    np.asarray(
                        kcol.to_numpy(zero_copy_only=False), dtype=np.int64
                    ).view(np.uint64)
                )
        return fnv1a_64_str_array(kcol.to_pylist())

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            if len(on_cols) == 1 and pa.types.is_integer(batch[on_cols[0]].type):
                # single int key: plain modulo (cheapest, historical shape)
                k = np.asarray(
                    batch[on_cols[0]].to_numpy(zero_copy_only=False), dtype=np.int64
                )
                bucket = np.abs(k) % n_buckets
            else:  # composite and/or string keys: mixed content hash
                h = _col_hash(batch[on_cols[0]])
                for c in on_cols[1:]:
                    from hexscape_ray.functions.hashing import splitmix64

                    with np.errstate(over="ignore"):
                        h = splitmix64(h ^ _col_hash(batch[c]))
                bucket = (h % np.uint64(n_buckets)).astype(np.int64)
            cols = {}
            for name, typ in all_fields:
                cols[name] = (
                    batch[name] if name in batch.column_names else pa.nulls(len(batch), typ)
                )
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(np.repeat(side, len(batch)))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag("L"), batch_format="pyarrow").union(
        right.map_batches(tag("R"), batch_format="pyarrow")
    )

    # pandas `how` -> Acero join_type.  The per-bucket join runs in Arrow
    # (pa.Table.join) so the typed nulls from the union padding never pass
    # through pandas — an int64 column with nulls would otherwise come back
    # float64+NaN and the wrong dtype would survive downstream aggregation
    # (the round-1 segment_order_stats hash failure).
    join_type = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
        # EXISTS / NOT EXISTS semantics: keep (semi) or drop (anti)
        # left rows that have ≥1 key match on the right; output is the
        # LEFT columns only, never duplicated by multiple right matches.
        # Correct under co-partitioning because hash(key) % B puts every
        # right row with a given key in the same bucket as its probes.
        "semi": "left semi",
        "anti": "left anti",
    }[how]

    typed = dict(all_fields)
    l_target = pa.schema([(n, typed[n]) for n in lcols])
    r_target = pa.schema([(n, typed[n]) for n in rcols])

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_left = pc.equal(g["__side"], "L")
        # cast restores declared dtypes on blocks whose columns degraded
        # to null type (an empty upstream block's schema can infect the
        # shuffled group); null→T casts are valid for all-null columns
        lg = g.filter(is_left).select(lcols).cast(l_target)
        rg = g.filter(pc.invert(is_left)).select(rcols).cast(r_target)
        out = lg.join(rg, keys=on_cols, join_type=join_type)
        # Acero's output column order can vary; fix it to lcols + new rcols
        # (semi/anti emit the left side only).
        if join_type in ("left semi", "left anti"):
            return out.select(lcols)
        ordered = lcols + [c for c in rcols if c not in on_cols]
        return out.select(ordered)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left: Dataset,
    right: Dataset,
    on,
    left_time: str,
    right_time: str,
    how: str = "inner",
    n_buckets: int | None = None,
    left_schema=None,
    right_schema=None,
    right_dedup: tuple[str, str] | None = None,
    direction: str = "backward",
    tolerance=None,
) -> Dataset:
    """AS-OF join — for every left row, the matching right row with the
    LARGEST ``right_time`` ≤ ``left_time`` within the same ``on`` key
    (the time-series alignment operator Ray Data's join API lacks;
    DuckDB's native ASOF JOIN is the oracle).

    ``direction="forward"`` flips the match to the SMALLEST
    ``right_time`` ≥ ``left_time`` (the next-event alignment; oracle =
    DuckDB ASOF over negated times).  ``tolerance`` (same units as the
    time columns) drops matches with ``|right_time − left_time| >
    tolerance`` — pandas ``merge_asof`` semantics.  ``on`` may be a
    LIST of columns (composite ``by``-key, e.g. (symbol, venue)):
    buckets come from xor-mixed per-column hashes and the in-bucket
    factorisation folds column-by-column, tuple-exact.

    EXECUTION CONTRACT (same as :func:`bucketed_join`): the union
    padding needs each side's schema up front, and ``Dataset.schema()``
    PARTIALLY EXECUTES a lazy upstream pipeline which ``tag`` then
    consumes again.  Callers with expensive lazy inputs (a
    ``groupby().aggregate()`` right side, a multi-stage transform)
    should either (a) pass ``left_schema`` / ``right_schema``
    (``pa.schema`` or anything with ``.names``/``.types``) so nothing
    executes before the single real pass, or (b) ``materialize()``
    the input first.

    Composition: both sides are co-partitioned on ``hash(key) % B``
    (same one-shuffle tag-union as :func:`bucketed_join`); inside each
    bucket BOTH sides are matched with ONE vectorised ``searchsorted``
    over a (key-code, time-rank) composite — no per-key Python scan
    (the round-2 O(K·R) inner loop), O((L+R)·log) per bucket.

    The per-bucket match runs Arrow-natively (filter → cast to the
    declared side schema → numpy kernel → rebuild ``pa.Table``), so
    the typed nulls from the union padding never pass through pandas —
    int64 columns (ids, epoch-us) keep their dtype instead of
    degrading to float64+NaN (the same nulls→NaN class the
    ``bucketed_join`` Arrow rewrite fixed; values >2^53 would lose
    precision silently).

    Determinism note: if several right rows share (key, right_time),
    which one matches is ambiguous — deduplicate the right side for
    reproducible output.  ``right_dedup=(col, "max"|"min")`` does this
    INSIDE the bucket kernel (keep the max/min ``col`` per
    (key, right_time)): because the right side is already
    co-partitioned by ``hash(key)``, every duplicate lands in the same
    bucket, so the in-bucket dedup is globally exact and costs one
    ``lexsort`` instead of a SECOND all-to-all
    ``groupby(key, time).aggregate(Max)`` over the full right side —
    at scale that halves the shuffles this operator needs (measured
    here: the standalone Aggregate was ~8 s of a 13 s query at sf0.1).
    ``how='left'`` keeps unmatched left rows with nulls; 'inner' drops
    them.
    """
    if n_buckets is None:  # size-derived width (metadata-only probes)
        n_buckets = derive_n_buckets(left, right)
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    on_cols = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in rcols if c not in on_cols and c != right_time]

    def _khash(kcol) -> np.ndarray:
        from hexscape_ray.functions.hashing import fnv1a_64_str_array, splitmix64

        if pa.types.is_integer(kcol.type):
            with np.errstate(over="ignore"):
                return splitmix64(
                    np.asarray(
                        kcol.to_numpy(zero_copy_only=False), dtype=np.int64
                    ).view(np.uint64)
                )
        return fnv1a_64_str_array(kcol.to_pylist())

    def tag(side: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            from hexscape_ray.functions.hashing import splitmix64

            h = _khash(batch[on_cols[0]])
            for c in on_cols[1:]:
                with np.errstate(over="ignore"):
                    h = splitmix64(h ^ _khash(batch[c]))
            out = {c: batch[c] for c in cols}
            out["__bucket"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
            out["__side"] = pa.array(np.repeat(side, len(batch)))
            return pa.table(out)

        return fn

    # pad to the union schema with typed nulls so the sides can union
    def pad(batch: pa.Table, want: list[tuple[str, pa.DataType]]) -> pa.Table:
        cols = {}
        for name, typ in want:
            cols[name] = (
                batch[name] if name in batch.column_names else pa.nulls(len(batch), typ)
            )
        for extra in ("__bucket", "__side"):
            cols[extra] = batch[extra]
        return pa.table(cols)

    def _arrow_type(t):
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    fields = [(n, _arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    fields += [
        (n, _arrow_type(t))
        for n, t in zip(rschema.names, rschema.types)
        if n not in lcols
    ]

    tagged = (
        left.map_batches(tag("L", lcols), batch_format="pyarrow")
        .map_batches(lambda b: pad(b, fields), batch_format="pyarrow")
        .union(
            right.map_batches(tag("R", rcols), batch_format="pyarrow").map_batches(
                lambda b: pad(b, fields), batch_format="pyarrow"
            )
        )
    )

    typed = dict(fields)
    l_target = pa.schema([(n, typed[n]) for n in lcols])
    r_target = pa.schema([(n, typed[n]) for n in rcols])
    out_rcols = r_payload + [right_time]

    def _empty() -> pa.Table:
        return pa.table(
            {
                **{c: pa.nulls(0, typed[c]) for c in lcols},
                **{c: pa.nulls(0, typed[c]) for c in out_rcols},
            }
        )

    def match(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_left = pc.equal(g["__side"], "L")
        # cast restores declared dtypes on blocks whose padded columns
        # degraded to null type (same guard as bucketed_join)
        lg = g.filter(is_left).select(lcols).cast(l_target)
        rg = g.filter(pc.invert(is_left)).select(rcols).cast(r_target)
        nl, nr = len(lg), len(rg)
        if nl == 0:
            return _empty()

        # joint key factorisation (works for int AND string keys; a
        # composite `on` folds column-by-column with re-factorisation so
        # the code stays < rows), then one composite code*M + time-rank
        # per row: right sorted by the composite IS right sorted by
        # (key, time), so a single searchsorted(side="right")−1 lands
        # every left row on the latest right row with the same key and
        # right_time ≤ left_time.
        codes = None
        for c in on_cols:
            lk = lg[c].to_numpy(zero_copy_only=False)
            rk = rg[c].to_numpy(zero_copy_only=False)
            u, ccodes = np.unique(np.concatenate([lk, rk]), return_inverse=True)
            ccodes = ccodes.astype(np.int64)
            if codes is None:
                codes = ccodes
            else:  # fold: tuple-exact, re-factorised to stay small
                _, codes = np.unique(
                    codes * np.int64(u.size) + ccodes, return_inverse=True
                )
                codes = codes.astype(np.int64)
        lcode, rcode = codes[:nl], codes[nl:]
        lt = lg[left_time].to_numpy(zero_copy_only=False)
        rt = rg[right_time].to_numpy(zero_copy_only=False)
        tsorted = np.unique(np.concatenate([lt, rt]))
        M = np.int64(tsorted.size + 1)
        lcomp = lcode * M + np.searchsorted(tsorted, lt)
        rcomp = rcode * M + np.searchsorted(tsorted, rt)
        if right_dedup is not None and nr:
            dcol, dmode = right_dedup
            v = rg[dcol].to_numpy(zero_copy_only=False)
            # sort by (composite, value); keeping the LAST row per
            # composite keeps the max value (min: negate the order)
            o2 = np.lexsort((v if dmode == "max" else -v, rcomp))
            keep = np.ones(nr, dtype=bool)
            keep[:-1] = rcomp[o2][1:] != rcomp[o2][:-1]
            sel = np.sort(o2[keep])
            rg = rg.take(pa.array(sel))
            rcode, rcomp, rt = rcode[sel], rcomp[sel], rt[sel]
            nr = len(sel)
        order = np.argsort(rcomp, kind="stable") if nr else np.empty(0, np.int64)
        if direction == "forward":
            idx = np.searchsorted(rcomp[order] if nr else rcomp, lcomp, side="left")
            inb = idx < nr
            cand = order[np.clip(idx, None, max(nr - 1, 0))] if nr else np.zeros(nl, np.int64)
        else:
            idx = np.searchsorted(rcomp[order] if nr else rcomp, lcomp, side="right") - 1
            inb = idx >= 0
            cand = order[np.clip(idx, 0, None)] if nr else np.zeros(nl, np.int64)
        ok = inb & (rcode[cand] == lcode) if nr else np.zeros(nl, bool)
        if tolerance is not None and nr:
            dt = np.abs(rt[cand].astype(np.float64) - lt.astype(np.float64))
            ok &= dt <= tolerance

        if how == "left":
            sel_l = np.arange(nl)
            # null index → null output value: typed nulls, never NaN
            ridx = pa.array(np.where(ok, cand, 0), mask=~ok)
        else:
            sel_l = np.flatnonzero(ok)
            ridx = pa.array(cand[ok])
        cols = {c: lg[c].take(pa.array(sel_l)) for c in lcols}
        for c in out_rcols:
            cols[c] = rg[c].take(ridx) if nr else pa.nulls(len(sel_l), typed[c])
        return pa.table(cols)

    return tagged.groupby("__bucket").map_groups(match, batch_format="pyarrow")


def range_join_broadcast(
    big: Dataset,
    intervals: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> Dataset:
    """Range join — attach to every row the interval containing its
    value (``lo ≤ value < hi``), for a SMALL side of NON-OVERLAPPING
    intervals (bands, buckets, tariffs — the common case).

    Scale shape: the interval table broadcasts once via ``ray.put``
    and each batch resolves membership with one vectorised
    ``searchsorted`` against the sorted interval starts — no shuffle
    at all, O(log m) per row.  Rows outside every interval are
    dropped (inner semantics).  Overlapping intervals would need an
    interval tree; assert-guarded.
    """
    iv = intervals.sort_values(lo_col, ignore_index=True)
    los = iv[lo_col].to_numpy()
    his = iv[hi_col].to_numpy()
    if not (his[:-1] <= los[1:]).all():
        raise ValueError(
            "range_join_broadcast requires non-overlapping intervals; "
            "use range_join_intervals for the general overlapping case"
        )
    ref = ray.put((los, his, iv))

    class Binner:
        def __init__(self):
            self.los, self.his, self.iv = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch[value_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.los, v, side="right") - 1
            ok = (idx >= 0) & (v < self.his[np.clip(idx, 0, None)])
            sel = np.flatnonzero(ok)
            out = {c: batch[c].take(pa.array(sel)) for c in batch.column_names}
            for c in self.iv.columns:
                out[c] = pa.array(self.iv[c].to_numpy()[idx[sel]])
            return pa.table(out)

    return big.map_batches(
        Binner, batch_format="pyarrow", batch_size=65536, concurrency=(1, 8)
    )


def range_join_intervals(
    big: Dataset,
    intervals: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> Dataset:
    """General range join — attach to every row EVERY interval
    containing its value (``lo ≤ value < hi``), intervals may OVERLAP
    and nest arbitrarily (the case :func:`range_join_broadcast`'s
    non-overlap assert excludes).  One input row → k output rows when
    k intervals contain it; rows inside no interval are dropped
    (inner semantics, matching ``JOIN ... ON v >= lo AND v < hi``).

    Scale shape: the m broadcast intervals are decomposed ONCE
    driver-side into ≤ 2m−1 ELEMENTARY segments between sorted
    endpoint boundaries; each segment stores its covering interval
    ids in one flat CSR array (offsets + ids, built in O(m²) worst
    case — fine for a broadcast-small side).  Per batch the lookup is
    one vectorised ``searchsorted`` into the boundaries plus a CSR
    gather (``np.repeat`` + cumsum arithmetic) — no shuffle, no
    per-row Python, O(log m + output) per row.  This is the classic
    stab-query flattening of an interval tree; for a LARGE interval
    side the same decomposition would be range-partitioned by
    boundary instead of broadcast.
    """
    m = len(intervals)
    iv = intervals.reset_index(drop=True)
    los = np.asarray(iv[lo_col].to_numpy(), dtype=np.float64)
    his = np.asarray(iv[hi_col].to_numpy(), dtype=np.float64)
    bounds = np.unique(np.concatenate([los, his]))  # sorted endpoints
    n_seg = bounds.size - 1  # elementary segments [bounds[j], bounds[j+1])
    # (segment, interval) covering pairs: interval i covers exactly the
    # contiguous segment run [idx(lo_i), idx(hi_i))
    seg_lo = np.searchsorted(bounds, los)
    seg_hi = np.searchsorted(bounds, his)
    counts_i = seg_hi - seg_lo
    iv_of_pair = np.repeat(np.arange(m, dtype=np.int64), counts_i)
    seg_of_pair = (
        np.arange(counts_i.sum(), dtype=np.int64)
        - np.repeat(np.cumsum(counts_i) - counts_i, counts_i)
        + np.repeat(seg_lo, counts_i)
    )
    order = np.argsort(seg_of_pair, kind="stable")  # CSR by segment
    ids = iv_of_pair[order]
    offsets = np.zeros(n_seg + 1, dtype=np.int64)
    np.add.at(offsets, seg_of_pair + 1, 1)
    offsets = np.cumsum(offsets)
    ref = ray.put((bounds, offsets, ids, iv))

    class Stab:
        def __init__(self):
            self.bounds, self.offsets, self.ids, self.iv = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            seg = np.searchsorted(self.bounds, v, side="right") - 1
            inside = (seg >= 0) & (seg < self.bounds.size - 1)
            seg = np.clip(seg, 0, self.bounds.size - 2)
            cnt = np.where(inside, self.offsets[seg + 1] - self.offsets[seg], 0)
            rows = np.repeat(np.arange(len(v), dtype=np.int64), cnt)
            # CSR gather: position within each row's run + run start
            pos = (
                np.arange(int(cnt.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + np.repeat(self.offsets[seg], cnt)
            )
            matches = self.ids[pos]
            out = {c: batch[c].take(pa.array(rows)) for c in batch.column_names}
            for c in self.iv.columns:
                out[c] = pa.array(self.iv[c].to_numpy()[matches])
            return pa.table(out)

    return big.map_batches(
        Stab, batch_format="pyarrow", batch_size=65536, concurrency=(1, 8)
    )


def range_join_partitioned(
    big: Dataset,
    intervals: Dataset,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    n_ranges: int = 64,
    big_schema=None,
    intervals_schema=None,
    edges=None,
) -> Dataset:
    """DISTRIBUTED general interval join — every (row, interval) pair
    with ``lo ≤ value < hi``, intervals arbitrarily overlapping or
    nested, and the interval side a full ``Dataset`` (the case
    :func:`range_join_intervals` can't take: an interval table too
    large to broadcast).

    Scale shape: the value domain ``[min lo, max hi)`` (one tiny
    aggregate pass over the interval side) is cut into ``n_ranges``
    equal-width cells.  Every probe row lands in EXACTLY ONE cell (so
    no output dedup is ever needed); every interval is replicated to
    each cell it overlaps (``Σ ceil(width/cell)`` copies — bounded by
    m + total_span/cell_width).  One union + ``groupby(cell)`` shuffle
    co-locates both sides; within a cell the match is the same
    elementary-segment CSR stab query as the broadcast form — one
    searchsorted + CSR gather, no per-row Python.  Equal-width cells
    assume a roughly uniform probe domain; for heavy value skew feed
    ``edges`` from the histogram quantile sketch
    (``stages.agg.approx_quantiles_histogram``) instead — the kernel
    is edge-agnostic.

    Same ``.schema()`` partial-execution contract as
    :func:`bucketed_join`: pass ``big_schema`` / ``intervals_schema``
    for sides with non-trivial upstream pipelines.  Column names of
    the two sides must be disjoint.
    """
    from ray.data.aggregate import Max, Min

    bschema = big_schema if big_schema is not None else big.schema()
    ischema = intervals_schema if intervals_schema is not None else intervals.schema()
    bcols, icols = list(bschema.names), list(ischema.names)
    assert not set(bcols) & set(icols), "side column names must be disjoint"

    if edges is None:
        dom = intervals.aggregate(
            Min(lo_col, alias_name="lo_min"), Max(hi_col, alias_name="hi_max")
        )
        lo_min, hi_max = float(dom["lo_min"]), float(dom["hi_max"])
        edges = np.linspace(lo_min, hi_max, n_ranges + 1)
    else:  # e.g. quantile-sketch edges for a skewed probe domain
        edges = np.asarray(edges, dtype=np.float64)
        assert edges.size >= 2 and (np.diff(edges) >= 0).all(), "edges must ascend"
    n_ranges = edges.size - 1
    edges_ref = ray.put(edges)

    def _arrow_type(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    all_fields = [(n, _arrow_type(t)) for n, t in zip(bschema.names, bschema.types)]
    all_fields += [(n, _arrow_type(t)) for n, t in zip(ischema.names, ischema.types)]
    out_schema = pa.schema(all_fields)

    def pad(t: pa.Table, cell: np.ndarray, side: int) -> pa.Table:
        cols = {}
        for name, typ in all_fields:
            if name in t.column_names:
                cols[name] = t[name].combine_chunks() if t[name].num_chunks > 1 else t[name]
            else:
                cols[name] = pa.nulls(len(t), typ)
        tbl = pa.table(cols)
        tbl = tbl.append_column("__cell", pa.array(cell.astype(np.int64)))
        return tbl.append_column(
            "__side", pa.array(np.full(len(t), side, dtype=np.int8))
        )

    def tag_probe(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cell = np.searchsorted(e, v, side="right") - 1
        ok = (cell >= 0) & (cell < n_ranges)  # outside the domain → no match
        batch = batch.filter(pa.array(ok))
        return pad(batch, cell[ok], 0)

    def tag_interval(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c_lo = np.clip(np.searchsorted(e, lo, side="right") - 1, 0, n_ranges - 1)
        c_hi = np.clip(np.searchsorted(e, hi, side="left") - 1, 0, n_ranges - 1)
        cnt = np.maximum(c_hi - c_lo + 1, 0)
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        cell = (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(c_lo, cnt)
        )
        return pad(batch.take(pa.array(rows)), cell, 1)

    def stab(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        p = g.filter(pa.array(side == 0))
        iv = g.filter(pa.array(side == 1))
        empty = pa.table(
            {n: pa.array([], t) for n, t in zip(out_schema.names, out_schema.types)}
        )
        if len(p) == 0 or len(iv) == 0:
            return empty
        los = iv[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        his = iv[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = len(iv)
        bounds = np.unique(np.concatenate([los, his]))
        seg_lo = np.searchsorted(bounds, los)
        seg_hi = np.searchsorted(bounds, his)
        counts_i = np.maximum(seg_hi - seg_lo, 0)  # lo >= hi → empty interval
        iv_of_pair = np.repeat(np.arange(m, dtype=np.int64), counts_i)
        seg_of_pair = (
            np.arange(int(counts_i.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(counts_i) - counts_i, counts_i)
            + np.repeat(seg_lo, counts_i)
        )
        order = np.argsort(seg_of_pair, kind="stable")
        ids = iv_of_pair[order]
        offsets = np.zeros(bounds.size, dtype=np.int64)
        np.add.at(offsets, seg_of_pair + 1, 1)
        offsets = np.cumsum(offsets)

        v = p[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        seg = np.searchsorted(bounds, v, side="right") - 1
        inside = (seg >= 0) & (seg < bounds.size - 1)
        seg = np.clip(seg, 0, bounds.size - 2)
        cnt = np.where(inside, offsets[seg + 1] - offsets[seg], 0)
        rows = np.repeat(np.arange(len(v), dtype=np.int64), cnt)
        pos = (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(offsets[seg], cnt)
        )
        matches = ids[pos]
        out = {c: p[c].take(pa.array(rows)) for c in bcols}
        for c in icols:
            out[c] = iv[c].take(pa.array(matches))
        return pa.table(out)

    tagged = big.map_batches(tag_probe, batch_format="pyarrow").union(
        intervals.map_batches(tag_interval, batch_format="pyarrow")
    )
    return tagged.groupby("__cell").map_groups(stab, batch_format="pyarrow")


def interval_self_join_census(
    events: Dataset,
    key: str,
    time_col: str,
    label_col: str,
    window: int,
    n_buckets: int | None = None,
) -> Dataset:
    """Stream-stream WINDOW JOIN census: for every ordered pair of rows
    (a, b) sharing ``key`` with ``a.time − window ≤ b.time < a.time``
    (strictly earlier partner within the lookback window), count pairs
    per (label_a, label_b) — the co-occurrence / attribution primitive
    (e.g. "which event types precede a purchase within 5 minutes").

    Shape: ONE shuffle co-partitions rows by ``hash(key) % B`` (same
    tag pattern as :func:`bucketed_join`); inside each bucket rows are
    sorted once by a (key-code, time-rank) composite and every row
    finds its window span with TWO vectorised ``searchsorted`` calls
    (lo = first partner ≥ t−window, hi = first partner ≥ t); the
    per-pair label expansion is a CSR ``np.repeat`` gather.  Output is
    the tiny (label × label) census — the pair set itself never
    materialises beyond each batch.

    Oracle: the equivalent interval-predicate SQL self-join.
    """
    import pyarrow.compute as pc

    if n_buckets is None:  # size-derived width (metadata-only probes)
        n_buckets = derive_n_buckets(events)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        if not np.issubdtype(np.asarray(k).dtype, np.integer):
            from hexscape_ray.functions.hashing import fnv1a_64_str_array

            k = fnv1a_64_str_array(batch[key].to_pylist()).astype(np.int64)
        return pa.table(
            {
                key: batch[key],
                time_col: batch[time_col],
                label_col: batch[label_col],
                "__bucket": pa.array(np.abs(np.asarray(k, dtype=np.int64)) % n_buckets),
            }
        )

    def census(g: pa.Table) -> pa.Table:
        keys = g[key].to_numpy(zero_copy_only=False)
        t = g[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = g[label_col]
        # per-key time ordering via one composite sort (key-code ×
        # time-rank) — same trick as asof_join
        _, code = np.unique(keys, return_inverse=True)
        tsorted = np.unique(t)
        M = np.int64(tsorted.size + 1)
        comp = code.astype(np.int64) * M + np.searchsorted(tsorted, t)
        order = np.argsort(comp, kind="stable")
        cs, ts_ = code[order], t[order]
        # window span per row: partners are rows of the same key with
        # ts in [t-window, t) — two searchsorted over the sorted comp
        comp_s = comp[order]
        r_lo = np.searchsorted(tsorted, ts_ - window, side="left")
        lo = np.searchsorted(comp_s, cs.astype(np.int64) * M + r_lo, side="left")
        hi = np.searchsorted(comp_s, comp_s, side="left")  # first index of own (key,time)
        cnt = hi - lo
        # CSR expansion: pair (a=row i, b=rows lo[i]..hi[i]-1)
        rows_a = np.repeat(np.arange(cs.size, dtype=np.int64), cnt)
        pos = (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        la = lab.take(pa.array(order[rows_a]))
        lb = lab.take(pa.array(order[pos]))
        out = pa.table({"label_a": la, "label_b": lb}).group_by(
            ["label_a", "label_b"]
        ).aggregate([([], "count_all")])
        # name-based rename: pyarrow group_by column order varies
        out = out.rename_columns(
            ["n_pairs" if c == "count_all" else c for c in out.column_names]
        )
        return out.select(["label_a", "label_b", "n_pairs"])

    tagged = events.map_batches(tag, batch_format="pyarrow")
    partial = tagged.groupby("__bucket").map_groups(census, batch_format="pyarrow")
    from hexscape_ray.stages.agg import two_phase_sum

    return two_phase_sum(
        partial, ["label_a", "label_b"], ["n_pairs"], count_as=None
    )


def salted_join(
    big: Dataset,
    small: Dataset,
    on: str,
    n_salt: int = 16,
    n_buckets: int | None = None,
    big_schema=None,
    small_schema=None,
) -> Dataset:
    """Skew-proof equi-join: the BIG side's hot keys are sharded across
    ``n_salt`` sub-keys, the SMALL side is replicated once per salt, and
    the join runs on the packed composite ``key·n_salt + salt`` — so a
    key owning 30 % of the big side (one viral host, one null-ish
    default user) lands in ``n_salt`` parallel bucket tasks instead of
    one straggler.  Result rows are bit-identical to the unsalted join
    (each big row meets exactly one replica of its small-side match).

    Trade-off, stated: small-side shuffle volume ×``n_salt`` buys big-
    side balance — the right trade whenever ``|small|·n_salt ≪ |big|``.
    Keys must be non-negative ints with ``key·n_salt`` inside int64
    (checked).  For a small side that fits in memory use
    ``broadcast_join`` (zero shuffle); this is for the middle regime
    where BOTH sides are too big to broadcast AND the big side is
    skewed.
    """
    assert n_salt >= 2
    if n_buckets is None:  # probe the RAW sides (the salted ones are lazy)
        n_buckets = derive_n_buckets(big, small)

    def salt_big(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size:
            assert k.min() >= 0 and k.max() <= (2**62) // n_salt, "key out of range"
        # cheap deterministic row-spread: row position within the batch
        salt = np.arange(k.size, dtype=np.int64) % n_salt
        return batch.append_column("__ks", pa.array(k * n_salt + salt))

    def replicate_small(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size:
            assert k.min() >= 0 and k.max() <= (2**62) // n_salt, "key out of range"
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_salt)
        rep = batch.take(pa.array(idx))
        salt = np.tile(np.arange(n_salt, dtype=np.int64), n)
        return rep.append_column("__ks", pa.array(k.repeat(n_salt) * n_salt + salt))

    big_s = big.map_batches(salt_big, batch_format="pyarrow")
    small_s = small.map_batches(
        replicate_small, batch_format="pyarrow"
    ).drop_columns([on])

    def _with_ks(schema, drop=None):
        if schema is None:
            return None
        names = [c for c in schema.names if c != drop] + ["__ks"]
        types = [
            t for c, t in zip(schema.names, schema.types) if c != drop
        ] + [pa.int64()]

        class _S:
            pass

        s = _S()
        s.names, s.types = names, types
        return s

    joined = bucketed_join(
        big_s,
        small_s,
        on="__ks",
        n_buckets=n_buckets,
        left_schema=_with_ks(big_schema),
        right_schema=_with_ks(small_schema, drop=on),
    )
    return joined.drop_columns(["__ks"])


def range_join_aggregate(
    big: Dataset,
    intervals: Dataset,
    value_col: str,
    sum_cols: list[str],
    lo_col: str = "lo",
    hi_col: str = "hi",
    group_cols: list[str] | None = None,
    count_as: str = "n",
    n_ranges: int = 64,
    big_schema=None,
    intervals_schema=None,
) -> Dataset:
    """Aggregate-PUSHDOWN interval join: per-interval (or per
    ``group_cols``) SUM/COUNT of every probe row with ``lo ≤ value <
    hi`` — WITHOUT materialising the (row, interval) pairs.  A naive
    join-then-aggregate explodes with the fanout (measured: the 1.25-
    wide part-size bands produce 158 M pair rows at sf0.1 for a
    25-row answer); here each domain cell sorts its probe rows by
    value once, takes prefix sums of the measures, and answers every
    interval with TWO searchsorted lookups — O((P+I)·log P) per cell,
    fanout-free.  Each probe row lives in exactly one cell and each
    interval is replicated to the cells it overlaps, so summing the
    per-cell partials per interval counts every (row, interval) match
    exactly once; a final small ``groupby(group_cols)`` merges cells.

    Same contract as :func:`range_join_partitioned` (disjoint column
    names; pass the ``*_schema`` params for lazy upstream sides).
    """
    from ray.data.aggregate import Max, Min

    from hexscape_ray.stages.agg import two_phase_sum

    bschema = big_schema if big_schema is not None else big.schema()
    ischema = intervals_schema if intervals_schema is not None else intervals.schema()
    icols = list(ischema.names)
    group_cols = group_cols if group_cols is not None else [c for c in icols if c not in (lo_col, hi_col)]

    dom = intervals.aggregate(
        Min(lo_col, alias_name="lo_min"), Max(hi_col, alias_name="hi_max")
    )
    lo_min, hi_max = float(dom["lo_min"]), float(dom["hi_max"])
    edges = np.linspace(lo_min, hi_max, n_ranges + 1)
    edges_ref = ray.put(edges)

    probe_cols = [value_col] + sum_cols

    def tag_probe(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cell = np.searchsorted(e, v, side="right") - 1
        ok = (cell >= 0) & (cell < n_ranges)
        batch = batch.filter(pa.array(ok))
        cols = {value_col: pa.array(v[ok])}  # float64, matches the pad
        for c in sum_cols:
            cols[c] = batch[c].cast(pa.int64())
        for c in icols:  # typed null padding (ityped resolves at call time)
            cols[c] = pa.nulls(len(batch), ityped[c])
        cols["__cell"] = pa.array(cell[ok].astype(np.int64))
        cols["__side"] = pa.array(np.zeros(len(batch), dtype=np.int8))
        return pa.table({c: cols[c] for c in probe_cols + icols + ["__cell", "__side"]})

    def _itype(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        if t is str or np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    ityped = {n: _itype(t) for n, t in zip(ischema.names, ischema.types)}

    def tag_interval(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c_lo = np.clip(np.searchsorted(e, lo, side="right") - 1, 0, n_ranges - 1)
        c_hi = np.clip(np.searchsorted(e, hi, side="left") - 1, 0, n_ranges - 1)
        cnt = np.maximum(c_hi - c_lo + 1, 0)
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        cell = (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(c_lo, cnt)
        )
        rep = batch.take(pa.array(rows))
        cols = {c: rep[c] for c in icols}
        for c in probe_cols:
            cols[c] = pa.nulls(len(rep), pa.float64() if c == value_col else pa.int64())
        cols["__cell"] = pa.array(cell)
        cols["__side"] = pa.array(np.ones(len(rep), dtype=np.int8))
        return pa.table({c: cols[c] for c in probe_cols + icols + ["__cell", "__side"]})

    part_fields = group_cols + sum_cols + [count_as]

    def stab_agg(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        p = g.filter(pa.array(side == 0))
        iv = g.filter(pa.array(side == 1))
        empty_cols = {c: pa.array([], ityped[c]) for c in group_cols}
        empty_cols.update({c: pa.array([], pa.int64()) for c in sum_cols + [count_as]})
        if len(p) == 0 or len(iv) == 0:
            return pa.table(empty_cols)
        v = p[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(v, kind="stable")
        vs = v[order]
        prefixes = {}
        for c in sum_cols:
            x = p[c].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            prefixes[c] = np.concatenate([[0], np.cumsum(x)])
        lo = iv[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = iv[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.searchsorted(vs, lo, side="left")
        b = np.searchsorted(vs, hi, side="left")
        b = np.maximum(a, b)  # inverted/degenerate intervals → 0 rows
        # INNER-join semantics: an interval matching zero probe rows in
        # this cell emits NO partial — so a group whose intervals match
        # nothing anywhere is absent from the output, exactly like the
        # SQL oracle's inner join (a zero-partial would resurrect it as
        # an all-zeros row).  LEFT-join semantics would keep b == a.
        hit = b > a
        if not hit.any():
            return pa.table(empty_cols)
        iv_hit = iv.filter(pa.array(hit))
        a, b = a[hit], b[hit]
        out = {c: iv_hit[c] for c in group_cols}
        for c in sum_cols:
            out[c] = pa.array(prefixes[c][b] - prefixes[c][a])
        out[count_as] = pa.array((b - a).astype(np.int64))
        return pa.table(out)

    tagged = big.map_batches(tag_probe, batch_format="pyarrow").union(
        intervals.map_batches(tag_interval, batch_format="pyarrow")
    )
    partials = tagged.groupby("__cell").map_groups(stab_agg, batch_format="pyarrow")
    return two_phase_sum(partials, group_cols, sum_cols + [count_as], count_as=None)


BROADCAST_ROWS = int(__import__("os").environ.get("HEXRAY_BROADCAST_ROWS", "2000000"))


def adaptive_join(
    big: Dataset,
    side: Dataset,
    on,
    how: str = "inner",
    big_schema=None,
    side_schema=None,
    side_count: int | None = None,
) -> Dataset:
    """SIDE-PLACEMENT-ADAPTIVE equi-join — the `small_quantity_revenue`
    adaptive pattern promoted to a helper.  When the non-big side holds
    ≤ ``HEXRAY_BROADCAST_ROWS`` rows (default 2 M) it ships ONCE via
    ``ray.put`` and joins inside ``map_batches`` with an Arrow-native
    Acero join (zero shuffle; row order not preserved — callers must be
    order-insensitive, which every aggregate consumer is); larger sides
    co-partition through :func:`bucketed_join` unchanged.  At test /
    bench scale dimension-sized sides broadcast and skip Ray's
    per-shuffle constant; at 100× the SAME call sites cross the row
    budget and co-partition — no code change, no driver data beyond
    the bounded broadcast table.

    Probing: metadata (`_safe_size_bytes`) rules out certainly-large
    sides without executing them; otherwise the side is MATERIALIZED
    once (count + consumption for free — the execution contract).
    Pass ``side_count`` when the caller already knows it.  The
    materialisation is NOT wasted on the bucketed fallback: the join
    consumes the side exactly once either way, so the only scale cost
    of an unprobeable corpus-sized side is its (spillable) object-store
    residency — the same bytes the shuffle would move.

    Acero constraint (round-4 trap): the broadcast path cannot carry
    ``list<...>`` payload columns — such sides must go bucketed
    (pass a huge ``side_count`` or call bucketed_join directly)."""
    if how in ("outer", "right"):
        # full/right outer CANNOT broadcast: an unmatched broadcast-side
        # row would be emitted once per probe batch — co-partition only
        return bucketed_join(
            big, side, on=on, how=how, left_schema=big_schema, right_schema=side_schema
        )
    sz = _safe_size_bytes(side)
    if sz is not None and sz > (1 << 30):  # certainly above the row budget
        return bucketed_join(
            big, side, on=on, how=how, left_schema=big_schema, right_schema=side_schema
        )
    if side_count is None:
        side = side.materialize()
        side_count = side.count()
    if side_count > BROADCAST_ROWS:
        return bucketed_join(
            big, side, on=on, how=how, left_schema=big_schema, right_schema=side_schema
        )
    on_cols = [on] if isinstance(on, str) else list(on)
    # a tiny side read can yield ZERO-COLUMN empty blocks (Ray emits
    # schema-less bundles for empty read tasks) — drop them before the
    # concat or pa.concat_tables raises on the schema mismatch; an
    # all-empty side falls back to side_schema (required then)
    side_blocks = [t for t in ray.get(side.to_arrow_refs()) if t.num_columns > 0]
    if not side_blocks:
        assert side_schema is not None, "empty side needs side_schema"
        side_blocks = [side_schema.empty_table()]
    if how in ("semi", "anti") and len(on_cols) == 1:
        keys = pa.concat_tables(side_blocks)[on_cols[0]]
        return broadcast_semi_anti(big, keys.to_pandas(), on=on_cols[0], how=how)
    jt = {"inner": "inner", "left": "left outer", "semi": "left semi", "anti": "left anti"}[how]
    side_tbl = pa.concat_tables(side_blocks).combine_chunks()
    ref = ray.put(side_tbl)

    # stateless TASK, not an actor pool: iterative callers (pagerank)
    # spin the stage up once per iteration, and an actor pool's
    # cold-start (~1-2 s) would dominate; ray.get of a plasma-resident
    # table is a zero-copy map, cheap per task
    def acero_join(batch: pa.Table) -> pa.Table:
        small: pa.Table = ray.get(ref)
        return batch.join(small, keys=on_cols, join_type=jt)

    return big.map_batches(acero_join, batch_format="pyarrow", batch_size=65536)
