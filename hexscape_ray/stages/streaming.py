"""Streaming-shaped session windows with INCREMENTAL per-shard actor
state (SURVEY §2.9 — the true streaming analogue of the batch
``groupby(user).map_groups`` sessionization in queries.py).

Shape: the event stream (globally ts-ordered) is routed to N shard
actors by ``hash(user_id) % N``; each actor owns its users' OPEN
sessions across feeds, advances a watermark, closes sessions whose
inactivity gap has provably passed (``last_seen + gap < watermark``),
and can ``drain()`` closed sessions mid-stream — the engine's
Kafka-consumer shape.  Raw ``@ray.remote`` actors are used
deliberately: the Dataset API cannot express cross-batch mutable
keyed state with ordered delivery (the brief's sanctioned exception).

Ingest is DISTRIBUTED (round-3; the round-2 form looped
``iter_batches`` on the driver — an ingest bottleneck at scale):
the ts-sorted stream's blocks are routed by parallel ``@ray.remote``
ROUTER tasks, one per block, each splitting its block by user hash
and feeding every shard actor a slice tagged with the block's
SEQUENCE NUMBER (empty slices included, so sequence gaps are
impossible).  Router tasks run concurrently in any order; each shard
actor holds a reorder buffer and applies feeds strictly in sequence —
exactly how a partitioned log consumer restores order behind a
parallel fetch layer.  The driver never touches a row: it only
launches routers over block REFS in bounded waves (wave size bounds
both scheduler backlog and the actors' reorder-buffer memory).

Ordering guarantee: rows are globally ts-sorted across blocks (Ray
sort emits range-partitioned blocks in key order) and within each
block, so applying block slices in block order per shard replays each
user's events in ts order regardless of router completion order.

At the end of the stream ``flush()`` closes remaining sessions; total
output is bit-identical to the batch operator (oracle-checked:
events_sessions_stream shares SQL_EVENTS_SESSIONS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

GAP_US = 1_800_000_000  # 30-min inactivity gap (reference default)


@ray.remote
class SessionShard:
    """One shard's incremental session state."""

    def __init__(self, gap_us: int = GAP_US):
        self.gap = gap_us
        # user_id -> [start_us, last_us, n_events, session_ordinal]
        self.open: dict[int, list[int]] = {}
        self.n_started: dict[int, int] = {}
        self.closed: list[tuple[int, int, int, int]] = []
        self.watermark = -(1 << 62)
        # reorder buffer: seq -> (user, us) awaiting their turn
        self.pending: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.next_seq = 0

    def _close(self, u: int, st: list[int]) -> None:
        self.closed.append((u, st[3], st[2], (st[1] - st[0]) // 1_000_000))

    def feed(self, user: np.ndarray, us: np.ndarray) -> int:
        """Ingest a ts-ordered slice; returns #sessions closed so far.

        Per-event Python loop is intentional: state transitions are
        sequential per user and the actor shard (not the row) is the
        parallelism unit — throughput scales with n_shards.
        """
        gap = self.gap
        for u, t in zip(user.tolist(), us.tolist()):
            st = self.open.get(u)
            if st is None:
                sid = self.n_started.get(u, 0) + 1
                self.n_started[u] = sid
                self.open[u] = [t, t, 1, sid]
            elif t - st[1] > gap:
                self._close(u, st)
                sid = self.n_started[u] + 1
                self.n_started[u] = sid
                self.open[u] = [t, t, 1, sid]
            else:
                st[1] = t
                st[2] += 1
        if us.size:
            self.watermark = max(self.watermark, int(us[-1]))
            # retire sessions that can no longer receive events
            done = [u for u, st in self.open.items() if st[1] + gap < self.watermark]
            for u in done:
                self._close(u, self.open.pop(u))
        return len(self.closed)

    def feed_seq(self, seq: int, user: np.ndarray, us: np.ndarray) -> int:
        """Sequence-tagged ingest from parallel routers: buffer
        out-of-order arrivals, apply the contiguous prefix in order.
        Buffer occupancy is bounded by the driver's router wave size."""
        self.pending[seq] = (user, us)
        while self.next_seq in self.pending:
            u, t = self.pending.pop(self.next_seq)
            self.feed(u, t)
            self.next_seq += 1
        return len(self.closed)

    def drain(self) -> pa.Table:
        """Emit closed sessions incrementally (mid-stream checkpoint)."""
        rows = self.closed
        self.closed = []
        return _sessions_table(rows)

    def flush(self) -> pa.Table:
        """End of stream: close every open session and emit the rest."""
        for u, st in sorted(self.open.items()):
            self._close(u, st)
        self.open = {}
        return self.drain()


def _sessions_table(rows) -> pa.Table:
    arr = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
    return pa.table(
        {
            "user_id": pa.array(arr[:, 0]),
            "session_id": pa.array(arr[:, 1]),
            "n_events": pa.array(arr[:, 2]),
            "duration_s": pa.array(arr[:, 3]),
        }
    )


@ray.remote
def _route_block(block: pa.Table, seq: int, shards: list) -> int:
    """Router task: split one ts-sorted block by user hash and deliver
    a seq-tagged slice to EVERY shard (empty slices keep the sequence
    dense).  Blocks until the shards have accepted the feeds so a
    completed wave == data handed off (backpressure unit)."""
    user = block["user_id"].to_numpy(zero_copy_only=False)
    us = block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_shards = len(shards)
    shard = (user % np.int64(n_shards)).astype(np.int64)
    refs = []
    for s in range(n_shards):
        m = shard == s
        refs.append(shards[s].feed_seq.remote(seq, user[m], us[m]))
    ray.get(refs)
    return len(user)


def streaming_sessions(
    events: Dataset,
    n_shards: int = 8,
    gap_us: int = GAP_US,
    feed_batch: int = 16384,  # kept for API compat; routing is per block
    max_inflight: int = 32,
) -> pd.DataFrame:
    """Run the event stream through shard actors; returns the complete
    closed-session table (== batch sessionization output).

    The driver only ORCHESTRATES: it enumerates the sorted stream's
    block refs and launches router tasks in waves of ``max_inflight``
    (bounding scheduler backlog and shard reorder buffers); rows flow
    object-store → router task → shard actor, never through the
    driver process.
    """
    del feed_batch
    shards = [SessionShard.remote(gap_us) for _ in range(n_shards)]
    stream = events.sort("ts").materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)

    inflight: list = []
    for seq, bref in enumerate(block_refs):
        inflight.append(_route_block.remote(bref, seq, shards))
        if len(inflight) > max_inflight:  # backpressure
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)

    tables = ray.get([s.flush.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_id"], ignore_index=True)
    )


@ray.remote
class DedupShard:
    """One shard of the STREAMING exact-dedup state: content-hash →
    (min doc id, copy count).  Min and count are commutative, so —
    unlike sessions — no sequence tags or reorder buffer are needed:
    router tasks may deliver slices in any order and the result is
    exact.  ``seen()`` answers mid-stream novelty probes (the online
    filter shape: drop a page the moment its content hash is known)."""

    def __init__(self):
        self.state: dict[int, list[int]] = {}

    def feed(self, h: np.ndarray, ids: np.ndarray) -> int:
        st = self.state
        for hv, i in zip(h.tolist(), ids.tolist()):
            cur = st.get(hv)
            if cur is None:
                st[hv] = [i, 1]
            else:
                if i < cur[0]:
                    cur[0] = i
                cur[1] += 1
        return len(st)

    def seen(self, h: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (hv in self.state for hv in h.tolist()), dtype=bool, count=len(h)
        )

    def snapshot(self) -> pa.Table:
        """Full state incl. the content hash (flush drops it) — the
        STATEFUL-RECOVERY surface: a fresh shard ``load()``s this and
        the stream resumes exactly (min/count merges commute, so a
        snapshot taken mid-stream composes with any replay split)."""
        if not self.state:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_copies": pa.array([], pa.int64()),
                }
            )
        hs = np.fromiter(self.state.keys(), dtype=np.int64, count=len(self.state))
        arr = np.asarray(list(self.state.values()), dtype=np.int64)
        return pa.table(
            {
                "h": pa.array(hs),
                "doc_id": pa.array(arr[:, 0]),
                "n_copies": pa.array(arr[:, 1]),
            }
        )

    def load(self, snap: pa.Table) -> int:
        """Bulk-merge a snapshot (min of mins, sum of counts)."""
        st = self.state
        for hv, i, n in zip(
            snap["h"].to_numpy(zero_copy_only=False).tolist(),
            snap["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            snap["n_copies"].to_numpy(zero_copy_only=False).tolist(),
        ):
            cur = st.get(hv)
            if cur is None:
                st[hv] = [i, n]
            else:
                if i < cur[0]:
                    cur[0] = i
                cur[1] += n
        return len(st)

    def flush(self) -> pa.Table:
        if not self.state:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_copies": pa.array([], pa.int64()),
                }
            )
        arr = np.asarray(sorted(v for v in self.state.values()), dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(arr[:, 0]), "n_copies": pa.array(arr[:, 1])}
        )


@ray.remote
def _route_dedup_block(block: pa.Table, shards: list, id_col: str, text_col: str) -> int:
    """Router task: content-hash one block's texts (the same
    ``fnv1a_64_str_array`` as the batch operator, so hash-collision
    semantics are identical) and deliver each shard its slice."""
    from hexscape_ray.functions.hashing import fnv1a_64_str_array

    if isinstance(block, pd.DataFrame):  # pandas-backed blocks
        block = pa.Table.from_pandas(block, preserve_index=False)
    ids = block[id_col].to_numpy(zero_copy_only=False)
    h = fnv1a_64_str_array(block[text_col].to_pylist()).astype(np.int64)
    n_shards = len(shards)
    shard = (h % np.int64(n_shards) + n_shards) % np.int64(n_shards)
    refs = []
    for s in range(n_shards):
        m = shard == s
        if m.any():
            refs.append(shards[s].feed.remote(h[m], ids[m]))
    ray.get(refs)
    return len(ids)


def streaming_exact_dedup(
    docs: Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_inflight: int = 32,
) -> pd.DataFrame:
    """STREAMING exact dedup: incremental per-shard content-hash state
    fed by parallel router tasks over the document stream's block refs
    (same distributed-ingest shape as :func:`streaming_sessions`, minus
    the ordering machinery — min/count are commutative).  Output is
    bit-identical to the batch ``exact_dedup`` / the SQL group-by
    oracle: one row per distinct content with the minimum doc id and
    the copy count.  The driver never touches a row."""
    shards = [DedupShard.remote() for _ in range(n_shards)]
    stream = docs.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)

    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_dedup_block.remote(bref, shards, id_col, text_col))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    return out.to_pandas().sort_values("doc_id", ignore_index=True)


@ray.remote
class LSHShard:
    """One shard of the STREAMING near-dup state: (band_id, band_hash)
    → bucket member list.  Buckets are append-only and pair emission
    is deferred to ``flush_pairs`` (min/clique over the final bucket —
    commutative in arrival order, so routers need no sequencing, same
    argument as :class:`DedupShard`).  ``probe()`` answers the online
    filter question mid-stream: does this band row land in an already-
    occupied bucket (i.e. is the incoming doc a near-dup CANDIDATE of
    anything seen so far)."""

    def __init__(self, bucket_cap: int = 64):
        self.cap = bucket_cap
        self.buckets: dict[tuple[int, int], list[int]] = {}

    def feed(self, band_id: np.ndarray, band_hash: np.ndarray, ids: np.ndarray) -> int:
        b = self.buckets
        for k0, k1, i in zip(band_id.tolist(), band_hash.tolist(), ids.tolist()):
            cur = b.get((k0, k1))
            if cur is None:
                b[(k0, k1)] = [i]
            else:
                cur.append(i)
        return len(b)

    def probe(self, band_id: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
        b = self.buckets
        return np.fromiter(
            ((k0, k1) in b for k0, k1 in zip(band_id.tolist(), band_hash.tolist())),
            dtype=bool,
            count=len(band_id),
        )

    def flush_pairs(self) -> pa.Table:
        """Per bucket: the SAME pair rule as the batch generator
        (stages/dedup.py::minhash_candidate_pairs) — full clique at
        m ≤ cap, star edges to the min id above."""
        out_a, out_b = [], []
        for members in self.buckets.values():
            m = len(members)
            if m < 2:
                continue
            run = np.sort(np.asarray(members, dtype=np.int64))
            if m <= self.cap:
                i, j = np.triu_indices(m, 1)
                out_a.append(run[i])
                out_b.append(run[j])
            else:
                out_a.append(np.repeat(run[0], m - 1))
                out_b.append(run[1:])
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )


@ray.remote
def _route_lsh_block(block, shards: list, id_col: str, text_col: str) -> int:
    """Router task: MinHash-sign one block (the identical kernel the
    batch operator uses) and deliver each shard its band rows, routed
    by band_hash so a bucket lives wholly on one shard."""
    from hexscape_ray.stages.dedup import MinHasher, band_rows_block

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if id_col != "doc_id" or text_col != "text":
        block = pa.table(
            {"doc_id": block[id_col], "text": block[text_col]}
        )
    sigs = MinHasher()(block)
    rows = band_rows_block(sigs)
    bh = rows["band_hash"].to_numpy(zero_copy_only=False)
    bid = rows["band_id"].to_numpy(zero_copy_only=False)
    ids = rows["doc_id"].to_numpy(zero_copy_only=False)
    n_shards = len(shards)
    shard = (bh % np.int64(n_shards) + n_shards) % np.int64(n_shards)
    refs = []
    for s in range(n_shards):
        m = shard == s
        if m.any():
            refs.append(shards[s].feed.remote(bid[m], bh[m], ids[m]))
    ray.get(refs)
    return len(block)


def streaming_lsh_pairs(
    docs: Dataset,
    n_shards: int = 8,
    bucket_cap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_inflight: int = 32,
) -> pd.DataFrame:
    """STREAMING MinHash-LSH near-dup candidates: incremental per-shard
    bucket state fed by parallel router tasks; output (a, b,
    n_bands_hit) is bit-identical to the batch
    ``minhash_candidate_pairs`` (same signatures, same band hash, same
    clique/star rule — arrival order cancels because buckets sort at
    flush).  The online filter shape is ``LSHShard.probe``: a page can
    be flagged as a near-dup CANDIDATE the moment its band rows land in
    occupied buckets, before the stream ends."""
    shards = [LSHShard.remote(bucket_cap) for _ in range(n_shards)]
    stream = docs.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)

    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_lsh_block.remote(bref, shards, id_col, text_col))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush_pairs.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    if len(out) == 0:
        return pd.DataFrame(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "n_bands_hit": np.empty(0, np.int64),
            }
        )
    df = out.to_pandas()
    return (
        df.groupby(["a", "b"], as_index=False)
        .size()
        .rename(columns={"size": "n_bands_hit"})
        .sort_values(["a", "b"], ignore_index=True)
    )


@ray.remote
class HexCountShard:
    """One shard of the STREAMING per-hex census: (r, q) → (n_docs,
    len_sum).  Both aggregates are commutative sums — routers need no
    sequencing (the :class:`DedupShard` argument).  ``occupied()``
    answers the mid-stream coverage probe: which of these cells has the
    stream already touched."""

    def __init__(self):
        self.state: dict[tuple[int, int], list[int]] = {}

    def feed(
        self, r: np.ndarray, q: np.ndarray, n: np.ndarray, s: np.ndarray
    ) -> int:
        st = self.state
        for rr, qq, nn, ss in zip(r.tolist(), q.tolist(), n.tolist(), s.tolist()):
            cur = st.get((rr, qq))
            if cur is None:
                st[(rr, qq)] = [nn, ss]
            else:
                cur[0] += nn
                cur[1] += ss
        return len(st)

    def occupied(self, r: np.ndarray, q: np.ndarray) -> np.ndarray:
        return np.fromiter(
            ((rr, qq) in self.state for rr, qq in zip(r.tolist(), q.tolist())),
            dtype=bool,
            count=len(r),
        )

    def load(self, snap: pa.Table) -> int:
        """Stateful recovery: a fresh shard absorbs a ``flush()``
        snapshot by summing — the per-cell aggregates commute, so a
        snapshot composes exactly with any replay split."""
        return self.feed(
            snap["r"].to_numpy(zero_copy_only=False),
            snap["q"].to_numpy(zero_copy_only=False),
            snap["n_docs"].to_numpy(zero_copy_only=False),
            snap["len_sum"].to_numpy(zero_copy_only=False),
        )

    def flush(self) -> pa.Table:
        if not self.state:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "len_sum": pa.array([], pa.int64()),
                }
            )
        keys = sorted(self.state)
        vals = np.asarray([self.state[k] for k in keys], dtype=np.int64)
        karr = np.asarray(keys, dtype=np.int64)
        return pa.table(
            {
                "r": pa.array(karr[:, 0]),
                "q": pa.array(karr[:, 1]),
                "n_docs": pa.array(vals[:, 0]),
                "len_sum": pa.array(vals[:, 1]),
            }
        )


@ray.remote
def _route_hex_block(block, shards: list) -> int:
    """Router task: geocode + hex-encode one block with the SAME
    vectorised kernels as the batch query (grid.point_to_axial parity
    → shared SQL oracle), pre-aggregate per cell inside the block, and
    deliver each shard its cell slice (shard = cell-hash % n)."""
    from hexscape_ray.config import DEFAULT_GRID
    from hexscape_ray.stages.encode import geocode_ids_batch, hex_encode_batch

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    t = geocode_ids_batch(block, "doc_id")
    t = hex_encode_batch(t, DEFAULT_GRID, resolutions=(0,))
    r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = t["q"].to_numpy(zero_copy_only=False).astype(np.int64)
    nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    code = (q + (1 << 20)) * (1 << 21) + (r + (1 << 20))
    uniq, inv = np.unique(code, return_inverse=True)
    n = np.bincount(inv, minlength=uniq.size).astype(np.int64)
    s = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(s, inv, nch)
    ur = uniq % (1 << 21) - (1 << 20)
    uq = uniq // (1 << 21) - (1 << 20)
    n_shards = len(shards)
    shard = (uniq % n_shards).astype(np.int64)
    refs = []
    for sh in range(n_shards):
        m = shard == sh
        if m.any():
            refs.append(shards[sh].feed.remote(ur[m], uq[m], n[m], s[m]))
    ray.get(refs)
    return len(r)


def streaming_hex_counts(
    docs: Dataset, n_shards: int = 8, max_inflight: int = 32
) -> pd.DataFrame:
    """STREAMING flagship aggregate: per-hex (n_docs, len_sum) built
    incrementally by shard actors fed from parallel router tasks over
    the document stream's block refs — bit-identical to the batch
    ``hex_doc_counts`` / the axial SQL oracle (sums commute; no
    ordering machinery).  The driver never touches a row; shard keying
    by cell hash keeps flush outputs disjoint (plain concat, no final
    reduce)."""
    shards = [HexCountShard.remote() for _ in range(n_shards)]
    stream = docs.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)

    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_hex_block.remote(bref, shards))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    return out.to_pandas().sort_values(["r", "q"], ignore_index=True)


@ray.remote
class LatestStateShard:
    """One shard of the STREAMING CDC latest-state view: user_id → the
    (ts, event_id)-max event row.  Row-argmax COMMUTES (max of maxes),
    so routers need no sequencing and a ``flush()`` snapshot composes
    with any replay split (``load``) — the same recovery contract as
    the census shards."""

    def __init__(self):
        self.state: dict[int, tuple[int, int, str, int]] = {}

    def feed(
        self,
        uid: np.ndarray,
        us: np.ndarray,
        eid: np.ndarray,
        etype: list,
        vmic: np.ndarray,
    ) -> int:
        st = self.state
        for u, t, e, ty, v in zip(
            uid.tolist(), us.tolist(), eid.tolist(), etype, vmic.tolist()
        ):
            cur = st.get(u)
            if cur is None or (t, e) > (cur[0], cur[1]):
                st[u] = (t, e, ty, v)
        return len(st)

    def load(self, snap: pa.Table) -> int:
        return self.feed(
            snap["user_id"].to_numpy(zero_copy_only=False),
            snap["last_us"].to_numpy(zero_copy_only=False),
            snap["last_event_id"].to_numpy(zero_copy_only=False),
            snap["last_type"].to_pylist(),
            snap["last_value_micro"].to_numpy(zero_copy_only=False),
        )

    def flush(self) -> pa.Table:
        if not self.state:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "last_type": pa.array([], pa.string()),
                    "last_us": pa.array([], pa.int64()),
                    "last_value_micro": pa.array([], pa.int64()),
                    "last_event_id": pa.array([], pa.int64()),
                }
            )
        keys = sorted(self.state)
        rows = [self.state[k] for k in keys]
        return pa.table(
            {
                "user_id": pa.array(np.asarray(keys, dtype=np.int64)),
                "last_type": pa.array([r[2] for r in rows], type=pa.string()),
                "last_us": pa.array(np.asarray([r[0] for r in rows], dtype=np.int64)),
                "last_value_micro": pa.array(
                    np.asarray([r[3] for r in rows], dtype=np.int64)
                ),
                "last_event_id": pa.array(
                    np.asarray([r[1] for r in rows], dtype=np.int64)
                ),
            }
        )


@ray.remote
def _route_latest_block(block, shards: list) -> int:
    """Router task: per-block argmax partial (one candidate row per
    user per block) then shard delivery by user hash."""
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    uid = block["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    us = block["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = block["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = block["value"].to_numpy(zero_copy_only=False)
    vmic = np.floor(v * 1e6 + 0.5).astype(np.int64)
    etype = block["event_type"].to_pylist()
    order = np.lexsort((eid, us, uid))
    uid_s = uid[order]
    last = np.empty(uid_s.shape[0], dtype=bool)
    if last.size:
        last[-1] = True
        last[:-1] = uid_s[1:] != uid_s[:-1]
    take = order[last]
    n_shards = len(shards)
    shard = uid[take] % n_shards
    refs = []
    for sh in range(n_shards):
        m = shard == sh
        if m.any():
            t = take[m]
            refs.append(
                shards[sh].feed.remote(
                    uid[t], us[t], eid[t], [etype[i] for i in t], vmic[t]
                )
            )
    ray.get(refs)
    return len(uid)


def streaming_latest_state(
    events: Dataset, n_shards: int = 8, max_inflight: int = 32
) -> pd.DataFrame:
    """STREAMING CDC latest-state view — incremental per-shard argmax
    state fed by parallel router tasks; bit-identical to the batch
    ``events_latest_state`` (shares SQL_EVENTS_LATEST_STATE: argmax
    commutes, so no ordering machinery)."""
    shards = [LatestStateShard.remote() for _ in range(n_shards)]
    stream = events.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_latest_block.remote(bref, shards))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    return out.to_pandas().sort_values("user_id", ignore_index=True)


@ray.remote
class HllShard:
    """One shard of the STREAMING per-key HyperLogLog registers:
    (key, bucket) → max ρ.  Register MAX commutes, so routers need no
    sequencing and a ``flush()`` snapshot composes with any replay
    split (``load``) — the same recovery contract as the other census
    shards.  Sharding is by bucket, so flushes are DISJOINT and the
    final merge is a concat."""

    def __init__(self):
        self.state: dict[tuple, int] = {}

    def feed(self, keys: list, bucket: np.ndarray, rho: np.ndarray) -> int:
        st = self.state
        for k, b, r in zip(keys, bucket.tolist(), rho.tolist()):
            kk = (k, b)
            if r > st.get(kk, 0):
                st[kk] = r
        return len(st)

    def load(self, snap: pa.Table) -> int:
        return self.feed(
            snap["__k"].to_pylist(),
            snap["bucket"].to_numpy(zero_copy_only=False),
            snap["rho"].to_numpy(zero_copy_only=False),
        )

    def flush(self) -> pa.Table:
        if not self.state:
            return pa.table(
                {
                    "__k": pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        items = sorted(self.state.items())
        return pa.table(
            {
                "__k": pa.array([k for (k, _), _r in items]),
                "bucket": pa.array(
                    np.asarray([b for (_, b), _r in items], dtype=np.int64)
                ),
                "rho": pa.array(np.asarray([r for _, r in items], dtype=np.int64)),
            }
        )


@ray.remote
def _route_hll_block(block, shards: list, key_col: str, member_col: str) -> int:
    """Router task: per-block register partial (≤ keys×256 rows) then
    shard delivery by bucket."""
    from hexscape_ray.stages.sketch import hll_partial_batches

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    part = hll_partial_batches(key_col, member_col)(block)
    bucket = part["bucket"].to_numpy(zero_copy_only=False)
    rho = part["rho"].to_numpy(zero_copy_only=False)
    keys = part["__k"].to_pylist()
    n_shards = len(shards)
    shard = bucket % n_shards
    refs = []
    for sh in range(n_shards):
        m = shard == sh
        if m.any():
            idx = np.flatnonzero(m)
            refs.append(
                shards[sh].feed.remote(
                    [keys[i] for i in idx], bucket[idx], rho[idx]
                )
            )
    ray.get(refs)
    return len(part)


def streaming_hll_distinct(
    events: Dataset, key: str, member: str, n_shards: int = 8, max_inflight: int = 32
) -> pa.Table:
    """STREAMING per-key approximate COUNT(DISTINCT) — incremental HLL
    register shards fed by parallel router tasks; bit-identical to the
    batch ``hll_distinct`` (register MAX commutes; shares its SQL
    oracle).  Returns the finished estimate table."""
    from hexscape_ray.stages.sketch import hll_finish_pdf

    shards = [HllShard.remote() for _ in range(n_shards)]
    stream = events.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_hll_block.remote(bref, shards, key, member))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush.remote() for s in shards])
    regs = pa.concat_tables([t for t in tables if len(t)])
    return hll_finish_pdf(regs.to_pandas())


@ray.remote
class AmsShard:
    """One shard of the STREAMING AMS tug-of-war counters: counter
    index → running signed sum.  Addition commutes — the weakest
    recovery contract of the shard family (no sequencing, no reorder
    buffer); ``flush()`` snapshots compose with any replay split via
    ``load`` (sums add)."""

    def __init__(self):
        self.state: dict[int, int] = {}

    def feed(self, counters: np.ndarray, vals: np.ndarray) -> int:
        st = self.state
        for c, v in zip(counters.tolist(), vals.tolist()):
            st[c] = st.get(c, 0) + v
        return len(st)

    def load(self, snap: pa.Table) -> int:
        return self.feed(
            snap["counter"].to_numpy(zero_copy_only=False),
            snap["c"].to_numpy(zero_copy_only=False),
        )

    def flush(self) -> pa.Table:
        items = sorted(self.state.items())
        return pa.table(
            {
                "counter": pa.array(
                    np.asarray([k for k, _ in items], dtype=np.int64)
                ),
                "c": pa.array(np.asarray([v for _, v in items], dtype=np.int64)),
            }
        )


@ray.remote
def _route_ams_block(block, shards: list, col: str) -> int:
    """Router task: one 16-int block partial, then shard delivery by
    counter range (counter % n_shards → disjoint flushes)."""
    from hexscape_ray.stages.sketch import ams_block_counters

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    u = (
        block[col]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .view(np.uint64)
    )
    part = ams_block_counters(u)
    idx = np.arange(16, dtype=np.int64)
    n_shards = len(shards)
    refs = []
    for sh in range(n_shards):
        m = (idx % n_shards) == sh
        refs.append(shards[sh].feed.remote(idx[m], part[m]))
    ray.get(refs)
    return len(block)


def streaming_ams_counters(
    events: Dataset, col: str, n_shards: int = 4, max_inflight: int = 32
) -> list[int]:
    """STREAMING AMS counter accumulation — bit-identical to the batch
    two-phase reduction (addition commutes); returns the 16 counters."""
    shards = [AmsShard.remote() for _ in range(n_shards)]
    stream = events.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_ams_block.remote(bref, shards, col))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    tables = ray.get([s.flush.remote() for s in shards])
    out = np.zeros(16, dtype=np.int64)
    for t in tables:
        if len(t):
            out[t["counter"].to_numpy(zero_copy_only=False)] = t["c"].to_numpy(
                zero_copy_only=False
            )
    return [int(v) for v in out]


@ray.remote
class SetSimShard:
    """One shard of the STREAMING exact set-similarity state: the
    (doc_id, tok, n) token rows of its doc-hash slice, append-only.
    Guaranteed-recall similarity needs the FINAL global document-
    frequency order (a token's rarity decides prefix membership), so
    pair emission happens at flush — the shards hand their token
    tables over and the batch prefix/verify machinery
    (``dedup.setsim_from_token_rows``) runs on the assembled state.
    That is the honest contrast with :class:`LSHShard`: LSH can
    ``probe()`` candidates ONLINE because its buckets don't depend on
    corpus statistics, at the price of probabilistic recall; exact
    recall is a flush-time (watermark) answer."""

    def __init__(self):
        self._ids: list[np.ndarray] = []
        self._toks: list[np.ndarray] = []
        self._ns: list[np.ndarray] = []

    def feed(self, ids: np.ndarray, toks: np.ndarray, ns: np.ndarray) -> int:
        self._ids.append(np.asarray(ids, dtype=np.int64))
        self._toks.append(np.asarray(toks, dtype=np.int64))
        self._ns.append(np.asarray(ns, dtype=np.int64))
        return sum(a.size for a in self._ids)

    def flush_tokens(self) -> pa.Table:
        if not self._ids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tok": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(self._ids)),
                "tok": pa.array(np.concatenate(self._toks)),
                "n": pa.array(np.concatenate(self._ns)),
            }
        )


@ray.remote
def _route_setsim_block(block, shards: list, id_col: str, text_col: str) -> int:
    """Router task: tokenize one block with the IDENTICAL kernel the
    batch operator uses (distinct FNV-1a-64 token hashes per doc) and
    deliver each shard its doc-hash slice."""
    from hexscape_ray.functions.hashing import fnv1a_64_str_array, splitmix64

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    ids = block[id_col].to_numpy(zero_copy_only=False)
    out_id, out_tok, out_n = [], [], []
    for i, t in zip(ids, block[text_col].to_pylist()):
        toks = t.lower().split()
        if not toks:
            continue
        h = np.unique(fnv1a_64_str_array(toks).view(np.int64))
        out_id.append(np.full(h.size, i, dtype=np.int64))
        out_tok.append(h)
        out_n.append(np.full(h.size, h.size, dtype=np.int64))
    if not out_id:
        return 0
    d = np.concatenate(out_id)
    tok = np.concatenate(out_tok)
    n = np.concatenate(out_n)
    with np.errstate(over="ignore"):
        hs = splitmix64(d.view(np.uint64))
    n_shards = len(shards)
    shard = (hs % np.uint64(n_shards)).astype(np.int64)
    refs = []
    for s in range(n_shards):
        m = shard == s
        if m.any():
            refs.append(shards[s].feed.remote(d[m], tok[m], n[m]))
    ray.get(refs)
    return len(block)


def streaming_setsim_pairs(
    docs: Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_inflight: int = 32,
) -> Dataset:
    """STREAMING-INGEST exact set-similarity join: token rows
    accumulate incrementally on doc-hash shards (parallel router
    tasks, no ordering machinery — token rows of distinct docs
    commute); at flush the shards' state assembles into the batch
    prefix-filter pipeline, so the output — and the SQL oracle — is
    identical to ``set_similarity_pairs``."""
    shards = [SetSimShard.remote() for _ in range(n_shards)]
    stream = docs.materialize()
    block_refs: list = []
    for bundle in stream.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    inflight: list = []
    for bref in block_refs:
        inflight.append(_route_setsim_block.remote(bref, shards, id_col, text_col))
        if len(inflight) > max_inflight:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - max_inflight
            )
            ray.get(done)
    ray.get(inflight)
    from hexscape_ray.stages.dedup import setsim_from_token_rows

    # flush refs are TASK RETURNS (driver-owned); materialize the
    # assembled token table before the shards can be released
    tok_refs = [s.flush_tokens.remote() for s in shards]
    ray.wait(tok_refs, num_returns=len(tok_refs))
    tokens = ray.data.from_arrow_refs(tok_refs).materialize()
    for s in shards:
        ray.kill(s)
    return setsim_from_token_rows(tokens)
