"""SQL-exact near-dup pipeline + retention/graph/sinks — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q07_layout as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# SQL-exact near-dup pipeline: MinHash-LSH candidate pairs with exact
# set-Jaccard counts, and the thresholded cluster labels — both
# hash-graded end to end (stages/dedup.py::ndx_*).  The SQL replays
# the ENTIRE pipeline: FNV-1a-64 per distinct token (simhash's
# recursive CTE), the splitmix-chained trigram combine, 16 xor-seeded
# splitmix permutations with per-doc MIN, 8×2 banding, the bucket
# self-join, exact intersection counts, and a recursive-closure
# component labelling (group_union's pattern).
# ---------------------------------------------------------------------------


def _xor64_sql(a: str, b: str) -> str:
    return f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) AS HUGEINT)"


def _ndx_gram_prefix() -> str:
    """Shared WITH-prefix of the SQL-exact near-dup family: per-doc
    POSITIONAL trigram hashes in CTE ``sm2`` (columns doc_id, pos, h
    — h the splitmix-chained FNV trigram hash as HUGEINT in
    [0, 2^64))."""

    def sm(name: str, src: str, carry: str) -> str:
        return f"{name} AS ({_splitmix64_sql('h', carry=carry, src=src)})"

    xor64 = _xor64_sql
    return f"""
WITH RECURSIVE
d AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      FROM documents),
dt AS (SELECT doc_id, unnest(l) AS tok,
              unnest(range(1, len(l) + 1)) AS pos
       FROM d),
toks AS (SELECT DISTINCT tok FROM dt),
fnv AS (
  SELECT tok, 0 AS p, CAST(14695981039346656037 AS HUGEINT) AS h FROM toks
  UNION ALL
  SELECT f.tok, f.p + 1,
         ((((f.h // 256) * 256
            + xor(f.h % 256, CAST(ascii(substr(f.tok, f.p + 1, 1)) AS HUGEINT)))
           * 1099511628211) % 18446744073709551616)
  FROM fnv f WHERE f.p < length(f.tok)
),
hfinal AS (
  SELECT f.tok, f.h FROM fnv f
  JOIN (SELECT tok, max(p) AS mp FROM fnv GROUP BY tok) m
    ON m.tok = f.tok AND m.mp = f.p
),
dth AS (SELECT dt.doc_id, dt.pos, f.h FROM dt JOIN hfinal f USING (tok)),
{sm('sm0', 'dth', 'doc_id, pos')},
x1 AS (SELECT a.doc_id, a.pos, {xor64('a.h', 'b.h')} AS h
       FROM sm0 a JOIN dth b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
{sm('sm1', 'x1', 'doc_id, pos')},
x2 AS (SELECT a.doc_id, a.pos, {xor64('a.h', 'b.h')} AS h
       FROM sm1 a JOIN dth b ON b.doc_id = a.doc_id AND b.pos = a.pos + 2),
{sm('sm2', 'x2', 'doc_id, pos')}"""


def _ndx_sql(tail: str) -> str:
    from hexscape_ray.stages.dedup import NDX_PERM_C

    def sm(name: str, src: str, carry: str) -> str:
        return f"{name} AS ({_splitmix64_sql('h', carry=carry, src=src)})"

    perm_vals = ", ".join(
        f"({j}, CAST({int(c)} AS HUGEINT))" for j, c in enumerate(NDX_PERM_C)
    )
    xor64 = _xor64_sql
    return _ndx_gram_prefix() + f""",
grams AS (SELECT DISTINCT doc_id, h AS g FROM sm2),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM grams GROUP BY 1),
perms(j, c) AS (VALUES {perm_vals}),
px AS (SELECT doc_id, j, {xor64('g', 'c')} AS h FROM grams, perms),
{sm('pm', 'px', 'doc_id, j')},
sig AS (SELECT doc_id, j, min(h) AS s FROM pm GROUP BY 1, 2),
bands AS (SELECT e.doc_id, CAST(e.j // 2 AS BIGINT) AS band, e.s AS s0, o.s AS s1
          FROM sig e JOIN sig o ON o.doc_id = e.doc_id AND o.j = e.j + 1
          WHERE e.j % 2 = 0),
cand AS (SELECT x.doc_id AS a, y.doc_id AS b, x.band
         FROM bands x JOIN bands y
           ON y.band = x.band AND y.s0 = x.s0 AND y.s1 = x.s1
              AND x.doc_id < y.doc_id),
pairs AS (SELECT a, b, count(*) AS n_bands_hit FROM cand GROUP BY 1, 2),
ix AS (SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS inter_grams
       FROM pairs p
       JOIN grams ga ON ga.doc_id = p.a
       JOIN grams gb ON gb.doc_id = p.b AND gb.g = ga.g
       GROUP BY 1, 2),
verified AS (
  SELECT p.a, p.b, p.n_bands_hit,
         coalesce(i.inter_grams, 0) AS inter_grams,
         sa.ng + sb.ng - coalesce(i.inter_grams, 0) AS union_grams
  FROM pairs p
  LEFT JOIN ix i ON i.a = p.a AND i.b = p.b
  JOIN sizes sa ON sa.doc_id = p.a
  JOIN sizes sb ON sb.doc_id = p.b)
{tail}
"""


def q_cohort_retention(sf_dir: str) -> Dataset:
    """Cohort retention matrix: users grouped by their FIRST active
    DAY (the cohort), counted on every day they were active —
    n_users at day_id == cohort_day is the cohort size, later days are
    retention.  Scale shape: the event log reduces to distinct
    (user, day) rows via a two-phase count (partials only); first-day
    via a two-phase MIN over the already-reduced table; one user-keyed
    adaptive join (bucketed past the broadcast budget); the matrix
    census is days² rows.  Day id = epoch microseconds // 86.4e9,
    exactly epoch_us(ts) // 86400000000 in the SQL."""
    from hexscape_ray.stages.agg import two_phase_agg
    from hexscape_ray.stages.joins import adaptive_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day_id": pa.array((us // _US_PER_DAY).astype(np.int64)),
            }
        )

    um = two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "day_id"],
        [],
        count_as="n_ev",
    ).map_batches(
        lambda b: b.drop_columns(["n_ev"]), batch_format="pyarrow"
    ).materialize()
    fm = two_phase_agg(um, ["user_id"], {"day_id": "min"}).rename_columns(
        {"day_id": "cohort_day"}
    )
    joined = adaptive_join(
        um,
        fm,
        on="user_id",
        big_schema=pa.schema([("user_id", pa.int64()), ("day_id", pa.int64())]),
        side_schema=pa.schema([("user_id", pa.int64()), ("cohort_day", pa.int64())]),
    )
    return two_phase_sum(
        joined.select_columns(["cohort_day", "day_id"]),
        ["cohort_day", "day_id"],
        [],
        count_as="n_users",
    ).sort(["cohort_day", "day_id"])


SQL_COHORT_RETENTION = """
  WITH um AS (
    SELECT DISTINCT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
    FROM events),
  fm AS (SELECT user_id, min(day_id) AS cohort_day FROM um GROUP BY 1)
  SELECT f.cohort_day, u.day_id, count(*) AS n_users
  FROM um u JOIN fm f USING (user_id)
  GROUP BY 1, 2 ORDER BY 1, 2
"""


def _skyline_scan(price: np.ndarray, qty: np.ndarray, n: np.ndarray):
    if price.size == 0:
        return price, qty, n
    """2-D Pareto skyline over DISTINCT (price, qty) value pairs with
    occurrence counts: lexsort by (price, qty); a pair is dominated iff
    the running min of qty over strictly-earlier rows ≤ its qty
    (identical pairs are pre-merged, so equality always witnesses a
    strict dominator).  Returns the surviving triple arrays, sorted."""
    order = np.lexsort((qty, price))
    price, qty, n = price[order], qty[order], n[order]
    runmin = np.minimum.accumulate(qty)
    keep = np.empty(qty.size, dtype=bool)
    keep[0] = True
    keep[1:] = runmin[:-1] > qty[1:]
    return price[keep], qty[keep], n[keep]


def q_pareto_lineitem(sf_dir: str) -> Dataset:
    """Distributed 2-D Pareto SKYLINE: the (price, quantity) value
    pairs of lineitem minimal in both dimensions, with their row
    counts.  Skyline is a MERGEABLE reduction (any dominator chain
    ends at a survivor, so block-local skylines lose only globally-
    dominated pairs, and a global-skyline pair survives EVERY block
    with its full local count) — so this rides the two-phase shape:
    per-block value census + local skyline scan emit partials, one
    remote task merges counts and re-scans.  The SQL oracle replays
    the same running-min rule as a window function — no quadratic
    NOT EXISTS."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        price = _cents(batch["l_extendedprice"])
        qty = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        key = price << np.int64(6)  # qty < 64 in TPC-H-shaped data
        assert qty.max(initial=0) < 64
        u, inv = np.unique(key | qty, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        p, q, n = _skyline_scan(u >> np.int64(6), u & np.int64(63), n)
        return pa.table(
            {"price_c": pa.array(p), "qty": pa.array(q), "n_rows": pa.array(n)}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        price = batch["price_c"].to_numpy(zero_copy_only=False)
        qty = batch["qty"].to_numpy(zero_copy_only=False)
        n = batch["n_rows"].to_numpy(zero_copy_only=False)
        key = (price << np.int64(6)) | qty
        u, inv = np.unique(key, return_inverse=True)
        ns = np.zeros(u.size, dtype=np.int64)
        np.add.at(ns, inv, n)
        p, q, ns = _skyline_scan(u >> np.int64(6), u & np.int64(63), ns)
        return pa.table(
            {"price_c": pa.array(p), "qty": pa.array(q), "n_rows": pa.array(ns)}
        )

    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    ).sort("price_c")


SQL_PARETO_LINEITEM = """
  WITH v AS (
    SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c,
           CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
           count(*) AS n_rows
    FROM lineitem GROUP BY 1, 2),
  s AS (
    SELECT price_c, qty, n_rows,
           min(qty) OVER (ORDER BY price_c, qty
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM v)
  SELECT price_c, qty, n_rows FROM s
  WHERE pm IS NULL OR pm > qty
  ORDER BY price_c
"""


def q_copurchase_triangles(sf_dir: str) -> Dataset:
    """TRIANGLE COUNTING on the part co-purchase graph: distinct
    (order, part) rows → per-order part-pair cliques (the count-scaled
    coarse-group pair shuffle from the dedup family) → distinct edges
    a<b → per-node triangle counts.  Counting uses the forward-
    adjacency rule (triangle a<b<c found once, at edge (a,b), as
    |N⁺(a) ∩ N⁺(b)|) over a broadcast CSR of the deduped edge list —
    sound while the edge list fits the broadcast budget (part-pair
    bounded); corpora beyond it need the edge-partitioned neighbor
    join, documented here as the scale path.  The SQL oracle is the
    classic three-way edge self-join."""
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    # raw (order, part) rows go straight to the pair kernel — the
    # within-order dedupe is one vectorised mask over the lexsorted
    # block there, which saves the ~600k-distinct-key aggregate a
    # separate DISTINCT pass would cost (measured: 3.9 of 8.1 s)
    op = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_est = _table_nrows(sf_dir, "lineitem")
    mask = np.int64(coarse_width(n_est) - 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column("__coarse", pa.array(np.bitwise_and(ok, mask)))

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        # per-order cliques WITHOUT a per-order Python loop: runs group
        # by LENGTH (few distinct order sizes), each length class emits
        # its pairs in one (n_runs × m) gather + triu — the measured
        # per-group-overhead trap avoided a second way
        if len(g) == 0:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        uniq = np.empty(ok.shape[0], dtype=bool)  # distinct (order, part)
        uniq[0] = True
        uniq[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[uniq], pk[uniq]
        new = np.empty(ok.shape[0], dtype=bool)
        new[0] = True
        new[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, ok.shape[0]))
        out_a, out_b = [], []
        for m in np.unique(lens[lens >= 2]):
            s = starts[lens == m]
            mat = pk[s[:, None] + np.arange(int(m))]
            i, j = np.triu_indices(int(m), 1)
            out_a.append(mat[:, i].ravel())
            out_b.append(mat[:, j].ravel())
        if not out_a:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    pair_rows = _pairs_via_groups(
        op.map_batches(add_bucket, batch_format="pyarrow"), n_est, pairs_block
    )
    edges = two_phase_sum(pair_rows, ["a", "b"], [], count_as="n_orders").materialize()

    et = pa.concat_tables(ray.get(edges.to_arrow_refs()))
    ea = et["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    eb = et["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (ea < (1 << 31)).all() and (eb < (1 << 31)).all()
    order = np.lexsort((eb, ea))
    ea, eb = ea[order], eb[order]
    nodes, starts_idx = np.unique(ea, return_index=True)
    indptr = np.append(starts_idx, ea.size)
    packed = (ea << np.int64(32)) | eb  # sorted, for O(log E) membership
    cref = ray.put((nodes, indptr, eb, packed))

    def tri(batch: pa.Table) -> pa.Table:
        nodes_, indptr_, tgt, keys = ray.get(cref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ai = np.searchsorted(nodes_, a)  # a has a forward edge ⇒ present
        # only c > b can complete a triangle at this edge (the third
        # edge is tested in canonical (b, c) form), and the edge's own
        # slot in the packed array marks exactly where N⁺(a) passes b —
        # start the wedge suffix there (halves the expansion)
        lo = np.searchsorted(keys, (a << np.int64(32)) | b) + 1
        hi = indptr_[ai + 1]
        deg = hi - lo
        eidx = np.repeat(np.arange(a.size), deg)
        offs = np.concatenate([[0], np.cumsum(deg)[:-1]])
        pos = np.arange(int(deg.sum())) - np.repeat(offs, deg) + np.repeat(lo, deg)
        c = tgt[pos]  # wedge apexes: c ∈ N⁺(a), c > b, one row per (edge, c)
        q = (b[eidx] << np.int64(32)) | c
        j = np.searchsorted(keys, q)
        hit = (j < keys.size) & (keys[np.minimum(j, keys.size - 1)] == q)
        t = np.bincount(eidx[hit], minlength=a.size).astype(np.int64)
        has = t > 0
        node_arr = np.concatenate([a[has], b[has], c[hit]])
        cnt_arr = np.concatenate(
            [t[has], t[has], np.ones(int(hit.sum()), dtype=np.int64)]
        )
        return pa.table(
            {"p_partkey": pa.array(node_arr), "n_triangles": pa.array(cnt_arr)}
        )

    # the adaptive combine emits ONE block — split it so the wedge
    # expansion parallelises instead of running serial in a single
    # fused task (measured 3.95 s of the query's 6.4 s at sf0.1)
    edges_split = edges.repartition(max(8, min(256, -(-ea.size // 16384))))
    return two_phase_sum(
        edges_split.map_batches(tri, batch_format="pyarrow", batch_size=16384),
        ["p_partkey"],
        ["n_triangles"],
        count_as=None,
    ).sort("p_partkey")


SQL_COPURCHASE_TRIANGLES = """
  WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM op a JOIN op b
          ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey),
  t AS (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
  n AS (SELECT a AS p FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t)
  SELECT p AS p_partkey, count(*) AS n_triangles FROM n GROUP BY 1 ORDER BY 1
"""


def q_event_transitions(sf_dir: str) -> Dataset:
    """First-order Markov TRANSITION MATRIX over per-user event
    sequences: counts of (previous type → type) for consecutive events
    of the same user, ordered by (ts, event_id).  Scale shape: events
    co-partition by a count-scaled user-hash coarse group; each group
    sessionises in ONE lexsort pass and pre-aggregates its transition
    counts, so the final exchange carries (types² × groups) partial
    rows."""
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_est = _table_nrows(sf_dir, "events")
    mask = np.int64(coarse_width(n_est) - 1)

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "__coarse": pa.array(np.bitwise_and(uid, mask)),
            }
        )

    def transitions_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"prev_type": [], "event_type": [], "n": np.empty(0, np.int64)}
            )
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et, codes = np.unique(g["event_type"].to_numpy(), return_inverse=True)
        order = np.lexsort((eid, us, uid))
        uid, codes = uid[order], codes[order]
        same = uid[1:] == uid[:-1]
        k = et.size
        pair_code = codes[:-1][same] * k + codes[1:][same]
        cnt = np.bincount(pair_code, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "prev_type": et[nz // k],
                "event_type": et[nz % k],
                "n": cnt[nz],
            }
        )

    partials = _pairs_via_groups(
        ev.map_batches(prep, batch_format="pyarrow"), n_est, transitions_block
    )
    return two_phase_sum(
        partials, ["prev_type", "event_type"], ["n"], count_as=None
    ).sort(["prev_type", "event_type"])


SQL_EVENT_TRANSITIONS = """
  WITH t AS (
    SELECT event_type,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events)
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM t WHERE prev_type IS NOT NULL
  GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_latest_state(sf_dir: str) -> Dataset:
    """CDC-style LATEST-STATE materialisation (merge-on-read upsert
    view): one row per user holding their most recent event by
    (ts, event_id) — the lakehouse "current table" primitive.
    Row-argmax is SELF-COMBINING: every block keeps its best row per
    user, partials re-reduce with the same comparator, and placement
    is adaptive via the coarse-group router (single task below the
    partial budget, count-scaled user-hash groups above)."""
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    n_est = _table_nrows(sf_dir, "events")
    mask = np.int64(coarse_width(n_est) - 1)

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "last_us": batch["ts"].cast(pa.int64()),
                "last_event_id": batch["event_id"],
                "last_type": batch["event_type"],
                "last_value_micro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
                "__coarse": pa.array(np.bitwise_and(uid, mask)),
            }
        )

    def best_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=["__coarse"], errors="ignore")
        uid = g["user_id"].to_numpy()
        us = g["last_us"].to_numpy()
        eid = g["last_event_id"].to_numpy()
        order = np.lexsort((eid, us, uid))
        uid_s = uid[order]
        last = np.empty(uid_s.shape[0], dtype=bool)
        last[-1] = True
        last[:-1] = uid_s[1:] != uid_s[:-1]
        take = order[last]
        out = g.iloc[take][
            ["user_id", "last_type", "last_us", "last_value_micro", "last_event_id"]
        ]
        return out.reset_index(drop=True)

    # per-block partial argmax first, so the router only moves one row
    # per (block, user)
    partials = ev.map_batches(prep, batch_format="pyarrow").map_batches(
        lambda b: pa.Table.from_pandas(
            best_block(b.to_pandas()).assign(
                __coarse=lambda d: np.bitwise_and(
                    d["user_id"].to_numpy(np.int64), mask
                )
            ),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    out = _pairs_via_groups(partials, n_est, best_block)
    return out.sort("user_id")


SQL_EVENTS_LATEST_STATE = """
  WITH r AS (
    SELECT user_id, event_type, value, ts, event_id,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  SELECT user_id, event_type AS last_type,
         CAST(epoch_us(ts) AS BIGINT) AS last_us,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS last_value_micro,
         event_id AS last_event_id
  FROM r WHERE rn = 1 ORDER BY user_id
"""


_KEYWORDS = ("data", "model", "learn", "web", "test")


def q_keyword_match(sf_dir: str) -> Dataset:
    """Multi-pattern SUBSTRING content filter: per keyword, how many
    documents contain it anywhere in the text (the
    blocklist/allowlist primitive of a curation pipeline).  One
    vectorised Arrow ``match_substring`` pass per keyword inside the
    same map stage (K small here; a large dictionary would swap in an
    Aho–Corasick actor — same stage shape); per-keyword hits
    pre-aggregate per block so the exchange carries K rows per block."""
    ds = _read(sf_dir, "documents", ["text"])

    def hits(batch: pa.Table) -> pa.Table:
        ns = [
            int(pc.sum(pc.match_substring(batch["text"], kw)).as_py() or 0)
            for kw in _KEYWORDS
        ]
        return pa.table(
            {
                "keyword": pa.array(list(_KEYWORDS), type=pa.string()),
                "n_docs": pa.array(np.asarray(ns, dtype=np.int64)),
            }
        )

    return two_phase_sum(
        ds.map_batches(hits, batch_format="pyarrow"), ["keyword"], ["n_docs"],
        count_as=None,
    ).sort("keyword")


SQL_KEYWORD_MATCH = (
    "  WITH kw(keyword) AS (VALUES "
    + ", ".join(f"('{k}')" for k in _KEYWORDS)
    + """)
  SELECT kw.keyword,
         CAST(sum(CASE WHEN position(kw.keyword IN d.text) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
  FROM kw, documents d
  GROUP BY 1 ORDER BY 1
"""
)


_PERIOD_CUT_US = int(np.datetime64("1998-01-01", "us").astype(np.int64))


def q_customer_period_shift(sf_dir: str) -> Dataset:
    """FULL OUTER join at customer scale: each customer's order count
    and spend in the early period (< 1998) vs the late period, with
    customers active in only one period kept by the outer padding
    (zero-coalesced counts + presence flags).  Exercises the one
    equi-join mode the rest of the registry didn't: full outer CANNOT
    broadcast (an unmatched broadcast-side row would emit once per
    probe batch), so adaptive_join routes it to the co-partitioned
    bucketed join unconditionally."""
    from hexscape_ray.stages.joins import adaptive_join

    def split(before: bool):
        def prep(batch: pa.Table) -> pa.Table:
            us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = us < _PERIOD_CUT_US if before else us >= _PERIOD_CUT_US
            t = batch.filter(pa.array(keep))
            return pa.table(
                {
                    "c_custkey": t["o_custkey"],
                    "cents": pa.array(_cents(t["o_totalprice"])),
                }
            )

        ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        return two_phase_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["c_custkey"],
            ["cents"],
            count_as="n",
        )

    early = split(True).rename_columns({"cents": "early_c", "n": "n_early"})
    late = split(False).rename_columns({"cents": "late_c", "n": "n_late"})
    joined = adaptive_join(
        early,
        late,
        on="c_custkey",
        how="outer",
        big_schema=pa.schema(
            [("c_custkey", pa.int64()), ("early_c", pa.int64()), ("n_early", pa.int64())]
        ),
        side_schema=pa.schema(
            [("c_custkey", pa.int64()), ("late_c", pa.int64()), ("n_late", pa.int64())]
        ),
    )

    def finish(batch: pa.Table) -> pa.Table:
        def col(name):
            return batch[name].fill_null(0).cast(pa.int64())

        ne, nl = col("n_early"), col("n_late")
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "n_early": ne,
                "early_c": col("early_c"),
                "n_late": nl,
                "late_c": col("late_c"),
                "has_early": pc.cast(pc.greater(ne, 0), pa.int64()),
                "has_late": pc.cast(pc.greater(nl, 0), pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


SQL_CUSTOMER_PERIOD_SHIFT = """
  WITH e AS (
    SELECT o_custkey AS c_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS early_c,
           count(*) AS n_early
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
  l AS (
    SELECT o_custkey AS c_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS late_c,
           count(*) AS n_late
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1)
  SELECT coalesce(e.c_custkey, l.c_custkey) AS c_custkey,
         CAST(coalesce(n_early, 0) AS BIGINT) AS n_early,
         CAST(coalesce(early_c, 0) AS BIGINT) AS early_c,
         CAST(coalesce(n_late, 0) AS BIGINT) AS n_late,
         CAST(coalesce(late_c, 0) AS BIGINT) AS late_c,
         CAST(CASE WHEN n_early > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_early,
         CAST(CASE WHEN n_late > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_late
  FROM e FULL OUTER JOIN l USING (c_custkey)
  ORDER BY c_custkey
"""


def q_events_latest_state_stream(sf_dir: str):
    """STREAMING twin of events_latest_state
    (stages/streaming.py::streaming_latest_state): incremental
    per-shard argmax state, router-fed; shares
    SQL_EVENTS_LATEST_STATE (argmax commutes)."""
    from hexscape_ray.stages.streaming import streaming_latest_state

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    pdf = streaming_latest_state(ev)
    return ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


def q_audience_overlap_sketch(sf_dir: str) -> Dataset:
    """KMV SET ALGEBRA (theta-sketch style): estimate the overlap of
    two audiences — users who viewed vs users who purchased — from two
    fixed-size bottom-k sketches, never materialising either set.
    τ = kth smallest hash of the sketch union; every union-bottom-k
    element ≤ τ is guaranteed present in its side's sketch (τ ≤ both
    kth values), so the common count is exact over the sample and
    Jaccard/intersection estimates follow.  All DETERMINISTIC given
    splitmix64 (a uint64 bijection), so the SQL oracle reproduces the
    sketch bit-exactly — including the small-set exact path (m < k).
    Scale shape: per-block unique bottom-k partials (k ints per
    block), one coordinator merge of two k-sized arrays."""
    from hexscape_ray.stages.sketch import kmv_bottomk

    K = 256
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def side(tp: str) -> Dataset:
        return ev.map_batches(
            lambda b, tp=tp: b.filter(pc.equal(b["event_type"], tp)).select(
                ["user_id"]
            ),
            batch_format="pyarrow",
        )

    ska = kmv_bottomk(side("view"), "user_id", k=K)
    skb = kmv_bottomk(side("purchase"), "user_id", k=K)
    uni = np.unique(np.concatenate([ska, skb]))[:K]
    m = int(uni.size)
    kth = np.uint64(uni[-1]) if m else np.uint64(0)
    common = int(np.sum(np.isin(uni, ska) & np.isin(uni, skb)))
    if m < K:
        union_est = float(m)
        jacc = common / m if m else 0.0
    else:
        union_est = (K - 1) / (np.float64(kth) / 18446744073709551616.0)
        jacc = common / float(K)
    inter_est = jacc * union_est
    kv = int(kth)
    kth_i64 = kv - (1 << 64) if kv >= (1 << 63) else kv
    return ray.data.from_arrow(
        pa.table(
            {
                "m": pa.array([m], type=pa.int64()),
                "kth_hash": pa.array([kth_i64], type=pa.int64()),
                "n_common": pa.array([common], type=pa.int64()),
                "union_est_pml": pa.array(
                    [int(np.floor(1e6 * union_est + 0.5))], type=pa.int64()
                ),
                "jacc_pml": pa.array(
                    [int(np.floor(1e6 * jacc + 0.5))], type=pa.int64()
                ),
                "inter_est_pml": pa.array(
                    [int(np.floor(1e6 * inter_est + 0.5))], type=pa.int64()
                ),
            }
        )
    )


def _sql_audience_overlap() -> str:
    K = 256
    M = "18446744073709551616.0"
    sma = _splitmix64_sql("user_id", carry="user_id", src="va")
    smb = _splitmix64_sql("user_id", carry="user_id", src="vb")
    return f"""
  WITH va AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
  vb AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
  ua AS (SELECT DISTINCT h FROM ({sma})),
  ub AS (SELECT DISTINCT h FROM ({smb})),
  uni AS (SELECT h FROM (SELECT h FROM ua UNION SELECT h FROM ub)
          ORDER BY h LIMIT {K}),
  st AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS kth FROM uni),
  cm AS (SELECT CAST(count(*) AS BIGINT) AS c
         FROM uni JOIN ua USING (h) JOIN ub USING (h)),
  es AS (
    SELECT st.m, st.kth, cm.c,
           CASE WHEN st.m < {K} THEN CAST(st.m AS DOUBLE)
                ELSE ({K} - 1) / (CAST(st.kth AS DOUBLE) / {M}) END AS union_est,
           CASE WHEN st.m < {K} THEN
                  CASE WHEN st.m > 0 THEN CAST(cm.c AS DOUBLE) / st.m ELSE 0.0 END
                ELSE CAST(cm.c AS DOUBLE) / {K}.0 END AS jacc
    FROM st, cm)
  SELECT m,
         CAST(CASE WHEN kth >= 9223372036854775808
                   THEN kth - 18446744073709551616 ELSE kth END AS BIGINT)
           AS kth_hash,
         c AS n_common,
         CAST(floor(1e6 * union_est + 0.5) AS BIGINT) AS union_est_pml,
         CAST(floor(1e6 * jacc + 0.5) AS BIGINT) AS jacc_pml,
         CAST(floor(1e6 * (jacc * union_est) + 0.5) AS BIGINT) AS inter_est_pml
  FROM es
"""


SQL_AUDIENCE_OVERLAP_SKETCH = _sql_audience_overlap()


def q_daily_revenue_gapfill(sf_dir: str) -> Dataset:
    """DENSE time series with GAP FILLING: order revenue per epoch
    day over the full [min, max] day range, zero rows generated for
    days with no orders (the grid-completion pattern applied to time —
    dashboards and window functions need dense series).  The day
    census reduces two-phase; the dense axis generates DISTRIBUTED
    (``ray.data.range``) and each range block fills from the broadcast
    census — no driver loop, no join shuffle (census is day-scale)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day_id": pa.array((us // _US_PER_DAY).astype(np.int64)),
                "cents": pa.array(_cents(batch["o_totalprice"])),
            }
        )

    census = two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day_id"],
        ["cents"],
        count_as="n_orders",
    ).take_all()
    cd = np.array(sorted(int(r["day_id"]) for r in census), dtype=np.int64)
    by = {int(r["day_id"]): (int(r["cents"]), int(r["n_orders"])) for r in census}
    cc = np.array([by[int(d)][0] for d in cd], dtype=np.int64)
    cn = np.array([by[int(d)][1] for d in cd], dtype=np.int64)
    lo, hi = int(cd[0]), int(cd[-1])
    cref = ray.put((cd, cc, cn))

    def fill(batch: pa.Table) -> pa.Table:
        cd_, cc_, cn_ = ray.get(cref)
        days = batch["id"].to_numpy(zero_copy_only=False) + lo
        idx = np.searchsorted(cd_, days)
        idx = np.minimum(idx, cd_.size - 1)
        hit = cd_[idx] == days
        cents = np.where(hit, cc_[idx], 0)
        n = np.where(hit, cn_[idx], 0)
        return pa.table(
            {
                "day_id": pa.array(days),
                "cents": pa.array(cents),
                "n_orders": pa.array(n),
                "has_orders": pa.array((n > 0).astype(np.int64)),
            }
        )

    return (
        ray.data.range(hi - lo + 1)
        .map_batches(fill, batch_format="pyarrow")
        .sort("day_id")
    )


SQL_DAILY_REVENUE_GAPFILL = """
  WITH c AS (
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_id,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           count(*) AS n_orders
    FROM orders GROUP BY 1),
  axis AS (
    SELECT unnest(range((SELECT min(day_id) FROM c),
                        (SELECT max(day_id) FROM c) + 1)) AS day_id)
  SELECT a.day_id,
         CAST(coalesce(c.cents, 0) AS BIGINT) AS cents,
         CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders,
         CAST(CASE WHEN c.day_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_orders
  FROM axis a LEFT JOIN c USING (day_id)
  ORDER BY a.day_id
"""


def q_nation_revenue_share(sf_dir: str) -> Dataset:
    """SHARE-OF-PARENT contribution analysis: each nation's customer
    order revenue as a fraction of its region's total.  Two-level
    census (nation, then region roll-up from the already-reduced
    table); the share is the one float — a final division of exact
    integer sums, micro-rounded.  Nation→region is a 25-row driver
    lookup pushed into the map (never shuffled)."""
    from hexscape_ray.stages.joins import adaptive_join

    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in _tiny_rows(sf_dir, "nation")
    }

    def cust_prep(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.array(sorted(nat), dtype=np.int64)
        regs = np.array([nat[int(k)] for k in sorted(nat)], dtype=np.int64)
        idx = np.searchsorted(keys, nk)
        return pa.table(
            {
                "o_custkey": batch["c_custkey"],
                "n_nationkey": pa.array(nk),
                "n_regionkey": pa.array(regs[idx]),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow"
    )

    def ord_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": pa.array(_cents(batch["o_totalprice"])),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        ord_prep, batch_format="pyarrow"
    )
    joined = adaptive_join(
        orders,
        cust,
        on="o_custkey",
        big_schema=pa.schema([("o_custkey", pa.int64()), ("cents", pa.int64())]),
        side_schema=pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("n_nationkey", pa.int64()),
                ("n_regionkey", pa.int64()),
            ]
        ),
    )
    per_nation = two_phase_sum(
        joined.select_columns(["n_regionkey", "n_nationkey", "cents"]),
        ["n_regionkey", "n_nationkey"],
        ["cents"],
        count_as="n_orders",
    ).materialize()
    per_region = {
        int(r["n_regionkey"]): int(r["cents"])
        for r in two_phase_sum(
            per_nation, ["n_regionkey"], ["cents"], count_as=None
        ).take_all()
    }

    def share(batch: pa.Table) -> pa.Table:
        reg = batch["n_regionkey"].to_numpy(zero_copy_only=False)
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.array([per_region[int(r)] for r in reg], dtype=np.float64)
        pml = np.floor(1e6 * (c / tot) + 0.5).astype(np.int64)
        return batch.append_column("share_pml", pa.array(pml))

    return per_nation.map_batches(share, batch_format="pyarrow").sort(
        ["n_regionkey", "n_nationkey"]
    )


SQL_NATION_REVENUE_SHARE = """
  WITH n AS (
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           CAST(c.c_nationkey AS BIGINT) AS n_nationkey,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nn ON nn.n_nationkey = c.c_nationkey
    GROUP BY 1, 2),
  r AS (SELECT n_regionkey, CAST(sum(cents) AS BIGINT) AS rtot FROM n GROUP BY 1)
  SELECT n.n_regionkey, n.n_nationkey, n.cents, n.n_orders,
         CAST(floor(1e6 * (CAST(n.cents AS DOUBLE) / CAST(r.rtot AS DOUBLE))
                    + 0.5) AS BIGINT) AS share_pml
  FROM n JOIN r USING (n_regionkey)
  ORDER BY n.n_regionkey, n.n_nationkey
"""


_MERGE_CUT_US = int(np.datetime64("2024-01-20", "us").astype(np.int64))


def q_sink_merge_roundtrip(sf_dir: str) -> Dataset:
    """Lakehouse MERGE round trip: the latest-state view of events
    BEFORE a cutoff is written to parquet (the base snapshot), read
    back, and upserted with the post-cutoff delta through the same
    self-combining argmax — the merged table must equal the one-shot
    view over ALL events (shares SQL_EVENTS_LATEST_STATE).  Proves the
    upsert state survives a parquet round trip: snapshot + any delta
    replay converges to the full-history answer, which is exactly the
    checkpoint-resume contract for CDC state."""
    import os
    import shutil

    import ray.data as rd

    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width
    from hexscape_ray.stages.joins import adaptive_join  # noqa: F401  (doc link)

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    n_est = _table_nrows(sf_dir, "events")
    mask = np.int64(coarse_width(n_est) - 1)

    def prep(before: bool):
        def fn(batch: pa.Table) -> pa.Table:
            us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = us < _MERGE_CUT_US if before else us >= _MERGE_CUT_US
            t = batch.filter(pa.array(keep))
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            v = t["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "last_us": t["ts"].cast(pa.int64()),
                    "last_event_id": t["event_id"],
                    "last_type": t["event_type"],
                    "last_value_micro": pa.array(
                        np.floor(v * 1e6 + 0.5).astype(np.int64)
                    ),
                    "__coarse": pa.array(np.bitwise_and(uid, mask)),
                }
            )

        return fn

    def best_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=["__coarse"], errors="ignore")
        uid = g["user_id"].to_numpy()
        us = g["last_us"].to_numpy()
        eid = g["last_event_id"].to_numpy()
        order = np.lexsort((eid, us, uid))
        uid_s = uid[order]
        last = np.empty(uid_s.shape[0], dtype=bool)
        last[-1] = True
        last[:-1] = uid_s[1:] != uid_s[:-1]
        out = g.iloc[order[last]][
            ["user_id", "last_type", "last_us", "last_value_micro", "last_event_id"]
        ]
        return out.reset_index(drop=True)

    base = _pairs_via_groups(
        ev.map_batches(prep(True), batch_format="pyarrow"), n_est, best_block
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = f"/tmp/hexray_merge/{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    base.write_parquet(out_dir)

    snapshot = rd.read_parquet(out_dir).map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "last_type": b["last_type"].cast(pa.string()),
                "last_us": b["last_us"].cast(pa.int64()),
                "last_value_micro": b["last_value_micro"].cast(pa.int64()),
                "last_event_id": b["last_event_id"].cast(pa.int64()),
                "__coarse": pa.array(
                    np.bitwise_and(
                        b["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                        mask,
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    delta = ev.map_batches(prep(False), batch_format="pyarrow")
    merged = _pairs_via_groups(snapshot.union(delta), n_est, best_block)
    return merged.sort("user_id")


def q_winsorized_value_stats(sf_dir: str) -> Dataset:
    """WINSORIZED robust statistics: per event type, clip the value
    column at its exact [p05, p95] discrete quantiles and report the
    clipped sum plus how many rows were clipped.  Composition shape:
    the exact grouped quantiles ride the value-compressed two-phase
    (one row per distinct value per key through the exchange), the
    tiny quantile table broadcasts back into a second streaming pass —
    quantile-then-reaggregate without ever sorting the fact table."""
    from hexscape_ray.stages.agg import grouped_quantiles_disc

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "v": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    pv = ds.map_batches(prep, batch_format="pyarrow").materialize()
    qt = grouped_quantiles_disc(pv, ["event_type"], "v", {"p05": 0.05, "p95": 0.95})
    bounds = {
        r["event_type"]: (int(r["p05"]), int(r["p95"])) for r in qt.take_all()
    }
    types = sorted(bounds)
    lo_arr = np.array([bounds[t][0] for t in types], dtype=np.int64)
    hi_arr = np.array([bounds[t][1] for t in types], dtype=np.int64)
    tset = pa.array(types)

    def clip(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["event_type"], value_set=tset).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False)
        lo, hi = lo_arr[idx], hi_arr[idx]
        vc = np.minimum(np.maximum(v, lo), hi)
        clipped = ((v < lo) | (v > hi)).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "p05": pa.array(lo),
                "p95": pa.array(hi),
                "vw": pa.array(vc),
                "clipped": pa.array(clipped),
            }
        )

    return two_phase_sum(
        pv.map_batches(clip, batch_format="pyarrow"),
        ["event_type", "p05", "p95"],
        ["vw", "clipped"],
        count_as="n",
    ).rename_columns({"vw": "sum_winsor", "clipped": "n_clipped"}).sort("event_type")


SQL_WINSORIZED_VALUE_STATS = """
  WITH v AS (
    SELECT event_type, CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
    FROM events),
  q AS (
    SELECT event_type,
           quantile_disc(v, 0.05) AS p05, quantile_disc(v, 0.95) AS p95
    FROM v GROUP BY 1)
  SELECT v.event_type, q.p05, q.p95,
         CAST(sum(LEAST(GREATEST(v.v, q.p05), q.p95)) AS BIGINT) AS sum_winsor,
         CAST(sum(CASE WHEN v.v < q.p05 OR v.v > q.p95 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_clipped,
         count(*) AS n
  FROM v JOIN q USING (event_type)
  GROUP BY 1, 2, 3 ORDER BY 1
"""


def q_sink_orc_roundtrip(sf_dir: str) -> Dataset:
    """CUSTOM FORMAT sink/source pair: the per-source census written
    as ORC (one file per block via a map-stage sink — the pattern for
    any format Ray lacks a native writer for), re-read distributed
    (file-list dataset → per-file ``pyarrow.orc`` reads), and
    re-aggregated to the per-lang census — hash-identical to the
    direct SQL.  Proves schema/dtype survival through a THIRD columnar
    container beyond parquet and the text formats."""
    import os
    import shutil
    import uuid

    import pyarrow.orc  # noqa: F401  (import check at build time)

    docs = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    fine = two_phase_sum(docs, ["source", "lang"], ["n_chars"], count_as="n_docs")
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/hexray_orc/{tag}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        path = os.path.join(out, f"part-{uuid.uuid4().hex}.orc")
        _orc.write_table(batch, path)
        return pa.table(
            {
                "path": pa.array([path], type=pa.string()),
                "rows": pa.array([len(batch)], type=pa.int64()),
            }
        )

    manifest = fine.map_batches(write_block, batch_format="pyarrow").take_all()

    def read_file(batch: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        tables = [_orc.read_table(p.as_py()) for p in batch["path"]]
        return pa.concat_tables(tables)

    files = ray.data.from_arrow(
        pa.table({"path": pa.array([r["path"] for r in manifest], type=pa.string())})
    )
    back = files.map_batches(read_file, batch_format="pyarrow", batch_size=1)
    out_ds = two_phase_sum(back, ["lang"], ["n_chars", "n_docs"], count_as=None)
    return out_ds.rename_columns({"n_chars": "len_sum"}).sort("lang")


SQL_SINK_ORC_ROUNDTRIP = """
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS len_sum,
         count(*) AS n_docs
  FROM documents GROUP BY lang ORDER BY lang
"""


def q_exact_price_quantiles(sf_dir: str) -> Dataset:
    """EXACT quartiles of an unbounded-cardinality column WITHOUT
    sorting: radix select (stages/agg.py::radix_select) walks the
    target rank down 8 byte-level histograms — every pass is map-only
    and ships 256 counters per block, so at 100 TB the exchange is
    constant-size regardless of value cardinality (the case the
    value-compressed grouped_quantiles_disc cannot assume).  The
    prepped column materialises once and feeds FOUR shared passes —
    :func:`radix_select_multi` walks 16-bit digits for all three ranks
    at once (byte-wise single-rank radix_select stays as the tested
    primitive; 24 passes → 4 cut this query 6.6 → ~1.5 s at sf0.1)."""
    from hexscape_ray.stages.agg import radix_select_multi

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"cents": pa.array(_cents(batch["l_extendedprice"]))})

    pv = ds.map_batches(prep, batch_format="pyarrow").materialize()
    n = pv.count()
    sel = radix_select_multi(pv, "cents", {"p25": 0.25, "p50": 0.50, "p75": 0.75}, n_rows=n)
    p25, p50, p75 = sel["p25"], sel["p50"], sel["p75"]
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "p25_c": pa.array([p25], type=pa.int64()),
                "p50_c": pa.array([p50], type=pa.int64()),
                "p75_c": pa.array([p75], type=pa.int64()),
            }
        )
    )


SQL_EXACT_PRICE_QUANTILES = """
  WITH v AS (
    SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM lineitem)
  SELECT count(*) AS n,
         quantile_disc(cents, 0.25) AS p25_c,
         quantile_disc(cents, 0.50) AS p50_c,
         quantile_disc(cents, 0.75) AS p75_c
  FROM v
"""


def q_purchase_attribution(sf_dir: str) -> Dataset:
    """LAST-TOUCH ATTRIBUTION: every purchase aligned with the same
    user's most recent view within one hour (the conversion-funnel
    primitive), reported per day as purchase / attributed counts and
    the total view→purchase lag.  One LEFT as-of join with tolerance
    (unattributed purchases survive as nulls) — the backward match +
    window drop are exactly pandas merge_asof semantics, mirrored in
    SQL by a max() over the bounded window."""
    from hexscape_ray.stages.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def side(tp: str, tcol: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], tp))
            cols = {"user_id": t["user_id"], tcol: t["ts"].cast(pa.int64())}
            if tp == "purchase":
                cols["event_id"] = t["event_id"]
            return pa.table(cols)

        return ev.map_batches(fn, batch_format="pyarrow")

    joined = asof_join(
        side("purchase", "us"),
        side("view", "vus"),
        on="user_id",
        left_time="us",
        right_time="vus",
        how="left",
        tolerance=3_600_000_000,
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("us", pa.int64()), ("event_id", pa.int64())]
        ),
        right_schema=pa.schema([("user_id", pa.int64()), ("vus", pa.int64())]),
    )

    def census(batch: pa.Table) -> pa.Table:
        us = batch["us"].to_numpy(zero_copy_only=False)
        valid = pc.is_valid(batch["vus"]).to_numpy(zero_copy_only=False)
        vus = (
            batch["vus"].combine_chunks().fill_null(0).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lag = np.where(valid, us - vus, 0).astype(np.int64)
        return pa.table(
            {
                "day_id": pa.array((us // _US_PER_DAY).astype(np.int64)),
                "n_attributed": pa.array(valid.astype(np.int64)),
                "sum_lag_us": pa.array(lag),
            }
        )

    return two_phase_sum(
        joined.map_batches(census, batch_format="pyarrow"),
        ["day_id"],
        ["n_attributed", "sum_lag_us"],
        count_as="n_purchases",
    ).sort("day_id")


SQL_PURCHASE_ATTRIBUTION = """
  WITH p AS (
    SELECT event_id, user_id, epoch_us(ts) AS us
    FROM events WHERE event_type = 'purchase'),
  v AS (
    SELECT user_id, epoch_us(ts) AS vus
    FROM events WHERE event_type = 'view'),
  m AS (
    SELECT p.event_id, p.us, max(v.vus) AS vus
    FROM p LEFT JOIN v
      ON v.user_id = p.user_id AND v.vus <= p.us
         AND v.vus >= p.us - 3600000000
    GROUP BY 1, 2)
  SELECT CAST(us // 86400000000 AS BIGINT) AS day_id,
         CAST(sum(CASE WHEN vus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_attributed,
         CAST(coalesce(sum(us - vus), 0) AS BIGINT) AS sum_lag_us,
         count(*) AS n_purchases
  FROM m GROUP BY 1 ORDER BY 1
"""


_RESERVOIR_K = 64


def q_weighted_reservoir(sf_dir: str) -> Dataset:
    """Efraimidis–Spirakis weighted reservoir sample (A-ES): exactly k
    documents drawn with probability ∝ n_chars, deterministically —
    key = ln(u)/w with u = (splitmix64(doc_id)+1)/2^64, keep the k
    LARGEST keys.  The per-row key is a pure hash function, so the
    sample is identical under any partitioning/resume AND the SQL
    oracle recomputes it exactly (numpy and DuckDB ln agree
    bit-for-bit over this domain — probed in round 4; splitmix64 via
    the limb-exact SQL).  Scale shape: top-k is a mergeable reduction
    — each block keeps its local k, one task merges k·blocks rows."""
    from hexscape_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def keyed(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = splitmix64(did.view(np.uint64)).astype(np.float64)
        u = (h + 1) / 18446744073709551616.0
        k = np.log(u) / w
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "k": pa.array(k),
            }
        )

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        kk = batch["k"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -kk))[:_RESERVOIR_K]
        return batch.take(pa.array(order))

    sel = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )

    def finish(batch: pa.Table) -> pa.Table:
        kk = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "key_nano": pa.array(
                    np.floor(1e9 * kk + 0.5).astype(np.int64)
                ),
            }
        )

    return sel.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def _sql_weighted_reservoir() -> str:
    sm = _splitmix64_sql("doc_id", carry="doc_id, n_chars", src="documents")
    return f"""
  WITH keyed AS (
    SELECT doc_id, n_chars,
           -- (CAST(h AS DOUBLE) + 1), NOT CAST(h+1 AS DOUBLE): the two
           -- differ by one ulp when h+1 crosses a float64 rounding
           -- midpoint, and the numpy side computes float64(h) + 1.0
           ln((CAST(h AS DOUBLE) + 1) / 18446744073709551616.0)
             / n_chars AS k
    FROM ({sm})),
  sel AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT {_RESERVOIR_K})
  SELECT doc_id, n_chars,
         CAST(floor(1e9 * k + 0.5) AS BIGINT) AS key_nano
  FROM sel ORDER BY doc_id
"""


SQL_WEIGHTED_RESERVOIR = _sql_weighted_reservoir()


def q_parquet_footer_stats(sf_dir: str) -> Dataset:
    """METADATA-ONLY statistics: per parquet file of the lineitem
    table, row count and l_orderkey / l_quantity min/max read from the
    FOOTER (row-group statistics), never touching data pages — the
    planning primitive behind row-group pruning (a query with a
    selective range predicate schedules only matching groups).  The
    file list fans out as a dataset so footers parse distributed; the
    oracle recomputes the same stats from the data, proving the
    footers tell the truth."""
    import glob as _glob
    import os

    paths = sorted(_glob.glob(os.path.join(sf_dir, "lineitem.parquet"))) or sorted(
        _glob.glob(os.path.join(sf_dir, "lineitem", "*.parquet"))
    )
    files = ray.data.from_arrow(
        pa.table({"path": pa.array(paths, type=pa.string())})
    )

    def footer(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rows_l, okmin, okmax, qmin, qmax = [], [], [], [], []
        for p in batch["path"].to_pylist():
            md = pq.ParquetFile(p).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            n = md.num_rows
            o_lo = q_lo = None
            o_hi = q_hi = None
            for rg in range(md.num_row_groups):
                so = md.row_group(rg).column(names["l_orderkey"]).statistics
                sq = md.row_group(rg).column(names["l_quantity"]).statistics
                o_lo = so.min if o_lo is None else min(o_lo, so.min)
                o_hi = so.max if o_hi is None else max(o_hi, so.max)
                q_lo = sq.min if q_lo is None else min(q_lo, sq.min)
                q_hi = sq.max if q_hi is None else max(q_hi, sq.max)
            rows_l.append(n)
            okmin.append(int(o_lo))
            okmax.append(int(o_hi))
            qmin.append(int(np.floor(q_lo + 0.5)))
            qmax.append(int(np.floor(q_hi + 0.5)))
        return pa.table(
            {
                "n_rows": pa.array(rows_l, type=pa.int64()),
                "ok_min": pa.array(okmin, type=pa.int64()),
                "ok_max": pa.array(okmax, type=pa.int64()),
                "qty_min": pa.array(qmin, type=pa.int64()),
                "qty_max": pa.array(qmax, type=pa.int64()),
            }
        )

    per_file = files.map_batches(footer, batch_format="pyarrow")
    # one summary row (tables may split into many files at scale)
    from hexscape_ray.stages.agg import two_phase_agg

    out = two_phase_agg(
        per_file.map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.zeros(len(b), dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["one"],
        {
            "n_rows": "sum",
            "ok_min": "min",
            "ok_max": "max",
            "qty_min": "min",
            "qty_max": "max",
        },
    )
    return out.map_batches(
        lambda b: b.drop_columns(["one"]), batch_format="pyarrow"
    )


SQL_PARQUET_FOOTER_STATS = """
  SELECT count(*) AS n_rows,
         CAST(min(l_orderkey) AS BIGINT) AS ok_min,
         CAST(max(l_orderkey) AS BIGINT) AS ok_max,
         CAST(min(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty_min,
         CAST(max(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty_max
  FROM lineitem
"""


def q_user_longest_streak(sf_dir: str) -> Dataset:
    """GAPS-AND-ISLANDS per user: longest run of CONSECUTIVE active
    days (the retention-streak metric).  Events reduce to distinct
    (user, day) rows two-phase; the streak kernel runs per count-scaled
    user-hash coarse group in ONE lexsort pass (islands = runs where
    day − rank is constant, the dup_spans diagonal trick applied to
    time).  SQL mirrors with day − row_number() islands."""
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    n_est = _table_nrows(sf_dir, "events")
    mask = np.int64(coarse_width(n_est) - 1)

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day_id": pa.array((us // _US_PER_DAY).astype(np.int64)),
                "__coarse": pa.array(np.bitwise_and(uid, mask)),
            }
        )

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": np.empty(0, np.int64),
                    "n_active_days": np.empty(0, np.int64),
                    "longest_streak": np.empty(0, np.int64),
                }
            )
        uid = g["user_id"].to_numpy()
        day = g["day_id"].to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        uniq = np.empty(uid.shape[0], dtype=bool)  # distinct (user, day)
        uniq[0] = True
        uniq[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[uniq], day[uniq]
        # island id = day − per-user rank (constant within a run)
        new_user = np.empty(uid.shape[0], dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        rank = np.arange(uid.shape[0]) - np.repeat(starts, np.diff(np.append(starts, uid.shape[0])))
        isl = day - rank
        # run lengths per (user, island)
        brk = np.empty(uid.shape[0], dtype=bool)
        brk[0] = True
        brk[1:] = new_user[1:] | (isl[1:] != isl[:-1])
        run_starts = np.flatnonzero(brk)
        run_lens = np.diff(np.append(run_starts, uid.shape[0]))
        run_uid = uid[run_starts]
        out_u, out_active, out_best = [], [], []
        u_starts = np.flatnonzero(np.r_[True, run_uid[1:] != run_uid[:-1]])
        u_ends = np.r_[u_starts[1:], run_uid.size]
        for s, e in zip(u_starts, u_ends):
            out_u.append(run_uid[s])
            out_active.append(int(run_lens[s:e].sum()))
            out_best.append(int(run_lens[s:e].max()))
        return pd.DataFrame(
            {
                "user_id": np.asarray(out_u, dtype=np.int64),
                "n_active_days": np.asarray(out_active, dtype=np.int64),
                "longest_streak": np.asarray(out_best, dtype=np.int64),
            }
        )

    out = _pairs_via_groups(
        ev.map_batches(prep, batch_format="pyarrow"), n_est, streaks
    )
    return out.sort("user_id")


SQL_USER_LONGEST_STREAK = """
  WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
    FROM events),
  isl AS (
    SELECT user_id, day_id,
           day_id - row_number() OVER (
             PARTITION BY user_id ORDER BY day_id) AS island
    FROM ud),
  runs AS (
    SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
    FROM isl GROUP BY 1, 2)
  SELECT user_id,
         CAST(sum(run_len) AS BIGINT) AS n_active_days,
         CAST(max(run_len) AS BIGINT) AS longest_streak
  FROM runs GROUP BY 1 ORDER BY 1
"""


def q_conversion_lag(sf_dir: str) -> Dataset:
    """TIME-TO-CONVERT distribution: for every user with a view, the
    lag in whole hours from their FIRST view to their first purchase
    AFTER it, histogrammed (lag −1 = never converted).  Fully
    distributed: first-view mins (two-phase), purchases qualify
    against them through a user-keyed adaptive join (bucketed past the
    broadcast budget — no driver-side user map), first qualifying
    purchase via a second two-phase MIN, one LEFT join back, then the
    hour-bucket census."""
    from hexscape_ray.stages.agg import two_phase_agg
    from hexscape_ray.stages.joins import adaptive_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def side(tp: str):
        return ev.map_batches(
            lambda b, tp=tp: pa.table(
                {
                    "user_id": b.filter(pc.equal(b["event_type"], tp))["user_id"],
                    "us": b.filter(pc.equal(b["event_type"], tp))["ts"].cast(
                        pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    fvd = two_phase_agg(side("view"), ["user_id"], {"us": "min"}).rename_columns(
        {"us": "vus"}
    ).materialize()
    cand = adaptive_join(
        side("purchase"),
        fvd,
        on="user_id",
        big_schema=pa.schema([("user_id", pa.int64()), ("us", pa.int64())]),
        side_schema=pa.schema([("user_id", pa.int64()), ("vus", pa.int64())]),
    )

    def qualify(batch: pa.Table) -> pa.Table:
        us = batch["us"].to_numpy(zero_copy_only=False)
        vus = batch["vus"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(us >= vus)).select(["user_id", "us"])

    fpd = two_phase_agg(
        cand.map_batches(qualify, batch_format="pyarrow"),
        ["user_id"],
        {"us": "min"},
    ).rename_columns({"us": "pus"})
    lagged = adaptive_join(
        fvd,
        fpd,
        on="user_id",
        how="left",
        big_schema=pa.schema([("user_id", pa.int64()), ("vus", pa.int64())]),
        side_schema=pa.schema([("user_id", pa.int64()), ("pus", pa.int64())]),
    )

    def bucket(batch: pa.Table) -> pa.Table:
        vus = batch["vus"].to_numpy(zero_copy_only=False)
        valid = pc.is_valid(batch["pus"]).to_numpy(zero_copy_only=False)
        pus = (
            batch["pus"].combine_chunks().fill_null(0).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lag = np.where(valid, (pus - vus) // 3_600_000_000, -1).astype(np.int64)
        return pa.table({"lag_hours": pa.array(lag)})

    return two_phase_sum(
        lagged.map_batches(bucket, batch_format="pyarrow"),
        ["lag_hours"],
        [],
        count_as="n_users",
    ).sort("lag_hours")


SQL_CONVERSION_LAG = """
  WITH fv AS (
    SELECT user_id, min(epoch_us(ts)) AS vus
    FROM events WHERE event_type = 'view' GROUP BY 1),
  fp AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS pus
    FROM events e JOIN fv ON fv.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.vus
    GROUP BY 1),
  lag AS (
    SELECT fv.user_id,
           CAST(CASE WHEN fp.pus IS NULL THEN -1
                     ELSE (fp.pus - fv.vus) // 3600000000 END AS BIGINT)
             AS lag_hours
    FROM fv LEFT JOIN fp USING (user_id))
  SELECT lag_hours, count(*) AS n_users
  FROM lag GROUP BY 1 ORDER BY 1
"""


def q_basket_lift(sf_dir: str) -> Dataset:
    """MARKET-BASKET LIFT: the top-20 co-purchased part pairs by
    support, with lift = P(a,b) / (P(a)·P(b)) as a micro-rounded final
    division of exact integer products.  Pair counts ride the same
    coarse-group clique kernel as the triangle census; per-part
    supports are a two-phase count; the distributed top-k is
    per-block partial top-20 + one merge task (no global sort)."""
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    op = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_est = _table_nrows(sf_dir, "lineitem")
    mask = np.int64(coarse_width(n_est) - 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column("__coarse", pa.array(np.bitwise_and(ok, mask)))

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        uniq = np.empty(ok.shape[0], dtype=bool)
        uniq[0] = True
        uniq[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[uniq], pk[uniq]
        new = np.empty(ok.shape[0], dtype=bool)
        new[0] = True
        new[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, ok.shape[0]))
        out_a, out_b = [], []
        for m in np.unique(lens[lens >= 2]):
            s = starts[lens == m]
            mat = pk[s[:, None] + np.arange(int(m))]
            i, j = np.triu_indices(int(m), 1)
            out_a.append(mat[:, i].ravel())
            out_b.append(mat[:, j].ravel())
        if not out_a:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    pair_rows = _pairs_via_groups(
        op.map_batches(add_bucket, batch_format="pyarrow"), n_est, pairs_block
    )
    pr = two_phase_sum(pair_rows, ["a", "b"], [], count_as="n_ab")

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -n_ab))[:20]
        return batch.take(pa.array(order))

    sel = (
        pr.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )

    # per-order distinct part rows → supports + total baskets
    def dedup_op(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        uniq = np.empty(ok.shape[0], dtype=bool)
        uniq[0] = len(ok) > 0
        uniq[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        return pa.table(
            {"l_orderkey": pa.array(ok[uniq]), "l_partkey": pa.array(pk[uniq])}
        )

    opd = two_phase_sum(
        op.map_batches(dedup_op, batch_format="pyarrow"),
        ["l_orderkey", "l_partkey"],
        [],
        count_as="__c",
    ).materialize()
    supports = {
        int(r["l_partkey"]): int(r["n_p"])
        for r in two_phase_sum(
            opd, ["l_partkey"], [], count_as="n_p"
        ).take_all()
    }
    n_tot = two_phase_sum(opd, ["l_orderkey"], [], count_as="__o").count()

    a = np.array([r["a"] for r in sel], dtype=np.int64)
    b = np.array([r["b"] for r in sel], dtype=np.int64)
    n_ab = np.array([r["n_ab"] for r in sel], dtype=np.int64)
    n_a = np.array([supports[int(x)] for x in a], dtype=np.int64)
    n_b = np.array([supports[int(x)] for x in b], dtype=np.int64)
    lift = np.floor(
        1e6 * ((n_ab * n_tot).astype(np.float64) / (n_a * n_b).astype(np.float64))
        + 0.5
    ).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "n_ab": pa.array(n_ab),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
                "lift_pml": pa.array(lift),
            }
        )
    ).sort(["a", "b"])


SQL_BASKET_LIFT = """
  WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
  sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_p FROM op GROUP BY 1),
  pr AS (
    SELECT x.l_partkey AS a, y.l_partkey AS b, CAST(count(*) AS BIGINT) AS n_ab
    FROM op x JOIN op y
      ON y.l_orderkey = x.l_orderkey AND y.l_partkey > x.l_partkey
    GROUP BY 1, 2),
  sel AS (SELECT * FROM pr ORDER BY n_ab DESC, a, b LIMIT 20)
  SELECT s.a, s.b, s.n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
         CAST(floor(1e6 * (CAST(s.n_ab * tot.n AS DOUBLE)
                           / CAST(sa.n_p * sb.n_p AS DOUBLE)) + 0.5) AS BIGINT)
           AS lift_pml
  FROM sel s
  JOIN sup sa ON sa.l_partkey = s.a
  JOIN sup sb ON sb.l_partkey = s.b, tot
  ORDER BY s.a, s.b
"""


def q_supplier_concentration(sf_dir: str) -> Dataset:
    """HERFINDAHL–HIRSCHMAN concentration per brand: how concentrated
    each brand's supply is across its suppliers, HHI = Σ (nᵢ/N)² over
    distinct (part, supplier) supply pairs — the market-structure
    aggregate.  Distinct pairs reduce two-phase, brand rides one
    adaptive dimension join, per-(brand, supplier) counts reduce
    again, and HHI is one float division of exact integer sums
    (Σ nᵢ² / N²), micro-rounded."""
    from hexscape_ray.stages.joins import adaptive_join

    pairs = two_phase_sum(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"],
        [],
        count_as="__c",
    ).map_batches(lambda b: b.drop_columns(["__c"]), batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: pa.table({"l_partkey": b["p_partkey"], "p_brand": b["p_brand"]}),
        batch_format="pyarrow",
    )
    wb = adaptive_join(
        pairs,
        part,
        on="l_partkey",
        big_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        side_schema=pa.schema([("l_partkey", pa.int64()), ("p_brand", pa.string())]),
    )
    bs = two_phase_sum(
        wb.select_columns(["p_brand", "l_suppkey"]),
        ["p_brand", "l_suppkey"],
        [],
        count_as="n_i",
    )

    def sq(batch: pa.Table) -> pa.Table:
        n = batch["n_i"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "sum_sq": pa.array(n * n),
                "n_pairs": pa.array(n),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    agg = two_phase_sum(
        bs.map_batches(sq, batch_format="pyarrow"),
        ["p_brand"],
        ["sum_sq", "n_pairs", "one"],
        count_as=None,
    ).rename_columns({"one": "n_suppliers"})

    def hhi(batch: pa.Table) -> pa.Table:
        ss = batch["sum_sq"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
        pml = np.floor(1e6 * (ss / (n * n)) + 0.5).astype(np.int64)
        return batch.append_column("hhi_pml", pa.array(pml))

    return agg.map_batches(hhi, batch_format="pyarrow").sort("p_brand")


SQL_SUPPLIER_CONCENTRATION = """
  WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
  bs AS (
    SELECT p_brand, l_suppkey, CAST(count(*) AS BIGINT) AS n_i
    FROM sp JOIN part ON p_partkey = l_partkey
    GROUP BY 1, 2),
  agg AS (
    SELECT p_brand,
           CAST(sum(n_i * n_i) AS BIGINT) AS sum_sq,
           CAST(sum(n_i) AS BIGINT) AS n_pairs,
           count(*) AS n_suppliers
    FROM bs GROUP BY 1)
  SELECT p_brand, sum_sq, n_pairs, n_suppliers,
         CAST(floor(1e6 * (CAST(sum_sq AS DOUBLE)
                           / (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE)))
                    + 0.5) AS BIGINT) AS hhi_pml
  FROM agg ORDER BY p_brand
"""


def q_events_dow_hour(sf_dir: str) -> Dataset:
    """Day-of-week × hour-of-day activity HEATMAP census (the ops
    dashboard staple): dow = (epoch_days + 4) % 7 (day 0 was a
    Thursday; matches DuckDB date_part('dow'), Sunday = 0), hour in
    UTC — both pure integer math, one two-phase census."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // _US_PER_DAY
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dow": pa.array(((days + 4) % 7).astype(np.int64)),
                "hour": pa.array(((us // 3_600_000_000) % 24).astype(np.int64)),
                "value_micro": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["dow", "hour"],
        ["value_micro"],
        count_as="n_events",
    ).sort(["dow", "hour"])


SQL_EVENTS_DOW_HOUR = """
  SELECT CAST(date_part('dow', ts) AS BIGINT) AS dow,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
         CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_micro,
         count(*) AS n_events
  FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_near_dup_pairs(sf_dir: str) -> Dataset:
    """Hash-exact MinHash-LSH near-dup: candidate pairs with their LSH
    band-hit counts AND exact trigram-set intersection/union sizes
    (stages/dedup.py::ndx_verified_pairs).  The gram table
    materialises once and feeds both the signature and the verify
    stage; only the LSH-bounded pair list reaches the driver."""
    from hexscape_ray.stages.dedup import ndx_verified_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ray.data.from_arrow(ndx_verified_pairs(ds)).sort(["a", "b"])


SQL_NEAR_DUP_PAIRS = _ndx_sql(
    "SELECT a, b, n_bands_hit, inter_grams, union_grams FROM verified ORDER BY a, b"
)


def q_near_dup_clusters(sf_dir: str) -> Dataset:
    """Hash-exact dedup clusters: near-dup pairs with trigram-set
    Jaccard ≥ 0.5 (integer predicate 2·inter ≥ union) become edges;
    components labelled by min reachable doc id via the two-tier
    connected_components stage.  The SQL oracle runs the IDENTICAL
    pipeline and closes the edges with a recursive CTE — an iterative
    graph algorithm graded bit-exactly."""
    from hexscape_ray.stages.dedup import ndx_verified_pairs
    from hexscape_ray.stages.graph import connected_components

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vt = ndx_verified_pairs(ds)
    ig = vt["inter_grams"].to_numpy()
    ug = vt["union_grams"].to_numpy()
    et = vt.filter(pa.array(2 * ig >= ug)).select(["a", "b"])
    if len(et) == 0:
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "root": pa.array([], pa.int64())}
            )
        )
    comps = connected_components(ray.data.from_arrow(et))
    return comps.rename_columns({"node": "doc_id", "component": "root"}).sort(
        "doc_id"
    )


SQL_NEAR_DUP_CLUSTERS = _ndx_sql(
    """,
edges AS (SELECT a, b FROM verified WHERE 2 * inter_grams >= union_grams),
nodes AS (SELECT a AS id FROM edges UNION SELECT b FROM edges),
sym AS (SELECT a AS src, b AS dst FROM edges UNION SELECT b, a FROM edges),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS root
FROM reach GROUP BY a ORDER BY doc_id"""
)


def q_winnow_exact(sf_dir: str) -> Dataset:
    """Hash-exact winnowing fingerprints (the MOSS sketch) over the
    SQL-replayable trigram hashes (stages/dedup.py::ndx_winnow_rows):
    window-of-4 minima, rightmost on ties, distinct (doc, pos, fp)
    rows.  Complements near_dup_pairs with the ORDER-SENSITIVE
    near-dup family — any shared run of ≥ w + k − 1 tokens shares a
    fingerprint — graded bit-exactly (the production crc32 Winnower
    stays the throughput path)."""
    from hexscape_ray.stages.dedup import ndx_winnow_rows

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ndx_winnow_rows(ds).sort(["doc_id", "pos"])


SQL_WINNOW_EXACT = _ndx_gram_prefix() + """,
gp AS (SELECT doc_id, pos, h AS g FROM sm2),
ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gp GROUP BY 1),
wins AS (
  SELECT a.doc_id, a.pos AS ws, min(b.g) AS m
  FROM gp a
  JOIN ng ON ng.doc_id = a.doc_id
  JOIN gp b ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + 3
  WHERE a.pos <= greatest(1, ng.n - 3)
  GROUP BY 1, 2),
picks AS (
  SELECT w.doc_id, max(b.pos) AS pos, w.m
  FROM wins w
  JOIN gp b ON b.doc_id = w.doc_id AND b.g = w.m
       AND b.pos BETWEEN w.ws AND w.ws + 3
  GROUP BY w.doc_id, w.ws, w.m),
fps AS (SELECT DISTINCT doc_id, pos, m FROM picks)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       CAST(CASE WHEN m >= 9223372036854775808
                 THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS fp
FROM fps ORDER BY doc_id, pos
"""




def q_set_similarity_pairs(sf_dir: str) -> Dataset:
    """EXACT-RECALL set-similarity self-join at Jaccard ≥ 0.95 over
    per-doc distinct token sets — prefix filtering (Chaudhuri ICDE'06 /
    PPJoin WWW'08), the guaranteed-recall complement to the MinHash-LSH
    family: candidates come from buckets of globally-RARE tokens (each
    doc's first |d| − ⌈τ|d|⌉ + 1 tokens under the (df, tok) order — any
    J ≥ τ pair provably shares one) with the τ·max ≤ min length filter,
    then exact |∩|/|∪| through the shared incidence-CSR verify
    (stages/dedup.py::setsim_prefix_pairs / exact_pair_counts).  The
    integer threshold 20·inter ≥ 19·union and jac_x1m = ⌊10⁶·i/u⌋ keep
    the oracle hash-exact; the SQL ground truth is the literal
    all-pairs token self-join, so parity certifies RECALL, not just
    precision."""
    from hexscape_ray.stages.dedup import setsim_prefix_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return setsim_prefix_pairs(ds).sort(["a", "b"])


SQL_SET_SIMILARITY_PAIRS = """
  WITH tok0 AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
  ),
  tok AS (SELECT DISTINCT doc_id, t FROM tok0 WHERE t <> ''),
  sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
  inter AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
    FROM tok x JOIN tok y ON x.t = y.t AND x.doc_id < y.doc_id
    GROUP BY 1, 2
  )
  SELECT i.a, i.b,
         CAST(i.i AS BIGINT) AS inter_toks,
         CAST(sa.n + sb.n - i.i AS BIGINT) AS union_toks,
         CAST((1000000 * i.i) // (sa.n + sb.n - i.i) AS BIGINT) AS jac_x1m
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.a
  JOIN sz sb ON sb.doc_id = i.b
  WHERE 20 * i.i >= 19 * (sa.n + sb.n - i.i)
  ORDER BY 1, 2
"""


def q_set_similarity_stream(sf_dir: str) -> Dataset:
    """STREAMING-INGEST twin of set_similarity_pairs
    (stages/streaming.py::streaming_setsim_pairs): token rows
    accumulate on doc-hash shard actors as the corpus streams in;
    exact-recall pairing runs at flush because prefix membership
    depends on the FINAL global df order — the documented contrast
    with the LSH stream's online probe (probabilistic recall).
    Output identical to the batch operator ⇒ same SQL oracle."""
    from hexscape_ray.stages.streaming import streaming_setsim_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return streaming_setsim_pairs(ds).sort(["a", "b"])
