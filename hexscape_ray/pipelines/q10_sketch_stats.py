"""Graph / sketch / statistics queries — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q09_tpch_complete as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


def q_hex_bfs_distance(sf_dir: str) -> Dataset:
    """Hex-grid BFS geodesic distance (stages/graph.py::
    hex_bfs_distance): hop distance from the busiest hex to every
    occupied hex reachable through occupied cells — the graph is the
    IMPLICIT six-offset axial adjacency (reference k-ring semantics,
    R/patches.R neighbour join), so no edge table is built.  Seed =
    argmax n_docs, ties to min (r, q).  SQL oracle = recursive CTE
    over the same axial CTE chain with a 255-step cap (mirrored by the
    engine's max_steps assert)."""
    from hexscape_ray.stages.graph import hex_bfs_distance

    counts = q_hex_doc_counts(sf_dir).select_columns(["r", "q", "n_docs"])
    # per-hex tables are landscape-bounded → correct small collect
    pdf = counts.to_pandas()
    pdf = pdf.sort_values(["n_docs", "r", "q"], ascending=[False, True, True])
    seed = (int(pdf.iloc[0]["r"]), int(pdf.iloc[0]["q"]))
    return hex_bfs_distance(counts.select_columns(["r", "q"]), seed)


SQL_HEX_BFS_DISTANCE = (
    _hex_cte("documents", "doc_id", "doc_id").replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    + """,
  wt AS (SELECT r, q, count(*) AS n FROM hexed GROUP BY 1, 2),
  cells AS (SELECT r, q FROM wt),
  seed AS (SELECT r, q FROM wt ORDER BY n DESC, r, q LIMIT 1),
  reach(rr, rq, d) AS (
    SELECT r, q, 0 FROM seed
    UNION
    SELECT c.r, c.q, reach.d + 1
    FROM reach JOIN cells c ON
         (c.r = reach.rr     AND c.q = reach.rq + 1)
      OR (c.r = reach.rr     AND c.q = reach.rq - 1)
      OR (c.r = reach.rr + 1 AND c.q = reach.rq)
      OR (c.r = reach.rr - 1 AND c.q = reach.rq)
      OR (c.r = reach.rr + 1 AND c.q = reach.rq - 1)
      OR (c.r = reach.rr - 1 AND c.q = reach.rq + 1)
    WHERE reach.d < 255)
  SELECT rr AS r, rq AS q, CAST(min(d) AS BIGINT) AS dist
  FROM reach GROUP BY 1, 2 ORDER BY r, q
"""
)


def q_distinct_users_hll(sf_dir: str) -> Dataset:
    """Per-event-type approximate COUNT(DISTINCT user) via
    HyperLogLog (stages/sketch.py::hll_distinct) — the second
    mergeable-sketch family next to KMV: the shuffle carries ≤256
    (key, bucket, rho) register rows per block, merged with plain MAX.
    ORACLE-CHECKED bit-exactly: splitmix64 is SQL-replayable, the
    register set is integer-exact, the harmonic denominator rides as
    the exact integer A = Σ 2^(57-ρ) split into 32-bit limbs, and the
    float estimate (incl. the linear-counting branch) mirrors the SQL
    parse tree term-for-term."""
    from hexscape_ray.stages.sketch import hll_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ds, "event_type", "user_id").rename_columns(
        {"__k": "event_type"}
    )


SQL_DISTINCT_USERS_HLL = f"""
  WITH __kmv_in AS (
    SELECT DISTINCT event_type AS __k, CAST(user_id AS HUGEINT) AS x
    FROM events
  ), hashed AS ({_splitmix64_sql("x")}),
  rb AS (
    SELECT __k,
           CAST(h // 72057594037927936 AS BIGINT) AS bucket,
           CAST(h % 72057594037927936 AS BIGINT) AS w
    FROM hashed
  ),
  regs AS (
    SELECT __k, bucket,
           max(CASE WHEN w = 0 THEN 57
                    ELSE 57 - length(format('{{:b}}', w)) END) AS rho
    FROM rb GROUP BY 1, 2
  ),
  agg AS (
    SELECT __k,
           CAST(count(*) AS BIGINT) AS n_present,
           CAST(256 - count(*) AS BIGINT) AS zero_regs,
           CAST(256 - count(*) AS HUGEINT)
             * CAST(144115188075855872 AS HUGEINT)
             + sum(CAST(CAST(1 AS BIGINT) << (57 - rho) AS HUGEINT)) AS a
    FROM regs GROUP BY 1
  ),
  est AS (
    SELECT *,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 144115188075855872.0
             / CAST(a AS DOUBLE) AS raw
    FROM agg
  )
  SELECT __k AS event_type, n_present, zero_regs,
         CAST(a // 4294967296 AS BIGINT) AS a_hi,
         CAST(a % 4294967296 AS BIGINT) AS a_lo,
         CAST(floor((CASE WHEN raw <= 640.0 AND zero_regs > 0
                          THEN 256.0 * ln(256.0 / CAST(zero_regs AS DOUBLE))
                          ELSE raw END) * 1000000.0 + 0.5) AS BIGINT)
           AS est_micro
  FROM est ORDER BY event_type
"""


def _hilbert_xy2d8(ux: np.ndarray, uy: np.ndarray) -> np.ndarray:
    """Hilbert curve d-index on the 256×256 grid — the standard xy→d
    rotation walk (public domain, e.g. Wikipedia "Hilbert curve"),
    vectorised over 8 unrolled levels; every op is exact int64."""
    x = ux.astype(np.int64).copy()
    y = uy.astype(np.int64).copy()
    d = np.zeros(x.shape[0], dtype=np.int64)
    s = 128
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        m = ry == 0
        flip = m & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(m, y_f, x), np.where(m, x_f, y)
        s >>= 1
    return d


def q_hilbert_layout(sf_dir: str) -> Dataset:
    """Hilbert-curve layout keys — the locality-optimal sibling of
    q_zorder_layout: unlike Morton, consecutive Hilbert indices are
    ALWAYS grid-adjacent, so range-partitioning by h gives strictly
    better bounding-box pruning (no Z-jump seams) for the same 1024
    shards.  Same census shape; the 8-level rotation walk is mirrored
    in SQL as an unrolled CTE chain of exact BIGINT &, <<, xor ops
    (the pagerank unrolled-iteration precedent)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "doc_id")
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        ux = np.floor(x / 100000.0 * 256.0).astype(np.int64)
        uy = np.floor(y / 100000.0 * 256.0).astype(np.int64)
        return pa.table(
            {"h": pa.array(_hilbert_xy2d8(ux, uy)), "n_chars": batch["n_chars"]}
        )

    census = two_phase_sum(
        ds.map_batches(enc, batch_format="pyarrow"),
        ["h"],
        ["n_chars"],
        count_as="n_docs",
    )

    def shard(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "shard": pa.array(h >> 6),
                "h": batch["h"],
                "len_sum": batch["n_chars"],
                "n_docs": batch["n_docs"],
            }
        )

    return census.map_batches(shard, batch_format="pyarrow").sort("h")


def _hilbert_sql_chain() -> str:
    """The 8 unrolled Hilbert levels as a CTE chain (generated, like
    hex_rasterize's SQL, so the constants cannot drift from the numpy
    kernel)."""
    sql, prev = "", "qz"
    for i, s in enumerate((128, 64, 32, 16, 8, 4, 2, 1)):
        cur = f"hl{i}"
        sql += f""",
  {cur} AS (
    SELECT n_chars,
      d + {s * s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                        (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d,
      CASE WHEN (y & {s}) = 0
           THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END)
           ELSE x END AS x,
      CASE WHEN (y & {s}) = 0
           THEN (CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END)
           ELSE y END AS y
    FROM {prev})"""
        prev = cur
    return sql


SQL_HILBERT_LAYOUT = (
    f"WITH pts AS (SELECT doc_id, n_chars, {_GEO_SQL.format(key='doc_id')} FROM documents),\n"
    + """
  qz AS (
    SELECT n_chars, CAST(0 AS BIGINT) AS d,
           CAST(floor(x / 100000.0 * 256.0) AS BIGINT) AS x,
           CAST(floor(y / 100000.0 * 256.0) AS BIGINT) AS y
    FROM pts)"""
    + _hilbert_sql_chain()
    + """
  SELECT CAST(d // 64 AS BIGINT) AS shard, d AS h,
         CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
  FROM hl7 GROUP BY d ORDER BY h
"""
)


def q_peak_concurrency(sf_dir: str) -> Dataset:
    """Sweep-line peak concurrency: the maximum number of user
    sessions (30-min-gap windows, the events_sessions definition)
    open at the same instant, plus the first instant it is reached.
    Scale shape: sessionisation is the coarse-bucket numpy pass; each
    session emits two endpoint deltas (+1 at start, −1 at end+1 — the
    inclusive-end convention); deltas reduce per-instant through
    two_phase_sum, the running count is ONE distributed prefix sum
    (stages/agg.py::global_cumsum — its first interval-sweep
    consumer), and peak/argmin reduce as self-combining partials.
    Everything is exact int64."""
    from hexscape_ray.stages.agg import global_cumsum, two_phase_agg

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
                "__b": pa.array((uid % 64).astype(np.int64)),
            }
        )

    def sess_intervals(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        t = g["us"].to_numpy()
        o = np.lexsort((t, u))
        u, t = u[o], t[o]
        new_user = np.empty(u.size, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(t.size, dtype=np.int64)
        gap[0] = np.int64(1) << 62
        gap[1:] = t[1:] - t[:-1]
        new_s = new_user | (gap > 1_800_000_000)
        starts = np.flatnonzero(new_s)
        ends = np.concatenate([starts[1:], [t.size]])
        return pd.DataFrame({"s_us": t[starts], "e_us": t[ends - 1]})

    sess = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sess_intervals)
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch["s_us"].to_numpy(zero_copy_only=False)
        e = batch["e_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, e + 1])),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(s.shape[0], dtype=np.int64),
                            -np.ones(e.shape[0], dtype=np.int64),
                        ]
                    )
                ),
                "one": pa.array(np.zeros(2 * s.shape[0], dtype=np.int64)),
            }
        )

    pts = sess.map_batches(endpoints, batch_format="pyarrow").materialize()
    n_sessions = pts.count() // 2
    deltas = two_phase_sum(
        pts.select_columns(["t", "delta"]), ["t"], ["delta"], count_as=None
    ).materialize()
    hi = int(
        two_phase_agg(deltas, [], {"t": "max"}).take_all()[0]["t"]
    ) + 2
    conc = global_cumsum(
        deltas, "t", "delta", out_col="conc", order_hi=hi
    ).materialize()
    peak = int(two_phase_agg(conc, [], {"conc": "max"}).take_all()[0]["conc"])
    at_peak = conc.map_batches(
        lambda b: b.filter(
            pa.array(b["conc"].to_numpy(zero_copy_only=False) == peak)
        ).select(["t"]),
        batch_format="pyarrow",
    )
    first_t = int(two_phase_agg(at_peak, [], {"t": "min"}).take_all()[0]["t"])
    return ray.data.from_arrow(
        pa.table(
            {
                "peak": pa.array([peak], pa.int64()),
                "first_t_us": pa.array([first_t], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
            }
        )
    )


SQL_PEAK_CONCURRENCY = """
  WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
  d AS (
    SELECT user_id, us,
      CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
           THEN 1 ELSE 0 END AS new_s
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
  ),
  s AS (
    SELECT user_id, us,
      SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS session_id
    FROM d
  ),
  sess AS (
    SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
    FROM s GROUP BY 1, 2
  ),
  pts AS (
    SELECT s_us AS t, 1 AS delta FROM sess
    UNION ALL
    SELECT e_us + 1, -1 FROM sess
  ),
  ag AS (SELECT t, CAST(sum(delta) AS BIGINT) AS delta FROM pts GROUP BY t),
  c AS (
    SELECT t, sum(delta) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
    FROM ag
  ),
  p AS (SELECT CAST(max(conc) AS BIGINT) AS peak FROM c)
  SELECT p.peak,
         (SELECT CAST(min(t) AS BIGINT) FROM c WHERE conc = p.peak)
           AS first_t_us,
         (SELECT count(*) FROM sess) AS n_sessions
  FROM p
"""


_CMS_D = 4
_CMS_W = 1024
_CMS_SEEDS = (
    0xA5A5A5A5DEADBEEF,
    0x0123456789ABCDEF,
    0x5DEECE66D1CE4E5B,
    0x9E3779B97F4A7C15,
)


def q_cms_user_counts(sf_dir: str) -> Dataset:
    """Count-Min sketch (Cormode–Muthukrishnan 2005) — the third
    mergeable-sketch family (KMV, HLL, CMS): per-user event-count
    estimates from a 4×1024 integer counter matrix, checked against
    the exact counts (``overcount = est − exact ≥ 0`` is the CMS
    guarantee).  Scale shape: each event expands to 4 (row, col)
    cells map-side; the sketch reduces via two_phase_sum to ≤4096
    exact int64 counters — the shuffle moves counters, never events;
    the probe set (user_id < 16) reads the collected sketch as a
    bounded broadcast.  Hash family = splitmix64(x ⊕ seed_j), the
    SQL-replayable chain."""
    from hexscape_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id"])
    seeds = np.array(_CMS_SEEDS, dtype=np.uint64)

    def cells(batch: pa.Table) -> pa.Table:
        u = (
            batch["user_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        js, cols = [], []
        for j in range(_CMS_D):
            h = splitmix64(u ^ seeds[j])
            js.append(np.full(u.shape[0], j, dtype=np.int64))
            cols.append((h % np.uint64(_CMS_W)).astype(np.int64))
        return pa.table(
            {"j": pa.array(np.concatenate(js)), "col": pa.array(np.concatenate(cols))}
        )

    cms = two_phase_sum(
        ds.map_batches(cells, batch_format="pyarrow"), ["j", "col"], [], count_as="c"
    )
    # the sketch is 4×1024 counters by construction — a correct small collect
    arr = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for r in cms.take_all():
        arr[int(r["j"]), int(r["col"])] = int(r["c"])
    arr_ref = ray.put(arr)

    exact = two_phase_sum(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "user_id": b.filter(
                        pc.less(b["user_id"], 16)
                    )["user_id"]
                }
            ),
            batch_format="pyarrow",
        ),
        ["user_id"],
        [],
        count_as="exact",
    )

    def estimate(batch: pa.Table) -> pa.Table:
        a = ray.get(arr_ref)
        u = (
            batch["user_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        est = np.full(u.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(_CMS_D):
            h = splitmix64(u ^ seeds[j])
            est = np.minimum(est, a[j, (h % np.uint64(_CMS_W)).astype(np.int64)])
        ex = batch["exact"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "est": pa.array(est),
                "exact": batch["exact"],
                "overcount": pa.array(est - ex),
            }
        )

    return exact.map_batches(estimate, batch_format="pyarrow").sort("user_id")


def _cms_sql() -> str:
    chains, unions, probes = [], [], []
    for j, seed in enumerate(_CMS_SEEDS):
        x = (
            f"CAST(xor(CAST(user_id AS UBIGINT), CAST({seed} AS UBIGINT))"
            " AS HUGEINT)"
        )
        chains.append(f"x{j} AS ({_splitmix64_sql(x, carry='user_id', src='ev')})")
        unions.append(
            f"SELECT {j} AS j, CAST(h % {_CMS_W} AS BIGINT) AS col, "
            f"count(*) AS c FROM x{j} GROUP BY 2"
        )
        probes.append(
            f"SELECT user_id, {j} AS j, CAST(h % {_CMS_W} AS BIGINT) AS col "
            f"FROM x{j} WHERE user_id < 16"
        )
    chain_sql = ",\n  ".join(chains)
    return f"""
  WITH ev AS (SELECT user_id FROM events),
  {chain_sql},
  cms AS ({" UNION ALL ".join(unions)}),
  probe AS ({" UNION ALL ".join(probes)}),
  est AS (
    SELECT p.user_id, CAST(min(cms.c) AS BIGINT) AS est
    FROM probe p JOIN cms ON cms.j = p.j AND cms.col = p.col
    GROUP BY 1
  ),
  exact AS (
    SELECT user_id, count(*) AS exact
    FROM events WHERE user_id < 16 GROUP BY 1
  )
  SELECT e.user_id, est, exact, est - exact AS overcount
  FROM est e JOIN exact x ON x.user_id = e.user_id
  ORDER BY e.user_id
"""


SQL_CMS_USER_COUNTS = _cms_sql()


def q_ols_price_quantity(sf_dir: str) -> Dataset:
    """Distributed ordinary least squares (price-on-quantity per
    returnflag) via the normal equations: the five moments (n, Σx,
    Σy, Σx², Σxy) are exact int64 partials through one two_phase_sum —
    the regression itself never shuffles; the closed-form solve is a
    final map whose float expression mirrors the SQL parse tree
    term-for-term (big-product cancellation is deterministic when both
    engines run the identical double ops).  The PCA/covariance
    moment-partial pattern completing the stats family with a fitted
    model."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(batch: pa.Table) -> pa.Table:
        qx = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        cy = _cents(batch["l_extendedprice"])
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "sx": pa.array(qx),
                "sy": pa.array(cy),
                "sxx": pa.array(qx * qx),
                "sxy": pa.array(qx * cy),
            }
        )

    m = two_phase_sum(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["l_returnflag"],
        ["sx", "sy", "sxx", "sxy"],
        count_as="n",
    )

    def solve(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = batch["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = batch["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = batch["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": batch["n"],
                "sx": batch["sx"],
                "sy": batch["sy"],
                "sxx": batch["sxx"],
                "sxy": batch["sxy"],
                "slope_micro": pa.array(
                    np.floor(slope * 1000000.0 + 0.5).astype(np.int64)
                ),
                "intercept_micro": pa.array(
                    np.floor(intercept * 1000000.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return m.map_batches(solve, batch_format="pyarrow").sort("l_returnflag")


SQL_OLS_PRICE_QUANTITY = """
  WITH b AS (
    SELECT l_returnflag,
           CAST(floor(l_quantity + 0.5) AS BIGINT) AS qx,
           CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cy
    FROM lineitem),
  m AS (
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(qx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy,
           CAST(sum(qx * qx) AS BIGINT) AS sxx,
           CAST(sum(qx * cy) AS BIGINT) AS sxy
    FROM b GROUP BY 1),
  s AS (
    SELECT *,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
    FROM m)
  SELECT l_returnflag, n, sx, sy, sxx, sxy,
         CAST(floor(slope * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
         CAST(floor(((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
           AS intercept_micro
  FROM s ORDER BY l_returnflag
"""


def q_top1pct_revenue_share(sf_dir: str) -> Dataset:
    """Revenue-concentration probe: the exact 99th-percentile order
    value (radix select — constant-size exchange, no sort, no value-
    cardinality assumption) broadcast as one scalar cut, then a single
    conditional two-phase census splits total revenue into the
    at-or-above-p99 tail vs the rest; share_pml is the one final float
    division.  Composition pattern: SELECT-then-AGGREGATE with the
    selected rank as the broadcast threshold."""
    from hexscape_ray.stages.agg import radix_select

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"cents": pa.array(_cents(batch["o_totalprice"]))})

    pv = ds.map_batches(prep, batch_format="pyarrow").materialize()
    n = pv.count()
    thr = int(radix_select(pv, "cents", q=0.99, n_rows=n)[0])

    def split(batch: pa.Table) -> pa.Table:
        c = batch["cents"].to_numpy(zero_copy_only=False)
        top = (c >= thr).astype(np.int64)
        return pa.table(
            {
                "one": pa.array(np.zeros(c.shape[0], dtype=np.int64)),
                "top_c100": pa.array(c * top),
                "total_c100": pa.array(c),
                "n_top": pa.array(top),
            }
        )

    agg = two_phase_sum(
        pv.map_batches(split, batch_format="pyarrow"),
        ["one"],
        ["top_c100", "total_c100", "n_top"],
        count_as="n_orders",
    ).drop_columns(["one"])

    def share(batch: pa.Table) -> pa.Table:
        t = batch["top_c100"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = batch["total_c100"].to_numpy(zero_copy_only=False).astype(np.float64)
        pml = np.floor(1e6 * (t / a) + 0.5).astype(np.int64)
        return (
            batch.append_column("p99_c", pa.array(np.full(len(batch), thr, dtype=np.int64)))
            .append_column("share_pml", pa.array(pml))
        )

    return agg.map_batches(share, batch_format="pyarrow")


SQL_TOP1PCT_REVENUE_SHARE = """
  WITH v AS (
    SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders),
  t AS (SELECT quantile_disc(cents, 0.99) AS p99 FROM v)
  SELECT CAST(sum(CASE WHEN cents >= p99 THEN cents ELSE 0 END) AS BIGINT)
           AS top_c100,
         CAST(sum(cents) AS BIGINT) AS total_c100,
         CAST(sum(CASE WHEN cents >= p99 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_top,
         count(*) AS n_orders,
         CAST(max(p99) AS BIGINT) AS p99_c,
         CAST(floor(1e6 * (CAST(sum(CASE WHEN cents >= p99 THEN cents ELSE 0 END) AS DOUBLE)
                           / CAST(sum(cents) AS DOUBLE)) + 0.5) AS BIGINT)
           AS share_pml
  FROM v, t
"""


def q_mad_order_value(sf_dir: str) -> Dataset:
    """Median absolute deviation of order value — the robust-stats
    completion: TWO chained radix selects (16-bit shared-pass
    radix_select_multi — 8 total passes, not 16 byte-wise),
    the first yielding the exact median as a broadcast scalar, the
    second running over the derived |x − m| column; neither pass sorts
    or assumes value cardinality, and each ships only 256 counters per
    block.  Everything int64; the MAD/median ratio (a scale-free
    dispersion signal) is the one micro-rounded float."""
    from hexscape_ray.stages.agg import radix_select_multi

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    pv = ds.map_batches(
        lambda b: pa.table({"cents": pa.array(_cents(b["o_totalprice"]))}),
        batch_format="pyarrow",
    ).materialize()
    n = pv.count()
    med = int(radix_select_multi(pv, "cents", {"p50": 0.5}, n_rows=n)["p50"])
    dev = pv.map_batches(
        lambda b: pa.table(
            {
                "cents": pa.array(
                    np.abs(b["cents"].to_numpy(zero_copy_only=False) - med)
                )
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    mad = int(radix_select_multi(dev, "cents", {"p50": 0.5}, n_rows=n)["p50"])
    ratio_pml = int(np.floor(1e6 * (float(mad) / float(med)) + 0.5))
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "median_c": pa.array([med], pa.int64()),
                "mad_c": pa.array([mad], pa.int64()),
                "ratio_pml": pa.array([ratio_pml], pa.int64()),
            }
        )
    )


SQL_MAD_ORDER_VALUE = """
  WITH v AS (
    SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders),
  m AS (SELECT quantile_disc(cents, 0.5) AS med FROM v),
  d AS (SELECT abs(cents - med) AS dev FROM v, m)
  SELECT (SELECT count(*) FROM v) AS n,
         (SELECT CAST(med AS BIGINT) FROM m) AS median_c,
         CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad_c,
         CAST(floor(1e6 * (CAST(quantile_disc(dev, 0.5) AS DOUBLE)
                           / CAST((SELECT med FROM m) AS DOUBLE)) + 0.5)
              AS BIGINT) AS ratio_pml
  FROM d
"""


def q_nation_value_gini(sf_dir: str) -> Dataset:
    """Per-nation Gini coefficient of order value — inequality over a
    VALUE-COMPRESSED census, never a global sort: the (nation, cents)
    distinct-value counts reduce through two_phase_sum, each nation's
    ordered scan runs once over its own census rows (map_groups —
    dimension-bounded groups), and the rank sum uses the TIE-INVARIANT
    closed form Σ v·c·(2L + c − n) (L = count of strictly smaller
    values), so no row_number() tie-order leaks into the result.
    All int64 (bound: n²·max_cents per nation < 2^63, satisfied
    through sf1); gini_pml = T/(n·S) micro-rounded."""
    from hexscape_ray.stages.joins import adaptive_join

    keys, names = _nation_name_map(sf_dir)

    def cust_prep(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_custkey": batch["c_custkey"],
                "n_name": pa.array(
                    names[np.searchsorted(keys, nk)], type=pa.string()
                ),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pa.table(
            {"o_custkey": b["o_custkey"], "v": pa.array(_cents(b["o_totalprice"]))}
        ),
        batch_format="pyarrow",
    )
    joined = adaptive_join(
        orders,
        cust,
        on="o_custkey",
        big_schema=pa.schema([("o_custkey", pa.int64()), ("v", pa.int64())]),
        side_schema=pa.schema([("o_custkey", pa.int64()), ("n_name", pa.string())]),
    )
    census = two_phase_sum(
        joined.select_columns(["n_name", "v"]), ["n_name", "v"], [], count_as="c"
    )

    def gini(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy()
        c = g["c"].to_numpy()
        o = np.argsort(v, kind="stable")
        v, c = v[o], c[o]
        n = int(c.sum())
        ell = np.concatenate([[0], np.cumsum(c)[:-1]])
        tnum = int(np.sum(v * c * (2 * ell + c - n)))
        s = int(np.sum(v * c))
        pml = int(np.floor(1e6 * (float(tnum) / (float(n) * float(s))) + 0.5))
        return pd.DataFrame(
            {
                "n_name": [g["n_name"].iloc[0]],
                "n": [n],
                "s": [s],
                "tnum": [tnum],
                "gini_pml": [pml],
            }
        )

    return census.groupby("n_name").map_groups(gini).sort("n_name")


SQL_NATION_VALUE_GINI = """
  WITH j AS (
    SELECT n_name, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey),
  cen AS (SELECT n_name, v, count(*) AS c FROM j GROUP BY 1, 2),
  cum AS (
    SELECT n_name, v, c,
           sum(c) OVER (PARTITION BY n_name ORDER BY v) - c AS l,
           sum(c) OVER (PARTITION BY n_name) AS n
    FROM cen),
  t AS (
    SELECT n_name,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(v * c) AS BIGINT) AS s,
           CAST(sum(v * c * (2 * l + c - n)) AS BIGINT) AS tnum
    FROM cum GROUP BY 1)
  SELECT n_name, n, s, tnum,
         CAST(floor(1e6 * (CAST(tnum AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))) + 0.5)
              AS BIGINT) AS gini_pml
  FROM t ORDER BY n_name
"""


def q_lang_source_chi2(sf_dir: str) -> Dataset:
    """Chi-square test of independence between document language and
    source — the statistical-test primitive over a contingency census:
    observed counts reduce through one two_phase_sum (the census is
    bounded by the category product, not the corpus), margins and the
    statistic compute in ONE remote task.  Float discipline: each
    cell's (O−E)²/E micro-rounds to int64 FIRST, then integer-sums —
    order-invariant, so the result is partition-independent and
    bit-exact against SQL."""
    census = two_phase_sum(
        _read(sf_dir, "documents", ["lang", "source"]),
        ["lang", "source"],
        [],
        count_as="o",
    )

    def chi2(batch: pa.Table):
        pdf = batch.to_pandas()
        t = int(pdf["o"].sum())
        rm = pdf.groupby("lang")["o"].sum()
        cm = pdf.groupby("source")["o"].sum()
        cells = 0
        for _, row in pdf.iterrows():
            e = (float(int(rm[row["lang"]])) * float(int(cm[row["source"]]))) / float(t)
            d = float(int(row["o"])) - e
            cells += int(np.floor((d * d / e) * 1000000.0 + 0.5))
        n_langs, n_sources = len(rm), len(cm)
        yield pa.table(
            {
                "n_docs": pa.array([t], pa.int64()),
                "n_langs": pa.array([n_langs], pa.int64()),
                "n_sources": pa.array([n_sources], pa.int64()),
                "dof": pa.array([(n_langs - 1) * (n_sources - 1)], pa.int64()),
                "chi2_micro": pa.array([cells], pa.int64()),
            }
        )

    return census.repartition(1).map_batches(
        chi2, batch_format="pyarrow", batch_size=None
    )


SQL_LANG_SOURCE_CHI2 = """
  WITH cen AS (
    SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
  rm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rn FROM cen GROUP BY 1),
  cm AS (SELECT source, CAST(sum(o) AS BIGINT) AS cn FROM cen GROUP BY 1),
  tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cen),
  cells AS (
    SELECT CAST(floor((
             (CAST(o AS DOUBLE)
                - (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(t AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(t AS DOUBLE))
             / ((CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(t AS DOUBLE))
           ) * 1000000.0 + 0.5) AS BIGINT) AS cell_micro
    FROM cen JOIN rm USING (lang) JOIN cm USING (source), tot)
  SELECT (SELECT t FROM tot) AS n_docs,
         (SELECT count(*) FROM rm) AS n_langs,
         (SELECT count(*) FROM cm) AS n_sources,
         ((SELECT count(*) FROM rm) - 1) * ((SELECT count(*) FROM cm) - 1) AS dof,
         CAST(sum(cell_micro) AS BIGINT) AS chi2_micro
  FROM cells
"""


_POI_KEYS = np.array([7777 + 101 * i for i in range(16)], dtype=np.int64)


def q_nearest_poi(sf_dir: str) -> Dataset:
    """Nearest-site point assignment (the voronoi J6 shape, upgraded
    to a HASH-EXACT oracle): each document's geocoded point assigns to
    the closest of 16 deterministic POI sites (same knuth-hash geocode,
    keys 7777+101·i), tie-broken by site id; output is the per-site
    census.  Scale shape: the 16 sites broadcast as two float vectors;
    distance² is one vectorised (n×16) broadcast in the fast
    big[:,None]−small[None,:] direction and never shuffles — only the
    16-row census partials do.  Float discipline: d² is the identical
    IEEE expression on both engines, and the (d², poi_id) lexicographic
    argmin makes ties deterministic."""
    from hexscape_ray.functions.geocode import geocode_ids

    px, py = geocode_ids(_POI_KEYS)

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def assign(batch: pa.Table) -> pa.Table:
        b = geocode_ids_batch(batch, "doc_id")
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        dx = x[:, None] - px[None, :]
        dy = y[:, None] - py[None, :]
        d2 = dx * dx + dy * dy
        poi = np.argmin(d2, axis=1).astype(np.int64)  # first min = min poi_id
        return pa.table({"poi_id": pa.array(poi), "n_chars": batch["n_chars"]})

    census = two_phase_sum(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["poi_id"],
        ["n_chars"],
        count_as="n_docs",
    )
    return census.rename_columns({"n_chars": "len_sum"}).sort("poi_id")


_POI_VALUES_SQL = ", ".join(f"({i})" for i in range(16))
SQL_NEAREST_POI = f"""
  WITH pts AS (SELECT doc_id, n_chars, {_GEO_SQL.format(key='doc_id')} FROM documents),
  poi AS (
    SELECT i AS poi_id, x AS px, y AS py FROM (
      SELECT i, {_GEO_SQL.format(key='(7777 + 101 * i)')}
      FROM (VALUES {_POI_VALUES_SQL}) t(i))),
  d AS (
    SELECT doc_id, n_chars, poi_id,
           (x - px) * (x - px) + (y - py) * (y - py) AS d2
    FROM pts, poi),
  pick AS (
    SELECT doc_id, n_chars, poi_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY d2, poi_id) AS rn
    FROM d)
  SELECT CAST(poi_id AS BIGINT) AS poi_id,
         CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
  FROM pick WHERE rn = 1 GROUP BY 1 ORDER BY poi_id
"""


def q_near_dup_canonical(sf_dir: str) -> Dataset:
    """Canonical-record selection — the LAST step of the dedup story
    (pairs → clusters → survivor): per near-dup cluster, keep the
    longest document (ties → smallest doc_id).  Scale shape: cluster
    labels ride one adaptive join against the corpus (label payload
    only); the per-cluster argmax is a SELF-COMBINING composite-score
    max (score = n_chars·2^32 + (2^32−1−doc_id), asserts doc_id and
    n_chars < 2^31) through two_phase_agg — no per-group Python, no
    sort.  SQL oracle = the recursive closure + a window argmax."""
    from hexscape_ray.stages.agg import two_phase_agg
    from hexscape_ray.stages.joins import adaptive_join

    clusters = q_near_dup_clusters(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    j = adaptive_join(
        docs,
        clusters,
        on="doc_id",
        big_schema=pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())]),
        side_schema=pa.schema([("doc_id", pa.int64()), ("root", pa.int64())]),
    )

    def encode(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        assert (did < (1 << 31)).all() and (nc < (1 << 31)).all()
        score = nc * (np.int64(1) << 32) + ((np.int64(1) << 32) - 1 - did)
        return pa.table(
            {
                "root": batch["root"],
                "score": pa.array(score),
                "one": pa.array(np.ones(did.shape[0], dtype=np.int64)),
            }
        )

    agg = two_phase_agg(
        j.map_batches(encode, batch_format="pyarrow"),
        ["root"],
        {"score": "max", "one": "sum"},
    )

    def decode(batch: pa.Table) -> pa.Table:
        sc = batch["score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "root": batch["root"],
                "keep_doc": pa.array(((np.int64(1) << 32) - 1) - (sc % (np.int64(1) << 32))),
                "n_members": batch["one"],
                "max_chars": pa.array(sc >> np.int64(32)),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow").sort("root")


SQL_NEAR_DUP_CANONICAL = _ndx_sql(
    """,
edges AS (SELECT a, b FROM verified WHERE 2 * inter_grams >= union_grams),
nodes AS (SELECT a AS id FROM edges UNION SELECT b FROM edges),
sym AS (SELECT a AS src, b AS dst FROM edges UNION SELECT b, a FROM edges),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
clus AS (SELECT a AS doc_id, min(b) AS root FROM reach GROUP BY a),
jj AS (
  SELECT c.root, c.doc_id, d.n_chars
  FROM clus c JOIN documents d USING (doc_id)),
rr AS (
  SELECT root, doc_id, n_chars,
         row_number() OVER (PARTITION BY root
                            ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY root) AS n_members
  FROM jj)
SELECT CAST(root AS BIGINT) AS root, CAST(doc_id AS BIGINT) AS keep_doc,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_chars AS BIGINT) AS max_chars
FROM rr WHERE rn = 1 ORDER BY root"""
)


def q_rfm_segments(sf_dir: str) -> Dataset:
    """RFM segmentation — the classic customer-curation op as pure
    composition: per-customer recency/frequency/monetary reduce in ONE
    two_phase_agg pass (max day, count, sum cents); the nine quartile
    fences come from three 16-bit radix selects over the per-customer
    census (map-only passes, no sort); scoring + the 64-cell segment
    census is one more map + two_phase_sum.  Everything int64; fences
    follow the quantile_disc rank rule so the SQL oracle is exact."""
    from hexscape_ray.stages.agg import radix_select_multi, two_phase_agg

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "day": pa.array(us // 86400000000),
                "m": pa.array(_cents(batch["o_totalprice"])),
                "f": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    cen = two_phase_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        {"day": "max", "m": "sum", "f": "sum"},
    ).materialize()
    n = cen.count()
    fences = {}
    for col in ("day", "f", "m"):
        fences[col] = radix_select_multi(
            cen, col, {"q1": 0.25, "q2": 0.50, "q3": 0.75}, n_rows=n
        )

    def score(batch: pa.Table) -> pa.Table:
        seg = np.zeros(len(batch), dtype=np.int64)
        for col, mult in (("day", 100), ("f", 10), ("m", 1)):
            v = batch[col].to_numpy(zero_copy_only=False)
            s = (
                1
                + (v > fences[col]["q1"]).astype(np.int64)
                + (v > fences[col]["q2"]).astype(np.int64)
                + (v > fences[col]["q3"]).astype(np.int64)
            )
            seg += mult * s
        return pa.table({"segment": pa.array(seg), "m": batch["m"]})

    out = two_phase_sum(
        cen.map_batches(score, batch_format="pyarrow"),
        ["segment"],
        ["m"],
        count_as="n_customers",
    )
    return out.rename_columns({"m": "monetary_c100"}).sort("segment")


SQL_RFM_SEGMENTS = """
  WITH c AS (
    SELECT o_custkey,
           CAST(max(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS day,
           count(*) AS f,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS m
    FROM orders GROUP BY 1),
  q AS (
    SELECT quantile_disc(day, 0.25) AS d1, quantile_disc(day, 0.50) AS d2,
           quantile_disc(day, 0.75) AS d3,
           quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.50) AS f2,
           quantile_disc(f, 0.75) AS f3,
           quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.50) AS m2,
           quantile_disc(m, 0.75) AS m3
    FROM c),
  s AS (
    SELECT m,
           100 * (1 + CASE WHEN day > d1 THEN 1 ELSE 0 END
                    + CASE WHEN day > d2 THEN 1 ELSE 0 END
                    + CASE WHEN day > d3 THEN 1 ELSE 0 END)
           + 10 * (1 + CASE WHEN f > f1 THEN 1 ELSE 0 END
                     + CASE WHEN f > f2 THEN 1 ELSE 0 END
                     + CASE WHEN f > f3 THEN 1 ELSE 0 END)
           + (1 + CASE WHEN m > m1 THEN 1 ELSE 0 END
                + CASE WHEN m > m2 THEN 1 ELSE 0 END
                + CASE WHEN m > m3 THEN 1 ELSE 0 END) AS segment
    FROM c, q)
  SELECT CAST(segment AS BIGINT) AS segment,
         CAST(sum(m) AS BIGINT) AS monetary_c100,
         count(*) AS n_customers
  FROM s GROUP BY 1 ORDER BY 1
"""


_KCORE_K = 2
_KCORE_ROUNDS = 16


def q_trade_kcore(sf_dir: str) -> Dataset:
    """k-core decomposition by bounded-round peeling
    (stages/graph.py::k_peel) over the sparse customer↔supplier trade
    graph (distinct pairs over a sparsifying item filter — the
    copurchase_components graph family): every node labeled with the
    round it peels (degree < 2, isolated = degree 0), 0 = survives in
    the 2-core.  Measured peel depth is 3–7 rounds at the tested
    scales; the 16-round cap is asserted, which is what lets the SQL
    oracle mirror the loop as a GENERATED unrolled CTE chain (the
    pagerank/hilbert precedent) and grade an iterative deletion
    algorithm bit-exactly."""
    from hexscape_ray.stages.graph import k_peel
    from hexscape_ray.stages.joins import adaptive_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_quantity", "l_partkey"]
    )

    def sparsify(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array((q <= 5.0) & (p % 9 == 0)))
        return pa.table(
            {
                "o_orderkey": kept["l_orderkey"],
                "b": pc.add(kept["l_suppkey"], 1_000_000),
            }
        )

    pairs = adaptive_join(
        li.map_batches(sparsify, batch_format="pyarrow"),
        orders,
        on="o_orderkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("b", pa.int64())]),
        side_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    ).map_batches(
        lambda t: pa.table({"a": t["o_custkey"], "b": t["b"]}),
        batch_format="pyarrow",
    )
    edges = two_phase_sum(pairs, ["a", "b"], [], count_as="__n").select_columns(
        ["a", "b"]
    )
    return k_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _kcore_sql() -> str:
    """The peel loop as a generated unrolled CTE chain — constants
    derive from _KCORE_K/_KCORE_ROUNDS so SQL cannot drift from the
    engine."""
    parts = [
        """e0 AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_quantity <= 5 AND l_partkey % 9 = 0),
  n0 AS MATERIALIZED (SELECT a AS node FROM e0 UNION SELECT b FROM e0)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
    SELECT node, count(*) AS deg FROM (
      SELECT a AS node FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1})
    GROUP BY 1),
  rm{r} AS MATERIALIZED (
    SELECT n.node FROM n{r - 1} n LEFT JOIN d{r} d ON d.node = n.node
    WHERE COALESCE(d.deg, 0) < {_KCORE_K}),
  n{r} AS MATERIALIZED (SELECT node FROM n{r - 1}
           WHERE node NOT IN (SELECT node FROM rm{r})),
  e{r} AS MATERIALIZED (SELECT a, b FROM e{r - 1}
           WHERE a IN (SELECT node FROM n{r})
             AND b IN (SELECT node FROM n{r}))"""
        )
    unions = [
        f"SELECT node, {r} AS peel_round FROM rm{r}"
        for r in range(1, _KCORE_ROUNDS + 1)
    ]
    unions.append(f"SELECT node, 0 AS peel_round FROM n{_KCORE_ROUNDS}")
    body = ",\n  ".join(parts)
    lab = " UNION ALL ".join(unions)
    return (
        f"  WITH {body}\n"
        f"  SELECT CAST(node AS BIGINT) AS node,"
        f" CAST(peel_round AS BIGINT) AS peel_round\n"
        f"  FROM ({lab}) ORDER BY node\n"
    )


SQL_TRADE_KCORE = _kcore_sql()


_ACF_LAGS = (1, 7, 30)


def q_revenue_autocorr(sf_dir: str) -> Dataset:
    """Lag-k autocorrelation of daily revenue (k = 1, 7, 30) — the
    time-series diagnostic over the gap-filled dense day axis
    (missing days count as zero revenue, the gapfill convention).
    Scale shape: the per-day census reduces through one two_phase_sum
    and is CALENDAR-bounded, not corpus-bounded, so the lag products
    compute in ONE remote task with Python-int exact sums (Σxy at
    sf0.1 exceeds int64; the SQL mirror uses HUGEINT); Pearson r is
    the mirrored float tree over those exact integers — IEEE sqrt is
    correctly rounded on both engines."""
    import math

    census = two_phase_sum(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            lambda b: pa.table(
                {
                    "day_id": pa.array(
                        b["o_orderdate"].cast(pa.int64()).to_numpy(
                            zero_copy_only=False
                        )
                        // 86400000000
                    ),
                    "cents": pa.array(_cents(b["o_totalprice"])),
                }
            ),
            batch_format="pyarrow",
        ),
        ["day_id"],
        ["cents"],
        count_as=None,
    )

    def acf(batch: pa.Table):
        pdf = batch.to_pandas().sort_values("day_id")
        days = pdf["day_id"].to_numpy()
        lo, hi = int(days.min()), int(days.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[days - lo] = pdf["cents"].to_numpy()
        xs = [int(v) for v in dense]
        rows = []
        for k in _ACF_LAGS:
            a = xs[:-k]
            b = xs[k:]
            n = len(a)
            sx, sy = sum(a), sum(b)
            sxx = sum(v * v for v in a)
            syy = sum(v * v for v in b)
            sxy = sum(u * v for u, v in zip(a, b))
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
                float(n * syy - sy * sy)
            )
            rows.append(
                {
                    "lag": k,
                    "n_pairs": n,
                    "r_micro": int(math.floor((num / den) * 1000000.0 + 0.5)),
                }
            )
        yield pa.Table.from_pylist(rows)

    return census.repartition(1).map_batches(
        acf, batch_format="pyarrow", batch_size=None
    )


def _acf_sql() -> str:
    lag_rows = []
    for k in _ACF_LAGS:
        lag_rows.append(
            f"""
  s{k} AS (
    SELECT count(*) AS n,
           CAST(sum(a.cents) AS HUGEINT) AS sx,
           CAST(sum(b.cents) AS HUGEINT) AS sy,
           sum(CAST(a.cents AS HUGEINT) * CAST(a.cents AS HUGEINT)) AS sxx,
           sum(CAST(b.cents AS HUGEINT) * CAST(b.cents AS HUGEINT)) AS syy,
           sum(CAST(a.cents AS HUGEINT) * CAST(b.cents AS HUGEINT)) AS sxy
    FROM dense a JOIN dense b ON b.day_id = a.day_id + {k})"""
        )
    selects = [
        f"""SELECT {k} AS lag, n AS n_pairs,
        CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1000000.0 + 0.5)
          AS BIGINT) AS r_micro FROM s{k}"""
        for k in _ACF_LAGS
    ]
    lags_sql = ",".join(lag_rows)
    sel_sql = " UNION ALL ".join(selects)
    return f"""
  WITH c AS (
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_id,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY 1),
  axis AS (
    SELECT unnest(range((SELECT min(day_id) FROM c),
                        (SELECT max(day_id) FROM c) + 1)) AS day_id),
  dense AS (
    SELECT a.day_id, CAST(coalesce(c.cents, 0) AS BIGINT) AS cents
    FROM axis a LEFT JOIN c USING (day_id)),{lags_sql}
  SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
         r_micro
  FROM ({sel_sql}) ORDER BY lag
"""


SQL_REVENUE_AUTOCORR = _acf_sql()


def q_sliding_distinct_hll(sf_dir: str) -> Dataset:
    """Distinct users per 7-day sliding window — the PAYOFF of
    mergeable sketches: per-day HyperLogLog registers reduce once
    (two_phase_agg MAX over (day, bucket)), then every window is a
    register-table merge, so the corpus is scanned ONCE for all
    overlapping windows (exact distinct would rescan per window).
    The day×256 register table is calendar-bounded — the window merge
    runs in one remote task with the same exact-integer harmonic
    denominator and mirrored float estimate as distinct_users_hll."""
    import math

    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.stages.agg import two_phase_agg
    from hexscape_ray.stages.sketch import _HLL_M, _HLL_RHO_MAX, _HLL_WBITS

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86400000000
        )
        h = splitmix64(
            batch["user_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        bucket = (h >> np.uint64(_HLL_WBITS)).astype(np.int64)
        w = h & np.uint64((1 << _HLL_WBITS) - 1)
        bl = np.zeros(w.shape[0], dtype=np.int64)
        v = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= np.uint64(1 << s)
            bl[big] += s
            v[big] >>= np.uint64(s)
        bl += (v > 0).astype(np.int64)
        return pa.table(
            {
                "day_id": pa.array(day),
                "bucket": pa.array(bucket),
                "rho": pa.array(_HLL_RHO_MAX - bl),
            }
        )

    regs = two_phase_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day_id", "bucket"],
        {"rho": "max"},
    )

    def windows(batch: pa.Table):
        pdf = batch.to_pandas()
        days = sorted(pdf["day_id"].unique().tolist())
        by_day = {d: g for d, g in pdf.groupby("day_id")}
        rows = []
        for d in days:
            best: dict[int, int] = {}
            for dd in range(d - 6, d + 1):
                g = by_day.get(dd)
                if g is None:
                    continue
                for bkt, rho in zip(g["bucket"].tolist(), g["rho"].tolist()):
                    if rho > best.get(bkt, 0):
                        best[bkt] = rho
            n_present = len(best)
            zeros = _HLL_M - n_present
            a = zeros * (1 << _HLL_RHO_MAX) + sum(
                1 << (_HLL_RHO_MAX - r) for r in best.values()
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
                    "day_id": int(d),
                    "n_present": n_present,
                    "zero_regs": zeros,
                    "a_hi": a >> 32,
                    "a_lo": a & 0xFFFFFFFF,
                    "est_micro": int(math.floor(est * 1000000.0 + 0.5)),
                }
            )
        yield pa.Table.from_pylist(rows)

    return regs.repartition(1).map_batches(
        windows, batch_format="pyarrow", batch_size=None
    )


SQL_SLIDING_DISTINCT_HLL = f"""
  WITH __kmv_in AS (
    SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS __k,
           CAST(user_id AS HUGEINT) AS x
    FROM events
  ), hashed AS ({_splitmix64_sql("x")}),
  rb AS (
    SELECT __k AS day_id,
           CAST(h // 72057594037927936 AS BIGINT) AS bucket,
           CAST(h % 72057594037927936 AS BIGINT) AS w
    FROM hashed
  ),
  regs AS (
    SELECT day_id, bucket,
           max(CASE WHEN w = 0 THEN 57
                    ELSE 57 - length(format('{{:b}}', w)) END) AS rho
    FROM rb GROUP BY 1, 2
  ),
  days AS (SELECT DISTINCT day_id FROM regs),
  win AS (
    SELECT d.day_id, r.bucket, max(r.rho) AS rho
    FROM days d JOIN regs r ON r.day_id BETWEEN d.day_id - 6 AND d.day_id
    GROUP BY 1, 2
  ),
  agg AS (
    SELECT day_id,
           CAST(count(*) AS BIGINT) AS n_present,
           CAST(256 - count(*) AS BIGINT) AS zero_regs,
           CAST(256 - count(*) AS HUGEINT)
             * CAST(144115188075855872 AS HUGEINT)
             + sum(CAST(CAST(1 AS BIGINT) << (57 - rho) AS HUGEINT)) AS a
    FROM win GROUP BY 1
  ),
  est AS (
    SELECT *,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 144115188075855872.0
             / CAST(a AS DOUBLE) AS raw
    FROM agg
  )
  SELECT day_id, n_present, zero_regs,
         CAST(a // 4294967296 AS BIGINT) AS a_hi,
         CAST(a % 4294967296 AS BIGINT) AS a_lo,
         CAST(floor((CASE WHEN raw <= 640.0 AND zero_regs > 0
                          THEN 256.0 * ln(256.0 / CAST(zero_regs AS DOUBLE))
                          ELSE raw END) * 1000000.0 + 0.5) AS BIGINT)
           AS est_micro
  FROM est ORDER BY day_id
"""


def q_distinct_users_hll_stream(sf_dir: str) -> Dataset:
    """STREAMING twin of distinct_users_hll
    (stages/streaming.py::streaming_hll_distinct): incremental
    per-shard HLL register state fed by parallel router tasks,
    sharded by bucket so flushes are disjoint; register MAX commutes,
    so it shares SQL_DISTINCT_USERS_HLL bit-exactly and the shard
    snapshot/load recovery contract."""
    from hexscape_ray.stages.streaming import streaming_hll_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    t = streaming_hll_distinct(ev, "event_type", "user_id")
    return ray.data.from_arrow(t).rename_columns({"__k": "event_type"}).sort(
        "event_type"
    )


def q_embedding_dim_stats(sf_dir: str) -> Dataset:
    """Per-dimension statistics over the LIST<float> embedding column —
    the list-unnest operator graded exactly: each batch reshapes the
    Arrow list buffer to an (n, 64) matrix ZERO-COPY (fixed stride
    asserted), micro-rounds per element (order-invariant), and emits
    64 partial rows per block: the shuffle carries (dim, Σv, Σv²,
    min, max) partials, never the unnested rows (corpus×64 of them).
    SQL oracle = DuckDB's lockstep unnest + generate_subscripts."""
    from hexscape_ray.stages.agg import two_phase_agg

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(batch)
        assert flat.shape[0] == n * 64, "ragged embedding list"
        v = np.floor(flat * 1000000.0 + 0.5).astype(np.int64).reshape(n, 64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, 65, dtype=np.int64)),
                "s": pa.array(v.sum(axis=0)),
                "ss": pa.array((v * v).sum(axis=0)),
                "vmin": pa.array(v.min(axis=0)),
                "vmax": pa.array(v.max(axis=0)),
                "n": pa.array(np.full(64, n, dtype=np.int64)),
            }
        )

    agg = two_phase_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        {"s": "sum", "ss": "sum", "vmin": "min", "vmax": "max", "n": "sum"},
    )
    return agg.sort("dim")


SQL_EMBEDDING_DIM_STATS = """
  WITH u AS (
    SELECT generate_subscripts(embedding, 1) AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS v
    FROM embeddings)
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss,
         CAST(min(v) AS BIGINT) AS vmin,
         CAST(max(v) AS BIGINT) AS vmax,
         count(*) AS n
  FROM u GROUP BY 1 ORDER BY dim
"""


_FK_EDGES = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


