"""TPC-H completion (Q6/Q8/Q10/Q11/Q16/Q19/Q20 shapes) — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q08_neardup as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# TPC-H family completion (Q6/Q8/Q10/Q11/Q16/Q19/Q20 shapes, adapted to the
# reduced schema: no partsupp/shipmode/commitdate — see each docstring).
# All money flows as exact integer cents; floats only as final divisions.
# ---------------------------------------------------------------------------

_Y1996_US = int(np.datetime64("1996-01-01", "us").astype(np.int64))
_Y1997_US = int(np.datetime64("1997-01-01", "us").astype(np.int64))
_Y1998_US = int(np.datetime64("1998-01-01", "us").astype(np.int64))
_Q10_LO_US = int(np.datetime64("1996-07-01", "us").astype(np.int64))
_Q10_HI_US = int(np.datetime64("1996-10-01", "us").astype(np.int64))





def _nation_name_map(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted nationkeys, names aligned to them) — 25-row dimension."""
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in _tiny_rows(sf_dir, "nation")
    }
    keys = np.array(sorted(nat), dtype=np.int64)
    names = np.array([nat[int(k)] for k in keys], dtype=object)
    return keys, names


def q_forecast_revenue(sf_dir: str) -> Dataset:
    """TPC-H Q6-shaped forecast-revenue scalar: one filtered pass over
    lineitem, revenue = Σ extendedprice·discount over 1996 shipments
    with discount 2-4 % and quantity < 24.  Pure map-side filter +
    global two-phase sum — zero shuffle beyond one-row partials; the
    predicate prunes inside the batch kernel so only two int64 columns
    survive the scan."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        disc_pct = np.floor(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        keep = (
            (us >= _Y1996_US)
            & (us < _Y1997_US)
            & (disc_pct >= 2)
            & (disc_pct <= 4)
            & (qty < 24.0)
        )
        t = batch.filter(pa.array(keep))
        ext_c = _cents(t["l_extendedprice"])
        dp = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "one": pa.array(np.zeros(len(t), dtype=np.int64)),
                "revenue_c10000": pa.array(ext_c * dp),
            }
        )

    out = two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["one"],
        ["revenue_c10000"],
        count_as="n_items",
    )
    return out.drop_columns(["one"])


SQL_FORECAST_REVENUE = """
  SELECT CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
               * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_c10000,
         count(*) AS n_items
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
    AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) BETWEEN 2 AND 4
    AND l_quantity < 24
"""


def q_nation_market_share(sf_dir: str) -> Dataset:
    """TPC-H Q8-shaped market share: of all STANDARD-part revenue sold
    into region ASIA during 1996-1997 (by order date), the yearly share
    supplied by NATION_12.  Scale shape: three dimension hops (part
    type filter, supplier→nation flag, customer→region semi) broadcast
    at dimension size through adaptive joins; the one BIG⋈BIG exchange
    is lineitem⋈orders on orderkey; the census is (year × 2 ints) via
    partials-only two-phase sums; share_pml is the single final float
    division, micro-rounded half-up."""
    from hexscape_ray.stages.joins import adaptive_join

    keys, names = _nation_name_map(sf_dir)
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _tiny_rows(sf_dir, "region")
    }
    nat_region = {
        r["n_nationkey"]: region[r["n_regionkey"]]
        for r in _tiny_rows(sf_dir, "nation")
    }

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table(
            {"l_partkey": b.filter(pc.equal(b["p_type"], "STANDARD"))["p_partkey"]}
        ),
        batch_format="pyarrow",
    )

    def supp_prep(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, nk)
        is_target = (names[idx] == "NATION_12").astype(np.int64)
        return pa.table(
            {"l_suppkey": batch["s_suppkey"], "is_target": pa.array(is_target)}
        )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        supp_prep, batch_format="pyarrow"
    )

    def cust_prep(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.array([nat_region[int(k)] == "ASIA" for k in nk])
        return pa.table({"o_custkey": batch.filter(pa.array(keep))["c_custkey"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow"
    )

    def o_prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((us >= _Y1996_US) & (us < _Y1998_US)))
        us2 = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pa.array(_civil_year_from_us(us2)),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow")
    o_filt = adaptive_join(
        orders,
        cust,
        on="o_custkey",
        how="semi",
        big_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_year", pa.int64())]
        ),
        side_schema=pa.schema([("o_custkey", pa.int64())]),
    ).map_batches(lambda b: b.drop_columns(["o_custkey"]), batch_format="pyarrow")

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: _li_rev_prep(
            b,
            {
                "o_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
            },
        ),
        batch_format="pyarrow",
    )
    li_schema = pa.schema(
        [
            ("revenue_c100", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
        ]
    )
    li = adaptive_join(
        li,
        part,
        on="l_partkey",
        how="semi",
        big_schema=li_schema,
        side_schema=pa.schema([("l_partkey", pa.int64())]),
    )
    li = adaptive_join(
        li,
        supp,
        on="l_suppkey",
        big_schema=li_schema,
        side_schema=pa.schema([("l_suppkey", pa.int64()), ("is_target", pa.int64())]),
    )
    joined = adaptive_join(
        li,
        o_filt,
        on="o_orderkey",
        big_schema=pa.schema(
            [
                ("revenue_c100", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("is_target", pa.int64()),
            ]
        ),
        side_schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )

    def split(batch: pa.Table) -> pa.Table:
        rev = batch["revenue_c100"].to_numpy(zero_copy_only=False)
        tgt = batch["is_target"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_year": batch["o_year"],
                "nation_c100": pa.array(rev * tgt),
                "total_c100": pa.array(rev),
            }
        )

    census = two_phase_sum(
        joined.map_batches(split, batch_format="pyarrow"),
        ["o_year"],
        ["nation_c100", "total_c100"],
        count_as="n_items",
    )

    def share(batch: pa.Table) -> pa.Table:
        p = batch["nation_c100"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch["total_c100"].to_numpy(zero_copy_only=False).astype(np.float64)
        pml = np.floor(1e6 * (p / t) + 0.5).astype(np.int64)
        return batch.append_column("share_pml", pa.array(pml))

    return census.map_batches(share, batch_format="pyarrow").sort("o_year")


SQL_NATION_MARKET_SHARE = """
  WITH c AS (
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_12' THEN
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
               ELSE 0 END) AS BIGINT) AS nation_c100,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
             AS BIGINT) AS total_c100,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1)
  SELECT o_year, nation_c100, total_c100, n_items,
         CAST(floor(1e6 * (CAST(nation_c100 AS DOUBLE) / CAST(total_c100 AS DOUBLE))
                    + 0.5) AS BIGINT) AS share_pml
  FROM c ORDER BY o_year
"""


def q_returned_item_revenue(sf_dir: str) -> Dataset:
    """TPC-H Q10-shaped returned-item loss report: top 20 customers by
    revenue on lineitems flagged 'R' against orders placed in 1996-Q3.
    Scale shape: the quarter filter prunes orders map-side before the
    one BIG⋈BIG lineitem⋈orders exchange; the per-customer census is
    a partials-only two-phase sum; customer attributes (name, acctbal,
    nation) ride a dimension-sized adaptive join AFTER aggregation —
    attribute payload never moves with fact rows; top-20 is per-block
    partial + one-task merge, never a global sort."""
    from hexscape_ray.stages.joins import adaptive_join

    keys, names = _nation_name_map(sf_dir)

    def o_prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((us >= _Q10_LO_US) & (us < _Q10_HI_US)))
        return pa.table({"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        o_prep, batch_format="pyarrow"
    )

    def l_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        return _li_rev_prep(t, {"o_orderkey": t["l_orderkey"]})

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(l_prep, batch_format="pyarrow")
    joined = adaptive_join(
        li,
        orders,
        on="o_orderkey",
        big_schema=pa.schema([("revenue_c100", pa.int64()), ("o_orderkey", pa.int64())]),
        side_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )
    census = two_phase_sum(
        joined.select_columns(["o_custkey", "revenue_c100"]),
        ["o_custkey"],
        ["revenue_c100"],
        count_as="n_items",
    ).rename_columns({"o_custkey": "c_custkey"})

    def cust_prep(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, nk)
        bal_c = np.floor(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": batch["c_name"],
                "acctbal_c100": pa.array(bal_c),
                "n_name": pa.array(names[idx], type=pa.string()),
            }
        )

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(cust_prep, batch_format="pyarrow")
    out = adaptive_join(
        census,
        cust,
        on="c_custkey",
        big_schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("revenue_c100", pa.int64()),
                ("n_items", pa.int64()),
            ]
        ),
        side_schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("acctbal_c100", pa.int64()),
                ("n_name", pa.string()),
            ]
        ),
    )

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        rev = batch["revenue_c100"].to_numpy(zero_copy_only=False)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rev))[:20]
        return batch.take(pa.array(order))

    return (
        out.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow")
        .select_columns(
            ["c_custkey", "c_name", "acctbal_c100", "n_name", "revenue_c100", "n_items"]
        )
    )


SQL_RETURNED_ITEM_REVENUE = """
  WITH c AS (
    SELECT c_custkey, c_name,
           CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_c100,
           n_name,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
             AS BIGINT) AS revenue_c100,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
    GROUP BY 1, 2, 3, 4)
  SELECT c_custkey, c_name, acctbal_c100, n_name, revenue_c100, n_items
  FROM c ORDER BY revenue_c100 DESC, c_custkey LIMIT 20
"""


def q_important_parts(sf_dir: str) -> Dataset:
    """TPC-H Q11-shaped important-stock scan (partsupp is absent from
    this schema, so "stock value" is the shipped extended-price value
    per part from NATION_12's suppliers): keep parts whose value
    exceeds 1/1000 of the nation total.  Scale shape: the supplier
    filter broadcasts at dimension size (semi join — no payload); the
    per-part census is a partials-only two-phase sum; the HAVING
    threshold is ONE scalar from a second two-phase sum over the
    already-reduced census (never the fact table), compared in exact
    integers (value·1000 > total)."""
    from hexscape_ray.stages.joins import adaptive_join

    keys, names = _nation_name_map(sf_dir)

    def supp_prep(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = names[np.searchsorted(keys, nk)] == "NATION_12"
        return pa.table({"l_suppkey": batch.filter(pa.array(keep))["s_suppkey"]})

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        supp_prep, batch_format="pyarrow"
    )

    def l_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "l_suppkey": batch["l_suppkey"],
                "value_c100": pa.array(_cents(batch["l_extendedprice"])),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(l_prep, batch_format="pyarrow")
    li = adaptive_join(
        li,
        supp,
        on="l_suppkey",
        how="semi",
        big_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("value_c100", pa.int64()),
            ]
        ),
        side_schema=pa.schema([("l_suppkey", pa.int64())]),
    )
    census = two_phase_sum(
        li.select_columns(["l_partkey", "value_c100"]),
        ["l_partkey"],
        ["value_c100"],
        count_as="n_items",
    )
    total_tbl = two_phase_sum(
        census.map_batches(
            lambda b: pa.table(
                {
                    "one": pa.array(np.zeros(len(b), dtype=np.int64)),
                    "value_c100": b["value_c100"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["one"],
        ["value_c100"],
        count_as=None,
    ).take_all()
    total = int(total_tbl[0]["value_c100"]) if total_tbl else 0

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["value_c100"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v * 1000 > total))

    return census.map_batches(keep, batch_format="pyarrow").sort(
        ["value_c100", "l_partkey"], descending=[True, False]
    )


SQL_IMPORTANT_PARTS = """
  WITH v AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_c100,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_12'
    GROUP BY 1),
  t AS (SELECT CAST(sum(value_c100) AS BIGINT) AS total FROM v)
  SELECT l_partkey, value_c100, n_items
  FROM v, t WHERE value_c100 * 1000 > total
  ORDER BY value_c100 DESC, l_partkey
"""


def q_supplier_part_counts(sf_dir: str) -> Dataset:
    """TPC-H Q16-shaped supplier-by-part-class census (partsupp absent:
    the observed (partkey, suppkey) pairs in lineitem stand in for it):
    distinct suppliers per (brand, type, size) over selected sizes,
    excluding Brand#13, PROMO parts and suppliers in deficit
    (s_acctbal < 0 — the "complaints" analog).  Scale shape: the
    exclusion set and part attributes broadcast at dimension size; the
    two DISTINCT levels are both partials-only two-phase reductions
    keyed on already-reduced pairs — the fact table is scanned once."""
    from hexscape_ray.stages.joins import adaptive_join

    bad = set(
        r["s_suppkey"]
        for r in _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
        .map_batches(
            lambda b: pa.table(
                {"s_suppkey": b.filter(pc.less(b["s_acctbal"], 0.0))["s_suppkey"]}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    bad_arr = np.array(sorted(bad), dtype=np.int64)

    def part_prep(batch: pa.Table) -> pa.Table:
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            np.isin(sz, np.array([1, 4, 9, 14, 19, 23, 36, 49]))
            & (batch["p_brand"].to_numpy(zero_copy_only=False) != "Brand#13")
            & (batch["p_type"].to_numpy(zero_copy_only=False) != "PROMO")
        )
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "l_partkey": t["p_partkey"],
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": t["p_size"].cast(pa.int64()),
            }
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        part_prep, batch_format="pyarrow"
    )

    def l_prep(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(sk, bad_arr)
        t = batch.filter(pa.array(keep))
        return pa.table({"l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"]})

    pairs = two_phase_sum(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
            l_prep, batch_format="pyarrow"
        ),
        ["l_partkey", "l_suppkey"],
        [],
        count_as="n_seen",
    ).select_columns(["l_partkey", "l_suppkey"])
    pairs = adaptive_join(
        pairs,
        part,
        on="l_partkey",
        big_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        side_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
            ]
        ),
    )
    dedup = two_phase_sum(
        pairs.select_columns(["p_brand", "p_type", "p_size", "l_suppkey"]),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        [],
        count_as="n_seen",
    )
    out = two_phase_sum(
        dedup.select_columns(["p_brand", "p_type", "p_size"]),
        ["p_brand", "p_type", "p_size"],
        [],
        count_as="supplier_cnt",
    )
    return out.sort(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        descending=[True, False, False, False],
    )


SQL_SUPPLIER_PART_COUNTS = """
  SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand <> 'Brand#13'
    AND p_type <> 'PROMO'
    AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
  GROUP BY 1, 2, 3
  ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_disjunctive_revenue(sf_dir: str) -> Dataset:
    """TPC-H Q19-shaped disjunctive-predicate join: revenue from three
    OR-ed (brand, size-range, quantity-range) conjunctions that
    couple a part attribute to a lineitem attribute — the predicate
    can only be evaluated INSIDE the join.  Scale shape: part
    attributes broadcast at dimension size; the whole disjunction is
    one vectorised numpy mask per batch; output is a single exact
    global sum."""
    from hexscape_ray.stages.joins import adaptive_join

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b["p_partkey"],
                "p_brand": b["p_brand"],
                "p_size": b["p_size"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda b: _li_rev_prep(
            b, {"l_partkey": b["l_partkey"], "l_quantity": b["l_quantity"]}
        ),
        batch_format="pyarrow",
    )
    joined = adaptive_join(
        li,
        part,
        on="l_partkey",
        big_schema=pa.schema(
            [
                ("revenue_c100", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
            ]
        ),
        side_schema=pa.schema(
            [("l_partkey", pa.int64()), ("p_brand", pa.string()), ("p_size", pa.int64())]
        ),
    )

    def pred(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        sz = batch["p_size"].to_numpy(zero_copy_only=False)
        br = batch["p_brand"].to_numpy(zero_copy_only=False)
        keep = (
            ((br == "Brand#12") & (sz >= 1) & (sz <= 15) & (qty >= 1) & (qty <= 20))
            | ((br == "Brand#23") & (sz >= 1) & (sz <= 25) & (qty >= 10) & (qty <= 30))
            | ((br == "Brand#4") & (sz >= 1) & (sz <= 35) & (qty >= 20) & (qty <= 40))
        )
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "one": pa.array(np.zeros(len(t), dtype=np.int64)),
                "revenue_c100": t["revenue_c100"],
            }
        )

    out = two_phase_sum(
        joined.map_batches(pred, batch_format="pyarrow"),
        ["one"],
        ["revenue_c100"],
        count_as="n_items",
    )
    return out.drop_columns(["one"])


SQL_DISJUNCTIVE_REVENUE = """
  SELECT CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
           AS BIGINT) AS revenue_c100,
         count(*) AS n_items
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 20)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 30)
     OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 40)
"""


def q_excess_shipped_suppliers(sf_dir: str) -> Dataset:
    """TPC-H Q20-shaped nested-aggregate semi-join (availqty is absent:
    the inner threshold is the supplier's OWN total 1997 volume):
    ASIA-region suppliers whose 1997 shipments of 'small%'-named parts
    exceed an eighth of everything they shipped that year.  Scale
    shape: the part-name filter broadcasts key-only; the two
    per-supplier censuses reduce partials-only from one filtered fact
    scan each; the threshold compare is exact integers
    (8·small > total); supplier attributes join at dimension size."""
    from hexscape_ray.stages.joins import adaptive_join

    keys, names = _nation_name_map(sf_dir)
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _tiny_rows(sf_dir, "region")
    }
    nat_region = {
        r["n_nationkey"]: region[r["n_regionkey"]]
        for r in _tiny_rows(sf_dir, "nation")
    }

    small = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b.filter(
                    pc.starts_with(b["p_name"], "small")
                )["p_partkey"]
            }
        ),
        batch_format="pyarrow",
    )

    def l_prep(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((us >= _Y1997_US) & (us < _Y1998_US)))
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "qty": pa.array(q),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(l_prep, batch_format="pyarrow")
    total = two_phase_sum(
        li.select_columns(["l_suppkey", "qty"]), ["l_suppkey"], ["qty"], count_as=None
    ).rename_columns({"qty": "total_qty"})
    li_small = adaptive_join(
        li,
        small,
        on="l_partkey",
        how="semi",
        big_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()), ("qty", pa.int64())]
        ),
        side_schema=pa.schema([("l_partkey", pa.int64())]),
    )
    small_sum = two_phase_sum(
        li_small.select_columns(["l_suppkey", "qty"]),
        ["l_suppkey"],
        ["qty"],
        count_as=None,
    ).rename_columns({"qty": "small_qty"})
    both = adaptive_join(
        small_sum,
        total,
        on="l_suppkey",
        big_schema=pa.schema([("l_suppkey", pa.int64()), ("small_qty", pa.int64())]),
        side_schema=pa.schema([("l_suppkey", pa.int64()), ("total_qty", pa.int64())]),
    )

    def thresh(batch: pa.Table) -> pa.Table:
        s = batch["small_qty"].to_numpy(zero_copy_only=False)
        t = batch["total_qty"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(8 * s > t))

    picked = both.map_batches(thresh, batch_format="pyarrow")

    def supp_prep(batch: pa.Table) -> pa.Table:
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.array([nat_region[int(k)] == "ASIA" for k in nk])
        t = batch.filter(pa.array(keep))
        nk2 = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_suppkey": t["s_suppkey"],
                "s_name": t["s_name"],
                "n_name": pa.array(
                    names[np.searchsorted(keys, nk2)], type=pa.string()
                ),
            }
        )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        supp_prep, batch_format="pyarrow"
    )
    out = adaptive_join(
        picked,
        supp,
        on="l_suppkey",
        big_schema=pa.schema(
            [
                ("l_suppkey", pa.int64()),
                ("small_qty", pa.int64()),
                ("total_qty", pa.int64()),
            ]
        ),
        side_schema=pa.schema(
            [("l_suppkey", pa.int64()), ("s_name", pa.string()), ("n_name", pa.string())]
        ),
    )
    return out.rename_columns({"l_suppkey": "s_suppkey"}).select_columns(
        ["s_suppkey", "s_name", "n_name", "small_qty", "total_qty"]
    ).sort("s_suppkey")


SQL_EXCESS_SHIPPED_SUPPLIERS = """
  WITH y AS (
    SELECT l_partkey, l_suppkey,
           CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'),
  tot AS (SELECT l_suppkey, CAST(sum(qty) AS BIGINT) AS total_qty
          FROM y GROUP BY 1),
  sm AS (SELECT l_suppkey, CAST(sum(qty) AS BIGINT) AS small_qty
         FROM y JOIN part ON p_partkey = l_partkey
         WHERE p_name LIKE 'small%' GROUP BY 1),
  picked AS (
    SELECT sm.l_suppkey, small_qty, total_qty
    FROM sm JOIN tot ON tot.l_suppkey = sm.l_suppkey
    WHERE 8 * small_qty > total_qty)
  SELECT CAST(p.l_suppkey AS BIGINT) AS s_suppkey, s_name, n_name,
         small_qty, total_qty
  FROM picked p
  JOIN supplier ON s_suppkey = p.l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
  ORDER BY s_suppkey
"""


