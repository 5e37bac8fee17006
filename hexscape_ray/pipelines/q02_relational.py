"""Relational / census queries — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q01_hex as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# relational / census queries
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1-shaped pricing summary with exact integer cents."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tax = batch["l_tax"].to_numpy(zero_copy_only=False)
        ext_cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        disc_pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        tax_pct = np.floor(tax * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty),
                "base_cents": pa.array(ext_cents),
                "disc_c100": pa.array(ext_cents * (100 - disc_pct)),
                "charge_c10000": pa.array(ext_cents * (100 - disc_pct) * (100 + tax_pct)),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = two_phase_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "base_cents", "disc_c100", "charge_c10000"],
        count_as="count_order",
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["count_order"].to_numpy(zero_copy_only=False)
        sq = batch["sum_qty"].to_numpy(zero_copy_only=False)
        bc = batch["base_cents"].to_numpy(zero_copy_only=False)
        return batch.append_column("avg_qty", pa.array(sq / n)).append_column(
            "avg_price_cents", pa.array(bc / n)
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
  WITH prep AS (
    SELECT l_returnflag, l_linestatus,
      CAST(l_quantity AS BIGINT) AS qty,
      CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS ext_cents,
      CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_pct,
      CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tax_pct
    FROM lineitem
  )
  SELECT l_returnflag, l_linestatus,
    CAST(sum(qty) AS BIGINT) AS sum_qty,
    CAST(sum(ext_cents) AS BIGINT) AS base_cents,
    CAST(sum(ext_cents * (100 - disc_pct)) AS BIGINT) AS disc_c100,
    CAST(sum(ext_cents * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS charge_c10000,
    count(*) AS count_order,
    CAST(sum(qty) AS BIGINT) / count(*) AS avg_qty,
    CAST(sum(ext_cents) AS BIGINT) / count(*) AS avg_price_cents
  FROM prep GROUP BY l_returnflag, l_linestatus
"""


def q_lang_source_census(sf_dir: str) -> Dataset:
    """A1-style frequency census on (lang, source)."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    out = two_phase_sum(ds, ["lang", "source"], ["n_chars"], count_as="n_docs")
    return out.rename_columns({"n_chars": "len_sum"})


SQL_LANG_SOURCE_CENSUS = """
  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
  FROM documents GROUP BY lang, source
"""


def q_region_customer_counts(sf_dir: str) -> Dataset:
    """customer → nation → region broadcast joins + census (J5-style
    dimension lookups; small sides ship once via ray.put)."""
    nation = pd.DataFrame(_tiny_rows(sf_dir, "nation"))
    region = pd.DataFrame(_tiny_rows(sf_dir, "region"))
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"})
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    joined = broadcast_join(cust, dim, on="c_nationkey")

    def prep(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        return pa.table({"r_name": batch["r_name"], "acctbal_cents": pa.array(cents)})

    return two_phase_sum(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["r_name"],
        ["acctbal_cents"],
        count_as="n_customers",
    )


SQL_REGION_CUSTOMER_COUNTS = """
  SELECT r_name,
    CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents,
    count(*) AS n_customers
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
"""


def q_top_customers(sf_dir: str) -> Dataset:
    """Top-10 customers by exact order cents (groupby + sort + limit)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"o_custkey": batch["o_custkey"], "total_cents": pa.array(cents)})

    agg = two_phase_sum(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        ["total_cents"],
        count_as="n_orders",
    )
    # deterministic tie-break on custkey so the top-10 *set* is stable
    return agg.sort(["total_cents", "o_custkey"], descending=[True, False]).limit(10)


SQL_TOP_CUSTOMERS = """
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
  ORDER BY total_cents DESC, o_custkey LIMIT 10
"""


def q_order_priority(sf_dir: str) -> Dataset:
    """Filter by date range then census by priority (predicate pushdown)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pa.scalar(np.datetime64("1996-01-01", "us")))
        & (pc.field("o_orderdate") < pa.scalar(np.datetime64("1996-07-01", "us"))),
    )
    return two_phase_sum(
        ds.select_columns(["o_orderpriority"]), ["o_orderpriority"], [], count_as="n_orders"
    )


SQL_ORDER_PRIORITY = """
  SELECT o_orderpriority, count(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY o_orderpriority
"""


def q_events_tumbling(sf_dir: str) -> Dataset:
    """Tumbling 1-hour windows per event_type (streaming-shaped op over
    the ordered log; window = plain groupby key, SURVEY §2.9)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "hour_bucket": pa.array(hour),
                "event_type": batch["event_type"],
                "value_cents": pa.array(cents),
            }
        )

    return two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["hour_bucket", "event_type"],
        ["value_cents"],
        count_as="n_events",
    )


SQL_EVENTS_TUMBLING = """
  SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
"""


def q_events_sliding(sf_dir: str) -> Dataset:
    """Sliding windows (width 1 h, slide 15 min): each event flat-maps
    to the 4 windows covering it (window id = slide bucket), then an
    ordinary keyed aggregate — overlapping windows without any
    watermark machinery (SURVEY §2.9)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    SLIDE = 900_000_000  # 15 min in µs

    def expand(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        base = us // SLIDE
        n = us.shape[0]
        win = np.concatenate([base - j for j in range(4)])
        return pa.table(
            {
                "window_id": pa.array(win),
                "event_type": pa.array(np.tile(et, 4)),
                "value_cents": pa.array(np.tile(cents, 4)),
            }
        )

    return two_phase_sum(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["window_id", "event_type"],
        ["value_cents"],
        count_as="n_events",
    )


SQL_EVENTS_SLIDING = """
  WITH e AS (
    SELECT epoch_us(ts) // 900000000 AS base, event_type,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents
    FROM events
  ),
  expanded AS (
    SELECT base - j AS window_id, event_type, value_cents
    FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
  )
  SELECT window_id, event_type,
         CAST(sum(value_cents) AS BIGINT) AS value_cents,
         count(*) AS n_events
  FROM expanded GROUP BY window_id, event_type
"""


def q_user_activity(sf_dir: str) -> Dataset:
    """Per-user event profile: counts per type (wide) + value cents —
    the PIVOT is pushed into the per-batch prep as 0/1 indicator
    columns, so the whole query is ONE two-phase sum (the round-3
    rewrite replaced a one-pandas-DataFrame-per-user widen pass, the
    measured per-group-overhead trap)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    types = ["click", "error", "purchase", "signup", "view"]

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        cols = {
            "user_id": batch["user_id"],
            "value_cents": pa.array(cents),
        }
        for t in types:
            cols[f"n_{t}"] = pa.array((et == t).astype(np.int64))
        return pa.table(cols)

    return two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        ["value_cents"] + [f"n_{t}" for t in types],
        count_as="n_events",
    )


SQL_USER_ACTIVITY = """
  SELECT user_id, count(*) AS n_events,
    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
    CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
    CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
    CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
    CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
    CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
  FROM events GROUP BY user_id
"""


def q_top_parts(sf_dir: str) -> Dataset:
    """Filter + deterministic sort + limit (O2/O4-style)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_retailprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["p_size"], 25)), batch_format="pyarrow"
    )
    return ds.sort(["p_size", "p_partkey"], descending=[True, False]).limit(15)


SQL_TOP_PARTS = """
  SELECT p_partkey, p_name, p_size, p_retailprice
  FROM part WHERE p_size >= 25
  ORDER BY p_size DESC, p_partkey LIMIT 15
"""


