"""Driver-gate rehearsal: every oracle-paired query vs DuckDB at
sf0.001 (fast path; the driver runs sf0.01 — tools/check_oracle.py
covers that manually)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


ORACLE_NAMES = [
    "hex_doc_counts", "hex_lang_mix", "square_tile_counts", "hex_lineitem_agg",
    "hex_events", "pricing_summary", "lang_source_census",
    "region_customer_counts", "top_customers", "order_priority",
    "events_tumbling", "user_activity", "top_parts", "dedup_exact",
    "token_counts",
    # TPC-H family pack (round-4 continuation): the remaining classic
    # join shapes, all integer-exact
    "nation_trade_volume", "nation_year_profit", "custorder_distribution",
    "promo_revenue_share", "top_supplier_revenue", "sole_late_suppliers",
    "rich_inactive_customers", "cheapest_supplier_per_brand",
    # data-layout operators
    "hex_adaptive_tiles", "zorder_layout",
    # SQL-exact near-dup pipeline (MinHash-LSH + Jaccard + closure)
    "near_dup_pairs", "near_dup_clusters", "winnow_exact",
    "cohort_retention", "pareto_lineitem", "copurchase_triangles",
    "event_transitions", "events_latest_state", "keyword_match",
    "customer_period_shift", "events_latest_state_stream",
    "audience_overlap_sketch", "daily_revenue_gapfill",
    "nation_revenue_share", "sink_merge_roundtrip",
    "winsorized_value_stats", "sink_orc_roundtrip",
    "exact_price_quantiles", "purchase_attribution",
    "weighted_reservoir", "parquet_footer_stats",
    "user_longest_streak", "conversion_lag", "basket_lift",
    "supplier_concentration", "events_dow_hour",
    # TPC-H completion pack (Q6/Q8/Q10/Q11/Q16/Q19/Q20 shapes)
    "forecast_revenue", "nation_market_share", "returned_item_revenue",
    "important_parts", "supplier_part_counts", "disjunctive_revenue",
    "excess_shipped_suppliers",
    # implicit-adjacency hex graph (BFS geodesic, recursive-CTE oracle)
    "hex_bfs_distance",
    # HyperLogLog registers + estimate, bit-exact
    "distinct_users_hll",
    # Hilbert space-filling-curve layout (unrolled-CTE oracle)
    "hilbert_layout",
    # sweep-line over session intervals (global_cumsum consumer)
    "peak_concurrency",
    # Count-Min sketch estimates vs exact counts
    "cms_user_counts",
    # distributed OLS via exact moment partials
    "ols_price_quantity",
    # radix-selected p99 threshold -> conditional census
    "top1pct_revenue_share",
    # robust dispersion: two chained radix selects
    "mad_order_value",
    # tie-invariant Gini over the value-compressed census
    "nation_value_gini",
    # chi-square independence test (per-cell micro-round, int sum)
    "lang_source_chi2",
    # nearest-site assignment (voronoi J6 shape, hash-exact)
    "nearest_poi",
    # dedup endgame: per-cluster canonical survivor
    "near_dup_canonical",
    # RFM segmentation: 9 radix-selected fences -> 64-cell census
    "rfm_segments",
    # iterative deletion: bounded-round k-core peel, unrolled-CTE oracle
    "trade_kcore",
    # lag-k autocorrelation over the gap-filled day axis
    "revenue_autocorr",
    # sliding-window distinct via HLL register merging
    "sliding_distinct_hll",
    # streaming HLL shards (shares the batch oracle)
    "distinct_users_hll_stream",
    # list-column unnest: per-dimension embedding stats
    "embedding_dim_stats",
    # referential-integrity audit (six FK edges, anti joins)
    "fk_orphans",
    # Welch two-sample t-test from exact moment partials
    "lang_length_ttest",
    # raster->hex resample, integer-exact (north-rule pair closed)
    "raster_to_hex",
    # AMS tug-of-war F2 / self-join-size sketch (16 additive counters)
    "selfjoin_size_ams",
    # CUSUM change point over the gap-filled day axis, integer-exact
    "revenue_changepoint",
    # sliding-window document chunking incl. chunk text slices
    "chunk_documents",
    # Arrow IPC stream sink/source roundtrip
    "sink_ipc_roundtrip",
    # AMS inner-product join-cardinality estimate vs exact join size
    "join_size_ams",
    # lakehouse snapshot diff census (added/removed/changed/unchanged)
    "snapshot_diff",
    # integer alpha=1/2 EWMA, recursive-CTE oracle
    "revenue_ewma",
    # distinct-n corpus diversity per language
    "corpus_distinct_ngrams",
    # quantity-weighted lower median via value-compressed census
    "weighted_median_price",
    # Poisson bootstrap: 16 deterministic resample totals + spread
    "bootstrap_revenue_ci",
    # streaming AMS shards (addition commutes; shares the batch oracle)
    "selfjoin_size_ams_stream",
    # stopword-profile langid replayed in SQL, confusion census
    "langid_confusion",
    # disjoint-class regex tokenizer, re == RE2 match-for-match
    "regex_token_counts",
    # order-invariant anti-entropy partition checksums (40-bit sums)
    "partition_checksums",
    # global Moran's I over the hex census, exact-integer ratio
    "hex_moran",
    # within-radius distance join, 16 broadcast sites
    "poi_radius_counts",
    # grid DBSCAN: dense hex cells -> 6-adjacency components
    "hex_dbscan",
    # origin->destination flow matrix from per-user event sequences
    "hex_od_flows",
    # emerging-hotspot OLS trend per cell, exact integers
    "hex_event_trend",
    # local Getis-Ord Gi* z-scores, mirrored float tree (two sqrts)
    "hex_getis",
    # per-cell net flow (divergence of the OD matrix)
    "hex_flow_imbalance",
    # spatial concentration Gini over the count-compressed hex census
    "hex_coverage_gini",
]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con, registry):
    qs, oracles = registry
    ray_df = qs[name](SF_SMOKE).to_pandas()
    sql_df = con.sql(oracles[name]).df()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype(np.float64), bv.astype(np.float64)), c
        else:
            assert np.array_equal(av, bv), c


def test_entry_smoke(registry):
    import __ray_entry__ as e

    out = e.entry().to_pandas()
    assert len(out) > 0
    p_cols = [c for c in out.columns if c.startswith("p_")]
    assert np.allclose(out[p_cols].sum(axis=1), 1.0, atol=1.5e-8)


def test_rows_only_queries_run(registry):
    qs, _ = registry
    for name in ["doc_quality", "minhash_bands", "knn_cosine"]:
        df = qs[name](SF_SMOKE).to_pandas()
        assert len(df) > 0


def test_axial_sql_generator_parity_random_spec():
    """The generated SQL reproduces point_to_axial bit-for-bit for an
    ARBITRARY GridSpec, not just the default lattice."""
    import duckdb as ddb
    import numpy as np

    from hexscape_ray import grid
    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.queries import axial_sql

    rng = np.random.default_rng(17)
    for spec in [
        GridSpec(hex_width=777.5, ref_x=-1234.25, ref_y=98765.125),
        GridSpec(hex_width=3333.0, ref_x=50.0, ref_y=-10.5),
    ]:
        x = rng.random(5000) * 120_000 - 10_000
        y = rng.random(5000) * 120_000 - 10_000
        r, q = grid.point_to_axial(x, y, spec, 0)
        con = ddb.connect()
        con.register("ptsrc", __import__("pandas").DataFrame({"x": x, "y": y}))
        sql = "WITH pts AS (SELECT x, y FROM ptsrc),\n" + axial_sql(spec, 0) + "\nSELECT r, q FROM hexed"
        got = con.sql(sql).df()
        assert np.array_equal(got["r"].to_numpy(), r), spec
        assert np.array_equal(got["q"].to_numpy(), q), spec


def test_every_registry_query_returns_rows(registry):
    """Smoke EVERY queries() entry at sf0.001 — catches breakage in
    entries no named test covers (the driver runs all of them)."""
    qs, _ = registry
    already = set(ORACLE_NAMES) | {"doc_quality", "minhash_bands", "knn_cosine"}
    for name, fn in qs.items():
        if name in already:
            continue
        res = fn(SF_SMOKE)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) > 0, name


def test_cube_margins_additive(ray_session):
    """CUBE grouping sets are mutually consistent: the grand total
    equals the sum of the per-lang margins and of the fine cells."""
    from hexscape_ray.pipelines.queries import q_lang_source_cube

    df = q_lang_source_cube("/root/testdata/sf0.001").to_pandas()
    star = df[(df["lang"] == "*") & (df["source"] == "*")]
    fine = df[(df["lang"] != "*") & (df["source"] != "*")]
    lang_m = df[(df["lang"] != "*") & (df["source"] == "*")]
    assert int(star["n_docs"].iloc[0]) == int(fine["n_docs"].sum())
    assert int(star["sum_chars"].iloc[0]) == int(lang_m["sum_chars"].sum())


def test_weighted_sample_partition_invariant(ray_session):
    """The weighted Bernoulli keep-set is a pure function of
    (doc_id, n_chars) — identical under any repartitioning."""
    import ray.data as rd

    from hexscape_ray.pipelines.queries import q_weighted_sample

    base = q_weighted_sample("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )
    from hexscape_ray.functions.hashing import splitmix64

    did = tbl["doc_id"].to_numpy().astype(np.int64).view(np.uint64)
    n = tbl["n_chars"].to_numpy().astype(np.uint64)
    h = splitmix64(did)
    keep = (n >= 512) | (h < np.where(n >= 512, np.uint64(0), n << np.uint64(55)))
    assert sorted(base["doc_id"]) == sorted(
        tbl["doc_id"].to_numpy()[keep].tolist()
    )
    # and longer docs must be kept at a higher rate than shorter ones
    med = float(np.median(tbl["n_chars"].to_numpy()))
    kept_frac_long = keep[tbl["n_chars"].to_numpy() > med].mean()
    kept_frac_short = keep[tbl["n_chars"].to_numpy() <= med].mean()
    assert kept_frac_long > kept_frac_short


def test_sink_queries_rerun_idempotent(registry):
    """The sink round-trip queries clean and rebuild their /tmp output
    dirs — running twice back-to-back must give identical results
    (rerun/resume safety for the fixed-path sinks)."""
    qs, _ = registry
    for name in ("sink_roundtrip", "sink_orc_roundtrip", "sink_merge_roundtrip"):
        a = qs[name](SF_SMOKE).to_pandas()
        b = qs[name](SF_SMOKE).to_pandas()
        assert a.equals(b), name
