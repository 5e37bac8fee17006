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
