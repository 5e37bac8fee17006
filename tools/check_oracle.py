"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its DuckDB oracle side-by-side and compare
row count, column names, and order-insensitive values.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(ray_df) != len(sql_df):
        errs.append(f"rows {len(ray_df)} vs {len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        errs.append(f"cols {rc} vs {sc}")
        return errs
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                ok = np.allclose(
                    a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = a[c].equals(b[c])
            if not ok:
                bad = (a[c] != b[c]) if not pd.api.types.is_float_dtype(a[c]) else (
                    a[c].astype(float) != b[c].astype(float)
                )
                n_bad = int(np.sum(bad))
                errs.append(f"col {c}: {n_bad} mismatches e.g. {a[c][bad].head(2).tolist()} vs {b[c][bad].head(2).tolist()}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("HEXRAY_ORACLE_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def check_one(name: str) -> tuple[str, bool]:
        fn = qs[name]
        try:
            try:
                ray_df = to_pandas(fn(sf_dir))
            except ImportError:
                # concurrent threads can race Ray's OPTIONAL fsspec/http
                # import (not cached on failure); retry once serially
                ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            return f"FAIL {name}: ray error {type(e).__name__}: {e}", True
        if name not in oracles:
            return (
                f"ok   {name}: rows-only ({len(ray_df)} rows, cols {sorted(ray_df.columns)})",
                False,
            )
        try:
            # per-thread cursor: duckdb connections are not thread-safe
            sql_df = con.cursor().sql(oracles[name]).df()
        except Exception as e:
            return f"FAIL {name}: sql error {e}", True
        errs = compare(name, ray_df, sql_df)
        if errs:
            return f"FAIL {name}: " + "; ".join(errs), True
        return f"PASS {name} ({len(ray_df)} rows)", False

    names = [n for n in qs if not only or n in only]
    n_fail = 0
    if os.environ.get("HEXRAY_ORACLE_SEQ") == "1" or len(names) == 1:
        results = [check_one(n) for n in names]
    else:
        # queries are independent Datasets — run several concurrently
        # so the gate is wall-clock-bound by the slowest queries, not
        # the sum (measured: 112 s sequential → 72 s at 4 threads /
        # 16 cpus on sf0.01; contention-bound beyond that).
        # Ray's OPTIONAL http filesystem import fails (no aiohttp in
        # env) and failed imports are NOT cached, so concurrent reads
        # re-race the import machinery ("cannot import name
        # HTTPFileSystem").  Stub aiohttp so the import SUCCEEDS once
        # and lands in sys.modules — the http fs is never used (all
        # paths here are local).
        import types

        for m in ("aiohttp", "yarl"):  # both imported at http.py top
            try:  # only stub when the real package is absent, so an
                __import__(m)  # installed aiohttp is never masked
            except ImportError:
                sys.modules.setdefault(m, types.ModuleType(m))
        try:
            import fsspec.implementations.http  # noqa: F401
        except Exception:
            pass
        # warm lazy code paths with one tiny read
        import ray.data

        ray.data.read_parquet(f"{sf_dir}/region.parquet").count()
        from concurrent.futures import ThreadPoolExecutor

        workers = int(os.environ.get("HEXRAY_ORACLE_THREADS", "4"))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(check_one, names))
    n_pass = n_rows = 0
    for msg, failed in results:
        print(msg)
        n_fail += int(failed)
        n_pass += msg.startswith("PASS")
        n_rows += msg.startswith("ok")
    print(
        f"SUMMARY: {n_pass} hash-exact PASS, {n_rows} rows-only ok, "
        f"{n_fail} FAIL ({len(results)} queries, {sf_dir})"
    )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
