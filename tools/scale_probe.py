"""Force the DISTRIBUTED tier of every two-tier operator at sf0.1 and
time it — insurance that the 100×-scale code paths (the ones the
small-scale gate never exercises because the adaptive thresholds route
around them) still run clean end-to-end.

Run: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_DEDUP_LOGS", "1")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from hexscape_ray.pipelines import queries as Q
    from hexscape_ray.stages.agg import global_cumsum
    from hexscape_ray.stages.graph import pagerank
    from hexscape_ray.stages.joins import adaptive_join

    results = {}

    # 1. pagerank: distributed iteration loop (local_threshold=0)
    t0 = time.perf_counter()
    orders = Q._read(sf, "orders", ["o_orderkey", "o_custkey"])
    li = Q._read(sf, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "suppnode": pc.add(pc.multiply(t["l_suppkey"], 2), 1),
            }
        ),
        batch_format="pyarrow",
    )
    trade = adaptive_join(
        li,
        orders,
        on="o_orderkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("suppnode", pa.int64())]),
        side_count=10**12,  # force the bucketed path too
    ).map_batches(
        lambda t: pa.table({"u": pc.multiply(t["o_custkey"], 2), "v": t["suppnode"]}),
        batch_format="pyarrow",
    )
    from hexscape_ray.stages.agg import two_phase_sum

    pairs = two_phase_sum(trade, ["u", "v"], [], count_as="__n")
    edges = pairs.select_columns(["u", "v"]).map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
                "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
    )
    n_pr = pagerank(edges, n_iter=3, local_threshold=0).count()
    results["pagerank_distributed"] = (round(time.perf_counter() - t0, 2), n_pr)

    # 2. global_cumsum: bucketed two-level scan (small_threshold=0)
    t0 = time.perf_counter()
    docs = Q._read(sf, "documents", ["doc_id", "n_chars"])
    n_docs = docs.count()
    n_cs = global_cumsum(
        docs, "doc_id", "n_chars", n_rows_est=n_docs, order_hi=n_docs, small_threshold=0
    ).count()
    results["global_cumsum_distributed"] = (round(time.perf_counter() - t0, 2), n_cs)

    # 3. kmeans: distributed moment-partial loop (env knob)
    t0 = time.perf_counter()
    os.environ["HEXRAY_KMEANS_LOCAL_ROWS"] = "0"
    try:
        from hexscape_ray.stages.knn import kmeans_distributed

        emb = Q._read(sf, "embeddings", ["vec_id", "embedding"])
        _, assign = kmeans_distributed(emb, k=8, n_iter=4)
        n_km = assign.count()
    finally:
        os.environ.pop("HEXRAY_KMEANS_LOCAL_ROWS", None)
    results["kmeans_distributed"] = (round(time.perf_counter() - t0, 2), n_km)

    # 4. adaptive_join forced-bucketed parity vs broadcast on a real query pair
    t0 = time.perf_counter()
    cust = Q._read(sf, "customer", ["c_custkey", "c_nationkey"])
    ords = Q._read(sf, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"], "c_custkey": t["o_custkey"]}),
        batch_format="pyarrow",
    )
    big_schema = pa.schema([("o_orderkey", pa.int64()), ("c_custkey", pa.int64())])
    a = adaptive_join(ords, cust, on="c_custkey", big_schema=big_schema).count()
    b = adaptive_join(
        ords, cust, on="c_custkey", big_schema=big_schema, side_count=10**12
    ).count()
    assert a == b, (a, b)
    results["adaptive_join_bucketed_parity"] = (round(time.perf_counter() - t0, 2), a)

    # 5. round-4 continuation ops: force the DISTRIBUTED tier of every
    # _pairs_via_groups / two_phase combine by zeroing SMALL_AGG_ROWS
    # (read at call time from the module attr) and assert full-frame
    # parity with the small tier
    import hexscape_ray.stages.agg as agg_mod

    def run_df(name):
        df = Q.RAY_QUERIES[name](sf).to_pandas()
        return df.sort_values(list(df.columns), ignore_index=True)

    for name in (
        "event_transitions",
        "events_latest_state",
        "near_dup_pairs",
        "copurchase_triangles",
        "pareto_lineitem",
        "set_similarity_pairs",
    ):
        t0 = time.perf_counter()
        small = run_df(name)
        saved = agg_mod.SMALL_AGG_ROWS
        agg_mod.SMALL_AGG_ROWS = 0
        try:
            dist = run_df(name)
        finally:
            agg_mod.SMALL_AGG_ROWS = saved
        assert small.equals(dist), name
        results[f"{name}_two_tier_parity"] = (
            round(time.perf_counter() - t0, 2),
            len(small),
        )

    # 6. session-4 two-tier ops: forced distributed tier vs small tier
    from hexscape_ray.stages.graph import hex_bfs_distance, k_peel

    t0 = time.perf_counter()
    counts = Q.q_hex_doc_counts(sf).select_columns(["r", "q", "n_docs"])
    pdf = counts.to_pandas().sort_values(
        ["n_docs", "r", "q"], ascending=[False, True, True]
    )
    seed = (int(pdf.iloc[0]["r"]), int(pdf.iloc[0]["q"]))
    cells = counts.select_columns(["r", "q"])
    small = hex_bfs_distance(cells, seed).to_pandas()
    dist = hex_bfs_distance(cells, seed, local_cells=0).to_pandas()
    assert small.reset_index(drop=True).equals(dist.reset_index(drop=True))
    results["hex_bfs_two_tier_parity"] = (
        round(time.perf_counter() - t0, 2),
        len(small),
    )

    t0 = time.perf_counter()
    ords2 = Q._read(sf, "orders", ["o_orderkey", "o_custkey"])
    li2 = Q._read(
        sf, "lineitem", ["l_orderkey", "l_suppkey", "l_quantity", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.filter(
                    pa.array(
                        (t["l_quantity"].to_numpy(zero_copy_only=False) <= 5.0)
                        & (t["l_partkey"].to_numpy(zero_copy_only=False) % 9 == 0)
                    )
                )["l_orderkey"],
                "b": pc.add(
                    t.filter(
                        pa.array(
                            (t["l_quantity"].to_numpy(zero_copy_only=False) <= 5.0)
                            & (t["l_partkey"].to_numpy(zero_copy_only=False) % 9 == 0)
                        )
                    )["l_suppkey"],
                    1_000_000,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    from hexscape_ray.stages.agg import two_phase_sum as _tps

    pairs = adaptive_join(
        li2,
        ords2,
        on="o_orderkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("b", pa.int64())]),
        side_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
    ).map_batches(
        lambda t: pa.table({"a": t["o_custkey"], "b": t["b"]}),
        batch_format="pyarrow",
    )
    edges = _tps(pairs, ["a", "b"], [], count_as="__n").select_columns(["a", "b"])
    small = k_peel(edges, k=2).to_pandas()
    dist = k_peel(edges, k=2, local_threshold=0).to_pandas()
    assert small.reset_index(drop=True).equals(dist.reset_index(drop=True))
    results["k_peel_two_tier_parity"] = (
        round(time.perf_counter() - t0, 2),
        len(small),
    )

    # 7. fk_orphans: force EVERY parent through the co-partitioned anti
    # path (BROADCAST_ROWS=0 — adaptive_join and the query's per-parent
    # routing both read the module attr at call time) and assert parity
    # with the gated run (round-4 verdict #4)
    import hexscape_ray.stages.joins as joins_mod

    t0 = time.perf_counter()
    small = run_df("fk_orphans")
    saved_br = joins_mod.BROADCAST_ROWS
    joins_mod.BROADCAST_ROWS = 0
    try:
        dist = run_df("fk_orphans")
    finally:
        joins_mod.BROADCAST_ROWS = saved_br
    assert small.equals(dist), "fk_orphans broadcast/bucketed parity"
    results["fk_orphans_gate_parity"] = (
        round(time.perf_counter() - t0, 2),
        len(small),
    )

    # 8. set_similarity_pairs: force the corpus-scale incidence verify
    # tier (BROADCAST_ROWS=0) and assert parity with the bitset tier.
    # Runs at sf0.01: the incidence tier is sized for real-vocabulary
    # corpora (candidates ~ true pairs); on the degenerate 31-token
    # fixture vocab at sf0.1 its 1.8M candidates x ~23-token expansion
    # is the pathological shape the bitset tier exists to avoid.
    sf001 = sf.replace("sf0.1", "sf0.01")
    t0 = time.perf_counter()

    def run_sim(path):
        df = Q.RAY_QUERIES["set_similarity_pairs"](path).to_pandas()
        return df.sort_values(list(df.columns), ignore_index=True)

    small = run_sim(sf001)
    joins_mod.BROADCAST_ROWS = 0
    try:
        dist = run_sim(sf001)
    finally:
        joins_mod.BROADCAST_ROWS = saved_br
    assert small.equals(dist), "setsim verify-tier parity"
    results["setsim_verify_tier_parity"] = (
        round(time.perf_counter() - t0, 2),
        len(small),
    )

    for k, (sec, n) in results.items():
        print(f"OK {k}: {sec} s, {n} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
