"""The bench FINAL stdout line must stay under the driver's 2000-byte
tail capture no matter how many queries run (BENCH_r04 regression:
parsed:null because the line outgrew the buffer)."""

import json


def test_headline_line_budget_under_load():
    import bench

    head = {"sec": 7.387, "sec_etl": 6.327, "sec_agg": 1.06,
            "docs": 2_000_000, "cells": 193, "docs_per_sec": 270762.5}
    # 300 queries incl. failures, absurdly long names
    queries = {
        f"extremely_long_query_name_number_{i:04d}_with_padding": (i % 7) + 0.123
        for i in range(300)
    }
    queries["broken_query_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"] = -1.0
    sc = {
        "scaling_efficiency": 0.911, "scaling_efficiency_raw": 0.868,
        "scaling_efficiency_equal_load": 0.911,
        "recorded_at": "2026-08-19T18:37:27", "scale_docs": 4_000_000,
        "sec_2_raw": 120.368, "sec_8": 34.653, "sec_2_equal_load": 126.317,
    }
    line = bench.build_headline_line(head, queries, sc)
    assert len(line) <= bench._MAX_HEADLINE_BYTES < 2000
    d = json.loads(line)
    assert d["docs_per_sec"] == 270762.5
    assert d["queries_n"] == 301 and d["queries_failed"] == 1
    assert d["scaling_efficiency"] == 0.911
    assert len(d["queries"]) <= 12
    # slowest-first content survives the shed
    if d["queries"]:
        assert max(d["queries"].values()) == max(
            v for v in queries.values() if v >= 0
        )


def test_headline_line_no_scaling_file():
    import bench

    head = {"sec": 1.0, "sec_etl": 0.7, "sec_agg": 0.3,
            "docs": 20000, "cells": 193, "docs_per_sec": 20000.0}
    line = bench.build_headline_line(head, {}, None)
    d = json.loads(line)
    assert d["value"] == 1.0 and d["queries"] == {}
