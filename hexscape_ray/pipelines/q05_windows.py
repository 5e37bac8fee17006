"""Window / funnel / text-model / curation queries — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q04_geo as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


def q_funnel_view_purchase(sf_dir: str) -> Dataset:
    """Two-step funnel — per user: purchases, and purchases CONVERTED
    from a view within the preceding hour (inclusive edges).  One hash
    co-partition + one vectorised composite double-searchsorted per
    bucket (``stages.window.funnel_conversion``); oracle = the literal
    correlated EXISTS over a BETWEEN window."""
    from hexscape_ray.stages.window import funnel_conversion

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    return funnel_conversion(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        time_col="us",
        type_col="event_type",
        step_a="view",
        step_b="purchase",
        window=3_600_000_000,
    ).sort("user_id")


SQL_FUNNEL_VIEW_PURCHASE = """
  WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
  p AS (
    SELECT user_id, us,
           EXISTS (SELECT 1 FROM e a
                   WHERE a.user_id = p0.user_id AND a.event_type = 'view'
                     AND a.us BETWEEN p0.us - 3600000000 AND p0.us) AS conv
    FROM e p0 WHERE event_type = 'purchase')
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_target,
         CAST(count(*) FILTER (conv) AS BIGINT) AS n_converted
  FROM p GROUP BY user_id ORDER BY user_id
"""


def q_user_event_gaps(sf_dir: str) -> Dataset:
    """LAG-delta aggregate — per user the count / sum / max of
    microsecond gaps between consecutive events (ordered by ts then
    event_id).  One hash co-partition, vectorised diff + bincount per
    bucket (``stages.window.grouped_gap_stats``); single-event users
    report typed zeros, mirrored by COALESCE in the oracle."""
    from hexscape_ray.stages.window import grouped_gap_stats

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
            }
        )

    return grouped_gap_stats(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        time_col="us",
        order_tail=["event_id"],
    ).sort("user_id")


SQL_USER_EVENT_GAPS = """
  WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events)
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap,
         CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
  FROM g GROUP BY user_id ORDER BY user_id
"""


def q_lang_length_quartiles(sf_dir: str) -> Dataset:
    """Per-group NTILE(4) census — documents ranked by (n_chars,
    doc_id) within each language, quartile-assigned with SQL NTILE's
    fill rule (``stages.agg.grouped_ntile``), then an exact census per
    (lang, tile).  The rank-based partitioner of a curation pipeline
    (drop the shortest quartile per language)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from hexscape_ray.stages.agg import grouped_ntile

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    tiled = grouped_ntile(docs, "lang", ["n_chars", "doc_id"], 4, out="tile")
    return (
        tiled.groupby(["lang", "tile"])
        .aggregate(
            Count(alias_name="n_docs"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
            Sum("n_chars", alias_name="sum_chars"),
        )
        .sort(["lang", "tile"])
    )


SQL_LANG_LENGTH_QUARTILES = """
  WITH t AS (
    SELECT lang, n_chars,
           ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS tile
    FROM documents)
  SELECT lang, CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM t GROUP BY lang, tile ORDER BY lang, tile
"""


def q_bloom_brand_revenue(sf_dir: str) -> Dataset:
    """Bloom-prefiltered selective join — revenue per brand over
    lineitems of LARGE parts (p_size ≥ 48, ~6 % of parts).  The build
    side's keys go into a 12-bit/key Bloom bitset (``ray.put`` once);
    the fact stream is pre-filtered by k vectorised probes per batch
    BEFORE any exchange, so only ~selectivity + 0.3 % FP of the rows
    reach the exact broadcast join that removes impostors.  At 100 TB
    this is the shape when the filtered dimension is too big for an
    exact ``is_in`` array but its bitset fits anywhere.  Oracle = the
    plain join (the bloom is a transparent optimisation)."""
    from hexscape_ray.stages.joins import (
        bloom_build,
        bloom_prefilter,
        broadcast_join,
    )

    part = (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        .filter(expr="p_size >= 48")
        .select_columns(["p_partkey", "p_brand"])
        .to_pandas()
    )  # small by selectivity; at scale keep distributed + bucketed_join
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_partkey": batch["l_partkey"],
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    survivors = bloom_prefilter(
        li.map_batches(cents, batch_format="pyarrow"),
        bloom_build(part["p_partkey"].to_numpy()),
        on="p_partkey",
    )
    joined = broadcast_join(survivors, part, on="p_partkey", how="inner")
    return (
        two_phase_sum(
            joined.select_columns(["p_brand", "cents"]),
            ["p_brand"],
            ["cents"],
            count_as="n_items",
        )
        .rename_columns({"cents": "revenue_cents"})
        .sort("p_brand")
    )


SQL_BLOOM_BRAND_REVENUE = """
  SELECT p_brand,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_cents,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size >= 48
  GROUP BY p_brand ORDER BY p_brand
"""


def q_source_lang_pivot(sf_dir: str) -> Dataset:
    """Long→wide PIVOT — doc counts per source spread into one column
    per language (fixed DOC_LANGS column set, zero-filled), the
    conditional-aggregation pivot.  Scale shape: the full long census
    is ONE two-phase sum (shuffle volume = |source×lang| partials, not
    rows); the widening touches only the tiny census table."""
    docs = _read(sf_dir, "documents", ["source", "lang"])
    census = two_phase_sum(docs, ["source", "lang"], [], count_as="n")

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        row = {"source": g["source"].iloc[0]}
        by = g.set_index("lang")["n"]
        for lang in DOC_LANGS:
            row[f"n_{lang}"] = int(by.get(lang, 0))
        row["n_total"] = int(g["n"].sum())
        return pd.DataFrame([row])

    return census.groupby("source").map_groups(
        widen, batch_format="pandas"
    ).sort("source")


SQL_SOURCE_LANG_PIVOT = """
  SELECT source,
         CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
         CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
         CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
         CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
         CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh,
         CAST(count(*) AS BIGINT) AS n_total
  FROM documents GROUP BY source ORDER BY source
"""


def q_edit_distance_pairs(sf_dir: str) -> Dataset:
    """Blocked Levenshtein near-dup pairs — same-language documents
    whose lengths differ ≤16 and whose 40-char prefixes are within 18
    unit-cost edits (``stages.dedup.edit_distance_pairs``: banded
    length routing, two-pointer candidates, pair-axis-vectorised DP).
    Oracle = the literal ``levenshtein(substr(...))`` predicate join."""
    from hexscape_ray.stages.dedup import edit_distance_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    return edit_distance_pairs(docs).sort(["doc_a", "doc_b"])


SQL_EDIT_DISTANCE_PAIRS = """
  WITH d AS (
    SELECT doc_id, lang, n_chars, substr(text, 1, 40) AS p FROM documents)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 16
  WHERE levenshtein(a.p, b.p) <= 18
  ORDER BY doc_a, doc_b
"""


def q_doc_top_term(sf_dir: str) -> Dataset:
    """TF·DF term salience — for every document, its most distinctive
    token: max term frequency, ties to the RARER token (min document
    frequency), then lexicographic.  The rank-exact skeleton of TF-IDF
    scoring with no floats on the parity path.

    Composition: pass 1 — per-row tokenise → per-doc distinct tokens →
    token DF by one two-phase sum (the only shuffle, volume =
    vocabulary); DF map broadcast once via ``ray.put`` (bounded vocab —
    for an open vocab swap in ``bucketed_join`` on token); pass 2 —
    per-row tokenise + argmax against the broadcast DF.  A document is
    ONE row, so the per-doc argmax never crosses a batch boundary and
    needs no shuffle."""
    import ray as _ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def distinct_tokens(batch: pa.Table) -> pa.Table:
        toks = []
        for txt in batch["text"].to_pylist():
            toks.extend(set(t for t in txt.split(" ") if t))
        return pa.table({"token": pa.array(toks, pa.string())})

    df_tbl = two_phase_sum(
        docs.map_batches(distinct_tokens, batch_format="pyarrow"),
        ["token"],
        [],
        count_as="df",
    ).to_pandas()  # vocab table — small by assumption, broadcast side
    df_ref = _ray.put(
        dict(zip(df_tbl["token"].tolist(), df_tbl["df"].astype(np.int64)))
    )

    class TopTerm:
        def __init__(self):
            self.df = _ray.get(df_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, toks, tfs, dfs = [], [], [], []
            for did, txt in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            ):
                c: dict = {}
                for t in txt.split(" "):
                    if t:
                        c[t] = c.get(t, 0) + 1
                # max tf, ties -> min df, then lexicographic token
                best = min(
                    c.items(), key=lambda kv: (-kv[1], self.df[kv[0]], kv[0])
                )
                ids.append(did)
                toks.append(best[0])
                tfs.append(best[1])
                dfs.append(int(self.df[best[0]]))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "top_token": pa.array(toks, pa.string()),
                    "tf": pa.array(tfs, pa.int64()),
                    "df": pa.array(dfs, pa.int64()),
                }
            )

    return docs.map_batches(
        TopTerm, batch_format="pyarrow", concurrency=(1, 8)
    ).sort("doc_id")


SQL_DOC_TOP_TERM = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
  tf AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM tok WHERE token <> '' GROUP BY doc_id, token),
  df AS (
    SELECT token, CAST(count(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, token FROM tok WHERE token <> '')
    GROUP BY token)
  SELECT doc_id, token AS top_token, tf, df
  FROM tf JOIN df USING (token)
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY tf DESC, df ASC, token ASC) = 1
  ORDER BY doc_id
"""


def q_lang_source_cube(sf_dir: str) -> Dataset:
    """GROUP BY CUBE(lang, source) — all four grouping sets ('*' =
    ALL sentinel).  Scale shape: ONE two-phase sum over the corpus
    builds the finest (lang, source) census; every coarser grouping is
    re-aggregated FROM that census (|lang×source| rows), so the cube
    costs one corpus pass + three census-sized reductions, not four
    corpus passes."""
    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    fine = two_phase_sum(
        docs, ["lang", "source"], ["n_chars"], count_as="n_docs"
    ).materialize()  # tiny; consumed by 4 groupings below

    def tag_all(col: str):
        def fn(t: pa.Table) -> pa.Table:
            star = pa.array(["*"] * len(t), pa.string())
            return t.set_column(t.column_names.index(col), col, star)

        return fn

    by_lang = two_phase_sum(
        fine.map_batches(tag_all("source"), batch_format="pyarrow"),
        ["lang", "source"],
        ["n_chars", "n_docs"],
        count_as=None,
    )
    by_source = two_phase_sum(
        fine.map_batches(tag_all("lang"), batch_format="pyarrow"),
        ["lang", "source"],
        ["n_chars", "n_docs"],
        count_as=None,
    )
    total = two_phase_sum(
        fine.map_batches(
            lambda t: tag_all("lang")(tag_all("source")(t)),
            batch_format="pyarrow",
        ),
        ["lang", "source"],
        ["n_chars", "n_docs"],
        count_as=None,
    )
    return (
        fine.union(by_lang, by_source, total)
        .rename_columns({"n_chars": "sum_chars"})
        .sort(["lang", "source"])
    )


SQL_LANG_SOURCE_CUBE = """
  SELECT coalesce(lang, '*') AS lang, coalesce(source, '*') AS source,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY CUBE (lang, source)
  ORDER BY lang, source
"""


def q_weighted_sample(sf_dir: str) -> Dataset:
    """Deterministic WEIGHTED Bernoulli sample — each doc kept with
    probability min(1, n_chars/512), decided by
    ``splitmix64(doc_id) < n_chars · 2^55`` (512 = 2^9, so the
    threshold is exact in uint64 for n_chars < 512 and saturates
    above).  The length-proportional downsampler of a training-data
    mix; zero shuffle, zero RNG state, reproducible across any
    partitioning.  Oracle = the same comparison in HUGEINT."""
    from hexscape_ray.functions.hashing import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        did = np.asarray(
            batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64
        ).view(np.uint64)
        n = np.asarray(
            batch["n_chars"].to_numpy(zero_copy_only=False), dtype=np.uint64
        )
        h = splitmix64(did)
        sat = n >= np.uint64(512)
        thr = np.where(sat, np.uint64(0), n << np.uint64(55))
        return batch.filter(pa.array(sat | (h < thr)))

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")


SQL_WEIGHTED_SAMPLE = f"""
  WITH src AS (SELECT doc_id AS x, doc_id, lang, n_chars FROM documents),
  h AS ({_splitmix64_sql("x", carry="doc_id, lang, n_chars", src="src")})
  SELECT doc_id, lang, n_chars FROM h
  WHERE n_chars >= 512
     OR h < CAST(n_chars AS HUGEINT) * 36028797018963968
  ORDER BY doc_id
"""


def q_region_order_rank_dense(sf_dir: str) -> Dataset:
    """DENSE_RANK top-k with ties — per nation, the customers at the
    top-3 DISTINCT order-count levels, censused per (nation, level).
    Order counts tie heavily, so this exercises dense-rank semantics
    row_number can't fake.  Scale shape: one per-customer aggregate
    (the only corpus-sized shuffle) → broadcast-join nation keys →
    (nation, n_orders) census → dense ranks derived INSIDE the tiny
    census by sorting distinct levels per nation."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    per_cust = two_phase_sum(
        orders.rename_columns({"o_custkey": "c_custkey"}),
        ["c_custkey"],
        [],
        count_as="n_orders",
    )
    from hexscape_ray.stages.joins import bucketed_join

    joined = bucketed_join(
        cust,
        per_cust,
        on="c_custkey",
        how="left",
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("n_orders", pa.int64())]
        ),
    ).map_batches(
        lambda t: t.set_column(
            t.column_names.index("n_orders"),
            "n_orders",
            pc.fill_null(t["n_orders"], 0),
        ),
        batch_format="pyarrow",
    )
    census = two_phase_sum(
        joined.select_columns(["c_nationkey", "n_orders"]),
        ["c_nationkey", "n_orders"],
        [],
        count_as="n_customers",
    )

    def topk(g: pa.Table) -> pa.Table:
        n = g["n_orders"].to_numpy(zero_copy_only=False)
        order = np.argsort(-n, kind="stable")
        keep = order[:3]  # distinct levels by construction of the census
        return g.take(pa.array(np.sort(keep)))

    return (
        census.groupby("c_nationkey")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["c_nationkey", "n_orders"])
    )


SQL_REGION_ORDER_RANK_DENSE = """
  WITH pc AS (
    SELECT c_custkey, c_nationkey,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS n_orders
    FROM customer c),
  r AS (
    SELECT c_nationkey, n_orders, CAST(count(*) AS BIGINT) AS n_customers,
           dense_rank() OVER (PARTITION BY c_nationkey
                              ORDER BY n_orders DESC) AS rk
    FROM pc GROUP BY c_nationkey, n_orders)
  SELECT c_nationkey, CAST(n_orders AS BIGINT) AS n_orders, n_customers
  FROM r WHERE rk <= 3 ORDER BY c_nationkey, n_orders
"""


SQL_REDACT_PII = """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
       CAST(length(props) - length(regexp_replace(props, '[0-9]+', '', 'g'))
            AS BIGINT) AS n_redacted_chars
FROM events
ORDER BY event_id
"""


def q_redact_pii(sf_dir: str) -> Dataset:
    """PII-style regex redaction (stages/textops.py::regex_scrub):
    digit-run scrub over the events JSON props — Arrow
    replace_substring_regex and DuckDB regexp_replace are both RE2, so
    the redacted strings are byte-identical."""
    from hexscape_ray.stages.textops import regex_scrub

    ds = _read(sf_dir, "events", ["event_id", "props"])
    return (
        regex_scrub(ds, "props", [(r"[0-9]+", "<NUM>")])
        .drop_columns(["props"])
        .sort("event_id")
    )


SQL_UNPIVOT_LINEITEM = """
WITH m AS (
  SELECT l_returnflag, 'l_quantity' AS measure,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS cents FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice',
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount',
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax',
         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


def q_unpivot_lineitem(sf_dir: str) -> Dataset:
    """Wide → long melt (stages/agg.py::unpivot) of the four lineitem
    measures into (measure, cents) rows, then a two-phase grouped sum —
    the inverse of the pivot stages.  Money as exact integer cents
    (floor(x·100 + 0.5), the repo rounding rule)."""
    import pyarrow.compute as pc

    from hexscape_ray.stages.agg import two_phase_sum, unpivot

    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", ["l_returnflag"] + measures)

    def to_cents(batch: pa.Table) -> pa.Table:
        out = batch.select(["l_returnflag"])
        for c in measures:
            v = batch[c].to_numpy(zero_copy_only=False)
            out = out.append_column(
                c, pa.array(np.floor(v * 100 + 0.5).astype(np.int64))
            )
        return out

    long = unpivot(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["l_returnflag"],
        measures,
        var_name="measure",
        value_name="cents",
    )
    agg = two_phase_sum(long, ["l_returnflag", "measure"], ["cents"], count_as="n")
    return agg.rename_columns({"cents": "sum_cents"}).sort(
        ["l_returnflag", "measure"]
    )


SQL_SEGMENT_DEDUP = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
segidx AS (
  SELECT doc_id, ts, unnest(range(0, (len(ts) - 1) // 10 + 1)) AS i FROM toks
),
seg AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(ts[i * 10 + 1 : least((i + 1) * 10, len(ts))], ' ') AS seg,
         least((i + 1) * 10, len(ts)) - i * 10 AS ntok
  FROM segidx
),
firsts AS (
  SELECT seg, min(doc_id * 65536 + seg_idx) AS rk FROM seg GROUP BY seg
)
SELECT s.doc_id,
       count(*) AS n_kept,
       CAST(sum(s.ntok) AS BIGINT) AS kept_tokens
FROM seg s
JOIN firsts f ON s.seg = f.seg AND s.doc_id * 65536 + s.seg_idx = f.rk
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def q_segment_dedup(sf_dir: str) -> Dataset:
    """RefinedWeb-style segment-exact dedup
    (stages/dedup.py::segment_dedup): first corpus-wide occurrence of
    every 10-token segment wins; per-doc kept stats.  Hash-exact: the
    Ray side groups on an FNV-128 of the segment's byte range (byte-
    identical to the SQL's ' '-joined token slice), ranks/counts are
    pure integers."""
    from hexscape_ray.stages.dedup import segment_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return segment_dedup(ds, width=10)


def q_bpe_merges(sf_dir: str) -> Dataset:
    """BPE tokenizer training (stages/textops.py::bpe_train): corpus
    word-type counts (the only corpus-scale pass) → sequential merge
    loop in one remote task.  Rows-only: the merge sequence is an
    iterative argmax, not SQL-expressible; parity vs an independent
    naive implementation lives in pytest."""
    from hexscape_ray.stages.textops import bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_train(ds, n_merges=40).sort("rank")


def q_bpe_encode(sf_dir: str) -> Dataset:
    """Per-doc BPE piece stats against the learned merge table
    (broadcast once; distinct words memoised per batch)."""
    from hexscape_ray.stages.textops import bpe_encode_stats, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, n_merges=40).to_pandas()
    return bpe_encode_stats(ds, merges).sort("doc_id")


SQL_EMBED_PROJECT = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
),
terms AS (
  SELECT vec_id, js.j, d,
         CAST(floor(1e6 * (CAST(v AS DOUBLE)
                           * (((js.j * 131 + d * 137) % 1009 - 504) / 504.0))
                    + 0.5) AS BIGINT) AS t
  FROM e, (SELECT unnest(range(0, 4)) AS j) js
)
SELECT vec_id, j, CAST(sum(t) AS BIGINT) AS proj_pml
FROM terms GROUP BY vec_id, j
ORDER BY vec_id, j
"""


def q_quality_classifier(sf_dir: str) -> Dataset:
    """Model-based quality scoring (stages/classifier.py): class-
    weighted distributed logistic regression trained on the embeddings
    label column (positive = label 0), then a broadcast scoring pass.
    Rows-only: GD weights are float-summation-order defined, not SQL;
    separable-data quality + in-process parity live in pytest."""
    from hexscape_ray.stages.classifier import score_logreg, train_logreg

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    w = train_logreg(ds, dim=64, iters=30, lr=3.0, pos_weight=9.0)
    return score_logreg(ds, w).sort("vec_id")


def q_embed_project(sf_dir: str) -> Dataset:
    """JL projection (stages/knn.py::jl_project) with a hash-exact SQL
    oracle — the plane matrix has a closed form both engines compute,
    and per-term micro-rounding + integer sums make the float matmul
    order-invariant."""
    from hexscape_ray.stages.knn import jl_project

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return jl_project(ds, k=4).sort(["vec_id", "j"])


def q_doc_compress(sf_dir: str) -> Dataset:
    """Compression-ratio quality signal
    (stages/textops.py::doc_compress_ratio): zlib level-6 deflate per
    doc.  Rows-only (no SQL deflate); direct-zlib parity in pytest."""
    from hexscape_ray.stages.textops import doc_compress_ratio

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_compress_ratio(ds).sort("doc_id")


def q_doc_tfidf(sf_dir: str) -> Dataset:
    """Per-document top-3 TF-IDF terms
    (stages/textops.py::doc_tfidf_top_terms): corpus-streamed document
    frequencies broadcast once, per-doc scoring + local top-k with zero
    data shuffles.  tfidf_pml = floor(1e6·tf·ln(N/df)+0.5) — numpy and
    DuckDB ln agree bit-for-bit on this domain (probed), so the score
    is hash-exact."""
    from hexscape_ray.stages.textops import doc_tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_tfidf_top_terms(ds, k=3).sort(
        ["doc_id", "tfidf_pml", "token"], descending=[False, True, False]
    )


SQL_DOC_TFIDF = """
  WITH tf AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY doc_id, token),
  dft AS (
    SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
  n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  s AS (
    SELECT tf.doc_id, tf.token, tf.tf, dft.df,
           CAST(floor(1e6 * tf.tf * ln(n.n / dft.df) + 0.5) AS BIGINT)
             AS tfidf_pml
    FROM tf JOIN dft USING (token), n),
  r AS (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf_pml DESC, token ASC) AS rk
    FROM s)
  SELECT doc_id, token, tf, df, tfidf_pml
  FROM r WHERE rk <= 3 ORDER BY doc_id, tfidf_pml DESC, token
"""


def q_doc_logprob(sf_dir: str) -> Dataset:
    """Unigram-LM surprisal per document
    (stages/textops.py::doc_unigram_logprob): corpus-trained token
    frequencies broadcast once; per-token micro-rounded −ln p summed as
    INTEGERS so the score is partition-order-invariant and hash-exact
    (summing raw float logprobs would depend on reduction order)."""
    from hexscape_ray.stages.textops import doc_unigram_logprob

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_unigram_logprob(ds)


SQL_DOC_LOGPROB = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
  census AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
  total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM census),
  per_tok AS (
    SELECT tok.doc_id,
           CAST(floor(1e6 * ln(total.t / census.c) + 0.5) AS BIGINT) AS nll
    FROM tok JOIN census USING (token), total)
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(nll) AS BIGINT) AS nll_pml_sum,
         CAST(sum(nll) // count(*) AS BIGINT) AS mean_nll_pml
  FROM per_tok GROUP BY doc_id ORDER BY doc_id
"""


def q_bm25_topk(sf_dir: str) -> Dataset:
    """BM25 top-10 retrieval for 3 fixed term queries
    (stages/textops.py::bm25_topk): one census pass (N, avgdl, query-
    term DFs) broadcast once, one scoring pass with per-block partial
    top-k.  Per-(doc, term) contributions are micro-rounded then
    INTEGER-summed, and every float subexpression mirrors the SQL's
    parse tree exactly (e.g. ``tf * (1.2 + 1)``, NOT ``tf * 2.2`` —
    the two literals differ in the last ulp), so the score is
    hash-exact."""
    from hexscape_ray.stages.textops import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, k=10).sort(["query_id", "rank"])


def _sql_bm25() -> str:
    from hexscape_ray.stages.textops import BM25_QUERIES

    vals = ",".join(
        f"({qid},'{t}')" for qid, ts in sorted(BM25_QUERIES.items()) for t in ts
    )
    return f"""
  WITH q(query_id, term) AS (VALUES {vals}),
  terms AS (SELECT DISTINCT term FROM q),
  tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
  dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
  stats AS (
    SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
           (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
             / (SELECT count(*) FROM documents) AS avgdl),
  dfs AS (
    SELECT terms.term,
           CAST(coalesce(count(DISTINCT tok.doc_id), 0) AS DOUBLE) AS df
    FROM terms LEFT JOIN tok ON tok.token = terms.term GROUP BY terms.term),
  tf AS (
    SELECT tok.doc_id, terms.term, CAST(count(*) AS BIGINT) AS tf
    FROM tok JOIN terms ON tok.token = terms.term GROUP BY 1, 2),
  contrib AS (
    SELECT q.query_id, tf.doc_id,
           CAST(floor(1e6 * (ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
                             * (tf.tf * (1.2 + 1))
                             / (tf.tf + 1.2 * (1 - 0.75
                                               + 0.75 * dl.dl / stats.avgdl)))
                      + 0.5) AS BIGINT) AS c
    FROM tf
    JOIN q ON q.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats, dfs
    WHERE dfs.term = tf.term),
  scores AS (
    SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_pml
    FROM contrib GROUP BY query_id, doc_id),
  ranked AS (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score_pml DESC, doc_id ASC) AS rank
    FROM scores)
  SELECT query_id, doc_id, score_pml, CAST(rank AS BIGINT) AS rank
  FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


SQL_BM25_TOPK = _sql_bm25()


def _lang_census_from(ds: Dataset) -> Dataset:
    """Shared downstream for the format-ingest parity queries: per-lang
    doc count + total chars (dtype-normalised — JSON/CSV readers may
    widen ints)."""

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"].cast(pa.string()),
                "n_chars": batch["n_chars"].cast(pa.int64()),
            }
        )

    out = two_phase_sum(
        ds.map_batches(norm, batch_format="pyarrow"),
        ["lang"],
        ["n_chars"],
        count_as="n_docs",
    )
    return out.rename_columns({"n_chars": "len_sum"}).sort("lang")


SQL_INGEST_CENSUS = """
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS len_sum,
         count(*) AS n_docs
  FROM documents GROUP BY lang ORDER BY lang
"""


def q_ingest_jsonl(sf_dir: str) -> Dataset:
    """FORMAT-INGEST parity (JSONL): the documents projection exported
    once to sharded JSON-lines (cached fixture), read back with
    ``ray.data.read_json`` and aggregated — hash-identical to the SQL
    census over the parquet original, proving the JSONL source surface
    feeds the same pipeline unchanged."""
    import ray.data as rd

    from hexscape_ray.sources.readers import export_documents_text_formats

    jsonl_dir, _ = export_documents_text_formats(sf_dir)
    return _lang_census_from(rd.read_json(jsonl_dir))


def q_ingest_csv(sf_dir: str) -> Dataset:
    """FORMAT-INGEST parity (CSV): same as q_ingest_jsonl via
    ``ray.data.read_csv``."""
    import ray.data as rd

    from hexscape_ray.sources.readers import export_documents_text_formats

    _, csv_dir = export_documents_text_formats(sf_dir)
    return _lang_census_from(rd.read_csv(csv_dir))


def q_curation_v2(sf_dir: str) -> Dataset:
    """Curation flow built from the ORACLE-EXACT round-4 ops, so the
    whole composition hash-checks end-to-end (the original
    curation_pipeline is the rows-only per-hex story): unigram-LM
    surprisal gate (drop the most surprising 'junk' tail,
    mean_nll_pml > threshold) → exact dedup (keep min doc id per
    content) → per-lang accounting of survivors (docs, tokens,
    total surprisal).  Zero extra shuffles beyond the ops' own: the LM
    score and the dedup keeper mark both ride broadcast/semi-join
    passes."""
    from hexscape_ray.stages.dedup import exact_dedup
    from hexscape_ray.stages.joins import adaptive_join
    from hexscape_ray.stages.textops import doc_unigram_logprob

    thr = 3_410_000  # mean_nll_pml gate — ~p90 of the corpus (drops the tail)
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    scored = doc_unigram_logprob(ds)

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["mean_nll_pml"], thr)
        return batch.filter(keep)

    kept_scores = scored.map_batches(gate, batch_format="pyarrow")
    # dedup keepers: min doc id per content over the FULL corpus (the
    # gate is per-doc; duplicates share text hence share the gate
    # decision, so restricting dedup to gated docs equals the SQL).
    # Both attachments are BUCKETED joins — keeper ids and the lang
    # column are corpus-sized, so neither may land on the driver — and
    # every lazy side passes its schema explicitly (the execution
    # contract: no schema probe, no materialise, ONE real pass each).
    score_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("nll_pml_sum", pa.int64()),
            ("mean_nll_pml", pa.int64()),
        ]
    )
    keepers = exact_dedup(ds).select_columns(["doc_id"])
    survivors = adaptive_join(
        kept_scores,
        keepers,
        on="doc_id",
        how="semi",
        big_schema=score_schema,
        side_schema=pa.schema([("doc_id", pa.int64())]),
    )
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = adaptive_join(
        survivors,
        langs,
        on="doc_id",
        big_schema=score_schema,
    )
    res = two_phase_sum(
        out.map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n_tokens": t["n_tokens"],
                    "nll_pml_sum": t["nll_pml_sum"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["lang"],
        ["n_tokens", "nll_pml_sum"],
        count_as="n_docs",
    )
    return res.sort("lang")


SQL_CURATION_V2 = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
  census AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
  total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM census),
  per_tok AS (
    SELECT tok.doc_id,
           CAST(floor(1e6 * ln(total.t / census.c) + 0.5) AS BIGINT) AS nll
    FROM tok JOIN census USING (token), total),
  scored AS (
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(nll) AS BIGINT) AS nll_pml_sum,
           CAST(sum(nll) // count(*) AS BIGINT) AS mean_nll_pml
    FROM per_tok GROUP BY doc_id),
  keepers AS (
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text)
  SELECT d.lang,
         CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
         CAST(sum(s.nll_pml_sum) AS BIGINT) AS nll_pml_sum,
         count(*) AS n_docs
  FROM scored s
  JOIN keepers k ON k.doc_id = s.doc_id
  JOIN documents d ON d.doc_id = s.doc_id
  WHERE s.mean_nll_pml <= 3410000
  GROUP BY d.lang ORDER BY d.lang
"""


def q_doc_logprob2(sf_dir: str) -> Dataset:
    """Interpolated BIGRAM-LM surprisal per document
    (stages/textops.py::doc_bigram_logprob): token 1 scores unigram,
    later tokens p = 0.8·c12/c1 + (1−0.8)·c2/T — the (1−0.8) form is
    deliberate, the literal 0.2 parses to a DIFFERENT double.  Same
    micro-round-then-integer-sum construction as doc_logprob, so
    hash-exact under any partitioning."""
    from hexscape_ray.stages.textops import doc_bigram_logprob

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return doc_bigram_logprob(ds)


SQL_DOC_LOGPROB2 = """
  WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
  tok AS (
    SELECT doc_id, unnest(l) AS tok,
           unnest(range(1, len(l) + 1)) AS pos
    FROM d),
  uni AS (SELECT tok AS g, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
  total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni),
  big AS (
    SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c12
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2),
  per AS (
    SELECT t.doc_id,
           CASE WHEN t.pos = 1 THEN
             CAST(floor(1e6 * ln(total.t / u.c) + 0.5) AS BIGINT)
           ELSE
             CAST(floor(1e6 * (- ln(0.8 * bg.c12 / up.c
                                    + (1 - 0.8) * u.c / total.t))
                        + 0.5) AS BIGINT)
           END AS nll
    FROM tok t
    JOIN uni u ON u.g = t.tok
    LEFT JOIN tok prev ON prev.doc_id = t.doc_id AND prev.pos = t.pos - 1
    LEFT JOIN uni up ON up.g = prev.tok
    LEFT JOIN big bg ON bg.w1 = prev.tok AND bg.w2 = t.tok,
    total)
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(nll) AS BIGINT) AS nll2_pml_sum,
         CAST(sum(nll) // count(*) AS BIGINT) AS mean_nll2_pml
  FROM per GROUP BY doc_id ORDER BY doc_id
"""


def q_dedup_exact_stream(sf_dir: str):
    """STREAMING exact dedup (stages/streaming.py::streaming_exact_dedup):
    incremental per-shard content-hash state, distributed router
    ingest, no ordering machinery (min/count commute) — same output
    and SAME SQL oracle as the batch ``dedup_exact``."""
    from hexscape_ray.stages.streaming import streaming_exact_dedup

    return streaming_exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_minhash_pairs_stream(sf_dir: str):
    """STREAMING MinHash-LSH near-dup candidates
    (stages/streaming.py::streaming_lsh_pairs): incremental per-shard
    bucket state + mid-stream candidate probe; output bit-identical to
    the batch minhash_candidate_pairs (pytest-asserted)."""
    from hexscape_ray.stages.streaming import streaming_lsh_pairs

    return streaming_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_sink_roundtrip(sf_dir: str) -> Dataset:
    """SINK parity: the per-source census written to HIVE-partitioned
    parquet (``lang=<v>/`` directories — the resumable-output layout a
    100-TB run needs: a restart skips finished partitions), then read
    back with partition-column recovery and re-aggregated to the
    per-lang census — hash-identical to the direct SQL census.  Proves
    write_parquet(partition_cols) → read_parquet round-trips values,
    dtypes and partition keys."""
    import os
    import shutil

    import ray.data as rd

    docs = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    fine = two_phase_sum(docs, ["source", "lang"], ["n_chars"], count_as="n_docs")
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/hexray_sink/{tag}"
    shutil.rmtree(out, ignore_errors=True)
    fine.write_parquet(out, partition_cols=["lang"])
    back = rd.read_parquet(out)

    def norm(batch: pa.Table) -> pa.Table:
        # partition columns come back as dictionary/string — normalise
        return pa.table(
            {
                "lang": batch["lang"].cast(pa.string()),
                "n_chars": batch["n_chars"].cast(pa.int64()),
                "n_docs": batch["n_docs"].cast(pa.int64()),
            }
        )

    out_ds = two_phase_sum(
        back.map_batches(norm, batch_format="pyarrow"),
        ["lang"],
        ["n_chars", "n_docs"],
        count_as=None,
    )
    return out_ds.rename_columns({"n_chars": "len_sum"}).sort("lang")


def q_quantize_int8(sf_dir: str) -> Dataset:
    """Per-vector symmetric INT8 quantisation of the embeddings table
    (stages/knn.py::quantize_embeddings_int8).  The oracle checks the
    order-free integer summary — scale_pml, Σq, Σ|q|, saturation count
    (per-element half-up rounding then integer sums; the codes column
    itself is dropped for the compare)."""
    from hexscape_ray.stages.knn import quantize_embeddings_int8

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (
        quantize_embeddings_int8(emb)
        .select_columns(["vec_id", "scale_pml", "sum_q", "sum_abs_q", "n_sat"])
        .sort("vec_id")
    )


SQL_QUANTIZE_INT8 = """
  WITH e AS (
    SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
  s AS (SELECT vec_id, max(abs(x)) AS scale FROM e GROUP BY vec_id),
  q AS (
    SELECT e.vec_id,
           CAST(floor(CASE WHEN s.scale > 0 THEN e.x * 127.0 / s.scale
                           ELSE 0 END + 0.5) AS BIGINT) AS q
    FROM e JOIN s USING (vec_id))
  SELECT q.vec_id,
         CAST(floor(1e6 * s.scale + 0.5) AS BIGINT) AS scale_pml,
         CAST(sum(q.q) AS BIGINT) AS sum_q,
         CAST(sum(abs(q.q)) AS BIGINT) AS sum_abs_q,
         CAST(sum(CASE WHEN abs(q.q) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
  FROM q JOIN s USING (vec_id)
  GROUP BY q.vec_id, s.scale ORDER BY q.vec_id
"""


def q_semantic_dedup(sf_dir: str) -> Dataset:
    """SemDeDup embedding-space dedup (stages/dedup.py::semantic_dedup):
    spherical k-means clusters, then drop in-cluster vectors whose
    cosine to a lower-id member exceeds the threshold.  Rows-only
    (iterative float clustering); determinism + brute-force parity in
    pytest."""
    from hexscape_ray.stages.dedup import semantic_dedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(emb, k=4, threshold=0.25).sort("vec_id")


_Q3_CUT_US = int(np.datetime64("1999-06-30", "us").astype(np.int64))


def q_shipping_priority(sf_dir: str) -> Dataset:
    """TPC-H Q3-shaped THREE-WAY large join with a distributed top-k:
    customers of one market segment → their orders placed before a
    cutoff date → lineitems shipped after it, revenue per order,
    top 10 by revenue (deterministic tie-break: orderdate, orderkey).

    Scale shape: the segment filter runs before any shuffle; orders
    pass a bucketed SEMI join against the filtered customer keys (no
    customer payload moves); the big lineitem side carries only
    (orderkey, revenue_c100) through ONE bucketed hash join; the
    top-k is per-block partial top-10 → one-task final merge — no
    global sort of the aggregate."""
    from hexscape_ray.stages.joins import adaptive_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table(
            {"c_custkey": b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))["c_custkey"]}
        ),
        batch_format="pyarrow",
    )

    def prep_o(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64())
        t = batch.filter(pc.less(us, _Q3_CUT_US))
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "odate_us": t["o_orderdate"].cast(pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(prep_o, batch_format="pyarrow")
    o_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("odate_us", pa.int64()),
            ("o_orderpriority", pa.string()),
        ]
    )
    o_filt = adaptive_join(
        orders,
        cust,
        on="c_custkey",
        how="semi",
        big_schema=o_schema,
        side_schema=pa.schema([("c_custkey", pa.int64())]),
    ).map_batches(
        lambda b: b.drop_columns(["c_custkey"]), batch_format="pyarrow"
    )

    def prep_l(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = us > _Q3_CUT_US
        t = batch.filter(pa.array(keep))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        ext_cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        disc_pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "revenue_c100": pa.array(ext_cents * (100 - disc_pct)),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(prep_l, batch_format="pyarrow")
    joined = adaptive_join(
        li,
        o_filt,
        on="o_orderkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("revenue_c100", pa.int64())]),
        side_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("odate_us", pa.int64()), ("o_orderpriority", pa.string())]
        ),
    )
    agg = two_phase_sum(
        joined.select_columns(["o_orderkey", "odate_us", "o_orderpriority", "revenue_c100"]),
        ["o_orderkey", "odate_us", "o_orderpriority"],
        ["revenue_c100"],
        count_as="n_items",
    )

    def topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        rev = batch["revenue_c100"].to_numpy(zero_copy_only=False)
        od = batch["odate_us"].to_numpy(zero_copy_only=False)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, -rev))[:10]
        return batch.take(pa.array(order))

    return agg.map_batches(topk, batch_format="pyarrow").repartition(1).map_batches(
        topk, batch_format="pyarrow"
    )


SQL_SHIPPING_PRIORITY = """
  SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT)
           AS revenue_c100,
         count(*) AS n_items
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1999-06-30'
    AND l_shipdate  > TIMESTAMP '1999-06-30'
  GROUP BY 1, 2, 3
  ORDER BY revenue_c100 DESC, odate_us, o_orderkey
  LIMIT 10
"""


def q_region_supplier_volume(sf_dir: str) -> Dataset:
    """TPC-H Q5-shaped FOUR-JOIN pipeline mixing all three join
    strategies by side size: orders(date-filtered) ⋈ customer and
    lineitem ⋈ supplier are bucketed hash joins (both sides scale
    with SF), the joined facts meet on orderkey in a third bucketed
    join, and the ~30-row nation⋈region dimension is a DRIVER-side
    lookup pushed into the final filter (broadcast, never shuffled).
    Local-supplier constraint: customer and supplier nation must
    match and lie in the chosen region."""
    from hexscape_ray.stages.joins import adaptive_join

    nat = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in _tiny_rows(sf_dir, "nation")
    }
    asia = {
        r["r_regionkey"]
        for r in _tiny_rows(sf_dir, "region")
        if r["r_name"] == "ASIA"
    }
    in_region = sorted(k for k, (_, rk) in nat.items() if rk in asia)
    # dense lookup: nationkey → name (nation keys are small ints)
    max_nk = max(nat) if nat else 0
    names = np.array([nat.get(i, ("", -1))[0] for i in range(max_nk + 1)], dtype=object)
    in_set = np.zeros(max_nk + 1, dtype=bool)
    in_set[np.array(in_region, dtype=np.int64)] = True

    lo = int(np.datetime64("1997-01-01", "us").astype(np.int64))
    hi = int(np.datetime64("1998-01-01", "us").astype(np.int64))

    def prep_o(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((us >= lo) & (us < hi)))
        return pa.table({"o_orderkey": t["o_orderkey"], "c_custkey": t["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        prep_o, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o_c = adaptive_join(
        orders,
        cust,
        on="c_custkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("c_custkey", pa.int64())]),
    ).map_batches(lambda b: b.drop_columns(["c_custkey"]), batch_format="pyarrow")

    def prep_l(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        ext_cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        disc_pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "s_suppkey": batch["l_suppkey"],
                "revenue_c100": pa.array(ext_cents * (100 - disc_pct)),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
        prep_l, batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    l_s = adaptive_join(
        li,
        supp,
        on="s_suppkey",
        big_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("s_suppkey", pa.int64()), ("revenue_c100", pa.int64())]
        ),
    ).map_batches(lambda b: b.drop_columns(["s_suppkey"]), batch_format="pyarrow")

    facts = adaptive_join(
        l_s,
        o_c,
        on="o_orderkey",
        big_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("revenue_c100", pa.int64()), ("s_nationkey", pa.int32())]
        ),
        side_schema=pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int32())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = (cn == sn) & (sn <= max_nk) & in_set[np.minimum(sn, max_nk)]
        t = batch.filter(pa.array(keep))
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(names[nk].astype(str)),
                "revenue_c100": t["revenue_c100"],
            }
        )

    out = two_phase_sum(
        facts.map_batches(finish, batch_format="pyarrow"),
        ["n_name"],
        ["revenue_c100"],
        count_as="n_items",
    )
    return out.sort("n_name")


SQL_REGION_SUPPLIER_VOLUME = """
  SELECT n_name,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT)
           AS revenue_c100,
         count(*) AS n_items
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND c_nationkey = s_nationkey
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY n_name
  ORDER BY n_name
"""


_GOPHER_STOPS = ("the", "a", "and", "of", "to", "in", "is", "that", "with", "for")


def q_gopher_filter(sf_dir: str) -> Dataset:
    """Gopher-rules document quality gate (Rae et al. 2021, public):
    keep a document iff word count ∈ [40, 80], mean word length
    ∈ [4, 10], and it contains ≥ 2 distinct stop words.  All three
    predicates are evaluated in EXACT integer arithmetic (the mean
    bound via cross-multiplication, 4·n ≤ Σlen ≤ 10·n) so the SQL
    oracle is bit-checkable; counting is vectorised RE2
    (`count_substring_regex`) — token runs `\\S+`, their total length
    `\\S`, and one `\\b`-bounded presence pass per stop word.  Same
    single-space `[a-z0-9 ]` corpus assumption as
    SQL_DOC_QUALITY_EXACT (under it, `\\S+` runs == string_split
    tokens).  Stateless per-batch → embarrassingly parallel at any
    scale."""

    def score(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        n = len(batch)
        n_tok = _creg(txt, r"\S+")
        sum_len = _creg(txt, r"\S")
        n_stop = np.zeros(n, dtype=np.int64)
        for sw in _GOPHER_STOPS:
            n_stop += (_creg(txt, rf"\b{sw}\b") > 0).astype(np.int64)
        keep = (
            (n_tok >= 40)
            & (n_tok <= 80)
            & (4 * n_tok <= sum_len)
            & (sum_len <= 10 * n_tok)
            & (n_stop >= 2)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(n_tok),
                "sum_len": pa.array(sum_len),
                "n_stop": pa.array(n_stop),
                "keep": pa.array(keep),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


SQL_GOPHER_FILTER = """
  WITH t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
             AS sum_len,
           CAST(len(list_distinct(list_filter(string_split(text, ' '),
                x -> x IN ('the','a','and','of','to','in','is','that','with',
                           'for')))) AS BIGINT) AS n_stop
    FROM documents
  )
  SELECT doc_id, n_tok, sum_len, n_stop,
         CAST(CASE WHEN n_tok BETWEEN 40 AND 80
                    AND 4 * n_tok <= sum_len AND sum_len <= 10 * n_tok
                    AND n_stop >= 2
               THEN 1 ELSE 0 END AS BIGINT) AS keep
  FROM t
"""


def q_large_volume_customers(sf_dir: str) -> Dataset:
    """TPC-H Q18-shaped AGGREGATE-THEN-JOIN-BACK: per-order quantity
    sums (partials-only shuffle), HAVING-filter to the heavy orders,
    then join the small qualifying set back through orders and
    customer for attribution.  The heavy-hitter set is tiny by
    construction, so both join-backs move only qualifying keys — the
    full lineitem table is touched exactly once."""
    from hexscape_ray.stages.joins import adaptive_join

    def prep_l(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        prep_l, batch_format="pyarrow"
    )
    qual = two_phase_sum(li, ["o_orderkey"], ["qty"], count_as="n_items").map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "sum_qty": t["qty"],
                "n_items": t["n_items"],
            }
        ).filter(pc.greater_equal(t["qty"], 265)),
        batch_format="pyarrow",
    )

    def prep_o(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "c_custkey": batch["o_custkey"],
                "odate_us": batch["o_orderdate"].cast(pa.int64()),
                "total_cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(prep_o, batch_format="pyarrow")
    j1 = adaptive_join(
        orders,
        qual,
        on="o_orderkey",
        big_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("c_custkey", pa.int64()),
                ("odate_us", pa.int64()),
                ("total_cents", pa.int64()),
            ]
        ),
        side_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("sum_qty", pa.int64()), ("n_items", pa.int64())]
        ),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return adaptive_join(
        j1,
        cust,
        on="c_custkey",
        big_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("c_custkey", pa.int64()),
                ("odate_us", pa.int64()),
                ("total_cents", pa.int64()),
                ("sum_qty", pa.int64()),
                ("n_items", pa.int64()),
            ]
        ),
    ).select_columns(
        ["c_name", "c_custkey", "o_orderkey", "odate_us", "total_cents", "sum_qty", "n_items"]
    )


SQL_LARGE_VOLUME_CUSTOMERS = """
  WITH q AS (
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
    HAVING sum_qty >= 265
  )
  SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS odate_us,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
         q.sum_qty, q.n_items
  FROM q
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
"""


def q_pagerank(sf_dir: str) -> Dataset:
    """ORACLE-CHECKED distributed PageRank (3 iterations, d=0.85) over
    the bipartite customer↔supplier trade graph — the iterative
    graph-analytics companion to `copurchase_components`.  Every rank
    is a micro-scaled int64 and every step floors
    (`stages/graph.py::pagerank`), so the SQL oracle replays the exact
    iterations as three unrolled join+aggregate CTEs — a bit-exact
    hash check on an ITERATIVE distributed algorithm.  Node ids:
    customer = 2·custkey, supplier = 2·suppkey+1 (disjoint key
    spaces)."""
    from hexscape_ray.stages.graph import pagerank
    from hexscape_ray.stages.joins import adaptive_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "suppnode": pc.add(pc.multiply(t["l_suppkey"], 2), 1),
            }
        ),
        batch_format="pyarrow",
    )
    # lineitem is the big side; orders is the dim-sized side at bench
    # scale (broadcast) and co-partitions past the row budget at 100x
    trade = adaptive_join(
        li,
        orders,
        on="o_orderkey",
        big_schema=pa.schema([("o_orderkey", pa.int64()), ("suppnode", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {"u": pc.multiply(t["o_custkey"], 2), "v": t["suppnode"]}
        ),
        batch_format="pyarrow",
    )
    pairs = two_phase_sum(trade, ["u", "v"], [], count_as="__n")

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
            }
        )

    edges = pairs.select_columns(["u", "v"]).map_batches(
        symmetrize, batch_format="pyarrow"
    )
    return pagerank(edges, n_iter=3, damping_pct=85).sort("node")


SQL_PAGERANK = """
  WITH pairs AS (
    SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
  edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
  deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
  r0 AS (SELECT node, d, CAST(1000000 AS BIGINT) AS r FROM deg),
  s1 AS (SELECT e.v AS node, CAST(sum(r0.r // r0.d) AS BIGINT) AS s
         FROM edges e JOIN r0 ON e.u = r0.node GROUP BY e.v),
  r1 AS (SELECT deg.node, deg.d, CAST(150000 + (85 * s1.s) // 100 AS BIGINT) AS r
         FROM s1 JOIN deg ON deg.node = s1.node),
  s2 AS (SELECT e.v AS node, CAST(sum(r1.r // r1.d) AS BIGINT) AS s
         FROM edges e JOIN r1 ON e.u = r1.node GROUP BY e.v),
  r2 AS (SELECT deg.node, deg.d, CAST(150000 + (85 * s2.s) // 100 AS BIGINT) AS r
         FROM s2 JOIN deg ON deg.node = s2.node),
  s3 AS (SELECT e.v AS node, CAST(sum(r2.r // r2.d) AS BIGINT) AS s
         FROM edges e JOIN r2 ON e.u = r2.node GROUP BY e.v),
  r3 AS (SELECT deg.node, deg.d, CAST(150000 + (85 * s3.s) // 100 AS BIGINT) AS r
         FROM s3 JOIN deg ON deg.node = s3.node)
  SELECT node, r AS rank_micro FROM r3 ORDER BY node
"""


def q_shard_assign(sf_dir: str) -> Dataset:
    """Deterministic SIZE-BALANCED OUTPUT SHARDING — the resumable-
    output primitive: a global byte prefix-sum in doc_id order
    (`stages/agg.py::global_cumsum`, two-level distributed scan), then
    shard = exclusive_prefix // TARGET, so every shard holds ~TARGET
    bytes and the assignment is a pure function of the corpus (a
    re-run assigns identical shards — failed partitions can be
    re-written in isolation).  All-integer → hash-exact vs the SQL
    window cumsum."""
    from hexscape_ray.stages.agg import global_cumsum

    TARGET = 2048
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    n = ds.count()  # parquet metadata for a bare read
    cum = global_cumsum(
        ds, "doc_id", "n_chars", out_col="cum_bytes", n_rows_est=n, order_hi=n
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch["cum_bytes"].to_numpy(zero_copy_only=False)
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.append_column("shard", pa.array((c - v) // TARGET))

    return cum.map_batches(finish, batch_format="pyarrow")


SQL_SHARD_ASSIGN = """
  SELECT doc_id, n_chars,
         CAST(sum(n_chars) OVER w AS BIGINT) AS cum_bytes,
         CAST((sum(n_chars) OVER w - n_chars) // 2048 AS BIGINT) AS shard
  FROM documents
  WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
"""


def q_source_entropy(sf_dir: str) -> Dataset:
    """Per-source Shannon entropy of the language distribution — the
    corpus-diversity signal behind mixture balancing (a skewed source
    has low H).  Hash-exact by the micro-round-then-integer-sum rule:
    each census cell contributes ``n_sl · floor(1e6·ln(n_s/n_sl)+0.5)``
    and ``h_micro = Σ // n_s`` — float ln enters only per-cell on the
    tiny census (numpy↔DuckDB ln bit-parity, probed round 4), never in
    an order-dependent accumulation.  One partials-only census shuffle;
    the (source × lang)-sized finish runs in one remote task."""
    ds = _read(sf_dir, "documents", ["source", "lang"])
    census = two_phase_sum(ds, ["source", "lang"], [], count_as="n")

    def finish(batch: pa.Table):
        pdf = batch.to_pandas()
        tot = pdf.groupby("source")["n"].transform("sum").to_numpy()
        n = pdf["n"].to_numpy()
        nll = np.floor(
            1e6 * np.log(tot.astype(np.float64) / n.astype(np.float64)) + 0.5
        ).astype(np.int64)
        pdf["term"] = n * nll
        g = (
            pdf.groupby("source", sort=True)
            .agg(n_docs=("n", "sum"), s=("term", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy().astype(np.int64)),
                "h_micro": pa.array(
                    g["s"].to_numpy() // g["n_docs"].to_numpy().astype(np.int64)
                ),
            }
        )

    return census.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


SQL_SOURCE_ENTROPY = """
  WITH c AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1, 2),
  t AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM c GROUP BY source)
  SELECT t.source, t.n_docs,
         CAST(sum(c.n * CAST(floor(1e6 * ln(CAST(t.n_docs AS DOUBLE)
                                            / CAST(c.n AS DOUBLE)) + 0.5)
                             AS BIGINT)) // t.n_docs AS BIGINT) AS h_micro
  FROM c JOIN t ON c.source = t.source
  GROUP BY 1, 2 ORDER BY 1
"""


def q_pmi_bigrams(sf_dir: str) -> Dataset:
    """Top-40 adjacent-token bigrams by count with micro-rounded PMI
    (pointwise mutual information — the classic collocation /
    multi-word-expression extractor).  Two partials-only census passes
    (bigrams, unigrams — both vocab-sized, the established census
    pattern); PMI is computed once per surviving bigram with the SQL
    parse tree mirrored term-for-term:
    ``ln((c12·T·T) / (B·c1·c2))`` over DOUBLE casts, micro-rounded.
    Deterministic tie-break (c12 desc, w1, w2)."""
    ds = _read(sf_dir, "documents", ["text"])

    def bigrams(batch: pa.Table) -> pa.Table:
        w1: list[str] = []
        w2: list[str] = []
        for t in batch["text"].to_pylist():
            toks = t.split(" ")
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        return pa.table(
            {
                "w1": pa.array(w1, type=pa.string()),
                "w2": pa.array(w2, type=pa.string()),
            }
        )

    def unigrams(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(t.split(" "))
        return pa.table({"w": pa.array(toks, type=pa.string())})

    big = two_phase_sum(
        ds.map_batches(bigrams, batch_format="pyarrow"), ["w1", "w2"], [], count_as="c12"
    ).to_pandas()
    uni = two_phase_sum(
        ds.map_batches(unigrams, batch_format="pyarrow"), ["w"], [], count_as="c"
    ).to_pandas()
    T = float(uni["c"].sum())
    B = float(big["c12"].sum())
    cnt = dict(zip(uni["w"], uni["c"]))
    c1 = big["w1"].map(cnt).to_numpy(dtype=np.float64)
    c2 = big["w2"].map(cnt).to_numpy(dtype=np.float64)
    c12f = big["c12"].to_numpy(dtype=np.float64)
    pmi = np.floor(1e6 * np.log((c12f * T * T) / (B * c1 * c2)) + 0.5).astype(np.int64)
    big = big.assign(pmi_pml=pmi).sort_values(
        ["c12", "w1", "w2"], ascending=[False, True, True], ignore_index=True
    )[:40]
    import ray

    return ray.data.from_arrow(
        pa.Table.from_pandas(
            big[["w1", "w2", "c12", "pmi_pml"]], preserve_index=False
        )
    )


SQL_PMI_BIGRAMS = """
  WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
  tok AS (
    SELECT doc_id, unnest(l) AS tok,
           unnest(range(1, len(l) + 1)) AS pos
    FROM d),
  uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
  tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni),
  big AS (
    SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c12
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2),
  btot AS (SELECT CAST(sum(c12) AS DOUBLE) AS b FROM big)
  SELECT big.w1, big.w2, big.c12,
         CAST(floor(1e6 * ln((CAST(big.c12 AS DOUBLE) * tot.t * tot.t)
                             / (btot.b * CAST(u1.c AS DOUBLE)
                                * CAST(u2.c AS DOUBLE))) + 0.5) AS BIGINT)
           AS pmi_pml
  FROM big
  JOIN uni u1 ON u1.w = big.w1
  JOIN uni u2 ON u2.w = big.w2, tot, btot
  ORDER BY big.c12 DESC, big.w1, big.w2
  LIMIT 40
"""


def q_hex_triangles(sf_dir: str) -> Dataset:
    """Mutual-adjacency MOTIF census on the occupied-hex lattice graph
    (hex centres form a triangular lattice, so its adjacency graph is
    triangle-rich): for every occupied cell, whether it anchors the
    up-triangle {c, c+(q1,r0), c+(q0,r1)} and/or the down-triangle
    {c, c+(q1,r0), c+(q1,r−1)} of fully-occupied cells — each lattice
    triangle has exactly one anchor of its shape, so Σ(tri_up+tri_down)
    IS the graph's triangle count.  Membership tests ride a sorted
    int-key broadcast + vectorised searchsorted (per-hex tables are
    landscape-bounded — the hex_kring precedent); the general
    degree-oriented wedge-join formulation is only needed off-lattice."""
    cells = q_hex_doc_counts(sf_dir).select_columns(["r", "q"])
    kdf = cells.to_pandas()
    OFF, SH = 1 << 20, 21

    def enc(q: np.ndarray, r: np.ndarray) -> np.ndarray:
        return (q.astype(np.int64) + OFF) * (1 << SH) + (r.astype(np.int64) + OFF)

    keys = np.sort(enc(kdf["q"].to_numpy(), kdf["r"].to_numpy()))
    kref = ray.put(keys)

    def mark(batch: pa.Table) -> pa.Table:
        arr = ray.get(kref)

        def member(qq: np.ndarray, rr: np.ndarray) -> np.ndarray:
            k = enc(qq, rr)
            i = np.searchsorted(arr, k)
            i_c = np.minimum(i, arr.size - 1)
            return (i < arr.size) & (arr[i_c] == k)

        r = batch["r"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        e = member(q + 1, r)  # shared edge endpoint c+(1,0)
        up = (e & member(q, r + 1)).astype(np.int64)
        down = (e & member(q + 1, r - 1)).astype(np.int64)
        return pa.table(
            {
                "r": batch["r"],
                "q": batch["q"],
                "tri_up": pa.array(up),
                "tri_down": pa.array(down),
            }
        )

    return cells.map_batches(mark, batch_format="pyarrow")


SQL_HEX_TRIANGLES = (
    _hex_cte("documents", "doc_id", "doc_id")
    + """
  , cells AS (SELECT DISTINCT r, q FROM hexed)
  SELECT c.r, c.q,
         CAST(CASE WHEN a1.r IS NOT NULL AND a2.r IS NOT NULL
               THEN 1 ELSE 0 END AS BIGINT) AS tri_up,
         CAST(CASE WHEN a1.r IS NOT NULL AND a3.r IS NOT NULL
               THEN 1 ELSE 0 END AS BIGINT) AS tri_down
  FROM cells c
  LEFT JOIN cells a1 ON a1.q = c.q + 1 AND a1.r = c.r
  LEFT JOIN cells a2 ON a2.q = c.q     AND a2.r = c.r + 1
  LEFT JOIN cells a3 ON a3.q = c.q + 1 AND a3.r = c.r - 1
  ORDER BY c.r, c.q
"""
)


_PROF_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROF_KMV = ["l_orderkey", "l_partkey", "l_suppkey"]
_PROF_STR = ["l_returnflag", "l_linestatus"]
_PROF_K = 256


def q_profile_lineitem(sf_dir: str) -> Dataset:
    """Distributed TABLE PROFILER — the data-quality pass a pipeline
    runs before committing to a 100-TB read: per numeric column n /
    n_null / min / max / sum (micro-scaled ints, exact), per key
    column an approximate distinct count via the mergeable KMV sketch
    (deterministic given the splitmix64 member hash, so BIT-EXACT in
    SQL — the distinct_users_sketch machinery), per label column the
    exact distinct count (two-level, no global set).  ONE streaming
    pass emits all numeric+KMV partials as a long (col, metric, value)
    table — the shuffle carries ≤ (5·num + K·kmv) rows per block
    however wide the table; the string distincts are two extra
    key-census passes.  Output: long-format (col_name, metric, value),
    everything int64."""
    from hexscape_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "lineitem", _PROF_NUM + _PROF_KMV + _PROF_STR)

    def partials(batch: pa.Table) -> pa.Table:
        cols: list[str] = []
        mets: list[str] = []
        vals: list[int] = []
        n = len(batch)
        for c in _PROF_NUM:
            arr = batch[c]
            v = arr.to_numpy(zero_copy_only=False)
            micro = np.floor(v * 1e6 + 0.5).astype(np.int64)
            nn = arr.null_count
            for m, x in (
                ("n", n),
                ("n_null", nn),
                ("min_micro", int(micro.min()) if n else 0),
                ("max_micro", int(micro.max()) if n else 0),
                ("sum_micro", int(micro.sum())),
            ):
                cols.append(c)
                mets.append(m)
                vals.append(int(x))
        for c in _PROF_KMV:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = np.unique(splitmix64(v))[:_PROF_K]
            cols.extend([c] * h.size)
            mets.extend(["kmv"] * h.size)
            vals.extend(h.astype(np.int64).tolist())
        return pa.table(
            {
                "col_name": pa.array(cols, type=pa.string()),
                "metric": pa.array(mets, type=pa.string()),
                "value": pa.array(np.asarray(vals, dtype=np.int64)),
            }
        )

    long_partials = ds.map_batches(partials, batch_format="pyarrow")

    def combine(batch: pa.Table):
        pdf = batch.to_pandas()
        out_c, out_m, out_v = [], [], []
        for (c, m), g in pdf.groupby(["col_name", "metric"], sort=True):
            v = g["value"].to_numpy()
            if m == "kmv":
                uniq = np.unique(v.astype(np.uint64))[:_PROF_K]
                if uniq.size < _PROF_K:
                    est = int(uniq.size) * 1_000_000
                else:
                    kth = uniq[-1].astype(np.float64) / 18446744073709551616.0
                    est = int(np.floor(1e6 * (float(_PROF_K - 1) / kth) + 0.5))
                out_c.append(c)
                out_m.append("distinct_kmv_pml")
                out_v.append(est)
            elif m == "min_micro":
                out_c.append(c); out_m.append(m); out_v.append(int(v.min()))
            elif m == "max_micro":
                out_c.append(c); out_m.append(m); out_v.append(int(v.max()))
            else:
                out_c.append(c); out_m.append(m); out_v.append(int(v.sum()))
        return pa.table(
            {
                "col_name": pa.array(out_c, type=pa.string()),
                "metric": pa.array(out_m, type=pa.string()),
                "value": pa.array(np.asarray(out_v, dtype=np.int64)),
            }
        )

    prof = long_partials.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    # string distincts: exact two-level census count, one per column
    extras = []
    for c in _PROF_STR:
        lvl1 = two_phase_sum(
            ds.select_columns([c]), [c], [], count_as="__n"
        ).select_columns([c])
        cnt = two_phase_sum(
            lvl1.map_batches(
                lambda t, cc=c: pa.table(
                    {
                        "col_name": pa.array([cc] * len(t), type=pa.string()),
                        "metric": pa.array(["distinct_exact"] * len(t), type=pa.string()),
                        "value": pa.array(np.ones(len(t), dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["col_name", "metric"],
            ["value"],
            count_as=None,
        )
        extras.append(cnt)
    out = prof
    for e in extras:
        out = out.union(e)
    return out.sort(["col_name", "metric"])


def _prof_kmv_sql(col: str) -> str:
    return f"""
  SELECT '{col}' AS col_name, 'distinct_kmv_pml' AS metric,
         CASE WHEN max(nd) < {_PROF_K} THEN CAST(max(nd) * 1000000 AS BIGINT)
              ELSE CAST(floor(1e6 * ({_PROF_K - 1}.0 /
                     (CAST(max(CASE WHEN rn = {_PROF_K} THEN h END) AS DOUBLE)
                      / 18446744073709551616.0)) + 0.5) AS BIGINT)
         END AS value
  FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn, count(*) OVER () AS nd
    FROM ({_splitmix64_sql("x", carry="__k",
                           src=f"(SELECT DISTINCT 1 AS __k, CAST({col} AS HUGEINT) AS x FROM lineitem)")})
  ) WHERE rn <= {_PROF_K}
"""


def _prof_num_sql(col: str) -> str:
    micro = f"CAST(floor({col} * 1e6 + 0.5) AS BIGINT)"
    return f"""
  SELECT '{col}', 'n', CAST(count(*) AS BIGINT) FROM lineitem
  UNION ALL SELECT '{col}', 'n_null',
    CAST(count(*) - count({col}) AS BIGINT) FROM lineitem
  UNION ALL SELECT '{col}', 'min_micro', min({micro}) FROM lineitem
  UNION ALL SELECT '{col}', 'max_micro', max({micro}) FROM lineitem
  UNION ALL SELECT '{col}', 'sum_micro', CAST(sum({micro}) AS BIGINT) FROM lineitem
"""


SQL_PROFILE_LINEITEM = (
    "SELECT col_name, metric, value FROM (\n"
    + "\nUNION ALL".join(
        [_prof_num_sql(c) for c in _PROF_NUM]
        + [_prof_kmv_sql(c) for c in _PROF_KMV]
        + [
            f"\n  SELECT '{c}', 'distinct_exact', CAST(count(DISTINCT {c}) AS BIGINT) FROM lineitem"
            for c in _PROF_STR
        ]
    )
    + "\n) t(col_name, metric, value) ORDER BY col_name, metric"
)


def q_kfold_split(sf_dir: str, k: int = 5) -> Dataset:
    """Deterministic K-FOLD cross-validation assignment — the
    companion to train_val_test_split: fold = a second splitmix-free
    Knuth hash of the doc id modulo k (stable under any partitioning;
    disjoint from the 80/10/10 hash by a different stream: the id is
    offset before multiplying so fold and split assignments are
    decorrelated).  Per-fold census (docs, chars) proves balance;
    per-doc assignment is a pure function of the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def fold(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((did + np.uint64(7)) * np.uint64(2246822519)) % np.uint64(4294967296)
        f = (h % np.uint64(k)).astype(np.int64)
        return pa.table({"fold": pa.array(f), "n_chars": batch["n_chars"]})

    return (
        two_phase_sum(
            ds.map_batches(fold, batch_format="pyarrow"),
            ["fold"],
            ["n_chars"],
            count_as="n_docs",
        )
        .rename_columns({"n_chars": "len_sum"})
        .sort("fold")
    )


SQL_KFOLD_SPLIT = """
  WITH s AS (
    SELECT n_chars,
      CAST((((CAST(doc_id AS HUGEINT) + 7) * 2246822519) % 4294967296) % 5
           AS BIGINT) AS fold
    FROM documents
  )
  SELECT fold, CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
  FROM s GROUP BY fold ORDER BY fold
"""


def q_region_monthly_growth(sf_dir: str) -> Dataset:
    """Calendar-bucketed revenue with a LAG window — month-over-month
    delta per order priority: epoch-month census (partials-only
    shuffle, one row per (priority, month)), then the lag/delta runs
    over the tiny census in one remote task (the window never touches
    the fact table).  Month id = year·12 + (month−1) computed from
    epoch DAYS in pure integer civil-calendar arithmetic (Howard
    Hinnant's public algorithm) — bit-identical to SQL date_part."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // 86_400_000_000
        # civil-from-days (public domain algorithm): year/month from epoch days
        z = days + 719_468
        era = z // 146_097
        doe = z - era * 146_097
        yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        m = mp + np.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        month_id = y * 12 + (m - 1)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "month_id": pa.array(month_id.astype(np.int64)),
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    census = two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority", "month_id"],
        ["cents"],
        count_as="n_orders",
    )

    def lagged(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas().sort_values(
            ["o_orderpriority", "month_id"], ignore_index=True
        )
        prev = pdf.groupby("o_orderpriority")["cents"].shift(1)
        delta = (pdf["cents"] - prev).fillna(0).astype(np.int64)
        has_prev = prev.notna().astype(np.int64)
        return pa.table(
            {
                "o_orderpriority": pa.array(pdf["o_orderpriority"], type=pa.string()),
                "month_id": pa.array(pdf["month_id"].to_numpy(np.int64)),
                "cents": pa.array(pdf["cents"].to_numpy(np.int64)),
                "n_orders": pa.array(pdf["n_orders"].to_numpy(np.int64)),
                "delta_cents": pa.array(delta.to_numpy()),
                "has_prev": pa.array(has_prev.to_numpy()),
            }
        )

    return census.repartition(1).map_batches(
        lagged, batch_format="pyarrow", batch_size=None
    )


SQL_REGION_MONTHLY_GROWTH = """
  WITH c AS (
    SELECT o_orderpriority,
           CAST(date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate) - 1 AS BIGINT) AS month_id,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           count(*) AS n_orders
    FROM orders GROUP BY 1, 2
  )
  SELECT o_orderpriority, month_id, cents, n_orders,
         CAST(coalesce(cents - lag(cents) OVER w, 0) AS BIGINT) AS delta_cents,
         CAST(CASE WHEN lag(cents) OVER w IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS has_prev
  FROM c
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month_id)
"""


def q_hex_counts_stream(sf_dir: str):
    """STREAMING flagship aggregate
    (stages/streaming.py::streaming_hex_counts): incremental per-shard
    (r,q)→(n_docs,len_sum) state fed by parallel router tasks running
    the SAME geocode+hex kernels as the batch query — shares
    SQL_HEX_DOC_COUNTS, extending streaming parity to the flagship
    census (sums commute → no sequencing)."""
    from hexscape_ray.stages.streaming import streaming_hex_counts

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    pdf = streaming_hex_counts(docs)
    return ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


