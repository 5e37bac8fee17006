"""Spatial pipelines over synthetic boundaries + misc relational — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q03_textdedup as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# spatial pipelines over deterministic synthetic boundaries (rows-only:
# geometry ops are not SQL-expressible; invariants live in pytest)
# ---------------------------------------------------------------------------

_FIXTURE_CACHE: dict[str, object] = {}
_FIXTURE_LOCK = __import__("threading").Lock()


def _fixture_tables():
    # lock, not check-then-act: the parallel oracle sweep calls this
    # from several threads, and a reader between the first and third
    # assignment saw a half-filled cache (the long-standing transient
    # "KeyError: 'landcover'" sweep failure — root-caused round 5)
    with _FIXTURE_LOCK:
        if "points" not in _FIXTURE_CACHE:
            from hexscape_ray.sources.fixtures import (
                gen_admin,
                gen_landcover,
                gen_points,
            )

            _FIXTURE_CACHE["admin"] = gen_admin()
            _FIXTURE_CACHE["landcover"] = gen_landcover()
            _FIXTURE_CACHE["points"] = gen_points()
    return _FIXTURE_CACHE


def q_generate_patches(sf_dir: str) -> Dataset:
    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.patches import generate_patches

    fx = _fixture_tables()
    admin = fx["admin"]
    country = admin.filter(pc.equal(admin.column("level"), 0))
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    return generate_patches(country, fx["landcover"], spec)


def q_patches_split(sf_dir: str) -> Dataset:
    """M5 per-part explosion on a two-island landscape (rows-only)."""
    from hexscape_ray.config import GridSpec
    from hexscape_ray.geom.wkb import polygon_to_wkb
    from hexscape_ray.pipelines.patches import generate_patches

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )

    islands = pa.table(
        {
            "code": pa.array(["W", "E"]),
            "wkb": pa.array(
                [
                    polygon_to_wkb([rect(0, 0, 48_500, 100_000)]),
                    polygon_to_wkb([rect(51_500, 0, 100_000, 100_000)]),
                ],
                type=pa.binary(),
            ),
        }
    )
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    return generate_patches(islands, None, spec, split_parts=True)


def q_generate_neighbours(sf_dir: str) -> Dataset:
    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.patches import generate_neighbours, generate_patches

    fx = _fixture_tables()
    admin = fx["admin"]
    country = admin.filter(pc.equal(admin.column("level"), 0))
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    patches = generate_patches(country, None, spec)
    return generate_neighbours(patches, country, spec)


def q_point_in_polygon(sf_dir: str) -> Dataset:
    """documents geocoded → admin level-2 containment assignment
    (J1/S1a) → census per admin code.  ORACLE-backed (round-3 verdict
    #10): the fixture's 16 subregions tile the landscape as an exact
    4×4 band grid, so containment reduces to coordinate band predicates
    the SQL can mirror (``floor(x/25000)`` per axis + the fixture's
    code formula).  Band-EDGE points would tie-break differently
    (engine: lowest-gid containing polygon; SQL: right/upper band), but
    the Knuth geocode puts no point on an internal edge at any test SF
    (checked: only doc 0 at the (0,0) corner, where both agree)."""
    from hexscape_ray.stages.spatial import assign_points_to_polygons

    fx = _fixture_tables()
    admin = fx["admin"]
    lvl2 = admin.filter(pc.equal(admin.column("level"), 2))
    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(lambda b: geocode_ids_batch(b, "doc_id"), batch_format="pyarrow")
    assigned = assign_points_to_polygons(ds, lvl2)
    return two_phase_sum(assigned.select_columns(["admin_code"]), ["admin_code"], [], count_as="n_docs")


SQL_POINT_IN_POLYGON = f"""
  WITH pts AS (SELECT doc_id, {_GEO_SQL.format(key="doc_id")} FROM documents),
  bands AS (
    SELECT CAST(floor(x / 25000.0) AS BIGINT) AS i,
           CAST(floor(y / 25000.0) AS BIGINT) AS j
    FROM pts)
  SELECT 'A' || CAST((i // 2) * 2 + (j // 2) AS VARCHAR)
             || CAST((i % 2) * 2 + (j % 2) AS VARCHAR) AS admin_code,
         count(*) AS n_docs
  FROM bands GROUP BY 1 ORDER BY 1
"""


def q_voronoi(sf_dir: str) -> Dataset:
    import ray.data as rd

    from hexscape_ray.pipelines.voronoi import discretise_voronoi

    fx = _fixture_tables()
    return discretise_voronoi(rd.from_arrow(fx["points"])).drop_columns(["wkb"])


def q_habitat(sf_dir: str):
    import ray.data as rd

    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.habitat import discretise_habitat

    fx = _fixture_tables()
    spec = GridSpec(hex_width=5_000.0, ref_x=0.0, ref_y=100_000.0)
    return discretise_habitat(
        rd.from_arrow(fx["points"]), spec, target_area=20 * spec.hex_area
    )


def q_connectedness(sf_dir: str) -> Dataset:
    import ray.data as rd

    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.connectedness import generate_connectedness
    from hexscape_ray.pipelines.patches import generate_patches

    fx = _fixture_tables()
    admin = fx["admin"]
    country = admin.filter(pc.equal(admin.column("level"), 0))
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    patches = generate_patches(country, None, spec)
    return generate_connectedness(patches, spec, k=2)


def q_connectedness_subgrid(sf_dir: str) -> Dataset:
    """A8 in reference sub-grid form: fine point grid per source,
    points assigned by containment in the CLIPPED patch geometry
    (st_contains_properly parity,
    /root/reference/R/generate_connectedness.R:106-121; rows-only)."""
    import ray.data as rd

    from hexscape_ray.config import GridSpec
    from hexscape_ray.pipelines.connectedness import generate_connectedness
    from hexscape_ray.pipelines.patches import generate_patches

    fx = _fixture_tables()
    admin = fx["admin"]
    country = admin.filter(pc.equal(admin.column("level"), 0))
    spec = GridSpec(hex_width=10_000.0, ref_x=0.0, ref_y=100_000.0)
    patches = generate_patches(country, None, spec, with_geometry=True)
    return generate_connectedness(patches, spec, k=2, grid_resolution=15)


def q_group_union(sf_dir: str) -> Dataset:
    """A2 geometric group-union by land-cover class — ORACLE-backed
    (round-3 verdict #10): the fixture's cells are disjoint axis-
    aligned squares, so union_area = 6.25e6·count exactly, n_parts =
    the cell count, and n_components = 4-adjacency connected
    components (verified empirically: the trapezoid-scanline union
    merges edge-touching cells and does NOT merge corner-touching
    ones, 12/12 classes match 4-adjacency, 0/12 match 8-adjacency).
    The SQL mirror embeds the deterministic cell grid as VALUES and
    computes components with a recursive transitive-closure CTE."""
    import ray.data as rd

    from hexscape_ray.stages.spatial import group_union_by_class

    fx = _fixture_tables()
    out = group_union_by_class(rd.from_arrow(fx["landcover"]))
    return out.drop_columns(["wkb"])


def _sql_group_union() -> str:
    """Generated oracle for q_group_union (see its docstring): the
    deterministic fixture grid is embedded as VALUES; components via
    recursive closure over 4-adjacent same-class cells (components are
    small — ≤ a handful of cells — so the closure stays tiny)."""
    from hexscape_ray.sources.fixtures import landcover_cells

    vals = ",".join(
        f"('{clc}',{i},{j})" for clc, _cat, i, j in landcover_cells()
    )
    return f"""
  WITH RECURSIVE cells(clc, i, j) AS (VALUES {vals}),
  ids AS (SELECT clc, i, j, i * 1000 + j AS id FROM cells),
  edges AS (
    SELECT a.clc, a.id AS src, b.id AS dst
    FROM ids a JOIN ids b
      ON a.clc = b.clc AND abs(a.i - b.i) + abs(a.j - b.j) = 1),
  reach(clc, a, b) AS (
    SELECT clc, id, id FROM ids
    UNION
    SELECT r.clc, r.a, e.dst FROM reach r
    JOIN edges e ON r.clc = e.clc AND r.b = e.src),
  comp AS (SELECT clc, a, min(b) AS root FROM reach GROUP BY clc, a)
  SELECT p.clc, p.n_parts, q.n_components,
         p.n_parts * 6250000.0 AS union_area
  FROM (SELECT clc, CAST(count(*) AS BIGINT) AS n_parts
        FROM ids GROUP BY clc) p
  JOIN (SELECT clc, CAST(count(DISTINCT root) AS BIGINT) AS n_components
        FROM comp GROUP BY clc) q USING (clc)
  ORDER BY clc
"""


SQL_GROUP_UNION = _sql_group_union()


SQL_SIMHASH = """
WITH RECURSIVE
doctoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
  FROM documents
),
toks AS (SELECT DISTINCT tok FROM doctoks),
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
p2 AS (
  SELECT 0 AS b, CAST(1 AS HUGEINT) AS v
  UNION ALL
  SELECT b + 1, v * 2 FROM p2 WHERE b < 63
),
bits AS (
  SELECT f.tok, p.b, CAST((f.h // p.v) % 2 AS BIGINT) AS bit FROM hfinal f, p2 p
),
votes AS (
  SELECT d.doc_id, b.b, sum(2 * b.bit - 1) AS v
  FROM doctoks d JOIN bits b ON b.tok = d.tok
  GROUP BY d.doc_id, b.b
),
sig AS (
  SELECT s.doc_id, CAST(sum(CAST(CASE WHEN s.v > 0 THEN 1 ELSE 0 END AS HUGEINT)
                             * p.v) AS HUGEINT) AS u
  FROM votes s JOIN p2 p ON p.b = s.b
  GROUP BY s.doc_id
)
SELECT doc_id,
       CAST(CASE WHEN u >= 9223372036854775808
                 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS simhash,
       CAST(u % 65536 AS BIGINT) AS sim_band0,
       CAST((u // 65536) % 65536 AS BIGINT) AS sim_band1,
       CAST((u // 4294967296) % 65536 AS BIGINT) AS sim_band2,
       CAST((u // 281474976710656) % 65536 AS BIGINT) AS sim_band3
FROM sig ORDER BY doc_id
"""


def q_simhash(sf_dir: str) -> Dataset:
    """64-bit SimHash + 16-bit LSH bands (stages/dedup.py::SimHasher).
    Hash-exact oracle: FNV-1a-64 itself is replayed in SQL — a
    recursive CTE folds (h XOR byte)·prime mod 2^64 over character
    positions of the DISTINCT tokens (HUGEINT modular arithmetic;
    rows = token types, iterations = max token length), then bit
    votes/packing mirror the kernel.  ASCII corpus ⇒ byte == codepoint
    (``ascii(substr(...))``); the vectorised kernel's scalar parity
    path is additionally pytest-checked on non-ASCII."""
    from hexscape_ray.stages.dedup import SimHasher

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=2).sort(
        "doc_id"
    )


def q_embedding_near_dup(sf_dir: str) -> Dataset:
    from hexscape_ray.stages.dedup import embedding_near_dup

    # driver embeddings are near-orthogonal random vectors (max pairwise
    # cosine ≈ 0.51) — 0.25 surfaces the heavy tail as "near dups"
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dup(emb, threshold=0.25)


def q_ivf_knn(sf_dir: str) -> Dataset:
    from hexscape_ray.stages.knn import ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_topk(emb, _query_vectors(sf_dir), k=5)


def q_pq_knn(sf_dir: str) -> Dataset:
    """Product-quantization ANN (stages/knn.py::pq_topk): codebooks
    trained on a seeded random sample, corpus encoded to m-byte codes,
    asymmetric-distance top-k — the billion-vector memory path (256 B
    float vectors → 8 B codes).  Approximate by design → rows-only."""
    from hexscape_ray.stages.knn import pq_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_topk(emb, _query_vectors(sf_dir), k=5)


SQL_PACK_SEQUENCES = """
WITH RECURSIVE
toks AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS L FROM documents),
chunkcnt AS (SELECT doc_id, lang, L, greatest((L + 255) // 256, 1) AS nc FROM toks),
chunks0 AS (SELECT doc_id, lang, L, nc, unnest(range(0, nc)) AS ci FROM chunkcnt),
chunks1 AS (
  SELECT lang, doc_id,
         CASE WHEN ci < nc - 1 THEN 256 ELSE L - (nc - 1) * 256 END AS clen
  FROM chunks0
),
ord AS (
  SELECT lang, doc_id, clen,
         row_number() OVER (PARTITION BY lang ORDER BY clen DESC, doc_id) AS rn
  FROM chunks1
),
fit AS (
  SELECT lang, CAST(0 AS BIGINT) AS rn,
         CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS assign
  FROM (SELECT DISTINCT lang FROM ord)
  UNION ALL
  SELECT o.lang, s.rn + 1,
    CASE WHEN list_filter(range(1, len(s.rem) + 1), i -> s.rem[i] >= o.clen)[1] IS NULL
         THEN list_append(s.rem, 256 - o.clen)
         ELSE list_transform(range(1, len(s.rem) + 1),
                j -> CASE WHEN j = list_filter(range(1, len(s.rem) + 1),
                                               i -> s.rem[i] >= o.clen)[1]
                          THEN s.rem[j] - o.clen ELSE s.rem[j] END)
    END,
    list_append(s.assign,
                coalesce(list_filter(range(1, len(s.rem) + 1),
                                     i -> s.rem[i] >= o.clen)[1],
                         len(s.rem) + 1))
  FROM fit s JOIN ord o ON o.lang = s.lang AND o.rn = s.rn + 1
),
final AS (
  SELECT f.lang, f.assign
  FROM fit f
  JOIN (SELECT lang, max(rn) AS mr FROM fit GROUP BY lang) m
    ON m.lang = f.lang AND m.mr = f.rn
),
assigned AS (
  SELECT f.lang AS lang, unnest(range(1, len(f.assign) + 1)) AS rn,
         unnest(f.assign) AS bin
  FROM final f
),
base AS (SELECT lang, min(doc_id) AS b FROM documents GROUP BY lang)
SELECT o.lang,
       b.b * 1048576 + (a.bin - 1) AS seq_uid,
       count(DISTINCT o.doc_id) AS n_docs,
       count(*) AS n_chunks,
       CAST(sum(o.clen) AS BIGINT) AS n_tokens,
       CAST(floor(1e6 * sum(o.clen) / 256 + 0.5) AS BIGINT) AS fill_pml
FROM assigned a
JOIN ord o ON o.lang = a.lang AND o.rn = a.rn
JOIN base b ON b.lang = o.lang
GROUP BY o.lang, b.b, a.bin
ORDER BY o.lang, seq_uid
"""


def q_pack_sequences(sf_dir: str) -> Dataset:
    """Sequence packing (stages/textops.py::pack_sequences): per-lang
    FFD bin-packing of ≤256-token doc chunks into training sequences.
    Keyed mode → deterministic under any partitioning.  Hash-exact
    oracle: SQL_PACK_SEQUENCES replays first-fit-decreasing step by
    step in a recursive CTE whose state is the per-bin remaining-
    capacity LIST (first fit = first index with rem[i] ≥ clen via
    list_filter; chunk order = clen DESC, doc_id — ties are identical
    chunks, so any stable order agrees); ``packing_stats`` keeps the
    conservation-law view."""
    from hexscape_ray.stages.textops import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    out = pack_sequences(ds, max_len=256, by="lang")
    return out.select_columns(
        ["lang", "seq_uid", "n_docs", "n_chunks", "n_tokens", "fill_pml"]
    ).sort(["lang", "seq_uid"])


def q_packing_stats(sf_dir: str) -> Dataset:
    """The exact side of sequence packing: per-lang doc count, total
    whitespace tokens and total ≤256-token chunks (= Σ ceil(n/256)) —
    what any correct packer must conserve; SQL-expressible, so this is
    the oracle for the rows-only ``pack_sequences``."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        toks = np.fromiter(
            (len(t.split(" ")) for t in batch["text"].to_pylist()),
            dtype=np.int64,
            count=len(batch),
        )
        return pa.table(
            {
                "lang": batch["lang"],
                "n_tok": pa.array(toks),
                "n_chunk": pa.array(-(-toks // 256)),
            }
        )

    return two_phase_sum(
        ds.map_batches(stats, batch_format="pyarrow"),
        ["lang"],
        ["n_tok", "n_chunk"],
        count_as="n_docs",
    ).rename_columns({"n_tok": "total_tokens", "n_chunk": "total_chunks"})


SQL_PACKING_STATS = """
  WITH t AS (
    SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM documents
  )
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum((n + 255) // 256) AS BIGINT) AS total_chunks
  FROM t GROUP BY lang
"""


def q_length_outliers(sf_dir: str) -> Dataset:
    """IQR outlier filter per language — the data-quality gate shape:
    exact per-lang Q1/Q3 (quantile_disc over (value,count)-compressed
    partials), then a broadcast-bounds pass counts docs outside
    [Q1−1.5·IQR, Q3+1.5·IQR].  The 1.5 factor is kept in INTEGERS
    (2n < 5·q1 − 3·q3  /  2n > 5·q3 − 3·q1) so the comparison — and
    the SQL mirror — is exact."""
    from hexscape_ray.stages.agg import grouped_quantiles_disc

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    qs = grouped_quantiles_disc(ds, ["lang"], "n_chars", {"q1": 0.25, "q3": 0.75})
    qdf = qs.to_pandas()
    bounds = {
        r["lang"]: (int(r["q1"]), int(r["q3"])) for _, r in qdf.iterrows()
    }
    bref = ray.put(bounds)

    def flag(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        langs = batch["lang"].to_pylist()
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        q1 = np.fromiter((b[l][0] for l in langs), np.int64, len(langs))
        q3 = np.fromiter((b[l][1] for l in langs), np.int64, len(langs))
        return pa.table(
            {
                "lang": batch["lang"],
                "q1": pa.array(q1),
                "q3": pa.array(q3),
                "n_low": pa.array((2 * n < 5 * q1 - 3 * q3).astype(np.int64)),
                "n_high": pa.array((2 * n > 5 * q3 - 3 * q1).astype(np.int64)),
            }
        )

    return two_phase_sum(
        ds.map_batches(flag, batch_format="pyarrow"),
        ["lang", "q1", "q3"],
        ["n_low", "n_high"],
        count_as="n_docs",
    )


SQL_LENGTH_OUTLIERS = """
  WITH q AS (
    SELECT lang, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q1,
           CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q3
    FROM documents GROUP BY lang
  )
  SELECT d.lang, q1, q3,
    CAST(count(*) FILTER (WHERE 2 * n_chars < 5 * q1 - 3 * q3) AS BIGINT) AS n_low,
    CAST(count(*) FILTER (WHERE 2 * n_chars > 5 * q3 - 3 * q1) AS BIGINT) AS n_high,
    CAST(count(*) AS BIGINT) AS n_docs
  FROM documents d JOIN q USING (lang) GROUP BY d.lang, q1, q3
"""


def q_small_quantity_revenue(sf_dir: str) -> Dataset:
    """Correlated-aggregate decorrelation (TPC-H Q17 shape): lineitems
    with quantity below 0.2× their part's average quantity, revenue per
    brand.  The per-part average is a two-phase (Σq, n) partial table
    joined BACK to lineitem with the partitioned hash join (at corpus
    scale the partials outgrow a broadcast); the 0.2 factor compares in
    integers (5·q·n < Σq) so engine and SQL agree bit-for-bit; brand
    labels attach via a broadcast dict (part is the small side)."""
    from hexscape_ray.stages.joins import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "q": pa.array(q),
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    prepped = li.map_batches(prep, batch_format="pyarrow").materialize()
    partials = two_phase_sum(
        prepped.select_columns(["l_partkey", "q"]).rename_columns({"q": "s"}),
        ["l_partkey"],
        ["s"],
        count_as="c",
    ).materialize()  # small (one row per part); count + both joins for free
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    bref = ray.put(brand)

    # ADAPTIVE side placement: below the broadcast budget ship the
    # (Σq, n) table to every task (zero shuffle); above it, co-partition
    # with the bucketed hash join (partkey cardinality ~rows/30 keeps
    # growing with the corpus — 10^8 parts is ~5 GB of partials).
    if partials.count() <= 2_000_000:
        pdf = partials.to_pandas().sort_values("l_partkey", ignore_index=True)
        pref = ray.put(
            (
                pdf["l_partkey"].to_numpy(np.int64),
                pdf["s"].to_numpy(np.int64),
                pdf["c"].to_numpy(np.int64),
            )
        )

        def pick_bcast(batch: pa.Table) -> pa.Table:
            keys, s_arr, c_arr = ray.get(pref)
            k = batch["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, k)  # every key exists by construction
            q = batch["q"].to_numpy(zero_copy_only=False)
            keep = 5 * q * c_arr[pos] < s_arr[pos]
            batch = batch.filter(pa.array(keep))
            b = ray.get(bref)
            brands = [b[int(x)] for x in batch["l_partkey"].to_pylist()]
            return pa.table(
                {"p_brand": pa.array(brands, type=pa.string()), "cents": batch["cents"]}
            )

        picked = prepped.map_batches(pick_bcast, batch_format="pyarrow")
    else:
        joined = bucketed_join(
            prepped,
            partials,
            on="l_partkey",
            left_schema=pa.schema(
                [("l_partkey", pa.int64()), ("q", pa.int64()), ("cents", pa.int64())]
            ),
            right_schema=pa.schema(
                [("l_partkey", pa.int64()), ("s", pa.int64()), ("c", pa.int64())]
            ),
        )

        def pick(batch: pa.Table) -> pa.Table:
            q = batch["q"].to_numpy(zero_copy_only=False)
            s = batch["s"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            keep = 5 * q * c < s
            batch = batch.filter(pa.array(keep))
            b = ray.get(bref)
            brands = [b[int(k)] for k in batch["l_partkey"].to_pylist()]
            return pa.table(
                {"p_brand": pa.array(brands, type=pa.string()), "cents": batch["cents"]}
            )

        picked = joined.map_batches(pick, batch_format="pyarrow")

    return two_phase_sum(
        picked, ["p_brand"], ["cents"], count_as="n_items"
    ).rename_columns({"cents": "revenue_cents"})


SQL_SMALL_QUANTITY_REVENUE = """
  WITH pq AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS c
    FROM lineitem GROUP BY l_partkey
  )
  SELECT p_brand,
    CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS revenue_cents,
    CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem l
  JOIN pq USING (l_partkey)
  JOIN part ON p_partkey = l_partkey
  WHERE 5 * CAST(floor(l_quantity + 0.5) AS BIGINT) * c < s
  GROUP BY p_brand
"""


def q_vocab_encode(sf_dir: str) -> Dataset:
    """Tokenizer fit + corpus encode (stages/textops.py::build_vocab /
    encode_docs): top-16 vocab by (freq DESC, token ASC) with ids
    1..16, OOV → 0; every doc encoded to an id list in one flattened
    vectorised lookup.  The oracle checks the whole contract — per-doc
    token count, OOV count, and Σ ids (which pins every in-vocab
    token's RANK, i.e. the vocab itself)."""
    from hexscape_ray.stages.textops import build_vocab, encode_docs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = build_vocab(ds, vocab_size=16)
    return encode_docs(ds, vocab).select_columns(
        ["doc_id", "n_tokens", "n_oov", "id_sum"]
    )


SQL_VOCAB_ENCODE = """
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ),
  freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
  vocab AS (
    SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS id
    FROM freq QUALIFY id <= 16
  )
  SELECT t.doc_id,
    CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov,
    CAST(coalesce(sum(v.id), 0) AS BIGINT) AS id_sum
  FROM tok t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY t.doc_id
"""


def q_curation_pipeline(sf_dir: str) -> Dataset:
    """The end-to-end training-data curation story in one flow:
    documents → enrich (quality) → exact dedup (hash-partition, keep
    min doc_id) → quality gate → geocode + hex encode → per-hex
    accounting of kept / dropped-duplicate / dropped-quality.

    ORACLE-backed (round 4): the quality gate uses the shared integer
    ``quality_micro_batch`` kernel (q_micro < 500000, the exact-
    rational mirror of the 0.5 float threshold) and the dedup keeper
    mark is ONE co-partition join against the per-content min id — so
    the whole per-hex accounting hash-checks against SQL.  The per-hex
    invariant n_total = kept + dup + lowq additionally holds by
    construction.
    """
    from hexscape_ray.functions.hashing import fnv1a_64_str_array
    from hexscape_ray.stages.agg import two_phase_agg
    from hexscape_ray.stages.joins import bucketed_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        _c, _w, q_micro = quality_micro_batch(batch["text"])
        h = fnv1a_64_str_array(batch["text"].to_pylist()).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "q_micro": pa.array(q_micro),
                "content_hash": pa.array(h),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow")
    # dup mark via ONE co-partition join against the per-content min id
    # (the former per-content-hash map_groups was one pandas frame per
    # DISTINCT TEXT — the measured per-group-overhead lesson at corpus
    # cardinality)
    keepers = two_phase_agg(
        enriched.select_columns(["content_hash", "doc_id"]),
        ["content_hash"],
        {"doc_id": "min"},
    ).rename_columns({"doc_id": "min_doc"})
    marked = bucketed_join(
        enriched,
        keepers,
        on="content_hash",
        left_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("q_micro", pa.int64()),
                ("content_hash", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("content_hash", pa.int64()), ("min_doc", pa.int64())]
        ),
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "doc_id")
        batch = hex_encode_batch(batch, SPEC, resolutions=(0,))
        dup = (
            batch["doc_id"].to_numpy(zero_copy_only=False)
            != batch["min_doc"].to_numpy(zero_copy_only=False)
        )
        lowq = (~dup) & (
            batch["q_micro"].to_numpy(zero_copy_only=False) < 500000
        )
        kept = ~dup & ~lowq
        return pa.table(
            {
                "r": batch["r"],
                "q": batch["q"],
                "n_kept": pa.array(kept.astype(np.int64)),
                "n_dup": pa.array(dup.astype(np.int64)),
                "n_lowq": pa.array(lowq.astype(np.int64)),
            }
        )

    per_doc = marked.map_batches(bucketize, batch_format="pyarrow")
    return two_phase_sum(
        per_doc, ["r", "q"], ["n_kept", "n_dup", "n_lowq"], count_as="n_total"
    )


SQL_CURATION_PIPELINE = (
    _hex_cte("documents", "doc_id", "doc_id")
    + """,
  t AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
             AS sum_len,
           CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ('the','and','of','to','in','is','that','with',
                           'for','was'))) AS BIGINT) AS n_stop,
           CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS min_doc
    FROM documents),
  m AS (
    SELECT doc_id,
           CASE WHEN doc_id != min_doc THEN 1 ELSE 0 END AS is_dup,
           CAST(800 * least(n_chars, 500)
                + CASE WHEN 2 * n_tok <= sum_len AND sum_len <= 12 * n_tok
                       THEN 200000 ELSE 100000 END
                + (2 * (300000 * n_tok + 100000 * least(5 * n_stop, n_tok))
                   + n_tok) // (2 * n_tok) AS BIGINT) AS q_micro
    FROM t)
  SELECT h.r, h.q,
         CAST(sum(CASE WHEN m.is_dup = 0 AND m.q_micro >= 500000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(m.is_dup) AS BIGINT) AS n_dup,
         CAST(sum(CASE WHEN m.is_dup = 0 AND m.q_micro < 500000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
         count(*) AS n_total
  FROM hexed h JOIN m USING (doc_id)
  GROUP BY h.r, h.q
"""
)


def q_customers_without_orders(sf_dir: str) -> Dataset:
    """Distributed ANTI join — customers with no URGENT-priority order,
    counted per market segment (the NOT EXISTS operator; TPC-H Q22
    flavour).  Both sides co-partition on the key in one shuffle
    (``bucketed_join(how='anti')`` → Acero ``left anti`` per bucket);
    the right side is filtered BEFORE the shuffle and ships ONLY the
    key column, so the shuffle volume is 8 bytes/qualifying-row
    regardless of order width."""
    from hexscape_ray.stages.joins import bucketed_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(expr="o_orderpriority == '1-URGENT'")
        .map_batches(
            lambda b: pa.table({"c_custkey": b["o_custkey"]}),
            batch_format="pyarrow",
        )
    )
    no_orders = bucketed_join(
        cust,
        orders,
        on="c_custkey",
        how="anti",
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )
    return (
        two_phase_sum(
            no_orders.select_columns(["c_mktsegment"]),
            ["c_mktsegment"],
            [],
            count_as="n_customers",
        )
        .sort("c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
  GROUP BY c_mktsegment
  ORDER BY c_mktsegment
"""


def q_orders_with_large_item(sf_dir: str) -> Dataset:
    """Distributed SEMI join — orders having ≥1 lineitem with
    quantity ≥ 48, aggregated per order priority (the EXISTS operator:
    each qualifying order counts ONCE no matter how many large items
    it has — an inner join would double-count).  The filter runs
    BEFORE the shuffle so only qualifying keys move."""
    from hexscape_ray.stages.joins import bucketed_join

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_cents": pa.array(
                    np.floor(p * 100.0 + 0.5).astype(np.int64)
                ),
            }
        )

    big = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .filter(expr="l_quantity >= 48")
        .map_batches(
            lambda b: pa.table({"o_orderkey": b["l_orderkey"]}),
            batch_format="pyarrow",
        )
    )
    qualifying = bucketed_join(
        orders.map_batches(prep, batch_format="pyarrow"),
        big,
        on="o_orderkey",
        how="semi",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderpriority", pa.string()),
                ("price_cents", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
    )
    return (
        two_phase_sum(
            qualifying.select_columns(["o_orderpriority", "price_cents"]),
            ["o_orderpriority"],
            ["price_cents"],
            count_as="n_orders",
        )
        .sort("o_orderpriority")
    )


SQL_ORDERS_WITH_LARGE_ITEM = """
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS price_cents
  FROM orders o
  WHERE EXISTS (SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority
"""


def q_user_rolling_value(sf_dir: str) -> Dataset:
    """Per-key ordered WINDOW functions — for every event, the rolling
    sum of value cents over the current + 3 preceding events of the
    same user (ordered by ts then event_id), and the microsecond gap
    to the user's previous event (−1 for each user's first).  One hash
    co-partition + vectorised per-bucket cumsum
    (``stages.window.rolling_window``); the oracle is the literal SQL
    window frame ``ROWS BETWEEN 3 PRECEDING AND CURRENT ROW``."""
    from hexscape_ray.stages.window import rolling_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
                "value_cents": pa.array(
                    np.floor(v * 100.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return rolling_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order=["us", "event_id"],
        value="value_cents",
        preceding=3,
        out_sum="rolling_cents",
        delta_of="us",
        out_delta="gap_us",
    )


def _creg(arr, pattern) -> np.ndarray:
    return (
        pc.count_substring_regex(arr, pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def quality_micro_batch(txt) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorised EXACT integer quality score for an Arrow string
    column → (n_chars, n_ws_tokens, q_micro) — the shared kernel of
    ``doc_quality_exact`` and the curation pipeline (one formula, one
    oracle mirror; see q_doc_quality_exact's docstring for the
    rational-arithmetic construction)."""
    from hexscape_ray.functions import text as T

    stop_re = r"\b(" + "|".join(sorted(T._STOP_EN)) + r")\b"
    c = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    n_ws = _creg(txt, r"\S+")
    n_tok = _creg(txt, r"\w+")
    sum_len = _creg(txt, r"\w")
    n_stop = _creg(pc.utf8_lower(txt), stop_re)
    n_punct = _creg(txt, r"[^\w\s]")
    d = np.maximum(n_tok, 1)
    w = np.where(
        (n_tok > 0) & (2 * d <= sum_len) & (sum_len <= 12 * d),
        200000,
        100000,
    )
    A = 800 * np.minimum(c, 500) + w
    R = 300000 * (d - np.minimum(n_punct, d)) + 100000 * np.minimum(5 * n_stop, d)
    q_micro = A + (2 * R + d) // (2 * d)
    return c, n_ws, q_micro


def q_doc_quality_exact(sf_dir: str) -> Dataset:
    """Quality scoring with an EXACT integer score — the oracle-checkable
    form of ``doc_quality``.  ``q_micro`` is ``quality_score`` × 1e6
    evaluated in pure int64 rational arithmetic (half-up on the exact
    rational), so no float-rounding convention (numpy half-even vs SQL
    half-away) can diverge:

        d     = max(n_tok, 1)
        A     = 800·min(n_chars,500) + (200000 if 2d ≤ Σlen ≤ 12d else 100000)
        R     = 300000·(d − min(n_punct,d)) + 100000·min(5·n_stop, d)
        q_micro = A + (2R + d) // (2d)

    Every count is one vectorised RE2 pass (``count_substring_regex``):
    ``\\w+`` runs = word tokens, ``\\w`` chars = their total length,
    ``\\S+`` runs = whitespace tokens, ``\\b``-bounded stopword runs =
    standalone stopword occurrences (a run like ``theta`` has no inner
    word boundary, so it never false-hits ``the``).  Only the BPE-regex
    count stays scalar (its lookahead has no RE2 form).  RE2's ``\\w``
    is ASCII where Python's is Unicode — identical on this corpus; the
    SQL oracle additionally assumes single-space-separated
    ``[a-z0-9 ]`` text (verified), under which ``string_split`` word
    tokens coincide with ``\\w+`` runs and BPE count = word count."""
    import pyarrow.compute as pc

    from hexscape_ray.functions import text as T

    def score(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        n = len(batch)
        c, n_ws, q_micro = quality_micro_batch(txt)
        n_tok = _creg(txt, r"\w+")
        n_bpe = np.fromiter(
            (T.count_tokens_bpe(t) for t in txt.to_pylist()),
            dtype=np.int64,
            count=n,
        )
        del n_tok  # ws/bpe reported; kernel shares the micro score
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(c),
                "n_tokens_ws": pa.array(n_ws),
                "n_tokens_bpe": pa.array(n_bpe),
                "q_micro": pa.array(q_micro),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def q_user_value_24h(sf_dir: str) -> Dataset:
    """TIME-RANGE window aggregate — for every event, the sum of value
    cents over the user's events in the PRECEDING 24 HOURS (a
    value-based ``RANGE`` frame: covers peers with equal timestamps,
    unlike the row-offset ``ROWS`` frame of ``user_rolling_value``)
    plus the per-user row number.  One hash co-partition + one
    vectorised composite searchsorted per bucket
    (``stages.window.range_window``)."""
    from hexscape_ray.stages.window import range_window

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "us": batch["ts"].cast(pa.int64()),
                "value_cents": pa.array(
                    np.floor(v * 100.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return range_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        time_col="us",
        value="value_cents",
        window=86_400_000_000,
        order_tail=["event_id"],
        out_sum="range_sum",
        out_rownum="rn",
    )


SQL_USER_VALUE_24H = """
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS range_sum,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS rn
  FROM events
"""


def q_events_from_top_users(sf_dir: str) -> Dataset:
    """Zero-shuffle broadcast SEMI filter — event-type census over the
    events of the 50 most active users (the allowlist/blocklist filter
    shape: the small key set comes from a distributed aggregate, is
    broadcast once via ``ray.put``, and the 100-TB event stream is
    filtered in place with one Arrow ``is_in`` per batch — the big
    side never shuffles).  Top-50 tie-break: (count DESC, user_id ASC)
    on both sides."""
    from hexscape_ray.stages.joins import broadcast_semi_anti

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = (
        two_phase_sum(ev.select_columns(["user_id"]), ["user_id"], [], count_as="n")
        .to_pandas()
        .sort_values(["n", "user_id"], ascending=[False, True])
        .head(50)
    )
    return (
        two_phase_sum(
            broadcast_semi_anti(
                ev, counts["user_id"].to_numpy(), on="user_id", how="semi"
            ).select_columns(["event_type"]),
            ["event_type"],
            [],
            count_as="n_events",
        )
        .sort("event_type")
    )


SQL_EVENTS_FROM_TOP_USERS = """
  WITH c AS (
    SELECT user_id, count(*) AS n FROM events
    GROUP BY user_id ORDER BY n DESC, user_id LIMIT 50
  )
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE user_id IN (SELECT user_id FROM c)
  GROUP BY event_type
  ORDER BY event_type
"""


def q_cosine_dup_pairs(sf_dir: str) -> Dataset:
    """EXACT embedding-cosine near-dup pairs (cos ≥ 0.45) via blocked
    all-pairs matmul (``stages.knn.cosine_pairs_exact``) — the exact
    baseline for the LSH near-dup path, oracle-checked against a
    DuckDB self-join on ``list_cosine_similarity``.  The 0.45
    threshold sits ≥ 5.5e-4 from every pair's cosine on this corpus,
    far beyond float64 summation-order error."""
    from hexscape_ray.stages.knn import cosine_pairs_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs_exact(emb, threshold=0.45, block_rows=256).sort(
        ["a", "b"]
    )


SQL_COSINE_DUP_PAIRS = """
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    * 1000000 + 0.5) AS BIGINT) AS cos_micro
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.45
  ORDER BY a, b
"""


SQL_DOC_QUALITY_EXACT = """
  WITH t AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
             AS sum_len,
           CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ('the','and','of','to','in','is','that','with',
                           'for','was'))) AS BIGINT) AS n_stop
    FROM documents
  )
  SELECT doc_id, n_chars, n_tok AS n_tokens_ws, n_tok AS n_tokens_bpe,
         CAST(800 * least(n_chars, 500)
              + CASE WHEN 2 * n_tok <= sum_len AND sum_len <= 12 * n_tok
                     THEN 200000 ELSE 100000 END
              + (2 * (300000 * n_tok + 100000 * least(5 * n_stop, n_tok))
                 + n_tok) // (2 * n_tok) AS BIGINT) AS q_micro
  FROM t
"""


SQL_USER_ROLLING_VALUE = """
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS rolling_cents,
         CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT)
           AS gap_us
  FROM events
"""


def q_copurchase_components(sf_dir: str) -> Dataset:
    """Oracle-checked distributed CONNECTED COMPONENTS: build a sparse
    bipartite customer↔supplier graph from orders⋈lineitem (one edge
    per distinct (custkey, suppkey) trade over a sparsifying item
    filter) and label every node with its component = minimum reachable
    node id via ``stages.graph.connected_components`` (local contraction
    + min-label supersteps, Rastogi et al. ICDE'13).

    This upgrades the CC machinery itself — previously pytest-only
    (union-find parity) — to a full DuckDB hash-parity check: the
    oracle computes the same labels with a recursive CTE (min-label
    transitive closure).  Supplier node ids are offset by 1e6 so the
    two key spaces cannot collide.  At sf0.01 the filter yields 58
    components of size 2–5 — non-trivial multi-hop topology, not
    cliques."""
    from hexscape_ray.stages.graph import connected_components
    from hexscape_ray.stages.joins import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_quantity", "l_partkey"])

    def sparsify(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep = (q == 1) & (p % 11 == 0)
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": kept["l_orderkey"],
                "suppnode": pc.add(kept["l_suppkey"], 1_000_000),
            }
        )

    edges = bucketed_join(
        orders, li.map_batches(sparsify, batch_format="pyarrow"),
        on="o_orderkey", n_buckets=16,
    ).map_batches(
        lambda t: pa.table({"u": t["o_custkey"], "v": t["suppnode"]}),
        batch_format="pyarrow",
    )
    return connected_components(edges, src="u", dst="v").sort("node")


SQL_COPURCHASE_COMPONENTS = """
  WITH RECURSIVE edges AS (
    SELECT DISTINCT o.o_custkey AS u, 1000000 + l.l_suppkey AS v
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity = 1 AND l.l_partkey % 11 = 0
  ), sym AS (
    SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
  ), reach(node, label) AS (
    SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v AS node, r.label FROM reach r JOIN sym s ON r.node = s.u
  )
  SELECT node, CAST(MIN(label) AS BIGINT) AS component
  FROM reach GROUP BY node ORDER BY node
"""


def q_lang_source_rollup(sf_dir: str) -> Dataset:
    """Hierarchical GROUP BY ROLLUP(lang, source) census in ONE shuffle
    (``stages.agg.rollup_sum``): finest-level partials are expanded to
    all rollup prefixes inside ``map_batches`` before the single
    groupby, so the subtotal hierarchy costs the same exchange as the
    flat census.  ``ALL`` sentinel stands in for rollup NULLs (NULL
    hash-compares poorly across engines); ``lvl`` = keys kept."""
    from hexscape_ray.stages.agg import rollup_sum

    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    out = rollup_sum(docs, ["lang", "source"], ["n_chars"], count_as="n")
    return out.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "source": t["source"],
                "lvl": t["lvl"],
                "chars": t["n_chars"],
                "n": t["n"],
            }
        ),
        batch_format="pyarrow",
    ).sort(["lvl", "lang", "source"])


SQL_LANG_SOURCE_ROLLUP = """
  SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
         CAST(2 - GROUPING(lang) - GROUPING(source) AS BIGINT) AS lvl,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY ROLLUP(lang, source)
  ORDER BY lvl, lang, source
"""


def q_returnflag_quantity_var(sf_dir: str) -> Dataset:
    """Exact grouped VARIANCE via the integer-moment identity
    var_pop = (n·Σq² − (Σq)²) / n²: both moments are exact int64 sums
    (quantities are small integers, so n·Σq² stays < 2^53 well past
    sf1), and the float appears only as the final division of two
    exact integers — bit-identical in numpy and DuckDB.  One
    ``two_phase_sum`` shuffle carries three ints per (flag, block)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def sq(t: pa.Table) -> pa.Table:
        q = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "q": pa.array(q),
                "qsq": pa.array(q * q),
            }
        )

    agg = two_phase_sum(
        li.map_batches(sq, batch_format="pyarrow"),
        ["l_returnflag"], ["q", "qsq"], count_as="n",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        ss = t["qsq"].to_numpy(zero_copy_only=False).astype(np.int64)
        var = (n * ss - s * s).astype(np.float64) / (n * n).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": pa.array(n),
                "sum_q": pa.array(s),
                "sum_qsq": pa.array(ss),
                "var_pop": pa.array(var),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("l_returnflag")


SQL_RETURNFLAG_QUANTITY_VAR = """
  WITH t AS (
    SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
    FROM lineitem
  )
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sum_q,
         CAST(sum(q*q) AS BIGINT) AS sum_qsq,
         CAST(count(*)*sum(q*q) - sum(q)*sum(q) AS DOUBLE)
           / (count(*)*count(*)) AS var_pop
  FROM t GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_returnflag_covariance(sf_dir: str) -> Dataset:
    """Exact grouped COVARIANCE via the integer cross-moment identity
    cov_pop = (n·Σqc − Σq·Σc) / n²: quantity and price-cents moments
    are exact int64 sums; the n·Σqc product is taken in PYTHON INTS on
    the tiny grouped result (int64 would overflow past ~sf3), and the
    float appears only as the final division of two exact integers —
    mirrored in SQL with HUGEINT arithmetic."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        c = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "q": pa.array(q),
                "c": pa.array(c),
                "qc": pa.array(q * c),
            }
        )

    agg = two_phase_sum(
        li.map_batches(moments, batch_format="pyarrow"),
        ["l_returnflag"],
        ["q", "c", "qc"],
        count_as="n",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_pylist()
        sq = t["q"].to_pylist()
        sc = t["c"].to_pylist()
        sqc = t["qc"].to_pylist()
        cov = [
            float(ni * si - qi * ci) / float(ni * ni)
            for ni, si, qi, ci in zip(n, sqc, sq, sc)
        ]
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": t["n"],
                "sum_q": t["q"],
                "sum_c": t["c"],
                "sum_qc": t["qc"],
                "cov_pop": pa.array(cov, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("l_returnflag")


SQL_RETURNFLAG_COVARIANCE = """
  WITH t AS (
    SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
           CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
    FROM lineitem
  )
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sum_q,
         CAST(sum(c) AS BIGINT) AS sum_c,
         CAST(sum(q * c) AS BIGINT) AS sum_qc,
         CAST(CAST(count(*) AS HUGEINT) * CAST(sum(q * c) AS HUGEINT)
              - CAST(sum(q) AS HUGEINT) * CAST(sum(c) AS HUGEINT) AS DOUBLE)
           / CAST(CAST(count(*) AS HUGEINT) * CAST(count(*) AS HUGEINT) AS DOUBLE)
           AS cov_pop
  FROM t GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_segment_percent_rank(sf_dir: str) -> Dataset:
    """PERCENT_RANK + CUME_DIST windows per market segment: rank with
    ties via two searchsorted passes inside each group (count-strictly-
    less and count-≤), both outputs the SQL-defined divisions
    (rank−1)/(n−1) and rows≤/n of exact integers."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        bal = g["c_acctbal"].to_numpy()
        n = len(g)
        sortedb = np.sort(bal)
        lt = np.searchsorted(sortedb, bal, side="left")
        le = np.searchsorted(sortedb, bal, side="right")
        prv = lt / (n - 1) if n > 1 else np.zeros(n)
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(),
                "c_mktsegment": g["c_mktsegment"].to_numpy(),
                "pr": prv,
                "cd": le / n,
            }
        )

    return cust.groupby("c_mktsegment").map_groups(pr, batch_format="pandas")


SQL_SEGMENT_PERCENT_RANK = """
  SELECT c_custkey, c_mktsegment,
    percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
    cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
  FROM customer
"""


def q_nation_top_names(sf_dir: str) -> Dataset:
    """Ordered STRING_AGG: each nation's five richest customers' names
    comma-joined in (acctbal DESC, custkey) order — broadcast the tiny
    nation table, per-nation top-5 via one lexsort inside map_groups."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    nat = pd.DataFrame(_tiny_rows(sf_dir, "nation"))[["n_nationkey", "n_name"]]
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))

    def top5(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["c_custkey"].to_numpy(), -g["c_acctbal"].to_numpy()))[:5]
        joined = ",".join(g["c_name"].to_numpy()[order])
        return pd.DataFrame(
            {
                "n_name": [names[int(g["c_nationkey"].iloc[0])]],
                "top_names": [joined],
                "n_top": [np.int64(len(order))],
            }
        )

    return cust.groupby("c_nationkey").map_groups(top5, batch_format="pandas")


SQL_NATION_TOP_NAMES = """
  WITH r AS (
    SELECT n_name, c_name,
      row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer JOIN nation ON n_nationkey = c_nationkey
  )
  SELECT n_name, string_agg(c_name, ',' ORDER BY rn) AS top_names,
         CAST(count(*) AS BIGINT) AS n_top
  FROM r WHERE rn <= 5 GROUP BY n_name
"""


def q_view_purchase_overlap(sf_dir: str) -> Dataset:
    """Key-set ops in one pass (INTERSECT / EXCEPT census): users who
    both viewed and purchased, viewed only, purchased only — per-user
    0/1 indicators max-combined in the two-phase partials, one scalar
    row out; no distinct-set shuffles."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "v": pa.array((et == "view").astype(np.int64)),
                "p": pa.array((et == "purchase").astype(np.int64)),
            }
        )

    per_user = two_phase_sum(
        ev.map_batches(flags, batch_format="pyarrow"),
        ["user_id"],
        ["v", "p"],
        count_as=None,
    )

    def census(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False) > 0
        p = batch["p"].to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "both": pa.array([int((v & p).sum())]),
                "view_only": pa.array([int((v & ~p).sum())]),
                "purchase_only": pa.array([int((~v & p).sum())]),
            }
        )

    return two_phase_sum(
        per_user.map_batches(census, batch_format="pyarrow"),
        [],
        ["both", "view_only", "purchase_only"],
        count_as=None,
    )


SQL_VIEW_PURCHASE_OVERLAP = """
  WITH u AS (
    SELECT user_id,
      max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
    FROM events GROUP BY user_id
  )
  SELECT
    CAST(count(*) FILTER (WHERE v = 1 AND p = 1) AS BIGINT) AS both,
    CAST(count(*) FILTER (WHERE v = 1 AND p = 0) AS BIGINT) AS view_only,
    CAST(count(*) FILTER (WHERE v = 0 AND p = 1) AS BIGINT) AS purchase_only
  FROM u
"""


def q_daily_top_event(sf_dir: str) -> Dataset:
    """Per-DAY top event type (trending censor): epoch-day truncation
    (us // 86400e6 — exercises date bucketing parity), counts, then the
    integer-encoded argmax (ties → lexicographically smallest type)."""
    from hexscape_ray.stages.agg import argmax_per_key

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def day(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(us // 86_400_000_000),
                "event_type": batch["event_type"],
            }
        )

    counts = two_phase_sum(
        ev.map_batches(day, batch_format="pyarrow"),
        ["day", "event_type"],
        [],
        count_as="n",
    ).materialize()
    cats = counts.unique("event_type")
    return argmax_per_key(
        counts, "day", "event_type", "n", cats, top_as="top_type"
    ).sort("day")


SQL_DAILY_TOP_EVENT = """
  WITH c AS (
    SELECT epoch_us(ts) // 86400000000 AS day, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  )
  SELECT day, event_type AS top_type, n FROM (
    SELECT *, row_number() OVER (
      PARTITION BY day ORDER BY n DESC, event_type) AS rn FROM c)
  WHERE rn = 1 ORDER BY day
"""


def q_rolling_7d_revenue(sf_dir: str) -> Dataset:
    """Frame-based moving window over a TIME-BUCKETED aggregate: daily
    order revenue (exact cents) → 7-day trailing sum per day.  Daily
    totals are a tiny two-phase result (one row per day), so the frame
    scan is a single sorted cumsum pass — sum7 = csum[i] − csum[i−7]."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(
                    us.to_numpy(zero_copy_only=False) // 86_400_000_000
                ),
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    daily = two_phase_sum(
        ds.map_batches(prep, batch_format="pyarrow"), ["day"], ["cents"], count_as="n_orders"
    )

    def window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("day", ignore_index=True)
        c = df["cents"].to_numpy()
        cs = np.concatenate([[0], np.cumsum(c)])
        # trailing 7 ROWS (days are dense in this data; ROWS == RANGE here)
        lo = np.maximum(np.arange(len(c)) - 6, 0)
        df["cents_7d"] = cs[np.arange(1, len(c) + 1)] - cs[lo]
        return pa.Table.from_pandas(df, preserve_index=False)

    # daily is one small arrow block (adaptive combine) → one window task
    return daily.map_batches(window, batch_size=1 << 30, batch_format="pyarrow")


SQL_ROLLING_7D_REVENUE = """
  WITH d AS (
    SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS cents,
      CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
  )
  SELECT day, cents, n_orders,
    CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      AS BIGINT) AS cents_7d
  FROM d
"""


def q_region_revenue(sf_dir: str) -> Dataset:
    """Multi-way dimension-chain join (TPC-H Q5 shape): region → nation
    → customer → orders revenue per region.  The dimension chain
    (region ⋈ nation ⋈ customer → custkey→region map) composes
    DRIVER-side into one broadcast dict — dimensions are small by
    definition; only the fact table streams, one map + one two-phase
    sum, zero shuffle beyond the partials."""
    region = pd.DataFrame(_tiny_rows(sf_dir, "region"))[["r_regionkey", "r_name"]]
    nation = pd.DataFrame(_tiny_rows(sf_dir, "nation"))[["n_nationkey", "n_regionkey"]]
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    c2r = {
        int(c): r2name[n2r[int(n)]]
        for c, n in zip(cust["c_custkey"], cust["c_nationkey"])
    }
    cref = ray.put(c2r)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(batch: pa.Table) -> pa.Table:
        m = ray.get(cref)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        names = [m[int(k)] for k in batch["o_custkey"].to_pylist()]
        return pa.table(
            {
                "r_name": pa.array(names, type=pa.string()),
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    return two_phase_sum(
        orders.map_batches(tag, batch_format="pyarrow"),
        ["r_name"],
        ["cents"],
        count_as="n_orders",
    ).rename_columns({"cents": "revenue_cents"})


SQL_REGION_REVENUE = """
  SELECT r_name,
    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS revenue_cents,
    CAST(count(*) AS BIGINT) AS n_orders
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY r_name
"""


def q_user_type_stats(sf_dir: str) -> Dataset:
    """COMPOSITE-KEY partitioned join: per-(user, event_type) counts +
    exact value cents joined to per-(user, event_type) first-seen
    timestamps on the two-column key (bucket = xor-mixed per-column
    hashes, Arrow multi-key join in each bucket).  The first-seen side
    is the generalised two-phase MIN (stages/agg.py::two_phase_agg —
    adaptive combine placement, same machinery as the sums)."""
    from hexscape_ray.stages.joins import bucketed_join

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    def prep_a(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "value_cents": pa.array(cents),
            }
        )

    a = two_phase_sum(
        ev.map_batches(prep_a, batch_format="pyarrow"),
        ["user_id", "event_type"],
        ["value_cents"],
        count_as="n",
    )

    from hexscape_ray.stages.agg import two_phase_agg

    def prep_b(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "first_us": batch["ts"].cast(pa.int64()),
            }
        )

    b = two_phase_agg(
        ev.map_batches(prep_b, batch_format="pyarrow"),
        ["user_id", "event_type"],
        {"first_us": "min"},
    )

    return bucketed_join(
        a,
        b,
        on=["user_id", "event_type"],
        left_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("first_us", pa.int64()),
            ]
        ),
    )


SQL_USER_TYPE_STATS = """
  WITH a AS (
    SELECT user_id, event_type,
      CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS value_cents,
      CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  ),
  b AS (
    SELECT user_id, event_type, CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
    FROM events GROUP BY 1, 2
  )
  SELECT a.user_id, a.event_type, a.value_cents, a.n, b.first_us
  FROM a JOIN b USING (user_id, event_type)
"""


def q_user_top_event_type(sf_dir: str) -> Dataset:
    """Per-key MODE / arg-max: each user's most frequent event type
    (ties → lexicographically smallest) via
    ``stages.agg.argmax_per_key`` — one native Max over an
    integer-encoded (count, category-rank) composite, no per-group
    Python.  The counts table is materialised once because it feeds
    two consumers (the distinct-category probe and the encode pass) —
    Ray recomputes lazy Datasets per consumer."""
    from hexscape_ray.stages.agg import argmax_per_key

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = two_phase_sum(
        ev, ["user_id", "event_type"], [], count_as="n"
    ).materialize()
    cats = counts.unique("event_type")
    return argmax_per_key(
        counts, "user_id", "event_type", "n", cats, top_as="top_type"
    ).sort("user_id")


SQL_USER_TOP_EVENT_TYPE = """
  WITH c AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  )
  SELECT user_id, event_type AS top_type, n FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY n DESC, event_type) AS rn FROM c)
  WHERE rn = 1 ORDER BY user_id
"""


def q_event_value_quantiles_cont(sf_dir: str) -> Dataset:
    """Grouped INTERPOLATED quantiles (``percentile_cont`` semantics,
    index = q·(n−1)) over event value cents via
    ``stages.agg.grouped_quantiles_cont``: quantiles given as rationals
    (k/4) so interpolation is exact integer arithmetic and the float is
    only the final ``/4`` of an exact int — the oracle reproduces the
    same explicit order-statistic formula instead of trusting
    ``quantile_cont``'s internal float order (verified equal to DuckDB
    quantile_cont in pytest)."""
    from hexscape_ray.stages.agg import grouped_quantiles_cont

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"event_type": t["event_type"], "cents": pa.array(v)})

    return grouped_quantiles_cont(
        ev.map_batches(cents, batch_format="pyarrow"),
        ["event_type"], "cents",
        {"p25": (1, 4), "p50": (2, 4), "p75": (3, 4)},
    ).sort("event_type")


def _cont_term(num: int) -> str:
    lo = f"({num}*(n-1))//4"
    # n is constant per group; inside CASE (within max()) it may be used
    # directly, but the interpolation weights sit OUTSIDE the aggregate
    # so they need any_value(n).
    r = f"({num}*(any_value(n)-1))%4"
    return (
        f"CAST(max(CASE WHEN rn-1 = {lo} THEN cents END) * (4 - {r})\n"
        f"       + coalesce(max(CASE WHEN rn-1 = {lo} + 1 THEN cents END), 0)"
        f" * ({r}) AS DOUBLE) / 4"
    )


SQL_EVENT_VALUE_QUANTILES_CONT = f"""
  WITH b AS (
    SELECT event_type, CAST(floor(value*100.0 + 0.5) AS BIGINT) AS cents
    FROM events
  ), v AS (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM b
  )
  SELECT event_type,
         {_cont_term(1)} AS p25,
         {_cont_term(2)} AS p50,
         {_cont_term(3)} AS p75
  FROM v GROUP BY event_type ORDER BY event_type
"""


def q_ngram_jaccard_pairs(sf_dir: str) -> Dataset:
    """Exact word-3-gram Jaccard near-dup pairs (jaccard ≥ 1/2) over
    the documents table via
    ``stages.dedup.ngram_jaccard_pairs_exact`` — the ground-truth
    dedup tier the MinHash+LSH path approximates, fully distributed
    (shingle-partitioned intersection counts; sizes ride with the pair
    rows so no post-join).  Threshold compared in integers; the only
    float is the reported ``jac_pml = floor(1e6·inter/uni + 0.5)``."""
    from hexscape_ray.stages.dedup import ngram_jaccard_pairs_exact

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs_exact(docs, n=3, threshold=(1, 2)).sort(["i", "j"])


def q_frequent_users_mg(sf_dir: str) -> Dataset:
    """Frequent-item mining with Misra–Gries-bounded memory
    (stages/sketch.py::misra_gries_heavy_hitters): users owning > 0.5 %
    of all events, found via per-block MG counters (≤ k rows shuffle
    per block no matter the distinct count) + an exact recount of the
    guaranteed-superset candidates — output is bit-exact vs plain SQL
    ``HAVING``, which is exactly what the oracle runs."""
    from hexscape_ray.stages.sketch import misra_gries_heavy_hitters

    ev = _read(sf_dir, "events", ["user_id"])
    return misra_gries_heavy_hitters(
        ev, "user_id", support_num=1, support_den=200, k=256
    ).sort("user_id")


SQL_FREQUENT_USERS_MG = """
  SELECT user_id, count(*) AS n_rows
  FROM events
  GROUP BY user_id
  HAVING count(*) * 200 > 1 * (SELECT count(*) FROM events)
  ORDER BY user_id
"""


def q_kmeans_embeddings(sf_dir: str) -> Dataset:
    """Distributed spherical k-means over the embeddings table
    (stages/knn.py::kmeans_distributed — per-iteration streaming moment
    partials, hash-min seeded init), then a (cluster × true-label)
    contingency census via one bucketed join of the assignment stream
    back to the labels — the clustering-quality audit a curation
    pipeline runs.  Iterative float → rows-only check; Lloyd's parity
    and deterministic-init pytests in tests/test_agg_dedup_knn.py."""
    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.joins import bucketed_join
    from hexscape_ray.stages.knn import kmeans_distributed

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, assign = kmeans_distributed(emb, k=4, n_iter=8)
    labels = _read(sf_dir, "embeddings", ["vec_id", "label"])
    joined = bucketed_join(
        assign.drop_columns(["cos"]).materialize(), labels, on="vec_id", n_buckets=8
    )
    return two_phase_sum(joined, ["cluster", "label"], [], count_as="n").sort(
        ["cluster", "label"]
    )


def q_props_field_extract(sf_dir: str) -> Dataset:
    """Semi-structured field extraction — the log/JSON-parsing stage of
    a web pipeline: pull the integer ``k`` out of the ``props`` JSON
    string with ONE vectorised Arrow ``extract_regex`` kernel (RE2, no
    Python loop), derive a decade bucket, and keep the row level so the
    oracle checks per-row alignment, not just aggregates.  Oracle =
    DuckDB ``json_extract`` (a different parser arriving at the same
    values — stronger than regex-vs-regex)."""
    ev = _read(sf_dir, "events", ["event_id", "event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "k_val": k,
                "k_bucket": pc.multiply(pc.divide(k, 10), 10),
            }
        )

    return ev.map_batches(extract, batch_format="pyarrow").sort("event_id")


SQL_PROPS_FIELD_EXTRACT = """
  SELECT event_id, event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
         (CAST(json_extract(props, '$.k') AS BIGINT) // 10) * 10 AS k_bucket
  FROM events ORDER BY event_id
"""


def q_events_customer_salted(sf_dir: str) -> Dataset:
    """Skew-proof salted equi-join (stages/joins.py::salted_join):
    events (big, Zipf-hot user ids) ⋈ customer (dimension) with the hot
    keys sharded across 8 salts and the dimension replicated per salt —
    row-identical to the plain join, which is exactly what the oracle
    checks (plain SQL JOIN, no salt visible in the result)."""
    from hexscape_ray.stages.joins import salted_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def ev_prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "cents": pa.array(cents),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cust_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["c_custkey"],
                "c_mktsegment": batch["c_mktsegment"],
            }
        )

    joined = salted_join(
        ev.map_batches(ev_prep, batch_format="pyarrow"),
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        on="user_id",
        n_salt=8,
    )
    return joined.select_columns(
        ["event_id", "user_id", "c_mktsegment", "cents"]
    ).sort("event_id")


SQL_EVENTS_CUSTOMER_SALTED = """
  SELECT e.event_id, e.user_id, c.c_mktsegment,
         CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  ORDER BY e.event_id
"""


SQL_NGRAM_JACCARD_PAIRS = """
  WITH sh AS (
    SELECT doc_id,
           unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                 for i in generate_series(1, len(ts)-2)])) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
  ), sz AS (
    SELECT doc_id, count(*) AS s FROM sh GROUP BY doc_id
  ), inter AS (
    SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
    FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
  SELECT i, j, inter, sa.s + sb.s - inter AS uni,
         CAST(floor(1e6 * inter / (sa.s + sb.s - inter) + 0.5) AS BIGINT)
           AS jac_pml
  FROM inter
  JOIN sz sa ON sa.doc_id = i
  JOIN sz sb ON sb.doc_id = j
  WHERE inter * 2 >= 1 * (sa.s + sb.s - inter)
  ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

