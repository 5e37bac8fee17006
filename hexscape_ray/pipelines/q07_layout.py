"""Data-layout operators (adaptive tiles, Z-order) — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q06_tpch as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# Data-layout operators (round-4 continuation): density-adaptive
# tiling and space-filling-curve layout keys — the physical-layout
# levers a 100-TB tile/spatial service needs.
# ---------------------------------------------------------------------------


def _axial_sql_suffixed(res: int, sfx: str, src: str) -> str:
    """axial_sql with its CTE names suffixed and the source renamed, so
    two resolutions can chain inside ONE WITH clause (the generated
    expression tree is untouched — still bit-exact point_to_axial)."""
    import re as _re

    sql = axial_sql(res=res)
    sql = _re.sub(r"\b(frac2|frac|cube|hexed)\b", lambda m: m.group(1) + sfx, sql)
    return _re.sub(r"\bpts\b", src, sql)


def q_hex_adaptive_tiles(sf_dir: str) -> Dataset:
    """DENSITY-ADAPTIVE multi-resolution tiling: coarse (res-0, 2 km)
    cells denser than the occupied-cell mean refine to res-1 (1 km);
    the output mixes res-0 rows for cold cells with res-1 rows for the
    documents of hot parents.  This is the quadtree-style adaptive
    zoom a tile service runs over skewed corpora (dense urban hexes
    split, rural ones don't).

    Scale shape: ONE corpus pass emits (r0,q0,r1,q1) per doc (geocode
    once, two axial evaluations — hex_pyramid's kernel, wide not
    long); the exchange only ever sees fine-census partials (occupied
    fine cells are landscape-bounded); the coarse census derives from
    the fine one, the hot set is a bounded broadcast, and the corpus
    is never re-scanned.  Hot threshold n·cells > total (strictly
    above mean) is integer-exact.  NOTE hex res levels don't nest
    geometrically — parentage is POINT-derived (each doc's res-1 cell
    is grouped under the doc's own res-0 cell, the H3-style caveat),
    which the SQL oracle mirrors exactly."""
    from hexscape_ray import grid

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "doc_id")
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        r0, q0 = grid.point_to_axial(x, y, SPEC, 0)
        r1, q1 = grid.point_to_axial(x, y, SPEC, 1)
        return pa.table(
            {
                "r0": pa.array(np.asarray(r0, dtype=np.int64)),
                "q0": pa.array(np.asarray(q0, dtype=np.int64)),
                "r1": pa.array(np.asarray(r1, dtype=np.int64)),
                "q1": pa.array(np.asarray(q1, dtype=np.int64)),
                "n_chars": batch["n_chars"],
            }
        )

    fine = two_phase_sum(
        ds.map_batches(enc, batch_format="pyarrow"),
        ["r0", "q0", "r1", "q1"],
        ["n_chars"],
        count_as="n_docs",
    ).materialize()

    coarse = two_phase_sum(
        fine, ["r0", "q0"], ["n_chars", "n_docs"], count_as=None
    ).take_all()
    total = sum(r["n_docs"] for r in coarse)
    n_cells = len(coarse)
    hot = {
        (r["r0"], r["q0"]) for r in coarse if r["n_docs"] * n_cells > total
    }
    cold_rows = pa.table(
        {
            "res": pa.array(np.zeros(n_cells - len(hot), dtype=np.int64)),
            "r": pa.array(
                [r["r0"] for r in coarse if (r["r0"], r["q0"]) not in hot],
                type=pa.int64(),
            ),
            "q": pa.array(
                [r["q0"] for r in coarse if (r["r0"], r["q0"]) not in hot],
                type=pa.int64(),
            ),
            "len_sum": pa.array(
                [r["n_chars"] for r in coarse if (r["r0"], r["q0"]) not in hot],
                type=pa.int64(),
            ),
            "n_docs": pa.array(
                [r["n_docs"] for r in coarse if (r["r0"], r["q0"]) not in hot],
                type=pa.int64(),
            ),
        }
    )

    def fine_of_hot(batch: pa.Table) -> pa.Table:
        r0 = batch["r0"].to_numpy(zero_copy_only=False)
        q0 = batch["q0"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            ((int(a), int(b)) in hot for a, b in zip(r0, q0)),
            dtype=bool,
            count=len(r0),
        )
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "r": t["r1"],
                "q": t["q1"],
                "n_chars": t["n_chars"],
                "n_docs": t["n_docs"],
            }
        )

    fine_rows = two_phase_sum(
        fine.map_batches(fine_of_hot, batch_format="pyarrow"),
        ["r", "q"],
        ["n_chars", "n_docs"],
        count_as=None,
    ).map_batches(
        lambda b: pa.table(
            {
                "res": pa.array(np.ones(len(b), dtype=np.int64)),
                "r": b["r"],
                "q": b["q"],
                "len_sum": b["n_chars"],
                "n_docs": b["n_docs"],
            }
        ),
        batch_format="pyarrow",
    )
    return ray.data.from_arrow(cold_rows).union(fine_rows).sort(["res", "r", "q"])


SQL_HEX_ADAPTIVE_TILES = (
    f"WITH pts AS (SELECT doc_id, n_chars, {_GEO_SQL.format(key='doc_id')} FROM documents),\n"
    + _axial_sql_suffixed(0, "0", "pts")
    + """,
  pts1 AS (SELECT n_chars, x, y, q AS q0, r AS r0 FROM hexed0),
"""
    + _axial_sql_suffixed(1, "1", "pts1")
    + """,
  fine AS (
    SELECT r0, q0, r AS r1, q AS q1,
           CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
    FROM hexed1 GROUP BY 1, 2, 3, 4),
  coarse AS (
    SELECT r0, q0, CAST(sum(len_sum) AS BIGINT) AS len_sum,
           CAST(sum(n_docs) AS BIGINT) AS n_docs
    FROM fine GROUP BY 1, 2),
  tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_cells
          FROM coarse),
  hot AS (SELECT r0, q0 FROM coarse, tot WHERE coarse.n_docs * tot.n_cells > tot.total)
  SELECT CAST(0 AS BIGINT) AS res, c.r0 AS r, c.q0 AS q, c.len_sum, c.n_docs
  FROM coarse c
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.r0 = c.r0 AND h.q0 = c.q0)
  UNION ALL
  SELECT CAST(1 AS BIGINT) AS res, f.r1 AS r, f.q1 AS q,
         CAST(sum(f.len_sum) AS BIGINT) AS len_sum,
         CAST(sum(f.n_docs) AS BIGINT) AS n_docs
  FROM fine f JOIN hot h ON h.r0 = f.r0 AND h.q0 = f.q0
  GROUP BY 1, 2, 3
  ORDER BY res, r, q
"""
)


def _morton_spread8(v: np.ndarray) -> np.ndarray:
    """8-bit value → even bit positions of a 16-bit value (Morton
    spread via the standard mask ladder; identical constants in the
    SQL mirror)."""
    v = (v | (v << 4)) & 0x0F0F
    v = (v | (v << 2)) & 0x3333
    v = (v | (v << 1)) & 0x5555
    return v


def q_zorder_layout(sf_dir: str) -> Dataset:
    """SPACE-FILLING-CURVE layout keys: each document's geocoded point
    quantises to an 8-bit (ux, uy) grid cell whose Morton (Z-order)
    interleave is the document's LAYOUT KEY; output is the per-z-cell
    census plus the 1024-way shard id (z >> 6).  At 100 TB this is the
    physical-clustering lever: range-partitioning the corpus by z
    colocates spatially-adjacent pages in the same files, so parquet
    row-group min/max statistics prune bounding-box queries to a few
    contiguous z ranges instead of a full scan.  The interleave is the
    standard mask-ladder spread, mirrored constant-for-constant in the
    SQL oracle (DuckDB's <<, &, | are exact on BIGINT)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "doc_id")
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        ux = np.floor(x / 100000.0 * 256.0).astype(np.int64)
        uy = np.floor(y / 100000.0 * 256.0).astype(np.int64)
        z = _morton_spread8(ux) | (_morton_spread8(uy) << 1)
        return pa.table(
            {"z": pa.array(z), "n_chars": batch["n_chars"]}
        )

    census = two_phase_sum(
        ds.map_batches(enc, batch_format="pyarrow"),
        ["z"],
        ["n_chars"],
        count_as="n_docs",
    )

    def shard(batch: pa.Table) -> pa.Table:
        z = batch["z"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "shard": pa.array(z >> 6),
                "z": batch["z"],
                "len_sum": batch["n_chars"],
                "n_docs": batch["n_docs"],
            }
        )

    return census.map_batches(shard, batch_format="pyarrow").sort("z")


SQL_ZORDER_LAYOUT = (
    f"WITH pts AS (SELECT doc_id, n_chars, {_GEO_SQL.format(key='doc_id')} FROM documents),\n"
    + """
  qz AS (
    SELECT n_chars,
           CAST(floor(x / 100000.0 * 256.0) AS BIGINT) AS ux,
           CAST(floor(y / 100000.0 * 256.0) AS BIGINT) AS uy
    FROM pts),
  s1 AS (
    SELECT n_chars,
           ((ux | (ux << 4)) & 3855) AS sx, ((uy | (uy << 4)) & 3855) AS sy
    FROM qz),
  s2 AS (
    SELECT n_chars,
           ((sx | (sx << 2)) & 13107) AS sx, ((sy | (sy << 2)) & 13107) AS sy
    FROM s1),
  s3 AS (
    SELECT n_chars,
           ((sx | (sx << 1)) & 21845) AS sx, ((sy | (sy << 1)) & 21845) AS sy
    FROM s2),
  zc AS (
    SELECT CAST(sx | (sy << 1) AS BIGINT) AS z, n_chars FROM s3)
  SELECT CAST(z >> 6 AS BIGINT) AS shard, z,
         CAST(sum(n_chars) AS BIGINT) AS len_sum, count(*) AS n_docs
  FROM zc GROUP BY z ORDER BY z
"""
)


