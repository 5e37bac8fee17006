"""Query registry: every driver-checkable operator, as (Ray callable,
DuckDB oracle SQL) pairs over the /root/testdata tables.

Float-determinism rules (the driver hash-compares values):

- integer aggregates only (counts, exact cents/int sums) — float sums
  are order-dependent under parallel reduction;
- derived floats only as a final division of exact integers (identical
  operands → identical IEEE doubles in numpy and DuckDB);
- rounding is ALWAYS ``floor(x + 0.5)`` (numpy round is half-even,
  DuckDB ROUND is half-away — so neither is used on the parity path);
- the hex-cell assignment (cube rounding) is reproduced verbatim in
  SQL — see ``_hex_cte`` — against the same Knuth-hash geocode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from hexscape_ray.config import DEFAULT_GRID
from hexscape_ray.stages.agg import two_phase_sum
from hexscape_ray.stages.encode import geocode_ids_batch, hex_encode_batch, square_encode_batch
from hexscape_ray.stages.joins import broadcast_join

SPEC = DEFAULT_GRID
DOC_LANGS = ["de", "en", "es", "fr", "zh"]  # driver documents table langs


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> Dataset:
    # explicit metadata-free schema: the testdata files carry pandas
    # schema metadata that defeats Ray's schema-dedup hash (cosmetic
    # "Failed to hash the schemas" warning on every read otherwise)
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.ParquetFile(path).schema_arrow.remove_metadata()
    if columns is not None:  # schema must match the pruned column set
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _table_nrows(sf_dir: str, table: str) -> int:
    """Row count from the parquet FOOTER (milliseconds) — a bare
    ``_read(...).count()`` launches a Ray job (~1-1.5 s of fixed
    latency on this box, measured in basket_lift). Only valid for
    whole-table counts; filtered/derived datasets still count()."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows



# ---------------------------------------------------------------------------
# SQL building blocks
# ---------------------------------------------------------------------------

def _splitmix64_sql(x_expr: str, carry: str = "__k", src: str = "__kmv_in") -> str:
    """splitmix64 over HUGEINT in [0, 2^64) — verified element-exact
    against hexscape_ray.functions.hashing.splitmix64.  Multiplies via
    lo/hi 32-bit limbs: (a·b) mod 2^64 = (a_lo·b_lo + ((a_lo·b_hi +
    a_hi·b_lo) mod 2^32)·2^32) mod 2^64, every partial < 2^96 (a
    straight HUGEINT product of two 64-bit values would overflow
    int128).  ``carry`` columns pass through untouched."""
    m64, m32 = "18446744073709551616", "4294967296"
    c1_lo, c1_hi = 13787848793156543929 % 2**32, 13787848793156543929 >> 32
    c2_lo, c2_hi = 10723548738846746397 % 2**32, 10723548738846746397 >> 32

    def mul(z: str, lo: int, hi: int) -> str:
        return (
            f"((({z}) % {m32}) * {lo}"
            f" + (((({z}) % {m32}) * {hi} + (({z}) // {m32}) * {lo}) % {m32}) * {m32}"
            f") % {m64}"
        )

    def xsh(z: str, sh: int) -> str:
        return f"CAST(xor(CAST({z} AS UBIGINT), CAST(({z}) // {2**sh} AS UBIGINT)) AS HUGEINT)"

    z1 = f"((({x_expr}) % {m64} + {m64}) % {m64} + 11400714819323198485) % {m64}"
    return (
        f"SELECT {carry}, {xsh('__z3', 31)} AS h FROM ("
        f"  SELECT {carry}, {mul('__z2x', c2_lo, c2_hi)} AS __z3 FROM ("
        f"    SELECT {carry}, {xsh('__z2', 27)} AS __z2x FROM ("
        f"      SELECT {carry}, {mul('__z1x', c1_lo, c1_hi)} AS __z2 FROM ("
        f"        SELECT {carry}, {xsh('__z1', 30)} AS __z1x FROM ("
        f"          SELECT {carry}, {z1} AS __z1 FROM {src}"
        f"        )"
        f"      )"
        f"    )"
        f"  )"
        f")"
    )



# geocode: key -> (x, y) in the 100 km landscape (functions/geocode.py)
_GEO_SQL = """
    ((({key}) * 2654435761) % 4294967296) / 4294967296.0 * 100000.0 AS x,
    ((({key}) * 2246822519) % 4294967296) / 4294967296.0 * 100000.0 AS y
"""

# point -> axial hex cell: fractional axial + cube rounding, identical
# expression tree to grid.point_to_axial (half-up floor rounding).
# Generated from a GridSpec so the oracle follows ANY lattice the
# engine is configured with (constants emitted at full float repr
# precision; expression order mirrors the numpy code exactly).


def axial_sql(spec=None, res: int = 0) -> str:
    spec = spec or SPEC
    w = spec.width_at(res)
    return f"""
  frac AS (
    SELECT *,
      ({spec.ref_y!r} - y) / (1.5 * (2.0 * {w!r} / sqrt(3.0) / 2.0)) AS rf
    FROM pts
  ),
  frac2 AS (
    SELECT *, (x - {spec.ref_x!r}) / {w!r} - rf / 2.0 AS qf FROM frac
  ),
  cube AS (
    SELECT *,
      floor(qf + 0.5) AS rx,
      floor((-qf - rf) + 0.5) AS ry,
      floor(rf + 0.5) AS rz,
      abs(floor(qf + 0.5) - qf) AS dx,
      abs(floor((-qf - rf) + 0.5) - (-qf - rf)) AS dy,
      abs(floor(rf + 0.5) - rf) AS dz
    FROM frac2
  ),
  hexed AS (
    SELECT *,
      CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q,
      CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND dz > dy THEN -rx - ry
                ELSE rz END AS BIGINT) AS r
    FROM cube
  )
"""


_AXIAL_SQL = axial_sql(res=0)


def _hex_cte(table_sql: str, key: str, payload: str) -> str:
    """WITH-prefix computing r, q for each row of ``table_sql``."""
    geo = _GEO_SQL.format(key=key)
    return f"WITH pts AS (SELECT {payload}, {geo} FROM {table_sql}),\n{_AXIAL_SQL}"


def _hex_prepare(ds: Dataset, key_col: str) -> Dataset:
    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, key_col)
        return hex_encode_batch(batch, SPEC, resolutions=(0,))

    return ds.map_batches(enc, batch_format="pyarrow")




# driver-cached tiny-dimension reads (moved here from the TPC-H
# completion section: it is referenced across families)
_TINY_ROWS_CACHE: dict[tuple[str, str], list] = {}


def _tiny_rows(sf_dir: str, table: str) -> list:
    """Driver-cached full read of a <=25-row immutable dimension table
    (nation / region). Several TPC-H-shaped queries hop these
    dimensions 2-3 times each and every avoided Ray round trip is
    ~0.2 s of fixed scheduling latency on this box."""
    k = (sf_dir, table)
    if k not in _TINY_ROWS_CACHE:
        _TINY_ROWS_CACHE[k] = _read(sf_dir, table).take_all()
    return _TINY_ROWS_CACHE[k]
