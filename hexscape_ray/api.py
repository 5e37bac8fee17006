"""Reference-parity facade: every public export of ku-awdc/hexscape
(R/NAMESPACE) under its reference name, bound to the engine function
that implements its semantics — so a user of the reference can switch
by importing ONE module and keeping their call names.

| reference export (R/)            | engine binding                           |
|----------------------------------|------------------------------------------|
| read_map.R                       | sources.readers.read_map                 |
| load_map.R                       | sources.readers.load_map                 |
| all_nuts_codes.R                 | api.all_nuts_codes (thin filter, below)  |
| generate_patches.R               | pipelines.patches.generate_patches       |
| generate_neighbours.R            | pipelines.patches.generate_neighbours    |
| generate_connectedness.R         | pipelines.connectedness.generate_connectedness |
| discretise_grid.R                | api.discretise_grid (hex assign, below)  |
| discretise_habitat.R             | pipelines.habitat.discretise_habitat     |
| discretise_voronoi.R             | pipelines.voronoi.discretise_voronoi     |
| randomise_voronoi.R              | pipelines.voronoi.randomise_voronoi      |
| sample_points.R                  | pipelines.voronoi.sample_points_in_polygons |
| extract_corine.R / load_corine.R | pipelines.hexagg.etl_enrich / enriched_hex_stats |
| extract_clc.R                    | sources.fixtures.gen_clc_codes (codes); landcover ETL above |
| land_use.R                       | pipelines.hexagg.hex_language_mix (LU_* analogue) |
| hs_cache_dir.R / set_storage_folder.R / options.R | config.GridSpec + state.checkpoint.run_partitioned |
| download_maps.R / download_corine.R | NOT BOUND — network fetchers excluded by the no-external-data rule; sources.fixtures.write_fixtures generates the deterministic stand-ins |

Semantics and invariants are documented (with reference file:line
citations) on each bound function's own docstring; this module adds
only the two thin adapters the reference exposes as separate calls.
"""

from __future__ import annotations

import pyarrow as pa

from hexscape_ray.config import GridSpec
from hexscape_ray.pipelines.connectedness import generate_connectedness
from hexscape_ray.pipelines.habitat import discretise_habitat
from hexscape_ray.pipelines.hexagg import (
    enriched_hex_stats,
    etl_enrich,
    hex_counts,
    hex_language_mix,
)
from hexscape_ray.pipelines.patches import generate_neighbours, generate_patches
from hexscape_ray.pipelines.voronoi import (
    discretise_voronoi,
    randomise_voronoi,
    sample_points_in_polygons as sample_points,
)
from hexscape_ray.sources.fixtures import gen_clc_codes, write_fixtures
from hexscape_ray.sources.readers import load_map, read_map
from hexscape_ray.state.checkpoint import run_partitioned


def all_nuts_codes(admin: pa.Table, level: int | None = None) -> list[str]:
    """S4 (/root/reference/R/all_nuts_codes.R): every admin code in the
    map table, optionally restricted to one level — the reference
    derives this from the same storage `load_map` reads, so here it is
    the same filter surfaced under its own name."""
    import pyarrow.compute as pc

    t = admin
    if level is not None:
        t = t.filter(pc.equal(t.column("level"), level))
    return sorted(set(t.column("code").to_pylist()))


def discretise_grid(points, spec: GridSpec | None = None, res: int = 0):
    """discretise_grid.R semantics: assign points to hex cells and
    count per cell — the engine's `hex_counts` under the reference
    name (hex assignment = grid.point_to_axial, oracle-checked)."""
    from hexscape_ray.pipelines.hexagg import DEFAULT_GRID

    return hex_counts(points, spec or DEFAULT_GRID, res=res)


__all__ = [
    "GridSpec",
    "all_nuts_codes",
    "discretise_grid",
    "discretise_habitat",
    "discretise_voronoi",
    "enriched_hex_stats",
    "etl_enrich",
    "gen_clc_codes",
    "generate_connectedness",
    "generate_neighbours",
    "generate_patches",
    "hex_language_mix",
    "load_map",
    "randomise_voronoi",
    "read_map",
    "run_partitioned",
    "sample_points",
    "write_fixtures",
]
