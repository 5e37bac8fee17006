"""Pure-numpy computational-geometry kernel.

Replaces the GEOS operations the reference leans on via ``sf``
(st_area, st_centroid, st_intersects, st_intersection, st_difference,
st_voronoi, st_union) — no shapely/GEOS is available in this
environment.  All kernels are vectorised over points or rings so they
run inside ``map_batches`` without per-row Python.

Geometry model:

- ring: ``(n, 2)`` float64 array, closed or open (first point need not
  be repeated; functions close implicitly).
- polygon: ``list[ring]`` — ring 0 is the exterior shell, rings 1..k
  are holes (even-odd rule).
- multipolygon: ``list[polygon]``.
- serialised form: ISO WKB (``geom.wkb``) stored in Arrow ``binary``
  columns, so tables round-trip through Parquet and are readable by
  DuckDB spatial tooling elsewhere.
"""

from hexscape_ray.geom.poly import (
    ring_area,
    polygon_area,
    polygon_centroid,
    rings_bbox,
    points_in_polygon,
    point_segment_distance,
)
from hexscape_ray.geom.clip import (
    clip_ring_convex,
    clip_polygon_convex,
    clip_halfplane,
    polygon_intersection_area_convex,
)
from hexscape_ray.geom.wkb import (
    polygon_to_wkb,
    multipolygon_to_wkb,
    point_to_wkb,
    wkb_to_rings,
    wkb_geom_type,
)

__all__ = [
    "ring_area",
    "polygon_area",
    "polygon_centroid",
    "rings_bbox",
    "points_in_polygon",
    "point_segment_distance",
    "clip_ring_convex",
    "clip_polygon_convex",
    "clip_halfplane",
    "polygon_intersection_area_convex",
    "polygon_to_wkb",
    "multipolygon_to_wkb",
    "point_to_wkb",
    "wkb_to_rings",
    "wkb_geom_type",
]
