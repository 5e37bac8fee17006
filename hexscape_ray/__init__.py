"""hexscape_ray — a Ray-Data-native hex-patch aggregation engine.

A from-scratch rebuild of the *capabilities* of ku-awdc/hexscape
(aggregation of spatial data into discrete hex patches using simple
features; see /root/reference) as a distributed Ray Data engine over
Common-Crawl-style web-page tables:

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every operator is expressed Ray-Data-first: stateless ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages (spatial
indexes, geocoder tables, kernel grids), and keyed shuffles
(``groupby`` / ``sort``) only where semantics require an all-to-all
exchange.

No GEOS / shapely / h3 is available in this environment, so the
geometry kernel (point-in-polygon, convex clipping, areas, WKB codec,
hex-cell index) is implemented in vectorised numpy in
``hexscape_ray.geom`` and ``hexscape_ray.grid``.
"""

from hexscape_ray.config import ENGINE_VERSION, GridSpec
from hexscape_ray._env import install_import_guard

# make worker imports robust to the hosting process's cwd (see _env.py)
install_import_guard()

__version__ = ENGINE_VERSION

__all__ = ["GridSpec", "ENGINE_VERSION", "__version__"]
