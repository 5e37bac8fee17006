"""Engine configuration and the GridSpec sidecar.

The reference carries grid parameters as R class attributes on the
patches object (``hex_width``, ``min_prop``, ``reference_point``,
``name``; /root/reference/R/generate_patches.R:390-394) which
downstream stages require (/root/reference/R/generate_neighbours.R:17).
We make that contract explicit: a ``GridSpec`` dataclass serialised
into Parquet key-value metadata and validated at read time.
"""

from __future__ import annotations

import hashlib
import json
import math
from dataclasses import asdict, dataclass, field

ENGINE_VERSION = "0.1.0"

# Key under which GridSpec JSON is stored in Parquet file metadata.
GRIDSPEC_META_KEY = b"hexscape_ray.gridspec"
ENGINE_META_KEY = b"hexscape_ray.engine_version"

SQRT3 = math.sqrt(3.0)


@dataclass(frozen=True)
class GridSpec:
    """Parameters of the hex tessellation.

    Mirrors the reference's hexagon constants
    (/root/reference/R/generate_patches.R:43-50):

    - ``hex_width`` (w): horizontal width of the pointy-top hexagon
      (flat vertical sides at x = ±w/2).
    - height corner-to-corner  h = 2w/sqrt(3)
    - side length              s = h/2          (the hex "size")
    - max area                 A = sqrt(3) w^2 / 2

    Centroid of axial cell (r, q) relative to ``(ref_x, ref_y)``
    (/root/reference/R/generate_patches.R:113-115)::

        y = ref_y - r * (s + h) / 2   ==  ref_y - 1.5 * s * r
        x = ref_x + r * w / 2 + q * w ==  ref_x + w * (q + r / 2)

    i.e. the standard pointy-top axial lattice with r increasing
    southwards.  ``resolutions`` defines a multi-resolution pyramid of
    nested-by-convention grids with ``width(res) = hex_width / 2**res``
    (res 0 = coarsest).  Cell ids pack (res, r, q) into one uint64 so
    every shuffle keys on a plain integer column (see grid.py).
    """

    hex_width: float = 2000.0
    ref_x: float = 0.0
    ref_y: float = 0.0
    min_prop: float = 0.01
    name: str = "patch"
    resolutions: tuple = field(default=(0,))
    crs: str = "synthetic-planar"  # no pyproj in-env; planar coords throughout

    @property
    def hex_height(self) -> float:
        return 2.0 * self.hex_width / SQRT3

    @property
    def hex_side(self) -> float:
        return self.hex_height / 2.0

    @property
    def hex_area(self) -> float:
        return SQRT3 * self.hex_width**2 / 2.0

    def width_at(self, res: int) -> float:
        return self.hex_width / (2.0**res)

    def to_json(self) -> str:
        d = asdict(self)
        d["resolutions"] = list(self.resolutions)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "GridSpec":
        d = json.loads(s)
        d["resolutions"] = tuple(d["resolutions"])
        return cls(**d)

    def content_hash(self) -> str:
        """Cache-invalidation token (reference: package-version attr on
        cached objects, /root/reference/R/load_corine.R:187-195)."""
        h = hashlib.sha256()
        h.update(ENGINE_VERSION.encode())
        h.update(self.to_json().encode())
        return h.hexdigest()[:16]


# The default landscape bounding box used by synthetic fixtures and the
# deterministic url geocoder: a 100 km x 100 km planar box.
LANDSCAPE_XMIN = 0.0
LANDSCAPE_YMIN = 0.0
LANDSCAPE_XMAX = 100_000.0
LANDSCAPE_YMAX = 100_000.0

DEFAULT_GRID = GridSpec(
    hex_width=2000.0,
    ref_x=0.0,
    ref_y=100_000.0,
    resolutions=(0, 1, 2),
)
