"""Deterministic geocoding: url/host -> planar point.

The north rule requires "every web page a point geometry geocoded from
its url/host".  With no network or geo databases, geocoding is a
deterministic hash map: pages from the same host land on the same
point (so hot hosts create hot hex cells — the skew the engine must
handle), and the map is reproducible across runs and parallelism
levels.

Two keying schemes:

- ``geocode_hosts``: FNV-1a over the host string (the real pipeline).
- ``geocode_ids``: Knuth multiplicative hash over an integer key —
  bit-identical to plain SQL, used for the DuckDB-oracle queries over
  the driver's ``documents`` table (which has ``doc_id`` not ``url``).
"""

from __future__ import annotations

import numpy as np

from hexscape_ray.config import (
    LANDSCAPE_XMAX,
    LANDSCAPE_XMIN,
    LANDSCAPE_YMAX,
    LANDSCAPE_YMIN,
)
from hexscape_ray.functions.hashing import (
    MULT_A,
    MULT_B,
    fnv1a_64_str_array,
    knuth_frac,
)


def host_of(url: str) -> str:
    """scheme://host/path -> host (no urllib needed; pure slicing)."""
    i = url.find("://")
    rest = url[i + 3 :] if i >= 0 else url
    j = rest.find("/")
    return rest[:j] if j >= 0 else rest


def hosts_of(urls) -> list[str]:
    return [host_of(u) for u in urls]


def geocode_hosts(hosts) -> tuple[np.ndarray, np.ndarray]:
    """host strings -> (x, y) float64 inside the landscape bbox."""
    h = fnv1a_64_str_array(hosts)
    fx = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 4294967296.0
    fy = (h >> np.uint64(32)).astype(np.float64) / 4294967296.0
    x = LANDSCAPE_XMIN + fx * (LANDSCAPE_XMAX - LANDSCAPE_XMIN)
    y = LANDSCAPE_YMIN + fy * (LANDSCAPE_YMAX - LANDSCAPE_YMIN)
    return x, y


def geocode_urls(urls) -> tuple[np.ndarray, np.ndarray]:
    return geocode_hosts(hosts_of(urls))


def geocode_ids(keys) -> tuple[np.ndarray, np.ndarray]:
    """integer keys -> (x, y); SQL equivalent (DuckDB)::

        x = ((doc_key * 2654435761) % 4294967296) / 4294967296.0 * 100000.0
        y = ((doc_key * 2246822519) % 4294967296) / 4294967296.0 * 100000.0
    """
    fx = knuth_frac(keys, MULT_A)
    fy = knuth_frac(keys, MULT_B)
    x = LANDSCAPE_XMIN + fx * (LANDSCAPE_XMAX - LANDSCAPE_XMIN)
    y = LANDSCAPE_YMIN + fy * (LANDSCAPE_YMAX - LANDSCAPE_YMIN)
    return x, y


LANDSCAPE_SPAN_X = LANDSCAPE_XMAX - LANDSCAPE_XMIN
LANDSCAPE_SPAN_Y = LANDSCAPE_YMAX - LANDSCAPE_YMIN
