"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in hexscape_ray) initialises or shuts down Ray.

- ``entry()``: flagship per-hex aggregation over sf0.001 — documents
  geocoded to points (deterministic Knuth hash), encoded to hex cells
  (cube rounding on the reference's axial lattice,
  /root/reference/R/generate_patches.R:85-122), aggregated two-phase
  with a wide language-mix pivot (Σ proportions = 1,
  /root/reference/R/generate_patches.R:346-355).
- ``queries()`` / ``oracle_sql()``: the operator registry in
  ``hexscape_ray.pipelines.queries`` — each Ray pipeline paired with a
  bit-identical DuckDB SQL oracle where SQL can express it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the driver may import this module with any cwd — make the package
# importable regardless
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

# Ray's OPTIONAL http-filesystem import fails in this env (no aiohttp)
# and failed imports are not cached, so CONCURRENT first reads can race
# Python's import machinery ("cannot import name HTTPFileSystem").
# Stub aiohttp so the optional import succeeds once and is cached; the
# http filesystem is never used (every path here is local parquet).
import types as _types

for _m in ("aiohttp", "yarl"):  # both imported at http.py module top
    if _m not in sys.modules:
        try:
            __import__(_m)
        except ImportError:
            sys.modules[_m] = _types.ModuleType(_m)
try:
    import fsspec.implementations.http  # noqa: F401  (now cached OK)
except Exception:
    pass

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: per-hex doc counts + lang mix."""
    from hexscape_ray.pipelines.queries import q_hex_lang_mix

    return q_hex_lang_mix(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from hexscape_ray.pipelines.queries import RAY_QUERIES

    return dict(RAY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from hexscape_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
