"""Stateless encode stages: url→point geocode, point→hex-cell ids.

These are the engine's M1/M-web operators (SURVEY §2.2): pure per-row
math, fully vectorised, no shuffle
(/root/reference/R/generate_patches.R:85-122 for the axial math).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexscape_ray.config import GridSpec
from hexscape_ray.functions.geocode import geocode_urls, geocode_ids
from hexscape_ray.functions.hashing import fnv1a_64_str_array
from hexscape_ray import grid


def geocode_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Add x, y (planar point) + url_hash columns from the url host.

    Hot path: hashes the string column STRAIGHT FROM ITS ARROW BUFFERS
    (offsets + utf-8 bytes) with the vectorised range-FNV — no Python
    string materialisation (measured ~10 µs/doc → ~1 µs/doc; this stage
    runs on every page of the corpus).  Falls back to the scalar
    ``geocode_urls`` path on nulls / non-string storage, which also
    serves as the parity oracle in tests.
    """
    from hexscape_ray.functions.geocode import LANDSCAPE_SPAN_X, LANDSCAPE_SPAN_Y
    from hexscape_ray.functions.hashing import fnv1a_64_ranges, host_ranges
    from hexscape_ray.config import LANDSCAPE_XMIN, LANDSCAPE_YMIN

    col = batch[url_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count or not pa.types.is_string(arr.type):
        urls = batch[url_col].to_pylist()
        x, y = geocode_urls(urls)
        h = fnv1a_64_str_array(urls).astype(np.int64)
    else:
        _, off_buf, data_buf = arr.buffers()
        offsets = np.frombuffer(off_buf, dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(data_buf, dtype=np.uint8)
        h = fnv1a_64_ranges(data, offsets[:-1], offsets[1:]).astype(np.int64)
        hs, he = host_ranges(data, offsets)
        hh = fnv1a_64_ranges(data, hs, he)
        fx = (hh & np.uint64(0xFFFFFFFF)).astype(np.float64) / 4294967296.0
        fy = (hh >> np.uint64(32)).astype(np.float64) / 4294967296.0
        x = LANDSCAPE_XMIN + fx * LANDSCAPE_SPAN_X
        y = LANDSCAPE_YMIN + fy * LANDSCAPE_SPAN_Y
    return (
        batch.append_column("x", pa.array(x))
        .append_column("y", pa.array(y))
        .append_column("url_hash", pa.array(h))
    )


def geocode_ids_batch(batch: pa.Table, key_col: str) -> pa.Table:
    """Knuth-hash geocode from an integer key (oracle-parity path)."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    x, y = geocode_ids(keys)
    return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def hex_encode_batch(
    batch: pa.Table,
    spec: GridSpec,
    resolutions: tuple | None = None,
    with_axial: bool = True,
) -> pa.Table:
    """Add packed cell-id columns ``cell_r{res}`` per resolution (+
    reference-parity axial ``r``/``q`` at the base resolution)."""
    x = batch["x"].to_numpy(zero_copy_only=False)
    y = batch["y"].to_numpy(zero_copy_only=False)
    resolutions = resolutions or spec.resolutions
    for res in resolutions:
        r, q = grid.point_to_axial(x, y, spec, res)
        batch = batch.append_column(
            f"cell_r{res}", pa.array(grid.pack_cell(np.full(r.shape, res), r, q))
        )
        if with_axial and res == resolutions[0]:
            batch = batch.append_column("r", pa.array(r)).append_column(
                "q", pa.array(q)
            )
    return batch


def square_encode_batch(
    batch: pa.Table, tile_size: float, out: str = "tile_id"
) -> pa.Table:
    """S2-style fallback key (quadtree square tile) — also the
    SQL-expressible key the DuckDB oracle reproduces."""
    x = batch["x"].to_numpy(zero_copy_only=False)
    y = batch["y"].to_numpy(zero_copy_only=False)
    return batch.append_column(out, pa.array(grid.square_tile_id(x, y, tile_size)))
