"""Minimal ISO WKB codec (little-endian) for Point / Polygon / MultiPolygon.

Geometry columns are Arrow ``binary`` WKB, mirroring the sf geometry
list-columns of the reference data model (SURVEY §1.3) while staying
interoperable (DuckDB spatial, geopandas elsewhere).  Only the three
types the engine materialises are supported.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

_LE = b"\x01"


def point_to_wkb(x: float, y: float) -> bytes:
    return _LE + struct.pack("<I", WKB_POINT) + struct.pack("<dd", x, y)


def linestring_to_wkb(pts) -> bytes:
    """Open path → WKB LineString (the reference's RandomShift audit
    geometry, /root/reference/R/randomise_voronoi.R:235)."""
    p = np.asarray(pts, dtype="<f8")
    return (
        _LE
        + struct.pack("<I", WKB_LINESTRING)
        + struct.pack("<I", p.shape[0])
        + p.tobytes()
    )


def _ring_bytes(ring: np.ndarray) -> bytes:
    r = np.asarray(ring, dtype="<f8")
    if r.shape[0] == 0:
        return struct.pack("<I", 0)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return struct.pack("<I", r.shape[0]) + r.tobytes()


def polygon_to_wkb(rings) -> bytes:
    body = struct.pack("<I", len(rings))
    for ring in rings:
        body += _ring_bytes(ring)
    return _LE + struct.pack("<I", WKB_POLYGON) + body


def multipolygon_to_wkb(polygons) -> bytes:
    body = struct.pack("<I", len(polygons))
    for rings in polygons:
        body += polygon_to_wkb(rings)
    return _LE + struct.pack("<I", WKB_MULTIPOLYGON) + body


def wkb_geom_type(buf: bytes) -> int:
    if buf[0] != 1:
        raise ValueError("only little-endian WKB supported")
    return struct.unpack_from("<I", buf, 1)[0] & 0xFF


def _read_rings(buf: bytes, off: int):
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(
            npts, 2
        )
        rings.append(np.array(arr))  # copy out of the buffer
        off += npts * 16
    return rings, off


def wkb_to_rings(buf: bytes):
    """Decode to ``list[polygon]`` where polygon = list[ring].

    A Point decodes to ``[[array([[x, y]])]]`` for uniform handling.
    """
    t = wkb_geom_type(buf)
    if t == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, 5)
        return [[np.array([[x, y]])]]
    if t == WKB_POLYGON:
        rings, _ = _read_rings(buf, 5)
        return [rings]
    if t == WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(npoly):
            if buf[off] != 1:
                raise ValueError("only little-endian WKB supported")
            (pt,) = struct.unpack_from("<I", buf, off + 1)
            if pt & 0xFF != WKB_POLYGON:
                raise ValueError("MultiPolygon member is not a Polygon")
            rings, off = _read_rings(buf, off + 5)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported WKB geometry type {t}")


def wkb_to_point(buf: bytes) -> tuple[float, float]:
    if wkb_geom_type(buf) != WKB_POINT:
        raise ValueError("not a WKB point")
    return struct.unpack_from("<dd", buf, 5)
