"""Polygon→polygon assignment (S1a 3-stage fallback), DP simplify,
GridSpec metadata round-trip."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from hexscape_ray.config import ENGINE_VERSION, GridSpec
from hexscape_ray.geom.poly import ring_area, simplify_ring
from hexscape_ray.geom.wkb import polygon_to_wkb
from hexscape_ray.sources.readers import (
    SpecMismatch,
    read_table_with_spec,
    write_table_with_spec,
)
from hexscape_ray.stages.spatial import assign_polygons_to_polygons


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)


S = 1000.0  # parents span the full 100 km landscape


@pytest.fixture(scope="module")
def parents():
    return pa.table(
        {
            "code": pa.array(["P0", "P1"]),
            "wkb": pa.array(
                [
                    # a gap strip 48k..52k exercises the fallback stages
                    polygon_to_wkb([_rect(0, 0, 48 * S, 100 * S)]),
                    polygon_to_wkb([_rect(52 * S, 0, 100 * S, 100 * S)]),
                ],
                type=pa.binary(),
            ),
        }
    )


def test_assign_polygons_three_stages(ray_session, parents):
    children = pa.table(
        {
            "cid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "wkb": pa.array(
                [
                    polygon_to_wkb([_rect(10 * S, 10 * S, 20 * S, 20 * S)]),  # in P0
                    polygon_to_wkb([_rect(60 * S, 10 * S, 70 * S, 20 * S)]),  # in P1
                    # centroid (51k) in the gap; overlap P0=3k, P1=5k → max-area P1
                    polygon_to_wkb([_rect(45 * S, 40 * S, 57 * S, 50 * S)]),
                    # disjoint from both
                    polygon_to_wkb([_rect(200 * S, 200 * S, 210 * S, 210 * S)]),
                    # centroid (50k) in the gap; equal 3k overlaps → strict
                    # deterministic tie-break on parent id → P0
                    polygon_to_wkb([_rect(45 * S, 40 * S, 55 * S, 50 * S)]),
                ],
                type=pa.binary(),
            ),
        }
    )
    out = (
        assign_polygons_to_polygons(ray.data.from_arrow(children), parents)
        .to_pandas()
        .sort_values("cid", ignore_index=True)
    )
    assert out["parent_code"].tolist() == ["P0", "P1", "P1", "", "P0"]


def test_assign_exactly_one_parent(ray_session, parents, fixture_dir):
    """Every land-cover cell gets exactly one parent (the LAU→NUTS3
    invariant) on the full fixture."""
    import pyarrow.parquet as pq

    lc = pq.read_table(f"{fixture_dir}/landcover.parquet")
    out = assign_polygons_to_polygons(ray.data.from_arrow(lc), parents).to_pandas()
    assert (out["parent_code"] != "").all()
    assert set(out["parent_code"]) == {"P0", "P1"}


def test_simplify_ring_reduces_points_keeps_area():
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    ring = np.stack([np.cos(t) * 100, np.sin(t) * 100], axis=1)
    ring = np.vstack([ring, ring[:1]])
    simp = simplify_ring(ring, tolerance=1.0)
    assert simp.shape[0] < ring.shape[0] / 3
    a0, a1 = abs(ring_area(ring)), abs(ring_area(simp))
    assert abs(a1 - a0) / a0 < 0.02  # area-loss audit (A4 metric)
    # degenerate inputs survive
    tri = np.array([[0.0, 0], [1, 0], [0, 1], [0, 0]])
    assert np.array_equal(simplify_ring(tri, 10.0), tri)


def test_gridspec_metadata_roundtrip(tmp_path):
    spec = GridSpec(hex_width=1234.0, ref_x=1.0, ref_y=2.0)
    t = pa.table({"a": pa.array([1, 2, 3])})
    p = str(tmp_path / "t.parquet")
    write_table_with_spec(t, p, spec)
    back, got = read_table_with_spec(p, expect_spec=spec)
    assert got == spec
    assert back.column("a").to_pylist() == [1, 2, 3]
    with pytest.raises(SpecMismatch):
        read_table_with_spec(p, expect_spec=GridSpec(hex_width=999.0))
    import pyarrow.parquet as pq

    pq.write_table(t, p)  # plain file → no metadata
    with pytest.raises(SpecMismatch):
        read_table_with_spec(p)
