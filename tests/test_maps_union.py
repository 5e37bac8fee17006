"""read_map / load_map (S2/S3), group-union by class (A2), affine
transform (M9)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from hexscape_ray.sources.fixtures import gen_admin
from hexscape_ray.sources.readers import load_map, read_map
from hexscape_ray.stages.spatial import affine_transform_batch, group_union_by_class


@pytest.fixture(scope="module")
def admin():
    return gen_admin()


def test_read_map_one_country(admin):
    out = read_map(admin, "A")
    assert out.num_rows == 21  # 1 + 4 + 16
    with pytest.raises(ValueError, match="level-0"):
        read_map(admin, "A0")  # no level-0 row under prefix A0


def test_load_map_prefix_expansion(admin):
    out = load_map(admin, ["A0"])
    codes = out.column("code").to_pylist()
    assert "A0" in codes
    assert all(c.startswith("A0") for c in codes)
    assert len(codes) == 5  # A0 + 4 subregions
    lvl2 = load_map(admin, ["A0", "A1"], level=2)
    assert lvl2.num_rows == 8
    assert set(lvl2.column("level").to_pylist()) == {2}
    empty = load_map(admin, [])
    assert empty.num_rows == 0


def test_group_union_by_class(ray_session, fixture_dir):
    lc = pq.read_table(f"{fixture_dir}/landcover.parquet")
    ds = ray.data.from_arrow(lc)
    out = group_union_by_class(ds).to_pandas()
    # one row per class present
    assert set(out["clc"]) == set(lc.column("clc").to_pylist())
    # part counts partition the input rows
    assert out["n_parts"].sum() == lc.num_rows
    # union areas sum to the covered landscape (cells are disjoint)
    covered = out["union_area"].sum()
    assert abs(covered - (1600 - 8) * 2500.0**2) < 1e-3
    # merged WKB decodes to the same number of parts
    from hexscape_ray.geom.wkb import wkb_to_rings

    row = out.iloc[0]
    assert len(wkb_to_rings(row["wkb"])) == row["n_parts"]


def test_affine_transform():
    t = pa.table({"x": pa.array([1.0, 2.0]), "y": pa.array([3.0, 4.0])})
    out = affine_transform_batch(t, scale=1000.0, dx=5.0, dy=-5.0)
    assert out["x"].to_pylist() == [1005.0, 2005.0]
    assert out["y"].to_pylist() == [2995.0, 3995.0]


def test_group_union_overlapping_inputs(ray_session):
    """The round-1 disjoint-inputs assumption is gone: overlapping
    polygons in one class contribute their overlap ONCE to
    union_area, and touching parts merge into one component."""
    import numpy as np
    import pyarrow as pa

    from hexscape_ray.geom.wkb import polygon_to_wkb

    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)

    lc = pa.table(
        {
            "clc": pa.array(["a", "a", "b", "b"]),
            "wkb": pa.array(
                [
                    polygon_to_wkb([sq(0, 0, 10, 10)]),
                    polygon_to_wkb([sq(5, 5, 15, 15)]),  # overlaps the first
                    polygon_to_wkb([sq(0, 0, 10, 10)]),
                    polygon_to_wkb([sq(20, 0, 30, 10)]),  # disjoint
                ],
                type=pa.binary(),
            ),
        }
    )
    out = (
        group_union_by_class(ray.data.from_arrow(lc))
        .to_pandas()
        .set_index("clc")
    )
    assert abs(out.loc["a", "union_area"] - 175.0) < 1e-9  # 100+100−25
    assert out.loc["a", "n_components"] == 1
    assert abs(out.loc["b", "union_area"] - 200.0) < 1e-9
    assert out.loc["b", "n_components"] == 2
    assert out.loc["a", "n_parts"] == 2
