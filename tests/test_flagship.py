"""Flagship per-hex aggregation: invariants ported from the reference
(/root/reference/R/generate_patches.R:346-355 proportions-sum-to-1;
:280,332 grid completion) plus parallelism-invariance."""

import numpy as np
import pytest
import ray.data

from hexscape_ray.pipelines.hexagg import LANGS, hex_counts, hex_language_mix


@pytest.fixture(scope="module")
def pages_ds(ray_session, fixture_dir):
    return ray.data.read_parquet(
        f"{fixture_dir}/pages.parquet", columns=["url", "text", "lang"]
    )


def test_lang_mix_proportions_sum_to_one(pages_ds):
    out = hex_language_mix(pages_ds).to_pandas()
    lu = out[[f"LU_{l}" for l in LANGS]].to_numpy().sum(axis=1)
    assert np.allclose(lu, 1.0, atol=1.5e-8)
    assert out["n_docs"].sum() == 3000
    assert (out["len_mean"] > 0).all()
    # len_mean is an exact division of exact ints
    assert np.allclose(out["len_mean"], out["len_sum"] / out["n_docs"])


def test_counts_consistent_with_mix(pages_ds, fixture_dir):
    mix = hex_language_mix(pages_ds).to_pandas()
    cnt = hex_counts(
        ray.data.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "text", "lang"])
    ).to_pandas()
    assert len(mix) == len(cnt)
    a = mix.sort_values("cell")["n_docs"].to_numpy()
    b = cnt.sort_values("cell_r0")["n_docs"].to_numpy()
    assert np.array_equal(a, b)


def test_parallelism_invariance(fixture_dir):
    """Same result across different block structures — the in-sandbox
    analogue of cross-cluster-size determinism (north rule)."""
    base = ray.data.read_parquet(
        f"{fixture_dir}/pages.parquet", columns=["url", "text", "lang"]
    )
    a = hex_language_mix(base).to_pandas().sort_values("cell", ignore_index=True)
    re = ray.data.read_parquet(
        f"{fixture_dir}/pages.parquet", columns=["url", "text", "lang"]
    ).repartition(13)
    b = hex_language_mix(re).to_pandas().sort_values("cell", ignore_index=True)
    assert a.columns.tolist() == b.columns.tolist()
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(a[c], b[c], atol=0)
        else:
            assert a[c].equals(b[c])


def test_hot_cell_skew_present(pages_ds):
    """Zipf hosts must produce a skewed cell histogram (the thing the
    salted aggregate exists for)."""
    out = hex_language_mix(pages_ds).to_pandas()
    top = out["n_docs"].max()
    med = out["n_docs"].median()
    assert top > 10 * med
