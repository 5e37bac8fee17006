"""Hypothesis property tests for the geometry and sketch kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hexscape_ray.geom import (
    clip_ring_convex,
    points_in_polygon,
    polygon_intersection_area_convex,
    ring_area,
)


def _convex(cx, cy, radius, n):
    ang = np.sort(np.linspace(0, 2 * np.pi, n, endpoint=False))
    return np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], axis=1)


@settings(max_examples=40, deadline=None)
@given(
    st.floats(-50, 50), st.floats(-50, 50), st.floats(1, 30),
    st.floats(-50, 50), st.floats(-50, 50), st.floats(1, 30),
    st.integers(3, 9), st.integers(3, 9),
)
def test_clip_area_bounds(ax, ay, ar, bx, by, br, an, bn):
    """area(A ∩ B) ≤ min(area A, area B), ≥ 0."""
    A = _convex(ax, ay, ar, an)
    B = _convex(bx, by, br, bn)
    inter = polygon_intersection_area_convex([A], B)
    assert -1e-9 <= inter <= min(abs(ring_area(A)), abs(ring_area(B))) + 1e-6


@settings(max_examples=40, deadline=None)
@given(
    st.floats(-20, 20), st.floats(-20, 20), st.floats(2, 15), st.integers(3, 8)
)
def test_clip_by_self_is_identity_area(cx, cy, r, n):
    P = _convex(cx, cy, r, n)
    a = abs(ring_area(P))
    assert abs(polygon_intersection_area_convex([P], P) - a) < 1e-6 * max(a, 1)


@settings(max_examples=30, deadline=None)
@given(st.floats(-30, 30), st.floats(-30, 30), st.floats(2, 20), st.integers(4, 8))
def test_clipped_points_inside_both(cx, cy, r, n):
    """Vertices of clip(A, B) lie in (or on) both A and B."""
    A = _convex(cx, cy, r, n)
    B = _convex(0.0, 0.0, 15.0, 6)
    out = clip_ring_convex(A, B)
    if out.shape[0] == 0:
        return
    eps = 1e-6
    grown_a = _convex(cx, cy, r * (1 + 1e-9) + eps, n)
    grown_b = _convex(0.0, 0.0, 15.0 + eps, 6)
    assert points_in_polygon(out[:, 0], out[:, 1], [grown_a]).all()
    assert points_in_polygon(out[:, 0], out[:, 1], [grown_b]).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.floats(0.1, 0.9))
def test_minhash_jaccard_estimation(seed, overlap):
    """Signature agreement estimates shingle-set Jaccard (±0.25 at 64
    perms — a statistical, not exact, property)."""
    from hexscape_ray.stages.dedup import MinHasher

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(200)]
    base = [vocab[i] for i in rng.choice(200, size=80)]
    keep = int(len(base) * overlap)
    other = base[:keep] + [vocab[i] for i in rng.choice(200, size=len(base) - keep)]
    mh = MinHasher()
    sa = mh.signature_from_tokens(base)
    sb = mh.signature_from_tokens(other)
    est = float(np.mean(sa == sb))
    from hexscape_ray.stages.dedup import _shingle_hashes, _token_hashes_from_tokens

    A = set(_shingle_hashes(_token_hashes_from_tokens(base), 5).tolist())
    B = set(_shingle_hashes(_token_hashes_from_tokens(other), 5).tolist())
    true_j = len(A & B) / max(len(A | B), 1)
    assert abs(est - true_j) < 0.3
