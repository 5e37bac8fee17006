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


# ---------------------------------------------------------------------------
# round-4 continuation kernels
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 63)),
                min_size=1, max_size=120))
def test_skyline_scan_matches_bruteforce(pairs):
    from hexscape_ray.pipelines.queries import _skyline_scan

    arr = np.array(sorted(set(pairs)), dtype=np.int64)
    price, qty = arr[:, 0], arr[:, 1]
    n = np.ones(price.size, dtype=np.int64)
    p, q, _ = _skyline_scan(price.copy(), qty.copy(), n)
    got = set(zip(p.tolist(), q.tolist()))
    expect = set()
    for i in range(price.size):
        dominated = any(
            (price[j] <= price[i] and qty[j] <= qty[i]
             and (price[j] < price[i] or qty[j] < qty[i]))
            for j in range(price.size)
        )
        if not dominated:
            expect.add((int(price[i]), int(qty[i])))
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=2, max_size=200))
def test_morton_interleave_bijective(vals):
    from hexscape_ray.pipelines.queries import _morton_spread8

    v = np.array(vals, dtype=np.int64)
    x, y = v[: len(v) // 2], v[len(v) // 2: 2 * (len(v) // 2)]
    z = _morton_spread8(x) | (_morton_spread8(y) << 1)
    # de-interleave inverts exactly
    def unspread(s):
        s = s & 0x5555
        s = (s | (s >> 1)) & 0x3333
        s = (s | (s >> 2)) & 0x0F0F
        return (s | (s >> 4)) & 0x00FF
    assert np.array_equal(unspread(z), x)
    assert np.array_equal(unspread(z >> 1), y)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2_000_000_000))
def test_civil_year_matches_datetime64(us_seconds):
    from hexscape_ray.pipelines.queries import _civil_year_from_us

    us = np.array([us_seconds * 1_000_000], dtype=np.int64)
    got = _civil_year_from_us(us)[0]
    expect = np.datetime64(us_seconds * 1_000_000, "us").astype("datetime64[Y]")
    assert got == int(str(expect))


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_gif_roundtrip_random_shapes(h, w, seed):
    from hexscape_ray.functions.codecs import _GIF_CUBE, decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    q = np.minimum(img.astype(np.int64) * 6 // 256, 5)
    expect = _GIF_CUBE[
        (q[:, :, 0] * 36 + q[:, :, 1] * 6 + q[:, :, 2]).ravel()
    ].reshape(h, w, 3)
    assert np.array_equal(decode_gif(encode_gif(img)), expect)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=60),
       st.integers(2, 6))
def test_winnow_guarantee_property(hashes, w):
    """Every gram position is covered by ≥1 fingerprint within w-1
    positions (the winnowing coverage guarantee), and all picks are
    window minima."""
    g = np.array(hashes, dtype=np.int64).view(np.uint64)
    n = g.size
    if n <= w:
        m = g.min()
        pos = np.array([np.flatnonzero(g == m)[-1]])
    else:
        win = np.lib.stride_tricks.sliding_window_view(g, w)
        pick = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        pos = np.unique(pick + np.arange(win.shape[0]))
    # coverage: every window [i, i+w) contains a pick
    for i in range(max(1, n - w + 1)):
        assert any((p >= i) and (p < i + w) for p in pos)


def test_hilbert_bijective_and_adjacent():
    """The 8-level Hilbert index is a bijection on the 256x256 grid and
    consecutive indices are ALWAYS 4-adjacent — the locality property
    Morton lacks (and the reason hilbert_layout exists)."""
    import numpy as np

    from hexscape_ray.pipelines.queries import _hilbert_xy2d8

    g = np.arange(256, dtype=np.int64)
    ux, uy = np.meshgrid(g, g, indexing="ij")
    d = _hilbert_xy2d8(ux.ravel(), uy.ravel())
    assert np.array_equal(np.sort(d), np.arange(65536))
    order = np.argsort(d)
    xs, ys = ux.ravel()[order], uy.ravel()[order]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert np.all(step == 1)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200))
def test_popcount64_matches_bit_count(vals):
    from hexscape_ray.stages.multimodal import popcount64

    arr = np.array(vals, dtype=np.uint64)
    got = popcount64(arr)
    want = np.array([int(v).bit_count() for v in vals], dtype=np.int64)
    assert (got == want).all()


def test_bootstrap_ladder_marginals():
    """The frozen Poisson(1) cut points give k-marginals within 1% of
    e^-1/k! over a large deterministic hash sample."""
    import math

    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.pipelines.queries import _BOOT_T

    h = splitmix64(np.arange(2_000_000, dtype=np.uint64))
    ts = np.array(_BOOT_T, dtype=np.uint64)
    k = (h[:, None] >= ts[None, :]).sum(axis=1)
    e = math.exp(-1.0)
    for kk in range(5):
        want = e / math.factorial(kk)
        got = float((k == kk).mean())
        assert abs(got - want) < 0.01, (kk, got, want)
    assert int(k.max()) <= 7


def test_moran_sign_on_known_configurations():
    """Moran numerator: clustered blob > 0, checkerboard < 0 — the
    exact-integer statistic (same formula as q_hex_moran) has the
    textbook signs on known lattices."""

    def moran_num(cells):
        n = len(cells)
        s = sum(cells.values())
        z = {k: n * v - s for k, v in cells.items()}
        szz = 0
        for (r, q), zi in z.items():
            for dr, dq in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
                zj = z.get((r + dr, q + dq))
                if zj is not None:
                    szz += zi * zj
        return n * szz

    blob = {}
    for r in range(6):
        for q in range(6):
            blob[(r, q)] = 10 if (r < 3 and q < 3) else 1
    assert moran_num(blob) > 0
    checker = {(r, q): (10 if (r + q) % 2 == 0 else 1) for r in range(6) for q in range(6)}
    assert moran_num(checker) < 0


def test_dbscan_labels_match_bruteforce_reachability():
    """Union-find min-code labels == brute-force closure min over a
    random dense-cell lattice (the q_hex_dbscan invariant)."""
    rng = np.random.default_rng(5)
    dense = {
        (int(r), int(q))
        for r, q in zip(rng.integers(0, 12, 60), rng.integers(0, 12, 60))
    }
    offs = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))

    def code(k):
        return (k[0] + 1024) * 2048 + (k[1] + 1024)

    # brute closure
    want = {}
    for start in dense:
        seen = {start}
        frontier = [start]
        while frontier:
            cur = frontier.pop()
            for dr, dq in offs:
                nb = (cur[0] + dr, cur[1] + dq)
                if nb in dense and nb not in seen:
                    seen.add(nb)
                    frontier.append(nb)
        want[start] = min(code(k) for k in seen)

    parent = {k: k for k in dense}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for k in dense:
        for dr, dq in offs:
            b = (k[0] + dr, k[1] + dq)
            if b in dense:
                ra, rb = find(k), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if code(ra) < code(rb) else (rb, ra)
                    parent[hi] = lo
    got = {k: code(find(k)) for k in dense}
    assert got == want
