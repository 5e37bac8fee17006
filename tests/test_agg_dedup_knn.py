"""two-phase/salted aggregation equivalence, dedup stages, knn."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from hexscape_ray.stages.agg import add_salt, salted_sum, two_phase_sum
from hexscape_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    embedding_near_dup,
    exact_dedup,
    minhash_candidate_pairs,
)
from hexscape_ray.stages.joins import bucketed_join
from hexscape_ray.stages.knn import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def kv_ds(ray_session):
    rng = np.random.default_rng(2)
    n = 20_000
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 50, n)),
                "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
                "h": pa.array(rng.integers(0, 2**62, n).astype(np.int64)),
            }
        )
    ).repartition(8)


def test_two_phase_equals_naive(kv_ds):
    got = two_phase_sum(kv_ds, ["k"], ["v"]).to_pandas().sort_values("k", ignore_index=True)
    pdf = kv_ds.to_pandas()
    want = pdf.groupby("k").agg(v=("v", "sum"), n=("v", "size")).reset_index()
    assert np.array_equal(got["v"].to_numpy(), want["v"].to_numpy())
    assert np.array_equal(got["n"].to_numpy(), want["n"].to_numpy())


def test_salted_equals_unsalted(kv_ds):
    salted_ds = kv_ds.map_batches(
        lambda t: add_salt(t, "h", 4), batch_format="pyarrow"
    )
    got = (
        salted_sum(salted_ds, ["k"], ["v"], salt_col="salt")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = two_phase_sum(kv_ds, ["k"], ["v"]).to_pandas().sort_values("k", ignore_index=True)
    assert np.array_equal(got["v"].to_numpy(), want["v"].to_numpy())
    assert np.array_equal(got["n"].to_numpy(), want["n"].to_numpy())


def test_bucketed_join_matches_pandas(ray_session):
    rng = np.random.default_rng(4)
    left = pd.DataFrame({"id": rng.integers(0, 100, 500), "a": rng.integers(0, 9, 500)})
    right = pd.DataFrame({"id": np.arange(100), "b": np.arange(100) * 2})
    got = (
        bucketed_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="id", n_buckets=8
        )
        .to_pandas()
        .sort_values(["id", "a"], ignore_index=True)
    )
    want = left.merge(right, on="id").sort_values(["id", "a"], ignore_index=True)
    assert len(got) == len(want)
    assert np.array_equal(got["b"].to_numpy(), want["b"].to_numpy())


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    texts = [f"alpha beta gamma delta epsilon zeta eta theta doc {i}" for i in range(50)]
    texts += [texts[0], texts[1], texts[1]]  # exact dups
    texts += [texts[2] + " tail"]  # near dup
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)), "text": pa.array(texts)})
    )


def test_exact_dedup(dup_docs):
    out = exact_dedup(dup_docs).to_pandas()
    assert len(out) == 51  # 50 uniques + near-dup (distinct text)
    assert out["n_copies"].sum() == 54
    winners = out.sort_values("doc_id")
    assert winners["n_copies"].max() == 3


def test_minhash_finds_near_dup(dup_docs):
    pairs = minhash_candidate_pairs(dup_docs).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 50) in got  # exact dup pair
    assert (1, 51) in got and (1, 52) in got
    assert (2, 53) in got  # near-dup shares most shingles


def test_simhash_exact_dup_same_sig(dup_docs):
    out = dup_docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=1).to_pandas()
    s = out.set_index("doc_id")["simhash"]
    assert s[0] == s[50]
    assert s[1] == s[51] == s[52]


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((300, 32)).astype(np.float64)
    vecs[7] = vecs[3] + 1e-4  # near-dup pair
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array(list(vecs)),
            }
        )
    )


def test_brute_force_topk_self_first(emb_ds):
    queries = emb_ds.limit(5).to_pandas()
    out = brute_force_topk(emb_ds, queries, k=3).to_pandas()
    r1 = out[out["rank"] == 1]
    assert set(r1["query_id"]) == {0, 1, 2, 3, 4}
    for _, row in r1.iterrows():
        assert row["vec_id"] == row["query_id"] or row["cosine"] >= 0.999999


def test_ivf_recall_of_near_identical(emb_ds):
    queries = emb_ds.to_pandas().iloc[[3]]
    out = ivf_topk(emb_ds, queries, k=2, n_centroids=8, n_probe=3).to_pandas()
    assert set(out["vec_id"]) >= {3, 7}  # the near-identical vector found


def test_pq_topk_recall(ray_session):
    """PQ/ADC recall on clustered vectors: codes are m uint8 per
    vector; top-10 by asymmetric distance recovers most of the true
    cosine top-10, and exact-duplicate vectors rank first."""
    import pyarrow as pa

    from hexscape_ray.stages.knn import pq_topk

    rng = np.random.default_rng(61)
    n, d, n_clusters = 800, 64, 10
    centers = rng.normal(0, 1, (n_clusters, d))
    assign = rng.integers(0, n_clusters, n)
    X = centers[assign] + rng.normal(0, 0.15, (n, d))
    X[7] = X[3]  # exact duplicate
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(X.tolist()),
            }
        )
    ).repartition(4)
    queries = pd.DataFrame({"vec_id": [3, 100, 200], "embedding": list(X[[3, 100, 200]])})
    got = pq_topk(ds, queries, k=10, m=8, k_centroids=16).to_pandas()
    # exact dup of query 3 must appear in its top-10
    assert 7 in set(got[got["query_id"] == 3]["vec_id"])
    # recall vs brute-force cosine top-10
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rec = []
    for q in [3, 100, 200]:
        true = set(np.argsort(-(Xn @ Xn[q]))[:10])
        mine = set(got[got["query_id"] == q]["vec_id"])
        rec.append(len(true & mine) / 10)
    assert np.mean(rec) >= 0.8, rec
    # code-only mode (rerank=0, originals untouched) still finds the dup
    coarse = pq_topk(ds, queries.iloc[[0]], k=10, m=8, k_centroids=16, rerank=0).to_pandas()
    assert 7 in set(coarse["vec_id"])


def test_embedding_near_dup_pair(emb_ds):
    pairs = embedding_near_dup(emb_ds, threshold=0.999).to_pandas()
    assert ((pairs["a"] == 3) & (pairs["b"] == 7)).any()


def test_kmv_sketch_accuracy_and_merge(ray_session):
    """KMV estimate within ~3/√k of exact; invariant to partitioning
    (merge associativity)."""
    import pyarrow as pa

    from hexscape_ray.stages.sketch import approx_distinct

    rng = np.random.default_rng(9)
    n = 60_000
    keys = rng.integers(0, 4, n)
    # distinct cardinality differs by key: ~100, ~1000, ~5000, ~20000
    card = np.array([100, 1000, 5000, 20000])
    members = rng.integers(0, card[keys], n) + keys * 10**6
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.astype(np.int64)), "m": pa.array(members.astype(np.int64))})
    ).repartition(9)
    est = approx_distinct(ds, "k", "m", k=256).to_pandas().set_index("k")["distinct_est"]
    exact = pd.DataFrame({"k": keys, "m": members}).groupby("k")["m"].nunique()
    for kk in range(4):
        rel = abs(est[kk] - exact[kk]) / exact[kk]
        assert rel < 0.2, (kk, est[kk], exact[kk])
    # small-cardinality keys are exact (fewer than k distinct seen)
    assert est[0] == exact[0]
    # partitioning-invariant
    est2 = approx_distinct(ds.repartition(3), "k", "m", k=256).to_pandas().set_index("k")["distinct_est"]
    assert np.allclose(est.sort_index(), est2.sort_index())


def test_curation_pipeline_accounting(ray_session):
    """kept + dup + lowq == total per hex; dup count matches the
    exact-dedup operator; totals match the corpus."""
    from hexscape_ray.pipelines.queries import q_curation_pipeline, q_dedup_exact

    sf = "/root/testdata/sf0.01"
    out = q_curation_pipeline(sf).to_pandas()
    assert (
        out["n_kept"] + out["n_dup"] + out["n_lowq"] == out["n_total"]
    ).all()
    assert out["n_total"].sum() == 500
    dedup = q_dedup_exact(sf).to_pandas()
    assert out["n_dup"].sum() == dedup["n_copies"].sum() - len(dedup)


def test_simhash_vectorised_matches_scalar(ray_session):
    """The flattened whole-batch SimHash kernel is bit-identical to the
    per-doc scalar reference, including empty / 1-token / long docs."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = ["", "solo", "a b", " ".join(rng.choice(vocab, 5000))]
    texts += [" ".join(rng.choice(vocab, int(n))) for n in rng.integers(1, 400, 40)]
    sh = SimHasher()
    got = sh._signatures(texts)
    want = np.array([sh._sig_one(t) for t in texts], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_lsh_bucket_cap_star_edges(ray_session):
    """An injected duplicate cluster of 3000 identical docs yields O(n)
    candidate pairs (star edges to the min id), not O(n²) — the
    round-1 clique-explosion fix."""
    n = 3000
    texts = ["the same boilerplate cookie banner text appears on every page"] * n
    texts += [f"unique filler document number {i} with words {i*7} {i*13}" for i in range(20)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    )
    pairs = minhash_candidate_pairs(ds, bucket_cap=64).to_pandas()
    # star edges: every cluster member pairs with doc 0 only
    cluster = pairs[(pairs["a"] < n) & (pairs["b"] < n)]
    assert len(cluster) == n - 1, len(cluster)
    assert (cluster["a"] == 0).all()
    # connectivity preserved: all members reachable via the representative
    assert set(cluster["b"]) == set(range(1, n))


def test_verify_jaccard_distributed_matches_driver(dup_docs):
    """Distributed candidate→text join verification matches the
    driver-side reference path bit-for-bit."""
    from hexscape_ray.stages.dedup import verify_jaccard, verify_jaccard_distributed

    cand = minhash_candidate_pairs(dup_docs)
    pdf = dup_docs.to_pandas()
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    want = (
        verify_jaccard(cand.to_pandas(), texts, threshold=0.5)
        .sort_values(["a", "b"], ignore_index=True)
    )
    got = (
        verify_jaccard_distributed(cand, dup_docs, threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert np.array_equal(got["a"].to_numpy(), want["a"].to_numpy())
    assert np.array_equal(got["b"].to_numpy(), want["b"].to_numpy())
    assert np.array_equal(got["jaccard"].to_numpy(), want["jaccard"].to_numpy())


def test_embedding_near_dup_plane_scaling(emb_ds):
    """n_planes derives from corpus size (min 8) and explicit n_planes
    still finds the planted pair; multi-table union dedups pairs."""
    pairs = embedding_near_dup(emb_ds, threshold=0.999, n_planes=10, n_tables=2).to_pandas()
    assert ((pairs["a"] == 3) & (pairs["b"] == 7)).any()
    assert not pairs.duplicated(subset=["a", "b"]).any()


def test_bucketed_join_string_keys(ray_session):
    left = pd.DataFrame({"name": [f"k{i%20}" for i in range(300)], "a": np.arange(300)})
    right = pd.DataFrame({"name": [f"k{i}" for i in range(20)], "b": np.arange(20) * 7})
    got = (
        bucketed_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="name", n_buckets=8
        )
        .to_pandas()
        .sort_values(["name", "a"], ignore_index=True)
    )
    want = left.merge(right, on="name").sort_values(["name", "a"], ignore_index=True)
    assert len(got) == len(want)
    assert np.array_equal(got["b"].to_numpy(), want["b"].to_numpy())


def test_streaming_sessions_matches_batch(ray_session):
    """Incremental per-shard actor sessionization == the batch
    groupby operator on the same events, including session ordinals
    and durations."""
    from hexscape_ray.pipelines.queries import q_events_sessions, q_events_sessions_stream

    sf = "/root/testdata/sf0.01"
    stream = q_events_sessions_stream(sf)
    batch = (
        q_events_sessions(sf)
        .to_pandas()
        .sort_values(["user_id", "session_id"], ignore_index=True)
    )
    assert len(stream) == len(batch)
    for c in ("user_id", "session_id", "n_events", "duration_s"):
        assert np.array_equal(stream[c].to_numpy(), batch[c].to_numpy()), c


def test_streaming_sessions_mid_stream_drain(ray_session):
    """drain() emits closed sessions incrementally; drained + flushed
    together equal the full output (no loss, no duplication)."""
    import pyarrow as pa_
    import ray as ray_

    from hexscape_ray.stages.streaming import GAP_US, SessionShard

    ts = []
    users = []
    # two users, three sessions each, well separated
    for s in range(3):
        base = s * 10 * GAP_US
        for k in range(4):
            for u in (1, 2):
                users.append(u)
                ts.append(base + k * 1000)
    order = np.argsort(np.asarray(ts), kind="stable")
    ua = np.asarray(users, dtype=np.int64)[order]
    ta = np.asarray(ts, dtype=np.int64)[order]

    shard = SessionShard.remote(GAP_US)
    half = len(ua) // 2
    ray_.get(shard.feed.remote(ua[:half], ta[:half]))
    early = ray_.get(shard.drain.remote())
    ray_.get(shard.feed.remote(ua[half:], ta[half:]))
    late = ray_.get(shard.flush.remote())
    got = pa_.concat_tables([t for t in (early, late) if len(t)]).to_pandas()
    got = got.sort_values(["user_id", "session_id"], ignore_index=True)
    assert len(early) > 0  # sessions really closed mid-stream
    assert len(got) == 6  # 2 users × 3 sessions
    assert (got["n_events"] == 4).all()
    assert got.groupby("user_id")["session_id"].apply(
        lambda s: list(s) == [1, 2, 3]
    ).all()


def test_grouped_quantiles_disc_matches_bruteforce(ray_session):
    """quantile_disc rule (sorted[ceil(q·n)−1]) on compressed
    (value, count) pairs == brute force over the raw rows."""
    import math

    from hexscape_ray.stages.agg import grouped_quantiles_disc

    rng = np.random.default_rng(21)
    n = 30_000
    keys = rng.integers(0, 6, n)
    vals = rng.integers(0, 500, n).astype(np.int64)  # heavy value ties
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals)})
    ).repartition(7)
    qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    got = (
        grouped_quantiles_disc(ds, ["k"], "v", qs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    for kk in range(6):
        sv = np.sort(vals[keys == kk])
        for name, q in qs.items():
            want = sv[max(math.ceil(q * sv.size), 1) - 1]
            assert got.loc[got["k"] == kk, name].iloc[0] == want, (kk, name)


def test_misra_gries_exact_under_forced_compression(ray_session):
    """MG heavy hitters == exact pandas HAVING when every block's
    distinct count far exceeds k (real counter compression + real
    candidate pruning), on a Zipf-ish distribution."""
    from hexscape_ray.stages.sketch import misra_gries_heavy_hitters

    rng = np.random.default_rng(61)
    n = 200_000
    # zipf over 50k distinct values → a handful above 0.2% support
    v = (rng.zipf(1.3, n) % 50_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"host": pa.array(v)})).repartition(9)
    got = (
        misra_gries_heavy_hitters(ds, "host", support_num=1, support_den=500, k=1024)
        .to_pandas()
        .sort_values("host", ignore_index=True)
    )
    vc = pd.Series(v).value_counts()
    want = vc[vc * 500 > n].sort_index()
    assert len(want) >= 3, "test distribution must contain heavy hitters"
    assert len(got) == len(want)
    assert (got["host"].to_numpy() == want.index.to_numpy()).all()
    assert (got["n_rows"].to_numpy() == want.to_numpy()).all()
    # compression really happened: blocks had ≫ k distinct values
    assert pd.Series(v).nunique() > 8 * 1024


def test_kmeans_distributed_matches_driver_lloyd(ray_session):
    """Distributed spherical k-means == a driver-side numpy Lloyd loop
    with the same hash-min init, on well-separated clusters; recovers
    the ground truth partition regardless of block layout."""
    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.stages.knn import _normalize, kmeans_distributed

    rng = np.random.default_rng(57)
    k, per, d = 4, 200, 16
    centers = _normalize(rng.normal(size=(k, d)))
    X = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(size=(k * per, d))
    truth = np.repeat(np.arange(k), per)
    ids = np.arange(k * per, dtype=np.int64)
    perm = rng.permutation(k * per)  # shuffle storage order
    X, truth, ids = X[perm], truth[perm], ids[perm]
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": pa.array(ids), "embedding": pa.array(list(X.astype(np.float32)))}
        )
    ).repartition(7)

    seed, n_iter = 11, 6
    # exercise BOTH tiers: local single-task Lloyd (default at this
    # size) and the distributed moment-partial loop (forced via env)
    import os

    results = []
    for local_rows in ("131072", "0"):
        os.environ["HEXRAY_KMEANS_LOCAL_ROWS"] = local_rows
        try:
            C, assign_ds = kmeans_distributed(ds, k=k, n_iter=n_iter, seed=seed)
        finally:
            os.environ.pop("HEXRAY_KMEANS_LOCAL_ROWS", None)
        results.append((C, assign_ds.to_pandas().sort_values("vec_id", ignore_index=True)))
    C, got = results[-1]

    # driver reference: same init rule, same spherical Lloyd updates
    Xn = _normalize(np.asarray(X, dtype=np.float32).astype(np.float64))
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    Cr = Xn[np.argsort(h)[:k]].copy()
    for _ in range(n_iter):
        a = np.argmax(Xn @ Cr.T, axis=1)
        for j in range(k):
            if (a == j).any():
                Cr[j] = Xn[a == j].mean(axis=0)
        Cr = _normalize(Cr)
    a_ref = np.argmax(Xn @ Cr.T, axis=1)
    order = np.argsort(ids)
    for C_t, got_t in results:
        assert (got_t["cluster"].to_numpy() == a_ref[order]).all()
        assert np.allclose(C_t, Cr, atol=1e-8)
    # ground truth recovered: each k-means cluster is one true cluster
    df = pd.DataFrame({"km": a_ref, "truth": truth})
    assert (df.groupby("km")["truth"].nunique() == 1).all()
    assert df["km"].nunique() == k


def test_salted_join_matches_pandas_on_extreme_skew(ray_session):
    """salted_join == plain pandas inner merge when one key owns 80 %
    of the big side (the exact case salting exists for)."""
    from hexscape_ray.stages.joins import salted_join

    rng = np.random.default_rng(41)
    n = 20_000
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 50, n)).astype(np.int64)
    big = pd.DataFrame({"k": keys, "rid": np.arange(n, dtype=np.int64)})
    small = pd.DataFrame(
        {"k": np.arange(0, 40, dtype=np.int64), "label": [f"L{i}" for i in range(40)]}
    )
    got = (
        salted_join(
            ray.data.from_pandas(big).repartition(6),
            ray.data.from_pandas(small).repartition(2),
            on="k",
            n_salt=8,
        )
        .to_pandas()
        .sort_values("rid", ignore_index=True)
    )
    want = big.merge(small, on="k").sort_values("rid", ignore_index=True)
    assert len(got) == len(want)
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["label"].to_numpy() == want["label"].to_numpy()).all()
    assert got["k"].dtype == np.int64  # no float degradation through the join


def test_ngram_jaccard_exact_matches_bruteforce(ray_session):
    """Distributed exact n-gram Jaccard == driver brute force over all
    pairs, on a corpus with seeded near-dups + background noise."""
    from hexscape_ray.stages.dedup import ngram_jaccard_pairs_exact

    rng = np.random.default_rng(31)
    vocab = [f"w{k}" for k in range(40)]
    docs = []
    for d in range(60):
        toks = [vocab[k] for k in rng.integers(0, 40, 30)]
        docs.append(" ".join(toks))
    # seeded near-dups: copy with one token changed
    for src in (3, 17, 42):
        toks = docs[src].split(" ")
        toks[5] = "CHANGED"
        docs.append(" ".join(toks))
    ids = np.arange(len(docs), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    ).repartition(5)
    got = (
        ngram_jaccard_pairs_exact(ds, n=3, threshold=(3, 10))
        .to_pandas()
        .sort_values(["i", "j"], ignore_index=True)
    )

    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[k : k + 3]) for k in range(len(toks) - 2)}

    want = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sh(docs[a]), sh(docs[b])
            inter = len(sa & sb)
            uni = len(sa | sb)
            if inter and inter * 10 >= 3 * uni:
                want.append((a, b, inter, uni))
    want_df = pd.DataFrame(want, columns=["i", "j", "inter", "uni"])
    assert len(got) == len(want_df) >= 3
    for c in ("i", "j", "inter", "uni"):
        assert (got[c].to_numpy() == want_df[c].to_numpy()).all(), c
    assert (
        got["jac_pml"].to_numpy()
        == np.floor(
            1e6 * want_df["inter"] / want_df["uni"] + 0.5
        ).astype(np.int64)
    ).all()


def test_grouped_quantiles_cont_matches_duckdb(ray_session):
    """percentile_cont rule (index = q·(n−1), linear interpolation) on
    compressed (value, count) pairs == both numpy's 'linear' quantile
    and DuckDB's native quantile_cont over the raw rows."""
    import duckdb

    from hexscape_ray.stages.agg import grouped_quantiles_cont

    rng = np.random.default_rng(23)
    n = 30_000
    keys = rng.integers(0, 6, n)
    vals = rng.integers(0, 500, n).astype(np.int64)  # heavy value ties
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals)})
    ).repartition(7)
    qs = {"p25": (1, 4), "p50": (2, 4), "p75": (3, 4)}
    got = (
        grouped_quantiles_cont(ds, ["k"], "v", qs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    # numpy 'linear' interpolation == percentile_cont
    for kk in range(6):
        sv = np.sort(vals[keys == kk]).astype(np.float64)
        for name, (num, den) in qs.items():
            want = float(np.quantile(sv, num / den, method="linear"))
            have = float(got.loc[got["k"] == kk, name].iloc[0])
            assert abs(have - want) < 1e-9, (kk, name, have, want)
    # DuckDB native quantile_cont
    df = pd.DataFrame({"k": keys.astype(np.int64), "v": vals})
    dk = duckdb.connect()
    dk.register("t", df)
    want_df = dk.execute(
        "SELECT k, quantile_cont(v, 0.25) p25, quantile_cont(v, 0.5) p50,"
        " quantile_cont(v, 0.75) p75 FROM t GROUP BY k ORDER BY k"
    ).df()
    for c in ("p25", "p50", "p75"):
        assert np.allclose(got[c].to_numpy(), want_df[c].to_numpy()), c


def test_distributed_pca_matches_numpy(emb_ds):
    """One-pass moment PCA == driver-side numpy PCA on the same data:
    orthonormal components, descending explained variance, projections
    equal (up to float reduction order)."""
    from hexscape_ray.stages.pca import fit_pca, transform_pca

    mean, comps, ev = fit_pca(emb_ds, k=5)
    assert comps.shape == (5, 32)
    # orthonormal
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-9)
    # descending variance
    assert (np.diff(ev) <= 1e-12).all()
    # parity with exact numpy PCA
    X = np.asarray(emb_ds.to_pandas()["embedding"].tolist())
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    top = V[:, np.argsort(w)[::-1][:5]].T
    for i in range(5):
        j = int(np.argmax(np.abs(top[i])))
        if top[i, j] < 0:
            top[i] = -top[i]
    assert np.allclose(np.abs(comps), np.abs(top), atol=1e-6)
    # projection round-trip: variance of pc0 equals the top eigenvalue
    P = np.asarray(
        transform_pca(emb_ds, mean, comps).to_pandas()["pc"].tolist()
    )
    assert np.allclose(P.var(axis=0, ddof=0), ev, rtol=1e-6)
    # partitioning-invariant
    mean2, comps2, ev2 = fit_pca(emb_ds.repartition(7), k=5)
    assert np.allclose(mean, mean2) and np.allclose(ev, ev2, rtol=1e-9)


def test_winnowing_guarantee_and_pairs(dup_docs, ray_session):
    """Winnowing invariants (Schleimer et al.): identical docs share
    ALL fingerprints; a doc sharing a long substring shares ≥ 1; a
    fingerprint set is position-deduplicated and sparse (density ≈
    2/(w+1)); candidate pairs surface the planted duplicates."""
    from hexscape_ray.stages.dedup import Winnower, winnow_candidate_pairs

    wn = Winnower(k=5, w=4)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    fp_a, pos_a = wn.fingerprints(a)
    fp_a2, pos_a2 = wn.fingerprints(a)
    assert np.array_equal(fp_a, fp_a2) and np.array_equal(pos_a, pos_a2)
    # shared long substring → shared fingerprint (w + k − 1 guarantee)
    b = "PREFIX words here " + a + " SUFFIX tail"
    fp_b, _ = wn.fingerprints(b)
    assert len(set(fp_a.tolist()) & set(fp_b.tolist())) >= 1
    # sparse sketch
    n_shingles = len(a.split()) - 5 + 1
    assert fp_a.size <= n_shingles
    # pipeline: planted dups found
    pairs = winnow_candidate_pairs(dup_docs, min_shared=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 50) in got
    assert (1, 51) in got and (1, 52) in got


def test_histogram_quantiles_bounded_error(ray_session):
    """Two-pass histogram quantiles: within one bin width of exact,
    deterministic under repartitioning."""
    import math

    from hexscape_ray.stages.agg import approx_quantiles_histogram

    rng = np.random.default_rng(23)
    n = 50_000
    keys = rng.integers(0, 3, n)
    vals = np.where(keys == 0, rng.normal(100, 15, n), rng.exponential(40, n))
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals)})
    ).repartition(6)
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    n_bins = 2048
    got = (
        approx_quantiles_histogram(ds, ["k"], "v", qs, n_bins=n_bins)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for kk in range(3):
        sv = np.sort(vals[keys == kk])
        width = (sv[-1] - sv[0]) / n_bins
        for name, q in qs.items():
            exact = sv[max(math.ceil(q * sv.size), 1) - 1]
            err = got.loc[kk, name] - exact
            assert -1e-9 <= err <= width + 1e-9, (kk, name, err, width)
    got2 = (
        approx_quantiles_histogram(ds.repartition(13), ["k"], "v", qs, n_bins=n_bins)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for name in qs:
        assert np.allclose(got[name], got2[name])


def test_connected_components_random_graphs(ray_session):
    """Min-label propagation == a driver-side union-find reference on
    random graphs (chains, stars, isolated pairs)."""
    from hexscape_ray.stages.graph import connected_components

    rng = np.random.default_rng(29)
    n_nodes = 120
    edges = []
    # random chains + random extra edges
    perm = rng.permutation(n_nodes)
    for i in range(0, n_nodes - 8, 8):
        chain = perm[i : i + 8]
        edges += list(zip(chain[:-1], chain[1:]))
    extra = rng.integers(0, n_nodes, (25, 2))
    edges += [tuple(e) for e in extra if e[0] != e[1]]
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)

    # union-find reference
    parent = list(range(n_nodes))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for x, y in edges:
        parent[find(int(x))] = find(int(y))
    want = {}
    for node in set(a.tolist()) | set(b.tolist()):
        root = find(node)
        want.setdefault(root, []).append(node)
    want_label = {}
    for members in want.values():
        m = min(members)
        for node in members:
            want_label[node] = m

    ds = ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(5)
    got = connected_components(ds).to_pandas()
    assert len(got) == len(want_label)
    for node, comp in zip(got["node"], got["component"]):
        assert want_label[int(node)] == int(comp), node


def test_dedup_clusters_from_pairs(dup_docs):
    """Full near-dup flow: MinHash pairs → connected components →
    cluster table; the planted dup groups land in single clusters
    keyed by their min doc id."""
    from hexscape_ray.stages.graph import connected_components, dedup_clusters

    pairs = minhash_candidate_pairs(dup_docs).materialize()
    comps = connected_components(pairs).to_pandas()
    label = dict(zip(comps["node"].astype(int), comps["component"].astype(int)))
    # exact duplicates land in the same component
    assert label[0] == label[50]
    assert label[1] == label[51] == label[52]
    # component labels are canonical minima
    assert all(lbl <= node for node, lbl in label.items())
    # cluster table partitions the nodes
    out = dedup_clusters(pairs).to_pandas()
    assert out["n_members"].sum() == len(label)
    assert set(out["cluster_id"]) == set(comps["component"].unique())


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """asof_join == pandas merge_asof(by=key, direction='backward') on
    random keyed time series, inner and left forms."""
    from hexscape_ray.stages.joins import asof_join

    rng = np.random.default_rng(31)
    nl, nr = 2000, 600
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, nl).astype(np.int64),
            "t": rng.integers(0, 10_000, nl).astype(np.int64),
            "lid": np.arange(nl, dtype=np.int64),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 40, nr).astype(np.int64),
                "rt": rng.integers(0, 10_000, nr).astype(np.int64),
                "val": rng.integers(0, 1_000_000, nr).astype(np.int64),
            }
        )
        .groupby(["k", "rt"], as_index=False)["val"]
        .max()  # dedupe ties for determinism
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
    )
    want_inner = want.dropna(subset=["val"]).sort_values("lid", ignore_index=True)
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            left_time="t",
            right_time="rt",
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    assert len(got) == len(want_inner)
    assert np.array_equal(got["val"].to_numpy(np.int64), want_inner["val"].to_numpy(np.int64))
    assert np.array_equal(got["rt"].to_numpy(np.int64), want_inner["rt"].to_numpy(np.int64))
    # left form keeps unmatched rows with nulls
    got_left = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="k",
        left_time="t",
        right_time="rt",
        how="left",
    ).to_pandas()
    assert len(got_left) == nl
    assert got_left["val"].isna().sum() == want["val"].isna().sum()
    # forward direction == merge_asof(direction='forward')
    want_f = (
        pd.merge_asof(
            left.sort_values("t", kind="stable"),
            right.sort_values("rt"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="forward",
        )
        .dropna(subset=["val"])
        .sort_values("lid", ignore_index=True)
    )
    got_f = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            left_time="t",
            right_time="rt",
            direction="forward",
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    assert len(got_f) == len(want_f)
    assert np.array_equal(got_f["val"].to_numpy(np.int64), want_f["val"].to_numpy(np.int64))
    assert np.array_equal(got_f["rt"].to_numpy(np.int64), want_f["rt"].to_numpy(np.int64))
    # composite by-keys == merge_asof(by=[k, k2])
    left2 = left.assign(k2=(left["lid"] % 3).astype(np.int64))
    right2 = right.assign(k2=(right["val"] % 3).astype(np.int64))
    right2 = right2.groupby(["k", "k2", "rt"], as_index=False)["val"].max()
    want_c = (
        pd.merge_asof(
            left2.sort_values("t", kind="stable"),
            right2.sort_values("rt"),
            left_on="t",
            right_on="rt",
            by=["k", "k2"],
            direction="backward",
        )
        .dropna(subset=["val"])
        .sort_values("lid", ignore_index=True)
    )
    got_c = (
        asof_join(
            ray.data.from_pandas(left2),
            ray.data.from_pandas(right2),
            on=["k", "k2"],
            left_time="t",
            right_time="rt",
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    assert len(got_c) == len(want_c)
    assert np.array_equal(got_c["val"].to_numpy(np.int64), want_c["val"].to_numpy(np.int64))
    # tolerance drops distant matches (both directions)
    for direction in ("backward", "forward"):
        want_t = (
            pd.merge_asof(
                left.sort_values("t", kind="stable"),
                right.sort_values("rt"),
                left_on="t",
                right_on="rt",
                by="k",
                direction=direction,
                tolerance=200,
            )
            .dropna(subset=["val"])
            .sort_values("lid", ignore_index=True)
        )
        got_t = (
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="k",
                left_time="t",
                right_time="rt",
                direction=direction,
                tolerance=200,
            )
            .to_pandas()
            .sort_values("lid", ignore_index=True)
        )
        assert len(got_t) == len(want_t), direction
        assert np.array_equal(
            got_t["val"].to_numpy(np.int64), want_t["val"].to_numpy(np.int64)
        ), direction


def test_range_join_broadcast(ray_session):
    """Broadcast range join bins values into non-overlapping intervals
    (inner semantics; out-of-range rows dropped; overlap rejected)."""
    from hexscape_ray.stages.joins import range_join_broadcast

    rng = np.random.default_rng(37)
    v = rng.uniform(-5, 110, 3000)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(v), "rid": pa.array(np.arange(3000, dtype=np.int64))})
    ).repartition(4)
    bands = pd.DataFrame(
        {"band": ["a", "b", "c"], "lo": [0.0, 25.0, 60.0], "hi": [25.0, 50.0, 100.0]}
    )
    got = (
        range_join_broadcast(ds, bands, "v")
        .to_pandas()
        .sort_values("rid", ignore_index=True)
    )
    # reference: pandas interval matching
    want_band = np.full(3000, None, dtype=object)
    for _, r in bands.iterrows():
        m = (v >= r["lo"]) & (v < r["hi"])
        want_band[m] = r["band"]
    keep = want_band != None  # noqa: E711
    assert len(got) == int(keep.sum())
    assert (got["band"].to_numpy() == want_band[keep][np.argsort(np.flatnonzero(keep), kind="stable")]).all() or (
        got["band"].to_numpy() == want_band[keep]
    ).all()
    with pytest.raises(ValueError, match="non-overlapping"):
        bad = pd.DataFrame({"band": ["x", "y"], "lo": [0.0, 5.0], "hi": [10.0, 15.0]})
        range_join_broadcast(ds, bad, "v")


def test_range_join_intervals_overlapping(ray_session):
    """General range join handles OVERLAPPING + NESTED intervals: every
    row fans out to every containing interval (== the O(n·m) predicate
    reference); out-of-range rows dropped."""
    from hexscape_ray.stages.joins import range_join_intervals

    rng = np.random.default_rng(41)
    v = rng.uniform(-5, 110, 2500)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(v), "rid": pa.array(np.arange(2500, dtype=np.int64))})
    ).repartition(4)
    bands = pd.DataFrame(
        {
            "band": ["all", "low", "mid", "nest"],
            "lo": [0.0, 0.0, 20.0, 30.0],
            "hi": [100.0, 50.0, 80.0, 40.0],
        }
    )
    got = (
        range_join_intervals(ds, bands, "v")
        .to_pandas()
        .sort_values(["rid", "band"], ignore_index=True)
    )
    want_rows = []
    for _, r in bands.iterrows():
        m = (v >= r["lo"]) & (v < r["hi"])
        for rid in np.flatnonzero(m):
            want_rows.append((rid, r["band"]))
    want = pd.DataFrame(want_rows, columns=["rid", "band"]).sort_values(
        ["rid", "band"], ignore_index=True
    )
    assert len(got) == len(want)
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()
    assert (got["band"].to_numpy() == want["band"].to_numpy()).all()
    # attached interval bounds are the matching band's
    assert ((got["v"].to_numpy() >= got["lo"].to_numpy()) & (got["v"].to_numpy() < got["hi"].to_numpy())).all()


def test_range_join_partitioned(ray_session):
    """Partitioned interval join (Dataset interval side, no broadcast):
    matches the O(n·m) predicate reference on overlapping + nested +
    degenerate intervals; every probe row lands in exactly one domain
    cell so the output has no duplicates."""
    from hexscape_ray.stages.joins import range_join_partitioned

    rng = np.random.default_rng(47)
    n, m = 2500, 120
    v = rng.uniform(-5, 110, n)
    lo = rng.uniform(0, 100, m)
    width = rng.uniform(0, 30, m)
    hi = lo + width
    hi[::17] = lo[::17]  # degenerate lo == hi → matches nothing
    hi[::23] -= 5.0  # inverted lo > hi → matches nothing
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(v), "rid": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(4)
    ivs = ray.data.from_arrow(
        pa.table(
            {
                "iid": pa.array(np.arange(m, dtype=np.int64)),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )
    ).repartition(3)
    got = (
        range_join_partitioned(ds, ivs, "v", n_ranges=16)
        .to_pandas()
        .sort_values(["rid", "iid"], ignore_index=True)
    )
    hit = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
    w_rid, w_iid = np.nonzero(hit)
    assert len(got) == len(w_rid)
    assert (got["rid"].to_numpy() == w_rid).all()
    assert (got["iid"].to_numpy() == w_iid).all()
    # int64 ids survive the shuffle (no float degradation)
    assert got["rid"].dtype == np.int64 and got["iid"].dtype == np.int64
    assert ((got["v"].to_numpy() >= got["lo"].to_numpy()) & (got["v"].to_numpy() < got["hi"].to_numpy())).all()
    # custom (skew-resistant quantile) edges give the identical join
    qe = np.quantile(np.concatenate([lo, hi]), np.linspace(0, 1, 9))
    got_q = (
        range_join_partitioned(ds, ivs, "v", edges=qe)
        .to_pandas()
        .sort_values(["rid", "iid"], ignore_index=True)
    )
    assert len(got_q) == len(got)
    assert (got_q["rid"].to_numpy() == got["rid"].to_numpy()).all()
    assert (got_q["iid"].to_numpy() == got["iid"].to_numpy()).all()


def test_duplicate_spans(ray_session):
    """Exact-substring dup spans match an O(n²·len²) brute-force
    reference: maximal diagonal runs of shared k-grams across doc
    pairs, including repeated grams within one doc, multiple disjoint
    spans per pair, and spans of exactly k tokens."""
    from hexscape_ray.stages.dedup import duplicate_spans

    k = 4
    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(30)]
    shared_a = ["s1", "s2", "s3", "s4", "s5", "s6"]  # 6-token span
    shared_b = ["t1", "t2", "t3", "t4"]  # exactly k
    docs = []
    for d in range(12):
        toks = list(rng.choice(vocab, size=25))
        if d % 3 == 0:
            toks[3:3] = shared_a
        if d % 4 == 0:
            toks[15:15] = shared_b
        if d == 5:
            toks += shared_b + shared_b  # within-doc repeat
        docs.append(" ".join(toks))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    ).repartition(3)
    got = (
        duplicate_spans(ds, k=k)
        .to_pandas()
        .sort_values(["a_id", "b_id", "a_start", "b_start"], ignore_index=True)
    )

    def grams(t):
        w = t.split(" ")
        return [" ".join(w[p : p + k]) for p in range(len(w) - k + 1)]

    want = []
    for a in range(len(docs)):
        ga = grams(docs[a])
        for b in range(a + 1, len(docs)):
            gb = grams(docs[b])
            hits = {(i + 1, j + 1) for i, x in enumerate(ga) for j, y in enumerate(gb) if x == y}
            while hits:
                ai, bj = min(hits, key=lambda p: (p[0] - p[1], p[0]))
                run = 0
                while (ai + run, bj + run) in hits:
                    hits.discard((ai + run, bj + run))
                    run += 1
                want.append((a, b, ai, bj, run + k - 1))
    want_df = pd.DataFrame(
        want, columns=["a_id", "b_id", "a_start", "b_start", "span_tokens"]
    ).sort_values(["a_id", "b_id", "a_start", "b_start"], ignore_index=True)
    assert len(got) == len(want_df)
    for c in want_df.columns:
        assert (got[c].to_numpy() == want_df[c].to_numpy()).all(), c


def test_two_phase_sum_combine_paths_agree(ray_session, monkeypatch):
    """The adaptive combine's two placements (coordinator pandas vs
    distributed groupby) produce identical sums/counts, including empty
    keys (global aggregate) and string keys."""
    import hexscape_ray.stages.agg as A

    rng = np.random.default_rng(73)
    n = 40_000
    t = pa.table(
        {
            "k": pa.array([f"k{int(x)}" for x in rng.integers(0, 500, n)]),
            "v": pa.array(rng.integers(-50, 100, n).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)

    def run():
        return (
            A.two_phase_sum(ds, ["k"], ["v"], count_as="n")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )

    monkeypatch.setattr(A, "SMALL_AGG_ROWS", 10**9)
    small = run()
    monkeypatch.setattr(A, "SMALL_AGG_ROWS", 0)
    big = run()
    assert len(small) == len(big) == 500
    assert (small["k"].to_numpy() == big["k"].to_numpy()).all()
    assert (small["v"].to_numpy() == big["v"].to_numpy()).all()
    assert (small["n"].to_numpy() == big["n"].to_numpy()).all()
    # exactness vs plain pandas on the raw rows
    want = (
        t.to_pandas().groupby("k", as_index=False)["v"].sum().sort_values("k", ignore_index=True)
    )
    assert (small["v"].to_numpy() == want["v"].to_numpy()).all()


def test_two_phase_agg_min_max(ray_session, monkeypatch):
    """Generalised two-phase min/max/sum matches pandas on the raw rows
    in BOTH combine placements."""
    import hexscape_ray.stages.agg as A

    rng = np.random.default_rng(79)
    n = 20_000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 300, n).astype(np.int64)),
            "a": pa.array(rng.integers(-1000, 1000, n).astype(np.int64)),
            "b": pa.array(rng.integers(0, 10**9, n).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    want = (
        t.to_pandas()
        .groupby("k", as_index=False)
        .agg(a=("a", "min"), b=("b", "max"))
        .sort_values("k", ignore_index=True)
    )
    for rows in (10**9, 0):
        monkeypatch.setattr(A, "SMALL_AGG_ROWS", rows)
        got = (
            A.two_phase_agg(ds, ["k"], {"a": "min", "b": "max"})
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert (got["a"].to_numpy() == want["a"].to_numpy()).all(), rows
        assert (got["b"].to_numpy() == want["b"].to_numpy()).all(), rows


def test_range_join_aggregate(ray_session):
    """Aggregate-pushdown interval join == brute-force join + groupby:
    per-group sums/counts over overlapping, nested, degenerate and
    inverted intervals, no pair materialisation."""
    from hexscape_ray.stages.joins import range_join_aggregate

    rng = np.random.default_rng(59)
    n, m = 3000, 90
    v = rng.uniform(-5, 110, n)
    w = rng.integers(1, 100, n)
    lo = rng.uniform(0, 100, m)
    hi = lo + rng.uniform(0, 25, m)
    hi[::11] = lo[::11]  # degenerate
    hi[::13] -= 3.0  # inverted
    grp = np.array([f"g{i % 7}" for i in range(m)])
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(v), "w": pa.array(w.astype(np.int64))})
    ).repartition(4)
    ivs = ray.data.from_arrow(
        pa.table({"band": pa.array(grp), "lo": pa.array(lo), "hi": pa.array(hi)})
    ).repartition(3)
    got = (
        range_join_aggregate(ds, ivs, "v", sum_cols=["w"], group_cols=["band"], n_ranges=16)
        .to_pandas()
        .sort_values("band", ignore_index=True)
    )
    hit = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
    rows, cols = np.nonzero(hit)
    want = (
        pd.DataFrame({"band": grp[cols], "w": w[rows], "n": 1})
        .groupby("band", as_index=False)
        .agg(w=("w", "sum"), n=("n", "sum"))
        .sort_values("band", ignore_index=True)
    )
    assert len(got) == len(want)
    assert (got["band"].to_numpy() == want["band"].to_numpy()).all()
    assert (got["w"].to_numpy() == want["w"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_range_join_aggregate_unmatched_group_omitted(ray_session):
    """INNER-join semantics: a group whose intervals match zero probe
    rows is ABSENT from the output (not an all-zeros row), matching a
    brute-force inner join + groupby exactly."""
    from hexscape_ray.stages.joins import range_join_aggregate

    v = np.array([1.0, 2.0, 3.0, 50.0, 51.0])
    w = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    # g_hit overlaps the probes, g_miss sits in an empty value region,
    # g_degen is degenerate (lo == hi → matches nothing)
    ivs_tbl = pa.table(
        {
            "band": pa.array(["g_hit", "g_hit", "g_miss", "g_degen"]),
            "lo": pa.array([0.0, 49.0, 90.0, 2.0]),
            "hi": pa.array([2.5, 52.0, 95.0, 2.0]),
        }
    )
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v), "w": pa.array(w)}))
    got = (
        range_join_aggregate(
            ds,
            ray.data.from_arrow(ivs_tbl),
            "v",
            sum_cols=["w"],
            group_cols=["band"],
            n_ranges=4,
        )
        .to_pandas()
        .sort_values("band", ignore_index=True)
    )
    lo, hi = ivs_tbl["lo"].to_numpy(), ivs_tbl["hi"].to_numpy()
    grp = ivs_tbl["band"].to_numpy(zero_copy_only=False)
    hit = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
    rows, cols = np.nonzero(hit)
    want = (
        pd.DataFrame({"band": grp[cols], "w": w[rows], "n": 1})
        .groupby("band", as_index=False)
        .agg(w=("w", "sum"), n=("n", "sum"))
        .sort_values("band", ignore_index=True)
    )
    assert got["band"].tolist() == ["g_hit"] == want["band"].tolist()
    assert got["w"].tolist() == want["w"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_contamination_hits(ray_session):
    """Decontamination counts == brute force: per train doc, the number
    of k-gram positions present anywhere in the eval set; clean docs
    absent from the output."""
    from hexscape_ray.stages.dedup import contamination_hits

    k = 3
    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(40)]
    leak = ["l1", "l2", "l3", "l4"]
    train, evald = [], []
    for i in range(40):
        toks = list(rng.choice(vocab, size=20))
        if i % 5 == 0:
            toks[4:4] = leak  # leaked span in some train docs
        train.append({"doc_id": i, "text": " ".join(toks)})
    for j in range(4):
        toks = list(rng.choice(vocab, size=15)) + leak
        evald.append({"doc_id": 1000 + j, "text": " ".join(toks)})
    tr = ray.data.from_items(train).repartition(3)
    ev = ray.data.from_items(evald)
    got = (
        contamination_hits(tr, ev, k=k)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    def grams(t):
        w = t.split(" ")
        return [" ".join(w[p : p + k]) for p in range(len(w) - k + 1)]

    eg = set()
    for d in evald:
        eg.update(grams(d["text"]))
    want = {}
    for d in train:
        nh = sum(1 for g in grams(d["text"]) if g in eg)
        if nh:
            want[d["doc_id"]] = nh
    assert dict(zip(got["doc_id"], got["n_hits"])) == want
    assert set(got["doc_id"]) >= {0, 5, 10}  # the leaked docs are flagged


def test_connected_components_wide_supersteps(ray_session):
    """Superstep width derives from the edge count: a tiny
    target_rows_per_bucket forces >8 buckets and the labels still match
    union-find (the round-2 fixed-width cap is gone)."""
    from hexscape_ray.stages.graph import connected_components

    rng = np.random.default_rng(43)
    n_nodes = 400
    perm = rng.permutation(n_nodes)
    edges = []
    for i in range(0, n_nodes - 10, 10):
        chain = perm[i : i + 10]
        edges += list(zip(chain[:-1], chain[1:]))
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        parent[find(int(x))] = find(int(y))
    want_label = {}
    members: dict[int, list[int]] = {}
    for node in set(a.tolist()) | set(b.tolist()):
        members.setdefault(find(node), []).append(node)
    for group in members.values():
        m = min(group)
        for node in group:
            want_label[node] = m

    ds = ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(6)
    # local_solve_threshold=0 forces the iterative superstep path
    got = connected_components(
        ds, target_rows_per_bucket=16, local_solve_threshold=0
    ).to_pandas()
    assert len(got) == len(want_label)
    for node, comp in zip(got["node"], got["component"]):
        assert want_label[int(node)] == int(comp)


def test_streaming_shard_reorder_buffer(ray_session):
    """feed_seq applies out-of-order router deliveries in sequence: the
    session table equals in-order feeding no matter the arrival order."""
    from hexscape_ray.stages.streaming import GAP_US, SessionShard

    rng = np.random.default_rng(47)
    n = 600
    user = rng.integers(0, 12, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 10**13, n).astype(np.int64))
    slices = [(s, user[s * 100 : (s + 1) * 100], ts[s * 100 : (s + 1) * 100]) for s in range(6)]

    ordered = SessionShard.remote(GAP_US)
    for _, u, t in slices:
        ray.get(ordered.feed.remote(u, t))
    want = ray.get(ordered.flush.remote()).to_pandas()

    shuffled = SessionShard.remote(GAP_US)
    for seq, u, t in [slices[i] for i in [3, 0, 5, 1, 4, 2]]:
        ray.get(shuffled.feed_seq.remote(seq, u, t))
    got = ray.get(shuffled.flush.remote()).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["user_id", "session_id"], ignore_index=True),
        want.sort_values(["user_id", "session_id"], ignore_index=True),
    )


def test_bucketed_join_no_upstream_reexecution(ray_session):
    """bucketed_join execution contract: a materialised side is never
    re-executed, and a LAZY side with explicit left/right_schema runs
    its upstream exactly once (no schema()-probe partial execution) —
    counted via a side-effect actor in the upstream stage."""
    from types import SimpleNamespace

    from hexscape_ray.stages.joins import bucketed_join

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def counted(batch: pa.Table) -> pa.Table:
        ray.get(c.inc.remote())
        return batch

    n_blocks = 4
    lt = pa.table(
        {
            "k": pa.array((np.arange(400) % 7).astype(np.int64)),
            "lv": pa.array(np.arange(400, dtype=np.int64)),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(np.arange(7, dtype=np.int64)),
            "rv": pa.array(np.arange(7, dtype=np.int64) * 10),
        }
    )
    # (a) materialised side: counted ran once per block at materialize,
    # the join consume adds zero re-executions
    left_mat = (
        ray.data.from_arrow(lt)
        .repartition(n_blocks)
        .map_batches(counted, batch_format="pyarrow")
        .materialize()
    )
    right = ray.data.from_arrow(rt)
    assert ray.get(c.get.remote()) == n_blocks
    out = bucketed_join(left_mat, right, on="k", n_buckets=4).to_pandas()
    assert len(out) == 400
    assert ray.get(c.get.remote()) == n_blocks

    # (b) lazy side + explicit schemas: exactly one execution per block
    c2 = Counter.remote()

    def counted2(batch: pa.Table) -> pa.Table:
        ray.get(c2.inc.remote())
        return batch

    lazy_left = (
        ray.data.from_arrow(lt)
        .repartition(n_blocks)
        .map_batches(counted2, batch_format="pyarrow")
    )
    lsch = SimpleNamespace(names=["k", "lv"], types=[pa.int64(), pa.int64()])
    rsch = SimpleNamespace(names=["k", "rv"], types=[pa.int64(), pa.int64()])
    out2 = bucketed_join(
        lazy_left, right, on="k", n_buckets=4, left_schema=lsch, right_schema=rsch
    ).to_pandas()
    assert len(out2) == 400
    assert ray.get(c2.get.remote()) == n_blocks


def test_grouped_hash_sample_deterministic(ray_session):
    """grouped_hash_sample == driver-side 'm smallest splitmix64(id)
    per key' reference, and is IDENTICAL under different partitioning
    (the no-RNG-state resume guarantee)."""
    from hexscape_ray.functions.hashing import splitmix64
    from hexscape_ray.stages.agg import grouped_hash_sample

    rng = np.random.default_rng(53)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n),
            "id": rng.permutation(n).astype(np.int64),
        }
    )
    want_rows = []
    for kv, g in df.groupby("k"):
        ids = g["id"].to_numpy()
        h = splitmix64(ids.astype(np.uint64))
        top = np.argsort(h)[:7]
        for r, i in enumerate(top, 1):
            want_rows.append((kv, int(ids[i]), r))
    want = pd.DataFrame(want_rows, columns=["k", "id", "rank"]).sort_values(
        ["k", "rank"], ignore_index=True
    )
    for parts in (2, 9):
        got = (
            grouped_hash_sample(
                ray.data.from_pandas(df).repartition(parts), "k", "id", m=7
            )
            .to_pandas()
            .sort_values(["k", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_bucketed_join_semi_anti(ray_session):
    """semi == EXISTS (left rows with >=1 match, never duplicated);
    anti == NOT EXISTS; semi + anti partition the left side."""
    rng = np.random.default_rng(11)
    left = pd.DataFrame({"id": np.arange(200), "a": rng.integers(0, 9, 200)})
    # right: ids 0..99, each present 1-3 times (dup matches must not
    # duplicate semi output rows)
    rid = np.repeat(np.arange(100), rng.integers(1, 4, 100))
    right = pd.DataFrame({"id": rid, "b": np.arange(len(rid))})
    semi = (
        bucketed_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="id", how="semi", n_buckets=8,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    anti = (
        bucketed_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="id", how="anti", n_buckets=8,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert list(semi.columns) == ["id", "a"] and list(anti.columns) == ["id", "a"]
    assert semi["id"].tolist() == list(range(100))
    assert anti["id"].tolist() == list(range(100, 200))
    both = pd.concat([semi, anti]).sort_values("id", ignore_index=True)
    assert np.array_equal(both["a"].to_numpy(), left["a"].to_numpy())


def test_rolling_window_matches_pandas(ray_session):
    """rolling_window == pandas groupby().rolling(k+1).sum() + lag
    delta, across bucket boundaries and single-row keys."""
    from hexscape_ray.stages.window import rolling_window

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 37, n).astype(np.int64),
            "t": rng.integers(0, 10_000, n).astype(np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    df.loc[n - 1, "key"] = 9999  # a single-row key
    got = (
        rolling_window(
            ray.data.from_pandas(df), key="key", order=["t", "eid"],
            value="v", preceding=3, out_sum="rs", delta_of="t",
            out_delta="gap", n_buckets=8,
        )
        .to_pandas()
        .sort_values(["key", "t", "eid"], ignore_index=True)
    )
    want = df.sort_values(["key", "t", "eid"], ignore_index=True)
    g = want.groupby("key", sort=False)
    want["rs"] = (
        g["v"].rolling(4, min_periods=1).sum().reset_index(level=0, drop=True)
    ).astype(np.int64)
    want["gap"] = g["t"].diff().fillna(-1).astype(np.int64)
    assert len(got) == len(want)
    assert np.array_equal(got["rs"].to_numpy(), want["rs"].to_numpy())
    assert np.array_equal(got["gap"].to_numpy(), want["gap"].to_numpy())


def test_cosine_pairs_exact_matches_numpy(ray_session):
    """Blocked all-pairs == single-process numpy all-pairs, with
    shuffled ids across many blocks (exercises cross-block id swap)
    and a negative threshold (full n(n-1)/2 coverage, no triangle
    shortcut bugs)."""
    from hexscape_ray.stages.knn import cosine_pairs_exact, _normalize

    rng = np.random.default_rng(3)
    n, d = 120, 8
    V = rng.normal(size=(n, d))
    V[17] = V[3] + rng.normal(scale=0.01, size=d)  # planted near-dup
    V[88] = V[40]
    ids = rng.permutation(n).astype(np.int64)  # ids unordered vs rows
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(V))})
    ).repartition(5)

    N = _normalize(V)
    S = N @ N.T
    for thr in (0.9, -1.1):
        got = (
            cosine_pairs_exact(ds, threshold=thr, block_rows=16)
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        ii, jj = np.nonzero(S >= thr)
        keep = ii < jj
        a = np.minimum(ids[ii[keep]], ids[jj[keep]])
        b = np.maximum(ids[ii[keep]], ids[jj[keep]])
        m = np.floor(S[ii[keep], jj[keep]] * 1e6 + 0.5).astype(np.int64)
        want = (
            pd.DataFrame({"a": a, "b": b, "cos_micro": m})
            .sort_values(["a", "b"], ignore_index=True)
        )
        assert len(got) == len(want), thr
        assert np.array_equal(got["a"].to_numpy(), want["a"].to_numpy())
        assert np.array_equal(got["b"].to_numpy(), want["b"].to_numpy())
        assert np.array_equal(got["cos_micro"].to_numpy(), want["cos_micro"].to_numpy())


def test_range_window_peer_semantics(ray_session):
    """RANGE frame covers ALL rows with t in [t_i - W, t_i] including
    equal-t peers AFTER the current row — checked against a brute
    reference on data with planted timestamp ties."""
    from hexscape_ray.stages.window import range_window

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 9, n).astype(np.int64),
            "t": rng.integers(0, 500, n).astype(np.int64),  # many ties
            "v": rng.integers(1, 100, n).astype(np.int64),
        }
    )
    W = 50
    got = (
        range_window(
            ray.data.from_pandas(df), key="key", time_col="t", value="v",
            window=W, order_tail=["eid"], n_buckets=4,
        )
        .to_pandas()
        .sort_values(["key", "t", "eid"], ignore_index=True)
    )
    want = df.sort_values(["key", "t", "eid"], ignore_index=True)
    rs = np.empty(len(want), dtype=np.int64)
    rn = np.empty(len(want), dtype=np.int64)
    for i in range(len(want)):
        k, t = want["key"][i], want["t"][i]
        m = (want["key"] == k) & (want["t"] >= t - W) & (want["t"] <= t)
        rs[i] = want.loc[m, "v"].sum()
        rn[i] = ((want["key"][:i] == k).sum()) + 1
    assert np.array_equal(got["range_sum"].to_numpy(), rs)
    assert np.array_equal(got["rn"].to_numpy(), rn)


def test_broadcast_semi_anti_null_keys(ray_session):
    """EXISTS drops null-key rows, NOT EXISTS keeps them; semi+anti
    partition the input."""
    from hexscape_ray.stages.joins import broadcast_semi_anti

    t = pa.table(
        {
            "k": pa.array([1, 2, None, 4, 5], type=pa.int64()),
            "x": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    semi = broadcast_semi_anti(ds, [2, 4, 99], on="k", how="semi").to_pandas()
    anti = broadcast_semi_anti(ds, [2, 4, 99], on="k", how="anti").to_pandas()
    assert sorted(semi["x"]) == [20, 40]
    assert sorted(anti["x"]) == [10, 30, 50]  # null-key row kept by anti


def test_rollup_sum_matches_pandas(ray_session):
    """rollup_sum == the three pandas groupby levels, sentinel-marked."""
    from hexscape_ray.stages.agg import rollup_sum

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        rollup_sum(ds, ["a", "b"], ["v"], count_as="n")
        .to_pandas()
        .sort_values(["lvl", "a", "b"], ignore_index=True)
    )
    fine = df.groupby(["a", "b"], as_index=False).agg(v=("v", "sum"), n=("v", "size"))
    fine["lvl"] = 2
    mid = df.groupby(["a"], as_index=False).agg(v=("v", "sum"), n=("v", "size"))
    mid["b"], mid["lvl"] = "ALL", 1
    top = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "v": [df.v.sum()], "n": [n], "lvl": [0]})
    want = (
        pd.concat([fine, mid, top], ignore_index=True)[["a", "b", "lvl", "v", "n"]]
        .sort_values(["lvl", "a", "b"], ignore_index=True)
    )
    got = got[["a", "b", "lvl", "v", "n"]].astype({"n": np.int64, "v": np.int64})
    pd.testing.assert_frame_equal(got, want.astype({"n": np.int64, "v": np.int64}))


def test_argmax_per_key_tiebreak(ray_session):
    """argmax_per_key picks max count, lexicographically-smallest tie."""
    from hexscape_ray.stages.agg import argmax_per_key

    counts = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "c": pa.array(["b", "a", "c", "z", "a", "m"]),
            "n": pa.array([5, 5, 2, 1, 1, 9], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(counts).repartition(3)
    got = (
        argmax_per_key(ds, "k", "c", "n", ["a", "b", "c", "m", "z"], top_as="top")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert got["top"].tolist() == ["a", "a", "m"]  # ties 1,2 -> smallest cat
    assert got["n"].tolist() == [5, 1, 9]


def test_connected_components_superstep_path_random_graph(ray_session):
    """Force the SUPERSTEP path (local_solve_threshold=0) on a random
    graph and compare against a driver union-find ground truth."""
    from hexscape_ray.stages.graph import connected_components

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 400, 300
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(5)
    got = (
        connected_components(ds, "a", "b", local_solve_threshold=0, target_rows_per_bucket=64)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {x: find(x) for x in parent}
    # canonicalise: component label = min member
    mins = {}
    for x, r in want.items():
        mins[r] = min(mins.get(r, x), x)
    want = {x: mins[find(x)] for x in parent}
    got_map = dict(zip(got["node"], got["component"]))
    assert got_map == want


def test_funnel_conversion_matches_bruteforce(ray_session):
    """funnel_conversion == per-user brute force EXISTS over the
    [t_b - W, t_b] window, including equal-timestamp A/B pairs and
    users with no step_b (absent from output)."""
    from hexscape_ray.stages.window import funnel_conversion

    rng = np.random.default_rng(11)
    n, W = 3000, 500
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 41, n).astype(np.int64),
            "t": rng.integers(0, 5_000, n).astype(np.int64),
            "ty": rng.choice(["A", "B", "C"], n),
        }
    )
    # force an equal-timestamp A/B pair on one key
    df.loc[0, ["key", "t", "ty"]] = [777, 100, "A"]
    df.loc[1, ["key", "t", "ty"]] = [777, 100, "B"]
    got = (
        funnel_conversion(
            ray.data.from_pandas(df), key="key", time_col="t",
            type_col="ty", step_a="A", step_b="B", window=W, n_buckets=8,
        )
        .to_pandas()
        .sort_values("key", ignore_index=True)
    )
    rows = []
    for k, g in df.groupby("key"):
        ta = np.sort(g.loc[g["ty"] == "A", "t"].to_numpy())
        tb = g.loc[g["ty"] == "B", "t"].to_numpy()
        if len(tb) == 0:
            continue
        conv = sum(bool(np.any((ta >= t - W) & (ta <= t))) for t in tb)
        rows.append({"key": k, "n_target": len(tb), "n_converted": conv})
    want = pd.DataFrame(rows).sort_values("key", ignore_index=True)
    assert got["key"].tolist() == want["key"].tolist()
    assert got["n_target"].tolist() == want["n_target"].tolist()
    assert got["n_converted"].tolist() == want["n_converted"].tolist()
    assert (
        got.loc[got["key"] == 777, "n_converted"].iloc[0] >= 1
    )  # the equal-ts pair counted


def test_grouped_gap_stats_matches_pandas(ray_session):
    """grouped_gap_stats == pandas diff() per key, typed zeros for
    single-event keys."""
    from hexscape_ray.stages.window import grouped_gap_stats

    rng = np.random.default_rng(13)
    n = 2500
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, 53, n).astype(np.int64),
            "t": rng.integers(0, 100_000, n).astype(np.int64),
        }
    )
    df.loc[n - 1, "key"] = 8888  # single-event key
    got = (
        grouped_gap_stats(
            ray.data.from_pandas(df), key="key", time_col="t",
            order_tail=["eid"], n_buckets=8,
        )
        .to_pandas()
        .sort_values("key", ignore_index=True)
    )
    want = df.sort_values(["key", "t", "eid"])
    g = want.groupby("key", sort=True)
    gaps = g["t"].diff().dropna()
    by = gaps.groupby(want.loc[gaps.index, "key"])
    exp = pd.DataFrame(
        {
            "n_events": g.size(),
            "n_gaps": by.size().reindex(g.size().index, fill_value=0),
            "sum_gap": by.sum().reindex(g.size().index, fill_value=0),
            "max_gap": by.max().reindex(g.size().index, fill_value=0),
        }
    ).reset_index()
    for c in ["n_events", "n_gaps", "sum_gap", "max_gap"]:
        assert got[c].astype(np.int64).tolist() == exp[c].astype(np.int64).tolist(), c


def test_grouped_ntile_matches_duckdb(ray_session):
    """grouped_ntile reproduces SQL NTILE's fill rule exactly,
    including groups smaller than the tile count."""
    import duckdb

    from hexscape_ray.stages.agg import grouped_ntile

    rng = np.random.default_rng(17)
    # group sizes straddling n_tiles: 1, 2, 3, 4, 5, 11, 40
    sizes = {10: 1, 20: 2, 30: 3, 40: 4, 50: 5, 60: 11, 70: 40}
    rows = []
    i = 0
    for k, sz in sizes.items():
        for _ in range(sz):
            rows.append({"key": k, "v": int(rng.integers(0, 30)), "id": i})
            i += 1
    df = pd.DataFrame(rows)
    got = (
        grouped_ntile(
            ray.data.from_pandas(df), "key", ["v", "id"], 4, out="tile"
        )
        .to_pandas()
        .sort_values(["key", "v", "id"], ignore_index=True)
    )
    want = duckdb.sql(
        "SELECT key, v, id, ntile(4) OVER (PARTITION BY key ORDER BY v, id)"
        " AS tile FROM df ORDER BY key, v, id"
    ).df()
    assert got["tile"].astype(np.int64).tolist() == want["tile"].astype(np.int64).tolist()


def test_bloom_prefilter_superset_and_exact_join(ray_session):
    """Bloom probes admit every true member (zero false negatives),
    and bloom_prefilter -> exact join == plain join."""
    from hexscape_ray.stages.joins import bloom_build, bloom_prefilter, broadcast_join

    rng = np.random.default_rng(19)
    keys = rng.choice(10_000_000, size=500, replace=False).astype(np.int64)
    small = pd.DataFrame({"k": keys, "label": [f"L{x}" for x in keys]})
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 10_000_000, 20_000).astype(np.int64),
            "v": np.arange(20_000, dtype=np.int64),
        }
    )
    big.loc[:499, "k"] = keys  # guarantee matches
    bloom = bloom_build(keys)
    surv = bloom_prefilter(ray.data.from_pandas(big), bloom, on="k").to_pandas()
    member = big["k"].isin(set(keys.tolist()))
    assert set(big.loc[member, "v"]) <= set(surv["v"])  # no false negatives
    fp = len(surv) - int(member.sum())
    assert fp <= max(40, int(0.01 * len(big)))  # ~0.3% design rate, slack

    joined = (
        broadcast_join(ray.data.from_pandas(surv), small, on="k")
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    want = big.merge(small, on="k").sort_values("v", ignore_index=True)
    assert joined[["k", "v", "label"]].equals(want[["k", "v", "label"]])


def test_lev_prefix_chunk_matches_duckdb():
    """Pair-axis DP kernel == DuckDB levenshtein on random padded
    strings, including empty and equal strings."""
    import duckdb

    from hexscape_ray.stages.dedup import _lev_prefix_chunk

    rng = np.random.default_rng(23)
    L, P = 12, 300
    alpha = np.frombuffer(b"abcx", dtype=np.uint8)
    sa, sb, la, lb = [], [], [], []
    for _ in range(P):
        na, nb = int(rng.integers(0, L + 1)), int(rng.integers(0, L + 1))
        sa.append(bytes(rng.choice(alpha, na)))
        sb.append(bytes(rng.choice(alpha, nb)))
        la.append(na)
        lb.append(nb)
    sa[0], sb[0] = b"", b""          # both empty
    sa[1], sb[1] = b"abc", b"abc"    # equal
    la[0] = lb[0] = 0
    la[1] = lb[1] = 3
    A = np.zeros((P, L), dtype=np.uint8)
    B = np.zeros((P, L), dtype=np.uint8)
    for i in range(P):
        A[i, : la[i]] = np.frombuffer(sa[i], dtype=np.uint8)
        B[i, : lb[i]] = np.frombuffer(sb[i], dtype=np.uint8)
    got = _lev_prefix_chunk(
        A, np.array(la, dtype=np.int64), B, np.array(lb, dtype=np.int64)
    )
    df = pd.DataFrame(
        {"a": [s.decode() for s in sa], "b": [s.decode() for s in sb]}
    )
    want = duckdb.sql("SELECT levenshtein(a, b) AS d FROM df").df()["d"]
    assert got.tolist() == want.astype(np.int64).tolist()


def test_edit_distance_pairs_matches_bruteforce(ray_session):
    """Banded routing + two-pointer candidates find EXACTLY the pairs
    the all-pairs predicate defines (each once), across band
    boundaries and multiple blocks."""
    import duckdb

    from hexscape_ray.stages.dedup import edit_distance_pairs

    rng = np.random.default_rng(29)
    words = ["data", "ray", "spark", "hash", "scan", "sort", "join"]
    rows = []
    for i in range(240):
        txt = " ".join(rng.choice(words, int(rng.integers(3, 30))))
        rows.append(
            {
                "doc_id": i,
                "text": txt,
                "lang": ["aa", "bb"][int(rng.integers(0, 2))],
                "n_chars": len(txt),
            }
        )
    # planted near-dup straddling a length band edge
    rows[0].update(text="x" * 31, n_chars=31, lang="aa")
    rows[1].update(text="x" * 30 + "yz", n_chars=32, lang="aa")
    df = pd.DataFrame(rows)
    got = (
        edit_distance_pairs(
            ray.data.from_pandas(df), prefix_len=24, max_dist=10, len_band=8
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    want = duckdb.sql(
        """
        WITH d AS (SELECT doc_id, lang, n_chars, substr(text,1,24) p FROM df)
        SELECT a.doc_id doc_a, b.doc_id doc_b, levenshtein(a.p,b.p) dist
        FROM d a JOIN d b ON a.lang=b.lang AND a.doc_id < b.doc_id
          AND abs(a.n_chars-b.n_chars) <= 8
        WHERE levenshtein(a.p,b.p) <= 10 ORDER BY doc_a, doc_b
        """
    ).df()
    assert got["doc_a"].tolist() == want["doc_a"].astype(np.int64).tolist()
    assert got["doc_b"].tolist() == want["doc_b"].astype(np.int64).tolist()
    assert got["dist"].tolist() == want["dist"].astype(np.int64).tolist()
    assert ((got["doc_a"] == 0) & (got["doc_b"] == 1)).any()  # planted pair found


def test_coarse_width_scales_with_input():
    """The pair-generator shuffle width grows with the estimated row
    count (round-3 verdict #2: a fixed 64 caps parallelism and lets
    per-task memory grow linearly with the corpus), stays a power of
    two (bitmask bucket keys), floors at 64, and caps at 2^20."""
    from hexscape_ray.stages.dedup import COARSE_TARGET_ROWS, coarse_width

    assert coarse_width(0) == 64
    assert coarse_width(1_000) == 64
    assert coarse_width(64 * COARSE_TARGET_ROWS) == 64
    w1 = coarse_width(10**9)
    w2 = coarse_width(10**11)
    assert w1 > 64 and w2 > w1
    for w in (w1, w2):
        assert w & (w - 1) == 0  # power of two
    assert coarse_width(10**18) == 1 << 20
    # each group holds ~COARSE_TARGET_ROWS rows (within the 2× pow2 round)
    assert 10**9 / coarse_width(10**9) <= COARSE_TARGET_ROWS


def test_duplicate_spans_hash_vs_gram_audit(ray_session):
    """The 128-bit-gram-id path (default shuffle payload) and the
    carry_gram collision-audit path (groups on the gram STRING) emit
    identical spans, and a non-default coarse width does not change the
    output (fine runs are intact under any modulus)."""
    from hexscape_ray.stages.dedup import duplicate_spans

    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(40)]
    shared = ["x1", "x2", "x3", "x4", "x5"]
    docs = []
    for d in range(10):
        toks = list(rng.choice(vocab, size=30))
        if d % 2 == 0:
            toks[7:7] = shared
        docs.append(" ".join(toks))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    ).repartition(3)

    def run(**kw):
        return (
            duplicate_spans(ds, k=4, **kw)
            .to_pandas()
            .sort_values(
                ["a_id", "b_id", "a_start", "b_start"], ignore_index=True
            )
        )

    base = run()
    audit = run(carry_gram=True)
    wide = run(n_coarse=256)
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, audit)
    pd.testing.assert_frame_equal(base, wide)


def test_fnv1a_128_families_independent_and_consistent():
    """Family 1 of the 128-bit string hash is bit-identical to the
    scalar fnv1a_64 path; family 2 differs from family 1 on every test
    string (independent offset basis)."""
    from hexscape_ray.functions.hashing import (
        fnv1a_64_str_array,
        fnv1a_128_str_array,
    )

    strs = ["", "a", "ab", "hello world", "héllo wörld", "x" * 100]
    h1, h2 = fnv1a_128_str_array(strs)
    ref = fnv1a_64_str_array(strs)
    assert (h1 == ref).all()
    assert (h1 != h2).all()
    e1, e2 = fnv1a_128_str_array([])
    assert e1.size == 0 and e2.size == 0


def test_edit_distance_pairs_non_ascii(ray_session):
    """Levenshtein parity with DuckDB on a non-ASCII corpus (accents,
    CJK, emoji): DuckDB's substr is codepoint-level but its levenshtein
    is byte-level, so the engine byte-DPs the codepoint-sliced prefix
    WITHOUT byte truncation (the old 40-byte cut silently shortened
    non-ASCII prefixes)."""
    import duckdb

    from hexscape_ray.stages.dedup import edit_distance_pairs

    texts = [
        "héllo wörld çafé au lait déjà vu über alles naïve",
        "héllo wörld çafé au lait déjà vu über alles naïvé",
        "日本語のテキストです これはテストです よろしくお願いします",
        "日本語のテキストです これはテストですん よろしくお願いします",
        "mixed ascii and 日本語 plus émojis 🎉🎊 here",
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["x"] * len(texts),
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    got = (
        edit_distance_pairs(
            ray.data.from_pandas(df), prefix_len=30, max_dist=12, len_band=64
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    want = duckdb.sql(
        """
        WITH d AS (SELECT doc_id, lang, n_chars, substr(text,1,30) p FROM df)
        SELECT a.doc_id doc_a, b.doc_id doc_b, levenshtein(a.p,b.p) dist
        FROM d a JOIN d b ON a.lang=b.lang AND a.doc_id < b.doc_id
          AND abs(a.n_chars-b.n_chars) <= 64
        WHERE levenshtein(a.p,b.p) <= 12 ORDER BY doc_a, doc_b
        """
    ).df()
    assert got["doc_a"].tolist() == want["doc_a"].astype(np.int64).tolist()
    assert got["doc_b"].tolist() == want["doc_b"].astype(np.int64).tolist()
    assert got["dist"].tolist() == want["dist"].astype(np.int64).tolist()
    assert len(got) >= 2  # the accent pair and the CJK pair both found


def test_derive_n_buckets_scales(ray_session):
    """Join bucket width derives from probe-able input sizes (floor 64,
    grows with bytes), never executes a lazy pipeline (unprobed sides
    fall back to the default), and the oracle-facing joins accept the
    derived width."""
    from hexscape_ray.stages.joins import (
        JOIN_BUCKET_TARGET_BYTES,
        _safe_size_bytes,
        bucketed_join,
        derive_n_buckets,
    )

    small = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                  "v": pa.array(np.arange(100, dtype=np.int64))})
    )
    assert derive_n_buckets(small) == 64

    calls = {"n": 0}

    def bump(b):
        calls["n"] += 1
        return b

    lazy = small.map_batches(bump, batch_format="pyarrow")
    assert _safe_size_bytes(lazy) is None
    assert derive_n_buckets(lazy) == 64  # fallback, no execution
    assert calls["n"] == 0

    big_m = small.materialize()
    sz = big_m.size_bytes()
    assert _safe_size_bytes(big_m) == sz
    # synthetic check of the width formula at cluster scale
    assert derive_n_buckets(small, default=64) == 64
    w = -(-(200 * JOIN_BUCKET_TARGET_BYTES) // JOIN_BUCKET_TARGET_BYTES)
    assert w == 200  # sanity of the ceil-div the derivation uses

    # end-to-end: derived-width join equals explicit-width join
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(0, 100, 2, dtype=np.int64)),
                  "w": pa.array(np.arange(50, dtype=np.int64))})
    )
    a = bucketed_join(small, right, on="k").to_pandas().sort_values("k", ignore_index=True)
    b = bucketed_join(small, right, on="k", n_buckets=8).to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_doc_tfidf_matches_duckdb(ray_session):
    """doc_tfidf_top_terms == the SQL TF-IDF (micro-rounded ln scores,
    token-ascending tie-break) on a synthetic corpus with ties, rare
    terms, and repeated tokens."""
    import duckdb

    from hexscape_ray.stages.textops import doc_tfidf_top_terms

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(40):
        toks = list(rng.choice(vocab, size=rng.integers(5, 40)))
        if d % 7 == 0:
            toks += [f"rare{d}"] * 2  # distinctive rare term
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})
    got = (
        doc_tfidf_top_terms(ray.data.from_pandas(df).repartition(4), k=3)
        .to_pandas()
        .sort_values(["doc_id", "tfidf_pml", "token"],
                     ascending=[True, False, True], ignore_index=True)
    )
    want = duckdb.sql(
        """
        WITH tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) tf
          FROM (SELECT doc_id, unnest(string_split(text,' ')) token FROM df)
          GROUP BY doc_id, token),
        dft AS (SELECT token, CAST(count(*) AS BIGINT) df FROM tf GROUP BY token),
        n AS (SELECT CAST(count(*) AS DOUBLE) n FROM df),
        s AS (SELECT tf.doc_id, tf.token, tf.tf, dft.df,
                CAST(floor(1e6*tf.tf*ln(n.n/dft.df)+0.5) AS BIGINT) tfidf_pml
              FROM tf JOIN dft USING (token), n),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf_pml DESC, token ASC) rk FROM s)
        SELECT doc_id, token, tf, df, tfidf_pml FROM r WHERE rk <= 3
        ORDER BY doc_id, tfidf_pml DESC, token
        """
    ).df()
    assert len(got) == len(want)
    for c in ("doc_id", "tf", "df", "tfidf_pml"):
        assert (got[c].to_numpy() == want[c].to_numpy(np.int64)).all(), c
    assert got["token"].tolist() == want["token"].tolist()
    # the planted rare terms rank first for their docs
    top1 = got.groupby("doc_id").first()
    assert top1.loc[0, "token"] == "rare0" and top1.loc[7, "token"] == "rare7"


def test_semantic_dedup_plants_and_partition_invariance(ray_session):
    """semantic_dedup drops exactly the planted higher-id near-copies
    (cosine > threshold to a lower-id cluster member) and keeps
    orthogonal vectors; output invariant under repartitioning."""
    from hexscape_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(23)
    dim = 16
    base = rng.standard_normal((10, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, planted_dups = [], []
    vid = 0
    rows = []
    for b in range(10):
        rows.append((vid, base[b])); vid += 1
        if b % 2 == 0:  # a near-copy: tiny perturbation, cosine ≈ 1
            nd = base[b] + rng.normal(0, 0.01, dim)
            rows.append((vid, nd / np.linalg.norm(nd)))
            planted_dups.append(vid)
            vid += 1
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    embs = [r[1].tolist() for r in rows]
    tbl = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(embs)})

    def run(parts):
        return (
            semantic_dedup(
                ray.data.from_arrow(tbl).repartition(parts),
                k=3, threshold=0.98, n_iter=6,
            )
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )

    a = run(2)
    b = run(5)
    # keep/drop decisions are partition-invariant (cluster LABELS may
    # permute/drift: Lloyd's partial sums re-associate across
    # partitionings, a documented float property — near-identical
    # pairs still always co-cluster)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert a["keep"].tolist() == b["keep"].tolist()
    dropped = set(a.loc[~a["keep"], "vec_id"])
    assert dropped == set(planted_dups)
    assert a["keep"].sum() == len(rows) - len(planted_dups)


def test_doc_unigram_logprob_matches_duckdb(ray_session):
    """doc_unigram_logprob == the SQL unigram surprisal: per-token
    micro-rounded -ln p, integer-summed (partition-order-invariant)."""
    import duckdb

    from hexscape_ray.stages.textops import doc_unigram_logprob

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(25)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 60))) for _ in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64), "text": docs})
    got = (
        doc_unigram_logprob(ray.data.from_pandas(df).repartition(6))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = duckdb.sql(
        """
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) token FROM df),
        census AS (SELECT token, CAST(count(*) AS BIGINT) c FROM tok GROUP BY token),
        total AS (SELECT CAST(sum(c) AS DOUBLE) t FROM census),
        per_tok AS (SELECT tok.doc_id,
            CAST(floor(1e6*ln(total.t/census.c)+0.5) AS BIGINT) nll
          FROM tok JOIN census USING (token), total)
        SELECT doc_id, count(*) n_tokens, CAST(sum(nll) AS BIGINT) nll_pml_sum,
               CAST(sum(nll) // count(*) AS BIGINT) mean_nll_pml
        FROM per_tok GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    for c in ("doc_id", "n_tokens", "nll_pml_sum", "mean_nll_pml"):
        assert (got[c].to_numpy() == want[c].to_numpy(np.int64)).all(), c
    # rare tokens cost more than common ones: the doc with the rarest
    # mix has a higher mean surprisal than the most-common-token doc
    assert got["mean_nll_pml"].std() > 0


def test_bm25_topk_matches_duckdb(ray_session):
    """bm25_topk == brute-force SQL BM25 (Lucene idf, micro-rounded
    per-term contributions, integer-summed) on a synthetic corpus,
    including a query term absent from the corpus (df = 0)."""
    import duckdb

    from hexscape_ray.stages.textops import bm25_topk

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(20)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(4, 50))) for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": docs})
    queries = {1: ["w0", "w5"], 2: ["w19", "missingterm"], 3: ["w3"]}
    got = (
        bm25_topk(ray.data.from_pandas(df).repartition(5), queries=queries, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    vals = ",".join(f"({q},'{t}')" for q, ts in sorted(queries.items()) for t in ts)
    want = duckdb.sql(f"""
      WITH q(query_id, term) AS (VALUES {vals}),
      terms AS (SELECT DISTINCT term FROM q),
      tok AS (SELECT doc_id, unnest(string_split(text,' ')) token FROM df),
      dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) dl FROM tok GROUP BY doc_id),
      stats AS (SELECT CAST((SELECT count(*) FROM df) AS DOUBLE) n,
        (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(*) FROM df) avgdl),
      dfs AS (SELECT terms.term,
          CAST(coalesce(count(DISTINCT tok.doc_id), 0) AS DOUBLE) df
        FROM terms LEFT JOIN tok ON tok.token = terms.term GROUP BY terms.term),
      tf AS (SELECT tok.doc_id, terms.term, CAST(count(*) AS BIGINT) tf
        FROM tok JOIN terms ON tok.token = terms.term GROUP BY 1, 2),
      contrib AS (SELECT q.query_id, tf.doc_id,
          CAST(floor(1e6 * (ln(1 + (stats.n - dfs.df + 0.5)/(dfs.df + 0.5))
            * (tf.tf * (1.2 + 1))
            / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) + 0.5)
            AS BIGINT) c
        FROM tf JOIN q ON q.term = tf.term
        JOIN dl ON dl.doc_id = tf.doc_id, stats, dfs WHERE dfs.term = tf.term),
      scores AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) score_pml
        FROM contrib GROUP BY query_id, doc_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY score_pml DESC, doc_id ASC) rank FROM scores)
      SELECT query_id, doc_id, score_pml, CAST(rank AS BIGINT) rank
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """).df()
    assert len(got) == len(want)
    for c in ("query_id", "doc_id", "score_pml", "rank"):
        assert (got[c].to_numpy() == want[c].to_numpy(np.int64)).all(), c


def test_quantize_int8_roundtrip_and_codes(ray_session):
    """INT8 quantisation: codes bounded to [-127, 127], dequantised
    reconstruction error <= scale/254 per element (half-up rounding),
    zero vectors quantise to zero codes with scale 0, and the integer
    summary matches a direct numpy recompute."""
    from hexscape_ray.stages.knn import quantize_embeddings_int8

    rng = np.random.default_rng(37)
    X = rng.standard_normal((30, 16))
    X[5] = 0.0  # zero vector
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in X]),
        }
    )
    out = (
        quantize_embeddings_int8(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    codes = np.stack(out["codes"].to_numpy())
    assert codes.dtype == np.int8
    assert np.abs(codes.astype(int)).max() <= 127
    scale = np.abs(X).max(axis=1)
    # reconstruction error bound: |x - q*scale/127| <= scale/254
    deq = codes.astype(np.float64) * scale[:, None] / 127.0
    deq[scale == 0] = 0.0
    assert (np.abs(deq - X) <= scale[:, None] / 254.0 + 1e-12).all()
    assert (codes[5] == 0).all() and out["scale_pml"][5] == 0
    safe = np.where(scale > 0, scale, 1.0)
    q = np.floor(X * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    q[scale == 0] = 0
    assert (out["sum_q"].to_numpy() == q.sum(axis=1)).all()
    assert (out["sum_abs_q"].to_numpy() == np.abs(q).sum(axis=1)).all()
    assert (out["n_sat"].to_numpy() == (np.abs(q) == 127).sum(axis=1)).all()


def test_streaming_exact_dedup_matches_batch(ray_session):
    """Streaming shard-actor dedup == batch exact_dedup on a corpus
    with planted duplicate groups, regardless of block layout; the
    mid-stream novelty probe answers correctly after ingest."""
    import ray as _ray

    from hexscape_ray.functions.hashing import fnv1a_64_str_array
    from hexscape_ray.stages.dedup import exact_dedup
    from hexscape_ray.stages.streaming import DedupShard, streaming_exact_dedup

    rng = np.random.default_rng(41)
    texts = [f"unique doc {i} " + " ".join(map(str, rng.integers(0, 9, 5))) for i in range(40)]
    texts += [texts[3]] * 4 + [texts[10]] * 2  # planted dup groups
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df).repartition(5)
    got = streaming_exact_dedup(ds, n_shards=3)
    want = (
        exact_dedup(ds)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_copies"].tolist() == want["n_copies"].tolist()
    assert int(got.loc[got["doc_id"] == 3, "n_copies"].iloc[0]) == 5

    # novelty probe: a fed hash is seen, a fresh one is not
    shard = DedupShard.remote()
    h = fnv1a_64_str_array(["a", "b"]).astype(np.int64)
    _ray.get(shard.feed.remote(h[:1], np.array([7], dtype=np.int64)))
    seen = _ray.get(shard.seen.remote(h))
    assert seen.tolist() == [True, False]


def test_doc_bigram_logprob_matches_duckdb(ray_session):
    """Interpolated bigram-LM surprisal == the SQL mirror (unigram for
    token 1, 0.8/(1-0.8) interpolation after), including single-token
    docs and repeated bigrams."""
    import duckdb

    from hexscape_ray.stages.textops import doc_bigram_logprob

    rng = np.random.default_rng(43)
    vocab = [f"w{i}" for i in range(12)]
    docs = ["w0"]  # single-token doc: unigram-only path
    docs += [" ".join(rng.choice(vocab, size=rng.integers(2, 30))) for _ in range(40)]
    docs += ["w1 w2 w1 w2 w1 w2"]  # heavy repeated bigram
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    got = (
        doc_bigram_logprob(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = duckdb.sql("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM df),
      tok AS (SELECT doc_id, unnest(l) tok, unnest(range(1, len(l)+1)) pos FROM d),
      uni AS (SELECT tok g, CAST(count(*) AS BIGINT) c FROM tok GROUP BY tok),
      total AS (SELECT CAST(sum(c) AS DOUBLE) t FROM uni),
      big AS (SELECT a.tok w1, b.tok w2, CAST(count(*) AS BIGINT) c12
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2),
      per AS (SELECT t.doc_id,
          CASE WHEN t.pos = 1 THEN
            CAST(floor(1e6 * ln(total.t / u.c) + 0.5) AS BIGINT)
          ELSE
            CAST(floor(1e6 * (- ln(0.8 * bg.c12 / up.c
                                   + (1 - 0.8) * u.c / total.t)) + 0.5) AS BIGINT)
          END nll
        FROM tok t JOIN uni u ON u.g = t.tok
        LEFT JOIN tok prev ON prev.doc_id = t.doc_id AND prev.pos = t.pos - 1
        LEFT JOIN uni up ON up.g = prev.tok
        LEFT JOIN big bg ON bg.w1 = prev.tok AND bg.w2 = t.tok, total)
      SELECT doc_id, count(*) n_tokens, CAST(sum(nll) AS BIGINT) nll2_pml_sum,
             CAST(sum(nll) // count(*) AS BIGINT) mean_nll2_pml
      FROM per GROUP BY doc_id ORDER BY doc_id
    """).df()
    for c in ("doc_id", "n_tokens", "nll2_pml_sum", "mean_nll2_pml"):
        assert (got[c].to_numpy() == want[c].to_numpy(np.int64)).all(), c
    # the repeated-bigram doc is much less surprising per token than
    # the random docs (the bigram model "learned" it)
    rep = got.loc[got["doc_id"] == len(docs) - 1, "mean_nll2_pml"].iloc[0]
    assert rep < got["mean_nll2_pml"].median()


def test_segment_dedup_brute_force_and_partition_invariance(ray_session):
    """segment_dedup == brute-force python first-occurrence dedup, and
    the output is invariant to input partitioning (keep decisions are
    global, not block-local)."""
    import ray.data as rd

    from hexscape_ray.stages.dedup import segment_dedup

    rng = np.random.default_rng(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = []
    for d in range(40):
        n = int(rng.integers(1, 35))
        docs.append(" ".join(vocab[i] for i in rng.integers(0, 5, n)))
    docs[7] = docs[3]  # exact duplicate doc
    docs[11] = docs[3] + " " + docs[5]  # composed of earlier segments + glue
    W = 3

    # brute force: first corpus-wide occurrence of each W-token segment
    seen, kept = set(), {}
    for d, t in enumerate(docs):
        toks = t.split(" ")
        for j in range((len(toks) - 1) // W + 1):
            seg = " ".join(toks[j * W : (j + 1) * W])
            if seg not in seen:
                seen.add(seg)
                n_kept, n_tok = kept.get(d, (0, 0))
                kept[d] = (n_kept + 1, n_tok + len(toks[j * W : (j + 1) * W]))

    src = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                    "text": pa.array(docs, type=pa.string())})
    for parts in (1, 7):
        ds = rd.from_arrow(src).repartition(parts)
        got = segment_dedup(ds, width=W).to_pandas()
        assert list(got["doc_id"]) == sorted(kept)
        for _, r in got.iterrows():
            want = kept[int(r["doc_id"])]
            assert (int(r["n_kept"]), int(r["kept_tokens"])) == want
    # the exact-duplicate doc kept nothing
    assert 7 not in kept


def test_unpivot_and_regex_scrub(ray_session):
    import ray.data as rd

    from hexscape_ray.stages.agg import unpivot
    from hexscape_ray.stages.textops import regex_scrub

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "a": [10.0, 20.0, 30.0],
            "b": [1.0, 2.0, 3.0],
        }
    )
    got = unpivot(rd.from_arrow(t).repartition(2), ["id"], ["a", "b"]).to_pandas()
    assert len(got) == 6
    assert set(got["measure"]) == {"a", "b"}
    # melt is lossless: pivoting back reproduces the input
    wide = got.pivot(index="id", columns="measure", values="value").reset_index()
    assert (wide["a"].to_numpy() == [10.0, 20.0, 30.0]).all()
    assert (wide["b"].to_numpy() == [1.0, 2.0, 3.0]).all()

    s = pa.table({"x": ["mail: a9@b.io tel 555-0100", "clean", ""]})
    r = regex_scrub(
        rd.from_arrow(s),
        "x",
        [(r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"), (r"[0-9][0-9-]+", "<TEL>")],
    ).to_pandas()
    assert r["redacted"][0] == "mail: <EMAIL> tel <TEL>"
    assert r["n_redacted_chars"][0] == len("a9@b.io") + len("555-0100")
    assert r["redacted"][1] == "clean" and r["n_redacted_chars"][1] == 0
    assert r["n_redacted_chars"][2] == 0


def test_bpe_train_matches_naive_reference(ray_session):
    """bpe_train (distributed word-type count + single-task merge loop)
    == a from-first-principles naive BPE that recounts pairs from the
    RAW CORPUS every iteration (different algorithm shape, same
    definition), and bpe_encode_stats replays training exactly."""
    import ray.data as rd

    from hexscape_ray.stages.textops import (
        bpe_apply_word,
        bpe_encode_stats,
        bpe_train,
    )

    rng = np.random.default_rng(9)
    vocab = ["spark", "sparse", "sparkle", "park", "lark", "larkspur", "spur"]
    docs = [
        " ".join(vocab[i] for i in rng.integers(0, len(vocab), int(rng.integers(3, 12))))
        for _ in range(25)
    ]

    # naive reference: corpus = flat token list, re-derive everything
    def naive(n_merges):
        toks = [t for d in docs for t in d.split(" ")]
        seqs = [list(w) + ["</w>"] for w in toks]  # per OCCURRENCE
        merges = []
        for rank in range(n_merges):
            pc_ = {}
            for s in seqs:
                for p in zip(s, s[1:]):
                    pc_[p] = pc_.get(p, 0) + 1
            if not pc_:
                break
            (a, b), n = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
            if n < 2:
                break
            merges.append((rank, a, b, n))
            for i, s in enumerate(seqs):
                j, out = 0, []
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                seqs[i] = out
        return merges, seqs

    want, want_seqs = naive(12)
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(docs)), type=pa.int64()), "text": docs}
        )
    ).repartition(4)
    got = bpe_train(ds, n_merges=12).to_pandas().sort_values("rank")
    assert [
        (int(r), l, rr, int(n))
        for r, l, rr, n in zip(got["rank"], got["left"], got["right"], got["n"])
    ] == want

    # encode replay: piece count per occurrence == naive final seqs
    ranks = {(l, r): int(k) for k, l, r, _ in want}
    toks = [t for d in docs for t in d.split(" ")]
    for w, s in zip(toks, want_seqs):
        assert bpe_apply_word(w, ranks) == s
    st = bpe_encode_stats(ds, got).to_pandas().sort_values("doc_id")
    flat_i = 0
    for d, (_, row) in zip(docs, st.iterrows()):
        n = len(d.split(" "))
        assert int(row["n_tokens"]) == n
        assert int(row["n_pieces"]) == sum(
            len(want_seqs[flat_i + k]) for k in range(n)
        )
        flat_i += n


def test_jl_project_and_compress_ratio(ray_session):
    import zlib

    import ray.data as rd

    from hexscape_ray.stages.knn import jl_project
    from hexscape_ray.stages.textops import doc_compress_ratio

    rng = np.random.default_rng(5)
    V = rng.normal(0, 1, (30, 8)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(30), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in V], type=pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(3)
    got = jl_project(ds, k=2).to_pandas().sort_values(["vec_id", "j"], ignore_index=True)
    # independent recompute: per-term micro-round then integer sum
    jj = np.arange(2)[:, None]
    dd = np.arange(8)[None, :]
    P = ((jj * 131 + dd * 137) % 1009 - 504) / 504.0
    want = np.floor(
        1e6 * (V.astype(np.float64)[:, None, :] * P[None, :, :]) + 0.5
    ).astype(np.int64).sum(axis=2)
    assert (got["proj_pml"].to_numpy().reshape(30, 2) == want).all()

    docs = ["aaaa " * 20, "the quick brown fox", ""]
    dds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), type=pa.int64()), "text": docs})
    )
    r = doc_compress_ratio(dds).to_pandas().sort_values("doc_id", ignore_index=True)
    for i, t in enumerate(docs):
        raw = t.encode()
        assert int(r["n_bytes"][i]) == len(raw)
        assert int(r["n_compressed"][i]) == len(zlib.compress(raw, 6))
    # repetitive text compresses much better than prose
    assert r["ratio_pml"][0] < r["ratio_pml"][1]


def test_logreg_classifier_separable_and_parity(ray_session):
    """Distributed class-weighted logistic regression: (a) learns a
    linearly separable mixture to near-perfect train accuracy; (b) the
    distributed gradient loop matches an in-process numpy GD with the
    same hyperparameters to float tolerance."""
    import ray.data as rd

    from hexscape_ray.stages.classifier import score_logreg, train_logreg

    rng = np.random.default_rng(17)
    n, d = 400, 16
    y = (rng.random(n) < 0.25).astype(np.float64)
    X = rng.normal(0, 1, (n, d))
    X[y == 1] += 2.0  # shift positives: linearly separable-ish
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in X.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array((y == 1).astype(np.int32) * 0 + (1 - y).astype(np.int32)),
        }
    )
    # label 0 = positive class (matches the query convention)
    ds = rd.from_arrow(t).repartition(4)
    w = train_logreg(ds, dim=d, iters=40, lr=2.0, pos_weight=3.0)
    sc = score_logreg(ds, w).to_pandas()
    pos = sc["label"] == 0
    acc = ((sc["pred"]) == pos).mean()
    assert acc > 0.95, acc

    # in-process parity: identical update rule on float32-roundtripped X
    X64 = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    yv = (t["label"].to_numpy(zero_copy_only=False) == 0).astype(np.float64)
    wref = np.zeros(d + 1)
    for _ in range(40):
        z = X64 @ wref[:d] + wref[d]
        p = 1 / (1 + np.exp(-z))
        e = (p - yv) * np.where(yv == 1, 3.0, 1.0)
        g = np.concatenate([X64.T @ e, [e.sum()]]) / n + 1e-3 * np.concatenate(
            [wref[:d], [0.0]]
        )
        wref -= 2.0 * g
    assert np.allclose(w, wref, rtol=1e-8, atol=1e-10)


def test_streaming_lsh_pairs_matches_batch_and_probe(ray_session):
    """Streaming incremental LSH == batch candidate generator
    bit-for-bit (any shard count / partitioning), and the mid-stream
    probe flags a re-fed near-duplicate doc as a candidate."""
    import ray
    import ray.data as rd

    from hexscape_ray.stages.dedup import MinHasher, band_rows_block, minhash_candidate_pairs
    from hexscape_ray.stages.streaming import LSHShard, streaming_lsh_pairs

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    batch = (
        minhash_candidate_pairs(docs)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
        .astype("int64")
    )
    for n_shards, parts in [(3, 5), (8, 2)]:
        got = streaming_lsh_pairs(docs.repartition(parts), n_shards=n_shards)
        assert got.astype("int64").equals(batch), (n_shards, parts)

    # online probe: feed one doc, then probe an identical doc's band
    # rows — every row must hit an occupied bucket
    t = docs.take(1)[0]
    one = pa.table({"doc_id": pa.array([t["doc_id"]], pa.int64()),
                    "text": pa.array([t["text"]])})
    rows = band_rows_block(MinHasher()(one))
    shard = LSHShard.remote()
    ray.get(shard.feed.remote(
        rows["band_id"].to_numpy(zero_copy_only=False),
        rows["band_hash"].to_numpy(zero_copy_only=False),
        rows["doc_id"].to_numpy(zero_copy_only=False),
    ))
    hit = ray.get(shard.probe.remote(
        rows["band_id"].to_numpy(zero_copy_only=False),
        rows["band_hash"].to_numpy(zero_copy_only=False),
    ))
    assert hit.all()


def test_pagerank_matches_integer_replay(ray_session):
    """Distributed pagerank == a driver-side numpy replay of the exact
    integer recurrence on a random symmetric graph (the same floors in
    the same order — any drift in the join/aggregate plumbing shows)."""
    import numpy as np
    import ray

    from hexscape_ray.stages.graph import pagerank

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 60, 240
    u = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    v = (u + 1 + rng.integers(0, n_nodes - 1, n_edges)) % n_nodes  # no self-loops
    su = np.concatenate([u, v])
    sv = np.concatenate([v, u])
    ds = ray.data.from_items([{"u": int(a), "v": int(b)} for a, b in zip(su, sv)])

    # integer replay
    deg = np.bincount(su, minlength=n_nodes).astype(np.int64)
    assert (deg > 0).all()
    r = np.full(n_nodes, 1_000_000, dtype=np.int64)
    for _ in range(3):
        contrib = r[su] // deg[su]
        s = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(s, sv, contrib)
        r = 150_000 + (85 * s) // 100
    for local_threshold in (None, 0):  # None → single-task; 0 → distributed loop
        got = (
            pagerank(ds, n_iter=3, damping_pct=85, local_threshold=local_threshold)
            .to_pandas()
            .sort_values("node")
        )
        assert np.array_equal(got["node"].to_numpy(), np.arange(n_nodes))
        assert np.array_equal(got["rank_micro"].to_numpy(), r), local_threshold


def test_global_cumsum_both_paths(ray_session):
    """Small (single-task) and distributed (bucketed two-level scan)
    paths of global_cumsum agree with numpy on shuffled sparse ids."""
    import numpy as np
    import ray

    from hexscape_ray.stages.agg import global_cumsum

    rng = np.random.default_rng(23)
    n = 5000
    order = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse, shuffled
    val = rng.integers(1, 100, n).astype(np.int64)
    ds = ray.data.from_items(
        [{"o": int(o), "v": int(x)} for o, x in zip(order, val)]
    ).repartition(13)
    idx = np.argsort(order)
    want = np.cumsum(val[idx])

    for small_threshold in (None, 0):  # None → single-task; 0 → bucketed
        got = (
            global_cumsum(
                ds, "o", "v", out_col="c",
                n_rows_est=n, order_hi=int(order.max()) + 1,
                small_threshold=small_threshold,
            )
            .to_pandas()
            .sort_values("o")
        )
        assert np.array_equal(got["o"].to_numpy(), order[idx])
        assert np.array_equal(got["c"].to_numpy(), want), small_threshold


def test_adaptive_join_both_placements_match(ray_session):
    """adaptive_join broadcast (Acero) and bucketed placements produce
    identical multisets for inner and semi joins, including duplicate
    keys and unmatched rows on either side."""
    import numpy as np
    import pandas as pd
    import ray

    from hexscape_ray.stages.joins import adaptive_join

    rng = np.random.default_rng(31)
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400).astype(np.int64),
            "x": np.arange(400, dtype=np.int64),
        }
    )
    side = pd.DataFrame(
        {
            "k": np.repeat(np.arange(0, 60, 2, dtype=np.int64), 2),  # dups + misses
            "y": np.arange(60, dtype=np.int64),
        }
    )
    big_ds = ray.data.from_pandas(big).repartition(5)
    side_ds = ray.data.from_pandas(side).repartition(3)

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), ignore_index=True)

    for how in ("inner", "semi"):
        out_b = adaptive_join(big_ds, side_ds, on="k", how=how).to_pandas()
        # force the bucketed path with a huge side_count
        out_p = adaptive_join(
            big_ds, side_ds, on="k", how=how, side_count=10**9
        ).to_pandas()
        a, b = canon(out_b), canon(out_p)
        assert sorted(a.columns) == sorted(b.columns), how
        assert len(a) == len(b), how
        for c in a.columns:
            assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), (how, c)


def test_streaming_hex_counts_matches_batch_and_probe(ray_session):
    """streaming_hex_counts == the batch per-hex census under shuffled
    block order; occupied() answers the mid-stream coverage probe."""
    import numpy as np
    import ray

    from hexscape_ray.pipelines.queries import q_hex_doc_counts
    from hexscape_ray.stages.streaming import streaming_hex_counts
    from tests.conftest import SF_SMOKE

    docs = ray.data.read_parquet(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "n_chars"]
    ).random_shuffle(seed=5)
    got = streaming_hex_counts(docs, n_shards=3)
    want = (
        q_hex_doc_counts(SF_SMOKE)
        .to_pandas()
        .sort_values(["r", "q"], ignore_index=True)
    )
    assert np.array_equal(got["r"].to_numpy(), want["r"].to_numpy())
    assert np.array_equal(got["q"].to_numpy(), want["q"].to_numpy())
    assert np.array_equal(got["n_docs"].to_numpy(), want["n_docs"].to_numpy())
    assert np.array_equal(got["len_sum"].to_numpy(), want["len_sum"].to_numpy())


def test_streaming_shard_snapshot_recovery(ray_session):
    """Kill-and-restore parity: feed half the stream, snapshot the
    shard actors, start FRESH actors, load the snapshots, feed the
    rest — final flush equals the single-pass batch answer for both
    the dedup and hex-census shards (commutative state composes with
    any replay split)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from hexscape_ray.functions.hashing import fnv1a_64_str_array
    from hexscape_ray.stages.streaming import DedupShard, HexCountShard

    rng = np.random.default_rng(41)
    texts = [f"doc {i % 37}" for i in range(300)]  # forced duplicates
    ids = rng.permutation(300).astype(np.int64)
    h = fnv1a_64_str_array(texts).astype(np.int64)

    # --- DedupShard ---
    def run_dedup(split):
        s1 = DedupShard.remote()
        ray.get(s1.feed.remote(h[:split], ids[:split]))
        snap = ray.get(s1.snapshot.remote())
        ray.kill(s1)
        s2 = DedupShard.remote()
        ray.get(s2.load.remote(snap))
        ray.get(s2.feed.remote(h[split:], ids[split:]))
        out = ray.get(s2.flush.remote()).to_pandas()
        ray.kill(s2)
        return out.sort_values("doc_id", ignore_index=True)

    whole = run_dedup(0)
    assert whole.equals(run_dedup(150))
    assert whole.equals(run_dedup(299))

    # --- HexCountShard ---
    r = rng.integers(-5, 5, 300).astype(np.int64)
    q = rng.integers(-5, 5, 300).astype(np.int64)
    n1 = np.ones(300, dtype=np.int64)
    ln = rng.integers(10, 400, 300).astype(np.int64)

    def run_hex(split):
        s1 = HexCountShard.remote()
        ray.get(s1.feed.remote(r[:split], q[:split], n1[:split], ln[:split]))
        snap = ray.get(s1.flush.remote())  # flush IS the full state here
        ray.kill(s1)
        s2 = HexCountShard.remote()
        ray.get(s2.load.remote(snap))
        ray.get(s2.feed.remote(r[split:], q[split:], n1[split:], ln[split:]))
        out = ray.get(s2.flush.remote()).to_pandas()
        ray.kill(s2)
        return out.sort_values(["r", "q"], ignore_index=True)

    hw = run_hex(0)
    assert hw.equals(run_hex(100))
    assert hw.equals(run_hex(300))


def test_ndx_near_dup_invariants(ray_session):
    """SQL-exact near-dup family: exact duplicates verify with
    inter == union and land in one cluster; the winnowing guarantee
    (shared run of ≥ w + k − 1 tokens ⇒ shared fingerprint) holds."""
    import ray

    from hexscape_ray.stages.dedup import ndx_verified_pairs, ndx_winnow_rows

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    texts = [
        f"doc zero unique {shared} tail zero",
        f"doc one other {shared} tail one words",
        "completely different text about nothing shared here at all",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 3
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
    )
    vt = ndx_verified_pairs(ds)
    pairs = {(a, b): (i, u) for a, b, i, u in zip(
        vt["a"].to_pylist(), vt["b"].to_pylist(),
        vt["inter_grams"].to_pylist(), vt["union_grams"].to_pylist())}
    assert (3, 4) in pairs  # exact dup must be an LSH candidate
    i, u = pairs[(3, 4)]
    assert i == u  # identical trigram sets
    for (a, b) in pairs:
        assert a < b

    # winnowing guarantee: docs 0 and 1 share a 6-token run ≥ w+k-1=6
    wf = ndx_winnow_rows(ds).to_pandas()
    f0 = set(wf[wf.doc_id == 0].fp)
    f1 = set(wf[wf.doc_id == 1].fp)
    assert f0 & f1
    # exact duplicates fingerprint identically
    f3 = wf[wf.doc_id == 3][["pos", "fp"]].reset_index(drop=True)
    f4 = wf[wf.doc_id == 4][["pos", "fp"]].reset_index(drop=True)
    assert f3.equals(f4)


def test_latest_state_shard_recovery(ray_session):
    """Argmax shard state composes with any replay split: feed → kill
    → load(snapshot) → feed(rest) equals one continuous feed."""
    import ray

    from hexscape_ray.stages.streaming import LatestStateShard

    rng = np.random.default_rng(9)
    n = 400
    uid = rng.integers(0, 40, n).astype(np.int64)
    us = rng.integers(0, 10**9, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    etype = [f"t{int(x) % 3}" for x in rng.integers(0, 3, n)]
    vmic = rng.integers(-10**6, 10**6, n).astype(np.int64)

    def run(split):
        s1 = LatestStateShard.remote()
        ray.get(
            s1.feed.remote(uid[:split], us[:split], eid[:split], etype[:split], vmic[:split])
        )
        snap = ray.get(s1.flush.remote())
        ray.kill(s1)
        s2 = LatestStateShard.remote()
        ray.get(s2.load.remote(snap))
        ray.get(
            s2.feed.remote(uid[split:], us[split:], eid[split:], etype[split:], vmic[split:])
        )
        out = ray.get(s2.flush.remote()).to_pandas()
        ray.kill(s2)
        return out

    base = run(0)
    assert base.equals(run(137))
    assert base.equals(run(400))


def test_kmv_overlap_estimate_accuracy(ray_session):
    """KMV theta-sketch overlap vs ground truth on synthetic sets with
    known intersection: estimates within ~3/sqrt(k)."""
    import ray

    from hexscape_ray.stages.sketch import kmv_bottomk

    k = 256
    a_ids = np.arange(0, 6000, dtype=np.int64)
    b_ids = np.arange(4000, 10000, dtype=np.int64)  # overlap 2000, union 10000
    dsa = ray.data.from_arrow(pa.table({"user_id": pa.array(a_ids)})).repartition(5)
    dsb = ray.data.from_arrow(pa.table({"user_id": pa.array(b_ids)})).repartition(3)
    ska = kmv_bottomk(dsa, "user_id", k=k)
    skb = kmv_bottomk(dsb, "user_id", k=k)
    uni = np.unique(np.concatenate([ska, skb]))[:k]
    kth = np.float64(uni[-1]) / 18446744073709551616.0
    union_est = (k - 1) / kth
    common = int(np.sum(np.isin(uni, ska) & np.isin(uni, skb)))
    inter_est = (common / k) * union_est
    assert abs(union_est - 10000) / 10000 < 3 / np.sqrt(k)
    assert abs(inter_est - 2000) / 10000 < 3 / np.sqrt(k)
    # partition-invariance: sketches are pure functions of the set
    assert np.array_equal(ska, kmv_bottomk(dsa.repartition(11), "user_id", k=k))


def test_radix_select_matches_numpy(ray_session):
    """Radix select == quantile_disc rule (sorted[ceil(q·n)−1]) on
    random int64 values INCLUDING negatives (biased-order trap) and
    duplicates, across partitionings."""
    import math

    import ray

    from hexscape_ray.stages.agg import radix_select

    rng = np.random.default_rng(17)
    vals = np.concatenate(
        [
            rng.integers(-(10**12), 10**12, 3000),
            rng.integers(-5, 5, 500),  # heavy duplicates
        ]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(7)
    sv = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.999):
        got, n = radix_select(ds, "v", q=q)
        assert n == vals.size
        assert got == int(sv[max(math.ceil(q * vals.size), 1) - 1]), q


def test_radix_select_multi_matches_single(ray_session):
    """The shared-pass 16-bit multi-rank walk returns exactly what the
    byte-wise single-rank primitive does, rank by rank."""
    import ray

    from hexscape_ray.stages.agg import radix_select, radix_select_multi

    rng = np.random.default_rng(23)
    vals = np.concatenate(
        [rng.integers(-(10**12), 10**12, 4000), rng.integers(-3, 3, 400)]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)
    multi = radix_select_multi(ds, "v", {"a": 0.1, "b": 0.5, "c": 0.93})
    for name, q in (("a", 0.1), ("b", 0.5), ("c", 0.93)):
        single, _ = radix_select(ds, "v", q=q)
        assert multi[name] == single, name


def test_hex_bfs_distance_tiers(ray_session):
    """BFS over an explicit hex blob: known distances; the forced
    distributed tier (local_cells=0) must agree with the single-task
    solver bit-for-bit."""
    import pyarrow as pa
    import ray

    from hexscape_ray.stages.graph import hex_bfs_distance

    # a radius-2 axial disk around (0,0) plus a detached cell
    cells = [(r, q) for r in range(-2, 3) for q in range(-2, 3)
             if abs(r + q) <= 2] + [(10, 10)]
    t = pa.table({
        "r": pa.array([c[0] for c in cells], pa.int64()),
        "q": pa.array([c[1] for c in cells], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = hex_bfs_distance(ds, (0, 0)).to_pandas()
    # the detached cell is unreachable; the disk is fully reachable
    assert len(out) == len(cells) - 1
    got = {(int(a), int(b)): int(d) for a, b, d in out.itertuples(index=False)}
    # hex distance = (|q| + |r| + |q+r|) / 2 within the disk
    for (r, q), d in got.items():
        assert d == (abs(q) + abs(r) + abs(q + r)) // 2
    far = hex_bfs_distance(ray.data.from_arrow(t), (0, 0), local_cells=0).to_pandas()
    assert out.reset_index(drop=True).equals(far.reset_index(drop=True))
    # unoccupied seed → empty result on both tiers
    assert hex_bfs_distance(ds, (99, 99)).count() == 0
    assert hex_bfs_distance(ds, (99, 99), local_cells=0).count() == 0


def test_hll_distinct_accuracy(ray_session):
    """HLL estimate within ~3 sigma (1.04/sqrt(256) ~ 6.5%) of the exact
    distinct count, and invariant to input partitioning (register MAX
    is mergeable)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from hexscape_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(7)
    members = rng.integers(0, 5000, size=20000, dtype=np.int64)
    t = pa.table({
        "k": pa.array(["a"] * 20000),
        "m": pa.array(members),
    })
    exact = len(np.unique(members))
    one = hll_distinct(ray.data.from_arrow(t), "k", "m").to_pandas()
    est = one["est_micro"].iloc[0] / 1e6
    assert abs(est - exact) / exact < 0.20  # 3 sigma at p=8
    many = hll_distinct(
        ray.data.from_arrow(t).repartition(13), "k", "m"
    ).to_pandas()
    assert one.equals(many)


def test_k_peel_tiers(ray_session):
    """k-core peel on a known graph: a 3-clique survives 2-peeling, a
    pendant chain peels inward round by round; forced distributed tier
    (local_threshold=0) agrees bit-for-bit."""
    import pyarrow as pa
    import ray

    from hexscape_ray.stages.graph import k_peel

    # triangle (1,2,3) + chain 3-4-5-6
    e = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    t = pa.table({
        "a": pa.array([x[0] for x in e], pa.int64()),
        "b": pa.array([x[1] for x in e], pa.int64()),
    })
    got = k_peel(ray.data.from_arrow(t), k=2).to_pandas()
    exp = {1: 0, 2: 0, 3: 0, 4: 3, 5: 2, 6: 1}
    assert {int(r.node): int(r.peel_round) for r in got.itertuples()} == exp
    far = k_peel(ray.data.from_arrow(t), k=2, local_threshold=0).to_pandas()
    assert got.reset_index(drop=True).equals(far.reset_index(drop=True))


def test_hll_shard_snapshot_recovery(ray_session):
    """HLL shard kill-and-restore parity: feed half, flush() as the
    snapshot, load() into a FRESH shard, feed the rest — registers
    equal one continuous feed (MAX commutes with any replay split)."""
    import numpy as np
    import ray

    from hexscape_ray.stages.streaming import HllShard
    from hexscape_ray.stages.sketch import hll_partial_batches
    import pyarrow as pa

    rng = np.random.default_rng(3)
    t = pa.table({
        "k": pa.array(["a"] * 4000 + ["b"] * 4000),
        "m": pa.array(rng.integers(0, 1000, size=8000, dtype=np.int64)),
    })
    part = hll_partial_batches("k", "m")
    p1 = part(t.slice(0, 4000))
    p2 = part(t.slice(4000))

    def feed(shard, p):
        ray.get(shard.feed.remote(
            p["__k"].to_pylist(),
            p["bucket"].to_numpy(zero_copy_only=False),
            p["rho"].to_numpy(zero_copy_only=False),
        ))

    cont = HllShard.remote()
    feed(cont, p1); feed(cont, p2)
    full = ray.get(cont.flush.remote())

    first = HllShard.remote()
    feed(first, p1)
    snap = ray.get(first.flush.remote())
    fresh = HllShard.remote()
    ray.get(fresh.load.remote(snap))
    feed(fresh, p2)
    recovered = ray.get(fresh.flush.remote())
    assert full.equals(recovered)


def test_snapshot_diff_all_statuses(ray_session, monkeypatch, tmp_path):
    """snapshot_diff classifies added/removed/changed/unchanged and the
    (us, event_id)-DESC tie rule, identically in both kernel tiers."""
    import pyarrow.parquet as pq

    import hexscape_ray.stages.agg as A
    from hexscape_ray.pipelines.queries import RAY_QUERIES

    day = 86_400_000_000
    # window split: days 0..9 -> mid = 5
    rows = [
        # u1: first half only -> removed
        (1, 1 * day, 10, "view"),
        # u2: second half only -> added
        (2, 8 * day, 11, "buy"),
        # u3: both halves, same latest type -> unchanged
        (3, 2 * day, 12, "view"),
        (3, 7 * day, 13, "view"),
        # u4: both halves, different latest -> changed; the first-half
        # argmax needs the (us, event_id) tie rule: two rows at the
        # same us, higher event_id must win
        (4, 3 * day, 14, "view"),
        (4, 3 * day, 15, "cart"),
        (4, 9 * day, 16, "buy"),
        # span pins: keep min day 0 / max day 9 populated
        (5, 0, 17, "view"),
        (5, 9 * day + 5, 18, "view"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    def run():
        return (
            RAY_QUERIES["snapshot_diff"](str(tmp_path))
            .to_pandas()
            .set_index("status")["n"]
            .to_dict()
        )

    for rows_thresh in (10**9, 0):
        monkeypatch.setattr(A, "SMALL_AGG_ROWS", rows_thresh)
        got = run()
        assert got == {
            "added": 1,
            "removed": 1,
            "unchanged": 2,
            "changed": 1,
        }, (rows_thresh, got)


def test_ams_shard_snapshot_recovery_and_stream_parity(ray_session):
    """AMS shard kill-and-restore parity (ADDITION commutes with any
    replay split) + the streaming accumulation equals the batch
    two-phase counters on the same rows."""
    import ray

    from hexscape_ray.stages.sketch import ams_block_counters
    from hexscape_ray.stages.streaming import AmsShard, streaming_ams_counters

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 5000, size=20_000).astype(np.int64)
    u = keys.view(np.uint64)
    p1 = ams_block_counters(u[:10_000])
    p2 = ams_block_counters(u[10_000:])
    idx = np.arange(16, dtype=np.int64)

    cont = AmsShard.remote()
    ray.get(cont.feed.remote(idx, p1))
    ray.get(cont.feed.remote(idx, p2))
    full = ray.get(cont.flush.remote())

    first = AmsShard.remote()
    ray.get(first.feed.remote(idx, p1))
    snap = ray.get(first.flush.remote())
    fresh = AmsShard.remote()
    ray.get(fresh.load.remote(snap))
    ray.get(fresh.feed.remote(idx, p2))
    assert full.equals(ray.get(fresh.flush.remote()))
    # whole-input parity: streamed counters == one-shot block kernel
    t = pa.table({"u": pa.array(keys)})
    ds = ray.data.from_arrow(t).repartition(7)
    got = streaming_ams_counters(ds, "u")
    assert got == [int(v) for v in ams_block_counters(u)]


def test_setsim_prefix_pairs_random_recall(ray_session):
    """Randomised recall/precision check for the exact-recall
    set-similarity join: on seeded random corpora (skewed Zipf-ish
    vocab so prefix buckets collide), the distributed prefix-filter
    pipeline must return EXACTLY the brute-force J >= 19/20 pair set —
    across all three verify tiers."""
    import itertools

    import ray.data as rd

    from hexscape_ray.stages import joins as joins_mod
    from hexscape_ray.stages.dedup import setsim_prefix_pairs

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        vocab = [f"w{k}" for k in range(24)]
        docs = []
        base = [rng.choice(vocab, size=rng.integers(8, 20), replace=False)
                for _ in range(12)]
        for i in range(40):
            t = list(base[i % len(base)])
            # perturb: drop/add up to 1 token so some pairs straddle tau
            if rng.random() < 0.6 and len(t) > 9:
                t = t[: len(t) - 1]
            if rng.random() < 0.3:
                extra = vocab[int(rng.integers(0, len(vocab)))]
                if extra not in t:
                    t.append(extra)
            docs.append((i, " ".join(t)))
        tbl = pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
            }
        )

        # brute force ground truth over token SETS
        sets = {i: set(t.split()) for i, t in docs}
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 20 * inter >= 19 * union:
                want.add((a, b, inter, union))

        def got_pairs():
            df = setsim_prefix_pairs(rd.from_arrow(tbl)).to_pandas()
            return set(
                zip(
                    df["a"].astype(int),
                    df["b"].astype(int),
                    df["inter_toks"].astype(int),
                    df["union_toks"].astype(int),
                )
            )

        assert got_pairs() == want, f"bitset tier, seed {seed}"
        saved = joins_mod.BROADCAST_ROWS
        joins_mod.BROADCAST_ROWS = 0  # force the incidence verify tier
        try:
            assert got_pairs() == want, f"incidence tier, seed {seed}"
        finally:
            joins_mod.BROADCAST_ROWS = saved


def test_setsim_stream_matches_batch(ray_session):
    """The streaming-ingest twin's flush-time output is identical to
    the batch prefix-filter operator (same token kernel, same
    machinery over the assembled shard state) — including under a
    repartitioned (different arrival order) stream."""
    import ray.data as rd

    from hexscape_ray.stages.dedup import setsim_prefix_pairs
    from hexscape_ray.stages.streaming import streaming_setsim_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{k}" for k in range(20)]
    docs = []
    base = [rng.choice(vocab, size=rng.integers(8, 16), replace=False)
            for _ in range(10)]
    for i in range(60):
        t = list(base[i % len(base)])
        if rng.random() < 0.5 and len(t) > 9:
            t = t[:-1]
        docs.append((i, " ".join(t)))
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    want = (
        setsim_prefix_pairs(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    got = (
        streaming_setsim_pairs(rd.from_arrow(tbl).repartition(7), n_shards=3)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert want.equals(got)
    assert len(want) > 0
