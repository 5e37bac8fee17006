"""Fixture determinism + the byte-identical-text-per-url invariant
(BASELINE.json input_hint) + text function sanity."""

import numpy as np

from hexscape_ray.functions.geocode import geocode_ids, geocode_urls, host_of
from hexscape_ray.functions.text import (
    count_tokens_bpe,
    count_tokens_ws,
    detect_lang,
    extract_text,
    fingerprint,
    quality_score,
    shingles,
    wrap_html,
)
from hexscape_ray.sources import fixtures as fx


def test_pages_deterministic():
    a = fx.gen_pages(n=500)
    b = fx.gen_pages(n=500)
    assert a.equals(b)


def test_extract_text_byte_identical():
    pages = fx.gen_pages(n=300)
    html = pages.column("html").to_pylist()
    text = pages.column("text").to_pylist()
    for h, t in zip(html, text):
        assert extract_text(h) == t


def test_extract_handles_special_chars():
    t = 'a < b & "c" > d\nnew <line>'
    assert extract_text(wrap_html(t)) == t


def test_extract_generic_fallback():
    raw = b"<html><head><script>var x=1;</script><style>p{}</style></head><body><p>hello world</p></body></html>"
    out = extract_text(raw)
    assert "hello world" in out
    assert "var x" not in out  # script content stripped on the fallback path
    plain = extract_text(b"<div>just  text</div>")
    assert "just  text" in plain


def test_langid_accuracy():
    pages = fx.gen_pages(n=400)
    langs = pages.column("lang").to_pylist()
    texts = pages.column("text").to_pylist()
    acc = np.mean([detect_lang(t) == l for t, l in zip(texts, langs)])
    assert acc > 0.85


def test_geocode_host_stability_and_skew():
    urls = ["https://h1.com/a", "https://h1.com/b", "https://h2.com/x"]
    x, y = geocode_urls(urls)
    assert x[0] == x[1] and y[0] == y[1]
    assert (x[0], y[0]) != (x[2], y[2])
    assert host_of("https://a.b.c/d/e") == "a.b.c"
    assert host_of("a.b.c") == "a.b.c"


def test_geocode_ids_in_bbox():
    x, y = geocode_ids(np.arange(10_000))
    assert (x >= 0).all() and (x <= 100_000).all()
    assert (y >= 0).all() and (y <= 100_000).all()


def test_text_metrics():
    t = "the quick brown fox jumps over the lazy dog"
    assert count_tokens_ws(t) == 9
    assert count_tokens_bpe(t) == 9
    assert 0.0 <= quality_score(t) <= 1.0
    assert fingerprint(t) == fingerprint("the  quick brown fox jumps over the lazy  dog".replace("  ", " "))
    assert shingles(t, 3).dtype == np.uint64


def test_landcover_coverage_gap():
    lc = fx.gen_landcover()
    # 40x40 cells at 2500m minus 8 gap cells
    assert lc.num_rows == 1600 - 8


def test_enrich_batch_vectorised_matches_scalar():
    """The Arrow-native enrich path (dictionary-encoded tokens) is
    bit-identical to the scalar per-doc reference on fixture pages AND
    on whitespace edge cases Python str.split() and Arrow
    split_whitespace disagree about (empty tokens)."""
    import pyarrow as pa

    from hexscape_ray.stages.textops import (
        enrich_batch,
        enrich_batch_scalar,
        extract_batch,
    )

    batch = extract_batch(fx.gen_pages(n=2000, seed=11))
    a, b = enrich_batch_scalar(batch), enrich_batch(batch)
    assert a.schema == b.schema
    for col in a.column_names:
        assert a[col].equals(b[col]), col

    edge = pa.table(
        {
            "url": pa.array(["u0", "u1", "u2", "u3", "u4"]),
            "text": pa.array(
                [
                    "",
                    "   ",
                    "  one  two three\tfour ",
                    "the and is to of in with",  # nbsp split + stopwords
                    "short",
                ]
            ),
            "lang": pa.array(["en"] * 5),
        }
    )
    aa, bb = enrich_batch_scalar(edge), enrich_batch(edge)
    for col in aa.column_names:
        assert aa[col].equals(bb[col]), col


def test_doc_quality_exact_matches_scalar(ray_session):
    """q_micro (exact int64 rational, half-up) agrees with the float
    quality_score to 1e-6 on messy text — multi-space, tabs,
    punctuation soup, stopword-free, short and empty-ish docs — and
    the vectorised token/char counts match the scalar features."""
    import ray.data

    from hexscape_ray.functions.text import quality_score, count_tokens_ws
    from hexscape_ray.pipelines.queries import q_doc_quality_exact
    import tempfile, os
    import pyarrow as pa, pyarrow.parquet as pq

    texts = [
        "the cat and the dog sat with a mat for tea",
        "short",
        "x",
        "a  b\tc\nd",          # messy whitespace
        "!!! ??? ... ;;; :::",  # punctuation soup
        "supercalifragilisticexpialidocious " * 20,  # long tokens
        "to in of is that with for was and the " * 30,  # all stopwords
        "no stopwords here just plain nouns verbs maybe",
        "word " * 200,          # >500 chars
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            os.path.join(td, "documents.parquet"),
        )
        got = q_doc_quality_exact(td).to_pandas().sort_values(
            "doc_id", ignore_index=True
        )
    for i, t in enumerate(texts):
        assert abs(got["q_micro"][i] / 1e6 - quality_score(t)) <= 1e-6, (i, t)
        assert got["n_tokens_ws"][i] == count_tokens_ws(t)
        assert got["n_chars"][i] == len(t)


def test_geocode_batch_vectorised_matches_scalar():
    """Arrow-buffer range-FNV geocode is bit-identical to the scalar
    host_of + fnv1a_64 path on adversarial urls (missing scheme, empty,
    multibyte host, nested '://', trailing scheme) and on sliced
    (nonzero-offset) arrays."""
    import pyarrow as pa

    from hexscape_ray.functions.hashing import fnv1a_64_str_array
    from hexscape_ray.stages.encode import geocode_batch

    urls = [
        "https://example.com/path/to/page",
        "http://sub.domain.org/",
        "no-scheme-at-all",
        "no-scheme/but/path",
        "https://hostonly.net",
        "",
        "://weird",
        "a://",
        "https://über.de/pfad",
        "https://x.com/a://b",
        "ftp://tail://",
        ":/",
        "https://",
    ]
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    got = geocode_batch(t)
    x, y = geocode_urls(urls)
    h = fnv1a_64_str_array(urls).astype(np.int64)
    assert (got["x"].to_numpy() == x).all()
    assert (got["y"].to_numpy() == y).all()
    assert (got["url_hash"].to_numpy() == h).all()
    sliced = geocode_batch(t.slice(3, 6))
    assert (sliced["url_hash"].to_numpy() == h[3:9]).all()
    assert (sliced["x"].to_numpy() == x[3:9]).all()


def test_pack_sequences_invariants(ray_session):
    """Packing conserves every chunk exactly once (Σ seq tokens == Σ
    doc tokens, per-doc chunk counts == ceil(len/max_len)), never
    overfills a sequence, splits overlong docs, and the keyed mode is
    invariant to Ray partitioning."""
    import pyarrow as pa
    import ray.data

    from hexscape_ray.stages.textops import pack_sequences

    rng = np.random.default_rng(71)
    max_len = 64
    rows = []
    for i in range(300):
        L = int(rng.integers(1, 200))  # some docs overflow max_len
        rows.append(
            {
                "doc_id": i,
                "lang": ["en", "de", "fr"][i % 3],
                "text": " ".join(["w"] * L),
            }
        )
    want_tokens = {r["doc_id"]: len(r["text"].split(" ")) for r in rows}
    ds = ray.data.from_items(rows).repartition(5)
    got = pack_sequences(ds, max_len=max_len, by="lang").to_pandas()
    assert (got["n_tokens"] <= max_len).all()
    assert got["n_tokens"].sum() == sum(want_tokens.values())
    # per-doc chunk counts
    from collections import Counter

    chunks = Counter()
    for dd in got["doc_ids"]:
        chunks.update(list(dd))
    for d, L in want_tokens.items():
        assert chunks[d] == -(-L // max_len), d
    assert got["seq_uid"].is_unique
    # partition invariance of the keyed mode
    got2 = (
        pack_sequences(ray.data.from_items(rows).repartition(11), max_len=max_len, by="lang")
        .to_pandas()
        .sort_values("seq_uid", ignore_index=True)
    )
    g1 = got.sort_values("seq_uid", ignore_index=True)
    assert (g1["n_tokens"].to_numpy() == got2["n_tokens"].to_numpy()).all()
    assert (g1["n_chunks"].to_numpy() == got2["n_chunks"].to_numpy()).all()
    # block-local streaming mode: same conservation, no shuffle
    got3 = pack_sequences(ds, max_len=max_len).to_pandas()
    assert got3["n_tokens"].sum() == sum(want_tokens.values())
    assert (got3["n_tokens"] <= max_len).all()


def test_api_facade_exports_and_adapters():
    """Every reference-named export binds; the two thin adapters
    (all_nuts_codes, discretise_grid) behave."""
    import hexscape_ray.api as api
    from hexscape_ray.sources.fixtures import gen_admin

    assert not [n for n in api.__all__ if not hasattr(api, n)]
    adm = gen_admin()
    codes = api.all_nuts_codes(adm)
    assert codes == sorted(set(adm.column("code").to_pylist()))
    lvl0 = api.all_nuts_codes(adm, level=0)
    assert all(len(c) <= min(len(x) for x in codes) for c in lvl0) and lvl0
    # read_map invariant: exactly one level-0 row per country
    rm = api.read_map(adm, codes[0][:1])
    assert rm.num_rows > 0
