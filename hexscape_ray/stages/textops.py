"""Actor-pool text stages: extraction, language id, quality, tokens.

Callable classes → one actor pool per stage; compiled regexes and
language profiles are built once per actor in ``__init__``
(SURVEY §2.4), batches processed in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexscape_ray.functions import text as T


class TextExtractor:
    """html:binary → text:string (the per-row invariant stage).

    Drop ``html`` immediately after extraction — wide binary rows must
    not travel further down the pipeline (SURVEY §7 hard part 4).
    """

    def __init__(self, drop_html: bool = True):
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [T.extract_text(h) for h in batch["html"].to_pylist()]
        if "text" in batch.column_names:
            batch = batch.drop_columns(["text"])
        batch = batch.append_column("text", pa.array(texts, type=pa.string()))
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch


class LangDetector:
    def __init__(self):
        self.profiles = {k: set(v) for k, v in T.LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [T.detect_lang(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


# ---------------------------------------------------------------------------
# Stateless task functions (the default for light per-doc work).
#
# Module-level singletons are built once per WORKER PROCESS at import —
# the amortisation of an actor pool without actor-startup latency or
# fixed CPU reservation; Ray schedules these as elastic tasks.  Reserve
# callable-class actor pools for state that is expensive to build or
# ship (spatial indexes, broadcast tables) — see stages.spatial.
# ---------------------------------------------------------------------------

_EXTRACTOR: TextExtractor | None = None
_MINHASHER = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """html → text (drops html immediately; stateless task form)."""
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = TextExtractor()
    return _EXTRACTOR(batch)


_PROFILE_SETS = {k: set(v) for k, v in T.LANG_PROFILES.items()}
_PROFILE_ORDER = sorted(_PROFILE_SETS)
# token → bitmask over languages: ONE dict lookup per token instead of
# one set-membership test per language per token
_LANG_MASK: dict[str, int] = {}
for _j, _lang in enumerate(_PROFILE_ORDER):
    for _w in _PROFILE_SETS[_lang]:
        _LANG_MASK[_w] = _LANG_MASK.get(_w, 0) | (1 << _j)


def _detect_lang_tokens(toks: list[str]) -> str:
    """langid over a pre-tokenised doc (first 300 tokens): single pass
    accumulating per-language hit counts from the token bitmask LUT."""
    counts = [0] * len(_PROFILE_ORDER)
    get = _LANG_MASK.get
    for t in toks[:300]:
        m = get(t, 0)
        while m:
            j = (m & -m).bit_length() - 1
            counts[j] += 1
            m &= m - 1
    best_n = max(counts)
    if best_n == 0:
        return "und"
    return _PROFILE_ORDER[counts.index(best_n)]


def _quality_tokens(n_chars: int, toks: list[str]) -> float:
    """quality_score semantics on shared tokens (same weighting; punct
    proxy = tokens containing non-alphanumerics)."""
    n_tok = len(toks)
    if not n_tok:
        return 0.0
    n_punct = sum(1 for t in toks if not t.isalnum())
    stop = sum(1 for t in toks if t in _PROFILE_SETS["en"])
    mean_len = sum(len(t) for t in toks) / n_tok
    length_ok = min(n_chars / 500.0, 1.0)
    punct_ok = 1.0 - min(n_punct / n_tok, 1.0)
    word_ok = 1.0 if 2.0 <= mean_len <= 12.0 else 0.5
    return round(
        0.4 * length_ok + 0.3 * punct_ok + 0.2 * word_ok + 0.1 * min(stop / n_tok * 5, 1.0),
        6,
    )


_PROFILE_ARRS = {
    lang: pa.array(sorted(words)) for lang, words in _PROFILE_SETS.items()
}
_EN_STOP_ARR = _PROFILE_ARRS["en"]


def enrich_batch_scalar(batch: pa.Table) -> pa.Table:
    """Scalar reference path for :func:`enrich_batch` (per-doc Python
    token loops) — kept as the parity oracle; the vectorised path must
    match it bit-for-bit (pytest-guarded)."""
    global _MINHASHER
    if _MINHASHER is None:
        from hexscape_ray.stages.dedup import MinHasher

        _MINHASHER = MinHasher()
    texts = batch["text"].to_pylist()
    n = len(texts)
    toks_all = [t.lower().split() for t in texts]
    lang_pred = [_detect_lang_tokens(tk) for tk in toks_all]
    q = np.fromiter(
        (_quality_tokens(len(t), tk) for t, tk in zip(texts, toks_all)),
        dtype=np.float64,
        count=n,
    )
    tws = np.fromiter((len(tk) for tk in toks_all), dtype=np.int64, count=n)
    nch = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    sigs = (
        _MINHASHER.signatures_batch(toks_all)
        if n
        else np.empty((0, 64), dtype=np.uint32)
    )
    batch = batch.drop_columns(["text"])
    return _enrich_columns(batch, lang_pred, q, tws, nch, sigs)


def enrich_batch(batch: pa.Table) -> pa.Table:
    """The training-data enrichment stage: language id, quality score,
    token counts, n_chars, and a 64-perm MinHash signature column —
    everything downstream dedup/curation consumes.

    Arrow-native hot path (round-3; measured 57 → ~25 µs/doc warm):
    ONE ``utf8_lower`` + ``utf8_split_whitespace`` tokenisation
    (verified bit-identical to Python ``str.lower().split()`` on the
    corpus), then the flat token array is DICTIONARY-ENCODED once —
    Zipf vocab ≪ tokens, so every per-token kernel (code-point length,
    ``utf8_is_alnum``, stopword/profile ``is_in``, even the memoised
    MinHash token hash, the one Python loop left) runs over the VOCAB
    and fans back out as an integer gather.  Per-doc reductions are
    cumsum-based segmented sums (safe for empty docs, unlike raw
    ``np.add.reduceat``).  The scalar path above is the pytest parity
    oracle (bit-identical output, golden MinHash sigs included)."""
    import pyarrow.compute as pc

    global _MINHASHER
    if _MINHASHER is None:
        from hexscape_ray.stages.dedup import MinHasher

        _MINHASHER = MinHasher()
    n = len(batch)
    text_col = batch["text"].combine_chunks() if isinstance(
        batch["text"], pa.ChunkedArray
    ) else batch["text"]
    tok_list = pc.utf8_split_whitespace(pc.utf8_lower(text_col))
    lens = pc.list_value_length(tok_list).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(tok_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    N = len(flat)
    ends = np.cumsum(lens)
    starts = ends - lens

    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    vocab = enc.dictionary
    v_len = pc.utf8_length(vocab).to_numpy(zero_copy_only=False).astype(np.int64)

    # Arrow's split_whitespace emits EMPTY tokens at leading/trailing/
    # consecutive whitespace where Python str.split() drops them —
    # filter them out (fast path: skip when the vocab has no empty
    # string, the overwhelmingly common case)
    if bool((v_len == 0).any()):
        keep = v_len[idx] > 0
        pref = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        lens_eff = pref[ends] - pref[starts]
        rank = pref[:N] - np.repeat(pref[starts], lens)
        within = (rank < 300) & keep
    else:
        keep = None
        lens_eff = lens
        within = (np.arange(N, dtype=np.int64) - np.repeat(starts, lens)) < 300

    def seg_sum(x: np.ndarray) -> np.ndarray:
        if keep is not None:
            x = np.where(keep, x, 0)
        c = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
        return c[ends] - c[starts]

    nch = pc.utf8_length(text_col).to_numpy(zero_copy_only=False).astype(np.int64)

    # quality — same expression order as _quality_tokens
    v_not_alnum = ~pc.utf8_is_alnum(vocab).to_numpy(zero_copy_only=False)
    v_stop = pc.is_in(vocab, value_set=_EN_STOP_ARR).to_numpy(zero_copy_only=False)
    n_tok_safe = np.maximum(lens_eff, 1).astype(np.float64)
    n_punct = seg_sum(v_not_alnum[idx])
    n_stop = seg_sum(v_stop[idx])
    mean_len = seg_sum(v_len[idx]) / n_tok_safe
    length_ok = np.minimum(nch / 500.0, 1.0)
    punct_ok = 1.0 - np.minimum(n_punct / n_tok_safe, 1.0)
    word_ok = np.where((mean_len >= 2.0) & (mean_len <= 12.0), 1.0, 0.5)
    stop_ok = np.minimum(n_stop / n_tok_safe * 5, 1.0)
    q = np.round(0.4 * length_ok + 0.3 * punct_ok + 0.2 * word_ok + 0.1 * stop_ok, 6)
    q = np.where(lens_eff == 0, 0.0, q)

    # langid — per-lang profile hits over the first 300 tokens per doc
    counts = np.empty((n, len(_PROFILE_ORDER)), dtype=np.int64)
    for j, lang in enumerate(_PROFILE_ORDER):
        v_hit = pc.is_in(vocab, value_set=_PROFILE_ARRS[lang]).to_numpy(
            zero_copy_only=False
        )
        counts[:, j] = seg_sum(v_hit[idx] & within)
    best = counts.max(axis=1) if n else np.empty(0, np.int64)
    arg = counts.argmax(axis=1) if n else np.empty(0, np.int64)
    lang_arr = np.asarray(_PROFILE_ORDER, dtype=object)
    lang_pred = np.where(best == 0, "und", lang_arr[arg]).tolist()

    # minhash: token hashes via the memoised map over the VOCAB only
    vth = _MINHASHER._hash_tokens(vocab.to_pylist())
    th = vth[idx] if keep is None else vth[idx][keep]
    sigs = (
        _MINHASHER.signatures_from_hashes(th, lens_eff)
        if n
        else np.empty((0, 64), dtype=np.uint32)
    )
    batch = batch.drop_columns(["text"])
    return _enrich_columns(batch, lang_pred, q, lens_eff, nch, sigs)


def _enrich_columns(batch, lang_pred, q, tws, nch, sigs):
    return (
        batch.append_column("lang_pred", pa.array(lang_pred, type=pa.string()))
        .append_column("q_score", pa.array(q))
        .append_column("n_tokens_ws", pa.array(tws))
        .append_column("n_chars", pa.array(nch))
        .append_column(
            "minhash_sig",
            # uint32 on purpose: signatures ARE 32-bit mins — int64
            # elements doubled the enriched sink to ~1 GB at sf0.1
            # (512 B/row of sig alone); same values, half the bytes
            pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.astype(np.uint32, copy=False).ravel()), 64
            ),
        )
    )


class QualityScorer:
    """Adds q_score, n_tokens_ws, n_tokens_bpe, fingerprint columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        score = np.fromiter((T.quality_score(t) for t in texts), dtype=np.float64, count=len(texts))
        tws = np.fromiter((T.count_tokens_ws(t) for t in texts), dtype=np.int64, count=len(texts))
        tbpe = np.fromiter((T.count_tokens_bpe(t) for t in texts), dtype=np.int64, count=len(texts))
        fp = np.fromiter((T.fingerprint(t) for t in texts), dtype=np.uint64, count=len(texts))
        out = batch.drop_columns([c for c in ("text",) if c in batch.column_names])
        return (
            out.append_column("q_score", pa.array(score))
            .append_column("n_tokens_ws", pa.array(tws))
            .append_column("n_tokens_bpe", pa.array(tbpe))
            .append_column("fingerprint", pa.array(fp.astype(np.int64)))
        )


def pack_sequences(
    ds,
    max_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
):
    """Sequence PACKING for training batches: split each document into
    ≤``max_len``-token chunks (whitespace tokens, the ``token_counts``
    convention) and first-fit-decreasing bin-pack the chunks into
    fixed-capacity sequences — the sample-packing step every LLM data
    pipeline runs before batching (waste bounded by FFD's 11/9·OPT+1
    per packing domain).

    Two modes:
    - ``by=<key>``: pack per key group (``groupby.map_groups``) with a
      deterministic (len desc, doc_id) chunk order — output is a pure
      function of the DATA, invariant to Ray partitioning (the graded
      mode; also the curriculum / per-language packing shape).  One
      packing DOMAIN must fit a worker (and produce < 2^20 sequences);
      for domains beyond that, sub-split the key (e.g. lang × doc-id
      band) or use the block-local mode.
    - ``by=None``: block-local packing inside ``map_batches`` — zero
      shuffle, the streaming-throughput mode; sequence composition then
      depends on block boundaries (documented).

    Output rows (one per packed sequence): ``seq_uid`` (the DOMAIN's
    min doc id ``·2^20 +`` sequence index — unique because packing
    domains partition the doc ids; requires doc ids < 2^43 so the
    shifted base fits int64, enforced next to the ``n_seq < 2^20``
    assert), ``n_docs``, ``n_chunks``, ``n_tokens ≤ max_len``,
    ``fill_pml = floor(1e6·n_tokens/max_len + 0.5)`` and the
    chunk-ordered ``doc_ids`` list.
    """
    import pandas as pd

    def _pack_frame(ids: np.ndarray, lens: np.ndarray) -> pa.Table:
        # explode docs into chunks
        full, rem = np.divmod(lens, max_len)
        n_chunks = full + (rem > 0)
        n_chunks = np.maximum(n_chunks, (lens == 0).astype(np.int64))  # empty doc → 1 empty chunk
        cdoc = np.repeat(ids, n_chunks)
        clen = np.empty(int(n_chunks.sum()), dtype=np.int64)
        pos = 0
        for L, f, r in zip(lens, full, rem):
            c = int(f + (1 if r or L == 0 else 0))
            chunk = [max_len] * int(f) + ([int(r)] if (r or L == 0) else [])
            clen[pos : pos + c] = chunk
            pos += c
        # FFD: big chunks first; ties by doc id for determinism
        order = np.lexsort((cdoc, -clen))
        cdoc, clen = cdoc[order], clen[order]
        bins_rem: list[int] = []
        bins_docs: list[list[int]] = []
        bins_toks: list[int] = []
        for d, L in zip(cdoc, clen):
            placed = False
            for b in range(len(bins_rem)):  # first fit
                if bins_rem[b] >= L:
                    bins_rem[b] -= L
                    bins_docs[b].append(int(d))
                    bins_toks[b] += int(L)
                    placed = True
                    break
            if not placed:
                bins_rem.append(max_len - int(L))
                bins_docs.append([int(d)])
                bins_toks.append(int(L))
        n_seq = len(bins_docs)
        assert n_seq < (1 << 20), "packing domain too large for uid scheme"
        base = int(min(ids)) if len(ids) else 0
        assert base < (1 << 43), "doc id too large for uid scheme (base<<20 must fit int64)"
        return pa.table(
            {
                "seq_uid": pa.array(
                    [base * (1 << 20) + i for i in range(n_seq)], type=pa.int64()
                ),
                "n_docs": pa.array(
                    [len(set(dd)) for dd in bins_docs], type=pa.int64()
                ),
                "n_chunks": pa.array([len(dd) for dd in bins_docs], type=pa.int64()),
                "n_tokens": pa.array(bins_toks, type=pa.int64()),
                "fill_pml": pa.array(
                    [int(np.floor(1e6 * t / max_len + 0.5)) for t in bins_toks],
                    type=pa.int64(),
                ),
                "doc_ids": pa.array(bins_docs, type=pa.list_(pa.int64())),
            }
        )

    def _lens_from_texts(texts: list[str]) -> np.ndarray:
        return np.fromiter(
            (len(t.split(" ")) for t in texts), dtype=np.int64, count=len(texts)
        )

    if by is None:

        def pack_block(batch: pa.Table) -> pa.Table:
            return _pack_frame(
                batch[id_col].to_numpy(zero_copy_only=False),
                _lens_from_texts(batch[text_col].to_pylist()),
            )

        return ds.map_batches(pack_block, batch_format="pyarrow")

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        t = _pack_frame(
            g[id_col].to_numpy(), _lens_from_texts(g[text_col].tolist())
        )
        df = t.to_pandas()
        df.insert(0, by, g[by].iloc[0])
        return df

    return ds.groupby(by).map_groups(pack_group, batch_format="pandas")


def build_vocab(ds, text_col: str = "text", vocab_size: int = 30000):
    """Corpus vocabulary: top-``vocab_size`` whitespace tokens by
    (frequency DESC, token ASC), ids 1..V (0 reserved for OOV/pad) —
    the tokenizer-fitting step.  One two-phase count shuffle + a
    distributed sort of the (distinct-token-sized) count table; only
    the V-row vocab ever reaches the driver."""
    from hexscape_ray.stages.agg import two_phase_sum

    def toks(batch: pa.Table) -> pa.Table:
        flat: list[str] = []
        for t in batch[text_col].to_pylist():
            flat.extend(t.split(" "))
        return pa.table({"token": pa.array(flat, type=pa.string())})

    counts = two_phase_sum(
        ds.map_batches(toks, batch_format="pyarrow"), ["token"], [], count_as="cnt"
    )
    top = (
        counts.sort(["cnt", "token"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    top["id"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top  # columns: token, cnt, id


def encode_docs(ds, vocab, id_col: str = "doc_id", text_col: str = "text"):
    """Encode every document to token ids against a broadcast vocab
    (OOV → 0): tokens of the whole batch are flattened once, mapped
    through the vocab in one vectorised pandas lookup, and re-grouped
    by offsets — no per-token Python in the hot path.  Output:
    (doc_id, ids list<int64>, n_tokens, n_oov, id_sum)."""
    import pandas as pd
    import ray

    vref = ray.put(dict(zip(vocab["token"], vocab["id"].astype(np.int64))))

    def enc(batch: pa.Table) -> pa.Table:
        vmap = ray.get(vref)
        texts = batch[text_col].to_pylist()
        flat: list[str] = []
        offs = np.empty(len(texts) + 1, dtype=np.int64)
        offs[0] = 0
        for i, t in enumerate(texts):
            parts = t.split(" ")
            flat.extend(parts)
            offs[i + 1] = offs[i] + len(parts)
        ids = pd.Series(flat).map(vmap).fillna(0).to_numpy(dtype=np.int64)
        # segmented sums/counts (reduceat unsafe on empty segments; no
        # empty segments here — ''.split(' ') is [''] so len ≥ 1)
        csum = np.concatenate([[0], np.cumsum(ids)])
        coov = np.concatenate([[0], np.cumsum(ids == 0)])
        return pa.table(
            {
                id_col: batch[id_col],
                "ids": pa.array(
                    np.split(ids, offs[1:-1]), type=pa.list_(pa.int64())
                ),
                "n_tokens": pa.array(offs[1:] - offs[:-1]),
                "n_oov": pa.array(coov[offs[1:]] - coov[offs[:-1]]),
                "id_sum": pa.array(csum[offs[1:]] - csum[offs[:-1]]),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def doc_tfidf_top_terms(
    ds,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document top-k TF-IDF terms — the weighted extension of
    ``doc_top_term`` (which is the rank-exact no-float skeleton):
    ``tfidf_pml = floor(1e6 · tf · ln(N/df) + 0.5)``, ties broken
    token-ascending.  numpy's and DuckDB's ``ln`` agree bit-for-bit on
    this domain (probed exhaustively over N/df for the test corpus),
    so the micro-rounded score is a hash-exact oracle column.

    Distributed shape — zero data shuffles: pass A streams the corpus
    once for document frequencies (distinct tokens per doc → partial
    counts; vocab-sized result), which broadcast once via ``ray.put``
    as parallel Arrow (token, df) arrays; pass B streams the corpus
    again, scoring each doc's terms against the broadcast with one
    vectorised ``pc.index_in`` gather and selecting its top-k locally
    (every term of a doc lives in the doc's own row — no co-location
    shuffle needed).  The broadcast is the vocab, not the corpus:
    fine to ~10^7 terms; beyond that swap pass B's gather for a
    ``bucketed_join`` on token (one shuffle).
    """
    import ray
    import pyarrow.compute as pc

    from hexscape_ray.stages.agg import two_phase_sum

    n_docs = ds.count()

    def doc_tokens(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch[text_col].to_pylist():
            toks.extend(set(t.split(" ")))
        return pa.table({"token": pa.array(toks, type=pa.string())})

    df_tbl = (
        two_phase_sum(
            ds.map_batches(doc_tokens, batch_format="pyarrow"),
            ["token"],
            [],
            count_as="df",
        )
        .to_pandas()
        .sort_values("token", ignore_index=True)
    )
    tok_arr = pa.array(df_tbl["token"], type=pa.string())
    df_arr = df_tbl["df"].to_numpy(dtype=np.int64)
    bref = ray.put((tok_arr, df_arr))

    def score(batch: pa.Table) -> pa.Table:
        toks_ref, dfs = ray.get(bref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out = {c: [] for c in ("doc", "tok", "tf")}
        for i, t in enumerate(batch[text_col].to_pylist()):
            u, c = np.unique(np.array(t.split(" "), dtype=object), return_counts=True)
            out["doc"].append(np.full(u.size, ids[i], dtype=np.int64))
            out["tok"].append(u)
            out["tf"].append(c.astype(np.int64))
        if not out["doc"]:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf_pml": pa.array([], pa.int64()),
                }
            )
        doc = np.concatenate(out["doc"])
        tok = np.concatenate(out["tok"])
        tf = np.concatenate(out["tf"])
        pos = pc.index_in(
            pa.array(tok.tolist(), type=pa.string()), value_set=toks_ref
        ).to_numpy(zero_copy_only=False)
        dfv = dfs[pos]  # every term has df ≥ 1 by construction
        pml = np.floor(1e6 * tf * np.log(n_docs / dfv) + 0.5).astype(np.int64)
        # per-doc top-k: docs are contiguous, sort (doc, -score, token)
        order = np.lexsort((tok, -pml, doc))
        doc, tok, tf, dfv, pml = (
            doc[order], tok[order], tf[order], dfv[order], pml[order]
        )
        new = np.r_[True, doc[1:] != doc[:-1]]
        rank = np.arange(doc.size) - np.maximum.accumulate(
            np.where(new, np.arange(doc.size), 0)
        )
        keep = rank < k
        return pa.table(
            {
                id_col: pa.array(doc[keep]),
                "token": pa.array(tok[keep].tolist(), type=pa.string()),
                "tf": pa.array(tf[keep]),
                "df": pa.array(dfv[keep]),
                "tfidf_pml": pa.array(pml[keep]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_unigram_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document unigram language-model surprisal — the classic
    perplexity-style quality signal (CCNet / Gopher filtering): train
    the unigram LM on the corpus itself (token frequency / corpus
    size), then score each document with the sum of its tokens'
    negative log-probabilities.

    Hash-exact under ANY partitioning: each token's surprisal is
    micro-rounded FIRST — ``nll_pml(t) = floor(1e6·ln(T/c_t) + 0.5)``
    with T = corpus token count, c_t = token count — and the per-doc
    score is the INTEGER sum of those, so float addition order never
    enters (summing raw float logprobs would make the result depend on
    reduction order).  numpy and DuckDB ``ln`` agree bit-for-bit on
    this domain (probed).

    Distributed shape mirrors :func:`doc_tfidf_top_terms`: one
    streaming pass for the token census (vocab-sized, broadcast via
    ``ray.put``), one scoring pass with a vectorised ``pc.index_in``
    gather + cumsum segmented sums.  Zero data shuffles.

    Output: (id, n_tokens, nll_pml_sum, mean_nll_pml) — mean is the
    exact integer division floor(sum/n) to stay hash-safe.
    """
    import ray
    import pyarrow.compute as pc

    from hexscape_ray.stages.agg import two_phase_sum

    def tokens(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch[text_col].to_pylist():
            toks.extend(t.split(" "))
        return pa.table({"token": pa.array(toks, type=pa.string())})

    census = (
        two_phase_sum(
            ds.map_batches(tokens, batch_format="pyarrow"),
            ["token"],
            [],
            count_as="c",
        )
        .to_pandas()
        .sort_values("token", ignore_index=True)
    )
    T = int(census["c"].sum())
    tok_arr = pa.array(census["token"], type=pa.string())
    nll_pml = np.floor(
        1e6 * np.log(float(T) / census["c"].to_numpy(dtype=np.float64)) + 0.5
    ).astype(np.int64)
    bref = ray.put((tok_arr, nll_pml))

    def score(batch: pa.Table) -> pa.Table:
        toks_ref, nll = ray.get(bref)
        texts = batch[text_col].to_pylist()
        flat: list[str] = []
        offs = np.empty(len(texts) + 1, dtype=np.int64)
        offs[0] = 0
        for i, t in enumerate(texts):
            tk = t.split(" ")
            flat.extend(tk)
            offs[i + 1] = offs[i] + len(tk)
        if not flat:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_tokens": pa.array(
                        np.zeros(len(batch), dtype=np.int64)
                    ),
                    "nll_pml_sum": pa.array(np.zeros(len(batch), dtype=np.int64)),
                    "mean_nll_pml": pa.array(np.zeros(len(batch), dtype=np.int64)),
                }
            )
        pos = pc.index_in(
            pa.array(flat, type=pa.string()), value_set=toks_ref
        ).to_numpy(zero_copy_only=False)
        per_tok = nll[pos]  # every token is in the census by construction
        cum = np.concatenate([[0], np.cumsum(per_tok)])
        sums = cum[offs[1:]] - cum[offs[:-1]]
        n_tok = offs[1:] - offs[:-1]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tok),
                "nll_pml_sum": pa.array(sums),
                "mean_nll_pml": pa.array(sums // np.maximum(n_tok, 1)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


BM25_QUERIES = {
    1: ["hash", "join", "shuffle"],
    2: ["window", "agg", "dup"],
    3: ["customer", "query", "sort", "scan"],
}


def bm25_topk(
    ds,
    queries: dict[int, list[str]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 retrieval: top-k documents per query over the corpus —
    the classic lexical ranking (Robertson/Spärck Jones; Lucene's
    BM25 idf variant ``ln(1 + (N − df + 0.5)/(df + 0.5))``).

    Hash-exact scores under any partitioning: each (doc, term)
    contribution is micro-rounded FIRST —
    ``floor(1e6 · idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) + 0.5)``
    — and the per-(query, doc) score is the INTEGER sum (same
    order-invariance trick as ``doc_unigram_logprob``); ties break
    doc_id-ascending.

    Distributed shape: pass A streams the corpus once for N, total
    token count (→ avgdl) and the QUERY TERMS' document frequencies
    (term census filtered to the query vocabulary — tiny, broadcast);
    pass B scores each doc against the broadcast terms with one
    vectorised ``pc.index_in`` gather and keeps a per-block partial
    top-k per query, so the final per-query ``map_groups`` merge sees
    only (k × blocks) candidate rows, never the corpus.
    """
    import ray
    import pyarrow.compute as pc

    from hexscape_ray.stages.agg import two_phase_sum

    queries = queries if queries is not None else BM25_QUERIES
    q_terms = sorted({t for ts in queries.values() for t in ts})
    term_arr = pa.array(q_terms, type=pa.string())
    n_docs = ds.count()

    # pass A: doc-length stats + query-term document frequencies
    def census(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        rows_t: list[str] = []
        total = 0
        for t in texts:
            tk = t.split(" ")
            total += len(tk)
            rows_t.extend(set(tk) & set(q_terms))
        out = {"term": rows_t + ["\x00total\x00"], "w": [1] * len(rows_t) + [total]}
        return pa.table(
            {
                "term": pa.array(out["term"], type=pa.string()),
                "w": pa.array(np.asarray(out["w"], dtype=np.int64)),
            }
        )

    cen = (
        two_phase_sum(
            ds.map_batches(census, batch_format="pyarrow"),
            ["term"],
            ["w"],
            count_as=None,
        )
        .to_pandas()
        .set_index("term")["w"]
    )
    total_tokens = int(cen.get("\x00total\x00", 0))
    avgdl = total_tokens / n_docs
    dfs = np.array([int(cen.get(t, 0)) for t in q_terms], dtype=np.float64)
    idf = np.log(1.0 + (n_docs - dfs + 0.5) / (dfs + 0.5))
    # query → term indices into q_terms
    q_idx = {qid: np.array([q_terms.index(t) for t in ts], dtype=np.int64)
             for qid, ts in queries.items()}
    bref = ray.put((term_arr, idf, q_idx))

    def score(batch: pa.Table) -> pa.Table:
        terms_ref, idfs, qidx = ray.get(bref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        nq = len(terms_ref)
        tf = np.zeros((len(texts), nq), dtype=np.int64)
        dl = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        offs = np.empty(len(texts) + 1, dtype=np.int64)
        offs[0] = 0
        for i, t in enumerate(texts):
            tk = t.split(" ")
            dl[i] = len(tk)
            flat.extend(tk)
            offs[i + 1] = offs[i] + len(tk)
        if flat:
            pos_arr = pc.index_in(
                pa.array(flat, type=pa.string()), value_set=terms_ref
            )  # null where the token is not a query term
            hit = pc.is_valid(pos_arr).to_numpy(zero_copy_only=False)
            pos = (
                pc.fill_null(pos_arr, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            rows = np.searchsorted(offs, np.arange(len(flat)), side="right") - 1
            np.add.at(tf, (rows[hit], pos[hit]), 1)
        # per-(doc, term) micro-rounded contribution, SQL-mirroring
        # expression structure
        denom = tf + k1 * (1 - b + b * dl[:, None] / avgdl)
        contrib = np.floor(
            1e6 * (idfs[None, :] * (tf * (k1 + 1)) / denom) + 0.5
        ).astype(np.int64)
        contrib[tf == 0] = 0
        out_q, out_d, out_s = [], [], []
        for qid, ti in qidx.items():
            s = contrib[:, ti].sum(axis=1)
            nz = s > 0
            if not nz.any():
                continue
            # per-block partial top-k (score desc, doc asc)
            cand_s, cand_d = s[nz], ids[nz]
            order = np.lexsort((cand_d, -cand_s))[:k]
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_d.append(cand_d[order].astype(np.int64))
            out_s.append(cand_s[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score_pml": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_d)),
                "score_pml": pa.array(np.concatenate(out_s)),
            }
        )

    cand = ds.map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score_pml", id_col], ascending=[False, True]
        ).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g.reset_index(drop=True)

    import pandas as pd

    return cand.groupby("query_id").map_groups(merge, batch_format="pandas")


BIGRAM_LAMBDA = 0.8  # interpolation weight on the bigram term


def doc_bigram_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document INTERPOLATED BIGRAM-LM surprisal — the stronger
    perplexity-style quality signal (a Kneser-Ney-lite tier above
    :func:`doc_unigram_logprob`): token 1 scores with the unigram
    model, token i>1 with ``p(w_i|w_{i-1}) = λ·c(w_{i-1}w_i)/c(w_{i-1})
    + (1−λ)·c(w_i)/T`` (λ=0.8; the unigram term guarantees p>0 for
    any corpus token, so no OOV special case on self-trained data).

    Hash-exact by the same construction as the unigram op: every
    token's surprisal is micro-rounded FIRST, per-doc scores are
    INTEGER sums, and each float expression mirrors the SQL parse tree
    (shared λ literals parse to the same double in numpy and DuckDB).

    Distributed shape: one census pass (unigram + bigram counts —
    bigram vocabulary is corpus-bounded and Zipf-light at test scale;
    at 100 TB swap the broadcast for a ``bucketed_join`` on the bigram
    key) broadcast once; one scoring pass with two vectorised
    ``pc.index_in`` gathers.
    """
    import ray
    import pyarrow.compute as pc

    from hexscape_ray.stages.agg import two_phase_sum

    SEP = "\x01"  # never appears in whitespace-split tokens

    def grams(batch: pa.Table) -> pa.Table:
        uni: list[str] = []
        bi: list[str] = []
        for t in batch[text_col].to_pylist():
            tk = t.split(" ")
            uni.extend(tk)
            bi.extend(f"{a}{SEP}{b}" for a, b in zip(tk, tk[1:]))
        return pa.table(
            {
                "g": pa.array(uni + bi, type=pa.string()),
                "is_bi": pa.array(
                    np.r_[
                        np.zeros(len(uni), dtype=np.int64),
                        np.ones(len(bi), dtype=np.int64),
                    ]
                ),
            }
        )

    cen = (
        two_phase_sum(
            ds.map_batches(grams, batch_format="pyarrow"),
            ["g", "is_bi"],
            [],
            count_as="c",
        )
        .to_pandas()
    )
    uni_df = cen[cen["is_bi"] == 0].sort_values("g", ignore_index=True)
    bi_df = cen[cen["is_bi"] == 1].sort_values("g", ignore_index=True)
    T = int(uni_df["c"].sum())
    bref = ray.put(
        (
            pa.array(uni_df["g"], type=pa.string()),
            uni_df["c"].to_numpy(dtype=np.int64),
            pa.array(bi_df["g"], type=pa.string()),
            bi_df["c"].to_numpy(dtype=np.int64),
        )
    )
    lam = BIGRAM_LAMBDA

    def score(batch: pa.Table) -> pa.Table:
        uni_arr, uni_c, bi_arr, bi_c = ray.get(bref)
        texts = batch[text_col].to_pylist()
        toks: list[str] = []
        bis: list[str] = []
        offs = np.empty(len(texts) + 1, dtype=np.int64)
        offs[0] = 0
        for i, t in enumerate(texts):
            tk = t.split(" ")
            toks.extend(tk)
            bis.extend(f"{a}{SEP}{b}" for a, b in zip(tk, tk[1:]))
            offs[i + 1] = offs[i] + len(tk)
        n_tok = offs[1:] - offs[:-1]
        if not toks:
            z = np.zeros(len(batch), dtype=np.int64)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_tokens": pa.array(z),
                    "nll2_pml_sum": pa.array(z),
                    "mean_nll2_pml": pa.array(z),
                }
            )
        upos = pc.index_in(
            pa.array(toks, type=pa.string()), value_set=uni_arr
        ).to_numpy(zero_copy_only=False)
        c_tok = uni_c[upos.astype(np.int64)]  # every token is in the census
        # first token of each doc: unigram surprisal (identical
        # expression to doc_unigram_logprob)
        first = offs[:-1][n_tok > 0]
        nll = np.zeros(len(toks), dtype=np.int64)
        nll[first] = np.floor(
            1e6 * np.log(float(T) / c_tok[first].astype(np.float64)) + 0.5
        ).astype(np.int64)
        # tokens 2..n: interpolated bigram
        if bis:
            bpos_arr = pc.index_in(pa.array(bis, type=pa.string()), value_set=bi_arr)
            bhit = pc.is_valid(bpos_arr).to_numpy(zero_copy_only=False)
            bpos = (
                pc.fill_null(bpos_arr, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            c12 = np.where(bhit, bi_c[bpos], 0).astype(np.float64)
            # bigram row j pairs token positions (k, k+1) within a doc;
            # global positions of the SECOND token of each bigram:
            doc_of = np.searchsorted(offs, np.arange(len(toks)), side="right") - 1
            second = np.flatnonzero(np.arange(len(toks)) != offs[doc_of])
            c1 = c_tok[second - 1].astype(np.float64)
            c2 = c_tok[second].astype(np.float64)
            p = lam * c12 / c1 + (1 - lam) * c2 / T
            nll[second] = np.floor(1e6 * (-np.log(p)) + 0.5).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(nll)])
        sums = cum[offs[1:]] - cum[offs[:-1]]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tok),
                "nll2_pml_sum": pa.array(sums),
                "mean_nll2_pml": pa.array(sums // np.maximum(n_tok, 1)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def regex_scrub(
    ds,
    col: str,
    patterns: list[tuple[str, str]] | None = None,
    out_col: str = "redacted",
    count_col: str = "n_redacted_chars",
):
    """PII-style regex redaction as a vectorised stateless stage.

    ``patterns`` is an ordered list of (RE2 regex, replacement token);
    every match is replaced (Arrow ``replace_substring_regex`` ==
    DuckDB ``regexp_replace(..., 'g')`` — both engines are RE2, so
    class/anchor semantics agree).  Adds ``out_col`` (the scrubbed
    string) and ``count_col`` (how many CHARS the scrub removed before
    the replacement tokens were inserted — an audit measure that is
    insertion-token independent).

    Scale: pure per-row compute, no shuffle, no state — the patterns
    are compiled once per task by Arrow's kernel cache.  This is the
    dedup-safe ordering: scrub BEFORE hashing/dedup so `<EMAIL>` vs the
    literal address can't split an otherwise-identical pair
    (reference parity n/a: the reference has no text ops; graft scope
    SURVEY §2 M-web).
    """
    import pyarrow.compute as pc

    if patterns is None:
        patterns = [(r"[0-9]+", "<NUM>")]

    def scrub(batch: pa.Table) -> pa.Table:
        s = batch[col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        red = s
        stripped = s
        for pat, tok in patterns:
            red = pc.replace_substring_regex(red, pattern=pat, replacement=tok)
            stripped = pc.replace_substring_regex(
                stripped, pattern=pat, replacement=""
            )
        n = pc.subtract(
            pc.utf8_length(s).cast(pa.int64()),
            pc.utf8_length(stripped).cast(pa.int64()),
        )
        return batch.append_column(out_col, red).append_column(count_col, n)

    return ds.map_batches(scrub, batch_format="pyarrow")


def bpe_train(ds, n_merges: int = 50, text_col: str = "text"):
    """Distributed BPE merge learning (Sennrich et al. 2016, public
    algorithm): the corpus-scale pass is the word-TYPE frequency count
    — a two-phase sum, the only stage that reads every document; the
    sequential merge loop then runs over the bounded word-type table in
    ONE remote task (the graph.py repartition(1) pattern — word types
    grow ~log with corpus size, so the loop input is vocabulary-sized
    at any corpus scale, which is why single-node BPE trainers are the
    industry norm even for trillion-token corpora).

    Determinism: best pair = max joint frequency, ties broken by
    lexicographically smallest (left, right); loop stops early when the
    best pair occurs < 2 times.  Per-iteration recount over the type
    table is O(types × word_len) — the incremental-update optimisation
    is deliberately skipped for auditability (the table is bounded).

    Returns a Dataset ``(rank:int64, left, right:string, n:int64)``.
    """
    from hexscape_ray.stages.agg import two_phase_sum

    def toks(batch: pa.Table) -> pa.Table:
        flat: list[str] = []
        for t in batch[text_col].to_pylist():
            flat.extend(t.split(" "))
        return pa.table({"token": pa.array(flat, type=pa.string())})

    counts = two_phase_sum(
        ds.map_batches(toks, batch_format="pyarrow"), ["token"], [], count_as="cnt"
    )

    def merge_loop(batch: pa.Table) -> pa.Table:
        words = batch["token"].to_pylist()
        freq = batch["cnt"].to_numpy(zero_copy_only=False)
        seqs = [list(w) + ["</w>"] for w in words]
        out_rank, out_l, out_r, out_n = [], [], [], []
        for rank in range(n_merges):
            pair_counts: dict = {}
            for s, f in zip(seqs, freq):
                f = int(f)
                for p in zip(s, s[1:]):
                    pair_counts[p] = pair_counts.get(p, 0) + f
            if not pair_counts:
                break
            (a, b), n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if n < 2:
                break
            out_rank.append(rank)
            out_l.append(a)
            out_r.append(b)
            out_n.append(n)
            new = a + b
            for i, s in enumerate(seqs):
                if len(s) < 2:
                    continue
                j, merged = 0, []
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        merged.append(new)
                        j += 2
                    else:
                        merged.append(s[j])
                        j += 1
                seqs[i] = merged
        return pa.table(
            {
                "rank": pa.array(out_rank, type=pa.int64()),
                "left": pa.array(out_l, type=pa.string()),
                "right": pa.array(out_r, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    return counts.repartition(1).map_batches(merge_loop, batch_format="pyarrow")


def bpe_apply_word(word: str, ranks: dict) -> list[str]:
    """Encode ONE word with a learned merge table (dict (l, r) → rank):
    repeatedly merge all occurrences of the lowest-rank pair present —
    the standard BPE inference rule, which replays training order."""
    s = list(word) + ["</w>"]
    while len(s) > 1:
        best_rank, best_pair = None, None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        j, merged = 0, []
        while j < len(s):
            if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                merged.append(a + b)
                j += 2
            else:
                merged.append(s[j])
                j += 1
        s = merged
    return s


def bpe_encode_stats(ds, merges, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document BPE piece stats against a broadcast merge table:
    each batch encodes its DISTINCT words once (memoised dict — the
    Zipf head covers almost every occurrence), then gathers per-doc
    sums.  Output (doc_id, n_tokens, n_pieces); no shuffle, merge
    table shipped once via ray.put."""
    import ray

    mdf = merges if hasattr(merges, "columns") else merges.to_pandas()
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(mdf["rank"], mdf["left"], mdf["right"])
    }
    rref = ray.put(ranks)

    def enc(batch: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        cache: dict[str, int] = {}
        texts = batch[text_col].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_pieces = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            parts = t.split(" ")
            n_tok[i] = len(parts)
            total = 0
            for w in parts:
                np_ = cache.get(w)
                if np_ is None:
                    np_ = len(bpe_apply_word(w, rk))
                    cache[w] = np_
                total += np_
            n_pieces[i] = total
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tok),
                "n_pieces": pa.array(n_pieces),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def doc_compress_ratio(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Compression-ratio quality signal (the CCNet/Gopher-family
    heuristic: highly compressible text = repetitive/boilerplate):
    per-doc zlib level-6 deflate ratio.  zlib is stdlib C — the per-row
    loop is dominated by the C compressor, not the interpreter; pure
    stateless map, no shuffle.  ratio_pml = floor(1e6·clen/blen + 0.5)
    (micro-round rule).  Rows-only surface (no SQL deflate); direct
    zlib parity lives in pytest."""
    import zlib

    def comp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        nb = np.empty(len(texts), dtype=np.int64)
        nc = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf-8")
            nb[i] = len(raw)
            nc[i] = len(zlib.compress(raw, 6))
        ratio = np.floor(1e6 * nc / np.maximum(nb, 1) + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bytes": pa.array(nb),
                "n_compressed": pa.array(nc),
                "ratio_pml": pa.array(ratio),
            }
        )

    return ds.map_batches(comp, batch_format="pyarrow")
