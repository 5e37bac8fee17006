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


def enrich_batch(batch: pa.Table) -> pa.Table:
    """The training-data enrichment stage: language id, quality score,
    token counts, n_chars, and a 64-perm MinHash signature column —
    everything downstream dedup/curation consumes.  Tokenises each doc
    ONCE and feeds all kernels from the shared token list (the hot
    path: avoid re-running regex/split per kernel)."""
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
    sigs = _MINHASHER.signatures_batch(toks_all) if n else np.empty((0, 64))
    batch = batch.drop_columns(["text"])
    return (
        batch.append_column("lang_pred", pa.array(lang_pred, type=pa.string()))
        .append_column("q_score", pa.array(q))
        .append_column("n_tokens_ws", pa.array(tws))
        .append_column("n_chars", pa.array(nch))
        .append_column(
            "minhash_sig",
            pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.astype(np.int64).ravel()), 64
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
