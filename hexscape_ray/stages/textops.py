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


def enrich_batch(batch: pa.Table) -> pa.Table:
    """The training-data enrichment stage: language id, quality score,
    token counts, n_chars, and a 64-perm MinHash signature column —
    everything downstream dedup/curation consumes, in one pass."""
    global _MINHASHER
    if _MINHASHER is None:
        from hexscape_ray.stages.dedup import MinHasher

        _MINHASHER = MinHasher()
    texts = batch["text"].to_pylist()
    n = len(texts)
    lang_pred = [T.detect_lang(t) for t in texts]
    q = np.fromiter((T.quality_score(t) for t in texts), dtype=np.float64, count=n)
    tws = np.fromiter((T.count_tokens_ws(t) for t in texts), dtype=np.int64, count=n)
    nch = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    sigs = np.stack([_MINHASHER.signature(t) for t in texts]) if n else np.empty((0, 64))
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
