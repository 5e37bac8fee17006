"""Text analysis functions for the web-page payload (graft M-web +
training-data ops): html→text extraction, language id, quality scores,
token counting, document fingerprinting.

All functions are batch-oriented (list/ndarray in, ndarray out) and use
only compiled regexes + numpy — state (compiled patterns, language
profiles) is built once per actor by the stage classes in
``stages.textops``.
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np

from hexscape_ray.functions.hashing import fnv1a_64

# ---------------------------------------------------------------------------
# extraction — the per-row invariant: byte-identical text per url
# ---------------------------------------------------------------------------

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.S)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic html→text.

    Contract: for documents whose body content lives in an
    ``<article>`` element (all engine-generated corpora), extraction
    returns the article text byte-identically (entities unescaped).
    Generic fallback for other html: drop script/style, strip tags,
    unescape entities, collapse newline whitespace.
    """
    m = _ARTICLE_RE.search(html_bytes)
    if m is not None:
        return _htmllib.unescape(m.group(1).decode("utf-8"))
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    return _WS_RE.sub("\n", s).strip()


def wrap_html(text: str, title: str = "") -> bytes:
    """Inverse used by the fixture generator: the template whose
    extraction is byte-identical."""
    body = _htmllib.escape(text, quote=False)
    return (
        f"<!DOCTYPE html><html><head><title>{_htmllib.escape(title)}</title>"
        f'<script>var x=1;</script><style>p{{margin:0}}</style></head>'
        f"<body><nav>home | about</nav><article>{body}</article>"
        f"<footer>&copy; fixture</footer></body></html>"
    ).encode("utf-8")


# ---------------------------------------------------------------------------
# language id — n-gram/stopword heuristic over ~8 codes
# ---------------------------------------------------------------------------

LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "los", "las", "una", "es", "en", "que", "por", "con", "para"),
    "it": ("il", "di", "che", "non", "per", "una", "sono", "con", "del", "gli"),
    "pt": ("o", "os", "um", "uma", "em", "para", "com", "nao", "por", "mais"),
    "nl": ("de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"),
    "sv": ("och", "att", "det", "som", "en", "ett", "med", "av", "inte", "han"),
}

# ASCII-spelled \w: Python's \w is Unicode while RE2's (the DuckDB
# oracle's engine) is ASCII — the explicit class is the one spelling
# both engines read identically, so lang-id parity survives non-ASCII
# corpora instead of resting on the fixture being pure ASCII (ADVICE
# r4; identical output on ASCII text by construction)
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
# BPE-ish word/punct splitter (GPT-2-style coarse classes, ASCII form)
_BPE_RE = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+")


def lang_scores(tokens: list[str]) -> dict[str, int]:
    out = {}
    toks = set(tokens)
    for lang, words in LANG_PROFILES.items():
        out[lang] = sum(1 for w in words if w in toks)
    return out


def detect_lang(text: str) -> str:
    toks = [t.lower() for t in _TOKEN_RE.findall(text[:2000])]
    counts: dict[str, int] = {}
    for lang, words in LANG_PROFILES.items():
        wset = set(words)
        counts[lang] = sum(1 for t in toks if t in wset)
    best = max(sorted(counts), key=lambda k: counts[k])
    return best if counts[best] > 0 else "und"


# ---------------------------------------------------------------------------
# quality scoring / token counting / fingerprint
# ---------------------------------------------------------------------------

_STOP_EN = set(LANG_PROFILES["en"])
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)


def quality_features(text: str) -> tuple[int, int, int, float, float]:
    """(n_chars, n_tokens, n_punct, stopword_ratio, mean_token_len)."""
    toks = _TOKEN_RE.findall(text)
    n_tok = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    stop = sum(1 for t in toks if t.lower() in _STOP_EN)
    mean_len = (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0
    return len(text), n_tok, n_punct, (stop / n_tok if n_tok else 0.0), mean_len


def quality_score(text: str) -> float:
    """Composite [0,1] quality heuristic: penalise very short docs,
    punctuation soup, and zero-stopword token streams."""
    n_chars, n_tok, n_punct, stop_ratio, mean_len = quality_features(text)
    length_ok = min(n_chars / 500.0, 1.0)
    punct_ok = 1.0 - min(n_punct / max(n_tok, 1), 1.0)
    word_ok = 1.0 if 2.0 <= mean_len <= 12.0 else 0.5
    return round(0.4 * length_ok + 0.3 * punct_ok + 0.2 * word_ok + 0.1 * min(stop_ratio * 5, 1.0), 6)


def count_tokens_ws(text: str) -> int:
    return len(text.split())


def count_tokens_bpe(text: str) -> int:
    return len(_BPE_RE.findall(text))


def fingerprint(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min FNV hash over token
    windows (winnowing-lite) — stable under whitespace changes."""
    toks = text.split()
    if not toks:
        return 0
    if len(toks) <= window:
        return fnv1a_64(" ".join(toks).encode("utf-8"))
    best = None
    for i in range(len(toks) - window + 1):
        h = fnv1a_64(" ".join(toks[i : i + window]).encode("utf-8"))
        if best is None or h < best:
            best = h
    return best


def shingles(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of k-token shingles (MinHash input)."""
    toks = text.lower().split()
    if len(toks) < k:
        return np.array([fnv1a_64(" ".join(toks).encode("utf-8"))], dtype=np.uint64)
    return np.fromiter(
        (fnv1a_64(" ".join(toks[i : i + k]).encode("utf-8")) for i in range(len(toks) - k + 1)),
        dtype=np.uint64,
        count=len(toks) - k + 1,
    )
