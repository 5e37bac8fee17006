"""Deterministic synthetic fixtures (FIXTURES.md F1–F3).

Everything is seeded — no wall clock, no network — so tile
assignments, aggregates and golden files are reproducible across runs
and parallelism levels.

- F1 ``pages``: Common-Crawl-style table per BASELINE.json input_hint
  (url, warc_ts, html, text, lang) with Zipf host skew (hot hosts →
  hot hex cells) and a controlled fraction of exact/near duplicates.
- F2 ``boundaries``: hierarchical admin partition of a 100 km square
  landscape (mirrors read_map output,
  /root/reference/R/read_map.R:34-39) + land-cover cells with Zipf
  class skew and a deliberate ~0.5% coverage gap (mirrors reduced
  corine, /root/reference/R/extract_corine.R:112-119,177-205).
- F3 ``points``: 200 seeded points (voronoi / randomise inputs,
  /root/reference/reports/usage.Rmd:227-358).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexscape_ray.config import (
    LANDSCAPE_XMAX,
    LANDSCAPE_XMIN,
    LANDSCAPE_YMAX,
    LANDSCAPE_YMIN,
)
from hexscape_ray.functions.text import LANG_PROFILES, wrap_html
from hexscape_ray.geom.wkb import polygon_to_wkb, multipolygon_to_wkb

SEED = 20250817
EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
WINDOW_US = 30 * 86_400 * 1_000_000  # 30-day WARC window

# per-language filler pools: profile stopwords + language-tagged nouns
_POOLS = {
    lang: list(words) + [f"{lang}word{i}" for i in range(40)]
    for lang, words in LANG_PROFILES.items()
}
_LANGS = sorted(_POOLS)


def _host_pool(n_hosts: int) -> list[str]:
    return [f"host{i:04d}.example.{['com','org','net'][i % 3]}" for i in range(n_hosts)]


def gen_pages(
    n: int = 5000,
    n_hosts: int = 200,
    zipf_alpha: float = 1.1,
    dup_frac: float = 0.02,
    near_dup_frac: float = 0.02,
    seed: int = SEED,
) -> pa.Table:
    """The F1 pages table as one Arrow table (callers shard as needed)."""
    rng = np.random.default_rng(seed)
    hosts = _host_pool(n_hosts)

    # Zipf(α) host draw with a finite pool (normalised power-law pmf)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    pmf = ranks**-zipf_alpha
    pmf /= pmf.sum()
    host_idx = rng.choice(n_hosts, size=n, p=pmf)

    # host-correlated language: each host has a dominant language with
    # 80% adherence so per-hex lang mix is non-trivial
    host_lang = rng.integers(0, len(_LANGS), size=n_hosts)
    use_dom = rng.random(n) < 0.8
    lang_idx = np.where(use_dom, host_lang[host_idx], rng.integers(0, len(_LANGS), size=n))

    n_toks = np.maximum(5, rng.lognormal(mean=4.0, sigma=0.6, size=n).astype(np.int64))

    urls, texts, langs = [], [], []
    for i in range(n):
        lang = _LANGS[int(lang_idx[i])]
        pool = _POOLS[lang]
        toks = rng.choice(len(pool), size=int(n_toks[i]))
        texts.append(" ".join(pool[t] for t in toks))
        langs.append(lang)
        urls.append(f"https://{hosts[int(host_idx[i])]}/p/{seed % 997}/{i:07d}.html")

    # exact duplicates: same text under a different url
    n_dup = int(n * dup_frac)
    if n_dup:
        src = rng.integers(0, n - n_dup, size=n_dup)
        for j, s in enumerate(src):
            texts[n - n_dup + j] = texts[int(s)]
    # near duplicates: one token appended
    n_near = int(n * near_dup_frac)
    if n_near:
        src = rng.integers(0, n - n_dup - n_near, size=n_near)
        for j, s in enumerate(src):
            texts[n - n_dup - n_near + j] = texts[int(s)] + " extra"

    ts = EPOCH_US + rng.integers(0, WINDOW_US, size=n)
    html = [wrap_html(t, title=u) for t, u in zip(texts, urls)]

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _rect(x0, y0, x1, y1) -> np.ndarray:
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)


def gen_admin() -> pa.Table:
    """3-level admin hierarchy: country → 4 regions → 16 subregions.

    Subregion ``A21`` is stored as a 2-part MultiPolygon (east/west
    halves) to exercise the multipart path
    (/root/reference/R/generate_patches.R:148-185).
    """
    W = LANDSCAPE_XMAX - LANDSCAPE_XMIN
    H = LANDSCAPE_YMAX - LANDSCAPE_YMIN
    rows = []
    rows.append(("A", 0, "country", polygon_to_wkb([_rect(0, 0, W, H)])))
    for i in range(2):
        for j in range(2):
            code = f"A{i * 2 + j}"
            rows.append(
                (
                    code,
                    1,
                    f"region {code}",
                    polygon_to_wkb(
                        [_rect(i * W / 2, j * H / 2, (i + 1) * W / 2, (j + 1) * H / 2)]
                    ),
                )
            )
    for i in range(4):
        for j in range(4):
            code = f"A{(i // 2) * 2 + (j // 2)}{(i % 2) * 2 + (j % 2)}"
            x0, y0 = i * W / 4, j * H / 4
            x1, y1 = (i + 1) * W / 4, (j + 1) * H / 4
            if code == "A21" and i == 2 and j == 1:
                wkb = multipolygon_to_wkb(
                    [
                        [_rect(x0, y0, (x0 + x1) / 2, y1)],
                        [_rect((x0 + x1) / 2, y0, x1, y1)],
                    ]
                )
            else:
                wkb = polygon_to_wkb([_rect(x0, y0, x1, y1)])
            rows.append((code, 2, f"subregion {code}", wkb))
    codes, levels, labels, wkbs = zip(*rows)
    return pa.table(
        {
            "code": pa.array(codes, type=pa.string()),
            "level": pa.array(levels, type=pa.int32()),
            "label": pa.array(labels, type=pa.string()),
            "wkb": pa.array(wkbs, type=pa.binary()),
        }
    )


LANDCOVER_CLASSES = [
    ("112", "Passable"),   # urban fabric  (hot class — Zipf head)
    ("211", "Passable"),
    ("231", "Low"),
    ("243", "Low"),
    ("311", "Medium"),
    ("312", "Medium"),
    ("313", "High"),
    ("321", "High"),
    ("411", "Impassable"),
    ("511", "Impassable"),
    ("512", "Impassable"),
    ("999", "Passable"),
]


def landcover_cells(
    cell: float = 2500.0, gap_cells: int = 8, seed: int = SEED
) -> list[tuple[str, str, int, int]]:
    """The deterministic (clc, category, i, j) cell grid behind
    :func:`gen_landcover` — the SINGLE source of the class draw and
    gap set, exposed so oracle SQL can embed the exact fixture (the
    group_union oracle mirrors union/components over these cells)."""
    rng = np.random.default_rng(seed + 1)
    nx = int((LANDSCAPE_XMAX - LANDSCAPE_XMIN) / cell)
    ny = int((LANDSCAPE_YMAX - LANDSCAPE_YMIN) / cell)
    ranks = np.arange(1, len(LANDCOVER_CLASSES) + 1, dtype=np.float64)
    pmf = ranks**-1.2
    pmf /= pmf.sum()
    cls = rng.choice(len(LANDCOVER_CLASSES), size=nx * ny, p=pmf)
    gaps = set(rng.choice(nx * ny, size=gap_cells, replace=False).tolist())
    out = []
    for idx in range(nx * ny):
        if idx in gaps:
            continue
        i, j = idx % nx, idx // nx
        code, cat = LANDCOVER_CLASSES[int(cls[idx])]
        out.append((code, cat, i, j))
    return out


def gen_landcover(cell: float = 2500.0, gap_cells: int = 8, seed: int = SEED) -> pa.Table:
    """Land-cover cells over the landscape; class drawn Zipf-skewed;
    ``gap_cells`` cells deliberately omitted (coverage-gap operator)."""
    clcs, cats, wkbs = [], [], []
    for code, cat, i, j in landcover_cells(cell, gap_cells, seed):
        clcs.append(code)
        cats.append(cat)
        wkbs.append(
            polygon_to_wkb(
                [
                    _rect(
                        LANDSCAPE_XMIN + i * cell,
                        LANDSCAPE_YMIN + j * cell,
                        LANDSCAPE_XMIN + (i + 1) * cell,
                        LANDSCAPE_YMIN + (j + 1) * cell,
                    )
                ]
            )
        )
    return pa.table(
        {
            "clc": pa.array(clcs, type=pa.string()),
            "category": pa.array(cats, type=pa.string()),
            "wkb": pa.array(wkbs, type=pa.binary()),
        }
    )


def gen_clc_codes() -> pa.Table:
    """12-row lookup mirroring data/clc_codes.rda (/root/reference/R/data.R:33-47)."""
    rows = [
        (code, f"L1-{code[0]}", f"L2-{code[:2]}", f"L3-{code}", f"#{int(code):06x}")
        for code, _ in LANDCOVER_CLASSES
    ]
    clc, l1, l2, l3, col = zip(*rows)
    return pa.table(
        {
            "clc": pa.array(clc),
            "label1": pa.array(l1),
            "label2": pa.array(l2),
            "label3": pa.array(l3),
            "color": pa.array(col),
        }
    )


def gen_points(n: int = 200, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed + 2)
    x = LANDSCAPE_XMIN + rng.random(n) * (LANDSCAPE_XMAX - LANDSCAPE_XMIN)
    y = LANDSCAPE_YMIN + rng.random(n) * (LANDSCAPE_YMAX - LANDSCAPE_YMIN)
    return pa.table(
        {
            "idx": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )


def write_fixtures(out_dir: str, n_pages: int = 5000, seed: int = SEED) -> dict:
    """Persist all fixtures as Parquet under ``out_dir``; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in {
        "pages": gen_pages(n=n_pages, seed=seed),
        "admin": gen_admin(),
        "landcover": gen_landcover(seed=seed),
        "clc_codes": gen_clc_codes(),
        "points": gen_points(seed=seed),
    }.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
