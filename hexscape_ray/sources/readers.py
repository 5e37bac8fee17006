"""Parquet IO with GridSpec sidecar metadata (SURVEY §1.3/§4).

The reference guards cached objects with a package-version attribute
(/root/reference/R/load_corine.R:187-195) and carries grid parameters
as class attrs downstream stages require.  Here both travel INSIDE the
Parquet key-value metadata: writers stamp engine version + GridSpec
JSON; readers validate and error on mismatch (cache invalidation) —
no sidecar files to lose.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from hexscape_ray.config import (
    ENGINE_META_KEY,
    ENGINE_VERSION,
    GRIDSPEC_META_KEY,
    GridSpec,
)


def write_table_with_spec(table: pa.Table, path: str, spec: GridSpec) -> None:
    meta = dict(table.schema.metadata or {})
    meta[GRIDSPEC_META_KEY] = spec.to_json().encode()
    meta[ENGINE_META_KEY] = ENGINE_VERSION.encode()
    pq.write_table(table.replace_schema_metadata(meta), path)


class SpecMismatch(ValueError):
    pass


def read_table_with_spec(
    path: str, expect_spec: GridSpec | None = None
) -> tuple[pa.Table, GridSpec]:
    """Read + validate: raises SpecMismatch when the stored GridSpec
    (or engine version) differs from what the caller requires — the
    recompute trigger."""
    t = pq.read_table(path)
    meta = t.schema.metadata or {}
    if GRIDSPEC_META_KEY not in meta:
        raise SpecMismatch(f"{path}: no GridSpec metadata (not an engine table?)")
    spec = GridSpec.from_json(meta[GRIDSPEC_META_KEY].decode())
    if expect_spec is not None and spec.content_hash() != expect_spec.content_hash():
        raise SpecMismatch(
            f"{path}: GridSpec/engine mismatch "
            f"(stored {spec.content_hash()}, expected {expect_spec.content_hash()})"
        )
    return t, spec


def read_pages(path, columns: list[str] | None = None):
    """Column-pruned pages reader (never reads ``html`` unless asked)."""
    import ray.data

    return ray.data.read_parquet(path, columns=columns or ["url", "text", "lang"])


def read_map(admin: pa.Table, country_code: str) -> pa.Table:
    """S2 (/root/reference/R/read_map.R:6-44): subset the admin table
    to one country prefix across all levels, normalised columns.
    Invariant: exactly one level-0 row per country (:41)."""
    import pyarrow.compute as pc

    out = admin.filter(pc.starts_with(admin.column("code"), country_code))
    lvl0 = out.filter(pc.equal(out.column("level"), 0))
    if lvl0.num_rows != 1:
        raise ValueError(
            f"expected exactly one level-0 row for {country_code!r}, got {lvl0.num_rows}"
        )
    return out


def load_map(
    admin: pa.Table, codes: list[str], level: int | None = None
) -> pa.Table:
    """S3 (/root/reference/R/load_map.R:14-73): NUTS-code pattern
    expansion — each requested code selects itself and every
    descendant by prefix; optional level filter; concatenated and
    de-duplicated, original order preserved."""
    import pyarrow.compute as pc

    mask = None
    for code in codes:
        m = pc.starts_with(admin.column("code"), code)
        mask = m if mask is None else pc.or_(mask, m)
    out = admin.filter(mask) if mask is not None else admin.slice(0, 0)
    if level is not None:
        out = out.filter(pc.equal(out.column("level"), level))
    return out


def export_documents_text_formats(sf_dir: str, tmp_root: str = "/tmp/hexray_ingest"):
    """Export the documents table's (doc_id, lang, n_chars) projection
    to sharded JSONL and CSV under a per-SF cache dir (``_SUCCESS``
    marker) — the fixtures for the format-ingest parity queries.  Only
    integer/categorical columns travel, so the text round-trip quirks
    of each format (quote escaping, unicode) never enter the compare;
    the INGEST surface (``ray.data.read_json`` / ``read_csv`` →
    identical downstream pipeline) is what the parity proves.
    """
    import os

    import pyarrow.parquet as _pq

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = os.path.join(tmp_root, tag)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return os.path.join(out, "jsonl"), os.path.join(out, "csv")
    os.makedirs(os.path.join(out, "jsonl"), exist_ok=True)
    os.makedirs(os.path.join(out, "csv"), exist_ok=True)
    t = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    df = t.to_pandas()
    shard_rows = max(1, -(-len(df) // 4))  # 4 shards → parallel read
    for s in range(0, len(df), shard_rows):
        part = df.iloc[s : s + shard_rows]
        part.to_json(
            os.path.join(out, "jsonl", f"part-{s:08d}.jsonl"),
            orient="records",
            lines=True,
        )
        part.to_csv(os.path.join(out, "csv", f"part-{s:08d}.csv"), index=False)
    open(marker, "w").close()
    return os.path.join(out, "jsonl"), os.path.join(out, "csv")
