"""Hex / spatial queries — one family of the query registry.

Split from the original single-file registry (round-4 verdict #6).
Definitions execute in the ORIGINAL order via a linear import chain:
each module pulls every name (including _helpers) from its predecessor
with a globals() merge, so both import-time and call-time lookups see
exactly what the single file saw.  The registry itself — RAY_QUERIES /
ORACLES and the oracle-first ordering — is pinned in queries.py.
"""

from __future__ import annotations

import hexscape_ray.pipelines.q00_shared as _prev

globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev


# ---------------------------------------------------------------------------
# hex / spatial queries
# ---------------------------------------------------------------------------


def q_hex_doc_counts(sf_dir: str) -> Dataset:
    """Per-hex document counts + exact length sums (flagship A3 core)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = _hex_prepare(ds, "doc_id")
    out = two_phase_sum(ds, ["r", "q"], ["n_chars"], count_as="n_docs")
    return out.rename_columns({"n_chars": "len_sum"})


SQL_HEX_DOC_COUNTS = (
    _hex_cte("documents", "doc_id", "doc_id, n_chars")
    + """
  SELECT r, q, CAST(sum(n_chars) AS BIGINT) AS len_sum,
         count(*) AS n_docs
  FROM hexed GROUP BY r, q
"""
)


HEX_RASTER_G = 32  # grid width shared by q_hex_rasterize AND its oracle


def q_hex_rasterize(sf_dir: str, g: int = HEX_RASTER_G) -> Dataset:
    """VECTOR→RASTER resample (the reverse of habitat's raster→hex,
    completing the north rule's raster↔vector pair): per-hex doc
    counts sampled onto a g×g grid — each raster cell takes the value
    of the hex containing its center (``grid.point_to_axial``, the
    oracle-parity axial math), empty hexes → cell absent.  The per-hex
    table is landscape-bounded → correct small-side broadcast; the
    raster generates distributed (``ray.data.range``), no driver loop.

    The static oracle is generated from ``HEX_RASTER_G`` (same constant
    as the default here, ADVICE r3) — calls with a different ``g`` are
    valid pipelines but compare against no oracle."""
    cdf = (
        q_hex_doc_counts(sf_dir).select_columns(["r", "q", "n_docs"]).to_pandas()
    )
    cmap = {
        (int(r_), int(q_)): int(n_)
        for r_, q_, n_ in zip(cdf["r"], cdf["q"], cdf["n_docs"])
    }
    cref = ray.put(cmap)
    cell = 100000.0 / g

    def enc(batch: pa.Table) -> pa.Table:
        from hexscape_ray import grid as hexgrid

        ids = batch["id"].to_numpy(zero_copy_only=False)
        i = ids // g
        j = ids % g
        x = (i + 0.5) * cell
        y = (j + 0.5) * cell
        r, q = hexgrid.point_to_axial(x, y, SPEC, 0)
        m = ray.get(cref)
        n = np.fromiter(
            (m.get((int(rr), int(qq)), 0) for rr, qq in zip(r, q)),
            dtype=np.int64,
            count=len(ids),
        )
        keep = n > 0
        return pa.table(
            {
                "i": pa.array(i[keep].astype(np.int64)),
                "j": pa.array(j[keep].astype(np.int64)),
                "r": pa.array(r[keep].astype(np.int64)),
                "q": pa.array(q[keep].astype(np.int64)),
                "n_docs": pa.array(n[keep]),
            }
        )

    return ray.data.range(g * g, override_num_blocks=8).map_batches(
        enc, batch_format="pyarrow"
    )


SQL_HEX_RASTERIZE = (
    f"""
WITH counts AS (
  SELECT r, q, count(*) AS n_docs FROM (
    WITH pts AS (SELECT doc_id, {_GEO_SQL.format(key="doc_id")} FROM documents),
    {_AXIAL_SQL}
    SELECT r, q FROM hexed
  ) GROUP BY r, q
),
cells AS (
  SELECT i.range AS i, j.range AS j,
         (i.range + 0.5) * {100000.0 / HEX_RASTER_G!r} AS x,
         (j.range + 0.5) * {100000.0 / HEX_RASTER_G!r} AS y
  FROM range(0, {HEX_RASTER_G}) i, range(0, {HEX_RASTER_G}) j
),
pts AS (SELECT i, j, x, y FROM cells),
"""
    + _AXIAL_SQL
    + """
SELECT CAST(h.i AS BIGINT) AS i, CAST(h.j AS BIGINT) AS j, h.r, h.q, c.n_docs
FROM hexed h JOIN counts c USING (r, q)
"""
)


def q_hex_kring(sf_dir: str, k: int = 2) -> Dataset:
    """k-ring hex-neighbourhood aggregate (the north-star's "kNN
    hex-neighbour query"): for every populated hex, the total docs in
    its axial disk of radius k — pure offset expansion + groupby, no
    spatial join (J3 semantics, grid.grid_disk_axial), then a
    broadcast-membership filter to populated cells only."""
    from hexscape_ray import grid as hexgrid

    counts = q_hex_doc_counts(sf_dir).select_columns(["r", "q", "n_docs"])
    dr, dq = hexgrid.grid_disk_axial(0, 0, k)
    dr, dq = dr[0], dq[0]
    # populated-cell membership: per-hex tables are landscape-bounded,
    # so collecting the keys is a correct small-side broadcast
    keys_df = counts.select_columns(["r", "q"]).to_pandas()
    key_ref = ray.put(set(zip(keys_df["r"].astype(int), keys_df["q"].astype(int))))

    def expand(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        n = batch["n_docs"].to_numpy(zero_copy_only=False)
        m = dr.shape[0]
        return pa.table(
            {
                "r": pa.array(np.repeat(r, m) + np.tile(dr, r.shape[0])),
                "q": pa.array(np.repeat(q, m) + np.tile(dq, r.shape[0])),
                "n_docs": pa.array(np.repeat(n, m)),
            }
        )

    def keep_existing(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        r = batch["r"].to_numpy(zero_copy_only=False)
        q = batch["q"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            ((rr, qq) in keys for rr, qq in zip(r, q)), dtype=bool, count=r.shape[0]
        )
        return batch.filter(pa.array(mask))

    summed = two_phase_sum(
        counts.map_batches(expand, batch_format="pyarrow"),
        ["r", "q"],
        ["n_docs"],
        count_as=None,
    )
    out = summed.map_batches(keep_existing, batch_format="pyarrow")
    return out.rename_columns({"n_docs": "kring_docs"})


SQL_HEX_KRING = (
    _hex_cte("documents", "doc_id", "doc_id")
    + """
  , counts AS (SELECT r, q, count(*) AS n_docs FROM hexed GROUP BY r, q),
  offs AS (
    SELECT t1.dq, t2.dr
    FROM (SELECT range AS dq FROM range(-2, 3)) t1,
         (SELECT range AS dr FROM range(-2, 3)) t2
    WHERE (abs(t1.dq) + abs(t2.dr) + abs(t1.dq + t2.dr)) / 2 <= 2
  ),
  ring AS (
    SELECT c.r + o.dr AS r, c.q + o.dq AS q, c.n_docs
    FROM counts c, offs o
  )
  SELECT ring.r, ring.q, CAST(sum(ring.n_docs) AS BIGINT) AS kring_docs
  FROM ring JOIN counts ex ON ring.r = ex.r AND ring.q = ex.q
  GROUP BY ring.r, ring.q
"""
)


def q_hex_lang_mix(sf_dir: str) -> Dataset:
    """Per-hex language mix: wide counts + proportions (Σ = 1)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    ds = _hex_prepare(ds, "doc_id")
    partials = two_phase_sum(ds, ["r", "q", "lang"], [], count_as="n")

    # vectorised widen (round-3 verdict #9, same coarse-shard +
    # factorize + np.add.at pattern as hexagg.hex_language_mix): all
    # cells of a shard in one pass instead of a pandas DataFrame per
    # (r, q) cell
    def shard(batch: pa.Table) -> pa.Table:
        from hexscape_ray.functions.hashing import splitmix64

        r = np.asarray(batch["r"].to_numpy(zero_copy_only=False), dtype=np.int64)
        qq = np.asarray(batch["q"].to_numpy(zero_copy_only=False), dtype=np.int64)
        with np.errstate(over="ignore"):
            h = splitmix64(splitmix64(r.view(np.uint64)) ^ qq.view(np.uint64))
        return batch.append_column(
            "__coarse", pa.array(np.bitwise_and(h.astype(np.int64), np.int64(63)))
        )

    def widen_block(g: pd.DataFrame) -> pd.DataFrame:
        # negative-safe composite pack: (r+2^30)·2^31 + (q+2^30)
        off = np.int64(1 << 30)
        key = (g["r"].to_numpy(dtype=np.int64) + off) * np.int64(1 << 31) + (
            g["q"].to_numpy(dtype=np.int64) + off
        )
        codes, uniq = pd.factorize(key, sort=True)
        nv = g["n"].to_numpy(dtype=np.int64)
        kk = len(uniq)
        tot = np.zeros(kk, dtype=np.int64)
        np.add.at(tot, codes, nv)
        lang_idx = pd.Categorical(g["lang"], categories=DOC_LANGS).codes
        mat = np.zeros((kk, len(DOC_LANGS)), dtype=np.int64)
        ok = lang_idx >= 0
        np.add.at(mat, (codes[ok], lang_idx[ok]), nv[ok])
        u = np.asarray(uniq)
        out = {
            "r": (u // np.int64(1 << 31) - off).astype(np.int64),
            "q": (u % np.int64(1 << 31) - off).astype(np.int64),
            "n_docs": tot,
        }
        for j, lang in enumerate(DOC_LANGS):
            out[f"n_{lang}"] = mat[:, j]
            out[f"p_{lang}"] = mat[:, j] / tot
        return pd.DataFrame(out)

    return (
        partials.map_batches(shard, batch_format="pyarrow")
        .groupby("__coarse")
        .map_groups(widen_block, batch_format="pandas")
    )


SQL_HEX_LANG_MIX = (
    _hex_cte("documents", "doc_id", "doc_id, lang")
    + """
  SELECT r, q, count(*) AS n_docs,
"""
    + ",\n".join(
        f"    CAST(sum(CASE WHEN lang='{l}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{l},\n"
        f"    CAST(sum(CASE WHEN lang='{l}' THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS p_{l}"
        for l in DOC_LANGS
    )
    + "\n  FROM hexed GROUP BY r, q\n"
)


def q_square_tile_counts(sf_dir: str) -> Dataset:
    """S2-style quadtree fallback key: 10 km square tile census."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "doc_id")
        return square_encode_batch(batch, 10_000.0)

    ds = ds.map_batches(enc, batch_format="pyarrow")
    return two_phase_sum(ds, ["tile_id"], [], count_as="n_docs")


SQL_SQUARE_TILE_COUNTS = (
    "WITH pts AS (SELECT doc_id, "
    + _GEO_SQL.format(key="doc_id")
    + """ FROM documents)
  SELECT (CAST(floor(x / 10000.0) AS BIGINT) + 134217728) * 268435456
         + (CAST(floor(y / 10000.0) AS BIGINT) + 134217728) AS tile_id,
         count(*) AS n_docs
  FROM pts GROUP BY 1
"""
)


def q_hex_lineitem_agg(sf_dir: str) -> Dataset:
    """Hex aggregation at lineitem scale (the bench driver): geocode by
    a composite integer key, per-hex quantity + exact revenue cents."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def enc(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = ok * 8 + ln
        batch = batch.append_column("lkey", pa.array(key))
        batch = geocode_ids_batch(batch, "lkey")
        batch = hex_encode_batch(batch, SPEC, resolutions=(0,))
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        ext_cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        disc_pct = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        rev = ext_cents * (100 - disc_pct)  # exact integer cents*100
        return pa.table(
            {
                "r": batch["r"],
                "q": batch["q"],
                "qty": pa.array(qty.astype(np.int64)),
                "revenue_c100": pa.array(rev),
            }
        )

    ds = ds.map_batches(enc, batch_format="pyarrow")
    return two_phase_sum(ds, ["r", "q"], ["qty", "revenue_c100"], count_as="n_items")


SQL_HEX_LINEITEM_AGG = (
    _hex_cte(
        "lineitem",
        "l_orderkey * 8 + l_linenumber",
        "CAST(l_quantity AS BIGINT) AS qty, "
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        " * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS revenue_c100",
    )
    + """
  SELECT r, q, CAST(sum(qty) AS BIGINT) AS qty,
         CAST(sum(revenue_c100) AS BIGINT) AS revenue_c100,
         count(*) AS n_items
  FROM hexed GROUP BY r, q
"""
)


def q_hex_events(sf_dir: str) -> Dataset:
    """Events into hexes by user_id: per-hex event count + value cents."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def enc(batch: pa.Table) -> pa.Table:
        batch = geocode_ids_batch(batch, "user_id")
        batch = hex_encode_batch(batch, SPEC, resolutions=(0,))
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({"r": batch["r"], "q": batch["q"], "value_cents": pa.array(cents)})

    ds = ds.map_batches(enc, batch_format="pyarrow")
    return two_phase_sum(ds, ["r", "q"], ["value_cents"], count_as="n_events")


SQL_HEX_EVENTS = (
    _hex_cte(
        "events",
        "user_id",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents",
    )
    + """
  SELECT r, q, CAST(sum(value_cents) AS BIGINT) AS value_cents,
         count(*) AS n_events
  FROM hexed GROUP BY r, q
"""
)


