"""Join stages.

- ``broadcast_join``: small side shipped once via ``ray.put`` and
  hash-joined inside ``map_batches`` (no shuffle) — the engine's J1/J5
  pattern (SURVEY §2.5); correct whenever one side fits in worker
  memory (dimension tables, code lookups, boundary attrs).
- ``bucketed_join``: both sides large → co-partition on
  ``hash(key) % B`` and join per bucket inside ``map_groups`` — the
  explicit partitioned hash join; B and salt documented per call site.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


class _BroadcastJoiner:
    """Actor-pool stage: resolve the broadcast ref once per actor."""

    def __init__(self, small_ref, on: str, how: str):
        self.small: pd.DataFrame = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(
    big: Dataset,
    small: pd.DataFrame,
    on: str,
    how: str = "inner",
    concurrency: int | tuple = (1, 4),
    batch_size: int = 65536,
) -> Dataset:
    ref = ray.put(small)
    return big.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bucketed_join(
    left: Dataset,
    right: Dataset,
    on: str,
    n_buckets: int = 64,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join: tag both sides with bucket = key % B (a
    cheap integer hash is enough for int keys), union with a side tag,
    then join inside each bucket group.  One shuffle total."""

    lschema, rschema = left.schema(), right.schema()  # ray.data.Schema
    lcols, rcols = list(lschema.names), list(rschema.names)

    def _arrow_type(t) -> pa.DataType:
        # pandas-backed Datasets report numpy dtypes / Python classes
        # (e.g. `str`) instead of Arrow DataTypes — normalise
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        if t is bytes:
            return pa.binary()
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    # pad each side to the union schema with typed nulls so the two
    # Datasets share one Arrow schema and can union
    all_fields = [(n, _arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    all_fields += [
        (n, _arrow_type(t))
        for n, t in zip(rschema.names, rschema.types)
        if n not in lcols
    ]

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            kcol = batch[on]
            if pa.types.is_integer(kcol.type):
                k = np.asarray(kcol.to_numpy(zero_copy_only=False), dtype=np.int64)
                bucket = np.abs(k) % n_buckets
            else:  # string/binary keys: stable content hash
                from hexscape_ray.functions.hashing import fnv1a_64_str_array

                h = fnv1a_64_str_array(kcol.to_pylist())
                bucket = (h % np.uint64(n_buckets)).astype(np.int64)
            cols = {}
            for name, typ in all_fields:
                cols[name] = (
                    batch[name] if name in batch.column_names else pa.nulls(len(batch), typ)
                )
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(np.repeat(side, len(batch)))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag("L"), batch_format="pyarrow").union(
        right.map_batches(tag("R"), batch_format="pyarrow")
    )

    # pandas `how` -> Acero join_type.  The per-bucket join runs in Arrow
    # (pa.Table.join) so the typed nulls from the union padding never pass
    # through pandas — an int64 column with nulls would otherwise come back
    # float64+NaN and the wrong dtype would survive downstream aggregation
    # (the round-1 segment_order_stats hash failure).
    join_type = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }[how]

    typed = dict(all_fields)
    l_target = pa.schema([(n, typed[n]) for n in lcols])
    r_target = pa.schema([(n, typed[n]) for n in rcols])

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_left = pc.equal(g["__side"], "L")
        # cast restores declared dtypes on blocks whose columns degraded
        # to null type (an empty upstream block's schema can infect the
        # shuffled group); null→T casts are valid for all-null columns
        lg = g.filter(is_left).select(lcols).cast(l_target)
        rg = g.filter(pc.invert(is_left)).select(rcols).cast(r_target)
        out = lg.join(rg, keys=on, join_type=join_type)
        # Acero's output column order can vary; fix it to lcols + new rcols.
        ordered = lcols + [c for c in rcols if c != on]
        return out.select(ordered)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
