"""Ordered per-key window functions (rolling aggregates, lag deltas).

The SQL-window-function family Ray Data has no native operator for:

    SUM(v) OVER (PARTITION BY key ORDER BY ord ROWS BETWEEN k PRECEDING
                 AND CURRENT ROW)
    ord - LAG(ord) OVER (PARTITION BY key ORDER BY ord)

Composition (the scale shape): ONE hash co-partition on the key
(``hash(key) % B`` — same one-shuffle bucketing as
``stages.joins.bucketed_join``), then each bucket is sorted and every
per-key segment evaluated with vectorised cumsum arithmetic — no
per-row Python, no per-key loop, no global sort.  A bucket holds
complete key partitions by construction, so window frames never cross
bucket boundaries and the result is globally exact.

At 100 TB the only all-to-all is the single key shuffle; bucket count
``n_buckets`` bounds per-task memory (a bucket must fit in a worker's
heap — size B so rows/B × row-width ≈ target block size).  Skewed keys
are fine (a key's rows land in one bucket, the rest of the pool keeps
working); a single pathological key larger than worker memory would
need frame-carrying range splits, documented out of scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def rolling_window(
    ds: Dataset,
    key: str,
    order: list[str],
    value: str,
    preceding: int,
    out_sum: str = "rolling_sum",
    delta_of: str | None = None,
    out_delta: str = "delta",
    delta_null: int = -1,
    n_buckets: int = 64,
) -> Dataset:
    """Per-key ordered rolling sum + optional lag delta.

    For every row: ``out_sum`` = sum of ``value`` over the current row
    and up to ``preceding`` prior rows of the SAME ``key``, ordered by
    the ``order`` columns (which must make the order total within a
    key — include a unique id as the last tie-break column, exactly as
    the SQL oracle's ``ORDER BY`` must).  ``delta_of``: also emit
    ``order_col - previous row's order_col`` within the key
    (``LAG`` delta), ``delta_null`` for each key's first row (a typed
    placeholder instead of NULL so oracle hash comparison is
    null-convention-free).

    ``value`` must be integer (exact cumsum); convert money to cents
    upstream — float cumsum would drift from the SQL oracle.
    """
    assert order, "order columns required"

    def tag(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        return batch.append_column("__bucket", pa.array(np.abs(k) % n_buckets))

    def win(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        n = len(g)
        if n == 0:
            return g
        k = np.asarray(g[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        ords = [
            np.asarray(g[c].to_numpy(zero_copy_only=False)) for c in order
        ]
        # lexsort: primary = key, then order columns in sequence
        idx = np.lexsort(tuple(reversed(ords)) + (k,))
        g = g.take(pa.array(idx))
        k = k[idx]
        v = np.asarray(g[value].to_numpy(zero_copy_only=False), dtype=np.int64)

        # per-key segment starts, broadcast to every row
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        np.not_equal(k[1:], k[:-1], out=new_seg[1:])
        seg_first = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))

        # rolling sum over [max(i-preceding, seg_first), i] via padded cumsum
        csum = np.concatenate([[0], np.cumsum(v)])
        start = np.maximum(np.arange(n) - preceding, seg_first)
        cols = {c: g[c] for c in g.column_names}
        cols[out_sum] = pa.array(csum[np.arange(n) + 1] - csum[start])
        if delta_of is not None:
            o = np.asarray(
                g[delta_of].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            d = np.empty(n, dtype=np.int64)
            d[0] = delta_null
            d[1:] = o[1:] - o[:-1]
            d[new_seg] = delta_null
            cols[out_delta] = pa.array(d)
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(win, batch_format="pyarrow")
    )


def funnel_conversion(
    ds: Dataset,
    key: str,
    time_col: str,
    type_col: str,
    step_a: str,
    step_b: str,
    window: int,
    n_buckets: int = 64,
) -> Dataset:
    """Two-step funnel / sequence detection — per key, how many
    ``step_b`` events were CONVERTED, i.e. preceded by a ``step_a``
    event of the same key within ``window`` time units (inclusive on
    both edges: a step_a at exactly ``t_b − window`` or ``t_b``
    counts).  The product-analytics "view → purchase within 1 h"
    question, and the general SQL shape

        EXISTS (SELECT 1 FROM e a WHERE a.key = b.key
                AND a.type = 'A' AND a.t BETWEEN b.t - W AND b.t)

    Emits one row per key that has ≥1 step_b event:
    ``(key, n_target, n_converted)``.

    Scale shape: ONE hash co-partition on the key (same contract as
    :func:`rolling_window` — a key's rows land whole in one bucket),
    then per bucket a single lexsort + ONE vectorised double
    searchsorted of the step_b rows against the step_a rows over a
    per-key composite ``code·span + t`` (the same
    factorise-and-compose device as :func:`range_window` /
    ``stages.joins.asof_join``) — no per-key loop, no per-row Python.
    Same composite-overflow guard: raise ``n_buckets`` if
    ``keys_in_bucket × (span + window)`` nears 2^62.
    """

    def tag(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        return batch.append_column("__bucket", pa.array(np.abs(k) % n_buckets))

    def conv(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "n_target": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        k = np.asarray(g[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        t = np.asarray(g[time_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        ty = np.asarray(g[type_col].to_numpy(zero_copy_only=False))
        idx = np.lexsort((t, k))
        k, t, ty = k[idx], t[idx], ty[idx]

        uniq, code = np.unique(k, return_inverse=True)
        t0 = t - t.min()
        span = np.int64(int(t0.max()) + int(window) + 2)
        if len(uniq) * int(span) >= 2**62:
            raise OverflowError(
                "funnel_conversion composite overflow: raise n_buckets "
                f"(keys={len(uniq)}, span={span})"
            )
        comp = code.astype(np.int64) * span + t0
        is_a = ty == step_a
        is_b = ty == step_b
        a_comp = comp[is_a]
        b_comp = comp[is_b]
        # step_a present in [t_b - window, t_b] of the same key?
        lo = np.searchsorted(a_comp, b_comp - window, side="left")
        hi = np.searchsorted(a_comp, b_comp, side="right")
        converted = hi > lo

        b_code = code[is_b]
        n_target = np.bincount(b_code, minlength=len(uniq))
        n_conv = np.bincount(b_code[converted], minlength=len(uniq))
        has_b = n_target > 0
        return pa.table(
            {
                key: pa.array(uniq[has_b]),
                "n_target": pa.array(n_target[has_b].astype(np.int64)),
                "n_converted": pa.array(n_conv[has_b].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(conv, batch_format="pyarrow")
    )


def grouped_gap_stats(
    ds: Dataset,
    key: str,
    time_col: str,
    order_tail: list[str] | None = None,
    n_buckets: int = 64,
) -> Dataset:
    """Per-key inter-event-gap statistics — the LAG-delta aggregate:

        gap_i = t_i − LAG(t_i) OVER (PARTITION BY key
                                     ORDER BY t, tail...)
        → per key: n_events, n_gaps, sum_gap, max_gap

    (``n_gaps = n_events − 1``; keys with a single event report
    ``sum_gap = 0, max_gap = 0`` — a typed zero instead of NULL so the
    oracle hash is null-convention-free; the SQL mirror is
    ``COALESCE(sum(gap), 0)``.)  Mean gap is left to the caller as the
    final division of two exact integers.

    One hash co-partition; per bucket one lexsort, one vectorised
    diff, and three ``bincount``/``maximum.at`` passes — no per-key
    loop.  Session cut-offs are deliberately NOT applied here; compose
    with the sessionizer for within-session gaps.
    """
    order_tail = order_tail or []

    def tag(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        return batch.append_column("__bucket", pa.array(np.abs(k) % n_buckets))

    def stats(g: pa.Table) -> pa.Table:
        n = len(g)
        empty = {
            key: pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "sum_gap": pa.array([], pa.int64()),
            "max_gap": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        k = np.asarray(g[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        t = np.asarray(g[time_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        tails = [
            np.asarray(g[c].to_numpy(zero_copy_only=False)) for c in order_tail
        ]
        idx = np.lexsort(tuple(reversed(tails)) + (t, k))
        k, t = k[idx], t[idx]

        uniq, code = np.unique(k, return_inverse=True)
        d = t[1:] - t[:-1]
        same = k[1:] == k[:-1]  # gap only within a key segment
        gcode = code[1:][same]
        gaps = d[same]
        n_events = np.bincount(code, minlength=len(uniq))
        n_gaps = np.bincount(gcode, minlength=len(uniq))
        sum_gap = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sum_gap, gcode, gaps)
        max_gap = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(max_gap, gcode, gaps)
        return pa.table(
            {
                key: pa.array(uniq),
                "n_events": pa.array(n_events.astype(np.int64)),
                "n_gaps": pa.array(n_gaps.astype(np.int64)),
                "sum_gap": pa.array(sum_gap),
                "max_gap": pa.array(max_gap),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(stats, batch_format="pyarrow")
    )


def range_window(
    ds: Dataset,
    key: str,
    time_col: str,
    value: str,
    window: int,
    order_tail: list[str] | None = None,
    out_sum: str = "range_sum",
    out_rownum: str = "rn",
    n_buckets: int = 64,
) -> Dataset:
    """Per-key TIME-RANGE window sum + row number — the value-based
    frame ``SUM(v) OVER (PARTITION BY key ORDER BY t RANGE BETWEEN
    window PRECEDING AND CURRENT ROW)`` plus ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY t, tail...)``.

    RANGE-frame semantics (SQL): the frame covers every row of the key
    whose time lies in ``[t_i − window, t_i]`` — INCLUDING peers of
    the current row (equal ``t``), regardless of row position.  Both
    frame edges are therefore value-searches, not row offsets:
    ``lo = searchsorted(t, t_i − window, left)``,
    ``hi = searchsorted(t, t_i, right)`` per key segment, evaluated in
    ONE vectorised searchsorted over a per-bucket composite
    ``code·SPAN + (t − t_min)`` (same factorise-and-compose device as
    ``stages.joins.asof_join``).  Overflow guard: needs
    ``n_keys_in_bucket × (span + window) < 2^62`` — raise ``n_buckets``
    for corpora with both huge key cardinality and huge time spans.

    One hash co-partition total; same bucket-memory contract as
    :func:`rolling_window`.
    """
    order_tail = order_tail or []

    def tag(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        return batch.append_column("__bucket", pa.array(np.abs(k) % n_buckets))

    def win(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        n = len(g)
        if n == 0:
            return g
        k = np.asarray(g[key].to_numpy(zero_copy_only=False), dtype=np.int64)
        t = np.asarray(g[time_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        tails = [
            np.asarray(g[c].to_numpy(zero_copy_only=False)) for c in order_tail
        ]
        idx = np.lexsort(tuple(reversed(tails)) + (t, k))
        g = g.take(pa.array(idx))
        k, t = k[idx], t[idx]
        v = np.asarray(g[value].to_numpy(zero_copy_only=False), dtype=np.int64)

        _, code = np.unique(k, return_inverse=True)
        t0 = t - t.min()
        span = np.int64(int(t0.max()) + int(window) + 2)
        if (int(code.max()) + 1) * int(span) >= 2**62:
            raise OverflowError(
                "range_window composite overflow: raise n_buckets "
                f"(keys={code.max()+1}, span={span})"
            )
        comp = code.astype(np.int64) * span + t0
        lo = np.searchsorted(comp, comp - window, side="left")
        hi = np.searchsorted(comp, comp, side="right")
        csum = np.concatenate([[0], np.cumsum(v)])
        cols = {c: g[c] for c in g.column_names}
        cols[out_sum] = pa.array(csum[hi] - csum[lo])

        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        np.not_equal(k[1:], k[:-1], out=new_seg[1:])
        seg_first = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        cols[out_rownum] = pa.array(np.arange(n) - seg_first + 1)
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(win, batch_format="pyarrow")
    )
