"""Streaming-shaped session windows with INCREMENTAL per-shard actor
state (SURVEY §2.9 — the true streaming analogue of the batch
``groupby(user).map_groups`` sessionization in queries.py).

Shape: the event stream (globally ts-ordered) is routed to N shard
actors by ``hash(user_id) % N``; each actor owns its users' OPEN
sessions across feed() calls, advances a watermark, closes sessions
whose inactivity gap has provably passed (``last_seen + gap <
watermark``), and can ``drain()`` closed sessions mid-stream — the
engine's Kafka-consumer shape.  Raw ``@ray.remote`` actors are used
deliberately: the Dataset API cannot express cross-batch mutable
keyed state with ordered delivery (the brief's sanctioned exception).

Partitioning assumption (documented): rows arrive at each actor in
global ts order per feed() call, which the driver guarantees by
feeding from a ts-sorted Dataset; Ray actor tasks from one caller are
FIFO, so no reordering happens in flight.  The driver loop routes rows
only (zero-copy slices); all session computation runs in the actors.

At the end of the stream ``flush()`` closes remaining sessions; total
output is bit-identical to the batch operator (oracle-checked:
events_sessions_stream shares SQL_EVENTS_SESSIONS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

GAP_US = 1_800_000_000  # 30-min inactivity gap (reference default)


@ray.remote
class SessionShard:
    """One shard's incremental session state."""

    def __init__(self, gap_us: int = GAP_US):
        self.gap = gap_us
        # user_id -> [start_us, last_us, n_events, session_ordinal]
        self.open: dict[int, list[int]] = {}
        self.n_started: dict[int, int] = {}
        self.closed: list[tuple[int, int, int, int]] = []
        self.watermark = -(1 << 62)

    def _close(self, u: int, st: list[int]) -> None:
        self.closed.append((u, st[3], st[2], (st[1] - st[0]) // 1_000_000))

    def feed(self, user: np.ndarray, us: np.ndarray) -> int:
        """Ingest a ts-ordered slice; returns #sessions closed so far.

        Per-event Python loop is intentional: state transitions are
        sequential per user and the actor shard (not the row) is the
        parallelism unit — throughput scales with n_shards.
        """
        gap = self.gap
        for u, t in zip(user.tolist(), us.tolist()):
            st = self.open.get(u)
            if st is None:
                sid = self.n_started.get(u, 0) + 1
                self.n_started[u] = sid
                self.open[u] = [t, t, 1, sid]
            elif t - st[1] > gap:
                self._close(u, st)
                sid = self.n_started[u] + 1
                self.n_started[u] = sid
                self.open[u] = [t, t, 1, sid]
            else:
                st[1] = t
                st[2] += 1
        if us.size:
            self.watermark = max(self.watermark, int(us[-1]))
            # retire sessions that can no longer receive events
            done = [u for u, st in self.open.items() if st[1] + gap < self.watermark]
            for u in done:
                self._close(u, self.open.pop(u))
        return len(self.closed)

    def drain(self) -> pa.Table:
        """Emit closed sessions incrementally (mid-stream checkpoint)."""
        rows = self.closed
        self.closed = []
        return _sessions_table(rows)

    def flush(self) -> pa.Table:
        """End of stream: close every open session and emit the rest."""
        for u, st in sorted(self.open.items()):
            self._close(u, st)
        self.open = {}
        return self.drain()


def _sessions_table(rows) -> pa.Table:
    arr = np.asarray(rows, dtype=np.int64).reshape(-1, 4)
    return pa.table(
        {
            "user_id": pa.array(arr[:, 0]),
            "session_id": pa.array(arr[:, 1]),
            "n_events": pa.array(arr[:, 2]),
            "duration_s": pa.array(arr[:, 3]),
        }
    )


def streaming_sessions(
    events: Dataset,
    n_shards: int = 8,
    gap_us: int = GAP_US,
    feed_batch: int = 16384,
    max_inflight: int = 32,
) -> pd.DataFrame:
    """Run the event stream through shard actors; returns the complete
    closed-session table (== batch sessionization output).

    The driver is the stream SOURCE (stand-in for a Kafka consumer):
    it only routes ts-ordered row slices to shards with bounded
    in-flight refs (backpressure); no aggregation happens driver-side.
    """
    shards = [SessionShard.remote(gap_us) for _ in range(n_shards)]
    inflight: list = []
    stream = events.sort("ts")

    for batch in stream.iter_batches(batch_size=feed_batch, batch_format="pyarrow"):
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        shard = (user % np.int64(n_shards)).astype(np.int64)
        for s in range(n_shards):
            m = shard == s
            if m.any():
                inflight.append(shards[s].feed.remote(user[m], us[m]))
        if len(inflight) > max_inflight:  # backpressure
            done, inflight = ray.wait(inflight, num_returns=len(inflight) - max_inflight)
            ray.get(done)

    tables = ray.get([s.flush.remote() for s in shards])
    out = pa.concat_tables([t for t in tables if len(t)])
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_id"], ignore_index=True)
    )
