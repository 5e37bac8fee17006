"""Multimodal columns: image / audio / video as opaque ``binary``
payloads with typed metadata (SURVEY graft scope; no media libraries
exist in this container).

The Ray-side plumbing is REAL and tested — schemas, actor-pool stages,
small-batch sizing for wide binary rows, n→m frame expansion — while
the codec kernels are stubbed: each stage tries the real decoder
import (PIL / soundfile) and otherwise produces a clearly-labelled
DETERMINISTIC FAKE derived from the payload bytes (so outputs are
stable across runs and parallelism levels).  Swapping in real codecs
on a production image is ONLY replacing the ``_decode_*`` functions.

Schema convention (media table):

    media_id:int64, url:string, kind:string("image"|"audio"|"video"),
    payload:binary, meta:struct<width:int32, height:int32,
    duration_ms:int32, codec:string>
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexscape_ray.functions.hashing import fnv1a_64, splitmix64

DECODE_BACKEND = "fake"
try:  # pragma: no cover - PIL absent in this container
    import PIL.Image  # noqa: F401

    DECODE_BACKEND = "pil"
except ImportError:
    pass


def _fake_stats(payload: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-features from the payload hash — the stub
    decode. NOT real pixel/audio data (NotImplemented backend)."""
    seed = fnv1a_64(payload[:256])
    vals = splitmix64(np.arange(seed, seed + n, dtype=np.uint64) % np.uint64(2**63))
    return (vals % np.uint64(10_000)).astype(np.float64) / 10_000.0


class ImageDecoder:
    """image payload → (mean_r, mean_g, mean_b, sharpness) features.

    Actor pool with SMALL batches: payload rows are wide, so
    batch_size × concurrency must fit the worker heap (SURVEY §4
    memory pressure; use batch_size≈256 at 1 MB payloads).
    """

    def __init__(self):
        self.backend = DECODE_BACKEND

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.backend == "pil":  # pragma: no cover
            raise NotImplementedError("wire PIL decode here on real images")
        return _fake_stats(payload, 4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([self._decode(p) for p in batch["payload"].to_pylist()])
        out = batch.drop_columns(["payload"])
        for i, name in enumerate(["mean_r", "mean_g", "mean_b", "sharpness"]):
            out = out.append_column(name, pa.array(feats[:, i]))
        return out.append_column(
            "decode_backend", pa.array([self.backend] * len(batch))
        )


class ImageResizer:
    """Metadata-level resize: rewrites meta.width/height to the target
    box preserving aspect; payload passthrough (stub re-encode)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = batch["meta"].to_pylist()
        new_meta = []
        for m in meta:
            w, h = m["width"], m["height"]
            scale = min(self.max_side / max(w, h), 1.0)
            new_meta.append(
                {**m, "width": int(w * scale), "height": int(h * scale)}
            )
        return batch.set_column(
            batch.column_names.index("meta"), "meta", pa.array(new_meta)
        )


class AudioFeatureExtractor:
    """audio payload → 8 pseudo-mel band energies (stub decode)."""

    N_BANDS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(
            [_fake_stats(p, self.N_BANDS) for p in batch["payload"].to_pylist()]
        )
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "mel_bands",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), self.N_BANDS),
        )


class VideoFrameSampler:
    """video row → k frame rows (n→m expansion inside map_batches —
    the reference's split-patch pattern,
    /root/reference/R/generate_patches.R:148-166).  Frame payloads are
    deterministic slices of the video payload (stub extraction)."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_ts, out_payload = [], [], [], []
        for mid, m, p in zip(ids, metas, payloads):
            dur = max(int(m.get("duration_ms") or 1000), 1)
            step = max(len(p) // self.k, 1)
            for f in range(self.k):
                out_id.append(mid)
                out_frame.append(f)
                out_ts.append(dur * f // self.k)
                out_payload.append(p[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame_payload": pa.array(out_payload, type=pa.binary()),
            }
        )


def gen_media(n: int = 200, seed: int = 7) -> pa.Table:
    """Seeded media fixture table in the schema convention."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows_meta, payloads = [], []
    for i in range(n):
        size = int(rng.integers(2_000, 20_000))
        payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        rows_meta.append(
            {
                "width": int(rng.integers(64, 4096)),
                "height": int(rng.integers(64, 4096)),
                "duration_ms": int(rng.integers(1_000, 60_000)),
                "codec": ["jpeg", "flac", "h264"][["image", "audio", "video"].index(kinds[i])],
            }
        )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "url": pa.array([f"https://media.example/{i}" for i in range(n)]),
            "kind": pa.array(kinds.tolist()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(rows_meta),
        }
    )


def media_pipeline(media, frames_per_video: int = 4):
    """media Dataset → per-kind feature Datasets (the composed stage
    graph: filter per kind → actor pool with small batches)."""
    import pyarrow.compute as pc

    images = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    ).map_batches(ImageDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
    audio = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    ).map_batches(
        AudioFeatureExtractor, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )
    frames = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
    ).map_batches(
        VideoFrameSampler,
        fn_constructor_args=(frames_per_video,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )
    return images, audio, frames
