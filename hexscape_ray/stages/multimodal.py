"""Multimodal columns: image / audio / video as opaque ``binary``
payloads with typed metadata (SURVEY graft scope).

The Ray-side plumbing is REAL and tested — schemas, actor-pool stages,
small-batch sizing for wide binary rows, n→m frame expansion.  Codec
kernels: PNG and WAV decode are REAL pure-stdlib implementations
(``functions/codecs.py`` — zlib + wave are in every CPython), used for
the fixture payloads, which are themselves genuine PNG/WAV bytes.
Baseline JPEG (pure-numpy huffman + IDCT), fixed-predictor-subset
FLAC, MJPEG-in-AVI video (RIFF container of baseline JPEGs) and
MPEG-1 video (I-frame-only subset: sequence/GOP/picture/slice/
macroblock syntax, intra quantiser, DC prediction, B.5 VLCs) also
decode for REAL (``functions/codecs.py``).  The remaining
external-lib formats (progressive jpeg, LPC flac, h264 — PIL /
soundfile / av absent from this container; h264 is PERMANENTLY
env-blocked, no pure-numpy decoder is feasible) fall back to a
clearly-labelled
DETERMINISTIC FAKE derived from the payload hash, so outputs stay
stable across runs and parallelism levels; the per-row
``decode_backend`` column says which path each row took.

Schema convention (media table):

    media_id:int64, url:string, kind:string("image"|"audio"|"video"),
    payload:binary, meta:struct<width:int32, height:int32,
    duration_ms:int32, codec:string>
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hexscape_ray.functions.codecs import (
    decode_bmp,
    decode_flac,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_avi_mjpeg,
    encode_bmp,
    encode_flac,
    encode_gif,
    encode_jpeg,
    encode_png,
    encode_wav,
    parse_avi_mjpeg,
)
from hexscape_ray.functions.hashing import fnv1a_64, splitmix64

DECODE_BACKEND = "native"  # pure-stdlib png/wav codecs
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


def _img_features(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (mean_r, mean_g, mean_b, sharpness)."""
    arr = arr.astype(np.float64)
    if arr.shape[2] >= 3:
        means = arr[:, :, :3].mean(axis=(0, 1)) / 255.0
        lum = arr[:, :, :3].mean(axis=2)
    else:  # gray / gray+alpha: replicate channel 0
        means = np.full(3, arr[:, :, 0].mean() / 255.0)
        lum = arr[:, :, 0]
    # sharpness = mean abs gradient of luminance (0 for 1-px dims)
    gsum = 0.0
    gn = 0
    if lum.shape[0] > 1:
        d = np.abs(np.diff(lum, axis=0))
        gsum += d.sum()
        gn += d.size
    if lum.shape[1] > 1:
        d = np.abs(np.diff(lum, axis=1))
        gsum += d.sum()
        gn += d.size
    sharp = (gsum / gn / 255.0) if gn else 0.0
    return np.array([*means, sharp])


class ImageDecoder:
    """image payload → (mean_r, mean_g, mean_b, sharpness) features.

    PNG, baseline JPEG, GIF (LZW) and 24-bit BMP payloads decode for
    REAL (pure-numpy/stdlib codecs, ``functions/codecs.py``);
    progressive JPEG, interlaced GIF and other codecs fall back to the
    labelled fake.  Actor pool with SMALL batches: payload
    rows are wide, so batch_size × concurrency must fit the worker
    heap (SURVEY §4 memory pressure; use batch_size≈256 at 1 MB
    payloads).
    """

    def __init__(self):
        self.backend = DECODE_BACKEND

    def _decode(self, payload: bytes) -> tuple[np.ndarray, str]:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _img_features(decode_png(payload)), "native-png"
        if payload[:2] == b"\xff\xd8":
            try:
                return _img_features(decode_jpeg(payload)), "native-jpeg"
            except ValueError:  # progressive / 12-bit / arithmetic
                pass
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            try:
                return _img_features(decode_gif(payload)), "native-gif"
            except ValueError:  # interlaced / exotic blocks
                pass
        if payload[:2] == b"BM":
            try:
                return _img_features(decode_bmp(payload)), "native-bmp"
            except ValueError:  # non-24-bit / RLE
                pass
        return _fake_stats(payload, 4), "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self._decode(p) for p in batch["payload"].to_pylist()]
        feats = np.stack([d[0] for d in decoded]) if decoded else np.empty((0, 4))
        out = batch.drop_columns(["payload"])
        for i, name in enumerate(["mean_r", "mean_g", "mean_b", "sharpness"]):
            out = out.append_column(name, pa.array(feats[:, i]))
        return out.append_column(
            "decode_backend", pa.array([d[1] for d in decoded], type=pa.string())
        )


def _bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) uint8 → (out_h, out_w, C) uint8, bilinear with
    half-pixel-centre sampling (the OpenCV/PIL convention), fully
    vectorised (4 gathers + lerp)."""
    H, W = arr.shape[:2]
    a = arr.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * (H / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (W / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = a[y0[:, None], x0[None, :]] * (1 - fx) + a[y0[:, None], x1[None, :]] * fx
    bot = a[y1[:, None], x0[None, :]] * (1 - fx) + a[y1[:, None], x1[None, :]] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class ImageResizer:
    """REAL resize for decodable payloads (PNG + baseline JPEG):
    decode → vectorised bilinear to the target box (aspect preserved,
    never upscaled) → re-encode as PNG; meta rewritten to the actual
    output dims, ``codec`` becomes ``png``.  Undecodable payloads keep
    the metadata-only rewrite (passthrough bytes) — the per-row
    ``resize_backend`` column says which path ran."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def _one(self, payload: bytes, m: dict) -> tuple[bytes, dict, str]:
        arr = None
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            arr = decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            try:
                arr = decode_jpeg(payload)
            except ValueError:
                arr = None
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            try:
                arr = decode_gif(payload)
            except ValueError:
                arr = None
        elif payload[:2] == b"BM":
            try:
                arr = decode_bmp(payload)
            except ValueError:
                arr = None
        if arr is None:  # metadata-only fallback (labelled)
            w, h = m["width"], m["height"]
            scale = min(self.max_side / max(w, h, 1), 1.0)
            return payload, {**m, "width": int(w * scale), "height": int(h * scale)}, "meta-only"
        h, w = arr.shape[:2]
        scale = min(self.max_side / max(w, h, 1), 1.0)
        ow, oh = max(int(w * scale), 1), max(int(h * scale), 1)
        if (ow, oh) != (w, h):
            arr = _bilinear_resize(arr, oh, ow)
        out = encode_png(arr)
        return out, {**m, "width": ow, "height": oh, "codec": "png"}, "native"

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        done = [self._one(p, m) for p, m in zip(payloads, metas)]
        batch = batch.set_column(
            batch.column_names.index("payload"),
            "payload",
            pa.array([d[0] for d in done], type=pa.binary()),
        )
        batch = batch.set_column(
            batch.column_names.index("meta"), "meta", pa.array([d[1] for d in done])
        )
        return batch.append_column(
            "resize_backend", pa.array([d[2] for d in done], type=pa.string())
        )


class AudioFeatureExtractor:
    """audio payload → 8 log-spaced spectral band energies.

    WAV/PCM payloads decode for real (stdlib ``wave``) and FLAC via
    the from-scratch fixed-predictor-subset codec (LPC subframes →
    labelled fake): rfft magnitude averaged over 8 geometrically-
    spaced bands, normalised by sample count."""

    N_BANDS = 8

    def _features(self, payload: bytes) -> tuple[np.ndarray, str]:
        x = None
        backend = "fake"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, _rate = decode_wav(payload)
            backend = "native-wav"
        elif payload[:4] == b"fLaC":
            try:
                x, _rate = decode_flac(payload)
                backend = "native-flac"
            except ValueError:  # LPC / exotic layouts
                x = None
        if x is not None:
            mag = np.abs(np.fft.rfft(x)) / max(len(x), 1)
            edges = np.unique(
                np.round(np.geomspace(1, max(mag.size, 2), self.N_BANDS + 1)).astype(
                    np.int64
                )
            )
            bands = np.zeros(self.N_BANDS)
            for i in range(min(self.N_BANDS, edges.size - 1)):
                seg = mag[edges[i] : edges[i + 1]]
                bands[i] = seg.mean() if seg.size else 0.0
            return bands, backend
        return _fake_stats(payload, self.N_BANDS), "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self._features(p) for p in batch["payload"].to_pylist()]
        feats = (
            np.stack([d[0] for d in decoded])
            if decoded
            else np.empty((0, self.N_BANDS))
        )
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "mel_bands",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), self.N_BANDS),
        ).append_column(
            "decode_backend", pa.array([d[1] for d in decoded], type=pa.string())
        )


class VideoFrameSampler:
    """video row → k frame rows (n→m expansion inside map_batches —
    the reference's split-patch pattern,
    /root/reference/R/generate_patches.R:148-166).

    MJPEG-in-AVI payloads are REAL: the RIFF container is parsed
    (``parse_avi_mjpeg``), k evenly-spaced frames are extracted, and
    each ``frame_payload`` is a genuine baseline JPEG that the image
    stage can decode (``decode_backend="native-mjpeg"``).  MPEG-1
    elementary streams (I-frame-only subset, ``codecs.decode_mpeg1``)
    also decode for REAL: k sampled frames re-encode as lossless PNG
    payloads (``decode_backend="native-mpeg1"``).  The one remaining
    external-lib codec (h264 — no pure-numpy decoder is feasible)
    keeps the labelled fake: deterministic byte slices of the payload
    (``decode_backend="fake"``).  Always emits exactly k rows per
    video (indices may repeat when the stream is shorter than k)."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hexscape_ray.functions.codecs import decode_mpeg1, encode_png

        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_ts, out_payload, out_backend = [], [], [], [], []
        for mid, m, p in zip(ids, metas, payloads):
            try:
                jpegs, fps, _, _ = parse_avi_mjpeg(p)
            except ValueError:
                jpegs, fps = None, 0
            if jpegs is not None:
                src = np.floor(
                    np.linspace(0, len(jpegs), self.k, endpoint=False)
                ).astype(int)
                ms_per = 1000 // max(fps, 1)
                for f, s in enumerate(src):
                    out_id.append(mid)
                    out_frame.append(f)
                    out_ts.append(int(s) * ms_per)
                    out_payload.append(jpegs[s])
                    out_backend.append("native-mjpeg")
                continue
            if p[:4] == b"\x00\x00\x01\xb3":  # MPEG-1 sequence header
                rgb_frames, fps = decode_mpeg1(p)
                src = np.floor(
                    np.linspace(0, len(rgb_frames), self.k, endpoint=False)
                ).astype(int)
                ms_per = 1000 // max(fps, 1)
                for f, s in enumerate(src):
                    out_id.append(mid)
                    out_frame.append(f)
                    out_ts.append(int(s) * ms_per)
                    out_payload.append(encode_png(rgb_frames[s]))
                    out_backend.append("native-mpeg1")
                continue
            dur = max(int(m.get("duration_ms") or 1000), 1)
            step = max(len(p) // self.k, 1)
            for f in range(self.k):
                out_id.append(mid)
                out_frame.append(f)
                out_ts.append(dur * f // self.k)
                out_payload.append(p[f * step : (f + 1) * step])
                out_backend.append("fake")
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame_payload": pa.array(out_payload, type=pa.binary()),
                "decode_backend": pa.array(out_backend, type=pa.string()),
            }
        )


def gen_media(n: int = 200, seed: int = 7) -> pa.Table:
    """Seeded media fixture table in the schema convention.  Image and
    audio payloads are GENUINE bytes (PNG / baseline JFIF / GIF89a /
    24-bit BMP rotating per image, 16–48 px RGB gradients; WAV PCM16
    and FLAC mono 8 kHz sine+noise) so the decode stages run real
    kernels; video payloads rotate GENUINE MJPEG-in-AVI (real RIFF
    container of baseline JPEG frames), GENUINE MPEG-1 I-frame
    elementary streams (``codecs.encode_mpeg1``) and opaque
    pseudo-h264 (the one format with no feasible pure-numpy decoder —
    the labelled fake path)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows_meta, payloads = [], []
    for i in range(n):
        if kinds[i] == "image":
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            # smooth gradient + texture: JPEG-representative content
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            base = np.stack(
                [
                    yy * (200.0 / max(h - 1, 1)),
                    xx * (200.0 / max(w - 1, 1)),
                    (yy + xx) * (100.0 / max(h + w - 2, 1)),
                ],
                axis=2,
            )
            img = np.clip(
                base + rng.normal(0, 12, (h, w, 3)) + 20, 0, 255
            ).astype(np.uint8)
            if i % 4 == 0:  # genuine baseline JFIF via the numpy encoder
                payloads.append(encode_jpeg(img, quality=90, subsample=i % 8 == 0))
                codec = "jpeg"
            elif i % 4 == 1:  # genuine GIF89a (palettised LZW)
                payloads.append(encode_gif(img))
                codec = "gif"
            elif i % 4 == 2:  # genuine 24-bit BMP
                payloads.append(encode_bmp(img))
                codec = "bmp"
            else:
                payloads.append(encode_png(img))
                codec = "png"
            rows_meta.append(
                {"width": w, "height": h, "duration_ms": 0, "codec": codec}
            )
        elif kinds[i] == "audio":
            ns = int(rng.integers(400, 2400))
            t = np.arange(ns)
            freq = float(rng.uniform(100, 1200))
            x = 0.6 * np.sin(2 * np.pi * freq * t / 8000.0) + rng.normal(0, 0.02, ns)
            if i % 3 == 0:  # genuine FLAC via the numpy subset codec
                payloads.append(encode_flac(x, rate=8000))
                acodec = "flac"
            else:
                payloads.append(encode_wav(x, rate=8000))
                acodec = "wav"
            rows_meta.append(
                {
                    "width": 0,
                    "height": 0,
                    "duration_ms": int(ns * 1000 / 8000),
                    "codec": acodec,
                }
            )
        else:
            if i % 3 == 0:  # genuine MJPEG-in-AVI via the numpy JPEG encoder
                nf = int(rng.integers(4, 9))
                fw, fh = int(rng.integers(16, 33)), int(rng.integers(16, 33))
                fps = int(rng.integers(5, 25))
                yy, xx = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
                vids = []
                for f in range(nf):
                    img = np.clip(
                        np.stack(
                            [
                                yy * (180.0 / max(fh - 1, 1)) + f * 8.0,
                                xx * (180.0 / max(fw - 1, 1)),
                                (yy + xx) * (90.0 / max(fh + fw - 2, 1)) + f * 4.0,
                            ],
                            axis=2,
                        )
                        + rng.normal(0, 10, (fh, fw, 3))
                        + 15,
                        0,
                        255,
                    ).astype(np.uint8)
                    vids.append(img)
                payloads.append(encode_avi_mjpeg(vids, fps=fps))
                rows_meta.append(
                    {
                        "width": fw,
                        "height": fh,
                        "duration_ms": nf * 1000 // fps,
                        "codec": "mjpeg",
                    }
                )
            elif i % 3 == 1:  # genuine MPEG-1 I-frame elementary stream
                # the MAIN rng stream must stay draw-for-draw identical
                # to the original fixture (gen_media_dups' image dup
                # hamming margins are content-dependent downstream of
                # this point), so this branch consumes the exact draws
                # the old pseudo-h264 branch did and derives the MPEG-1
                # content from a per-item CHILD rng instead
                size = int(rng.integers(2_000, 20_000))
                rng.integers(0, 256, size, dtype=np.uint8)  # stream parity
                sub = np.random.default_rng(seed * 100_003 + i)
                from hexscape_ray.functions.codecs import encode_mpeg1

                nf = int(sub.integers(4, 9))
                fw, fh = int(sub.integers(16, 33)), int(sub.integers(16, 33))
                fps = int(sub.integers(5, 25))
                yy, xx = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
                vids = []
                for f in range(nf):
                    img = np.clip(
                        np.stack(
                            [
                                yy * (170.0 / max(fh - 1, 1)) + f * 7.0,
                                xx * (170.0 / max(fw - 1, 1)),
                                (yy + xx) * (85.0 / max(fh + fw - 2, 1)) + f * 5.0,
                            ],
                            axis=2,
                        )
                        + sub.normal(0, 10, (fh, fw, 3))
                        + 15,
                        0,
                        255,
                    ).astype(np.uint8)
                    vids.append(img)
                payloads.append(encode_mpeg1(vids, fps=fps))
                rows_meta.append(
                    {
                        "width": fw,
                        "height": fh,
                        "duration_ms": nf * 1000 // fps,
                        "codec": "mpeg1",
                    }
                )
            else:
                size = int(rng.integers(2_000, 20_000))
                payloads.append(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
                rows_meta.append(
                    {
                        "width": int(rng.integers(64, 4096)),
                        "height": int(rng.integers(64, 4096)),
                        "duration_ms": int(rng.integers(1_000, 60_000)),
                        "codec": "h264",
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


def frame_features(frames):
    """video frames → per-frame image features: the sampled
    ``frame_payload`` of a native-mjpeg video is a genuine baseline
    JPEG, so the SAME ImageDecoder actor stage that serves still
    images decodes it (fake-slice frames from h264 payloads fall to
    the labelled fake path inside the decoder).  Output adds
    mean_r/g/b + sharpness + decode_backend per (media_id, frame_idx).
    """

    def to_payload(batch: pa.Table) -> pa.Table:
        names = [
            "payload" if n == "frame_payload" else n for n in batch.column_names
        ]
        t = batch.rename_columns(names)
        return t.drop_columns(["decode_backend"])

    return frames.map_batches(to_payload, batch_format="pyarrow").map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
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


# ---------------------------------------------------------------------------
# perceptual image hashing (pHash) + near-duplicate image detection
# ---------------------------------------------------------------------------

_DCT32: np.ndarray | None = None


def _dct32() -> np.ndarray:
    """32×32 DCT-II basis (orthonormal), built once per process —
    phash = sign pattern of the top-left 8×8 AC coefficients."""
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        d[0] /= np.sqrt(2.0)
        _DCT32 = d
    return _DCT32


def decode_image_array(payload: bytes) -> np.ndarray | None:
    """payload → HxWx3 uint8 via the native pure-numpy codecs
    (png/jpeg/gif/bmp), None when no real decoder applies."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
    except ValueError:
        return None
    return None


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → bilinear 32×32 → 2-D DCT →
    8×8 low-frequency block; bit j = (AC coeff j > median of the 63 AC
    coeffs). Deterministic: the median of an odd count is an order
    statistic (no interpolation), and every step is fixed-order float64.
    Returns a non-negative int < 2^63 (63 AC bits)."""
    g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    g = _bilinear_resize(g[..., None], 32, 32)[..., 0]
    d = _dct32()
    freq = d @ g @ d.T
    block = freq[:8, :8].ravel()[1:]  # drop DC
    med = np.partition(block, 31)[31]  # exact middle order statistic
    bits = block > med
    h = 0
    for j in np.nonzero(bits)[0]:
        h |= 1 << int(j)
    return h


def phash_batch(batch: pa.Table) -> pa.Table:
    """(media_id, payload) → (media_id, phash, decode_backend) — the
    map-side kernel of image near-dup detection. Stateless fn with the
    module-level DCT basis singleton (actor pools pay a pool cold-start
    per pipeline; light state prefers task functions)."""
    ids, hashes, backends = [], [], []
    for mid, p in zip(
        batch["media_id"].to_pylist(), batch["payload"].to_pylist()
    ):
        arr = decode_image_array(p)
        if arr is None:
            continue  # undecodable → cannot be judged a visual dup
        ids.append(mid)
        hashes.append(phash64(arr))
        backends.append("native")
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "phash": pa.array(hashes, type=pa.int64()),
            "decode_backend": pa.array(backends, type=pa.string()),
        }
    )


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorised 64-bit popcount (SWAR) — hamming distance kernel."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def gen_media_dups(n: int = 200, seed: int = 7) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Media fixture + seeded VISUAL near-duplicates: every third image
    is re-encoded (lossless PNG transcode or quality-70 JPEG re-encode,
    alternating) under media_id = orig + 100000. Returns (table,
    expected near-dup pairs) so tests can assert recall."""
    base = gen_media(n=n, seed=seed)
    kinds = base["kind"].to_pylist()
    payloads = base["payload"].to_pylist()
    ids = base["media_id"].to_pylist()
    urls = base["url"].to_pylist()
    metas = base["meta"].to_pylist()
    rows = {c: list(base[c].to_pylist()) for c in base.column_names}
    expected = []
    j = 0
    for i in range(n):
        if kinds[i] != "image":
            continue
        arr = decode_image_array(payloads[i])
        if arr is None:
            continue
        if j % 3 == 0:
            dup = encode_png(arr) if j % 2 == 0 else encode_jpeg(arr, quality=70)
            did = ids[i] + 100_000
            rows["media_id"].append(did)
            rows["url"].append(urls[i] + "#dup")
            rows["kind"].append("image")
            rows["payload"].append(dup)
            rows["meta"].append(metas[i])
            expected.append((ids[i], did))
        j += 1
    t = pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "url": pa.array(rows["url"], type=pa.string()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "meta": pa.array(rows["meta"]),
        }
    )
    return t, expected


# ---------------------------------------------------------------------------
# audio spectral fingerprinting — the audio twin of pHash dedup
# ---------------------------------------------------------------------------


def decode_audio_samples(payload: bytes) -> np.ndarray | None:
    """payload → float sample vector via the native wav/flac codecs,
    None when no real decoder applies."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload)[0]
        if payload[:4] == b"fLaC":
            return decode_flac(payload)[0]
    except ValueError:
        return None
    return None


def audio_fp60(x: np.ndarray) -> int:
    """60-bit GAIN-INVARIANT spectral-shape fingerprint (Haitsma–
    Kalker family): the clip splits into 4 equal time quarters; each
    quarter's rfft magnitude averages into 16 geometrically-spaced
    bands; bit (b, k) = E[b, k] > E[b+1, k] — adjacent-BAND energy
    comparisons capture the spectral shape per quarter, and pure
    comparisons mean a volume-scaled copy fingerprints identically
    and a lossless transcode exactly so."""
    x = np.asarray(x, dtype=np.float64)
    q = x.shape[0] // 4
    if q < 32:
        return 0
    e = np.empty((16, 4))
    for k in range(4):
        mag = np.abs(np.fft.rfft(x[k * q : (k + 1) * q]))
        edges = np.unique(
            np.round(np.geomspace(1, max(mag.size, 2), 17)).astype(np.int64)
        )
        for b in range(16):
            if b < edges.size - 1:
                seg = mag[edges[b] : edges[b + 1]]
                e[b, k] = seg.mean() if seg.size else 0.0
            else:
                e[b, k] = 0.0
    h = 0
    bit = 0
    for k in range(4):
        for b in range(15):
            if e[b, k] > e[b + 1, k]:
                h |= 1 << bit
            bit += 1
    return h


def audio_fp_batch(batch: pa.Table) -> pa.Table:
    """(media_id, payload) → (media_id, afp) for decodable audio."""
    ids, fps = [], []
    for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
        x = decode_audio_samples(p)
        if x is None or len(x) < 128:
            continue
        ids.append(mid)
        fps.append(audio_fp60(x))
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "afp": pa.array(fps, type=pa.int64()),
        }
    )


def gen_media_audio_dups(n: int = 80, seed: int = 7) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Synthetic audio corpus + seeded NEAR-DUPLICATES for the
    fingerprint op: multi-harmonic clips (4 partials with random
    amplitudes/phases over a random fundamental + noise — rich
    spectral shapes, unlike pure sines whose fingerprints collide),
    encoded wav/flac alternating.  Every second clip re-issues as a
    lossless container transcode or a 0.7x volume-scaled copy under
    media_id = orig + 200000.  Returns (table, expected pairs)."""
    rng = np.random.default_rng(seed)
    ids, urls, kinds, payloads, metas = [], [], [], [], []
    expected = []
    for i in range(n):
        ns = int(rng.integers(1200, 2400))
        t = np.arange(ns)
        f0 = float(rng.uniform(80, 900))
        x = rng.normal(0, 0.01, ns)
        for hmul in range(1, 5):
            amp = float(rng.uniform(0.05, 0.5))
            ph = float(rng.uniform(0, 2 * np.pi))
            x = x + amp * np.sin(2 * np.pi * f0 * hmul * t / 8000.0 + ph)
        x = 0.8 * x / max(np.abs(x).max(), 1e-9)
        payload = encode_wav(x, rate=8000) if i % 2 == 0 else encode_flac(x, rate=8000)
        ids.append(i)
        urls.append(f"https://media.example/a{i}")
        kinds.append("audio")
        payloads.append(payload)
        metas.append(
            {"width": 0, "height": 0, "duration_ms": ns * 1000 // 8000,
             "codec": "wav" if i % 2 == 0 else "flac"}
        )
        if i % 2 == 0:
            xdec = decode_audio_samples(payload)
            if i % 4 == 0:  # lossless container transcode
                dup = encode_flac(xdec, rate=8000)
            else:  # volume-scaled copy (gain invariance)
                dup = encode_wav(0.7 * np.asarray(xdec, dtype=np.float64), rate=8000)
            ids.append(i + 200_000)
            urls.append(f"https://media.example/a{i}#adup")
            kinds.append("audio")
            payloads.append(dup)
            metas.append(metas[-1])
            expected.append((i, i + 200_000))
    t = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas),
        }
    )
    return t, expected


# ---------------------------------------------------------------------------
# video fingerprinting — per-frame pHash majority vote over MJPEG-AVI
# ---------------------------------------------------------------------------


def video_fp64(payload: bytes) -> int | None:
    """MJPEG-AVI payload → 63-bit clip signature: pHash each frame
    (real RIFF parse + the numpy JPEG decoder), then MAJORITY VOTE per
    bit across frames — single-frame hash jitter from re-encoding
    averages out, so a quality-70 re-encode of the same clip lands
    within a few bits.  MPEG-1 I-frame streams decode through
    ``codecs.decode_mpeg1`` and fingerprint identically, so a
    cross-CONTAINER transcode (AVI↔MPEG-1 of the same clip) is a
    detectable near-dup.  None when the payload is neither."""
    arrs: list = []
    try:
        jbs, _fps, _w, _h = parse_avi_mjpeg(payload)
        for jb in jbs:
            try:
                arrs.append(decode_jpeg(jb))
            except ValueError:
                continue
    except ValueError:
        if payload[:4] == b"\x00\x00\x01\xb3":
            from hexscape_ray.functions.codecs import decode_mpeg1

            try:
                arrs, _ = decode_mpeg1(payload)
            except ValueError:
                return None
        else:
            return None
    votes = np.zeros(63, dtype=np.int64)
    n = 0
    for arr in arrs:
        h = phash64(arr)
        bits = (h >> np.arange(63, dtype=np.uint64)) & 1
        votes += bits.astype(np.int64)
        n += 1
    if n == 0:
        return None
    maj = votes * 2 > n  # strict majority; ties -> 0 (deterministic)
    out = 0
    for j in np.nonzero(maj)[0]:
        out |= 1 << int(j)
    return out


def video_fp_batch(batch: pa.Table) -> pa.Table:
    """(media_id, payload) → (media_id, vfp) for parseable videos."""
    ids, fps = [], []
    for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
        fp = video_fp64(p)
        if fp is None:
            continue
        ids.append(mid)
        fps.append(fp)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "vfp": pa.array(fps, type=pa.int64()),
        }
    )


def gen_media_video_dups(n: int = 40, seed: int = 7) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Synthetic MJPEG-AVI corpus + seeded VISUAL near-duplicates:
    textured moving-gradient clips (4-8 frames); every second clip
    re-issues with every frame decoded and re-encoded at JPEG quality
    85 (a true lossy transcode) under media_id = orig + 300000."""
    rng = np.random.default_rng(seed)
    ids, urls, kinds, payloads, metas = [], [], [], [], []
    expected = []
    for i in range(n):
        nf = int(rng.integers(4, 9))
        fw, fh = int(rng.integers(36, 64)), int(rng.integers(36, 64))
        fps_ = int(rng.integers(5, 25))
        yy, xx = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        a1, a2 = float(rng.uniform(60, 200)), float(rng.uniform(60, 200))
        ph1, ph2 = float(rng.uniform(0, 6)), float(rng.uniform(0, 6))
        u1, u2 = float(rng.uniform(3.0, 14.0)), float(rng.uniform(3.0, 14.0))
        th1, th2 = float(rng.uniform(0, np.pi)), float(rng.uniform(0, np.pi))
        g1 = (yy * np.cos(th1) + xx * np.sin(th1)) / u1
        g2 = (yy * np.cos(th2) + xx * np.sin(th2)) / u2
        frames = []
        for f in range(nf):
            img = np.clip(
                np.stack(
                    [
                        a1 * (0.5 + 0.5 * np.sin(g1 + ph1 + f * 0.3)),
                        a2 * (0.5 + 0.5 * np.cos(g2 + ph2 + f * 0.2)),
                        (yy + xx) * (90.0 / max(fh + fw - 2, 1)) + f * 4.0,
                    ],
                    axis=2,
                )
                + rng.normal(0, 3, (fh, fw, 3)),
                0,
                255,
            ).astype(np.uint8)
            frames.append(img)
        payload = encode_avi_mjpeg(frames, fps=fps_)
        ids.append(i)
        urls.append(f"https://media.example/v{i}")
        kinds.append("video")
        payloads.append(payload)
        metas.append(
            {"width": fw, "height": fh, "duration_ms": nf * 1000 // fps_,
             "codec": "mjpeg"}
        )
        if i % 2 == 0:  # lossy transcode dup: decode + re-encode q70
            jbs, fps2, _w, _h = parse_avi_mjpeg(payload)
            re_frames = [decode_jpeg(jb) for jb in jbs]
            dup = encode_avi_mjpeg(
                [encode_jpeg(fr, quality=85) for fr in re_frames], fps=fps2
            )
            ids.append(i + 300_000)
            urls.append(f"https://media.example/v{i}#vdup")
            kinds.append("video")
            payloads.append(dup)
            metas.append(metas[-1])
            expected.append((i, i + 300_000))
    t = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas),
        }
    )
    return t, expected


# ---------------------------------------------------------------------------
# Shared banded-hamming candidate/verify kernel (image pHash, audio FP,
# video FP all ride this one helper — round-4 verdict #2)
# ---------------------------------------------------------------------------

MEDIA_BUCKET_CAP = 64  # all-pairs below; star edges to the min id above


def banded_hamming_pairs(
    hashed,
    hash_col: str,
    n_bands: int,
    band_bits: int,
    threshold: int,
    n_rows_est: int,
    id_col: str = "media_id",
    bucket_cap: int = MEDIA_BUCKET_CAP,
):
    """Near-duplicate pairs over an integer fingerprint column via
    multi-index hashing (Manku et al. '07): explode each fingerprint
    into ``n_bands`` exact-match bands of ``band_bits`` bits, group by
    band key, emit candidate pairs, dedup with a keyed two-phase count
    (``n_bands_hit``), verify with a vectorised SWAR popcount at
    ``hamming <= threshold``.  Returns (a, b, hamming, n_bands_hit)
    sorted by (a, b) with a < b.

    Scale guards (mirrors ``stages.dedup.minhash_candidate_pairs``):

    * **Star-edge bucket cap** — a band bucket with m <= ``bucket_cap``
      members emits the full m(m-1)/2 clique; a hot bucket (a template
      fingerprint shared by a boilerplate cluster) emits O(m) star
      edges to its min-id member instead, preserving the connected
      component for clustering while bounding pair output linearly.
    * **Count-scaled coarse groups** — never one pandas DataFrame per
      fine bucket and never a shuffle keyed on a bounded fine-key
      space: rows shuffle into ``coarse_width(n_rows_est)`` groups
      (population per group bounded by construction) and fine runs are
      found inside each group with one vectorised lexsort.

    Band sizing vs recall: disjoint exact-match bands guarantee recall
    only up to hamming ``n_bands - 1``, so the band count is bound to
    the verify threshold, not to the key-space size one might want at
    scale.  Pick the widest bands the threshold permits (e.g. a
    hamming<=2 verifier over 60-bit fingerprints can use 3x20-bit
    bands: 3.1M-slot key space, recall still guaranteed); a
    hamming<=10 verifier over 64 bits is stuck at 8x8-bit bands — at
    real corpus scale the fix is a longer fingerprint (256-bit pHash
    with 16-bit bands), not wider bands over 64 bits.
    """
    import pandas as pd

    from hexscape_ray.stages.agg import two_phase_sum
    from hexscape_ray.stages.dedup import _pairs_via_groups, coarse_width

    mask = np.uint64((1 << band_bits) - 1)
    n_coarse = coarse_width(n_rows_est)
    coarse_mask = np.int64(n_coarse - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        mid = batch[id_col].to_numpy(zero_copy_only=False)
        h = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = h.view(np.uint64)
        gs, ms, hs = [], [], []
        for b in range(n_bands):
            key = ((u >> np.uint64(band_bits * b)) & mask).astype(np.int64)
            gs.append(np.int64(b << band_bits) | key)
            ms.append(mid)
            hs.append(h)
        g = np.concatenate(gs)
        return pa.table(
            {
                "__g": pa.array(g),
                "__coarse": pa.array(np.bitwise_and(g, coarse_mask)),
                id_col: pa.array(np.concatenate(ms)),
                hash_col: pa.array(np.concatenate(hs)),
            }
        )

    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "a": np.empty(0, np.int64),
            "b": np.empty(0, np.int64),
            "ha": np.empty(0, np.int64),
            "hb": np.empty(0, np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(empty)
        gk = g["__g"].to_numpy()
        ids = g[id_col].to_numpy()
        hv = g[hash_col].to_numpy()
        order = np.lexsort((ids, gk))
        gk, ids, hv = gk[order], ids[order], hv[order]
        new = np.empty(gk.shape[0], dtype=bool)
        new[0] = True
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, gk.shape[0]))
        out_a, out_b, out_ha, out_hb = [], [], [], []
        for s, m in zip(starts[lens >= 2], lens[lens >= 2]):
            run_i = ids[s : s + m]  # lexsort => sorted by id within run
            run_h = hv[s : s + m]
            if m <= bucket_cap:
                i, j = np.triu_indices(int(m), 1)
                out_a.append(run_i[i])
                out_b.append(run_i[j])
                out_ha.append(run_h[i])
                out_hb.append(run_h[j])
            else:  # star edges to the min-id representative
                out_a.append(np.repeat(run_i[0], m - 1))
                out_b.append(run_i[1:])
                out_ha.append(np.repeat(run_h[0], m - 1))
                out_hb.append(run_h[1:])
        if not out_a:
            return pd.DataFrame(empty)
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "ha": np.concatenate(out_ha),
                "hb": np.concatenate(out_hb),
            }
        )

    bands = hashed.map_batches(band_rows, batch_format="pyarrow")
    pair_rows = _pairs_via_groups(bands, n_rows_est, pairs_block)
    pairs = two_phase_sum(
        pair_rows, ["a", "b", "ha", "hb"], [], count_as="n_bands_hit"
    )

    def verify(batch: pa.Table) -> pa.Table:
        ha = batch["ha"].to_numpy(zero_copy_only=False).astype(np.int64)
        hb = batch["hb"].to_numpy(zero_copy_only=False).astype(np.int64)
        ham = popcount64((ha ^ hb).view(np.uint64))
        keep = ham <= threshold
        return pa.table(
            {
                "a": pa.array(
                    batch["a"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
                "b": pa.array(
                    batch["b"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
                "hamming": pa.array(ham[keep]),
                "n_bands_hit": pa.array(
                    batch["n_bands_hit"]
                    .to_numpy(zero_copy_only=False)[keep]
                    .astype(np.int64)
                ),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow").sort(["a", "b"])
