"""Multimodal stage plumbing: schemas, n→m frame expansion,
determinism across parallelism (decode kernels are documented stubs)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from hexscape_ray.stages.multimodal import (
    DECODE_BACKEND,
    gen_media,
    media_pipeline,
)


@pytest.fixture(scope="module")
def media_ds(ray_session):
    return ray.data.from_arrow(gen_media(n=150))


def test_backend_is_native_here():
    # no PIL in this container, but the pure-stdlib png/wav codecs are on
    assert DECODE_BACKEND == "native"


def test_media_fixture_deterministic():
    assert gen_media(n=50).equals(gen_media(n=50))


def test_png_wav_codecs_roundtrip():
    from hexscape_ray.functions.codecs import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    for shape in [(5, 7, 3), (16, 16, 1), (9, 4, 4), (8, 8, 2), (1, 1, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):  # every PNG scanline filter type
            got = decode_png(encode_png(img, filter_type=ft))
            assert got.shape == shape and (got == img).all(), (shape, ft)
    x = rng.integers(-30000, 30000, 4000, dtype=np.int16)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(y * 32768.0, x.astype(np.float64))


def test_image_features_real_decode(media_ds):
    images, _, _ = media_pipeline(media_ds)
    df = images.to_pandas().sort_values("media_id", ignore_index=True)
    assert {"mean_r", "mean_g", "mean_b", "sharpness", "decode_backend"} <= set(df.columns)
    assert "payload" not in df.columns  # wide binary dropped after decode
    # fixture images are real PNG and real baseline JFIF — both decode
    # natively, nothing falls to the fake
    assert set(df["decode_backend"]) == {
        "native-png", "native-jpeg", "native-gif", "native-bmp"
    }
    # cross-check one row against a direct decode of the source payload
    from hexscape_ray.functions.codecs import decode_jpeg, decode_png

    src = gen_media(n=150)
    kinds = src["kind"].to_pylist()
    metas = src["meta"].to_pylist()
    first_img = next(
        i for i, k in enumerate(kinds)
        if k == "image" and metas[i]["codec"] == "png"
    )
    arr = decode_png(src["payload"][first_img].as_py()).astype(np.float64)
    row = df[df["media_id"] == first_img].iloc[0]
    assert np.isclose(row["mean_r"], arr[:, :, 0].mean() / 255.0)
    assert np.isclose(row["mean_g"], arr[:, :, 1].mean() / 255.0)
    meta = src["meta"][first_img].as_py()
    assert arr.shape[:2] == (meta["height"], meta["width"])
    # and one JPEG row: decoded features, not fake hash-stats
    first_jpg = next(
        i for i, k in enumerate(kinds)
        if k == "image" and metas[i]["codec"] == "jpeg"
    )
    jarr = decode_jpeg(src["payload"][first_jpg].as_py()).astype(np.float64)
    jrow = df[df["media_id"] == first_jpg].iloc[0]
    assert jrow["decode_backend"] == "native-jpeg"
    assert np.isclose(jrow["mean_r"], jarr[:, :, 0].mean() / 255.0)
    assert np.isclose(jrow["mean_b"], jarr[:, :, 2].mean() / 255.0)


def test_audio_mel_bands(media_ds):
    _, audio, _ = media_pipeline(media_ds)
    df = audio.to_pandas()
    assert len(df) > 0
    assert all(len(v) == 8 for v in df["mel_bands"])
    # fixture audio mixes real WAV and real FLAC — both decode natively
    assert set(df["decode_backend"]) == {"native-wav", "native-flac"}
    # a dominant sine should concentrate energy: max band >> min band
    b = np.stack(df["mel_bands"].to_numpy())
    assert (b.max(axis=1) > 3 * np.maximum(b.min(axis=1), 1e-12)).all()


def test_video_frame_expansion(media_ds):
    _, _, frames = media_pipeline(media_ds, frames_per_video=4)
    df = frames.to_pandas()
    n_videos = df["media_id"].nunique()
    assert len(df) == n_videos * 4  # exact n→m expansion
    assert set(df["frame_idx"]) == {0, 1, 2, 3}
    assert (df.groupby("media_id")["ts_ms"].apply(lambda s: s.is_monotonic_increasing)).all()


def test_determinism_across_partitioning(ray_session):
    a = ray.data.from_arrow(gen_media(n=90))
    b = ray.data.from_arrow(gen_media(n=90)).repartition(7)
    ia, _, _ = media_pipeline(a)
    ib, _, _ = media_pipeline(b)
    da = ia.to_pandas().sort_values("media_id", ignore_index=True)
    db = ib.to_pandas().sort_values("media_id", ignore_index=True)
    for c in ["mean_r", "mean_g", "mean_b", "sharpness"]:
        assert np.allclose(da[c], db[c], atol=0)


def test_jpeg_roundtrip_near_lossless():
    """quality-100 4:4:4 roundtrip of a smooth gradient is exact to
    ±3 (only DCT float rounding; quant tables ~1), and quality-90
    stays within ±8 — the self-consistency contract of the matched
    encoder/decoder pair (the decoder reads DQT/DHT from the stream,
    so this exercises the full parse→huffman→dequant→IDCT path)."""
    from hexscape_ray.functions.codecs import decode_jpeg, encode_jpeg

    yy, xx = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 17), indexing="ij")
    arr = np.stack([yy * 200 + 20, xx * 200 + 20, (yy + xx) * 100 + 20], axis=2).astype(
        np.uint8
    )
    for q, tol in ((100, 3), (90, 8)):
        dec = decode_jpeg(encode_jpeg(arr, quality=q))
        assert dec.shape == arr.shape
        assert np.abs(dec.astype(int) - arr.astype(int)).max() <= tol


def test_jpeg_golden_blocks():
    """Golden decode: hand-constructed inputs with known pixel answers.
    A constant image must decode EXACTLY (DC-only blocks, zero AC);
    an 8x8 horizontal step decodes with the step edge preserved."""
    from hexscape_ray.functions.codecs import decode_jpeg, encode_jpeg

    const = np.full((16, 16, 3), 137, np.uint8)
    dec = decode_jpeg(encode_jpeg(const, quality=95))
    assert (dec == 137).all()
    # gray constant too (1-component scan path)
    g = np.full((8, 8), 64, np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=95))
    assert dg.shape == (8, 8, 1) and (dg == 64).all()
    step = np.zeros((8, 8), np.uint8)
    step[:, 4:] = 200
    ds_ = decode_jpeg(encode_jpeg(step, quality=100))[:, :, 0].astype(int)
    assert ds_[:, :3].mean() < 30 and ds_[:, 5:].mean() > 170


def test_jpeg_subsampled_and_multi_mcu():
    """4:2:0 chroma subsampling over several MCUs with non-multiple
    dims: luma stays tight, chroma loss bounded on smooth content."""
    from hexscape_ray.functions.codecs import decode_jpeg, encode_jpeg

    yy, xx = np.meshgrid(np.linspace(0, 1, 33), np.linspace(0, 1, 29), indexing="ij")
    arr = np.stack([yy * 180 + 30, xx * 180 + 30, (1 - yy) * 120 + 40], axis=2).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(arr, quality=95, subsample=True))
    assert dec.shape == arr.shape
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert err.max() <= 12 and err.mean() < 3


def test_jpeg_rejects_progressive():
    """A progressive SOF2 stream raises ValueError (the ImageDecoder
    falls back to the labelled fake for those)."""
    import pytest

    from hexscape_ray.functions.codecs import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(np.full((8, 8, 3), 10, np.uint8)))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_image_resizer_real(ray_session):
    """ImageResizer actually resizes decodable payloads: output is a
    valid PNG at the aspect-preserved target box, constant images stay
    exactly constant through decode→bilinear→encode, and meta matches
    the real output dims."""
    from hexscape_ray.functions.codecs import decode_png, encode_jpeg, encode_png
    from hexscape_ray.stages.multimodal import ImageResizer

    const = np.full((64, 32, 3), 99, np.uint8)
    grad = np.tile(np.linspace(0, 255, 48, dtype=np.uint8), (96, 1))[:, :, None]
    grad = np.repeat(grad, 3, axis=2)
    tbl = pa.table(
        {
            "media_id": pa.array([0, 1, 2], type=pa.int64()),
            "kind": pa.array(["image"] * 3),
            "payload": pa.array(
                [encode_png(const), encode_jpeg(grad, quality=95), b"\x00opaque"],
                type=pa.binary(),
            ),
            "meta": pa.array(
                [
                    {"width": 32, "height": 64, "duration_ms": 0, "codec": "png"},
                    {"width": 48, "height": 96, "duration_ms": 0, "codec": "jpeg"},
                    {"width": 800, "height": 600, "duration_ms": 0, "codec": "h264"},
                ]
            ),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(ImageResizer, fn_constructor_args=(16,), batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    assert out["resize_backend"].tolist() == ["native", "native", "meta-only"]
    # row 0: 32x64 -> 8x16, still exactly constant
    a0 = decode_png(out["payload"][0])
    assert a0.shape == (16, 8, 3) and (a0 == 99).all()
    assert out["meta"][0]["width"] == 8 and out["meta"][0]["height"] == 16
    assert out["meta"][1]["codec"] == "png"  # jpeg re-encoded as png
    a1 = decode_png(out["payload"][1])
    assert a1.shape == (16, 8, 3)
    # gradient direction preserved after jpeg->resize->png
    assert a1[:, 0].mean() < a1[:, -1].mean()
    # opaque payload untouched
    assert bytes(out["payload"][2]) == b"\x00opaque"


def test_flac_roundtrip_and_subset_limits():
    """FLAC subset codec: bit-exact roundtrip through fixed+Rice and
    verbatim paths, a hand-built CONSTANT subframe decodes, CRC
    corruption is caught, and LPC subframes raise (labelled-fake
    fallback path)."""
    import pytest

    from hexscape_ray.functions.codecs import (
        _crc8,
        _crc16,
        _FlacBitWriter,
        _utf8_coded,
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(9)
    x = 0.5 * np.sin(2 * np.pi * 300 * np.arange(6000) / 8000.0)
    x += rng.normal(0, 0.01, x.size)
    enc = encode_flac(x, rate=8000)
    y, rate = decode_flac(enc)
    xi = np.clip(np.round(x * 32767.0), -32768, 32767) / 32768.0
    assert rate == 8000 and np.array_equal(y, xi)
    # the sine compresses (fixed+Rice beat verbatim somewhere)
    assert len(enc) < x.size * 2

    # corrupt one payload byte -> frame CRC mismatch
    bad = bytearray(enc)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))

    # hand-build a CONSTANT-subframe frame (encoder never emits one)
    head = bytes(enc[: enc.index(b"\xff\xf8")])  # metadata blocks
    hdr = _FlacBitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(0b0111, 4); hdr.write(0b0000, 4)
    hdr.write(0, 4); hdr.write(0b100, 3); hdr.write(0, 1)
    fh = bytes(hdr.out) + _utf8_coded(0) + (8 - 1).to_bytes(2, "big")
    fh += bytes([_crc8(fh)])
    body = _FlacBitWriter()
    body.write(0, 1); body.write(0, 6); body.write(0, 1)  # CONSTANT
    body.write(1234 & 0xFFFF, 16)
    body.align()
    frame = fh + bytes(body.out)
    frame += _crc16(frame).to_bytes(2, "big")
    # patch total-samples in STREAMINFO is fiddly; decode tolerates
    # total=0 (reads to EOF), so rebuild the header with total 8
    const = encode_flac(np.zeros(8), rate=8000)
    meta_end = const.index(b"\xff\xf8")
    y2, _ = decode_flac(const[:meta_end] + frame)
    assert y2.shape == (8,) and np.allclose(y2, 1234 / 32768.0)

    # LPC subframe type (1xxxxx) is rejected, not faked silently
    lpc_body = _FlacBitWriter()
    lpc_body.write(0, 1); lpc_body.write(0b100000, 6); lpc_body.write(0, 1)
    lpc_body.write(0, 16); lpc_body.align()
    fr2 = fh + bytes(lpc_body.out)
    fr2 += _crc16(fr2).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_flac(const[:meta_end] + fr2)


def test_avi_mjpeg_codec_roundtrip():
    from hexscape_ray.functions.codecs import (
        decode_jpeg,
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    rng = np.random.default_rng(11)
    frames = []
    for f in range(6):
        yy, xx = np.meshgrid(np.arange(20), np.arange(28), indexing="ij")
        img = np.clip(
            np.stack([yy * 9.0 + f * 12, xx * 6.0, (yy + xx) * 4.0], axis=2)
            + rng.normal(0, 5, (20, 28, 3)),
            0,
            255,
        ).astype(np.uint8)
        frames.append(img)
    avi = encode_avi_mjpeg(frames, fps=12)
    jpegs, fps, w, h = parse_avi_mjpeg(avi)
    assert (len(jpegs), fps, w, h) == (6, 12, 28, 20)
    for j, src in zip(jpegs, frames):
        dec = decode_jpeg(j)
        assert dec.shape == src.shape
        assert np.abs(dec.astype(float) - src.astype(float)).mean() < 8
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVEdata")


def test_video_native_mjpeg_frames(media_ds):
    from hexscape_ray.functions.codecs import decode_jpeg

    _, _, frames = media_pipeline(media_ds, frames_per_video=4)
    df = frames.to_pandas()
    # fixture rotates real AVI (mjpeg), real MPEG-1 and pseudo-h264
    assert set(df["decode_backend"]) == {"native-mjpeg", "native-mpeg1", "fake"}
    # backend is per-video consistent and matches the meta codec
    src = gen_media(n=150)
    codec_by_id = {
        r_id: m["codec"]
        for r_id, m, k in zip(
            src["media_id"].to_pylist(), src["meta"].to_pylist(), src["kind"].to_pylist()
        )
        if k == "video"
    }
    want_by_codec = {"mjpeg": "native-mjpeg", "mpeg1": "native-mpeg1", "h264": "fake"}
    for mid, grp in df.groupby("media_id"):
        assert set(grp["decode_backend"]) == {want_by_codec[codec_by_id[mid]]}
    # every native frame payload is a genuine decodable baseline JPEG
    native = df[df["decode_backend"] == "native-mjpeg"]
    assert len(native) > 0
    for p in native["frame_payload"].head(8):
        arr = decode_jpeg(p)
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8


def test_video_frame_features_end_to_end(media_ds):
    from hexscape_ray.stages.multimodal import frame_features

    _, _, frames = media_pipeline(media_ds, frames_per_video=3)
    feats = frame_features(frames).to_pandas()
    # mjpeg frames decode natively through the shared image stage as
    # JPEG; mpeg1 frame samples are lossless PNG re-encodes
    assert set(feats["decode_backend"]) == {"native-jpeg", "native-png", "fake"}
    native = feats[feats["decode_backend"] == "native-jpeg"]
    assert len(native) > 0
    # fixture frames are gradient images: real decode means real means
    assert (native["mean_r"] >= 0).all() and (native["mean_r"] <= 1).all()
    assert native["sharpness"].gt(0).all()
    # per-video frame count preserved through the feature stage
    assert (feats.groupby("media_id").size() == 3).all()


def test_gif_bmp_codecs_roundtrip():
    from hexscape_ray.functions.codecs import (
        _GIF_CUBE, decode_bmp, decode_gif, encode_bmp, encode_gif,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    q = np.minimum(img.astype(np.int64) * 6 // 256, 5)
    expect = _GIF_CUBE[
        (q[:, :, 0] * 36 + q[:, :, 1] * 6 + q[:, :, 2]).ravel()
    ].reshape(21, 33, 3)
    assert np.array_equal(decode_gif(encode_gif(img)), expect)


def test_gif_decoder_reads_real_lzw():
    """The decoder's GROWING-CODE path (dictionary-building LZW, code
    width 9→10→…, the code==len(dic) self-reference case) against a
    real compressing encoder written here — our production encoder
    emits root codes only, so this is the coverage for foreign GIFs."""
    from hexscape_ray.functions.codecs import _GIF_CUBE, decode_gif

    rng = np.random.default_rng(5)
    # low-entropy indices → long LZW matches → dictionary growth
    idx = rng.integers(0, 4, 64 * 64).astype(np.uint8)
    idx[1000:3000] = 2  # a long run to force self-referencing codes
    w = h = 64
    mcs = 8
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    # real LZW: build the dictionary exactly as a decoder expects
    out_codes = [clear]
    dic = {bytes([i]): i for i in range(1 << mcs)}
    nxt = eoi + 1
    cur = b""
    for px in idx.tobytes():
        cand = cur + bytes([px])
        if cand in dic:
            cur = cand
        else:
            out_codes.append(dic[cur])
            if nxt < 4096:
                dic[cand] = nxt
                nxt += 1
            cur = bytes([px])
    out_codes.append(dic[cur])
    out_codes.append(eoi)
    # serialise with growing code width, SYNCHRONISED to the decoder's
    # dictionary: the decoder adds no entry for the first code after a
    # CLEAR, and the dictionary caps at 4096 entries
    bits = bytearray()
    acc = nbits = 0
    width = mcs + 1
    size = eoi + 1
    first = True
    for code in out_codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            size = eoi + 1
            width = mcs + 1
            first = True
        elif code != eoi:
            if first:
                first = False
            elif size < 4096:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
    if nbits:
        bits.append(acc & 0xFF)
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0xF7, 0, 0]) + _GIF_CUBE.tobytes()
    gif += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += b"\x00" + bytes([mcs])
    for s in range(0, len(bits), 255):
        chunk = bits[s : s + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    got = decode_gif(bytes(gif))
    assert np.array_equal(got, _GIF_CUBE[idx].reshape(h, w, 3))


def test_phash_transcode_invariant_and_separated():
    """pHash of a lossless transcode is identical; q70 JPEG re-encode
    stays within hamming 10; unrelated fixture images stay >= 16."""
    from hexscape_ray.functions.codecs import encode_jpeg, encode_png
    from hexscape_ray.stages.multimodal import (
        decode_image_array,
        gen_media_dups,
        phash64,
        phash_batch,
        popcount64,
    )

    t, expected = gen_media_dups(n=120)
    ph = phash_batch(t)
    d = dict(zip(ph["media_id"].to_pylist(), ph["phash"].to_pylist()))
    eset = set(expected)
    for a, b in expected:
        ham = int(popcount64(np.array([d[a] ^ d[b]], dtype=np.int64).view(np.uint64))[0])
        assert ham <= 10, (a, b, ham)
    ids = sorted(d)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if (a, b) in eset:
                continue
            ham = int(
                popcount64(np.array([d[a] ^ d[b]], dtype=np.int64).view(np.uint64))[0]
            )
            assert ham > 10, (a, b, ham)
    # direct kernel property: PNG round-trip of decoded pixels is bit-stable
    arr = decode_image_array(
        t.filter(pa.compute.equal(t["kind"], "image"))["payload"][0].as_py()
    )
    assert phash64(arr) == phash64(decode_image_array(encode_png(arr)))
    ham_q70 = int(
        popcount64(
            np.array(
                [phash64(arr) ^ phash64(decode_image_array(encode_jpeg(arr, quality=70)))],
                dtype=np.int64,
            ).view(np.uint64)
        )[0]
    )
    assert ham_q70 <= 10


def test_image_phash_dups_query_recall(ray_session):
    """The banded pipeline finds exactly the seeded visual dup pairs."""
    from hexscape_ray.pipelines.queries import RAY_QUERIES
    from hexscape_ray.stages.multimodal import gen_media_dups

    _, expected = gen_media_dups(n=200)
    df = RAY_QUERIES["image_phash_dups"]("unused").to_pandas()
    got = set(zip(df["a"].astype(int), df["b"].astype(int)))
    assert got == set(expected)
    assert (df["hamming"] <= 10).all()
    assert (df["n_bands_hit"] >= 1).all()


def test_audio_fp_invariances_and_separation():
    """Spectral fingerprint is identical under lossless transcode and
    volume scaling; unrelated multi-harmonic clips stay hamming >= 3."""
    from hexscape_ray.stages.multimodal import (
        audio_fp_batch,
        gen_media_audio_dups,
        popcount64,
    )

    t, expected = gen_media_audio_dups(n=80)
    fp = audio_fp_batch(t)
    d = dict(zip(fp["media_id"].to_pylist(), fp["afp"].to_pylist()))
    eset = set(expected)
    for a, b in expected:
        assert d[a] == d[b], (a, b)
    ids = sorted(d)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if (a, b) in eset:
                continue
            ham = int(
                popcount64(np.array([d[a] ^ d[b]], dtype=np.int64).view(np.uint64))[0]
            )
            assert ham > 2, (a, b, ham)


def test_audio_fp_dups_query_recall(ray_session):
    """The banded pipeline finds exactly the seeded audio dup pairs."""
    from hexscape_ray.pipelines.queries import RAY_QUERIES
    from hexscape_ray.stages.multimodal import gen_media_audio_dups

    _, expected = gen_media_audio_dups(n=80)
    df = RAY_QUERIES["audio_fp_dups"]("unused").to_pandas()
    got = set(zip(df["a"].astype(int), df["b"].astype(int)))
    assert got == set(expected)
    assert (df["hamming"] <= 2).all()


def test_video_fp_dups_query_recall(ray_session):
    """The banded pipeline finds exactly the seeded lossy-transcode
    video dup pairs (majority-vote pHash; q85 re-encode <= 11 bits,
    unrelated clips >= 13)."""
    from hexscape_ray.pipelines.queries import RAY_QUERIES
    from hexscape_ray.stages.multimodal import gen_media_video_dups

    _, expected = gen_media_video_dups(n=40)
    df = RAY_QUERIES["video_fp_dups"]("unused").to_pandas()
    got = set(zip(df["a"].astype(int), df["b"].astype(int)))
    assert got == set(expected)
    assert (df["hamming"] <= 11).all()
    assert (df["n_bands_hit"] >= 3).all()


def test_banded_pairs_hot_bucket_cap(ray_session):
    """A bucket hotter than the cap emits O(m) star edges, not the
    m(m-1)/2 clique: m identical fingerprints (m > cap) must yield
    exactly m-1 pairs, all anchored at the min id (round-4 verdict #2:
    the media pair generators share the text path's blow-up guard)."""
    import ray as _ray

    from hexscape_ray.stages.multimodal import (
        MEDIA_BUCKET_CAP,
        banded_hamming_pairs,
    )

    m = MEDIA_BUCKET_CAP + 36  # one hot bucket, clearly past the cap
    ids = np.arange(m, dtype=np.int64)
    hashes = np.full(m, 0x1234_5678_9ABC_DEF0, dtype=np.int64)
    hashed = _ray.data.from_arrow(
        pa.table({"media_id": pa.array(ids), "phash": pa.array(hashes)})
    )
    df = banded_hamming_pairs(
        hashed, "phash", n_bands=8, band_bits=8, threshold=10, n_rows_est=m * 8
    ).to_pandas()
    # star edges: every member links to the representative, so the
    # connected component survives while pair output stays linear
    assert len(df) == m - 1
    assert (df["a"] == 0).all()
    assert set(df["b"]) == set(range(1, m))
    assert (df["hamming"] == 0).all()
    assert (df["n_bands_hit"] == 8).all()


def test_banded_pairs_subcap_full_clique(ray_session):
    """Below the cap the full clique is emitted (no behaviour change
    for normal buckets)."""
    import ray as _ray

    from hexscape_ray.stages.multimodal import banded_hamming_pairs

    m = 5
    ids = np.arange(m, dtype=np.int64)
    hashes = np.full(m, -42, dtype=np.int64)
    hashed = _ray.data.from_arrow(
        pa.table({"media_id": pa.array(ids), "afp": pa.array(hashes)})
    )
    df = banded_hamming_pairs(
        hashed, "afp", n_bands=3, band_bits=20, threshold=2, n_rows_est=m * 3
    ).to_pandas()
    assert len(df) == m * (m - 1) // 2
    assert (df["n_bands_hit"] == 3).all()


def test_mpeg1_roundtrip_lossy_bound():
    """encode_mpeg1 -> decode_mpeg1 reconstructs every frame within a
    tight lossy bound (default qscale): real DCT/quant/VLC pipeline,
    not a stub."""
    from hexscape_ray.functions.codecs import decode_mpeg1, encode_mpeg1

    rng = np.random.default_rng(11)
    frames = []
    for i in range(4):
        yy, xx = np.mgrid[0:45, 0:61]
        fr = np.stack(
            [
                (xx * 3 + i * 17) % 256,
                (yy * 5 + i * 5) % 256,
                np.clip((yy + xx) * 2 + rng.normal(0, 6, (45, 61)), 0, 255),
            ],
            axis=2,
        ).astype(np.uint8)
        frames.append(fr)
    bs = encode_mpeg1(frames, fps=25)
    assert bs[:4] == b"\x00\x00\x01\xb3"  # sequence header start code
    assert bs[-4:] == b"\x00\x00\x01\xb7"  # sequence end
    dec, fps = decode_mpeg1(bs)
    assert fps == 25 and len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert b.shape == a.shape and b.dtype == np.uint8
        err = np.abs(a.astype(int) - b.astype(int))
        assert err.mean() < 6.0 and err.max() <= 48, (err.mean(), err.max())


def test_mpeg1_rejects_non_intra_and_garbage():
    from hexscape_ray.functions.codecs import decode_mpeg1, encode_mpeg1

    with pytest.raises(ValueError):
        decode_mpeg1(b"\x00" * 32)
    # flip the picture_coding_type of a valid stream to P (2) and
    # assert the loud failure instead of silent garbage
    fr = [np.zeros((16, 16, 3), dtype=np.uint8)]
    bs = bytearray(encode_mpeg1(fr))
    pic = bs.find(b"\x00\x00\x01\x00")
    # picture header: 10 bits temporal ref then 3 bits type at bit 10
    # byte layout after start code: TTTTTTTT TTCCCxxx
    bs[pic + 5] = (bs[pic + 5] & 0b11000111) | (2 << 3)
    with pytest.raises(ValueError):
        decode_mpeg1(bytes(bs))


def test_video_fp64_mpeg1_support():
    """video_fp64 fingerprints MPEG-1 streams for real: deterministic,
    and identical frame content in the same container hashes
    identically."""
    from hexscape_ray.functions.codecs import encode_mpeg1
    from hexscape_ray.stages.multimodal import video_fp64

    yy, xx = np.mgrid[0:32, 0:48]
    frames = [
        np.stack([(xx * 4 + f * 9) % 256, (yy * 6) % 256, (xx + yy) % 256], axis=2)
        .astype(np.uint8)
        for f in range(5)
    ]
    p = encode_mpeg1(frames, fps=30)
    fp = video_fp64(p)
    assert fp is not None and fp == video_fp64(p)
    assert video_fp64(encode_mpeg1(frames, fps=30)) == fp


def test_banded_pairs_recall_guarantee(ray_session):
    """Multi-index-hashing recall contract: ANY pair within hamming <=
    n_bands - 1 shares at least one exact band, so the kernel must
    find it (seeded random fingerprints, planted perturbations)."""
    import ray as _ray

    from hexscape_ray.stages.multimodal import banded_hamming_pairs

    rng = np.random.default_rng(123)
    n = 60
    base = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    all_ids, all_h, expected = [], [], []
    for i, h in enumerate(base):
        all_ids.append(2 * i)
        all_h.append(int(h))
        k = int(rng.integers(0, 8))  # hamming 0..7 = n_bands-1
        u = int(h) & ((1 << 64) - 1)  # flip in the uint64 domain
        for b in rng.choice(64, size=k, replace=False):
            u ^= 1 << int(b)
        flip = u - (1 << 64) if u >= (1 << 63) else u
        all_ids.append(2 * i + 1)
        all_h.append(flip)
        expected.append((2 * i, 2 * i + 1))
    hashed = _ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(all_ids, type=pa.int64()),
                "phash": pa.array(all_h, type=pa.int64()),
            }
        )
    )
    df = banded_hamming_pairs(
        hashed, "phash", n_bands=8, band_bits=8, threshold=7,
        n_rows_est=len(all_ids) * 8,
    ).to_pandas()
    got = set(zip(df["a"].astype(int), df["b"].astype(int)))
    missed = [p for p in expected if p not in got]
    assert not missed, missed
