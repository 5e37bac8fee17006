"""Multimodal stage plumbing: schemas, n→m frame expansion,
determinism across parallelism (decode kernels are documented stubs)."""

import numpy as np
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
    assert (df["decode_backend"] == "native-png").all()  # fixture images are real PNG
    # cross-check one row against a direct decode of the source payload
    from hexscape_ray.functions.codecs import decode_png

    src = gen_media(n=150)
    kinds = src["kind"].to_pylist()
    first_img = kinds.index("image")
    arr = decode_png(src["payload"][first_img].as_py()).astype(np.float64)
    row = df[df["media_id"] == first_img].iloc[0]
    assert np.isclose(row["mean_r"], arr[:, :, 0].mean() / 255.0)
    assert np.isclose(row["mean_g"], arr[:, :, 1].mean() / 255.0)
    meta = src["meta"][first_img].as_py()
    assert arr.shape[:2] == (meta["height"], meta["width"])


def test_audio_mel_bands(media_ds):
    _, audio, _ = media_pipeline(media_ds)
    df = audio.to_pandas()
    assert len(df) > 0
    assert all(len(v) == 8 for v in df["mel_bands"])
    assert (df["decode_backend"] == "native-wav").all()  # fixture audio is real WAV
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
