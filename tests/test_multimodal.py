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


def test_backend_is_stub_here():
    assert DECODE_BACKEND == "fake"  # no PIL in this container


def test_media_fixture_deterministic():
    assert gen_media(n=50).equals(gen_media(n=50))


def test_image_features_schema(media_ds):
    images, _, _ = media_pipeline(media_ds)
    df = images.to_pandas()
    assert {"mean_r", "mean_g", "mean_b", "sharpness", "decode_backend"} <= set(df.columns)
    assert "payload" not in df.columns  # wide binary dropped after decode
    assert (df["decode_backend"] == "fake").all()
    assert df[["mean_r", "mean_g", "mean_b"]].to_numpy().min() >= 0.0


def test_audio_mel_bands(media_ds):
    _, audio, _ = media_pipeline(media_ds)
    df = audio.to_pandas()
    assert len(df) > 0
    assert all(len(v) == 8 for v in df["mel_bands"])


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
