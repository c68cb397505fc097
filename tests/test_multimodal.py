import numpy as np
import pytest

from snowball_java_ray.ops.multimodal import (
    FEATURE_DIM,
    DecodeImage,
    frame_sample_pipeline,
    media_features_pipeline,
    synth_media_table,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        DecodeImage.decode_real(b"xx")


def test_media_features_pipeline(ray_session):
    out = media_features_pipeline(60).to_pandas()
    assert len(out) == 60
    assert set(out.columns) == {"media_id", "kind", "n_bytes", "feature"}
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # deterministic across runs
    again = media_features_pipeline(60).to_pandas()
    assert all(
        np.array_equal(a, b) for a, b in zip(out["feature"], again["feature"])
    )


def test_frame_sampling(ray_session):
    out = frame_sample_pipeline(60).to_pandas()
    tbl = synth_media_table(60).to_pandas()
    n_videos = (tbl["kind"] == "video").sum()
    assert len(out) == n_videos * 4  # 2000ms / 500ms
    assert out.groupby("media_id")["frame_idx"].max().eq(3).all()
