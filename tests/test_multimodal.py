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


def test_ppm_roundtrip():
    """The P6 codec is REAL: encode -> parse returns the exact raster."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import (
        PPM_H,
        PPM_W,
        _text_digest,
        decode_ppm,
        encode_ppm,
    )

    digest = _text_digest("hello world")
    payload = encode_ppm(digest)
    w, h, maxval, px = decode_ppm(payload)
    assert (w, h, maxval) == (PPM_W, PPM_H, 255)
    flat = px.reshape(-1)
    want = np.frombuffer(
        (digest * (len(flat) // 32 + 1))[: len(flat)], np.uint8
    )
    assert np.array_equal(flat, want)


def test_wav_roundtrip():
    """The RIFF/WAVE codec is REAL: encode -> chunk walk returns the
    exact PCM16 samples and sample rate."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import (
        WAV_RATE,
        _text_digest,
        decode_wav,
        encode_wav,
        wav_samples_for,
    )

    samples = wav_samples_for(_text_digest("abc"), 100)
    rate, got = decode_wav(encode_wav(samples))
    assert rate == WAV_RATE
    assert np.array_equal(got, samples)
    # odd-length data chunk padding path
    s3 = wav_samples_for(_text_digest("x"), 3)
    rate, got = decode_wav(encode_wav(s3))
    assert np.array_equal(got, s3)


def test_decode_rejects_garbage():
    import pytest

    from snowball_java_ray.ops.multimodal import decode_ppm, decode_wav

    with pytest.raises(ValueError):
        decode_ppm(b"nonsense bytes")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
