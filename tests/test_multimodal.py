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


def test_png_roundtrip_all_filters():
    """The PNG codec is REAL: byte-exact roundtrip across shapes whose
    heights cover every scanline filter type (the encoder cycles
    y % 5), plus a gradient raster where wrong filter math would show
    instantly, and CRC corruption detection."""
    import numpy as np
    import pytest

    from snowball_java_ray.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for (h, w) in [(8, 8), (5, 3), (1, 1), (16, 2), (2, 16), (11, 7)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, back = decode_png(encode_png(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(back, px)
    g = np.arange(12 * 9 * 3, dtype=np.uint8).reshape(12, 9, 3)
    assert np.array_equal(decode_png(encode_png(g))[2], g)
    blob = bytearray(encode_png(g))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_png_decode_matches_duckdb(ray_session):
    """End-to-end compressed decode loop vs the digest-rule oracle at
    sf0.001 — certifies DEFLATE encode -> ship -> real DECODE ->
    aggregate."""
    import duckdb

    from snowball_java_ray.ops.multimodal import png_decode
    from snowball_java_ray.pipelines.api import collect_arrow
    from snowball_java_ray.sqlgen import png_decode_sql

    sf = "/root/testdata/sf0.001"
    got = collect_arrow(png_decode(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet'"
    )
    want = con.execute(png_decode_sql()).df()
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_decode_rejects_garbage():
    import pytest

    from snowball_java_ray.ops.multimodal import decode_ppm, decode_wav

    with pytest.raises(ValueError):
        decode_ppm(b"nonsense bytes")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_resize_nn_known_pattern():
    """NN resize of a known 2x2 checkerboard to 4x4 replicates each
    source pixel into a 2x2 block; to 1x1 keeps the top-left pixel."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import resize_nn

    px = np.zeros((2, 2, 3), np.uint8)
    px[0, 0] = [255, 0, 0]
    px[0, 1] = [0, 255, 0]
    px[1, 0] = [0, 0, 255]
    px[1, 1] = [9, 9, 9]
    up = resize_nn(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[0:2, 0:2] == px[0, 0]).all()
    assert (up[0:2, 2:4] == px[0, 1]).all()
    assert (up[2:4, 0:2] == px[1, 0]).all()
    assert (up[2:4, 2:4] == px[1, 1]).all()
    one = resize_nn(px, 1, 1)
    assert (one[0, 0] == px[0, 0]).all()


def test_media_resize_roundtrip(ray_session):
    """media_resize means equal a serial decode+resize recompute."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.multimodal import (
        RESIZE_H,
        RESIZE_W,
        _text_digest,
        decode_ppm,
        encode_ppm,
        media_resize,
        resize_nn,
    )
    from tests.conftest import SF_TINY

    got = media_resize(SF_TINY).to_pandas().set_index("media_id")
    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for _, r in docs.head(20).iterrows():
        _, _, _, px = decode_ppm(encode_ppm(_text_digest(r["text"])))
        small = resize_nn(px, RESIZE_W, RESIZE_H)
        means = small.reshape(-1, 3).astype("float64").mean(axis=0)
        row = got.loc[r["doc_id"]]
        assert abs(row["mean_r"] - round(means[0], 6)) < 1e-9
        assert abs(row["mean_g"] - round(means[1], 6)) < 1e-9
        assert abs(row["mean_b"] - round(means[2], 6)) < 1e-9


def test_audio_decimate_roundtrip(ray_session):
    """Decimated stats equal a serial decode + stride recompute."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.multimodal import (
        DECIMATE_FACTOR,
        _text_digest,
        audio_decimate,
        decode_wav,
        encode_wav,
        wav_samples_for,
    )
    from tests.conftest import SF_TINY

    got = audio_decimate(SF_TINY).to_pandas().set_index("media_id")
    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for _, r in docs.head(20).iterrows():
        n = 64 + int(r["doc_id"]) % 64
        rate, samples = decode_wav(
            encode_wav(wav_samples_for(_text_digest(r["text"]), n))
        )
        dec = samples[::DECIMATE_FACTOR]
        row = got.loc[r["doc_id"]]
        assert row["n_samples"] == len(dec)
        a = np.abs(dec.astype("int64"))
        assert row["max_abs"] == a.max()
        assert abs(row["mean_abs"] - round(float(a.mean()), 6)) < 1e-9
