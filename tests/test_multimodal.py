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


def test_jpeg_constant_blocks_lossless_all_values():
    """Constant 8x8 blocks are the lossless fixed point of the DCT
    round-trip (all AC = 0; DC exact at Q_dc = 8) — verified for every
    possible byte value, which is what licenses the exact SQL oracle
    of the jpeg_decode entry."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for v in range(256):
        px = np.full((8, 8), v, np.uint8)
        w, h, back = decode_jpeg_gray(encode_jpeg_gray(px))
        assert (w, h) == (8, 8)
        assert np.array_equal(back, px), v


def test_jpeg_general_images_match_independent_reference():
    """The bitstream layer (zigzag, Annex K Huffman, DC prediction,
    byte stuffing) is checked bit-for-bit: decode(encode(px)) must
    equal a reference computed HERE from scratch — independent DCT
    basis, quantize, dequantize, IDCT — so any entropy-coding bug
    would desynchronize the coefficients and fail."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import (
        _JPEG_QTAB,
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    # test-local DCT basis (written independently of the codec's)
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    T *= 0.5
    T[0] /= np.sqrt(2.0)

    rng = np.random.default_rng(11)
    for (h, w) in [(8, 8), (16, 16), (24, 32), (8, 40)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        _, _, back = decode_jpeg_gray(encode_jpeg_gray(px))
        exp = np.zeros_like(px)
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = (
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                        np.float64
                    )
                    - 128.0
                )
                q = np.round((T @ blk @ T.T) / _JPEG_QTAB)
                rec = T.T @ (q * _JPEG_QTAB) @ T + 128.0
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(rec), 0, 255
                )
        assert np.array_equal(back, exp), (h, w)


def test_jpeg_crafted_coefficients_exercise_zrl_and_eob():
    """Drive the entropy layer with coefficient vectors natural images
    rarely produce: a 39-zero run (two ZRLs), a nonzero in the very
    last zigzag slot (no EOB), and negative DC prediction across
    blocks."""
    import numpy as np

    from snowball_java_ray.ops.multimodal import (
        _DCT_T,
        _JPEG_QTAB,
        _ZIGZAG,
        decode_jpeg_gray,
        jpeg_container,
    )

    blocks = np.zeros((2, 64), np.int32)
    blocks[0][_ZIGZAG[0]] = 5
    blocks[0][_ZIGZAG[40]] = -3
    blocks[1][_ZIGZAG[0]] = -7
    blocks[1][_ZIGZAG[63]] = 1
    w, h, back = decode_jpeg_gray(jpeg_container(blocks, 8, 16))
    assert (w, h) == (16, 8)
    exp = np.zeros((8, 16), np.uint8)
    for x0, blkc in [(0, blocks[0]), (8, blocks[1])]:
        f = blkc.reshape(8, 8).astype(np.float64) * _JPEG_QTAB
        rec = _DCT_T.T @ f @ _DCT_T + 128.0
        exp[:, x0 : x0 + 8] = np.clip(np.round(rec), 0, 255)
    assert np.array_equal(back, exp)


def test_jpeg_rejects_corruption():
    import numpy as np
    import pytest

    from snowball_java_ray.ops.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    blob = encode_jpeg_gray(np.full((8, 8), 77, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[:40])  # truncated mid-header
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"garbage")


def test_jpeg_decode_matches_duckdb(ray_session):
    """End-to-end lossy-codec loop vs the digest-rule oracle at
    sf0.001 — certifies DCT/Huffman encode -> ship -> real entropy
    DECODE -> aggregate."""
    import duckdb

    from snowball_java_ray.ops.multimodal import jpeg_decode
    from snowball_java_ray.pipelines.api import collect_arrow
    from snowball_java_ray.sqlgen import jpeg_decode_sql

    sf = "/root/testdata/sf0.001"
    got = collect_arrow(jpeg_decode(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet'"
    )
    want = con.execute(jpeg_decode_sql()).df()
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_mp4_mux_demux_roundtrip_multichunk():
    """The demuxer's chunk walk (stsc runs + stco offsets + stsz
    cumulative spans) must reconstruct every frame byte-exactly,
    across frame counts that produce even chunks, a short last chunk,
    and a single chunk."""
    import hashlib

    from snowball_java_ray.ops.multimodal import (
        MP4_FRAME_DUR,
        MP4_TIMESCALE,
        demux_mp4,
        encode_mp4,
        mp4_frames_for,
    )

    for doc_id in range(16):  # n = 4..11 frames -> 2..4 chunks
        d = hashlib.sha256(f"t{doc_id}".encode()).digest()
        frames = mp4_frames_for(d, doc_id)
        w, h = 64 + doc_id % 4 * 16, 48 + doc_id % 3 * 16
        m = demux_mp4(encode_mp4(frames, w, h))
        assert m["samples"] == frames
        assert (m["width"], m["height"]) == (w, h)
        assert m["timescale"] == MP4_TIMESCALE
        assert m["duration"] == len(frames) * MP4_FRAME_DUR


def test_mp4_demux_handles_largesize_and_rejects_corruption():
    import hashlib
    import struct

    import pytest

    from snowball_java_ray.ops.multimodal import (
        demux_mp4,
        encode_mp4,
        mp4_frames_for,
    )

    d = hashlib.sha256(b"large").digest()
    frames = mp4_frames_for(d, 5)
    buf = encode_mp4(frames, 64, 48)
    # rewrite the free box as a 64-bit largesize box: same span, the
    # walker must consume size==1 + 8-byte largesize correctly
    i = buf.find(b"free") - 4
    size32 = struct.unpack_from(">I", buf, i)[0]
    body = buf[i + 8 : i + size32]
    # keep total length identical so stco offsets stay valid: the
    # largesize header is 8 bytes bigger, so drop 8 payload bytes
    large = (
        struct.pack(">I", 1) + b"free"
        + struct.pack(">Q", 8 + 8 + len(body) - 8) + body[:-8]
    )
    buf2 = buf[:i] + large + buf[i + size32:]
    assert len(buf2) == len(buf)
    m = demux_mp4(buf2)
    assert m["samples"] == frames

    with pytest.raises(ValueError):
        demux_mp4(buf[:60])
    with pytest.raises(ValueError):
        demux_mp4(buf.replace(b"stco", b"xtco", 1))
    # stsz count mismatch must raise, not mis-slice
    j = buf.find(b"stsz")
    bad = bytearray(buf)
    struct.pack_into(">I", bad, j + 12, len(frames) + 1)
    with pytest.raises(ValueError):
        demux_mp4(bytes(bad))


def test_mp4_demux_matches_duckdb(ray_session):
    """End-to-end container-demux loop vs the digest-rule oracle at
    sf0.001 — certifies mux (multi-chunk sample tables) -> ship ->
    box-walk DEMUX -> chunk-walk extraction -> aggregate."""
    import duckdb

    from snowball_java_ray.ops.multimodal import mp4_demux
    from snowball_java_ray.pipelines.api import collect_arrow
    from snowball_java_ray.sqlgen import mp4_demux_sql

    sf = "/root/testdata/sf0.001"
    got = collect_arrow(mp4_demux(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet'"
    )
    want = con.execute(mp4_demux_sql()).df()
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_mp4_demux_rejects_forged_counts_cheaply_and_picks_video_trak():
    """Corruption-triage hardening (r5 self-review): forged 32-bit
    table counts must raise ValueError BEFORE any allocation sized by
    them (a 1 KB payload must not demand gigabytes), and a multi-track
    file with an audio trak listed first must still parse the VIDEO
    trak's sample tables."""
    import hashlib
    import struct
    import time

    import pytest

    from snowball_java_ray.ops.multimodal import (
        _box,
        _fullbox,
        demux_mp4,
        encode_mp4,
        mp4_frames_for,
    )

    buf = encode_mp4(mp4_frames_for(hashlib.sha256(b"x").digest(), 5), 64, 48)
    i_stts = buf.find(b"stts")
    i_stsz = buf.find(b"stsz")

    # (a) fixed-size path: stts cnt and stsz nz both forged to 2^32-1
    bad = bytearray(buf)
    struct.pack_into(">I", bad, i_stts + 12, 2**32 - 1)
    struct.pack_into(">II", bad, i_stsz + 8, 7, 2**32 - 1)
    t0 = time.time()
    with pytest.raises(ValueError):
        demux_mp4(bytes(bad))
    assert time.time() - t0 < 1.0  # rejected by bounds, not by OOM

    # (b) variable-size path: nz far beyond the stsz box body
    bad2 = bytearray(buf)
    struct.pack_into(">I", bad2, i_stts + 12, 2_000_000)
    struct.pack_into(">II", bad2, i_stsz + 8, 0, 2_000_000)
    with pytest.raises(ValueError):  # ValueError, never struct.error
        demux_mp4(bytes(bad2))

    # (c) leading audio trak (hdlr 'soun') must not be mistaken for
    # the video track
    i_moov = buf.rfind(b"moov") - 4
    moov_size = struct.unpack_from(">I", buf, i_moov)[0]
    moov_body = buf[i_moov + 8 : i_moov + moov_size]
    hdlr_a = _fullbox(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"Sound\x00",
    )
    audio_trak = _box(b"trak", _box(b"mdia", hdlr_a))
    buf3 = buf[:i_moov] + _box(b"moov", audio_trak + moov_body)
    m = demux_mp4(buf3)
    assert (m["width"], m["height"], m["timescale"]) == (64, 48, 90000)
