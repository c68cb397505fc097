"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are NOT in this container, so the
decode kernels are STUBS — ``DecodeImage.decode_real`` raises
NotImplementedError and the pipeline runs a clearly-marked
deterministic fake decoder instead. Everything AROUND the decode is
real and tested: the Arrow schema for binary media columns, actor-pool
stage shape (model/codec "loaded" once per actor), small-batch sizing
for wide binary rows, and the feature-output layout.

Production notes (the parts that matter at 100 TB):
- media bytes ride as ``binary`` columns; ``batch_size`` must be sized
  by BYTES not rows (here 32 rows/batch as wide-row default) and
  ``target_max_block_size`` raised so blocks aren't split absurdly
  small (ray_guide pitfalls).
- decode/resize/embed are actor pools (codec contexts, model weights
  loaded in ``__init__``), ``num_cpus`` per actor sized to the codec's
  threading.
- frame sampling emits multiple rows per video (flat-map shape).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(
            np.uint8
        ).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["payload"].append(payload)
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(64 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 2000)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool decode + feature-extract stage.

    __init__ = the once-per-actor setup (codec/model load — stubbed);
    __call__ = per-batch vectorized work. Output: fixed-dim float
    feature vector + basic decoded metadata per row."""

    def __init__(self, use_real_decoder: bool = False):
        self.use_real = use_real_decoder
        # model/codec load would happen HERE, once per actor
        self.fake_proj = np.linspace(0.0, 1.0, FEATURE_DIM)

    @staticmethod
    def decode_real(payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "plug Pillow/torchvision here in production"
        )

    def decode_fake(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in: features derived from sha256 bytes."""
        h = np.frombuffer(
            hashlib.sha256(payload).digest()[:FEATURE_DIM], dtype=np.uint8
        )
        return h.astype(np.float64) / 255.0 + self.fake_proj * 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            (self.decode_real if self.use_real else self.decode_fake)(p)
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], pa.int64()
                ),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def frame_sample(batch: pa.Table, every_ms: int = 500) -> pa.Table:
    """Flat-map shape: one row per sampled frame of each video row."""
    out = {"media_id": [], "frame_idx": [], "ts_ms": []}
    for mid, kind, dur in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["duration_ms"].to_pylist(),
    ):
        if kind != "video":
            continue
        for j, ts in enumerate(range(0, dur, every_ms)):
            out["media_id"].append(mid)
            out["frame_idx"].append(j)
            out["ts_ms"].append(ts)
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "ts_ms": pa.array(out["ts_ms"], pa.int32()),
        }
    )


def media_features_pipeline(n: int = 60, concurrency: int = 2) -> ray.data.Dataset:
    """media table -> actor-pool decode/feature stage. Small batch_size
    because rows are wide (binary payloads)."""
    ds = ray.data.from_arrow(synth_media_table(n))
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )


def frame_sample_pipeline(n: int = 60) -> ray.data.Dataset:
    ds = ray.data.from_arrow(synth_media_table(n))
    return ds.map_batches(frame_sample, batch_format="pyarrow")
