"""Deterministic sampling / splitting for training-data pipelines.

Hash-based, not RNG-based: every assignment is a pure function of the
row's key (md5int60, the engine's standard bit-replicable hash), so
splits are reproducible across runs, machines and engines — the DuckDB
oracles replicate them exactly. This is the property a 100 TB corpus
needs: re-running a failed shard reproduces the same split with no
coordination, and train/val/test membership never drifts between
pipeline versions.

Operators:
- ``train_val_test_split``: fractional split on hash(doc_id).
- ``split_counts``: per-split doc and token totals (the audit query).
- ``stratified_sample``: per-language k docs, chosen by hash order —
  deterministic class-balanced subsetting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from snowball_java_ray.ops.dedup import md5int60

# split thresholds on hash(doc_id) / 2^60 in [0, 1)
TRAIN_FRAC = 0.8
VAL_FRAC = 0.1  # test gets the remainder
STRATA_K = 20   # docs kept per language in the stratified sample


def _hash_unit(ids) -> np.ndarray:
    """md5-derived uniform value in [0, 1) per id (bit-replicable in
    SQL: ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT / 2^60)."""
    return np.array(
        [md5int60(str(int(i))) for i in ids], dtype=np.float64
    ) / float(1 << 60)


def assign_split(t: pa.Table) -> pa.Table:
    u = _hash_unit(t["doc_id"].to_numpy(zero_copy_only=False))
    split = np.where(
        u < TRAIN_FRAC, "train", np.where(u < TRAIN_FRAC + VAL_FRAC, "val", "test")
    )
    return t.append_column("split", pa.array(split.tolist()))


def train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, split) assignment — stateless vectorized map."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return ds.map_batches(assign_split, batch_format="pyarrow").sort("doc_id")


def split_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-split doc count + total canonical tokens (the split-audit
    aggregate a data pipeline reports before training)."""
    from ray.data.aggregate import Count, Sum

    from snowball_java_ray.functions.text import tokenize_arrow

    def stats(t: pa.Table) -> pa.Table:
        row_idx, _ = tokenize_arrow(t["text"])
        n_tokens = np.bincount(row_idx, minlength=len(t)).astype(np.int64)
        t2 = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )
        return assign_split(t2)

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(stats, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="total_tokens"),
        )
        .sort("split")
    )


def stratified_sample(sf_dir: str, k: int = STRATA_K) -> ray.data.Dataset:
    """Per-language deterministic k-sample: within each lang keep the k
    docs with the smallest (hash(doc_id), doc_id) — class-balanced,
    reproducible, no RNG. Expressed as a per-group vectorized cut
    (language cardinality is tiny; for unbounded strata the same logic
    runs through the hash-partition pattern)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        u = _hash_unit(g["doc_id"].to_numpy())
        g = g.assign(__u=u).sort_values(["__u", "doc_id"]).head(k)
        return g.drop(columns="__u")

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )
        .groupby("lang")
        .map_groups(pick, batch_format="pandas")
        .sort(["lang", "doc_id"])
    )


SEQ_LEN = 2048  # tokens per packed training sequence


def pack_sequences(sf_dir: str, seq_len: int = SEQ_LEN) -> ray.data.Dataset:
    """Pretraining sequence packing (concatenation style): documents
    concatenate in doc_id order into a single token stream cut into
    fixed seq_len windows; each doc reports its global token offset and
    the sequence its first token lands in.

    The global offset is a DISTRIBUTED PREFIX SUM — the canonical
    two-pass pattern: (1) per-partition token totals (tiny table) come
    back to the driver, (2) each partition adds its predecessor offset
    and cumsums locally. Partitions are contiguous doc_id ranges via a
    range sort, so the result is identical to a serial scan at any
    partition count (and to the SQL window-sum oracle)."""
    from snowball_java_ray.functions.text import tokenize_arrow

    def stats(t: pa.Table) -> pa.Table:
        row_idx, _ = tokenize_arrow(t["text"])
        n_tokens = np.bincount(row_idx, minlength=len(t)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(stats, batch_format="pyarrow")
        .sort("doc_id")  # range partitioning: contiguous doc_id blocks
        .materialize()
    )

    # pass 1: per-block totals + first doc_id (driver sees one row per
    # block — O(partitions), never O(docs))
    blocks = []
    for i, batch in enumerate(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        if len(batch):
            blocks.append(
                (int(batch["doc_id"][0].as_py()),
                 int(np.sum(batch["n_tokens"].to_numpy())))
            )
    blocks.sort()
    offsets: dict[int, int] = {}
    run = 0
    for first_doc, total in blocks:
        offsets[first_doc] = run
        run += total

    # pass 2: local cumsum + predecessor offset (vectorized per block)
    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "token_offset": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        base = offsets[int(t["doc_id"][0].as_py())]
        before = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "token_offset": pa.array(before, pa.int64()),
                "seq_id": pa.array(before // seq_len, pa.int64()),
            }
        )

    # batch_size=None => one batch per BLOCK, matching the pass-1
    # boundaries the offsets were computed for
    return ds.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).sort("doc_id")
