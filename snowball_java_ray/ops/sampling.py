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
