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


def contamination(sf_dir: str, n: int | None = None) -> ray.data.Dataset:
    """Train/test contamination check: for every TEST doc, the fraction
    of its distinct token ``n``-grams that also occur anywhere in the
    TRAIN split — the leakage audit an LLM data pipeline runs before
    the eval set is trusted. Val docs don't participate.

    Scale shape (no driver state, no broadcast of the train set):
      1. one corpus scan emits (doc_id, h=md5int60(ngram), is_train)
         rows for train+test docs — distinct n-grams per doc;
      2. hash-grouped ``max(is_train)`` per h marks which n-grams occur
         in train ("present");
      3. the test-side rows hash-join that marker table on h
         (``bucketed_hash_join`` — both sides hash-partitioned, nothing
         materialized whole);
      4. per-doc Arrow aggregation: n_shingles = count, n_contaminated
         = sum(present).
    The n-gram rows are materialized once (object-store pinned,
    spillable) because steps 2 and 3 both consume them and a shared
    lazy upstream inside a join DAG can deadlock (CLAUDE.md trap).

    Output: (doc_id, n_shingles, n_contaminated, contamination) sorted
    by doc_id; test docs shorter than ``n`` tokens have no n-grams and
    are absent. Oracle: ``sqlgen.contamination_sql`` (bit-identical
    md5 hashes and split rule)."""
    import pyarrow.compute as pc

    from snowball_java_ray.constants import CONTAM_NGRAM
    from snowball_java_ray.ops.dedup import (
        hash_grouped_aggregate,
        join_partitions,
        md5int60,
        shingles,
    )
    from snowball_java_ray.ops.joins import bucketed_hash_join

    if n is None:
        n = CONTAM_NGRAM
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def shingle_rows(t: pa.Table) -> pa.Table:
        u = _hash_unit(t["doc_id"].to_numpy(zero_copy_only=False))
        # 0 = train, 1 = val, 2 = test (same thresholds as assign_split)
        sp = np.where(u < TRAIN_FRAC, 0, np.where(u < TRAIN_FRAC + VAL_FRAC, 1, 2))
        ids: list[int] = []
        hs: list[int] = []
        fl: list[int] = []
        for did, s, text in zip(
            t["doc_id"].to_pylist(), sp.tolist(), t["text"].to_pylist()
        ):
            if s == 1:
                continue
            flag = 1 if s == 0 else 0
            for sh in shingles(text or "", n):
                ids.append(did)
                hs.append(md5int60(sh))
                fl.append(flag)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "is_train": pa.array(fl, pa.int64()),
            }
        )

    rows = docs.map_batches(shingle_rows, batch_format="pyarrow").materialize()
    present = hash_grouped_aggregate(
        rows, keys=["h"], aggs=[("is_train", "max", "present")]
    )
    test_rows = rows.map_batches(
        lambda t: t.filter(pc.equal(t["is_train"], 0)).drop_columns(
            ["is_train"]
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        test_rows, present, "h", "h", n_buckets=join_partitions()
    )
    per_doc = hash_grouped_aggregate(
        joined,
        keys=["doc_id"],
        aggs=[
            ("present", "count", "n_shingles"),
            ("present", "sum", "n_contaminated"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        ratio = pc.round(
            pc.divide(
                pc.cast(t["n_contaminated"], pa.float64()),
                pc.cast(t["n_shingles"], pa.float64()),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_shingles": t["n_shingles"].cast(pa.int64()),
                "n_contaminated": t["n_contaminated"].cast(pa.int64()),
                "contamination": ratio,
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow").sort("doc_id")


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


def weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic importance sampling: keep probability
    p = min(1, n_chars / WEIGHTED_SAMPLE_SCALE) — longer documents are
    proportionally more likely to survive (a quality/length-weighted
    training-mix subsample). Acceptance is hash_unit(doc_id) < p:
    pure per-row function, no RNG state, bit-replicable in SQL and
    across re-runs of any shard — the coordination-free property the
    100 TB ingest needs. Stateless vectorized map, no shuffle."""
    from snowball_java_ray.constants import WEIGHTED_SAMPLE_SCALE

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        u = _hash_unit(ids)
        p = np.minimum(
            1.0,
            t["n_chars"].to_numpy(zero_copy_only=False)
            / WEIGHTED_SAMPLE_SCALE,
        )
        return t.filter(pa.array(u < p))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def doc_deciles(sf_dir: str) -> ray.data.Dataset:
    """Curriculum binning: NTILE(10) over the GLOBAL (doc_len, doc_id)
    order — every document's length decile, computed without any
    single node ever seeing the whole corpus.

    Scale shape: the same two-pass distributed ranking as
    pack_sequences — a range sort on the decile key makes blocks
    contiguous, pass 1 returns one (first-key, count) row per block,
    pass 2 assigns rank = predecessor offset + local position and the
    exact NTILE group (larger groups first, DuckDB/ANSI semantics)
    vectorized per block."""
    from snowball_java_ray.functions.text import tokenize_arrow

    K = 10

    def stats(t: pa.Table) -> pa.Table:
        row_idx, _ = tokenize_arrow(t["text"])
        n = np.bincount(row_idx, minlength=len(t)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "doc_len": pa.array(n, pa.int64()),
            }
        )

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(stats, batch_format="pyarrow")
        .sort(["doc_len", "doc_id"])
        .materialize()
    )

    blocks = []
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(batch):
            blocks.append(
                (
                    (int(batch["doc_len"][0].as_py()),
                     int(batch["doc_id"][0].as_py())),
                    len(batch),
                )
            )
    blocks.sort()
    offsets: dict[tuple[int, int], int] = {}
    run = 0
    for key, cnt in blocks:
        offsets[key] = run
        run += cnt
    n_total = run
    q, rem = divmod(n_total, K)
    cut = rem * (q + 1)  # ranks <= cut land in the (q+1)-sized groups

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "doc_len": pa.array([], pa.int64()),
                    "decile": pa.array([], pa.int64()),
                }
            )
        key = (
            int(t["doc_len"][0].as_py()),
            int(t["doc_id"][0].as_py()),
        )
        rank = offsets[key] + np.arange(1, len(t) + 1, dtype=np.int64)
        if q == 0:
            dec = rank
        else:
            dec = np.where(
                rank <= cut,
                -(-rank // (q + 1)),          # ceil division
                rem + -(-(rank - cut) // q),
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "doc_len": t["doc_len"],
                "decile": pa.array(dec.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).sort("doc_id")
