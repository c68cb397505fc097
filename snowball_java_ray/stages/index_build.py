"""Index-build stages: corpus -> postings -> chunked compressed index.

Replaces the reference's single-threaded DF scan
(/root/reference/snowball/src/vsm/VectorSpaceModel.java:29-53), which
keeps only the df aggregate and discards postings, with a real
inverted-index build per the north rule:

  read_parquet(corpus)
    -> map_batches(make_partial_chunks)   # tokenize + pack per-(term,shard)
    -> groupby(hash(term, shard) % P)     # low-cardinality partition id
    -> map_groups(merge_encode_partition) # all of a partition's groups in
                                          # one tight Arrow-sorted loop
    -> chunk rows (term, shard, base, df, cf, max_tf, min_dl, data)

Skew handling (explicit, north-rule item): the shuffle key is
``(term, shard)`` with ``shard = doc_id // shard_size``, so a
stop-word-class term occurring in nearly every document is split into
bounded chunks instead of one giant group — no single reduce task ever
sees more than ``shard_size`` postings for one term. Chunks double as
the block-max WAND skip structure (per-chunk ``max_tf`` / ``min_dl``
give a per-chunk BM25 upper bound). At cluster scale shard_size ~1M
keeps an encoded chunk at a few MB; doc_id ranges partition cleanly
across nodes so chunk outputs can be written per-shard for resumable
layout.

The dictionary (term -> global df, cf) is a second, tiny aggregate over
the per-(term,doc) rows — the partial-aggregation-before-shuffle
pattern: tf is already combined per (doc, term) inside the map stage
(pyarrow hash group_by per batch), so the shuffle moves one row per
(term, doc), never one row per token occurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from snowball_java_ray.constants import DEFAULT_SHARD_SIZE
from snowball_java_ray.functions.codec import encode_postings
from snowball_java_ray.functions.text import (
    sha256_hex,
    term_frequencies,
    tokenize_arrow,
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int64()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
    ]
)

CHUNK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int64()),
        ("base", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("data", pa.binary()),
    ]
)


def make_explode_postings(
    text_col: str = "content",
    id_col: str = "doc_id",
    shard_size: int = DEFAULT_SHARD_SIZE,
):
    """Stateless map_batches fn: corpus batch -> (term, shard, doc_id,
    tf, dl) rows, tf pre-combined per (doc, term) within the batch
    (partial aggregation before the shuffle)."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx, toks = tokenize_arrow(texts)
        tf_row, terms, tfs, doc_len = term_frequencies(row_idx, toks, len(batch))
        out_doc = doc_ids[tf_row]
        return pa.table(
            {
                "term": terms,
                "shard": pa.array(out_doc // shard_size, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "tf": pa.array(tfs, type=pa.int32()),
                "dl": pa.array(doc_len[tf_row], type=pa.int32()),
            },
            schema=POSTINGS_SCHEMA,
        )

    return explode


def make_doc_stats(text_col: str = "content", id_col: str = "doc_id"):
    """Stateless map_batches fn: corpus batch -> (doc_id,
    content_sha256, doc_len). Carries the input_hint sha256 invariant;
    doc_len counts post-normalization tokens (BM25's dl)."""

    def stats(batch: pa.Table) -> pa.Table:
        row_idx, toks = tokenize_arrow(batch[text_col])
        n = len(batch)
        doc_len = np.bincount(row_idx, minlength=n).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "content_sha256": pa.array(sha256_hex(batch[text_col])),
                # int64 to match the SQL oracle's BIGINT count
                "doc_len": pa.array(doc_len.astype("int64"), type=pa.int64()),
            }
        )

    return stats


def build_postings(corpus_ds, text_col="content", id_col="doc_id",
                   shard_size: int = DEFAULT_SHARD_SIZE):
    """corpus Dataset -> postings Dataset (one row per (term, doc))."""
    return corpus_ds.map_batches(
        make_explode_postings(text_col, id_col, shard_size),
        batch_format="pyarrow",
    )


PARTIAL_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int64()),
        ("blob", pa.binary()),  # packed (doc_ids int64 | tfs int32 | dls int32)
        ("n", pa.int32()),
    ]
)


def _pack_partial(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    return (
        doc_ids.astype("<i8").tobytes()
        + tfs.astype("<i4").tobytes()
        + dls.astype("<i4").tobytes()
    )


def _unpack_partial(blob: bytes, n: int):
    doc_ids = np.frombuffer(blob, dtype="<i8", count=n)
    tfs = np.frombuffer(blob, dtype="<i4", count=n, offset=8 * n)
    dls = np.frombuffer(blob, dtype="<i4", count=n, offset=12 * n)
    return doc_ids, tfs, dls


def make_partial_chunks(
    text_col: str = "content",
    id_col: str = "doc_id",
    shard_size: int = DEFAULT_SHARD_SIZE,
):
    """Map-side combiner: tokenize the batch and pack its postings per
    (term, shard) into ONE binary row each. The subsequent shuffle
    moves one row per (term, shard, map task) instead of one row per
    posting — at 13M postings / 64 tasks this is a ~1000x reduction in
    shuffled rows, the make-or-break combiner for the groupby at 100 TB
    (ray_guide: 'pre-aggregate first')."""
    explode = make_explode_postings(text_col, id_col, shard_size)

    def fn(batch: pa.Table) -> pa.Table:
        p = explode(batch)
        terms = p["term"].to_numpy(zero_copy_only=False)
        shards = p["shard"].to_numpy(zero_copy_only=False)
        doc_ids = p["doc_id"].to_numpy(zero_copy_only=False)
        tfs = p["tf"].to_numpy(zero_copy_only=False)
        dls = p["dl"].to_numpy(zero_copy_only=False)
        # group rows by (term, shard) via lexsort; docs ascending within
        order = np.lexsort((doc_ids, shards, terms))
        terms, shards = terms[order], shards[order]
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        if len(terms) == 0:
            return PARTIAL_SCHEMA.empty_table()
        boundary = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        )
        starts = np.concatenate([[0], boundary + 1])
        ends = np.concatenate([boundary + 1, [len(terms)]])
        out_t, out_s, out_b, out_n = [], [], [], []
        for a, b in zip(starts, ends):
            out_t.append(terms[a])
            out_s.append(int(shards[a]))
            out_b.append(_pack_partial(doc_ids[a:b], tfs[a:b], dls[a:b]))
            out_n.append(int(b - a))
        return pa.table(
            {
                "term": pa.array(out_t),
                "shard": pa.array(out_s, pa.int64()),
                "blob": pa.array(out_b, pa.binary()),
                "n": pa.array(out_n, pa.int32()),
            },
            schema=PARTIAL_SCHEMA,
        )

    return fn


def default_reduce_partitions() -> int:
    """Partition count for the encode reduce: ~8 tasks per CPU so the
    per-partition group loops stay load-balanced (one task per
    partition)."""
    try:
        import ray

        return max(32, 8 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 64


def add_term_shard_partition(t: pa.Table, num_parts: int) -> pa.Table:
    """Stable (term, shard) -> partition routing (md5-based so every
    worker routes a key identically) — the determinism-critical piece
    of the reduce, shared by the build and the compactor."""
    from snowball_java_ray.ops.dedup import md5int60

    terms = t["term"].to_pylist()
    shards = t["shard"].to_numpy(zero_copy_only=False).astype(np.uint64)
    th = np.array([md5int60(x) for x in terms], dtype=np.uint64)
    h = th * np.uint64(1099511628211) ^ shards
    return t.append_column(
        "__part", pa.array((h % np.uint64(num_parts)).astype(np.int64))
    )


def merge_encode_partition(t: pa.Table) -> pa.Table:
    """Encode EVERY (term, shard) group inside one hash partition with
    a tight loop — replaces per-group ``map_groups`` dispatch, which
    pays ~25us of Ray bookkeeping plus a 1-row DataFrame construction
    per group (dominating the reduce once vocab x shards reaches
    millions of groups). Output rows are (term, shard)-sorted within
    the partition."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return CHUNK_SCHEMA.empty_table()
    if "__part" in t.schema.names:
        t = t.drop_columns(["__part"])
    idx = pc.sort_indices(
        t, sort_keys=[("term", "ascending"), ("shard", "ascending")]
    )
    t = t.take(idx)
    terms = t["term"].to_pylist()
    shards = t["shard"].to_numpy(zero_copy_only=False)
    blobs = t["blob"].to_pylist()
    ns = t["n"].to_numpy(zero_copy_only=False)
    out_t, out_s, out_base, out_df, out_cf = [], [], [], [], []
    out_maxtf, out_mindl, out_data = [], [], []
    i, n_rows = 0, len(terms)
    while i < n_rows:
        j = i + 1
        while j < n_rows and terms[j] == terms[i] and shards[j] == shards[i]:
            j += 1
        if j == i + 1:
            doc_ids, tfs, dls = _unpack_partial(blobs[i], int(ns[i]))
            # a single partial is already doc-sorted
        else:
            parts = [
                _unpack_partial(blobs[k], int(ns[k])) for k in range(i, j)
            ]
            doc_ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            order = np.argsort(doc_ids, kind="stable")
            doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        base = int(doc_ids[0])
        out_t.append(terms[i])
        out_s.append(int(shards[i]))
        out_base.append(base)
        out_df.append(len(doc_ids))
        out_cf.append(int(tfs.sum()))
        out_maxtf.append(int(tfs.max()))
        out_mindl.append(int(dls.min()))
        out_data.append(encode_postings(doc_ids, tfs, dls, base=base))
        i = j
    return pa.table(
        {
            "term": pa.array(out_t),
            "shard": pa.array(out_s, pa.int64()),
            "base": pa.array(out_base, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
            "cf": pa.array(out_cf, pa.int64()),
            "max_tf": pa.array(out_maxtf, pa.int32()),
            "min_dl": pa.array(out_mindl, pa.int32()),
            "data": pa.array(out_data, pa.binary()),
        },
        schema=CHUNK_SCHEMA,
    )


def build_chunk_table(
    corpus_ds,
    text_col: str = "content",
    id_col: str = "doc_id",
    shard_size: int = DEFAULT_SHARD_SIZE,
    num_parts: int | None = None,
    coalesce_blocks: int | None = None,
):
    """corpus Dataset -> chunk Dataset via the combiner path: ONE scan,
    then a shuffle of packed partial rows only. The reduce shuffles on
    a LOW-cardinality hash partition of (term, shard) — stable
    md5-based so every worker routes a key identically — and encodes
    all of a partition's groups in one vectorizable task
    (merge_encode_partition)."""
    P = num_parts or default_reduce_partitions()

    partials = corpus_ds.map_batches(
        make_partial_chunks(text_col, id_col, shard_size),
        batch_format="pyarrow",
    )
    # Optionally coalesce the packed partials BEFORE the sort-based
    # groupby: the map stage emits one partial block per tokenize
    # task, and Ray's sort shuffle is all-to-all in BLOCK COUNT
    # (~R x R intermediate objects), so a 16M-doc build fed from 976
    # map blocks paid ~950k shuffle objects — the sort went
    # scheduling-bound (200s of a 262s build, ~11s of parallel
    # compute). Callers whose INPUT block count is already O(100)
    # must leave this off: the repartition is an all-to-all barrier
    # whose resource reservation starves the upstream tokenize at low
    # parallelism (measured: the 8-cpu 4M-doc leg fell 53k -> 20k
    # docs/s with an unconditional coalesce). Prefer sizing the READ
    # block count (~16k docs or ~64MB of partials per block, capped
    # a few hundred); reach for coalesce_blocks only when the input
    # block count can't be controlled at the source.
    if coalesce_blocks:
        partials = partials.repartition(coalesce_blocks, shuffle=False)

    return (
        partials.map_batches(
            lambda t: add_term_shard_partition(t, P),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(merge_encode_partition, batch_format="pyarrow")
    )


def build_dictionary(postings_ds):
    """postings Dataset -> (term, df, cf) Dataset. df = row count
    because rows are already unique per (term, doc).

    NOTE: the index path does NOT use this (the dictionary is derived
    from the chunk summary rows — see dictionary_from_chunks — avoiding
    a second full shuffle); it backs the standalone term_df query.
    Vocabulary cardinality is unbounded at scale, so this uses the
    vectorized hash_grouped_aggregate path (no per-group Python)."""
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    return hash_grouped_aggregate(
        postings_ds,
        ["term"],
        [("", "count_all", "df"), ("tf", "sum", "cf")],
    )


def dictionary_from_chunks(chunks: pa.Table) -> pa.Table:
    """(term, df, cf) from chunk summaries — a tiny driver-side
    aggregate over vocab x shards rows; at web scale this is a
    per-term-range parquet sidecar written by the same reduce tasks."""
    return (
        chunks.select(["term", "df", "cf"])
        .group_by("term")
        .aggregate([("df", "sum"), ("cf", "sum")])
        .rename_columns(["term", "df", "cf"])
    )
