"""Index-build stages: corpus -> postings -> chunked compressed index.

Replaces the reference's single-threaded DF scan
(/root/reference/snowball/src/vsm/VectorSpaceModel.java:29-53), which
keeps only the df aggregate and discards postings, with a real
inverted-index build per the north rule:

  read_parquet(corpus)
    -> map_batches(explode_postings_batch)        # stateless, vectorized
    -> groupby(["term", "shard"]).map_groups(encode_chunk_group)
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
                "doc_len": pa.array(doc_len, type=pa.int32()),
            }
        )

    return stats


def encode_chunk_group(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn for groupby(["term", "shard"]): encode one posting
    chunk (delta + varbyte) and emit its summary row. Postings are
    sorted by doc_id inside the chunk (required by the codec and by the
    deterministic float summation order of scoring)."""
    g = group.sort_values("doc_id")
    term = g["term"].iloc[0]
    shard = int(g["shard"].iloc[0])
    doc_ids = g["doc_id"].to_numpy(dtype=np.int64)
    tfs = g["tf"].to_numpy(dtype=np.int32)
    dls = g["dl"].to_numpy(dtype=np.int32)
    base = int(doc_ids[0])  # chunk base = first doc (smaller deltas than shard base)
    data = encode_postings(doc_ids, tfs, dls, base=base)
    return pd.DataFrame(
        {
            "term": [term],
            "shard": [shard],
            "base": [base],
            "df": [len(doc_ids)],
            "cf": [int(tfs.sum())],
            "max_tf": [int(tfs.max())],
            "min_dl": [int(dls.min())],
            "data": [data],
        }
    )


def build_postings(corpus_ds, text_col="content", id_col="doc_id",
                   shard_size: int = DEFAULT_SHARD_SIZE):
    """corpus Dataset -> postings Dataset (one row per (term, doc))."""
    return corpus_ds.map_batches(
        make_explode_postings(text_col, id_col, shard_size),
        batch_format="pyarrow",
    )


def build_chunks(postings_ds):
    """postings Dataset -> encoded chunk Dataset. This is the core
    index-build shuffle: hash exchange on (term, shard)."""
    return postings_ds.groupby(["term", "shard"]).map_groups(
        encode_chunk_group, batch_format="pandas"
    )


def build_dictionary(postings_ds):
    """postings Dataset -> (term, df, cf) Dataset. df = row count
    because rows are already unique per (term, doc).

    NOTE: the index path does NOT use this (the dictionary is derived
    from the chunk summary rows — see dictionary_from_chunks — avoiding
    a second full shuffle); it backs the standalone term_df query."""
    from ray.data.aggregate import Count, Sum

    return postings_ds.groupby("term").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="cf")
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
