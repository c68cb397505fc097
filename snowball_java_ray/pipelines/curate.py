"""Corpus curation: the composed training-data pipeline.

quality filter -> exact dedup -> MinHash-LSH near-dedup, each stage an
existing operator, chained as one streaming Ray Data pipeline — the
"prepare a pretraining corpus" capstone:

1. quality gate: keep docs with >= MIN_TERMS canonical terms and
   stopword_ratio <= MAX_STOP_RATIO (cheap vectorized signals).
2. exact dedup: one survivor (min doc_id) per md5(text).
3. near-dedup: MinHash-LSH candidate pairs among survivors; for every
   pair the larger doc_id is dropped (deterministic survivor rule).

Fully SQL-oracled (sqlgen.curated_corpus_sql) — including the LSH
stage, thanks to the md5-derived minhash family.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from snowball_java_ray.constants import STOPWORD_SET

MIN_TERMS = 5
MAX_STOP_RATIO = 0.5


def _quality_gate(t: pa.Table) -> pa.Table:
    import re

    import numpy as np

    from snowball_java_ray.constants import TOKEN_SPLIT_PATTERN
    from snowball_java_ray.functions.text import tokenize

    split_re = re.compile(TOKEN_SPLIT_PATTERN)
    keep = []
    for x in t["text"].to_pylist():
        x = x or ""
        raw = [w for w in split_re.split(x.lower()) if w]
        n_terms = len(tokenize(x))
        stop_ratio = (
            sum(1 for w in raw if w in STOPWORD_SET) / len(raw) if raw else 0.0
        )
        keep.append(n_terms >= MIN_TERMS and stop_ratio <= MAX_STOP_RATIO)
    return t.filter(pa.array(keep))


def curated_corpus(sf_dir: str) -> ray.data.Dataset:
    """Surviving doc_ids after the three-stage curation."""
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Min

    from snowball_java_ray.ops import dedup as dd

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_quality_gate, batch_format="pyarrow")

    # exact dedup on the quality-filtered set
    def h(t: pa.Table) -> pa.Table:
        digests = [
            hashlib.md5((x or "").encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"content_md5": pa.array(digests), "doc_id": t["doc_id"]})

    exact_survivors = {
        r["keep"]
        for r in docs.map_batches(h, batch_format="pyarrow")
        .groupby("content_md5")
        .aggregate(Min("doc_id", alias_name="keep"))
        .iter_rows()
    }

    # near-dedup: LSH candidates over the whole table; the survivor
    # rule is NON-RECURSIVE so it is order-free and SQL-expressible:
    # drop every doc that is the larger member of any candidate pair
    # whose both ends survived exact dedup. (A transitive-chain rule
    # would need union-find / recursive SQL; this rule over-drops a
    # chain's tail at most — a deterministic, conservative choice.)
    pairs = dd.minhash_lsh_candidates(sf_dir).to_pandas()
    dropped = {
        int(b)
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        if int(a) in exact_survivors and int(b) in exact_survivors
    }
    survivors = sorted(exact_survivors - dropped)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(survivors, pa.int64())})
    )
