"""Query-side BM25 scoring over the compressed chunked index.

The stateful stage ST5 from SURVEY.md §2.3: a callable class passed to
``map_batches(BM25Scorer, concurrency=N, batch_size=B)``. Each actor
fetches the (ray.put-broadcast) index ONCE in ``__init__`` and serves
top-k for batches of queries in ``__call__`` — setup per actor, work
per batch.

Scale path (documented, exercised at sandbox scale via multi-chunk
indexes): at 10^12 docs the index is document-sharded — each scorer
actor loads only the chunks and doc_len slice of its doc_id shard
range, every query fans out to all shard actors (scatter), and
``merge_topk`` combines the per-shard heaps (gather). ``merge_topk``
below is exactly that combiner and is unit-tested; in local mode one
actor simply holds every shard.

Determinism (north rule: rank-identical top-k): query terms are scored
in sorted order, postings are accumulated in doc_id order within a
term, ranking key is (round(score, RANK_ROUND_DECIMALS) DESC,
doc_id ASC) — bit-identical to the pure-Python oracle and stable under
repartitioning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from snowball_java_ray.constants import (
    BM25_B,
    BM25_K1,
    RANK_ROUND_DECIMALS,
    SCORE_ROUND_DECIMALS,
    TOP_K,
)
from snowball_java_ray.functions.codec import decode_postings
from snowball_java_ray.functions.text import tokenize

TOPK_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


@dataclass
class _Chunk:
    base: int
    data: bytes
    max_tf: int
    min_dl: int


class InvertedIndex:
    """In-memory view of the chunked compressed index.

    Built from the three index tables (chunks, dictionary, doc stats).
    Postings stay varbyte-compressed until a term is scored.
    """

    def __init__(self, chunks: pa.Table, dictionary: pa.Table, doc_stats: pa.Table):
        self.df: dict[str, int] = dict(
            zip(dictionary["term"].to_pylist(), dictionary["df"].to_pylist())
        )
        self.chunks: dict[str, list[_Chunk]] = {}
        terms = chunks["term"].to_pylist()
        shards = chunks["shard"].to_numpy(zero_copy_only=False)
        order = np.argsort(shards, kind="stable")
        bases = chunks["base"].to_numpy(zero_copy_only=False)
        datas = chunks["data"].to_pylist()
        max_tfs = chunks["max_tf"].to_numpy(zero_copy_only=False)
        min_dls = chunks["min_dl"].to_numpy(zero_copy_only=False)
        for i in order:  # shard-ascending => doc_id-ascending chunk concat
            self.chunks.setdefault(terms[i], []).append(
                _Chunk(int(bases[i]), datas[i], int(max_tfs[i]), int(min_dls[i]))
            )
        doc_ids = doc_stats["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_len = doc_stats["doc_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.argsort(doc_ids, kind="stable")
        self.doc_ids = doc_ids[pos]
        self.doc_len = doc_len[pos]
        self.n_docs = int(len(self.doc_ids))
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        parts = self.chunks.get(term)
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        decoded = [decode_postings(c.data, base=c.base) for c in parts]
        return (
            np.concatenate([d for d, _ in decoded]),
            np.concatenate([t for _, t in decoded]),
        )

    def positions(self, doc_ids: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.doc_ids, doc_ids)


def score_query(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact term-at-a-time BM25 -> (doc_ids, scores) of the top-k,
    deterministically ordered."""
    terms = sorted(set(tokenize(qtext)))
    scores = np.zeros(index.n_docs, dtype=np.float64)
    hit = False
    for t in terms:
        doc_ids, tfs = index.postings(t)
        if doc_ids.size == 0:
            continue
        hit = True
        pos = index.positions(doc_ids)
        dl = index.doc_len[pos]
        tf = tfs.astype(np.float64)
        contrib = index.idf(t) * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / index.avgdl)
        )
        scores[pos] += contrib
    if not hit:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cand = np.flatnonzero(scores)
    rounded = np.round(scores[cand], RANK_ROUND_DECIMALS)
    order = np.lexsort((index.doc_ids[cand], -rounded))[:top_k]
    sel = cand[order]
    return index.doc_ids[sel], scores[sel]


def merge_topk(
    parts: list[tuple[np.ndarray, np.ndarray]], top_k: int = TOP_K
) -> tuple[np.ndarray, np.ndarray]:
    """Combine per-shard top-k lists (the gather step of the
    scatter/gather scale path). Deterministic: same ranking key as
    score_query."""
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    doc_ids = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    rounded = np.round(scores, RANK_ROUND_DECIMALS)
    order = np.lexsort((doc_ids, -rounded))[:top_k]
    return doc_ids[order], scores[order]


def topk_table(query_ids, qtexts, index, k1, b, top_k) -> pa.Table:
    """Score a batch of queries -> TOPK_SCHEMA rows."""
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, qtext in zip(query_ids, qtexts):
        doc_ids, scores = score_query(index, qtext, k1, b, top_k)
        n = len(doc_ids)
        out_q.extend([int(qid)] * n)
        out_r.extend(range(1, n + 1))
        out_d.extend(doc_ids.tolist())
        out_s.extend(np.round(scores, SCORE_ROUND_DECIMALS).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        },
        schema=TOPK_SCHEMA,
    )


class BM25Scorer:
    """Actor-pool scorer stage. ``index_ref`` is a ray.ObjectRef to an
    InvertedIndex (ray.put once on the driver — broadcast, never
    re-shipped per batch)."""

    def __init__(self, index_ref, k1=BM25_K1, b=BM25_B, top_k=TOP_K):
        import ray

        self.index = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.k1, self.b, self.top_k = k1, b, top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return topk_table(
            batch["query_id"].to_pylist(),
            batch["qtext"].to_pylist(),
            self.index,
            self.k1,
            self.b,
            self.top_k,
        )
