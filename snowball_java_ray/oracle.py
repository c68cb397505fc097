"""Pure-Python single-process exact oracle (SURVEY.md §5.2).

A brute-force dict-based implementation of tokenize -> df/tf -> BM25
top-k, mirroring the reference's in-heap semantics
(/root/reference/snowball/src/vsm/VectorSpaceModel.java:29-106) but
with the engine's analyzer and scoring constants. The Ray pipeline must
match it EXACTLY: df/cf per term, doc_len per doc, and rank-identical
top-k (docIDs and scores) — the north-rule criterion.

Float determinism contract shared with stages/score.py: query terms
scored in sorted order; per-term contributions accumulated per doc;
ranking key (round(score, RANK_ROUND_DECIMALS) DESC, doc_id ASC).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from snowball_java_ray.constants import (
    BM25_B,
    BM25_K1,
    RANK_ROUND_DECIMALS,
    SCORE_ROUND_DECIMALS,
    TOP_K,
)
from snowball_java_ray.functions.text import tokenize


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    df: dict[str, int] = field(default_factory=dict)
    cf: dict[str, int] = field(default_factory=dict)
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)


def build_index(docs: list[tuple[int, str]]) -> OracleIndex:
    idx = OracleIndex()
    for doc_id, text in docs:
        toks = tokenize(text)
        idx.doc_len[doc_id] = len(toks)
        for term, tf in sorted(Counter(toks).items()):
            idx.df[term] = idx.df.get(term, 0) + 1
            idx.cf[term] = idx.cf.get(term, 0) + tf
            idx.postings.setdefault(term, []).append((doc_id, tf))
    for plist in idx.postings.values():
        plist.sort()
    idx.n_docs = len(idx.doc_len)
    idx.avgdl = (
        sum(idx.doc_len.values()) / idx.n_docs if idx.n_docs else 0.0
    )
    return idx


def bm25_topk(
    idx: OracleIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> list[tuple[int, float]]:
    """Exact top-k: [(doc_id, raw_score)] ordered by the deterministic
    ranking key."""
    scores: dict[int, float] = {}
    for term in sorted(set(tokenize(qtext))):
        plist = idx.postings.get(term)
        if not plist:
            continue
        df = idx.df[term]
        idf = math.log((idx.n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for doc_id, tf in plist:
            dl = idx.doc_len[doc_id]
            contrib = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / idx.avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + contrib
    ranked = sorted(
        scores.items(), key=lambda kv: (-round(kv[1], RANK_ROUND_DECIMALS), kv[0])
    )
    return ranked[:top_k]


def topk_rows(idx: OracleIndex, queries: list[str], top_k: int = TOP_K):
    """[(query_id, rank, doc_id, score_rounded)] for a query list."""
    rows = []
    for qid, q in enumerate(queries):
        for rank, (doc_id, score) in enumerate(bm25_topk(idx, q, top_k=top_k), 1):
            rows.append((qid, rank, doc_id, round(score, SCORE_ROUND_DECIMALS)))
    return rows
