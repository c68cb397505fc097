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


def bm25_idf(df: int, n_docs: int) -> float:
    """The one idf expression, shared by the local index and the
    sharded gather stage (stages/serve.py) so shipped-in idfs are
    bit-identical to locally computed ones."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


@dataclass
class _Chunk:
    base: int
    data: bytes
    max_tf: int
    min_dl: int
    shard: int = 0


class InvertedIndex:
    """In-memory view of the chunked compressed index.

    Self-contained: built from the chunk table plus ``n_docs`` alone.
    The dictionary (term -> global df/cf) is derived from the chunk
    summary rows; per-posting doc lengths are embedded in the chunk
    data (codec.encode_postings), so no doc-length side table is ever
    broadcast — the property that makes the layout viable at 10^12
    docs, where each scorer shard would hold only its doc-range's
    chunks. ``avgdl`` = sum(cf) / n_docs (total surviving tokens over
    total docs). Postings stay varbyte-compressed until a term is
    scored.
    """

    def __init__(self, chunks: pa.Table, n_docs: int, cache_terms: int = 1024):
        self.chunks: dict[str, list[_Chunk]] = {}
        self.df: dict[str, int] = {}
        # sorted unique tombstoned doc_ids (set_deleted); scorers mask
        # candidates against it BEFORE the top-k cut, postings/stats
        # stay untouched (the logical-delete contract)
        self.deleted: np.ndarray = np.empty(0, np.int64)
        if chunks.num_rows == 0 or "term" not in chunks.schema.names:
            # empty corpus / all-stopword corpus -> empty index
            self._cache: dict[str, tuple] = {}
            self._contrib_cache: dict[tuple, tuple] = {}
            self._cache_terms = cache_terms
            self.n_docs = int(n_docs)
            self.avgdl = 0.0
            return
        # decoded-postings cache (hot terms decoded once per scorer
        # actor; pure memoization — results unchanged). Bounded FIFO.
        self._cache: dict[str, tuple] = {}
        self._contrib_cache: dict[tuple, tuple] = {}
        self._cache_terms = cache_terms
        terms = chunks["term"].to_pylist()
        shards = chunks["shard"].to_numpy(zero_copy_only=False)
        bases = chunks["base"].to_numpy(zero_copy_only=False)
        # (shard ASC, base ASC): doc_id-ascending chunk concat even when a
        # build-partition boundary splits a shard and the chunk files were
        # concatenated in arbitrary order — postings() and the dense path
        # of score_query require per-term doc_id sortedness.
        order = np.lexsort((bases, shards))
        dfs = chunks["df"].to_numpy(zero_copy_only=False)
        datas = chunks["data"].to_pylist()
        max_tfs = chunks["max_tf"].to_numpy(zero_copy_only=False)
        min_dls = chunks["min_dl"].to_numpy(zero_copy_only=False)
        total_cf = 0
        cfs = chunks["cf"].to_numpy(zero_copy_only=False)
        for i in order:
            self.chunks.setdefault(terms[i], []).append(
                _Chunk(
                    int(bases[i]), datas[i], int(max_tfs[i]), int(min_dls[i]),
                    int(shards[i]),
                )
            )
            self.df[terms[i]] = self.df.get(terms[i], 0) + int(dfs[i])
            total_cf += int(cfs[i])
        self.n_docs = int(n_docs)
        self.avgdl = total_cf / n_docs if n_docs else 0.0

    def set_deleted(self, doc_ids) -> None:
        """Install the tombstone set (any int iterable/array). Stats
        (df, avgdl, n_docs) intentionally do NOT change — deleted docs
        stop appearing in results but still count toward idf until a
        physical compaction rewrites the chunks (Lucene semantics,
        pipelines/index_pipeline.compact_index_with_tombstones)."""
        self.deleted = np.unique(np.asarray(doc_ids, dtype=np.int64))

    def idf(self, term: str) -> float:
        return bm25_idf(self.df.get(term, 0), self.n_docs)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (doc_ids, tfs, dls), concatenated across chunks in
        doc_id order."""
        hit = self._cache.get(term)
        if hit is not None:
            return hit
        parts = self.chunks.get(term)
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.int32), e.astype(np.int32)
        decoded = [decode_postings(c.data, base=c.base) for c in parts]
        out = (
            np.concatenate([d for d, _, _ in decoded]),
            np.concatenate([t for _, t, _ in decoded]),
            np.concatenate([l for _, _, l in decoded]),
        )
        if len(self._cache) >= self._cache_terms:
            self._cache.pop(next(iter(self._cache)))
        self._cache[term] = out
        return out

    def contributions(
        self, term: str, k1: float, b: float, idf: float | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, per-doc BM25 contribution) for a term — the
        impact-precompute pattern: the tf/dl math runs once per term
        per scorer actor and is reused by every query (results are the
        same arrays, so float summation stays bit-identical).

        ``idf`` overrides the locally derived idf — the doc-sharded
        serving path ships the gather stage's globally-computed idf with
        each query, so shard actors need no dictionary at all. The
        expression below is evaluated identically either way."""
        key = (term, k1, b, idf)
        hit = self._contrib_cache.get(key)
        if hit is not None:
            return hit
        doc_ids, tfs, dls = self.postings(term)
        if doc_ids.size == 0:
            out = (doc_ids, np.empty(0, np.float64))
        else:
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            idf_v = self.idf(term) if idf is None else idf
            contrib = idf_v * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / self.avgdl)
            )
            out = (doc_ids, contrib)
        if len(self._contrib_cache) >= self._cache_terms:
            self._contrib_cache.pop(next(iter(self._contrib_cache)))
        self._contrib_cache[key] = out
        return out

    def precompute_impacts(self, k1: float = BM25_K1, b: float = BM25_B) -> None:
        """Materialize every term's contribution array up front (the
        impact-ordered-index pattern). Call BEFORE ray.put-ing the
        index: actors then share the ready numpy arrays zero-copy from
        the object store instead of each re-decoding the postings —
        turns per-actor cold-start cost into one driver-side pass."""
        self._cache_terms = max(self._cache_terms, len(self.chunks) + 1)
        for t in self.chunks:
            self.contributions(t, k1, b)
        # drop the raw decoded cache; impacts are what queries read
        self._cache.clear()


def score_query(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact term-at-a-time BM25 -> (doc_ids, scores) of the top-k,
    deterministically ordered.

    Accumulation is candidate-sparse (np.unique + add.at over only the
    touched postings), never an n_docs-sized dense array — required for
    the doc-sharded scale path. Per-doc contributions sum in sorted
    term order, matching the oracle's float summation order exactly.
    """
    terms = sorted(set(tokenize(qtext)))
    return score_terms(index, [(t, None) for t in terms], k1, b, top_k)


def score_terms(
    index: InvertedIndex,
    terms_idf: list[tuple[str, float | None]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Core of ``score_query`` over pre-tokenized (term, idf) pairs in
    sorted term order; idf=None means derive from the index's own
    dictionary. The doc-sharded serving path calls this directly with
    gather-stage-computed global idfs.

    ``after``: search_after cursor pushdown — (cursor round-9 score,
    cursor doc_id); only candidates STRICTLY after the cursor in the
    (round-9 DESC, doc_id ASC) total order survive into the top-k cut,
    so a shard's response is its local top-k OF THE NEXT PAGE (no
    top-2k overfetch)."""
    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    for t, idf in terms_idf:
        doc_ids, contrib = index.contributions(t, k1, b, idf=idf)
        if doc_ids.size == 0:
            continue
        doc_parts.append(doc_ids)
        contrib_parts.append(contrib)
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    total_postings = sum(p.size for p in doc_parts)
    lo = min(int(p[0]) for p in doc_parts)
    hi = max(int(p[-1]) for p in doc_parts)
    span = hi - lo + 1
    if total_postings * 4 >= span:
        # Dense path (stop-word-heavy queries touch most docs): direct
        # array accumulation over the candidate doc-id span. Per-doc
        # contributions still add in sorted term order (one add per
        # term; doc_ids are unique within a term), so float results are
        # bit-identical to the sparse path and the oracle.
        scores_d = np.zeros(span, dtype=np.float64)
        for docs, contrib in zip(doc_parts, contrib_parts):
            scores_d[docs - lo] += contrib
        cand = np.flatnonzero(scores_d)
        uniq = cand + lo
        scores = scores_d[cand]
    else:
        all_docs = np.concatenate(doc_parts)
        all_contribs = np.concatenate(contrib_parts)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, all_contribs)
    uniq, scores = drop_deleted(index.deleted, uniq, scores)
    if after is not None:
        c_s, c_d = after
        rounded = np.round(scores, RANK_ROUND_DECIMALS)
        m = (rounded < c_s) | ((rounded == c_s) & (uniq > c_d))
        uniq, scores = uniq[m], scores[m]
    return _topk_select(uniq, scores, top_k)


def drop_deleted(
    deleted: np.ndarray, doc_ids: np.ndarray, scores: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Remove tombstoned docs from a candidate set. ``deleted`` is the
    index's sorted unique tombstone array; membership is a vectorized
    searchsorted (no hashing, no Python loop). Cached postings/impact
    arrays are never mutated — masking always allocates fresh views."""
    if deleted.size == 0 or doc_ids.size == 0:
        return doc_ids, scores
    idx = np.searchsorted(deleted, doc_ids)
    # idx == deleted.size means doc_id > every tombstone; clamping to 0
    # cannot false-positive (deleted[0] < doc_id there by construction)
    idx[idx == deleted.size] = 0
    hit = deleted[idx] == doc_ids
    if not hit.any():
        return doc_ids, scores
    keep = ~hit
    return doc_ids[keep], scores[keep]


def _topk_select(
    doc_ids: np.ndarray, scores: np.ndarray, top_k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k cut: argpartition pre-selects the candidates
    that can place (including ALL ties at the k-th rounded score), then
    the small lexsort applies the (round DESC, doc_id ASC) order —
    identical output to a full sort, O(n) instead of O(n log n)."""
    rounded = np.round(scores, RANK_ROUND_DECIMALS)
    if rounded.size > 4 * top_k:
        kth = np.partition(rounded, rounded.size - top_k)[rounded.size - top_k]
        mask = rounded >= kth
        doc_ids, scores, rounded = doc_ids[mask], scores[mask], rounded[mask]
    order = np.lexsort((doc_ids, -rounded))[:top_k]
    return doc_ids[order], scores[order]


def score_query_wand(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over the chunked index: provably returns the SAME
    top-k as ``score_query`` (tested), decoding only chunks that can
    beat the running threshold.

    Chunks are shard-aligned across terms, so the doc space partitions
    into shards; each shard's upper bound is the sum of its terms'
    chunk bounds ub(t) = idf * max_tf*(k1+1) / (max_tf + k1*(1-b +
    b*min_dl/avgdl)) (monotone in tf, anti-monotone in dl). Shards are
    visited in descending bound order; a shard is skipped when its
    bound < kth_best - 2e-9 — the margin guarantees the skipped docs
    also lose after RANK_ROUND_DECIMALS rounding and doc_id
    tie-breaking, so rank identity with the exact scorer is exact, not
    probabilistic."""
    terms = sorted(set(tokenize(qtext)))
    return score_terms_wand(index, [(t, None) for t in terms], k1, b, top_k)


def score_terms_wand(
    index: InvertedIndex,
    terms_idf: list[tuple[str, float | None]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Core of ``score_query_wand`` over pre-tokenized (term, idf)
    pairs in sorted term order; idf=None derives from the index's own
    dictionary. The doc-sharded serving path calls this directly with
    gather-stage global idfs — block-max skipping then happens
    per-shard against that shard's own running threshold."""
    per_term: list[tuple[str, float, list[_Chunk]]] = []
    shard_ub: dict[int, float] = {}
    for t, idf_in in terms_idf:
        parts = index.chunks.get(t)
        if not parts:
            continue
        idf = index.idf(t) if idf_in is None else idf_in
        per_term.append((t, idf, parts))
        for c in parts:
            tf = float(c.max_tf)
            ub = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * c.min_dl / index.avgdl)
            )
            shard_ub[c.shard] = shard_ub.get(c.shard, 0.0) + ub
    if not per_term:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    # chunks by (shard, term) for selective decode
    by_shard: dict[int, list[tuple[str, float, _Chunk]]] = {}
    for t, idf, parts in per_term:
        for c in parts:
            by_shard.setdefault(c.shard, []).append((t, idf, c))

    # per-chunk contribution memoization: WAND's selective decode would
    # otherwise pay full decode+math per repeated query term, while the
    # exact path amortizes through its impact cache. Keyed by chunk
    # identity + BM25 params; bounded FIFO like the other caches.
    wcache = getattr(index, "_wand_cache", None)
    if wcache is None:
        wcache = index._wand_cache = {}

    order = sorted(shard_ub, key=lambda s: (-shard_ub[s], s))
    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    # Running-threshold state: `topk_buf` holds the best <= top_k scores
    # among candidates processed so far, so maintaining kth costs
    # O(block + top_k) per block — NOT a re-partition of every
    # accumulated candidate (measured: that bookkeeping made WAND lose
    # to the memoized exact path on cold streams).
    topk_buf = np.empty(0, np.float64)
    kth = -np.inf
    n_kept = 0
    for s in order:
        if n_kept >= top_k and shard_ub[s] < kth - 2e-9:
            # blocks are visited in descending upper-bound order, so
            # every remaining block is bounded lower still: stop.
            break
        doc_parts, contrib_parts = [], []
        for t, idf, c in by_shard[s]:
            key = (t, c.shard, c.base, k1, b, idf)
            hit = wcache.get(key)
            if hit is None:
                doc_ids, tfs, dls = decode_postings(c.data, base=c.base)
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                contrib = idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / index.avgdl)
                )
                if len(wcache) >= 4096:
                    wcache.pop(next(iter(wcache)))
                wcache[key] = hit = (doc_ids, contrib)
            doc_ids, contrib = hit
            doc_parts.append(doc_ids)
            contrib_parts.append(contrib)
        if len(doc_parts) == 1:
            # single-term block: postings are already per-doc unique
            # (cached arrays are never mutated downstream)
            uniq, scores = doc_parts[0], contrib_parts[0]
        else:
            all_docs = np.concatenate(doc_parts)
            all_contribs = np.concatenate(contrib_parts)
            uniq, inv = np.unique(all_docs, return_inverse=True)
            scores = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(scores, inv, all_contribs)
        # tombstone mask BEFORE the running threshold sees the block:
        # kth then tracks live docs only, identical to the exact path
        # (a deleted doc inflating a block's upper bound is still a
        # valid bound — skipping stays conservative)
        uniq, scores = drop_deleted(index.deleted, uniq, scores)
        if uniq.size == 0:
            continue
        cand_docs.append(uniq)
        cand_scores.append(scores)
        n_kept += uniq.size
        merged = np.concatenate((topk_buf, scores))
        if merged.size > top_k:
            merged = np.partition(merged, merged.size - top_k)[
                merged.size - top_k:
            ]
        topk_buf = merged
        if n_kept >= top_k:
            # buffer holds exactly the top_k best processed scores
            kth = topk_buf.min()
    if not cand_docs:
        # every candidate was tombstoned
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs = np.concatenate(cand_docs)
    scores = np.concatenate(cand_scores)
    return _topk_select(docs, scores, top_k)


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


def topk_rows(out_q, out_r, out_d, out_s, qid, doc_ids, scores) -> None:
    """Append one query's ranked result to the four column builders —
    the one place rank numbering and score rounding happen (shared with
    the sharded gather stage in stages/serve.py)."""
    n = len(doc_ids)
    out_q.extend([int(qid)] * n)
    out_r.extend(range(1, n + 1))
    out_d.extend(doc_ids.tolist())
    out_s.extend(np.round(scores, SCORE_ROUND_DECIMALS).tolist())


def topk_table(query_ids, qtexts, index, k1, b, top_k) -> pa.Table:
    """Score a batch of queries -> TOPK_SCHEMA rows."""
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, qtext in zip(query_ids, qtexts):
        doc_ids, scores = score_query(index, qtext, k1, b, top_k)
        topk_rows(out_q, out_r, out_d, out_s, qid, doc_ids, scores)
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


def synonym_map() -> dict[str, str]:
    """Analyzed term -> pseudo-term group key ('|'-joined sorted
    members), from constants.SYNONYM_GROUPS."""
    from snowball_java_ray.constants import SYNONYM_GROUPS

    return {
        m: "|".join(sorted(g)) for g in SYNONYM_GROUPS for m in g
    }


def group_contributions(
    index: InvertedIndex, members: list[str], k1: float, b: float
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, BM25 contributions) of a synonym pseudo-term —
    Lucene SynonymQuery semantics: per-doc tf is the SUM of member
    tfs, df is the size of the UNION of member posting lists, idf is
    derived from that df. A single-member group degenerates to the
    plain term contribution."""
    if len(members) == 1:
        return index.contributions(members[0], k1, b)
    parts = [index.postings(m) for m in members]
    parts = [p for p in parts if p[0].size]
    if not parts:
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.float64)
    docs = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts]).astype(np.int64)
    dls = np.concatenate([p[2] for p in parts])
    uniq, inv = np.unique(docs, return_inverse=True)
    tf = np.zeros(uniq.size, np.int64)
    np.add.at(tf, inv, tfs)
    dl = np.zeros(uniq.size, np.int64)
    dl[inv] = dls  # same doc -> same length, any member's copy works
    idf = bm25_idf(uniq.size, index.n_docs)
    tff = tf.astype(np.float64)
    dlf = dl.astype(np.float64)
    contrib = idf * tff * (k1 + 1.0) / (
        tff + k1 * (1.0 - b + b * dlf / index.avgdl)
    )
    return uniq, contrib


def score_query_synonyms(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Synonym-aware exact BM25: analyzed query terms collapse to
    their pseudo-term groups (distinct, sorted), each group scores as
    one term via group_contributions, accumulation matches
    score_terms' sparse path."""
    smap = synonym_map()
    gkeys = sorted({smap.get(t, t) for t in set(tokenize(qtext))})
    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    for g in gkeys:
        docs, contrib = group_contributions(
            index, g.split("|"), k1, b
        )
        if docs.size:
            doc_parts.append(docs)
            contrib_parts.append(contrib)
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    all_contribs = np.concatenate(contrib_parts)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(uniq.size, np.float64)
    np.add.at(scores, inv, all_contribs)
    uniq, scores = drop_deleted(index.deleted, uniq, scores)
    return _topk_select(uniq, scores, top_k)


class SynonymScorer:
    """Actor-pool scorer running synonym-aware BM25 against the
    broadcast index (same plumbing as BM25Scorer)."""

    def __init__(self, index_ref, k1=BM25_K1, b=BM25_B, top_k=TOP_K):
        import ray

        self.index = (
            ray.get(index_ref)
            if isinstance(index_ref, ray.ObjectRef)
            else index_ref
        )
        self.k1, self.b, self.top_k = k1, b, top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["qtext"].to_pylist()
        ):
            doc_ids, scores = score_query_synonyms(
                self.index, qtext, self.k1, self.b, self.top_k
            )
            topk_rows(out_q, out_r, out_d, out_s, qid, doc_ids, scores)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            },
            schema=TOPK_SCHEMA,
        )


def score_query_boosted(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """Function-score retrieval (the Elasticsearch function_score /
    Lucene boost shape): final = BM25 * (1 + ln(1 + dl/BOOST_DL_NORM)).
    The document signal (analyzed length) already rides in every
    posting, so the boost costs no extra lookup or broadcast — the
    candidate-sparse accumulation just carries dl alongside the
    contribution sum."""
    from snowball_java_ray.constants import BOOST_DL_NORM

    terms = sorted(set(tokenize(qtext)))
    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    dl_parts: list[np.ndarray] = []
    for t in terms:
        doc_ids, contrib = index.contributions(t, k1, b)
        if doc_ids.size == 0:
            continue
        _, _, dls = index.postings(t)
        doc_parts.append(doc_ids)
        contrib_parts.append(contrib)
        dl_parts.append(dls.astype(np.int64))
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(uniq.size, np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_parts))
    dl = np.zeros(uniq.size, np.int64)
    dl[inv] = np.concatenate(dl_parts)  # same doc -> same length
    # np.log (not log1p) so the float op sequence matches the SQL
    # oracle's ln(1 + dl/norm) exactly
    scores = scores * (1.0 + np.log(1.0 + dl / BOOST_DL_NORM))
    uniq, scores = drop_deleted(index.deleted, uniq, scores)
    return _topk_select(uniq, scores, top_k)


class BoostedScorer:
    """Actor-pool scorer running function-score BM25 against the
    broadcast index."""

    def __init__(self, index_ref, k1=BM25_K1, b=BM25_B, top_k=TOP_K):
        import ray

        self.index = (
            ray.get(index_ref)
            if isinstance(index_ref, ray.ObjectRef)
            else index_ref
        )
        self.k1, self.b, self.top_k = k1, b, top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["qtext"].to_pylist()
        ):
            doc_ids, scores = score_query_boosted(
                self.index, qtext, self.k1, self.b, self.top_k
            )
            topk_rows(out_q, out_r, out_d, out_s, qid, doc_ids, scores)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            },
            schema=TOPK_SCHEMA,
        )


def score_query_msm(
    index: InvertedIndex,
    qtext: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> tuple[np.ndarray, np.ndarray]:
    """minimum_should_match retrieval: only docs matching at least
    min(MSM_MIN, n_query_terms) distinct analyzed terms are
    candidates (the Lucene/ES msm contract — kills one-term noise
    hits on multi-term queries without demanding a full AND); the
    score is plain BM25 over the matched terms. The match count rides
    the same candidate-sparse accumulation as the scores (one extra
    add.at of ones)."""
    from snowball_java_ray.constants import MSM_MIN

    terms = sorted(set(tokenize(qtext)))
    need = min(MSM_MIN, len(terms)) if terms else 0
    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    for t in terms:
        doc_ids, contrib = index.contributions(t, k1, b)
        if doc_ids.size == 0:
            continue
        doc_parts.append(doc_ids)
        contrib_parts.append(contrib)
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(uniq.size, np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_parts))
    nmatch = np.zeros(uniq.size, np.int64)
    np.add.at(nmatch, inv, 1)
    keep = nmatch >= need
    uniq, scores = uniq[keep], scores[keep]
    uniq, scores = drop_deleted(index.deleted, uniq, scores)
    return _topk_select(uniq, scores, top_k)


class MSMScorer:
    """Actor-pool scorer for minimum_should_match retrieval."""

    def __init__(self, index_ref, k1=BM25_K1, b=BM25_B, top_k=TOP_K):
        import ray

        self.index = (
            ray.get(index_ref)
            if isinstance(index_ref, ray.ObjectRef)
            else index_ref
        )
        self.k1, self.b, self.top_k = k1, b, top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["qtext"].to_pylist()
        ):
            doc_ids, scores = score_query_msm(
                self.index, qtext, self.k1, self.b, self.top_k
            )
            topk_rows(out_q, out_r, out_d, out_s, qid, doc_ids, scores)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            },
            schema=TOPK_SCHEMA,
        )
