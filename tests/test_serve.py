"""Doc-sharded serving (stages/serve.py) — rank identity with the
single-index broadcast path, which is itself oracled against DuckDB.

Reference replaced: Snowball.java:371-404 (full-scan retrieval) via the
SURVEY.md §2.3 ST5 scatter/gather scale path."""

import numpy as np
import pyarrow as pa

from snowball_java_ray.constants import REFERENCE_QUERIES
from snowball_java_ray.pipelines.api import (
    bm25_topk_pipeline,
    bm25_topk_sharded_pipeline,
    boolean_and_pipeline,
    boolean_and_sharded_pipeline,
    collect_arrow,
    ensure_index_dir,
)
from snowball_java_ray.stages.serve import BM25ShardedService
from tests.conftest import SF_TINY


def _sorted_pandas(tbl: pa.Table):
    df = tbl.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sharded_topk_identical_to_broadcast(ray_session):
    a = collect_arrow(bm25_topk_pipeline(SF_TINY))
    b = collect_arrow(bm25_topk_sharded_pipeline(SF_TINY))
    assert a.schema == b.schema
    assert _sorted_pandas(a).equals(_sorted_pandas(b))


def test_sharded_boolean_and_identical(ray_session):
    a = boolean_and_pipeline(SF_TINY)
    b = boolean_and_sharded_pipeline(SF_TINY)
    assert _sorted_pandas(a).equals(_sorted_pandas(b))


def test_sharded_service_direct(ray_session, tmp_path):
    """Service-level probes: per-shard state isolation + empty query."""
    index_dir = ensure_index_dir(SF_TINY)
    svc = BM25ShardedService(index_dir)
    try:
        assert len(svc.handles) == 4  # one actor per doc-range partition
        # zero-hit query: no rows, no error
        assert svc.boolean_and("zzzznotaterm qqqqalsonot").size == 0
        assert svc.boolean_and("").size == 0
        # conjunctive result is doc_id-sorted (ascending shard concat)
        for q in REFERENCE_QUERIES[:4]:
            ids = svc.boolean_and(q)
            assert np.all(np.diff(ids) > 0)
    finally:
        svc.shutdown()


def test_sharded_wand_identical(ray_session):
    """Block-max WAND inside every shard actor == exact sharded path
    (the north-star serving shape, rank identity preserved end-to-end)."""
    a = collect_arrow(bm25_topk_sharded_pipeline(SF_TINY))
    b = collect_arrow(bm25_topk_sharded_pipeline(SF_TINY, algo="wand"))
    assert a.schema == b.schema
    assert _sorted_pandas(a).equals(_sorted_pandas(b))


def test_shard_actor_crash_recovery(ray_session):
    """Killing a shard actor mid-service must not lose queries: state
    rebuilds from the immutable chunk files and the retried scatter
    returns identical results."""
    import ray

    index_dir = ensure_index_dir(SF_TINY)
    svc = BM25ShardedService(index_dir)
    try:
        before = svc.boolean_and(REFERENCE_QUERIES[0])
        # simulate a node/actor failure (no_restart=False -> Ray restarts)
        ray.kill(svc.handles[1], no_restart=False)
        after = svc.boolean_and(REFERENCE_QUERIES[0])
        assert before.tolist() == after.tolist()
        # scoring path too
        ids, scores, counts = ray.get(
            svc.handles[1].score_batch.remote(
                [(0, [("data", 1.0)])], 1.2, 0.75, 5, "exact"
            )
        )
        assert counts.size == 1 and ids.size == counts[0]
    finally:
        svc.shutdown()


def test_sharded_seed_retrieval_equals_driver_index(ray_session):
    """Fleet-served conjunctive seed retrieval == driver-index lookup
    (the Snowball match-phase integration at serving scale)."""
    from snowball_java_ray.pipelines.api import build_index, documents_as_corpus
    from snowball_java_ray.pipelines.snowball import (
        retrieve_seed_candidate_docs,
        retrieve_seed_candidate_docs_sharded,
    )

    seeds = {("table stream", "hash sort"), ("query", "merge")}
    index = build_index(documents_as_corpus(SF_TINY), n_docs=500, shard_size=64)
    index_dir = ensure_index_dir(SF_TINY)
    svc = BM25ShardedService(index_dir)
    try:
        a = retrieve_seed_candidate_docs(index, seeds)
        b = retrieve_seed_candidate_docs_sharded(svc, seeds)
        assert a.tolist() == b.tolist()
        assert a.size > 0
    finally:
        svc.shutdown()


def test_boolean_or_and_not_semantics(ray_session):
    """Fleet OR / AND-NOT against a naive per-doc reference computed
    from the raw corpus text (independent of the postings machinery)."""
    import pyarrow.parquet as pq

    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.api import (
        boolean_and_not_pipeline,
        boolean_or_pipeline,
    )

    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    )
    toksets = {
        did: set(tokenize(text or ""))
        for did, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        )
    }

    got_or = boolean_or_pipeline(SF_TINY)
    got_nt = boolean_and_not_pipeline(SF_TINY)
    exp_or, exp_nt = [], []
    for qid, qtext in enumerate(REFERENCE_QUERIES):
        terms = sorted(set(tokenize(qtext)))
        if not terms:
            continue
        pos, neg = (
            (terms, []) if len(terms) == 1 else (terms[:-1], [terms[-1]])
        )
        for did in sorted(toksets):
            ts = toksets[did]
            if any(t in ts for t in terms):
                exp_or.append((qid, did))
            if all(t in ts for t in pos) and not any(t in ts for t in neg):
                exp_nt.append((qid, did))
    assert list(
        zip(got_or["query_id"].to_pylist(), got_or["doc_id"].to_pylist())
    ) == exp_or
    assert list(
        zip(got_nt["query_id"].to_pylist(), got_nt["doc_id"].to_pylist())
    ) == exp_nt
    # OR is a superset of AND-NOT's positive results per query
    assert set(exp_nt) <= set(exp_or)


def test_phrase_match_adjacency(ray_session):
    """Phrase hits are exactly the docs whose analyzed token stream
    contains the analyzed query sequence contiguously — AND candidates
    with non-adjacent terms must NOT match."""
    import pyarrow.parquet as pq

    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.api import (
        boolean_and_pipeline,
        phrase_match_pipeline,
    )

    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    )
    streams = {
        did: " " + " ".join(tokenize(text or "")) + " "
        for did, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        )
    }
    got = phrase_match_pipeline(SF_TINY)
    pairs = set(
        zip(got["query_id"].to_pylist(), got["doc_id"].to_pylist())
    )
    exp = set()
    for qid, qtext in enumerate(REFERENCE_QUERIES):
        phrase = " ".join(tokenize(qtext))
        if not phrase:
            continue
        for did, s in streams.items():
            if f" {phrase} " in s:
                exp.add((qid, did))
    assert pairs == exp
    # phrase hits are a subset of the conjunctive candidates
    and_tbl = boolean_and_pipeline(SF_TINY)
    and_pairs = set(
        zip(and_tbl["query_id"].to_pylist(), and_tbl["doc_id"].to_pylist())
    )
    assert pairs <= and_pairs
    # multi-term phrases must be strictly more selective somewhere
    assert len(pairs) < len(and_pairs)


def test_diverse_topk_caps_sources_and_matches_local(ray_session):
    """Sharded diversified retrieval == a local recomputation from the
    broadcast index + corpus metadata, and no source exceeds the cap."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import (
        DIVERSITY_CAP,
        RANK_ROUND_DECIMALS,
        REFERENCE_QUERIES,
        TOP_K,
    )
    from snowball_java_ray.pipelines.api import (
        bm25_topk_diverse_pipeline,
        build_index,
        documents_as_corpus,
    )
    from snowball_java_ray.stages.score import score_query

    got = collect_arrow(bm25_topk_diverse_pipeline(SF_TINY)).to_pandas()
    # cap invariant
    per_src = got.groupby(["query_id", "source"]).size()
    assert (per_src <= DIVERSITY_CAP).all()

    # local recomputation: full candidate list -> per-source cap -> k
    meta = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "source"]
    )
    src_of = dict(
        zip(meta["doc_id"].to_pylist(), meta["source"].to_pylist())
    )
    index = build_index(documents_as_corpus(SF_TINY), n_docs=500,
                        shard_size=64)
    for qid, q in enumerate(REFERENCE_QUERIES):
        docs, scores = score_query(index, q, top_k=1 << 62)
        counts: dict[str, int] = {}
        want = []
        for d, s in zip(docs.tolist(), scores.tolist()):
            src = src_of[d]
            c = counts.get(src, 0) + 1
            counts[src] = c
            if c <= DIVERSITY_CAP:
                want.append(d)
        want = want[:TOP_K]
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == want
        assert g["source"].tolist() == [src_of[d] for d in want]


def test_query_expand_excludes_query_terms(ray_session):
    """PRF expansion: no query's own analyzed term may appear among
    its expansion terms, ranks are 1..n with non-increasing rounded
    weights."""
    import numpy as np

    from snowball_java_ray.constants import (
        RANK_ROUND_DECIMALS,
        REFERENCE_QUERIES,
    )
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.api import query_expand_pipeline

    got = query_expand_pipeline(SF_TINY).to_pandas()
    assert len(got) > 0
    for qid, g in got.groupby("query_id"):
        own = set(tokenize(REFERENCE_QUERIES[int(qid)]))
        assert not (set(g["term"]) & own)
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        w = np.round(g["weight"].to_numpy(), RANK_ROUND_DECIMALS)
        assert (np.diff(w) <= 0).all()


def test_hybrid_rrf_consistency(ray_session):
    """RRF values recompute exactly from the emitted leg ranks, every
    row has at least one leg present, and ranks are 1..n per query."""
    import numpy as np

    from snowball_java_ray.constants import RRF_K, SCORE_ROUND_DECIMALS
    from snowball_java_ray.pipelines.api import hybrid_topk_pipeline

    got = hybrid_topk_pipeline(SF_TINY).to_pandas()
    assert len(got) > 0
    bm = got["bm_rank"].to_numpy()
    an = got["ann_rank"].to_numpy()
    assert ((bm > 0) | (an > 0)).all()
    want = np.where(bm > 0, 1.0 / (RRF_K + bm), 0.0) + np.where(
        an > 0, 1.0 / (RRF_K + an), 0.0
    )
    assert np.allclose(got["rrf"], np.round(want, SCORE_ROUND_DECIMALS))
    for _, g in got.groupby("query_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))


def test_percolate_equals_indexed_boolean_and(ray_session):
    """Index-free percolation over the raw doc stream == the
    fleet-served conjunctive retrieval (two disjoint execution paths,
    one semantics)."""
    from snowball_java_ray.pipelines.api import percolate_pipeline

    a = boolean_and_pipeline(SF_TINY)
    b = percolate_pipeline(SF_TINY)
    assert a.num_rows == b.num_rows > 0
    assert _sorted_pandas(a).equals(_sorted_pandas(b))


def test_near_match_spans(ray_session):
    """Proximity hits recompute exactly from the raw corpus text
    (independent of the postings machinery): all terms present and
    first-occurrence span <= NEAR_SLOP; result is a subset of the
    conjunctive candidates."""
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import NEAR_SLOP
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.api import near_match_pipeline

    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    )
    firsts = {}
    for did, text in zip(docs["doc_id"].to_pylist(),
                         docs["text"].to_pylist()):
        f = {}
        for i, tok in enumerate(tokenize(text or ""), start=1):
            f.setdefault(tok, i)
        firsts[did] = f
    exp = []
    for qid, qtext in enumerate(REFERENCE_QUERIES):
        terms = sorted(set(tokenize(qtext)))
        if not terms:
            continue
        for did in sorted(firsts):
            f = firsts[did]
            if all(t in f for t in terms):
                span = max(f[t] for t in terms) - min(f[t] for t in terms)
                if span <= NEAR_SLOP:
                    exp.append((qid, did, span))
    got = near_match_pipeline(SF_TINY)
    assert list(zip(got["query_id"].to_pylist(),
                    got["doc_id"].to_pylist(),
                    got["span"].to_pylist())) == exp
    assert len(exp) > 0


def test_bm25_explain_sums_to_top1_score(ray_session):
    """Per-term contributions sum back to the rank-1 doc's emitted
    score (within rounding of the individually rounded terms)."""
    from snowball_java_ray.pipelines.api import bm25_explain_pipeline

    topk = collect_arrow(bm25_topk_sharded_pipeline(SF_TINY)).to_pandas()
    top1 = topk[topk["rank"] == 1].set_index("query_id")
    exp = bm25_explain_pipeline(SF_TINY).to_pandas()
    assert len(exp) > 0
    for qid, g in exp.groupby("query_id"):
        assert g["doc_id"].nunique() == 1
        assert int(g["doc_id"].iloc[0]) == int(top1.loc[qid, "doc_id"])
        assert abs(g["contrib"].sum() - top1.loc[qid, "score"]) < 1e-5


def test_wildcard_search_semantics(ray_session):
    """Pattern expansion + disjunctive retrieval: 'cust%' docs are
    exactly the docs containing a 'cust'-prefixed term; the
    zero-expansion pattern ('zz%') yields no rows; every emitted
    pattern is from the constant set."""
    import duckdb

    from snowball_java_ray import sqlgen
    from snowball_java_ray.constants import WILDCARD_PATTERNS
    from snowball_java_ray.pipelines.api import wildcard_search_pipeline

    got = wildcard_search_pipeline(SF_TINY).to_pandas()
    assert set(got["pattern"]) <= set(WILDCARD_PATTERNS)
    assert not (got["pattern"] == "zz%").any()

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{SF_TINY}/documents.parquet'"
    )
    want = con.sql(sqlgen.wildcard_search_sql()).df()
    g = got.sort_values(["pattern", "doc_id"]).reset_index(drop=True)
    w = want.sort_values(["pattern", "doc_id"]).reset_index(drop=True)
    assert g.equals(w)
    assert len(g) > 0


def test_filtered_topk_semantics(ray_session):
    """Every filtered hit is from FILTER_SOURCE; its score equals the
    GLOBAL unfiltered BM25 score for that (query, doc) — the filter
    restricts candidates, never the stats."""
    import duckdb

    from snowball_java_ray.constants import FILTER_SOURCE
    from snowball_java_ray.pipelines.api import (
        bm25_topk_filtered_pipeline,
        bm25_topk_sharded_pipeline,
    )

    got = collect_arrow(bm25_topk_filtered_pipeline(SF_TINY)).to_pandas()
    assert len(got) > 0
    src = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_TINY}/documents.parquet'"
    ).df().set_index("doc_id")["source"]
    assert (src.loc[got["doc_id"]].to_numpy() == FILTER_SOURCE).all()

    # unfiltered scores over a deep cut: every filtered (q, doc) pair
    # present there must carry the identical score
    deep = collect_arrow(
        bm25_topk_sharded_pipeline(SF_TINY, top_k=500)
    ).to_pandas().set_index(["query_id", "doc_id"])["score"]
    joined = got.join(
        deep.rename("global_score"), on=["query_id", "doc_id"], how="inner"
    )
    assert len(joined) > 0
    assert (joined["score"] == joined["global_score"]).all()


def test_shard_crash_recovery_search_after(ray_session):
    """Killing a shard actor between pagination rounds must not lose
    the page: score_batch_after rebuilds from the immutable chunks
    and the page-2 result is identical."""
    import ray

    from snowball_java_ray.pipelines.api import bm25_page2_pipeline

    before = bm25_page2_pipeline(SF_TINY).to_pandas()
    index_dir = ensure_index_dir(SF_TINY)
    svc = BM25ShardedService(index_dir)
    try:
        ray.kill(svc.handles[0], no_restart=False)
        # direct cursor-pushdown call against the restarted actor
        ids, scores, counts = ray.get(
            svc.handles[0].score_batch_after.remote(
                [(0, [("data", 1.0)], 1e9, -1)], 1.2, 0.75, 5
            )
        )
        assert counts.size == 1
    finally:
        svc.shutdown()
    after = bm25_page2_pipeline(SF_TINY).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
