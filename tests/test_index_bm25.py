"""Conformance gate: Ray index/BM25 == pure-Python oracle == DuckDB SQL
on the sf0.001 documents corpus (SURVEY.md §5.2 — the north-rule
rank-identity criterion)."""

import duckdb
import pyarrow.parquet as pq
import pytest

from snowball_java_ray import oracle
from snowball_java_ray.constants import REFERENCE_QUERIES, SCORE_ROUND_DECIMALS
from snowball_java_ray.pipelines.api import (
    bm25_topk_pipeline,
    build_index,
    collect_arrow,
    documents_as_corpus,
    term_df_pipeline,
)
from snowball_java_ray.stages.score import InvertedIndex, merge_topk, score_query
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture(scope="module")
def oracle_idx(docs):
    return oracle.build_index(docs)


@pytest.fixture(scope="module")
def engine_index(ray_session, docs):
    corpus = documents_as_corpus(SF_TINY)
    return build_index(corpus, n_docs=len(docs), shard_size=64)


def test_dictionary_matches_oracle(ray_session, oracle_idx):
    tbl = collect_arrow(term_df_pipeline(SF_TINY))
    got = {
        t: (d, c)
        for t, d, c in zip(
            tbl["term"].to_pylist(), tbl["df"].to_pylist(), tbl["cf"].to_pylist()
        )
    }
    want = {t: (oracle_idx.df[t], oracle_idx.cf[t]) for t in oracle_idx.df}
    assert got == want


def test_index_stats_match_oracle(engine_index, oracle_idx):
    idx = engine_index
    assert idx.n_docs == oracle_idx.n_docs
    assert idx.avgdl == pytest.approx(oracle_idx.avgdl, abs=0)
    assert idx.df == oracle_idx.df
    # multi-chunk path actually exercised (shard_size=64 < 500 docs)
    assert max(len(v) for v in idx.chunks.values()) > 1


def test_postings_match_oracle(engine_index, oracle_idx):
    idx = engine_index
    for term, plist in oracle_idx.postings.items():
        doc_ids, tfs, dls = idx.postings(term)
        assert list(zip(doc_ids.tolist(), tfs.tolist())) == plist, term
        # embedded per-posting doc lengths match the oracle's doc_len map
        assert dls.tolist() == [oracle_idx.doc_len[d] for d in doc_ids.tolist()], term


def test_topk_rank_identity_vs_oracle(engine_index, oracle_idx):
    """North rule: rank-identical top-k docIDs AND scores."""
    idx = engine_index
    for q in REFERENCE_QUERIES:
        want = oracle.bm25_topk(oracle_idx, q)
        doc_ids, scores = score_query(idx, q)
        got = list(zip(doc_ids.tolist(), scores.tolist()))
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q


def test_merge_topk_equals_global(engine_index):
    """Scatter/gather combiner: merging per-shard top-k == global top-k
    (the documented multi-node scale path)."""
    import numpy as np

    idx = engine_index
    q = "table value scan merge"
    full_d, full_s = score_query(idx, q, top_k=10)
    # simulate two doc-range shards by splitting candidate space
    d_all, s_all = score_query(idx, q, top_k=idx.n_docs)
    mid = 250
    lo = (d_all[d_all < mid], s_all[d_all < mid])
    hi = (d_all[d_all >= mid], s_all[d_all >= mid])
    md, ms = merge_topk([lo, hi], top_k=10)
    assert md.tolist() == full_d.tolist()
    assert np.allclose(ms, full_s)


def test_topk_pipeline_matches_duckdb_sql(ray_session, docs):
    """Full Ray actor-pool pipeline == generated DuckDB oracle SQL."""
    from snowball_java_ray.sqlgen import bm25_topk_sql

    got = collect_arrow(bm25_topk_pipeline(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{SF_TINY}/documents.parquet'"
    )
    want = con.execute(bm25_topk_sql()).df()
    assert len(got) == len(want)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["query_id"].tolist() == want["query_id"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert (
        (got["score"] - want["score"]).abs() < 10 ** -(SCORE_ROUND_DECIMALS - 1)
    ).all()


def test_zero_hit_queries(engine_index):
    idx = engine_index
    for q in ("the a of", "zzzunknown qqqabsent", ""):
        doc_ids, scores = score_query(idx, q)
        assert len(doc_ids) == 0
