"""Resume correctness: killed build + resume => byte-identical index
and identical top-k (north rule, SURVEY.md §5.3)."""

import json
import os

import numpy as np
import pytest

from snowball_java_ray.constants import REFERENCE_QUERIES
from snowball_java_ray.pipelines.api import build_index, documents_as_corpus
from snowball_java_ray.pipelines.index_pipeline import (
    build_index_checkpointed,
    load_index,
)
from snowball_java_ray.stages.score import score_query
from tests.conftest import SF_TINY

N_DOCS = 500


def corpus_source(lo, hi):
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    # doc-range predicate: in production a parquet row filter (pushdown)
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
        ),
        batch_format="pyarrow",
    )
    from snowball_java_ray.pipelines.api import _corpus_batch

    return ds.map_batches(_corpus_batch, batch_format="pyarrow")


def test_killed_build_resumes_identically(ray_session, tmp_path):
    full_dir = str(tmp_path / "full")
    resumed_dir = str(tmp_path / "resumed")

    # single-shot build
    build_index_checkpointed(corpus_source, full_dir, N_DOCS, n_partitions=4,
                             shard_size=64)
    # "killed" build: only 2 of 4 partitions complete
    entries = build_index_checkpointed(
        corpus_source, resumed_dir, N_DOCS, n_partitions=4, shard_size=64,
        max_partitions=2,
    )
    assert sum(1 for e in entries.values() if e["state"] == "done") == 2
    assert not os.path.exists(os.path.join(resumed_dir, "meta.json"))

    # resume completes the remaining partitions only
    entries = build_index_checkpointed(
        corpus_source, resumed_dir, N_DOCS, n_partitions=4, shard_size=64
    )
    assert sum(1 for e in entries.values() if e["state"] == "done") == 4

    # byte-identical partition outputs
    for f in sorted(os.listdir(full_dir)):
        if f.endswith(".parquet"):
            a = open(os.path.join(full_dir, f), "rb").read()
            b = open(os.path.join(resumed_dir, f), "rb").read()
            assert a == b, f

    # identical query results, also vs the one-shot in-memory build
    idx_full = load_index(full_dir)
    idx_res = load_index(resumed_dir)
    idx_mem = build_index(documents_as_corpus(SF_TINY), n_docs=N_DOCS, shard_size=64)
    for q in REFERENCE_QUERIES[:8]:
        d0, s0 = score_query(idx_mem, q)
        d1, s1 = score_query(idx_full, q)
        d2, s2 = score_query(idx_res, q)
        assert d0.tolist() == d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2) and np.array_equal(s0, s1), q


def test_load_index_nonlexicographic_bounds(ray_session, tmp_path):
    """Partition bounds whose doc_lo values do NOT sort lexicographically
    (step=63: "126" < "63" as strings) + a shard_size that makes partition
    boundaries split shards. load_index must still produce doc_id-ordered
    per-term postings and identical top-k to the one-shot build."""
    d = str(tmp_path / "nonlex")
    build_index_checkpointed(corpus_source, d, N_DOCS, n_partitions=8,
                             shard_size=64)
    idx = load_index(d)
    idx_mem = build_index(documents_as_corpus(SF_TINY), n_docs=N_DOCS, shard_size=64)
    # every term's postings strictly increasing in doc_id
    checked = 0
    for term in list(idx.chunks)[:200]:
        doc_ids, _, _ = idx.postings(term)
        assert np.all(np.diff(doc_ids) > 0), term
        checked += 1
    assert checked > 0
    for q in REFERENCE_QUERIES[:8]:
        d0, s0 = score_query(idx_mem, q)
        d1, s1 = score_query(idx, q)
        assert d0.tolist() == d1.tolist(), q
        assert np.array_equal(s0, s1), q


def test_manifest_metrics(ray_session, tmp_path):
    d = str(tmp_path / "m")
    entries = build_index_checkpointed(corpus_source, d, N_DOCS, n_partitions=2,
                                       shard_size=64)
    for e in entries.values():
        assert e["state"] == "done"
        assert e["n_chunks"] > 0 and e["bytes"] > 0 and e["seconds"] >= 0
    man = json.load(open(os.path.join(d, "manifest.json")))
    assert len(man) == 2


def test_extraction_checkpoint_resumes_identically(ray_session, tmp_path):
    """S8 parity: killed extraction + resume => byte-identical tuple
    partitions, and the bootstrap over loaded tuples equals the
    one-shot bootstrap (reference: bin/Snowball.java:45-71)."""
    import ray.data

    from snowball_java_ray.config import EngineConfig
    from snowball_java_ray.pipelines.snowball import (
        extract_tuples_checkpointed,
        load_tuples,
        snowball_bootstrap,
    )
    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.sources.corpus import DEFAULT_SEEDS, gen_corpus_table

    cfg = EngineConfig()
    n_docs = 300
    tbl = gen_corpus_table(n_docs, seed=7, tagged_fraction=0.6)

    def corpus_source(lo, hi):
        return ray.data.from_arrow(tbl.slice(lo, hi - lo))

    full_dir = str(tmp_path / "full")
    resumed_dir = str(tmp_path / "resumed")
    extract_tuples_checkpointed(corpus_source, full_dir, n_docs, cfg,
                                n_partitions=4)
    entries = extract_tuples_checkpointed(
        corpus_source, resumed_dir, n_docs, cfg, n_partitions=4,
        max_partitions=2,
    )
    assert sum(1 for e in entries.values() if e["state"] == "done") == 2
    entries = extract_tuples_checkpointed(
        corpus_source, resumed_dir, n_docs, cfg, n_partitions=4
    )
    assert sum(1 for e in entries.values() if e["state"] == "done") == 4

    for f in sorted(os.listdir(full_dir)):
        if f.endswith(".parquet"):
            a = open(os.path.join(full_dir, f), "rb").read()
            b = open(os.path.join(resumed_dir, f), "rb").read()
            assert a == b, f

    # bootstrap over checkpoint-loaded tuples == one-shot bootstrap
    loaded = load_tuples(resumed_dir)
    index = build_index(ray.data.from_arrow(tbl), n_docs=n_docs, shard_size=256)
    r1 = snowball_bootstrap(
        ray.data.from_arrow(tbl), DEFAULT_SEEDS, EngineConfig(), index.df,
        index.n_docs,
    )
    r2 = snowball_bootstrap(
        None, DEFAULT_SEEDS, EngineConfig(), index.df, index.n_docs,
        tuples_ds=ray.data.from_arrow(loaded),
    )
    import pandas as pd

    key = ["e1", "e2", "doc_id", "sentence"]
    pd.testing.assert_frame_equal(
        r1.tuples.sort_values(key, ignore_index=True),
        r2.tuples.sort_values(key, ignore_index=True),
    )
    pd.testing.assert_frame_equal(r1.patterns, r2.patterns)


def test_incremental_append_equals_full_build(ray_session, tmp_path):
    """Continuous ingest: build over docs [0, 250), append [250, 500) as
    a new partition — queries through both load_index and the sharded
    service equal a from-scratch full build (idf/avgdl re-derived from
    the grown chunk summaries)."""
    from snowball_java_ray.pipelines.index_pipeline import append_partition
    from snowball_java_ray.stages.serve import BM25ShardedService

    grown_dir = str(tmp_path / "grown")
    full_dir = str(tmp_path / "full2")

    build_index_checkpointed(corpus_source, grown_dir, 250, n_partitions=2,
                             shard_size=64)
    append_partition(corpus_source, grown_dir, 250, 500)
    build_index_checkpointed(corpus_source, full_dir, N_DOCS, n_partitions=4,
                             shard_size=64)

    idx_grown = load_index(grown_dir)
    idx_full = load_index(full_dir)
    assert idx_grown.n_docs == idx_full.n_docs == N_DOCS
    assert idx_grown.df == idx_full.df
    for q in REFERENCE_QUERIES[:8]:
        d1, s1 = score_query(idx_grown, q)
        d2, s2 = score_query(idx_full, q)
        assert d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2), q

    svc_g = BM25ShardedService(grown_dir)
    svc_f = BM25ShardedService(full_dir)
    try:
        for q in REFERENCE_QUERIES[:4]:
            assert svc_g.boolean_and(q).tolist() == svc_f.boolean_and(q).tolist()
    finally:
        svc_g.shutdown()
        svc_f.shutdown()


def test_append_rejects_gap_and_overlap(ray_session, tmp_path):
    """ADVICE r2: a gapped append (lo > n_docs) would silently inflate
    n_docs with phantom doc_ids and shift every BM25 idf — both gaps
    and overlaps must raise; the contiguous re-append stays idempotent."""
    import pytest

    from snowball_java_ray.pipelines.index_pipeline import append_partition

    d = str(tmp_path / "gap")
    build_index_checkpointed(corpus_source, d, 250, n_partitions=2,
                             shard_size=64)
    with pytest.raises(ValueError, match="gap"):
        append_partition(corpus_source, d, 300, 400)
    with pytest.raises(ValueError, match="overlaps"):
        append_partition(corpus_source, d, 100, 400)
    # contiguous append works, and re-appending the same range is a
    # no-op (at-least-once delivery)
    append_partition(corpus_source, d, 250, 500)
    append_partition(corpus_source, d, 250, 500)
    assert load_index(d).n_docs == 500
