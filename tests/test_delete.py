"""Tombstone deletes: logical mask + physical compaction.

Contract (pipelines/index_pipeline.delete_docs docstring): a logical
delete removes docs from every RESULT while global stats (df, avgdl,
n_docs) keep the full corpus until compact_index_with_tombstones
physically rewrites the chunks, after which the index scores exactly
like a fresh build over the live corpus (same doc_ids). Both halves
are also value-oracled at the driver gate (bm25_topk_deleted /
bm25_topk_compacted vs sqlgen SQL)."""

import os

import numpy as np
import pytest

from snowball_java_ray.constants import REFERENCE_QUERIES
from snowball_java_ray.pipelines.index_pipeline import (
    compact_index_with_tombstones,
    delete_docs,
    load_index,
    load_tombstones,
)
from snowball_java_ray.stages.score import score_query, score_query_wand
from tests.test_resume import N_DOCS, corpus_source

DELETED = np.arange(3, N_DOCS, 7)


@pytest.fixture(scope="module")
def built_dir(ray_session, tmp_path_factory):
    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
    )

    d = str(tmp_path_factory.mktemp("delidx") / "idx")
    build_index_checkpointed(corpus_source, d, N_DOCS, n_partitions=4,
                             shard_size=64)
    return d


def test_delete_docs_idempotent_union(built_dir):
    assert delete_docs(built_dir, DELETED[:10]) == 10
    assert delete_docs(built_dir, DELETED) == DELETED.size  # superset merge
    assert delete_docs(built_dir, DELETED) == DELETED.size  # re-delete no-op
    got = load_tombstones(built_dir)
    assert np.array_equal(got, DELETED)
    with pytest.raises(ValueError):
        delete_docs(built_dir, [N_DOCS])  # out of id space


def test_logical_delete_masks_results_keeps_stats(built_dir):
    delete_docs(built_dir, DELETED)
    idx = load_index(built_dir)
    # stats keep the FULL corpus until compaction
    assert idx.n_docs == N_DOCS
    assert idx.deleted.size == DELETED.size
    dset = set(DELETED.tolist())
    hits = 0
    for q in REFERENCE_QUERIES:
        docs, scores = score_query(idx, q)
        assert not (set(docs.tolist()) & dset)
        # WAND stays rank-identical to exact under the mask
        wd, ws = score_query_wand(idx, q)
        assert np.array_equal(docs, wd)
        assert np.allclose(scores, ws)
        hits += docs.size
    assert hits > 0


def test_logical_delete_scores_unchanged_for_survivors(built_dir):
    """The mask only FILTERS: a surviving doc's score is bit-identical
    to its undeleted score (stats untouched)."""
    delete_docs(built_dir, DELETED)
    masked = load_index(built_dir)
    clean = load_index(built_dir)
    clean.set_deleted([])
    q = REFERENCE_QUERIES[0]
    d_clean, s_clean = score_query(clean, q, top_k=10**9)
    d_mask, s_mask = score_query(masked, q, top_k=10**9)
    keep = ~np.isin(d_clean, DELETED)
    assert np.array_equal(d_clean[keep], d_mask)
    assert np.array_equal(s_clean[keep], s_mask)


def test_compaction_matches_filtered_rebuild(built_dir, tmp_path):
    """Physically compacted index == fresh build over the live corpus
    (same doc_ids, stats from live docs only)."""
    import pyarrow as pa

    delete_docs(built_dir, DELETED)
    cmp_dir = str(tmp_path / "compacted")
    compact_index_with_tombstones(built_dir, cmp_dir)

    def live_source(lo, hi):
        def keep_live(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            return t.filter(pa.array(ids % 7 != 3))

        return corpus_source(lo, hi).map_batches(
            keep_live, batch_format="pyarrow"
        )

    idx_c = load_index(cmp_dir)
    assert idx_c.n_docs == N_DOCS - DELETED.size
    assert idx_c.deleted.size == 0  # tombstones consumed
    # no deleted doc survives in any posting list
    dset = set(DELETED.tolist())
    for term in list(idx_c.chunks)[:50]:
        ids, _, _ = idx_c.postings(term)
        assert not (set(ids.tolist()) & dset)

    # equality with a ground-up rebuild over the filtered corpus
    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
    )

    ref_dir = str(tmp_path / "rebuild")
    build_index_checkpointed(live_source, ref_dir, N_DOCS, n_partitions=4,
                             shard_size=64)
    idx_r = load_index(ref_dir)
    # the rebuild's meta counts the doc_id SPACE (it was built over
    # [0, N_DOCS) with holes); rescale its stats to the live count the
    # way a real filtered-corpus build would see them
    live = N_DOCS - DELETED.size
    idx_r.avgdl = idx_r.avgdl * idx_r.n_docs / live
    idx_r.n_docs = live
    assert idx_c.n_docs == live
    assert abs(idx_c.avgdl - idx_r.avgdl) < 1e-9
    for q in REFERENCE_QUERIES:
        dc, sc = score_query(idx_c, q)
        dr, sr = score_query(idx_r, q)
        assert np.array_equal(dc, dr)
        assert np.allclose(sc, sr)

    # compaction is resumable/idempotent: second call is a manifest
    # no-op with byte-identical files
    import hashlib

    def digest(d):
        h = hashlib.md5()
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    before = digest(cmp_dir)
    compact_index_with_tombstones(built_dir, cmp_dir)
    assert digest(cmp_dir) == before


def test_sharded_service_masks_and_matches_broadcast(built_dir):
    """The sharded fleet under tombstones == the broadcast index under
    the same tombstones (per-shard tombstone slices compose)."""
    import ray

    from snowball_java_ray.stages.serve import BM25ShardedService

    delete_docs(built_dir, DELETED)
    idx = load_index(built_dir)
    svc = BM25ShardedService(built_dir)
    try:
        qds = ray.data.from_items(
            [{"query_id": i, "qtext": q}
             for i, q in enumerate(REFERENCE_QUERIES)]
        )
        got = (
            svc.topk_dataset(qds, algo="wand")
            .sort(["query_id", "rank"])
            .to_pandas()
        )
        dset = set(DELETED.tolist())
        assert not (set(got["doc_id"].tolist()) & dset)
        for qid, g in got.groupby("query_id"):
            docs, scores = score_query(idx, REFERENCE_QUERIES[int(qid)])
            assert np.array_equal(g["doc_id"].to_numpy(), docs)
        # boolean retrieval masks too
        hit_q = next(q for q in REFERENCE_QUERIES
                     if svc.boolean_or(q).size)
        assert not (set(svc.boolean_or(hit_q).tolist()) & dset)
        assert not (set(svc.boolean_and(hit_q).tolist()) & dset)
    finally:
        svc.shutdown()


def test_upsert_masks_originals_and_serves_new_versions(ray_session):
    """Upserted docs never appear under their old doc_id; their new
    tail doc_ids are retrievable; the pipeline is idempotent."""
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import UPSERT_MOD, UPSERT_REM
    from snowball_java_ray.pipelines.api import (
        bm25_topk_upserted_pipeline,
        collect_arrow,
    )
    from tests.conftest import SF_TINY

    n0 = pq.read_metadata(f"{SF_TINY}/documents.parquet").num_rows
    got = collect_arrow(bm25_topk_upserted_pipeline(SF_TINY)).to_pandas()
    old = got.loc[got["doc_id"] < n0, "doc_id"]
    assert not (old % UPSERT_MOD == UPSERT_REM).any()
    assert (got["doc_id"] >= n0).any()  # new versions do surface
    again = collect_arrow(
        bm25_topk_upserted_pipeline(SF_TINY)
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_full_lifecycle_compaction_equals_fresh_build(ray_session):
    """Capstone index-lifecycle chain: build -> tombstone the upsert
    set -> append new versions -> COMPACT -> the compacted index
    serves rank-identically to a fresh broadcast-index build over the
    post-upsert corpus (originals replaced, live stats), and fsck
    passes on the compacted directory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.constants import UPSERT_MOD, UPSERT_REM
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.api import (
        bm25_topk_upserted_pipeline,
        build_index,
        collect_arrow,
        ensure_index_dir,
        reference_queries_ds,
    )
    from snowball_java_ray.pipelines.index_pipeline import (
        compact_index_with_tombstones,
        verify_index,
    )
    from snowball_java_ray.stages.serve import BM25ShardedService
    from tests.conftest import SF_TINY

    # run the upsert pipeline once so the variant dir exists with
    # tombstones + appended segment
    collect_arrow(bm25_topk_upserted_pipeline(SF_TINY))
    up_dir = ensure_index_dir(SF_TINY, variant="upsert")
    cmp_dir = up_dir + "_compacted_test"
    compact_index_with_tombstones(up_dir, cmp_dir)
    assert verify_index(cmp_dir)["violations"] == 0

    svc = BM25ShardedService(cmp_dir)
    try:
        got = collect_arrow(
            svc.topk_dataset(reference_queries_ds(), algo="wand")
            .sort(["query_id", "rank"]).materialize()
        ).to_pandas()
    finally:
        svc.shutdown()

    # fresh broadcast index over the post-upsert corpus
    src = f"{SF_TINY}/documents.parquet"
    n0 = pq.read_metadata(src).num_rows

    def corpus(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        mask = ids % UPSERT_MOD == UPSERT_REM
        keep = t.filter(pa.array(~mask))
        upd = t.filter(pa.array(mask))
        new_ids = n0 + (ids[mask] - UPSERT_REM) // UPSERT_MOD
        new_txt = pc.binary_join_element_wise(
            pc.fill_null(upd["text"].combine_chunks(), ""),
            pa.scalar("updated"), " ",
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [ids[~mask], new_ids]
                    ), pa.int64()
                ),
                "content": pa.concat_arrays(
                    [pc.fill_null(keep["text"].combine_chunks(), ""),
                     new_txt]
                ),
            }
        )

    ds = ray.data.read_parquet(src, columns=["doc_id", "text"]).map_batches(
        corpus, batch_format="pyarrow"
    )
    n_live = (n0 - len(range(UPSERT_REM, n0, UPSERT_MOD))) + len(
        range(UPSERT_REM, n0, UPSERT_MOD)
    )
    idx = build_index(ds, n_docs=n_live)
    from snowball_java_ray.stages.score import topk_table

    import pandas as pd

    from snowball_java_ray.constants import REFERENCE_QUERIES

    want = topk_table(
        list(range(len(REFERENCE_QUERIES))), list(REFERENCE_QUERIES),
        idx, 1.2, 0.75, 10,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
