"""Predicate pushdown in the per-partition build read (VERDICT r2).

Pins two facts about ``read_parquet_doc_range``:
1. Row-level exactness: the Ray read returns exactly the [lo, hi) rows.
2. Row-group pruning actually happens: on a doc_id-sorted parquet with
   many row groups, the pyarrow scan layer (the same filter expression
   Ray passes down) selects only the row groups overlapping the range —
   i.e. each of P build partitions reads ~1/P of the input, not a full
   scan filtered after the fact.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from snowball_java_ray.sources.readers import read_parquet_doc_range

N = 1000
ROW_GROUP = 100  # 10 row groups


@pytest.fixture(scope="module")
def grouped_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pushdown") / "docs.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array([f"word{i} filler" for i in range(N)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP)
    assert pq.read_metadata(path).num_row_groups == N // ROW_GROUP
    return path


def test_range_read_exact(ray_session, grouped_parquet):
    ds = read_parquet_doc_range(grouped_parquet, 250, 500)
    got = sorted(
        v
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        for v in b["doc_id"].to_pylist()
    )
    assert got == list(range(250, 500))


def test_range_read_empty(ray_session, grouped_parquet):
    ds = read_parquet_doc_range(grouped_parquet, 5000, 6000)
    assert ds.count() == 0


def test_row_group_pruning(grouped_parquet):
    """The filter expression prunes via row-group statistics: a 1/4
    doc range touches only the overlapping row groups (3 of 10 here,
    not all 10) — the property that makes P partition reads cost one
    corpus scan in total instead of P."""
    frag = list(pads.dataset(grouped_parquet).get_fragments())[0]
    expr = (pc.field("doc_id") >= 250) & (pc.field("doc_id") < 500)
    kept = list(frag.split_by_row_group(expr))
    assert len(kept) == 3  # groups [200,300) [300,400) [400,500)


def test_build_output_identical_with_pushdown(ray_session, tmp_path):
    """The checkpointed build over the pushdown reader produces
    byte-identical chunk files to the old full-scan+post-filter source
    (same rows in, deterministic encode)."""
    import ray.data

    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
    )
    from snowball_java_ray.sources.corpus import gen_corpus_table

    src = str(tmp_path / "corpus.parquet")
    pq.write_table(gen_corpus_table(400, seed=7), src, row_group_size=50)

    def source_pushdown(lo, hi):
        return read_parquet_doc_range(src, lo, hi)

    def source_postfilter(lo, hi):
        return ray.data.read_parquet(src).map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["doc_id"], lo),
                    pc.less(t["doc_id"], hi),
                )
            ),
            batch_format="pyarrow",
        )

    d1, d2 = str(tmp_path / "idx1"), str(tmp_path / "idx2")
    build_index_checkpointed(source_pushdown, d1, 400, n_partitions=4,
                             shard_size=64)
    build_index_checkpointed(source_postfilter, d2, 400, n_partitions=4,
                             shard_size=64)
    files1 = sorted(f for f in os.listdir(d1) if f.endswith(".parquet"))
    files2 = sorted(f for f in os.listdir(d2) if f.endswith(".parquet"))
    assert files1 == files2
    for f in files1:
        t1 = pq.read_table(os.path.join(d1, f))
        t2 = pq.read_table(os.path.join(d2, f))
        assert t1.equals(t2), f
