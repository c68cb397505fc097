"""Index integrity checker (index_pipeline.verify_index): clean on a
fresh build, detects summary-column corruption and truncated chunk
payloads."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from snowball_java_ray.pipelines.index_pipeline import (
    build_index_checkpointed,
    verify_index,
)
from tests.test_resume import N_DOCS, corpus_source


def _build(tmp_path):
    d = str(tmp_path / "idx")
    build_index_checkpointed(corpus_source, d, N_DOCS, n_partitions=4,
                             shard_size=64)
    return d


def test_fsck_clean_index(ray_session, tmp_path):
    d = _build(tmp_path)
    rep = verify_index(d)
    assert rep["violations"] == 0 and not rep["errors"]
    assert rep["files"] == 4 and rep["chunks"] > 0 and rep["postings"] > 0


def test_fsck_detects_corruption(ray_session, tmp_path):
    d = _build(tmp_path)
    f = sorted(
        p for p in os.listdir(d)
        if p.startswith("chunks_") and p.endswith(".parquet")
    )[0]
    path = os.path.join(d, f)
    t = pq.read_table(path)
    # corrupt one summary column and truncate one payload
    df = t["df"].to_pylist()
    df[0] += 1
    data = t["data"].to_pylist()
    if len(data) > 1:
        data[1] = data[1][: max(0, len(data[1]) - 3)]
    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(df, t["df"].type))
    t = t.set_column(t.schema.get_field_index("data"), "data",
                     pa.array(data, t["data"].type))
    pq.write_table(t, path)
    rep = verify_index(d)
    assert rep["violations"] >= 2
    assert rep["errors"]
