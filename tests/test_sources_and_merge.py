"""Tagged-text source, result sinks, segment compaction, retrieval
integration, and property-based index conformance."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from snowball_java_ray import oracle
from snowball_java_ray.pipelines.api import build_index
from snowball_java_ray.stages.score import InvertedIndex, score_query


def test_read_tagged_text(ray_session, tmp_path):
    from snowball_java_ray.sources.readers import read_tagged_text

    p = tmp_path / "sentences.txt"
    p.write_text(
        "The <ORG>Acme</ORG> opened in <LOC>Lisbon</LOC> today .\n"
        "\n"
        "plain line\n"
    )
    ds = read_tagged_text(str(p))
    rows = ds.take_all()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["content"].startswith("The <ORG>")
    assert rows[1]["content"] == ""


def test_write_results_roundtrip(ray_session, tmp_path):
    import pandas as pd

    from snowball_java_ray.sources.readers import pretty_tuples, write_results

    t = pd.DataFrame(
        {"e1": ["A"], "e2": ["B"], "doc_id": [1], "sentence": ["s"],
         "confidence": [0.9]}
    )
    p = pd.DataFrame({"pattern_id": [0], "n_tuples": [2], "positive": [2],
                      "negative": [0], "confidence": [1.0]})
    write_results(t, p, str(tmp_path / "out"))
    back = pq.read_table(str(tmp_path / "out" / "tuples.parquet")).to_pandas()
    assert back["e1"].tolist() == ["A"]
    assert "0.900000\tA\tB\ts" in pretty_tuples(t)


def test_compact_chunks_equals_single_shot(ray_session, tmp_path):
    """Non-shard-aligned partitions -> compaction == single-shot build."""
    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
        compact_chunks,
        load_index,
    )
    from tests.test_resume import N_DOCS, corpus_source
    from snowball_java_ray.constants import REFERENCE_QUERIES
    from snowball_java_ray.pipelines.api import documents_as_corpus
    from tests.conftest import SF_TINY

    d = str(tmp_path / "parts")
    # 3 partitions of 167 docs vs shard_size 64 -> misaligned boundaries
    build_index_checkpointed(corpus_source, d, N_DOCS, n_partitions=3,
                             shard_size=64)
    idx_multi = load_index(d)
    # some (term, shard) must own >1 chunk before compaction
    import glob
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in
                            sorted(glob.glob(f"{d}/chunks_*.parquet"))])
    key_counts = tbl.group_by(["term", "shard"]).aggregate([("base", "count")])
    assert max(key_counts["base_count"].to_pylist()) > 1
    compacted = compact_chunks(tbl)
    key_counts2 = compacted.group_by(["term", "shard"]).aggregate(
        [("base", "count")]
    )
    assert max(key_counts2["base_count"].to_pylist()) == 1

    idx_single = build_index(documents_as_corpus(SF_TINY), n_docs=N_DOCS,
                             shard_size=64)
    idx_comp = InvertedIndex(compacted, N_DOCS)
    for q in REFERENCE_QUERIES[:6]:
        d0, s0 = score_query(idx_single, q)
        d1, s1 = score_query(idx_multi, q)
        d2, s2 = score_query(idx_comp, q)
        assert d0.tolist() == d1.tolist() == d2.tolist(), q
        assert np.array_equal(s0, s1) and np.array_equal(s0, s2), q


def test_retrieval_superset_of_seed_matches(ray_session):
    import ray.data

    from snowball_java_ray.config import EngineConfig
    from snowball_java_ray.pipelines.snowball import (
        extract_tuples,
        retrieve_seed_candidate_docs,
    )
    from snowball_java_ray.sources.corpus import DEFAULT_SEEDS, gen_corpus_table

    tbl = gen_corpus_table(400, seed=42, tagged_fraction=0.6)
    idx = build_index(ray.data.from_arrow(tbl), n_docs=400, shard_size=128)
    cand = set(retrieve_seed_candidate_docs(idx, DEFAULT_SEEDS).tolist())
    assert cand  # retrieval found something
    # every doc whose extracted tuple matches a seed must be retrieved
    tuples = extract_tuples(
        ray.data.from_arrow(tbl), EngineConfig()
    ).take_all()
    seeds_l = {(a.lower(), b.lower()) for a, b in DEFAULT_SEEDS}
    must = {
        r["doc_id"] for r in tuples
        if (r["e1"].lower(), r["e2"].lower()) in seeds_l
    }
    assert must, "fixture has no seed occurrences"
    assert must <= cand


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_property_random_corpus_engine_equals_oracle(ray_session, seed):
    """Property-based conformance (SURVEY.md §5.4): random small corpora
    -> engine index == oracle index, top-k rank-identical."""
    import ray.data

    from snowball_java_ray.sources.corpus import gen_corpus_table

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 200))
    tbl = gen_corpus_table(n, seed=seed, tagged_fraction=float(rng.random()))
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()))
    oidx = oracle.build_index(docs)
    eidx = build_index(
        ray.data.from_arrow(tbl), n_docs=n,
        shard_size=int(rng.integers(16, 128)), text_col="content",
    )
    assert eidx.df == oidx.df
    vocab = list(oidx.df)
    for _ in range(10):
        q = " ".join(rng.choice(vocab, size=int(rng.integers(1, 4))))
        want = oracle.bm25_topk(oidx, q)
        got_d, got_s = score_query(eidx, q)
        assert got_d.tolist() == [d for d, _ in want], q
        for gs, (_, ws) in zip(got_s.tolist(), want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_read_tagged_text_gzip(ray_session, tmp_path):
    """.gz corpora read identically to plain text."""
    import gzip

    from snowball_java_ray.sources.readers import read_tagged_text

    lines = "first line\n\n<ORG>A Corp</ORG> is in <LOC>Lisbon</LOC> .\n"
    p_txt = tmp_path / "c.txt"
    p_gz = tmp_path / "c.txt.gz"
    p_txt.write_text(lines)
    with gzip.open(p_gz, "wt", encoding="utf-8") as f:
        f.write(lines)
    a = read_tagged_text(str(p_txt)).to_pandas()
    b = read_tagged_text(str(p_gz)).to_pandas()
    assert a["content"].tolist() == b["content"].tolist()
    assert a["doc_id"].tolist() == b["doc_id"].tolist() == [0, 1, 2]


def test_read_jsonl_corpus(ray_session, tmp_path):
    """Distributed JSONL source produces the input_hint corpus shape
    with the sha invariant intact."""
    import json

    from snowball_java_ray.pipelines.api import verify_sha_batch
    from snowball_java_ray.sources.readers import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    rows = [
        {"doc_id": 7, "content": "hello tokenizer world", "lang": "py"},
        {"doc_id": 9, "content": "another document body", "lang": "go"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl_corpus(str(p))
    out = (
        ds.map_batches(verify_sha_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [7, 9]
    assert out["lang"].tolist() == ["py", "go"]
    assert set(out.columns) == {
        "doc_id", "repo", "path", "commit", "lang", "content",
        "content_sha256",
    }


def test_salted_bucketed_join_identical(ray_session):
    """Hot-key salting (probe side split, build side replicated) is
    result-identical to the unsalted bucketed join."""
    import ray.data

    from snowball_java_ray.ops.joins import bucketed_hash_join
    from tests.conftest import SF_TINY

    orders = ray.data.read_parquet(
        f"{SF_TINY}/orders.parquet", columns=["o_custkey", "o_totalprice", "o_orderkey"]
    )
    customer = ray.data.read_parquet(
        f"{SF_TINY}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    plain = (
        bucketed_hash_join(orders, customer, "o_custkey", "c_custkey")
        .to_pandas()
        .sort_values(["o_orderkey"], ignore_index=True)
    )
    salted = (
        bucketed_hash_join(
            orders, customer, "o_custkey", "c_custkey",
            salt=4, salt_on="o_orderkey",
        )
        .to_pandas()
        .sort_values(["o_orderkey"], ignore_index=True)
    )
    assert plain[sorted(plain.columns)].equals(salted[sorted(salted.columns)])


def test_bucketed_join_equals_pandas_merge_randomized(ray_session):
    """The Acero bucketed join == a driver-side pandas inner merge on
    randomized frames covering the contract's edge shapes: duplicate
    keys (row multiplication), keys present on only one side,
    single-side-empty buckets, a fully empty side, and differing key
    names."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from snowball_java_ray.ops.joins import bucketed_hash_join

    rng = np.random.default_rng(1234)
    for trial, (nl, nr, kmax) in enumerate(
        [(200, 150, 30), (50, 400, 10), (300, 0, 20), (1, 1, 1)]
    ):
        left = pd.DataFrame(
            {
                "k": rng.integers(0, kmax + 1, nl),
                "lv": rng.integers(-(10**6), 10**6, nl),
            }
        )
        right = pd.DataFrame(
            {
                "k2": rng.integers(0, kmax + 1, nr) if nr else
                np.array([], np.int64),
                "rv": rng.integers(-(10**6), 10**6, nr) if nr else
                np.array([], np.int64),
            }
        )
        got = bucketed_hash_join(
            ray.data.from_arrow(pa.Table.from_pandas(left)),
            ray.data.from_arrow(pa.Table.from_pandas(right)),
            "k",
            "k2",
            n_buckets=4,
        ).to_pandas()
        want = left.merge(right, left_on="k", right_on="k2")
        assert len(got) == len(want), trial
        if len(want):
            cols = sorted(want.columns)
            g = got[cols].sort_values(cols, ignore_index=True)
            w = want[cols].sort_values(cols, ignore_index=True)
            for c in cols:
                assert (g[c].values == w[c].values).all(), (trial, c)
                assert str(g[c].dtype) == "int64", (trial, c)
        # left-outer path (the sf0.001 curated_corpus shape: right
        # side possibly empty, unmatched left rows null-extended)
        gout = bucketed_hash_join(
            ray.data.from_arrow(pa.Table.from_pandas(left)),
            ray.data.from_arrow(pa.Table.from_pandas(right)),
            "k",
            "k2",
            n_buckets=4,
            join_type="left outer",
        ).to_pandas()
        wout = left.merge(right, left_on="k", right_on="k2", how="left")
        assert len(gout) == len(wout), trial
        gl = gout.sort_values(["k", "lv"], ignore_index=True)
        wl = wout.sort_values(["k", "lv"], ignore_index=True)
        assert (gl["k"].values == wl["k"].values).all(), trial
        assert (
            gl["rv"].isna().sum() == wl["rv"].isna().sum()
        ), trial
        # restored right-key column: NULL on unmatched left rows,
        # equal to the left key on matched ones — full value compare
        # against the pandas merge (pandas nullable-float k2 vs ours)
        assert (gl["k2"].isna().values == wl["k2"].isna().values).all(), trial
        m = ~wl["k2"].isna().values
        assert (
            gl["k2"].values[m].astype(np.int64)
            == wl["k2"].values[m].astype(np.int64)
        ).all(), trial
        assert (gl["rv"].isna().values == wl["rv"].isna().values).all(), trial


def test_bucket_hash_float_zero_canonical():
    """-0.0 and 0.0 compare equal as join keys, so they must land in
    the same bucket (bit-pattern hashing alone would split them)."""
    import numpy as np

    from snowball_java_ray.ops.joins import _bucket_of

    neg = _bucket_of(np.array([-0.0, 1.5, -0.0]), 16)
    pos = _bucket_of(np.array([0.0, 1.5, 0.0]), 16)
    assert (neg == pos).all()


def test_compact_chunks_ds_equals_driver_compactor(ray_session, tmp_path):
    """The distributed segment merge == the driver-side compactor ==
    scoring-identical to a single-shot build."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from snowball_java_ray.constants import REFERENCE_QUERIES
    from snowball_java_ray.pipelines.api import build_index, documents_as_corpus
    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
        compact_chunks,
        compact_chunks_ds,
    )
    from snowball_java_ray.stages.score import InvertedIndex, score_query
    from tests.conftest import SF_TINY
    from tests.test_resume import corpus_source

    d = str(tmp_path / "multi")
    # step=63 bounds + shard-splitting boundaries -> multi-chunk groups
    build_index_checkpointed(corpus_source, d, 500, n_partitions=8,
                             shard_size=64)
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{d}/chunks_*.parquet"))
    raw = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="default")
    driver_side = compact_chunks(raw)
    dist = pa.concat_tables(
        compact_chunks_ds(ray.data.from_arrow(raw)).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    a = driver_side.sort_by([("term", "ascending"), ("shard", "ascending")])
    b = dist.sort_by([("term", "ascending"), ("shard", "ascending")])
    assert a.equals(b.cast(a.schema))

    # one chunk per (term, shard) after compaction
    import collections

    keys = list(zip(b["term"].to_pylist(), b["shard"].to_pylist()))
    assert max(collections.Counter(keys).values()) == 1

    idx = InvertedIndex(b, 500)
    idx_mem = build_index(documents_as_corpus(SF_TINY), n_docs=500,
                          shard_size=64)
    for q in REFERENCE_QUERIES[:6]:
        d1, s1 = score_query(idx, q)
        d2, s2 = score_query(idx_mem, q)
        assert d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2), q


def test_q3_shipping_filters(ray_session):
    """Q3 results respect the segment + date predicates and rank by
    exact-cents revenue descending."""
    from datetime import datetime

    import pyarrow.parquet as pq

    from snowball_java_ray.constants import Q3_CUTOFF, Q3_SEGMENT, Q3_TOP_K
    from snowball_java_ray.ops.relational import q3_shipping
    from tests.conftest import SF_TINY

    got = q3_shipping(SF_TINY).to_pandas()
    assert 0 < len(got) <= Q3_TOP_K
    cutoff = datetime.fromisoformat(Q3_CUTOFF)
    assert (got["o_orderdate"] < cutoff).all()
    assert (got["revenue"] > 0).all()
    assert got["revenue"].is_monotonic_decreasing
    orders = pq.read_table(
        f"{SF_TINY}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas().set_index("o_orderkey")
    cust = pq.read_table(
        f"{SF_TINY}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).to_pandas().set_index("c_custkey")
    for ok in got["o_orderkey"]:
        seg = cust.loc[orders.loc[ok, "o_custkey"], "c_mktsegment"]
        assert seg == Q3_SEGMENT
