"""Property-based tests (hypothesis): codec round-trips and
tokenizer/oracle invariants hold for arbitrary inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from snowball_java_ray.functions.codec import (
    decode_postings,
    decode_varbyte,
    encode_postings,
    encode_varbyte,
)
from snowball_java_ray.functions.text import tokenize
from snowball_java_ray.functions.vectors import cosine


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_any(values):
    arr = np.array(values, dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(arr)).tolist() == values


@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=100),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip_any(doc_set, data):
    doc_ids = np.array(sorted(doc_set), dtype=np.int64)
    n = len(doc_ids)
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)),
        dtype=np.int32,
    )
    dls = np.array(
        data.draw(st.lists(st.integers(0, 10**6), min_size=n, max_size=n)),
        dtype=np.int32,
    )
    d, t, l = decode_postings(encode_postings(doc_ids, tfs, dls))
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_tokenizer_invariants(text):
    toks = tokenize(text)
    for t in toks:
        assert t == t.lower()
        assert t != ""
        assert not t.isdigit()
        # tokens contain only [a-z0-9]
        assert all("a" <= c <= "z" or "0" <= c <= "9" for c in t)
    # idempotent under re-tokenization of the joined output
    assert tokenize(" ".join(toks)) == toks


@given(
    st.dictionaries(st.text(min_size=1, max_size=5),
                    st.floats(-1e6, 1e6), max_size=8),
    st.dictionaries(st.text(min_size=1, max_size=5),
                    st.floats(-1e6, 1e6), max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_cosine_bounds(a, b):
    c = cosine(a, b)
    assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9


def test_empty_index_is_valid(ray_session):
    import pyarrow as pa

    from snowball_java_ray.stages.index_build import CHUNK_SCHEMA
    from snowball_java_ray.stages.score import InvertedIndex, score_query

    idx = InvertedIndex(CHUNK_SCHEMA.empty_table(), 0)
    d, s = score_query(idx, "anything at all")
    assert d.size == 0
    idx2 = InvertedIndex(pa.table({}), 5)
    d, s = score_query(idx2, "spark table")
    assert d.size == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),          # int key
            st.sampled_from(["a", "b", "c", "zz"]),          # str key
            st.integers(min_value=-1000, max_value=1000),    # value
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=20, deadline=None)
def test_hash_grouped_aggregate_matches_pandas(ray_session, rows, num_parts):
    """hash_grouped_aggregate (partitioned Arrow C++ group_by) equals a
    pandas reference aggregation for arbitrary keys, values and
    partition counts — including negative int keys and shared string
    keys across partitions."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        hash_grouped_aggregate(
            ds,
            ["k1", "k2"],
            [("v", "sum", "sv"), ("v", "min", "mv"), ("", "count_all", "n")],
            num_parts=num_parts,
        )
        .to_pandas()
        .sort_values(["k1", "k2"], ignore_index=True)
    )
    want = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(sv=("v", "sum"), mv=("v", "min"), n=("v", "size"))
        .sort_values(["k1", "k2"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "sv", "mv", "n"]], want, check_dtype=False
    )


def test_embed_lsh_subset_and_high_cos_recall(ray_session, tmp_path):
    """embed_dup_pairs_lsh is a strict subset of brute force, and at
    TRUE near-dup similarity (cos >= 0.95) the hamming<=1 probe rule
    recalls most pairs (sign-LSH power grows as angle shrinks)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.dedup import embed_dup_pairs, embed_dup_pairs_lsh

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    rows_id, rows_e = [], []
    vid = 0
    truth = 0
    for i in range(40):
        rows_id.append(vid); rows_e.append(base[i]); vid += 1
        # one near-duplicate per vector: tiny perturbation -> cos ~0.99
        rows_id.append(vid); rows_e.append(base[i] + 0.05 * rng.standard_normal(64)); vid += 1
        truth += 1
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array(rows_id, pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in rows_e],
                                  pa.list_(pa.float32())),
        }),
        d / "embeddings.parquet",
    )
    brute = embed_dup_pairs(str(d), threshold=0.95).to_pandas()
    lsh = embed_dup_pairs_lsh(str(d), threshold=0.95).to_pandas()
    bset = set(zip(brute.vec_a, brute.vec_b))
    lset = set(zip(lsh.vec_a, lsh.vec_b))
    assert lset <= bset
    assert len(bset) >= 30  # the synthetic near-dups qualify
    recall = len(lset & bset) / len(bset)
    assert recall >= 0.6, recall


@given(
    st.text(alphabet="abcdef", max_size=12),
    st.text(alphabet="abcdef", max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_levenshtein_twin_matches_duckdb(a, b):
    """The engine's edit-distance DP == DuckDB's levenshtein on
    arbitrary short strings (term_suggest correctness hinges on it)."""
    import duckdb

    from snowball_java_ray.ops.textstats import _levenshtein

    got = _levenshtein(a, b)
    exp = duckdb.connect().execute(
        "select levenshtein($1, $2)", [a, b]
    ).fetchone()[0]
    assert got == exp
