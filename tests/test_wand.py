"""Block-max WAND must return rank-identical top-k (docIDs AND scores)
vs the exact term-at-a-time scorer — on the real corpus and on random
synthetic corpora (SURVEY.md §7 build plan step 6)."""

import numpy as np
import pytest

from snowball_java_ray.constants import REFERENCE_QUERIES
from snowball_java_ray.pipelines.api import build_index, documents_as_corpus
from snowball_java_ray.stages.score import score_query, score_query_wand
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def idx(ray_session):
    # small shard_size => many chunks => real skipping opportunities
    return build_index(documents_as_corpus(SF_TINY), n_docs=500, shard_size=32)


def test_wand_equals_exact_reference_queries(idx):
    for q in REFERENCE_QUERIES:
        d1, s1 = score_query(idx, q)
        d2, s2 = score_query_wand(idx, q)
        assert d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2), q  # bit-identical floats


def test_wand_equals_exact_random_queries(idx):
    rng = np.random.default_rng(123)
    vocab = list(idx.df.keys())
    for _ in range(50):
        n = int(rng.integers(1, 6))
        q = " ".join(rng.choice(vocab, size=n))
        d1, s1 = score_query(idx, q, top_k=5)
        d2, s2 = score_query_wand(idx, q, top_k=5)
        assert d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2), q


def test_wand_random_corpus(ray_session):
    import ray.data

    from snowball_java_ray.sources.corpus import gen_corpus_table

    tbl = gen_corpus_table(300, seed=7, tagged_fraction=0.3)
    idx = build_index(ray.data.from_arrow(tbl), n_docs=300, shard_size=16)
    rng = np.random.default_rng(7)
    vocab = list(idx.df.keys())
    for _ in range(30):
        q = " ".join(rng.choice(vocab, size=int(rng.integers(1, 5))))
        d1, s1 = score_query(idx, q)
        d2, s2 = score_query_wand(idx, q)
        assert d1.tolist() == d2.tolist(), q
        assert np.array_equal(s1, s2), q


def test_wand_zero_hit(idx):
    d, s = score_query_wand(idx, "zzz the a of")
    assert d.size == 0
