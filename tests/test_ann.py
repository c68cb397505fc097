"""ANN: the LSH variant must beat random candidate sampling — recall
greater than the fraction of the corpus it examines (LSH gain > 1)."""

import numpy as np

from snowball_java_ray.ops.ann import ann_topk, lsh_ann_topk
from tests.conftest import SF_TINY


def test_lsh_gain_over_random_sampling(ray_session):
    brute = ann_topk(SF_TINY).to_pandas()
    approx_tbl, stats = lsh_ann_topk(SF_TINY, n_planes=6, return_stats=True)
    approx = approx_tbl.to_pandas()
    coverage = stats["mean_candidates"] / stats["corpus_size"]
    recalls = []
    for qid, g in brute.groupby("query_vec_id"):
        truth = set(g["vec_id"])
        got = set(approx[approx["query_vec_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = float(np.mean(recalls))
    assert 0 < coverage < 0.6, coverage  # it really is approximate
    # LSH buckets hold near neighbors at a higher rate than random
    assert mean_recall > coverage, (mean_recall, coverage)


def test_lsh_deterministic(ray_session):
    a = lsh_ann_topk(SF_TINY).to_pandas()
    b = lsh_ann_topk(SF_TINY).to_pandas()
    assert a.equals(b)
