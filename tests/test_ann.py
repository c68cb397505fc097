"""ANN: the LSH variant must beat random candidate sampling — recall
greater than the fraction of the corpus it examines (LSH gain > 1) —
and the distributed pipeline must equal the serial candidate-rule
definition exactly (it is also SQL-oracled in the driver gate)."""

import numpy as np
import pyarrow.parquet as pq

from snowball_java_ray.constants import ANN_LSH_PLANES, ANN_N_QUERIES
from snowball_java_ray.ops.ann import ann_topk, lsh_ann_topk, lsh_codes, lsh_planes
from snowball_java_ray.ops.dedup import popcount64
from tests.conftest import SF_TINY


def _codes_and_ids():
    tbl = pq.read_table(
        f"{SF_TINY}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    planes = lsh_planes(ANN_LSH_PLANES, mat.shape[1])
    return ids, lsh_codes(mat / n[:, None], planes)


def test_lsh_gain_over_random_sampling(ray_session):
    brute = ann_topk(SF_TINY).to_pandas()
    approx = lsh_ann_topk(SF_TINY).to_pandas()

    # candidate coverage under the hamming<=1 probe rule, computed from
    # the same deterministic codes the pipeline uses
    ids, codes = _codes_and_ids()
    qsel = ids < ANN_N_QUERIES
    n_corpus = len(ids) - 1
    cover = [
        int(
            (popcount64(codes.astype(np.uint64) ^ np.uint64(codes[qi])) <= 1).sum()
            - 1
        )
        for qi in np.flatnonzero(qsel)
    ]
    coverage = float(np.mean(cover)) / n_corpus

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


def test_lsh_candidates_match_probe_rule(ray_session):
    """Every returned neighbor is within hamming 1 of the query's code
    (the serial candidate definition the distributed scan implements)."""
    approx = lsh_ann_topk(SF_TINY).to_pandas()
    ids, codes = _codes_and_ids()
    code_of = dict(zip(ids.tolist(), codes.tolist()))
    for qid, vid in zip(approx["query_vec_id"], approx["vec_id"]):
        d = bin(code_of[qid] ^ code_of[vid]).count("1")
        assert d <= 1, (qid, vid, d)


def test_ivf_recall_and_determinism(ray_session):
    """IVF probe (nprobe of K cells) must beat random sampling of the
    same fraction, and repeated runs are identical."""
    from snowball_java_ray.constants import IVF_K, IVF_NPROBE
    from snowball_java_ray.ops.ann import ivf_ann_topk

    brute = ann_topk(SF_TINY).to_pandas()
    a = ivf_ann_topk(SF_TINY).to_pandas()
    b = ivf_ann_topk(SF_TINY).to_pandas()
    assert a.equals(b)
    recalls = []
    for qid, g in brute.groupby("query_vec_id"):
        truth = set(g["vec_id"])
        got = set(a[a["query_vec_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = float(np.mean(recalls))
    # nprobe/K of the corpus examined on average (cells are uneven, but
    # the bound holds loosely); recall must beat that fraction
    assert mean_recall > IVF_NPROBE / IVF_K, mean_recall


def test_embed_outliers_brute_equivalence(ray_session):
    """embed_outliers == a brute numpy recomputation (integer-sum
    centroid, cosine bottom-k per label)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import (
        EMB_OUTLIER_K,
        RANK_ROUND_DECIMALS,
    )
    from snowball_java_ray.ops.ann import embed_outliers
    from tests.conftest import SF_TINY

    got = embed_outliers(SF_TINY).to_pandas()
    t = pq.read_table(f"{SF_TINY}/embeddings.parquet")
    labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    for lb in np.unique(labels):
        m = labels == lb
        q = np.round(mat[m] * 1e6).astype(np.int64)
        cent = q.sum(axis=0) / (m.sum() * 1e6)
        cos = mat[m] @ cent / (
            np.linalg.norm(mat[m], axis=1) * np.linalg.norm(cent)
        )
        order = np.lexsort((vids[m], np.round(cos, RANK_ROUND_DECIMALS)))
        want = vids[m][order][:EMB_OUTLIER_K].tolist()
        g = got[got["label"] == lb]
        assert g["vec_id"].tolist() == want
        assert g["rank"].tolist() == list(range(1, len(want) + 1))


def test_label_confusion_totals(ray_session):
    """Confusion counts partition the vector set; every vector is
    assigned exactly one predicted label."""
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.ann import label_confusion
    from tests.conftest import SF_TINY

    got = label_confusion(SF_TINY).to_pandas()
    n_vecs = pq.read_metadata(f"{SF_TINY}/embeddings.parquet").num_rows
    assert got["n"].sum() == n_vecs
    per_label = got.groupby("label")["n"].sum()
    import numpy as np

    t = pq.read_table(f"{SF_TINY}/embeddings.parquet", columns=["label"])
    labels, counts = np.unique(
        t["label"].to_numpy(zero_copy_only=False), return_counts=True
    )
    for lb, c in zip(labels, counts):
        assert per_label[lb] == c


def test_ann_recall_bounds_and_consistency(ray_session):
    """recall in [0,1] and == n_overlap/k; one row per query; top1_hit
    implies overlap >= 1."""
    from snowball_java_ray.constants import ANN_N_QUERIES, ANN_TOP_K
    from snowball_java_ray.ops.ann import ann_recall

    t = ann_recall(SF_TINY).to_pandas()
    assert len(t) == ANN_N_QUERIES
    assert t["query_vec_id"].is_unique
    assert ((t["recall"] >= 0) & (t["recall"] <= 1)).all()
    assert (t["recall"] == (t["n_overlap"] / ANN_TOP_K).round(4)).all()
    assert (t.loc[t["top1_hit"] == 1, "n_overlap"] >= 1).all()


def test_kmeans_matches_serial_numpy(ray_session):
    """Distributed k-means == a serial numpy Lloyd's run with the
    same determinism contract (init by vec_id, round-9 argmax ties to
    lower cid, integer-quantized centroid sums)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import (
        KMEANS_ITERS,
        KMEANS_K,
        RANK_ROUND_DECIMALS,
        SCORE_ROUND_DECIMALS,
    )
    from snowball_java_ray.ops.ann import kmeans_clusters
    from tests.conftest import SF_TINY

    got = kmeans_clusters(SF_TINY).to_pandas()

    t = pq.read_table(
        f"{SF_TINY}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    vids = t["vec_id"].to_numpy(zero_copy_only=False)

    def cos_to(c):
        return (mat @ c.T) / (
            np.linalg.norm(mat, axis=1)[:, None]
            * np.linalg.norm(c, axis=1)[None, :]
        )

    cent = mat[:KMEANS_K].copy()
    cids = np.arange(KMEANS_K)
    q = np.round(mat * 1e6).astype(np.int64)
    for _ in range(KMEANS_ITERS):
        ai = np.argmax(np.round(cos_to(cent), RANK_ROUND_DECIMALS), axis=1)
        alive = np.unique(ai)
        cent = np.stack(
            [q[ai == j].sum(axis=0) / ((ai == j).sum() * 1e6)
             for j in alive]
        )
        cids = cids[alive]
    cos = cos_to(cent)
    ai = np.argmax(np.round(cos, RANK_ROUND_DECIMALS), axis=1)
    want_cluster = cids[ai]
    want_cos = np.round(cos[np.arange(len(mat)), ai], SCORE_ROUND_DECIMALS)

    assert (got["vec_id"].to_numpy() == vids).all()
    assert (got["cluster"].to_numpy() == want_cluster).all()
    assert np.allclose(got["cos"].to_numpy(), want_cos, atol=0, rtol=0)
    # every vector at least as close to its own centroid as to others
    best = np.round(cos, RANK_ROUND_DECIMALS).max(axis=1)
    own = np.round(cos[np.arange(len(mat)), ai], RANK_ROUND_DECIMALS)
    assert (own >= best).all()


def test_ann_filtered_subset_of_label(ray_session):
    """Every filtered hit carries the filter label; results equal
    brute-force over the filtered subset."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import (
        ANN_FILTER_LABEL,
        ANN_N_QUERIES,
        ANN_TOP_K,
    )
    from snowball_java_ray.ops.ann import ann_filtered
    from tests.conftest import SF_TINY

    got = ann_filtered(SF_TINY).to_pandas()
    emb = pq.read_table(f"{SF_TINY}/embeddings.parquet").to_pandas()
    lab = dict(zip(emb["vec_id"], emb["label"]))
    assert all(lab[v] == ANN_FILTER_LABEL for v in got["vec_id"])
    # brute recompute for one query
    q = emb[emb["vec_id"] == 0].iloc[0]
    qv = np.asarray(q["embedding"], dtype="float64")
    qv = qv / np.linalg.norm(qv)
    cand = emb[(emb["label"] == ANN_FILTER_LABEL) & (emb["vec_id"] != 0)]
    m = np.stack(cand["embedding"].to_numpy()).astype("float64")
    m = m / np.linalg.norm(m, axis=1)[:, None]
    cos = m @ qv
    ids = cand["vec_id"].to_numpy()
    order = np.lexsort((ids, -np.round(cos, 9)))[:ANN_TOP_K]
    want = ids[order]
    have = got.loc[got["query_vec_id"] == 0, "vec_id"].to_numpy()
    assert (have == want).all()
