"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (ray.put once, fetched per task), partial top-k
per batch, exact merge via groupby(query). This is the verification
oracle for any approximate variant and the pattern for "small query
set x huge corpus" retrieval.

Scale path: random-hyperplane LSH bucketing (``lsh_ann_topk``): each
vector keyed by sign-pattern buckets from P deterministic hyperplanes;
queries probe their own bucket (+ multiprobe neighbors); candidates
verified exactly. Bucket assignment is a stateless vectorized map;
bucket lookup a groupby — same shuffle shape as MinHash-LSH dedup.
Tested for recall against the brute-force baseline, not for equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from snowball_java_ray.constants import ANN_N_QUERIES, ANN_TOP_K

RANK_DECIMALS = 9
OUT_DECIMALS = 6


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = ids < n_queries
    mat = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)[sel]).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids[sel], mat / norms[:, None]


def ann_topk(
    sf_dir: str, n_queries: int = ANN_N_QUERIES, top_k: int = ANN_TOP_K
) -> ray.data.Dataset:
    """Exact brute-force cosine top-k for the first ``n_queries``
    vectors (self excluded). Deterministic ranking:
    (round(cos, 9) DESC, vec_id ASC)."""
    import ray

    qids, qmat = _load_queries(sf_dir, n_queries)
    qref = ray.put((qids, qmat))

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        q_ids, q_mat = _ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        sims = q_mat @ (mat / n[:, None]).T  # (Q, B)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(q_ids)):
            mask = ids != q_ids[qi]
            cand_ids = ids[mask]
            cand = sims[qi][mask]
            take = min(top_k, cand.size)
            if take == 0:
                continue
            part = np.argpartition(-cand, take - 1)[:take]
            out_q.extend([int(q_ids[qi])] * take)
            out_v.extend(cand_ids[part].tolist())
            out_c.extend(cand[part].tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["r"] = np.round(g["cos"].to_numpy(), RANK_DECIMALS)
        g = g.sort_values(["r", "vec_id"], ascending=[False, True]).head(top_k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        g["cos"] = np.round(g["cos"].to_numpy(), OUT_DECIMALS)
        return g[["query_vec_id", "rank", "vec_id", "cos"]]

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("query_vec_id")
        .map_groups(merge, batch_format="pandas")
        .sort(["query_vec_id", "rank"])
    )


def lsh_ann_topk(
    sf_dir: str,
    n_queries: int = ANN_N_QUERIES,
    top_k: int = ANN_TOP_K,
    n_planes: int = 8,
    seed: int = 42,
    return_stats: bool = False,
):
    """Approximate variant: random-hyperplane buckets + 1-bit
    multiprobe, exact verify inside candidate buckets. Returns the same
    schema as ann_topk; recall measured in tests, not exact-matched."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    dim = matn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    codes = (matn @ planes.T > 0).astype(np.uint32)
    keys = np.zeros(len(ids), dtype=np.uint32)
    for p in range(n_planes):
        keys |= codes[:, p] << p

    buckets: dict[int, np.ndarray] = {}
    for k in np.unique(keys):
        buckets[int(k)] = np.flatnonzero(keys == k)

    out_q, out_r, out_v, out_c = [], [], [], []
    n_cand_total = 0
    for qi in np.flatnonzero(ids < n_queries):
        key = int(keys[qi])
        cand_keys = [key] + [key ^ (1 << p) for p in range(n_planes)]
        cand = np.concatenate([buckets.get(k, np.empty(0, np.int64)) for k in cand_keys])
        cand = cand[ids[cand.astype(np.int64)] != ids[qi]].astype(np.int64)
        n_cand_total += int(cand.size)
        if cand.size == 0:
            continue
        sims = matn[cand] @ matn[qi]
        r = np.round(sims, RANK_DECIMALS)
        order = np.lexsort((ids[cand], -r))[:top_k]
        take = len(order)
        out_q.extend([int(ids[qi])] * take)
        out_r.extend(range(1, take + 1))
        out_v.extend(ids[cand[order]].tolist())
        out_c.extend(np.round(sims[order], OUT_DECIMALS).tolist())
    tbl = pa.table(
        {
            "query_vec_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        }
    )
    if return_stats:
        n_q = int((ids < n_queries).sum())
        return tbl, {
            "mean_candidates": n_cand_total / max(n_q, 1),
            "corpus_size": int(len(ids)) - 1,
        }
    return tbl
