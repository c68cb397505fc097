"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (ray.put once, fetched per task), partial top-k
per batch, exact merge via groupby(query). This is the verification
oracle for any approximate variant and the pattern for "small query
set x huge corpus" retrieval.

Scale paths (both value-checked against full DuckDB oracles AND
recall-tested vs brute force):
- ``lsh_ann_topk``: sign-pattern buckets from md5-derived hyperplanes,
  1-bit multiprobe, broadcast probe map, ONE streamed corpus scan.
- ``ivf_ann_topk``: deterministic coarse quantizer (nearest-centroid
  cells), nprobe probing, same single-scan shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from snowball_java_ray.constants import (
    ANN_LSH_PLANES,
    ANN_N_QUERIES,
    ANN_TOP_K,
    IVF_K,
    IVF_NPROBE,
    SCORE_GRID,
)

RANK_DECIMALS = 9
OUT_DECIMALS = 6


def tie_preserving_cut(ids: np.ndarray, scores: np.ndarray, top_k: int):
    """Partial top-k that keeps EVERY candidate at or above the k-th
    ROUNDED score, so the deterministic winner under (round(cos,
    RANK_DECIMALS) DESC, vec_id ASC) can never be dropped before the
    exact merge — the ONE cut rule shared by every ANN path (same rule
    as stages/score._topk_select)."""
    if scores.size <= top_k:
        return ids, scores
    r = np.round(scores, RANK_DECIMALS)
    kth = np.partition(r, r.size - top_k)[r.size - top_k]
    keep = r >= kth
    return ids[keep], scores[keep]


def _make_rank_merge(top_k: int):
    """groupby(query) merge with the shared deterministic ranking key."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["r"] = np.round(g["cos"].to_numpy(), RANK_DECIMALS)
        g = g.sort_values(["r", "vec_id"], ascending=[False, True]).head(top_k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        g["cos"] = np.round(g["cos"].to_numpy(), OUT_DECIMALS)
        return g[["query_vec_id", "rank", "vec_id", "cos"]]

    return merge


def _probe_scan(
    sf_dir: str,
    qids: np.ndarray,
    qmat: np.ndarray,
    probe: dict[int, list[int]],
    key_fn,
    top_k: int,
) -> ray.data.Dataset:
    """The shared approximate-ANN scan (lsh + ivf): broadcast the probe
    map + key function once, ONE streamed corpus pass scores each batch
    row only against the queries probing its bucket key (tie-preserving
    partial cut), then the exact groupby(query) merge. No shuffle; the
    corpus is never materialized anywhere."""
    import ray

    qref = ray.put((qids, qmat, probe, key_fn))

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        q_ids, q_mat, q_probe, kf = _ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        matn = mat / n[:, None]
        keys = kf(matn)
        out_q, out_v, out_c = [], [], []
        for key in np.unique(keys):
            qlist = q_probe.get(int(key))
            if not qlist:
                continue
            rows = np.flatnonzero(keys == key)
            cand_ids = ids[rows]
            cand_mat = matn[rows]
            for qi in qlist:
                mask = cand_ids != q_ids[qi]
                c_ids = cand_ids[mask]
                if c_ids.size == 0:
                    continue
                cos = cand_mat[mask] @ q_mat[qi]
                c_ids, cos = tie_preserving_cut(c_ids, cos, top_k)
                out_q.extend([int(q_ids[qi])] * c_ids.size)
                out_v.extend(c_ids.tolist())
                out_c.extend(cos.tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("query_vec_id")
        .map_groups(_make_rank_merge(top_k), batch_format="pandas")
        .sort(["query_vec_id", "rank"])
    )


def _load_queries(sf_dir: str, n_queries: int):
    """Query vectors via a FILTERED parquet read (row-group predicate
    pushdown) — only the vec_id < n_queries rows are decoded, never the
    whole embedding column on the driver (the right shape at 10^9
    vectors)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pc.field("vec_id") < n_queries,
    )
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


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
            if cand.size == 0:
                continue
            cand_ids, cand = tie_preserving_cut(cand_ids, cand, top_k)
            out_q.extend([int(q_ids[qi])] * cand_ids.size)
            out_v.extend(cand_ids.tolist())
            out_c.extend(cand.tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("query_vec_id")
        .map_groups(_make_rank_merge(top_k), batch_format="pandas")
        .sort(["query_vec_id", "rank"])
    )


def lsh_planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic md5-derived hyperplanes in [-1, 1) — the same
    bit-replicable-everywhere trick as the minhash mixing constants, so
    the DuckDB oracle (sqlgen.lsh_ann_sql) carries the IDENTICAL plane
    literals and the whole approximate pipeline is value-checkable.
    Uniform-cube projections are a standard substitute for gaussian in
    sign-LSH; recall vs brute force is pinned by tests/test_ann.py."""
    from snowball_java_ray.ops.dedup import md5int60

    # lsh_codes packs sign bits into uint32 and the SQL oracle casts
    # codes to BIGINT — more than 32 planes would silently corrupt
    # bucket keys (ADVICE r2); widen to uint64 + HUGEINT if ever needed
    if n_planes > 32:
        raise ValueError(f"sign-LSH supports at most 32 planes, got {n_planes}")

    vals = np.array(
        [
            md5int60(f"plane{p}:{d}") / float(1 << 59) - 1.0
            for p in range(n_planes)
            for d in range(dim)
        ],
        dtype=np.float64,
    )
    return vals.reshape(n_planes, dim)


def lsh_codes(matn: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket key per row (bit p set iff dot(v, plane_p)
    > 0). Sign is normalization-invariant, matching the SQL side's
    unnormalized inner products."""
    assert planes.shape[0] <= 32, "uint32 bucket keys hold at most 32 planes"
    bits = (matn @ planes.T > 0).astype(np.uint32)
    keys = np.zeros(len(matn), dtype=np.uint32)
    for p in range(planes.shape[0]):
        keys |= bits[:, p] << p
    return keys


def lsh_ann_topk(
    sf_dir: str,
    n_queries: int = ANN_N_QUERIES,
    top_k: int = ANN_TOP_K,
    n_planes: int = ANN_LSH_PLANES,
) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane buckets + 1-bit multiprobe,
    exact verify inside candidate buckets — distributed (VERDICT r1 fix
    #3): the probe map (bucket key -> probing queries, built from the
    small query side) is broadcast via ray.put; ONE corpus scan assigns
    each batch's bucket keys and scores only the vectors whose key some
    query probes (tie-preserving per-batch partial top-k); the exact
    merge is the same groupby(query) as ann_topk. No shuffle at all —
    strictly cheaper than the groupby(bucket) shape, and the corpus is
    never materialized anywhere.

    Candidate set == the serial definition: vectors whose bucket key is
    within hamming distance 1 of the query's key. Fully value-checked
    against the DuckDB oracle (md5-derived plane literals)."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    planes = lsh_planes(n_planes, qmat.shape[1])
    qcodes = lsh_codes(qmat, planes)
    probe: dict[int, list[int]] = {}
    for qi, k in enumerate(qcodes.tolist()):
        for key in [k] + [k ^ (1 << p) for p in range(n_planes)]:
            probe.setdefault(key, []).append(qi)
    return _probe_scan(
        sf_dir, qids, qmat, probe,
        lambda matn: lsh_codes(matn, planes),
        top_k,
    )


def _load_centroids(sf_dir: str, n_queries: int, k_cells: int):
    """Deterministic coarse quantizer: the corpus vectors with vec_id in
    [n_queries, n_queries + k_cells) are the cell centroids — a pure
    function of the table, so the DuckDB oracle selects the identical
    centroid set. (Real IVF trains k-means over a sample; any
    deterministic centroid table slots in here unchanged.)"""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=(pc.field("vec_id") >= n_queries)
        & (pc.field("vec_id") < n_queries + k_cells),
    )
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    mat = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def ivf_cells(matn: np.ndarray, cmatn: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment on ROUNDED cosine (9 decimals, ties
    to the smaller centroid id) — the same keying the SQL oracle uses,
    so borderline assignments can't diverge between numpy and DuckDB."""
    r = np.round(matn @ cmatn.T, RANK_DECIMALS)
    return np.argmax(r, axis=1).astype(np.int64)  # first max = smallest cid


def ivf_ann_topk(
    sf_dir: str,
    n_queries: int = ANN_N_QUERIES,
    top_k: int = ANN_TOP_K,
    k_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
) -> ray.data.Dataset:
    """IVF approximate top-k: every vector joins its nearest centroid's
    cell; each query probes its ``nprobe`` nearest cells; candidates
    are verified exactly. Distributed exactly like lsh_ann_topk: the
    centroid matrix + probe map broadcast once, ONE streamed corpus
    scan with tie-preserving partial top-k, exact groupby(query) merge.
    Fully SQL-oracled (sqlgen.ivf_ann_sql)."""
    qids, qmat = _load_queries(sf_dir, n_queries)
    cmatn = _load_centroids(sf_dir, n_queries, k_cells)
    qsims = np.round(qmat @ cmatn.T, RANK_DECIMALS)
    probe: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        cids = np.lexsort(
            (np.arange(k_cells), -qsims[qi])
        )[:nprobe]
        for c in cids.tolist():
            probe.setdefault(int(c), []).append(qi)
    return _probe_scan(
        sf_dir, qids, qmat, probe,
        lambda matn: ivf_cells(matn, cmatn),
        top_k,
    )


def _emb_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"],
    )


def _label_centroids(ds) -> tuple[dict[int, int], np.ndarray]:
    """Per-label centroid matrix from map-side INTEGER partial sums:
    each batch emits one (label, sum(round(x*1e6)), n) row per label
    present (commutative exact arithmetic — no float summation
    order), the driver combines the tiny labels x dim matrix and
    divides back to float once. Shared by embed_outliers and
    label_confusion. Returns ({label -> row}, centroid matrix with
    rows in ascending label order)."""

    def partial_sums(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        q = np.round(mat * 1e6).astype(np.int64)
        rows = {"label": [], "s": [], "n": []}
        for lb in np.unique(labels):
            m = labels == lb
            rows["label"].append(int(lb))
            rows["s"].append(q[m].sum(axis=0).tolist())
            rows["n"].append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(rows["label"], pa.int64()),
                "s": pa.array(rows["s"], pa.list_(pa.int64())),
                "n": pa.array(rows["n"], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        ds.map_batches(partial_sums, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for lb, s, n in zip(parts["label"].to_pylist(),
                        parts["s"].to_pylist(), parts["n"].to_pylist()):
        acc = sums.get(lb)
        sums[lb] = (np.asarray(s, np.int64) if acc is None
                    else acc + np.asarray(s, np.int64))
        counts[lb] = counts.get(lb, 0) + n
    labels_sorted = sorted(sums)
    cent = np.stack(
        [sums[lb] / (counts[lb] * 1e6) for lb in labels_sorted]
    )
    return {lb: i for i, lb in enumerate(labels_sorted)}, cent


def embed_quantize(sf_dir: str) -> ray.data.Dataset:
    """Int8 symmetric quantization audit — the compression step an
    embedding store applies before ANN serving: per vector, scale =
    max-abs over dims, q_j = floor(x_j * 127 / maxabs + 0.5), and the
    published row carries the scale plus exact integer aggregates of
    the quantized code (sum and L1 mass) — enough to verify the
    quantizer end-to-end without shipping the codes.

    One streamed scan, vectorized numpy per batch, no shuffle.
    Determinism: float32 inputs are widened to float64 (exact), every
    op in the quantize expression is IEEE correctly-rounded
    (*, /, +, floor — no libm), and both engines evaluate the SAME
    expression tree, so q is bit-identical by construction; sums are
    int64-exact. All-zero vectors quantize to 0 (guarded divide).
    Oracle: ``sqlgen.embed_quantize_sql``."""

    def fn(t: pa.Table) -> pa.Table:
        mat = np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        # A NaN/Inf coordinate makes maxabs non-finite and floor(NaN)
        # an arbitrary int64 here, while the DuckDB oracle's BIGINT
        # cast raises — fail loudly so both engines agree on bad input
        if not np.isfinite(mat).all():
            bad = t["vec_id"].to_numpy(zero_copy_only=False)[
                ~np.isfinite(mat).all(axis=1)
            ]
            raise ValueError(
                f"embed_quantize: non-finite embedding values in "
                f"vec_ids {bad[:5].tolist()}"
            )
        maxabs = np.abs(mat).max(axis=1)
        safe = np.where(maxabs > 0, maxabs, 1.0)
        q = np.floor(mat * 127.0 / safe[:, None] + 0.5).astype(np.int64)
        q[maxabs == 0] = 0
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "n_dims": pa.array(
                    np.full(mat.shape[0], mat.shape[1], np.int64),
                    pa.int64(),
                ),
                # published on the SCORE_GRID via the boundary-proof
                # floor quantizer (see constants.SCORE_GRID; raw
                # maxabs stays the quantizer scale inside the
                # expression — self-review r5)
                "maxabs": pa.array(
                    np.floor(maxabs * SCORE_GRID + 0.5) / SCORE_GRID,
                    pa.float64(),
                ),
                "sum_q": pa.array(q.sum(axis=1), pa.int64()),
                "sum_q_abs": pa.array(
                    np.abs(q).sum(axis=1), pa.int64()
                ),
            }
        )

    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        .map_batches(fn, batch_format="pyarrow")
        .sort("vec_id")
    )


def embed_outliers(sf_dir: str) -> pa.Table:
    """Embedding-space audit: for each label, the EMB_OUTLIER_K
    vectors farthest from their label's centroid (lowest cosine
    first) — the review queue for mislabeled or out-of-distribution
    examples in an embedding table.

    Determinism across engines: centroids come from per-dimension
    INTEGER sums of round(x*1e6) (commutative exact arithmetic — no
    float summation order), divided back to float once; the cosine
    itself is a fixed-dimension-order dot product, absorbed by the
    usual round-9 rank / round-6 emit discipline (same as ann_topk).

    Scale shape: pass 1 emits per-batch integer partial sums (one
    labels x dim int64 matrix per batch — map-side combine), reduced
    on the driver (labels x dim is tiny); the centroid matrix ships
    once via ray.put; pass 2 scores every vector in one streamed scan
    and keeps a per-batch bottom-K per label, so driver traffic is
    O(blocks x labels x K). Oracle: ``sqlgen.embed_outliers_sql``."""
    import ray

    from snowball_java_ray.constants import (
        EMB_OUTLIER_K,
        RANK_ROUND_DECIMALS,
        SCORE_ROUND_DECIMALS,
    )

    ds = _emb_ds(sf_dir)
    lab_index, cent = _label_centroids(ds)
    cent_ref = ray.put((lab_index, cent))

    def bottomk(t: pa.Table) -> pa.Table:
        import ray as _ray

        lidx, c = _ray.get(cent_ref)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        ci = np.array([lidx[int(lb)] for lb in labels], np.int64)
        cm = c[ci]
        dot = np.einsum("ij,ij->i", mat, cm)
        cos = dot / (np.linalg.norm(mat, axis=1) * np.linalg.norm(cm, axis=1))
        out = {"label": [], "vec_id": [], "cos": []}
        for lb in np.unique(labels):
            m = labels == lb
            v, s = vids[m], cos[m]
            order = np.lexsort((v, np.round(s, RANK_ROUND_DECIMALS)))
            order = order[:EMB_OUTLIER_K]
            out["label"].extend([int(lb)] * order.size)
            out["vec_id"].extend(v[order].tolist())
            out["cos"].extend(s[order].tolist())
        return pa.table(
            {
                "label": pa.array(out["label"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cos": pa.array(out["cos"], pa.float64()),
            }
        )

    cand = pa.concat_tables(
        ds.map_batches(bottomk, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    labels = cand["label"].to_numpy(zero_copy_only=False)
    vids = cand["vec_id"].to_numpy(zero_copy_only=False)
    cos = cand["cos"].to_numpy(zero_copy_only=False)
    out = {"label": [], "rank": [], "vec_id": [], "cos": []}
    for lb in sorted(set(labels.tolist())):
        m = labels == lb
        v, s = vids[m], cos[m]
        order = np.lexsort((v, np.round(s, RANK_ROUND_DECIMALS)))
        order = order[:EMB_OUTLIER_K]
        out["label"].extend([int(lb)] * order.size)
        out["rank"].extend(range(1, order.size + 1))
        out["vec_id"].extend(v[order].tolist())
        out["cos"].extend(
            np.round(s[order], SCORE_ROUND_DECIMALS).tolist()
        )
    return pa.table(
        {
            "label": pa.array(out["label"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int32()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cos": pa.array(out["cos"], pa.float64()),
        }
    )


def label_confusion(sf_dir: str) -> pa.Table:
    """Label-purity audit: for every vector, the NEAREST label
    centroid (round-9 cosine DESC, label ASC on ties), aggregated to
    a (label, pred_label, n) confusion table — off-diagonal mass
    flags label noise or collapsed clusters in an embedding table.

    Same centroid machinery as ``embed_outliers``; scoring is one
    streamed scan with a (batch x dim) @ (dim x labels) matmul and a
    first-occurrence argmax over rounded scores (= smallest label on
    ties, matching the oracle's window order); per-batch confusion
    partials reduce driver-side (labels^2 is tiny). Oracle:
    ``sqlgen.label_confusion_sql``."""
    import ray

    from snowball_java_ray.constants import RANK_ROUND_DECIMALS

    ds = _emb_ds(sf_dir)
    lab_index, cent = _label_centroids(ds)
    labels_sorted = np.array(sorted(lab_index), np.int64)
    cn = cent / np.linalg.norm(cent, axis=1)[:, None]
    cent_ref = ray.put((labels_sorted, cn))

    def confuse(t: pa.Table) -> pa.Table:
        import ray as _ray

        labs, c = _ray.get(cent_ref)
        lb = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        cos = (mat / n[:, None]) @ c.T
        # first-occurrence argmax over rounded scores = smallest
        # label among ties (centroid rows are in ascending label
        # order)
        pred = labs[np.argmax(np.round(cos, RANK_ROUND_DECIMALS), axis=1)]
        key = lb * (1 << 32) + pred
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "label": pa.array(uk >> 32, pa.int64()),
                "pred_label": pa.array(uk & ((1 << 32) - 1), pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        ds.map_batches(confuse, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    out = parts.group_by(["label", "pred_label"]).aggregate([("n", "sum")])
    out = out.rename_columns(["label", "pred_label", "n"])
    import pyarrow.compute as pc

    out = out.set_column(2, "n", pc.cast(out["n"], pa.int64()))
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("label", "ascending"), ("pred_label", "ascending")],
        )
    )


def ann_recall(
    sf_dir: str, n_queries: int = ANN_N_QUERIES, top_k: int = ANN_TOP_K
) -> pa.Table:
    """ANN quality eval: per-query recall@k and top-1 hit rate of the
    sign-LSH scale path against the brute-force exact ground truth —
    the eval-hygiene counterpart of the north star's "top-k
    rank-identity rate". Both legs run as their normal distributed
    pipelines; the merge is output-bounded (O(n_queries x k) rows), so
    a driver-side Arrow join is the honest shape here — at large Q
    this becomes a hash join on (query_vec_id, vec_id), same keys.

    top1_hit = 1 iff the approximate leg's rank-1 vector IS the exact
    rank-1 vector (both legs share the deterministic
    (round(cos,9) DESC, vec_id ASC) tie rule, so this is well-defined).
    """
    import pyarrow.compute as pc

    def gather(ds) -> pd.DataFrame:
        return pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        ).to_pandas()

    brute = gather(ann_topk(sf_dir, n_queries, top_k))
    approx = gather(lsh_ann_topk(sf_dir, n_queries, top_k))

    m = brute.merge(
        approx, on=["query_vec_id", "vec_id"], how="left",
        suffixes=("", "_a"),
    )
    per_q = (
        m.assign(
            hit=m["rank_a"].notna().astype("int64"),
            t1=((m["rank"] == 1) & (m["rank_a"] == 1)).astype("int64"),
        )
        .groupby("query_vec_id", as_index=False)
        .agg(n_overlap=("hit", "sum"), top1_hit=("t1", "max"))
        .sort_values("query_vec_id")
    )
    out = pa.table(
        {
            "query_vec_id": pa.array(per_q["query_vec_id"], pa.int64()),
            "n_overlap": pa.array(per_q["n_overlap"], pa.int64()),
            "recall": pa.array(
                np.round(per_q["n_overlap"].to_numpy() / float(top_k), 4),
                pa.float64(),
            ),
            "top1_hit": pa.array(per_q["top1_hit"], pa.int64()),
        }
    )
    return out


def kmeans_clusters(sf_dir: str) -> ray.data.Dataset:
    """Deterministic distributed k-means (Lloyd's) over the embedding
    table — the iterative-algorithm shape on Ray Data: per iteration
    ONE streamed scan assigns every vector to its argmax-cosine
    centroid and emits integer-quantized per-cluster partial sums
    (map-side combine, one row per (cluster, batch)); the driver
    reduces the tiny K x dim matrix and re-broadcasts it via ray.put.
    After KMEANS_ITERS rounds a final scan emits every vector's
    cluster and its cosine to the final centroid.

    Determinism contract (mirrored by sqlgen.kmeans_clusters_sql):
    init = the KMEANS_K lowest-vec_id vectors (cid = init rank);
    assignment rounds cosine to RANK_ROUND_DECIMALS and breaks ties
    toward the lower cid; centroid sums are exact int64 arithmetic so
    partial-sum order can't drift; empty clusters drop out of the
    centroid set (their cids never reappear)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.constants import (
        KMEANS_ITERS,
        KMEANS_K,
        RANK_ROUND_DECIMALS,
        SCORE_ROUND_DECIMALS,
    )

    init = (
        pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=pc.field("vec_id") < KMEANS_K,
        )
        .sort_by("vec_id")
    )
    cent = np.stack(
        init["embedding"].to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    cids = np.arange(len(init), dtype=np.int64)

    ds = _emb_ds(sf_dir)

    def assign(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        """Row index (into c) of each vector's centroid."""
        dots = mat @ c.T
        cos = dots / (
            np.linalg.norm(mat, axis=1)[:, None]
            * np.linalg.norm(c, axis=1)[None, :]
        )
        # argmax returns the FIRST max index and c rows are in
        # ascending-cid order, so ties go to the lower cid
        return np.argmax(np.round(cos, RANK_ROUND_DECIMALS), axis=1)

    for _ in range(KMEANS_ITERS):
        ref = ray.put((cids, cent))

        def partial(t: pa.Table) -> pa.Table:
            import ray as _ray

            k_ids, c = _ray.get(ref)
            mat = np.stack(
                t["embedding"].to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            ai = assign(mat, c)
            q = np.round(mat * 1e6).astype(np.int64)
            rows = {"cid": [], "s": [], "n": []}
            for j in np.unique(ai):
                m = ai == j
                rows["cid"].append(int(k_ids[j]))
                rows["s"].append(q[m].sum(axis=0).tolist())
                rows["n"].append(int(m.sum()))
            return pa.table(
                {
                    "cid": pa.array(rows["cid"], pa.int64()),
                    "s": pa.array(rows["s"], pa.list_(pa.int64())),
                    "n": pa.array(rows["n"], pa.int64()),
                }
            )

        parts = pa.concat_tables(
            ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            ),
            promote_options="default",
        )
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for cid, s, n in zip(parts["cid"].to_pylist(),
                             parts["s"].to_pylist(),
                             parts["n"].to_pylist()):
            acc = sums.get(cid)
            sums[cid] = (np.asarray(s, np.int64) if acc is None
                         else acc + np.asarray(s, np.int64))
            counts[cid] = counts.get(cid, 0) + n
        alive = sorted(sums)
        cent = np.stack([sums[c] / (counts[c] * 1e6) for c in alive])
        cids = np.array(alive, np.int64)

    final_ref = ray.put((cids, cent))

    def emit(t: pa.Table) -> pa.Table:
        import ray as _ray

        k_ids, c = _ray.get(final_ref)
        mat = np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        dots = mat @ c.T
        cos = dots / (
            np.linalg.norm(mat, axis=1)[:, None]
            * np.linalg.norm(c, axis=1)[None, :]
        )
        ai = np.argmax(np.round(cos, RANK_ROUND_DECIMALS), axis=1)
        best = cos[np.arange(len(mat)), ai]
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(k_ids[ai], pa.int64()),
                "cos": pa.array(
                    np.round(best, SCORE_ROUND_DECIMALS), pa.float64()
                ),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow").sort("vec_id")


def ann_filtered(
    sf_dir: str, n_queries: int = ANN_N_QUERIES, top_k: int = ANN_TOP_K
) -> ray.data.Dataset:
    """Metadata-filtered vector search: exact cosine top-k among
    candidates with label == ANN_FILTER_LABEL only (pre-filter
    semantics — the filter applies BEFORE the cut, so the result is
    exact within the filtered set; the Lucene/vector-db filtered-ANN
    contract). Same broadcast-probe single-scan shape as ann_topk;
    the label mask is one vectorized compare pushed into the scan."""
    import pyarrow.compute as pc
    import ray

    from snowball_java_ray.constants import ANN_FILTER_LABEL

    qids, qmat = _load_queries(sf_dir, n_queries)
    qref = ray.put((qids, qmat))

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        t = t.filter(pc.equal(t["label"], ANN_FILTER_LABEL))
        if len(t) == 0:
            return pa.table(
                {
                    "query_vec_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        q_ids, q_mat = _ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(
            t["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        sims = q_mat @ (mat / n[:, None]).T
        out_q, out_v, out_c = [], [], []
        for qi in range(len(q_ids)):
            mask = ids != q_ids[qi]
            cand_ids = ids[mask]
            cand = sims[qi][mask]
            if cand.size == 0:
                continue
            cand_ids, cand = tie_preserving_cut(cand_ids, cand, top_k)
            out_q.extend([int(q_ids[qi])] * cand_ids.size)
            out_v.extend(cand_ids.tolist())
            out_c.extend(cand.tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("query_vec_id")
        .map_groups(_make_rank_merge(top_k), batch_format="pandas")
        .sort(["query_vec_id", "rank"])
    )
