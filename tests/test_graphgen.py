"""Synthetic graph source + graph operators at non-toy node counts.

The sf* LSH dup graphs have <100 nodes, so these are the only tests
where connected_components / pagerank_over run against a graph with
real structure (chains + random glue). The CC oracle is a driver-side
union-find — exact, any graph."""

import numpy as np


def _union_find_labels(ep):
    nodes = sorted(set(ep["src"]) | set(ep["dst"]))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ep["src"], ep["dst"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    mins = {}
    for n in nodes:
        r = find(n)
        mins[r] = min(mins.get(r, n), n)
    return {n: mins[find(n)] for n in nodes}


def test_synthetic_edges_deterministic_across_parallelism(ray_session):
    from snowball_java_ray.sources.graphgen import synthetic_edges

    a = (
        synthetic_edges(5_000, 8_000, seed=11, n_shards=3)
        .to_pandas()
        .sort_values(["src", "dst"], ignore_index=True)
    )
    b = (
        synthetic_edges(5_000, 8_000, seed=11, n_shards=48)
        .to_pandas()
        .sort_values(["src", "dst"], ignore_index=True)
    )
    assert len(a) == 16_000  # both directions of every pair
    assert a.equals(b)
    # symmetric and in-range
    assert a["src"].between(0, 4_999).all()
    assert a["dst"].between(0, 4_999).all()
    assert (a["src"] != a["dst"]).all()


def test_connected_components_matches_union_find(ray_session):
    from snowball_java_ray.ops.dedup import connected_components
    from snowball_java_ray.sources.graphgen import synthetic_edges

    edges = synthetic_edges(4_000, 6_000, seed=3, n_shards=8).materialize()
    lab = connected_components(edges, max_iters=32).to_pandas()
    want = _union_find_labels(edges.to_pandas())
    got = dict(zip(lab["doc"], lab["lbl"]))
    assert got == want


def test_pagerank_over_conserves_and_is_deterministic(ray_session):
    from snowball_java_ray.constants import PAGERANK_SCALE
    from snowball_java_ray.ops.dedup import pagerank_over
    from snowball_java_ray.sources.graphgen import synthetic_edges

    edges = synthetic_edges(2_000, 4_000, seed=5, n_shards=8).materialize()
    r1 = (
        pagerank_over(edges, iters=4)
        .to_pandas()
        .sort_values("doc", ignore_index=True)
    )
    r2 = (
        pagerank_over(edges, iters=4)
        .to_pandas()
        .sort_values("doc", ignore_index=True)
    )
    assert r1[["doc", "r", "d"]].equals(r2[["doc", "r", "d"]])
    # every node keeps a positive integer rank; the damping floor is
    # 0.15 * SCALE minus integer-floor slack
    assert (r1["r"].to_numpy() >= (15 * PAGERANK_SCALE) // 100).all()
    assert r1["r"].dtype == np.int64
