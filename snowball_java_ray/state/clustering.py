"""Single-pass clustering + pattern centroids (reference §2.9 / A4).

The one genuinely sequential operator in the reference
(/root/reference/snowball/src/clustering/Singlepass.java:16-57): result
depends on input order, so it runs driver-side over the (small)
seed-matched tuple set, with the order PINNED by a deterministic sort
key — the fidelity-over-parallelism call documented in SURVEY.md §2.9.

Centroid semantics (clustering/SnowballPattern.java:113-196): per zone,
take the member vector with the most terms as key support; centroid
value = sum of member weights over those keys divided by the NUMBER OF
CENTROID KEYS (a reference quirk, reproduced); the reference's
right-centroid copy-paste bug (line 138 reads `tuple.middle`) is fixed
to the evident intent (`tuple.right`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from snowball_java_ray.config import EngineConfig
from snowball_java_ray.functions.vectors import SparseVec, zone_similarity


@dataclass
class ClusterTuple:
    e1: str
    e2: str
    doc_id: int
    sentence: str
    left: SparseVec
    middle: SparseVec
    right: SparseVec


@dataclass
class Pattern:
    pattern_id: int
    members: list[ClusterTuple] = field(default_factory=list)
    left_c: SparseVec = field(default_factory=dict)
    middle_c: SparseVec = field(default_factory=dict)
    right_c: SparseVec = field(default_factory=dict)
    positive: int = 0
    negative: int = 0
    confidence: float = 0.0


def _zone_centroid(vectors: list[SparseVec]) -> SparseVec:
    """SnowballPattern.java:113-196 semantics (right-zone bug fixed)."""
    if not vectors:
        return {}
    support = max(vectors, key=lambda v: len(v))  # first max wins (Java loop)
    keys = list(support.keys())
    if not keys:
        return {}
    denom = float(len(keys))
    return {
        k: sum(v.get(k, 0.0) for v in vectors) / denom for k in keys
    }


def recompute_centroids(p: Pattern) -> None:
    p.left_c = _zone_centroid([t.left for t in p.members])
    p.middle_c = _zone_centroid([t.middle for t in p.members])
    p.right_c = _zone_centroid([t.right for t in p.members])


def pattern_similarity(p: Pattern, t: ClusterTuple, cfg: EngineConfig) -> float:
    """Pattern centroid is the `a` side (empty-zone weight reallocation
    keyed off the pattern, Snowball.java:176-179 argument order)."""
    return zone_similarity(
        p.left_c, p.middle_c, p.right_c,
        t.left, t.middle, t.right,
        cfg.weight_left_context, cfg.weight_middle_context,
        cfg.weight_right_context,
    )


def single_pass(tuples: list[ClusterTuple], cfg: EngineConfig) -> list[Pattern]:
    """Singlepass.java:16-57. Caller MUST pass tuples in a
    deterministic order (sort by (e1, e2, doc_id, sentence))."""
    patterns: list[Pattern] = []
    for t in tuples:
        if not patterns:
            p = Pattern(pattern_id=0, members=[t])
            recompute_centroids(p)
            patterns.append(p)
            continue
        sims = [pattern_similarity(p, t, cfg) for p in patterns]
        best_i = max(range(len(sims)), key=lambda i: (sims[i], -i))
        if sims[best_i] < cfg.min_degree_match:
            p = Pattern(pattern_id=len(patterns), members=[t])
            recompute_centroids(p)
            patterns.append(p)
        else:
            patterns[best_i].members.append(t)
            recompute_centroids(patterns[best_i])
    return patterns
