"""Sparse TF-IDF vector math for the Snowball workload layer.

Vectors are plain ``dict[str, float]`` (the Arrow twin is
``map<string,float64>``) mirroring the reference's ``Map<String,Double>``
(/root/reference/snowball/src/tuples/SnowballTuple.java:15-17).

Reproduces (with documented bug fixes — SURVEY.md §7 "hard parts" #4):
- norm / inner product / cosine: vsm/TermsVector.java:39-74
- weighted three-zone similarity with empty-zone weight reallocation:
  tuples/SnowballTuple.java:75-110 (``degreeMatchCosTFIDF``)
"""

from __future__ import annotations

import math

SparseVec = dict[str, float]


def norm(v: SparseVec) -> float:
    # TermsVector.java:39-45
    return math.sqrt(sum(x * x for x in v.values()))


def inner(a: SparseVec, b: SparseVec) -> float:
    # TermsVector.java:69-74 (iterate smaller side)
    if len(b) < len(a):
        a, b = b, a
    return sum(w * b[t] for t, w in a.items() if t in b)


def cosine(a: SparseVec, b: SparseVec) -> float:
    # TermsVector.java:57-66; 0.0 when either side has zero norm
    na, nb = norm(a), norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return inner(a, b) / (na * nb)


def zone_similarity(
    left_a: SparseVec, mid_a: SparseVec, right_a: SparseVec,
    left_b: SparseVec, mid_b: SparseVec, right_b: SparseVec,
    w_left: float, w_mid: float, w_right: float,
) -> float:
    """Weighted 3-zone cosine similarity, SnowballTuple.java:75-110.

    Empty-zone weight reallocation (lines 83-105): when one side's
    left (resp. right) zone is empty, its weight is folded into the
    middle weight and that zone contributes nothing. The reference
    checks only ``this``'s zones for emptiness; we follow that exact
    semantics (caller passes the pattern centroid as the `_a` side in
    scoring, matching Snowball.java:176-179 argument order).
    """
    w_l, w_m, w_r = w_left, w_mid, w_right
    use_left = len(left_a) > 0
    use_right = len(right_a) > 0
    if not use_left:
        w_m += w_l
        w_l = 0.0
    if not use_right:
        w_m += w_r
        w_r = 0.0
    sim = w_m * cosine(mid_a, mid_b)
    if use_left:
        sim += w_l * cosine(left_a, left_b)
    if use_right:
        sim += w_r * cosine(right_a, right_b)
    return sim


def scale(v: SparseVec, s: float) -> SparseVec:
    return {t: w * s for t, w in v.items()}


def add_into(acc: SparseVec, v: SparseVec) -> None:
    for t, w in v.items():
        acc[t] = acc.get(t, 0.0) + w
