"""Serial Snowball twin — the value-level oracle for the Snowball
workload layer (VERDICT round 1, gap #1).

A single-process, Ray-free implementation of the bootstrap loop with
the SAME documented semantics as ``pipelines/snowball.py`` (the
engine's re-expression of /root/reference/snowball/src/bin/
Snowball.java:36-162 — score-then-aggregate instead of
mutate-while-scanning, per-seed selectivity counting per
SnowballPattern.java:62-71, wUpdt smoothing with confidence_old = 0
for first-seen tuples per Snowball.java:260-276). It shares only the
primitive functions (extract_pairs, tokenize, tfidf_vec,
pattern_similarity, single_pass); every piece of ORCHESTRATION —
joins, groupbys, actor-pool scoring, aggregation, smoothing, ordering
— is re-implemented as plain loops, so a driver-gate hash match
certifies that the distributed run equals the serial semantics.

``ensure_oracle_files`` writes the twin's three outputs as parquet
under /tmp; ``sqlgen`` points the driver's DuckDB oracles at them
(``SELECT * FROM '<path>'``). Files are regenerated on every call
(seconds at the fixture scale) so they can never go stale against the
code."""

from __future__ import annotations

import math
import os
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from snowball_java_ray.config import EngineConfig
from snowball_java_ray.functions.extract import extract_pairs
from snowball_java_ray.functions.text import tokenize
from snowball_java_ray.state.clustering import (
    ClusterTuple,
    pattern_similarity,
    single_pass,
)

ORACLE_DIR = "/tmp/snowball_oracle"


def extract_serial(tbl: pa.Table, cfg: EngineConfig) -> pd.DataFrame:
    """M1-M7 over every document, serially."""
    rows = []
    for doc_id, content in zip(
        tbl["doc_id"].to_pylist(), tbl["content"].to_pylist()
    ):
        for rt in extract_pairs(
            content or "",
            cfg.e1_type,
            cfg.e2_type,
            cfg.min_tokens_away,
            cfg.max_tokens_away,
            cfg.context_window_size,
        ):
            rows.append(
                {
                    "e1": rt.e1, "e2": rt.e2, "doc_id": int(doc_id),
                    "sentence": content, "left": rt.left,
                    "middle": rt.middle, "right": rt.right,
                }
            )
    cols = ["e1", "e2", "doc_id", "sentence", "left", "middle", "right"]
    return pd.DataFrame(rows, columns=cols)


def corpus_df_dict(tbl: pa.Table) -> tuple[dict[str, int], int]:
    """Serial document-frequency dictionary over the corpus content —
    the twin of the inverted-index dictionary the engine feeds into
    TF-IDF vectorization."""
    df: dict[str, int] = {}
    contents = tbl["content"].to_pylist()
    for content in contents:
        for t in set(tokenize(content or "")):
            df[t] = df.get(t, 0) + 1
    return df, len(contents)


def _tfidf(text: str, df: dict[str, int], n_docs: int) -> dict[str, float]:
    toks = tokenize(text)
    return {
        t: c * math.log(n_docs / max(df.get(t, 1), 1))
        for t, c in Counter(toks).items()
    }


def bootstrap_serial(
    tbl: pa.Table,
    seeds: set[tuple[str, str]],
    cfg: EngineConfig,
    df: dict[str, int],
    n_docs: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """-> (tuples_df, patterns_df), value-identical to
    ``pipelines.snowball.snowball_bootstrap``."""
    tuples = extract_serial(tbl, cfg)
    seeds = {(a.lower(), b.lower()) for a, b in seeds}
    prev_conf: dict[tuple, float] = {}
    patterns = []
    conf_rows: dict[tuple, float] = {}

    for it in range(cfg.number_iterations):
        # J1: seed match
        matched = [
            ClusterTuple(
                e1=r.e1, e2=r.e2, doc_id=int(r.doc_id), sentence=r.sentence,
                left=_tfidf(r.left, df, n_docs),
                middle=_tfidf(r.middle, df, n_docs),
                right=_tfidf(r.right, df, n_docs),
            )
            for r in tuples.itertuples()
            if (r.e1.lower(), r.e2.lower()) in seeds
        ]
        matched.sort(key=lambda t: (t.e1, t.e2, t.doc_id, t.sentence))

        patterns = single_pass(matched, cfg)
        patterns = [
            p for p in patterns if len(p.members) >= cfg.min_pattern_support
        ]
        for i, p in enumerate(patterns):
            p.pattern_id = i
        if not patterns:
            break

        # score pass: every tuple x every pattern (serial)
        seed_by_e1: dict[str, set[str]] = {}
        for a, b in seeds:
            seed_by_e1.setdefault(a, set()).add(b)
        scored = []  # (key, pattern_id, sim, pos, neg)
        for r in tuples.itertuples():
            t = ClusterTuple(
                e1=r.e1, e2=r.e2, doc_id=int(r.doc_id), sentence=r.sentence,
                left=_tfidf(r.left, df, n_docs),
                middle=_tfidf(r.middle, df, n_docs),
                right=_tfidf(r.right, df, n_docs),
            )
            for p in patterns:
                sim = pattern_similarity(p, t, cfg)
                if sim < cfg.min_degree_match:
                    continue
                locs = seed_by_e1.get(t.e1.lower())
                if locs is None:
                    pos = neg = 0
                else:
                    pos = int(t.e2.lower() in locs)
                    neg = len(locs) - pos
                scored.append(
                    ((t.e1, t.e2, t.doc_id, t.sentence),
                     p.pattern_id, sim, pos, neg)
                )

        # A5/A6/A7 selectivity + RlogF fixed point
        sel: dict[int, list[int]] = {}
        for _, pid, _, pos, neg in scored:
            s = sel.setdefault(pid, [0, 0])
            s[0] += pos
            s[1] += neg
        rlogf = {}
        for p in patterns:
            pos, neg = sel.get(p.pattern_id, [0, 0])
            p.positive, p.negative = pos, neg
            conf = pos / (pos + neg) if (pos + neg) else 0.0
            if cfg.use_RlogF:
                rlogf[p.pattern_id] = (
                    conf * (1.0 + math.log2(pos)) if pos > 0 else 0.0
                )
            else:
                p.confidence = conf
        if cfg.use_RlogF:
            mx = max(rlogf.values(), default=0.0)
            for p in patterns:
                p.confidence = rlogf[p.pattern_id] / mx if mx > 0 else 0.0

        # A9 noisy-or per tuple key, patterns in pattern_id order
        pconf = {p.pattern_id: p.confidence for p in patterns}
        by_key: dict[tuple, list[tuple[int, float]]] = {}
        for key, pid, sim, _, _ in scored:
            by_key.setdefault(key, []).append((pid, sim))
        conf_rows = {}
        for key, lst in by_key.items():
            prod = 1.0
            for pid, sim in sorted(lst):
                prod *= 1.0 - pconf[pid] * float(sim)
            conf_rows[key] = 1.0 - prod

        # A8 wUpdt smoothing (old = 0.0 for first-seen, iter > 0)
        if it > 0:
            conf_rows = {
                k: c * cfg.wUpdt + prev_conf.get(k, 0.0) * (1 - cfg.wUpdt)
                for k, c in conf_rows.items()
            }
        prev_conf = dict(conf_rows)

        # seed promotion
        for (e1, e2, _, _), c in conf_rows.items():
            if c >= cfg.min_tuple_confidence:
                seeds.add((e1.lower(), e2.lower()))

    if conf_rows:
        tuples_out = pd.DataFrame(
            [
                {"e1": k[0], "e2": k[1], "doc_id": k[2], "sentence": k[3],
                 "confidence": c}
                for k, c in conf_rows.items()
            ]
        ).sort_values(
            ["confidence", "e1", "e2", "doc_id"],
            ascending=[False, True, True, True],
            ignore_index=True,
        )
        tuples_out["confidence"] = tuples_out["confidence"].round(6)
    else:
        tuples_out = pd.DataFrame(
            columns=["e1", "e2", "doc_id", "sentence", "confidence"]
        )

    def centroid_terms(vec: dict[str, float], k: int = 5) -> str:
        top = sorted(vec.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return " ".join(w for w, _ in top)

    patterns_out = pd.DataFrame(
        {
            "pattern_id": [p.pattern_id for p in patterns],
            "n_tuples": [len(p.members) for p in patterns],
            "positive": [p.positive for p in patterns],
            "negative": [p.negative for p in patterns],
            "confidence": [round(p.confidence, 6) for p in patterns],
            "left_terms": [centroid_terms(p.left_c) for p in patterns],
            "middle_terms": [centroid_terms(p.middle_c) for p in patterns],
            "right_terms": [centroid_terms(p.right_c) for p in patterns],
        }
    )
    return tuples_out, patterns_out


def ensure_oracle_files() -> dict[str, str]:
    """Run the twin over the driver-gate fixture corpus and write its
    three outputs as parquet. Called at oracle_sql() generation time so
    the files exist before the driver executes any SQL; regenerated
    every call (never stale).

    The corpus is SCALED exactly like the engine side
    (pipelines.api.snowball_gate_rows): 2x the checked sf_dir's
    documents row count. oracle_sql() carries no sf argument, so the
    twin reads the check dir from GRAFT_CHECK_SF (the driver checks at
    sf0.01 — the default here; tools/driver_check.py exports the
    override for sweeps at other scales)."""
    from snowball_java_ray.pipelines.api import (
        SNOWBALL_SEED,
        SNOWBALL_TAGGED_FRACTION,
        snowball_gate_rows,
    )
    from snowball_java_ray.sources.corpus import DEFAULT_SEEDS, gen_corpus_table

    os.makedirs(ORACLE_DIR, exist_ok=True)
    cfg = EngineConfig()
    sf_dir = os.environ.get("GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    tbl = gen_corpus_table(
        snowball_gate_rows(sf_dir),
        seed=SNOWBALL_SEED,
        tagged_fraction=SNOWBALL_TAGGED_FRACTION,
    )

    paths = {
        "snowball_extract": os.path.join(ORACLE_DIR, "extract.parquet"),
        "snowball_e2e": os.path.join(ORACLE_DIR, "e2e.parquet"),
        "snowball_patterns": os.path.join(ORACLE_DIR, "patterns.parquet"),
    }

    ext = extract_serial(tbl, cfg)
    df, n_docs = corpus_df_dict(tbl)
    tuples_out, patterns_out = bootstrap_serial(
        tbl, DEFAULT_SEEDS, cfg, df, n_docs
    )

    _write(ext, paths["snowball_extract"])
    _write(tuples_out, paths["snowball_e2e"])
    _write(patterns_out, paths["snowball_patterns"])
    return paths


def _write(df: pd.DataFrame, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)
