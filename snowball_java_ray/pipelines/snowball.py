"""The Snowball bootstrapped relation-extraction pipeline, Ray-Data-first.

Re-expresses the reference's single-JVM loop
(/root/reference/snowball/src/bin/Snowball.java:36-162) as a
driver-orchestrated chain of Dataset jobs per iteration:

  extract      map_batches over the tagged corpus (M1-M7), ONE scan,
               materialized and reused across iterations (replaces the
               reference's full re-scan + tuple checkpoint,
               Snowball.java:45-71).
  match        broadcast semi-join of tuples against the seed set (J1,
               Snowball.java:371-404) — seed dict in the task closure.
  cluster      driver-side single-pass clustering over the (small)
               matched set, order pinned (state/clustering.py).
  score        actor-pool PatternScorer: patterns + df dictionary
               broadcast once per actor; every tuple scored against
               every pattern (Snowball.java:164-255) — the
               mutating-while-scanning reference semantics split into a
               pure parallel score pass + aggregates (SURVEY.md §7 #3).
  selectivity  groupby(pattern_id) over pos/neg flags (A5/A6/A7) with
               the per-pass RlogF max-normalization fixed point.
  confidence   noisy-or per tuple key as a vectorized per-row factor +
               Arrow C++ hash-product (A9, hash_grouped_aggregate —
               no per-group Python, no driver table), wUpdt smoothing
               as a left-outer join against the previous iteration's
               confidence Dataset (A8), and seed promotion as a
               filtered distinct aggregate (Snowball.java:146-158).

TF-IDF context vectors (M11) are computed on the fly from token
contexts + the corpus DF dictionary (from the inverted-index build) —
OOV terms get df=1 (explicit smoothing instead of the reference's
exception at vsm/VectorSpaceModel.java:89-93).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from snowball_java_ray.config import EngineConfig
from snowball_java_ray.functions.extract import extract_pairs
from snowball_java_ray.functions.text import tokenize
from snowball_java_ray.state.clustering import (
    ClusterTuple,
    Pattern,
    pattern_similarity,
    recompute_centroids,
    single_pass,
)

TUPLE_SCHEMA = pa.schema(
    [
        ("e1", pa.string()),
        ("e2", pa.string()),
        ("doc_id", pa.int64()),
        ("sentence", pa.string()),
        ("left", pa.string()),
        ("middle", pa.string()),
        ("right", pa.string()),
    ]
)


def tfidf_vec(text: str, df: dict[str, int], n_docs: int) -> dict[str, float]:
    toks = tokenize(text)
    if not toks:
        return {}
    return {
        t: c * math.log(n_docs / max(df.get(t, 1), 1))
        for t, c in Counter(toks).items()
    }


def make_extractor(cfg: EngineConfig):
    def fn(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in TUPLE_SCHEMA.names}
        for doc_id, content in zip(
            batch["doc_id"].to_pylist(), batch["content"].to_pylist()
        ):
            for rt in extract_pairs(
                content or "",
                cfg.e1_type,
                cfg.e2_type,
                cfg.min_tokens_away,
                cfg.max_tokens_away,
                cfg.context_window_size,
            ):
                cols["e1"].append(rt.e1)
                cols["e2"].append(rt.e2)
                cols["doc_id"].append(doc_id)
                cols["sentence"].append(content)
                cols["left"].append(rt.left)
                cols["middle"].append(rt.middle)
                cols["right"].append(rt.right)
        return pa.table(cols, schema=TUPLE_SCHEMA)

    return fn


def extract_tuples(corpus_ds, cfg: EngineConfig):
    """Corpus -> candidate tuple Dataset (M1-M7), one scan."""
    return corpus_ds.map_batches(make_extractor(cfg), batch_format="pyarrow")


def extract_tuples_checkpointed(
    corpus_source,
    out_dir: str,
    n_docs: int,
    cfg: EngineConfig,
    n_partitions: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """Checkpoint-resumable extraction (S8 parity with the reference's
    tuple checkpoint, bin/Snowball.java:45-71, re-expressed as the same
    per-partition parquet + manifest machinery as the index build):
    each doc-range partition's extracted tuples are written as one
    immutable parquet file, sorted on the full tuple key so output
    bytes are independent of block arrival order; a killed run resumes
    by skipping partitions the manifest marks done (byte-identity
    tested in tests/test_resume.py)."""
    import pyarrow.parquet as pq

    from snowball_java_ray.pipelines.index_pipeline import _partition_bounds
    from snowball_java_ray.state.checkpoint import Manifest

    import os
    import time

    man = Manifest(out_dir)
    done_now = 0
    for lo, hi in _partition_bounds(n_docs, n_partitions):
        pid = f"docs_{lo}_{hi}"
        out_file = os.path.join(out_dir, f"tuples_{pid}.parquet")
        if man.is_done(pid, out_file):
            continue
        if max_partitions is not None and done_now >= max_partitions:
            break
        t0 = time.perf_counter()
        batches = list(
            extract_tuples(corpus_source(lo, hi), cfg).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        tbl = (
            pa.concat_tables(batches, promote_options="default")
            if batches
            else TUPLE_SCHEMA.empty_table()
        )
        tbl = tbl.sort_by([(c, "ascending") for c in TUPLE_SCHEMA.names])
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_file)
        man.mark_done(
            pid,
            doc_lo=lo,
            doc_hi=hi,
            n_tuples=tbl.num_rows,
            bytes=os.path.getsize(out_file),
            seconds=round(time.perf_counter() - t0, 3),
        )
        done_now += 1
    return man.entries


def load_tuples(out_dir: str) -> pa.Table:
    """Union of the per-partition tuple files, in numeric doc_lo order
    (partitions are disjoint doc ranges, so this is globally
    doc-range-ordered)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from snowball_java_ray.pipelines.index_pipeline import doc_lo_sort_key

    files = sorted(
        glob.glob(os.path.join(out_dir, "tuples_*.parquet")),
        key=doc_lo_sort_key,
    )
    if not files:
        return TUPLE_SCHEMA.empty_table()
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


def _row_to_cluster_tuple(row: dict, df: dict, n_docs: int) -> ClusterTuple:
    return ClusterTuple(
        e1=row["e1"],
        e2=row["e2"],
        doc_id=row["doc_id"],
        sentence=row["sentence"],
        left=tfidf_vec(row["left"], df, n_docs),
        middle=tfidf_vec(row["middle"], df, n_docs),
        right=tfidf_vec(row["right"], df, n_docs),
    )


def batch_tfidf_vectors(
    texts: "pa.ChunkedArray | pa.Array", df: dict[str, int], n_docs: int
) -> list[dict[str, float]]:
    """Vectorized M11: tokenize a whole context column with the Arrow
    tokenizer, aggregate tf per (row, term) in C++, then build the
    sparse dicts. Values identical to tfidf_vec (same tf counts, same
    idf lookups)."""
    import math as _math

    from snowball_java_ray.functions.text import term_frequencies, tokenize_arrow

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    row_idx, toks = tokenize_arrow(texts)
    tf_row, terms, tfs, _ = term_frequencies(row_idx, toks, n)
    out: list[dict[str, float]] = [dict() for _ in range(n)]
    term_list = terms.to_pylist()
    idf_cache: dict[str, float] = {}
    for r, t, c in zip(tf_row.tolist(), term_list, tfs.tolist()):
        w = idf_cache.get(t)
        if w is None:
            w = _math.log(n_docs / max(df.get(t, 1), 1))
            idf_cache[t] = w
        out[r][t] = c * w
    return out


class PatternScorer:
    """Actor-pool stage: score every tuple against every pattern.

    ``broadcast_ref`` is a ray.ObjectRef to (patterns, df, n_docs,
    seeds, cfg) — fetched ONCE per actor in __init__. Emits one row per
    (tuple, matching pattern) with the selectivity flags (A5) already
    resolved against the broadcast seed dict (J5)."""

    def __init__(self, broadcast_ref):
        import ray

        patterns, df, n_docs, seeds, cfg = ray.get(broadcast_ref)
        self.patterns: list[Pattern] = patterns
        self.df, self.n_docs, self.cfg = df, n_docs, cfg
        self.seed_by_e1: dict[str, set[str]] = {}
        for a, b in seeds:
            self.seed_by_e1.setdefault(a.lower(), set()).add(b.lower())

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out = {
            "e1": [], "e2": [], "doc_id": [], "sentence": [],
            "pattern_id": [], "sim": [], "pos": [], "neg": [],
        }
        # contexts vectorized per column (M11 batch path); remaining
        # per-row work is small-dict math against few patterns
        lefts = batch_tfidf_vectors(batch["left"], self.df, self.n_docs)
        mids = batch_tfidf_vectors(batch["middle"], self.df, self.n_docs)
        rights = batch_tfidf_vectors(batch["right"], self.df, self.n_docs)
        e1s = batch["e1"].to_pylist()
        e2s = batch["e2"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        sents = batch["sentence"].to_pylist()
        for i in range(len(batch)):
            t = ClusterTuple(
                e1=e1s[i], e2=e2s[i], doc_id=doc_ids[i], sentence=sents[i],
                left=lefts[i], middle=mids[i], right=rights[i],
            )
            for p in self.patterns:
                sim = pattern_similarity(p, t, cfg)
                if sim < cfg.min_degree_match:
                    continue
                # A5 per-seed counting (SnowballPattern.java:62-71): the
                # reference iterates ALL seeds — every seed sharing e1
                # increments pos (e2 matches, at most one in a seed set)
                # or neg (e2 differs, possibly several).
                seed_locs = self.seed_by_e1.get(t.e1.lower())
                if seed_locs is None:
                    pos = neg = 0
                else:
                    pos = int(t.e2.lower() in seed_locs)
                    neg = len(seed_locs) - pos
                out["e1"].append(t.e1)
                out["e2"].append(t.e2)
                out["doc_id"].append(t.doc_id)
                out["sentence"].append(t.sentence)
                out["pattern_id"].append(p.pattern_id)
                out["sim"].append(sim)
                out["pos"].append(int(pos))
                out["neg"].append(int(neg))
        return pa.table(
            {
                "e1": pa.array(out["e1"]),
                "e2": pa.array(out["e2"]),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sentence": pa.array(out["sentence"]),
                "pattern_id": pa.array(out["pattern_id"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
                "pos": pa.array(out["pos"], pa.int64()),
                "neg": pa.array(out["neg"], pa.int64()),
            }
        )


def retrieve_seed_candidate_docs(index, seeds: set[tuple[str, str]]) -> "np.ndarray":
    """The north-star retrieval integration: instead of scanning the
    full corpus to find seed occurrences (Snowball.java:371-404 scans
    every tuple), query the inverted index with each seed's terms
    (conjunctive AND over e1+e2 tokens) and take the union of matching
    doc_ids. At 10^12 docs this turns the per-iteration seed match from
    a full scan into an index lookup; extraction then runs only on the
    retrieved slice. Guaranteed superset of docs containing both
    surface forms (tested)."""
    import numpy as np

    out: list[np.ndarray] = []
    for e1, e2 in seeds:
        terms = sorted(set(tokenize(f"{e1} {e2}")))
        if not terms:
            continue
        acc = None
        for t in terms:
            ids, _, _ = index.postings(t)
            acc = ids if acc is None else np.intersect1d(acc, ids)
            if acc.size == 0:
                break
        if acc is not None and acc.size:
            out.append(acc)
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def retrieve_seed_candidate_docs_sharded(service, seeds) -> "np.ndarray":
    """The same conjunctive seed retrieval served by the doc-sharded
    fleet (stages/serve.BM25ShardedService.boolean_and tokenizes the
    seed surface forms with the identical analyzer): at 10^12 docs the
    per-iteration seed match becomes a scatter to the shard actors
    instead of a driver-index lookup. Equal to the driver-index variant
    (tested)."""
    import numpy as np

    out = [service.boolean_and(f"{e1} {e2}") for e1, e2 in seeds]
    out = [a for a in out if a.size]
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


@dataclass
class SnowballResult:
    tuples: pd.DataFrame
    patterns: pd.DataFrame
    seeds: set[tuple[str, str]]
    iterations: int


def snowball_bootstrap(
    corpus_ds,
    seeds: set[tuple[str, str]],
    cfg: EngineConfig,
    df: dict[str, int],
    n_docs: int,
    tuples_ds=None,
    index=None,
) -> SnowballResult:
    """Run the full bootstrap loop. ``df``/``n_docs`` come from the
    inverted-index dictionary over the same corpus. ``tuples_ds``
    optionally injects a pre-extracted tuple Dataset (e.g. loaded from
    an extract_tuples_checkpointed run) instead of re-scanning.

    ``index`` (an InvertedIndex) enables retrieval-accelerated seed
    matching: each iteration first prunes the tuple set to doc_ids the
    index proves can contain a seed pair (conjunctive postings lookup,
    ``retrieve_seed_candidate_docs`` — a guaranteed superset of true
    matches, so results are IDENTICAL, tested), replacing the per-
    iteration full-tuple scan of Snowball.java:371-404 with an index
    probe + a slice filter. At 10^12 docs this is the difference
    between a full pass per iteration and touching only candidate
    postings."""
    import ray
    from ray.data.aggregate import Sum

    if tuples_ds is None:
        tuples_ds = extract_tuples(corpus_ds, cfg).materialize()
    else:
        tuples_ds = tuples_ds.materialize()
    seeds = {(a.lower(), b.lower()) for a, b in seeds}
    prev_ds = None  # previous iteration's (key4, prev_confidence) Dataset
    patterns: list[Pattern] = []
    conf_ds = None

    for it in range(cfg.number_iterations):
        # --- J1: broadcast semi-join against seeds ---
        seed_set = set(seeds)

        cand_ref = None
        if index is not None and all(
            tokenize(f"{a} {b}") for a, b in seeds
        ):
            # superset guarantee needs every seed to contribute terms; a
            # stopword-only seed would retrieve nothing and break it —
            # fall back to the full filter in that (degenerate) case
            cand_ref = ray.put(retrieve_seed_candidate_docs(index, seeds))

        def is_seed(t: pa.Table, _s=seed_set, _cref=cand_ref) -> pa.Table:
            if _cref is not None:
                import pyarrow.compute as pc
                import ray as _ray

                cand = _ray.get(_cref)
                t = t.filter(pc.is_in(t["doc_id"], pa.array(cand)))
                if len(t) == 0:
                    return t
            keep = [
                (a.lower(), b.lower()) in _s
                for a, b in zip(t["e1"].to_pylist(), t["e2"].to_pylist())
            ]
            return t.filter(pa.array(keep))

        matched_rows = pa.concat_tables(
            tuples_ds.map_batches(is_seed, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            ),
            promote_options="default",
        ).to_pylist()
        matched = [_row_to_cluster_tuple(r, df, n_docs) for r in matched_rows]
        matched.sort(key=lambda t: (t.e1, t.e2, t.doc_id, t.sentence))

        # --- clustering (driver-side, order pinned) ---
        patterns = single_pass(matched, cfg)
        patterns = [
            p for p in patterns if len(p.members) >= cfg.min_pattern_support
        ]
        for i, p in enumerate(patterns):
            p.pattern_id = i
        if not patterns:
            break

        # --- score pass (actor pool, broadcast state) ---
        bref = ray.put((patterns, df, n_docs, seeds, cfg))
        scored = tuples_ds.map_batches(
            PatternScorer,
            fn_constructor_kwargs={"broadcast_ref": bref},
            batch_format="pyarrow",
            concurrency=2,
        ).materialize()

        # --- A5/A6/A7: selectivity -> confidence -> RlogF fixed point ---
        sel = {
            int(r["pattern_id"]): (int(r["sum(pos)"]), int(r["sum(neg)"]))
            for r in scored.groupby("pattern_id")
            .aggregate(Sum("pos"), Sum("neg"))
            .iter_rows()
        }
        rlogf = {}
        for p in patterns:
            pos, neg = sel.get(p.pattern_id, (0, 0))
            p.positive, p.negative = pos, neg
            conf = pos / (pos + neg) if (pos + neg) else 0.0
            if cfg.use_RlogF:
                rlogf[p.pattern_id] = conf * (1.0 + math.log2(pos)) if pos > 0 else 0.0
            else:
                p.confidence = conf
        if cfg.use_RlogF:
            mx = max(rlogf.values(), default=0.0)
            for p in patterns:
                p.confidence = rlogf[p.pattern_id] / mx if mx > 0 else 0.0

        # --- A9: noisy-or tuple confidence, fully distributed ---
        # 1 - prod(1 - conf_p * sim) per tuple key. The product is
        # order-free, so instead of per-group Python
        # (groupby().map_groups — ~25us/group on an UNBOUNDED key) each
        # row contributes a vectorized factor and Arrow's C++
        # hash-product reduces per key inside hash_grouped_aggregate;
        # rows route by the cheap numeric doc_id (hash_keys), never
        # md5-ing sentence strings. Semantics identical to the serial
        # twin's sorted sequential product (oracle_snowball.py:177-187);
        # float64 product reorder noise is ~1e-16, far below the 6-dp
        # output rounding.
        from snowball_java_ray.ops.dedup import (
            hash_grouped_aggregate,
            join_partitions,
        )

        pconf_np = np.zeros(len(patterns), dtype=np.float64)
        for p in patterns:
            pconf_np[p.pattern_id] = p.confidence

        def add_factor(t: pa.Table, _pc=pconf_np) -> pa.Table:
            pid = t["pattern_id"].to_numpy(zero_copy_only=False)
            sim = t["sim"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "e1": t["e1"], "e2": t["e2"],
                    "doc_id": t["doc_id"], "sentence": t["sentence"],
                    "factor": pa.array(1.0 - _pc[pid] * sim, pa.float64()),
                }
            )

        key4 = ["e1", "e2", "doc_id", "sentence"]
        conf_ds = hash_grouped_aggregate(
            scored.map_batches(add_factor, batch_format="pyarrow"),
            key4,
            [("factor", "product", "not_conf")],
            hash_keys=["doc_id"],
        ).map_batches(
            lambda t: t.drop_columns(["not_conf"]).append_column(
                "confidence",
                pa.array(
                    1.0 - t["not_conf"].to_numpy(zero_copy_only=False),
                    pa.float64(),
                ),
            ),
            batch_format="pyarrow",
        )

        # --- A8: wUpdt smoothing vs previous iteration ---
        # Reference semantics (Snowball.java:260-276, SnowballTuple
        # confidence_old = 0 at construction): in iterations > 0 EVERY
        # tuple smooths, first-seen ones against old = 0.0 (halving
        # their confidence at wUpdt = 0.5). Expressed as a distributed
        # left-outer hash join against the previous iteration's
        # confidence Dataset — no driver dict keyed by sentence strings.
        if it > 0 and prev_ds is not None:
            joined = conf_ds.join(
                prev_ds,
                join_type="left_outer",
                num_partitions=join_partitions(),
                on=tuple(key4),
            )

            def smooth_batch(t: pa.Table, _w=cfg.wUpdt) -> pa.Table:
                import pyarrow.compute as pc

                old = pc.fill_null(t["prev_confidence"], 0.0).to_numpy(
                    zero_copy_only=False
                )
                cur = t["confidence"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "e1": t["e1"], "e2": t["e2"],
                        "doc_id": t["doc_id"], "sentence": t["sentence"],
                        "confidence": pa.array(
                            cur * _w + old * (1.0 - _w), pa.float64()
                        ),
                    }
                )

            conf_ds = joined.map_batches(smooth_batch, batch_format="pyarrow")

        conf_ds = conf_ds.materialize()
        prev_ds = conf_ds.map_batches(
            lambda t: pa.table(
                {
                    "e1": t["e1"], "e2": t["e2"],
                    "doc_id": t["doc_id"], "sentence": t["sentence"],
                    "prev_confidence": t["confidence"],
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        # --- seed promotion (filtered distinct aggregate; only the
        # --- small distinct promoted-pair set reaches the driver) ---
        def promoted_pairs(t: pa.Table, _thr=cfg.min_tuple_confidence) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.greater_equal(t["confidence"], _thr))
            pairs = pa.table(
                {
                    "e1_l": pc.utf8_lower(t["e1"]),
                    "e2_l": pc.utf8_lower(t["e2"]),
                }
            )
            return pairs.group_by(["e1_l", "e2_l"]).aggregate([])

        from snowball_java_ray.pipelines.api import collect_arrow

        promo = collect_arrow(
            conf_ds.map_batches(promoted_pairs, batch_format="pyarrow")
        )
        if promo.num_rows:
            seeds |= set(
                zip(promo["e1_l"].to_pylist(), promo["e2_l"].to_pylist())
            )

    if conf_ds is not None:
        from snowball_java_ray.pipelines.api import collect_arrow

        conf_tbl = collect_arrow(conf_ds)
    else:
        conf_tbl = pa.table({})
    if conf_tbl.num_rows:
        tuples_out = conf_tbl.to_pandas().sort_values(
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
        # O4: words by weight desc, then word asc (reference
        # utils/SortMaps.java:67-90 pretty-print order)
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
    return SnowballResult(
        tuples=tuples_out,
        patterns=patterns_out,
        seeds=seeds,
        iterations=cfg.number_iterations,
    )
