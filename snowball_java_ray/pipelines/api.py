"""Driver-facing pipelines over the testdata tables.

Each public function here backs one ``queries()`` entry in
``__ray_entry__.py`` and has a matching generated oracle SQL in
``sqlgen.py`` (run by the driver through DuckDB on the same parquet).

The authoritative engine input is the ``corpus`` schema from
BASELINE.json ``input_hint`` (repo, path, commit, lang, content); the
testdata ``documents`` table is mapped onto it deterministically (and
SQL-replicably) by ``documents_as_corpus``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from snowball_java_ray.constants import (
    BM25_B,
    BM25_K1,
    REFERENCE_QUERIES,
    SCORE_ROUND_DECIMALS,
    TOP_K,
)
from snowball_java_ray.functions.text import sha256_hex
from snowball_java_ray.stages.index_build import (
    build_dictionary,
    build_postings,
    make_doc_stats,
)
from snowball_java_ray.stages.score import BM25Scorer, InvertedIndex


def collect_arrow(ds) -> pa.Table:
    """Stream a (small) Dataset's blocks to one driver-side Arrow table.
    Only for index metadata / test outputs — never the main corpus."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _corpus_batch(batch: pa.Table) -> pa.Table:
    sha = pa.array(sha256_hex(batch["text"]))
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "repo": pc.binary_join_element_wise(
                pa.array(["org"] * len(batch)), batch["source"], "/"
            ),
            "path": pc.binary_join_element_wise(
                pa.array(["docs"] * len(batch)),
                pc.cast(batch["doc_id"], pa.string()),
                "/",
            ),
            "commit": pc.utf8_slice_codeunits(sha, 0, 40),
            "lang": batch["lang"],
            "content": batch["text"],
            "content_sha256": sha,
        }
    )


def verify_sha_batch(batch: pa.Table, text_col: str = "content") -> pa.Table:
    """M12 sha-equality guard (SURVEY.md §2.2): recompute sha256 of the
    content and assert equality with the carried ``content_sha256`` at a
    materialization boundary. Raises on any corruption — the per-row
    end-to-end invariant from BASELINE.json input_hint."""
    got = sha256_hex(batch[text_col])
    want = batch["content_sha256"].to_pylist()
    bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    if bad:
        raise ValueError(
            f"content_sha256 mismatch for {len(bad)} rows, first at batch row {bad[0]}"
        )
    return batch


def documents_as_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents(doc_id,text,lang,source,...) -> input_hint corpus shape
    (deterministic; mirrored in SQL by sqlgen.ingest_corpus_sql)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(_corpus_batch, batch_format="pyarrow")


def build_index(
    corpus_ds: ray.data.Dataset,
    n_docs: int | None = None,
    text_col: str = "content",
    id_col: str = "doc_id",
    shard_size: int = 256,
) -> InvertedIndex:
    """Run the distributed index build — ONE corpus scan (tokenize +
    per-batch partial tf aggregation) and ONE (term, shard) shuffle —
    and assemble the driver-side InvertedIndex from the chunk table.

    The dictionary is derived from chunk summary rows and per-posting
    doc lengths ride inside the chunk data, so there is no second
    shuffle and no doc-stats corpus rescan (measured 2x index-build
    speedup vs the naive three-table build).

    ``n_docs`` should come from source metadata (parquet row counts)
    when available; a ``corpus_ds.count()`` fallback re-executes the
    upstream pipeline. shard_size defaults low so local runs exercise
    the multi-chunk (skew-splitting) path; production uses
    DEFAULT_SHARD_SIZE.
    """
    from snowball_java_ray.stages.index_build import build_chunk_table

    chunks = collect_arrow(
        build_chunk_table(corpus_ds, text_col, id_col, shard_size)
    )
    if n_docs is None:
        n_docs = corpus_ds.count()
    return InvertedIndex(chunks, n_docs)


def reference_queries_ds() -> ray.data.Dataset:
    return ray.data.from_items(
        [{"query_id": i, "qtext": q} for i, q in enumerate(REFERENCE_QUERIES)]
    )


def bm25_topk_pipeline(
    sf_dir: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Index the corpus, broadcast the index once (ray.put), score the
    reference query set through the BM25Scorer actor pool."""
    import pyarrow.parquet as pq
    import ray

    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return reference_queries_ds().map_batches(
        BM25Scorer,
        fn_constructor_kwargs={
            "index_ref": index_ref, "k1": k1, "b": b, "top_k": top_k,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])


def ensure_index_dir(
    sf_dir: str, shard_size: int = 256, n_partitions: int = 4,
    variant: str = "",
) -> str:
    """Build (or reuse) the on-disk doc-range-partitioned index for
    ``sf_dir`` under /tmp — the serving-side input of the sharded path.
    Cache key includes corpus row count + file mtime so a regenerated
    testdata dir invalidates; the manifest makes re-entry a no-op."""
    import pyarrow.parquet as pq

    from snowball_java_ray.pipelines.index_pipeline import (
        build_index_checkpointed,
        index_format_fingerprint,
    )

    src = f"{sf_dir}/documents.parquet"
    n_docs = pq.read_metadata(src).num_rows
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir))}_{n_docs}"
        f"_{shard_size}_{n_partitions}_{int(os.path.getmtime(src))}"
        f"_{index_format_fingerprint()}"
    )
    if variant:
        # mutation entries (tombstone deletes) build in their own dir
        # so the shared cached index never carries their state
        key += f"_{variant}"
    out_dir = os.path.join("/tmp/snowball_serve", key)
    os.makedirs(out_dir, exist_ok=True)

    def corpus_source(lo, hi):
        from snowball_java_ray.sources.readers import read_parquet_doc_range

        ds = read_parquet_doc_range(
            src, lo, hi, columns=["doc_id", "text", "lang", "source"]
        )
        return ds.map_batches(_corpus_batch, batch_format="pyarrow")

    build_index_checkpointed(
        corpus_source, out_dir, n_docs,
        n_partitions=n_partitions, shard_size=shard_size,
    )
    return out_dir


def bm25_topk_sharded_pipeline(
    sf_dir: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
    concurrency: int = 2,
    n_partitions: int = 4,
    algo: str = "exact",
) -> ray.data.Dataset:
    """Doc-sharded serving (SURVEY §2.3 ST5 scale path): per-doc-range
    shard actors each load only their chunk parquet; queries scatter
    through the gather stage and merge via merge_topk. Rank-identical
    to bm25_topk_pipeline (tested) and to the same DuckDB oracle.
    algo='wand' runs block-max WAND inside every shard actor."""
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    try:
        # the result is tiny by construction (|queries| x top_k rows):
        # materialize it so the shard fleet can be torn down HERE
        # instead of living as long as the caller keeps the Dataset
        return svc.topk_dataset(
            reference_queries_ds(), k1=k1, b=b, top_k=top_k,
            concurrency=concurrency, algo=algo,
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def bm25_topk_sharded_wand_pipeline(sf_dir: str) -> ray.data.Dataset:
    """The north-star serving shape end-to-end: doc-sharded actor fleet
    running block-max WAND over the compressed chunked postings —
    rank-identical to the exact scorer and the DuckDB oracle."""
    return bm25_topk_sharded_pipeline(sf_dir, algo="wand")


def _deleted_index_dir(sf_dir: str, n_partitions: int = 4) -> str:
    """Build (or reuse) the tombstoned index: its own cached dir (the
    'del' variant) + the deterministic doc_id % DELETE_MOD ==
    DELETE_REM tombstone set (delete_docs is idempotent, so re-entry
    is a no-op)."""
    import json

    import numpy as np

    from snowball_java_ray.constants import DELETE_MOD, DELETE_REM
    from snowball_java_ray.pipelines.index_pipeline import delete_docs

    index_dir = ensure_index_dir(
        sf_dir, n_partitions=n_partitions, variant="del"
    )
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_docs = int(json.load(f)["n_docs"])
    delete_docs(index_dir, np.arange(DELETE_REM, n_docs, DELETE_MOD))
    return index_dir


def bm25_topk_deleted_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> ray.data.Dataset:
    """Tombstone-delete serving (logical half of the delete contract):
    the deterministic delete set never appears in any top-k, while
    idf/avgdl still reflect the full corpus — stats drift only at
    compaction, exactly like Lucene segment deletes. Served through
    the sharded WAND fleet (each shard masks only its own tombstone
    slice); oracle = sqlgen.bm25_topk_deleted_sql."""
    from snowball_java_ray.stages.serve import BM25ShardedService

    svc = BM25ShardedService(_deleted_index_dir(sf_dir, n_partitions))
    try:
        return svc.topk_dataset(
            reference_queries_ds(), algo="wand"
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def bm25_topk_compacted_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> ray.data.Dataset:
    """Physical half of the delete contract: compaction rewrites every
    chunk dropping tombstoned postings (shuffle-free map over chunk
    rows), after which the index scores exactly like a fresh build
    over the live corpus — same doc_ids, live stats. Oracle =
    sqlgen.bm25_topk_compacted_sql (plain BM25 over the filtered
    view)."""
    from snowball_java_ray.pipelines.index_pipeline import (
        compact_index_with_tombstones,
    )
    from snowball_java_ray.stages.serve import BM25ShardedService

    del_dir = _deleted_index_dir(sf_dir, n_partitions)
    cmp_dir = del_dir + "_compacted"
    compact_index_with_tombstones(del_dir, cmp_dir)
    svc = BM25ShardedService(cmp_dir)
    try:
        return svc.topk_dataset(
            reference_queries_ds(), algo="wand"
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def _boolean_fleet_pipeline(
    sf_dir: str, method: str, n_partitions: int = 4
) -> pa.Table:
    """Shared scatter/concat driver for the fleet boolean retrieval
    family (AND / OR / AND-NOT): per-shard posting-list set algebra,
    concat across ascending doc-range shards (already doc_id-sorted)."""
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    out_q, out_d = [], []
    try:
        for qid, qtext in enumerate(REFERENCE_QUERIES):
            acc = getattr(svc, method)(qtext)
            if acc.size == 0:
                continue
            out_q.extend([qid] * acc.size)
            out_d.extend(acc.tolist())
    finally:
        svc.shutdown()
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
        }
    )


def boolean_and_sharded_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> pa.Table:
    """Conjunctive retrieval over the sharded fleet."""
    return _boolean_fleet_pipeline(sf_dir, "boolean_and", n_partitions)


def boolean_or_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Disjunctive retrieval: docs containing ANY analyzed query term
    (per-shard posting union through the same scatter fabric)."""
    return _boolean_fleet_pipeline(sf_dir, "boolean_or", n_partitions)


def boolean_and_not_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> pa.Table:
    """AND-NOT retrieval: ALL of the sorted distinct analyzed terms but
    the last, EXCLUDING the last (single-term queries: no exclusion —
    the rule is defined once in ``BM25ShardedService.boolean_and_not``
    and mirrored by the SQL oracle)."""
    return _boolean_fleet_pipeline(sf_dir, "boolean_and_not", n_partitions)


def wildcard_search_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Wildcard retrieval ('cust%', '%at%', 's_an'): the Lucene
    multi-term query rewrite — each SQL-LIKE pattern expands against
    the DICTIONARY (the dictionary Dataset streams through a per-batch
    Arrow ``match_like``, emitting only matches — the corpus is never
    re-scanned per pattern), the expansion is capped at the
    ``WILDCARD_MAX_EXPANSION`` lexicographically-first terms (the
    deterministic rewrite budget, mirrored by the oracle's
    row_number() cut), and the expanded term set runs as ONE
    disjunctive query through the sharded fleet's posting union.
    Driver traffic is O(matched terms + result docs). A pattern whose
    expansion is empty yields zero rows. Oracle:
    ``sqlgen.wildcard_search_sql``."""
    from snowball_java_ray.constants import (
        WILDCARD_MAX_EXPANSION,
        WILDCARD_PATTERNS,
    )
    from snowball_java_ray.stages.serve import BM25ShardedService

    pats = list(WILDCARD_PATTERNS)

    def match(t: pa.Table) -> pa.Table:
        out_p, out_t = [], []
        for pid, pat in enumerate(pats):
            sub = t.filter(pc.match_like(t["term"], pat))
            out_p.extend([pid] * sub.num_rows)
            out_t.extend(sub["term"].to_pylist())
        return pa.table(
            {
                "pid": pa.array(out_p, pa.int64()),
                "term": pa.array(out_t, pa.string()),
            }
        )

    exp = collect_arrow(
        term_df_pipeline(sf_dir).map_batches(match, batch_format="pyarrow")
    )
    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    out_pat, out_d = [], []
    try:
        for pid, pat in enumerate(pats):
            terms = sorted(
                exp.filter(pc.equal(exp["pid"], pid))["term"].to_pylist()
            )[:WILDCARD_MAX_EXPANSION]
            if not terms:
                continue
            acc = svc.boolean_or(" ".join(terms))
            if acc.size == 0:
                continue
            out_pat.extend([pat] * acc.size)
            out_d.extend(acc.tolist())
    finally:
        svc.shutdown()
    return pa.table(
        {
            "pattern": pa.array(out_pat, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
        }
    )


def phrase_match_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> pa.Table:
    """Exact-phrase retrieval: (query_id, doc_id) for docs whose
    ANALYZED token stream contains the query's analyzed token sequence
    contiguously.

    The index stores no positions (reference parity: the DF model at
    ``VectorSpaceModel.java:29-53`` has none either), so this is the
    standard candidates→verify recheck: conjunctive AND over the
    sharded postings fleet prunes the corpus to docs containing every
    phrase term, then ONE doc_id-filtered columnar re-read verifies
    adjacency on the analyzed token stream. The verify cost is bounded
    by the AND-candidate count, not the corpus; the candidate map ships
    driver→workers once via ray.put (at extreme candidate counts it
    would ship as an Arrow table through the bucketed join instead —
    documented, not needed for a fixed query set)."""
    import pyarrow.compute as pc
    import ray

    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    phrases: dict[int, str] = {}
    cand_map: dict[int, list[int]] = {}
    try:
        for qid, qtext in enumerate(REFERENCE_QUERIES):
            toks = tokenize(qtext)
            if not toks:
                continue
            phrases[qid] = " ".join(toks)
            for d in svc.boolean_and(qtext).tolist():
                cand_map.setdefault(d, []).append(qid)
    finally:
        svc.shutdown()
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    if not cand_map:
        return empty
    cand_ref = ray.put(cand_map)
    phr_ref = ray.put(phrases)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(list(cand_map)),
    )

    def verify(t: pa.Table) -> pa.Table:
        import ray as _ray

        cmap = _ray.get(cand_ref)
        phr = _ray.get(phr_ref)
        out_q: list[int] = []
        out_d: list[int] = []
        # per-row loop is over AND-candidates only (output-bounded),
        # never the corpus
        for did, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            dstr = " " + " ".join(tokenize(text or "")) + " "
            for qid in cmap.get(did, ()):
                if f" {phr[qid]} " in dstr:
                    out_q.append(qid)
                    out_d.append(did)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    tbl = collect_arrow(docs.map_batches(verify, batch_format="pyarrow"))
    if tbl.num_rows == 0:
        return empty
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("query_id", "ascending"), ("doc_id", "ascending")],
        )
    )


def near_match_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Proximity retrieval (NEAR/slop): (query_id, doc_id, span) for
    docs containing every analyzed query term whose first-occurrence
    span in the analyzed token stream is <= NEAR_SLOP. The positional
    cousin of ``phrase_match``, same candidates→verify shape: the
    sharded AND prunes to docs holding all terms, one doc_id-pushdown
    re-read verifies spans — cost bounded by the candidate count,
    never the corpus. Oracle: ``sqlgen.near_match_sql`` (zipped-unnest
    positions, identical first-occurrence rule)."""
    import ray

    from snowball_java_ray.constants import NEAR_SLOP
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    qterm_map: dict[int, list[str]] = {}
    cand_map: dict[int, list[int]] = {}
    try:
        for qid, qtext in enumerate(REFERENCE_QUERIES):
            terms = sorted(set(tokenize(qtext)))
            if not terms:
                continue
            qterm_map[qid] = terms
            for d in svc.boolean_and(qtext).tolist():
                cand_map.setdefault(d, []).append(qid)
    finally:
        svc.shutdown()
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "span": pa.array([], pa.int64()),
        }
    )
    if not cand_map:
        return empty
    cand_ref = ray.put(cand_map)
    qt_ref = ray.put(qterm_map)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(list(cand_map)),
    )

    def verify(t: pa.Table) -> pa.Table:
        import ray as _ray

        cmap = _ray.get(cand_ref)
        qt = _ray.get(qt_ref)
        out_q, out_d, out_s = [], [], []
        # loop is over AND-candidates only (output-bounded)
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            first: dict[str, int] = {}
            for i, tok in enumerate(tokenize(text or ""), start=1):
                if tok not in first:
                    first[tok] = i
            for qid in cmap.get(did, ()):
                ps = [first[term] for term in qt[qid]]
                span = max(ps) - min(ps)
                if span <= NEAR_SLOP:
                    out_q.append(qid)
                    out_d.append(did)
                    out_s.append(span)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "span": pa.array(out_s, pa.int64()),
            }
        )

    tbl = collect_arrow(docs.map_batches(verify, batch_format="pyarrow"))
    if tbl.num_rows == 0:
        return empty
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("query_id", "ascending"), ("doc_id", "ascending")],
        )
    )


def bm25_snippets_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Snippet/highlight generation for the reference-query top-k: for
    every (query, doc) hit, the 1-based char position of the EARLIEST
    occurrence of any analyzed query term as a substring of
    lower(text), and the +/-SNIPPET_RADIUS raw-text window around it —
    the result-page column a search frontend renders.

    Scale shape: the top-k table is output-bounded (|queries| x k); the
    text re-read is a doc_id-predicate-pushdown scan of ONLY the hit
    docs; the per-row find loop is over hits, never the corpus (same
    candidates→verify shape as phrase_match). Oracle:
    ``sqlgen.bm25_snippets_sql`` (identical position/window rule)."""
    import ray

    from snowball_java_ray.constants import SNIPPET_RADIUS
    from snowball_java_ray.functions.text import tokenize

    topk = collect_arrow(
        bm25_topk_sharded_pipeline(sf_dir, n_partitions=n_partitions)
    )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        }
    )
    if topk.num_rows == 0:
        return empty
    qterms = {
        qid: sorted(set(tokenize(q)))
        for qid, q in enumerate(REFERENCE_QUERIES)
    }
    hits: dict[int, list[tuple[int, int]]] = {}
    for qid, rank, did in zip(
        topk["query_id"].to_pylist(),
        topk["rank"].to_pylist(),
        topk["doc_id"].to_pylist(),
    ):
        hits.setdefault(did, []).append((qid, rank))
    hits_ref = ray.put(hits)
    qt_ref = ray.put(qterms)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(list(hits)),
    )

    def snip(t: pa.Table) -> pa.Table:
        import ray as _ray

        hmap = _ray.get(hits_ref)
        qt = _ray.get(qt_ref)
        out = {"query_id": [], "rank": [], "doc_id": [], "pos": [], "snippet": []}
        # loop is over top-k hits (output-bounded), not the corpus
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            low = (text or "").lower()
            for qid, rank in hmap.get(did, ()):
                best = -1
                for term in qt[qid]:
                    p = low.find(term)
                    if p >= 0 and (best < 0 or p < best):
                        best = p
                if best < 0:
                    continue
                pos = best + 1  # 1-based, SQL position() semantics
                start = max(1, pos - SNIPPET_RADIUS)
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(did)
                out["pos"].append(pos)
                out["snippet"].append(
                    text[start - 1 : start - 1 + 2 * SNIPPET_RADIUS + 1]
                )
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "pos": pa.array(out["pos"], pa.int64()),
                "snippet": pa.array(out["snippet"], pa.string()),
            }
        )

    tbl = collect_arrow(docs.map_batches(snip, batch_format="pyarrow"))
    if tbl.num_rows == 0:
        return empty
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("query_id", "ascending"), ("rank", "ascending")],
        )
    )


def bm25_facets_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Faceted search: the facet distribution (doc count by ``lang``
    and by ``source``) over each reference query's top-k hits — the
    sidebar counts a search frontend renders next to results.

    Scale shape: retrieval is the sharded fleet unchanged; the facet
    join reads ONLY the hit docs' metadata columns via doc_id
    predicate pushdown (output-bounded: |queries| x k rows), and the
    count aggregation is an Arrow group_by over that bounded set —
    the corpus is never re-scanned. Oracle: ``sqlgen.bm25_facets_sql``
    (same join + unpivot + counts)."""
    import ray

    topk = collect_arrow(
        bm25_topk_sharded_pipeline(sf_dir, n_partitions=n_partitions)
    )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "facet": pa.array([], pa.string()),
            "val": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if topk.num_rows == 0:
        return empty
    hit_ids = sorted(set(topk["doc_id"].to_pylist()))
    meta = collect_arrow(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "source"],
            filter=pc.field("doc_id").isin(hit_ids),
        )
    )
    by_doc = {
        d: (lg, src)
        for d, lg, src in zip(
            meta["doc_id"].to_pylist(),
            meta["lang"].to_pylist(),
            meta["source"].to_pylist(),
        )
    }
    rows_q, rows_f, rows_v = [], [], []
    for qid, did in zip(
        topk["query_id"].to_pylist(), topk["doc_id"].to_pylist()
    ):
        lg, src = by_doc[did]
        rows_q += [qid, qid]
        rows_f += ["lang", "source"]
        rows_v += [lg, src]
    flat = pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "facet": pa.array(rows_f, pa.string()),
            "val": pa.array(rows_v, pa.string()),
        }
    )
    out = flat.group_by(["query_id", "facet", "val"]).aggregate(
        [("val", "count")]
    )
    out = out.rename_columns(["query_id", "facet", "val", "n"])
    out = out.set_column(3, "n", pc.cast(out["n"], pa.int64()))
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[
                ("query_id", "ascending"),
                ("facet", "ascending"),
                ("val", "ascending"),
            ],
        )
    )


def bm25_explain_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Score explanation: for each query's RANK-1 document, the
    per-term BM25 breakdown (tf, dl, idf, contribution) — the
    "explain" surface a search engine exposes for relevance
    debugging. Output is bounded by |queries| x |query terms|; terms
    that miss the doc are omitted (they contribute 0).

    The breakdown reuses the fleet's own serving inputs: top-1 docs
    from the sharded WAND path, postings slices from the broadcast
    index (tf/dl ride inside the chunk codec), idf from the shared
    ``bm25_idf`` expression. Oracle: ``sqlgen.bm25_explain_sql``."""
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import SCORE_ROUND_DECIMALS
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.stages.score import bm25_idf

    topk = collect_arrow(
        bm25_topk_sharded_pipeline(sf_dir, n_partitions=n_partitions)
    )
    top1 = topk.filter(pc.equal(topk["rank"], 1))
    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index = build_index(corpus, n_docs=n_docs)

    import numpy as np

    out = {k: [] for k in
           ("query_id", "doc_id", "term", "tf", "dl", "idf", "contrib")}
    for qid, did in zip(top1["query_id"].to_pylist(),
                        top1["doc_id"].to_pylist()):
        for term in sorted(set(tokenize(REFERENCE_QUERIES[qid]))):
            doc_ids, tfs, dls = index.postings(term)
            pos = np.searchsorted(doc_ids, did)
            if pos >= doc_ids.size or doc_ids[pos] != did:
                continue
            tf = float(tfs[pos])
            dl = float(dls[pos])
            idf = bm25_idf(index.df.get(term, 0), index.n_docs)
            contrib = idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / index.avgdl)
            )
            out["query_id"].append(qid)
            out["doc_id"].append(did)
            out["term"].append(term)
            out["tf"].append(int(tf))
            out["dl"].append(int(dl))
            out["idf"].append(round(idf, SCORE_ROUND_DECIMALS))
            out["contrib"].append(round(contrib, SCORE_ROUND_DECIMALS))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "term": pa.array(out["term"], pa.string()),
            "tf": pa.array(out["tf"], pa.int64()),
            "dl": pa.array(out["dl"], pa.int64()),
            "idf": pa.array(out["idf"], pa.float64()),
            "contrib": pa.array(out["contrib"], pa.float64()),
        }
    )


def vocab_stats_pipeline(sf_dir: str) -> pa.Table:
    """Vocabulary frequency-of-frequencies: how many terms have each
    document frequency — the Zipf profile an index planner reads to
    size dictionaries, pick stopword cutoffs and predict posting
    skew. One dictionary derivation + an Arrow group_by over (df);
    output is at most |distinct df values| rows."""
    ds = term_df_pipeline(sf_dir)

    def fof(t: pa.Table) -> pa.Table:
        g = t.group_by("df").aggregate([("term", "count")])
        return g.rename_columns(["df", "n_terms"])

    parts = collect_arrow(ds.map_batches(fof, batch_format="pyarrow"))
    out = parts.group_by("df").aggregate([("n_terms", "sum")])
    out = out.rename_columns(["df", "n_terms"])
    out = out.set_column(
        1, "n_terms", pc.cast(out["n_terms"], pa.int64())
    )
    return out.take(pc.sort_indices(out, sort_keys=[("df", "ascending")]))


def percolate_pipeline(sf_dir: str) -> pa.Table:
    """Percolation / reverse search: match the STORED query set against
    a stream of arriving documents with NO index — the alerting /
    saved-search shape (Elasticsearch percolator). Semantics are
    conjunctive (a doc matches a query iff it contains every analyzed
    query term), identical to ``boolean_and`` — but where the fleet
    answers ad-hoc queries against a built index, percolation answers
    "which standing queries fire for this new doc?" in ONE streamed
    scan, so freshly ingested docs can be matched before any index
    exists.

    Scale shape: the query automaton (term -> query ids + per-query
    term counts) is ray.put once and read by every task; per batch,
    tokens match the automaton vocabulary via one ``pc.index_in``,
    (doc, term) pairs dedupe vectorized, term hits expand to (query,
    doc) hits by offset arithmetic, and a per-batch combine emits
    partial match counts — one ``hash_grouped_aggregate`` shuffle of
    partial rows finishes. Oracle: ``sqlgen.boolean_and_sql`` (the
    semantics are shared by construction)."""
    import numpy as np
    import ray

    from snowball_java_ray.functions.text import tokenize, tokenize_arrow
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    qterms = {
        qid: sorted(set(tokenize(q)))
        for qid, q in enumerate(REFERENCE_QUERIES)
    }
    qterms = {qid: ts for qid, ts in qterms.items() if ts}
    term_q: dict[str, list[int]] = {}
    for qid, ts in qterms.items():
        for t in ts:
            term_q.setdefault(t, []).append(qid)
    vocab = sorted(term_q)
    n_vocab = len(vocab)
    qid_flat: list[int] = []
    offs = [0]
    for t in vocab:
        qid_flat.extend(term_q[t])
        offs.append(len(qid_flat))
    automaton = (
        pa.array(vocab, pa.string()),
        np.asarray(qid_flat, np.int64),
        np.asarray(offs, np.int64),
    )
    auto_ref = ray.put(automaton)
    need = {qid: len(ts) for qid, ts in qterms.items()}
    need_ref = ray.put(need)

    def match(t: pa.Table) -> pa.Table:
        import ray as _ray

        v, qf, of = _ray.get(auto_ref)
        row_idx, toks = tokenize_arrow(t["text"])
        pos = pc.index_in(toks, v).fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        m = pos >= 0
        if not m.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        docs = t["doc_id"].to_numpy(zero_copy_only=False)[row_idx[m]]
        vi = pos[m]
        # distinct (doc, automaton-term) pairs; the packed key is safe
        # for doc_id < 2^63 / |automaton vocab| (~2^57 here)
        uk = np.unique(docs * n_vocab + vi)
        docs_u, vi_u = uk // n_vocab, uk % n_vocab
        starts, lens = of[vi_u], of[vi_u + 1] - of[vi_u]
        total = int(lens.sum())
        base = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(base, lens)
            + np.repeat(starts, lens)
        )
        out_q = qf[gather]
        out_d = np.repeat(docs_u, lens)
        # per-batch combine: matched-term count per (query, doc)
        pk, cnt = np.unique(out_q * (1 << 57) + out_d, return_counts=True)
        return pa.table(
            {
                "query_id": pa.array(pk >> 57, pa.int64()),
                "doc_id": pa.array(pk & ((1 << 57) - 1), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    docs_ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    agg = hash_grouped_aggregate(
        docs_ds.map_batches(match, batch_format="pyarrow"),
        ["query_id", "doc_id"],
        [("cnt", "sum", "cnt")],
    )

    def fire(t: pa.Table) -> pa.Table:
        import ray as _ray

        nd = _ray.get(need_ref)
        need_arr = np.zeros(max(nd) + 1, np.int64)
        for qid, n in nd.items():
            need_arr[qid] = n
        q = t["query_id"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c == need_arr[q])).select(
            ["query_id", "doc_id"]
        )

    tbl = collect_arrow(agg.map_batches(fire, batch_format="pyarrow"))
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("query_id", "ascending"), ("doc_id", "ascending")],
        )
    )


def query_expand_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Pseudo-relevance-feedback query expansion: for each reference
    query, the EXPAND_TERMS best expansion terms from its top-k
    feedback docs, weighted by idf(t) * total_tf(t in the feedback
    set) with the query's own analyzed terms excluded — the classic
    Rocchio/RM-style expansion a retrieval stack offers.

    Scale shape: the feedback set is output-bounded (|queries| x k);
    its text re-read is doc_id-predicate-pushdown; term stats come
    from the serving dictionary (chunk summary columns — no corpus
    rescan); idf is constant per term so the weight needs no pinned
    float summation order. Oracle: ``sqlgen.query_expand_sql``."""
    import glob
    import json

    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.constants import (
        EXPAND_TERMS,
        RANK_ROUND_DECIMALS,
        SCORE_ROUND_DECIMALS,
    )
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.pipelines.index_pipeline import (
        doc_lo_sort_key,
        live_doc_count,
    )
    from snowball_java_ray.stages.index_build import dictionary_from_chunks
    from snowball_java_ray.stages.score import bm25_idf

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    topk = collect_arrow(
        bm25_topk_sharded_pipeline(sf_dir, n_partitions=n_partitions)
    )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "weight": pa.array([], pa.float64()),
        }
    )
    if topk.num_rows == 0:
        return empty

    # per-doc term counts over ONLY the feedback docs (pushdown read;
    # the tokenize loop is output-bounded, never the corpus)
    hit_ids = sorted(set(topk["doc_id"].to_pylist()))
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(hit_ids),
    )

    def doc_tf(t: pa.Table) -> pa.Table:
        from collections import Counter

        out_d, out_t, out_n = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            for term, n in sorted(Counter(tokenize(text or "")).items()):
                out_d.append(did)
                out_t.append(term)
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "tf": pa.array(out_n, pa.int64()),
            }
        )

    tfs = collect_arrow(docs.map_batches(doc_tf, batch_format="pyarrow"))
    tf_by_doc: dict[int, list[tuple[str, int]]] = {}
    for did, term, n in zip(
        tfs["doc_id"].to_pylist(), tfs["term"].to_pylist(),
        tfs["tf"].to_pylist(),
    ):
        tf_by_doc.setdefault(did, []).append((term, n))

    # global df / n_docs from the index's own summaries (what the
    # serving dictionary is made of)
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_docs = live_doc_count(json.load(f))
    files = sorted(glob.glob(os.path.join(index_dir, "chunks_*.parquet")),
                   key=doc_lo_sort_key)
    summ = pa.concat_tables(
        [pq.read_table(f, columns=["term", "df", "cf"]) for f in files],
        promote_options="default",
    )
    dic = dictionary_from_chunks(summ)
    df_of = dict(zip(dic["term"].to_pylist(), dic["df"].to_pylist()))

    own_terms = {
        qid: set(tokenize(q)) for qid, q in enumerate(REFERENCE_QUERIES)
    }
    total_tf: dict[tuple[int, str], int] = {}
    for qid, did in zip(topk["query_id"].to_pylist(),
                        topk["doc_id"].to_pylist()):
        for term, n in tf_by_doc.get(did, ()):
            if term in own_terms[qid]:
                continue
            total_tf[(qid, term)] = total_tf.get((qid, term), 0) + n

    import numpy as np

    qids = np.array([k[0] for k in total_tf], np.int64)
    terms = np.array([k[1] for k in total_tf], object)
    weights = np.array(
        [bm25_idf(int(df_of.get(k[1], 0)), n_docs) * v
         for k, v in total_tf.items()],
        np.float64,
    )
    out_q, out_r, out_t, out_w = [], [], [], []
    for qid in np.unique(qids):
        m = qids == qid
        t_q, w_q = terms[m], weights[m]
        order = np.lexsort((t_q, -np.round(w_q, RANK_ROUND_DECIMALS)))
        order = order[:EXPAND_TERMS]
        out_q.extend([int(qid)] * order.size)
        out_r.extend(range(1, order.size + 1))
        out_t.extend(t_q[order].tolist())
        out_w.extend(
            np.round(w_q[order], SCORE_ROUND_DECIMALS).tolist()
        )
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "term": pa.array(out_t, pa.string()),
            "weight": pa.array(out_w, pa.float64()),
        }
    )


def term_complete_pipeline(sf_dir: str) -> pa.Table:
    """Prefix completion ("search-as-you-type"): for each fixed probe
    prefix, the COMPLETE_K most frequent dictionary terms starting
    with it (cf DESC, term ASC). A no-hit prefix yields zero rows.

    Scale shape: the dictionary Dataset streams through a per-batch
    partial top-k (each batch emits at most |prefixes| x k rows), so
    driver traffic is O(blocks x prefixes x k) regardless of
    vocabulary size — the map-side-combine discipline applied to
    completion. Oracle: ``sqlgen.term_complete_sql``."""
    from snowball_java_ray.constants import COMPLETE_K, COMPLETE_PREFIXES

    def partial_topk(t: pa.Table) -> pa.Table:
        out_p, out_t, out_c = [], [], []
        terms = t["term"]
        for p in COMPLETE_PREFIXES:
            m = pc.starts_with(terms, p)
            sub = t.filter(m)
            if sub.num_rows == 0:
                continue
            order = pc.sort_indices(
                sub,
                sort_keys=[("cf", "descending"), ("term", "ascending")],
            )[:COMPLETE_K]
            sub = sub.take(order)
            out_p.extend([p] * sub.num_rows)
            out_t.extend(sub["term"].to_pylist())
            out_c.extend(sub["cf"].to_pylist())
        return pa.table(
            {
                "prefix": pa.array(out_p, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "cf": pa.array(out_c, pa.int64()),
            }
        )

    cand = collect_arrow(
        term_df_pipeline(sf_dir).map_batches(
            partial_topk, batch_format="pyarrow"
        )
    )
    out_p, out_r, out_t, out_c = [], [], [], []
    for p in COMPLETE_PREFIXES:
        sub = cand.filter(pc.equal(cand["prefix"], p))
        if sub.num_rows == 0:
            continue
        order = pc.sort_indices(
            sub, sort_keys=[("cf", "descending"), ("term", "ascending")]
        )[:COMPLETE_K]
        sub = sub.take(order)
        out_p.extend([p] * sub.num_rows)
        out_r.extend(range(1, sub.num_rows + 1))
        out_t.extend(sub["term"].to_pylist())
        out_c.extend(sub["cf"].to_pylist())
    return pa.table(
        {
            "prefix": pa.array(out_p, pa.string()),
            "rank": pa.array(out_r, pa.int32()),
            "term": pa.array(out_t, pa.string()),
            "cf": pa.array(out_c, pa.int64()),
        }
    )


def hybrid_topk_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical leg
    (sharded BM25 fleet) and the vector leg (brute-force cosine ANN)
    for the query ids that carry both a reference query text and a
    query vector (query_id == vec_id < ANN_N_QUERIES; the corpus
    embedding of vec_id is doc_id's). rrf(d) = sum over legs where d
    appears of 1/(RRF_K + rank) — the standard fusion that needs no
    score calibration between BM25 and cosine.

    Scale shape: both legs are existing distributed pipelines
    (scatter/gather fleet; one streamed corpus scan vs a broadcast
    query matrix); fusion itself runs over their output-bounded
    top-ks (2 x |queries| x k rows). Oracle:
    ``sqlgen.hybrid_topk_sql`` (FULL OUTER JOIN of the two leg
    oracles)."""
    from snowball_java_ray.constants import (
        ANN_N_QUERIES,
        RANK_ROUND_DECIMALS,
        RRF_K,
        SCORE_ROUND_DECIMALS,
    )
    from snowball_java_ray.ops.ann import ann_topk

    bm = collect_arrow(
        bm25_topk_sharded_pipeline(sf_dir, n_partitions=n_partitions)
    )
    bm = bm.filter(pc.less(bm["query_id"], ANN_N_QUERIES))
    ann = collect_arrow(ann_topk(sf_dir))

    legs: dict[tuple[int, int], list[int]] = {}
    for qid, rank, did in zip(
        bm["query_id"].to_pylist(), bm["rank"].to_pylist(),
        bm["doc_id"].to_pylist(),
    ):
        legs.setdefault((qid, did), [0, 0])[0] = rank
    for qid, rank, did in zip(
        ann["query_vec_id"].to_pylist(), ann["rank"].to_pylist(),
        ann["vec_id"].to_pylist(),
    ):
        legs.setdefault((int(qid), int(did)), [0, 0])[1] = int(rank)

    import numpy as np

    keys = sorted(legs)
    qids = np.array([k[0] for k in keys], np.int64)
    dids = np.array([k[1] for k in keys], np.int64)
    bm_r = np.array([legs[k][0] for k in keys], np.int64)
    an_r = np.array([legs[k][1] for k in keys], np.int64)
    # bm term first, ann second — the same addition order as the SQL
    rrf = np.where(bm_r > 0, 1.0 / (RRF_K + bm_r), 0.0) + np.where(
        an_r > 0, 1.0 / (RRF_K + an_r), 0.0
    )
    out_q, out_r, out_d, out_s, out_b, out_a = [], [], [], [], [], []
    for qid in np.unique(qids):
        m = qids == qid
        order = np.lexsort((dids[m], -np.round(rrf[m], RANK_ROUND_DECIMALS)))
        order = order[:TOP_K]
        out_q.extend([int(qid)] * order.size)
        out_r.extend(range(1, order.size + 1))
        out_d.extend(dids[m][order].tolist())
        out_s.extend(
            np.round(rrf[m][order], SCORE_ROUND_DECIMALS).tolist()
        )
        out_b.extend(bm_r[m][order].tolist())
        out_a.extend(an_r[m][order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "rrf": pa.array(out_s, pa.float64()),
            "bm_rank": pa.array(out_b, pa.int64()),
            "ann_rank": pa.array(out_a, pa.int64()),
        }
    )


def bm25_topk_diverse_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> ray.data.Dataset:
    """Diversified retrieval: top-k with at most DIVERSITY_CAP docs
    per ``source`` (keep docs whose within-source rank by the global
    key <= cap, then cut to k) — the result-page de-clustering rule
    search engines apply per site/domain.

    Scale shape: each shard actor reads ONLY its doc range's
    (doc_id, source) metadata (parquet predicate pushdown in the
    actor) and returns its per-source top-cap candidates — bounded by
    cap x sources per query regardless of shard size; the gather
    recomputes source ranks over the merged candidates, which is
    EXACT because a doc with global source-rank <= cap has local
    source-rank <= cap in its shard (stages/serve.score_batch_diverse
    has the argument). Oracle: ``sqlgen.bm25_topk_diverse_sql``."""
    from snowball_java_ray.constants import DIVERSITY_CAP
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(
        index_dir, source_parquet=f"{sf_dir}/documents.parquet"
    )
    try:
        return svc.topk_dataset(
            reference_queries_ds(), diversify_cap=DIVERSITY_CAP
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def bm25_topk_filtered_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> ray.data.Dataset:
    """Metadata-filtered retrieval: BM25 top-k restricted to docs with
    ``source == FILTER_SOURCE`` — the Lucene filter-query contract
    (global idf/avgdl, the filter restricts CANDIDATES only), the
    everyday "search within this site/collection" feature.

    Scale shape: each shard actor holds its doc range's factorized
    (doc_id, source) metadata (the same actor-side predicate-pushdown
    read diversified retrieval uses) and returns its post-filter local
    top-k; the gather merge is the plain top-k merge (filtering
    commutes with the ranking order, so per-shard filter-then-cut is
    exact). Oracle: ``sqlgen.bm25_topk_filtered_sql``."""
    from snowball_java_ray.constants import FILTER_SOURCE
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(
        index_dir, source_parquet=f"{sf_dir}/documents.parquet"
    )
    try:
        return svc.topk_dataset(
            reference_queries_ds(), filter_source=FILTER_SOURCE
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def more_like_this_pipeline(
    sf_dir: str, top_k: int = TOP_K, n_partitions: int = 4
) -> pa.Table:
    """Related-document retrieval ("more like this"): each query doc
    (the fixed ``doc_id < MLT_N_QUERY_DOCS`` range — the same
    constant-rule pattern as the ANN query vectors) is represented by
    its ``MLT_TERMS`` strongest terms ranked by tf*idf (rounded to
    RANK_ROUND_DECIMALS DESC, term ASC), which are scored as a BM25
    query through the doc-sharded serving fleet; the query doc itself
    is excluded and ranks re-assigned 1..top_k.

    Scale shape: the per-query term derivation reads ONLY the query
    docs (parquet predicate pushdown) and ranks against the serving
    dictionary (idf lookups on the term-sorted Arrow table — no corpus
    scan); retrieval reuses the scatter/gather fleet unchanged, asking
    for top_k+1 so dropping the self-hit still leaves the true top-k
    whether or not the self-hit was present. Oracle:
    ``sqlgen.more_like_this_sql`` (same ranking rule and BM25
    expression)."""
    import math

    import numpy as np
    import ray

    from snowball_java_ray.constants import (
        MLT_N_QUERY_DOCS,
        MLT_TERMS,
        RANK_ROUND_DECIMALS,
    )
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.stages.serve import BM25ShardedService

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    try:
        qdocs = collect_arrow(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text"],
                filter=pc.field("doc_id") < MLT_N_QUERY_DOCS,
            )
        )
        dic = ray.get(svc.df_ref)  # term-sorted (term, df, cf)
        n = float(svc.n_docs)
        items = []
        for qid, text in zip(
            qdocs["doc_id"].to_pylist(), qdocs["text"].to_pylist()
        ):
            tf: dict[str, int] = {}
            for tok in tokenize(text or ""):
                tf[tok] = tf.get(tok, 0) + 1
            if not tf:
                continue
            terms = sorted(tf)
            idx = pc.index_in(
                pa.array(terms, pa.string()), value_set=dic["term"]
            ).to_numpy(zero_copy_only=False)
            dfs = dic["df"].to_numpy(zero_copy_only=False)
            scored = []
            for t, i in zip(terms, idx):
                df_t = float(dfs[int(i)]) if i is not None and i >= 0 else 0.0
                idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
                scored.append(
                    (-round(tf[t] * idf, RANK_ROUND_DECIMALS), t)
                )
            scored.sort()
            items.append(
                {
                    "query_id": int(qid),
                    "qtext": " ".join(t for _, t in scored[:MLT_TERMS]),
                }
            )
        if not items:
            raw = pa.table({})
        else:
            raw = collect_arrow(
                svc.topk_dataset(
                    ray.data.from_items(items), top_k=top_k + 1
                )
            )
    finally:
        svc.shutdown()
    empty = pa.table(
        {
            "query_doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if raw.num_rows == 0:
        return empty
    raw = raw.take(
        pc.sort_indices(
            raw, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )
    qi = raw["query_id"].to_numpy(zero_copy_only=False)
    di = raw["doc_id"].to_numpy(zero_copy_only=False)
    keep = qi != di  # drop the self-hit
    qi, di = qi[keep], di[keep]
    sc = raw["score"].to_numpy(zero_copy_only=False)[keep]
    # re-rank 1..top_k within each query (rows already rank-sorted)
    starts = np.r_[0, np.flatnonzero(np.diff(qi)) + 1]
    lens = np.diff(np.r_[starts, len(qi)])
    rank = np.arange(len(qi)) - np.repeat(starts, lens) + 1
    final = rank <= top_k
    return pa.table(
        {
            "query_doc_id": pa.array(qi[final], pa.int64()),
            "rank": pa.array(rank[final].astype(np.int32), pa.int32()),
            "doc_id": pa.array(di[final], pa.int64()),
            "score": pa.array(sc[final], pa.float64()),
        }
    )


def term_df_pipeline(sf_dir: str) -> ray.data.Dataset:
    corpus = documents_as_corpus(sf_dir)
    return build_dictionary(build_postings(corpus)).sort("term")


def term_topk_df_pipeline(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k heaviest terms by df (the skew report: these are the
    stop-word-class terms the sharding exists for)."""
    corpus = documents_as_corpus(sf_dir)
    return (
        build_dictionary(build_postings(corpus))
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
    )


def snowball_patterns_pipeline(sf_dir: str):
    """Pattern table of the sf-scaled bootstrap run (value-checked
    against the serial twin)."""
    return _snowball_bootstrap_result(sf_dir).patterns


def doc_stats_pipeline(sf_dir: str) -> ray.data.Dataset:
    corpus = documents_as_corpus(sf_dir)
    return corpus.map_batches(make_doc_stats(), batch_format="pyarrow").sort("doc_id")


def index_meta_pipeline(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Mean, Sum

    stats = doc_stats_pipeline(sf_dir)
    agg = stats.aggregate(
        Count(alias_name="n_docs"),
        Mean("doc_len", alias_name="avgdl"),
        Sum("doc_len", alias_name="total_terms"),
    )
    return pa.table(
        {
            "n_docs": pa.array([int(agg["n_docs"])], pa.int64()),
            "avgdl": pa.array(
                [round(float(agg["avgdl"]), SCORE_ROUND_DECIMALS)], pa.float64()
            ),
            "total_terms": pa.array([int(agg["total_terms"])], pa.int64()),
        }
    )


def ingest_corpus_pipeline(sf_dir: str) -> ray.data.Dataset:
    # the sha guard runs at the materialization boundary (M12)
    return (
        documents_as_corpus(sf_dir)
        .map_batches(verify_sha_batch, batch_format="pyarrow")
        .sort("doc_id")
    )


def boolean_and_pipeline(sf_dir: str) -> pa.Table:
    """Conjunctive retrieval: for each reference query, the doc_ids
    containing ALL its terms — posting-list intersection over the
    compressed index (the J6 lookup path without scoring)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.functions.text import tokenize

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index = build_index(documents_as_corpus(sf_dir), n_docs=n_docs)
    out_q, out_d = [], []
    for qid, qtext in enumerate(REFERENCE_QUERIES):
        terms = sorted(set(tokenize(qtext)))
        if not terms:
            continue
        acc = None
        for t in terms:
            ids, _, _ = index.postings(t)
            acc = ids if acc is None else np.intersect1d(acc, ids)
            if acc.size == 0:
                break
        if acc is None or acc.size == 0:
            continue
        out_q.extend([qid] * acc.size)
        out_d.extend(acc.tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
        }
    )


# --- Snowball workload layer (sf-SCALED deterministic tagged corpus,
# --- value-checked against the serial twin oracle_snowball.py) ---------

# The gate corpus is synthesized (the testdata documents carry no
# entity tags) but SCALED to the sf under check: rows = 2x the sf_dir's
# documents row count (>= 800), so the driver gate exercises the
# DISTRIBUTED checkpointed extraction path at testdata scale, not a
# fixed toy table (VERDICT r2 next-step #3). The serial twin derives
# the identical row count from GRAFT_CHECK_SF (default sf0.01 — the
# driver's check scale).
SNOWBALL_SEED = 42
SNOWBALL_TAGGED_FRACTION = 0.6
_SNOWBALL_MIN_ROWS = 800


def snowball_gate_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(_SNOWBALL_MIN_ROWS, 2 * n)


def _snowball_cfg_key() -> str:
    import hashlib
    import json

    from snowball_java_ray.constants import SNOWBALL_DEFAULTS

    basis = json.dumps(SNOWBALL_DEFAULTS, sort_keys=True, default=str)
    return hashlib.md5(basis.encode()).hexdigest()[:8]


def ensure_snowball_tuples(sf_dir: str, n_partitions: int = 8):
    """Distributed checkpoint-resumable extraction (S8) over the scaled
    tagged corpus; cached under /tmp keyed by (rows, seed, fraction,
    config) so the three gate entries share ONE extraction run.
    Returns (rows, tuples Arrow table)."""
    from snowball_java_ray.config import EngineConfig
    from snowball_java_ray.pipelines.snowball import (
        extract_tuples_checkpointed,
        load_tuples,
    )
    from snowball_java_ray.sources.corpus import gen_corpus_dataset_range

    rows = snowball_gate_rows(sf_dir)
    out_dir = (
        f"/tmp/snowball_extract/{rows}_{SNOWBALL_SEED}"
        f"_{SNOWBALL_TAGGED_FRACTION}_{_snowball_cfg_key()}"
    )
    os.makedirs(out_dir, exist_ok=True)

    def corpus_source(lo, hi):
        return gen_corpus_dataset_range(
            lo, hi, seed=SNOWBALL_SEED,
            tagged_fraction=SNOWBALL_TAGGED_FRACTION,
        )

    extract_tuples_checkpointed(
        corpus_source, out_dir, rows, EngineConfig(),
        n_partitions=n_partitions,
    )
    return rows, load_tuples(out_dir)


def _snowball_bootstrap_result(sf_dir: str):
    import ray.data

    from snowball_java_ray.config import EngineConfig
    from snowball_java_ray.pipelines.snowball import snowball_bootstrap
    from snowball_java_ray.sources.corpus import (
        DEFAULT_SEEDS,
        gen_corpus_dataset,
    )

    rows, tuples_tbl = ensure_snowball_tuples(sf_dir)
    corpus = gen_corpus_dataset(
        rows, seed=SNOWBALL_SEED, tagged_fraction=SNOWBALL_TAGGED_FRACTION
    )
    index = build_index(corpus, n_docs=rows, shard_size=256)
    return snowball_bootstrap(
        None, DEFAULT_SEEDS, EngineConfig(), index.df, index.n_docs,
        tuples_ds=ray.data.from_arrow(tuples_tbl),
    )


def snowball_extract_pipeline(sf_dir: str) -> ray.data.Dataset:
    """M1-M7 extraction at sf scale through the DISTRIBUTED
    checkpointed path (extract_tuples_checkpointed); value-checked
    against the serial twin's extraction."""
    import ray.data

    _, tuples_tbl = ensure_snowball_tuples(sf_dir)
    return ray.data.from_arrow(tuples_tbl).sort(
        ["e1", "e2", "doc_id", "sentence"]
    )


def snowball_e2e_pipeline(sf_dir: str):
    """Full bootstrap loop (2 iterations) over the sf-scaled corpus,
    fed from the distributed extraction checkpoint."""
    return _snowball_bootstrap_result(sf_dir).tuples


def bm25_rank_eval_pipeline(sf_dir: str) -> pa.Table:
    """Retrieval-quality evaluation of the sharded BM25 ranking:
    qrels(q) = docs containing ALL of q's analyzed terms (the
    conjunctive-match relevance oracle — exactly boolean_and's
    semantics, so the label set itself is independently hash-checked
    by that entry). Per query with >= 1 relevant doc: n_rel, hits@k
    (relevant docs inside the BM25 top-k), rr (1/rank of the first
    relevant hit, 0 if none) and recall@k (hits/n_rel).

    Scale shape: both legs are the existing distributed pipelines
    (sharded fleet boolean AND + sharded top-k); their outputs are
    output-bounded (|q| x matches, |q| x k), so the metric join is a
    vectorized pandas merge over result tables, not corpus data. rr
    and recall are SINGLE divisions (no float summation order),
    rounded to RANK_ROUND_DECIMALS on both engines."""
    import numpy as np

    from snowball_java_ray.constants import RANK_ROUND_DECIMALS

    rel = boolean_and_sharded_pipeline(sf_dir).to_pandas()
    topk = collect_arrow(bm25_topk_sharded_pipeline(sf_dir)).to_pandas()

    nrel = (
        rel.groupby("query_id").size().rename("n_rel").reset_index()
    )
    m = topk.merge(rel, on=["query_id", "doc_id"], how="inner")
    hits = (
        m.groupby("query_id")
        .agg(hits_k=("doc_id", "count"), first_rank=("rank", "min"))
        .reset_index()
    )
    out = nrel.merge(hits, on="query_id", how="left")
    out["hits_k"] = out["hits_k"].fillna(0).astype("int64")
    # 6-dp floor quantizer (boundary-proof: round() half-modes differ
    # between numpy and DuckDB exactly on small-int ratios like 1/128)
    out["rr"] = np.floor(
        np.where(out["first_rank"].notna(), 1.0 / out["first_rank"], 0.0)
        * 1e6 + 0.5
    ) / 1e6
    out["recall_k"] = (
        np.floor((out["hits_k"] / out["n_rel"]).to_numpy() * 1e6 + 0.5) / 1e6
    )
    out = out[
        ["query_id", "n_rel", "hits_k", "rr", "recall_k"]
    ].sort_values("query_id")
    return pa.Table.from_pandas(
        out.reset_index(drop=True), preserve_index=False
    )


def bm25_page2_pipeline(sf_dir: str, n_partitions: int = 4) -> pa.Table:
    """Deep pagination / search_after: the SECOND page of results for
    every reference query — the caller holds page 1, passes its last
    hit as the cursor, and receives the next TOP_K rows of the same
    deterministic total order (round(score, RANK) DESC, doc_id ASC),
    with page-absolute ranks.

    Scale shape — TRUE per-shard cursor pushdown
    (stages/serve.SearchAfterScorer): round 1 serves page 1 through
    the normal scatter/gather; each full-page query's cursor (round-9
    merged score + last doc_id) then drives a ``score_batch_after``
    round in which every shard cuts below the cursor key BEFORE its
    local top-k, so responses are already next-page-local and gather
    traffic stays O(shards x k) at any page depth — never a
    top-(page*k) overfetch."""
    from snowball_java_ray.stages.serve import (
        BM25ShardedService,
        SearchAfterScorer,
    )

    index_dir = ensure_index_dir(sf_dir, n_partitions=n_partitions)
    svc = BM25ShardedService(index_dir)
    try:
        return collect_arrow(
            svc.topk_dataset(
                reference_queries_ds(), scorer_cls=SearchAfterScorer
            ).sort(["query_id", "rank"]).materialize()
        )
    finally:
        svc.shutdown()


def bm25_synonyms_pipeline(
    sf_dir: str, concurrency: int = 2
) -> ray.data.Dataset:
    """Synonym-aware retrieval (Lucene SynonymQuery semantics): query
    terms in a SYNONYM_GROUPS group score as ONE pseudo-term — per-doc
    tf sums the members, df/idf come from the union of the member
    posting lists. Same broadcast-index actor-pool shape as
    bm25_topk_pipeline; the group merge happens inside the scorer on
    decoded postings, so the index layout is unchanged (the query-time
    rewrite contract)."""
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.stages.score import SynonymScorer

    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return reference_queries_ds().map_batches(
        SynonymScorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])


def bm25_topk_upserted_pipeline(
    sf_dir: str, n_partitions: int = 4
) -> ray.data.Dataset:
    """Document UPDATE end-to-end (the Lucene update-document
    contract): every doc in the deterministic upsert set is
    tombstoned and its new version (text + " updated") appended as a
    fresh tail doc_id — delete is O(deleted), the append writes ONE
    new disjoint segment, no existing chunk is touched. Serving (WAND
    fleet) then sees: new versions retrievable, originals masked,
    global stats spanning BOTH versions until compaction. Oracle =
    sqlgen.bm25_topk_upserted_sql (same corpus_all view + candidate
    exclusion)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.constants import UPSERT_MOD, UPSERT_REM
    from snowball_java_ray.pipelines.index_pipeline import (
        append_partition,
        delete_docs,
    )
    from snowball_java_ray.stages.serve import BM25ShardedService

    src = f"{sf_dir}/documents.parquet"
    n0 = pq.read_metadata(src).num_rows
    upd = np.arange(UPSERT_REM, n0, UPSERT_MOD)

    index_dir = ensure_index_dir(
        sf_dir, n_partitions=n_partitions, variant="upsert"
    )
    delete_docs(index_dir, upd)

    def new_versions(lo: int, hi: int):
        ds = ray.data.read_parquet(src, columns=["doc_id", "text"])

        def mk(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = ids % UPSERT_MOD == UPSERT_REM
            sub = t.filter(pa.array(mask))
            new_ids = n0 + (ids[mask] - UPSERT_REM) // UPSERT_MOD
            content = pc.binary_join_element_wise(
                pc.fill_null(sub["text"].combine_chunks(), ""),
                pa.scalar("updated"),
                " ",
            )
            return pa.table(
                {
                    "doc_id": pa.array(new_ids, pa.int64()),
                    "content": content,
                }
            )

        return ds.map_batches(mk, batch_format="pyarrow")

    append_partition(new_versions, index_dir, n0, n0 + upd.size)

    svc = BM25ShardedService(index_dir)
    try:
        return svc.topk_dataset(
            reference_queries_ds(), algo="wand"
        ).sort(["query_id", "rank"]).materialize()
    finally:
        svc.shutdown()


def bm25_boosted_pipeline(
    sf_dir: str, concurrency: int = 2
) -> ray.data.Dataset:
    """Function-score retrieval: BM25 multiplied by a document-signal
    boost (1 + ln(1 + dl/BOOST_DL_NORM)) — the Elasticsearch
    function_score shape. Broadcast-index actor pool; the signal rides
    in the postings, so no extra per-doc broadcast."""
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.stages.score import BoostedScorer

    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return reference_queries_ds().map_batches(
        BoostedScorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])


def bm25_fielded_pipeline(
    sf_dir: str, concurrency: int = 2
) -> ray.data.Dataset:
    """Multi-field retrieval (BM25F-by-repetition): each document is
    split into a title field (first TITLE_TOKENS analyzed tokens) and
    a body, and title tokens are boosted TITLE_BOOST x by the classic
    field-repetition encoding — weighted tf AND weighted length norm
    fall out of plain BM25 over the re-encoded corpus, with integer
    weights (no new float surface). The re-encode is one fully
    vectorized map (Arrow list_slice + binary_join over the tokenized
    list column); index build and serving are unchanged."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.constants import TITLE_BOOST, TITLE_TOKENS
    from snowball_java_ray.functions.text import tokenize_arrow

    def re_encode(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"].combine_chunks(), "")
        row_idx, flat = tokenize_arrow(texts)
        counts = np.bincount(row_idx, minlength=len(texts))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat
        )
        title = pc.binary_join(
            pc.list_slice(lists, 0, TITLE_TOKENS), " "
        )
        body = pc.binary_join(
            pc.list_slice(lists, TITLE_TOKENS, None), " "
        )
        parts = [title] * TITLE_BOOST + [body]
        content = pc.binary_join_element_wise(*parts, " ")
        return pa.table({"doc_id": t["doc_id"], "content": content})

    corpus = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(re_encode, batch_format="pyarrow")
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return reference_queries_ds().map_batches(
        BM25Scorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])


def bm25_msm_pipeline(
    sf_dir: str, concurrency: int = 2
) -> ray.data.Dataset:
    """minimum_should_match retrieval: candidates must match at least
    min(MSM_MIN, n_query_terms) distinct analyzed terms, scored by
    plain BM25 over the matched terms — the Lucene/ES msm contract.
    Broadcast-index actor pool."""
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.stages.score import MSMScorer

    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return reference_queries_ds().map_batches(
        MSMScorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])


class ChunkPoolScorer:
    """Actor-pool scorer for passage retrieval: scores every candidate
    CHUNK (no chunk-level cut), max-pools per parent doc, THEN cuts to
    the doc top-k — exact because pooling precedes the cut. At fleet
    scale the same pool-before-cut runs per shard (a doc's chunks are
    contiguous synthetic ids, so they co-locate in one doc-range
    shard) and the gather merges per-parent maxima."""

    def __init__(self, index_ref):
        import ray

        self.index = (
            ray.get(index_ref)
            if isinstance(index_ref, ray.ObjectRef)
            else index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from snowball_java_ray.constants import (
            CHUNK_ID_BASE,
            RANK_ROUND_DECIMALS,
            SCORE_ROUND_DECIMALS,
            TOP_K,
        )
        from snowball_java_ray.stages.score import score_query

        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["qtext"].to_pylist()
        ):
            cids, cscores = score_query(
                self.index, qtext, top_k=self.index.n_docs or 1
            )
            if cids.size == 0:
                continue
            parents = cids // CHUNK_ID_BASE
            order = np.argsort(parents, kind="stable")
            p, s = parents[order], cscores[order]
            starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
            pmax = np.maximum.reduceat(s, starts)
            pdoc = p[starts]
            cut = np.lexsort((pdoc, -np.round(pmax, RANK_ROUND_DECIMALS)))
            cut = cut[:TOP_K]
            out["query_id"].extend([int(qid)] * cut.size)
            out["rank"].extend(range(1, cut.size + 1))
            out["doc_id"].extend(pdoc[cut].tolist())
            out["score"].extend(
                np.round(pmax[cut], SCORE_ROUND_DECIMALS).tolist()
            )
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )


def bm25_chunks_pipeline(
    sf_dir: str, concurrency: int = 2
) -> pa.Table:
    """Passage-level retrieval with doc max-pooling: the index is
    built over the chunk_documents windows (synthetic chunk ids =
    doc_id * CHUNK_ID_BASE + chunk_id), queries score CHUNKS, and the
    parent document ranks by its best chunk (max — order-free, no
    float-summation concern). This is the long-document retrieval
    shape: windows bound what the scorer sees while documents stay
    the ranking unit."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.constants import CHUNK_ID_BASE
    from snowball_java_ray.ops.textstats import chunk_documents

    chunks = chunk_documents(sf_dir)

    def as_corpus(t: pa.Table) -> pa.Table:
        cid = t["chunk_id"].to_numpy(zero_copy_only=False)
        assert (cid < CHUNK_ID_BASE).all(), "chunk_id overflows base"
        synth = (
            t["doc_id"].to_numpy(zero_copy_only=False) * CHUNK_ID_BASE
            + cid
        )
        return pa.table(
            {
                "doc_id": pa.array(synth, pa.int64()),
                "content": t["chunk_text"],
            }
        )

    corpus = chunks.map_batches(as_corpus, batch_format="pyarrow")
    n_chunks = corpus.count()
    index_ref = ray.put(build_index(corpus, n_docs=n_chunks))
    # pooling happens INSIDE the scorer actor before any cut (see
    # ChunkPoolScorer) — every candidate chunk participates in its
    # parent's max, so the doc top-k is exact and the emitted rows
    # stay O(queries x k)
    return collect_arrow(
        reference_queries_ds().map_batches(
            ChunkPoolScorer,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=8,
        ).sort(["query_id", "rank"])
    )


def bm25_corrected_pipeline(
    sf_dir: str, concurrency: int = 2
) -> ray.data.Dataset:
    """Spell-corrected retrieval end-to-end (the did-you-mean search
    path): every reference query arrives MISSPELLED (deterministic
    second-character drop, ops/textstats.misspell_text); each analyzed
    token is corrected to its rank-1 fuzzy-dictionary suggestion
    (trigram-blocked levenshtein <= 2, dist ASC / df DESC / term ASC —
    exactly term_suggest's rule, so the correction layer shares that
    entry's verified semantics) with unknown tokens passing through;
    the corrected queries then score through the standard broadcast
    BM25 path. Correction-map construction is the term_suggest scan
    shape: dictionary Dataset streamed once against a broadcast
    probe-trigram map."""
    import pyarrow.parquet as pq
    import ray

    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import misspell_text, term_suggest

    mis_qs = [misspell_text(q) for q in REFERENCE_QUERIES]
    probes = sorted({t for q in mis_qs for t in tokenize(q)})
    sugg = term_suggest(sf_dir, probes=probes).to_pandas()
    best = dict(
        zip(
            sugg.loc[sugg["rank"] == 1, "query_term"],
            sugg.loc[sugg["rank"] == 1, "term"],
        )
    )
    corrected = [
        " ".join(best.get(t, t) for t in tokenize(mq)) for mq in mis_qs
    ]
    queries_ds = ray.data.from_items(
        [
            {"query_id": i, "qtext": c}
            for i, c in enumerate(corrected)
        ]
    )
    corpus = documents_as_corpus(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    index_ref = ray.put(build_index(corpus, n_docs=n_docs))
    return queries_ds.map_batches(
        BM25Scorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8,
    ).sort(["query_id", "rank"])
