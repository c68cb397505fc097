"""Checkpoint-resumable distributed index build.

The corpus is split into doc-range PARTITIONS (the resumability and
lineage unit); each partition runs the tokenize -> groupby(term, shard)
-> encode pipeline and writes one chunk parquet file + a manifest entry
with metrics. Chunks from different partitions never overlap in doc_id
space, so no cross-partition merge is needed — the global index is the
union of per-partition chunk tables, with the dictionary derived from
chunk summaries at load (stages/index_build.dictionary_from_chunks).

This is exactly how a 10^12-doc build stays restartable: one
`ray job submit` per failed/remaining input shard range; finished
shards are skipped by the manifest; per-shard outputs are immutable
parquet. A killed run resumes to byte-identical results
(tests/test_resume.py)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from snowball_java_ray.config import EngineConfig
from snowball_java_ray.stages.index_build import build_chunk_table
from snowball_java_ray.state.checkpoint import Manifest


def index_format_fingerprint() -> str:
    """Short digest of everything that determines chunk-file CONTENT:
    analyzer constants + codec version. Embedded in on-disk index
    cache keys (pipelines.api.ensure_index_dir, bench) so an index
    built by older code can never be silently served after an
    analyzer/codec change."""
    import hashlib

    from snowball_java_ray.constants import (
        NUMERIC_TOKEN_PATTERN,
        STOPWORDS,
        TOKEN_SPLIT_PATTERN,
    )
    from snowball_java_ray.functions.codec import CODEC_VERSION

    basis = "|".join(
        [TOKEN_SPLIT_PATTERN, NUMERIC_TOKEN_PATTERN,
         ",".join(sorted(STOPWORDS)), f"codec{CODEC_VERSION}"]
    )
    return hashlib.md5(basis.encode()).hexdigest()[:10]


def _partition_bounds(n_docs: int, n_partitions: int) -> list[tuple[int, int]]:
    step = (n_docs + n_partitions - 1) // n_partitions
    return [(lo, min(lo + step, n_docs)) for lo in range(0, n_docs, step)]


def build_index_checkpointed(
    corpus_source,
    out_dir: str,
    n_docs: int,
    n_partitions: int = 4,
    shard_size: int = 256,
    text_col: str = "content",
    id_col: str = "doc_id",
    max_partitions: int | None = None,
) -> dict:
    """``corpus_source(lo, hi) -> ray.data.Dataset`` yields the corpus
    slice with lo <= doc_id < hi (a read_parquet with a row filter in
    production — predicate pushdown keeps the read partition-local).

    ``max_partitions`` caps how many incomplete partitions this run
    processes (used by the resume test to simulate a killed run).
    Returns the manifest entries."""
    man = Manifest(out_dir)
    meta_path = os.path.join(out_dir, "meta.json")
    done_now = 0
    for lo, hi in _partition_bounds(n_docs, n_partitions):
        pid = f"docs_{lo}_{hi}"
        out_file = os.path.join(out_dir, f"chunks_{pid}.parquet")
        if man.is_done(pid, out_file):
            continue
        if max_partitions is not None and done_now >= max_partitions:
            break
        t0 = time.perf_counter()
        ds = corpus_source(lo, hi)
        chunk_batches = list(
            build_chunk_table(ds, text_col, id_col, shard_size).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        tbl = (
            pa.concat_tables(chunk_batches, promote_options="default")
            if chunk_batches
            else None
        )
        tmp = out_file + ".tmp"
        if tbl is not None and tbl.num_rows:
            pq.write_table(tbl, tmp)
        else:
            pq.write_table(_empty_chunks_table(), tmp)
        os.replace(tmp, out_file)
        man.mark_done(
            pid,
            doc_lo=lo,
            doc_hi=hi,
            n_chunks=0 if tbl is None else tbl.num_rows,
            n_postings=0 if tbl is None else int(pa.compute.sum(tbl["df"]).as_py() or 0),
            bytes=os.path.getsize(out_file),
            seconds=round(time.perf_counter() - t0, 3),
        )
        done_now += 1
    # meta written once all partitions are complete
    bounds = _partition_bounds(n_docs, n_partitions)
    if all(
        man.is_done(f"docs_{lo}_{hi}", os.path.join(out_dir, f"chunks_docs_{lo}_{hi}.parquet"))
        for lo, hi in bounds
    ):
        import json

        # never LOWER n_docs: a re-entered base build on a directory
        # that has since received append_partition segments must not
        # shrink the corpus size — that would silently deflate idf /
        # inflate avgdl for every query (and a compaction run in that
        # window would bake the wrong live count in). Idempotent
        # re-entry keeps the grown value; other meta fields are
        # immutable for the directory's lifetime.
        prev = 0
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = int(json.load(f).get("n_docs", 0))
        with open(meta_path + ".tmp", "w") as f:
            json.dump({"n_docs": max(n_docs, prev),
                       "shard_size": shard_size,
                       "n_partitions": n_partitions}, f)
        os.replace(meta_path + ".tmp", meta_path)
    return man.entries


def append_partition(
    corpus_source,
    out_dir: str,
    lo: int,
    hi: int,
    shard_size: int | None = None,
) -> dict:
    """Incremental ingest: add one new doc-range partition [lo, hi) to
    an EXISTING index directory and extend meta.json's n_docs. The new
    chunk file is disjoint in doc_id space from every existing one, so
    no existing file is rewritten — serving simply picks up the new
    shard on the next ``BM25ShardedService``/``load_index`` (global df
    and avgdl are re-derived from chunk summaries at load, so idfs stay
    consistent with the grown corpus). This is the 10^12-scale
    continuous-ingest story: one `ray job submit` per arriving doc
    range."""
    import json

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if shard_size is None:
        shard_size = int(meta["shard_size"])
    elif shard_size != meta["shard_size"]:
        raise ValueError(
            f"shard_size {shard_size} != index's {meta['shard_size']}"
        )
    man = Manifest(out_dir)
    pid = f"docs_{lo}_{hi}"
    out_file = os.path.join(out_dir, f"chunks_{pid}.parquet")
    # at-least-once delivery: a re-submitted append of an ALREADY-DONE
    # range is a manifest no-op (same idempotence as the build's
    # resume), so the overlap guard only rejects genuinely new ranges
    # that collide with existing docs
    if lo < meta["n_docs"] and not man.is_done(pid, out_file):
        raise ValueError(
            f"new partition [{lo}, {hi}) overlaps existing docs "
            f"[0, {meta['n_docs']})"
        )
    # a gap (lo > n_docs) would silently count phantom doc_ids into
    # n_docs, deflating avgdl and shifting every BM25 idf (ADVICE r2) —
    # contiguous ingest only
    if lo > meta["n_docs"] and not man.is_done(pid, out_file):
        raise ValueError(
            f"new partition [{lo}, {hi}) leaves a doc_id gap after "
            f"existing docs [0, {meta['n_docs']}) — append must be "
            f"contiguous (lo == n_docs)"
        )
    if not man.is_done(pid, out_file):
        t0 = time.perf_counter()
        ds = corpus_source(lo, hi)
        batches = list(
            build_chunk_table(ds, "content", "doc_id", shard_size).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        tbl = (
            pa.concat_tables(batches, promote_options="default")
            if batches
            else _empty_chunks_table()
        )
        tmp = out_file + ".tmp"
        pq.write_table(tbl if tbl.num_rows else _empty_chunks_table(), tmp)
        os.replace(tmp, out_file)
        man.mark_done(
            pid,
            doc_lo=lo,
            doc_hi=hi,
            n_chunks=tbl.num_rows,
            n_postings=int(pa.compute.sum(tbl["df"]).as_py() or 0)
            if tbl.num_rows
            else 0,
            bytes=os.path.getsize(out_file),
            seconds=round(time.perf_counter() - t0, 3),
        )
    meta["n_docs"] = max(int(meta["n_docs"]), hi)
    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return man.entries


TOMBSTONES_FILE = "tombstones.parquet"


def delete_docs(out_dir: str, doc_ids) -> int:
    """Logical delete: merge ``doc_ids`` into the index directory's
    tombstone set (sorted unique int64 parquet, atomic replace,
    idempotent — re-deleting is a no-op). Serving and ``load_index``
    apply the set as a candidate mask; global stats (df, avgdl,
    n_docs) intentionally do NOT change until
    ``compact_index_with_tombstones`` physically drops the postings —
    the Lucene segment-tombstone contract, and the O(deleted) cost
    shape that makes deletes viable against a 10^12-doc index (no
    chunk file is touched here). Returns the tombstone-set size."""
    import json

    import numpy as np

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size and (ids[0] < 0 or ids[-1] >= meta["n_docs"]):
        raise ValueError(
            f"doc_ids outside [0, {meta['n_docs']}) cannot be deleted"
        )
    path = os.path.join(out_dir, TOMBSTONES_FILE)
    if os.path.exists(path):
        ids = np.union1d(ids, pq.read_table(path)["doc_id"].to_numpy())
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    pq.write_table(tbl, path + ".tmp")
    os.replace(path + ".tmp", path)
    return int(ids.size)


def load_tombstones(out_dir: str):
    """Sorted unique tombstoned doc_ids (empty array if none)."""
    import numpy as np

    path = os.path.join(out_dir, TOMBSTONES_FILE)
    if not os.path.exists(path):
        return np.empty(0, np.int64)
    return pq.read_table(path)["doc_id"].to_numpy()


def compact_index_with_tombstones(out_dir: str, new_dir: str) -> dict:
    """Physical delete: rewrite every chunk file dropping tombstoned
    postings, recomputing each chunk's summary (df, cf, max_tf,
    min_dl, base) from its live postings. Doc_ids are PRESERVED (the
    id space keeps its holes — renumbering would orphan every doc_id
    -> text mapping); ``meta['n_deleted_applied']`` records the hole
    count so loaders use the live doc count for idf/avgdl. After
    compaction the index scores exactly like a fresh build over the
    filtered corpus (sqlgen.bm25_topk_compacted_sql is that oracle).

    Shuffle-free by construction: dropping docs never moves a posting
    across (term, shard), so this is a pure ``map_batches`` over chunk
    rows — each build partition's file rewrites independently (the
    resumable unit, same manifest discipline as the build)."""
    import json

    import numpy as np
    import ray.data

    from snowball_java_ray.functions.codec import (
        decode_postings,
        encode_postings,
    )
    from snowball_java_ray.stages.index_build import CHUNK_SCHEMA

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    deleted = load_tombstones(out_dir)
    man = Manifest(new_dir)

    def drop_rows(t: pa.Table, dropset: np.ndarray) -> pa.Table:
        cols = {n: [] for n in CHUNK_SCHEMA.names}
        for i in range(t.num_rows):
            doc_ids, tfs, dls = decode_postings(
                bytes(t["data"][i].as_py()), base=int(t["base"][i].as_py())
            )
            idx = np.searchsorted(dropset, doc_ids)
            idx[idx == dropset.size] = 0
            keep = dropset[idx] != doc_ids
            if not keep.all():
                doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
            if doc_ids.size == 0:
                continue
            cols["term"].append(t["term"][i].as_py())
            cols["shard"].append(int(t["shard"][i].as_py()))
            cols["base"].append(int(doc_ids[0]))
            cols["df"].append(int(doc_ids.size))
            cols["cf"].append(int(tfs.sum()))
            cols["max_tf"].append(int(tfs.max()))
            cols["min_dl"].append(int(dls.min()))
            cols["data"].append(
                encode_postings(doc_ids, tfs, dls, base=int(doc_ids[0]))
            )
        return pa.table(cols, schema=CHUNK_SCHEMA)

    os.makedirs(new_dir, exist_ok=True)
    import glob

    for f in sorted(
        glob.glob(os.path.join(out_dir, "chunks_*.parquet")),
        key=doc_lo_sort_key,
    ):
        name = os.path.basename(f)
        pid = name[len("chunks_"):-len(".parquet")]
        out_file = os.path.join(new_dir, name)
        if man.is_done(pid, out_file):
            continue
        t0 = time.time()
        if deleted.size == 0:
            tbl = pq.read_table(f)
        else:
            ds = ray.data.read_parquet(f)
            batches = list(
                ds.map_batches(
                    lambda t, d=deleted: drop_rows(t, d),
                    batch_format="pyarrow",
                ).iter_batches(batch_size=None, batch_format="pyarrow")
            )
            tbl = (
                pa.concat_tables(batches, promote_options="default")
                if batches
                else _empty_chunks_table()
            )
        pq.write_table(tbl if tbl.num_rows else _empty_chunks_table(),
                       out_file + ".tmp")
        os.replace(out_file + ".tmp", out_file)
        _, p_lo, p_hi = pid.split("_")
        man.mark_done(
            pid,
            doc_lo=int(p_lo),
            doc_hi=int(p_hi),
            n_chunks=tbl.num_rows,
            bytes=os.path.getsize(out_file),
            seconds=round(time.time() - t0, 3),
        )
    meta["n_deleted_applied"] = int(
        meta.get("n_deleted_applied", 0) + deleted.size
    )
    with open(os.path.join(new_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f)
    os.replace(os.path.join(new_dir, "meta.json.tmp"),
               os.path.join(new_dir, "meta.json"))
    return man.entries


def verify_index(out_dir: str) -> dict:
    """Index fsck: decode every chunk and check the format invariants
    the scorers rely on — summary columns consistent with the decoded
    postings (df = len, cf = sum tf, max_tf / min_dl exact, base =
    first doc), doc_ids strictly ascending within every chunk, all
    manifest partitions done, meta present. Distributed: one
    map_batches over chunk rows returning
    per-row violation counts; the corpus is never read. Returns
    {"files", "chunks", "postings", "violations", "errors"[:20]}."""
    import glob
    import json

    import numpy as np
    import ray.data

    from snowball_java_ray.functions.codec import decode_postings

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    files = sorted(glob.glob(os.path.join(out_dir, "chunks_*.parquet")),
                   key=doc_lo_sort_key)
    man = Manifest(out_dir)
    errors: list[str] = []
    # manifest completeness: the DONE doc ranges must exactly tile
    # [0, n_docs) — contiguous, non-overlapping, gap-free. Checked by
    # coverage (not by re-deriving _partition_bounds) so directories
    # grown by append_partition segments verify too.
    ranges = sorted(
        (int(e["doc_lo"]), int(e["doc_hi"]))
        for e in man.entries.values()
        if man.is_done(
            f"docs_{e['doc_lo']}_{e['doc_hi']}",
            os.path.join(
                out_dir, f"chunks_docs_{e['doc_lo']}_{e['doc_hi']}.parquet"
            ),
        )
    )
    cursor = 0
    for lo, hi in ranges:
        if lo != cursor:
            errors.append(
                f"manifest coverage gap/overlap at {lo} (expected {cursor})"
            )
        cursor = max(cursor, hi)
    if cursor != meta["n_docs"]:
        errors.append(
            f"manifest covers [0, {cursor}) but meta n_docs={meta['n_docs']}"
        )

    def check(t: pa.Table) -> pa.Table:
        bad = 0
        msgs: list[str] = []
        n_post = 0
        for i in range(t.num_rows):
            term = t["term"][i].as_py()
            base = int(t["base"][i].as_py())
            try:
                doc_ids, tfs, dls = decode_postings(
                    bytes(t["data"][i].as_py()), base=base
                )
                # a truncated payload may decode "successfully" into
                # short/None arrays — malformed output IS corruption
                if (
                    doc_ids is None or tfs is None or dls is None
                    or doc_ids.size == 0
                    or not (doc_ids.size == tfs.size == dls.size)
                ):
                    raise ValueError("malformed decoded arrays")
            except Exception as e:  # corrupt payload
                bad += 1
                msgs.append(f"{term}: decode failed: {e}")
                continue
            n_post += doc_ids.size
            checks = [
                (int(t["df"][i].as_py()) == doc_ids.size, "df"),
                (int(t["cf"][i].as_py()) == int(tfs.sum()), "cf"),
                (int(t["max_tf"][i].as_py()) == int(tfs.max()), "max_tf"),
                (int(t["min_dl"][i].as_py()) == int(dls.min()), "min_dl"),
                (base == int(doc_ids[0]), "base"),
                (bool(np.all(np.diff(doc_ids) > 0)), "doc order"),
            ]
            for ok, what in checks:
                if not ok:
                    bad += 1
                    msgs.append(f"{term}@{base}: {what} invariant")
        return pa.table(
            {
                "chunks": pa.array([t.num_rows], pa.int64()),
                "postings": pa.array([n_post], pa.int64()),
                "violations": pa.array([bad], pa.int64()),
                "msgs": pa.array([msgs[:5]], pa.list_(pa.string())),
            }
        )

    chunks = postings = violations = 0
    if files:
        res = (
            ray.data.read_parquet(files)
            .map_batches(check, batch_format="pyarrow")
        )
        for b in res.iter_batches(batch_size=None, batch_format="pyarrow"):
            chunks += int(pa.compute.sum(b["chunks"]).as_py() or 0)
            postings += int(pa.compute.sum(b["postings"]).as_py() or 0)
            violations += int(pa.compute.sum(b["violations"]).as_py() or 0)
            for lst in b["msgs"].to_pylist():
                errors.extend(lst)
    return {
        "files": len(files),
        "chunks": chunks,
        "postings": postings,
        "violations": violations + sum(
            1 for e in errors if e.startswith("partition ")
        ),
        "errors": errors[:20],
    }


def live_doc_count(meta: dict) -> int:
    """Docs that still exist after physical compaction — the N that
    idf/avgdl use. Logical tombstones do NOT reduce it (delete_docs
    docstring); ``n_docs`` itself stays the doc_id-space size so
    appends and partition bounds keep working over the holes."""
    return int(meta["n_docs"]) - int(meta.get("n_deleted_applied", 0))


def _empty_chunks_table() -> pa.Table:
    from snowball_java_ray.stages.index_build import CHUNK_SCHEMA

    return CHUNK_SCHEMA.empty_table()


def compact_chunks(chunks: pa.Table) -> pa.Table:
    """Segment merge (SURVEY.md §7 step 5): when build partitions are
    not shard-aligned, one (term, shard) may own several chunks with
    disjoint doc ranges. Compaction decodes, concatenates in doc order
    and re-encodes one chunk per (term, shard) — the per-term-range
    merge that makes the global index independent of how many build
    partitions produced it (tested equal to a single-shot build).

    TEST-ONLY serial twin (VERDICT r3 #9): no entry path may call this
    driver-side pandas version — production segment merge is
    ``compact_chunks_ds`` below (tested equal). It exists as the
    conformance oracle for that Dataset path."""
    import pandas as pd

    from snowball_java_ray.functions.codec import decode_postings, encode_postings
    from snowball_java_ray.stages.index_build import CHUNK_SCHEMA
    import numpy as np

    df = chunks.to_pandas()
    out_rows = []
    for (term, shard), g in df.groupby(["term", "shard"], sort=True):
        if len(g) == 1:
            out_rows.append(g.iloc[0])
            continue
        decoded = [
            decode_postings(bytes(b), base=int(base))
            for b, base in zip(g["data"], g["base"])
        ]
        doc_ids = np.concatenate([d for d, _, _ in decoded])
        tfs = np.concatenate([t for _, t, _ in decoded])
        dls = np.concatenate([l for _, _, l in decoded])
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        base = int(doc_ids[0])
        out_rows.append(
            pd.Series(
                {
                    "term": term,
                    "shard": int(shard),
                    "base": base,
                    "df": len(doc_ids),
                    "cf": int(tfs.sum()),
                    "max_tf": int(tfs.max()),
                    "min_dl": int(dls.min()),
                    "data": encode_postings(doc_ids, tfs, dls, base=base),
                }
            )
        )
    out = pd.DataFrame(out_rows).sort_values(["term", "shard"])
    return pa.Table.from_pandas(out, schema=CHUNK_SCHEMA, preserve_index=False)


def compact_chunks_ds(chunks_ds):
    """Distributed segment merge: the Dataset expression of
    ``compact_chunks`` for when the chunk table no longer fits one
    process. Each encoded chunk row decodes back to a packed partial
    (the build's shuffle format), then the exact same
    hash-partition -> merge_encode_partition reduce as the build
    re-merges every (term, shard)'s chunks in doc order — one shuffle,
    no per-group Python, no driver materialization. Tested equal to the
    driver-side compactor and to a single-shot build."""
    import pyarrow as pa

    from snowball_java_ray.functions.codec import decode_postings
    from snowball_java_ray.stages.index_build import (
        PARTIAL_SCHEMA,
        _pack_partial,
        add_term_shard_partition,
        default_reduce_partitions,
        merge_encode_partition,
    )

    def to_partials(t: pa.Table) -> pa.Table:
        out_t, out_s, out_b, out_n = [], [], [], []
        for term, shard, base, data in zip(
            t["term"].to_pylist(),
            t["shard"].to_pylist(),
            t["base"].to_pylist(),
            t["data"].to_pylist(),
        ):
            doc_ids, tfs, dls = decode_postings(bytes(data), base=int(base))
            out_t.append(term)
            out_s.append(int(shard))
            out_b.append(_pack_partial(doc_ids, tfs, dls))
            out_n.append(len(doc_ids))
        return pa.table(
            {
                "term": pa.array(out_t),
                "shard": pa.array(out_s, pa.int64()),
                "blob": pa.array(out_b, pa.binary()),
                "n": pa.array(out_n, pa.int32()),
            },
            schema=PARTIAL_SCHEMA,
        )

    P = default_reduce_partitions()
    return (
        chunks_ds.map_batches(to_partials, batch_format="pyarrow")
        .map_batches(
            lambda t: add_term_shard_partition(t, P),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(merge_encode_partition, batch_format="pyarrow")
    )


def doc_lo_sort_key(path: str) -> tuple[int, str]:
    """Sort key for {prefix}_docs_{lo}_{hi}.parquet partition files by
    NUMERIC doc_lo, not lexicographically ("docs_1250_..." <
    "docs_625_..." as strings) — out-of-order concat breaks the
    doc_id-sorted postings invariant score_query's dense path relies
    on. The ONE parser for every consumer (load_index, stages/serve,
    pipelines/snowball.load_tuples)."""
    name = os.path.basename(path)
    parts = name.split("_")
    try:
        return (int(parts[2]), name)
    except (IndexError, ValueError):
        return (1 << 62, name)


def load_index(out_dir: str):
    """Assemble the InvertedIndex from all per-partition chunk files."""
    import glob
    import json

    from snowball_java_ray.stages.score import InvertedIndex

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    files = sorted(glob.glob(os.path.join(out_dir, "chunks_*.parquet")),
                   key=doc_lo_sort_key)
    tbl = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    idx = InvertedIndex(tbl, live_doc_count(meta))
    tomb = load_tombstones(out_dir)
    if tomb.size:
        idx.set_deleted(tomb)
    return idx
