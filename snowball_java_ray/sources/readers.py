"""Corpus sources and result sinks.

S1/S2: the reference reads a plain-text file, one tagged sentence per
line, twice (/root/reference/snowball/src/bin/Snowball.java:286-289 and
vsm/VectorSpaceModel.java:29-34). Here one `read_tagged_text` source
feeds every consumer — the two scans fuse into one lazy Dataset.

S9/S10/S11: the reference's text writers (tuples.txt / patterns.txt /
terms.txt, bin/Main.java:62-111, vsm/VectorSpaceModel.java:56-61)
become partitioned parquet sinks plus an optional human-readable
pretty-printer for diffing.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def read_parquet_doc_range(
    paths,
    lo: int,
    hi: int,
    columns: list[str] | None = None,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Doc-range-pruned parquet read — the ONE reader behind every
    per-partition build scan (pipelines.api.ensure_index_dir, bench,
    scripts/build_index).

    The [lo, hi) predicate is pushed into the parquet scan itself
    (pyarrow dataset filter → row-group statistics pruning), so each of
    the P build partitions reads only the row groups overlapping its
    doc range instead of full-scanning the corpus P times. The pyarrow
    filter is exact at row level, so no post-read trim is needed; with
    doc_id-sorted production layout each partition touches ~1/P of the
    input bytes (tests/test_pushdown.py pins the row-group pruning)."""
    import pyarrow.compute as pc

    return ray.data.read_parquet(
        paths,
        columns=columns,
        filter=(pc.field(id_col) >= lo) & (pc.field(id_col) < hi),
    )


def read_tagged_text(path: str) -> ray.data.Dataset:
    """Plain-text (optionally .gz) sentence file -> corpus-shaped
    Dataset: one row per line with a deterministic dense doc_id (line
    number). Empty lines are kept as empty documents (matching the
    reference's line==doc identity).

    The line-numbered read is driver-side BY DESIGN: line==doc_id needs
    a global order, and the reference's tagged corpora are the small
    side of the workload. Big corpora arrive as parquet
    (documents_as_corpus) or JSONL (read_jsonl_corpus) — both
    distributed reads."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, mode="rt", encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(lines)), pa.int64()),
            "repo": pa.array([path] * len(lines)),
            "path": pa.array([f"{path}#{i}" for i in range(len(lines))]),
            "commit": pa.array([""] * len(lines)),
            "lang": pa.array(["txt"] * len(lines)),
            "content": pa.array(lines),
        }
    )
    return ray.data.from_arrow(tbl)


def read_jsonl_corpus(
    path: str,
    id_field: str = "doc_id",
    text_field: str = "content",
    lang_field: str | None = "lang",
) -> ray.data.Dataset:
    """JSON-lines corpus -> input_hint corpus shape, as a DISTRIBUTED
    read (ray.data.read_json streams files/blocks; nothing touches the
    driver). Rows must carry their own stable id — line numbers are not
    well-defined across parallel file splits."""
    import pyarrow.compute as pc

    from snowball_java_ray.functions.text import sha256_hex

    ds = ray.data.read_json(path)

    def shape(t: pa.Table) -> pa.Table:
        text = t[text_field]
        sha = pa.array(sha256_hex(text))
        n = len(t)
        lang = (
            t[lang_field]
            if lang_field and lang_field in t.schema.names
            else pa.array(["txt"] * n)
        )
        return pa.table(
            {
                "doc_id": t[id_field].cast(pa.int64()),
                "repo": pa.array([path] * n),
                "path": pc.binary_join_element_wise(
                    pa.array([path] * n),
                    pc.cast(t[id_field], pa.string()),
                    "#",
                ),
                "commit": pc.utf8_slice_codeunits(sha, 0, 40),
                "lang": lang,
                "content": text,
                "content_sha256": sha,
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")


def write_results(
    tuples_df: pd.DataFrame, patterns_df: pd.DataFrame, out_dir: str
) -> None:
    """S9/S10 sinks: tuples sorted by confidence desc (O1) and the
    pattern table, as parquet."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(tuples_df, preserve_index=False),
        os.path.join(out_dir, "tuples.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(patterns_df, preserve_index=False),
        os.path.join(out_dir, "patterns.parquet"),
    )


def write_dictionary(dictionary_ds, out_dir: str) -> None:
    """S11 sink: the term/df/cf dictionary (terms.txt analogue) as
    parquet, sorted by term."""
    dictionary_ds.write_parquet(out_dir)


def pretty_tuples(tuples_df: pd.DataFrame, limit: int = 50) -> str:
    """Human-diffable rendering, Main.java:62-96 shaped."""
    lines = []
    for r in tuples_df.head(limit).itertuples():
        lines.append(f"{r.confidence:.6f}\t{r.e1}\t{r.e2}\t{r.sentence}")
    return "\n".join(lines)
