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


def read_tagged_text(path: str) -> ray.data.Dataset:
    """Plain-text sentence file -> corpus-shaped Dataset: one row per
    line with a deterministic dense doc_id (line number). Empty lines
    are kept as empty documents (matching the reference's line==doc
    identity)."""
    with open(path, encoding="utf-8") as f:
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
