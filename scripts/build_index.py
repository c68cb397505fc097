#!/usr/bin/env python
"""Production index-build job (the `ray job submit` entry point).

    ray job submit -- python scripts/build_index.py \
        --corpus /data/corpus_parquet_dir --out /data/index \
        --n-partitions 64 [--resume]

Reads the input_hint corpus parquet, runs the checkpointed partitioned
build (per-partition lineage manifests; --resume skips completed
partitions), and prints a one-line JSON report. Owns its Ray session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# PREPEND (never setdefault): Ray workers inherit PYTHONPATH, and a
# pre-existing value would leave the repo unimportable in workers
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet file or directory")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--n-partitions", type=int, default=8)
    ap.add_argument("--shard-size", type=int, default=1 << 20)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="content")
    args = ap.parse_args()

    import pyarrow.dataset as pads
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    n_docs = pads.dataset(args.corpus).count_rows()

    def corpus_source(lo: int, hi: int):
        from snowball_java_ray.sources.readers import read_parquet_doc_range

        return read_parquet_doc_range(
            args.corpus, lo, hi, id_col=args.id_col
        )

    from snowball_java_ray.pipelines.index_pipeline import build_index_checkpointed

    t0 = time.perf_counter()
    entries = build_index_checkpointed(
        corpus_source,
        args.out,
        n_docs=n_docs,
        n_partitions=args.n_partitions,
        shard_size=args.shard_size,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "partitions_done": sum(
                    1 for e in entries.values() if e["state"] == "done"
                ),
                "seconds": round(time.perf_counter() - t0, 2),
                "out": args.out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
