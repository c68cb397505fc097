#!/usr/bin/env python
"""Drop-in replacement for the reference CLI
(bin/Main.java: ``java -jar bootstrapping.jar sentencesFile
parameters.cfg seedsFile`` -> tuples.txt + patterns.txt):

    python scripts/snowball.py sentencesFile parameters.cfg seedsFile \
        [--out-dir .] [--num-cpus N]

Reads the same three inputs with the same formats (one tagged sentence
per line, optionally .gz; ``key=value`` parameters; ``e1:`` / ``e2:``
typed ``a;b`` seed pairs), runs the distributed bootstrap (index-backed
retrieval-accelerated seed matching), and writes ``tuples.txt`` /
``patterns.txt`` plus parquet sidecars. Owns its Ray session."""

from __future__ import annotations

import argparse
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
    ap.add_argument("sentences_file")
    ap.add_argument("parameters_file")
    ap.add_argument("seeds_file")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

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

    from snowball_java_ray.config import parse_params, read_seeds
    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.pipelines.snowball import snowball_bootstrap
    from snowball_java_ray.sources.readers import (
        read_tagged_text,
        write_results,
    )

    with open(args.parameters_file, encoding="utf-8") as f:
        cfg = parse_params(f.read())
    with open(args.seeds_file, encoding="utf-8") as f:
        e1_type, e2_type, seeds = read_seeds(f.read())
    from dataclasses import replace

    cfg = replace(cfg, e1_type=e1_type, e2_type=e2_type)

    t0 = time.perf_counter()
    corpus = read_tagged_text(args.sentences_file)
    n_docs = corpus.count()
    index = build_index(corpus, n_docs=n_docs, shard_size=1 << 14)
    res = snowball_bootstrap(
        corpus, seeds, cfg, index.df, index.n_docs, index=index
    )
    elapsed = time.perf_counter() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    write_results(res.tuples, res.patterns, args.out_dir)

    # reference-style text outputs (Main.java:62-111)
    with open(os.path.join(args.out_dir, "tuples.txt"), "w",
              encoding="utf-8") as f:
        f.write(f"Input file: {args.sentences_file}\n")
        for r in res.tuples.itertuples():
            f.write(f"{r.e1}\t{r.e2}\t{r.confidence}\n")
    with open(os.path.join(args.out_dir, "patterns.txt"), "w",
              encoding="utf-8") as f:
        for r in res.patterns.itertuples():
            f.write(
                f"pattern {r.pattern_id}\tconfidence {r.confidence}\t"
                f"tuples {r.n_tuples}\n"
                f"  left: {r.left_terms}\n  middle: {r.middle_terms}\n"
                f"  right: {r.right_terms}\n"
            )

    import json

    print(
        json.dumps(
            {
                "n_docs": int(n_docs),
                "n_tuples": int(len(res.tuples)),
                "n_patterns": int(len(res.patterns)),
                "n_seeds_final": len(res.seeds),
                "seconds": round(elapsed, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
