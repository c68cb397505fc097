#!/usr/bin/env python
"""Query a built index: BM25 top-k for queries from a file or argv.

    python scripts/query_index.py --index /data/index "spark table join" ...
    python scripts/query_index.py --index /data/index --queries-file q.txt --wand
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries-file")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--wand", action="store_true",
                    help="use the block-max WAND scorer")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from snowball_java_ray.pipelines.index_pipeline import load_index
    from snowball_java_ray.stages.score import score_query, score_query_wand

    queries = list(args.queries)
    if args.queries_file:
        with open(args.queries_file) as f:
            queries += [ln.strip() for ln in f if ln.strip()]
    index = load_index(args.index)
    scorer = score_query_wand if args.wand else score_query
    for q in queries:
        doc_ids, scores = scorer(index, q, top_k=args.top_k)
        print(
            json.dumps(
                {
                    "query": q,
                    "hits": [
                        {"doc_id": int(d), "score": round(float(s), 6)}
                        for d, s in zip(doc_ids, scores)
                    ],
                }
            )
        )


if __name__ == "__main__":
    main()
