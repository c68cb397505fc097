#!/usr/bin/env python
"""Headline benchmark: index-build throughput + BM25 query latency.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<stage>: sec, ...}, "sf": ..., "num_cpus": N, ...}

Env:
  GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS    ray.init num_cpus (default 32)
  GRAFT_REPLICATE   corpus replication factor (default 20) — the sf
                    tables are small; the bench replicates them with
                    deterministic doc_id offsets so throughput numbers
                    measure compute + shuffle, not fixed overhead.

--scaling: runs the same bench twice in FRESH processes at num_cpus=8
and 32 (the sandbox stand-in for N vs 4N nodes) on the same input and
reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "20"))


def replicated_corpus(sf_dir: str, factor: int):
    """documents mapped to the corpus schema, replicated `factor` times
    with disjoint deterministic doc_id ranges."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from snowball_java_ray.pipelines.api import documents_as_corpus

    import pyarrow.parquet as pq

    base = documents_as_corpus(sf_dir)
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def shift(k: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("doc_id"),
                "doc_id",
                pc.add(batch["doc_id"], k * n),
            )

        return fn

    parts = [base.map_batches(shift(k), batch_format="pyarrow") for k in range(factor)]
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return ds, n * factor


def run_bench() -> dict:
    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from snowball_java_ray.constants import REFERENCE_QUERIES
    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.stages.score import BM25Scorer

    timings: dict[str, float] = {}

    # warm the page cache (untimed read)
    corpus, n_docs = replicated_corpus(SF_DIR, REPLICATE)
    corpus.count()

    t0 = time.perf_counter()
    index = build_index(corpus, n_docs=n_docs, shard_size=1 << 14)
    timings["index_build"] = time.perf_counter() - t0

    index_ref = ray.put(index)

    # throughput: replicate the reference query set through the actor pool
    import ray.data as rd

    q_items = [
        {"query_id": i, "qtext": REFERENCE_QUERIES[i % len(REFERENCE_QUERIES)]}
        for i in range(1000)
    ]
    t0 = time.perf_counter()
    qds = rd.from_items(q_items).map_batches(
        BM25Scorer,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        concurrency=min(8, NUM_CPUS),
        batch_size=32,
    )
    n_results = qds.count()
    timings["bm25_batch_1000q"] = time.perf_counter() - t0

    # latency percentiles: single-query scoring against the loaded index
    from snowball_java_ray.stages.score import score_query

    lat = []
    for i in range(200):
        q = REFERENCE_QUERIES[i % len(REFERENCE_QUERIES)]
        t0 = time.perf_counter()
        score_query(index, q)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.array(lat) * 1000.0

    total = sum(timings.values())
    out = {
        "metric": "index_build+bm25_query wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": int(n_docs),
        "index_build_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "bm25_queries_per_sec": round(1000 / timings["bm25_batch_1000q"], 1),
        "bm25_p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "bm25_p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "n_results": int(n_results),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tput_lo = lo["index_build_docs_per_sec"]
    tput_hi = hi["index_build_docs_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency (index build, 8 -> 32 cpus)",
        "docs_per_sec_8cpu": tput_lo,
        "docs_per_sec_32cpu": tput_hi,
        "sec_8cpu": lo["queries"]["index_build"],
        "sec_32cpu": hi["queries"]["index_build"],
        "scaling_efficiency": round(eff, 3),
        "bm25_qps_8cpu": lo["bm25_queries_per_sec"],
        "bm25_qps_32cpu": hi["bm25_queries_per_sec"],
        "sf": SF_DIR,
        "n_docs": lo["n_docs"],
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
