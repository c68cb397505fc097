"""CLI entry points (the `ray job submit` surface) run end-to-end in a
fresh process and produce a queryable index."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

from tests.conftest import SF_TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_and_query_cli(tmp_path):
    corpus = tmp_path / "corpus.parquet"
    docs = pq.read_table(f"{SF_TINY}/documents.parquet")
    import pyarrow as pa

    pq.write_table(
        pa.table(
            {
                "doc_id": docs["doc_id"],
                "content": docs["text"],
            }
        ),
        str(corpus),
    )
    out = tmp_path / "index"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_index.py"),
         "--corpus", str(corpus), "--out", str(out),
         "--n-partitions", "2", "--shard-size", "128", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["partitions_done"] == 2 and rep["n_docs"] == 500

    q = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "query_index.py"),
         "--index", str(out), "--wand", "spark table join", "zzz nothing"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert q.returncode == 0, q.stderr[-2000:]
    lines = [json.loads(ln) for ln in q.stdout.strip().splitlines()]
    assert len(lines[0]["hits"]) == 10
    assert lines[1]["hits"] == []
