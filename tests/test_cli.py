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


def test_snowball_cli_reference_interface(tmp_path):
    """The reference's own invocation shape — sentencesFile
    parameters.cfg seedsFile -> tuples.txt + patterns.txt — runs
    end-to-end on a tagged corpus."""
    from snowball_java_ray.sources.corpus import gen_corpus_table

    tbl = gen_corpus_table(200, seed=11, tagged_fraction=0.7)
    sent = tmp_path / "sentences.txt"
    sent.write_text(
        "\n".join(x or "" for x in tbl["content"].to_pylist()) + "\n"
    )
    (tmp_path / "parameters.cfg").write_text(
        "max_tokens_away=6\nmin_tokens_away=1\ncontext_window_size=2\n"
        "number_iterations=2\nmin_pattern_support=2\n"
    )
    (tmp_path / "seeds.txt").write_text(
        "e1:ORG\ne2:LOC\nOrgA Corp;Lisbon\nOrgB Corp;Porto\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "snowball.py"),
         str(sent), str(tmp_path / "parameters.cfg"),
         str(tmp_path / "seeds.txt"),
         "--out-dir", str(tmp_path / "out"), "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 200 and rep["n_tuples"] > 0
    tuples_txt = (tmp_path / "out" / "tuples.txt").read_text()
    assert "Input file:" in tuples_txt and "\t" in tuples_txt
    assert (tmp_path / "out" / "patterns.txt").exists()
