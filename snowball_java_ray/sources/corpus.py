"""Deterministic synthetic corpus generation (FIXTURES.md F1/F2).

Generates the ``input_hint`` corpus schema
(repo, path, commit, lang, content) — content is code-like Zipfian
text, with a configurable fraction of rows carrying tagged relation
sentences (the Snowball workload layer's input, mirroring the
reference's one-sentence-per-line format with inline <ORG>/<LOC> tags,
/root/reference/snowball/src/bin/Snowball.java:286-301).

Everything is a pure function of (seed, row index) — no wall clock, no
global RNG state — so tests, resume checks, and the two-parallelism
bench runs see byte-identical inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

ORGS = [f"Org{chr(65 + i)} Corp" for i in range(12)]
LOCS = [
    "Lisbon", "Porto", "Berlin", "Paris", "Madrid", "Vienna",
    "Oslo", "Dublin", "Prague", "Zurich",
]
# org i is "headquartered in" LOCS[i % len(LOCS)] — the ground truth
# relation the bootstrap should recover.
POS_TEMPLATES = [
    "The <ORG>{org}</ORG> is headquartered in <LOC>{loc}</LOC> since then .",
    "Today <ORG>{org}</ORG> opened headquarters in <LOC>{loc}</LOC> officials said .",
    "The <ORG>{org}</ORG> based in <LOC>{loc}</LOC> expanded again .",
]
NEG_TEMPLATES = [
    "Analysts say <ORG>{org}</ORG> sued a rival over <LOC>{loc}</LOC> contracts .",
    "A <ORG>{org}</ORG> spokesperson criticized the <LOC>{loc}</LOC> council .",
]
FILLER_VOCAB = (
    "table query join scan merge hash sort window stream batch filter "
    "group value data column row vector key part line order customer"
).split()
# FIXTURES.md F1: ~5k-term Zipfian vocabulary (s ~= 1.07). The head is
# the hand-picked code-like words above (guaranteed heavy-term skew);
# the tail is generated identifiers.
VOCAB_SIZE = 5000
FULL_VOCAB = FILLER_VOCAB + [
    f"id{i:04d}" for i in range(VOCAB_SIZE - len(FILLER_VOCAB))
]
_ZIPF_S = 1.07
_probs = 1.0 / np.arange(1, len(FULL_VOCAB) + 1) ** _ZIPF_S
_ZIPF_PROBS = _probs / _probs.sum()
LANGS = ["py", "java", "go", "js", "txt"]


def _rng_for(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng((seed * 1_000_003 + i) & 0x7FFFFFFF)


def gen_row(seed: int, i: int, tagged_fraction: float = 0.5) -> dict:
    rng = _rng_for(seed, i)
    if rng.random() < tagged_fraction:
        org = ORGS[int(rng.integers(len(ORGS)))]
        oi = ORGS.index(org)
        if rng.random() < 0.7:  # positive relation sentence
            loc = LOCS[oi % len(LOCS)]
            tmpl = POS_TEMPLATES[int(rng.integers(len(POS_TEMPLATES)))]
        else:  # negative: wrong location pairing
            loc = LOCS[int(rng.integers(len(LOCS)))]
            tmpl = NEG_TEMPLATES[int(rng.integers(len(NEG_TEMPLATES)))]
        content = tmpl.format(org=org, loc=loc)
    else:
        # Zipfian filler text over the 5k vocab (heavy-term skew in the
        # head, realistic long tail)
        n = int(rng.integers(8, 60))
        words = rng.choice(FULL_VOCAB, size=n, p=_ZIPF_PROBS)
        content = " ".join(words)
    lang = LANGS[i % len(LANGS)]
    return {
        "doc_id": i,
        "repo": f"org{i % 37}/repo{i % 211}",
        "path": f"src/pkg{i % 13}/file{i}.{lang}",
        "commit": hashlib.sha1(f"commit{i}".encode()).hexdigest(),
        "lang": lang,
        "content": content,
    }


def gen_corpus_table(
    n_rows: int, seed: int = 42, tagged_fraction: float = 0.5
) -> pa.Table:
    rows = [gen_row(seed, i, tagged_fraction) for i in range(n_rows)]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "repo": pa.array([r["repo"] for r in rows]),
            "path": pa.array([r["path"] for r in rows]),
            "commit": pa.array([r["commit"] for r in rows]),
            "lang": pa.array([r["lang"] for r in rows]),
            "content": pa.array([r["content"] for r in rows]),
        }
    )


def gen_corpus_dataset(n_rows: int, seed: int = 42, tagged_fraction: float = 0.5):
    """Distributed generation: ray.data.range -> map_batches(gen_row).
    Each batch generates its rows independently from (seed, index) —
    the write-side of a 10^12-row corpus would shard exactly like
    this."""
    return gen_corpus_dataset_range(0, n_rows, seed, tagged_fraction)


def gen_corpus_dataset_range(
    lo: int, hi: int, seed: int = 42, tagged_fraction: float = 0.5
):
    """Doc-range slice [lo, hi) of the same deterministic corpus —
    rows depend only on (seed, doc index), so a ranged source is the
    synthetic equivalent of a doc-range-pruned parquet read (used as
    the ``corpus_source`` of the checkpointed extraction/build over
    generated corpora)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = [i + lo for i in batch["id"].to_pylist()]
        rows = [gen_row(seed, i, tagged_fraction) for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "repo": pa.array([r["repo"] for r in rows]),
                "path": pa.array([r["path"] for r in rows]),
                "commit": pa.array([r["commit"] for r in rows]),
                "lang": pa.array([r["lang"] for r in rows]),
                "content": pa.array([r["content"] for r in rows]),
            }
        )

    return ray.data.range(hi - lo).map_batches(gen, batch_format="pyarrow")


DEFAULT_SEEDS: set[tuple[str, str]] = {
    ("OrgA Corp", "Lisbon"),
    ("OrgB Corp", "Porto"),
    ("OrgC Corp", "Berlin"),
}
