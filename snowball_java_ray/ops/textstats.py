"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All stateless vectorized/batched map_batches stages over the
``documents`` table, each with a generated DuckDB oracle (sqlgen) built
from the same constants. The stopword/wordlist voting and ratio
features are the standard cheap quality signals of a pretraining data
pipeline (length, punctuation, stopword density).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

from snowball_java_ray.constants import STOPWORD_SET, TOKEN_SPLIT_PATTERN
from snowball_java_ray.functions.text import tokenize

_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)
# BPE-ish pretokenizer: alnum runs or single non-space symbols
BPE_TOKEN_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"
_BPE_RE = re.compile(BPE_TOKEN_PATTERN)

# Tiny per-language function-word lists for the n-gram/stopword-voting
# language-ID heuristic. Deterministic argmax, ties broken by language
# code ascending; all-zero -> 'unknown'.
LANG_WORDLISTS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "es": ("el", "los", "las", "es", "y", "no", "una", "por"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour"),
    "pt": ("o", "os", "as", "de", "que", "um", "uma", "com"),
}


def _raw_tokens(text: str) -> list[str]:
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features: char count, raw/canonical token
    counts, stopword ratio, mean raw-token length (6-dp rounded)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars, n_tok, n_terms, stop_ratio, mean_len = [], [], [], [], []
        for x in texts:
            x = x or ""
            raw = _raw_tokens(x)
            n_chars.append(len(x))
            n_tok.append(len(raw))
            n_terms.append(len(tokenize(x)))
            if raw:
                stop_ratio.append(
                    round(sum(1 for w in raw if w in STOPWORD_SET) / len(raw), 6)
                )
                mean_len.append(round(sum(len(w) for w in raw) / len(raw), 6))
            else:
                stop_ratio.append(0.0)
                mean_len.append(0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_terms": pa.array(n_terms, pa.int64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """Whitespace-ish and BPE-ish token counts per doc."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pa.array(
                    [len(_raw_tokens(x or "")) for x in texts], pa.int64()
                ),
                "n_bpe_tokens": pa.array(
                    [len(_BPE_RE.findall((x or "").lower())) for x in texts],
                    pa.int64(),
                ),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Document fingerprint: md5 of the space-joined sorted distinct
    canonical terms (order-insensitive content identity — catches
    shuffled/bag-of-words duplicates exact dedup misses)."""

    def fn(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join(sorted(set(tokenize(x or "")))).encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def langid(sf_dir: str) -> ray.data.Dataset:
    """Wordlist-voting language ID: count function-word hits per
    language over raw tokens; argmax with deterministic tie-break
    (language code ascending); zero hits -> 'unknown'."""
    langs = sorted(LANG_WORDLISTS)
    sets = {lang: frozenset(LANG_WORDLISTS[lang]) for lang in langs}

    def fn(t: pa.Table) -> pa.Table:
        preds, scores = [], []
        for x in t["text"].to_pylist():
            raw = _raw_tokens(x or "")
            counts = {
                lang: sum(1 for w in raw if w in sets[lang]) for lang in langs
            }
            best = sorted(langs, key=lambda lang: (-counts[lang], lang))[0]
            if counts[best] == 0:
                preds.append("unknown")
                scores.append(0)
            else:
                preds.append(best)
                scores.append(counts[best])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(preds),
                "n_hits": pa.array(scores, pa.int64()),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def lang_profile(sf_dir: str) -> ray.data.Dataset:
    """Corpus profile per labeled lang: doc count + mean char length."""
    from ray.data.aggregate import Count, Mean

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )

    def rnd(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("avg_chars"),
            "avg_chars",
            pc.round(t["avg_chars"], ndigits=6),
        )

    return agg.map_batches(rnd, batch_format="pyarrow").sort("lang")
