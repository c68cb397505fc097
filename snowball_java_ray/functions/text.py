"""Canonical text normalization — THE tokenizer of the engine.

Semantics derive from the reference normalizer
(/root/reference/snowball/src/vsm/TermsVector.java:16-36 +
nlp/Stopwords.java:26-33): lowercase, split, drop numeric tokens, drop
stopwords. It must be bit-identical between the index-build side, the
query side, the pure-Python oracle, and the generated DuckDB oracle SQL
— all four read the same constants.

Two implementations:
- ``tokenize`` — pure-Python single string (oracle / query side / unit
  tests).
- ``tokenize_arrow`` — fully vectorized over a pyarrow StringArray
  (pyarrow.compute kernels only, no per-row Python) for the hot
  map_batches path.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from snowball_java_ray.constants import (
    NUMERIC_TOKEN_PATTERN,
    STOPWORD_SET,
    STOPWORDS,
    TOKEN_SPLIT_PATTERN,
)

_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)
_NUMERIC_RE = re.compile(NUMERIC_TOKEN_PATTERN)
_STOPWORD_ARR = pa.array(list(STOPWORDS), type=pa.string())


def tokenize(text: str) -> list[str]:
    """Normalize one string to its token list (pure-Python path)."""
    out = []
    for tok in _SPLIT_RE.split(text.lower()):
        if not tok or _NUMERIC_RE.match(tok) or tok in STOPWORD_SET:
            continue
        out.append(tok)
    return out


# Code-aware mode (SURVEY.md M9 note): source-code identifiers split on
# camelCase boundaries BEFORE lowercasing, so `getUserName` indexes as
# get/user/name and snake_case falls out of the base splitter. Applied
# per-`lang` when analyzing the code corpus; the canonical mode stays
# the conformance-checked default.
# Two capture-group passes (RE2-compatible — no lookbehind), applied
# identically in the Python and Arrow paths:
_CAMEL1 = (r"([a-z0-9])([A-Z])", r"\1 \2")        # fooBar -> foo Bar
_CAMEL2 = (r"([A-Z])([A-Z][a-z])", r"\1 \2")      # HTTPFoo -> HTTP Foo
_CAMEL1_RE = re.compile(_CAMEL1[0])
_CAMEL2_RE = re.compile(_CAMEL2[0])


def tokenize_code(text: str) -> list[str]:
    """Code-aware tokenization: camelCase split + the canonical
    normalizer. `parseHTTPResponse` -> [parse, http, response]."""
    pre = _CAMEL2_RE.sub(_CAMEL2[1], _CAMEL1_RE.sub(_CAMEL1[1], text))
    return tokenize(pre)


def tokenize_code_arrow(texts: pa.Array | pa.ChunkedArray):
    """Vectorized code-aware path: camelCase boundary inserts are
    pyarrow regex replaces, then the canonical vectorized tokenizer."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    pre = pc.replace_substring_regex(
        texts, pattern=_CAMEL1[0], replacement=_CAMEL1[1]
    )
    pre = pc.replace_substring_regex(
        pre, pattern=_CAMEL2[0], replacement=_CAMEL2[1]
    )
    return tokenize_arrow(pre)


def tokenize_arrow(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
    """Vectorized tokenization of a batch of strings.

    Returns ``(row_idx, tokens)`` where ``tokens`` is a flat
    StringArray of surviving tokens and ``row_idx[i]`` is the index of
    the input row token ``i`` came from. All steps are pyarrow C++
    kernels; only offset bookkeeping touches numpy.

    Implementation note: a pure-numpy byte-level path (table-lookup
    lowercase + run detection over the raw buffers) was built and
    measured equal single-threaded but 2.3x WORSE under 16-way worker
    contention — the wide gather/scatter traffic saturates the memory
    bus that multi-worker scaling depends on, while Arrow's RE2 kernel
    is compute-dense. The regex-kernel path is the scaling-optimal one
    (see git history for the experiment).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(texts)
    tok_list = pc.split_pattern_regex(lower, TOKEN_SPLIT_PATTERN)
    # Parent-row index for every token via list offsets.
    counts = pc.list_value_length(tok_list).fill_null(0).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    flat = pc.list_flatten(tok_list)
    keep = pc.and_(
        pc.and_(
            pc.not_equal(flat, ""),
            pc.invert(pc.match_substring_regex(flat, NUMERIC_TOKEN_PATTERN)),
        ),
        pc.invert(pc.is_in(flat, value_set=_STOPWORD_ARR)),
    )
    mask = keep.to_numpy(zero_copy_only=False)
    return row_idx[mask], flat.filter(keep)


def raw_tokens_arrow(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized SURFACE tokenization — the Arrow twin of
    ``ops.dedup.raw_tokens`` (lowercase split on non-[a-z0-9], empties
    dropped, stopwords and numbers KEPT). Same (row_idx, flat tokens)
    contract as ``tokenize_arrow``; used by the textstats full-corpus
    scans so they pay the C++ tokenizer cost, not a per-row Python
    loop."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(texts)
    tok_list = pc.split_pattern_regex(lower, TOKEN_SPLIT_PATTERN)
    counts = pc.list_value_length(tok_list).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    flat = pc.list_flatten(tok_list)
    keep = pc.not_equal(flat, "")
    mask = keep.to_numpy(zero_copy_only=False)
    return row_idx[mask], flat.filter(keep)


def term_frequencies(
    row_idx: np.ndarray, tokens: pa.Array, n_rows: int
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray]:
    """Aggregate flat ``(row, token)`` pairs to per-row term frequencies.

    Returns ``(tf_row_idx, terms, tfs, doc_len)``: one entry per
    distinct (row, term) with its count, plus per-row post-filter token
    counts (``doc_len``, length ``n_rows``). Uses pyarrow's hash
    group_by (C++), not Python dicts.
    """
    tbl = pa.table({"r": pa.array(row_idx, type=pa.int64()), "t": tokens})
    agg = tbl.group_by(["r", "t"]).aggregate([("t", "count")])
    tf_row = agg["r"].to_numpy(zero_copy_only=False)
    tfs = agg["t_count"].to_numpy(zero_copy_only=False).astype(np.int32)
    doc_len = np.bincount(row_idx, minlength=n_rows).astype(np.int32)
    terms = agg["t"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    return tf_row, terms, tfs, doc_len


def sha256_hex(texts: pa.Array | pa.ChunkedArray | list[str]) -> list[str]:
    """Per-row sha256 hex digests (matches DuckDB ``sha256(text)``).

    The per-row ``content_sha256`` invariant from BASELINE.json
    ``input_hint`` — computed at ingest, re-verified at every
    materialization boundary (SURVEY.md §1.2 / M12).
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    return [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]
