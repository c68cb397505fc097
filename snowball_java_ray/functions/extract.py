"""Entity-pair extraction from tagged sentences (reference M1-M7).

Pure functions (no Ray) reused by the distributed extraction stage
(stages/extract.py) and by unit tests. Semantics from
/root/reference/snowball/src/bin/Snowball.java:278-369, with the
documented intended-semantics fixes (SURVEY.md §7 hard-parts #4):

- M1 mention finder: regex <T>...</T> spans for the two configured
  entity types (Snowball.java:280-301).
- M2 pair generation: cross product of e1 x e2 mentions per sentence
  (Snowball.java:303-306).
- M3 ordering: e1 strictly before e2, no overlap — the reference's
  guard at Snowball.java:309 is vacuous due to mis-parenthesization;
  we implement the evident intent (e1 end < e2 start).
- M4 no intervening tagged entity inside the middle span
  (Snowball.java:315-318).
- M5 context split into left / middle / right raw text
  (Snowball.java:321-323), other tags stripped.
- M6 middle token-distance gate min_tokens_away <= n <= max_tokens_away
  (Snowball.java:324-327) — counted on whitespace tokens of the
  tag-stripped middle, BEFORE normalization.
- M7 context windows: last/first context_window_size whitespace tokens
  of left/right (Snowball.java:348-369).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ANY_TAG_RE = re.compile(r"</?[A-Z]+>")


def _mention_re(tag: str) -> re.Pattern:
    return re.compile(rf"<{tag}>(.*?)</{tag}>")


@dataclass(frozen=True)
class RawTuple:
    e1: str
    e2: str
    left: str
    middle: str
    right: str


def strip_tags(text: str) -> str:
    return _ANY_TAG_RE.sub("", text)


def extract_pairs(
    sentence: str,
    e1_type: str,
    e2_type: str,
    min_tokens_away: int,
    max_tokens_away: int,
    context_window_size: int,
) -> list[RawTuple]:
    """All surviving (e1, e2) context tuples of one sentence."""
    out: list[RawTuple] = []
    r1, r2 = _mention_re(e1_type), _mention_re(e2_type)
    m1s = list(r1.finditer(sentence))
    m2s = list(r2.finditer(sentence))
    for m1 in m1s:
        for m2 in m2s:
            # M3: e1 strictly before e2, no overlap
            if not m1.end() <= m2.start():
                continue
            middle_raw = sentence[m1.end() : m2.start()]
            # M4: no other tagged entity inside the middle
            if _ANY_TAG_RE.search(middle_raw):
                continue
            left_raw = strip_tags(sentence[: m1.start()])
            right_raw = strip_tags(sentence[m2.end() :])
            middle = middle_raw.strip()
            # M6: token distance on whitespace tokens of the middle
            n_mid = len(middle.split()) if middle else 0
            if not (min_tokens_away <= n_mid <= max_tokens_away):
                continue
            # M7: context windows
            left_toks = left_raw.split()
            right_toks = right_raw.split()
            left = " ".join(left_toks[-context_window_size:]) if context_window_size else ""
            right = " ".join(right_toks[:context_window_size]) if context_window_size else ""
            out.append(
                RawTuple(
                    e1=m1.group(1).strip(),
                    e2=m2.group(1).strip(),
                    left=left,
                    middle=middle,
                    right=right,
                )
            )
    return out
