"""Engine configuration: frozen dataclass + file parsers.

Replaces the reference's ~15 mutable static fields
(/root/reference/snowball/src/bin/SnowballConfig.java:29-45, parsed at
47-96) with an immutable ``EngineConfig`` passed explicitly — no global
shared state (SURVEY.md S3).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from snowball_java_ray.constants import (
    BM25_B,
    BM25_K1,
    DEFAULT_SHARD_SIZE,
    SNOWBALL_DEFAULTS,
    STOPWORD_SET,
    TOP_K,
)


@dataclass(frozen=True)
class EngineConfig:
    # Snowball extraction / bootstrap parameters (SnowballConfig.java:29-45)
    max_tokens_away: int = 6
    min_tokens_away: int = 1
    context_window_size: int = 2
    weight_left_context: float = 0.2
    weight_middle_context: float = 0.6
    weight_right_context: float = 0.2
    min_pattern_support: int = 2
    min_degree_match: float = 0.6
    min_tuple_confidence: float = 0.7
    wUpdt: float = 0.5
    number_iterations: int = 2
    use_RlogF: bool = True
    e1_type: str = "ORG"
    e2_type: str = "LOC"
    # Index / BM25 parameters (new; north rule)
    k1: float = BM25_K1
    b: float = BM25_B
    top_k: int = TOP_K
    shard_size: int = DEFAULT_SHARD_SIZE
    stopwords: frozenset[str] = field(default_factory=lambda: STOPWORD_SET)


_BOOLS = {"true": True, "false": False}
_FLOAT_KEYS = {
    "weight_left_context", "weight_middle_context", "weight_right_context",
    "min_degree_match", "min_tuple_confidence", "wUpdt", "k1", "b",
}
_INT_KEYS = {
    "max_tokens_away", "min_tokens_away", "context_window_size",
    "min_pattern_support", "number_iterations", "top_k", "shard_size",
}


def parse_params(text: str, base: EngineConfig | None = None) -> EngineConfig:
    """Parse ``key=value`` lines (``#`` comments / blanks skipped) —
    SnowballConfig.java:47-96 semantics, immutable result."""
    cfg = base or EngineConfig()
    updates: dict[str, object] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if key in _FLOAT_KEYS:
            updates[key] = float(val)
        elif key in _INT_KEYS:
            updates[key] = int(val)
        elif key == "use_RlogF":
            updates[key] = _BOOLS.get(val.lower(), True)
        elif key in {"e1_type", "e2_type"}:
            updates[key] = val
    return replace(cfg, **updates)


def read_seeds(text: str) -> tuple[str, str, set[tuple[str, str]]]:
    """Seeds file: ``e1:TYPE`` / ``e2:TYPE`` headers set entity types;
    ``a;b`` lines become seed pairs (value-deduped).
    SnowballConfig.java:99-135 / tuples/Seed.java:19-47."""
    e1_type, e2_type = "ORG", "LOC"
    seeds: set[tuple[str, str]] = set()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("e1:"):
            e1_type = line[3:].strip()
        elif line.startswith("e2:"):
            e2_type = line[3:].strip()
        elif ";" in line:
            a, _, b = line.partition(";")
            seeds.add((a.strip(), b.strip()))
    return e1_type, e2_type, seeds


def load_stopwords(text: str) -> frozenset[str]:
    """One word per line, ``#`` comments — nlp/Stopwords.java:16-24."""
    out = set()
    for raw in text.splitlines():
        line = raw.strip()
        if line and not line.startswith("#"):
            out.add(line.lower())
    return frozenset(out)


def default_config() -> EngineConfig:
    cfg = EngineConfig()
    assert all(getattr(cfg, k) == v for k, v in SNOWBALL_DEFAULTS.items())
    return cfg
