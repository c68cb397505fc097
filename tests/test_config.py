from snowball_java_ray.config import (
    EngineConfig,
    load_stopwords,
    parse_params,
    read_seeds,
)
from snowball_java_ray.functions.vectors import cosine, inner, norm, zone_similarity


def test_parse_params():
    cfg = parse_params(
        """
# comment
max_tokens_away=8
min_degree_match = 0.5
use_RlogF=false
e1_type=ORG
"""
    )
    assert cfg.max_tokens_away == 8
    assert cfg.min_degree_match == 0.5
    assert cfg.use_RlogF is False
    assert cfg.min_tokens_away == 1  # default preserved


def test_read_seeds():
    e1t, e2t, seeds = read_seeds(
        "e1:ORG\ne2:LOC\n# c\nAcme Corp;Lisbon\nBeta;Porto\nAcme Corp;Lisbon\n"
    )
    assert (e1t, e2t) == ("ORG", "LOC")
    assert seeds == {("Acme Corp", "Lisbon"), ("Beta", "Porto")}


def test_load_stopwords():
    assert load_stopwords("# c\nThe\nand\n") == frozenset({"the", "and"})


def test_vector_math():
    a = {"x": 3.0, "y": 4.0}
    assert norm(a) == 5.0
    assert inner(a, {"y": 2.0}) == 8.0
    assert abs(cosine(a, a) - 1.0) < 1e-12
    assert cosine(a, {}) == 0.0


def test_zone_similarity_reallocation():
    # SnowballTuple.java:83-105: empty left zone folds its weight into middle
    mid = {"m": 1.0}
    full = zone_similarity({"l": 1.0}, mid, {"r": 1.0},
                           {"l": 1.0}, mid, {"r": 1.0}, 0.2, 0.6, 0.2)
    assert abs(full - 1.0) < 1e-12
    no_left = zone_similarity({}, mid, {"r": 1.0},
                              {"l": 1.0}, mid, {"r": 1.0}, 0.2, 0.6, 0.2)
    # left weight reallocated: 0.8*cos(mid) + 0.2*cos(right) = 1.0
    assert abs(no_left - 1.0) < 1e-12
    # only middle matches, both side zones present on `a`
    partial = zone_similarity({"l": 1.0}, mid, {"r": 1.0},
                              {"L": 1.0}, mid, {"R": 1.0}, 0.2, 0.6, 0.2)
    assert abs(partial - 0.6) < 1e-12


def test_default_config_matches_reference_defaults():
    from snowball_java_ray.config import default_config

    cfg = default_config()
    assert cfg.max_tokens_away == 6 and cfg.wUpdt == 0.5


def test_distributed_corpus_generator(ray_session):
    from snowball_java_ray.sources.corpus import gen_corpus_dataset, gen_corpus_table

    ds = gen_corpus_dataset(100, seed=42, tagged_fraction=0.5)
    got = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    want = gen_corpus_table(100, seed=42, tagged_fraction=0.5).to_pandas()
    assert got.equals(want)  # distributed generation == serial generation
