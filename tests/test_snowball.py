"""Snowball workload layer: clustering determinism + end-to-end
bootstrap on the deterministic synthetic tagged corpus."""

import pandas as pd
import pytest

from snowball_java_ray.config import EngineConfig
from snowball_java_ray.sources.corpus import DEFAULT_SEEDS, ORGS, LOCS, gen_corpus_table
from snowball_java_ray.state.clustering import ClusterTuple, single_pass


def ct(e1, e2, mid_vec, doc_id=0):
    return ClusterTuple(e1=e1, e2=e2, doc_id=doc_id, sentence=f"{e1}|{e2}",
                        left={}, middle=mid_vec, right={})


def test_single_pass_deterministic_and_order_sensitive():
    cfg = EngineConfig(min_degree_match=0.6)
    a = ct("A", "X", {"based": 1.0, "in": 0.5})
    b = ct("B", "Y", {"based": 1.0, "in": 0.4})
    c = ct("C", "Z", {"sued": 1.0})
    ps1 = single_pass([a, b, c], cfg)
    ps2 = single_pass([a, b, c], cfg)
    assert len(ps1) == 2  # {a,b} cluster + {c}
    assert [len(p.members) for p in ps1] == [len(p.members) for p in ps2]
    assert [p.middle_c for p in ps1] == [p.middle_c for p in ps2]


def test_centroid_key_support_quirk():
    """Centroid divides by the number of centroid KEYS (reference quirk,
    SnowballPattern.java:113-196)."""
    cfg = EngineConfig(min_degree_match=0.1)
    a = ct("A", "X", {"u": 1.0, "v": 1.0})
    b = ct("B", "Y", {"u": 1.0})
    ps = single_pass([a, b], cfg)
    assert len(ps) == 1
    # support vector = a.middle (2 keys); centroid = sum/2 over {u, v}
    assert ps[0].middle_c == {"u": (1.0 + 1.0) / 2, "v": 1.0 / 2}


@pytest.fixture(scope="module")
def boot_result(ray_session):
    import ray.data

    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.pipelines.snowball import snowball_bootstrap

    corpus_tbl = gen_corpus_table(600, seed=42, tagged_fraction=0.6)
    corpus = ray.data.from_arrow(corpus_tbl)
    index = build_index(corpus, n_docs=600, shard_size=128)
    return snowball_bootstrap(
        ray.data.from_arrow(corpus_tbl),
        DEFAULT_SEEDS,
        EngineConfig(number_iterations=2),
        index.df,
        index.n_docs,
    )


def test_bootstrap_discovers_patterns(boot_result):
    assert len(boot_result.patterns) >= 1
    assert (boot_result.patterns["n_tuples"] >= 2).all()


def test_bootstrap_promotes_new_seeds(boot_result):
    start = {(a.lower(), b.lower()) for a, b in DEFAULT_SEEDS}
    assert boot_result.seeds > start  # grew
    # planted ground truth: org i headquartered in LOCS[i % len(LOCS)]
    truth = {
        (ORGS[i].lower(), LOCS[i % len(LOCS)].lower()) for i in range(len(ORGS))
    }
    discovered = boot_result.seeds - start
    assert discovered, "no new seeds promoted"
    correct = discovered & truth
    assert len(correct) / len(discovered) >= 0.8, (
        f"bootstrap precision too low: {discovered - truth}"
    )


def test_bootstrap_confidences_valid(boot_result):
    t = boot_result.tuples
    assert len(t) > 0
    assert ((t["confidence"] >= 0) & (t["confidence"] <= 1)).all()
    # output sorted by confidence desc (O1)
    assert (t["confidence"].values[:-1] >= t["confidence"].values[1:]).all()


def test_bootstrap_deterministic(ray_session, boot_result):
    import ray.data

    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.pipelines.snowball import snowball_bootstrap

    corpus_tbl = gen_corpus_table(600, seed=42, tagged_fraction=0.6)
    index = build_index(ray.data.from_arrow(corpus_tbl), n_docs=600, shard_size=128)
    again = snowball_bootstrap(
        ray.data.from_arrow(corpus_tbl),
        DEFAULT_SEEDS,
        EngineConfig(number_iterations=2),
        index.df,
        index.n_docs,
    )
    pd.testing.assert_frame_equal(boot_result.tuples, again.tuples)
    assert boot_result.seeds == again.seeds


def test_serial_twin_matches_distributed(ray_session):
    """The Ray-free serial twin (oracle_snowball.py) and the distributed
    bootstrap agree value-for-value on a small corpus — the repo-local
    version of the driver-gate snowball oracles."""
    import ray.data

    from snowball_java_ray.oracle_snowball import (
        bootstrap_serial,
        corpus_df_dict,
        extract_serial,
    )
    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.pipelines.snowball import (
        extract_tuples,
        snowball_bootstrap,
    )

    cfg = EngineConfig()
    tbl = gen_corpus_table(300, seed=7, tagged_fraction=0.6)
    corpus = ray.data.from_arrow(tbl)

    # extraction parity
    ray_ext = (
        extract_tuples(corpus, cfg)
        .to_pandas()
        .sort_values(["e1", "e2", "doc_id", "sentence", "left"],
                     ignore_index=True)
    )
    ser_ext = extract_serial(tbl, cfg).sort_values(
        ["e1", "e2", "doc_id", "sentence", "left"], ignore_index=True
    )
    pd.testing.assert_frame_equal(ray_ext, ser_ext)

    # dictionary parity: serial df dict == index dictionary
    df, n_docs = corpus_df_dict(tbl)
    index = build_index(ray.data.from_arrow(tbl), n_docs=300, shard_size=256)
    assert df == index.df

    # end-to-end parity (tuples + patterns)
    res = snowball_bootstrap(
        ray.data.from_arrow(tbl), DEFAULT_SEEDS, cfg, index.df, index.n_docs
    )
    ser_tuples, ser_patterns = bootstrap_serial(
        tbl, DEFAULT_SEEDS, cfg, df, n_docs
    )
    pd.testing.assert_frame_equal(
        res.tuples.sort_values(["e1", "e2", "doc_id", "sentence"],
                               ignore_index=True)[ser_tuples.columns],
        ser_tuples.sort_values(["e1", "e2", "doc_id", "sentence"],
                               ignore_index=True),
    )
    pd.testing.assert_frame_equal(res.patterns, ser_patterns)


def test_retrieval_accelerated_bootstrap_identical(ray_session):
    """Index-retrieval-pruned seed matching (north-star integration)
    produces byte-identical bootstrap results to the full-scan filter —
    the retrieved doc set is a proven superset of true matches."""
    import ray.data

    from snowball_java_ray.pipelines.api import build_index
    from snowball_java_ray.pipelines.snowball import snowball_bootstrap

    tbl = gen_corpus_table(300, seed=7, tagged_fraction=0.6)
    index = build_index(ray.data.from_arrow(tbl), n_docs=300, shard_size=256)
    cfg = EngineConfig()
    r_scan = snowball_bootstrap(
        ray.data.from_arrow(tbl), DEFAULT_SEEDS, cfg, index.df, index.n_docs
    )
    r_retr = snowball_bootstrap(
        ray.data.from_arrow(tbl), DEFAULT_SEEDS, cfg, index.df, index.n_docs,
        index=index,
    )
    key = ["e1", "e2", "doc_id", "sentence"]
    pd.testing.assert_frame_equal(
        r_scan.tuples.sort_values(key, ignore_index=True),
        r_retr.tuples.sort_values(key, ignore_index=True),
    )
    pd.testing.assert_frame_equal(r_scan.patterns, r_retr.patterns)
    assert r_scan.seeds == r_retr.seeds
