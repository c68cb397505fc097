"""Deterministic sampling/splitting/packing (ops/sampling.py)."""

import numpy as np
import pytest

from snowball_java_ray.ops.sampling import (
    TRAIN_FRAC,
    VAL_FRAC,
    pack_sequences,
    split_counts,
    stratified_sample,
    train_val_test_split,
)
from tests.conftest import SF_TINY


def test_split_fractions_and_determinism(ray_session):
    a = train_val_test_split(SF_TINY).to_pandas()
    b = train_val_test_split(SF_TINY).to_pandas()
    assert a.equals(b)
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac.get("train", 0) - TRAIN_FRAC) < 0.08
    assert abs(frac.get("val", 0) - VAL_FRAC) < 0.05


def test_stratified_sample_balanced(ray_session):
    s = stratified_sample(SF_TINY, k=7).to_pandas()
    per = s.groupby("lang").size()
    assert (per == 7).all()
    # deterministic rerun
    assert s.equals(stratified_sample(SF_TINY, k=7).to_pandas())


def test_pack_sequences_partition_invariant(ray_session):
    """The distributed prefix sum is exact: offsets are contiguous and
    identical to a serial cumsum regardless of partitioning."""
    out = pack_sequences(SF_TINY, seq_len=512).to_pandas()
    assert (out["doc_id"].values == np.arange(len(out))).all()
    n = out["n_tokens"].to_numpy()
    expect = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert (out["token_offset"].to_numpy() == expect).all()
    assert (out["seq_id"].to_numpy() == expect // 512).all()


def test_contamination_matches_duckdb(ray_session):
    """Distributed contamination == DuckDB oracle at sf0.001 (and the
    ratio is a true fraction of the doc's distinct n-grams)."""
    import duckdb

    from snowball_java_ray.ops.sampling import contamination
    from snowball_java_ray.pipelines.api import collect_arrow
    from snowball_java_ray.sqlgen import contamination_sql

    got = collect_arrow(contamination(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(contamination_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    assert ((got["contamination"] >= 0) & (got["contamination"] <= 1)).all()
    assert (got["n_contaminated"] <= got["n_shingles"]).all()


def test_weighted_sample_matches_duckdb(ray_session):
    """Importance sample == the SQL acceptance rule; longer docs are
    kept at a higher empirical rate."""
    import duckdb
    import pandas as pd

    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.sampling import weighted_sample
    from tests.conftest import SF_TINY

    got = weighted_sample(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    want = con.execute(sqlgen.weighted_sample_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet")
    kept = docs["doc_id"].isin(set(got["doc_id"]))
    long_rate = kept[docs["n_chars"] >= docs["n_chars"].median()].mean()
    short_rate = kept[docs["n_chars"] < docs["n_chars"].median()].mean()
    assert long_rate > short_rate


def test_doc_deciles_matches_duckdb_and_balanced(ray_session):
    """Engine NTILE == DuckDB NTILE; group sizes differ by at most 1
    and larger groups come first."""
    import duckdb
    import pandas as pd

    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.sampling import doc_deciles
    from tests.conftest import SF_TINY

    got = doc_deciles(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    want = con.execute(sqlgen.doc_deciles_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    sizes = got.groupby("decile").size()
    assert sizes.max() - sizes.min() <= 1
    assert sizes.sort_index().is_monotonic_decreasing
    # deciles are monotone in doc_len: max of d <= min of d+1
    per = got.groupby("decile")["doc_len"]
    mx = per.max().sort_index().to_numpy()
    mn = per.min().sort_index().to_numpy()
    assert (mx[:-1] <= mn[1:]).all()
