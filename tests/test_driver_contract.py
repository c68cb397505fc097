"""Simulates the driver's correctness gate: every queries() entry that
has an oracle_sql() must match it (row count, sorted columns, values)
via DuckDB at sf0.001. Auto-covers new queries as they are added."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_TINY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), ignore_index=True)


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_TINY}/{t}.parquet'"
        )
    return con


def pairs():
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", pairs(), ids=[p[0] for p in pairs()])
def test_query_matches_oracle(ray_session, name, fn, sql):
    got = _to_pandas(fn(SF_TINY))
    assert len(got) >= 0
    if sql is None:
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    want = _con().execute(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    assert sorted(g.columns) == sorted(w.columns), f"{name}: columns differ"
    for c in g.columns:
        gc, wc = g[c], w[c]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            assert (
                (gc.astype(float) - wc.astype(float)).abs().max() or 0.0
            ) < 1e-5, f"{name}.{c}: float mismatch"
        else:
            assert gc.astype(str).tolist() == wc.astype(str).tolist(), (
                f"{name}.{c}: value mismatch"
            )


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
