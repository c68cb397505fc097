"""Anti-join (customers_no_big_order) and incremental dedup
(dedup_incremental) — engine vs DuckDB at sf0.001 + invariants."""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.conftest import SF_TINY


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("customer", "orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_TINY}/{t}.parquet'"
        )
    return con.execute(sql).df()


def test_customers_no_big_order_matches_duckdb(ray_session):
    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.relational import customers_no_big_order

    got = customers_no_big_order(SF_TINY).to_pandas()
    want = _duck(sqlgen.customers_no_big_order_sql())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # every surviving customer really has zero big orders
    from snowball_java_ray.constants import HIGH_VALUE_ORDER

    orders = pd.read_parquet(f"{SF_TINY}/orders.parquet")
    big = set(
        orders.loc[orders["o_totalprice"] > HIGH_VALUE_ORDER, "o_custkey"]
    )
    assert not (set(got["c_custkey"]) & big)


def test_dedup_incremental_matches_duckdb(ray_session):
    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.dedup import dedup_incremental

    got = dedup_incremental(SF_TINY).to_pandas()
    want = _duck(sqlgen.dedup_incremental_sql())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # keepers are all from the "new" suffix, one per digest
    from snowball_java_ray.constants import INCREMENTAL_OLD_FRAC

    docs = pd.read_parquet(f"{SF_TINY}/documents.parquet")
    cut = int(len(docs) * INCREMENTAL_OLD_FRAC)
    assert (got["keep_doc_id"] >= cut).all()
    assert got["content_md5"].is_unique


def test_source_dup_rates_consistent_with_dedup_exact(ray_session):
    """Per-source rates re-derive from dedup_exact's digest groups."""
    from snowball_java_ray.ops.dedup import dedup_exact, source_dup_rates

    rates = source_dup_rates(SF_TINY).to_pandas()
    docs = pd.read_parquet(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    import hashlib

    docs["dg"] = [
        hashlib.md5((x or "").encode()).hexdigest() for x in docs["text"]
    ]
    per = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), n_unique=("dg", "nunique")
    )
    merged = rates.set_index("source").join(per, rsuffix="_ref")
    assert (merged["n_docs"] == merged["n_docs_ref"]).all()
    assert (merged["n_unique"] == merged["n_unique_ref"]).all()
    assert (rates["dup_rate"] >= 0).all() and (rates["dup_rate"] < 1).all()


def test_nation_revenue_share_sums_to_one(ray_session):
    """Shares sum to 1 (within rounding) and revenue totals match the
    raw orders table exactly in cents."""
    from snowball_java_ray.ops.relational import nation_revenue_share

    got = nation_revenue_share(SF_TINY).to_pandas()
    # shares publish on the 6-dp grid since r5 (floor(x*1e6+0.5) on
    # both engines): each of the N rows can miss its raw quotient by
    # up to 0.5e-6, so the sum can miss 1.0 by up to N/2 * 1e-6
    assert abs(got["share"].sum() - 1.0) < (len(got) / 2 + 1) * 1e-6
    orders = pd.read_parquet(
        f"{SF_TINY}/orders.parquet", columns=["o_totalprice"]
    )
    total_cents = (orders["o_totalprice"] * 100).round().astype("int64").sum()
    got_cents = (got["revenue"] * 100).round().astype("int64").sum()
    assert got_cents == total_cents
