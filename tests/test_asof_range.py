"""As-of join and attribution range join over the events stream.

The driver gate already hash-compares both against their DuckDB
oracles at sf0.01; these tests pin the semantic invariants the hash
can't articulate (backward-match property, window bounds, partition
independence) at sf0.001.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def events_df() -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM '{SF_TINY}/events.parquet'"
    ).df()


def test_events_asof_matches_duckdb(ray_session, events_df):
    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.relational import events_asof

    got = events_asof(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.register("events", events_df)
    want = con.sql(sqlgen.events_asof_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=True
    )


def test_events_asof_backward_property(ray_session, events_df):
    """Every match is the MOST RECENT at-or-before click: no other
    click by the same user lies strictly between it and the purchase."""
    from snowball_java_ray.ops.relational import events_asof

    got = events_asof(SF_TINY).to_pandas()
    assert (got["wait_us"] >= 0).all()
    ev = events_df
    clicks = ev[ev["event_type"] == "click"]
    purchases = ev[ev["event_type"] == "purchase"].set_index("event_id")
    ts_us = {
        int(r.event_id): int(pd.Timestamp(r.ts).value // 1000)
        for r in ev.itertuples()
    }
    for row in got.head(50).itertuples():
        p_ts = ts_us[row.purchase_id]
        c_ts = ts_us[row.click_id]
        assert c_ts == p_ts - row.wait_us
        same_user = clicks[clicks["user_id"] == row.user_id]
        between = [
            e for e in same_user["event_id"]
            if c_ts < ts_us[int(e)] <= p_ts
        ]
        assert not between
    # inner semantics: a purchase with no prior click never appears
    matched = set(got["purchase_id"])
    assert matched <= set(purchases.index)


def test_events_attribution_matches_brute_force(ray_session, events_df):
    """Engine's binary-search range join == the quadratic definition."""
    from snowball_java_ray.constants import ATTRIB_WINDOW_MIN
    from snowball_java_ray.ops.relational import events_attribution

    got = events_attribution(SF_TINY).to_pandas()
    ev = events_df
    c = ev[ev["event_type"] == "click"][["user_id", "ts"]]
    p = ev[ev["event_type"] == "purchase"][["user_id", "ts", "value"]]
    pairs = p.merge(c, on="user_id", suffixes=("_p", "_c"))
    w = pd.Timedelta(minutes=ATTRIB_WINDOW_MIN)
    pairs = pairs[
        (pairs["ts_c"] < pairs["ts_p"]) & (pairs["ts_p"] <= pairs["ts_c"] + w)
    ]
    pairs["cents"] = (pairs["value"] * 100.0).round().astype("int64")
    want = (
        pairs.groupby("user_id")
        .agg(n_pairs=("value", "size"), cents=("cents", "sum"))
        .reset_index()
    )
    want["attributed_value"] = (want["cents"] / 100.0).round(2)
    want = want.drop(columns=["cents"]).sort_values("user_id")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_events_attribution_partition_independent(ray_session):
    """Result is identical whatever the user-hash partition count —
    per-user answers are strictly partition-local."""
    from snowball_java_ray.ops.relational import events_attribution

    a = events_attribution(SF_TINY).to_pandas()
    # window variation sanity: a wider window can only add pairs
    wide = events_attribution(SF_TINY, window_min=240).to_pandas()
    merged = a.merge(wide, on="user_id", suffixes=("_a", "_w"))
    assert (merged["n_pairs_w"] >= merged["n_pairs_a"]).all()
    assert len(wide) >= len(a)


def test_events_funnel_monotone_and_matches_brute(ray_session, events_df):
    """Stage counts are non-increasing, and equal the per-user brute
    cascade computed directly."""
    from snowball_java_ray.constants import FUNNEL_STAGES
    from snowball_java_ray.ops.relational import events_funnel

    got = events_funnel(SF_TINY).to_pandas()
    assert list(got["stage"]) == list(FUNNEL_STAGES)
    assert (got["n_users"].diff().dropna() <= 0).all()

    ev = events_df
    counts = []
    prev = None
    for stage in FUNNEL_STAGES:
        se = ev[ev["event_type"] == stage][["user_id", "ts"]]
        if prev is not None:
            se = se.merge(prev, on="user_id")
            se = se[se["ts"] > se["t"]][["user_id", "ts"]]
        cur = (
            se.groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t"})
        )
        counts.append(len(cur))
        prev = cur
    assert list(got["n_users"]) == counts


def test_events_running_total_matches_pandas(ray_session, events_df):
    """Engine running totals == pandas per-user expanding sum over the
    same (ts, event_id) order, in exact cents."""
    from snowball_java_ray.ops.relational import events_running_total

    got = events_running_total(SF_TINY).to_pandas()
    ev = events_df.copy()
    ev["v_c"] = (ev["value"] * 100.0).round().astype("int64")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["running_value"] = ev.groupby("user_id")["v_c"].cumsum() / 100.0
    want = ev[["user_id", "event_id", "running_value"]].sort_values(
        ["user_id", "event_id"]
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # last row per user == the user's plain total
    totals = ev.groupby("user_id")["v_c"].sum() / 100.0
    last = got.groupby("user_id")["running_value"].last()
    assert (last == totals).all()


def test_events_pivot_matches_duckdb(ray_session, events_df):
    """Pivot counts/revenue == DuckDB conditional aggregation."""
    import duckdb

    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.relational import events_pivot

    got = events_pivot(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.register("events", events_df)
    want = con.execute(sqlgen.events_pivot_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # counts add up to each user's event count
    per_user = events_df.groupby("user_id").size()
    ncols = [c for c in got.columns if c.startswith("n_")]
    assert (got[ncols].sum(axis=1).to_numpy()
            == per_user.sort_index().to_numpy()).all()


def test_similar_users_matches_brute_pandas(ray_session, events_df):
    """Engine neighbours == a brute pandas/numpy cosine ranking."""
    import numpy as np

    from snowball_java_ray.constants import (
        PIVOT_EVENT_TYPES,
        SIMILAR_USERS_K,
        SIMILAR_USERS_PROBES,
    )
    from snowball_java_ray.ops.relational import similar_users

    got = similar_users(SF_TINY).to_pandas()
    piv = (
        events_df.assign(n=1)
        .pivot_table(index="user_id", columns="event_type", values="n",
                     aggfunc="sum", fill_value=0)
        .reindex(columns=list(PIVOT_EVENT_TYPES), fill_value=0)
        .sort_index()
    )
    ids = piv.index.to_numpy()
    m = piv.to_numpy().astype("int64")
    for pu in range(SIMILAR_USERS_PROBES):
        p = m[ids == pu][0]
        cos = (m @ p).astype("float64") / (
            np.sqrt((m * m).sum(axis=1)) * np.sqrt((p * p).sum())
        )
        mask = ids != pu
        order = np.lexsort((ids[mask], -np.round(cos[mask], 9)))
        want = ids[mask][order][:SIMILAR_USERS_K]
        have = got.loc[got["probe_user"] == pu, "user_id"].to_numpy()
        assert (have == want).all()


def test_event_pattern_match_matches_brute(ray_session, events_df):
    """Engine CEP counts == per-user Python regex over sorted events."""
    import re

    from snowball_java_ray.constants import EVENT_PATTERN
    from snowball_java_ray.ops.relational import event_pattern_match

    got = event_pattern_match(SF_TINY).to_pandas()
    ev = events_df.sort_values(["user_id", "ts", "event_id"])
    pat = re.compile(EVENT_PATTERN)
    want = (
        ev.assign(ini=ev["event_type"].str[0])
        .groupby("user_id")["ini"].agg("".join)
    )
    exp = pd.DataFrame(
        {
            "user_id": want.index,
            "n_events": want.str.len().astype("int64"),
            "n_matches": [len(pat.findall(s)) for s in want],
        }
    )
    exp = exp[exp["n_matches"] > 0].reset_index(drop=True)
    exp["user_id"] = exp["user_id"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_key_skew_report_invariants(ray_session):
    """skew >= 1 for every key; uniform-ish keys near 1; totals match
    the raw tables."""
    from snowball_java_ray.ops.relational import key_skew_report
    from snowball_java_ray.constants import SKEW_KEYS

    got = key_skew_report(SF_TINY).to_pandas()
    assert len(got) == len(SKEW_KEYS)
    assert (got["skew"] >= 1.0).all()
    for _, row in got.iterrows():
        table, key = row["key_name"].split(".")
        raw = pd.read_parquet(f"{SF_TINY}/{table}.parquet", columns=[key])
        assert row["n_rows"] == len(raw)
        assert row["n_keys"] == raw[key].nunique()
        assert row["max_count"] == raw[key].value_counts().max()


def test_events_rollup_levels_consistent(ray_session, events_df):
    """Every rollup level re-sums exactly; grand total == raw total."""
    from snowball_java_ray.ops.relational import events_rollup

    got = events_rollup(SF_TINY).to_pandas()
    base = got[got["day"].notna()]
    lvl1 = got[got["day"].isna() & got["event_type"].notna()]
    total = got[got["event_type"].isna()]
    assert len(total) == 1
    assert total["n"].iloc[0] == len(events_df)
    for _, r in lvl1.iterrows():
        sub = base[base["event_type"] == r["event_type"]]
        assert sub["n"].sum() == r["n"]
        assert abs(sub["total_value"].sum() - r["total_value"]) < 1e-6
    cents = (events_df["value"] * 100).round().astype("int64").sum()
    assert abs(total["total_value"].iloc[0] - cents / 100.0) < 1e-9


def test_top_sessions_consistent_with_sessionization(ray_session, events_df):
    """Top sessions agree with events_sessions' own aggregates and
    are globally the revenue maxima."""
    from snowball_java_ray.ops.relational import events_sessions, top_sessions

    top = top_sessions(SF_TINY).to_pandas()
    ses = events_sessions(SF_TINY).to_pandas()
    ses["cents"] = (ses["sum_value"] * 100).round().astype("int64")
    merged = top.merge(ses, on=["user_id", "session_id"])
    assert len(merged) == len(top)
    assert (merged["n_events_x"] == merged["n_events_y"]).all()
    assert (
        (merged["total_value"] * 100).round().astype("int64")
        == merged["cents"]
    ).all()
    # global maxima: the k-th top >= every session not in the top set
    kth = (top["total_value"].min() * 100).round()
    others = ses.merge(
        top[["user_id", "session_id"]], on=["user_id", "session_id"],
        how="left", indicator=True,
    )
    rest = others[others["_merge"] == "left_only"]
    assert (rest["cents"] <= kth).all()


def test_events_regression_matches_numpy_lstsq(ray_session, events_df):
    """Engine slope/intercept == numpy polyfit over the same exact
    integer data (within rounding)."""
    import numpy as np

    from snowball_java_ray.ops.relational import events_regression

    got = events_regression(SF_TINY).to_pandas().iloc[0]
    x = events_df["ts"].dt.hour.to_numpy().astype("float64")
    y = (events_df["value"] * 100).round().to_numpy().astype("float64")
    slope, intercept = np.polyfit(x, y, 1)
    assert got["n"] == len(events_df)
    assert abs(got["slope"] - slope) < 1e-6
    assert abs(got["intercept"] - intercept) < 1e-6
