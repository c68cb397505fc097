"""General relational operators over the TPC-H-ish testdata tables.

Demonstrates the generic Ray Data operator surface the engine builds
on: column-pruned reads, vectorized filters/projections, multi-key
grouped aggregation, broadcast hash joins (small side via closure
capture -> Ray object store), explicit partitioned hash joins for
large-large, tumbling-window aggregation, and deterministic top-k.

Join strategy notes (SURVEY.md §2.4):
- dimension tables (region, nation, customer at these scales) are
  BROADCAST: loaded once on the driver, captured in the map_batches
  closure -> shipped to workers through the object store once, joined
  per batch with a vectorized pandas merge. No shuffle.
- fact-fact joins use partial aggregation first (shrink the left side
  to one row per key) and then a hash-partitioned join
  (Dataset.join, hash exchange on the key) — never a broadcast of an
  unbounded side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q1_pricing(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped: filter -> computed columns -> multi-key grouped
    aggregate over lineitem. Vectorized pyarrow filter + compute;
    Ray groupby does the (small-key-cardinality) shuffle."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    # Money columns are 2-decimal values: converting to integer cents
    # makes every sum EXACT (int64), so Ray and the SQL oracle produce
    # bit-identical doubles — no float-summation-order rounding risk.
    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        price_c = pc.cast(pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        disc_c = pc.cast(pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64())
        disc4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "price_c": price_c,
                "disc4": disc4,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc4", alias_name="disc4"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["sum_qty"],
                "sum_base_price": pc.divide(pc.cast(t["price_c"], pa.float64()), 100.0),
                "sum_disc_price": pc.divide(pc.cast(t["disc4"], pa.float64()), 10000.0),
                "avg_qty": pc.round(t["avg_qty"], ndigits=6),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def nation_region_counts(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join: customer (fact) x nation x region (dims).
    Dims are read driver-side once and captured in the closure."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]]

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(dim, left_on="c_nationkey", right_on="n_nationkey")[
            ["r_name", "n_name", "c_acctbal"]
        ]
        out["acctbal_c"] = (out["c_acctbal"] * 100.0).round().astype("int64")
        return out[["r_name", "n_name", "acctbal_c"]]

    agg = (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(join, batch_format="pandas")
        .groupby(["r_name", "n_name"])
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("acctbal_c", alias_name="acctbal_c"),
        )
        .sort(["r_name", "n_name"])
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": t["r_name"],
                "n_name": t["n_name"],
                "n_customers": t["n_customers"],
                "total_acctbal": pc.divide(pc.cast(t["acctbal_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def order_revenue_by_priority(sf_dir: str) -> ray.data.Dataset:
    """Fact-fact join done the scalable way: lineitem is FIRST partially
    aggregated to one row per l_orderkey (map-side combine + small
    groupby), then hash-join-partitioned against orders, then the final
    tiny aggregate. The shuffle moves one row per order, not one per
    line item."""

    def revenue_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())
        disc_c = pc.cast(pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64())
        rev4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        tmp = pa.table({"l_orderkey": t["l_orderkey"], "rev4": rev4})
        return tmp.group_by("l_orderkey").aggregate([("rev4", "sum")]).rename_columns(
            ["l_orderkey", "rev4"]
        )

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    # one group per order — the vectorized aggregate path (Ray's
    # aggregate pays ~25us of Python per group)
    per_order = hash_grouped_aggregate(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(revenue_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("rev4", "sum", "rev4")],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = orders.join(
        per_order,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    agg = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"), Sum("rev4", alias_name="rev4"))
        .sort("o_orderpriority")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": t["n_orders"],
                "revenue": pc.divide(pc.cast(t["rev4"], pa.float64()), 10000.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_customers(sf_dir: str) -> ray.data.Dataset:
    """Top-10 customers by total order value: broadcast dim lookup +
    grouped sum + deterministic top-k (value desc, key asc)."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(cust, left_on="o_custkey", right_on="c_custkey")[
            ["c_custkey", "c_name", "o_totalprice"]
        ]
        out["price_c"] = (out["o_totalprice"] * 100.0).round().astype("int64")
        return out[["c_custkey", "c_name", "price_c"]]

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    agg = hash_grouped_aggregate(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pandas"),
        ["c_custkey", "c_name"],
        [("price_c", "sum", "price_c"), ("", "count_all", "n_orders")],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "total_value": pc.divide(pc.cast(t["price_c"], pa.float64()), 100.0),
                "n_orders": t["n_orders"],
            }
        )

    # exact cents make the top-k cut deterministic across engines
    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["total_value", "c_custkey"], descending=[True, False])
        .limit(10)
    )


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: window assignment is a
    vectorized per-batch projection (floor ts to hour), the aggregate a
    grouped shuffle on (event_type, window) — the batch-engine
    expression of a streaming tumbling window (ray_guide: Ray Data has
    no watermarks; order-independent aggregates need none).

    ``sum_value`` rides as exact integer cents (r4 — the old
    round(sum,4) contract was 1-ulp knife-edged: pc.round and DuckDB
    round produce different nearest doubles for the same decimal),
    published as cents/100.0 — bit-identical across engines."""

    def win(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                # string window key: immune to timestamp-unit
                # re-normalization inside Ray's shuffle
                # (Arrow's %S emits fractional seconds; trim to 19 chars)
                "window_start": pc.utf8_slice_codeunits(
                    pc.strftime(
                        pc.floor_temporal(t["ts"], unit="hour"),
                        format="%Y-%m-%d %H:%M:%S",
                    ),
                    0, 19,
                ),
                "cents": pc.cast(
                    pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)), pa.int64()
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return t.drop_columns(["cents"]).append_column(
            "sum_value",
            pc.divide(pc.cast(t["cents"], pa.float64()), 100.0),
        )

    return (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="cents"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["event_type", "window_start"])
    )


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user: events sorted by ts within each
    user_id group; a new session starts after a gap > ``gap_minutes``.

    Expressed as PARTITION-level vectorized gaps-and-islands (not
    per-user map_groups — user cardinality is unbounded at scale and
    Ray's per-group dispatch would dominate): users hash into ~CPUs
    partitions, each partition sorts by (user_id, ts) once and computes
    session boundaries/aggregates with pandas vector ops over ALL its
    users at once. The SQL oracle is the standard gaps-and-islands
    formulation."""

    def sessionize_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        g["cents"] = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        new_session = new_user | gap
        gsid = new_session.cumsum()
        # per-user 0-based session index: global id minus the user's first
        first_of_user = gsid.where(new_user).ffill()
        g = g.assign(session_id=(gsid - first_of_user).astype("int64"),
                     __gsid=gsid)
        out = (
            g.groupby("__gsid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_id=("session_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_type", "size"),
                sum_value=("cents", "sum"),
            )
            .reset_index(drop=True)
        )
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out["session_end"] = out["session_end"].dt.strftime("%Y-%m-%d %H:%M:%S")
        # exact integer cents -> published double (see events_hourly)
        out["sum_value"] = out["sum_value"].astype("int64") / 100.0
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "session_start", "session_end",
                    "n_events", "sum_value"]]

    from snowball_java_ray.ops.dedup import join_partitions

    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sessionize_partition, batch_format="pandas")
        .sort(["user_id", "session_id"])
    )


def events_sliding(sf_dir: str, window_min: int = 60, slide_min: int = 30) -> ray.data.Dataset:
    """Sliding windows (60-min window, 30-min slide) per event_type:
    each event is assigned to every window covering it (window_min /
    slide_min assignments) in a vectorized flat-map, then one grouped
    aggregate — the batch expression of a sliding stream window.
    ``sum_value`` rides as exact integer cents (see events_hourly)."""
    k = window_min // slide_min

    def assign(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)), pa.int64())
        # epoch minutes, floored to slide grid
        mins = ts.astype("datetime64[m]").astype("int64")
        base = (mins // slide_min) * slide_min
        parts = []
        for j in range(k):
            start = base - j * slide_min
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_start": pa.array(
                            start.astype("datetime64[m]")
                            .astype("datetime64[us]")
                        ),
                        "cents": cents,
                    }
                )
            )
        return pa.concat_tables(parts)

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.utf8_slice_codeunits(
                    pc.strftime(t["window_start"], format="%Y-%m-%d %H:%M:%S"),
                    0, 19,
                ),
                "n_events": t["n_events"],
                "sum_value": pc.divide(
                    pc.cast(t["cents"], pa.float64()), 100.0
                ),
            }
        )

    return (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .map_batches(fmt, batch_format="pyarrow")
        .sort(["event_type", "window_start"])
    )


class ParseProps:
    """Actor-pool JSON-extraction stage (VERDICT r1 fix #9: replaces a
    per-row json.loads Python loop — measured ~8x on the sf0.1 props
    column). Each actor opens one in-process DuckDB connection in
    __init__ and runs the SAME json_extract expression as the oracle
    SQL per batch, so engine and oracle share one parse semantics.

    Coercion rule (intentional, ADVICE r2): ``k`` follows DuckDB
    ``CAST(json_extract(...) AS BIGINT)`` semantics — numeric strings
    and floats coerce to BIGINT (floats truncate), non-numeric values
    become NULL. This is the engine's defined behavior for the props
    schema (the oracle is the same expression by construction); it
    deliberately differs from a strict isinstance(v, int) reading,
    which would need TRY_CAST + json_type guards on both sides."""

    def __init__(self):
        import duckdb

        self.con = duckdb.connect()

    def __call__(self, t: pa.Table) -> pa.Table:
        batch = t  # registered by name in the query below  # noqa: F841
        out = self.con.execute(
            "SELECT event_type,"
            " CAST(json_extract(props, '$.k') AS BIGINT) AS k"
            " FROM batch"
        ).arrow()
        return out.cast(
            pa.schema([("event_type", t.schema.field("event_type").type),
                       ("k", pa.int64())])
        )


def events_props_stats(sf_dir: str) -> ray.data.Dataset:
    """JSON scalar functions: parse the ``props`` JSON column, extract
    the numeric field ``k``, aggregate per event_type. Parsing is a
    vectorized DuckDB json_extract kernel in an actor-pool stage
    (connection opened once per actor)."""
    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(ParseProps, batch_format="pyarrow", concurrency=2)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
        .sort("event_type")
    )


def orders_topk(sf_dir: str) -> ray.data.Dataset:
    """Global deterministic top-k by sort + limit."""
    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q3_shipping(sf_dir: str) -> pa.Table:
    """Shipping-priority report — the TPC-H Q3 shape: revenue of
    not-yet-shipped lineitems for orders placed before the cutoff by
    customers in one market segment; top-k orders by revenue.

    Scale shape: the qualifying customer keys are a FILTERED dim read
    broadcast as a numpy membership probe (never a shuffle for the
    small side); orders and lineitem are both read with predicate
    pushdown on their date columns; lineitem pre-aggregates to one
    exact-cents row per order (map-side combine +
    ``hash_grouped_aggregate``) BEFORE the fact-fact join, so the
    join moves one row per order; the top-k cut ranks on the exact
    integer cents. Oracle: ``sqlgen.q3_shipping_sql``."""
    from datetime import datetime

    import numpy as np
    import ray

    from snowball_java_ray.constants import Q3_CUTOFF, Q3_SEGMENT, Q3_TOP_K
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    cutoff = datetime.fromisoformat(Q3_CUTOFF)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filters=[("c_mktsegment", "=", Q3_SEGMENT)],
    )
    keys = np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=pc.field("o_orderdate") < cutoff,
    )

    def seg_filter(t: pa.Table) -> pa.Table:
        import ray as _ray

        k = _ray.get(keys_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, ck)
        idx[idx == k.size] = 0
        return t.filter(pa.array(k[idx] == ck)).drop_columns(["o_custkey"])

    orders = orders.map_batches(seg_filter, batch_format="pyarrow")

    def revenue_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64()
        )
        disc_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64()
        )
        rev4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
        )
        tmp = pa.table({"l_orderkey": t["l_orderkey"], "rev4": rev4})
        return tmp.group_by("l_orderkey").aggregate(
            [("rev4", "sum")]
        ).rename_columns(["l_orderkey", "rev4"])

    per_order = hash_grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
            filter=pc.field("l_shipdate") > cutoff,
        )
        .map_batches(
            lambda t: t.drop_columns(["l_shipdate"]), batch_format="pyarrow"
        )
        .map_batches(revenue_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("rev4", "sum", "rev4")],
    )
    joined = orders.join(
        per_order,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    tbl = pa.concat_tables(
        joined.iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default",
    )
    order = pc.sort_indices(
        tbl,
        sort_keys=[("rev4", "descending"), ("o_orderkey", "ascending")],
    )[:Q3_TOP_K]
    tbl = tbl.take(order)
    return pa.table(
        {
            "o_orderkey": pc.cast(tbl["o_orderkey"], pa.int64()),
            "revenue": pc.divide(pc.cast(tbl["rev4"], pa.float64()),
                                 10000.0),
            "o_orderdate": tbl["o_orderdate"],
            "o_orderpriority": tbl["o_orderpriority"],
        }
    )


def q5_region_revenue(sf_dir: str) -> pa.Table:
    """Local-supplier revenue — the TPC-H Q5 shape over the full star:
    per nation in one region, the revenue from lineitems whose
    supplier and ordering customer share that nation, for orders in a
    one-year window.

    Scale shape: the dim chain region→nation→supplier/customer is
    tiny and ships as two sorted key->nation probes (ray.put once);
    orders read with the date predicate pushed down and map to
    (o_orderkey, customer nation) rows; lineitem pre-aggregates to
    one exact-cents row per (l_orderkey, supplier nation) — map-side
    combine + ``hash_grouped_aggregate`` — BEFORE the fact-fact join,
    which then moves one row per (order, supplier-nation); the
    same-nation predicate and final per-nation sum are vectorized.
    Oracle: ``sqlgen.q5_region_revenue_sql``."""
    from datetime import datetime

    import numpy as np
    import ray

    from snowball_java_ray.constants import (
        Q5_DATE_FROM,
        Q5_DATE_TO,
        Q5_REGION,
    )
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    t_from = datetime.fromisoformat(Q5_DATE_FROM)
    t_to = datetime.fromisoformat(Q5_DATE_TO)

    region = pq.read_table(f"{sf_dir}/region.parquet",
                           filters=[("r_name", "=", Q5_REGION)])
    rkeys = set(region["r_regionkey"].to_pylist())
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nat = {
        int(nk): name
        for nk, name, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
        if rk in rkeys
    }
    nat_keys = np.sort(np.array(list(nat), np.int64))

    def key_to_nation(path: str, key_col: str, nat_col: str):
        t = pq.read_table(f"{sf_dir}/{path}", columns=[key_col, nat_col])
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[nat_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(n, nat_keys)
        k, n = k[keep], n[keep]
        order = np.argsort(k)
        return k[order], n[order]

    supp_k, supp_n = key_to_nation("supplier.parquet", "s_suppkey",
                                   "s_nationkey")
    cust_k, cust_n = key_to_nation("customer.parquet", "c_custkey",
                                   "c_nationkey")
    probes_ref = ray.put((supp_k, supp_n, cust_k, cust_n))

    def probe(keys: np.ndarray, pk: np.ndarray, pn: np.ndarray):
        """key -> nation (or -1 when outside the region)."""
        idx = np.searchsorted(pk, keys)
        idx[idx == pk.size] = 0
        hit = pk[idx] == keys
        out = np.where(hit, pn[idx], -1)
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= t_from)
        & (pc.field("o_orderdate") < t_to),
    )

    def order_nation(t: pa.Table) -> pa.Table:
        import ray as _ray

        _, _, ck, cn = _ray.get(probes_ref)
        n = probe(
            t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            ck, cn,
        )
        keep = n >= 0
        return pa.table(
            {
                "o_orderkey": pc.cast(
                    t["o_orderkey"].filter(pa.array(keep)), pa.int64()
                ),
                "c_nat": pa.array(n[keep], pa.int64()),
            }
        )

    o_ds = orders.map_batches(order_nation, batch_format="pyarrow")

    def line_partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        sk, sn, _, _ = _ray.get(probes_ref)
        n = probe(
            t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            sk, sn,
        )
        keep = n >= 0
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "s_nat": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64())}
            )
        price_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64()
        )
        disc_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64()
        )
        rev4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
        )
        tmp = pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s_nat": pa.array(n[keep], pa.int64()),
                "rev4": rev4,
            }
        )
        g = tmp.group_by(["l_orderkey", "s_nat"]).aggregate([("rev4", "sum")])
        return g.rename_columns(["l_orderkey", "s_nat", "rev4"])

    per_order = hash_grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(line_partial, batch_format="pyarrow"),
        ["l_orderkey", "s_nat"],
        [("rev4", "sum", "rev4")],
    )
    joined = o_ds.join(
        per_order,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_nat"], t["s_nat"])
        t = t.filter(keep)
        return pa.table({"n_nat": t["c_nat"], "rev4": t["rev4"]})

    parts = pa.concat_tables(
        joined.map_batches(local_only, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    agg = parts.group_by("n_nat").aggregate([("rev4", "sum")])
    names = [nat[int(k)] for k in agg["n_nat"].to_pylist()]
    out = pa.table(
        {
            "n_name": pa.array(names, pa.string()),
            "revenue": pc.divide(
                pc.cast(agg["rev4_sum"], pa.float64()), 10000.0
            ),
            "rev4": pc.cast(agg["rev4_sum"], pa.int64()),
        }
    )
    out = out.take(
        pc.sort_indices(
            out,
            sort_keys=[("rev4", "descending"), ("n_name", "ascending")],
        )
    )
    return out.drop_columns(["rev4"])


def promo_share_monthly(sf_dir: str) -> pa.Table:
    """Promotion revenue share by ship month — the TPC-H Q14 shape
    over the full lineitem history: per month, total exact-cents
    revenue, the slice from parts of type 'PROMO', and the percentage
    share. Brings the part table into coverage.

    Scale shape: part is a dim — its partkey -> is-promo flag ships
    once as a sorted probe (ray.put); ONE lineitem scan emits
    per-batch per-month integer partial sums (map-side combine) into
    a tiny month-keyed ``hash_grouped_aggregate``; the share is one
    float division per month row. Oracle:
    ``sqlgen.promo_share_monthly_sql``."""
    import numpy as np
    import ray

    from snowball_java_ray.constants import SCORE_ROUND_DECIMALS
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(pk)
    probe_ref = ray.put((pk[order], promo[order]))

    def monthly_partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        keys, flags = _ray.get(probe_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, lp)
        idx[idx == keys.size] = 0
        hit = keys[idx] == lp
        is_promo = np.where(hit, flags[idx], False)
        price_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64()
        )
        disc_c = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64()
        )
        rev4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)
        ).to_numpy(zero_copy_only=False)
        month = pc.strftime(t["l_shipdate"], format="%Y-%m")
        tmp = pa.table(
            {
                "month": month,
                "rev4": pa.array(rev4, pa.int64()),
                "promo4": pa.array(
                    np.where(is_promo, rev4, 0), pa.int64()
                ),
            }
        )
        g = tmp.group_by("month").aggregate(
            [("rev4", "sum"), ("promo4", "sum")]
        )
        return g.rename_columns(["month", "rev4", "promo4"])

    agg = hash_grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        ).map_batches(monthly_partial, batch_format="pyarrow"),
        ["month"],
        [("rev4", "sum", "rev4"), ("promo4", "sum", "promo4")],
    )
    tbl = pa.concat_tables(
        agg.iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default",
    )
    rev4 = tbl["rev4"].to_numpy(zero_copy_only=False).astype(np.float64)
    promo4 = tbl["promo4"].to_numpy(zero_copy_only=False).astype(np.float64)
    out = pa.table(
        {
            "month": tbl["month"],
            "revenue": pc.divide(pc.cast(tbl["rev4"], pa.float64()),
                                 10000.0),
            "promo_revenue": pc.divide(
                pc.cast(tbl["promo4"], pa.float64()), 10000.0
            ),
            "promo_share": pa.array(
                np.round(100.0 * promo4 / rev4, SCORE_ROUND_DECIMALS),
                pa.float64(),
            ),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("month", "ascending")]))


def events_asof(
    sf_dir: str,
    left_type: str | None = None,
    right_type: str | None = None,
) -> ray.data.Dataset:
    """As-of join over the events stream: for every purchase, the most
    recent click by the same user at-or-before the purchase (backward
    as-of, inner semantics — unmatched purchases drop).

    Ray Data has no as-of join operator; the distributed expression is
    (a) hash-partition BOTH event roles by user_id in one scan (users
    are partition-exclusive, so every per-purchase answer is local and
    partitioning-independent), then (b) a partition-level vectorized
    ``pd.merge_asof(by=user_id)`` — pandas' compiled backward-search —
    per partition, NOT per user (per-user map_groups would pay Ray's
    per-group dispatch on an unbounded key, the events_sessions
    lesson). One shuffle total; output is one row per matched purchase.

    Determinism: clicks are pre-reduced to one row per (user_id, ts)
    keeping max(event_id) — the same arg-max tie rule the SQL oracle
    states — so equal-timestamp ties cannot produce engine-dependent
    matches. The delta ships as exact integer microseconds (wait_us),
    immune to float/rounding drift.
    """
    import numpy as np

    from snowball_java_ray.constants import ASOF_LEFT_EVENT, ASOF_RIGHT_EVENT
    from snowball_java_ray.ops.dedup import join_partitions

    lt = left_type or ASOF_LEFT_EVENT
    rt = right_type or ASOF_RIGHT_EVENT
    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    empty = pd.DataFrame(
        {
            "purchase_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "click_id": pd.Series([], dtype="int64"),
            "wait_us": pd.Series([], dtype="int64"),
        }
    )

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["event_type"] == lt]
        r = g[g["event_type"] == rt]
        if l.empty or r.empty:
            return empty
        # exact integer microseconds regardless of the pandas datetime
        # unit Ray hands us (ns vs us varies by pyarrow conversion)
        l = pd.DataFrame(
            {
                "purchase_id": l["event_id"].to_numpy(),
                "user_id": l["user_id"].to_numpy(),
                "ts_us": l["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
            }
        )
        r = pd.DataFrame(
            {
                "user_id": r["user_id"].to_numpy(),
                "ts_us": r["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "click_id": r["event_id"].to_numpy(),
            }
        )
        # deterministic tie rule: one click per (user, ts), max event_id
        r = r.groupby(["user_id", "ts_us"], as_index=False)["click_id"].max()
        l = l.sort_values("ts_us", kind="mergesort")
        r = r.sort_values("ts_us", kind="mergesort")
        m = pd.merge_asof(
            l,
            r.rename(columns={"ts_us": "cts_us"}),
            left_on="ts_us",
            right_on="cts_us",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["click_id"].notna()]
        if m.empty:
            return empty
        out = pd.DataFrame(
            {
                "purchase_id": m["purchase_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "click_id": m["click_id"].astype("int64"),
                "wait_us": (m["ts_us"] - m["cts_us"]).astype("int64"),
            }
        )
        return out

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["event_type"], pa.array([lt, rt]))),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(asof_partition, batch_format="pandas")
        .sort("purchase_id")
    )


def events_attribution(sf_dir: str, window_min: int | None = None) -> ray.data.Dataset:
    """Range join with per-user aggregation: every (click, purchase)
    pair by the same user with click.ts < purchase.ts <= click.ts + W
    (the classic attribution window), reduced to per-user pair counts
    and attributed purchase value.

    Ray Data has no range/interval join; an equi-join on user_id then a
    filter would materialize the full per-user cross product. Instead:
    one scan hash-partitions both roles by user_id, and each partition
    answers ALL its purchases with two vectorized binary searches over
    a rank-composed sort key — ordinal(user) * L + rank(ts) packs the
    (user, ts) lexicographic order into one int64 (L = n_clicks + 2
    bounds the rank, so keys of different users cannot interleave; both
    factors are partition-local so the product stays far inside int64).
    count(purchase) = searchsorted(keys, hi) - searchsorted(keys, lo)
    where hi/lo rank purchase.ts and purchase.ts - W against the SAME
    sorted click-ts reference, making the half-open window
    [p.ts - W, p.ts) exact at equal timestamps. O((C+P) log C) per
    partition, zero pair rows ever materialized; per-user partials are
    final because users are partition-exclusive. Purchase values ride
    as exact integer cents (the oracle states the same CAST)."""
    import numpy as np

    from snowball_java_ray.constants import (
        ASOF_LEFT_EVENT,
        ASOF_RIGHT_EVENT,
        ATTRIB_WINDOW_MIN,
    )
    from snowball_java_ray.ops.dedup import join_partitions

    W_us = int((window_min or ATTRIB_WINDOW_MIN) * 60) * 1_000_000
    lt, rt = ASOF_LEFT_EVENT, ASOF_RIGHT_EVENT
    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "n_pairs": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
        }
    )

    def attrib_partition(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == rt]
        p = g[g["event_type"] == lt]
        if c.empty or p.empty:
            return empty
        cu = c["user_id"].to_numpy().astype("int64")
        ct = c["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        pu = p["user_id"].to_numpy().astype("int64")
        pt = p["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        v_c = np.floor(p["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        # dense user ordinals over the union (raw user ids may be huge)
        uniq, inv = np.unique(np.concatenate([cu, pu]), return_inverse=True)
        cuo, puo = inv[: len(cu)], inv[len(cu):]
        sct = np.sort(ct)  # shared rank reference for clicks AND bounds
        L = np.int64(len(ct) + 2)
        ckeys = np.sort(cuo * L + np.searchsorted(sct, ct, side="left"))
        hi = puo * L + np.searchsorted(sct, pt, side="left")
        lo = puo * L + np.searchsorted(sct, pt - W_us, side="left")
        n = np.searchsorted(ckeys, hi, side="left") - np.searchsorted(
            ckeys, lo, side="left"
        )
        hit = n > 0
        if not hit.any():
            return empty
        out = (
            pd.DataFrame(
                {
                    "user_id": pu[hit],
                    "n_pairs": n[hit],
                    "cents": v_c[hit] * n[hit],
                }
            )
            .groupby("user_id", as_index=False)
            .sum()
        )
        return out.astype("int64")

    agg = (
        _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["event_type"], pa.array([lt, rt]))),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(attrib_partition, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_pairs": t["n_pairs"],
                "attributed_value": pc.round(
                    pc.divide(pc.cast(t["cents"], pa.float64()), 100.0),
                    ndigits=2,
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


def events_funnel(sf_dir: str) -> ray.data.Dataset:
    """Ordered funnel (signup -> click -> purchase, first-touch): how
    many users completed each stage STRICTLY AFTER their previous
    stage's first completion.

    Scale shape: one scan hash-partitions users (stage progression is
    a per-user property, so partials are exact per partition); inside
    each partition the whole cascade is pandas groupby-min + merges
    over ALL users at once — no per-user dispatch. Each partition
    emits exactly len(FUNNEL_STAGES) partial-count rows, so the final
    shuffle carries O(partitions x stages) rows and the driver sees a
    stage-count table regardless of user cardinality."""
    from snowball_java_ray.constants import FUNNEL_STAGES
    from snowball_java_ray.ops.dedup import join_partitions

    stages = list(FUNNEL_STAGES)
    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    def funnel_partition(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ev = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "ts_us": ts_us,
            }
        )
        counts = []
        prev: pd.DataFrame | None = None  # (user_id, t) reached so far
        for i, stage in enumerate(stages):
            se = ev[ev["event_type"] == stage][["user_id", "ts_us"]]
            if prev is not None:
                se = se.merge(prev, on="user_id")
                se = se[se["ts_us"] > se["t"]][["user_id", "ts_us"]]
            cur = se.groupby("user_id", as_index=False)["ts_us"].min()
            cur = cur.rename(columns={"ts_us": "t"})
            counts.append(len(cur))
            prev = cur
        return pd.DataFrame(
            {
                "stage_idx": pd.Series(range(len(stages)), dtype="int64"),
                "stage": stages,
                "n_users": pd.Series(counts, dtype="int64"),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(
            lambda t: t.filter(
                pc.is_in(t["event_type"], pa.array(stages))
            ),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(funnel_partition, batch_format="pandas")
        .groupby(["stage_idx", "stage"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort("stage_idx")
    )


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Retention cohorts: users grouped by first-seen day, counted as
    active at each day offset — the (cohort_day, offset_days,
    n_active_users) triangle every activity dashboard draws.

    Scale shape: ONE user-hash shuffle. Users are partition-exclusive,
    so each partition computes its users' cohort day (groupby-min) and
    their DISTINCT (cohort, offset) activity cells locally; the
    per-cell partial counts are additive across partitions (no user
    spans two), so a small grouped sum over O(cohorts x offsets x
    partitions) partial rows finishes — no distinct-count shuffle of
    raw events."""
    import numpy as np

    from snowball_java_ray.ops.dedup import join_partitions

    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    def cohort_partition(g: pd.DataFrame) -> pd.DataFrame:
        day = (
            g["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        )
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day})
        first = df.groupby("user_id", as_index=False)["day"].min()
        first = first.rename(columns={"day": "cohort"})
        m = df.merge(first, on="user_id")
        cells = m[["user_id", "cohort", "day"]].drop_duplicates()
        out = (
            cells.assign(offset_days=cells["day"] - cells["cohort"])
            .groupby(["cohort", "offset_days"], as_index=False)
            .agg(n_users=("user_id", "size"))
        )
        out["cohort_day"] = pd.to_datetime(
            out["cohort"], unit="D"
        ).dt.strftime("%Y-%m-%d")
        return out[["cohort_day", "offset_days", "n_users"]].astype(
            {"offset_days": "int64", "n_users": "int64"}
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(cohort_partition, batch_format="pandas")
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort(["cohort_day", "offset_days"])
    )


def events_running_total(sf_dir: str) -> ray.data.Dataset:
    """Analytic window function: per-user running total of ``value``
    ordered by (ts, event_id) — SUM() OVER (PARTITION BY user
    ORDER BY ...) as a batch-engine operator.

    Scale shape: one user-hash shuffle; each partition sorts ONCE by
    (user_id, ts, event_id) and computes every user's cumulative sum
    in two vectorized passes (global cumsum minus each user's starting
    offset) — no per-user dispatch. Values ride as exact integer cents
    (the oracle states the same CAST): the cumsum-minus-offset trick
    changes float addition ORDER, which would drift last-ulp from the
    oracle's sequential window sum, but over integers it is exact."""
    import numpy as np

    from snowball_java_ray.ops.dedup import join_partitions

    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ts_us": g["ts"].to_numpy().astype("datetime64[us]")
                .astype("int64"),
                "v_c": np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(
                    "int64"
                ),
            }
        ).sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        v = g["v_c"].to_numpy()
        cs = np.cumsum(v)
        first = ~g["user_id"].duplicated().to_numpy()
        # subtract the cumsum just BEFORE each user's first row
        base = np.where(first, cs - v, 0)
        base = (
            pd.Series(np.where(first, base, np.nan)).ffill().to_numpy()
        ).astype("int64")
        g["running_value"] = (cs - base) / 100.0
        return g[["user_id", "event_id", "running_value"]]

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(running, batch_format="pandas")
        .sort(["user_id", "event_id"])
    )


def events_pivot(sf_dir: str) -> ray.data.Dataset:
    """Event-type pivot: one row per user with a count column per
    event type plus purchase revenue — SUM(CASE WHEN ...) conditional
    aggregation as a batch-engine operator.

    Scale shape: the pivot happens map-side — each batch collapses to
    at most one row per (user, batch) via Arrow C++ group_by over the
    conditional indicator columns — so the single hash shuffle carries
    pre-combined partials, never raw events. Revenue rides as exact
    integer cents (same CAST as the oracle) so partial-sum order can't
    drift the float result."""
    import numpy as np

    from snowball_java_ray.constants import PIVOT_EVENT_TYPES
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        cols: dict[str, pa.Array] = {"user_id": t["user_id"]}
        for ty in PIVOT_EVENT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(et, ty), pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        is_p = pc.cast(pc.equal(et, "purchase"), pa.int64())
        cols["purchase_cents"] = pc.multiply(cents, is_p)
        flat = pa.table(cols)
        out = flat.group_by(["user_id"]).aggregate(
            [(c, "sum") for c in flat.schema.names if c != "user_id"]
        )
        return out.rename_columns(
            [n[:-4] if n.endswith("_sum") else n for n in out.schema.names]
        )

    agg = hash_grouped_aggregate(
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        [(f"n_{ty}", "sum", f"n_{ty}")
         for ty in PIVOT_EVENT_TYPES]
        + [("purchase_cents", "sum", "purchase_cents")],
    )

    def finish(t: pa.Table) -> pa.Table:
        val = pc.divide(
            pc.cast(t["purchase_cents"], pa.float64()), pa.scalar(100.0)
        )
        return t.drop_columns(["purchase_cents"]).append_column(
            "purchase_value", val
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


def customers_no_big_order(sf_dir: str) -> ray.data.Dataset:
    """Anti-join / NOT EXISTS: customers with no order above
    HIGH_VALUE_ORDER, with their name and balance.

    Scale shape: ONE tagged-union hash shuffle instead of a two-sided
    join — customer rows carry their attributes with flag 0, matching
    order rows carry only (custkey, flag 1); a single
    hash_grouped_aggregate per custkey takes max(flag) (any big order
    poisons the key) and max(name)/max(acctbal) (non-null only on the
    single customer row, so max is just "the value"). The order side
    is pre-shrunk map-side to one row per (custkey, batch). No
    broadcast of either unbounded side, no second shuffle to re-attach
    attributes."""
    from snowball_java_ray.constants import HIGH_VALUE_ORDER
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
                "has_big": pa.array([0] * len(t), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def big_orders(t: pa.Table) -> pa.Table:
        keys = pc.unique(
            t.filter(pc.greater(t["o_totalprice"], HIGH_VALUE_ORDER))[
                "o_custkey"
            ]
        )
        n = len(keys)
        return pa.table(
            {
                "c_custkey": keys,
                "c_name": pa.nulls(n, pa.string()),
                "c_acctbal": pa.nulls(n, pa.float64()),
                "has_big": pa.array([1] * n, pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"]
    ).map_batches(big_orders, batch_format="pyarrow")

    agg = hash_grouped_aggregate(
        cust.union(orders),
        ["c_custkey"],
        [
            ("c_name", "max", "c_name"),
            ("c_acctbal", "max", "c_acctbal"),
            ("has_big", "max", "has_big"),
        ],
    )
    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["has_big"], 0)).drop_columns(
            ["has_big"]
        )

    return agg.map_batches(keep, batch_format="pyarrow").sort("c_custkey")


def table_profile(sf_dir: str) -> pa.Table:
    """Column-level data-quality profile of PROFILE_TABLE: per column
    the row count, null count, EXACT distinct count, and min/max
    (numeric columns in ``min_num``/``max_num`` — timestamps as epoch
    microseconds — strings in ``min_str``/``max_str``).

    Scale shape: two streamed scans. (1) The stats leg collapses each
    batch to ONE row per column (vectorized ``pc.min_max`` /
    null_count) and combines with a tiny per-column shuffle. (2) The
    distinct leg canonicalizes every value to its injective string
    form (Arrow shortest-roundtrip for floats, epoch us for
    timestamps), dedups per batch, dedups globally via ONE
    hash_grouped_aggregate routed by a vectorized surrogate hash
    (``pd.util.hash_array`` — no per-row Python md5), and counts per
    column. Exact distinct over 100 TB is inherently a value-level
    shuffle; everything around it is map-side-combined. The final
    merge touches 11 rows on the driver."""
    import numpy as np

    from snowball_java_ray.constants import PROFILE_COLUMNS, PROFILE_TABLE
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate
    from snowball_java_ray.pipelines.api import collect_arrow

    cols = [c for c, _ in PROFILE_COLUMNS]

    def batch_stats(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "column_name": [], "n_rows": [], "n_nulls": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
        }
        for name, kind in PROFILE_COLUMNS:
            col = t[name]
            out["column_name"].append(name)
            out["n_rows"].append(len(col))
            out["n_nulls"].append(col.null_count)
            if kind == "str":
                mm = pc.min_max(col)
                out["min_num"].append(None)
                out["max_num"].append(None)
                out["min_str"].append(mm["min"].as_py())
                out["max_str"].append(mm["max"].as_py())
            else:
                if kind == "ts":
                    col = col.cast(pa.int64())
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                out["min_num"].append(None if lo is None else float(lo))
                out["max_num"].append(None if hi is None else float(hi))
                out["min_str"].append(None)
                out["max_str"].append(None)
        return pa.table(
            {
                "column_name": pa.array(out["column_name"]),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_nulls": pa.array(out["n_nulls"], pa.int64()),
                "min_num": pa.array(out["min_num"], pa.float64()),
                "max_num": pa.array(out["max_num"], pa.float64()),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
            }
        )

    stats = collect_arrow(
        hash_grouped_aggregate(
            _read(sf_dir, PROFILE_TABLE, cols).map_batches(
                batch_stats, batch_format="pyarrow"
            ),
            ["column_name"],
            [
                ("n_rows", "sum", "n_rows"),
                ("n_nulls", "sum", "n_nulls"),
                ("min_num", "min", "min_num"),
                ("max_num", "max", "max_num"),
                ("min_str", "min", "min_str"),
                ("max_str", "max", "max_str"),
            ],
        )
    ).to_pandas()

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for name, kind in PROFILE_COLUMNS:
            col = t[name]
            if kind == "ts":
                col = col.cast(pa.int64())
            u = pc.unique(pc.cast(col, pa.string()).drop_null())
            parts.append(
                pa.table(
                    {
                        "column_name": pa.array(
                            [name] * len(u), pa.string()
                        ),
                        "val": u,
                    }
                )
            )
        out = pa.concat_tables(parts)
        h = pd.util.hash_array(
            out["val"].to_numpy(zero_copy_only=False)
        ).astype("int64")
        return out.append_column("val_h", pa.array(h, pa.int64()))

    from snowball_java_ray.ops.dedup import join_partitions

    # measured: the value shuffle is object-count-bound, not
    # key-width-bound — 16 partitions beat 64 2.2x at sf0.1 (each map
    # task emits P slices; the per-partition Arrow group_by is cheap
    # either way). At cluster scale P grows with total cores via
    # join_partitions' CPU cap.
    distinct_vals = hash_grouped_aggregate(
        _read(sf_dir, PROFILE_TABLE, cols).map_batches(
            explode, batch_format="pyarrow"
        ),
        ["column_name", "val"],
        [("", "count_all", "n")],
        num_parts=join_partitions(16),
        hash_keys=["val_h"],
    )

    def count_part(t: pa.Table) -> pa.Table:
        out = t.group_by(["column_name"]).aggregate([([], "count_all")])
        return out.rename_columns(["column_name", "n_distinct"])

    nd = (
        collect_arrow(
            distinct_vals.map_batches(count_part, batch_format="pyarrow")
        )
        .to_pandas()
        .groupby("column_name", as_index=False)["n_distinct"]
        .sum()
    )

    merged = stats.merge(nd, on="column_name", how="left")
    merged["n_distinct"] = (
        merged["n_distinct"].fillna(0).astype("int64")
    )
    merged = merged[
        ["column_name", "n_rows", "n_nulls", "n_distinct",
         "min_num", "max_num", "min_str", "max_str"]
    ].sort_values("column_name")
    return pa.Table.from_pandas(merged, preserve_index=False)


def orders_histogram(sf_dir: str) -> ray.data.Dataset:
    """Fixed-width histogram of order totals: bucket =
    floor(o_totalprice / ORDER_HIST_WIDTH), with count and exact-cents
    revenue per bucket. Map-side Arrow group_by partials (at most
    n_buckets rows leave each batch), one tiny shuffle."""
    import numpy as np

    from snowball_java_ray.constants import ORDER_HIST_WIDTH
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        x = t["o_totalprice"].to_numpy(zero_copy_only=False)
        bucket = np.floor(x / ORDER_HIST_WIDTH).astype(np.int64)
        cents = np.floor(x * 100.0 + 0.5).astype(np.int64)
        flat = pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "n": pa.array(np.ones(len(t), np.int64)),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        out = flat.group_by(["bucket"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )
        return out.rename_columns(["bucket", "n", "cents"])

    agg = hash_grouped_aggregate(
        _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["bucket"],
        [("n", "sum", "n"), ("cents", "sum", "cents")],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": t["bucket"],
                "n": t["n"],
                "total_value": pc.divide(
                    pc.cast(t["cents"], pa.float64()), pa.scalar(100.0)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("bucket")


def similar_users(sf_dir: str) -> pa.Table:
    """User-similarity search over DERIVED features: each user's
    event-type count vector (the events_pivot features), probed by
    cosine for the SIMILAR_USERS_PROBES lowest-id users — the
    feature-engineering -> similarity composition (profile once, then
    ANN-style brute scoring against broadcast probes).

    Scale shape: the pivot is the same map-side-combined single
    shuffle as events_pivot; probe vectors are O(probes x dims) and
    ship once; scoring is one streamed pass with per-batch partial
    top-k per probe (O(blocks x probes x k) driver merge — the
    ann_topk pattern). Determinism: integer dot/norms, one double
    division, round-9 rank / round-6 emit."""
    import numpy as np

    from snowball_java_ray.constants import (
        PIVOT_EVENT_TYPES,
        RANK_ROUND_DECIMALS,
        SCORE_ROUND_DECIMALS,
        SIMILAR_USERS_K,
        SIMILAR_USERS_PROBES,
    )
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        cols: dict[str, pa.Array] = {"user_id": t["user_id"]}
        for ty in PIVOT_EVENT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(et, ty), pa.int64())
        flat = pa.table(cols)
        out = flat.group_by(["user_id"]).aggregate(
            [(f"n_{ty}", "sum") for ty in PIVOT_EVENT_TYPES]
        )
        return out.rename_columns(
            [n[:-4] if n.endswith("_sum") else n for n in out.schema.names]
        )

    piv = hash_grouped_aggregate(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id"],
        [(f"n_{ty}", "sum", f"n_{ty}") for ty in PIVOT_EVENT_TYPES],
    ).materialize()

    dims = [f"n_{ty}" for ty in PIVOT_EVENT_TYPES]

    def vecs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = t["user_id"].to_numpy(zero_copy_only=False)
        m = np.stack(
            [t[d].to_numpy(zero_copy_only=False) for d in dims], axis=1
        ).astype(np.int64)
        return ids, m

    import ray as _ray

    probe_tbl = pa.concat_tables(
        piv.map_batches(
            lambda t: t.filter(
                pc.less(t["user_id"], SIMILAR_USERS_PROBES)
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default",
    )
    p_ids, p_m = vecs(probe_tbl.sort_by("user_id"))
    probes_ref = _ray.put((p_ids, p_m))

    def score(t: pa.Table) -> pa.Table:
        import ray

        pids, pm = ray.get(probes_ref)
        ids, m = vecs(t)
        dot = m @ pm.T  # int64 exact
        a2 = (m * m).sum(axis=1)
        b2 = (pm * pm).sum(axis=1)
        cos = dot.astype(np.float64) / (
            np.sqrt(a2.astype(np.float64))[:, None]
            * np.sqrt(b2.astype(np.float64))[None, :]
        )
        out = {"probe_user": [], "user_id": [], "cos": []}
        for j, pu in enumerate(pids):
            mask = ids != pu
            v, s = ids[mask], cos[mask, j]
            order = np.lexsort((v, -np.round(s, RANK_ROUND_DECIMALS)))
            order = order[:SIMILAR_USERS_K]
            out["probe_user"].extend([int(pu)] * order.size)
            out["user_id"].extend(v[order].tolist())
            out["cos"].extend(s[order].tolist())
        return pa.table(
            {
                "probe_user": pa.array(out["probe_user"], pa.int64()),
                "user_id": pa.array(out["user_id"], pa.int64()),
                "cos": pa.array(out["cos"], pa.float64()),
            }
        )

    cand = pa.concat_tables(
        piv.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ),
        promote_options="default",
    )
    out = {"probe_user": [], "rank": [], "user_id": [], "cos": []}
    for pu in sorted(set(cand["probe_user"].to_pylist())):
        sub = cand.filter(pc.equal(cand["probe_user"], pu))
        v = sub["user_id"].to_numpy(zero_copy_only=False)
        s = sub["cos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -np.round(s, RANK_ROUND_DECIMALS)))
        order = order[:SIMILAR_USERS_K]
        out["probe_user"].extend([int(pu)] * order.size)
        out["rank"].extend(range(1, order.size + 1))
        out["user_id"].extend(v[order].tolist())
        out["cos"].extend(
            np.round(s[order], SCORE_ROUND_DECIMALS).tolist()
        )
    return pa.table(
        {
            "probe_user": pa.array(out["probe_user"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int32()),
            "user_id": pa.array(out["user_id"], pa.int64()),
            "cos": pa.array(out["cos"], pa.float64()),
        }
    )


def event_pattern_match(sf_dir: str) -> ray.data.Dataset:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite / CEP):
    each user's event stream, ordered by (ts, event_id), collapses to
    a string of event-type initials; EVENT_PATTERN counts
    non-overlapping regex matches (signup then any clicks/views then
    purchase). Emits (user_id, n_events, n_matches) for users with at
    least one match.

    Scale shape: one user-hash shuffle; each partition sorts once by
    (user_id, ts, event_id) and builds every user's sequence with a
    pandas C-level groupby join (users-per-partition bounded, no
    driver gather); both engines run the same RE2-class pattern
    (Python re / DuckDB regexp_extract_all are equivalent for this
    alphabet)."""
    import re

    import numpy as np

    from snowball_java_ray.constants import EVENT_PATTERN
    from snowball_java_ray.ops.dedup import join_partitions

    P = join_partitions(64)
    pat = re.compile(EVENT_PATTERN)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "ts": g["ts"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ini": g["event_type"].str[0].to_numpy(),
            }
        ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        seq = g.groupby("user_id", sort=True)["ini"].agg("".join)
        out = pd.DataFrame(
            {
                "user_id": seq.index.to_numpy(),
                "n_events": seq.str.len().to_numpy().astype("int64"),
                "n_matches": np.array(
                    [len(pat.findall(s)) for s in seq], dtype="int64"
                ),
            }
        )
        return out[out["n_matches"] > 0]

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(match, batch_format="pandas")
        .sort("user_id")
    )


def key_skew_report(sf_dir: str) -> pa.Table:
    """Key-skew audit across the configured (table, key) pairs — the
    report an engine reads BEFORE planning a join or shuffle: key
    cardinality, the heaviest key, and skew = max_count * n_keys /
    n_rows (1.0 = uniform).

    Scale shape: per pair, one column-pruned scan with per-batch Arrow
    group_by partials into ONE hash_grouped_aggregate (key-cardinality
    bounded); the final max/argmax/count reduce works on per-block
    partial rows (O(blocks) driver traffic). Keys canonicalize to
    strings (injective) so one report schema serves every type."""
    import numpy as np

    from snowball_java_ray.constants import SKEW_KEYS
    from snowball_java_ray.ops.dedup import hash_grouped_aggregate
    from snowball_java_ray.pipelines.api import collect_arrow

    rows = {
        "key_name": [], "n_rows": [], "n_keys": [],
        "max_count": [], "hot_key": [], "skew": [],
    }
    for table, key in SKEW_KEYS:
        def partial(t: pa.Table, key=key) -> pa.Table:
            ks = pc.cast(t[key], pa.string())
            out = pa.table({"ks": ks}).group_by(["ks"]).aggregate(
                [([], "count_all")]
            )
            return out.rename_columns(["ks", "cnt"])

        agg = hash_grouped_aggregate(
            _read(sf_dir, table, [key]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["ks"],
            [("cnt", "sum", "cnt")],
        )

        def reduce_part(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy(zero_copy_only=False)
            mx = int(cnt.max())
            at = t.filter(pc.equal(t["cnt"], mx))
            hot = pc.min(at["ks"]).as_py()
            return pa.table(
                {
                    "n_keys": pa.array([len(t)], pa.int64()),
                    "n_rows": pa.array([int(cnt.sum())], pa.int64()),
                    "max_count": pa.array([mx], pa.int64()),
                    "hot_key": pa.array([hot], pa.string()),
                }
            )

        parts = collect_arrow(
            agg.map_batches(reduce_part, batch_format="pyarrow")
        ).to_pandas()
        gmax = int(parts["max_count"].max())
        hot = parts.loc[parts["max_count"] == gmax, "hot_key"].min()
        n_rows = int(parts["n_rows"].sum())
        n_keys = int(parts["n_keys"].sum())
        rows["key_name"].append(f"{table}.{key}")
        rows["n_rows"].append(n_rows)
        rows["n_keys"].append(n_keys)
        rows["max_count"].append(gmax)
        rows["hot_key"].append(hot)
        rows["skew"].append(
            round((gmax * n_keys) * 1.0 / n_rows, 6)
        )
    tbl = pa.table(
        {
            "key_name": pa.array(rows["key_name"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_keys": pa.array(rows["n_keys"], pa.int64()),
            "max_count": pa.array(rows["max_count"], pa.int64()),
            "hot_key": pa.array(rows["hot_key"], pa.string()),
            "skew": pa.array(rows["skew"], pa.float64()),
        }
    )
    return tbl.sort_by("key_name")


def events_rollup(sf_dir: str) -> pa.Table:
    """Hierarchical aggregation (GROUP BY ROLLUP): revenue and counts
    at (event_type, day), (event_type) and grand-total levels — the
    OLAP rollup shape. The base level is the only corpus-sized work
    (map-side Arrow partials, ONE shuffle, exact integer cents); the
    super-aggregate levels re-reduce the (types x days)-bounded base
    table, which is driver-sized by construction."""
    import numpy as np

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate
    from snowball_java_ray.pipelines.api import collect_arrow

    def partial(t: pa.Table) -> pa.Table:
        day = pc.utf8_slice_codeunits(
            pc.strftime(
                pc.floor_temporal(t["ts"], unit="day"),
                format="%Y-%m-%d",
            ),
            0, 10,
        )
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        flat = pa.table(
            {
                "event_type": t["event_type"],
                "day": day,
                "n": pa.array(np.ones(len(t), np.int64)),
                "cents": cents,
            }
        )
        out = flat.group_by(["event_type", "day"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )
        return out.rename_columns(["event_type", "day", "n", "cents"])

    base = collect_arrow(
        hash_grouped_aggregate(
            _read(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pyarrow"),
            ["event_type", "day"],
            [("n", "sum", "n"), ("cents", "sum", "cents")],
        )
    ).to_pandas()

    lvl1 = (
        base.groupby("event_type", as_index=False)[["n", "cents"]]
        .sum()
        .assign(day=None)
    )
    total = pd.DataFrame(
        {
            "event_type": [None],
            "day": [None],
            "n": [base["n"].sum()],
            "cents": [base["cents"].sum()],
        }
    )
    out = pd.concat(
        [base, lvl1, total], ignore_index=True
    )[["event_type", "day", "n", "cents"]]
    out["total_value"] = out.pop("cents").astype("float64") / 100.0
    out = out.sort_values(
        ["event_type", "day"], na_position="last"
    ).reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
            "total_value": pa.array(
                out["total_value"].to_numpy(), pa.float64()
            ),
        }
    )


def top_sessions(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Global top-k sessions by revenue: sessionize (the same
    partition-level gaps-and-islands as events_sessions), aggregate
    each session in exact integer cents, keep each partition's local
    top-k and merge the O(partitions x k) candidates on the driver —
    sessions are partition-complete (user-hash partitioning), so the
    local cut is exact."""
    import numpy as np

    from snowball_java_ray.constants import TOP_K
    from snowball_java_ray.ops.dedup import join_partitions
    from snowball_java_ray.pipelines.api import collect_arrow

    P = join_partitions(64)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype("uint64")
        part = (uid * 1099511628211 % P).astype("int64")
        return t.append_column("__part", pa.array(part))

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        new_session = new_user | gap
        gsid = new_session.cumsum()
        first_of_user = gsid.where(new_user).ffill()
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        agg = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "session_id": (gsid - first_of_user).astype("int64")
                    .to_numpy(),
                    "cents": cents,
                    "__gsid": gsid.to_numpy(),
                }
            )
            .groupby("__gsid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_id=("session_id", "first"),
                n_events=("cents", "size"),
                cents=("cents", "sum"),
            )
            .reset_index(drop=True)
        )
        agg = agg.sort_values(
            ["cents", "user_id", "session_id"],
            ascending=[False, True, True],
        ).head(TOP_K)
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    cand = collect_arrow(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(local_topk, batch_format="pandas")
    ).to_pandas()
    cand = cand.sort_values(
        ["cents", "user_id", "session_id"], ascending=[False, True, True]
    ).head(TOP_K)
    out = pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(cand) + 1, dtype=np.int32)
            ),
            "user_id": pa.array(cand["user_id"].to_numpy(), pa.int64()),
            "session_id": pa.array(
                cand["session_id"].to_numpy(), pa.int64()
            ),
            "n_events": pa.array(cand["n_events"].to_numpy(), pa.int64()),
            "total_value": pa.array(
                cand["cents"].to_numpy().astype("float64") / 100.0,
                pa.float64(),
            ),
        }
    )
    return out


def events_regression(sf_dir: str) -> pa.Table:
    """Distributed least-squares: revenue (cents) regressed on
    hour-of-day — the statistical-aggregate operator shape. All five
    sufficient statistics (n, Sx, Sy, Sxy, Sxx) are EXACT integer
    sums (x is a small int, y is exact cents), accumulated map-side
    per batch and reduced as Python arbitrary-precision ints on the
    driver, so there is NO float summation anywhere; slope and
    intercept are single divisions of exact integers — bit-identical
    to the oracle's HUGEINT arithmetic. (At 10^12 rows the int64
    per-batch partials still fit; the driver reduce is unbounded
    precision.)"""
    import numpy as np

    from snowball_java_ray.pipelines.api import collect_arrow

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]")
        hour = (
            (ts.astype("int64") // 3_600_000_000) % 24
        ).astype(np.int64)
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "sx": pa.array([int(hour.sum())], pa.int64()),
                "sy": pa.array([int(cents.sum())], pa.int64()),
                "sxy": pa.array([int((hour * cents).sum())], pa.int64()),
                "sxx": pa.array([int((hour * hour).sum())], pa.int64()),
            }
        )

    parts = collect_arrow(
        _read(sf_dir, "events", ["ts", "value"]).map_batches(
            partial, batch_format="pyarrow"
        )
    ).to_pandas()
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sy = int(parts["sy"].sum())
    sxy = int(parts["sxy"].sum())
    sxx = int(parts["sxx"].sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    # boundary-proof floor quantizer on the SCORE_GRID, identical
    # expression in the oracle (see constants.SCORE_GRID for the
    # half-mode rationale — self-review r5)
    import math

    from snowball_java_ray.constants import SCORE_GRID

    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "slope": pa.array(
                [math.floor(slope * SCORE_GRID + 0.5) / SCORE_GRID],
                pa.float64(),
            ),
            "intercept": pa.array(
                [math.floor(intercept * SCORE_GRID + 0.5) / SCORE_GRID],
                pa.float64(),
            ),
        }
    )


def corr_matrix(sf_dir: str) -> pa.Table:
    """Pairwise Pearson correlation over the configured lineitem
    columns — the data-profiling correlation audit. Every sufficient
    statistic (n, Sx, Sy, Sxy, Sxx, Syy per pair) is an EXACT integer
    sum over quantized values, combined map-side per batch and reduced
    with arbitrary-precision Python ints — no float summation; the
    correlation itself is a handful of float ops on exact integers,
    mirrored verbatim by the HUGEINT oracle."""
    import math

    import numpy as np

    from snowball_java_ray.constants import CORR_COLUMNS, SCORE_GRID
    from snowball_java_ray.pipelines.api import collect_arrow

    cols = [c for c, _ in CORR_COLUMNS]
    scales = {c: s for c, s in CORR_COLUMNS}
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]

    # int64 product sums overflow once |value*scale| ~ 1e7 and a batch
    # holds >~10^5 rows (observed at sf0.1: extendedprice^2 sums pass
    # 2^63) — accumulate sub-chunks of CHUNK rows as exact int64 and
    # combine them as Python arbitrary-precision ints. Output partials
    # are emitted as STRINGS so no downstream int64 cast can wrap.
    CHUNK = 30_000

    def exact_sum(v: np.ndarray) -> int:
        return sum(
            int(v[i : i + CHUNK].sum()) for i in range(0, v.size, CHUNK)
        )

    def partial(t: pa.Table) -> pa.Table:
        q = {
            c: np.round(
                t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                * scales[c]
            ).astype(np.int64)
            for c in cols
        }
        out = {"col_a": [], "col_b": [], "n": [], "sx": [], "sy": [],
               "sxy": [], "sxx": [], "syy": []}
        for a, b in pairs:
            xa, xb = q[a], q[b]
            out["col_a"].append(a)
            out["col_b"].append(b)
            out["n"].append(len(xa))
            out["sx"].append(str(exact_sum(xa)))
            out["sy"].append(str(exact_sum(xb)))
            out["sxy"].append(str(exact_sum(xa * xb)))
            out["sxx"].append(str(exact_sum(xa * xa)))
            out["syy"].append(str(exact_sum(xb * xb)))
        return pa.table(
            {
                "col_a": pa.array(out["col_a"], pa.string()),
                "col_b": pa.array(out["col_b"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "sx": pa.array(out["sx"], pa.string()),
                "sy": pa.array(out["sy"], pa.string()),
                "sxy": pa.array(out["sxy"], pa.string()),
                "sxx": pa.array(out["sxx"], pa.string()),
                "syy": pa.array(out["syy"], pa.string()),
            }
        )

    parts = collect_arrow(
        _read(sf_dir, "lineitem", cols).map_batches(
            partial, batch_format="pyarrow"
        )
    ).to_pandas()
    rows = {"col_a": [], "col_b": [], "corr": []}
    for a, b in pairs:
        g = parts[(parts["col_a"] == a) & (parts["col_b"] == b)]
        n = int(g["n"].sum())
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        num = n * sxy - sx * sy
        corr = float(num) / (
            math.sqrt(float(n * sxx - sx * sx))
            * math.sqrt(float(n * syy - sy * sy))
        )
        rows["col_a"].append(a)
        rows["col_b"].append(b)
        # published on the SCORE_GRID via the boundary-proof floor
        # quantizer (identical expression in the oracle; see
        # constants.SCORE_GRID — self-review r5)
        rows["corr"].append(
            math.floor(corr * SCORE_GRID + 0.5) / SCORE_GRID
        )
    tbl = pa.table(
        {
            "col_a": pa.array(rows["col_a"], pa.string()),
            "col_b": pa.array(rows["col_b"], pa.string()),
            "corr": pa.array(rows["corr"], pa.float64()),
        }
    )
    return tbl.sort_by([("col_a", "ascending"), ("col_b", "ascending")])


def nation_revenue_share(sf_dir: str) -> pa.Table:
    """Share-of-total report (the ratio_to_report window shape):
    each nation's order revenue as an exact-cents sum and its share
    of the global total — one broadcast dim probe (customer -> nation
    is dimension-sized), map-side cents partials, ONE tiny shuffle,
    and a single exact division per row against the grand total."""
    import numpy as np

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate
    from snowball_java_ray.pipelines.api import collect_arrow

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cmap = dict(
        zip(
            cust["c_custkey"].to_pylist(),
            cust["c_nationkey"].to_pylist(),
        )
    )
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        nk = np.array([cmap[int(k)] for k in keys], np.int64)
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        flat = pa.table(
            {
                "n_nationkey": pa.array(nk, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        out = flat.group_by(["n_nationkey"]).aggregate([("cents", "sum")])
        return out.rename_columns(["n_nationkey", "cents"])

    agg = collect_arrow(
        hash_grouped_aggregate(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow"),
            ["n_nationkey"],
            [("cents", "sum", "cents")],
        )
    ).to_pandas()
    total = int(agg["cents"].sum())
    agg["n_name"] = [nmap[int(k)] for k in agg["n_nationkey"]]
    agg["revenue"] = agg["cents"].astype("float64") / 100.0
    # 6-dp floor quantizer, mirrored verbatim in the oracle
    agg["share"] = np.floor(
        agg["cents"].to_numpy().astype("float64") / float(total) * 1e6
        + 0.5
    ) / 1e6
    agg = agg.sort_values("n_name").reset_index(drop=True)
    return pa.table(
        {
            "n_name": pa.array(agg["n_name"], pa.string()),
            "revenue": pa.array(agg["revenue"].to_numpy(), pa.float64()),
            "share": pa.array(agg["share"].to_numpy(), pa.float64()),
        }
    )
