"""Explicit partitioned hash join — the portable large-large join.

``Dataset.join`` exists in this Ray version, but the portable pattern
(ray_guide "Joins and lookups") is spelled out here as a first-class
operator: add ``bucket = hash(key) % B`` to both sides, group both by
bucket, and join matching buckets pairwise inside ``map_groups``. The
bucket count B bounds per-task memory; hot keys can be salted into
sub-buckets (parameter ``salt``) — each salted copy of the build side
joins a disjoint slice of the probe side.

Used as: join orders x customer without broadcasting either side, and
validated against both the broadcast join and DuckDB."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _bucket_of(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic vectorized bucket hash. Bucket identity never
    surfaces in results (the union of per-bucket joins is the same
    row set under ANY hash), so the contract is that EQUAL KEYS on
    the two sides hash equally; ``pd.util.hash_array`` (fixed-key
    siphash, stable across processes/runs) replaces the r3 per-row
    md5 Python loop — that loop ran once per joined row on both
    sides and was the joins' hottest scalar code. hash_array is
    dtype-sensitive (int32(-5) and int64(-5) hash differently), so
    keys are normalized to a canonical width first — without this, a
    join whose sides carry the same values at different widths would
    silently bucket them apart and drop matching rows."""
    if values.dtype.kind in "iu":
        values = values.astype(np.int64, copy=False)
    elif values.dtype.kind == "f":
        values = values.astype(np.float64, copy=False)
        # hash_array hashes BIT PATTERNS, but join equality is value
        # equality: -0.0 == 0.0 yet their patterns hash apart, which
        # would silently bucket matching rows into different groups
        # and drop pairs. Canonicalize the zero. (NaN keys are out of
        # contract for join keys — NaN equals nothing either way.)
        values = np.where(values == 0.0, 0.0, values)
    h = pd.util.hash_array(values, categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    n_buckets: int = 16,
    salt: int = 1,
    salt_on: str | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Hash-partitioned join (``join_type``: "inner" or "left outer").
    Unlike Ray's native hash-shuffle ``Dataset.join`` — which raises
    ArrowInvalid when a partition's right side comes up EMPTY and
    schema-less (observed at sf0.001 in curated_corpus) — the
    schema-capture + null-fill below makes one-sided buckets
    well-defined for every join type. Both sides are tagged
    with a bucket column and a side marker (the right side's data
    columns are ``__r__``-prefixed so the union schema is disjoint and
    each side is recoverable without guessing), unioned, grouped by
    bucket, and merged per bucket with an Arrow (Acero) hash join —
    the r3 pandas merge upcast int64→float64 on empty sides, which
    forced compensating casts downstream (VERDICT r3 item 6). One
    shuffle total (the groupby); no side is broadcast or materialized
    whole.

    Hot-key salting (``salt`` > 1): the LEFT (probe/fact) side spreads
    each key's rows across ``salt`` sub-buckets by hashing a second,
    row-varying column ``salt_on``; the RIGHT (build/dim) side
    replicates each row into all ``salt`` sub-buckets. Result identity
    is exact (each probe row still meets every matching build row,
    exactly once); per-task work for a hot key drops by ~salt."""
    assert salt == 1 or salt_on is not None, "salting needs a salt_on column"

    # Capture both sides' schemas up front: a bucket whose rows all
    # came from one side yields a group table WITHOUT the other
    # side's columns (Ray's union does not widen per-group blocks),
    # so join_bucket null-fills from this expected schema before
    # joining — otherwise the join raises on the missing key and the
    # output schema would vary per bucket.
    lsch = left.schema()
    rsch = right.schema()
    expected = [(n, t) for n, t in zip(lsch.names, lsch.types)] + [
        (f"__r__{n}", t) for n, t in zip(rsch.names, rsch.types)
    ]

    def tag_left(t: pa.Table) -> pa.Table:
        keys = t[left_on].to_numpy(zero_copy_only=False)
        b = _bucket_of(keys, n_buckets)
        if salt > 1:
            sub = _bucket_of(
                t[salt_on].to_numpy(zero_copy_only=False), salt
            )
            b = b * salt + sub
        t = t.append_column("__bucket", pa.array(b, pa.int64()))
        return t.append_column("__side", pa.array(["l"] * len(t)))

    def tag_right(t: pa.Table) -> pa.Table:
        keys = t[right_on].to_numpy(zero_copy_only=False)
        b = _bucket_of(keys, n_buckets)
        t = t.rename_columns([f"__r__{c}" for c in t.column_names])
        if salt > 1:
            reps = []
            for s in range(salt):
                reps.append(
                    t.append_column(
                        "__bucket", pa.array(b * salt + s, pa.int64())
                    ).append_column("__side", pa.array(["r"] * len(t)))
                )
            return pa.concat_tables(reps)
        t = t.append_column("__bucket", pa.array(b, pa.int64()))
        return t.append_column("__side", pa.array(["r"] * len(t)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for name, typ in expected:
            if name not in g.column_names:
                g = g.append_column(name, pa.nulls(g.num_rows, typ))
        is_l = pc.equal(g["__side"], "l")
        lcols = [n for n, _ in expected if not n.startswith("__r__")]
        rcols = [n for n, _ in expected if n.startswith("__r__")]
        lg = g.filter(is_l).select(lcols)
        rg = g.filter(pc.invert(is_l)).select(rcols)
        rg = rg.rename_columns([c[len("__r__"):] for c in rcols])
        # Match marker for the restored-right-key fixup below: every
        # genuine right row carries true, so after an outer join a
        # null marker identifies an UNMATCHED left row — whose right
        # key must be NULL, not a copy of the left key.
        restore_key = right_on != left_on
        if restore_key and join_type != "inner":
            rg = rg.append_column(
                "__m__", pa.array(np.ones(len(rg), dtype=bool))
            )
        # use_threads=False pins the join's output row order — Acero's
        # threaded hash join emits rows in a nondeterministic order,
        # and the engine's determinism contract is byte-identical
        # reruns (per-bucket input is already one task's work; stage
        # parallelism comes from the bucket fan-out, not intra-join
        # threads)
        out = lg.join(
            rg,
            keys=[left_on],
            right_keys=[right_on],
            join_type=join_type,
            right_suffix="_r",
            use_threads=False,
        )
        # Acero coalesces a differently-named right key away; the
        # pandas contract kept both — restore it for consumers that
        # select by the right-side name. On outer joins the restored
        # key is the left key masked by the match marker (NULL where
        # no right row matched), matching pandas-merge semantics.
        if restore_key and right_on not in out.column_names:
            if join_type == "inner":
                out = out.append_column(right_on, out[left_on])
            else:
                key_typ = out.schema.field(left_on).type
                restored = pc.if_else(
                    pc.is_valid(out["__m__"]),
                    out[left_on].combine_chunks(),
                    pa.scalar(None, type=key_typ),
                )
                out = out.append_column(right_on, restored)
        if "__m__" in out.column_names:
            out = out.drop_columns(["__m__"])
        return out

    return lt.union(rt).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def customer_order_totals(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer via the bucketed join, then grouped totals —
    same result as the broadcast-join top_customers pipeline but with
    the large-large machinery (exact-cents arithmetic for the oracle)."""
    import pyarrow.compute as pc

    from snowball_java_ray.ops.dedup import hash_grouped_aggregate

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    joined = bucketed_hash_join(orders, customer, "o_custkey", "c_custkey")

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "price_c": pc.cast(
                    pc.floor(
                        pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)
                    ), pa.int64()
                ),
            }
        )

    # one group per customer — the vectorized aggregate path
    agg = hash_grouped_aggregate(
        joined.map_batches(cents, batch_format="pyarrow"),
        ["c_custkey"],
        [("price_c", "sum", "price_c"), ("", "count_all", "n_orders")],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "total_value": pc.divide(
                    pc.cast(t["price_c"], pa.float64()), 100.0
                ),
                "n_orders": t["n_orders"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("c_custkey")
