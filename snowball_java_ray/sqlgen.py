"""DuckDB oracle-SQL generation from the engine's own constants.

Every SQL string the driver runs as an oracle is generated here from
the SAME constants (tokenizer regexes, stopwords, BM25 parameters,
reference query set) that the Ray engine executes — the engine and its
oracle cannot drift.

The tokenizer CTE mirrors functions/text.py exactly:
lowercase -> split on non-[a-z0-9] runs -> drop empty -> drop pure
numbers -> drop stopwords (semantics from
/root/reference/snowball/src/vsm/TermsVector.java:16-36).
"""

from __future__ import annotations

from snowball_java_ray.constants import (
    BM25_B,
    BM25_K1,
    RANK_ROUND_DECIMALS,
    REFERENCE_QUERIES,
    SCORE_ROUND_DECIMALS,
    STOPWORDS,
    TOKEN_SPLIT_PATTERN,
    TOP_K,
)

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
# regexp_full_match implies anchoring; keep the bare digit class.
_NUM_SQL = "[0-9]+"

# Produces CTEs `toks_raw` and `toks(doc_id, term)` — one row per
# surviving token occurrence (multiplicity preserved, for tf/cf).
SQL_TOKENIZE_CTE = (
    "toks_raw AS (\n"
    "  SELECT {id_col} AS doc_id,\n"
    f"         unnest(string_split_regex(lower({{text_col}}), '{TOKEN_SPLIT_PATTERN}')) AS term\n"
    "  FROM {table}\n"
    "),\n"
    "toks AS (\n"
    "  SELECT doc_id, term FROM toks_raw\n"
    f"  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')\n"
    f"    AND term NOT IN ({_STOPLIST_SQL})\n"
    ")"
)


def grid6(expr: str) -> str:
    """The published-float grid quantizer, SQL side: renders
    floor((expr) * SCORE_GRID + 0.5) / SCORE_GRID — the ONE expression
    both engines evaluate for published floats (constants.SCORE_GRID
    docstring has the half-mode rationale)."""
    from snowball_java_ray.constants import SCORE_GRID

    return f"floor(({expr}) * {SCORE_GRID} + 0.5) / {SCORE_GRID}"


def tokenize_cte(table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    return SQL_TOKENIZE_CTE.format(table=table, id_col=id_col, text_col=text_col)


def queries_values_sql() -> str:
    """The reference query set as a VALUES relation (query_id, qtext)."""
    rows = ", ".join(
        "({}, '{}')".format(i, q.replace("'", "''"))
        for i, q in enumerate(REFERENCE_QUERIES)
    )
    return f"(VALUES {rows}) AS q(query_id, qtext)"


def term_df_sql() -> str:
    """Dictionary: term -> document frequency + collection frequency
    (mirrors terms.txt, vsm/VectorSpaceModel.java:56-61)."""
    return f"""
WITH {tokenize_cte()}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM toks GROUP BY term ORDER BY term
"""


def term_topk_df_sql(k: int = 10) -> str:
    return f"""
WITH {tokenize_cte()},
d AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
      FROM toks GROUP BY term)
SELECT term, df, cf FROM d ORDER BY df DESC, term ASC LIMIT {k}
"""


def doc_stats_sql() -> str:
    """Per-doc stats incl. the sha256 end-to-end invariant."""
    return f"""
WITH {tokenize_cte()},
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id)
SELECT d.doc_id, sha256(d.text) AS content_sha256,
       coalesce(dl.doc_len, 0) AS doc_len
FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id
ORDER BY d.doc_id
"""


def index_meta_sql() -> str:
    return f"""
WITH {tokenize_cte()},
dl AS (SELECT d.doc_id, count(t.term) AS doc_len
       FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id
       GROUP BY d.doc_id)
SELECT count(*) AS n_docs,
       round(avg(doc_len), {SCORE_ROUND_DECIMALS}) AS avgdl,
       CAST(sum(doc_len) AS BIGINT) AS total_terms
FROM dl
"""


def ingest_corpus_sql() -> str:
    """The documents -> input_hint corpus mapping (pipelines/api.py
    documents_as_corpus), incl. the content_sha256 invariant."""
    return """
SELECT doc_id,
       'org/' || source AS repo,
       'docs/' || CAST(doc_id AS VARCHAR) AS path,
       substr(sha256(text), 1, 40) AS "commit",
       lang,
       text AS content,
       sha256(text) AS content_sha256
FROM documents ORDER BY doc_id
"""


# --- relational family (ops/relational.py) ---------------------------


def q1_pricing_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_base_price,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000
         AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def nation_region_counts_sql() -> str:
    return """
SELECT r.r_name, n.n_name,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
"""


def order_revenue_by_priority_sql() -> str:
    return """
WITH per_order AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev4
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(p.rev4) AS DOUBLE) / 10000 AS revenue
FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def top_customers_sql() -> str:
    return """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_value,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_value DESC, c.c_custkey ASC
LIMIT 10
"""


def q3_shipping_sql() -> str:
    """Shipping-priority report (ops/relational.q3_shipping — the
    TPC-H Q3 shape), exact-cents revenue arithmetic."""
    from snowball_java_ray.constants import Q3_CUTOFF, Q3_SEGMENT, Q3_TOP_K

    return f"""
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{Q3_SEGMENT}'
),
o AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
),
l AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
),
j AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         sum(l.rev4) AS rev4
  FROM c
  JOIN o ON o.o_custkey = c.c_custkey
  JOIN l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       rev4 / 10000.0 AS revenue, o_orderdate, o_orderpriority
FROM j ORDER BY rev4 DESC, o_orderkey ASC LIMIT {Q3_TOP_K}
"""


def q5_region_revenue_sql() -> str:
    """Local-supplier revenue (ops/relational.q5_region_revenue — the
    TPC-H Q5 shape), exact-cents arithmetic, revenue-desc order with
    the nation name tiebreak."""
    from snowball_java_ray.constants import (
        Q5_DATE_FROM,
        Q5_DATE_TO,
        Q5_REGION,
    )

    return f"""
WITH j AS (
  SELECT n.n_name,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev4
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                 AND s.s_nationkey = c.c_nationkey
  WHERE r.r_name = '{Q5_REGION}'
    AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_FROM}'
    AND o.o_orderdate < TIMESTAMP '{Q5_DATE_TO}'
)
SELECT n_name, sum(rev4) / 10000.0 AS revenue
FROM j GROUP BY n_name
ORDER BY sum(rev4) DESC, n_name ASC
"""


def promo_share_monthly_sql() -> str:
    """Promo revenue share by ship month (ops/relational
    .promo_share_monthly — the TPC-H Q14 shape), exact-cents sums."""
    return f"""
WITH l AS (
  SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev4,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT month, sum(rev4) AS rev4,
         sum(CASE WHEN is_promo = 1 THEN rev4 ELSE 0 END) AS promo4
  FROM l GROUP BY month
)
SELECT month, rev4 / 10000.0 AS revenue, promo4 / 10000.0 AS promo_revenue,
       round(100.0 * promo4 / rev4, {SCORE_ROUND_DECIMALS}) AS promo_share
FROM m ORDER BY month
"""


def events_hourly_sql() -> str:
    return """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


def events_sessions_sql(gap_minutes: int = 30) -> str:
    """Gaps-and-islands sessionization oracle."""
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_type, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL {gap_minutes} MINUTE
                 THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT *, CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def events_sliding_sql(window_min: int = 60, slide_min: int = 30) -> str:
    """Sliding-window oracle: explode each event to its k covering
    windows via generate_series, then aggregate."""
    k = window_min // slide_min
    return f"""
WITH exploded AS (
  SELECT event_type, value,
         to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 60 // {slide_min})
                        * {slide_min} * 60
                      - j * {slide_min} * 60)::TIMESTAMP AS window_start
  FROM events, unnest(generate_series(0, {k - 1})) AS t(j)
)
SELECT event_type,
       strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM exploded
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def events_asof_sql() -> str:
    """Backward as-of join oracle (DuckDB ASOF JOIN, inner): most
    recent at-or-before click per purchase, same user. Clicks are
    pre-reduced to max(event_id) per (user_id, ts) — the engine's
    deterministic tie rule — and the delta is exact integer
    microseconds (ops/relational.events_asof)."""
    from snowball_java_ray.constants import ASOF_LEFT_EVENT, ASOF_RIGHT_EVENT

    return f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = '{ASOF_LEFT_EVENT}'
),
c AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = '{ASOF_RIGHT_EVENT}'
  GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS wait_us
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""


def events_attribution_sql() -> str:
    """Range-join oracle: (click, purchase) pairs within the
    attribution window, per-user aggregate. The naive inequality join
    IS the spec; the engine answers it without materializing pairs
    (ops/relational.events_attribution). Purchase value rides as exact
    integer cents on both sides."""
    from snowball_java_ray.constants import (
        ASOF_LEFT_EVENT,
        ASOF_RIGHT_EVENT,
        ATTRIB_WINDOW_MIN,
    )

    return f"""
WITH c AS (
  SELECT user_id, ts FROM events WHERE event_type = '{ASOF_RIGHT_EVENT}'
),
p AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events WHERE event_type = '{ASOF_LEFT_EVENT}'
)
SELECT p.user_id, count(*) AS n_pairs,
       round(CAST(sum(p.v_c) AS DOUBLE) / 100, 2) AS attributed_value
FROM p JOIN c ON c.user_id = p.user_id
   AND c.ts < p.ts AND p.ts <= c.ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
GROUP BY p.user_id
ORDER BY p.user_id
"""


def events_funnel_sql() -> str:
    """Ordered first-touch funnel oracle: each stage's first timestamp
    strictly after the previous stage's first qualifying timestamp."""
    from snowball_java_ray.constants import FUNNEL_STAGES

    ctes = [
        f"st0 AS (SELECT user_id, min(ts) AS t FROM events\n"
        f"        WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id)"
    ]
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=1):
        ctes.append(
            f"st{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e\n"
            f"        JOIN st{i - 1} p USING (user_id)\n"
            f"        WHERE e.event_type = '{stage}' AND e.ts > p.t\n"
            f"        GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS stage_idx, '{stage}' AS stage,\n"
        f"       count(*) AS n_users FROM st{i}"
        for i, stage in enumerate(FUNNEL_STAGES)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY stage_idx"
    )


def events_running_total_sql() -> str:
    """Per-user running total oracle (exact integer cents inside the
    window sum — same CAST as the engine)."""
    return """
SELECT user_id, event_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100 AS running_value
FROM events
ORDER BY user_id, event_id
"""


def retention_cohorts_sql() -> str:
    """Cohort-retention oracle: first-seen day per user, distinct
    active users per (cohort day, day offset)."""
    return """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS offset_days,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def lang_top_quality_sql() -> str:
    """Grouped top-k oracle: per-lang top-k docs by canonical term
    count (multiplicity preserved, same CTE as term_df), ties to
    lowest doc_id."""
    from snowball_java_ray.constants import GROUPED_TOPK_K

    return f"""
WITH {tokenize_cte()},
terms AS (SELECT doc_id, count(*) AS n_terms FROM toks GROUP BY doc_id),
scored AS (
  SELECT d.doc_id, d.lang, coalesce(t.n_terms, 0) AS n_terms
  FROM documents d LEFT JOIN terms t ON d.doc_id = t.doc_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY n_terms DESC, doc_id) AS rank
  FROM scored
)
SELECT lang, CAST(rank AS INT) AS rank, doc_id, n_terms
FROM r WHERE rank <= {GROUPED_TOPK_K}
ORDER BY lang, rank
"""


def dup_passages_sql() -> str:
    """Verbatim-passage duplication oracle: PASSAGE_N-token windows in
    >= PASSAGE_MIN_DOCS distinct docs (per-doc-distinct by the
    shingles CTE)."""
    from snowball_java_ray.constants import PASSAGE_MIN_DOCS, PASSAGE_N

    return f"""
WITH {_shingles_cte(PASSAGE_N)}
SELECT shingle AS passage, count(*) AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM sh
GROUP BY shingle
HAVING count(*) >= {PASSAGE_MIN_DOCS}
ORDER BY passage
"""


def customer_order_totals_sql() -> str:
    return """
SELECT c.c_custkey,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_value,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
"""


def events_props_stats_sql() -> str:
    return """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def orders_topk_sql() -> str:
    return """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --- dedup family (ops/dedup.py) --------------------------------------

from snowball_java_ray.constants import (  # noqa: E402
    EMBED_COS_THRESHOLD,
    JACCARD_THRESHOLD,
    MINHASH_BAND_ROWS,
    MINHASH_SEEDS,
    NGRAM_N,
    SIMHASH_MAX_HAMMING,
)

# raw tokens (empties dropped, stopwords/numbers KEPT) as a list column
_RAW_TOKS = (
    f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}'),"
    " x -> x <> '')"
)

# distinct word-n-gram shingles per doc (parametrized: the dedup family
# uses NGRAM_N, the contamination check CONTAM_NGRAM)
def _shingles_cte(n: int) -> str:
    expr = " || ' ' || ".join(f"arr[i + {k}]" for k in range(n))
    return f"""
docarr AS (SELECT doc_id, {_RAW_TOKS} AS arr FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(arr) - {n - 1}),
                i -> {expr})) AS shingle
  FROM docarr WHERE len(arr) >= {n}
)"""


_SHINGLE_EXPR = " || ' ' || ".join(f"arr[i + {k}]" for k in range(NGRAM_N))
_SHINGLES_CTE = _shingles_cte(NGRAM_N)

_MD5INT60 = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def hll_registers_sql() -> str:
    """HyperLogLog register maxima over the analyzed vocabulary
    (ops/textstats.hll_registers): md5int60 hash, low HLL_P bits =
    register, rank = trailing_zeros(w) + 1 via the exact BIGINT
    identity bit_count((w & -w) - 1); w = 0 publishes the sentinel
    max rank. Pure integer ops — bitwise-identical on both engines."""
    from snowball_java_ray.constants import HLL_P

    m = 1 << HLL_P
    maxrank = 60 - HLL_P + 1
    h = _MD5INT60.format(expr="term")
    return f"""
WITH {tokenize_cte()},
vocab AS (SELECT DISTINCT term FROM toks),
hx AS (SELECT {h} AS h FROM vocab),
rw AS (SELECT h % {m} AS register, h >> {HLL_P} AS w FROM hx),
rk AS (SELECT register,
              CASE WHEN w = 0 THEN {maxrank}
                   ELSE bit_count((w & -w) - 1) + 1 END AS rank
       FROM rw),
regs AS (SELECT register, max(rank) AS max_rank FROM rk GROUP BY register)
SELECT t.register,
       CAST(coalesce(regs.max_rank, 0) AS BIGINT) AS max_rank
FROM generate_series(0, {m - 1}) AS t(register)
LEFT JOIN regs ON regs.register = t.register
ORDER BY t.register
"""


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY content_md5
"""


def ngram_jaccard_sql() -> str:
    # sh_keep mirrors the engine's blocking skew guard
    # (ops/dedup.ngram_jaccard_pairs): shingles in more than
    # JACCARD_MAX_BUCKET docs are excluded from candidate generation
    # and intersection counting; sizes stay full (lower-bound Jaccard)
    from snowball_java_ray.constants import JACCARD_MAX_BUCKET

    return f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
sdf AS (SELECT shingle, count(*) AS sdf FROM sh GROUP BY shingle),
sh_keep AS (
  SELECT s.doc_id, s.shingle FROM sh s
  JOIN sdf d USING (shingle) WHERE d.sdf <= {JACCARD_MAX_BUCKET}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh_keep a JOIN sh_keep b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(p.common * 1.0 / (x.n + y.n - p.common), 6) AS jaccard
FROM pairs p
JOIN sizes x ON p.doc_a = x.doc_id
JOIN sizes y ON p.doc_b = y.doc_id
WHERE p.common * 1.0 / (x.n + y.n - p.common) >= {JACCARD_THRESHOLD}
ORDER BY p.doc_a, p.doc_b
"""


def minhash_lsh_sql() -> str:
    from snowball_java_ray.ops.dedup import MINHASH_AB

    seed_rows = ", ".join(
        f"({s}, {a}::HUGEINT, {b}::HUGEINT)" for s, (a, b) in enumerate(MINHASH_AB)
    )
    h = _MD5INT60.format(expr="sh.shingle")
    return f"""
WITH {_SHINGLES_CTE},
seeds(seed, a, b) AS (VALUES {seed_rows}),
mh AS (
  SELECT sh.doc_id, s.seed,
         min((s.a * {h}::HUGEINT + s.b) % 18446744073709551616::HUGEINT)
           AS minhash
  FROM sh CROSS JOIN seeds s
  GROUP BY sh.doc_id, s.seed
),
bands AS (
  SELECT doc_id, seed // {MINHASH_BAND_ROWS} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, seed // {MINHASH_BAND_ROWS}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""


def dup_clusters_sql() -> str:
    """Connected components over the LSH pair graph
    (ops/dedup.dup_clusters): recursive transitive closure, cluster_id
    = min reachable doc_id (self included)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT * FROM ({minhash_lsh_sql()}) q),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id
FROM reach GROUP BY a ORDER BY doc_id
"""


def pagerank_sql() -> str:
    """Fixed-iteration PageRank over the LSH candidate graph
    (ops/dedup.pagerank): the power method UNROLLED to
    PAGERANK_ITERS CTE levels, every op an int64 floor op
    (`//`, `*`, `+`) so the values match the engine bitwise — no
    float, no libm, no rounding boundary."""
    from snowball_java_ray.constants import PAGERANK_ITERS, PAGERANK_SCALE

    base = (15 * PAGERANK_SCALE) // 100
    its = []
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(f"""r{i} AS (
  SELECT e.dst AS doc,
         CAST({base} AS BIGINT)
           + (85 * sum(r{i - 1}.r // deg.d)) // 100 AS r
  FROM edges e
  JOIN deg ON deg.src = e.src
  JOIN r{i - 1} ON r{i - 1}.doc = e.src
  GROUP BY e.dst
)""")
    its_sql = ",\n".join(its)
    k = PAGERANK_ITERS
    return f"""
WITH pairs AS (SELECT * FROM ({minhash_lsh_sql()}) q),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS doc, CAST({PAGERANK_SCALE} AS BIGINT) AS r FROM deg),
{its_sql}
SELECT r{k}.doc AS doc_id, CAST(deg.d AS BIGINT) AS deg,
       CAST(r{k}.r AS BIGINT) AS pagerank
FROM r{k} JOIN deg ON deg.src = r{k}.doc
ORDER BY doc_id
"""


def canonical_docs_sql() -> str:
    """Near-dup canonicalization (ops/dedup.canonical_docs): per
    cluster keep the doc with the most analyzed terms, ties to lowest
    doc_id; unclustered docs keep themselves."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT * FROM ({minhash_lsh_sql()}) q),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
cl AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
  FROM reach GROUP BY a
),
{tokenize_cte()},
nt AS (SELECT doc_id, count(*) AS n_terms FROM toks GROUP BY doc_id),
lab AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
j AS (
  SELECT l.doc_id, l.cluster_id, coalesce(nt.n_terms, 0) AS n_terms
  FROM lab l LEFT JOIN nt ON nt.doc_id = l.doc_id
),
k AS (
  SELECT cluster_id, doc_id AS keep_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (
             PARTITION BY cluster_id
             ORDER BY n_terms DESC, doc_id ASC
           ) AS r
    FROM j
  ) WHERE r = 1
)
SELECT j.doc_id, j.cluster_id, k.keep_id,
       CAST(j.doc_id = k.keep_id AS BIGINT) AS kept
FROM j JOIN k ON k.cluster_id = j.cluster_id
ORDER BY j.doc_id
"""


def simhash_sql() -> str:
    """60-bit tf-weighted simhash over canonical terms, via a
    bit-position explode (doc x term x bit)."""
    h = _MD5INT60.format(expr="term")
    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
bits AS (SELECT unnest(generate_series(0, 59)) AS j),
acc AS (
  SELECT tf.doc_id, b.j,
         sum(CASE WHEN ({h} >> b.j) & 1 = 1 THEN tf.tf ELSE -tf.tf END) AS s
  FROM tf CROSS JOIN bits b
  GROUP BY tf.doc_id, b.j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM acc GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(sh.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
ORDER BY d.doc_id
"""


def simhash_pairs_sql() -> str:
    """Hamming-distance near-dup pairs over the SQL-computed simhash
    fingerprints (bit_count(xor(a, b)) <= SIMHASH_MAX_HAMMING) — the
    exact-semantics oracle for the distributed chunk-blocked pairing."""
    inner = simhash_sql()
    return f"""
WITH shv AS ({inner})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM shv a JOIN shv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


def embed_dup_pairs_sql() -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= {EMBED_COS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


# --- text analysis (ops/textstats.py) ---------------------------------


def quality_score_sql() -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, {_RAW_TOKS} AS arr FROM documents
),
rt AS (SELECT doc_id, unnest(arr) AS w FROM raw),
stats AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         sum(CASE WHEN w IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(w)) AS total_len
  FROM rt GROUP BY doc_id
),
{tokenize_cte()},
terms AS (SELECT doc_id, count(*) AS n_terms FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       length(d.text) AS n_chars,
       coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(t.n_terms, 0) AS n_terms,
       CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 0.0
            ELSE round(s.n_stop * 1.0 / s.n_tokens, 6) END AS stopword_ratio,
       CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 0.0
            ELSE round(s.total_len * 1.0 / s.n_tokens, 6) END AS mean_token_len
FROM documents d
LEFT JOIN stats s ON d.doc_id = s.doc_id
LEFT JOIN terms t ON d.doc_id = t.doc_id
ORDER BY d.doc_id
"""


def lang_quantiles_sql() -> str:
    """Per-lang discrete doc-length quantiles
    (ops/textstats.lang_quantiles), one row per (lang, q)."""
    from snowball_java_ray.constants import LANG_QUANTILES

    legs = "\nUNION ALL\n".join(
        f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(n_chars, {q}) AS value FROM documents GROUP BY lang"
        for q in LANG_QUANTILES
    )
    return f"{legs}\nORDER BY lang, q\n"


def doc_tags_sql() -> str:
    """Top-K tf*idf keywords per doc (ops/textstats.doc_tags): same
    BM25 idf, rank on round(score, RANK) DESC then term ASC."""
    from snowball_java_ray.constants import DOC_TAGS_K

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((n.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           AS s
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, s,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(s, {RANK_ROUND_DECIMALS}) DESC, term ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term,
       round(s, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {DOC_TAGS_K}
ORDER BY doc_id, rank
"""


def source_report_sql() -> str:
    """Per-source curation report (ops/textstats.source_report): doc
    count, exact-dup drop fraction, mean canonical-term count and mean
    per-doc stopword ratio (same per-doc 6-dp rounding as the engine,
    then 6-dp rounded means)."""
    return f"""
WITH raw AS (
  SELECT doc_id, {_RAW_TOKS} AS arr FROM documents
),
rt AS (SELECT doc_id, unnest(arr) AS w FROM raw),
stats AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN w IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop
  FROM rt GROUP BY doc_id
),
{tokenize_cte()},
terms AS (SELECT doc_id, count(*) AS n_terms FROM toks GROUP BY doc_id),
keep AS (SELECT md5(text) AS dg, min(doc_id) AS keep_doc
         FROM documents GROUP BY md5(text)),
pd AS (
  SELECT d.doc_id, d.source, md5(d.text) AS dg,
         coalesce(t.n_terms, 0) AS n_terms,
         CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 0.0
              ELSE round(s.n_stop * 1.0 / s.n_tokens, 6) END AS sr
  FROM documents d
  LEFT JOIN stats s ON d.doc_id = s.doc_id
  LEFT JOIN terms t ON d.doc_id = t.doc_id
)
SELECT pd.source, count(*) AS n_docs,
       round(sum(CASE WHEN pd.doc_id <> k.keep_doc THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS dup_frac,
       round(sum(pd.n_terms) * 1.0 / count(*), 6) AS avg_terms,
       round(sum(pd.sr) / count(*), 6) AS avg_stopword_ratio
FROM pd JOIN keep k ON pd.dg = k.dg
GROUP BY pd.source ORDER BY pd.source
"""


def token_counts_sql() -> str:
    from snowball_java_ray.ops.textstats import BPE_TOKEN_PATTERN

    return f"""
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}'),
           x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_TOKEN_PATTERN}')) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def fingerprint_sql() -> str:
    return f"""
WITH {tokenize_cte()},
fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list(DISTINCT term)), ' ')) AS fingerprint
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, coalesce(fp.fingerprint, md5('')) AS fingerprint
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
ORDER BY d.doc_id
"""


def cooc_pmi_sql(
    min_df: int | None = None,
    cap: int | None = None,
    min_pair: int | None = None,
) -> str:
    """Term co-occurrence + PMI (ops/textstats.cooc_pmi): same df
    prune, per-doc cap rule (tf DESC, term ASC) and float expression
    (c12*n then / (c1*c2), ln, round) as the engine."""
    from snowball_java_ray.constants import (
        COOC_DOC_CAP,
        COOC_MIN_DF,
        COOC_MIN_PAIR,
        SCORE_ROUND_DECIMALS,
    )

    COOC_MIN_DF = COOC_MIN_DF if min_df is None else min_df
    COOC_DOC_CAP = COOC_DOC_CAP if cap is None else cap
    COOC_MIN_PAIR = COOC_MIN_PAIR if min_pair is None else min_pair
    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qual AS (SELECT term FROM dfreq WHERE df >= {COOC_MIN_DF}),
kept AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tf DESC, term ASC) AS rk
    FROM tf WHERE term IN (SELECT term FROM qual)
  ) WHERE rk <= {COOC_DOC_CAP}
),
c1 AS (SELECT term, count(*) AS c FROM kept GROUP BY term),
pairs AS (
  SELECT a.term AS term1, b.term AS term2, count(*) AS c12
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= {COOC_MIN_PAIR}
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT p.term1, p.term2, p.c12, ca.c AS c1, cb.c AS c2,
       round(ln(CAST(p.c12 AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))),
             {SCORE_ROUND_DECIMALS}) AS pmi
FROM pairs p
JOIN c1 ca ON p.term1 = ca.term
JOIN c1 cb ON p.term2 = cb.term
CROSS JOIN n
ORDER BY p.term1, p.term2
"""


def langid_sql() -> str:
    from snowball_java_ray.ops.textstats import LANG_WORDLISTS

    langs = sorted(LANG_WORDLISTS)
    wl_rows = ", ".join(
        f"('{lang}', '{w}')" for lang in langs for w in LANG_WORDLISTS[lang]
    )
    return f"""
WITH raw AS (
  SELECT doc_id, unnest({_RAW_TOKS}) AS w FROM documents
),
wl(lang, w) AS (VALUES {wl_rows}),
hits AS (
  SELECT raw.doc_id, wl.lang, count(*) AS n
  FROM raw JOIN wl ON raw.w = wl.w
  GROUP BY raw.doc_id, wl.lang
),
best AS (
  SELECT doc_id, lang, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id,
       CASE WHEN b.n IS NULL OR b.n = 0 THEN 'unknown' ELSE b.lang END AS pred_lang,
       coalesce(b.n, 0) AS n_hits
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""


def lang_profile_sql() -> str:
    return """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def ann_topk_sql() -> str:
    from snowball_java_ray.constants import ANN_N_QUERIES, ANN_TOP_K

    return f"""
WITH q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id < {ANN_N_QUERIES}
),
c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT q.qid AS query_vec_id, c.vec_id,
         list_cosine_similarity(q.e, c.e) AS cos
  FROM q JOIN c ON c.vec_id <> q.qid
),
r AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_vec_id
           ORDER BY round(cos, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
FROM r WHERE rank <= {ANN_TOP_K}
ORDER BY query_vec_id, rank
"""


def ann_recall_sql() -> str:
    """Recall@k / top-1 eval of the LSH leg vs the brute ground truth,
    composed from the two legs' own generated oracles (nested-WITH
    subqueries), so this oracle cannot drift from theirs."""
    from snowball_java_ray.constants import ANN_TOP_K

    return f"""
SELECT b.query_vec_id,
       count(a.vec_id) AS n_overlap,
       round(CAST(count(a.vec_id) AS DOUBLE) / {ANN_TOP_K}, 4) AS recall,
       CAST(max(CASE WHEN b.rank = 1 AND a.rank = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS top1_hit
FROM ({ann_topk_sql()}) b
LEFT JOIN ({lsh_ann_sql()}) a
  ON a.query_vec_id = b.query_vec_id AND a.vec_id = b.vec_id
GROUP BY b.query_vec_id
ORDER BY b.query_vec_id
"""


def embed_outliers_sql() -> str:
    """Embedding-space audit (ops/ann.embed_outliers): per-label
    centroid from integer-quantized per-dimension sums, then the
    EMB_OUTLIER_K lowest-cosine vectors per label."""
    from snowball_java_ray.constants import EMB_OUTLIER_K

    return f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT vec_id, label, unnest(v) AS x,
         unnest(range(1, len(v) + 1)) AS d
  FROM e
),
q AS (
  SELECT label, d,
         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
         count(*) AS n
  FROM dims GROUP BY label, d
),
cent AS (
  SELECT label, list(s / (n * 1000000.0) ORDER BY d) AS cv
  FROM q GROUP BY label
),
s AS (
  SELECT e.vec_id, e.label,
         list_cosine_similarity(e.v, c.cv) AS cos
  FROM e JOIN cent c ON c.label = e.label
),
r AS (
  SELECT label, vec_id, cos,
         row_number() OVER (
           PARTITION BY label
           ORDER BY round(cos, {RANK_ROUND_DECIMALS}) ASC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT label, CAST(rank AS INT) AS rank, vec_id,
       round(cos, {SCORE_ROUND_DECIMALS}) AS cos
FROM r WHERE rank <= {EMB_OUTLIER_K}
ORDER BY label, rank
"""


def label_confusion_sql() -> str:
    """Label-purity audit (ops/ann.label_confusion): nearest-centroid
    prediction per vector, confusion counts per (label, pred)."""
    return f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
dims AS (
  SELECT vec_id, label, unnest(v) AS x,
         unnest(range(1, len(v) + 1)) AS d
  FROM e
),
q AS (
  SELECT label, d,
         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
         count(*) AS n
  FROM dims GROUP BY label, d
),
cent AS (
  SELECT label, list(s / (n * 1000000.0) ORDER BY d) AS cv
  FROM q GROUP BY label
),
s AS (
  SELECT e.vec_id, e.label, c.label AS cand,
         list_cosine_similarity(e.v, c.cv) AS cos
  FROM e CROSS JOIN cent c
),
r AS (
  SELECT vec_id, label, cand,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY round(cos, {RANK_ROUND_DECIMALS}) DESC, cand ASC
         ) AS rk
  FROM s
)
SELECT label, cand AS pred_label, CAST(count(*) AS BIGINT) AS n
FROM r WHERE rk = 1
GROUP BY label, cand
ORDER BY label, pred_label
"""


def boolean_and_sql() -> str:
    """Conjunctive retrieval oracle: doc contains ALL query terms."""
    return f"""
WITH {tokenize_cte()},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
qn AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id)
SELECT CAST(q.query_id AS BIGINT) AS query_id, dt.doc_id
FROM qterms q
JOIN dt ON dt.term = q.term
GROUP BY q.query_id, dt.doc_id
HAVING count(*) = (SELECT n FROM qn WHERE qn.query_id = q.query_id)
ORDER BY query_id, doc_id
"""


def boolean_or_sql() -> str:
    """Disjunctive retrieval oracle: doc contains ANY query term."""
    return f"""
WITH {tokenize_cte()},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
)
SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, dt.doc_id
FROM qterms q
JOIN dt ON dt.term = q.term
ORDER BY query_id, doc_id
"""


def wildcard_search_sql() -> str:
    """Wildcard retrieval oracle: LIKE expansion over the distinct
    vocabulary, capped at the lexicographically-first
    WILDCARD_MAX_EXPANSION terms (the engine's rewrite budget), then
    docs containing ANY expanded term."""
    from snowball_java_ray.constants import (
        WILDCARD_MAX_EXPANSION,
        WILDCARD_PATTERNS,
    )

    pat_rows = ", ".join(f"('{p}')" for p in WILDCARD_PATTERNS)
    return f"""
WITH {tokenize_cte()},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
pat(pattern) AS (VALUES {pat_rows}),
dic AS (SELECT DISTINCT term FROM toks),
exp AS (
  SELECT pattern, term FROM (
    SELECT p.pattern, d.term,
           row_number() OVER (PARTITION BY p.pattern ORDER BY d.term) AS rn
    FROM pat p JOIN dic d ON d.term LIKE p.pattern
  ) WHERE rn <= {WILDCARD_MAX_EXPANSION}
)
SELECT DISTINCT e.pattern, dt.doc_id
FROM exp e JOIN dt ON dt.term = e.term
ORDER BY pattern, doc_id
"""


def boolean_and_not_sql() -> str:
    """AND-NOT oracle: ALL of the sorted distinct analyzed terms but
    the (lexicographically) last, excluding the last; single-term
    queries have no exclusion — the
    ``BM25ShardedService.boolean_and_not`` workload rule."""
    return f"""
WITH {tokenize_cte()},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
qn AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id),
qmax AS (SELECT query_id, max(term) AS neg FROM qterms GROUP BY query_id),
qpos AS (
  SELECT q.query_id, q.term
  FROM qterms q
  JOIN qn ON qn.query_id = q.query_id
  JOIN qmax m ON m.query_id = q.query_id
  WHERE qn.n = 1 OR q.term <> m.neg
),
pn AS (SELECT query_id, count(*) AS n FROM qpos GROUP BY query_id),
cand AS (
  SELECT q.query_id, dt.doc_id
  FROM qpos q
  JOIN dt ON dt.term = q.term
  GROUP BY q.query_id, dt.doc_id
  HAVING count(*) = (SELECT n FROM pn WHERE pn.query_id = q.query_id)
)
SELECT CAST(c.query_id AS BIGINT) AS query_id, c.doc_id
FROM cand c
JOIN qn ON qn.query_id = c.query_id
LEFT JOIN qmax m ON m.query_id = c.query_id
LEFT JOIN dt dneg
  ON qn.n > 1 AND dneg.doc_id = c.doc_id AND dneg.term = m.neg
WHERE dneg.doc_id IS NULL
ORDER BY query_id, c.doc_id
"""


# analyzed token list (order preserved) as a DuckDB lambda filter —
# the SQL twin of functions.text.tokenize for list-valued contexts
_STOPLIST_LIST_SQL = "[" + _STOPLIST_SQL + "]"
_ANALYZED_LIST = (
    f"list_filter(string_split_regex(lower({{col}}), '{TOKEN_SPLIT_PATTERN}'),"
    f" x -> x <> '' AND NOT regexp_full_match(x, '{_NUM_SQL}')"
    f" AND NOT list_contains({_STOPLIST_LIST_SQL}, x))"
)


def phrase_match_sql() -> str:
    """Exact-phrase oracle: the query's analyzed token sequence occurs
    contiguously in the doc's analyzed token stream (space-joined
    strings with sentinel padding — token-boundary exact)."""
    qtoks = _ANALYZED_LIST.format(col="qtext")
    dtoks = _ANALYZED_LIST.format(col="text")
    return f"""
WITH qtoks AS (
  SELECT query_id, array_to_string({qtoks}, ' ') AS phrase
  FROM {queries_values_sql()}
),
darr AS (
  SELECT doc_id,
         ' ' || array_to_string({dtoks}, ' ') || ' ' AS dstr
  FROM documents
)
SELECT CAST(q.query_id AS BIGINT) AS query_id, d.doc_id
FROM qtoks q
JOIN darr d ON position((' ' || q.phrase || ' ') IN d.dstr) > 0
WHERE q.phrase <> ''
ORDER BY query_id, doc_id
"""


def contamination_sql() -> str:
    """Train/test n-gram contamination oracle (CONTAM_NGRAM-grams,
    same md5 hash and split thresholds as the engine; val excluded)."""
    from snowball_java_ray.constants import CONTAM_NGRAM
    from snowball_java_ray.ops.sampling import TRAIN_FRAC, VAL_FRAC

    u = _HASH_UNIT.format(col="s.doc_id")
    h = _MD5INT60.format(expr="s.shingle")
    return f"""
WITH {_shingles_cte(CONTAM_NGRAM).lstrip()},
shl AS (
  SELECT s.doc_id, {h} AS h,
         CASE WHEN {u} < {TRAIN_FRAC} THEN 'train'
              WHEN {u} < {TRAIN_FRAC + VAL_FRAC} THEN 'val'
              ELSE 'test' END AS split
  FROM sh s
),
part AS (SELECT * FROM shl WHERE split <> 'val'),
present AS (
  SELECT h, max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS present
  FROM part GROUP BY h
),
test_sh AS (SELECT doc_id, h FROM part WHERE split = 'test')
SELECT t.doc_id,
       count(*) AS n_shingles,
       CAST(sum(p.present) AS BIGINT) AS n_contaminated,
       round(sum(p.present) * 1.0 / count(*), 6) AS contamination
FROM test_sh t
JOIN present p ON p.h = t.h
GROUP BY t.doc_id
ORDER BY doc_id
"""


def curated_corpus_sql() -> str:
    """The composed curation pipeline: quality gate -> exact dedup ->
    MinHash-LSH near-dedup (drop larger member of surviving pairs)."""
    from snowball_java_ray.ops.dedup import MINHASH_AB
    from snowball_java_ray.pipelines.curate import MAX_STOP_RATIO, MIN_TERMS

    seed_rows = ", ".join(
        f"({s}, {a}::HUGEINT, {b}::HUGEINT)" for s, (a, b) in enumerate(MINHASH_AB)
    )
    h = _MD5INT60.format(expr="sh.shingle")
    return f"""
WITH raw AS (
  SELECT doc_id, unnest({_RAW_TOKS}) AS w FROM documents
),
rawstats AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN w IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop
  FROM raw GROUP BY doc_id
),
{tokenize_cte()},
terms AS (SELECT doc_id, count(*) AS n_terms FROM toks GROUP BY doc_id),
quality AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN terms t ON d.doc_id = t.doc_id
  LEFT JOIN rawstats s ON d.doc_id = s.doc_id
  WHERE t.n_terms >= {MIN_TERMS}
    AND coalesce(s.n_stop * 1.0 / s.n_tokens, 0.0) <= {MAX_STOP_RATIO}
),
exact AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
docarr AS (SELECT doc_id, {_RAW_TOKS} AS arr FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(arr) - {NGRAM_N - 1}),
                i -> {_SHINGLE_EXPR})) AS shingle
  FROM docarr WHERE len(arr) >= {NGRAM_N}
),
seeds(seed, a, b) AS (VALUES {seed_rows}),
mh AS (
  SELECT sh.doc_id, s.seed,
         min((s.a * {h}::HUGEINT + s.b) % 18446744073709551616::HUGEINT)
           AS minhash
  FROM sh CROSS JOIN seeds s
  GROUP BY sh.doc_id, s.seed
),
bands AS (
  SELECT doc_id, seed // {MINHASH_BAND_ROWS} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, seed // {MINHASH_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
dropped AS (
  SELECT DISTINCT c.doc_b AS doc_id FROM cand c
  JOIN exact ea ON c.doc_a = ea.doc_id
  JOIN exact eb ON c.doc_b = eb.doc_id
)
SELECT e.doc_id FROM exact e
WHERE e.doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY e.doc_id
"""


def bm25_topk_sql(
    top_k: int = TOP_K,
    table: str = "documents",
    prelude: str = "",
    cand_where: str = "",
) -> str:
    """Full BM25 top-k over the reference query set, rank-deterministic:
    rank on round(score, {RANK}) DESC then doc_id ASC; emit score
    rounded to {SCORE} decimals. idf = ln((N-df+0.5)/(df+0.5)+1).

    ``table``/``prelude`` swap the corpus (the compacted-delete oracle
    scores a filtered live view — stats AND candidates both live);
    ``cand_where`` filters candidates only (the logical-delete oracle —
    stats keep the full corpus, tombstoned docs just can't appear)."""
    where_scores = f"WHERE {cand_where}" if cand_where else ""
    return f"""
WITH {prelude}{tokenize_cte(table=table)},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM {table}) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM {table}) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  {where_scores}
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def bm25_topk_filtered_sql(top_k: int = TOP_K) -> str:
    """Metadata-filtered retrieval oracle: same BM25 stats as the
    unfiltered query (Lucene filter semantics), candidates restricted
    to FILTER_SOURCE docs via ``cand_where``."""
    from snowball_java_ray.constants import FILTER_SOURCE

    return bm25_topk_sql(
        top_k=top_k,
        cand_where=(
            "tf.doc_id IN (SELECT doc_id FROM documents "
            f"WHERE source = '{FILTER_SOURCE}')"
        ),
    )


def bm25_topk_deleted_sql(top_k: int = TOP_K) -> str:
    """Logical tombstone delete (pipelines/index_pipeline.delete_docs
    + the scorer-side candidate mask, stages/score.drop_deleted): the
    deterministic doc_id % {MOD} == {REM} set can no longer appear in
    any result, but idf/avgdl/n_docs still reflect the FULL corpus —
    the Lucene pre-compaction contract."""
    from snowball_java_ray.constants import DELETE_MOD, DELETE_REM

    return bm25_topk_sql(
        top_k, cand_where=f"tf.doc_id % {DELETE_MOD} <> {DELETE_REM}"
    )


def bm25_topk_compacted_sql(top_k: int = TOP_K) -> str:
    """Physical delete (compact_index_with_tombstones): after the
    chunk rewrite the index scores exactly like a fresh build over the
    live corpus — stats AND candidates both exclude the deleted docs,
    doc_ids keep their original values (the id space keeps holes)."""
    from snowball_java_ray.constants import DELETE_MOD, DELETE_REM

    prelude = (
        "docs_live AS (SELECT * FROM documents "
        f"WHERE doc_id % {DELETE_MOD} <> {DELETE_REM}),\n"
    )
    return bm25_topk_sql(top_k, table="docs_live", prelude=prelude)


def bm25_topk_diverse_sql(top_k: int = TOP_K) -> str:
    """Diversified top-k (pipelines/api.bm25_topk_diverse_pipeline):
    keep docs whose within-source rank by the global key (round(score,
    {RANK}) DESC, doc_id ASC) <= DIVERSITY_CAP, then cut to top_k.
    Standalone rather than nesting bm25_topk_sql: both row_numbers
    must rank on the UNROUNDED-to-{SCORE} score, which the nested
    query no longer carries."""
    from snowball_java_ray.constants import DIVERSITY_CAP

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id
),
capped AS (
  SELECT s.query_id, s.doc_id, s.score, d.source,
         row_number() OVER (
           PARTITION BY s.query_id, d.source
           ORDER BY round(s.score, {RANK_ROUND_DECIMALS}) DESC,
                    s.doc_id ASC
         ) AS src_rank
  FROM scores s JOIN documents d USING (doc_id)
),
rer AS (
  SELECT query_id, doc_id, score, source,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM capped WHERE src_rank <= {DIVERSITY_CAP}
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score, source
FROM rer WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def query_expand_sql() -> str:
    """PRF query expansion (pipelines/api.query_expand_pipeline):
    expansion weight = idf(t) * sum of tf over the query's top-k
    feedback docs; the query's own analyzed terms are excluded; keep
    the EXPAND_TERMS best per query (round(weight, {RANK}) DESC,
    term ASC)."""
    from snowball_java_ray.constants import EXPAND_TERMS

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id
),
topk AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
           ) AS rank
    FROM scores
  ) WHERE rank <= {TOP_K}
),
cand AS (
  SELECT k.query_id, t.term, sum(t.tf) AS total_tf
  FROM topk k JOIN tf t ON t.doc_id = k.doc_id
  WHERE NOT EXISTS (
    SELECT 1 FROM qterms q
    WHERE q.query_id = k.query_id AND q.term = t.term
  )
  GROUP BY k.query_id, t.term
),
weighted AS (
  SELECT c.query_id, c.term,
         ln(((SELECT n_docs FROM meta) - df.df + 0.5)
            / (df.df + 0.5) + 1.0) * c.total_tf AS weight
  FROM cand c JOIN df ON df.term = c.term
),
ranked AS (
  SELECT query_id, term, weight,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(weight, {RANK_ROUND_DECIMALS}) DESC, term ASC
         ) AS rank
  FROM weighted
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       term, round(weight, {SCORE_ROUND_DECIMALS}) AS weight
FROM ranked WHERE rank <= {EXPAND_TERMS}
ORDER BY query_id, rank
"""


def lm_nll_sql() -> str:
    """Bigram-LM doc scoring (ops/textstats.lm_nll): add-1-smoothed
    bigram surprise over the analyzed stream. The contract is 100%
    log-free exact-integer arithmetic (r4 rewrite — the r3
    floor(-ln(x)*1e6+0.5) contract was knife-edged on 1-ulp libm
    ``ln`` divergence between numpy and DuckDB): each bigram
    contributes ((cp + V) * 1000000) // (c + 1) as BIGINT floor
    division and the published columns are pure int64 — no float
    anywhere, so no rounding boundary exists."""
    return f"""
WITH raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
big AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM flt a JOIN flt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
pref AS (SELECT w1, sum(c) AS cp FROM bc GROUP BY w1),
v AS (SELECT count(DISTINCT term) AS v FROM flt),
scored AS (
  SELECT g.doc_id, count(*) AS n_bigrams,
         sum(
           ((CAST(pref.cp AS BIGINT) + CAST(v.v AS BIGINT))
            * CAST(1000000 AS BIGINT))
           // (CAST(bc.c AS BIGINT) + CAST(1 AS BIGINT))
         ) AS s
  FROM big g
  JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
  JOIN pref ON pref.w1 = g.w1
  CROSS JOIN v
  GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(s AS BIGINT) AS s
FROM scored ORDER BY doc_id
"""


def text_clean_sql() -> str:
    """URL/email scrub accounting (ops/textstats.text_clean). Same
    RE2 patterns through DuckDB regexp_replace(..., 'g'); counts via
    len(regexp_extract_all). All columns exact int64."""
    from snowball_java_ray.ops.textstats import (
        _WS_RUN,
        EMAIL_PATTERN,
        URL_PATTERN,
    )

    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{URL_PATTERN}'))
            AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{EMAIL_PATTERN}'))
            AS BIGINT) AS n_emails,
       CAST(length(coalesce(text, '')) AS BIGINT) AS raw_chars,
       CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(
              coalesce(text, ''), '{URL_PATTERN}', '', 'g'),
              '{EMAIL_PATTERN}', '', 'g'),
              '{_WS_RUN}', ' ', 'g'), ' ')) AS BIGINT) AS clean_chars
FROM documents ORDER BY doc_id
"""


def embed_quantize_sql() -> str:
    """Int8 quantization audit (ops/ann.embed_quantize): q = floor(
    CAST(x AS DOUBLE) * 127 / maxabs + 0.5) — the identical IEEE
    float64 expression tree as the engine (float32 widened exactly,
    no libm), so q and the int64 sums are bit-identical."""
    return f"""
WITH e AS (SELECT vec_id, unnest(embedding) AS xf FROM embeddings),
x AS (SELECT vec_id, CAST(xf AS DOUBLE) AS x FROM e),
m AS (SELECT vec_id, count(*) AS n_dims, max(abs(x)) AS maxabs
      FROM x GROUP BY vec_id),
q AS (
  SELECT x.vec_id,
         CASE WHEN m.maxabs = 0 THEN 0
              ELSE CAST(floor(x.x * 127.0 / m.maxabs + 0.5) AS BIGINT)
         END AS q
  FROM x JOIN m ON m.vec_id = x.vec_id
)
SELECT m.vec_id, CAST(m.n_dims AS BIGINT) AS n_dims,
       {grid6("m.maxabs")} AS maxabs,
       CAST(sum(q.q) AS BIGINT) AS sum_q,
       CAST(sum(abs(q.q)) AS BIGINT) AS sum_q_abs
FROM m JOIN q ON q.vec_id = m.vec_id
GROUP BY m.vec_id, m.n_dims, m.maxabs
ORDER BY m.vec_id
"""


def gopher_rules_sql() -> str:
    """Gopher-style repetition/formatting signals
    (ops/textstats.gopher_rules). All counts are exact BIGINTs; the
    fraction columns are int/int IEEE divisions of those same
    integers, so both engines produce bit-identical doubles — no libm
    and no rounding anywhere. Splitting '' yields [''], so every doc
    has n_lines >= 1 and the divisions are total."""
    return f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS ln
  FROM documents
),
ls AS (
  SELECT doc_id,
         count(*) AS n_lines,
         count(DISTINCT ln) AS n_distinct_lines,
         sum(CASE WHEN ln LIKE '-%' OR ln LIKE '*%' THEN 1 ELSE 0 END)
           AS bullet_lines,
         sum(CASE WHEN ln LIKE '%...' THEN 1 ELSE 0 END) AS ellipsis_lines
  FROM lines GROUP BY doc_id
),
raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
big AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM flt a JOIN flt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
bper AS (
  SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY doc_id, w1, w2
),
bs AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_n
  FROM bper GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(ls.n_lines AS BIGINT) AS n_lines,
       CAST(ls.n_distinct_lines AS BIGINT) AS n_distinct_lines,
       CAST(ls.bullet_lines AS BIGINT) AS bullet_lines,
       CAST(ls.ellipsis_lines AS BIGINT) AS ellipsis_lines,
       CAST(coalesce(bs.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(bs.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       floor(CAST(ls.n_lines - ls.n_distinct_lines AS DOUBLE)
         / CAST(ls.n_lines AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS dup_line_frac,
       floor(CAST(coalesce(bs.top_bigram_n, 0) AS DOUBLE)
         / CAST(greatest(coalesce(bs.n_bigrams, 0), 1) AS DOUBLE)
         * 1000000 + 0.5) / 1000000
         AS top_bigram_frac
FROM documents d
LEFT JOIN ls ON ls.doc_id = d.doc_id
LEFT JOIN bs ON bs.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def bm25_explain_sql() -> str:
    """Per-term score breakdown for each query's rank-1 doc
    (pipelines/api.bm25_explain_pipeline)."""
    return f"""
WITH top1 AS (
  SELECT query_id, doc_id FROM ({bm25_topk_sql()}) t WHERE rank = 1
),
{tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
)
SELECT CAST(k.query_id AS BIGINT) AS query_id, k.doc_id, q.term,
       CAST(tf.tf AS BIGINT) AS tf, CAST(dl.doc_len AS BIGINT) AS dl,
       round(ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0),
             {SCORE_ROUND_DECIMALS}) AS idf,
       round(
         ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * tf.tf * ({BM25_K1} + 1.0)
         / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
            + {BM25_B} * dl.doc_len / meta.avgdl)),
         {SCORE_ROUND_DECIMALS}) AS contrib
FROM top1 k
JOIN qterms q ON q.query_id = k.query_id
JOIN tf ON tf.term = q.term AND tf.doc_id = k.doc_id
JOIN df ON df.term = q.term
JOIN dl ON dl.doc_id = k.doc_id
CROSS JOIN meta
ORDER BY query_id, q.term
"""


def near_match_sql() -> str:
    """Proximity retrieval (pipelines/api.near_match_pipeline):
    zipped unnest gives raw token positions; analyzed positions are a
    row_number over the FILTERED stream (matching the engine's
    tokenize output order); match = all terms present AND
    first-occurrence span <= NEAR_SLOP."""
    from snowball_java_ray.constants import NEAR_SLOP

    return f"""
WITH raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
firstpos AS (
  SELECT doc_id, term, min(pos) AS p FROM flt GROUP BY doc_id, term
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
qn AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id),
j AS (
  SELECT q.query_id, f.doc_id, count(*) AS nt,
         max(f.p) - min(f.p) AS span
  FROM qterms q JOIN firstpos f ON f.term = q.term
  GROUP BY q.query_id, f.doc_id
)
SELECT CAST(j.query_id AS BIGINT) AS query_id, j.doc_id,
       CAST(j.span AS BIGINT) AS span
FROM j JOIN qn ON qn.query_id = j.query_id
WHERE j.nt = qn.n AND j.span <= {NEAR_SLOP}
ORDER BY query_id, doc_id
"""


def vocab_stats_sql() -> str:
    """Frequency-of-frequencies (pipelines/api.vocab_stats_pipeline)."""
    return f"""
WITH {tokenize_cte()},
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT df, CAST(count(*) AS BIGINT) AS n_terms
FROM d GROUP BY df ORDER BY df
"""


def term_complete_sql() -> str:
    """Prefix completion (pipelines/api.term_complete_pipeline)."""
    from snowball_java_ray.constants import COMPLETE_K, COMPLETE_PREFIXES

    prefixes = ", ".join(f"('{p}')" for p in COMPLETE_PREFIXES)
    return f"""
WITH {tokenize_cte()},
d AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
p(prefix) AS (VALUES {prefixes}),
c AS (
  SELECT p.prefix, d.term, d.cf
  FROM p JOIN d ON d.term LIKE p.prefix || '%'
),
r AS (
  SELECT prefix, term, cf,
         row_number() OVER (
           PARTITION BY prefix ORDER BY cf DESC, term ASC
         ) AS rank
  FROM c
)
SELECT prefix, CAST(rank AS INT) AS rank, term, CAST(cf AS BIGINT) AS cf
FROM r WHERE rank <= {COMPLETE_K}
ORDER BY prefix, rank
"""


def hybrid_topk_sql() -> str:
    """Hybrid RRF fusion (pipelines/api.hybrid_topk_pipeline): FULL
    OUTER JOIN of the BM25 and brute-cosine leg oracles, rrf = sum of
    1/(RRF_K + rank) over present legs, re-ranked and cut to TOP_K."""
    from snowball_java_ray.constants import ANN_N_QUERIES, RRF_K

    return f"""
WITH bm AS (
  SELECT query_id, rank AS bm_rank, doc_id
  FROM ({bm25_topk_sql()}) WHERE query_id < {ANN_N_QUERIES}
),
ann AS (
  SELECT query_vec_id AS query_id, rank AS ann_rank, vec_id AS doc_id
  FROM ({ann_topk_sql()})
),
u AS (
  SELECT COALESCE(bm.query_id, ann.query_id) AS query_id,
         COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
         COALESCE(bm.bm_rank, 0) AS bm_rank,
         COALESCE(ann.ann_rank, 0) AS ann_rank
  FROM bm FULL OUTER JOIN ann
    ON bm.query_id = ann.query_id AND bm.doc_id = ann.doc_id
),
s AS (
  SELECT query_id, doc_id, bm_rank, ann_rank,
         (CASE WHEN bm_rank > 0 THEN 1.0 / ({RRF_K} + bm_rank)
               ELSE 0.0 END)
         + (CASE WHEN ann_rank > 0 THEN 1.0 / ({RRF_K} + ann_rank)
                 ELSE 0.0 END) AS rrf
  FROM u
),
r AS (
  SELECT query_id, doc_id, rrf, bm_rank, ann_rank,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(rrf, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM s
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(rrf, {SCORE_ROUND_DECIMALS}) AS rrf,
       CAST(bm_rank AS BIGINT) AS bm_rank,
       CAST(ann_rank AS BIGINT) AS ann_rank
FROM r WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def bm25_facets_sql() -> str:
    """Facet counts (pipelines/api.bm25_facets_pipeline): doc counts
    by lang and by source over each query's top-k hits."""
    return f"""
WITH topk AS (SELECT * FROM ({bm25_topk_sql()}) t),
j AS (
  SELECT t.query_id, d.lang, d.source
  FROM topk t JOIN documents d USING (doc_id)
),
f AS (
  SELECT query_id, 'lang' AS facet, lang AS val, count(*) AS n
  FROM j GROUP BY query_id, lang
  UNION ALL
  SELECT query_id, 'source' AS facet, source AS val, count(*) AS n
  FROM j GROUP BY query_id, source
)
SELECT CAST(query_id AS BIGINT) AS query_id, facet, val,
       CAST(n AS BIGINT) AS n
FROM f ORDER BY query_id, facet, val
"""


def regex_search_sql() -> str:
    """Regex scan (ops/textstats.regex_search): RE2 partial match on
    both sides, one leg per pattern."""
    from snowball_java_ray.constants import REGEX_QUERIES

    legs = "\nUNION ALL\n".join(
        f"SELECT CAST({pid} AS BIGINT) AS pattern_id, doc_id FROM documents "
        f"WHERE regexp_matches(text, '{pat}')"
        for pid, pat in enumerate(REGEX_QUERIES)
    )
    return f"{legs}\nORDER BY pattern_id, doc_id\n"


def term_suggest_sql(max_dist: int = 2, top_k: int = 3) -> str:
    """Fuzzy dictionary lookup (ops/textstats.term_suggest): trigram
    -blocked candidates, DuckDB levenshtein verify, ranked (dist ASC,
    df DESC, term ASC)."""
    from snowball_java_ray.ops.textstats import misspelled_query_terms

    mis_rows = ", ".join(
        "('{}')".format(m.replace("'", "''")) for m in misspelled_query_terms()
    )
    tri = "unnest(list_transform(generate_series(1, len({c}) - 2), i -> substr({c}, i, 3)))"
    return f"""
WITH {tokenize_cte()},
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
mis(qterm) AS (VALUES {mis_rows}),
qtris AS (
  SELECT DISTINCT qterm, tri FROM (
    SELECT qterm, {tri.format(c="qterm")} AS tri FROM mis
  )
),
vtris AS (
  SELECT DISTINCT term, tri FROM (
    SELECT term, {tri.format(c="term")} AS tri FROM dfreq
  )
),
cand AS (
  SELECT DISTINCT q.qterm, v.term
  FROM qtris q JOIN vtris v ON q.tri = v.tri
),
scored AS (
  SELECT c.qterm, c.term, levenshtein(c.qterm, c.term) AS dist, d.df
  FROM cand c JOIN dfreq d ON c.term = d.term
),
ranked AS (
  SELECT qterm, term, dist, df,
         row_number() OVER (
           PARTITION BY qterm ORDER BY dist ASC, df DESC, term ASC
         ) AS rank
  FROM scored WHERE dist <= {max_dist}
)
SELECT qterm AS query_term, CAST(rank AS INT) AS rank, term,
       CAST(dist AS BIGINT) AS dist, df
FROM ranked WHERE rank <= {top_k}
ORDER BY query_term, rank
"""


def bm25_snippets_sql() -> str:
    """Snippets for the reference-query top-k
    (pipelines/api.bm25_snippets_pipeline): earliest analyzed-term
    substring position in lower(text) (1-based), +/-SNIPPET_RADIUS raw
    window."""
    from snowball_java_ray.constants import SNIPPET_RADIUS

    r = SNIPPET_RADIUS
    return f"""
WITH topk AS (SELECT * FROM ({bm25_topk_sql()}) t),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
pos AS (
  SELECT k.query_id, k.rank, k.doc_id,
         min(CASE WHEN position(q.term IN lower(d.text)) > 0
                  THEN position(q.term IN lower(d.text)) END) AS p
  FROM topk k
  JOIN qterms q ON q.query_id = k.query_id
  JOIN documents d ON d.doc_id = k.doc_id
  GROUP BY k.query_id, k.rank, k.doc_id
)
SELECT pos.query_id, pos.rank, pos.doc_id,
       CAST(pos.p AS BIGINT) AS pos,
       substr(d.text, greatest(1, pos.p - {r}), {2 * r + 1}) AS snippet
FROM pos JOIN documents d ON d.doc_id = pos.doc_id
WHERE pos.p IS NOT NULL
ORDER BY pos.query_id, pos.rank
"""


def more_like_this_sql(top_k: int = TOP_K) -> str:
    """Related-document retrieval (pipelines/api.more_like_this
    _pipeline): query docs = doc_id < MLT_N_QUERY_DOCS, query terms =
    top MLT_TERMS by round(tf*idf, RANK) DESC, term ASC; BM25 scoring
    identical to bm25_topk_sql with the query doc excluded."""
    from snowball_java_ray.constants import MLT_N_QUERY_DOCS, MLT_TERMS

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qtfidf AS (
  SELECT tf.doc_id AS qid, tf.term,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln((meta.n_docs - df.df + 0.5)
                                     / (df.df + 0.5) + 1.0),
                          {RANK_ROUND_DECIMALS}) DESC,
                    tf.term ASC
         ) AS rk
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN meta
  WHERE tf.doc_id < {MLT_N_QUERY_DOCS}
),
qterms AS (SELECT qid, term FROM qtfidf WHERE rk <= {MLT_TERMS}),
scores AS (
  SELECT q.qid AS query_doc_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  WHERE tf.doc_id <> q.qid
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT query_doc_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_doc_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT query_doc_id, CAST(rank AS INT) AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_doc_id, rank
"""


def lsh_ann_sql() -> str:
    """Sign-LSH ANN oracle: the md5-derived hyperplanes are embedded as
    double literals (identical floats to ops/ann.lsh_planes — repr
    round-trips), bucket keys via list_inner_product sign bits, the
    1-bit multiprobe candidate rule is bit_count(xor(codes)) <= 1, and
    verification/ranking mirror ann_topk_sql."""
    from snowball_java_ray.constants import (
        ANN_N_QUERIES,
        ANN_TOP_K,
    )

    code_expr = _lsh_code_expr()
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
coded AS (
  SELECT vec_id, e,
         {code_expr} AS code
  FROM emb
),
q AS (SELECT * FROM coded WHERE vec_id < {ANN_N_QUERIES}),
cand AS (
  SELECT q.vec_id AS query_vec_id, c.vec_id,
         list_cosine_similarity(q.e, c.e) AS cos
  FROM q JOIN coded c
    ON c.vec_id <> q.vec_id
   AND bit_count(xor(CAST(q.code AS BIGINT), CAST(c.code AS BIGINT))) <= 1
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_vec_id
           ORDER BY round(cos, 9) DESC, vec_id ASC
         ) AS rank
  FROM cand
)
SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
FROM ranked WHERE rank <= {ANN_TOP_K}
ORDER BY query_vec_id, rank
"""


def ivf_ann_sql() -> str:
    """IVF ANN oracle: centroids = vec_id in [ANN_N_QUERIES,
    ANN_N_QUERIES + IVF_K); assignment and probing both rank on
    (round(cos, 9) DESC, centroid_id ASC) — the identical keying the
    engine's numpy argmax/lexsort uses, so borderline cells agree."""
    from snowball_java_ray.constants import (
        ANN_N_QUERIES,
        ANN_TOP_K,
        IVF_K,
        IVF_NPROBE,
    )

    q, k = ANN_N_QUERIES, IVF_K
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
cent AS (
  SELECT vec_id - {q} AS cid, e FROM emb
  WHERE vec_id >= {q} AND vec_id < {q + k}
),
assign AS (
  SELECT v.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY round(list_cosine_similarity(v.e, c.e), 9) DESC,
                    c.cid ASC
         ) AS rnk
  FROM emb v CROSS JOIN cent c
),
cells AS (SELECT vec_id, cid FROM assign WHERE rnk = 1),
qprobe AS (
  SELECT vec_id AS qid, cid FROM assign
  WHERE vec_id < {q} AND rnk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.qid AS query_vec_id, cv.vec_id,
         list_cosine_similarity(qe.e, ve.e) AS cos
  FROM qprobe p
  JOIN cells cv ON cv.cid = p.cid AND cv.vec_id <> p.qid
  JOIN emb qe ON qe.vec_id = p.qid
  JOIN emb ve ON ve.vec_id = cv.vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_vec_id
           ORDER BY round(cos, 9) DESC, vec_id ASC
         ) AS rank
  FROM cand
)
SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
FROM ranked WHERE rank <= {ANN_TOP_K}
ORDER BY query_vec_id, rank
"""


def _lsh_code_expr(dim: int = 64) -> str:
    """The sign-LSH bucket-code SQL expression over column ``e`` with
    the md5-derived plane literals (shared by lsh_ann_sql and
    embed_dup_lsh_sql)."""
    from snowball_java_ray.constants import ANN_LSH_PLANES
    from snowball_java_ray.ops.ann import lsh_planes

    planes = lsh_planes(ANN_LSH_PLANES, dim)
    terms = []
    for pidx in range(ANN_LSH_PLANES):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[pidx]) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product(e, {lit}) > 0"
            f" THEN {1 << pidx} ELSE 0 END)"
        )
    return "\n       + ".join(terms)


def embed_dup_lsh_sql() -> str:
    """LSH-blocked embedding near-dup oracle: candidates are pairs
    whose sign-LSH codes differ in <= 1 bit (the engine's probe rule,
    byte-identical plane literals), verified at the cosine threshold.
    Defines the approximate operator's semantics exactly."""
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
coded AS (
  SELECT vec_id, e,
         {_lsh_code_expr()} AS code
  FROM emb
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS cos
FROM coded a JOIN coded b
  ON a.vec_id < b.vec_id
 AND bit_count(xor(CAST(a.code AS BIGINT), CAST(b.code AS BIGINT))) <= 1
WHERE list_cosine_similarity(a.e, b.e) >= {EMBED_COS_THRESHOLD}
ORDER BY vec_a, vec_b
"""


# --- sampling / splitting (ops/sampling.py) ---------------------------

_HASH_UNIT = ("(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
              " / 1152921504606846976.0)")


def train_val_test_split_sql() -> str:
    from snowball_java_ray.ops.sampling import TRAIN_FRAC, VAL_FRAC

    u = _HASH_UNIT.format(col="doc_id")
    return f"""
SELECT doc_id,
       CASE WHEN {u} < {TRAIN_FRAC} THEN 'train'
            WHEN {u} < {TRAIN_FRAC + VAL_FRAC} THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


def split_counts_sql() -> str:
    from snowball_java_ray.ops.sampling import TRAIN_FRAC, VAL_FRAC

    u = _HASH_UNIT.format(col="d.doc_id")
    return f"""
WITH {tokenize_cte()},
tok AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
labeled AS (
  SELECT d.doc_id, coalesce(tok.n_tokens, 0) AS n_tokens,
         CASE WHEN {u} < {TRAIN_FRAC} THEN 'train'
              WHEN {u} < {TRAIN_FRAC + VAL_FRAC} THEN 'val'
              ELSE 'test' END AS split
  FROM documents d LEFT JOIN tok ON d.doc_id = tok.doc_id
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM labeled GROUP BY split ORDER BY split
"""


def stratified_sample_sql() -> str:
    from snowball_java_ray.ops.sampling import STRATA_K

    u = _HASH_UNIT.format(col="doc_id")
    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY {u} ASC, doc_id ASC
         ) AS rnk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rnk <= {STRATA_K}
ORDER BY lang, doc_id
"""


def pack_sequences_sql() -> str:
    from snowball_java_ray.ops.sampling import SEQ_LEN

    return f"""
WITH {tokenize_cte()},
tok AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
stream AS (
  SELECT d.doc_id, coalesce(tok.n_tokens, 0) AS n_tokens,
         CAST(coalesce(sum(coalesce(tok.n_tokens, 0)) OVER (
           ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
  FROM documents d LEFT JOIN tok ON d.doc_id = tok.doc_id
)
SELECT doc_id, n_tokens, token_offset,
       token_offset // {SEQ_LEN} AS seq_id
FROM stream ORDER BY doc_id
"""


# --- Snowball workload oracles (serial-twin parquet, not pure SQL) ----
# The Snowball layer's input is the synthesized tagged corpus, not a
# DuckDB-registered view, and M1-M7 extraction needs positional regex
# matching RE2-based SQL cannot express. The oracle is therefore the
# serial single-process twin (oracle_snowball.py): generating the SQL
# string runs the twin and writes its output parquet, and the SQL just
# reads it — the driver's hash compare then certifies distributed ==
# serial semantics (VERDICT r1 gap #1; blessed alternative (b)).

_SNOWBALL_ORACLE_PATHS: dict[str, str] | None = None


def _snowball_oracle_paths() -> dict[str, str]:
    global _SNOWBALL_ORACLE_PATHS
    if _SNOWBALL_ORACLE_PATHS is None:
        from snowball_java_ray.oracle_snowball import ensure_oracle_files

        _SNOWBALL_ORACLE_PATHS = ensure_oracle_files()
    return _SNOWBALL_ORACLE_PATHS


def snowball_extract_sql() -> str:
    return f"SELECT * FROM '{_snowball_oracle_paths()['snowball_extract']}'"


def snowball_e2e_sql() -> str:
    return f"SELECT * FROM '{_snowball_oracle_paths()['snowball_e2e']}'"


def snowball_patterns_sql() -> str:
    return f"SELECT * FROM '{_snowball_oracle_paths()['snowball_patterns']}'"


# --- multimodal family (ops/multimodal.py, documents-derived media) ----

_MEDIA_CTE = """media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS kind,
         CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                         ELSE 'video/mp4' END AS mime,
         text,
         CASE WHEN doc_id % 3 <> 0 THEN 250 * (doc_id % 17) + 250
              ELSE 0 END AS duration_ms
  FROM documents
)"""


def media_meta_sql() -> str:
    """Opaque-payload metadata: payload = utf-8 bytes of text, so
    octet_length/sha256 over the encoded blob replicate the engine's
    byte-level results exactly."""
    return f"""
WITH {_MEDIA_CTE}
SELECT media_id, kind, mime,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256,
       CASE WHEN kind = 'video'
            THEN (duration_ms + 499) // 500 ELSE 0 END AS n_frames
FROM media ORDER BY media_id
"""


def media_features_sql() -> str:
    """The deterministic sha-derived stand-in decoder, byte-replicated:
    feature[dim] = byte dim of sha256(payload) / 255.0."""
    return f"""
WITH {_MEDIA_CTE},
dims AS (SELECT unnest(generate_series(0, 15)) AS dim)
SELECT m.media_id, CAST(d.dim AS BIGINT) AS dim,
       round(('0x' || substr(sha256(m.text), 2 * d.dim + 1, 2))::BIGINT
             / 255.0, 6) AS value
FROM media m CROSS JOIN dims d
ORDER BY m.media_id, dim
"""


def video_frames_sql(every_ms: int = 500) -> str:
    return f"""
WITH {_MEDIA_CTE},
vids AS (SELECT media_id, duration_ms FROM media WHERE kind = 'video'),
frames AS (
  SELECT media_id,
         unnest(generate_series(0, (duration_ms + {every_ms} - 1)
                                    // {every_ms} - 1)) AS frame_idx
  FROM vids
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * {every_ms} AS BIGINT) AS ts_ms
FROM frames ORDER BY media_id, frame_idx
"""


def media_decode_sql() -> str:
    """Oracle for the REAL P6 PPM decode loop: re-derives each pixel
    from the digest rule (pixel j byte = sha256(text)[j % 32]) and
    aggregates the same channel means — it never parses the container,
    so a hash match certifies encode -> ship -> DECODE -> aggregate."""
    from snowball_java_ray.ops.multimodal import PPM_H, PPM_W

    npx = PPM_W * PPM_H * 3
    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents),
px AS (
  SELECT doc_id, j,
         ('0x' || substr(hx, 2 * (j % 32) + 1, 2))::INT AS b
  FROM d, generate_series(0, {npx - 1}) AS t(j)
)
SELECT doc_id AS media_id,
       {PPM_W} AS width, {PPM_H} AS height,
       round(avg(CASE WHEN j % 3 = 0 THEN b END), 6) AS mean_r,
       round(avg(CASE WHEN j % 3 = 1 THEN b END), 6) AS mean_g,
       round(avg(CASE WHEN j % 3 = 2 THEN b END), 6) AS mean_b
FROM px GROUP BY doc_id ORDER BY media_id
"""


def png_decode_sql() -> str:
    """Oracle for the REAL compressed PNG decode loop
    (ops/multimodal.png_decode): the pixel rule is the same digest
    tiling as media_decode (pixel j's byte = sha256(text)[j % 32]),
    so the oracle re-derives channel means without ever parsing the
    container — a hash match certifies zlib-DEFLATE encode -> ship ->
    chunk-walk/CRC/inflate/unfilter DECODE -> aggregate."""
    from snowball_java_ray.ops.multimodal import PPM_H, PPM_W

    npx = PPM_W * PPM_H * 3
    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents),
px AS (
  SELECT doc_id, j,
         ('0x' || substr(hx, 2 * (j % 32) + 1, 2))::INT AS b
  FROM d, generate_series(0, {npx - 1}) AS t(j)
)
SELECT doc_id AS media_id,
       {PPM_W} AS width, {PPM_H} AS height,
       round(avg(CASE WHEN j % 3 = 0 THEN b END), 6) AS mean_r,
       round(avg(CASE WHEN j % 3 = 1 THEN b END), 6) AS mean_g,
       round(avg(CASE WHEN j % 3 = 2 THEN b END), 6) AS mean_b
FROM px GROUP BY doc_id ORDER BY media_id
"""


def jpeg_decode_sql() -> str:
    """Oracle for the REAL baseline JPEG decode loop
    (ops/multimodal.jpeg_decode): the entry's images are
    constant-per-8x8-block — block (by, bx) = sha256(text) byte
    [2*by + bx] — the lossless fixed point of the DCT round-trip
    (all AC = 0; DC exact at Q_dc = 8), so decoded pixels equal the
    source rule and the oracle re-derives the integer aggregates
    without parsing the container. A hash match certifies the full
    DCT -> quantize -> Huffman-scan encode -> ship -> entropy DECODE
    -> IDCT -> aggregate loop on inputs where its output is provably
    exact (all 256 byte values round-trip-verified in pytest)."""
    from snowball_java_ray.ops.multimodal import JPEG_H, JPEG_W

    n_blocks = (JPEG_W // 8) * (JPEG_H // 8)
    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents),
b AS (
  SELECT doc_id,
         ('0x' || substr(hx, 2 * bi + 1, 2))::INT AS v
  FROM d, generate_series(0, {n_blocks - 1}) AS t(bi)
)
SELECT doc_id AS media_id,
       {JPEG_W} AS width, {JPEG_H} AS height,
       CAST(64 * sum(v) AS BIGINT) AS sum_gray,
       CAST(min(v) AS INT) AS min_gray,
       CAST(max(v) AS INT) AS max_gray
FROM b GROUP BY doc_id ORDER BY media_id
"""


def audio_decode_sql() -> str:
    """Oracle for the REAL RIFF/WAVE PCM16 decode loop: re-derives the
    samples from the digest rule (s[k] = d[2k%32]*256 + d[(2k+1)%32] -
    32768, n = 64 + doc_id % 64)."""
    from snowball_java_ray.ops.multimodal import WAV_RATE

    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx,
                  64 + doc_id % 64 AS n FROM documents),
s AS (
  SELECT doc_id, n,
         ('0x' || substr(hx, 2 * ((2 * k) % 32) + 1, 2))::INT * 256
       + ('0x' || substr(hx, 2 * ((2 * k + 1) % 32) + 1, 2))::INT
       - 32768 AS v
  FROM d, generate_series(0, 127) AS t(k)
  WHERE k < n
)
SELECT doc_id AS media_id,
       {WAV_RATE} AS sample_rate,
       n AS n_samples,
       (n * 1000) // {WAV_RATE} AS duration_ms,
       CAST(max(abs(v)) AS INT) AS max_abs,
       round(avg(abs(v)), 6) AS mean_abs
FROM s GROUP BY doc_id, n ORDER BY media_id
"""


def mp4_demux_sql() -> str:
    """Oracle for the REAL ISO BMFF container demux loop
    (ops/multimodal.mp4_demux): re-derives every published integer
    from the digest rule — n = 4 + doc_id % 8 frames, frame k is
    16 + d[k % 32] bytes, byte j of frame k is d[(k + j) % 32] —
    without parsing the container. A hash match certifies the whole
    mux (multi-chunk stsc/stco/stsz) -> ship -> box-walk DEMUX ->
    chunk-walk sample extraction -> aggregate loop, because the
    demuxer's outputs are provably the rule's values only if every
    reconstructed sample span was exactly right."""
    from snowball_java_ray.ops.multimodal import (
        MP4_FRAME_DUR,
        MP4_TIMESCALE,
    )

    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx,
                  4 + doc_id % 8 AS n FROM documents),
fs AS (
  SELECT doc_id, n, hx, k,
         16 + ('0x' || substr(hx, 2 * (k % 32) + 1, 2))::INT AS sz
  FROM d, generate_series(0, 11) AS t(k) WHERE k < n
),
agg_sz AS (
  SELECT doc_id, CAST(sum(sz) AS BIGINT) AS total_bytes,
         CAST(max(sz) AS INT) AS max_sample_size
  FROM fs GROUP BY doc_id
),
pb AS (
  SELECT fs.doc_id,
         ('0x' || substr(hx, 2 * ((k + j) % 32) + 1, 2))::INT AS b
  FROM fs, generate_series(0, 270) AS t2(j) WHERE j < sz
),
agg_pb AS (
  SELECT doc_id, CAST(sum(b) AS BIGINT) AS sum_payload
  FROM pb GROUP BY doc_id
)
SELECT d.doc_id AS media_id,
       CAST(64 + (d.doc_id % 4) * 16 AS INT) AS width,
       CAST(48 + (d.doc_id % 3) * 16 AS INT) AS height,
       CAST({MP4_TIMESCALE} AS INT) AS timescale,
       CAST(d.n * {MP4_FRAME_DUR} AS BIGINT) AS duration,
       CAST(d.n AS BIGINT) AS n_samples,
       agg_sz.total_bytes,
       agg_sz.max_sample_size,
       agg_pb.sum_payload
FROM d
JOIN agg_sz USING (doc_id)
JOIN agg_pb USING (doc_id)
ORDER BY media_id
"""


def events_pivot_sql() -> str:
    """Event-type pivot oracle: conditional aggregation per user,
    purchase revenue in exact integer cents (engine CAST mirrored)."""
    from snowball_java_ray.constants import PIVOT_EVENT_TYPES

    counts = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{ty}"
        for ty in PIVOT_EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {counts},
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
            AS DOUBLE) / 100 AS purchase_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def customers_no_big_order_sql() -> str:
    """NOT-EXISTS anti-join oracle for customers_no_big_order."""
    from snowball_java_ray.constants import HIGH_VALUE_ORDER

    return f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > {HIGH_VALUE_ORDER!r}
)
ORDER BY c_custkey
"""


def dedup_incremental_sql() -> str:
    """Incremental-dedup oracle: the cut point is computed from the
    corpus itself (floor(n_docs * frac)), exactly as the engine does
    from parquet metadata, so one SQL string serves every sf."""
    from snowball_java_ray.constants import INCREMENTAL_OLD_FRAC

    return f"""
WITH cut AS (
  SELECT CAST(floor(count(*) * {INCREMENTAL_OLD_FRAC!r}) AS BIGINT) AS c
  FROM documents
),
h AS (
  SELECT doc_id, md5(text) AS content_md5,
         doc_id < (SELECT c FROM cut) AS is_old
  FROM documents
)
SELECT content_md5,
       min(CASE WHEN NOT is_old THEN doc_id END) AS keep_doc_id,
       CAST(count(CASE WHEN NOT is_old THEN 1 END) AS BIGINT) AS n_new
FROM h
GROUP BY content_md5
HAVING max(CASE WHEN is_old THEN 1 ELSE 0 END) = 0
   AND count(CASE WHEN NOT is_old THEN 1 END) > 0
ORDER BY content_md5
"""


def table_profile_sql() -> str:
    """Column-profile oracle: one UNION ALL branch per profiled
    column. Numeric min/max as DOUBLE (timestamps via epoch_us),
    exact COUNT(DISTINCT), nulls as count(*) - count(col)."""
    from snowball_java_ray.constants import PROFILE_COLUMNS, PROFILE_TABLE

    branches = []
    for name, kind in PROFILE_COLUMNS:
        if kind == "str":
            min_num = max_num = "CAST(NULL AS DOUBLE)"
            min_str, max_str = f"min({name})", f"max({name})"
        else:
            expr = (
                f"epoch_us({name})" if kind == "ts" else name
            )
            min_num = f"CAST(min({expr}) AS DOUBLE)"
            max_num = f"CAST(max({expr}) AS DOUBLE)"
            min_str = max_str = "CAST(NULL AS VARCHAR)"
        branches.append(
            f"""SELECT '{name}' AS column_name,
       count(*) AS n_rows,
       CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_str} AS min_str, {max_str} AS max_str
FROM {PROFILE_TABLE}"""
        )
    body = "\nUNION ALL\n".join(branches)
    return f"SELECT * FROM (\n{body}\n) ORDER BY column_name\n"


def bm25_rank_eval_sql(top_k: int = TOP_K) -> str:
    """Rank-eval oracle: the bm25_topk ranked CTE joined against the
    boolean-AND relevance set; rr/recall are single divisions rounded
    to RANK_ROUND_DECIMALS, matching the engine exactly."""
    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
qn AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id),
rel AS (
  SELECT q.query_id, dt.doc_id
  FROM qterms q
  JOIN dt ON dt.term = q.term
  GROUP BY q.query_id, dt.doc_id
  HAVING count(*) = (SELECT n FROM qn WHERE qn.query_id = q.query_id)
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, count(*) AS hits_k, min(r.rank) AS first_rank
  FROM ranked r
  JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
  WHERE r.rank <= {top_k}
  GROUP BY r.query_id
)
SELECT CAST(n.query_id AS BIGINT) AS query_id,
       CAST(n.n_rel AS BIGINT) AS n_rel,
       CAST(coalesce(h.hits_k, 0) AS BIGINT) AS hits_k,
       floor(coalesce(1.0 / h.first_rank, 0.0) * 1000000 + 0.5)
         / 1000000 AS rr,
       floor(CAST(coalesce(h.hits_k, 0) AS DOUBLE) / n.n_rel
             * 1000000 + 0.5) / 1000000 AS recall_k
FROM nrel n LEFT JOIN hits h ON h.query_id = n.query_id
ORDER BY query_id
"""


def bm25_page2_sql() -> str:
    """search_after page-2 oracle: ranks TOP_K+1 .. 2*TOP_K of the
    same deterministic ranking."""
    return (
        f"SELECT * FROM (\n{bm25_topk_sql(top_k=2 * TOP_K)}\n)"
        f" WHERE rank > {TOP_K} ORDER BY query_id, rank\n"
    )


def kmeans_clusters_sql() -> str:
    """Deterministic k-means oracle: init from the KMEANS_K lowest
    vec_ids, KMEANS_ITERS quantized-mean update rounds, final argmax
    assignment — every step mirrors ops/ann.kmeans_clusters."""
    from snowball_java_ray.constants import KMEANS_ITERS, KMEANS_K

    ctes = [
        """e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)""",
        """dims AS (
  SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS d
  FROM e
)""",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {KMEANS_K})
)""",
    ]
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(f"""d{i} AS (
  SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS cos
  FROM e CROSS JOIN c{i - 1} c
)""")
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY round(cos, {RANK_ROUND_DECIMALS}) DESC, cid ASC
           ) AS rn
    FROM d{i}
  ) WHERE rn = 1
)""")
        ctes.append(f"""q{i} AS (
  SELECT a.cid, dm.d,
         sum(CAST(round(dm.x * 1000000) AS BIGINT)) AS s,
         count(*) AS n
  FROM dims dm JOIN a{i} a ON a.vec_id = dm.vec_id
  GROUP BY a.cid, dm.d
)""")
        ctes.append(f"""c{i} AS (
  SELECT cid, list(s / (n * 1000000.0) ORDER BY d) AS cv
  FROM q{i} GROUP BY cid
)""")
    ctes.append(f"""df AS (
  SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS cos
  FROM e CROSS JOIN c{KMEANS_ITERS} c
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT vec_id, cid AS cluster, round(cos, {SCORE_ROUND_DECIMALS}) AS cos
FROM (
  SELECT vec_id, cid, cos,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY round(cos, {RANK_ROUND_DECIMALS}) DESC, cid ASC
         ) AS rn
  FROM df
) WHERE rn = 1
ORDER BY vec_id
"""


def bm25_synonyms_sql(top_k: int = TOP_K) -> str:
    """Synonym-aware BM25 oracle: term -> pseudo-term mapping as a
    VALUES table; tf sums over the group per doc, df counts docs with
    ANY member, idf from that df — Lucene SynonymQuery semantics,
    exactly what score_query_synonyms computes."""
    from snowball_java_ray.constants import SYNONYM_GROUPS

    pairs = [
        (m, "|".join(sorted(g))) for g in SYNONYM_GROUPS for m in g
    ]
    syn_values = ", ".join(f"('{m}', '{gk}')" for m, gk in pairs)
    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
syn(term, gterm) AS (VALUES {syn_values}),
tfg AS (
  SELECT tf.doc_id, coalesce(s.gterm, tf.term) AS gterm,
         sum(tf.tf) AS tf
  FROM tf LEFT JOIN syn s ON s.term = tf.term
  GROUP BY tf.doc_id, coalesce(s.gterm, tf.term)
),
dfg AS (SELECT gterm, count(*) AS df FROM tfg GROUP BY gterm),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
qg AS (
  SELECT DISTINCT q.query_id, coalesce(s.gterm, q.term) AS gterm
  FROM qterms q LEFT JOIN syn s ON s.term = q.term
),
scores AS (
  SELECT q.query_id, tfg.doc_id,
         sum(
           ln((meta.n_docs - dfg.df + 0.5) / (dfg.df + 0.5) + 1.0)
           * tfg.tf * ({BM25_K1} + 1.0)
           / (tfg.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qg q
  JOIN tfg ON q.gterm = tfg.gterm
  JOIN dfg ON dfg.gterm = q.gterm
  JOIN dl ON dl.doc_id = tfg.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tfg.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def keywords_per_source_sql() -> str:
    """c-TF-IDF keywords oracle: weight = tf_src * ln(S / df_src),
    top KEYWORDS_K per source on the round-9 key."""
    from snowball_java_ray.constants import KEYWORDS_K

    return f"""
WITH {tokenize_cte()},
src_tf AS (
  SELECT d.source, t.term, count(*) AS tf
  FROM toks t JOIN documents d USING (doc_id)
  GROUP BY d.source, t.term
),
s AS (SELECT count(DISTINCT source) AS n FROM documents),
dft AS (SELECT term, count(*) AS df FROM src_tf GROUP BY term),
w AS (
  SELECT st.source, st.term,
         st.tf * ln((SELECT n FROM s) / (dft.df * 1.0)) AS weight
  FROM src_tf st JOIN dft USING (term)
),
r AS (
  SELECT source, term, weight,
         row_number() OVER (
           PARTITION BY source
           ORDER BY round(weight, {RANK_ROUND_DECIMALS}) DESC, term ASC
         ) AS rank
  FROM w
)
SELECT source, CAST(rank AS INT) AS rank, term,
       round(weight, {SCORE_ROUND_DECIMALS}) AS weight
FROM r WHERE rank <= {KEYWORDS_K}
ORDER BY source, rank
"""


def bm25_topk_upserted_sql(top_k: int = TOP_K) -> str:
    """Upsert oracle: stats over original + new versions (the
    pre-compaction segment contract), candidates exclude the
    tombstoned originals; new versions live at
    n_docs + (old_id - REM) // MOD with ' updated' appended."""
    from snowball_java_ray.constants import UPSERT_MOD, UPSERT_REM

    prelude = f"""corpus_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT (SELECT count(*) FROM documents)
           + CAST((doc_id - {UPSERT_REM}) // {UPSERT_MOD} AS BIGINT)
           AS doc_id,
         coalesce(text, '') || ' updated' AS text
  FROM documents WHERE doc_id % {UPSERT_MOD} = {UPSERT_REM}
),
"""
    cand = (
        "tf.doc_id NOT IN (SELECT doc_id FROM documents "
        f"WHERE doc_id % {UPSERT_MOD} = {UPSERT_REM})"
    )
    return bm25_topk_sql(
        top_k=top_k, table="corpus_all", prelude=prelude, cand_where=cand
    )


def bm25_boosted_sql(top_k: int = TOP_K) -> str:
    """Function-score oracle: per-(query, doc) BM25 sum multiplied by
    1 + ln(1 + doc_len / BOOST_DL_NORM)."""
    from snowball_java_ray.constants import BOOST_DL_NORM

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) * (1.0 + ln(1.0 + dl.doc_len / {BOOST_DL_NORM!r})) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id, dl.doc_len
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def weighted_sample_sql() -> str:
    """Importance-sampling oracle: same hash-unit acceptance rule."""
    from snowball_java_ray.constants import WEIGHTED_SAMPLE_SCALE

    u = _HASH_UNIT.format(col="doc_id")
    return f"""
SELECT doc_id, n_chars
FROM documents
WHERE {u} < least(1.0, n_chars / {WEIGHTED_SAMPLE_SCALE!r})
ORDER BY doc_id
"""


def orders_histogram_sql() -> str:
    """Fixed-width order-total histogram oracle (exact cents)."""
    from snowball_java_ray.constants import ORDER_HIST_WIDTH

    return f"""
SELECT CAST(floor(o_totalprice / {ORDER_HIST_WIDTH!r}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100 AS total_value
FROM orders GROUP BY bucket ORDER BY bucket
"""


def similar_users_sql() -> str:
    """User-similarity oracle: event-type count vectors, integer
    dot/norms, one double division per pair, round-9 rank."""
    from snowball_java_ray.constants import (
        PIVOT_EVENT_TYPES,
        SIMILAR_USERS_K,
        SIMILAR_USERS_PROBES,
    )

    counts = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{ty}"
        for ty in PIVOT_EVENT_TYPES
    )
    dot = " + ".join(f"p.n_{ty} * o.n_{ty}" for ty in PIVOT_EVENT_TYPES)
    p2 = " + ".join(f"p.n_{ty} * p.n_{ty}" for ty in PIVOT_EVENT_TYPES)
    o2 = " + ".join(f"o.n_{ty} * o.n_{ty}" for ty in PIVOT_EVENT_TYPES)
    return f"""
WITH piv AS (
  SELECT user_id,
       {counts}
  FROM events GROUP BY user_id
),
pairs AS (
  SELECT p.user_id AS probe_user, o.user_id AS user_id,
         CAST({dot} AS DOUBLE)
           / (sqrt(CAST({p2} AS DOUBLE)) * sqrt(CAST({o2} AS DOUBLE)))
           AS cos
  FROM piv p CROSS JOIN piv o
  WHERE p.user_id < {SIMILAR_USERS_PROBES} AND o.user_id <> p.user_id
),
r AS (
  SELECT probe_user, user_id, cos,
         row_number() OVER (
           PARTITION BY probe_user
           ORDER BY round(cos, {RANK_ROUND_DECIMALS}) DESC, user_id ASC
         ) AS rank
  FROM pairs
)
SELECT probe_user, CAST(rank AS INT) AS rank, user_id,
       round(cos, {SCORE_ROUND_DECIMALS}) AS cos
FROM r WHERE rank <= {SIMILAR_USERS_K}
ORDER BY probe_user, rank
"""


def bm25_fielded_sql(top_k: int = TOP_K) -> str:
    """Field-boosted oracle: rebuild each doc as TITLE_BOOST copies of
    its first TITLE_TOKENS analyzed tokens + the body, then plain
    BM25 — token-stream-identical to the engine's re-encoded corpus."""
    from snowball_java_ray.constants import TITLE_BOOST, TITLE_TOKENS

    prelude = f"""raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
fagg AS (
  SELECT doc_id,
         array_to_string(list(term ORDER BY pos)
           FILTER (WHERE pos <= {TITLE_TOKENS}), ' ') AS title,
         array_to_string(list(term ORDER BY pos)
           FILTER (WHERE pos > {TITLE_TOKENS}), ' ') AS body
  FROM flt GROUP BY doc_id
),
corpus_f AS (
  SELECT d.doc_id,
         repeat(coalesce(f.title, '') || ' ', {TITLE_BOOST})
           || coalesce(f.body, '') AS text
  FROM documents d LEFT JOIN fagg f USING (doc_id)
),
"""
    return bm25_topk_sql(top_k=top_k, table="corpus_f", prelude=prelude)


def event_pattern_match_sql() -> str:
    """CEP oracle: ordered per-user initial string + non-overlapping
    regexp match count (DuckDB regexp_extract_all, same RE2 class)."""
    from snowball_java_ray.constants import EVENT_PATTERN

    return f"""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, '{EVENT_PATTERN}')) AS BIGINT)
         AS n_matches
FROM seq
WHERE len(regexp_extract_all(s, '{EVENT_PATTERN}')) > 0
ORDER BY user_id
"""


def key_skew_report_sql() -> str:
    """Key-skew oracle: one CTE per audited (table, key)."""
    from snowball_java_ray.constants import SKEW_KEYS

    ctes = []
    branches = []
    for i, (table, key) in enumerate(SKEW_KEYS):
        ctes.append(
            f"c{i} AS (SELECT CAST({key} AS VARCHAR) AS ks, "
            f"count(*) AS cnt FROM {table} GROUP BY 1)"
        )
        branches.append(f"""SELECT '{table}.{key}' AS key_name,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_count,
       min(ks) FILTER (WHERE cnt = (SELECT max(cnt) FROM c{i}))
         AS hot_key,
       round(max(cnt) * count(*) * 1.0 / sum(cnt), 6) AS skew
FROM c{i}""")
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(branches)
        + "\n) ORDER BY key_name\n"
    )


def events_rollup_sql() -> str:
    """ROLLUP oracle: (event_type, day) -> (event_type) -> total,
    exact integer cents."""
    return """
WITH e AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS DOUBLE) / 100 AS total_value
FROM e
GROUP BY ROLLUP(event_type, day)
ORDER BY event_type, day
"""


def doc_deciles_sql() -> str:
    """NTILE oracle over the global (doc_len, doc_id) order; docs with
    zero analyzed tokens keep doc_len 0 via the LEFT JOIN."""
    return f"""
WITH {tokenize_cte()},
cnt AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
nt AS (
  SELECT d.doc_id, coalesce(c.n, 0) AS doc_len
  FROM documents d LEFT JOIN cnt c USING (doc_id)
)
SELECT doc_id, doc_len,
       CAST(ntile(10) OVER (ORDER BY doc_len, doc_id) AS BIGINT)
         AS decile
FROM nt ORDER BY doc_id
"""


def bm25_msm_sql(top_k: int = TOP_K) -> str:
    """minimum_should_match oracle: HAVING the distinct-matched-term
    count >= least(MSM_MIN, n query terms)."""
    from snowball_java_ray.constants import MSM_MIN

    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
qn AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY query_id),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id
  HAVING count(*) >=
    least({MSM_MIN}, (SELECT n FROM qn WHERE qn.query_id = q.query_id))
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def ann_filtered_sql() -> str:
    """Filtered-ANN oracle: candidates restricted to the filter label
    BEFORE the top-k cut (pre-filter semantics)."""
    from snowball_java_ray.constants import (
        ANN_FILTER_LABEL,
        ANN_N_QUERIES,
        ANN_TOP_K,
    )

    return f"""
WITH q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id < {ANN_N_QUERIES}
),
c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE label = {ANN_FILTER_LABEL}
),
s AS (
  SELECT q.qid AS query_vec_id, c.vec_id,
         list_cosine_similarity(q.e, c.e) AS cos
  FROM q JOIN c ON c.vec_id <> q.qid
),
r AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_vec_id
           ORDER BY round(cos, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id, round(cos, 6) AS cos
FROM r WHERE rank <= {ANN_TOP_K}
ORDER BY query_vec_id, rank
"""


def chunk_documents_sql() -> str:
    """Chunking oracle: positional analyzed stream + a range() of
    window starts per doc; chunk text rebuilt in position order."""
    from snowball_java_ray.constants import CHUNK_STRIDE, CHUNK_TOKENS

    return f"""
WITH raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
dltab AS (SELECT doc_id, count(*) AS dl FROM flt GROUP BY doc_id),
starts AS (
  SELECT doc_id, unnest(range(0, dl, {CHUNK_STRIDE})) AS start_pos
  FROM dltab
),
members AS (
  SELECT s.doc_id, s.start_pos, f.term, f.pos
  FROM starts s
  JOIN flt f ON f.doc_id = s.doc_id
    AND f.pos > s.start_pos
    AND f.pos <= s.start_pos + {CHUNK_TOKENS}
)
SELECT doc_id,
       CAST(start_pos / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start_pos AS BIGINT) AS start_pos,
       CAST(count(*) AS BIGINT) AS n_tokens,
       array_to_string(list(term ORDER BY pos), ' ') AS chunk_text
FROM members
GROUP BY doc_id, start_pos
ORDER BY doc_id, chunk_id
"""


def bm25_chunks_sql(top_k: int = TOP_K) -> str:
    """Passage-retrieval oracle: BM25 over the chunk windows (chunk
    tokens ARE the window members — no re-tokenize), max-pooled per
    parent doc, ranked with the usual round-9/round-6 discipline."""
    from snowball_java_ray.constants import (
        CHUNK_ID_BASE,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    return f"""
WITH raw AS (
  SELECT doc_id,
         string_split_regex(lower(text), '{TOKEN_SPLIT_PATTERN}') AS tl
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(tl) AS term,
         unnest(range(1, len(tl) + 1)) AS rawpos
  FROM raw
),
flt AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tokpos
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
dltab AS (SELECT doc_id, count(*) AS dl FROM flt GROUP BY doc_id),
starts AS (
  SELECT doc_id, unnest(range(0, dl, {CHUNK_STRIDE})) AS start_pos
  FROM dltab
),
members AS (
  SELECT s.doc_id,
         s.doc_id * {CHUNK_ID_BASE}
           + CAST(s.start_pos / {CHUNK_STRIDE} AS BIGINT) AS cid,
         f.term
  FROM starts s
  JOIN flt f ON f.doc_id = s.doc_id
    AND f.pos > s.start_pos
    AND f.pos <= s.start_pos + {CHUNK_TOKENS}
),
tfc AS (
  SELECT cid, min(doc_id) AS parent, term, count(*) AS tf
  FROM members GROUP BY cid, term
),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
dlc AS (SELECT cid, count(*) AS doc_len FROM members GROUP BY cid),
meta AS (
  SELECT (SELECT count(*) FROM starts) AS n_docs,
         (SELECT count(*) FROM members) * 1.0
           / (SELECT count(*) FROM starts) AS avgdl
),
qraw AS (
  SELECT query_id,
         unnest(string_split_regex(lower(qtext), '{TOKEN_SPLIT_PATTERN}')) AS term
  FROM {queries_values_sql()}
),
qterms AS (
  SELECT DISTINCT query_id, term FROM qraw
  WHERE term <> '' AND NOT regexp_full_match(term, '{_NUM_SQL}')
    AND term NOT IN ({_STOPLIST_SQL})
),
scores AS (
  SELECT q.query_id, tfc.cid, tfc.parent,
         sum(
           ln((meta.n_docs - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0)
           * tfc.tf * ({BM25_K1} + 1.0)
           / (tfc.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dlc.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tfc ON q.term = tfc.term
  JOIN dfc ON dfc.term = q.term
  JOIN dlc ON dlc.cid = tfc.cid
  CROSS JOIN meta
  GROUP BY q.query_id, tfc.cid, tfc.parent
),
pooled AS (
  SELECT query_id, parent AS doc_id, max(score) AS score
  FROM scores GROUP BY query_id, parent
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM pooled
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def top_sessions_sql(gap_minutes: int = 30) -> str:
    """Top-k sessions by exact-cents revenue (ties to lower user /
    session), over the gaps-and-islands sessionization."""
    return f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL {gap_minutes} MINUTE
                 THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT *, CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM marked
),
agg AS (
  SELECT user_id, session_id,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM sessions GROUP BY user_id, session_id
),
ranked AS (
  SELECT *, row_number() OVER (
    ORDER BY cents DESC, user_id ASC, session_id ASC) AS rank
  FROM agg
)
SELECT CAST(rank AS INT) AS rank, user_id, session_id, n_events,
       CAST(cents AS DOUBLE) / 100 AS total_value
FROM ranked WHERE rank <= {TOP_K}
ORDER BY rank
"""


def media_resize_sql() -> str:
    """Oracle for the REAL decode + nearest-neighbor resize: target
    pixel (x, y, c) reads digest byte
    (3 * (floor(y*H/h2)*W + floor(x*W/w2)) + c) % 32."""
    from snowball_java_ray.ops.multimodal import (
        PPM_H,
        PPM_W,
        RESIZE_H,
        RESIZE_W,
    )

    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents),
tgt AS (
  SELECT doc_id, hx, x, y, c,
         (3 * (((y * {PPM_H}) // {RESIZE_H}) * {PPM_W}
               + ((x * {PPM_W}) // {RESIZE_W})) + c) % 32 AS bytepos
  FROM d,
       generate_series(0, {RESIZE_W - 1}) AS tx(x),
       generate_series(0, {RESIZE_H - 1}) AS ty(y),
       generate_series(0, 2) AS tc(c)
),
px AS (
  SELECT doc_id, c,
         ('0x' || substr(hx, 2 * bytepos + 1, 2))::INT AS b
  FROM tgt
)
SELECT doc_id AS media_id,
       {RESIZE_W} AS width, {RESIZE_H} AS height,
       round(avg(CASE WHEN c = 0 THEN b END), 6) AS mean_r,
       round(avg(CASE WHEN c = 1 THEN b END), 6) AS mean_g,
       round(avg(CASE WHEN c = 2 THEN b END), 6) AS mean_b
FROM px GROUP BY doc_id ORDER BY media_id
"""


def audio_decimate_sql() -> str:
    """Oracle for decode + decimation: kept sample k reads the digest
    rule at source index k * DECIMATE_FACTOR; n kept =
    ceil(n / factor)."""
    from snowball_java_ray.ops.multimodal import DECIMATE_FACTOR, WAV_RATE

    f = DECIMATE_FACTOR
    return f"""
WITH d AS (SELECT doc_id, sha256(coalesce(text, '')) AS hx,
                  64 + doc_id % 64 AS n FROM documents),
s AS (
  SELECT doc_id, n,
         ('0x' || substr(hx, 2 * ((2 * (k * {f})) % 32) + 1, 2))::INT * 256
       + ('0x' || substr(hx, 2 * ((2 * (k * {f}) + 1) % 32) + 1, 2))::INT
       - 32768 AS v
  FROM d, generate_series(0, 127) AS t(k)
  WHERE k * {f} < n
)
SELECT doc_id AS media_id,
       {WAV_RATE // f} AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(max(abs(v)) AS INT) AS max_abs,
       round(avg(abs(v)), 6) AS mean_abs
FROM s GROUP BY doc_id ORDER BY media_id
"""


def events_regression_sql() -> str:
    """Least-squares oracle on exact integer sufficient statistics
    (HUGEINT — same values as the engine's arbitrary-precision
    reduce); slope/intercept mirror the engine's float op sequence."""
    return f"""
WITH s AS (
  SELECT count(*) AS n,
         sum(CAST(hour(ts) AS HUGEINT)) AS sx,
         sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS sy,
         sum(CAST(hour(ts) AS HUGEINT)
             * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS sxy,
         sum(CAST(hour(ts) AS HUGEINT)
             * CAST(hour(ts) AS HUGEINT)) AS sxx
  FROM events
)
SELECT CAST(n AS BIGINT) AS n,
       {grid6('''CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)''')} AS slope,
       {grid6('''(CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)''')} AS intercept
FROM s
"""


def corr_matrix_sql() -> str:
    """Pearson-correlation oracle: exact HUGEINT sufficient statistics
    per pair, float expression mirroring the engine verbatim. Published
    on the 6-dp SCORE grid (both engines round the same exact-integer
    expression, so the grids coincide bitwise)."""
    from snowball_java_ray.constants import CORR_COLUMNS

    cols = [c for c, _ in CORR_COLUMNS]
    scales = dict(CORR_COLUMNS)
    branches = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            qa = f"CAST(round({a} * {scales[a]}) AS HUGEINT)"
            qb = f"CAST(round({b} * {scales[b]}) AS HUGEINT)"
            expr = f"""CAST(count(*) * sum({qa} * {qb})
                  - sum({qa}) * sum({qb}) AS DOUBLE)
             / (sqrt(CAST(count(*) * sum({qa} * {qa})
                          - sum({qa}) * sum({qa}) AS DOUBLE))
                * sqrt(CAST(count(*) * sum({qb} * {qb})
                            - sum({qb}) * sum({qb}) AS DOUBLE)))"""
            branches.append(
                f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       {grid6(expr)} AS corr
FROM lineitem"""
            )
    body = "\nUNION ALL\n".join(branches)
    return f"SELECT * FROM (\n{body}\n) ORDER BY col_a, col_b\n"


def bloom_probe_sql() -> str:
    """Bloom-membership oracle: recomputes the identical md5-derived
    bit positions for the vocabulary and every probe — false positives
    included — so the probabilistic structure is value-checkable."""
    from snowball_java_ray.constants import (
        BLOOM_BITS,
        BLOOM_K,
        REFERENCE_QUERIES,
    )
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import misspelled_query_terms

    present = sorted({t for q in REFERENCE_QUERIES for t in tokenize(q)})
    probes = sorted(set(present) | set(misspelled_query_terms()))
    probe_values = ", ".join(f"('{p}')" for p in probes)
    h = _MD5INT60.format(
        expr="term || '|' || CAST(i AS VARCHAR)"
    )
    hp = _MD5INT60.format(
        expr="probe || '|' || CAST(i AS VARCHAR)"
    )
    return f"""
WITH {tokenize_cte()},
vocab AS (SELECT DISTINCT term FROM toks),
pos AS (
  SELECT DISTINCT {h} % {BLOOM_BITS} AS p
  FROM vocab, generate_series(0, {BLOOM_K - 1}) AS t(i)
),
probes(probe) AS (VALUES {probe_values}),
probe_pos AS (
  SELECT probe, {hp} % {BLOOM_BITS} AS p
  FROM probes, generate_series(0, {BLOOM_K - 1}) AS t(i)
),
hits AS (
  SELECT probe,
         CAST(sum(CASE WHEN p IN (SELECT p FROM pos)
                  THEN 1 ELSE 0 END) AS BIGINT) AS matched
  FROM probe_pos GROUP BY probe
)
SELECT h.probe,
       h.matched = {BLOOM_K} AS in_bloom,
       h.probe IN (SELECT term FROM vocab) AS in_vocab,
       (h.matched = {BLOOM_K})
         AND h.probe NOT IN (SELECT term FROM vocab) AS false_positive
FROM hits h
ORDER BY h.probe
"""


def cms_counts_sql() -> str:
    """Count-min oracle: the same md5-derived bucket rows, bucket
    sums over term collection frequencies, min across depth rows."""
    from snowball_java_ray.constants import (
        CMS_DEPTH,
        CMS_WIDTH,
        REFERENCE_QUERIES,
    )
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import misspelled_query_terms

    present = sorted({t for q in REFERENCE_QUERIES for t in tokenize(q)})
    probes = sorted(set(present) | set(misspelled_query_terms()))
    probe_values = ", ".join(f"('{p}')" for p in probes)
    h = _MD5INT60.format(expr="term || '|cms' || CAST(i AS VARCHAR)")
    hp = _MD5INT60.format(expr="probe || '|cms' || CAST(i AS VARCHAR)")
    return f"""
WITH {tokenize_cte()},
cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
bsum AS (
  SELECT i, {h} % {CMS_WIDTH} AS b, sum(cf.cf) AS s
  FROM cf, generate_series(0, {CMS_DEPTH - 1}) AS t(i)
  GROUP BY i, b
),
probes(probe) AS (VALUES {probe_values}),
pb AS (
  SELECT probe, i, {hp} % {CMS_WIDTH} AS b
  FROM probes, generate_series(0, {CMS_DEPTH - 1}) AS t(i)
)
SELECT pb.probe,
       CAST(min(coalesce(bsum.s, 0)) AS BIGINT) AS est_cf,
       CAST(coalesce(min(cf.cf), 0) AS BIGINT) AS exact_cf
FROM pb
LEFT JOIN bsum ON bsum.i = pb.i AND bsum.b = pb.b
LEFT JOIN cf ON cf.term = pb.probe
GROUP BY pb.probe
ORDER BY pb.probe
"""


def bm25_corrected_sql(top_k: int = TOP_K, max_dist: int = 2) -> str:
    """Spell-corrected retrieval oracle: the misspelled (query_id,
    token) pairs as VALUES, the term_suggest correction rule as a
    rank-1 CTE, then the standard BM25 ranking over the corrected
    distinct term sets."""
    from snowball_java_ray.constants import REFERENCE_QUERIES
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import misspell_text

    pairs = sorted(
        {
            (i, t)
            for i, q in enumerate(REFERENCE_QUERIES)
            for t in tokenize(misspell_text(q))
        }
    )
    mis_rows = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in pairs
    )
    tri = ("unnest(list_transform(generate_series(1, len({c}) - 2),"
           " i -> substr({c}, i, 3)))")
    return f"""
WITH {tokenize_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY doc_id),
meta AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
mis(query_id, qterm) AS (VALUES {mis_rows}),
probes AS (SELECT DISTINCT qterm FROM mis),
qtris AS (
  SELECT DISTINCT qterm, tri FROM (
    SELECT qterm, {tri.format(c="qterm")} AS tri FROM probes
  )
),
vtris AS (
  SELECT DISTINCT term, tri FROM (
    SELECT term, {tri.format(c="term")} AS tri FROM df
  )
),
cand AS (
  SELECT DISTINCT q.qterm, v.term
  FROM qtris q JOIN vtris v ON q.tri = v.tri
),
scored_c AS (
  SELECT c.qterm, c.term, levenshtein(c.qterm, c.term) AS dist, d.df
  FROM cand c JOIN df d ON c.term = d.term
),
best AS (
  SELECT qterm, term FROM (
    SELECT qterm, term,
           row_number() OVER (
             PARTITION BY qterm ORDER BY dist ASC, df DESC, term ASC
           ) AS rnk
    FROM scored_c WHERE dist <= {max_dist}
  ) WHERE rnk = 1
),
qterms AS (
  SELECT DISTINCT m.query_id, coalesce(b.term, m.qterm) AS term
  FROM mis m LEFT JOIN best b ON b.qterm = m.qterm
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln((meta.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl.doc_len / meta.avgdl))
         ) AS score
  FROM qterms q
  JOIN tf ON q.term = tf.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN meta
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND_DECIMALS}) DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       doc_id, round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= {top_k}
ORDER BY query_id, rank
"""


def lang_mismatch_sql() -> str:
    """Metadata-vs-signal audit oracle: langid's own vote (same
    wordlists + tie rule) compared against the stored lang column."""
    from snowball_java_ray.ops.textstats import LANG_WORDLISTS

    langs = sorted(LANG_WORDLISTS)
    wl_rows = ", ".join(
        f"('{lang}', '{w}')" for lang in langs
        for w in LANG_WORDLISTS[lang]
    )
    return f"""
WITH raw AS (
  SELECT doc_id, unnest({_RAW_TOKS}) AS w FROM documents
),
wl(lang, w) AS (VALUES {wl_rows}),
hits AS (
  SELECT raw.doc_id, wl.lang, count(*) AS n
  FROM raw JOIN wl ON raw.w = wl.w
  GROUP BY raw.doc_id, wl.lang
),
best AS (
  SELECT doc_id, lang, n,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, d.lang,
       CASE WHEN b.n IS NULL OR b.n = 0 THEN 'unknown' ELSE b.lang END
         AS pred_lang
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
WHERE d.lang <> (
  CASE WHEN b.n IS NULL OR b.n = 0 THEN 'unknown' ELSE b.lang END
)
ORDER BY d.doc_id
"""


def source_dup_rates_sql() -> str:
    """Per-source duplication-rate oracle (same digest + division)."""
    return """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


def nation_revenue_share_sql() -> str:
    """Share-of-total oracle: exact-cents nation revenue over the
    exact grand total (same single division)."""
    return f"""
WITH rev AS (
  SELECT n.n_name,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
)
SELECT n_name,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       floor(CAST(cents AS DOUBLE)
             / CAST((SELECT sum(cents) FROM rev) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS share
FROM rev ORDER BY n_name
"""
