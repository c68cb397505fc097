"""Single source of truth for analyzer + scoring parameters.

Everything here is consumed BOTH by the Ray engine (functions/text.py,
stages/score.py) and by the DuckDB oracle-SQL generator (sqlgen.py), so
the engine and its correctness oracle share one definition of
"tokenize" and "BM25".

Reference lineage (/root/reference/snowball/src/...):
- normalization semantics follow vsm/TermsVector.java:16-36 (tag strip,
  lowercase, drop numeric/punct tokens, stopword removal) re-expressed
  as: lowercase -> split on non-[a-z0-9] runs -> drop empty -> drop
  pure-digit tokens -> drop stopwords.
- stopword handling follows nlp/Stopwords.java:16-33 (file-loaded set;
  here a fixed frozen list so SQL and Python agree byte-for-byte).
- BM25 (k1, b) is new query-side machinery required by the north rule
  (the reference keeps only DF + TF-IDF, vsm/VectorSpaceModel.java:25).
"""

from __future__ import annotations

# --- Tokenizer ---------------------------------------------------------
# Split on runs of anything outside [a-z0-9] after lowercasing. Both
# Python `re` and DuckDB's RE2 interpret this per code point on UTF-8
# strings, so accented characters become separators identically.
TOKEN_SPLIT_PATTERN = r"[^a-z0-9]+"
# Tokens that are entirely digits are dropped (TermsVector.java:22-26
# drops number/punct tokens).
NUMERIC_TOKEN_PATTERN = r"^[0-9]+$"

# Frozen stopword list (ordered, deduped). Head-of-Zipf words present in
# the synthetic corpora plus common English function words so stopword
# removal is observable in df counts (FIXTURES.md F5).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "in", "is", "it", "not", "of", "on", "or", "that", "the",
    "this", "to", "was", "were", "which", "with",
)
STOPWORD_SET = frozenset(STOPWORDS)

# --- BM25 --------------------------------------------------------------
# Standard Okapi BM25 with the Lucene-style non-negative idf:
#   idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )
#   score(q, d) = sum over distinct query terms t of
#                 idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
BM25_K1 = 1.2
BM25_B = 0.75
TOP_K = 10

# Ranking determinism: rank on round(score, RANK_ROUND_DECIMALS) DESC,
# doc_id ASC. Rounding before ranking makes the order immune to
# last-bit float differences between engines; emitted scores are
# rounded to SCORE_ROUND_DECIMALS.
RANK_ROUND_DECIMALS = 9
SCORE_ROUND_DECIMALS = 6
# The published-float grid scale (10^SCORE_ROUND_DECIMALS). Floats
# that leave the engine do so through the boundary-proof quantizer
# floor(x * SCORE_GRID + 0.5) / SCORE_GRID evaluated IDENTICALLY on
# both engines (sqlgen.grid6 renders the SQL side) — round() must not
# be used for published floats: Python/numpy half-even and DuckDB
# half-away diverge on dyadic ties like 1/128, and only the shared
# floor expression also agrees on negative ties (r5 self-review).
SCORE_GRID = 10 ** SCORE_ROUND_DECIMALS

# --- Reference query set (FIXTURES.md F3) ------------------------------
# Fixed deterministic queries over the synthetic-corpus vocabulary;
# roughly half have guaranteed hits, several exercise the zero-hit and
# stopword-only paths. query_id = list index.
REFERENCE_QUERIES: tuple[str, ...] = (
    "spark table join",
    "hash merge batch",
    "customer order line",
    "window stream agg",
    "query scan filter",
    "sort group value",
    "vector data column",
    "slow fast row",
    "big small part",
    "key value table scan merge",
    "stream window",
    "table",
    "spark query join order",
    "line item discount",          # partially absent terms
    "the a of",                    # stopwords only -> zero hits
    "zzzunknown qqqabsent",        # fully absent -> zero hits
    "merge join hash batch spark",
    "group agg window sort",
    "customer part supplier",
    "data value 42 scan",          # numeric token dropped
)

# --- Index layout ------------------------------------------------------
# Posting lists are chunked by doc_id shard: shard = doc_id // SHARD_SIZE.
# The index-build shuffle groups by (term, shard) so a stop-word-class
# term appearing in nearly every document never forms one giant group —
# this is the explicit skew handling the north rule calls for. At
# cluster scale SHARD_SIZE is sized so one chunk's encoded postings stay
# a few MB (~1M docs/shard); at sandbox scale a smaller value exercises
# the multi-chunk code paths.
DEFAULT_SHARD_SIZE = 1 << 20

# Tombstone deletes (pipelines/index_pipeline.delete_docs): the
# driver-gate entries delete the deterministic doc set
# doc_id % DELETE_MOD == DELETE_REM. Logical deletes exclude those
# docs from every result but leave global stats (df, avgdl, n_docs)
# untouched until compaction physically drops their postings — the
# Lucene segment-tombstone contract; both halves are SQL-oracled
# (sqlgen.bm25_topk_deleted_sql / bm25_topk_compacted_sql).
DELETE_MOD = 7
DELETE_REM = 3

# Result diversification (stages/serve.score_batch_diverse +
# pipelines/api.bm25_topk_diverse_pipeline): at most DIVERSITY_CAP
# docs per ``source`` may appear in a query's top-k — i.e. keep docs
# whose within-source rank (by the global ranking key) <= cap, then
# cut to TOP_K. Shards return their per-source top-cap candidates
# (local source-rank <= global source-rank, so the merge is exact —
# same argument as plain top-k shard merging).
DIVERSITY_CAP = 2

# Pseudo-relevance-feedback query expansion (pipelines/api
# .query_expand_pipeline): from each query's top-k feedback docs,
# candidate terms rank by weight = idf(t) * total_tf(t over the
# feedback set) (idf constant per term, so the weight is one multiply
# — no float summation order to pin), the query's own analyzed terms
# are excluded, and the EXPAND_TERMS best survive (round(weight,
# RANK_ROUND_DECIMALS) DESC, term ASC).
EXPAND_TERMS = 5

# Hybrid retrieval (pipelines/api.hybrid_topk_pipeline): reciprocal-
# rank fusion of the lexical (BM25 fleet) and vector (brute cosine)
# legs for the query ids that have BOTH a reference query text and a
# query vector (query_id == vec_id < ANN_N_QUERIES). rrf =
# sum over present legs of 1 / (RRF_K + leg_rank); absent leg
# contributes 0; final order round(rrf, RANK_ROUND_DECIMALS) DESC,
# doc_id ASC, cut to TOP_K. RRF_K = 60 is the standard constant from
# Cormack et al. (2009).
RRF_K = 60

# Prefix completion (pipelines/api.term_complete_pipeline): fixed
# deterministic probe prefixes — single chars so each has several
# candidate completions in the synthetic vocabulary (its leading
# bigrams are unique), one bigram, and a guaranteed-no-hit probe;
# top COMPLETE_K completions per prefix by (cf DESC, term ASC).
COMPLETE_PREFIXES = ("a", "b", "c", "d", "f", "s", "t", "st", "zz")
COMPLETE_K = 5

# Proximity search (pipelines/api.near_match_pipeline): a doc matches
# when it contains every analyzed query term AND the span of the
# terms' FIRST occurrences in the analyzed token stream (1-based
# positions, max - min) is <= NEAR_SLOP. First-occurrence span is the
# deterministic, SQL-expressible proximity rule (a true minimal
# window would need per-occurrence joins).
NEAR_SLOP = 8

# Embedding-space audit (ops/ann.embed_outliers): per label, the
# EMB_OUTLIER_K vectors FARTHEST from their label centroid (lowest
# cosine first; rank on round(cos, RANK_ROUND_DECIMALS) ASC, vec_id
# ASC) — the mislabeled-example / outlier review queue. Centroids
# are computed from per-dimension INTEGER sums of round(x*1e6)
# (order-free exact arithmetic on both engines), then divided back.
EMB_OUTLIER_K = 5

# Shipping-priority report (ops/relational.q3_shipping — the TPC-H
# Q3 shape): market segment + date cutoff for the three-way
# customer x orders x lineitem join; top Q3_TOP_K unshipped orders
# by exact-cents revenue.
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-15"
Q3_TOP_K = 10

# Local-supplier revenue (ops/relational.q5_region_revenue — the
# TPC-H Q5 shape): region + one-year order window for the
# region x nation x supplier x customer x orders x lineitem star,
# counting only lineitems whose supplier shares the ordering
# customer's nation.
Q5_REGION = "ASIA"
Q5_DATE_FROM = "1997-01-01"
Q5_DATE_TO = "1998-01-01"

# --- Dedup / similarity parameters (ops/dedup.py, ops/ann.py) ----------
# All hashes are md5-derived (md5int60 = first 15 hex digits as int) so
# every dedup operator has a bit-identical DuckDB oracle.
NGRAM_N = 3
JACCARD_THRESHOLD = 0.02
# Train/test contamination check (ops/sampling.contamination): token
# n-gram length for overlap detection — longer than the dedup shingle
# so chance collisions on a small vocabulary don't read as leakage.
CONTAM_NGRAM = 5
# Term co-occurrence / PMI (ops/textstats.cooc_pmi): vocabulary pruned
# to df >= COOC_MIN_DF (bounds the broadcast side), each doc capped to
# its COOC_DOC_CAP strongest terms (tf DESC, term ASC — bounds the
# per-doc quadratic pair blowup to cap*(cap-1)/2), pairs kept at
# co-doc-count >= COOC_MIN_PAIR. The same three rules live in the SQL
# oracle (sqlgen.cooc_pmi_sql).
COOC_MIN_DF = 10
COOC_DOC_CAP = 16
COOC_MIN_PAIR = 5
# More-like-this / related-document retrieval (pipelines/api
# .more_like_this_pipeline): query docs are the fixed doc_id range
# (same constant-rule pattern as ANN_N_QUERIES), each represented by
# its MLT_TERMS strongest terms (tf*idf DESC rounded to
# RANK_ROUND_DECIMALS, term ASC), scored through the sharded BM25
# fleet with the query doc itself excluded.
MLT_N_QUERY_DOCS = 5
MLT_TERMS = 8
# Keyword extraction (ops/textstats.doc_tags): top-K terms per doc by
# tf*idf (BM25 idf), rank on RANK_ROUND_DECIMALS-rounded score DESC
# then term ASC.
DOC_TAGS_K = 3
# Distribution profiling (ops/textstats.lang_quantiles): discrete
# quantiles of doc length per language (DuckDB quantile_disc rule:
# sorted element at index ceil(q*n)-1).
LANG_QUANTILES = (0.25, 0.5, 0.9)
# Snippet generation (pipelines/api.bm25_snippets_pipeline): highlight
# window half-width in chars around the earliest query-term substring
# match in lower(text); snippet = substr(text, max(1, pos-R), 2R+1).
SNIPPET_RADIUS = 30
# Blocking skew guard (ADVICE r2): a shingle shared by M docs emits
# M^2 join rows, and raw shingle keys are unbounded — shingles whose
# global doc count exceeds this cap are excluded from candidate
# generation AND intersection counting (denominators stay full-size, so
# capped Jaccard is a lower bound of true Jaccard; boilerplate shingles
# shared by more docs than this are non-discriminative anyway). The
# identical rule lives in the SQL oracle (sqlgen.ngram_jaccard_sql).
JACCARD_MAX_BUCKET = 64
MINHASH_SEEDS = 16
MINHASH_BAND_ROWS = 2  # 8 bands x 2 rows
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 2
EMBED_COS_THRESHOLD = 0.35
ANN_N_QUERIES = 10  # vec_id < 10 are the ANN query vectors
ANN_TOP_K = 10
# sign-LSH ANN: md5-derived hyperplanes (ops/ann.lsh_planes), 1-bit
# multiprobe; shared by engine and the generated DuckDB oracle
ANN_LSH_PLANES = 8
# IVF ANN: deterministic coarse quantizer — centroids are the corpus
# vectors with vec_id in [ANN_N_QUERIES, ANN_N_QUERIES + IVF_K); each
# vector joins its nearest cell, queries probe IVF_NPROBE cells
IVF_K = 16
IVF_NPROBE = 4

# --- Snowball workload defaults (FIXTURES.md F4) -----------------------
# Mirrors /root/reference/snowball/src/bin/SnowballConfig.java:29-45.
SNOWBALL_DEFAULTS: dict[str, object] = {
    "max_tokens_away": 6,
    "min_tokens_away": 1,
    "context_window_size": 2,
    "weight_left_context": 0.2,
    "weight_middle_context": 0.6,
    "weight_right_context": 0.2,
    "min_pattern_support": 2,
    "min_degree_match": 0.6,
    "min_tuple_confidence": 0.7,
    "wUpdt": 0.5,
    "number_iterations": 2,
    "use_RlogF": True,
}
# As-of / attribution range join over the events stream
# (ops/relational.events_asof / events_attribution): left side =
# purchases, right side = clicks, matched per user_id. The attribution
# window bounds the range join (click.ts < purchase.ts <= click.ts + W).
ASOF_LEFT_EVENT = "purchase"
ASOF_RIGHT_EVENT = "click"
ATTRIB_WINDOW_MIN = 60

# Wildcard retrieval (pipelines/api.wildcard_search_pipeline): SQL-LIKE
# patterns expanded against the dictionary (the Lucene multi-term
# rewrite), capped at the lexicographically-first MAX_EXPANSION terms,
# then one disjunctive fleet query per pattern. 'zz%' pins the
# zero-expansion path.
WILDCARD_PATTERNS = ("cust%", "%ream", "%at%", "s_an", "zz%")
WILDCARD_MAX_EXPANSION = 64

# Ordered funnel over the events stream
# (ops/relational.events_funnel): first-touch semantics, each stage's
# timestamp strictly after the previous stage's.
FUNNEL_STAGES = ("signup", "click", "purchase")

# Grouped top-k (ops/textstats.lang_top_quality): per-language top-k
# docs by canonical term count, ties to lowest doc_id.
GROUPED_TOPK_K = 5

# Metadata-filtered retrieval (api.bm25_topk_filtered_pipeline):
# Lucene filter-query semantics — global BM25 stats, candidates
# restricted to docs with this source value.
FILTER_SOURCE = "src7"

# Verbatim-passage duplication (ops/dedup.dup_passages): word windows
# of PASSAGE_N raw tokens appearing in >= PASSAGE_MIN_DOCS distinct
# docs — the near-verbatim contamination scan (cf. "Deduplicating
# Training Data Makes Language Models Better", Lee et al. 2022).
PASSAGE_N = 6
PASSAGE_MIN_DOCS = 2

# Regex scan workload (ops/textstats.regex_search): RE2 partial-match
# patterns — Arrow's match_substring_regex and DuckDB's regexp_matches
# are both RE2, so engine and oracle share exact semantics.
REGEX_QUERIES = (
    r"agg [a-z]+ scan",
    r"customer (query|table)",
    r"(join|merge) (batch|stream)",
    r"key\s+agg\s+row",
    r"value [0-9]+",
)

# Anti-join retention surface (ops/relational.customers_no_big_order):
# customers with NO order above this total — the NOT EXISTS shape run
# as ONE tagged-union shuffle instead of a two-sided join.
HIGH_VALUE_ORDER = 400_000.0

# Incremental dedup (ops/dedup.dedup_incremental): docs with
# doc_id >= floor(n_docs * INCREMENTAL_OLD_FRAC) are the "arriving"
# batch, deduplicated against the already-ingested prefix — the
# steady-state shape of a training-data ingest pipeline.
INCREMENTAL_OLD_FRAC = 0.8

# Event-type pivot (ops/relational.events_pivot): the conditional
# aggregation column set — one count per type plus purchase revenue.
PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# Column profiler (ops/relational.table_profile): the audited table
# and its column spec (name, kind) — kind drives which min/max slot
# (numeric vs string) the profile fills and how the value is
# canonicalized for exact distinct counting (timestamps -> epoch us).
PROFILE_TABLE = "lineitem"
PROFILE_COLUMNS = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)

# Deterministic distributed k-means (ops/ann.kmeans_clusters):
# Lloyd's with cosine assignment. Init = the KMEANS_K lowest-vec_id
# vectors (cid = init rank); KMEANS_ITERS assignment/update rounds,
# then a final assignment. Centroid updates use integer-quantized
# per-dimension sums (round(x*1e6) int64 — commutative exact
# arithmetic, the same trick as _label_centroids); assignment is
# argmax cosine on round(cos, RANK_ROUND_DECIMALS) with ties to the
# lower cid; clusters that lose all members drop out.
KMEANS_K = 8
KMEANS_ITERS = 2

# Synonym-aware retrieval (stages/score.score_query_synonyms):
# Lucene SynonymQuery semantics — members of a group score as ONE
# pseudo-term: tf = sum of member tfs per doc, df = docs containing
# ANY member, idf from that df. The pseudo-term key is the sorted
# members joined with '|' (mirrored by the oracle's mapping VALUES).
SYNONYM_GROUPS = (("join", "merge"), ("query", "scan"))

# Distinctive keywords per source (ops/textstats.keywords_per_source):
# c-TF-IDF-style weight(term, src) = tf_src * ln(S / df_src), where S
# is the number of distinct sources and df_src counts sources
# containing the term; top KEYWORDS_K per source, ties to the
# lexicographically first term.
KEYWORDS_K = 5

# Document update / upsert (api.bm25_topk_upserted_pipeline): docs
# with doc_id % UPSERT_MOD == UPSERT_REM get a new version — Lucene
# update-document contract: tombstone the old doc_id, append the new
# text (old text + " updated") as a fresh tail doc_id
# n_docs + (old_id - REM) // MOD. Pre-compaction stats include BOTH
# versions (the segment contract), candidates exclude the tombstoned
# originals.
UPSERT_MOD = 5
UPSERT_REM = 2

# Function-score retrieval (stages/score.score_query_boosted): the
# Elasticsearch function_score / Lucene boost-query shape — final
# score = BM25 * (1 + ln(1 + doc_len / BOOST_DL_NORM)). doc_len is
# already in every posting, so the boost needs no extra broadcast.
BOOST_DL_NORM = 100.0

# Weighted (importance) sampling (ops/sampling.weighted_sample):
# keep probability p(doc) = min(1, n_chars / WEIGHTED_SAMPLE_SCALE),
# accepted iff hash_unit(doc_id) < p — deterministic, bit-replicable
# in SQL, coordination-free at any scale.
WEIGHTED_SAMPLE_SCALE = 2000.0

# Histogram (ops/relational.orders_histogram): fixed-width buckets of
# o_totalprice.
ORDER_HIST_WIDTH = 50_000.0

# User-similarity search (ops/relational.similar_users): cosine over
# event-type count vectors (PIVOT_EVENT_TYPES order). Probe users =
# user_id < SIMILAR_USERS_PROBES (ids are 0-based); top
# SIMILAR_USERS_K neighbours each, self excluded, ties to the lower
# user_id. Dot products and squared norms are exact int64; the cosine
# is one double division — no float summation order to pin.
SIMILAR_USERS_PROBES = 5
SIMILAR_USERS_K = 5

# Field-boosted retrieval (api.bm25_fielded_pipeline): the corpus is
# split into a title field (the first TITLE_TOKENS analyzed tokens)
# and a body; title tokens are weighted TITLE_BOOST x via the classic
# field-repetition encoding (tf AND length norm pick up the weight
# automatically, integer-exact) — the BM25F-by-repetition variant.
TITLE_TOKENS = 8
TITLE_BOOST = 2

# Event-sequence pattern matching (ops/relational.event_pattern_match)
# — MATCH_RECOGNIZE-lite: each user's events collapse (ordered by ts,
# event_id) to a string of type initials; the RE2 pattern counts
# non-overlapping matches. Initial = first character of event_type
# (unique across PIVOT_EVENT_TYPES: c, e, p, s, v).
EVENT_PATTERN = "s[cv]*p"

# Key-skew audit (ops/relational.key_skew_report): the join/shuffle
# planning surface — per (table, key): cardinality, heaviest key and
# skew = max_count * n_keys / n_rows (1.0 = perfectly uniform).
# hot_key is the lexicographically smallest string form among the
# argmax keys (deterministic tie rule, mirrored in SQL).
SKEW_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
    ("documents", "source"),
)

# minimum_should_match retrieval (stages/score.score_query_msm): a
# doc is a candidate iff it matches at least min(MSM_MIN, number of
# analyzed query terms) distinct terms; candidates score by plain
# BM25 over their matched terms (Lucene/ES minimum_should_match).
MSM_MIN = 2

# Filtered vector search (ops/ann.ann_filtered): brute cosine top-k
# restricted to candidates with this label — the metadata-filtered
# ANN shape (pre-filter semantics: the constraint applies BEFORE the
# top-k cut, so results are exact within the filter).
ANN_FILTER_LABEL = 1

# Document chunking for retrieval corpora (ops/textstats
# .chunk_documents): overlapping analyzed-token windows of
# CHUNK_TOKENS with stride CHUNK_STRIDE (the RAG chunking shape);
# chunk k of a doc covers token positions [k*stride, k*stride+W).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

# Passage-level retrieval (api.bm25_chunks_pipeline): the corpus is
# the chunk_documents window set; each chunk indexes as synthetic doc
# doc_id * CHUNK_ID_BASE + chunk_id, queries retrieve chunks and the
# parent doc ranks by its BEST chunk score (max-pool) — the standard
# long-document retrieval pattern.
CHUNK_ID_BASE = 1024

# Correlation audit (ops/relational.corr_matrix): pairwise Pearson
# correlation over these lineitem columns, each quantized to exact
# integers (cents for money columns) so every sufficient statistic is
# exact integer arithmetic on both engines.
CORR_COLUMNS = (
    ("l_quantity", 1),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
    ("l_partkey", 1),
)

# Bloom filter membership (ops/textstats.bloom_probe): a probabilistic
# set over the corpus VOCABULARY with md5-derived, bit-replicable hash
# positions — position i of term t = md5int60(t + '|' + i) %
# BLOOM_BITS. Probes = real query terms (present) + the misspelling
# workload (absent unless a false positive); the oracle recomputes the
# identical bit set in SQL, so even false positives hash-match.
BLOOM_BITS = 1 << 14
BLOOM_K = 3

# Count-min sketch (ops/textstats.cms_counts): collection-frequency
# estimation with md5-derived bucket rows — bucket(term, i) =
# md5int60(term + '|cms' + i) % CMS_WIDTH. Estimates are exact-int
# bucket sums, so the oracle reproduces every over-count.
CMS_WIDTH = 1 << 10
CMS_DEPTH = 3

# PageRank over the near-dup candidate graph (ops/dedup.pagerank):
# fixed-iteration power method in EXACT integer arithmetic so the
# unrolled SQL oracle matches bitwise. Ranks ride as integer
# micro-units (PAGERANK_SCALE); per iteration
#   r' = (15 * SCALE) // 100 + (85 * sum_in(r_j // deg_j)) // 100
# — every op an int64 floor op, identical in numpy and DuckDB.
PAGERANK_ITERS = 3
PAGERANK_SCALE = 1_000_000

# HyperLogLog vocabulary-cardinality sketch (ops/textstats.hll_registers):
# md5-derived 60-bit term hashes; low HLL_P bits pick the register, the
# remaining 54 bits w give rank = trailing_zeros(w) + 1 (w == 0 -> 55,
# the max). Published = the 2^HLL_P exact-integer register maxima (the
# float harmonic-mean ESTIMATE is client-side — no libm in the oracle
# contract). Registers are mergeable by max, so partials combine
# map-side and the shuffle moves <= 2^HLL_P rows per batch.
HLL_P = 6
