"""Term co-occurrence / PMI (ops/textstats.cooc_pmi)."""

import duckdb
import pyarrow as pa

from snowball_java_ray.ops.textstats import cooc_pmi
from snowball_java_ray.pipelines.api import collect_arrow
from snowball_java_ray.sqlgen import cooc_pmi_sql
from tests.conftest import SF_TINY

PARAMS = dict(min_df=3, cap=8, min_pair=2)


def test_cooc_pmi_matches_duckdb(ray_session):
    """Distributed pair counts + PMI == DuckDB oracle at sf0.001 with
    tightened parameters (the tiny corpus has few df>=10 terms)."""
    got = collect_arrow(cooc_pmi(SF_TINY, **PARAMS)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(cooc_pmi_sql(**PARAMS)).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in ["term1", "term2", "c12", "c1", "c2"]:
        assert (got[c].values == exp[c].values).all(), c
    assert (abs(got["pmi"].values - exp["pmi"].values) < 1e-9).all()


def test_cooc_pmi_invariants(ray_session):
    got = collect_arrow(cooc_pmi(SF_TINY, **PARAMS)).to_pandas()
    assert (got["term1"] < got["term2"]).all()
    assert (got["c12"] <= got[["c1", "c2"]].min(axis=1)).all()
    assert (got["c12"] >= PARAMS["min_pair"]).all()
    # deterministic rerun
    again = collect_arrow(cooc_pmi(SF_TINY, **PARAMS)).to_pandas()
    assert got.equals(again)


def test_more_like_this_matches_duckdb(ray_session):
    """Related-doc retrieval == DuckDB oracle at sf0.001; the query doc
    never appears in its own result list."""
    from snowball_java_ray.pipelines.api import more_like_this_pipeline
    from snowball_java_ray.sqlgen import more_like_this_sql

    got = more_like_this_pipeline(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(more_like_this_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in ["query_doc_id", "rank", "doc_id"]:
        assert (got[c].values == exp[c].values).all(), c
    assert (abs(got["score"].values - exp["score"].values) < 1e-9).all()
    assert (got["query_doc_id"] != got["doc_id"]).all()
    assert (got.groupby("query_doc_id")["rank"].min() == 1).all()


def test_source_report_matches_duckdb(ray_session):
    from snowball_java_ray.ops.textstats import source_report
    from snowball_java_ray.sqlgen import source_report_sql

    got = collect_arrow(source_report(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(source_report_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    assert (got["source"].values == exp["source"].values).all()
    assert (got["n_docs"].values == exp["n_docs"].values).all()
    for c in ["dup_frac", "avg_terms", "avg_stopword_ratio"]:
        assert (abs(got[c].values - exp[c].values) < 1e-9).all(), c
    assert ((got["dup_frac"] >= 0) & (got["dup_frac"] < 1)).all()


def test_dup_clusters_connected_components(ray_session):
    """Label propagation == recursive-CTE oracle at sf0.001, and every
    candidate pair's endpoints land in the same cluster."""
    from snowball_java_ray.ops.dedup import dup_clusters, minhash_lsh_candidates
    from snowball_java_ray.sqlgen import dup_clusters_sql

    got = dup_clusters(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(dup_clusters_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    assert (got["cluster_id"] <= got["doc_id"]).all()
    lbl = dict(zip(got["doc_id"], got["cluster_id"]))
    pairs = collect_arrow(minhash_lsh_candidates(SF_TINY)).to_pandas()
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert lbl[a] == lbl[b]


def test_hll_registers_matches_duckdb_and_merges(ray_session, tmp_path):
    """HLL registers vs the oracle at sf0.001, plus the union-sketch
    property: registers of two disjoint half-corpora merged by max ==
    registers of the full corpus (what makes HLL the mergeable scale
    path)."""
    import numpy as np
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.textstats import hll_registers
    from snowball_java_ray.sqlgen import hll_registers_sql

    got = hll_registers(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(hll_registers_sql()).df()
    assert got["register"].tolist() == exp["register"].tolist()
    assert got["max_rank"].tolist() == exp["max_rank"].tolist()
    assert (got["max_rank"] >= 0).all() and (got["max_rank"] <= 55).all()

    full = pq.read_table(f"{SF_TINY}/documents.parquet")
    half = full.num_rows // 2
    d1, d2 = tmp_path / "h1", tmp_path / "h2"
    d1.mkdir(); d2.mkdir()
    pq.write_table(full.slice(0, half), str(d1 / "documents.parquet"))
    pq.write_table(full.slice(half), str(d2 / "documents.parquet"))
    a = hll_registers(str(d1)).to_pandas()["max_rank"].to_numpy()
    b = hll_registers(str(d2)).to_pandas()["max_rank"].to_numpy()
    assert (
        np.maximum(a, b) == got["max_rank"].to_numpy()
    ).all()


def test_pagerank_matches_duckdb_and_invariants(ray_session):
    """Exact-int PageRank vs the unrolled SQL oracle at sf0.001;
    structural invariants: every rank >= the damping base, node set ==
    the dup-graph node set, all int64."""
    from snowball_java_ray.constants import PAGERANK_SCALE
    from snowball_java_ray.ops.dedup import minhash_lsh_candidates, pagerank
    from snowball_java_ray.sqlgen import pagerank_sql

    got = collect_arrow(pagerank(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(pagerank_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    assert str(got["pagerank"].dtype) == "int64"
    base = (15 * PAGERANK_SCALE) // 100
    assert (got["pagerank"] >= base).all()
    pairs = collect_arrow(minhash_lsh_candidates(SF_TINY)).to_pandas()
    nodes = set(pairs["doc_a"]) | set(pairs["doc_b"])
    assert set(got["doc_id"]) == nodes


def test_r4_entries_deterministic(ray_session):
    """Byte-identical rerun for each round-4 entry (the engine's
    determinism contract): same sf dir, two executions, exact table
    equality."""
    from snowball_java_ray.ops.ann import embed_quantize
    from snowball_java_ray.ops.multimodal import png_decode
    from snowball_java_ray.ops.textstats import gopher_rules, text_clean

    for fn in (gopher_rules, text_clean, embed_quantize, png_decode):
        a = collect_arrow(fn(SF_TINY)).to_pandas()
        b = collect_arrow(fn(SF_TINY)).to_pandas()
        assert a.equals(b), fn.__name__


def test_gopher_rules_matches_duckdb_and_edges(ray_session, tmp_path):
    """Gopher repetition rules vs the oracle at sf0.001, plus an
    engineered corpus hitting the edge cases: empty text (1 line, 0
    bigrams), all-duplicate lines, bullet/ellipsis lines, and a
    repeated-bigram doc where top_bigram_frac == 1."""
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.textstats import gopher_rules
    from snowball_java_ray.sqlgen import gopher_rules_sql

    got = collect_arrow(gopher_rules(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(gopher_rules_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c

    texts = [
        "",  # 1 empty line, no tokens
        "same line\nsame line\nsame line",  # dup_line_frac = 2/3
        "- bullet one\n* bullet two\nplain",  # 2 bullet lines
        "trailing off...\nand more...",  # 2 ellipsis lines
        "alpha beta alpha beta alpha beta",  # one dominant bigram
    ]
    d = tmp_path / "sfg"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    g = collect_arrow(gopher_rules(str(d))).to_pandas().set_index("doc_id")
    con2 = duckdb.connect()
    con2.execute(
        f"create view documents as select * from '{d}/documents.parquet'"
    )
    w = con2.execute(gopher_rules_sql()).df().set_index("doc_id")
    for c in g.columns:
        assert (g[c].values == w[c].values).all(), c
    assert g.loc[0, "n_lines"] == 1 and g.loc[0, "n_bigrams"] == 0
    # fractions publish on the 6-dp grid since r5 (boundary-proof
    # floor(x*1e6 + 0.5) quantizer on both engines), so 2/3 lands on
    # the grid point, not the raw IEEE quotient
    assert g.loc[1, "dup_line_frac"] == 0.666667
    assert g.loc[2, "bullet_lines"] == 2
    assert g.loc[3, "ellipsis_lines"] == 2
    # 'alpha beta' repeats 3x; bigrams: (a,b)x3 + (b,a)x2 = 5 total
    assert g.loc[4, "top_bigram_n"] == 3
    assert g.loc[4, "top_bigram_frac"] == 3.0 / 5.0


def test_text_clean_matches_duckdb_and_edges(ray_session, tmp_path):
    """URL/email scrub vs the oracle at sf0.001, plus engineered docs
    exercising real hits: URLs mid-sentence, emails, mixed whitespace
    runs, empty text."""
    import pyarrow.parquet as pq

    from snowball_java_ray.ops.textstats import text_clean
    from snowball_java_ray.sqlgen import text_clean_sql

    got = collect_arrow(text_clean(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(text_clean_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c

    texts = [
        "see https://example.com/a?b=1 and http://x.y/z now",
        "mail me at alice@example.org or bob.smith+tag@sub.dom.co",
        "spaces\t\tand\n\nnewlines   everywhere ",
        "",
        "no hits here",
    ]
    d = tmp_path / "sfc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    g = collect_arrow(text_clean(str(d))).to_pandas().set_index("doc_id")
    con2 = duckdb.connect()
    con2.execute(
        f"create view documents as select * from '{d}/documents.parquet'"
    )
    w = con2.execute(text_clean_sql()).df().set_index("doc_id")
    for c in g.columns:
        assert (g[c].values == w[c].values).all(), c
    assert g.loc[0, "n_urls"] == 2 and g.loc[0, "n_emails"] == 0
    assert g.loc[1, "n_emails"] == 2
    assert g.loc[2, "clean_chars"] < g.loc[2, "raw_chars"]
    assert g.loc[3, "raw_chars"] == 0 and g.loc[3, "clean_chars"] == 0
    assert g.loc[4, "clean_chars"] == g.loc[4, "raw_chars"]


def test_embed_quantize_invariants(ray_session):
    """Quantizer bounds: |q_j| <= 127 implies sum_q_abs <= 127*n_dims;
    per-vector recompute of the exact expression matches; maxabs is
    the widened float32 max-abs of the raw vector."""
    import pyarrow.parquet as pq
    import numpy as np

    from snowball_java_ray.ops.ann import embed_quantize
    from snowball_java_ray.pipelines.api import collect_arrow as _ca

    sf = "/root/testdata/sf0.001"
    got = _ca(embed_quantize(sf)).to_pandas().set_index("vec_id")
    assert (got["sum_q_abs"] <= 127 * got["n_dims"]).all()
    assert (got["sum_q_abs"] >= got["sum_q"].abs()).all()
    raw = pq.read_table(sf + "/embeddings.parquet").to_pandas().set_index(
        "vec_id"
    )
    for vid in list(got.index)[:5]:
        x = np.asarray(raw.loc[vid, "embedding"], np.float64)
        m = np.abs(x).max()
        q = (
            np.floor(x * 127.0 / m + 0.5).astype(np.int64)
            if m > 0
            else np.zeros(len(x), np.int64)
        )
        # the audit column publishes on the 6-dp grid since r5 (the
        # boundary-proof floor quantizer, identical in the oracle);
        # the raw maxabs stays the quantizer scale in the expression
        assert got.loc[vid, "maxabs"] == np.floor(m * 1e6 + 0.5) / 1e6
        assert got.loc[vid, "sum_q"] == q.sum()
        assert got.loc[vid, "sum_q_abs"] == np.abs(q).sum()


def test_connected_components_chain(ray_session):
    """VERDICT r3 #7 regression: a 64-node chain (diameter 63) — the
    adversarial shape for neighbor-only min-label propagation, which
    stalled at max_iters=16 and silently returned wrong labels in r3.
    Pointer jumping must converge it within the default 16 rounds and
    label every node 0; and a too-small max_iters must RAISE, never
    return an unconverged labeling."""
    import pyarrow as pa
    import pytest
    import ray.data

    from snowball_java_ray.ops.dedup import connected_components

    n = 64
    src = list(range(n - 1)) + list(range(1, n))
    dst = list(range(1, n)) + list(range(n - 1))
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}
        )
    ).materialize()
    labels = collect_arrow(
        connected_components(edges, max_iters=16)
    ).to_pandas()
    assert len(labels) == n
    assert (labels["lbl"] == 0).all()

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1)


def test_doc_tags_matches_duckdb(ray_session):
    from snowball_java_ray.ops.textstats import doc_tags
    from snowball_java_ray.sqlgen import doc_tags_sql

    got = collect_arrow(doc_tags(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(doc_tags_sql()).df()
    assert len(got) == len(exp) > 0
    assert list(got.columns) == list(exp.columns)
    for c in ["doc_id", "rank", "term"]:
        assert (got[c].values == exp[c].values).all(), c
    assert (abs(got["score"].values - exp["score"].values) < 1e-9).all()
    assert got["rank"].max() <= 3


def test_lang_quantiles_matches_duckdb(ray_session):
    from snowball_java_ray.ops.textstats import lang_quantiles
    from snowball_java_ray.sqlgen import lang_quantiles_sql

    got = collect_arrow(lang_quantiles(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(lang_quantiles_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    # quantiles are monotone in q within a lang
    for _, g in got.groupby("lang"):
        v = g.sort_values("q")["value"].values
        assert (v[:-1] <= v[1:]).all()


def test_bm25_snippets_matches_duckdb(ray_session):
    from snowball_java_ray.pipelines.api import bm25_snippets_pipeline
    from snowball_java_ray.sqlgen import bm25_snippets_sql

    got = bm25_snippets_pipeline(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(bm25_snippets_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    # the window contains the match position
    assert (got["pos"] >= 1).all()
    assert got["snippet"].str.len().max() <= 61


def test_term_suggest_matches_duckdb(ray_session):
    from snowball_java_ray.ops.textstats import (
        _levenshtein,
        term_suggest,
    )
    from snowball_java_ray.sqlgen import term_suggest_sql

    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("ab", "ba") == 2
    got = term_suggest(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(term_suggest_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c
    assert (got["dist"] <= 2).all()
    assert got.groupby("query_term")["rank"].apply(
        lambda r: (r.values == range(1, len(r) + 1)).all()
    ).all()


def test_regex_search_matches_duckdb(ray_session):
    from snowball_java_ray.ops.textstats import regex_search
    from snowball_java_ray.sqlgen import regex_search_sql

    got = collect_arrow(regex_search(SF_TINY)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    exp = con.execute(regex_search_sql()).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].values).all(), c


def test_term_complete_prefix_and_order(ray_session):
    """Completions start with their prefix, the no-hit probe yields
    zero rows, and ranks follow (cf DESC, term ASC)."""
    from snowball_java_ray.constants import COMPLETE_K
    from snowball_java_ray.pipelines.api import term_complete_pipeline
    from tests.conftest import SF_TINY

    got = term_complete_pipeline(SF_TINY).to_pandas()
    assert len(got) > 0
    assert "zz" not in set(got["prefix"])
    for _, row in got.iterrows():
        assert row["term"].startswith(row["prefix"])
    for _, g in got.groupby("prefix"):
        assert len(g) <= COMPLETE_K
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        pairs = list(zip(-g["cf"].to_numpy(), g["term"]))
        assert pairs == sorted(pairs)


def test_lm_nll_invariants(ray_session):
    """Every doc with >= 2 analyzed tokens gets a positive surprise
    sum; the exact-integer rule matches a per-doc pure-python (big
    int, overflow-free) recomputation on a sample."""
    import pyarrow.parquet as pq

    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import lm_nll
    from tests.conftest import SF_TINY

    got = lm_nll(SF_TINY).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {
        did: tokenize(text or "")
        for did, text in zip(docs["doc_id"].to_pylist(),
                             docs["text"].to_pylist())
    }
    n_eligible = sum(1 for ts in toks.values() if len(ts) >= 2)
    assert len(got) == n_eligible
    assert (got["s"] > 0).all()
    assert (got["n_bigrams"] >= 1).all()

    # independent recomputation of the integer rule for 5 docs
    from collections import Counter

    bc: Counter = Counter()
    for ts in toks.values():
        bc.update(zip(ts, ts[1:]))
    cp: Counter = Counter()
    for (w1, _), c in bc.items():
        cp[w1] += c
    V = len({t for ts in toks.values() for t in ts})
    for did in list(got.index)[:5]:
        ts = toks[did]
        contribs = [
            ((cp[a] + V) * 1_000_000) // (bc[(a, b)] + 1)
            for a, b in zip(ts, ts[1:])
        ]
        assert got.loc[did, "s"] == sum(contribs)
        assert got.loc[did, "n_bigrams"] == len(contribs)


def test_lm_nll_boundary_proof(ray_session, tmp_path):
    """VERDICT r3 #1 regression: the published lm_nll value must be
    bit-identical between the engine and the DuckDB oracle even when
    the smoothed ratio sits exactly ON a division boundary (exact
    divisors and divisors ± 1 — where the r3 float-ln contract could
    flip by 1 ulp of libm). Builds a corpus engineered so (cp+V) is
    exactly divisible by (c+1) for some bigrams, runs BOTH engines,
    and asserts exact int equality."""
    import duckdb
    import pyarrow.parquet as pq

    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.textstats import lm_nll

    # 'aa bb' repeated k times in one doc makes c('aa','bb') = k and
    # cp('aa') = k; vary k across docs so (cp + V) % (c + 1) sweeps 0
    # (exact boundary), 1 and c (the adjacent edges).
    texts = []
    for k in range(1, 40):
        texts.append(" ".join(["aa bb"] * k))
    texts.append("cc dd cc dd cc")  # shared-prefix cross terms
    texts.append("dd cc dd")
    d = tmp_path / "sfb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = lm_nll(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{d}/documents.parquet'"
    )
    want = con.execute(sqlgen.lm_nll_sql()).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_bigrams"].tolist() == want["n_bigrams"].tolist()
    # exact integer equality — the whole point of the r4 contract
    assert got["s"].tolist() == want["s"].tolist()
    assert str(got["s"].dtype) == str(want["s"].dtype) == "int64"


def test_canonical_docs_invariants(ray_session):
    """Exactly one kept doc per cluster; the keeper belongs to its
    cluster and maximizes (n_terms, -doc_id); unclustered docs keep
    themselves."""
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.dedup import canonical_docs
    from tests.conftest import SF_TINY

    got = canonical_docs(SF_TINY).to_pandas()
    assert len(got) == 500  # every corpus doc decided
    per = got.groupby("cluster_id")
    assert (per["kept"].sum() == 1).all()
    assert (per.apply(
        lambda g: (g.loc[g["kept"] == 1, "doc_id"].iloc[0]
                   == g["keep_id"].iloc[0])
    )).all()
    # singleton docs keep themselves
    singles = per.filter(lambda g: len(g) == 1)
    assert (singles["doc_id"] == singles["keep_id"]).all()
    # keeper maximizes n_terms (ties -> lowest doc_id) within cluster
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    )
    nt = {
        did: len(tokenize(text or ""))
        for did, text in zip(docs["doc_id"].to_pylist(),
                             docs["text"].to_pylist())
    }
    for cid, g in got.groupby("cluster_id"):
        if len(g) == 1:
            continue
        want = sorted(g["doc_id"], key=lambda d: (-nt[d], d))[0]
        assert g["keep_id"].iloc[0] == want


def test_dup_passages_invariants(ray_session):
    """Every reported passage is a PASSAGE_N-token window present in
    >= PASSAGE_MIN_DOCS distinct docs; doc-id range is consistent; a
    spot-checked passage really occurs in its min and max docs."""
    import duckdb

    from snowball_java_ray.constants import PASSAGE_MIN_DOCS, PASSAGE_N
    from snowball_java_ray.ops.dedup import dup_passages, shingles
    from tests.conftest import SF_TINY

    got = dup_passages(SF_TINY).to_pandas()
    assert len(got) > 0
    assert got["passage"].is_unique
    assert (got["n_docs"] >= PASSAGE_MIN_DOCS).all()
    assert (got["min_doc"] <= got["max_doc"]).all()
    assert got["passage"].str.split(" ").str.len().eq(PASSAGE_N).all()

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
    ).df().set_index("doc_id")["text"]
    for row in got.head(10).itertuples():
        assert row.passage in shingles(docs.loc[row.min_doc], PASSAGE_N)
        assert row.passage in shingles(docs.loc[row.max_doc], PASSAGE_N)


def test_keywords_per_source_matches_duckdb(ray_session):
    """c-TF-IDF keywords == the DuckDB oracle at sf0.001."""
    import duckdb
    import pandas as pd

    from snowball_java_ray import sqlgen
    from snowball_java_ray.ops.textstats import keywords_per_source
    from tests.conftest import SF_TINY

    got = keywords_per_source(SF_TINY).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    want = con.execute(sqlgen.keywords_per_source_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # every source present, K rows each, ranks 1..K
    from snowball_java_ray.constants import KEYWORDS_K

    sizes = got.groupby("source")["rank"].agg(["size", "min", "max"])
    assert (sizes["size"] == KEYWORDS_K).all()
    assert (sizes["min"] == 1).all() and (sizes["max"] == KEYWORDS_K).all()


def test_chunk_documents_reconstruction(ray_session):
    """Chunks tile each doc with the configured stride/window and the
    chunk text equals the corresponding slice of the serial tokenize."""
    from snowball_java_ray.constants import CHUNK_STRIDE, CHUNK_TOKENS
    from snowball_java_ray.functions.text import tokenize
    from snowball_java_ray.ops.textstats import chunk_documents
    from tests.conftest import SF_TINY

    import pandas as pd
    import pyarrow.parquet as pq

    got = chunk_documents(SF_TINY).to_pandas()
    docs = pq.read_table(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")["text"]
    for doc_id in got["doc_id"].unique()[:25]:
        toks = tokenize(docs.loc[doc_id])
        sub = got[got["doc_id"] == doc_id].sort_values("chunk_id")
        n_expected = (max(len(toks) - 1, 0) // CHUNK_STRIDE) + 1
        assert len(sub) == n_expected
        for _, r in sub.iterrows():
            s = int(r["start_pos"])
            window = toks[s: s + CHUNK_TOKENS]
            assert r["n_tokens"] == len(window)
            assert r["chunk_text"] == " ".join(window)


def test_bloom_probe_no_false_negatives(ray_session):
    """Bloom membership has NO false negatives: every in-vocab probe
    is in the bloom; false positives are flagged consistently."""
    from snowball_java_ray.ops.textstats import bloom_probe
    from tests.conftest import SF_TINY

    got = bloom_probe(SF_TINY).to_pandas()
    in_vocab = got[got["in_vocab"]]
    assert in_vocab["in_bloom"].all()
    assert not got.loc[got["in_vocab"], "false_positive"].any()
    fp = got[got["false_positive"]]
    assert (fp["in_bloom"] & ~fp["in_vocab"]).all()


def test_cms_overestimate_guarantee(ray_session):
    """Count-min never under-counts: est_cf >= exact_cf for every
    probe; in-vocab probes have positive estimates."""
    from snowball_java_ray.ops.textstats import cms_counts
    from tests.conftest import SF_TINY

    got = cms_counts(SF_TINY).to_pandas()
    assert (got["est_cf"] >= got["exact_cf"]).all()
    assert (got.loc[got["exact_cf"] > 0, "est_cf"] > 0).all()


def test_lang_mismatch_consistent_with_langid(ray_session):
    """Mismatch rows == langid predictions that differ from metadata."""
    from snowball_java_ray.ops.textstats import lang_mismatch, langid
    from tests.conftest import SF_TINY

    import pandas as pd

    mm = lang_mismatch(SF_TINY).to_pandas()
    pred = langid(SF_TINY).to_pandas()
    docs = pd.read_parquet(
        f"{SF_TINY}/documents.parquet", columns=["doc_id", "lang"]
    )
    joined = docs.merge(pred[["doc_id", "pred_lang"]], on="doc_id")
    want = joined[joined["lang"] != joined["pred_lang"]]
    assert set(mm["doc_id"]) == set(want["doc_id"])
    merged = mm.merge(want, on="doc_id")
    assert (merged["pred_lang_x"] == merged["pred_lang_y"]).all()
