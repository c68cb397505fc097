"""Tokenizer/normalizer unit tests (SURVEY.md §5.1, FIXTURES.md F7)."""

import numpy as np
import pyarrow as pa

from snowball_java_ray.functions.text import (
    sha256_hex,
    term_frequencies,
    tokenize,
    tokenize_arrow,
)


def test_tokenize_basic():
    # lowercase, split on non-alnum, drop numbers/stopwords
    assert tokenize("Hello, World 42!") == ["hello", "world"]
    assert tokenize("The Spark-Table JOIN") == ["spark", "table", "join"]


def test_tokenize_reference_regex_cases():
    # mirrors /root/reference/snowball/src/tests/RegexTester.java:11-14:
    # pure numbers, punctuation runs, hyphen runs are dropped
    assert tokenize("1234") == []
    assert tokenize("--- ,,, ::: ...") == []
    assert tokenize("multi-word-token") == ["multi", "word", "token"]
    assert tokenize("") == []
    assert tokenize("a the of to") == []  # all stopwords


def test_tokenize_mixed_alnum_kept():
    # mixed alphanumerics are NOT pure numbers -> kept
    assert tokenize("x86 v2 sha256") == ["x86", "v2", "sha256"]


def test_tokenize_unicode_separator():
    # accented chars are separators in both Python and DuckDB RE2
    assert tokenize("café naive") == ["caf", "naive"]


def test_tokenize_arrow_matches_python():
    texts = [
        "Hello, World 42!",
        "The Spark-Table JOIN",
        "",
        "a the of",
        "key value key KEY",
        "café 1234 x86",
    ]
    row_idx, toks = tokenize_arrow(pa.array(texts))
    got = [[] for _ in texts]
    for r, t in zip(row_idx, toks.to_pylist()):
        got[r].append(t)
    assert got == [tokenize(t) for t in texts]


def test_term_frequencies():
    texts = ["key value key KEY", "value", ""]
    row_idx, toks = tokenize_arrow(pa.array(texts))
    tf_row, terms, tfs, doc_len = term_frequencies(row_idx, toks, len(texts))
    pairs = {(int(r), t): int(c) for r, t, c in zip(tf_row, terms.to_pylist(), tfs)}
    assert pairs == {(0, "key"): 3, (0, "value"): 1, (1, "value"): 1}
    assert doc_len.tolist() == [4, 1, 0]


def test_sha256_matches_duckdb():
    import duckdb

    texts = ["abc", "", "hello world", "café"]
    ours = sha256_hex(texts)
    theirs = [
        duckdb.sql("select sha256(?)", params=[t]).fetchone()[0] for t in texts
    ]
    assert ours == theirs


def test_tokenizer_matches_duckdb_sql():
    """The canonical tokenizer must agree with its SQL rendering."""
    import duckdb

    from snowball_java_ray.sqlgen import SQL_TOKENIZE_CTE

    texts = [
        "Hello, World 42! The Spark-Table JOIN",
        "key value 007 x86 --- a the",
        "",
    ]
    con = duckdb.connect()
    con.execute("create table docs as select * from (values " +
                ",".join(f"({i}, ?)" for i in range(len(texts))) +
                ") t(doc_id, text)", texts)
    sql = f"""
    WITH {SQL_TOKENIZE_CTE.format(table='docs', id_col='doc_id', text_col='text')}
    SELECT doc_id, term FROM toks ORDER BY doc_id, term
    """
    got = con.execute(sql).fetchall()
    want = sorted(
        (i, t) for i, txt in enumerate(texts) for t in tokenize(txt)
    )
    assert got == want


def test_tokenize_code_mode():
    from snowball_java_ray.functions.text import tokenize_code, tokenize_code_arrow
    import pyarrow as pa

    assert tokenize_code("getUserName") == ["get", "user", "name"]
    assert tokenize_code("parseHTTPResponse") == ["parse", "http", "response"]
    assert tokenize_code("snake_case_name") == ["snake", "case", "name"]
    assert tokenize_code("XMLHttpRequest2") == ["xml", "http", "request2"]
    texts = ["getUserName", "parseHTTPResponse foo_bar", ""]
    row_idx, toks = tokenize_code_arrow(pa.array(texts))
    got = [[] for _ in texts]
    for r, t in zip(row_idx, toks.to_pylist()):
        got[r].append(t)
    assert got == [tokenize_code(t) for t in texts]


def test_fast_tokenizer_equals_regex_path():
    """The byte-level fast path must equal the regex-kernel path and
    the pure-Python tokenizer on adversarial inputs."""
    import numpy as np
    import pyarrow.compute as pc

    texts = [
        "", " ", "a", "A", "1", "abc123", "123abc", "123",
        "hello  world", "trailing space ", " leading", "ALL CAPS",
        "mixedCASE42", "tab\tsep", "newline\nsep", "café déjà-vu",
        "中文 text here", "emoji 🙂 ok", "a1b2c3", "__dunder__",
        "x" * 500, ("word " * 100).strip(), "the a of and",
        "ümlaut Über", "ssß sharp", "0" * 50,
    ]
    arr = pa.array(texts)
    row_idx, toks = tokenize_arrow(arr)
    got = [[] for _ in texts]
    for r, t in zip(row_idx, toks.to_pylist()):
        got[r].append(t)
    assert got == [tokenize(t) for t in texts]
    # sliced array path
    sl = arr.slice(3, 10)
    r2, t2 = tokenize_arrow(sl)
    got2 = [[] for _ in range(len(sl))]
    for r, t in zip(r2, t2.to_pylist()):
        got2[r].append(t)
    assert got2 == [tokenize(t) for t in texts[3:13]]
    # null handling
    arr3 = pa.array(["a b", None, "c"])
    r3, t3 = tokenize_arrow(arr3)
    got3 = [[] for _ in range(3)]
    for r, t in zip(r3, t3.to_pylist()):
        got3[r].append(t)
    assert got3 == [["b"], [], ["c"]]


def test_fast_tokenizer_random_fuzz():
    import random

    rng = random.Random(42)
    alphabet = "abcXYZ019 _-.\t\nàé中🙂"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(300)
    ]
    row_idx, toks = tokenize_arrow(pa.array(texts))
    got = [[] for _ in texts]
    for r, t in zip(row_idx, toks.to_pylist()):
        got[r].append(t)
    assert got == [tokenize(t) for t in texts]
