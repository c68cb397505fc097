"""M1-M7 extraction unit tests — hand-computed cases per FIXTURES.md F2
(reference semantics: /root/reference/snowball/src/bin/Snowball.java:278-369,
with the documented ordering-guard fix)."""

from snowball_java_ray.functions.extract import extract_pairs, strip_tags


def ex(sentence, **kw):
    args = dict(e1_type="ORG", e2_type="LOC", min_tokens_away=1,
                max_tokens_away=6, context_window_size=2)
    args.update(kw)
    return extract_pairs(sentence, **args)


def test_basic_pair():
    ts = ex("The <ORG>Acme Corp</ORG> headquarters in <LOC>Lisbon</LOC> opened today .")
    assert len(ts) == 1
    t = ts[0]
    assert (t.e1, t.e2) == ("Acme Corp", "Lisbon")
    assert t.middle == "headquarters in"
    assert t.left == "The"          # window of 2, only one token available
    assert t.right == "opened today"


def test_e2_before_e1_dropped():
    # intended M3 semantics (vacuous guard at Snowball.java:309 fixed)
    assert ex("In <LOC>Lisbon</LOC> the <ORG>Acme</ORG> opened .") == []


def test_intervening_entity_dropped():
    ts = ex("The <ORG>Acme</ORG> near <ORG>Beta</ORG> in <LOC>Porto</LOC> .")
    # Acme->Porto blocked by intervening <ORG>Beta</ORG>; Beta->Porto kept
    assert [(t.e1, t.e2) for t in ts] == [("Beta", "Porto")]


def test_token_distance_gates():
    # middle too long (> max_tokens_away=6)
    long_mid = "w1 w2 w3 w4 w5 w6 w7"
    assert ex(f"<ORG>A</ORG> {long_mid} <LOC>B</LOC> .") == []
    # middle too short (< min_tokens_away=1): zero tokens
    assert ex("<ORG>A</ORG> <LOC>B</LOC> .") == []
    # boundary: exactly max
    ok = ex("<ORG>A</ORG> w1 w2 w3 w4 w5 w6 <LOC>B</LOC> .")
    assert len(ok) == 1


def test_cross_product_multiple_mentions():
    ts = ex("<ORG>A</ORG> met <LOC>X</LOC> and <ORG>B</ORG> met <LOC>Y</LOC> .")
    pairs = {(t.e1, t.e2) for t in ts}
    # A->X kept; A->Y blocked (intervening B); B->Y kept; B->X impossible (order)
    assert pairs == {("A", "X"), ("B", "Y")}


def test_context_window_truncation():
    ts = ex("a b c d <ORG>A</ORG> mid here <LOC>B</LOC> w x y z")
    t = ts[0]
    assert t.left == "c d"       # last 2
    assert t.right == "w x"      # first 2


def test_tags_stripped_from_contexts():
    ts = ex("<LOC>Rome</LOC> said <ORG>A</ORG> is in <LOC>B</LOC> near <ORG>C</ORG> end")
    t = [x for x in ts if x.e2 == "B"][0]
    assert "<" not in t.left and "<" not in t.right
    assert t.left == "Rome said"


def test_strip_tags():
    assert strip_tags("<ORG>A</ORG> x <LOC>B</LOC>") == "A x B"
