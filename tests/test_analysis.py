"""Analysis-chain unit tests: pinned goldens (SURVEY.md §7.7 item 1)."""

import pyarrow as pa
import pytest

from solr_ray.analysis import ENGLISH_STOP_WORDS, get_analyzer, porter_stem


# Published examples from the Porter 1980 paper / demo vocabulary.
PORTER_GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "digitizer": "digit", "differentli": "differ", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_golden():
    for w, expect in PORTER_GOLDEN.items():
        assert porter_stem(w) == expect, w


def test_porter_short_words_unchanged():
    for w in ("a", "is", "be", "ox"):
        assert porter_stem(w) == w


def test_text_en_chain_golden():
    az = get_analyzer("text_en")
    assert az.tokenize_text(
        "The Dogs' owners were running quickly; don't stop at 3.14 U.S.A. today"
    ) == ["dog", "owner", "were", "run", "quickli", "don't", "stop", "3.14",
          "u.s.a", "todai"]


def test_possessive_strip():
    az = get_analyzer("text_en")
    assert az.tokenize_text("John's book") == ["john", "book"]
    assert az.tokenize_text("John’s book") == ["john", "book"]


def test_stopwords_removed():
    az = get_analyzer("text_general")
    assert az.tokenize_text("the cat AND the hat") == ["cat", "hat"]
    assert az.tokenize_text("the and of to") == []
    assert len(ENGLISH_STOP_WORDS) == 33


def test_simple_chain_matches_sql_semantics():
    az = get_analyzer("simple")
    assert az.tokenize_text("Hello, World-42 FOO_bar") == [
        "hello", "world", "42", "foo", "bar"
    ]


def test_batch_path_equals_single_path():
    texts = [
        "The quick brown foxes were jumping over lazy dogs' backs",
        None,
        "",
        "Ministério público über straße 3.14159",
        "the the the and and",
    ]
    for name in ("text_en", "text_general", "standard", "simple", "whitespace"):
        az_a = get_analyzer(name)
        az_b = get_analyzer(name)
        batch = az_a.tokenize_array(pa.array(texts, type=pa.string()))
        single = [az_b.tokenize_text(t) if t is not None else [] for t in texts]
        assert batch.to_pylist() == single, name


def test_analyzer_registry_extension():
    from solr_ray.analysis.chain import Analyzer, register_analyzer
    import re

    register_analyzer("digits", lambda: Analyzer("digits", re.compile(r"\d+")))
    assert get_analyzer("digits").tokenize_text("a1 b22 c333") == ["1", "22", "333"]


def test_ngram_analyzers():
    from solr_ray.analysis.chain import get_analyzer

    az = get_analyzer("ngram")
    assert az.tokenize_text("Red ab") == ["re", "ed", "red", "ab"]
    assert az.tokenize_text("a") == []  # shorter than min_n=2

    ez = get_analyzer("edge_ngram")
    assert ez.tokenize_text("Hash j") == ["h", "ha", "has", "hash", "j"]

    sh = get_analyzer("shingle2")
    assert sh.tokenize_text("The quick brown") == \
        ["the_quick", "quick_brown"]
    assert sh.tokenize_text("single") == []


def test_ngram_vectorized_matches_scalar():
    import pyarrow as pa

    from solr_ray.analysis.chain import get_analyzer

    texts = ["Red ab", "", "a bc def", "Hash join merge"]
    for name in ("ngram", "edge_ngram", "shingle2"):
        az = get_analyzer(name)
        got = az.tokenize_array(pa.array(texts)).to_pylist()
        want = [az.tokenize_text(t) for t in texts]
        assert got == want, name
