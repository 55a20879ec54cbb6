"""HTML extraction: the north-rule byte-identity invariant."""

from solr_ray.fixtures import gen_pages
from solr_ray.stages.extract import extract_text


def test_basic_strip():
    assert extract_text(b"<p>hello <b>world</b></p>") == "hello world"


def test_script_style_content_dropped():
    h = b"<style>p{color:red}</style><p>keep</p><script>var x=1<2;</script>"
    assert extract_text(h) == "keep"


def test_comments_dropped():
    assert extract_text(b"a<!-- no <p>way</p> -->b") == "a b"


def test_entities_decoded():
    assert extract_text(b"fish &amp; chips &#x2019; &#97;") == "fish & chips ’ a"


def test_whitespace_normalized():
    assert extract_text(b"<div>a\n\n  b</div>\t<p> c </p>") == "a b c"


def test_none_and_str_input():
    assert extract_text(None) == ""
    assert extract_text("<p>str input</p>") == "str input"


def test_byte_identity_on_fixture_corpus():
    t = gen_pages(400, seed=42)
    for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == x


def test_fixture_determinism():
    assert gen_pages(120, seed=7).equals(gen_pages(120, seed=7))
    assert not gen_pages(120, seed=7).equals(gen_pages(120, seed=8))
