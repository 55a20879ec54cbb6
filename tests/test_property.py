"""Property-based tests (hypothesis) for the engine's core invariants:
codec round-trips, fast-tokenizer equivalence, top-k ordering."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_ray.analysis.chain import get_analyzer
from solr_ray.stages.codec import (
    delta_decode, delta_encode, varint_decode, varint_encode)

_SETTINGS = dict(max_examples=100, deadline=None)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(**_SETTINGS)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v), v.size), v)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=200, unique=True))
@settings(**_SETTINGS)
def test_delta_roundtrip_sorted(ids):
    v = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(v)), v)


@given(st.lists(st.text(max_size=60), max_size=30),
       st.sampled_from(["text_en", "text_general", "standard", "simple",
                        "whitespace"]))
@settings(**_SETTINGS)
def test_fast_tokenizer_equals_reference(texts, analyzer):
    """The translate+split batch path must equal the per-string regex path
    for ARBITRARY unicode input, in both output encodings."""
    az = get_analyzer(analyzer)
    want = [az.tokenize_text(t) for t in texts]
    col = pa.array(texts, pa.string())
    assert az.tokenize_array(col).to_pylist() == want
    assert az.tokenize_array(col, dict_encode=True).to_pylist() == want


@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.floats(0.001, 100.0)),
                min_size=1, max_size=300),
       st.integers(1, 20))
@settings(**_SETTINGS)
def test_order_topk_properties(pairs, k):
    """_order_topk == full (score desc, doc asc) sort truncated to k."""
    from solr_ray.search.wand import _order_topk

    seen = {}
    for d, s in pairs:  # dedupe doc ids (accumulator semantics)
        seen[d] = s
    ids = np.array(sorted(seen), dtype=np.int64)
    sc = np.array([seen[d] for d in sorted(seen)], dtype=np.float64)
    got_ids, got_sc = _order_topk(ids.copy(), sc.copy(), k)
    order = np.lexsort((ids, -sc))[:k]
    assert np.array_equal(got_ids, ids[order])
    assert np.array_equal(got_sc, sc[order])


@given(st.text(max_size=120))
@settings(**_SETTINGS)
def test_sql_parser_never_crashes_unstructured(sql):
    """Arbitrary input either parses or raises ValueError — no other
    exception type escapes the tokenizer/parser."""
    from solr_ray.sql import parse_sql

    try:
        parse_sql(sql)
    except ValueError:
        pass
