"""Segment builder: hand-checked postings + vectorized path properties."""

import numpy as np
import pyarrow as pa

from solr_ray.analysis import get_analyzer
from solr_ray.stages.codec import decode_posting
from solr_ray.stages.docids import stable_hash64
from solr_ray.stages.segment import build_segment_tables


def _build(texts, urls, offset=0):
    az = get_analyzer("simple")
    toks = az.tokenize_array(pa.array(texts))
    h = stable_hash64(urls)
    g = pa.table({"url": pa.array(urls), "h": pa.array(h), "tokens": toks})
    return build_segment_tables(g, doc_id_offset=offset)


def test_hand_checked_segment():
    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "apple",
        "elderberry fig fig fig",
    ]
    urls = [f"https://x/{i}" for i in [3, 1, 2, 0]]
    postings, docs = _build(texts, urls, offset=100)
    # doc order is url ascending: recompute expected independently
    order = np.argsort(np.array(urls, dtype=object), kind="stable")
    url_to_doc = {urls[j]: 100 + i for i, j in enumerate(order)}
    text_of = dict(zip(urls, texts))

    by_term = {}
    for u, did in url_to_doc.items():
        for w in text_of[u].split():
            by_term.setdefault(w, {}).setdefault(did, 0)
            by_term[w][did] += 1

    assert postings.num_rows == len(by_term)
    assert postings["term"].to_pylist() == sorted(by_term)
    for row in postings.to_pylist():
        ids, tfs = decode_posting(row)
        expect = sorted(by_term[row["term"]].items())
        assert ids.tolist() == [d for d, _ in expect]
        assert tfs.tolist() == [c for _, c in expect]
        assert row["df"] == len(expect)
        assert row["cf"] == sum(c for _, c in expect)

    assert docs["dl"].to_pylist() == [
        len(text_of[u].split()) for u in docs["url"].to_pylist()
    ]
    assert docs["doc_id"].to_pylist() == list(range(100, 104))


def test_input_order_invariance():
    """Same docs, shuffled input rows -> identical segment tables."""
    texts = [f"tok{i % 7} tok{i % 3} common" for i in range(50)]
    urls = [f"https://s/{i}" for i in range(50)]
    p1, d1 = _build(texts, urls)
    perm = np.random.default_rng(0).permutation(50)
    p2, d2 = _build([texts[i] for i in perm], [urls[i] for i in perm])
    assert p1.equals(p2)
    assert d1.equals(d2)


def test_empty_tokens_docs_counted():
    postings, docs = _build(["", "apple", ""], ["u/1", "u/2", "u/3"])
    assert docs.num_rows == 3
    assert sorted(docs["dl"].to_pylist()) == [0, 0, 1]
    assert postings.num_rows == 1


def test_block_structure_multi_block():
    # one term in 300 docs -> 3 blocks of 128/128/44
    texts = ["common"] * 300
    urls = [f"https://b/{i}" for i in range(300)]
    postings, docs = _build(texts, urls)
    row = postings.to_pylist()[0]
    assert row["df"] == 300
    assert len(row["block_last_doc"]) == 3
    ids, tfs = decode_posting(row)
    assert ids.tolist() == sorted(docs["doc_id"].to_pylist())
    assert row["block_last_doc"][0] == ids[127]
    assert row["block_off_docs"][0] == 0
    assert 0 < row["block_off_docs"][1] <= 128 * 2
