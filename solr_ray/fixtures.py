"""Deterministic synthetic web-page corpus + query set (FIXTURES.md).

Mirrors the reference's seeded-generator benchmarking/testing approach
(solr/benchmark/src/java/org/apache/solr/bench/Docs.java +
generators/SplittableRandomGenerator.java — seeded, repeatable). No external
data. seed=42 everywhere.

Key invariant: ``html`` is built FROM ``text`` (tag wrapping, entity
encoding, script/style/comment junk) such that
``solr_ray.stages.extract.extract_text(html) == text`` byte-identically —
the checkable per-row invariant from BASELINE.json's input_hint.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from solr_ray.stages.extract import extract_text

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

QUERIES_SCHEMA = pa.schema([("qid", pa.int64()), ("text", pa.string())])

_VOCAB_SIZE = 50_000
_ZIPF_S = 1.07

_CONS = "bcdfghjklmnprstvwz"
_VOW = "aeiou"


def _make_vocab(rng: np.random.Generator, size: int = _VOCAB_SIZE) -> np.ndarray:
    """Deterministic pseudo-words (CV syllables), unique, lowercase."""
    words = set()
    out = []
    # a few real stopwords early so stop filtering is exercised in every doc
    for w in ("the", "and", "of", "to", "in", "is", "was", "for", "with", "that"):
        words.add(w)
        out.append(w)
    while len(out) < size:
        n_syll = int(rng.integers(1, 5))
        w = "".join(
            _CONS[int(rng.integers(len(_CONS)))] + _VOW[int(rng.integers(len(_VOW)))]
            for _ in range(n_syll)
        )
        # suffixes exercise the stemmer
        r = rng.random()
        if r < 0.15:
            w += rng.choice(["s", "ed", "ing", "ation", "ness", "ly"])
        if w not in words:
            words.add(w)
            out.append(w)
    return np.array(out, dtype=object)


def _zipf_probs(size: int, s: float = _ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


_ENTITY_MAP = {"a": "&#97;", "e": "&#101;", "o": "&#x6f;", "&": "&amp;", "<": "&lt;"}


def _htmlify(text: str, rng: np.random.Generator) -> bytes:
    """Wrap text in deterministic markup; extract_text(result) == text."""
    words = text.split(" ")
    parts: list[str] = ["<html><head><title></title>"]
    if rng.random() < 0.5:
        parts.append("<style>body { color: #fff; }</style>")
    parts.append("</head><body>")
    i = 0
    n = len(words)
    while i < n:
        sent_len = int(rng.integers(5, 15))
        chunk = words[i : i + sent_len]
        i += sent_len
        r = rng.random()
        # entity-encode one letter of one word occasionally
        if r < 0.2 and chunk:
            j = int(rng.integers(len(chunk)))
            w = chunk[j]
            for ch, ent in _ENTITY_MAP.items():
                if ch in w:
                    w = w.replace(ch, ent, 1)
                    break
            chunk[j] = w
        body = " ".join(chunk)
        tag = ("p", "div", "span", "li")[int(rng.integers(4))]
        if r < 0.1:
            parts.append(f'<a href="/x{int(rng.integers(1e6))}">{body}</a>')
        else:
            parts.append(f"<{tag}>{body}</{tag}>")
        if r > 0.85:
            parts.append("<!-- junk comment %d -->" % int(rng.integers(1e6)))
        if r > 0.95:
            parts.append("<script type='text/javascript'>var x = 1 < 2 && 3;</script>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def gen_pages(n_rows: int, seed: int = 42, dup_fraction: float = 0.02) -> pa.Table:
    """Deterministic pages table (url unique, generated in non-sorted order)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    probs = _zipf_probs(len(vocab))
    langs = np.array(["en", "de", "fr", "und"], dtype=object)
    lang_p = np.array([0.8, 0.1, 0.05, 0.05])

    # log-normal doc lengths, clipped to [10, 5000]
    dls = np.clip(np.exp(rng.normal(4.0, 1.0, n_rows)), 10, 5000).astype(np.int64)

    texts: list[str] = []
    for i in range(n_rows):
        if i > 0 and rng.random() < dup_fraction:
            texts.append(texts[int(rng.integers(i))])  # exact duplicate body
        else:
            toks = rng.choice(vocab, size=int(dls[i]), p=probs)
            texts.append(" ".join(toks.tolist()))

    htmls = [_htmlify(t, rng) for t in texts]
    # urls unique, emitted in shuffled (non-sorted) order
    perm = rng.permutation(n_rows)
    urls = [
        f"https://host{int(p) % 997}.example/p/{int(p):010d}" for p in perm
    ]
    base = np.int64(1_700_000_000_000_000)  # fixed epoch-us origin
    ts = base + rng.integers(0, 365 * 86_400_000_000, n_rows, dtype=np.int64)
    lang = rng.choice(langs, size=n_rows, p=lang_p)

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
        }
    )


def gen_queries(n_queries: int = 200, seed: int = 42) -> pa.Table:
    """1-5 term queries from head/torso/tail, plus stopword-only and
    unknown-term queries (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _make_vocab(np.random.default_rng(seed))
    texts = []
    for q in range(n_queries):
        r = rng.random()
        if r < 0.03:
            texts.append("the and of")  # stopword-only
        elif r < 0.06:
            texts.append(f"zzqx{q} unknownterm{q}")  # no hits
        else:
            n_terms = int(rng.integers(1, 6))
            band = rng.random()
            if band < 0.4:
                hi = 100  # head (hot terms)
            elif band < 0.8:
                hi = 5000  # torso
            else:
                hi = len(vocab)  # tail
            idx = rng.integers(0, hi, n_terms)
            texts.append(" ".join(vocab[i] for i in idx))
    return pa.table(
        {
            "qid": pa.array(np.arange(n_queries, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def pages_path(
    n_rows: int, seed: int = 42, root: str = "/tmp/solr_ray_fixtures",
    rows_per_shard: int = 8192,
) -> str:
    """Generate-once-and-cache parquet fixture; returns a DIRECTORY of shard
    files (so ray.data.read_parquet gets one read task per shard — a single
    one-row-group file reads as ONE serial task and caps the whole build)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"pages_n{n_rows}_s{seed}_sharded")
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        t = gen_pages(n_rows, seed)
        n_shards = max(1, (n_rows + rows_per_shard - 1) // rows_per_shard)
        for s in range(n_shards):
            pq.write_table(
                t.slice(s * rows_per_shard, rows_per_shard),
                os.path.join(tmp, f"shard-{s:05d}.parquet"),
                row_group_size=2048,
            )
        os.replace(tmp, path)
    return path


def replicated_pages(n_base: int, rep: int, seed: int = 42):
    """Benchmark corpus: the cached n_base fixture replicated `rep`× at read
    time with per-replica url suffixes (distinct urls, zero generation/storage
    cost). Returns a lazy Dataset of n_base*rep pages."""
    import pyarrow.compute as pc
    import ray.data

    def _replicate(t: pa.Table) -> pa.Table:
        outs = []
        for r in range(rep):
            u = pc.binary_join_element_wise(t["url"], pa.scalar(f"?r={r}"), "")
            outs.append(t.set_column(t.schema.get_field_index("url"), "url", u))
        return pa.concat_tables(outs)

    ds = ray.data.read_parquet(pages_path(n_base, seed))
    if rep <= 1:
        return ds
    return ds.map_batches(_replicate, batch_format="pyarrow")


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Adapt the driver-provided documents table (doc_id,text,lang,...) into
    the north-rule pages shape, deterministically (FIXTURES.md §5)."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rng = np.random.default_rng(42)
    texts = t["text"].to_pylist()
    htmls = [_htmlify(x or "", rng) for x in texts]
    doc_ids = t["doc_id"].to_pylist()
    urls = [f"https://docs.example/{int(d):010d}" for d in doc_ids]
    base = np.int64(1_700_000_000_000_000)
    ts = base + np.asarray(doc_ids, dtype=np.int64) * 1_000_000
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts).cast(pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": t["lang"].combine_chunks() if isinstance(t["lang"], pa.ChunkedArray) else t["lang"],
        }
    )


def self_check(n: int = 200, seed: int = 42) -> None:
    t = gen_pages(n, seed)
    for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == x, "extract(html) != text"
