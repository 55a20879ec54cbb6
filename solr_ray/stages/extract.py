"""HTML -> text extraction as a vectorized map_batches stage.

Semantics mirror the reference's extraction path (Tika SAX events
concatenated into a catch-all content field —
solr/modules/extraction/src/java/org/apache/solr/handler/extraction/SolrContentHandler.java:53,112,152
— and HTMLStripFieldUpdateProcessorFactory.java:46): markup removed,
script/style element CONTENT dropped, comments dropped, character entities
decoded, whitespace runs collapsed. This module is the canonical definition of
"extracted text" for the whole repo: the fixture generator
(solr_ray/fixtures.py) builds html FROM text such that
``extract_html(html) == text`` byte-identically per url (the north-rule
per-row invariant), and the oracle uses the same function.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | str | None) -> str:
    """One document: raw UTF-8 HTML bytes -> normalized extracted text."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, str):
        html_bytes = html_bytes.encode("utf-8")
    b = _COMMENT_RE.sub(b" ", html_bytes)
    b = _SCRIPT_STYLE_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


class ExtractHtml:
    """Actor-pool map_batches stage: pages(url, html, ...) -> + text column.

    Regexes are module-level (compiled once per worker process); the class
    form exists so callers can pin ``concurrency`` for this CPU-heavy stage.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch[self.html_col].to_pylist()]
        col = pa.array(texts, type=pa.string())
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, col)


def extract_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text") -> pa.Table:
    """Stateless-task form of ExtractHtml."""
    return ExtractHtml(html_col, out_col)(batch)
