"""Analyzer chains and their vectorized application to Arrow columns.

Model (reference: TokenizerChain.java:36,108-137, FieldTypePluginLoader.java:43):
an analyzer = char filters -> tokenizer -> token filters. Registered chains:

- ``text_en``   — StandardTokenizer-style word break -> lowercase -> stop
                  (English) -> possessive strip -> Porter stem, mirroring the
                  default configset ``text_en`` (managed-schema.xml:344-364).
                  Order note: the reference runs stop BEFORE lowercase for
                  text_en; its stopword matching is ignoreCase=true, so
                  lowercase-first yields the identical token stream and lets
                  us run one pass over dictionary-encoded uniques.
- ``text_general`` — StandardTokenizer -> lowercase -> stop
                  (managed-schema.xml:297-313).
- ``standard``  — StandardTokenizer -> lowercase (no stop/stem).
- ``simple``    — lowercase -> split on [^a-z0-9]+. This chain is expressible
                  in ANSI SQL (regexp_split_to_array) and is used for the
                  DuckDB-oracle-checked BM25 queries.
- ``whitespace`` — split on whitespace (Solr WhitespaceTokenizer).

Vectorization strategy (the hot path of the whole engine): tokenize rows with
one compiled-regex ``findall`` per row into a flat token array + per-row
counts, then apply per-token transforms (lowercase / possessive / stop / stem)
ONLY to the dictionary-encoded unique tokens of the batch, with a persistent
unique->output cache when run inside an actor. Zipfian web text makes the
unique set tiny relative to the token stream, so the Porter stemmer (pure
Python) runs orders of magnitude fewer times than a per-token loop would.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterable

import numpy as np
import pyarrow as pa

from solr_ray.analysis.porter import porter_stem
from solr_ray.analysis.stopwords import ENGLISH_STOP_WORDS

# StandardTokenizer approximation of UAX#29 word break (Lucene 9.8
# StandardTokenizer, consumed by the reference per versions.props:50):
# runs of word chars, with interior apostrophes / dots joining runs
# ("don't", "3.14", "u.s.a"). Divergences from full UAX#29 are pinned by
# goldens in tests/test_analysis.py; the in-repo oracle shares this regex.
_STANDARD_TOKEN_RE = re.compile(r"\w+(?:['’.]\w+)*", re.UNICODE)
_SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")
_WHITESPACE_RE = re.compile(r"\S+")

_POSSESSIVE_RE = re.compile(r"(?:'s|’s)$")


@dataclass
class Analyzer:
    """A tokenizer + per-token transform chain.

    ``token_fn(tok) -> str | None`` maps one (already tokenized) token to its
    output form, or None to drop it (stop filter). Applied per *unique* token.
    """

    name: str
    token_re: re.Pattern
    pre: Callable[[str], str] | None = None  # char filter on the whole text
    token_fn: Callable[[str], str | None] = lambda t: t
    _cache: dict = field(default_factory=dict, repr=False)

    def tokenize_text(self, text: str) -> list[str]:
        """Single-string path (used by the oracle and unit tests)."""
        if text is None:
            return []
        if self.pre is not None:
            text = self.pre(text)
        out = []
        for tok in self.token_re.findall(text):
            o = self._apply(tok)
            if o is not None:
                out.append(o)
        return out

    def _apply(self, tok: str) -> str | None:
        try:
            return self._cache[tok]
        except KeyError:
            o = self.token_fn(tok)
            if len(self._cache) < 2_000_000:  # bound actor-lifetime memory
                self._cache[tok] = o
            return o

    # ---- vectorized batch path ----

    def tokenize_array(
        self, col: pa.Array | pa.ChunkedArray, dict_encode: bool = False
    ) -> pa.ListArray:
        """texts column -> list<string> token lists (large_list offsets safe).

        dict_encode=True returns list<dictionary<int32,string>> instead:
        per-token payload is an int32 code and the batch's (deduped) output
        vocabulary rides along as the dictionary. This is the index-build hot
        path — it skips materializing the full output token string array and
        ships ~4 B/token through the bucket shuffle instead of strings.
        """
        texts = col.to_pylist()
        flat: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        findall = self.token_re.findall
        pre = self.pre
        for i, t in enumerate(texts):
            if t is None:
                counts[i] = 0
                continue
            if pre is not None:
                t = pre(t)
            toks = findall(t)
            counts[i] = len(toks)
            flat.extend(toks)

        if not flat:
            offs = np.zeros(len(texts) + 1, dtype=np.int64)
            empty = pa.array([], type=pa.string())
            if dict_encode:
                empty = pa.DictionaryArray.from_arrays(
                    pa.array([], type=pa.int32()), empty)
            return pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()), empty
            )

        flat_arr = pa.array(flat, type=pa.string())
        # transform uniques only
        dict_arr = flat_arr.dictionary_encode()
        uniques = dict_arr.dictionary.to_pylist()
        mapped = [self._apply(u) for u in uniques]
        keep_u = np.array([m is not None for m in mapped], dtype=bool)
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        keep = keep_u[idx]

        # rebuild per-row offsets after drops
        row_ids = np.repeat(np.arange(len(texts), dtype=np.int64), counts)[keep]
        new_counts = np.bincount(row_ids, minlength=len(texts))
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(new_counts, out=offsets[1:])

        if dict_encode:
            # dedupe the MAPPED uniques (distinct inputs can stem to the same
            # output) so one term == one code, then remap token codes. All
            # per-token work is int gathers; only the tiny vocab is strings.
            kept_out = np.array(
                [m for m in mapped if m is not None], dtype=object)
            uniq_out, inverse = np.unique(kept_out, return_inverse=True)
            remap = np.full(len(uniques), -1, dtype=np.int64)
            remap[keep_u] = inverse
            new_codes = remap[idx][keep]
            values = pa.DictionaryArray.from_arrays(
                pa.array(new_codes.astype(np.int32), type=pa.int32()),
                pa.array(uniq_out.tolist(), type=pa.string()),
            )
        else:
            out_u = np.array(
                [m if m is not None else "" for m in mapped], dtype=object
            )
            values = pa.array(out_u[idx][keep], type=pa.string())
        return pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), values
        )


def _en_token_fn(tok: str) -> str | None:
    tok = tok.lower()
    if tok in ENGLISH_STOP_WORDS:
        return None
    tok = _POSSESSIVE_RE.sub("", tok)
    if not tok:
        return None
    return porter_stem(tok)


def _general_token_fn(tok: str) -> str | None:
    tok = tok.lower()
    if tok in ENGLISH_STOP_WORDS:
        return None
    return tok


def _make_analyzers() -> dict[str, Callable[[], Analyzer]]:
    return {
        "text_en": lambda: Analyzer("text_en", _STANDARD_TOKEN_RE, None, _en_token_fn),
        "text_general": lambda: Analyzer(
            "text_general", _STANDARD_TOKEN_RE, None, _general_token_fn
        ),
        "standard": lambda: Analyzer(
            "standard", _STANDARD_TOKEN_RE, None, lambda t: t.lower()
        ),
        "simple": lambda: Analyzer("simple", _SIMPLE_TOKEN_RE, str.lower),
        "whitespace": lambda: Analyzer("whitespace", _WHITESPACE_RE),
    }


ANALYZERS: dict[str, Callable[[], Analyzer]] = _make_analyzers()


def register_analyzer(name: str, factory: Callable[[], Analyzer]) -> None:
    """Plugin point (Solr registers analyzers by class name in schema XML —
    FieldTypePluginLoader.java:43; here it's a plain registry)."""
    ANALYZERS[name] = factory


def get_analyzer(name_or_analyzer: str | Analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    return ANALYZERS[name_or_analyzer]()


def analyze_column(
    batch: pa.Table,
    text_col: str,
    analyzer: str | Analyzer,
    out_col: str = "tokens",
) -> pa.Table:
    """map_batches body: append a list<string> token column (zero-copy in)."""
    az = get_analyzer(analyzer)
    toks = az.tokenize_array(batch[text_col])
    return batch.append_column(out_col, toks)


# Process-global analyzer instances: Ray reuses worker processes across tasks,
# so stateless map_batches TASKS still get a persistent token->stem cache
# without reserving CPUs in an actor pool (which can starve upstream stages
# when concurrency × num_cpus == the node). Keyed by analyzer name.
_PROCESS_ANALYZERS: dict[str, Analyzer] = {}


def process_analyzer(name: str) -> Analyzer:
    az = _PROCESS_ANALYZERS.get(name)
    if az is None:
        az = get_analyzer(name)
        _PROCESS_ANALYZERS[name] = az
    return az


def analyze_batch(
    batch: pa.Table, text_col: str = "text", analyzer: str = "text_en",
    out_col: str = "tokens", dict_encode: bool = False,
) -> pa.Table:
    """Stateless-task map_batches body with process-cached analyzer state."""
    az = process_analyzer(analyzer)
    toks = az.tokenize_array(batch[text_col], dict_encode=dict_encode)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, toks)
