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

# Fast tokenization: translate ASCII separator chars to space (one C pass)
# then str.split, yielding PSEUDO-tokens == real tokens except in rare
# shapes ("don't.", "a..b", unicode punctuation) which are repaired by
# running the real regex per UNIQUE pseudo-token (cached). Only ASCII
# chars are mapped; non-ASCII stays glued and is likewise repaired at the
# unique level, so the output token stream is IDENTICAL to findall's.
_STANDARD_KEEP = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_'.")
_STANDARD_TBL = str.maketrans({
    chr(i): " " for i in range(128) if chr(i) not in _STANDARD_KEEP})
_SIMPLE_KEEP = set("abcdefghijklmnopqrstuvwxyz0123456789")
_SIMPLE_TBL = str.maketrans({
    chr(i): " " for i in range(128) if chr(i) not in _SIMPLE_KEEP})


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
    # translate-table for the fast split tokenizer ({} = plain .split());
    # None falls back to per-row regex findall
    split_tbl: dict | None = None
    _cache: dict = field(default_factory=dict, repr=False)
    _exp_cache: dict = field(default_factory=dict, repr=False)
    # output-term registry (fast path): term -> stable int code, so batch
    # dictionaries assemble from int gathers + one arrow take — no
    # per-batch python-string dedup
    _out_index: dict = field(default_factory=dict, repr=False)
    _out_terms: list = field(default_factory=list, repr=False)
    _registry_arr: object = field(default=None, repr=False)

    def _exp_codes(self, pseudo: str) -> np.ndarray:
        got = self._exp_cache.get(pseudo)
        if got is None:
            codes = []
            for tok in self.token_re.findall(pseudo):
                o = self._apply(tok)
                if o is None:
                    continue
                c = self._out_index.get(o)
                if c is None:
                    c = len(self._out_terms)
                    self._out_index[o] = c
                    self._out_terms.append(o)
                    self._registry_arr = None  # grew: rebuild lazily
                codes.append(c)
            got = np.array(codes, dtype=np.int64)
            if len(self._exp_cache) < 2_000_000:
                self._exp_cache[pseudo] = got
        return got

    def _registry(self) -> pa.Array:
        if self._registry_arr is None:
            self._registry_arr = pa.array(self._out_terms, type=pa.string())
        return self._registry_arr

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
        self, col: pa.Array | pa.ChunkedArray,
        dict_encode: "bool | str" = False
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
        pre = self.pre
        tbl = self.split_tbl
        if tbl is not None:
            # fast path: one C-level translate + split per row; divergent
            # pseudo-tokens are repaired per UNIQUE below (self._expand)
            for i, t in enumerate(texts):
                if t is None:
                    counts[i] = 0
                    continue
                if pre is not None:
                    t = pre(t)
                toks = t.translate(tbl).split() if tbl else t.split()
                counts[i] = len(toks)
                flat.extend(toks)
            return self._finish_fast(texts, flat, counts, dict_encode)
        if dict_encode == "tf":
            raise ValueError(
                "dict_encode='tf' needs a fast-path analyzer (split_tbl); "
                f"analyzer {self.name!r} uses the regex fallback")
        findall = self.token_re.findall
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


def _empty_list(n_rows: int, dict_encode: bool) -> pa.ListArray:
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    empty = pa.array([], type=pa.string())
    if dict_encode:
        empty = pa.DictionaryArray.from_arrays(
            pa.array([], type=pa.int32()), empty)
    return pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), empty)


def _empty_tf(n_rows: int):
    e = _empty_list(n_rows, True)
    tf = pa.ListArray.from_arrays(
        pa.array(np.zeros(n_rows + 1, dtype=np.int64), type=pa.int32()),
        pa.array([], type=pa.int32()))
    return e, tf


def _finish_fast_impl(az: "Analyzer", texts, flat, counts, dict_encode):
    """Shared tail of the fast tokenizer: map unique pseudo-tokens to their
    cached output-term code sequences (registry codes), then rebuild the
    flat code stream and row offsets with pure integer gathers. The batch
    dictionary is one arrow `take` from the registry — no per-batch
    python-string dedup."""
    if not flat:
        return (_empty_tf(len(texts)) if dict_encode == "tf"
                else _empty_list(len(texts), dict_encode))
    flat_arr = pa.array(flat, type=pa.string())
    dict_arr = flat_arr.dictionary_encode()
    uniques = dict_arr.dictionary.to_pylist()
    exps = [az._exp_codes(u) for u in uniques]
    lens_u = np.array([e.size for e in exps], dtype=np.int64)
    n_rows = len(texts)
    if not lens_u.any():
        return (_empty_tf(n_rows) if dict_encode == "tf"
                else _empty_list(n_rows, dict_encode))
    all_codes = np.concatenate(exps) if len(exps) > 1 else exps[0]
    # local (batch) dictionary: distinct global codes, remapped via
    # searchsorted — int ops only
    uniq_g = np.unique(all_codes)
    seq_codes = np.searchsorted(uniq_g, all_codes)
    seq_off = np.zeros(lens_u.size + 1, dtype=np.int64)
    np.cumsum(lens_u, out=seq_off[1:])

    idx = dict_arr.indices.to_numpy(zero_copy_only=False)
    tok_lens = lens_u[idx]
    total = int(tok_lens.sum())
    tok_start = np.zeros(idx.size + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=tok_start[1:])
    pos_in_tok = np.arange(total, dtype=np.int64) - np.repeat(
        tok_start[:-1], tok_lens)
    flat_codes = seq_codes[np.repeat(seq_off[idx], tok_lens) + pos_in_tok]

    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    new_counts = np.bincount(
        row_ids, weights=tok_lens, minlength=n_rows).astype(np.int64)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(new_counts, out=offsets[1:])

    batch_dict = az._registry().take(pa.array(uniq_g))
    if dict_encode == "tf":
        # doc-level tf pre-aggregation (positions-free builds): dedupe
        # (row, code) pairs so the shuffle ships one entry per distinct
        # term per doc with its tf, not one per token. One int sort per
        # batch; code order within a doc becomes ascending (irrelevant
        # without positions — the segment builder re-sorts by term rank).
        nu = np.int64(uniq_g.size)
        row_flat = np.repeat(np.arange(n_rows, dtype=np.int64), new_counts)
        k2 = row_flat * nu + flat_codes
        k2.sort(kind="stable")
        starts2 = np.flatnonzero(np.diff(k2, prepend=k2[0] - 1))
        ku = k2[starts2]
        tfs = np.empty(starts2.size, dtype=np.int64)
        tfs[:-1] = np.diff(starts2)
        tfs[-1] = k2.size - starts2[-1]
        dedup_codes = (ku % nu).astype(np.int32)
        dedup_rows = ku // nu
        d_counts = np.bincount(dedup_rows, minlength=n_rows)
        d_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(d_counts, out=d_offsets[1:])
        values = pa.DictionaryArray.from_arrays(
            pa.array(dedup_codes, type=pa.int32()), batch_dict)
        toks_arr = pa.ListArray.from_arrays(
            pa.array(d_offsets, type=pa.int32()), values)
        tfs_arr = pa.ListArray.from_arrays(
            pa.array(d_offsets, type=pa.int32()),
            pa.array(tfs.astype(np.int32), type=pa.int32()))
        return toks_arr, tfs_arr
    if dict_encode:
        values = pa.DictionaryArray.from_arrays(
            pa.array(flat_codes.astype(np.int32), type=pa.int32()),
            batch_dict,
        )
    else:
        values = batch_dict.take(pa.array(flat_codes))
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), values)


Analyzer._finish_fast = _finish_fast_impl


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


def _ngram_pre(min_n: int, max_n: int, edge: bool):
    """Char-filter that rewrites text into space-separated character
    n-grams of each whitespace token — NGramFilterFactory /
    EdgeNGramFilterFactory semantics (solr/core FieldTypes delegate to
    Lucene NGramTokenFilter/EdgeNGramTokenFilter): for each token emit
    grams of length min_n..max_n (edge: prefixes only); tokens shorter
    than min_n emit nothing. Lowercased first (the standard ngram-field
    chain)."""

    def pre(text: str) -> str:
        out = []
        for tok in text.lower().split():
            L = len(tok)
            hi = min(max_n, L)
            for n in range(min_n, hi + 1):
                if edge:
                    out.append(tok[:n])
                else:
                    out.extend(tok[i:i + n] for i in range(L - n + 1))
        return " ".join(out)

    return pre


def _shingle_pre(size: int, sep: str = "_"):
    """ShingleFilterFactory semantics (word n-grams, outputUnigrams=false,
    tokenSeparator configurable — '_' here so shingles survive the
    whitespace re-tokenize). Lowercased first."""

    def pre(text: str) -> str:
        toks = text.lower().split()
        return " ".join(sep.join(toks[i:i + size])
                        for i in range(len(toks) - size + 1))

    return pre


def _make_analyzers() -> dict[str, Callable[[], Analyzer]]:
    return {
        "ngram": lambda: Analyzer("ngram", _WHITESPACE_RE,
                                  _ngram_pre(2, 3, edge=False),
                                  split_tbl={}),
        "edge_ngram": lambda: Analyzer("edge_ngram", _WHITESPACE_RE,
                                       _ngram_pre(1, 4, edge=True),
                                       split_tbl={}),
        "shingle2": lambda: Analyzer("shingle2", _WHITESPACE_RE,
                                     _shingle_pre(2), split_tbl={}),
        "text_en": lambda: Analyzer("text_en", _STANDARD_TOKEN_RE, None,
                                    _en_token_fn, _STANDARD_TBL),
        "text_general": lambda: Analyzer(
            "text_general", _STANDARD_TOKEN_RE, None, _general_token_fn,
            _STANDARD_TBL
        ),
        "standard": lambda: Analyzer(
            "standard", _STANDARD_TOKEN_RE, None, lambda t: t.lower(),
            _STANDARD_TBL
        ),
        "simple": lambda: Analyzer("simple", _SIMPLE_TOKEN_RE, str.lower,
                                   split_tbl=_SIMPLE_TBL),
        "whitespace": lambda: Analyzer("whitespace", _WHITESPACE_RE,
                                       split_tbl={}),
    }


ANALYZERS: dict[str, Callable[[], Analyzer]] = _make_analyzers()


def register_analyzer(name: str, factory: Callable[[], Analyzer]) -> None:
    """Plugin point (Solr registers analyzers by class name in schema XML —
    FieldTypePluginLoader.java:43; here it's a plain registry)."""
    ANALYZERS[name] = factory


def _synonym_pre(groups: dict[str, list[str]]):
    """Index-time SynonymGraphFilter analog (managed-schema.xml registers
    SynonymGraphFilterFactory; Lucene stacks synonyms at the same
    position). Expansion: each whitespace token emits itself followed by
    its group mates. Divergence from Lucene, documented: expanded tokens
    occupy their own positions and count toward dl (the field-length norm
    behaves like discountOverlaps=false), which keeps the whole chain
    SQL-replayable token-for-token."""

    def pre(text: str) -> str:
        out = []
        for tok in text.split():
            out.append(tok)
            g = groups.get(tok)
            if g:
                out.extend(g)
        return " ".join(out)

    return pre


def parse_syn_ws(name: str) -> "Analyzer":
    """`syn_ws:a=b=c;x=y` -> whitespace analyzer with index-time mutual
    synonym groups {a,b,c} and {x,y}. The groups live IN the name, so the
    analyzer reconstructs identically from the index manifest in any
    worker process (no registry state to ship)."""
    spec = name.split(":", 1)[1]
    groups: dict[str, list[str]] = {}
    for grp in spec.split(";"):
        members = [m for m in grp.split("=") if m]
        for m in members:
            groups.setdefault(m, [])
            for other in members:
                if other != m and other not in groups[m]:
                    groups[m].append(other)
    return Analyzer(name, _WHITESPACE_RE, _synonym_pre(groups),
                    split_tbl={})


def get_analyzer(name_or_analyzer: str | Analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    if name_or_analyzer.startswith("syn_ws:"):
        return parse_syn_ws(name_or_analyzer)
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
    out_col: str = "tokens", dict_encode=False,
) -> pa.Table:
    """Stateless-task map_batches body with process-cached analyzer state.

    dict_encode: False (list<string>), True (list<dict<int32,string>>), or
    "tf" (doc-level tf pre-aggregation: `tokens` deduped codes + `tfs`
    list<int32> — the positions-free index-build payload). The companion
    column name "tfs" is FIXED — build_segment_tables keys its tf path on
    that literal name, so tf mode requires the default out_col."""
    az = process_analyzer(analyzer)
    if dict_encode == "tf" and out_col != "tokens":
        raise ValueError("tf mode writes the fixed companion column 'tfs'; "
                         "use the default out_col='tokens'")
    out = az.tokenize_array(batch[text_col], dict_encode=dict_encode)
    drop = [c for c in (out_col, "tfs") if c in batch.column_names]
    if drop:
        batch = batch.drop_columns(drop)
    if isinstance(out, tuple):
        return (batch.append_column(out_col, out[0])
                .append_column("tfs", out[1]))
    return batch.append_column(out_col, out)
