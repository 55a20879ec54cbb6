"""Text analysis operators for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting, salted term statistics.

Reference anchors: LanguageIdentifierUpdateProcessor (langid module,
solr/modules/langid/.../LanguageIdentifierUpdateProcessor.java:50,241-256 —
detect language, write langField), FieldLengthUpdateProcessorFactory /
CountFieldValuesUpdateProcessorFactory (scalar normalizers), and the
north-rule's salted heavy-hitter splitting for Zipf-skewed term keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.analysis.chain import process_analyzer
from solr_ray.stages.docids import stable_hash64

# ------------------------------------------------------------- language id

# Tiny deterministic stopword-profile language identifier (n-gram-heuristic
# class of detectors like the langid module's; profiles are common public
# function words).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "on", "are", "this", "be", "at", "have", "not", "you"},
    "de": {"der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein",
           "auf", "sich", "den", "von", "des", "im", "dem", "zu", "für", "sie"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "du", "que",
           "pour", "dans", "qui", "sur", "pas", "au", "avec", "ce", "il"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "por", "con", "para", "del", "se", "su", "al", "lo", "más"},
}


def detect_language(text: str) -> tuple[str, float]:
    """(lang, confidence) by function-word hit ratio; 'und' when ambiguous."""
    words = (text or "").lower().split()
    if not words:
        return "und", 0.0
    scores = {
        lang: sum(1 for w in words if w in prof) / len(words)
        for lang, prof in _LANG_PROFILES.items()
    }
    best = max(sorted(scores), key=lambda k: scores[k])
    conf = scores[best]
    if conf < 0.05:
        return "und", conf
    return best, conf


class LangIdStage:
    """Actor-pool map_batches stage (the langid detector is 'model' state,
    loaded once per actor like the reference's Tika/OpenNLP profiles).

    Fully vectorized: one lowercase+split over the batch, then one
    ``pc.is_in`` + bincount per language profile — no per-row python.
    Result is bit-identical to detect_language (integer hit counts, one
    float division; ties resolve to the alphabetically-first language,
    which argmax over the sorted-language score matrix reproduces)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = _LANG_PROFILES  # model load stand-in
        self.langs = sorted(self.profiles)
        self._sets = [pa.array(sorted(self.profiles[l])) for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _text_column(batch[self.text_col])
        toks = pc.split_pattern_regex(pc.utf8_lower(texts),
                                      pattern=r"\s+")
        flat = toks.flatten()
        n = len(batch)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_words = np.bincount(parent, weights=nonempty, minlength=n)
        scores = np.zeros((len(self.langs), n))
        for li, vs in enumerate(self._sets):
            hits = pc.is_in(flat, value_set=vs).to_numpy(
                zero_copy_only=False)
            scores[li] = np.bincount(parent, weights=hits, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            scores = scores / n_words
        best = scores.argmax(axis=0)  # ties -> first (alphabetical) lang
        conf = scores[best, np.arange(n)]
        und = (n_words == 0) | ~(conf >= 0.05)  # NaN-safe
        conf = np.where(n_words == 0, 0.0, conf)
        langs = np.where(und, "und", np.array(self.langs)[best])
        return batch.append_column(
            self.out_col, pa.array(langs.tolist(), pa.string())
        ).append_column(self.out_col + "_conf",
                        pa.array(conf, pa.float64()))


def _text_column(col):
    """Null-safe text column: combine chunks, coerce all-null (null-typed)
    columns to string, treat NULL as '' (matching the scalar paths'
    `t or ""`)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = pc.cast(col, pa.string())
    return pc.fill_null(col, "")


# ------------------------------------------------------------ quality score

def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized quality features: n_tokens (whitespace), mean word length,
    stopword ratio, digit ratio, upper ratio. Composite quality_score in
    [0,1] (heuristic filter for training-data pipelines)."""
    texts = _text_column(batch[text_col])
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    toks = pc.split_pattern_regex(texts, pattern=r"\s+")
    n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = np.maximum(n_tokens, 0)

    # vectorized stop/digit ratios (one is_in + bincount, one regex count
    # kernel; \d == [0-9] under RE2 — equal to str.isdigit on ASCII text)
    nrows = len(batch)
    lt = pc.utf8_lower(texts)
    wtoks = pc.split_pattern_regex(lt, pattern=r"\s+")
    flat = wtoks.flatten()
    wcounts = pc.list_value_length(wtoks).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(nrows), wcounts)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_words = np.bincount(parent, weights=nonempty, minlength=nrows)
    stop_set = pa.array(sorted(_LANG_PROFILES["en"]))
    hits = pc.is_in(flat, value_set=stop_set).to_numpy(zero_copy_only=False)
    stop_hits = np.bincount(parent, weights=hits, minlength=nrows)
    stop_ratio = np.where(n_words > 0,
                          stop_hits / np.maximum(n_words, 1), 0.0)
    n_digits = pc.count_substring_regex(
        pc.fill_null(texts, ""), pattern=r"\d").to_numpy(
        zero_copy_only=False).astype(np.float64)
    digit_ratio = np.where(n_chars > 0,
                           n_digits / np.maximum(n_chars, 1), 0.0)

    mean_wlen = np.where(n_tokens > 0, (n_chars - (n_tokens - 1)) / np.maximum(n_tokens, 1), 0.0)
    score = (
        np.clip(n_tokens / 50.0, 0, 1) * 0.4
        + np.clip(stop_ratio / 0.4, 0, 1) * 0.3
        + np.clip(1.0 - digit_ratio * 5, 0, 1) * 0.15
        + np.clip((mean_wlen - 2) / 4, 0, 1) * 0.15
    )
    for name, arr in (
        ("n_tokens", n_tokens.astype(np.int64)),
        ("stop_ratio", stop_ratio),
        ("digit_ratio", digit_ratio),
        ("mean_word_len", mean_wlen),
        ("quality_score", score),
    ):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, pa.array(arr))
    return batch


# ------------------------------------------------------------ token counts

def add_token_count(batch: pa.Table, text_col: str = "text",
                    out_col: str = "n_tokens", mode: str = "whitespace") -> pa.Table:
    """whitespace: split on \\s+ (SQL-oracle-matchable). bpe_ish: a
    GPT-2-style pretokenizer regex (contractions / letter runs / digit runs /
    punctuation runs) — the standard public BPE pre-token pattern.

    bpe_ish stays a compiled-`re` findall per row BY DESIGN: the pattern
    needs backtracking + negative lookahead (``\\s+(?!\\S)``) that
    RE2/Arrow kernels cannot express, and a lookahead-free reformulation
    measurably diverges (e.g. ``" 's"`` tokenizes [" '", "s"], not
    [" ", "'s"] — alternation order interacts with the leading-space
    variants). The loop body is C (the regex engine); per-row python is
    just the len() call."""
    if mode == "whitespace":
        toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
        # empty string -> [''] which still counts 1; match SQL len(regexp_split)
        n = pc.list_value_length(toks)
    else:
        import re

        pat = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )
        n = pa.array(
            [len(pat.findall(t or "")) for t in batch[text_col].to_pylist()],
            pa.int64(),
        )
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, n)


# ------------------------------------------------------------- fingerprint

def rolling_fingerprint(text: str, analyzer: str = "simple",
                        window: int = 4) -> int:
    """Winnowing-style document fingerprint: min rolling hash over token
    windows (Rabin-Karp class, public). Deterministic int64 >= 0."""
    az = process_analyzer(analyzer)
    toks = az.tokenize_text(text or "")
    if not toks:
        return 0
    if len(toks) < window:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
    h = stable_hash64(np.array(grams, dtype=object))
    return int(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF))


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """Batch winnowing fingerprints: ONE hash_array over every doc's
    grams concatenated + minimum.reduceat at doc boundaries — exact
    scalar parity with rolling_fingerprint (which stays as the per-row
    reference)."""
    texts = batch[text_col].to_pylist()
    az = process_analyzer("simple")
    window = 4
    gram_lists = []
    for t in texts:
        toks = az.tokenize_text(t or "")
        if not toks:
            gram_lists.append([])
        elif len(toks) < window:
            gram_lists.append([" ".join(toks)])
        else:
            gram_lists.append([" ".join(toks[i:i + window])
                               for i in range(len(toks) - window + 1)])
    counts = np.array([max(len(g), 1) for g in gram_lists], dtype=np.int64)
    flat = [g for gl in gram_lists for g in (gl or [""])]
    h = stable_hash64(np.array(flat, dtype=object))
    offs = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    mins = np.minimum.reduceat(h, offs) & np.uint64(0x7FFFFFFFFFFFFFFF)
    empty = np.array([not g for g in gram_lists])
    vals = np.where(empty, 0, mins.astype(np.int64))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(vals, pa.int64()))


def rolling_fingerprint_md5(text: str, window: int = 4) -> int:
    """SQL-verifiable fingerprint variant: min over whitespace-token
    4-gram windows of the LOWER 64 bits of md5 (little-endian — exactly
    DuckDB's md5_number_lower), masked to int64 >= 0. Same winnowing
    shape as rolling_fingerprint; the siphash version stays the scale
    path (vectorized), this one exists so the oracle can replay the
    semantics end-to-end in SQL."""
    import hashlib

    toks = (text or "").split()
    if not toks:
        return 0
    if len(toks) < window:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + window])
                 for i in range(len(toks) - window + 1)]
    return min(int.from_bytes(hashlib.md5(g.encode()).digest()[8:],
                              "little") & 0x7FFFFFFFFFFFFFFF
               for g in grams)


# ---------------------------------------------- salted term statistics

def term_doc_freq(ds, text_col: str = "text", analyzer: str = "simple"):
    """df per term via per-batch partial counts (combiner) -> tiny groupby.
    The shuffle carries one row per (term, batch), never per posting."""

    def partial(t: pa.Table) -> pa.Table:
        az = process_analyzer(analyzer)
        toks = az.tokenize_array(t[text_col])
        flat = toks.flatten()
        n = len(t)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        df_tbl = (
            pa.table({"term": flat, "doc": pa.array(parent)})
            .group_by(["term", "doc"], use_threads=False)
            .aggregate([])
            .group_by("term", use_threads=False)
            .aggregate([("doc", "count")])
        )
        return pa.table({"term": df_tbl["term"], "df": df_tbl["doc_count"]})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )


def salted_term_counts(ds, text_col: str = "text", analyzer: str = "simple",
                       num_salts: int = 16):
    """Total term frequency with EXPLICIT salted heavy-hitter splitting (the
    north-rule skew pattern): row-level (term, count) partials are keyed by
    (term, salt) for the first shuffle so a Zipf-head term's rows spread over
    num_salts reducers, then a second tiny groupby(term) merges the salted
    partials. The salt only affects row placement, never the summed result,
    so any per-partial-row assignment is valid; row position within the batch
    spreads a hot term's partials across batches deterministically."""

    def partial(t: pa.Table) -> pa.Table:
        az = process_analyzer(analyzer)
        toks = az.tokenize_array(t[text_col])
        flat = toks.flatten()
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "salt": pa.array([], pa.int32()),
                             "cnt": pa.array([], pa.int64())})
        counted = (
            pa.table({"term": flat})
            .group_by("term", use_threads=False)
            .aggregate([([], "count_all")])
        )
        terms = counted["term"]
        salt = (np.arange(len(terms)) % num_salts).astype(np.int32)
        return pa.table({
            "term": terms,
            "salt": pa.array(salt),
            "cnt": counted["count_all"],
        })

    from ray.data.aggregate import Sum

    salted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return salted.groupby("term").aggregate(Sum("cnt", alias_name="cnt"))
