"""Spellcheck + suggest over the index's global term dictionary.

Reference: SpellCheckComponent (solr/core/src/java/org/apache/solr/handler/
component/SpellCheckComponent.java) builds a term dictionary from the index
and proposes frequency-weighted corrections within small edit distance;
SuggestComponent (SuggestComponent.java:68) serves prefix completions from
FST dictionaries. Here the dictionary IS the index's global stats table
(term -> df), held by an actor once; candidates come from a deletion-
neighborhood hash (SymSpell-style, public algorithm) so lookup is O(len)
instead of a vocab scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _deletes(word: str, max_edits: int) -> set[str]:
    outs = {word}
    frontier = {word}
    for _ in range(max_edits):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        outs |= nxt
        frontier = nxt
    return outs


def _damerau_distance(a: str, b: str, cap: int = 3) -> int:
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (prev2 is not None and i > 1 and j > 1
                    and ca == b[j - 2] and a[i - 2] == cb):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[-1]


class SpellChecker:
    """Term-dictionary spellchecker; load once per actor, check per batch."""

    def __init__(self, index_dir: str, max_edits: int = 2,
                 min_df: int = 1):
        st = pq.read_table(os.path.join(index_dir, "stats"),
                           columns=["term", "df"])
        terms = st["term"].to_pylist()
        dfs = st["df"].to_numpy(zero_copy_only=False)
        self.df = {t: int(d) for t, d in zip(terms, dfs) if d >= min_df}
        self.max_edits = max_edits
        # SymSpell delete-neighborhood index: deleted-form -> candidate terms
        self.neigh: dict[str, list[str]] = {}
        for t in self.df:
            for d in _deletes(t, max_edits):
                self.neigh.setdefault(d, []).append(t)

    def suggest(self, word: str, k: int = 5) -> list[tuple[str, int, int]]:
        """[(term, edit_distance, df)] — distance asc, df desc, term asc."""
        if word in self.df:
            return [(word, 0, self.df[word])]
        cands: set[str] = set()
        for d in _deletes(word, self.max_edits):
            cands.update(self.neigh.get(d, ()))
        scored = []
        for c in cands:
            dist = _damerau_distance(word, c, self.max_edits)
            if dist <= self.max_edits:
                scored.append((dist, -self.df[c], c))
        scored.sort()
        return [(c, dist, -negdf) for dist, negdf, c in scored[:k]]

    def prefix_suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """SuggestComponent-style completion: terms starting with prefix,
        by df desc then term asc."""
        hits = [(-df, t) for t, df in self.df.items() if t.startswith(prefix)]
        hits.sort()
        return [(t, -negdf) for negdf, t in hits[:k]]

    def correct_query(self, text: str, analyzer) -> str:
        """collate: replace each unknown analyzed term with its best
        suggestion (like spellcheck.collate)."""
        out = []
        for tok in analyzer.tokenize_text(text):
            if tok in self.df:
                out.append(tok)
            else:
                s = self.suggest(tok, 1)
                out.append(s[0][0] if s else tok)
        return " ".join(out)


def build_suggest_dictionary(ds, text_col: str = "text",
                             analyzer: str = "simple",
                             term_col: str | None = None,
                             weight_col: str | None = None):
    """Weighted suggester dictionary as a Dataset(term, weight).

    Two sources, mirroring SuggestComponent.java:68's dictionary
    factories: from a text column (HighFrequencyDictionary — weight is the
    term's document frequency, computed distributed by term_doc_freq), or
    from explicit (term_col, weight_col) columns (DocumentDictionaryFactory
    — e.g. product names weighted by popularity)."""
    if term_col is not None:
        import pyarrow.compute as pc

        if weight_col is None:
            raise ValueError("term_col requires weight_col")

        def shape(t: pa.Table) -> pa.Table:
            return pa.table({
                "term": pc.cast(t[term_col], pa.string()),
                "weight": pc.cast(t[weight_col], pa.int64()),
            })

        return ds.map_batches(shape, batch_format="pyarrow")
    from solr_ray.ops.textstats import term_doc_freq

    df = term_doc_freq(ds, text_col, analyzer=analyzer)
    import pyarrow.compute as pc

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"term": t["term"],
                         "weight": pc.cast(t["df"], pa.int64())})

    return df.map_batches(shape, batch_format="pyarrow")


def suggest_prefix_weighted(dict_ds, prefix: str, count: int = 10):
    """Weighted prefix completion over a suggest dictionary: terms starting
    with `prefix`, ordered (weight desc, term asc), top `count`. The filter
    runs vectorized inside map_batches (pc.starts_with); only survivors hit
    the small final sort — at 100 TB the sort input is the matching slice
    of the vocab, not the corpus."""
    import pyarrow.compute as pc

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.starts_with(t["term"], pattern=prefix))

    return (dict_ds.map_batches(flt, batch_format="pyarrow")
            .sort(["weight", "term"], descending=[True, False])
            .limit(count))


def suggest_fuzzy_weighted(dict_ds, seed: str, count: int = 10,
                           max_edits: int = 2):
    """Weighted fuzzy suggest: dictionary terms within Damerau-Levenshtein
    distance <= max_edits of `seed`, ordered (distance asc, weight desc,
    term asc) — SpellCheckComponent's ranking with SuggestComponent's
    weights. Distance runs per batch in the workers (cheap length prefilter
    first); the final sort sees only matches."""

    def flt(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        dists = np.array([_damerau_distance(seed, x, max_edits)
                          for x in terms], dtype=np.int64)
        keep = dists <= max_edits
        tt = t.filter(pa.array(keep))
        return tt.append_column("distance",
                                pa.array(dists[keep], pa.int64()))

    return (dict_ds.map_batches(flt, batch_format="pyarrow")
            .sort(["distance", "weight", "term"],
                  descending=[False, True, False])
            .limit(count))


class SpellcheckActor:
    """map_batches stage: queries(qid, text) -> suggestions per unknown term."""

    def __init__(self, index_dir: str, analyzer_name: str = "text_en",
                 max_edits: int = 2):
        from solr_ray.analysis.chain import get_analyzer

        self.checker = SpellChecker(index_dir, max_edits)
        self.analyzer = get_analyzer(analyzer_name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, terms, sugg, dists, dfs = [], [], [], [], []
        for qid, text in zip(batch["qid"].to_pylist(),
                             batch["text"].to_pylist()):
            for tok in self.analyzer.tokenize_text(text or ""):
                if tok in self.checker.df:
                    continue
                for s, dist, df in self.checker.suggest(tok, 3):
                    qids.append(qid)
                    terms.append(tok)
                    sugg.append(s)
                    dists.append(dist)
                    dfs.append(df)
        return pa.table({
            "qid": pa.array(qids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "suggestion": pa.array(sugg, pa.string()),
            "distance": pa.array(dists, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
        })
