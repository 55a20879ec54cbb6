"""English stopword set.

The classic 33-word English stop set used by Lucene's EnglishAnalyzer /
StopFilter default (consumed by the reference's ``text_en`` field type via
``StopFilterFactory`` — managed-schema.xml:344-364; the word list itself is
public Lucene documentation / the default lang/stopwords_en.txt content).
"""

ENGLISH_STOP_WORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)
