"""Query serving: BM25 scoring, block-max WAND, index searcher."""
