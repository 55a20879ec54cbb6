"""Data-processing operators beyond the index core: dedup, similarity,
text analysis, grouping/facets, joins, windows, multimodal plumbing."""
