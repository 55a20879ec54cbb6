"""solr_ray — a Ray-Data-native full-text indexing / search / data-processing
engine with the capabilities of Apache Solr's Lucene-style core, built from
scratch on ray.data.Dataset pipelines over zero-copy Arrow batches.

Not a port: the reference (cowpaths/solr, read-only at /root/reference) defines
WHAT is computed (analysis chain, BM25 semantics, posting-list model, operator
surface — see SURVEY.md); the execution engine here is idiomatic Ray Data.
"""

__version__ = "0.1.0"
