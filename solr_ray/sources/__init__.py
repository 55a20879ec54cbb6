"""Sources and sinks: loader/writer wrappers with Solr-loader semantics."""
