"""Index state: manifests, lineage, corpus statistics."""
