"""Pipeline stages: per-batch transforms and index-build steps."""
