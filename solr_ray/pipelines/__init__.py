"""End-to-end pipelines: index build, query serving, flagship demo."""
