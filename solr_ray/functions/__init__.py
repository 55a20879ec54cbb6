"""Scalar function registry + mergeable aggregate sketches."""
