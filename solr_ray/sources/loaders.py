"""Sources/sinks (SURVEY.md §2.1).

Loader mapping: JsonLoader.java:69 -> read_json (+ split-path projection),
CSVLoaderBase.java:41 -> read_csv (+ per-field split/map transforms),
response writers / ExportWriter.java:95 -> write_parquet/json/csv (+ sorted
export). Parquet replaces javabin as the binary format.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def read_pages(paths, columns=None, lang: str | None = None):
    """North-rule source: pruned parquet read of web pages; optional
    row-filter pushdown on lang (predicate reaches parquet row groups)."""
    filt = (pc.field("lang") == lang) if lang else None
    return ray.data.read_parquet(paths, columns=columns, filter=filt)


def read_json_docs(paths, field_splits: dict[str, str] | None = None):
    """JsonLoader: JSON-lines -> rows; optional per-field split (the CSV/JSON
    loaders' `f.split` transform) turning 'a,b' strings into list columns."""
    ds = ray.data.read_json(paths)
    if field_splits:
        ds = split_fields(ds, field_splits)
    return ds


def read_csv_docs(paths, field_splits: dict[str, str] | None = None, **kwargs):
    """CSVLoader: CSV -> rows with optional per-field split transforms."""
    ds = ray.data.read_csv(paths, **kwargs)
    if field_splits:
        ds = split_fields(ds, field_splits)
    return ds


def split_fields(ds, field_splits: dict[str, str]):
    def f(t: pa.Table) -> pa.Table:
        for col, sep in field_splits.items():
            splitted = pc.split_pattern(t[col], pattern=sep)
            t = t.drop_columns([col]).append_column(col, splitted)
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def export_sorted(ds, out_dir: str, sort_keys: list[str], descending=False):
    """/export (ExportWriter.java:95,658): total-order export of the full
    result set — Ray shuffle sort + partitioned parquet sink."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    ds.sort(sort_keys, descending=descending).write_parquet(out_dir)
    return out_dir


def write_results(ds, out_dir: str, fmt: str = "parquet"):
    """Response-writer sink registry (SolrCore.java:3031-3051): format by
    name. Parquet is the default interchange; json/csv for interop."""
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt == "json":
        ds.write_json(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return out_dir
