"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Float determinism strategy: SQL engines and Ray sum floats in different
orders, so every cross-row float aggregate here is computed over
*integer-quantized* per-row values (cents / 1e-4 units / milli-units) and
divided back at the end — bit-identical in both engines. Per-row float
transforms (a*b, (v-min)/(max-min), …) use the same IEEE ops on the same
inputs in both engines and are bit-identical without quantization.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SF_SMOKE = "/root/testdata/sf0.001"
_CACHE_ROOT = "/tmp/solr_ray_entry"
_VER = "v6"  # bump to invalidate cached /tmp indexes after engine changes
# (v6: r4 payload empty-token alignment fix — pre-fix payload caches are
# misaligned and must rebuild)

K1, B = 1.2, 0.75

# Two-word queries (order-free float sums: a+b is commutative in IEEE) for
# the SQL-checked BM25 entry; longer ones go through the rows-only entry.
BM25_QUERIES = [
    "table scan", "merge join", "spark stream", "sort window", "hash agg",
    "customer query", "big data", "fast filter", "group order", "slow batch",
]
BM25_LONG_QUERIES = [
    "table scan merge join fast",
    "spark stream window sort group",
    "customer order line part value",
    "hash agg big small filter",
    "query data column row key",
]


def _tbl(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(_tbl(sf_dir, name), columns=columns)


def _idx_dir(sf_dir: str, tag: str) -> str:
    h = hashlib.md5(f"{_VER}|{sf_dir}|{tag}".encode()).hexdigest()[:10]
    return os.path.join(_CACHE_ROOT, f"idx_{tag}_{h}")


def _docs_as_pages(sf_dir: str):
    """documents(doc_id, text, ...) -> pages(url, text) with url = zero-padded
    doc_id so url order == doc_id order (makes internal docIDs == doc_id rank,
    hence SQL-replicable tie-breaks)."""

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        urls = pa.array([f"{i:08d}" for i in ids], pa.string())
        return pa.table({"url": urls, "text": t["text"]})

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )


def _build_docs_index(sf_dir: str, analyzer: str, num_buckets: int) -> str:
    from solr_ray.pipelines.build_index import build_index

    out = _idx_dir(sf_dir, f"{analyzer}_nb{num_buckets}")
    build_index(
        _docs_as_pages(sf_dir), out, analyzer=analyzer,
        num_buckets=num_buckets, text_source="text",
    )
    return out


def _title_pages(sf_dir: str):
    """documents -> pages whose text is the doc's 'title' (first 5
    whitespace tokens) — the second field for multi-field (edismax) search.
    Derived deterministically so the SQL oracle can reconstruct it."""

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        urls = pa.array([f"{i:08d}" for i in ids], pa.string())
        titles = pa.array(
            [" ".join((x or "").split()[:5]) for x in t["text"].to_pylist()],
            pa.string())
        return pa.table({"url": urls, "text": titles})

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )


def _build_title_index(sf_dir: str) -> str:
    from solr_ray.pipelines.build_index import build_index

    out = _idx_dir(sf_dir, "title_whitespace_nb1")
    build_index(_title_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text")
    return out


def _search_docs(sf_dir: str, analyzer: str, num_buckets: int, queries,
                 k: int = 10, mode: str = "taat", num_shards: int = 1):
    import ray.data

    from solr_ray.search.searcher import search_dataset

    idx = _build_docs_index(sf_dir, analyzer, num_buckets)
    qds = ray.data.from_arrow(
        pa.table({
            "qid": pa.array(range(len(queries)), pa.int64()),
            "text": pa.array(queries, pa.string()),
        })
    )
    return search_dataset(qds, idx, k=k, mode=mode, num_shards=num_shards)


# --------------------------------------------------------------------------
# entry: flagship pipeline (north rule) on sf0.001
# --------------------------------------------------------------------------

def entry() -> Any:
    """Build the inverted index over sf0.001 documents and run BM25 top-10
    for the standard query set; returns (qid, rank, doc_id, url, score)."""
    res = _search_docs(
        SF_SMOKE, "text_en", 4, BM25_QUERIES + BM25_LONG_QUERIES,
        k=10, mode="bmw", num_shards=2,
    )
    return res


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_bm25_top10(sf_dir: str):
    """North-rule core with a full SQL oracle: whitespace analyzer, 1 bucket
    (docID order == doc_id order), 2-term queries, TAAT scoring."""
    res = _search_docs(sf_dir, "whitespace", 1, BM25_QUERIES, k=10, mode="taat")

    def finish(t: pa.Table) -> pa.Table:
        doc = pc.cast(t["url"], pa.int64())
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))), pa.scalar(1e5)
        )
        return pa.table({
            "qid": t["qid"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": doc,
            "score_r": score_r,
        })

    return res.map_batches(finish, batch_format="pyarrow")


_SYN_ANALYZER = "syn_ws:scan=filter;merge=join"


def _q_synonym_index_bm25(sf_dir: str):
    """Index-time SynonymGraphFilter analog with a full SQL oracle: the
    syn_ws analyzer expands each token to its mutual group at ANALYZE
    time (groups ride in the analyzer name, so workers reconstruct it
    from the manifest); queries pass through the same analyzer (one
    fieldType, both sides — the Solr default). Expanded tokens count
    toward tf and dl (discountOverlaps=false analog), which the oracle
    replays token-for-token."""
    res = _search_docs(sf_dir, _SYN_ANALYZER, 1, BM25_QUERIES, k=10,
                       mode="taat")

    def finish(t: pa.Table) -> pa.Table:
        doc = pc.cast(t["url"], pa.int64())
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))),
            pa.scalar(1e5))
        return pa.table({
            "qid": t["qid"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": doc,
            "score_r": score_r,
        })

    return res.map_batches(finish, batch_format="pyarrow")


def _q_dismax(sf_dir: str):
    """edismax core with a full SQL oracle: qf={title^2, body^1}, tie=0.3,
    mm=2 (both clauses must match), pf={body^1.5} phrase boost. title =
    first 5 whitespace tokens of text (SQL-reconstructable)."""
    import ray.data

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.edismax import edismax_search

    body = _idx_dir(sf_dir, "whitespace_nb1_pos")  # shared with phrase entry
    build_index(_docs_as_pages(sf_dir), body, analyzer="whitespace",
                num_buckets=1, text_source="text", store_positions=True)
    dirs = {"title": _build_title_index(sf_dir), "body": body}
    qds = ray.data.from_arrow(pa.table({
        "qid": pa.array(range(len(BM25_QUERIES)), pa.int64()),
        "text": pa.array(BM25_QUERIES, pa.string()),
    }))
    res = edismax_search(qds, dirs, qf={"title": 2.0, "body": 1.0},
                         k=10, mm=2, pf={"body": 1.5}, tie=0.3)

    def finish(t: pa.Table) -> pa.Table:
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))), pa.scalar(1e5))
        return pa.table({
            "qid": t["qid"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": pc.cast(t["url"], pa.int64()),
            "score_r": score_r,
        })

    return res.map_batches(finish, batch_format="pyarrow")


def _q_bm25_wand(sf_dir: str):
    """Block-max WAND + the sharded scatter/gather merge path, SQL-oracled:
    same whitespace/nb=1 index as bm25_top10 (docID == doc_id so SQL
    tie-breaks replay exactly), so _bm25_oracle_sql() applies verbatim —
    this value-oracles the WAND scorer end-to-end, not just its identity
    to TAAT. The text_en / 4-bucket / long-query sharded config stays
    exercised by entry() and by pytest's sharded==single assertion."""
    res = _search_docs(sf_dir, "whitespace", 1, BM25_QUERIES,
                       k=10, mode="bmw", num_shards=2)

    def finish(t: pa.Table) -> pa.Table:
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))), pa.scalar(1e5))
        return pa.table({
            "qid": t["qid"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": pc.cast(t["url"], pa.int64()),
            "score_r": score_r,
        })

    return res.map_batches(finish, batch_format="pyarrow")


def _q_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "q_i": pa.array(np.round(qty).astype(np.int64)),
            "price_c": pa.array(np.round(price * 100.0).astype(np.int64)),
            "dp_c4": pa.array(
                np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
            ),
        })

    from solr_ray.ops.grouping import combiner_groupby

    # 6 output groups from 600k rows: per-batch combining turns the
    # sort-shuffle into a scan (exact: integer-quantized sums)
    g = combiner_groupby(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_q_i": ("q_i", "sum"),
         "sum_price_c": ("price_c", "sum"),
         "sum_dp_c4": ("dp_c4", "sum"),
         "n_rows": ("q_i", "count")},
    )

    def finish(t: pa.Table) -> pa.Table:
        sq = t["sum_q_i"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_rows"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pa.array(sq),
            "sum_base_price": pa.array(
                t["sum_price_c"].to_numpy(zero_copy_only=False) / 100.0),
            "sum_disc_price": pa.array(
                t["sum_dp_c4"].to_numpy(zero_copy_only=False) / 10000.0),
            "avg_qty": pa.array(sq / n),
            "n_rows": t["n_rows"],
        })

    return g.map_batches(finish, batch_format="pyarrow")


def _q_facet_lang(sf_dir: str):
    from solr_ray.ops.grouping import facet_field

    return facet_field(_read(sf_dir, "documents", columns=["lang"]),
                       "lang", limit=10)


def _q_facet_range_value(sf_dir: str):
    from solr_ray.ops.grouping import facet_range

    out = facet_range(_read(sf_dir, "events", columns=["value"]),
                      "value", 0.0, 500.0, 50.0)
    return out.map_batches(
        lambda t: pa.table({"bucket_start": t["bucket_start"],
                            "n": t["count()"]}),
        batch_format="pyarrow",
    )


def _q_pivot_lang_source(sf_dir: str):
    from solr_ray.ops.grouping import pivot_facet

    out = pivot_facet(_read(sf_dir, "documents", columns=["lang", "source"]),
                      ["lang", "source"], limit=1000)
    return out.map_batches(
        lambda t: pa.table({"lang": t["lang"], "source": t["source"],
                            "n": t["count()"]}),
        batch_format="pyarrow",
    )


def _q_distinct_event_types(sf_dir: str):
    from solr_ray.ops.grouping import distinct

    return distinct(_read(sf_dir, "events", columns=["event_type"]),
                    ["event_type"])


def _q_collapse_max_order(sf_dir: str):
    from solr_ray.ops.grouping import collapse

    out = collapse(_read(sf_dir, "orders",
                         columns=["o_custkey", "o_totalprice", "o_orderkey"]),
                   "o_custkey", "o_totalprice", descending=True)
    return out.select_columns(["o_custkey", "o_totalprice"])


def _q_group_topk_orders(sf_dir: str):
    from solr_ray.ops.grouping import group_topk

    out = group_topk(_read(sf_dir, "orders",
                           columns=["o_orderpriority", "o_totalprice"]),
                     "o_orderpriority", "o_totalprice", k=3, descending=True)
    return out.select_columns(["o_orderpriority", "o_totalprice"])


def _q_semi_join_building(sf_dir: str):
    import duckdb

    from solr_ray.ops.joins import semi_join

    keys = duckdb.sql(
        f"SELECT c_custkey FROM read_parquet('{_tbl(sf_dir, 'customer')}') "
        "WHERE c_mktsegment = 'BUILDING'"
    ).df()["c_custkey"].tolist()
    return semi_join(_read(sf_dir, "orders"), keys, "o_custkey")


def _q_anti_join_small_customers(sf_dir: str):
    import duckdb

    from solr_ray.ops.joins import anti_join

    keys = duckdb.sql(
        f"SELECT DISTINCT o_custkey FROM read_parquet('{_tbl(sf_dir, 'orders')}') "
        "WHERE o_totalprice > 300000"
    ).df()["o_custkey"].tolist()
    return anti_join(_read(sf_dir, "customer"), keys, "c_custkey")


def _q_join_customer_region(sf_dir: str):
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    from solr_ray.ops.joins import broadcast_hash_join

    nation = pq.read_table(_tbl(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_tbl(sf_dir, "region")).to_pandas()
    small = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    small = small.rename(columns={"n_nationkey": "c_nationkey"})[
        ["c_nationkey", "r_name"]
    ]
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["c_acctbal"]).append_column(
            "bal_c", pa.array(np.round(v * 100.0).astype(np.int64)))

    joined = broadcast_hash_join(
        cust.map_batches(cents, batch_format="pyarrow"), small, "c_nationkey"
    )
    g = joined.groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Sum("bal_c", alias_name="bal_c"))
    return g.map_batches(
        lambda t: pa.table({
            "r_name": t["r_name"], "n_customers": t["n_customers"],
            "sum_acctbal": pa.array(
                t["bal_c"].to_numpy(zero_copy_only=False) / 100.0),
        }),
        batch_format="pyarrow",
    )


def _q_shuffle_join_orders(sf_dir: str):
    """Both-sides-large hash-partitioned join (Ray Dataset.join): orders ⋈
    customer, then count + acctbal-cents sum per market segment."""
    from ray.data.aggregate import Count, Sum

    from solr_ray.ops.joins import shuffle_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "price_c": pa.array(np.round(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })

    left = orders.map_batches(keyed, batch_format="pyarrow")
    joined = shuffle_join(left, cust, on="c_custkey", num_partitions=8)
    g = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    return g.map_batches(
        lambda t: pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_orders": t["n_orders"],
            "sum_totalprice": pa.array(
                t["price_c"].to_numpy(zero_copy_only=False) / 100.0),
        }),
        batch_format="pyarrow",
    )


def _q_block_join_parents(sf_dir: str):
    """{!parent} block join: nest lineitem children under orders, return
    orders with >=1 child of quantity >= 45, scored by ScoreMode=total over
    the matching children's price (cents -> exact integer sum)."""
    from solr_ray.ops.blockjoin import nest_children, parent_query

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "qty_i": pa.array(np.round(qty).astype(np.int64)),
            "price_c": pa.array(np.round(price * 100.0).astype(np.int64)),
        })

    nested = nest_children(orders, li.map_batches(prep, batch_format="pyarrow"),
                           "o_orderkey", "l_orderkey")
    out = parent_query(
        nested,
        child_filter={"op": "range", "field": "qty_i", "lo": 45,
                      "include_lo": True},
        score_field="price_c", score_mode="total",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "score_c": pc.cast(t["score"], pa.int64()),
            "n_matching_children": t["n_matching_children"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_sliding_window(sf_dir: str):
    """Per-user rolling SUM over the last 5 events (integer-quantized value
    so the window accumulation is exact and matches the DuckDB window
    function bit-for-bit)."""
    from solr_ray.ops.windows import sliding_window

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def milli(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(1000.0))),
                    pa.int64())
        return t.drop_columns(["value"]).append_column("v_milli", v)

    out = sliding_window(ds.map_batches(milli, batch_format="pyarrow"),
                         "user_id", "ts", "v_milli", n=5, agg="sum",
                         tie_col="event_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "roll_sum": pc.cast(t["rolling_v_milli"], pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_explode_embeddings(sf_dir: str):
    from solr_ray.ops.joins import explode

    out = explode(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                  "embedding", out_col="element")

    def f64(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t["vec_id"],
            "element": pc.cast(t["element"], pa.float64()),
        })

    return out.map_batches(f64, batch_format="pyarrow")


def _q_fetch_supplier_nation(sf_dir: str):
    import pyarrow.parquet as pq

    from solr_ray.ops.joins import fetch_fields

    nation = pq.read_table(_tbl(sf_dir, "nation")).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "s_nationkey"})
    out = fetch_fields(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]),
        nation, "s_nationkey", ["n_name"])
    return out.select_columns(["s_suppkey", "s_name", "n_name"])


def _q_timeseries_hourly(sf_dir: str):
    from solr_ray.ops.windows import timeseries

    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def milli(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["value"]).append_column(
            "v_milli", pa.array(np.floor(v * 1000.0).astype(np.int64)))

    out = timeseries(ev.map_batches(milli, batch_format="pyarrow"),
                     "ts", "hour",
                     {"n_events": ("v_milli", "count"),
                      "sum_v_milli": ("v_milli", "sum")})
    return out.map_batches(
        lambda t: pa.table({
            "bucket": t["bucket"], "n_events": t["n_events"],
            "sum_value_m": pa.array(
                t["sum_v_milli"].to_numpy(zero_copy_only=False) / 1000.0),
        }),
        batch_format="pyarrow",
    )


def _q_relatedness_source(sf_dir: str):
    """JSON Facet relatedness() over documents.source with foreground
    lang='en' (RelatednessAgg.computeRelatedness semantics: z-score of
    the bucket's fg count against the background probability, five-
    sigmoid blend, round-half-up to 5 digits)."""
    from solr_ray.ops.grouping import relatedness_facet

    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    return relatedness_facet(
        docs, "source", {"op": "term", "field": "lang", "value": "en"},
        limit=25)


def _q_facet_prefix_index(sf_dir: str):
    """facet.prefix + facet.sort=index over documents.source: sources
    starting 'src1' in value order (FacetFieldProcessor options)."""
    from solr_ray.ops.grouping import facet_field

    docs = _read(sf_dir, "documents", columns=["source"])
    return facet_field(docs, "source", limit=50, prefix="src1",
                       sort="index")


def _q_curation_pipeline(sf_dir: str):
    """End-to-end training-data curation, one streaming chain: quality
    gate (floored score >= 0.5) -> language ID (keep 'en') -> exact
    text dedup (first-writer-wins by doc_id) -> per-doc token counts.
    Every stage is the SQL-oracled operator, so the COMPOSITION has a
    full value oracle too."""
    from solr_ray.ops.dedup import exact_dedup
    from solr_ray.ops.textstats import LangIdStage, quality_features

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = docs.map_batches(lambda t: quality_features(t, "text"),
                          batch_format="pyarrow")

    def gate(t: pa.Table) -> pa.Table:
        s = np.floor(t["quality_score"].to_numpy(zero_copy_only=False)
                     * 1e6) / 1e6
        return t.filter(pa.array(s >= 0.5))

    ds = ds.map_batches(gate, batch_format="pyarrow")
    ds = ds.map_batches(LangIdStage("text"), batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang_pred"], "en")),
        batch_format="pyarrow")
    ds = exact_dedup(ds, ["text"], "doc_id")

    def shape(t: pa.Table) -> pa.Table:
        sc = t["quality_score"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "score_r": pa.array(np.floor(sc * 1e6) / 1e6, pa.float64()),
        })

    return ds.map_batches(shape, batch_format="pyarrow").sort("doc_id")


def _q_edge_ngram_df(sf_dir: str):
    """EdgeNGramFilterFactory chain (1..4-char prefixes per token) feeding
    the distributed df combiner — the classic search-as-you-type index
    shape. (gram, doc-frequency) over documents, gram order."""
    from solr_ray.ops.textstats import term_doc_freq

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = term_doc_freq(docs, "text", analyzer="edge_ngram")

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"term": t["term"],
                         "df": pc.cast(t["df"], pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow").sort("term")


def _q_shingle_counts(sf_dir: str):
    """ShingleFilterFactory (2-word shingles, '_' separator) through the
    salted heavy-hitter term counter. (shingle, total count)."""
    from solr_ray.ops.textstats import salted_term_counts

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = salted_term_counts(docs, "text", analyzer="shingle2")

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"term": t["term"],
                         "cnt": pc.cast(t["cnt"], pa.int64())})

    return out.map_batches(shape, batch_format="pyarrow").sort("term")


def _q_igain_features(sf_dir: str):
    """features(igain) over documents vs lang='en': per-term information
    gain from distributed (df_pos, df_all) presence counts
    (IGainTermsQParserPlugin.java:43 semantics, natural log)."""
    from solr_ray.ops.ml import igain_features

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = igain_features(docs, "text", "lang", "en",
                         analyzer="whitespace")

    def shape(t: pa.Table) -> pa.Table:
        import math as _m

        ig = t["igain"].to_numpy(zero_copy_only=False)
        return pa.table({
            "term": t["term"],
            "df_pos": pc.cast(t["df_pos"], pa.int64()),
            "df_all": pc.cast(t["df_all"], pa.int64()),
            "igain_r": pa.array([_m.floor(v * 1e5) / 1e5 for v in ig],
                                pa.float64()),
        })

    return out.map_batches(shape, batch_format="pyarrow").sort("term")


def _q_tlogit_score(sf_dir: str):
    """classify() with a fixed logistic model (ClassifyStream semantics):
    score = sigmoid(0.4*tf(hash) - 0.3*tf(join) + 0.2*tf(scan) - 0.1),
    tf from the whitespace token stream."""
    from solr_ray.ops.ml import classify_logit

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = classify_logit(docs, "text", ["hash", "join", "scan"],
                         [0.4, -0.3, 0.2], -0.1, analyzer="whitespace")

    def shape(t: pa.Table) -> pa.Table:
        import math as _m

        sc = t["score"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "score_r": pa.array([_m.floor(v * 1e5) / 1e5 for v in sc],
                                pa.float64()),
        })

    return out.map_batches(shape, batch_format="pyarrow").sort("doc_id")


def _q_train_logit(sf_dir: str):
    """train() — TextLogitStream full-batch GD over the distributed
    feature matrix; deterministic (zero init, fixed iters). Iterative
    algorithm: no SQL form (rows-only by design); pytest proves the
    learner on separable data."""
    from solr_ray.ops.ml import train_logit

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    terms = ["hash", "join", "scan", "table", "merge"]
    w, b, hist = train_logit(docs, "text", "lang", "en", terms,
                             iters=10, lr=0.2, analyzer="whitespace")
    return pa.table({
        "feature": pa.array(terms + ["__bias__"], pa.string()),
        "weight": pa.array(list(w) + [b], pa.float64()),
        "final_loss": pa.array([hist[-1][1]] * (len(terms) + 1),
                               pa.float64()),
    })


def _q_model_actor_score(sf_dir: str):
    """Real-model actor stage (rows-only: iterative training upstream):
    train_logit's weights persist as an on-disk npz ARTIFACT; a
    ModelScoreActor pool loads it ONCE PER ACTOR (__init__: artifact read
    + vocab index + compiled analyzer) and scores batches vectorized —
    the model-in-__init__ pattern at entry-contract level. Scores are
    deterministic (fixed iters, zero init)."""
    from solr_ray.ops.ml import save_model_artifact, score_with_model, train_logit

    art = _idx_dir(sf_dir, "tlogit_model") + ".npz"
    if not os.path.exists(art):
        docs = _read(sf_dir, "documents", columns=["text", "lang"])
        terms = ["hash", "join", "scan", "table", "merge"]
        w, b, _ = train_logit(docs, "text", "lang", "en", terms,
                              iters=10, lr=0.2, analyzer="whitespace")
        os.makedirs(os.path.dirname(art), exist_ok=True)
        save_model_artifact(art, terms, w, b, analyzer="whitespace")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = score_with_model(docs, art, concurrency=2, batch_size=128)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "score_q": pc.cast(pc.floor(pc.multiply(
                t["score"], pa.scalar(1e6))), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_hash_range_split(sf_dir: str):
    """{!hash_range} shard-split: docs in hash buckets [0, 7] of 16 over
    doc_id (HashRangeQParserPlugin). siphash isn't SQL-expressible —
    rows-only; the pytest asserts the disjoint-cover partition property."""
    from solr_ray.ops.queryfilter import filter_query

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keyed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "key", pc.cast(t["doc_id"], pa.string()))

    out = filter_query(docs.map_batches(keyed, batch_format="pyarrow"),
                       {"op": "hash_range", "field": "key",
                        "lo": 0, "hi": 7, "buckets": 16})
    return out.select_columns(["doc_id", "lang"]).sort("doc_id")


def _q_let_corr_predict(sf_dir: str):
    """Lang let()/col()/evaluator surface end-to-end: bind lineitem
    columns as driver-side series (the LetStream contract), run
    corr + regress + predict, emit one tuple. Quantized so DuckDB's
    corr/regr_* aggregates compare exactly."""
    from solr_ray.expr import eval_expr

    li = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])
    return eval_expr(
        'let(d=search(li), q=col(d, l_quantity), '
        'p=col(d, l_extendedprice), m=regress(q, p), '
        'tuple(c5=quantize(corr(q, p), 100000), '
        'yhat2=quantize(predict(m, 30.0), 100)))',
        {"li": li})


def _q_let_moving_avg(sf_dir: str):
    """let(timeseries -> col -> movingAvg -> zip): the moving_avg_events
    pipeline expressed entirely in the streaming-expression DSL."""
    from solr_ray.expr import eval_expr

    ev = _read(sf_dir, "events", columns=["ts"])
    return eval_expr(
        'let(d=timeseries(events, ts="ts", gap="day", count(*)), '
        'c=col(d, "count(*)"), b=col(d, bucket), '
        'zip(bucket=copyOfRange(b, 6, length(b)), ma7=movingAvg(c, 7)))',
        {"events": ev})


def _q_let_fft_daily(sf_dir: str):
    """Lang fft()/ifft() in the DSL over the daily event-count series
    (rows-only: no SQL DFT). The ifft roundtrip column doubles as an
    internal exactness check."""
    from solr_ray.expr import eval_expr

    ev = _read(sf_dir, "events", columns=["ts"])
    out = eval_expr(
        'let(d=timeseries(events, ts="ts", gap="day", count(*)), '
        'c=col(d, "count(*)"), f=fft(c), back=ifft(f), '
        'zip(re=valueRow(f, 0), im=valueRow(f, 1), back=back))',
        {"events": ev})
    return out


def _q_dbscan_embeddings(sf_dir: str):
    """Lang dbscan() over the embeddings matrix (deterministic labels in
    row order; rows-only — no SQL density clustering)."""
    from solr_ray.functions.mathx import dbscan

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    labels = dbscan(m, eps=0.9, min_pts=3)
    return pa.table({
        "vec_id": pa.array(emb["vec_id"].to_numpy()),
        "cluster": pa.array(labels, pa.int64()),
    })


def _q_markov_sample(sf_dir: str):
    """markovChain() + seeded sample(): deterministic 3-state walk with
    the visited-state histogram (rows-only: seeded RNG, no SQL form)."""
    from solr_ray.functions.mathx import markov_chain, sample

    chain = markov_chain([[0.7, 0.2, 0.1],
                          [0.3, 0.4, 0.3],
                          [0.2, 0.3, 0.5]], state=0)
    walk = sample(chain, 10_000, seed=42)
    states, counts = np.unique(walk.astype(np.int64), return_counts=True)
    return pa.table({
        "state": pa.array(states, pa.int64()),
        "visits": pa.array(counts, pa.int64()),
    })


def _q_regress_lineitem(sf_dir: str):
    """Lang regress()/corr()/cov() as ONE distributed pass: exact integer
    moment sums (quantity grid 1, price grid cents) -> closed-form OLS.
    Float expressions mirrored verbatim in the SQL oracle."""
    from solr_ray.functions.mathx import dataset_regress

    li = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])
    m = dataset_regress(li, "l_quantity", "l_extendedprice",
                        x_scale=1, y_scale=100)
    return pa.table({
        "n": pa.array([m["n"]], pa.int64()),
        "corr_xy": pa.array([m["corr_xy"]], pa.float64()),
        "cov_xy": pa.array([m["cov_xy"]], pa.float64()),
        "slope": pa.array([m["slope"]], pa.float64()),
        "intercept": pa.array([m["intercept"]], pa.float64()),
        "r2": pa.array([m["r2"]], pa.float64()),
    })


def _q_hist_quantity(sf_dir: str):
    """Lang hist(): 10 equal-width bins over l_quantity in [1, 50] —
    integer bin keys per batch, bincount partials, tiny merge."""
    from solr_ray.functions.mathx import dataset_hist

    li = _read(sf_dir, "lineitem", columns=["l_quantity"])
    return dataset_hist(li, "l_quantity", bins=10, lo=1, hi=50, scale=1)


def _q_moving_avg_events(sf_dir: str):
    """Lang timeseries() |> movingAvg(7): daily event counts stream
    through the distributed bucketing groupby; the 7-day trailing mean
    runs on the small driver-side series (the let()-binding model)."""
    from solr_ray.functions.mathx import moving_avg
    from solr_ray.ops.windows import timeseries

    ev = _read(sf_dir, "events", columns=["ts"])
    daily = timeseries(ev, "ts", "day", {"cnt": ("ts", "count")}).to_pandas()
    ma = moving_avg(daily["cnt"].to_numpy(), 7)
    return pa.table({
        "bucket": pa.array(daily["bucket"].iloc[6:].to_numpy()),
        "ma7": pa.array(ma, pa.float64()),
    })


def _q_quantiles_value(sf_dir: str):
    from solr_ray.functions.aggregates import exact_quantiles

    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    out = exact_quantiles(_read(sf_dir, "events", columns=["value"]),
                          "value", qs)
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array([out[q] for q in qs], pa.float64())})


def _q_stats_quantity(sf_dir: str):
    from solr_ray.functions.aggregates import stats_summary

    s = stats_summary(_read(sf_dir, "lineitem", columns=["l_quantity"]),
                      "l_quantity")
    return pa.table({k: pa.array([s[k]]) for k in
                     ("count", "sum", "mean", "min", "max", "variance",
                      "stddev")})


def _q_token_counts(sf_dir: str):
    from solr_ray.ops.textstats import add_token_count

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: add_token_count(t, "text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"])


def _q_avg_tokens_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from solr_ray.ops.textstats import add_token_count

    out = _read(sf_dir, "documents", columns=["lang", "text"]).map_batches(
        lambda t: add_token_count(t, "text"), batch_format="pyarrow")
    g = out.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="tok_sum"), Count(alias_name="n_docs"))
    return g.map_batches(
        lambda t: pa.table({
            "lang": t["lang"], "n_docs": t["n_docs"],
            "avg_tokens": pa.array(
                t["tok_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
                / t["n_docs"].to_numpy(zero_copy_only=False)),
        }),
        batch_format="pyarrow",
    )


def _q_exact_dedup_docs(sf_dir: str):
    from solr_ray.ops.dedup import exact_dedup

    out = exact_dedup(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]),
        cols=["lang", "n_chars"], order_col="doc_id")
    return out.select_columns(["doc_id", "lang", "n_chars"])


def _q_top100_orders(sf_dir: str):
    ds = _read(sf_dir, "orders")
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(100)


def _q_sessions_per_user(sf_dir: str):
    from solr_ray.ops.grouping import combiner_groupby
    from solr_ray.ops.windows import session_windows

    out = session_windows(_read(sf_dir, "events", columns=["user_id", "ts"]),
                          "user_id", "ts", gap_us=2 * 3600 * 1_000_000)
    return combiner_groupby(out, ["user_id"],
                            {"n_sessions": ("user_id", "count")})


def _q_tumbling_daily(sf_dir: str):
    from solr_ray.ops.windows import tumbling_window

    out = tumbling_window(_read(sf_dir, "events", columns=["user_id", "ts", "value"]),
                          "user_id", "ts", width_us=86_400 * 1_000_000,
                          value_col="value", agg="count")
    return out.map_batches(
        lambda df: df.rename(columns={"count_value": "n_events"}),
        batch_format="pandas",
    )


def _q_term_df(sf_dir: str):
    from solr_ray.ops.textstats import term_doc_freq

    return term_doc_freq(_read(sf_dir, "documents", columns=["text"]),
                         "text", analyzer="whitespace")


def _q_salted_term_counts(sf_dir: str):
    from solr_ray.ops.textstats import salted_term_counts

    return salted_term_counts(_read(sf_dir, "documents", columns=["text"]),
                              "text", analyzer="whitespace", num_salts=8)


def _q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq

    from solr_ray.ops.similarity import knn_brute

    emb = pq.read_table(_tbl(sf_dir, "embeddings"))
    qmask = pc.less(emb["vec_id"], pa.scalar(5))
    qrows = emb.filter(qmask).sort_by("vec_id")
    qvecs = np.stack([np.asarray(v, dtype=np.float64)
                      for v in qrows["embedding"].to_pylist()])
    out = knn_brute(_read(sf_dir, "embeddings"), qvecs, k=5,
                    id_col="vec_id", vec_col="embedding", metric="cosine")
    return out.map_batches(
        lambda t: pa.table({
            "query_id": t["query_id"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "vec_id": t["id"],
        }),
        batch_format="pyarrow",
    )


def _q_scale_acctbal(sf_dir: str):
    from solr_ray.functions.scalar import scale_column

    out = scale_column(_read(sf_dir, "customer",
                             columns=["c_custkey", "c_acctbal"]),
                       "c_acctbal", 0.0, 1.0, out_col="acctbal_scaled")
    return out.select_columns(["c_custkey", "acctbal_scaled"])


_TOPIC_CUTOFF_US = 1_705_881_600_000_000  # 2024-01-22 00:00:00 UTC


def _q_topic_incremental(sf_dir: str):
    from solr_ray.ops.windows import TopicCheckpoint

    ckpt_path = os.path.join(_CACHE_ROOT, "topic_ckpt.json")
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tc = TopicCheckpoint(ckpt_path)
    tc.commit(_TOPIC_CUTOFF_US)
    return tc.pull(_read(sf_dir, "events"), "ts")


def _q_synonym_search(sf_dir: str):
    """Query-side synonym expansion (SynonymQuery scoring: df = group max,
    tf = group sum): 'merge' expands to {merge, join}."""
    import math

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.synonyms import synonym_search

    out = _idx_dir(sf_dir, "whitespace_nb1")
    build_index(_docs_as_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text")
    reader = IndexReader(out)
    ids, sc = synonym_search(reader, "merge", {"merge": ["join"]}, 20)
    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array([int(reader.url_of(int(d))) for d in ids],
                           pa.int64()),
        "score_r": pa.array([math.floor(s * 1e5) / 1e5 for s in sc.tolist()],
                            pa.float64()),
    })


def _q_boolean_query(sf_dir: str):
    """Lucene/dismax user syntax: '+table -scan merge' — must/must_not/
    should clauses over the BM25 core."""
    import math

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.queryparser import boolean_search
    from solr_ray.search.searcher import IndexReader

    out = _idx_dir(sf_dir, "whitespace_nb1")
    build_index(_docs_as_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text")
    reader = IndexReader(out)
    ids, sc = boolean_search(reader, "+table -scan merge", 20)
    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array([int(reader.url_of(int(d))) for d in ids],
                           pa.int64()),
        "score_r": pa.array([math.floor(s * 1e5) / 1e5 for s in sc.tolist()],
                            pa.float64()),
    })


def _q_phrase_search(sf_dir: str):
    """Exact phrase query (PhraseQuery semantics: consecutive positions,
    tf = phrase frequency, idf = sum of term idfs) over a positions index."""
    import math

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    out = _idx_dir(sf_dir, "whitespace_nb1_pos")
    build_index(_docs_as_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text", store_positions=True)
    reader = IndexReader(out)
    ids, sc = reader.phrase_search("table scan", 20)
    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array([int(reader.url_of(int(d))) for d in ids],
                           pa.int64()),
        "score_r": pa.array([math.floor(s * 1e5) / 1e5 for s in sc.tolist()],
                            pa.float64()),
    })


def _q_sloppy_phrase(sf_dir: str):
    """Sloppy phrase query (slop=2): ordered minimal chains with extra
    displacement <= slop; tf = chain count, idf = sum of term idfs."""
    import math

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    out = _idx_dir(sf_dir, "whitespace_nb1_pos")
    build_index(_docs_as_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text", store_positions=True)
    reader = IndexReader(out)
    ids, sc = reader.phrase_search("table scan", 20, slop=2)
    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array([int(reader.url_of(int(d))) for d in ids],
                           pa.int64()),
        "score_r": pa.array([math.floor(s * 1e5) / 1e5 for s in sc.tolist()],
                            pa.float64()),
    })


def _span_reader(sf_dir: str):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    out = _idx_dir(sf_dir, "whitespace_nb1_pos")
    build_index(_docs_as_pages(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text", store_positions=True)
    return IndexReader(out)


def _span_result(reader, ids, sc):
    import math

    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array([int(reader.url_of(int(d))) for d in ids],
                           pa.int64()),
        "score_r": pa.array([math.floor(s * 1e5) / 1e5 for s in sc.tolist()],
                            pa.float64()),
    })


def _q_span_near_wildcard(sf_dir: str):
    """complexphrase-style ordered span: "tab* scan"~2 — the first clause
    is a prefix wildcard expanded against each segment's term dictionary."""
    from solr_ray.search.spans import span_near_search

    reader = _span_reader(sf_dir)
    ids, sc = span_near_search(reader, ["tab*", "scan"], slop=2, k=20,
                               in_order=True)
    return _span_result(reader, ids, sc)


def _q_span_unordered(sf_dir: str):
    """surround-style unordered near: hash 3n join — either order,
    gap - 1 <= 3."""
    from solr_ray.search.spans import span_near_search

    reader = _span_reader(sf_dir)
    ids, sc = span_near_search(reader, ["hash", "join"], slop=3, k=20,
                               in_order=False)
    return _span_result(reader, ids, sc)


def _interval_result(reader, expr):
    """All matching docs as (doc_id, tf = minimal-interval count)."""
    from solr_ray.search.intervals import interval_match

    ids, tfs = interval_match(reader, expr)
    doc_ids = [int(reader.url_of(int(d))) for d in ids]
    order = sorted(range(len(doc_ids)), key=lambda i: doc_ids[i])
    return pa.table({
        "doc_id": pa.array([doc_ids[i] for i in order], pa.int64()),
        "tf": pa.array([int(tfs[i]) for i in order], pa.int64()),
    })


def _q_interval_ordered_maxwidth(sf_dir: str):
    """Lucene Intervals.maxwidth(Intervals.ordered(table, scan), 6):
    minimal ordered windows at most 6 tokens wide, counted per doc."""
    from solr_ray.search.intervals import I

    reader = _span_reader(sf_dir)
    return _interval_result(
        reader, I.maxwidth(I.ordered("table", "scan"), 6))


def _q_interval_unordered_3(sf_dir: str):
    """Intervals.unordered over THREE clauses (hash, join, scan) —
    minimal covering windows, exact at any clause count (edge-sweep is
    O(n*k), unlike span_near's 2^(k-1) combo cap)."""
    from solr_ray.search.intervals import I

    reader = _span_reader(sf_dir)
    return _interval_result(reader, I.unordered("hash", "join", "scan"))


def _q_interval_containing(sf_dir: str):
    """Intervals.containing(unordered(hash, join), table): minimal
    hash/join windows that physically contain a 'table' occurrence."""
    from solr_ray.search.intervals import I

    reader = _span_reader(sf_dir)
    return _interval_result(
        reader, I.containing(I.unordered("hash", "join"), "table"))


def _payload_reader(sf_dir: str):
    """Payload index over documents: each token gets the deterministic
    delimited payload ((doc_id + pos0) % 7) * 0.5 (pos0 = 0-based token
    position) — exactly representable in float32, so engine float64 sums
    and the SQL oracle's DOUBLE sums agree bit-for-bit."""
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    def delimit(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out = []
        for d, txt in zip(ids, texts):
            toks = (txt or "").split()
            out.append(" ".join(
                f"{tok}|{((int(d) + p) % 7) * 0.5}"
                for p, tok in enumerate(toks)))
        return pa.table({
            "url": pa.array([f"{i:08d}" for i in ids], pa.string()),
            "text": pa.array(out, pa.string()),
        })

    src = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        delimit, batch_format="pyarrow")
    out = _idx_dir(sf_dir, "whitespace_nb1_payload")
    build_index(src, out, analyzer="whitespace", num_buckets=1,
                text_source="text", store_positions=True,
                payload_delimiter="|")
    return IndexReader(out)


def _q_payload_score_sum(sf_dir: str):
    """{!payload_score f=text func=sum v=join}: per-doc sum of the 'join'
    occurrences' payloads (PayloadScoreQParserPlugin.java:36 semantics,
    includeSpanScore=false). All matching docs, doc_id order."""
    from solr_ray.search.payloads import payload_score

    reader = _payload_reader(sf_dir)
    ids, sc = payload_score(reader, "join", func="sum", k=10**9)
    order = sorted(range(len(ids)),
                   key=lambda i: int(reader.url_of(int(ids[i]))))
    return pa.table({
        "doc_id": pa.array([int(reader.url_of(int(ids[i])))
                            for i in order], pa.int64()),
        "score_sum": pa.array([float(sc[i]) for i in order], pa.float64()),
    })


def _q_payload_check_phrase(sf_dir: str):
    """{!payload_check f=text payloads='1.0 1.5' v='hash join'}: exact
    phrase whose occurrence payloads equal the given values
    (PayloadCheckQParserPlugin.java:40). (doc_id, tf) in doc order."""
    from solr_ray.search.payloads import payload_check

    reader = _payload_reader(sf_dir)
    ids, tf = payload_check(reader, ["hash", "join"], [1.0, 1.5], k=10**9)
    order = sorted(range(len(ids)),
                   key=lambda i: int(reader.url_of(int(ids[i]))))
    return pa.table({
        "doc_id": pa.array([int(reader.url_of(int(ids[i])))
                            for i in order], pa.int64()),
        "tf": pa.array([int(tf[i]) for i in order], pa.int64()),
    })


def _q_select_fq(sf_dir: str):
    """/select request: q='table scan' + fq lang='en', top-20 page with
    stored lang. Filtered ranking is exact (stats stay corpus-global)."""
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.select import select as solr_select

    out = _idx_dir(sf_dir, "whitespace_nb1_stored")
    build_index(_docs_as_pages_with_lang(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text", stored_cols=("lang",))
    reader = IndexReader(out)
    resp = solr_select(reader, "table scan",
                       fq=[{"op": "term", "field": "lang", "value": "en"}],
                       rows=20, fl=("lang",))
    docs = resp["docs"]
    import math

    return pa.table({
        "rank": pa.array(range(1, len(docs) + 1), pa.int64()),
        "doc_id": pa.array([int(d["url"]) for d in docs], pa.int64()),
        "score_r": pa.array([math.floor(d["score"] * 1e5) / 1e5
                             for d in docs], pa.float64()),
        "lang": pa.array([d["lang"] for d in docs], pa.string()),
    })


def _q_stream_expr(sf_dir: str):
    """Streaming-expression DSL (the /stream surface): parse + evaluate
    top(rollup(search(...))) against the documents table."""
    from solr_ray.expr import eval_expr

    tables = {"documents": _read(sf_dir, "documents")}
    out = eval_expr(
        'top(rollup(search(documents), over="lang", count(*), '
        'sum(n_chars)), n=10, sort="count(*) desc")', tables)
    return out.map_batches(
        lambda t: pa.table({
            "lang": t["lang"],
            "cnt": t["count(*)"],
            "sum_chars": t["sum(n_chars)"],
        }),
        batch_format="pyarrow",
    )


def _q_stream_expr_join(sf_dir: str):
    """Streaming-expression innerJoin + rollup: orders ⋈ customer by
    custkey, order counts per market segment."""
    from solr_ray.expr import eval_expr

    tables = {
        "orders": _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
            lambda t: pa.table({"c_custkey": t["o_custkey"]}),
            batch_format="pyarrow"),
        "customer": _read(sf_dir, "customer",
                          columns=["c_custkey", "c_mktsegment"]),
    }
    out = eval_expr(
        'rollup(innerJoin(search(orders), search(customer), '
        'on="c_custkey"), over="c_mktsegment", count(*))', tables)
    return out.map_batches(
        lambda t: pa.table({"c_mktsegment": t["c_mktsegment"],
                            "n_orders": t["count(*)"]}),
        batch_format="pyarrow")


def _q_stream_expr_eval(sf_dir: str):
    """Streaming-expression select() with registered scalar EVALUATORS
    (Lang.java surface): arithmetic + string functions computed inside the
    projection, then a bounded top."""
    from solr_ray.expr import eval_expr

    tables = {"li": _read(sf_dir, "lineitem",
                          columns=["l_orderkey", "l_linenumber",
                                   "l_quantity", "l_returnflag"])}
    out = eval_expr(
        'top(select(search(li), "l_orderkey", "l_linenumber", '
        '"mul(l_quantity, 2) as q2", "length(l_returnflag) as flag_len"), '
        'n=100, sort="l_orderkey asc, l_linenumber asc")', tables)
    return out


def _q_json_facet_range(sf_dir: str):
    """JSON facet: range buckets over event values with a per-bucket
    integer-quantized sum stat."""
    from solr_ray.ops.jsonfacet import json_facet

    ev = _read(sf_dir, "events", columns=["value"])

    def milli(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "v_milli", pa.array(np.floor(v * 1000.0).astype(np.int64)))

    resp = json_facet(ev.map_batches(milli, batch_format="pyarrow"), {
        "type": "range", "field": "value", "start": 0, "end": 500,
        "gap": 100, "limit": 10, "facet": {"sum_m": "sum(v_milli)"},
    })
    b = resp["buckets"]
    return pa.table({
        "bucket_start": pa.array([x["val"] for x in b], pa.float64()),
        "n": pa.array([x["count"] for x in b], pa.int64()),
        "sum_value_m": pa.array([x["sum_m"] / 1000.0 for x in b],
                                pa.float64()),
    })


def _q_json_facet(sf_dir: str):
    """JSON Facet API: terms facet with nested stats."""
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(_read(sf_dir, "documents"), {
        "type": "terms", "field": "lang", "limit": 10,
        "facet": {"avg_chars": "avg(n_chars)", "n_sources": "unique(source)"},
    })
    b = resp["buckets"]
    return pa.table({
        "lang": pa.array([x["val"] for x in b], pa.string()),
        "cnt": pa.array([x["count"] for x in b], pa.int64()),
        "avg_chars": pa.array([x["avg_chars"] for x in b], pa.float64()),
        "n_sources": pa.array([x["n_sources"] for x in b], pa.int64()),
    })


def _q_json_facet_highcard(sf_dir: str):
    """JSON Facet over a HIGH-CARDINALITY field (o_custkey — one bucket per
    customer): exercises the distributed terms path (combiner aggregate +
    distributed mincount/sort/limit; only the 10 winners reach the driver).
    MAX is float-exact, so the stat oracles bit-exactly."""
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]), {
            "type": "terms", "field": "o_custkey", "limit": 10,
            "facet": {"max_price": "max(o_totalprice)"},
        })
    b = resp["buckets"]
    return pa.table({
        "o_custkey": pa.array([x["val"] for x in b], pa.int64()),
        "cnt": pa.array([x["count"] for x in b], pa.int64()),
        "max_price": pa.array([x["max_price"] for x in b], pa.float64()),
    })


def _q_json_facet_percentile(sf_dir: str):
    """JSON Facet percentile stat (rows-only: t-digest approximation —
    PercentileAgg digest-merge semantics): p50/p95 of o_totalprice per
    o_orderpriority through the distributed terms combiner, one mergeable
    digest per bucket inside groupby().aggregate()."""
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(
        _read(sf_dir, "orders", columns=["o_orderpriority",
                                         "o_totalprice"]), {
            "type": "terms", "field": "o_orderpriority", "limit": 10,
            "sort": "index asc",
            "facet": {"p50": "percentile(o_totalprice, 50)",
                      "p95": "percentile(o_totalprice, 95)"},
        })
    b = resp["buckets"]
    return pa.table({
        "o_orderpriority": pa.array([x["val"] for x in b], pa.string()),
        "cnt": pa.array([x["count"] for x in b], pa.int64()),
        "p50": pa.array([x["p50"] for x in b], pa.float64()),
        "p95": pa.array([x["p95"] for x in b], pa.float64()),
    })


def _q_facet_on_query(sf_dir: str):
    """Facet over a query's FULL match set (FacetComponent on /select):
    lang counts of documents matching any of {table, scan}."""
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    out = _idx_dir(sf_dir, "whitespace_nb1_stored")
    build_index(_docs_as_pages_with_lang(sf_dir), out, analyzer="whitespace",
                num_buckets=1, text_source="text", stored_cols=("lang",))
    reader = IndexReader(out)
    facets = reader.facet_search("table scan", "lang", limit=10)
    return pa.table({
        "lang": pa.array([v for v, _ in facets], pa.string()),
        "cnt": pa.array([c for _, c in facets], pa.int64()),
    })


def _docs_as_pages_with_lang(sf_dir: str):
    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        urls = pa.array([f"{i:08d}" for i in ids], pa.string())
        return pa.table({"url": urls, "text": t["text"], "lang": t["lang"]})

    return _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"]).map_batches(
        to_pages, batch_format="pyarrow")


def _q_atomic_update_inc(sf_dir: str):
    """AtomicUpdateDocumentMerger 'inc'/'set' semantics: bump each
    customer's balance by their order count; flag big customers."""
    import duckdb

    from solr_ray.ops.updates import atomic_update

    updates = duckdb.sql(
        f"SELECT o_custkey AS c_custkey, COUNT(*)::DOUBLE AS c_acctbal, "
        "CASE WHEN COUNT(*) >= 15 THEN 'HEAVY' ELSE 'LIGHT' END AS "
        "c_mktsegment "
        f"FROM read_parquet('{_tbl(sf_dir, 'orders')}') GROUP BY o_custkey"
    ).df()
    out = atomic_update(
        _read(sf_dir, "customer"), updates, "c_custkey",
        {"c_acctbal": "inc", "c_mktsegment": "set"})
    return out.select_columns(["c_custkey", "c_acctbal", "c_mktsegment"])


def _q_filter_bool(sf_dir: str):
    """QParser surface as predicates: (type∈{click,view} ∧ value∈[10,50))
    ∨ (type=error ∧ ¬(value<80))."""
    from solr_ray.ops.queryfilter import filter_query

    spec = {"op": "or", "clauses": [
        {"op": "and", "clauses": [
            {"op": "terms", "field": "event_type",
             "values": ["click", "view"]},
            {"op": "range", "field": "value", "lo": 10.0, "hi": 50.0},
        ]},
        {"op": "and", "clauses": [
            {"op": "term", "field": "event_type", "value": "error"},
            {"op": "not", "clauses": [
                {"op": "range", "field": "value", "hi": 80.0}]},
        ]},
    ]}
    return filter_query(_read(sf_dir, "events"), spec)


def _geo_docs(sf_dir: str):
    """documents + deterministic synthetic coordinates: integer arithmetic
    on doc_id then one float division, so Ray and DuckDB produce the SAME
    float64 lat/lon bit for bit."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def coords(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = ((d * 7919) % 18000) / 100.0 - 90.0
        lon = ((d * 104729) % 36000) / 100.0 - 180.0
        return pa.table({"doc_id": t["doc_id"],
                         "lat": pa.array(lat, pa.float64()),
                         "lon": pa.array(lon, pa.float64())})

    return ds.map_batches(coords, batch_format="pyarrow")


_GEO_PT = (48.85, 2.35)  # Paris


def _q_geofilt(sf_dir: str):
    """{!geofilt}: docs within 5000 km great-circle of _GEO_PT, with the
    distance (quantized to 1e-3 km to bury libm-vs-DuckDB ulp noise)."""
    from solr_ray.ops.spatial import geofilt

    out = geofilt(_geo_docs(sf_dir), "lat", "lon", _GEO_PT, 5000.0)

    def finish(t: pa.Table) -> pa.Table:
        dist_r = pc.divide(
            pc.floor(pc.multiply(t["dist_km"], pa.scalar(1e3))),
            pa.scalar(1e3))
        return pa.table({"doc_id": t["doc_id"], "dist_r": dist_r})

    return out.map_batches(finish, batch_format="pyarrow")


def _q_bbox(sf_dir: str):
    """{!bbox}-style rectangle filter — exact comparisons, no trig."""
    from solr_ray.ops.spatial import bbox_filter

    return bbox_filter(_geo_docs(sf_dir), "lat", "lon",
                       -30.0, 45.0, -90.0, 60.0)


def _q_geodist_top20(sf_dir: str):
    """sort=geodist() asc: 20 nearest docs to _GEO_PT (tie: doc_id)."""
    from solr_ray.ops.spatial import geodist_topk

    out = geodist_topk(_geo_docs(sf_dir), "lat", "lon", _GEO_PT, 20,
                       tie_col="doc_id")

    def finish(t: pa.Table) -> pa.Table:
        dist_r = pc.divide(
            pc.floor(pc.multiply(t["dist_km"], pa.scalar(1e3))),
            pa.scalar(1e3))
        return pa.table({"doc_id": t["doc_id"], "dist_r": dist_r})

    return out.map_batches(finish, batch_format="pyarrow")


def _q_heatmap_facet(sf_dir: str):
    """FacetHeatmap analog: 12x16 grid-cell counts over a lat/lon bbox
    (pure combiner — per-batch 2-D bincount, tiny grouped merge)."""
    from solr_ray.ops.spatial import heatmap_facet

    return heatmap_facet(_geo_docs(sf_dir), "lat", "lon",
                         -60.0, 60.0, -120.0, 120.0,
                         grid_rows=12, grid_cols=16)


def _q_cursor_page2(sf_dir: str):
    """CursorMark keyset paging: page 2 (rows 51-100) of orders by
    (o_totalprice desc, o_orderkey asc)."""
    from solr_ray.ops.queryfilter import cursor_page

    ds = _read(sf_dir, "orders")
    page1 = cursor_page(ds, ["o_totalprice", "o_orderkey"], None, 50,
                        descending=[True, False]).to_pandas()
    after = (float(page1["o_totalprice"].iloc[-1]),
             int(page1["o_orderkey"].iloc[-1]))
    return cursor_page(ds, ["o_totalprice", "o_orderkey"], after, 50,
                       descending=[True, False])


def _q_highlight(sf_dir: str):
    """BM25 top-10 for one query with <em>-tagged snippets, SQL-oracled:
    with the whitespace analyzer, snippet selection (best 30-token window
    by distinct query-term hits, first-best wins) and <em> wrapping are
    pure string/window operations DuckDB reproduces exactly."""
    import pyarrow.parquet as pq

    import ray.data

    from solr_ray.search.highlight import highlight_results
    from solr_ray.search.searcher import search_dataset

    idx = _build_docs_index(sf_dir, "whitespace", 1)
    q = "table scan"
    qds = ray.data.from_arrow(
        pa.table({"qid": pa.array([0], pa.int64()),
                  "text": pa.array([q], pa.string())}))
    res = search_dataset(qds, idx, k=10)
    docs = pq.read_table(_tbl(sf_dir, "documents"),
                         columns=["doc_id", "text"]).to_pandas()
    # result doc_id is the internal id == zero-padded-url order == doc_id
    out = highlight_results(res, docs, q, analyzer="whitespace")

    def finish(t: pa.Table) -> pa.Table:
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))), pa.scalar(1e5))
        return pa.table({
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": t["doc_id"],
            "score_r": score_r,
            "snippet": t["snippet"],
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_mlt(sf_dir: str):
    """More-like-this for doc 0, SQL-oracled: interesting terms = doc 0's
    terms ranked by tf*idf (df >= 2, ties term asc, top 10), then a BM25
    search with those terms excluding doc 0."""
    import math

    import duckdb

    from solr_ray.search.highlight import more_like_this_text
    from solr_ray.search.searcher import IndexReader

    idx = _build_docs_index(sf_dir, "whitespace", 1)
    text = duckdb.sql(
        f"SELECT text FROM read_parquet('{_tbl(sf_dir, 'documents')}') "
        "WHERE doc_id = 0"
    ).fetchone()[0]
    reader = IndexReader(idx)
    ids, scores = more_like_this_text(reader, text, k=10, exclude_doc=0)
    return pa.table({
        "rank": pa.array(range(1, len(ids) + 1), pa.int64()),
        "doc_id": pa.array(ids, pa.int64()),
        "score_r": pa.array(
            [math.floor(s * 1e5) / 1e5 for s in scores.tolist()],
            pa.float64()),
    })


def _q_graph_terms(sf_dir: str):
    """{!graphTerms}: lineitem rows whose l_suppkey is in a candidate
    frontier, skipping suppliers that appear on more than 600 lineitems
    (the hub-node guard). Output (l_suppkey, cnt) per surviving key."""
    from solr_ray.ops.graph import graph_terms_filter

    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_orderkey"])
    frontier = list(range(1, 41))  # supplier keys 1..40
    out = graph_terms_filter(li, "l_suppkey", frontier, max_doc_freq=600)
    from ray.data.aggregate import Count

    return (out.groupby("l_suppkey")
            .aggregate(Count(alias_name="cnt")).sort("l_suppkey"))


def _q_gather_nodes(sf_dir: str):
    """Graph BFS (gatherNodes): customer c1 -> their orders -> the suppliers
    on those orders' lineitems, depth 2, namespaced string node ids."""
    from solr_ray.ops.graph import gather_nodes

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def o_edges(t: pa.Table) -> pa.Table:
        src = pa.array([f"c{v}" for v in t["o_custkey"].to_pylist()])
        dst = pa.array([f"o{v}" for v in t["o_orderkey"].to_pylist()])
        return pa.table({"src": src, "dst": dst})

    def l_edges(t: pa.Table) -> pa.Table:
        src = pa.array([f"o{v}" for v in t["l_orderkey"].to_pylist()])
        dst = pa.array([f"s{v}" for v in t["l_suppkey"].to_pylist()])
        return pa.table({"src": src, "dst": dst})

    edges = orders.map_batches(o_edges, batch_format="pyarrow").union(
        li.map_batches(l_edges, batch_format="pyarrow"))
    return gather_nodes(edges, "src", "dst", seeds=["c1"], depth=2)


def _q_spellcheck(sf_dir: str):
    """Rows-only: suggestions for misspelled query terms from the index's
    term dictionary (SpellCheckComponent semantics)."""
    import ray.data

    from solr_ray.search.spellcheck import SpellcheckActor

    idx = _build_docs_index(sf_dir, "whitespace", 1)
    qds = ray.data.from_items([
        {"qid": 0, "text": "tabel scann"},
        {"qid": 1, "text": "merg joinn"},
        {"qid": 2, "text": "sparkk"},
    ])
    return qds.map_batches(
        SpellcheckActor, fn_constructor_args=(idx, "whitespace"),
        batch_format="pyarrow", concurrency=1)


def _q_rerank(sf_dir: str):
    """Rerank BM25 top-50 with a linear doc-length prior (ReRankQParser +
    LTR LinearModel semantics): new_score = 5.0*(1/(1+n_chars)) + score for
    the top-10, deeper rows keep original order below. SQL-oracled."""
    from solr_ray.search.rerank import LinearModel, rerank_results

    res, feats = _rerank_base(sf_dir)
    out = rerank_results(res, feats, LinearModel({"short": 5.0}),
                         rerank_depth=10)
    return _rerank_finish(out)


def _rerank_base(sf_dir: str):
    """Shared first pass for the LTR rerank entries: BM25 top-50 with
    int doc_id and the per-doc n_chars lookup for features."""
    import duckdb

    res = _search_docs(sf_dir, "whitespace", 1, BM25_QUERIES, k=50)
    nchars = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{_tbl(sf_dir, 'documents')}')"
    ).df().set_index("doc_id")["n_chars"]

    def to_int_doc(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.cast(t["url"], pa.int64()))

    res = res.map_batches(to_int_doc, batch_format="pyarrow")

    def feats(g):
        import pandas as pd

        return pd.DataFrame({
            "short": 1.0 / (1.0 + nchars.loc[g["doc_id"]].to_numpy()),
            "score": g["score"].to_numpy(dtype="float64"),
        }, index=g.index)

    return res, feats


def _rerank_finish(out):
    def finish(t: pa.Table) -> pa.Table:
        score_r = pc.divide(
            pc.floor(pc.multiply(t["score"], pa.scalar(1e5))), pa.scalar(1e5))
        return pa.table({
            "qid": t["qid"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "doc_id": t["doc_id"],
            "score_r": score_r,
        })

    return out.map_batches(finish, batch_format="pyarrow")


_LTR_TREES = [
    {"weight": 2.0, "root": {
        "feature": "short", "threshold": 0.001,
        "left": {"feature": "score", "threshold": 5.0,
                 "left": {"value": 0.5}, "right": {"value": 1.5}},
        "right": {"value": 2.5}}},
    {"weight": 1.0, "root": {
        "feature": "score", "threshold": 8.0,
        "left": {"value": 0.25}, "right": {"value": 1.0}}},
]


def _q_rerank_trees(sf_dir: str):
    """LTR MultipleAdditiveTreesModel rerank of the BM25 top-10 (features:
    short=1/(1+n_chars), first-pass score); the two-tree ensemble is plain
    CASE WHEN arithmetic in the SQL oracle."""
    from solr_ray.search.rerank import (
        MultipleAdditiveTreesModel, rerank_results)

    res, feats = _rerank_base(sf_dir)
    out = rerank_results(res, feats, MultipleAdditiveTreesModel(_LTR_TREES),
                         rerank_depth=10)
    return _rerank_finish(out)


_LTR_NN = {
    "features": ["short", "score"],
    "layers": [
        {"matrix": [[100.0, 0.1], [-50.0, 0.2]], "bias": [-0.05, 1.0],
         "activation": "relu"},
        {"matrix": [[1.5, 0.75]], "bias": [0.1], "activation": "identity"},
    ],
}


def _q_rerank_nn(sf_dir: str):
    """LTR NeuralNetworkModel rerank of the BM25 top-10: one ReLU hidden
    layer over (short, score); tiny enough that the oracle writes the
    forward pass as plain SQL arithmetic with GREATEST for ReLU."""
    from solr_ray.search.rerank import NeuralNetworkModel, rerank_results

    res, feats = _rerank_base(sf_dir)
    model = NeuralNetworkModel(_LTR_NN["features"], _LTR_NN["layers"])
    out = rerank_results(res, feats, model, rerank_depth=10)
    return _rerank_finish(out)


# /sql handler entries: the accepted dialect is ANSI, so each query string
# is handed verbatim to BOTH execute_sql (engine) and DuckDB (oracle).
_SQL_QUERIES = {
    "sql_filter": ("SELECT doc_id, n_chars FROM documents "
                   "WHERE lang = 'en' AND n_chars BETWEEN 200 AND 900 "
                   "ORDER BY doc_id LIMIT 100"),
    "sql_group": ("SELECT lang, COUNT(*) AS n, MIN(n_chars) AS lo, "
                  "MAX(n_chars) AS hi, AVG(n_chars) AS mean "
                  "FROM documents GROUP BY lang ORDER BY lang"),
    "sql_having": ("SELECT source, COUNT(*) AS n FROM documents "
                   "GROUP BY source HAVING n >= 5 "
                   "ORDER BY n DESC, source"),
    "sql_sum_cast": ("SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total "
                     "FROM documents WHERE source <> 'forum' "
                     "GROUP BY lang ORDER BY total DESC, lang"),
    # arithmetic expressions in the SELECT list (row-wise float ops are
    # bit-exact IEEE — same op order as the oracle's parse)
    "sql_expr_proj": ("SELECT l_orderkey, l_linenumber, "
                      "l_extendedprice * (1 - l_discount) AS revenue "
                      "FROM lineitem WHERE l_orderkey <= 2000 "
                      "ORDER BY l_orderkey, l_linenumber"),
    # expression inside an aggregate (integer ops -> order-independent sum)
    "sql_expr_agg": ("SELECT l_returnflag, "
                     "SUM(l_orderkey * 2 + l_linenumber) AS s, "
                     "COUNT(*) AS n FROM lineitem "
                     "GROUP BY l_returnflag ORDER BY l_returnflag"),
    # expression OF aggregates + ANSI float division (one divide per group
    # over an integral-valued sum -> deterministic)
    "sql_expr_over_agg": ("SELECT l_returnflag, "
                          "CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, "
                          "SUM(l_quantity) / COUNT(*) AS avg_qty "
                          "FROM lineitem GROUP BY l_returnflag "
                          "ORDER BY l_returnflag"),
    # general %x% LIKE (arrow match_like)
    "sql_like": ("SELECT o_orderkey, o_orderpriority FROM orders "
                 "WHERE o_orderpriority LIKE '%URGENT%' "
                 "ORDER BY o_orderkey LIMIT 200"),
    # global aggregates + COUNT(DISTINCT col) (two-phase distinct shuffle)
    "sql_count_star": ("SELECT COUNT(*) AS n, COUNT(DISTINCT lang) AS dl "
                       "FROM documents"),
    "sql_distinct_group": ("SELECT lang, COUNT(DISTINCT source) AS dsrc, "
                           "COUNT(*) AS n FROM documents "
                           "GROUP BY lang ORDER BY lang"),
    # JOIN: hash-partitioned Dataset.join per clause, qualified-name
    # resolution, right key preserved (null on unmatched left_outer)
    "sql_join": ("SELECT c.c_name, n.n_name FROM customer c "
                 "JOIN nation n ON c.c_nationkey = n.n_nationkey "
                 "WHERE n.n_name LIKE 'NATION_1%' "
                 "ORDER BY c_name LIMIT 100"),
    "sql_join_group": ("SELECT n.n_name, COUNT(*) AS cnt, "
                       "CAST(SUM(c.c_nationkey) AS BIGINT) AS s "
                       "FROM customer c "
                       "JOIN nation n ON c.c_nationkey = n.n_nationkey "
                       "GROUP BY n.n_name ORDER BY n_name"),
    "sql_left_join": ("SELECT n.n_name, COUNT(o.o_orderkey) AS cnt "
                      "FROM nation n "
                      "LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey "
                      "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
                      "GROUP BY n.n_name ORDER BY n_name"),
    # HAVING over aggregates not in the SELECT list (hidden agg outputs)
    "sql_having_agg": ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                       "GROUP BY o_orderpriority "
                       "HAVING MAX(o_totalprice) > 300000 "
                       "ORDER BY o_orderpriority"),
    # GROUP BY expressions (hidden precomputed key column)
    "sql_group_expr": ("SELECT FLOOR(o_totalprice / 50000) AS bucket, "
                       "COUNT(*) AS n, MAX(o_totalprice) AS mx "
                       "FROM orders GROUP BY FLOOR(o_totalprice / 50000) "
                       "ORDER BY bucket"),
    # CASE WHEN (incl. the pivot-style SUM(CASE WHEN ...) pattern)
    "sql_case_when": ("SELECT o_orderpriority, "
                      "CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 "
                      "ELSE 0 END) AS BIGINT) AS big, "
                      "COUNT(*) AS n FROM orders "
                      "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    # derived tables: the inner plan runs as its own distributed pipeline
    "sql_derived_table": ("SELECT s.lang, s.total FROM "
                          "(SELECT lang, CAST(SUM(n_chars) AS BIGINT) "
                          "AS total FROM documents GROUP BY lang) s "
                          "WHERE s.total > 10000 ORDER BY lang"),
    # scalar-expression predicates in WHERE (cmp_expr filter kernel)
    "sql_where_expr": ("SELECT o_orderkey, o_totalprice FROM orders "
                       "WHERE FLOOR(o_totalprice / 1000) = 150 "
                       "AND LENGTH(o_orderpriority) > 8 "
                       "ORDER BY o_orderkey LIMIT 100"),
    # window functions: 64-bucket partition shuffle + vectorized rank pass
    "sql_window_rank": ("SELECT o_orderkey, o_custkey, "
                        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
                        "ORDER BY o_totalprice DESC, o_orderkey) AS rn, "
                        "RANK() OVER (PARTITION BY o_custkey "
                        "ORDER BY o_orderpriority) AS pr "
                        "FROM orders ORDER BY o_orderkey LIMIT 500"),
    # frame aggregates: ROWS BETWEEN windows (integer sums -> rolling
    # float64 values are exact, so DuckDB's window engine replays them)
    "sql_window_frame": ("SELECT o_orderkey, "
                         "SUM(o_custkey) OVER (PARTITION BY o_orderpriority "
                         "ORDER BY o_orderkey "
                         "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS rs, "
                         "COUNT(o_custkey) OVER "
                         "(PARTITION BY o_orderpriority ORDER BY o_orderkey "
                         "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rc "
                         "FROM orders ORDER BY o_orderkey LIMIT 400"),
    # RIGHT/FULL OUTER joins (Ray right_outer/full_outer; both real key
    # columns survive with ANSI nulls via the two-sided key-copy trick)
    "sql_right_join": ("SELECT c.c_name, COUNT(o.o_orderkey) AS cnt "
                       "FROM orders o "
                       "RIGHT JOIN customer c ON o.o_custkey = c.c_custkey "
                       "GROUP BY c.c_name ORDER BY cnt DESC, c_name "
                       "LIMIT 100"),
    "sql_full_join": ("SELECT COUNT(*) AS n_rows, "
                      "COUNT(o.o_orderkey) AS n_ord, "
                      "COUNT(c.c_custkey) AS n_cust "
                      "FROM customer c "
                      "FULL OUTER JOIN orders o "
                      "ON c.c_custkey = o.o_custkey"),
    # IN (SELECT ...) semi-join: subquery runs distributed, distinct keys
    # broadcast into the filter (ops/joins.py:58 shape)
    "sql_in_subquery": ("SELECT o_orderkey, o_totalprice FROM orders "
                        "WHERE o_custkey IN "
                        "(SELECT c_custkey FROM customer "
                        "WHERE c_acctbal > 9000) "
                        "ORDER BY o_orderkey LIMIT 200"),
    # ANSI default window frame (cumulative incl. peers — duplicate
    # o_orderdate values per customer exercise the peer semantics) +
    # whole-partition aggregate
    "sql_window_default": ("SELECT o_orderkey, "
                           "SUM(o_custkey) OVER (PARTITION BY "
                           "o_orderpriority ORDER BY o_orderdate) "
                           "AS running, "
                           "COUNT(o_orderkey) OVER (PARTITION BY "
                           "o_orderpriority) AS n_orders FROM orders "
                           "ORDER BY o_orderkey LIMIT 500"),
    # implicit comma joins (TPC-H Q3 shape): FROM a, b, c with WHERE
    # equalities rewritten to hash-partitioned INNER joins (greedy
    # connectivity order); revenue integer-quantized to cents so the
    # float SUM replays bit-exactly across engines
    "sql_tpch_q3ish": (
        "SELECT l.l_orderkey, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c, "
        "o.o_orderdate FROM customer c, orders o, lineitem l "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey "
        "AND o.o_orderdate < '1998-07-01' "
        "AND l.l_shipdate > '1998-07-01' "
        "GROUP BY l.l_orderkey, o.o_orderdate "
        "ORDER BY revenue_c DESC, l_orderkey LIMIT 10"),
    # TPC-H Q9 shape: YEAR() extraction in SELECT + GROUP BY, LIKE on
    # part names, 5-table implicit join
    "sql_tpch_q9ish": (
        "SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS profit_c "
        "FROM part p, supplier s, lineitem l, orders o, nation n "
        "WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey "
        "AND o.o_orderkey = l.l_orderkey "
        "AND s.s_nationkey = n.n_nationkey AND p.p_name LIKE '%a%' "
        "GROUP BY n.n_name, YEAR(o.o_orderdate) "
        "ORDER BY nation, o_year DESC LIMIT 60"),
    # TPC-H Q15 shape: derived revenue view joined to supplier + scalar
    # MAX over the same view (top-revenue supplier, cent-exact equality)
    "sql_tpch_q15ish": (
        "SELECT s.s_suppkey, s.s_name, r.total_rev FROM supplier s "
        "JOIN (SELECT l_suppkey, CAST(SUM(CAST(FLOOR(l_extendedprice "
        "* (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS total_rev FROM lineitem WHERE l_shipdate >= '1997-01-01' "
        "AND l_shipdate < '1997-04-01' GROUP BY l_suppkey) r "
        "ON s.s_suppkey = r.l_suppkey "
        "WHERE r.total_rev = (SELECT MAX(total_rev2) AS m FROM "
        "(SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev2 "
        "FROM lineitem WHERE l_shipdate >= '1997-01-01' "
        "AND l_shipdate < '1997-04-01' GROUP BY l_suppkey) rr) "
        "ORDER BY s_suppkey"),
    # TPC-H Q7 shape: nation joined TWICE under two aliases (supplier
    # nation x customer nation) across a 6-table implicit join
    "sql_tpch_q7ish": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c "
        "FROM supplier s, lineitem l, orders o, customer c, "
        "nation n1, nation n2 "
        "WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey "
        "AND c.c_custkey = o.o_custkey "
        "AND s.s_nationkey = n1.n_nationkey "
        "AND c.c_nationkey = n2.n_nationkey "
        "AND n1.n_name = 'NATION_3' AND l.l_shipdate >= '1997-01-01' "
        "AND l.l_shipdate < '1997-04-01' "
        "GROUP BY n1.n_name, n2.n_name ORDER BY supp_nation, cust_nation"),
    # TPC-H Q11 shape: HAVING <aggregate> > (SELECT scalar subquery)
    "sql_tpch_q11ish": (
        "SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) "
        "AS BIGINT) AS value_q FROM lineitem GROUP BY l_suppkey "
        "HAVING SUM(l_quantity) > "
        "(SELECT SUM(l_quantity) * 0.0101 AS thr FROM lineitem) "
        "ORDER BY value_q DESC, l_suppkey"),
    # TPC-H Q16 shape: NOT IN subquery + COUNT(DISTINCT) over a join
    "sql_tpch_q16ish": (
        "SELECT p.p_brand, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM part p, lineitem l WHERE p.p_partkey = l.l_partkey "
        "AND p.p_size IN (1, 5, 15, 25, 35, 45) "
        "AND l.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p.p_brand ORDER BY supplier_cnt DESC, p_brand"),
    # TPC-H Q13 shape: LEFT-JOIN count inside a derived table, outer
    # distribution GROUP BY over the inner count
    "sql_tpch_q13ish": (
        "SELECT s.c_count, COUNT(*) AS custdist FROM "
        "(SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey) s "
        "GROUP BY s.c_count ORDER BY custdist DESC, c_count DESC"),
    # TPC-H Q19 shape: join + OR-of-ANDs predicate block (the join
    # equality is the one top-level AND conjunct the rewrite consumes)
    "sql_tpch_q19ish": (
        "SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * "
        "(1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_c FROM lineitem l, part p "
        "WHERE p.p_partkey = l.l_partkey AND "
        "((p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11) "
        "OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20) "
        "OR (p.p_size > 40 AND l.l_quantity BETWEEN 20 AND 30))"),
    # TPC-H Q22 shape: scalar subquery threshold + correlated NOT EXISTS
    # in one WHERE, grouped output
    "sql_tpch_q22ish": (
        "SELECT c.c_nationkey, COUNT(*) AS numcust, "
        "CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS totacctbal_c FROM customer c "
        "WHERE c.c_acctbal > (SELECT AVG(c_acctbal) AS a FROM customer "
        "WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 AS one FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000) "
        "GROUP BY c.c_nationkey ORDER BY c_nationkey"),
    # TPC-H Q18 shape: IN (SELECT ... GROUP BY ... HAVING SUM > N)
    # large-order subquery feeding a 3-table implicit join + group/top-k
    "sql_tpch_q18ish": (
        "SELECT c.c_name, c.c_custkey, o.o_orderkey, "
        "CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty "
        "FROM customer c, orders o, lineitem l "
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 210) "
        "AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey "
        "GROUP BY c.c_name, c.c_custkey, o.o_orderkey "
        "ORDER BY total_qty DESC, o_orderkey LIMIT 50"),
    # TPC-H Q12 shape: join + dual SUM(CASE WHEN ...) priority counts
    "sql_tpch_q12ish": (
        "SELECT l.l_linestatus, "
        "CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o.o_orderpriority <> '1-URGENT' THEN 1 "
        "ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders o, lineitem l WHERE o.o_orderkey = l.l_orderkey "
        "AND l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1997-03-01' "
        "GROUP BY l.l_linestatus ORDER BY l_linestatus"),
    # TPC-H Q6 shape: pure filter + global cent-quantized revenue sum
    "sql_tpch_q6ish": (
        "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_c FROM lineitem "
        "WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01' "
        "AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24"),
    # TPC-H Q14 shape: conditional-revenue ratio via SUM(CASE WHEN ...)
    "sql_tpch_q14ish": (
        "SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN "
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) "
        "AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_c, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS total_c FROM lineitem "
        "WHERE l_shipdate >= '1997-03-01' AND l_shipdate < '1997-04-01'"),
    # TPC-H Q1 shape (pure SQL; the ops-level pricing_summary entry is
    # the same pipeline via combiner_groupby): cent-quantized sums
    "sql_tpch_q1ish": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS sum_base_c, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 "
        "+ 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c, "
        "COUNT(*) AS count_order FROM lineitem "
        "WHERE l_shipdate <= '2001-06-01' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"),
    # TPC-H Q4 shape: date-windowed orders + correlated EXISTS against
    # lineitem (single-equality correlation -> broadcast semi-join)
    "sql_tpch_q4ish": (
        "SELECT o.o_orderpriority, COUNT(*) AS order_count FROM orders o "
        "WHERE o.o_orderdate >= '1996-01-01' "
        "AND o.o_orderdate < '1997-01-01' "
        "AND EXISTS (SELECT 1 AS one FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > '1997-06-01') "
        "GROUP BY o.o_orderpriority ORDER BY o_orderpriority"),
    # TPC-H Q10 shape: 4-table implicit join, returnflag filter, top 20
    "sql_tpch_q10ish": (
        "SELECT c.c_custkey, c.c_name, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c, "
        "n.n_name FROM customer c, orders o, lineitem l, nation n "
        "WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey "
        "AND c.c_nationkey = n.n_nationkey AND l.l_returnflag = 'R' "
        "AND o.o_orderdate >= '1996-01-01' "
        "AND o.o_orderdate < '1996-07-01' "
        "GROUP BY c.c_custkey, c.c_name, n.n_name "
        "ORDER BY revenue_c DESC, c_custkey LIMIT 20"),
    # TPC-H Q5 shape: 6-table implicit join (5 chained hash joins in
    # greedy connectivity order), the c_nationkey = s_nationkey
    # equality between two already-joined tables runs as a residual
    # vectorized col_eq filter, date-range predicates on o_orderdate
    "sql_tpch_q5ish": (
        "SELECT n.n_name, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) "
        "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c "
        "FROM customer c, orders o, lineitem l, supplier s, "
        "nation n, region r "
        "WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey "
        "AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
        "AND s.s_nationkey = n.n_nationkey "
        "AND n.n_regionkey = r.r_regionkey "
        "AND r.r_name = 'ASIA' AND o.o_orderdate >= '1996-01-01' "
        "AND o.o_orderdate < '1998-01-01' "
        "GROUP BY n.n_name ORDER BY revenue_c DESC, n_name"),
    # LIMIT ... OFFSET: the offset+limit head is small by construction,
    # sliced on the driver after the distributed sort
    "sql_limit_offset": ("SELECT o_orderkey, o_totalprice FROM orders "
                         "ORDER BY o_orderkey LIMIT 150 OFFSET 3000"),
    # set operations: UNION ALL = Dataset.union; UNION adds a distinct
    # combiner groupby; INTERSECT/EXCEPT = ONE combiner groupby over a
    # side-tagged union (min/max side per distinct row) — no join, no
    # broadcast. INTERSECT binds tighter (ANSI).
    "sql_union": ("SELECT o_custkey AS k FROM orders "
                  "WHERE o_totalprice > 300000 "
                  "UNION SELECT c_custkey AS k FROM customer "
                  "WHERE c_acctbal > 9000 ORDER BY k"),
    "sql_intersect_except": ("SELECT o_custkey AS k FROM orders "
                             "WHERE o_totalprice > 150000 "
                             "INTERSECT SELECT c_custkey AS k "
                             "FROM customer WHERE c_acctbal > 3000 "
                             "EXCEPT SELECT o_custkey AS k FROM orders "
                             "WHERE o_totalprice > 400000 ORDER BY k"),
    # navigation window functions (LAG/LEAD/NTILE/FIRST_VALUE): bucketed
    # per-partition pass at this scale; >2M rows routes through the
    # sliced ROW_NUMBER + rn+-k hash-join plan (hypothesis-tested
    # bit-identical). Unique ORDER BY key keeps every value replayable.
    "sql_window_nav": ("SELECT o_orderkey, "
                       "LAG(o_totalprice) OVER (PARTITION BY o_custkey "
                       "ORDER BY o_orderkey) AS prev_price, "
                       "LEAD(o_totalprice, 2, 0) OVER (PARTITION BY "
                       "o_custkey ORDER BY o_orderkey) AS next2_price, "
                       "NTILE(4) OVER (PARTITION BY o_custkey "
                       "ORDER BY o_orderkey) AS quartile, "
                       "FIRST_VALUE(o_totalprice) OVER (PARTITION BY "
                       "o_custkey ORDER BY o_orderkey) AS first_price "
                       "FROM orders ORDER BY o_orderkey LIMIT 500"),
    # value-based RANGE frame (peers included on both ends; prefix-sum
    # execution)
    "sql_range_frame": ("SELECT o_orderkey, "
                        "SUM(o_custkey) OVER (PARTITION BY "
                        "o_orderpriority ORDER BY o_custkey "
                        "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) "
                        "AS rsum FROM orders "
                        "ORDER BY o_orderkey LIMIT 400"),
    # correlated EXISTS: the single-equality correlation rewrites to the
    # IN-subquery broadcast semi-join plan (distributed distinct keys)
    "sql_exists": ("SELECT c_custkey, c_name FROM customer c "
                   "WHERE EXISTS (SELECT 1 AS one FROM orders o "
                   "WHERE o.o_custkey = c.c_custkey "
                   "AND o.o_totalprice > 300000) "
                   "ORDER BY c_custkey"),
    # correlated NOT EXISTS (anti-join form of the same rewrite)
    "sql_not_exists": ("SELECT c_custkey FROM customer c "
                       "WHERE NOT EXISTS (SELECT 1 AS one FROM orders o "
                       "WHERE o.o_custkey = c.c_custkey "
                       "AND o.o_totalprice > 100000) "
                       "ORDER BY c_custkey"),
    # scalar subquery folded to a literal before execution
    "sql_scalar_subquery": ("SELECT c_custkey, c_acctbal FROM customer "
                            "WHERE c_acctbal > "
                            "(SELECT AVG(c_acctbal) AS a FROM customer) "
                            "ORDER BY c_custkey"),
    # CORRELATED scalar subquery (TPC-H Q17 shape): per-key aggregate
    # broadcast + cmp_lookup filter
    "sql_corr_scalar_subquery": (
        "SELECT o_orderkey FROM orders o1 WHERE o1.o_totalprice >= "
        "(SELECT MAX(o_totalprice) AS m FROM orders o2 "
        "WHERE o2.o_custkey = o1.o_custkey) ORDER BY o_orderkey"),
    # SELECT DISTINCT list (grouped-count shuffle over distinct rows)
    "sql_distinct": ("SELECT DISTINCT lang, source FROM documents "
                     "ORDER BY lang, source"),
    # scalar functions in the SELECT list (arrow utf8/math kernels)
    "sql_scalar_fns": ("SELECT o_orderkey, UPPER(o_orderpriority) AS pri, "
                       "LENGTH(o_orderpriority) AS ln, "
                       "SUBSTR(o_orderpriority, 1, 3) AS pre, "
                       "ABS(o_totalprice - 100000.0) AS dist "
                       "FROM orders ORDER BY o_orderkey LIMIT 150"),
}


def _make_sql_query(sql: str):
    def run(sf_dir: str):
        from solr_ray.sql import execute_sql

        tables = {t: _read(sf_dir, t)
                  for t in ("documents", "lineitem", "orders", "customer",
                            "nation", "supplier", "region", "part")}
        return execute_sql(sql, tables)

    return run


def _q_random_sample(sf_dir: str):
    """Rows-only: seeded sampling (RandomStream / RandomSortField class)."""
    return _read(sf_dir, "events").random_sample(0.1, seed=7)


def _q_significant_terms(sf_dir: str):
    from solr_ray.ops.grouping import significant_terms

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    fg = docs.filter(expr="lang == 'en'")
    return significant_terms(fg, docs, "text", analyzer="whitespace",
                             min_doc_freq=2, limit=20)


# ---- rows-only entries (non-SQL-expressible; pytest carries the oracle) ----

def _q_minhash_pairs(sf_dir: str):
    from solr_ray.ops.dedup import jaccard_verify_pairs, minhash_lsh_candidates

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_lsh_candidates(docs, id_col="doc_id", text_col="text")
    return jaccard_verify_pairs(cand, docs, id_col="doc_id",
                                text_col="text", threshold=0.8)


def _q_minhash_pairs_join(sf_dir: str):
    """The 100-TB verify path (rows-only like minhash_pairs): candidate
    pairs verified by true shingle Jaccard via TWO distributed hash joins
    (pairs ⋈ corpus on id_a, then id_b) — nothing lands on the driver, no
    broadcast object scales with the candidate count. Same output contract
    as the broadcast path (asserted equal in pytest)."""
    from solr_ray.ops.dedup import (jaccard_verify_pairs_join,
                                    minhash_lsh_candidates)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_lsh_candidates(docs, id_col="doc_id", text_col="text")
    return jaccard_verify_pairs_join(cand, docs, id_col="doc_id",
                                     text_col="text", threshold=0.8)


def _q_dup_clusters_dist(sf_dir: str):
    """Distributed connected components (min-label propagation; driver
    state = one convergence checksum per round) over a deterministic
    customer—nation star graph, so the clustering is SQL-oracled via a
    recursive reachability CTE. cluster = min member id (string order)."""
    from solr_ray.ops.dedup import connected_components_distributed

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def edges(t: pa.Table) -> pa.Table:
        a = pa.array([f"c{v}" for v in t["c_custkey"].to_pylist()])
        b = pa.array([f"n{v}" for v in t["c_nationkey"].to_pylist()])
        return pa.table({"id_a": a, "id_b": b})

    pairs = cust.map_batches(edges, batch_format="pyarrow")
    out = connected_components_distributed(pairs)
    return out.sort("id")


def _q_gather_nodes_dist(sf_dir: str):
    """gather_nodes over the SAME graph/seed as the broadcast entry, via
    the Dataset-frontier BFS (per-level hash joins; the frontier never
    lands on the driver) — the hub-heavy-web-graph variant, sharing the
    recursive-CTE oracle."""
    from solr_ray.ops.graph import gather_nodes_distributed

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def o_edges(t: pa.Table) -> pa.Table:
        src = pa.array([f"c{v}" for v in t["o_custkey"].to_pylist()])
        dst = pa.array([f"o{v}" for v in t["o_orderkey"].to_pylist()])
        return pa.table({"src": src, "dst": dst})

    def l_edges(t: pa.Table) -> pa.Table:
        src = pa.array([f"o{v}" for v in t["l_orderkey"].to_pylist()])
        dst = pa.array([f"s{v}" for v in t["l_suppkey"].to_pylist()])
        return pa.table({"src": src, "dst": dst})

    edges = orders.map_batches(o_edges, batch_format="pyarrow").union(
        li.map_batches(l_edges, batch_format="pyarrow"))
    return gather_nodes_distributed(edges, "src", "dst", seeds=["c1"],
                                    depth=2)


def _q_percentile_price_by_flag(sf_dir: str):
    """Bucketed percentile facet (rows-only: t-digest approximation — the
    reference's PercentileAgg digest-merge semantics): p50/p95 of
    l_extendedprice per l_returnflag via a mergeable digest INSIDE
    groupby().aggregate() — one few-KB sketch per group, never the
    values."""
    from solr_ray.functions.tdigest import percentile_agg

    li = _read(sf_dir, "lineitem", columns=["l_returnflag",
                                            "l_extendedprice"])
    return (li.groupby("l_returnflag")
            .aggregate(percentile_agg("l_extendedprice", 0.5,
                                      alias_name="p50"),
                       percentile_agg("l_extendedprice", 0.95,
                                      alias_name="p95"))
            .sort("l_returnflag"))


def _q_shortest_path_dist(sf_dir: str):
    """Distributed BFS shortest path (Dataset-resident levels, min-parent
    determinism) over a chain+skip graph derived from customer keys
    (k -> k+1, k -> k+10): src=1, dst=42 forces a 5-hop path whose exact
    nodes replay in DuckDB as a recursive-CTE dist + min-parent
    backtrack. Every hop is a real shuffle join; the driver never holds
    a frontier."""
    from solr_ray.ops.graph import shortest_path_distributed

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = pc.cast(t["c_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"src": np.concatenate([k, k]),
                         "dst": np.concatenate([k + 1, k + 10])})

    eds = cust.map_batches(edges, batch_format="pyarrow")
    path = shortest_path_distributed(eds, "src", "dst", 1, 42, max_depth=6)
    assert path is not None
    return pa.table({"step": pa.array(range(len(path)), pa.int64()),
                     "node": pa.array(path, pa.int64())})


_LANG_ENUM = ["zh", "de", "es", "fr", "en"]  # configured ordinal order
_CUR_RATES = {("EUR", "USD"): 1.25, ("GBP", "USD"): 2.0}  # binary-exact


def _q_enum_lang_ord(sf_dir: str):
    """EnumFieldType analog (EnumFieldType.java/EnumMapping): lang
    ordinals from a configured order (deliberately non-alphabetical so
    the sort proves ordinal, not lexical, ordering)."""
    from solr_ray.functions.fieldtypes import EnumField

    enum = EnumField(_LANG_ENUM)
    docs = _read(sf_dir, "documents", columns=["lang"])
    out = (docs.map_batches(
        lambda t: enum.encode_batch(t, "lang", "lang_ord"),
        batch_format="pyarrow")
        .groupby("lang_ord").count())

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang_ord": pc.cast(t["lang_ord"], pa.int64()),
            "lang": enum.decode(t["lang_ord"]),
            "n": pc.cast(t["count()"], pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow").sort("lang_ord")


def _q_currency_orders_usd(sf_dir: str):
    """CurrencyFieldType analog (CurrencyFieldType.java +
    FileExchangeRateProvider): 'amount,CODE' strings round-trip through
    long-cents storage and convert to USD through the rate table; the
    range filter runs in the QUERY currency. Binary-exact rates (1.25,
    2.0) make cents*rate/100 replay bit-exactly in the oracle."""
    from solr_ray.functions.fieldtypes import CurrencyField

    cur = CurrencyField(_CUR_RATES, default_currency="USD")
    orders = _read(sf_dir, "orders", columns=["o_orderkey",
                                              "o_totalprice"])

    def mk(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_orderkey"], pa.int64())
        # k % 3 (Arrow has no modulo kernel; integer divide truncates)
        code = pc.take(pa.array(["USD", "EUR", "GBP"]),
                       pc.cast(pc.subtract(k, pc.multiply(pc.divide(
                           k, pa.scalar(3)), pa.scalar(3))), pa.int32()))
        raw = pc.binary_join_element_wise(
            pc.cast(t["o_totalprice"], pa.string()), code, ",")
        return pa.table({"o_orderkey": k, "raw": raw})

    priced = orders.map_batches(mk, batch_format="pyarrow")

    def conv(t: pa.Table) -> pa.Table:
        cents, code = cur.parse(t["raw"])
        usd = cur.convert(cents, code, "USD")
        return pa.table({"o_orderkey": t["o_orderkey"], "usd": usd})

    out = priced.map_batches(conv, batch_format="pyarrow")
    return (out.map_batches(
        lambda t: t.filter(pc.greater(t["usd"], pa.scalar(400000.0))),
        batch_format="pyarrow").sort("o_orderkey"))


def _q_simhash_candidates(sf_dir: str):
    from solr_ray.ops.dedup import simhash_candidates

    return simhash_candidates(_read(sf_dir, "documents",
                                    columns=["doc_id", "text"]),
                              id_col="doc_id", text_col="text")


def _q_text_profile_sigs(sf_dir: str):
    """Rows-only: Nutch-style quantized term-profile near-dup signatures."""
    from solr_ray.ops.dedup import add_text_profile_sig

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: add_text_profile_sig(t, "text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "sig"])


def _q_pairwise_cosine(sf_dir: str):
    """Rows-only: embedding-cosine near-dup top-k pairs over the corpus
    (float32 scale path)."""
    from solr_ray.ops.similarity import pairwise_cosine_topk

    return pairwise_cosine_topk(_read(sf_dir, "embeddings"), k=3,
                                threshold=0.25)


def _q_near_dup_pairs(sf_dir: str):
    """Exact near-dup pairs in float64 — value-comparable to the SQL
    cross-join cosine (engine and DuckDB agree to ~1e-15, quantized 1e-5).
    (id_a, id_b, cosine_r) with per-id_a top-3 partners."""
    from solr_ray.ops.similarity import pairwise_cosine_topk

    out = pairwise_cosine_topk(_read(sf_dir, "embeddings"), k=3,
                               threshold=0.25, dtype=np.float64)

    def shape(t: pa.Table) -> pa.Table:
        import math as _m

        cs = t["cosine"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pc.cast(t["id_a"], pa.int64()),
            "id_b": pc.cast(t["id_b"], pa.int64()),
            "cosine_r": pa.array([_m.floor(v * 1e5) / 1e5 for v in cs],
                                 pa.float64()),
        })

    return (out.map_batches(shape, batch_format="pyarrow")
            .sort(["id_a", "id_b"]))


def _q_langid(sf_dir: str):
    """Language ID (stopword-profile detector) with a full SQL oracle: the
    per-language hit ratios and the sorted-scan argmax tie-break replicate
    as IN-list ratios + an ordered CASE chain."""
    from solr_ray.ops.textstats import LangIdStage

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        LangIdStage, fn_constructor_kwargs={"text_col": "text"},
        batch_format="pyarrow", concurrency=2)

    def finish(t: pa.Table) -> pa.Table:
        conf_r = pc.divide(
            pc.floor(pc.multiply(t["lang_pred_conf"], pa.scalar(1e6))),
            pa.scalar(1e6))
        return pa.table({"doc_id": t["doc_id"], "lang_pred": t["lang_pred"],
                         "conf_r": conf_r})

    return out.map_batches(finish, batch_format="pyarrow")


def _q_quality(sf_dir: str):
    """Quality features with a full SQL oracle: every feature is plain
    deterministic arithmetic (counts, ratios, LEAST/GREATEST clips), so
    DuckDB reproduces it bit-for-bit; ratios quantized to 1e-6."""
    from solr_ray.ops.textstats import quality_features

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: quality_features(t, "text"), batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        def q6(col):
            return pc.divide(pc.floor(pc.multiply(t[col], pa.scalar(1e6))),
                             pa.scalar(1e6))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "stop_ratio_r": q6("stop_ratio"),
            "digit_ratio_r": q6("digit_ratio"),
            "score_r": q6("quality_score"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_fingerprints(sf_dir: str):
    from solr_ray.ops.textstats import add_fingerprint

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: add_fingerprint(t, "text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


def _q_fingerprints_md5(sf_dir: str):
    """Winnowing fingerprint with an md5-lower-64 gram hash — identical
    window/min semantics to `fingerprints`, but the hash is replayable in
    SQL (DuckDB md5_number_lower), giving the fingerprint op a value
    oracle. The siphash entry remains the vectorized scale path."""
    from solr_ray.ops.textstats import rolling_fingerprint_md5

    def fp(t: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint_md5(x)
                for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(vals, pa.int64())})

    return (_read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(fp, batch_format="pyarrow").sort("doc_id"))


def _q_knn_lsh(sf_dir: str):
    import pyarrow.parquet as pq

    from solr_ray.ops.similarity import knn_lsh

    emb = pq.read_table(_tbl(sf_dir, "embeddings"))
    qrows = emb.filter(pc.less(emb["vec_id"], pa.scalar(5))).sort_by("vec_id")
    qvecs = np.stack([np.asarray(v, dtype=np.float32)
                      for v in qrows["embedding"].to_pylist()])
    return knn_lsh(_read(sf_dir, "embeddings"), qvecs, k=5,
                   id_col="vec_id", vec_col="embedding")


def _q_knn_hnsw(sf_dir: str):
    """Rows-only (ANN is approximate): per-segment HNSW graphs built once
    under /tmp, queried with the first 5 embedding rows; pytest asserts
    >=0.9 recall vs brute force on synthetic vectors."""
    import pyarrow.parquet as pq

    from solr_ray.ops.hnsw import build_hnsw_index, knn_hnsw_index

    idx = _idx_dir(sf_dir, "hnsw")
    if not os.path.exists(os.path.join(idx, "_hnsw.json")):
        build_hnsw_index(_read(sf_dir, "embeddings"), idx,
                         id_col="vec_id", vec_col="embedding",
                         num_segments=4)
    emb = pq.read_table(_tbl(sf_dir, "embeddings"))
    qrows = emb.filter(pc.less(emb["vec_id"], pa.scalar(5))).sort_by("vec_id")
    qvecs = np.stack([np.asarray(v, dtype=np.float32)
                      for v in qrows["embedding"].to_pylist()])
    return knn_hnsw_index(idx, qvecs, k=5, ef=64)


def _q_knn_ivf(sf_dir: str):
    """Rows-only (ANN is approximate): IVF index — spherical k-means
    coarse quantizer, vectors partitioned by nearest centroid, queries
    probe only the closest lists; pytest asserts recall + I/O pruning."""
    import pyarrow.parquet as pq

    from solr_ray.ops.ivf import build_ivf_index, knn_ivf_index

    idx = _idx_dir(sf_dir, "ivf")
    if not os.path.exists(os.path.join(idx, "_ivf.json")):
        build_ivf_index(_read(sf_dir, "embeddings"), idx,
                        id_col="vec_id", vec_col="embedding", n_lists=8,
                        train_sample=5000)
    emb = pq.read_table(_tbl(sf_dir, "embeddings"))
    qrows = emb.filter(pc.less(emb["vec_id"], pa.scalar(5))).sort_by("vec_id")
    qvecs = np.stack([np.asarray(v, dtype=np.float32)
                      for v in qrows["embedding"].to_pylist()])
    return knn_ivf_index(idx, qvecs, k=5, nprobe=3)


_KNN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, q.embedding) AS score
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, rank, vec_id FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


def _knn_queries(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    emb = pq.read_table(_tbl(sf_dir, "embeddings"))
    qrows = emb.filter(pc.less(emb["vec_id"], pa.scalar(5))).sort_by("vec_id")
    return np.stack([np.asarray(v, dtype=np.float32)
                     for v in qrows["embedding"].to_pylist()])


def _knn_rank_table(t: pa.Table) -> pa.Table:
    """(qid, vec_id, rank) -> the oracle-comparable (query_id, rank, vec_id)
    shape (scores dropped: rank is the contract, matching knn_cosine)."""
    return pa.table({
        "query_id": pc.cast(t["qid"], pa.int64()),
        "rank": pc.cast(t["rank"], pa.int64()),
        "vec_id": pc.cast(t["vec_id"], pa.int64()),
    })


def _q_knn_hnsw_exh(sf_dir: str):
    """HNSW at EXHAUSTIVE parameters (ef >= corpus size): the search frontier
    can never satisfy its early-exit bound, so every node reachable from the
    entry point is visited and each segment returns its EXACT top-k — the
    merged result equals brute force, making the knn_cosine SQL oracle apply
    verbatim. Pruned-ef recall stays covered by pytest."""
    from solr_ray.ops.hnsw import build_hnsw_index, knn_hnsw_index

    idx = _idx_dir(sf_dir, "hnsw")
    if not os.path.exists(os.path.join(idx, "_hnsw.json")):
        build_hnsw_index(_read(sf_dir, "embeddings"), idx,
                         id_col="vec_id", vec_col="embedding",
                         num_segments=4)
    t = knn_hnsw_index(idx, _knn_queries(sf_dir), k=5, ef=1_000_000)
    return _knn_rank_table(t)


def _q_knn_ivf_exh(sf_dir: str):
    """IVF at nprobe = n_lists: every partition is scanned, so the result is
    the exact cosine top-k (same normalize+matmul kernel as knn_brute) and
    the knn_cosine SQL oracle applies verbatim."""
    from solr_ray.ops.ivf import build_ivf_index, knn_ivf_index

    idx = _idx_dir(sf_dir, "ivf")
    if not os.path.exists(os.path.join(idx, "_ivf.json")):
        build_ivf_index(_read(sf_dir, "embeddings"), idx,
                        id_col="vec_id", vec_col="embedding", n_lists=8,
                        train_sample=5000)
    t = knn_ivf_index(idx, _knn_queries(sf_dir), k=5, nprobe=8)
    return _knn_rank_table(t)


def _q_knn_lsh_exh(sf_dir: str):
    """LSH at probe_radius = n_bits: the multiprobe flip set enumerates every
    bucket, so every vector is scored for every query — exact top-k, oracled
    by the same SQL as knn_cosine."""
    from solr_ray.ops.similarity import knn_lsh

    out = knn_lsh(_read(sf_dir, "embeddings"), _knn_queries(sf_dir), k=5,
                  id_col="vec_id", vec_col="embedding",
                  n_bits=4, probe_radius=4)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": pc.cast(t["query_id"], pa.int64()),
            "rank": pc.cast(t["rank"], pa.int64()),
            "vec_id": pc.cast(t["id"], pa.int64()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


def _q_suggest_weighted(sf_dir: str):
    """Weighted prefix suggester (SuggestComponent semantics): dictionary =
    distinct terms weighted by document frequency, completion ordered
    (weight desc, term asc)."""
    from solr_ray.search.spellcheck import (
        build_suggest_dictionary,
        suggest_prefix_weighted,
    )

    d = build_suggest_dictionary(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        "text", analyzer="whitespace")
    return suggest_prefix_weighted(d, "s", 10)


def _q_suggest_fuzzy(sf_dir: str):
    """Weighted fuzzy suggester: Damerau-Levenshtein <= 2 from the seed,
    ordered (distance asc, weight desc, term asc)."""
    from solr_ray.search.spellcheck import (
        build_suggest_dictionary,
        suggest_fuzzy_weighted,
    )

    d = build_suggest_dictionary(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        "text", analyzer="whitespace")
    return suggest_fuzzy_weighted(d, "hach", 10, max_edits=2)


def _q_hll_users(sf_dir: str):
    from solr_ray.functions.aggregates import approx_distinct

    est = approx_distinct(_read(sf_dir, "events", columns=["user_id"]),
                          "user_id")
    return pa.table({"approx_distinct_users": pa.array([float(est)])})


def _q_media_features(sf_dir: str):
    """Multimodal: deterministic 8x8 raw-RGB payloads derived from doc_id,
    REAL decode + channel-stats/histogram features via the actor-pool
    stage (decoder='raw' — pure-numpy image processing, no stub)."""
    from solr_ray.ops.multimodal import media_features

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            px = (np.arange(8 * 8 * 3, dtype=np.int64) * (int(d) + 7)) % 256
            payloads.append(px.astype(np.uint8).tobytes())
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, pa.binary()),
                         "width": pa.array(np.full(len(ids), 8, np.int32)),
                         "height": pa.array(np.full(len(ids), 8, np.int32))})

    media = docs.map_batches(to_media, batch_format="pyarrow")
    out = media_features(media, concurrency=2, payload_col="payload",
                         dim=14, decoder="raw")
    return out.select_columns(["doc_id", "feature"])


def _q_interval_facet(sf_dir: str):
    """facet.interval over events.value: overlapping arbitrary brackets
    [0,50], (50,200], [100,*) — a row counts in EVERY containing interval
    (unlike range facets)."""
    from solr_ray.ops.grouping import facet_interval

    return facet_interval(
        _read(sf_dir, "events", columns=["value"]), "value",
        [("a_low", 0.0, 50.0, True, True),
         ("b_mid", 50.0, 200.0, False, True),
         ("c_high", 100.0, None, True, False)])


def _q_audio_features(sf_dir: str):
    """Multimodal audio: deterministic synthetic PCM16 tones derived from
    doc_id, REAL DSP features (RMS / zero-crossings / spectral centroid /
    band energies) via the actor-pool stage — pure-numpy decode, no stub."""
    from solr_ray.ops.multimodal import AudioFeatureStage

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    SR = 8000

    def to_audio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = SR // 4  # 250 ms per clip
        ts = np.arange(n, dtype=np.float64) / SR
        payloads = []
        for d in ids:
            freq = 100.0 + (int(d) % 50) * 20.0
            tone = 0.4 * np.sin(2.0 * np.pi * freq * ts)
            payloads.append((tone * 32768.0).astype("<i2").tobytes())
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    out = docs.map_batches(to_audio, batch_format="pyarrow").map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"sample_rate": SR})
    return out.select_columns(["doc_id", "audio_feature"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # /sql handler (query text doubles as its own oracle)
        **{name: _make_sql_query(q) for name, q in _SQL_QUERIES.items()},
        # north-rule fulltext core
        "bm25_top10": _q_bm25_top10,
        "synonym_index_bm25": _q_synonym_index_bm25,
        "dismax_search": _q_dismax,
        "block_join_parents": _q_block_join_parents,
        "bm25_wand": _q_bm25_wand,
        "term_df": _q_term_df,
        "salted_term_counts": _q_salted_term_counts,
        "suggest_weighted": _q_suggest_weighted,
        "suggest_fuzzy": _q_suggest_fuzzy,
        # aggregation / faceting
        "pricing_summary": _q_pricing_summary,
        "facet_lang": _q_facet_lang,
        "interval_facet": _q_interval_facet,
        "facet_range_value": _q_facet_range_value,
        "facet_on_query": _q_facet_on_query,
        "json_facet_lang": _q_json_facet,
        "json_facet_range": _q_json_facet_range,
        "json_facet_highcard": _q_json_facet_highcard,
        "json_facet_percentile": _q_json_facet_percentile,
        "stream_expr_rollup": _q_stream_expr,
        "stream_expr_join": _q_stream_expr_join,
        "stream_expr_eval": _q_stream_expr_eval,
        "select_fq": _q_select_fq,
        "phrase_search": _q_phrase_search,
        "sloppy_phrase": _q_sloppy_phrase,
        "span_near_wildcard": _q_span_near_wildcard,
        "span_unordered": _q_span_unordered,
        "interval_ordered_maxwidth": _q_interval_ordered_maxwidth,
        "interval_unordered_3": _q_interval_unordered_3,
        "interval_containing": _q_interval_containing,
        "payload_score_sum": _q_payload_score_sum,
        "payload_check_phrase": _q_payload_check_phrase,
        "geofilt": _q_geofilt,
        "bbox": _q_bbox,
        "geodist_top20": _q_geodist_top20,
        "heatmap_facet": _q_heatmap_facet,
        "boolean_query": _q_boolean_query,
        "synonym_search": _q_synonym_search,
        "pivot_lang_source": _q_pivot_lang_source,
        "distinct_event_types": _q_distinct_event_types,
        "stats_quantity": _q_stats_quantity,
        "quantiles_value": _q_quantiles_value,
        "regress_lineitem": _q_regress_lineitem,
        "let_corr_predict": _q_let_corr_predict,
        "let_moving_avg": _q_let_moving_avg,
        "let_fft_daily": _q_let_fft_daily,
        "dbscan_embeddings": _q_dbscan_embeddings,
        "markov_sample": _q_markov_sample,
        "hist_quantity": _q_hist_quantity,
        "moving_avg_events": _q_moving_avg_events,
        "relatedness_source": _q_relatedness_source,
        "facet_prefix_index": _q_facet_prefix_index,
        "curation_pipeline": _q_curation_pipeline,
        "near_dup_pairs": _q_near_dup_pairs,
        "edge_ngram_df": _q_edge_ngram_df,
        "shingle_counts": _q_shingle_counts,
        "igain_features_en": _q_igain_features,
        "tlogit_score": _q_tlogit_score,
        "train_logit_en": _q_train_logit,
        "model_actor_score": _q_model_actor_score,
        "hash_range_split": _q_hash_range_split,
        "significant_terms_en": _q_significant_terms,
        # grouping / collapse / top-k
        "collapse_max_order": _q_collapse_max_order,
        "group_topk_orders": _q_group_topk_orders,
        "top100_orders": _q_top100_orders,
        "cursor_page2": _q_cursor_page2,
        # filters / updates
        "filter_bool": _q_filter_bool,
        "atomic_update_inc": _q_atomic_update_inc,
        # highlight / mlt / spellcheck / rerank / sampling / graph
        "highlight": _q_highlight,
        "mlt": _q_mlt,
        "spellcheck": _q_spellcheck,
        "rerank": _q_rerank,
        "rerank_trees": _q_rerank_trees,
        "rerank_nn": _q_rerank_nn,
        "random_sample": _q_random_sample,
        "gather_nodes": _q_gather_nodes,
        "graph_terms": _q_graph_terms,
        # joins / lookups / set ops
        "semi_join_building": _q_semi_join_building,
        "anti_join_small_customers": _q_anti_join_small_customers,
        "join_customer_region": _q_join_customer_region,
        "shuffle_join_orders": _q_shuffle_join_orders,
        "explode_embeddings": _q_explode_embeddings,
        "fetch_supplier_nation": _q_fetch_supplier_nation,
        # windows / streams
        "timeseries_hourly": _q_timeseries_hourly,
        "sessions_per_user": _q_sessions_per_user,
        "tumbling_daily": _q_tumbling_daily,
        "sliding_window": _q_sliding_window,
        "topic_incremental": _q_topic_incremental,
        # text analysis
        "token_counts": _q_token_counts,
        "avg_tokens_by_lang": _q_avg_tokens_by_lang,
        # dedup
        "exact_dedup_docs": _q_exact_dedup_docs,
        "minhash_pairs": _q_minhash_pairs,
        "minhash_pairs_join": _q_minhash_pairs_join,
        "dup_clusters_dist": _q_dup_clusters_dist,
        "gather_nodes_dist": _q_gather_nodes_dist,
        "shortest_path_dist": _q_shortest_path_dist,
        "enum_lang_ord": _q_enum_lang_ord,
        "currency_orders_usd": _q_currency_orders_usd,
        "percentile_price_by_flag": _q_percentile_price_by_flag,
        "simhash_candidates": _q_simhash_candidates,
        "text_profile_sigs": _q_text_profile_sigs,
        "pairwise_cosine": _q_pairwise_cosine,
        # similarity
        "knn_cosine": _q_knn_cosine,
        "knn_lsh": _q_knn_lsh,
        "knn_hnsw": _q_knn_hnsw,
        "knn_ivf": _q_knn_ivf,
        "knn_hnsw_exh": _q_knn_hnsw_exh,
        "knn_ivf_exh": _q_knn_ivf_exh,
        "knn_lsh_exh": _q_knn_lsh_exh,
        # scalar / aggregate functions
        "scale_acctbal": _q_scale_acctbal,
        "hll_users": _q_hll_users,
        # rows-only text/multimodal
        "langid": _q_langid,
        "quality": _q_quality,
        "fingerprints": _q_fingerprints,
        "fingerprints_md5": _q_fingerprints_md5,
        "media_features": _q_media_features,
        "audio_features": _q_audio_features,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered per table)
# --------------------------------------------------------------------------

def _bm25_ranked_cte() -> str:
    """Shared WITH-clause body: whitespace tokenization -> BM25 scoring ->
    per-qid rank (mirrors the engine's op order; see _bm25_oracle_sql)."""
    qvals = ", ".join(
        f"({i}, '{q}')" for i, q in enumerate(BM25_QUERIES)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  WHERE tok <> ''
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
q(qid, text) AS (VALUES {qvals}),
qterms AS (
  SELECT DISTINCT qid, tok AS term
  FROM (SELECT qid, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok FROM q)
  WHERE tok <> ''
),
scored AS (
  SELECT qt.qid, tf.doc_id,
         SUM(
           LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / c.avgdl)))
         ) AS score
  FROM qterms qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY qt.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS rank
  FROM scored
)"""


def _bm25_oracle_sql() -> str:
    return _bm25_ranked_cte() + """
SELECT qid, rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 10
"""


def _synonym_bm25_oracle_sql() -> str:
    """BM25 over index-time-expanded tokens: each token emits itself plus
    its mutual-group mates (scan<->filter, merge<->join), on BOTH the doc
    and the query side — exactly the syn_ws analyzer's semantics
    (expanded tokens count toward tf and dl)."""
    qvals = ", ".join(
        f"({i}, '{q}')" for i, q in enumerate(BM25_QUERIES)
    )
    return f"""
WITH raw AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
        FROM documents)
  WHERE tok <> ''
),
syn(tok, syn_out) AS (VALUES ('scan','filter'), ('filter','scan'),
                             ('merge','join'), ('join','merge')),
expanded AS (
  SELECT doc_id, tok AS term FROM raw
  UNION ALL
  SELECT r.doc_id, s.syn_out FROM raw r JOIN syn s ON s.tok = r.tok
),
dl0 AS (SELECT doc_id, COUNT(*) AS dl FROM expanded GROUP BY doc_id),
dl AS (
  SELECT d.doc_id, COALESCE(dl0.dl, 0) AS dl
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN dl0 ON dl0.doc_id = d.doc_id
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM expanded GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
q(qid, text) AS (VALUES {qvals}),
qraw AS (
  SELECT qid, tok
  FROM (SELECT qid, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
        FROM q)
  WHERE tok <> ''
),
qterms AS (
  SELECT DISTINCT qid, term FROM (
    SELECT qid, tok AS term FROM qraw
    UNION ALL
    SELECT r.qid, s.syn_out FROM qraw r JOIN syn s ON s.tok = r.tok)
),
scored AS (
  SELECT qt.qid, tf.doc_id,
         SUM(
           LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / c.avgdl)))
         ) AS score
  FROM qterms qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY qt.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS rank
  FROM scored
)
SELECT qid, rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 10
"""


def _dismax_oracle_sql() -> str:
    """edismax over (title = first 5 whitespace tokens, body = text):
    per-clause DisMax GREATEST(boosted field scores) + tie*(sum-max);
    clause scores sum; mm=2 (both clauses); pf adds a body phrase boost.
    Op order parenthesized to match solr_ray.search.edismax exactly."""
    qvals = ", ".join(
        f"({i}, '{q.split()[0]}', '{q.split()[1]}')"
        for i, q in enumerate(BM25_QUERIES)
    )
    return f"""
WITH body AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
title AS (SELECT doc_id, toks[1:5] AS toks FROM body),
dl_b AS (SELECT doc_id, len(toks) AS dl FROM body),
dl_t AS (SELECT doc_id, len(toks) AS dl FROM title),
c_b AS (SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl_b),
c_t AS (SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl_t),
tf_b AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
         FROM (SELECT doc_id, UNNEST(toks) AS tok FROM body) GROUP BY 1, 2),
tf_t AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
         FROM (SELECT doc_id, UNNEST(toks) AS tok FROM title) GROUP BY 1, 2),
df_b AS (SELECT term, COUNT(*) AS df FROM tf_b GROUP BY term),
df_t AS (SELECT term, COUNT(*) AS df FROM tf_t GROUP BY term),
q(qid, t1, t2) AS (VALUES {qvals}),
qterms AS (SELECT qid, t1 AS term FROM q UNION ALL SELECT qid, t2 AS term FROM q),
s_b AS (
  SELECT qt.qid, tf.doc_id, qt.term,
         1.0 * (LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / c.avgdl)))) AS s
  FROM qterms qt JOIN df_b df USING (term) JOIN tf_b tf USING (term)
  JOIN dl_b dl ON dl.doc_id = tf.doc_id CROSS JOIN c_b c
),
s_t AS (
  SELECT qt.qid, tf.doc_id, qt.term,
         2.0 * (LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                * (tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / c.avgdl)))) AS s
  FROM qterms qt JOIN df_t df USING (term) JOIN tf_t tf USING (term)
  JOIN dl_t dl ON dl.doc_id = tf.doc_id CROSS JOIN c_t c
),
sides AS (
  SELECT COALESCE(b.qid, t.qid) AS qid,
         COALESCE(b.doc_id, t.doc_id) AS doc_id,
         COALESCE(b.term, t.term) AS term,
         COALESCE(b.s, 0.0) AS sb, COALESCE(t.s, 0.0) AS st
  FROM s_b b FULL OUTER JOIN s_t t
    ON b.qid = t.qid AND b.doc_id = t.doc_id AND b.term = t.term
),
contrib AS (
  SELECT qid, doc_id,
         GREATEST(st, sb) + 0.3 * ((st + sb) - GREATEST(st, sb)) AS c
  FROM sides
),
main AS (SELECT qid, doc_id, SUM(c) AS s_terms, COUNT(*) AS nmatch
         FROM contrib GROUP BY 1, 2),
ppos AS (
  SELECT q.qid, b.doc_id, COUNT(*) AS ptf
  FROM body b, q, UNNEST(range(1, len(b.toks))) AS u(i)
  WHERE b.toks[i] = q.t1 AND b.toks[i + 1] = q.t2
  GROUP BY 1, 2
),
phrase AS (
  SELECT p.qid, p.doc_id,
         1.5 * (
           (LN(1.0 + (c.n_docs - d1.df + 0.5) / (d1.df + 0.5))
            + LN(1.0 + (c.n_docs - d2.df + 0.5) / (d2.df + 0.5)))
           * (p.ptf / (p.ptf + {K1} * (1.0 - {B} + {B} * dl.dl / c.avgdl)))
         ) AS sp
  FROM ppos p JOIN q USING (qid)
  JOIN df_b d1 ON d1.term = q.t1 JOIN df_b d2 ON d2.term = q.t2
  JOIN dl_b dl ON dl.doc_id = p.doc_id CROSS JOIN c_b c
),
merged AS (
  SELECT m.qid, m.doc_id, m.s_terms + COALESCE(p.sp, 0.0) AS score
  FROM main m LEFT JOIN phrase p ON p.qid = m.qid AND p.doc_id = m.doc_id
  WHERE m.nmatch >= 2
),
ranked AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS rank
  FROM merged
)
SELECT qid, rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 10
"""


def _rerank_oracle_sql(
        model_expr: str = "5.0 * (1.0 / (1.0 + d.n_chars))") -> str:
    """ReRank semantics over the BM25 top-50: top-10 rescored with
    new_score = model_expr + score and re-sorted (score desc, doc_id asc);
    ranks 11-50 keep original order below. model_expr is plain SQL over
    d.n_chars / r.score mirroring the LTR model's float op order."""
    return _bm25_ranked_cte() + f""",
rescored AS (
  SELECT r.qid, r.doc_id, r.rank AS old_rank, (r.rank <= 10) AS top,
         CASE WHEN r.rank <= 10
              THEN {model_expr} + r.score
              ELSE r.score END AS new_score
  FROM ranked r JOIN documents d USING (doc_id)
  WHERE r.rank <= 50
),
final AS (
  SELECT qid, doc_id, new_score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
           CASE WHEN top THEN 0 ELSE 1 END,
           CASE WHEN top THEN new_score END DESC,
           CASE WHEN top THEN doc_id END,
           old_rank) AS rank
  FROM rescored
)
SELECT qid, rank, doc_id, FLOOR(new_score * 1e5) / 1e5 AS score_r
FROM final
"""


# shared spatial CTE: synthetic coords + haversine with the ENGINE's exact
# operand order (ops/spatial.py:haversine_km); quantization buries ulp noise
_GEO_CTE = """
WITH g AS (
  SELECT doc_id,
         ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM documents
),
d AS (
  SELECT doc_id,
         2.0 * 6371.0087714 * asin(sqrt(
           sin((radians(48.85) - radians(lat)) / 2.0)
             * sin((radians(48.85) - radians(lat)) / 2.0)
           + cos(radians(lat)) * cos(radians(48.85))
             * (sin((radians(2.35) - radians(lon)) / 2.0)
                * sin((radians(2.35) - radians(lon)) / 2.0))
         )) AS dist
  FROM g
)"""


def _sig_terms_oracle_sql() -> str:
    return """
WITH fg_df AS (
  SELECT term, COUNT(*) AS fg_df FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents WHERE lang = 'en') AS t(doc_id, tok)
    WHERE tok <> '') GROUP BY term
),
bg_df AS (
  SELECT term, COUNT(*) AS bg_df FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents) AS t(doc_id, tok)
    WHERE tok <> '') GROUP BY term
),
totals AS (
  SELECT (SELECT COUNT(*) FROM documents WHERE lang='en') AS fg_n,
         (SELECT COUNT(*) FROM documents) AS bg_n
)
SELECT f.term, f.fg_df, b.bg_df,
       (f.fg_df::DOUBLE / t.fg_n) / ((b.bg_df + 1)::DOUBLE / (t.bg_n + 1))
         AS score
FROM fg_df f JOIN bg_df b USING (term) CROSS JOIN totals t
WHERE f.fg_df >= 2
ORDER BY score DESC, f.term
LIMIT 20
"""


def oracle_sql() -> dict[str, str]:
    cutoff = _TOPIC_CUTOFF_US
    return {
        **_SQL_QUERIES,
        "bm25_top10": _bm25_oracle_sql(),
        "synonym_index_bm25": _synonym_bm25_oracle_sql(),
        "bm25_wand": _bm25_oracle_sql(),
        "dismax_search": _dismax_oracle_sql(),
        "term_df": """
SELECT term, COUNT(*)::BIGINT AS df FROM (
  SELECT DISTINCT doc_id, tok AS term
  FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
        FROM documents) AS t(doc_id, tok)
  WHERE tok <> '') GROUP BY term
""",
        "salted_term_counts": """
SELECT tok AS term, COUNT(*)::BIGINT AS cnt
FROM (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS tok FROM documents)
WHERE tok <> '' GROUP BY tok
""",
        "spellcheck": """
WITH vocab AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents) AS t(doc_id, tok)
    WHERE tok <> '') GROUP BY term
),
q(qid, term) AS (
  VALUES (0, 'tabel'), (0, 'scann'), (1, 'merg'), (1, 'joinn'),
         (2, 'sparkk')
),
unknown AS (
  SELECT qid, term FROM q
  WHERE term NOT IN (SELECT term FROM vocab)
),
cand AS (
  SELECT u.qid, u.term, v.term AS suggestion,
         damerau_levenshtein(u.term, v.term)::BIGINT AS distance, v.df
  FROM unknown u JOIN vocab v
    ON damerau_levenshtein(u.term, v.term) <= 2
)
SELECT qid, term, suggestion, distance, df FROM cand
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid, term
                           ORDER BY distance, df DESC, suggestion) <= 3
ORDER BY qid, term, distance, df DESC, suggestion
""",
        "suggest_weighted": """
WITH dfreq AS (
  SELECT term, COUNT(*)::BIGINT AS weight FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents) AS t(doc_id, tok)
    WHERE tok <> '') GROUP BY term)
SELECT term, weight FROM dfreq WHERE term LIKE 's%'
ORDER BY weight DESC, term LIMIT 10
""",
        "suggest_fuzzy": """
WITH dfreq AS (
  SELECT term, COUNT(*)::BIGINT AS weight FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
          FROM documents) AS t(doc_id, tok)
    WHERE tok <> '') GROUP BY term)
SELECT term, weight, distance FROM (
  SELECT term, weight,
         damerau_levenshtein(term, 'hach')::BIGINT AS distance FROM dfreq)
WHERE distance <= 2
ORDER BY distance, weight DESC, term LIMIT 10
""",
        "pricing_summary": """
WITH p AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity) AS BIGINT) AS q_i,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS dp_c4
  FROM lineitem)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(q_i) AS DOUBLE) AS sum_qty,
       CAST(SUM(price_c) AS DOUBLE) / 100 AS sum_base_price,
       CAST(SUM(dp_c4) AS DOUBLE) / 10000 AS sum_disc_price,
       CAST(SUM(q_i) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS n_rows
FROM p GROUP BY l_returnflag, l_linestatus
""",
        "facet_lang": """
SELECT lang, COUNT(*) AS "count" FROM documents GROUP BY lang
ORDER BY "count" DESC, lang LIMIT 10
""",
        "rerank": _rerank_oracle_sql(),
        "rerank_trees": _rerank_oracle_sql(
            "(2.0 * (CASE WHEN (1.0 / (1.0 + d.n_chars)) <= 0.001"
            " THEN (CASE WHEN r.score <= 5.0 THEN 0.5 ELSE 1.5 END)"
            " ELSE 2.5 END)"
            " + 1.0 * (CASE WHEN r.score <= 8.0 THEN 0.25 ELSE 1.0 END))"),
        "rerank_nn": _rerank_oracle_sql(
            "(0.1"
            " + 1.5 * GREATEST(-0.05 + 100.0 * (1.0 / (1.0 + d.n_chars))"
            "                  + 0.1 * r.score, 0.0)"
            " + 0.75 * GREATEST(1.0 + -50.0 * (1.0 / (1.0 + d.n_chars))"
            "                   + 0.2 * r.score, 0.0))"),
        "highlight": """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')
           AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tfq AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  WHERE tok IN ('table', 'scan') GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY term),
scored AS (
  SELECT t.doc_id,
         SUM(LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (t.tf / (t.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * dl.dl / c.avgdl)))) AS score
  FROM tfq t JOIN df USING (term) JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN corpus c GROUP BY t.doc_id
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
),
top AS (SELECT doc_id, score, rank FROM ranked WHERE rank <= 10),
tok AS (
  SELECT d.doc_id, u.i, d.toks[u.i] AS w,
         d.toks[u.i] IN ('table', 'scan') AS hit, len(d.toks) AS n
  FROM docs d JOIN top USING (doc_id),
       UNNEST(range(1, len(d.toks) + 1)) AS u(i)
),
hits AS (SELECT doc_id, i AS p, n FROM tok WHERE hit),
windows AS (
  SELECT h.doc_id, h.p, GREATEST(0, LEAST(h.p - 1, h.n - 30)) AS lo
  FROM hits h WHERE h.n > 30
),
win_scored AS (
  SELECT w.doc_id, w.p, w.lo,
         (SELECT COUNT(DISTINCT t.w) FROM tok t
          WHERE t.doc_id = w.doc_id AND t.hit
            AND t.i BETWEEN w.lo + 1 AND w.lo + 30) AS cnt
  FROM windows w
),
best AS (
  SELECT doc_id, lo FROM (
    SELECT doc_id, lo, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY cnt DESC, p ASC) AS rn
    FROM win_scored) WHERE rn = 1
),
choice AS (
  SELECT h.doc_id, CASE WHEN h.n <= 30 THEN 0 ELSE b.lo END AS lo, h.n
  FROM (SELECT DISTINCT doc_id, n FROM hits) h
  LEFT JOIN best b USING (doc_id)
),
snip AS (
  SELECT c.doc_id,
         string_agg(CASE WHEN t.hit THEN '<em>' || t.w || '</em>'
                         ELSE t.w END, ' ' ORDER BY t.i) AS snippet
  FROM choice c JOIN tok t ON t.doc_id = c.doc_id
    AND t.i BETWEEN c.lo + 1 AND LEAST(c.n, c.lo + 30)
  GROUP BY c.doc_id
)
SELECT top.rank, top.doc_id, FLOOR(top.score * 1e5) / 1e5 AS score_r,
       COALESCE(s.snippet, '') AS snippet
FROM top LEFT JOIN snip s USING (doc_id)
""",
        "mlt": """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')
           AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf_all AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs) GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf_all GROUP BY term),
top_terms AS (
  SELECT d0.term
  FROM tf_all d0 JOIN df USING (term) CROSS JOIN corpus c
  WHERE d0.doc_id = 0 AND df.df >= 2
  ORDER BY d0.tf * LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) DESC,
           d0.term
  LIMIT 10
),
scored AS (
  SELECT tf.doc_id,
         SUM(LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
                                        + 0.75 * dl.dl / c.avgdl)))) AS score
  FROM top_terms q
  JOIN tf_all tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored WHERE doc_id <> 0
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 10
""",
        "langid": """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS words
  FROM documents
),
s AS (
  SELECT doc_id, len(words) AS n,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('the','and','of','to','in','is','that','it','was','for','with','as',
       'on','are','this','be','at','have','not','you')))::DOUBLE / len(words)
      ELSE 0.0 END AS s_en,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('der','die','und','das','ist','ich','nicht','mit','ein','auf','sich',
       'den','von','des','im','dem','zu','für','sie')))::DOUBLE / len(words)
      ELSE 0.0 END AS s_de,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('le','la','les','et','des','est','un','une','du','que','pour','dans',
       'qui','sur','pas','au','avec','ce','il')))::DOUBLE / len(words)
      ELSE 0.0 END AS s_fr,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('el','la','los','las','de','que','y','en','un','una','es','por','con',
       'para','del','se','su','al','lo','más')))::DOUBLE / len(words)
      ELSE 0.0 END AS s_es
  FROM w
),
pick AS (
  SELECT doc_id, n,
    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS best,
    GREATEST(s_de, s_en, s_es, s_fr) AS conf
  FROM s
)
SELECT doc_id,
       CASE WHEN n = 0 OR conf < 0.05 THEN 'und' ELSE best END AS lang_pred,
       FLOOR(conf * 1e6) / 1e6 AS conf_r
FROM pick
""",
        "quality": """
WITH f AS (
  SELECT doc_id,
         length(text)::DOUBLE AS n_chars,
         len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     w -> w <> '') AS words,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digits
  FROM documents
),
r AS (
  SELECT doc_id, n_chars, n_tokens,
         CASE WHEN len(words) > 0 THEN
           len(list_filter(words, w -> w IN ('and','are','as','at','be',
             'for','have','in','is','it','not','of','on','that','the',
             'this','to','was','with','you')))::DOUBLE / len(words)
         ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars > 0 THEN n_digits / n_chars
              ELSE 0.0 END AS digit_ratio,
         CASE WHEN n_tokens > 0
              THEN (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)
              ELSE 0.0 END AS mean_wlen
  FROM f
),
s AS (
  SELECT doc_id, n_tokens, stop_ratio, digit_ratio,
         LEAST(GREATEST(n_tokens / 50.0, 0), 1) * 0.4
       + LEAST(GREATEST(stop_ratio / 0.4, 0), 1) * 0.3
       + LEAST(GREATEST(1.0 - digit_ratio * 5, 0), 1) * 0.15
       + LEAST(GREATEST((mean_wlen - 2) / 4, 0), 1) * 0.15 AS score
  FROM r
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       FLOOR(stop_ratio * 1e6) / 1e6 AS stop_ratio_r,
       FLOOR(digit_ratio * 1e6) / 1e6 AS digit_ratio_r,
       FLOOR(score * 1e6) / 1e6 AS score_r
FROM s
""",
        "geofilt": _GEO_CTE + """
SELECT doc_id, FLOOR(dist * 1e3) / 1e3 AS dist_r FROM d WHERE dist <= 5000.0
""",
        "bbox": """
SELECT doc_id,
       ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
       ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
FROM documents
WHERE ((doc_id * 7919) % 18000) / 100.0 - 90.0 BETWEEN -30.0 AND 45.0
  AND ((doc_id * 104729) % 36000) / 100.0 - 180.0 BETWEEN -90.0 AND 60.0
""",
        "geodist_top20": _GEO_CTE + """
SELECT doc_id, FLOOR(dist * 1e3) / 1e3 AS dist_r FROM d
ORDER BY dist, doc_id LIMIT 20
""",
        "heatmap_facet": """
WITH g AS (
  SELECT ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM documents
)
SELECT CAST(LEAST(FLOOR((lat - (-60.0)) / 10.0), 11) AS BIGINT)
         AS grid_row,
       CAST(LEAST(FLOOR((lon - (-120.0)) / 15.0), 15) AS BIGINT)
         AS grid_col,
       COUNT(*) AS cnt
FROM g
WHERE lat BETWEEN -60.0 AND 60.0 AND lon BETWEEN -120.0 AND 120.0
GROUP BY 1, 2 ORDER BY grid_row, grid_col
""",
        "block_join_parents": """
SELECT o.o_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS score_c,
       COUNT(*) AS n_matching_children
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(ROUND(l.l_quantity) AS BIGINT) >= 45
GROUP BY o.o_orderkey
""",
        "sliding_window": """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum
FROM events
""",
        "text_profile_sigs": """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
counts AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks
  WHERE length(tok) >= 2 GROUP BY doc_id, tok
),
quant AS (
  SELECT doc_id,
         CASE WHEN MAX(c) > 1
              THEN GREATEST(2, CAST(ROUND(MAX(c) * 0.01) AS BIGINT))
              ELSE 1 END AS q
  FROM counts GROUP BY doc_id
),
prof AS (
  SELECT c.doc_id, c.tok, (c.c // q.q) * q.q AS qc
  FROM counts c JOIN quant q USING (doc_id)
  WHERE (c.c // q.q) * q.q >= q.q
),
strs AS (
  SELECT doc_id, string_agg(tok || ' ' || qc, ' ' ORDER BY qc DESC, tok)
    AS profile
  FROM prof GROUP BY doc_id
)
SELECT d.doc_id, md5(COALESCE(s.profile, '')) AS sig
FROM documents d LEFT JOIN strs s USING (doc_id)
""",
        "interval_facet": """
SELECT 'a_low' AS interval,
       CAST((SELECT COUNT(*) FROM events
             WHERE value >= 0.0 AND value <= 50.0) AS BIGINT) AS "count"
UNION ALL
SELECT 'b_mid',
       CAST((SELECT COUNT(*) FROM events
             WHERE value > 50.0 AND value <= 200.0) AS BIGINT)
UNION ALL
SELECT 'c_high',
       CAST((SELECT COUNT(*) FROM events
             WHERE value >= 100.0) AS BIGINT)
ORDER BY interval
""",
        "facet_range_value": """
SELECT FLOOR(value / 50.0) * 50.0 AS bucket_start, COUNT(*) AS n
FROM events WHERE value >= 0 AND value < 500
GROUP BY 1 ORDER BY 1
""",
        "synonym_search": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  WHERE tok IN ('merge', 'join') GROUP BY doc_id, tok
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
grouped AS (
  SELECT doc_id, SUM(tf) AS tf_sum FROM tf GROUP BY doc_id
),
scored AS (
  SELECT g.doc_id,
         LN(1.0 + (c.n_docs - m.df_max + 0.5) / (m.df_max + 0.5))
         * (g.tf_sum / (g.tf_sum + 1.2 * (1.0 - 0.75
                                          + 0.75 * dl.dl / c.avgdl)))
           AS score
  FROM grouped g
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c
  CROSS JOIN (SELECT MAX(df) AS df_max FROM df) m
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "boolean_query": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  WHERE tok <> '' GROUP BY doc_id, tok
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(
           LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl)))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus c
  WHERE tf.term IN ('table', 'merge')
  GROUP BY tf.doc_id
),
allowed AS (
  SELECT doc_id FROM docs
  WHERE list_contains(toks, 'table') AND NOT list_contains(toks, 'scan')
),
ranked AS (
  SELECT s.doc_id, s.score,
         ROW_NUMBER() OVER (ORDER BY s.score DESC, s.doc_id) AS rank
  FROM scored s JOIN allowed a USING (doc_id)
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "sloppy_phrase": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
df AS (
  SELECT term, COUNT(*) AS df FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
    WHERE tok IN ('table', 'scan')) GROUP BY term
),
idfsum AS (
  SELECT (SELECT LN(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
          FROM df WHERE term = 'table')
       + (SELECT LN(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
          FROM df WHERE term = 'scan') AS v
  FROM corpus c
),
pos1 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'table')) AS p
  FROM docs
),
pos2 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'scan')) AS p
  FROM docs
),
chain AS (
  SELECT a.doc_id, a.p AS p1, MIN(b.p) AS p2
  FROM pos1 a JOIN pos2 b ON b.doc_id = a.doc_id AND b.p > a.p
  GROUP BY a.doc_id, a.p
),
tfq AS (
  SELECT doc_id, COUNT(*) AS tf FROM chain
  WHERE (p2 - p1) - 1 <= 2 GROUP BY doc_id
),
scored AS (
  SELECT t.doc_id,
         i.v * (t.tf / (t.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * dl.dl / c.avgdl))) AS score
  FROM tfq t
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN corpus c CROSS JOIN idfsum i
  WHERE t.tf > 0
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "span_near_wildcard": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
pos1 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] LIKE 'tab%')) AS p
  FROM docs
),
pos2 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'scan')) AS p
  FROM docs
),
dfs AS (
  SELECT (SELECT COUNT(DISTINCT doc_id) FROM pos1) AS df1,
         (SELECT COUNT(DISTINCT doc_id) FROM pos2) AS df2
),
idfsum AS (
  SELECT LN(1.0 + (c.n_docs - d.df1 + 0.5) / (d.df1 + 0.5))
       + LN(1.0 + (c.n_docs - d.df2 + 0.5) / (d.df2 + 0.5)) AS v
  FROM corpus c, dfs d
),
chain AS (
  SELECT a.doc_id, a.p AS p1, MIN(b.p) AS p2
  FROM pos1 a JOIN pos2 b ON b.doc_id = a.doc_id AND b.p > a.p
  GROUP BY a.doc_id, a.p
),
tfq AS (
  SELECT doc_id, COUNT(*) AS tf FROM chain
  WHERE (p2 - p1) - 1 <= 2 GROUP BY doc_id
),
scored AS (
  SELECT t.doc_id,
         i.v * (t.tf / (t.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * dl.dl / c.avgdl))) AS score
  FROM tfq t JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN corpus c CROSS JOIN idfsum i
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "span_unordered": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
pos1 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'hash')) AS p
  FROM docs
),
pos2 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'join')) AS p
  FROM docs
),
dfs AS (
  SELECT (SELECT COUNT(DISTINCT doc_id) FROM pos1) AS df1,
         (SELECT COUNT(DISTINCT doc_id) FROM pos2) AS df2
),
idfsum AS (
  SELECT LN(1.0 + (c.n_docs - d.df1 + 0.5) / (d.df1 + 0.5))
       + LN(1.0 + (c.n_docs - d.df2 + 0.5) / (d.df2 + 0.5)) AS v
  FROM corpus c, dfs d
),
near AS (
  SELECT a.doc_id, a.p, MIN(ABS(b.p - a.p)) AS gap
  FROM pos1 a JOIN pos2 b ON b.doc_id = a.doc_id AND b.p <> a.p
  GROUP BY a.doc_id, a.p
),
tfq AS (
  SELECT doc_id, COUNT(*) AS tf FROM near
  WHERE gap - 1 <= 3 GROUP BY doc_id
),
scored AS (
  SELECT t.doc_id,
         i.v * (t.tf / (t.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * dl.dl / c.avgdl))) AS score
  FROM tfq t JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN corpus c CROSS JOIN idfsum i
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "payload_score_sum": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
occ AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'join')) AS p
  FROM docs
)
SELECT doc_id,
       SUM(((doc_id + (p - 1)) % 7) * 0.5) AS score_sum
FROM occ GROUP BY doc_id ORDER BY doc_id
""",
        "payload_check_phrase": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
hits AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks)),
    i -> toks[i] = 'hash' AND toks[i + 1] = 'join'
         AND ((doc_id + (i - 1)) % 7) * 0.5 = 1.0
         AND ((doc_id + i) % 7) * 0.5 = 1.5)) AS p
  FROM docs
)
SELECT doc_id, COUNT(*)::BIGINT AS tf
FROM hits GROUP BY doc_id ORDER BY doc_id
""",
        "interval_ordered_maxwidth": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
pa_ AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'table')) AS p
  FROM docs
),
pb AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'scan')) AS p
  FROM docs
),
chain AS (
  SELECT a.doc_id, a.p AS p1, MIN(b.p) AS p2
  FROM pa_ a JOIN pb b ON b.doc_id = a.doc_id AND b.p > a.p
  GROUP BY a.doc_id, a.p
),
minimal AS (
  SELECT c.doc_id, c.p1, c.p2 FROM chain c
  WHERE NOT EXISTS (SELECT 1 FROM pa_ a2
                    WHERE a2.doc_id = c.doc_id
                      AND a2.p > c.p1 AND a2.p < c.p2)
)
SELECT doc_id, COUNT(*)::BIGINT AS tf FROM minimal
WHERE p2 - p1 + 1 <= 6
GROUP BY doc_id ORDER BY doc_id
""",
        "interval_unordered_3": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
p1 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'hash')) AS p
  FROM docs
),
p2 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'join')) AS p
  FROM docs
),
p3 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'scan')) AS p
  FROM docs
),
wins AS (
  SELECT DISTINCT a.doc_id,
         LEAST(a.p, b.p, c.p) AS s, GREATEST(a.p, b.p, c.p) AS e
  FROM p1 a
  JOIN p2 b ON b.doc_id = a.doc_id
  JOIN p3 c ON c.doc_id = a.doc_id
),
minimal AS (
  SELECT w.doc_id, w.s, w.e FROM wins w
  WHERE NOT EXISTS (SELECT 1 FROM wins w2
                    WHERE w2.doc_id = w.doc_id
                      AND w2.s >= w.s AND w2.e <= w.e
                      AND (w2.s <> w.s OR w2.e <> w.e))
)
SELECT doc_id, COUNT(*)::BIGINT AS tf FROM minimal
GROUP BY doc_id ORDER BY doc_id
""",
        "interval_containing": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
p1 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'hash')) AS p
  FROM docs
),
p2 AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'join')) AS p
  FROM docs
),
pc_ AS (
  SELECT doc_id, UNNEST(list_filter(range(1, len(toks) + 1),
                                    i -> toks[i] = 'table')) AS p
  FROM docs
),
wins AS (
  SELECT DISTINCT a.doc_id, LEAST(a.p, b.p) AS s, GREATEST(a.p, b.p) AS e
  FROM p1 a JOIN p2 b ON b.doc_id = a.doc_id
),
minimal AS (
  SELECT w.doc_id, w.s, w.e FROM wins w
  WHERE NOT EXISTS (SELECT 1 FROM wins w2
                    WHERE w2.doc_id = w.doc_id
                      AND w2.s >= w.s AND w2.e <= w.e
                      AND (w2.s <> w.s OR w2.e <> w.e))
)
SELECT m.doc_id, COUNT(*)::BIGINT AS tf FROM minimal m
WHERE EXISTS (SELECT 1 FROM pc_ c
              WHERE c.doc_id = m.doc_id AND c.p BETWEEN m.s AND m.e)
GROUP BY m.doc_id ORDER BY m.doc_id
""",
        "phrase_search": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
df AS (
  SELECT term, COUNT(*) AS df FROM (
    SELECT DISTINCT doc_id, tok AS term
    FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
    WHERE tok IN ('table', 'scan')) GROUP BY term
),
idfsum AS (
  SELECT (SELECT LN(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
          FROM df WHERE term = 'table')
       + (SELECT LN(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
          FROM df WHERE term = 'scan') AS v
  FROM corpus c
),
tfq AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks)),
                         i -> toks[i] = 'table' AND toks[i+1] = 'scan'))
           AS tf
  FROM docs
),
scored AS (
  SELECT t.doc_id,
         i.v * (t.tf / (t.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * dl.dl / c.avgdl))) AS score
  FROM tfq t
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN corpus c CROSS JOIN idfsum i
  WHERE t.tf > 0
),
ranked AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r
FROM ranked WHERE rank <= 20
""",
        "select_fq": """
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS toks
  FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(toks, t -> t <> '')) AS dl FROM docs
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM docs)
  WHERE tok <> '' GROUP BY doc_id, tok
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(
           LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl)))
         ) AS score
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  WHERE tf.term IN ('table', 'scan')
  GROUP BY tf.doc_id
),
filtered AS (
  SELECT s.doc_id, s.score, d.lang,
         ROW_NUMBER() OVER (ORDER BY s.score DESC, s.doc_id) AS rank
  FROM scored s JOIN documents d USING (doc_id)
  WHERE d.lang = 'en'
)
SELECT rank, doc_id, FLOOR(score * 1e5) / 1e5 AS score_r, lang
FROM filtered WHERE rank <= 20
""",
        "json_facet_lang": """
SELECT lang, COUNT(*) AS cnt,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang ORDER BY cnt DESC, lang LIMIT 10
""",
        "json_facet_highcard": """
SELECT o_custkey, COUNT(*) AS cnt, MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_custkey ORDER BY cnt DESC, o_custkey LIMIT 10
""",
        "stream_expr_rollup": """
SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY cnt DESC, lang LIMIT 10
""",
        "stream_expr_eval": """
SELECT l_orderkey, l_linenumber, l_quantity * 2 AS q2,
       length(l_returnflag) AS flag_len
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
""",
        "stream_expr_join": """
SELECT c.c_mktsegment, COUNT(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
        "json_facet_range": """
WITH m AS (
  SELECT value, CAST(FLOOR(value * 1000) AS BIGINT) AS v_milli FROM events
  WHERE value >= 0 AND value < 500)
SELECT FLOOR(value / 100.0) * 100.0 AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(v_milli) AS DOUBLE) / 1000 AS sum_value_m
FROM m GROUP BY 1 ORDER BY 1 LIMIT 10
""",
        "facet_on_query": """
SELECT lang, COUNT(*) AS cnt FROM documents
WHERE list_has_any(regexp_split_to_array(text, '\\s+'),
                   ['table', 'scan'])
GROUP BY lang ORDER BY cnt DESC, lang LIMIT 10
""",
        "pivot_lang_source": """
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
""",
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "stats_quantity": """
WITH s AS (
  SELECT COUNT(*) AS n, SUM(l_quantity) AS s,
         SUM(l_quantity * l_quantity) AS ss,
         MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
  FROM lineitem)
SELECT n AS "count", s AS "sum", s / n AS mean, mn AS "min", mx AS "max",
       ss / n - (s / n) * (s / n) AS variance,
       SQRT(ss / n - (s / n) * (s / n)) AS stddev
FROM s
""",
        "quantiles_value": """
SELECT 0.25 AS q, quantile_disc(value, 0.25) AS value FROM events
UNION ALL SELECT 0.5, quantile_disc(value, 0.5) FROM events
UNION ALL SELECT 0.75, quantile_disc(value, 0.75) FROM events
UNION ALL SELECT 0.9, quantile_disc(value, 0.9) FROM events
UNION ALL SELECT 0.99, quantile_disc(value, 0.99) FROM events
""",
        "significant_terms_en": _sig_terms_oracle_sql(),
        "collapse_max_order": """
SELECT o_custkey, MAX(o_totalprice) AS o_totalprice FROM orders
GROUP BY o_custkey
""",
        "group_topk_orders": """
SELECT o_orderpriority, o_totalprice FROM (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS rn
  FROM orders) WHERE rn <= 3
""",
        "top100_orders": """
SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
        "cursor_page2": """
SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 50
""",
        "filter_bool": """
SELECT * FROM events
WHERE (event_type IN ('click', 'view') AND value >= 10 AND value < 50)
   OR (event_type = 'error' AND NOT (value < 80))
""",
        "atomic_update_inc": """
WITH u AS (
  SELECT o_custkey, COUNT(*)::DOUBLE AS delta,
         CASE WHEN COUNT(*) >= 15 THEN 'HEAVY' ELSE 'LIGHT' END AS seg
  FROM orders GROUP BY o_custkey)
SELECT c.c_custkey,
       c.c_acctbal + COALESCE(u.delta, 0) AS c_acctbal,
       COALESCE(u.seg, c.c_mktsegment) AS c_mktsegment
FROM customer c LEFT JOIN u ON u.o_custkey = c.c_custkey
""",
        "semi_join_building": """
SELECT * FROM orders WHERE o_custkey IN
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
        "anti_join_small_customers": """
SELECT * FROM customer WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""",
        "join_customer_region": """
SELECT r.r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
         AS sum_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""",
        "shuffle_join_orders": """
SELECT c.c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS sum_totalprice
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
        "explode_embeddings": """
SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS element FROM embeddings
""",
        "fetch_supplier_nation": """
SELECT s.s_suppkey, s.s_name, n.n_name FROM supplier s
LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
""",
        "relatedness_source": """
WITH tot AS (
  SELECT COUNT(*)::DOUBLE AS bg_size,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS fg_size
  FROM documents
),
b AS (
  SELECT source,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS fg_count,
         COUNT(*)::BIGINT AS bg_count
  FROM documents GROUP BY source
),
z AS (
  SELECT source, fg_count, bg_count, t.fg_size, t.bg_size,
         (CAST(fg_count AS DOUBLE)
          - t.fg_size * (CAST(bg_count AS DOUBLE) / t.bg_size))
         / (CASE WHEN SQRT(t.fg_size
                           * (CAST(bg_count AS DOUBLE) / t.bg_size)
                           * (1 - (CAST(bg_count AS DOUBLE) / t.bg_size)))
                      = 0
                 THEN 1e-10
                 ELSE SQRT(t.fg_size
                           * (CAST(bg_count AS DOUBLE) / t.bg_size)
                           * (1 - (CAST(bg_count AS DOUBLE) / t.bg_size)))
            END) AS zv
  FROM b CROSS JOIN tot t
)
SELECT source, fg_count, bg_count,
       FLOOR((CAST(fg_count AS DOUBLE) / bg_size) * 1e5 + 0.5) / 1e5
         AS fg_pop,
       FLOOR((CAST(bg_count AS DOUBLE) / bg_size) * 1e5 + 0.5) / 1e5
         AS bg_pop,
       FLOOR((0.2 * ((zv + -80) / (50 + ABS(zv + -80)))
              + 0.2 * ((zv + -30) / (30 + ABS(zv + -30)))
              + 0.2 * ((zv + 0) / (30 + ABS(zv + 0)))
              + 0.2 * ((zv + 30) / (30 + ABS(zv + 30)))
              + 0.2 * ((zv + 80) / (50 + ABS(zv + 80)))) * 1e5 + 0.5)
         / 1e5 AS relatedness
FROM z
ORDER BY relatedness DESC, source LIMIT 25
""",
        "facet_prefix_index": """
SELECT source, COUNT(*)::BIGINT AS count FROM documents
WHERE source LIKE 'src1%'
GROUP BY source ORDER BY source LIMIT 50
""",
        "near_dup_pairs": """
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cosine
  FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
),
f AS (SELECT * FROM p WHERE cosine >= 0.25),
t AS (
  SELECT id_a, id_b, cosine FROM f
  QUALIFY ROW_NUMBER() OVER (PARTITION BY id_a
                             ORDER BY cosine DESC, id_b) <= 3
)
SELECT id_a, id_b, FLOOR(cosine * 1e5) / 1e5 AS cosine_r
FROM t ORDER BY id_a, id_b
""",
        "curation_pipeline": """
WITH f AS (
  SELECT doc_id, text,
         length(text)::DOUBLE AS n_chars,
         len(regexp_split_to_array(text, '\s+')) AS n_tokens,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     w -> w <> '') AS words,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digits
  FROM documents
),
r AS (
  SELECT doc_id, text, n_chars, n_tokens, words,
         CASE WHEN len(words) > 0 THEN
           len(list_filter(words, w -> w IN ('and','are','as','at','be',
             'for','have','in','is','it','not','of','on','that','the',
             'this','to','was','with','you')))::DOUBLE / len(words)
         ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars > 0 THEN n_digits / n_chars
              ELSE 0.0 END AS digit_ratio,
         CASE WHEN n_tokens > 0
              THEN (n_chars - (n_tokens - 1)) / GREATEST(n_tokens, 1)
              ELSE 0.0 END AS mean_wlen
  FROM f
),
scored AS (
  SELECT doc_id, text, n_tokens, words,
         LEAST(GREATEST(n_tokens / 50.0, 0), 1) * 0.4
       + LEAST(GREATEST(stop_ratio / 0.4, 0), 1) * 0.3
       + LEAST(GREATEST(1.0 - digit_ratio * 5, 0), 1) * 0.15
       + LEAST(GREATEST((mean_wlen - 2) / 4, 0), 1) * 0.15 AS score
  FROM r
),
gated AS (
  SELECT * FROM scored WHERE FLOOR(score * 1e6) / 1e6 >= 0.5
),
lang AS (
  SELECT doc_id, text, n_tokens, score,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('the','and','of','to','in','is','that','it','was','for','with','as',
       'on','are','this','be','at','have','not','you')))::DOUBLE
        / len(words) ELSE 0.0 END AS s_en,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('der','die','und','das','ist','ich','nicht','mit','ein','auf','sich',
       'den','von','des','im','dem','zu','für','sie')))::DOUBLE
        / len(words) ELSE 0.0 END AS s_de,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('le','la','les','et','des','est','un','une','du','que','pour','dans',
       'qui','sur','pas','au','avec','ce','il')))::DOUBLE
        / len(words) ELSE 0.0 END AS s_fr,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> x IN
      ('el','la','los','las','de','que','y','en','un','una','es','por','con',
       'para','del','se','su','al','lo','más')))::DOUBLE
        / len(words) ELSE 0.0 END AS s_es,
    len(words) AS nw
  FROM gated
),
en AS (
  SELECT doc_id, text, n_tokens, score FROM lang
  WHERE nw > 0 AND GREATEST(s_de, s_en, s_es, s_fr) >= 0.05
    AND NOT (s_de >= s_en AND s_de >= s_es AND s_de >= s_fr)
    AND (s_en >= s_es AND s_en >= s_fr)
),
dedup AS (
  SELECT doc_id, n_tokens, score FROM en
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       FLOOR(score * 1e6) / 1e6 AS score_r
FROM dedup ORDER BY doc_id
""",
        "edge_ngram_df": """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           UNNEST(flatten([[substr(tok, 1, n)
                            FOR n IN range(1, least(4, len(tok)) + 1)]
                           FOR tok IN toks])) AS g
    FROM docs)
)
SELECT g AS term, COUNT(*)::BIGINT AS df
FROM grams GROUP BY g ORDER BY term
""",
        "shingle_counts": """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT UNNEST([toks[i] || '_' || toks[i + 1]
                 FOR i IN range(1, len(toks))]) AS term
  FROM docs
)
SELECT term, COUNT(*)::BIGINT AS cnt
FROM sh GROUP BY term ORDER BY term
""",
        "igain_features_en": """
WITH docs AS (
  SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS toks
  FROM documents
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS np_
  FROM documents
),
pres AS (
  SELECT DISTINCT doc_id, lang, tok AS term
  FROM (SELECT doc_id, lang, UNNEST(toks) AS tok FROM docs)
  WHERE tok <> ''
),
cnt AS (
  SELECT term,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS df_pos,
         COUNT(*)::BIGINT AS df_all
  FROM pres GROUP BY term
),
sc AS (
  SELECT c.term, c.df_pos, c.df_all,
         (CASE WHEN t.np_ <= 0 OR t.np_ >= t.n OR t.n <= 0 THEN 0
               ELSE -(t.np_ / t.n) * LN(t.np_ / t.n)
                    - ((t.n - t.np_) / t.n) * LN((t.n - t.np_) / t.n) END
          - (CAST(c.df_all AS DOUBLE) / t.n) *
            (CASE WHEN CAST(c.df_pos AS DOUBLE) <= 0
                    OR CAST(c.df_pos AS DOUBLE) >= CAST(c.df_all AS DOUBLE)
                    OR CAST(c.df_all AS DOUBLE) <= 0 THEN 0
                  ELSE -(CAST(c.df_pos AS DOUBLE) / CAST(c.df_all AS DOUBLE))
                        * LN(CAST(c.df_pos AS DOUBLE)
                             / CAST(c.df_all AS DOUBLE))
                       - ((CAST(c.df_all AS DOUBLE)
                           - CAST(c.df_pos AS DOUBLE))
                          / CAST(c.df_all AS DOUBLE))
                        * LN((CAST(c.df_all AS DOUBLE)
                              - CAST(c.df_pos AS DOUBLE))
                             / CAST(c.df_all AS DOUBLE)) END)
          - ((t.n - CAST(c.df_all AS DOUBLE)) / t.n) *
            (CASE WHEN t.np_ - CAST(c.df_pos AS DOUBLE) <= 0
                    OR t.np_ - CAST(c.df_pos AS DOUBLE)
                       >= t.n - CAST(c.df_all AS DOUBLE)
                    OR t.n - CAST(c.df_all AS DOUBLE) <= 0 THEN 0
                  ELSE -((t.np_ - CAST(c.df_pos AS DOUBLE))
                         / (t.n - CAST(c.df_all AS DOUBLE)))
                        * LN((t.np_ - CAST(c.df_pos AS DOUBLE))
                             / (t.n - CAST(c.df_all AS DOUBLE)))
                       - (((t.n - CAST(c.df_all AS DOUBLE))
                           - (t.np_ - CAST(c.df_pos AS DOUBLE)))
                          / (t.n - CAST(c.df_all AS DOUBLE)))
                        * LN(((t.n - CAST(c.df_all AS DOUBLE))
                              - (t.np_ - CAST(c.df_pos AS DOUBLE)))
                             / (t.n - CAST(c.df_all AS DOUBLE))) END)
         ) AS ig
  FROM cnt c CROSS JOIN tot t
)
SELECT term, df_pos, df_all, FLOOR(ig * 1e5) / 1e5 AS igain_r
FROM sc ORDER BY term
""",
        "tlogit_score": """
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
tf AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, t -> t = 'hash')) AS DOUBLE) AS t0,
         CAST(len(list_filter(toks, t -> t = 'join')) AS DOUBLE) AS t1,
         CAST(len(list_filter(toks, t -> t = 'scan')) AS DOUBLE) AS t2
  FROM docs
),
z AS (
  SELECT doc_id, (((-0.1) + 0.4 * t0) + (-0.3) * t1) + 0.2 * t2 AS z
  FROM tf
)
SELECT doc_id,
       FLOOR((1.0 / (1.0 + EXP(-z))) * 1e5) / 1e5 AS score_r
FROM z ORDER BY doc_id
""",
        "let_corr_predict": """
SELECT FLOOR(corr(l_extendedprice, l_quantity) * 100000) / 100000 AS c5,
       FLOOR((regr_slope(l_extendedprice, l_quantity) * 30.0
              + regr_intercept(l_extendedprice, l_quantity)) * 100) / 100
         AS yhat2
FROM lineitem
""",
        "let_moving_avg": """
WITH daily AS (
  SELECT date_trunc('day', ts) AS bucket, COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1
),
w AS (
  SELECT bucket,
         CAST(SUM(cnt) OVER (ORDER BY bucket
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 7.0 AS ma7,
         ROW_NUMBER() OVER (ORDER BY bucket) AS rn
  FROM daily
)
SELECT bucket, ma7 FROM w WHERE rn >= 7 ORDER BY bucket
""",
        "regress_lineitem": """
WITH q AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS xq,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yq
  FROM lineitem
),
s AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(CAST(xq AS HUGEINT)) AS sx,
         SUM(CAST(yq AS HUGEINT)) AS sy,
         SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
         SUM(CAST(yq AS HUGEINT) * yq) AS syy,
         SUM(CAST(xq AS HUGEINT) * yq) AS sxy
  FROM q
),
m AS (
  SELECT n,
         n * sxy - sx * sy AS cov_num,
         n * sxx - sx * sx AS var_x,
         n * syy - sy * sy AS var_y,
         sx, sy
  FROM s
),
d AS (
  SELECT n,
         CAST(cov_num AS DOUBLE)
           / SQRT(CAST(var_x AS DOUBLE) * CAST(var_y AS DOUBLE)) AS corr_xy,
         CAST(cov_num AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS cov_xy,
         CAST(cov_num AS DOUBLE) / CAST(var_x AS DOUBLE) AS slope,
         sx, sy
  FROM m
)
SELECT n, corr_xy, cov_xy, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept,
       corr_xy * corr_xy AS r2
FROM d
""",
        "hist_quantity": """
WITH b AS (
  SELECT ((CAST(ROUND(l_quantity) AS BIGINT) - 1) * 10) // 50 AS raw
  FROM lineitem
),
c AS (
  SELECT LEAST(GREATEST(raw, 0), 9) AS bin, COUNT(*)::BIGINT AS cnt
  FROM b GROUP BY 1
)
SELECT r.bin, COALESCE(c.cnt, 0)::BIGINT AS cnt
FROM (SELECT UNNEST(range(0, 10)) AS bin) r
LEFT JOIN c ON c.bin = r.bin
ORDER BY r.bin
""",
        "moving_avg_events": """
WITH daily AS (
  SELECT date_trunc('day', ts) AS bucket, COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1
),
w AS (
  SELECT bucket,
         CAST(SUM(cnt) OVER (ORDER BY bucket
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 7.0 AS ma7,
         ROW_NUMBER() OVER (ORDER BY bucket) AS rn
  FROM daily
)
SELECT bucket, ma7 FROM w WHERE rn >= 7 ORDER BY bucket
""",
        "timeseries_hourly": """
SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS DOUBLE) / 1000
         AS sum_value_m
FROM events GROUP BY 1 ORDER BY 1
""",
        "sessions_per_user": f"""
SELECT user_id, COUNT(*) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN prev_t IS NULL
                   OR t - prev_t > {2 * 3600 * 1_000_000} THEN 1 ELSE 0 END
           AS new_session
  FROM (SELECT user_id, epoch_us(ts) AS t,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev_t
        FROM events))
WHERE new_session = 1 GROUP BY user_id
""",
        "tumbling_daily": """
SELECT user_id,
       to_timestamp((epoch_us(ts) // 86400000000) * 86400)::TIMESTAMP
         AS window_start,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
""",
        "topic_incremental": f"""
SELECT * FROM events WHERE epoch_us(ts) > {cutoff}
""",
        "token_counts": """
SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS n_tokens
FROM documents
""",
        "avg_tokens_by_lang": """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS DOUBLE)
         / COUNT(*) AS avg_tokens
FROM documents GROUP BY lang
""",
        "fingerprints_md5": """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
         ELSE [array_to_string(toks[i : i + 3], ' ')
               FOR i IN range(1, len(toks) - 2)]
    END AS gs
  FROM docs
)
SELECT doc_id,
  CASE WHEN len(gs) = 0 THEN 0
       ELSE list_aggregate(list_transform(gs,
              g -> CAST(md5_number_lower(g) % 9223372036854775808
                        AS BIGINT)), 'min')
  END AS fingerprint
FROM grams ORDER BY doc_id
""",
        "exact_dedup_docs": """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, n_chars ORDER BY doc_id) = 1
""",
        "knn_cosine": _KNN_TOPK_SQL,
        # ANN paths at exhaustive parameters are EXACT (see the _exh entry
        # docstrings), so the brute-force oracle applies verbatim
        "knn_hnsw_exh": _KNN_TOPK_SQL,
        "knn_ivf_exh": _KNN_TOPK_SQL,
        "knn_lsh_exh": _KNN_TOPK_SQL,
        "graph_terms": """
WITH df AS (
  SELECT l_suppkey, COUNT(*)::BIGINT AS cnt FROM lineitem
  WHERE l_suppkey BETWEEN 1 AND 40 GROUP BY l_suppkey
)
SELECT l_suppkey, cnt FROM df WHERE cnt <= 600 ORDER BY l_suppkey
""",
        "dup_clusters_dist": """
WITH RECURSIVE sym AS (
  SELECT 'c' || c_custkey AS src, 'n' || c_nationkey AS dst FROM customer
  UNION ALL
  SELECT 'n' || c_nationkey, 'c' || c_custkey FROM customer
),
reach(node, label) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT s.dst, r.label FROM reach r JOIN sym s ON s.src = r.node
)
SELECT node AS id, MIN(label) AS cluster FROM reach GROUP BY node
""",
        "gather_nodes_dist": """
WITH RECURSIVE e AS (
  SELECT 'c' || o_custkey AS src, 'o' || o_orderkey AS dst FROM orders
  UNION ALL
  SELECT 'o' || l_orderkey, 's' || l_suppkey FROM lineitem
),
walk(node, level) AS (
  SELECT 'c1', 0
  UNION
  SELECT e.dst, w.level + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.level < 2
)
SELECT node, MIN(level) AS level FROM walk GROUP BY node
""",
        "enum_lang_ord": """
SELECT CAST(CASE lang WHEN 'zh' THEN 0 WHEN 'de' THEN 1 WHEN 'es' THEN 2
            WHEN 'fr' THEN 3 WHEN 'en' THEN 4 END AS BIGINT) AS lang_ord,
       lang, COUNT(*)::BIGINT AS n
FROM documents GROUP BY lang ORDER BY lang_ord
""",
        "currency_orders_usd": """
WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           * (CASE o_orderkey % 3 WHEN 0 THEN 1.0 WHEN 1 THEN 1.25
              ELSE 2.0 END) / 100 AS usd
  FROM orders
)
SELECT o_orderkey, usd FROM c WHERE usd > 400000 ORDER BY o_orderkey
""",
        "shortest_path_dist": """
WITH RECURSIVE e AS (
  SELECT c_custkey::BIGINT AS src, c_custkey::BIGINT + 1 AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey::BIGINT, c_custkey::BIGINT + 10 FROM customer
),
lvl(node, level) AS (
  SELECT 1::BIGINT, 0
  UNION
  SELECT e.dst, l.level + 1 FROM lvl l JOIN e ON e.src = l.node
  WHERE l.level < 6
),
dist AS (SELECT node, MIN(level) AS lv FROM lvl GROUP BY node),
par AS (
  SELECT d.node, d.lv, MIN(e.src) AS parent
  FROM dist d JOIN e ON e.dst = d.node
  JOIN dist s ON s.node = e.src AND s.lv = d.lv - 1
  GROUP BY d.node, d.lv
),
path(step, node) AS (
  SELECT lv, node FROM dist WHERE node = 42
  UNION ALL
  SELECT p.step - 1, par.parent FROM path p
  JOIN par ON par.node = p.node WHERE p.step > 0
)
SELECT step::BIGINT AS step, node::BIGINT AS node FROM path ORDER BY step
""",
        "gather_nodes": """
WITH RECURSIVE e AS (
  SELECT 'c' || o_custkey AS src, 'o' || o_orderkey AS dst FROM orders
  UNION ALL
  SELECT 'o' || l_orderkey, 's' || l_suppkey FROM lineitem
),
walk(node, level) AS (
  SELECT 'c1', 0
  UNION
  SELECT e.dst, w.level + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.level < 2
)
SELECT node, MIN(level) AS level FROM walk GROUP BY node
""",
        "scale_acctbal": """
SELECT c_custkey,
       (c_acctbal - MIN(c_acctbal) OVER ())
         / (MAX(c_acctbal) OVER () - MIN(c_acctbal) OVER ())
         AS acctbal_scaled
FROM customer
""",
    }
