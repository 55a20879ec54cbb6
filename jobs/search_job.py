"""Batch query-serving job for `ray job submit`.

    ray job submit --working-dir . -- \
        python jobs/search_job.py --index /data/index \
        --queries /data/queries.parquet --out /data/results \
        --k 10 --num-shards 4

queries parquet needs (qid:int64, text:string); results are written as
partitioned parquet (qid, rank, doc_id, url, score).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True,
                    help="parquet of (qid, text) query rows")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="taat", choices=["taat", "bmw"])
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--lazy", action="store_true",
                    help="row-group-lazy segment readers (bounded memory)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local" if os.environ.get("RAY_ADDRESS", "local")
                 == "local" else "auto",
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from solr_ray.search.searcher import search_dataset

    qds = ray.data.read_parquet(args.queries)
    res = search_dataset(qds, args.index, k=args.k, mode=args.mode,
                         num_shards=args.num_shards,
                         concurrency=args.concurrency, lazy=args.lazy)
    res.write_parquet(args.out)
    n = ray.data.read_parquet(args.out).count()
    print(json.dumps({"result_rows": n, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
