"""Index-build job entry point for `ray job submit`.

    ray job submit --working-dir . -- \
        python jobs/build_job.py --input /data/pages --out /data/index \
        --analyzer text_en --num-buckets 256 --merge-factor 16

Resumable: re-submitting after a failure skips completed segments via their
manifests (state/manifest.py); a completed build returns immediately from
the published index.json. The driver that launches us owns no Ray state —
this script initialises Ray itself (guarded) and shuts down cleanly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# repo-root import when invoked as `python jobs/build_job.py` (ray job
# submit sets --working-dir as cwd, which is already on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path/dir of pages(url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--analyzer", default="text_en")
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--text-source", default="html", choices=["html", "text"])
    ap.add_argument("--merge-factor", type=int, default=0,
                    help="if >0, run one tiered-merge round after the build")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.stages.merge import merge_index

    man = build_index(
        args.input, args.out, analyzer=args.analyzer,
        num_buckets=args.num_buckets, text_source=args.text_source,
        resume=not args.no_resume,
    )
    if args.merge_factor > 0:
        man = merge_index(args.out, merge_factor=args.merge_factor)
    print(json.dumps({"n_docs": man["n_docs"],
                      "segments": len(man["segments"]),
                      "metrics": man.get("metrics", {})}))
    ray.shutdown()
    return 0


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS") and
                os.environ["RAY_ADDRESS"] not in ("local",))


if __name__ == "__main__":
    sys.exit(main())
