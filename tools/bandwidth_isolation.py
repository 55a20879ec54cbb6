"""Bandwidth-isolation experiment: is the 8->32 scaling gap hardware or code?

The official `bench.py --scaling` 8->32 efficiency (0.68 in round 2) is
measured on ONE host, one memory socket. Per-task CPU time on IDENTICAL work
inflates ~65% when 32 workers run instead of 8 — consistent with a shared
memory-bandwidth/LLC ceiling, but that profile came from inside a full Ray
build (shuffle, object store, scheduler all present), so "the code
anti-scales" was still a candidate explanation.

This experiment removes every piece of software coordination:

  stage payloads (one bucket-group table for segment build; one raw-pages
  table for extract+analyze) are prepared ONCE and written to parquet.
  Then P independent OS processes are launched (no Ray, no shared object
  store, no shuffle, no IPC — each process loads its own private copy of
  the same payload and loops the pure stage function). Per-iteration wall
  time per process is reported at P = 1, 8, 32.

If per-task inflation at P=32 reproduces the inflation seen inside the real
build, the ceiling is the shared socket (bandwidth/LLC/turbo), not the
engine: on a real 4N-node cluster each node brings its own memory system,
so the single-host 8->32 number under-reports cluster scaling. A real
multi-node run is the only true measurement; this is the honest proxy the
sandbox allows.

Usage:
    PYTHONPATH=. python tools/bandwidth_isolation.py          # full run
    PYTHONPATH=. python tools/bandwidth_isolation.py --worker ...  # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

PAYLOAD_DIR = "/tmp/solr_ray_bench/bwiso"
N_GROUP_DOCS = 12_000   # ~ the tuned docs/bucket of the scaling bench
N_PAGE_DOCS = 12_000
REPS = {1: 6, 8: 4, 32: 3}


def prepare_payloads() -> None:
    import pyarrow.parquet as pq

    from solr_ray.analysis.chain import analyze_batch
    from solr_ray.fixtures import gen_pages
    from solr_ray.stages.docids import add_bucket
    from solr_ray.stages.extract import extract_batch

    os.makedirs(PAYLOAD_DIR, exist_ok=True)
    pages = gen_pages(N_PAGE_DOCS, seed=7)
    pq.write_table(pages, os.path.join(PAYLOAD_DIR, "pages.parquet"))
    t = extract_batch(pages)
    t = analyze_batch(t, "text", "text_en", dict_encode="tf")
    t = t.select(["url", "tokens", "tfs"])
    t = add_bucket(t, "url", 1)  # one bucket == one segment group
    pq.write_table(t, os.path.join(PAYLOAD_DIR, "group.parquet"))


def run_worker(stage: str, reps: int) -> None:
    import pyarrow.parquet as pq

    if stage == "segment":
        from solr_ray.stages.segment import build_segment_tables

        group = pq.read_table(os.path.join(PAYLOAD_DIR, "group.parquet"))
        group.combine_chunks()  # touch once (page-cache + arrow warm)

        def work():
            build_segment_tables(group, 0, ())
    else:
        from solr_ray.analysis.chain import analyze_batch
        from solr_ray.stages.extract import extract_batch

        pages = pq.read_table(os.path.join(PAYLOAD_DIR, "pages.parquet"))

        def work():
            analyze_batch(extract_batch(pages), "text", "text_en",
                          dict_encode="tf")

    work()  # warmup (JIT-ish caches, analyzer state, allocator)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        work()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"times": times}))


def launch(stage: str, procs: int) -> dict:
    reps = REPS[procs]
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--stage", stage, "--reps", str(reps)]
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ps = [subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, env=env)
          for _ in range(procs)]
    per_proc = []
    for p in ps:
        out, _ = p.communicate()
        per_proc.append(json.loads(out.strip().splitlines()[-1])["times"])
    flat = [t for times in per_proc for t in times]
    mean = sum(flat) / len(flat)
    return {"procs": procs, "mean_task_sec": round(mean, 3),
            "min_task_sec": round(min(flat), 3),
            "max_task_sec": round(max(flat), 3)}


def main() -> None:
    prepare_payloads()
    out = {"metric": "per-task wall time of the pure stage function in P "
                     "independent processes (no Ray) on identical inputs",
           "host_cpus": os.cpu_count(), "stages": {}}
    for stage in ("segment", "analyze"):
        rows = []
        for procs in (1, 8, 32):
            time.sleep(5)  # cooldown between parallelism levels
            rows.append(launch(stage, procs))
        base = rows[0]["mean_task_sec"]
        for r in rows:
            r["inflation_vs_p1"] = round(r["mean_task_sec"] / base, 3)
        out["stages"][stage] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--stage", default="segment")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    if a.worker:
        run_worker(a.stage, a.reps)
    else:
        main()
