"""A/B harness for the 8->32 scaling work: one fresh-process build per leg,
phase walls from the manifest, N reps, best-of per leg.

Usage: PYTHONPATH=. python tools/scaling_ab.py [--cpus 8,32] [--reps 2]
                                               [--rep-corpus 30]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def one(cpus: int, rep: int) -> dict:
    time.sleep(8)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py"), "--build-only",
         "--cpus", str(cpus), "--rep", str(rep)],
        capture_output=True, text=True, cwd=root,
    )
    out = json.loads(p.stdout.strip().splitlines()[-1])
    man = json.load(open(
        f"/tmp/solr_ray_bench/scaling_idx_{cpus}_{rep}/index.json"))
    out["phases"] = man["metrics"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rep-corpus", type=int, default=30)
    a = ap.parse_args()
    cpus = [int(c) for c in a.cpus.split(",")]
    best = {}
    for c in cpus:
        runs = [one(c, a.rep_corpus) for _ in range(a.reps)]
        best[c] = max(runs, key=lambda r: r["docs_per_sec"])
        print(json.dumps({"cpus": c, "runs": [
            {"dps": r["docs_per_sec"], **r["phases"]} for r in runs]}))
    if len(cpus) == 2:
        lo, hi = cpus
        e = (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / (hi / lo)
        ph = {}
        for k in ("analyze_sec", "segment_sec"):
            ph[k] = round((best[lo]["phases"][k] / best[hi]["phases"][k])
                          / (hi / lo), 3)
        print(json.dumps({"eff_total": round(e, 3), "eff_phase": ph}))


if __name__ == "__main__":
    main()
