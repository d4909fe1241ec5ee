"""Cross-session bench stability: run bench.py N times in SEPARATE Spark
sessions (fresh subprocess + JVM each time) and merge per-query statistics.

Motivation (round-7 verdict): single-record per-query deltas under ~1.5x
on the shared host are ambient noise, not plan regressions — e.g.
q21_waiting_orders read 1.25 s and 1.86 s across rounds with zero code
diff. bench.py's within-session min-of-3 suppresses spikes inside one
session but cannot see session-to-session variance (JVM warmup paths, page
cache, host load drift). This tool measures exactly that: per query, the
min / median / max of the SESSION MINIMA across N independent sessions,
so the next reader can tell a real regression (delta beyond the recorded
band) from noise (delta inside it) without re-running anything.

Usage: python tools/bench_stability.py [n_sessions] [query ...]
Writes BENCH_STABILITY.json beside bench.py and prints the one-line JSON.
Honors the same env as bench.py (SPARK_GRAFT_SF_DIR, BENCH_RUNS, ...).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = sys.argv[2:]

    records = []
    for i in range(n):
        out = os.path.join(tempfile.gettempdir(), f"bench_session_{i}.json")
        env = dict(os.environ, BENCH_OUT=out)
        print(f"session {i + 1}/{n} ...", file=sys.stderr, flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *queries],
            check=True,
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(out, encoding="utf-8") as f:
            records.append(json.load(f))

    per: dict[str, dict] = {}
    for q in records[0]["queries"]:
        vals = sorted(r["queries"][q] for r in records)
        per[q] = {
            "min": vals[0],
            "median": round(statistics.median(vals), 3),
            "max": vals[-1],
            "rel_band": round((vals[-1] - vals[0]) / vals[0], 3) if vals[0] else 0.0,
            "sessions": vals,
        }

    noisiest = sorted(per, key=lambda q: per[q]["rel_band"], reverse=True)[:10]
    result = {
        "metric": "bench_stability",
        "unit": "sec",
        "sessions": n,
        "sf": records[0]["sf"],
        "load_1m_starts": [r["load_1m_start"] for r in records],
        "total_min": round(sum(v["min"] for v in per.values()), 3),
        "total_median": round(sum(v["median"] for v in per.values()), 3),
        "noisiest_queries": noisiest,
        "queries": per,
    }
    line = json.dumps(result)
    path = os.environ.get(
        "BENCH_STABILITY_OUT", os.path.join(REPO, "BENCH_STABILITY.json")
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(line + "\n")
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
