"""Spark-side per-query wall times at one sf directory (min-of-N).

Companion to tools/check_correctness.py (which runs the TWO-engine hash
gate and reports combined gate time): this measures the Spark side alone,
so SCALING.md's decade tables can separate engine cost from oracle cost.
Persisted-index entries train on run 1 and reload on run 2+; min-of-N
therefore reports the steady-state serving cost, matching the
"Spark-side (min-of-2)" columns of the round-6/7 tables.

Usage: python tools/decade_times.py sf_dir [runs] [query ...]
Prints one JSON line: {"sf_dir": ..., "runs": N, "times": {q: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = sys.argv[3:]

    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="decade_times")
    entries = all_entries()
    names = only or list(entries)
    times: dict[str, float] = {}
    for name in names:
        best = None
        rows = None
        for _ in range(runs):
            t0 = time.time()
            rows = entries[name].fn(spark, sf_dir).toPandas()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name}: {dt:.2f}s ({len(rows)} rows)", file=sys.stderr, flush=True)
        times[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "times": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
