"""Extended differential-fuzz sweep: the CI arms (tests/test_differential_fuzz)
run over many more seeds, outside pytest, for closing-evidence runs.

Every generated query is executed on BOTH engines (Spark SQL and DuckDB over
the same parquet views) and compared with the driver-style row/column/value
check. CI pins 4 seeds x 44 queries; this tool defaults to 10 fresh seeds
(440 queries) and any divergence prints the generating SQL.

Usage: python tools/fuzz_sweep.py [sf_dir] [seed ...]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

DEFAULT_SEEDS = [11, 97, 2024, 31337, 8, 271828, 999, 4242, 77, 60321]


def main() -> int:
    from map_reduce_ruby_spark.session import get_spark
    from map_reduce_ruby_spark.sources import load_table
    from tools.check_correctness import compare, oracle_connection

    import test_differential_fuzz as fz

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    seeds = [int(a) for a in sys.argv[2:]] or DEFAULT_SEEDS

    spark = get_spark(app_name="fuzz_sweep")
    for t in ["lineitem", "orders", "documents", "customer", "nation"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    con = oracle_connection(sf_dir)

    total, fails = 0, []
    for seed in seeds:
        rng = random.Random(seed)
        for i in range(fz.N_QUERIES):
            total += 1
            try:
                problems, desc = fz.run_arm(
                    spark, con, fz.ARMS[i % len(fz.ARMS)], rng, f"s{seed}q{i}"
                )
            except Exception as e:  # engine exception = divergence too
                arm = fz.ARMS[i % len(fz.ARMS)].__name__
                problems, desc = [f"exception: {e}"], f"<{arm} raised>"
            if problems:
                fails.append((seed, i, desc, problems))
        print(f"seed {seed}: done ({total} total, {len(fails)} failures)", flush=True)

    print(f"SWEEP: {total} queries, {len(fails)} divergences")
    for seed, i, sql, problems in fails[:5]:
        print(f"--- seed={seed} i={i}: {problems}\n{sql}\n")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
