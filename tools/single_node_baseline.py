"""Single-process baseline of the reference's canonical wordcount dataflow,
head-to-head with the engine's distributed `mr_wordcount`.

The reference (`/root/reference`) publishes no benchmark numbers (SURVEY.md
§6), so this tool reconstructs its throughput ceiling: ONE interpreter
executing exactly the reference pipeline — map yields (word, 1) pairs,
every pair is JSON-serialized for buffer accounting (mapper.rb:50), pairs
hash-partition on md5-of-JSON (the engine's SQL-checkable twin of
hash_partitioner.rb:28-30), each partition combines via the user's binary
reduce and emits key-sorted output (mapper.rb:126, reduceable.rb:17-36).
Ruby and Python are the same speed class of interpreter, so this is an
honest stand-in for the reference's single-node data plane.

Prints one JSON line:
  {"python_single_s": ..., "spark_s": ..., "speedup": ..., "n_pairs": ...}

Usage: python tools/single_node_baseline.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PARTITIONS = 16


def python_single_process(texts: list[str]) -> tuple[float, int]:
    t0 = time.perf_counter()
    partitions: list[dict[str, int]] = [dict() for _ in range(N_PARTITIONS)]
    n_pairs = 0
    for text in texts:
        for w in text.split():  # user map: yields (word, 1) per word
            n_pairs += 1
            kj = json.dumps(w, separators=(",", ":"), ensure_ascii=False)
            # buffer accounting the reference does per pair (mapper.rb:50)
            _ = len(kj) + 4
            p = int(hashlib.md5(kj.encode()).hexdigest()[:8], 16) % N_PARTITIONS
            bucket = partitions[p]
            prev = bucket.get(w)
            # user binary reduce (README.md:42-50): v1 + v2
            bucket[w] = 1 if prev is None else prev + 1
    out = []
    for bucket in partitions:  # sorted within partition (mapper.rb:126)
        out.extend(sorted(bucket.items()))
    dt = time.perf_counter() - t0
    return dt, n_pairs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # replication factors: the single-process ceiling is flat per pair, the
    # distributed engine amortizes its fixed overhead — report the crossover.
    scales = [int(s) for s in (sys.argv[2:] or ["1", "10", "50"])]

    from pyspark.sql import functions as F

    from map_reduce_ruby_spark.core import Job
    from map_reduce_ruby_spark.session import get_spark
    from map_reduce_ruby_spark.sources import load_table

    spark = get_spark(app_name="single_node_baseline")
    docs = load_table(spark, sf_dir, "documents").select("text")
    texts = [r.text for r in docs.collect()]

    job = Job(
        map_fn=lambda row: ((w, 1) for w in row.text.split()),
        reduce_fn=lambda key, a, b: a + b,
        num_partitions=N_PARTITIONS,
    )

    results = []
    for scale in scales:
        py_s, n_pairs = python_single_process(texts * scale)

        # repartition: the source is one parquet file (1-2 partitions); the
        # engine's parallelism comes from the input split count, exactly as
        # the reference's comes from how many worker jobs the user enqueues.
        replicated = (
            docs.crossJoin(spark.range(scale).select(F.lit(1).alias("__dup")))
            .select("text")
            .repartition(32)
        )
        job.run(spark, replicated, sort_output=False).count()  # warm
        t0 = time.perf_counter()
        job.run(spark, replicated, sort_output=False).count()
        spark_s = time.perf_counter() - t0
        results.append(
            {
                "scale": scale,
                "n_pairs": n_pairs,
                "python_single_s": round(py_s, 3),
                "spark_s": round(spark_s, 3),
                "speedup": round(py_s / spark_s, 2),
            }
        )

    print(json.dumps({"sf_dir": sf_dir, "runs": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
