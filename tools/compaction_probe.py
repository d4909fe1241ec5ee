"""Compaction probe: measure what the small-files problem costs and what
compact_*_index buys back.

Shape: build each persisted index from 1/N of the corpus, append the
remaining N-1 slices one at a time (the daily-ingest pattern — each append
lands its own generation of files), then probe the FRAGMENTED index; compact
(+ vacuum at grace=0) and probe again. Reports per-index file counts and
min-of-3 probe wall times for both states, as one JSON line.

Local NVMe is the LOWER BOUND for the fragmentation penalty: file-open
overhead here is ~0.1 ms/file, vs 10-100 ms/object on S3-class storage where
the same file counts multiply into seconds of pure metadata latency — the
measured file-count ratio is the transferable number, the latency delta is
the local floor of it.

Usage: SPARK_GRAFT_SF_DIR=... python tools/compaction_probe.py [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _data_files(root: str) -> int:
    n = 0
    for _r, _d, files in os.walk(root):
        n += sum(
            1
            for f in files
            if not f.startswith(("_", ".")) and ".crc" not in f
        )
    return n


def _min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> int:
    from map_reduce_ruby_spark.operators import (
        adaptive_nprobe,
        append_ivf_batch,
        compact_ivf_index,
        ivf_search,
        load_ivf_index,
        vacuum_index,
        write_ivf_index,
    )
    from map_reduce_ruby_spark.operators.dedup_index import (
        append_minhash_batch,
        compact_minhash_index,
        dedup_against_index,
        write_minhash_index,
    )
    from map_reduce_ruby_spark.session import get_spark
    from map_reduce_ruby_spark.sources import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="compaction_probe")
    out: dict = {"metric": "compaction_probe", "sf_dir": sf_dir, "n_batches": n_batches}

    # ---- IVF ----
    v = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    root = tempfile.mkdtemp(prefix="cprobe_")
    ivf_path = os.path.join(root, "ivf")
    # contiguous id ranges, not id % n: the deterministic k-means seeds
    # stride over the id domain, so a modulo slice would leave the trainer
    # a degenerate single seed (the id-domain assumption the catalog's
    # split entries also honor by batching on id < half)
    n_vec = v.count()
    step = max(1, n_vec // n_batches)
    write_ivf_index(spark, v.filter(F.col("id") < step), ivf_path, k=None)
    for b in range(1, n_batches):
        lo, hi = b * step, (b + 1) * step if b < n_batches - 1 else n_vec
        append_ivf_batch(
            spark,
            v.filter((F.col("id") >= lo) & (F.col("id") < hi)),
            ivf_path,
            batch_id=f"b{b}",
        )
    queries = v.filter(F.col("id") < 127).select(
        F.col("id").alias("qid"), F.col("e").alias("qe")
    )

    def probe_ivf():
        a, c = load_ivf_index(spark, ivf_path)
        ivf_search(a, c, queries, top_k=10, nprobe=adaptive_nprobe(len(c))).count()

    # SPARK_GRAFT_COMPACT_TARGET_BYTES sizes the compacted files; at probe
    # scale the 128 MB default collapses to one writer task, so a small
    # target shows the parallelism-preserving shape a sized compaction has
    # at real scale (files ~ bytes/target, not 1)
    target = int(os.environ.get("SPARK_GRAFT_COMPACT_TARGET_BYTES", 128 << 20))
    out["target_file_bytes"] = target
    out["ivf_files_fragmented"] = _data_files(os.path.join(ivf_path, "cells"))
    out["ivf_probe_fragmented_s"] = _min3(probe_ivf)
    compact_ivf_index(spark, ivf_path, target_file_bytes=target)
    vacuum_index(ivf_path, grace_sec=0.0)
    out["ivf_files_compacted"] = _data_files(os.path.join(ivf_path, "cells"))
    out["ivf_probe_compacted_s"] = _min3(probe_ivf)

    # ---- MinHash bands ----
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mh_path = os.path.join(root, "mh")
    spark.sql("DROP TABLE IF EXISTS cprobe_mh")
    write_minhash_index(
        docs.filter(F.col("doc_id") % n_batches == 0), "cprobe_mh", mh_path
    )
    for b in range(1, n_batches - 1):
        append_minhash_batch(
            docs.filter(F.col("doc_id") % n_batches == b), "cprobe_mh"
        )
    probe_docs = docs.filter(F.col("doc_id") % n_batches == n_batches - 1)

    def probe_mh():
        dedup_against_index(spark, probe_docs, "cprobe_mh").count()

    out["mh_files_fragmented"] = _data_files(mh_path)
    out["mh_probe_fragmented_s"] = _min3(probe_mh)
    old_loc = compact_minhash_index(spark, "cprobe_mh", os.path.join(root, "mh2"))
    shutil.rmtree(old_loc.removeprefix("file:"), ignore_errors=True)
    out["mh_files_compacted"] = _data_files(os.path.join(root, "mh2"))
    out["mh_probe_compacted_s"] = _min3(probe_mh)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
