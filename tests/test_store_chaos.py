"""Interleaved two-process chaos over the shared artifact-store protocol
(operators/artifact_store.py): appends racing compaction racing vacuum
from two REAL Spark processes under randomized schedules.

Round 9's crash-injection suite proved every SINGLE operation recovers;
this pins the remaining frontier — concurrent MIXED maintenance. The
protocol's claim (lock-serialized writers, CAS before irreversible
commits, retired-stamp grace windows) means a random interleaving of
{append, compact, vacuum, read} from two processes must leave:

- every read taken BETWEEN ops green (loadable, non-empty, consistent);
- every batch id committed exactly once (no drop, no double-append);
- the final maintained model MULTISET-equal to a from-scratch retrain
  over base ∪ every batch — the additive-statistics equality the NB
  store is gated on (text_nb_persisted), which any lost/duplicated/torn
  generation would break.

The NB store is the subject because its equality oracle is exact and
cheap; the machinery under test (_AppendLock, _verify_meta_unchanged,
_compact_data_root, vacuum_index) is the SHARED protocol every
per-ingest store runs on.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The child process: builds its op schedule from the SAME rules as the
# parent (appends in fixed order, compact/vacuum/read shuffled in at
# seeded-random positions) and runs it against the shared model path.
_CHILD = """\
import sys; sys.path.insert(0, {repo!r})
import json, random
from map_reduce_ruby_spark.session import get_spark
from pyspark.sql import functions as F
from map_reduce_ruby_spark.operators.artifact_store import vacuum_index
from map_reduce_ruby_spark.operators.nb_store import (
    append_nb_batch, compact_nb_model, load_nb_model,
)

spark = get_spark(app_name="chaos_child", shuffle_partitions=4)
sf_dir, path, seed = {sf_dir!r}, {path!r}, {seed}
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet").select(
    "doc_id", "lang", "text")
part = F.col("doc_id") % 8

rng = random.Random(seed * 31 + 7)
ops = [("append", i) for i in (1, 3, 5)]
for extra in ("compact", "vacuum", "read", "read"):
    ops.insert(rng.randrange(len(ops) + 1), (extra, None))
reads_ok = 0
for op, i in ops:
    if op == "append":
        append_nb_batch(
            spark, docs.filter(part == 2 + i), path, batch_id=f"b{{i}}")
    elif op == "compact":
        compact_nb_model(spark, path)
    elif op == "vacuum":
        vacuum_index(path, grace_sec=3600.0)
    else:
        counts, class_docs, _meta = load_nb_model(spark, path)
        assert counts.count() > 0 and class_docs.count() > 0
        reads_ok += 1
print("SUMMARY " + json.dumps({{"reads_ok": reads_ok}}))
"""


# seed 11 is the default-run smoke; the second schedule is slow breadth
@pytest.mark.parametrize(
    "seed", [11, pytest.param(23, marks=pytest.mark.slow)]
)
def test_interleaved_maintenance_two_processes(spark, sf_dir, tmp_path, seed):
    from map_reduce_ruby_spark.operators.artifact_store import (
        read_index_meta,
        vacuum_index,
    )
    from map_reduce_ruby_spark.operators.nb_store import (
        append_nb_batch,
        compact_nb_model,
        load_nb_model,
        write_nb_model,
    )
    from map_reduce_ruby_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    part = F.col("doc_id") % 8
    path = str(tmp_path / "nb_chaos")
    # base model from slices 0-1; batches b0..b5 cover slices 2..7, so
    # base ∪ all batches == the WHOLE corpus — the retrain twin below is
    # simply write_nb_model(docs).
    write_nb_model(spark, docs.filter(part < 2), path, 64)

    fd, script = tempfile.mkstemp(suffix="_chaos.py")
    os.write(
        fd, _CHILD.format(repo=REPO, sf_dir=sf_dir, path=path, seed=seed).encode()
    )
    os.close(fd)
    proc = subprocess.Popen(
        [sys.executable, script],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # the parent's schedule runs CONCURRENTLY with the child's
        rng = random.Random(seed)
        ops = [("append", i) for i in (0, 2, 4)]
        for extra in ("compact", "vacuum", "read", "read"):
            ops.insert(rng.randrange(len(ops) + 1), (extra, None))
        for op, i in ops:
            if op == "append":
                append_nb_batch(
                    spark, docs.filter(part == 2 + i), path, batch_id=f"b{i}"
                )
            elif op == "compact":
                compact_nb_model(spark, path)
            elif op == "vacuum":
                vacuum_index(path, grace_sec=3600.0)
            else:
                counts, class_docs, _meta = load_nb_model(spark, path)
                assert counts.count() > 0 and class_docs.count() > 0
        out, err = proc.communicate(timeout=420)
    finally:
        if proc.poll() is None:
            proc.kill()
        os.remove(script)
    assert proc.returncode == 0, err[-3000:]
    lines = [l for l in out.splitlines() if l.startswith("SUMMARY ")]
    assert len(lines) == 1, out
    assert json.loads(lines[0][len("SUMMARY "):])["reads_ok"] == 2

    # every batch committed exactly once, regardless of interleaving
    meta = read_index_meta(path)
    assert sorted(meta["batch_ids"]) == [f"b{i}" for i in range(6)]

    # quiescent OPTIMIZE + zero-grace VACUUM, then the exactness gate:
    # the chaos-maintained model must equal a from-scratch retrain over
    # the whole corpus, statistic for statistic.
    compact_nb_model(spark, path)
    vacuum_index(path, grace_sec=0.0)
    counts, class_docs, _ = load_nb_model(spark, path)
    got = (
        sorted(map(tuple, counts.collect())),
        sorted(map(tuple, class_docs.collect())),
    )
    ref_path = str(tmp_path / "nb_retrain")
    write_nb_model(spark, docs, ref_path, 64)
    ref_counts, ref_cd, _ = load_nb_model(spark, ref_path)
    want = (
        sorted(map(tuple, ref_counts.collect())),
        sorted(map(tuple, ref_cd.collect())),
    )
    assert got == want
