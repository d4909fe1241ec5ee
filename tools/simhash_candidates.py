"""Measure SimHash candidate-pair volume: disjoint adaptive bands vs the
6 cyclic 20-bit windows (bit-sampled tables), at any sf_dir.

The decision-rule evidence the SCALING.md decade table records: both schemes
are COMPLETE for hamming <= 2 (pigeonhole over 3 disjoint bands; covering
design over 6 overlapping windows), so the scheme choice is purely a
candidate-volume / extensibility trade. This tool prints, per scheme, the
exact number of within-bucket pairs candidate generation would emit
(sum over buckets of C(occupancy, 2), before cross-table dedup) plus the
post-dedup distinct pair count.

Usage: python tools/simhash_candidates.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from map_reduce_ruby_spark.plans.dedup_queries import (
        _SH_BS_BITS,
        _SH_BS_STEP,
        _SH_BS_TABLES,
        _SH_NBANDS,
        _SH_WIDTH,
        _simhash_band_width,
        _simhash_sig_df,
    )
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="simhash-candidates", shuffle_partitions=32)
    sig = _simhash_sig_df(spark, sf_dir, width=_SH_WIDTH).select("doc_id", "simhash")
    sig = sig.localCheckpoint()  # one tokenize+hash pass, reused by both schemes
    n = sig.count()
    bw = _simhash_band_width(n)
    out = {"sf_dir": sf_dir, "n_docs": n, "band_width": bw}

    def volume(keys):
        """keys: list of (table_idx, key_col_expr). Returns (within-bucket
        pair volume, distinct candidate pairs after cross-table dedup)."""
        tabs = None
        for t, expr in keys:
            part = sig.select(
                "doc_id", F.lit(t).alias("tab"), expr.alias("k")
            )
            tabs = part if tabs is None else tabs.unionByName(part)
        occ = tabs.groupBy("tab", "k").agg(F.count(F.lit(1)).alias("c"))
        vol = occ.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("v")
        ).collect()[0].v
        a, b = tabs.alias("a"), tabs.alias("b")
        distinct_pairs = (
            a.join(
                b,
                (F.col("a.tab") == F.col("b.tab"))
                & (F.col("a.k") == F.col("b.k"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        return int(vol or 0), int(distinct_pairs)

    mask = (1 << bw) - 1
    banded = [
        (t, F.shiftright("simhash", bw * t).bitwiseAND(mask))
        for t in range(_SH_NBANDS)
    ]
    out["banded_volume"], out["banded_distinct_pairs"] = volume(banded)

    bs_mask = (1 << _SH_BS_BITS) - 1
    cyc = [
        (
            t,
            (
                F.shiftright("simhash", _SH_BS_STEP * t).bitwiseOR(
                    F.shiftleft(
                        F.col("simhash").bitwiseAND(
                            F.lit((1 << (_SH_BS_STEP * t)) - 1)
                        ),
                        _SH_WIDTH - _SH_BS_STEP * t,
                    )
                )
            ).bitwiseAND(bs_mask),
        )
        for t in range(_SH_BS_TABLES)
    ]
    out["bitsample_volume"], out["bitsample_distinct_pairs"] = volume(cyc)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
