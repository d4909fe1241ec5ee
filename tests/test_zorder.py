"""Z-order layout: files become (a, b) rectangles, so parquet footer min/max
stats prune a 2-D box query down to a few files — versus a single-column sort
layout where the secondary dimension prunes nothing."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from map_reduce_ruby_spark.operators import interleave_bits, zorder_by
from map_reduce_ruby_spark.sources import load_table

N_FILES = 16


def _files_touched(path: str, a_col: str, a_lo, a_hi, b_col: str, b_lo, b_hi) -> tuple[int, int]:
    """(#files whose [min,max] stats intersect the box, #files total) — the
    same footer-stats decision a parquet reader's row-group pruning makes."""
    touched, total = 0, 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        amin = min(md.row_group(i).column(_col_idx(md, a_col)).statistics.min for i in range(md.num_row_groups))
        amax = max(md.row_group(i).column(_col_idx(md, a_col)).statistics.max for i in range(md.num_row_groups))
        bmin = min(md.row_group(i).column(_col_idx(md, b_col)).statistics.min for i in range(md.num_row_groups))
        bmax = max(md.row_group(i).column(_col_idx(md, b_col)).statistics.max for i in range(md.num_row_groups))
        if amax >= a_lo and amin <= a_hi and bmax >= b_lo and bmin <= b_hi:
            touched += 1
    return touched, total


def _col_idx(md, name: str) -> int:
    for i in range(md.num_columns):
        if md.row_group(0).column(i).path_in_schema == name:
            return i
    raise KeyError(name)


def test_interleave_bits_orders_rectangles(spark):
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3), (1, 1)], "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", interleave_bits(F.col("a"), F.col("b"), bits=2)).collect()
    }
    # bit-interleave of (a,b) with b in the odd bits: z = a0 + 2*b0 + 4*a1 + 8*b1
    assert got == {(0, 0): 0, (3, 0): 5, (0, 3): 10, (3, 3): 15, (1, 1): 3}


def test_zorder_prunes_2d_box(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", (F.col("o_totalprice").cast("long")).alias("price")
    )
    # Wide on the 1-D layout's sort key, selective on the SECONDARY dim —
    # the box shape a single-column sort cannot prune at all.
    lo_c, hi_c = 0, 10**9
    lo_p, hi_p = 50000, 60000

    linear = str(tmp_path / "linear")
    orders.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(linear)
    zpath = str(tmp_path / "zorder")
    zorder_by(orders, "o_custkey", "price", N_FILES).write.parquet(zpath)

    # identical content, different placement
    assert (
        spark.read.parquet(zpath).agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )

    z_touched, z_total = _files_touched(zpath, "o_custkey", lo_c, hi_c, "price", lo_p, hi_p)
    l_touched, l_total = _files_touched(linear, "o_custkey", lo_c, hi_c, "price", lo_p, hi_p)
    assert z_total >= N_FILES // 2 and l_total >= N_FILES // 2
    # the box must actually select rows
    n = orders.filter(
        F.col("o_custkey").between(lo_c, hi_c) & F.col("price").between(lo_p, hi_p)
    ).count()
    assert n > 0
    # the 1-D layout reads everything; z-order prunes to a file minority
    assert l_touched == l_total, (l_touched, l_total)
    assert z_touched <= z_total // 2, (z_touched, z_total)
