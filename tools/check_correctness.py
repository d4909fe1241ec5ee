"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB over the same
parquet tables, then compares: row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, exact equality). Exact equality
predicts the driver's value-hash check.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # In-memory DuckDB cannot spill without an explicit temp_directory, so
    # big-SF oracle runs (sf30 BPE training rebuilt in SQL) die with
    # "Out of Memory Error" instead of offloading; give it a spill dir and
    # cap memory at ~40% of PHYSICAL RAM (not a fixed number — a fixed
    # 48GB would exceed RAM on smaller hosts and trade DuckDB's clean
    # spill for a kernel OOM kill), leaving headroom for the co-resident
    # Spark JVM.
    con.sql("SET temp_directory = '/tmp/duckdb_oracle_spill'")
    try:
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        con.sql(f"SET memory_limit = '{max(2, int(total_gb * 0.4))}GB'")
    except (ValueError, OSError):
        pass  # platform without sysconf: keep DuckDB's default (80% of RAM)
    from map_reduce_ruby_spark.sources import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        # unify integer widths and decimal->float for comparison
        if str(df[c].dtype) in ("int8", "int16", "int32", "int64", "uint32", "uint64", "Int64"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], __import__("decimal").Decimal):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if len(s) == len(o):
        for c in s.columns:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                eq = np.array_equal(sv.astype("float64"), ov.astype("float64"))
                close = np.allclose(
                    sv.astype("float64"), ov.astype("float64"), rtol=1e-9, atol=1e-12, equal_nan=True
                )
                if not eq:
                    problems.append(
                        f"col {c}: exact float mismatch"
                        + (" (but allclose — hash WILL fail)" if close else " (value-level diff)")
                    )
            else:
                if not (sv == ov).all():
                    bad = int((sv != ov).sum())
                    problems.append(f"col {c}: {bad} mismatched values e.g. {sv[sv != ov][:3]} vs {ov[sv != ov][:3]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from map_reduce_ruby_spark.plans import all_entries
    from map_reduce_ruby_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    con = oracle_connection(sf_dir)

    entries = all_entries()
    failures = []
    for name, entry in entries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = entry.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if entry.oracle is None:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            oracle_pdf = con.sql(entry.oracle).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} vs {len(oracle_pdf)} rows):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")
    ran = [n for n in entries if not only or n in only]
    print(f"\n{len(ran) - len(failures)}/{len(ran)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
