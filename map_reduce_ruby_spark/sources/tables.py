"""Parquet table loaders for the synthetic star schema (TESTDATA.md).

The reference has no sources at all — its user-supplied ``map`` doubles as the
connector (reference README.md:35-41 fetches a URL inside map). Here sources
are first-class: ``spark.read.parquet`` gives columnar scans with predicate
pushdown and column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Oracle comparisons require UTC: DuckDB is timezone-naive, and several
    # catalog queries go through session-TZ-dependent functions
    # (unix_timestamp, date_format, timestamp_ntz casts). session.get_spark
    # pins UTC at build, but a caller's session may not — most dangerously,
    # an unset session inherits the JVM's LOCAL timezone. The conf is
    # runtime-settable, so pin it here, and say so when that actually
    # changes something the caller may have set deliberately.
    try:
        current = spark.conf.get("spark.sql.session.timeZone", "")
        if current != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            if current:
                import warnings

                warnings.warn(
                    f"load_table pinned spark.sql.session.timeZone to UTC "
                    f"(was {current!r}): catalog results are defined in UTC",
                    stacklevel=2,
                )
    except Exception as e:  # e.g. a connect session with read-only conf
        import warnings

        warnings.warn(
            f"could not pin session timeZone to UTC ({e}); timestamp-derived "
            "results may not match the UTC-defined oracle",
            stacklevel=2,
        )
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's timestamp type
        # rejects; nanosAsLong makes it arrive as a raw nanos bigint. The conf
        # is runtime-settable, so set it here too — the caller's session (e.g.
        # the driver's) may not have been built by session.get_spark.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # fall through; the dtype branch below handles either form
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Expose: ts_ns (exact nanos), ts_us (= DuckDB epoch_us(ts) — same
        # ns -> µs truncation), and ts as a real microsecond timestamp.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":  # nanos-as-long
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns div 1000"))
                .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            )
        else:  # engine already delivered a (truncated) timestamp
            df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp"))).withColumn(
                "ts_ns", F.col("ts_us") * 1000
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so catalog queries can use spark.sql."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def table_fingerprint(sf_dir: str, name: str = "documents") -> str:
    """Content fingerprint for caching artifacts DERIVED from a fixture
    table (persisted indexes, chunk drop directories): md5 over the table's
    absolute path plus every data file's (name, size, mtime_ns). If the
    fixture at sf_dir is regenerated, the fingerprint changes, so a stale
    cache under /tmp can never silently serve results derived from the old
    data — the failure mode a path-only tag had."""
    import hashlib

    path = os.path.join(sf_dir, f"{name}.parquet")
    parts = [os.path.abspath(path)]
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(
            os.path.join(path, f)
            for f in (os.listdir(path) if os.path.isdir(path) else [])
            if not f.startswith((".", "_"))
        )
    )
    if not files:
        # A path-only tag would resurrect exactly the stale-cache failure
        # this fingerprint exists to prevent (caller fingerprints before
        # the fixture exists, then the fixture lands, and the cache key
        # never changes) — refuse instead.
        raise FileNotFoundError(
            f"table_fingerprint({sf_dir!r}, {name!r}): no data files under "
            f"{path!r}; generate the fixture before fingerprinting"
        )
    for f in files:
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]
