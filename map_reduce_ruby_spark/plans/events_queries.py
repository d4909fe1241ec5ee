"""Event-stream queries (batch plans; streaming twins live in streaming/).

Timestamp discipline: events.ts is nanosecond parquet. The loader exposes
``ts_us`` (microseconds, = DuckDB ``epoch_us(ts)`` exactly) — all bucket and
gap arithmetic here is integer microsecond math so both engines agree to the
bit. See sources/tables.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions import cents_sum, cents_sum_sql, cents_sum_sql_double
from map_reduce_ruby_spark.plans.catalog import register
from map_reduce_ruby_spark.sources import load_table


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_start_s,
           event_type,
           COUNT(*) AS n_events,
           {cents_sum_sql('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
    doc="5-minute tumbling-window aggregation — the batch twin of the "
    "Structured Streaming window (streaming/windows.py). Bucketing is "
    "integer µs arithmetic; at scale this is a plain two-key aggregate with "
    "map-side partials.",
    tags=("events", "window", "streaming-twin"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket_start_s", F.expr("ts_us div 300000000") * 300)
        .groupBy("bucket_start_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), cents_sum("value", "total_value"))
    )


@register(
    "events_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts_us,
               CASE WHEN ts_us - lag(ts_us) OVER w > 600000000
                    OR lag(ts_us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="Sessionization via gap detection: lag() over (user, time), session "
    "break when idle > 10 min. One shuffle on user_id; skew handled by AQE. "
    "The streaming twin uses session_window() (streaming/windows.py).",
    tags=("events", "window", "session"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us", "event_id")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gapped = ev.withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > 600_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return gapped.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
    doc="Semi-structured JSON column: extract props.k, filter, aggregate — "
    "get_json_object stays JVM-side (no Python UDF).",
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_dau_rolling",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day_no,
               COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1
    )
    SELECT day_no, dau,
           CAST(SUM(dau) OVER (ORDER BY day_no
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS wau_sum
    FROM daily
    """,
    doc="Daily active users + 7-day rolling window over the daily series. "
    "The rolling frame runs over the tiny aggregated series, not raw events.",
    tags=("events", "window", "distinct"),
)
def events_dau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day_no", F.expr("ts_us div 86400000000"))
        .groupBy("day_no")
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    w = W.orderBy("day_no").rowsBetween(-6, W.currentRow)
    return daily.select(
        "day_no", "dau", F.sum("dau").over(w).cast("long").alias("wau_sum")
    )


@register(
    "events_multi_grain_rollup",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS hour_no,
               epoch_us(ts) // 86400000000 AS day_no,
               value
        FROM events
    )
    SELECT COALESCE(hour_no, -1) AS hour_no,
           COALESCE(day_no, -1) AS day_no,
           event_type,
           COUNT(*) AS n_events,
           {cents_sum_sql('value', 'total_value')}
    FROM base
    GROUP BY GROUPING SETS ((hour_no, day_no, event_type),
                            (day_no, event_type), (event_type))
    """,
    doc="Hypertable-style multi-grain time rollup: hourly, daily, and "
    "all-time aggregates per event type in ONE scan — GROUPING SETS expand "
    "once (a single Expand node) and feed a single shuffle of partial "
    "aggregates, instead of three passes over the fact table. Missing grain "
    "columns coalesce to a -1 sentinel. At 100 TB this is the continuous-"
    "aggregate pattern: the same plan incrementally maintained per window.",
    tags=("events", "rollup", "grouping-sets"),
)
def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_ruby_spark.sources import register_views

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_mg")
    return spark.sql(f"""
        WITH base AS (
            SELECT event_type,
                   ts_us div 3600000000 AS hour_no,
                   ts_us div 86400000000 AS day_no,
                   value
            FROM events_mg
        )
        SELECT COALESCE(hour_no, -1) AS hour_no,
               COALESCE(day_no, -1) AS day_no,
               event_type,
               COUNT(*) AS n_events,
               {cents_sum_sql_double('value', 'total_value')}
        FROM base
        GROUP BY GROUPING SETS ((hour_no, day_no, event_type),
                                (day_no, event_type), (event_type))
    """)


@register(
    "events_session_window_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts_us, event_id,
               CASE WHEN ts_us - lag(ts_us) OVER w > 600000000
                    OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
        -- running sum carries the SAME total order as the lag window
        -- (ts_us, event_id): without the tie-break, same-microsecond events
        -- could be enumerated either way and split one session into two
        SELECT user_id, ts_us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS last_event_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Batch session_window(): Spark's native session operator (10-minute "
    "gap) validated against a first-principles sessionizer — the oracle "
    "rebuilds sessions from lag() gap flags + a running sum, and every "
    "(user, session start, last event, count) row must agree. "
    "session_window merges per-event intervals inside the aggregate (one "
    "shuffle on user_id), the same operator Structured Streaming uses in "
    "streaming/windows.py — so batch and stream share sessionization "
    "semantics by construction.",
    tags=("events", "window", "session", "streaming-twin"),
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("event_time"), "ts_us"
    )
    return (
        ev.groupBy(F.session_window("event_time", "10 minutes").alias("sess"), "user_id")
        .agg(
            F.min("ts_us").cast("long").alias("session_start_us"),
            F.max("ts_us").cast("long").alias("last_event_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("sess")
    )


@register(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
               AS k_bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type, k_bucket
    """,
    doc="Semi-structured JSON via the VARIANT type (Spark 4): parse_json once "
    "into a binary variant, then typed variant_get extraction — the "
    "open-table-format-native path for schema-on-read columns, faster than "
    "re-parsing JSON text per extraction when many fields are pulled. "
    "Stays fully JVM-side; the oracle is plain json_extract.",
    tags=("events", "json", "variant"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.withColumn("k", F.variant_get(v, "$.k", "long"))
        .groupBy("event_type", (F.col("k") % 10).cast("long").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- count-min sketch heavy hitters -----------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row


@register(
    "cms_user_counts",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, COUNT(*) AS exact_cnt
        FROM events GROUP BY user_id
    ),
    keyed AS (
        SELECT user_id, exact_cnt, r,
               {{h}} % {_CMS_W} AS bucket
        FROM counts, UNNEST(range(0, {_CMS_D})) AS t(r)
    ),
    counters AS (
        SELECT r, bucket, CAST(SUM(exact_cnt) AS BIGINT) AS c
        FROM keyed GROUP BY r, bucket
    )
    SELECT k.user_id, k.exact_cnt AS exact_cnt,
           MIN(c.c) AS cms_est,
           MIN(c.c) >= k.exact_cnt AS is_overestimate
    FROM keyed k JOIN counters c ON k.r = c.r AND k.bucket = c.bucket
    GROUP BY k.user_id, k.exact_cnt
    """.format(
        h="(('0x' || substr(md5(CAST(100 + r AS VARCHAR) || ':' || "
        "CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT)::BIGINT"
    ),
    doc="Count-min sketch (Cormode-Muthukrishnan) per-user event counts: "
    "4 md5-derived hash rows x 64 buckets. The counter table is FIXED SIZE "
    "(d x w rows) no matter the corpus — the property that makes the sketch "
    "the 100 TB answer for approximate frequencies: partial counters merge "
    "by addition (one tiny shuffle), and the estimate is the min over rows, "
    "always >= the true count. The query emits exact vs estimate side by "
    "side plus the never-underestimates invariant as a checked column, so "
    "the oracle gates the sketch's defining guarantee, not just its values.",
    tags=("events", "sketch", "approx", "extension"),
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    from map_reduce_ruby_spark.functions import h32

    uid = F.col("user_id").cast("string")
    buckets = F.array(*[h32(uid, seed=100 + r) % _CMS_W for r in range(_CMS_D)])
    keyed = counts.select(
        "user_id", "exact_cnt", F.posexplode(buckets).alias("r", "bucket")
    ).select("user_id", "exact_cnt", F.col("r").cast("long").alias("r"), "bucket")
    counters = keyed.groupBy("r", "bucket").agg(F.sum("exact_cnt").alias("c"))
    return (
        keyed.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .withColumn("is_overestimate", F.col("cms_est") >= F.col("exact_cnt"))
    )


# --- funnel + retention (product-analytics staples) -------------------------


@register(
    "events_funnel_stages",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    s1 AS (
        SELECT user_id, MIN(ts_us) AS t1 FROM e
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts_us) AS t2
        FROM e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts_us > s1.t1
              AND e.ts_us <= s1.t1 + 43200000000
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts_us) AS t3
        FROM e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
              AND e.ts_us <= s2.t2 + 43200000000
        GROUP BY e.user_id
    )
    SELECT CAST(0 AS BIGINT) AS stage, COUNT(DISTINCT user_id) AS n_users FROM e
    UNION ALL
    SELECT CAST(1 AS BIGINT), COUNT(*) FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), COUNT(*) FROM s2
    UNION ALL
    SELECT CAST(3 AS BIGINT), COUNT(*) FROM s3
    """,
    doc="Ordered funnel analysis (signup -> click -> purchase, strictly "
    "increasing event times per user, each conversion within a 12-hour "
    "window): each stage is min-timestamp-after-previous-stage bounded by "
    "the conversion window — an equi-join on user_id plus a time-range "
    "predicate, the "
    "sequence-matching skeleton every product-analytics engine ships. All "
    "joins are keyed on user_id (one co-partitioned shuffle chain at "
    "scale); stages emit as (stage, n_users) rows via UNION ALL of "
    "independent aggregates, no scalar-subquery cross join.",
    tags=("events", "funnel", "extension"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + 43_200_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + 43_200_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    def stage(n, df):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(n).cast("long").alias("stage"), "n_users"
        )
    total = ev.agg(F.countDistinct("user_id").alias("n_users")).select(
        F.lit(0).cast("long").alias("stage"), "n_users"
    )
    return total.unionAll(stage(1, s1)).unionAll(stage(2, s2)).unionAll(stage(3, s3))


@register(
    "events_retention_cohorts",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, week FROM e
    )
    SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, a.week - c.cohort_week
    """,
    doc="Retention cohort matrix: users grouped by first-activity week, "
    "counted per (cohort_week, week_offset) of later activity — the "
    "standard retention triangle. Two aggregations and one user-keyed "
    "equi-join; every shuffle keys on user_id or the small (cohort, "
    "offset) pair. Weeks are integer epoch-week arithmetic, identical in "
    "both engines.",
    tags=("events", "retention", "extension"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts_us") / F.lit(86400000000)).cast("long").alias("day")
    )
    e = ev.select("user_id", (F.col("day") / 7).cast("long").alias("week"))
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = e.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- Incremental materialized-view refresh -----------------------------------

# The ORACLE computes the DIRECT aggregation over all events; the Spark side
# maintains the view INCREMENTALLY (base MV + delta). A hash match therefore
# proves the algebraic identity incremental refresh relies on — not just
# that two copies of the same plan agree. Shared by the batch query and its
# Structured Streaming twin (streaming_queries.streaming_mv_refresh).
MV_DIRECT_ORACLE = f"""
    SELECT epoch_us(ts) // 86400000000 AS day_no,
           event_type,
           COUNT(*) AS n_events,
           {cents_sum_sql('value', 'total_value')},
           MAX(CASE WHEN event_id % 10 = 7 THEN 1 ELSE 0 END) AS was_refreshed
    FROM events
    GROUP BY 1, 2
"""


def mv_grain_agg(df: DataFrame) -> DataFrame:
    """Aggregate events (needs a day_no column) to MV grain with ADDABLE
    partial state: row count + exact integer-cent sum. Shared by the batch
    refresh and its streaming twin."""
    return df.groupBy("day_no", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )


def mv_merge(base_mv: DataFrame, delta_mv: DataFrame) -> DataFrame:
    """Full-outer merge of two MV partial states: counts add, cent-sums add
    (both are addable partials, so the merge is exact; division to currency
    happens only here, after the last addition)."""
    b, d = base_mv.alias("b"), delta_mv.alias("d")
    merged = b.join(
        d,
        (F.col("b.day_no") == F.col("d.day_no"))
        & (F.col("b.event_type") == F.col("d.event_type")),
        "full_outer",
    )
    return merged.select(
        F.coalesce(F.col("b.day_no"), F.col("d.day_no")).alias("day_no"),
        F.coalesce(F.col("b.event_type"), F.col("d.event_type")).alias("event_type"),
        (
            F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n_events"),
        (
            (
                F.coalesce(F.col("b.cents"), F.lit(0))
                + F.coalesce(F.col("d.cents"), F.lit(0))
            ).cast("double")
            / 100.0
        ).alias("total_value"),
        F.when(F.col("d.day_no").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("was_refreshed"),
    )


@register(
    "mv_incremental_refresh",
    oracle=MV_DIRECT_ORACLE,
    doc="Incremental materialized-view maintenance for a daily "
    "(day, event_type) rollup: the base MV (events with event_id % 10 <> 7 "
    "— the already-ingested set) is refreshed with a late-arriving delta "
    "batch (% 10 = 7) by aggregating ONLY the delta at view grain and "
    "full-outer-merging the two partial states — counts add, cent-sums "
    "add — never rescanning the base fact table. The DuckDB oracle "
    "recomputes the view directly from all events, so the hash match "
    "verifies the incremental path against ground truth. Scale: refresh "
    "cost tracks the DELTA size (one small agg + one merge join on the "
    "view key), which is what makes a 100 TB fact table's hourly view "
    "refresh affordable; cent-integer partials make add-merge exact.",
    tags=("events", "mv", "incremental", "extension"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day_no", F.expr("ts_us div 86400000000")
    )
    base_mv = mv_grain_agg(ev.filter(F.col("event_id") % 10 != 7))
    delta_mv = mv_grain_agg(ev.filter(F.col("event_id") % 10 == 7))
    return mv_merge(base_mv, delta_mv)


# --- Time-series gap fill + forward fill -------------------------------------


@register(
    "events_gap_fill_ffill",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day_no,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events WHERE value >= 195 GROUP BY 1, 2
    ),
    spine AS (
        SELECT b.event_type, CAST(d.d AS BIGINT) AS day_no
        FROM (
            SELECT event_type,
                   epoch_us(MIN(ts)) // 86400000000 AS lo,
                   epoch_us(MAX(ts)) // 86400000000 AS hi
            FROM events GROUP BY event_type
        ) b, UNNEST(range(b.lo, b.hi + 1)) AS d(d)
    ),
    joined AS (
        SELECT s.event_type, s.day_no, d.cents,
               COUNT(d.cents) OVER (PARTITION BY s.event_type ORDER BY s.day_no
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS grp
        FROM spine s LEFT JOIN daily d
          ON d.event_type = s.event_type AND d.day_no = s.day_no
    )
    SELECT event_type, day_no,
           CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS is_gap,
           COALESCE(CAST(MAX(cents) OVER (PARTITION BY event_type, grp)
                         AS DOUBLE) / 100.0, -1.0) AS filled_value
    FROM joined
    """,
    doc="Time-series gap filling with forward fill: the sparse daily "
    "high-value revenue series (value >= 195) is densified onto each "
    "event_type's own [min_day, max_day] spine (per-group sequence + "
    "explode — NO cross join, so nothing quadratic), and missing days carry "
    "the last observed value forward via the count-of-non-nulls group trick "
    "(grp = running non-null count; every null shares its grp with the "
    "last observation; MAX over (type, grp) broadcasts it) — plain window "
    "functions, portable across engines, no IGNORE NULLS dependency. Days "
    "before the first observation fill with -1. Scale: one shuffle on "
    "event_type for spine+windows; the spine is O(groups x days), "
    "generated, never materialized wide.",
    tags=("events", "timeseries", "gapfill", "window", "extension"),
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value") >= 195)
        .withColumn("day_no", F.expr("ts_us div 86400000000"))
        .groupBy("event_type", "day_no")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    bounds = ev.groupBy("event_type").agg(
        F.expr("min(ts_us) div 86400000000").alias("lo"),
        F.expr("max(ts_us) div 86400000000").alias("hi"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_no"),
    )
    joined = spine.join(daily, ["event_type", "day_no"], "left")
    w_run = (
        W.partitionBy("event_type")
        .orderBy("day_no")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    grouped = joined.withColumn("grp", F.count("cents").over(w_run))
    w_grp = W.partitionBy("event_type", "grp")
    return grouped.select(
        "event_type",
        "day_no",
        F.when(F.col("cents").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
        F.coalesce(
            F.max("cents").over(w_grp).cast("double") / 100.0, F.lit(-1.0)
        ).alias("filled_value"),
    )


# --- Rolling distinct via HLL sketch union -----------------------------------


@register(
    "approx_rolling_dau_hll",
    oracle="""
    WITH ev AS (
        SELECT epoch_us(ts) // 86400000000 AS day_no, user_id FROM events
    ),
    days AS (SELECT DISTINCT day_no FROM ev),
    contrib AS (
        SELECT CAST(t.t AS BIGINT) AS target_day, user_id
        FROM ev, UNNEST(range(ev.day_no, ev.day_no + 7)) AS t(t)
    )
    SELECT c.target_day AS day_no,
           COUNT(DISTINCT c.user_id) AS exact_dau7,
           TRUE AS hll_within_bounds
    FROM contrib c JOIN days d ON d.day_no = c.target_day
    GROUP BY c.target_day
    """,
    doc="Rolling 7-day distinct users via HLL sketch UNION — the "
    "mergeability demo that is the whole point of sketches at 100 TB: one "
    "fixed-size sketch per day is built ONCE (hll_sketch_agg), and every "
    "rolling window is a cheap hll_union_agg over 7 sketches instead of a "
    "7x re-scan with a giant COUNT(DISTINCT) state (contrast "
    "events_dau_rolling, whose wau_sum adds daily counts and so "
    "double-counts returning users). Sketch bytes are engine-specific, so "
    "the gated surface is (exact 7-day distinct, bounds flag): the exact "
    "twin explodes each event to the 7 windows it serves, and the flag "
    "asserts |estimate-exact|/exact <= 5% (lgK=12, ~1.6% RSE — 3 sigma). "
    "A drifting union estimate flips the flag and fails the hash gate.",
    tags=("events", "sketch", "approx", "window", "extension"),
)
def approx_rolling_dau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts_us div 86400000000").alias("day_no"), "user_id"
    )
    days = ev.select("day_no").distinct()
    daily_sk = ev.groupBy("day_no").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    contrib = daily_sk.select(
        F.explode(F.sequence(F.col("day_no"), F.col("day_no") + 6)).alias(
            "target_day"
        ),
        "sk",
    ).join(days.select(F.col("day_no").alias("target_day")), "target_day")
    est = contrib.groupBy("target_day").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est")
    )
    exact = (
        ev.select(
            F.explode(F.sequence(F.col("day_no"), F.col("day_no") + 6)).alias(
                "target_day"
            ),
            "user_id",
        )
        .join(days.select(F.col("day_no").alias("target_day")), "target_day")
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").alias("exact_dau7"))
    )
    return est.join(exact, "target_day").select(
        F.col("target_day").alias("day_no"),
        "exact_dau7",
        (
            F.abs(F.col("est") - F.col("exact_dau7"))
            / F.col("exact_dau7")
            <= 0.05
        ).alias("hll_within_bounds"),
    )


@register(
    "events_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day_no,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1
    )
    SELECT day_no,
           CAST(cents AS DOUBLE) / 100.0 AS day_value,
           ROUND(quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.5) OVER (
               ORDER BY day_no ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS rolling_median7
    FROM daily
    """,
    doc="Rolling 7-day median of daily revenue: an exact percentile used as "
    "a WINDOW function over the aggregated series — the robust-baseline "
    "smoother (median ignores single-day spikes that wreck a rolling "
    "mean). Spark percentile() and DuckDB quantile_cont share the (n-1)q "
    "linear-interpolation definition, and each 7-row frame sorts at most 7 "
    "exact integer-cent values, so the result is bit-stable. Scale: the "
    "window runs over the tiny POST-aggregation series (one row per day — "
    "the same bounded-global-window rule as events_dau_rolling); the heavy "
    "scan collapses in the daily cents aggregate with map-side partials.",
    tags=("events", "window", "percentile", "extension"),
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day_no", F.expr("ts_us div 86400000000"))
        .groupBy("day_no")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    day_value = F.col("cents").cast("double") / 100.0
    w = W.orderBy("day_no").rowsBetween(-6, W.currentRow)
    return daily.select(
        "day_no",
        day_value.alias("day_value"),
        F.round(F.expr("percentile(CAST(cents AS DOUBLE) / 100.0, 0.5)").over(w), 6).alias(
            "rolling_median7"
        ),
    )


@register(
    "events_attribution_last_touch",
    oracle="""
    WITH ordered AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_click_ts
        FROM events
    )
    SELECT event_id, user_id,
           COALESCE(ts_us - last_click_ts, -1) AS gap_us,
           CASE WHEN last_click_ts IS NOT NULL
                 AND ts_us - last_click_ts <= 600000000
                THEN 1 ELSE 0 END AS attributed
    FROM ordered
    WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution: each purchase is attributed to the user's "
    "most recent STRICTLY-PRECEDING click when the gap is <= 10 minutes — "
    "the marketing-analytics staple, expressed as a conditional MAX carried "
    "forward over the per-user event timeline (frame ends at 1 PRECEDING "
    "so a same-microsecond click does not attribute to itself; ordering "
    "tie-breaks on event_id). One shuffle on user_id, same scale shape as "
    "sessionization; unattributed purchases report gap -1. The window form "
    "replaces the naive per-purchase as-of self-join (which would shuffle "
    "the table once per funnel stage).",
    tags=("events", "attribution", "window", "asof", "extension"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts_us"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts_us"))
    ).over(w)
    flagged = ev.withColumn("last_click_ts", last_click).filter(
        F.col("event_type") == "purchase"
    )
    gap = F.col("ts_us") - F.col("last_click_ts")
    return flagged.select(
        "event_id",
        "user_id",
        F.coalesce(gap, F.lit(-1)).alias("gap_us"),
        F.when(
            F.col("last_click_ts").isNotNull() & (gap <= 600_000_000), 1
        )
        .otherwise(0)
        .alias("attributed"),
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day_no,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT day_no, cents,
               COUNT(*) OVER w AS n,
               SUM(CAST(cents AS DECIMAL(38,0))) OVER w AS s,
               SUM(CAST(cents AS DECIMAL(38,0))
                   * CAST(cents AS DECIMAL(38,0))) OVER w AS sq
        FROM daily
        WINDOW w AS (ORDER BY day_no ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT day_no, cents, n,
               (CAST(sq AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / GREATEST(n, 1))
                   / GREATEST(n - 1, 1) AS var,
               CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / GREATEST(n, 1) AS dev
        FROM stats
    )
    SELECT day_no,
           CAST(cents AS DOUBLE) / 100.0 AS day_value,
           CASE WHEN n >= 3 AND var > 0.0
                THEN ROUND(dev / sqrt(var), 6)
           ELSE -999.0 END AS zscore,
           CASE WHEN n >= 3 AND var > 0.0 AND abs(dev / sqrt(var)) > 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM scored
    """,
    doc="Daily-revenue anomaly detection: z-score of each day against the "
    "TRAILING week (frame ends at 1 PRECEDING — the day under test never "
    "contaminates its own baseline), flagging |z| > 2. Mean and sample "
    "variance come from exact integer windowed moments (SUM and "
    "SUM-of-squares of cents — the same order-independence rule as "
    "stats_moments_corr, applied per frame), so the floats are one fixed "
    "expression over exact inputs and hash-match. Days with under 3 "
    "baseline points or zero variance emit the -999 sentinel (NaN breaks "
    "the exact compare). Scale: windows over the "
    "bounded post-aggregation series; this is the data-quality monitor a "
    "100 TB ingest runs on its OWN output volumes every load.",
    tags=("events", "anomaly", "window", "statistics", "extension"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day_no", F.expr("ts_us div 86400000000"))
        .groupBy("day_no")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w = W.orderBy("day_no").rowsBetween(-7, -1)
    dec = F.col("cents").cast("decimal(38,0)")
    stats = daily.select(
        "day_no",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dec).over(w).alias("s"),
        F.sum(dec * dec).over(w).alias("sq"),
    )
    # moments accumulate in DECIMAL(38,0) (cents^2 overflows int64 a few SF
    # decades up — same exactness rule as stats_moments_corr); variance and
    # the positivity guard run in double on BOTH engines
    # GREATEST clamps: the first frame has n = 0 and ANSI division now
    # evaluates inside the guard itself; clamped values are only ever READ
    # when n >= 3, where the clamp is a no-op (both engines identical)
    n_safe = F.greatest(F.col("n"), F.lit(1))
    mean = F.col("s").cast("double") / n_safe
    var = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / n_safe
    ) / F.greatest(F.col("n") - 1, F.lit(1))
    z = (F.col("cents").cast("double") - mean) / F.sqrt(var)
    ok = (F.col("n") >= 3) & (var > 0.0)
    return stats.select(
        "day_no",
        (F.col("cents").cast("double") / 100.0).alias("day_value"),
        F.when(ok, F.round(z, 6)).otherwise(F.lit(-999.0)).alias("zscore"),
        F.when(ok & (F.abs(z) > 2.0), 1).otherwise(0).alias("is_anomaly"),
    )


@register(
    "events_value_histogram",
    oracle=f"""
    SELECT LEAST(CAST(floor(value / 25.0) AS BIGINT), 19) AS bucket,
           ROUND(LEAST(CAST(floor(value / 25.0) AS BIGINT), 19) * 25.0, 1)
               AS bucket_lo,
           COUNT(*) AS n_events,
           {cents_sum_sql('value', 'bucket_value')}
    FROM events
    GROUP BY 1, 2
    """,
    doc="Equal-width histogram of event values (20 buckets of width 25, "
    "top bucket open-ended): the distribution-shape profile next to "
    "lineitem_profile's min/max/distinct — what a data-quality monitor "
    "plots per ingest. Bucketing is portable floor arithmetic (no "
    "width_bucket dialect differences); per-bucket value mass uses the "
    "exact cents rule. Scale: scan-side bucket projection, one 20-group "
    "aggregate with map-side partials — the cheapest possible full-table "
    "profile.",
    tags=("events", "histogram", "profiling", "extension"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0).cast("long"), F.lit(19))
    return (
        ev.select(
            bucket.alias("bucket"),
            F.round(bucket * 25.0, 1).alias("bucket_lo"),
            "value",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_events"), cents_sum("value", "bucket_value"))
    )
