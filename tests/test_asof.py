"""As-of join correctness vs pandas merge_asof (an independent reference
implementation) on the events table."""

from __future__ import annotations

import pandas as pd
import pytest

from map_reduce_ruby_spark.operators import asof_join
from map_reduce_ruby_spark.sources import load_table


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["ts_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    return pdf


def test_asof_matches_pandas_merge_asof(spark, sf_dir, events_pdf):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts_us", "event_type", "value")
    purchases = ev.filter(ev.event_type == "purchase").select(
        "user_id", "ts_us", ev.event_id.alias("p_id"), ev.value.alias("p_value")
    )
    got = (
        asof_join(
            ev.select("event_id", "user_id", "ts_us"),
            purchases,
            on="user_id",
            left_ts="ts_us",
            right_ts="ts_us",
            suffix="",
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    left = events_pdf[["event_id", "user_id", "ts_us"]].sort_values("ts_us")
    right = (
        events_pdf[events_pdf.event_type == "purchase"][["user_id", "ts_us", "event_id", "value"]]
        .rename(columns={"event_id": "p_id", "value": "p_value"})
        .sort_values("ts_us")
    )
    expected = (
        pd.merge_asof(left, right, on="ts_us", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    assert len(got) == len(expected) == len(events_pdf)
    merged = got.merge(expected, on="event_id", suffixes=("_got", "_exp"))
    assert (merged["p_id_got"].fillna(-1) == merged["p_id_exp"].fillna(-1)).all()
    assert (merged["p_value_got"].fillna(0) == merged["p_value_exp"].fillna(0)).all()


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 100), (1, 50)], ["k", "t"])
    right = spark.createDataFrame([(1, 75, "x")], ["k", "t", "payload"])
    out = {
        r.t: r.payload_asof
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    }
    assert out == {100: "x", 50: None}


def test_asof_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([(1, 75)], ["k", "t"])
    right = spark.createDataFrame([(1, 75, "same-instant")], ["k", "t", "payload"])
    (row,) = asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    assert row.payload_asof == "same-instant"
