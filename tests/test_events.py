"""Event operators: batch/streaming parity for windowed aggregation."""

import datetime as dt

import pyspark.sql.functions as F

from kgx_spark.operators.events import sessionize, windowed_counts


def _events(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0),
        (2, base + dt.timedelta(minutes=10), 7, "click", 2.0),
        (3, base + dt.timedelta(minutes=70), 7, "view", 3.0),
        (4, base + dt.timedelta(minutes=75), 8, "click", 4.0),
        (5, base + dt.timedelta(hours=3), 7, "click", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_windowed_counts_batch(spark):
    out = windowed_counts(_events(spark), "1 hour").orderBy("window_start", "event_type").collect()
    got = [(r["window_start"].hour, r["event_type"], r["n_events"], r["sum_value_1e2"]) for r in out]
    assert got == [
        (0, "click", 2, 300),
        (1, "click", 1, 400),
        (1, "view", 1, 300),
        (3, "click", 1, 500),
    ]


def test_sessionize_gap(spark):
    out = sessionize(_events(spark), gap_minutes=30)
    rows = {(r["user_id"], r["session_seq"]): r["n_events"] for r in out.collect()}
    # user 7: events at 0:00/0:10 (one session), 1:10, 4:00 → 3 sessions
    assert rows[(7, 1)] == 2 and rows[(7, 2)] == 1 and rows[(7, 3)] == 1
    assert rows[(8, 1)] == 1


def test_windowed_counts_streaming(spark, tmp_path):
    """Same expression tree runs as a Structured Streaming query with a
    watermark (availableNow trigger drains the directory then stops)."""
    src = tmp_path / "events_in"
    src.mkdir()
    _events(spark).coalesce(1).write.mode("overwrite").json(str(src / "drop1"))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).json(str(src / "drop1"))
    )
    agg = windowed_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    # append mode emits only windows the watermark has closed: max event time
    # 3:00 − 2h watermark = 1:00 → only the 0:00-1:00 window is final
    assert got == {(0, "click"): 2}
