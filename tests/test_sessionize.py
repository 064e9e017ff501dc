"""Session-window semantics pins for q_events_sessionize's oracle: the
gaps-and-islands SQL must split sessions with STRICT > gap because Spark's
session_window merges an event landing exactly at last_event + gap."""

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_session_window_boundary_semantics(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=30)),  # exactly at the gap
        (2, base),
        (2, base + datetime.timedelta(minutes=30, microseconds=1)),  # just past
        (3, base),
        (3, base + datetime.timedelta(minutes=29, seconds=59)),  # inside
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    collected = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select("user_id", "n", F.col("session_window.end").alias("end"))
        .collect()
    )
    sessions_per_user = {}
    ends = {}
    for r in collected:
        sessions_per_user.setdefault(r["user_id"], []).append(r["n"])
        ends.setdefault(r["user_id"], []).append(r["end"])
    # exactly-at-gap MERGES (inclusive boundary) ...
    assert sessions_per_user[1] == [2]
    # ... one microsecond past the gap SPLITS
    assert sorted(sessions_per_user[2]) == [1, 1]
    assert sessions_per_user[3] == [2]
    # session end = last event + gap
    assert ends[1] == [base + datetime.timedelta(minutes=60)]


def test_streaming_session_window_equals_batch(spark, tmp_path):
    """session_window is the stateful STREAMING session operator — the same
    aggregation over a file-replayed stream (availableNow, complete mode)
    must produce exactly the batch sessions. The watermark must exceed the
    replay's event-time disorder (files re-arrive hash-ordered, not
    time-ordered, and events older than max_ts - watermark are dropped by
    design); a real time-ordered feed needs only the true lateness bound."""
    # the cast is LOAD-BEARING: parquet ts is TIMESTAMP_NTZ and
    # withWatermark rejects NTZ event-time columns (EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE); batch session_window tolerates NTZ, streaming's
    # watermark does not
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "in")
    ev.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    sess = (
        stream.withWatermark("ts", "60 days")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stream_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_window"]["start"], r["n_events"])
        for r in spark.sql("select * from sess_stream_eq").collect()
    }
    batch = {
        (r["user_id"], r["session_window"]["start"], r["n_events"])
        for r in ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert streamed == batch
