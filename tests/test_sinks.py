"""Sink-family tests (SURVEY.md §2.2): csv-with-header single-file
report (K5), parquet roundtrip (K6), streaming csv sink (K7)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F


def test_csv_report_single_file_with_header(spark):
    # K5 (`emr/RT2Report.scala:123-125`): the reference unioned a
    # header RDD and coalesce(1)'d; df.write.csv(header=True) +
    # coalesce(1) is the declarative form
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25)], "id long, name string, price double"
    )
    out = tempfile.mkdtemp(prefix="csv_sink_")
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(out)
    files = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(files) == 1, "coalesce(1) must produce a single part file"
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "id,name,price"
    assert len(lines) == 3
    shutil.rmtree(out)


def test_parquet_roundtrip_preserves_schema(spark):
    # K6: object-file sink → parquet
    df = spark.createDataFrame(
        [(1, [1.5, 2.5], {"k": "v"})],
        "id long, vec array<double>, props map<string,string>",
    )
    out = tempfile.mkdtemp(prefix="pq_sink_")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema == df.schema
    assert back.count() == 1
    shutil.rmtree(out)


def test_streaming_csv_sink(spark):
    # K7 (`analytics/Kafka2CompPerUser.scala:80-81`): per-batch text
    # files → writeStream csv with availableNow
    from htmlentityextraction_spark.streaming import pipeline as sp

    stream = sp.read_events_stream(spark, "/root/testdata/sf0.001")
    out = tempfile.mkdtemp(prefix="csv_stream_")
    ckpt = tempfile.mkdtemp(prefix="csv_ckpt_")
    q = (
        stream.select("event_id", "event_type", "value")
        .writeStream.format("csv")
        .option("path", out)
        .option("header", False)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    back = spark.read.schema("event_id long, event_type string, value double").csv(out)
    assert back.count() == 1000
    assert back.agg(F.countDistinct("event_id")).first()[0] == 1000
    shutil.rmtree(out); shutil.rmtree(ckpt)
