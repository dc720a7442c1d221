"""Streaming robustness: genuine multi-micro-batch processing and
exactly-once delivery across a mid-stream restart, plus small-file
compaction."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import maintenance as mt


def _write_batches(spark, src, n_files=4, rows_per=250):
    for b in range(n_files):
        spark.createDataFrame(
            [(b * rows_per + i, float(i)) for i in range(rows_per)],
            "event_id long, value double",
        ).coalesce(1).write.mode("append").parquet(os.path.join(src, f"b{b}"))


def test_multi_microbatch_and_restart_exactly_once(spark):
    src = tempfile.mkdtemp(prefix="mb_src_")
    ckpt = tempfile.mkdtemp(prefix="mb_ckpt_")
    sink = tempfile.mkdtemp(prefix="mb_sink_")
    _write_batches(spark, src, n_files=2)

    def run():
        stream = (
            spark.readStream.schema("event_id long, value double")
            .option("maxFilesPerTrigger", 1)   # force one file per micro-batch
            .parquet(src + "/*")
        )
        q = (
            stream.withColumn("doubled", F.col("value") * 2)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    run()                       # processes the first 2 files, then stops
    n_mid = spark.read.parquet(sink).count()
    assert n_mid == 500
    _write_batches(spark, src, n_files=4)  # b0/b1 rewritten? no - append to b0..b3
    # only the NEW files (b2, b3) are processed on restart; b0/b1
    # offsets are committed in the checkpoint -> no duplicates
    run()
    out = spark.read.parquet(sink)
    total = out.count()
    dup = out.groupBy("event_id", "value").count().filter(F.col("count") > 2).count()
    # b0/b1 dirs got a second part file appended (same event_ids) - those
    # ARE new files and legitimately processed; exactly-once applies to
    # FILES, so assert no file processed twice rather than id uniqueness
    assert total == 500 + 1000
    assert dup == 0
    shutil.rmtree(src); shutil.rmtree(ckpt); shutil.rmtree(sink)


def test_compact_reduces_file_count(spark):
    d = tempfile.mkdtemp(prefix="compact_")
    # 32 tiny files
    spark.range(10_000).withColumn("v", F.rand(7)).repartition(32).write.mode(
        "overwrite"
    ).parquet(d)
    before, after = mt.compact_parquet_dir(spark, d, target_file_mb=128)
    assert before == 32
    assert after < before
    # data preserved
    assert spark.read.parquet(d + ".compact").count() == 10_000
    shutil.rmtree(d); shutil.rmtree(d + ".compact")


def test_processing_time_trigger_and_stop(spark):
    """T1/T10: a processingTime-triggered continuous query runs
    micro-batches until stopped on a condition (the reference's
    stop-threshold draft, Htmls2Cassandra.scala:288-296)."""
    import time

    from htmlentityextraction_spark.streaming import pipeline as sp

    stream = sp.read_events_stream(spark, "/root/testdata/sf0.001")
    out = tempfile.mkdtemp(prefix="pt_sink_")
    ckpt = tempfile.mkdtemp(prefix="pt_ckpt_")
    q = (
        stream.select("event_id", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] >= 0 and \
               spark.read.schema("event_id long, value double").parquet(out).count() >= 1000:
                break
            time.sleep(0.5)
        assert q.isActive
    finally:
        q.stop()
    assert not q.isActive
    assert spark.read.schema("event_id long, value double").parquet(out).count() == 1000
    shutil.rmtree(out); shutil.rmtree(ckpt)


def test_serve_path_survives_corrupt_and_null_messages(spark):
    """The serve pipeline must route corrupt JSON out, sentinel
    null-html pages, and still score the good ones — one poisoned
    Kafka message must never kill the stream."""
    import os
    from pyspark.sql import functions as F
    from htmlentityextraction_spark.operators import models as md
    from htmlentityextraction_spark.streaming import serve

    # registry from clean toy data
    toy = spark.createDataFrame(
        [("good.com", f"http://good.com/p/{i}", i % 2, 0.3,
          f"{100+i}.50", "buy good price", "deal") for i in range(40)],
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    )
    reg = md.train_per_domain(
        md.featurize_candidates(toy), n_estimators=3, max_depth=2,
        min_doc_freq=2, min_rows=10,
    )

    msgs = [
        ('{"url":"http://good.com/p/1","html":"buy good price 100.50 deal",'
         '"price":100.5,"updatedPrice":100.5}',),
        ('{"url":"http://good.com/p/2","html":null,'
         '"price":7.0,"updatedPrice":7.0}',),          # null html
        ("{broken json!!",),                            # corrupt
    ]
    src = tempfile.mkdtemp(prefix="serve_rob_src_")
    out = tempfile.mkdtemp(prefix="serve_rob_out_")
    spark.createDataFrame(msgs, "value string").write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema("value string").parquet(src)
    serve.serve_stream(spark, raw, reg, out).await_done()

    hist = spark.read.parquet(os.path.join(out, "historical")).collect()
    by_url = {r.url: r for r in hist}
    # corrupt message kept out of scoring but routed to the error side
    # output with its payload intact (reference error-topic behavior)
    assert set(by_url) == {"http://good.com/p/1", "http://good.com/p/2"}
    corrupt = spark.read.parquet(os.path.join(out, "logs_corrupt")).collect()
    assert len(corrupt) == 1
    assert corrupt[0].raw_payload == "{broken json!!"
    assert corrupt[0].status == "corruptMessage"
    # null-html page takes the sentinel path, pattern price wins
    r2 = by_url["http://good.com/p/2"]
    assert r2.model_price == -1.0 and r2.status == "allFalseCandids"
    assert r2.final_price == 7.0
    shutil.rmtree(src); shutil.rmtree(out)


def test_serve_backpressure_bounds_microbatches(spark):
    """Bounded-ingest contract on the SERVE path (T9 analogue of the
    Kafka maxOffsetsPerTrigger knob, which `read_events_kafka` wires
    and the broker-gated test covers): with maxFilesPerTrigger=1 over
    4 source files the stream must advance in >=4 micro-batches, each
    ingesting at most one file's rows — so a backlogged topic can
    never balloon a single micro-batch past executor memory."""
    import os
    from pyspark.sql import functions as F
    from htmlentityextraction_spark.operators import models as md
    from htmlentityextraction_spark.streaming import serve

    toy = spark.createDataFrame(
        [("good.com", f"http://good.com/p/{i}", i % 2, 0.3,
          f"{100+i}.50", "buy good price", "deal") for i in range(40)],
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    )
    reg = md.train_per_domain(
        md.featurize_candidates(toy), n_estimators=3, max_depth=2,
        min_doc_freq=2, min_rows=10,
    )

    rows_per_file = 25
    src = tempfile.mkdtemp(prefix="serve_bp_src_")
    out = tempfile.mkdtemp(prefix="serve_bp_out_")
    for f in range(4):
        msgs = [
            (f'{{"url":"http://good.com/p/{f * rows_per_file + i}",'
             f'"html":"buy good price {100 + i}.50 deal",'
             f'"price":{100 + i}.5,"updatedPrice":{100 + i}.5}}',)
            for i in range(rows_per_file)
        ]
        spark.createDataFrame(msgs, "value string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    holder = serve.serve_stream(spark, raw, reg, out)
    holder.await_done()
    progress = holder.query.recentProgress
    batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches) >= 4, f"expected >=4 micro-batches, got {len(batches)}"
    assert max(p["numInputRows"] for p in batches) <= rows_per_file, (
        "a micro-batch ingested more than one file's rows"
    )
    hist = spark.read.parquet(os.path.join(out, "historical"))
    assert hist.count() == 4 * rows_per_file, "every page must land exactly once"
    shutil.rmtree(src); shutil.rmtree(out)
