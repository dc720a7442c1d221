"""Env-guarded real-Kafka smoke test (S7/T1-T2).

Runs only when SPARK_GRAFT_KAFKA_BOOTSTRAP points at a reachable
broker AND the spark-sql-kafka connector is on the classpath; the CI
path stays the file-source stand-in (pipeline.read_events_stream),
whose offset semantics these tests mirror.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from htmlentityextraction_spark.streaming import pipeline as sp

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

needs_broker = pytest.mark.skipif(
    not BOOTSTRAP, reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set; no broker available"
)


def _event(i: int) -> bytes:
    return json.dumps(
        {
            "event_id": i,
            "ts_us": 1_700_000_000_000_000 + i * 1_000_000,
            "user_id": i % 7,
            "event_type": "view",
            "value": float(i),
            "props": json.dumps({"k": i * 10}),
        }
    ).encode()


def test_bad_offset_rejected_without_broker(spark):
    with pytest.raises(ValueError, match="smallest|largest"):
        sp.read_events_kafka(spark, "localhost:9092", starting_offset="beginning")


@needs_broker
def test_kafka_smallest_replays_topic(spark):
    kafka = pytest.importorskip("kafka")
    topic = "events_smoke_" + uuid.uuid4().hex[:8]
    prod = kafka.KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for i in range(20):
        prod.send(topic, _event(i))
    prod.flush()

    from htmlentityextraction_spark.functions.temporal import epoch_micros

    stream = sp.read_events_kafka(spark, BOOTSTRAP, topic=topic, starting_offset="smallest")
    # identical column contract to the file stand-in → enrich runs unchanged
    out = sp.run_to_memory(spark, sp.enrich_events(stream))
    rows = out.withColumn("us", epoch_micros("ts")).orderBy("event_id").collect()
    assert [r.event_id for r in rows] == list(range(20))
    assert rows[1].us == 1_700_000_001_000_000  # ts decoded from epoch micros
    assert rows[1].props_k == 10


@needs_broker
def test_kafka_largest_skips_preexisting(spark):
    kafka = pytest.importorskip("kafka")
    topic = "events_smoke_" + uuid.uuid4().hex[:8]
    prod = kafka.KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for i in range(10):
        prod.send(topic, _event(i))
    prod.flush()

    # latest offsets: the 10 pre-existing records must be skipped,
    # matching read_events_stream's "largest" stand-in semantics
    stream = sp.read_events_kafka(spark, BOOTSTRAP, topic=topic, starting_offset="largest")
    for i in range(10, 15):
        prod.send(topic, _event(i))
    prod.flush()
    out = sp.run_to_memory(spark, stream)
    got = sorted(r.event_id for r in out.collect())
    assert got == list(range(10, 15))
