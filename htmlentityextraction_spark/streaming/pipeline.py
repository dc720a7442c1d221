"""Structured Streaming layer (SURVEY.md §2.10 T1-T10, §3.1).

The reference's serving path is a Kafka DStream micro-batch pipeline:
stateless per-record enrichment → status derivation → multiplexed
sinks (`streaming/Htmls2PredsPipe.scala`, `Htmls2Cassandra.scala`).
The rebuild uses Structured Streaming:

- file source over the driver's events parquet as the Kafka stand-in
  (swap `.format("parquet")` for `.format("kafka")` + `from_json` in
  production — same downstream plan);
- stateless transforms are plain select/withColumn (T4);
- status routing = one `foreachBatch` writing N filtered sinks (T5/T6)
  — the batch is cached once, filtered N ways, so the source is read
  once per micro-batch, not N times;
- `trigger(availableNow=True)` gives bounded runs (T9) — and makes
  every streaming query here equal to its batch counterpart over the
  same files, which is exactly how the DuckDB oracles check them;
- watermark + tumbling/sliding windows and streaming dedup are the
  idiomatic upgrades the reference lacked (T7 notes late data was
  unhandled; here it's explicit).

Scale: the file source parallelizes by file splits; Kafka by topic
partition. Stateless stages keep no state store; the windowed aggs
keep O(open windows × keys) state, bounded by the watermark horizon.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from htmlentityextraction_spark.functions.pricing import finite_measure, price_status, selected_price
from htmlentityextraction_spark.functions.temporal import epoch_seconds, valid_event_time

# events.parquet physical schema (ts is TIMESTAMP(NANOS) stored as
# long; see sources/tables.load_table)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


_STREAM_DIRS: dict[str, str] = {}


def _events_dir(sf_dir: str) -> str:
    """The file streaming source requires a DIRECTORY; the fixture is a
    single parquet file. Symlink it into a per-sf temp dir once
    (testdata stays untouched)."""
    d = _STREAM_DIRS.get(sf_dir)
    if d is None:
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet"))
        _STREAM_DIRS[sf_dir] = d
    return d


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    starting_offset: str = "smallest",
    max_files_per_trigger: int | None = None,
    events_dir: str | None = None,
) -> DataFrame:
    """Streaming scan of the events fixture (Kafka stand-in, S7/T2).

    Offset-reset parity with the reference's Kafka direct stream
    (`streaming/Htmls2PredsPipe.scala:36,95-98`):

    - ``smallest``: replay the topic from the beginning — the file
      source's native behavior.
    - ``largest``: consume only records that arrive AFTER stream
      creation. The file stand-in snapshots the max event time at
      creation and filters to strictly-newer rows, so data already in
      the dir is skipped exactly like Kafka's latest-offset reset.

    ``max_files_per_trigger`` maps to the file source's
    maxFilesPerTrigger — the micro-batch sizing knob standing in for
    Kafka's partition/batch assignment (T1).

    Nanos→micros conversion matches the batch loader."""
    if starting_offset not in ("smallest", "largest"):
        raise ValueError(f"starting_offset must be smallest|largest, got {starting_offset!r}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # events_dir: a FLAT dir of parquet files acting as the topic (the
    # file stream source does not recurse into subdirectories)
    d = events_dir if events_dir is not None else _events_dir(sf_dir)
    # The file stream source needs an explicit schema; the fixture's ts
    # physical type varies by generator version (TIMESTAMP(NANOS) read
    # as long under the legacy conf, vs plain TIMESTAMP(MICROS)).
    # Probe with a batch read and adapt, like sources/tables.load_table.
    # The encoding is decided ONCE, from the files present at stream
    # creation — a topic dir must stay single-encoding for its
    # lifetime (mixing generator versions in one dir would misdecode
    # the minority encoding; Kafka topics have the same one-serializer
    # contract). An empty topic (the empty-then-produce pattern the
    # `largest` offset stand-in models) defaults to the micros/
    # TimestampType encoding, which is what Spark's own writers
    # produce for files appended later.
    try:
        ts_is_nanos = dict(spark.read.parquet(d).dtypes).get("ts") == "bigint"
    except Exception:  # AnalysisException: UNABLE_TO_INFER_SCHEMA on empty dir
        ts_is_nanos = False
    ts_type = T.LongType() if ts_is_nanos else T.TimestampType()
    schema = T.StructType(
        [f if f.name != "ts" else T.StructField("ts", ts_type) for f in EVENTS_RAW_SCHEMA]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(d)
    if ts_is_nanos:
        # integer DIV (not floor of a double divide — nanos overflow the
        # double mantissa and round 1 us high), matching the batch loader
        out = out.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if starting_offset == "largest":
        head = (
            spark.read.schema(schema)
            .parquet(d)
            .agg(F.max(F.expr("ts div 1000") if ts_is_nanos else F.col("ts")).alias("mx"))
            .first()["mx"]
        )
        if head is not None:
            lit_head = F.timestamp_micros(F.lit(head)) if ts_is_nanos else F.lit(head)
            out = out.filter(F.col("ts") > lit_head)
    return out


# JSON wire schema for the real-Kafka topic: ts travels as epoch
# micros (JSON has no timestamp type); everything else matches the
# parquet fixture columns.
KAFKA_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_kafka(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "events",
    starting_offset: str = "smallest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Real Kafka source (S7/T1-T2) — the documented one-line swap for
    ``read_events_stream``, producing the identical column set so
    every downstream operator (enrich/route/window/sessionize) runs
    unchanged.

    Offset parity with the reference's direct stream
    (`streaming/Htmls2PredsPipe.scala:95-98`): the legacy
    ``smallest``/``largest`` auto.offset.reset values map to the
    connector's ``earliest``/``latest`` startingOffsets; partition
    assignment is the connector's (one Spark partition per topic
    partition). ``max_offsets_per_trigger`` is the Kafka-native
    micro-batch sizing knob (maxOffsetsPerTrigger), the analogue of
    the file source's maxFilesPerTrigger.

    Needs the spark-sql-kafka connector on the classpath and a
    reachable broker; exercised by the env-guarded
    tests/test_kafka_source.py and otherwise stood in for by the
    file source."""
    if starting_offset not in ("smallest", "largest"):
        raise ValueError(f"starting_offset must be smallest|largest, got {starting_offset!r}")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option(
            "startingOffsets", "earliest" if starting_offset == "smallest" else "latest"
        )
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    parsed = reader.load().select(
        F.from_json(F.col("value").cast("string"), KAFKA_EVENT_SCHEMA).alias("e")
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros("e.ts_us").alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )


def enrich_events(stream: DataFrame) -> DataFrame:
    """Stateless per-record enrichment (T4): parse the props JSON
    payload (`from_json`, S4/F10), derive deterministic model/pattern
    prices from the event fields (stand-ins for the scored price and
    the legacy pattern price), then the F13/F14 status + final-price
    reconciliation — the flagship CASE chains."""
    parsed = stream.withColumn("props_k", F.from_json("props", PROPS_SCHEMA)["k"])
    # deterministic stand-ins: model price fails (-1/-2 sentinels) on
    # some events, pattern price "fails" (0) on others — exercising
    # every branch of the status truth table
    model_price = (
        F.when(F.pmod("event_id", F.lit(7)) == 0, F.lit(-1.0))
        .when(F.pmod("event_id", F.lit(11)) == 0, F.lit(-2.0))
        # floor(x*100)/100, not round(x,2): Spark's round() works on the
        # decimal string repr (HALF_UP) while DuckDB rounds the binary
        # double — floor is exact on both
        .when(
            (F.pmod("event_id", F.lit(3)) == 0) & finite_measure("value"),
            F.floor(F.col("value") * 1.05 * 100) / 100.0,
        )  # non-finite/out-of-range passes through: Spark floor(NaN)=0
        # would fabricate a price, floor(±inf) overflows the ANSI long
        .otherwise(F.col("value"))
    )
    pattern_price = F.when(F.pmod("event_id", F.lit(5)) == 0, F.lit(0.0)).otherwise(
        F.col("value")
    )
    out = (
        parsed.withColumn("model_price", model_price)
        .withColumn("pattern_price", pattern_price)
        .withColumn("status", price_status(F.col("model_price"), F.col("pattern_price")))
    )
    return out.withColumn(
        "final_price", selected_price(F.col("status"), F.col("model_price"), F.col("pattern_price"))
    )


PASSING = ("modeledPatternEquals", "minorModelPatternConflict", "majorModelPatternConflict")


def route_to_sinks(enriched: DataFrame, out_dir: str) -> "StreamingQueryHolder":
    """Multiplexed sinks (T5/T6): one foreachBatch writes
    historical/ (all rows), realtime/ (passing statuses), logs/
    (errored) — the Htmls2Cassandra three-table fan-out. The micro-
    batch is persisted once so the three filters share one source
    read. Per-batch counters (A11 — the reference's accumulators,
    `streaming/Htmls2PredsPipe.scala:74-84`) accumulate on the holder
    via one cheap agg over the cached batch."""
    holder_metrics: list[dict] = []

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            counts = batch.agg(
                F.count("*").alias("n_total"),
                F.sum(F.col("status").isin(*PASSING).cast("long")).alias("n_passing"),
            ).first()
            holder_metrics.append(
                {
                    "batch_id": batch_id,
                    "n_total": counts["n_total"],
                    "n_passing": counts["n_passing"] or 0,
                    "n_errored": counts["n_total"] - (counts["n_passing"] or 0),
                }
            )
            batch.write.mode("append").parquet(os.path.join(out_dir, "historical"))
            batch.filter(F.col("status").isin(*PASSING)).write.mode("append").parquet(
                os.path.join(out_dir, "realtime")
            )
            batch.filter(~F.col("status").isin(*PASSING)).write.mode("append").parquet(
                os.path.join(out_dir, "logs")
            )
        finally:
            batch.unpersist()

    q = (
        enriched.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    holder = StreamingQueryHolder(q, out_dir)
    holder.metrics = holder_metrics
    return holder


class StreamingQueryHolder:
    def __init__(self, query, out_dir: str):
        self.query = query
        self.out_dir = out_dir

    def await_done(self, timeout_sec: int = 300) -> None:
        self.query.awaitTermination(timeout_sec)


def windowed_counts(enriched: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts with watermark (the T7
    upgrade: late data beyond the watermark is dropped explicitly
    instead of silently mis-binned)."""
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # corrupt values (NULL/NaN/|v|>=1e10) are excluded from the
            # rollup, not from the event count (extreme-fuzz aligned:
            # a 2^53-scale addend makes the float sum order-dependent)
            F.round(F.sum(F.when(finite_measure("value"), F.col("value"))) + 1e-9, 6)
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(enriched: DataFrame, size: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window average value per event type."""
    return (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(
            F.round(F.avg(F.when(finite_measure("value"), F.col("value"))) + 1e-9, 6)
            .alias("avg_value")
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )


def stream_dedup(stream: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id, state bounded by the
    watermark. ``dropDuplicatesWithinWatermark``, NOT plain
    ``dropDuplicates``: without the event-time column in the key set,
    plain dropDuplicates keeps every seen key forever (the watermark
    does not evict its state — the classic unbounded-state gotcha);
    the WithinWatermark variant evicts each key once the watermark
    passes its event time + delay, so state is horizon-bounded at any
    stream length. Duplicates are assumed to arrive within the
    2-hour horizon (true for the at-least-once replay this models).

    Event-time validity is enforced BEFORE the watermark: one
    far-future corrupt timestamp would advance the watermark past
    every real event and both evict dedup state early AND mark the
    whole stream late (time-fuzz aligned)."""
    return (
        stream.filter(valid_event_time("ts"))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_stream_attribution(
    views: DataFrame, clicks: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """Stream-stream event-time inner join (view→click attribution):
    each click matches the same user's views whose timestamp falls in
    [click_ts - horizon, click_ts]. BOTH sides carry watermarks and
    the join condition carries the time band, so the state store is
    bounded: a buffered view is evicted once the click-side watermark
    passes view_ts + horizon — without the band the state would grow
    with the full history of both streams. Inner-join matches emit
    eagerly (no watermark hold-back), so a bounded availableNow run
    yields the complete batch-equivalent result.

    Scale shape: the join keys on user_id, so both streams shuffle
    once to co-locate per-user state; state size is horizon-bounded
    per user, independent of stream length. The reference's streaming
    surface is stateless per-message (`streaming/Htmls2PredsPipe.
    scala`) — this is the idiomatic-Spark extension (SURVEY §2.10).
    """
    # sane-clock guard before the watermark: a single corrupt
    # far-future event on either side would drag the global watermark
    # forward and silently drop every real pair (time-fuzz aligned)
    v = views.filter(valid_event_time("ts")).select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", horizon)
    c = clicks.filter(valid_event_time("ts")).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", horizon)
    cond = (
        (v["user_id"] == c["click_user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(c, cond, "inner").select(
        "view_id",
        "click_id",
        "user_id",
        (epoch_seconds("click_ts") - epoch_seconds("view_ts")).alias("lag_seconds"),
    )


def stream_stream_attribution_outer(
    views: DataFrame, clicks: DataFrame, horizon: str = "10 minutes"
) -> DataFrame:
    """LEFT OUTER variant of the attribution join: views with no
    click in the horizon still emit (null click) — but only once the
    watermark proves no future click can match. Emission semantics
    (asserted by the oracle of `stream_stream_attribution_outer`):

    - matched pairs emit eagerly, exactly like the inner join;
    - an unmatched view emits with nulls when
      ``view_ts + horizon < watermark`` where the global watermark is
      ``min(max view_ts, max click_ts) - horizon`` at end of input;
    - unmatched views NEWER than that boundary are still "maybe
      matchable" when the bounded run stops, and are NOT emitted —
      the price of outer semantics on an unbounded model. On a live
      stream they emit as the watermark advances.

    Same user_id shuffle and horizon-bounded state as the inner form.
    """
    # sane-clock guard before the watermark: a single corrupt
    # far-future event on either side would drag the global watermark
    # forward and silently drop every real pair (time-fuzz aligned)
    v = views.filter(valid_event_time("ts")).select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", horizon)
    c = clicks.filter(valid_event_time("ts")).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", horizon)
    cond = (
        (v["user_id"] == c["click_user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(c, cond, "left_outer").select(
        "view_id",
        "click_id",
        "user_id",
        (epoch_seconds("click_ts") - epoch_seconds("view_ts")).alias("lag_seconds"),
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static broadcast join (J8/T-static): the static side is
    re-read per micro-batch; broadcast keeps it off the shuffle path —
    the model-registry / dMap lookup shape."""
    return stream.join(F.broadcast(dim), on, "left")


SESSION_OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_start timestamp, session_end timestamp, duration_sec long"
)


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the
    reference has NO stateful streaming — this is the idiomatic
    capability Spark adds): per-user session windows with a
    gap_minutes inactivity break. State = the open session; closed
    sessions emit as soon as a later event breaks the gap. The open
    (final) session stays in state — at 100 TB a GroupStateTimeout
    would flush idle users; with the bounded test source the batch
    sessionizer minus each user's last session is the exact oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_sec = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        rows = []
        events = []
        for pdf in pdfs:
            events.append(pdf[["ts"]])
        ev = pd.concat(events).sort_values("ts")
        # second-truncated epochs match the batch sessionizer's
        # cast("long") semantics; go through datetime64[s] so the
        # conversion is exact whatever resolution (ns vs us) and tz
        # flavor pandas hands us
        secs = ev["ts"].values.astype("datetime64[s]").astype("int64").tolist()
        if state.exists:
            seq, n, start, last = state.get
        else:
            seq, n, start, last = 0, 0, None, None
        for s in secs:
            if last is not None and s - last <= gap_sec:
                n += 1
                last = s
                continue
            if n > 0:
                rows.append((user, seq, n, start, last))
                seq += 1
            n, start, last = 1, s, s
        state.update((seq, n, start, last))
        out = pd.DataFrame(
            rows, columns=["user_id", "session_seq", "n_events", "start_s", "end_s"]
        )
        if not out.empty:
            out["session_start"] = pd.to_datetime(out["start_s"], unit="s")
            out["session_end"] = pd.to_datetime(out["end_s"], unit="s")
            out["duration_sec"] = out["end_s"] - out["start_s"]
            yield out[
                ["user_id", "session_seq", "n_events", "session_start", "session_end", "duration_sec"]
            ]

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        "seq long, n long, start long, last long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_merge_into(stream: DataFrame, tbl, key: str = "user_id") -> "StreamingQueryHolder":
    """foreachBatch MERGE sink — the Delta-style "streaming upsert"
    (T6 + K3 composed): each micro-batch aggregates per key
    (event count, value cents, latest event time) and merges
    ADDITIVELY into a ParquetMergeTable. The merge combine is
    commutative + exact (integer counts/cents, max on epoch micros),
    so the final table is independent of how the stream was cut into
    micro-batches — the property that makes a replayed/restarted
    stream converge to the same table. Each merge rewrites only the
    buckets its keys touch and publishes atomically.

    The batch NEVER reads current state: the additive fold happens
    INSIDE the merge via ``combine`` (``WHEN MATCHED THEN UPDATE SET
    n = n + new.n`` semantics), so the only state touched per trigger
    is the affected buckets the merge rewrites anyway —
    O(touched buckets), not O(table): the difference between a
    streaming upsert that survives 100 TB of keyed state and one
    that rescans the world every few seconds."""
    from htmlentityextraction_spark.functions.temporal import epoch_micros
    from htmlentityextraction_spark.operators.incremental import OP_UPSERT

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        agg = batch.groupBy(key).agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(finite_measure("value"), F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            ).alias("sum_cents"),
            F.max(epoch_micros("ts")).alias("last_us"),
        ).withColumn("op", F.lit(OP_UPSERT))
        tbl.merge(agg, combine={"n_events": "sum", "sum_cents": "sum", "last_us": "max"})

    ckpt = os.path.join(tempfile.gettempdir(), "ckpt_merge_" + uuid.uuid4().hex[:12])
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return StreamingQueryHolder(q, tbl.path)


def run_to_memory(spark: SparkSession, df: DataFrame, complete: bool = False) -> DataFrame:
    """Execute a (bounded) streaming DataFrame with availableNow and
    return its full output as a batch DataFrame — the test/oracle
    harness for every query above (T9).

    Append-mode output goes through a parquet file sink and is read
    back distributed: the memory sink collects every row to the
    driver, which is both the slow path at sf0.1 (~2x the pure
    streaming execution) and a non-starter at scale. Complete-mode
    (unsupported by file sinks) keeps the memory sink — complete
    output is a re-emitted aggregate, small by construction."""
    name = "s_" + uuid.uuid4().hex[:12]
    ckpt = os.path.join(tempfile.gettempdir(), "ckpt_" + name)
    if complete:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        return spark.table(name)
    out_dir = os.path.join(tempfile.gettempdir(), "out_" + name)
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    # explicit schema: a zero-row run leaves only _spark_metadata and
    # schema inference would fail; the streaming plan already knows it
    return spark.read.schema(df.schema).parquet(out_dir)
