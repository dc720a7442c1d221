"""Merge-table change feed as a Structured Streaming source
(`sources/mergetable_cdc_source.py`): offset/checkpoint restart
semantics, downstream MERGE replication (the stream-side CDC apply),
bounded ingest via maxVersionsPerTrigger, and event-time watermarks
over the feed."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.incremental import ParquetMergeTable
from htmlentityextraction_spark.sources.mergetable_cdc_source import (
    MergeTableCDCDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(MergeTableCDCDataSource)


def _mk_table(spark, path):
    tbl = ParquetMergeTable(spark, path, "o_orderkey", num_buckets=4)
    tbl.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "o_orderkey long, price double"
        )
    )
    tbl.merge(
        spark.createDataFrame(
            [(3, 33.0, "upsert"), (5, None, "delete"), (100, 1.5, "upsert")],
            "o_orderkey long, price double, op string",
        )
    )
    tbl.merge(
        spark.createDataFrame(
            [(100, 2.5, "upsert")], "o_orderkey long, price double, op string"
        )
    )
    return tbl


def _run_available_now(spark, src_path, out, starting="1"):
    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", src_path)
        .option("startingVersion", starting)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_cdc_stream_bootstrap_classification_and_restart(spark, tmp_path):
    d = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    tbl = _mk_table(spark, d)

    _run_available_now(spark, d, out)
    got = spark.read.parquet(os.path.join(out, "data"))
    by = {
        (r.o_orderkey, r._commit_version): (r.change_type, r.old_price, r.new_price)
        for r in got.collect()
    }
    assert got.count() == 20 + 3 + 1
    assert by[(3, 2)] == ("update", 3.0, 33.0)
    assert by[(5, 2)] == ("delete", 5.0, None)
    assert by[(100, 2)] == ("insert", None, 1.5)
    assert by[(100, 3)] == ("update", 1.5, 2.5)
    assert all(ct == "insert" for (k, v), (ct, _, _) in by.items() if v == 1)

    # checkpointed restart: a new commit arrives, the SAME checkpoint
    # resumes from version 3 — only v4's changes land, no duplicates
    tbl.merge(
        spark.createDataFrame(
            [(7, 77.0, "upsert")], "o_orderkey long, price double, op string"
        )
    )
    _run_available_now(spark, d, out)
    got2 = spark.read.parquet(os.path.join(out, "data"))
    assert got2.count() == 24 + 1
    new_rows = got2.filter(F.col("_commit_version") == 4).collect()
    assert len(new_rows) == 1 and new_rows[0].change_type == "update"
    assert new_rows[0].o_orderkey == 7 and new_rows[0].new_price == 77.0


def test_cdc_stream_apply_replicates_table(spark, tmp_path):
    """The stream-side CDC APPLY: feed table A's change stream through
    foreachBatch MERGE into table B; B must converge to A exactly."""
    d = str(tmp_path / "a")
    bdir = str(tmp_path / "b")
    _mk_table(spark, d)
    tbl_b = ParquetMergeTable(spark, bdir, "o_orderkey", num_buckets=2)
    tbl_b.create(
        spark.createDataFrame([], "o_orderkey long, price double")
    )

    def apply_batch(batch, batch_id):
        b = ParquetMergeTable(batch.sparkSession, bdir, "o_orderkey")
        versions = [
            r._commit_version
            for r in batch.select("_commit_version").distinct().collect()
        ]
        for v in sorted(versions):  # per-version order keeps replays exact
            step = batch.filter(F.col("_commit_version") == v).select(
                "o_orderkey",
                F.col("new_price").alias("price"),
                F.when(F.col("change_type") == "delete", F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("op"),
            )
            b.merge(step)

    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    a_rows = {
        r.o_orderkey: r.price
        for r in ParquetMergeTable(spark, d, "o_orderkey").read().collect()
    }
    b_rows = {r.o_orderkey: r.price for r in tbl_b.read().collect()}
    assert b_rows == a_rows, "replica must converge to the source table"


def _drain(spark, stream_df, sink_writer, expected, timeout=180):
    """Start a processingTime stream, poll until `expected(q)` is
    true, stop. Python sources fall back to single-batch under
    availableNow, so bounded-trigger tests must drive real triggers."""
    q = sink_writer(stream_df.writeStream.trigger(processingTime="1 second")).start()
    try:
        deadline = time.time() + timeout
        while time.time() < deadline and not expected(q):
            time.sleep(1)
        assert expected(q), "stream did not drain in time"
    finally:
        q.stop()
    return q


def test_cdc_max_versions_per_trigger_bounds_batches(spark, tmp_path):
    """Bounded ingest: maxVersionsPerTrigger=1 over 3 published
    snapshots must take >=3 non-empty micro-batches, one snapshot
    each — a long-idle consumer can never pull the whole backlog
    into a single batch."""
    d = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    _mk_table(spark, d)

    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "1")
        .load()
    )

    def writer(ws):
        return ws.format("parquet").option(
            "path", os.path.join(out, "data")
        ).option("checkpointLocation", os.path.join(out, "_ck"))

    def done(q):
        try:
            return (
                spark.read.parquet(os.path.join(out, "data")).count() == 24
            )
        except Exception:
            return False

    q = _drain(spark, stream, writer, done)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 3, f"expected >=3 bounded batches, got {len(batches)}"
    assert max(p["numInputRows"] for p in batches) <= 20, (
        "one batch ingested more than one snapshot's changes"
    )
    versions = {
        r._commit_version
        for r in spark.read.parquet(os.path.join(out, "data")).collect()
    }
    assert versions == {1, 2, 3}

    # capped restart: the checkpoint's committed offset (3) is ahead
    # of stream-start state — the cap must base on it, not strand or
    # replay; the new commit arrives exactly once
    ParquetMergeTable(spark, d, "o_orderkey").merge(
        spark.createDataFrame(
            [(7, 77.0, "upsert")], "o_orderkey long, price double, op string"
        )
    )
    stream2 = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "1")
        .load()
    )

    def done2(q):
        try:
            return spark.read.parquet(os.path.join(out, "data")).count() == 25
        except Exception:
            return False

    _drain(spark, stream2, writer, done2)
    versions = {
        r._commit_version
        for r in spark.read.parquet(os.path.join(out, "data")).collect()
    }
    assert versions == {1, 2, 3, 4}


def test_cdc_stream_watermarked_window_counts(spark, tmp_path):
    """Event-time composes with the feed: windowed insert counts with
    a watermark over new_ts finalize (append mode) as later commits
    advance the watermark across micro-batches."""
    d = str(tmp_path / "tbl")
    tbl = ParquetMergeTable(spark, d, "event_id", num_buckets=2)
    tbl.create(
        spark.createDataFrame(
            [(i, f"2024-01-01 00:0{i}:00") for i in range(3)],
            "event_id long, ts_s string",
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    # two more commits, each an hour later — the watermark (10 min)
    # sails past the first window, so append mode can emit it
    for h in (1, 2):
        tbl.merge(
            spark.createDataFrame(
                [(100 + h, f"2024-01-01 0{h}:00:00", "upsert")],
                "event_id long, ts_s string, op string",
            ).select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                "op",
            )
        )

    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "1")
        .load()
    )
    counts = (
        stream.filter(F.col("change_type") == "insert")
        .withWatermark("new_ts", "10 minutes")
        .groupBy(F.window("new_ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    sink = f"cdc_wm_{os.path.basename(str(tmp_path))}"

    def writer(ws):
        return ws.format("memory").queryName(sink).outputMode("append")

    def done(q):
        return spark.sql(f"select * from {sink}").count() >= 2

    _drain(spark, counts, writer, done)
    rows = {str(r.ws): r.n for r in spark.sql(f"select * from {sink}").collect()}
    assert rows.get("2024-01-01 00:00:00") == 3, rows
    assert rows.get("2024-01-01 01:00:00") == 1, rows


def test_cdc_stream_fails_loudly_on_vacuumed_version(spark, tmp_path):
    """Retention contract (module docstring): replaying history that
    vacuum dropped must fail the stream with the missing manifest —
    never silently skip changes."""
    d = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    tbl = _mk_table(spark, d)           # versions 1..3
    tbl.vacuum(keep_last=1)             # drops manifests v1/v2

    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "_ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="manifest-v1.json"):
        q.awaitTermination(120)
        raise AssertionError("stream should have failed on the vacuumed version")


def test_cdc_reader_matches_batch_table_changes_on_random_histories(spark, tmp_path):
    """Property: for RANDOM merge histories, the streaming reader's
    per-version change rows (driven directly: offsets → partitions →
    read) must equal the batch ``table_changes`` feed version by
    version, and folding them must reproduce the final table."""
    import random

    from htmlentityextraction_spark.sources.mergetable_cdc_source import (
        MergeTableCDCStreamReader,
    )

    rng = random.Random(20240814)
    for case in range(6):
        d = str(tmp_path / f"t{case}")
        keys = list(range(1, 15))
        init = [(k, float(rng.randint(0, 9))) for k in rng.sample(keys, 8)]
        tbl = ParquetMergeTable(spark, d, "o_orderkey", num_buckets=3)
        tbl.create(spark.createDataFrame(init, "o_orderkey long, price double"))
        for _ in range(rng.randint(1, 3)):
            batch = [
                (k, float(rng.randint(0, 9)), rng.choice(["upsert", "upsert", "delete"]))
                for k in rng.sample(keys, rng.randint(1, 5))
            ]
            tbl.merge(
                spark.createDataFrame(
                    batch, "o_orderkey long, price double, op string"
                )
            )

        ds = MergeTableCDCDataSource(options={"path": d})
        schema = ds.schema()
        reader = MergeTableCDCStreamReader(d, schema, {"startingversion": "1"})
        end = reader.latestOffset()
        parts = reader.partitions({"version": 0}, end)
        stream_rows = [r for p in parts for r in reader.read(p)]

        by_version: dict[int, set] = {}
        for k, ct, v, old_p, new_p in stream_rows:
            by_version.setdefault(v, set()).add((k, ct, old_p, new_p))
        # v1 bootstrap: every initial row arrives as an insert
        assert by_version.get(1, set()) == {
            (k, "insert", None, p) for k, p in init
        }
        # each later version must equal the batch change feed exactly
        for v in range(2, end["version"] + 1):
            want = {
                (r.o_orderkey, r.change_type, r.old_price, r.new_price)
                for r in tbl.table_changes(v - 1, v).collect()
            }
            assert by_version.get(v, set()) == want, f"case {case} version {v}"
        # folding the stream reproduces the final table state
        replica: dict = {}
        for v in sorted(by_version):
            for k, ct, old_p, new_p in by_version[v]:
                if ct == "delete":
                    replica.pop(k, None)
                else:
                    replica[k] = new_p
        final = {r.o_orderkey: r.price for r in tbl.read().collect()}
        assert replica == final, f"case {case} replica diverged"


def test_cdc_partitions_plan_only_changed_buckets(spark, tmp_path):
    """Manifest-diff pruning contract: a merge touching one key must
    plan CDC partitions for only that key's bucket — O(changed
    buckets), never O(table) — and a no-op version step contributes
    nothing."""
    from htmlentityextraction_spark.sources.mergetable_cdc_source import (
        MergeTableCDCStreamReader,
    )

    d = str(tmp_path / "tbl")
    tbl = ParquetMergeTable(spark, d, "o_orderkey", num_buckets=8)
    tbl.create(
        spark.createDataFrame(
            [(i, float(i)) for i in range(64)], "o_orderkey long, price double"
        )
    )
    tbl.merge(
        spark.createDataFrame(
            [(3, 33.0, "upsert")], "o_orderkey long, price double, op string"
        )
    )
    ds = MergeTableCDCDataSource(options={"path": d})
    reader = MergeTableCDCStreamReader(d, ds.schema(), {"startingversion": "1"})

    # v1 bootstrap: every non-empty bucket appears once
    v1 = reader.partitions({"version": 0}, {"version": 1})
    assert len(v1) == len(tbl._manifest_for(1)["buckets"])
    # v2: a single-key merge rewrites exactly one bucket
    v2 = reader.partitions({"version": 1}, {"version": 2})
    assert len(v2) == 1, f"expected 1 changed bucket, planned {len(v2)}"
    [(k, ct, v, old_p, new_p)] = list(reader.read(v2[0]))
    assert (k, ct, v, old_p, new_p) == (3, "update", 2, 3.0, 33.0)


# --------------------------------------- streaming dedup-index upkeep


def test_dedup_index_stream_matches_batch_advance(spark, tmp_path):
    """VERDICT r8 item 5: the foreachBatch consumer keeps the
    fingerprint index current from the live CDC stream; after a
    trickle of merges (including a delete + same-fp reinsert) the
    streamed index must equal advance_dedup_index's batch result."""
    from htmlentityextraction_spark.operators import decontam as dc

    d = str(tmp_path / "corpus")
    corpus = ParquetMergeTable(spark, d, "doc_id", num_buckets=4)
    corpus.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, fingerprint string"
        )
    )  # v1
    # trickle merge 1: delete doc 2 AND reinsert its fingerprint as doc 9
    corpus.merge(
        spark.createDataFrame(
            [(2, None, "delete"), (9, "b", "upsert")],
            "doc_id long, fingerprint string, op string",
        )
    )  # v2
    # trickle merge 2: brand-new doc
    corpus.merge(
        spark.createDataFrame(
            [(4, "d", "upsert")], "doc_id long, fingerprint string, op string"
        )
    )  # v3
    # trickle merge 3: doc 1's text changes -> fingerprint a retires, e lives
    corpus.merge(
        spark.createDataFrame(
            [(1, "e", "upsert")], "doc_id long, fingerprint string, op string"
        )
    )  # v4

    idx_stream = ParquetMergeTable(
        spark, str(tmp_path / "idx_stream"), "fingerprint", num_buckets=4
    )
    idx_stream.create(spark.createDataFrame([], "fingerprint string, doc_id long"))
    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(dc.dedup_index_stream_sink(idx_stream))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    idx_batch = ParquetMergeTable(
        spark, str(tmp_path / "idx_batch"), "fingerprint", num_buckets=4
    )
    idx_batch.create(corpus.read(version=1).select("fingerprint", "doc_id"))
    dc.advance_dedup_index(idx_batch, corpus, 1)

    got_stream = {r.fingerprint: r.doc_id for r in idx_stream.read().collect()}
    got_batch = {r.fingerprint: r.doc_id for r in idx_batch.read().collect()}
    assert got_stream == got_batch == {"b": 9, "c": 3, "d": 4, "e": 1}


def test_dedup_index_stream_fails_loud_on_mid_stream_drop(spark, tmp_path):
    """The streaming consumer inherits the source's fail-loud
    evolution contract: a column DROP published after stream start
    kills the stream at partitions() — the sink never sees a
    mixed-schema batch and the index is left exactly at the last
    fully-applied version."""
    from htmlentityextraction_spark.operators import decontam as dc

    d = str(tmp_path / "corpus")
    corpus = ParquetMergeTable(spark, d, "doc_id", num_buckets=2)
    corpus.create(
        spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "de")],
            "doc_id long, fingerprint string, lang string",
        )
    )
    idx = ParquetMergeTable(spark, str(tmp_path / "idx"), "fingerprint", num_buckets=2)
    idx.create(spark.createDataFrame([], "fingerprint string, doc_id long"))

    stream = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(dc.dedup_index_stream_sink(idx))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if {r.fingerprint for r in idx.read().collect()} == {"a", "b"}:
                break
            time.sleep(0.5)
        assert {r.fingerprint for r in idx.read().collect()} == {"a", "b"}

        corpus.drop_column("lang")  # publishes v2 with an evolved schema
        deadline = time.time() + 120
        while time.time() < deadline and q.exception() is None:
            time.sleep(0.5)
        exc = q.exception()
        assert exc is not None, "stream should have failed on the mid-stream drop"
        assert "schema changed" in str(exc)
    finally:
        try:
            q.stop()
        except Exception:
            pass
    # the index is intact at the pre-drop state
    assert {r.fingerprint: r.doc_id for r in idx.read().collect()} == {"a": 1, "b": 2}


def test_datasource_instance_reuse_repins_fresh_manifest(spark, tmp_path):
    """A DataSource instance Spark reuses to start a SECOND stream
    after the table evolved must re-pin a fresh manifest: schema()
    reflects the evolution and the new reader's fail-loud baseline is
    the evolved fingerprint, not the first start's (the stale-pin
    would both mis-shape rows and fire the evolution check against
    the wrong baseline)."""
    d = str(tmp_path / "tbl")
    tbl = ParquetMergeTable(spark, d, "k", num_buckets=2)
    tbl.create(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, price double")
    )
    ds = MergeTableCDCDataSource(options={"path": d})
    s1 = ds.schema()
    assert "old_price" in s1.fieldNames()
    r1 = ds.streamReader(s1)  # consumes the pin

    # the table evolves: a column arrives via a schema-evolving merge
    tbl.merge(
        spark.createDataFrame(
            [(3, 3.0, "x", "upsert")], "k long, price double, tag string, op string"
        )
    )
    s2 = ds.schema()  # same instance, second query start
    assert "old_tag" in s2.fieldNames(), "reused instance pinned a stale manifest"
    r2 = ds.streamReader(s2)
    # the second reader's baseline is the evolved snapshot: planning
    # over already-published history must NOT trip the evolution check
    parts = r2.partitions({"version": 1}, {"version": 2})
    assert parts, "evolved-baseline reader must plan the v2 step"
    # while the FIRST reader (pinned pre-evolution) correctly fails loud
    with pytest.raises(RuntimeError, match="schema changed"):
        r1.partitions({"version": 1}, {"version": 2})


def test_dedup_index_sink_replay_skips_applied_steps(spark, tmp_path):
    """Restart-replay safety: a micro-batch whose version steps were
    ALL applied (but whose offset never committed) must be skipped via
    the sync watermark — naively re-applying step v2 after v3 already
    moved fingerprint f to a new doc would read as an unprobed
    duplicate and wedge the stream forever."""
    import json as _json

    from htmlentityextraction_spark.operators import decontam as dc

    idx = ParquetMergeTable(spark, str(tmp_path / "idx"), "fingerprint", num_buckets=2)
    idx.create(spark.createDataFrame([], "fingerprint string, doc_id long"))
    sink = dc.dedup_index_stream_sink(idx)

    cols = (
        "doc_id long, change_type string, _commit_version long, "
        "old_fingerprint string, new_fingerprint string"
    )
    batch = spark.createDataFrame(
        [
            (7, "insert", 2, None, "f"),   # v2: doc 7 carries f
            (7, "delete", 3, "f", None),   # v3: doc 7 gone...
            (9, "insert", 3, None, "f"),   # ...doc 9 reuses f
        ],
        cols,
    )
    sink(batch, 0)
    assert {r.fingerprint: r.doc_id for r in idx.read().collect()} == {"f": 9}

    # full replay (offset never committed): both steps skip, no error
    sink(batch, 0)
    assert {r.fingerprint: r.doc_id for r in idx.read().collect()} == {"f": 9}

    # partial replay (crash between apply and watermark write): only
    # the unapplied tail re-runs, and re-applying one step is a no-op
    with open(idx.path + "/_dedup_sync.json", "w") as f:
        _json.dump({"applied_through": 2}, f)
    sink(batch, 0)
    assert {r.fingerprint: r.doc_id for r in idx.read().collect()} == {"f": 9}


# --- semantic admission loop (decontam.semantic_admission_merge_sink) ---
def _adm_corpus(spark, tmp_path):
    tbl = ParquetMergeTable(spark, str(tmp_path / "sem_corpus"), "doc_id", num_buckets=2)
    tbl.create(
        spark.createDataFrame(
            [
                (1, "A", [1.0, 0.0, 0.0, 0.0]),
                (2, "B", [0.0, 1.0, 0.0, 0.0]),
            ],
            "doc_id long, label string, embedding array<double>",
        )
    )
    return tbl


def test_semantic_admission_loop_trickles(spark, tmp_path):
    """Three micro-batches through the semantic admission loop:
    corpus rejection, within-batch sequential greedy, CROSS-BATCH
    rejection (batch 2 near-dups a doc ADMITTED in batch 1 — only
    possible because admitted docs are merged before the next
    trigger), and full-replay idempotence."""
    from htmlentityextraction_spark.operators import decontam as dc

    tbl = _adm_corpus(spark, tmp_path)
    sink = dc.semantic_admission_merge_sink(
        tbl, block_col="label", threshold=0.8, id_col="doc_id"
    )
    nan = float("nan")
    novel_a = [0.0, 0.0, 1.0, 0.0]  # orthogonal to corpus doc 1's block-A vector
    b1 = spark.createDataFrame(
        [
            (10, "A", [0.999, 0.01, 0.0, 0.0]),  # near-dup of corpus 1 -> rejected
            (11, "A", novel_a),                  # admitted
            (12, "A", [0.01, 0.0, 0.999, 0.0]),  # near-dup of 11 IN-BATCH -> rejected
            (13, "A", [nan, 0.0, 0.0, 0.0]),     # corrupt -> dropped at the boundary
        ],
        "doc_id long, label string, embedding array<double>",
    )
    b2 = spark.createDataFrame(
        [
            (20, "A", [0.0, 0.01, 0.999, 0.0]),  # near-dup of 11 (ADMITTED in b1) -> rejected
            (21, "C", [0.5, 0.5, 0.5, 0.5]),     # no block-C candidates -> admitted
        ],
        "doc_id long, label string, embedding array<double>",
    )
    sink(b1, 0)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 11}
    sink(b2, 1)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 11, 21}
    v_before = tbl._read_manifest()["version"]
    sink(b1, 0)  # full restart replay of batch 1
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 11, 21}
    # nothing admitted (11 re-rejects against ITSELF) -> no new version
    assert tbl._read_manifest()["version"] == v_before


def test_semantic_admission_greedy_chain_semantics(spark, tmp_path):
    """Sequential-arrival rule within one batch: a doc the CORPUS
    rejected vetoes nothing (its in-batch near-dup is still checked
    only against ADMITTED docs), and greedy order is ascending id."""
    from htmlentityextraction_spark.operators import decontam as dc

    tbl = _adm_corpus(spark, tmp_path)
    sink = dc.semantic_admission_merge_sink(
        tbl, block_col="label", threshold=0.8, id_col="doc_id"
    )
    # 30 near-dups corpus doc 1 (cos 0.928) -> rejected by the corpus
    # probe. 31 near-dups 30 (cos 0.919) but NOT doc 1 (cos 0.707 <
    # 0.8): since 30 was never admitted it cannot veto 31 -> 31
    # admitted. 32 near-dups 31 (cos 0.9997, corpus cos only 0.725)
    # -> greedy-rejected.
    batch = spark.createDataFrame(
        [
            (30, "A", [1.0, 0.4, 0.0, 0.0]),
            (31, "A", [1.0, 1.0, 0.0, 0.0]),
            (32, "A", [1.0, 0.95, 0.0, 0.0]),
        ],
        "doc_id long, label string, embedding array<double>",
    )
    sink(batch, 0)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 31}


def test_semantic_admission_wired_into_a_real_stream(spark, tmp_path):
    """The sink runs under writeStream.foreachBatch with one
    micro-batch per trickle file (maxFilesPerTrigger=1), and the
    final corpus matches the direct-invocation result."""
    from htmlentityextraction_spark.operators import decontam as dc

    tbl = _adm_corpus(spark, tmp_path)
    src = tmp_path / "incoming"
    src.mkdir()
    rows = [
        [(10, "A", [0.999, 0.01, 0.0, 0.0]), (11, "A", [0.0, 0.0, 1.0, 0.0])],
        [(20, "A", [0.0, 0.01, 0.999, 0.0]), (21, "C", [0.5, 0.5, 0.5, 0.5])],
    ]
    schema = "doc_id long, label string, embedding array<double>"
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    # one dir per trigger keeps arrival order deterministic
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            dc.semantic_admission_merge_sink(
                tbl, block_col="label", threshold=0.8, id_col="doc_id"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 11, 21}


def test_semantic_admission_tolerates_empty_and_ragged_batches(spark, tmp_path):
    """Production edges that must not kill the stream: an empty
    micro-batch, an all-corrupt micro-batch, and a RAGGED one (a
    mixed-dimensionality vector among normal ones — a mis-versioned
    encoder's output). A mixed-dim pair has no defined cosine, so the
    odd vector neither vetoes nor is vetoed; it is admitted like any
    candidate with no comparable neighbors."""
    from htmlentityextraction_spark.operators import decontam as dc

    tbl = _adm_corpus(spark, tmp_path)
    sink = dc.semantic_admission_merge_sink(
        tbl, block_col="label", threshold=0.8, id_col="doc_id"
    )
    schema = "doc_id long, label string, embedding array<double>"
    sink(spark.createDataFrame([], schema), 0)  # empty batch: no-op
    nan = float("nan")
    sink(spark.createDataFrame([(40, "A", [nan, 0.0, 0.0, 0.0])], schema), 1)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2}
    ragged = spark.createDataFrame(
        [
            (41, "A", [0.0, 0.0, 1.0, 0.0]),   # novel 4-dim -> admitted
            (42, "A", [0.7, 0.7]),             # 2-dim among 4-dim: no defined
                                               # cosine vs anything -> admitted
            (43, "A", [0.0, 0.01, 0.999, 0.0]),  # near-dups 41 -> rejected
        ],
        schema,
    )
    sink(ragged, 2)
    assert {r.doc_id for r in tbl.read().collect()} == {1, 2, 41, 42}


def test_semantic_admission_pruned_corpus_read(spark, tmp_path):
    """When the corpus table tracks zone-map stats on the block column
    and its layout clusters blocks (ingestion-ordered ids + range
    bucketing here), each trigger reads ONLY the buckets whose block
    range intersects the batch's blocks — read_where, never a full
    read(); without block stats the sink falls back to read() and
    never calls read_where. Both pinned with fail-loud proxies, plus
    a quantitative files-opened check on the clustered layout."""
    from htmlentityextraction_spark.operators import decontam as dc

    schema = "doc_id long, label string, embedding array<double>"
    # labels cluster with the id ranges range-bucketing splits on:
    # A = ids 0-99, B = 100-199, C = 200-299 (width 50 -> 2 buckets each)
    rows = [
        (i, lab, [float(i % 7 + 1), float(i % 5 + 1), 1.0, 0.0])
        for base, lab in ((0, "A"), (100, "B"), (200, "C"))
        for i in range(base, base + 100)
    ]

    class _NoFullRead(ParquetMergeTable):
        def read(self, version=None):
            raise AssertionError("pruned sink must not full-scan the corpus")

    class _NoPrunedRead(ParquetMergeTable):
        def read_where_in(self, col, values, version=None):
            raise AssertionError("stats-less sink must not take the pruned path")

    pruned = _NoFullRead(
        spark, str(tmp_path / "pruned"), "doc_id",
        bucketing="range", range_width=50, stats_cols=["label"],
    )
    # create() goes through the real class: the proxy only guards the
    # sink's probe-time reads
    ParquetMergeTable(
        spark, str(tmp_path / "pruned"), "doc_id",
        bucketing="range", range_width=50, stats_cols=["label"],
    ).create(spark.createDataFrame(rows, schema))

    # the pruning is real on this layout: label B lives in 2 of 6 buckets
    b_files = pruned.read_where("label", "B", "B").inputFiles()
    total_files = ParquetMergeTable(
        spark, str(tmp_path / "pruned"), "doc_id",
        bucketing="range", range_width=50, stats_cols=["label"],
    ).files().count()
    assert 0 < len(b_files) <= total_files / 3

    sink = dc.semantic_admission_merge_sink(
        pruned, block_col="label", threshold=0.999999, id_col="doc_id"
    )
    batch = spark.createDataFrame(
        [(500, "B", [9.0, 9.0, 9.0, 1.0]), (501, "B", [9.0, 1.0, 9.0, 1.0])],
        schema,
    )
    sink(batch, 0)  # would raise if read() were touched
    got = {r.doc_id for r in ParquetMergeTable(
        spark, str(tmp_path / "pruned"), "doc_id",
        bucketing="range", range_width=50, stats_cols=["label"],
    ).read().collect()}
    assert {500, 501} <= got and len(got) == 302

    plain = _NoPrunedRead(spark, str(tmp_path / "plain"), "doc_id", num_buckets=4)
    plain.create(spark.createDataFrame(rows, schema))
    sink2 = dc.semantic_admission_merge_sink(
        plain, block_col="label", threshold=0.999999, id_col="doc_id"
    )
    sink2(batch, 0)  # would raise if read_where were touched
    assert {r.doc_id for r in plain.read().collect()} >= {500, 501}


def test_semantic_admission_touched_blocks_ratio_at_64_blocks(spark, tmp_path):
    """Quantitative O(touched blocks) contract at a block cardinality
    far past the 3-label smoke fixture: a 64-block corpus (one range
    bucket per block), a batch touching 2 blocks. The sink's corpus
    read must open ~2/64 of the table's files — asserted through
    ``prune_report_in`` (the manifest-level decision the sink's
    ``read_where_in`` executes) AND through the actual files a pruned
    read lists. One manifest pass + ONE scan however many blocks the
    batch names (the per-block ``read_where`` union this replaced
    degenerated to |blocks| manifest probes)."""
    from htmlentityextraction_spark.operators import decontam as dc

    schema = "doc_id long, block long, embedding array<double>"
    n_blocks, per_block = 64, 8
    rows = [
        (b * 100 + i, b, [float(b), float(i + 1), 1.0, 0.0])
        for b in range(n_blocks)
        for i in range(per_block)
    ]
    path = str(tmp_path / "blocks64")
    tbl = ParquetMergeTable(
        spark, path, "doc_id",
        bucketing="range", range_width=100, stats_cols=["block"],
    )
    tbl.create(spark.createDataFrame(rows, schema))
    assert len(tbl._read_manifest()["buckets"]) == n_blocks

    # manifest-level decision: exactly the 2 touched blocks scanned
    rep = tbl.prune_report_in("block", [5, 41])
    assert len(rep["scanned"]) == 2
    assert len(rep["skipped"]) == n_blocks - 2

    # physical-level: the pruned read lists ~2/64 of the files
    total_files = tbl.files().count()
    opened = tbl.read_where_in("block", [5, 41]).inputFiles()
    assert 0 < len(opened) <= total_files * 2 / n_blocks

    # and the sink actually takes that path end-to-end
    class _CountingTable(ParquetMergeTable):
        reads: list = []

        def read_where_in(self, col, values, version=None):
            df = super().read_where_in(col, values, version)
            _CountingTable.reads.append(len(df.inputFiles()))
            return df

        def read(self, version=None):
            raise AssertionError("64-block sink must not full-scan")

    counting = _CountingTable(
        spark, path, "doc_id",
        bucketing="range", range_width=100, stats_cols=["block"],
    )
    sink = dc.semantic_admission_merge_sink(
        counting, block_col="block", threshold=0.999999, id_col="doc_id"
    )
    batch = spark.createDataFrame(
        [(9000, 5, [50.0, 1.0, 9.0, 1.0]), (9001, 41, [60.0, 2.0, 9.0, 1.0])],
        schema,
    )
    sink(batch, 0)
    assert len(_CountingTable.reads) == 1, "corpus must be read ONCE per trigger"
    assert _CountingTable.reads[0] <= total_files * 2 / n_blocks
    got = {r.doc_id for r in tbl.read().collect()}
    assert {9000, 9001} <= got and len(got) == n_blocks * per_block + 2
