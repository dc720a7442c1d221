"""Merge-table schema evolution (round-7, VERDICT r6 item 8):
column RENAME as a metadata-only commit via Delta-style column
mapping (physical names never change, no bucket rewrite), column ADD
through merge (already supported) interacting with renames, CDC
across a rename boundary, and the streaming CDC source's fail-loud +
restart contract for evolution published mid-stream."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.incremental import ParquetMergeTable
from htmlentityextraction_spark.sources.mergetable_cdc_source import (
    MergeTableCDCDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(MergeTableCDCDataSource)


def _mk(spark, path, n=12):
    tbl = ParquetMergeTable(spark, path, "k", num_buckets=4, stats_cols=["price"])
    tbl.create(
        spark.createDataFrame(
            [(i, float(i), f"s{i}") for i in range(n)],
            "k long, price double, tag string",
        )
    )
    return tbl


# ---------------------------------------------------------------- rename


def test_rename_is_metadata_only_and_time_travel_keeps_old_names(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    before = tbl._read_manifest()
    tbl.rename_column("price", "unit_price")
    after = tbl._read_manifest()
    # metadata-only: every bucket path identical, one version bump
    assert after["buckets"] == before["buckets"]
    assert after["version"] == before["version"] + 1
    # current read shows the new logical name with the old values
    cur = tbl.read()
    assert "unit_price" in cur.columns and "price" not in cur.columns
    assert {r.k: r.unit_price for r in cur.collect()}[7] == 7.0
    # time travel shows each snapshot under ITS names
    old = tbl.read(version=before["version"])
    assert "price" in old.columns and "unit_price" not in old.columns


def test_rename_guards(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="bucketing key"):
        tbl.rename_column("k", "key2")
    with pytest.raises(ValueError, match="no such column"):
        tbl.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        tbl.rename_column("price", "tag")
    # double rename walks the chain back to the same physical column
    tbl.rename_column("price", "p2")
    tbl.rename_column("p2", "p3")
    assert {r.k: r.p3 for r in tbl.read().collect()}[3] == 3.0


def test_merge_under_new_name_and_pruned_reads(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    tbl.rename_column("price", "unit_price")
    # upserts arrive under the LOGICAL name and land in the physical
    # column; combine semantics translate too
    tbl.merge(
        spark.createDataFrame(
            [(3, 100.0, "x3", "upsert"), (50, 0.5, "nw", "upsert")],
            "k long, unit_price double, tag string, op string",
        ),
        combine={"unit_price": "sum"},
    )
    got = {r.k: r.unit_price for r in tbl.read().collect()}
    assert got[3] == 103.0 and got[50] == 0.5
    # zone-map pruning consults the physical stats under the logical name
    rep = tbl.prune_report("unit_price", lo=90.0)
    assert rep["skipped"], "rename must not disable zone-map pruning"
    vals = {r.unit_price for r in tbl.read_where("unit_price", lo=90.0).collect()}
    assert vals == {103.0}


def test_add_column_colliding_with_retired_physical_name(spark, tmp_path):
    # rename price -> unit_price (physical stays "price"), then ADD a
    # NEW logical column named "price": it must get its own storage,
    # never silently overwrite unit_price's physical column
    tbl = _mk(spark, str(tmp_path / "t"), n=4)
    tbl.rename_column("price", "unit_price")
    tbl.merge(
        spark.createDataFrame(
            [(0, 0.0, "s0", 9.99, "upsert")],
            "k long, unit_price double, tag string, price double, op string",
        )
    )
    row = {r.k: r for r in tbl.read().collect()}
    assert row[0].unit_price == 0.0 and row[0].price == 9.99
    assert row[1].unit_price == 1.0 and row[1].price is None
    m = tbl._read_manifest()
    # both logical names exist, mapped to DISTINCT physical columns
    assert m["mapping"]["unit_price"] == "price"
    assert m["mapping"]["price"] != "price"


def test_table_changes_across_rename_boundary(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"), n=6)  # v1
    tbl.merge(
        spark.createDataFrame(
            [(2, 22.0, "s2", "upsert")], "k long, price double, tag string, op string"
        )
    )  # v2
    tbl.rename_column("price", "unit_price")  # v3 (metadata only)
    tbl.merge(
        spark.createDataFrame(
            [(2, 222.0, "s2", "upsert")],
            "k long, unit_price double, tag string, op string",
        )
    )  # v4
    # CDC spanning the rename: physical diff stays aligned, output
    # uses the TO-version's logical names
    ch = tbl.table_changes(1, 4)
    assert "old_unit_price" in ch.columns and "new_unit_price" in ch.columns
    rows = {r.k: r for r in ch.collect()}
    assert rows[2].change_type == "update"
    assert rows[2].old_unit_price == 2.0 and rows[2].new_unit_price == 222.0
    # CDC ending BEFORE the rename keeps the old logical names
    ch_old = tbl.table_changes(1, 2)
    assert "old_price" in ch_old.columns


def test_optimize_and_rebucket_survive_rename(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    tbl.rename_column("price", "unit_price")
    tbl.optimize(target_files_per_bucket=1)
    assert {r.k: r.unit_price for r in tbl.read().collect()}[5] == 5.0
    tbl.rebucket(num_buckets=2)
    assert {r.k: r.unit_price for r in tbl.read().collect()}[5] == 5.0
    # zone maps rebuilt by rebucket are still consulted post-rename
    assert set(tbl.read_where("unit_price", lo=4.9, hi=5.1).select("k").toPandas()["k"]) == {5}


# -------------------------------------------- streaming CDC source


def _start_stream(spark, src, out, starting=None):
    reader = spark.readStream.format("mergetable-cdc").option("path", src)
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    return (
        reader.load()
        .writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "_ck"))
        .trigger(availableNow=True)
        .start()
    )


def test_cdc_stream_fails_loud_on_midstream_evolution_then_restart(spark, tmp_path):
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    d, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    tbl = _mk(spark, d, n=6)  # v1
    # LIVE stream (the availableNow path re-pins the schema at every
    # start, so only a running stream can observe mid-stream evolution)
    q = (
        spark.readStream.format("mergetable-cdc")
        .option("path", d)
        .option("startingVersion", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "_ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    for _ in range(120):  # wait for the v1 bootstrap batch to commit
        time.sleep(0.5)
        try:
            if spark.read.parquet(os.path.join(out, "data")).count() >= 6:
                break
        except Exception:
            pass
    else:
        raise AssertionError("bootstrap batch never committed")
    # evolve WHILE the stream runs: add a column + change a row
    tbl.merge(
        spark.createDataFrame(
            [(1, 11.0, "s1", 5, "upsert")],
            "k long, price double, tag string, qty int, op string",
        )
    )  # v2 (schema evolves)
    with pytest.raises(StreamingQueryException, match="restart the stream"):
        q.awaitTermination(120)
    # restart from the same checkpoint: the new reader pins the
    # EVOLVED schema and resumes at the committed offset (v1)
    q3 = _start_stream(spark, d, out)
    q3.awaitTermination(180)
    got = spark.read.option("mergeSchema", "true").parquet(os.path.join(out, "data"))
    assert "old_qty" in got.columns and "new_qty" in got.columns
    upd = [r for r in got.collect() if r.change_type == "update" and r.k == 1]
    assert len(upd) == 1
    assert upd[0].old_price == 1.0 and upd[0].new_price == 11.0
    assert upd[0].old_qty is None and upd[0].new_qty == 5


def test_cdc_stream_logical_names_after_rename(spark, tmp_path):
    d, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    tbl = _mk(spark, d, n=4)  # v1
    tbl.merge(
        spark.createDataFrame(
            [(0, 10.0, "s0", "upsert")], "k long, price double, tag string, op string"
        )
    )  # v2
    tbl.rename_column("price", "unit_price")  # v3
    # stream started AFTER the rename replays history under the NEW
    # logical names (physical columns align across the boundary)
    q = _start_stream(spark, d, out, starting="1")
    q.awaitTermination(180)
    got = spark.read.parquet(os.path.join(out, "data"))
    assert "new_unit_price" in got.columns and "new_price" not in got.columns
    upd = [r for r in got.collect() if r.change_type == "update"]
    assert {(r.k, r.old_unit_price, r.new_unit_price) for r in upd} == {(0, 0.0, 10.0)}
