"""Partition-spec evolution: rebucket rewrites the snapshot under a
new transform, the spec persists in the manifest, later openers adopt
it, pruning works under the new layout, and history stays readable."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.incremental import ParquetMergeTable


def _table(spark, path, **kw):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    tbl = ParquetMergeTable(spark, path, key_col="k", **kw)
    tbl.create(df)
    return df, tbl


def test_rebucket_hash_to_range_enables_range_pruning(spark):
    path = tempfile.mkdtemp(prefix="rb_")
    df, tbl = _table(spark, path, num_buckets=4)
    res = tbl.rebucket(bucketing="range", range_width=100)
    assert res["n_buckets"] == 10  # 1000 keys / width 100
    # content preserved
    assert tbl.read().count() == 1000
    assert tbl.read().agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    # range predicates now prune to the covering buckets
    rep = tbl.prune_report("k", lo=250, hi=349)
    assert len(rep["scanned"]) < len(rep["scanned"]) + len(rep["skipped"])
    assert len(rep["scanned"]) <= 2
    assert tbl.read_where("k", lo=250, hi=349).count() == 100


def test_spec_persists_for_new_openers(spark):
    path = tempfile.mkdtemp(prefix="rb2_")
    _, tbl = _table(spark, path, num_buckets=4)
    tbl.rebucket(bucketing="range", range_width=100)
    # a fresh opener passing stale/default args adopts the table spec
    reopened = ParquetMergeTable(spark, path, key_col="k", num_buckets=16)
    assert reopened.bucketing == "range" and reopened.range_width == 100
    # and its point lookup reads only one bucket under the new layout
    assert reopened.read_key(777).collect()[0]["v"] == 777 * 3


def test_rebucket_grow_buckets_and_history_readable(spark):
    path = tempfile.mkdtemp(prefix="rb3_")
    _, tbl = _table(spark, path, num_buckets=2)
    v1_count = tbl.read(1).count()
    tbl.rebucket(num_buckets=8)
    m = tbl._read_manifest()
    assert m["spec"]["num_buckets"] == 8
    assert len(m["buckets"]) == 8
    # time travel to the pre-rebucket snapshot still works
    assert tbl.read(1).count() == v1_count == 1000
    # merges after rebucketing land in the new layout
    from htmlentityextraction_spark.operators.incremental import OP_UPSERT

    upd = spark.createDataFrame([(5, -1, OP_UPSERT)], "k long, v long, op string")
    tbl.merge(upd)
    assert tbl.read_key(5).collect()[0]["v"] == -1
    assert tbl.read().count() == 1000
