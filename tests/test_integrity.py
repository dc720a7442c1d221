"""verify_integrity: manifest-vs-storage audit catches missing bucket
dirs and row-count drift; a healthy table audits clean."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.incremental import OP_UPSERT, ParquetMergeTable


def _table(spark, path):
    df = spark.range(0, 400).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    tbl = ParquetMergeTable(spark, path, key_col="k", num_buckets=4)
    tbl.create(df)
    return tbl


def test_healthy_table_audits_clean(spark):
    tbl = _table(spark, tempfile.mkdtemp(prefix="integ_"))
    rep = tbl.verify_integrity()
    assert rep["ok"] and not rep["missing"] and not rep["mismatched"]
    assert not rep["unverified"]  # counts recorded at write time


def test_merge_keeps_audit_clean(spark):
    tbl = _table(spark, tempfile.mkdtemp(prefix="integ2_"))
    upd = spark.createDataFrame([(1, 99, OP_UPSERT), (5000, 1, OP_UPSERT)],
                                "k long, v long, op string")
    tbl.merge(upd)
    assert tbl.verify_integrity()["ok"]


def test_missing_bucket_detected(spark):
    path = tempfile.mkdtemp(prefix="integ3_")
    tbl = _table(spark, path)
    m = tbl._read_manifest()
    victim_rel = next(iter(sorted(m["buckets"].values())))
    shutil.rmtree(os.path.join(path, victim_rel))
    rep = tbl.verify_integrity()
    assert not rep["ok"] and len(rep["missing"]) == 1


def test_row_drift_detected(spark):
    path = tempfile.mkdtemp(prefix="integ4_")
    tbl = _table(spark, path)
    m = tbl._read_manifest()
    victim_rel = next(iter(sorted(m["buckets"].values())))
    full = os.path.join(path, victim_rel)
    # "corrupt" the bucket: append an extra parquet file out of band
    extra = tbl.spark.createDataFrame([(999999, 0)], "k long, v long")
    extra.coalesce(1).write.mode("append").parquet(full)
    rep = tbl.verify_integrity()
    assert not rep["ok"]
    assert rep["mismatched"] and rep["mismatched"][0]["actual"] > rep["mismatched"][0]["expected"]


def test_snapshots_and_files_metadata_tables(spark):
    tbl = _table(spark, tempfile.mkdtemp(prefix="meta_"))
    upd = spark.createDataFrame([(1, 99, OP_UPSERT)], "k long, v long, op string")
    tbl.merge(upd)
    snaps = {r["version"]: r for r in tbl.snapshots().collect()}
    assert set(snaps) == {1, 2}
    assert snaps[1]["total_rows"] == 400 and snaps[2]["total_rows"] == 400
    assert snaps[2]["num_buckets"] == 4 and snaps[2]["bucketing"] == "hash"
    files = tbl.files().collect()
    assert files and all(r["size_bytes"] > 0 for r in files)
    assert {r["bucket"] for r in files} == set(tbl._read_manifest()["buckets"])
