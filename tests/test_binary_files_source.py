"""binaryFile multimodal ingestion: schema parity with attach_media,
extension typing, glob pushdown, and downstream operator
compatibility."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.multimodal import extract_features
from htmlentityextraction_spark.sources.binary_files import read_media_dir


def _media_dir() -> str:
    d = tempfile.mkdtemp(prefix="media_")
    for name, payload in [
        ("a.jpg", b"\x01\x02\x03\x04" * 8),
        ("b.png", b"\x09" * 50),
        ("c.wav", b"\x00\x01" * 100),
        ("d.mp4", b"\x7f" * 64),
        ("notes.txt", b"not media"),
    ]:
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    return d


def test_read_media_dir_schema_and_types(spark):
    d = _media_dir()
    df = read_media_dir(spark, d)
    rows = {os.path.basename(r["source_path"]): r for r in df.collect()}
    assert len(rows) == 5
    assert rows["a.jpg"]["media"]["media_type"] == "image"
    assert rows["c.wav"]["media"]["media_type"] == "audio"
    assert rows["d.mp4"]["media"]["media_type"] == "video"
    assert rows["notes.txt"]["media"]["media_type"] == "unknown"
    assert rows["b.png"]["media"]["n_bytes"] == 50
    assert bytes(rows["a.jpg"]["payload"]) == b"\x01\x02\x03\x04" * 8
    # container metadata unknown at ingest
    assert rows["a.jpg"]["media"]["width"] is None
    # payload column is BINARY
    assert dict(df.dtypes)["payload"] == "binary"


def test_glob_filter_pushdown(spark):
    d = _media_dir()
    df = read_media_dir(spark, d, glob="*.jpg")
    assert df.count() == 1
    # the filter must reach the file listing, not a post-scan filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" not in plan.split("FileScan")[0]


def test_downstream_media_ops_run_on_file_backed_corpus(spark):
    d = _media_dir()
    media = read_media_dir(spark, d).where(
        F.col("media.media_type") != "unknown"
    ).withColumn(
        # byte features need a width; fill the codec-stage value
        "media",
        F.col("media").withField("width", F.lit(4).cast("int")),
    )
    feats = extract_features(media)
    got = feats.collect()
    assert len(got) == 4
    assert all(r["n_bytes"] > 0 for r in got)
