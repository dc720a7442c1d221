"""Binary-file ingestion for multimodal corpora: Spark's built-in
``binaryFile`` source → the engine's opaque-payload media schema.

A 100 TB multimodal crawl lands as files (images/audio/video blobs)
in object storage; the scale-correct ingestion is the JVM
``binaryFile`` DataSource (distributed listing, pathGlobFilter
pushdown, content read as one BINARY column — no Python in the read
path), mapped onto the same ``(doc_id, payload, media)`` layout
``operators/multimodal.attach_media`` produces, so every downstream
media operator (extract_features, resize_images, sample_frames) runs
unchanged on file-backed corpora.

Media type comes from the file extension; width/height/frame/rate
metadata is unknown at ingest (it lives inside the container format)
and is left NULL for the codec stage to fill — only ``n_bytes`` is
known from the file itself. ``maxPartitionBytes`` controls split
sizing exactly as for parquet; one large dir of small media files
benefits from the same compaction story as any small-file table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_TO_TYPE = {
    "jpg": "image", "jpeg": "image", "png": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "avi": "video", "mkv": "video",
}


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Scan a directory of media blobs into the engine's media
    layout: ``doc_id`` (stable xxhash64 of the file path), BINARY
    ``payload``, and the typed ``media`` struct with media_type
    derived from the extension and n_bytes from the file length.
    Unknown container-level metadata stays NULL until a codec pass.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.coalesce(
        *[F.when(ext == e, F.lit(t)) for e, t in _EXT_TO_TYPE.items()],
        F.lit("unknown"),
    )
    meta = F.struct(
        mt.alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.col("length").cast("long").alias("n_bytes"),
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        meta.alias("media"),
        F.col("path").alias("source_path"),
        F.col("modificationTime").alias("modified_at"),
    )
