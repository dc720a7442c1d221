"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (BASELINE.json north star; no counterpart in the reference —
this is the 100 TB training-data extension).

Design for scale:

- payloads are opaque ``binary`` columns; metadata is a typed STRUCT
  (media_type, width, height, n_frames, sample_rate, n_bytes) so
  Catalyst can prune/filter on metadata WITHOUT touching payload bytes
  (column pruning keeps the heavy column out of scans that don't need
  it — verify via ReadSchema);
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` so payload bytes cross the JVM→Python
  boundary once per batch, not per row;
- partitioning guidance: media tables should be written bucketed by
  doc_id and sized so one task's payload batch fits executor memory
  (metadata.n_bytes enables size-aware repartitioning before the UDF).

STUB NOTE: the actual codecs (PIL/libav/ffmpeg) are NOT in this
container. ``decode_payload`` uses a deterministic fake decode
(numpy frombuffer → shaped uint8 array) so every schema, batch shape,
and partition behavior is real and tested; ``decode_with_codec`` is
the gated entry point that raises NotImplementedError until a codec
library is installed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: payload = utf-8 bytes of the text,
    media_type cycles by id, metadata derived from payload size. The
    payload column is genuinely BINARY — everything downstream treats
    it as opaque."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(payload).cast("long")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")
    )
    width = (F.pmod(F.col(id_col), F.lit(16)) + 4).cast("int")
    meta = F.struct(
        mt.alias("media_type"),
        width.alias("width"),
        (n_bytes / width).cast("int").alias("height"),
        F.when(mt == "video", (F.pmod(F.col(id_col), F.lit(8)) + 2))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("n_frames"),
        F.when(mt == "audio", F.lit(16000)).otherwise(F.lit(0)).cast("int").alias("sample_rate"),
        n_bytes.alias("n_bytes"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("media")
    )


def decode_payload(payload: bytes, width: int) -> np.ndarray:
    """Deterministic fake decode: bytes → uint8 matrix of shape
    (n_bytes // width, width). Stands in for a real image decode; the
    Spark-side plumbing (batching, schema, shapes) is identical."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = len(arr) // width
    return arr[: h * width].reshape(h, width)


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Pure-stdlib decode of binary netpbm images: P5 (grayscale) →
    (H, W), P6 (RGB) → (H, W, 3), uint8. Real parsing of a real
    on-disk format (magic, #-comments, token whitespace, maxval),
    not a stand-in — it is the codec path that runs in codec-less
    containers."""
    magic = payload[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace separates the header from pixels
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape((height, width, 3) if channels == 3 else (height, width))


def encode_netpbm(arr: np.ndarray) -> bytes:
    """uint8 array → binary netpbm bytes: (H, W) → P5, (H, W, 3) → P6.
    The fixture-side twin of ``_decode_netpbm`` (round-trip tested)."""
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-stdlib decode of uncompressed 24-bit BMP → (H, W, 3)
    RGB uint8 (rows are stored bottom-up and BGR, padded to 4
    bytes — all handled here)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got {bpp}bpp)")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_with_codec(payload: bytes, media_type: str) -> np.ndarray:
    """Real-codec decode of an ENCODED image payload, returning the
    pixel array (H, W[, C]) as uint8.

    Stdlib codecs run everywhere: binary netpbm (P5/P6) and
    uncompressed 24-bit BMP are parsed in-process (magic-dispatched,
    round-trip tested in tests/test_multimodal_codec.py with no
    library gate). Compressed formats (PNG/JPEG/...) dispatch to PIL
    and stay gated on its availability; audio/video stay gated until
    a matching codec lib exists. Either way the Spark-side plumbing
    (mapInPandas batching, schema, partitioning) is identical to the
    deterministic stand-in ``decode_payload`` the 4 multimodal
    queries exercise.
    """
    if media_type != "image":
        raise NotImplementedError(
            f"no codec wired for media_type={media_type!r}; only image "
            "decode has codec integrations (netpbm/BMP stdlib, PNG/JPEG via PIL)"
        )
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    try:
        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "no codec library in this environment; decode_payload provides "
            "the deterministic stand-in"
        ) from exc
    import io

    with PIL.Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L") if img.mode == "1" else img).astype(np.uint8)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("std_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload numeric features via one Arrow batch pass (the
    'embed this image' shape: bytes in → fixed-width vector out)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["payload"], dtype=np.uint8)
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "media_type": r["media"]["media_type"],
                        "n_bytes": len(arr),
                        "mean_byte": round(float(arr.mean()) + 1e-9, 6),
                        "std_byte": round(float(arr.std()) + 1e-9, 6),
                        "max_byte": int(arr.max()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(go, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Stride-subsample 'resize' of image payloads (every factor-th
    row/col of the fake-decoded matrix) — deterministic, checksummed."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["media"]["media_type"] != "image":
                    continue
                img = decode_payload(r["payload"], int(r["media"]["width"]))
                small = img[::factor, ::factor]
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "out_width": small.shape[1],
                        "out_height": small.shape[0],
                        "checksum": int(small.astype(np.int64).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.mapInPandas(go, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Split each video payload into metadata.n_frames equal chunks
    and emit one row per frame (the 1→N UDTF shape for video)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["media"]["media_type"] != "video":
                    continue
                arr = np.frombuffer(r["payload"], dtype=np.uint8)
                n = int(r["media"]["n_frames"])
                size = len(arr) // n
                for i in range(n):
                    chunk = arr[i * size : (i + 1) * size]
                    rows.append(
                        {
                            "doc_id": r["doc_id"],
                            "frame_idx": i,
                            "frame_bytes": len(chunk),
                            "frame_checksum": int(chunk.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(go, FRAME_SCHEMA)
