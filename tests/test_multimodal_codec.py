"""Optional real-codec decode path (gated on PIL availability; the
deterministic stand-in decode is the always-on CI path, exercised by
the 4 multimodal queries)."""

from __future__ import annotations

import numpy as np
import pytest

from htmlentityextraction_spark.operators import multimodal as mm


def test_non_image_media_stays_gated():
    with pytest.raises(NotImplementedError, match="media_type='audio'"):
        mm.decode_with_codec(b"\x00\x01", "audio")


def test_codec_cross_validates_against_pil_when_present():
    """One PIL-gated suite: PIL-encoded PNG through decode_with_codec,
    our PNG encoder through PIL's decoder, and PIL's decoder against
    our own on PIL's filter choices."""
    PIL = pytest.importorskip("PIL")
    import io

    import PIL.Image

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(12, 16), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(pixels, mode="L").save(buf, format="PNG")
    decoded = mm.decode_with_codec(buf.getvalue(), "image")
    assert decoded.dtype == np.uint8
    np.testing.assert_array_equal(decoded, pixels)

    rgb = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    # our encoder → PIL decoder
    with PIL.Image.open(io.BytesIO(mm.encode_png(rgb))) as img:
        np.testing.assert_array_equal(np.asarray(img), rgb)
    # PIL encoder (emits its own filter choices) → our decoder
    buf = io.BytesIO()
    PIL.Image.fromarray(rgb, mode="RGB").save(buf, format="PNG")
    np.testing.assert_array_equal(mm._decode_png(buf.getvalue()), rgb)


def test_codec_decode_gated_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="no codec library"):
        mm.decode_with_codec(b"\x89PNG", "image")


# --- stdlib codecs: REAL decode paths with no library gate ----------------

def test_netpbm_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for pixels in (gray, rgb):
        decoded = mm.decode_with_codec(mm.encode_netpbm(pixels), "image")
        assert decoded.dtype == np.uint8
        np.testing.assert_array_equal(decoded, pixels)


def test_netpbm_header_comments_and_whitespace():
    pixels = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"P5\n# a comment line\n4   3\n# another\n255\n" + pixels.tobytes()
    np.testing.assert_array_equal(mm.decode_with_codec(raw, "image"), pixels)


def _encode_bmp_24(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP writer (test fixture
    twin of the decoder: padding, BGR order, BITMAPINFOHEADER)."""
    import struct

    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def test_bmp_decode_roundtrip_with_row_padding():
    rng = np.random.default_rng(13)
    # width 5 -> 15-byte rows padded to 16: exercises the stride logic
    pixels = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    decoded = mm.decode_with_codec(_encode_bmp_24(pixels), "image")
    np.testing.assert_array_equal(decoded, pixels)


def test_codec_decode_distributed_map_in_pandas(spark):
    """The stdlib codec path works executor-side through the same
    Arrow-batched mapInPandas shape the multimodal queries use."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(17)
    rows = []
    for i in range(8):
        pixels = rng.integers(0, 256, size=(4 + i, 6), dtype=np.uint8)
        rows.append((i, bytearray(mm.encode_netpbm(pixels)), float(pixels.mean())))
    df = spark.createDataFrame(rows, "doc_id long, payload binary, want_mean double")

    def feats(it):
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = mm.decode_with_codec(bytes(r.payload), "image")
                out.append((r.doc_id, float(arr.mean()), int(arr.shape[0])))
            yield pd.DataFrame(out, columns=["doc_id", "mean_px", "height"])

    got = {
        r.doc_id: (r.mean_px, r.height)
        for r in df.repartition(4)
        .mapInPandas(feats, "doc_id long, mean_px double, height int")
        .collect()
    }
    want = {r[0]: (r[2], 4 + r[0]) for r in rows}
    assert {k: (round(v[0], 6), v[1]) for k, v in got.items()} == {
        k: (round(v[0], 6), v[1]) for k, v in want.items()
    }


def test_png_roundtrip_all_channel_layouts():
    rng = np.random.default_rng(23)
    shapes = [(9, 13), (7, 5, 2), (6, 11, 3), (5, 4, 4)]  # L, LA, RGB, RGBA
    for shape in shapes:
        pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
        decoded = mm.decode_with_codec(mm.encode_png(pixels), "image")
        assert decoded.dtype == np.uint8
        np.testing.assert_array_equal(decoded, pixels)


def _png_forward_filter(pixels: np.ndarray, ftype: int) -> bytes:
    """Forward-apply one PNG scanline filter to every row (the spec's
    encoder direction — independent twin of the decoder's inverse)."""
    bpp = 1 if pixels.ndim == 2 else pixels.shape[2]
    h, w = pixels.shape[:2]
    flat = pixels.reshape(h, w * bpp).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        out.append(ftype)
        for x in range(w * bpp):
            a = int(row[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(row[x]) - pred) & 0xFF)
        prev = row
    return bytes(out)


def test_png_decoder_inverts_all_five_filters():
    """Hand-filter the raw stream with each of the spec's five filter
    types and assert the decoder recovers the original pixels — covers
    the Sub/Up/Average/Paeth inverses the filter-0 encoder never
    emits."""
    import struct
    import zlib

    rng = np.random.default_rng(29)
    for shape in [(6, 7), (5, 4, 3)]:
        pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
        h, w = shape[:2]
        color_type = 0 if pixels.ndim == 2 else 2
        for ftype in range(5):
            raw = _png_forward_filter(pixels, ftype)

            def chunk(ctype, data):
                body = ctype + data
                return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

            png = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )
            np.testing.assert_array_equal(
                mm.decode_with_codec(png, "image"), pixels, err_msg=f"filter {ftype}"
            )


def test_png_ancillary_chunks_and_split_idat():
    """Chunk walk skips ancillary chunks and concatenates multiple
    IDATs (both legal per the spec and common in the wild)."""
    import struct
    import zlib

    pixels = np.arange(24, dtype=np.uint8).reshape(4, 6)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(4))
    comp = zlib.compress(raw)
    mid = len(comp) // 2

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0))
        + chunk(b"tEXt", b"Comment\x00synthetic fixture")
        + chunk(b"IDAT", comp[:mid])
        + chunk(b"IDAT", comp[mid:])
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(mm.decode_with_codec(png, "image"), pixels)


def test_png_exotic_forms_stay_gated():
    """16-bit / paletted / interlaced PNGs raise NotImplementedError
    from the stdlib decoder (decode_with_codec then defers to PIL)."""
    import struct
    import zlib

    def png_with_ihdr(depth, color_type, interlace):
        def chunk(ctype, data):
            body = ctype + data
            return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, color_type, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b"")
        )

    for depth, color_type, interlace in [(16, 0, 0), (8, 3, 0), (8, 0, 1)]:
        with pytest.raises(NotImplementedError, match="PIL"):
            mm._decode_png(png_with_ihdr(depth, color_type, interlace))


def test_netpbm_16bit_stays_gated():
    pixels = np.zeros((2, 2), dtype=np.uint8)
    raw = b"P5\n2 2\n65535\n" + pixels.tobytes() * 2
    with pytest.raises(NotImplementedError, match="16-bit"):
        mm.decode_with_codec(raw, "image")


def test_bmp_unsupported_depth_stays_gated():
    import struct

    # 8bpp header with no pixel data: depth gate must fire before reads
    header = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 2835, 2835, 0, 0)
    with pytest.raises(NotImplementedError, match="24-bit"):
        mm.decode_with_codec(header + dib, "image")


def test_bmp_topdown_negative_height():
    import struct

    rng = np.random.default_rng(19)
    pixels = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    w, h = 4, 3
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, : w * 3] = pixels[:, :, ::-1].reshape(h, w * 3)  # top-down BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    decoded = mm.decode_with_codec(header + dib + data, "image")
    np.testing.assert_array_equal(decoded, pixels)
