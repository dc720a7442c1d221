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


def test_codec_decode_roundtrip_when_pil_present():
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


def test_codec_decode_gated_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="no codec library"):
        mm.decode_with_codec(b"\x89PNG", "image")
