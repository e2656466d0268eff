"""Baseline JPEG codec: roundtrips, exactness islands, robustness.

JPEG is lossy, so generic roundtrips assert bounded error; per-block-
constant images are an EXACTNESS island (at quality 75 the luma DC
quant step is exactly 8, so (v-128)*8/8 survives quantization
bit-perfectly) — that island is what q110's analytic oracle stands
on. Subsampling, restart markers, and truncation are exercised
explicitly because they are the paths real-world files hit.
"""

from __future__ import annotations

import numpy as np
import pytest

from conveyor_spark.datapipe.codecs import MediaDecodeError, decode_image
from conveyor_spark.datapipe.jpeg import jpeg_encode, jpeg_pixels
from tests.conftest import run_op


def _smooth_rgb(h=32, w=48):
    rgb = np.zeros((h, w, 3), "uint8")
    rgb[..., 0] = np.linspace(40, 200, w)[None, :]
    rgb[..., 1] = np.linspace(200, 40, h)[:, None]
    rgb[..., 2] = 90
    return rgb


def test_gray_roundtrip_bounded():
    img = ((np.arange(24)[:, None] * 9 + np.arange(17) * 5) % 256).astype(
        "uint8")
    back = jpeg_pixels(jpeg_encode(img, quality=90))
    assert back.shape == (24, 17, 1)
    assert np.abs(back[:, :, 0].astype(int) - img.astype(int)).max() <= 12


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("rst", [0, 3])
def test_color_roundtrip_bounded(sub, rst):
    rgb = _smooth_rgb(37, 53)
    back = jpeg_pixels(
        jpeg_encode(rgb, quality=90, subsampling=sub, restart_interval=rst))
    assert back.shape == rgb.shape
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.max() <= (6 if sub == "444" else 10), err.max()


def test_restart_markers_change_nothing():
    """RSTn + DC reset must reproduce the exact no-restart pixels."""
    rgb = _smooth_rgb()
    a = jpeg_pixels(jpeg_encode(rgb, quality=90))
    b = jpeg_pixels(jpeg_encode(rgb, quality=90, restart_interval=2))
    assert (a == b).all()


def test_constant_blocks_exact_at_q75():
    """Per-block-constant gray at quality 75: quant step 8 divides
    the DC term — decode returns the EXACT input values (q110's
    foundation)."""
    img = np.zeros((16, 16), "uint8")
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 13, 200, 0, 255
    back = jpeg_pixels(jpeg_encode(img, quality=75))[:, :, 0]
    assert (back == img).all()


def test_truncation_dies_cleanly():
    full = jpeg_encode(_smooth_rgb(16, 16), quality=80)
    for cut in range(2, len(full) - 1, 5):
        try:
            jpeg_pixels(full[:cut])
        except MediaDecodeError:
            pass


def test_progressive_rejected():
    b = bytearray(jpeg_encode(_smooth_rgb(16, 16)))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(MediaDecodeError, match="SOF2"):
        jpeg_pixels(bytes(b))


def test_decode_image_dispatches_jpeg():
    rgb = _smooth_rgb(16, 16)
    px = decode_image(jpeg_encode(rgb, quality=95))
    assert px.shape == (16, 16, 3)


def test_phash_stable_across_png_and_jpeg(ctx, spark):
    """The DCT perceptual hash of the SAME image through PNG
    (lossless) and JPEG q90 (lossy) must differ by only a few bits —
    the cross-container near-dup story media.phash exists for."""
    from conveyor_spark.datapipe.codecs import png_encode

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (64, 64, 3)).astype("uint8")
    # smooth it so jpeg loss stays perceptual, not structural
    base = (base // 4 + 96).astype("uint8")
    df = spark.createDataFrame(
        [("png", bytearray(png_encode(base))),
         ("jpg", bytearray(jpeg_encode(base, quality=90)))],
        "id STRING, content BINARY")
    out = run_op(ctx, "media.phash", [df], column="content")
    got = {r["id"]: r["phash"] for r in out.collect()}
    d = bin((got["png"] ^ got["jpg"]) & ((1 << 64) - 1)).count("1")
    assert d <= 6, f"phash hamming {d} across containers"


def test_media_resize_jpeg_output(ctx, spark):
    """resize format='jpeg': GIF in, JPEG thumbnail out, decodable
    and dimensionally exact; jpeg shards far smaller than png."""
    from conveyor_spark.datapipe.codecs import gif_encode, png_encode

    base = (_smooth_rgb(64, 64) // 32 * 32)  # <=256 colors: GIF-able
    df = spark.createDataFrame(
        [("g", bytearray(gif_encode(base)))], "id STRING, content BINARY")
    out = run_op(ctx, "media.resize", [df], column="content",
                 width=16, height=16, format="jpeg", quality=80,
                 on_error="fail")
    data = bytes(out.collect()[0]["content"])
    assert data[:3] == b"\xff\xd8\xff"
    px = decode_image(data)
    assert px.shape == (16, 16, 3)


def test_malformed_segments_die_as_media_error():
    """Review finding: struct.error/IndexError/ValueError escaped the
    decode boundary on malformed (not merely truncated) segments."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",           # SOF seglen 4
        # SOS declares 3 scan components on a 1-component frame
        bytes.fromhex("ffd8ffc0000b08001000100101110000"
                      "ffda00080301000211031100"),
        # odd-length 16-bit DQT payload
        b"\xff\xd8\xff\xdb\x00\x06\x10\x00\x01\x02",
    ]
    for payload in cases:
        with pytest.raises(MediaDecodeError):
            jpeg_pixels(payload)


def test_corrupt_jpeg_nulls_not_task_failure(ctx, spark):
    """One corrupt JPEG in a corpus must NULL out under
    on_error='null', not abort the Spark job."""
    good = jpeg_encode(_smooth_rgb(16, 16), quality=80)
    df = spark.createDataFrame(
        [("ok", bytearray(good)),
         ("bad", bytearray(b"\xff\xd8\xff\xc0\x00\x04\x08\x00"))],
        "id STRING, content BINARY")
    out = run_op(ctx, "media.pixel_stats", [df], column="content")
    got = {r["id"]: r["pixel_stats"] for r in out.collect()}
    assert got["ok"] is not None and got["bad"] is None


def test_eager_and_lazy_bit_readers_decode_identically(monkeypatch):
    """r13 optimization: restart-free scans prefetch bits and decode
    Huffman codes via an 8-bit LUT (plus direct 9..16-bit peeks).
    The per-bit lazy walk is the reference — force it and assert the
    pixels match the fast path exactly, on an image busy enough to
    exercise long (>8-bit) AC codes."""
    import conveyor_spark.datapipe.jpeg as J

    rng = np.random.RandomState(7)
    rgb = (rng.rand(48, 40, 3) * 255).astype(np.uint8)
    payload = jpeg_encode(rgb, quality=85)
    fast = jpeg_pixels(payload)

    class ForcedLazy(J._BitReader):
        @property
        def eager(self):
            return False

        @eager.setter
        def eager(self, value):  # _decode_scan's assignment is a no-op
            pass

    monkeypatch.setattr(J, "_BitReader", ForcedLazy)
    lazy = jpeg_pixels(payload)
    assert np.array_equal(fast, lazy)
