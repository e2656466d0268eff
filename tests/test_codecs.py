"""Pure-Python media decoders (datapipe/codecs.py) + the Spark ops'
codec='real' branches, against handcrafted spec-level fixtures —
no image library anywhere, including the tests."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from conveyor_spark.datapipe.codecs import (
    MediaDecodeError,
    gif_frames,
    gif_meta,
    jpeg_meta,
    png_meta,
    png_pixels,
    real_image_meta,
    sniff_format,
    wav_meta,
)
from tests.conftest import run_op


# -- fixture builders (the encoders live in the tests: decode must
#    invert an independent implementation of the spec) ---------------

def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + ctype + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def make_png(pixels: np.ndarray, color_type: int, filters=None) -> bytes:
    """Encode uint8 (h, w, ch) with a chosen PNG filter per row."""
    h, w, ch = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        line = pixels[y].reshape(-1).astype(np.int32)
        raw.append(f)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - (a + b) // 2
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] - pred
            raw.append(int(v) % 256)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int, ncomp: int = 3) -> bytes:
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"\x01\x11\x00" * ncomp
    return (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"  # APP0 stub
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"                                 # EOI
    )


def make_gif(w: int, h: int, n_frames: int) -> bytes:
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00")
    for i in range(n_frames):
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphics control
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + bytes([3, i, 1, 2]) + b"\x00"  # LZW sub-blocks
    out += b"\x3b"
    return bytes(out)


def make_wav(rate: int, channels: int, n_frames: int, bits=16) -> bytes:
    data = b"\x00" * (n_frames * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * bits // 8, channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- codec unit tests ------------------------------------------------

def test_png_pixels_roundtrip_all_filters():
    rng = np.random.RandomState(7)
    for ct, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        px = rng.randint(0, 256, size=(5, 4, ch)).astype(np.uint8)
        data = make_png(px, ct, filters=[0, 1, 2, 3, 4])
        meta = png_meta(data)
        assert (meta["width"], meta["height"], meta["channels"]) == (4, 5, ch)
        assert np.array_equal(png_pixels(data), px)


def test_png_palette_maps_through_plte():
    idx = np.array([[[0], [1]], [[1], [0]]], dtype=np.uint8)
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
    data = make_png(idx, 3)
    # splice PLTE between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    data = data[:ihdr_end] + plte + data[ihdr_end:]
    px = png_pixels(data)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0) and tuple(px[0, 1]) == (0, 0, 255)


def test_png_corruption_rejected():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = make_png(px, 2)
    with pytest.raises(MediaDecodeError, match="CRC"):
        png_pixels(good[:20] + bytes([good[20] ^ 0xFF]) + good[21:])
    with pytest.raises(MediaDecodeError, match="signature"):
        png_meta(b"not a png at all")


def test_jpeg_gif_wav_meta():
    j = jpeg_meta(make_jpeg(640, 480))
    assert (j["width"], j["height"], j["channels"]) == (640, 480, 3)
    g = gif_meta(make_gif(32, 16, 3))
    assert (g["width"], g["height"], g["version"]) == (32, 16, "89a")
    assert len(gif_frames(make_gif(32, 16, 3))) == 3
    w = wav_meta(make_wav(16000, 2, 8000))
    assert (w["sample_rate"], w["channels"], w["n_frames"]) == (16000, 2, 8000)
    assert w["duration_ms"] == 500
    with pytest.raises(MediaDecodeError):
        wav_meta(b"RIFF\x00\x00\x00\x00AVI ")


def test_sniff_and_real_image_meta():
    png = make_png(np.zeros((3, 7, 3), dtype=np.uint8), 2)
    assert sniff_format(png) == "png"
    m = real_image_meta(png)
    assert (m["width"], m["height"], m["format"]) == (7, 3, "png")
    m = real_image_meta(make_wav(8000, 1, 100))
    assert m["format"] == "wav" and m["width"] is None
    assert real_image_meta(b"garbage bytes") is None


# -- Spark ops: codec='real' end-to-end ------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, "id STRING, content BINARY")


def test_media_decode_real(ctx, spark):
    png = make_png(np.full((3, 5, 3), 9, dtype=np.uint8), 2)
    rows = [("png", png), ("jpg", make_jpeg(100, 50)),
            ("bad", b"\x00\x01junk"), ("none", None)]
    out = run_op(ctx, "media.decode", [_media_df(spark, rows)],
                 column="content", codec="real")
    got = {r["id"]: r["media_meta"] for r in out.collect()}
    assert (got["png"]["width"], got["png"]["height"], got["png"]["format"]) \
        == (5, 3, "png")
    assert (got["jpg"]["width"], got["jpg"]["height"]) == (100, 50)
    assert got["bad"] is None and got["none"] is None
    # on_error=fail surfaces the undecodable row
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        run_op(ctx, "media.decode", [_media_df(spark, rows)],
               column="content", codec="real", on_error="fail").collect()


def test_media_frame_sample_real_gif(ctx, spark):
    gif = make_gif(8, 8, 10)
    out = run_op(ctx, "media.frame_sample", [_media_df(spark, [("g", gif)])],
                 column="content", id_column="id", n_frames=5, codec="real")
    rows = sorted((r["frame_idx"], r["frame_hash"]) for r in out.collect())
    assert [i for i, _ in rows] == [0, 2, 4, 6, 8]  # real frame indices
    # frame bytes differ, so hashes differ
    assert len({h for _, h in rows}) == 5


def test_media_pixel_stats_real(ctx, spark):
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(6, 4, 3)).astype(np.uint8)
    flat = px.reshape(-1, 3).astype(np.float64)
    df = _media_df(spark, [("a", make_png(px, 2, filters=[4, 3, 2, 1, 0, 4])),
                           ("bad", b"nope"), ("none", None)])
    out = run_op(ctx, "media.pixel_stats", [df], column="content")
    got = {r["id"]: r["pixel_stats"] for r in out.collect()}
    s = got["a"]
    assert (s["width"], s["height"], s["channels"]) == (4, 6, 3)
    np.testing.assert_allclose(s["mean"], flat.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(s["std"], flat.std(axis=0), rtol=1e-9)
    exp_lum = 0.299 * flat.mean(axis=0)[0] + 0.587 * flat.mean(axis=0)[1] \
        + 0.114 * flat.mean(axis=0)[2]
    assert abs(s["luminance"] - exp_lum) < 1e-9
    assert got["bad"] is None and got["none"] is None


def test_png_encode_decode_roundtrip():
    rng = np.random.RandomState(11)
    from conveyor_spark.datapipe.codecs import png_encode

    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(9, 5, ch)).astype(np.uint8)
        assert np.array_equal(png_pixels(png_encode(px)), px)
    with pytest.raises(MediaDecodeError, match="cannot encode"):
        png_encode(np.zeros((2, 2, 5), dtype=np.uint8))


def test_wav_encode_decode_roundtrip_and_pcm8():
    from conveyor_spark.datapipe.codecs import wav_encode, wav_samples

    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, size=(40, 2)).astype(np.int16)
    meta, out = wav_samples(wav_encode(s, 44100))
    assert np.array_equal(out, s.astype(np.int32))
    assert (meta["sample_rate"], meta["channels"], meta["n_frames"]) == (44100, 2, 40)
    # PCM8 (unsigned per spec) decodes too
    body = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 28 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + body
            + b"data" + struct.pack("<I", 4) + bytes([0, 128, 255, 64]))
    meta8, out8 = wav_samples(wav8)
    assert meta8["bits_per_sample"] == 8 and out8.reshape(-1).tolist() == [0, 128, 255, 64]
    # float wav refused
    fbody = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    fwav = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fbody
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(MediaDecodeError, match="PCM"):
        wav_samples(fwav)


def test_audio_pcm_stats_op(ctx, spark):
    from conveyor_spark.datapipe.codecs import wav_encode

    s = np.array([0, 100, -200, 300], dtype=np.int16)
    df = _media_df(spark, [("a", wav_encode(s, 16000)),
                           ("bad", b"not a wav"), ("none", None)])
    out = run_op(ctx, "audio.pcm_stats", [df], column="content")
    got = {r["id"]: r["pcm_stats"] for r in out.collect()}
    st = got["a"]
    assert (st["sample_rate"], st["channels"], st["n_frames"]) == (16000, 1, 4)
    assert st["peak"] == 300 and st["mean"] == 50.0
    assert abs(st["rms"] - float(np.sqrt((s.astype(np.float64) ** 2).mean()))) == 0.0
    assert got["bad"] is None and got["none"] is None


def test_pcm8_stats_centered(ctx, spark):
    # PCM8 silence (all 128) must read as level zero
    wav8 = (b"RIFF" + struct.pack("<I", 32) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 4) + bytes([128, 128, 128, 128]))
    out = run_op(ctx, "audio.pcm_stats", [_media_df(spark, [("s", wav8)])],
                 column="content")
    st = out.first()["pcm_stats"]
    assert st["peak"] == 0 and st["mean"] == 0.0 and st["rms"] == 0.0


def test_media_resize_real(ctx, spark):
    from conveyor_spark.datapipe.codecs import png_encode, png_pixels

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = _media_df(spark, [("a", png_encode(px)), ("bad", b"x"), ("n", None)])
    out = run_op(ctx, "media.resize", [df], column="content",
                 width=4, height=2, output_column="thumb")
    got = {r["id"]: r["thumb"] for r in out.collect()}
    thumb = png_pixels(bytes(got["a"]))
    ys = (np.arange(2) * 8) // 2
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(thumb, px[ys][:, xs])
    assert got["bad"] is None and got["n"] is None
    # upscale works too (index repetition)
    up = run_op(ctx, "media.resize", [df.filter("id = 'a'")],
                column="content", width=16, height=16)
    assert png_pixels(bytes(up.first()["content"])).shape == (16, 16, 3)


def test_media_resize_nn_grid_is_floor_exact(ctx, spark):
    """q156's oracle premise as a predicate (VERDICT r10 item 6):
    media.resize's sampling grid is EXACTLY floor(i * in / out) on
    both axes. The dyadic halving q156 uses cannot tell floor from
    round/center grids (they coincide there), so this sweeps
    NON-dyadic down- and up-scales where the grids diverge (16->5:
    floor picks col 9 where a centered grid picks 10) and asserts
    bit-equality against the analytic index map on a
    coordinate-encoded PNG. If the grid definition ever changes,
    this fails instead of silently invalidating q156's analytic
    oracle."""
    from conveyor_spark.datapipe.codecs import png_encode, png_pixels

    h_in, w_in = 16, 10
    px = ((13 * np.arange(h_in)[:, None] + np.arange(w_in)[None, :]) % 256
          ).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    df = _media_df(spark, [("a", png_encode(px))])
    for out_h, out_w in [(5, 7), (7, 3), (16, 10), (32, 24), (3, 10)]:
        out = run_op(ctx, "media.resize", [df], column="content",
                     width=out_w, height=out_h, output_column="thumb")
        thumb = png_pixels(bytes(out.first()["thumb"]))
        ys = (np.arange(out_h) * h_in) // out_h
        xs = (np.arange(out_w) * w_in) // out_w
        assert np.array_equal(thumb, px[ys][:, xs]), (out_h, out_w)


def test_phash_plus_hamming_finds_image_near_dups(ctx, spark):
    """The image near-dup pipeline end to end: real PNG decode ->
    pHash fingerprints -> pigeonhole-banded Hamming pairing. A
    resized copy must pair with its original; an unrelated image
    must not."""
    from conveyor_spark.datapipe.codecs import png_encode

    x = np.linspace(0, 4 * np.pi, 64)
    base = ((np.sin(x)[:, None] * np.cos(x)[None, :] + 1) * 127).astype(np.uint8)
    img = np.repeat(base[:, :, None], 3, axis=2)
    ys = (np.arange(96) * 64) // 96
    resized = img[ys][:, ys]
    other = ((np.cos(3 * x)[:, None] * np.sin(2 * x)[None, :] + 1) * 127)
    other = np.repeat(other.astype(np.uint8)[:, :, None], 3, axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(png_encode(img))), (2, bytearray(png_encode(resized))),
         (3, bytearray(png_encode(other))), (4, None)],
        "img_id INT, content BINARY",
    )
    hashed = run_op(ctx, "media.phash", [df], column="content")
    got = {r["img_id"]: r["phash"] for r in hashed.collect()}
    assert got[4] is None and got[1] == got[2] != got[3]
    pairs = run_op(ctx, "dedup.hamming", [hashed.filter("phash IS NOT NULL")],
                   id_column="img_id", fingerprint_column="phash",
                   bits=64, max_distance=6)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]


def test_dedup_hamming_pigeonhole_exact(ctx, spark):
    """bands = max_distance+1 must be EXACT: every pair within the
    distance is found (pigeonhole), none beyond it survives verify —
    checked against the brute-force cross join."""
    import itertools
    import random

    random.seed(11)
    rows = [(i, random.getrandbits(64) - (1 << 63)) for i in range(120)]
    for i in range(0, 12, 2):
        rows.append((500 + i, rows[i][1] ^ (1 << (i % 64))))
        rows.append((600 + i, rows[i][1] ^ 0b10101))
    df = spark.createDataFrame(rows, "id BIGINT, fp BIGINT")
    out = run_op(ctx, "dedup.hamming", [df], id_column="id",
                 fingerprint_column="fp", bits=64, max_distance=3)
    got = sorted((r["id_a"], r["id_b"], r["distance"]) for r in out.collect())

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    exp = sorted(
        (a, b, ham(x, y))
        for (a, x), (b, y) in itertools.combinations(rows, 2)
        if ham(x, y) <= 3
    )
    assert got == exp and len(got) >= 6


# ------------------------------------------------------------------ GIF decode


def test_gif_lzw_roundtrip_crosses_table_reset():
    """> 4096 dictionary entries forces the encoder's clear/reset —
    the decoder must follow through the same boundary."""
    import numpy as np

    from conveyor_spark.datapipe.codecs import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(7)
    seq = list(rng.randint(0, 256, 60_000))
    assert _lzw_decode(8, _lzw_encode(8, seq)) == seq
    # minimum code size edge: 2-bit alphabet
    seq2 = list(rng.randint(0, 4, 5_000))
    assert _lzw_decode(2, _lzw_encode(2, seq2)) == seq2


def test_gif_pixels_roundtrip_gray_rgb_interlaced():
    import numpy as np

    from conveyor_spark.datapipe.codecs import gif_encode, gif_pixels

    gray = ((7 * (13 * np.arange(16)[:, None] + np.arange(9))) % 256).astype(
        "uint8")
    got = gif_pixels(gif_encode(gray))
    assert got.shape == (16, 9, 3)
    assert (got[:, :, 0] == gray).all() and (got[:, :, 2] == gray).all()

    # interlaced rows must land back in raster order
    assert (gif_pixels(gif_encode(gray, interlace=True))[:, :, 0]
            == gray).all()

    rgb = np.zeros((5, 7, 3), "uint8")
    rgb[..., 0] = np.arange(7)
    rgb[..., 1] = 100
    assert (gif_pixels(gif_encode(rgb)) == rgb).all()


def test_gif_encode_rejects_wide_palettes():
    import numpy as np

    from conveyor_spark.datapipe.codecs import gif_encode

    k = np.arange(20 * 20, dtype=np.uint32)
    rgb = np.stack([k % 256, k // 256, np.zeros_like(k)], axis=1) \
        .reshape(20, 20, 3).astype("uint8")  # 400 distinct colors
    with pytest.raises(MediaDecodeError, match="distinct colors"):
        gif_encode(rgb)


def test_gif_pixels_second_frame_and_missing_frame():
    import numpy as np

    from conveyor_spark.datapipe.codecs import gif_encode, gif_pixels

    # build a 3-frame gif by repeating a real frame's descriptor+data
    # span before the trailer
    one = gif_encode(np.arange(64, dtype=np.uint8).reshape(8, 8) * 3 % 256)
    # header = 13-byte preamble + 768-byte global table (gray encode
    # always writes a 256-entry palette); searching for 0x2C would
    # false-hit gray level 44 inside the palette
    desc = 13 + 768
    assert one[desc] == 0x2C
    header, frame_bytes = one[:desc], one[desc:-1]  # strip trailer 0x3B
    gif = header + frame_bytes * 3 + b"\x3b"
    px = gif_pixels(gif, frame=2)
    assert px.shape == (8, 8, 3)
    with pytest.raises(MediaDecodeError, match="no frame"):
        gif_pixels(gif, frame=7)
    # the frame-walk fixture has no color table at all: clean refusal
    with pytest.raises(MediaDecodeError, match="color table"):
        gif_pixels(make_gif(8, 8, 1))


def test_gif_pixels_truncation_rejected():
    """Every truncation of a valid GIF dies as MediaDecodeError —
    never IndexError/struct.error out of the decode boundary."""
    import numpy as np

    from conveyor_spark.datapipe.codecs import gif_encode, gif_pixels

    full = gif_encode((np.arange(64, dtype=np.uint8).reshape(8, 8)))
    for cut in range(1, len(full) - 1, 3):
        try:
            gif_pixels(full[:cut])
        except MediaDecodeError:
            pass


def test_decode_image_dispatch():
    import numpy as np

    from conveyor_spark.datapipe.codecs import (
        decode_image, gif_encode, png_encode,
    )

    img = (np.arange(24, dtype=np.uint8).reshape(4, 6) * 9 % 256)
    assert (decode_image(png_encode(img))[:, :, 0] == img).all()
    assert (decode_image(gif_encode(img))[:, :, 0] == img).all()
    from conveyor_spark.datapipe.jpeg import jpeg_encode

    jp = decode_image(jpeg_encode(img, quality=95))
    assert jp.shape == (4, 6, 1)  # lossy: dims + bounded error
    assert np.abs(jp[:, :, 0].astype(int) - img.astype(int)).max() <= 16
    with pytest.raises(MediaDecodeError):
        decode_image(b"\xff\xd8\xff\xe0rest")  # truncated JPEG
    with pytest.raises(MediaDecodeError, match="unrecognized"):
        decode_image(b"not an image at all")


def test_pixel_stats_decodes_gif(ctx, spark):
    """media.pixel_stats over a GIF must equal the same op over the
    SAME pixels as PNG — one stats path, two containers."""
    import numpy as np

    from conveyor_spark.datapipe.codecs import gif_encode, png_encode

    img = ((np.arange(8)[:, None] * 13 + np.arange(8)) * 5 % 256).astype(
        "uint8")
    df = _media_df(spark, [("png", png_encode(img)), ("gif", gif_encode(img))])
    out = run_op(ctx, "media.pixel_stats", [df], column="content",
                 on_error="fail")
    rows = {r["id"]: r["pixel_stats"] for r in out.collect()}
    assert rows["png"]["width"] == rows["gif"]["width"] == 8
    # gray PNG has 1 channel; the GIF palette expands to RGB of equal
    # values — luminance must agree exactly
    assert rows["png"]["luminance"] == rows["gif"]["luminance"]
