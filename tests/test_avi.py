"""MJPEG-AVI: container walk + real per-frame decode (datapipe/avi.py
+ video.frame_stats). The video seam, closed for the one codec the
shipped pure-Python decoders can express."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conveyor_spark.datapipe.avi import (
    avi_encode,
    avi_frame_pixels,
    avi_frames,
    avi_meta,
)
from conveyor_spark.datapipe.codecs import MediaDecodeError, sniff_format
from conveyor_spark.datapipe.jpeg import jpeg_encode, jpeg_pixels
from tests.conftest import run_op


def _solid(g: int, size: int = 16) -> bytes:
    return jpeg_encode(np.full((size, size, 3), g, dtype=np.uint8),
                       quality=85)


def _avi(grays, size: int = 16, fps: int = 5) -> bytes:
    return avi_encode([_solid(g, size) for g in grays], size, size, fps)


def test_roundtrip_meta_frames_decode():
    grays = [0, 17, 128, 255]
    blob = _avi(grays, size=16, fps=10)
    assert sniff_format(blob) == "avi"
    m = avi_meta(blob)
    assert (m["width"], m["height"], m["fps"], m["n_frames"],
            m["codec"]) == (16, 16, 10, 4, "MJPG")
    spans = avi_frames(blob)
    assert len(spans) == 4
    for g, sp in zip(grays, spans):
        px = avi_frame_pixels(blob, sp)
        assert px.shape == (16, 16, 3)
        assert np.unique(px).tolist() == [g]
        # the span IS the JPEG: an independent decode agrees
        assert np.array_equal(px, jpeg_pixels(blob[sp[0]:sp[1]]))


def test_solid_gray_roundtrip_exact_all_values():
    """quality=85's DC quantization round-trips EVERY solid gray
    exactly — the property q153's analytic oracle stands on (q=50
    does NOT: e.g. 7 -> 8). q153 encodes arbitrary values in 0..255,
    so pin ALL of them, not a sample."""
    for g in range(256):
        px = jpeg_pixels(_solid(g, size=8))
        assert np.unique(px).tolist() == [g], g


def test_dc_exactness_quality_envelope():
    """q153's oracle premise as a PREDICATE over the whole quality
    axis, not a point sample at 85 (VERDICT r10 item 6): a solid
    gray's only nonzero coefficient is the DC, whose quantization
    error is at most qdc/2 in DC space = qdc/16 in pixel space, so
    the round-trip is exact for every gray iff the SCALED luma DC
    quantizer stays <= 8 (error <= 0.5 rounds back; qdc=9 already
    misses 28 grays — measured). The sweep crosses the boundary in
    both directions and asserts the EMPIRICAL exactness equals the
    table-derived predicate, so a future change to the base tables
    or the quality scaling shifts both sides together or fails
    loudly — the oracle premise can no longer rot silently.
    (Boundary location with the T.81 Annex K tables: quality >= 74
    exact, 73 not.)"""
    from conveyor_spark.datapipe.jpeg import QUANT_LUMA, _scaled_quant

    swept_qdc = set()
    for quality in (50, 60, 70, 72, 73, 74, 75, 76, 77, 80, 85, 90, 95, 100):
        qdc = _scaled_quant(QUANT_LUMA, quality)[0]
        swept_qdc.add(qdc)
        predicted = qdc <= 8
        bad = [
            g for g in range(256)
            if np.unique(jpeg_pixels(jpeg_encode(
                np.full((8, 8, 3), g, dtype=np.uint8), quality=quality
            ))).tolist() != [g]
        ]
        assert (not bad) == predicted, (quality, qdc, bad[:5])
    # the sweep must actually straddle the boundary or it proves
    # nothing about it
    assert any(q <= 8 for q in swept_qdc)
    assert any(q > 8 for q in swept_qdc)
    assert 8 in swept_qdc and 9 in swept_qdc


def test_exactness_regime_covers_block_constant_frames():
    """The DC-only argument extends to any PER-BLOCK-constant image:
    a two-color frame split on the 8x8 block grid has zero AC energy
    and round-trips exactly at quality 85 — q153 could legally
    synthesize these."""
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:, :8] = 40
    px[:, 8:] = 200
    out = jpeg_pixels(jpeg_encode(px, quality=85))
    assert np.array_equal(out, px)


def test_exactness_regime_ends_within_block():
    """...and STOPS at the block boundary: a two-color split INSIDE
    one 8x8 block has AC energy that quality 85 quantizes lossily.
    This pins the regime's edge — if a jpeg.py change ever made this
    exact (or the block-constant case inexact), the analytic-oracle
    playbook's premise has moved and q153/q104-style oracles must be
    revisited."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :4] = 40
    px[:, 4:] = 200
    out = jpeg_pixels(jpeg_encode(px, quality=85))
    assert not np.array_equal(out, px)


def test_word_alignment_with_odd_frame_sizes():
    # chunks must pad to even and the walk must still find exact
    # spans; force one guaranteed-odd and one guaranteed-even frame
    # (a trailing byte after EOI is legal — decoders stop at EOI)
    f_even = _solid(3)
    if len(f_even) & 1:
        f_even += b"\x00"
    f_odd = _solid(9)
    if not (len(f_odd) & 1):
        f_odd += b"\x00"
    frames = [f_odd, f_even, f_odd]
    assert any(len(f) & 1 for f in frames)
    assert any(not (len(f) & 1) for f in frames)
    blob = avi_encode(frames, 16, 16, fps=1)
    spans = avi_frames(blob)
    assert len(spans) == 3
    for f, sp in zip(frames, spans):
        assert blob[sp[0]:sp[1]] == f


def test_rec_list_grouped_frames():
    """Interleaved muxers wrap frame sets in LIST 'rec ' chunks (AVI
    spec); the walk must recurse or real files read as frameless."""
    import struct as _s

    frames = [_solid(g) for g in (11, 22)]
    blob = avi_encode(frames, 16, 16, fps=2)
    # rebuild the movi body with both 00dc chunks inside one 'rec '
    spans = avi_frames(blob)
    chunks = b""
    for sp in spans:
        body = blob[sp[0]:sp[1]]
        chunks += b"00dc" + _s.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    rec = b"LIST" + _s.pack("<I", 4 + len(chunks)) + b"rec " + chunks
    movi = b"LIST" + _s.pack("<I", 4 + len(rec)) + b"movi" + rec
    # splice: everything before the old movi LIST + new movi
    movi_at = blob.find(b"LIST", 12)
    while blob[movi_at + 8:movi_at + 12] != b"movi":
        clen = _s.unpack("<I", blob[movi_at + 4:movi_at + 8])[0]
        movi_at += 8 + clen + (clen & 1)
    old_len = _s.unpack("<I", blob[movi_at + 4:movi_at + 8])[0]
    tail = blob[movi_at + 8 + old_len + (old_len & 1):]
    body = blob[12:movi_at] + movi + tail
    blob2 = b"RIFF" + _s.pack("<I", len(body) + 4) + b"AVI " + body
    spans2 = avi_frames(blob2)
    assert [blob2[a:b] for a, b in spans2] == frames


def test_encode_errors():
    with pytest.raises(ValueError, match="at least one"):
        avi_encode([], 8, 8)
    with pytest.raises(ValueError, match="fps"):
        avi_encode([b"x"], 8, 8, fps=0)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_fuzz_garbage_raises_decode_error(data):
    for fn in (avi_meta, avi_frames):
        try:
            fn(data)
        except MediaDecodeError:
            pass  # the ONE allowed failure type for garbage


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=12, max_value=200))
def test_fuzz_truncated_real_avi(cut):
    blob = _avi([40, 80])
    data = blob[:cut]
    for fn in (avi_meta, avi_frames):
        try:
            fn(data)
        except MediaDecodeError:
            pass


def test_video_frame_stats_op(ctx, spark):
    # 6 real frames, sample 3 -> indices 0, 2, 4 (the even-step rule)
    grays = [10, 20, 30, 40, 50, 60]
    rows = [(1, _avi(grays)), (2, None), (3, b"not a video")]
    df = spark.createDataFrame(rows, "vid LONG, content BINARY")
    out = run_op(ctx, "video.frame_stats", [df], column="content",
                 id_column="vid", n_frames=3)
    got = {(r["vid"], r["frame_idx"]): r for r in out.collect()}
    assert set(got) == {(1, 0), (1, 2), (1, 4)}
    for (vid, i), r in got.items():
        g = grays[i]
        assert r["width"] == 16 and r["height"] == 16
        assert r["n_frames_total"] == 6 and r["fps"] == 5
        assert r["mean"] == [float(g)] * 3
        assert r["luminance"] == 0.299 * g + 0.587 * g + 0.114 * g
    # on_error='fail' names the op on garbage
    with pytest.raises(Exception, match="video.frame_stats"):
        run_op(ctx, "video.frame_stats", [df], column="content",
               id_column="vid", on_error="fail").collect()


def test_media_decode_real_reports_avi(ctx, spark):
    blob = _avi([42], size=24)
    df = spark.createDataFrame([(1, blob)], "vid LONG, content BINARY")
    out = run_op(ctx, "media.decode", [df], column="content",
                 codec="real")
    m = out.collect()[0]["media_meta"]
    assert (m["width"], m["height"], m["format"]) == (24, 24, "avi")
    assert m["n_bytes"] == len(blob)


def test_frame_sample_real_walks_avi(ctx, spark):
    import hashlib

    blob = _avi([5, 6, 7, 8])
    df = spark.createDataFrame([(1, blob)], "vid LONG, content BINARY")
    out = run_op(ctx, "media.frame_sample", [df], column="content",
                 id_column="vid", n_frames=2, codec="real")
    got = {r["frame_idx"]: r["frame_hash"] for r in out.collect()}
    spans = avi_frames(blob)
    assert got == {
        i: hashlib.md5(blob[spans[i][0]:spans[i][1]]).hexdigest()
        for i in (0, 2)
    }


def test_video_frame_stats_rejects_colliding_id(ctx, spark):
    df = spark.createDataFrame([(1, b"")], "width LONG, content BINARY")
    with pytest.raises(Exception, match="collides"):
        run_op(ctx, "video.frame_stats", [df], column="content",
               id_column="width")
