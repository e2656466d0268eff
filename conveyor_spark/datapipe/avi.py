"""Pure-Python MJPEG-in-AVI: the video analogue of codecs.py's
PNG/GIF/WAV walks, closing the engine's last stubbed media seam.

AVI (RIFF 'AVI ') is a public container (Microsoft "AVI RIFF File
Reference"); Motion-JPEG stores each frame as a complete baseline
JPEG in a '00dc' chunk, so the repo's existing jpeg.py decoder makes
whole-video decode REAL with nothing but a container walk:

- ``avi_encode``     frames (JPEG bytes) -> minimal spec-valid AVI
                     (hdrl: avih + one 'vids'/'MJPG' strl; movi;
                     idx1), the test/fixture writer.
- ``avi_meta``       header walk -> width/height/fps/n_frames/codec.
- ``avi_frames``     (start, end) byte spans of each frame's JPEG —
                     the gif_frames shape, so media.frame_sample's
                     real path treats AVI exactly like GIF.
- ``avi_frame_pixels``  span -> decoded (h, w, ch) uint8 via
                     jpeg.jpeg_pixels.

Other video codecs inside AVI (or other containers) still raise:
MJPEG is the one video format expressible with the shipped
pure-Python decoders; the NotImplementedError seam names that.

Reference capability parity: the reference engine has no media ops
at all — this family is beyond-reference training-pipeline surface.
"""

from __future__ import annotations

import struct

from conveyor_spark.datapipe.codecs import MediaDecodeError, _decoder


def avi_encode(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """Minimal MJPEG AVI: every frame a keyframe '00dc' chunk (word-
    aligned), one video stream, idx1 index. Deterministic bytes."""
    if not frames:
        raise ValueError("avi_encode: need at least one frame")
    if fps < 1:
        raise ValueError("avi_encode: fps must be >= 1")
    n = len(frames)
    max_len = max(len(f) for f in frames)

    avih = struct.pack(
        "<4sI14I", b"avih", 56,
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_len * fps,           # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n, 0, 1,                 # frames, initial, streams
        max_len,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIIIhhhh", b"strh", 56,
        b"vids", b"MJPG",
        0, 0, 0, 0,              # flags, prio+lang, initial frames
        1, fps,                  # scale, rate -> rate/scale fps
        0, n,                    # start, length (frames)
        max_len,                 # suggested buffer
        0xFFFFFFFF, 0,           # quality, sample size
        0, 0, width, height,     # rcFrame
    )
    strf = struct.pack(
        "<4sIIiiHH4sIiiII", b"strf", 40,
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) \
        + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) \
        + b"hdrl" + avih + strl

    movi_body = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the byte position of the
        # 'movi' fourcc (the common convention players expect)
        offset = 4 + len(movi_body)
        chunk = b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            chunk += b"\x00"
        movi_body += chunk
        idx_entries.append(struct.pack(
            "<4sIII", b"00dc", 0x10, offset, len(f)))
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) \
        + b"movi" + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(idx_entries)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) of sibling chunks."""
    while pos + 8 <= end:
        cid, clen = struct.unpack("<4sI", data[pos:pos + 8])
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen & 1)


@_decoder
def avi_meta(data: bytes) -> dict:
    """Header walk -> {width, height, fps, n_frames, codec}."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaDecodeError("not an AVI/RIFF file")
    meta: dict = {}
    for cid, start, clen in _riff_chunks(data, 12, len(data)):
        if cid != b"LIST" or data[start:start + 4] != b"hdrl":
            continue
        for c2, s2, l2 in _riff_chunks(data, start + 4, start + clen):
            if c2 == b"avih":
                (uspf, _mbs, _pad, _flags, n, _init, _streams,
                 _buf, w, h) = struct.unpack("<10I", data[s2:s2 + 40])
                meta.update(width=w, height=h, n_frames=n,
                            fps=(1_000_000 // uspf if uspf else 0))
            elif c2 == b"LIST" and data[s2:s2 + 4] == b"strl":
                for c3, s3, _l3 in _riff_chunks(data, s2 + 4, s2 + l2):
                    if c3 == b"strh" and data[s3:s3 + 4] == b"vids":
                        meta["codec"] = data[s3 + 4:s3 + 8].decode(
                            "ascii", "replace")
    if "width" not in meta:
        raise MediaDecodeError("AVI missing avih header")
    meta.setdefault("codec", "????")
    return meta


@_decoder
def avi_frames(data: bytes) -> list[tuple[int, int]]:
    """(start, end) spans of each video frame's payload, in stream
    order — the gif_frames contract, so frame samplers can md5 or
    decode real frame boundaries."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaDecodeError("not an AVI/RIFF file")
    spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        for c2, s2, l2 in _riff_chunks(data, pos, end):
            # 'NNdc'/'NNdb' = compressed/uncompressed video chunk
            if c2[2:4] in (b"dc", b"db"):
                if s2 + l2 > len(data):
                    raise MediaDecodeError("AVI frame chunk truncated")
                spans.append((s2, s2 + l2))
            elif c2 == b"LIST" and data[s2:s2 + 4] == b"rec ":
                # interleaved muxers group a frame set per 'rec '
                # LIST (AVI spec) — recurse or real files read as
                # frameless
                walk(s2 + 4, s2 + l2)

    for cid, start, clen in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[start:start + 4] == b"movi":
            walk(start + 4, start + clen)
    return spans


def avi_frame_pixels(data: bytes, span: tuple[int, int],
                     meta: dict | None = None):
    """Decode one MJPEG frame span -> (h, w, ch) uint8. Pass the
    already-walked ``meta`` when decoding many frames of one file —
    otherwise every frame pays a redundant header walk."""
    if meta is None:
        meta = avi_meta(data)
    if meta["codec"] != "MJPG":
        raise NotImplementedError(
            f"AVI codec {meta['codec']!r} needs av/ffmpeg; only MJPG "
            "(Motion-JPEG) has a pure-Python decode path"
        )
    from conveyor_spark.datapipe.jpeg import jpeg_pixels

    return jpeg_pixels(data[span[0]:span[1]])
