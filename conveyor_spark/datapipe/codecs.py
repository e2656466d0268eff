"""Pure-Python media decoders for ``codec='real'`` paths.

The reference ships real media decoding through native libs; this
container has neither PIL nor av, so these decoders implement the
formats' public specs directly on the stdlib (``zlib``, ``struct``)
plus numpy:

- PNG: chunk walk + IHDR parse, and a FULL pixel decode (IDAT
  inflate + per-row unfilter, bit-depth 8, color types 0/2/3/4/6,
  non-interlaced) — enough to compute real pixel statistics.
- JPEG: marker scan to the SOF segment for dimensions/channels.
- GIF: logical-screen parse + frame (image-descriptor) walk WITHOUT
  LZW decode — frame boundaries and per-frame byte spans are exact,
  which is what frame sampling needs.
- WAV: RIFF chunk walk for PCM format/rate/channels/duration.

Everything raises ``MediaDecodeError`` on malformed input so callers
can choose null-out vs fail semantics. Decoders run inside
``mapInPandas`` workers: imports are stdlib-only and module-level, so
per-partition import cost is nil.
"""

from __future__ import annotations

import struct
import zlib


class MediaDecodeError(ValueError):
    """Input bytes are not a valid instance of the claimed format."""


def _decoder(fn):
    """Boundary guard for untrusted bytes: truncated input surfaces
    wherever a struct.unpack or byte index lands first — map those to
    MediaDecodeError so callers see ONE failure type (fuzz-tested in
    test_codecs.py) instead of struct.error/IndexError leaking out of
    a corrupt-corpus scan."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *args, **kwargs):
        try:
            return fn(data, *args, **kwargs)
        except (struct.error, IndexError) as exc:
            raise MediaDecodeError(
                f"{fn.__name__}: truncated/malformed input ({exc})"
            ) from None

    return wrapped


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_chunks(data: bytes):
    """Yield (type, payload) for each chunk; validates CRCs."""
    if data[:8] != PNG_SIGNATURE:
        raise MediaDecodeError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise MediaDecodeError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise MediaDecodeError("PNG missing IEND")


@_decoder
def png_meta(data: bytes) -> dict:
    """IHDR parse: width/height/bit depth/color type (+ channels)."""
    for ctype, payload in png_chunks(data):
        if ctype != b"IHDR":
            raise MediaDecodeError("PNG first chunk is not IHDR")
        if len(payload) != 13:
            raise MediaDecodeError("bad IHDR length")
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", payload
        )
        if color not in _PNG_CHANNELS:
            raise MediaDecodeError(f"unknown PNG color type {color}")
        return {
            "width": w,
            "height": h,
            "bit_depth": depth,
            "color_type": color,
            "channels": _PNG_CHANNELS[color],
            "interlaced": interlace == 1,
        }
    raise MediaDecodeError("empty PNG")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


@_decoder
def png_pixels(data: bytes):
    """Full decode -> numpy uint8 array of shape (height, width,
    channels). Supports bit depth 8, color types 0/2/3/4/6,
    non-interlaced (the overwhelming bulk of real corpora; Adam7
    raises). Filters: all five from the spec, applied per row —
    None/Sub/Up vectorized with numpy, Average/Paeth per-pixel (they
    are sequential in x by construction)."""
    import numpy as np

    meta = None
    palette = None
    idat = []
    for ctype, payload in png_chunks(data):
        if ctype == b"IHDR":
            meta = png_meta(data)
        elif ctype == b"PLTE":
            if len(payload) % 3:
                raise MediaDecodeError("bad PLTE length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(payload)
    if meta is None or not idat:
        raise MediaDecodeError("PNG missing IHDR/IDAT")
    if meta["bit_depth"] != 8:
        raise MediaDecodeError(f"unsupported bit depth {meta['bit_depth']}")
    if meta["interlaced"]:
        raise MediaDecodeError("Adam7 interlacing not supported")
    w, h, ch = meta["width"], meta["height"], meta["channels"]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise MediaDecodeError(f"IDAT inflate failed: {exc}") from None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if ftype == 0:  # None
            rec = line.copy()
        elif ftype == 1:  # Sub: per-lane cumulative sum mod 256
            rec = (
                (np.cumsum(line.reshape(-1, ch), axis=0) % 256)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 3:
                    rec[x] = (int(line[x]) + (a + b) // 2) % 256
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    rec[x] = (int(line[x]) + _paeth(a, b, c)) % 256
        else:
            raise MediaDecodeError(f"unknown PNG filter {ftype}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if meta["color_type"] == 3:
        if palette is None:
            raise MediaDecodeError("palette image missing PLTE")
        if int(px.max()) >= len(palette):
            raise MediaDecodeError("palette index out of range")
        px = palette[px[:, :, 0]]
    return px


@_decoder
def jpeg_meta(data: bytes) -> dict:
    """Marker scan to the first SOF0-SOF15 frame header."""
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("bad JPEG SOI")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise MediaDecodeError(f"bad JPEG marker at {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 8:
                raise MediaDecodeError("short SOF segment")
            precision, h, w, ncomp = struct.unpack(
                ">BHHB", data[pos + 4 : pos + 10]
            )
            return {
                "width": w,
                "height": h,
                "channels": ncomp,
                "bit_depth": precision,
            }
        pos += 2 + seglen
    raise MediaDecodeError("JPEG has no SOF marker")


@_decoder
def gif_meta(data: bytes) -> dict:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeError("bad GIF header")
    w, h = struct.unpack("<HH", data[6:10])
    return {"width": w, "height": h, "version": data[3:6].decode("ascii")}


def _gif_skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise MediaDecodeError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


@_decoder
def gif_frames(data: bytes) -> list[tuple[int, int]]:
    """(start, end) byte span of each frame's image descriptor +
    LZW data — exact frame boundaries without LZW decode."""
    gif_meta(data)  # validates header
    pos = 10
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return frames
        if b == 0x21:  # extension: label + sub-blocks
            pos = _gif_skip_subblocks(data, pos + 2)
        elif b == 0x2C:  # image descriptor
            start = pos
            if pos + 10 > len(data):
                raise MediaDecodeError("truncated image descriptor")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            pos = _gif_skip_subblocks(data, pos)
            frames.append((start, pos))
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{b:02x}")
    raise MediaDecodeError("GIF missing trailer")


@_decoder
def wav_meta(data: bytes) -> dict:
    """RIFF walk: fmt (codec/channels/rate/bits) + data size."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeError("bad WAV/RIFF header")
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise MediaDecodeError("short fmt chunk")
            audio_fmt, nch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = {
                "audio_format": audio_fmt,  # 1 = PCM, 3 = float
                "channels": nch,
                "sample_rate": rate,
                "bits_per_sample": bits,
            }
        elif cid == b"data":
            data_size = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    bytes_per_frame = fmt["channels"] * max(1, fmt["bits_per_sample"] // 8)
    n_frames = data_size // bytes_per_frame if bytes_per_frame else 0
    fmt["n_frames"] = n_frames
    fmt["duration_ms"] = (
        int(n_frames * 1000 / fmt["sample_rate"]) if fmt["sample_rate"] else 0
    )
    return fmt


def sniff_format(data: bytes) -> str:
    """Same decision tree as media.metadata's JVM exprs (keep in
    sync) — used by codec='real' to dispatch a decoder."""
    if data[:8] == PNG_SIGNATURE:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"GIF8":
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    return "unknown"


def real_image_meta(data: bytes) -> dict | None:
    """codec='real' seam for media.decode: returns the
    IMAGE_META_SCHEMA dict for formats we can truly parse, None for
    undecodable bytes (caller chooses null-out vs fail)."""
    fmt = sniff_format(data)
    try:
        if fmt == "png":
            m = png_meta(data)
        elif fmt == "jpeg":
            m = jpeg_meta(data)
        elif fmt == "gif":
            m = gif_meta(data)
        elif fmt == "wav":
            # audio has no raster dims; format + size still real
            wav_meta(data)
            m = {"width": None, "height": None}
        elif fmt == "avi":
            from conveyor_spark.datapipe.avi import avi_meta

            m = avi_meta(data)  # real container walk: width/height
        else:
            return None
    except MediaDecodeError:
        return None
    return {
        "width": m.get("width"),
        "height": m.get("height"),
        "format": fmt,
        "n_bytes": len(data),
    }


def png_encode(pixels) -> bytes:
    """Minimal PNG encoder (bit depth 8, gray/gray-alpha/RGB/RGBA,
    filter 0, one IDAT). The inverse of ``png_pixels`` — lets
    pipelines materialize real PNG bytes without an image library
    (and gives correctness harnesses an encode->decode round trip)."""
    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise MediaDecodeError(f"cannot encode {ch}-channel PNG")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def wav_encode(samples, sample_rate: int) -> bytes:
    """Minimal PCM16 WAV encoder: int16 samples, mono (1-D input) or
    interleaved multi-channel ((frames, channels)). Inverse of
    ``wav_samples`` — same encode->decode round-trip role as
    ``png_encode``."""
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise MediaDecodeError("wav_encode expects 1-D or 2-D samples")
    if not np.issubdtype(arr.dtype, np.integer) or \
            int(arr.max(initial=0)) > 32767 or int(arr.min(initial=0)) < -32768:
        raise MediaDecodeError("wav_encode expects int16-range samples")
    nch = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * nch * 2, nch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_decoder
def wav_samples(data: bytes):
    """Full PCM decode -> (meta dict, numpy int array of shape
    (frames, channels)). PCM16 (int16) and PCM8 (unsigned byte, per
    the WAV spec) supported; float/compressed codecs raise."""
    import numpy as np

    meta = wav_meta(data)
    if meta["audio_format"] != 1:
        raise MediaDecodeError(
            f"only PCM wav supported (audio_format={meta['audio_format']})"
        )
    bits = meta["bits_per_sample"]
    if bits not in (8, 16):
        raise MediaDecodeError(f"unsupported PCM bit depth {bits}")
    # find the data chunk again (wav_meta only kept its size)
    pos = 12
    raw = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos : pos + 8])
        if cid == b"data":
            raw = data[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    if raw is None:
        raise MediaDecodeError("WAV missing data chunk")
    dtype = "<i2" if bits == 16 else "u1"
    arr = np.frombuffer(raw, dtype=dtype)
    nch = meta["channels"]
    usable = (len(arr) // nch) * nch
    return meta, arr[:usable].reshape(-1, nch).astype("int32")


# --------------------------------------------------------------------------
# GIF pixel decode/encode (GIF-variant LZW, palette mapping, Adam-style
# 4-pass interlace). Reference seam closed: gif_frames gave byte spans
# without decoding; gif_pixels decodes the actual raster.
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first bitstream, clear/end codes, code
    width grows AFTER the table reaches 2^width, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    # bytearray accumulator + a table-length counter (r14): extend()
    # with a bytes entry is a memcpy instead of per-int list append,
    # and len(table) left the hot loop — 1.4x on an LZW-bound frame
    # (indices are always < 256, so bytes hold them losslessly)
    out = bytearray()
    table: list[bytes] = []
    width = prev = 0  # set on clear

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = -1

    reset()
    tlen = len(table)
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                tlen = len(table)
                continue
            if code == end:
                return list(out)
            if prev < 0:  # first code after clear: literal by spec
                if code >= clear:
                    raise MediaDecodeError("LZW: first code not literal")
                out.append(code)
                prev = code
                continue
            if code < tlen:
                entry = table[code]
            elif code == tlen:  # the KwKwK case
                entry = table[prev] + table[prev][:1]
            else:
                raise MediaDecodeError(f"LZW: code {code} out of range")
            out.extend(entry)
            if tlen < 4096:
                table.append(table[prev] + entry[:1])
                tlen += 1
                # width grows when the NEXT code could overflow it
                if tlen == (1 << width) and width < 12:
                    width += 1
            prev = code
    raise MediaDecodeError("LZW: missing end-of-information code")


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """Real GIF LZW compression (dict of tuples -> code), emitting
    clear at start and on table overflow — the exact inverse of
    ``_lzw_decode`` for any index sequence below 2^min_code_size."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[tuple, int] = {}
    width = min_code_size + 1

    def reset():
        nonlocal table, width
        table = {(i,): i for i in range(clear)}
        width = min_code_size + 1

    reset()
    emit(clear, width)
    seq: tuple = ()
    next_code = end + 1
    for ix in indices:
        ix = int(ix)
        if not 0 <= ix < clear:
            raise MediaDecodeError(f"LZW: index {ix} exceeds palette")
        cand = seq + (ix,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        # decoder adds its entry BEFORE growing width on the same
        # boundary — mirror exactly
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            reset()
            next_code = end + 1
        seq = (ix,)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@_decoder
def gif_pixels(data: bytes, frame: int = 0):
    """Decode frame ``frame`` -> numpy uint8 array (fh, fw, 3) in the
    frame's own rectangle (GIF frames may be sub-rects of the logical
    screen; callers compositing animations own the placement).
    Handles global/local color tables, interlacing, and transparency
    AS PALETTE COLOR (stats want real sample values, not alpha)."""
    import numpy as np

    gif_meta(data)  # validates header
    packed = data[10]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
        if len(global_pal) != 3 * n:
            raise MediaDecodeError("truncated global color table")
        global_pal = global_pal.reshape(-1, 3)
        pos += 3 * n
    seen = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos = _gif_skip_subblocks(data, pos + 2)
        elif b == 0x2C:
            fx, fy, fw, fh = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
                if len(pal) != 3 * n:
                    raise MediaDecodeError("truncated local color table")
                pal = pal.reshape(-1, 3)
                pos += 3 * n
            mcs = data[pos]
            pos += 1
            blocks = []
            while True:
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                blocks.append(data[pos:pos + n])
                if len(blocks[-1]) != n:
                    raise MediaDecodeError("truncated LZW sub-block")
                pos += n
            if seen != frame:
                seen += 1
                continue
            if pal is None:
                raise MediaDecodeError("GIF frame has no color table")
            if not 2 <= mcs <= 8:
                raise MediaDecodeError(f"bad LZW min code size {mcs}")
            idx = _lzw_decode(mcs, b"".join(blocks))
            if len(idx) < fw * fh:
                raise MediaDecodeError(
                    f"LZW output {len(idx)} < {fw}x{fh} frame")
            arr = np.asarray(idx[: fw * fh], dtype=np.int32)
            if int(arr.max(initial=0)) >= len(pal):
                raise MediaDecodeError("palette index out of range")
            grid = arr.reshape(fh, fw)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y for start, step in _GIF_INTERLACE_PASSES
                    for y in range(start, fh, step)
                ]
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            return pal[grid]
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{b:02x}")
    raise MediaDecodeError(f"GIF has no frame {frame}")


def gif_encode(pixels, interlace: bool = False) -> bytes:
    """Single-frame GIF89a encoder: (h, w) gray uses the 256-gray
    palette; (h, w, 3) requires <= 256 distinct colors (exact
    palette — GIF is an indexed format; quantization belongs to a
    real image library). The inverse of ``gif_pixels``."""
    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = px.astype(np.int32)
    elif px.ndim == 3 and px.shape[2] == 3:
        flat = px.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise MediaDecodeError(
                f"gif_encode: {len(pal)} distinct colors > 256")
        idx = inv.reshape(px.shape[:2]).astype(np.int32)
    else:
        raise MediaDecodeError("gif_encode: expected (h,w) or (h,w,3)")
    h, w = idx.shape
    n_pal = max(2, int(pal.shape[0]))
    depth = max(1, (n_pal - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    if interlace:
        order = [
            y for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        idx = idx[order]
    mcs = max(2, depth)
    lzw = _lzw_encode(mcs, idx.reshape(-1))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def decode_image(data: bytes):
    """Sniff + decode any supported raster -> (h, w, ch) uint8.
    PNG (inflate + unfilter), GIF (LZW + palette), and baseline
    sequential JPEG (Huffman + dequant + IDCT + chroma upsample,
    datapipe.jpeg) are fully decoded pure-Python; progressive JPEG
    and everything needing a video codec still raise."""
    b = bytes(data)
    if b[:8] == PNG_SIGNATURE:
        return png_pixels(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return gif_pixels(b)
    if b[:3] == b"\xff\xd8\xff":
        from conveyor_spark.datapipe.jpeg import jpeg_pixels

        return jpeg_pixels(b)
    raise MediaDecodeError("unrecognized image format")
