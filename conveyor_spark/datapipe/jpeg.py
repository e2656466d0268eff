"""Baseline JPEG codec — pure Python + numpy, no image library.

Closes the last media seam (codecs.decode_image previously raised on
JPEG): ``jpeg_pixels`` entropy-decodes baseline sequential JPEG
(SOF0) — DHT Huffman tables from the file, arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8-bit DQT — and
``jpeg_encode`` writes gray or 4:4:4 color at a quality setting with
IJG-style quant scaling. The encoder emits its own canonical Huffman
tables (uniform code lengths over the used alphabet — valid DHT,
decoder-agnostic) rather than reproducing Annex K's optimized ones;
any baseline decoder reads tables from the DHT segment anyway.

JPEG is lossy, so roundtrips assert bounded error (quantization
noise), not equality — except DC-only images (per-block-constant),
where the math is exact integer/rational arithmetic end-to-end and
an analytic oracle can predict the decoded value (q110).

Scale posture: like the PNG/GIF codecs, this runs inside Arrow-
batched mapInPandas — one Python worker per partition, no shuffle;
the codec itself is vectorized per 8x8 block grid except the
entropy coder's inherently sequential bitstream walk.
"""

from __future__ import annotations

import functools
import struct

from conveyor_spark.datapipe.codecs import MediaDecodeError

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K base quantization tables (quality 50)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _scaled_quant(base: list[int], quality: int):
    import numpy as np

    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (np.asarray(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


@functools.cache
def _dct_matrix():
    # cached per worker — constant, rebuilt per decoded image before
    # (r13); callers only read it (matmul/einsum operands)
    import numpy as np

    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2
    d[0] /= np.sqrt(2)
    return d  # orthonormal-scaled: F = D @ B @ D.T is the JPEG DCT


# ----------------------------------------------------------------- encoder


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """All symbols at one code length (uniform canonical table —
    valid as long as count <= 2^length and the all-ones code stays
    unused, which sorted assignment from 0 guarantees for
    count < 2^length)."""
    if len(symbols) >= (1 << length):
        raise MediaDecodeError("huffman table overflow")
    return {sym: (i, length) for i, sym in enumerate(sorted(symbols))}


def _dht_segment(tclass: int, tid: int, codes: dict[int, tuple[int, int]]) -> bytes:
    bits = [0] * 16
    by_len: dict[int, list[tuple[int, int]]] = {}
    for sym, (code, length) in codes.items():
        bits[length - 1] += 1
        by_len.setdefault(length, []).append((code, sym))
    vals = bytearray()
    for length in sorted(by_len):
        for _, sym in sorted(by_len[length]):
            vals.append(sym)
    payload = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_CODES = _canonical_codes(_DC_SYMBOLS, 4)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 8)


def _encode_block(w: _BitWriter, coeffs, dc_pred: int) -> int:
    """coeffs: 64 ints in zigzag order. Returns the new DC predictor."""
    dc = int(coeffs[0])
    diff = dc - dc_pred
    cat = _category(diff)
    code, length = _DC_CODES[cat]
    w.put(code, length)
    if cat:
        w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last = 63
    while last > 0 and coeffs[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _AC_CODES[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size = _category(v)
        if size > 10:
            raise MediaDecodeError("AC coefficient out of baseline range")
        c, ln = _AC_CODES[(run << 4) | size]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        c, ln = _AC_CODES[0x00]  # EOB
        w.put(c, ln)
    return dc


def _component_blocks(plane, q):
    """plane (h, w) float64 -> (n_blocks_y, n_blocks_x, 64) quantized
    zigzag coefficients."""
    import numpy as np

    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = padded.shape
    d = _dct_matrix()
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ij,abjk,lk->abil", d, blocks - 128.0, d)
    quant = np.round(f / q.reshape(8, 8)).astype(np.int32)
    flat = quant.reshape(H // 8, W // 8, 64)
    return flat[:, :, np.asarray(ZIGZAG)]  # natural -> zigzag order


def _box_down(plane, fy: int, fx: int):
    """Box-average downsample by integer factors (with edge pad)."""
    import numpy as np

    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    p = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
        axis=(1, 3))


def jpeg_encode(pixels, quality: int = 85, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF: (h, w) gray -> 1 component; (h, w, 3) RGB ->
    YCbCr at ``subsampling`` '444' or '420' (2x2 luma MCUs with
    box-averaged chroma — the dominant real-world layout).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
    (DC predictors reset), the error-resilience feature big encoders
    use. Deterministic: fixed tables, fixed scan order."""
    import numpy as np

    px = np.ascontiguousarray(pixels)
    if px.ndim == 2:
        comps = [px.astype(np.float64)]
        factors = [(1, 1)]
    elif px.ndim == 3 and px.shape[2] == 3:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]
            comps = [comps[0]] + [_box_down(c, 2, 2) for c in comps[1:]]
        elif subsampling == "444":
            factors = [(1, 1)] * 3
        else:
            raise MediaDecodeError(f"unsupported subsampling {subsampling!r}")
    else:
        raise MediaDecodeError("jpeg_encode: expected (h,w) or (h,w,3)")
    h, w = px.shape[:2]
    if not (h and w):
        raise MediaDecodeError("jpeg_encode: empty image")
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    n = len(comps)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    zz = list(ZIGZAG)
    for tid, q in ([(0, ql)] if n == 1 else [(0, ql), (1, qc)]):
        payload = bytes([tid]) + bytes(int(q[i]) for i in zz)
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    sof = struct.pack(">BHHB", 8, h, w, n)
    for cid in range(1, n + 1):
        fh_, fv_ = factors[cid - 1]
        sof += bytes([cid, fh_ << 4 | fv_, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_CODES) + _dht_segment(1, 0, _AC_CODES)
    if n == 3:
        out += _dht_segment(0, 1, _DC_CODES) + _dht_segment(1, 1, _AC_CODES)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([n])
    for cid in range(1, n + 1):
        t = 0 if cid == 1 else 1
        sos += bytes([cid, t << 4 | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # per-component block grids, padded to the full MCU lattice
    all_blocks = []
    for i, (c, (fh_, fv_)) in enumerate(zip(comps, factors)):
        ch, cw = c.shape
        th, tw = mcuy * fv_ * 8, mcux * fh_ * 8
        c = np.pad(c, ((0, th - ch), (0, tw - cw)), mode="edge")
        all_blocks.append(_component_blocks(c, ql if i == 0 else qc))

    writer = _BitWriter()
    preds = [0] * n
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.flush()
                out_rst = 0xD0 + ((mcu_count // restart_interval - 1) % 8)
                writer.out += bytes([0xFF, out_rst])
                preds = [0] * n
            for ci in range(n):
                fh_, fv_ = factors[ci]
                for by in range(fv_):
                    for bx in range(fh_):
                        preds[ci] = _encode_block(
                            writer,
                            all_blocks[ci][my * fv_ + by, mx * fh_ + bx],
                            preds[ci])
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        # eager refills (fill ahead of need, set by _decode_scan when
        # the image declares no restart interval): a fill can then
        # only ever hit the scan-terminating marker, whose 0xFF
        # padding is position-stable — so prefetching changes no
        # decode outcome, and the Huffman fast path below can peek 8
        # bits at a time. With restart markers the lazy reference
        # walk is kept: an early fill there could meet an RSTn one
        # symbol before the per-bit reader would.
        self.eager = False

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise MediaDecodeError("jpeg: entropy data exhausted")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                raise _Restart()
            else:
                # marker (EOI or next segment): pad with 1s per spec
                byte = 0xFF
                self.acc = (self.acc << 8) | byte
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        v = (self.acc >> self.n) & 1
        # drop consumed bits: without the mask `acc` accumulates the
        # whole scan's history and every shift goes bigint-quadratic
        # (measured: 190 ms to decode one 64x64 baseline JPEG; 2.9 ms
        # with the mask — r13 optimization round)
        self.acc &= (1 << self.n) - 1
        return v

    def bits(self, k: int) -> int:
        # bulk form of k chained bit() calls: a valid stream always
        # holds the k bits a just-decoded Huffman symbol announces, so
        # filling up-front performs exactly the fills the per-bit loop
        # would — then one shift extracts what the loop built bit-wise
        if not k:
            return 0
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def skip_restart(self) -> None:
        """Consume the RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise MediaDecodeError("jpeg: missing restart marker")


class _Restart(Exception):
    pass


class _HuffTable:
    """Canonical T.81 table in two forms: the (length, code) -> symbol
    dict (the exact reference decode) plus a 256-entry LUT over the
    next 8 bits for codes of length <= 8 — one lookup instead of up
    to 8 dict probes for the overwhelmingly common short codes."""

    __slots__ = ("dict", "lut")

    def __init__(self, table: dict[tuple[int, int], int]):
        self.dict = table
        lut: list[tuple[int, int] | None] = [None] * 256
        for (length, code), sym in table.items():
            if length <= 8:
                lo = code << (8 - length)
                for idx in range(lo, lo + (1 << (8 - length))):
                    lut[idx] = (sym, length)
        self.lut = lut


@functools.lru_cache(maxsize=64)
def _build_huffman(bits: bytes, vals: bytes) -> _HuffTable:
    """(length, code) -> symbol, canonical per T.81. Cached per
    worker: a corpus encoded by one encoder (or an MJPEG stream's
    frames) repeats the same DHT segments image after image, and the
    table + LUT build is per-image fixed cost otherwise (§4.5)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return _HuffTable(table)


def _huff_decode(r: _BitReader, table: _HuffTable) -> int:
    if r.eager:
        # restart-free scan: prefetching is position-safe (see
        # _BitReader.eager). One LUT probe resolves any code of
        # length <= 8; the LUT is exhaustive over those, so a miss
        # means length >= 9 — resolved with direct peeks, no per-bit
        # walk.
        while r.n < 8:
            r._fill()
        hit = table.lut[(r.acc >> (r.n - 8)) & 0xFF]
        if hit is not None:
            sym, length = hit
            r.n -= length
            r.acc &= (1 << r.n) - 1
            return sym
        while r.n < 16:
            r._fill()
        acc, n = r.acc, r.n
        tdict = table.dict
        for length in range(9, 17):
            sym = tdict.get((length, acc >> (n - length)))
            if sym is not None:
                r.n = n - length
                r.acc = acc & ((1 << r.n) - 1)
                return sym
        raise MediaDecodeError("jpeg: invalid huffman code")
    # reference walk (restart-interval scans): fill only on demand
    if r.n >= 8:
        hit = table.lut[(r.acc >> (r.n - 8)) & 0xFF]
        if hit is not None:
            sym, length = hit
            r.n -= length
            r.acc &= (1 << r.n) - 1
            return sym
    tdict = table.dict
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = tdict.get((length, code))
        if sym is not None:
            return sym
    raise MediaDecodeError("jpeg: invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_boundary(fn):
    """Same contract as codecs._decoder, widened: malformed segments
    can also surface as ValueError (np.frombuffer on an odd-length
    16-bit DQT) — a corrupt crawled JPEG must die as MediaDecodeError
    so on_error='null' handlers catch it, never abort the task."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *args, **kwargs):
        try:
            return fn(data, *args, **kwargs)
        except (struct.error, IndexError, ValueError, KeyError) as exc:
            raise MediaDecodeError(
                f"{fn.__name__}: truncated/malformed input ({exc})"
            ) from None

    return wrapped


@_decode_boundary
def jpeg_pixels(data: bytes):
    """Decode baseline sequential JPEG -> (h, w, ch) uint8 (ch = 1
    gray, 3 color). Progressive (SOF2) and arithmetic coding raise."""
    import numpy as np

    d = bytes(data)
    if d[:3] != b"\xff\xd8\xff":
        raise MediaDecodeError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[np.asarray(ZIGZAG)] = np.arange(64)

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise MediaDecodeError(f"jpeg: expected marker at {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        seg = d[pos + 4:pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise MediaDecodeError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                if len(vals) != 64:
                    raise MediaDecodeError("jpeg: bad DQT")
                nat = np.empty(64, dtype=np.int32)
                nat[np.asarray(ZIGZAG)] = vals
                quant[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = seg[p + 1:p + 17]
                n = sum(bits)
                vals = seg[p + 17:p + 17 + n]
                if len(bits) != 16 or len(vals) != n:
                    raise MediaDecodeError("jpeg: bad DHT")
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise MediaDecodeError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq,
                })
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"jpeg: non-baseline frame (SOF{marker & 0x0F}) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaDecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None)
                if comp is None:
                    raise MediaDecodeError("jpeg: scan names unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(
                d, pos + 2 + seglen, frame, scan, quant, huff,
                restart_interval, inv_zz)
        pos += 2 + seglen
    raise MediaDecodeError("jpeg: no scan data")


def _decode_scan_eager(d, pos, scan, quant, huff, inv_zz, planes,
                       mcuy, mcux, dct):
    """Restart-free scan walk with the _BitReader/_huff_decode logic
    INLINED into one loop over local variables (r14): at realistic
    image sizes the entropy decode is ~2 µs of Python call overhead
    per symbol (_huff_decode -> _fill -> bits -> _extend, profiled at
    ~70% of a 256x256 decode) and this loop performs the exact same
    fills, LUT probes, direct 9..16-bit peeks and extends without the
    per-symbol call stack. Bit-exact by construction — the per-bit
    lazy walk remains the reference and the differential test pins
    this path to it."""
    import numpy as np

    data = d
    L = len(data)
    acc = 0
    n = 0
    preds = [0] * len(scan)
    meta = []
    for comp, td, ta in scan:
        dc_tab = huff.get((0, td))
        ac_tab = huff.get((1, ta))
        q = quant.get(comp["tq"])
        if dc_tab is None or ac_tab is None or q is None:
            raise MediaDecodeError("jpeg: missing table")
        meta.append((comp, dc_tab.lut, dc_tab.dict, ac_tab.lut,
                     ac_tab.dict, q.reshape(8, 8)))
    dctT = dct.T
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (comp, dc_lut, dc_dict, ac_lut, ac_dict, q8) \
                    in enumerate(meta):
                cv, chh = comp["v"], comp["h"]
                plane = planes[ci]
                for by in range(cv):
                    for bx in range(chh):
                        coeffs = [0] * 64
                        # --- DC symbol (LUT probe, inline fills) ---
                        while n < 8:
                            if pos >= L:
                                raise MediaDecodeError(
                                    "jpeg: entropy data exhausted")
                            b = data[pos]
                            if b == 0xFF:
                                nxt = data[pos + 1] if pos + 1 < L else 0xD9
                                if nxt == 0x00:
                                    pos += 2
                                elif 0xD0 <= nxt <= 0xD7:
                                    raise MediaDecodeError(
                                        "jpeg: unexpected restart marker")
                                else:  # marker: pad 1s, pos stays
                                    acc = (acc << 8) | 0xFF
                                    n += 8
                                    continue
                            else:
                                pos += 1
                            acc = (acc << 8) | b
                            n += 8
                        hit = dc_lut[(acc >> (n - 8)) & 0xFF]
                        if hit is not None:
                            sym, ln = hit
                            n -= ln
                            acc &= (1 << n) - 1
                        else:
                            while n < 16:
                                if pos >= L:
                                    raise MediaDecodeError(
                                        "jpeg: entropy data exhausted")
                                b = data[pos]
                                if b == 0xFF:
                                    nxt = (data[pos + 1]
                                           if pos + 1 < L else 0xD9)
                                    if nxt == 0x00:
                                        pos += 2
                                    elif 0xD0 <= nxt <= 0xD7:
                                        raise MediaDecodeError(
                                            "jpeg: unexpected restart marker")
                                    else:
                                        acc = (acc << 8) | 0xFF
                                        n += 8
                                        continue
                                else:
                                    pos += 1
                                acc = (acc << 8) | b
                                n += 8
                            for ln in range(9, 17):
                                sym = dc_dict.get((ln, acc >> (n - ln)))
                                if sym is not None:
                                    n -= ln
                                    acc &= (1 << n) - 1
                                    break
                            else:
                                raise MediaDecodeError(
                                    "jpeg: invalid huffman code")
                        if sym:
                            while n < sym:
                                if pos >= L:
                                    raise MediaDecodeError(
                                        "jpeg: entropy data exhausted")
                                b = data[pos]
                                if b == 0xFF:
                                    nxt = (data[pos + 1]
                                           if pos + 1 < L else 0xD9)
                                    if nxt == 0x00:
                                        pos += 2
                                    elif 0xD0 <= nxt <= 0xD7:
                                        raise MediaDecodeError(
                                            "jpeg: unexpected restart marker")
                                    else:
                                        acc = (acc << 8) | 0xFF
                                        n += 8
                                        continue
                                else:
                                    pos += 1
                                acc = (acc << 8) | b
                                n += 8
                            n -= sym
                            v = (acc >> n) & ((1 << sym) - 1)
                            acc &= (1 << n) - 1
                            preds[ci] += (v if v >= (1 << (sym - 1))
                                          else v - (1 << sym) + 1)
                        coeffs[0] = preds[ci]
                        # --- AC symbols ---
                        k = 1
                        while k < 64:
                            while n < 8:
                                if pos >= L:
                                    raise MediaDecodeError(
                                        "jpeg: entropy data exhausted")
                                b = data[pos]
                                if b == 0xFF:
                                    nxt = (data[pos + 1]
                                           if pos + 1 < L else 0xD9)
                                    if nxt == 0x00:
                                        pos += 2
                                    elif 0xD0 <= nxt <= 0xD7:
                                        raise MediaDecodeError(
                                            "jpeg: unexpected restart marker")
                                    else:
                                        acc = (acc << 8) | 0xFF
                                        n += 8
                                        continue
                                else:
                                    pos += 1
                                acc = (acc << 8) | b
                                n += 8
                            hit = ac_lut[(acc >> (n - 8)) & 0xFF]
                            if hit is not None:
                                sym, ln = hit
                                n -= ln
                                acc &= (1 << n) - 1
                            else:
                                while n < 16:
                                    if pos >= L:
                                        raise MediaDecodeError(
                                            "jpeg: entropy data exhausted")
                                    b = data[pos]
                                    if b == 0xFF:
                                        nxt = (data[pos + 1]
                                               if pos + 1 < L else 0xD9)
                                        if nxt == 0x00:
                                            pos += 2
                                        elif 0xD0 <= nxt <= 0xD7:
                                            raise MediaDecodeError(
                                                "jpeg: unexpected restart "
                                                "marker")
                                        else:
                                            acc = (acc << 8) | 0xFF
                                            n += 8
                                            continue
                                    else:
                                        pos += 1
                                    acc = (acc << 8) | b
                                    n += 8
                                for ln in range(9, 17):
                                    sym = ac_dict.get((ln, acc >> (n - ln)))
                                    if sym is not None:
                                        n -= ln
                                        acc &= (1 << n) - 1
                                        break
                                else:
                                    raise MediaDecodeError(
                                        "jpeg: invalid huffman code")
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63 or not size:
                                raise MediaDecodeError(
                                    "jpeg: AC run past block")
                            while n < size:
                                if pos >= L:
                                    raise MediaDecodeError(
                                        "jpeg: entropy data exhausted")
                                b = data[pos]
                                if b == 0xFF:
                                    nxt = (data[pos + 1]
                                           if pos + 1 < L else 0xD9)
                                    if nxt == 0x00:
                                        pos += 2
                                    elif 0xD0 <= nxt <= 0xD7:
                                        raise MediaDecodeError(
                                            "jpeg: unexpected restart marker")
                                    else:
                                        acc = (acc << 8) | 0xFF
                                        n += 8
                                        continue
                                else:
                                    pos += 1
                                acc = (acc << 8) | b
                                n += 8
                            n -= size
                            v = (acc >> n) & ((1 << size) - 1)
                            acc &= (1 << n) - 1
                            coeffs[k] = (v if v >= (1 << (size - 1))
                                         else v - (1 << size) + 1)
                            k += 1
                        # --- dequant + IDCT (reference arithmetic:
                        # int32 product, then float64 matmuls) ---
                        nat = (np.asarray(coeffs, dtype=np.int32)[inv_zz]
                               .reshape(8, 8) * q8)
                        block = dctT @ nat.astype(np.float64) @ dct
                        y0 = (my * cv + by) * 8
                        x0 = (mx * chh + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = block + 128.0


def _decode_scan(d, pos, frame, scan, quant, huff, restart_interval, inv_zz):
    import numpy as np

    fh, fw = frame["h"], frame["w"]
    if not (fh and fw):
        raise MediaDecodeError("jpeg: empty frame")
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps) or 1
    vmax = max(c["v"] for c in comps) or 1
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise MediaDecodeError("jpeg: bad sampling factors")
        planes.append(np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
    dct = _dct_matrix()
    reader = _BitReader(d, pos)
    reader.eager = not restart_interval
    if reader.eager:
        # restart-free scan: the inlined fast walk (r14). Dispatch on
        # reader.eager so the differential test's forced-lazy reader
        # still exercises the per-bit reference below.
        _decode_scan_eager(d, pos, scan, quant, huff, inv_zz, planes,
                           mcuy, mcux, dct)
        return _assemble_planes(planes, comps, hmax, vmax, fh, fw)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.skip_restart()
                preds = [0] * len(comps)
            try:
                for ci, (comp, td, ta) in enumerate(scan):
                    dc_tab = huff.get((0, td))
                    ac_tab = huff.get((1, ta))
                    q = quant.get(comp["tq"])
                    if dc_tab is None or ac_tab is None or q is None:
                        raise MediaDecodeError("jpeg: missing table")
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coeffs = np.zeros(64, dtype=np.int32)
                            sym = _huff_decode(reader, dc_tab)
                            if sym:
                                preds[ci] += _extend(reader.bits(sym), sym)
                            coeffs[0] = preds[ci]
                            k = 1
                            while k < 64:
                                sym = _huff_decode(reader, ac_tab)
                                if sym == 0x00:
                                    break
                                if sym == 0xF0:
                                    k += 16
                                    continue
                                run, size = sym >> 4, sym & 0x0F
                                k += run
                                if k > 63 or not size:
                                    raise MediaDecodeError(
                                        "jpeg: AC run past block")
                                coeffs[k] = _extend(reader.bits(size), size)
                                k += 1
                            nat = coeffs[inv_zz].reshape(8, 8) * q.reshape(8, 8)
                            block = dct.T @ nat.astype(np.float64) @ dct
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = block + 128.0
            except _Restart:
                raise MediaDecodeError(
                    "jpeg: unexpected restart marker") from None
            mcu_count += 1
    return _assemble_planes(planes, comps, hmax, vmax, fh, fw)


def _assemble_planes(planes, comps, hmax, vmax, fh, fw):
    import numpy as np

    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:fh, :fw])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
