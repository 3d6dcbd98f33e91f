"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

Decoding is pluggable: ``library_decoder`` is a real pure-stdlib codec
(binary PPM/PGM, uncompressed 24-bit BMP, 8-bit PNG, baseline
sequential JPEG, PCM WAV) that raises only on formats needing
external libraries (progressive JPEG / MP4 → PIL/av plug in via
``decoder=``); ``fake_decoder`` derives deterministic pseudo-pixels
from the payload hash for tests that exercise batch shape and
partitioning without real media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feat", T.ArrayType(T.FloatType()), False),
])


def library_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Real pure-stdlib codec (no PIL/soundfile/av needed): decodes
    binary PPM/PGM (P6/P5), uncompressed 24-bit BMP, 8-bit PNG, and
    baseline sequential JPEG rasters to a float32 2-D grayscale
    array, and PCM WAV audio to a float32 1-D array scaled to
    [-1, 1]. The format is sniffed from magic bytes; anything else
    (progressive JPEG, MP4, ...) raises ValueError — that is the
    integration point where PIL/av plug in on clusters that have
    them."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    raise ValueError(
        f"unsupported media payload (magic {payload[:4]!r}); built-in "
        "codecs: binary PPM/PGM, uncompressed 24-bit BMP, 8-bit PNG, "
        "baseline JPEG, PCM WAV — plug PIL/av into "
        "extract_features(decoder=...) for progressive JPEG/MP4")


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray): ASCII header of magic,
    width, height, maxval (with '#' comments), then raw samples.
    RGB collapses to grayscale by channel mean."""
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":          # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    # single whitespace after maxval, then raster; tolerate the
    # common non-conforming CRLF terminator (skipping all whitespace
    # would be WRONG — raster bytes may legitimately be 0x0A/0x20)
    if payload[i:i + 2] == b"\r\n":
        i += 2
    else:
        i += 1
    w, h, maxval = (int(t) for t in tokens)
    if maxval >= 256:
        raise ValueError("16-bit PNM samples not supported")
    n_ch = 3 if payload[:2] == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * n_ch,
                           offset=i).astype(np.float32)
    if n_ch == 3:
        return raster.reshape(h, w, 3).mean(axis=2)
    return raster.reshape(h, w)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP: little-endian headers, BGR rows padded
    to 4 bytes, bottom-up unless the height is negative."""
    import struct
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got {bpp}-bit, compression {comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3).astype(np.float32).mean(axis=2)
    return img[::-1] if bottom_up else img


def _decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG, pure stdlib: chunk walk → zlib
    inflate of the IDAT stream → per-scanline unfiltering (None /
    Sub / Up / Average / Paeth, RFC 2083 §6) → float32 grayscale
    (color collapses by channel mean; alpha is ignored; palette
    images map through PLTE first). 16-bit and interlaced (Adam7)
    images raise — those are the PIL integration point."""
    import struct
    import zlib

    pos, idat, plte = 8, bytearray(), None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                      # len + tag + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth {depth})")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * n_ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)                     # row above, unfiltered
    bpp = n_ch                                   # bytes per pixel at depth 8
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        row = bytearray(raw[base + 1:base + 1 + stride])
        if ft == 1:                              # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:                            # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:                            # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:                            # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row
        prev = row
    img = out.reshape(h, w, n_ch)
    if ctype == 3:                               # palette → RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[img[:, :, 0]].astype(np.float32).mean(axis=2)
    if ctype == 0:
        return img[:, :, 0].astype(np.float32)
    if ctype == 4:                               # gray + alpha
        return img[:, :, 0].astype(np.float32)
    return img[:, :, :3].astype(np.float32).mean(axis=2)   # RGB / RGBA


def _decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV via the stdlib ``wave`` module: 8/16/32-bit samples to
    float32 in [-1, 1]; multi-channel averages to mono."""
    import io
    import wave
    with wave.open(io.BytesIO(payload)) as wf:
        n_ch, sampwidth = wf.getnchannels(), wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sampwidth == 1:      # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x


# ---- JPEG: baseline sequential DCT, pure stdlib + numpy -----------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])


def _dct_matrix() -> np.ndarray:
    """8×8 type-II DCT basis: row u is c(u)/2 · cos((2x+1)uπ/16)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] /= np.sqrt(2)
    return m


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT (bits, values) spec:
    lookup maps (code_length, code_value) → symbol."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG RECEIVE/EXTEND: an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential-DCT JFIF decoder, pure stdlib + numpy:
    marker walk → DQT/DHT/SOF0/SOS parse → canonical-Huffman entropy
    decode (byte-stuffing removed, restart markers reset the DC
    predictors) → dequantize → de-zigzag → matrix IDCT → level shift.
    Supports divisor sampling factors — each component's h/v divides
    the maximum, which covers 4:4:4 / 4:2:2 / 4:2:0 / 4:1:1 (chroma
    planes nearest-neighbor upsample) — 8-bit precision, 1 or 3
    components. Progressive
    (SOF2), arithmetic coding, 12-bit precision, and hierarchical
    modes raise — that is the PIL integration point. 3-component
    output converts YCbCr→RGB (JFIF/BT.601 full range) and collapses
    by channel mean, matching the other raster codecs here."""
    import struct

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    saw_sos = False
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:                      # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        data = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:                      # DQT (possibly several)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq:                          # 16-bit table
                    vals = np.frombuffer(data[i + 1:i + 129], ">u2")
                    i += 129
                else:
                    vals = np.frombuffer(data[i + 1:i + 65], np.uint8)
                    i += 65
                qt[tq] = vals.astype(np.int32)
            continue
        if marker == 0xC2:                      # SOF2: progressive
            return _decode_jpeg_progressive(payload)
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) and progressive "
                             "(SOF2) JPEG supported — extended/"
                             "arithmetic/lossless decode via the PIL "
                             "integration point")
        if marker == 0xC0:                      # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", data, 6 + 3 * c)
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 0x0F, "tq": tq})
            continue
        if marker == 0xC4:                      # DHT (possibly several)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1:i + 17])
                n = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, data[i + 17:i + 17 + n])
                i += 17 + n
            continue
        if marker == 0xDD:                      # DRI
            restart_interval = struct.unpack(">H", data)[0]
            continue
        if marker == 0xDA:                      # SOS — entropy data follows
            saw_sos = True
            ns = data[0]
            for c in range(ns):
                cid, tables = data[1 + 2 * c], data[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = huff[(0, tables >> 4)]
                comp["ac"] = huff[(1, tables & 0x0F)]
            break
        # APPn / COM / anything else: skipped
    if not saw_sos:
        # NOT a while/else: the EOI branch also breaks, which would
        # bypass an else-guard and crash later with an opaque error
        raise ValueError("JPEG has no SOS scan")

    # entropy segment: strip stuffing, split at restart markers
    # (shared helper with the progressive path)
    intervals, _ = _entropy_intervals(payload, pos)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            # np.repeat upsampling needs integer ratios; exotic
            # non-divisor factors (e.g. 3:2) go to the PIL path
            raise ValueError(
                f"non-divisor JPEG sampling factors "
                f"({c['h']}x{c['v']} vs max {hmax}x{vmax}) "
                f"not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float32)
              for c in comps]
    m = _dct_matrix()
    reader = _BitReader(intervals[0])
    interval_idx = 0
    pred = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            interval_idx += 1
            reader = _BitReader(intervals[interval_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, comp in enumerate(comps):
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coeffs = np.zeros(64, np.int32)
                    s = reader.decode(comp["dc"])
                    pred[ci] += _extend(reader.read_bits(s), s)
                    coeffs[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode(comp["ac"])
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:         # ZRL: 16 zeros
                                k += 16
                                continue
                            break               # EOB
                        k += r
                        coeffs[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    block = np.zeros(64, np.float32)
                    block[_ZIGZAG] = coeffs * qt[comp["tq"]]
                    px = m.T @ block.reshape(8, 8) @ m + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.float32)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([np.clip(np.rint(c), 0, 255) for c in (r, g, b)])
    return rgb.mean(axis=0).astype(np.float32)


def _entropy_intervals(payload: bytes, pos: int) -> tuple[list, int]:
    """Entropy-coded data starting at ``pos``: byte-stuffing removed,
    split at RSTn markers; returns (intervals, position of the next
    non-RST marker's 0xFF)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:             # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                               # real marker
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals, i


def _decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Progressive-DCT JFIF decoder (SOF2, T.81 Annex G.1.2): the
    coefficient arrays accumulate across every SOS scan — DC
    first/refinement (interleaved or not), AC spectral-selection
    bands with EOB runs, and AC successive-approximation refinement
    with correction bits — then dequantize + IDCT exactly like the
    baseline path.  Restart markers reset the DC predictors and the
    EOB run per interval.  Conformance is pinned by golden tests
    against the repo's own spec-following progressive encoder: the
    progressive rendition of an image must decode bit-identically to
    its baseline rendition (same quantized coefficients)."""
    import struct

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    coeffs: list[np.ndarray] = []               # per comp: (by, bx, 64)
    geom = None
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:                      # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        data = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq:
                    vals = np.frombuffer(data[i + 1:i + 129], ">u2")
                    i += 129
                else:
                    vals = np.frombuffer(data[i + 1:i + 65], np.uint8)
                    i += 65
                qt[tq] = vals.astype(np.int32)
            continue
        if marker == 0xC4:
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1:i + 17])
                n = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, data[i + 17:i + 17 + n])
                i += 17 + n
            continue
        if marker == 0xDD:
            restart_interval = struct.unpack(">H", data)[0]
            continue
        if marker == 0xC2:                      # SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", data, 6 + 3 * c)
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise ValueError("non-divisor JPEG sampling "
                                     "factors not supported")
                # full padded grid (interleaved scans touch the MCU
                # padding blocks) and the component's own block count
                # (non-interleaved scans traverse only those)
                c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]
                cw = -(-(w * c["h"]) // hmax)   # component pixel dims
                chh = -(-(h * c["v"]) // vmax)
                c["nbx"] = -(-cw // 8)
                c["nby"] = -(-chh // 8)
                coeffs.append(np.zeros((c["bh"], c["bw"], 64), np.int32))
            geom = (hmax, vmax, mcux, mcuy)
            continue
        if marker != 0xDA:                      # APPn/COM/...
            continue
        # ---- SOS: scan header + entropy data, processed now ----
        if geom is None:
            raise ValueError("JPEG SOS before SOF2")
        hmax, vmax, mcux, mcuy = geom
        ns = data[0]
        scan = []
        for c in range(ns):
            cid, tables = data[1 + 2 * c], data[2 + 2 * c]
            ci = next(i for i, x in enumerate(comps) if x["id"] == cid)
            scan.append((ci, tables >> 4, tables & 0x0F))
        ss, se, a = data[1 + 2 * ns:4 + 2 * ns]
        ah, al = a >> 4, a & 0x0F
        intervals, pos = _entropy_intervals(payload, pos)
        reader = _BitReader(intervals[0])
        iv = 0
        pred = [0] * len(comps)
        eobrun = 0

        def restart(unit):
            nonlocal reader, iv, pred, eobrun
            if restart_interval and unit and unit % restart_interval == 0:
                iv += 1
                reader = _BitReader(intervals[iv])
                pred = [0] * len(comps)
                eobrun = 0

        if ss == 0:                             # ---- DC scan ----
            if ns > 1:                          # interleaved MCU order
                units = [(ci, (my * comps[ci]["v"] + by),
                          (mx * comps[ci]["h"] + bx), mcu)
                         for mcu in range(mcux * mcuy)
                         for my, mx in [divmod(mcu, mcux)]
                         for ci, _, _ in scan
                         for by in range(comps[ci]["v"])
                         for bx in range(comps[ci]["h"])]
            else:
                ci = scan[0][0]
                units = [(ci, by, bx, by * comps[ci]["nbx"] + bx)
                         for by in range(comps[ci]["nby"])
                         for bx in range(comps[ci]["nbx"])]
            tables = {ci: huff[(0, td)] for ci, td, _ in scan}
            last_unit = -1
            for ci, by, bx, unit in units:
                if unit != last_unit:
                    restart(unit)
                    last_unit = unit
                blk = coeffs[ci][by, bx]
                if ah == 0:                     # first DC pass
                    s = reader.decode(tables[ci])
                    pred[ci] += _extend(reader.read_bits(s), s)
                    blk[0] = pred[ci] << al
                else:                           # DC refinement
                    blk[0] |= reader.read_bit() << al
            continue
        # ---- AC scan: single component, own block raster ----
        if ns != 1:
            raise ValueError("progressive AC scan must be "
                             "non-interleaved")
        ci, _, ta = scan[0]
        ac = huff[(1, ta)]
        nbx, nby = comps[ci]["nbx"], comps[ci]["nby"]
        for unit in range(nby * nbx):
            restart(unit)
            by, bx = divmod(unit, nbx)
            blk = coeffs[ci][by, bx]
            if ah == 0:                         # ---- first AC pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:             # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    blk[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
                continue
            # ---- AC refinement (T.81 G.1.2.3 correction bits) ----
            plus, minus = 1 << al, -1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(ac)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:             # EOBn
                            eobrun = (1 << r)
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: pass 16 zero-history coefficients
                    else:                       # newly-significant ±1
                        val = plus if reader.read_bit() else minus
                    while k <= se:
                        if blk[k]:
                            # history coefficient: correction bit
                            if reader.read_bit() and not (
                                    blk[k] & plus):
                                blk[k] += plus if blk[k] > 0 else minus
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun:
                # EOB band remainder: correction bits only
                while k <= se:
                    if blk[k]:
                        if reader.read_bit() and not (blk[k] & plus):
                            blk[k] += plus if blk[k] > 0 else minus
                    k += 1
                eobrun -= 1
    if geom is None:
        raise ValueError("JPEG has no SOF2 frame header")

    hmax, vmax, mcux, mcuy = geom
    m = _dct_matrix()
    planes = []
    for ci, comp in enumerate(comps):
        plane = np.zeros((comp["bh"] * 8, comp["bw"] * 8), np.float32)
        q = qt[comp["tq"]]
        for by in range(comp["bh"]):
            for bx in range(comp["bw"]):
                block = np.zeros(64, np.float32)
                block[_ZIGZAG] = coeffs[ci][by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    m.T @ block.reshape(8, 8) @ m + 128.0
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.float32)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([np.clip(np.rint(c), 0, 255) for c in (r, g, b)])
    return rgb.mean(axis=0).astype(np.float32)


def _mp4_boxes(buf, start, end):
    import struct
    pos = start
    while pos + 8 <= end:
        size, tag = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:                     # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:                   # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield tag, pos + hdr, pos + size
        pos += size


def _mp4_find(buf, start, end, tag):
    for t, a, b in _mp4_boxes(buf, start, end):
        if t == tag:
            return a, b
    return None


def _mp4_sample_ranges(payload: bytes, stbl: tuple) -> list | None:
    """Absolute (offset, size) of every sample, from the track's
    stsz (sizes) + stco/co64 (chunk offsets) + stsc (sample-to-chunk
    runs) — the ISO-BMFF addressing triple.  None when any box is
    missing (metadata-only fixtures)."""
    import struct

    stsz = _mp4_find(payload, *stbl, b"stsz")
    stsc = _mp4_find(payload, *stbl, b"stsc")
    stco = _mp4_find(payload, *stbl, b"stco")
    co64 = None if stco else _mp4_find(payload, *stbl, b"co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        return None
    uniform, n = struct.unpack_from(">II", payload, stsz[0] + 4)
    sizes = ([uniform] * n if uniform else
             [struct.unpack_from(">I", payload, stsz[0] + 12 + 4 * i)[0]
              for i in range(n)])
    if stco:
        nc = struct.unpack_from(">I", payload, stco[0] + 4)[0]
        chunk_offs = [struct.unpack_from(">I", payload,
                                         stco[0] + 8 + 4 * i)[0]
                      for i in range(nc)]
    else:
        nc = struct.unpack_from(">I", payload, co64[0] + 4)[0]
        chunk_offs = [struct.unpack_from(">Q", payload,
                                         co64[0] + 8 + 8 * i)[0]
                      for i in range(nc)]
    ne = struct.unpack_from(">I", payload, stsc[0] + 4)[0]
    runs = [struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)
            for i in range(ne)]               # (first_chunk, per, desc)
    # samples-per-chunk for every chunk: each stsc run applies from
    # its first_chunk (1-based) until the next run's
    per_chunk = []
    for ri, (first, per, _d) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else nc
        per_chunk += [per] * (last - first + 1)
    out, si = [], 0
    for ci, base in enumerate(chunk_offs):
        off = base
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n:
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out if len(out) == n else None


# MJPEG-in-MP4 sample-entry fourccs the pure-stdlib JPEG decoder can
# decode directly (QuickTime Motion JPEG A/B and the generic 'jpeg'
# entry ISO files use for JPEG video tracks).
MJPEG_CODECS = ("jpeg", "mjpa", "mjpb", "mjpg", "MJPG")
# Uncompressed fourccs a pure-stdlib engine decodes for real: 'raw '
# (QuickTime uncompressed RGB — depth 24 packed RGB, depth 8 gray)
# and 'v308' (Apple TN2162 8-bit 4:4:4 Y'CbCr, byte order Cr Y' Cb).
RAW_CODECS = ("raw ", "v308")
REAL_MP4_CODECS = MJPEG_CODECS + RAW_CODECS


def probe_mp4(payload: bytes) -> dict:
    """Pure-stdlib ISO-BMFF (MP4) METADATA probe: walk the box tree
    (size/type headers, 64-bit largesize supported) and read
    mvhd (movie timescale + duration) and the first video trak's
    mdhd/stts (media timescale, sample count, per-sample durations).
    Returns {duration_ms, timescale, n_samples, sample_times_ms}
    (sample times from the stts run-length table).

    When the track also carries the full addressing triple
    (stsz/stco|co64/stsc) the probe additionally emits ``codec`` (the
    first stsd sample-entry fourcc) and ``samples`` (absolute
    (offset, size) per sample) — enough for REAL frame extraction;
    MJPEG tracks then decode with the repo's own JPEG decoder and
    uncompressed tracks (RAW_CODECS) by sample-entry geometry
    (``decode_mp4_frame``), other codecs (avc1/hevc) remain the
    documented av/PIL decoder= boundary."""
    import struct

    boxes, find = _mp4_boxes, _mp4_find

    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 payload")
    moov = find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    out: dict = {}
    mvhd = find(payload, *moov, b"mvhd")
    if mvhd:
        ver = payload[mvhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", payload, mvhd[0] + 20)
        else:
            ts, dur = struct.unpack_from(">II", payload, mvhd[0] + 12)
        out["timescale"] = ts
        out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    for t, a, b in boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = find(payload, a, b, b"mdia")
        if mdia is None:
            continue
        mdhd = find(payload, *mdia, b"mdhd")
        mts = None
        if mdhd:
            ver = payload[mdhd[0]]
            mts = struct.unpack_from(
                ">I", payload, mdhd[0] + (20 if ver == 1 else 12))[0]
        minf = find(payload, *mdia, b"minf")
        if minf is None:
            continue
        stbl = find(payload, *minf, b"stbl")
        if stbl is None:
            continue
        stts = find(payload, *stbl, b"stts")
        if stts is None or not mts:
            continue
        n_entries = struct.unpack_from(">I", payload, stts[0] + 4)[0]
        times, t_acc, n_samples = [], 0, 0
        for e in range(n_entries):
            cnt, delta = struct.unpack_from(
                ">II", payload, stts[0] + 8 + 8 * e)
            for _ in range(cnt):
                times.append(t_acc * 1000 // mts)
                t_acc += delta
                n_samples += 1
        out["n_samples"] = n_samples
        out["sample_times_ms"] = times
        stsd = find(payload, *stbl, b"stsd")
        if stsd is not None:
            n_desc = struct.unpack_from(">I", payload, stsd[0] + 4)[0]
            if n_desc:
                out["codec"] = payload[stsd[0] + 12:stsd[0] + 16] \
                    .decode("ascii", "replace")
                # VisualSampleEntry geometry (ISO 14496-12 §12.1.3):
                # entry content starts after the 8-byte entry header;
                # width/height at content +24/+26, depth at +74 —
                # needed to reshape uncompressed (RAW_CODECS) samples
                ec = stsd[0] + 16
                if stsd[1] >= ec + 76:
                    w, h = struct.unpack_from(">HH", payload, ec + 24)
                    out["width"], out["height"] = w, h
                    out["depth"] = struct.unpack_from(
                        ">H", payload, ec + 74)[0]
        samples = _mp4_sample_ranges(payload, stbl)
        if samples is not None:
            out["samples"] = samples
        break                                  # first timed track
    return out


def _decode_raw_frame(raw: bytes, meta: dict, codec: str) -> np.ndarray:
    """Decode one UNCOMPRESSED video sample — the second fully-real
    pure-stdlib MP4 codec path beside MJPEG (no entropy coding, just
    the sample-entry geometry):

    - ``raw ``: QuickTime uncompressed — depth 24 is packed RGB
      (collapsed by channel mean, the raster-codec convention here),
      depth 8 is grayscale;
    - ``v308``: Apple TN2162 8-bit 4:4:4 Y'CbCr packed Cr Y' Cb per
      pixel — the luma plane IS the grayscale output.

    Raises ValueError on missing/inconsistent geometry so callers
    (frame_sample) can fall back to the fake-decoder path."""
    w, h = meta.get("width"), meta.get("height")
    if not w or not h:
        raise ValueError(f"{codec!r} track without sample-entry "
                         "width/height — cannot reshape")
    depth = meta.get("depth", 24)
    ch = 1 if (codec == "raw " and depth == 8) else 3
    if len(raw) != w * h * ch:
        raise ValueError(
            f"{codec!r} sample is {len(raw)} bytes, expected "
            f"{w * h * ch} for {w}x{h}x{ch}")
    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    if codec == "v308":
        return a[:, :, 1].astype(np.float32)        # Cr Y' Cb → Y'
    if ch == 1:
        return a[:, :, 0].astype(np.float32)
    return a.astype(np.float32).mean(axis=2)


def decode_mp4_frame(payload: bytes, meta: dict, idx: int) -> np.ndarray:
    """Decode ONE real frame out of an MP4: slice the sample's bytes
    from the container (``meta`` from probe_mp4, with ``samples``)
    and decode them.  MJPEG tracks (fourcc in MJPEG_CODECS) decode
    with the repo's pure-stdlib JPEG decoder — real pixels, no
    external dependency; other codecs try the import-gated ``av``
    library (absent in this environment) and otherwise raise to the
    pluggable decoder= seam, the same gate pattern as plans/pyccd."""
    samples = meta.get("samples")
    if not samples:
        raise ValueError("MP4 carries no sample table (stsz/stco/stsc)"
                         " — metadata-only payload")
    off, size = samples[idx]
    raw = payload[off:off + size]
    codec = meta.get("codec", "")
    if codec in MJPEG_CODECS:
        return _decode_jpeg(raw)
    if codec in RAW_CODECS:
        return _decode_raw_frame(raw, meta, codec)
    try:                                      # import-gated real codec
        import av  # noqa: F401
    except ImportError:
        raise ValueError(
            f"MP4 codec {codec!r} needs the av/ffmpeg boundary "
            f"(absent here) — plug a decoder in at the decoder= seam")
    import io
    with av.open(io.BytesIO(payload)) as container:   # pragma: no cover
        for i, frame in enumerate(container.decode(video=0)):
            if i == idx:
                return frame.to_ndarray(format="gray").astype(np.float64)
    raise ValueError(f"frame {idx} not found")        # pragma: no cover


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decode: expand the payload digest into a
    16×16 pseudo-raster (image/video) or 256-sample wave (audio)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float32)
    return raw.reshape(16, 16) if kind in ("image", "video") else raw


def attach_payloads(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Demo adapter: wrap a text table's bytes as opaque media
    payloads so the plumbing runs against the provided tables."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.col(id_col) % 3 + 1).cast("int"))
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))


def extract_features(media: DataFrame, n_features: int = 16,
                     decoder: Callable = fake_decoder) -> DataFrame:
    """Decode + pooled feature extraction per Arrow batch. The
    per-row work is pure Python/numpy inside mapInPandas — at scale
    this is one narrow pass, no shuffle."""
    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = decoder(bytes(row.payload), row.kind).ravel()
                pooled = arr[:len(arr) - len(arr) % n_features].reshape(
                    n_features, -1).mean(axis=1)
                out.append({
                    "media_id": row.media_id, "kind": row.kind,
                    "n_bytes": len(row.payload),
                    "feat": pooled.astype(np.float32).tolist(),
                })
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES.fields])

    return media.mapInPandas(run, schema=FEATURES)


def resize_images(media: DataFrame, out_h: int = 8, out_w: int = 8,
                  decoder: Callable = fake_decoder) -> DataFrame:
    """Resize plumbing for image/video rasters: decode → area
    (block-mean) downsample to (out_h, out_w) → row-major pixel
    array. Pure numpy inside mapInPandas (no codec dependency), so
    the real resize swaps in with the real decoder. Non-raster rows
    (audio) are dropped."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ])

    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind not in ("image", "video"):
                    continue
                img = decoder(bytes(row.payload), row.kind)
                ih, iw = img.shape
                # area resize: split into out_h×out_w blocks and mean
                ys = np.linspace(0, ih, out_h + 1).astype(int)
                xs = np.linspace(0, iw, out_w + 1).astype(int)
                small = np.array([
                    [img[ys[r]:max(ys[r + 1], ys[r] + 1),
                         xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
                     for c in range(out_w)] for r in range(out_h)])
                out.append({"media_id": row.media_id, "kind": row.kind,
                            "h": out_h, "w": out_w,
                            "pixels": small.ravel().astype(np.float32)
                            .tolist()})
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "h", "w", "pixels"])

    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 decoder: Callable = fake_decoder) -> DataFrame:
    """Video frame-sampling: one output row per sampled frame
    (media_id, frame_idx, feat). For a REAL MP4 payload the sampled
    frame indices come from the container's own timing (probe_mp4
    reads mvhd/mdhd/stts — one sampled frame per ``every_ms`` of
    media time, snapped to the nearest true sample), and when the
    track carries a full sample table with an MJPEG codec the
    sampled frames are REALLY DECODED (decode_mp4_frame → the
    pure-stdlib JPEG decoder) — feat is then the decoded frame's
    column means.  Metadata-only MP4s and non-MP4 payloads fall back
    to the size-derived fake path; other codecs (avc1/hevc) remain
    the pluggable av/ffmpeg decoder= seam."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ])

    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                payload = bytes(row.payload)
                meta = None
                if payload[4:8] == b"ftyp":
                    meta = probe_mp4(payload)
                    times = meta.get("sample_times_ms", [])
                    want = range(0, meta.get("duration_ms", 0) + 1,
                                 every_ms)
                    idxs = sorted({
                        min(range(len(times)),
                            key=lambda j, t=t: abs(times[j] - t))
                        for t in want}) if times else []
                else:
                    idxs = range(max(1, len(payload) // 100))
                # idxs come from the stts table (sample_times_ms) but
                # decode_mp4_frame indexes the stsz/stco-derived
                # samples list — a container whose stts entry count
                # exceeds the stsz sample count must fall back to the
                # fake-decoder path like other malformed-metadata
                # cases, not IndexError inside the Arrow task
                real = bool(meta and meta.get("samples")
                            and meta.get("codec") in REAL_MP4_CODECS
                            and (not idxs
                                 or max(idxs) < len(meta["samples"])))
                for i in idxs:
                    if real:
                        try:
                            frame = decode_mp4_frame(payload, meta, i)
                        except ValueError:
                            # documented malformed-geometry signal
                            # (e.g. a raw sample whose byte count
                            # disagrees with the sample entry) — the
                            # per-frame fake fallback, same contract
                            # as metadata-only payloads
                            frame = decoder(payload + f"|f{i}".encode(),
                                            "video")
                    else:
                        frame = decoder(payload + f"|f{i}".encode(),
                                        "video")
                    out.append({"media_id": row.media_id, "frame_idx": i,
                                "feat": frame.mean(axis=0)
                                .astype(np.float32).tolist()})
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "feat"])

    return media.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------
# Perceptual image hash + hamming near-dup


def _dctn_matrix(n: int) -> np.ndarray:
    """n×n orthonormal type-II DCT basis (generalizes the 8×8 JPEG
    basis above to the 32×32 pHash grid)."""
    u = np.arange(n).reshape(n, 1)
    x = np.arange(n).reshape(1, n)
    m = np.sqrt(2.0 / n) * np.cos((2 * x + 1) * u * np.pi / (2 * n))
    m[0] /= np.sqrt(2)
    return m


def _area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    ih, iw = img.shape
    ys = np.linspace(0, ih, out_h + 1).astype(int)
    xs = np.linspace(0, iw, out_w + 1).astype(int)
    return np.array([
        [img[ys[r]:max(ys[r + 1], ys[r] + 1),
             xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
         for c in range(out_w)] for r in range(out_h)])


# pHash fixed-point parameters: the DCT basis rounds to 1/2^16 and
# the resized raster quantizes to 1/16 grey levels — every
# intermediate is then an EXACT int64 (|coef| ≤ 32²·2^14·255·16 ≈
# 2^50), so the hash is a pure integer function any engine replays
# bit-for-bit (the mm_phash_pairs DuckDB oracle embeds the same
# rounded basis as literals).  Perceptually the sign structure of the
# low-frequency block is unchanged: the basis error is < 2^-16
# relative, far below the coefficient gaps the median threshold
# compares.
PHASH_DCT_SCALE = 1 << 16
PHASH_PIX_SCALE = 16


def _dctn_matrix_int(n: int = 32,
                     scale: int = PHASH_DCT_SCALE) -> np.ndarray:
    return np.rint(_dctn_matrix(n) * scale).astype(np.int64)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash (the classic pHash recipe): area-resize
    to 32×32 → 2-D DCT → keep the 8×8 lowest-frequency block → bit i
    set iff coefficient i exceeds the block's median (DC coefficient
    excluded from the median so flat brightness shifts don't flip
    half the bits). Survives resize/rescale and small noise; hamming
    distance between hashes ranks perceptual similarity. Returned as
    a SIGNED 64-bit int (two's complement) so it lands in a Spark
    bigint column unchanged.

    SCALED-INTEGER since round 12 (see PHASH_DCT_SCALE above): the
    median of the 63 AC coefficients is the exact 32nd order
    statistic of int64s, not a float np.median — engine-portable."""
    d = _dctn_matrix_int(32)
    q = np.rint(_area_resize(img, 32, 32)
                * PHASH_PIX_SCALE).astype(np.int64)
    coef = d @ q @ d.T
    block = coef[:8, :8].ravel()
    med = int(np.sort(block[1:])[31])
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << (63 - i)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash_images(media: DataFrame,
                 decoder: Callable = fake_decoder) -> DataFrame:
    """(media_id, phash) for every raster row — the image analogue of
    SimHash: the Python work is one Arrow-batched narrow pass, and
    everything downstream (banding, hamming verify) is codegen."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ])
    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)
    from .dedup import _spread
    media = _spread(media)  # single-file scans must not serialize the
    # CPU-bound decode+DCT pass on one core (same rule as the minhash
    # digest stage — SCALE.md "known local-mode artifacts")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind not in ("image", "video"):
                    continue
                img = decoder(bytes(row.payload), row.kind)
                if img.ndim != 2:
                    continue
                out.append({"media_id": row.media_id,
                            "phash": phash64(img)})
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.mapInPandas(run, schema=schema)


def phash_pairs(hashes: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Image near-dup candidates by pigeonhole banding on the 64-bit
    pHash: split into 8 byte-blocks and equi-join per block. The
    pigeonhole bound guarantees every pair with hamming ≤ 7 shares a
    block; the default radius 10 keeps high recall in practice
    because perceptually-close images concentrate their differing
    bits in few blocks. Then EXACT hamming via xor +
    bit_count on the candidates only. All JVM-side codegen; the plan
    never forms the cross product."""
    blocks = hashes.select(
        "media_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("blk"),
                     F.expr(f"shiftrightunsigned(phash, {8 * b}) & 255")
                     .alias("v"))
            for b in range(8)])).alias("bv")) \
        .select("media_id", "phash", "bv.blk", "bv.v")
    a = blocks.withColumnsRenamed({"media_id": "id_a", "phash": "ha"})
    b = blocks.withColumnsRenamed({"media_id": "id_b", "phash": "hb"})
    cand = (a.join(b, ["blk", "v"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb")
            .distinct())
    ham = F.bit_count(F.expr("ha ^ hb"))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------
# Audio analysis

AUDIO_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.FloatType()),
    T.StructField("zcr", T.FloatType()),
    T.StructField("centroid_hz", T.FloatType()),
    T.StructField("rolloff_hz", T.FloatType()),
])


def audio_feature_vector(x: np.ndarray, sample_rate: int) -> dict:
    """Classic clip-level audio descriptors from a mono float wave:
    RMS energy, zero-crossing rate, and the spectral centroid /
    85%-rolloff of the magnitude spectrum (numpy rFFT — no external
    DSP dependency)."""
    x = x.astype(np.float64).ravel()
    n = len(x)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
           if n > 1 else 0.0)
    mag = np.abs(np.fft.rfft(x)) if n else np.zeros(1)
    freqs = np.fft.rfftfreq(max(n, 1), d=1.0 / sample_rate)
    tot = mag.sum()
    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    if tot > 0:
        roll_idx = int(np.searchsorted(np.cumsum(mag), 0.85 * tot))
        rolloff = float(freqs[min(roll_idx, len(freqs) - 1)])
    else:
        rolloff = 0.0
    return {"n_samples": n, "rms": rms, "zcr": zcr,
            "centroid_hz": centroid, "rolloff_hz": rolloff}


def audio_features(media: DataFrame, sample_rate: int = 8000,
                   decoder: Callable = fake_decoder) -> DataFrame:
    """Per-clip audio descriptors over opaque payloads: decode to a
    float wave (PCM WAV via the stdlib codec; anything else via the
    pluggable ``decoder=``) and reduce to a fixed feature row. One
    narrow Arrow pass, no shuffle; non-audio rows are dropped."""
    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)
    from .dedup import _spread
    media = _spread(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "audio":
                    continue
                wave = decoder(bytes(row.payload), row.kind).ravel()
                feats = audio_feature_vector(wave, sample_rate)
                out.append({"media_id": row.media_id, **{
                    k: (np.float32(v) if k != "n_samples" else v)
                    for k, v in feats.items()}})
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES.fields])

    return media.mapInPandas(run, schema=AUDIO_FEATURES)
