"""Multimodal plumbing: schema, batch shape, determinism, and the
clearly-marked decoder stub."""

import pytest

from lcmap_blackmagic_spark.llm.multimodal import (FEATURES, attach_payloads,
                                                   extract_features,
                                                   frame_sample,
                                                   library_decoder)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return attach_payloads(docs.limit(60)).cache()


def test_media_schema(media):
    rows = media.collect()
    assert len(rows) == 60
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)


def test_extract_features_shape_and_determinism(media):
    feats = extract_features(media, n_features=16)
    assert feats.schema == FEATURES
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    assert all(len(r["feat"]) == 16 for r in rows.values())
    again = {r["media_id"]: r for r in extract_features(media, 16).collect()}
    assert all(rows[k]["feat"] == again[k]["feat"] for k in rows)


def test_frame_sample_only_video(media):
    frames = frame_sample(media)
    rows = frames.collect()
    vids = {r["media_id"] for r in rows}
    assert len(vids) > 0
    assert all(mid % 3 == 2 for mid in vids)  # attach_payloads kind map
    assert all(len(r["feat"]) == 16 for r in rows)


def test_resize_shape_and_determinism(media):
    from lcmap_blackmagic_spark.llm.multimodal import resize_images
    out = resize_images(media, out_h=4, out_w=6)
    rows = out.collect()
    assert rows, "expected raster rows"
    assert all(r["h"] == 4 and r["w"] == 6 and len(r["pixels"]) == 24
               for r in rows)
    assert {r["kind"] for r in rows} <= {"image", "video"}
    again = {r["media_id"]: r["pixels"]
             for r in resize_images(media, out_h=4, out_w=6).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["pixels"]


def test_library_decoder_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unsupported media payload"):
        library_decoder(b"bytes-that-are-not-a-known-format", "image")


# ---- real pure-stdlib codecs: golden payloads built bit-for-bit ----

def _ppm_payload():
    # 2×2 P6 with a comment line; pixels (r,g,b):
    # (30,60,90) (0,0,0) / (255,255,255) (90,120,150)
    body = bytes([30, 60, 90, 0, 0, 0, 255, 255, 255, 90, 120, 150])
    return b"P6\n# golden test\n2 2\n255\n" + body


def test_decode_ppm_golden():
    img = library_decoder(_ppm_payload(), "image")
    assert img.shape == (2, 2)
    assert img.tolist() == [[60.0, 0.0], [255.0, 120.0]]


def test_decode_pgm_golden():
    payload = b"P5 3 1 255\n" + bytes([10, 20, 30])
    img = library_decoder(payload, "image")
    assert img.shape == (1, 3)
    assert img.tolist() == [[10.0, 20.0, 30.0]]


def _bmp_payload():
    # 2×2 bottom-up 24-bit BMP, stride padded 6→8 bytes.
    # Stored rows (BGR): bottom row first.
    import struct
    top = bytes([90, 60, 30, 0, 0, 0])        # (30,60,90) (0,0,0) in BGR
    bottom = bytes([255, 255, 255, 150, 120, 90])
    raster = bottom + b"\x00\x00" + top + b"\x00\x00"
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                      len(raster), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return header + dib + raster


def test_decode_bmp_golden():
    img = library_decoder(_bmp_payload(), "image")
    assert img.shape == (2, 2)
    # top row is the LAST stored row (bottom-up), grayscale = BGR mean
    assert img.tolist() == [[60.0, 0.0], [255.0, 120.0]]


def _wav_payload():
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        # frames: (L,R) = (16384, -16384), (32767, 32767)
        wf.writeframes(struct.pack("<4h", 16384, -16384, 32767, 32767))
    return buf.getvalue()


def test_decode_wav_golden():
    wave_arr = library_decoder(_wav_payload(), "audio")
    assert wave_arr.shape == (2,)
    assert wave_arr[0] == 0.0                       # L/R cancel
    assert abs(wave_arr[1] - 32767.0 / 32768.0) < 1e-6


def test_extract_features_through_real_codec(spark):
    """The Spark mapInPandas path end-to-end over real encoded
    payloads — same plumbing as the fake-decoder tests, real bytes."""
    import pandas as pd

    from lcmap_blackmagic_spark.llm.multimodal import MEDIA

    rows = [
        {"media_id": 1, "kind": "image", "payload": _ppm_payload(),
         "mime": "image/x-portable-pixmap", "width": 2, "height": 2,
         "duration_ms": None},
        {"media_id": 2, "kind": "image", "payload": _bmp_payload(),
         "mime": "image/bmp", "width": 2, "height": 2,
         "duration_ms": None},
        {"media_id": 3, "kind": "audio", "payload": _wav_payload(),
         "mime": "audio/wav", "width": None, "height": None,
         "duration_ms": 1},
    ]
    import numpy as np
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (16, 16)).astype(np.float64)
    rows.append({"media_id": 4, "kind": "image",
                 "payload": _jpeg_progressive_payload(img,
                                                      succ_approx=True),
                 "mime": "image/jpeg", "width": 16, "height": 16,
                 "duration_ms": None})
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA)
    feats = extract_features(media, n_features=2, decoder=library_decoder)
    got = {r["media_id"]: r["feat"] for r in feats.collect()}
    assert got[1] == [30.0, 187.5]   # mean of (60,0) / (255,120)
    assert got[2] == [30.0, 187.5]   # BMP decodes to the same raster
    assert len(got[3]) == 2
    # progressive JPEG decodes on the executors too: the pooled
    # features equal the locally-decoded raster's pooled means
    want = library_decoder(rows[3]["payload"], "image").ravel()
    want = want.reshape(2, -1).mean(axis=1)
    assert np.allclose(got[4], want, atol=1e-4)


# ---- PNG: stdlib zlib + per-scanline unfiltering ------------------

def _png_payload(img, ctype, filters, plte=None):
    """Minimal PNG encoder (test-side only): applies the given filter
    type per scanline (RFC 2083 forward direction) so the decoder's
    unfiltering is exercised on every filter code."""
    import struct
    import zlib

    import numpy as np

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    h, w = img.shape[:2]
    n_ch = 1 if img.ndim == 2 else img.shape[2]
    bpp = n_ch
    flat = img.reshape(h, w * n_ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * n_ch, dtype=np.int32)
    for y, ft in enumerate(filters):
        row = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = (row - left) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            enc = (row - ((left + prev) >> 1)) % 256
        else:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = (row - pred) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    chunks = [chunk(b"IHDR", ihdr)]
    if plte is not None:
        chunks.append(chunk(b"PLTE", bytes(plte.ravel())))
    chunks.append(chunk(b"IDAT", zlib.compress(bytes(raw))))
    chunks.append(chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


def test_decode_png_rgb_all_filters_bit_exact():
    import numpy as np
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    payload = _png_payload(img, ctype=2, filters=[0, 1, 2, 3, 4])
    got = library_decoder(payload, "image")
    want = img.astype(np.float32).mean(axis=2)
    assert got.shape == (5, 4)
    assert (got == want).all()


def test_decode_png_gray_and_rgba_and_palette():
    import numpy as np
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    got = library_decoder(_png_payload(gray, 0, [4, 3, 2, 1]), "image")
    assert (got == gray.astype(np.float32)).all()

    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    got = library_decoder(_png_payload(rgba, 6, [1, 4, 2]), "image")
    want = rgba[:, :, :3].astype(np.float32).mean(axis=2)
    assert (got == want).all()          # alpha ignored

    plte = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(2, 5), dtype=np.uint8)
    got = library_decoder(_png_payload(idx, 3, [0, 1], plte=plte), "image")
    want = plte[idx].astype(np.float32).mean(axis=2)
    assert (got == want).all()


def test_decode_png_rejects_16bit():
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="only 8-bit"):
        library_decoder(payload, "image")


# ---- JPEG: baseline encoder (test-side) + decoder golden tests ----

def _jpeg_tables():
    """Simple VALID canonical Huffman specs: 12 DC categories all at
    code length 4, 162 AC run/size symbols all at code length 8 —
    poor compression, trivially correct, and the decoder exercises
    exactly the same canonical-code machinery real Annex-K tables
    use."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    return (dc_bits, dc_vals), (ac_bits, bytes(ac_syms))


def _canonical_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)                   # pad with 1-bits
        return bytes(self.out)


def _encode_block(w, block, qtab, pred, dc_codes, ac_codes):
    import numpy as np
    from lcmap_blackmagic_spark.llm.multimodal import _ZIGZAG, _dct_matrix
    m = _dct_matrix()
    coef = m @ (block.astype(np.float64) - 128.0) @ m.T
    q = np.rint(coef.reshape(64) / qtab).astype(int)[_ZIGZAG]
    diff = int(q[0]) - pred
    s = abs(diff).bit_length()
    ln, code = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        if q[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]          # ZRL
            w.write(code, ln)
            run -= 16
        v = int(q[k])
        s = abs(v).bit_length()
        ln, code = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]              # EOB
        w.write(code, ln)
    return int(q[0])


def _jpeg_payload(img, subsample=False, qval=8, restart=0):
    """Minimal baseline JFIF encoder (test-side only): grayscale 2-D
    or RGB (h, w, 3) input; flat quant tables; optional 4:2:0 chroma
    subsampling and restart markers."""
    import struct

    import numpy as np
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtab = np.full(64, qval, np.float64)
    (dcb, dcv), (acb, acv) = _jpeg_tables()
    dc_codes = _canonical_codes(dcb, dcv)
    ac_codes = _canonical_codes(acb, acv)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsample:
            def down(p):
                ph = p[:(h // 2) * 2, :(w // 2) * 2]
                return ph.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((th, tw))
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1:ph, :]
        pp[:, pw:] = pp[:, pw - 1:pw]
        padded.append(pp)
    bw = _BitWriter()
    pred = [0] * len(planes)
    out_chunks = []
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            out_chunks.append(bw.flush())
            out_chunks.append(
                bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)]))
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    pred[ci] = _encode_block(
                        bw, p[y0:y0 + 8, x0:x0 + 8], qtab, pred[ci],
                        dc_codes, ac_codes)
    out_chunks.append(bw.flush())
    scan = b"".join(out_chunks)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    nq = 1
    dqt = seg(0xDB, bytes([0]) + bytes(int(v) for v in qtab))
    ncomp = 1 if gray else 3
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    sos_body = bytes([ncomp])
    for c in range(ncomp):
        sof_body += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], 0])
        sos_body += bytes([c + 1, 0x00])       # dc table 0, ac table 0
    sos_body += bytes([0, 63, 0])
    dht = seg(0xC4, bytes([0x00]) + bytes(dcb) + dcv) + \
        seg(0xC4, bytes([0x10]) + bytes(acb) + acv)
    parts = [b"\xff\xd8", dqt, seg(0xC0, sof_body), dht]
    if restart:
        parts.append(seg(0xDD, struct.pack(">H", restart)))
    parts += [seg(0xDA, sos_body), scan, b"\xff\xd9"]
    assert nq == 1
    return b"".join(parts)


def test_decode_jpeg_gray_roundtrip():
    import numpy as np
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40)).astype(np.float64)
    got = library_decoder(_jpeg_payload(img), "image")
    assert got.shape == (24, 40)
    # flat-8 quant: error bounded by quantization + DCT rounding
    assert np.abs(got - img).mean() < 8.0
    # a UNIFORM image is DC-only and survives exactly
    flat = np.full((16, 16), 200.0)
    assert np.array_equal(library_decoder(_jpeg_payload(flat), "image"),
                          flat.astype(np.float32))


def test_decode_jpeg_color_and_subsampled():
    import numpy as np
    rng = np.random.RandomState(11)
    rgb = rng.randint(40, 216, (24, 24, 3)).astype(np.float64)
    got = library_decoder(_jpeg_payload(rgb), "image")
    assert got.shape == (24, 24)
    want = rgb.mean(axis=2)
    assert np.abs(got - want).mean() < 10.0
    got420 = library_decoder(_jpeg_payload(rgb, subsample=True), "image")
    assert got420.shape == (24, 24)
    assert np.abs(got420 - want).mean() < 14.0


def test_decode_jpeg_restart_markers():
    import numpy as np
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (16, 48)).astype(np.float64)
    plain = library_decoder(_jpeg_payload(img), "image")
    with_rst = library_decoder(_jpeg_payload(img, restart=2), "image")
    # restart markers change the byte stream, not the decoded pixels
    assert np.array_equal(plain, with_rst)


def test_decode_jpeg_rejects_lossless():
    import numpy as np
    payload = bytearray(_jpeg_payload(np.full((8, 8), 99.0)))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC3                    # pretend lossless
    with pytest.raises(ValueError, match="SOF0"):
        library_decoder(bytes(payload), "image")


# ---- progressive JPEG: encoder (test-side) + golden tests ---------

def _quantized_blocks(img, subsample, qval):
    """Per-component zigzag-quantized coefficient blocks + geometry —
    the shared front half of the baseline and progressive encoders."""
    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import _ZIGZAG, _dct_matrix
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtab = np.full(64, qval, np.float64)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2]
        if subsample:
            def down(p):
                ph = p[:(h // 2) * 2, :(w // 2) * 2]
                return ph.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * (1 if gray else 3)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    m = _dct_matrix()
    blocks = []                                # per comp: (bh, bw, 64)
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((th, tw))
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[ph - 1:ph, :]
        pp[:, pw:] = pp[:, pw - 1:pw]
        q = np.empty((th // 8, tw // 8, 64), int)
        for by in range(th // 8):
            for bx in range(tw // 8):
                coef = m @ (pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                            - 128.0) @ m.T
                q[by, bx] = np.rint(
                    coef.reshape(64) / qtab).astype(int)[_ZIGZAG]
        blocks.append(q)
    return blocks, samp, (h, w, hmax, vmax, mcux, mcuy), qtab


def _pjpeg_write_val(w, codes, run, v):
    s = abs(v).bit_length()
    ln, code = codes[(run << 4) | s]
    w.write(code, ln)
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


def _pjpeg_ac_first(w, ac_codes, blk, ss, se, al):
    """One block of a first-pass AC scan: point transform toward
    zero, run/size with ZRL, EOB (=EOB run of 1) on trailing zeros."""
    hv = [int(blk[k]) // 2 ** al if blk[k] >= 0
          else -((-int(blk[k])) // 2 ** al) for k in range(64)]
    last = 0
    for k in range(ss, se + 1):
        if hv[k]:
            last = k
    if not any(hv[k] for k in range(ss, se + 1)):
        ln, code = ac_codes[0x00]
        w.write(code, ln)
        return
    run = 0
    for k in range(ss, last + 1):
        if hv[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        _pjpeg_write_val(w, ac_codes, run, hv[k])
        run = 0
    if last < se:
        ln, code = ac_codes[0x00]
        w.write(code, ln)


def _pjpeg_ac_refine(w, ac_codes, blk, ss, se):
    """One block of the Ah=1→Al=0 AC refinement scan — the exact
    mirror of the decoder's correction-bit walk (T.81 G.1.2.3)."""
    def hi(k):
        v = int(blk[k])
        return v // 2 if v >= 0 else -((-v) // 2)

    k = ss
    while k <= se:
        j = next((p for p in range(k, se + 1)
                  if hi(p) == 0 and blk[p] != 0), None)
        if j is None:
            ln, code = ac_codes[0x00]          # EOB(run=1)
            w.write(code, ln)
            for p in range(k, se + 1):
                if hi(p) != 0:
                    w.write(abs(int(blk[p])) & 1, 1)
            return
        r = sum(1 for p in range(k, j) if hi(p) == 0)
        if r > 15:
            ln, code = ac_codes[0xF0]          # ZRL: 16 zero-history
            w.write(code, ln)
            zeros = 0
            while zeros < 16:
                if hi(k) != 0:
                    w.write(abs(int(blk[k])) & 1, 1)
                else:
                    zeros += 1
                k += 1
            continue
        ln, code = ac_codes[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if blk[j] > 0 else 0, 1)     # sign of the new ±1
        for p in range(k, j):
            if hi(p) != 0:
                w.write(abs(int(blk[p])) & 1, 1)
        k = j + 1


def _jpeg_progressive_payload(img, subsample=False, qval=8,
                              succ_approx=False):
    """Minimal progressive JFIF encoder (test-side only): SOF2 with
    either pure spectral selection (DC scan + two AC band scans per
    component) or DC+AC successive approximation (Al=1 first passes
    followed by refinement scans)."""
    import struct

    blocks, samp, (h, w, hmax, vmax, mcux, mcuy), qtab = \
        _quantized_blocks(img, subsample, qval)
    (dcb, dcv), (acb, acv) = _jpeg_tables()
    dc_codes = _canonical_codes(dcb, dcv)
    ac_codes = _canonical_codes(acb, acv)
    ncomp = len(blocks)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    def sos(scan_comps, ss, se, ah, al, body_bits):
        head = bytes([len(scan_comps)])
        for cid in scan_comps:
            head += bytes([cid + 1, 0x00])
        head += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, head) + body_bits

    def nb(ci):
        cw = -(-(w * samp[ci][0]) // hmax)
        ch = -(-(h * samp[ci][1]) // vmax)
        return -(-cw // 8), -(-ch // 8)

    dc_al = 1 if succ_approx else 0
    scans = []
    # DC first pass: all components, interleaved MCU order
    bw_ = _BitWriter()
    pred = [0] * ncomp
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            for by in range(samp[ci][1]):
                for bx in range(samp[ci][0]):
                    q0 = int(blocks[ci][my * samp[ci][1] + by,
                                        mx * samp[ci][0] + bx, 0])
                    hi = q0 >> dc_al            # DC: arithmetic shift
                    diff = hi - pred[ci]
                    pred[ci] = hi
                    s = abs(diff).bit_length()
                    ln, code = dc_codes[s]
                    bw_.write(code, ln)
                    if s:
                        bw_.write(diff if diff >= 0
                                  else diff + (1 << s) - 1, s)
    scans.append(sos(list(range(ncomp)), 0, 0, 0, dc_al, bw_.flush()))
    if succ_approx:                             # DC refinement bits
        bw_ = _BitWriter()
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for ci in range(ncomp):
                for by in range(samp[ci][1]):
                    for bx in range(samp[ci][0]):
                        q0 = int(blocks[ci][my * samp[ci][1] + by,
                                            mx * samp[ci][0] + bx, 0])
                        bw_.write(q0 & 1, 1)
        scans.append(sos(list(range(ncomp)), 0, 0, 1, 0, bw_.flush()))
    # AC scans: per component over its OWN block raster
    for ci in range(ncomp):
        nbx, nby = nb(ci)
        if succ_approx:
            bands = [(1, 63)]
        else:
            bands = [(1, 5), (6, 63)]
        for ss, se in bands:
            bw_ = _BitWriter()
            for u in range(nby * nbx):
                by, bx = divmod(u, nbx)
                _pjpeg_ac_first(bw_, ac_codes, blocks[ci][by, bx],
                                ss, se, 1 if succ_approx else 0)
            scans.append(sos([ci], ss, se, 0,
                             1 if succ_approx else 0, bw_.flush()))
        if succ_approx:
            bw_ = _BitWriter()
            for u in range(nby * nbx):
                by, bx = divmod(u, nbx)
                _pjpeg_ac_refine(bw_, ac_codes, blocks[ci][by, bx],
                                 1, 63)
            scans.append(sos([ci], 1, 63, 1, 0, bw_.flush()))

    dqt = seg(0xDB, bytes([0]) + bytes(int(v) for v in qtab))
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof_body += bytes([ci + 1,
                           (samp[ci][0] << 4) | samp[ci][1], 0])
    dht = seg(0xC4, bytes([0x00]) + bytes(dcb) + dcv) + \
        seg(0xC4, bytes([0x10]) + bytes(acb) + acv)
    return b"".join([b"\xff\xd8", dqt, seg(0xC2, sof_body), dht]
                    + scans + [b"\xff\xd9"])


def test_decode_jpeg_progressive_spectral_matches_baseline():
    """A progressive (spectral-selection) rendition carries the SAME
    quantized coefficients as the baseline rendition — the decoded
    pixels must be bit-identical."""
    import numpy as np
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (24, 40)).astype(np.float64)
    base = library_decoder(_jpeg_payload(img), "image")
    prog = library_decoder(_jpeg_progressive_payload(img), "image")
    assert np.array_equal(base, prog)


def test_decode_jpeg_progressive_succ_approx_matches_baseline():
    """DC+AC successive approximation (Al=1 first passes + correction
    -bit refinement scans) reconstructs the full-precision
    coefficients exactly."""
    import numpy as np
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (24, 40)).astype(np.float64)
    base = library_decoder(_jpeg_payload(img), "image")
    prog = library_decoder(
        _jpeg_progressive_payload(img, succ_approx=True), "image")
    assert np.array_equal(base, prog)


def test_decode_jpeg_progressive_color_and_subsampled():
    """Color 4:4:4 and 4:2:0 progressive renditions: interleaved DC
    MCU order + per-component AC rasters with differing block
    grids — still bit-identical to baseline."""
    import numpy as np
    rng = np.random.RandomState(29)
    rgb = rng.randint(40, 216, (24, 24, 3)).astype(np.float64)
    for sub in (False, True):
        base = library_decoder(_jpeg_payload(rgb, subsample=sub),
                               "image")
        for sa in (False, True):
            prog = library_decoder(
                _jpeg_progressive_payload(rgb, subsample=sub,
                                          succ_approx=sa), "image")
            assert np.array_equal(base, prog), (sub, sa)


# ---- MP4 metadata probe (ISO-BMFF box walk) -----------------------

def _box(tag, body):
    import struct
    return struct.pack(">I4s", len(body) + 8, tag) + body


def _mp4_payload(timescale=1000, deltas=((3, 400), (2, 600)),
                 media_ts=1000):
    """Minimal valid ISO-BMFF: ftyp + moov{mvhd, trak{mdia{mdhd,
    minf{stbl{stts}}}}}. 5 samples: 3x400ms + 2x600ms = 2400ms."""
    import struct
    total = sum(c * d for c, d in deltas)
    mvhd = _box(b"mvhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, total)
                + b"\x00" * 80)
    mdhd = _box(b"mdhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", media_ts, total) + b"\x00" * 4)
    stts = _box(b"stts", struct.pack(">B3xI", 0, len(deltas))
                + b"".join(struct.pack(">II", c, d) for c, d in deltas))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_probe_mp4_reads_real_timing():
    from lcmap_blackmagic_spark.llm.multimodal import probe_mp4
    meta = probe_mp4(_mp4_payload())
    assert meta["duration_ms"] == 2400
    assert meta["n_samples"] == 5
    # 3x400 + 2x600: sample starts at 0,400,800,1200,1800
    assert meta["sample_times_ms"] == [0, 400, 800, 1200, 1800]


def test_probe_mp4_rejects_non_mp4():
    from lcmap_blackmagic_spark.llm.multimodal import probe_mp4
    with pytest.raises(ValueError, match="ISO-BMFF"):
        probe_mp4(b"\x00" * 32)


def test_frame_sample_uses_mp4_timing(spark):
    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    payload = _mp4_payload()
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = frame_sample(media, every_ms=1000).collect()
    # ticks 0,1000,2000 ms snap to samples 0 (0ms), 2 (800ms) or
    # 3 (1200ms), 4 (1800ms): nearest-sample set {0, 2, 4} (tie at
    # 1000 goes to the lower index via min-first scan)
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]


# ---- real MJPEG-in-MP4 frame decode --------------------------------

def _mjpeg_mp4(frames, frame_ms=500, timescale=1000, codec=b"jpeg"):
    """Real Motion-JPEG-in-MP4: ftyp + mdat holding actual JPEG
    samples + moov with the full addressing triple (stsd/stts/stsc/
    stsz/stco) — the QuickTime MJPEG layout."""
    import struct
    jpegs = [_jpeg_payload(f) for f in frames]
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(jpegs))
    base = len(ftyp) + 8                 # absolute offset of sample 0
    n = len(jpegs)
    total = n * frame_ms
    mvhd = _box(b"mvhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, total) + b"\x00" * 80)
    mdhd = _box(b"mdhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, total) + b"\x00" * 4)
    stts = _box(b"stts", struct.pack(">B3xI", 0, 1)
                + struct.pack(">II", n, frame_ms))
    entry = struct.pack(">I4s", 16, codec) + b"\x00" * 8
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, n)
                + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 1)
                + struct.pack(">III", 1, n, 1))
    stco = _box(b"stco", struct.pack(">B3xI", 0, 1)
                + struct.pack(">I", base))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_decode_mp4_frame_real_mjpeg_pixels():
    """Uniform JPEG frames survive DC-only coding EXACTLY, so the
    decoded MP4 frames must be bit-equal to the encoded rasters."""
    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import (decode_mp4_frame,
                                                       probe_mp4)
    f0 = np.full((16, 16), 64.0)
    f1 = np.full((16, 16), 192.0)
    payload = _mjpeg_mp4([f0, f1])
    meta = probe_mp4(payload)
    assert meta["codec"] == "jpeg"
    assert len(meta["samples"]) == 2
    assert np.array_equal(decode_mp4_frame(payload, meta, 0),
                          f0.astype(np.float32))
    assert np.array_equal(decode_mp4_frame(payload, meta, 1),
                          f1.astype(np.float32))


def test_decode_mp4_frame_foreign_codec_gates():
    import numpy as np
    import pytest as _pytest

    from lcmap_blackmagic_spark.llm.multimodal import (decode_mp4_frame,
                                                       probe_mp4)
    payload = _mjpeg_mp4([np.full((16, 16), 10.0)], codec=b"avc1")
    meta = probe_mp4(payload)
    with _pytest.raises(ValueError, match="decoder= seam"):
        decode_mp4_frame(payload, meta, 0)


def test_frame_sample_decodes_real_mjpeg_frames(spark):
    """frame_sample over a real MJPEG MP4 returns features computed
    from the DECODED frames (column means of the true pixels), not
    the digest fake."""
    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    f0 = np.full((16, 16), 64.0)
    f1 = np.full((16, 16), 192.0)
    payload = _mjpeg_mp4([f0, f1], frame_ms=500)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = {r["frame_idx"]: r["feat"]
            for r in frame_sample(media, every_ms=500).collect()}
    assert set(rows) == {0, 1}
    assert rows[0] == [64.0] * 16
    assert rows[1] == [192.0] * 16


# ---- uncompressed ('raw '/'v308') MP4 frame decode ------------------

def _raw_mp4(samples, codec=b"raw ", width=4, height=4, depth=24,
             frame_ms=500, timescale=1000):
    """Uncompressed-video MP4: like _mjpeg_mp4 but with a FULL 86-byte
    VisualSampleEntry (ISO 14496-12 §12.1.3) carrying width/height/
    depth — the geometry the raw decoder reshapes by."""
    import struct
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"".join(samples))
    base = len(ftyp) + 8
    n = len(samples)
    total = n * frame_ms
    mvhd = _box(b"mvhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, total) + b"\x00" * 80)
    mdhd = _box(b"mdhd", struct.pack(">B3xII", 0, 0, 0)
                + struct.pack(">II", timescale, total) + b"\x00" * 4)
    stts = _box(b"stts", struct.pack(">B3xI", 0, 1)
                + struct.pack(">II", n, frame_ms))
    entry = (struct.pack(">I4s", 86, codec)      # entry header
             + b"\x00" * 6 + struct.pack(">H", 1)        # dref
             + b"\x00" * 16                              # pre_defined
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + b"\x00" * 4 + struct.pack(">H", 1)        # frame_count
             + b"\x00" * 32                              # compressor
             + struct.pack(">Hh", depth, -1))
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, n)
                + b"".join(struct.pack(">I", len(s)) for s in samples))
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 1)
                + struct.pack(">III", 1, n, 1))
    stco = _box(b"stco", struct.pack(">B3xI", 0, 1)
                + struct.pack(">I", base))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    moov = _box(b"moov", mvhd + _box(b"trak", _box(
        b"mdia", mdhd + _box(b"minf", stbl))))
    return ftyp + mdat + moov


def test_decode_mp4_frame_raw_rgb_pixels():
    """'raw ' depth-24 samples decode bit-exactly: packed RGB bytes
    reshape by the sample-entry geometry and collapse by channel
    mean (exact here: (10,20,30) → 20.0)."""
    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import (decode_mp4_frame,
                                                       probe_mp4)
    f0 = bytes([10, 20, 30] * 16)              # 4x4 RGB
    f1 = bytes([90, 120, 60] * 16)
    payload = _raw_mp4([f0, f1])
    meta = probe_mp4(payload)
    assert meta["codec"] == "raw "
    assert (meta["width"], meta["height"], meta["depth"]) == (4, 4, 24)
    assert np.array_equal(decode_mp4_frame(payload, meta, 0),
                          np.full((4, 4), 20.0, dtype=np.float32))
    assert np.array_equal(decode_mp4_frame(payload, meta, 1),
                          np.full((4, 4), 90.0, dtype=np.float32))


def test_decode_mp4_frame_v308_luma():
    """'v308' (Cr Y' Cb byte order, TN2162): the luma plane is the
    grayscale output — byte 1 of each packed pixel."""
    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import (decode_mp4_frame,
                                                       probe_mp4)
    pix = bytes([7, 99, 13] * 16)              # Cr=7, Y'=99, Cb=13
    payload = _raw_mp4([pix], codec=b"v308")
    meta = probe_mp4(payload)
    assert np.array_equal(decode_mp4_frame(payload, meta, 0),
                          np.full((4, 4), 99.0, dtype=np.float32))


def test_frame_sample_decodes_raw_frames(spark):
    """frame_sample over a 'raw ' MP4 features the DECODED pixels,
    not the digest fake — the second real codec path beside MJPEG."""
    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    f0 = bytes([10, 20, 30] * 16)
    f1 = bytes([90, 120, 60] * 16)
    payload = _raw_mp4([f0, f1], frame_ms=500)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = {r["frame_idx"]: r["feat"]
            for r in frame_sample(media, every_ms=500).collect()}
    assert rows[0] == [20.0] * 4
    assert rows[1] == [90.0] * 4


def test_frame_sample_raw_size_mismatch_falls_back(spark):
    """A raw sample whose byte count disagrees with the sample-entry
    geometry raises the documented ValueError inside decode, and
    frame_sample falls back to the fake path instead of crashing the
    Arrow task."""
    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    short = bytes([10, 20, 30] * 15)           # 45 bytes ≠ 4*4*3
    payload = _raw_mp4([short])
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = frame_sample(media, every_ms=500).collect()
    assert rows and all(len(r["feat"]) == 16 for r in rows)  # fake 16x16


def test_frame_sample_stts_overrun_falls_back_to_fake(spark):
    """A container whose stts entry count EXCEEDS the stsz sample
    count (malformed metadata) must take the fake-decoder path like
    other malformed cases — never IndexError inside the Arrow task
    (ADVICE r11): frame indices come from stts timing, but the
    decoder indexes the stsz/stco samples list."""
    import struct

    import numpy as np

    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    f0 = np.full((16, 16), 64.0)
    payload = _mjpeg_mp4([f0], frame_ms=500)
    # stts for n=1 is one (count=1, delta=500) entry; forge count=3
    # so timing claims 3 samples while stsz/stco carry only 1
    one = struct.pack(">II", 1, 500)
    assert payload.count(one) == 1
    payload = payload.replace(one, struct.pack(">II", 3, 500))
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = {r["frame_idx"]: r["feat"]
            for r in frame_sample(media, every_ms=500).collect()}
    # stts timing yields sample times 0/500/1000 while only ONE real
    # sample exists: index 1 is already out of stsz range
    assert set(rows) == {0, 1}
    # fake path, not the real decode: frame 0's feature is NOT the
    # true raster's column means
    assert rows[0] != [64.0] * 16


def test_frame_sample_metadata_only_mp4_keeps_fake_path(spark):
    """An MP4 without a sample table (the metadata fixture) still
    samples by timing and features via the pluggable fake decoder —
    unchanged contract."""
    from lcmap_blackmagic_spark.llm.multimodal import frame_sample
    payload = _mp4_payload()
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None, None, None, None)],
        "media_id LONG, kind STRING, payload BINARY, mime STRING, "
        "width INT, height INT, duration_ms INT")
    rows = frame_sample(media, every_ms=1000).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(len(r["feat"]) == 16 for r in rows)
