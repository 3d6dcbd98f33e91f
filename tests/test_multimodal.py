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
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA)
    feats = extract_features(media, n_features=2, decoder=library_decoder)
    got = {r["media_id"]: r["feat"] for r in feats.collect()}
    assert got[1] == [30.0, 187.5]   # mean of (60,0) / (255,120)
    assert got[2] == [30.0, 187.5]   # BMP decodes to the same raster
    assert len(got[3]) == 2


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
