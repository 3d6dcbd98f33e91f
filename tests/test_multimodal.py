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


def test_library_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        library_decoder(b"bytes", "image")
