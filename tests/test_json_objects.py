"""Byte-parity object sink: one gzip JSON object per chip under
{entity}/{x}-{y}.json, matching the reference's Ceph layout
(ceph.py:338-351) — gzip body, .json key, a list of record dicts per
chip, deterministic bytes."""

import gzip
import json
import os

import pytest

from lcmap_blackmagic_spark import storage


@pytest.fixture(scope="module")
def segs(spark):
    rows = [(-2061585 + 3000 * (i % 2), 1922805, 100 + i, 200,
             "1999-01-01", "2000-01-01", [0.5, float(i)])
            for i in range(6)]
    return spark.createDataFrame(
        rows, "cx long, cy long, px long, py long, sday string, "
              "eday string, blcoef array<double>")


def test_layout_and_roundtrip(segs, tmp_path):
    n = storage.write_chip_json_objects(segs, str(tmp_path), "segment")
    assert n == 2  # two chips -> two objects
    names = sorted(os.listdir(tmp_path / "segment"))
    assert names == ["-2058585-1922805.json", "-2061585-1922805.json"]

    got = storage.read_chip_json(str(tmp_path), "segment", -2061585, 1922805)
    assert len(got) == 3
    assert {r["px"] for r in got} == {100, 102, 104}
    assert got[0]["blcoef"] == [0.5, 0.0]
    assert all(set(r) == {"cx", "cy", "px", "py", "sday", "eday", "blcoef"}
               for r in got)


def test_bytes_are_gzip_json_and_deterministic(segs, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    storage.write_chip_json_objects(segs, str(a), "segment")
    storage.write_chip_json_objects(segs.repartition(7), str(b), "segment")
    for name in os.listdir(a / "segment"):
        raw_a = (a / "segment" / name).read_bytes()
        raw_b = (b / "segment" / name).read_bytes()
        # the reference stores gzip bodies under the .json key
        payload = json.loads(gzip.decompress(raw_a))
        assert isinstance(payload, list)
        assert gzip.decompress(raw_a) == gzip.decompress(raw_b)


# ---- DataSource-writer twin (Spark 4 sink API) --------------------

def test_datasource_writer_byte_parity(segs, tmp_path):
    """The chipobjects DataSource writer must produce BYTE-identical
    objects to the applyInPandas sink, plus a commit manifest
    listing every object — the engine-integrated form of the same
    Ceph layout."""
    from lcmap_blackmagic_spark.sources.objectsink import write_objects

    a, b = tmp_path / "pandas", tmp_path / "dsv2"
    storage.write_chip_json_objects(segs, str(a), "segment")
    write_objects(segs, str(b), "segment")
    names_a = sorted(f for f in os.listdir(a / "segment"))
    names_b = sorted(f for f in os.listdir(b / "segment")
                     if not f.startswith("_"))
    assert names_a == names_b
    for name in names_a:
        assert gzip.decompress((a / "segment" / name).read_bytes()) \
            == gzip.decompress((b / "segment" / name).read_bytes())
    man = json.loads((b / "segment" / "_manifest.json").read_text())
    assert man["n_objects"] == 2
    assert {tuple(k[:2]) for k in man["objects"]} == \
        {(-2061585, 1922805), (-2058585, 1922805)}


def test_datasource_writer_overwrite_and_abort_safety(segs, tmp_path):
    """Overwrite mode removes committed objects absent from the job
    (directory equals the manifest); abort of a new job deletes only
    its OWN staged temps — a previously committed object survives a
    failed successor job untouched."""
    from pyspark.sql import functions as FF

    from lcmap_blackmagic_spark.sources.objectsink import (
        ObjectsCommit, _ObjectsWriter, write_objects)

    root = str(tmp_path / "store")
    write_objects(segs, root, "segment")
    base = tmp_path / "store" / "segment"
    assert len([f for f in os.listdir(base)
                if f.endswith(".json") and not f.startswith("_")]) == 2
    # overwrite with only one chip's rows: the other object goes
    one = segs.filter(FF.col("cx") == -2061585)
    write_objects(one, root, "segment", mode="overwrite")
    names = [f for f in os.listdir(base)
             if f.endswith(".json") and not f.startswith("_")]
    assert names == ["-2061585-1922805.json"]
    man = json.loads((base / "_manifest.json").read_text())
    assert man["n_objects"] == 1

    # abort safety: a failed successor job must not touch the
    # committed object — only its own temp
    before = (base / "-2061585-1922805.json").read_bytes()
    w = _ObjectsWriter({"root": root, "entity": "segment"},
                       overwrite=False)
    staged = w._tmp(-2061585, 1922805)
    with open(staged, "wb") as f:
        f.write(b"partial")
    w.abort([ObjectsCommit(keys=[(-2061585, 1922805, 3)])])
    assert not os.path.exists(staged)
    assert (base / "-2061585-1922805.json").read_bytes() == before
