"""Change-data-feed between snapshot versions
(storage.snapshot_changes): append fast path scans only delta dirs,
the general path is an exact multiset diff, and the two paths agree
on the relations both can express."""

import json
import os
import tempfile

import pytest

from lcmap_blackmagic_spark import storage


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _got(df):
    return sorted((r["k"], r["v"], r["_change_type"], r["_n"])
                  for r in df.collect())


def test_append_fast_path_scans_only_delta(spark):
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b")]), t)
    storage.write_snapshot(_batch(spark, [(3, "c"), (3, "c")]), t,
                           mode="append")
    storage.write_snapshot(_batch(spark, [(4, "d")]), t, mode="append")
    ch = storage.snapshot_changes(spark, t, 1, 3)
    # only the two appended commit dirs are in the scan
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v1.json")) as fh:
        base = set(json.load(fh)["dirs"])
    scanned = {f.split("/data/")[1].split("/")[0]
               for f in ch.inputFiles()}
    assert scanned.isdisjoint(base) and len(scanned) == 2
    assert _got(ch) == [(3, "c", "insert", 2), (4, "d", "insert", 1)]
    # the degenerate empty range: no rows, schema intact
    empty = storage.snapshot_changes(spark, t, 2, 2)
    assert empty.collect() == []
    assert empty.columns == ["k", "v", "_change_type", "_n"]


def test_general_path_after_merge_shows_update_as_pair(spark):
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    storage.merge_into_snapshot(
        spark, t,
        spark.createDataFrame([(2, "B", "U"), (3, None, "D"), (4, "d", "I")],
                              "k long, v string, op string"), "k")
    ch = storage.snapshot_changes(spark, t, 1, 2)
    assert _got(ch) == [(2, "B", "insert", 1), (2, "b", "delete", 1),
                        (3, "c", "delete", 1), (4, "d", "insert", 1)]


def test_paths_agree_on_append_ranges(spark):
    """Force the general path over a pure-append range (delete an
    intermediate manifest so the chain is unverifiable) and pin that
    it returns exactly the fast path's relation."""
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    storage.write_snapshot(_batch(spark, [(2, "b")]), t, mode="append")
    storage.write_snapshot(_batch(spark, [(2, "b"), (3, "c")]), t,
                           mode="append")
    fast = _got(storage.snapshot_changes(spark, t, 1, 3))
    os.remove(os.path.join(t, storage.SNAP_MANIFESTS, "v2.json"))
    general = _got(storage.snapshot_changes(spark, t, 1, 3))
    assert fast == general == [(2, "b", "insert", 2),
                               (3, "c", "insert", 1)]


def test_overwrite_range_is_full_diff(spark):
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b")]), t)
    storage.write_snapshot(_batch(spark, [(2, "b"), (9, "z")]), t)
    ch = storage.snapshot_changes(spark, t, 1, 2)
    assert _got(ch) == [(1, "a", "delete", 1), (9, "z", "insert", 1)]


def test_bad_range_rejected(spark):
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    with pytest.raises(ValueError):
        storage.snapshot_changes(spark, t, 2, 1)
    with pytest.raises(ValueError):
        storage.snapshot_changes(spark, t, 0, 1)


def test_cdf_across_schema_evolution(spark):
    """An appended commit adds a column: the fast path carries the
    evolved schema; the general path (forced via an overwrite) diffs
    the missing column as NULL on the old side — the additive-
    evolution contract read_snapshot(merge_schema=True) gives."""
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    storage.write_snapshot(
        spark.createDataFrame([(2, "b", 5)], "k long, v string, w long"),
        t, mode="append")
    fast = storage.snapshot_changes(spark, t, 1, 2)
    assert sorted((r["k"], r["v"], r["w"], r["_change_type"], r["_n"])
                  for r in fast.collect()) == [(2, "b", 5, "insert", 1)]
    storage.write_snapshot(
        spark.createDataFrame([(3, "c", 6)], "k long, v string, w long"),
        t)
    gen = storage.snapshot_changes(spark, t, 1, 3)
    assert sorted((r["k"], r["v"], r["w"], r["_change_type"], r["_n"])
                  for r in gen.collect()) == \
        [(1, "a", None, "delete", 1), (3, "c", 6, "insert", 1)]


def test_compact_snapshot_is_content_neutral_and_tightens_pruning(spark):
    """OPTIMIZE: many appended commit dirs collapse to one, the row
    multiset is unchanged, time travel still reads the old layout,
    and a sorted compaction makes MERGE dir-pruning/data skipping
    stats tight (single dir, exact [min,max])."""
    t = tempfile.mkdtemp(prefix="scomp_")
    for lo in (0, 10, 20):
        storage.write_snapshot(
            _batch(spark, [(lo + i, f"v{lo + i}") for i in range(3)]), t,
            mode="overwrite" if lo == 0 else "append")
    before = sorted((r["k"], r["v"]) for r in
                    storage.read_snapshot(spark, t).collect())
    v = storage.compact_snapshot(spark, t, sort_by="k")
    assert v == 4
    after = sorted((r["k"], r["v"]) for r in
                   storage.read_snapshot(spark, t).collect())
    assert after == before
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v4.json")) as fh:
        man = json.load(fh)
    assert len(man["dirs"]) == 1
    assert man["stats"][man["dirs"][0]]["k"] == [0, 22]
    # time travel: the pre-compaction version still reads its 3 dirs
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v3.json")) as fh:
        assert len(json.load(fh)["dirs"]) == 3
    assert sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t, version=3).collect()) \
        == before
    # already compact + no sort requested: no-op
    assert storage.compact_snapshot(spark, t) is None
    assert storage.latest_version(t) == 4
    # CDF across the compaction sees ZERO changes (content-neutral)
    assert storage.snapshot_changes(spark, t, 3, 4).collect() == []


def test_empty_range_schema_matches_evolved_set(spark):
    """All three CDF paths must agree on the evolved column set: an
    empty version range on a schema-evolved table must return the
    UNION schema (k, v, w), not whichever footer read_snapshot
    sampled — a narrower empty frame breaks downstream unions."""
    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    storage.write_snapshot(
        spark.createDataFrame([(2, "b", 9.0)], "k long, v string, w double"),
        t, mode="append")
    empty = storage.snapshot_changes(spark, t, 2, 2)
    assert empty.collect() == []
    assert set(empty.columns) == {"k", "v", "w", "_change_type", "_n"}
    # and the non-empty fast path over the same table agrees
    full = storage.snapshot_changes(spark, t, 1, 2)
    assert set(full.columns) == set(empty.columns)


def test_delete_fast_path_agrees_with_general(spark):
    """Force the general path over a pure-delete range (remove the
    intermediate manifest so the chain is unverifiable) and pin that
    it returns exactly the delete fast path's relation."""
    from lcmap_blackmagic_spark.storage import delete_from_snapshot

    t = tempfile.mkdtemp(prefix="scdf_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b"), (2, "b"),
                                          (3, "c")]), t)
    delete_from_snapshot(
        spark, t, spark.createDataFrame([(2,)], "k long"), "k")
    delete_from_snapshot(
        spark, t, spark.createDataFrame([(3,), (9,)], "k long"), "k")
    fast = _got(storage.snapshot_changes(spark, t, 1, 3))
    assert fast == [(2, "b", "delete", 2), (3, "c", "delete", 1)]
    os.remove(os.path.join(t, storage.SNAP_MANIFESTS, "v2.json"))
    general = _got(storage.snapshot_changes(spark, t, 1, 3))
    assert general == fast


def test_pump_changes_materializes_exactly_once(spark):
    """The CDC pump: every source version lands in the output table
    exactly once under at-least-once scheduling — tags are both the
    watermark and the replay suppressor — and the accumulated feed
    replays to the live state."""
    from lcmap_blackmagic_spark.storage import (delete_from_snapshot,
                                                pump_changes)

    src = tempfile.mkdtemp(prefix="scdfsrc_")
    out = tempfile.mkdtemp(prefix="scdfout_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b")]), src)
    storage.write_snapshot(_batch(spark, [(3, "c")]), src, mode="append")
    assert pump_changes(spark, src, out) == [1, 2]
    assert pump_changes(spark, src, out) == []          # replay no-op
    delete_from_snapshot(
        spark, src, spark.createDataFrame([(2,)], "k long"), "k")
    storage.write_snapshot(_batch(spark, [(4, "d")]), src)  # overwrite
    assert pump_changes(spark, src, out) == [3, 4]
    feed = storage.read_snapshot(spark, out)
    got = sorted((r["_src_version"], r["k"], r["v"], r["_change_type"],
                  r["_n"]) for r in feed.collect())
    assert got == [
        (1, 1, "a", "insert", 1), (1, 2, "b", "insert", 1),
        (2, 3, "c", "insert", 1),
        (3, 2, "b", "delete", 1),
        (4, 1, "a", "delete", 1), (4, 3, "c", "delete", 1),
        (4, 4, "d", "insert", 1)]
    # replaying the feed reconstructs the live state: inserts minus
    # deletes, netted per row
    from pyspark.sql import functions as F
    net = (feed.withColumn(
        "__d", F.when(F.col("_change_type") == "insert",
                      F.col("_n")).otherwise(-F.col("_n")))
        .groupBy("k", "v").agg(F.sum("__d").alias("n"))
        .filter("n > 0"))
    assert sorted((r["k"], r["v"]) for r in net.collect()) == [(4, "d")]


def test_delete_fast_path_prunes_base_scan_by_key_bounds(spark):
    """On a key-clustered table (disjoint per-commit key ranges), the
    delete fast path's pinned MOR scan is bounded by the delete keys'
    [min, max]: only the commit dirs whose stats overlap are listed,
    and the delta equals the unpruned expectation."""
    t = tempfile.mkdtemp(prefix="scdf_")
    # three clustered commits: k in [0,9], [10,19], [20,29]
    for lo in (0, 10, 20):
        storage.write_snapshot(
            _batch(spark, [(k, f"v{k}") for k in range(lo, lo + 10)]),
            t, mode="append" if lo else "overwrite")
    keys = spark.createDataFrame([(12,), (17,)], "k long")
    storage.delete_from_snapshot(spark, t, keys, "k")
    ch = storage.snapshot_changes(spark, t, 3, 4)
    scanned = {f.split("/data/")[1].split("/")[0]
               for f in ch.inputFiles()
               if "/data/" in f}
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v3.json")) as fh:
        man = json.load(fh)
    data_dirs = set(man["dirs"])
    # the delete-key dirs are also read (broadcast side); data-side
    # pruning keeps exactly the one overlapping commit dir
    assert len(scanned & data_dirs) == 1
    assert _got(ch) == [(12, "v12", "delete", 1),
                        (17, "v17", "delete", 1)]
    # multi-group ranges (two different key tuples) stay unpruned but
    # exact: add a second delete on (k, v)
    storage.delete_from_snapshot(
        spark, t,
        spark.createDataFrame([(25, "v25")], "k long, v string"),
        ["k", "v"])
    ch2 = storage.snapshot_changes(spark, t, 3, 5)
    assert _got(ch2) == [(12, "v12", "delete", 1),
                         (17, "v17", "delete", 1),
                         (25, "v25", "delete", 1)]


def test_delete_fast_path_bloom_prunes_unsorted_table(spark):
    """With bloom sidecars on an UNSORTED (hash-split) table, the
    delete fast path's IN-list predicate prunes the base scan to the
    dirs whose filters admit a deleted key — min/max stats alone
    could not (every dir spans the key space)."""
    t = tempfile.mkdtemp(prefix="scdfb_")
    for b in range(4):
        rows = [(k, f"v{k}") for k in range(400) if k % 4 == b]
        storage.write_snapshot(
            _batch(spark, rows), t, mode="append" if b else "overwrite",
            bloom_cols=["k"])
    # two keys from hash bucket 1
    keys = spark.createDataFrame([(5,), (9,)], "k long")
    storage.delete_from_snapshot(spark, t, keys, "k")
    ch = storage.snapshot_changes(spark, t, 4, 5)
    assert _got(ch) == [(5, "v5", "delete", 1), (9, "v9", "delete", 1)]
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v4.json")) as fh:
        data_dirs = set(json.load(fh)["dirs"])
    scanned = {f.split("/data/")[1].split("/")[0]
               for f in ch.inputFiles() if "/data/" in f}
    assert len(scanned & data_dirs) == 1       # bloom found the bucket


def test_changes_across_restore_boundary(spark):
    """CDF over a RESTORE commit: rows the restore removed (present
    at v_from, absent at the restored content) surface as deletes,
    and a restore back to v_from's own content is an empty delta —
    the restore manifest is just another version to diff against."""
    t = tempfile.mkdtemp(prefix="scrst_")
    v1 = storage.write_snapshot(
        _batch(spark, [(1, "a")]), t, mode="overwrite")
    v2 = storage.write_snapshot(
        _batch(spark, [(2, "b")]), t, mode="append")
    v3 = storage.restore_snapshot(t, v1)
    assert _got(storage.snapshot_changes(spark, t, v2, v3)) == \
        [(2, "b", "delete", 1)]
    assert _got(storage.snapshot_changes(spark, t, v1, v3)) == []
