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
