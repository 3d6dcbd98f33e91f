"""Shallow clone: a metadata-only new table referencing the source
version's commit dirs in place (storage.clone_snapshot).  Pins the
contract's load-bearing edges: zero data copied, full post-clone
divergence isolation, time travel inside the clone, stats pruning
through relative dir refs, clone-side vacuum never touching source
data, compaction materializing the clone, and the two loud
refusals (occupied target, MOR source)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage


def _vals(df):
    return sorted(r["v"] for r in df.collect())


def _rng(spark, lo, hi):
    return (spark.range(lo, hi).select(F.col("id").alias("v")))


def _mk(spark):
    src = tempfile.mkdtemp(prefix="clnsrc_")
    storage.write_snapshot(_rng(spark, 0, 5), src)
    storage.write_snapshot(_rng(spark, 10, 13), src, mode="append")
    dst = os.path.join(tempfile.mkdtemp(prefix="clndst_"), "t")
    return src, dst


def test_clone_is_metadata_only_and_reads_source_content(spark):
    src, dst = _mk(spark)
    assert storage.clone_snapshot(src, dst) == 1
    # no data files were copied: the clone's own data/ is empty
    assert os.listdir(os.path.join(dst, "data")) == []
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 3, 4, 10, 11, 12]


def test_clone_divergence_is_two_way_isolated(spark):
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    storage.write_snapshot(_rng(spark, 20, 22), dst, mode="append")
    storage.write_snapshot(_rng(spark, 30, 31), src, mode="append")
    # each side sees only its own append
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 3, 4, 10, 11, 12, 20, 21]
    assert _vals(storage.read_snapshot(spark, src)) == \
        [0, 1, 2, 3, 4, 10, 11, 12, 30]
    # time travel INSIDE the clone: v1 is the cloned content
    assert _vals(storage.read_snapshot(spark, dst, version=1)) == \
        [0, 1, 2, 3, 4, 10, 11, 12]
    # and a source OVERWRITE cannot reach the clone (old dirs remain
    # on disk until the source vacuums)
    storage.write_snapshot(_rng(spark, 90, 91), src)
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 3, 4, 10, 11, 12, 20, 21]


def test_clone_at_pinned_version(spark):
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst, version=1)
    assert _vals(storage.read_snapshot(spark, dst)) == [0, 1, 2, 3, 4]


def test_clone_stats_pruning_through_relative_refs(spark):
    src = tempfile.mkdtemp(prefix="clnsrc_")
    storage.write_snapshot(_rng(spark, 0, 5), src)
    storage.write_snapshot(_rng(spark, 100, 105), src, mode="append")
    dst = os.path.join(tempfile.mkdtemp(prefix="clndst_"), "t")
    storage.clone_snapshot(src, dst)
    got = storage.read_snapshot(spark, dst, where=("v", ">=", 100))
    assert _vals(got) == [100, 101, 102, 103, 104]


def test_clone_vacuum_never_deletes_source_data(spark):
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    storage.write_snapshot(_rng(spark, 20, 21), dst, mode="append")
    storage.write_snapshot(_rng(spark, 22, 23), dst)   # overwrite
    removed = storage.vacuum_snapshots(dst, keep=1, min_age_s=0.0)
    # the clone's own appended dir is vacuumable; the external
    # referenced dirs are not children of the clone's data/ and
    # survive untouched
    assert removed >= 1
    assert _vals(storage.read_snapshot(spark, src)) == \
        [0, 1, 2, 3, 4, 10, 11, 12]


def test_compact_materializes_clone_surviving_source_vacuum(spark):
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    storage.compact_snapshot(spark, dst)
    # materialized: compaction rewrote the rows into the clone's own
    # data/, so even a full source vacuum cannot break the clone
    storage.write_snapshot(_rng(spark, 50, 51), src)   # overwrite
    storage.vacuum_snapshots(src, keep=1, min_age_s=0.0)
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 3, 4, 10, 11, 12]


def test_clone_refuses_occupied_target(spark):
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    with pytest.raises(ValueError, match="already has"):
        storage.clone_snapshot(src, dst)


def test_clone_refuses_mor_source(spark):
    src = tempfile.mkdtemp(prefix="clnsrc_")
    storage.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        src)
    storage.delete_from_snapshot(spark, src,
                                 spark.createDataFrame([(1,)],
                                                       "k long"), "k")
    dst = os.path.join(tempfile.mkdtemp(prefix="clndst_"), "t")
    with pytest.raises(ValueError, match="delete-free"):
        storage.clone_snapshot(src, dst)
    # compaction materializes the deletes; the clone then succeeds
    storage.compact_snapshot(spark, src)
    storage.clone_snapshot(src, dst)
    assert [tuple(r) for r in
            storage.read_snapshot(spark, dst).collect()] == [(2, "b")]


def test_clone_delete_then_reinsert_on_clone_side(spark):
    """Clone-side MOR: cloned dirs enter at seq 0, so a clone-side
    equality delete applies to them, and a later re-insert of the
    same key survives (the Iceberg v2 rule across the clone
    boundary)."""
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    storage.delete_from_snapshot(spark, dst,
                                 spark.createDataFrame([(3,), (10,)],
                                                       "v long"), "v")
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 4, 11, 12]
    storage.write_snapshot(_rng(spark, 3, 4), dst, mode="append")
    assert _vals(storage.read_snapshot(spark, dst)) == \
        [0, 1, 2, 3, 4, 11, 12]
    # the source never saw any of it
    assert _vals(storage.read_snapshot(spark, src)) == \
        [0, 1, 2, 3, 4, 10, 11, 12]


def test_cdf_across_clone_boundary(spark):
    """CDF inside a clone: changes v1→v2 are exactly the clone-side
    append (the append fast path scans only the new dir, never the
    external cloned refs)."""
    from lcmap_blackmagic_spark.storage import snapshot_changes
    src, dst = _mk(spark)
    storage.clone_snapshot(src, dst)
    storage.write_snapshot(_rng(spark, 20, 22), dst, mode="append")
    ch = snapshot_changes(spark, dst, 1, 2).collect()
    assert sorted((r["v"], r["_change_type"], r["_n"]) for r in ch) \
        == [(20, "insert", 1), (21, "insert", 1)]
