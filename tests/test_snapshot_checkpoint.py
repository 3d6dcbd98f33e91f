"""Manifest-log checkpoints: every SNAP_CHECKPOINT_EVERY commits the
writer rolls up {version -> commit ts} and the committed-tag set, so
version_as_of and every tagged write resolve from checkpoint + TAIL
manifests (O(tail) file opens) instead of walking the whole log —
the Delta `_last_checkpoint` idea.  A streaming pump commits per
micro-batch, so without this a month of CDC pays O(versions) opens
per commit.  The checkpoint is advisory: results must be identical
with it, without it, and with a corrupted one."""

import json
import os
import tempfile
from unittest import mock

import pytest

from lcmap_blackmagic_spark import storage


def _one(spark, i=1):
    return spark.createDataFrame([(i, f"v{i}")], "k long, v string")


def _count_manifest_opens(fn):
    """Run fn() counting opens of v*.json manifest files."""
    import builtins

    n = [0]
    orig = builtins.open

    def spy(f, *a, **kw):
        s = str(f)
        base = os.path.basename(s)
        if (os.sep + storage.SNAP_MANIFESTS + os.sep in s
                and base.startswith("v") and base.endswith(".json")):
            n[0] += 1
        return orig(f, *a, **kw)

    with mock.patch("builtins.open", spy):
        out = fn()
    return n[0], out


@pytest.fixture(scope="module")
def log_table(spark):
    """One shared long log: 2*EVERY + 5 tagged commits."""
    t = tempfile.mkdtemp(prefix="scp_")
    total = 2 * storage.SNAP_CHECKPOINT_EVERY + 5
    df = _one(spark)
    for i in range(total):
        v = storage.write_snapshot_tagged(
            df, t, tag=f"b-{i}",
            mode="append" if i else "overwrite", collect_stats=False)
        assert v == i + 1
    return t, total


def test_checkpoint_published_on_cadence(spark, log_table):
    t, total = log_table
    cp = storage._snap_read_checkpoint(t)
    every = storage.SNAP_CHECKPOINT_EVERY
    assert cp["version"] == 2 * every
    # rolled-up maps cover exactly the checkpointed prefix
    assert sorted(int(k) for k in cp["ts"]) == list(range(1, 2 * every + 1))
    assert len(cp["tags"]) == 2 * every


def test_version_as_of_opens_only_the_tail(spark, log_table):
    t, total = log_table
    every = storage.SNAP_CHECKPOINT_EVERY
    tail = total - 2 * every
    now = storage._commit_ts() + 10
    opens, got = _count_manifest_opens(
        lambda: storage.version_as_of(t, now))
    assert got == total
    assert opens <= tail            # 5, not 69
    # identical answer with the checkpoint removed (advisory only)
    mid_ts = json.load(open(os.path.join(
        t, storage.SNAP_MANIFESTS, "v40.json")))["ts"]
    with_cp = storage.version_as_of(t, mid_ts)
    os.remove(os.path.join(t, storage.SNAP_MANIFESTS,
                           storage.SNAP_CHECKPOINT))
    try:
        assert storage.version_as_of(t, mid_ts) == with_cp == 40
    finally:
        # restore for the other tests by forcing a fresh rollup
        storage._snap_maybe_checkpoint(t, 2 * every)


def test_tagged_write_opens_only_the_tail(spark, log_table):
    t, total = log_table
    every = storage.SNAP_CHECKPOINT_EVERY
    tail = total - 2 * every
    # replay of an old (checkpointed) tag: suppressed, O(tail) opens.
    # +1: the append path re-reads the latest manifest to carry dirs.
    opens, v = _count_manifest_opens(
        lambda: storage.write_snapshot_tagged(
            _one(spark), t, tag="b-3", collect_stats=False))
    assert v is None
    assert opens <= tail + 1
    # a fresh tag commits normally
    v = storage.write_snapshot_tagged(_one(spark), t, tag="fresh-1",
                                      collect_stats=False)
    assert v == total + 1


def test_corrupt_checkpoint_falls_back_to_full_walk(spark, log_table):
    t, total = log_table
    p = os.path.join(t, storage.SNAP_MANIFESTS, storage.SNAP_CHECKPOINT)
    with open(p) as fh:
        good = fh.read()
    try:
        with open(p, "w") as fh:
            fh.write("{torn")
        assert storage._snap_read_checkpoint(t) is None
        now = storage._commit_ts() + 10
        assert storage.version_as_of(t, now) == storage.latest_version(t)
        assert "b-3" in storage._committed_tags(t)
    finally:
        with open(p, "w") as fh:
            fh.write(good)


def test_checkpoint_composes_with_vacuum(spark):
    """Vacuum drops old manifests; the checkpoint remembers their ts
    and tags.  Resolution must never return a vacuumed version, and
    vacuumed tags must keep suppressing replays."""
    t = tempfile.mkdtemp(prefix="scpv_")
    every = storage.SNAP_CHECKPOINT_EVERY
    df = _one(spark)
    for i in range(every + 2):
        storage.write_snapshot_tagged(
            df, t, tag=f"b-{i}",
            mode="append" if i else "overwrite", collect_stats=False)
    early_ts = json.load(open(os.path.join(
        t, storage.SNAP_MANIFESTS, "v2.json")))["ts"]
    storage.vacuum_snapshots(t, keep=2, min_age_s=0.0)
    # v2 is gone: an instant inside the vacuumed range has no
    # surviving version at-or-before it
    with pytest.raises(ValueError, match="at or before"):
        storage.version_as_of(t, early_ts)
    # a vacuumed tag still suppresses its replay (checkpoint +
    # tombstones agree)
    assert storage.write_snapshot_tagged(
        df, t, tag="b-1", collect_stats=False) is None


def test_all_write_paths_checkpoint(spark):
    """merge / equality-delete / compaction commits count toward the
    cadence like plain writes."""
    t = tempfile.mkdtemp(prefix="scpw_")
    every = storage.SNAP_CHECKPOINT_EVERY
    df = _one(spark)
    for i in range(every - 3):
        storage.write_snapshot(df, t,
                               mode="append" if i else "overwrite",
                               collect_stats=False)
    src = spark.createDataFrame([(1, "up", "U")],
                                "k long, v string, op string")
    storage.merge_into_snapshot(spark, t, src, "k")      # every - 2
    storage.delete_from_snapshot(
        spark, t, spark.createDataFrame([(99,)], "k long"),
        "k")                                             # every - 1
    assert storage._snap_read_checkpoint(t) is None
    v = storage.compact_snapshot(spark, t)               # every
    assert v == every
    cp = storage._snap_read_checkpoint(t)
    assert cp is not None and cp["version"] == every
    assert sorted(int(k) for k in cp["ts"]) == \
        list(range(1, every + 1))
