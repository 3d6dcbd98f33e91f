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
    ts, tags, complete = storage._cp_maps(t, cp)
    assert complete
    assert sorted(int(k) for k in ts) == list(range(1, 2 * every + 1))
    assert len(tags) == 2 * every


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


def _fake_log(tmpdir, total, ts0=1000.0):
    """Synthesize a manifest log directly on disk (no Spark writes)
    and run the checkpoint cadence the way the commit loop would —
    lets the growth tests reach ~1k versions in milliseconds."""
    mdir = os.path.join(tmpdir, storage.SNAP_MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    for v in range(1, total + 1):
        with open(os.path.join(mdir, f"v{v}.json"), "w") as fh:
            json.dump({"version": v, "dirs": [], "ts": ts0 + v,
                       "tag": f"b-{v}"}, fh)
        storage._snap_maybe_checkpoint(tmpdir, v)
    return mdir


def test_checkpoint_bytes_bounded_at_1k_commits(tmp_path):
    """At ~1k commits a late on-cadence checkpoint rewrites only the
    LAST partial segment plus the O(1) pointer — bytes CONSTANT in
    total version count — and version_as_of still resolves with
    O(tail) manifest opens."""
    t = str(tmp_path)
    every, seg = storage.SNAP_CHECKPOINT_EVERY, storage.SNAP_CP_SEG
    total = 4 * seg + 2 * every - 1      # 1087 at (32, 256)
    mdir = _fake_log(t, total)

    # the NEXT commit lands exactly on a cadence boundary: count the
    # files its checkpoint replaces and their bytes — must touch ONLY
    # the last partial segment + the O(1) pointer
    v = total + 1
    assert v % every == 0
    with open(os.path.join(mdir, f"v{v}.json"), "w") as fh:
        json.dump({"version": v, "dirs": [], "ts": 1000.0 + v,
                   "tag": f"b-{v}"}, fh)
    replaced = []
    orig = os.replace

    def spy(src, dst):
        replaced.append((dst, os.path.getsize(src)))
        return orig(src, dst)

    with mock.patch("os.replace", spy):
        storage._snap_maybe_checkpoint(t, v)
    assert len(replaced) <= 2            # last segment + pointer
    total_bytes = sum(b for _, b in replaced)
    # a flat (unsegmented) rollup of 1k versions' ts+tags is >30 KB
    # and grows forever; the segmented write stays bounded by one
    # segment regardless of V
    assert total_bytes < 12_000
    # resolution: O(tail) manifest opens at 1k+ versions
    cp = storage._snap_read_checkpoint(t)
    assert cp["version"] == v
    now = 1000.0 + v + 10
    opens, got = _count_manifest_opens(
        lambda: storage.version_as_of(t, now))
    assert got == v
    assert opens <= (got - cp["version"])       # == 0 here
    # full-prefix coverage survives the segmentation
    ts, tags, complete = storage._cp_maps(t, cp)
    assert complete
    assert sorted(int(k) for k in ts) == list(range(1, cp["version"] + 1))
    assert f"b-{cp['version']}" in tags and "b-1" in tags


def test_legacy_inline_checkpoint_migrates(tmp_path):
    """A pre-segmentation single-file checkpoint (inline ts/tags)
    still resolves, and the next on-cadence checkpoint migrates it
    into segments without losing either map."""
    t = str(tmp_path)
    every = storage.SNAP_CHECKPOINT_EVERY
    mdir = _fake_log(t, every - 1)       # no cadence hit yet
    legacy = {"version": every - 2,
              "ts": {str(v): 1000.0 + v for v in range(1, every - 1)},
              "tags": [f"b-{v}" for v in range(1, every - 1)]}
    with open(os.path.join(mdir, storage.SNAP_CHECKPOINT), "w") as fh:
        json.dump(legacy, fh)
    # legacy read path: maps come straight from the inline fields
    ts, tags, _c = storage._cp_maps(t, storage._snap_read_checkpoint(t))
    assert len(ts) == every - 2 and "b-1" in tags
    assert storage.version_as_of(t, 1000.0 + 5) == 5
    # next cadence: migrate + extend
    with open(os.path.join(mdir, f"v{every}.json"), "w") as fh:
        json.dump({"version": every, "dirs": [], "ts": 1000.0 + every,
                   "tag": f"b-{every}"}, fh)
    storage._snap_maybe_checkpoint(t, every)
    cp = storage._snap_read_checkpoint(t)
    assert cp["version"] == every and "ts" not in cp
    ts, tags, complete = storage._cp_maps(t, cp)
    assert complete
    assert sorted(int(k) for k in ts) == list(range(1, every + 1))
    assert {f"b-{v}" for v in range(1, every + 1)} <= tags


def test_checkpoint_never_raises_post_publish(tmp_path):
    """The checkpoint runs AFTER the manifest has published; a
    malformed on-disk state (or any internal failure) must surface
    as a no-op, never an exception the committer would misread as a
    failed commit (ADVICE r11: in the merge path it would even
    rmtree data a published manifest references)."""
    t = str(tmp_path)
    every = storage.SNAP_CHECKPOINT_EVERY
    mdir = _fake_log(t, every - 1)
    # structurally malformed checkpoint: ts not a dict
    with open(os.path.join(mdir, storage.SNAP_CHECKPOINT), "w") as fh:
        json.dump({"version": 5, "ts": "garbage"}, fh)
    assert storage._snap_read_checkpoint(t) is None   # reads as absent
    with open(os.path.join(mdir, f"v{every}.json"), "w") as fh:
        json.dump({"version": every, "dirs": [], "ts": 2000.0}, fh)
    storage._snap_maybe_checkpoint(t, every)          # must not raise
    assert storage._snap_read_checkpoint(t)["version"] == every
    # and an arbitrary internal failure is swallowed (advisory)
    with mock.patch.object(storage, "_snap_checkpoint_unsafe",
                           side_effect=RuntimeError("boom")):
        storage._snap_maybe_checkpoint(t, 2 * every)  # no raise


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
    assert sorted(int(k) for k in storage._cp_maps(t, cp)[0]) == \
        list(range(1, every + 1))


def test_stale_pointer_with_gcd_segment_full_walks(tmp_path):
    """The race the uuid-named-segment design closes: a reader (or a
    restored backup) holding a STALE pointer whose segment files were
    GC'd by a later checkpoint must degrade to the full manifest walk
    — never to a silently smaller tag set (a hidden committed tag
    would let a replayed batch double-publish)."""
    t = str(tmp_path)
    every = storage.SNAP_CHECKPOINT_EVERY
    mdir = _fake_log(t, every)                   # checkpoint at v=every
    p = os.path.join(mdir, storage.SNAP_CHECKPOINT)
    stale = open(p).read()
    old_segs = list(json.loads(stale)["segs"].values())
    # later commits + checkpoint: GCs the old segment file
    for v in range(every + 1, 2 * every + 1):
        with open(os.path.join(mdir, f"v{v}.json"), "w") as fh:
            json.dump({"version": v, "dirs": [], "ts": 1000.0 + v,
                       "tag": f"b-{v}"}, fh)
        storage._snap_maybe_checkpoint(t, v)
    assert all(not os.path.exists(os.path.join(mdir, s))
               for s in old_segs)                # replaced + GC'd
    # simulate the stale reader: restore the old pointer
    with open(p, "w") as fh:
        fh.write(stale)
    ts, tags, complete = storage._cp_maps(
        t, storage._snap_read_checkpoint(t))
    assert not complete
    # correctness holds via the fallbacks: every tag still found
    # (full walk), resolution still exact
    assert {f"b-{v}" for v in range(1, 2 * every + 1)} \
        <= storage._committed_tags(t)
    assert storage.version_as_of(t, 1000.0 + every + 3) == every + 3
    # and the NEXT on-cadence checkpoint HEALS: coverage complete again
    with open(os.path.join(mdir, f"v{2 * every + 1}.json"), "w") as fh:
        json.dump({"version": 2 * every + 1, "dirs": [],
                   "ts": 3000.0, "tag": "late"}, fh)
    storage._snap_checkpoint_unsafe(t, 3 * every)  # next boundary
    ts, tags, complete = storage._cp_maps(
        t, storage._snap_read_checkpoint(t))
    assert complete
    assert sorted(int(k) for k in ts) == list(range(1, 2 * every + 2))
