"""Copy-on-write MERGE INTO on the snapshot store
(storage.merge_into_snapshot): row-level U/D/I with dir-level
pruning, idempotency tags, conflict abort, and the MV fallback."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage
from lcmap_blackmagic_spark.mv import mv_read, mv_refresh


def _rows(spark, t):
    return sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t).collect())


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string")


def test_merge_udi_matrix(spark):
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    v = storage.merge_into_snapshot(
        spark, t,
        _changes(spark, [(2, "B", "U"),        # matched update
                         (3, None, "D"),       # matched delete
                         (4, "d", "I"),        # insert
                         (9, "x", "U"),        # unmatched update: drop
                         (8, None, "D")]),     # unmatched delete: no-op
        key="k")
    assert v == 2
    assert _rows(spark, t) == [(1, "a"), (2, "B"), (4, "d")]
    # time travel still sees the pre-merge table
    assert sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t, version=1).collect()) \
        == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_rewrites_only_overlapping_dirs(spark):
    """Two appends with disjoint key ranges; a merge touching only
    the second range must carry the first commit dir forward
    UNREAD — proven by hiding its data before the merge."""
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(i, f"a{i}") for i in (1, 2, 3)]), t)
    storage.write_snapshot(_batch(spark, [(i, f"b{i}") for i in (100, 101)]),
                           t, mode="append")
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v2.json")) as fh:
        man = json.load(fh)
    low_dir = [d for d in man["dirs"] if man["stats"][d]["k"][0] == 1][0]
    hidden = os.path.join(t, "data", low_dir)
    os.rename(hidden, hidden + ".cold")
    try:
        storage.merge_into_snapshot(
            spark, t, _changes(spark, [(100, "B", "U"), (102, "c", "I")]),
            key="k")
    finally:
        os.rename(hidden + ".cold", hidden)
    assert _rows(spark, t) == [(1, "a1"), (2, "a2"), (3, "a3"),
                               (100, "B"), (101, "b101"), (102, "c")]
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v3.json")) as fh:
        m3 = json.load(fh)
    assert low_dir in m3["dirs"] and m3["mode"] == "merge"
    # carried dir keeps its stats (future merges can keep pruning it)
    assert m3["stats"][low_dir]["k"] == [1, 3]


def test_merge_tag_idempotent(spark):
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    ch = _changes(spark, [(1, "A", "U")])
    assert storage.merge_into_snapshot(spark, t, ch, "k",
                                       tag="batch-7") == 2
    assert storage.merge_into_snapshot(spark, t, ch, "k",
                                       tag="batch-7") is None
    assert storage.latest_version(t) == 2
    assert _rows(spark, t) == [(1, "A")]


def test_merge_conflict_aborts_cleanly(spark, monkeypatch):
    """Lose the race for real: a concurrent commit lands AFTER the
    merge reads the manifest but BEFORE it publishes (injected via
    the stats hook, which runs between staging and publish).  The
    merge must raise, delete its staged data dir, and leave the
    winner's table state intact."""
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    real_stats = storage._snap_commit_stats
    fired = {}

    def race_then_stats(sp, data_dir):
        if not fired:
            fired["x"] = True
            with open(os.path.join(t, storage.SNAP_MANIFESTS,
                                   "v1.json")) as fh:
                v1 = json.load(fh)
            with open(os.path.join(t, storage.SNAP_MANIFESTS,
                                   "v2.json"), "w") as fh:
                json.dump({"version": 2, "mode": "overwrite",
                           "dirs": v1["dirs"], "stats": {}}, fh)
        return real_stats(sp, data_dir)

    monkeypatch.setattr(storage, "_snap_commit_stats", race_then_stats)
    with pytest.raises(storage.ConcurrentSnapshotMerge):
        storage.merge_into_snapshot(
            spark, t, _changes(spark, [(1, "A", "U")]), "k")
    # the loser's staged commit dir is gone: only dirs the two live
    # manifests reference remain
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v2.json")) as fh:
        live = set(json.load(fh)["dirs"])
    assert set(os.listdir(os.path.join(t, "data"))) == live
    assert _rows(spark, t) == [(1, "a")]


def test_merge_null_key_rejected(spark):
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="NULL"):
        storage.merge_into_snapshot(
            spark, t, _changes(spark, [(None, "x", "I")]), "k")


def test_mv_full_rebuild_after_merge(spark):
    """A merge drops rewritten dirs from the manifest, so the MV's
    append-only subset check fails and the refresh rebuilds — the
    view must equal the direct aggregate of the merged table."""
    src = tempfile.mkdtemp(prefix="smrgsrc_")
    mv = tempfile.mkdtemp(prefix="smrgmv_")
    keys, spec = ["k"], [("count", "*", "n"), ("min", "v", "mn")]
    storage.write_snapshot(
        spark.createDataFrame([(1, 5), (1, 7), (2, 9)], "k long, v long"),
        src)
    mv_refresh(spark, src, mv, keys, spec)
    storage.merge_into_snapshot(
        spark, src,
        spark.createDataFrame([(2, None, "D"), (3, 4, "I")],
                              "k long, v long, op string"),
        key="k")
    mv_refresh(spark, src, mv, keys, spec)
    got = {r["k"]: (r["n"], r["mn"]) for r in
           mv_read(spark, mv, keys, spec).collect()}
    assert got == {1: (2, 5), 3: (1, 4)}


def test_random_op_sequences_match_pure_model(spark):
    """Property: any interleaving of overwrite / append / COW-merge /
    MOR-delete / compaction / z-order-compaction commits leaves the
    table equal to a pure-Python list-of-rows model applying the
    documented semantics (duplicate keys from appends included: a
    source row acts on EVERY matching target row; an equality delete
    removes every current row with the key; both compactions are
    content-neutral).  Mirrors tests/test_snapshots.py's random-op
    model test, extended across the WHOLE write-path matrix."""
    import random

    from pyspark.sql import functions as F
    rng = random.Random(408)
    for schedule in range(3):
        t = tempfile.mkdtemp(prefix="smrgprop_")
        model: list[tuple] = []       # multiset of (k, v)
        storage.write_snapshot(
            _batch(spark, [(k, f"s{schedule}k{k}") for k in range(5)]), t)
        model = [(k, f"s{schedule}k{k}") for k in range(5)]
        for step in range(6):
            op = rng.choice(["append", "merge", "merge", "overwrite",
                             "delete", "compact", "zcompact"])
            if op == "delete":
                keys = rng.sample(range(20), rng.randrange(1, 4))
                storage.delete_from_snapshot(
                    spark, t,
                    spark.createDataFrame([(k,) for k in keys],
                                          "k long"), "k")
                model = [(mk, mv) for mk, mv in model if mk not in keys]
            elif op == "compact":
                storage.compact_snapshot(spark, t, sort_by="k")
            elif op == "zcompact":
                storage.compact_snapshot_zorder(
                    spark, t, "k", F.col("k") % 7, n_dirs=3)
            elif op == "overwrite":
                rows = [(rng.randrange(20), f"o{step}.{i}")
                        for i in range(rng.randrange(1, 6))]
                storage.write_snapshot(_batch(spark, rows), t)
                model = list(rows)
            elif op == "append":
                rows = [(rng.randrange(20), f"a{step}.{i}")
                        for i in range(rng.randrange(1, 6))]
                storage.write_snapshot(_batch(spark, rows), t,
                                       mode="append")
                model += rows
            else:
                keys = rng.sample(range(20), rng.randrange(1, 6))
                chg = [(k, f"m{step}.{k}", rng.choice("UDI"))
                       for k in keys]
                storage.merge_into_snapshot(spark, t,
                                            _changes(spark, chg), "k")
                for k, v, cop in chg:
                    present = any(mk == k for mk, _ in model)
                    if cop == "D":
                        model = [(mk, mv) for mk, mv in model if mk != k]
                    elif cop == "U":
                        if present:
                            model = [(mk, v if mk == k else mv)
                                     for mk, mv in model]
                    else:                       # I: upsert
                        if present:
                            model = [(mk, v if mk == k else mv)
                                     for mk, mv in model]
                        else:
                            model.append((k, v))
            got = sorted((r["k"], r["v"]) for r in
                         storage.read_snapshot(spark, t).collect())
            assert got == sorted(model), \
                f"schedule {schedule} step {step} op {op}"


def test_same_tag_race_is_noop_not_conflict(spark, monkeypatch):
    """Two concurrent merges with the SAME tag (a zombie driver and
    its replacement replaying one micro-batch): the loser must
    detect the tag in the log and return None — the
    write_snapshot_tagged no-op contract — rather than raise, while
    a FOREIGN commit still aborts with ConcurrentSnapshotMerge."""
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a")]), t)
    real_stats = storage._snap_commit_stats
    fired = {}

    def twin_wins_first(sp, data_dir):
        if not fired:
            fired["x"] = True
            with open(os.path.join(t, storage.SNAP_MANIFESTS,
                                   "v1.json")) as fh:
                v1 = json.load(fh)
            with open(os.path.join(t, storage.SNAP_MANIFESTS,
                                   "v2.json"), "w") as fh:
                json.dump({"version": 2, "mode": "merge",
                           "dirs": v1["dirs"], "stats": {},
                           "tag": "batch-3"}, fh)
        return real_stats(sp, data_dir)

    monkeypatch.setattr(storage, "_snap_commit_stats", twin_wins_first)
    assert storage.merge_into_snapshot(
        spark, t, _changes(spark, [(1, "A", "U")]), "k",
        tag="batch-3") is None
    assert storage.latest_version(t) == 2


def test_merge_preserves_evolved_columns(spark):
    """Additive schema evolution across the REWRITE set: the COW read
    must union the dirs' schemas (mergeSchema) — a footer-inferred
    read samples one arbitrary file, silently drops the evolved
    column, and the rewritten commit dir persists that loss."""
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b")]), t)
    storage.write_snapshot(
        spark.createDataFrame([(10, "j", 7.5), (11, "k", 8.5)],
                              "k long, v string, w double"),
        t, mode="append")
    # source key range [1, 11] brackets BOTH dirs -> both rewrite
    v = storage.merge_into_snapshot(
        spark, t, _changes(spark, [(1, "A", "U"), (11, None, "D")]), "k")
    assert v == 3
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in storage.read_snapshot(spark, t, merge_schema=True)
        .collect())
    assert got == [(1, "A", None), (2, "b", None), (10, "j", 7.5)]


def test_merge_empty_source_is_not_a_full_rewrite(spark):
    """An empty MERGE source overlaps nothing and inserts nothing:
    every live dir must CARRY FORWARD with its stats (a v8 review
    found the lo-is-None branch routing ALL dirs into the rewrite
    set — correct answer, full-table copy-on-write cost)."""
    t = tempfile.mkdtemp(prefix="smrg_")
    storage.write_snapshot(_batch(spark, [(1, "a"), (2, "b")]), t)
    storage.write_snapshot(_batch(spark, [(50, "x")]), t, mode="append")
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v2.json")) as fh:
        m2 = json.load(fh)
    v = storage.merge_into_snapshot(spark, t, _changes(spark, []), "k")
    assert v == 3
    assert _rows(spark, t) == [(1, "a"), (2, "b"), (50, "x")]
    with open(os.path.join(t, storage.SNAP_MANIFESTS, "v3.json")) as fh:
        m3 = json.load(fh)
    # both original dirs survive verbatim, stats intact; the only new
    # dir is the (empty) merge commit itself
    for d in m2["dirs"]:
        assert d in m3["dirs"] and m3["stats"][d] == m2["stats"][d]
    assert len(m3["dirs"]) == len(m2["dirs"]) + 1
