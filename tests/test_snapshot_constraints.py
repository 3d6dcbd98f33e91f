"""CHECK constraints on snapshot tables: a violating commit is
refused BEFORE any data lands (no-partial-writes extended to data
quality), across the append/overwrite and MERGE write paths."""

import tempfile

import pytest

from lcmap_blackmagic_spark import storage


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_violating_commit_refused_without_side_effects(spark):
    t = tempfile.mkdtemp(prefix="scons_")
    storage.write_snapshot(_df(spark, [(1, 10), (2, 20)]), t)
    storage.set_snapshot_constraint(t, "v_positive", "v > 0")
    storage.set_snapshot_constraint(t, "k_not_null", "k IS NOT NULL")
    with pytest.raises(storage.SnapshotConstraintViolation,
                       match="v_positive"):
        storage.write_snapshot(_df(spark, [(3, -5), (4, 40)]), t,
                               mode="append")
    # nothing landed: version unchanged, content unchanged
    assert storage.latest_version(t) == 1
    assert sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t).collect()) == \
        [(1, 10), (2, 20)]
    # a clean commit still goes through
    assert storage.write_snapshot(_df(spark, [(5, 50)]), t,
                                  mode="append") == 2


def test_null_violates_unless_spelled_nullable(spark):
    """Rows where the expression is NULL violate (data-contract
    strictness); an explicitly nullable spelling passes them."""
    t = tempfile.mkdtemp(prefix="scons_")
    storage.set_snapshot_constraint(t, "v_pos", "v > 0")
    with pytest.raises(storage.SnapshotConstraintViolation,
                       match="v_pos"):
        storage.write_snapshot(_df(spark, [(1, None)]), t)
    storage.drop_snapshot_constraint(t, "v_pos")
    storage.set_snapshot_constraint(t, "v_pos_or_null",
                                    "v IS NULL OR v > 0")
    assert storage.write_snapshot(_df(spark, [(1, None), (2, 3)]),
                                  t) == 1


def test_merge_path_validates_rewrite(spark):
    """An upsert that would write a violating value is refused; the
    table stays at its pre-merge version."""
    t = tempfile.mkdtemp(prefix="scons_")
    storage.write_snapshot(_df(spark, [(1, 10), (2, 20)]), t)
    storage.set_snapshot_constraint(t, "v_small", "v < 100")
    src = spark.createDataFrame([(1, 500, "U")],
                                "k long, v long, op string")
    with pytest.raises(storage.SnapshotConstraintViolation,
                       match="v_small"):
        storage.merge_into_snapshot(spark, t, src, "k")
    assert storage.latest_version(t) == 1
    ok = spark.createDataFrame([(1, 50, "U")],
                               "k long, v long, op string")
    assert storage.merge_into_snapshot(spark, t, ok, "k") == 2
    got = dict((r["k"], r["v"]) for r in
               storage.read_snapshot(spark, t).collect())
    assert got == {1: 50, 2: 20}


def test_constraint_lifecycle_and_introspection(spark):
    t = tempfile.mkdtemp(prefix="scons_")
    assert storage.snapshot_constraints(t) == {}
    storage.set_snapshot_constraint(t, "a", "k > 0")
    storage.set_snapshot_constraint(t, "a", "k >= 0")   # overwrite
    storage.set_snapshot_constraint(t, "b", "v > 0")
    assert storage.snapshot_constraints(t) == {"a": "k >= 0",
                                               "b": "v > 0"}
    assert storage.drop_snapshot_constraint(t, "a") is True
    assert storage.drop_snapshot_constraint(t, "a") is False
    assert storage.snapshot_constraints(t) == {"b": "v > 0"}
    # tables WITHOUT constraints skip validation entirely (no file)
    t2 = tempfile.mkdtemp(prefix="scons_")
    assert storage.write_snapshot(_df(spark, [(1, -1)]), t2) == 1


def test_drop_policy_filters_violators(spark):
    t = tempfile.mkdtemp(prefix="scons_")
    storage.set_snapshot_constraint(t, "v_pos", "v > 0")
    v = storage.write_snapshot(
        _df(spark, [(1, 10), (2, -2), (3, 30), (4, None)]), t,
        on_violation="drop")
    assert v == 1
    assert sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t).collect()) == \
        [(1, 10), (3, 30)]


def test_quarantine_policy_dead_letters_with_reasons(spark):
    import os

    t = tempfile.mkdtemp(prefix="scons_")
    storage.set_snapshot_constraint(t, "v_pos", "v > 0")
    storage.set_snapshot_constraint(t, "k_small", "k < 100")
    storage.write_snapshot(
        _df(spark, [(1, 10), (2, -2), (500, -9)]), t,
        on_violation="quarantine")
    assert sorted((r["k"], r["v"]) for r in
                  storage.read_snapshot(spark, t).collect()) == [(1, 10)]
    q = storage.read_snapshot(
        spark, os.path.join(t, storage.SNAP_QUARANTINE))
    dead = {r["k"]: sorted(r["__violated"]) for r in q.collect()}
    assert dead == {2: ["v_pos"], 500: ["k_small", "v_pos"]}
    # a second quarantining commit APPENDS to the dead-letter table
    storage.write_snapshot(_df(spark, [(7, -1), (8, 80)]), t,
                           mode="append", on_violation="quarantine")
    q2 = storage.read_snapshot(
        spark, os.path.join(t, storage.SNAP_QUARANTINE))
    assert sorted(r["k"] for r in q2.collect()) == [2, 7, 500]
    assert sorted((r["k"]) for r in
                  storage.read_snapshot(spark, t).collect()) == [1, 8]


def test_clean_commit_under_drop_policy_is_untouched(spark):
    t = tempfile.mkdtemp(prefix="scons_")
    storage.set_snapshot_constraint(t, "v_pos", "v > 0")
    storage.write_snapshot(_df(spark, [(1, 1), (2, 2)]), t,
                           on_violation="quarantine")
    import os
    assert storage.latest_version(
        os.path.join(t, storage.SNAP_QUARANTINE)) is None  # no dir
    with pytest.raises(ValueError, match="on_violation"):
        storage.write_snapshot(_df(spark, [(3, 3)]), t,
                               mode="append", on_violation="explode")


def test_merge_not_blocked_by_legacy_violations(spark):
    """Constraints validate only rows originating from the MERGE
    source: pre-existing rows written BEFORE the constraint was
    registered (which set_snapshot_constraint documents are not
    re-validated) must not permanently refuse every future merge —
    and a merge can even FIX the legacy row."""
    t = tempfile.mkdtemp(prefix="scons_")
    storage.write_snapshot(_df(spark, [(1, -5), (2, 20)]), t)
    storage.set_snapshot_constraint(t, "v_pos", "v > 0")
    # merge touching only k=2 succeeds despite the legacy k=1 row
    ok = spark.createDataFrame([(2, 30, "U")],
                               "k long, v long, op string")
    assert storage.merge_into_snapshot(spark, t, ok, "k") == 2
    got = dict((r["k"], r["v"]) for r in
               storage.read_snapshot(spark, t).collect())
    assert got == {1: -5, 2: 30}
    # the merge's OWN rows are still validated
    bad = spark.createDataFrame([(3, -1, "I")],
                                "k long, v long, op string")
    with pytest.raises(storage.SnapshotConstraintViolation,
                       match="v_pos"):
        storage.merge_into_snapshot(spark, t, bad, "k")
    assert storage.latest_version(t) == 2
    # and a merge targeting the legacy key can repair it
    fix = spark.createDataFrame([(1, 5, "U")],
                                "k long, v long, op string")
    assert storage.merge_into_snapshot(spark, t, fix, "k") == 3
    got = dict((r["k"], r["v"]) for r in
               storage.read_snapshot(spark, t).collect())
    assert got == {1: 5, 2: 30}
