"""Incremental materialized-view maintenance (mv.py): incremental
refreshes must equal a from-scratch aggregate after ANY schedule of
source commits, replays must be suppressed, and the incremental path
must genuinely not touch pre-watermark commit data."""

import os
import random
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage
from lcmap_blackmagic_spark.mv import mv_read, mv_refresh, mv_watermark

KEYS = ["k"]
SPEC = [
    ("count", "*", "n"),
    ("count", "v", "nv"),
    ("sum",   "v", "sv"),
    ("min",   "v", "mnv"),
    ("max",   "v", "mxv"),
    ("avg",   "v", "av"),
]


def _batch(spark, rows):
    """rows: list of (k, v) with v possibly None."""
    return spark.createDataFrame(rows, "k string, v long")


def _expected(spark, src):
    return {
        r["k"]: (r["n"], r["nv"], r["sv"], r["mnv"], r["mxv"], r["av"])
        for r in storage.read_snapshot(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.count("v").alias("nv"),
             F.sum("v").alias("sv"), F.min("v").alias("mnv"),
             F.max("v").alias("mxv"),
             (F.sum("v").cast("double") / F.count("v")).alias("av"))
        .collect()}


def _actual(spark, mv):
    return {r["k"]: (r["n"], r["nv"], r["sv"], r["mnv"], r["mxv"], r["av"])
            for r in mv_read(spark, mv, KEYS, SPEC).collect()}


def test_incremental_equals_full_over_random_schedules(spark):
    """Property: after every commit+refresh of a random schedule of
    appends and overwrites (with NULL measures mixed in), the MV —
    scalar partials AND the hll register arrays — equals the direct
    aggregate of the live snapshot."""
    from lcmap_blackmagic_spark.mv import MV_HLL_P
    from lcmap_blackmagic_spark.operators.sketches import hll_distinct
    spec = SPEC + [("hll", "v", "nd")]
    rng = random.Random(813)
    for schedule in range(4):
        src = tempfile.mkdtemp(prefix="mvsrc_")
        mv = tempfile.mkdtemp(prefix="mv_")
        for step in range(5):
            rows = [(rng.choice("abcd"),
                     None if rng.random() < 0.2 else rng.randrange(-50, 50))
                    for _ in range(rng.randrange(1, 12))]
            mode = "overwrite" if step == 0 or rng.random() < 0.3 \
                else "append"
            storage.write_snapshot(_batch(spark, rows), src, mode=mode,
                                   collect_stats=False)
            mv_refresh(spark, src, mv, KEYS, spec)
            got = {r["k"]: (r["n"], r["nv"], r["sv"], r["mnv"],
                            r["mxv"], r["av"], r["nd"])
                   for r in mv_read(spark, mv, KEYS, spec).collect()}
            live = storage.read_snapshot(spark, src)
            hll = {r["k"]: r["hll_distinct"] for r in hll_distinct(
                live.filter("v IS NOT NULL"), ["k"], "v",
                p=MV_HLL_P).collect()}
            # a key whose v is entirely NULL has the empty sketch:
            # all-zero registers -> s = 256 * 2^48
            from lcmap_blackmagic_spark.operators.sketches import (
                H48, hll_alpha_numerator)
            empty_est = hll_alpha_numerator(MV_HLL_P) / float(256 * H48)
            want = {k: v + (hll.get(k, empty_est),)
                    for k, v in _expected(spark, src).items()}
            assert got == want, \
                f"schedule {schedule} step {step} ({mode})"


def test_replay_and_current_refreshes_are_noops(spark):
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    storage.write_snapshot(_batch(spark, [("a", 1), ("b", 2)]), src,
                           collect_stats=False)
    assert mv_refresh(spark, src, mv, KEYS, SPEC) == 1
    assert mv_watermark(mv) == 1
    # already-current refresh: no commit, version chain unchanged
    assert mv_refresh(spark, src, mv, KEYS, SPEC) is None
    assert storage.latest_version(mv) == 1
    storage.write_snapshot(_batch(spark, [("a", 3)]), src, mode="append",
                           collect_stats=False)
    assert mv_refresh(spark, src, mv, KEYS, SPEC) == 2
    assert mv_watermark(mv) == 2
    assert mv_refresh(spark, src, mv, KEYS, SPEC) is None


def test_incremental_never_touches_prewatermark_data(spark):
    """Hide the first commit's data dir before an append-only refresh:
    the incremental path (manifest diff + delta dirs only) must still
    succeed — a full rebuild would have to scan the hidden dir and
    fail.  This pins the 100 TB property, not just the result."""
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    storage.write_snapshot(_batch(spark, [("a", 1), ("b", 2)]), src,
                           collect_stats=False)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    storage.write_snapshot(_batch(spark, [("a", 10), ("c", None)]), src,
                           mode="append", collect_stats=False)
    man = storage.SNAP_MANIFESTS
    import json
    with open(os.path.join(src, man, "v1.json")) as fh:
        old_dir = json.load(fh)["dirs"][0]
    hidden = os.path.join(src, "data", old_dir)
    os.rename(hidden, hidden + ".cold")
    try:
        assert mv_refresh(spark, src, mv, KEYS, SPEC) == 2
    finally:
        os.rename(hidden + ".cold", hidden)
    assert _actual(spark, mv) == _expected(spark, src)


def test_vacuumed_watermark_falls_back_to_full_rebuild(spark):
    """Retention removes the watermark manifest: the refresh must
    detect it (manifest missing) and rebuild from the live snapshot
    rather than diff against a nearest survivor (which would
    double-count carried-forward dirs)."""
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    storage.write_snapshot(_batch(spark, [("a", 1)]), src,
                           collect_stats=False)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    storage.write_snapshot(_batch(spark, [("a", 2)]), src, mode="append",
                           collect_stats=False)
    storage.write_snapshot(_batch(spark, [("b", 5)]), src, mode="append",
                           collect_stats=False)
    storage.vacuum_snapshots(src, keep=1, min_age_s=0.0)
    assert storage.latest_version(src) == 3
    mv_refresh(spark, src, mv, KEYS, SPEC)
    assert _actual(spark, mv) == _expected(spark, src)
    assert mv_watermark(mv) == 3


def test_all_null_group_finalization(spark):
    """A key whose measure is entirely NULL: count(*) counts rows,
    count(v)=0, sum/min/max NULL, avg NULL — through TWO merges."""
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    storage.write_snapshot(_batch(spark, [("z", None), ("a", 1)]), src,
                           collect_stats=False)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    storage.write_snapshot(_batch(spark, [("z", None)]), src,
                           mode="append", collect_stats=False)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    got = _actual(spark, mv)
    assert got["z"] == (2, 0, None, None, None, None)
    assert got["a"] == (1, 1, 1, 1, 1, 1.0)


def test_hll_partial_incremental_equals_oneshot(spark):
    """approx-distinct in the MV: registers merged across THREE
    incremental refreshes must finalize to the exact same estimate
    as the one-shot sketch over the full table (same integer
    harmonic sum, same single division — bit-equal, not approx-
    equal), including a key overlap across commits."""
    from lcmap_blackmagic_spark.mv import MV_HLL_P
    from lcmap_blackmagic_spark.operators.sketches import hll_distinct
    keys = ["k"]
    spec = [("count", "*", "n"), ("hll", "u", "nd")]
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    batches = [
        [("a", i) for i in range(40)] + [("b", i) for i in range(5)],
        [("a", i) for i in range(20, 60)],          # overlaps batch 1
        [("b", None), ("b", 7), ("c", 1)],          # NULL u ignored
    ]
    for i, rows in enumerate(batches):
        storage.write_snapshot(
            spark.createDataFrame(rows, "k string, u long"), src,
            mode="overwrite" if i == 0 else "append",
            collect_stats=False)
        mv_refresh(spark, src, mv, keys, spec)
    got = {r["k"]: r["nd"] for r in
           mv_read(spark, mv, keys, spec).collect()}
    full = storage.read_snapshot(spark, src).filter("u IS NOT NULL")
    want = {r["k"]: r["hll_distinct"] for r in
            hll_distinct(full, ["k"], "u", p=MV_HLL_P).collect()}
    assert got == want                       # bit-exact, all 3 keys
    assert set(got) == {"a", "b", "c"}


def test_stream_driven_mv_refresh_equals_batch_mv(spark):
    """Kappa-form MV maintenance: the snapshot STREAM tails the
    source and each micro-batch's partial aggregate is merged into
    the MV table through a tagged overwrite commit — no manifest
    diffing, exactly-once from the tag.  The finalized view (scalar
    AND hll partials) must equal the direct aggregate, and a full
    replay from a fresh checkpoint publishes zero new MV versions."""
    from lcmap_blackmagic_spark.mv import (MV_HLL_P, _merge_partials,
                                           _partial_agg, mv_read)
    from lcmap_blackmagic_spark.operators.sketches import hll_distinct
    from lcmap_blackmagic_spark.sources.snapshotstream import (
        read_snapshot_stream)
    keys = ["k"]
    spec = [("count", "*", "n"), ("sum", "v", "sv"), ("hll", "v", "nd")]
    src = tempfile.mkdtemp(prefix="mvstream_src_")
    mv = tempfile.mkdtemp(prefix="mvstream_mv_")
    storage.write_snapshot(
        spark.createDataFrame([("a", 1), ("a", 2), ("b", 7)],
                              "k string, v long"), src)
    storage.write_snapshot(
        spark.createDataFrame([("a", 2), ("c", 9)], "k string, v long"),
        src, mode="append")

    def run(ckpt):
        def fb(batch_df, batch_id):
            part = _partial_agg(batch_df.drop("_snapshot_version"),
                                keys, spec)
            if storage.latest_version(mv) is not None:
                part = _merge_partials(
                    storage.read_snapshot(spark, mv).unionByName(part),
                    keys, spec)
            storage.write_snapshot_tagged(part, mv, f"batch-{batch_id}",
                                          mode="overwrite",
                                          collect_stats=False)
        q = (read_snapshot_stream(spark, src)
             .writeStream.foreachBatch(fb)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    run(tempfile.mkdtemp())
    v_after = storage.latest_version(mv)
    got = {r["k"]: (r["n"], r["sv"], r["nd"]) for r in
           mv_read(spark, mv, keys, spec).collect()}
    full = storage.read_snapshot(spark, src)
    hll = {r["k"]: r["hll_distinct"] for r in
           hll_distinct(full, ["k"], "v", p=MV_HLL_P).collect()}
    want = {r["k"]: (r["n"], r["sv"], hll[r["k"]]) for r in
            full.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("v").alias("sv")).collect()}
    assert got == want
    run(tempfile.mkdtemp())          # replay: tags suppress everything
    assert storage.latest_version(mv) == v_after


def test_quantile_partial_incremental_equals_oneshot(spark):
    """qNN aggregates in the MV: bin arrays summed across refreshes
    must finalize bit-equal to the one-shot histogram sketch over
    the full (non-null) table — shared rank/interpolation code, so
    equality is exact, not tolerance-based."""
    from lcmap_blackmagic_spark.mv import (MV_HIST_BINS, MV_HIST_HI,
                                           MV_HIST_LO, MV_HIST_SCALE)
    from lcmap_blackmagic_spark.operators.sketches import (
        histogram_quantiles)
    keys = ["k"]
    spec = [("count", "*", "n"), ("q50", "v", "med"),
            ("q90", "v", "p90"), ("hll", "v", "nd")]
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    batches = [
        [("a", float(i * 37 % 900 + 1)) for i in range(50)]
        + [("b", 13.25), ("b", None)],
        [("a", float(i * 91 % 2000 + 0.5)) for i in range(40)]
        + [("c", 7.0)],
    ]
    for i, rows in enumerate(batches):
        storage.write_snapshot(
            spark.createDataFrame(rows, "k string, v double"), src,
            mode="overwrite" if i == 0 else "append",
            collect_stats=False)
        mv_refresh(spark, src, mv, keys, spec)
    got = {r["k"]: (r["med"], r["p90"]) for r in
           mv_read(spark, mv, keys, spec).collect()}
    full = storage.read_snapshot(spark, src).filter("v IS NOT NULL")
    want = {r["k"]: (r["q_50"], r["q_90"]) for r in
            histogram_quantiles(full, ["k"], "v", (0.5, 0.9),
                                n_bins=MV_HIST_BINS, lo=MV_HIST_LO,
                                hi=MV_HIST_HI,
                                scale=MV_HIST_SCALE).collect()}
    assert got == want and set(got) == {"a", "b", "c"}


def test_refresh_with_heterogeneous_delta_dirs(spark):
    """Additive source evolution inside ONE delta read: two appended
    commits whose schemas differ (one lacks the measure column) must
    refresh correctly — a footer-inferred delta read would either
    fail analysis or silently drop the measure from the wider dir,
    corrupting the partials without error."""
    src = tempfile.mkdtemp(prefix="mvsrc_")
    mv = tempfile.mkdtemp(prefix="mv_")
    storage.write_snapshot(_batch(spark, [("a", 1), ("b", 2)]), src)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    storage.write_snapshot(
        spark.createDataFrame([("a",)], "k string"), src, mode="append")
    storage.write_snapshot(_batch(spark, [("a", 10), ("c", 5)]), src,
                           mode="append")
    assert mv_watermark(mv) == 1
    mv_refresh(spark, src, mv, KEYS, SPEC)        # ONE delta, two schemas
    assert _actual(spark, mv) == {
        "a": (3, 2, 11, 1, 10, 5.5),
        "b": (1, 1, 2, 2, 2, 2.0),
        "c": (1, 1, 5, 5, 5, 5.0)}
    # and a from-scratch rebuild over the evolved table (fresh MV ->
    # no watermark -> full path) reads the union schema the same way
    mv2 = tempfile.mkdtemp(prefix="mv_")
    mv_refresh(spark, src, mv2, KEYS, SPEC)
    assert _actual(spark, mv2) == _actual(spark, mv)


# ---------------------------------------------------------------------
# delete-aware incremental maintenance (round 10): a grown equality-
# delete list routes through retraction instead of a full rebuild when
# every stored partial can subtract exactly.

RSPEC = [
    ("count", "*", "n"),
    ("count", "v", "nv"),
    ("sum",   "v", "sv"),
    ("avg",   "v", "av"),
]


def _keys_df(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k string")


def _rexpected(spark, src):
    return {
        r["k"]: (r["n"], r["nv"], r["sv"], r["av"])
        for r in storage.read_snapshot(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.count("v").alias("nv"),
             F.sum("v").alias("sv"),
             (F.sum("v").cast("double") / F.count("v")).alias("av"))
        .collect()}


def _ractual(spark, mv, spec=None):
    spec = spec or RSPEC
    return {tuple(r[k] for k in KEYS) if len(KEYS) > 1 else r["k"]:
            tuple(r[a] for _o, _c, a in spec)
            for r in mv_read(spark, mv, KEYS, spec).collect()}


def test_delete_refresh_is_incremental_and_exact(spark, monkeypatch):
    """A GDPR-shaped delete commit between refreshes must (a) NOT
    trigger the full-rebuild read of the source, (b) leave the MV
    exactly equal to the direct aggregate — including a group
    retracted to zero rows (gone) and a group retracted to all-NULL
    measures (SQL SUM/AVG = NULL restored by the count guard)."""
    from lcmap_blackmagic_spark import mv as mvmod

    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(
        _batch(spark, [("a", 1), ("a", 2), ("b", 5), ("b", None),
                       ("c", 9)]), src)
    mv_refresh(spark, src, mv, KEYS, RSPEC)
    assert _ractual(spark, mv) == _rexpected(spark, src)

    # delete: all of c (group disappears), and b's only non-NULL row
    # (SUM/AVG must come back as NULL, not 0)
    storage.delete_from_snapshot(
        spark,
        src,
        spark.createDataFrame([("c", 9), ("b", 5)], "k string, v long"),
        ["k", "v"])

    calls = []
    real = mvmod.read_snapshot

    def spy(sp, table_dir, **kw):
        calls.append((table_dir, kw))
        return real(sp, table_dir, **kw)

    monkeypatch.setattr(mvmod, "read_snapshot", spy)
    v = mv_refresh(spark, src, mv, KEYS, RSPEC)
    monkeypatch.setattr(mvmod, "read_snapshot", real)
    assert v is not None
    # the rebuild path would call read_snapshot(src_dir, version=...);
    # the delete-aware path reads only the MV's own partials here
    # (the bounded delta scan lives inside storage.snapshot_changes)
    assert all(t != src for t, _kw in calls), calls
    got = _ractual(spark, mv)
    assert got == _rexpected(spark, src)
    assert "c" not in got
    assert got["b"] == (1, 0, None, None)


def test_delete_refresh_mixed_with_appends(spark):
    """One refresh range holding append AND delete commits — incl. a
    row appended then deleted INSIDE the range — retracts exactly."""
    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(_batch(spark, [("a", 1), ("b", 2)]), src)
    mv_refresh(spark, src, mv, KEYS, RSPEC)
    # range: append (a,10),(d,7) -> delete (a,10) and (b,2) -> append (b,3)
    storage.write_snapshot(_batch(spark, [("a", 10), ("d", 7)]), src,
                           mode="append")
    storage.delete_from_snapshot(
        spark, src,
        spark.createDataFrame([("a", 10), ("b", 2)], "k string, v long"),
        ["k", "v"])
    storage.write_snapshot(_batch(spark, [("b", 3)]), src, mode="append")
    assert mv_refresh(spark, src, mv, KEYS, RSPEC) is not None
    assert _ractual(spark, mv) == _rexpected(spark, src)
    # replay suppression still holds on the delete-aware path
    assert mv_refresh(spark, src, mv, KEYS, RSPEC) is None


def test_delete_refresh_duplicate_rows_retract_multiplicity(spark):
    """MOR tables hold duplicate rows; a delete of a duplicated key
    must retract EVERY copy (the CDF delta's _n expansion)."""
    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(
        _batch(spark, [("a", 4), ("a", 4), ("a", 4), ("b", 1)]), src)
    mv_refresh(spark, src, mv, KEYS, RSPEC)
    storage.delete_from_snapshot(spark, src, _keys_df(spark, ["a"]), "k")
    assert mv_refresh(spark, src, mv, KEYS, RSPEC) is not None
    got = _ractual(spark, mv)
    assert got == _rexpected(spark, src) and "a" not in got


def test_delete_refresh_quantile_hist_retracts(spark):
    """The qNN histogram state subtracts bin-wise: after deleting the
    upper half of a group's values, the MV median equals the one-shot
    sketch over the surviving table."""
    from lcmap_blackmagic_spark.mv import (MV_HIST_BINS, MV_HIST_HI,
                                           MV_HIST_LO, MV_HIST_SCALE)
    from lcmap_blackmagic_spark.operators.sketches import (
        hist_finalize)
    spec = [("count", "*", "n"), ("q50", "v", "med")]
    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(
        _batch(spark, [("a", x) for x in range(1, 101)]), src)
    mv_refresh(spark, src, mv, KEYS, spec)
    storage.delete_from_snapshot(
        spark, src,
        spark.createDataFrame([("a", x) for x in range(51, 101)],
                              "k string, v long"), ["k", "v"])
    assert mv_refresh(spark, src, mv, KEYS, spec) is not None
    got = {r["k"]: (r["n"], r["med"])
           for r in mv_read(spark, mv, KEYS, spec).collect()}
    base = (storage.read_snapshot(spark, src)
            .filter(F.col("v").isNotNull())
            .select("k", (F.col("v").cast("decimal(18,2)")
                          * MV_HIST_SCALE).cast("bigint")
                    .alias("v_scaled")))
    span = int((MV_HIST_HI - MV_HIST_LO) * MV_HIST_SCALE)
    width = span // MV_HIST_BINS
    bins = (base.select("k", F.least(
        F.lit(MV_HIST_BINS - 1),
        F.greatest(F.lit(0), F.expr(f"(v_scaled - 0) div {width}")))
        .alias("bin"))
        .groupBy("k", "bin").agg(F.count(F.lit(1)).alias("c")))
    want = {r["k"]: r["q_50"] for r in hist_finalize(
        bins, KEYS, [0.5], n_bins=MV_HIST_BINS, lo=MV_HIST_LO,
        hi=MV_HIST_HI, scale=MV_HIST_SCALE).collect()}
    assert got["a"][0] == 50
    assert got["a"][1] == want["a"]


def test_delete_with_minmax_spec_falls_back_to_rebuild(spark,
                                                       monkeypatch):
    """min/max cannot retract — a grown delete list under a spec
    containing them must take the full-rebuild path and still be
    exact."""
    from lcmap_blackmagic_spark import mv as mvmod

    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(
        _batch(spark, [("a", 1), ("a", 9), ("b", 5)]), src)
    mv_refresh(spark, src, mv, KEYS, SPEC)
    storage.delete_from_snapshot(
        spark, src,
        spark.createDataFrame([("a", 9)], "k string, v long"),
        ["k", "v"])
    calls = []
    real = mvmod.read_snapshot

    def spy(sp, table_dir, **kw):
        calls.append((table_dir, kw))
        return real(sp, table_dir, **kw)

    monkeypatch.setattr(mvmod, "read_snapshot", spy)
    assert mv_refresh(spark, src, mv, KEYS, SPEC) is not None
    monkeypatch.setattr(mvmod, "read_snapshot", real)
    assert any(t == src and kw.get("version") is not None
               for t, kw in calls)           # the rebuild read
    assert _actual(spark, mv) == _expected(spark, src)
    # max correctly dropped from 9 to 1 (a rebuild, not a stale fold)
    assert _actual(spark, mv)["a"][4] == 1


def test_gdpr_stream_drives_delete_aware_mv(spark):
    """VERDICT round-9 item 4, end to end: a gdpr_delete_stream
    micro-batch lands an equality-delete commit; the MV refresh
    consumes the delete DELTA only (no source-table rebuild read) and
    equals a from-scratch MV built beside it."""
    from lcmap_blackmagic_spark import mv as mvmod
    from lcmap_blackmagic_spark.streaming.jobs import gdpr_delete_stream

    src = tempfile.mkdtemp(prefix="mvdel_src_")
    mv = tempfile.mkdtemp(prefix="mvdel_")
    storage.write_snapshot(
        _batch(spark, [(f"u{i}", i) for i in range(20)]), src)
    storage.write_snapshot(
        _batch(spark, [(f"u{i}", 100 + i) for i in range(20)]), src,
        mode="append")
    mv_refresh(spark, src, mv, KEYS, RSPEC)

    req = tempfile.mkdtemp(prefix="mvdel_req_")
    _keys_df(spark, ["u3", "u7"]).coalesce(1) \
        .write.mode("append").parquet(req)
    q = gdpr_delete_stream(spark, req, src,
                           tempfile.mkdtemp(prefix="mvdel_ck_"), key="k")
    assert q.awaitTermination(300)

    calls = []
    real = mvmod.read_snapshot

    def spy(sp, table_dir, **kw):
        calls.append((table_dir, kw))
        return real(sp, table_dir, **kw)

    import pytest as _pytest
    mp = _pytest.MonkeyPatch()
    mp.setattr(mvmod, "read_snapshot", spy)
    try:
        assert mv_refresh(spark, src, mv, KEYS, RSPEC) is not None
    finally:
        mp.undo()
    assert all(t != src for t, _kw in calls), calls
    fresh = tempfile.mkdtemp(prefix="mvdel_fresh_")
    mv_refresh(spark, src, fresh, KEYS, RSPEC)
    assert _ractual(spark, mv) == _ractual(spark, fresh)
    assert "u3" not in _ractual(spark, mv)
