"""Per-commit Bloom sidecars on snapshot tables: point (=) reads
prune commit dirs on a HIGH-CARDINALITY, UNSORTED column where the
manifest min/max stats cannot (every dir's range spans the id space),
and the pruned read is row-identical to the unpruned one."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage


def _ids(lo, n, stride):
    """n ids spread across the WHOLE key space: min/max stats of every
    commit overlap, so only the bloom can prune."""
    return [lo + i * stride for i in range(n)]


def _table(spark, n_commits=6, per=200, bloom=True):
    t = tempfile.mkdtemp(prefix="sbloom_")
    for c in range(n_commits):
        ids = _ids(c, per, n_commits * 7919)
        df = spark.createDataFrame(
            [(i, f"p-{i}") for i in ids], "id long, payload string")
        storage.write_snapshot(
            df, t, mode="append" if c else "overwrite",
            bloom_cols=["id"] if bloom else None)
    return t


def _scanned(df):
    return {f.split("/data/")[-1].split("/")[0] for f in df.inputFiles()}


def test_point_lookup_scans_dir_subset_and_matches_unpruned(spark):
    t = _table(spark)
    # a key from commit 3 (ids ≡ 3 mod stride's offset pattern)
    probe = 3 + 5 * 6 * 7919
    pruned = storage.read_snapshot(spark, t, where=("id", "=", probe))
    unpruned = storage.read_snapshot(spark, t).filter(
        F.col("id") == probe)
    got = sorted(tuple(r) for r in pruned.collect())
    want = sorted(tuple(r) for r in unpruned.collect())
    assert got == want and len(got) == 1
    n_dirs = 6
    assert len(_scanned(pruned)) < n_dirs        # strict subset
    assert len(_scanned(unpruned)) == n_dirs     # stats alone: no help
    # absent key: every dir bloom-excluded (up to false positives),
    # zero rows either way
    missing = storage.read_snapshot(spark, t, where=("id", "=", -99))
    assert missing.collect() == []
    assert len(_scanned(missing)) <= 1           # fp allowance


def test_blooms_survive_carry_forward_and_compose_with_stats(spark):
    """Sidecars ride inside their commit dir through append
    carry-forward; a range predicate still stats-prunes and an
    equality on the bloomed column prunes FURTHER on the survivors."""
    t = tempfile.mkdtemp(prefix="sbloom_")
    # clustered on k (stats-prunable), random-ish id (bloom-prunable)
    for c in range(4):
        rows = [(c * 100 + j, (j * 7919 + c) % 100000, f"v{c}-{j}")
                for j in range(100)]
        storage.write_snapshot(
            spark.createDataFrame(rows, "k long, id long, v string"),
            t, mode="append" if c else "overwrite", bloom_cols=["id"])
    probe_id = (7 * 7919 + 2) % 100000           # lives in commit 2
    both = storage.read_snapshot(
        spark, t, where=[("k", ">=", 200), ("id", "=", probe_id)])
    rows = [(r["k"], r["id"], r["v"]) for r in both.collect()]
    assert rows == [(207, probe_id, "v2-7")]
    assert len(_scanned(both)) == 1
    # dirs written WITHOUT a sidecar never prune (conservative)
    storage.write_snapshot(
        spark.createDataFrame([(999, probe_id, "dup")],
                              "k long, id long, v string"),
        t, mode="append")
    again = storage.read_snapshot(spark, t, where=("id", "=", probe_id))
    assert sorted((r["k"], r["v"]) for r in again.collect()) == \
        [(207, "v2-7"), (999, "dup")]


def test_bloom_composes_with_mor_deletes(spark):
    """Equality deletes subtract AFTER pruning — a bloom-pruned point
    read of a deleted key returns nothing, of a surviving key returns
    exactly the MOR result."""
    t = _table(spark, n_commits=3, per=50)
    alive = 1 + 10 * 3 * 7919
    dead = 2 + 10 * 3 * 7919
    storage.delete_from_snapshot(
        spark, t,
        spark.createDataFrame([(dead,)], "id long"), "id")
    assert storage.read_snapshot(
        spark, t, where=("id", "=", dead)).collect() == []
    hit = storage.read_snapshot(spark, t, where=("id", "=", alive))
    assert [r["id"] for r in hit.collect()] == [alive]
    assert len(_scanned(hit)) < 3 + 1   # data dirs pruned (+ key file)


def test_string_and_float_probe_semantics(spark):
    """String probes prune; float probes never prune (representation
    not provably shared) but still filter correctly."""
    t = tempfile.mkdtemp(prefix="sbloom_")
    for c in range(3):
        rows = [(f"user-{c}-{j}", float(c * 100 + j) + 0.5, c * 100 + j)
                for j in range(50)]
        storage.write_snapshot(
            spark.createDataFrame(rows, "u string, x double, n long"),
            t, mode="append" if c else "overwrite",
            bloom_cols=["u", "x"])
    hit = storage.read_snapshot(spark, t, where=("u", "=", "user-1-7"))
    assert [r["n"] for r in hit.collect()] == [107]
    assert len(_scanned(hit)) < 3
    fx = storage.read_snapshot(spark, t, where=("x", "=", 107.5))
    assert [r["n"] for r in fx.collect()] == [107]
    # float probes never BLOOM-prune (representation not provably
    # shared) — the helper admits every dir, even one the value is
    # absent from (here x is clustered, so the dir subset above came
    # from the min/max stats, not the bloom)
    data = os.path.join(t, "data")
    for d in os.listdir(data):
        if d.startswith("c-"):
            assert storage._snap_bloom_may_match(t, d, "x", 9999.25)


def test_vacuum_reaps_sidecar_with_its_dir(spark):
    """The sidecar lives inside the commit dir, so retention removes
    both together — no orphaned index files."""
    t = _table(spark, n_commits=2, per=20)
    # overwrite: old dirs become unreferenced by latest
    storage.write_snapshot(
        spark.createDataFrame([(1, "z")], "id long, payload string"),
        t, bloom_cols=["id"])
    storage.vacuum_snapshots(t, keep=1, min_age_s=0.0)
    data = os.path.join(t, "data")
    for d in os.listdir(data):
        if d.startswith("c-"):
            assert os.path.exists(os.path.join(data, d))
    # exactly one live dir remains, sidecar inside it
    live = [d for d in os.listdir(data) if d.startswith("c-")]
    assert len(live) == 1
    assert os.path.exists(os.path.join(data, live[0],
                                       storage.SNAP_BLOOM))


def test_in_list_predicate_prunes_stats_and_bloom(spark):
    """where=("id", "in", [...]) — the batched point lookup: stats
    prune dirs no listed value can reach, blooms prune the rest, and
    the result is row-identical to the unpruned isin filter."""
    t = _table(spark, n_commits=6, per=200)
    probes = [0, 3 + 5 * 6 * 7919, -42]        # commits 0 and 3 + miss
    got = storage.read_snapshot(spark, t, where=("id", "in", probes))
    want = storage.read_snapshot(spark, t).filter(
        F.col("id").isin(probes))
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted(tuple(r) for r in want.collect())
    assert got.count() == 2
    assert 0 < len(_scanned(got)) < 6          # strict dir subset
    # empty IN-list: zero rows, zero (or trivially few) dirs listed
    empty = storage.read_snapshot(spark, t, where=("id", "in", []))
    assert empty.collect() == []
    # composes with a second predicate
    both = storage.read_snapshot(
        spark, t, where=[("id", "in", probes), ("id", ">", 0)])
    assert [r["id"] for r in both.collect()] == [probes[1]]


def test_in_list_stats_pruning_without_blooms(spark):
    """On a clustered table WITHOUT sidecars, IN-list pruning rides
    the min/max stats alone."""
    import tempfile

    t = tempfile.mkdtemp(prefix="sbloomin_")
    for c in range(4):
        rows = [(c * 100 + j, f"v{c}-{j}") for j in range(100)]
        storage.write_snapshot(
            spark.createDataFrame(rows, "k long, v string"), t,
            mode="append" if c else "overwrite")
    got = storage.read_snapshot(spark, t, where=("k", "in", [7, 205]))
    assert sorted(r["k"] for r in got.collect()) == [7, 205]
    assert len(_scanned(got)) == 2             # the two hosting dirs


def test_tagged_streaming_commits_carry_blooms(spark):
    """A foreachBatch sink writing via write_snapshot_tagged(
    bloom_cols=) gets per-commit sidecars like any other commit —
    and a replayed tag still no-ops (no stray sidecar writes)."""
    t = tempfile.mkdtemp(prefix="sbloomtag_")
    for b in range(3):
        v = storage.write_snapshot_tagged(
            spark.createDataFrame(
                [(k, f"b{b}") for k in range(b, 300, 3)],
                "id long, src string"),
            t, tag=f"batch-{b}", bloom_cols=["id"])
        assert v == b + 1
    assert storage.write_snapshot_tagged(
        spark.createDataFrame([(999, "dup")], "id long, src string"),
        t, tag="batch-1", bloom_cols=["id"]) is None
    hit = storage.read_snapshot(spark, t, where=("id", "=", 7))
    assert [(r["id"], r["src"]) for r in hit.collect()] == [(7, "b1")]
    assert len(_scanned(hit)) < 3


def test_cross_type_int_probe_on_double_never_prunes(spark):
    """An int probe against a DOUBLE column must not bloom-prune:
    the write side hashed Spark's cast-to-string ("107.0"), so a
    probe hashing "107" would 'prove' absence of a value that IS
    present — the sidecar records the column's storage type and the
    probe side refuses cross-type pruning."""
    t = tempfile.mkdtemp(prefix="sbloomty_")
    for c in range(3):
        rows = [(float(c * 100 + j), c * 100 + j) for j in range(50)]
        storage.write_snapshot(
            spark.createDataFrame(rows, "x double, n long"),
            t, mode="append" if c else "overwrite", bloom_cols=["x"])
    # x holds 107.0, which Spark's numeric equality matches with the
    # int literal 107 — the read must return the row, not a
    # silently-pruned empty result
    hit = storage.read_snapshot(spark, t, where=("x", "=", 107))
    assert [r["n"] for r in hit.collect()] == [107]
    data = os.path.join(t, "data")
    for d in os.listdir(data):
        if d.startswith("c-"):
            assert storage._snap_bloom_may_match(t, d, "x", 107)
    # bool probe against a non-boolean column: also never prunes
    for d in os.listdir(data):
        if d.startswith("c-"):
            assert storage._snap_bloom_may_match(t, d, "n", True)


def test_legacy_sidecar_without_type_never_prunes(spark):
    """Sidecars written before the type field existed cannot prove
    representation agreement — they must admit every probe."""
    import json

    t = _table(spark, n_commits=1, per=20)
    data = os.path.join(t, "data")
    d = [x for x in os.listdir(data) if x.startswith("c-")][0]
    p = os.path.join(data, d, storage.SNAP_BLOOM)
    with open(p) as fh:
        sc = json.load(fh)
    for e in sc.values():
        e.pop("type", None)
    with open(p, "w") as fh:
        json.dump(sc, fh)
    assert storage._snap_bloom_may_match(t, d, "id", -424242)
    # and the read stays correct (just unpruned)
    assert storage.read_snapshot(
        spark, t, where=("id", "=", -424242)).collect() == []


def test_bloom_bits_capped_and_correct_when_saturated(spark,
                                                      monkeypatch):
    """SNAP_BLOOM_MAX_BITS bounds the driver-side build regardless of
    commit row count; a capped (saturating) filter weakens pruning,
    never correctness."""
    import json

    monkeypatch.setattr(storage, "SNAP_BLOOM_MAX_BITS", 2048)
    t = tempfile.mkdtemp(prefix="sbloomcap_")
    df = spark.createDataFrame([(i, f"p{i}") for i in range(1000)],
                               "id long, payload string")
    storage.write_snapshot(df, t, bloom_cols=["id"])
    data = os.path.join(t, "data")
    d = [x for x in os.listdir(data) if x.startswith("c-")][0]
    with open(os.path.join(data, d, storage.SNAP_BLOOM)) as fh:
        sc = json.load(fh)
    # uncapped m would be 10 * 1000 = 10_000 bits; the cap bounds the
    # bitset (and hence the collected word partials) at 2048 bits
    assert sc["id"]["m"] == 2048
    hit = storage.read_snapshot(spark, t, where=("id", "=", 777))
    assert [r["id"] for r in hit.collect()] == [777]
    assert storage.read_snapshot(
        spark, t, where=("id", "=", 10 ** 12)).count() == 0


def test_in_list_decodes_each_sidecar_once(spark, monkeypatch):
    """An IN-list probe of many values over many dirs must load and
    decode each dir's sidecar at most ONCE per read (per-read cache),
    not once per (dir, value) pair."""
    t = _table(spark, n_commits=4, per=100)
    loads = []
    orig = storage._snap_bloom_load

    def spy(table_dir, d, cache=None):
        if cache is None or d not in cache:
            loads.append(d)
        return orig(table_dir, d, cache)

    monkeypatch.setattr(storage, "_snap_bloom_load", spy)
    probes = [0, 1, 2, 3] + list(range(-60, 0))   # 4 hits + 60 misses
    got = storage.read_snapshot(spark, t, where=("id", "in", probes))
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3]
    assert len(loads) <= 4                        # one real load per dir
    assert len(loads) == len(set(loads))


def test_bloom_pruning_fuzz_random_types_and_probes(spark):
    """Property: for ANY mix of column types, probe types (including
    cross-typed probes), and commit layouts, a bloom+stats pruned
    point/IN read equals the unpruned filtered read.  This is the
    guard on the round-11 type-matching rule — an int probe against a
    double column once silently pruned a matching dir."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(1105)
    t = tempfile.mkdtemp(prefix="sbloomfz_")
    # columns: bigint id, double dx, string s, boolean b, int n
    rows_of = lambda lo: [
        (lo + i,
         float(lo + i) + rng.choice([0.0, 0.5]),
         f"u-{(lo + i) % 37}",
         (lo + i) % 2 == 0,
         (lo + i) % 19)
        for i in range(40)]
    for c in range(4):
        storage.write_snapshot(
            spark.createDataFrame(
                rows_of(c * 1000),
                "id long, dx double, s string, b boolean, n int"),
            t, mode="append" if c else "overwrite",
            bloom_cols=["id", "dx", "s", "b", "n"])
    full = storage.read_snapshot(spark, t)
    probes = []
    for _ in range(40):
        col = rng.choice(["id", "dx", "s", "b", "n"])
        # half matching values, half misses.  Cross-typed probes are
        # limited to combinations Spark's analyzer accepts (numeric
        # coercions): int-vs-double both ways — the exact shape of
        # the round-10 mis-prune — plus numeric strings against the
        # string column.  bool-vs-int / int-vs-bool probes raise
        # DATATYPE_MISMATCH at analysis and can never reach pruning.
        pool = {
            "id": [17, 1017, 2040, -5, 3000, 17.0, 2040.5],
            "dx": [17, 17.0, 1017.5, 9.25, 2040.0, -1.5],
            "s": ["u-3", "u-99", "17", "true"],
            "b": [True, False],
            "n": [3, 18, 99],
        }[col]
        if rng.random() < 0.7:
            probes.append((col, "=", rng.choice(pool)))
        else:
            # IN lists must be same-typed: Spark's analyzer refuses a
            # mixed-type isin (e.g. b IN (1, 0, true)) outright, so a
            # mixed list can never reach the pruning code anyway
            ty = type(rng.choice(pool))
            same = [v for v in pool if type(v) is ty]
            probes.append((col, "in",
                           rng.sample(same, k=min(3, len(same)))))
    for col, op, val in probes:
        got = storage.read_snapshot(spark, t, where=(col, op, val))
        want = full.filter(
            F.col(col).isin(list(val)) if op == "in"
            else F.col(col) == val)
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.collect())
        assert g == w, (col, op, val)


def test_compaction_can_rebuild_sidecars(spark):
    """A rewrite DROPS the input dirs' sidecars; compact_snapshot(
    bloom_cols=) re-creates one on the rewritten dir so id point
    reads keep pruning after OPTIMIZE."""
    t = _table(spark, n_commits=3, per=100)
    probe = 1 + 5 * 3 * 7919                     # lives in commit 1
    v = storage.compact_snapshot(spark, t, bloom_cols=["id"])
    assert v == 4
    data = os.path.join(t, "data")
    live = storage.read_snapshot(spark, t)
    new_dirs = _scanned(live)
    assert len(new_dirs) == 1
    assert os.path.exists(os.path.join(data, next(iter(new_dirs)),
                                       storage.SNAP_BLOOM))
    hit = storage.read_snapshot(spark, t, where=("id", "=", probe))
    assert [r["id"] for r in hit.collect()] == [probe]
    miss = storage.read_snapshot(spark, t, where=("id", "=", -7))
    assert miss.collect() == []
    assert len(_scanned(miss)) == 0              # bloom-proved absent


def test_zorder_composes_with_bloom_sidecars(spark):
    """OPTIMIZE ZORDER(bloom_cols=): the z-range dirs prune range
    predicates on the Morton inputs AND point lookups on the
    unclustered id — both skip structures per rewritten dir, and the
    pruned point read is row-identical to the unpruned filter."""
    from pyspark.sql import functions as F

    t = tempfile.mkdtemp(prefix="szb_")
    rows = [(i, (i * 7919) % 1000, (i * 104729) % 1000,
             (i * 15485863) % 100000) for i in range(800)]
    storage.write_snapshot(
        spark.createDataFrame(rows, "k long, x long, y long, id long"),
        t)
    storage.compact_snapshot_zorder(spark, t, "x", "y", n_dirs=4,
                                    bloom_cols=["id"])
    data = os.path.join(t, "data")
    live_dirs = _scanned(storage.read_snapshot(spark, t))
    assert len(live_dirs) == 4
    for d in live_dirs:
        assert os.path.exists(os.path.join(data, d, storage.SNAP_BLOOM))
    probe = (321 * 15485863) % 100000            # one real id
    got = storage.read_snapshot(spark, t, where=("id", "=", probe))
    want = storage.read_snapshot(spark, t).filter(F.col("id") == probe)
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted(tuple(r) for r in want.collect())
    assert len(_scanned(got)) < 4                # bloom pruned dirs
    assert storage.read_snapshot(
        spark, t, where=("id", "=", -123)).count() == 0
