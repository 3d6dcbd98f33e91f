"""Z-order key: golden interleave values and the layout property the
operator exists for (curve locality → both columns prune)."""

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.functions.zorder import spread_bits, zvalue


def _z(spark, x, y):
    return spark.range(1).select(
        zvalue(F.lit(x), F.lit(y)).alias("z")).first()["z"]


def test_zvalue_golden(spark):
    # x=3 → bits at 0,2 = 5; y=2 → bit 1 spread to 3 → shifted = 8
    assert _z(spark, 3, 2) == 13
    assert _z(spark, 0, 0) == 0
    assert _z(spark, 1, 0) == 1
    assert _z(spark, 0, 1) == 2
    # top supported bit: 2^30 → even position 60 / odd position 61
    assert _z(spark, 1 << 30, 0) == 1 << 60
    assert _z(spark, 0, 1 << 30) == 1 << 61
    assert _z(spark, (1 << 31) - 1, 0) == 0x1555555555555555


def test_spread_bits_is_even_positions(spark):
    rows = spark.range(64).select(
        "id", spread_bits(F.col("id")).alias("s")).collect()
    for r in rows:
        v, s = r["id"], r["s"]
        expect = 0
        for i in range(7):
            if v >> i & 1:
                expect |= 1 << (2 * i)
        assert s == expect


def test_write_zordered_files_prune_on_both_columns(spark, tmp_path):
    """Real write path: files laid out by the curve must carry tight
    parquet footer min/max on BOTH key columns — an x-range or
    y-range predicate each skips most files using stats alone."""
    import pyarrow.parquet as pq

    from lcmap_blackmagic_spark.storage import write_zordered

    n = 64
    df = (spark.range(n * n)
          .select((F.col("id") % n).alias("x"),
                  (F.col("id") / n).cast("long").alias("y"),
                  F.col("id").alias("payload")))
    out = str(tmp_path / "zorded")
    n_files = write_zordered(df, out, "x", "y", n_files=16)
    assert n_files == 16
    import glob
    spans_x, spans_y, prune_x, prune_y = [], [], 0, 0
    files = glob.glob(out + "/*.parquet")
    assert len(files) == 16
    for f in files:
        md = pq.read_metadata(f)
        mins = {"x": [], "y": []}
        maxs = {"x": [], "y": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        lo_x, hi_x = min(mins["x"]), max(maxs["x"])
        lo_y, hi_y = min(mins["y"]), max(maxs["y"])
        spans_x.append(hi_x - lo_x)
        spans_y.append(hi_y - lo_y)
        # would a reader scanning x < n/4 (resp. y < n/4) skip it?
        if lo_x >= n // 4:
            prune_x += 1
        if lo_y >= n // 4:
            prune_y += 1
    # every file's span on EACH column is a fraction of the domain
    assert max(spans_x) <= n // 2
    assert max(spans_y) <= n // 2
    # and each single-column predicate prunes at least half the files
    assert prune_x >= 8
    assert prune_y >= 8


def test_zvalue_roundtrips_through_unzvalue(spark):
    """zvalue ∘ unzvalue is the identity over the input domain —
    property-checked on random 31-bit pairs plus the boundary."""
    import random

    from lcmap_blackmagic_spark.functions.zorder import unzvalue

    rng = random.Random(7)
    pairs = ([(rng.randrange(1 << 31), rng.randrange(1 << 31))
              for _ in range(200)]
             + [(0, 0), ((1 << 31) - 1, (1 << 31) - 1), (0, (1 << 31) - 1)])
    df = spark.createDataFrame(pairs, "x long, y long")
    zx, zy = unzvalue(zvalue(F.col("x"), F.col("y")))
    bad = df.filter((zx != F.col("x")) | (zy != F.col("y"))).count()
    assert bad == 0


def test_zorder_blocks_bound_both_columns(spark):
    """Files written in z-order carry tight min/max on BOTH inputs:
    split a z-sorted key space into blocks and check each block's
    x-range and y-range span at most half the domain — the property
    that makes either-column predicates prune."""
    n = 32  # 5-bit × 5-bit domain
    df = (spark.range(n * n)
          .select((F.col("id") % n).alias("x"),
                  (F.col("id") / n).cast("long").alias("y")))
    rows = (df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z"))
            .orderBy("z").collect())
    block = 64  # 16 blocks of 64 cells
    for b in range(0, len(rows), block):
        xs = [r["x"] for r in rows[b:b + block]]
        ys = [r["y"] for r in rows[b:b + block]]
        assert max(xs) - min(xs) <= n // 2
        assert max(ys) - min(ys) <= n // 2


def test_hive_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """A filter on the hive partition column must become a
    PartitionFilter (directory-level pruning) — zero data files from
    other partitions are opened, the property that makes
    partitionBy layouts worth their small-file cost at 100 TB."""
    from pyspark.sql import functions as F
    out = str(tmp_path / "events_by_type")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    from .test_plan_shapes import fmt_plan
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = fmt_plan(back)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    n_click = e.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click
