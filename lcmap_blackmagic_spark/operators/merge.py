"""CDC MERGE (upsert) — the batch form of ``MERGE INTO``.

The reference's closest relative is the idempotent last-wins overwrite
(reference blackmagic/data.py delete-then-insert per chip; ported as
storage.py dynamic-partition overwrite); ``merge_into`` generalizes it
to row-level change capture: a source of U/D/I rows applied to a
target in ONE full-outer shuffle join on the key.

Semantics (default path — deterministic, stated exactly):
- ``op`` = 'D', key matched    → target row dropped,
- ``op`` = 'D', no match       → no-op,
- ``op`` = 'U', key matched    → row kept, non-null source columns win,
- ``op`` = 'U', no match       → DROPPED (a stale update must not
  resurrect a deleted key — Delta/Iceberg ignore it the same way),
- ``op`` = 'I', no match       → source row appended,
- ``op`` = 'I', key matched    → applied as an update (upsert
  semantics; Delta would raise instead — documented deviation),
- no source row for a key      → target row unchanged.

Preconditions: at most ONE source row per key (like Delta, which
errors on duplicates — here a duplicate key would fan the join out
and duplicate the output row; enforce upstream with a last-wins
dedup), and a source row carries the full target schema plus ``op``;
updates use NULL for "keep the target value" (coalesce semantics — an
update cannot set a column TO NULL; use D+I for that).

Scale: one shuffle of each side on the join key. A CDC batch is
normally tiny next to the target — pass ``broadcast_source=True`` to
skip shuffling the target entirely (anti-join + union; the big side
is scanned once and never exchanged). The broadcast path trades two
semantic corners for that scan shape, both documented in the
function: it cannot consult target presence without a second pass,
so unmatched 'U' rows append (resurrect) and updates must carry
every column. Writing the result back through
storage.overwrite_partitions keeps the rewrite idempotent per
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(target: DataFrame, source: DataFrame, key: str,
               op_col: str = "op",
               broadcast_source: bool = False) -> DataFrame:
    """Apply a U/D/I change set to ``target``; returns the merged
    frame with the target's schema (see module docstring for the
    exact matched/unmatched matrix)."""
    data_cols = [c for c in target.columns if c != key]
    if broadcast_source:
        # big side never shuffles: anti-join drops changed keys, the
        # replacement values come from the (tiny) source side alone.
        # Corners accepted for the single-scan shape: updates must
        # carry every column (no NULL=keep), and an unmatched 'U'
        # appends like an insert (strict unmatched-U drop needs a
        # second target pass — use the default path for that).
        src = F.broadcast(source)
        untouched = target.join(src.select(key), key, "left_anti")
        replaced = (source.filter(F.col(op_col) != "D")
                    .select(key, *data_cols))
        return untouched.unionByName(replaced)
    # string-qualified refs, not t[c]/s[c]: attribute-id resolution is
    # ambiguous when the change set is derived from the target itself
    # (the common CDC self-referential case)
    t = target.withColumn("__tp", F.lit(1)).alias("__t")
    s = source.alias("__s")
    j = t.join(s, key, "full_outer")
    op = F.col(op_col)
    matched = F.col("__t.__tp").isNotNull()
    kept = j.filter(op.isNull()                  # untouched target row
                    | (op == "I")                # insert (or upsert)
                    | ((op == "U") & matched))   # update only if live
    picked = [F.coalesce(F.col(f"__s.{c}"), F.col(f"__t.{c}")).alias(c)
              if c in source.columns else F.col(f"__t.{c}").alias(c)
              for c in data_cols]
    return kept.select(F.col(key), *picked)


def incremental_agg_update(base_facts: DataFrame, base_agg: DataFrame,
                           changes: DataFrame, key: str, group_col: str,
                           value_col: str,
                           op_col: str = "op") -> DataFrame:
    """Incremental view maintenance for a per-group (COUNT, SUM)
    aggregate under a U/D/I change set — the merged table is never
    re-aggregated; only the CHANGE ROWS and the touched base rows
    move.

    Semantics mirror ``merge_into``'s matched/unmatched matrix
    exactly (U matched: coalesce per column; I matched: upsert;
    U unmatched: dropped), so maintaining the aggregate incrementally
    and re-aggregating the merged facts give identical results — the
    IVM contract, pinned by sharing one oracle with ``merge_upsert``.

    Delta contributions per change row (a group-moving update emits
    two rows — one negative at the old group, one positive at the
    new):
      D matched   → (−1, −old_value) @ old group
      U/I matched → (−1, −old_value) @ old group,
                    (+1, +coalesced new value) @ coalesced new group
      I unmatched → (+1, +value) @ group
      U/D unmatched → nothing

    Scale shape: the change set broadcasts into a semi-join lookup of
    the touched base rows (file-pruned by bloom/z-order layout when
    present); the delta aggregate is change-set-sized; the final join
    touches only the (tiny) aggregate table. The base FACTS are read
    only at those touched keys — this is the point: a 10⁹-row fact
    table with a 10⁴-row CDC batch updates its rollup in
    change-set-proportional work."""
    ch = changes.alias("__c")
    old = (base_facts
           .join(F.broadcast(changes.select(key).distinct()), key,
                 "left_semi")
           .select(F.col(key),
                   F.col(group_col).alias("__og"),
                   F.col(value_col).alias("__ov"))
           .alias("__o"))
    j = ch.join(old, key, "left")
    matched = F.col("__og").isNotNull()
    op = F.col(f"__c.{op_col}")
    minus = (j.filter(matched & op.isin("D", "U", "I"))
             .select(F.col("__og").alias(group_col),
                     F.lit(-1).cast("bigint").alias("__dn"),
                     (-F.col("__ov")).alias("__dv")))
    new_g = F.coalesce(F.col(f"__c.{group_col}"), F.col("__og"))
    new_v = F.coalesce(F.col(f"__c.{value_col}"), F.col("__ov"))
    plus = (j.filter((matched & op.isin("U", "I"))
                     | (~matched & (op == "I")))
            .select(new_g.alias(group_col),
                    F.lit(1).cast("bigint").alias("__dn"),
                    new_v.alias("__dv")))
    delta = (minus.unionByName(plus)
             .groupBy(group_col)
             .agg(F.sum("__dn").alias("__dn"),
                  F.sum("__dv").alias("__dv")))
    agg_cols = [c for c in base_agg.columns if c != group_col]
    n_col, sum_col = agg_cols[0], agg_cols[1]
    out = (base_agg.join(delta, group_col, "full_outer")
           .select(F.col(group_col),
                   (F.coalesce(F.col(n_col), F.lit(0))
                    + F.coalesce(F.col("__dn"), F.lit(0)))
                   .alias(n_col),
                   (F.coalesce(F.col(sum_col), F.lit(0))
                    + F.coalesce(F.col("__dv"), F.lit(0)))
                   .alias(sum_col)))
    return out.filter(F.col(n_col) > 0)
