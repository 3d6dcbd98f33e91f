"""CDC MERGE (upsert) — the batch form of ``MERGE INTO``.

The reference's closest relative is the idempotent last-wins overwrite
(reference blackmagic/data.py delete-then-insert per chip; ported as
storage.py dynamic-partition overwrite); ``merge_into`` generalizes it
to row-level change capture: a source of U/D/I rows applied to a
target in ONE full-outer shuffle join on the key.

Semantics (Delta/Iceberg MERGE subset, deterministic):
- source ``op`` = 'D'  → target row dropped,
- source ``op`` = 'U'  → target row kept, non-null source columns win,
- source ``op`` = 'I'  → source row appended (no target match),
- no source match      → target row unchanged.

A source row must carry the full target schema plus ``op``; updates
use NULL for "keep the target value" (coalesce semantics — an update
cannot set a column TO NULL; use D+I for that).

Scale: one shuffle of each side on the join key. A CDC batch is
normally tiny next to the target — pass ``broadcast_source=True`` to
skip shuffling the target entirely (broadcast-hash full-outer is not
supported, so the broadcast path splits into a left-anti union
left-semi plan that still avoids the big-side exchange). Writing the
result back through storage.write_partitioned keeps the overwrite
idempotent per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(target: DataFrame, source: DataFrame, key: str,
               op_col: str = "op",
               broadcast_source: bool = False) -> DataFrame:
    """Apply a U/D/I change set to ``target``; returns the merged
    frame with the target's schema."""
    data_cols = [c for c in target.columns if c != key]
    if broadcast_source:
        # big side never shuffles: anti-join drops matched rows, the
        # replacement values come from the (tiny) source side alone —
        # requires updates to carry every column (no NULL=keep).
        src = F.broadcast(source)
        untouched = target.join(src.select(key), key, "left_anti")
        replaced = (source.filter(F.col(op_col) != "D")
                    .select(key, *data_cols))
        return untouched.unionByName(replaced)
    # string-qualified refs, not t[c]/s[c]: attribute-id resolution is
    # ambiguous when the change set is derived from the target itself
    # (the common CDC self-referential case)
    t = target.alias("__t")
    s = source.alias("__s")
    j = t.join(s, key, "full_outer")
    kept = j.filter(F.col(op_col).isNull() | (F.col(op_col) != "D"))
    picked = [F.coalesce(F.col(f"__s.{c}"), F.col(f"__t.{c}")).alias(c)
              if c in source.columns else F.col(f"__t.{c}").alias(c)
              for c in data_cols]
    return kept.select(F.col(key), *picked)
