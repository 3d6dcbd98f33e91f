"""Chip-object sink as a Spark 4 Python DataSource WRITER — the
engine-integrated twin of ``storage.write_chip_json_objects``.

The reference persists one gzip JSON object per chip under
``{entity}/{x}-{y}.json`` (ceph.py:306-351).  ``storage`` ships that
as an ``applyInPandas`` job; this module exposes the same sink
through Spark's sink API proper, so it composes with everything a
DataFrame writer does::

    spark.dataSource.register(ChipObjectsDataSource)
    (df.repartition("cx", "cy")
       .write.format("chipobjects")
       .option("root", root).option("entity", "segment")
       .mode("append").save())

Per-partition ``write`` groups its rows by chip key and puts each
object; the driver-side ``commit`` publishes a job manifest listing
every object written (the all-or-nothing marker an object-store
consumer polls instead of _SUCCESS).  Object BYTES are identical to
the storage-module sink (pinned by tests): same sorted-record JSON,
same gzip body.

One object per chip requires each chip's rows in ONE task — callers
repartition by the chip key first (``write_objects`` below does);
otherwise the last task to write a split key wins with a partial
object, the same contract every object sink has.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                    WriterCommitMessage)


@dataclass
class ObjectsCommit(WriterCommitMessage):
    keys: list  # [(x, y, n_records)] written by this task


class ChipObjectsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chipobjects"

    def writer(self, schema, overwrite: bool):
        return _ObjectsWriter(dict(self.options), overwrite)


class _ObjectsWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.root = options["root"]
        self.entity = options["entity"]
        self.overwrite = overwrite

    def write(self, iterator) -> ObjectsCommit:
        import gzip
        import json
        import os

        from ..storage import PARTITION_KEYS, _jsonable
        kx, ky = PARTITION_KEYS[self.entity]
        out_base = os.path.join(self.root, self.entity)
        os.makedirs(out_base, exist_ok=True)
        groups: dict[tuple, list] = {}
        for row in iterator:
            d = row.asDict()
            groups.setdefault((int(d[kx]), int(d[ky])), []).append(d)
        keys = []
        for (x, y), recs in groups.items():
            records = sorted(
                ({c: _jsonable(v) for c, v in r.items()} for r in recs),
                key=lambda r: json.dumps(r, sort_keys=True))
            body = gzip.compress(json.dumps(records).encode("utf-8"))
            with open(os.path.join(out_base, f"{x}-{y}.json"), "wb") as f:
                f.write(body)
            keys.append((x, y, len(records)))
        return ObjectsCommit(keys=keys)

    def commit(self, messages) -> None:
        import json
        import os
        keys = sorted(k for m in messages if m for k in m.keys)
        manifest = os.path.join(self.root, self.entity,
                                "_manifest.json")
        with open(manifest, "w") as f:
            json.dump({"entity": self.entity, "n_objects": len(keys),
                       "objects": keys}, f)

    def abort(self, messages) -> None:
        import os
        for m in messages:
            if not m:
                continue
            for x, y, _ in m.keys:
                p = os.path.join(self.root, self.entity,
                                 f"{x}-{y}.json")
                if os.path.exists(p):
                    os.remove(p)


def write_objects(df, root: str, entity: str) -> None:
    """Convenience wrapper: register the source (idempotent),
    repartition on the chip key (one task per chip → whole objects),
    and save."""
    spark = df.sparkSession
    try:
        spark.dataSource.register(ChipObjectsDataSource)
    except Exception:
        pass                                    # already registered
    from ..storage import PARTITION_KEYS
    kx, ky = PARTITION_KEYS[entity]
    (df.repartition(kx, ky)
       .write.format("chipobjects")
       .option("root", root).option("entity", entity)
       .mode("append").save())
