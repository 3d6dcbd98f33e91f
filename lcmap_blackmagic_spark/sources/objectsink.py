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

The commit protocol is genuinely all-or-nothing: tasks STAGE each
object under a job-unique temp name, the driver-side ``commit``
atomically renames every staged object into place (overwriting any
stale prior object only at commit time), then publishes a job
manifest listing every object; ``abort`` deletes only this job's
temp files — previously committed objects are NEVER touched by a
failed job (the first cut wrote finals directly and its abort
destroyed prior commits).  ``mode("overwrite")`` additionally
removes committed objects absent from this job, so the directory
equals the manifest.  Object BYTES are identical to the
storage-module sink (pinned by tests): same sorted-record JSON,
same gzip body.

One object per chip requires each chip's rows in ONE task — callers
repartition by the chip key first (``write_objects`` below does);
otherwise the last task to stage a split key wins with a partial
object, the same contract every object sink has.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                    WriterCommitMessage)


@dataclass
class ObjectsCommit(WriterCommitMessage):
    keys: list  # [(x, y, n_records)] staged by this task


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
        self.token = uuid.uuid4().hex[:12]      # job-unique stage tag

    def _tmp(self, x: int, y: int) -> str:
        import os
        return os.path.join(self.root, self.entity,
                            f"{x}-{y}.json.{self.token}.tmp")

    def _final(self, x: int, y: int) -> str:
        import os
        return os.path.join(self.root, self.entity, f"{x}-{y}.json")

    def write(self, iterator) -> ObjectsCommit:
        import gzip
        import json
        import os

        from ..storage import PARTITION_KEYS, _jsonable
        kx, ky = PARTITION_KEYS[self.entity]
        os.makedirs(os.path.join(self.root, self.entity),
                    exist_ok=True)
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
            with open(self._tmp(x, y), "wb") as f:
                f.write(body)
            keys.append((x, y, len(records)))
        return ObjectsCommit(keys=keys)

    def commit(self, messages) -> None:
        import json
        import os
        keys = sorted(k for m in messages if m for k in m.keys)
        for x, y, _ in keys:
            os.replace(self._tmp(x, y), self._final(x, y))
        if self.overwrite:
            committed = {f"{x}-{y}.json" for x, y, _ in keys}
            base = os.path.join(self.root, self.entity)
            for f in os.listdir(base):
                if f.endswith(".json") and not f.startswith("_") \
                        and f not in committed:
                    os.remove(os.path.join(base, f))
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
                p = self._tmp(x, y)
                if os.path.exists(p):
                    os.remove(p)


def write_objects(df, root: str, entity: str,
                  mode: str = "append") -> None:
    """Convenience wrapper: register the source (idempotent),
    repartition on the chip key (one task per chip → whole objects),
    and save.  ``mode="overwrite"`` removes committed objects absent
    from this job at commit time."""
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
       .mode(mode).save())
