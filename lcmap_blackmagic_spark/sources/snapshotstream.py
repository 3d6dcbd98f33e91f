"""Streaming READER over the versioned snapshot store — tail a
table's commit log as a Structured Streaming source, the read-side
twin of ``storage.write_snapshot_tagged``'s streaming sink (what
Delta calls a streaming table read).

Offsets are manifest versions: ``{"version": n}`` means "everything
up to and including version n has been emitted".  Each micro-batch
covers the versions committed since the last offset; the rows of a
version are the rows of its NEW commit dirs (the dirs the manifest
added relative to the previous one), so

- an ``append`` commit streams exactly its delta,
- an ``overwrite`` commit re-emits the full new table content (its
  dirs replace the old set — the same semantics Delta gives an
  overwritten streaming source only with a flag; here it is the
  honest reading of the log),

and every emitted row carries a trailing ``_snapshot_version``
column so downstream logic can see batch provenance.

Scale shape: offset resolution and commit-dir diffing read only the
JSON manifests (driver, metadata-sized); the DATA is read
executor-side, one :class:`InputPartition` per parquet file, so a
large commit fans out across the cluster instead of through the
driver (this is why the full ``DataSourceStreamReader`` API is used
rather than the driver-side ``SimpleDataSourceStreamReader``).

Replay contract: commit dirs are immutable, so re-reading an offset
range after checkpoint recovery yields byte-identical rows.  The one
caveat is retention — ``vacuum_snapshots`` must keep at least the
versions an active stream still has to read (the standard
table-format rule); a vacuumed version's rows are gone and the diff
falls through to the nearest surviving earlier manifest.

Packaging note: the whole DataSource is built by a FACTORY whose
class closes over only stdlib + pyarrow + pyspark symbols.  Spark
instantiates streaming Python data sources inside a separate planner
worker process that does NOT inherit the driver's sys.path (or its
``addPyFile`` archives) — a module-level class would be pickled by
reference and fail to import there whenever the driver runs outside
the repo root.  A closure class is pickled BY VALUE, so the source
works from any driver cwd, cluster or local.

Reference: the blackmagic reference has no streaming surface at all
(SURVEY §2.10 north-star); this source completes the repo's
table-format lifecycle: write → tag → time-travel → prune → tail.
"""

from __future__ import annotations


def _make_snapshot_stream_datasource():
    """Build the self-contained DataSource class (see module
    docstring for why this is a factory)."""
    import json
    import os
    import re

    from pyspark.sql.datasource import (DataSource,
                                        DataSourceStreamReader,
                                        InputPartition)

    PA_TO_SQL = {
        "int8": "tinyint", "int16": "smallint", "int32": "int",
        "int64": "bigint", "float": "float", "double": "double",
        "string": "string", "large_string": "string",
        "bool": "boolean", "date32[day]": "date", "binary": "binary",
        "timestamp[us]": "timestamp_ntz",
        "timestamp[ns]": "timestamp_ntz",
    }

    def sql_type(pa_type) -> str:
        s = str(pa_type)
        if s in PA_TO_SQL:
            return PA_TO_SQL[s]
        if s.startswith("decimal128("):
            return "decimal" + s[len("decimal128"):]
        raise ValueError(
            f"snapshotstream: unsupported parquet type {s!r} "
            f"(flat JSON-native columns only — the same surface the "
            f"manifest stats index)")

    def versions(table_dir: str) -> list[int]:
        mdir = os.path.join(table_dir, "_manifests")
        if not os.path.isdir(mdir):
            return []
        return sorted(int(m.group(1)) for f in os.listdir(mdir)
                      if (m := re.fullmatch(r"v(\d+)\.json", f)))

    def manifest(table_dir: str, v: int) -> dict:
        with open(os.path.join(table_dir, "_manifests",
                               f"v{v}.json")) as fh:
            return json.load(fh)

    def parquet_files(data_dir: str) -> list[str]:
        return sorted(os.path.join(data_dir, f)
                      for f in os.listdir(data_dir)
                      if f.endswith(".parquet"))

    class SnapshotStreamReader(DataSourceStreamReader):
        def __init__(self, table_dir: str, options: dict, schema):
            self.table_dir = table_dir
            self.start_version = int(options.get("start_version", 0))
            # all fields except the trailing provenance column come
            # from the parquet files, in schema order
            self.field_names = [f.name for f in schema.fields[:-1]]

        # ---- offsets (driver, manifest-metadata only) ------------

        def initialOffset(self) -> dict:
            return {"version": self.start_version}

        def latestOffset(self) -> dict:
            vs = versions(self.table_dir)
            return {"version": max(vs[-1] if vs else 0,
                                   self.start_version)}

        def partitions(self, start: dict, end: dict):
            existing = versions(self.table_dir)
            lo, hi = start["version"], end["version"]
            parts = []
            for v in existing:
                if not (lo < v <= hi):
                    continue
                dirs = manifest(self.table_dir, v)["dirs"]
                prior = [p for p in existing if p < v]
                if prior:
                    prev = set(manifest(self.table_dir,
                                        prior[-1])["dirs"])
                    new_dirs = [d for d in dirs if d not in prev]
                else:
                    new_dirs = dirs
                for d in new_dirs:
                    for f in parquet_files(
                            os.path.join(self.table_dir, "data", d)):
                        parts.append(InputPartition((f, v)))
            return parts

        # ---- data (executors, one parquet file per partition) ----

        def read(self, partition):
            import pyarrow.parquet as pq
            path, v = partition.value
            tbl = pq.read_table(path)
            present = set(tbl.schema.names)
            # additive schema evolution: files from commits older
            # than a column's introduction surface NULL for it,
            # exactly like the batch read_snapshot(merge_schema=True)
            cols = [tbl.column(n).to_pylist() if n in present
                    else [None] * tbl.num_rows
                    for n in self.field_names]
            for row in zip(*cols):
                yield (*row, v)

        def commit(self, end: dict) -> None:
            pass    # retention is vacuum_snapshots' job, not ours

    class SnapshotStreamDataSource(DataSource):
        """``spark.readStream.format("snapshotstream")
        .option("table_dir", …).option("start_version", 0).load()``"""

        @classmethod
        def name(cls) -> str:
            return "snapshotstream"

        def _table_dir(self) -> str:
            td = self.options.get("table_dir")
            if not td:
                raise ValueError(
                    "snapshotstream requires option 'table_dir'")
            return td

        def schema(self) -> str:
            """Derived from the LATEST manifest's newest data file
            (the store evolves additively, so the newest commit
            carries the widest schema), plus the provenance
            column."""
            import pyarrow.parquet as pq
            td = self._table_dir()
            vs = versions(td)
            if not vs:
                raise FileNotFoundError(f"no snapshots in {td}")
            man = manifest(td, vs[-1])
            first = parquet_files(
                os.path.join(td, "data", man["dirs"][-1]))[0]
            s = pq.read_schema(first)
            fields = ", ".join(f"{n} {sql_type(s.field(n).type)}"
                               for n in s.names)
            return f"{fields}, _snapshot_version bigint"

        def streamReader(self, schema):
            return SnapshotStreamReader(self._table_dir(),
                                        dict(self.options), schema)

    return SnapshotStreamDataSource


SnapshotStreamDataSource = _make_snapshot_stream_datasource()


def read_snapshot_stream(spark, table_dir: str, start_version: int = 0):
    """Convenience: register the source (idempotent) and open the
    stream."""
    try:
        spark.dataSource.register(SnapshotStreamDataSource)
    except Exception:
        pass                                    # already registered
    return (spark.readStream.format("snapshotstream")
            .option("table_dir", table_dir)
            .option("start_version", str(start_version)).load())
