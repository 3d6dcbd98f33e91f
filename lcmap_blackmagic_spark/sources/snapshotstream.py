"""Streaming READER over the versioned snapshot store — tail a
table's commit log as a Structured Streaming source, the read-side
twin of ``storage.write_snapshot_tagged``'s streaming sink (what
Delta calls a streaming table read).

Offsets are manifest versions: ``{"version": n}`` means "everything
up to and including version n has been emitted".  Each micro-batch
covers the versions committed since the last offset; the rows of a
version are the rows of its NEW commit dirs (the dirs the manifest
added relative to its immediate predecessor), so

- an ``append`` commit streams exactly its delta,
- an ``overwrite`` commit re-emits the full new table content (its
  dirs replace the old set — the same semantics Delta gives an
  overwritten streaming source only with a flag; here it is the
  honest reading of the log),

and every emitted row carries a trailing ``_snapshot_version``
column so downstream logic can see batch provenance.

Scale shape: offset resolution and commit-dir diffing read only the
JSON manifests (driver, metadata-sized); the DATA is read
executor-side, one :class:`InputPartition` per parquet file, emitted
as Arrow RecordBatches (never per-row Python objects), so a large
commit fans out across the cluster and stays columnar end to end
(this is why the full ``DataSourceStreamReader`` API is used rather
than the driver-side ``SimpleDataSourceStreamReader``).

Replay contract: commit dirs are immutable, so re-reading an offset
range after checkpoint recovery yields byte-identical rows.
Retention interacts STRICTLY for a stream in flight: computing
version v's delta needs manifest v-1, so ``vacuum_snapshots`` must
keep manifests back to the stream's offset — a vacuumed diff base
raises loudly instead of silently re-emitting carried-forward dirs
as duplicates (caught by a live reproduction in review;
exactly-once beats availability here).  A FRESH stream (offset 0,
no start_version) on a vacuumed table bootstraps fine: it emits the
full snapshot at the first surviving version — nothing was emitted
before, so exactly-once holds by construction.

Timestamp fidelity: the store writes whatever the session's parquet
writer produces — INT96 (Spark's default for TimestampType),
TIMESTAMP_MICROS with isAdjustedToUTC, or NTZ micros.  The derived
schema maps instant-semantics columns (tz-aware arrow types AND
naive-arrow-but-physical-INT96) to ``timestamp`` and true NTZ to
``timestamp_ntz``, and read() casts batches accordingly — so the
streamed frame unions/joins cleanly with ``read_snapshot`` of the
same table.

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

    def versions(table_dir: str) -> list[int]:
        mdir = os.path.join(table_dir, "_manifests")
        if not os.path.isdir(mdir):
            return []
        return sorted(int(m.group(1)) for f in os.listdir(mdir)
                      if (m := re.fullmatch(r"v(\d+)\.json", f)))

    def manifest(table_dir: str, v: int) -> dict:
        path = os.path.join(table_dir, "_manifests", f"v{v}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"snapshotstream: manifest v{v} is gone (vacuumed?) "
                f"but is still needed — computing a version's delta "
                f"requires its predecessor manifest; retention must "
                f"keep manifests back to the stream's offset")
        with open(path) as fh:
            return json.load(fh)

    def parquet_files(data_dir: str) -> list[str]:
        return sorted(os.path.join(data_dir, f)
                      for f in os.listdir(data_dir)
                      if f.endswith(".parquet"))

    def sql_type(pa_type, physical: str) -> str:
        import pyarrow as pa
        if pa.types.is_timestamp(pa_type):
            # tz-aware arrow == adjusted-to-UTC parquet; naive arrow
            # from a physical INT96 is ALSO an instant (Spark's
            # legacy TimestampType encoding); only true naive micros/
            # nanos are NTZ
            if pa_type.tz is not None or physical == "INT96":
                return "timestamp"
            return "timestamp_ntz"
        m = {"int8": "tinyint", "int16": "smallint", "int32": "int",
             "int64": "bigint", "float": "float", "double": "double",
             "string": "string", "large_string": "string",
             "bool": "boolean", "date32[day]": "date",
             "binary": "binary"}
        s = str(pa_type)
        if s in m:
            return m[s]
        if s.startswith("decimal128("):
            return "decimal" + s[len("decimal128"):]
        raise ValueError(
            f"snapshotstream: unsupported parquet type {s!r} "
            f"(flat columns only)")

    def arrow_target(dt):
        """The arrow type a declared Spark field is emitted as."""
        import pyarrow as pa
        from pyspark.sql import types as T
        if isinstance(dt, T.DecimalType):
            return pa.decimal128(dt.precision, dt.scale)
        if isinstance(dt, T.TimestampType):
            return pa.timestamp("us", tz="UTC")
        if isinstance(dt, T.TimestampNTZType):
            return pa.timestamp("us")
        return {
            T.ByteType: pa.int8(), T.ShortType: pa.int16(),
            T.IntegerType: pa.int32(), T.LongType: pa.int64(),
            T.FloatType: pa.float32(), T.DoubleType: pa.float64(),
            T.StringType: pa.string(), T.BooleanType: pa.bool_(),
            T.DateType: pa.date32(), T.BinaryType: pa.binary(),
        }[type(dt)]

    class SnapshotStreamReader(DataSourceStreamReader):
        def __init__(self, table_dir: str, options: dict, schema):
            self.table_dir = table_dir
            self.start_version = int(options.get("start_version", 0))
            # all fields except the trailing provenance column come
            # from the parquet files, in schema order
            self.fields = [(f.name, arrow_target(f.dataType))
                           for f in schema.fields[:-1]]

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
            vmin = existing[0] if existing else None
            fresh = lo == self.start_version == 0
            parts = []
            prev_dirs = None
            for v in range(lo + 1, hi + 1):
                if v not in existing:
                    if fresh and vmin is not None and v < vmin:
                        # vacuumed PREFIX before a fresh bootstrap:
                        # nothing was ever emitted, so the first
                        # surviving version below carries everything
                        continue
                    # a vacuumed version inside a range the stream
                    # has partially consumed: its delta is
                    # unrecoverable — fail loudly rather than
                    # mis-attribute rows to a later diff
                    raise FileNotFoundError(
                        f"snapshotstream: version {v} in the unread "
                        f"range ({lo}, {hi}] was vacuumed; retention "
                        f"must out-live stream lag")
                dirs = manifest(self.table_dir, v)["dirs"]
                if v == vmin and fresh:
                    # bootstrap on a vacuumed table: emit the FULL
                    # snapshot at the first surviving version —
                    # exactly-once holds, this stream has emitted
                    # nothing yet
                    new_dirs = dirs
                elif v > 1:
                    # diff against the EXACT predecessor (raises if
                    # vacuumed): the nearest-survivor diff re-emits
                    # carried-forward dirs as duplicates.  range() is
                    # consecutive, so each iteration's dirs are the
                    # next one's predecessor — read each manifest once
                    if prev_dirs is None:
                        prev_dirs = set(
                            manifest(self.table_dir, v - 1)["dirs"])
                    new_dirs = [d for d in dirs if d not in prev_dirs]
                else:
                    new_dirs = dirs
                prev_dirs = set(dirs)
                for d in new_dirs:
                    for f in parquet_files(
                            os.path.join(self.table_dir, "data", d)):
                        parts.append(InputPartition((f, v)))
            return parts

        # ---- data (executors, Arrow batches, one file each) ------

        def read(self, partition):
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
            path, v = partition.value
            tbl = pq.read_table(path)
            n = tbl.num_rows
            present = set(tbl.schema.names)
            arrays, names = [], []
            for name, target in self.fields:
                if name in present:
                    arr = tbl.column(name).combine_chunks()
                    if (pa.types.is_timestamp(arr.type)
                            and arr.type.tz is None
                            and pa.types.is_timestamp(target)
                            and target.tz is not None):
                        # naive arrow from INT96: the values ARE UTC
                        # instants — attach the zone, then cast
                        arr = pc.assume_timezone(arr, "UTC")
                    arrays.append(arr.cast(target))
                else:
                    # additive schema evolution: files older than a
                    # column's introduction surface NULL, matching
                    # the batch read_snapshot(merge_schema=True)
                    arrays.append(pa.nulls(n, target))
                names.append(name)
            arrays.append(pa.array(np.full(n, v, dtype="int64")))
            names.append("_snapshot_version")
            yield from pa.Table.from_arrays(arrays,
                                            names=names).to_batches()

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
            pf = pq.ParquetFile(first)
            phys = {pf.schema.column(i).name:
                    pf.schema.column(i).physical_type
                    for i in range(len(pf.schema))}
            s = pf.schema_arrow
            fields = ", ".join(
                f"{nm} {sql_type(s.field(nm).type, phys.get(nm, ''))}"
                for nm in s.names)
            return f"{fields}, _snapshot_version bigint"

        def streamReader(self, schema):
            return SnapshotStreamReader(self._table_dir(),
                                        dict(self.options), schema)

    return SnapshotStreamDataSource


SnapshotStreamDataSource = _make_snapshot_stream_datasource()


def read_snapshot_stream(spark, table_dir: str, start_version: int = 0):
    """Convenience: register the source (re-registration just
    replaces — Spark warns, never raises) and open the stream."""
    spark.dataSource.register(SnapshotStreamDataSource)
    return (spark.readStream.format("snapshotstream")
            .option("table_dir", table_dir)
            .option("start_version", str(start_version)).load())
