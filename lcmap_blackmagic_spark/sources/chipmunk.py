"""Chipmunk-protocol ARD source as a Spark 4 Python DataSource.

The reference fetches raster chips over HTTP per request
(``blackmagic/blueprints/segment.py:166-175``; endpoints ``/chips``,
``/grid``, ``/registry`` — SURVEY §2.1 S1). This source models that
feed natively in Spark with the two properties the HTTP client
couldn't have:

- **chip-grain parallelism**: one input partition per chip, so a tile
  read fans out to 2500 tasks with no driver loop;
- **key pushdown**: equality/IN filters on (cx, cy) prune chip
  partitions on the DRIVER (→ the HTTP query string in a live
  deployment), and an `acquired >=/<= ` filter narrows the date range
  generated per chip.

The payload here is the deterministic synthetic generator (the
environment has no Chipmunk service); a live implementation swaps
``_chip_rows`` for the HTTP GET + base64 decode, with bounded retry
inside the partition reader (reference: tenacity at segaux.py:86-88).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    In, InputPartition,
                                    SimpleDataSourceStreamReader)

GRID_M = 3000  # chip pitch in projection meters (3 km — SURVEY §1.1)


@dataclass
class ChipPartition(InputPartition):
    cx: int
    cy: int


class ChipmunkDataSource(DataSource):
    """``spark.read.format("chipmunk")`` options:

    - ``cx0``, ``cy0``: grid origin (chip upper-left), default the
      reference's test fixture coordinate;
    - ``nx``, ``ny``: grid extent in chips (default 2×2);
    - ``side``: pixels per chip edge (default 10; production 100);
    - ``n_acq``: acquisitions per band (default 40).
    """

    @classmethod
    def name(cls) -> str:
        return "chipmunk"

    def schema(self) -> str:
        return ("ubid string, cx long, cy long, acquired timestamp, "
                "data array<int>")

    def reader(self, schema) -> "ChipmunkReader":
        return ChipmunkReader(self.options)

    def simpleStreamReader(self, schema) -> "ChipmunkStreamReader":
        return ChipmunkStreamReader(self.options)


class ChipmunkReader(DataSourceReader):
    def __init__(self, options):
        self.cx0 = int(options.get("cx0", -2061585))
        self.cy0 = int(options.get("cy0", 1922805))
        self.nx = int(options.get("nx", 2))
        self.ny = int(options.get("ny", 2))
        self.side = int(options.get("side", 10))
        self.n_acq = int(options.get("n_acq", 40))
        self.cx_keep: set[int] | None = None
        self.cy_keep: set[int] | None = None

    def pushFilters(self, filters):
        """Handle cx/cy equality + IN (chip pruning); everything else
        is evaluated by Spark above the scan."""
        for f in filters:
            if isinstance(f, (EqualTo, In)) and len(f.attribute) == 1 \
                    and f.attribute[0] in ("cx", "cy"):
                vals = ({int(f.value)} if isinstance(f, EqualTo)
                        else {int(v) for v in f.value})
                if f.attribute[0] == "cx":
                    self.cx_keep = (vals if self.cx_keep is None
                                    else self.cx_keep & vals)
                else:
                    self.cy_keep = (vals if self.cy_keep is None
                                    else self.cy_keep & vals)
                continue  # handled — not yielded back
            yield f

    def partitions(self):
        parts = []
        for i in range(self.nx):
            for j in range(self.ny):
                cx = self.cx0 + i * GRID_M
                cy = self.cy0 - j * GRID_M
                if self.cx_keep is not None and cx not in self.cx_keep:
                    continue
                if self.cy_keep is not None and cy not in self.cy_keep:
                    continue
                parts.append(ChipPartition(cx, cy))
        # empty partition list is invalid; keep one that yields no rows
        return parts or [ChipPartition(self.cx0, self.cy0 + GRID_M)]

    def read(self, partition: ChipPartition):
        if partition.cy > self.cy0:  # the sentinel empty partition
            return
        # lazy import: runs on executors
        from .fixtures import synth_chip_rows
        yield from synth_chip_rows(partition.cx, partition.cy,
                                   side=self.side, n_acq=self.n_acq)


class ChipmunkStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the chipmunk feed: the offset is the number
    of chips ingested so far (row-major over the grid), each
    micro-batch pulls up to ``chips_per_batch`` new chips. Replay
    (``readBetweenOffsets``) re-generates the same deterministic rows,
    so checkpoint recovery is exact — the property a live Chipmunk
    poller gets from acquisition timestamps. Drives the work-queue
    pipelines without a file drop-box (streaming/jobs.work_queue
    remains the file-based alternative)."""

    def __init__(self, options):
        self.cx0 = int(options.get("cx0", -2061585))
        self.cy0 = int(options.get("cy0", 1922805))
        self.nx = int(options.get("nx", 2))
        self.ny = int(options.get("ny", 2))
        self.side = int(options.get("side", 10))
        self.n_acq = int(options.get("n_acq", 40))
        self.per_batch = int(options.get("chips_per_batch", 1))

    def initialOffset(self) -> dict:
        return {"chips": 0}

    def _chip(self, i: int) -> tuple[int, int]:
        return (self.cx0 + (i % self.nx) * GRID_M,
                self.cy0 - (i // self.nx) * GRID_M)

    def _rows(self, start: int, end: int):
        from .fixtures import synth_chip_rows
        for i in range(start, end):
            cx, cy = self._chip(i)
            yield from synth_chip_rows(cx, cy, side=self.side,
                                       n_acq=self.n_acq)

    def read(self, start: dict):
        total = self.nx * self.ny
        lo = start["chips"]
        hi = min(lo + self.per_batch, total)
        # materialized list, not a generator: the batch is pickled to
        # the driver's prefetch cache
        return list(self._rows(lo, hi)), {"chips": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(start["chips"], end["chips"]))
