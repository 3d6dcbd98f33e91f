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

Two payload modes share one schema:

- **synthetic** (default): the deterministic generator — the
  environment has no Chipmunk service;
- **http** (``option("url", ...)``): live-protocol mode. Each chip
  partition GETs ``{url}/chips?x&y&acquired&ubid`` per ubid (the
  query merlin issues for the reference — segment.py:166-175),
  base64-decodes each chip's ``data`` into pixel values, and yields
  the same rows. Retries are bounded with exponential backoff inside
  the partition reader (reference: tenacity ``stop_after_attempt(20),
  wait_exponential(multiplier=1, min=2, max=5)`` at segaux.py:86-88)
  — a task retry then re-fetches only its own chip.

Response shape (from the reference's recorded nginx cache,
deps/nginxcache): HTTP 200, JSON array of
``{"x": int, "y": int, "acquired": "YYYY-MM-DDTHH:MM:SSZ",
"data": base64}``, where data decodes to a flat little-endian
integer raster (dtype from the /registry endpoint; int16 for
Landsat SR/BT/QA bands — configurable via ``option("dtype", ...)``).
"""

from __future__ import annotations

import base64
import datetime
import json
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    In, InputPartition,
                                    SimpleDataSourceStreamReader)

GRID_M = 3000  # chip pitch in projection meters (3 km — SURVEY §1.1)

# reference retry policy (segaux.py:86-88)
RETRY_ATTEMPTS = 20
RETRY_WAIT_MIN = 2.0
RETRY_WAIT_MAX = 5.0


def _get_json(url: str, attempts: int = RETRY_ATTEMPTS,
              wait_min: float = RETRY_WAIT_MIN,
              wait_max: float = RETRY_WAIT_MAX,
              timeout: float = 30.0):
    """Bounded-retry GET → parsed JSON. Exponential backoff clamped
    to [wait_min, wait_max]; the final failure re-raises (tenacity's
    ``reraise=True``)."""
    for attempt in range(attempts):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                return json.loads(r.read().decode("utf-8"))
        except Exception:
            if attempt == attempts - 1:
                raise
            wait = min(wait_max, max(wait_min, 2.0 ** attempt))
            if wait > 0:
                time.sleep(wait)


def _http_chip_rows(url: str, ubid: str, cx: int, cy: int, acquired: str,
                    dtype: str, attempts: int, wait_min: float,
                    wait_max: float, timeout: float):
    """One ubid × one chip: GET /chips, decode base64 rasters, yield
    (ubid, cx, cy, acquired, data) rows in the source schema."""
    import numpy as np
    q = urllib.parse.urlencode(
        {"x": cx, "y": cy, "acquired": acquired, "ubid": ubid})
    payload = _get_json(f"{url}/chips?{q}", attempts=attempts,
                        wait_min=wait_min, wait_max=wait_max,
                        timeout=timeout)
    for chip in payload:
        raw = base64.b64decode(chip["data"])
        data = [int(v) for v in np.frombuffer(raw, dtype=np.dtype(dtype))]
        ts = datetime.datetime.fromisoformat(
            chip["acquired"].replace("Z", "+00:00"))
        ts = ts.replace(tzinfo=None)  # schema is naive timestamp
        yield (ubid, int(chip["x"]), int(chip["y"]), ts, data)


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
    - ``n_acq``: acquisitions per band (default 40; synthetic mode);
    - ``url``: Chipmunk base URL — switches to live HTTP mode;
    - ``ubids``: comma-separated ubids to fetch (http mode; default
      the Landsat 8 fixture set);
    - ``acquired``: 'start/end' range forwarded to /chips (http mode);
    - ``dtype``: numpy dtype of the base64 rasters (default int16);
    - ``attempts``/``wait_min``/``wait_max``/``timeout``: retry knobs
      (defaults = the reference's tenacity policy).
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
        self.url = options.get("url")  # set → live HTTP mode
        self.ubids = [u for u in options.get("ubids", "").split(",") if u]
        self.acquired = options.get("acquired", "1980/2020")
        self.dtype = options.get("dtype", "int16")
        self.attempts = int(options.get("attempts", RETRY_ATTEMPTS))
        self.wait_min = float(options.get("wait_min", RETRY_WAIT_MIN))
        self.wait_max = float(options.get("wait_max", RETRY_WAIT_MAX))
        self.timeout = float(options.get("timeout", 30.0))
        self.cx_keep: set[int] | None = None
        self.cy_keep: set[int] | None = None
        # live-protocol metadata: fetch /grid + /registry ONCE on the
        # driver (this __init__ runs at planning time; the parsed maps
        # ride the pickled reader to every executor). The service is
        # authoritative for chip pitch and per-ubid dtype/fill; the
        # published USGS ARD constants + the dtype option remain the
        # fallback when an endpoint is absent (option("metadata",
        # "off") skips the fetch entirely).
        self.grid_m = GRID_M
        self.band_specs: dict = {}
        if self.url and options.get("metadata", "on") != "off":
            import warnings

            from .metadata import fetch_grid, fetch_registry
            # ONE attempt per endpoint: a service without /grid or
            # /registry answers 404 immediately — retrying a permanent
            # miss would stall every planning pass ~8 s behind the
            # 2 s-floor backoff. The fallback is loud (warnings.warn),
            # never silent: decoding a band with the wrong dtype would
            # corrupt every raster of that band, so the operator must
            # see that the service's specs were not applied.
            # metadata-specific SHORT timeout: these two fetches run
            # at PLANNING time — a hung (connection- rather than
            # 404-) endpoint with the chip timeout (default 30 s)
            # would add up to ~60 s to every query plan. 5 s is ample
            # for two tiny JSON documents; the chips timeout still
            # governs the data path.
            retry = {"attempts": 1, "timeout": min(self.timeout, 5.0)}
            try:
                grids = fetch_grid(self.url, **retry)
                if "chip" in grids:
                    self.grid_m = grids["chip"].pitch_m
            except Exception as exc:
                warnings.warn(
                    f"chipmunk /grid unavailable ({exc!r}); using the "
                    f"published USGS grid constants", stacklevel=2)
            try:
                self.band_specs = fetch_registry(self.url, **retry)
            except Exception as exc:
                warnings.warn(
                    f"chipmunk /registry unavailable ({exc!r}); decoding "
                    f"ALL bands as dtype option {self.dtype!r} — wrong if "
                    f"any band uses a different wire type", stacklevel=2)

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
                cx = self.cx0 + i * self.grid_m
                cy = self.cy0 - j * self.grid_m
                if self.cx_keep is not None and cx not in self.cx_keep:
                    continue
                if self.cy_keep is not None and cy not in self.cy_keep:
                    continue
                parts.append(ChipPartition(cx, cy))
        # empty partition list is invalid; keep one that yields no rows
        return parts or [ChipPartition(self.cx0, self.cy0 + self.grid_m)]

    def read(self, partition: ChipPartition):
        if partition.cy > self.cy0:  # the sentinel empty partition
            return
        if self.url:
            from .fixtures import UBID_BANDS
            ubids = self.ubids or list(UBID_BANDS)
            for ubid in ubids:
                spec = self.band_specs.get(ubid)
                dtype = spec.dtype if spec else self.dtype
                yield from _http_chip_rows(
                    self.url, ubid, partition.cx, partition.cy,
                    self.acquired, dtype, self.attempts,
                    self.wait_min, self.wait_max, self.timeout)
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
