"""Live-protocol mode of the chipmunk DataSource, tested against a
local replay server that mimics the reference's recorded Chipmunk
responses (deps/nginxcache): JSON arrays of {x, y, acquired, data}
with base64 little-endian int16 rasters. The http mode must produce
exactly the synthetic mode's rows (same schema, same values), and
transient 5xx must be absorbed by the bounded retry."""

import base64
import json
import threading
import urllib.parse
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from lcmap_blackmagic_spark.sources.chipmunk import ChipmunkDataSource
from lcmap_blackmagic_spark.sources.fixtures import (UBID_BANDS,
                                                     synth_chip_rows)

CX0, CY0 = -2061585, 1922805
SIDE, N_ACQ = 5, 7


# the recorded /grid response's geometry (the published USGS ARD
# Albers grid) in the service's wire shape
GRID_BODY = [
    {"name": "tile", "proj": "PROJCS[...]", "rx": 1.0, "ry": -1.0,
     "sx": 150000.0, "sy": 150000.0, "tx": 2565585.0, "ty": 3314805.0},
    {"name": "chip", "proj": "PROJCS[...]", "rx": 1.0, "ry": -1.0,
     "sx": 3000.0, "sy": 3000.0, "tx": 2565585.0, "ty": 3314805.0},
]

WIRE_TO_SERVICE = {"<i2": "INT16", "<i4": "INT32", "uint8": "BYTE"}


class ReplayHandler(BaseHTTPRequestHandler):
    """Serves /chips, /grid, and /registry from the synthetic
    generator in the reference's recorded response shapes.
    ``fail_first`` makes the first N requests per distinct URL return
    503 (exercises the bounded retry); ``band_wire`` overrides the
    wire dtype per ubid (reported by /registry, used to encode
    /chips rasters — proves the reader decodes per-band)."""

    fail_first = 0
    seen: dict = defaultdict(int)
    band_wire: dict = {}
    serve_metadata = True
    lock = threading.Lock()

    def log_message(self, *a):  # silence request logging
        pass

    def _json(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/grid" and ReplayHandler.serve_metadata:
            self._json(GRID_BODY)
            return
        if parsed.path == "/registry" and ReplayHandler.serve_metadata:
            self._json([
                {"ubid": u, "tags": [], "data_mask": {},
                 "data_shape": [SIDE, SIDE], "data_fill": None,
                 "data_type": WIRE_TO_SERVICE[
                     ReplayHandler.band_wire.get(u, "<i2")]}
                for u in UBID_BANDS])
            return
        if parsed.path != "/chips":
            self.send_error(404)
            return
        with ReplayHandler.lock:
            ReplayHandler.seen[self.path] += 1
            if ReplayHandler.seen[self.path] <= ReplayHandler.fail_first:
                self.send_error(503, "transient")
                return
        q = urllib.parse.parse_qs(parsed.query)
        x, y = int(float(q["x"][0])), int(float(q["y"][0]))
        ubid = q["ubid"][0]
        wire = ReplayHandler.band_wire.get(ubid, "<i2")
        chips = []
        for u, cx, cy, acquired, data in synth_chip_rows(
                x, y, side=SIDE, n_acq=N_ACQ):
            if u != ubid:
                continue
            raw = np.asarray(data, dtype=wire).tobytes()
            chips.append({
                "x": cx, "y": cy,
                "acquired": acquired.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "data": base64.b64encode(raw).decode("ascii"),
            })
        self._json(chips)


@pytest.fixture(scope="module")
def server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), ReplayHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ChipmunkDataSource)
    return spark


def _load(spark, url, **extra):
    opts = {"cx0": CX0, "cy0": CY0, "nx": 2, "ny": 2, "side": SIDE,
            "n_acq": N_ACQ, "wait_min": 0, "wait_max": 0, **extra}
    reader = spark.read.format("chipmunk").options(**opts)
    if url:
        reader = reader.option("url", url)
    return reader.load()


def test_http_mode_matches_synthetic(server, registered):
    ReplayHandler.fail_first = 0
    ReplayHandler.seen.clear()
    ReplayHandler.band_wire = {}
    http_df = _load(registered, server)
    synth_df = _load(registered, None)
    assert http_df.schema == synth_df.schema
    h = {tuple(map(str, r)) for r in http_df.collect()}
    s = {tuple(map(str, r)) for r in synth_df.collect()}
    assert h == s
    # 4 chips × 8 ubids × 7 acquisitions
    assert len(h) == 4 * len(UBID_BANDS) * N_ACQ


def test_http_mode_retries_transient_errors(server, registered):
    ReplayHandler.fail_first = 2
    ReplayHandler.seen.clear()
    df = _load(registered, server, nx=1, ny=1, attempts=4)
    assert df.count() == len(UBID_BANDS) * N_ACQ
    # every URL was actually retried past its failures
    assert all(n >= 3 for n in ReplayHandler.seen.values())


def test_http_mode_exhausted_retries_raise(server, registered):
    ReplayHandler.fail_first = 10
    ReplayHandler.seen.clear()
    df = _load(registered, server, nx=1, ny=1, attempts=2)
    with pytest.raises(Exception):
        df.count()
    ReplayHandler.fail_first = 0


# ---- /grid + /registry protocol metadata ---------------------------

def test_registry_drives_per_band_decode(server, registered):
    """One band switches to an INT32 wire format, announced only via
    /registry — the reader must decode it per-band (a fixed int16
    decode would misread every raster of that band)."""
    ReplayHandler.fail_first = 0
    ReplayHandler.seen.clear()
    ReplayHandler.band_wire = {"LC08_BTB10": "<i4"}
    try:
        http_df = _load(registered, server)
        synth_df = _load(registered, None)
        h = {tuple(map(str, r)) for r in http_df.collect()}
        s = {tuple(map(str, r)) for r in synth_df.collect()}
        assert h == s
    finally:
        ReplayHandler.band_wire = {}


def test_metadata_off_falls_back_to_dtype_option(server, registered):
    ReplayHandler.fail_first = 0
    ReplayHandler.seen.clear()
    ReplayHandler.band_wire = {}
    df = _load(registered, server, nx=1, ny=1, metadata="off")
    assert df.count() == len(UBID_BANDS) * N_ACQ


def test_grid_endpoint_snap_parity():
    """The recorded /grid geometry must reproduce the recorded
    /grid/snap answer AND the published-constant snap in
    functions/grid.py (the fallback path)."""
    from lcmap_blackmagic_spark.functions.grid import snap
    from lcmap_blackmagic_spark.sources.metadata import parse_grid

    grids = parse_grid(GRID_BODY)
    # recorded response: /grid/snap?x=-2061585&y=1922805 →
    # chip grid (168, 464) proj (-2061585, 1922805);
    # tile grid (3, 9) proj (-2115585, 1964805)
    assert grids["chip"].snap_grid(-2061585, 1922805) == (168, 464)
    assert grids["chip"].snap(-2061585, 1922805) == (-2061585, 1922805)
    assert grids["tile"].snap_grid(-2061585, 1922805) == (3, 9)
    assert grids["tile"].snap(-2061585, 1922805) == (-2115585, 1964805)
    # interior points snap identically to the constant fallback
    for x, y in [(-2061000, 1922000), (0, 0), (-2565585, 3314805),
                 (-1234567, 2345678)]:
        assert grids["chip"].snap(x, y) == snap(x, y, "chip")
        assert grids["tile"].snap(x, y) == snap(x, y, "tile")
    assert grids["chip"].pitch_m == 3000


def test_registry_parse_rejects_unknown_dtype():
    from lcmap_blackmagic_spark.sources.metadata import parse_registry
    with pytest.raises(ValueError, match="unsupported data_type"):
        parse_registry([{"ubid": "X", "data_type": "COMPLEX64"}])
