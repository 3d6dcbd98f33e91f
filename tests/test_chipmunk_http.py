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


class ReplayHandler(BaseHTTPRequestHandler):
    """Serves /chips from the synthetic generator in the reference's
    recorded response shape. ``fail_first`` makes the first N requests
    per distinct URL return 503 (exercises the bounded retry)."""

    fail_first = 0
    seen: dict = defaultdict(int)
    lock = threading.Lock()

    def log_message(self, *a):  # silence request logging
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
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
        chips = []
        for u, cx, cy, acquired, data in synth_chip_rows(
                x, y, side=SIDE, n_acq=N_ACQ):
            if u != ubid:
                continue
            raw = np.asarray(data, dtype="<i2").tobytes()
            chips.append({
                "x": cx, "y": cy,
                "acquired": acquired.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "data": base64.b64encode(raw).decode("ascii"),
            })
        body = json.dumps(chips).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


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
