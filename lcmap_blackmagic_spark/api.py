"""Job-level API mirroring the reference's three request shapes.

The reference is an HTTP server: parameter validation returns 400
(P8 — segment.py:146-163, tile.py:151-170, prediction.py:246-281),
any stage failure returns 500 naming the stage, and a failed request
must leave NO partial writes (UD5 — the skip_on_exception /
raise_on / exception_handler decorators at __init__.py:33-68; the
test contract at test_A_segment.py:159-194).

Here a "request" is a job: validation raises ``ValidationError``
(→ 400), stages run in order and wrap failures in ``StageError``
(→ 500, stage named). No-partial-writes holds structurally: every
stage before ``save`` only BUILDS a lazy plan, and the save stage is
a single dynamic-partition-overwrite job — Spark commits it
atomically via the output committer, so a failure in any stage
(including save itself) leaves prior data intact. The reference
needed explicit deletes + ordered puts for the same guarantee.

``test_exception`` reproduces the reference's fault-injection
parameter (segment.py:151-153): name a stage to force it to raise.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

RESPONSE_OK = 200
RESPONSE_BAD_REQUEST = 400
RESPONSE_SERVER_ERROR = 500

_ACQUIRED_RE = re.compile(r"^\d{4}(-\d{2}-\d{2})?/\d{4}(-\d{2}-\d{2})?$")


class ValidationError(Exception):
    """Bad request parameters — HTTP 400 in the reference."""
    http_status = RESPONSE_BAD_REQUEST


class StageError(Exception):
    """A pipeline stage failed — HTTP 500, stage named (UD5)."""
    http_status = RESPONSE_SERVER_ERROR

    def __init__(self, stage: str, cause: Exception):
        super().__init__(f"stage {stage!r} failed: {cause}")
        self.stage = stage
        self.cause = cause


def _require_int(params: dict, key: str) -> int:
    if key not in params:
        raise ValidationError(f"missing parameter: {key}")
    try:
        return int(params[key])
    except (TypeError, ValueError):
        raise ValidationError(f"parameter {key} must be an integer")


def _require_acquired(params: dict) -> str:
    v = params.get("acquired")
    if not isinstance(v, str) or not _ACQUIRED_RE.match(v):
        raise ValidationError(
            "parameter acquired must be 'YYYY[-MM-DD]/YYYY[-MM-DD]'")
    return v


def validate_segment_params(params: dict) -> dict:
    """P8 for /segment: cx, cy, acquired (segment.py:146-163)."""
    return {"cx": _require_int(params, "cx"),
            "cy": _require_int(params, "cy"),
            "acquired": _require_acquired(params)}


def validate_tile_params(params: dict) -> dict:
    """P8 for /tile: tx, ty, acquired, date, chips (tile.py:151-170)."""
    out = {"tx": _require_int(params, "tx"),
           "ty": _require_int(params, "ty"),
           "acquired": _require_acquired(params)}
    date = params.get("date")
    if not isinstance(date, str) or not re.match(r"^\d{4}-\d{2}-\d{2}$", date):
        raise ValidationError("parameter date must be 'YYYY-MM-DD'")
    out["date"] = date
    chips = params.get("chips")
    if not isinstance(chips, (list, tuple)) or not chips:
        raise ValidationError("parameter chips must be a non-empty list")
    out["chips"] = [(int(x), int(y)) for x, y in chips]
    return out


def validate_prediction_params(params: dict) -> dict:
    """P8 for /prediction (prediction.py:246-281)."""
    out = {k: _require_int(params, k) for k in ("tx", "ty", "cx", "cy")}
    out["acquired"] = _require_acquired(params)
    out["month"] = _require_int(params, "month")
    out["day"] = _require_int(params, "day")
    if not 1 <= out["month"] <= 12:
        raise ValidationError("month out of range")
    if not 1 <= out["day"] <= 31:
        raise ValidationError("day out of range")
    return out


def run_stages(ctx: Any, stages: list[tuple[str, Callable[[Any], Any]]],
               test_exception: str | None = None) -> Any:
    """Execute stages in order, threading the context (the reference's
    thread_first over a ctx dict — here usually a DataFrame or a small
    state object). First failure wraps in StageError and aborts the
    remaining stages, like skip_on_exception poisoning the ctx."""
    for name, fn in stages:
        if test_exception == name:
            raise StageError(name, RuntimeError("test_exception"))
        try:
            ctx = fn(ctx)
        except (ValidationError, StageError):
            raise
        except Exception as e:
            raise StageError(name, e) from e
    return ctx


def run_segment_job(spark, params: dict, storage_root: str,
                    ard=None, side: int = 10,
                    test_exception: str | None = None) -> dict:
    """/segment as a job (segment.py:253-264 stage order): validate →
    timeseries → nodata guard → detection → save (chip + pixel +
    segment partitions, dynamic overwrite). ``ard`` defaults to the
    chip's synthetic fixture; pass a real scan in production."""
    from . import storage
    from .plans.segment import (chip_record, detect, pixel_records,
                                pixel_timeseries)
    from .sources.fixtures import synth_ard

    p = validate_segment_params(params)

    def load(ctx):
        a = ard if ard is not None else synth_ard(
            spark, cx=p["cx"], cy=p["cy"], side=side)
        return {"ard": a}

    def timeseries(ctx):
        ctx["ts"] = pixel_timeseries(ctx["ard"], side=side)
        return ctx

    def nodata(ctx):
        # P2: the reference 500s when merlin returns nothing
        # (segment.py:178-184)
        if ctx["ts"].isEmpty():
            raise ValueError("no timeseries data")
        return ctx

    def detection(ctx):
        ctx["detections"] = detect(ctx["ts"])
        return ctx

    def save(ctx):
        storage.overwrite_partitions(ctx["detections"], storage_root,
                                     "segment")
        storage.overwrite_partitions(chip_record(ctx["detections"]),
                                     storage_root, "chip")
        storage.overwrite_partitions(pixel_records(ctx["ts"]),
                                     storage_root, "pixel")
        return ctx

    try:
        run_stages(None, [("load", load), ("timeseries", timeseries),
                          ("nodata", nodata), ("detection", detection),
                          ("save", save)], test_exception)
    except StageError as e:
        return respond(p, e)
    return respond(p)


def respond(params: dict, error: Exception | None = None) -> dict:
    """Response shape parity: echo of params + status (+message)."""
    if error is None:
        return {"status": RESPONSE_OK, **params}
    return {"status": getattr(error, "http_status", RESPONSE_SERVER_ERROR),
            "message": str(error), **params}
