"""PyCCD detector adapter — the reference's science core plugged into
the engine's per-pixel detector contract.

Reference semantics mirrored here (blackmagic/blueprints/segment.py):
- ``detect()`` (segment.py:107-116) calls ``ccd.detect(**timeseries)``
  with merlin's parallel arrays: dates, blues, greens, reds, nirs,
  swir1s, swir2s, thermals, qas.
- ``format()`` (segment.py:61-104) flattens every change model into a
  segment record: start/end/break days default to ordinal 1 (→
  '0001-01-01'), magnitudes/rmse/intercepts default 0.0, coefficient
  lists default [] (segment.py:55-58 coefficients()), and a pixel
  with NO change models yields exactly one default segment
  (segment.py:52-53 defaults()).

The engine's contract (plans/segment.py): a detector takes one
pixel's (dates, {spectra: values}, qas) and returns a list of segment
dicts with ordinal days; an empty list makes ``detect()`` emit the
default segment. This adapter translates a PyCCD ``ccdresult`` into
that shape, so ``detect(ts, detector=pyccd_detector)`` runs real
PyCCD wherever ``import ccd`` resolves (the reference pins
lcmap-pyccd==2018.10.17, setup.py:33 — not in this container, so the
adapter is import-guarded exactly like ml/train's xgboost path and
contract-tested against a fake ``ccd`` module).
"""

from __future__ import annotations

import numpy as np

from ..sources.fixtures import UBID_BANDS  # noqa: F401  (shared vocab)

SPEC_TO_SHORT = {"blue": "bl", "green": "gr", "nir": "ni", "red": "re",
                 "swir1": "s1", "swir2": "s2", "thermal": "th"}

# merlin's plural keyword names, in ccd.detect's signature order
SPEC_TO_PLURAL = {"blue": "blues", "green": "greens", "red": "reds",
                  "nir": "nirs", "swir1": "swir1s", "swir2": "swir2s",
                  "thermal": "thermals"}


def pyccd_available() -> bool:
    try:
        import ccd  # noqa: F401
        return True
    except ImportError:
        return False


def format_ccd_result(ccdresult: dict) -> list[dict]:
    """``format()`` parity (segment.py:61-104), minus the key columns
    the engine adds downstream: one segment dict per change model,
    with the reference's defaults for absent fields. Returns [] for a
    model-less result — the engine's ``detect()`` turns that into the
    single default segment, same as ``defaults()`` (segment.py:52-53).
    """
    models = (ccdresult or {}).get("change_models") or []
    out = []
    for cm in models:
        seg = {
            "sday": int(cm.get("start_day", 1)),
            "eday": int(cm.get("end_day", 1)),
            "bday": int(cm.get("break_day", 1)),
            "chprob": float(cm.get("change_probability", 0.0)),
            "curqa": int(cm.get("curve_qa", 0)),
        }
        for spec, short in SPEC_TO_SHORT.items():
            b = cm.get(spec) or {}
            coefs = b.get("coefficients")
            seg[short] = {
                "magnitude": float(b.get("magnitude", 0.0)),
                "rmse": float(b.get("rmse", 0.0)),
                "intercept": float(b.get("intercept", 0.0)),
                # list(coefs) if coefs else [] — segment.py:55-58
                "coefficients": [float(c) for c in coefs] if coefs else [],
            }
        out.append(seg)
    return out


def pyccd_detector(dates: np.ndarray, bands: dict[str, np.ndarray],
                   qas: np.ndarray) -> list[dict]:
    """Drop-in detector running real PyCCD: same signature as
    ``stub_detector``, so ``detect(ts, detector=pyccd_detector)`` and
    ``run_segment_job(..., detector=pyccd_detector)`` swap the
    science core without touching the plan. Import happens inside the
    call so the dependency is resolved on the executor, where the
    work runs."""
    import ccd
    kwargs = {"dates": np.asarray(dates), "qas": np.asarray(qas)}
    for spec, plural in SPEC_TO_PLURAL.items():
        kwargs[plural] = np.asarray(bands[spec])
    return format_ccd_result(ccd.detect(**kwargs))
