"""PyCCD adapter contract: with a fake ``ccd`` module standing in for
lcmap-pyccd (not installed here), the adapter must (a) call
``ccd.detect`` with merlin's parallel-array keyword names, and (b)
flatten a ccdresult into segment rows field-for-field the way the
reference's ``format()`` does (blackmagic/blueprints/segment.py:61-104):
multi-model pixels → N rows, ordinal days → ISO, absent fields →
the documented defaults, model-less pixels → one default segment."""

import datetime
import sys
import types

import numpy as np
import pytest

from lcmap_blackmagic_spark.plans.pyccd import (format_ccd_result,
                                                pyccd_available,
                                                pyccd_detector)

SPECTRA = ("blue", "green", "red", "nir", "swir1", "swir2", "thermal")


def _band(i):
    return {"magnitude": 10.0 + i, "rmse": 0.5 * i, "intercept": 100.0 * i,
            "coefficients": [float(i), 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]}


CANNED = {
    "processing_mask": [1, 1, 0, 1],
    "change_models": [
        # full model: every field present, 7 harmonic coefs per band
        {"start_day": 726000, "end_day": 726500, "break_day": 726501,
         "change_probability": 0.87, "curve_qa": 8,
         **{s: _band(i) for i, s in enumerate(SPECTRA, start=1)}},
        # sparse model: missing break_day/curve_qa, empty blue dict,
        # thermal absent entirely -> reference defaults
        {"start_day": 726502, "end_day": 727000,
         "change_probability": 0.0, "blue": {},
         **{s: _band(9) for s in ("green", "red", "nir", "swir1", "swir2")}},
    ],
}


def _iso(ordinal):
    return datetime.date.fromordinal(ordinal).isoformat()


def test_pyccd_not_installed_here():
    # the container has no lcmap-pyccd; the adapter must report that
    # honestly rather than half-working
    assert not pyccd_available()


def test_adapter_calls_ccd_with_merlin_kwargs(monkeypatch):
    seen = {}

    def fake_detect(**kwargs):
        seen.update(kwargs)
        return CANNED

    fake = types.ModuleType("ccd")
    fake.detect = fake_detect
    monkeypatch.setitem(sys.modules, "ccd", fake)

    dates = np.arange(726000, 726010)
    bands = {s: np.full(10, i, dtype=np.int64)
             for i, s in enumerate(SPECTRA)}
    qas = np.zeros(10, dtype=np.int64)
    segs = pyccd_detector(dates, bands, qas)

    # merlin's keyword names, exactly (segment.py:109-116)
    assert set(seen) == {"dates", "blues", "greens", "reds", "nirs",
                         "swir1s", "swir2s", "thermals", "qas"}
    assert list(seen["dates"]) == list(dates)
    assert list(seen["swir1s"]) == [4] * 10
    assert len(segs) == 2


def test_format_parity_field_for_field():
    segs = format_ccd_result(CANNED)
    full, sparse = segs

    assert (full["sday"], full["eday"], full["bday"]) == (
        726000, 726500, 726501)
    assert full["chprob"] == 0.87 and full["curqa"] == 8
    assert full["bl"]["magnitude"] == 11.0
    assert full["th"]["intercept"] == 700.0
    assert full["gr"]["coefficients"] == [2.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]

    # reference defaults: break_day -> 1, curve_qa -> 0, empty band
    # dict -> zero scalars + [] coefficients (segment.py:55-58, 68-70)
    assert sparse["bday"] == 1 and sparse["curqa"] == 0
    assert sparse["bl"] == {"magnitude": 0.0, "rmse": 0.0,
                            "intercept": 0.0, "coefficients": []}
    assert sparse["th"] == {"magnitude": 0.0, "rmse": 0.0,
                            "intercept": 0.0, "coefficients": []}

    # model-less result -> [] so detect() emits the default segment
    assert format_ccd_result({"change_models": []}) == []
    assert format_ccd_result({}) == []


def canned_detector(dates, bands, qas):
    """Picklable stand-in used on executors: the short-series pixel
    gets no models (default-segment path), the other the canned
    two-model result."""
    if len(dates) < 5:
        return []
    return format_ccd_result(CANNED)


@pytest.fixture(scope="module")
def detections(spark):
    rows = [
        # 10-obs pixel -> two segments from CANNED
        (100, 200, 100, 200, list(range(726000, 726010)),
         *[[i] * 10 for i in range(1, 8)], [0] * 10),
        # 3-obs pixel -> default segment
        (100, 200, 130, 170, [726000, 726001, 726002],
         *[[i] * 3 for i in range(1, 8)], [0] * 3),
    ]
    schema = ("cx long, cy long, px long, py long, dates array<int>, "
              "blues array<int>, greens array<int>, reds array<int>, "
              "nirs array<int>, swir1s array<int>, swir2s array<int>, "
              "thermals array<int>, qas array<int>")
    ts = spark.createDataFrame(rows, schema)
    from lcmap_blackmagic_spark.plans.segment import detect
    return detect(ts, detector=canned_detector).collect()


def test_spark_projection_multi_model_pixel(detections):
    rows = sorted([r for r in detections if r["px"] == 100],
                  key=lambda r: r["sday"])
    assert len(rows) == 2
    full, sparse = rows[0], rows[1]
    assert full["sday"] == _iso(726000)
    assert full["eday"] == _iso(726500)
    assert full["bday"] == _iso(726501)
    assert full["chprob"] == 0.87 and full["curqa"] == 8
    assert full["blmag"] == 11.0
    assert full["thrmse"] == 3.5
    assert list(full["recoef"]) == [3.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
    # sparse model's defaults flow through the 38-col projection
    assert sparse["bday"] == _iso(1)
    assert sparse["blint"] == 0.0 and list(sparse["blcoef"]) == []


def test_spark_projection_default_segment(detections):
    rows = [r for r in detections if r["px"] == 130]
    assert len(rows) == 1
    d = rows[0]
    assert d["sday"] == d["eday"] == d["bday"] == "0001-01-01"
    assert d["chprob"] == 0.0 and d["curqa"] == 0
    assert d["s2mag"] == 0.0 and list(d["s2coef"]) == []
