"""Grid math (/grid + /grid/snap parity) and the tile-only request
shape: a /tile job naming just (tx, ty) must expand to the 2500-chip
grid the reference fetches from Chipmunk."""

import pytest

from lcmap_blackmagic_spark.api import (ValidationError, run_tile_job,
                                        validate_tile_params)
from lcmap_blackmagic_spark.functions.grid import (CHIP_M, GRID_X0, GRID_Y0,
                                                   TILE_M, chips_for_tile,
                                                   snap, tile_hv, tile_ul)


def test_tile_ul_hv_roundtrip():
    assert tile_ul(0, 0) == (GRID_X0, GRID_Y0)
    for h, v in [(0, 0), (3, 7), (32, 21)]:
        assert tile_hv(*tile_ul(h, v)) == (h, v)
    with pytest.raises(ValueError):
        tile_hv(GRID_X0 + 1, GRID_Y0)


def test_chips_for_tile_row_major_2500():
    tx, ty = tile_ul(3, 7)
    chips = chips_for_tile(tx, ty)
    assert len(chips) == 2500 and len(set(chips)) == 2500
    assert chips[0] == (tx, ty)
    assert chips[1] == (tx + CHIP_M, ty)          # row-major: x varies first
    assert chips[50] == (tx, ty - CHIP_M)
    assert chips[-1] == (tx + 49 * CHIP_M, ty - 49 * CHIP_M)
    # every chip snaps back into this tile
    assert all(snap(cx, cy, "tile") == (tx, ty) for cx, cy in chips[:120])
    with pytest.raises(ValueError):
        chips_for_tile(tx + CHIP_M, ty)  # chip corner, not a tile corner


def test_snap_chip_and_tile():
    tx, ty = tile_ul(5, 2)
    # interior point of the 4th chip in row 3
    x = tx + 3 * CHIP_M + 1234.5
    y = ty - 2 * CHIP_M - 999.0
    assert snap(x, y, "chip") == (tx + 3 * CHIP_M, ty - 2 * CHIP_M)
    assert snap(x, y, "tile") == (tx, ty)
    # a chip UL snaps to itself; the southern edge belongs to the
    # next chip down
    assert snap(tx, ty, "chip") == (tx, ty)
    assert snap(tx, ty - CHIP_M, "chip") == (tx, ty - CHIP_M)


def test_validate_tile_params_expands_tile_only_request():
    tx, ty = tile_ul(10, 5)
    p = validate_tile_params({"tx": tx, "ty": ty,
                              "acquired": "1982/2017",
                              "date": "2001-07-01"})
    assert len(p["chips"]) == 2500 and p["chips"][0] == (tx, ty)
    with pytest.raises(ValidationError):
        validate_tile_params({"tx": tx + 1, "ty": ty,
                              "acquired": "1982/2017",
                              "date": "2001-07-01"})


def test_run_tile_job_with_tile_only_request(spark, tmp_path):
    tx, ty = tile_ul(10, 5)
    resp = run_tile_job(spark,
                        {"tx": tx, "ty": ty, "acquired": "1982/2017",
                         "date": "2001-07-01"},
                        str(tmp_path), target_samples=50, class_min=2,
                        class_max=20)
    assert resp["status"] == 200
    assert resp["chips"] == 2500
