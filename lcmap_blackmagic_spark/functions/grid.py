"""CONUS ARD grid math — the Chipmunk ``/grid`` + ``/grid/snap``
services as pure functions (no service in this environment; the
constants are the published USGS ARD Albers grid, visible in the
reference at references/xg-classify-annualized.py:244-248 hv_affine
and data/ceph.py:39's 2500-chips-per-tile layout).

Layout: tiles are 5000×5000 30 m pixels (150 km pitch) anchored at
(-2565585, 3314805); each tile holds 50×50 chips of 100×100 pixels
(3 km pitch). ``tx, ty`` / ``cx, cy`` name a tile's / chip's
upper-left corner in projection meters.

These enable the request shape the reference gets from Chipmunk:
a job can name a tile (or an arbitrary point) and the engine expands
it to the chip keys — no HTTP round-trip, no driver loop."""

from __future__ import annotations

import math

GRID_X0 = -2565585
GRID_Y0 = 3314805
PIXEL_M = 30
TILE_M = 5000 * PIXEL_M   # 150 km
CHIP_M = 100 * PIXEL_M    # 3 km
CHIPS_PER_TILE_SIDE = TILE_M // CHIP_M  # 50


def tile_ul(h: int, v: int) -> tuple[int, int]:
    """(h, v) tile index → upper-left (tx, ty) — hv_affine parity."""
    return GRID_X0 + h * TILE_M, GRID_Y0 - v * TILE_M


def tile_hv(tx: int, ty: int) -> tuple[int, int]:
    """Inverse of ``tile_ul``; requires exact tile-grid coordinates."""
    qx, rx = divmod(tx - GRID_X0, TILE_M)
    qy, ry = divmod(GRID_Y0 - ty, TILE_M)
    if rx or ry:
        raise ValueError(f"({tx}, {ty}) is not a tile upper-left corner")
    return qx, qy


def snap(x: float, y: float, grain: str = "chip") -> tuple[int, int]:
    """``/grid/snap`` parity: the containing chip's (or tile's)
    upper-left corner for an arbitrary projection point. Floor
    semantics on both axes (y decreases southward)."""
    pitch = {"chip": CHIP_M, "tile": TILE_M}[grain]
    sx = GRID_X0 + math.floor((x - GRID_X0) / pitch) * pitch
    sy = GRID_Y0 - math.floor((GRID_Y0 - y) / pitch) * pitch
    return int(sx), int(sy)


def chips_for_tile(tx: int, ty: int) -> list[tuple[int, int]]:
    """Tile → its 2500 chip upper-lefts, row-major (the reference's
    ``range(0, 5000, 100)`` double loop over rows/cols,
    xg-classify-annualized.py:426-429). Validates the tile corner so
    a mis-snapped request fails loudly instead of producing 2500
    off-grid chip keys."""
    tile_hv(tx, ty)
    return [(tx + i * CHIP_M, ty - j * CHIP_M)
            for j in range(CHIPS_PER_TILE_SIDE)
            for i in range(CHIPS_PER_TILE_SIDE)]
