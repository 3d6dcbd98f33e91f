"""Chipmunk ``/grid`` + ``/registry`` protocol metadata.

The reference's merlin client fetches grid geometry and band specs
from the service instead of hard-coding them (recorded responses in
the reference's deps/nginxcache: KEYs ``/grid``, ``/grid/snap``,
``/registry``). This module gives the engine the same capability:

- ``/grid`` returns one definition per grain (``tile``/``chip``) with
  an affine snap: ``grid_col = floor((x·rx + tx) / sx)``,
  ``grid_row = floor((y·ry + ty) / sy)``, inverse
  ``proj_x = (col·sx − tx) / rx``. The recorded chip definition
  (rx=1, ry=−1, sx=sy=3000, tx=2565585, ty=3314805) reproduces the
  recorded ``/grid/snap`` answer for (−2061585, 1922805) →
  grid (168, 464), proj (−2061585, 1922805).
- ``/registry`` returns per-ubid band specs: ``data_type`` (INT16 /
  FLOAT32 / BYTE / ...), ``data_fill``, ``data_shape``.

In http mode the chipmunk DataSource fetches both once on the driver
and decodes each band with its registered dtype; the published USGS
ARD Albers constants (functions/grid.py) remain the fallback when the
service omits a grain or the fetch fails.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# service data_type → numpy dtype (little-endian, the recorded wire
# format). BYTE is the service's name for unsigned 8-bit.
DTYPE_MAP = {
    "INT8": "int8",
    "BYTE": "uint8",
    "UINT8": "uint8",
    "INT16": "<i2",
    "UINT16": "<u2",
    "INT32": "<i4",
    "UINT32": "<u4",
    "FLOAT32": "<f4",
    "FLOAT64": "<f8",
}


@dataclass(frozen=True)
class GridDef:
    """One ``/grid`` entry: affine grid ↔ projection transform."""
    name: str
    rx: float
    ry: float
    sx: float
    sy: float
    tx: float
    ty: float

    def snap_grid(self, x: float, y: float) -> tuple[int, int]:
        """Projection point → containing cell's (col, row)."""
        return (math.floor((x * self.rx + self.tx) / self.sx),
                math.floor((y * self.ry + self.ty) / self.sy))

    def to_proj(self, col: int, row: int) -> tuple[float, float]:
        """Cell (col, row) → its anchor point in projection meters."""
        return ((col * self.sx - self.tx) / self.rx,
                (row * self.sy - self.ty) / self.ry)

    def snap(self, x: float, y: float) -> tuple[int, int]:
        """``/grid/snap`` parity: the cell anchor containing (x, y)."""
        px, py = self.to_proj(*self.snap_grid(x, y))
        return int(px), int(py)

    @property
    def pitch_m(self) -> int:
        """Cell pitch in projection meters (sx; chip grain → 3000)."""
        return int(self.sx)


@dataclass(frozen=True)
class BandSpec:
    """One ``/registry`` entry: how to decode a ubid's rasters."""
    ubid: str
    dtype: str            # numpy dtype string, wire byte order
    fill: int | float | None
    shape: tuple[int, int]


def parse_grid(grids: list[dict]) -> dict[str, GridDef]:
    """``/grid`` response body → {name: GridDef}."""
    return {g["name"]: GridDef(
        name=g["name"], rx=float(g["rx"]), ry=float(g["ry"]),
        sx=float(g["sx"]), sy=float(g["sy"]),
        tx=float(g["tx"]), ty=float(g["ty"])) for g in grids}


def parse_registry(entries: list[dict]) -> dict[str, BandSpec]:
    """``/registry`` response body → {ubid: BandSpec}. Unknown
    data_type values raise — decoding with a guessed width would
    silently corrupt every raster of that band."""
    out: dict[str, BandSpec] = {}
    for e in entries:
        dt = (e.get("data_type") or "").upper()
        if dt not in DTYPE_MAP:
            raise ValueError(f"/registry ubid {e.get('ubid')!r} has "
                             f"unsupported data_type {dt!r}")
        fill = e.get("data_fill")
        if fill is not None:
            fill = float(fill) if "FLOAT" in dt else int(fill)
        shape = tuple(e.get("data_shape") or (100, 100))
        out[e["ubid"]] = BandSpec(ubid=e["ubid"], dtype=DTYPE_MAP[dt],
                                  fill=fill, shape=shape)
    return out


def fetch_grid(url: str, **retry) -> dict[str, GridDef]:
    from .chipmunk import _get_json
    return parse_grid(_get_json(f"{url}/grid", **retry))


def fetch_registry(url: str, **retry) -> dict[str, BandSpec]:
    from .chipmunk import _get_json
    return parse_registry(_get_json(f"{url}/registry", **retry))
