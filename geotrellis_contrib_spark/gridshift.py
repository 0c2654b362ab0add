"""NTv2 grid-shift datums (.gsb): reader, writer, bilinear application.

The reference accepts arbitrary CRS objects (GeoTiffReprojectRasterSource
.scala:39), which in the proj4 world includes grid-file datums
(``+nadgrids=ntv2_file.gsb`` — the NAD27->NAD83 / OSTN-style family that a
7-parameter Helmert cannot express). This module implements the PUBLIC
NTv2 binary format (National Transformation v2, Geodetic Survey of Canada;
the same layout PROJ consumes):

  * 11 overview records + 11 sub-grid header records, each 16 bytes
    (8-byte ASCII name + 8-byte value; int32 values padded with 4 zero
    bytes), then GS_COUNT node records of 4 float32
    (lat_shift, lon_shift, lat_accuracy, lon_accuracy), all arc-seconds.
  * Longitudes are POSITIVE WEST (E_LONG <= W_LONG numerically); nodes run
    south->north by row and east->west within a row.

Scope is bounded and fail-loud: GS_TYPE=SECONDS only, and points outside
every sub-grid raise — the engine must not silently extrapolate a datum
shift. MULTI-sub-grid files are supported with the standard NTv2
refinement semantics: each point uses the FINEST sub-grid containing it
(children refine parents; real NAD83/NTv2 files nest state grids inside
the national grid).

Application semantics (the published NTv2 convention):
  forward  (FROM datum -> TO datum):  phi' = phi + bilinear(lat_shift)/3600
                                      lam_east' = lam_east - bilinear(lon_shift)/3600
  inverse  (TO -> FROM): pinned fixed-point iteration on the forward.

The bilinear expression tree (row/col scaling, clamped floor, the four
weighted terms summed in w00,w01,w10,w11 order) is mirrored term-for-term
by the ``reproject_nadgrid`` SQL oracle in ``__spark_entry__.py`` — change
one only with the other.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_REC = struct.Struct("<8s8s")       # name + raw 8-byte value
_INT_REC = struct.Struct("<8si4x")  # int32 + 4 pad bytes
_DBL_REC = struct.Struct("<8sd")
_NODE = struct.Struct("<4f")


@dataclass(frozen=True)
class NTv2Grid:
    """One parsed NTv2 sub-grid; bounds/incs in arc-seconds, longitudes
    positive west; shift arrays are float32 [nrows, ncols] arc-seconds."""
    s_lat: float
    n_lat: float
    e_long: float
    w_long: float
    lat_inc: float
    lon_inc: float
    lat_shift: np.ndarray
    lon_shift: np.ndarray

    @property
    def nrows(self) -> int:
        return self.lat_shift.shape[0]

    @property
    def ncols(self) -> int:
        return self.lat_shift.shape[1]


@dataclass(frozen=True)
class NTv2MultiGrid:
    """A multi-sub-grid NTv2 file: sub-grids plus their SUB_NAME/PARENT
    links. Lookup picks the finest containing sub-grid per point."""
    grids: tuple
    names: tuple
    parents: tuple


def _name(sv: str) -> bytes:
    return sv.ljust(8)[:8].encode("ascii")


def _srec(k: str, v: str) -> bytes:
    return _REC.pack(_name(k), _name(v))


def _subgrid_block(sub_name: str, parent: str,
                   s_lat: float, n_lat: float,
                   e_long: float, w_long: float,
                   lat_inc: float, lon_inc: float,
                   lat_shift: np.ndarray, lon_shift: np.ndarray) -> bytes:
    """One sub-grid: 11 header records + GS_COUNT node records."""
    lat_shift = np.asarray(lat_shift, dtype=np.float32)
    lon_shift = np.asarray(lon_shift, dtype=np.float32)
    nrows, ncols = lat_shift.shape
    if lon_shift.shape != (nrows, ncols):
        raise ValueError("lat_shift / lon_shift shape mismatch")
    if nrows != round((n_lat - s_lat) / lat_inc) + 1:
        raise ValueError("nrows inconsistent with S_LAT/N_LAT/LAT_INC")
    if ncols != round((w_long - e_long) / lon_inc) + 1:
        raise ValueError("ncols inconsistent with E_LONG/W_LONG/LONG_INC")
    out = [
        _srec("SUB_NAME", sub_name),
        _srec("PARENT", parent),
        _srec("CREATED", "20260817"),
        _srec("UPDATED", "20260817"),
        _DBL_REC.pack(_name("S_LAT"), float(s_lat)),
        _DBL_REC.pack(_name("N_LAT"), float(n_lat)),
        _DBL_REC.pack(_name("E_LONG"), float(e_long)),
        _DBL_REC.pack(_name("W_LONG"), float(w_long)),
        _DBL_REC.pack(_name("LAT_INC"), float(lat_inc)),
        _DBL_REC.pack(_name("LONG_INC"), float(lon_inc)),
        _INT_REC.pack(_name("GS_COUNT"), nrows * ncols),
    ]
    for i in range(nrows):
        for j in range(ncols):
            out.append(_NODE.pack(float(lat_shift[i, j]),
                                  float(lon_shift[i, j]), 0.0, 0.0))
    return b"".join(out)


def write_ntv2_multi(path: str, subgrids: list,
                     system_f: str = "NAD27",
                     system_t: str = "NAD83") -> None:
    """Write an NTv2 .gsb file with one or more sub-grids. ``subgrids`` is
    a list of dicts with keys sub_name, parent, s_lat, n_lat, e_long,
    w_long, lat_inc, lon_inc, lat_shift, lon_shift (units arc-seconds,
    longitudes positive west, arrays [nrows, ncols] row 0 = S_LAT,
    col 0 = E_LONG)."""
    out = [
        _INT_REC.pack(_name("NUM_OREC"), 11),
        _INT_REC.pack(_name("NUM_SREC"), 11),
        _INT_REC.pack(_name("NUM_FILE"), len(subgrids)),
        _srec("GS_TYPE", "SECONDS"),
        _srec("VERSION", "NTv2.0"),
        _srec("SYSTEM_F", system_f),
        _srec("SYSTEM_T", system_t),
        _DBL_REC.pack(_name("MAJOR_F"), 6378206.4),   # clrk66
        _DBL_REC.pack(_name("MINOR_F"), 6356583.8),
        _DBL_REC.pack(_name("MAJOR_T"), 6378137.0),   # GRS80/WGS84
        _DBL_REC.pack(_name("MINOR_T"), 6356752.314),
    ]
    out.extend(_subgrid_block(**sg) for sg in subgrids)
    out.append(_REC.pack(b"END     ", b"\x00" * 8))
    with open(path, "wb") as f:
        f.write(b"".join(out))


def write_ntv2(path: str, s_lat: float, n_lat: float,
               e_long: float, w_long: float,
               lat_inc: float, lon_inc: float,
               lat_shift: np.ndarray, lon_shift: np.ndarray,
               system_f: str = "NAD27", system_t: str = "NAD83") -> None:
    """Write a single-sub-grid NTv2 .gsb file (all units arc-seconds,
    longitudes positive west, shift arrays [nrows, ncols] row 0 = S_LAT,
    col 0 = E_LONG)."""
    write_ntv2_multi(path, [dict(
        sub_name="SYNTH", parent="NONE", s_lat=s_lat, n_lat=n_lat,
        e_long=e_long, w_long=w_long, lat_inc=lat_inc, lon_inc=lon_inc,
        lat_shift=lat_shift, lon_shift=lon_shift)],
        system_f=system_f, system_t=system_t)


def read_ntv2(path: str):
    """Parse an NTv2 .gsb file. Returns an ``NTv2Grid`` for single-sub-grid
    files (the common case — bit-identical behavior to the original
    reader) or an ``NTv2MultiGrid`` for multi-sub-grid files. Raises on
    non-SECONDS units (bounded, fail-loud scope)."""
    with open(path, "rb") as f:
        data = f.read()

    pos = 0

    def take() -> tuple[str, bytes]:
        nonlocal pos
        if pos + _REC.size > len(data):
            raise ValueError(f"truncated NTv2 file: {path!r}")
        n, v = _REC.unpack_from(data, pos)
        pos += _REC.size
        return n.decode("ascii").strip(), v

    hdr: dict[str, bytes] = {}
    for _ in range(11):
        k, v = take()
        hdr[k] = v
    # detect byte order from NUM_OREC (always 11; PROJ uses the same
    # trick) — real-world .gsb files (NRCan NTv2_0.gsb, OSTN15) are
    # big-endian while this module writes little-endian (r5 ADVICE)
    if struct.unpack("<i", hdr["NUM_OREC"][:4])[0] == 11:
        bo = "<"
    elif struct.unpack(">i", hdr["NUM_OREC"][:4])[0] == 11 \
            or struct.unpack(">i", hdr["NUM_OREC"][4:])[0] == 11:
        # big-endian writers may pad int32 records as 4 zero bytes THEN
        # the value; accept either slot
        bo = ">"
    else:
        raise ValueError(f"cannot detect NTv2 byte order: {path!r}")

    def _int(v: bytes) -> int:
        if bo == "<":
            return struct.unpack("<i", v[:4])[0]
        a = struct.unpack(">i", v[:4])[0]
        return a if a != 0 else struct.unpack(">i", v[4:])[0]

    n_file = _int(hdr["NUM_FILE"])
    if n_file < 1:
        raise ValueError(f"NUM_FILE must be >= 1: {path!r}")
    if hdr["GS_TYPE"].decode("ascii").strip() != "SECONDS":
        raise ValueError(f"NTv2 GS_TYPE must be SECONDS: {path!r}")

    grids, names, parents = [], [], []
    for _ in range(n_file):
        sub: dict[str, bytes] = {}
        for _ in range(11):
            k, v = take()
            sub[k] = v
        dbl = lambda k: struct.unpack(bo + "d", sub[k])[0]  # noqa: E731
        s_lat, n_lat = dbl("S_LAT"), dbl("N_LAT")
        e_long, w_long = dbl("E_LONG"), dbl("W_LONG")
        lat_inc, lon_inc = dbl("LAT_INC"), dbl("LONG_INC")
        count = _int(sub["GS_COUNT"])
        nrows = round((n_lat - s_lat) / lat_inc) + 1
        ncols = round((w_long - e_long) / lon_inc) + 1
        if count != nrows * ncols:
            raise ValueError(f"GS_COUNT {count} != {nrows}x{ncols}: {path!r}")
        if pos + count * _NODE.size > len(data):
            raise ValueError(f"truncated NTv2 file: {path!r}")
        nodes = np.frombuffer(data, dtype=bo + "f4", count=count * 4,
                              offset=pos)
        pos += count * _NODE.size
        nodes = nodes.reshape(count, 4)
        lat_shift = nodes[:, 0].reshape(nrows, ncols).copy()
        lon_shift = nodes[:, 1].reshape(nrows, ncols).copy()
        grids.append(NTv2Grid(s_lat, n_lat, e_long, w_long,
                              lat_inc, lon_inc, lat_shift, lon_shift))
        names.append(sub["SUB_NAME"].decode("ascii").strip())
        parents.append(sub["PARENT"].decode("ascii").strip())
    if n_file == 1:
        return grids[0]
    return NTv2MultiGrid(tuple(grids), tuple(names), tuple(parents))


def _contains(grid: NTv2Grid, lon, lat, eps: float = 1e-9):
    """Inclusive containment mask in the sub-grid's bounds (same eps
    convention as the _bilinear edge landing)."""
    row = (lat * 3600.0 - grid.s_lat) / grid.lat_inc
    col = (-(lon * 3600.0) - grid.e_long) / grid.lon_inc
    return ((row >= -eps) & (row <= grid.nrows - 1 + eps)
            & (col >= -eps) & (col <= grid.ncols - 1 + eps))


def _bilinear_multi(multi: NTv2MultiGrid, lon, lat):
    """Per-point sub-grid selection (the NTv2 refinement rule: the FINEST
    containing sub-grid wins — children refine parents), then the
    single-grid bilinear per selected group."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    sel = np.full(lon.shape, -1, dtype=np.int64)
    # coarsest first so finer grids overwrite where they also contain
    order = sorted(range(len(multi.grids)),
                   key=lambda i: -(multi.grids[i].lat_inc
                                   * multi.grids[i].lon_inc))
    for i in order:
        sel[_contains(multi.grids[i], lon, lat)] = i
    if np.any(sel < 0):
        raise ValueError(
            "point outside every NTv2 sub-grid — the engine will not "
            "extrapolate a datum shift")
    dlat = np.empty_like(lon)
    dlon = np.empty_like(lon)
    for i in np.unique(sel):
        m = sel == i
        a, b = _bilinear(multi.grids[i], lon[m], lat[m])
        dlat[m] = a
        dlon[m] = b
    return dlat, dlon


def _bilinear(grid, lon, lat):
    """(shift_lat_sec, shift_lon_pw_sec) at east-positive degrees lon/lat.
    Expression tree mirrored by the reproject_nadgrid SQL oracle."""
    if isinstance(grid, NTv2MultiGrid):
        return _bilinear_multi(grid, lon, lat)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    row = (lat * 3600.0 - grid.s_lat) / grid.lat_inc
    col = (-(lon * 3600.0) - grid.e_long) / grid.lon_inc
    eps = 1e-9  # grid-edge landings are inside, anything further raises
    if np.any(row < -eps) or np.any(row > grid.nrows - 1 + eps) \
            or np.any(col < -eps) or np.any(col > grid.ncols - 1 + eps):
        raise ValueError(
            "point outside the NTv2 grid — the engine will not extrapolate "
            f"a datum shift (rows {row.min()}..{row.max()}, "
            f"cols {col.min()}..{col.max()})")
    i0 = np.minimum(np.maximum(np.floor(row), 0.0), grid.nrows - 2)
    j0 = np.minimum(np.maximum(np.floor(col), 0.0), grid.ncols - 2)
    fr = row - i0
    fc = col - j0
    ii = i0.astype(np.int64)
    jj = j0.astype(np.int64)
    w00 = (1.0 - fr) * (1.0 - fc)
    w01 = (1.0 - fr) * fc
    w10 = fr * (1.0 - fc)
    w11 = fr * fc

    def interp(g: np.ndarray):
        g64 = g.astype(np.float64)
        return (w00 * g64[ii, jj] + w01 * g64[ii, jj + 1]
                + w10 * g64[ii + 1, jj] + w11 * g64[ii + 1, jj + 1])

    return interp(grid.lat_shift), interp(grid.lon_shift)


def shift_forward(lon, lat, grid: NTv2Grid):
    """FROM-datum -> TO-datum (e.g. NAD27 -> NAD83): add the interpolated
    shifts. Input/output east-positive degrees."""
    dlat, dlon_pw = _bilinear(grid, lon, lat)
    return (np.asarray(lon, dtype=np.float64) - dlon_pw / 3600.0,
            np.asarray(lat, dtype=np.float64) + dlat / 3600.0)


# pinned iteration count (not SQL-gated): converges at (grid gradient)^k.
# Real NAD/OSTN grids have gradients ~1e-4 (4 iterations suffice); the
# synthetic test grid amplifies shifts to make the value gate bite, giving
# gradients ~0.3 — 24 iterations keep the round trip under 1e-9 degrees.
_INVERSE_ITERS = 24


def shift_inverse(lon, lat, grid: NTv2Grid):
    """TO-datum -> FROM-datum: pinned fixed-point iteration on the forward
    (the published NTv2 inverse procedure)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    cur_lon, cur_lat = lon.copy(), lat.copy()
    for _ in range(_INVERSE_ITERS):
        f_lon, f_lat = shift_forward(cur_lon, cur_lat, grid)
        cur_lon = cur_lon + (lon - f_lon)
        cur_lat = cur_lat + (lat - f_lat)
    return cur_lon, cur_lat
