"""Plumed-1 grid-file I/O and the LAMMPS tabular-potential writer.

Bit-compatibility targets (reference lib/grid.h:448-503 writer,
lib/grid.h:712-835 reader; LAMMPS table at lib/grid.h:583-592,650-667):

* header: ``#! FORCE/NVAR/TYPE/BIN/MIN/MAX/PBC`` with non-periodic dims
  *deflated* (BIN = n-1, MAX = max-dx) and re-inflated on read;
* data rows: dim-0-fastest ordering, fixed 8-decimal, derivative sign
  flipped on write AND on read (grid.h:494,828);
* a blank line every time the fastest index resets (grid.h:498-499).

These run host-side on numpy — grid writes are strided rarely; the reference's
per-point MPI_Allreduce "multi_write" collapses to a device->host gather plus
one ordinary write (SURVEY.md §3.5).
"""

from __future__ import annotations

import io
from typing import Tuple

import numpy as np

from ..grid import Grid, GridSpec
from .errors import edm_error

GRID_TYPE = 32


def _fmt_g(v: float) -> str:
    """C++ default ostream double formatting (~ %.6g)."""
    return f"{v:.6g}"


def _header_lines(spec: GridSpec, has_derivs: bool) -> str:
    D = spec.dim
    out = io.StringIO()
    out.write(f"#! FORCE {1 if has_derivs else 0}\n")
    out.write(f"#! NVAR {D}\n")
    out.write("#! TYPE " + "".join(f"{GRID_TYPE} " for _ in range(D)) + "\n")
    out.write("#! BIN ")
    for d in range(D):
        out.write(f"{spec.nbins[d] if spec.periodic[d] else spec.nbins[d] - 1} ")
    out.write("\n#! MIN ")
    for d in range(D):
        out.write(_fmt_g(spec.min[d]) + " ")
    out.write("\n#! MAX ")
    for d in range(D):
        out.write(_fmt_g(spec.max[d] if spec.periodic[d] else spec.max[d] - spec.dx[d]) + " ")
    out.write("\n#! PBC ")
    for d in range(D):
        out.write(f"{1 if spec.periodic[d] else 0} ")
    out.write("\n")
    return out.getvalue()


def write_grid(grid: Grid, filename: str) -> None:
    """Write a grid in Plumed-1 format (reference grid.h:448-503).

    Uses the native C++ writer (edm_tpu.native) when available — the text
    formatting of large (1e6-point) grids is the slow host-side path — with
    a pure-Python fallback."""
    spec = grid.spec
    D = spec.dim
    values = np.asarray(grid.values, dtype=np.float64)
    flat = values.reshape(-1, order="F")  # dim 0 fastest == reference multi2one
    if grid.has_derivatives:
        derivs = np.asarray(grid.derivs, dtype=np.float64)
        dflat = derivs.reshape(-1, D, order="F")

    from .. import native

    lib = native.load()
    if lib is not None:
        import ctypes

        nbins_file = np.asarray(
            [spec.nbins[d] if spec.periodic[d] else spec.nbins[d] - 1 for d in range(D)],
            np.int64,
        )
        min_file = np.asarray(spec.min, np.float64)
        max_file = np.asarray(
            [spec.max[d] if spec.periodic[d] else spec.max[d] - spec.dx[d] for d in range(D)],
            np.float64,
        )
        pbc = np.asarray([1 if p else 0 for p in spec.periodic], np.int32)
        dx = np.asarray(spec.dx, np.float64)
        gmin = np.asarray(spec.min, np.float64)
        nbins_mem = np.asarray(spec.nbins, np.int64)
        vals = np.ascontiguousarray(flat)
        ders = (
            np.ascontiguousarray(dflat.reshape(-1))
            if grid.has_derivatives
            else np.zeros(1)
        )

        def p(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        rc = lib.edm_write_grid(
            filename.encode(), D,
            p(nbins_file, ctypes.c_long), p(min_file, ctypes.c_double),
            p(max_file, ctypes.c_double), p(pbc, ctypes.c_int),
            p(dx, ctypes.c_double), p(gmin, ctypes.c_double),
            flat.size, p(nbins_mem, ctypes.c_long),
            p(vals, ctypes.c_double), p(ders, ctypes.c_double),
            1 if grid.has_derivatives else 0,
        )
        if rc == 0:
            return

    with open(filename, "w") as f:
        f.write(_header_lines(spec, grid.has_derivatives))
        # precompute coordinates per flattened point
        idx = np.unravel_index(np.arange(flat.size), spec.nbins, order="F")
        coords = [spec.min[d] + spec.dx[d] * idx[d] for d in range(D)]
        n0 = spec.nbins[0]
        buf = io.StringIO()
        for i in range(flat.size):
            for d in range(D):
                buf.write(f"{coords[d][i]:.8f} ")
            buf.write(f"{flat[i]:.8f} ")
            if grid.has_derivatives:
                for d in range(D):
                    buf.write(f"{-dflat[i, d]:.8f} ")
            buf.write("\n")
            if idx[0][i] == n0 - 1:
                buf.write("\n")
        f.write(buf.getvalue())


def read_grid_file(filename: str, dim: int = None, interpolate: bool = False, dtype=np.float32) -> Grid:
    """Read a Plumed-1 grid file (reference grid.h:712-835).

    ``dim`` optional cross-check (reference errors on mismatch).
    """
    with open(filename) as f:
        tokens = f.read().split()
    it = iter(tokens)

    def expect(tag: str):
        t1, t2 = next(it), next(it)
        if t2 != tag:
            edm_error(f"Mangled grid file {filename}: no {tag} found", "gridio:read")

    expect("FORCE")
    has_derivs = int(next(it)) != 0
    expect("NVAR")
    D = int(next(it))
    if dim is not None and D != dim:
        edm_error("Dimension of this grid does not match the one found in the file", "gridio:read")
    expect("TYPE")
    for _ in range(D):
        next(it)
    expect("BIN")
    nbins = [int(next(it)) for _ in range(D)]
    expect("MIN")
    mins = [float(next(it)) for _ in range(D)]
    expect("MAX")
    maxs = [float(next(it)) for _ in range(D)]
    expect("PBC")
    pbc = [int(next(it)) != 0 for _ in range(D)]

    spec = GridSpec.from_deflated(mins, maxs, nbins, pbc)
    size = spec.grid_size
    flat = np.zeros(size, dtype=np.float64)
    dflat = np.zeros((size, D), dtype=np.float64) if has_derivs else None

    from .. import native

    lib = native.load()
    done = False
    if lib is not None:
        import ctypes

        dbuf = dflat.reshape(-1) if has_derivs else np.zeros(1)
        got = lib.edm_read_grid_data(
            filename.encode(), D, size, 1 if has_derivs else 0,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            dbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if got == size:
            if has_derivs:
                dflat = dbuf.reshape(size, D)
            done = True
    if not done:
        for i in range(size):
            for _ in range(D):
                next(it)  # skip coordinates
            flat[i] = float(next(it))
            if has_derivs:
                for d in range(D):
                    dflat[i, d] = -float(next(it))  # sign flip on read (grid.h:828)

    values = flat.reshape(spec.nbins, order="F").astype(dtype)
    derivs = (
        dflat.reshape(spec.nbins + (D,), order="F").astype(dtype)
        if has_derivs
        else None
    )
    import jax.numpy as jnp

    return Grid(
        values=jnp.asarray(values),
        derivs=None if derivs is None else jnp.asarray(derivs),
        spec=spec,
        interpolate=interpolate,
    )


def write_lammps_table(
    grid: Grid,
    filename: str,
    box_min: Tuple[float, ...],
    box_max: Tuple[float, ...],
) -> None:
    """Write a 1-D grid as a LAMMPS tabular potential ``<name>.ltab``
    (reference grid.h:516-517,537-538,583-592,650-667): header, zero-padded
    rows from r=0 to the grid start, then ``index r energy force`` rows.
    """
    spec = grid.spec
    if spec.dim != 1:
        edm_error("Lammps format only valid for 1D grids", "gridio:write_lammps_table")
    dx = spec.dx[0]
    extra_n = int(box_min[0] / dx)
    n = int(np.ceil((box_max[0] - box_min[0]) / dx))
    n = n if spec.periodic[0] else n + 1

    xs = box_min[0] + dx * np.arange(n)
    pts = np.asarray(xs, dtype=np.float64)[:, None]
    import jax.numpy as jnp

    val, der = grid.get_value_deriv(jnp.asarray(pts, grid.dtype))
    val = np.asarray(val, np.float64)
    der = np.asarray(der, np.float64)

    with open(filename, "w") as f:
        f.write("#Auto generated by electronic-dance-music\n\n")
        f.write("EDM\n")
        f.write(f"N {extra_n + n} R {_fmt_g(dx)} {_fmt_g(box_max[0])}\n\n")
        for i in range(1, extra_n):
            f.write(f"{i} {_fmt_g(i * dx)} 0.0 0.0\n")
        for i in range(n):
            # in_grid owner test (grid.h:865-875, applied at grid.h:616): for
            # non-periodic dims points at x >= max - dx (== the un-inflated
            # max) are outside the grid and never written by any rank, so the
            # final x == box_max row of a non-periodic table is skipped.
            if not spec.periodic[0] and (
                xs[i] < spec.min[0] or xs[i] >= spec.max[0] - dx
            ):
                continue
            f.write(f"{i + extra_n} {xs[i]:.8f} {val[i]:.8f} {-der[i, 0]:.8f} \n")
