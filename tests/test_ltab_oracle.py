"""`.ltab` content parity against the compiled reference binary.

The oracle fixtures in tests/oracles/ were produced by
DimmedGaussGrid<1>::lammps_multi_write (grid.h:583-592,650-667 via
gaussian_grid.h:155-157) from the reference built at -O2 with a single-rank
MPI stub — see tests/oracles/README.md.  Layout (header, zero-fill rows,
row indices, 8-decimal fixed x) is compared byte-for-byte; deposited
values/forces numerically (deposit summation order differs at the ulp level).
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from edm_tpu import GaussGrid
from edm_tpu.utils.gridio import write_lammps_table

ORACLES = pathlib.Path(__file__).parent / "oracles"


def _parse_ltab(text):
    """Split an .ltab file into (header_lines, zero_rows, grid_rows)."""
    lines = text.splitlines()
    header, zero_rows, grid_rows = [], [], []
    for ln in lines:
        parts = ln.split()
        if len(parts) == 4 and not ln.startswith("#"):
            if parts[2] == "0.0" and parts[3] == "0.0" and "." not in parts[0]:
                zero_rows.append(ln)
            else:
                grid_rows.append(parts)
        else:
            header.append(ln)
    return header, zero_rows, grid_rows


@pytest.mark.parametrize(
    "fixture,gmin,hills",
    [
        ("oracle.ltab", 0.0, [(0.05, 0.7), (1.50, 1.0), (2.37, 0.3), (2.98, 0.5)]),
        ("oracle2.ltab", 0.5, [(1.0, 1.0), (2.9, 0.4)]),
    ],
)
def test_ltab_matches_reference_binary(tmp_path, fixture, gmin, hills):
    g = GaussGrid.create(
        [gmin], [3.0], [0.0097], [False], [0.1],
        boundary_min=[gmin], boundary_max=[3.0], boundary_periodic=[False],
        dtype=jnp.float64,
    )
    for x, h in hills:
        g, _ = g.add_value(jnp.asarray([[x]], jnp.float64), jnp.asarray([h], jnp.float64))
    out = tmp_path / "got.ltab"
    write_lammps_table(g.grid, str(out), [gmin], [3.0])

    want = _parse_ltab((ORACLES / fixture).read_text())
    got = _parse_ltab(out.read_text())

    # header + zero-fill rows byte-identical (incl. the range(1, extra_n)
    # first-row quirk and %g dx formatting)
    assert got[0] == want[0]
    assert got[1] == want[1]
    # grid rows: same count, identical index and 8-decimal x columns;
    # values/forces numerically identical to 5e-7 (text is 8 decimals)
    assert len(got[2]) == len(want[2])
    for grow, wrow in zip(got[2], want[2]):
        assert grow[0] == wrow[0] and grow[1] == wrow[1]
    gv = np.array([[float(r[2]), float(r[3])] for r in got[2]])
    wv = np.array([[float(r[2]), float(r[3])] for r in want[2]])
    np.testing.assert_allclose(gv, wv, atol=5e-7, rtol=0)
