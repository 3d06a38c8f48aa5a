"""Boundary-sweep demo — a port of the reference's `hill_design` LAMMPS
experiment (/root/reference/algorithms/hill_design/lammps_test/lammps.in):
seven single-hill deposits walking x = 2..8 across a NON-PERIODIC [2, 8]
box with sigma 0.5, so the first/last hills sit exactly ON the
McGovern-De Pablo boundary and the rest straddle it to varying degrees.
The reference demo plots the resulting grids to visualize how the
boundary correction reshapes hills near a wall (zero-force duplication,
gaussian_grid.h:504-541).

This drives `api.EDMBias` exactly the way an external MD engine would —
fresh bias per iteration, pre/add/post hill cycle, grid write — i.e. the
host contract, exercised from outside the in-repo hosts.  The grids it
writes are pinned against the compiled reference binary by
tests/test_boundary_sweep.py (fixture: tests/oracles/boundary_sweep.txt).

Run: python examples/boundary_sweep.py [outdir]
"""

import pathlib
import sys
import tempfile

import numpy as np


TEST_EDM = (
    # test.edm from the reference demo, verbatim keys
    "tempering 0\nbias_per_step 1000.0\nhill_prefactor 1.0\ndimension 1\n"
    "box_low 2\nbox_high 8\nbias_spacing 0.01\nbias_sigma 0.5\n"
)


def sweep(outdir):
    import jax.numpy as jnp

    from edm_tpu.api import EDMBias

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    cfg = outdir / "test.edm"
    cfg.write_text(TEST_EDM)

    grids = []
    for i in range(7):
        x = 2.0 + i  # the demo's displace_atoms walk
        b = EDMBias(str(cfg), 1.0, 1.0, dtype=jnp.float64, log_hills=False)
        b.set_box([2.0], [8.0], [False])
        # one pre/add/post cycle per iteration = `run 0` with hill stride 1
        b.pre_add_hill(1)
        b.add_hill_r([x], 0.5)
        b.post_add_hill()
        path = outdir / f"grid_{i + 1}.dat"
        b.write_bias(str(path))
        grids.append((x, b))
        peak = b.bias_value([min(max(x, 2.0), 8.0)])
        print(f"hill at x={x:.1f}: cum_bias={b.cum_bias:.6f} peak={peak:.6f}"
              f" -> {path}")
    return grids


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="bsweep_"
    )
    grids = sweep(outdir)
    # boundary effect summary: a bulk hill integrates to ~prefactor; the
    # boundary-corrected ones conserve the integral while flattening the
    # force at the wall
    for x, b in grids:
        qs = np.linspace(2.0, 8.0, 601)[:, None]
        vals = np.array([b.bias_value(q) for q in qs])
        print(f"x={x:.1f}: grid integral ~ {np.trapezoid(vals, dx=0.01):.4f},"
          f" wall values v(2)={vals[0]:.4f} v(8)={vals[-1]:.4f}")


if __name__ == "__main__":
    main()
