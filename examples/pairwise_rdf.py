"""Pairwise EDM targeting an RDF-derived PMF — the framework's flagship use
case (reference README: matching an experimentally derived g(r)).

A LJ fluid's pair-distance CV is biased toward a target -ln g(r): hills are
reweighted by exp(target - E[target]) (edm_bias.cpp:545-546) so deposition
concentrates where the target demands more probability.  Outputs the bias
grid, LAMMPS tabular potential, and CV histogram via the fix-style driver.

Run: python examples/pairwise_rdf.py [n_steps]
"""

import os
import sys
import tempfile

import numpy as np


def main(n_steps=400):
    import jax
    import jax.numpy as jnp

    from edm_tpu import Grid, GridSpec, bias as B
    from edm_tpu.models import pair_edm
    from edm_tpu.models.driver import run_simulation
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.models.lj import LJParams
    from edm_tpu.utils.config import parse_edm_text
    from edm_tpu.utils.gridio import read_grid_file, write_grid

    workdir = tempfile.mkdtemp(prefix="edm_rdf_")
    os.chdir(workdir)

    # target: -ln g(r) favoring a first shell at r ~ 1.5
    spec = GridSpec.create([0], [3.0], [0.05], [False])
    xs = spec.min[0] + spec.dx[0] * np.arange(spec.nbins[0])
    tvals = 2.0 * (1 - np.exp(-((xs - 1.5) ** 2) / 0.1))
    write_grid(Grid(values=jnp.asarray(tvals), derivs=None, spec=spec), "target.grid")

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.05\nbias_per_step 0.5\nhill_density 50\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
        "target_filename target.grid\n"
    )
    target = read_grid_file("target.grid", dim=1, interpolate=False, dtype=jnp.float32)
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0],
        target=target, dtype=jnp.float32,
    )
    print(f"E[target] = {float(params.expected_target):.4f}")

    side, a = 6, 1.26
    pts = (
        np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)
        * a + 0.5 * a
    )
    box = [side * a] * 3
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.8)
    step = pair_edm.make_step(
        params, lp, LJParams(), box, hill_stride=5, hill_capacity=2048
    )
    st = pair_edm.init_state(state, jnp.asarray(pts, jnp.float32), jax.random.PRNGKey(0))

    st, e = run_simulation(
        step, st, n_steps=n_steps, write_stride=max(100, n_steps // 4),
        bias_file="BIAS", histogram_file="HIST", lammps_table="BIAS.ltab",
        box_low=cfg.box_low, box_high=cfg.box_high,
        progress=lambda done, s, en: print(
            f"step {done}: cum_bias={float(s.bias.cum_bias):.3f} "
            f"E_bias={float(en[-1]):.3f}"
        ),
    )
    # targeting reweights hills by exp(target - E[target]): LESS bias is
    # deposited where the target wants density (the well at 1.5), so the
    # bias surface develops a dip there that pushes pair density toward it
    v = np.asarray(st.bias.bias.grid.values)
    rs = spec.min[0] + 0.02 * np.arange(len(v))
    sel_well = np.abs(rs - 1.5) < 0.2
    sel_out = (np.abs(rs - 2.2) < 0.2) | (np.abs(rs - 0.9) < 0.1)
    print(
        f"bias at target well (r~1.5): {v[sel_well].mean():.3f}  "
        f"vs outside: {v[sel_out].mean():.3f}  (well should be lower)"
    )
    print(f"outputs (BIAS, BIAS.ltab, HIST, HILLS) in {workdir}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
