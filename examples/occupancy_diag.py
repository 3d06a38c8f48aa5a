"""Cell-occupancy / tail telemetry on the bench workload (run on TPU).

Measures the occupancy distribution the kernel_cap/overflow_cap knobs
must be sized from — the r04 perf model guessed "P(occ>24) ~ 0.6%" from
a Poisson tail while the real distribution is super-Poisson under bias
load AND starts from a commensurate-lattice transient (64 cells x 27
atoms at 10k => tail 192 at step 0, the r04 driver-bench crash).  This
prints what is actually there: `models.pair_edm_cells.cell_diag` JSON
lines at init and after each simulation segment of the EXACT
`bench.bench_pairwise` configuration (same RDF-targeted well-tempered
workload, same lattice, same step pattern).

Usage (one TPU job at a time; see CLAUDE.md):
    python examples/occupancy_diag.py --n 10000  --segments 8
    python examples/occupancy_diag.py --n 100000 --segments 8 --steps 200

Reference bar: the reference has no occupancy concept (its per-pair
loop is occupancy-free, fix_edm_pair.cpp:177-227); this telemetry is
what replaces guessing for the fixed-shape TPU tiles.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300,
                    help="steps per segment (multiple of 10)")
    ap.add_argument("--kcaps", type=int, nargs="+", default=[16, 24, 28],
                    help="kernel_cap candidates to price the tail at")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from edm_tpu import bias as B
    from edm_tpu.grid import Grid, GridSpec
    from edm_tpu.models import pair_edm
    from edm_tpu.models.cells import CellSpec
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.models.lj import LJParams
    from edm_tpu.models.pair_edm_cells import (
        cell_diag,
        init_cell_state,
        make_cell_step,
    )
    from edm_tpu.utils.config import parse_edm_text

    # the exact bench_pairwise configuration (bench.py)
    dtype = jnp.float32
    cfg = parse_edm_text(
        "tempering 1\nbias_factor 10\n"
        "hill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\n"
        "bias_sigma 0.1\n"
    )
    tspec = GridSpec.create([0.0], [3.0], [0.02], [False])
    r_pts = np.arange(tspec.nbins[0]) * tspec.dx[0] + tspec.min[0]
    tvals = -2.0 * np.log(np.maximum(r_pts, 0.5))
    target = Grid(values=jnp.asarray(tvals, dtype), derivs=None, spec=tspec,
                  interpolate=False)
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0], dtype=dtype,
        target=target,
    )
    n = args.n
    side = int(np.ceil(n ** (1 / 3)))
    a = 1.26
    pts = (
        np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1)
        .reshape(-1, 3)[:n] * a + 0.5 * a
    )
    box = [side * a] * 3
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.8)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=2.5)
    core = pair_edm.init_state(
        bias_state, jnp.asarray(pts, dtype), jax.random.PRNGKey(0),
        n_est=n * 40, pair_lookup="interp",
    )
    spec = CellSpec.create(box, cutoff=3.05, n_atoms=n)
    state = init_cell_state(spec, core, with_ids=False)
    step = make_cell_step(
        params, lp, lj, spec, hill_stride=10, rebuild_stride=10,
        hill_capacity=2048, cell_chunk=81, use_pallas=True,
        energy_stride=10,
    )
    assert args.steps % 10 == 0
    seg = jax.jit(lambda s: jax.lax.scan(step, s, None, length=args.steps))

    def emit(tag, st):
        d = cell_diag(spec, st, kernel_caps=tuple(args.kcaps))
        d["at"] = tag
        print(json.dumps(d), flush=True)

    emit("init (step 0, lattice)", state)
    for k in range(args.segments):
        t0 = time.perf_counter()
        state, _ = seg(state)
        emit(f"step {(k + 1) * args.steps}", state)
        print(f"# segment rate ~{args.steps / (time.perf_counter() - t0):.1f}"
              " steps/s (incl. diag fetch)", flush=True)
    assert not bool(state.table_overflow), "cell cap exhausted"
    assert not bool(state.core.hills_truncated)


if __name__ == "__main__":
    main()
