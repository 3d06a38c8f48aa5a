"""Single-particle EDM demo — the equivalent of the reference's
python-example/EDM.ipynb: construct a bias, deposit a hill, query the force,
then run a short biased Langevin trajectory and watch the CV histogram
flatten.

Run: python examples/single_particle.py
"""

import os
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from edm_tpu import EDMBias, bias as B
    from edm_tpu.models import coord_edm
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.utils.config import parse_edm_text

    workdir = tempfile.mkdtemp(prefix="edm_demo_")
    os.chdir(workdir)

    # The reference notebook's input.edm (python-example/input.edm) with one
    # fix: bias_per_step is raised above the per-hill integral.  With the
    # original config (sigma 0.5 on a unit box), a single hill integrates to
    # ~3.8 > bias_per_step (= prefactor = 1.0), so the limiter deposits and
    # fully undoes it every round — the bias stays 0 forever.  The compiled
    # reference binary does exactly the same (verified); its own example is
    # a no-op as shipped.
    open("input.edm", "w").write(
        "tempering 0\nhill_prefactor 1.0\nbias_per_step 20\ndimension 1\n"
        "box_low 0.0\nbox_high 1.0\nbias_spacing 0.01\nbias_sigma 0.5\n"
    )

    bias = EDMBias("input.edm", temperature=1.0, boltzmann_constant=1.0)
    bias.set_box([0], [1], [True])
    bias.add_hill([0.25])
    e, grad = bias.get_force([0.24])
    print(f"after one hill at 0.25: U(0.24)={e:.6f}  dU/dx={grad[0]:.6f}")

    t0 = time.time()
    for _ in range(20):
        bias.add_hill([0.25])
    print(f"20 more hills: {(time.time()-t0)/20*1000:.1f} ms/hill (host path)")

    # --- compiled MD: free particle + EDM flattens the sampling
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.25\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.0097\nbias_sigma 0.1\n"
    )
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float32
    )
    lp = LangevinParams(dt=0.005, friction=1.0, kT=1.0)
    step = coord_edm.make_step(params, lp, hill_stride=10)
    st = coord_edm.init_state(
        params, state, jnp.asarray([[5.0]], jnp.float32), jax.random.PRNGKey(0), lp
    )
    run = jax.jit(lambda s: coord_edm.run_segment(step, s, 2000))
    st, energies = run(st)
    hist = np.asarray(st.bias.cv_hist.values)
    print(
        f"2000 biased MD steps: cum_bias={float(st.bias.cum_bias):.2f}, "
        f"CV visits recorded={hist.sum():.0f}, bias file -> BIAS"
    )
    from edm_tpu.utils.gridio import write_grid

    write_grid(st.bias.bias.grid, "BIAS")
    print(f"outputs in {workdir}")


if __name__ == "__main__":
    main()
