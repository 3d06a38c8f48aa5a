"""Physics validation: metadynamics PMF reconstruction.

The defining property of well-tempered EDM: for a particle in an external
potential U(x), the accumulated bias converges to -(1-1/gamma) U(x) + C
over the sampled region.  This exercises the "PMF converged" criterion of
the driver's north star end to end through the compiled MD host — forces,
well-tempered hill heights (edm_bias.cpp:547-549), capping, deposition.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edm_tpu import bias as B
from edm_tpu.models import coord_edm
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.utils.config import parse_edm_text


def test_double_well_pmf_reconstruction():
    # periodic double well on [0, 10]: U = A cos(2 pi x / 5); barrier 2A = 3 kT
    A = 1.5
    gamma = 8.0

    def ext(x):
        u = A * jnp.cos(2 * jnp.pi * x[..., 0] / 5.0)
        f = jnp.zeros_like(x)
        f = f.at[..., 0].set(
            A * (2 * jnp.pi / 5.0) * jnp.sin(2 * jnp.pi * x[..., 0] / 5.0)
        )
        return jnp.sum(u), f

    cfg = parse_edm_text(
        f"tempering 1\nbias_factor {gamma}\nglobal_tempering -1\n"
        "hill_prefactor 0.1\nbias_per_step 0.1\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.05\nbias_sigma 0.4\n"
    )
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float32
    )
    lp = LangevinParams(dt=0.01, friction=1.0, kT=1.0)
    step = coord_edm.make_step(params, lp, hill_stride=10, external_force=ext)
    st = coord_edm.init_state(
        params, state, jnp.asarray([[2.5]], jnp.float32), jax.random.PRNGKey(7), lp
    )

    run = jax.jit(lambda s: coord_edm.run_segment(step, s, 10000))
    for _ in range(5):
        st, _ = run(st)

    xs = np.linspace(0.2, 9.8, 97)
    v = np.asarray(st.bias.bias.get_value(jnp.asarray(xs[:, None], jnp.float32)))
    u = A * np.cos(2 * np.pi * xs / 5.0)
    scale = 1 - 1 / gamma

    # shape agreement (hill-placement noise allows ~0.75+)
    corr = np.corrcoef(v, -u)[0, 1]
    assert corr > 0.7, f"bias/-U correlation {corr:.2f}"

    # recovered free-energy contrast: the bias fills the wells, so
    # V(well) - V(barrier) -> scale * 2A = 2.625
    def mean_near(points):
        sel = np.zeros_like(xs, bool)
        for p in points:
            sel |= np.abs(xs - p) < 0.4
        return v[sel].mean()

    dv = mean_near([2.5, 7.5]) - mean_near([0.0, 5.0, 10.0])
    expect = scale * 2 * A
    assert 0.5 * expect < dv < 1.5 * expect, f"contrast {dv:.2f} vs {expect:.2f}"
    # tempering actually engaged: cumulative bias growth decelerates
    assert float(st.bias.cum_bias) > 50
