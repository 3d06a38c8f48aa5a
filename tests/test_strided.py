"""Static hill-phase segment runner (driver.strided_segment) parity.

The strided runner must replicate the dynamic-cond step's physics: the
RNG/key stream, step counters, and flags EXACTLY (integer leaves), and
the float trajectories/bias to f64 fusion rounding — different XLA loop
compositions of the same step contract FMAs differently (measured ~1 ulp
between a flat ``lax.scan`` of the cond step and the same step advanced
one jit call at a time), so exact float equality between compositions is
not well-defined on CPU; the pin is rtol=1e-12 against BOTH.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tpu import bias as B
from edm_tpu.models import coord_edm
from edm_tpu.models.driver import strided_segment
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.utils.config import parse_edm_text


def _setup(dim, periodic=True):
    per = "1" if periodic else "0"
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.1\nbias_per_step 0.5\nhill_density 20\n"
        f"dimension {dim}\n"
        "box_low " + " ".join(["0"] * dim) + "\n"
        "box_high " + " ".join(["6"] * dim) + "\n"
        "bias_spacing " + " ".join(["0.11"] * dim) + "\n"
        "bias_sigma " + " ".join(["0.3"] * dim) + "\n"
    )
    p = [periodic] * dim
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0] * dim, [6] * dim, [0] * dim, [6] * dim, p,
        [0] * dim, dtype=jnp.float64,
    )
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.uniform(0.5, 5.5, (96, dim)), jnp.float64)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.7)
    return params, bias_state, x0, lp


@pytest.mark.parametrize("dim,records", [(1, False), (2, True)])
def test_strided_segment_bitwise(dim, records):
    params, bias_state, x0, lp = _setup(dim)
    stride, rounds = 3, 4
    n = stride * rounds
    kw = dict(hill_stride=stride, collect_records=records, hill_capacity=64)
    step_d = coord_edm.make_step(params, lp, **kw)
    step_h = coord_edm.make_step(params, lp, static_do_hills=True, **kw)
    step_p = coord_edm.make_step(params, lp, static_do_hills=False, **kw)
    # cache the fused corner table so the strided path exercises the very
    # carry the cond would copy
    state = coord_edm.init_state(
        params, bias_state, x0, jax.random.PRNGKey(5), lp,
        cache_lookup_table=(dim >= 2),
    )

    # ground truth: the dynamic step advanced one jit call at a time
    st, ys_t = state, []
    step_j = jax.jit(step_d)
    for _ in range(n):
        st, y = step_j(st, None)
        ys_t.append(y)
    ys_t = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ys_t)

    sd, yd = jax.jit(
        lambda s: jax.lax.scan(step_d, s, None, length=n)
    )(state)
    ss, ys = jax.jit(strided_segment(step_h, step_p, stride, n))(state)

    def check(tree_a, tree_b):
        for a, b in zip(
            jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)
        ):
            a, b = np.asarray(a), np.asarray(b)
            if np.issubdtype(a.dtype, np.floating):
                np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)
            else:
                # keys, counters, acceptance flags: exact
                np.testing.assert_array_equal(a, b)

    check(st, ss)
    check(ys_t, ys)
    check(sd, ss)
    check(yd, ys)


def test_run_simulation_strided_fast_path(tmp_path):
    """run_simulation(step_hill=...) drives segments via strided_segment and
    produces the same bias grid as the dynamic-cond path (and writes)."""
    from edm_tpu.models.driver import run_simulation

    params, bias_state, x0, lp = _setup(1)
    stride = 3
    kw = dict(hill_stride=stride, hill_capacity=64)
    step_d = coord_edm.make_step(params, lp, **kw)
    step_h = coord_edm.make_step(params, lp, static_do_hills=True, **kw)
    step_p = coord_edm.make_step(params, lp, static_do_hills=False, **kw)
    state = coord_edm.init_state(
        params, bias_state, x0, jax.random.PRNGKey(5), lp
    )

    bias_file = str(tmp_path / "BIAS")
    s1, e1 = run_simulation(step_d, state, 12, 6, bias_file=bias_file)
    s2, e2 = run_simulation(
        step_p, state, 12, 6, bias_file=bias_file,
        step_hill=step_h, hill_stride=stride,
    )
    np.testing.assert_allclose(
        np.asarray(s1.bias.bias.grid.values),
        np.asarray(s2.bias.bias.grid.values),
        rtol=1e-12, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e2), rtol=1e-12, atol=1e-13
    )
    assert (tmp_path / "BIAS").exists()


def test_strided_segment_rejects_ragged_length():
    params, bias_state, x0, lp = _setup(1)
    step = coord_edm.make_step(params, lp, hill_stride=4)
    with pytest.raises(ValueError):
        strided_segment(step, step, 4, 10)
