"""Exact checkpoint/resume (utils/checkpoint.py): a continued run is
bit-identical to an uninterrupted one — including the deferred-hill buffer,
cum_bias/tempering state, and RNG keys, which the reference's grid-file
resume loses (edm_bias.cpp:1066-1072)."""

import numpy as np
import jax
import jax.numpy as jnp

from edm_tpu import bias as B
from edm_tpu.models import pair_edm
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.models.lj import LJParams
from edm_tpu.utils.checkpoint import load_state, save_state
from edm_tpu.utils.config import parse_edm_text


def _mk_state():
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.5\nbias_per_step 0.4\nhill_density -1\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0], dtype=jnp.float64
    )
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0.5, 3.5, (8, 3)), jnp.float64)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.5)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=1.4)
    step = pair_edm.make_step(params, lp, lj, [4.0] * 3, hill_stride=2,
                              hill_capacity=64)
    state = pair_edm.init_state(bias_state, x0, jax.random.PRNGKey(1))
    return step, state, params, bias_state


def test_exact_resume_bitwise(tmp_path):
    step, state, params, _ = _mk_state()
    seg = jax.jit(lambda s, n: jax.lax.scan(step, s, None, length=n),
                  static_argnums=1)

    # uninterrupted: 12 steps
    full, _ = seg(state, 12)

    # interrupted: 6 steps, checkpoint (with a non-empty deferred buffer),
    # rebuild from scratch, resume 6 more
    mid, _ = seg(state, 6)
    assert int(mid.bias.buf_right) > int(mid.bias.buf_left), (
        "test config should leave deferred hills in the buffer"
    )
    ckpt = tmp_path / "state.npz"
    save_state(mid, str(ckpt))

    _, fresh, _, _ = _mk_state()  # fresh template, same static config
    resumed = load_state(fresh, str(ckpt))
    cont, _ = seg(resumed, 6)

    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(cont)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mismatched_structure_rejected(tmp_path):
    from edm_tpu.utils.errors import EDMError

    step, state, params, bias_state = _mk_state()
    ckpt = tmp_path / "b.npz"
    save_state(bias_state, str(ckpt))  # engine state only
    import pytest

    with pytest.raises(EDMError):
        load_state(state, str(ckpt))  # full host state template: mismatch
