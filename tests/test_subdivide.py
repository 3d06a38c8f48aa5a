"""Spatial-subdivision semantics with TRUE sub-boxes, pinned against the
compiled reference binary (tests/oracles/oracle_subdiv.cpp; -O2 serial).

Covers the previously-untested subdivide branches (edm_bias.cpp:98-222):
skin extension, non-spanning -> non-periodic local grid, deposits whose
centers lie inside the sub-box / in the skin / OUTSIDE the local grid with
partial support overlap (the neighbor-replay case of the MPI hill
exchange, edm_bias.cpp:630-706), boundary-volume total_volume
(gaussian_grid.h:437-444), and the out-of-bounds passive replica.
"""

import numpy as np
import jax.numpy as jnp

from edm_tpu import bias as B
from edm_tpu.utils.config import parse_edm_text

SUB_EDM = (
    "tempering 0\nhill_prefactor 1.0\ndimension 1\n"
    "box_low 0\nbox_high 10\nbias_spacing 0.0097\nbias_sigma 0.2\n"
)


def _one_hill_rounds(params, state, xs):
    added = []
    for x in xs:
        before = float(state.cum_bias)
        state, _ = B.add_hills_round(
            params, state, jnp.asarray([[x]], jnp.float64), jnp.ones(1), 1.0
        )
        added.append(float(state.cum_bias) - before)
    return state, added


def test_subdivide_subbox_oracle():
    cfg = parse_edm_text(SUB_EDM)
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [2.5], [5.0], [0], [10], [True], [0.35], dtype=jnp.float64
    )
    assert not params.b_outofbounds
    # local grid: [2.15, 5.35] + non-periodic inflation; never periodic
    spec = state.bias.spec.grid
    assert abs(spec.min[0] - 2.15) < 1e-12
    assert not spec.periodic[0]
    # boundary-volume semantics (NOT the local grid volume)
    assert abs(params.total_volume - 10.0) < 1e-12

    # reference-binary pins: interior / in-skin / out-of-grid / far hills
    state, added = _one_hill_rounds(params, state, [3.7, 2.3, 5.55, 8.0])
    want_added = [0.999936731605, 0.780593902466, 0.164534477307, 0.0]
    np.testing.assert_allclose(added, want_added, atol=1e-9)

    pts = jnp.asarray([[2.2], [2.5], [3.7], [5.0], [5.3]], jnp.float64)
    want = np.array(
        [
            [1.760326622228, 4.400804071757],
            [1.209853626802, -6.049259804604],
            [1.994711378074, 0.000025739858],
            [0.045467811378, 0.625184650807],
            [0.913245441422, 5.707768340730],
        ]
    )
    v, der = state.bias.get_value_deriv(pts)
    np.testing.assert_allclose(np.asarray(v), want[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(der)[:, 0], want[:, 1], atol=1e-9)
    assert abs(float(state.cum_bias) - 1.945065111379) < 1e-9


def test_subdivide_out_of_bounds_replica():
    cfg = parse_edm_text(SUB_EDM.replace("box_high 10", "box_high 4"))
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [6.0], [8.0], [0], [10], [True], [0.35], dtype=jnp.float64
    )
    assert params.b_outofbounds
    # passive: zero force/energy (edm_bias.cpp:279-280)...
    e, der = B.update_forces(params, state, jnp.asarray([[7.0]], jnp.float64))
    assert float(e) == 0.0 and float(der[0, 0]) == 0.0
    # ...and hill rounds contribute nothing (the repo surfaces this as a
    # clean zero-contribution round; the serial reference aborts if a host
    # calls add_hill on an oob rank -- deliberate divergence, README ledger)
    state, _ = B.add_hills_round(
        params, state, jnp.asarray([[7.0]], jnp.float64), jnp.ones(1), 1.0
    )
    assert float(state.cum_bias) == 0.0
    assert float(jnp.sum(jnp.abs(state.bias.grid.values))) == 0.0


def test_subdivided_replicas_stitch_to_serial():
    """Two replicas splitting [0,10] at 5 (skin 0.35) vs one full-range run:
    every grid point inside a replica's own sub-box must match the serial
    grid at 1e-9 when each replica deposits ALL hills (the all-gather
    exchange semantics: every rank replays every hill, deposit masks do the
    spatial selection)."""
    # spacing 0.01 divides both the global range (10) and the replica
    # ranges (5.7 with skin 0.35) evenly, so subgrid nodes coincide with
    # serial grid nodes and pointwise comparison is meaningful (the generic
    # ctor re-derives dx per range, grid.h:199-211)
    cfg = parse_edm_text(SUB_EDM.replace("bias_spacing 0.0097", "bias_spacing 0.01"))
    hills = [1.2, 3.7, 4.9, 5.2, 7.3, 9.8, 0.1]

    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float64
    )
    for x in hills:
        state_f, _ = B.add_hills_round(
            params_f, state_f, jnp.asarray([[x]], jnp.float64), jnp.ones(1), 1.0
        )

    for lo, hi in [(0.0, 5.0), (5.0, 10.0)]:
        params_s, state_s = B.subdivide(
            cfg, 1.0, 1.0, [lo], [hi], [0], [10], [True], [0.35], dtype=jnp.float64
        )
        for x in hills:
            state_s, _ = B.add_hills_round(
                params_s, state_s, jnp.asarray([[x]], jnp.float64), jnp.ones(1), 1.0
            )
        # compare on the replica's owned region (sub-box interior)
        spec = state_s.bias.spec.grid
        n = spec.nbins[0]
        xs_local = spec.min[0] + spec.dx[0] * np.arange(n)
        own = (xs_local >= lo) & (xs_local < hi)
        pts = jnp.asarray(xs_local[own][:, None], jnp.float64)
        v_s = state_s.bias.get_value(pts)
        v_f = state_f.bias.get_value(pts)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_f), atol=1e-9)
