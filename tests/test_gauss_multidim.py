"""Multi-dim McGovern–De Pablo boundary-corrected deposition, pinned against
the compiled reference binary (tests/oracles/oracle_mcgdp3d.cpp; -O2 serial
build).  Ports the semantics of the reference's gauss_grid_interp_test_mcgdp_3D
(edm_test.cpp:771-821) with deterministic centers, and — unlike the reference
test, whose out-of-boundary queries compare 0 == 0 — pins actual deposited
values, gradients, and per-hill integrals at 1e-9.

Geometry: periodic grid strictly larger than the non-periodic system boundary,
so deposition runs the sequential McGDP denominator correction per dim
(ops/deposit.py) and N-D duplicate_boundary (gaussian_grid.h:571-630) copies
boundary rows outward.
"""

import numpy as np
import jax.numpy as jnp

from edm_tpu import GaussGrid


def _mk(dim, dx):
    return GaussGrid.create(
        [-10.0] * dim if dim == 3 else [-10.0, -10.0],
        [10.0] * dim,
        dx,
        [True] * dim,
        [3.0] * dim,
        boundary_min=[-5.0] * dim,
        boundary_max=[5.0] * dim,
        boundary_periodic=[False] * dim,
        dtype=jnp.float64,
    )


def test_mcgdp_2d_oracle():
    g = _mk(2, [0.9, 1.1])
    hills = [((-4.7, 0.3), 1.0), ((4.9, 4.8), 0.5), ((0.0, 0.0), 2.0), ((-11.2, 2.0), 1.0)]
    # reference-binary per-hill integrals (printf %.12f)
    want_added = [4.184115298217, 3.226330142950, 7.830513077418, 0.0]
    for (c, h), wa in zip(hills, want_added):
        g, added = g.add_value(jnp.asarray([c], jnp.float64), jnp.asarray([h], jnp.float64))
        assert abs(float(added[0]) - wa) < 1e-9, (c, float(added[0]), wa)

    pts = np.array(
        [[-5, -5], [-5, 0.3], [5, 5], [0, 0], [-4.7, 0.3], [4.9, 4.8],
         [-5.8, 0.3], [5.6, 4.8], [3.3, -2.2]]
    )
    want = np.array(
        [
            [0.172572015048, -0.001985900410, 0.001632934185],
            [0.114785660557, 0.175993020419, 0.017335061431],
            [0.260420543624, 0.000408340863, -0.000332370201],
            [0.104864945076, 0.001719970657, 0.019117092561],
            [0.136181268894, 0.003397926034, 0.020557452626],
            [0.260023520350, 0.003518319118, 0.002634949591],
            [0.0, 0.0, 0.0],  # outside the non-periodic boundary -> 0
            [0.0, 0.0, 0.0],
            [0.094231934986, -0.010063678741, 0.003495625304],
        ]
    )
    v, d = g.get_value_deriv(jnp.asarray(pts, jnp.float64))
    np.testing.assert_allclose(np.asarray(v), want[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(d), want[:, 1:], atol=1e-9)


def test_mcgdp_3d_oracle():
    g = _mk(3, [0.9, 1.1, 1.4])
    hills = [(-4.2, 0.1, 3.7), (4.6, -4.4, 0.2), (0.5, 1.5, -4.9), (2.2, 2.9, 1.1)]
    want_added = [98.485564288622, 68.029374876480, 120.564383507842, 64.500444848384]
    for c, wa in zip(hills, want_added):
        g, added = g.add_value(jnp.asarray([c], jnp.float64), jnp.asarray([5.0], jnp.float64))
        assert abs(float(added[0]) - wa) < 1e-8, (c, float(added[0]), wa)

    pts = np.array(
        [[-5, 0.1, 3.7], [5, -4.4, 0.2], [0.5, 1.5, -5], [-5, -5, -5],
         [5, 5, 5], [0, 0, 0], [-5.4, 0.1, 3.7], [5.7, -4.4, 0.2],
         [0.5, 1.5, -5.9]]
    )
    want_v = np.array(
        [0.289038439646, 0.370363621852, 0.238492608686, 0.576800567769,
         0.553367664813, 0.154694979464, 0.0, 0.0, 0.0]
    )
    want_d = np.array(
        [
            [0.433680475839, -0.021902951179, 0.098341047299],
            [-0.529910406320, 0.012288664690, -0.118220799634],
            [0.668651749933, -0.085320451476, 0.236932268216],
            [-0.007420130045, 0.010766964115, 0.013443566095],
            [0.015198722966, -0.016211143245, -0.019676832619],
            [-0.230724566588, 0.011248399630, -0.027512473970],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ]
    )
    v, d = g.get_value_deriv(jnp.asarray(pts, jnp.float64))
    np.testing.assert_allclose(np.asarray(v), want_v, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-9)


def test_mcgdp_3d_boundary_duplication_lattice():
    """N-D duplicate_boundary parity (gaussian_grid.h:571-630): the reference
    enumerates 4^DIM combinations where EVERY coordinate sits at one of
    {min_i-1, min_i, max_i, max_i+1} — it duplicates the boundary-corner
    lattice points only, NOT whole faces (the README.md:163-168 TODO:
    zero-force boundaries are complete in 1-D only).  Deliberately replicated;
    this pins the quirk with independently computed indices."""
    g = _mk(3, [0.9, 1.1, 1.4])
    rng = np.random.default_rng(7)
    centers = rng.uniform(-10, 10, (20, 3))
    g, _ = g.add_value(jnp.asarray(centers, jnp.float64), jnp.full((20,), 5.0))

    spec = g.grid.spec
    vals = np.asarray(g.grid.values)
    assert vals.shape == spec.nbins
    # boundary row indices per dim (duplicate_boundary's min_i/max_i walk)
    rows = []
    for d in range(3):
        lo = int(np.floor((-5.0 - spec.min[d]) / spec.dx[d]))
        while lo * spec.dx[d] + spec.min[d] < -5.0:
            lo += 1
        hi = int(np.floor((5.0 - spec.min[d]) / spec.dx[d]))
        while hi * spec.dx[d] + spec.min[d] > 5.0 or hi == spec.nbins[d]:
            hi -= 1
        rows.append((lo, hi))

    import itertools

    checked = 0
    for offs in itertools.product(range(4), repeat=3):
        outer, bound = [], []
        for d, off in enumerate(offs):
            lo, hi = rows[d]
            if off == 0:
                outer.append(lo - 1)
                bound.append(lo)
            elif off == 1:
                outer.append(lo)
                bound.append(lo)
            elif off == 2:
                outer.append(hi)
                bound.append(hi)
            else:
                outer.append(hi + 1)
                bound.append(hi)
        if tuple(outer) != tuple(bound):
            np.testing.assert_allclose(
                vals[tuple(outer)], vals[tuple(bound)], atol=1e-12
            )
            checked += 1
    assert checked == 4**3 - 2**3  # every non-trivial combination verified
