"""2-D McGDP fast deposition (ops/deposit.dense_tables_mcgdp_2d): the
strip-split separable path must match the windowed circular-support path —
which test_gauss_multidim pins against the reference binary — exactly
wherever the square-vs-spherical support cutoff is unambiguous, and within
the documented e^-8 corner bound elsewhere.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edm_tpu import GaussGrid
from edm_tpu import bias as B
from edm_tpu.ops.deposit import (
    GAUSS_SUPPORT,
    dense_tables_mcgdp_2d,
    deposit_from_mcgdp_2d,
    deposit_precomputed,
    hill_windows,
)
from edm_tpu.utils.config import parse_edm_text


def _ambiguous_mask(spec, centers):
    """Grid points inside some hill's square support but outside its
    spherical support (the documented divergence zone)."""
    xs0 = spec.grid.min[0] + spec.grid.dx[0] * np.arange(spec.grid.nbins[0])
    xs1 = spec.grid.min[1] + spec.grid.dx[1] * np.arange(spec.grid.nbins[1])
    X0, X1 = np.meshgrid(xs0, xs1, indexing="ij")
    amb = np.zeros_like(X0, bool)
    c = np.asarray(centers)
    for h in range(c.shape[0]):
        dp0 = X0 - c[h, 0]
        if spec.grid.periodic[0]:
            L = spec.grid.max[0] - spec.grid.min[0]
            dp0 -= np.round(dp0 / L) * L
        dp1 = X1 - c[h, 1]
        if spec.grid.periodic[1]:
            L = spec.grid.max[1] - spec.grid.min[1]
            dp1 -= np.round(dp1 / L) * L
        dp0 /= spec.sigma[0]
        dp1 /= spec.sigma[1]
        amb |= (
            (dp0**2 + dp1**2 >= GAUSS_SUPPORT)
            & (dp0**2 < GAUSS_SUPPORT)
            & (dp1**2 < GAUSS_SUPPORT)
        )
    return amb


def _case(periodic, seed=0, H=7):
    g1 = GaussGrid.create(
        [0, 0], [4.0, 3.0], [0.05, 0.06], periodic, [0.2, 0.15],
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    centers = jnp.asarray(
        np.stack([rng.uniform(0.1, 3.9, H), rng.uniform(0.1, 2.9, H)], -1)
    )
    heights = jnp.asarray(rng.uniform(0.05, 0.3, H))
    return g1, centers, heights


def test_mcgdp2d_matches_windowed():
    for periodic in ([False, True], [True, False], [False, False]):
        g1, centers, heights = _case(periodic)
        gw, added = deposit_precomputed(g1, hill_windows(g1, centers), heights)
        tabs = dense_tables_mcgdp_2d(g1, centers)
        gs = deposit_from_mcgdp_2d(g1, tabs, heights)

        amb = _ambiguous_mask(g1.spec, centers)
        vw, vs = np.asarray(gw.grid.values), np.asarray(gs.grid.values)
        dw, ds = np.asarray(gw.grid.derivs), np.asarray(gs.grid.derivs)
        # exact wherever the support shapes agree (double precision)
        assert np.abs(vw - vs)[~amb].max() < 1e-12
        assert np.abs(dw - ds)[~amb].max() < 1e-12
        # corner divergence bounded by the e^-8 class: per-hill bound
        # h * e^-8 * peak-norm * stacking, plus the t5 factor for derivs
        norm = 1.0 / (np.pi * g1.spec.sigma[0] * g1.spec.sigma[1])
        bound = float(jnp.sum(heights)) * np.exp(-GAUSS_SUPPORT) * norm
        assert np.abs(vw - vs).max() < 3.0 * bound
        assert np.abs(dw - ds).max() < 40.0 * bound

        # bias-limiter invariant: h*s equals the path's own deposited
        # integral (computed against a fresh grid, duplication excluded
        # by summing the in-boundary region only through the mass check)
        vol = g1.spec.grid.dx[0] * g1.spec.grid.dx[1]
        assert (
            abs(float(jnp.sum(heights * tabs.s)) - float(jnp.sum(added)))
            < 5.0 * bound * vol * vw.size
        )


def test_mcgdp2d_engine_round_capped():
    """A capped engine round over the 2-D McGDP path: cap honored,
    deferred hills buffered, conservation invariant holds."""
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.3\nbias_per_step 0.5\ndimension 2\n"
        "box_low 0 0\nbox_high 4 3\nbias_spacing 0.05 0.06\n"
        "bias_sigma 0.2 0.15\n"
    )
    params, st = B.subdivide(
        cfg, 1.0, 1.0, [0, 0], [4, 3], [0, 0], [4, 3], [False, True], [0, 0],
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(1)
    pos = jnp.asarray(
        np.stack([rng.uniform(0.2, 3.8, 9), rng.uniform(0.2, 2.8, 9)], -1)
    )
    ru = jnp.zeros((9,))
    st2, rec = B.add_hills_round(params, st, pos, ru, 1.0)
    assert not bool(rec.skipped)
    # conservation: round bias equals sum of effective deposits
    np.testing.assert_allclose(
        float(rec.round_bias),
        float(jnp.sum(rec.hill_dep_h * rec.hill_s)),
        rtol=1e-12,
    )
    # cap honored (straddler partially undone)
    assert float(rec.round_bias) <= cfg.bias_per_step + 1e-4
    # overflow buffered, drained on later rounds
    assert int(st2.buf_right - st2.buf_left) > 0
    st3, rec2 = B.add_hills_round(params, st2, pos, ru, 1.0)
    assert bool(rec2.skipped) or float(st3.cum_bias) > float(st2.cum_bias)

    # grid values match a windowed-path replay of the same effective
    # deposits wherever supports agree
    gw = B.subdivide(
        cfg, 1.0, 1.0, [0, 0], [4, 3], [0, 0], [4, 3], [False, True], [0, 0],
        dtype=jnp.float64,
    )[1].bias
    hw = hill_windows(gw, pos)
    gw, _ = deposit_precomputed(gw, hw, rec.hill_dep_h)
    amb = _ambiguous_mask(gw.spec, pos)
    dv = np.abs(
        np.asarray(gw.grid.values) - np.asarray(st2.bias.grid.values)
    )
    assert dv[~amb].max() < 1e-12


def test_strip_compaction_matches_dense(monkeypatch):
    """The deposit's strip passes rank-compact hills that actually reach a
    boundary strip (|x_d - wall| < (BC_MAR + sqrt(8)) sigma'_d; everything
    else is EXACTLY zeroed by the spherical mask) and fall back in-graph
    to the dense full-batch pass when the capacity overflows.  Both
    branches must reproduce the uncompacted deposit: zeros contribute
    nothing to the hill tensordot, so only chunk-boundary regrouping
    (f64 ~1e-15) separates them."""
    import edm_tpu.ops.deposit as DEP

    g0 = GaussGrid.create(
        [0, 0], [4.0, 3.0], [0.02, 0.024], [False, False], [0.05, 0.06],
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(5)
    H = 96
    # spread batch: a handful of hills near each wall, the rest interior;
    # a few zero-height rows (the cap/inactive pattern)
    centers = np.stack(
        [rng.uniform(0.5, 3.5, H), rng.uniform(0.5, 2.5, H)], -1
    )
    centers[:6, 0] = rng.uniform(0.0, 0.2, 6)       # near x-low wall
    centers[6:12, 1] = rng.uniform(2.8, 3.0, 6)     # near y-high wall
    heights = rng.uniform(0.05, 0.3, H)
    heights[::11] = 0.0
    cj = jnp.asarray(centers)
    hj = jnp.asarray(heights)
    # self-check branch selection: the near-wall population must fit the
    # forced cap 24 (compacted branch) but overflow cap 2 (dense fallback)
    import math as _m
    from edm_tpu.gauss import BC_MAR as _BCM, GAUSS_SUPPORT as _GS
    for d, (lo, hi) in enumerate(((0.0, 4.0), (0.0, 3.0))):
        sig = [0.05, 0.06][d] * _m.sqrt(2)
        reach = (_BCM + _m.sqrt(_GS)) * sig + [0.02, 0.024][d]
        near = (
            (np.abs(centers[:, d] - lo) < reach)
            | (np.abs(centers[:, d] - hi) < reach)
        ) & (heights != 0)
        assert 2 < near.sum() <= 24, (d, near.sum())

    def run():
        tabs = dense_tables_mcgdp_2d(g0, cj)
        return np.asarray(deposit_from_mcgdp_2d(g0, tabs, hj).grid.values), \
            np.asarray(deposit_from_mcgdp_2d(g0, tabs, hj).grid.derivs)

    ref_v, ref_d = run()  # cap 256 >= H: plain uncompacted pass

    monkeypatch.setattr(DEP, "_STRIP_COMPACT_CAP", 24)
    cmp_v, cmp_d = run()  # ~12 near-wall hills < 24: compacted branch
    np.testing.assert_allclose(cmp_v, ref_v, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(cmp_d, ref_d, rtol=1e-12, atol=1e-13)

    monkeypatch.setattr(DEP, "_STRIP_COMPACT_CAP", 2)
    ovf_v, ovf_d = run()  # capacity overflows: dense in-graph fallback
    np.testing.assert_allclose(ovf_v, ref_v, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(ovf_d, ref_d, rtol=1e-12, atol=1e-13)
