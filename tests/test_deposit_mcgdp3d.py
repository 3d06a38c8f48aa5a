"""3-D McGDP fast deposition (ops/deposit.dense_tables_mcgdp with dim=3):
the strip-split separable path must match the windowed circular-support
path — which test_gauss_multidim pins against the reference binary —
exactly wherever the square-vs-spherical support cutoff is unambiguous,
and within the documented e^-8 corner bound elsewhere.  Also pins the
hill-chunked strip accumulation (the (H, G_others, S) transient bound)
against the unchunked evaluation.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edm_tpu import GaussGrid
from edm_tpu import bias as B
from edm_tpu.ops import deposit as dep
from edm_tpu.ops.deposit import (
    GAUSS_SUPPORT,
    dense_tables_mcgdp,
    deposit_from_mcgdp,
    deposit_precomputed,
    hill_windows,
)
from edm_tpu.utils.config import parse_edm_text


def _ambiguous_mask(spec, centers):
    """Grid points inside some hill's cube support but outside its
    spherical support (the documented divergence zone)."""
    axes = [
        spec.grid.min[d] + spec.grid.dx[d] * np.arange(spec.grid.nbins[d])
        for d in range(3)
    ]
    X = np.meshgrid(*axes, indexing="ij")
    amb = np.zeros_like(X[0], bool)
    c = np.asarray(centers)
    for h in range(c.shape[0]):
        dps = []
        for d in range(3):
            dp = X[d] - c[h, d]
            if spec.grid.periodic[d]:
                L = spec.grid.max[d] - spec.grid.min[d]
                dp -= np.round(dp / L) * L
            dps.append(dp / spec.sigma[d])
        dp2 = sum(dp**2 for dp in dps)
        amb |= (dp2 >= GAUSS_SUPPORT) & np.all(
            np.stack([dp**2 < GAUSS_SUPPORT for dp in dps]), axis=0
        )
    return amb


def _case(periodic, seed=0, H=5):
    g1 = GaussGrid.create(
        [0, 0, 0], [4.0, 3.0, 3.5], [0.1, 0.12, 0.1], periodic,
        [0.2, 0.15, 0.18], dtype=jnp.float64,
    )
    rng = np.random.default_rng(seed)
    centers = jnp.asarray(
        np.stack(
            [rng.uniform(0.1, 3.9, H), rng.uniform(0.1, 2.9, H),
             rng.uniform(0.1, 3.4, H)], -1,
        )
    )
    heights = jnp.asarray(rng.uniform(0.05, 0.3, H))
    return g1, centers, heights


def test_mcgdp3d_matches_windowed():
    for periodic in (
        [False, True, True],
        [True, False, True],
        [True, True, False],
        [False, False, True],
        [False, False, False],
    ):
        g1, centers, heights = _case(periodic)
        gw, added = deposit_precomputed(g1, hill_windows(g1, centers), heights)
        tabs = dense_tables_mcgdp(g1, centers)
        gs = deposit_from_mcgdp(g1, tabs, heights)

        amb = _ambiguous_mask(g1.spec, centers)
        vw, vs = np.asarray(gw.grid.values), np.asarray(gs.grid.values)
        dw, ds = np.asarray(gw.grid.derivs), np.asarray(gs.grid.derivs)
        # exact wherever the support shapes agree (double precision)
        assert np.abs(vw - vs)[~amb].max() < 1e-12, periodic
        assert np.abs(dw - ds)[~amb].max() < 1e-12, periodic
        # corner divergence bounded by the e^-8 class
        norm = 1.0 / (
            np.pi ** 1.5
            * g1.spec.sigma[0] * g1.spec.sigma[1] * g1.spec.sigma[2]
        )
        bound = float(jnp.sum(heights)) * np.exp(-GAUSS_SUPPORT) * norm
        assert np.abs(vw - vs).max() < 5.0 * bound, periodic
        assert np.abs(dw - ds).max() < 60.0 * bound, periodic

        # bias-limiter invariant: h*s equals the path's own deposited
        # integral to the corner-class bound
        vol = float(np.prod(g1.spec.grid.dx))
        assert (
            abs(float(jnp.sum(heights * tabs.s)) - float(jnp.sum(added)))
            < 5.0 * bound * vol * vw.size
        )


def test_mcgdp3d_hill_chunking_matches_unchunked(monkeypatch):
    """Forcing a tiny hill-chunk budget must not change the strip fields
    (same terms, chunked accumulation; f64 reorder noise only)."""
    g1, centers, heights = _case([False, True, False], seed=3, H=6)
    tabs = dense_tables_mcgdp(g1, centers)
    g_un = deposit_from_mcgdp(g1, tabs, heights)
    monkeypatch.setattr(dep, "_STRIP_CHUNK_ELEMS", 1 << 12)
    tabs_c = dense_tables_mcgdp(g1, centers)
    g_ch = deposit_from_mcgdp(g1, tabs_c, heights)
    np.testing.assert_allclose(
        np.asarray(g_un.grid.values), np.asarray(g_ch.grid.values),
        rtol=1e-13, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(g_un.grid.derivs), np.asarray(g_ch.grid.derivs),
        rtol=1e-13, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(tabs.s), np.asarray(tabs_c.s), rtol=1e-13
    )


def test_mcgdp3d_engine_round_capped():
    """A capped engine round over the 3-D McGDP path (use_dense2m, D=3):
    cap honored, deferred hills buffered, conservation invariant holds,
    grid matches a windowed replay where supports agree."""
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.3\nbias_per_step 0.5\ndimension 3\n"
        "box_low 0 0 0\nbox_high 4 3 3.5\nbias_spacing 0.1 0.12 0.1\n"
        "bias_sigma 0.2 0.15 0.18\n"
    )
    params, st = B.subdivide(
        cfg, 1.0, 1.0, [0, 0, 0], [4, 3, 3.5], [0, 0, 0], [4, 3, 3.5],
        [False, True, False], [0, 0, 0], dtype=jnp.float64,
    )
    rng = np.random.default_rng(1)
    pos = jnp.asarray(
        np.stack(
            [rng.uniform(0.2, 3.8, 9), rng.uniform(0.2, 2.8, 9),
             rng.uniform(0.2, 3.3, 9)], -1,
        )
    )
    ru = jnp.zeros((9,))
    st2, rec = B.add_hills_round(params, st, pos, ru, 1.0)
    assert not bool(rec.skipped)
    np.testing.assert_allclose(
        float(rec.round_bias),
        float(jnp.sum(rec.hill_dep_h * rec.hill_s)),
        rtol=1e-12,
    )
    assert float(rec.round_bias) <= cfg.bias_per_step + 1e-4
    assert int(st2.buf_right - st2.buf_left) > 0
    st3, rec2 = B.add_hills_round(params, st2, pos, ru, 1.0)
    assert bool(rec2.skipped) or float(st3.cum_bias) > float(st2.cum_bias)

    gw = B.subdivide(
        cfg, 1.0, 1.0, [0, 0, 0], [4, 3, 3.5], [0, 0, 0], [4, 3, 3.5],
        [False, True, False], [0, 0, 0], dtype=jnp.float64,
    )[1].bias
    hw = hill_windows(gw, pos)
    gw, _ = deposit_precomputed(gw, hw, rec.hill_dep_h)
    amb = _ambiguous_mask(gw.spec, pos)
    dv = np.abs(
        np.asarray(gw.grid.values) - np.asarray(st2.bias.grid.values)
    )
    assert dv[~amb].max() < 1e-12
