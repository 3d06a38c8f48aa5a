"""End-to-end workflow tests mirroring the driver's config list
(BASELINE.json): restart from an initial bias, RDF-targeted pairwise EDM,
and bias_per_step capping under heavy hill load on a large grid."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edm_tpu import Grid, GridSpec, bias as B
from edm_tpu.api import EDMBias
from edm_tpu.utils.gridio import read_grid_file, write_grid


def test_restart_from_initial_bias(tmp_path):
    """Config 2 analog: write a bias, restart with initial_bias_filename,
    verify the restarted engine continues from the written surface
    (edm_bias.cpp:1066-1072,166-167; checkpoint semantics SURVEY.md §5)."""
    edm1 = tmp_path / "run1.edm"
    edm1.write_text(
        "tempering 0\nhill_prefactor 0.5\nbias_per_step 10\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.02\nbias_sigma 0.2\n"
    )
    b1 = EDMBias(str(edm1), 1, 1, dtype=jnp.float64, log_hills=False)
    b1.subdivide([0], [10], [0], [10], [True], [0])
    b1.add_hills(np.array([[3.0], [7.0]]), np.ones(2))
    biasfile = tmp_path / "BIAS1"
    b1.write_bias(str(biasfile))
    v3 = b1.bias_value([3.0])

    edm2 = tmp_path / "run2.edm"
    edm2.write_text(
        "tempering 0\nhill_prefactor 0.5\nbias_per_step 10\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.02\nbias_sigma 0.2\n"
        f"initial_bias_filename {biasfile}\n"
    )
    b2 = EDMBias(str(edm2), 1, 1, dtype=jnp.float64, log_hills=False)
    b2.subdivide([0], [10], [0], [10], [True], [0])
    # restarted surface reproduces the written one (interpolated re-read)
    assert abs(b2.bias_value([3.0]) - v3) < 1e-5
    # further hills accumulate on top
    b2.add_hills(np.array([[3.0]]), np.ones(1))
    assert b2.bias_value([3.0]) > v3 + 0.5

    # NOTE (reference parity): cum_bias_/tempering state is NOT checkpointed,
    # only the grid (SURVEY.md §5) — replicate
    assert b2.cum_bias < 1.5  # only the new hill counted


def test_rdf_targeted_pairwise(tmp_path):
    """Config 3 analog: pairwise EDM with a target PMF (-ln g(r)); hills are
    reweighted by exp(target - E[target]) so sampling converges toward the
    target RDF (edm_bias.cpp:545-546)."""
    from edm_tpu.models import pair_edm
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.models.lj import LJParams
    from edm_tpu.utils.config import parse_edm_text

    # target: favor r ~ 1.5 (gaussian well in -ln g)
    spec = GridSpec.create([0], [3.0], [0.05], [False])
    xs = spec.min[0] + spec.dx[0] * np.arange(spec.nbins[0])
    tvals = 2.0 * (1 - np.exp(-((xs - 1.5) ** 2) / 0.1))
    tgt = Grid(values=jnp.asarray(tvals), derivs=None, spec=spec)
    tfile = tmp_path / "target.grid"
    write_grid(tgt, str(tfile))

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.1\nbias_per_step 1.0\nhill_density 20\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
        f"target_filename {tfile}\n"
    )
    target = read_grid_file(str(tfile), dim=1, interpolate=False, dtype=jnp.float32)
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0],
        target=target, dtype=jnp.float32,
    )
    assert params.target is not None
    assert float(params.expected_target) > 0

    a = 1.26
    pts = (
        np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1).reshape(-1, 3)
        * a + 0.5 * a
    )
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.8)
    step = pair_edm.make_step(params, lp, LJParams(), [4 * a] * 3, hill_stride=2, hill_capacity=2048)
    st = pair_edm.init_state(state, jnp.asarray(pts, jnp.float32), jax.random.PRNGKey(3))
    run = jax.jit(lambda s: pair_edm.run_segment(step, s, 30))
    st, e = run(st)
    assert np.isfinite(np.asarray(e)).all()
    assert float(st.bias.cum_bias) > 0


def test_heavy_hill_load_capping_2d():
    """Config 4 analog (scaled down): 2-D coordinate EDM under heavy hill
    load — bias_per_step caps every round, the deferred buffer absorbs the
    overflow, and total added bias tracks rounds * cap exactly."""
    from edm_tpu.utils.config import parse_edm_text

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 1.0\nbias_per_step 0.5\ndimension 2\n"
        "box_low 0 0\nbox_high 5 5\nbias_spacing 0.05 0.05\nbias_sigma 0.2 0.2\n"
    )
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0, 0], [5, 5], [0, 0], [5, 5], [True, True], [0, 0],
        dtype=jnp.float32, buffer_size=4096,
    )
    rng = np.random.default_rng(5)
    round_fn = jax.jit(B.add_hills_round)
    # each round: 64 hills x (1.0/64) height ~ 1.0 total >> cap 0.5
    for i in range(3):
        pos = jnp.asarray(rng.uniform(0, 5, (64, 2)), jnp.float32)
        state, rec = round_fn(
            params, state, pos, jnp.ones((64,), jnp.float32),
            jnp.asarray(64.0, jnp.float32), jnp.ones((64,), bool),
        )
    B.check_state(state)
    # every round adds exactly the cap (drain + new, order-exact)
    assert abs(float(state.cum_bias) - 3 * 0.5) < 5e-3
    assert int(state.buf_right) > 0  # leftovers deferred, not dropped


def test_chebyshev_vs_interp_forces():
    """The spectral pair-force table matches the exact interpolated lookup
    to ~1e-3 of the force scale (ops/chebyshev accuracy contract)."""
    from edm_tpu import GaussGrid
    from edm_tpu.ops.chebyshev import fit_gauss_grid

    g = GaussGrid.create([0], [3], [0.02], [False], [0.1], dtype=jnp.float64)
    rng = np.random.default_rng(0)
    centers = rng.uniform(0.5, 2.5, (30, 1))
    g, _ = g.add_value(jnp.asarray(centers), jnp.full((30,), 0.3))
    tab = fit_gauss_grid(g, deg=64)
    rs = jnp.linspace(0.3, 2.7, 1500)
    v_fit, d_fit = tab.value_deriv(rs)
    v_ex, d_ex = g.get_value_deriv(rs[:, None])
    vscale = float(jnp.max(jnp.abs(v_ex)))
    dscale = float(jnp.max(jnp.abs(d_ex)))
    assert float(jnp.max(jnp.abs(v_fit - v_ex))) < 1e-3 * vscale
    assert float(jnp.max(jnp.abs(d_fit - d_ex[:, 0]))) < 3e-3 * dscale


def test_rdf_convergence_to_target():
    """North-star acceptance clause: the sampled pair-distance distribution
    converges to the target within a stated tolerance (the EDM theorem —
    White/Dama/Voth JCTC 2015: deposition rate p_sampled(x)*exp(w*(x))
    flattens exactly when p_sampled = exp(-w*), independent of the r^2
    Jacobian or the underlying potential).

    Ideal dimer in a periodic box, target = Gaussian well at r0=1.8; after
    burn-in the accepted-hill CV histogram (an unbiased sample of the CV
    since hill_density<0 accepts every pair every round) must match the
    target distribution at L1 < 0.2 — an order of magnitude closer than the
    unbiased r^2 volume-element distribution (~0.84)."""
    import dataclasses

    from edm_tpu.models import pair_edm
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.models.lj import LJParams
    from edm_tpu.utils.config import parse_edm_text

    R0, S = 1.8, 0.35
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.02\nbias_per_step 5.0\nhill_density -1\n"
        "dimension 1\nbox_low 0\nbox_high 2.7\nbias_spacing 0.03\nbias_sigma 0.1\n"
    )
    tspec = GridSpec.create([0.0], [2.7], [0.03], [False])
    xs = tspec.min[0] + tspec.dx[0] * np.arange(tspec.nbins[0])
    w = np.minimum((xs - R0) ** 2 / (2 * S * S), 4.0)
    target = Grid(values=jnp.asarray(w), derivs=None, spec=tspec, interpolate=False)
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [2.7], [0], [2.7], [False], [0],
        target=target, dtype=jnp.float64,
    )
    lp = LangevinParams(dt=0.005, friction=2.0, kT=1.0)
    lj = LJParams(epsilon=0.0, sigma=1.0, rcut=0.5)  # ideal dimer
    x0 = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]], jnp.float64)
    step = pair_edm.make_step(params, lp, lj, [3.0] * 3, hill_stride=1, hill_capacity=4)
    st = pair_edm.init_state(bias_state, x0, jax.random.PRNGKey(2))
    seg = jax.jit(lambda s, n: jax.lax.scan(step, s, None, length=n), static_argnums=1)
    st, _ = seg(st, 4000)  # burn-in while the bias builds
    st = dataclasses.replace(
        st, bias=dataclasses.replace(st.bias, cv_hist=st.bias.cv_hist.clear())
    )
    st, _ = seg(st, 8000)  # measurement phase

    hist = np.asarray(st.bias.cv_hist.values)
    hspec = st.bias.cv_hist.spec
    hx = hspec.min[0] + hspec.dx[0] * np.arange(hspec.nbins[0])
    p = hist / hist.sum()
    pstar = np.exp(-np.minimum((hx - R0) ** 2 / (2 * S * S), 4.0))
    pstar /= pstar.sum()
    base = hx**2
    base /= base.sum()

    l1_target = np.abs(p - pstar).sum()
    l1_unbiased = np.abs(p - base).sum()
    assert l1_target < 0.2, f"sampled CV distribution off target: L1={l1_target}"
    assert l1_unbiased > 3 * l1_target, "biasing did not move sampling off baseline"
    # mode within one sigma-bin of the target well
    assert abs(hx[p.argmax()] - R0) <= hspec.dx[0] + 1e-9


@pytest.mark.slow
def test_panelized_chebyshev_accuracy():
    """The panelized spectral table (4 panels x deg 16) matches the global
    deg-48 fit's force accuracy on a rough many-hill bias profile at ~2/3
    of the per-pair evaluation cost (52 active coefficients vs 49, but a
    deg-16 Clenshaw chain instead of deg-48)."""
    import numpy as np
    from edm_tpu import GaussGrid
    from edm_tpu.ops.chebyshev import fit_gauss_grid

    rng = np.random.default_rng(5)
    g = GaussGrid.create([0.0], [3.0], [0.02], [False], [0.1], dtype=jnp.float64)
    centers = jnp.asarray(rng.uniform(0.3, 2.7, (400, 1)))
    heights = jnp.asarray(rng.uniform(0.0, 0.01, (400,)))
    g, _ = g.add_value(centers, heights)

    rs = jnp.linspace(0.05, 2.9, 1500)
    v_ex, d_ex = g.get_value_deriv(rs[:, None])
    scale = float(jnp.max(jnp.abs(d_ex)))

    t_panel = fit_gauss_grid(g, deg=16, panels=4)
    t_global = fit_gauss_grid(g, deg=48)
    _, d_p = t_panel.value_deriv(rs)
    _, d_g = t_global.value_deriv(rs)
    err_p = float(jnp.max(jnp.abs(d_p - d_ex[..., 0]))) / scale
    err_g = float(jnp.max(jnp.abs(d_g - d_ex[..., 0]))) / scale
    assert err_p < 0.03, err_p
    assert err_p < 2.0 * err_g, (err_p, err_g)
