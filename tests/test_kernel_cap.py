"""Reduced-cap Newton kernel + dense overflow side pass (kernel_cap).

The production cell host executes 32-slot kernel tiles at ~14.6 mean
occupancy — ~4.8x slack-squared structural waste (docs/perf.md "cap
slack").  ``make_cell_step(kernel_cap=K)`` runs the kernel at K slot
rows/candidates and sweeps every pair touching a TAIL slot (>= K) in one
dense Pallas pass over the compacted tail-atom list
(ops/cellforce_pallas.overflow_forces_pallas).  These tests pin that the
split changes NOTHING but f32 pair-sum order: forces/energy match the
full-cap kernel, residency and hill rounds are identical (same RNG keys),
tail-list exhaustion raises the table_overflow flag instead of silently
dropping pairs, and an empty tail contributes exact zeros.

Reference bar: the per-pair loop at fix_edm_pair.cpp:177-227 does zero
redundant pair work; this split recovers ~36% of the kernel's slack
without touching the deposit-order semantics (edm_bias.cpp:444-526).
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


def test_tail_list_exhaustion_sets_flag():
    """More occupied tail slots than overflow_cap would silently drop
    pairs — the sticky table_overflow flag must fire (same severity as a
    cell exceeding ``cap``)."""
    c = _ctx()
    tail = np.maximum(0, c["occ"] - KCAP).sum()
    assert tail > 16
    sk = init_cell_state(c["spec"], c["core"], with_ids=False,
                         kernel_cap=KCAP, overflow_cap=16)
    assert bool(sk.table_overflow)


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
    with pytest.raises(ValueError, match="single-device"):
        make_cell_step(params, lp, lj, spec, hill_stride=5, kernel_cap=24,
                       use_pallas=True, slab_axis="x", slab_ndev=2)
    # state built without the caches is rejected at trace time
    st = init_cell_state(spec, c["core"], with_ids=False)
    step = make_cell_step(params, lp, lj, spec, hill_stride=5,
                          kernel_cap=24, use_pallas=True)
    with pytest.raises(ValueError, match="cached tail list"):
        step(st, None)
