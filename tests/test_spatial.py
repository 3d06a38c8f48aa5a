"""Spatially-sharded coordinate-grid host (parallel/spatial.py) on the
8-device CPU mesh: equal-slab decomposition, all-gather hill exchange with
replayed heights, nearest-image delivery across the periodic wrap, and
stitched-grid parity against a serial full-range run.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edm_tpu import bias as B
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.parallel import make_mesh
from edm_tpu.parallel.spatial import (
    gather_spatial_grid,
    init_spatial_state,
    make_spatial_coord_step,
    rebin_spatial_atoms,
    spatial_subdivide,
)
from edm_tpu.utils.config import parse_edm_text

EDM = (
    "tempering 0\nhill_prefactor 1.0\nbias_per_step 100\ndimension 1\n"
    "box_low 0\nbox_high 10\nbias_spacing 0.01\nbias_sigma 0.2\n"
)
N_DEV = 8
SKIN = 1.25  # > support radius sqrt(16)*sigma*sqrt(2) ~ 1.132


def _setup(kT=0.0):
    cfg = parse_edm_text(EDM)
    setup, template = spatial_subdivide(cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64)
    mesh = make_mesh(N_DEV)
    # two frozen atoms per slab, incl. some near slab edges and the wrap
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.3, 0.0, 0.0])
        xs.append([d * 1.25 + 1.2, 0.0, 0.0])  # near the slab's high edge
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=kT)  # freeze: bias forces displace atoms by ~1e-16/step
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    return cfg, setup, mesh, x0, lp, state, step


@pytest.mark.slow
def test_spatial_matches_serial_stitch():
    cfg, setup, mesh, x0, lp, state, step = _setup()
    n_rounds = 3
    for _ in range(n_rounds):
        state, e = step(state)
    assert bool(jnp.isfinite(e))

    # serial oracle: full-range grid, same hills with the SAME heights the
    # devices attached (pref / n_local, n_local = 2 per device — reference
    # est_hill_count is the PER-RANK atom count, fix_edm.cpp:140)
    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float64
    )
    h = np.full((x0.shape[0],), cfg.hill_prefactor / 2.0)
    for _ in range(n_rounds):
        state_f, _ = B.add_hills_round(
            params_f,
            state_f,
            jnp.asarray(x0[:, :1], jnp.float64),
            jnp.zeros(x0.shape[0], jnp.float64),
            2.0,
            override_heights=jnp.asarray(h, jnp.float64),
        )

    xg, vg = gather_spatial_grid(setup, state)
    assert xg.shape[0] == state_f.bias.grid.values.shape[0]
    # stitched grid nodes coincide with the serial grid (spacing divides
    # both ranges); compare values at owned nodes
    order = np.argsort(xg)
    vg = vg[order]
    np.testing.assert_allclose(vg, np.asarray(state_f.bias.grid.values), atol=1e-9)

    # every device's grid got deposits (hills near edges spill into skins)
    per_dev = np.asarray(state.bias.bias.grid.values).sum(axis=tuple(range(1, state.bias.bias.grid.values.ndim)))
    assert (per_dev > 0).all()

    # cum_bias: psum over devices, identical on every device, and at least
    # the serial total (skin overlaps double-count, compensated by
    # total_volume = n_dev * boundary volume)
    cums = np.asarray(state.bias.cum_bias)
    assert np.allclose(cums, cums[0])
    assert cums[0] >= float(state_f.cum_bias) - 1e-12
    assert abs(setup.params.total_volume - N_DEV * 10.0) < 1e-9


def test_spatial_targeting_matches_serial():
    """Targeted (experiment-directed) metadynamics under spatial sharding —
    the defining EDM feature (edm_bias.cpp:1054-1064): the global target
    grid scales hill heights on every device, and the stitched grid matches
    a serial full-range targeted run."""
    from edm_tpu.grid import Grid, GridSpec

    cfg = parse_edm_text(EDM)
    # smooth periodic -ln p target on [0, 10]
    tspec = GridSpec.create([0.0], [10.0], [0.05], [True])
    xs_t = np.arange(tspec.nbins[0]) * tspec.dx[0]
    tvals = 0.8 * np.cos(2 * np.pi * xs_t / 10.0) + 1.0
    target = Grid(
        values=jnp.asarray(tvals, jnp.float64), derivs=None, spec=tspec,
        interpolate=False,
    )
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64, target=target
    )
    mesh = make_mesh(N_DEV)
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.3, 0.0, 0.0])
        xs.append([d * 1.25 + 1.2, 0.0, 0.0])
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    n_rounds = 2
    for _ in range(n_rounds):
        state, e = step(state)
    assert bool(jnp.isfinite(e))

    # serial full-range targeted oracle: same est (= per-device atom count)
    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0],
        target=target, dtype=jnp.float64,
    )
    for _ in range(n_rounds):
        state_f, _ = B.add_hills_round(
            params_f, state_f,
            jnp.asarray(x0[:, :1], jnp.float64),
            jnp.zeros(x0.shape[0], jnp.float64),
            2.0,
        )
    xg, vg = gather_spatial_grid(setup, state)
    order = np.argsort(xg)
    np.testing.assert_allclose(
        vg[order], np.asarray(state_f.bias.grid.values), atol=1e-9
    )
    # the target actually modulated heights: grid is NOT flat across slabs
    assert np.ptp(vg) > 1e-3


def test_spatial_initial_bias_matches_serial():
    """initial_bias_filename analog: each device accumulates the global
    initial grid at its local coordinates (edm_bias.cpp:166-167,1066-1072);
    stitched state matches the serial accumulation, and a well-tempered
    round sees the initial bias identically on both paths."""
    from edm_tpu import GaussGrid

    # build an initial bias grid (with derivatives) from a serial deposit
    g0 = GaussGrid.create(
        [0.0], [10.0], [0.01], [True], [0.2], dtype=jnp.float64
    )
    g0, _ = g0.add_value(
        jnp.asarray([[2.0], [5.5], [9.9]], jnp.float64),
        jnp.asarray([0.4, 0.2, 0.3], jnp.float64),
    )
    initial = g0.grid

    cfg = parse_edm_text(
        "tempering 1\nbias_factor 10\nglobal_tempering -1\n"
        "hill_prefactor 1.0\nbias_per_step 100\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.01\nbias_sigma 0.2\n"
    )
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64, initial_bias=initial
    )
    mesh = make_mesh(N_DEV)
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.3, 0.0, 0.0])
        xs.append([d * 1.25 + 1.2, 0.0, 0.0])
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )

    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0],
        initial_bias=initial, dtype=jnp.float64,
    )
    # initial state already stitches to the serial grid
    xg, vg = gather_spatial_grid(setup, state)
    order = np.argsort(xg)
    np.testing.assert_allclose(
        vg[order], np.asarray(state_f.bias.grid.values), atol=1e-9
    )

    # one well-tempered round: heights shrink where the initial bias is
    # high, identically on both paths
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    state, _ = step(state)
    state_f, _ = B.add_hills_round(
        params_f, state_f,
        jnp.asarray(x0[:, :1], jnp.float64),
        jnp.zeros(x0.shape[0], jnp.float64),
        2.0,
    )
    xg, vg = gather_spatial_grid(setup, state)
    np.testing.assert_allclose(
        vg[np.argsort(xg)], np.asarray(state_f.bias.grid.values), atol=1e-9
    )


def test_spatial_nonperiodic_boundary_matches_serial():
    """Non-periodic global box along the sharded dim: McGovern-De Pablo
    boundary-corrected zero-force hills evaluated per device through the
    boundary_offset machinery must stitch to the serial full-range engine
    (which test_subdivide pins against the reference binary).  Covers
    edm_bias.cpp:134-155 + lib/gaussian_grid.h:378-435 under sharding."""
    cfg = parse_edm_text(EDM)
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64, periodic=[False]
    )
    assert setup.nonperiodic0
    mesh = make_mesh(N_DEV)
    # atoms near BOTH global edges (BC corrections engage within ~4 sigma
    # sqrt(2) ~ 1.13 of the boundary) plus mid-box ones
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.3, 0.0, 0.0])
        xs.append([d * 1.25 + 1.2, 0.0, 0.0])
    xs[0][0] = 0.15   # deep in the low-boundary correction zone
    xs[-1][0] = 9.9   # deep in the high-boundary correction zone
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    n_rounds = 2
    for _ in range(n_rounds):
        state, e = step(state)
    assert bool(jnp.isfinite(e))

    # serial full-range non-periodic oracle, matched replay heights
    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [False], [0], dtype=jnp.float64
    )
    h = np.full((x0.shape[0],), cfg.hill_prefactor / 2.0)
    for _ in range(n_rounds):
        state_f, _ = B.add_hills_round(
            params_f, state_f,
            jnp.asarray(x0[:, :1], jnp.float64),
            jnp.zeros(x0.shape[0], jnp.float64),
            2.0,
            override_heights=jnp.asarray(h, jnp.float64),
        )

    xg, vg = gather_spatial_grid(setup, state)
    # the non-periodic global grid carries the extra top point
    assert xg.shape[0] == state_f.bias.grid.values.shape[0] == 1001
    order = np.argsort(xg)
    np.testing.assert_allclose(
        vg[order], np.asarray(state_f.bias.grid.values), atol=1e-9
    )
    # stored gradients too (zero-force boundary behavior is in the derivs)
    spec = state.bias.bias.spec.grid
    xs_local = spec.min[0] + spec.dx[0] * np.arange(spec.nbins[0])
    own = (xs_local >= 0.0) & (xs_local < setup.slab_w)
    own_last = (xs_local >= 0.0) & (xs_local <= setup.slab_w)
    ders = np.asarray(state.bias.bias.grid.derivs)
    gders = np.concatenate(
        [ders[d][own_last if d == N_DEV - 1 else own] for d in range(N_DEV)]
    )
    np.testing.assert_allclose(
        gders[order], np.asarray(state_f.bias.grid.derivs), atol=1e-9
    )
    # boundary corrections actually fired: the hill at 0.15 deposits MORE
    # than an uncorrected Gaussian peak would (mass reflected at the wall)
    assert vg[order][0] > 0.0
    # and no periodic wrap: device 0's low-skin rows (global x < 0) carry
    # only boundary-duplicated values, no image of the 9.9 hill
    vals0 = np.asarray(state.bias.bias.grid.values)[0]
    low_skin = xs_local < -0.5
    assert vals0[low_skin].max() < 1e-6 + vals0[np.argmin(np.abs(xs_local))]


def test_spatial_hill_density_normalization():
    """hill_density/hill_prefactor divide by the replica count with NO >=1
    clamp (edm_bias.cpp:173-180 resets to 1 only on an exact-zero quotient):
    for hill_density < n_dev the per-replica density stays fractional."""
    cfg = parse_edm_text(EDM + "hill_density 2\n")
    setup, _ = spatial_subdivide(cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64)
    assert setup.params.cfg.hill_density == 2.0 / N_DEV  # not clamped to 1
    assert setup.params.cfg.hill_prefactor == cfg.hill_prefactor / N_DEV
    # and a density above n_dev divides plainly too
    cfg2 = parse_edm_text(EDM + "hill_density 80\n")
    setup2, _ = spatial_subdivide(cfg2, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64)
    assert setup2.params.cfg.hill_density == 10.0


def test_spatial_compacted_exchange_matches_full():
    """Bounded hill exchange (hill_capacity): each device rank-compacts its
    accepted (position, height) pairs before the all_gather — the
    reference's send_buffer_ semantics (BIAS_BUFFER_SIZE accepted hills per
    round, edm_bias.h:151-154) — and the device-major re-compaction
    replays the full gathered batch's deposit order.  Same draws, same
    hills, same heights; grids agree to summation rounding."""
    cfg = parse_edm_text(EDM + "hill_density 8\n")  # ~1 accept/device/round
    setup, template = spatial_subdivide(cfg, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64)
    mesh = make_mesh(N_DEV)
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.3, 0.0, 0.0])
        xs.append([d * 1.25 + 1.2, 0.0, 0.0])
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)

    def run(capacity):
        st = init_spatial_state(
            setup, template, x0, jax.random.PRNGKey(3), capacity=4, mesh=mesh
        )
        step = make_spatial_coord_step(
            setup, lp, hill_stride=1, mesh=mesh, hill_capacity=capacity
        )
        for _ in range(4):
            st, e = step(st)
        return st

    sc = run(16)  # 16 < cap*n_dev = 32 activates compaction
    sf = run(0)   # full candidate exchange
    assert not bool(np.asarray(sc.hills_truncated).any())
    gv_c = np.asarray(sc.bias.bias.grid.values)
    gv_f = np.asarray(sf.bias.bias.grid.values)
    np.testing.assert_allclose(gv_c, gv_f, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sc.bias.cum_bias), np.asarray(sf.bias.cum_bias), rtol=1e-12
    )
    assert float(np.asarray(sc.bias.cum_bias)[0]) > 0


def test_spatial_wraparound_delivery():
    """A hill near the global box edge must land in the opposite-edge
    device's skin via its periodic image (edm_bias.cpp:764-781)."""
    cfg, setup, mesh, x0, lp, state, step = _setup()
    state, _ = step(state)
    vals = np.asarray(state.bias.bias.grid.values)  # (n_dev, n0)
    spec = state.bias.bias.spec.grid
    xs_local = spec.min[0] + spec.dx[0] * np.arange(spec.nbins[0])
    # device 0's skin rows below 0 correspond to global x in [10-skin, 10):
    # the atom at 9.95 (device 7, slab edge 8.75+1.2) deposits there
    low_skin = xs_local < -0.5
    assert vals[0][low_skin].max() > 1e-4
    # device 7's high skin (global x > 10 -> images of atoms near 0)
    high_skin = xs_local > setup.slab_w + 0.5
    assert vals[7][high_skin].max() > 1e-4


def test_spatial_rebin():
    cfg, setup, mesh, x0, lp, state, step = _setup()
    # move one atom from slab 0 into slab 3's range and rebin
    xs = np.asarray(state.x).copy()
    xs[0, 0, 0] = 4.0  # slab 3 (1.25-wide slabs)
    import dataclasses as dc

    state = dc.replace(state, x=jnp.asarray(xs))
    state = rebin_spatial_atoms(setup, state, mesh)
    valid = np.asarray(state.valid)
    assert valid[0].sum() == 1 and valid[3].sum() == 3
    # migrated coordinates preserved
    assert np.any(np.isclose(np.asarray(state.x)[3, :, 0], 4.0))
    # step still runs after rebinning
    state, e = step(state)
    assert bool(jnp.isfinite(e))


@pytest.mark.slow
def test_spatial_2d_coordinate_grid():
    """2-D coordinate CV sharded along dim 0 only (dims 1+ span globally):
    the >HBM-grid decomposition of SURVEY §7 step 7. Stitch parity against
    a serial 2-D run with matched replay heights."""
    cfg2 = parse_edm_text(
        "tempering 0\nhill_prefactor 1.0\nbias_per_step 100\ndimension 2\n"
        "box_low 0 0\nbox_high 10 4\nbias_spacing 0.05 0.05\nbias_sigma 0.2 0.2\n"
    )
    setup, template = spatial_subdivide(cfg2, 1.0, 1.0, N_DEV, SKIN, dtype=jnp.float64)
    mesh = make_mesh(N_DEV)
    xs = []
    for d in range(N_DEV):
        xs.append([d * 1.25 + 0.4, 1.0, 0.0])
        xs.append([d * 1.25 + 1.1, 3.0, 0.0])
    x0 = np.asarray(xs)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    n_rounds = 2
    for _ in range(n_rounds):
        state, e = step(state)
    assert bool(jnp.isfinite(e))

    # serial oracle via direct windowed deposits (cap never engages at
    # bias_per_step 100, so every hill deposits in full; the engine's 2-D
    # fully-periodic fast path uses square support — the sharded grids are
    # non-periodic locally and stay on the windowed circular-support path,
    # so the oracle must too)
    from edm_tpu import GaussGrid

    g_f = GaussGrid.create(
        [0, 0], [10, 4], [0.05, 0.05], [True, True], [0.2, 0.2],
        dtype=jnp.float64,
    )
    h = np.full((x0.shape[0],), cfg2.hill_prefactor / 2.0)
    for _ in range(n_rounds):
        g_f, _ = g_f.add_value(
            jnp.asarray(x0[:, :2], jnp.float64), jnp.asarray(h, jnp.float64)
        )

    xg, vg = gather_spatial_grid(setup, state)  # (n0_global,), (n0_global, n1)
    order = np.argsort(xg)
    np.testing.assert_allclose(
        vg[order], np.asarray(g_f.grid.values), atol=1e-9
    )
    # total volume: n_dev * global area
    assert abs(setup.params.total_volume - N_DEV * 40.0) < 1e-9


def test_spatial_per_replica_hills_logging(tmp_path):
    """Per-device HILLS_<r> files from the sharded host (the reference's
    per-rank trace); every replica logs every deposit it performed,
    including replayed remote hills."""
    from edm_tpu.parallel.spatial import log_spatial_round
    from edm_tpu.utils.hills_log import HillsLog

    cfg, setup, mesh, x0, lp, state, _ = _setup()
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh,
                                   collect_records=True)
    logs_files = [
        HillsLog(str(tmp_path / f"HILLS_{d}"), 1, setup.params.total_volume)
        for d in range(N_DEV)
    ]
    cum = 0.0
    for r in range(2):
        state, e, logs = step(state)
        cum += log_spatial_round(logs_files, logs, r, cum)
    for hl in logs_files:
        hl.close()

    per_dev_totals = []
    for d in range(N_DEV):
        txt = (tmp_path / f"HILLS_{d}").read_text()
        lines = [l.split() for l in txt.strip().splitlines()]
        assert lines, f"device {d} logged nothing"
        for l in lines:
            assert l[1] in ("h", "u", "b", "v", "z") and len(l) == 7
        per_dev_totals.append(sum(float(l[5]) for l in lines))
    # psum semantics: global cum_bias == sum over devices of logged deposits
    assert abs(sum(per_dev_totals) - float(np.asarray(state.bias.cum_bias)[0])) < 1e-5
    # replay delivery: device 0 logged nonzero deposits for hills whose
    # GLOBAL position belongs to other devices' slabs (x > slab+skin)
    txt0 = (tmp_path / "HILLS_0").read_text()
    remote = [
        l.split() for l in txt0.strip().splitlines()
        if float(l.split()[3]) > setup.slab_w + SKIN and float(l.split()[5]) != 0.0
    ]
    # positions are logged in global coordinates; the wrapped image of the
    # 9.95 atom deposits on device 0 (logged at its global position)
    assert any(float(l[3]) > 9.0 for l in remote)


def test_write_spatial_grid_roundtrip(tmp_path):
    """Stitched global grid writes as one Plumed-1 file and reads back."""
    from edm_tpu.parallel.spatial import write_spatial_grid
    from edm_tpu.utils.gridio import read_grid_file

    cfg, setup, mesh, x0, lp, state, step = _setup()
    state, _ = step(state)
    out = tmp_path / "GBIAS"
    g = write_spatial_grid(setup, state, str(out))
    back = read_grid_file(str(out), dim=1, interpolate=True, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(back.values), np.asarray(g.values), atol=1e-8
    )
    assert back.spec.nbins[0] == 1000  # 8 slabs x 125 owned rows


# ---------------------------------------------------------------------------
# N-D brick decomposition (parts=(p0, ..., pD-1)) — the shape the reference's
# MPI domain decomposition actually takes under LAMMPS (3-D per-rank
# sublo/subhi bricks, fix_edm.cpp:100-104 -> edm_bias.cpp:98-222)
# ---------------------------------------------------------------------------

EDM2D = (
    "tempering 0\nhill_prefactor 1.0\nbias_per_step 100\ndimension 2\n"
    "box_low 0 0\nbox_high 10 10\nbias_spacing 0.05 0.05\n"
    "bias_sigma 0.2 0.2\n"
)


def _brick_atoms(parts, widths):
    """Two frozen atoms per brick: one near the low corner, one near the
    high corner (deposits spill into neighbor bricks / across the wrap)."""
    xs = []
    for i in range(parts[0]):
        for j in range(parts[1]):
            lo = (i * widths[0], j * widths[1])
            xs.append([lo[0] + 0.4, lo[1] + 0.3, 0.0])
            xs.append([lo[0] + widths[0] - 0.3, lo[1] + widths[1] - 0.2, 0.0])
    return np.asarray(xs)


def _run_brick(cfg, parts, periodic, n_rounds=2):
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, parts, SKIN, dtype=jnp.float64, periodic=periodic
    )
    mesh = make_mesh(int(np.prod(parts)))
    x0 = _brick_atoms(parts, setup.widths)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
    for _ in range(n_rounds):
        state, e = step(state)
    assert bool(jnp.isfinite(e))
    return setup, state, x0


@pytest.mark.slow
def test_spatial_brick_2d_matches_serial():
    """(2, 4) brick decomposition of a periodic 2-D CV grid: per-brick
    local coordinates in BOTH dims, hills exchanged once and replayed
    everywhere, stitched global grid equal to a serial windowed run."""
    from edm_tpu import GaussGrid
    from edm_tpu.parallel.spatial import stitch_spatial_grid

    cfg = parse_edm_text(EDM2D)
    setup, state, x0 = _run_brick(cfg, (2, 4), [True, True])
    assert setup.parts == (2, 4) and setup.widths == (5.0, 2.5)

    # serial oracle via direct windowed deposits (same circular-support
    # path the sharded local grids use; see test_spatial_2d_coordinate_grid)
    g_f = GaussGrid.create(
        [0, 0], [10, 10], [0.05, 0.05], [True, True], [0.2, 0.2],
        dtype=jnp.float64,
    )
    h = np.full((x0.shape[0],), cfg.hill_prefactor / 2.0)
    for _ in range(2):
        g_f, _ = g_f.add_value(
            jnp.asarray(x0[:, :2], jnp.float64), jnp.asarray(h, jnp.float64)
        )

    g = stitch_spatial_grid(setup, state)
    assert tuple(int(b) for b in g.spec.nbins) == (200, 200)
    np.testing.assert_allclose(
        np.asarray(g.values), np.asarray(g_f.grid.values), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g.derivs), np.asarray(g_f.grid.derivs), atol=1e-9
    )
    # every brick deposited; cum_bias identical on all devices; volume sums
    # per-device BOUNDARY volumes (the global box area, as each rank's
    # boundary spans the system box — edm_bias.cpp:206-220)
    per_dev = np.asarray(state.bias.bias.grid.values).sum(axis=(1, 2))
    assert (per_dev > 0).all()
    cums = np.asarray(state.bias.cum_bias)
    assert np.allclose(cums, cums[0])
    assert abs(setup.params.total_volume - 8 * 100.0) < 1e-9


@pytest.mark.slow
def test_spatial_brick_2d_nonperiodic_mcgdp():
    """(2, 4) bricks over a fully NON-periodic 2-D box: McGovern-De Pablo
    boundary-corrected zero-force hills near the global walls and corners,
    evaluated per device through per-dim boundary_offsets, stitch to the
    serial engine's windowed deposits."""
    from edm_tpu.parallel.spatial import stitch_spatial_grid

    cfg = parse_edm_text(EDM2D)
    setup, state, x0 = _run_brick(cfg, (2, 4), [False, False])
    assert setup.nonper == (True, True)

    # serial full-range non-periodic oracle: the engine's GaussGrid (with
    # the box boundary + BC tables from subdivide), deposited via the
    # windowed path directly — B.add_hills_round would dispatch the
    # strip-split McGDP fast path, which uses square support
    params_f, state_f = B.subdivide(
        cfg, 1.0, 1.0, [0, 0], [10, 10], [0, 0], [10, 10], [False, False],
        [0, 0], dtype=jnp.float64,
    )
    g_f = state_f.bias
    h = np.full((x0.shape[0],), cfg.hill_prefactor / 2.0)
    for _ in range(2):
        g_f, _ = g_f.add_value(
            jnp.asarray(x0[:, :2], jnp.float64), jnp.asarray(h, jnp.float64)
        )

    g = stitch_spatial_grid(setup, state)
    assert tuple(int(b) for b in g.spec.nbins) == (201, 201)
    np.testing.assert_allclose(
        np.asarray(g.values), np.asarray(g_f.grid.values), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(g.derivs), np.asarray(g_f.grid.derivs), atol=1e-9
    )
    # the corner hill (0.4, 0.3) is inside both walls' correction zones:
    # boundary-reflected mass makes the corner value exceed the plain
    # Gaussian tail there, and the wall derivative is exactly zero
    assert float(g.values[0, 0]) > 0.0
    np.testing.assert_allclose(np.asarray(g.derivs[0, :, 0]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g.derivs[:, 0, 1]), 0.0, atol=1e-12)


def test_spatial_brick_rebin_and_binning():
    """Brick atom binning (row-major multi-index) and host-side rebin:
    atoms drifted across a dim-1 brick face migrate to the right device."""
    import dataclasses as dc

    cfg = parse_edm_text(EDM2D)
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, (2, 4), SKIN, dtype=jnp.float64
    )
    mesh = make_mesh(8)
    x0 = _brick_atoms((2, 4), setup.widths)
    state = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    # row-major: device = i0 * 4 + i1; atom (0.4, 0.3) -> dev 0,
    # (5.4, 7.8) would be dev 1*4+3 = 7
    assert bool(state.valid[0].sum() == 2)
    # drift one device-0 atom across the dim-1 face into brick (0, 1) and
    # one across the periodic dim-0 wrap into brick (1, 0)
    xs = np.array(np.asarray(state.x))
    xs[0, 0] = [0.4, 2.6, 0.0]   # -> dev 1
    xs[0, 1] = [-0.2, 0.3, 0.0]  # wraps to 9.8 -> dev 4 (i0=1, i1=0)
    state = dc.replace(state, x=jnp.asarray(xs, state.x.dtype))
    state = rebin_spatial_atoms(setup, state, mesh)
    valid = np.asarray(state.valid)
    assert valid[0].sum() == 0
    assert valid[1].sum() == 3
    assert valid[4].sum() == 3
    # parked slots sit at their brick centers in the sharded dims
    parked = np.asarray(state.x)[0][~valid[0]]
    assert np.allclose(parked[:, 0], 2.5) and np.allclose(parked[:, 1], 1.25)


def test_spatial_brick_write_roundtrip(tmp_path):
    """Stitched global 2-D brick grid writes as one Plumed-1 file and
    reads back (multi_write analog, grid.h:509-674)."""
    from edm_tpu.parallel.spatial import stitch_spatial_grid, write_spatial_grid
    from edm_tpu.utils.gridio import read_grid_file

    cfg = parse_edm_text(EDM2D)
    setup, state, _ = _run_brick(cfg, (2, 4), [True, True], n_rounds=1)
    out = tmp_path / "GBIAS2D"
    g = write_spatial_grid(setup, state, str(out))
    back = read_grid_file(str(out), dim=2, interpolate=True, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(back.values), np.asarray(g.values), atol=1e-8
    )
    st = stitch_spatial_grid(setup, state)
    np.testing.assert_allclose(
        np.asarray(st.values), np.asarray(g.values), atol=0
    )


def test_spatial_overlap_filter_matches_full():
    """Per-device overlap filter (the reference's infer_neighbors delivery,
    edm_bias.cpp:708-789): dropping gathered hills that cannot reach this
    device's grid leaves every local grid unchanged to reduction roundoff
    (their deposits are exact zeros; the dense deposit matvec regroups when
    the batch length changes) and the capped prefix ignores s == 0 hills."""
    cfg, setup, mesh, x0, lp, state0, _ = _setup(kT=0.5)
    step_full = make_spatial_coord_step(
        setup, lp, hill_stride=1, mesh=mesh, overlap_capacity=0
    )
    # slab + skin + support covers ~3.8 of L=10: 16 rows hold every
    # reachable hill of the 16-hill round
    step_filt = make_spatial_coord_step(
        setup, lp, hill_stride=1, mesh=mesh, overlap_capacity=16
    )
    sf = sg = state0
    for _ in range(3):
        sf, _ = step_filt(sf)
        sg, _ = step_full(sg)
    np.testing.assert_allclose(
        np.asarray(sf.bias.bias.grid.values),
        np.asarray(sg.bias.bias.grid.values), rtol=1e-14, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(sf.x), np.asarray(sg.x), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sf.bias.cum_bias), np.asarray(sg.bias.cum_bias),
        rtol=1e-13, atol=0,
    )
    assert not np.asarray(sf.hills_truncated).any()
    # a too-small capacity truncates reachable hills and sets the sticky flag
    step_tiny = make_spatial_coord_step(
        setup, lp, hill_stride=1, mesh=mesh, overlap_capacity=2
    )
    st, _ = step_tiny(state0)
    assert np.asarray(st.hills_truncated).any()


@pytest.mark.slow
def test_spatial_brick_overlap_filter_matches_full():
    """Overlap filter under the (2, 4) brick decomposition: per-dim window
    tests along BOTH sharded dims, grids equal to the unfiltered run to
    reduction roundoff."""
    cfg = parse_edm_text(EDM2D)
    setup, template = spatial_subdivide(
        cfg, 1.0, 1.0, (2, 4), SKIN, dtype=jnp.float64
    )
    mesh = make_mesh(8)
    x0 = _brick_atoms((2, 4), setup.widths)
    lp = LangevinParams(dt=1e-8, friction=0.0, kT=0.0)
    state0 = init_spatial_state(
        setup, template, x0, jax.random.PRNGKey(0), capacity=4, mesh=mesh
    )
    step_full = make_spatial_coord_step(
        setup, lp, hill_stride=1, mesh=mesh, overlap_capacity=0
    )
    step_filt = make_spatial_coord_step(
        setup, lp, hill_stride=1, mesh=mesh, overlap_capacity=16
    )
    sf = sg = state0
    for _ in range(2):
        sf, _ = step_filt(sf)
        sg, _ = step_full(sg)
    np.testing.assert_allclose(
        np.asarray(sf.bias.bias.grid.values),
        np.asarray(sg.bias.bias.grid.values), rtol=1e-14, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(sf.bias.bias.grid.derivs),
        np.asarray(sg.bias.bias.grid.derivs), rtol=1e-14, atol=1e-13,
    )
    assert not np.asarray(sf.hills_truncated).any()


_AUTO16 = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.parallel import make_mesh
from edm_tpu.parallel.spatial import (
    spatial_subdivide, init_spatial_state, make_spatial_coord_step,
    gather_spatial_grid,
)
from edm_tpu.utils.config import parse_edm_text

EDM = ("tempering 0\nhill_prefactor 1.0\nbias_per_step 100\ndimension 1\n"
       "box_low 0\nbox_high 32\nbias_spacing 0.02\nbias_sigma 0.05\n")
cfg = parse_edm_text(EDM)
setup, template = spatial_subdivide(cfg, 1.0, 1.0, 16, 0.3, dtype=jnp.float64)
mesh = make_mesh(16)
rng = np.random.default_rng(7)
x0 = np.zeros((64, 3))
x0[:, 0] = np.concatenate(
    [np.sort(rng.uniform(2.0 * d + 0.1, 2.0 * (d + 1) - 0.1, 4))
     for d in range(16)])
lp = LangevinParams(dt=1e-4, friction=1.0, kT=0.5)
st0 = init_spatial_state(setup, template, x0, jax.random.PRNGKey(1),
                         capacity=32, mesh=mesh)
step_auto = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh)
step_off = make_spatial_coord_step(setup, lp, hill_stride=1, mesh=mesh,
                                   overlap_capacity=0)
# the auto filter must ENGAGE at 16 devices (covered fraction ~0.1 of the
# 512-slot gathered round -> 256-slot replay)
compact, n_round, k2, n_log = step_auto.round_shapes(32)
assert k2 == 256 and n_log == 256 and n_round == 512, (compact, n_round, k2, n_log)
sa = so = st0
for _ in range(2):
    sa, _ = step_auto(sa)
    so, _ = step_off(so)
ga = gather_spatial_grid(setup, sa)[1]
go = gather_spatial_grid(setup, so)[1]
np.testing.assert_allclose(ga, go, rtol=1e-12, atol=1e-13)
np.testing.assert_allclose(np.asarray(sa.x), np.asarray(so.x), atol=1e-12)
assert not np.asarray(sa.hills_truncated).any()
assert abs(go).max() > 0.1
print("AUTO16-OK")
"""


@pytest.mark.slow
def test_spatial_overlap_auto_engages_at_16_devices():
    """Auto mode is sized for production meshes: the covered fraction is at
    least 1/n_dev, so the 4x-safety capacity only halves the replay batch
    past 8 devices.  On a 16-device mesh (subprocess; conftest pins this
    process to 8) the default step must engage the filter and still match
    the unfiltered exchange."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c", _AUTO16],
        capture_output=True, text=True, timeout=800,
        cwd="/root/repo",
    )
    assert proc.returncode == 0 and "AUTO16-OK" in proc.stdout, (
        proc.stdout + proc.stderr
    )
