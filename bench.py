"""Driver benchmark — runs on one real TPU chip; prints ONE JSON line.

Primary metric (BASELINE.json): MD steps/sec at 10k-atom pairwise EDM.
The full MD step is measured: LJ forces + pairwise-CV bias forces over all
minimum-image pairs + strided hill rounds — i.e. strictly MORE work per step
than the reference baseline, which was measured on the EDM-side work alone
(synthetic 20-neighbor half list, no LJ, no integration).

Baseline provenance: reference serial build at -O2 on this machine's CPU
(/root/reference, MPI stubbed), 10k atoms x 20 neighbors, hill stride 10,
hill_density 250: 124.47 steps/s.  Hill deposition on a 1e6-point grid
(sigma 0.01, dx 1e-5): 3333.5 hills/s.  See BASELINE.md.

Usage: python bench.py [--quick] [--all]
"""

import argparse
import json
import time

import numpy as np

REF_STEPS_PER_SEC = 124.47  # reference CPU, see module docstring
REF_HILLS_PER_SEC = 3333.5
REF_STEPS_100K = 11.42  # same synthetic workload, 100k atoms (2M pairs/step)
REF_STEPS_2D = 231.6  # 2-D coord EDM, 10k atoms, 1e6-pt grid (ref_bench2d.cpp)


def bench_pairwise(n_atoms=10000, block=500, steps=900, hill_stride=10, dtype=None,
                   pair_lookup="interp", kernel_cap=24, overflow_cap=32):
    # pair_lookup="interp" (the default since round 4) is the REFERENCE's
    # exact production semantics (INTERPOLATE=1, edm_bias.h:18) — and since
    # the per-lane dynamic-gather Hermite fetch (ops/cellforce_pallas) it is
    # also the FASTER path (10k: 1162 vs 1063; 100k: 143.2 vs 127.9 on one
    # v5e chip, same session).  "chebyshev" keeps the spectral approximate
    # path measurable (reported as a secondary metric).
    import jax
    import jax.numpy as jnp

    from edm_tpu import bias as B
    from edm_tpu.models import pair_edm
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.models.lj import LJParams
    from edm_tpu.models.pair_edm_blocked import make_step_blocked
    from edm_tpu.utils.config import parse_edm_text

    dtype = dtype or jnp.float32
    # Well-tempered, RDF-targeted EDM — the reference's production workload
    # (fix edm_pair with a target grid).  The target is the ideal-gas pair
    # distance distribution -ln(r^2): sampled-p x exp(target) is ~flat, so
    # deposition converges to uniform bias growth (zero added force) and the
    # MD stays stationary indefinitely.  An UNtargeted pair bias fights the
    # fluid's equilibrium structure and blows the system up after ~50 hill
    # rounds — measured identically on all three force paths; under jit the
    # step cost is shape-determined, so rates are unaffected by the change.
    from edm_tpu.grid import Grid, GridSpec

    cfg = parse_edm_text(
        "tempering 1\nbias_factor 10\n"
        "hill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
    )
    tspec = GridSpec.create([0.0], [3.0], [0.02], [False])
    r_pts = np.arange(tspec.nbins[0]) * tspec.dx[0] + tspec.min[0]
    tvals = -2.0 * np.log(np.maximum(r_pts, 0.5))
    target = Grid(
        values=jnp.asarray(tvals, dtype), derivs=None, spec=tspec,
        interpolate=False,
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0], dtype=dtype,
        target=target,
    )
    # LJ fluid at density ~0.5
    side = int(np.ceil(n_atoms ** (1 / 3)))
    a = 1.26
    pts = (
        np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)[
            :n_atoms
        ]
        * a
        + 0.5 * a
    )
    box = [side * a] * 3
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.8)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=2.5)

    from edm_tpu.models.cells import CellSpec
    from edm_tpu.models.pair_edm_cells import init_cell_state, make_cell_step

    # panelized spectral table: 4 panels x deg 16 evaluates ~2x cheaper than
    # the old global deg-48 fit at ~50x better worst-case force accuracy
    # (see ops/chebyshev.py docstring)
    core = pair_edm.init_state(
        bias_state, jnp.asarray(pts, dtype), jax.random.PRNGKey(0),
        n_est=n_atoms * 40, pair_lookup=pair_lookup, cheb_deg=16,
        cheb_panels=4,
    )
    spec = CellSpec.create(box, cutoff=3.05, n_atoms=n_atoms)
    if min(spec.ncells) >= 3:
        from edm_tpu.models.driver import pattern_segment

        # kernel_cap=24 (r04): the Newton kernel runs at 24 slot rows /
        # candidates (0.64x the cap-32 pair-slot volume at ~14.6 mean
        # occupancy) and the few tail-slot atoms (sum of max(0, occ-24),
        # ~0.1% at this density) are swept by the dense overflow side
        # pass (ops/cellforce_pallas.overflow_forces_pallas); forces match
        # the full-cap kernel to f32 reduction order, residency/RNG/hill
        # order unchanged.  overflow_cap=32 (r05): the dense sweep's pair
        # tiles follow overflow_cap (sub-tile rows), so a tight cap is
        # cheap (0.76 vs 1.26 ms at 128 rows, 100k) and the measured live
        # tail is <= 8; a tail spike past it runs that rebuild period on
        # the full-cap kernel (never-drop fallback), slower but exact.
        # Same-session TPU A/B: 100k 150.4 (ocap 32) vs 139.8 (128) vs
        # 143.2 (full cap); 10k 1254.8 vs 1169.3 vs 1191.6.
        if kernel_cap is not None and kernel_cap < spec.cap:
            kcap_kw = dict(kernel_cap=kernel_cap, overflow_cap=overflow_cap)
        else:
            kcap_kw = {}
        state = init_cell_state(spec, core, with_ids=False, **kcap_kw)
        # deg 16 x 4 panels / chunk 81 tuned on-chip (see docs/algorithms.md
        # for the accuracy budget; profile in git history); the exact-interp
        # path runs the same Newton kernel with the in-kernel HermiteTable
        # fetch (ops/cellforce_pallas._hermite_val_der).
        # energy_stride=10: the bias energy (observability only, like LAMMPS
        # thermo) is evaluated on hill-round steps; forces are identical.
        # Static stride-cycle phases (hills+energy at 0, plain 1..8,
        # rebuild at 9) driven by pattern_segment: the dynamic conds'
        # pass-through branches would copy the slot planes every step
        kw = dict(
            hill_stride=hill_stride, rebuild_stride=10, hill_capacity=2048,
            cell_chunk=81, use_pallas=True, energy_stride=10, **kcap_kw,
        )
        assert hill_stride == 10 and steps % 10 == 0
        step0 = make_cell_step(
            params, lp, lj, spec, static_do_hills=True,
            static_do_energy=True, static_do_rebuild=False, **kw
        )
        stepm = make_cell_step(
            params, lp, lj, spec, static_do_hills=False,
            static_do_energy=False, static_do_rebuild=False, **kw
        )
        step9 = make_cell_step(
            params, lp, lj, spec, static_do_hills=False,
            static_do_energy=False, static_do_rebuild=True, **kw
        )
        seg = jax.jit(
            pattern_segment([(step0, 1), (stepm, 8), (step9, 1)], steps)
        )
    else:
        state = core
        step = make_step_blocked(
            params, lp, lj, box, hill_stride=hill_stride,
            hill_capacity=2048, block_size=block,
        )
        # unroll=2 merges adjacent steps' op schedules (~3% on the relay)
        seg = jax.jit(
            lambda s: jax.lax.scan(step, s, None, length=steps, unroll=2)
        )
    # warmup/compile; NB on this stack block_until_ready does not reliably
    # block through the remote relay — force a host scalar fetch to time
    def atoms_of(s):
        # slot positions for cell states: core.x is refreshed only at FULL
        # rebuilds (incremental rebins leave it stale)
        return s.xs if hasattr(s, "core") else s.x

    state, _ = seg(state)
    _ = float(jnp.sum(atoms_of(state)))
    dt_s = None
    for _ in range(3):  # best of 3: the remote relay adds run-to-run noise
        t0 = time.perf_counter()
        state, e = seg(state)
        finite = bool(jnp.isfinite(jnp.sum(atoms_of(state)) + jnp.sum(e)))
        dt = time.perf_counter() - t0
        assert finite, "non-finite state in bench"
        dt_s = dt if dt_s is None else min(dt_s, dt)
    if hasattr(state, "core"):
        # table_overflow is strictly CELL-cap exhaustion (atoms dropped
        # from the table — wrong physics); tail-list overflow is NOT an
        # error any more: the step falls back in-graph to the full-cap
        # kernel for that rebuild period (never-drop), counted below
        if bool(state.table_overflow):
            from edm_tpu.models.pair_edm_cells import cell_diag

            d = cell_diag(spec, state)
            raise AssertionError(
                f"cell cap exhausted in bench: max occupancy "
                f"{d['occ_max']} > cap {spec.cap} (atoms dropped)"
            )
        if state.tail_fallbacks is not None and int(state.tail_fallbacks):
            import sys

            print(
                f"# kernel_cap note: {int(state.tail_fallbacks)} rebuild "
                f"period(s) ran the full-cap fallback (tail "
                f"{int(state.tail_count)} at last rebuild vs overflow_cap "
                f"{overflow_cap}); forces exact, steps slower",
                file=sys.stderr,
            )
        assert not bool(state.core.hills_truncated), "hill truncation in bench"
    return steps / dt_s


def bench_coord2d(n_atoms=10000, steps=3000, hill_stride=10, dtype=None,
                  mcgdp=False):
    """2-D coordinate EDM under heavy hill load: 1e6-point grid (1000x1000),
    bias_per_step capping, hill_density 250 — SURVEY config 4 / the
    reference ref_bench2d.cpp workload (free particles, update_force +
    strided add_hills).  Uses the separable MXU deposition path;
    ``mcgdp=True`` makes the box non-periodic (McGovern-De Pablo
    boundary-corrected zero-force hills) exercising the strip-split fast
    path (ops/deposit.dense_tables_mcgdp_2d).

    Cumulative-round budget: this workload is UNtempered (tempering 0),
    so the f32 bias grid grows without bound across the 4x``steps``
    timed segments (compile + 3 timed reps).  At the current 3000-step
    segments the peak bias stays well inside f32 range and the
    finite/overflow asserts below guard it; if segments grow again,
    either re-init state between timed reps or enable tempering."""
    import jax
    import jax.numpy as jnp

    from edm_tpu import bias as B
    from edm_tpu.models import coord_edm
    from edm_tpu.models.driver import strided_segment
    from edm_tpu.models.langevin import LangevinParams
    from edm_tpu.utils.config import parse_edm_text

    dtype = dtype or jnp.float32
    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
        "dimension 2\nbox_low 0 0\nbox_high 10 10\n"
        "bias_spacing 0.01 0.01\nbias_sigma 0.05 0.05\n"
    )
    per = not mcgdp
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0, 0], [10, 10], [0, 0], [10, 10], [per, per], [0, 0],
        dtype=dtype,
    )
    rng = np.random.default_rng(77)
    x0 = jnp.asarray(rng.uniform(0, 10, (n_atoms, 2)), dtype)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=1.0)
    # static hill-phase steps + strided runner: a per-step lax.cond would
    # copy the carried 48 MB corner table + bias grids through its
    # pass-through branch on every non-hill step (driver.strided_segment)
    step_h = coord_edm.make_step(
        params, lp, hill_stride=hill_stride, static_do_hills=True
    )
    step_p = coord_edm.make_step(
        params, lp, hill_stride=hill_stride, static_do_hills=False
    )
    state = coord_edm.init_state(params, bias_state, x0, jax.random.PRNGKey(0), lp)
    seg = jax.jit(strided_segment(step_h, step_p, hill_stride, steps))
    state, _ = seg(state)
    _ = float(jnp.sum(state.x))
    dt_s = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, e = seg(state)
        finite = bool(jnp.isfinite(jnp.sum(state.x) + jnp.sum(e)))
        dt = time.perf_counter() - t0
        assert finite, "non-finite state in 2-D bench"
        dt_s = dt if dt_s is None else min(dt_s, dt)
    assert not bool(state.bias.overflow_error), "buffer overflow in 2-D bench"
    return steps / dt_s


def bench_deposition(grid_points=1_000_000, hills=200, dtype=None):
    import jax
    import jax.numpy as jnp

    from edm_tpu import GaussGrid

    dtype = dtype or jnp.float32
    dx = 10.0 / grid_points
    g = GaussGrid.create([0], [10], [dx], [True], [0.01], dtype=dtype)
    rng = np.random.default_rng(3)
    centers = jnp.asarray(rng.uniform(0, 10, (hills, 1)), dtype)
    heights = jnp.full((hills,), 0.1, dtype)

    # 256 in-graph reps: the 200-hill batch deposits in ~3 ms; the ~30 ms
    # relay dispatch must be <3% of the segment (at 8 reps it dominated)
    REPS = 256

    @jax.jit
    def dep_n(gg, c, h):
        def body(g_acc, k):
            g2, added = g_acc.add_value(c + k * 1e-7, h)
            return g2, jnp.sum(added)
        return jax.lax.scan(body, gg, jnp.arange(REPS, dtype=dtype))

    out, sums = dep_n(g, centers, heights)  # compile
    _ = float(jnp.sum(sums))
    t0 = time.perf_counter()
    out, sums = dep_n(g, centers, heights)
    _ = float(jnp.sum(sums))
    dt_s = time.perf_counter() - t0
    return hills * REPS / dt_s


def _emit(metric, fn, unit, baseline):
    """Failure-isolated metric: run ``fn``, print the JSON value line — or
    an error line — and never raise.  A crash in one secondary bench must
    not erase the other metrics (the r04 driver capture lost every
    pairwise number to one assert; VERDICT r04 weak #3).  Returns True on
    success."""
    import traceback

    try:
        v = fn()
    except BaseException as e:  # noqa: BLE001 — isolate EVERYTHING
        traceback.print_exc()
        print(json.dumps({
            "metric": metric,
            "error": f"{type(e).__name__}: {e}",
        }), flush=True)
        return False
    print(json.dumps({
        "metric": metric,
        "value": round(v, 2 if unit == "steps/s" else 1),
        "unit": unit,
        "vs_baseline": round(v / baseline, 2),
    }), flush=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller sizes")
    ap.add_argument(
        "--all", action="store_true",
        help="(kept for compat; the default run already prints all metrics)",
    )
    args = ap.parse_args()

    if args.quick:
        sps = bench_pairwise(n_atoms=1000, block=250, steps=20)
        print(json.dumps({
            "metric": "MD steps/sec, 1000-atom pairwise EDM (full LJ+bias MD step)",
            "value": round(sps, 2),
            "unit": "steps/s",
            "vs_baseline": round(sps / REF_STEPS_PER_SEC, 2),
        }))
        return

    # secondary metrics first; the primary (driver-parsed) line prints LAST
    _emit(
        "hill depositions/sec, 1e6-point grid",
        bench_deposition, "hills/s", REF_HILLS_PER_SEC,
    )

    # NOTE r04 protocol change: the default pairwise path flipped from
    # "chebyshev" to "interp" (the reference's exact lookup semantics, now
    # also the faster path) — the headline 10k/100k metrics are therefore
    # EXACT-lookup numbers from r04 on; this line keeps the spectral
    # approximate path measurable for cross-round comparison
    _emit(
        "MD steps/sec, 10000-atom pairwise EDM (approx. Chebyshev lookup)",
        lambda: bench_pairwise(steps=600, pair_lookup="chebyshev"),
        "steps/s", REF_STEPS_PER_SEC,
    )

    _emit(
        "MD steps/sec, 2-D coord EDM, 10000 atoms, 1e6-point grid (heavy hill load)",
        bench_coord2d, "steps/s", REF_STEPS_2D,
    )

    _emit(
        "MD steps/sec, 2-D coord EDM, McGDP non-periodic box (heavy hill load)",
        lambda: bench_coord2d(mcgdp=True), "steps/s", REF_STEPS_2D,
    )

    # Long segments: the axon relay costs ~30 ms per dispatch, which at
    # 30 steps/segment inflates the per-step time by ~1 ms (~10% at 100k,
    # ~60% on the sub-ms 2-D steps); the metric is the steady-state step
    # rate, not dispatch latency — segment lengths are sized so dispatch
    # is <~3% of each segment
    _emit(
        "MD steps/sec, 100000-atom pairwise EDM (full LJ+bias MD step, exact cubic-interp lookup)",
        lambda: bench_pairwise(n_atoms=100000, steps=360),
        "steps/s", REF_STEPS_100K,
    )

    ok = _emit(
        "MD steps/sec, 10000-atom pairwise EDM (full LJ+bias MD step, exact cubic-interp lookup)",
        bench_pairwise, "steps/s", REF_STEPS_PER_SEC,
    )
    if not ok:
        raise SystemExit(1)  # the primary metric itself failed


if __name__ == "__main__":
    main()
