"""Pallas TPU kernels: fused cell-pair force pass (LJ + spectral bias CV).

The cell-list host's per-chunk force math (models/pair_edm_cells) runs
through XLA, which materializes the (cap, width) displacement / distance /
Clenshaw intermediates between fusions.  These kernels perform the entire
per-cell pair computation — minimum-image displacements, LJ, (possibly
panelized) Chebyshev value+derivative Clenshaw chains, masking, row
reduction — inside one VMEM-resident program per 8-cell group, so the only
HBM traffic is the rolled stencil coordinates in and force rows out.

Three variants, newest first:
  - ``_kernel_newton_rc`` (production): half stencil (each cross-cell pair
    once) with Newton reverse-force credits accumulated in-kernel into
    full-lattice VMEM-resident output planes — TPU Pallas grids execute
    sequentially on the core, so cross-program read-modify-write is
    race-free;
  - ``_kernel_newton``: same pair math, credits returned as column-sum
    outputs for the caller to roll onto neighbor cells (used by the
    slab-sharded sub-lattice path);
  - ``_kernel``: legacy 27-stencil ordered-pair kernel (needs slot-id
    masks for self-pair detection).

Inputs are prepared by XLA (lattice rolls concatenated straight into the
xyz-major kernel layout).  The Newton kernels evaluate the bias table in
one of two forms: a (panelized) Chebyshev series (ChebTable) or the exact
cubic-Hermite grid table (HermiteTable — the ``pair_lookup='interp'``
path, a per-lane dynamic-gather fetch from the VMEM-resident row-major
(4, G) table), and optionally restrict the CV to an rdf type pair via per-slot
type planes (fix_edm_pair.cpp:39-44,177-202).  The legacy 27-stencil
``_kernel`` remains Chebyshev-only/untyped.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS_PER_PROGRAM = 8

# The Hermite fetch's 151-row select-accumulate chain (x 8 unrolled cells,
# x 5 live vectors with the energy epilogue) needs ~29 MB of scheduler
# stack on v5e — over Mosaic's 16 MB default scoped-vmem budget but well
# inside the 128 MB core VMEM (the kernels' block buffers are <1 MB).
# Measured: energy=True Hermite compiles OOM at the default, runs at 64 MB.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# Half stencil: the 13 lexicographically-positive cell offsets.  Every
# unordered cross-cell pair (c, c+d) appears exactly once (for ncells >= 3
# per dim, d1 != d2 (mod ncells) for distinct half offsets); the reverse
# force is credited to the neighbor cell by rolling the kernel's column
# sums (Newton's third law — halves the pair FLOPs of the 27-stencil).
HALF_OFFSETS = tuple(
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) > (0, 0, 0)
)


def _cheb_val_der(cv_ref, cd_ref, r, ok, *, deg, npanels, cv_lo, cv_hi, energy):
    """In-kernel (possibly panelized) Chebyshev val+der evaluation.

    cv_ref/cd_ref are (npanels, deg+1) VMEM refs; panel coefficients are
    picked per lane with an (npanels-1)-deep select chain (no gathers).
    ``energy=False`` skips the value chain entirely (returns val=None)."""
    cv_on = jnp.where((r >= cv_lo) & (r <= cv_hi), ok, 0.0)
    rc = jnp.clip(r, cv_lo, cv_hi)
    if npanels == 1:
        t = (2.0 * rc - (cv_lo + cv_hi)) / (cv_hi - cv_lo)

        def coef(ref, k):
            return ref[0, k]
    else:
        pw = (cv_hi - cv_lo) / npanels
        pf = jnp.clip(jnp.floor((rc - cv_lo) / pw), 0.0, float(npanels - 1))
        t = (2.0 * (rc - cv_lo - pf * pw) - pw) / pw
        masks = [pf >= p for p in range(1, npanels)]

        def coef(ref, k):
            v = jnp.where(masks[0], ref[1, k], ref[0, k])
            for p in range(2, npanels):
                v = jnp.where(masks[p - 1], ref[p, k], v)
            return v

    t2 = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    d1 = jnp.zeros_like(t)
    d2 = jnp.zeros_like(t)
    for k in range(deg, 0, -1):
        if energy:
            b0 = coef(cv_ref, k) + t2 * b1 - b2
            b2, b1 = b1, b0
        e0 = coef(cd_ref, k) + t2 * d1 - d2
        d2, d1 = d1, e0
    der = (coef(cd_ref, 0) + t * d1 - d2) * cv_on
    val = (coef(cv_ref, 0) + t * b1 - b2) * cv_on if energy else None
    return val, der, cv_on


class HermiteTable(NamedTuple):
    """Exact cubic-Hermite pair table — the in-kernel form of the XLA
    interpolation path (ops/interp.py ↔ reference lib/grid.h:95-137).

    ``tab`` (4, GP) ROW-MAJOR, GP = G padded up to a 128-lane multiple:
    per grid interval the HORNER coefficients (a, b1, c1, d1) of the
    interval cubic — the same interpolant ops/interp._interp1d_matvec
    evaluates from (value, qq, next-value, next-qq) corner pairs
    (grid.h:95-137), refactored to monomial form at table-build time so
    the in-kernel fetch gathers 3 rows on force-only steps (derivative
    dV/dr = b1 + c1*t + d1*t^2) and 4 when the energy is needed
    (V = a + dx*(b1*t + c1*t^2/2 + d1*t^3/3)).  The row-major layout is
    a Mosaic constraint: the per-lane dynamic gather needs each
    coefficient's G values contiguous along lanes (column slices of a
    (G, 4) table do not lower).  Identical polynomial, different
    evaluation order vs the XLA path: agreement is to f32 rounding, not
    bitwise.  ``geom`` is the static lookup geometry ("hermite", G,
    grid_lo, dx, grid_hi_exclusive, boundary_lo, boundary_hi) with the
    range floats computed in grid dtype so the in-kernel masks reproduce
    the XLA path's edge behavior."""

    tab: jax.Array
    geom: tuple


def hermite_pair_table(gg) -> HermiteTable:
    """Build the in-kernel exact table from a 1-D pairwise-CV GaussGrid.

    Requires the standard fix_edm_pair grid shape (non-periodic grid AND
    boundary, boundary == grid range, stored derivatives): remap is then the
    identity and lookup validity collapses to a range check, so the kernel
    can reproduce GaussGrid.get_value_deriv with four comparisons."""
    g = gg.grid
    spec = gg.spec
    if spec.dim != 1:
        raise ValueError("hermite pair table is for 1-D CV grids")
    if g.spec.periodic[0] or spec.boundary_periodic[0]:
        raise ValueError("hermite pair table requires a non-periodic grid")
    if g.derivs is None or not gg.grid.interpolate:
        raise ValueError("hermite pair table needs an interpolating grid")
    if int(g.spec.nbins[0]) > 1024:
        raise ValueError(
            "hermite pair table unrolls the fetch over grid points; "
            f"{g.spec.nbins[0]} points would dominate the kernel — use "
            "pair_lookup='chebyshev' or the XLA path (use_pallas=False)"
        )
    dt = np.dtype(g.values.dtype)
    glo = float(np.asarray(g.spec.min[0], dt))
    gdx = float(np.asarray(g.spec.dx[0], dt))
    # grid.in_grid upper edge: max_inflated - dx, computed in grid dtype
    ghi_eff = float(np.asarray(g.spec.max[0], dt) - np.asarray(g.spec.dx[0], dt))
    blo = float(np.asarray(spec.boundary_min[0], dt))
    bhi = float(np.asarray(spec.boundary_max[0], dt))
    v = g.values
    d = g.derivs[:, 0]
    # qq = desired endpoint slope / endpoint value with the 0/0 guard
    # (grid.h:113-116) is a pure per-point table quantity: precomputing it
    # removes the per-pair divide and reproduces the XLA path's qq exactly
    # (same operation on the same operands)
    safe = jnp.abs(v) >= 1e-7
    qq = jnp.where(safe, -d / jnp.where(safe, v, 1.0), 0.0)
    vn = jnp.concatenate([v[1:], v[-1:]])
    qn = jnp.concatenate([qq[1:], qq[-1:]])
    # Horner coefficients of the interval cubic V(t) = a + b*t + c*t^2 +
    # d*t^3 (t in [0, 1)); from the two-corner form
    # v0*[(1-3t^2+2t^3) - dx*q0*(t-2t^2+t^3)] +
    # v1*[(3t^2-2t^3) + dx*q1*(t^3-t^2)].  Stored derivative-ready:
    # b1 = b/dx, c1 = 2c/dx, d1 = 3d/dx make dV/dr one 2-FMA Horner
    # chain, cutting the per-row fetch from 4 accumulates (corner pairs)
    # to 3 on force-only steps
    gq0 = gdx * qq
    gq1 = gdx * qn
    ccoef = v * (gq0 + gq0 - 3.0) + vn * (gq1 + 3.0)
    dcoef = v * (2.0 - gq0) - vn * (gq1 + 2.0)
    # row-major (4, GP): one contiguous 128-lane-aligned row per Horner
    # coefficient so the in-kernel per-lane gather can slice 128-entry
    # segments (see HermiteTable docstring); zero padding is never
    # addressed (idx clipped to G-1)
    tab = jnp.stack([v, -qq * v, (ccoef + ccoef) / gdx, (dcoef * 3.0) / gdx])
    G = int(g.spec.nbins[0])
    GP = -(-G // 128) * 128
    tab = jnp.pad(tab, ((0, 0), (0, GP - G)))
    return HermiteTable(tab=tab, geom=("hermite", G, glo, gdx, ghi_eff, blo, bhi))


def _table_preload(t1_ref, table):
    """Hoist the hermite table's 128-lane segment slices out of the
    per-cell loop: sliced once per program, reused by all
    CELLS_PER_PROGRAM cells.  preload[col][s] is the (1, 128) row slice
    holding coefficient ``col``'s values for grid intervals
    [128*s, 128*(s+1)).  Returns None for the Chebyshev form."""
    if table[0] != "hermite":
        return None
    G = table[1]
    S = -(-G // 128)
    return [
        [t1_ref[c, 128 * s : 128 * (s + 1)].reshape(1, 128) for s in range(S)]
        for c in range(4)
    ]


def _hermite_val_der(r, ok, *, geom, energy, preload):
    """In-kernel exact cubic-Hermite value+derivative lookup.

    Coefficient fetch is a per-lane dynamic gather (Mosaic lowers
    ``jnp.take_along_axis`` along the 128 lanes of a vreg): the candidate
    axis is processed in 128-lane chunks; per chunk each coefficient row
    costs one gather per 128-interval table segment plus a segment-select
    chain — for the standard G=151 grid, 2 gathers + 1 select per
    coefficient, ~20 VPU ops per pair total vs ~4*G for the replaced
    unrolled select-accumulate fetch.  Same interpolant as
    ops/interp._interp1d_matvec (hermite_pair_table refactors the corner
    form to monomial coefficients), agreeing to f32 rounding — covered by
    the force tolerance of test_pallas_interp_exact_matches_xla; the
    gathered coefficients are bitwise the select-accumulate ones
    (test_hermite_gather_fetch_bitwise)."""
    _, G, glo, gdx, ghi_eff, blo, bhi = geom
    # GaussGrid.in_bounds ([blo, bhi] inclusive) x grid.in_grid ([glo,
    # max-dx) half-open) — the same two masks the XLA lookup applies
    okr = (r >= blo) & (r <= bhi) & (r >= glo) & (r < ghi_eff)
    cv_on = jnp.where(okr, ok, 0.0)
    idxf = jnp.clip(jnp.floor((r - glo) / gdx), 0.0, float(G - 1))
    t = (r - glo - idxf * gdx) / gdx
    cap, W = r.shape
    S = -(-G // 128)
    cols = (0, 1, 2, 3) if energy else (1, 2, 3)
    # broadcast each (1, 128) table segment across the cap sublanes once
    # per cell (the gather source and index must share sublane count)
    segs = {
        c: [jnp.broadcast_to(preload[c][s], (cap, 128)) for s in range(S)]
        for c in cols
    }
    idx = idxf.astype(jnp.int32)
    fetched = {c: [] for c in cols}
    for j0 in range(0, W, 128):
        w = min(128, W - j0)
        ij = idx[:, j0 : j0 + w]
        if w < 128:
            # Mosaic's dynamic gather needs same-shape (cap, 128) source
            # and index tiles: pad the remainder chunk's indices and slice
            # the fetched values back down
            ij = jnp.concatenate(
                [ij, jnp.zeros((cap, 128 - w), jnp.int32)], axis=1
            )
        for c in cols:
            v = None
            for s in range(S):
                iseg = jnp.clip(ij - 128 * s, 0, 127)
                vs = jnp.take_along_axis(segs[c][s], iseg, axis=1)
                v = vs if s == 0 else jnp.where(ij >= 128 * s, vs, v)
            fetched[c].append(v if w == 128 else v[:, :w])
    cat = (lambda xs: xs[0]) if len(fetched[cols[0]]) == 1 else (
        lambda xs: jnp.concatenate(xs, axis=1)
    )
    b0 = cat(fetched[1])
    c0 = cat(fetched[2])
    d0 = cat(fetched[3])
    der = (b0 + t * (c0 + t * d0)) * cv_on
    if energy:
        a0 = cat(fetched[0])
        # V = a + dx*(b1*t + c1*t^2/2 + d1*t^3/3)
        val = (
            a0 + (t * gdx) * (b0 + t * (0.5 * c0 + (1.0 / 3.0) * (t * d0)))
        ) * cv_on
    else:
        val = None
    return val, der, cv_on


def _table_val_der(t1_ref, t2_ref, r, ok, *, table, energy, preload=None):
    """Dispatch the bias-table evaluation: panelized-Chebyshev Clenshaw
    (t1=cval, t2=cder) or exact Hermite (t1=tab, t2 unused)."""
    if table[0] == "hermite":
        if preload is None:
            preload = _table_preload(t1_ref, table)
        return _hermite_val_der(r, ok, geom=table, energy=energy, preload=preload)
    _, deg, npanels, cv_lo, cv_hi = table
    return _cheb_val_der(
        t1_ref, t2_ref, r, ok, deg=deg, npanels=npanels,
        cv_lo=cv_lo, cv_hi=cv_hi, energy=energy,
    )


def _cv_type_mask(tc_ref, tn_ref, b, ok, *, cap, tpair, self_block):
    """rdf type-pair CV mask (fix_edm_pair.cpp:39-44,177-202): restrict the
    biased CV (never the LJ fluid) to unordered {ti, tj} type pairs.
    ``self_block``: prepend the local cell's own types to the candidate axis
    (the Newton kernels' [self | neighbors] layout)."""
    if tpair is None:
        return ok
    ti, tj = tpair
    tl = tc_ref[b, :]
    tw = jnp.concatenate([tl, tn_ref[b, :]]) if self_block else tn_ref[b, :]
    tok = ((tl[:, None] == ti) & (tw[None, :] == tj)) | (
        (tl[:, None] == tj) & (tw[None, :] == ti)
    )
    return jnp.where(tok, ok, 0.0)


def _kernel(
    xc_ref,  # (8, cap*3)   local cell coords, xyz-major ([x all; y all; z all])
    xn_ref,  # (8, 27cap*3) stencil coords, same layout
    mc_ref,  # (8, cap)     1.0 for real local atoms
    mn_ref,  # (8, 27cap)   1.0 for real stencil atoms
    sid_ref,  # (8, cap)    local slot ids (float)
    nid_ref,  # (8, 27cap)  stencil slot ids (float); padding = -1
    cv_ref,  # (1, DEGP)    chebyshev value coeffs (padded)
    cd_ref,  # (1, DEGP)    chebyshev deriv coeffs
    fx_ref,  # (8, cap) out
    fy_ref,
    fz_ref,
    eb_ref,  # (8, cap) out: per-local-atom bias energy contribution
    *,
    params,
):
    cap, ncand, deg, npanels, bx, by, bz, eps, sig, rcut, cv_lo, cv_hi = params

    def one_cell(b, _):
        xl = xc_ref[b, :]
        xn = xn_ref[b, :]
        # split xyz planes (static slices)
        lx, ly, lz = xl[0:cap], xl[cap : 2 * cap], xl[2 * cap : 3 * cap]
        nx = xn[0:ncand]
        ny = xn[ncand : 2 * ncand]
        nz = xn[2 * ncand : 3 * ncand]

        def mimage(d, L):
            # reciprocal multiply: VPU division costs several issue slots
            # per element; L is a static box length so 1/L folds to a
            # compile-time constant
            return d - jnp.floor(d * (1.0 / L) + 0.5) * L

        dx = mimage(lx[:, None] - nx[None, :], bx)
        dy = mimage(ly[:, None] - ny[None, :], by)
        dz = mimage(lz[:, None] - nz[None, :], bz)
        r2 = dx * dx + dy * dy + dz * dz

        # validity: both real, not the same slot (self pair)
        same = jnp.abs(sid_ref[b, :][:, None] - nid_ref[b, :][None, :])
        ok = mc_ref[b, :][:, None] * mn_ref[b, :][None, :]
        ok = jnp.where(same < 0.5, 0.0, ok)

        # invalid pairs (empty slots / self) can sit at r2 == 0 exactly
        # (padding clones a real atom's coordinates); feed them a safe
        # distance BEFORE the LJ powers — inf * 0-mask would make NaN
        r2s = jnp.where(ok > 0.5, jnp.maximum(r2, 1e-12), 1.0)
        # one transcendental per slot: rsqrt gives 1/r; r and 1/r^2 are
        # multiplies off it (divisions cost several FMA slots on the VPU)
        inv_r = jax.lax.rsqrt(r2s)
        r = r2s * inv_r
        inv_r2 = inv_r * inv_r

        # LJ (truncated)
        lj_on = jnp.where(r < rcut, ok, 0.0)
        sr2 = (sig * sig) * inv_r2
        sr6 = sr2 * sr2 * sr2
        fmag_r = 4.0 * eps * (12.0 * sr6 * sr6 - 6.0 * sr6) * inv_r2 * lj_on

        # spectral bias: clenshaw val+der on clamped r
        # der/val come back pre-masked by the table's cv_on (0/1), so the
        # force combine needs no second mask multiply
        val, der, _ = _cheb_val_der(
            cv_ref, cd_ref, r, ok, deg=deg, npanels=npanels,
            cv_lo=cv_lo, cv_hi=cv_hi, energy=True,
        )

        f_over_r = fmag_r - der * inv_r

        fx_ref[b, :] = jnp.sum(f_over_r * dx, axis=1)
        fy_ref[b, :] = jnp.sum(f_over_r * dy, axis=1)
        fz_ref[b, :] = jnp.sum(f_over_r * dz, axis=1)
        eb_ref[b, :] = jnp.sum(val, axis=1)
        return 0

    jax.lax.fori_loop(0, CELLS_PER_PROGRAM, one_cell, 0, unroll=True)


def _kernel_newton(
    xc_ref,  # (8, cap*3)    local cell coords, xyz-major
    xn_ref,  # (8, 13cap*3)  half-stencil coords, xyz-major
    mc_ref,  # (8, cap)      1.0 for real local atoms
    mn_ref,  # (8, 13cap)    1.0 for real half-stencil atoms
    cv_ref,  # (NP, DEGP) chebyshev value coeffs | (G, 4) hermite table
    cd_ref,  # (NP, DEGP) chebyshev deriv coeffs | (1, 8) unused dummy
    tc_ref,  # (8, cap)   local atom types | (1, 1) dummy when untyped
    tn_ref,  # (8, 13cap) half-stencil types | (1, 1) dummy
    fx_ref,  # (8, cap) out: force on local atoms from ALL pairs seen here
    fy_ref,
    fz_ref,
    fnx_ref,  # (8, 13cap) out: +sum_i f_over_r*d — NEGATE and roll to credit
    fny_ref,  #             the neighbor cell's atoms (Newton's third law)
    fnz_ref,
    eb_ref,  # (8, cap) out: bias energy rows (self block pre-halved)
    *,
    params,
):
    """Half-stencil variant of ``_kernel``: each cell evaluates its self
    block (cap x cap, diagonal masked, both orderings present so row sums
    are complete) plus 13 cross blocks (cap x 13cap, one ordering only);
    the missing reverse forces come out as column sums for the caller to
    roll back onto the neighbor cells.  Same pair math, ~half the FLOPs of
    the 27-stencil ordered-pair kernel.

    With ``energy=False`` the value Clenshaw chain (only consumed for the
    reported bias energy, not the dynamics) is skipped — the derivative
    chain alone drives the forces — and eb_ref is written as zeros.  The
    chain is ~40% of the kernel's FLOPs at deg 48."""
    (cap, ncand, table, tpair, bx, by, bz, eps, sig, rcut, energy) = params
    width = cap + ncand  # candidate axis: [self cell | 13 neighbor cells]
    preload = _table_preload(cv_ref, table)

    def one_cell(b, _):
        xl = xc_ref[b, :]
        xn = xn_ref[b, :]
        lx, ly, lz = xl[0:cap], xl[cap : 2 * cap], xl[2 * cap : 3 * cap]
        nx = jnp.concatenate([lx, xn[0:ncand]])
        ny = jnp.concatenate([ly, xn[ncand : 2 * ncand]])
        nz = jnp.concatenate([lz, xn[2 * ncand : 3 * ncand]])

        def mimage(d, L):
            # reciprocal multiply: VPU division costs several issue slots
            # per element; L is a static box length so 1/L folds to a
            # compile-time constant
            return d - jnp.floor(d * (1.0 / L) + 0.5) * L

        dx = mimage(lx[:, None] - nx[None, :], bx)
        dy = mimage(ly[:, None] - ny[None, :], by)
        dz = mimage(lz[:, None] - nz[None, :], bz)
        r2 = dx * dx + dy * dy + dz * dz

        ok = mc_ref[b, :][:, None] * jnp.concatenate(
            [mc_ref[b, :], mn_ref[b, :]]
        )[None, :]
        # the self block's diagonal is the only same-slot case (cross blocks
        # are distinct cells for ncells >= 3)
        ri = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 1)
        ok = jnp.where(ri == ci, 0.0, ok)

        r2s = jnp.where(ok > 0.5, jnp.maximum(r2, 1e-12), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        r = r2s * inv_r
        inv_r2 = inv_r * inv_r

        lj_on = jnp.where(r < rcut, ok, 0.0)
        sr2 = (sig * sig) * inv_r2
        sr6 = sr2 * sr2 * sr2
        fmag_r = 4.0 * eps * (12.0 * sr6 * sr6 - 6.0 * sr6) * inv_r2 * lj_on

        ok_cv = _cv_type_mask(
            tc_ref, tn_ref, b, ok, cap=cap, tpair=tpair, self_block=True
        )
        # der/val come back pre-masked by the table's cv_on (0/1), so the
        # force combine needs no second mask multiply
        val, der, _ = _table_val_der(
            cv_ref, cd_ref, r, ok_cv, table=table, energy=energy,
            preload=preload,
        )

        f_over_r = fmag_r - der * inv_r
        gx = f_over_r * dx
        gy = f_over_r * dy
        gz = f_over_r * dz

        fx_ref[b, :] = jnp.sum(gx, axis=1)
        fy_ref[b, :] = jnp.sum(gy, axis=1)
        fz_ref[b, :] = jnp.sum(gz, axis=1)
        fnx_ref[b, :] = jnp.sum(gx[:, cap:], axis=0)
        fny_ref[b, :] = jnp.sum(gy[:, cap:], axis=0)
        fnz_ref[b, :] = jnp.sum(gz[:, cap:], axis=0)
        if energy:
            # self-block pairs appear in both orderings (i,j)/(j,i): halve;
            # cross blocks see each pair once so E = sum(eb)
            w = jnp.where(ci < cap, 0.5, 1.0)
            eb_ref[b, :] = jnp.sum(val * w, axis=1)
        else:
            eb_ref[b, :] = jnp.zeros((cap,), jnp.float32)
        return 0

    jax.lax.fori_loop(0, CELLS_PER_PROGRAM, one_cell, 0, unroll=True)


def _table_inputs(table):
    """(t1 array, t2 array, static table tuple) from a ChebTable or
    HermiteTable — the two bias-table forms the Newton kernels evaluate."""
    if isinstance(table, HermiteTable):
        return table.tab, jnp.zeros((1, 8), table.tab.dtype), table.geom
    cv2 = table.cval if table.cval.ndim == 2 else table.cval[None, :]
    cd2 = table.cder if table.cder.ndim == 2 else table.cder[None, :]
    NP, DEGP = cv2.shape
    return cv2, cd2, ("cheb", DEGP - 1, NP, float(table.lo), float(table.hi))


def _type_inputs(types, type_pair, cap, ncand, row_spec, dtype):
    """(tc, tn, static tpair, tc_spec, tn_spec) — dummies when untyped."""
    if types is None or type_pair is None:
        dummy = jnp.zeros((1, 1), dtype)
        spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return dummy, dummy, None, spec, spec
    tc, tn = types
    tpair = (float(type_pair[0]), float(type_pair[1]))
    return tc, tn, tpair, row_spec(cap), row_spec(ncand)


def cell_forces_pallas_newton(
    xc, xn, mc, mn, table, *,
    cap, box, lj_eps, lj_sig, lj_rcut, energy=True,
    types=None, type_pair=None,
):
    """Half-stencil Newton force kernel.

    xc (Cg, cap, 3) local slot coords; xn (Cg, 13cap, 3) half-stencil
    coords (HALF_OFFSETS order); mc/mn float masks; ``table`` a ChebTable
    (spectral lookup) or HermiteTable (exact cubic-Hermite lookup).
    Returns (f_local (Cg, cap, 3), f_neigh (Cg, 13cap, 3), eb (Cg, cap))
    where ``f_neigh[c, k*cap:(k+1)*cap]`` must be SUBTRACTED from cell
    ``c + HALF_OFFSETS[k]``'s slots (the caller rolls the lattice).
    Energy is ``jnp.sum(eb)`` — no 0.5 factor (pairs counted once)."""
    xc_f = jnp.concatenate([xc[..., 0], xc[..., 1], xc[..., 2]], axis=1)
    xn_f = jnp.concatenate([xn[..., 0], xn[..., 1], xn[..., 2]], axis=1)
    fx, fy, fz, fnx, fny, fnz, eb = cell_forces_pallas_newton_planar(
        xc_f, xn_f, mc, mn, table,
        cap=cap, box=box, lj_eps=lj_eps, lj_sig=lj_sig, lj_rcut=lj_rcut,
        energy=energy, types=types, type_pair=type_pair,
    )
    f = jnp.stack([fx, fy, fz], axis=-1)
    fn = jnp.stack([fnx, fny, fnz], axis=-1)
    return f, fn, eb


def _kernel_newton_rc(
    xc_ref,  # (8, cap*3)    local cell coords, xyz-major (streamed block)
    xn_ref,  # (8, 13cap*3)  half-stencil coords, xyz-major (streamed block)
    mc_ref,  # (8, cap)      local-row mask (streamed block)
    mn_ref,  # (8, 13cap)    half-stencil candidate mask (streamed block)
    cv_ref,  # (NP, DEGP) chebyshev value coeffs | (G, 4) hermite table
    cd_ref,  # (NP, DEGP) chebyshev deriv coeffs | (1, 8) unused dummy
    tc_ref,  # (8, cap)   local atom types | (1, 1) dummy when untyped
    tn_ref,  # (8, 13cap) half-stencil types | (1, 1) dummy
    fx_ref,  # (Cg, cap) RESIDENT out: accumulated x-forces (rows + credits)
    fy_ref,  # (Cg, cap) RESIDENT
    fz_ref,  # (Cg, cap) RESIDENT
    eb_ref,  # (8, cap) out: bias-energy rows (streamed block)
    *,
    params,
):
    """Half-stencil Newton kernel with in-kernel credit accumulation.

    Same pair math as ``_kernel_newton``, but the force outputs are
    full-lattice VMEM-resident arrays with constant index maps: TPU Pallas
    grids execute sequentially on the core, so each program can
    read-modify-write its 13 neighbor cells' force rows directly (one
    (cap,)-row RMW per component per neighbor).  This removes the
    (Cg, 13cap) x 3 credit outputs (~34 MB at 100k atoms) and the 13
    XLA lattice rolls that applied them."""
    (cap, ncand, table, tpair, nx_c, ny_c, nz_c, bx, by, bz, eps, sig, rcut,
     energy, row_box) = params
    width = cap + ncand
    C = nx_c * ny_c * nz_c
    preload = _table_preload(cv_ref, table)
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        fx_ref[...] = jnp.zeros_like(fx_ref)
        fy_ref[...] = jnp.zeros_like(fy_ref)
        fz_ref[...] = jnp.zeros_like(fz_ref)

    def one_cell(b, _):
        i = p * CELLS_PER_PROGRAM + b
        if row_box is not None:
            # rows cover only the sub-box [origin, origin+rdims) of the
            # lattice (a sharded host's OWNED cells inside its halo
            # window): decompose the row id over rdims, then shift into
            # lattice coordinates.  Wrap per axis so padded rows beyond
            # prod(rdims) still index a valid resident row (their masks
            # are zero, so the RMW adds nothing).
            (ox, oy, oz), (rx_d, ry_d, rz_d) = row_box
            rzc = jnp.int32(rz_d)
            ryc = jnp.int32(ry_d)
            r_z = jax.lax.rem(i, rzc)
            r_y = jax.lax.rem(i // rzc, ryc)
            r_x = i // (ryc * rzc)
            i = (
                jax.lax.rem(jnp.int32(ox) + r_x, jnp.int32(nx_c))
                * (ny_c * nz_c)
                + jax.lax.rem(jnp.int32(oy) + r_y, jnp.int32(ny_c)) * nz_c
                + jax.lax.rem(jnp.int32(oz) + r_z, jnp.int32(nz_c))
            )
        xl = xc_ref[b, :]
        xn = xn_ref[b, :]
        lx, ly, lz = xl[0:cap], xl[cap : 2 * cap], xl[2 * cap : 3 * cap]
        nx = jnp.concatenate([lx, xn[0:ncand]])
        ny = jnp.concatenate([ly, xn[ncand : 2 * ncand]])
        nz = jnp.concatenate([lz, xn[2 * ncand : 3 * ncand]])

        def mimage(d, L):
            # reciprocal multiply: VPU division costs several issue slots
            # per element; L is a static box length so 1/L folds to a
            # compile-time constant
            return d - jnp.floor(d * (1.0 / L) + 0.5) * L

        dx = mimage(lx[:, None] - nx[None, :], bx)
        dy = mimage(ly[:, None] - ny[None, :], by)
        dz = mimage(lz[:, None] - nz[None, :], bz)
        r2 = dx * dx + dy * dy + dz * dz

        ok = mc_ref[b, :][:, None] * jnp.concatenate(
            [mc_ref[b, :], mn_ref[b, :]]
        )[None, :]
        ri = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (cap, width), 1)
        ok = jnp.where(ri == ci, 0.0, ok)

        r2s = jnp.where(ok > 0.5, jnp.maximum(r2, 1e-12), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        r = r2s * inv_r
        inv_r2 = inv_r * inv_r

        lj_on = jnp.where(r < rcut, ok, 0.0)
        sr2 = (sig * sig) * inv_r2
        sr6 = sr2 * sr2 * sr2
        fmag_r = 4.0 * eps * (12.0 * sr6 * sr6 - 6.0 * sr6) * inv_r2 * lj_on

        ok_cv = _cv_type_mask(
            tc_ref, tn_ref, b, ok, cap=cap, tpair=tpair, self_block=True
        )
        # der/val come back pre-masked by the table's cv_on (0/1), so the
        # force combine needs no second mask multiply
        val, der, _ = _table_val_der(
            cv_ref, cd_ref, r, ok_cv, table=table, energy=energy,
            preload=preload,
        )

        f_over_r = fmag_r - der * inv_r
        gx = f_over_r * dx
        gy = f_over_r * dy
        gz = f_over_r * dz

        fx_ref[i, :] = fx_ref[i, :] + jnp.sum(gx, axis=1)
        fy_ref[i, :] = fy_ref[i, :] + jnp.sum(gy, axis=1)
        fz_ref[i, :] = fz_ref[i, :] + jnp.sum(gz, axis=1)
        if energy:
            w = jnp.where(ci < cap, 0.5, 1.0)
            eb_ref[b, :] = jnp.sum(val * w, axis=1)
        else:
            eb_ref[b, :] = jnp.zeros((cap,), jnp.float32)

        # Newton credits, applied in place: neighbor flat ids from the
        # cell's lattice coordinates (wrapped per axis)
        # int32 constants: under x64 a bare python int promotes to int64
        # and lax.rem rejects the mixed dtypes
        nzc = jnp.int32(nz_c)
        nyc = jnp.int32(ny_c)
        nxc = jnp.int32(nx_c)
        iz = jax.lax.rem(i, nzc)
        iy = jax.lax.rem(i // nzc, nyc)
        ix = i // (nyc * nzc)
        cgx = jnp.sum(gx[:, cap:], axis=0)
        cgy = jnp.sum(gy[:, cap:], axis=0)
        cgz = jnp.sum(gz[:, cap:], axis=0)
        for k, (dxo, dyo, dzo) in enumerate(HALF_OFFSETS):
            j = (
                jax.lax.rem(ix + jnp.int32(dxo) + nxc, nxc) * (nyc * nzc)
                + jax.lax.rem(iy + jnp.int32(dyo) + nyc, nyc) * nzc
                + jax.lax.rem(iz + jnp.int32(dzo) + nzc, nzc)
            )
            sl = slice(k * cap, (k + 1) * cap)
            fx_ref[j, :] = fx_ref[j, :] - cgx[sl]
            fy_ref[j, :] = fy_ref[j, :] - cgy[sl]
            fz_ref[j, :] = fz_ref[j, :] - cgz[sl]
        return 0

    jax.lax.fori_loop(0, CELLS_PER_PROGRAM, one_cell, 0, unroll=True)


def cell_forces_pallas_newton_rescredit(
    xc_f, xn_f, mc, mn, table, *,
    cap, ncells, box, lj_eps, lj_sig, lj_rcut, energy=True,
    types=None, type_pair=None, row_box=None, out_cells=None,
):
    """Planar Newton kernel with resident in-kernel credit accumulation.

    Inputs as ``cell_forces_pallas_newton_planar`` plus the lattice shape;
    padded cells (beyond nx*ny*nz) must carry zero masks.  Returns
    (fx, fy, fz (Cg, cap) — credits already applied — and eb (Rg, cap)).
    The three force planes live in VMEM for the whole pass (3 x Cg x cap
    floats), bounding the lattice at roughly 1M slots per core.

    ``row_box=((ox, oy, oz), (rx, ry, rz))`` restricts the ROW programs to
    the lattice sub-box [origin, origin+rdims) — a sharded host's owned
    cells inside its halo window — so the kernel stops paying row-side
    compute for halo cells whose row mask is zero anyway.  The planar
    inputs must then be row-compacted to that sub-box (Rg rows), while
    the resident force planes still span the full window: pass the padded
    window cell count as ``out_cells``.  Credits from owned rows reach at
    most one cell into the halo ring, which the window contains."""
    Cg = xc_f.shape[0]
    ncand = xn_f.shape[1] // 3
    assert Cg % CELLS_PER_PROGRAM == 0
    n_prog = Cg // CELLS_PER_PROGRAM
    nx_c, ny_c, nz_c = ncells
    if row_box is not None:
        assert out_cells is not None, "row_box needs the window out_cells"
        origin, rdims = row_box
        row_box = (
            tuple(int(o) for o in origin), tuple(int(r) for r in rdims),
        )
    Cg_out = Cg if out_cells is None else int(out_cells)
    t1, t2, tspec = _table_inputs(table)

    P = CELLS_PER_PROGRAM
    interpret = jax.default_backend() == "cpu"

    def row_spec(width):
        return pl.BlockSpec((P, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def resident():
        return pl.BlockSpec(
            (Cg_out, cap), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    tc, tn, tpair, tc_spec, tn_spec = _type_inputs(
        types, type_pair, cap, ncand, row_spec, xc_f.dtype
    )
    params = (
        cap, ncand, tspec, tpair, nx_c, ny_c, nz_c,
        float(box[0]), float(box[1]), float(box[2]),
        float(lj_eps), float(lj_sig), float(lj_rcut), bool(energy),
        row_box,
    )
    kernel = functools.partial(_kernel_newton_rc, params=params)

    fx, fy, fz, eb = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            row_spec(3 * cap),
            row_spec(3 * ncand),
            row_spec(cap),
            row_spec(ncand),
            pl.BlockSpec(t1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(t2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            tc_spec,
            tn_spec,
        ],
        out_specs=[resident(), resident(), resident(), row_spec(cap)],
        out_shape=[jax.ShapeDtypeStruct((Cg_out, cap), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((Cg, cap), jnp.float32)],
    )(xc_f, xn_f, mc, mn, t1, t2, tc, tn)
    return fx, fy, fz, eb


def _kernel_overflow(
    xo_ref,  # (8, OCAP)  overflow-atom rows: x, y, z, mask, own, zeros
    xp_ref,  # (4, LW)    partner tile: x, y, z, mask (streamed block)
    cv_ref,  # (NP, DEGP) chebyshev value coeffs | (4, GP) hermite table
    cd_ref,  # (NP, DEGP) chebyshev deriv coeffs | (1, 8) unused dummy
    fo_ref,  # (8, OCAP)  RESIDENT out: fx, fy, fz, eb rows on overflow atoms
    fp_ref,  # (4, LW)    streamed out: Newton credits onto the partner tile
    *,
    params,
):
    """Dense overflow side pass for the reduced-cap Newton kernel.

    The main half-stencil kernel runs at ``kernel_cap < cap`` slot rows —
    pairs with BOTH members in slots < kernel_cap.  Every pair with at
    least one member in a TAIL slot (>= kernel_cap; a super-Poisson-tail
    few-per-10k occupancy event) is evaluated here instead, as one dense
    (OCAP, N) distance sweep of the compacted overflow atoms against ALL
    placed low slots — dense on purpose: a 27-stencil candidate gather for
    ~100 atoms would cost ~10x this tile at the measured 0.12 G elem/s
    gather rate.  Same pair math and bias-table fetch as the Newton
    kernels; the physics (stencil = cutoff mask) is identical because the
    cell edge >= every interaction range, so the r-masks alone select
    exactly the pairs the stencil would.

    Forces on the overflow atoms accumulate into the resident ``fo_ref``
    rows across partner tiles; Newton credits onto the partners stream out
    per tile (each program owns a disjoint tile).  Tail-tail pairs are
    evaluated once, in program 0, as a full diagonal-masked (OCAP, OCAP)
    block (both orderings present, so row sums are complete and the
    energy is halved — the self-block convention of ``_kernel_newton``).

    Row 4 of ``xo_ref`` (``own``) masks which tail ROWS this device owns
    in the tail-tail block: under slab/brick sharding every device passes
    the full tail list but owns a disjoint subset (psum then counts each
    tail-tail ordered pair exactly once — by the owner of its row atom);
    single-device callers pass own == mask, which reproduces the original
    full block bitwise.

    ``rows`` (static, = the true overflow_cap) bounds the pair-tile ROW
    dimension: the input/output blocks stay lane-padded to 128 (Mosaic
    sub-128 lane BLOCKS are untested on real TPU), but the compute tiles
    are (rows, LW) — rows is a SUBLANE dimension where any multiple of 8
    lowers fine.  Measured at 100k (165k partner lanes, one v5e):
    128 rows 1.26 ms -> 64 rows 0.93 -> 32 rows 0.76 per pass; without
    this the tile cost was overflow_cap-independent (always 128 rows)."""
    (table, bx, by, bz, eps, sig, rcut, energy, rows) = params
    preload = _table_preload(cv_ref, table)
    p = pl.program_id(0)

    ox = xo_ref[0, :rows]
    oy = xo_ref[1, :rows]
    oz = xo_ref[2, :rows]
    om = xo_ref[3, :rows]
    oown = xo_ref[4, :rows]

    def mimage(d, L):
        return d - jnp.floor(d * (1.0 / L) + 0.5) * L

    def pair_forces(nx, ny, nz, ok):
        dx = mimage(ox[:, None] - nx[None, :], bx)
        dy = mimage(oy[:, None] - ny[None, :], by)
        dz = mimage(oz[:, None] - nz[None, :], bz)
        r2 = dx * dx + dy * dy + dz * dz
        r2s = jnp.where(ok > 0.5, jnp.maximum(r2, 1e-12), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        r = r2s * inv_r
        inv_r2 = inv_r * inv_r
        lj_on = jnp.where(r < rcut, ok, 0.0)
        sr2 = (sig * sig) * inv_r2
        sr6 = sr2 * sr2 * sr2
        fmag_r = 4.0 * eps * (12.0 * sr6 * sr6 - 6.0 * sr6) * inv_r2 * lj_on
        val, der, _ = _table_val_der(
            cv_ref, cd_ref, r, ok, table=table, energy=energy,
            preload=preload,
        )
        f_over_r = fmag_r - der * inv_r
        return f_over_r * dx, f_over_r * dy, f_over_r * dz, val

    @pl.when(p == 0)
    def _init_and_tailtail():
        fo_ref[...] = jnp.zeros_like(fo_ref)
        okd = oown[:, None] * om[None, :]
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        okd = jnp.where(ri == ci, 0.0, okd)
        gx, gy, gz, val = pair_forces(ox, oy, oz, okd)
        fo_ref[0, :rows] = jnp.sum(gx, axis=1)
        fo_ref[1, :rows] = jnp.sum(gy, axis=1)
        fo_ref[2, :rows] = jnp.sum(gz, axis=1)
        if energy:
            fo_ref[3, :rows] = 0.5 * jnp.sum(val, axis=1)

    okp = om[:, None] * xp_ref[3, :][None, :]
    gx, gy, gz, val = pair_forces(
        xp_ref[0, :], xp_ref[1, :], xp_ref[2, :], okp
    )
    fo_ref[0, :rows] = fo_ref[0, :rows] + jnp.sum(gx, axis=1)
    fo_ref[1, :rows] = fo_ref[1, :rows] + jnp.sum(gy, axis=1)
    fo_ref[2, :rows] = fo_ref[2, :rows] + jnp.sum(gz, axis=1)
    if energy:
        fo_ref[3, :rows] = fo_ref[3, :rows] + jnp.sum(val, axis=1)
    fp_ref[0, :] = -jnp.sum(gx, axis=0)
    fp_ref[1, :] = -jnp.sum(gy, axis=0)
    fp_ref[2, :] = -jnp.sum(gz, axis=0)
    fp_ref[3, :] = jnp.zeros_like(xp_ref[3, :])


def overflow_forces_pallas(
    xo_f, xp_f, table, *,
    box, lj_eps, lj_sig, lj_rcut, energy=True, lane_tile=2048,
):
    """Dense overflow force pass (see ``_kernel_overflow``).

    xo_f (8, OCAP): overflow-atom planes x, y, z, mask, own (rows 5..7
    ignored; ``own`` = tail-tail ROW ownership, == mask on a single
    device); xp_f (4, NP): partner planes x, y, z, mask for all placed
    low slots this device owns,
    lane-padded with zero mask (NP a multiple of 128).  Returns
    (fo (8, OCAP): force components + bias-energy rows on the overflow
    atoms; fp (4, NP): Newton credits to subtract-free ADD onto the
    partner slots, row 3 zero).  Output dtype f32 like the Newton kernels;
    total bias energy of the overflow pairs is ``jnp.sum(fo[3])``."""
    ocap = xo_f.shape[1]
    NP_ = xp_f.shape[1]
    assert NP_ % 128 == 0 and ocap % 8 == 0
    # lane-pad the resident overflow block to full 128-lane tiles: Mosaic
    # lowering of sub-128 lane tiles is untested on real TPU (CPU interpret
    # runs can't catch lowering failures — see the round-6 scoped-vmem
    # incident); padded rows carry zero mask so they contribute exact zeros
    ocap_k = -(-ocap // 128) * 128
    if ocap_k > ocap:
        xo_f = jnp.pad(xo_f, ((0, 0), (0, ocap_k - ocap)))
    LW = min(lane_tile, NP_)
    if NP_ % LW:
        pad = -(-NP_ // LW) * LW - NP_
        xp_f = jnp.pad(xp_f, ((0, 0), (0, pad)))
        NP_ += pad
    n_prog = NP_ // LW
    t1, t2, tspec = _table_inputs(table)
    interpret = jax.default_backend() == "cpu"
    params = (
        tspec,
        float(box[0]), float(box[1]), float(box[2]),
        float(lj_eps), float(lj_sig), float(lj_rcut), bool(energy),
        ocap,
    )
    kernel = functools.partial(_kernel_overflow, params=params)
    fo, fp = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((8, ocap_k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LW), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(t1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(t2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, ocap_k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LW), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, ocap_k), jnp.float32),
            jax.ShapeDtypeStruct((4, NP_), jnp.float32),
        ],
    )(xo_f, xp_f, t1, t2)
    return fo[:, :ocap], fp


def cell_forces_pallas_newton_planar(
    xc_f, xn_f, mc, mn, table, *,
    cap, box, lj_eps, lj_sig, lj_rcut, energy=True,
    types=None, type_pair=None,
):
    """Planar-layout entry for the Newton kernel: xc_f (Cg, 3cap) and
    xn_f (Cg, 3*13cap) are already xyz-major ([x-plane | y | z]); returns
    the raw per-component outputs (fx, fy, fz, fnx, fny, fnz, eb) without
    stacking — callers that keep planar layouts avoid two full-size HBM
    materializations per step (the dominant non-compute cost at 100k
    atoms: strided layout copies run ~10x below HBM peak).

    ``types``: optional (tc (Cg, cap), tn (Cg, 13cap)) per-slot type values
    (floats) + ``type_pair`` (ti, tj) restricting the CV to that unordered
    type pair (fix_edm_pair.cpp:39-44,177-202); LJ is unaffected."""
    Cg = xc_f.shape[0]
    ncand = xn_f.shape[1] // 3
    assert Cg % CELLS_PER_PROGRAM == 0
    n_prog = Cg // CELLS_PER_PROGRAM
    t1, t2, tspec = _table_inputs(table)

    P = CELLS_PER_PROGRAM
    # only the host CPU platform needs interpret mode; the axon-relayed
    # TPU backend reports platform "axon" (sitecustomize pins it)
    interpret = jax.default_backend() == "cpu"

    def row_spec(width):
        return pl.BlockSpec((P, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    tc, tn, tpair, tc_spec, tn_spec = _type_inputs(
        types, type_pair, cap, ncand, row_spec, xc_f.dtype
    )
    params = (
        cap, ncand, tspec, tpair,
        float(box[0]), float(box[1]), float(box[2]),
        float(lj_eps), float(lj_sig), float(lj_rcut), bool(energy),
    )
    kernel = functools.partial(_kernel_newton, params=params)

    fx, fy, fz, fnx, fny, fnz, eb = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            row_spec(3 * cap),
            row_spec(3 * ncand),
            row_spec(cap),
            row_spec(ncand),
            pl.BlockSpec(t1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(t2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            tc_spec,
            tn_spec,
        ],
        out_specs=[
            row_spec(cap), row_spec(cap), row_spec(cap),
            row_spec(ncand), row_spec(ncand), row_spec(ncand),
            row_spec(cap),
        ],
        out_shape=(
            [jax.ShapeDtypeStruct((Cg, cap), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((Cg, ncand), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((Cg, cap), jnp.float32)]
        ),
    )(xc_f, xn_f, mc, mn, t1, t2, tc, tn)

    return fx, fy, fz, fnx, fny, fnz, eb


def cell_forces_pallas(
    xc, xn, mc, mn, sid, nid, cval, cder, *,
    cap, box, lj_eps, lj_sig, lj_rcut, cv_lo, cv_hi,
):
    """xc (Cg, cap, 3), xn (Cg, 27cap, 3), masks/ids as floats; cval/cder
    (npanels, deg+1) (or (deg+1,) for a global series).

    Returns per-local-slot forces (Cg, cap, 3) and bias-energy rows
    (Cg, cap).  Cg must be a multiple of CELLS_PER_PROGRAM.
    """
    Cg = xc.shape[0]
    ncand = xn.shape[1]
    assert Cg % CELLS_PER_PROGRAM == 0
    n_prog = Cg // CELLS_PER_PROGRAM
    cv2 = cval if cval.ndim == 2 else cval[None, :]
    cd2 = cder if cder.ndim == 2 else cder[None, :]
    NP, DEGP = cv2.shape

    # xyz-major flattening keeps per-plane slices static in the kernel
    xc_f = jnp.concatenate([xc[..., 0], xc[..., 1], xc[..., 2]], axis=1)
    xn_f = jnp.concatenate([xn[..., 0], xn[..., 1], xn[..., 2]], axis=1)

    params = (
        cap, ncand, DEGP - 1, NP,
        float(box[0]), float(box[1]), float(box[2]),
        float(lj_eps), float(lj_sig), float(lj_rcut),
        float(cv_lo), float(cv_hi),
    )
    kernel = functools.partial(_kernel, params=params)
    P = CELLS_PER_PROGRAM
    # only the host CPU platform needs interpret mode; the axon-relayed
    # TPU backend reports platform "axon" (sitecustomize pins it)
    interpret = jax.default_backend() == "cpu"

    def row_spec(width):
        return pl.BlockSpec((P, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    fx, fy, fz, eb = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            row_spec(3 * cap),
            row_spec(3 * ncand),
            row_spec(cap),
            row_spec(ncand),
            row_spec(cap),
            row_spec(ncand),
            pl.BlockSpec((NP, DEGP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, DEGP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(cap), row_spec(cap), row_spec(cap), row_spec(cap)],
        out_shape=[jax.ShapeDtypeStruct((Cg, cap), jnp.float32)] * 4,
    )(xc_f, xn_f, mc, mn, sid, nid, cv2, cd2)

    f = jnp.stack([fx, fy, fz], axis=-1)
    return f, eb
