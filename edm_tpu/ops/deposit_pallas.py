"""Pallas TPU kernel for dense 1-D hill deposition.

The XLA dense path (ops/deposit.deposit_dense_1d) evaluates the (grid x
hills) contribution matrix through lax.map chunks; each chunk round-trips
intermediates through HBM.  This kernel tiles the *grid* axis across the
Pallas grid and holds the whole hill batch in VMEM, so each grid tile's
contributions accumulate in registers — the only HBM traffic is the tile
deltas and the tiny per-hill partial sums.

Scope: 1-D grids with fully periodic system boundaries (the pairwise-CV
production shape; bc_denom collapses to the scalar sqrt(pi)*sigma,
reference gaussian_grid.h:340).  Grids with McGovern–De Pablo boundary
corrections need 65,536-entry table lookups per point and fall back to the
XLA path (ops/deposit dispatches).

Output contract matches deposit_dense_1d: updated grid + per-hill
bias_added (= height * vol * sum of unit contributions, the conservation
invariant of gaussian_grid.h:349).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gauss import GAUSS_SUPPORT, GaussGrid

TILE_R = 8  # sublane rows per tile
TILE_C = 256  # lanes per tile
TILE = TILE_R * TILE_C  # grid points per Pallas program


def _kernel(centers_ref, heights_ref, dv_ref, dd_ref, partial_ref, *, params):
    gmin, dx, L, sigma, inv_denom, G = params
    i = pl.program_id(0)

    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    flat = (i * TILE + row * TILE_C + col).astype(jnp.float32)  # global point index
    xx = gmin + dx * flat  # (R, C)

    c = centers_ref[0, :]  # (H,)
    h = heights_ref[0, :]

    dpd = xx[..., None] - c[None, None, :]  # (R, C, H)
    # periodic minimum image (round-half-away == round-half-up for the
    # magnitudes involved; exact ties cannot occur off the knife edge)
    dpd = dpd - jnp.floor(dpd / L + 0.5) * L
    dp = dpd / sigma
    dp2 = dp * dp
    # mask tile-padding points beyond the real grid: they alias back into
    # the domain through the minimum image and would double-count hills
    # near the period boundary.  Masks stay f32 — Mosaic cannot insert a
    # minor dim on i1 vectors.
    sup = jnp.where(dp2 < (GAUSS_SUPPORT + 1e-12), inv_denom, 0.0)
    in_grid = jnp.where(flat < G, 1.0, 0.0)  # (R, C)
    expo = jnp.exp(-dp2) * sup * in_grid[..., None]

    H = c.shape[0]
    dv_ref[...] = jnp.dot(
        expo.reshape(TILE, H), h, preferred_element_type=jnp.float32
    ).reshape(TILE_R, TILE_C)
    dd_ref[...] = jnp.dot(
        (-(2.0 / sigma) * dp * expo).reshape(TILE, H), h,
        preferred_element_type=jnp.float32,
    ).reshape(TILE_R, TILE_C)
    partial_ref[...] = jnp.sum(expo, axis=1)  # (R, H)


HILLS_PER_PROGRAM = 8
LANES = 128


def _kernel_windowed(
    centers_ref,  # (1, Hp) SMEM: remapped hill centers (padded)
    heights_ref,  # (1, Hp) SMEM
    dv_ref,  # (ROWS, 128) RESIDENT out: value deltas over [-M, Gp+M) rows
    dd_ref,  # (ROWS, 128) RESIDENT out: derivative deltas
    partial_ref,  # (n_prog, HILLS_PER_PROGRAM) RESIDENT out: unit integrals
    *,
    params,
):
    """Windowed 1-D deposition: each program evaluates HILLS_PER_PROGRAM
    hills only on their ~W-point support spans (lane-aligned) and
    read-modify-writes the spans into VMEM-resident delta planes — TPU
    Pallas grids run sequentially, so cross-program accumulation is
    race-free.  The dense kernel's (grid x hills) sweep does ~G/W times
    more work; at the production 1e6-point grid with 11k-point windows
    that is ~90x."""
    gmin, dx, sigma, inv_denom, G, n_win_rows, m_rows = params
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        dv_ref[...] = jnp.zeros_like(dv_ref)
        dd_ref[...] = jnp.zeros_like(dd_ref)

    half_w = (n_win_rows * LANES) // 2

    def one_hill(k, _):
        hidx = p * HILLS_PER_PROGRAM + k
        c = centers_ref[0, hidx]
        h = heights_ref[0, hidx]
        # aligned span start (logical point index, may be negative)
        i0 = (
            (jnp.floor((c - gmin) / dx).astype(jnp.int32) - half_w)
            // LANES
        ) * LANES
        row0 = i0 // LANES + m_rows  # buffer row (>= 0 by margin)
        row = jax.lax.broadcasted_iota(jnp.int32, (n_win_rows, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_win_rows, LANES), 1)
        flat = (i0 + row * LANES + col).astype(jnp.float32)
        xx = gmin + dx * flat
        dp = (xx - c) / sigma  # local window: no periodic wrap needed
        dp2 = dp * dp
        sup = jnp.where(dp2 < (GAUSS_SUPPORT + 1e-12), inv_denom, 0.0)
        # logical indices outside [0, G) are margin contributions folded
        # back by the caller; no in-grid mask here
        expo = jnp.exp(-dp2) * sup
        dvw = dv_ref[pl.ds(row0, n_win_rows), :]
        dv_ref[pl.ds(row0, n_win_rows), :] = dvw + h * expo
        ddw = dd_ref[pl.ds(row0, n_win_rows), :]
        dd_ref[pl.ds(row0, n_win_rows), :] = ddw + h * (
            -(2.0 / sigma) * dp * expo
        )
        partial_ref[p, k] = jnp.sum(expo)
        return 0

    jax.lax.fori_loop(0, HILLS_PER_PROGRAM, one_hill, 0, unroll=True)


def deposit_windowed_1d_pallas(
    gg: GaussGrid, centers: jax.Array, heights: jax.Array,
    interpret: bool = False,
):
    """Support-windowed periodic 1-D deposition (see ``_kernel_windowed``).

    Output contract matches ``deposit_dense_1d_pallas``: updated grid +
    per-hill bias_added.  Margins hold out-of-range window spans; the
    periodic fold-back happens in XLA afterwards (three shifted adds)."""
    assert supported(gg)
    spec = gg.spec
    g = spec.grid
    dtype = gg.dtype
    centers = jnp.asarray(centers, dtype).reshape(-1)
    heights = jnp.asarray(heights, dtype)
    H = centers.shape[0]
    G = g.nbins[0]
    W = spec.window_shape[0]

    n_win_rows = -(-(W + 2 * LANES) // LANES)
    m_rows = n_win_rows  # one window of margin per side
    rows_g = -(-G // LANES)
    ROWS = rows_g + 2 * m_rows
    Gp = rows_g * LANES

    n_prog = -(-H // HILLS_PER_PROGRAM)
    Hp = n_prog * HILLS_PER_PROGRAM
    x = gg.remap(centers[:, None])[:, 0]
    if Hp > H:
        # padded hills sit at the domain start with zero height (their
        # windows compute but contribute nothing)
        x = jnp.concatenate([x, jnp.full((Hp - H,), float(g.min[0]), dtype)])
        heights_p = jnp.concatenate([heights, jnp.zeros((Hp - H,), dtype)])
    else:
        heights_p = heights

    sigma = spec.sigma[0]
    params = (
        float(g.min[0]), float(g.dx[0]), float(sigma),
        float(1.0 / (math.sqrt(math.pi) * sigma)),
        int(G), int(n_win_rows), int(m_rows),
    )
    kernel = functools.partial(_kernel_windowed, params=params)

    dv, dd, partials = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, LANES), dtype),
            jax.ShapeDtypeStruct((ROWS, LANES), dtype),
            jax.ShapeDtypeStruct((n_prog, HILLS_PER_PROGRAM), dtype),
        ],
    )(x[None, :], heights_p[None, :])

    M = m_rows * LANES

    def fold(buf):
        flatb = buf.reshape(-1)
        mid = flatb[M : M + G]
        left = flatb[:M]  # logical [-M, 0) -> [G - M, G)
        right = flatb[M + G : 2 * M + G]  # logical [G, G + M) -> [0, M)
        mid = mid.at[G - M :].add(left)
        mid = mid.at[:M].add(right)
        return mid

    dv1 = fold(dv)
    dd1 = fold(dd)
    s = partials.reshape(-1)[:H] * g.dx[0]
    bias_added = heights * s

    grid_new = dataclasses.replace(
        gg.grid,
        values=gg.grid.values + dv1,
        derivs=gg.grid.derivs + dd1[:, None],
    )
    return dataclasses.replace(gg, grid=grid_new), bias_added


def supported(gg: GaussGrid) -> bool:
    spec = gg.spec
    return (
        spec.dim == 1
        and spec.grid.periodic[0]
        and spec.boundary_periodic[0]
        and gg.dtype == jnp.float32
    )


def deposit_dense_1d_pallas(gg: GaussGrid, centers: jax.Array, heights: jax.Array, interpret: bool = False):
    """Periodic 1-D dense deposition via a grid-tiled Pallas kernel."""
    assert supported(gg)
    spec = gg.spec
    g = spec.grid
    dtype = gg.dtype
    centers = jnp.asarray(centers, dtype).reshape(-1)
    heights = jnp.asarray(heights, dtype)
    H = centers.shape[0]
    G = g.nbins[0]
    n_tiles = -(-G // TILE)
    Gp = n_tiles * TILE

    x = gg.remap(centers[:, None])[:, 0]
    sigma = spec.sigma[0]
    params = (
        float(g.min[0]),
        float(g.dx[0]),
        float(g.max[0] - g.min[0]),
        float(sigma),
        float(1.0 / (math.sqrt(math.pi) * sigma)),
        float(G),
    )

    kernel = functools.partial(_kernel, params=params)
    dv, dd, partials = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, TILE_C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, TILE_C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * TILE_R, TILE_C), dtype),
            jax.ShapeDtypeStruct((n_tiles * TILE_R, TILE_C), dtype),
            jax.ShapeDtypeStruct((n_tiles * TILE_R, H), dtype),
        ],
    )(x[None, :], heights[None, :])

    dv = dv.reshape(Gp)[:G]
    dd = dd.reshape(Gp)[:G]
    s = jnp.sum(partials, axis=0) * g.dx[0]
    bias_added = heights * s

    grid_new = dataclasses.replace(
        gg.grid,
        values=gg.grid.values + dv,
        derivs=gg.grid.derivs + dd[:, None],
    )
    return dataclasses.replace(gg, grid=grid_new), bias_added
