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
