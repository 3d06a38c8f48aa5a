"""Cubic-spline grid interpolation as a vectorized 2^D-corner gather.

Ports the polynomial of the reference's ``interp<DIM>`` (lib/grid.h:52-139,
itself adapted from PLUMED 1.3) to batched JAX: each lookup gathers the 2^D
surrounding grid points and combines per-dimension cubic polynomials whose
endpoint slope is set from the stored gradient (the qq = -der/value ratio,
with the 1e-7 zero-table guard at grid.h:113-114).  The reference's
periodic "stride wrap" trick (grid.h:432-433) becomes a modular index wrap.

This is the force-lookup hot path: O(atoms * 2^D) fused gathers + FMA — pure
VPU work that XLA vectorizes; no Pallas needed at realistic atom counts.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp


def grid_value_deriv(grid, x):
    """Batched value+gradient lookup with optional interpolation.

    Args:
      grid: ``edm_tpu.grid.Grid`` with derivatives stored.
      x: (..., D) query points.

    Returns:
      (value (...), deriv (..., D)) — zeros outside a non-periodic grid
      (reference grid.h:398-409).
    """
    spec = grid.spec
    D = spec.dim
    dtype = grid.dtype
    x = jnp.asarray(x, dtype)

    lo = jnp.asarray(spec.min, dtype)
    dx = jnp.asarray(spec.dx, dtype)
    nbins = jnp.asarray(spec.nbins, jnp.int32)
    per = jnp.asarray(spec.periodic)

    ok = grid.in_grid(x)
    xw = grid.wrap(x)
    idx = jnp.clip(jnp.floor((xw - lo) / dx).astype(jnp.int32), 0, nbins - 1)

    if not grid.interpolate:
        gather = tuple(jnp.moveaxis(idx, -1, 0))
        value = grid.values[gather]
        deriv = grid.derivs[gather]
        zero = jnp.zeros((), dtype)
        return jnp.where(ok, value, zero), jnp.where(ok[..., None], deriv, zero)

    # position relative to the floor grid point, in [0, dx)
    where = xw - lo - idx.astype(dtype) * dx

    value = jnp.zeros(x.shape[:-1], dtype)
    deriv = jnp.zeros(x.shape, dtype)

    for corner in itertools.product((0, 1), repeat=D):
        c = jnp.asarray(corner, jnp.int32)
        nidx = idx + c
        # periodic wrap of the +1 neighbor (reference stride trick grid.h:432-433)
        nidx = jnp.where(per, nidx % nbins, jnp.clip(nidx, 0, nbins - 1))
        gather = tuple(jnp.moveaxis(nidx, -1, 0))
        tabf = grid.values[gather]  # (...,)
        tabder = grid.derivs[gather]  # (..., D)

        # qq: desired endpoint slope / endpoint value, 0/0-guarded (grid.h:113-116)
        safe = jnp.abs(tabf) >= 1e-7
        qq = jnp.where(safe[..., None], -tabder / jnp.where(safe[..., None], tabf[..., None], 1.0), 0.0)

        X = jnp.abs(where / dx - jnp.asarray(corner, dtype))
        X2 = X * X
        X3 = X2 * X
        sign = jnp.asarray([-1.0 if ci else 1.0 for ci in corner], dtype)
        C = (1 - 3 * X2 + 2 * X3) - sign * qq * (X - 2 * X2 + X3) * dx
        Dp = (-6 * X + 6 * X2) - sign * qq * (1 - 4 * X + 3 * X2) * dx
        Dp = Dp * sign / dx

        ff = jnp.prod(C, axis=-1)
        value = value + tabf * ff
        # fd[d] = Dp[d] * prod_{j != d} C[j]
        prodC = jnp.prod(C, axis=-1, keepdims=True)
        # safe divide: C can be 0; compute leave-one-out product explicitly
        if D == 1:
            loo = jnp.ones_like(C)
        else:
            # leave-one-out product via masked prod per dim (D <= 3: cheap)
            loo = jnp.stack(
                [
                    jnp.prod(
                        jnp.concatenate(
                            [C[..., :d], C[..., d + 1 :]], axis=-1
                        ),
                        axis=-1,
                    )
                    for d in range(D)
                ],
                axis=-1,
            )
        del prodC
        deriv = deriv + tabf[..., None] * Dp * loo

    zero = jnp.zeros((), dtype)
    return jnp.where(ok, value, zero), jnp.where(ok[..., None], deriv, zero)
