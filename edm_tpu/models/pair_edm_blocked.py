"""Memory-blocked pairwise EDM for large N — same physics as
``pair_edm.make_step`` but the O(N^2) pair pass runs in row blocks under
``lax.map``/``lax.scan`` so peak memory is O(block * N) instead of O(N^2).

This is the bench/production path for 1e4-1e5 atoms on a single chip:
- force pass: per-block minimum-image displacements, fused LJ + bias-CV
  gradient lookup, row-summed forces — XLA keeps the (block, N) tiles in
  registers/VMEM and never materializes the full pair matrix;
- hill pass: per-block stochastic acceptance with a carried running count,
  compacting accepted pair distances into a fixed-capacity hill batch via
  prefix-rank scatter (no N^2 argsort).

Citations: physics identical to reference lammps/fix_edm_pair.cpp (see
pair_edm.py for the mapping).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import bias as B
from ..ops.chebyshev import fit_gauss_grid
from .langevin import LangevinParams, baoab_step
from .lj import LJParams
from .pair_edm import PairEDMState


def make_step_blocked(
    params: B.BiasParams,
    lp: LangevinParams,
    lj: LJParams,
    box,
    hill_stride: int,
    hill_capacity: int = 2048,
    block_size: int = 512,
    axis_name: Optional[str] = None,
    cheb_deg: int = 64,
):
    box_arr = jnp.asarray(box)

    def block_rows(x, i0, dtype):
        """Minimum-image displacements of rows [i0, i0+B) vs all atoms."""
        n = x.shape[0]
        xb = jax.lax.dynamic_slice_in_dim(x, i0, block_size)
        b = box_arr.astype(dtype)
        disp = xb[:, None, :] - x[None, :, :]
        disp = disp - jnp.round(disp / b) * b
        r2 = jnp.sum(disp * disp, axis=-1)
        self_mask = (i0 + jnp.arange(block_size))[:, None] == jnp.arange(n)[None, :]
        r = jnp.sqrt(jnp.where(self_mask, jnp.inf, r2))
        return disp, r

    def force_fn_for(state):
        bias_state = state.bias

        def force_fn(x):
            dtype = x.dtype
            n = x.shape[0]
            nblocks = n // block_size

            def one_block(i0):
                disp, r = block_rows(x, i0 * block_size, dtype)
                inr = jnp.where(r < lj.rcut, 1.0 / r, 0.0)
                sr6 = (lj.sigma * inr) ** 6
                e_lj = jnp.sum(4 * lj.epsilon * (sr6 * sr6 - sr6))
                fmag = 4 * lj.epsilon * (12 * sr6 * sr6 - 6 * sr6) * inr * inr
                f_rows = jnp.sum(fmag[..., None] * disp, axis=1)

                if state.cheb is not None:
                    val, der0 = state.cheb.value_deriv(
                        jnp.where(jnp.isfinite(r), r, -1.0)
                    )
                else:
                    val, der = bias_state.bias.get_value_deriv(r[..., None])
                    der0 = der[..., 0]
                binr = jnp.where(jnp.isfinite(r), 1.0 / r, 0.0)
                f_rows = f_rows + jnp.sum((-der0 * binr)[..., None] * disp, axis=1)
                e_b = jnp.sum(jnp.where(jnp.isfinite(r), val, 0.0))
                return f_rows, e_lj, e_b

            f_rows, e_lj, e_b = jax.lax.map(one_block, jnp.arange(nblocks))
            f = f_rows.reshape(n, 3)
            return 0.5 * jnp.sum(e_b), f

        return force_fn

    def collect_hills(x, key, last_calls, dtype):
        """Blocked stochastic hill collection -> fixed-capacity batch."""
        n = x.shape[0]
        nblocks = n // block_size
        bmax = params.cfg.box_high[0]

        hills0 = jnp.zeros((hill_capacity,), dtype)
        runif0 = jnp.ones((hill_capacity,), dtype)

        def body(carry, bi):
            hills, runifs, count, ncalls = carry
            _, r = block_rows(x, bi * block_size, dtype)
            rflat = r.reshape(-1)
            candidate = jnp.isfinite(rflat) & (rflat < bmax)
            bkey = jax.random.fold_in(key, bi)
            runif = jax.random.uniform(bkey, rflat.shape, dtype)
            if params.cfg.hill_density < 0:
                accept = candidate
            else:
                accept = candidate & (
                    runif < params.cfg.hill_density / last_calls.astype(dtype)
                )
            ranks = count + jnp.cumsum(accept.astype(jnp.int32)) - 1
            tgt = jnp.where(accept, ranks, hill_capacity)  # capacity -> dropped
            hills = hills.at[tgt].set(rflat, mode="drop")
            runifs = runifs.at[tgt].set(runif, mode="drop")
            count = count + jnp.sum(accept.astype(jnp.int32))
            ncalls = ncalls + jnp.sum(candidate.astype(jnp.int32))
            return (hills, runifs, count, ncalls), None

        (hills, runifs, count, ncalls), _ = jax.lax.scan(
            body,
            (hills0, runif0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
            jnp.arange(nblocks),
        )
        active = jnp.arange(hill_capacity) < count
        return hills[:, None], runifs, active, count, ncalls

    def step(state: PairEDMState, _) -> Tuple[PairEDMState, jax.Array]:
        bias_state = state.bias
        x, v, f, e_bias, key = baoab_step(
            lp, state.x, state.v, state.f, state.key, force_fn_for(state)
        )

        do_hills = (state.step % hill_stride) == 0

        def with_hills(args):
            bs, key, last_calls = args
            key, sub = jax.random.split(key)
            hills, runifs, active, count, ncalls = collect_hills(
                x, sub, last_calls, x.dtype
            )
            truncated = count > hill_capacity
            new_bs, _ = B.add_hills_round(
                params,
                bs,
                hills,
                runifs,
                last_calls.astype(x.dtype),
                active=active,
                axis_name=axis_name,
            )
            new_cheb = (
                fit_gauss_grid(new_bs.bias, cheb_deg)
                if state.cheb is not None
                else state.cheb
            )
            return new_bs, key, ncalls.astype(jnp.int32), truncated, new_cheb

        def without_hills(args):
            bs, key, last_calls = args
            return bs, key, last_calls, jnp.zeros((), bool), state.cheb

        bias_state, key, last_calls, truncated, cheb = jax.lax.cond(
            do_hills, with_hills, without_hills, (bias_state, key, state.last_calls)
        )

        return (
            PairEDMState(
                x=x, v=v, f=f, key=key, bias=bias_state,
                step=state.step + 1, last_calls=last_calls,
                energy=e_bias,
                hills_truncated=state.hills_truncated | truncated,
                cheb=cheb,
            ),
            e_bias,
        )

    return step
