"""Coordinate-CV EDM host — the TPU-native equivalent of LAMMPS ``fix edm``
(reference lammps/fix_edm.cpp): biases raw particle coordinates (1-3 dims)
during a Langevin MD run.

The LAMMPS hooks map to a single jit-compiled MD step under ``lax.scan``:
  post_force  -> bias gradient lookup fused into the force function
  hill stride -> a ``lax.cond``-gated add_hills_round with jax.random
                 uniforms standing in for RanMars (fix_edm.cpp:145-151)
  write stride-> host-side segment boundary (bias/histogram writers)

The whole inner loop — integrate, CV lookup, hill deposition — is one XLA
program; per-step host traffic is zero within a write segment.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import bias as B
from .langevin import LangevinParams, baoab_step
from ..ops.interp import packed_corner_table


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CoordEDMState:
    x: jax.Array  # (N, ndim_space)
    v: jax.Array
    f: jax.Array
    key: jax.Array
    bias: B.BiasState
    step: jax.Array  # int64
    energy: jax.Array  # last bias energy
    # cached fused corner table for multi-dim interp force lookups
    # (ops/interp.packed_corner_table); rebuilt after hill rounds
    ptab: Optional[jax.Array] = None


def make_step(
    params: B.BiasParams,
    lp: LangevinParams,
    hill_stride: int,
    external_force: Optional[Callable] = None,
    axis_name: Optional[str] = None,
    group_mask=None,
    collect_records: bool = False,
):
    """Build the jitted single-step transition.

    ``external_force(x) -> (energy, force)`` adds a physical potential on
    top of the bias (None = free particle, the reference's sanity setup).
    ``group_mask`` (N,) bool restricts biasing to a group of atoms — the
    LAMMPS groupbit filter (fix_edm.cpp:104,140,153): masked-out atoms feel
    no bias force and deposit no hills (external forces still apply).
    """
    D = params.cfg.dim
    gmask = None if group_mask is None else jnp.asarray(group_mask, bool)

    def force_fn(bias_state, ptab):
        def fn(x):
            e_b, der = B.update_forces(
                params, bias_state, x, mask=gmask, packed=ptab
            )
            f = jnp.zeros_like(x)
            f = f.at[..., :D].add(-der)
            e = e_b
            if external_force is not None:
                e_ext, f_ext = external_force(x)
                f = f + f_ext
                e = e + e_ext
            return e, f

        return fn

    def step(state: CoordEDMState, _) -> Tuple[CoordEDMState, jax.Array]:
        x, v, f, energy, key = baoab_step(
            lp, state.x, state.v, state.f, state.key,
            force_fn(state.bias, state.ptab),
        )

        do_hills = (state.step % hill_stride) == 0
        key, sub = jax.random.split(key)
        runiform = jax.random.uniform(sub, (x.shape[0],), x.dtype)

        def with_hills(bs):
            new_bs, rec = B.add_hills_round(
                params, bs, x[..., :D], runiform, x.shape[0],
                active=gmask, axis_name=axis_name,
            )
            ptab = (
                None
                if state.ptab is None
                else packed_corner_table(new_bs.bias.grid)
            )
            log = (
                B.HillRoundLog(jnp.ones((), bool), x[..., :D], rec)
                if collect_records
                else None
            )
            return new_bs, ptab, log

        def without_hills(bs):
            # keep steps aligned with the reference convention: steps_ counts
            # hill rounds, not MD steps (edm_bias.cpp:582)
            log = (
                B.round_log_zeros(params, bs, x.shape[0])
                if collect_records
                else None
            )
            return bs, state.ptab, log

        bias_state, ptab, log = jax.lax.cond(
            do_hills, with_hills, without_hills, state.bias
        )

        new_state = CoordEDMState(
            x=x, v=v, f=f, key=key, bias=bias_state,
            step=state.step + 1, energy=energy, ptab=ptab,
        )
        return new_state, ((energy, log) if collect_records else energy)

    return step


def init_state(
    params: B.BiasParams,
    bias_state: B.BiasState,
    x0,
    key,
    lp: LangevinParams,
    cache_lookup_table: Optional[bool] = None,
) -> CoordEDMState:
    """``cache_lookup_table`` (default: auto for D >= 2 on bulk-sized
    grids) caches the fused corner table in the state so the multi-dim
    force lookup's ~4x-grid table build runs only after hill rounds."""
    x0 = jnp.asarray(x0)
    D = params.cfg.dim
    g = bias_state.bias.grid
    if cache_lookup_table is None:
        F = (1 + D) * (2 ** D)
        cache_lookup_table = (
            D >= 2 and x0.shape[0] >= 4096 and g.values.size * F <= 64_000_000
        )
    ptab = packed_corner_table(g) if cache_lookup_table else None
    return CoordEDMState(
        x=x0,
        v=jnp.zeros_like(x0),
        f=jnp.zeros_like(x0),
        key=key,
        bias=bias_state,
        step=jnp.zeros((), jnp.int32),
        energy=jnp.zeros((), x0.dtype),
        ptab=ptab,
    )


def run_segment(step_fn, state: CoordEDMState, n_steps: int):
    """Run ``n_steps`` MD steps as one compiled scan; returns final state and
    the per-step bias energies."""
    return jax.lax.scan(step_fn, state, None, length=n_steps)
