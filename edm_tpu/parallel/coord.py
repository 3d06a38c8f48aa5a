"""Sharded coordinate-CV EDM — multi-chip ``fix edm`` (reference
lammps/fix_edm.cpp under MPI).

The coordinate CV is per-atom, so atoms shard perfectly over the mesh: the
bias force lookup is local, hill candidates are local atoms, and only the
hill rounds synchronize (hills/uniforms all-gathered, every device replays
the identical round on its grid replica — the reference's broadcast mode,
edm_bias.cpp:647-660, without the exchange protocol).  cum_bias's
Allreduce (edm_bias.cpp:922-931) is implicit: the gathered round computes
the same global total on every device.

Unlike the reference, no spatial grid subdivision is needed: a replicated
coordinate grid of 1e6+ points is a few MB of HBM; subdivision was a CPU
cluster memory/work optimization (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .. import bias as B
from ..models.coord_edm import CoordEDMState
from ..models.langevin import LangevinParams, baoab_step
from .mesh import DATA_AXIS


def shard_coord_state(state: CoordEDMState, mesh) -> CoordEDMState:
    sharded = jax.sharding.NamedSharding(mesh, P(DATA_AXIS))
    repl = jax.sharding.NamedSharding(mesh, P())
    return dataclasses.replace(
        state,
        x=jax.device_put(state.x, sharded),
        v=jax.device_put(state.v, sharded),
        f=jax.device_put(state.f, sharded),
        key=jax.device_put(state.key, repl),
        bias=jax.tree.map(lambda l: jax.device_put(l, repl), state.bias),
        step=jax.device_put(state.step, repl),
        energy=jax.device_put(state.energy, repl),
        # the sharded step rebuilds lookups per shard; drop any cached
        # corner table (and the single-host compaction flag — this host
        # gathers full candidate batches) so the carried structure stays
        # consistent
        ptab=None,
        hills_truncated=None,
    )


def make_sharded_coord_step(
    params: B.BiasParams,
    lp: LangevinParams,
    hill_stride: int,
    mesh,
    hill_capacity_per_device: Optional[int] = None,
    external_force: Optional[Callable] = None,
):
    """Jit-compiled sharded coordinate-EDM step (atoms data-parallel).

    ``hill_capacity_per_device``: local atoms per device (defaults to the
    shard size, i.e. every local atom is a hill candidate each round, as in
    the reference fix).
    """
    D = params.cfg.dim
    axis = DATA_AXIS

    def step_local(state: CoordEDMState):
        dev = jax.lax.axis_index(axis)

        def force_fn(x):
            e_b, der = B.update_forces(params, state.bias, x)
            f = jnp.zeros_like(x)
            f = f.at[..., :D].add(-der)
            e = jax.lax.psum(e_b, axis)
            if external_force is not None:
                e_ext, f_ext = external_force(x)
                f = f + f_ext
                e = e + jax.lax.psum(e_ext, axis)
            return e, f

        key_dev = jax.random.fold_in(state.key, dev)
        x, v, f, energy, _ = baoab_step(
            lp, state.x, state.v, state.f, key_dev, force_fn
        )
        key = jax.random.split(state.key)[0]

        do_hills = (state.step % hill_stride) == 0
        n_local = x.shape[0]
        n_global = n_local * mesh.devices.size

        def with_hills(bs):
            hkey = jax.random.fold_in(jax.random.fold_in(state.key, dev), 11)
            runif = jax.random.uniform(hkey, (n_local,), x.dtype)
            hills_g = jax.lax.all_gather(x[:, :D], axis, tiled=True)
            runif_g = jax.lax.all_gather(runif, axis, tiled=True)
            new_bs, _ = B.add_hills_round(
                params, bs, hills_g, runif_g, jnp.asarray(n_global, x.dtype)
            )
            return new_bs

        bias_state = jax.lax.cond(do_hills, with_hills, lambda bs: bs, state.bias)

        return (
            CoordEDMState(
                x=x, v=v, f=f, key=key, bias=bias_state,
                step=state.step + 1, energy=energy,
            ),
            energy,
        )

    def _specs(state):
        bias_specs = jax.tree.map(lambda _: P(), state.bias)
        return CoordEDMState(
            x=P(DATA_AXIS), v=P(DATA_AXIS), f=P(DATA_AXIS), key=P(),
            bias=bias_specs, step=P(), energy=P(),
        )

    def one_step(state):
        fn = jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(_specs(state),),
            out_specs=(_specs(state), P()),
            check_vma=False,
        )
        return fn(state)

    return jax.jit(one_step)
