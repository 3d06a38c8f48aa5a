"""Sharded coordinate-CV EDM — multi-chip ``fix edm`` (reference
lammps/fix_edm.cpp under MPI).

The coordinate CV is per-atom, so atoms shard perfectly over the mesh: the
bias force lookup is local, hill candidates are local atoms, and only the
hill rounds synchronize (accepted hills rank-compacted per device and
all-gathered — the reference's bounded exchange buffer, edm_bias.h:151-154
— then every device replays the identical round on its grid replica: the
reference's broadcast mode, edm_bias.cpp:647-660, without the exchange
protocol).  cum_bias's
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
        # corner table so the carried structure stays consistent
        ptab=None,
        hills_truncated=(
            None
            if state.hills_truncated is None
            else jax.device_put(state.hills_truncated, repl)
        ),
    )


def make_sharded_coord_step(
    params: B.BiasParams,
    lp: LangevinParams,
    hill_stride: int,
    mesh,
    hill_capacity: Optional[int] = None,
    external_force: Optional[Callable] = None,
    static_do_hills: Optional[bool] = None,
):
    """Jit-compiled sharded coordinate-EDM step (atoms data-parallel).

    ``hill_capacity``: accepted-hill compaction, the cross-device form of
    ``models.coord_edm.make_step(hill_capacity=...)`` and the analog of the
    reference's bounded exchange buffer (BIAS_BUFFER_SIZE=2048 accepted
    hills per round, edm_bias.h:151-154; rejected candidates are never
    exchanged).  Each device rank-compacts its accepted candidates (same
    draws, same acceptance predicate as add_hills_round), the compacted
    segments are all-gathered and re-compacted in device-major order —
    exactly the gathered full batch's deposit order — so every per-hill
    cost of the replayed round (deposit tables, cap scan, histogram)
    scales with ``hill_capacity`` instead of the global atom count.
    Default: ~8x the expected global acceptance count, rounded to 512;
    per-round overflow is flagged in ``state.hills_truncated``.  Pass 0 to
    gather the full candidate batch (every local atom a candidate, as in
    the reference fix).

    ``static_do_hills``: trace-time hill-round branch — the dynamic cond's
    pass-through copies the replicated bias grids every non-hill step
    (multi-MB for bulk coordinate grids; see models.driver.
    pattern_segment).  Callers own the stride phase; the key stream is
    identical either way (the round key is fold_in-derived).
    """
    D = params.cfg.dim
    axis = DATA_AXIS
    density = float(params.cfg.hill_density)
    if hill_capacity is None:
        hill_capacity = (
            0
            if density < 0
            else max(512, int(-(-8.0 * max(density, 64.0) // 512)) * 512)
        )

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

        Hc = hill_capacity
        compact = 0 < Hc < n_global and density >= 0

        def with_hills(bs):
            hkey = jax.random.fold_in(jax.random.fold_in(state.key, dev), 11)
            runif = jax.random.uniform(hkey, (n_local,), x.dtype)
            if compact:
                # per-device rank compaction of accepted candidates (the
                # acceptance predicate of add_hills_round, same draws);
                # per-device segments stay order-preserving, so the
                # device-major re-compaction after the gather reproduces
                # the full gathered batch's deposit order
                acc = runif < density / n_global
                ranks = jnp.cumsum(acc.astype(jnp.int32)) - 1
                tgt = jnp.where(acc & (ranks < Hc), ranks, Hc)
                pos_c = jnp.zeros((Hc, D), x.dtype).at[tgt].set(
                    x[:, :D], mode="drop"
                )
                run_c = jnp.ones((Hc,), x.dtype).at[tgt].set(
                    runif, mode="drop"
                )
                cnt = jnp.sum(acc.astype(jnp.int32))
                act_c = jnp.arange(Hc) < cnt
                pos_g = jax.lax.all_gather(pos_c, axis, tiled=True)
                run_g = jax.lax.all_gather(run_c, axis, tiled=True)
                act_g = jax.lax.all_gather(act_c, axis, tiled=True)
                total = jax.lax.psum(jnp.minimum(cnt, Hc), axis)
                granks = jnp.cumsum(act_g.astype(jnp.int32)) - 1
                keep = act_g & (granks < Hc)
                gtgt = jnp.where(keep, granks, Hc)
                hills_m = jnp.zeros((Hc, D), x.dtype).at[gtgt].set(
                    pos_g, mode="drop"
                )
                runif_m = jnp.ones((Hc,), x.dtype).at[gtgt].set(
                    run_g, mode="drop"
                )
                active = jnp.arange(Hc) < total
                trunc = (
                    jax.lax.psum((cnt > Hc).astype(jnp.int32), axis) > 0
                ) | (total > Hc)
                new_bs, _ = B.add_hills_round(
                    params, bs, hills_m, runif_m,
                    jnp.asarray(n_global, x.dtype), active=active,
                )
            else:
                trunc = jnp.zeros((), bool)
                hills_g = jax.lax.all_gather(x[:, :D], axis, tiled=True)
                runif_g = jax.lax.all_gather(runif, axis, tiled=True)
                new_bs, _ = B.add_hills_round(
                    params, bs, hills_g, runif_g, jnp.asarray(n_global, x.dtype)
                )
            return new_bs, trunc

        without_hills = lambda bs: (bs, jnp.zeros((), bool))
        if static_do_hills is None:
            bias_state, trunc = jax.lax.cond(
                do_hills, with_hills, without_hills, state.bias
            )
        elif static_do_hills:
            bias_state, trunc = with_hills(state.bias)
        else:
            bias_state, trunc = without_hills(state.bias)
        new_trunc = (
            None
            if state.hills_truncated is None
            else state.hills_truncated | trunc
        )

        return (
            CoordEDMState(
                x=x, v=v, f=f, key=key, bias=bias_state,
                step=state.step + 1, energy=energy,
                hills_truncated=new_trunc,
            ),
            energy,
        )

    def _specs(state):
        bias_specs = jax.tree.map(lambda _: P(), state.bias)
        return CoordEDMState(
            x=P(DATA_AXIS), v=P(DATA_AXIS), f=P(DATA_AXIS), key=P(),
            bias=bias_specs, step=P(), energy=P(),
            hills_truncated=(
                None if state.hills_truncated is None else P()
            ),
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
