"""Cell-list pairwise EDM — the production large-N host (1e4-1e5 atoms on a
chip): same physics as pair_edm.py / fix_edm_pair, with O(N) pair work.

Per MD step:
  1. cell positions refreshed by one (C*cap) gather from atom arrays;
  2. per cell-chunk: 27-stencil contiguous block gathers, dense
     (cap, 27*cap) pair tiles — minimum-image LJ + spectral bias-CV forces
     (ops/chebyshev) fused on the VPU, row-summed per local atom;
  3. forces scattered back to atom order by atom id (C*cap sources);
  4. BAOAB integration in atom space;
  5. cell table rebuilt in-graph every ``rebuild_stride`` steps (the skin
     margin in the cell edge covers motion between rebuilds);
  6. hill rounds: two-level collection — per-slot accepted counts
     (reductions only), slot compaction, exact per-candidate extraction on
     the selected slots — then the standard add_hills_round.

The cell edge is max(lj.rcut, bias domain) + skin, so both force laws and
the hill candidate set live within the stencil.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import bias as B
from ..ops.chebyshev import fit_gauss_grid
from .cells import CellSpec, build_table
from .langevin import LangevinParams, baoab_step
from .lj import LJParams
from .pair_edm import PairEDMState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellPairState:
    core: PairEDMState
    aid: jax.Array  # (C*cap,) slot -> atom id (n_atoms = empty)
    table_overflow: jax.Array  # bool


def init_cell_state(spec: CellSpec, core: PairEDMState) -> CellPairState:
    table = build_table(spec, core.x)
    return CellPairState(core=core, aid=table.aid, table_overflow=table.overflow)


def make_cell_step(
    params: B.BiasParams,
    lp: LangevinParams,
    lj: LJParams,
    spec: CellSpec,
    hill_stride: int,
    rebuild_stride: int = 10,
    hill_capacity: int = 2048,
    cell_chunk: int = 32,
    row_cap: int = 2048,
    m_per_row: int = 16,
    axis_name: Optional[str] = None,
    cheb_deg: int = 64,
    types=None,
    type_pair=None,
    use_pallas: bool = False,
    collect_records: bool = False,
):
    if min(spec.ncells) < 3:
        raise ValueError(
            "cell list needs >= 3 cells per dim (box >= 3x interaction "
            "range); use the dense/blocked host for small boxes"
        )
    C = spec.n_cells
    cap = spec.cap
    n = spec.n_atoms
    box_arr = jnp.asarray(spec.box)
    stencil = jnp.asarray(spec.stencil())  # (C, 27)
    n_chunks = -(-C // cell_chunk)
    Cp = n_chunks * cell_chunk
    # pad the stencil with self-loops on cell 0; padded cells have no atoms
    stencil_p = jnp.concatenate(
        [stencil, jnp.zeros((Cp - C, 27), jnp.int32)], axis=0
    )
    bmax_cv = params.cfg.box_high[0]
    # rdf type-pair filtering (fix_edm_pair.cpp:39-44,177-202): the LJ fluid
    # interacts between all atoms; only the biased CV is restricted to i-j
    # type pairs.  types are padded with 0 (matches nothing) for empty slots.
    if types is not None and type_pair is not None:
        types_arr = jnp.asarray(types, jnp.int32)
        tpair = (int(type_pair[0]), int(type_pair[1]))
    else:
        types_arr = None
        tpair = None

    def chunk_pairs(xs3, aid2, ci, dtype):
        """Dense pair tile for cells [ci*chunk, ...): returns (disp, r, valid,
        local aid (B,cap), local validity)."""
        c0 = ci * cell_chunk
        xc = jax.lax.dynamic_slice_in_dim(xs3, c0, cell_chunk)  # (B, cap, 3)
        ac = jax.lax.dynamic_slice_in_dim(aid2, c0, cell_chunk)  # (B, cap)
        nbr = jax.lax.dynamic_slice_in_dim(stencil_p, c0, cell_chunk)  # (B, 27)
        xn = xs3[nbr]  # (B, 27, cap, 3) block gather
        an = aid2[nbr]  # (B, 27, cap)
        bsz = cell_chunk
        disp = xc[:, :, None, :] - xn.reshape(bsz, 1, 27 * cap, 3)
        b = box_arr.astype(dtype)
        disp = disp - jnp.round(disp / b) * b
        r2 = jnp.sum(disp * disp, axis=-1)  # (B, cap, 27cap)
        anf = an.reshape(bsz, 1, 27 * cap)
        valid = (ac[:, :, None] < n) & (anf < n) & (ac[:, :, None] != anf)
        r = jnp.sqrt(jnp.where(valid, r2, jnp.inf))
        if types_arr is None:
            cv_ok = None
        else:
            # type of each slot (0 for empty slots: matches nothing)
            tslots = jnp.where(
                aid2.reshape(-1) < n,
                types_arr[jnp.clip(aid2.reshape(-1), 0, n - 1)],
                0,
            ).reshape(aid2.shape)
            tc = jax.lax.dynamic_slice_in_dim(tslots, c0, cell_chunk)  # (B, cap)
            tn = tslots[nbr].reshape(cell_chunk, 1, 27 * cap)
            ti, tj = tpair
            cv_ok = ((tc[:, :, None] == ti) & (tn == tj)) | (
                (tc[:, :, None] == tj) & (tn == ti)
            )
        return disp, r, valid, ac, cv_ok

    if use_pallas and (types is not None):
        raise ValueError("use_pallas does not support type filtering yet")

    def force_fn_for(state: CellPairState):
        def pallas_force(x):
            from ..ops.cellforce_pallas import CELLS_PER_PROGRAM, cell_forces_pallas

            dtype = x.dtype
            aid_c = jnp.clip(state.aid, 0, n - 1)
            Cg = -(-C // CELLS_PER_PROGRAM) * CELLS_PER_PROGRAM
            xs3 = x[aid_c].reshape(C, cap, 3)
            xs3 = jnp.concatenate([xs3, jnp.zeros((Cg - C, cap, 3), dtype)], axis=0)
            aid2 = jnp.concatenate(
                [state.aid.reshape(C, cap), jnp.full((Cg - C, cap), n, jnp.int32)],
                axis=0,
            )
            sten = jnp.concatenate(
                [stencil, jnp.zeros((Cg - C, 27), jnp.int32)], axis=0
            )
            xn = xs3[sten].reshape(Cg, 27 * cap, 3)
            an = aid2[sten].reshape(Cg, 27 * cap)
            mc = (aid2 < n).astype(dtype)
            mn = (an < n).astype(dtype)
            sid = aid2.astype(dtype)
            nid = jnp.where(an < n, an, -1).astype(dtype)
            cheb = state.core.cheb
            f_rows, eb = cell_forces_pallas(
                xs3, xn, mc, mn, sid, nid, cheb.cval, cheb.cder,
                cap=cap, deg=cheb.cval.shape[0] - 1, box=spec.box,
                lj_eps=lj.epsilon, lj_sig=lj.sigma, lj_rcut=lj.rcut,
                cv_lo=cheb.lo, cv_hi=cheb.hi,
            )
            f_flat = f_rows.reshape(-1, 3)
            a_flat = aid2.reshape(-1)
            f_atoms = jnp.zeros((n + 1, 3), dtype).at[
                jnp.where(a_flat < n, a_flat, n)
            ].add(f_flat)[:n]
            e_b = 0.5 * jnp.sum(eb)
            return e_b, f_atoms

        def force_fn(x):
            if use_pallas:
                return pallas_force(x)
            dtype = x.dtype
            aid_c = jnp.clip(state.aid, 0, n - 1)
            xs3 = x[aid_c].reshape(C, cap, 3)  # refresh cell positions
            xs3 = jnp.concatenate(
                [xs3, jnp.zeros((Cp - C, cap, 3), dtype)], axis=0
            )
            aid2 = jnp.concatenate(
                [state.aid.reshape(C, cap), jnp.full((Cp - C, cap), n, jnp.int32)],
                axis=0,
            )

            def one_chunk(ci):
                disp, r, valid, ac, cv_ok = chunk_pairs(xs3, aid2, ci, dtype)
                inr = jnp.where(r < lj.rcut, 1.0 / r, 0.0)
                sr6 = (lj.sigma * inr) ** 6
                fmag = 4 * lj.epsilon * (12 * sr6 * sr6 - 6 * sr6) * inr * inr
                f_rows = jnp.sum(fmag[..., None] * disp, axis=2)

                r_cv = r if cv_ok is None else jnp.where(cv_ok, r, jnp.inf)
                if state.core.cheb is not None:
                    val, der0 = state.core.cheb.value_deriv(
                        jnp.where(jnp.isfinite(r_cv), r_cv, -1.0)
                    )
                else:
                    # exact path: boundary-aware cubic-Hermite grid lookup
                    # over the compact cutoff-pair tile (not the N^2 matrix)
                    val, der = state.core.bias.bias.get_value_deriv(
                        jnp.where(jnp.isfinite(r_cv), r_cv, -1.0)[..., None]
                    )
                    der0 = der[..., 0]
                    val = jnp.where(jnp.isfinite(r_cv), val, 0.0)
                    der0 = jnp.where(jnp.isfinite(r_cv), der0, 0.0)
                binr = jnp.where(jnp.isfinite(r_cv), 1.0 / r_cv, 0.0)
                f_rows = f_rows + jnp.sum(
                    (-der0 * binr)[..., None] * disp, axis=2
                )
                e_b = jnp.sum(jnp.where(jnp.isfinite(r_cv), val, 0.0))
                return f_rows, ac, e_b

            f_rows, acs, e_bs = jax.lax.map(one_chunk, jnp.arange(n_chunks))
            # scatter forces back to atom order (C*cap sources)
            f_flat = f_rows.reshape(-1, 3)
            a_flat = acs.reshape(-1)
            f_atoms = jnp.zeros((n + 1, 3), dtype).at[
                jnp.where(a_flat < n, a_flat, n)
            ].add(f_flat)[:n]
            return 0.5 * jnp.sum(e_bs), f_atoms

        return force_fn

    def collect_hills(state: CellPairState, x, key, last_calls, dtype):
        """Two-level hill collection over cell-slot rows."""
        aid_c = jnp.clip(state.aid, 0, n - 1)
        xs3 = x[aid_c].reshape(C, cap, 3)
        xs3 = jnp.concatenate([xs3, jnp.zeros((Cp - C, cap, 3), dtype)], axis=0)
        aid2 = jnp.concatenate(
            [state.aid.reshape(C, cap), jnp.full((Cp - C, cap), n, jnp.int32)],
            axis=0,
        )
        M = C * cap  # real slot-rows

        def row_uniform(slot_rows):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(slot_rows)
            return jax.vmap(lambda k: jax.random.uniform(k, (27 * cap,), dtype))(keys)

        def accept_of(r, runif):
            candidate = jnp.isfinite(r) & (r < bmax_cv)
            if params.cfg.hill_density < 0:
                acc = candidate
            else:
                acc = candidate & (
                    runif < params.cfg.hill_density / last_calls.astype(dtype)
                )
            return candidate, acc

        def p1_chunk(carry, ci):
            row_counts, ncalls = carry
            _, r, valid, _, cv_ok = chunk_pairs(xs3, aid2, ci, dtype)
            if cv_ok is not None:
                r = jnp.where(cv_ok, r, jnp.inf)
            rows = (ci * cell_chunk * cap + jnp.arange(cell_chunk * cap)).astype(jnp.int32)
            runif = row_uniform(rows).reshape(cell_chunk, cap, 27 * cap)
            candidate, acc = accept_of(r, runif)
            rc = jnp.sum(acc.astype(jnp.int32), axis=2).reshape(-1).astype(jnp.int32)
            row_counts = jax.lax.dynamic_update_slice_in_dim(
                row_counts, rc, ci * cell_chunk * cap, axis=0
            )
            ncalls = (ncalls + jnp.sum(candidate.astype(jnp.int32))).astype(jnp.int32)
            return (row_counts, ncalls), None

        (row_counts, ncalls), _ = jax.lax.scan(
            p1_chunk,
            (jnp.zeros((Cp * cap,), jnp.int32), jnp.zeros((), jnp.int32)),
            jnp.arange(n_chunks),
        )

        has = row_counts > 0
        rranks = jnp.cumsum(has.astype(jnp.int32)) - 1
        rtgt = jnp.where(has, rranks, row_cap)
        rows_sel = jnp.full((row_cap,), Cp * cap, jnp.int32).at[rtgt].set(
            jnp.arange(Cp * cap, dtype=jnp.int32), mode="drop"
        )
        n_rows = jnp.sum(has.astype(jnp.int32)).astype(jnp.int32)

        # pass 2 on selected slot-rows
        rows_c = jnp.clip(rows_sel, 0, Cp * cap - 1)
        cell_ids = rows_c // cap
        xi = xs3.reshape(-1, 3)[rows_c]  # (row_cap, 3)
        ai = aid2.reshape(-1)[rows_c]
        nbr = stencil_p[cell_ids]  # (row_cap, 27)
        xn = xs3[nbr].reshape(row_cap, 27 * cap, 3)
        an = aid2[nbr].reshape(row_cap, 27 * cap)
        disp = xi[:, None, :] - xn
        b = box_arr.astype(dtype)
        disp = disp - jnp.round(disp / b) * b
        r2 = jnp.sum(disp * disp, axis=-1)
        row_valid = rows_sel < Cp * cap
        valid = row_valid[:, None] & (ai[:, None] < n) & (an < n) & (ai[:, None] != an)
        r = jnp.sqrt(jnp.where(valid, r2, jnp.inf))
        if types_arr is not None:
            ti, tj = tpair
            t_i = jnp.where(ai < n, types_arr[jnp.clip(ai, 0, n - 1)], 0)
            t_j = jnp.where(an < n, types_arr[jnp.clip(an, 0, n - 1)], 0)
            cv_ok2 = ((t_i[:, None] == ti) & (t_j == tj)) | (
                (t_i[:, None] == tj) & (t_j == ti)
            )
            r = jnp.where(cv_ok2, r, jnp.inf)
        runif = row_uniform(rows_c)
        _, acc = accept_of(r, runif)

        hills_rows = jnp.zeros((row_cap, m_per_row), dtype)
        runif_rows = jnp.ones((row_cap, m_per_row), dtype)
        valid_rows = jnp.zeros((row_cap, m_per_row), bool)
        work = acc
        for m in range(m_per_row):
            j = jnp.argmax(work, axis=1)
            found = jnp.take_along_axis(work, j[:, None], axis=1)[:, 0]
            hills_rows = hills_rows.at[:, m].set(
                jnp.take_along_axis(r, j[:, None], axis=1)[:, 0]
            )
            runif_rows = runif_rows.at[:, m].set(
                jnp.take_along_axis(runif, j[:, None], axis=1)[:, 0]
            )
            valid_rows = valid_rows.at[:, m].set(found)
            work = work.at[jnp.arange(row_cap), j].set(False)
        row_overflow = jnp.any(row_counts > m_per_row)

        hflat = hills_rows.reshape(-1)
        uflat = runif_rows.reshape(-1)
        vflat = valid_rows.reshape(-1)
        ranks = jnp.cumsum(vflat.astype(jnp.int32)) - 1
        tgt = jnp.where(vflat, ranks, hill_capacity)
        hills = jnp.zeros((hill_capacity,), dtype).at[tgt].set(hflat, mode="drop")
        runifs = jnp.ones((hill_capacity,), dtype).at[tgt].set(uflat, mode="drop")
        count = jnp.sum(vflat.astype(jnp.int32)).astype(jnp.int32)
        active = jnp.arange(hill_capacity) < count
        truncated = (count > hill_capacity) | (n_rows > row_cap) | row_overflow
        return hills[:, None], runifs, active, count, ncalls, truncated

    def step(state: CellPairState, _) -> Tuple[CellPairState, jax.Array]:
        core = state.core
        x, v, f, e_bias, key = baoab_step(
            lp, core.x, core.v, core.f, core.key, force_fn_for(state)
        )

        do_hills = (core.step % hill_stride) == 0

        def with_hills(args):
            bs, key, last_calls = args
            key, sub = jax.random.split(key)
            hills, runifs, active, count, ncalls, truncated = collect_hills(
                state, x, sub, last_calls, x.dtype
            )
            new_bs, rec = B.add_hills_round(
                params, bs, hills, runifs, last_calls.astype(x.dtype),
                active=active, axis_name=axis_name,
            )
            # refit at the carried table's degree (a mismatched cheb_deg arg
            # would give cond branches different coefficient shapes)
            new_cheb = (
                fit_gauss_grid(new_bs.bias, core.cheb.cval.shape[0] - 1)
                if core.cheb is not None
                else None
            )
            log = (
                B.HillRoundLog(jnp.ones((), bool), hills, rec)
                if collect_records
                else None
            )
            return new_bs, key, ncalls, truncated, new_cheb, log

        def without_hills(args):
            bs, key, last_calls = args
            log = (
                B.round_log_zeros(params, bs, hill_capacity)
                if collect_records
                else None
            )
            return bs, key, last_calls, jnp.zeros((), bool), core.cheb, log

        bias_state, key, last_calls, truncated, cheb, log = jax.lax.cond(
            do_hills, with_hills, without_hills, (core.bias, key, core.last_calls)
        )

        new_core = PairEDMState(
            x=x, v=v, f=f, key=key, bias=bias_state,
            step=core.step + 1, last_calls=last_calls, energy=e_bias,
            hills_truncated=core.hills_truncated | truncated,
            cheb=cheb,
        )

        do_rebuild = (new_core.step % rebuild_stride) == 0

        def rebuild(_):
            t = build_table(spec, x)
            return t.aid, state.table_overflow | t.overflow

        def keep(_):
            return state.aid, state.table_overflow

        aid, overflow = jax.lax.cond(do_rebuild, rebuild, keep, None)

        new_state = CellPairState(core=new_core, aid=aid, table_overflow=overflow)
        return new_state, ((e_bias, log) if collect_records else e_bias)

    return step
