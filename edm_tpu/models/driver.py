"""Simulation driver — the full ``fix edm`` / ``fix edm_pair`` host loop
(reference lammps/fix_edm.cpp:134-162, fix_edm_pair.cpp:139-256): run MD in
compiled segments, and on every write stride emit the bias grid, the CV
histogram (then reset it — reference README.md:139-141: "The histogram is
reset every time the bias file is rewritten"), and for 1-D pairwise runs
the LAMMPS tabular potential ``<bias>.ltab``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from ..utils.gridio import write_grid, write_lammps_table


def pattern_segment(pattern, length: int, unroll: int = 2):
    """Build a compiled-segment runner from STATIC stride-phase step variants.

    A dynamic per-step ``lax.cond`` on a stride (hills, rebuild, energy)
    makes XLA copy every carried array the pass-through branch returns
    unchanged (fused lookup tables, bias grids, slot planes — tens of MB
    per step at bench scale).  Hosts that expose ``static_do_*`` knobs
    build one step variant per phase of the stride cycle, and this runner
    scans them in the cycle pattern instead: ``pattern`` is a list of
    ``(step_fn, count)`` entries traced in order inside an outer scan over
    rounds.  Pass-through state then flows through plain scan carries,
    which XLA aliases in place.

    Requires the state's step counter to sit at the start of the cycle on
    entry (hosts start at 0) and ``length`` to be a whole number of
    cycles.  The returned ``seg(state)`` gives ``(final_state, ys)`` with
    ``ys`` per-step in order.  Float leaves agree with the dynamic-cond
    step to XLA loop-fusion rounding (~1 ulp — the flat ``lax.scan`` of
    the cond step differs from per-jit-call stepping by the same class);
    integer/bool leaves (keys, counters, flags) are exact.  See
    tests/test_strided.py.
    """
    round_len = sum(c for _, c in pattern)
    rounds, rem = divmod(length, round_len)
    if rem:
        raise ValueError(
            f"segment length {length} not a multiple of the {round_len}-step cycle"
        )
    if any(c < 1 for _, c in pattern):
        raise ValueError("pattern counts must be >= 1")
    tm = jax.tree_util.tree_map

    def seg(state):
        import jax.numpy as jnp

        def round_body(st, _):
            ys = []
            for fn, cnt in pattern:
                if cnt == 1:
                    st, y = fn(st, None)
                    ys.append(tm(lambda a: a[None], y))
                else:
                    st, y = jax.lax.scan(
                        fn, st, None, length=cnt, unroll=unroll
                    )
                    ys.append(y)
            if len(ys) == 1:
                return st, ys[0]
            return st, tm(lambda *a: jnp.concatenate(a, 0), *ys)

        st, ys = jax.lax.scan(round_body, state, None, length=rounds)
        return st, tm(lambda a: a.reshape((length,) + a.shape[2:]), ys)

    return seg


def strided_segment(step_hill, step_plain, hill_stride: int, length: int,
                    unroll: int = 2):
    """``pattern_segment`` for the common hills-only cycle: one
    ``static_do_hills=True`` step then ``hill_stride - 1`` plain steps."""
    if hill_stride > 1:
        pattern = [(step_hill, 1), (step_plain, hill_stride - 1)]
    else:
        pattern = [(step_hill, 1)]
    return pattern_segment(pattern, length, unroll=unroll)


def run_simulation(
    step_fn: Callable,
    state,
    n_steps: int,
    write_stride: int,
    bias_file: Optional[str] = None,
    histogram_file: Optional[str] = None,
    lammps_table: Optional[str] = None,
    box_low=None,
    box_high=None,
    progress: Optional[Callable] = None,
    hills_log=None,
    step_hill: Optional[Callable] = None,
    hill_stride: Optional[int] = None,
):
    """Drive ``step_fn`` (a (state, None) -> (state, energy) transition from
    any host model) for ``n_steps``, writing outputs every ``write_stride``
    steps.  Returns the final state and the per-step energies of the last
    segment.

    Works with CoordEDMState, PairEDMState, and CellPairState (the bias
    state is located by attribute).

    ``hills_log`` (utils.hills_log.HillsLog): when given, ``step_fn`` must
    have been built with ``collect_records=True``; each segment's stacked
    HillRoundLog records are replayed host-side into the reference-format
    HILLS event stream (output_hill, edm_bias.cpp:586-599) after the segment
    completes — one device fetch per write stride, zero per-step traffic.

    ``step_hill`` + ``hill_stride``: static hill-phase fast path.  When
    given (and ``write_stride`` divides into whole hill rounds), segments
    run via ``strided_segment(step_hill, step_fn, ...)`` — ``step_fn`` must
    then be the ``static_do_hills=False`` variant; see ``strided_segment``.
    """

    def bias_of(s):
        core = s.core if hasattr(s, "core") else s
        return core.bias

    def with_bias(s, new_bias):
        if hasattr(s, "core"):
            return dataclasses.replace(
                s, core=dataclasses.replace(s.core, bias=new_bias)
            )
        return dataclasses.replace(s, bias=new_bias)

    if step_hill is not None and hill_stride and write_stride % hill_stride == 0:
        seg = jax.jit(strided_segment(step_hill, step_fn, hill_stride, write_stride))
    else:
        seg = jax.jit(
            lambda s: jax.lax.scan(step_fn, s, None, length=write_stride, unroll=2)
        )

    if hills_log is not None:
        # the hills counter/step column counts hill rounds (edm_bias.cpp:582)
        round_counter = int(bias_of(state).steps)
        cum_run = float(bias_of(state).cum_bias)

    energies = None
    done = 0
    while done < n_steps:
        if hills_log is not None:
            state, (energies, logs) = seg(state)
            import numpy as np

            logs = jax.device_get(logs)
            happened = np.asarray(logs.happened)
            for i in np.nonzero(happened)[0]:
                rec_i = jax.tree_util.tree_map(lambda a: a[i], logs.rec)
                hills_log.log_round(
                    round_counter, cum_run, rec_i, logs.positions[i]
                )
                cum_run += float(rec_i.round_bias)
                round_counter += 1
        else:
            state, energies = seg(state)
        done += write_stride

        bs = bias_of(state)
        if bias_file:
            write_grid(bs.bias.grid, bias_file)
        if lammps_table and box_low is not None:
            write_lammps_table(bs.bias.grid, lammps_table, box_low, box_high)
        if histogram_file:
            write_grid(bs.cv_hist, histogram_file)
            # reference semantics: histogram resets at every write
            state = with_bias(
                state, dataclasses.replace(bs, cv_hist=bs.cv_hist.clear())
            )
        if progress is not None:
            progress(done, state, energies)

    return state, energies
