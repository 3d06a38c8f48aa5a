"""Bias-per-step capping — the sequential hill-limiter semantics of the
reference (do_add_hill, lib/edm_bias.cpp:444-526; flush_bias_buffer,
lib/edm_bias.cpp:313-380) expressed as cheap scalar ``lax.scan``s.

The reference deposits hills one at a time, tracking the cumulative bias
added this step (``temp_hill_cum_``); the hill that crosses ``bias_per_step``
is deposited in full then *partially undone* so the cap is met exactly, and
the remainder (plus every later hill) is deferred to an overflow buffer —
dropping instead of deferring would bias the sampling (README.md:20-24).

Deposition is linear in hill height and the per-hill integral-per-unit-height
``s_k`` depends only on geometry, so the sequential decision reduces to a
scalar recurrence over (h_k, s_k): a ~5-flop scan over the batch, after which
one vectorized scatter commits all effective heights at once.  This
reproduces the reference's exact order-dependent semantics (including the
s_k != 1 round-off behavior its regression test guards, edm_test.cpp:823)
without sequential grid mutation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CapResult(NamedTuple):
    dep_heights: jax.Array  # effective deposited height per hill
    defer_heights: jax.Array  # remainder pushed to the overflow buffer
    deposited: jax.Array  # bool: do_add_hill took the deposit branch
    straddled: jax.Array  # bool: partial-undo happened
    cum: jax.Array  # final temp_hill_cum


def cap_scan(heights, weights, active, cap, cum0) -> CapResult:
    """New-hill capping (do_add_hill with communicate=1, edm_bias.cpp:465-523).

    heights/weights/active: (H,) aligned with deposit order; cum0 is the
    bias already added this step (from the buffer drain).
    """
    dtype = heights.dtype
    cap = jnp.asarray(cap, dtype)

    def body(cum, inp):
        h, s, a = inp
        can_add = cum < cap
        cum_full = cum + h * s
        straddle = can_add & (cum_full > cap)
        # round-off guard: never undo more than the hill itself (edm_bias.cpp:479)
        h_undo = jnp.maximum(cap - cum_full, -h)
        dep = jnp.where(can_add, h + jnp.where(straddle, h_undo, 0.0), 0.0)
        defer = jnp.where(can_add, jnp.where(straddle, -h_undo, 0.0), h)
        new_cum = jnp.where(can_add, cum_full + jnp.where(straddle, h_undo * s, 0.0), cum)
        dep = jnp.where(a, dep, 0.0)
        defer = jnp.where(a, defer, 0.0)
        new_cum = jnp.where(a, new_cum, cum)
        return new_cum, (dep, defer, a & can_add, a & straddle)

    cum, (dep, defer, deposited, straddled) = jax.lax.scan(
        body, jnp.asarray(cum0, dtype), (heights, weights, active)
    )
    return CapResult(dep, defer, deposited, straddled, cum)


class DrainResult(NamedTuple):
    dep_heights: jax.Array  # (CAP,) effective deposit per slot
    new_heights: jax.Array  # (CAP,) post-drain buffer heights (straddler keeps remainder)
    consumed: jax.Array  # bool: slot fully drained
    processed: jax.Array  # bool: slot touched this drain
    straddled: jax.Array
    bias_added: jax.Array  # total bias deposited by the drain


def drain_scan(heights, weights, active, max_bias) -> DrainResult:
    """Overflow-buffer drain (flush_bias_buffer, edm_bias.cpp:313-380).

    Differs from cap_scan: the loop *stops* at the straddling slot, which
    stays in the buffer holding the un-deposited remainder.
    """
    dtype = heights.dtype
    max_bias = jnp.asarray(max_bias, dtype)

    def body(carry, inp):
        cum, stopped = carry
        h, s, a = inp
        run = a & ~stopped
        cum_full = cum + h * s
        straddle = run & (cum_full > max_bias)
        h_undo = jnp.maximum(max_bias - cum_full, -h)
        dep = jnp.where(run, h + jnp.where(straddle, h_undo, 0.0), 0.0)
        new_h = jnp.where(run, jnp.where(straddle, -h_undo, 0.0), h)
        new_cum = jnp.where(run, cum_full + jnp.where(straddle, h_undo * s, 0.0), cum)
        return (new_cum, stopped | straddle), (dep, new_h, run & ~straddle, run, straddle)

    (cum, _), (dep, new_h, consumed, processed, straddled) = jax.lax.scan(
        body,
        (jnp.zeros((), dtype), jnp.zeros((), bool)),
        (heights, weights, active),
    )
    return DrainResult(dep, new_h, consumed, processed, straddled, cum)
