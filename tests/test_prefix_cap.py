"""Parallel-prefix capping vs a literal sequential reimplementation of the
reference recurrence (do_add_hill / flush_bias_buffer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from edm_tpu.ops.prefix_cap import cap_scan, drain_scan


def seq_cap(heights, weights, active, cap, cum0):
    """Literal port of edm_bias.cpp:465-523 per-hill logic."""
    n = len(heights)
    dep = np.zeros(n)
    defer = np.zeros(n)
    deposited = np.zeros(n, bool)
    straddled = np.zeros(n, bool)
    cum = cum0
    for k in range(n):
        if not active[k]:
            continue
        h, s = heights[k], weights[k]
        if cum < cap:
            cum += h * s
            dep[k] = h
            deposited[k] = True
            if cum > cap:
                h_undo = max(cap - cum, -h)
                dep[k] = h + h_undo
                cum += h_undo * s
                defer[k] = -h_undo
                straddled[k] = True
        else:
            defer[k] = h
    return dep, defer, deposited, straddled, cum


def seq_drain(heights, weights, active, max_bias):
    """Literal port of edm_bias.cpp:313-380 (break at first crossing)."""
    n = len(heights)
    dep = np.zeros(n)
    new_h = heights.copy()
    consumed = np.zeros(n, bool)
    processed = np.zeros(n, bool)
    straddled = np.zeros(n, bool)
    cum = 0.0
    for k in range(n):
        if not active[k]:
            continue
        h, s = heights[k], weights[k]
        cum += h * s
        dep[k] = h
        processed[k] = True
        if cum > max_bias:
            h_undo = max(max_bias - cum, -h)
            dep[k] = h + h_undo
            new_h[k] = -h_undo
            cum += h_undo * s
            straddled[k] = True
            break
        consumed[k] = True
        new_h[k] = 0.0
    return dep, new_h, consumed, processed, straddled, cum


@pytest.mark.parametrize("seed", range(6))
def test_cap_matches_sequential(seed):
    rng = np.random.default_rng(seed)
    n = 64
    heights = rng.uniform(0.01, 0.3, n)
    # include s>1 cases (grid round-off regime) so the multi-crossing
    # while_loop path is exercised
    weights = rng.uniform(0.9, 1.05, n)
    active = rng.random(n) < 0.8
    cap = 1.0
    cum0 = rng.uniform(0, 0.5)

    want = seq_cap(heights, weights, active, cap, cum0)
    got = cap_scan(
        jnp.asarray(heights), jnp.asarray(weights), jnp.asarray(active), cap, cum0
    )
    np.testing.assert_allclose(np.asarray(got.dep_heights), want[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.defer_heights), want[1], atol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.deposited), want[2])
    np.testing.assert_array_equal(np.asarray(got.straddled), want[3])
    assert abs(float(got.cum) - want[4]) < 1e-12


def test_cap_exact_saturation():
    """Prefix landing exactly on the cap: the next hill sees
    temp_hill_cum_ < bias_per_step_ as false and is buffered whole with no
    contribution to the running total (edm_bias.cpp:465,498) — regression
    for the round-1 advisor finding (dropped hill + cum over-count)."""
    heights = np.array([1.0, 1.0, 1.0])
    ones = np.ones(3)
    got = cap_scan(
        jnp.asarray(heights), jnp.asarray(ones), jnp.asarray(ones, bool), 2.0, 0.0
    )
    want = seq_cap(heights, ones, ones.astype(bool), 2.0, 0.0)
    np.testing.assert_allclose(np.asarray(got.dep_heights), want[0])
    np.testing.assert_allclose(np.asarray(got.defer_heights), want[1])
    np.testing.assert_array_equal(np.asarray(got.deposited), want[2])
    np.testing.assert_array_equal(np.asarray(got.straddled), want[3])
    assert float(got.cum) == want[4] == 2.0
    # the third hill must be deferred whole, not dropped
    assert float(got.defer_heights[2]) == 1.0


@pytest.mark.parametrize("seed", range(8))
def test_cap_exact_saturation_randomized(seed):
    """Random streams engineered to hit prefix == cap mid-stream."""
    rng = np.random.default_rng(300 + seed)
    n = 24
    # dyadic heights: all partial sums are exact under any summation
    # association (XLA's cumsum is log-depth, not left-to-right)
    heights = rng.integers(1, 32, n) / 64.0
    weights = np.ones(n)
    active = rng.random(n) < 0.8
    # force an exact landing at a random active position
    k = int(np.flatnonzero(active)[3])
    cap = float(np.sum(np.where(active[: k + 1], heights[: k + 1], 0.0)))
    want = seq_cap(heights, weights, active, cap, 0.0)
    got = cap_scan(
        jnp.asarray(heights), jnp.asarray(weights), jnp.asarray(active), cap, 0.0
    )
    np.testing.assert_allclose(np.asarray(got.dep_heights), want[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.defer_heights), want[1], atol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.deposited), want[2])
    assert abs(float(got.cum) - want[4]) < 1e-12


def test_cap_initial_over_cap():
    heights = np.full(8, 0.1)
    weights = np.ones(8)
    active = np.ones(8, bool)
    got = cap_scan(jnp.asarray(heights), jnp.asarray(weights), jnp.asarray(active), 1.0, 1.5)
    np.testing.assert_allclose(np.asarray(got.dep_heights), 0.0)
    np.testing.assert_allclose(np.asarray(got.defer_heights), heights)
    assert float(got.cum) == 1.5


@pytest.mark.parametrize("seed", range(6))
def test_drain_matches_sequential(seed):
    rng = np.random.default_rng(100 + seed)
    n = 32
    heights = rng.uniform(0.01, 0.5, n)
    weights = rng.uniform(0.9, 1.05, n)
    left, right = 3, 20
    active = (np.arange(n) >= left) & (np.arange(n) < right)
    max_bias = 1.0

    want = seq_drain(heights, weights, active, max_bias)
    got = drain_scan(
        jnp.asarray(heights), jnp.asarray(weights), jnp.asarray(active), max_bias
    )
    np.testing.assert_allclose(np.asarray(got.dep_heights), want[0], atol=1e-12)
    # untouched slots keep their heights; consumed go to 0
    np.testing.assert_allclose(np.asarray(got.new_heights), want[1], atol=1e-12)
    np.testing.assert_array_equal(np.asarray(got.consumed), want[2])
    np.testing.assert_array_equal(np.asarray(got.processed), want[3])
    np.testing.assert_array_equal(np.asarray(got.straddled), want[4])
    assert abs(float(got.bias_added) - want[5]) < 1e-12


def test_drain_empty_buffer():
    heights = np.zeros(16)
    got = drain_scan(
        jnp.asarray(heights), jnp.ones(16), jnp.zeros(16, bool), 1.0
    )
    assert float(got.bias_added) == 0.0
    assert not np.asarray(got.processed).any()


def test_hashrng_uniforms():
    """Counter-hash acceptance uniforms (ops/hashrng): deterministic per
    (seed, row, col), uniform to MC-acceptance quality, decorrelated
    between adjacent rows/columns."""
    import jax
    import numpy as np
    from edm_tpu.ops.hashrng import seeds_from_key, uniform_rows_cols

    seeds = seeds_from_key(jax.random.PRNGKey(42))
    rows = jnp.arange(512, dtype=jnp.int32)
    u1 = np.asarray(uniform_rows_cols(seeds, rows, 1024, jnp.float32))
    u2 = np.asarray(uniform_rows_cols(seeds, rows, 1024, jnp.float32))
    np.testing.assert_array_equal(u1, u2)  # re-derivable between passes
    assert (u1 >= 0).all() and (u1 <= 1.0).all()
    n = u1.size
    assert abs(u1.mean() - 0.5) < 3.0 / np.sqrt(12 * n)  # ~3 sigma
    assert abs(u1.var() - 1 / 12) < 0.002
    # tail mass at the acceptance scales actually used (p ~ 1e-4)
    for p in (1e-2, 1e-3):
        frac = (u1 < p).mean()
        assert abs(frac - p) < 5 * np.sqrt(p / n)
    # neighbor decorrelation (rows and columns)
    c = np.corrcoef(u1[:-1].ravel(), u1[1:].ravel())[0, 1]
    assert abs(c) < 0.01
    c2 = np.corrcoef(u1[:, :-1].ravel(), u1[:, 1:].ravel())[0, 1]
    assert abs(c2) < 0.01
    # different seeds -> different stream
    seeds_b = seeds_from_key(jax.random.PRNGKey(43))
    u3 = np.asarray(uniform_rows_cols(seeds_b, rows, 1024, jnp.float32))
    assert np.mean(u1 == u3) < 0.01


def test_hashrng_normals():
    """Box-Muller counter-hash normals (the sharded-floor BAOAB thermostat
    noise): correct moments, Gaussian tails, and the slicing property the
    sharding relies on — a sliced row range draws the exact values the
    full range draws at those rows."""
    import jax
    import numpy as np
    from edm_tpu.ops.hashrng import normal_rows_cols, seeds_from_key

    seeds = seeds_from_key(jax.random.PRNGKey(7))
    rows = jnp.arange(4096, dtype=jnp.int32)
    z = np.asarray(normal_rows_cols(seeds, rows, 48, jnp.float32))
    n = z.size
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 4.0 / np.sqrt(n)
    assert abs(z.var() - 1.0) < 4.0 * np.sqrt(2.0 / n)
    assert abs((z ** 3).mean()) < 4.0 * np.sqrt(15.0 / n)  # skew
    # Gaussian tail mass at 1/2/3 sigma
    for s, p in ((1.0, 0.3173), (2.0, 0.0455), (3.0, 0.0027)):
        frac = (np.abs(z) > s).mean()
        assert abs(frac - p) < 5 * np.sqrt(p * (1 - p) / n)
    # u1 offset bounds |z|; no inf/nan even at the zero draw
    assert np.abs(z).max() < 7.5
    # slice consistency: any row subset reproduces the full draw's rows
    sl = np.asarray(normal_rows_cols(seeds, rows[100:200], 48, jnp.float32))
    np.testing.assert_array_equal(sl, z[100:200])
    # adjacent-draw decorrelation (row and column neighbors)
    assert abs(np.corrcoef(z[:-1].ravel(), z[1:].ravel())[0, 1]) < 0.01
    assert abs(np.corrcoef(z[:, :-1].ravel(), z[:, 1:].ravel())[0, 1]) < 0.01
