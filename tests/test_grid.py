"""Grid storage tests — ported oracles from reference tests/edm_test.cpp:25-180."""

import jax.numpy as jnp
import numpy as np
import pytest

from edm_tpu import Grid, GridSpec
from edm_tpu.utils.gridio import read_grid_file, write_grid


def test_grid_1d_sanity():
    # edm_test.cpp:25-59
    spec = GridSpec.create([0], [10], [1], [False])
    assert spec.nbins == (11,)
    assert spec.grid_size == 11

    assert spec.one2multi(spec.multi2one([5])) == (5,)

    g = Grid.zeros(spec, dtype=jnp.float64)
    g = Grid(values=jnp.arange(11, dtype=jnp.float64), derivs=None, spec=spec)
    assert abs(float(g.get_value(jnp.array([3.5]))) - 3.0) < 1e-6
    # edge probes must not explode
    g.get_value(jnp.array([0.0]))
    g.get_value(jnp.array([10.0]))


def test_grid_3d_sanity():
    # edm_test.cpp:61-107
    spec = GridSpec.create([-2, -5, -3], [125, 63, 78], [1.27, 1.36, 0.643], [False, True, True])
    assert spec.nbins == (101, 50, 126)

    # index round-trip over a sample of points
    rng = np.random.default_rng(0)
    for _ in range(200):
        idx = tuple(int(rng.integers(0, n)) for n in spec.nbins)
        assert spec.one2multi(spec.multi2one(idx)) == idx

    # nearest-bin get_value returns the flat index stored at each point.
    # NOTE: the reference's own loop probes the last row of the non-periodic
    # dim too, where its in_grid() rejects the point and get_value returns 0
    # (verified on the compiled reference binary: pt0=125.0000000001 ->
    # in_grid=0) — i.e. the shipped assertion is bit-rotted there.  We match
    # the *binary* behavior: probe in-domain rows, and pin the edge-row
    # rejection explicitly below.
    flat = np.arange(spec.grid_size, dtype=np.float64).reshape(spec.nbins, order="F")
    g = Grid(values=jnp.asarray(flat), derivs=None, spec=spec)
    pts = []
    expected = []
    for _ in range(100):
        idx = [int(rng.integers(0, n)) for n in spec.nbins]
        idx[0] = min(idx[0], spec.nbins[0] - 2)  # stay inside non-periodic dim
        pts.append([spec.min[d] + idx[d] * spec.dx[d] + 1e-9 for d in range(3)])
        expected.append(spec.multi2one(idx))
    vals = np.asarray(g.get_value(jnp.asarray(pts)))
    np.testing.assert_allclose(vals, expected, atol=1e-4)

    # last-row probe of the non-periodic dim is rejected, as in the reference
    edge = [spec.min[0] + 100 * spec.dx[0] + 1e-10, spec.min[1], spec.min[2]]
    assert float(g.get_value(jnp.asarray([edge]))[0]) == 0.0


def test_grid_1d_read(fixture_dir):
    # edm_test.cpp:109-115
    g = read_grid_file(str(fixture_dir / "1.grid"), dtype=np.float64)
    assert g.spec.min[0] == 0
    assert abs(g.spec.max[0] - (2.5 + g.spec.dx[0])) < 1e-12
    assert g.spec.nbins[0] == 101


def test_grid_3d_read(fixture_dir):
    # edm_test.cpp:117-125
    g = read_grid_file(str(fixture_dir / "3.grid"), dtype=np.float64)
    assert g.spec.min[2] == 0
    assert abs(g.spec.max[2] - (2.5 + g.spec.dx[2])) < 1e-12
    assert g.spec.nbins[2] == 11
    v = float(g.get_value(jnp.array([0.75, 0, 1.00])))
    assert (v - 1.260095) ** 2 < 1e-10


def test_derivative_direction(fixture_dir):
    # edm_test.cpp:127-138
    import dataclasses

    g = read_grid_file(str(fixture_dir / "3.grid"), dtype=np.float64)
    g = dataclasses.replace(g, interpolate=True)
    base = float(g.get_value(jnp.array([0.75, 0, 1.00])))
    assert float(g.get_value(jnp.array([0.76, 0, 1.00]))) > base
    assert float(g.get_value(jnp.array([0.75, 0, 0.99]))) < base


@pytest.mark.parametrize("name", ["1.grid", "2.grid", "3.grid"])
def test_grid_read_write_consistency(fixture_dir, tmp_path, name):
    # edm_test.cpp:142-180
    g = read_grid_file(str(fixture_dir / name), dtype=np.float64)
    out = tmp_path / (name + ".test")
    write_grid(g, str(out))
    g2 = read_grid_file(str(out), dtype=np.float64)
    assert g2.spec.grid_size == g.spec.grid_size
    np.testing.assert_allclose(
        np.asarray(g2.values), np.asarray(g.values), atol=1e-5
    )
    if g.has_derivatives:
        np.testing.assert_allclose(
            np.asarray(g2.derivs), np.asarray(g.derivs), atol=1e-5
        )


def test_expected_bias_matches_naive():
    spec = GridSpec.create([0], [10], [0.5], [True])
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 5, spec.nbins)
    g = Grid(values=jnp.asarray(vals), derivs=None, spec=spec)
    w = np.exp(-vals)
    naive = (vals * w).sum() / w.sum()
    assert abs(float(g.expected_bias()) - naive) < 1e-10


def test_add_value_nearest_bin():
    spec = GridSpec.create([0], [10], [1], [False])
    g = Grid.zeros(spec, dtype=jnp.float64)
    g, added = g.add_value(jnp.array([[3.4], [20.0]]), jnp.array([2.0, 5.0]))
    # out-of-grid add returns 0 (grid.h:375-377)
    np.testing.assert_allclose(np.asarray(added), [2.0, 0.0])
    assert float(g.values[3]) == 2.0
