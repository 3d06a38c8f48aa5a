"""HILLS event-stream logging from compiled MD hosts.

The reference logs every hill event from inside its sequential loop
(output_hill, edm_bias.cpp:586-599); the compiled hosts instead stack
HillRoundLog records as scan outputs and the driver replays them host-side.
Equivalence test: a frozen particle (kT=0, zero force) deposits the same
hill sequence through the compiled coord host as through the api path — the
two HILLS files must be byte-identical.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from edm_tpu import bias as B
from edm_tpu.api import EDMBias
from edm_tpu.models import coord_edm
from edm_tpu.models.driver import run_simulation
from edm_tpu.models.langevin import LangevinParams
from edm_tpu.utils.config import parse_edm_text
from edm_tpu.utils.hills_log import HillsLog

EDM_TEXT = (
    "tempering 0\nhill_prefactor 1.0\nbias_per_step 0.6\ndimension 1\n"
    "box_low 0\nbox_high 10\nbias_spacing 0.0097\nbias_sigma 0.2\n"
)


def test_compiled_host_hills_log_matches_api(tmp_path):
    n_rounds = 4
    xs = [2.5, 5.0]  # two hills/round: the second straddles the 0.6 cap

    # --- api path (already format-parity-pinned in test_bias.py) ---
    p = tmp_path / "in.edm"
    p.write_text(EDM_TEXT + f"hills_filename {tmp_path}/API_HILLS\n")
    b = EDMBias(str(p), 1.0, 1.0, dtype=jnp.float64, log_hills=True)
    b.subdivide([0], [10], [0], [10], [True], [0])
    for _ in range(n_rounds):
        b.add_hills(np.array([[x] for x in xs]), np.ones(len(xs)))
    b.hills_log.close()
    api_lines = (tmp_path / "API_HILLS_0").read_text()

    # --- compiled host: frozen particle, hill round every step ---
    cfg = parse_edm_text(EDM_TEXT)
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float64
    )
    lp = LangevinParams(dt=0.001, friction=0.0, kT=0.0)  # x stays at x0
    step = coord_edm.make_step(params, lp, hill_stride=1, collect_records=True)
    state = coord_edm.init_state(
        params, bias_state, jnp.asarray([[x] for x in xs], jnp.float64),
        jax.random.PRNGKey(0), lp,
    )
    log = HillsLog(str(tmp_path / "HOST_HILLS_0"), 1, params.total_volume)
    state, _ = run_simulation(
        step, state, n_steps=n_rounds, write_stride=2, hills_log=log
    )
    log.close()
    host_lines = (tmp_path / "HOST_HILLS_0").read_text()

    assert host_lines == api_lines
    assert len(host_lines.strip().splitlines()) >= n_rounds
    # capping engaged: later rounds produce drain ('b') events
    assert any(l.split()[1] == "b" for l in host_lines.strip().splitlines())
    # cum_bias parity between the two paths
    assert abs(float(b.cum_bias) - float(state.bias.cum_bias)) < 1e-12


def test_pair_host_collect_records(tmp_path):
    """Pairwise compiled host emits a parseable HILLS stream whose deposited
    bias reconciles with the engine's cum_bias."""
    from edm_tpu.models import pair_edm
    from edm_tpu.models.lj import LJParams

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.5\nbias_per_step 1.0\nhill_density -1\n"
        "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [3.0], [0], [3.0], [False], [0], dtype=jnp.float64
    )
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0.5, 3.5, (8, 3)), jnp.float64)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.5)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=1.4)
    step = pair_edm.make_step(
        params, lp, lj, [4.0, 4.0, 4.0], hill_stride=2, hill_capacity=128,
        collect_records=True,
    )
    state = pair_edm.init_state(bias_state, x0, jax.random.PRNGKey(1))
    log = HillsLog(str(tmp_path / "HILLS_0"), 1, params.total_volume)
    state, _ = run_simulation(step, state, n_steps=6, write_stride=3, hills_log=log)
    log.close()

    lines = [l.split() for l in (tmp_path / "HILLS_0").read_text().strip().splitlines()]
    assert lines, "no hill events logged"
    # every line: step type counter x h bias_added cum/vol
    for l in lines:
        assert l[1] in ("h", "u", "b", "v", "z")
        assert len(l) == 7
    # deposited bias ('h'+'u'+'b'+'v' bias_added column) == engine cum_bias
    total = sum(float(l[5]) for l in lines)
    # 8-decimal text rounding accumulates ~0.5e-8 per line
    assert abs(total - float(state.bias.cum_bias)) < 1e-6


@pytest.mark.slow
def test_cells_host_collect_records(tmp_path):
    """The production cell-list host also emits the HILLS stream."""
    from edm_tpu.models import pair_edm
    from edm_tpu.models.cells import CellSpec
    from edm_tpu.models.lj import LJParams
    from edm_tpu.models.pair_edm_cells import init_cell_state, make_cell_step

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 0.5\nbias_per_step 1.0\nhill_density -1\n"
        "dimension 1\nbox_low 0\nbox_high 1.6\nbias_spacing 0.02\nbias_sigma 0.1\n"
    )
    params, bias_state = B.subdivide(
        cfg, 1.0, 1.0, [0], [1.6], [0], [1.6], [False], [0], dtype=jnp.float64
    )
    rng = np.random.default_rng(2)
    n = 64
    box = [5.0, 5.0, 5.0]
    x0 = jnp.asarray(rng.uniform(0, 5.0, (n, 3)), jnp.float64)
    lp = LangevinParams(dt=0.002, friction=1.0, kT=0.5)
    lj = LJParams(epsilon=1.0, sigma=1.0, rcut=1.4)
    spec = CellSpec.create(box, cutoff=1.6, n_atoms=n)
    core = pair_edm.init_state(
        bias_state, x0, jax.random.PRNGKey(3), pair_lookup="chebyshev"
    )
    state = init_cell_state(spec, core)
    step = make_cell_step(
        params, lp, lj, spec, hill_stride=2, rebuild_stride=4,
        hill_capacity=256, collect_records=True,
    )
    log = HillsLog(str(tmp_path / "CH_0"), 1, params.total_volume)
    state, _ = run_simulation(step, state, n_steps=4, write_stride=2, hills_log=log)
    log.close()
    lines = [l.split() for l in (tmp_path / "CH_0").read_text().strip().splitlines()]
    assert lines, "no hill events logged from the cells host"
    total = sum(float(l[5]) for l in lines)
    assert abs(total - float(state.core.bias.cum_bias)) < 1e-6


@pytest.mark.slow
def test_native_hills_formatter_byte_parity(tmp_path):
    """The C++ formatter (native/hillslog.cpp) must produce byte-identical
    output to the Python path for random capped rounds."""
    import os
    import dataclasses as dc

    from edm_tpu.native import load_hillslog

    if load_hillslog() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    cfg = parse_edm_text(
        "tempering 0\nhill_prefactor 1.0\nbias_per_step 0.6\ndimension 1\n"
        "box_low 0\nbox_high 10\nbias_spacing 0.0097\nbias_sigma 0.2\n"
    )
    params, state = B.subdivide(
        cfg, 1.0, 1.0, [0], [10], [0], [10], [True], [0], dtype=jnp.float64
    )
    rng = np.random.default_rng(4)
    logs = {}
    for which in ("native", "python"):
        os.environ.pop("EDM_TPU_NO_NATIVE", None)
        if which == "python":
            os.environ["EDM_TPU_NO_NATIVE"] = "1"
        # reset the module-level cache so the env var takes effect
        import edm_tpu.native as N

        N._HL_TRIED = False
        N._HL_LIB = None
        st = state
        log = HillsLog(str(tmp_path / which), 1, params.total_volume)
        cum = 0.0
        for r in range(4):
            pos = jnp.asarray(rng.uniform(1, 9, (6, 1)))
            st, rec = B.add_hills_round(params, st, pos, jnp.ones(6), 6.0)
            log.log_round(r, cum, rec, pos)
            cum += float(rec.round_bias)
        log.close()
        logs[which] = (tmp_path / which).read_text()
        rng = np.random.default_rng(4)  # same stream for both passes
    os.environ.pop("EDM_TPU_NO_NATIVE", None)
    import edm_tpu.native as N

    N._HL_TRIED = False
    N._HL_LIB = None
    assert logs["native"] == logs["python"]
    assert logs["native"].count("\n") >= 8
    # capping engaged: undo and drain events present in the stream
    types = {l.split()[1] for l in logs["native"].strip().splitlines()}
    assert "u" in types and "b" in types
