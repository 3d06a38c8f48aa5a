"""User-facing ``EDMBias`` — mirrors the reference's public surface: the
C++ engine API (lib/edm_bias.h:36-116) plus the Boost.Python binding
(python/edm/edm_python.cxx:8-18: set_box, pre_add_hill, add_hill_r,
post_add_hill, write_bias, write_lammps_table, write_histogram,
clear_histogram, get_force) and the ``edm`` package convenience
``add_hill`` (python/edm/edm/__init__.py:4-8).

This class is the *host shell*: it owns config/files/logging and a
``BiasState`` pytree, and drives the jit-compiled round functions in
``edm_tpu.bias``.  MD hosts (edm_tpu.models) bypass it and call the pure
functions directly inside their compiled step loops.

Binding quirks: the reference's ``subdivide_py`` drops periodicity on the
floor (writes ``b_periodic[3]`` — SURVEY.md Q4); we fix that, so
``set_box(lo, hi, periodic)`` honors its periodic argument.  ``get_force``
returns +dU/dx exactly like the binding does (it is the gradient, despite
the name; ``update_force(s)`` applies the negated gradient).
"""

from __future__ import annotations

import random as _pyrandom
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import bias as _bias
from .grid import Grid
from .utils.config import EDMConfig, parse_edm_file
from .utils.errors import edm_error
from .utils.gridio import read_grid_file, write_grid, write_lammps_table
from .utils.hills_log import HillsLog


class EDMBias:
    def __init__(
        self,
        input_filename: str,
        temperature: Optional[float] = None,
        boltzmann_constant: Optional[float] = None,
        dtype=jnp.float64,
        rank: int = 0,
        log_hills: bool = True,
        exact_deposit: bool = False,
        hill_passes=1,
    ):
        # exact_deposit: force the reference-exact windowed deposit even
        # where a separable fast path exists (bias.BiasParams.exact_deposit)
        # hill_passes: split each hill round into this many sequential
        # sub-batches (bias.add_hills_round n_passes).  "live" = one hill
        # per pass, which reproduces the reference's hill-by-hill live-grid
        # well-tempering (edm_bias.cpp:547-550) exactly; integers must
        # divide the padded batch (any power of two does)
        self.cfg: EDMConfig = parse_edm_file(input_filename)
        self.dim = self.cfg.dim
        self.temperature = -1.0
        self.boltzmann_factor = -1.0
        self._kB = -1.0
        self.rank = rank
        self.dtype = dtype
        self._log_hills = log_hills
        self._exact_deposit = bool(exact_deposit)
        if hill_passes != "live":
            hill_passes = int(hill_passes)
            if hill_passes < 1 or (hill_passes & (hill_passes - 1)):
                edm_error(
                    "hill_passes must be a power of two (to divide the "
                    "padded batch) or 'live'", "api.py",
                )
        self._hill_passes = hill_passes

        self.target: Optional[Grid] = None
        if self.cfg.target_filename:
            # no interpolation for the target (edm_bias.cpp:1061)
            self.target = read_grid_file(self.cfg.target_filename, dim=self.dim, interpolate=False, dtype=dtype)
        self.initial_bias: Optional[Grid] = None
        if self.cfg.initial_bias_filename:
            import dataclasses as _dc

            ib = read_grid_file(self.cfg.initial_bias_filename, dim=self.dim, interpolate=True, dtype=dtype)
            self.initial_bias = ib

        self.params = None
        self.state = None
        self.hills_log: Optional[HillsLog] = None
        self.mask = None

        self._pending_positions = []
        self._pending_runiform = []
        self._est_hill_count = 0
        self._round_jit = {}
        self._warned_stall = False

        if temperature is not None and boltzmann_constant is not None:
            self.setup(temperature, boltzmann_constant)

    # ------------------------------------------------------------------ setup

    def setup(self, temperature: float, boltzmann_constant: float) -> None:
        """Learn temperature / kT (edm_bias.cpp:264-269)."""
        self.temperature = float(temperature)
        self.boltzmann_factor = float(boltzmann_constant) * float(temperature)
        self._kB = float(boltzmann_constant)

    def subdivide(self, sublo, subhi, boxlo, boxhi, b_periodic, skin) -> None:
        if self.state is not None:
            return  # reference: idempotent (edm_bias.cpp:121-122)
        if self.temperature < 0:
            edm_error("Must call setup before subdivide", "api.py:subdivide")
        self.params, self.state = _bias.subdivide(
            self.cfg,
            self.temperature,
            self._kB,
            sublo,
            subhi,
            boxlo,
            boxhi,
            b_periodic,
            skin,
            target=self.target,
            initial_bias=self.initial_bias,
            dtype=self.dtype,
            exact_deposit=self._exact_deposit,
        )
        if self._log_hills:
            name = f"{self.cfg.hills_filename}_{self.rank}"
            self.hills_log = HillsLog(name, self.dim, self.params.total_volume)

    def set_box(self, boxlo: Sequence[float], boxhi: Sequence[float], periodic: Sequence[bool]) -> None:
        """Python-binding convenience (edm_bias_py.cpp:29-48) — whole box on
        one replica, no skin.  Periodicity honored (reference Q4 fixed)."""
        skin = [0.0] * self.dim
        self.subdivide(boxlo, boxhi, boxlo, boxhi, [bool(p) for p in periodic], skin)

    def set_mask(self, mask) -> None:
        self.mask = np.asarray(mask)

    # ----------------------------------------------------------------- forces

    def update_forces(self, positions, forces, apply_mask: Optional[int] = None) -> float:
        """Array-based force update (edm_bias.cpp:276-295): looks up the bias
        gradient at each position and applies ``forces[:, :dim] -= dU/dx``.
        ``forces`` is a mutable numpy array. Returns the bias energy."""
        positions = np.asarray(positions, dtype=float)
        mask = None
        if apply_mask is not None and self.mask is not None:
            mask = jnp.asarray((self.mask & apply_mask) != 0)
        e, der = _bias.update_forces(self.params, self.state, jnp.asarray(positions), mask)
        forces[:, : self.dim] -= np.asarray(der)
        return float(e)

    def update_force(self, position, forces) -> float:
        """Single-CV force update (edm_bias.cpp:297-311)."""
        p = np.asarray(position, dtype=float)[None, :]
        e, der = _bias.update_forces(self.params, self.state, jnp.asarray(p))
        forces[: self.dim] -= np.asarray(der)[0]
        return float(e)

    def get_force(self, position):
        """Binding surface (edm_bias_py.cpp:63-79): returns (energy, dU/dx
        list) — note: the *gradient*, not its negation, as in the binding."""
        p = jnp.asarray(np.asarray(position, dtype=float)[None, :], self.dtype)
        v, der = self.state.bias.get_value_deriv(p)
        return float(v[0]), [float(x) for x in np.asarray(der)[0]]

    # ------------------------------------------------------------------ hills

    def _require_state(self):
        if self.state is None:
            edm_error("Must call set_box/subdivide before using the bias", "api.py")

    def pre_add_hill(self, est_hill_count: int) -> None:
        self._require_state()
        self._pending_positions = []
        self._pending_runiform = []
        self._est_hill_count = int(est_hill_count)

    def add_hill_r(self, position, runiform: float) -> None:
        self._pending_positions.append(list(np.asarray(position, dtype=float)[: self.dim]))
        self._pending_runiform.append(float(runiform))

    def add_hill(self, position) -> None:
        """One-hill pre/add/post cycle (python/edm/edm/__init__.py:4-8)."""
        self.pre_add_hill(1)
        self.add_hill_r(position, _pyrandom.random())
        self.post_add_hill()

    def post_add_hill(self) -> None:
        n = len(self._pending_positions)
        # pad to a power of two to bound retracing across variable batch sizes
        padded = max(1, 1 << (n - 1).bit_length()) if n else 1
        pos = np.zeros((padded, self.dim))
        uni = np.ones((padded,))
        act = np.zeros((padded,), bool)
        if n:
            pos[:n] = self._pending_positions
            uni[:n] = self._pending_runiform
            act[:n] = True
        self._run_round(jnp.asarray(pos, self.dtype), jnp.asarray(uni, self.dtype), self._est_hill_count, jnp.asarray(act))
        self._pending_positions = []
        self._pending_runiform = []

    def add_hills(self, positions, runiform, apply_mask: Optional[int] = None) -> None:
        """Batch interface (edm_bias.cpp:397-411).  Padded to a power of two
        like post_add_hill: bounds retraces across batch sizes and keeps any
        integer ``hill_passes`` dividing the batch."""
        self._require_state()
        positions = np.asarray(positions, dtype=float)
        n = positions.shape[0]
        active = np.ones((n,), bool)
        if apply_mask is not None and self.mask is not None:
            active = (self.mask[:n] & apply_mask) != 0
        padded = max(1, 1 << (n - 1).bit_length()) if n else 1
        pos = np.zeros((padded, self.dim))
        uni = np.ones((padded,))
        act = np.zeros((padded,), bool)
        pos[:n] = positions[:, : self.dim]
        uni[:n] = np.asarray(runiform, dtype=float)
        act[:n] = active
        self._run_round(
            jnp.asarray(pos, self.dtype),
            jnp.asarray(uni, self.dtype),
            n,
            jnp.asarray(act),
        )

    def _run_round(self, positions, runiform, est_hill_count, active) -> None:
        key = positions.shape[0]
        n_passes = key if self._hill_passes == "live" else min(self._hill_passes, key)
        if key not in self._round_jit:
            self._round_jit[key] = jax.jit(
                _bias.add_hills_round, static_argnames=("n_passes",)
            )
        cum_before = float(self.state.cum_bias)
        step = int(self.state.steps)
        self.state, rec = self._round_jit[key](
            self.params, self.state, positions, runiform,
            jnp.asarray(est_hill_count, self.dtype), active,
            n_passes=n_passes,
        )
        _bias.check_state(self.state)
        # stall detection: a single hill whose integral exceeds bias_per_step
        # is deposited and fully undone every round (the reference silently
        # no-ops forever on such configs — its own python-example does this)
        if (
            not self._warned_stall
            and int(self.state.buf_right) > int(self.state.buf_left)
            and float(rec.round_bias) == 0.0
        ):
            import warnings

            warnings.warn(
                "EDM hill round deposited zero bias while hills remain "
                "deferred: a single hill's integrated bias likely exceeds "
                "bias_per_step (raise bias_per_step or shrink "
                "hill_prefactor/bias_sigma). The reference implementation "
                "silently loops forever on such configs.",
                stacklevel=3,
            )
            self._warned_stall = True
        if self.hills_log is not None:
            self.hills_log.log_round(step, cum_before, rec, positions)

    # --------------------------------------------------------------- file I/O

    def write_bias(self, output: str) -> None:
        write_grid(self.state.bias.grid, output)

    def write_lammps_table(self, output: str) -> None:
        write_lammps_table(
            self.state.bias.grid,
            output,
            self.params.cfg.box_low,
            self.params.cfg.box_high,
        )

    def write_histogram(self) -> None:
        write_grid(self.state.cv_hist, self.cfg.histogram_filename)

    def clear_histogram(self) -> None:
        import dataclasses as _dc

        self.state = _dc.replace(self.state, cv_hist=self.state.cv_hist.clear())

    # ------------------------------------------------------------- inspection

    @property
    def cum_bias(self) -> float:
        return float(self.state.cum_bias)

    @property
    def bias_grid(self):
        return self.state.bias

    def bias_value(self, position) -> float:
        p = jnp.asarray(np.asarray(position, dtype=float)[None, :], self.dtype)
        return float(self.state.bias.get_value(p)[0])
