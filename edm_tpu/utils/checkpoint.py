"""Exact checkpoint/resume for engine and host states.

The reference can only resume through grid files (``initial_bias_filename``
re-read at subdivide, edm_bias.cpp:1066-1072,166-167) and loses the
overflow buffer, ``cum_bias``/tempering state, and the step counter across
restarts.  This module checkpoints ANY state pytree (BiasState, host
states, sharded states) exactly: array leaves to a single ``.npz``,
restored into a structurally-identical template — a continued run is
bit-identical to an uninterrupted one.

Static structure (grid specs, params) is NOT stored: rebuild it from the
``.edm`` config exactly as at startup and pass the fresh state as the
template.  A structure fingerprint guards against loading a checkpoint
into a mismatched build.
"""

from __future__ import annotations

import io

import jax
import numpy as np

from .errors import edm_error

_MAGIC = "edm_tpu_checkpoint_v1"


def _fingerprint(treedef, leaves) -> str:
    shapes = ";".join(f"{tuple(l.shape)}:{l.dtype}" for l in leaves)
    return f"{_MAGIC}|{treedef}|{shapes}"


def save_state(state, filename: str) -> None:
    """Write every array leaf of ``state`` to ``filename`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = [np.asarray(l) for l in leaves]
    payload = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    payload["__fingerprint__"] = np.frombuffer(
        _fingerprint(treedef, arrays).encode(), dtype=np.uint8
    )
    with open(filename, "wb") as f:
        np.savez(f, **payload)


def load_state(template, filename: str):
    """Restore a state saved by ``save_state`` into ``template``'s structure.

    ``template``: a freshly-built state with the same static configuration
    (same .edm config / subdivide call / host setup).  Raises on any
    structural mismatch instead of silently mis-restoring.
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with open(filename, "rb") as f:
        data = np.load(io.BytesIO(f.read()))
    want = _fingerprint(treedef, [np.asarray(l) for l in leaves])
    got = bytes(data["__fingerprint__"]).decode()
    if got != want:
        edm_error(
            "checkpoint structure does not match this build/config "
            f"(saved: {got.split('|')[0]}...)",
            "checkpoint:load_state",
        )
    import jax.numpy as jnp

    new_leaves = []
    for i, t in enumerate(leaves):
        a = jnp.asarray(data[f"leaf_{i}"], t.dtype)
        if isinstance(t, jax.Array) and getattr(t, "committed", False):
            # restore the template's explicit device placement/sharding
            # (shard_coord_state / init_spatial_state leaves) so resumed
            # sharded-host states start exactly where a live state would
            # be; uncommitted templates stay uncommitted — jit places them
            a = jax.device_put(a, t.sharding)
        new_leaves.append(a)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
