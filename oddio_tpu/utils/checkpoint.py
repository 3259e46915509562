"""Engine checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5); its closest analogue is
``Seek`` plus readable playback positions.  In this rebuild every signal's
state is explicit — small host numpy arrays plus a device pytree — so a
scene can be snapshotted and resumed exactly.  The snapshot captures state
only; the graph structure (what was played into which engine) must be
reconstructed by the caller before ``restore`` (same archetype).
"""

from __future__ import annotations

import pickle

import numpy as np
import jax

__all__ = ["snapshot", "restore", "save", "load"]


def _host_state(sig):
    flush = getattr(sig, "_flush_tick_debt", None)
    if flush is not None:
        flush()  # deferred idle-tick mirror debt must land in the snapshot
    state = {f: np.copy(getattr(sig, f)) for f in sig._host_fields}
    aux = getattr(sig, "host_aux_snapshot", None)
    if aux is not None:
        state["__aux__"] = aux()
    kids = {k: _host_state(c) for k, c in sig.children().items()}
    if kids:
        state["__children__"] = kids
    return state


def _set_host_state(sig, state):
    if getattr(sig, "_tick_debt", None):
        sig._tick_debt = []  # restored mirrors are authoritative
    for f in sig._host_fields:
        setattr(sig, f, np.copy(state[f]))
    aux = getattr(sig, "host_aux_restore", None)
    if aux is not None and "__aux__" in state:
        aux(state["__aux__"])
    for k, c in sig.children().items():
        _set_host_state(c, state.get("__children__", {})[k])


def snapshot(signal):
    """Capture (host_state, device_state) for a signal graph or engine."""
    host = _host_state(signal)
    extra = None
    snap_fn = getattr(signal, "host_snapshot", None)
    if snap_fn is not None:
        extra = snap_fn()
    device = jax.tree.map(np.asarray, signal.device_collect())
    return {"host": host, "extra": extra, "device": device}


def restore(signal, snap):
    """Restore a snapshot into a structurally identical signal graph."""
    _set_host_state(signal, snap["host"])
    if snap["extra"] is not None:
        signal.host_restore(snap["extra"])
    import jax.numpy as jnp

    signal.device_store(jax.tree.map(jnp.asarray, snap["device"]))


def save(signal, path):
    with open(path, "wb") as f:
        pickle.dump(snapshot(signal), f)


def load(signal, path):
    with open(path, "rb") as f:
        restore(signal, pickle.load(f))
