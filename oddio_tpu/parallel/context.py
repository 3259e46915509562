"""Trace-time context for voice-axis sharding.

When a pool render is traced inside ``shard_map`` with its voice axis
sharded, sparse control-delta indices are global slot numbers; each shard
must translate them to local rows (out-of-shard indices drop).  ScenePack
sets the axis name here for the duration of the traced step.
"""

from __future__ import annotations

import contextlib

_VOICE_AXIS = None


def current_voice_axis():
    return _VOICE_AXIS


@contextlib.contextmanager
def voice_axis(name):
    global _VOICE_AXIS
    prev = _VOICE_AXIS
    _VOICE_AXIS = name
    try:
        yield
    finally:
        _VOICE_AXIS = prev


def localize_index(idx, v_local):
    """Map global slot indices to shard-local rows; out-of-shard -> v_local
    (dropped by scatter mode='drop')."""
    import jax
    import jax.numpy as jnp

    ax = current_voice_axis()
    if ax is None:
        return idx
    off = jax.lax.axis_index(ax) * v_local
    local = idx - off
    return jnp.where((local >= 0) & (local < v_local), local, v_local)
