"""Sparse control deltas for filters inside device-resident pools.

The reference's ``Gain``/``Speed`` handles write shared atomics that the
audio thread reads every ``sample`` call (gain.rs:103-108, speed.rs:32-36).
In a device-resident pool the equivalent is a bounded per-block delta
channel per controllable field: handle writes queue ``(slot, value)`` on
the host (last-wins per slot, like the atomics), and the jitted step
scatters them into the pool's state tree before rendering.

The set of controllable fields is static per pool (derived from the
prototype chain at pool creation), so delta arrays keep a fixed structure
and control traffic never retraces the step.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DRCtrlMixin", "walk_ctrl_keys"]


def walk_ctrl_keys(proto):
    """Ordered (path, field) pairs for every controllable host field in the
    chain; ``path`` is the tuple of child keys from the pool root."""
    keys = []

    def walk(node, path):
        for f in getattr(node, "_dr_ctrl_fields", ()):
            keys.append((path, f))
        for k, c in node.children().items():
            walk(c, path + (k,))

    walk(proto, ())
    return keys


def _scatter(tree, path, field, idx, vals):
    t = dict(tree)
    if path:
        t[path[0]] = _scatter(t[path[0]], path[1:], field, idx, vals)
    else:
        t[field] = t[field].at[idx].set(vals, mode="drop")
    return t


class DRCtrlMixin:
    """Shared by device-resident voice pools (spatial + mixer)."""

    #: per-block delta-channel capacity per controllable field
    k_ctrl = 64

    def _init_ctrl(self, proto):
        self.ctrl_keys = walk_ctrl_keys(proto)
        self.pending_ctrl = {k: {} for k in self.ctrl_keys}

    def _rebind_ctrl(self, spec, slot, gen):
        """Point every control handle in ``spec``'s chain at this pool."""

        def walk(node, path):
            cb = getattr(node, "_cb", None)
            if cb is not None:
                cb.rebind_dr(self, slot, gen, path)
            for k, c in node.children().items():
                walk(c, path + (k,))

        walk(spec, ())

    def push_ctrl(self, path, field, slot, value):
        self.pending_ctrl[(path, field)][slot] = np.float32(value)

    def _ctrl_pending_any(self):
        return any(self.pending_ctrl.values())

    def _ctrl_delta_params(self, params):
        """Pack one (idx, val) pair per controllable field (padded; overflow
        beyond k_ctrl carries to the next block)."""
        for j, key in enumerate(self.ctrl_keys):
            pend = self.pending_ctrl[key]
            items = list(pend.items())[: self.k_ctrl]
            for s, _ in items:
                del pend[s]
            idx = np.full(self.k_ctrl, self.capacity, np.int32)
            val = np.zeros(self.k_ctrl, np.float32)
            for t, (s, v) in enumerate(items):
                idx[t] = s
                val[t] = v
            params[f"ctrl_idx{j}"] = idx
            params[f"ctrl_val{j}"] = val
        return params

    def _ctrl_apply(self, inner_state, params):
        """Scatter queued control writes into the inner state tree (applied
        after plays, so a write always lands on the voice it targeted)."""
        if "ctrl_idx0" not in params or not self.ctrl_keys:
            return inner_state
        from ..parallel.context import localize_index

        V = None
        for j, (path, field) in enumerate(self.ctrl_keys):
            idx = params[f"ctrl_idx{j}"]
            if V is None:
                t = inner_state
                for k in path:
                    t = t[k]
                V = t[field].shape[0]
            lidx = localize_index(idx, V)
            inner_state = _scatter(
                inner_state, path, field, lidx, params[f"ctrl_val{j}"]
            )
        return inner_state
