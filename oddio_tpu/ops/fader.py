"""Constant-power crossfade between dynamically supplied signals.

Reference: /root/reference/src/fader.rs — ``Fader`` wraps an inner signal;
``FaderControl::fade_to(signal, duration)`` delivers a replacement through a
swap channel (fader.rs:86-93).  A fade must complete before the next begins
(a newer waiting command replaces the older, fader.rs:38-47); while fading,
``out = sqrt(1-p)*old + sqrt(p)*new`` per frame (fader.rs:52-65), and on
completion the new signal replaces the old (fader.rs:66-70).

TPU form: fades are a *graph-structure event*: idle renders one child,
fading renders both with the closed-form progress ramp fused in.  The
Renderer keys its jitted step on the archetype, so starting/finishing a fade
retraces (two compiled variants per child-archetype pair) — the analogue of
the reference's idle fast path (fader.rs:42-45).  The old→new swap is
deferred to the next block boundary so a block's params always match the
graph that produced them.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.hostmath import f32
from ..core.signal import Signal
from ._dev import iota_f32

__all__ = ["Fader", "FaderControl"]


class Fader(Signal):
    def __init__(self, inner):
        super().__init__()
        self.a = inner
        self.channels = inner.channels
        self.b = None  # active fade target
        self.progress = np.float32(1.0)
        self.duration = np.float32(1.0)
        self._pending = None  # (signal, duration), last-wins (fader.rs:86-92)
        self._swap_next = False
        self.control = FaderControl(self)

    @classmethod
    def new(cls, inner):
        sig = cls(inner)
        return sig.control, sig

    def children(self):
        kids = {"a": self.a}
        if self.b is not None:
            kids["b"] = self.b
        return kids

    def _arch_extra(self):
        return ("fading" if self.b is not None else "idle",)

    def clone_batched(self, V):
        raise NotImplementedError(
            "Fader cannot live inside a voice pool; use it standalone or "
            "wrap the pool-owning engine"
        )

    def host_prepare(self, interval, n, count=None):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        if self._swap_next:
            # fader.rs:66-70, deferred to the block boundary: move the new
            # signal (and its device state, owned by the node) into place.
            self.a, self.b = self.b, None
            self._swap_next = False
        # fader.rs:38-47: a pending fade starts only once idle
        if self.progress >= 1.0 and self._pending is not None:
            sig, dur = self._pending
            self._pending = None
            if sig._moved:
                raise RuntimeError("fade target was already played (moved)")
            sig._moved = True
            self.b = sig
            self.duration = np.float32(dur)
            self.progress = np.float32(0.0)

        if self.b is None:
            return {"a": self.a.host_prepare(interval, n, count)}

        inc = (interval / self.duration).astype(np.float32)
        params = {
            "progress0": np.asarray(self.progress, np.float32),
            "inc": inc,
            "a": self.a.host_prepare(interval, n, count),
            "b": self.b.host_prepare(interval, n, count),
        }
        cnt = np.broadcast_to(f32(n if count is None else count), self.batch)
        self.progress = np.float32(
            np.minimum(self.progress + cnt * inc, np.float32(1.0))
        )
        if self.progress >= 1.0:
            self._swap_next = True
        return params

    def host_is_finished(self):
        return np.zeros(self.batch, dtype=bool)  # fader.rs:74-77

    def render(self, dstate, ddata, params, n):
        d2a, old = self.a.render(
            dstate.get("a", {}), ddata.get("a", {}), params["a"], n
        )
        out = dict(dstate)
        out["a"] = d2a
        if self.b is None:
            return out, old
        d2b, new = self.b.render(
            dstate.get("b", {}), ddata.get("b", {}), params["b"], n
        )
        out["b"] = d2b
        # fader.rs:57-63: constant-power ramp, progress clamped at 1
        p = jnp.minimum(params["progress0"] + iota_f32(n) * params["inc"], 1.0)
        fade_out = jnp.sqrt(1.0 - p)
        fade_in = jnp.sqrt(p)
        return out, old * fade_out[None, :] + new * fade_in[None, :]


class FaderControl:
    """fader.rs:81-93: crossfade to ``signal`` over ``duration`` seconds; if a
    fade is in progress the new command waits (and replaces any waiter)."""

    def __init__(self, fader):
        self._fader = fader

    def fade_to(self, signal, duration):
        if signal.channels != self._fader.channels:
            raise ValueError("fade target must match channel count")
        self._fader._pending = (signal, float(duration))
