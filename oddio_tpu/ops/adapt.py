"""Automatic gain control (AGC).

Reference: /root/reference/src/adapt.rs — per frame, maintains an exponential
moving average of the squared summed-channel level with time constant ``tau``
(``alpha = 1 - exp(-interval/tau)``, adapt.rs:70-75) and applies a gain
pulling the average peak into [low, high], capped at ``max_gain``
(adapt.rs:76-86).

TPU form: the per-frame EMA is genuinely sequential and data-dependent, so it
runs as a ``lax.scan`` over the frame axis with the ``avg_squared`` carry in
device state (batched over voices by the pool vmap).  A ``count`` mask keeps
the carry exact when fewer frames are actually consumed (spatial ring
writers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.hostmath import f32, full
from ..core.signal import Signal

__all__ = ["Adapt", "AdaptOptions"]

_SQRT2 = np.sqrt(np.float32(2.0), dtype=np.float32)


class AdaptOptions:
    """adapt.rs:36-61."""

    def __init__(self, tau=0.1, max_gain=np.inf, low=None, high=None):
        self.tau = np.float32(tau)
        self.max_gain = np.float32(max_gain)
        self.low = np.float32(0.1) / _SQRT2 if low is None else np.float32(low)
        self.high = np.float32(0.5) / _SQRT2 if high is None else np.float32(high)


class Adapt(Signal):
    _host_fields = ("tau", "max_gain", "low", "high", "avg0")

    def __init__(self, signal, initial_rms, options=None):
        super().__init__()
        options = options or AdaptOptions()
        self.inner = signal
        self.channels = signal.channels
        self._alloc_host(())
        self.tau[()] = options.tau
        self.max_gain[()] = options.max_gain
        self.low[()] = options.low
        self.high[()] = options.high
        # adapt.rs:25-31: avg_squared = initial_rms^2
        self.avg0[()] = np.float32(initial_rms) * np.float32(initial_rms)

    def children(self):
        return {"inner": self.inner}

    def _alloc_host(self, batch):
        self.tau = full(batch, 0.1)
        self.max_gain = full(batch, 1.0)
        self.low = full(batch, 0.1)
        self.high = full(batch, 0.5)
        self.avg0 = full(batch, 1.0)

    def _own_device_init(self):
        return {"avg": jnp.asarray(self.avg0)}

    def _own_slot_init(self, i):
        return {"avg": np.float32(self.avg0[i])}

    def host_prepare(self, interval, n, count=None):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        # adapt.rs:70: alpha = 1 - exp(-interval / tau)
        alpha = (np.float32(1.0) - np.exp(-interval / self.tau)).astype(np.float32)
        cnt = np.broadcast_to(
            np.asarray(n if count is None else count, np.int32), self.batch
        )
        return {
            "alpha": alpha,
            "max_gain": self.max_gain.copy(),
            "low": self.low.copy(),
            "high": self.high.copy(),
            "count": cnt.copy(),
            "inner": self.inner.host_prepare(interval, n, count),
        }

    def host_is_finished(self):
        return self.inner.host_is_finished()

    def render(self, dstate, ddata, params, n):
        d2, block = self.inner.render(
            dstate.get("inner", {}), ddata.get("inner", {}), params["inner"], n
        )
        alpha = params["alpha"]
        one_m = 1.0 - alpha

        def step(avg, xi):
            x, i = xi
            s = jnp.sum(x)  # sum of channels (adapt.rs:73)
            avg2 = s * s * alpha + avg * one_m
            avg_peak = jnp.sqrt(avg2) * _SQRT2
            gain = jnp.where(
                avg_peak < params["low"],
                jnp.minimum(params["low"] / avg_peak, params["max_gain"]),
                jnp.where(avg_peak > params["high"], params["high"] / avg_peak, 1.0),
            )
            # don't advance the EMA past the consumed-frame count
            carry = jnp.where(i < params["count"], avg2, avg)
            return carry, x * gain

        avg, out = jax.lax.scan(
            step, dstate["avg"], (block.T, jnp.arange(n, dtype=jnp.int32))
        )
        return {"avg": avg, "inner": d2}, out.T

    # -- device-resident mode ------------------------------------------------
    # The EMA carry lives on device already; in DR pools the option columns
    # join it and the scan runs batched over the whole pool (the same
    # per-frame op order as the vmapped host path — bit-identical).

    def dr_supported(self):
        return self.channels == 1 and self.inner.dr_supported()

    def dr_state_init(self, V):
        return {
            "tau": np.full(V, 0.1, np.float32),
            "max_gain": np.ones(V, np.float32),
            "low": np.full(V, 0.1, np.float32),
            "high": np.full(V, 0.5, np.float32),
            "avg": np.ones(V, np.float32),
            "inner": self.inner.dr_state_init(V),
        }

    def dr_slot_row(self, interval):
        return {
            "tau": np.float32(self.tau[()]),
            "max_gain": np.float32(self.max_gain[()]),
            "low": np.float32(self.low[()]),
            "high": np.float32(self.high[()]),
            "avg": np.float32(self.avg0[()]),
            "inner": self.inner.dr_slot_row(interval),
        }

    def dr_render(self, state, ddata, interval, n, count):
        d2, samples = self.inner.dr_render(
            state["inner"], ddata.get("inner", {}), interval, n, count
        )
        # adapt.rs:70: alpha = 1 - exp(-interval / tau)
        alpha = 1.0 - jnp.exp(-jnp.asarray(interval, jnp.float32) / state["tau"])
        one_m = 1.0 - alpha

        def step(avg, xi):
            s, i = xi  # (V,) mono frame, scalar index
            avg2 = s * s * alpha + avg * one_m
            avg_peak = jnp.sqrt(avg2) * _SQRT2
            gain = jnp.where(
                avg_peak < state["low"],
                jnp.minimum(state["low"] / avg_peak, state["max_gain"]),
                jnp.where(avg_peak > state["high"], state["high"] / avg_peak, 1.0),
            )
            carry = jnp.where(i < count, avg2, avg)
            return carry, s * gain

        avg, out = jax.lax.scan(
            step, state["avg"], (samples.T, jnp.arange(n, dtype=jnp.int32))
        )
        st = dict(state)
        st["avg"], st["inner"] = avg, d2
        return st, out.T

    def dr_is_finished(self, state):
        return self.inner.dr_is_finished(state["inner"])
