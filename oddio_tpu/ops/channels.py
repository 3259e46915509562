"""Channel-count adapters: MonoToStereo and Downmix.

Reference: /root/reference/src/signal.rs:61-91 (MonoToStereo duplicates the
mono channel) and /root/reference/src/downmix.rs (Downmix sums all channels).

Note on Downmix: the reference samples its inner signal in fixed 256-frame
staging chunks (downmix.rs:23-33), which advances the inner signal by
``ceil(n/256)*256`` frames even when ``n`` is not a multiple of 256 — a
side effect of its staging buffer, not a semantic goal.  This rebuild
advances the inner signal by exactly ``n`` frames; outputs agree whenever
``n`` is a multiple of 256 (and for deterministic inner signals always).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.signal import Signal

__all__ = ["MonoToStereo", "Downmix"]


class _Wrapper(Signal):
    _dr_ingest_transparent = True

    def __init__(self, signal):
        super().__init__()
        self.inner = signal
        self.seekable = signal.seekable

    def children(self):
        return {"inner": self.inner}

    def _alloc_host(self, batch):
        pass

    def _copy_static_from(self, other):
        self.seekable = other.seekable
        self.channels = other.channels

    def host_prepare(self, interval, n, count=None):
        return {"inner": self.inner.host_prepare(interval, n, count)}

    def host_params_at(self, tshift, interval, n):
        return {"inner": self.inner.host_params_at(tshift, interval, n)}

    def host_seek(self, seconds):
        self.inner.host_seek(seconds)

    def host_is_finished(self):
        return self.inner.host_is_finished()

    def _inner_render(self, dstate, ddata, params, n):
        d2, block = self.inner.render(
            dstate.get("inner", {}), ddata.get("inner", {}), params["inner"], n
        )
        out = dict(dstate)
        out["inner"] = d2
        return out, block

    # -- device-resident plumbing for stateless mono wrappers --------------------
    # Subclasses that transform samples elementwise (Reinhard, Tanh) opt in
    # by overriding ``_dr_map``; mono-only, like all DR chains.

    _dr_map = None

    def dr_supported(self):
        return self._dr_map is not None and self.inner.dr_supported()

    def dr_state_init(self, V):
        return {"inner": self.inner.dr_state_init(V)}

    def dr_slot_row(self, interval):
        return {"inner": self.inner.dr_slot_row(interval)}

    def dr_render(self, state, ddata, interval, n, count):
        d2, samples = self.inner.dr_render(
            state["inner"], ddata.get("inner", {}), interval, n, count
        )
        return {"inner": d2}, type(self)._dr_map(samples)

    def dr_is_finished(self, state):
        return self.inner.dr_is_finished(state["inner"])

    def dr_seek_supported(self):
        return (
            self._dr_map is not None
            and self.channels == 1
            and self.seekable
            and self.inner.dr_seek_supported()
        )

    def dr_warp_render(self, state, ddata, t0, dt, n):
        samples = self.inner.dr_warp_render(
            state["inner"], ddata.get("inner", {}), t0, dt, n
        )
        return type(self)._dr_map(samples)

    def dr_advance(self, state, seconds):
        return {"inner": self.inner.dr_advance(state["inner"], seconds)}


class MonoToStereo(_Wrapper):
    """signal.rs:61-91 — duplicate a mono signal into both stereo channels."""

    def __init__(self, signal):
        if signal.channels != 1:
            raise ValueError("MonoToStereo requires a mono inner signal")
        super().__init__(signal)
        self.channels = 2

    def render(self, dstate, ddata, params, n):
        d2, block = self._inner_render(dstate, ddata, params, n)
        return d2, jnp.broadcast_to(block, (2, n))

    def dr_supported(self):
        return self.inner.dr_supported()

    def dr_render(self, state, ddata, interval, n, count):
        d2, samples = self.inner.dr_render(
            state["inner"], ddata.get("inner", {}), interval, n, count
        )
        V = samples.shape[0]
        return {"inner": d2}, jnp.broadcast_to(samples[:, None, :], (V, 2, n))


class Downmix(_Wrapper):
    """downmix.rs — sum all channels to mono."""

    def __init__(self, signal):
        super().__init__(signal)
        self.channels = 1

    def render(self, dstate, ddata, params, n):
        d2, block = self._inner_render(dstate, ddata, params, n)
        return d2, jnp.sum(block, axis=0, keepdims=True)

    def dr_supported(self):
        return self.inner.dr_supported()

    def dr_render(self, state, ddata, interval, n, count):
        d2, samples = self.inner.dr_render(
            state["inner"], ddata.get("inner", {}), interval, n, count
        )
        if samples.ndim == 3:
            samples = jnp.sum(samples, axis=1)
        return {"inner": d2}, samples
