"""Sine oscillator.

Reference: /root/reference/src/sine.rs — emits ``sin(i*interval*freq + phase)``
per frame (sine.rs:34-40) and wraps the phase modulo TAU after each block for
numerical stability no matter how long it plays (sine.rs:25-28).  The phase
wrap uses Rust ``%`` (fmod) semantics.

TPU form: the block is a pure function of (interval, freq, phase); the f32
phase is host state advanced per block.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.hostmath import TAU32, f32, full, rust_rem
from ..core.signal import Signal
from ._dev import exact_positions, split_ds

__all__ = ["Sine"]


class Sine(Signal):
    seekable = True
    _host_fields = ("phase", "freq")

    def __init__(self, phase=0.0, frequency_hz=440.0):
        super().__init__()
        self._alloc_host(())
        self.phase[()] = f32(phase)
        # sine.rs:19-22: frequency stored in radians per second
        self.freq[()] = f32(frequency_hz) * TAU32

    @classmethod
    def new(cls, phase, frequency_hz):
        return cls(phase, frequency_hz)

    def _alloc_host(self, batch):
        # phase is kept in f64 on the host (the device only ever sees the
        # f32 rounding of the wrapped phase), so the wrap arithmetic never
        # accumulates f32 error across blocks; the modulus stays the
        # reference's f32 TAU (sine.rs:25-28).
        self.phase = full(batch, 0.0, np.float64)
        self.freq = full(batch, 0.0)

    def _seek_to(self, t):
        # sine.rs:25-28
        self.phase = rust_rem(
            self.phase + np.float64(1.0) * np.asarray(t, np.float64) * self.freq,
            np.float64(TAU32),
        )

    def host_prepare(self, interval, n, count=None):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        params = self._cycle_params(interval)
        cnt = n if count is None else count
        cnt = np.broadcast_to(f32(cnt), self.batch)
        # sine.rs:38-39: seek_to(interval * out.len() as f32)
        self._seek_to((interval * cnt).astype(np.float32))
        return params

    def _cycle_params(self, interval):
        """Per-frame phase in *cycles* with the exact-split decomposition, so
        the device evaluates sin on an argument already wrapped into
        [0, TAU) — avoiding both f32 argument-magnitude rounding and XLA's
        large-argument range reduction (the reference's f32 ``t*freq+phase``
        carries ~eps*|arg| of its own rounding; this is the exact-math
        version of the same semantics)."""
        tau = np.float64(TAU32)
        dc = interval.astype(np.float64) * (self.freq.astype(np.float64) / tau)
        dc_int, f_hi, f_lo = split_ds(dc)
        c0 = (self.phase / tau).astype(np.float32)
        return {
            "c0": np.broadcast_to(c0, self.batch).astype(np.float32),
            "dc_int": np.broadcast_to(dc_int, self.batch).astype(np.int32),
            "f_hi": np.broadcast_to(f_hi, self.batch).astype(np.float32),
            "f_lo": np.broadcast_to(f_lo, self.batch).astype(np.float32),
        }

    def host_params_at(self, tshift, interval, n):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        saved = self.phase
        self.phase = rust_rem(
            self.phase + np.asarray(f32(tshift), np.float64) * self.freq,
            np.float64(TAU32),
        )
        params = self._cycle_params(interval)
        self.phase = saved
        return params

    def host_seek(self, seconds):
        self._seek_to(f32(seconds))

    def render(self, dstate, ddata, params, n):
        # sine.rs:34-40: out = sin(t*freq + phase), evaluated as
        # sin(TAU * frac(c0 + i*dc)) with near-exact cycle positions
        _, frac = exact_positions(
            params["c0"], params["dc_int"], params["f_hi"], params["f_lo"], n
        )
        block = jnp.sin(TAU32 * frac)
        return dstate, block[None, :]

    # -- device-resident mode ------------------------------------------------

    def dr_supported(self):
        # DR reproduces the default never-finishes semantics only
        return type(self).host_is_finished is Signal.host_is_finished

    def dr_state_init(self, V):
        return {
            "freq": np.zeros(V, np.float32),
            "cyc": np.zeros(V, np.float32),  # wrapped phase in cycles [0,1)
        }

    def dr_slot_row(self, interval):
        tau = np.float64(TAU32)
        return {
            "freq": np.float32(self.freq[()]),
            "cyc": np.float32(np.mod(self.phase[()] / tau, 1.0)),
        }

    def dr_render(self, state, ddata, interval, n, count):
        import jax.numpy as jnp
        from ._dev import device_split_ds

        # per-frame phase step in cycles; f32 quantization of dc costs
        # <= n*eps*dc (~1e-5 rad per block), non-accumulating
        dc = state["freq"] * np.float32(np.float64(interval) / np.float64(TAU32))
        dc_int, f_hi, f_lo = device_split_ds(dc)
        _, frac = exact_positions(state["cyc"], dc_int, f_hi, f_lo, n)
        samples = jnp.sin(TAU32 * frac)
        # advance the wrapped phase by count frames with exact pieces so the
        # per-block bias is ~eps (no audible frequency shift)
        cf = count.astype(jnp.float32)
        H = cf * f_hi  # exact
        adv = (H - jnp.floor(H)) + cf * f_lo
        cyc2 = state["cyc"] + adv
        cyc2 = cyc2 - jnp.floor(cyc2)
        return {"freq": state["freq"], "cyc": cyc2}, samples

    def dr_is_finished(self, state):
        return jnp.zeros(state["freq"].shape, dtype=bool)

    # -- device-resident Seek mode --------------------------------------------

    def dr_seek_supported(self):
        return self.dr_supported()

    def dr_warp_render(self, state, ddata, t0, dt, n):
        from ._dev import device_split_ds

        inv_tau = np.float32(1.0 / np.float64(TAU32))
        fcyc = state["freq"] * inv_tau  # cycles per second
        # time-shifted start phase in cycles: cyc + t0*fcyc, wrapped.  The
        # f32 product t0*fcyc rounds by ~eps*|t0*fcyc| (<= ~2e-5 cycles at
        # 0.15 s offsets / 2 kHz) — the same order as the reference's own
        # f32 ``phase + t*freq`` seek (sine.rs:25-28).
        oc = t0 * fcyc[:, None]  # (V, E)
        oc = oc - jnp.floor(oc)
        c0 = state["cyc"][:, None] + oc
        c0 = c0 - jnp.floor(c0)
        dc = dt * fcyc[:, None]  # warped cycles per frame (V, E)
        dc_int, f_hi, f_lo = device_split_ds(dc)
        _, frac = exact_positions(c0, dc_int, f_hi, f_lo, n)
        return jnp.sin(TAU32 * frac)

    def dr_advance(self, state, seconds):
        inv_tau = np.float32(1.0 / np.float64(TAU32))
        adv = state["freq"] * (np.float32(seconds) * inv_tau)
        cyc2 = state["cyc"] + (adv - jnp.floor(adv))
        return {"freq": state["freq"], "cyc": cyc2 - jnp.floor(cyc2)}
