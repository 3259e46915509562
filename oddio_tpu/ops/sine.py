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
from ._dev import iota_f32

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
        self.phase = full(batch, 0.0)
        self.freq = full(batch, 0.0)

    def _seek_to(self, t):
        # sine.rs:25-28
        self.phase = rust_rem(
            (self.phase + f32(t) * self.freq).astype(np.float32), TAU32
        )

    def host_prepare(self, interval, n, count=None):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        params = {
            "interval": interval.copy(),
            "freq": self.freq.copy(),
            "phase": self.phase.copy(),
        }
        cnt = n if count is None else count
        cnt = np.broadcast_to(f32(cnt), self.batch)
        # sine.rs:38-39: seek_to(interval * out.len() as f32)
        self._seek_to((interval * cnt).astype(np.float32))
        return params

    def host_params_at(self, tshift, interval, n):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        phase = rust_rem(
            (self.phase + f32(tshift) * self.freq).astype(np.float32), TAU32
        )
        return {
            "interval": interval.copy(),
            "freq": self.freq.copy(),
            "phase": np.broadcast_to(phase, self.batch).astype(np.float32),
        }

    def host_seek(self, seconds):
        self._seek_to(f32(seconds))

    def render(self, dstate, ddata, params, n):
        # sine.rs:34-40: t = interval * i; out = sin(t*freq + phase)
        t = iota_f32(n) * params["interval"]
        block = jnp.sin(t * params["freq"] + params["phase"])
        return dstate, block[None, :]
