"""Soft limiters: Reinhard and Tanh.

Reference: /root/reference/src/reinhard.rs (``x / (1 + |x|)`` per channel,
reinhard.rs:28-35) and /root/reference/src/tanh.rs (``tanh(x)`` per channel,
tanh.rs:22-29).  Pure elementwise maps; XLA fuses them into the producing
kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .channels import _Wrapper

__all__ = ["Reinhard", "Tanh"]


def _reinhard(x):
    return x / (1.0 + jnp.abs(x))


class Reinhard(_Wrapper):
    _dr_map = staticmethod(_reinhard)

    def __init__(self, signal):
        super().__init__(signal)
        self.channels = signal.channels

    def render(self, dstate, ddata, params, n):
        d2, block = self._inner_render(dstate, ddata, params, n)
        return d2, _reinhard(block)


class Tanh(_Wrapper):
    _dr_map = staticmethod(jnp.tanh)

    def __init__(self, signal):
        super().__init__(signal)
        self.channels = signal.channels

    def render(self, dstate, ddata, params, n):
        d2, block = self._inner_render(dstate, ddata, params, n)
        return d2, jnp.tanh(block)
