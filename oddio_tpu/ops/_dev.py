"""Small device-side helpers shared by op kernels."""

from __future__ import annotations

import jax.numpy as jnp


def iota_f32(n):
    return jnp.arange(n, dtype=jnp.float32)


def lerp(a, b, t):
    """frame::lerp (reference frame.rs:39-41): a + t*(b-a), elementwise."""
    return a + t * (b - a)
