"""Fused AGC (Adapt) gain kernel.

Reference: /root/reference/src/adapt.rs:69-88 — per frame, an exponential
moving average of the squared summed-channel level (``avg' = avg*(1-a) +
a*s^2``) drives a gain pulling the average peak into [low, high].

``ops/adapt.py`` runs that linear recurrence as a log-depth
``lax.associative_scan``.  Correct — but the scan's odd/even lane slicing
expands to ~300 XLA ops per Adapt instance, and on real v5e that subgraph
is latency-bound, not data-bound: a SECOND 32-slot Adapt pool in a
16-scene ScenePack adds ~0.36 ms/block while a 32-slot pool of bare Sine
adds ~nothing (tools/r5_probe8.py; the same instance costs 0.137 ms at
(16, 256, 512)).  This kernel fuses the whole EMA + gain pipeline into
ONE Mosaic program using a closed form that needs no scan at all:

    c_i   = min(i+1, count)          live frames through i (count freezes
                                     the carry exactly like the masked
                                     sequential path, adapt.rs:69-75)
    M_i   = exp(c_i * log1p(-a))     the decay prefix, elementwise
    csum  = cumsum(live * a*s^2/M)   one 128x128 one-hot matmul per lane
                                     chunk (MXU) + carry adds
    prev_i = M_{i-1} * (avg0 + csum_{i-1})
    avg_i  = a*s_i^2 + (1-a)*prev_i,  gain_i as adapt.rs:76-86

Validity: the M factors span exp(+-n*interval/tau); the closed form is
used only when the pool's host-tracked bound ``EMA_NMAX * interval/tau_min
<= EMA_GATE`` holds (tau >= ~0.33 ms at 48 kHz — every sane AGC; checked
<= 6e-7 vs the sequential oracle to gate-bound alphas, tools/r5_probe9
notes).  Pathological taus keep the associative-scan path (the pool
stamps ``_pool_ema_fast`` like ``_pool_ds_small``, an archetype flag).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ring import _pad0, _pad_v

__all__ = ["agc_gains", "pack_agc_scalars", "EMA_NMAX", "EMA_GATE"]

_SQRT2 = np.sqrt(np.float32(2.0), dtype=np.float32)

#: frame bound the pools' closed-form gate is computed at (blocks are
#: chunked to <= 512 frames everywhere; see ops/_dev.py::chunked_frames)
EMA_NMAX = 512
#: max EMA_NMAX * interval/tau the closed form accepts: exp arguments stay
#: in [-32, 32] (no overflow, <= 6e-7 gain error vs the sequential oracle)
EMA_GATE = 32.0


def ema_gain_closed(avg0, s, alpha, count, low, high, max_gain, n):
    """The kernel's closed form as plain XLA ops — the non-TPU fast path.

    Interpret-mode pallas re-executes the kernel body through the
    interpreter per block, which made the CPU test suite crawl; this is
    the SAME math (decay prefixes + cumsum of scaled terms) evaluated
    directly, so CPU tests pin the formulation while the Mosaic kernel
    (pinned by tests/test_agc_kernel.py in interpret mode and by
    tools/r5_probe9b.py on real v5e) carries it on TPU."""
    import jax.numpy as jnp

    s2 = s * s
    i_n = jnp.arange(n, dtype=jnp.int32)
    live = i_n < count[..., None]
    a = alpha[..., None]
    c = jnp.minimum(i_n + 1, count[..., None]).astype(jnp.float32)
    lg = jnp.log1p(-a)
    M = jnp.exp(c * lg)
    terms = jnp.where(live, (a * s2) / M, 0.0)
    csum = jnp.cumsum(terms, axis=-1)
    carry = M[..., -1] * (avg0 + csum[..., -1])
    prev_c = jnp.minimum(i_n.astype(jnp.float32), count[..., None].astype(jnp.float32))
    prev = jnp.exp(prev_c * lg) * (avg0[..., None] + (csum - terms))
    avg2 = s2 * a + prev * (1.0 - a)
    avg_peak = jnp.sqrt(avg2) * _SQRT2
    lo = low[..., None]
    gain = jnp.where(
        avg_peak < lo,
        jnp.minimum(lo / avg_peak, max_gain[..., None]),
        jnp.where(avg_peak > high[..., None], high[..., None] / avg_peak, 1.0),
    )
    return gain, carry


def pack_agc_scalars(avg0, alpha, count, low, high, max_gain):
    """Pack the per-voice AGC scalars into one (V, 8) kernel operand
    (the pack_select_scalars pattern: row-constant values ride a single
    low-lane block instead of six (V, 1) operands)."""
    lg = jnp.log1p(-alpha)
    z = jnp.zeros_like(avg0)
    return jnp.stack(
        [avg0, alpha, lg, count.astype(jnp.float32), low, high, max_gain, z],
        axis=-1,
    )


def _agc_kernel(scal_ref, s_ref, gains_ref, carry_ref, *, n):
    scal = scal_ref[...]  # (tile, 8)
    s = s_ref[...]  # (tile, n)
    avg0 = scal[:, 0:1]
    a = scal[:, 1:2]
    lg = scal[:, 2:3]
    cnt = scal[:, 3:4]  # f32-exact (<= 512)
    low = scal[:, 4:5]
    high = scal[:, 5:6]
    mg = scal[:, 6:7]
    tile = s.shape[0]
    # 128x128 inclusive-prefix one-hot: U[j, i] = j <= i (0/1 entries, so
    # MXU products are exact f32 scalings of the terms)
    rj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    U = (rj <= ci).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    off = jnp.zeros((tile, 1), jnp.float32)
    outs = []
    for k in range(n // 128):
        lane = (lane0 + 128 * k).astype(jnp.float32)
        c = jnp.minimum(lane + 1.0, cnt)
        M = jnp.exp(c * lg)
        sk = s[:, 128 * k : 128 * (k + 1)]
        s2 = sk * sk
        terms = jnp.where(lane < cnt, (a * s2) / M, 0.0)
        within = jax.lax.dot_general(
            terms, U, dn, preferred_element_type=jnp.float32
        )
        csum = within + off
        # exclusive prefix by subtraction (exact where terms froze; ~1 ulp
        # of the inclusive sum elsewhere — inside the 1e-5 contract)
        prev_c = jnp.minimum(lane, cnt)
        prev = jnp.exp(prev_c * lg) * (avg0 + (csum - terms))
        # output uses the TRUE alpha past count too (adapt.rs renders a
        # one-step EMA from the frozen carry on partial blocks)
        avg2 = s2 * a + prev * (1.0 - a)
        avg_peak = jnp.sqrt(avg2) * _SQRT2
        gain = jnp.where(
            avg_peak < low,
            jnp.minimum(low / avg_peak, mg),
            jnp.where(avg_peak > high, high / avg_peak, 1.0),
        )
        outs.append(gain)
        off = csum[:, 127:128]
    gains_ref[...] = jnp.concatenate(outs, axis=-1)
    c_last = jnp.minimum(jnp.float32(n), cnt)
    carry_ref[...] = jnp.exp(c_last * lg) * (avg0 + off)


def agc_gains(s, scal, *, n, interpret=False, tile=None):
    """Fused EMA + gain over the frame axis: ``s`` (V, n) summed-channel
    levels, ``scal`` (V, 8) from pack_agc_scalars.  Returns
    (gains (V, n), carry (V,)) matching ops/adapt.py::_ema_gain to the
    closed form's <= 6e-7 (gate-bound alphas).  ``n`` must be a multiple
    of 128 and <= EMA_NMAX (callers fall back to the scan otherwise)."""
    V0 = s.shape[0]
    V = _pad_v(V0)
    s = _pad0(s, V)
    scal = _pad0(scal, V)  # zero rows: lg=0 -> M=1, cnt=0 -> gain=1; sliced off
    if tile is None:
        tile = 256
        while V % tile:
            tile //= 2
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    gains, carry = pl.pallas_call(
        functools.partial(_agc_kernel, n=n),
        out_shape=[
            jax.ShapeDtypeStruct((V, n), jnp.float32),
            jax.ShapeDtypeStruct((V, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, s)
    return gains[:V0], carry[:V0, 0]
