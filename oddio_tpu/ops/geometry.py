"""Device-side (jnp) spatial geometry, mirroring core/hostmath.py op-for-op.

Used by the device-resident spatial pool: the same f32 formulas as the
reference (spatial.rs:501-511 smoothing, math/mod.rs:62-94 quaternions,
spatial.rs:530-550 ear states), executed in-graph so per-block geometry costs
no host->device traffic.  Elementwise f32 ops are IEEE on the VPU, so results
match the host/numpy path bit-for-bit up to transcendentals (sqrt: <=1 ulp).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "smoothed_position",
    "quat_rotate",
    "ear_states",
    "frac1",
    "SPEED_OF_SOUND",
    "HEAD_RADIUS",
    "POSITION_SMOOTHING_PERIOD",
    "EAR_POS",
    "EAR_DIR",
]

#: spatial.rs:602 — rate sound travels from signals to listeners (m/s)
SPEED_OF_SOUND = np.float32(343.0)
#: spatial.rs:605 — distance from center of head to an ear (m)
HEAD_RADIUS = np.float32(0.1075)
#: spatial.rs:520 — seconds over which to smooth position discontinuities
POSITION_SMOOTHING_PERIOD = np.float32(0.5)

# Ear geometry (spatial.rs:571-598): positions of ears wrt a head facing -Z,
# and the unit direction of least attenuation ([+-4, 0, -1] normalized).
_SQRT17 = np.sqrt(np.float32(17.0), dtype=np.float32)
EAR_POS = np.array(
    [[-HEAD_RADIUS, 0.0, 0.0], [HEAD_RADIUS, 0.0, 0.0]], dtype=np.float32
)
EAR_DIR = np.array(
    [
        [np.float32(-4.0) / _SQRT17, 0.0, np.float32(-1.0) / _SQRT17],
        [np.float32(4.0) / _SQRT17, 0.0, np.float32(-1.0) / _SQRT17],
    ],
    dtype=np.float32,
)


def frac1(x):
    """x - floor(x), elementwise (fractional part in [0, 1))."""
    return x - jnp.floor(x)


def v3_norm(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.sqrt(x * x + (y * y + z * z))


def v3_dot(a, b):
    return a[..., 0] * b[..., 0] + (a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2])


def quat_mul(q, r):
    qs, qx, qy, qz = (q[..., i] for i in range(4))
    rs, rx, ry, rz = (r[..., i] for i in range(4))
    return jnp.stack(
        [
            qs * rs - qx * rx - qy * ry - qz * rz,
            qs * rx + qx * rs + qy * rz - qz * ry,
            qs * ry - qx * rz + qy * rs + qz * rx,
            qs * rz + qx * ry - qy * rx + qz * rs,
        ],
        axis=-1,
    )


def quat_invert(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], jnp.float32)


def quat_rotate(rot, p):
    """math/mod.rs:83-94."""
    pq = jnp.concatenate([jnp.zeros_like(p[..., :1]), p], axis=-1)
    return quat_mul(rot, quat_mul(pq, quat_invert(rot)))[..., 1:]


def smoothed_position(prev_position, state_dt, dt_extra, motion_pos, motion_vel):
    """State::smoothed_position (spatial.rs:501-511), batched (V, 3)."""
    dt = state_dt + jnp.float32(dt_extra)
    change = motion_vel * dt[:, None]
    naive = prev_position + change
    intended = motion_pos + change
    r = jnp.minimum(dt / POSITION_SMOOTHING_PERIOD, 1.0)[:, None]
    return (1.0 - r) * naive + r * intended


def ear_states(position, radius):
    """EarState::new for both ears (spatial.rs:530-550), batched.

    position: (V, 3) listener-space; radius: (V,).
    Returns (offset (V, 2) seconds, gain (V, 2))."""
    ear_pos = jnp.asarray(EAR_POS)
    ear_dir = jnp.asarray(EAR_DIR)
    rel = position[:, None, :] - ear_pos[None, :, :]
    distance = v3_norm(rel)
    offset = distance * jnp.float32(np.float32(-1.0) / SPEED_OF_SOUND)
    distance_gain = radius[:, None] / jnp.maximum(distance, radius[:, None])
    inv = jnp.float32(0.5) / distance
    scaled = position[:, None, :] * inv[:, :, None]
    d = v3_dot(ear_dir[None, :, :], scaled)
    stereo_gain = 0.5 + jnp.where(distance < 1e-3, jnp.float32(0.5), d)
    return offset, stereo_gain * distance_gain


# --- component-split twins -----------------------------------------------------
#
# (V, 3)/(V, 2) arrays tile as (8, 128) with 125+ dead lanes per tile, so
# every elementwise op on them runs at ~2-3% lane occupancy (V/8 native
# vector ops each).  The twins below carry vectors as tuples of (V,)
# components (lane-major: V/128 native ops per op — 16x denser) with the
# SAME f32 expression trees term for term, so results are bit-identical;
# callers stack back to packed shapes only at kernel operand boundaries.


def unstack3(p):
    """(V, 3) -> ((V,), (V,), (V,)) component views."""
    return p[:, 0], p[:, 1], p[:, 2]


def v3_norm_c(p3):
    x, y, z = p3
    return jnp.sqrt(x * x + (y * y + z * z))


def smoothed_position_c(prev3, state_dt, dt_extra, mp3, mv3):
    """smoothed_position on component tuples; bit-identical."""
    dt = state_dt + jnp.float32(dt_extra)
    r = jnp.minimum(dt / POSITION_SMOOTHING_PERIOD, 1.0)
    one_r = 1.0 - r
    out = []
    for pv, mp, mv in zip(prev3, mp3, mv3):
        change = mv * dt
        out.append(one_r * (pv + change) + r * (mp + change))
    return tuple(out)


def quat_rotate_c(rot, p3):
    """quat_rotate for a SHARED rotation: rot (4,) scalars, p3 component
    tuple.  The expression tree mirrors quat_mul(rot, quat_mul(pq,
    quat_invert(rot)))[1:] term for term (incl. the literal zero products
    of pq's scalar part), so it is bit-identical to quat_rotate."""
    rs, rx, ry, rz = rot[0], rot[1], rot[2], rot[3]
    nrx, nry, nrz = rx * jnp.float32(-1.0), ry * jnp.float32(-1.0), rz * jnp.float32(-1.0)
    x, y, z = p3
    z0 = jnp.zeros_like(x)
    # A = quat_mul(pq, quat_invert(rot)), pq = (0, x, y, z)
    As = z0 * rs - x * nrx - y * nry - z * nrz
    Ax = z0 * nrx + x * rs + y * nrz - z * nry
    Ay = z0 * nry - x * nrz + y * rs + z * nrx
    Az = z0 * nrz + x * nry - y * nrx + z * rs
    # out = quat_mul(rot, A)[1:]
    Ox = rs * Ax + rx * As + ry * Az - rz * Ay
    Oy = rs * Ay - rx * Az + ry * As + rz * Ax
    Oz = rs * Az + rx * Ay - ry * Ax + rz * As
    return Ox, Oy, Oz


def ear_states_c(p3, radius):
    """ear_states on a component tuple; returns per-ear lists
    ([off_L, off_R], [gain_L, gain_R]) of (V,) arrays, bit-identical to
    the packed form (the literal ear-constant zero terms are kept)."""
    x, y, z = p3
    offs, gains = [], []
    for e in range(2):
        ex = jnp.float32(EAR_POS[e, 0])
        ey = jnp.float32(EAR_POS[e, 1])
        ez = jnp.float32(EAR_POS[e, 2])
        relx, rely, relz = x - ex, y - ey, z - ez
        distance = jnp.sqrt(relx * relx + (rely * rely + relz * relz))
        offset = distance * jnp.float32(np.float32(-1.0) / SPEED_OF_SOUND)
        distance_gain = radius / jnp.maximum(distance, radius)
        inv = jnp.float32(0.5) / distance
        sx, sy, sz = x * inv, y * inv, z * inv
        edx = jnp.float32(EAR_DIR[e, 0])
        edy = jnp.float32(EAR_DIR[e, 1])
        edz = jnp.float32(EAR_DIR[e, 2])
        d = edx * sx + (edy * sy + edz * sz)
        stereo_gain = 0.5 + jnp.where(distance < 1e-3, jnp.float32(0.5), d)
        offs.append(offset)
        gains.append(stereo_gain * distance_gain)
    return offs, gains
