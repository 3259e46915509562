"""3D spatial audio scene — the flagship dense-batch engine.

Reference: /root/reference/src/spatial.rs — ``SpatialScene`` spatializes mono
signals into stereo with stereo panning, distance attenuation, doppler (via
time-varying propagation offsets resampling the source) and propagation
delay.  Two voice families exist:

* ``play`` (spatial.rs:289-302): ``Seek``-able sources, re-sampled per ear by
  seeking to the ear's delayed start time and sampling with a warped interval
  (spatial.rs:438-470) — doppler by time-warp.
* ``play_buffered`` (spatial.rs:314-340): arbitrary sources pre-rendered at a
  fixed rate into a per-voice ``Ring`` delay line (ring.rs:4-79), read back at
  fractional, time-varying offsets (spatial.rs:395-433).

Per block the reference, per voice: refreshes motion (swap channel) with 0.5 s
position smoothing and discontinuity handling (spatial.rs:216-239, 501-511),
rotates positions into listener space with the (inverted) listener quaternion,
computes per-ear gains/offsets (EarState, spatial.rs:530-550), linearly
interpolates offset & gain across the block, and accumulates into the ears;
finished voices linger for ``distance/c`` before reclamation
(spatial.rs:241-261).

TPU redesign (SURVEY.md §7): all *geometry* — smoothing, quaternion rotation,
ear gains/offsets, lingering — is per-voice-per-block scalar math and runs on
the **host** in vectorized f32 numpy with the reference's exact op order
(replacing the swap/atomic control plane).  The *audio* path runs on device:
one batched ``(voice, ear, frame)`` computation per pool — delay rings are a
dense ``(V, L)`` tensor written by masked scatter and read by a fractional
``gather + lerp`` at ``offset0 + j*ds mod cap``, with per-frame gain ramps
fused in, reduced over voices into the ``(2, n)`` output block.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core.hostmath import (
    f32,
    full,
    quat_invert,
    quat_rotate,
    rem_euclid,
    rust_rem,
    v3_dot,
    v3_norm,
)
from .core.signal import Signal
from .ops._dev import exact_positions, split_ds

__all__ = [
    "SpatialScene",
    "SpatialSceneControl",
    "Spatial",
    "SpatialOptions",
    "SPEED_OF_SOUND",
    "HEAD_RADIUS",
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

DEFAULT_CAPACITY = 16


class SpatialOptions:
    """Passed to play/play_buffered (spatial.rs:352-371)."""

    def __init__(self, position=(0.0, 0.0, 0.0), velocity=(0.0, 0.0, 0.0), radius=0.1):
        self.position = f32(position)
        self.velocity = f32(velocity)
        self.radius = np.float32(radius)


def _smoothed_position(prev_position, state_dt, dt_extra, motion_pos, motion_vel):
    """State::smoothed_position (spatial.rs:501-511), vectorized over voices.

    dt = state.dt + dt_extra; mix(prev + v*dt, intended + v*dt, min(dt/0.5,1))
    """
    dt = (state_dt + np.float32(dt_extra)).astype(np.float32)
    change = motion_vel * dt[:, None]
    naive = prev_position + change
    intended = motion_pos + change
    r = np.minimum((dt / POSITION_SMOOTHING_PERIOD).astype(np.float32), np.float32(1.0))[
        :, None
    ]
    return ((np.float32(1.0) - r) * naive + r * intended).astype(np.float32)


def _ear_states(position, radius):
    """EarState::new for both ears (spatial.rs:530-550), vectorized.

    position: (V, 3) listener-space position; radius: (V,).
    Returns offset (V, 2) seconds (negative) and gain (V, 2).
    """
    rel = position[:, None, :] - EAR_POS[None, :, :]  # (V, 2, 3)
    distance = v3_norm(rel)  # (V, 2)
    offset = distance * (np.float32(-1.0) / SPEED_OF_SOUND)
    distance_gain = radius[:, None] / np.maximum(distance, radius[:, None])
    # scale(position_wrt_listener, 0.5 / distance) then dot with ear dir
    inv = (np.float32(0.5) / distance).astype(np.float32)
    scaled = position[:, None, :] * inv[:, :, None]
    d = v3_dot(EAR_DIR[None, :, :], scaled)
    stereo_gain = np.float32(0.5) + np.where(
        distance < np.float32(1e-3), np.float32(0.5), d
    )
    return offset.astype(np.float32), (stereo_gain * distance_gain).astype(np.float32)


class _VoicePool:
    """Shared voice bookkeeping for both spatial pool kinds: the motion swap
    channels, smoothing state, lingering reclamation, and slot lifecycle."""

    def __init__(self, name, spec, capacity):
        self.name = name
        self.proto = spec
        self.sig = spec.clone_batched(capacity)
        self.capacity = capacity
        self._alloc_cols(capacity)
        self._free = list(range(capacity - 1, -1, -1))

    def _alloc_cols(self, V):
        self.mask = np.zeros(V, dtype=bool)
        self.stopped = np.zeros(V, dtype=bool)
        self.slot_gen = np.zeros(V, dtype=np.int64)
        self.radius = full((V,), 0.1)
        self.motion_pos = full((V,), 0.0, extra=(3,))
        self.motion_vel = full((V,), 0.0, extra=(3,))
        self.pend_flag = np.zeros(V, dtype=bool)
        self.pend_pos = full((V,), 0.0, extra=(3,))
        self.pend_vel = full((V,), 0.0, extra=(3,))
        self.pend_disc = np.zeros(V, dtype=bool)
        self.prev_position = full((V,), 0.0, extra=(3,))
        self.dt = full((V,), 0.0)
        self.finished_for = full((V,), np.nan)

    _COL_NAMES = (
        "mask stopped slot_gen radius motion_pos motion_vel pend_flag pend_pos "
        "pend_vel pend_disc prev_position dt finished_for"
    ).split()

    def grow(self):
        old = self.capacity
        new = old * 2
        self.sig.grow_batched(new)
        saved = {c: getattr(self, c) for c in self._COL_NAMES}
        self._alloc_cols(new)
        for c, v in saved.items():
            getattr(self, c)[:old] = v
        self._free = list(range(new - 1, old - 1, -1)) + self._free
        self.capacity = new

    def claim(self, spec, options):
        if not self._free:
            self.grow()
        i = self._free.pop()
        gen = int(self.slot_gen[i])
        self.sig.write_slot(i, spec, self, gen)
        spec._moved = True
        self.sig.device_reset_slot(i)
        self.mask[i] = True
        self.stopped[i] = False
        self.radius[i] = options.radius
        self.motion_pos[i] = options.position
        self.motion_vel[i] = options.velocity
        self.pend_flag[i] = False
        self.prev_position[i] = options.position  # State::new (spatial.rs:494-499)
        self.dt[i] = 0.0
        self.finished_for[i] = np.nan
        return i, gen

    def common_walk(self, prev_rot, rot, elapsed):
        """walk_set's per-voice prologue (spatial.rs:204-261), vectorized:
        motion refresh + smoothing, rotation into listener space, lingering
        reclamation.  Returns (prev_position, next_position) in listener
        space, both (V, 3)."""
        inner_finished = self.sig.host_is_finished()
        upd = self.pend_flag.copy()
        # spatial.rs:216-227: on refresh, prev_position snaps to the
        # discontinuity target or to the smoothed estimate under the OLD motion
        sm_orig = _smoothed_position(
            self.prev_position, self.dt, 0.0, self.motion_pos, self.motion_vel
        )
        new_prev = np.where(self.pend_disc[:, None], self.pend_pos, sm_orig)
        self.prev_position = np.where(upd[:, None], new_prev, self.prev_position).astype(
            np.float32
        )
        self.dt = np.where(upd, np.float32(0.0), self.dt).astype(np.float32)
        self.motion_pos = np.where(upd[:, None], self.pend_pos, self.motion_pos).astype(
            np.float32
        )
        self.motion_vel = np.where(upd[:, None], self.pend_vel, self.motion_vel).astype(
            np.float32
        )
        self.pend_flag[:] = False

        # spatial.rs:228-235: rotate smoothed start/end positions
        sm0 = _smoothed_position(
            self.prev_position, self.dt, 0.0, self.motion_pos, self.motion_vel
        )
        sm1 = _smoothed_position(
            self.prev_position, self.dt, elapsed, self.motion_pos, self.motion_vel
        )
        prev_position = quat_rotate(prev_rot[None, :], sm0)
        next_position = quat_rotate(rot[None, :], sm1)
        self.dt = (self.dt + np.float32(elapsed)).astype(np.float32)

        # spatial.rs:241-261: lingering reclamation with propagation delay
        distance = v3_norm(prev_position)
        lingering = ~np.isnan(self.finished_for)
        expire = lingering & (self.finished_for > distance / SPEED_OF_SOUND)
        self.stopped |= expire & self.mask
        self.finished_for = np.where(
            lingering & ~expire,
            (self.finished_for + np.float32(elapsed)).astype(np.float32),
            self.finished_for,
        )
        newly = self.mask & ~lingering & inner_finished
        self.finished_for = np.where(newly, np.float32(elapsed), self.finished_for)

        drop = self.mask & self.stopped
        if drop.any():
            self.mask &= ~drop
            for i in np.nonzero(drop)[0]:
                self.slot_gen[i] += 1
                self._free.append(int(i))
        return prev_position, next_position


class _BufferedPool(_VoicePool):
    """Voices played via play_buffered: per-voice delay rings on device."""

    def __init__(self, name, spec, capacity, rate, ring_len):
        self.rate = int(rate)
        self.ring_len = int(ring_len)
        self._n_inner = 1
        super().__init__(name, spec, capacity)
        self.ring = None  # jnp (V, L), created lazily

    def _alloc_cols(self, V):
        super()._alloc_cols(V)
        self.write = full((V,), 0.0)
        self.cap = np.full(V, 1, dtype=np.int32)
        self.max_delay = full((V,), 0.0)

    _COL_NAMES = _VoicePool._COL_NAMES + ["write", "cap", "max_delay"]

    def grow(self):
        old = self.capacity
        super().grow()
        if self.ring is not None:
            self.ring = jnp.concatenate(
                [self.ring, jnp.zeros((self.capacity - old, self.ring_len), jnp.float32)]
            )

    def ring_state(self):
        if self.ring is None:
            self.ring = jnp.zeros((self.capacity, self.ring_len), jnp.float32)
        return self.ring

    def play(self, spec, options, max_delay):
        i, gen = self.claim(spec, options)
        cap = int(np.ceil(np.float32(max_delay) * np.float32(self.rate))) + 1
        assert cap <= self.ring_len
        self.cap[i] = cap
        self.max_delay[i] = np.float32(max_delay)
        # SpatialSignalBuffered::new (spatial.rs:39-43): pre-delay the ring by
        # min(|position|/c, max_delay)
        d = np.minimum(
            v3_norm(f32(options.position)[None, :])[0] / SPEED_OF_SOUND,
            np.float32(max_delay),
        )
        self.write[i] = rust_rem(
            np.float32(self.rate) * np.float32(d), np.float32(cap)
        )
        self.ring_state()
        self.ring = self.ring.at[i].set(0.0)
        return i, gen

    def host_prepare(self, prev_rot, rot, interval, n):
        elapsed = (f32(interval) * np.float32(n)).astype(np.float32)
        prev_position, next_position = self.common_walk(prev_rot, rot, elapsed)
        V = self.capacity
        ratef = np.float32(self.rate)
        capf = self.cap.astype(np.float32)

        # Ring::write bookkeeping (ring.rs:18-41)
        w = self.write
        end = rust_rem((w + elapsed * ratef).astype(np.float32), capf)
        start_idx = np.ceil(w).astype(np.int64)
        end_idx = np.ceil(end).astype(np.int64)
        n_write = np.where(
            end_idx > start_idx, end_idx - start_idx, (self.cap - start_idx) + end_idx
        ).astype(np.int32)
        # end_idx == start_idx can only mean a zero-length write in valid use
        # (elapsed*rate < cap always, since cap = ceil(max_delay*rate)+1 and
        # elapsed <= max_delay per spatial.rs:403); the reference's split-write
        # branch (ring.rs:33-38) would write the whole buffer for elapsed == 0,
        # a degenerate case we treat as zero frames instead.
        n_write = np.where(end_idx == start_idx, 0, n_write)
        self.write = end.astype(np.float32)
        # static per (block size, interval): upper bound on any voice's write
        self._n_inner = int(np.ceil(np.float64(elapsed) * self.rate)) + 1 if n > 0 else 1
        inner_interval = np.full(V, np.float32(1.0) / ratef, np.float32)
        inner_params = self.sig.host_prepare(inner_interval, self._n_inner, count=n_write)

        # Per-ear offsets/gains (spatial.rs:409-431)
        prev_off, prev_gain = _ear_states(prev_position, self.radius)
        next_off, next_gain = _ear_states(next_position, self.radius)
        prev_off = np.maximum((prev_off - elapsed).astype(np.float32), -self.max_delay[:, None])
        next_off = np.maximum(next_off, -self.max_delay[:, None])
        nf = np.float32(n) if n > 0 else np.float32(1.0)
        dt_e = ((next_off - prev_off) / nf).astype(np.float32)
        d_gain = ((next_gain - prev_gain) / nf).astype(np.float32)
        # Ring::sample base offset (ring.rs:57): (write' + t*rate) rem_euclid cap
        offset0 = rem_euclid(
            (self.write[:, None] + prev_off * ratef).astype(np.float32), capf[:, None]
        )
        # split into an exact integer base and a fractional start so device
        # positions are near-exact (see ops/_dev.py)
        obase = np.floor(offset0)
        ds = (dt_e * ratef).astype(np.float32)
        ds_int, f_hi, f_lo = split_ds(ds)
        return {
            "mask": self.mask.copy(),
            "start": start_idx.astype(np.int32),
            "n_write": n_write,
            "cap": self.cap.copy(),
            "obase": obase.astype(np.int32),
            "ofrac": (offset0 - obase).astype(np.float32),
            "ds_int": ds_int,
            "f_hi": f_hi,
            "f_lo": f_lo,
            "gain0": prev_gain,
            "d_gain": d_gain,
            "inner": inner_params,
        }

    def render(self, dstate, ddata, params, n):
        # static: set by host_prepare; archetype() includes it so the driver
        # re-traces when it changes (different block size / interval)
        n_inner = self._n_inner
        # derive the voice count from the data: under shard_map this is the
        # per-shard slice of the pool, not the full capacity
        V = dstate["ring"].shape[0]
        dsub, blocks = jax.vmap(
            lambda d, p: self.sig.render(d, ddata.get("inner", {}), p, n_inner)
        )(dstate["inner"], params["inner"])
        samples = blocks[:, 0, :]  # (V, n_inner) mono

        # masked scatter into rings (Ring::write, ring.rs:18-41)
        ring = dstate["ring"]
        L = ring.shape[1]
        j = jnp.arange(n_inner)
        idx = jnp.mod(params["start"][:, None] + j[None, :], params["cap"][:, None])
        idx = jnp.where(j[None, :] < params["n_write"][:, None], idx, L)  # drop
        ring = ring.at[jnp.arange(V)[:, None], idx].set(samples, mode="drop")

        # fractional delayed read + gain ramp + accumulate (ring.rs:51-79,
        # spatial.rs:420-430); near-exact positions via the split trick
        jn = jnp.arange(n, dtype=jnp.float32)
        whole, fr = exact_positions(
            params["ofrac"], params["ds_int"], params["f_hi"], params["f_lo"], n
        )
        cap3 = params["cap"][:, None, None]
        x = jnp.mod(params["obase"][:, :, None] + whole, cap3)
        x1 = jnp.mod(x + 1, cap3)
        flat = lambda ix: jnp.take_along_axis(
            ring, ix.reshape(V, 2 * n), axis=1
        ).reshape(V, 2, n)
        a = flat(x)
        b = flat(x1)
        s = a + fr * (b - a)
        gains = (
            params["gain0"][:, :, None]
            + jn[None, None, :] * params["d_gain"][:, :, None]
        )
        contrib = jnp.where(params["mask"][:, None, None], s * gains, 0.0)
        out = jnp.sum(contrib, axis=0)  # (2, n)
        return {"ring": ring, "inner": dsub}, out


class _SeekPool(_VoicePool):
    """Voices played via play(): deterministic sources re-sampled per ear with
    warped time (doppler by time-warp, spatial.rs:438-470)."""

    def host_prepare(self, prev_rot, rot, interval, n):
        elapsed = (f32(interval) * np.float32(n)).astype(np.float32)
        prev_position, next_position = self.common_walk(prev_rot, rot, elapsed)
        prev_off, prev_gain = _ear_states(prev_position, self.radius)
        next_off, next_gain = _ear_states(next_position, self.radius)
        nf = np.float32(n) if n > 0 else np.float32(1.0)
        # spatial.rs:449-453
        effective = ((np.float32(elapsed) + next_off) - prev_off).astype(np.float32)
        dt_e = (effective / nf).astype(np.float32)
        d_gain = ((next_gain - prev_gain) / nf).astype(np.float32)
        ear_params = []
        for e in (0, 1):
            self.sig.host_seek(prev_off[:, e])  # initial real time -> delayed
            ear_params.append(self.sig.host_prepare(dt_e[:, e], n))
            # final delayed -> initial real time (spatial.rs:465)
            self.sig.host_seek((-effective[:, e] - prev_off[:, e]).astype(np.float32))
        self.sig.host_seek(np.full(self.capacity, elapsed, np.float32))
        return {
            "mask": self.mask.copy(),
            "earL": ear_params[0],
            "earR": ear_params[1],
            "gain0": prev_gain,
            "d_gain": d_gain,
        }

    def render(self, dstate, ddata, params, n):
        dd = ddata.get("inner", {})
        d2, bL = jax.vmap(lambda d, p: self.sig.render(d, dd, p, n))(
            dstate["inner"], params["earL"]
        )
        d3, bR = jax.vmap(lambda d, p: self.sig.render(d, dd, p, n))(
            d2, params["earR"]
        )
        s = jnp.stack([bL[:, 0, :], bR[:, 0, :]], axis=1)  # (V, 2, n)
        jn = jnp.arange(n, dtype=jnp.float32)
        gains = (
            params["gain0"][:, :, None]
            + jn[None, None, :] * params["d_gain"][:, :, None]
        )
        contrib = jnp.where(params["mask"][:, None, None], s * gains, 0.0)
        return {"inner": d3}, jnp.sum(contrib, axis=0)


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


class SpatialScene(Signal):
    """Signal for stereo output from a spatial scene (spatial.rs:159-188)."""

    channels = 2

    def __init__(self, initial_capacity=DEFAULT_CAPACITY):
        super().__init__()
        self.initial_capacity = initial_capacity
        self._rot = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
        self._rot_pending = None
        self._seek_pools = {}
        self._buffered_pools = {}

    @classmethod
    def new(cls, initial_capacity=DEFAULT_CAPACITY):
        """spatial.rs:170-188 — returns (SpatialSceneControl, SpatialScene)."""
        sig = cls(initial_capacity)
        return SpatialSceneControl(sig), sig

    # -- control side ---------------------------------------------------------

    def _play(self, spec, options):
        if spec.channels != 1:
            raise ValueError("spatial signals must be mono (spatial.rs:276-279)")
        if not spec.seekable:
            raise TypeError(
                "play() requires a seekable (deterministic) signal; "
                "use play_buffered() for arbitrary signals"
            )
        arch = spec.archetype()
        pool = self._seek_pools.get(arch)
        if pool is None:
            pool = _SeekPool(f"s{len(self._seek_pools)}", spec, self.initial_capacity)
            self._seek_pools[arch] = pool
        i, gen = pool.claim(spec, options)
        return Spatial(pool, i, gen)

    def _play_buffered(self, spec, options, max_distance, rate, buffer_duration):
        if spec.channels != 1:
            raise ValueError("spatial signals must be mono (spatial.rs:276-279)")
        # spatial.rs:330: max_delay = max_distance / c + buffer_duration
        max_delay = np.float32(max_distance) / SPEED_OF_SOUND + np.float32(
            buffer_duration
        )
        cap = int(np.ceil(np.float32(max_delay) * np.float32(rate))) + 1
        ring_len = _next_pow2(cap)
        key = (spec.archetype(), int(rate), ring_len)
        pool = self._buffered_pools.get(key)
        if pool is None:
            pool = _BufferedPool(
                f"b{len(self._buffered_pools)}",
                spec,
                self.initial_capacity,
                rate,
                ring_len,
            )
            self._buffered_pools[key] = pool
        i, gen = pool.play(spec, options, max_delay)
        return Spatial(pool, i, gen)

    def _set_listener_rotation(self, rotation):
        """spatial.rs:345-349 — stores the inverse quaternion."""
        q = f32(rotation)
        self._rot_pending = quat_invert(q)

    # -- Signal protocol ---------------------------------------------------------

    def _all_pools(self):
        return list(self._buffered_pools.values()) + list(self._seek_pools.values())

    def archetype(self):
        pools = tuple(
            (
                p.name,
                p.sig.archetype(),
                getattr(p, "ring_len", 0),
                getattr(p, "_n_inner", 0),
            )
            for p in self._all_pools()
        )
        return ("SpatialScene", pools)

    def host_prepare(self, interval, n, count=None):
        # listener rotation swap refresh (spatial.rs:382-386)
        prev_rot = self._rot
        if self._rot_pending is not None:
            self._rot = self._rot_pending
            self._rot_pending = None
        rot = self._rot
        return {
            p.name: p.host_prepare(prev_rot, rot, f32(interval), n)
            for p in self._all_pools()
        }

    def device_collect(self):
        out = {}
        for p in self._all_pools():
            d = {"inner": p.sig.device_collect()}
            if isinstance(p, _BufferedPool):
                d["ring"] = p.ring_state()
            out[p.name] = d
        return out

    def device_store(self, d):
        for p in self._all_pools():
            p.sig.device_store(d[p.name]["inner"])
            if isinstance(p, _BufferedPool):
                p.ring = d[p.name]["ring"]

    def device_data(self):
        return {p.name: {"inner": p.sig.device_data()} for p in self._all_pools()}

    def render(self, dstate, ddata, params, n):
        out = jnp.zeros((2, n), dtype=jnp.float32)
        d2 = {}
        for p in self._all_pools():
            dsub, block = p.render(dstate[p.name], ddata[p.name], params[p.name], n)
            d2[p.name] = dsub
            out = out + block
        return d2, out


class SpatialSceneControl:
    """Control for modifying a SpatialScene (spatial.rs:267-350)."""

    def __init__(self, scene):
        self._scene = scene

    def play(self, signal, options=None):
        return self._scene._play(signal, options or SpatialOptions())

    def play_buffered(self, signal, options=None, max_distance=100.0, rate=48000,
                      buffer_duration=0.1):
        return self._scene._play_buffered(
            signal, options or SpatialOptions(), max_distance, rate, buffer_duration
        )

    def set_listener_rotation(self, rotation):
        """Listener rotation as quaternion (s, x, y, z); an unrotated listener
        faces -Z with +X right and +Y up (spatial.rs:342-349)."""
        self._scene._set_listener_rotation(rotation)


class Spatial:
    """Control for updating the motion of a spatial signal (spatial.rs:119-157)."""

    def __init__(self, pool, slot, gen):
        self._pool = pool
        self._slot = slot
        self._gen = gen

    def _live(self):
        return self._pool.slot_gen[self._slot] == self._gen

    def set_motion(self, position, velocity, discontinuity=False):
        """spatial.rs:137-149 — last-value-wins, applied at the next block."""
        if not self._live():
            return
        i = self._slot
        p = self._pool
        p.pend_pos[i] = f32(position)
        p.pend_vel[i] = f32(velocity)
        p.pend_disc[i] = bool(discontinuity)
        p.pend_flag[i] = True

    def is_finished(self):
        """Whether the signal has completed and can no longer be heard,
        accounting for propagation delay (spatial.rs:151-157)."""
        if not self._live():
            return True
        return bool(self._pool.stopped[self._slot])
