"""Static audio storage and playback.

Reference: /root/reference/src/frames.rs — ``Frames<T>`` is an immutable,
rate-tagged sample array (frames.rs:19-124) and ``FramesSignal`` plays it from
an f64 cursor with linear interpolation and zero-padding outside the range
(frames.rs:141-214), publishing its playback position for the control half
(frames.rs:223-248).

TPU redesign: all ``Frames`` data lives in a per-channel-count **device
arena** — one concatenated f32 array — so that a pool of voices playing
*different* sounds is still a single dense gather: each voice carries an
(offset, length) pair into the arena.  This replaces per-sound ``Arc``
sharing; loading new sounds appends to the arena (a rare re-upload, analogous
to oddio's set-realloc protocol, set.rs:208-212).

Cursor precision: oddio keeps ``t`` in f64 (frames.rs:143-149).  TPUs have no
fast f64, so the cursor stays in **host** f64 and the device receives a
(base:int32, offset0:f32, ds:f32) decomposition per block — bit-faithful to
the reference's ``s0 = t*rate; base = s0 as isize`` split (frames.rs:177-189).
The per-frame offsets use the closed form ``offset0 + i*ds`` rather than the
reference's sequential ``offset += ds`` f32 accumulation; the difference is
pure rounding (≲ n·eps samples within one block; cross-block state is exact).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .hostmath import EPS32, f32, f64, full
from .signal import ControlBlock, Signal
from ..ops._dev import exact_positions, lerp, split_ds, top12 as _top12_np

__all__ = ["Frames", "FramesSignal", "FramesSignalControl"]


#: row granularity of the guarded arena (matches the ring/kernel row size)
ARENA_ROW = 256
#: zero-guard length around each guarded region: covers a whole block's read
#: span (RESAMPLE_NMAX * RESAMPLE_DSMAX) plus cursor-row slack, so
#: out-of-range reads hit literal zeros (frames.rs:105-123) with no masking
ARENA_GUARD = 3072
#: maximum read span a looped region must cover past its cursor
_LOOP_SPAN = ARENA_GUARD


def _row_pad(k):
    return (-k) % ARENA_ROW


def guard_stride(length):
    """Samples between consecutive channels' guarded regions of one sound
    (a pure function of its length, so per-channel offsets never need to
    ship: off_c = guard_off + c * guard_stride(len))."""
    return 2 * ARENA_GUARD + length + _row_pad(length)


class _Arena:
    """Concatenated device storage for all Frames with a given channel count.

    Two mono layouts exist side by side for the device-resident kernel path:
    *guarded* regions ([zeros, data, zeros], row-aligned — FramesSignal) and
    *looped* regions (data replicated to cover one block's span past the
    seam, row-aligned — Cycle), both in a second "garena" array viewed as
    (rows, 256) so window fetches are row-granular."""

    def __init__(self, channels):
        self.channels = channels
        self._chunks = []  # list of np arrays
        self._total = 0
        self._device = None
        # one leading zero row so window fetches biased a sample before a
        # region start still index valid rows
        self._gchunks = [np.zeros(ARENA_ROW, np.float32)]
        self._gtotal = ARENA_ROW
        self._gdevice = None

    def add(self, data):
        off = self._total
        self._chunks.append(data)
        self._total += data.shape[0]
        self._device = None
        return off

    def add_guarded(self, data):
        """Returns the garena sample index of data[0]."""
        z = np.zeros(ARENA_GUARD, np.float32)
        tail = np.zeros(ARENA_GUARD + _row_pad(len(data)), np.float32)
        for c in (z, data, tail):
            self._gchunks.append(c)
        off = self._gtotal + ARENA_GUARD
        self._gtotal += len(z) + len(data) + len(tail)
        self._gdevice = None
        return off

    def add_looped(self, data):
        """Returns (offset of data[0], region length in samples)."""
        copies = 1 + -(-(_LOOP_SPAN + 2) // max(len(data), 1))
        rep = np.tile(data, copies)
        pad = np.zeros(_row_pad(len(rep)), np.float32)
        off = self._gtotal
        self._gchunks.append(rep)
        self._gchunks.append(pad)
        self._gtotal += len(rep) + len(pad)
        self._gdevice = None
        return off, len(rep)

    def device(self):
        if self._device is None:
            if not self._chunks:
                shape = (1,) if self.channels == 1 else (1, self.channels)
                self._device = jnp.zeros(shape, dtype=jnp.float32)
            else:
                self._device = jnp.asarray(np.concatenate(self._chunks, axis=0))
        return self._device

    def device_rows(self):
        """The guarded arena as (rows, 256) f32."""
        if self._gdevice is None:
            flat = np.concatenate(self._gchunks)
            self._gdevice = jnp.asarray(flat.reshape(-1, ARENA_ROW))
        return self._gdevice


_ARENAS = {}


def _arena(channels):
    if channels not in _ARENAS:
        _ARENAS[channels] = _Arena(channels)
    return _ARENAS[channels]


class Frames:
    """A sequence of static audio frames at a particular sample rate
    (frames.rs:12-124).  ``data`` is float32, shape (len,) mono or (len, C)."""

    def __init__(self, rate, data):
        data = f32(data)
        if data.ndim == 1:
            self.channels = 1
        else:
            self.channels = int(data.shape[1])
        self._rate = np.float64(rate)  # stored as f64 like the header (frames.rs:20)
        self.data = data
        self.arena = _arena(self.channels)
        self.offset = self.arena.add(data)
        self._guard_off = None  # lazy guarded region (FramesSignal DR kernel)
        self._loop_off = None  # lazy looped region (Cycle DR kernel)

    def guard_off(self):
        """Guarded-region offset of channel 0; multi-channel sounds lay
        their channels at a constant, length-derivable stride (see
        guard_stride) so one offset addresses them all."""
        if self._guard_off is None:
            if self.channels == 1:
                self._guard_off = self.arena.add_guarded(self.data)
            else:
                offs = [
                    self.arena.add_guarded(np.ascontiguousarray(self.data[:, c]))
                    for c in range(self.channels)
                ]
                stride = guard_stride(len(self))
                assert all(
                    offs[c] == offs[0] + c * stride for c in range(self.channels)
                )
                self._guard_off = offs[0]
        return self._guard_off

    def loop_off(self):
        if self._loop_off is None:
            if self.channels != 1:
                raise ValueError("looped regions are mono-only")
            self._loop_off = self.arena.add_looped(self.data)
        return self._loop_off

    @classmethod
    def from_slice(cls, rate, samples):
        """frames.rs:26-47."""
        return cls(rate, samples)

    @classmethod
    def from_iter(cls, rate, it):
        """frames.rs:50-77."""
        return cls(rate, np.fromiter(it, dtype=np.float32))

    def __len__(self):
        return int(self.data.shape[0])

    def rate(self):
        """Samples per second (frames.rs:80-82)."""
        return int(self._rate)

    def runtime(self):
        """Runtime in seconds (frames.rs:85-87)."""
        return len(self) / self._rate

    def interpolate(self, s):
        """Host-side frame interpolation at sample position ``s``
        (frames.rs:94-102): whole numbers hit exact samples, out-of-range
        positions yield 0."""
        x0 = int(np.trunc(s))
        fract = np.float32(np.float64(s) - np.float64(x0))
        a, b = self._get_pair(x0)
        return (a + fract * (b - a)).astype(np.float32)

    def _get_pair(self, s):
        """frames.rs:105-123."""
        zero = np.zeros(self.data.shape[1:], np.float32) if self.data.ndim > 1 else np.float32(0.0)
        n = len(self)
        a = self.data[s] if 0 <= s < n else zero
        b = self.data[s + 1] if 0 <= s + 1 < n else zero
        return a, b


def _arena_get(arena, off, length, s):
    """Zero-padded arena gather implementing get_pair's edge semantics
    (frames.rs:105-123): valid for 0 <= s < length, zero otherwise."""
    valid = (s >= 0) & (s < length)
    idx = off + jnp.clip(s, 0, jnp.maximum(length - 1, 0))
    v = jnp.take(arena, idx, axis=0, mode="clip")
    if arena.ndim > 1:
        valid = valid[..., None]
    return jnp.where(valid, v, 0.0)


class FramesSignal(Signal):
    """An audio signal backed by static samples (frames.rs:141-214)."""

    seekable = True
    _host_fields = ("t", "off", "length", "rate", "goff")

    def __init__(self, frames, start_seconds=0.0):
        super().__init__()
        self.channels = frames.channels
        self._alloc_host(())
        self.t[()] = np.float64(start_seconds)
        self.off[()] = frames.offset
        self.length[()] = len(frames)
        self.rate[()] = frames._rate
        # guarded region for the DR resample kernel (channel c of a
        # multi-channel sound sits at goff + c*guard_stride(length))
        self.goff[()] = frames.guard_off()
        self._cb = ControlBlock(self)
        self.control = FramesSignalControl(self._cb)

    @classmethod
    def new(cls, frames, start_seconds=0.0):
        """frames.rs:152-169 — returns (control, signal)."""
        sig = cls(frames, start_seconds)
        return sig.control, sig

    def _alloc_host(self, batch):
        self.t = full(batch, 0.0, np.float64)
        self.off = full(batch, 0, np.int32)
        self.length = full(batch, 1, np.int32)
        self.rate = full(batch, 1.0, np.float64)
        self.goff = full(batch, ARENA_GUARD, np.int32)

    def _copy_static_from(self, other):
        pass

    def _arch_extra(self):
        return (self.channels,)

    def _params_from_t(self, t, interval):
        s0 = t * self.rate  # f64 (frames.rs:177)
        base = np.trunc(s0)  # `s0 as isize` truncates toward zero
        ds = (f32(interval) * self.rate.astype(np.float32)).astype(np.float32)
        # the reference's fast path (frames.rs:180-187) renders |ds-1| <= eps
        # as an exact unit step; snapping reproduces that exactly
        ds = np.where(np.abs(ds - np.float32(1.0)) <= EPS32, np.float32(1.0), ds)
        offset0 = (s0 - base).astype(np.float32)
        base_i = np.clip(base, -(2**30), 2**30).astype(np.int32)
        ds_int, f_hi, f_lo = split_ds(ds)
        return {
            "base": base_i,
            "offset0": offset0,
            "ds_int": ds_int,
            "f_hi": f_hi,
            "f_lo": f_lo,
            "off": self.off.copy(),
            "length": self.length.copy(),
        }

    def host_prepare(self, interval, n, count=None):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        params = self._params_from_t(self.t, interval)
        cnt = np.broadcast_to(f64(n if count is None else count), self.batch)
        # frames.rs:198: t += f64::from(interval) * out.len()
        self.t = self.t + interval.astype(np.float64) * cnt
        return params

    def host_params_at(self, tshift, interval, n):
        interval = np.broadcast_to(f32(interval), self.batch).astype(np.float32)
        t = self.t + f32(tshift).astype(np.float64)  # seek(): t += f64::from(seconds)
        return self._params_from_t(np.broadcast_to(t, self.batch), interval)

    def host_seek(self, seconds):
        """frames.rs:209-214."""
        self.t = self.t + f32(seconds).astype(np.float64)

    def host_is_finished(self):
        """frames.rs:204-206: t >= (len - 1) / rate."""
        return self.t >= (self.length.astype(np.float64) - 1.0) / self.rate

    def host_ds_bound(self, interval):
        return float(np.max(np.float32(interval) * self.rate.astype(np.float32)))

    # control-side views (frames.rs:229-248)
    def _playback_position(self):
        return np.trunc(self.t * self.rate) / self.rate

    def _control_finished(self):
        pos = np.trunc(self.t * self.rate)
        return (pos >= 0) & (pos >= self.length.astype(np.float64))

    def _own_device_data(self):
        return {
            "arena": _arena(self.channels).device(),
            "garena": _arena(self.channels).device_rows(),
        }

    def render(self, dstate, ddata, params, n):
        tr, fr = exact_positions(
            params["offset0"],
            params["ds_int"],
            params["f_hi"],
            params["f_lo"],
            n,
            signed=True,
        )
        s = params["base"][..., None] + tr
        arena = ddata["arena"]
        a = _arena_get(arena, params["off"], params["length"], s)
        b = _arena_get(arena, params["off"], params["length"], s + 1)
        if arena.ndim > 1:
            fr = fr[:, None]
        out = lerp(a, b, fr)
        block = out[None, :] if arena.ndim == 1 else out.T
        return dstate, block


def _pool_tier(node):
    """Trace-static per-frame step bound for the windowed read kernels, in
    {1, 2, 4}: the pool stamps ``_pool_ds_tier`` from the max
    ``host_ds_bound`` over live voices (core/drctrl.py).  Sizing windows
    for the actual bound instead of the worst case (RESAMPLE_DSMAX) nearly
    halves the gathered bytes and the in-kernel realign range at the
    common rate-ratio-1 shapes."""
    return int(getattr(node, "_pool_ds_tier", 4))


def _dr_resample(garena, xg, lo, hi, o0, ds_int, f_hi, f_lo, n, DS=4):
    """Shared DR wavetable read: clamp the trunc-form integer cursor into
    its (guarded or looped) region, fetch the covering row window, and run
    the strided resample kernel (ops/pallas_ring.py).  All array inputs are
    (V,) device values; ``o0`` is the trunc-form fraction (may be
    negative).  The window is biased one sample early so in-kernel indices
    stay nonnegative when the relative offset truncates to -1.  ``DS`` is
    the trace-static per-frame step bound (<= RESAMPLE_DSMAX) the window
    is sized for."""
    import jax

    from ..ops.pallas_ring import (
        RESAMPLE_W,
        pack_select_scalars,
        strip_resample,
    )

    ROW = ARENA_ROW
    xc = jnp.clip(xg - 1, lo, hi)
    row0 = xc // ROW
    extra = xc - row0 * ROW + 1
    S_req = max(
        ((256 + max(n - 128, 0) * DS) // 128) * 128 + RESAMPLE_W,
        256 + n * DS + 3,
    )
    n_rows = -(-S_req // ROW)
    V = xg.shape[0]
    idx = (row0[:, None] + jnp.arange(n_rows)).reshape(-1)
    strips = jnp.take(garena, idx, axis=0, mode="clip").reshape(V, n_rows * ROW)
    scal = pack_select_scalars(o0, ds_int, f_hi, f_lo)
    return strip_resample(
        strips, scal, extra, n=n,
        interpret=jax.default_backend() != "tpu",
    )


class _FramesDR:
    """Device-resident FramesSignal support, mixed into FramesSignal."""

    def dr_supported(self):
        return True

    def dr_state_init(self, V):
        import numpy as np

        return {
            "base": np.zeros(V, np.int32),
            "frac": np.zeros(V, np.float32),
            "off": np.zeros(V, np.int32),
            "goff": np.full(V, ARENA_GUARD, np.int32),
            "length": np.ones(V, np.int32),
            "rate": np.ones(V, np.float32),
            "r_hi": np.ones(V, np.float32),
            "ds_int": np.ones(V, np.int32),
            "f_hi": np.zeros(V, np.float32),
            "f_lo": np.zeros(V, np.float32),
        }

    def dr_slot_row(self, interval):
        # the f32-quantized step is the semantic step (frames.rs:178); its
        # split decomposition is exact, so the device cursor never drifts
        ds = np.float32(np.float32(interval) * self.rate.astype(np.float32))
        if abs(ds - np.float32(1.0)) <= EPS32:
            ds = np.float32(1.0)
        ds_int, f_hi, f_lo = split_ds(ds)
        s0 = self.t * self.rate
        base = np.trunc(s0)
        return {
            "base": np.int32(np.clip(base, -(2**30), 2**30)),
            "frac": np.float32(s0 - base),
            "off": np.int32(self.off[()]),
            "goff": np.int32(self.goff[()]),
            "length": np.int32(self.length[()]),
            "rate": np.float32(self.rate[()]),
            "r_hi": _top12_np(self.rate[()]),
            "ds_int": np.int32(ds_int),
            "f_hi": np.float32(f_hi),
            "f_lo": np.float32(f_lo),
        }

    def dr_render(self, state, ddata, interval, n, count):
        import numpy as np

        from ..ops._dev import chunked_frames, device_advance, to_trunc_form

        if isinstance(interval, (int, float, np.floating)):
            # the slot row's exact host split of the static pool interval
            ds_int, f_hi, f_lo = state["ds_int"], state["f_hi"], state["f_lo"]
        else:
            # dynamic per-voice interval (Speed chains, speed.rs:32-36),
            # with the reference's unit-step snap (frames.rs:180-187)
            from ..ops._dev import device_split_ds

            ds = state["rate"] * jnp.asarray(interval, jnp.float32)
            ds = jnp.where(jnp.abs(ds - 1.0) <= EPS32, 1.0, ds)
            ds_int, f_hi, f_lo = device_split_ds(ds)

        C = self.channels
        if "garena" in ddata and getattr(self, "_pool_ds_small", True):
            # row-window fetch + strided resample kernel in <=512-frame
            # chunks (any n, signal.rs:19); the guarded region's zero pads
            # carry frames.rs:105-123's edge semantics.  Multi-channel
            # sounds stack channels onto the kernel's row axis (each
            # channel's guarded plane sits at goff + c*guard_stride(len))
            if C == 1:
                goff = state["goff"]
                length = state["length"]
                rep = lambda x: x
            else:
                stride = (
                    2 * ARENA_GUARD + state["length"]
                    + jnp.mod(-state["length"], ARENA_ROW)
                )
                goff = (
                    state["goff"][:, None]
                    + jnp.arange(C, dtype=jnp.int32) * stride[:, None]
                ).reshape(-1)
                rep = lambda x: jnp.repeat(x, C)
                length = rep(state["length"])
            lo = goff - ARENA_GUARD
            hi = goff + length
            dsf = (rep(ds_int), rep(f_hi), rep(f_lo))

            def ev(cur, n_c):
                b, o = cur
                out = _dr_resample(
                    ddata["garena"], goff + rep(b), lo, hi, rep(o), *dsf,
                    n_c, DS=_pool_tier(self),
                )
                return out if C == 1 else out.reshape(-1, C, n_c)

            def adv(cur, n_c):
                b, o = cur
                neg = o < 0  # trunc-form -> floor-form before advancing
                b2, o2 = device_advance(
                    b - neg.astype(jnp.int32), jnp.where(neg, o + 1.0, o),
                    jnp.int32(n_c), ds_int, f_hi, f_lo,
                )
                return b2, o2  # floor-form o2 in [0,1) is valid trunc-form

            samples = chunked_frames(
                ev, adv, (state["base"], state["frac"]), n
            )
        else:
            tr, fr = exact_positions(
                state["frac"], ds_int, f_hi, f_lo, n, signed=True,
            )
            s = state["base"][:, None] + tr
            arena = ddata["arena"]
            a = _arena_get(arena, state["off"][:, None], state["length"][:, None], s)
            b = _arena_get(arena, state["off"][:, None], state["length"][:, None], s + 1)
            if arena.ndim > 1:
                fr = fr[..., None]
            samples = lerp(a, b, fr)
            if arena.ndim > 1:
                samples = jnp.moveaxis(samples, -1, 1)  # (V, C, n)
        base2, frac2 = device_advance(
            state["base"], state["frac"], count, ds_int, f_hi, f_lo,
        )
        base2, frac2 = to_trunc_form(base2, frac2)
        out = dict(state)
        out["base"], out["frac"] = base2, frac2
        return out, samples

    def dr_is_finished(self, state):
        """frames.rs:204-206: s >= len - 1 (s = base + frac, frac in (-1,1))."""
        return (state["base"] >= state["length"] - 1) & ~(
            (state["base"] == state["length"] - 1) & (state["frac"] < 0)
        )

    # -- device-resident Seek mode (frames.rs:209-214) -------------------------
    # The spatial seek path samples at cursor + t0 + j*dt per ear; positions
    # land on the same strided-resample kernel as dr_render.  The sample
    # shift t0*rate uses the split-product (ops/_dev.py::warp_shift) so f32
    # stays within ~1e-5 samples of the host path's f64 cursor shifts.

    def dr_seek_supported(self):
        return (
            self.channels == 1
            and type(self).host_is_finished is FramesSignal.host_is_finished
        )

    def _dr_warp_cursor(self, state, t0, wrap):
        """Shifted trunc-form cursors (base2, o0) for (V, E) second-offsets."""
        from ..ops._dev import warp_shift

        si, sf = warp_shift(state["rate"], state["r_hi"], t0)
        u = state["frac"][:, None] + sf
        uf = jnp.floor(u)
        base2 = state["base"][:, None] + si + uf.astype(jnp.int32)
        o0 = u - uf
        if wrap:  # cycle.rs:56-60 rem_euclid
            return jnp.mod(base2, state["length"][:, None]), o0
        neg = (base2 < 0) & (o0 > 0)  # trunc-toward-zero form
        return jnp.where(neg, base2 + 1, base2), jnp.where(neg, o0 - 1.0, o0)

    def dr_warp_render(self, state, ddata, t0, dt, n):
        from ..ops._dev import chunked_frames, device_advance, device_split_ds

        V, E = t0.shape
        base2, o0 = self._dr_warp_cursor(state, t0, wrap=False)
        ds = dt * state["rate"][:, None]
        ds = jnp.where(jnp.abs(ds - 1.0) <= EPS32, 1.0, ds)
        ds_int, f_hi, f_lo = device_split_ds(ds)
        if not getattr(self, "_pool_ds_small", True):
            # heavy downsampling: exact whole-arena gather (frames.rs:176-201
            # resamples at any ratio; aliasing and all)
            tr, fr = exact_positions(o0, ds_int, f_hi, f_lo, n, signed=True)
            s = base2[:, :, None] + tr
            arena = ddata["arena"]
            off = state["off"][:, None, None]
            length = state["length"][:, None, None]
            a = _arena_get(arena, off, length, s)
            b = _arena_get(arena, off, length, s + 1)
            return lerp(a, b, fr)
        dsf = (ds_int.reshape(-1), f_hi.reshape(-1), f_lo.reshape(-1))
        goff = jnp.repeat(state["goff"], E)
        lo = jnp.repeat(state["goff"] - ARENA_GUARD, E)
        hi = jnp.repeat(state["goff"] + state["length"], E)

        def ev(cur, n_c):
            b, o = cur
            return _dr_resample(
                ddata["garena"], goff + b, lo, hi, o, *dsf, n_c,
                DS=_pool_tier(self),
            )

        def adv(cur, n_c):
            b, o = cur
            neg = o < 0  # trunc-form -> floor-form before advancing
            return device_advance(
                b - neg.astype(jnp.int32), jnp.where(neg, o + 1.0, o),
                jnp.int32(n_c), *dsf,
            )

        samples = chunked_frames(
            ev, adv, (base2.reshape(-1), o0.reshape(-1)), n
        )
        return samples.reshape(V, E, n)

    def dr_advance(self, state, seconds):
        from ..ops._dev import to_trunc_form, warp_shift

        t = jnp.full(state["base"].shape + (1,), np.float32(seconds), jnp.float32)
        base2, o0 = self._dr_warp_cursor(state, t, wrap=self._dr_wrap)
        out = dict(state)
        if self._dr_wrap:
            out["base"], out["frac"] = base2[:, 0], o0[:, 0]
        else:
            out["base"], out["frac"] = to_trunc_form(base2[:, 0], o0[:, 0])
        return out

    _dr_wrap = False


for _name in (
    "dr_supported",
    "dr_state_init",
    "dr_slot_row",
    "dr_render",
    "dr_is_finished",
    "dr_seek_supported",
    "_dr_warp_cursor",
    "dr_warp_render",
    "dr_advance",
    "_dr_wrap",
):
    setattr(FramesSignal, _name, getattr(_FramesDR, _name))


class FramesSignalControl:
    """Playback-position readout (frames.rs:223-248)."""

    def __init__(self, cb):
        self._cb = cb

    def _dr_cursor(self):
        """(base, length, rate) for a voice living in a device-resident
        pool, read from the pool's state (one small readback per query —
        the analogue of the reference's position atomic)."""
        pool, slot, gen, path = self._cb._dr
        if pool.slot_gen[slot] != gen or pool.state is None:
            return None
        for slot_i, _row in pool.pending_plays:
            if slot_i == slot:  # queued play not yet applied
                return None
        t = pool.state["inner"]
        for k in path:
            t = t[k]
        return (
            float(np.asarray(t["base"][slot])),
            float(np.asarray(t["length"][slot])),
            float(np.asarray(t["rate"][slot])),
        )

    def playback_position(self):
        if not self._cb.live():
            return 0.0
        if self._cb._dr is not None:
            cur = self._dr_cursor()
            if cur is None:  # pre-play: the spec mirror is current
                sig = self._cb.sig
                return float(sig._playback_position()[self._cb.idx])
            base, _, rate = cur
            return base / rate
        sig, idx = self._cb.sig, self._cb.idx
        return float(sig._playback_position()[idx])

    def is_finished(self):
        if not self._cb.live():
            return True
        if self._cb._dr is not None:
            cur = self._dr_cursor()
            if cur is None:
                sig = self._cb.sig
                return bool(sig._control_finished()[self._cb.idx])
            base, length, _ = cur
            return base >= 0 and base >= length
        sig, idx = self._cb.sig, self._cb.idx
        return bool(sig._control_finished()[idx])
