"""Faithful scalar NumPy emulation of the reference (oddio) semantics.

This is the golden-value oracle for numerical parity testing: a per-frame,
sequential, strictly-f32 reimplementation of each reference Signal's
``sample()`` (file:line citations inline).  The environment has no Rust
toolchain, so this oracle *is* the baseline the engine is compared against;
it follows the reference's arithmetic order exactly, including the places
where the production engine intentionally diverges by vectorizing
(closed-form ``offset0 + i*ds`` instead of sequential ``offset += ds`` f32
accumulation — a pure rounding difference bounded by ~n*eps per block).

Python-loop slow; use short renders in tests.
"""

from __future__ import annotations

import numpy as np

F = np.float32
TAU = F(6.283185307179586)


def lerp(a, b, t):
    """frame.rs:39-41, componentwise a + t*(b-a)."""
    return (a + t * (b - a)).astype(F) if isinstance(a, np.ndarray) else F(a + t * (b - a))


class OSignal:
    def is_finished(self):
        return False


class OConstant(OSignal):
    def __init__(self, v):
        self.v = v

    def sample(self, interval, out):
        out[:] = self.v

    def seek(self, seconds):
        pass


class OSine(OSignal):
    """sine.rs.  ``exact=True`` keeps the wrapped phase in f64 (exact wrap
    arithmetic, f32 modulus) like the production engine's host state."""

    def __init__(self, phase, freq_hz, exact=False):
        self.exact = exact
        self.phase = np.float64(F(phase)) if exact else F(phase)
        self.freq = F(F(freq_hz) * TAU)

    def sample(self, interval, out):
        interval = F(interval)
        if self.exact:
            # ideal-math variant: argument computed in f64
            for i in range(len(out)):
                arg = i * np.float64(interval) * np.float64(self.freq) + self.phase
                out[i] = F(np.sin(arg))
        else:
            for i in range(len(out)):
                t = F(interval * F(i))
                out[i] = np.sin(F(t * self.freq + self.phase), dtype=F)
        self._seek_to(F(interval * F(len(out))))

    def _seek_to(self, t):
        if self.exact:
            self.phase = np.fmod(
                self.phase + np.float64(t) * np.float64(self.freq), np.float64(TAU)
            )
        else:
            self.phase = np.fmod(F(self.phase + t * self.freq), TAU)

    def seek(self, seconds):
        self._seek_to(F(seconds))


class OFrames:
    """frames.rs:19-124. data: (len,) or (len, C) f32."""

    def __init__(self, rate, data):
        self.rate = np.float64(rate)
        self.data = np.asarray(data, F)

    def get_pair(self, s):
        n = len(self.data)
        zero = np.zeros(self.data.shape[1:], F) if self.data.ndim > 1 else F(0.0)
        a = self.data[s] if 0 <= s < n else zero
        b = self.data[s + 1] if 0 <= s + 1 < n else zero
        return a, b


class OFramesSignal(OSignal):
    """frames.rs:141-214: f64 cursor, trunc-toward-zero, fast path at ds==1.

    ``exact=True`` keeps the reference's semantics but computes the per-frame
    offsets in f64 (``s0 + i*ds``) instead of the reference's sequential f32
    ``offset += ds`` accumulation — the mathematically-exact variant the
    production engine is held to within 1e-5.
    """

    def __init__(self, frames, start_seconds=0.0, exact=False):
        self.frames = frames
        self.t = np.float64(start_seconds)
        self.exact = exact

    def sample(self, interval, out):
        interval = F(interval)
        s0 = self.t * self.frames.rate
        ds = F(interval * F(self.frames.rate))
        base = int(s0)  # toward zero
        if abs(ds - F(1.0)) <= np.finfo(F).eps:
            fract = F(s0 - np.float64(base))
            for i in range(len(out)):
                a, b = self.frames.get_pair(base + i)
                out[i] = lerp(a, b, fract)
        elif self.exact:
            off0 = np.float64(F(s0 - np.float64(base)))
            for i in range(len(out)):
                offset = off0 + i * np.float64(ds)
                trunc = int(offset)  # toward zero
                a, b = self.frames.get_pair(base + trunc)
                out[i] = lerp(a, b, F(offset - trunc))
        else:
            offset = F(s0 - np.float64(base))
            for i in range(len(out)):
                trunc = int(offset)  # toward zero
                a, b = self.frames.get_pair(base + trunc)
                out[i] = lerp(a, b, F(offset - F(trunc)))
                offset = F(offset + ds)
        self.t = self.t + np.float64(interval) * len(out)

    def is_finished(self):
        return self.t >= (len(self.frames.data) - 1) / self.frames.rate

    def seek(self, seconds):
        self.t = self.t + np.float64(F(seconds))


class OCycle(OSignal):
    """cycle.rs."""

    def __init__(self, frames):
        self.frames = frames
        self.cursor = np.float64(0.0)

    def sample(self, interval, out):
        data = self.frames.data
        n = len(data)
        ds = F(F(interval) * F(int(self.frames.rate)))
        base = int(self.cursor)
        offset = F(self.cursor - np.float64(base))
        for o in range(len(out)):
            trunc = int(offset)
            fract = F(offset - F(trunc))
            x = base + trunc
            if x < n - 1:
                a, b = data[x], data[x + 1]
            elif x < n:
                a, b = data[x], data[0]
            else:
                base = 0
                offset = F(F(x % n) + fract)
                x2 = int(offset)
                if x2 < n - 1:
                    a, b = data[x2], data[x2 + 1]
                else:
                    a, b = data[x2], data[0]
            out[o] = lerp(a, b, fract)
            offset = F(offset + ds)
        self.cursor = np.float64(base) + np.float64(offset)

    def seek(self, seconds):
        self.cursor = np.remainder(
            self.cursor + np.float64(F(seconds)) * self.frames.rate,
            np.float64(len(self.frames.data)),
        )


class OFixedGain(OSignal):
    def __init__(self, inner, db):
        self.inner = inner
        self.gain = np.power(F(10.0), F(F(db) / F(20.0)), dtype=F)

    def sample(self, interval, out):
        self.inner.sample(interval, out)
        out[:] = (np.asarray(out) * self.gain).astype(F)

    def is_finished(self):
        return self.inner.is_finished()

    def seek(self, seconds):
        self.inner.seek(seconds)


class OGain(OSignal):
    """gain.rs:58-127 with Smoothed (smooth.rs).

    ``exact=True`` computes the ramp progress as ``min(p0 + i*inc, 1)`` in
    f64 (closed form of the reference's sequential f32 advance)."""

    SMOOTHING = F(0.1)

    def __init__(self, inner, exact=False):
        self.inner = inner
        self.exact = exact
        self.shared = F(1.0)
        self.prev = F(1.0)
        self.next = F(1.0)
        self.progress = F(1.0)

    def set_amplitude_ratio(self, v):
        self.shared = F(v)

    def _get(self):
        return F(self.prev + self.progress * F(self.next - self.prev))

    def sample(self, interval, out):
        interval = F(interval)
        self.inner.sample(interval, out)
        if self.next != self.shared:
            self.prev = self._get()
            self.next = self.shared
            self.progress = F(0.0)
        if self.progress == F(1.0):
            g = self._get()
            if g != F(1.0):
                out[:] = (np.asarray(out) * g).astype(F)
            return
        inc = F(interval / self.SMOOTHING)
        if self.exact:
            p0 = np.float64(self.progress)
            for i in range(len(out)):
                p = F(min(p0 + i * np.float64(inc), 1.0))
                g = F(self.prev + p * F(self.next - self.prev))
                out[i] = (np.asarray(out[i]) * g).astype(F)
            self.progress = min(F(F(self.progress) + F(len(out)) * inc), F(1.0))
            return
        for i in range(len(out)):
            out[i] = (np.asarray(out[i]) * self._get()).astype(F)
            self.progress = min(F(self.progress + F(interval / self.SMOOTHING)), F(1.0))

    def is_finished(self):
        return self.inner.is_finished()


class OSpeed(OSignal):
    def __init__(self, inner, speed=1.0):
        self.inner = inner
        self.speed = F(speed)

    def sample(self, interval, out):
        self.inner.sample(F(F(interval) * self.speed), out)

    def is_finished(self):
        return self.inner.is_finished()


class OMonoToStereo(OSignal):
    def __init__(self, inner):
        self.inner = inner

    def sample(self, interval, out):
        buf = np.zeros(len(out), F)
        self.inner.sample(interval, buf)
        out[:, 0] = buf
        out[:, 1] = buf

    def is_finished(self):
        return self.inner.is_finished()

    def seek(self, seconds):
        self.inner.seek(seconds)


class OReinhard(OSignal):
    def __init__(self, inner):
        self.inner = inner

    def sample(self, interval, out):
        self.inner.sample(interval, out)
        a = np.asarray(out)
        out[:] = (a / (F(1.0) + np.abs(a))).astype(F)

    def is_finished(self):
        return self.inner.is_finished()


class OTanh(OSignal):
    def __init__(self, inner):
        self.inner = inner

    def sample(self, interval, out):
        self.inner.sample(interval, out)
        out[:] = np.tanh(np.asarray(out), dtype=F)

    def is_finished(self):
        return self.inner.is_finished()


class ODownmix(OSignal):
    """downmix.rs: 256-frame staging chunks (advances inner in 256 multiples)."""

    def __init__(self, inner, channels):
        self.inner = inner
        self.channels = channels

    def sample(self, interval, out):
        CHUNK = 256
        buf = np.zeros((CHUNK, self.channels), F)
        for start in range(0, len(out), CHUNK):
            chunk = out[start : start + CHUNK]
            self.inner.sample(interval, buf)
            for i in range(len(chunk)):
                chunk[i] = F(buf[i].astype(F).sum(dtype=F))

    def is_finished(self):
        return self.inner.is_finished()


class OAdapt(OSignal):
    """adapt.rs."""

    def __init__(self, inner, initial_rms, tau, max_gain, low, high):
        self.inner = inner
        self.avg = F(F(initial_rms) * F(initial_rms))
        self.tau, self.max_gain = F(tau), F(max_gain)
        self.low, self.high = F(low), F(high)

    def sample(self, interval, out):
        interval = F(interval)
        alpha = F(F(1.0) - np.exp(F(-interval / self.tau), dtype=F))
        self.inner.sample(interval, out)
        for i in range(len(out)):
            x = np.atleast_1d(np.asarray(out[i], F))
            s = F(x.sum(dtype=F))
            self.avg = F(s * s * alpha + self.avg * F(F(1.0) - alpha))
            avg_peak = F(np.sqrt(self.avg, dtype=F) * np.sqrt(F(2.0), dtype=F))
            if avg_peak < self.low:
                gain = min(F(self.low / avg_peak), self.max_gain)
            elif avg_peak > self.high:
                gain = F(self.high / avg_peak)
            else:
                gain = F(1.0)
            out[i] = (x * gain).astype(F) if x.size > 1 else F(x[0] * gain)

    def is_finished(self):
        return self.inner.is_finished()


class OMixer(OSignal):
    """mixer.rs:89-120: reverse-iterate, drop stopped/finished first."""

    def __init__(self, channels=1):
        self.voices = []  # (signal, stop_flag_list)
        self.channels = channels

    def play(self, sig):
        flag = [False]
        self.voices.append((sig, flag))
        return flag

    def sample(self, interval, out):
        out[:] = 0.0
        shape = len(out) if self.channels == 1 else (len(out), self.channels)
        for i in reversed(range(len(self.voices))):
            sig, flag = self.voices[i]
            if flag[0] or sig.is_finished():
                flag[0] = True
                self.voices.pop(i)
                continue
            buf = np.zeros(shape, F)
            sig.sample(interval, buf)
            out[:] = (np.asarray(out) + buf).astype(F)


# --- spatial oracle -----------------------------------------------------------

SPEED_OF_SOUND = F(343.0)
HEAD_RADIUS = F(0.1075)
POS_SMOOTH = F(0.5)
SQ17 = np.sqrt(F(17.0), dtype=F)
EARS = [
    (np.array([-HEAD_RADIUS, 0, 0], F), np.array([F(-4.0) / SQ17, 0, F(-1.0) / SQ17], F)),
    (np.array([HEAD_RADIUS, 0, 0], F), np.array([F(4.0) / SQ17, 0, F(-1.0) / SQ17], F)),
]


def norm(v):
    return F(np.sqrt(F(v[0] * v[0] + F(v[1] * v[1] + v[2] * v[2])), dtype=F))


def quat_inv(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], F)


def quat_mul(q, r):
    return np.array(
        [
            q[0] * r[0] - q[1] * r[1] - q[2] * r[2] - q[3] * r[3],
            q[0] * r[1] + q[1] * r[0] + q[2] * r[3] - q[3] * r[2],
            q[0] * r[2] - q[1] * r[3] + q[2] * r[0] + q[3] * r[1],
            q[0] * r[3] + q[1] * r[2] - q[2] * r[1] + q[3] * r[0],
        ],
        F,
    )


def rotate(q, p):
    pq = np.array([0.0, p[0], p[1], p[2]], F)
    return quat_mul(q, quat_mul(pq, quat_inv(q)))[1:]


class ORing:
    """ring.rs: f32 write cursor, sequential fractional reads.

    ``exact=True`` computes read offsets in f64 (same semantics, exact math).
    """

    def __init__(self, capacity, exact=False):
        self.buf = np.zeros(capacity, F)
        self.write = F(0.0)
        self.exact = exact

    def write_from(self, signal, rate, dt):
        n = len(self.buf)
        end = np.fmod(F(self.write + F(dt) * F(rate)), F(n))
        start_idx = int(np.ceil(self.write))
        end_idx = int(np.ceil(end))
        interval = F(F(1.0) / F(rate))
        if end_idx > start_idx:
            signal.sample(interval, self.buf[start_idx:end_idx])
        else:
            signal.sample(interval, self.buf[start_idx:])
            signal.sample(interval, self.buf[:end_idx])
        self.write = end

    def delay(self, rate, dt):
        self.write = np.fmod(F(self.write + F(rate) * F(dt)), F(len(self.buf)))

    def sample(self, rate, t, interval, out):
        n = len(self.buf)
        offset = F(np.remainder(F(self.write + F(t) * F(rate)), F(n)))
        ds = F(F(interval) * F(rate))
        if self.exact:
            off0 = np.float64(offset)
            for o in range(len(out)):
                pos = np.remainder(off0 + o * np.float64(ds), np.float64(n))
                x = int(pos)
                fract = F(pos - x)
                a = self.buf[x]
                b = self.buf[(x + 1) % n]
                out[o] = lerp(a, b, fract)
            return
        for o in range(len(out)):
            trunc = int(offset)
            fract = F(offset - F(trunc))
            x = trunc
            if x < n - 1:
                a, b = self.buf[x], self.buf[x + 1]
            elif x < n:
                a, b = self.buf[x], self.buf[0]
            else:
                x = x % n
                offset = F(F(x) + fract)
                if x < n - 1:
                    a, b = self.buf[x], self.buf[x + 1]
                else:
                    a, b = self.buf[x], self.buf[0]
            out[o] = lerp(a, b, fract)
            offset = F(offset + ds)


def ear_state(pos, ear, radius):
    """EarState::new (spatial.rs:530-550). Returns (offset, gain)."""
    ear_pos, ear_dir = EARS[ear]
    rel = (pos - ear_pos).astype(F)
    distance = norm(rel)
    offset = F(distance * F(F(-1.0) / SPEED_OF_SOUND))
    distance_gain = F(F(radius) / max(distance, F(radius)))
    if distance < F(1e-3):
        stereo = F(1.0)
    else:
        sc = (pos * F(F(0.5) / distance)).astype(F)
        stereo = F(
            F(0.5) + F(ear_dir[0] * sc[0] + F(ear_dir[1] * sc[1] + ear_dir[2] * sc[2]))
        )
    return offset, F(stereo * distance_gain)


class _OVoice:
    def __init__(self, sig, position, velocity, radius):
        self.sig = sig
        self.radius = F(radius)
        self.motion_pos = np.asarray(position, F)
        self.motion_vel = np.asarray(velocity, F)
        self.pending = None
        self.prev_position = np.asarray(position, F)
        self.dt = F(0.0)
        self.finished_for = None
        self.stopped = False

    def set_motion(self, position, velocity, discontinuity):
        self.pending = (np.asarray(position, F), np.asarray(velocity, F), discontinuity)

    def smoothed_position(self, dt_extra, pos, vel):
        dt = F(self.dt + F(dt_extra))
        change = (vel * dt).astype(F)
        naive = (self.prev_position + change).astype(F)
        intended = (pos + change).astype(F)
        r = min(F(dt / POS_SMOOTH), F(1.0))
        return (F(F(1.0) - r) * naive + r * intended).astype(F)


class OSpatialScene(OSignal):
    """spatial.rs:373-477 — seek and buffered sets, faithful walk order.

    ``exact=True`` switches ring reads to f64 offsets and processes whole
    blocks instead of 256-frame chunks (same semantics, exact math — what the
    production engine computes)."""

    def __init__(self, exact=False):
        self.exact = exact
        self.rot = np.array([1, 0, 0, 0], F)
        self.rot_pending = None
        self.seek_voices = []
        self.buffered_voices = []  # (_OVoice, ORing, rate, max_delay)

    def play(self, sig, position, velocity=(0, 0, 0), radius=0.1):
        v = _OVoice(sig, position, velocity, radius)
        self.seek_voices.append(v)
        return v

    def play_buffered(self, sig, position, velocity=(0, 0, 0), radius=0.1,
                      max_distance=100.0, rate=48000, buffer_duration=0.1):
        max_delay = F(F(max_distance) / SPEED_OF_SOUND + F(buffer_duration))
        ring = ORing(int(np.ceil(F(max_delay * F(rate)))) + 1, exact=self.exact)
        ring.delay(rate, min(F(norm(np.asarray(position, F)) / SPEED_OF_SOUND), max_delay))
        v = _OVoice(sig, position, velocity, radius)
        self.buffered_voices.append((v, ring, rate, max_delay))
        return v

    def set_listener_rotation(self, q):
        self.rot_pending = quat_inv(np.asarray(q, F))

    def _walk_common(self, v, prev_rot, rot, elapsed):
        if v.pending is not None:
            pos, vel, disc = v.pending
            v.pending = None
            v.prev_position = pos if disc else v.smoothed_position(F(0.0), v.motion_pos, v.motion_vel)
            v.dt = F(0.0)
            v.motion_pos, v.motion_vel = pos, vel
        prev_position = rotate(prev_rot, v.smoothed_position(F(0.0), v.motion_pos, v.motion_vel))
        next_position = rotate(rot, v.smoothed_position(elapsed, v.motion_pos, v.motion_vel))
        v.dt = F(v.dt + elapsed)
        distance = norm(prev_position)
        if v.finished_for is not None:
            if v.finished_for > F(distance / SPEED_OF_SOUND):
                v.stopped = True
            else:
                v.finished_for = F(v.finished_for + elapsed)
        elif v.sig.is_finished():
            v.finished_for = elapsed
        return prev_position, next_position

    def sample(self, interval, out):
        interval = F(interval)
        prev_rot = self.rot.copy()
        if self.rot_pending is not None:
            self.rot = self.rot_pending
            self.rot_pending = None
        rot = self.rot
        out[:] = 0.0
        elapsed = F(interval * F(len(out)))
        chunk_len = len(out) if self.exact else 256
        buf = np.zeros(max(chunk_len, 1), F)

        for i in reversed(range(len(self.buffered_voices))):
            v, ring, rate, max_delay = self.buffered_voices[i]
            prev_position, next_position = self._walk_common(v, prev_rot, rot, elapsed)
            if v.stopped:
                self.buffered_voices.pop(i)
                continue
            ring.write_from(v.sig, rate, elapsed)
            for ear in (0, 1):
                p_off, p_gain = ear_state(prev_position, ear, v.radius)
                n_off, n_gain = ear_state(next_position, ear, v.radius)
                prev_offset = max(F(p_off - elapsed), F(-max_delay))
                next_offset = max(n_off, F(-max_delay))
                dt = F(F(next_offset - prev_offset) / F(len(out)))
                d_gain = F(F(n_gain - p_gain) / F(len(out)))
                i2 = 0
                for start in range(0, len(out), chunk_len):
                    chunk = out[start : start + chunk_len]
                    t = F(prev_offset + F(i2) * dt)
                    ring.sample(rate, t, dt, buf[: len(chunk)])
                    for k in range(len(chunk)):
                        gain = F(p_gain + F(i2) * d_gain)
                        chunk[k, ear] = F(chunk[k, ear] + buf[k] * gain)
                        i2 += 1

        for i in reversed(range(len(self.seek_voices))):
            v = self.seek_voices[i]
            prev_position, next_position = self._walk_common(v, prev_rot, rot, elapsed)
            if v.stopped:
                self.seek_voices.pop(i)
                continue
            for ear in (0, 1):
                p_off, p_gain = ear_state(prev_position, ear, v.radius)
                n_off, n_gain = ear_state(next_position, ear, v.radius)
                v.sig.seek(p_off)
                effective = F(F(elapsed + n_off) - p_off)
                dt = F(effective / F(len(out)))
                d_gain = F(F(n_gain - p_gain) / F(len(out)))
                i2 = 0
                for start in range(0, len(out), chunk_len):
                    chunk = out[start : start + chunk_len]
                    v.sig.sample(dt, buf[: len(chunk)])
                    for k in range(len(chunk)):
                        gain = F(p_gain + F(i2) * d_gain)
                        chunk[k, ear] = F(chunk[k, ear] + buf[k] * gain)
                        i2 += 1
                v.sig.seek(F(-effective - p_off))
            v.sig.seek(elapsed)


def oddio_run(signal, rate, out):
    """lib.rs:90-93."""
    signal.sample(F(F(1.0) / F(rate)), out)
