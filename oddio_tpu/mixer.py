"""Dense masked mixer — oddio's dynamic voice set as a batched voice pool.

Reference: /root/reference/src/mixer.rs — ``Mixer`` sums a dynamic ``Set`` of
boxed same-frame-type signals (mixer.rs:89-120): drain control messages, drop
stopped/finished voices (setting their stop flag so handles observe it,
mixer.rs:102-105), then sample each voice and accumulate.  The lock-free
``Set``/``spsc`` plumbing (set.rs, spsc.rs) exists to do this without locks
on the audio thread.

TPU redesign (SURVEY.md §7): voices of equal *archetype* (graph structure)
live in a fixed-capacity pool of stacked host/device state with an active
mask.  Rendering is ``vmap`` over the voice axis plus a masked sum — one
fused reduction instead of a pointer-chasing loop.  ``play`` claims a slot
and writes the signal's state into the pool columns (the host-side analogue
of ``SetHandle::insert``, set.rs:55-66); capacity doubles by growing the
columns (the analogue of ``Msg::ReallocSignals``, set.rs:57-63, as a rare
re-jit event).  Finished voices are observed via host cursors at the *next*
block boundary, reproducing the reference's one-scan-late reclamation
semantics (mixer.rs:129-147).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core.hostmath import f32
from .core.signal import Signal

__all__ = ["Mixer", "MixerControl", "Mixed"]

DEFAULT_CAPACITY = 16


class Pool:
    """A fixed-capacity pool of voices sharing one signal archetype."""

    def __init__(self, name, spec, capacity):
        self.name = name
        self.proto = spec  # structure donor for clone/grow (state is per-slot)
        self.sig = spec.clone_batched(capacity)
        self.capacity = capacity
        self.mask = np.zeros(capacity, dtype=bool)
        self.stop = np.zeros(capacity, dtype=bool)
        self.slot_gen = np.zeros(capacity, dtype=np.int64)
        self._free = list(range(capacity - 1, -1, -1))

    def grow(self):
        old = self.capacity
        new = old * 2
        self.sig.grow_batched(new)
        self.mask = np.concatenate([self.mask, np.zeros(old, bool)])
        self.stop = np.concatenate([self.stop, np.zeros(old, bool)])
        self.slot_gen = np.concatenate([self.slot_gen, np.zeros(old, np.int64)])
        self._free = list(range(new - 1, old - 1, -1)) + self._free
        self.capacity = new

    def play(self, spec):
        if not self._free:
            self.grow()
        i = self._free.pop()
        gen = int(self.slot_gen[i])
        self.sig.write_slot(i, spec, self, gen)
        spec._moved = True
        self.sig.device_reset_slot(i)
        self.mask[i] = True
        self.stop[i] = False
        return i, gen

    def reap(self):
        """Drop stopped/finished voices before rendering (mixer.rs:100-105)."""
        fin = self.sig.host_is_finished()
        drop = self.mask & (self.stop | fin)
        if drop.any():
            self.stop |= drop
            self.mask &= ~drop
            for i in np.nonzero(drop)[0]:
                self.slot_gen[i] += 1
                self._free.append(int(i))


class Mixer(Signal):
    """A Signal that mixes a dynamic set of Signals (mixer.rs:60-120)."""

    def __init__(self, channels=1, initial_capacity=DEFAULT_CAPACITY):
        super().__init__()
        self.channels = channels
        self.initial_capacity = initial_capacity
        self._pools = {}  # archetype -> Pool, insertion-ordered

    @classmethod
    def new(cls, channels=1):
        """mixer.rs:70-82 — returns (MixerControl, Mixer)."""
        sig = cls(channels)
        return MixerControl(sig), sig

    # -- control side -------------------------------------------------------

    def play(self, spec):
        """Begin playing ``spec``; returns a Mixed handle (mixer.rs:18-26)."""
        if spec.channels != self.channels:
            raise ValueError(
                f"signal has {spec.channels} channels, mixer expects {self.channels}"
            )
        arch = spec.archetype()
        pool = self._pools.get(arch)
        if pool is None:
            pool = Pool(f"p{len(self._pools)}", spec, self.initial_capacity)
            self._pools[arch] = pool
        slot, gen = pool.play(spec)
        return Mixed(pool, slot, gen)

    # -- Signal protocol ------------------------------------------------------

    def children(self):
        return {}

    def _arch_extra(self):
        return (self.initial_capacity,)

    def archetype(self):
        pools = tuple((p.name, arch) for arch, p in self._pools.items())
        return ("Mixer", self.channels, pools)

    def host_prepare(self, interval, n, count=None):
        out = {}
        for arch, pool in self._pools.items():
            pool.reap()
            V = pool.capacity
            iv = np.broadcast_to(f32(interval), (V,)).astype(np.float32)
            cnt = None if count is None else np.broadcast_to(count, (V,))
            out[pool.name] = {
                "mask": pool.mask.copy(),
                "p": pool.sig.host_prepare(iv, n, cnt),
            }
        return out

    def device_collect(self):
        return {p.name: p.sig.device_collect() for p in self._pools.values()}

    def device_store(self, d):
        for p in self._pools.values():
            p.sig.device_store(d[p.name])

    def device_reset_slot(self, i):
        raise NotImplementedError("nested Mixer pools are not supported yet")

    def device_data(self):
        return {p.name: p.sig.device_data() for p in self._pools.values()}

    def render(self, dstate, ddata, params, n):
        out = jnp.zeros((self.channels, n), dtype=jnp.float32)
        d2 = {}
        for pool in self._pools.values():
            ps = params[pool.name]
            dd = ddata.get(pool.name, {})
            dsub, blocks = jax.vmap(
                lambda d, p: pool.sig.render(d, dd, p, n)
            )(dstate[pool.name], ps["p"])
            d2[pool.name] = dsub
            # where() (not multiply) so garbage from inactive slots — including
            # NaN/inf — never reaches the output
            contrib = jnp.where(ps["mask"][:, None, None], blocks, 0.0)
            out = out + jnp.sum(contrib, axis=0)
        return d2, out


    # -- checkpoint/resume ----------------------------------------------------

    def host_snapshot(self):
        from .utils.checkpoint import _host_state

        return {
            p.name: {
                "mask": p.mask.copy(),
                "stop": p.stop.copy(),
                "gen": p.slot_gen.copy(),
                "free": list(p._free),
                "sig": _host_state(p.sig),
            }
            for p in self._pools.values()
        }

    def host_restore(self, snap):
        from .utils.checkpoint import _set_host_state

        for p in self._pools.values():
            st = snap[p.name]
            p.mask = st["mask"].copy()
            p.stop = st["stop"].copy()
            p.slot_gen = st["gen"].copy()
            p._free = list(st["free"])
            _set_host_state(p.sig, st["sig"])


class MixerControl:
    """Handle for controlling a Mixer from the game thread (mixer.rs:7-27)."""

    def __init__(self, mixer):
        self._mixer = mixer

    def play(self, spec):
        return self._mixer.play(spec)


class Mixed:
    """Handle to a signal playing in a Mixer (mixer.rs:30-44)."""

    def __init__(self, pool, slot, gen):
        self._pool = pool
        self._slot = slot
        self._gen = gen

    def _live(self):
        return self._pool.slot_gen[self._slot] == self._gen

    def stop(self):
        """Halt playback at the next block boundary (mixer.rs:33-36)."""
        if self._live():
            self._pool.stop[self._slot] = True

    def is_stopped(self):
        """Set by stop() and by signals naturally finishing (mixer.rs:38-44)."""
        if not self._live():
            return True
        return bool(self._pool.stop[self._slot])
