"""Block-render drivers.

Reference: /root/reference/src/lib.rs:90-93 — ``run(signal, rate, out)``
computes ``interval = 1/rate`` and pulls one block from the signal graph on
the audio thread.

TPU redesign: a ``Renderer`` owns the jitted step for a signal graph.  Per
block it (1) walks the graph on the host, advancing host state and producing
per-block parameter arrays (the control-plane handoff), then (2) dispatches
one jitted, donated device step.  For offline rendering, ``render_frames``
precomputes many blocks' parameters and runs a single ``lax.scan`` on device,
amortising dispatch overhead — the TPU analogue of oddio's tight offline loop
(examples/offline.rs:33-43).
"""

from __future__ import annotations

import numpy as np
import jax

from .hostmath import f32

__all__ = ["Renderer", "run"]


def _stack_params(params_list):
    return jax.tree.map(lambda *xs: np.stack(xs), *params_list)


class Renderer:
    def __init__(self, signal, rate, sync_every=16, scan_unroll=1):
        if signal._moved:
            raise RuntimeError("signal was moved into an engine; render the engine")
        self.signal = signal
        self.rate = int(rate)
        # lib.rs:91: interval = 1.0 / sample_rate as f32
        self.interval = np.float32(1.0) / np.float32(self.rate)
        #: blocks unrolled per on-device scan iteration: >1 amortizes
        #: per-op fixed costs across blocks for small scenes (identical
        #: semantics; XLA unrolls the loop body)
        self.scan_unroll = int(scan_unroll)
        # jitted steps keyed by (archetype, kind); archetype includes any
        # trace-relevant statics updated by host_prepare (e.g. ring write
        # bounds), so steps are resolved AFTER preparing the block.
        self._steps = {}
        #: device-resident engines sync handle-visible state (is_finished,
        #: slot reclamation) every `sync_every` render_block calls — the
        #: block-streaming analogue of the reference's per-sample stop-flag
        #: visibility (mixer.rs:102-105, spatial.rs:241-261).  The copy is
        #: prefetched one block early so the readback overlaps rendering.
        self.sync_every = int(sync_every)
        self._since_sync = 0

    def _get_step(self, kind, arch=None):
        key = (arch if arch is not None else self.signal.archetype(), kind)
        step = self._steps.get(key)
        if step is None:
            sig = self.signal
            if kind == "single":

                def step_fn(dstate, ddata, params, n):
                    return sig.render(dstate, ddata, params, n)

                step = jax.jit(step_fn, static_argnums=3, donate_argnums=0)
                self._steps[key] = step
                return step
            else:

                unroll = self.scan_unroll

                def step_fn(dstate, ddata, stacked, n, nblocks):
                    def body(d, p):
                        return sig.render(d, ddata, p, n)

                    # length is explicit: an all-idle run of a fully
                    # device-resident graph carries no per-block params
                    return jax.lax.scan(
                        body, dstate, stacked, length=nblocks,
                        unroll=min(unroll, max(nblocks, 1)),
                    )

            step = jax.jit(step_fn, static_argnums=(3, 4), donate_argnums=0)
            self._steps[key] = step
        return step

    def render_block(self, n, interval=None):
        """Render one block of ``n`` frames; returns float32 (n, C)."""
        sig = self.signal
        params = sig.host_prepare(self.interval if interval is None else f32(interval), n)
        step = self._get_step("single")
        d2, block = step(sig.device_collect(), sig.device_data(), params, n)
        sig.device_store(d2)
        sync = getattr(sig, "sync", None)
        if sync is not None and self.sync_every > 0:
            self._since_sync += 1
            if self._since_sync == self.sync_every - 1:
                prefetch = getattr(sig, "sync_prefetch", None)
                if prefetch is not None:
                    prefetch()
            elif self._since_sync >= self.sync_every:
                sync()
                self._since_sync = 0
        return np.asarray(block).T

    def _run_blocks(self, nblocks, block_size, consume):
        """Prepare + dispatch ``nblocks`` blocks, batching runs of equal
        archetype into on-device scans.  A segment is flushed (dispatched)
        BEFORE any prepare that will mutate the signal graph's python
        structure (``host_structure_event``), so every step is traced
        against the structure that produced its parameters — Faders swap
        children and DR pools bulk-apply plays during host_prepare, and a
        deferred trace would otherwise see the mutated graph."""
        sig = self.signal
        pend = []  # params of the current equal-archetype run
        pend_arch = None

        def flush():
            nonlocal pend, pend_arch
            if not pend:
                return
            if len(pend) == 1:
                step = self._get_step("single", pend_arch)
                d2, block = step(
                    sig.device_collect(), sig.device_data(), pend[0], block_size
                )
                blocks = block[None]
            else:
                step = self._get_step("scan", pend_arch)
                d2, blocks = step(
                    sig.device_collect(), sig.device_data(),
                    _stack_params(pend), block_size, len(pend),
                )
            sig.device_store(d2)
            consume(blocks)
            pend, pend_arch = [], None

        event = getattr(sig, "host_structure_event", None)
        for _ in range(nblocks):
            if pend and event is not None and event():
                flush()
            p = sig.host_prepare(self.interval, block_size)
            a = sig.archetype()
            if pend and a != pend_arch:
                flush()
            pend.append(p)
            pend_arch = a
        flush()

    def render_frames(self, total, block_size=512):
        """Offline render of ``total`` frames in fixed blocks via on-device
        scans; returns float32 (total, C)."""
        nblocks, rem = divmod(total, block_size)
        pieces = []

        def consume(blocks):
            out = np.asarray(blocks)  # (B, C, n)
            pieces.append(
                np.moveaxis(out, 1, 2).reshape(out.shape[0] * block_size, out.shape[1])
            )

        if nblocks:
            self._run_blocks(nblocks, block_size, consume)
        if rem:
            pieces.append(self.render_block(rem))
        # device-resident engines sync handle-visible state once per batch
        sync = getattr(self.signal, "sync", None)
        if sync is not None:
            sync()
            self._since_sync = 0
        return pieces[0] if len(pieces) == 1 else np.concatenate(pieces)

    def render_frames_device(self, total, block_size=512, sync=True):
        """Offline render of ``total`` frames (a multiple of ``block_size``)
        that keeps the audio on device: returns a list of (B, C, n) device
        arrays, one per scan run, without any host transfer or blocking.

        For device-side consumers — digests, further on-device processing,
        throughput measurement — where pulling the full PCM to the host per
        call would serialize the pipeline.  Pass ``sync=False`` to also skip
        the handle-state sync (call ``signal.sync()`` yourself later)."""
        nblocks, rem = divmod(total, block_size)
        if rem:
            raise ValueError("total must be a multiple of block_size")
        out = []
        self._run_blocks(nblocks, block_size, out.append)
        if sync:
            do_sync = getattr(self.signal, "sync", None)
            if do_sync is not None:
                do_sync()
                self._since_sync = 0
        return out


def run(signal, sample_rate, n):
    """Populate and return an (n, C) float32 block from ``signal`` —
    convenience mirroring oddio::run (lib.rs:90-93).  Keeps a Renderer cached
    on the signal so repeated calls stream correctly."""
    key = "_renderer_%d" % int(sample_rate)
    r = getattr(signal, key, None)
    if r is None:
        r = Renderer(signal, sample_rate)
        setattr(signal, key, r)
    return r.render_block(n)
