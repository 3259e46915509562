"""Round-4 probe v2: (a) buffered-step decomposition at 4096 voices —
where do the ~0.13 ms/block of NON-ring work go (walk / inner render /
append / read glue)? (b) scan_unroll sweep for the small-voice-count
paths (streams_spatial 49x, wavetable 83x), which should be per-block
fixed-cost bound rather than work bound.

Variants are built by monkeypatching the traced step's components before
constructing each scene+Renderer pair (fresh jit caches per variant; the
persistent compile cache keys on HLO, so variants never collide).

Usage: python tools/r4_probe2.py [decomp|streams|wavetable ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOICES = 4096
RATE = 48000
BLOCK = 512
W = 188


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_buffered():
    import oddio_tpu as ot

    rng = np.random.default_rng(0)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for _ in range(VOICES):
        control.play_buffered(
            ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000)),
            ot.SpatialOptions(
                position=rng.uniform(-15, 15, 3),
                velocity=rng.uniform(-0.3, 0.3, 3),
            ),
            max_distance=50.0, rate=RATE, buffer_duration=0.1,
        )
    return control, scene


def time_scene(scene, label, ntrials=3, nch=5):
    import jax.numpy as jnp

    import oddio_tpu as ot

    r = ot.Renderer(scene, RATE)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * W)
    blocks = r.render_frames_device(BLOCK * W)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup: {time.time()-t0:.1f}s")
    audio = nch * W * BLOCK / RATE
    best = None
    for _ in range(ntrials):
        t0 = time.time()
        for _ in range(nch):
            blocks = r.render_frames_device(BLOCK * W, sync=False)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        log(f"[{label}] {audio/dt:.1f}x RT ({dt*1000/(nch*W):.4f} ms/block)")
    scene.sync()
    return best * 1000 / (nch * W)


def probe_decomp():
    import jax.numpy as jnp

    from oddio_tpu import spatial as sp

    variants = {}

    # full reference step
    control, scene = build_buffered()
    variants["full"] = time_scene(scene, "full")

    # no-read: the window gather + select kernel replaced by zeros
    orig_read = sp._BufferedPoolDR._windows_read

    def no_read(self, rows8, vbase, base_c, frac_c, split_c,
                p_gain_c, d_gain_c, maskf, cfg, n, cap, FP, interp):
        # keep a data dependence on the inputs so nothing upstream is DCEd
        return jnp.zeros((2, n), jnp.float32) + 0.0 * (
            base_c[0][0].astype(jnp.float32) + base_c[1][0].astype(jnp.float32)
            + maskf[0] + frac_c[0][0] + p_gain_c[0][0] + d_gain_c[1][0]
            + split_c[0][1][0]
        )

    sp._BufferedPoolDR._windows_read = no_read
    control, scene = build_buffered()
    variants["no_read"] = time_scene(scene, "no_read")
    sp._BufferedPoolDR._windows_read = orig_read

    # no-append: strided-DMA ring write skipped (ring untouched)
    orig_append = sp.rows_append_dma
    sp.rows_append_dma = lambda ring, slab, r0, rm, **kw: ring
    control, scene = build_buffered()
    variants["no_append"] = time_scene(scene, "no_append")

    # no-read AND no-append (walk + inner render + glue)
    sp._BufferedPoolDR._windows_read = no_read
    control, scene = build_buffered()
    variants["walk_inner"] = time_scene(scene, "walk_inner")
    sp._BufferedPoolDR._windows_read = orig_read
    sp.rows_append_dma = orig_append

    # no-inner: source render replaced by zeros (walk + append + read)
    control, scene = build_buffered()
    pool = list(scene._buffered_pools.values())[0]
    proto = pool.proto
    orig_render = type(proto).dr_render

    def zero_render(self, state, ddata, interval, n, count):
        z = jnp.zeros((state_leading(state), n), jnp.float32)
        return state, z

    def state_leading(state):
        while isinstance(state, dict):
            state = next(iter(state.values()))
        return state.shape[0]

    type(proto).dr_render = zero_render
    variants["no_inner"] = time_scene(scene, "no_inner")
    type(proto).dr_render = orig_render

    log("== decomposition (ms/block, best) ==")
    for k, v in variants.items():
        log(f"  {k:>12}: {v:.4f}")
    f = variants["full"]
    log(f"  read leg   ~ {f - variants['no_read']:.4f}")
    log(f"  append leg ~ {f - variants['no_append']:.4f}")
    log(f"  inner leg  ~ {f - variants['no_inner']:.4f}")
    log(f"  walk+glue  ~ {variants['walk_inner']:.4f}")


def probe_streams(unrolls=(1, 2, 4)):
    import jax.numpy as jnp

    import oddio_tpu as ot

    n_streams = 64
    fill = 6 * RATE
    rng = np.random.default_rng(3)
    for u in unrolls:
        control, scene = ot.SpatialScene.new(initial_capacity=n_streams)
        ctls = []
        for _ in range(n_streams):
            ctl, s = ot.Stream.new(RATE, fill + RATE // 4)
            control.play_buffered(
                s, ot.SpatialOptions(position=rng.uniform(-20, 20, 3)),
                max_distance=50.0, rate=RATE, buffer_duration=0.1,
            )
            ctls.append(ctl)
        data = rng.standard_normal((n_streams, fill)).astype(np.float32) * 0.05
        for j, ctl in enumerate(ctls):
            ctl.write(data[j])
        r = ot.Renderer(scene, RATE, scan_unroll=u)
        t0 = time.time()
        first = r.render_frames(BLOCK * 8)
        assert np.isfinite(first).all()
        blocks = r.render_frames_device(BLOCK * W)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        log(f"[streams u{u}] warmup: {time.time()-t0:.1f}s")
        nch = int((fill / RATE - 0.5) * RATE / (W * BLOCK))
        blocks = r.render_frames_device(BLOCK * W, sync=False)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        t0 = time.time()
        for _ in range(nch - 1):
            blocks = r.render_frames_device(BLOCK * W, sync=False)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        xrt = (nch - 1) * W * BLOCK / RATE / (time.time() - t0)
        log(f"[streams u{u}] drain: {xrt:.1f}x RT "
            f"({1000/(xrt*RATE/BLOCK):.4f} ms/block)")
        scene.sync()


def probe_wavetable(unrolls=(1, 2, 4)):
    import oddio_tpu as ot

    rng = np.random.default_rng(5)
    table = np.sin(np.linspace(0, 2 * np.pi, 2048, endpoint=False)).astype(
        np.float32
    )
    frames = ot.Frames.from_slice(RATE, table)
    for u in unrolls:
        control, mixer = ot.Mixer.new(channels=1)
        for _ in range(1024):
            c = ot.Cycle(frames)
            c.seek(float(rng.uniform(0, 0.04)))
            control.play(ot.Speed.new(c)[1])
        import oddio_tpu as ot2

        r = ot2.Renderer(mixer, RATE, scan_unroll=u)
        ms = time_scene_r(r, mixer, f"wavetable u{u}")


def time_scene_r(r, scene, label, ntrials=3, nch=5):
    import jax.numpy as jnp

    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * W)
    blocks = r.render_frames_device(BLOCK * W)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup: {time.time()-t0:.1f}s")
    audio = nch * W * BLOCK / RATE
    best = None
    for _ in range(ntrials):
        t0 = time.time()
        for _ in range(nch):
            blocks = r.render_frames_device(BLOCK * W, sync=False)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        log(f"[{label}] {audio/dt:.1f}x RT ({dt*1000/(nch*W):.4f} ms/block)")
    if hasattr(scene, "sync"):
        scene.sync()
    return best * 1000 / (nch * W)


if __name__ == "__main__":
    which = sys.argv[1:] or ["decomp", "streams", "wavetable"]
    for w in which:
        if w == "decomp":
            probe_decomp()
        elif w == "streams":
            probe_streams()
        elif w == "wavetable":
            probe_wavetable()
