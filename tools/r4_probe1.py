"""Round-4 probe v1: dispatch-width sweep — how much of the measured
flagship rate is per-dispatch relay overhead vs device time.

BENCH_r03's seek capture swung 90-123x across trials on identical code;
velocity_trials issues 32 async dispatches of 47 blocks each, so any
per-call cost (relay RTT, param upload at ~0.4 MB/s, host prepare) is
paid 32x per trial.  This probe times the same scenes at dispatch widths
{47, 188, 470} blocks and reports per-block param bytes, separating the
engine's device rate from the harness tax.

Usage: python tools/r4_probe1.py [seek|buffered ...]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(buffered):
    import oddio_tpu as ot

    rng = np.random.default_rng(0)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for _ in range(VOICES):
        sig = ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000))
        if buffered:
            opts = ot.SpatialOptions(
                position=rng.uniform(-15, 15, 3),
                velocity=rng.uniform(-0.3, 0.3, 3),
            )
            control.play_buffered(
                sig, opts, max_distance=50.0, rate=RATE, buffer_duration=0.1
            )
        else:
            opts = ot.SpatialOptions(
                position=rng.uniform(-30, 30, 3),
                velocity=rng.uniform(-5, 5, 3),
            )
            control.play(sig, opts)
    return control, scene


def param_bytes(scene, n):
    import jax

    p = scene.host_prepare(np.float32(1.0 / RATE), n)
    tot = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(p)
    )
    return tot, p


def run(buffered):
    import jax.numpy as jnp

    import oddio_tpu as ot

    label = "buffered" if buffered else "seek"
    control, scene = build(buffered)
    r = ot.Renderer(scene, RATE)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all() and np.abs(first).max() > 0
    pb, _ = param_bytes(scene, BLOCK)
    log(f"[{label}] idle-block param bytes: {pb}")
    for width in (47, 188, 470):
        t0 = time.time()
        blocks = r.render_frames_device(BLOCK * width)
        blocks = r.render_frames_device(BLOCK * width)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        log(f"[{label} w{width}] warmup incl. compile: {time.time()-t0:.1f}s")
        # ~19.7 s of audio per trial regardless of width
        nch = max(1, 1880 // width)
        audio = nch * width * BLOCK / RATE
        for trial in range(3):
            t0 = time.time()
            for _ in range(nch):
                blocks = r.render_frames_device(BLOCK * width, sync=False)
            total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
            assert np.isfinite(total)
            dt = time.time() - t0
            log(
                f"[{label} w{width}] trial {trial}: {audio/dt:.1f}x RT "
                f"({dt*1000/ (nch*width):.4f} ms/block, {nch} dispatches)"
            )
        scene.sync()


if __name__ == "__main__":
    which = sys.argv[1:] or ["seek", "buffered"]
    for w in which:
        run(w == "buffered")
