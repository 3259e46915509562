"""Round-3 probe v16: flagship buffered scene vs Renderer scan_unroll.

The 4096-voice buffered scene sits at ~22.8x RT (0.47 ms/block); some of
that is per-iteration fixed cost inside the block scan (pallas call
launches, small-shape control-walk ops).  Unrolling the scan body lets
XLA pipeline consecutive blocks' kernels.  The ring is donated/aliased
in place, so unrolling must not grow the carry.

Usage: python tools/r3_probe16.py [unroll ...]   (default 1 2 4)
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
CHUNK = 47
NCHUNKS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
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


def run(unroll):
    import jax.numpy as jnp

    import oddio_tpu as ot

    control, scene = build()
    r = ot.Renderer(scene, RATE, scan_unroll=unroll)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all() and np.abs(first).max() > 0
    blocks = r.render_frames_device(BLOCK * CHUNK)
    blocks = r.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[buffered u{unroll}] warmup incl. compile: {time.time()-t0:.1f}s")
    audio = NCHUNKS * CHUNK * BLOCK / RATE
    for trial in range(3):
        t0 = time.time()
        for _ in range(NCHUNKS):
            blocks = r.render_frames_device(BLOCK * CHUNK, sync=False)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        log(f"[buffered u{unroll}] trial {trial}: "
            f"{audio/(time.time()-t0):.1f}x RT")
    scene.sync()


if __name__ == "__main__":
    us = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    for u in us:
        run(u)
