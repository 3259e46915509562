"""Round-4 probe v4: dispatch-width sweep.  r4_probe3 showed the seek
step's DEVICE cost is ~0.0125 ms/block while the measured flagship floor
is ~0.086 — the bench number is dominated by per-dispatch relay overhead
(enqueue RTT + host prep + digest fetch).  Sweep blocks-per-dispatch at a
fixed total to find where the overhead amortizes out, for both paths.

Usage: python tools/r4_probe4.py [seek|buffered ...]
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
TOTAL = 1504  # blocks per trial (~16 s of audio), divisible by all widths


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(buffered):
    import oddio_tpu as ot

    rng = np.random.default_rng(0)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for _ in range(VOICES):
        sig = ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000))
        if buffered:
            control.play_buffered(
                sig,
                ot.SpatialOptions(
                    position=rng.uniform(-15, 15, 3),
                    velocity=rng.uniform(-0.3, 0.3, 3),
                ),
                max_distance=50.0, rate=RATE, buffer_duration=0.1,
            )
        else:
            control.play(sig, ot.SpatialOptions(
                position=rng.uniform(-30, 30, 3),
                velocity=rng.uniform(-5, 5, 3),
            ))
    return control, scene


def sweep(buffered, widths=(94, 188, 376, 752, 1504)):
    import jax.numpy as jnp

    import oddio_tpu as ot

    label = "buffered" if buffered else "seek"
    control, scene = build(buffered)
    r = ot.Renderer(scene, RATE)
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    for w in widths:
        t0 = time.time()
        blocks = r.render_frames_device(BLOCK * w, sync=False)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        log(f"[{label}] w={w} warmup {time.time()-t0:.1f}s")
    audio = TOTAL * BLOCK / RATE
    for w in widths:
        best = None
        for _ in range(3):
            t0 = time.time()
            for _ in range(TOTAL // w):
                blocks = r.render_frames_device(BLOCK * w, sync=False)
            float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            log(f"[{label}] w={w:5d}: {audio/dt:6.1f}x RT "
                f"({dt*1000/TOTAL:.4f} ms/block)")
        log(f"[{label}] w={w:5d}: BEST {audio/best:6.1f}x "
            f"({best*1000/TOTAL:.4f} ms/block)")
    scene.sync()


if __name__ == "__main__":
    which = sys.argv[1:] or ["seek", "buffered"]
    for w in which:
        sweep(w == "buffered")
