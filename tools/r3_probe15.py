"""Round-3 probe v15: small-pool stream drain vs Renderer scan_unroll.

64-voice stream pools are bound by per-op fixed costs inside the block
scan (ROADMAP: mixer streams 28x vs the 40x target), not by lane work.
This measures the sustained drain rate of 64 prefilled Stream voices —
mixer and spatialized — at scan_unroll in {1, 4, 8}, after the realign
shifter + ds-tier window changes.

Usage: python tools/r3_probe15.py [mixer|spatial ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
BLOCK = 512
CHUNK = 47


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def drain(spatial, unroll):
    import jax.numpy as jnp

    import oddio_tpu as ot

    rng = np.random.default_rng(3)
    n_streams = 64
    fill = 3 * RATE
    if spatial:
        control, scene = ot.SpatialScene.new(initial_capacity=n_streams)
    else:
        control, scene = ot.Mixer.new(channels=1)
    ctls = []
    for _ in range(n_streams):
        ctl, s = ot.Stream.new(RATE, fill + RATE // 4)
        if spatial:
            control.play_buffered(
                s, ot.SpatialOptions(position=rng.uniform(-20, 20, 3)),
                max_distance=50.0, rate=RATE, buffer_duration=0.1,
            )
        else:
            control.play(s)
        ctls.append(ctl)
    r = ot.Renderer(scene, RATE, scan_unroll=unroll)
    data = rng.standard_normal((n_streams, fill)).astype(np.float32) * 0.05
    for j, ctl in enumerate(ctls):
        ctl.write(data[j])
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    label = "spatial" if spatial else "mixer"
    log(f"[{label} u{unroll}] warmup incl. compile: {time.time()-t0:.1f}s")
    nch = int((fill / RATE - 0.3) * RATE / (CHUNK * BLOCK))
    t0 = time.time()
    for _ in range(nch):
        blocks = r.render_frames_device(BLOCK * CHUNK, sync=False)
    total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    wall = time.time() - t0
    audio = nch * CHUNK * BLOCK / RATE
    assert np.isfinite(total)
    log(f"[{label} u{unroll}] drain: {audio:.2f}s audio in {wall:.2f}s "
        f"-> {audio/wall:.1f}x RT")


if __name__ == "__main__":
    which = sys.argv[1:] or ["mixer", "spatial"]
    for kind in which:
        for u in (1, 4, 8):
            drain(kind == "spatial", u)
