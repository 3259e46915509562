"""Headline benchmark: spatialized voices per chip in real time.

North star (BASELINE.json): render 4096 spatialized voices per chip at
>=100x real time, 48 kHz stereo, 512-frame blocks.

Prints ONE JSON line:
  {"metric": ..., "value": xRT, "unit": "x_realtime", "vs_baseline": xRT/100}

Runs on whatever jax platform is active (the real TPU under the driver).
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

VOICES = 4096
RATE = 48000
BLOCK = 512
WARMUP_BLOCKS = 4
TIMED_SECONDS = 2.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    t0 = time.time()
    import oddio_tpu as ot

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    handles = []
    for _ in range(VOICES):
        h = control.play_buffered(
            ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000)),
            ot.SpatialOptions(
                position=rng.uniform(-30, 30, 3), velocity=rng.uniform(-5, 5, 3)
            ),
            max_distance=50.0,
            rate=RATE,
            buffer_duration=0.1,
        )
        handles.append(h)
    log(f"built {VOICES}-voice scene in {time.time()-t0:.1f}s")

    r = ot.Renderer(scene, RATE)
    t0 = time.time()
    for _ in range(WARMUP_BLOCKS):
        out = r.render_block(BLOCK)
    log(f"warmup ({WARMUP_BLOCKS} blocks incl. compile): {time.time()-t0:.1f}s")
    assert np.isfinite(out).all() and np.abs(out).max() > 0

    nblocks = int(TIMED_SECONDS * RATE / BLOCK)
    # keep motion updates flowing (real control-plane load): move 1/8 of
    # voices every block
    t0 = time.time()
    upd = 0
    for i in range(nblocks):
        for h in handles[upd : upd + VOICES // 8 : 64]:
            h.set_motion(rng.uniform(-30, 30, 3), rng.uniform(-5, 5, 3), False)
        upd = (upd + VOICES // 8) % VOICES
        r.render_block(BLOCK)
    wall = time.time() - t0
    audio = nblocks * BLOCK / RATE
    xrt = audio / wall
    log(f"{nblocks} blocks, {audio:.2f}s audio in {wall:.2f}s wall -> {xrt:.1f}x RT")
    print(json.dumps({
        "metric": f"spatial_{VOICES}v_{RATE//1000}kHz_stereo_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
