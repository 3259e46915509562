"""Secondary scene benchmarks (BASELINE.json configs beyond the flagship).

Run on the TPU host:  python tools/bench_scenes.py [config ...]

Configs:
  densemix  — 1024 mono voices, per-voice Gain(Sine) (DR pool, sparse
              set_gain deltas) -> Reinhard -> Tanh, mono mix
              (BASELINE config 4's shape on the DR path)
  streams   — 256 Stream voices with sustained host ingest + spatial
              placement (BASELINE config 5's single-scene shape)
  wavetable — 1024 Cycle (looping wavetable) voices in a mixer (DR pool)

Each prints one stderr line with sustained xRT (digest fetch; PCM egress is
relay-bound in this harness — see bench.py).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATE = 48000
BLOCK = 512
CHUNK = 47
NCHUNKS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure(label, r, scene_like, tick=None):
    import jax.numpy as jnp

    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    if tick:
        tick(0)
    blocks = r.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup incl. compile: {time.time()-t0:.1f}s")
    audio = NCHUNKS * CHUNK * BLOCK / RATE
    for mode in (("control ticks", tick), ("no control uploads", None)):
        name, tk = mode
        if tk is None and tick is None:
            continue
        t0 = time.time()
        for c in range(NCHUNKS):
            if tk:
                tk(c + 1)
            blocks = r.render_frames_device(BLOCK * CHUNK, sync=False)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        wall = time.time() - t0
        assert np.isfinite(total)
        note = "; control uploads ride the relay tunnel here" if tk else ""
        log(f"[{label}] {audio:.2f}s audio in {wall:.2f}s -> "
            f"{audio/wall:.1f}x RT ({name}{note})")


def densemix():
    import oddio_tpu as ot

    rng = np.random.default_rng(2)
    control, mixer = ot.Mixer.new(channels=1)
    gcs = []
    for _ in range(1024):
        gc, g = ot.Gain.new(ot.Sine(rng.uniform(0, 6), rng.uniform(50, 4000)))
        gc.set_gain(rng.uniform(-20, 0))
        gcs.append(gc)
        control.play(g)
    chain = ot.Tanh(ot.Reinhard(mixer))
    r = ot.Renderer(chain, RATE)

    def tick(c):
        for gc in gcs[(c * 32) % 1024 : (c * 32) % 1024 + 32]:
            gc.set_gain(float(rng.uniform(-20, 0)))

    _measure("densemix 1024v gain-ctrl", r, mixer, tick)


def streams():
    """Spatialized Stream voices.  Sustained full-rate ingest at 256
    streams is 49 MB/s of source PCM — far beyond this harness's ~0.4 MB/s relay
    tunnel (measured 0.016x RT, purely transfer-bound; a PCIe-attached
    host ships it trivially).  The engine-side rate is measured instead by
    pre-filling every stream and timing the render drain."""
    import time

    import jax.numpy as jnp

    import oddio_tpu as ot

    rng = np.random.default_rng(3)
    control, scene = ot.SpatialScene.new(initial_capacity=256)
    n_streams = 64
    fill = 3 * RATE  # 3 s of audio per stream
    handles = []
    for _ in range(n_streams):
        ctl, s = ot.Stream.new(RATE, fill + RATE // 4)
        h = control.play_buffered(
            s,
            ot.SpatialOptions(position=rng.uniform(-20, 20, 3)),
            max_distance=50.0, rate=RATE, buffer_duration=0.1,
        )
        handles.append((ctl, h))
    r = ot.Renderer(scene, RATE)

    def prefill():
        data = rng.standard_normal((n_streams, fill)).astype(np.float32) * 0.05
        t0 = time.time()
        for j, (ctl, _) in enumerate(handles):
            ctl.write(data[j])
        log(f"[streams] queued {data.nbytes/1e6:.0f} MB of source PCM "
            f"in {time.time()-t0:.1f}s (host-side)")

    prefill()
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[streams {n_streams}v] warmup incl. compile + buffer upload: "
        f"{time.time()-t0:.1f}s")
    nch = int((fill / RATE - 0.3) * RATE / (CHUNK * BLOCK))
    t0 = time.time()
    for c in range(nch):
        blocks = r.render_frames_device(BLOCK * CHUNK, sync=False)
    total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    wall = time.time() - t0
    audio = nch * CHUNK * BLOCK / RATE
    assert np.isfinite(total)
    log(f"[streams {n_streams}v] render drain: {audio:.2f}s audio in "
        f"{wall:.2f}s -> {audio/wall:.1f}x RT (engine side; ingest is "
        f"relay-bound in this harness)")


def wavetable():
    import oddio_tpu as ot

    rng = np.random.default_rng(4)
    table = np.sin(np.linspace(0, 2 * np.pi, 2048, endpoint=False)).astype(np.float32)
    frames = ot.Frames.from_slice(RATE, table)
    control, mixer = ot.Mixer.new(channels=1)
    for _ in range(1024):
        c = ot.Cycle(frames)
        c.seek(float(rng.uniform(0, 0.04)))
        control.play(ot.Speed.new(c)[1])
    r = ot.Renderer(mixer, RATE)
    _measure("wavetable 1024v cycle+speed", r, mixer)


def subpass():
    """4096 buffered voices, 64 of them offset-clamped: the family
    sub-pass keeps the pool on the tight (512, 32) tier.  Compare with
    bench.py's buffered scene (no clamped voices) and the all-clamped
    probe rate (12.5x at (256, 256))."""
    import oddio_tpu as ot

    rng = np.random.default_rng(5)
    control, scene = ot.SpatialScene.new(initial_capacity=4096)
    for i in range(4096):
        if i < 64:
            p = rng.uniform(100, 150, 3) * rng.choice([-1.0, 1.0], 3)
            opts = ot.SpatialOptions(position=p)
        else:
            opts = ot.SpatialOptions(
                position=rng.uniform(-15, 15, 3),
                velocity=rng.uniform(-0.3, 0.3, 3),
            )
        control.play_buffered(
            ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000)),
            opts, max_distance=50.0, rate=RATE, buffer_duration=0.1,
        )
    r = ot.Renderer(scene, RATE)
    _measure("subpass 4096v (64 clamped)", r, scene)
    pool = list(scene._buffered_pools.values())[0]
    log(f"[subpass] read_cfg={pool._read_cfg} sub_cfg={pool._sub_cfg} "
        f"listed={len(pool._sub_list)}")


ALL = {"densemix": densemix, "streams": streams, "wavetable": wavetable,
       "subpass": subpass}

if __name__ == "__main__":
    import jax

    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or list(ALL)
    for name in which:
        ALL[name]()
