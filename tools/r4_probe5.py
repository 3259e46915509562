"""Round-4 probe v5: the small-scene mixer paths (agc 83x, wavetable
92x, densemix 124x in r3/r4 captures) are per-block fixed-cost bound
like the streams drain (r4_probe2: unroll 4 took 64-voice streams 21 ->
33x).  Sweep scan_unroll for each, and decompose the wavetable step
(resample kernel vs glue) by patching strip_resample to zeros.

Usage: python tools/r4_probe5.py [agc|densemix|wavetable|wtdecomp ...]
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
W = 188


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_r(r, scene, label, ntrials=3, nch=5):
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


def build_agc(rng):
    import oddio_tpu as ot

    control, mixer = ot.Mixer.new(channels=1)
    for _ in range(256):
        control.play(ot.Adapt(
            ot.Sine(rng.uniform(0, 6), rng.uniform(50, 2000)),
            0.1, ot.AdaptOptions(tau=0.1, max_gain=4.0),
        ))
    return mixer


def build_densemix(rng):
    import oddio_tpu as ot

    control, mixer = ot.Mixer.new(channels=1)
    for _ in range(1024):
        gc, g = ot.Gain.new(ot.Sine(rng.uniform(0, 6), rng.uniform(50, 4000)))
        gc.set_gain(rng.uniform(-20, 0))
        control.play(g)
    return ot.Tanh(ot.Reinhard(mixer))


def build_wavetable(rng):
    import oddio_tpu as ot

    table = np.sin(np.linspace(0, 2 * np.pi, 2048, endpoint=False)).astype(
        np.float32
    )
    frames = ot.Frames.from_slice(RATE, table)
    control, mixer = ot.Mixer.new(channels=1)
    for _ in range(1024):
        c = ot.Cycle(frames)
        c.seek(float(rng.uniform(0, 0.04)))
        control.play(ot.Speed.new(c)[1])
    return mixer


def sweep(which, unrolls=(1, 2, 4, 8)):
    import oddio_tpu as ot

    build = {"agc": build_agc, "densemix": build_densemix,
             "wavetable": build_wavetable}[which]
    for u in unrolls:
        rng = np.random.default_rng(7)
        scene = build(rng)
        r = ot.Renderer(scene, RATE, scan_unroll=u)
        time_r(r, scene, f"{which} u{u}")


def wtdecomp():
    """Wavetable with the resample kernel replaced by zeros: the glue
    floor (walk + mixer sum + scan) vs the kernel's own cost."""
    import jax.numpy as jnp

    import oddio_tpu as ot
    from oddio_tpu.ops import cycle as cyc_mod
    from oddio_tpu.ops import pallas_ring as pr

    rng = np.random.default_rng(7)
    scene = build_wavetable(rng)
    r = ot.Renderer(scene, RATE)
    full = time_r(r, scene, "wt_full")

    orig = pr.strip_resample

    def zero_resample(strips, scal, extra, *, n, interpret=False, tile=None):
        V = strips.shape[0]
        return jnp.zeros((V, n), jnp.float32) + 0.0 * (
            strips[0, 0] + scal[0, 0] + extra[0].astype(jnp.float32)
        )

    pr.strip_resample = zero_resample
    # ops modules import it by name at call time? patch any rebinds
    for m in (cyc_mod,):
        if hasattr(m, "strip_resample"):
            m.strip_resample = zero_resample
    rng = np.random.default_rng(7)
    scene = build_wavetable(rng)
    r = ot.Renderer(scene, RATE)
    nores = time_r(r, scene, "wt_nores")
    pr.strip_resample = orig
    for m in (cyc_mod,):
        if hasattr(m, "strip_resample"):
            m.strip_resample = orig
    log(f"== wavetable: full {full:.4f}  no-resample {nores:.4f}  "
        f"kernel ~ {full-nores:.4f} ms/block ==")


if __name__ == "__main__":
    which = sys.argv[1:] or ["agc", "densemix", "wavetable", "wtdecomp"]
    for w in which:
        if w == "wtdecomp":
            wtdecomp()
        else:
            sweep(w)
