"""r4_probe8: ScenePack scan_unroll A/B on the bench's scenepack scene.

The scenepack bench line (16 scenes x 256 voices, Adapt(Stream)+Adapt(Sine),
(1,1) mesh) measured 6.5x per scene in the r4 preview.  Per-block device
work is 16*256 = 4096 Adapt voices, yet the 256-voice AGC scene alone runs
~380x with Renderer scan_unroll=4 — suggesting the pack scan is
per-iteration fixed-cost bound (op launches don't multiply under vmap, so
the same amortization should apply).  This probe runs the identical scene
at unroll 1 and unroll 4 in ONE session (same tunnel weather).
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


def build_pack(unroll):
    import jax.numpy as jnp  # noqa: F401

    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    S, V, NS, FILL = 16, 256, 32, 2400
    rng = np.random.default_rng(1)

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=NS)
        control = ot.MixerControl(mixer)
        ctls = []
        for i in range(V):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            if i < NS:
                stream = ot.Stream(8000, FILL + 128, max_write_per_block=FILL)
                ctls.append(stream.control)
                control.play(ot.Adapt(stream, 0.1, opt))
            else:
                control.play(ot.Adapt(
                    ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000)),
                    0.1, opt,
                ))
        return mixer, ctls

    scenes, ctls = zip(*[build(s) for s in range(S)])
    pack = ScenePack(list(scenes), RATE, make_mesh(1, 1), scan_unroll=unroll)
    pcm = rng.standard_normal((S * NS, FILL)).astype(np.float32) * 0.1
    for j, ctl in enumerate(c for group in ctls for c in group):
        ctl.write(pcm[j])
    return pack


def run(unroll, ntrials=3):
    import jax.numpy as jnp

    pack = build_pack(unroll)
    t0 = time.time()
    blocks = pack.render_frames_device(BLOCK * 8)
    blocks = pack.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[u{unroll}] warmup incl. compile: {time.time()-t0:.1f}s")
    nch = 4
    audio = nch * CHUNK * BLOCK / RATE
    trials = []
    for _ in range(ntrials):
        t0 = time.time()
        for _ in range(nch):
            blocks = pack.render_frames_device(BLOCK * CHUNK)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        trials.append(round(audio / (time.time() - t0), 2))
    log(f"[u{unroll}] trials: {trials} x RT per scene")
    return trials


def main():
    import jax

    log(f"devices: {jax.devices()}")
    r1 = run(1)
    r4 = run(4)
    r8 = run(8)
    log(f"SUMMARY unroll1={r1} unroll4={r4} unroll8={r8}")


if __name__ == "__main__":
    main()
