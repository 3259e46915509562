"""r4_probe10: ScenePack composition A/B — where does the pack block go?

The scenepack line (16 scenes x 256 Adapt voices, (1,1) mesh, u8) runs
~8-10x per scene = ~1.0 ms/block for 4096 total voices, while the single-
scene AGC line (256 Adapt voices, u4) runs ~28 us/block.  vmap over the
scene axis should amortize op launches, so something in the pack body
scales badly.  Candidates:

  (a) the Stream pool's row gather (`jnp.take(view, idx, axis=0)`,
      ops/stream.py:366) becoming a batched gather under vmap — TPU
      lowers batched gathers elementwise-ish (the repo's core lesson);
  (b) Adapt's log-depth associative scan widening poorly under vmap;
  (c) shard_map/psum glue;
  (d) genuine compute scaling (16x the voices).

Configs (all 16 scenes x 256 voices, u8, same harness):
  sine_adapt   256 Adapt(Sine) per scene        -> isolates (a): no streams
  sine_plain   256 Sine per scene               -> isolates (b): no Adapt
  bench_mix    32 Adapt(Stream)+224 Adapt(Sine) -> the bench line (control)
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
S, V, NS, FILL = 16, 256, 32, 2400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pack(kind, unroll=8):
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    rng = np.random.default_rng(1)

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=NS)
        control = ot.MixerControl(mixer)
        ctls = []
        for i in range(V):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            sine = ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000))
            if kind == "bench_mix" and i < NS:
                stream = ot.Stream(8000, FILL + 128, max_write_per_block=FILL)
                ctls.append(stream.control)
                control.play(ot.Adapt(stream, 0.1, opt))
            elif kind == "sine_plain":
                control.play(sine)
            else:
                control.play(ot.Adapt(sine, 0.1, opt))
        return mixer, ctls

    scenes, ctls = zip(*[build(s) for s in range(S)])
    pack = ScenePack(list(scenes), RATE, make_mesh(1, 1), scan_unroll=unroll)
    flat = [c for group in ctls for c in group]
    if flat:
        pcm = rng.standard_normal((len(flat), FILL)).astype(np.float32) * 0.1
        for j, ctl in enumerate(flat):
            ctl.write(pcm[j])
    return pack


def run(kind, ntrials=3, unroll=8):
    import jax.numpy as jnp

    pack = build_pack(kind, unroll)
    t0 = time.time()
    blocks = pack.render_frames_device(BLOCK * 8)
    blocks = pack.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{kind} u{unroll}] warmup incl. compile: {time.time()-t0:.1f}s")
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
    log(f"[{kind} u{unroll}] trials: {trials} x RT per scene")
    return trials


def main():
    import jax

    log(f"devices: {jax.devices()}")
    mix = run("bench_mix")
    sa = run("sine_adapt")
    sp = run("sine_plain")
    log(f"SUMMARY bench_mix={mix} sine_adapt={sa} sine_plain={sp}")


if __name__ == "__main__":
    main()
