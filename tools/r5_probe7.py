"""r5_probe7: WHAT is the scenepack stream leg, structurally?

r5_probe2 measured the 16x256 config-5 pack at ~0.91 ms/block of which
0.543 disappears when the 32 Adapt(Stream)/scene become Adapt(Sine).
That delta conflates two very different things:

  (a) per-stream READ cost (row gather + strip_resample + cursor math
      per live stream), which would scale with NS, and
  (b) the fixed cost of a SECOND DR pool per scene (a second pool's
      scan-body machinery, its ring carry, its mask/mix leg), which
      would not.

Variants (same 16x256 pack, same Renderer path as probe2):

  full16   32 Adapt(Stream) + 224 Adapt(Sine)       (baseline, = probe2)
  ns8       8 Adapt(Stream) + 248 Adapt(Sine)       (NS scaling point)
  ns1       1 Adapt(Stream) + 255 Adapt(Sine)       (pool-present floor)
  twopool  32 Adapt(FixedGain(Sine)) + 224 Adapt(Sine)
           (a second pool with NO stream machinery: isolates (b))

An affine fit T(NS) = a + b*NS through full16/ns8/ns1 splits the leg;
twopool pins the second-pool constant independently.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
BLOCK = 512
S, V, FILL = 16, 256, 2400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pack(ns, twopool=False):
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    rng = np.random.default_rng(1)

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=max(ns, 1))
        control = ot.MixerControl(mixer)
        ctls = []
        for i in range(V):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            sine = ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000))
            if i < ns:
                if twopool:
                    control.play(ot.Adapt(ot.FixedGain(sine, 0.9), 0.1, opt))
                else:
                    stream = ot.Stream(8000, FILL + 128,
                                       max_write_per_block=FILL)
                    ctls.append(stream.control)
                    control.play(ot.Adapt(stream, 0.1, opt))
            else:
                control.play(ot.Adapt(sine, 0.1, opt))
        return mixer, ctls

    scenes, ctls = zip(*[build(s) for s in range(S)])
    pack = ScenePack(list(scenes), RATE, make_mesh(1, 1), scan_unroll=8)
    flat = [c for group in ctls for c in group]
    if flat:
        pcm = rng.standard_normal((len(flat), FILL)).astype(np.float32) * 0.1
        for j, ctl in enumerate(flat):
            ctl.write(pcm[j])
    return pack


def main():
    import importlib.util

    import jax

    log(f"devices: {jax.devices()}")
    spec = importlib.util.spec_from_file_location(
        "r5_probe2", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "r5_probe2.py"))
    p2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(p2)

    res = {}
    for label, ns, tp in (("full16", 32, False), ("ns8", 8, False),
                          ("ns1", 1, False), ("twopool", 32, True)):
        res[label] = p2.rate_pack(build_pack(ns, tp), label)

    ms = {k: 10.666 / np.median(v) for k, v in res.items()}
    # affine fit through the three NS points
    xs = np.array([32.0, 8.0, 1.0])
    ys = np.array([ms["full16"], ms["ns8"], ms["ns1"]])
    b, a = np.polyfit(xs, ys, 1)
    log(f"SUMMARY ms/block: " + " ".join(f"{k}={v:.3f}" for k, v in ms.items()))
    log(f"SUMMARY fit T(NS) = {a:.3f} + {b*1e3:.2f}us*NS per pack block "
        f"(per-stream leg at NS=32: {b*32:.3f} ms; pool constant vs "
        f"nostream-era 0.366: {a - 0.366:.3f} ms)")


if __name__ == "__main__":
    main()
