"""r5_probe7b: controls for the probe7 second-pool cost law.

probe7 measured (16x256 pack, ms/block): nostream(1 pool 256)=0.366,
twopool(224+32)=0.845, ns8(248+8 stream)=0.478 — the marginal cost of a
second pool is ~linear in its capacity at ~10x the main pool's per-slot
rate.  Two controls split the hypotheses:

  onepool   256 Adapt(FixedGain(Sine)), ONE pool.  If ~0.40, the
            FixedGain chain itself is cheap and the overhead is the pool
            SPLIT; if ~0.85, the chain is the problem.
  split128  128 Adapt(Sine) + 128 Adapt(FixedGain(Sine)).  If cost
            tracks total-voices-in-smaller-pools, expect ~1.3; if the
            overhead is per-pool-fixed, expect ~0.5.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
S, V = 16, 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pack(kind):
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=32)
        control = ot.MixerControl(mixer)
        for i in range(V):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            sine = ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000))
            gained = (kind == "onepool" or
                      (kind == "split128" and i >= V // 2))
            if gained:
                control.play(ot.Adapt(ot.FixedGain(sine, 0.9), 0.1, opt))
            else:
                control.play(ot.Adapt(sine, 0.1, opt))
        return mixer, []

    scenes, _ = zip(*[build(s) for s in range(S)])
    return ScenePack(list(scenes), RATE, make_mesh(1, 1), scan_unroll=8)


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
    for kind in ("onepool", "split128"):
        res[kind] = p2.rate_pack(build_pack(kind), kind)
    log("SUMMARY ms/block: "
        + " ".join(f"{k}={10.666/np.median(v):.3f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
