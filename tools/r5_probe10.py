"""r5_probe10: what is the scenepack's residual per-voice cost, post
AGC kernel?

After pallas_agc the 16x256 config-5 pack is 0.343 ms/block of which
full16-twopool ~= 0.08 is stream machinery and the main Adapt ~0.03
(r5_probe9b).  The remaining ~0.23 is the "noagc" base (16 scenes x 256
bare Sines measured 0.229 pre-kernel, r5_probe2) — yet the SAME-sized
sine leg inside the buffered flagship costs 0.022 ms (ROADMAP r4 table).
Same smell as the Adapt finding: per-instance op-graph latency inside
the pack program.  Variants (16 scenes, ONE pool, no Adapt):

  sine256    256 Sine/scene        (the noagc baseline)
  const256   256 Constant/scene    (removes the warp-pipeline math ->
                                    isolates pool glue + masked sum)
  sine256u1  sine256 at scan_unroll=1 (is it per-iteration overhead?)
  sine1024   1024 Sine/scene       (does it scale with V or is it flat?)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
S = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pack(kind, V=256, unroll=8):
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=32)
        control = ot.MixerControl(mixer)
        for i in range(V):
            if kind == "sine":
                control.play(ot.Sine(rng2.uniform(0, 6),
                                     rng2.uniform(50, 2000)))
            else:
                control.play(ot.Constant(rng2.uniform(-0.01, 0.01)))
        return mixer, []

    scenes, _ = zip(*[build(s) for s in range(S)])
    return ScenePack(list(scenes), RATE, make_mesh(1, 1), scan_unroll=unroll)


def main():
    import importlib.util

    import jax

    log(f"devices: {jax.devices()}")
    spec2 = importlib.util.spec_from_file_location(
        "r5_probe2", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "r5_probe2.py"))
    p2 = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(p2)

    # nch=40: 1880 blocks (~20 s audio) per trial, so the ~30 ms relay
    # enqueue+fetch floor stays < 10% even at sub-0.1 ms/block rates (the
    # first nch=4 pass measured every variant flat at ~0.2 ms/block —
    # trial wall was ~40 ms, i.e. mostly the floor; the r5_probe9 lesson
    # at the dispatch level)
    res = {}
    for label, kind, V, u in (
        ("sine256", "sine", 256, 8),
        ("const256", "const", 256, 8),
        ("sine256u1", "sine", 256, 1),
        ("sine1024", "sine", 1024, 8),
    ):
        res[label] = p2.rate_pack(build_pack(kind, V, u), label, nch=40)

    ms = {k: 10.666 / np.median(v) for k, v in res.items()}
    log("SUMMARY ms/block: " + " ".join(f"{k}={v:.3f}" for k, v in ms.items()))


if __name__ == "__main__":
    main()
