"""r5_probe8: decompose the SECOND-POOL cost law (ROADMAP "Follow-up 2").

r5_probe7 established that a 32-slot second DR pool per scene costs the
16x256 pack ~0.48 ms/block with NO stream machinery (twopool), and that
for STREAM second pools the cost scales ~linearly with pool capacity
(ns8 +0.112 vs full16 +0.533 over nostream).  Two laws could explain it:

  (L1) per-pool FIXED cost (op-graph duplication, launch-bound at small
       shapes) -- then afg8 ~= twopool32 and the lever is pool merging /
       spine co-rendering;
  (L2) per-CAPACITY-SLOT cost (~17 us/slot pack-wide, something serial
       in V even at (16, 32, 512) shapes) -- then afg8 << twopool32 and
       the lever is finding/batching the serial op.

Variants (16 scenes, main pool = 224 Adapt(Sine), cap 256):

  anchor    full16   224 AS + 32 Adapt(Stream)      (cached, probe7)
  anchor    twopool  224 AS + 32 Adapt(FixedGain(Sine)) (cached, probe7)
  base224   224 AS only (second pool ABSENT)        (pool-present delta)
  afg8      224 AS +  8 Adapt(FixedGain(Sine))      (capacity scaling)
  fg32      224 AS + 32 FixedGain(Sine)             (- Adapt leg)
  sine32    224 AS + 32 Sine                        (- FixedGain too)
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


def build_pack(ns, chain, icap=None):
    """``chain``: 'stream' | 'afg' | 'fg' | 'sine' -- the second pool's
    voice type; ``ns`` second-pool voices per scene (0 = absent)."""
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    rng = np.random.default_rng(1)

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=icap or max(ns, 8))
        control = ot.MixerControl(mixer)
        ctls = []
        for i in range(V - (32 - ns) if ns else V - 32):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            sine = ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000))
            if i < ns:
                if chain == "stream":
                    stream = ot.Stream(8000, FILL + 128,
                                       max_write_per_block=FILL)
                    ctls.append(stream.control)
                    control.play(ot.Adapt(stream, 0.1, opt))
                elif chain == "afg":
                    control.play(ot.Adapt(ot.FixedGain(sine, 0.9), 0.1, opt))
                elif chain == "fg":
                    control.play(ot.FixedGain(sine, 0.9))
                elif chain == "sine":
                    control.play(sine)
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
    # NB: probe7's builds used V-ns main voices for ns>0 and V for ns=0;
    # here every variant holds the MAIN pool at 224 live voices so deltas
    # isolate the second pool alone.
    for label, ns, chain, icap in (
        ("full16", 32, "stream", 32),   # cached anchor (probe7 archetype)
        ("twopool", 32, "afg", 32),     # cached anchor (probe7 archetype)
        ("base224", 0, "sine", 32),
        ("afg8", 8, "afg", 8),
        ("fg32", 32, "fg", 32),
        ("sine32", 32, "sine", 32),
    ):
        res[label] = p2.rate_pack(build_pack(ns, chain, icap), label)

    ms = {k: 10.666 / np.median(v) for k, v in res.items()}
    log("SUMMARY ms/block: " + " ".join(f"{k}={v:.3f}" for k, v in ms.items()))
    base = ms["base224"]
    log("SUMMARY second-pool deltas vs base224: "
        + " ".join(f"{k}={ms[k]-base:+.3f}" for k in
                   ("full16", "twopool", "afg8", "fg32", "sine32")))


if __name__ == "__main__":
    main()
