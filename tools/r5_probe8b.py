"""r5_probe8b: the scenepack after the fused AGC kernel (pallas_agc).

Re-runs r5_probe8's decisive variants on the post-kernel tree: full16
(the BASELINE config-5 scene: 224 Adapt(Sine) + 32 Adapt(Stream)),
twopool (the no-stream twin), base224 (no second pool).  Pre-kernel
anchors, same session class (r5_probe8): full16 0.893, twopool 0.825,
base224 0.467 (noisy; fg32/sine32 measured 0.39) ms/block pack-wide.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import importlib.util

    import jax

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"devices: {jax.devices()}")
    here = os.path.dirname(os.path.abspath(__file__))
    spec2 = importlib.util.spec_from_file_location(
        "r5_probe2", os.path.join(here, "r5_probe2.py"))
    p2 = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(p2)
    spec8 = importlib.util.spec_from_file_location(
        "r5_probe8", os.path.join(here, "r5_probe8.py"))
    p8 = importlib.util.module_from_spec(spec8)
    spec8.loader.exec_module(p8)

    # nch=40 (1880-block trials): keeps the ~30 ms relay enqueue+fetch
    # floor < 10% at post-kernel rates (the first pass used nch=4, whose
    # ~65 ms trials were ~half floor — those numbers are upper bounds)
    nch = int(os.environ.get("PROBE_NCH", "40"))
    res = {}
    for label, ns, chain, icap in (
        ("full16", 32, "stream", 32),
        ("twopool", 32, "afg", 32),
        ("base224", 0, "sine", 32),
    ):
        res[label] = p2.rate_pack(p8.build_pack(ns, chain, icap), label,
                                  nch=nch)

    ms = {k: 10.666 / np.median(v) for k, v in res.items()}
    log("SUMMARY ms/block (post-AGC-kernel): "
        + " ".join(f"{k}={v:.3f}" for k, v in ms.items()))


if __name__ == "__main__":
    main()
