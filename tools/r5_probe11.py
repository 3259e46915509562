"""r5_probe11: scenepack scan_unroll, re-decided post-AGC-kernel.

r4_probe8 measured u8 ~1.5x better than u1 on the config-5 pack — when
the body was dominated by the Adapt scan's ~300-op subgraph.  With the
fused AGC kernel the op mix changed completely, and r5_probe10's long
trials showed plain-sine packs running FASTER at u1 (0.059 vs 0.101
ms/block) — the 8x-unrolled body may now just bloat the program.

Interleaved A/B (weather-fair): four full16 packs (224 Adapt(Sine) + 32
Adapt(Stream) per scene) at unroll 1/2/4/8, trials round-robin, nch=40
(1880-block trials keep the ~30 ms relay floor < 10%).
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
NCH = 40
S, V, FILL = 16, 256, 2400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_pack(unroll):
    import oddio_tpu as ot
    from oddio_tpu.parallel.mesh import make_mesh
    from oddio_tpu.parallel.sharded import ScenePack

    rng = np.random.default_rng(1)

    def build(seed):
        rng2 = np.random.default_rng(seed)
        mixer = ot.Mixer(1, initial_capacity=32)
        control = ot.MixerControl(mixer)
        ctls = []
        for i in range(V):
            opt = ot.AdaptOptions(tau=0.1, max_gain=4.0)
            if i < 32:
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
    flat = [c for group in ctls for c in group]
    pcm = rng.standard_normal((len(flat), FILL)).astype(np.float32) * 0.1
    for j, ctl in enumerate(flat):
        ctl.write(pcm[j])
    return pack


def trial(pack):
    import jax.numpy as jnp

    t0 = time.time()
    for _ in range(NCH):
        blocks = pack.render_frames_device(BLOCK * CHUNK)
    total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    assert np.isfinite(total)
    return round(NCH * CHUNK * BLOCK / RATE / (time.time() - t0), 2)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    packs = {}
    for u in (1, 2, 4, 8):
        t0 = time.time()
        p = build_pack(u)
        blocks = p.render_frames_device(BLOCK * 8)
        blocks = p.render_frames_device(BLOCK * CHUNK)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        log(f"[u{u}] warmup incl. compile + fills: {time.time()-t0:.1f}s")
        packs[u] = p

    res = {u: [] for u in packs}
    for r in range(3):
        for u, p in packs.items():
            res[u].append(trial(p))
        log(f"round {r}: " + " ".join(f"u{u}={res[u][-1]}" for u in res))

    ms = {u: 10.666 / np.median(v) for u, v in res.items()}
    log("SUMMARY ms/block: "
        + " ".join(f"u{u}={ms[u]:.3f} {res[u]}" for u in res))


if __name__ == "__main__":
    main()
