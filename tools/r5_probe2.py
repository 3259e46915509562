"""r5_probe2: scenepack per-block cost decomposition (VERDICT r4 item 3).

The 16x256 pack measured 11.8x per scene = ~0.90 ms/block for the whole
pack.  Same-session variants split that into: the Adapt EMA scan leg, the
stream cursor/ingest leg, and the pack-scan overhead vs a lone 256-voice
scene (known ~660x with a plain Renderer).

  full16    16 scenes of 32 Adapt(Stream) + 224 Adapt(Sine)   (baseline)
  nostream  16 scenes of 256 Adapt(Sine)                      (- streams)
  noagc     16 scenes of 256 plain Sine                       (- Adapt)
  lone      one 256-voice Adapt(Sine+Stream) scene, Renderer  (no pack)
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


def build_pack(kind):
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
            if kind == "full16" and i < NS:
                stream = ot.Stream(8000, FILL + 128, max_write_per_block=FILL)
                ctls.append(stream.control)
                control.play(ot.Adapt(stream, 0.1, opt))
            elif kind == "noagc":
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


def rate_pack(pack, label, ntrials=3, nch=4):
    import jax.numpy as jnp

    t0 = time.time()
    blocks = pack.render_frames_device(BLOCK * 8)
    blocks = pack.render_frames_device(BLOCK * CHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup incl. compile: {time.time()-t0:.1f}s")
    audio = nch * CHUNK * BLOCK / RATE
    out = []
    for _ in range(ntrials):
        t0 = time.time()
        for _ in range(nch):
            blocks = pack.render_frames_device(BLOCK * CHUNK)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        out.append(round(audio / (time.time() - t0), 2))
    log(f"[{label}] trials {out} x RT per scene "
        f"(= {10.666/np.median(out):.3f} ms/block for the whole pack)")
    return out


def lone_scene():
    import jax.numpy as jnp

    import oddio_tpu as ot

    rng2 = np.random.default_rng(99)
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
                ot.Sine(rng2.uniform(0, 6), rng2.uniform(50, 2000)), 0.1, opt,
            ))
    pcm = np.random.default_rng(5).standard_normal((NS, FILL)).astype(np.float32) * 0.1
    for j, ctl in enumerate(ctls):
        ctl.write(pcm[j])
    r = ot.Renderer(mixer, RATE, scan_unroll=8)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * CHUNK * 4)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[lone] warmup incl. compile: {time.time()-t0:.1f}s")
    out = []
    for _ in range(3):
        t0 = time.time()
        blocks = r.render_frames_device(BLOCK * CHUNK * 4, sync=False)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        out.append(round(CHUNK * 4 * BLOCK / RATE / (time.time() - t0), 2))
    log(f"[lone] trials {out} x RT "
        f"(= {10.666/np.median(out):.4f} ms/block for one scene)")
    return out


def main():
    import jax

    log(f"devices: {jax.devices()}")
    full = rate_pack(build_pack("full16"), "full16")
    nostream = rate_pack(build_pack("nostream"), "nostream")
    noagc = rate_pack(build_pack("noagc"), "noagc")
    lone = lone_scene()
    log(f"SUMMARY full16={full} nostream={nostream} noagc={noagc} "
        f"lone={lone}")


if __name__ == "__main__":
    main()
