"""r5_probe6: strip_resample voice-tile parity A/B on the REAL TPU.

r5_probe5 measured the adaptive (wide) voice tile 27% faster on stream
drains, but on the CPU-interpret build a tile-16 variant's output in the
full fused stream-pool program diverged ~2e-5 from tile-8 — deterministic,
unreproducible in any isolation (kernel alone bit-exact, eager replay of
the captured traced inputs bit-exact), i.e. an XLA:CPU fused-program
rewrite artifact.  On TPU the kernel is a Mosaic binary whose per-voice
math is tile-independent, so the divergence should not exist there.

This probe PROVES (or refutes) TPU-cleanliness: it renders the same two
fused stream programs — 64 prefilled Streams in a Mixer (the DR
stream-pool read leg) and the same streams spatialized via play_buffered
(strip_resample under the ring pipeline) — in two subprocesses, one per
ODDIO_RESAMPLE_TILE setting, on the real TPU, and cross-compares the
audio sample-for-sample.  Pass bar: max|a-b| <= 1e-6 on both programs
(the same gate test_scenepack_dr_stream_ingest applies on CPU).
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 48000
BLOCK = 512
NV = 64
FILL = 4 * RATE
NBLOCKS = 24  # 12288 frames per program


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(kind):
    import oddio_tpu as ot

    rng = np.random.default_rng(7)
    if kind == "mix":
        control, scene = ot.Mixer.new(channels=1)
    else:
        control, scene = ot.SpatialScene.new(initial_capacity=NV)
    ctls = []
    for _ in range(NV):
        pos = rng.uniform(-20, 20, 3)
        ctl, sig = ot.Stream.new(RATE, FILL + RATE // 4)
        ctls.append(ctl)
        if kind == "mix":
            control.play(sig)
        else:
            control.play_buffered(
                sig, ot.SpatialOptions(position=pos),
                max_distance=50.0, rate=RATE, buffer_duration=0.1,
            )
    data = rng.standard_normal((NV, FILL)).astype(np.float32) * 0.05
    for j, ctl in enumerate(ctls):
        ctl.write(data[j])
    return control, scene


def dump(tag):
    import jax

    import oddio_tpu as ot

    log(f"devices: {jax.devices()}  tile={os.environ.get('ODDIO_RESAMPLE_TILE', '(default)')}")
    for kind in ("mix", "spatial"):
        _, scene = build(kind)
        r = ot.Renderer(scene, RATE)
        out = np.asarray(r.render_frames(BLOCK * NBLOCKS))
        assert np.isfinite(out).all(), kind
        np.save(f"/tmp/r5p6_{kind}_{tag}.npy", out)
        log(f"[{kind}/{tag}] out {out.shape} rms={float(np.sqrt((out**2).mean())):.6f}")


def main():
    here = os.path.abspath(__file__)
    for tag, tile in (("t8", ""), ("adaptive", "adaptive")):
        env = dict(os.environ)
        if tile:
            env["ODDIO_RESAMPLE_TILE"] = tile
        else:
            env.pop("ODDIO_RESAMPLE_TILE", None)
        log(f"=== subprocess: tile={tile or '(default 8)'} ===")
        subprocess.run([sys.executable, here, "dump", tag], env=env, check=True,
                       timeout=2400)
    for kind in ("mix", "spatial"):
        a = np.load(f"/tmp/r5p6_{kind}_t8.npy")
        b = np.load(f"/tmp/r5p6_{kind}_adaptive.npy")
        d = float(np.abs(a - b).max())
        rms = float(np.sqrt((a**2).mean()))
        log(f"SUMMARY {kind}: max|t8-adaptive|={d:.3e} (rms {rms:.4f}) "
            f"{'PASS' if d <= 1e-6 else 'FAIL'}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dump":
        dump(sys.argv[2])
    else:
        main()
