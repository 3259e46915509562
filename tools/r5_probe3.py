"""r5_probe3: streams_spatial (64-voice buffered stream drain, 70x in
BENCH_r04) decomposition — VERDICT r4 item 4.

Same-session variants split the drain block cost into the buffered-ring
leg, the stream-cursor leg, and the per-dispatch floor:

  drain      64 prefilled Stream voices, play_buffered   (the bench line)
  sine_buf   64 Sine voices, same positions, play_buffered  (- streams)
  drain_mix  64 prefilled Stream voices in a Mixer      (- spatial rings)
  width      drain at 2x/4x dispatch widths              (dispatch floor)
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
NV = 64
FILL = 24 * RATE  # 24 s per stream so width sweeps have room to drain


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(kind):
    import oddio_tpu as ot

    rng = np.random.default_rng(0)
    if kind == "drain_mix":
        control, scene = ot.Mixer.new(channels=1)
    else:
        control, scene = ot.SpatialScene.new(initial_capacity=NV)
    ctls = []
    for _ in range(NV):
        pos = rng.uniform(-20, 20, 3)
        if kind == "sine_buf":
            sig = ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000))
        else:
            ctl, sig = ot.Stream.new(RATE, FILL + RATE // 4)
            ctls.append(ctl)
        if kind == "drain_mix":
            control.play(sig)
        else:
            control.play_buffered(
                sig, ot.SpatialOptions(position=pos),
                max_distance=50.0, rate=RATE, buffer_duration=0.1,
            )
    if ctls:
        data = rng.standard_normal((NV, FILL)).astype(np.float32) * 0.05
        for j, ctl in enumerate(ctls):
            ctl.write(data[j])
    return control, scene


def drain_rate(scene, label, width, nch, unroll=4):
    import jax.numpy as jnp

    import oddio_tpu as ot

    r = ot.Renderer(scene, RATE, scan_buckets=(width, CHUNK, 12, 3, 1),
                    scan_unroll=unroll)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * width)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup incl. compile: {time.time()-t0:.1f}s")
    blocks = r.render_frames_device(BLOCK * width, sync=False)  # pipeline fill
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    t0 = time.time()
    for _ in range(nch):
        blocks = r.render_frames_device(BLOCK * width, sync=False)
    total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    assert np.isfinite(total)
    xrt = round(nch * width * BLOCK / RATE / (time.time() - t0), 2)
    log(f"[{label}] drain {xrt}x RT "
        f"(= {10.666/xrt:.4f} ms/block)")
    return xrt


def main():
    import jax

    log(f"devices: {jax.devices()}")
    _, sc = build("drain")
    a = drain_rate(sc, "drain w94", CHUNK * 2, 6)
    _, sc = build("drain")
    a2 = drain_rate(sc, "drain w188", CHUNK * 4, 3)
    _, sc = build("sine_buf")
    b = drain_rate(sc, "sine_buf w94", CHUNK * 2, 6)
    _, sc = build("drain_mix")
    c = drain_rate(sc, "drain_mix w94", CHUNK * 2, 6)
    log(f"SUMMARY drain94={a} drain188={a2} sine_buf={b} mix={c}")


if __name__ == "__main__":
    main()
