"""r5_probe1: same-session A/B of the round-5 buffered levers on v5e.

1. The 4096-voice gentle buffered flagship with the multi-block
   superwindow dispatch ON vs OFF (one window gather + one select kernel
   per 4 blocks vs per block) — VERDICT r4 item 1a.
2. The subpass scene (64 offset-clamped voices): clamped voices now ride
   the select kernel's FROZEN branch inside the tight main pass (no
   family sub-pass, no wide side pass) — VERDICT r4 item 2 groundwork.
3. An ALL-clamped scene (every voice beyond max_delay*c): previously the
   (256, 256) demoted tier at ~12.5x; now one tight pass, all frozen.

Trials interleave OFF/ON so tunnel weather hits both arms equally.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOICES = 4096
RATE = 48000
BLOCK = 512
VCHUNK = 1504
BUCKETS = (VCHUNK, 47, 46, 12, 3, 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(kind, rng):
    import oddio_tpu as ot

    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for i in range(VOICES):
        sig = ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000))
        if kind == "gentle":
            opts = ot.SpatialOptions(
                position=rng.uniform(-15, 15, 3),
                velocity=rng.uniform(-0.2, 0.2, 3),
            )
        elif kind == "subpass":
            if i < 64:
                p = rng.uniform(100, 150, 3) * rng.choice([-1.0, 1.0], 3)
                opts = ot.SpatialOptions(position=p)
            else:
                opts = ot.SpatialOptions(
                    position=rng.uniform(-15, 15, 3),
                    velocity=rng.uniform(-0.05, 0.05, 3),
                )
        else:  # allclamped
            p = rng.uniform(100, 150, 3) * rng.choice([-1.0, 1.0], 3)
            opts = ot.SpatialOptions(position=p)
        control.play_buffered(
            sig, opts, max_distance=50.0, rate=RATE, buffer_duration=0.1
        )
    return control, scene


def trial(r, nblocks=VCHUNK):
    import jax.numpy as jnp

    t0 = time.time()
    blocks = r.render_frames_device(BLOCK * nblocks, sync=False)
    total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    assert np.isfinite(total)
    return round(nblocks * BLOCK / RATE / (time.time() - t0), 2)


def main():
    import jax

    import oddio_tpu as ot

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # --- gentle flagship, multi OFF vs ON (interleaved) ------------------
    control, scene = build("gentle", rng)
    pool = list(scene._buffered_pools.values())[0]
    r = ot.Renderer(scene, RATE, scan_buckets=BUCKETS)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all() and np.abs(first).max() > 0
    pool.MULTI_NB = 0
    trial(r)  # compiles the per-block wide scan
    log(f"[gentle] warmup OFF incl. compile: {time.time()-t0:.1f}s")
    t0 = time.time()
    pool.MULTI_NB = 4
    trial(r)  # compiles the multi scan
    log(f"[gentle] warmup ON incl. compile: {time.time()-t0:.1f}s "
        f"multi_steps={[k[1] for k in r._steps]}")
    offs, ons = [], []
    for _ in range(3):
        pool.MULTI_NB = 0
        offs.append(trial(r))
        pool.MULTI_NB = 4
        ons.append(trial(r))
    log(f"[gentle] OFF {offs} / ON {ons} x RT")

    # --- subpass scene (64 clamped -> frozen branch) ----------------------
    control, scene = build("subpass", rng)
    r = ot.Renderer(scene, RATE, scan_buckets=BUCKETS)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    trial(r)
    (tiers,) = control.read_tiers().values()
    log(f"[subpass] warmup incl. compile: {time.time()-t0:.1f}s tiers={tiers}")
    sp = [trial(r) for _ in range(3)]
    log(f"[subpass] trials {sp} x RT")

    # --- all-clamped scene (4096 frozen voices) ---------------------------
    control, scene = build("allclamped", rng)
    r = ot.Renderer(scene, RATE, scan_buckets=BUCKETS)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    trial(r)
    (tiers,) = control.read_tiers().values()
    log(f"[allclamped] warmup incl. compile: {time.time()-t0:.1f}s tiers={tiers}")
    ac = [trial(r) for _ in range(3)]
    log(f"[allclamped] trials {ac} x RT")

    log(f"SUMMARY gentle_off={offs} gentle_on={ons} subpass={sp} "
        f"allclamped={ac}")


if __name__ == "__main__":
    main()
