"""r5_probe4: buffered_mixed (±5 m/s drift across the clamp boundary)
under the round-5 frozen branch — the VERDICT item-2 done-bar check
(>= 0.8 x buffered_xrt), plus churn diagnostics: how often the O(V) host
walk sweep runs, how often sub-pass membership ships, and the tier
transition log."""

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


def main():
    import jax
    import jax.numpy as jnp

    import oddio_tpu as ot

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(1)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for _ in range(VOICES):
        control.play_buffered(
            ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000)),
            ot.SpatialOptions(position=rng.uniform(-30, 30, 3),
                              velocity=rng.uniform(-5, 5, 3)),
            max_distance=50.0, rate=RATE, buffer_duration=0.1,
        )
    pool = list(scene._buffered_pools.values())[0]

    # instrument: count O(V) sweeps and membership ships
    counters = {"sweep": 0, "pv": 0}
    orig_wb = pool._walk_bound
    orig_pv = pool._per_voice_bounds

    def wb(*a, **k):
        counters["sweep"] += 1
        return orig_wb(*a, **k)

    def pv(*a, **k):
        counters["pv"] += 1
        return orig_pv(*a, **k)

    pool._walk_bound = wb
    pool._per_voice_bounds = pv

    r = ot.Renderer(scene, RATE, scan_buckets=BUCKETS)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    for b in (47, 12, 3, 1):
        r.render_frames_device(BLOCK * b)
    blocks = r.render_frames_device(BLOCK * VCHUNK)
    blocks = r.render_frames_device(BLOCK * VCHUNK)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[mixed] warmup incl. compile: {time.time()-t0:.1f}s")
    # warm transition trial (voices cross regimes, programs compile)
    t0 = time.time()
    blocks = r.render_frames_device(BLOCK * VCHUNK, sync=False)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[mixed warm] {VCHUNK*BLOCK/RATE/(time.time()-t0):.1f}x RT")
    (tiers,) = control.read_tiers().values()
    log(f"[mixed] tiers={tiers}")
    control.tier_events()
    counters["sweep"] = counters["pv"] = 0
    trials = []
    t_host = 0.0
    for _ in range(3):
        t0 = time.time()
        blocks = r.render_frames_device(BLOCK * VCHUNK, sync=False)
        total = float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        assert np.isfinite(total)
        trials.append(round(VCHUNK * BLOCK / RATE / (time.time() - t0), 2))
    scene.sync()
    (tiers,) = control.read_tiers().values()
    ev = control.tier_events()
    nev = sum(len(v) for v in ev.values())
    log(f"[mixed] trials {trials} x RT; sweeps={counters['sweep']} "
        f"pv_sweeps={counters['pv']} over {3*VCHUNK} blocks; "
        f"tier_events={nev}; tiers={tiers}")
    for pname, evs in ev.items():
        view = "; ".join(f"t={t:.1f} cfg={c} sub={s} n={l}"
                         for t, c, s, l in evs[:8])
        log(f"[mixed] transitions({pname}): {view} ...")
    # host-prepare cost in this regime (sweep amortization check)
    t0 = time.time()
    for _ in range(200):
        scene.host_prepare(np.float32(1.0 / RATE), BLOCK)
    t_host = (time.time() - t0) / 200
    log(f"[mixed] host_prepare: {t_host*1e3:.3f} ms/block "
        f"(device step budget is ~0.43 ms)")
    log(f"SUMMARY mixed={trials}")


if __name__ == "__main__":
    main()
