"""Round-4 probe v6: window_select_tiles decomposition at the production
shape (4096 voices, 512 frames, (512, 32) tier, 2-granule spans) — where
do its ~0.2 ms/block go?  Variants monkeypatch the kernel's internal
stages (gather pair, position math, coarse realign, voice mix) and A/B
the MXU voice-mix reduction, timed inside one scan per bench_kernels.py
methodology.

Usage: python tools/r4_probe6.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 4096
N = 512
K = 32
EMAX2R = 127 + 33  # sub-row remainder + inter-ear stagger (flagship)
ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args):
    import jax

    f = jax.jit(fn)
    d = f(*args)
    d.block_until_ready()
    np.asarray(d)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = f(*args)
        np.asarray(d)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from oddio_tpu.ops import pallas_ring as pr
    from oddio_tpu.ops._dev import device_split_ds

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    WIN = pr.select_window(N, EMAX2R, K)
    S2 = -(-(1023 + WIN) // 1024) * 1024
    log(f"WIN={WIN} S2={S2} W={pr.select_tables(EMAX2R, K)}")
    wide = jnp.asarray(rng.standard_normal((V, S2)), jnp.float32)
    rowshift = jnp.asarray(rng.integers(0, (S2 - WIN) // 128 + 1, V), jnp.int32)
    ds = jnp.asarray(rng.uniform(0.999, 1.001, (V, 2)), jnp.float32)
    o0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    ds_int, f_hi, f_lo = device_split_ds(ds)
    scal = pr.pack_select_scalars(o0, ds_int, f_hi, f_lo)
    g0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    dg = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    e = jnp.asarray(rng.integers(0, 33, (V, 2)), jnp.int32)
    g01 = (jnp.stack([g0[:, 0], dg[:, 0]], -1),
           jnp.stack([g0[:, 1], dg[:, 1]], -1))
    scal01 = (scal[:, 0], scal[:, 1])
    e01 = (e[:, 0:1], e[:, 1:2])

    blk = 1.0 / (N / 48000.0)

    def run(label):
        def many(wide, rowshift, s0, s1, ga, gb, e0, e1):
            def body(c, _):
                g, acc = c
                out = pr.window_select_tiles_ears(
                    wide, rowshift, (s0, s1), (g, gb), (e0, e1),
                    n=N, K=K, emax2=EMAX2R, hmax=8,
                )
                g = g.at[0, 0].add(out[0, 0] * 1e-20)
                return (g, acc + out[0, 0]), None
            (g, acc), _ = jax.lax.scan(
                body, (ga, jnp.float32(0)), None, length=ITERS
            )
            return acc + g[0, 0]

        t = timed(many, wide, rowshift, scal01[0], scal01[1],
                  g01[0], g01[1], e01[0], e01[1])
        log(f"{label:>24}: {t/ITERS*1e3:.4f} ms/block "
            f"({1/(t/ITERS)/blk:.1f}x RT alone)")
        return t / ITERS * 1e3

    results = {}
    results["full_mxu"] = run("full (MXU mix)")

    pr.SELECT_MXU_REDUCE = False
    results["full_vpu"] = run("full (VPU mix)")
    pr.SELECT_MXU_REDUCE = True

    orig_gather = pr._gather_pair

    def no_gather(w1, w1s, m, W):
        dep = 0.0 * m[:, 0:1].astype(jnp.float32)
        return w1[:, :128] + dep, w1s[:, :128] + dep

    pr._gather_pair = no_gather
    results["no_gather"] = run("no gather (6 takes)")
    pr._gather_pair = orig_gather

    orig_pos = pr._positions_sb

    def no_pos(scal, j0, SB, K):
        dep = 0.0 * scal[:, 0:1]
        kk = jnp.full((scal.shape[0], SB), np.float32(K)) + dep
        fr = jnp.full((scal.shape[0], SB), np.float32(0.5)) + dep
        return kk, fr

    pr._positions_sb = no_pos
    results["no_pos"] = run("no position math")
    pr._positions_sb = orig_pos

    orig_re = pr._realign_rows

    def no_realign(wide, b, width, H):
        return wide[:, :width] + 0.0 * b.astype(jnp.float32)

    pr._realign_rows = no_realign
    results["no_realign"] = run("no coarse realign")
    pr._realign_rows = orig_re

    f = results["full_mxu"]
    log("== window_select_tiles decomposition (ms/block) ==")
    log(f"  mix: MXU {results['full_mxu']:.4f} vs VPU {results['full_vpu']:.4f}")
    log(f"  gather leg   ~ {f - results['no_gather']:.4f}")
    log(f"  positions    ~ {f - results['no_pos']:.4f}")
    log(f"  realign      ~ {f - results['no_realign']:.4f}")


if __name__ == "__main__":
    main()
