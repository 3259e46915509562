"""r5_probe9b: compile-check + honest timing of the fused AGC kernel on
real TPU.  (r5_probe9's 100-iter scans measured the ~0.3 ms relay RTT
floor, not the ops — the r3 lesson again; this uses 2000-iter scans so
the floor contributes < 0.2 us/block.)

Compares ops/adapt.py::_ema_gain (associative scan) vs
ops/pallas_agc.py::agc_gains at the scenepack shapes: rows = S*V of the
main (4096) and second (512) pools, plus vmapped (16, 32, 512) — the
exact ScenePack form.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 512
ITERS = 2000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oddio_tpu.ops.adapt import _ema_gain
    from oddio_tpu.ops.pallas_agc import agc_gains, pack_agc_scalars

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    blk = N / 48000.0

    def assoc(avg, s, alpha, count, low, high, mg):
        return _ema_gain(avg, s, alpha, count, low, high, mg, N)

    def kern(avg, s, alpha, count, low, high, mg):
        scal = pack_agc_scalars(avg, alpha, count, low, high, mg)
        return agc_gains(s, scal, n=N, interpret=False)

    for R, vm in ((512, False), (4096, False), ((16, 32), True)):
        shape = R if vm else (R,)
        s = jnp.asarray(rng.standard_normal(shape + (N,)) * 0.3, jnp.float32)
        alpha = jnp.full(shape, np.float32(1 - np.exp(-1 / 48000 / 0.1)))
        count = jnp.full(shape, N, jnp.int32)
        low = jnp.full(shape, np.float32(0.1 / np.sqrt(2)))
        high = jnp.full(shape, np.float32(0.5 / np.sqrt(2)))
        mg = jnp.full(shape, np.float32(4.0))
        avg0 = jnp.full(shape, np.float32(0.01))

        outs = {}
        for label, ema in (("assoc", assoc), ("kernel", kern)):
            f0 = jax.vmap(ema, in_axes=(0,) * 7) if vm else ema

            def many(avg0, s):
                def body(c, _):
                    avg, acc = c
                    g, avg2 = f0(avg, s, alpha, count, low, high, mg)
                    return (avg2, acc + g[..., -1].sum()), None

                (avg, acc), _ = jax.lax.scan(
                    body, (avg0, jnp.float32(0)), None, length=ITERS
                )
                return avg, acc

            f = jax.jit(many)
            t0 = time.time()
            av, acc = f(avg0, s)
            float(np.asarray(acc))
            comp = time.time() - t0
            g1, _ = jax.jit(lambda a, b: f0(a, b, alpha, count, low, high,
                                            mg))(avg0, s)
            outs[label] = np.asarray(g1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                av, acc = f(avg0, s)
                float(np.asarray(acc))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts)) / ITERS
            log(f"R={R} {label:>7}: {t*1e6:.2f} us/block "
                f"({blk/t:.0f}x RT alone) [first call {comp:.0f}s]")
        err = float(np.max(np.abs(outs["assoc"] - outs["kernel"])))
        log(f"R={R} max|dgain| kernel vs assoc = {err:.3g}")


if __name__ == "__main__":
    main()
