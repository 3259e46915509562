"""Round-3 probe v11: is the gather+write carry copy proportional to ring
size?  step (write kernel + rows-gather + select) at three ring lengths."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 4096
N = 512
K = 64
F = 1024
M = 1024
EMAX2 = 36
ITERS = 32


def main():
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        flat_append_aligned, pack_select_scalars, select_window,
        window_select,
    )
    from oddio_tpu.ops._dev import device_split_ds

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    blk = N / 48000.0

    s512 = jnp.asarray(rng.standard_normal((V, 512)), jnp.float32)
    gain0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    d_gain = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    maskf = jnp.ones(V, jnp.float32)
    ds = jnp.asarray(rng.uniform(0.997, 1.003, (V, 2)), jnp.float32)
    ofrac = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    ds_int, f_hi, f_lo = device_split_ds(ds)
    scal = pack_select_scalars(ofrac, ds_int, f_hi, f_lo)
    extra2 = jnp.asarray(rng.integers(0, EMAX2, (V, 2)), jnp.int32)

    for L in (16384, 8192, 2048):
        ROWLEN = F + L + M + 1024
        PW = 128
        RPV = ROWLEN // PW
        E2 = PW - 1 + EMAX2
        SREAD = select_window(N, E2, K)
        rstart = jnp.asarray(rng.integers(0, L - 1, (V,)).astype(np.int32))
        flat_np = (rng.standard_normal((V, ROWLEN)) * 0.1).astype(np.float32)

        def step(ring, it, L=L, RPV=RPV, rstart=rstart):
            c = (it * 512) % L
            pcol = (F + c) // 512
            pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
            ring = flat_append_aligned(ring, s512, pcol, pmir)
            rows = ring.reshape(V * RPV, PW)
            st = jnp.mod(rstart + it, L) + F
            r0 = st // PW
            ridx = (
                (jnp.arange(V, dtype=jnp.int32) * RPV)[:, None]
                + r0[:, None] + jnp.arange(SREAD // PW + 1)[None, :]
            ).reshape(-1)
            w = jnp.take(rows, ridx, axis=0).reshape(V, SREAD + PW)
            ex = (st - r0 * PW)[:, None] + extra2
            out = window_select(w[:, :SREAD], scal, gain0, d_gain, maskf,
                                ex, n=N, K=K, emax2=E2)
            return ring, out[0, 0]

        def many(ring):
            def b(c, it):
                s, acc = c
                s, out = step(s, it)
                return (s, acc + out), None

            (s, acc), _ = jax.lax.scan(
                b, (ring, jnp.float32(0)), jnp.arange(ITERS)
            )
            return s, acc

        try:
            f = jax.jit(many, donate_argnums=0)
            ring = jnp.asarray(flat_np)
            t0 = time.perf_counter()
            ring, acc = f(ring)
            np.asarray(acc)
            print(f"  [L={L}] compile+first: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts_ = []
            for _ in range(4):
                t0 = time.perf_counter()
                ring, acc = f(ring)
                np.asarray(acc)
                ts_.append(time.perf_counter() - t0)
            t = float(np.median(ts_)) / ITERS
            print(f"L={L} (ring {V*ROWLEN*4/1e6:.0f} MB): {t*1e3:.3f} "
                  f"ms/block ({blk/t:.1f}x RT alone)", flush=True)
            del ring
        except Exception as ex:
            print(f"L={L}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
