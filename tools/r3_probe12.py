"""Round-3 probe v12: rows-native (V, RPV, 128) carry — the physically
linear layout — with the strided-DMA append.  If the ~1 ms carry cost was
the (V, rowlen)->rows relayout, this step should cost ~write+read."""

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
L = 16384
F = 1024
M = 1024
ROWLEN = F + L + M + 1024
EMAX2 = 36
ITERS = 32


def main(variants):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        pack_select_scalars, rows_append_dma, select_window, window_select,
    )
    from oddio_tpu.ops._dev import device_split_ds

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    blk = N / 48000.0
    RPV = ROWLEN // 128

    s512 = jnp.asarray(rng.standard_normal((V, 512)), jnp.float32)
    gain0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    d_gain = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    maskf = jnp.ones(V, jnp.float32)
    ds = jnp.asarray(rng.uniform(0.997, 1.003, (V, 2)), jnp.float32)
    ofrac = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    ds_int, f_hi, f_lo = device_split_ds(ds)
    scal = pack_select_scalars(ofrac, ds_int, f_hi, f_lo)
    extra2 = jnp.asarray(rng.integers(0, EMAX2, (V, 2)), jnp.int32)
    rstart = jnp.asarray(rng.integers(0, L - 1, (V,)).astype(np.int32))
    ring_np = (rng.standard_normal((V, RPV, 128)) * 0.1).astype(np.float32)

    PW = 128
    E2 = PW - 1 + EMAX2
    SREAD = select_window(N, E2, K)

    def write(ring, it):
        c = (it * 512) % L
        r0 = (F + c) // 128
        rm = (F + jnp.where(c < M, c + L, L + M)) // 128
        return rows_append_dma(ring, s512, r0, rm)

    def read(ring, it, tile=None):
        rows = ring.reshape(V * RPV, PW)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // PW
        ridx = (
            (jnp.arange(V, dtype=jnp.int32) * RPV)[:, None]
            + r0[:, None] + jnp.arange(SREAD // PW + 1)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, ridx, axis=0).reshape(V, SREAD + PW)
        ex = (st - r0 * PW)[:, None] + extra2
        return window_select(w[:, :SREAD], scal, gain0, d_gain, maskf, ex,
                             n=N, K=K, emax2=E2, tile=tile)[0, 0]

    bodies = {
        "noop": lambda ring, it: (ring, it.astype(jnp.float32)),
        "read": lambda ring, it: (ring, read(ring, it)),
        "read64": lambda ring, it: (ring, read(ring, it, tile=64)),
        "read16": lambda ring, it: (ring, read(ring, it, tile=16)),
        "write": lambda ring, it: (write(ring, it), it.astype(jnp.float32)),
        "step": lambda ring, it: (lambda r: (r, read(r, it)))(write(ring, it)),
        "step64": lambda ring, it: (lambda r: (r, read(r, it, tile=64)))(write(ring, it)),
    }

    def scan_of(body):
        def many(ring):
            def b(c, it):
                s, acc = c
                s, out = body(s, it)
                return (s, acc + out), None

            (s, acc), _ = jax.lax.scan(
                b, (ring, jnp.float32(0)), jnp.arange(ITERS)
            )
            return s, acc
        return many

    master = jnp.asarray(ring_np)
    dup = jax.jit(lambda x: x + 0.0)
    base = 0.0

    for v in variants:
        try:
            f = jax.jit(scan_of(bodies[v]), donate_argnums=0)
            ring = dup(master)
            t0 = time.perf_counter()
            ring, acc = f(ring)
            np.asarray(acc)
            print(f"  [{v}] compile+first: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts_ = []
            for _ in range(4):
                t0 = time.perf_counter()
                ring, acc = f(ring)
                np.asarray(acc)
                ts_.append(time.perf_counter() - t0)
            t = float(np.median(ts_)) / ITERS
            if v == "noop":
                base = t
                print(f"noop: {t*1e3:.3f} ms/block floor", flush=True)
            else:
                print(f"{v}: {t*1e3:.3f} ms/block, {(t-base)*1e3:.3f} net "
                      f"({blk/max(t-base,1e-9):.0f}x RT alone)", flush=True)
            del ring
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["noop", "read", "write", "step"])
