"""Round-3 probe v14: velocity-informed doppler-walk bound K.  The select
kernel's lookup tables span emax2 + SB + 2K + 1 lanes; K=64 (±43 m/s radial)
forces 4 gather columns per lane where K<=16 (±10.7 m/s — the flagship
bench's actual motion range) fits in 3.  This measures window_select_tiles
(the production read path) at K in {64, 32, 16} and the full write+read
step for each, on the flagship shapes (4096 voices, 512-frame blocks)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = int(os.environ.get("PROBE_V", "4096"))
N = 512
L = 16384
F = 1024
M = 1024
ROWLEN = F + L + M + 1024
EMAX2 = 36
ITERS = int(os.environ.get("PROBE_ITERS", "32"))


def main(variants):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        pack_select_scalars, rows_append_dma, select_window,
        window_select_tiles,
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
    vb = jnp.arange(V, dtype=jnp.int32)

    def write(ring, it):
        c = (it * 512) % L
        r0 = (F + c) // 128
        rm = (F + jnp.where(c < M, c + L, L + M)) // 128
        return rows_append_dma(ring, s512, r0, rm)

    def read_tiles(ring, it, K):
        GW = 8 * PW
        e2 = PW - 1 + EMAX2
        WIN = select_window(N, e2, K)
        ngr = (1023 + WIN - 1) // GW + 1
        rows8 = ring.reshape(V * (RPV // 8), 8, PW)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // GW
        ridx = (
            (vb * (RPV // 8))[:, None] + r0[:, None]
            + jnp.arange(ngr, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        wide = jnp.take(rows8, ridx, axis=0).reshape(V, ngr * GW)
        rowshift = (st - r0 * GW) // PW
        ex = jnp.mod(st, PW)[:, None] + extra2
        return window_select_tiles(wide, rowshift, scal, gain0, d_gain,
                                   maskf, ex, n=N, K=K, emax2=e2,
                                   hmax=GW // PW)[0, 0]

    bodies = {
        "noop": lambda ring, it: (ring, it.astype(jnp.float32)),
        "readc64": lambda ring, it: (ring, read_tiles(ring, it, 64)),
        "readc32": lambda ring, it: (ring, read_tiles(ring, it, 32)),
        "readc16": lambda ring, it: (ring, read_tiles(ring, it, 16)),
        "stepc64": lambda ring, it: (lambda r: (r, read_tiles(r, it, 64)))(write(ring, it)),
        "stepc16": lambda ring, it: (lambda r: (r, read_tiles(r, it, 16)))(write(ring, it)),
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
            print(f"{v}: FAILED {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["noop", "readc64", "readc16", "readc32",
                          "stepc64", "stepc16"])
