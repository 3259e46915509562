"""Round-3 probe v7: kill the ~1 ms copy a scan body pays when it both
writes and reads the ring carry (probe6: order-independent, DUS and pallas
alike).  Candidates keep the carry in ROW layout and write via row
scatters (round-2's production shape never showed the copy).

  noop            floor
  step_sliceread  pallas write + static-slice read   (is ANY read enough?)
  step_rows128    carry (V*152,128): page scatter (8 rows/voice) +
                  7-row gather + select(W=512)
  step_rows512    carry (V*38,512): page scatter (2 rows/voice) +
                  3-row gather + select(W=896)
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
K = 64
L = 16384
F = 1024
M = 1024
ROWLEN = F + L + M + 1024
EMAX2 = 36
ITERS = 30


def main(variants):
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
    rstart_np = rng.integers(0, L - 1, (V,)).astype(np.int32)
    rstart = jnp.asarray(rstart_np)
    flat_np = (rng.standard_normal((V, ROWLEN)) * 0.1).astype(np.float32)

    def write_k(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        return flat_append_aligned(ring, s512, pcol, pmir)

    def sel(w, emax2):
        return window_select(w, scal, gain0, d_gain, maskf, extra2, n=N,
                             K=K, emax2=emax2)

    bodies = {}
    bodies["noop"] = lambda ring, it: (ring, it.astype(jnp.float32))

    def step_sliceread(ring, it):
        ring = write_k(ring, it)
        return ring, jnp.sum(jax.lax.dynamic_slice(ring, (0, 5000), (V, 128)))

    bodies["step_sliceread"] = step_sliceread

    def mk_rows(PW):
        RPV = ROWLEN // PW
        nwr = 512 // PW  # rows per written page
        S128 = select_window(N, PW - 1 + EMAX2, K)
        n_rows_r = -(-S128 // PW) + 1

        def step(rows, it):
            c = (it * 512) % L
            p0 = (F + c) // PW
            pm = (F + jnp.where(c < M, c + L, L + M)) // PW
            vb = jnp.arange(V, dtype=jnp.int32) * RPV
            widx = jnp.concatenate([
                (vb[:, None] + p0 + jnp.arange(nwr)[None, :]).reshape(-1),
                (vb[:, None] + pm + jnp.arange(nwr)[None, :]).reshape(-1),
            ])
            vals = s512.reshape(V * nwr, PW)
            rows = rows.at[widx].set(jnp.concatenate([vals, vals]))
            st = jnp.mod(rstart + it, L) + F
            r0 = st // PW
            ridx = (
                (vb[:, None]) + r0[:, None] + jnp.arange(n_rows_r)[None, :]
            ).reshape(-1)
            w = jnp.take(rows, ridx, axis=0).reshape(V, n_rows_r * PW)
            ex = (st - r0 * PW)[:, None] + extra2
            out = window_select(
                w[:, : select_window(N, PW - 1 + EMAX2, K)], scal, gain0,
                d_gain, maskf, ex, n=N, K=K, emax2=PW - 1 + EMAX2,
            )
            return rows, out[0, 0]

        return step

    bodies["step_rows128"] = mk_rows(128)
    bodies["step_rows512"] = mk_rows(512)

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

    master = jnp.asarray(flat_np)
    dup = {
        "flat": jax.jit(lambda x: x + 0.0),
        128: jax.jit(lambda x: (x + 0.0).reshape(V * (ROWLEN // 128), 128)),
        512: jax.jit(lambda x: (x + 0.0).reshape(V * (ROWLEN // 512), 512)),
    }
    base = 0.0

    for v in variants:
        try:
            f = jax.jit(scan_of(bodies[v]), donate_argnums=0)
            kind = 128 if v.endswith("128") else 512 if v.endswith("512") else "flat"
            ring = dup[kind](master)
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
    main(sys.argv[1:] or [
        "noop", "step_sliceread", "step_rows128", "step_rows512",
    ])
