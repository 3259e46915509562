"""Round-3 probe v4: does lax.scan copy a large carry per iteration, and
what does the production-shaped buffered step cost inside/outside scan?

  scan_noop    scan(30) over the 302 MB ring, body = at[0,0].add(1)
  scan_step    scan(30), body = append kernel + rows128 gather + select
  unroll_step  the same body python-unrolled 30x in one jit
  scan_read    scan(30), body = rows128 gather + select only

Times are per iteration; per-call overhead (~32 ms relay floor) amortizes
over ITERS=30.
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
SREAD = 768
EMAX2 = 36
ITERS = 30


def main(variants):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        flat_append_aligned, pack_select_scalars, window_select,
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
    rstart = jnp.asarray(rng.integers(0, L - 1, (V,)).astype(np.int32))
    flat_np = (rng.standard_normal((V, ROWLEN)) * 0.1).astype(np.float32)

    def write(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        return flat_append_aligned(ring, s512, pcol, pmir)

    def read(ring, it):
        rows = ring.reshape(V * (ROWLEN // 128), 128)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 128
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 128))[:, None]
            + r0[:, None] + jnp.arange(7)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 7 * 128)
        return window_select(w[:, :SREAD], scal, gain0, d_gain, maskf,
                             extra2, n=N, K=K)

    def step(ring, it):
        ring = write(ring, it)
        out = read(ring, it)
        return ring, out[0, 0]

    def noop(ring, it):
        return ring.at[0, 0].add(1.0), ring[0, 1]

    def read_only(ring, it):
        out = read(ring, it)
        return ring, out[0, 0]

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

    def unroll_of(body):
        def many(ring):
            acc = jnp.float32(0)
            for i in range(ITERS):
                ring, out = body(ring, jnp.int32(i))
                acc = acc + out
            return ring, acc
        return many

    fns = {
        "scan_noop": scan_of(noop),
        "scan_step": scan_of(step),
        "scan_read": scan_of(read_only),
        "unroll_step": unroll_of(step),
        "unroll_noop": unroll_of(noop),
    }

    master = jnp.asarray(flat_np)
    dup = jax.jit(lambda x: x + 0.0)

    for v in variants:
        try:
            f = jax.jit(fns[v], donate_argnums=0)
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
            print(f"{v}: {t*1e3:.3f} ms/block ({blk/t:.1f}x RT alone)",
                  flush=True)
            del ring
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "scan_noop", "unroll_noop", "scan_read", "scan_step", "unroll_step",
    ])
