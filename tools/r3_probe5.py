"""Round-3 probe v5: hazard-free per-op costs inside scan (v4's noop read
the pre-update carry, forcing a 302 MB copy per iteration — every number
was inflated by ~0.93 ms).

  noop          body returns the carry untouched
  write_kernel  flat_append_aligned only
  write_dus     2x dynamic_update_slice only
  gather        rows128 window gather only
  select        window_select on a static window slice only
  read          gather + select
  step          write_kernel + read   (the production-shaped block)
  step_dus      write_dus + read
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

    def write_k(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        return flat_append_aligned(ring, s512, pcol, pmir)

    def write_d(ring, it):
        c = F + (it * 512) % L
        ring = jax.lax.dynamic_update_slice(ring, s512, (0, c))
        c2 = F + jnp.where(c - F < M, c - F + L, L + M)
        return jax.lax.dynamic_update_slice(ring, s512, (0, c2))

    def gather(ring, it):
        rows = ring.reshape(V * (ROWLEN // 128), 128)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 128
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 128))[:, None]
            + r0[:, None] + jnp.arange(7)[None, :]
        ).reshape(-1)
        return jnp.take(rows, idx, axis=0).reshape(V, 7 * 128)

    def select(w):
        return window_select(w[:, :SREAD], scal, gain0, d_gain, maskf,
                             extra2, n=N, K=K)

    bodies = {
        "noop": lambda ring, it: (ring, it.astype(jnp.float32)),
        "write_kernel": lambda ring, it: (write_k(ring, it), it.astype(jnp.float32)),
        "write_dus": lambda ring, it: (write_d(ring, it), it.astype(jnp.float32)),
        "gather": lambda ring, it: (ring, jnp.sum(gather(ring, it)[:, 0])),
        "select": lambda ring, it: (
            ring, select(jax.lax.dynamic_slice(ring, (0, 0), (V, 896))
                         + it.astype(jnp.float32) * 1e-12)[0, 0]
        ),
        "read": lambda ring, it: (ring, select(gather(ring, it))[0, 0]),
    }

    def step(ring, it):
        ring = write_k(ring, it)
        return ring, select(gather(ring, it))[0, 0]

    def step_dus(ring, it):
        ring = write_d(ring, it)
        return ring, select(gather(ring, it))[0, 0]

    bodies["step"] = step
    bodies["step_dus"] = step_dus

    def step_ro(ring, it):
        out = select(gather(ring, it))[0, 0]
        ring = write_k(ring, it)
        return ring, out

    def step_1dus(ring, it):
        c = F + (it * 512) % L
        ring = jax.lax.dynamic_update_slice(ring, s512, (0, c))
        return ring, select(gather(ring, it))[0, 0]

    bodies["step_ro"] = step_ro
    bodies["step_1dus"] = step_1dus

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
    main(sys.argv[1:] or [
        "noop", "write_kernel", "write_dus", "gather", "select", "read",
        "step", "step_dus",
    ])
