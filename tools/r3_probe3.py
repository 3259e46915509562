"""Round-3 probe v3: scan-free timings (the v2 scan harness appears to
copy the 302 MB carry every iteration, flooring every variant at ~1.1 ms).

Each variant is ONE jitted call with U=8 unrolled, data-dependent reps and
a donated ring; per-rep time = (t_call - t_noop) / U.

Usage: python tools/r3_probe3.py [variant ...]
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
N_INNER = N + 1
F = 1024
M = 1024
ROWLEN = F + L + M + 1024
SREAD = 768
EMAX2 = 36
U = 8


def main(variants):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        flat_append_aligned, pack_select_scalars, strip_select, window_select,
    )
    from oddio_tpu.ops._dev import device_split_ds

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    blk = N / 48000.0

    samples = jnp.asarray(rng.standard_normal((V, N_INNER)), jnp.float32)
    s512 = samples[:, :512]
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
    # old-layout read inputs
    ROW = 256
    emax_old = ROW + 33
    extra_old = jnp.asarray(rng.integers(0, emax_old - 2, (V, 2)), jnp.int32)

    def mk(body):
        def run(ring, t):
            acc = jnp.float32(0)
            for i in range(U):
                ring, out = body(ring, t + jnp.int32(i))
                acc = acc + out
            return ring, acc
        return jax.jit(run, donate_argnums=0)

    def noop(ring, it):
        return ring, ring[0, 0] + it.astype(jnp.float32)

    def dus(ring, it):
        c = F + (it * 2048) % L
        ring = jax.lax.dynamic_update_slice(ring, samples, (0, c))
        c2 = F + jnp.where(c - F < M, c - F + L, L + M)
        ring = jax.lax.dynamic_update_slice(ring, samples, (0, c2))
        return ring, ring[0, 0]

    def kernel(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        ring = flat_append_aligned(ring, s512, pcol, pmir)
        return ring, ring[0, 0]

    def gather_dyn(ring, it):
        st = jnp.mod(rstart + it, L) + F
        w = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (SREAD,))
        )(ring, st)
        return ring, jnp.sum(w[:, 0])

    def gather_rows128(ring, it):
        rows = ring.reshape(V * (ROWLEN // 128), 128)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 128
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 128))[:, None]
            + r0[:, None] + jnp.arange(7)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 7 * 128)
        return ring, jnp.sum(w[:, 0])

    def gather_rows256(ring, it):
        rows = ring.reshape(V * (ROWLEN // 256), 256)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 256
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 256))[:, None]
            + r0[:, None] + jnp.arange(5)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 5 * 256)
        return ring, jnp.sum(w[:, 0])

    def gather_rows512(ring, it):
        rows = ring.reshape(V * (ROWLEN // 512), 512)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 512
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 512))[:, None]
            + r0[:, None] + jnp.arange(3)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 3 * 512)
        return ring, jnp.sum(w[:, 0])

    def select(ring, it):
        w = jax.lax.dynamic_slice(ring, (0, 0), (V, SREAD))
        w = w + it.astype(jnp.float32) * 1e-9
        out = window_select(w, scal, gain0, d_gain, maskf, extra2, n=N, K=K)
        return ring, out[0, 0]

    def select_old(ring, it):
        S_old = 1280
        w = jax.lax.dynamic_slice(ring, (0, 0), (V, S_old))
        w = w + it.astype(jnp.float32) * 1e-9
        out = strip_select(w, scal, gain0, d_gain, maskf, extra_old, n=N, K=K,
                           emax=emax_old)
        return ring, out[0, 0]

    def step(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        ring = flat_append_aligned(ring, s512, pcol, pmir)
        rows = ring.reshape(V * (ROWLEN // 128), 128)
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 128
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * (ROWLEN // 128))[:, None]
            + r0[:, None] + jnp.arange(7)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 7 * 128)
        out = window_select(w[:, :SREAD], scal, gain0, d_gain, maskf, extra2,
                            n=N, K=K)
        return ring, out[0, 0]

    fns = {
        "noop": noop, "dus": dus, "kernel": kernel,
        "gather_dyn": gather_dyn, "gather_rows128": gather_rows128,
        "gather_rows256": gather_rows256, "gather_rows512": gather_rows512,
        "select": select, "select_old": select_old, "step": step,
    }

    # ONE host->device upload; per-variant states are device-side copies
    # (the relay tunnel makes re-uploads minutes each)
    master = jnp.asarray(flat_np)
    dup = jax.jit(lambda x: x + 0.0)

    base = None
    for v in variants:
        try:
            f = mk(fns[v])
            ring = dup(master)
            t0 = time.perf_counter()
            ring, acc = f(ring, jnp.int32(0))
            np.asarray(acc)
            print(f"  [{v}] compile+first: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts_ = []
            for t in range(1, 6):
                t0 = time.perf_counter()
                ring, acc = f(ring, jnp.int32(t * U))
                np.asarray(acc)
                ts_.append(time.perf_counter() - t0)
            tt = float(np.median(ts_))
            per = tt / U
            if v == "noop":
                base = tt
                print(f"noop: {tt*1e3:.3f} ms/call (overhead floor)",
                      flush=True)
            else:
                net = (tt - (base or 0.0)) / U
                print(f"{v}: {per*1e3:.3f} ms/rep raw, {net*1e3:.3f} ms net "
                      f"({blk/max(net,1e-9):.0f}x RT alone)", flush=True)
            del ring
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "noop", "dus", "kernel", "gather_dyn", "gather_rows128",
        "gather_rows256", "gather_rows512", "select", "select_old", "step",
    ])
