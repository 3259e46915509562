"""Round-3 probe: flat-ring buffered-path building blocks on the TPU.

Times old (row-strip) vs new (flat mirror-window) delay-ring step
components at the flagship shape (V=4096 voices, n=512 frames, 48 kHz,
L=16384 ring).  Each variant gets a fresh state upload (donation consumes
it).

Usage: python tools/r3_probe.py [variant ...]
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
ROW = 256
F = 1024        # front pad (absorbs wrapped-write starts)
M = 1024        # mirror region (makes read windows contiguous)
SLACK = 1024    # dump region for no-op mirror maintenance writes
ROWLEN = F + L + M + SLACK
SREAD = 768     # (ceil(512/128)-1)*128 + 384
EMAX2 = 36      # inter-ear stagger bound at 48 kHz
ITERS = 30


def main(variants):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        flat_append_aligned, pack_select_scalars, strip_place, strip_select,
        window_select,
    )
    from oddio_tpu.ops._dev import device_split_ds

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    blk = N / 48000.0

    # shared inputs
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
    rstart = jnp.asarray(rng.integers(0, L, (V,)), jnp.int32)

    P4 = L // ROW
    emax_old = ROW + 33
    extra_old = jnp.asarray(rng.integers(0, emax_old - 2, (V, 2)), jnp.int32)
    rows_np = (rng.standard_normal((V * P4, ROW)) * 0.1).astype(np.float32)
    flat_np = (rng.standard_normal((V, ROWLEN)) * 0.1).astype(np.float32)
    P512 = ROWLEN // 512
    rows512_np = flat_np.reshape(V * P512, 512)

    def write_old(ring, it):
        start_i = (it * 513) % L
        wrow = start_i // ROW
        extra_w = start_i - wrow * ROW
        vbase4 = jnp.arange(V, dtype=jnp.int32) * P4
        n_rows_w = (ROW - 1 + N_INNER - 1) // ROW + 1
        idx_w = (
            vbase4[:, None] + jnp.mod(wrow + jnp.arange(n_rows_w), P4)[None, :]
        ).reshape(-1)
        wstrips = jnp.take(ring, idx_w, axis=0).reshape(V, n_rows_w * ROW)
        wstrips = strip_place(
            wstrips, samples, jnp.full((V,), extra_w, jnp.int32)
        )
        return ring.at[idx_w].set(wstrips.reshape(-1, ROW))

    def read_old(ring, it):
        row0 = (rstart + it) // ROW % P4
        vbase4 = jnp.arange(V, dtype=jnp.int32) * P4
        H7 = (emax_old - 1 + 2 * K) // 128 + 1
        nsb = -(-N // 128)
        need = (nsb - 1) * 128 + 128 * (H7 - 1) + 384
        n_rows_r = -(-need // ROW)
        idx_r = (
            vbase4[:, None] + jnp.mod(row0[:, None] + jnp.arange(n_rows_r), P4)
        ).reshape(-1)
        rstrips = jnp.take(ring, idx_r, axis=0).reshape(V, n_rows_r * ROW)
        return strip_select(
            rstrips, scal, gain0, d_gain, maskf, extra_old, n=N, K=K,
            emax=emax_old,
        )

    def write_flat(ring, it):
        c = (it * 513) % L
        ring = jax.lax.dynamic_update_slice(ring, samples, (0, F + c))
        c2 = F + jnp.where(
            c + N_INNER > L, c - L, jnp.where(c < M, c + L, L + M)
        )
        return jax.lax.dynamic_update_slice(ring, samples, (0, c2))

    def gather_flat(ring, it):
        st = jnp.mod(rstart + it, L) + F
        return jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (SREAD,))
        )(ring, st)

    def select_flat(windows):
        return window_select(
            windows, scal, gain0, d_gain, maskf, extra2, n=N, K=K
        )

    acts = {}

    def reg(name):
        def deco(fn):
            acts[name] = fn
            return fn
        return deco

    @reg("read_old")
    def _(ring, it):
        out = read_old(ring, it)
        ring = ring.at[0, 0].add(out[0, 0])
        return ring, out[0, 0]

    @reg("write_old")
    def _(ring, it):
        r = write_old(ring, it)
        return r, r[0, 0]

    @reg("write_flat")
    def _(ring, it):
        r = write_flat(ring, it)
        return r, r[0, 0]

    @reg("write_flat_static")
    def _(ring, it):
        r = jax.lax.dynamic_update_slice(ring, samples, (0, 4097))
        r = r.at[0, 0].add(it.astype(jnp.float32))
        return r, r[0, 0]

    @reg("write_1dus_aligned")
    def _(ring, it):
        c = ((it * 512) % L) + F
        r = jax.lax.dynamic_update_slice(ring, s512, (0, c))
        return r, r[0, 0]

    @reg("write_scatter512")
    def _(rows, it):
        pg = ((it * 512) % L + F) // 512
        idx = jnp.arange(V, dtype=jnp.int32) * P512 + pg
        r = rows.at[idx].set(s512)
        return r, r[0, 0]

    @reg("write_kernel")
    def _(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        r = flat_append_aligned(ring, s512, pcol, pmir)
        return r, r[0, 0]

    @reg("gather_flat")
    def _(ring, it):
        w = gather_flat(ring, it)
        ring = ring.at[0, 0].add(w[0, 0])
        return ring, w[0, 0]

    @reg("gather_rows512")
    def _(rows, it):
        st = jnp.mod(rstart + it, L) + F
        r0 = st // 512
        idx = (
            (jnp.arange(V, dtype=jnp.int32) * P512)[:, None]
            + r0[:, None] + jnp.arange(3)[None, :]
        ).reshape(-1)
        w = jnp.take(rows, idx, axis=0).reshape(V, 3 * 512)
        rows = rows.at[0, 0].add(w[0, 0])
        return rows, w[0, 0]

    @reg("select_flat")
    def _(ring, it):
        w = jax.lax.dynamic_slice(ring, (0, 0), (V, SREAD))
        out = select_flat(w)
        ring = ring.at[0, 0].add(out[0, 0])
        return ring, out[0, 0]

    @reg("read_flat")
    def _(ring, it):
        out = select_flat(gather_flat(ring, it))
        ring = ring.at[0, 0].add(out[0, 0])
        return ring, out[0, 0]

    @reg("step_flat")
    def _(ring, it):
        c = (it * 512) % L
        pcol = (F + c) // 512
        pmir = (F + jnp.where(c < M, c + L, L + M)) // 512
        ring = flat_append_aligned(ring, s512, pcol, pmir)
        out = select_flat(gather_flat(ring, it))
        ring = ring.at[0, 0].add(out[0, 0])
        return ring, out[0, 0]

    def timeit(name, fn, state_np):
        try:
            def many(state):
                def body(c, it):
                    s, acc = c
                    s, out = fn(s, it)
                    return (s, acc + out), None

                (s, acc), _ = jax.lax.scan(
                    body, (state, jnp.float32(0)), jnp.arange(ITERS)
                )
                return s, acc

            f = jax.jit(many, donate_argnums=0)
            t0 = time.perf_counter()
            s, acc = f(jnp.asarray(state_np))
            np.asarray(acc)
            print(f"  [{name}] compile+first: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts_ = []
            for _ in range(3):
                t0 = time.perf_counter()
                s, acc = f(s)
                np.asarray(acc)
                ts_.append(time.perf_counter() - t0)
            del s
            t = float(np.median(ts_)) / ITERS
            print(f"{name}: {t*1e3:.3f} ms/block ({blk/t:.1f}x RT alone)",
                  flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)

    for v in variants:
        if v in ("write_old", "read_old"):
            st = rows_np
        elif v in ("write_scatter512", "gather_rows512"):
            st = rows512_np
        else:
            st = flat_np
        timeit(v, acts[v], st)


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "read_old", "gather_flat", "select_flat", "read_flat",
        "gather_rows512", "write_flat", "write_flat_static",
        "write_1dus_aligned", "write_scatter512", "write_kernel",
        "step_flat",
    ])
