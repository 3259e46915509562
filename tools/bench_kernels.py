"""Per-stage TPU micro-benchmarks for the delay-ring pipeline.

Times each stage of the buffered spatial read path at the flagship shape
(4096 voices, 512-frame blocks) by chaining many iterations inside one jit
(the relay tunnel adds ~27 ms per dispatch, so per-dispatch timing is
useless; a scalar digest is fetched at the end to force completion).

Usage:  python tools/bench_kernels.py [stage ...]
Stages: select place gather write_scatter full
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
P = 16  # ring pages per voice
ITERS = 50


def log(*a):
    print(*a, flush=True)


def timed(fn, *args):
    """Median wall time of fn(*args) -> scalar digest, over 3 reps."""
    import jax

    f = jax.jit(fn)
    d = f(*args)
    d.block_until_ready()
    np.asarray(d)  # tunnel-safe completion fence
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = f(*args)
        np.asarray(d)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(stages):
    import jax
    import jax.numpy as jnp
    from oddio_tpu.ops.pallas_ring import (
        PAGE, pack_select_scalars, strip_place, strip_select,
    )
    from oddio_tpu.ops._dev import device_split_ds

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    EMAX = 256 + 33
    H7 = (EMAX - 1 + 2 * K) // 128 + 1
    nsb = -(-N // 128)
    RW = -(-((nsb - 1) * 128 + 128 * (H7 - 1) + 384) // 256) * 256
    strips = jnp.asarray(rng.standard_normal((V, RW)), jnp.float32)
    ds = jnp.asarray(rng.uniform(0.99, 1.01, (V, 2)), jnp.float32)
    o0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    ds_int, f_hi, f_lo = device_split_ds(ds)
    scal = pack_select_scalars(o0, ds_int, f_hi, f_lo)
    gain0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    d_gain = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    maskf = jnp.ones(V, jnp.float32)
    extra = jnp.asarray(rng.integers(0, EMAX, (V, 2)), jnp.int32)

    blk = 1.0 / (N / 48000.0)  # blocks per second of audio

    def select_stage(tile):
        def many_select(strips, scal, gain0, d_gain, maskf, extra):
            def body(c, _):
                g, acc = c
                out = strip_select(
                    strips, scal, g, d_gain, maskf, extra, n=N, K=K,
                    emax=EMAX, tile=tile
                )
                # iteration dependency rides the small gain array so the
                # strips input is NOT copied per iteration
                g = g.at[0, 0].add(out[0, 0] * 1e-20)
                return (g, acc + out[0, 0]), None
            (g, acc), _ = jax.lax.scan(
                body, (gain0, jnp.float32(0)), None, length=ITERS
            )
            return acc + g[0, 0]

        t = timed(many_select, strips, scal, gain0, d_gain, maskf, extra)
        log(f"strip_select tile={tile}: {t/ITERS*1e3:.3f} ms/block "
            f"({1/(t/ITERS)/blk:.1f}x RT alone)")

    if "select" in stages:
        select_stage(None)
    for st in stages:
        if st.startswith("select") and st[6:].isdigit():
            try:
                select_stage(int(st[6:]))
            except Exception as e:
                log(f"strip_select tile={st[6:]}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")

    if "floor" in stages:
        # minimal kernel with the same grid and input traffic: per-program
        # cost floor (DMA-in + trivial compute + accumulate-out)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _floor_kernel(s0, s1, kk0, kk1, fr0, fr1, out):
            i = pl.program_id(0)
            contrib = jnp.stack([
                jnp.sum(s0[...][:, :N] * fr0[...], axis=0),
                jnp.sum(s1[...][:, :N] * fr1[...], axis=0),
            ])

            @pl.when(i == 0)
            def _():
                out[...] = jnp.zeros_like(out)

            out[...] += contrib

        def floor_call(strips, kk, fr, tile):
            def ts(*shape):
                return pl.BlockSpec(
                    shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                    memory_space=pltpu.VMEM,
                )
            S = strips.shape[-1]
            return pl.pallas_call(
                _floor_kernel,
                out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(V // tile,),
                    in_specs=[ts(tile, S), ts(tile, S), ts(tile, N),
                              ts(tile, N), ts(tile, N), ts(tile, N)],
                    out_specs=pl.BlockSpec(
                        (2, N), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                ),
            )(strips[:, 0], strips[:, 1], kk[:, 0], kk[:, 1], fr[:, 0], fr[:, 1])

        for tile in (8, 32):
            def many_floor(strips, kk, fr, tile=tile):
                def body(c, _):
                    s, acc = c
                    out = floor_call(s, kk, fr, tile)
                    s = s.at[0, 0, 0].add(out[0, 0])
                    return (s, acc + out[0, 0]), None
                (s, acc), _ = jax.lax.scan(
                    body, (strips, jnp.float32(0)), None, length=ITERS
                )
                return acc + s[0, 0, 0]

            t = timed(many_floor, strips, kk, fr)
            log(f"floor kernel tile={tile}: {t/ITERS*1e3:.3f} ms/block")

    if "place" in stages:
        n_inner = N + 1
        SW = ((255 + n_inner - 1) // 256 + 1) * 256
        samples = jnp.asarray(rng.standard_normal((V, n_inner)), jnp.float32)
        extra_w = jnp.asarray(rng.integers(0, 256, V), jnp.int32)
        strips2 = strips[:, :SW]

        def many_place(strips2, samples, extra_w):
            def body(c, _):
                s, acc = c
                out = strip_place(s, samples, extra_w)
                return (out, acc + out[0, 0]), None
            (s, acc), _ = jax.lax.scan(
                body, (strips2, jnp.float32(0)), None, length=ITERS
            )
            return acc + s[0, 0]

        t = timed(many_place, strips2, samples, extra_w)
        log(f"strip_place ({SW}-wide): {t/ITERS*1e3:.3f} ms/block "
            f"({1/(t/ITERS)/blk:.1f}x RT alone)")

    if "gather" in stages:
        ROW = 256
        P4 = P * (PAGE // ROW)
        n_rows = RW // ROW
        view = jnp.asarray(rng.standard_normal((V * P4, ROW)), jnp.float32)
        row0 = jnp.asarray(rng.integers(0, P4, V), jnp.int32)
        vbase4 = jnp.arange(V, dtype=jnp.int32) * P4

        def many_gather(view, row0):
            def body(c, _):
                r0, acc = c
                idx_r = (
                    vbase4[:, None] + jnp.mod(r0[:, None] + jnp.arange(n_rows), P4)
                ).reshape(-1)
                st = jnp.take(view, idx_r, axis=0).reshape(V, n_rows * ROW)
                acc = acc + st[0, 0]
                r0 = r0.at[0].add((acc * 0).astype(jnp.int32))
                return (r0, acc), None
            (r0, acc), _ = jax.lax.scan(
                body, (row0, jnp.float32(0)), None, length=ITERS
            )
            return acc

        t = timed(many_gather, view, row0)
        log(f"read row gather ({n_rows}x256 shared): {t/ITERS*1e3:.3f} ms/block")

    if "write_scatter" in stages:
        ROW = 256
        P4 = P * (PAGE // ROW)
        SW = ((255 + N) // 256 + 1) * 256
        n_rows = SW // ROW
        view = jnp.asarray(rng.standard_normal((V * P4, ROW)), jnp.float32)
        wrow = jnp.asarray(rng.integers(0, P4, V), jnp.int32)
        vbase4 = jnp.arange(V, dtype=jnp.int32) * P4
        wstrips = jnp.asarray(
            rng.standard_normal((V * n_rows, ROW)), jnp.float32
        )

        def many_wscatter(view, wrow, wstrips):
            def body(c, _):
                vw, acc = c
                idx_w = (
                    vbase4[:, None] + jnp.mod(wrow[:, None] + jnp.arange(n_rows), P4)
                ).reshape(-1)
                st = jnp.take(vw, idx_w, axis=0)
                vw = vw.at[idx_w].set(wstrips + acc)
                acc = acc + st[0, 0] + vw[0, 0]
                return (vw, acc), None
            (vw, acc), _ = jax.lax.scan(
                body, (view, jnp.float32(0)), None, length=ITERS
            )
            return acc + vw[0, 0]

        t = timed(many_wscatter, view, wrow, wstrips)
        log(f"write row gather+scatter ({n_rows}x256): {t/ITERS*1e3:.3f} ms/block")


if __name__ == "__main__":
    main(sys.argv[1:] or ["select", "place", "gather", "write_scatter"])
