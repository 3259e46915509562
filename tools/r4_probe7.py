"""Round-4 probe v7: append-leg variants.  rows_append_dma stages the
slab HBM -> VMEM (blocked spec) -> HBM (strided copy): ~26 MB of traffic
for a 10 MB write, 0.046 ms/block in the production step.  Variant B
DMAs HBM -> HBM directly from the slab operand (pl.ANY), one program per
voice tile issuing both legs back to back before waiting either.

Usage: python tools/r4_probe7.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 4096
NW = 512
RPV = 11264 // 128  # rowlen = 1024 + 8192 + 1024 + 1024
ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args):
    import jax

    f = jax.jit(fn, donate_argnums=0)
    d = f(*args)
    s = float(np.asarray(d[1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = (d[0], d[1])
        r, acc = f(*d)
        s = float(np.asarray(acc))
        ts.append(time.perf_counter() - t0)
        d = (r, acc)
    return float(np.median(ts)), d


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from oddio_tpu.ops.pallas_ring import rows_append_dma

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    ring = jnp.asarray(rng.standard_normal((V, RPV, 128)), jnp.float32)
    slab = jnp.asarray(rng.standard_normal((V, NW)), jnp.float32)

    def many_a(ring, acc):
        def body(c, _):
            r, a = c
            r2 = rows_append_dma(r, slab, jnp.int32(8), jnp.int32(72))
            return (r2, a + r2[0, 8, 0] * 1e-20), None
        (r, a), _ = jax.lax.scan(body, (ring, acc), None, length=ITERS)
        return r, a

    t, d = timed(many_a, ring, jnp.float32(0))
    log(f"rows_append_dma (VMEM-staged): {t/ITERS*1e3:.4f} ms/block")

    # variant B: HBM -> HBM direct, both legs in flight per program
    def _kern(rows_ref, slab_any, ring_any, out_ref, sem0, sem1, *, tile, nr):
        i = pl.program_id(0)
        src = slab_any.at[pl.ds(i * tile, tile)]
        d0 = out_ref.at[pl.ds(i * tile, tile), pl.ds(rows_ref[0], nr), :]
        d1 = out_ref.at[pl.ds(i * tile, tile), pl.ds(rows_ref[1], nr), :]
        c0 = pltpu.make_async_copy(src, d0, sem0)
        c1 = pltpu.make_async_copy(src, d1, sem1)
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

    def append_direct(ring3, slab, r0, rmir0, tile=512):
        nr = slab.shape[1] // 128
        rows = jnp.stack([jnp.asarray(r0, jnp.int32),
                          jnp.asarray(rmir0, jnp.int32)])
        return pl.pallas_call(
            functools.partial(_kern, tile=tile, nr=nr),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(V // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((V, RPV, 128), jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rows, slab.reshape(V, NW // 128, 128), ring3)

    for tile in (512, 1024, 4096):
        ring2 = jnp.asarray(rng.standard_normal((V, RPV, 128)), jnp.float32)

        def many_b(ring, acc, tile=tile):
            def body(c, _):
                r, a = c
                r2 = append_direct(r, slab, jnp.int32(8), jnp.int32(72),
                                   tile=tile)
                return (r2, a + r2[0, 8, 0] * 1e-20), None
            (r, a), _ = jax.lax.scan(body, (ring, acc), None, length=ITERS)
            return r, a

        try:
            t, d = timed(many_b, ring2, jnp.float32(0))
            log(f"append_direct tile={tile}: {t/ITERS*1e3:.4f} ms/block")
        except Exception as e:
            log(f"append_direct tile={tile}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")

    # parity check (small): direct vs staged
    ring3 = jnp.asarray(rng.standard_normal((64, RPV, 128)), jnp.float32)
    slab3 = jnp.asarray(rng.standard_normal((64, NW)), jnp.float32)
    Vs = globals()["V"]
    globals()["V"] = 64
    try:
        a = rows_append_dma(jnp.array(ring3), slab3, jnp.int32(8), jnp.int32(72))
        b = append_direct(jnp.array(ring3), slab3, jnp.int32(8), jnp.int32(72),
                          tile=64)
        log(f"parity max|diff| = {float(jnp.abs(a - b).max())}")
    except Exception as e:
        log(f"parity: FAILED {type(e).__name__}: {str(e)[:300]}")
    globals()["V"] = Vs


if __name__ == "__main__":
    main()
