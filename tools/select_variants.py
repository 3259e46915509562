"""Experimental strip_select variants for VPU-cost attribution on the TPU.

Each variant is a copy of the production kernel with one stage altered; they
are NOT audio-correct (except 'inkk') — only for timing.

Usage: python tools/select_variants.py [variant ...]
Variants:
  base       current production kernel (tile=32)
  norealign  skip the 3-level page-offset realign (wrong audio)
  noresid    skip the residual doppler select (wrong audio)
  inkk       compute kk/fr in-kernel from per-row (offset0, ds) scalars
             (audio-equivalent, 34 MB/block less input traffic)
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
N = 512
K = 64
TILE = 32
ITERS = 50


def main(variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from oddio_tpu.ops.pallas_ring import PAGE, SELECT_R, SELECT_SB

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    S = 2 * PAGE
    SB = SELECT_SB
    R = SELECT_R
    strips = jnp.asarray(rng.standard_normal((V, 2, S)), jnp.float32)
    ds_np = rng.uniform(0.99, 1.01, (V, 2, 1)).astype(np.float32)
    o0_np = rng.uniform(0, 1, (V, 2, 1)).astype(np.float32)
    pos = o0_np + ds_np * np.arange(N)
    whole = np.floor(pos).astype(np.int32)
    kk = jnp.asarray(np.clip(whole - np.arange(N, dtype=np.int32) + K, 0, 2 * K))
    fr = jnp.asarray(pos - whole, jnp.float32)
    gain0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    d_gain = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    maskf = jnp.ones(V, jnp.float32)
    extra = jnp.asarray(rng.integers(0, PAGE, (V, 2)), jnp.int32)
    o0 = jnp.asarray(o0_np[..., 0], jnp.float32)
    dsj = jnp.asarray(ds_np[..., 0], jnp.float32)

    Wf = SB + R + 1
    W4 = Wf + 15
    W7 = W4 + 112
    H7 = (1023 + 2 * K) // 128 + 1

    def ear(strips_e, kk_e, fr_e, ex, *, realign=True, resid=True, inkk=False,
            taa=False, taa_full=False, fusedw=False, gath=False,
            o0_e=None, ds_e=None):
        tile = strips_e.shape[0]
        if taa_full:
            # one wide dynamic gather straight off the 2-page strip
            ji = jax.lax.broadcasted_iota(jnp.int32, (tile, N), 1)
            idx = ex + ji + kk_e
            a = jnp.take_along_axis(strips_e, idx, axis=-1)
            b = jnp.take_along_axis(strips_e, idx + 1, axis=-1)
            return a + fr_e * (b - a)
        parts = []
        for sb in range(N // SB):
            if inkk:
                ji = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1) + (
                    sb * SB
                )
                j = ji.astype(jnp.float32)
                p = o0_e + j * ds_e
                w = jnp.floor(p)
                fr_sb = p - w
                kk_sb = jnp.clip(w.astype(jnp.int32) - ji + K, 0, 2 * K)
            else:
                kk_sb = kk_e[:, sb * SB : (sb + 1) * SB]
                fr_sb = fr_e[:, sb * SB : (sb + 1) * SB]
            kmin = jnp.min(kk_sb, axis=-1, keepdims=True)
            shift = ex + kmin
            b7 = shift >> 7
            b4 = (shift >> 4) & 7
            b1 = shift & 15
            if realign:
                w1 = jnp.zeros((tile, W7), jnp.float32)
                for h in range(H7):
                    off = sb * SB + 128 * h
                    w1 = w1 + strips_e[:, off : off + W7] * (b7 == h).astype(
                        jnp.float32
                    )
                w2 = jnp.zeros((tile, W4), jnp.float32)
                for h in range(8):
                    w2 = w2 + w1[:, 16 * h : 16 * h + W4] * (b4 == h).astype(
                        jnp.float32
                    )
                if not gath:
                    w3 = jnp.zeros((tile, Wf), jnp.float32)
                    for h in range(16):
                        w3 = w3 + w2[:, h : h + Wf] * (b1 == h).astype(
                            jnp.float32
                        )
            else:
                w3 = strips_e[:, sb * SB : sb * SB + Wf]
                w2 = strips_e[:, sb * SB : sb * SB + W4]
            if gath:
                # bits >=16 of (extra + kmin) were absorbed by w1/w2; the
                # low offset b1 AND the doppler residual ride the per-element
                # dynamic gather (128-lane table constraint -> 2 gathers +
                # select per operand).
                b1f = shift & 15
                r = jnp.clip(kk_sb - kmin, 0, R - 1)
                ji = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1)
                m = b1f + ji + r  # in [0, 15 + SB-1 + R-1]
                tA = w2[:, :128]
                tB = w2[:, 32:160]

                def pick(mm):
                    A = jnp.take_along_axis(tA, jnp.minimum(mm, 127), axis=-1)
                    B = jnp.take_along_axis(
                        tB, jnp.clip(mm - 32, 0, 127), axis=-1
                    )
                    return jnp.where(mm < 128, A, B)

                a_sb = pick(m)
                b_sb = pick(m + 1)
                parts.append(a_sb + fr_sb * (b_sb - a_sb))
            elif taa:
                r = jnp.clip(kk_sb - kmin, 0, R - 1)
                ji = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1)
                a_sb = jnp.take_along_axis(w3, ji + r, axis=-1)
                b_sb = jnp.take_along_axis(w3, ji + r + 1, axis=-1)
                parts.append(a_sb + fr_sb * (b_sb - a_sb))
            elif fusedw:
                r = jnp.clip(kk_sb - kmin, 0, R - 1)
                onefr = 1.0 - fr_sb
                acc = jnp.zeros((tile, SB), jnp.float32)
                mprev = jnp.zeros((tile, SB), jnp.float32)
                for k in range(R + 1):
                    mk = (r == k).astype(jnp.float32) if k < R else 0.0
                    acc = acc + w3[:, k : k + SB] * (mk * onefr + mprev * fr_sb)
                    mprev = mk
                parts.append(acc)
            elif resid:
                r = jnp.clip(kk_sb - kmin, 0, R - 1)
                a_sb = jnp.zeros((tile, SB), jnp.float32)
                b_sb = jnp.zeros((tile, SB), jnp.float32)
                for k in range(R):
                    mk = (r == k).astype(jnp.float32)
                    a_sb = a_sb + w3[:, k : k + SB] * mk
                    b_sb = b_sb + w3[:, k + 1 : k + 1 + SB] * mk
                parts.append(a_sb + fr_sb * (b_sb - a_sb))
            else:
                a_sb = w3[:, :SB]
                b_sb = w3[:, 1 : 1 + SB]
                parts.append(a_sb + fr_sb * (b_sb - a_sb))
        return jnp.concatenate(parts, axis=-1)

    def make_kernel(**kw):
        def kern(s0_ref, s1_ref, kk0_ref, kk1_ref, fr0_ref, fr1_ref,
                 g0_ref, g1_ref, mask_ref, e0_ref, e1_ref, o0_ref, ds_ref,
                 out_ref):
            i = pl.program_id(0)
            jn = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1).astype(
                jnp.float32
            )
            m = mask_ref[...]
            rows = []
            for e_i, (s_ref, kk_ref, fr_ref, g_ref, e_ref) in enumerate((
                (s0_ref, kk0_ref, fr0_ref, g0_ref, e0_ref),
                (s1_ref, kk1_ref, fr1_ref, g1_ref, e1_ref),
            )):
                samp = ear(
                    s_ref[...], kk_ref[...], fr_ref[...], e_ref[...],
                    o0_e=o0_ref[..., e_i : e_i + 1],
                    ds_e=ds_ref[..., e_i : e_i + 1],
                    **kw,
                )
                g = g_ref[...]
                gains = g[:, 0:1] + jn * g[:, 1:2]
                rows.append(jnp.sum(samp * gains * m, axis=0, keepdims=True))
            contrib = jnp.concatenate(rows, axis=0)

            @pl.when(i == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[...] += contrib

        return kern

    def call(variant, strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj):
        kw = dict(realign=True, resid=True, inkk=False)
        if variant == "norealign":
            kw["realign"] = False
        if variant == "noresid":
            kw["resid"] = False
        if variant == "inkk":
            kw["inkk"] = True
        if variant == "taa":
            kw["taa"] = True
        if variant == "taa_full":
            kw["taa_full"] = True
        if variant == "fusedw":
            kw["fusedw"] = True
        if variant == "inkk_taa":
            kw["inkk"] = True
            kw["taa"] = True
        if variant == "gath":
            kw["gath"] = True
        if variant == "inkk_gath":
            kw["inkk"] = True
            kw["gath"] = True
        gain = jnp.stack([gain0, d_gain], axis=-1)

        def ts(*shape):
            return pl.BlockSpec(
                shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                memory_space=pltpu.VMEM,
            )

        grid_spec = pl.GridSpec(
            grid=(V // TILE,),
            in_specs=[
                ts(TILE, S), ts(TILE, S),
                ts(TILE, N), ts(TILE, N),
                ts(TILE, N), ts(TILE, N),
                ts(TILE, 2), ts(TILE, 2),
                ts(TILE, 1),
                ts(TILE, 1), ts(TILE, 1),
                ts(TILE, 2), ts(TILE, 2),
            ],
            out_specs=pl.BlockSpec(
                (2, N), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        e = extra.astype(jnp.int32)
        return pl.pallas_call(
            make_kernel(**kw),
            out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
            grid_spec=grid_spec,
        )(
            strips[:, 0], strips[:, 1],
            kk[:, 0], kk[:, 1],
            fr[:, 0], fr[:, 1],
            gain[:, 0], gain[:, 1],
            maskf[:, None],
            e[:, 0:1], e[:, 1:2],
            o0, dsj,
        )

    blk = 1.0 / (N / 48000.0)
    if os.environ.get("CHECK"):
        ref = np.asarray(jax.jit(functools.partial(call, "base"))(
            strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj))
        for variant in variants:
            try:
                got = np.asarray(jax.jit(functools.partial(call, variant))(
                    strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj))
                err = np.abs(got - ref).max()
                print(f"{variant}: max|err| vs base = {err:.3e}", flush=True)
            except Exception as ex:
                print(f"{variant}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
                      flush=True)
        return
    for variant in variants:
        def many(strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj,
                 variant=variant):
            def body(c, _):
                s, acc = c
                out = call(variant, s, kk, fr, gain0, d_gain, maskf, extra,
                           o0, dsj)
                s = s.at[0, 0, 0].add(out[0, 0])
                return (s, acc + out[0, 0]), None
            (s, acc), _ = jax.lax.scan(
                body, (strips, jnp.float32(0)), None, length=ITERS
            )
            return acc + s[0, 0, 0]

        try:
            f = jax.jit(many)
            d = f(strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj)
            np.asarray(d)
            ts_ = []
            for _ in range(3):
                t0 = time.perf_counter()
                d = f(strips, kk, fr, gain0, d_gain, maskf, extra, o0, dsj)
                np.asarray(d)
                ts_.append(time.perf_counter() - t0)
            t = float(np.median(ts_))
            print(
                f"{variant}: {t/ITERS*1e3:.3f} ms/block "
                f"({1/(t/ITERS)/blk:.1f}x RT alone)",
                flush=True,
            )
        except Exception as ex:
            print(f"{variant}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["base", "norealign", "noresid", "inkk"])
