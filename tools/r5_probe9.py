"""r5_probe9: can the Adapt EMA drop its associative_scan?

The pack-step program doubles its op count per Adapt pool instance, and
~300 of those ops are the associative scan's odd/even lane slicing
(struct check, round 5).  Candidate replacement, valid when
n*|log1p(-alpha)| is small (every sane tau; CPU-checked <= 6e-7 vs the
sequential oracle at alpha <= 0.15):

    c_i  = min(i+1, count)                 (live count through i)
    M_i  = exp(c_i * log1p(-a))            (decay prefix, closed form)
    B_i  = M_i * cumsum_j<=i(live * a*s^2 / M_j)
    avg_prev_i = shift(M)_i * (avg0 + shift(cumsum)_i)

Variants time the cumsum engine: jnp.cumsum (XLA's lowering), one
512x512 triangular matmul (HIGHEST), and a chunked 4x(128x128) matmul
with carry adds.  Rows = S*V of the two scenepack pools (512, 4096).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 512
ITERS = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_v2(cumsum_fn):
    import jax.numpy as jnp

    def ema(avg0, s, alpha, count, low, high, max_gain, n):
        s2 = s * s
        i_n = jnp.arange(n, dtype=jnp.int32)
        live = i_n < count[..., None]
        a = alpha[..., None]
        c = jnp.minimum(i_n + 1, count[..., None]).astype(jnp.float32)
        lg = jnp.log1p(-a)
        M = jnp.exp(c * lg)
        terms = jnp.where(live, a * s2 / M, 0.0)
        csum = cumsum_fn(terms)
        carry = M[..., -1] * (avg0 + csum[..., -1])
        Mprev = jnp.concatenate([jnp.ones_like(M[..., :1]), M[..., :-1]], -1)
        cprev = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], -1
        )
        prev = Mprev * (avg0[..., None] + cprev)
        avg2 = s2 * a + prev * (1.0 - a)
        avg_peak = jnp.sqrt(avg2) * np.sqrt(np.float32(2.0))
        lo = low[..., None]
        gain = jnp.where(
            avg_peak < lo,
            jnp.minimum(lo / avg_peak, max_gain[..., None]),
            jnp.where(
                avg_peak > high[..., None], high[..., None] / avg_peak, 1.0
            ),
        )
        return gain, carry

    return ema


def main():
    import jax
    import jax.numpy as jnp

    from oddio_tpu.ops.adapt import _ema_gain

    log(f"devices: {jax.devices()}")

    HI = jax.lax.Precision.HIGHEST
    U512 = jnp.asarray(np.triu(np.ones((N, N), np.float32)).T)  # [j<=i]
    U128 = jnp.asarray(np.triu(np.ones((128, 128), np.float32)).T)

    def cs_jnp(x):
        return jnp.cumsum(x, axis=-1)

    def cs_mm512(x):
        return jnp.matmul(x, U512, precision=HI)

    def cs_mm128(x):
        R = x.shape[0]
        x4 = x.reshape(R, 4, 128)
        within = jnp.matmul(x4, U128, precision=HI)
        chunk = x4.sum(-1)
        off = jnp.cumsum(chunk, axis=-1) - chunk  # exclusive, 4 wide
        return (within + off[..., None]).reshape(R, N)

    variants = {
        "assoc (current)": _ema_gain,
        "v2 jnp.cumsum": make_v2(cs_jnp),
        "v2 mm512 HIGHEST": make_v2(cs_mm512),
        "v2 mm128 chunked": make_v2(cs_mm128),
    }

    rng = np.random.default_rng(0)
    blk = N / 48000.0
    for R in (512, 4096):
        s = jnp.asarray(rng.standard_normal((R, N)) * 0.3, jnp.float32)
        alpha = jnp.full((R,), np.float32(1 - np.exp(-1 / 48000 / 0.1)))
        count = jnp.full((R,), N, jnp.int32)
        low = jnp.full((R,), np.float32(0.1 / np.sqrt(2)))
        high = jnp.full((R,), np.float32(0.5 / np.sqrt(2)))
        mg = jnp.full((R,), np.float32(4.0))
        avg0 = jnp.full((R,), np.float32(0.01))

        ref = None
        for label, ema in variants.items():
            def many(avg0, s):
                def body(c, _):
                    avg, acc = c
                    g, avg2 = ema(avg, s, alpha, count, low, high, mg, N)
                    return (avg2, acc + g[..., -1].sum()), None

                (avg, acc), _ = jax.lax.scan(
                    body, (avg0, jnp.float32(0)), None, length=ITERS
                )
                return avg, acc

            f = jax.jit(many)
            t0 = time.time()
            av, acc = f(avg0, s)
            g1, _ = jax.jit(lambda: ema(avg0, s, alpha, count, low, high,
                                        mg, N))()
            g1 = np.asarray(g1)
            comp = time.time() - t0
            float(np.asarray(acc))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                av, acc = f(avg0, s)
                float(np.asarray(acc))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts)) / ITERS
            if ref is None:
                ref = g1
                err = 0.0
            else:
                err = float(np.max(np.abs(g1 - ref)))
            log(f"R={R} {label:>18}: {t*1e3:.4f} ms/block "
                f"({blk/t:.0f}x RT alone)  max|dgain|={err:.2e} "
                f"[compile {comp:.0f}s]")


if __name__ == "__main__":
    main()
