"""r4_probe9: Mosaic LOWERING sweep of every voice-tiled ring kernel at
small / odd voice counts.

Round-4 verify-drive finding: Mosaic's gather lowering rule rejects
take_along_axis on (tile, 128) operands when tile < 8 ("Shape mismatch in
input, indices and output", jax pallas/mosaic/lowering.py) — so every
kernel whose grid tiles the voice axis fails to COMPILE for the real TPU
whenever _tile_for(V) < 8 (V = 1, 2, 4, or any V with an odd factor < 8).
CPU interpret mode (all tests) hides it; the reachable production case is
the singleton submix pool (V = 1, spatial.py strip_place/strip_select) and
any user pool with capacity < 8.  This sweep lowers (no remote compile)
each wrapper across V values and prints PASS/FAIL.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oddio_tpu.ops import pallas_ring as pr
from oddio_tpu.spatial import K_DOPPLER, RING_ROW, _emax


def try_lower(name, fn, *args):
    try:
        jax.jit(fn).lower(*args)
        return "PASS"
    except Exception as e:
        return f"FAIL ({type(e).__name__}: {str(e).splitlines()[0][:80]})"


def main():
    n = 512
    rate = 8000
    emax = _emax(rate)
    K = K_DOPPLER
    results = {}
    for V in (1, 2, 4, 6, 8, 12, 16, 64):
        f32 = lambda *s: jnp.zeros(s, jnp.float32)
        i32 = lambda *s: jnp.zeros(s, jnp.int32)
        rows = []

        # strip_place (host pool write, singleton write)
        n_inner = 513
        n_rows_w = (RING_ROW - 1 + n_inner - 1) // RING_ROW + 1
        rows.append(("strip_place", try_lower(
            "strip_place",
            lambda a, b, c: pr.strip_place(a, b, c),
            f32(V, n_rows_w * RING_ROW), f32(V, n_inner), i32(V),
        )))

        # strip_select (host pool read, singleton read)
        H7 = (emax - 1 + 2 * K) // 128 + 1
        nsb = -(-n // 128)
        need = (nsb - 1) * 128 + 128 * (H7 - 1) + 384
        S = -(-need // RING_ROW) * RING_ROW
        rows.append(("strip_select", try_lower(
            "strip_select",
            lambda s, sc, g0, dg, m, e: pr.strip_select(
                s, sc, g0, dg, m, e, n=n, K=K, emax=emax),
            f32(V, S), f32(V, 2, 4), f32(V, 2), f32(V, 2), f32(V), i32(V, 2),
        )))

        # strip_resample (FramesSignal DR warp reads)
        W = pr.RESAMPLE_W
        rows.append(("strip_resample", try_lower(
            "strip_resample",
            lambda s, sc, e: pr.strip_resample(s, sc, e, n=n),
            f32(V, W + 256), f32(V, 4), i32(V),
        )))

        # window_select_tiles (DR buffered pool read)
        emax2 = 256
        K2 = 32
        WIN = pr.select_window(n, emax2, K2)
        S2 = WIN + 128 * 7
        rows.append(("window_select_tiles", try_lower(
            "window_select_tiles",
            lambda w, rs, sc, g0, dg, m, e: pr.window_select_tiles(
                w, rs, sc, g0, dg, m, e, n=n, K=K2, emax2=emax2),
            f32(V, S2), i32(V), f32(V, 2, 4), f32(V, 2), f32(V, 2),
            f32(V), i32(V, 2),
        )))

        # rows_append_dma (DR buffered pool write; pure DMA, no gather)
        RPV = 16
        rows.append(("rows_append_dma", try_lower(
            "rows_append_dma",
            lambda r3, sl: pr.rows_append_dma(r3, sl, 0, 8),
            f32(V, RPV, 128), f32(V, 512),
        )))

        results[V] = rows
        print(f"V={V}: " + "  ".join(f"{k}={v}" for k, v in rows), flush=True)


if __name__ == "__main__":
    main()
