"""Pallas TPU kernels for the spatial delay rings — the hot ops.

XLA lowers *elementwise* per-voice gathers/scatters on TPU to near-serial
loops (measured ~56 ms for one (4096, 1024)-index gather from (4096, 16384)),
but handles *row-granular* gather/scatter on (N, 1024) page arrays natively
(~1-3 ms for the whole pool).  So the delay rings are treated as pages:

* ring buffers are (V, cap) with cap a multiple of the 1024-sample page;
  wraparound is just page-index modulo — no fold/mirror zones needed.
* **writes** (ring.rs:18-41): XLA gathers each voice's two affected pages
  into a (V, 2048) strip, the ``strip_place`` kernel inserts the new samples
  at the per-voice cursor offset, XLA scatters the pages back.
* **reads** (ring.rs:51-79, spatial.rs:409-431): XLA gathers two pages per
  (voice, ear); the ``strip_select`` kernel realigns and resamples.

Per-voice offsets inside the read kernels split into (a) a row-constant
128-granule shift, realigned by a small loop of statically sliced VMEM
windows multiplied by a selection mask (exact for row constants), and (b)
everything finer — the low offset bits plus the per-element doppler walk —
which rides Mosaic's per-element 128-lane dynamic gather (jnp.take_along_axis
inside the kernel; see _gather3).  Read positions are reconstructed in-kernel
from 4 scalars/(voice, ear) with the exact split-ds math (ops/_dev.py), so
nothing per-frame streams from HBM.  Positions are near-linear
(``pos_j ≈ const + j*ds``, ``ds = 1 ± v/c``), ``a_j = win[j + k_j]`` with
``k_j`` bounded by 2K.  The write kernel still uses the masked static-shift
levels (its insert offset is row-constant).

``K`` bounds the per-block doppler walk (|ds-1|*n <= 2K); K=64 at 512-frame
blocks covers radial velocities beyond ±40 m/s (clamped above — where the
reference itself pops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 32  # preferred voices per program (4 sublane groups per vector op)
PAGE = 1024  # ring page size (samples)
SELECT_SB = 128  # frames per sub-block in the read kernels


def _tile_for(V):
    t = TILE
    while V % t:
        t //= 2
    return max(t, 1)


def _shift_right(x, k, width):
    """x shifted right by static k along the last axis, truncated to width."""
    if k == 0:
        return x[..., :width]
    pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([pad, x[..., : width - k]], axis=-1)


# --- write: place samples into row strips --------------------------------------


def _place_kernel(samples_ref, strips_ref, extra_ref, count_ref, out_ref, *,
                  n_inner, S):
    """Insert src at lane ``extra`` (row-constant, [0, 256)) of the strip,
    writing exactly ``count`` (<= n_inner) lanes per row — lanes beyond the
    count keep the strip's old history (ring.rs:18-41 write extents).
    The shift runs as per-128-lane-column dynamic gathers from the padded
    source — each output column draws from at most 3 source columns."""
    strips = strips_ref[...]  # (tile, S)
    src = samples_ref[...]  # (tile, n_inner)
    e = extra_ref[...]  # (tile, 1) int32 in [0, 256)
    cnt = count_ref[...]  # (tile, 1) int32 in [0, n_inner]
    tile = strips.shape[0]
    tcols = -(-n_inner // 128)
    SP = tcols * 128
    if SP > n_inner:
        src = jnp.concatenate(
            [src, jnp.zeros((tile, SP - n_inner), jnp.float32)], axis=-1
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    cols = []
    for c in range(S // 128):
        sidx = lane + (128 * c) - e  # source index for this output column
        acc = jnp.zeros((tile, 128), jnp.float32)
        for t in range(max(0, c - 2), min(tcols, c + 1)):
            g = jnp.take_along_axis(
                src[:, 128 * t : 128 * (t + 1)],
                jnp.clip(sidx - 128 * t, 0, 127),
                axis=-1,
            )
            acc = jnp.where((sidx >> 7) == t, g, acc)
        keep = (sidx >= 0) & (sidx < cnt)
        cols.append(jnp.where(keep, acc, strips[:, 128 * c : 128 * (c + 1)]))
    out_ref[...] = jnp.concatenate(cols, axis=-1)


def strip_place(strips, samples, extra, count=None, *, interpret=False,
                tile=None):
    """Insert ``samples[v]`` at lane ``extra[v]`` in [0, 256) of each strip;
    ``count`` (V,) bounds the lanes written per voice (default: all n_inner —
    deterministic sources recompute the overlap next block); returns the
    updated strips."""
    V, S = strips.shape
    n_inner = samples.shape[1]
    if count is None:
        count = jnp.full((V,), n_inner, jnp.int32)
    if tile is None:
        tile = _tile_for(V)
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec((tile, n_inner), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_place_kernel, n_inner=n_inner, S=S),
        out_shape=jax.ShapeDtypeStruct((V, S), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(samples, strips, extra[:, None].astype(jnp.int32),
      count[:, None].astype(jnp.int32))


# --- read: realign + doppler shift-select + lerp + gains + reduce --------------


#: residual doppler-walk bound per SELECT_SB sub-block (see _ear_pipeline):
#: |ds-1|*(SB-1)+1 <= R-1 covers radial velocities to ~40 m/s at SB=128 —
#: the same clamp regime as K=64 over full blocks (beyond it the reference
#: itself pops).
SELECT_R = 16

#: realign window width: 3 x 128-lane gather tables (one vreg each; 272
#: needed lanes pad to 384 anyway, so the headroom is free)
SELECT_W = 384


def _positions_sb(scal, j0, SB, K):
    """Exact in-kernel cursor positions for one SB-frame sub-block starting
    at frame ``j0``.  ``scal`` is (tile, 4) f32 rows [offset0-frac, f_hi,
    f_lo, ds_int] from the split-ds decomposition (ops/_dev.py:22-67); the
    arithmetic below is term-for-term identical to ``exact_positions``, so
    device cursor positions match the XLA path bit-for-bit.

    Returns (kk, fr): kk = clip(whole - j + K, 0, 2K) in [0, 2K], fr in
    [0, 1)."""
    tile = scal.shape[0]
    o0 = scal[:, 0:1]
    f_hi = scal[:, 1:2]
    f_lo = scal[:, 2:3]
    ds_int = scal[:, 3:4].astype(jnp.int32)
    t_i = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1) + j0
    t_f = t_i.astype(jnp.float32)
    H = t_f * f_hi  # exact f32 product for t < 4096 (12-bit f_hi)
    Hint = H.astype(jnp.int32)
    u = (H - Hint.astype(jnp.float32)) + (o0 + t_f * f_lo)
    fl_u = jnp.floor(u)
    fr = u - fl_u
    whole = t_i * ds_int + Hint + fl_u.astype(jnp.int32)
    kk = jnp.clip(whole - t_i + K, 0, 2 * K)
    return kk, fr


def _gather3(w1, m):
    """Per-element lookup a[j] = w1[m_j] for m in [0, SELECT_W) via three
    128-lane dynamic gathers + selects (Mosaic's dynamic_gather handles a
    full cross-lane per-element gather but only within one 128-lane vreg)."""
    g0 = jnp.take_along_axis(w1[:, 0:128], jnp.clip(m, 0, 127), axis=-1)
    g1 = jnp.take_along_axis(w1[:, 128:256], jnp.clip(m - 128, 0, 127), axis=-1)
    g2 = jnp.take_along_axis(w1[:, 256:384], jnp.clip(m - 256, 0, 127), axis=-1)
    return jnp.where(m < 128, g0, jnp.where(m < 256, g1, g2))


def _ear_pipeline(strips, scal, extra, *, n, K, SB=SELECT_SB, emax=PAGE):
    """Fractional delay-line read for one ear at full sublane occupancy:
    a_j = strips[extra + j + kk_j], lerped with fr_j (ring.rs:51-79).

    Per SB-frame sub-block:
    1) positions are computed in-kernel from 4 scalars/row (exact split-ds
       math, see _positions_sb) — nothing per-frame is streamed from HBM;
    2) the row-constant coarse shift (extra + kmin, 128-sample granularity)
       realigns the strip into a SELECT_W window with broadcast-masked
       static slices — exact for row constants;
    3) the low 7 shift bits AND the per-element doppler walk ride a
       per-element dynamic gather (_gather3) — one lookup per operand
       replaces the (SB, SB+2K+2) one-hot band matmul this design evolved
       from (VPU-bound on E-construction) and the R-term masked-shift
       residual that followed it (VPU-bound on lane rotations)."""
    tile = strips.shape[0]
    S = strips.shape[-1]
    H7 = (emax - 1 + 2 * K) // 128 + 1  # realign shift range is extra + kmin
    nsb = -(-n // SB)
    assert (nsb - 1) * SB + 128 * (H7 - 1) + SELECT_W <= S, (
        "block too large for the read window"
    )
    parts = []
    for sb in range(nsb):
        kk_sb, fr_sb = _positions_sb(scal, sb * SB, SB, K)
        # kk is monotone in j (linear read positions), so the row min is at
        # an end; jnp.min keeps this robust to clipping either way.
        kmin = jnp.min(kk_sb, axis=-1, keepdims=True)
        shift = extra + kmin  # (tile, 1) in [0, emax-1 + 2K]
        b7 = shift >> 7
        w1 = jnp.zeros((tile, SELECT_W), jnp.float32)
        for h in range(H7):
            off = sb * SB + 128 * h
            w1 = w1 + strips[:, off : off + SELECT_W] * (b7 == h).astype(
                jnp.float32
            )
        r = kk_sb - kmin  # [0, span]; the gather clamps the rare overflow
        m = (shift & 127) + jax.lax.broadcasted_iota(
            jnp.int32, (tile, SB), 1
        ) + jnp.clip(r, 0, SELECT_R - 1)
        a_sb = _gather3(w1, m)
        b_sb = _gather3(w1, m + 1)
        parts.append(a_sb + fr_sb * (b_sb - a_sb))
    out = jnp.concatenate(parts, axis=-1)  # (tile, nsb*SB)
    return out[:, :n]


def _select_kernel(s_ref, sc0_ref, sc1_ref,
                   g0_ref, g1_ref, mask_ref, e0_ref, e1_ref, out_ref,
                   *, n, K, emax):
    i = pl.program_id(0)
    jn = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    m = mask_ref[...]
    strips = s_ref[...]  # ONE window per voice, shared by both ears
    rows = []
    for sc_ref, g_ref, e_ref in (
        (sc0_ref, g0_ref, e0_ref),
        (sc1_ref, g1_ref, e1_ref),
    ):
        samp = _ear_pipeline(
            strips, sc_ref[...], e_ref[...], n=n, K=K, emax=emax
        )
        g = g_ref[...]
        gains = g[:, 0:1] + jn * g[:, 1:2]
        rows.append(jnp.sum(samp * gains * m, axis=0, keepdims=True))
    contrib = jnp.concatenate(rows, axis=0)  # (2, n)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def pack_select_scalars(offset_frac, ds_int, f_hi, f_lo):
    """Pack the per-(voice, ear) cursor scalars for strip_select: the
    fractional start offset and the split-ds step decomposition
    (ops/_dev.py:22-39).  ds_int rides as f32 (exact below 2^23)."""
    return jnp.stack(
        [offset_frac, f_hi, f_lo, ds_int.astype(jnp.float32)], axis=-1
    )


def strip_select(strips, scal, gain0, d_gain, maskf, extra, *, n, K, emax,
                 interpret=False, tile=None):
    """strips (V, S): ONE gathered read window per voice, shared by both
    ears (their read starts differ by at most the inter-ear distance);
    extra (V, 2): each ear's start offset within the window, in [0, emax);
    scal (V, 2, 4): packed cursor scalars (pack_select_scalars) — read
    positions are reconstructed exactly in-kernel; gain0/d_gain (V, 2);
    maskf (V,).  Returns the mixed (2, n) block."""
    V, S = strips.shape
    if tile is None:
        tile = _tile_for(V)
    gain = jnp.stack([gain0, d_gain], axis=-1)  # (V, 2, 2)

    def ts(*shape):
        return pl.BlockSpec(
            shape, lambda i: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            ts(tile, S),
            ts(tile, 4), ts(tile, 4),
            ts(tile, 2), ts(tile, 2),
            ts(tile, 1),
            ts(tile, 1), ts(tile, 1),
        ],
        out_specs=pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    e = extra.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_select_kernel, n=n, K=K, emax=emax),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        strips,
        scal[:, 0], scal[:, 1],
        gain[:, 0], gain[:, 1],
        maskf[:, None],
        e[:, 0:1], e[:, 1:2],
    )


# --- wavetable / sampler resample ---------------------------------------------
#
# FramesSignal/Cycle playback at arbitrary rate ratios is a *strided* read:
# positions x_j = x0 + j*ds with ds up to RESAMPLE_DSMAX (vs the ring
# kernels' ds ~= 1 doppler walks).  Sources read from guarded arena regions
# (core/frames.py): zero guards implement frames.rs:105-123's zero-padding
# with no in-kernel masking, loop replication implements cycle.rs's
# wraparound, so the kernel is a pure realign + wide dynamic gather + lerp.

#: resample gather window: 6 x 128-lane tables per sub-block — covers
#: (shift & 127) + j + span for per-sub-block spans up to ~500 samples
RESAMPLE_W = 768
#: per-frame step bound of the kernel path (beyond it positions clamp to
#: the fetched window; > 4x downsampling should pre-decimate its source)
RESAMPLE_DSMAX = 4.0
#: block-size bound of the kernel path (matches the ring kernels)
RESAMPLE_NMAX = 640


def _gatherW(w1, m, W):
    """a[j] = w1[m_j] for m in [0, W) via W/128 128-lane dynamic gathers."""
    out = jnp.take_along_axis(w1[:, 0:128], jnp.clip(m, 0, 127), axis=-1)
    for c in range(1, W // 128):
        g = jnp.take_along_axis(
            w1[:, 128 * c : 128 * (c + 1)], jnp.clip(m - 128 * c, 0, 127), axis=-1
        )
        out = jnp.where(m >= 128 * c, g, out)
    return out


def _resample_kernel(s_ref, sc_ref, e_ref, out_ref, *, n):
    """Per-voice strided fractional read: out[j] = lerp(strip[p_j],
    strip[p_j + 1], fr_j) at p_j = extra + trunc(o0 + j*ds).  ``o0`` is the
    trunc-form start fraction (may be negative, like the reference's f32
    ``offset`` in frames.rs:176-196); the truncate-toward-zero adjustment
    applies to the RELATIVE offset, mirroring ``exact_positions(signed)``
    term for term."""
    strips = s_ref[...]
    scal = sc_ref[...]
    extra = e_ref[...]  # (tile, 1) int32; guarantees extra + trunc(...) >= 0
    tile = strips.shape[0]
    W = RESAMPLE_W
    SB = SELECT_SB
    o0 = scal[:, 0:1]
    f_hi = scal[:, 1:2]
    f_lo = scal[:, 2:3]
    ds_int = scal[:, 3:4].astype(jnp.int32)
    parts = []
    for sb in range(-(-n // SB)):
        t_i = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1) + sb * SB
        t_f = t_i.astype(jnp.float32)
        H = t_f * f_hi  # exact f32 product for t < 4096 (12-bit f_hi)
        Hint = H.astype(jnp.int32)
        u = (H - Hint.astype(jnp.float32)) + (o0 + t_f * f_lo)
        fl_u = jnp.floor(u)
        fr = u - fl_u
        wr = t_i * ds_int + Hint + fl_u.astype(jnp.int32)
        adjust = (wr < 0) & (fr > 0.0)
        wr = jnp.where(adjust, wr + 1, wr)
        fr = jnp.where(adjust, fr - 1.0, fr)
        p = extra + wr
        # row-constant coarse realign (positions are nondecreasing: min at 0)
        shift = p[:, 0:1]
        b7 = shift >> 7
        S = strips.shape[-1]
        Hmax = (S - W) // 128 + 1
        w1 = jnp.zeros((tile, W), jnp.float32)
        for h in range(Hmax):
            w1 = w1 + strips[:, 128 * h : 128 * h + W] * (b7 == h).astype(
                jnp.float32
            )
        m = p - (b7 << 7)
        a = _gatherW(w1, m, W)
        b = _gatherW(w1, m + 1, W)
        parts.append(a + fr * (b - a))
    out_ref[...] = jnp.concatenate(parts, axis=-1)[:, :n]


def strip_resample(strips, scal, extra, *, n, interpret=False, tile=None):
    """Strided fractional resample of per-voice arena windows.

    strips (V, S) with S a multiple of 128 and >= RESAMPLE_W; scal (V, 4)
    packed trunc-form cursor scalars (pack_select_scalars); extra (V,)
    window offset of the integer cursor (the caller biases it so
    extra + trunc(relative) >= 0 always).  Returns (V, n) samples."""
    V, S = strips.shape
    if tile is None:
        tile = min(_tile_for(V), 8)  # bound VMEM: tile * S * 4 bytes
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_resample_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((V, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(strips, scal, extra[:, None].astype(jnp.int32))


# --- fully fused ring step ----------------------------------------------------


def _step_kernel(samples_ref, wpage_ref, extra_w_ref, rpage_ref, extra_r_ref,
                 kk_ref, fr_ref, gain_ref, mask_ref, pages_in, pages_out,
                 out_ref, *, tile, P, n, n_inner, K):
    """One pass per voice tile: place the new source block into its two ring
    pages, then resample both ears from the updated pages — the whole ring
    streams HBM->VMEM->HBM exactly once per block."""
    i = pl.program_id(0)
    S = 2 * PAGE
    pages = pages_in[...].reshape(tile, P, PAGE)

    # -- write: build the 2-page strip, place samples, scatter back
    wpage = wpage_ref[...]  # (tile, 1)
    wp1 = jnp.where(wpage + 1 >= P, wpage + 1 - P, wpage + 1)
    strip_lo = jnp.zeros((tile, PAGE), jnp.float32)
    strip_hi = jnp.zeros((tile, PAGE), jnp.float32)
    for p in range(P):
        pg = pages[:, p, :]
        strip_lo = strip_lo + pg * (wpage == p).astype(jnp.float32)
        strip_hi = strip_hi + pg * (wp1 == p).astype(jnp.float32)
    strip = jnp.concatenate([strip_lo, strip_hi], axis=-1)  # (tile, S)

    extra = extra_w_ref[...]  # (tile, 1)
    q = extra // 128
    rem = extra - q * 128
    a = rem // 16
    b = rem - a * 16
    src = samples_ref[...]
    s0 = jnp.concatenate(
        [src, jnp.zeros((tile, S - n_inner), jnp.float32)], axis=-1
    )
    s1 = jnp.zeros_like(s0)
    for k in range(8):
        s1 = s1 + _shift_right(s0, 128 * k, S) * (q == k)
    s2 = jnp.zeros_like(s1)
    for k in range(8):
        s2 = s2 + _shift_right(s1, 16 * k, S) * (a == k)
    s3 = jnp.zeros_like(s2)
    for k in range(16):
        s3 = s3 + _shift_right(s2, k, S) * (b == k)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, S), 1)
    keep = (lane >= extra) & (lane < extra + n_inner)
    strip = jnp.where(keep, s3, strip)

    new_pages = []
    for p in range(P):
        sel0 = (wpage == p).astype(jnp.float32)
        sel1 = (wp1 == p).astype(jnp.float32)
        old = pages[:, p, :]
        pg = (
            old * (1.0 - sel0) * (1.0 - sel1)
            + strip[:, :PAGE] * sel0
            + strip[:, PAGE:] * sel1
        )
        new_pages.append(pg)
    pages2 = jnp.stack(new_pages, axis=1)  # (tile, P, PAGE)
    pages_out[...] = pages2.reshape(tile * P, PAGE)

    # -- read: per-ear 2-page strips from the UPDATED pages
    rpage = rpage_ref[...]  # (tile, 2, 1)
    rp1 = jnp.where(rpage + 1 >= P, rpage + 1 - P, rpage + 1)
    rlo = jnp.zeros((tile, 2, PAGE), jnp.float32)
    rhi = jnp.zeros((tile, 2, PAGE), jnp.float32)
    for p in range(P):
        pg = new_pages[p][:, None, :]
        rlo = rlo + pg * (rpage == p).astype(jnp.float32)
        rhi = rhi + pg * (rp1 == p).astype(jnp.float32)
    rstrips = jnp.concatenate([rlo, rhi], axis=-1)  # (tile, 2, S)

    # -- realign + banded one-hot matmul resample (this fused variant
    # keeps the original E-matmul design; the default path's _select_kernel
    # moved to the per-element dynamic gather)
    extra_r = extra_r_ref[...]
    b7 = extra_r >> 7
    b4 = (extra_r >> 4) & 7
    b1 = extra_r & 15
    tile2 = tile * 2
    SB = SELECT_SB if n % SELECT_SB == 0 else n
    kk = kk_ref[...]
    fr = fr_ref[...]
    Wf = SB + 2 * K + 2
    parts = []
    for sb in range(n // SB):
        W4 = Wf + 15
        W7 = W4 + 112
        w1 = jnp.zeros((tile, 2, W7), jnp.float32)
        for h in range(1023 // 128 + 1):
            off = sb * SB + 128 * h
            w1 = w1 + rstrips[:, :, off : off + W7] * (b7 == h).astype(jnp.float32)
        w2 = jnp.zeros((tile, 2, W4), jnp.float32)
        for h in range(8):
            w2 = w2 + w1[:, :, 16 * h : 16 * h + W4] * (b4 == h).astype(jnp.float32)
        w3 = jnp.zeros((tile, 2, Wf), jnp.float32)
        for h in range(16):
            w3 = w3 + w2[:, :, h : h + Wf] * (b1 == h).astype(jnp.float32)
        w3r = w3.reshape(tile2, Wf)
        kk_sb = kk[:, :, sb * SB : (sb + 1) * SB].reshape(tile2, SB)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SB, Wf), 2)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SB, Wf), 1)
        E = (m_iota == j_iota + kk_sb[:, :, None]).astype(jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        a_sb = jax.lax.dot_general(E, w3r, dn, preferred_element_type=jnp.float32)
        w3b = jnp.concatenate(
            [w3r[:, 1:], jnp.zeros((tile2, 1), jnp.float32)], axis=-1
        )
        b_sb = jax.lax.dot_general(E, w3b, dn, preferred_element_type=jnp.float32)
        fr_sb = fr[:, :, sb * SB : (sb + 1) * SB].reshape(tile2, SB)
        parts.append((a_sb + fr_sb * (b_sb - a_sb)).reshape(tile, 2, SB))
    s = jnp.concatenate(parts, axis=-1)

    jn = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2).astype(jnp.float32)
    g = gain_ref[...]
    gains = g[:, :, 0:1] + jn * g[:, :, 1:2]
    contrib = jnp.sum(s * gains * mask_ref[...][:, :, None], axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def ring_step(pages, samples, wpage, extra_w, rpage, extra_r, kk, fr, gain0,
              d_gain, maskf, *, P, K, interpret=False):
    """Fused delay-ring step: write the block + resample both ears + masked
    voice reduction, streaming the page array through VMEM exactly once.

    pages (V*P, PAGE); samples (V, n_inner); wpage/extra_w (V,); rpage/
    extra_r (V, 2); kk (V, 2, n); fr (V, 2, n); gain0/d_gain (V, 2);
    maskf (V,).  Returns (pages', out (2, n))."""
    VP, _ = pages.shape
    V = VP // P
    n = kk.shape[2]
    n_inner = samples.shape[1]
    tile = _tile_for(V)
    gain = jnp.stack([gain0, d_gain], axis=-1)
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec((tile, n_inner), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile * P, PAGE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile * P, PAGE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _step_kernel, tile=tile, P=P, n=n, n_inner=n_inner, K=K
        ),
        out_shape=(
            jax.ShapeDtypeStruct((VP, PAGE), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ),
        grid_spec=grid_spec,
        input_output_aliases={9: 0},
        interpret=interpret,
    )(samples, wpage.astype(jnp.int32)[:, None], extra_w.astype(jnp.int32)[:, None],
      rpage.astype(jnp.int32)[:, :, None], extra_r.astype(jnp.int32)[:, :, None],
      kk, fr, gain, maskf[:, None], pages)


# --- self-DMA ring step (experimental; ROADMAP item 1) -------------------------
#
# Replaces the XLA page gather/scatter entirely: the kernel DMAs each voice's
# touched pages itself.  The ring gains one MIRROR page per voice
# (row P := row 0) so write strips and read windows are always contiguous —
# one 2*PAGE DMA each.  Aligned 1-D HBM slices into native 1-D VMEM scratch
# measured ~0.12 us/DMA on the v5e.


def _dma_kernel(wpage_ref, rpage_ref, samples_ref, extra_w_ref, sc0_ref,
                sc1_ref, g0_ref, g1_ref, mask_ref, e0_ref,
                e1_ref, ring_in, ring_out, out_ref, *scr, tile, P, n, n_inner, K):
    S = 2 * PAGE
    rowlen = (P + 1) * PAGE
    sems = scr[-1]  # DMA sems (tile, 8)
    wb = scr[:tile]                 # write strips, 1-D (S,)
    rb0 = scr[tile : 2 * tile]      # ear-0 read strips
    rb1 = scr[2 * tile : 3 * tile]  # ear-1 read strips
    i = pl.program_id(0)

    def wdma(r, out):
        v = i * tile + r
        off = pl.multiple_of(v * rowlen + wpage_ref[v] * PAGE, PAGE)
        hbm = (ring_out if out else ring_in).at[pl.ds(off, S)]
        sem = sems.at[r, 1 if out else 0]
        if out:
            return pltpu.make_async_copy(wb[r], hbm, sem)
        return pltpu.make_async_copy(hbm, wb[r], sem)

    def mirror_dma(r, kind):
        # kind 0: wrote row 0 -> refresh mirror row P
        # kind 1: wrote mirror row P -> refresh row 0
        v = i * tile + r
        base = v * rowlen
        if kind == 0:
            src = wb[r].at[pl.ds(0, PAGE)]
            dst = ring_out.at[pl.ds(pl.multiple_of(base + P * PAGE, PAGE), PAGE)]
        else:
            src = wb[r].at[pl.ds(PAGE, PAGE)]
            dst = ring_out.at[pl.ds(pl.multiple_of(base, PAGE), PAGE)]
        return pltpu.make_async_copy(src, dst, sems.at[r, 2 + kind])

    def rdma(r, e):
        v = i * tile + r
        rp = rpage_ref[v * 2 + e]
        off = pl.multiple_of(v * rowlen + rp * PAGE, PAGE)
        buf = (rb0 if e == 0 else rb1)[r]
        return pltpu.make_async_copy(
            ring_out.at[pl.ds(off, S)], buf, sems.at[r, 4 + e]
        )

    # pipeline: write-in all rows; per row place + write-out; read after the
    # row's write-out lands (read pages can include the written ones)
    for r in range(tile):
        wdma(r, out=False).start()

    # place all rows (vectorized at full occupancy once strips are in)
    for r in range(tile):
        wdma(r, out=False).wait()
    strips = jnp.concatenate(
        [wb[r][...].reshape(1, S) for r in range(tile)], axis=0
    )
    extra = extra_w_ref[...]
    q = extra // 128
    rem = extra - q * 128
    a_ = rem // 16
    b_ = rem - a_ * 16
    src = samples_ref[...]
    s0 = jnp.concatenate(
        [src, jnp.zeros((tile, S - n_inner), jnp.float32)], axis=-1
    )
    s1 = jnp.zeros_like(s0)
    for k in range(8):
        s1 = s1 + _shift_right(s0, 128 * k, S) * (q == k)
    s2 = jnp.zeros_like(s1)
    for k in range(8):
        s2 = s2 + _shift_right(s1, 16 * k, S) * (a_ == k)
    s3 = jnp.zeros_like(s2)
    for k in range(16):
        s3 = s3 + _shift_right(s2, k, S) * (b_ == k)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, S), 1)
    keep = (lane >= extra) & (lane < extra + n_inner)
    placed = jnp.where(keep, s3, strips)

    for r in range(tile):
        wb[r][...] = placed[r]
        wdma(r, out=True).start()
    for r in range(tile):
        v = i * tile + r
        wdma(r, out=True).wait()

        @pl.when(wpage_ref[v] == 0)
        def _():
            mirror_dma(r, 0).start()
            mirror_dma(r, 0).wait()

        @pl.when(wpage_ref[v] + 1 == P)
        def _():
            mirror_dma(r, 1).start()
            mirror_dma(r, 1).wait()

        rdma(r, 0).start()
        rdma(r, 1).start()

    for r in range(tile):
        rdma(r, 0).wait()
        rdma(r, 1).wait()
    strips0 = jnp.concatenate(
        [rb0[r][...].reshape(1, S) for r in range(tile)], axis=0
    )
    strips1 = jnp.concatenate(
        [rb1[r][...].reshape(1, S) for r in range(tile)], axis=0
    )

    jn = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    m = mask_ref[...]
    rows = []
    for strips_e, sc_ref, g_ref, e_ref in (
        (strips0, sc0_ref, g0_ref, e0_ref),
        (strips1, sc1_ref, g1_ref, e1_ref),
    ):
        samp = _ear_pipeline(strips_e, sc_ref[...], e_ref[...], n=n, K=K)
        g = g_ref[...]
        gains = g[:, 0:1] + jn * g[:, 1:2]
        rows.append(jnp.sum(samp * gains * m, axis=0, keepdims=True))
    contrib = jnp.concatenate(rows, axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def ring_step_dma(ring, samples, wpage, extra_w, rpage, extra_r, scal,
                  gain0, d_gain, maskf, *, P, K, n, interpret=False):
    """Fused ring step with in-kernel page DMAs.  ``ring`` is (V, (P+1)*PAGE)
    flat rows with the mirror invariant row[P] == row[0].  ``scal`` is the
    (V, 2, 4) packed cursor-scalar array (pack_select_scalars).
    Returns (ring', out (2, n))."""
    V = ring.shape[0]
    rowlen = (P + 1) * PAGE
    n_inner = samples.shape[1]
    tile = _tile_for(V)
    gain = jnp.stack([gain0, d_gain], axis=-1)

    def ts(*shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // tile,),
        in_specs=[
            ts(tile, n_inner),
            ts(tile, 1),
            ts(tile, 4), ts(tile, 4),
            ts(tile, 2), ts(tile, 2),
            ts(tile, 1),
            ts(tile, 1), ts(tile, 1),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((2, n), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2 * PAGE,), jnp.float32) for _ in range(3 * _tile_for(V))]
        + [pltpu.SemaphoreType.DMA((_tile_for(V), 8))],
    )
    e = extra_r.astype(jnp.int32)
    flat, out = pl.pallas_call(
        functools.partial(
            _dma_kernel, tile=tile, P=P, n=n, n_inner=n_inner, K=K
        ),
        out_shape=(
            jax.ShapeDtypeStruct((V * rowlen,), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ),
        grid_spec=grid_spec,
        input_output_aliases={11: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        wpage.astype(jnp.int32), rpage.astype(jnp.int32).reshape(-1),
        samples, extra_w.astype(jnp.int32)[:, None],
        scal[:, 0], scal[:, 1],
        gain[:, 0], gain[:, 1], maskf[:, None],
        e[:, 0:1], e[:, 1:2],
        ring.reshape(-1),
    )
    return flat.reshape(V, rowlen), out
