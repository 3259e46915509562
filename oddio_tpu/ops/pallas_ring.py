"""Pallas TPU kernels for the spatial delay rings — the hot ops.

XLA lowers *elementwise* per-voice gathers/scatters on TPU to near-serial
loops (measured ~56 ms for one (4096, 1024)-index gather from (4096, 16384));
every kernel here is built so only row-granular or slab-shaped data moves.

Two ring families share these kernels:

* The DR buffered pool's FLAT layout (spatial.py::_BufferedPoolDR): rings
  are (V, front + L + mirror + slack) rows; a shared write cursor makes
  appends page-aligned slabs (``flat_append_aligned`` maps output blocks
  straight onto the written pages via a scalar-prefetched index, so the
  in-place append costs exactly the bytes written), and the mirror region
  makes every read window contiguous for ``window_select``.
* The host buffered pool's row-strip layout ((V*rows, 256)): per-voice
  cursors differ, so writes gather row strips, ``strip_place`` inserts at
  the per-voice offset, and XLA scatters rows back; ``strip_select`` adds
  a masked 128-granule realign stage for the row-remainder offsets.

Read positions are reconstructed in-kernel from 4 scalars/(voice, ear)
with the exact split-ds math (ops/_dev.py), so nothing per-frame streams
from HBM.  Positions are near-linear (``pos_j ≈ const + j*ds``,
``ds = 1 ± v/c``), ``a_j = win[extra + j + k_j]`` with ``k_j`` bounded by
2K; the per-element lookup rides Mosaic's 128-lane dynamic gather
(jnp.take_along_axis inside the kernel; see _gather3).  ``strip_resample``
extends the same pattern to wavetable/sampler reads at arbitrary stride.

``K`` bounds the per-chunk doppler walk (|ds-1|*chunk <= 2K); K=64 at
512-frame chunks covers radial velocities beyond ±40 m/s (clamped above —
where the reference itself pops).  Blocks larger than a chunk re-baseline
cursors between chunks (ops/_dev.py::chunked_frames).
"""

from __future__ import annotations

import functools
import os

import numpy as np

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


def _pad_v(V):
    """Mosaic voice-tile floor (tools/r4_probe9.py lowering sweep): grids
    over the voice axis need 8-row tiles on real TPU — the gather lowering
    rule rejects 1-row take_along_axis operands, and any blocked
    second-minor dim must divide by 8 (so tile 2/4 only lowers when it
    covers the WHOLE array).  Wrappers pad V up to a multiple of 8 and
    slice/mask the result back; CPU interpret mode never needs it but
    takes the same path so tests cover the padded shapes."""
    return -(-V // 8) * 8


def _pad0(x, V8):
    """Zero-pad the leading (voice) axis of ``x`` up to V8 rows."""
    V = x.shape[0]
    if V == V8:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((V8 - V,) + x.shape[1:], x.dtype)], axis=0
    )


def _realign_rows(wide, b, width, H):
    """win = wide[:, 128*b : 128*b + width] for a ROW-CONSTANT shift
    ``b`` (tile, 1) int32 in [0, H): a ceil(log2(H))-stage comparison
    shifter of static slices + broadcast selects.  Replaces the H-way
    one-hot masked sum (2 vector ops x H x width) with ~log2(H) selects
    of shrinking width — valid ONLY for row-constant shift amounts
    (per-element shifts detach masks; see the module notes).  ``wide``
    must be at least width + 128*(H-1) wide; every intermediate slice is
    statically in-bounds (step = ceil(rem/2) keeps step + rem' = rem)."""
    rem = H - 1
    cur = wide[:, : width + 128 * rem]
    while rem > 0:
        step = (rem + 1) // 2
        rem2 = max(step - 1, rem - step)
        w2 = width + 128 * rem2
        cond = b >= step
        cur = jnp.where(cond, cur[:, 128 * step : 128 * step + w2],
                        cur[:, :w2])
        b = jnp.where(cond, b - step, b)
        rem = rem2
    return cur


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
    V0, S = strips.shape
    n_inner = samples.shape[1]
    if count is None:
        count = jnp.full((V0,), n_inner, jnp.int32)
    V = _pad_v(V0)
    strips = _pad0(strips, V)
    samples = _pad0(samples, V)
    extra = _pad0(extra, V)
    count = _pad0(count, V)
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
    out = pl.pallas_call(
        functools.partial(_place_kernel, n_inner=n_inner, S=S),
        out_shape=jax.ShapeDtypeStruct((V, S), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(samples, strips, extra[:, None].astype(jnp.int32),
      count[:, None].astype(jnp.int32))
    return out[:V0]


# --- flat-ring aligned append --------------------------------------------------
#
# SUPERSEDED by rows_append_dma for production (the flat (V, rowlen)
# layout it writes needs a physically-relayouting reshape before the
# row-gather read — ~300 MB/block at 4096 voices; ROADMAP.md probe
# notes).  Retained for the probe suite that documents that measurement
# trail (tools/r3_probe*.py).
#
# The DR buffered pool's shared write cursor advances by exactly n frames
# per block whenever the inner rate equals the scene rate (the flagship
# config), so with n a multiple of 512 every append is a 512-aligned
# full-page slab.  This kernel maps the OUTPUT blocks straight onto the
# written pages via a scalar-prefetched page index — the ring is aliased
# in place and never streamed, so the append costs exactly the bytes
# written (measured 0.06 ms at 4096 voices).

APPEND_PW = 512  # page width of the aligned append path


def _append_kernel(pcol_ref, pmir_ref, samples_ref, ring_hbm, out_ref, *, PW):
    del pcol_ref, pmir_ref, ring_hbm, PW
    out_ref[...] = samples_ref[...]


def flat_append_aligned(ring, samples, pcol, pmir, *, interpret=False,
                        tile=None):
    """Write ``samples`` (V, W) with W a multiple of APPEND_PW into
    ``ring`` (V, rowlen) at column ``pcol*APPEND_PW`` (page-granular), and
    an identical mirror-maintenance copy at page ``pmir`` (the caller
    points it at the mirror twin or at a dump page).  In-place on the
    donated ring; only the written pages move."""
    V, rowlen = ring.shape
    W = samples.shape[1]
    npg = W // APPEND_PW
    assert W % APPEND_PW == 0
    if tile is None:
        tile = _tile_for(V)
    pcol = jnp.asarray(pcol, jnp.int32).reshape(1)
    pmir = jnp.asarray(pmir, jnp.int32).reshape(1)

    def ring_map(i, j, leg, pcol_ref, pmir_ref):
        return (i, jnp.where(leg == 0, pcol_ref[0], pmir_ref[0]) + j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // tile, npg, 2),
        in_specs=[
            pl.BlockSpec(
                (tile, APPEND_PW), lambda i, j, leg, *_: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile, APPEND_PW), ring_map, memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_append_kernel, PW=APPEND_PW),
        out_shape=jax.ShapeDtypeStruct((V, rowlen), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=interpret,
    )(pcol, pmir, samples, ring)


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

    Returns (kk, fr): kk = clip(whole - j + K, 0, 2K) in [0, 2K] as f32
    (an exact small integer — callers convert where an index is needed),
    fr in [0, 1).

    The pipeline is all-f32 (no int32 round trips): every quantity is an
    integer below 2^23 so products/sums are exact, and using floor(H)
    where the int32 path truncated is bit-identical — for negative
    non-integer H, u and fl_u both shift by +1 and the shift cancels in
    ``whole`` while fr is unchanged."""
    tile = scal.shape[0]
    o0 = scal[:, 0:1]
    f_hi = scal[:, 1:2]
    f_lo = scal[:, 2:3]
    dsm1 = scal[:, 3:4] - 1.0  # ds_int - 1 (exact small int as f32)
    # Mosaic has no f32 iota; one int iota + convert (the convert replaces
    # the int path's t_i add, so the op count still drops)
    t_f = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1).astype(jnp.float32)
        + np.float32(j0)
    )
    H = t_f * f_hi  # exact f32 product for t < 4096 (12-bit f_hi)
    Hf = jnp.floor(H)
    u = (H - Hf) + (o0 + t_f * f_lo)
    fl_u = jnp.floor(u)
    fr = u - fl_u
    kk = jnp.clip(
        t_f * dsm1 + Hf + fl_u + np.float32(K), 0.0, np.float32(2 * K)
    )
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
        kk_f, fr_sb = _positions_sb(scal, sb * SB, SB, K)
        kk_sb = kk_f.astype(jnp.int32)  # exact small ints
        # kk is monotone in j (linear read positions), so the row min is at
        # an end; jnp.min keeps this robust to clipping either way.
        kmin = jnp.min(kk_sb, axis=-1, keepdims=True)
        shift = extra + kmin  # (tile, 1) in [0, emax-1 + 2K]
        b7 = shift >> 7
        w1 = _realign_rows(strips[:, sb * SB :], b7, SELECT_W, H7)
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
    V0, S = strips.shape
    V = _pad_v(V0)
    strips = _pad0(strips, V)
    scal = _pad0(scal, V)
    gain0 = _pad0(gain0, V)
    d_gain = _pad0(d_gain, V)
    maskf = _pad0(maskf, V)  # padded voices mix with mask 0
    extra = _pad0(extra, V)
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


# --- flat-window select (the DR buffered pool's read kernel) -------------------
#
# With the flat (V, rowlen) ring layout (mirror region makes every read
# window contiguous), XLA hands the kernel one exact per-voice window
# whose start is the shared-ear base cm - K: the per-ear lane offset is
# just the inter-ear stagger (< ~40 lanes at 48 kHz), so positions reach
# the whole lookup range through _gather3 directly — the 128-granule
# masked realign loop of _select_kernel (the old row layout's remainder
# handling, ~40% of its VPU work) vanishes.


def _ear_pipeline_flat(strips, scal, extra, *, n, K, W, SB=SELECT_SB):
    """a_j = strips[extra + j + kk_j] lerped with fr_j; extra (tile, 1) is
    the ear's stagger within the window, in [0, W - SB - 2K - 1).  SB must
    be 128: Mosaic's dynamic_gather requires index shapes to match its
    128-lane tables (a 256-frame sub-block fails to lower)."""
    tile = strips.shape[0]
    parts = []
    for sb in range(-(-n // SB)):
        kk_sb, fr_sb = _positions_sb(scal, sb * SB, SB, K)
        w1 = strips[:, sb * SB : sb * SB + W]
        m = extra + jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1) + kk_sb.astype(jnp.int32)
        a_sb = _gatherW(w1, m, W)
        b_sb = _gatherW(w1, m + 1, W)
        parts.append(a_sb + fr_sb * (b_sb - a_sb))
    out = jnp.concatenate(parts, axis=-1)
    return out[:, :n]


def _gather_pair(w1, w1s, m, W):
    """(a, b) = (w1[m], w1[m+1]) for m in [0, W-2], sharing ONE set of
    per-element indices: b rides the pre-shifted twin ``w1s`` (w1s[k] =
    w1[k+1]) at the SAME index, so the pair costs 2W/128 gathers but only
    one index/select pipeline.  No clips: m & 127 is always a valid lane
    and m >> 7 selects the table (callers guarantee m in range)."""
    idx = m & 127
    hi = m >> 7
    a = jnp.take_along_axis(w1[:, 0:128], idx, axis=-1)
    b = jnp.take_along_axis(w1s[:, 0:128], idx, axis=-1)
    for c in range(1, W // 128):
        sel = hi == c
        ga = jnp.take_along_axis(w1[:, 128 * c : 128 * (c + 1)], idx, axis=-1)
        gb = jnp.take_along_axis(w1s[:, 128 * c : 128 * (c + 1)], idx, axis=-1)
        a = jnp.where(sel, ga, a)
        b = jnp.where(sel, gb, b)
    return a, b


def _ears_pipeline_flat(strips, scals, extras, *, n, K, W, SB=SELECT_SB,
                        frz=None):
    """Both ears' fractional reads from one shared window, with the
    per-sub-block lookup tables (and their +1-shifted lerp twins) built
    once and shared across ears.  Output-identical to calling
    _ear_pipeline_flat per ear; ~40% fewer VPU ops on the gather leg
    (shared index math, no clips, pre-shifted b tables).

    ``frz``: optional per-ear (tile, 1) f32 FROZEN flags.  A fully
    offset-clamped voice reads with ds = 0 (spatial.rs:414-416 clamps both
    offsets to -max_delay, so ring.rs:51-79's per-frame step dt*rate is
    exactly zero): every frame reads the SAME fractional position, whose
    value is exactly the pipeline's j = 0 sample — the per-element walk's
    ``kk = fl_u + K - j`` would clip at j > K and misread.  Flagged rows
    replace their samples with the j = 0 value broadcast across the block
    (bit-exact: frame 0's position math is shared), so clamped voices ride
    the TIGHT tier instead of demoting the pool to a 2K >= n wide tier."""
    tile = strips.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1)
    # ONE +1-shifted lerp twin over the whole window, sliced per sub-block
    # (b's max index is W-2 — select_tables carries the +1 — so neither
    # the final zero lane nor a non-final sub-block's W-1 lane, which here
    # holds the next real sample instead of the old per-sub-block zero
    # pad, is ever read)
    s1 = jnp.concatenate(
        [strips[:, 1:], jnp.zeros((tile, 1), jnp.float32)], axis=-1
    )
    outs = ([], [])
    for sb in range(-(-n // SB)):
        w1 = strips[:, sb * SB : sb * SB + W]
        w1s = s1[:, sb * SB : sb * SB + W]
        for e in range(2):
            kk_sb, fr_sb = _positions_sb(scals[e], sb * SB, SB, K)
            m = extras[e] + iota + kk_sb.astype(jnp.int32)
            a_sb, b_sb = _gather_pair(w1, w1s, m, W)
            outs[e].append(a_sb + fr_sb * (b_sb - a_sb))
    out = tuple(
        jnp.concatenate(p, axis=-1)[:, :n] if len(p) > 1 else p[0][:, :n]
        for p in outs
    )
    if frz is not None:
        out = tuple(
            jnp.where(frz[e] > 0.0, outs[e][0][:, 0:1], out[e])
            for e in range(2)
        )
    return out


#: voice-mix reduction on the MXU (two (1, tile) x (tile, n) matvecs per
#: ear — the gain ramp distributes: sum_v (g0_v + j dg_v) s_vj =
#: (g0.S)_j + j (dg.S)_j) instead of a VPU broadcast-multiply + sublane
#: reduction.  Bit-parity caveat: the MXU's f32 accumulation order may
#: differ from the VPU tree sum by ~1 ulp per voice tile (well inside the
#: 1e-5 golden contract); flip off for bit-exact VPU reduction.
SELECT_MXU_REDUCE = os.environ.get("ODDIO_SELECT_MXU", "1") == "1"



def _mix_rows(samps, gs, n):
    """Mask-premultiplied gain-ramped voice mix: (2, n) from per-ear
    (tile, n) samples and (tile, 2) [gain0*mask, d_gain*mask] rows
    (refs or arrays)."""
    jn = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    rows = []
    for samp, g in zip(samps, gs):
        if not isinstance(g, jnp.ndarray):
            g = g[...]
        if SELECT_MXU_REDUCE:
            dn = (((0,), (0,)), ((), ()))
            m0 = jax.lax.dot_general(
                g[:, 0:1], samp, dn, preferred_element_type=jnp.float32
            )
            m1 = jax.lax.dot_general(
                g[:, 1:2], samp, dn, preferred_element_type=jnp.float32
            )
            rows.append(m0 + jn * m1)
        else:
            gains = g[:, 0:1] + jn * g[:, 1:2]
            rows.append(jnp.sum(samp * gains, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)  # (2, n)


def _select_flat_kernel(s_ref, sc0_ref, sc1_ref, g0_ref, g1_ref,
                        e0_ref, e1_ref, out_ref, *, n, K, W):
    i = pl.program_id(0)
    strips = s_ref[...]  # ONE window per voice, shared by both ears
    samps = _ears_pipeline_flat(
        strips, (sc0_ref[...], sc1_ref[...]), (e0_ref[...], e1_ref[...]),
        n=n, K=K, W=W,
    )
    contrib = _mix_rows(samps, (g0_ref, g1_ref), n)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def select_tables(emax2, K=64, SB=SELECT_SB):
    """Lookup-table width (a multiple of 128) the flat select kernel needs:
    per sub-block the index spans extra (< emax2) + lane (< SB) + doppler
    walk (<= 2K) + 1 (lerp)."""
    return -(-(emax2 + SB + 2 * K + 1) // 128) * 128


def select_window(n, emax2, K=64, SB=SELECT_SB):
    """Total per-voice window width for an n-frame block."""
    nsb = -(-n // SB)
    return (nsb - 1) * SB + select_tables(emax2, K, SB)


def window_select(windows, scal, gain0, d_gain, maskf, extra, *, n, K,
                  emax2=None, interpret=False, tile=None):
    """Fractional per-ear reads + gain ramps + masked mix from flat
    per-voice windows.

    windows (V, S): contiguous per-voice read windows starting at the
    shared base ``cm - K`` row-quantized (S >= select_window(...)); extra
    (V, 2): each ear's start stagger within the window (< emax2, default
    SELECT_W - SB - 2K - 1); scal (V, 2, 4) packed cursor scalars
    (pack_select_scalars); gain0/d_gain (V, 2); maskf (V,).  Returns the
    mixed (2, n) block (ring.rs:51-79, spatial.rs:409-431)."""
    V0, S = windows.shape
    V = _pad_v(V0)
    windows = _pad0(windows, V)
    scal = _pad0(scal, V)
    gain0 = _pad0(gain0, V)
    d_gain = _pad0(d_gain, V)
    maskf = _pad0(maskf, V)  # padded voices fold into the gains as 0
    extra = _pad0(extra, V)
    W = SELECT_W if emax2 is None else select_tables(emax2, K)
    if tile is None:
        tile = _tile_for(V)
    # mask folds into the gains (exact: maskf is 0/1), so the kernel mixes
    # without a separate mask operand/multiply
    gain = jnp.stack([gain0, d_gain], axis=-1) * maskf[:, None, None]

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
            ts(tile, 1), ts(tile, 1),
        ],
        out_specs=pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    e = extra.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_select_flat_kernel, n=n, K=K, W=W),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        windows,
        scal[:, 0], scal[:, 1],
        gain[:, 0], gain[:, 1],
        e[:, 0:1], e[:, 1:2],
    )


def _select_tiles_kernel(s_ref, sh_ref, sc0_ref, sc1_ref, g0_ref, g1_ref,
                         e0_ref, e1_ref, *rest,
                         n, K, W, H, WIN):
    # rest = (f0_ref, f1_ref, out_ref) when per-ear frozen flags ship,
    # else (out_ref,) — the flag-less variant is a distinct traced program
    if len(rest) == 3:
        f0_ref, f1_ref, out_ref = rest
        frz = (f0_ref[...], f1_ref[...])
    else:
        (out_ref,) = rest
        frz = None
    i = pl.program_id(0)
    wide = s_ref[...]  # (tile, S2) tile-granule gathered spans
    b = sh_ref[...]    # (tile, 1) per-voice coarse shift, in rows
    # ONE per-voice coarse realign (the granule remainder is row-constant):
    # a log2(H)-stage comparison shifter, vs. paying the remainder inside
    # every sub-block's lookup tables (probe13: tables at W=1408 cost more
    # than the whole narrow pipeline)
    win = _realign_rows(wide, b, WIN, H)
    samps = _ears_pipeline_flat(
        win, (sc0_ref[...], sc1_ref[...]), (e0_ref[...], e1_ref[...]),
        n=n, K=K, W=W, frz=frz,
    )
    contrib = _mix_rows(samps, (g0_ref, g1_ref), n)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def window_select_tiles(wide, rowshift, scal, gain0, d_gain, maskf, extra,
                        *, n, K, emax2, interpret=False, tile=None,
                        hmax=None):
    """window_select over TILE-granule gathered spans: ``wide`` (V, S2) holds
    each voice's read window embedded at a (V-dependent) multiple-of-128
    offset given by ``rowshift`` (V,) in [0, (S2 - WIN)/128]; the kernel
    realigns once per voice and then runs the narrow flat pipeline.  Lets
    the caller gather whole (8, 128) tiles — the physically-linear granule,
    ~9x cheaper per byte than row granules (tools/r3_probe13.py) — without
    widening the per-sub-block lookup tables.  extra (V, 2) staggers within
    the realigned window (< emax2); ``hmax`` bounds rowshift+1 when the
    caller guarantees a tighter range (e.g. 8 for a granule remainder),
    trimming dead realign adds; other args as window_select."""
    V, S2 = wide.shape
    W = select_tables(emax2, K)
    WIN = select_window(n, emax2, K)
    H = (S2 - WIN) // 128 + 1
    if hmax is not None:
        H = min(H, hmax)
    assert S2 >= WIN
    # mask folds into the gains (exact: maskf is 0/1) — no kernel operand
    gain = jnp.stack([gain0, d_gain], axis=-1) * maskf[:, None, None]
    e = extra.astype(jnp.int32)
    return window_select_tiles_ears(
        wide, rowshift,
        (scal[:, 0], scal[:, 1]),
        (gain[:, 0], gain[:, 1]),
        (e[:, 0:1], e[:, 1:2]),
        n=n, K=K, emax2=emax2, interpret=interpret, tile=tile, hmax=hmax,
    )


def window_select_tiles_ears(wide, rowshift, scal01, g01, e01, *, n, K,
                             emax2, interpret=False, tile=None, hmax=None,
                             frz01=None):
    """window_select_tiles with PER-EAR operands — the kernel consumes
    per-ear refs anyway, so component-split callers skip the (V, 2, ...)
    stack/slice relayout round trip.  scal01: two (V, 4) packed cursor
    rows; g01: two (V, 2) [gain0, d_gain] rows with the voice mask already
    folded in; e01: two (V, 1) int32 staggers; frz01: optional two (V, 1)
    f32 frozen flags (fully offset-clamped voices, ds = 0 — see
    _ears_pipeline_flat)."""
    V0, S2 = wide.shape
    V = _pad_v(V0)
    wide = _pad0(wide, V)
    rowshift = _pad0(rowshift, V)
    scal01 = tuple(_pad0(s, V) for s in scal01)
    g01 = tuple(_pad0(g, V) for g in g01)  # mask-folded: padded gains are 0
    e01 = tuple(_pad0(e, V) for e in e01)
    if frz01 is not None:
        frz01 = tuple(_pad0(f, V) for f in frz01)
    W = select_tables(emax2, K)
    WIN = select_window(n, emax2, K)
    H = (S2 - WIN) // 128 + 1
    if hmax is not None:
        H = min(H, hmax)
    assert S2 >= WIN
    if tile is None:
        tile = _tile_for(V)

    def ts(*shape):
        return pl.BlockSpec(
            shape, lambda i: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        ts(tile, S2),
        ts(tile, 1),
        ts(tile, 4), ts(tile, 4),
        ts(tile, 2), ts(tile, 2),
        ts(tile, 1), ts(tile, 1),
    ]
    operands = [
        wide,
        rowshift.astype(jnp.int32)[:, None],
        scal01[0], scal01[1],
        g01[0], g01[1],
        e01[0], e01[1],
    ]
    if frz01 is not None:
        in_specs += [ts(tile, 1), ts(tile, 1)]
        operands += [frz01[0], frz01[1]]
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _select_tiles_kernel, n=n, K=K, W=W, H=H, WIN=WIN
        ),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)


# --- multi-block superwindow select ---------------------------------------------
#
# At ds ~= 1 a voice's read window advances ~n samples per block while the
# gathered span is ~2 granules wide: consecutive blocks of one dispatch
# re-gather ~75% identical granules.  This kernel renders NB blocks from
# ONE tile-granule superwindow per voice (gathered once, streamed into
# VMEM once): per block a static-offset slice + the usual row-constant
# realign recovers that block's window, then the unchanged narrow per-ear
# pipeline runs.  Gather bytes and kernel DMA-in drop ~NB/(NB+1)x vs NB
# separate selects; the per-block select math is bit-identical (same
# scalars, same window values), so audio equals the per-block path
# exactly.  The caller must have APPENDED all NB blocks' samples before
# gathering (reads never pass their own block's write cursor, so later
# blocks' samples are invisible to earlier blocks' in-contract reads) and
# must hold the ring-slack gate max_delay*rate + (NB-1)*adv + K + GW <=
# cap (so later appends cannot overwrite samples an earlier block still
# reads).


def _select_tiles_multi_kernel(s_ref, sh_ref, sc0_ref, sc1_ref, g0_ref,
                               g1_ref, e0_ref, e1_ref, f0_ref, f1_ref,
                               out_ref, *, n, K, W, WIN, nb, row0s, hs):
    i = pl.program_id(0)
    wide = s_ref[...]  # (tile, S2s) superwindow
    sh = sh_ref[...]
    sc = (sc0_ref[...], sc1_ref[...])
    g = (g0_ref[...], g1_ref[...])
    e = (e0_ref[...], e1_ref[...])
    f = (f0_ref[...], f1_ref[...])
    outs = []
    for b in range(nb):
        win = _realign_rows(
            wide[:, 128 * row0s[b] :], sh[:, b : b + 1], WIN, hs[b]
        )
        samps = _ears_pipeline_flat(
            win,
            tuple(sc[ear][:, 4 * b : 4 * b + 4] for ear in range(2)),
            tuple(e[ear][:, b : b + 1] for ear in range(2)),
            n=n, K=K, W=W,
            frz=tuple(f[ear][:, b : b + 1] for ear in range(2)),
        )
        outs.append(_mix_rows(
            samps, tuple(g[ear][:, 2 * b : 2 * b + 2] for ear in range(2)), n
        ))
    contrib = jnp.concatenate(outs, axis=-1)  # (2, nb*n)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def window_select_tiles_multi(wide, rowshift, scal01, g01, e01, frz01, *,
                              n, K, emax2, nb, row0s, hs, interpret=False,
                              tile=None):
    """NB-block select over one shared superwindow.

    wide (V, S2s): per-voice tile-granule superwindow covering every
    block's read window; rowshift (V, nb) int32: per-block coarse shift in
    rows RELATIVE to the static ``row0s[b]`` slice base (the caller
    guarantees 0 <= rowshift[:, b] < hs[b]); scal01/g01/e01/frz01: per-ear
    (V, nb*4) / (V, nb*2) / (V, nb) / (V, nb) packed per-block operand
    rows (gains mask-folded).  Returns the mixed (2, nb*n) block run."""
    V0, S2 = wide.shape
    V = _pad_v(V0)
    wide = _pad0(wide, V)
    rowshift = _pad0(rowshift, V)
    scal01 = tuple(_pad0(s, V) for s in scal01)
    g01 = tuple(_pad0(g, V) for g in g01)
    e01 = tuple(_pad0(e, V) for e in e01)
    frz01 = tuple(_pad0(f, V) for f in frz01)
    W = select_tables(emax2, K)
    WIN = select_window(n, emax2, K)
    for b in range(nb):
        assert 128 * row0s[b] + WIN + 128 * (hs[b] - 1) <= S2, (b, row0s, hs)
    if tile is None:
        tile = _tile_for(V)

    def ts(*shape):
        return pl.BlockSpec(
            shape, lambda i: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            ts(tile, S2),
            ts(tile, nb),
            ts(tile, 4 * nb), ts(tile, 4 * nb),
            ts(tile, 2 * nb), ts(tile, 2 * nb),
            ts(tile, nb), ts(tile, nb),
            ts(tile, nb), ts(tile, nb),
        ],
        out_specs=pl.BlockSpec(
            (2, nb * n), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _select_tiles_multi_kernel, n=n, K=K, W=W, WIN=WIN, nb=nb,
            row0s=tuple(row0s), hs=tuple(hs),
        ),
        out_shape=jax.ShapeDtypeStruct((2, nb * n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        wide,
        rowshift.astype(jnp.int32),
        scal01[0], scal01[1],
        g01[0], g01[1],
        e01[0].astype(jnp.int32), e01[1].astype(jnp.int32),
        frz01[0], frz01[1],
    )


# --- rows-native aligned append ------------------------------------------------
#
# (V, RPV, 128) ring arrays are PHYSICALLY linear on TPU (the (8, 128)
# tile groups 8 consecutive rows of one voice), so row views and flat
# views are free bitcasts — unlike (V, rowlen), whose tile groups 8
# VOICES and whose row-view reshape is a full relayout.  This kernel
# appends a page slab to every voice with ONE strided DMA per voice-tile
# (dst stride = a voice's row count), leaving the ring in the layout the
# read-side row gather consumes with no reshape.


def _rows_append_kernel(rows_ref, slab_any, ring_any, out_ref, sem0, sem1,
                        *, tile, nr):
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


def rows_append_dma(ring3, slab, r0, rmir0, *, interpret=False, tile=None):
    """Write ``slab`` (V, W) with W a multiple of 128 into every voice of
    ``ring3`` (V, RPV, 128) at row ``r0`` (plus a mirror-maintenance copy
    at ``rmir0``; point it at the mirror twin or a dump row).  In place on
    the donated ring; both legs are HBM -> HBM strided DMAs issued back to
    back from the slab operand (no VMEM staging round trip — the earlier
    blocked-spec form moved ~26 MB for a 10 MB write; tools/r4_probe7.py,
    parity exact, tile=V fastest)."""
    V, RPV, _ = ring3.shape
    W = slab.shape[1]
    nr = W // 128
    if tile is None:
        tile = int(os.environ.get("ODDIO_APPEND_TILE", "0")) or V
        while V % tile:
            tile //= 2
    rows = jnp.stack(
        [jnp.asarray(r0, jnp.int32), jnp.asarray(rmir0, jnp.int32)]
    )
    return pl.pallas_call(
        functools.partial(_rows_append_kernel, tile=tile, nr=nr),
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
        interpret=interpret,
    )(rows, slab.reshape(V, nr, 128), ring3)


# --- DMA window select ---------------------------------------------------------
#
# MEASURED SLOWER than the row-gather + window_select pair (1.30 vs
# 0.45 ms at 4096 voices: per-voice DMA issue cost binds) and not used in
# production; retained for the probe suite (tools/r3_probe10.py) that
# documents why per-voice window DMAs lose to row gathers on this stack.
#
# The kernel DMAs each voice's read window itself (one aligned 2-page
# slice per voice), realigns once per window (8 masked 128-granule
# levels) and runs the per-ear select; the ring is a plain read-only
# operand, so no gather HLO exists in the step.


def _dma_select_kernel(rwin_ref, ring_ref, rrem_ref, sc0_ref, sc1_ref,
                       g0_ref, g1_ref, mask_ref, e0_ref, e1_ref, out_ref,
                       *scratch, tile, n, K, W, WR, rowlen):
    sems = scratch[-1]
    bufs = scratch[:-1]
    i = pl.program_id(0)

    def dma(r):
        v = i * tile + r
        off = pl.multiple_of(v * rowlen + rwin_ref[v] * 1024, 1024)
        return pltpu.make_async_copy(
            ring_ref.at[pl.ds(off, 2048)], bufs[r], sems.at[r]
        )

    for r in range(tile):
        dma(r).start()
    for r in range(tile):
        dma(r).wait()
    win = jnp.concatenate(
        [bufs[r][...].reshape(1, 2048) for r in range(tile)], axis=0
    )

    # one whole-window realign per voice (shared by both ears and every
    # sub-block): the window was fetched 1024-aligned, so the coarse
    # remainder is rrem>>7 in [0, 8)
    rr = rrem_ref[...]  # (tile, 1)
    b7 = rr >> 7
    w2 = jnp.zeros((tile, WR), jnp.float32)
    for h in range(8):
        w2 = w2 + win[:, 128 * h : 128 * h + WR] * (b7 == h).astype(
            jnp.float32
        )

    jn = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    m = mask_ref[...]
    ex7 = rr & 127
    rows = []
    for sc_ref, g_ref, e_ref in (
        (sc0_ref, g0_ref, e0_ref),
        (sc1_ref, g1_ref, e1_ref),
    ):
        samp = _ear_pipeline_flat(
            w2, sc_ref[...], ex7 + e_ref[...], n=n, K=K, W=W
        )
        g = g_ref[...]
        gains = g[:, 0:1] + jn * g[:, 1:2]
        rows.append(jnp.sum(samp * gains * m, axis=0, keepdims=True))
    contrib = jnp.concatenate(rows, axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def dma_window_select(ring, rstart, scal, gain0, d_gain, maskf, extra, *,
                      n, K, emax2, interpret=False, tile=None):
    """Fractional per-ear reads + gain ramps + masked mix, with the kernel
    fetching each voice's window itself.

    ring (V, rowlen) with rowlen a multiple of 1024; rstart (V,): each
    voice's window base column (cm - K quantization included by the
    caller as FP offset); extra (V, 2): per-ear stagger (< emax2) on top
    of rstart; other args as window_select.  Requires
    select_window(n, 127 + emax2, K) + 896 <= 2048 (one 2-KiB-page fetch
    per voice)."""
    V, rowlen = ring.shape
    assert rowlen % 1024 == 0
    if tile is None:
        tile = _tile_for(V)
    W = select_tables(128 - 1 + emax2, K)
    WR = select_window(n, 128 - 1 + emax2, K)
    assert 128 * 7 + WR <= 2048, "window too wide for the 2-page fetch"
    rwin = (rstart // 1024).astype(jnp.int32)
    rrem = (rstart - rwin * 1024).astype(jnp.int32)
    gain = jnp.stack([gain0, d_gain], axis=-1)

    def ts(*shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            ts(tile, 1),
            ts(tile, 4), ts(tile, 4),
            ts(tile, 2), ts(tile, 2),
            ts(tile, 1),
            ts(tile, 1), ts(tile, 1),
        ],
        out_specs=pl.BlockSpec(
            (2, n), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2048,), jnp.float32) for _ in range(tile)]
        + [pltpu.SemaphoreType.DMA((tile,))],
    )
    e = extra.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _dma_select_kernel, tile=tile, n=n, K=K, W=W, WR=WR,
            rowlen=rowlen,
        ),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        rwin,
        ring.reshape(-1),
        rrem[:, None],
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
    dsf = scal[:, 3:4]  # ds_int as f32 (exact small int)
    parts = []
    for sb in range(-(-n // SB)):
        # all-f32 position math (exact on ints < 2^23; floor(H) where the
        # int path truncated is bit-identical — the negative-H shift
        # cancels in wr while fr is unchanged, see _positions_sb)
        t_f = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, SB), 1).astype(
                jnp.float32
            )
            + np.float32(sb * SB)
        )
        H = t_f * f_hi  # exact f32 product for t < 4096 (12-bit f_hi)
        Hf = jnp.floor(H)
        u = (H - Hf) + (o0 + t_f * f_lo)
        fl_u = jnp.floor(u)
        fr = u - fl_u
        wr = t_f * dsf + Hf + fl_u
        adjust = (wr < 0.0) & (fr > 0.0)
        wr = jnp.where(adjust, wr + 1.0, wr)
        fr = jnp.where(adjust, fr - 1.0, fr)
        p = extra + wr.astype(jnp.int32)
        # row-constant coarse realign (positions are nondecreasing: min at 0)
        shift = p[:, 0:1]
        b7 = shift >> 7
        S = strips.shape[-1]
        Hmax = (S - W) // 128 + 1
        w1 = _realign_rows(strips, b7, W, Hmax)
        m = p - (b7 << 7)  # >= 0 (nondecreasing); may overrun W (clamped)
        # paired a/b gather with ONE index pipeline: b rides the shifted
        # twin (w1s[k] = w1[k+1], self-padded so the W-1 clamp matches
        # _gatherW's saturate-at-window-end semantics exactly)
        w1s = jnp.concatenate([w1[:, 1:], w1[:, W - 1 : W]], axis=-1)
        mc = jnp.minimum(m, W - 1)
        idx = mc & 127
        hi = mc >> 7
        a = jnp.take_along_axis(w1[:, 0:128], idx, axis=-1)
        b = jnp.take_along_axis(w1s[:, 0:128], idx, axis=-1)
        for c in range(1, W // 128):
            sel = hi == c
            ga = jnp.take_along_axis(
                w1[:, 128 * c : 128 * (c + 1)], idx, axis=-1
            )
            gb = jnp.take_along_axis(
                w1s[:, 128 * c : 128 * (c + 1)], idx, axis=-1
            )
            a = jnp.where(sel, ga, a)
            b = jnp.where(sel, gb, b)
        parts.append(a + fr * (b - a))
    out_ref[...] = jnp.concatenate(parts, axis=-1)[:, :n]


def strip_resample(strips, scal, extra, *, n, interpret=False, tile=None):
    """Strided fractional resample of per-voice arena windows.

    strips (V, S) with S a multiple of 128 and >= RESAMPLE_W; scal (V, 4)
    packed trunc-form cursor scalars (pack_select_scalars); extra (V,)
    window offset of the integer cursor (the caller biases it so
    extra + trunc(relative) >= 0 always).  Returns (V, n) samples."""
    V0, S = strips.shape
    V = _pad_v(V0)
    strips = _pad0(strips, V)
    scal = _pad0(scal, V)
    extra = _pad0(extra, V)
    if tile is None:
        # Voice-tile default is PLATFORM-AWARE.  A wider tile (fewer grid
        # steps) measured 27% faster on 64-voice stream drains
        # (tools/r5_probe5.py: 45 -> 62x) and is bit-exact on real TPU:
        # tools/r5_probe6.py renders both fused stream programs (DR mixer
        # pool + buffered spatial) at tile 8 vs adaptive on v5e and gets
        # max|diff| = 0.0 — the Mosaic kernel's per-voice math is
        # tile-independent.  On the CPU-INTERPRET build, however, the
        # kernel lowers to plain XLA ops and the tile choice perturbs the
        # surrounding program's fusion/reassociation: a tile-16 variant's
        # full-program output moved ~2e-5 (deterministic; bit-exact in
        # every isolation, and the traced program differs from its own
        # eager replay — the signature of an XLA:CPU rewrite, not a kernel
        # bug; --xla_cpu_enable_fast_math=false does not disable it).  So
        # interpret mode keeps the conservative 8-voice tile (stable CPU
        # golden contract) while compiled TPU runs size the tile to a
        # 512 KiB VMEM input budget.  ODDIO_RESAMPLE_TILE=adaptive|<int>
        # overrides either way.
        knob = os.environ.get("ODDIO_RESAMPLE_TILE", "")
        if knob and knob != "adaptive":
            tile = max(int(knob), 1)
        elif knob == "adaptive" or not interpret:
            tile = _tile_for(V)
            while tile > 1 and tile * S * 4 > (1 << 19):
                tile //= 2
            tile = max(tile, 1)
        else:
            tile = min(_tile_for(V), 8)
    grid_spec = pl.GridSpec(
        grid=(V // tile,),
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_resample_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((V, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(strips, scal, extra[:, None].astype(jnp.int32))
    return out[:V0]

