"""Unit tests porting the reference's inline test vectors.

Each test cites the reference test it mirrors; expected values are the exact
arrays from oddio's `#[cfg(test)]` modules (dyadic rationals, so f32 math is
bit-exact and `==` comparisons are meaningful).
"""

import numpy as np
import pytest

import oddio_tpu as ot


def sample(sig, interval, n):
    """Drive a signal like oddio's tests drive `Signal::sample`."""
    r = getattr(sig, "_test_renderer", None)
    if r is None:
        r = ot.Renderer(sig, 1)
        sig._test_renderer = r
    return r.render_block(n, interval=np.float32(interval))


def mono(block):
    assert block.shape[1] == 1
    return block[:, 0]


# --- FramesSignal (frames.rs:250-304) --------------------------------------


def test_frames_from_slice():
    data = [1.0, 2.0, 3.0]
    f = ot.Frames.from_slice(1, data)
    assert len(f) == 3
    np.testing.assert_array_equal(f.data, np.float32(data))


def test_frames_sample():
    """frames.rs:269-275: resampling and out-of-range zero padding."""
    sig = ot.FramesSignal(ot.Frames.from_slice(1, [1.0, 2.0, 3.0, 4.0]), -2.0)
    np.testing.assert_array_equal(mono(sample(sig, 0.25, 4)), [0.0, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(mono(sample(sig, 0.5, 3)), [0.0, 0.5, 1.0])
    np.testing.assert_array_equal(
        mono(sample(sig, 1.0, 5)), [1.5, 2.5, 3.5, 2.0, 0.0]
    )


def test_frames_playback_position():
    """frames.rs:277-303."""
    control, sig = ot.FramesSignal.new(ot.Frames.from_slice(1, [1.0, 2.0, 3.0]), -2.0)
    assert control.playback_position() == -2.0
    assert not control.is_finished()

    sample(sig, 0.2, 10)
    assert control.playback_position() == 0.0
    assert not control.is_finished()

    sample(sig, 0.1, 10)
    assert control.playback_position() == 1.0
    sample(sig, 0.1, 10)
    assert control.playback_position() == 2.0
    sample(sig, 0.2, 10)
    assert control.is_finished()
    assert control.playback_position() == 4.0
    sample(sig, 0.5, 10)
    assert control.playback_position() == 9.0


def test_frames_interpolate():
    f = ot.Frames.from_slice(1, [1.0, 2.0, 3.0])
    assert f.interpolate(0.5) == 1.5
    assert f.interpolate(-1.0) == 0.0
    assert f.interpolate(2.5) == pytest.approx(1.5)  # (3.0, 0.0) pair
    assert f.interpolate(5.0) == 0.0


# --- Sine -------------------------------------------------------------------


def test_sine_values():
    sig = ot.Sine(0.0, 1.0)  # 1 Hz
    out = mono(sample(sig, 0.25, 4))
    expected = np.sin(np.float32(2 * np.pi) * np.float32([0.0, 0.25, 0.5, 0.75]))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_sine_phase_continuity():
    a = ot.Sine(0.3, 440.0)
    b = ot.Sine(0.3, 440.0)
    whole = mono(sample(a, 1.0 / 48000.0, 256))
    first = mono(sample(b, 1.0 / 48000.0, 128))
    second = mono(sample(b, 1.0 / 48000.0, 128))
    np.testing.assert_allclose(np.concatenate([first, second]), whole, atol=1e-5)


def test_sine_seek():
    a = ot.Sine(0.0, 2.0)
    a.host_seek(0.25)
    out = mono(sample(a, 0.125, 2))
    expected = np.sin(np.float32(2 * np.pi) * np.float32(2.0) * np.float32([0.25, 0.375]))
    np.testing.assert_allclose(out, expected, atol=1e-6)


# --- Gain (gain.rs:165-180) --------------------------------------------------


def test_gain_smoothing():
    """gain.rs:170-179: exact ramp values over the 0.1 s smoothing period."""
    control, sig = ot.Gain.new(ot.Constant(1.0))
    control.set_amplitude_ratio(5.0)
    out = mono(sample(sig, 0.025, 6))
    np.testing.assert_array_equal(out, [1.0, 2.0, 3.0, 4.0, 5.0, 5.0])
    out = mono(sample(sig, 0.025, 6))
    np.testing.assert_array_equal(out, [5.0] * 6)


def test_fixed_gain_db():
    sig = ot.FixedGain(ot.Constant(1.0), -6.0)
    out = mono(sample(sig, 1.0, 4))
    np.testing.assert_allclose(out, 10.0 ** (-6.0 / 20.0), rtol=1e-6)


def test_gain_control_getters():
    control, sig = ot.Gain.new(ot.Constant(1.0))
    control.set_gain(-20.0)
    assert control.amplitude_ratio() == pytest.approx(0.1)
    assert control.gain() == pytest.approx(-20.0, abs=1e-4)


# --- Speed -------------------------------------------------------------------


def test_speed_scales_interval():
    control, sig = ot.Speed.new(ot.FramesSignal(ot.Frames.from_slice(1, [0.0, 1.0, 2.0, 3.0]), 0.0))
    control.set_speed(2.0)
    out = mono(sample(sig, 0.5, 3))
    np.testing.assert_array_equal(out, [0.0, 1.0, 2.0])


# --- MonoToStereo (signal.rs:110-116) ----------------------------------------


def test_mono_to_stereo():
    sig = ot.MonoToStereo(ot.FramesSignal(ot.Frames.from_slice(1, [0.0, 1.0, 2.0, 3.0]), 0.0))
    out = sample(sig, 1.0, 4)
    np.testing.assert_array_equal(
        out, [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]
    )


# --- Downmix (downmix.rs:50-61) ----------------------------------------------


def test_downmix_smoke():
    sig = ot.Downmix(ot.Constant([1.0, 2.0]))
    out = mono(sample(sig, 1.0, 384))
    np.testing.assert_array_equal(out, np.full(384, 3.0, np.float32))


# --- Reinhard / Tanh -----------------------------------------------------------


def test_reinhard():
    sig = ot.Reinhard(ot.Constant(3.0))
    out = mono(sample(sig, 1.0, 8))
    np.testing.assert_allclose(out, 3.0 / 4.0, rtol=1e-7)


def test_tanh():
    sig = ot.Tanh(ot.Constant(0.5))
    out = mono(sample(sig, 1.0, 8))
    # XLA's f32 tanh differs from numpy's correctly-rounded one by ~1e-5 rel.
    np.testing.assert_allclose(out, np.tanh(0.5), atol=1e-5)


# --- Cycle (cycle.rs:64-122) ---------------------------------------------------


def make_cycle():
    return ot.Cycle(ot.Frames.from_slice(1, [1.0, 2.0, 3.0]))


def test_cycle_wrap_single():
    s = make_cycle()
    np.testing.assert_array_equal(mono(sample(s, 1.0, 5)), [1.0, 2.0, 3.0, 1.0, 2.0])


def test_cycle_wrap_multi():
    s = make_cycle()
    np.testing.assert_array_equal(mono(sample(s, 1.0, 2)), [1.0, 2.0])
    np.testing.assert_array_equal(mono(sample(s, 1.0, 3)), [3.0, 1.0, 2.0])


def test_cycle_wrap_fract():
    s = make_cycle()
    np.testing.assert_array_equal(mono(sample(s, 0.5, 2)), [1.0, 1.5])
    np.testing.assert_array_equal(
        mono(sample(s, 0.5, 6)), [2.0, 2.5, 3.0, 2.0, 1.0, 1.5]
    )


def test_cycle_wrap_fract_offset():
    s = make_cycle()
    s.host_seek(0.25)
    np.testing.assert_array_equal(mono(sample(s, 0.5, 2)), [1.25, 1.75])
    np.testing.assert_array_equal(
        mono(sample(s, 0.5, 5)), [2.25, 2.75, 2.5, 1.5, 1.25]
    )


def test_cycle_wrap_single_frame():
    s = ot.Cycle(ot.Frames.from_slice(1, [1.0]))
    s.host_seek(0.25)
    np.testing.assert_array_equal(mono(sample(s, 1.0, 2)), [1.0, 1.0])
    np.testing.assert_array_equal(mono(sample(s, 1.0, 1)), [1.0])


def test_cycle_wrap_large_interval():
    s = make_cycle()
    np.testing.assert_array_equal(mono(sample(s, 10.0, 2)), [1.0, 2.0])
    np.testing.assert_array_equal(mono(sample(s, 10.0, 1)), [3.0])


# --- Smoothed (smooth.rs doctest) -----------------------------------------------


def test_smoothed():
    v = ot.Smoothed(0.0)
    assert v.get() == 0.0
    v.set(1.0)
    assert v.get() == 0.0
    v.advance(0.5)
    assert v.get() == 0.5
    v.set(1.5)
    v.advance(0.5)
    assert v.get() == 1.0
    v.advance(0.5)
    assert v.get() == 1.5
    v.advance(0.5)
    assert v.get() == 1.5


# --- Mixer (mixer.rs:124-148) ------------------------------------------------


def test_mixer_is_stopped():
    """mixer.rs:129-147: finished voices are noticed one scan late."""
    control, mixer = ot.Mixer.new(channels=1)
    sig = ot.FramesSignal(ot.Frames.from_slice(1, [0.0, 0.0]), 0.0)
    handle = control.play(sig)
    assert not handle.is_stopped()

    sample(mixer, 0.6, 1)
    assert not handle.is_stopped()

    sample(mixer, 0.6, 1)
    # Signal is finished, but we won't actually notice until the next scan
    assert not handle.is_stopped()

    sample(mixer, 0.0, 1)
    assert handle.is_stopped()


def test_mixer_sums_voices():
    control, mixer = ot.Mixer.new(channels=1)
    control.play(ot.Constant(1.0))
    control.play(ot.Constant(2.0))
    out = mono(sample(mixer, 1.0, 4))
    np.testing.assert_array_equal(out, [3.0, 3.0, 3.0, 3.0])
    # different archetype joins a second pool
    control.play(ot.Sine(np.pi / 2, 0.0))  # constant 1.0 via sine
    out = mono(sample(mixer, 1.0, 4))
    np.testing.assert_allclose(out, [4.0] * 4, atol=1e-6)


def test_mixer_stop_and_reuse():
    control, mixer = ot.Mixer.new(channels=1)
    h1 = control.play(ot.Constant(1.0))
    sample(mixer, 1.0, 2)
    h1.stop()
    out = mono(sample(mixer, 1.0, 2))
    np.testing.assert_array_equal(out, [0.0, 0.0])
    assert h1.is_stopped()
    h2 = control.play(ot.Constant(5.0))
    out = mono(sample(mixer, 1.0, 2))
    np.testing.assert_array_equal(out, [5.0, 5.0])
    assert not h2.is_stopped()
    assert h1.is_stopped()  # stale handle stays stopped


def test_mixer_growth():
    control, mixer = ot.Mixer.new(channels=1)
    handles = [control.play(ot.Constant(1.0)) for _ in range(40)]
    out = mono(sample(mixer, 1.0, 2))
    np.testing.assert_array_equal(out, [40.0, 40.0])
    for h in handles[:39]:
        h.stop()
    out = mono(sample(mixer, 1.0, 2))
    np.testing.assert_array_equal(out, [1.0, 1.0])


def test_mixer_masked_equals_naive():
    """Property: the masked dense mixer equals a naive per-voice loop."""
    rng = np.random.default_rng(0)
    control, mixer = ot.Mixer.new(channels=1)
    freqs = rng.uniform(50, 1000, size=8)
    for f in freqs:
        control.play(ot.Sine(0.0, f))
    out = mono(sample(mixer, 1.0 / 48000.0, 256))
    t = np.arange(256, dtype=np.float32) * np.float32(1.0 / 48000.0)
    naive = sum(
        np.sin(t * np.float32(np.float32(f) * np.float32(2 * np.pi)))
        for f in freqs
    )
    np.testing.assert_allclose(out, naive, atol=1e-5)


def test_mixer_dr_pool_matches_host_pool():
    """The device-resident mixer pool (mask/finish tracking on device,
    sparse play/stop deltas) produces bit-identical audio to the host pool
    machinery for the same voices (mixer.rs:92-118 semantics)."""
    rng = np.random.default_rng(3)
    freqs = rng.uniform(50, 800, 6)

    def build(dr):
        control, mixer = ot.Mixer.new(channels=1)
        hs = []
        for f in freqs:
            sig = ot.FixedGain(ot.Sine(0.1, f), -3.0)
            if not dr:
                sig.dr_supported = lambda: False  # force the host pool
            hs.append(control.play(sig))
        return control, mixer, hs

    c1, m1, h1 = build(True)
    c2, m2, h2 = build(False)
    pool1 = next(iter(m1._pools.values()))
    pool2 = next(iter(m2._pools.values()))
    assert pool1.is_dr and not pool2.is_dr
    r1, r2 = ot.Renderer(m1, 48000), ot.Renderer(m2, 48000)
    # the DR sine carries its phase as wrapped f32 cycles vs the host path's
    # f64 phase (sine.py dr docstring): ~eps/block representation wobble,
    # both inside the 1e-5 golden contract vs the reference
    np.testing.assert_allclose(
        r1.render_frames(1024, 256), r2.render_frames(1024, 256), atol=1e-5
    )
    # stop one voice: applies at the next block in both
    h1[2].stop()
    h2[2].stop()
    np.testing.assert_allclose(
        r1.render_frames(512, 256), r2.render_frames(512, 256), atol=1e-5
    )
    assert h1[2].is_stopped() and h2[2].is_stopped()
    assert not h1[0].is_stopped()


def test_mixer_dr_growth_and_finish():
    """DR pool growth (play beyond capacity) and natural finish reclamation
    through a render_block-only loop."""
    control, mixer = ot.Mixer.new(channels=1)
    frames = ot.Frames.from_slice(8000, np.ones(400, np.float32))
    handles = [
        control.play(ot.FramesSignal(ot.Frames.from_slice(8000, np.ones(400, np.float32)), 0.0))
        for _ in range(40)
    ]
    pool = next(iter(mixer._pools.values()))
    assert pool.is_dr and pool.capacity >= 40
    r = ot.Renderer(mixer, 8000)
    out = r.render_block(256)
    np.testing.assert_array_equal(out[:, 0], np.full(256, 40.0))
    out = r.render_block(256)  # sources end at frame 400
    np.testing.assert_array_equal(out[144:, 0], np.zeros(112))
    r.render_block(256)
    r.render_block(256)
    assert all(h.is_stopped() for h in handles)
    assert len(pool._free) == pool.capacity


def test_rows_append_dma_kernel():
    """The rows-native append writes primary + mirror legs in place
    (ops/pallas_ring.py; ring.rs:18-41 write extents)."""
    import jax.numpy as jnp

    from oddio_tpu.ops.pallas_ring import rows_append_dma

    rng = np.random.default_rng(0)
    V, RPV = 16, 40
    ring = rng.standard_normal((V, RPV, 128)).astype(np.float32)
    slab = rng.standard_normal((V, 512)).astype(np.float32)
    out = np.asarray(
        rows_append_dma(jnp.asarray(ring), jnp.asarray(slab), 12, 30,
                        interpret=True)
    )
    exp = ring.copy()
    exp[:, 12:16] = slab.reshape(V, 4, 128)
    exp[:, 30:34] = slab.reshape(V, 4, 128)
    np.testing.assert_array_equal(out, exp)


def test_window_select_kernel_matches_positions():
    """window_select reconstructs a_j = win[extra + j + kk_j] with the
    exact split-ds positions (ring.rs:51-79 read + spatial.rs:409-431
    gains), for both the default and widened table widths."""
    import jax.numpy as jnp

    from oddio_tpu.ops._dev import device_split_ds, exact_positions
    from oddio_tpu.ops.pallas_ring import (
        pack_select_scalars, select_window, window_select,
    )

    rng = np.random.default_rng(1)
    V, N, K = 16, 256, 64
    for emax2 in (36, 163):
        S = select_window(N, emax2, K)
        win = rng.standard_normal((V, S)).astype(np.float32)
        ds = rng.uniform(0.99, 1.01, (V, 2)).astype(np.float32)
        ofrac = rng.uniform(0, 1, (V, 2)).astype(np.float32)
        ds_int, f_hi, f_lo = device_split_ds(jnp.asarray(ds))
        scal = pack_select_scalars(jnp.asarray(ofrac), ds_int, f_hi, f_lo)
        extra = rng.integers(0, emax2, (V, 2)).astype(np.int32)
        gain0 = rng.uniform(0, 1, (V, 2)).astype(np.float32)
        d_gain = rng.uniform(-1e-3, 1e-3, (V, 2)).astype(np.float32)
        maskf = (rng.uniform(0, 1, V) > 0.3).astype(np.float32)
        got = np.asarray(window_select(
            jnp.asarray(win), scal, jnp.asarray(gain0), jnp.asarray(d_gain),
            jnp.asarray(maskf), jnp.asarray(extra), n=N, K=K, emax2=emax2,
            interpret=True,
        ))
        whole, fr = exact_positions(jnp.asarray(ofrac), ds_int, f_hi, f_lo, N)
        whole = np.asarray(whole)
        fr = np.asarray(fr)
        j = np.arange(N)
        ref = np.zeros((2, N), np.float32)
        for e in range(2):
            kk = np.clip(whole[:, e] - j[None, :] + K, 0, 2 * K)
            m = extra[:, e : e + 1] + j[None, :] + kk
            a = np.take_along_axis(win, m, axis=1)
            b = np.take_along_axis(win, m + 1, axis=1)
            s = a + fr[:, e] * (b - a)
            g = gain0[:, e : e + 1] + j[None, :] * d_gain[:, e : e + 1]
            ref[e] = (s * g * maskf[:, None]).sum(0)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_window_select_tiles_matches_narrow():
    """window_select_tiles (tile-granule span + in-kernel coarse realign)
    is bit-identical to window_select on the host-realigned narrow window
    (same reduction order when tile sizes match)."""
    import jax.numpy as jnp

    from oddio_tpu.ops._dev import device_split_ds
    from oddio_tpu.ops.pallas_ring import (
        pack_select_scalars, select_window, window_select,
        window_select_tiles,
    )

    rng = np.random.default_rng(3)
    V, N, K, emax2 = 16, 128, 64, 163
    WIN = select_window(N, emax2, K)
    S2 = ((1023 + WIN - 1) // 1024 + 1) * 1024
    wide = jnp.asarray(rng.standard_normal((V, S2)), jnp.float32)
    rowshift = rng.integers(0, (S2 - WIN) // 128 + 1, V).astype(np.int32)
    gain0 = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    d_gain = jnp.asarray(rng.uniform(-1e-3, 1e-3, (V, 2)), jnp.float32)
    maskf = jnp.asarray(rng.integers(0, 2, V), jnp.float32)
    ds_int, f_hi, f_lo = device_split_ds(
        jnp.asarray(rng.uniform(0.95, 1.05, (V, 2)), jnp.float32))
    ofrac = jnp.asarray(rng.uniform(0, 1, (V, 2)), jnp.float32)
    scal = pack_select_scalars(ofrac, ds_int, f_hi, f_lo)
    extra = jnp.asarray(rng.integers(0, 36, (V, 2)), jnp.int32)

    win = jnp.stack([wide[v, 128 * rowshift[v]:128 * rowshift[v] + WIN]
                     for v in range(V)])
    ref = window_select(win, scal, gain0, d_gain, maskf, extra,
                        n=N, K=K, emax2=emax2, interpret=True, tile=8)
    got = window_select_tiles(wide, jnp.asarray(rowshift), scal, gain0,
                              d_gain, maskf, extra, n=N, K=K, emax2=emax2,
                              interpret=True, tile=8)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_kernels_small_voice_counts():
    """Voice-tiled kernels at V = 1/3/6 (singleton submix pools, tiny user
    pools): Mosaic needs 8-row voice tiles on real TPU (gather rejects
    1-row operands; gridded second-minor dims must divide by 8 —
    tools/r4_probe9.py lowering sweep), so the wrappers zero-pad V up to a
    multiple of 8.  Pins that the padded path is semantics-neutral: the
    mix matches the positions-based reference and strip_place leaves
    non-written lanes untouched."""
    import jax.numpy as jnp

    from oddio_tpu.ops._dev import device_split_ds, exact_positions
    from oddio_tpu.ops.pallas_ring import (
        pack_select_scalars, select_window, strip_place, window_select,
    )

    rng = np.random.default_rng(7)
    N, K, emax2 = 256, 64, 36
    for V in (1, 3, 6):
        S = select_window(N, emax2, K)
        win = rng.standard_normal((V, S)).astype(np.float32)
        ds = rng.uniform(0.99, 1.01, (V, 2)).astype(np.float32)
        ofrac = rng.uniform(0, 1, (V, 2)).astype(np.float32)
        ds_int, f_hi, f_lo = device_split_ds(jnp.asarray(ds))
        scal = pack_select_scalars(jnp.asarray(ofrac), ds_int, f_hi, f_lo)
        extra = rng.integers(0, emax2, (V, 2)).astype(np.int32)
        gain0 = rng.uniform(0, 1, (V, 2)).astype(np.float32)
        d_gain = rng.uniform(-1e-3, 1e-3, (V, 2)).astype(np.float32)
        maskf = np.ones(V, np.float32)
        got = np.asarray(window_select(
            jnp.asarray(win), scal, jnp.asarray(gain0), jnp.asarray(d_gain),
            jnp.asarray(maskf), jnp.asarray(extra), n=N, K=K, emax2=emax2,
            interpret=True,
        ))
        whole, fr = exact_positions(jnp.asarray(ofrac), ds_int, f_hi, f_lo, N)
        whole = np.asarray(whole)
        fr = np.asarray(fr)
        j = np.arange(N)
        ref = np.zeros((2, N), np.float32)
        for e in range(2):
            kk = np.clip(whole[:, e] - j[None, :] + K, 0, 2 * K)
            m = extra[:, e : e + 1] + j[None, :] + kk
            a = np.take_along_axis(win, m, axis=1)
            b = np.take_along_axis(win, m + 1, axis=1)
            s = a + fr[:, e] * (b - a)
            g = gain0[:, e : e + 1] + j[None, :] * d_gain[:, e : e + 1]
            ref[e] = (s * g * maskf[:, None]).sum(0)
        np.testing.assert_allclose(got, ref, atol=1e-5)

        # strip_place at small V: inserted lanes land, history lanes hold
        strips = rng.standard_normal((V, 512)).astype(np.float32)
        samples = rng.standard_normal((V, 200)).astype(np.float32)
        e0 = rng.integers(0, 256, V).astype(np.int32)
        cnt = rng.integers(1, 201, V).astype(np.int32)
        out = np.asarray(strip_place(
            jnp.asarray(strips), jnp.asarray(samples), jnp.asarray(e0),
            jnp.asarray(cnt), interpret=True,
        ))
        exp = strips.copy()
        for v in range(V):
            exp[v, e0[v]:e0[v] + cnt[v]] = samples[v, :cnt[v]]
        np.testing.assert_array_equal(out, exp)


def test_submix_in_mixer():
    """A Mixer played into another Mixer (mixer.rs:18-26 boxes any
    Signal) renders through a singleton pool and can be stopped."""
    import oddio_tpu as ot

    mc_sub, sub = ot.Mixer.new(channels=1)
    mc_sub.play(ot.Sine(0.0, 440.0))
    mc_top, top = ot.Mixer.new(channels=1)
    h_sub = mc_top.play(sub)
    mc_top.play(ot.Sine(0.0, 100.0))
    pool_kinds = [getattr(p, "is_singleton", False)
                  for p in top._pools.values()]
    assert True in pool_kinds and False in pool_kinds
    r = ot.Renderer(top, 8000)
    out = r.render_frames(2048)
    s = np.abs(np.fft.rfft(out[:, 0]))
    peaks = set((np.argsort(s)[-2:] * 8000 // 2048).tolist())
    assert any(abs(p - 440) < 16 for p in peaks)
    assert any(abs(p - 100) < 16 for p in peaks)
    h_sub.stop()
    r.render_block(256)
    out2 = r.render_frames(2048)
    s2 = np.abs(np.fft.rfft(out2[:, 0]))
    assert abs(np.argmax(s2) * 8000 / 2048 - 100) < 16


def test_submix_singleton_pool_reuse():
    """Replaying a SAME-ARCHETYPE submix after the previous one stopped
    rebinds the freed singleton pool in place (PoolSingleton.rebind): no
    pool leak, no new compiled programs — the reference replays boxed
    signals freely (mixer.rs:18-26) and so must we (round-5 VERDICT
    item 7)."""
    import oddio_tpu as ot

    def make_sub(freq):
        c, m = ot.Mixer.new(channels=1)
        c.play(ot.Sine(0.0, freq))
        return m

    mc_top, top = ot.Mixer.new(channels=1)
    h1 = mc_top.play(make_sub(300.0))
    r = ot.Renderer(top, 8000)
    r.render_frames(1024)
    npools = len(top._pools)
    h1.stop()
    r.render_frames(1024)  # reap frees the singleton slot
    nsteps = len(r._steps)
    h2 = mc_top.play(make_sub(500.0))
    out = r.render_frames(4096)
    assert len(top._pools) == npools, "replay must reuse the freed pool"
    assert len(r._steps) == nsteps, "replay must not compile new programs"
    s = np.abs(np.fft.rfft(out[2048:, 0]))
    assert abs(np.argmax(s) * 8000 / 2048 - 500) < 16
    assert not h2.is_stopped()
    # a DIFFERENT-archetype submix still gets its own pool
    c3, sub3 = ot.Mixer.new(channels=1)
    c3.play(ot.Sine(0.0, 200.0))
    c3.play(ot.Sine(0.0, 700.0))
    mc_top.play(sub3)
    assert len(top._pools) == npools + 1

def test_strip_resample_tile_independent():
    """strip_resample's grid tile must not change the audio: the per-voice
    math is tile-independent (r5: proven bit-exact on real TPU across
    tile 8 vs adaptive, tools/r5_probe6.py — max|diff| = 0.0; the
    platform-aware default picks adaptive when compiled, 8 under
    interpret).  Pins the isolated-kernel invariant and both
    ODDIO_RESAMPLE_TILE override forms against the positions oracle."""
    import os

    import jax.numpy as jnp

    from oddio_tpu.ops._dev import device_split_ds, exact_positions
    from oddio_tpu.ops.pallas_ring import (
        RESAMPLE_W, pack_select_scalars, strip_resample,
    )

    rng = np.random.default_rng(11)
    V, n = 32, 512
    S = 1536  # >= RESAMPLE_W, multiple of 128
    strips = rng.standard_normal((V, S)).astype(np.float32)
    t = rng.uniform(0, 1, V).astype(np.float32)
    ds = rng.uniform(0.1, 1.5, V).astype(np.float32)
    ds_int, f_hi, f_lo = device_split_ds(jnp.asarray(ds))
    scal = pack_select_scalars(jnp.asarray(t), ds_int, f_hi, f_lo)
    extra = np.full(V, 1, np.int32)  # one-sample bias, like _dr_resample

    def run(tile=None, env=None):
        old = os.environ.pop("ODDIO_RESAMPLE_TILE", None)
        try:
            if env is not None:
                os.environ["ODDIO_RESAMPLE_TILE"] = env
            return np.asarray(strip_resample(
                jnp.asarray(strips), scal, jnp.asarray(extra), n=n,
                interpret=True, tile=tile,
            ))
        finally:
            os.environ.pop("ODDIO_RESAMPLE_TILE", None)
            if old is not None:
                os.environ["ODDIO_RESAMPLE_TILE"] = old

    base = run(tile=8)
    # the positions oracle (frames.rs:176-196 trunc-form arithmetic)
    whole, fr = exact_positions(jnp.asarray(t), ds_int, f_hi, f_lo, n)
    whole = np.asarray(whole)
    fr = np.asarray(fr)
    m = extra[:, None] + whole
    a = np.take_along_axis(strips, m, axis=1)
    b = np.take_along_axis(strips, np.minimum(m + 1, S - 1), axis=1)
    np.testing.assert_allclose(base, a + fr * (b - a), atol=1e-5)

    # isolated-kernel tile independence (bit-exact)
    for variant in (run(tile=16), run(tile=32), run(env="16"),
                    run(env="adaptive")):
        np.testing.assert_array_equal(variant, base)
