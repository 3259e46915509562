"""Native wait-free control plane: port of the reference's spsc/swap tests
(spsc.rs:274-337, swap.rs:86-104) plus a cross-thread stress test and the
RealtimeDriver round trip."""

import threading
import time

import numpy as np
import pytest

import oddio_tpu as ot
from oddio_tpu.control.native import SpscRing, Swap
from oddio_tpu.control.realtime import RealtimeDriver


def test_ring_fill_and_wrap():
    """spsc.rs wrap/fill/excess semantics: partial writes, ordered reads."""
    r = SpscRing(4)
    assert r.write([1.0, 2.0, 3.0]) == 3
    assert r.write([4.0, 5.0]) == 1  # partial: only one slot free
    np.testing.assert_array_equal(r.read(2), [1.0, 2.0])
    assert r.write([6.0, 7.0]) == 2
    np.testing.assert_array_equal(r.read(10), [3.0, 4.0, 6.0, 7.0])
    assert r.readable() == 0
    assert r.writable() == 4


def test_swap_freshness():
    """swap.rs:86-104: receiver sees the latest flushed value; refresh
    reports freshness exactly once per publish."""
    s = Swap(np.float32([1.0, 2.0, 3.0]))
    fresh, v = s.refresh()
    assert not fresh
    np.testing.assert_array_equal(v, [1.0, 2.0, 3.0])
    s.publish(np.float32([4.0, 5.0, 6.0]))
    s.publish(np.float32([7.0, 8.0, 9.0]))  # last wins
    fresh, v = s.refresh()
    assert fresh
    np.testing.assert_array_equal(v, [7.0, 8.0, 9.0])
    fresh, v = s.refresh()
    assert not fresh
    np.testing.assert_array_equal(v, [7.0, 8.0, 9.0])


def test_control_plane_under_tsan():
    """The reference's race story was Miri in CI (rust.yml:75-98); here the
    hand-rolled C++ atomics run under ThreadSanitizer: two threads hammer
    ring write/read and swap publish/refresh while invariants (exact sample
    sequence, no torn payloads, last-wins monotonicity) are checked."""
    import os
    import shutil
    import subprocess
    import tempfile

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        exe = os.path.join(td, "tsan_stress")
        build = subprocess.run(
            [
                "g++", "-fsanitize=thread", "-O1", "-std=c++17", "-o", exe,
                os.path.join(root, "native", "tsan_stress.cpp"),
                os.path.join(root, "native", "control_plane.cpp"),
                "-lpthread",
            ],
            capture_output=True,
            text=True,
        )
        if build.returncode != 0:
            pytest.skip(f"TSan runtime unavailable: {build.stderr[-200:]}")
        run = subprocess.run(
            [exe],
            env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1"},
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert run.returncode == 0, run.stderr[-2000:]
        assert "tsan_stress ok" in run.stdout


def test_ring_cross_thread_stress():
    """Producer/consumer on separate threads move 200k samples intact."""
    r = SpscRing(1024)
    N = 200_000
    src = np.arange(N, dtype=np.float32)
    got = []

    def produce():
        i = 0
        while i < N:
            i += r.write(src[i : i + 256])

    def consume():
        total = 0
        while total < N:
            chunk = r.read(256)
            if len(chunk):
                got.append(chunk)
                total += len(chunk)

    t1 = threading.Thread(target=produce)
    t2 = threading.Thread(target=consume)
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, src)


def test_realtime_driver_roundtrip():
    """Render thread keeps the output ring fed; the callback side reads a
    continuous sine; controls apply at block granularity."""
    control, mixer = ot.Mixer.new(channels=2)
    h = control.play(ot.MonoToStereo(ot.Sine(0.0, 440.0)))
    drv = RealtimeDriver(mixer, 8000, block_size=256, lead_blocks=4).start()
    try:
        # wait out the first-compile warmup (both pool step variants), then
        # pace reads like a real 8 kHz callback so the ring stays ahead
        deadline = time.time() + 120
        while time.time() < deadline:
            if np.abs(drv.read(128)).max() > 0:
                break
            time.sleep(0.05)
        time.sleep(0.1)
        chunks = []
        for _ in range(16):
            chunks.append(drv.read(128))
            time.sleep(128 / 8000)
        out = np.concatenate(chunks)
        # a 440 Hz sine comes through (startup underruns are zero-filled,
        # which the spectral peak tolerates)
        tail = out[-1024:, 0]
        assert np.abs(tail).max() > 0.9
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freq = np.argmax(spec) * 8000 / len(tail)
        assert freq == pytest.approx(440.0, abs=16)
        h.stop()
        time.sleep(0.2)
        drv.read(4096)  # drain
        silent = drv.read(256)
        assert np.abs(silent).max() == 0.0
    finally:
        drv.stop()


def test_checkpoint_resume():
    """Engine state round-trips exactly: snapshot mid-stream, render on,
    restore, render again -> identical audio (SURVEY.md §5 checkpoint item)."""
    from oddio_tpu.utils import checkpoint as ckpt

    def build():
        control, scene = ot.SpatialScene.new()
        h = control.play_buffered(
            ot.Sine(0.3, 330.0), ot.SpatialOptions(position=[2.0, 0.0, -1.0]),
            max_distance=20.0, rate=8000, buffer_duration=0.1,
        )
        control.play(ot.Sine(0.1, 220.0), ot.SpatialOptions(position=[-1.0, 0.0, -2.0]))
        return control, scene, h

    _, scene, h = build()
    r = ot.Renderer(scene, 8000)
    r.render_frames(512 * 4)
    snap = ckpt.snapshot(scene)
    a = r.render_frames(512 * 4)

    ckpt.restore(scene, snap)
    b = r.render_frames(512 * 4)
    np.testing.assert_array_equal(a, b)
