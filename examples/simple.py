"""A minimal dynamic real-time mixer — mirrors the reference's
examples/simple.rs, with the RealtimeDriver standing in for the cpal output
stream (its `read` is what an audio callback would call)."""

import time

import numpy as np

import oddio_tpu as ot
from oddio_tpu.control.realtime import RealtimeDriver


def main():
    sample_rate = 48000
    mixer_handle, mixer = ot.Mixer.new(channels=2)

    # the "output stream": a render thread feeding a wait-free ring
    driver = RealtimeDriver(mixer, sample_rate, block_size=512).start()

    # Start a 400 Hz sine. We can do this as many times as we like, whenever
    # we like, with different types of signals as needed.
    mixer_handle.play(ot.MonoToStereo(ot.Sine(0.0, 400.0)))

    # emulate an audio callback pulling for a second
    time.sleep(0.5)
    frames = []
    for _ in range(90):
        frames.append(driver.read(512))
        time.sleep(512 / sample_rate * 0.5)
    driver.stop()
    out = np.concatenate(frames)
    print(
        f"pulled {len(out)} frames, peak {np.abs(out).max():.3f}, "
        f"underruns {driver.underruns}"
    )


if __name__ == "__main__":
    main()
