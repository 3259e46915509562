"""Automatic gain control over a changing mix — mirrors the reference's
examples/adapt.rs: a quiet sine, then a loud one added, then removed, with
Adapt keeping the RMS level in range."""

import numpy as np

import oddio_tpu as ot
from oddio_tpu.utils.wav import write_wav

DURATION_SECS = 2
RATE = 44100
BLOCK_SIZE = 512


def main():
    mixer, signal = ot.Mixer.new(channels=1)
    chain = ot.Adapt(
        signal,
        1e-3 / np.sqrt(2.0),
        ot.AdaptOptions(
            tau=0.1, max_gain=1e6, low=0.1 / np.sqrt(2.0), high=0.5 / np.sqrt(2.0)
        ),
    )
    r = ot.Renderer(chain, RATE)
    total = (RATE * DURATION_SECS // BLOCK_SIZE) * BLOCK_SIZE

    quiet = ot.FixedGain(ot.Sine(0.0, 5e2), -60.0)
    loud = ot.FixedGain(ot.Sine(0.0, 4e2), -2.0)

    pieces = []
    mixer.play(quiet)
    pieces.append(r.render_frames(total))
    handle = mixer.play(loud)
    pieces.append(r.render_frames(total))
    handle.stop()
    pieces.append(r.render_frames(total))

    out = np.concatenate(pieces)
    write_wav("adapt.wav", out, RATE)
    for name, seg in zip(("quiet", "loud", "quiet again"), pieces):
        print(f"{name}: rms {np.sqrt((seg**2).mean()):.3f}")


if __name__ == "__main__":
    main()
