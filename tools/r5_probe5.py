"""r5_probe5: strip_resample voice-tile widening A/B follow-up.

r5_probe2/3 measured the stream-read leg at ~1.1 us/stream/block with
strip_resample running 8 voices per grid step (grid-step bound, not
byte bound).  This rerun measures the same full16 pack and 64-stream
spatial drain after the tile widened to 32 (within a 512 KiB VMEM input
block).  Compare against r5_probe2's full16 0.909 ms/block and
r5_probe3's drain94 0.236 ms/block.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    log(f"devices: {jax.devices()}")
    import importlib

    p2 = importlib.import_module("r5_probe2") if __package__ else None
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import r5_probe2 as p2
    import r5_probe3 as p3

    full = p2.rate_pack(p2.build_pack("full16"), "full16-t32")
    _, sc = p3.build("drain")
    a = p3.drain_rate(sc, "drain w94-t32", 94, 6)
    log(f"SUMMARY full16_t32={full} drain94_t32={a}")


if __name__ == "__main__":
    main()
