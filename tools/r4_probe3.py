"""Round-4 probe v3: split the buffered step's walk+glue (~0.24 ms/block,
tools/r4_probe2.py) into scan-floor / control-walk / geometry-glue, and
floor the seek path the same way.

Variants patch the pool's ``render`` to progressively earlier exits while
keeping the carry structure identical (the scan still carries the full
ring), so each number isolates one stage ON TOP of the same dispatch +
carry floor.

Usage: python tools/r4_probe3.py [buffered|seek ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOICES = 4096
RATE = 48000
BLOCK = 512
W = 188


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(buffered):
    import oddio_tpu as ot

    rng = np.random.default_rng(0)
    control, scene = ot.SpatialScene.new(initial_capacity=VOICES)
    for _ in range(VOICES):
        sig = ot.Sine(rng.uniform(0, 6), rng.uniform(100, 2000))
        if buffered:
            opts = ot.SpatialOptions(
                position=rng.uniform(-15, 15, 3),
                velocity=rng.uniform(-0.3, 0.3, 3),
            )
            control.play_buffered(
                sig, opts, max_distance=50.0, rate=RATE, buffer_duration=0.1
            )
        else:
            control.play(sig, ot.SpatialOptions(
                position=rng.uniform(-30, 30, 3),
                velocity=rng.uniform(-5, 5, 3),
            ))
    return control, scene


def time_scene(scene, label, ntrials=3, nch=5):
    import jax.numpy as jnp

    import oddio_tpu as ot

    r = ot.Renderer(scene, RATE)
    t0 = time.time()
    first = r.render_frames(BLOCK * 8)
    assert np.isfinite(first).all()
    blocks = r.render_frames_device(BLOCK * W)
    blocks = r.render_frames_device(BLOCK * W)
    float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
    log(f"[{label}] warmup: {time.time()-t0:.1f}s")
    audio = nch * W * BLOCK / RATE
    best = None
    for _ in range(ntrials):
        t0 = time.time()
        for _ in range(nch):
            blocks = r.render_frames_device(BLOCK * W, sync=False)
        float(np.asarray(jnp.sum(blocks[-1][-1] ** 2)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        log(f"[{label}] {audio/dt:.1f}x RT ({dt*1000/(nch*W):.4f} ms/block)")
    scene.sync()
    return best * 1000 / (nch * W)


def probe_buffered():
    import jax.numpy as jnp

    from oddio_tpu import spatial as sp

    orig = sp._BufferedPoolDR.render
    variants = {}

    def dep_zeros(params, n):
        z = jnp.zeros((2, n), jnp.float32)
        if "w" in params:
            z = z + 0.0 * params["w"]
        return z

    # scan floor: carry passes through untouched (ring still in the carry)
    def render_floor(self, dstate, ddata, params, n):
        return dict(dstate), dep_zeros(params, n)

    # control walk only
    def render_walk(self, dstate, ddata, params, n):
        S = dict(dstate)
        elapsed = np.float32(self._elapsed)
        S, mask, prev_pos, next_pos = self._walk_device(S, params, elapsed)
        out = dep_zeros(params, n) + 0.0 * (
            jnp.sum(prev_pos[0][0]) + jnp.sum(next_pos[0][0])
            + mask[0].astype(jnp.float32)
        )
        return S, out

    # walk + per-ear geometry + cursor math (no inner/append/read)
    def render_geom(self, dstate, ddata, params, n):
        from oddio_tpu.ops.geometry import ear_states
        from oddio_tpu.ops._dev import device_split_ds

        S = dict(dstate)
        elapsed = np.float32(self._elapsed)
        ratef = np.float32(self.rate)
        S, mask, prev_pos, next_pos = self._walk_device(S, params, elapsed)
        capf = np.float32(self.cap_pool)
        if "w" in params:
            w_end = params["w"]
        else:
            w_end = jnp.mod(S["wcur"][0] + np.float32(self._prep_inv[2]), capf)
        S["wcur"] = w_end[None]
        from oddio_tpu.ops.geometry import ear_states_c

        p_off_c, p_gain_c = ear_states_c(prev_pos, S["radius"])
        n_off_c, n_gain_c = ear_states_c(next_pos, S["radius"])
        nmd = -S["max_delay"]
        p_off_c = [jnp.maximum(po - elapsed, nmd) for po in p_off_c]
        n_off_c = [jnp.maximum(no, nmd) for no in n_off_c]
        nf = np.float32(n) if n > 0 else np.float32(1.0)
        d_gain_c = [(n_gain_c[e] - p_gain_c[e]) / nf for e in range(2)]
        wp = w_end + S["phase"]
        offset0_c = [jnp.mod(wp + p_off_c[e] * ratef, capf) for e in range(2)]
        obase_c = [jnp.floor(o) for o in offset0_c]
        split_c = [
            device_split_ds(((n_off_c[e] - p_off_c[e]) / nf) * ratef)
            for e in range(2)
        ]
        maskf = mask.astype(jnp.float32)
        dep = jnp.float32(0.0)
        for e in range(2):
            dep = dep + obase_c[e][0] + split_c[e][1][0] + split_c[e][2][0]                 + d_gain_c[e][0] + p_gain_c[e][0]                 + split_c[e][0][0].astype(jnp.float32)
        out = dep_zeros(params, n) + 0.0 * (dep + maskf[0])
        return S, out

    for name, fn in (
        ("floor", render_floor),
        ("walk", render_walk),
        ("geom", render_geom),
        ("full", orig),
    ):
        sp._BufferedPoolDR.render = fn
        control, scene = build(True)
        variants[name] = time_scene(scene, f"buf_{name}")
    sp._BufferedPoolDR.render = orig
    log("== buffered glue decomposition (ms/block, best) ==")
    for k, v in variants.items():
        log(f"  {k:>8}: {v:.4f}")
    log(f"  walk cost ~ {variants['walk'] - variants['floor']:.4f}")
    log(f"  geom cost ~ {variants['geom'] - variants['walk']:.4f}")


def probe_seek():
    import jax.numpy as jnp

    from oddio_tpu import spatial as sp

    orig = sp._SeekPoolDR.render
    variants = {}

    def dep_zeros(params, n):
        import jax

        z = jnp.zeros((2, n), jnp.float32)
        for v in jax.tree.leaves(params):
            z = z + 0.0 * jnp.nan_to_num(
                jnp.sum(jnp.asarray(v).astype(jnp.float32).ravel()[:1])
            )
        return z

    def render_floor(self, dstate, ddata, params, n):
        return dict(dstate), dep_zeros(params, n)

    def render_walk(self, dstate, ddata, params, n):
        S = dict(dstate)
        elapsed = np.float32(self._elapsed)
        S, mask, prev_pos, next_pos = self._walk_device(S, params, elapsed)
        out = dep_zeros(params, n) + 0.0 * (
            jnp.sum(prev_pos[0]) + jnp.sum(next_pos[0])
            + mask[0].astype(jnp.float32)
        )
        return S, out

    for name, fn in (
        ("floor", render_floor),
        ("walk", render_walk),
        ("full", orig),
    ):
        sp._SeekPoolDR.render = fn
        control, scene = build(False)
        variants[name] = time_scene(scene, f"seek_{name}")
    sp._SeekPoolDR.render = orig
    log("== seek decomposition (ms/block, best) ==")
    for k, v in variants.items():
        log(f"  {k:>8}: {v:.4f}")
    log(f"  walk cost ~ {variants['walk'] - variants['floor']:.4f}")
    log(f"  warp+mix  ~ {variants['full'] - variants['walk']:.4f}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["buffered", "seek"]
    for w in which:
        if w == "buffered":
            probe_buffered()
        elif w == "seek":
            probe_seek()
