"""Round-3 TPU session Y: split the wave's non-step overhead.

r3r: one 8-spp teapot@720p wave = ~5.0s of stepped work (sort+kernel)
but 5.97-8.9s wall -> ~1-1.4s in init_state / finish_wave / host loop.
At spw8 that is 125-175 ms/spp. Time each phase with forced syncs.

Usage: timeout 3600 python scripts/tpu_session_r3y.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rene_tpu.integrators.pallas_wave import make_pallas_wave_fn
    from rene_tpu.scene.device import build_device_scene

    print("platform:", jax.devices()[0].platform, flush=True)
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    bn, config = build_device_scene(teapot)
    run = make_pallas_wave_fn(bn, config, samples_per_wave=8)

    # warm everything once
    t0 = time.time()
    out = run(3, 8)
    print(f"warm wave: {time.time() - t0:.1f}s", flush=True)

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    for rep in range(2):
        t0 = time.time()
        state, pix = run.init_state(jnp.int32(11 + rep), jnp.int32(8))
        sync(state[0, :1])
        t_init = time.time() - t0

        t0 = time.time()
        state, pix = run.sort_prefix(state, pix, state.shape[1])
        sync(state[0, :1])
        t_sort_full = time.time() - t0

        t0 = time.time()
        sums, rays = run.finish_wave(state, pix)
        sync(rays)
        t_fin = time.time() - t0
        print(f"rep{rep}: init {t_init * 1000:.0f} ms, full-sort "
              f"{t_sort_full * 1000:.0f} ms, finish "
              f"{t_fin * 1000:.0f} ms", flush=True)

    # whole wave again for the wall reference
    t0 = time.time()
    out = run(5, 8)
    sync(out["rays"])
    print(f"wave wall: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
