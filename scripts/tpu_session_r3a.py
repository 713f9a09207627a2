"""Round-3 TPU session A: wavefront engine vs megakernel on cluster scenes.

Experiments:
  S. sort+gather micro-bench at 2^20 lanes (the per-step redistribution
     cost: argsort int32 keys + (21, N) state gather).
  A. dragon @320x180: mega baseline, wave k=1/k=2, wave without sorting
     (ablation: is the win from redistribution or from the wave shape?).
  B. teapot @320x180: mega baseline, wave k=2.
  C. teapot @1280x720: mega baseline (round-2: ~2.0 s/spp), wave k=2.
     Target (VERDICT): <= 0.5 s/spp.
  D. dragon @1280x720: mega baseline (round-2: 0.160), wave k=2.
     Target: <= 0.08 s/spp.
  P. parity: wave vs mega channel means on dragon @320x180.

Usage: timeout 5400 python scripts/tpu_session_r3a.py [S A B C D P]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from rene_tpu.integrators import pallas_path as pp
from rene_tpu.integrators import pallas_wave as pw
from rene_tpu.scene.device import build_device_scene

from tpu_session_r2 import SAMPLES, load_at, measure


def measure_wave(tag, scene, spp=0, seed=3, reps=3, **kw):
    bn, cfg = build_device_scene(scene)
    run = pw.make_pallas_wave_fn(bn, cfg, **kw)
    assert run is not None, f"{tag}: wave unsupported"
    n = spp or run.samples_per_wave
    t0 = time.time()
    out = run(seed, n)
    print(f"{tag}: compile+1st wave ({n}spp, {run.n_tiles} tiles, "
          f"{run.steps} steps) {time.time()-t0:.1f}s", flush=True)
    best = 1e30
    for r in range(reps):
        t0 = time.time()
        out = run(seed + 1 + r, n)
        dt = time.time() - t0
        best = min(best, dt / n)
        print(f"  rep{r}: {dt:.2f}s -> {dt/n*1000:.0f} ms/spp", flush=True)
    print(f"{tag}: best {best:.3f} s/spp", flush=True)
    return out, best


def sort_bench(n=1 << 20, reps=5):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 21, n, dtype=np.int32))
    x = jnp.asarray(rng.random((pp.W_NROWS, n), np.float32))

    @jax.jit
    def f(k, x):
        p = jnp.argsort(k)
        return jnp.take(x, p, axis=1), jnp.take(k, p)

    y, kk = f(key, x)
    float(y[0, 0]); float(kk[0])
    for r in range(reps):
        t0 = time.time()
        y, kk = f(key, x)
        float(y[0, 0]); float(kk[0])
        print(f"  sort+gather (21,{n}) rep{r}: "
              f"{(time.time()-t0)*1000:.1f} ms", flush=True)


def main():
    import jax
    todo = set(sys.argv[1:]) or {"S", "A", "B", "C", "D", "P"}
    print("platform:", jax.devices()[0].platform, flush=True)

    if "S" in todo:
        print("== S: sort+gather micro-bench ==", flush=True)
        sort_bench()

    dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    mega_out = None
    if "A" in todo:
        print("== A: dragon @320x180 ==", flush=True)
        mega_out, _ = measure("A.mega", dragon_lo, 2, 8)
        measure_wave("A.wave k=2", dragon_lo, k_bounces=2)
        measure_wave("A.wave k=1", dragon_lo, k_bounces=1)
        measure_wave("A.wave k=2 nosort", dragon_lo, k_bounces=2,
                     sort_rays=False)

    if "B" in todo:
        print("== B: teapot @320x180 ==", flush=True)
        measure("B.mega", teapot_lo, 2, 8)
        measure_wave("B.wave k=2", teapot_lo, k_bounces=2)

    if "C" in todo:
        print("== C: teapot @1280x720 ==", flush=True)
        teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        measure("C.mega", teapot_hi, 1, 3, reps=2)
        measure_wave("C.wave k=2", teapot_hi, k_bounces=2, reps=2)

    if "D" in todo:
        print("== D: dragon @1280x720 ==", flush=True)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure("D.mega", dragon_hi, 1, 3, reps=2)
        measure_wave("D.wave k=2", dragon_hi, k_bounces=2, reps=2)

    if "P" in todo:
        print("== P: parity dragon @320x180 ==", flush=True)
        bn, cfg = build_device_scene(dragon_lo)
        mega_spp = 8
        if mega_out is None:
            mrun = pp.make_pallas_batch_fn(bn, cfg)
            mega_out = mrun(3, 16)
            mega_spp = 16
        wrun = pw.make_pallas_wave_fn(bn, cfg, k_bounces=2)
        wout = wrun(5, 16)
        m = np.asarray(mega_out["radiance"]) / mega_spp
        w = np.asarray(wout["radiance"]) / 16.0
        print("  mega mean:", m.mean(axis=0), flush=True)
        print("  wave mean:", w.mean(axis=0), flush=True)
        ma = np.asarray(mega_out["albedo"]) / mega_spp
        wa = np.asarray(wout["albedo"]) / 16.0
        print("  albedo max|diff|:", np.abs(ma - wa).max(), flush=True)


if __name__ == "__main__":
    main()
