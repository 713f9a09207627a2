"""Round-3 TPU session I: combined wave (multi-lane + per-lane regen).

spw lanes/pixel each streaming want/spw samples: spw=18&want=18 at
320x180 reproduces the winning non-regen config (per-lane want 1), while
720p can trade lanes vs regeneration.

  B. teapot @320x180 (spw=18): 18spp, sched (1,1,2,4) [expect ~0.084].
     teapot @720p: spw=2 x 4spp sched (1,1,2,4); spw=2 x 8spp;
     spw=4 x 8spp.
  D. dragon @320x180 18spp sched (1,4); @720p spw=2 x 8spp (1,4) + k2.
  Z. parity: teapot @320x180 wave vs mega channel means.

Baselines: mega teapot 0.168 / 2.22, dragon 0.017 / 0.164 s/spp.
Usage: timeout 5400 python scripts/tpu_session_r3i.py [B D Z]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from tpu_session_r2 import SAMPLES, load_at
from tpu_session_r3a import measure_wave


def main():
    import jax
    todo = set(sys.argv[1:]) or {"B", "D", "Z"}
    print("platform:", jax.devices()[0].platform, flush=True)

    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    if "B" in todo:
        print("== B: teapot (mega 0.168 / 2.22) ==", flush=True)
        measure_wave("B.lo spw18x18", teapot_lo, spp=18,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=18)
        measure_wave("B.hi spw2x4", teapot_hi, spp=4,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=2,
                     reps=3)
        measure_wave("B.hi spw2x8", teapot_hi, spp=8,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=2,
                     reps=2)
        measure_wave("B.hi spw4x8", teapot_hi, spp=8,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=4,
                     reps=2)

    if "D" in todo:
        print("== D: dragon (mega 0.017 / 0.164) ==", flush=True)
        dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("D.lo spw18x18 (1,4)", dragon_lo, spp=18,
                     k_schedule=(1, 4), samples_per_wave=18)
        measure_wave("D.hi spw2x8 (1,4)", dragon_hi, spp=8,
                     k_schedule=(1, 4), samples_per_wave=2, reps=2)
        measure_wave("D.hi spw2x8 k2", dragon_hi, spp=8, k_bounces=2,
                     samples_per_wave=2, reps=2)

    if "Z" in todo:
        print("== Z: parity teapot @320x180 ==", flush=True)
        from rene_tpu.integrators import pallas_path as pp
        from rene_tpu.integrators import pallas_wave as pw
        from rene_tpu.scene.device import build_device_scene
        bn, cfg = build_device_scene(teapot_lo)
        mrun = pp.make_pallas_batch_fn(bn, cfg)
        wrun = pw.make_pallas_wave_fn(bn, cfg, k_schedule=(1, 1, 2, 4),
                                      samples_per_wave=18)
        mo = mrun(3, 32)
        wo = wrun(5, 32)
        m = np.asarray(mo["radiance"]) / 32.0
        w = np.asarray(wo["radiance"]) / 32.0
        print("  mega mean:", m.mean(axis=0), flush=True)
        print("  wave mean:", w.mean(axis=0), flush=True)
        ma = np.asarray(mo["albedo"]) / 32.0
        wa = np.asarray(wo["albedo"]) / 32.0
        print("  albedo max|diff|:", np.abs(ma - wa).max(), flush=True)
        print("  rays mega/wave:", float(mo["rays"]),
              float(wo["rays"]), flush=True)


if __name__ == "__main__":
    main()
