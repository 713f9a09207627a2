"""Round-3 TPU session G: wave schedules + prefix sorts on the cluster
scenes.

  P. teapot @720p profiles: schedule (1,1,2,4) vs (2,) [prefix sorts on
     for both]; dir_bits=6 variant.
  B. teapot @320x180 and @720p best-config measurements vs mega.
  D. dragon @320x180 + @720p schedule (1,4).

Usage: timeout 5400 python scripts/tpu_session_r3g.py [P B D]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure
from tpu_session_r3a import measure_wave


def profile_wave(tag, scene, spp=1, seed=3, **kw):
    from rene_tpu.integrators import pallas_wave as pw
    from rene_tpu.scene.device import build_device_scene
    os.environ["RENE_WAVE_PROFILE"] = "1"
    try:
        bn, cfg = build_device_scene(scene)
        run = pw.make_pallas_wave_fn(bn, cfg, **kw)
        t0 = time.time()
        run(seed, spp)
        print(f"{tag}: first wave {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        run(seed + 1, spp)
        print(f"{tag}: steady wave {time.time()-t0:.2f}s "
              f"({(time.time()-t0)/spp*1000:.0f} ms/spp)", flush=True)
    finally:
        os.environ["RENE_WAVE_PROFILE"] = "0"


def main():
    import jax
    todo = set(sys.argv[1:]) or {"P", "B", "D"}
    print("platform:", jax.devices()[0].platform, flush=True)

    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    if "P" in todo:
        print("== P: teapot @720p profiles ==", flush=True)
        profile_wave("P.sched(1,1,2,4)", teapot_hi,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=1)
        profile_wave("P.sched(2,)", teapot_hi, k_bounces=2,
                     samples_per_wave=1)
        profile_wave("P.sched(1,1,2,4) dir6", teapot_hi,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=1,
                     dir_bits=6)

    if "B" in todo:
        print("== B: teapot measurements (mega 0.168 / 2.22) ==",
              flush=True)
        measure_wave("B.lo sched(1,1,2,4)", teapot_lo,
                     k_schedule=(1, 1, 2, 4))
        measure_wave("B.hi sched(1,1,2,4)", teapot_hi,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=1,
                     reps=3)
        measure_wave("B.hi sched(1,1,2,4) spw2", teapot_hi,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=2,
                     reps=2)

    if "D" in todo:
        print("== D: dragon (mega 0.017 / 0.164) ==", flush=True)
        dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("D.lo sched(1,4)", dragon_lo, k_schedule=(1, 4))
        measure_wave("D.hi sched(1,4)", dragon_hi, k_schedule=(1, 4),
                     samples_per_wave=1, reps=2)


if __name__ == "__main__":
    main()
