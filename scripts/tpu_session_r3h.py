"""Round-3 TPU session H: REGENERATING wave (mega occupancy + sorting).

  P. teapot @720p profile, schedule (2,), 4 spp per wave.
  B. teapot @320x180 + @720p: schedules (2,), (1,2), (4,).
  D. dragon @320x180 + @720p: schedules (2,), (4,).

Baselines: mega teapot 0.168 / 2.22, dragon 0.017 / 0.164 s/spp.
Usage: timeout 5400 python scripts/tpu_session_r3h.py [P B D]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at
from tpu_session_r3a import measure_wave
from tpu_session_r3g import profile_wave


def main():
    import jax
    todo = set(sys.argv[1:]) or {"P", "B", "D"}
    print("platform:", jax.devices()[0].platform, flush=True)

    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    if "P" in todo:
        print("== P: teapot @720p regen profile ==", flush=True)
        profile_wave("P.regen k2 4spp", teapot_hi, spp=4, k_bounces=2,
                     samples_per_wave=4)

    if "B" in todo:
        print("== B: teapot (mega 0.168 / 2.22) ==", flush=True)
        measure_wave("B.lo k2", teapot_lo, spp=18, k_bounces=2)
        measure_wave("B.lo sched(1,2)", teapot_lo, spp=18,
                     k_schedule=(1, 2))
        measure_wave("B.hi k2", teapot_hi, spp=4, k_bounces=2, reps=3)
        measure_wave("B.hi sched(1,2)", teapot_hi, spp=4,
                     k_schedule=(1, 2), reps=2)
        measure_wave("B.hi k4", teapot_hi, spp=4, k_bounces=4, reps=2)

    if "D" in todo:
        print("== D: dragon (mega 0.017 / 0.164) ==", flush=True)
        dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("D.lo k2", dragon_lo, spp=18, k_bounces=2)
        measure_wave("D.lo k4", dragon_lo, spp=18, k_bounces=4)
        measure_wave("D.hi k2", dragon_hi, spp=4, k_bounces=2, reps=2)
        measure_wave("D.hi k4", dragon_hi, spp=4, k_bounces=4, reps=2)


if __name__ == "__main__":
    main()
