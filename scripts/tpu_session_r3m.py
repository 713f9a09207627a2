"""Round-3 TPU session M: last wave knobs — SUB_TRIS=16, deeper k=1
schedules, spw sweep at 720p with the shipped config.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at
from tpu_session_r3a import measure_wave


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    measure_wave("M.hi sub16 spw4", teapot_hi, spp=4,
                 samples_per_wave=4, sub_tris=16, reps=2)
    measure_wave("M.hi sub32 sched(1,1,1,2,4) spw4", teapot_hi, spp=4,
                 samples_per_wave=4, k_schedule=(1, 1, 1, 2, 4), reps=2)
    measure_wave("M.hi sub32 spw8", teapot_hi, spp=8,
                 samples_per_wave=8, reps=2)
    measure_wave("M.lo sub32 default", teapot_lo, spp=18,
                 samples_per_wave=18, reps=3)
    measure_wave("M.lo sub16", teapot_lo, spp=18,
                 samples_per_wave=18, sub_tris=16, reps=2)


if __name__ == "__main__":
    main()
