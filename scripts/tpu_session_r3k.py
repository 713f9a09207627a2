"""Round-3 TPU session K: teapot@720p wave — march-granularity knobs
under SORTED tiles (the mega-tuned SUB_TRIS=64/SUPER=8 tradeoffs may
differ when entries are coherent).

  P. profile spw4 sched(1,1,2,4) (the 1.45 s/spp config).
  A. SUB_TRIS=32 variant; SUPER=16 variant; dir6 cell-major keys.

Usage: timeout 5400 python scripts/tpu_session_r3k.py [P A]
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
    from rene_tpu.integrators import pallas_path as pp
    todo = set(sys.argv[1:]) or {"P", "A"}
    print("platform:", jax.devices()[0].platform, flush=True)
    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "P" in todo:
        profile_wave("P.spw4 sched(1,1,2,4)", teapot_hi, spp=4,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=4)

    if "A" in todo:
        sub0, sup0 = pp.SUB_TRIS, pp.SUPER
        try:
            pp.SUB_TRIS = 32
            measure_wave("A.SUB32 spw4", teapot_hi, spp=4,
                         k_schedule=(1, 1, 2, 4), samples_per_wave=4,
                         reps=2)
        finally:
            pp.SUB_TRIS = sub0
        try:
            pp.SUPER = 16
            measure_wave("A.SUPER16 spw4", teapot_hi, spp=4,
                         k_schedule=(1, 1, 2, 4), samples_per_wave=4,
                         reps=2)
        finally:
            pp.SUPER = sup0
        measure_wave("A.dir6cell spw4", teapot_hi, spp=4,
                     k_schedule=(1, 1, 2, 4), samples_per_wave=4,
                     dir_bits=6, oct_major=False, reps=2)


if __name__ == "__main__":
    main()
