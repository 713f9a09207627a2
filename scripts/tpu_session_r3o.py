"""Round-3 TPU session O: measure octant-ordered marching (OCT_ORDER).

Baselines (camera-ordered, VALIDATION.md round 3):
  teapot wave  @320x180 0.084  / @720p 1.017 s/spp
  teapot mega  @320x180 0.168  / @720p 2.22
  dragon mega  @320x180 0.017  / @720p 0.164
  dragon wave  @320x180 0.029  / @720p 0.30

Usage: timeout 5400 python scripts/tpu_session_r3o.py [lo hi prof]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure
from tpu_session_r3a import measure_wave


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    args = sys.argv[1:] or ["lo", "hi"]

    if "lo" in args:
        teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
        dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        measure_wave("O.lo teapot wave", teapot_lo, spp=18,
                     samples_per_wave=18, reps=3)
        measure("O.lo teapot mega", teapot_lo, spp_a=2, spp_b=10, reps=2)
        measure("O.lo dragon mega", dragon_lo, spp_a=4, spp_b=16, reps=2)
        measure_wave("O.lo dragon wave", dragon_lo, spp=18,
                     samples_per_wave=18, reps=2)

    if "hi" in args:
        teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("O.hi teapot wave spw8", teapot_hi, spp=8,
                     samples_per_wave=8, reps=3)
        measure("O.hi dragon mega", dragon_hi, spp_a=2, spp_b=8, reps=2)
        measure("O.hi teapot mega", teapot_hi, spp_a=1, spp_b=4, reps=2)

    if "prof" in args:
        teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        os.environ["RENE_WAVE_PROFILE"] = "1"
        measure_wave("O.prof teapot wave spw8", teapot_hi, spp=8,
                     samples_per_wave=8, reps=1)
        del os.environ["RENE_WAVE_PROFILE"]


if __name__ == "__main__":
    main()
