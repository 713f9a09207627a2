"""Round-3 TPU session S: measure OCT_BREAK (early march termination).

Baselines (octant-ordered, no break — tpu_session_r3o):
  teapot wave  @320x180 0.068  / @720p 0.746 s/spp
  teapot mega  @320x180 0.170  / @720p 2.18
  dragon mega  @320x180 0.018  / @720p 0.125
  dragon wave  @320x180 0.031

Usage: timeout 5400 python scripts/tpu_session_r3s.py [lo hi]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure  # noqa: E402
from tpu_session_r3a import measure_wave  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    args = sys.argv[1:] or ["lo", "hi"]

    if "lo" in args:
        teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
        dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        measure_wave("S.lo teapot wave", teapot_lo, spp=18,
                     samples_per_wave=18, reps=3)
        measure("S.lo teapot mega", teapot_lo, spp_a=2, spp_b=10, reps=2)
        measure("S.lo dragon mega", dragon_lo, spp_a=4, spp_b=16, reps=2)

    if "hi" in args:
        teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("S.hi teapot wave spw8", teapot_hi, spp=8,
                     samples_per_wave=8, reps=3)
        measure("S.hi dragon mega", dragon_hi, spp_a=2, spp_b=8, reps=2)


if __name__ == "__main__":
    main()
