"""Round-2 TPU session D: cluster-march profiling + SUPER sweep.

  E1: teapot@320x180 with _PROFILE_SKIP_MT (box-sweep floor share).
  E2: teapot@320x180 with SUPER=16.
  E3: dragon@1280x720 with SUPER=16.
  E4: teapot@1280x720 with SUPER=16.

Usage: timeout 3600 python scripts/tpu_session_r2d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from rene_tpu.integrators import pallas_path as pp
from tpu_session_r2 import SAMPLES, load_at, measure


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)

    t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
    pp._PROFILE_SKIP_MT = True
    try:
        measure("E1.teapot@180 boxes-only", t, 2, 6)
    finally:
        pp._PROFILE_SKIP_MT = False

    pp.SUPER = 16
    try:
        t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
        measure("E2.teapot@180 SUPER16", t, 2, 6)
        d = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure("E3.dragon@720 SUPER16", d, 1, 3)
        t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        measure("E4.teapot@720 SUPER16", t, 1, 3)
    finally:
        pp.SUPER = 8


if __name__ == "__main__":
    main()
