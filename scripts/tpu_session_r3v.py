"""Round-3 TPU session V: variant E — any-hit break only (closest fori).

r3t measured closest-only (B) and closest+any (C) but never any-only.
VMEM-mode data so far (teapot wave hi / dragon mega lo):
  no break 0.742/0.016, B 0.797/0.016, C 0.783/0.014, D 0.759/0.016.
If E lands ~0.742/0.014 the shipped default (any break everywhere,
closest break HBM-only) is confirmed optimal on both scene classes.

Usage: timeout 3600 python scripts/tpu_session_r3v.py
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
    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
    measure("V.E dragon mega lo", dragon_lo, spp_a=4, spp_b=16, reps=2)
    measure_wave("V.E teapot wave hi", teapot_hi, spp=8,
                 samples_per_wave=8, reps=3)


if __name__ == "__main__":
    main()
