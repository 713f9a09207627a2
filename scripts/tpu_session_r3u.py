"""Round-3 TPU session U: confirm the hbm-gated OCT_BREAK defaults.

Expected (r3t matrix): teapot wave hi ~0.742 (VMEM -> no break),
dragon mega lo ~0.014 (HBM -> full break), dragon hi <= 0.125.

Usage: timeout 3600 python scripts/tpu_session_r3u.py
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
    dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
    measure("U dragon mega lo", dragon_lo, spp_a=4, spp_b=16, reps=2)
    measure("U dragon mega hi", dragon_hi, spp_a=2, spp_b=8, reps=2)
    measure_wave("U teapot wave hi", teapot_hi, spp=8,
                 samples_per_wave=8, reps=3)


if __name__ == "__main__":
    main()
