"""Round-2 TPU session E: final-config 720p marginals + golden SSIMs.

Usage: timeout 5400 python scripts/tpu_session_r2e.py [P Q]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure
from tpu_session_r2c import golden_ssim


def main():
    import jax
    todo = set(sys.argv[1:]) or {"P", "Q"}
    print("platform:", jax.devices()[0].platform, flush=True)

    if "P" in todo:
        d = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure("F.dragon@1280x720", d, 1, 3)
        t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        measure("F.teapot@1280x720", t, 1, 3)

    if "Q" in todo:
        golden_ssim("cornell-box", "cornell-box/scene.pbrt", 2048,
                    ("none", "atrous", "cnn"))
        golden_ssim("veach-mis", "veach-mis/scene.pbrt", 1024,
                    ("none", "atrous"))
        golden_ssim("dragon", "dragon/scene.pbrt", 64)
        golden_ssim("teapot", "teapot/scene.pbrt", 64)


if __name__ == "__main__":
    main()
