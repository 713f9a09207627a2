"""Round-3 TPU session E: wave with block-major init, no step-0 sort,
8-bit Morton keys; per-step profiling.

Usage: timeout 5400 python scripts/tpu_session_r3e.py [P A B C D]
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
    todo = set(sys.argv[1:]) or {"P", "A", "B", "C"}
    print("platform:", jax.devices()[0].platform, flush=True)

    dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "P" in todo:
        print("== P: teapot @720p per-step profile (k=2, spw=1) ==",
              flush=True)
        os.environ["RENE_WAVE_PROFILE"] = "1"
        from rene_tpu.integrators import pallas_wave as pw
        from rene_tpu.scene.device import build_device_scene
        bn, cfg = build_device_scene(teapot_hi)
        run = pw.make_pallas_wave_fn(bn, cfg, k_bounces=2,
                                     samples_per_wave=1)
        import time
        t0 = time.time()
        run(3, 1)
        print(f"  P: first wave total {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        run(4, 1)
        print(f"  P: second wave total {time.time()-t0:.1f}s", flush=True)
        os.environ["RENE_WAVE_PROFILE"] = "0"

    if "A" in todo:
        print("== A: dragon @320x180 (mega 0.017) ==", flush=True)
        measure_wave("A.wave k=2", dragon_lo, k_bounces=2)
        print("== A2: teapot @320x180 (mega 0.168) ==", flush=True)
        measure_wave("A2.wave k=2", teapot_lo, k_bounces=2)
        measure_wave("A2.wave k=2 cellmajor", teapot_lo, k_bounces=2,
                     oct_major=False)

    if "B" in todo:
        print("== B: teapot @1280x720 (mega 2.22) ==", flush=True)
        measure_wave("B.wave k=2 spw=1", teapot_hi, k_bounces=2,
                     samples_per_wave=1, reps=2)
        measure_wave("B.wave k=4 spw=2", teapot_hi, k_bounces=4,
                     samples_per_wave=2, reps=2)
        measure_wave("B.wave k=2 spw=2 cellmajor", teapot_hi,
                     k_bounces=2, samples_per_wave=2, oct_major=False,
                     reps=2)

    if "C" in todo:
        print("== C: dragon @1280x720 (mega 0.164) ==", flush=True)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_wave("C.wave k=4 spw=2", dragon_hi, k_bounces=4,
                     samples_per_wave=2, reps=2)


if __name__ == "__main__":
    main()
