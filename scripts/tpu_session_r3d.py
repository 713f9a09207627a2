"""Round-3 TPU session D: wave parameter sweep (k, spw, sort schedule).

r3a/r3c findings: the march under redistribution beats the megakernel
(teapot kernel ~94 vs 168 ms/spp at 320x180) but XLA redistribution has
a ~70 ms floor per step at 2^20 lanes (argsort 31 + gather 38; even a
transpose is 29 — the runtime executes ops at ~3 GB/s). So the levers
are fewer sort points: bigger k_bounces, sort_first schedules, spw.

  A. dragon @320x180: k=4 / k=8; k=8 sort_first=2.
  B. teapot @320x180: k=4 / k=8; k=4 sort_first=4; k=8 sort_first=2.
  C. teapot @1280x720: mega baseline; best-k wave at spw=1 and spw=2.
  D. dragon @1280x720: mega baseline; best-k wave spw=2.

Usage: timeout 5400 python scripts/tpu_session_r3d.py [A B C D]
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
    todo = set(sys.argv[1:]) or {"A", "B"}
    print("platform:", jax.devices()[0].platform, flush=True)

    dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
    teapot_lo = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)

    if "A" in todo:
        print("== A: dragon @320x180 (mega best 0.017) ==", flush=True)
        measure_wave("A.wave k=4", dragon_lo, k_bounces=4)
        measure_wave("A.wave k=8", dragon_lo, k_bounces=8)
        measure_wave("A.wave k=8 sf2", dragon_lo, k_bounces=8,
                     sort_first=2)

    if "B" in todo:
        print("== B: teapot @320x180 (mega best 0.168) ==", flush=True)
        measure_wave("B.wave k=4", teapot_lo, k_bounces=4)
        measure_wave("B.wave k=4 sf4", teapot_lo, k_bounces=4,
                     sort_first=4)
        measure_wave("B.wave k=8", teapot_lo, k_bounces=8)
        measure_wave("B.wave k=8 sf2", teapot_lo, k_bounces=8,
                     sort_first=2)

    if "C" in todo:
        print("== C: teapot @1280x720 ==", flush=True)
        teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        measure("C.mega", teapot_hi, 1, 3, reps=2)
        measure_wave("C.wave k=4 spw=1", teapot_hi, k_bounces=4,
                     samples_per_wave=1, reps=2)
        measure_wave("C.wave k=4 spw=2", teapot_hi, k_bounces=4,
                     samples_per_wave=2, reps=2)
        measure_wave("C.wave k=4 sf4 spw=2", teapot_hi, k_bounces=4,
                     sort_first=4, samples_per_wave=2, reps=2)

    if "D" in todo:
        print("== D: dragon @1280x720 ==", flush=True)
        dragon_hi = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure("D.mega", dragon_hi, 1, 3, reps=2)
        measure_wave("D.wave k=4 spw=2", dragon_hi, k_bounces=4,
                     samples_per_wave=2, reps=2)
        measure_wave("D.wave k=8 spw=2", dragon_hi, k_bounces=8,
                     samples_per_wave=2, reps=2)


if __name__ == "__main__":
    main()
