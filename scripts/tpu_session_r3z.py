"""Round-3 TPU session Z: wave key order + schedule variants @720p.

Step profile (r3r): step1 (sorted first diffuse, full population)
0.26 us/lane-bounce but step2 0.63 — post-sort tiles are ~2.4x less
efficient per lane. Rejected so far: dir6 keys both orders,
(1,1,1,2,4), spw12/16. Untested: cell-major with the default 3-bit
octant (E1), coarser schedules that amortize sorts (E2/E3).

Baseline: spw8 schedule (1,1,2,4) oct-major = 0.742-0.771 s/spp.

Usage: timeout 5400 python scripts/tpu_session_r3z.py [E1 E2 E3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3a import measure_wave  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E1", "E2", "E3"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "E1" in todo:
        measure_wave("Z.E1 cell-major oct3", teapot, spp=8,
                     samples_per_wave=8, oct_major=False, reps=3)
    if "E2" in todo:
        measure_wave("Z.E2 schedule (1,2,4)", teapot, spp=8,
                     samples_per_wave=8, k_schedule=(1, 2, 4), reps=3)
    if "E3" in todo:
        measure_wave("Z.E3 schedule (1,1,2,2)", teapot, spp=8,
                     samples_per_wave=8, k_schedule=(1, 1, 2, 2),
                     reps=3)


if __name__ == "__main__":
    main()
