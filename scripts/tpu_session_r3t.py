"""Round-3 TPU session T: OCT_BREAK variant matrix.

C (break closest+any, every-group bound) measured in r3s:
  teapot wave hi 0.783 (base 0.746), teapot wave lo 0.073 (0.068),
  teapot mega lo 0.179 (0.170), dragon mega lo 0.014 (0.018),
  dragon mega hi 0.129 (0.125).

Variants here (module flags mutated between builds):
  B: closest-only break          (ANY=False, EVERY=1)
  D: closest-only, bound every 4 (ANY=False, EVERY=4)
  A: break disabled (fori)       re-baseline for chip variance

Usage: timeout 5400 python scripts/tpu_session_r3t.py [B D A]
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

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["B", "D", "A"]
    teapot_hi = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    dragon_lo = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)

    cfgs = {"B": (True, False, 1), "D": (True, False, 4),
            "A": (False, False, 1)}
    for v in todo:
        pp.OCT_BREAK, pp.OCT_BREAK_ANY, pp.BREAK_EVERY = cfgs[v]
        print(f"== variant {v}: BREAK={pp.OCT_BREAK} "
              f"ANY={pp.OCT_BREAK_ANY} EVERY={pp.BREAK_EVERY}",
              flush=True)
        measure_wave(f"T.{v} teapot wave hi", teapot_hi, spp=8,
                     samples_per_wave=8, reps=3)
        measure(f"T.{v} dragon mega lo", dragon_lo, spp_a=4, spp_b=16,
                reps=2)


if __name__ == "__main__":
    main()
