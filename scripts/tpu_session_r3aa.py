"""Round-3 TPU session AA: in-kernel cluster-id sort keys @720p.

WROW_KEY: the bounce kernel now emits the next-launch sort key itself
(octant x winner-cluster origin bins + Morton fallback; commit
37e3fbc). Two claims to measure on teapot @1280x720 spw8:
  E1 key_mode="kernel" — surface-adaptive bins + zero XLA key math.
  E2 key_mode="xla"    — legacy host Morton key (same kernels, so
                         compile cache is shared; isolates sort cost).
Baseline (octant-ordered marching, xla keys, 26-row state): 0.746 s/spp.

Usage: timeout 5400 python scripts/tpu_session_r3aa.py [E1 E2]
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
    todo = sys.argv[1:] or ["E1", "E2"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "E1" in todo:
        measure_wave("AA.E1 kernel-key", teapot, spp=8,
                     samples_per_wave=8, key_mode="kernel", reps=3)
    if "E2" in todo:
        measure_wave("AA.E2 xla-key", teapot, spp=8,
                     samples_per_wave=8, key_mode="xla", reps=3)


if __name__ == "__main__":
    main()
