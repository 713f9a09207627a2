"""Round-4 TPU session R: validate the new auto-spw at 720p + bench refresh.

The cap-96 flip (auto_spw) moves @720p from the old cap 24 to the
budget-bound 27 ((3<<23)//921600). The r4i/r4l curve was flattening
upward (18 -> 0.460, 24 -> 0.453), so 27 should be neutral-or-better,
but it is a NEW production shape — measure before the bench cache
refresh trusts it.

  RB teapot path wave @720p auto (spw=27)        [recorded @24: 0.452]
  RV fog-teapot volpath wave @720p auto (spw=27) [recorded @24: 0.566]

If either regresses >2%, shrink the budget so 720p lands back on 24
(budget 22<<20 -> 25, or 3<<23 with a large-film cap 24); decide on
the numbers.

Usage: timeout 14400 python scripts/tpu_session_r4r.py [RB RV]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4b import fog_teapot  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["RB", "RV"]

    def probe(tag, scene):
        run = build(scene)
        print(f"{tag} auto spw = {run.samples_per_wave}", flush=True)
        reps(tag, run, run.samples_per_wave)

    if "RB" in todo:
        guard("RB", lambda: probe(
            "R.RB teapot @720p auto (cap-96 flip)",
            load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)))
    if "RV" in todo:
        guard("RV", lambda: probe(
            "R.RV fog volpath @720p auto (cap-96 flip)",
            fog_teapot(1280, 720)))


if __name__ == "__main__":
    main()
