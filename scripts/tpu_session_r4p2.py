"""Round-4 TPU session P2: extend the small-film spw sweep to the budget.

r4p showed the spw curve still dropping at 96 @320x180 (teapot 0.043
-> 0.035, fog 0.056 -> 0.046 @48). The lane budget (3<<23) allows
spw=436 at 57.6k pixels; probe the tail so the auto-cap flip lands on
the measured knee rather than an arbitrary 96.

  R1 teapot @320x180 spw=192
  R2 teapot @320x180 spw=384
  R3 fog volpath @320x180 spw=192

Usage: timeout 14400 python scripts/tpu_session_r4p2.py [R1 R2 R3]
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
    todo = sys.argv[1:] or ["R1", "R2", "R3"]

    teapot = None
    if any(e in todo for e in ("R1", "R2")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
    fog = fog_teapot(320, 180) if "R3" in todo else None

    def probe(tag, scene, spw):
        run = build(scene, samples_per_wave=spw)
        print(f"{tag} spw = {run.samples_per_wave}", flush=True)
        reps(tag, run, run.samples_per_wave)

    if "R1" in todo:
        guard("R1", lambda: probe(
            "P2.R1 teapot @320x180 spw=192", teapot, 192))
    if "R2" in todo:
        guard("R2", lambda: probe(
            "P2.R2 teapot @320x180 spw=384", teapot, 384))
    if "R3" in todo:
        guard("R3", lambda: probe(
            "P2.R3 fog volpath @320x180 spw=192", fog, 192))


if __name__ == "__main__":
    main()
