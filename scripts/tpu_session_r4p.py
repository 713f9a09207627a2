"""Round-4 TPU session P: small-film spw — does the cap-24 bind?

The wave spw auto-budget is min(24, (3<<23)//npix): at 720p the lane
budget binds (auto 24, ~2.8 GB state) and the curve was measured flat
past 16 (r4i/r4l). At 320x180 the budget would allow 436 but the CAP
binds at 24 — yet small films are exactly where the per-wave fixed
cost (schedule-driven launch count x per-launch tail + init/finish +
host sync) is the largest share: fog volpath @320x180 is 1.34 s/wave
for only 1.38M lanes (r4n N1). More lanes per wave = fewer waves for
the same spp = less total fixed cost, as long as the march stays
lane-parallel. Sweep the cap upward on the two small-film wave
metrics:

  PB teapot path wave @320x180 DEFAULT (spw=24) — in-session anchor
     (bench: 0.0421).
  P1 teapot @320x180 spw=48
  P2 teapot @320x180 spw=96
  P3 fog-teapot volpath @320x180 spw=48   (r4n N1 spw=24: 0.056)
  P4 fog-teapot volpath @320x180 spw=96

If the curve keeps dropping, flip the auto cap for small films
(min(96, budget//npix) or similar) and refresh the bench cache.

Usage: timeout 14400 python scripts/tpu_session_r4p.py [PB P1 ...]
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
    todo = sys.argv[1:] or ["PB", "P1", "P2", "P3", "P4"]

    teapot = None
    if any(e in todo for e in ("PB", "P1", "P2")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
    fog = None
    if any(e in todo for e in ("P3", "P4")):
        fog = fog_teapot(320, 180)

    def probe(tag, scene, spw):
        run = build(scene, samples_per_wave=spw) if spw else build(scene)
        spw_eff = run.samples_per_wave
        print(f"{tag} spw = {spw_eff}", flush=True)
        reps(tag, run, spw_eff)

    if "PB" in todo:
        guard("PB", lambda: probe(
            "P.PB teapot @320x180 DEFAULT (anchor)", teapot, 0))
    if "P1" in todo:
        guard("P1", lambda: probe(
            "P.P1 teapot @320x180 spw=48", teapot, 48))
    if "P2" in todo:
        guard("P2", lambda: probe(
            "P.P2 teapot @320x180 spw=96", teapot, 96))
    if "P3" in todo:
        guard("P3", lambda: probe(
            "P.P3 fog volpath @320x180 spw=48", fog, 48))
    if "P4" in todo:
        guard("P4", lambda: probe(
            "P.P4 fog volpath @320x180 spw=96", fog, 96))


if __name__ == "__main__":
    main()
