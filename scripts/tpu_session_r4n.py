"""Round-4 TPU session N: volpath wave under the new spw auto-budget.

r4i raised the wave samples-per-wave auto-budget to 3<<23 lanes
(cap 24): teapot path @720p went 0.554 (spw 8) -> 0.453 (spw 24) by
amortizing the ~1.5 s/wave fixed init/finish/host cost. Every recorded
fog-teapot VOLPATH number predates that flip (r4e E5 @720p 0.727,
r4b V1 @320x180 0.122 — both spw=8). The auto-budget now gives both
resolutions spw=24; this session measures whether the amortization
transfers to the in-medium march (deeper effective populations, more
medium-event lanes per wave).

  NB fog-teapot volpath wave @720p spw=8 — in-session anchor
     (r4e E5: 0.727; chip noise is ~±10% across sessions).
  N0 fog-teapot volpath wave @720p DEFAULT (auto spw) — the refresh.
  N1 fog-teapot volpath wave @320x180 DEFAULT — refresh of r4b V1.

Usage: timeout 14400 python scripts/tpu_session_r4n.py [NB N0 N1]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4b import fog_teapot  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["NB", "N0", "N1"]

    fog720 = None
    if any(e in todo for e in ("NB", "N0")):
        fog720 = fog_teapot(1280, 720)

    if "NB" in todo:
        def nb():
            reps("N.NB fog-teapot volpath @720p spw=8 (anchor)",
                 build(fog720, samples_per_wave=8), 8)
        guard("NB", nb)
    if "N0" in todo:
        def n0():
            run = build(fog720)
            print(f"N.N0 auto spw = {run.samples_per_wave}", flush=True)
            reps("N.N0 fog-teapot volpath @720p DEFAULT (auto spw)",
                 run, run.samples_per_wave)
        guard("N0", n0)
    if "N1" in todo:
        def n1():
            fog = fog_teapot(320, 180)
            run = build(fog)
            print(f"N.N1 auto spw = {run.samples_per_wave}", flush=True)
            reps("N.N1 fog-teapot volpath @320x180 DEFAULT (auto spw)",
                 run, run.samples_per_wave)
        guard("N1", n1)


if __name__ == "__main__":
    main()
