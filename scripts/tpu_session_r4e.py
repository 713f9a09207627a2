"""Round-4 TPU session E: push the two open perf targets.

r4d landed teapot wave @720p 0.585 s/spp (median + xla keys +
(1,1,1,2,4), now the defaults) vs the 0.5 target, and dragon mega
@720p 0.108 at SUB_TRIS=16 vs the 0.08 target with the sweep monotone
toward finer splits (16 < 32 < 64) because the marginal cost is ~100%
MT unrolls (r4a E7 skip_mt A/B). This session:

  E0 dragon mega @720p SUB_TRIS {16, 8, 4} — continue the monotone
     sweep; 16 re-measured in-session as the ranking anchor (chip
     noise is ~±10% across sessions).
  EB teapot wave @720p DEFAULT stack — in-session anchor (r4d: 0.585).
  E1 teapot wave @720p sub_tris {16, 8} — the D3 dragon result says
     finer splits win under median's tight boxes; teapot wave still
     runs sub_tris=32 (C5 only tested 32 vs 64).
  E2 teapot wave sched (1,1,1,1,2,4) — D5's bounce-2 re-bin won -4.6%;
     does re-binning bounce 3 stack? Same distinct-k set {1,2,4}:
     kernels shared with EB, only the driver schedule changes.
  E5 fog-teapot volpath wave @720p — refresh r4b V2's 0.891 with the
     full set of round-4 winners (V2 predates median + xla keys +
     new sched).
  E4 teapot wave SUPER=16 — rejected under morton's loose boxes;
     median's tight clusters halve the box-table rows per trace if
     the wider supers stay tight.

Usage: timeout 14400 python scripts/tpu_session_r4e.py [E0 EB ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4b import fog_teapot  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E0", "EB", "E1", "E2", "E5", "E4"]

    teapot = None
    if any(e in todo for e in ("EB", "E1", "E2", "E4")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "E0" in todo:
        def e0():
            import rene_tpu.integrators.pallas_path as pp
            dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
            old = pp.SUB_TRIS
            try:
                for st in (16, 8, 4):
                    pp.SUB_TRIS = st
                    measure(f"E.E0 dragon mega @720p SUB_TRIS={st}",
                            dragon, spp_a=2, spp_b=6, reps=2)
            finally:
                pp.SUB_TRIS = old
        guard("E0", e0)
    if "EB" in todo:
        def eb():
            reps("E.EB teapot DEFAULT stack (anchor)",
                 build(teapot, samples_per_wave=8), 8)
        guard("EB", eb)
    if "E1" in todo:
        def e1():
            for st in (16, 8):
                reps(f"E.E1 teapot sub_tris={st}",
                     build(teapot, samples_per_wave=8, sub_tris=st), 8)
        guard("E1", e1)
    if "E2" in todo:
        def e2():
            reps("E.E2 teapot sched (1,1,1,1,2,4)",
                 build(teapot, samples_per_wave=8,
                       k_schedule=(1, 1, 1, 1, 2, 4)), 8)
        guard("E2", e2)
    if "E5" in todo:
        def e5():
            fog = fog_teapot(1280, 720)
            reps("E.E5 fog-teapot volpath wave @720p (round-4 stack)",
                 build(fog, samples_per_wave=8), 8)
        guard("E5", e5)
    if "E4" in todo:
        def e4():
            import rene_tpu.integrators.pallas_path as pp
            old = pp.SUPER
            pp.SUPER = 16
            try:
                reps("E.E4 teapot SUPER=16",
                     build(teapot, samples_per_wave=8), 8)
            finally:
                pp.SUPER = old
        guard("E4", e4)


if __name__ == "__main__":
    main()
