"""Round-4 TPU session O: localize teapot wave's residual march cost.

Teapot wave @720p stands at 0.453 s/spp (spw=24, r4l) with every knob
measured-optimal from both directions (r4m). The remaining attack
surface needs localization the way r4a E7 localized dragon mega
(skip_mt A/B: dragon = ~100% MT unrolls, 0% box sweeps). This session
runs the same A/B on the WAVE march plus a step profile at the
production spw:

  OB teapot wave @720p DEFAULT (auto spw=24) — in-session anchor
     (r4l L1: 0.453).
  O1 same with pallas_path._PROFILE_SKIP_MT=True — box-sweep-only
     cost; OB minus O1 = the MT-unroll share. Decides whether a
     box-table compression (box-dominated) or nothing (MT-dominated,
     SUB_GATE already skips dead sub-unrolls) is the next move.
  O2 RENE_WAVE_PROFILE=1 at spw=24 — per-step breakdown at the
     production population (the only recorded profile, r4i I3, is
     spw=12).

Usage: timeout 14400 python scripts/tpu_session_r4o.py [OB O1 O2]
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


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["OB", "O1", "O2"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "OB" in todo:
        def ob():
            run = build(teapot)
            print(f"O.OB auto spw = {run.samples_per_wave}", flush=True)
            reps("O.OB teapot wave @720p DEFAULT (anchor)",
                 run, run.samples_per_wave)
        guard("OB", ob)
    if "O1" in todo:
        def o1():
            import rene_tpu.integrators.pallas_path as pp
            pp._PROFILE_SKIP_MT = True
            try:
                run = build(teapot)
                reps("O.O1 teapot wave @720p SKIP_MT (box-sweep floor)",
                     run, run.samples_per_wave)
            finally:
                pp._PROFILE_SKIP_MT = False
        guard("O1", o1)
    if "O2" in todo:
        def o2():
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                run = build(teapot)
                reps("O.O2 teapot wave @720p spw=24 PROFILE",
                     run, run.samples_per_wave, n=1)
            finally:
                os.environ.pop("RENE_WAVE_PROFILE", None)
        guard("O2", o2)


if __name__ == "__main__":
    main()
