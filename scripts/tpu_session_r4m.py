"""Round-4 TPU session M: instanced packed coverage + spw-24 interactions.

  M0 instanced scene (12 spheres, shared BLAS) @640x360 unpacked
     anchor (RENE_MEGA_PACK=1).
  M1 same, auto pack (=64 at 230k px) SUB_TRIS=16 — completes the
     packing validation across all three cluster-march classes (VMEM
     r4h/r4j, HBM r4k, instanced here).
  M2 teapot wave @720p spw=24 schedule (1,1,2,4,8) — the r4e schedule
     sweep ran under spw=8; at spw=24 each sort moves 3x the state, so
     fewer/longer re-bins may win (default (1,1,1,2,4) = 0.453).
  M3 teapot wave @720p spw=24 SUPER=4 — tighter super groups (16 was
     measured-and-rejected under spw=8; 4 probes the other direction).

Usage: timeout 10800 python scripts/tpu_session_r4m.py [M0..M3]
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
from tpu_session_r4h import measure_packed  # noqa: E402


def _instanced(w, h):
    import tests.test_pallas_inst as ti
    scene = ti.instanced_scene(n_inst=12)
    scene.set_film_resolution(w, h)
    return scene


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["M0", "M1", "M2", "M3"]

    if "M0" in todo:
        def m0():
            os.environ["RENE_MEGA_PACK"] = "1"
            try:
                measure("M.M0 instanced @640x360 unpacked",
                        _instanced(640, 360), spp_a=2, spp_b=6, reps=2)
            finally:
                del os.environ["RENE_MEGA_PACK"]
        guard("M0", m0)
    if "M1" in todo:
        def m1():
            old = pp.SUB_TRIS
            pp.SUB_TRIS = 16
            try:
                measure_packed("M.M1 instanced @640x360 pack=64 "
                               "SUB_TRIS=16", _instanced(640, 360), 64,
                               spp_a=1, spp_b=2)
            finally:
                pp.SUB_TRIS = old
        guard("M1", m1)

    teapot = None
    if "M2" in todo or "M3" in todo:
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    if "M2" in todo:
        guard("M2", lambda: reps(
            "M.M2 teapot wave spw=24 sched (1,1,2,4,8)",
            build(teapot, samples_per_wave=24,
                  k_schedule=(1, 1, 2, 4, 8)), 24))
    if "M3" in todo:
        def m3():
            old = pp.SUPER
            pp.SUPER = 4
            try:
                reps("M.M3 teapot wave spw=24 SUPER=4",
                     build(teapot, samples_per_wave=24), 24)
            finally:
                pp.SUPER = old
        guard("M3", m3)


if __name__ == "__main__":
    main()
