"""Round-4 TPU session C: cluster-ordering A/B (RENE_CLUSTER_ORDER).

Median-split clustering (pallas_path._median_split_order) replaces the
Morton-range chunking with a balanced kd-tree whose leaves ARE the
sub-block/cluster/super chunks. CPU accounting on the real meshes
(VALIDATION.md round 4) predicts -14..-26% any-lane entered sub-blocks
per sorted wave tile on teapot and -7..-8% on dragon; MT unrolls behind
those gates are 75-80% of march cost. Experiments (each A/B in ONE
process so chip run-noise cancels):

  C1 teapot wave @720p spw8: morton vs median.
  C2 dragon mega @720p marginal: morton vs median.
  C3 teapot wave FULL STACK (init=kernel, sort=dma) + median — the
     round-4 candidate production config, vs r4b S1 (morton).
  C4 dragon mega @320x180 marginal median (the bench second metric's
     config).
  C5 teapot wave @720p median + SUB_TRIS=32: finer sub-blocks were
     rejected under Morton (-16% @720p, pallas_path.py SUB_TRIS note)
     because loose boxes rarely rejected; median's tighter boxes
     change that tradeoff.

Usage: timeout 5400 python scripts/tpu_session_r4c.py [C1 C2 ...]
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


def order(mode):
    os.environ["RENE_CLUSTER_ORDER"] = mode


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["C1", "C3", "C2", "C4", "C5"]

    teapot = dragon = None
    if any(e in todo for e in ("C1", "C3")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    if any(e in todo for e in ("C2", "C4")):
        dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)

    if "C1" in todo:
        def c1():
            for mode in ("morton", "median"):
                order(mode)
                reps(f"C.C1 teapot wave {mode}",
                     build(teapot, samples_per_wave=8), 8)
        guard("C1", c1)
    if "C3" in todo:
        def c3():
            for mode in ("morton", "median"):
                order(mode)
                reps(f"C.C3 teapot FULL STACK {mode}",
                     build(teapot, samples_per_wave=8, sort_mode="dma",
                           init_mode="kernel"), 8)
        guard("C3", c3)
    if "C2" in todo:
        def c2():
            for mode in ("morton", "median"):
                order(mode)
                measure(f"C.C2 dragon mega @720p {mode}", dragon,
                        spp_a=2, spp_b=6, reps=2)
        guard("C2", c2)
    if "C5" in todo:
        def c5():
            import rene_tpu.integrators.pallas_path as pp
            old = pp.SUB_TRIS
            pp.SUB_TRIS = 32
            try:
                order("median")
                reps("C.C5 teapot wave median SUB_TRIS=32",
                     build(teapot, samples_per_wave=8), 8)
            finally:
                pp.SUB_TRIS = old
        guard("C5", c5)
    if "C4" in todo:
        def c4():
            d320 = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
            for mode in ("morton", "median"):
                order(mode)
                measure(f"C.C4 dragon mega @320x180 {mode}", d320,
                        spp_a=2, spp_b=6, reps=2)
        guard("C4", c4)
    order("morton")


if __name__ == "__main__":
    main()
