"""Round-4 TPU session L: tail-end probes past the met targets.

  L0 dragon @320x180 pack=256 SUB_TRIS=16 — the 16->64 trend gave
     0.0063 -> 0.0052; bs=2 blocks x 256 slots probe the floor of the
     bench second metric (@720p pack=256 is out of lane budget).
  L1 teapot wave @720p spw=24 — the 16->18 curve flattened
     (0.463 -> 0.460); 24 = 22M lanes (~2.8 GB state) probes whether
     the fixed-cost amortization has anything left.
  L2 dragon @1280x720 pack=64 SUB_TRIS=8 — ST=16 won every packed
     sweep vs 32/64; probe the other direction at maximum tightness.

Usage: timeout 10800 python scripts/tpu_session_r4l.py [L0 L1 L2]
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
from tpu_session_r4h import measure_packed  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["L0", "L1", "L2"]

    def packed(tag, w, h, pack, st=16, **kw):
        scene = load_at(f"{SAMPLES}/dragon/scene.pbrt", w, h)
        old = pp.SUB_TRIS
        pp.SUB_TRIS = st
        try:
            measure_packed(f"L.{tag} dragon @{w}x{h} pack={pack} "
                           f"SUB_TRIS={st}", scene, pack, **kw)
        finally:
            pp.SUB_TRIS = old

    if "L0" in todo:
        guard("L0", lambda: packed("L0", 320, 180, 256,
                                   spp_a=1, spp_b=2))
    if "L1" in todo:
        def l1():
            teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
            reps("L.L1 teapot wave @720p spw=24",
                 build(teapot, samples_per_wave=24), 24)
        guard("L1", l1)
    if "L2" in todo:
        guard("L2", lambda: packed("L2", 1280, 720, 64, st=8))


if __name__ == "__main__":
    main()
