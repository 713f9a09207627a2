"""Round-4 TPU session J: packing finalization (pack=64 + cheap finish).

r4h measured REAL packing: dragon @720p pack=16 = 0.0850 s/spp (proxy
predicted 0.0828; the gap is the old npix*pack finish gather), @320x180
pack=16 = 0.0063 (unpacked best 0.017). The G6 retry proxied pack=64 at
**0.0703** — under the 0.08 VERDICT target. Since then finish() was
reworked to a slot-axis reshape-sum + single npix gather. This session
decides the production default:

  J0 dragon mega @1280x720 pack=64 SUB_TRIS=16 — the headline number.
  J1 dragon mega @1280x720 pack=16 SUB_TRIS=16 — cheap-finish delta vs
     r4h H0's 0.0850.
  J2 dragon mega @320x180 pack=64 SUB_TRIS=16 — bench second metric
     (pack=16 was 0.0063).
  J3 dragon mega @320x180 pack=64 SUB_TRIS=64 — does the module
     default SUB_TRIS still lose at extreme tightness? (@720p ST=16
     beat 32/64 at every proxy point; cheap sanity check.)
  J4 fog-teapot volpath mega @320x180 pack=16 — does packing transfer
     to the volpath cluster march? (unpacked mega 0.207, wave 0.122.)

Usage: timeout 14400 python scripts/tpu_session_r4j.py [J0..J4]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4h import measure_packed  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["J0", "J1", "J2", "J3", "J4"]

    def packed(tag, path, w, h, pack, st=16, **kw):
        scene = load_at(f"{SAMPLES}/{path}", w, h)
        old = pp.SUB_TRIS
        pp.SUB_TRIS = st
        try:
            measure_packed(f"J.{tag} {path.split('/')[0]} @{w}x{h} "
                           f"pack={pack} SUB_TRIS={st}", scene, pack,
                           **kw)
        finally:
            pp.SUB_TRIS = old

    if "J0" in todo:
        guard("J0", lambda: packed("J0", "dragon/scene.pbrt",
                                   1280, 720, 64))
    if "J1" in todo:
        guard("J1", lambda: packed("J1", "dragon/scene.pbrt",
                                   1280, 720, 16))
    if "J2" in todo:
        guard("J2", lambda: packed("J2", "dragon/scene.pbrt",
                                   320, 180, 64, spp_a=2, spp_b=6))
    if "J3" in todo:
        guard("J3", lambda: packed("J3", "dragon/scene.pbrt",
                                   320, 180, 64, st=64,
                                   spp_a=2, spp_b=6))
    if "J5" in todo:
        def j5():
            from tpu_session_r4b import fog_teapot
            scene = fog_teapot(1280, 720)
            old = pp.SUB_TRIS
            pp.SUB_TRIS = 16
            try:
                measure_packed("J.J5 fog-teapot volpath @720p "
                               "pack=16 SUB_TRIS=16", scene, 16,
                               spp_a=1, spp_b=2)
            finally:
                pp.SUB_TRIS = old
        guard("J5", j5)
    if "J4" in todo:
        # fog-teapot: the volpath cluster scene used by the round-2/3
        # volpath wave-vs-mega A/Bs (teapot mesh + homogeneous fog)
        def j4():
            from tpu_session_r4b import fog_teapot
            scene = fog_teapot(320, 180)
            old = pp.SUB_TRIS
            pp.SUB_TRIS = 16
            try:
                measure_packed("J.J4 fog-teapot volpath @320x180 "
                               "pack=16 SUB_TRIS=16", scene, 16,
                               spp_a=1, spp_b=3)
            finally:
                pp.SUB_TRIS = old
        guard("J4", j4)


if __name__ == "__main__":
    main()
# J5 appended post-J4: fog-teapot volpath @720p pack=16 — decides the
# volpath engine auto-policy (wave @720p = 0.727; J4 @320x180: packed
# mega 0.105 beat wave 0.122).
