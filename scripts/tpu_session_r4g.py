"""Round-4 TPU session G: sample-in-tile packing PROXY measurements.

Premise: dragon mega's marginal cost is ~100% MT unrolls (r4a E7) and
per-PIXEL cost drops ~2.5x from 320x180 to 720p — higher resolution
tightens each 32x32-pixel tile's beam, so the any-lane box cull admits
fewer clusters per tile. Sample-in-tile packing would map a tile's
1024 lanes to a 16x16-pixel block x 4 sample slots (or 8x8 x 16),
giving 720p output with 1440p (2880p) beam tightness at the same total
ray count.

The proxy needs NO code: rendering at 2560x1440 and dividing marginal
s/spp by 4 predicts the packed-720p cost exactly (same ray population,
same beams, finish-stage details aside). If G0/4 (or G1/16) lands at
or under ~0.085, the packing is worth building; if not, the idea is
measured-and-rejected for free.

  G0 dragon mega @2560x1440 SUB_TRIS=16 — pack=4 proxy (predict /4).
  G1 dragon mega @5120x2880 SUB_TRIS=16 — pack=16 proxy (predict /16).
  G2 dragon mega @2560x1440 SUB_TRIS=64 (module default) — does the
     finer-split preference hold at tighter beams?

Measured 2026-08-19 (first launch): G0 0.359 s/spp -> packed-720p
0.0897; G1 1.325 -> 0.0828; G2 died on a transient remote-compile
disconnect. Second launch sweeps SUB_TRIS at both proxy resolutions
(G2 retry, G3-G5) to pick the build config:

  G3 dragon mega @2560x1440 SUB_TRIS=32.
  G4 dragon mega @5120x2880 SUB_TRIS=32.
  G5 dragon mega @5120x2880 SUB_TRIS=64.

Second-launch results: G2 0.0949, G3 0.0934 (ST=16's 0.0897 stands at
pack=4); G4 0.0862 (ST=16's 0.0828 stands at pack=16). Third launch:

  G6 dragon mega @10240x5760 SUB_TRIS=16 — pack=64 proxy (59M lanes,
     ~2.8 GB of lane arrays; probes the diminishing-returns tail).
  G7 dragon mega @5120x2880 SUB_TRIS=16 RENE_SUB_GATE=1 — packed tiles
     are as tight as the wave's sorted tiles, where the per-sub-block
     gate WON -5% (r4f T1); @720p-wide beams it lost +17% (r4f F1a).

Usage: timeout 14400 python scripts/tpu_session_r4g.py [G0..G7]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["G0", "G1", "G2"]

    def mega(tag, w, h, st, spp_b=6):
        scene = load_at(f"{SAMPLES}/dragon/scene.pbrt", w, h)
        old = pp.SUB_TRIS
        pp.SUB_TRIS = st
        try:
            _, best = measure(f"G.{tag} dragon mega @{w}x{h} "
                              f"SUB_TRIS={st}", scene,
                              spp_a=2, spp_b=spp_b, reps=2)
            pack = (w * h) // (1280 * 720)
            print(f"G.{tag}: packed-720p prediction {best / pack:.4f} "
                  f"s/spp (pack={pack})", flush=True)
        finally:
            pp.SUB_TRIS = old

    if "G0" in todo:
        guard("G0", lambda: mega("G0", 2560, 1440, 16))
    if "G1" in todo:
        guard("G1", lambda: mega("G1", 5120, 2880, 16, spp_b=4))
    if "G2" in todo:
        guard("G2", lambda: mega("G2", 2560, 1440, 64))
    if "G3" in todo:
        guard("G3", lambda: mega("G3", 2560, 1440, 32))
    if "G4" in todo:
        guard("G4", lambda: mega("G4", 5120, 2880, 32, spp_b=4))
    if "G5" in todo:
        guard("G5", lambda: mega("G5", 5120, 2880, 64, spp_b=4))
    if "G6" in todo:
        guard("G6", lambda: mega("G6", 10240, 5760, 16, spp_b=3))

    def gated(tag, w, h, st, spp_b=4):
        old = pp.SUB_GATE
        pp.SUB_GATE = True
        try:
            mega(tag, w, h, st, spp_b=spp_b)
        finally:
            pp.SUB_GATE = old

    if "G7" in todo:
        guard("G7", lambda: gated("G7", 5120, 2880, 16))


if __name__ == "__main__":
    main()
