"""Round-4 TPU session H: REAL sample-in-tile packing measurements.

The r4g proxy sweep (rendering at sqrt(pack)x resolution and dividing)
predicted dragon packed-720p at 0.0897 (pack=4) / 0.0828 (pack=16)
s/spp with SUB_TRIS=16; SUB_TRIS 32/64 and SUB_GATE all lost at packed
tightness. This session measures the real implementation (pack= in
make_pallas_batch_fn: a tile = (32/sqrt(pack))^2-pixel block x pack
sample slots, slot-decorrelated RNG/sobol streams, slot-summed finish
gather) — the delta vs the proxy is the finish()/layout overhead.

  H0 dragon mega @1280x720 pack=16 SUB_TRIS=16 — the headline attempt
     (current unpacked best 0.108; VERDICT target <=0.08).
  H1 dragon mega @1280x720 pack=4 SUB_TRIS=16.
  H2 dragon mega @320x180 pack=16 SUB_TRIS=16 (unpacked best 0.017).
  H3 pack=64 proxy retry: dragon @10240x5760 SUB_TRIS=16 (the first
     try hit the remote-compile body limit because px/py were jit
     closure constants; they are runtime args now).
  H4 teapot mega @1280x720 pack=16 SUB_TRIS=16 (mega best 2.18 — the
     wave engine owns teapot at 0.554, but packed mega may re-open the
     engine choice).

Marginal s/spp is printed in DELIVERED samples (per-lane marginal /
pack).

Usage: timeout 14400 python scripts/tpu_session_r4h.py [H0..H4]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402


def _force(out):
    return float(np.asarray(out["rays"]).sum())


def measure_packed(tag, scene, pack, spp_a=1, spp_b=3, seed=3, reps=3):
    """Marginal s/spp (per DELIVERED sample) at a given pack."""
    from rene_tpu.integrators import pallas_path as pp
    from rene_tpu.scene.device import build_device_scene

    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg, pack=pack)
    assert run is not None, f"{tag}: not pallas eligible"
    t0 = time.time()
    _force(run(seed, spp_a))
    print(f"{tag}: compile+1st({spp_a}x{pack}spp) {time.time()-t0:.1f}s "
          f"chunk_hint={run.chunk_hint} tiles={run.n_tiles}", flush=True)
    best = 1e30
    for r in range(reps):
        t0 = time.time()
        _force(run(seed + r, spp_a))
        ta = time.time() - t0
        t0 = time.time()
        _force(run(seed + r, spp_b))
        tb = time.time() - t0
        marg = (tb - ta) / ((spp_b - spp_a) * pack)
        best = min(best, marg)
        print(f"  rep{r}: {spp_a}pls {ta:.2f}s  {spp_b}pls {tb:.2f}s  "
              f"marginal {marg*1000:.1f} ms/spp (delivered)", flush=True)
    print(f"{tag}: best marginal {best:.4f} s/spp (delivered, pack="
          f"{pack})", flush=True)
    return best


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["H0", "H1", "H2", "H3", "H4"]

    def packed(tag, path, w, h, pack, st=16, **kw):
        scene = load_at(f"{SAMPLES}/{path}", w, h)
        old = pp.SUB_TRIS
        pp.SUB_TRIS = st
        try:
            measure_packed(f"H.{tag} {path.split('/')[0]} @{w}x{h} "
                           f"pack={pack} SUB_TRIS={st}", scene, pack,
                           **kw)
        finally:
            pp.SUB_TRIS = old

    if "H0" in todo:
        guard("H0", lambda: packed("H0", "dragon/scene.pbrt",
                                   1280, 720, 16))
    if "H1" in todo:
        guard("H1", lambda: packed("H1", "dragon/scene.pbrt",
                                   1280, 720, 4))
    if "H2" in todo:
        guard("H2", lambda: packed("H2", "dragon/scene.pbrt",
                                   320, 180, 16, spp_a=2, spp_b=10))
    if "H3" in todo:
        from tpu_session_r4g import main as _g  # reuse G6 body
        sys.argv = ["r4g", "G6"]
        guard("H3", _g)
    if "H4" in todo:
        # teapot's ~1000 clusters make packed-720p calls expensive if
        # packing does not help; keep single calls under the watchdog
        guard("H4", lambda: packed("H4", "teapot/scene.pbrt",
                                   1280, 720, 16, spp_b=2))


if __name__ == "__main__":
    main()
