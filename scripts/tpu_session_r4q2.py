"""Round-4 TPU session Q2: confirm the auto_pack watchdog fix on-chip.

r4q Q3 crashed the TPU worker: auto pack=64 @720p on a 262k-tri HBM
scene makes one packed call (= 64 spp in one launch) exceed the ~1 min
watchdog. auto_pack now models per-call cost (npix*pack * ntri * md,
x4 HBM, x4 volpath; cap 1.7e14) — this session proves the fixed AUTO
path end-to-end on the crash class and fills the REAL 1.05M records
(r4k's "523k/1.05M" labels were 2x off: bigmesh_scene(1<<19) is 262k
actual tris, (1<<20) is 523k; 1<<21 is the 1.047M mesh).

  A1 262k tris @720p AUTO (expect pack=16; the r4q Q3 crash class) —
     must complete without a worker crash.
  A2 1.047M tris @320x180 AUTO (expect pack=64) — the real 1.05M
     packed record (r3 unpacked anchor: 0.563).
  A3 1.047M tris @720p AUTO (expect pack=4).

Usage: timeout 10800 python scripts/tpu_session_r4q2.py [A1 A2 A3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import bigmesh_scene  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4h import _force  # noqa: E402


def measure_auto(tag, scene, spp_a=1, spp_b=2, seed=3, reps=2):
    """Marginal s/spp (per DELIVERED sample) under the AUTO pack."""
    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from rene_tpu.scene.device import build_device_scene

    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg)  # pack=0 -> auto_pack
    pack = run.spp_mult
    t0 = time.time()
    _force(run(seed, spp_a))
    print(f"{tag}: AUTO pack={pack} compile+1st({spp_a}x{pack}spp) "
          f"{time.time()-t0:.1f}s tiles={run.n_tiles}", flush=True)
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
    print(f"{tag}: best marginal {best:.4f} s/spp (delivered, auto "
          f"pack={pack})", flush=True)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["A1", "A2", "A3"]

    if "A1" in todo:
        guard("A1", lambda: measure_auto(
            "Q2.A1 262k tris @720p AUTO (crash class)",
            bigmesh_scene(1 << 19, res=(1280, 720))))
    if "A2" in todo:
        guard("A2", lambda: measure_auto(
            "Q2.A2 1.047M tris @320x180 AUTO",
            bigmesh_scene(1 << 21, res=(320, 180))))
    if "A3" in todo:
        guard("A3", lambda: measure_auto(
            "Q2.A3 1.047M tris @720p AUTO",
            bigmesh_scene(1 << 21, res=(1280, 720))))


if __name__ == "__main__":
    main()
