"""Round-4 TPU session V: parallelogram fusion A/B on-chip.

_fuse_parallelograms (pallas_path.py) folds flat non-emissive
coplanar tri pairs into quad records — one plane test + two dual-basis
dots instead of two full Plücker triangle tests + barycentric/normal
interp + per-tri attribute selects. r4u measured cornell's brute
unroll at 67% of the kernel; fusion takes cornell 34 -> 17 prims
(+2 emissive tris) and veach 52 -> 26 prims, so the predicted win is
~1.4-1.6x on the headline cornell rate.

  V0 cornell @1024 fuse ON (default)   sustained Mrays/s
  V1 cornell @1024 fuse OFF            the r4u baseline re-run (A/B)
  V2 veach  @720p  fuse ON             sustained Mrays/s
  V3 veach  @720p  fuse OFF

CPU-validated before queueing: fuse on/off interpret renders are
ulp-equal (test_quad_fusion_render_parity); Mosaic lowering
export-checks pass with quads in the kernel.

Usage: timeout 7200 python scripts/tpu_session_r4v.py [V0 V1 V2 V3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4u import cornell_abs  # noqa: E402

SAMPLES = "/root/reference/sample_scenes"


def veach_abs(tag, timed=16, reps=3):
    """Absolute seconds for `timed` samples on veach @1280x720."""
    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from rene_tpu.scene.device import build_device_scene
    scene = load_at(f"{SAMPLES}/veach-mis/scene.pbrt", 1280, 720)
    scene.sampler = "independent"
    bn, cfg = build_device_scene(scene)
    run = make_pallas_batch_fn(bn, cfg)
    t0 = time.time()
    out = run(0, timed)
    rays = float(out["rays"])
    print(f"{tag}: compile+1st {time.time()-t0:.1f}s "
          f"({rays/1e9:.2f} Grays)", flush=True)
    best = 1e30
    for r in range(reps):
        t0 = time.time()
        rays = float(run(r + 1, timed)["rays"])
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  rep{r}: {dt:.3f}s  {rays/dt/1e6:.0f} Mrays/s",
              flush=True)
    print(f"{tag}: best {best:.3f}s / {timed} samples", flush=True)


def with_fuse(fuse, fn):
    os.environ["RENE_QUAD_FUSE"] = fuse
    try:
        fn()
    finally:
        os.environ.pop("RENE_QUAD_FUSE", None)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["V0", "V1", "V2", "V3"]
    if "V0" in todo:
        guard("V0", lambda: with_fuse(
            "1", lambda: cornell_abs("V.V0 cornell FUSED", "")))
    if "V1" in todo:
        guard("V1", lambda: with_fuse(
            "0", lambda: cornell_abs("V.V1 cornell per-tri", "")))
    if "V2" in todo:
        guard("V2", lambda: with_fuse(
            "1", lambda: veach_abs("V.V2 veach FUSED")))
    if "V3" in todo:
        guard("V3", lambda: with_fuse(
            "0", lambda: veach_abs("V.V3 veach per-tri")))


if __name__ == "__main__":
    main()
