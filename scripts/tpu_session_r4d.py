"""Round-4 TPU session D: compose the measured winners.

r4a/r4b/r4c established: median clustering -16% teapot wave / -6%
dragon mega (now the default), xla keys beat kernel keys under morton
(0.713 vs 0.745), slice-granularity redistribution is rejected
(gran128 1.92 s/spp), dragon mega @720p is ~100% MT-dominated
(skip_mt=True -> 0.000 marginal). Untested combinations this session:

  D0 teapot wave @720p median x {kernel, xla} keys — the winners were
     measured on different axes; does xla-keys' -4% stack on median?
  D2 teapot wave median profile (best key mode from D0) — re-localize
     the remaining cost (morton profile: step1 1942 ms, step2 1378).
  D3 dragon mega @720p median + SUB_TRIS {16, 64} — marginal cost is
     ~100% MT unrolls; fewer tris per entered sub-block cuts it IF
     median's tighter boxes keep the entered count from doubling
     (SUB_TRIS=16 was rejected under Morton's loose boxes).
  D5 teapot wave median schedule (1,1,1,2,4) — re-bin bounce 2 on its
     own; rejected under morton, march costs shifted. Same distinct-k
     set {1,2,4}: kernels are shared with D0, only the driver changes.
  D1 teapot FULL STACK (sort_mode=dma fixed: DMA_G=128 satisfies the
     Mosaic 128-divisibility rule that killed r4b D1) — expected to
     land near gran128's 1.92 (same slice-granularity semantics);
     one honest number closes the design as measured-and-rejected.
  D7 teapot wave median spw4 — halve the population, double the waves
     (spw12/16 lost under morton; the cheap direction was never tried).

Usage: timeout 5400 python scripts/tpu_session_r4d.py [D0 D2 ...]
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


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["D0", "D2", "D3", "D5", "D1", "D7"]

    teapot = None
    if any(e in todo for e in ("D0", "D2", "D5", "D1", "D7")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    best_key = {"mode": "kernel"}
    if "D0" in todo:
        def d0():
            r = {}
            for mode in ("kernel", "xla"):
                _, r[mode] = reps(f"D.D0 teapot median key={mode}",
                                  build(teapot, samples_per_wave=8,
                                        key_mode=mode), 8)
            if r["xla"] < r["kernel"]:
                best_key["mode"] = "xla"
            print(f"D.D0 best key mode: {best_key['mode']}", flush=True)
        guard("D0", d0)
    if "D2" in todo:
        def d2():
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                reps("D.D2 teapot median profile",
                     build(teapot, samples_per_wave=8,
                           key_mode=best_key["mode"]), 8, n=1)
            finally:
                del os.environ["RENE_WAVE_PROFILE"]
        guard("D2", d2)
    if "D3" in todo:
        def d3():
            import rene_tpu.integrators.pallas_path as pp
            dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
            old = pp.SUB_TRIS
            try:
                for st in (16, 32, 64):
                    pp.SUB_TRIS = st
                    measure(f"D.D3 dragon mega @720p SUB_TRIS={st}",
                            dragon, spp_a=2, spp_b=6, reps=2)
            finally:
                pp.SUB_TRIS = old
        guard("D3", d3)
    if "D5" in todo:
        def d5():
            reps("D.D5 teapot median sched (1,1,1,2,4)",
                 build(teapot, samples_per_wave=8,
                       key_mode=best_key["mode"],
                       k_schedule=(1, 1, 1, 2, 4)), 8)
        guard("D5", d5)
    if "D1" in todo:
        def d1():
            reps("D.D1 teapot FULL STACK dma (fixed)",
                 build(teapot, samples_per_wave=8, sort_mode="dma",
                       init_mode="kernel"), 8)
        guard("D1", d1)
    if "D7" in todo:
        def d7():
            reps("D.D7 teapot median spw4",
                 build(teapot, samples_per_wave=4,
                       key_mode=best_key["mode"]), 4)
        guard("D7", d7)


if __name__ == "__main__":
    main()
