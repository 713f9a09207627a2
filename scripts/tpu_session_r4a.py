"""Round-4 TPU session A: run the round-3 blind rework's queued
measurements (VERDICT round-3 task 1) in one process, each guarded so a
failure doesn't kill the rest.

  E0 teapot key-tag histogram @320x180 — proves the in-kernel
     cluster-id sort-key path is live on chip.
  E1 teapot @720p spw8 key_mode=kernel (3 reps, best s/spp).
  E3 teapot 64-spp render through run_dev device accumulation.
  E2 teapot @720p spw8 key_mode=xla (legacy host Morton keys).
  E6 teapot per-step profile (kernel keys).
  E5 dragon @720p wave kernel-key (mega holds 0.125 s/spp).
  E7 dragon @720p mega box-vs-MT split (_PROFILE_SKIP_MT).
  E4 teapot @720p dir_sub=True.

Round-3 baselines: teapot wave 0.746 s/spp @720p (xla keys, 26-row
sorts, per-step sync); dragon mega 0.125 s/spp @720p.
Targets (VERDICT): teapot <=0.5, dragon <=0.08.

Usage: timeout 7200 python scripts/tpu_session_r4a.py [E0 E1 ...]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3aa import accum_render, build, reps  # noqa: E402
from tpu_session_r3ab import key_diag  # noqa: E402


def guard(tag, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[{tag}] done in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        print(f"[{tag}] FAILED after {time.time() - t0:.0f}s:",
              flush=True)
        traceback.print_exc()


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E0", "E1", "E3", "E2", "E6", "E5", "E7",
                            "E4"]

    if "E0" in todo:
        guard("E0", lambda: key_diag(
            "A.E0 teapot key tags",
            load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)))

    teapot = None
    if any(e in todo for e in ("E1", "E2", "E3", "E4", "E6")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    runk = [None]
    if "E1" in todo or "E3" in todo:
        def e1():
            runk[0] = build(teapot, samples_per_wave=8,
                            key_mode="kernel")
            if "E1" in todo:
                reps("A.E1 teapot kernel-key", runk[0], 8)
        guard("E1", e1)
    if "E3" in todo and runk[0] is not None:
        guard("E3", lambda: accum_render(
            "A.E3 teapot kernel-key 64spp accum", runk[0], 64))
    if "E2" in todo:
        guard("E2", lambda: reps(
            "A.E2 teapot xla-key",
            build(teapot, samples_per_wave=8, key_mode="xla"), 8))
    if "E6" in todo:
        def e6():
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                run = runk[0] or build(teapot, samples_per_wave=8)
                reps("A.E6 teapot profile", run, 8, n=1)
            finally:
                os.environ.pop("RENE_WAVE_PROFILE", None)
        guard("E6", e6)
    if "E5" in todo:
        guard("E5", lambda: reps(
            "A.E5 dragon wave kernel-key",
            build(load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720),
                  samples_per_wave=8), 8))
    if "E7" in todo:
        def e7():
            import numpy as np

            from rene_tpu.integrators import pallas_path as pp
            from rene_tpu.scene.device import build_device_scene
            dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
            bn, cfg = build_device_scene(dragon)
            for skip in (False, True):
                pp._PROFILE_SKIP_MT = skip
                try:
                    run = pp.make_pallas_batch_fn(bn, cfg)
                    k1, k2 = 2, 6
                    np.asarray(run(0, k1)["radiance"])
                    np.asarray(run(0, k2)["radiance"])
                    t0 = time.time()
                    float(run(1, k1)["rays"])
                    t1 = time.time()
                    float(run(2, k2)["rays"])
                    marg = ((time.time() - t1) - (t1 - t0)) / (k2 - k1)
                    print(f"A.E7 dragon mega skip_mt={skip}: marginal "
                          f"{marg:.3f} s/spp", flush=True)
                finally:
                    pp._PROFILE_SKIP_MT = False
        guard("E7", e7)
    if "E4" in todo:
        guard("E4", lambda: reps(
            "A.E4 teapot dir_sub",
            build(teapot, samples_per_wave=8, dir_sub=True), 8))


if __name__ == "__main__":
    main()
