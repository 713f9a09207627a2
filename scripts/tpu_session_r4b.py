"""Round-4 TPU session B: coarse bucket redistribution + volpath wave.

  G1 teapot @720p spw8 sort_gran=128 (slice-granularity bucket sort:
     argsort over n/128 slice keys + contiguous-block gather) vs the
     per-lane sort measured in session A (E1).
  G2 dragon @720p spw8 sort_gran=128.
  G3 teapot @720p per-step profile with sort_gran=128.
  V1 fog-wrapped teapot (volpath, maxdepth 65) @320x180: megakernel
     marginal s/spp vs wave s/spp — the round-3 VERDICT item 6 on-chip
     number for the volpath wave engine (rene-shader/src/lib.rs:477-803
     runs volpath through the same hardware traversal at full rate).
  V2 fog-wrapped teapot @1280x720 wave.
  I1 teapot @720p init cost: init_state timing + full-wave s/spp,
     init_mode="xla" (~25 elementwise passes on the ~3 GB/s op floor)
     vs "kernel" (in-kernel genesis pass, pallas_path wave_genesis).
  D1 teapot @720p sort_mode="dma" (Pallas slice-permutation at HBM
     rate — VERDICT round-3 item 2's second structurally distinct
     redistribution design) + per-step profile.
  S1 teapot @720p FULL STACK (init=kernel + sort=dma) + dragon @720p
     full stack — the candidate production config.
  S2 teapot @720p full stack, every-bounce re-bin (k_schedule=(1,)):
     the wide (1,1,2,4) schedule amortized ~0.5 s XLA sorts; DMA
     sorts are ~30 ms, so re-binning every bounce may cut the MT
     march (the dominant cost) via finer-grained coherence.
  S3 teapot @720p full stack + dir_sub (45-deg beam cones).

Usage: timeout 7200 python scripts/tpu_session_r4b.py [G1 G2 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at, measure  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402


def fog_teapot(w, h):
    """The teapot scene converted to a deep volumetric render: global
    fog enclosure (Material "none" sphere with an interior medium,
    radius 40 covers camera at ~26 units) + volpath integrator."""
    src_path = f"{SAMPLES}/teapot/scene.pbrt"
    with open(src_path) as f:
        src = f.read()
    src = src.replace('Integrator "path"', 'Integrator "volpath"')
    src = src.replace('"integer xresolution" [ 1280 ]',
                      f'"integer xresolution" [ {w} ]')
    src = src.replace('"integer yresolution" [ 720 ]',
                      f'"integer yresolution" [ {h} ]')
    fog = ('WorldBegin\n'
           'AttributeBegin\n'
           '  MakeNamedMedium "fog" "rgb sigma_a" [.004 .005 .006]\n'
           '    "rgb sigma_s" [.028 .025 .022] "float g" 0.2\n'
           '  MediumInterface "fog" ""\n'
           '  Material "none"\n'
           '  Shape "sphere" "float radius" 40\n'
           'AttributeEnd\n')
    src = src.replace('WorldBegin', fog, 1)
    from rene_tpu.pbrt import parse_pbrt
    from rene_tpu.scene import create_scene
    return create_scene(parse_pbrt(src), os.path.dirname(src_path))


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["G1", "G3", "D1", "S1", "S2", "S3", "I1",
                            "G2", "V1", "V2"]

    teapot = None
    if any(e in todo for e in ("G1", "G3", "I1", "D1", "S1")):
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    rung = [None]
    if "G1" in todo:
        def g1():
            rung[0] = build(teapot, samples_per_wave=8, sort_gran=128)
            reps("B.G1 teapot gran128", rung[0], 8)
        guard("G1", g1)
    if "G3" in todo:
        def g3():
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                run = rung[0] or build(teapot, samples_per_wave=8,
                                       sort_gran=128)
                reps("B.G3 teapot gran128 profile", run, 8, n=1)
            finally:
                os.environ.pop("RENE_WAVE_PROFILE", None)
        guard("G3", g3)
    if "G2" in todo:
        guard("G2", lambda: reps(
            "B.G2 dragon gran128",
            build(load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720),
                  samples_per_wave=8, sort_gran=128), 8))

    if "V1" in todo:
        def v1():
            scene = fog_teapot(320, 180)
            measure("B.V1 fog-teapot mega @320x180", scene, spp_a=2,
                    spp_b=6, reps=2)
            run = build(scene, samples_per_wave=8)
            reps("B.V1 fog-teapot wave @320x180", run, 8)
        guard("V1", v1)
    if "V2" in todo:
        def v2():
            scene = fog_teapot(1280, 720)
            run = build(scene, samples_per_wave=8)
            reps("B.V2 fog-teapot wave @720p", run, 8)
            run = build(scene, samples_per_wave=8, sort_mode="dma",
                        init_mode="kernel")
            reps("B.V2 fog-teapot wave @720p FULL STACK", run, 8)
        guard("V2", v2)

    if "D1" in todo:
        def d1():
            run = build(teapot, samples_per_wave=8, sort_mode="dma")
            reps("B.D1 teapot dma-sort", run, 8)
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                reps("B.D1 teapot dma-sort profile", run, 8, n=1)
            finally:
                os.environ.pop("RENE_WAVE_PROFILE", None)
        guard("D1", d1)

    if "S1" in todo:
        def s1():
            run = build(teapot, samples_per_wave=8, sort_mode="dma",
                        init_mode="kernel")
            reps("B.S1 teapot FULL STACK (genesis+dma)", run, 8)
            run = build(load_at(f"{SAMPLES}/dragon/scene.pbrt",
                                1280, 720),
                        samples_per_wave=8, sort_mode="dma",
                        init_mode="kernel")
            reps("B.S1 dragon FULL STACK (genesis+dma)", run, 8)
        guard("S1", s1)

    if "S2" in todo:
        def s2():
            run = build(teapot, samples_per_wave=8, sort_mode="dma",
                        init_mode="kernel", k_schedule=(1,))
            reps("B.S2 teapot full stack every-bounce re-bin", run, 8)
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                reps("B.S2 profile", run, 8, n=1)
            finally:
                os.environ.pop("RENE_WAVE_PROFILE", None)
        guard("S2", s2)

    if "S3" in todo:
        guard("S3", lambda: reps(
            "B.S3 teapot full stack dir_sub",
            build(teapot, samples_per_wave=8, sort_mode="dma",
                  init_mode="kernel", dir_sub=True), 8))

    if "I1" in todo:
        def i1():
            import jax.numpy as jnp
            import numpy as np
            for mode in ("xla", "kernel"):
                run = build(teapot, samples_per_wave=8, init_mode=mode)
                # isolate init_state: first call compiles, then 3 reps
                s, p = run.init_state(jnp.int32(1), jnp.int32(8))
                float(jnp.sum(s[12]))  # force
                best = 1e30
                for r in range(3):
                    t0 = time.time()
                    s, p = run.init_state(jnp.int32(2 + r), jnp.int32(8))
                    np.asarray(jnp.sum(s[12]))
                    best = min(best, time.time() - t0)
                print(f"B.I1 init_mode={mode}: init_state best "
                      f"{best * 1000:.0f} ms", flush=True)
                reps(f"B.I1 teapot init={mode}", run, 8)
        guard("I1", i1)


if __name__ == "__main__":
    main()
