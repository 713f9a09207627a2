"""Round-3 TPU session AA: in-kernel cluster-id sort keys @720p.

WROW_KEY: the bounce kernel now emits the next-launch sort key itself
(octant x winner-cluster origin bins + Morton fallback; commit
37e3fbc), sorts are slim (21 of 27 rows) and the run loop pipelines
the per-step alive sync. On teapot @1280x720 spw8:
  E1 key_mode="kernel" — surface-adaptive bins + zero XLA key math.
  E2 key_mode="xla"    — legacy host Morton key (same kernels, so the
                         compile cache is shared; isolates key effect).
  E3 64-spp render through run_dev device accumulation (one film
     readback total — the per-wave ~33 MB tunnel readback that run()
     pays is production-irrelevant).
Baseline (octant-ordered marching, xla keys, 26-row state, per-step
sync): 0.746 s/spp.

Usage: timeout 5400 python scripts/tpu_session_r3aa.py [E1 E2 E3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402

from rene_tpu.integrators import pallas_wave as pw  # noqa: E402
from rene_tpu.scene.device import build_device_scene  # noqa: E402


def build(scene, **kw):
    bn, cfg = build_device_scene(scene)
    run = pw.make_pallas_wave_fn(bn, cfg, **kw)
    assert run is not None
    return run


def reps(tag, run, spp, n=3, seed=3):
    t0 = time.time()
    out = run(seed, spp)
    print(f"{tag}: compile+1st wave ({spp}spp, {run.n_tiles} tiles) "
          f"{time.time() - t0:.1f}s", flush=True)
    best = 1e30
    for r in range(n):
        t0 = time.time()
        out = run(seed + 1 + r, spp)
        dt = time.time() - t0
        best = min(best, dt / spp)
        print(f"  rep{r}: {dt:.2f}s -> {dt / spp * 1000:.0f} ms/spp",
              flush=True)
    print(f"{tag}: best {best:.3f} s/spp", flush=True)
    return out, best


def accum_render(tag, run, spp=64, seed=11):
    spw = run.samples_per_wave
    t0 = time.time()
    acc = None
    done = 0
    s = seed
    while done < spp:
        acc = run.run_dev(s, spw, acc)
        done += spw
        s += 1
    out = run.read_back(acc)
    dt = time.time() - t0
    print(f"{tag}: {done}spp in {dt:.1f}s -> {dt / done * 1000:.0f} "
          f"ms/spp ({out['rays'] / dt / 1e6:.0f} Mrays/s)", flush=True)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E1", "E2", "E3"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    runk = None
    if "E1" in todo or "E3" in todo:
        runk = build(teapot, samples_per_wave=8, key_mode="kernel")
    if "E1" in todo:
        reps("AA.E1 kernel-key", runk, 8)
    if "E2" in todo:
        runx = build(teapot, samples_per_wave=8, key_mode="xla")
        reps("AA.E2 xla-key", runx, 8)
    if "E3" in todo and runk is not None:
        accum_render("AA.E3 kernel-key 64spp accum", runk, 64)


if __name__ == "__main__":
    main()
