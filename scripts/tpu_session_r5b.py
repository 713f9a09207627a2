"""Round-5 TPU session B: moment-form triangle test A/B (RENE_MESH_TEST).

The round-4 VERDICT's top task: attack the mesh-march triangle test
STRUCTURALLY (r4o: MT unrolls are 66% of the teapot wave kernel; r4u2:
dragon is 99% trace). The moment form rewrites MT's serial p->det->u,
q->v->t chain as four independent dot chains via the ray moment
w = o x d and scalar-core derived per-tri constants (see _mt_test
docstring): ~15% fewer VPU ops and much more ILP if the unroll is
latency-bound (the r4w hypothesis).

  B0 dragon mega @720p AUTO pack      mt      [recorded 0.0791 s/spp]
  B1 dragon mega @720p AUTO pack      moment
  B2 teapot wave @720p auto           mt      [recorded 0.446 s/spp]
  B3 teapot wave @720p auto           moment
  B4 dragon mega @320x180 AUTO        mt      [recorded 0.0052]
  B5 dragon mega @320x180 AUTO        moment
  B6 teapot wave @320x180 auto        mt      [recorded 0.035]
  B7 teapot wave @320x180 auto        moment

Usage: timeout 14400 python scripts/tpu_session_r5b.py [B0 ... B7]
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
from tpu_session_r4q2 import measure_auto  # noqa: E402


def with_test(mode, fn):
    prev = os.environ.get("RENE_MESH_TEST")
    os.environ["RENE_MESH_TEST"] = mode
    try:
        fn()
    finally:
        if prev is None:
            os.environ.pop("RENE_MESH_TEST", None)
        else:
            os.environ["RENE_MESH_TEST"] = prev


def dragon(tag, w, h):
    scene = load_at(f"{SAMPLES}/dragon/scene.pbrt", w, h)
    measure_auto(tag, scene, spp_a=1, spp_b=2)


def teapot_wave(tag, w, h):
    run = build(load_at(f"{SAMPLES}/teapot/scene.pbrt", w, h))
    print(f"{tag} auto spw = {run.samples_per_wave}", flush=True)
    reps(tag, run, run.samples_per_wave)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["B0", "B1", "B2", "B3", "B4", "B5", "B6",
                            "B7"]
    jobs = {
        "B0": ("mt", lambda t: dragon(t, 1280, 720)),
        "B1": ("moment", lambda t: dragon(t, 1280, 720)),
        "B2": ("mt", lambda t: teapot_wave(t, 1280, 720)),
        "B3": ("moment", lambda t: teapot_wave(t, 1280, 720)),
        "B4": ("mt", lambda t: dragon(t, 320, 180)),
        "B5": ("moment", lambda t: dragon(t, 320, 180)),
        "B6": ("mt", lambda t: teapot_wave(t, 320, 180)),
        "B7": ("moment", lambda t: teapot_wave(t, 320, 180)),
    }
    for key in todo:
        mode, fn = jobs[key]
        tag = f"B.{key} {mode}"
        guard(key, lambda m=mode, f=fn, t=tag: with_test(m, lambda: f(t)))


if __name__ == "__main__":
    main()
