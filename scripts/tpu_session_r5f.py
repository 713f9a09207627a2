"""Round-5 TPU session F: constant-direction shadow specialization A/B.

Distant-light occlusion rays share ONE direction across the tile, so
the d-only factors of every primitive test (Plücker d·m terms, MT's
p = d x e2 / det / invd) run on the scalar core instead of the VPU —
~42% fewer vector ops on the any-hit test (_mt_test d3s). Dragon's
distant-NEE trace is 18% of its kernel (r4u2); the 64-light scene is
almost pure distant shadows.

  F0 dragon mega @720p AUTO   const-dir ON (default)   [mt base 0.0813]
  F1 dragon mega @720p AUTO   RENE_CONST_DIR=0
  F2 64-light scene @640x480  ON                        [r5d: 5.5 ms/spp]
  F3 64-light scene @640x480  OFF
  F4 fog_sphere volpath @640x480 ON                     [r5a: 2.7 ms/spp]
  F5 fog_sphere volpath @640x480 OFF

Usage: timeout 14400 python scripts/tpu_session_r5f.py [F0 ... F5]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r5d import lights_scene  # noqa: E402
from tpu_session_r5a import measure  # noqa: E402
from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r4q2 import measure_auto  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def with_cd(val, fn):
    prev = os.environ.get("RENE_CONST_DIR")
    os.environ["RENE_CONST_DIR"] = val
    try:
        fn()
    finally:
        if prev is None:
            os.environ.pop("RENE_CONST_DIR", None)
        else:
            os.environ["RENE_CONST_DIR"] = prev


def dragon(tag):
    scene = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
    measure_auto(tag, scene, spp_a=1, spp_b=2)


def lights(tag):
    measure(tag, lights_scene(), spp_a=2, spp_b=8)


def fog(tag):
    scene = load_at(f"{HERE}/train_scenes/fog_sphere.pbrt", 640, 480)
    scene.sampler = "independent"
    measure(tag, scene, spp_a=4, spp_b=16)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["F0", "F1", "F2", "F3", "F4", "F5"]
    jobs = {"F0": ("1", dragon), "F1": ("0", dragon),
            "F2": ("1", lights), "F3": ("0", lights),
            "F4": ("1", fog), "F5": ("0", fog)}
    for key in todo:
        val, fn = jobs[key]
        tag = f"F.{key} const_dir={val}"
        guard(key, lambda v=val, f=fn, t=tag: with_cd(v, lambda: f(t)))


if __name__ == "__main__":
    main()
