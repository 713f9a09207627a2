"""Round-3 TPU session AB: kernel-key follow-ups.

  E4 teapot @720p spw8, dir_sub=True (sub-octant dominant-axis bits:
     ~45-deg tile cones at the cost of splitting cluster runs).
  E5 dragon @1280x720 wave kernel-key (mega holds 0.125 s/spp there;
     the adaptive origin bins may flip the wave/mega decision).
  E6 teapot profile: per-step ms + alive counts for the kernel-key
     config (RENE_WAVE_PROFILE=1 forces per-step sync).

Usage: timeout 5400 python scripts/tpu_session_r3ab.py [E4 E5 E6]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E4", "E5", "E6"]

    if "E4" in todo or "E6" in todo:
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    if "E4" in todo:
        run = build(teapot, samples_per_wave=8, dir_sub=True)
        reps("AB.E4 teapot dir_sub", run, 8)
    if "E5" in todo:
        dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        run = build(dragon, samples_per_wave=8)
        reps("AB.E5 dragon wave kernel-key", run, 8)
    if "E6" in todo:
        os.environ["RENE_WAVE_PROFILE"] = "1"
        run = build(teapot, samples_per_wave=8)
        reps("AB.E6 teapot profile", run, 8, n=1)
        os.environ.pop("RENE_WAVE_PROFILE", None)


if __name__ == "__main__":
    main()
