"""Round-4 TPU session S: the wave engine on deep HBM-streamed meshes.

The auto policy (render._wave_default) routes cluster scenes with
maxdepth >= 32 to the wave engine INCLUDING HBM-streamed meshes
(wave_supported does not exclude them; CPU parity is covered by
tests/test_wave.py::test_wave_key_modes_hbm) — but no on-chip number
exists for the class. If the wave loses to the packed megakernel
there, or its full-population sorted HBM march misbehaves, the auto
default is wrong for every deep big-mesh scene. Measure both engines
on a deep 523k-tri sphere:

  SB 523k tris maxdepth-64 @320x180, AUTO megakernel (auto_pack) —
     anchor.
  S1 same scene, wave engine (auto spw).
  S2 same @720p, wave engine (auto spw=27; k=1 launches over 25M
     lanes of HBM march — est 3-13 s/launch from r4q/A3 scaling,
     under the watchdog).

Decision: if S1 >= SB the policy gains an HBM exclusion; either way
the number is recorded.

Usage: timeout 14400 python scripts/tpu_session_r4s.py [SB S1 S2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import bigmesh_scene  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4h import _force  # noqa: E402
from tpu_session_r4q2 import measure_auto  # noqa: E402


def deep_bigmesh(res):
    s = bigmesh_scene(1 << 20, res=res)
    s.max_depth_hint = 64
    return s


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["SB", "S1", "S2"]

    if "SB" in todo:
        guard("SB", lambda: measure_auto(
            "S.SB 523k md64 @320x180 AUTO mega", deep_bigmesh((320, 180)),
            spp_a=1, spp_b=2))

    def wave_probe(tag, res):
        run = build(deep_bigmesh(res))
        print(f"{tag} auto spw = {run.samples_per_wave}", flush=True)
        reps(tag, run, run.samples_per_wave)

    if "S1" in todo:
        guard("S1", lambda: wave_probe(
            "S.S1 523k md64 @320x180 WAVE", (320, 180)))
    if "S2" in todo:
        guard("S2", lambda: wave_probe(
            "S.S2 523k md64 @720p WAVE", (1280, 720)))


if __name__ == "__main__":
    main()
