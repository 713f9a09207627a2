"""Round-4 TPU session T: volpath on deep HBM-streamed meshes.

r4s confirmed the auto policy (wave for deep cluster scenes) on the
PATH integrator over HBM geometry; the VOLPATH x HBM combination has
CPU parity (test_volpath_hbm_matches_xla, test_wave_volpath_hbm_
matches_xla) but zero on-chip numbers, and it exercises two auto
defaults that have crashed before on untested big-mesh classes
(r4q Q3 watchdog, r4q2 A2 VMEM gate). Scene: the 523k-tri sphere
wrapped in a thin scattering fog enclosure, volpath maxdepth 64.

  TB 523k fog md64 @320x180, AUTO megakernel (auto_pack volpath) —
     anchor + crash-hunt.
  T1 same scene, wave engine (auto spw).
  T2 same @720p, wave engine (auto spw=27).
  T3 same @720p, AUTO megakernel (the r4q Q3 crash class with the
     volpath=True auto_pack branch).

Decision: if T1 >= TB the deep-volpath auto route needs an HBM
exclusion; either way the class gets its first on-chip record.

Usage: timeout 14400 python scripts/tpu_session_r4t.py [TB T1 T2 T3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import bigmesh_scene  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4q2 import measure_auto  # noqa: E402


def fog_bigmesh(res):
    """523k-tri sphere inside a thin fog enclosure, volpath md64."""
    bigmesh_scene(1 << 20, res=res)  # writes /tmp/bigmesh/{ply,pbrt}
    with open("/tmp/bigmesh/scene.pbrt") as f:
        src = f.read()
    src = src.replace('Integrator "path" "integer maxdepth" [5]',
                      'Integrator "volpath" "integer maxdepth" [64]')
    fog = ('WorldBegin\n'
           'AttributeBegin\n'
           '  MakeNamedMedium "fog" "rgb sigma_a" [.010 .012 .015]\n'
           '    "rgb sigma_s" [.10 .09 .08] "float g" 0.2\n'
           '  MediumInterface "fog" ""\n'
           '  Material "none"\n'
           '  Shape "sphere" "float radius" 8\n'
           'AttributeEnd\n')
    src = src.replace('WorldBegin', fog, 1)
    from rene_tpu.pbrt import parse_pbrt
    from rene_tpu.scene import create_scene
    s = create_scene(parse_pbrt(src), "/tmp/bigmesh")
    assert s.integrator == "volpath"
    return s


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["TB", "T1", "T2", "T3"]

    if "TB" in todo:
        guard("TB", lambda: measure_auto(
            "T.TB 523k fog md64 @320x180 AUTO mega",
            fog_bigmesh((320, 180)), spp_a=1, spp_b=2))

    def wave_probe(tag, res):
        run = build(fog_bigmesh(res))
        print(f"{tag} auto spw = {run.samples_per_wave}", flush=True)
        reps(tag, run, run.samples_per_wave)

    if "T1" in todo:
        guard("T1", lambda: wave_probe(
            "T.T1 523k fog md64 @320x180 WAVE", (320, 180)))
    if "T2" in todo:
        guard("T2", lambda: wave_probe(
            "T.T2 523k fog md64 @720p WAVE", (1280, 720)))
    if "T3" in todo:
        guard("T3", lambda: measure_auto(
            "T.T3 523k fog md64 @720p AUTO mega",
            fog_bigmesh((1280, 720)), spp_a=1, spp_b=2))


if __name__ == "__main__":
    main()
