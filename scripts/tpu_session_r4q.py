"""Round-4 TPU session Q: HBM-streamed march @720p (record gap).

The HBM class (meshes past the VMEM table budget, DMA-streamed per
entered group) has packed numbers only @320x180 (r4k: 523k 0.055,
1.05M 0.076 s/spp). Every other engine class has a 720p record; this
session fills the gap at the production resolution. Two extra stakes:

* auto-pack resolves to 64 @720p, and ONE packed kernel call delivers
  pack spp — on the slow HBM march that single call may approach the
  ~1-min worker-kill ceiling (CLAUDE.md landmine). Q3 probes the
  default a user would actually get, LAST (a crash costs 5-10 min of
  device recovery and must not block Q1/Q2).
* pack=16 (the r4k winner class) at 720p decides whether the
  small-film optimum transfers or the lane budget wants less.

  QB ~523k-tri sphere @1280x720, UNPACKED anchor (RENE_MEGA_PACK=1).
  Q1 same, pack=16 ST=16.
  Q2 ~1.05M-tri sphere @1280x720, pack=16 ST=16.
  Q3 523k @720p pack=64 ST=16 (the auto default; worker-kill probe).

Usage: timeout 10800 python scripts/tpu_session_r4q.py [QB Q1 Q2 Q3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import bigmesh_scene, measure  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4h import measure_packed  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["QB", "Q1", "Q2", "Q3"]

    half = None
    if any(t in todo for t in ("QB", "Q1", "Q3")):
        half = bigmesh_scene(ntris_target=1 << 19, res=(1280, 720))

    if "QB" in todo:
        def qb():
            os.environ["RENE_MEGA_PACK"] = "1"
            try:
                measure("Q.QB hbm-523k @720p unpacked", half,
                        spp_a=1, spp_b=3, reps=2)
            finally:
                del os.environ["RENE_MEGA_PACK"]
        guard("QB", qb)

    def packed(tag, scene, pack, **kw):
        old = pp.SUB_TRIS
        pp.SUB_TRIS = 16
        try:
            measure_packed(tag, scene, pack, **kw)
        finally:
            pp.SUB_TRIS = old

    if "Q1" in todo:
        guard("Q1", lambda: packed(
            "Q.Q1 hbm-523k @720p pack=16 ST=16", half, 16,
            spp_a=1, spp_b=2, reps=2))
    if "Q2" in todo:
        def q2():
            big = bigmesh_scene(ntris_target=1 << 20, res=(1280, 720))
            packed("Q.Q2 hbm-1M @720p pack=16 ST=16", big, 16,
                   spp_a=1, spp_b=2, reps=2)
        guard("Q2", q2)
    if "Q3" in todo:
        guard("Q3", lambda: packed(
            "Q.Q3 hbm-523k @720p pack=64 ST=16 (auto default)", half,
            64, spp_a=1, spp_b=2, reps=1))


if __name__ == "__main__":
    main()
