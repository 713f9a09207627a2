"""Round-4 TPU session K: packing on the HBM-streamed march.

Auto-pack (r4j default flip) applies to EVERY cluster scene class, but
only the VMEM-table march was measured. The HBM march DMA-streams each
entered group into VMEM scratch — tighter packed beams mean FEWER
entered groups (less DMA traffic AND fewer MT unrolls), so packing
should transfer; this session proves or reverts it for the HBM class.

  K0 ~523k-tri synthetic sphere @320x180 unpacked anchor (r3: 0.209).
  K1 same, pack=16 ST=16.
  K2 same, pack=64 ST=16.
  K3 ~1.05M-tri sphere @320x180 pack=64 ST=16 (unpacked r3: 0.563).

Usage: timeout 10800 python scripts/tpu_session_r4k.py [K0..K3]
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
    todo = sys.argv[1:] or ["K0", "K1", "K2", "K3"]

    half = None
    if any(t in todo for t in ("K0", "K1", "K2")):
        half = bigmesh_scene(ntris_target=1 << 19)

    if "K0" in todo:
        # measure() builds with pack=0 -> auto; force unpacked anchor
        def k0():
            os.environ["RENE_MEGA_PACK"] = "1"
            try:
                measure("K.K0 hbm-523k @320x180 unpacked", half,
                        spp_a=2, spp_b=6, reps=2)
            finally:
                del os.environ["RENE_MEGA_PACK"]
        guard("K0", k0)

    def packed(tag, scene, pack, st=16, **kw):
        old = pp.SUB_TRIS
        pp.SUB_TRIS = st
        try:
            measure_packed(f"K.{tag} @320x180 pack={pack} SUB_TRIS="
                           f"{st}", scene, pack, **kw)
        finally:
            pp.SUB_TRIS = old

    if "K1" in todo:
        guard("K1", lambda: packed("K1 hbm-523k", half, 16,
                                   spp_a=1, spp_b=3))
    if "K2" in todo:
        guard("K2", lambda: packed("K2 hbm-523k", half, 64,
                                   spp_a=1, spp_b=2))
    if "K3" in todo:
        def k3():
            big = bigmesh_scene(ntris_target=1 << 20)
            packed("K3 hbm-1M", big, 64, spp_a=1, spp_b=2)
        guard("K3", k3)


if __name__ == "__main__":
    main()
