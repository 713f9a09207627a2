"""Round-3 TPU session X: does the march break pay in HBM mode?

VMEM-mode verdict (r3t/r3v): no measurable effect (all variants within
the +-10% chip noise). HBM mode is where a skipped group skips a DMA;
baselines (round 2): 523k tris 0.209 s/spp, 1.05M 0.563 @320x180.

Variants on the 523k-tri synthetic sphere (module flags between
builds): ON (closest hbm-break + any break) vs OFF (fori marches).

Usage: timeout 5400 python scripts/tpu_session_r3x.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import bigmesh_scene, measure  # noqa: E402


def main():
    import jax

    import rene_tpu.integrators.pallas_path as pp
    print("platform:", jax.devices()[0].platform, flush=True)
    # first attempt used 1<<19 -> 261630 tris, just UNDER HBM_MIN_TRIS
    # (262144): both variants silently ran VMEM/no-break (0.139/0.143,
    # noise). Force the mode so the variants actually differ.
    pp.HBM_MIN_TRIS = 1 << 17
    s = bigmesh_scene(1 << 19, res=(320, 180))

    for tag, (brk, any_) in [("ON", (True, True)),
                             ("OFF", (False, False))]:
        pp.OCT_BREAK, pp.OCT_BREAK_ANY = brk, any_
        measure(f"X2.{tag} bigmesh262k-hbm", s, spp_a=1, spp_b=5,
                reps=2)


if __name__ == "__main__":
    main()
