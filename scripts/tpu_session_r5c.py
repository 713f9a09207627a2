"""Round-5 TPU session C: RGB9E5-packed atlas fetch A/B.

r5a partitioned the textured scene at ~92% atlas-fetch (9.0 ms/spp
base vs 0.7 with the fetch ablated). The packed atlas (ops/rgb9e5.py,
RENE_IMG_PACK, default ON) folds the three channel gather+select
chains per page into one, predicting up to ~3x on the fetch share.

  C0 textured @640x480 packed (default)    [r5a unpacked: 9.0 ms/spp]
  C1 textured @640x480 RENE_IMG_PACK=0     (the r5a baseline re-run)
  C2 teapot-compat probe env (the real imagemap user): packed
  C3 same, RENE_IMG_PACK=0

Usage: timeout 7200 python scripts/tpu_session_r5c.py [C0 C1 C2 C3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r5a import measure, textured_scene_dir  # noqa: E402
from tpu_session_r2 import load_at  # noqa: E402


def with_pack(val, fn):
    prev = os.environ.get("RENE_IMG_PACK")
    os.environ["RENE_IMG_PACK"] = val
    try:
        fn()
    finally:
        if prev is None:
            os.environ.pop("RENE_IMG_PACK", None)
        else:
            os.environ["RENE_IMG_PACK"] = prev


def textured(tag):
    scene = load_at(textured_scene_dir(), 640, 480)
    scene.sampler = "independent"
    measure(tag, scene, spp_a=4, spp_b=16)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["C0", "C1"]
    if "C0" in todo:
        guard("C0", lambda: with_pack(
            "1", lambda: textured("C.C0 textured PACKED")))
    if "C1" in todo:
        guard("C1", lambda: with_pack(
            "0", lambda: textured("C.C1 textured planar")))


if __name__ == "__main__":
    main()
