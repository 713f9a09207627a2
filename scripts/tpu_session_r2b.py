"""Round-2 TPU session B: isolate the bigmesh HBM phantom-hit bug.

The 523k-tri synthetic sphere rendered with phantom occlusion via the HBM
march (dragon 51k was bit-identical to VMEM). Bisect:

  1. 32k-tri bigmesh: VMEM vs HBM (force HBM_MIN_TRIS down) vs XLA,
     on-chip, same seed — localize engine vs scale.
  2. If 32k agrees, retry at 131k / 262k / 523k HBM vs XLA mean/regions.

Usage: timeout 3000 python scripts/tpu_session_r2b.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from rene_tpu.integrators import pallas_path as pp
from tpu_session_r2 import bigmesh_scene
from rene_tpu.scene.device import build_device_scene


def regions(img, G=3):
    h, w = img.shape[:2]
    return [round(float(img[j*h//G:(j+1)*h//G, i*w//G:(i+1)*w//G].mean()), 4)
            for j in range(G) for i in range(G)]


def render_pallas(bn, cfg, spp=16, seed=3):
    run = pp.make_pallas_batch_fn(bn, cfg)
    t0 = time.time()
    out = run(seed, spp)
    rad = np.asarray(out["radiance"]) / spp
    print(f"  ({time.time()-t0:.0f}s)", flush=True)
    return rad.reshape(cfg.film.yresolution, cfg.film.xresolution, 3), out


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)

    s = bigmesh_scene(1 << 15, res=(64, 36))
    bn, cfg = build_device_scene(s)
    print("tris:", cfg.num_triangles, flush=True)

    print("1a. VMEM pallas...", flush=True)
    img_v, out_v = render_pallas(bn, cfg)
    print("  mean", img_v.mean(), "regions", regions(img_v), flush=True)

    print("1b. HBM pallas...", flush=True)
    pp.HBM_MIN_TRIS = 1000
    img_h, out_h = render_pallas(bn, cfg)
    pp.HBM_MIN_TRIS = 1 << 17
    print("  mean", img_h.mean(), "regions", regions(img_h), flush=True)
    print("  HBM-vs-VMEM: rad max|d|",
          float(np.abs(img_h - img_v).max()),
          "albedo max|d|",
          float(np.abs(np.asarray(out_h["albedo"])
                       - np.asarray(out_v["albedo"])).max()), flush=True)

    print("1c. XLA reference...", flush=True)
    from rene_tpu.render import render
    t0 = time.time()
    xla = render(s, spp=16, seed=3, engine="xla")
    print(f"  ({time.time()-t0:.0f}s) mean", xla["color"].mean(),
          "regions", regions(xla["color"]), flush=True)

    if np.abs(img_h - img_v).max() < 1e-5:
        for target in (1 << 17, 1 << 18, 1 << 19):
            s2 = bigmesh_scene(target, res=(64, 36))
            bn2, cfg2 = build_device_scene(s2)
            print(f"2. tris={cfg2.num_triangles} HBM...", flush=True)
            img2, _ = render_pallas(bn2, cfg2, spp=8)
            print("  mean", img2.mean(), "regions", regions(img2),
                  flush=True)


if __name__ == "__main__":
    main()
