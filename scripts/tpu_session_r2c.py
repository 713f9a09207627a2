"""Round-2 TPU session C: SUB_TRIS=32 march perf + golden SSIM refresh.

  P: dragon/teapot marginal s/spp at 320x180 and 1280x720 (SUB32 + 2-row
     box pages; SUB64 round-2 numbers: dragon 0.017/?, teapot 0.152/?),
     then a ~1M-tri HBM render.
  Q: golden-res SSIMs with the round-2 estimator (exact lambda, cone
     sphere lights): cornell 2048spp (pallas), veach 1024spp, dragon +
     teapot 64spp; renders archived under docs/renders/.

Usage: timeout 4000 python scripts/tpu_session_r2c.py [P Q]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from tpu_session_r2 import SAMPLES, bigmesh_scene, load_at, measure


def golden_ssim(name, scene_rel, spp, denoisers=("none",), w=None, h=None):
    from PIL import Image as PILImage

    from rene_tpu.models.denoise import UNetDenoiser, denoise
    from rene_tpu.render import render
    from rene_tpu.scene import load_scene
    from rene_tpu.utils.film import save_png, to_rgb8
    from rene_tpu.utils.ssim import ssim

    unet = (UNetDenoiser.load("rene_tpu/models/weights/unet.msgpack")
            if "cnn" in denoisers else None)
    path = f"{SAMPLES}/{scene_rel}"
    scene = load_scene(path, color_space="srgb-lights")
    golden = np.asarray(PILImage.open(os.path.join(
        os.path.dirname(path), "TungstenRender.png")).convert("RGB"),
        np.float32) / 255.0
    t0 = time.time()
    out = render(scene, spp=spp, seed=0)
    dt = time.time() - t0
    for d in denoisers:
        img = out["color"] if d == "none" else denoise(
            out["color"], out["normal"], out["albedo"], d, unet=unet)
        img8 = to_rgb8(img)
        s = ssim(img8.astype(np.float32) / 255.0, golden)
        print(f"Q.{name} spp={spp} denoise={d}: SSIM {s:.4f} "
              f"({dt:.0f}s, {out['total_rays']/dt/1e6:.0f} Mrays/s)",
              flush=True)
        tag = "" if d == "none" else f"_{d}"
        save_png(f"docs/renders/{name}_r2_{spp}spp{tag}.png", img8)


def main():
    import jax
    todo = set(sys.argv[1:]) or {"P", "Q"}
    print("platform:", jax.devices()[0].platform, flush=True)

    if "P" in todo:
        d = load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180)
        measure("P.dragon@320x180", d, 2, 10)
        d = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure("P.dragon@1280x720", d, 1, 3)
        t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180)
        measure("P.teapot@320x180", t, 2, 6)
        t = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
        measure("P.teapot@1280x720", t, 1, 3)
        s = bigmesh_scene(1 << 21, res=(320, 180))
        out, _ = measure("P.bigmesh1M@320x180", s, 1, 3, reps=2)
        rad = np.asarray(out["radiance"])
        print("P.bigmesh1M: finite", bool(np.isfinite(rad).all()),
              "mean", float(rad.mean()), flush=True)

    if "Q" in todo:
        golden_ssim("cornell-box", "cornell-box/scene.pbrt", 2048,
                    ("none", "atrous", "cnn"))
        golden_ssim("veach-mis", "veach-mis/scene.pbrt", 1024,
                    ("none", "atrous"))
        golden_ssim("dragon", "dragon/scene.pbrt", 64)
        golden_ssim("teapot", "teapot/scene.pbrt", 64)


if __name__ == "__main__":
    main()
