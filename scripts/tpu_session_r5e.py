"""Round-5 TPU session E: non-regressing denoiser quality table.

VERDICT r4 weak #3: the cnn denoiser REGRESSED vs raw on 3 of 5
converged goldens. Round 5 adds the convergence-aware blend
(render want_var -> chunk-mean variance -> Wiener shrink toward raw,
models/denoise.convergence_blend). Deliverable: a quality table where
the blended denoisers match-or-beat raw on every golden at both 64 and
2048 spp (at 2048 the blend passes raw through; at 64 the denoiser
wins where it should).

Rows: cornell-box, veach-mis(+compat), dragon, teapot,
teapot(+compat, denoiser-gated probe) x spp {64, 2048} x
{raw, atrous+blend, cnn+blend}.

Usage: timeout 14400 python scripts/tpu_session_r5e.py [64 2048]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from tpu_session_r4a import guard  # noqa: E402

SAMPLES = "/root/reference/sample_scenes"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def golden_ssim_blend(name, scene_rel, spp, compat=False):
    from PIL import Image as PILImage

    from rene_tpu.models.denoise import UNetDenoiser, denoise
    from rene_tpu.render import render
    from rene_tpu.scene import load_scene
    from rene_tpu.utils.film import to_rgb8
    from rene_tpu.utils.ssim import ssim

    unet = UNetDenoiser.load(
        os.path.join(ROOT, "rene_tpu/models/weights/unet.msgpack"))
    path = f"{SAMPLES}/{scene_rel}"
    scene = load_scene(path, color_space="srgb-lights")
    if compat:
        from rene_tpu.scene.overrides import (apply_overrides,
                                              find_tungsten_overrides)
        ov = find_tungsten_overrides(path)
        if ov:
            apply_overrides(scene, ov)
    golden = np.asarray(PILImage.open(os.path.join(
        os.path.dirname(path), "TungstenRender.png")).convert("RGB"),
        np.float32) / 255.0
    t0 = time.time()
    out = render(scene, spp=spp, seed=0, want_var=True)
    dt = time.time() - t0
    res = {}
    for d in ("none", "atrous", "cnn"):
        img = denoise(out["color"], out["normal"], out["albedo"], d,
                      unet=unet, varmean=out.get("varmean"))
        s = ssim(to_rgb8(img).astype(np.float32) / 255.0, golden)
        res[d] = s
        print(f"E.{name} spp={spp} {d}+blend: SSIM {s:.4f} "
              f"({dt:.0f}s render)", flush=True)
    ok = res["cnn"] >= res["none"] - 0.002 \
        and res["atrous"] >= res["none"] - 0.002
    print(f"E.{name} spp={spp} NON-REGRESSION "
          f"{'PASS' if ok else 'FAIL'} (raw {res['none']:.4f} "
          f"atrous {res['atrous']:.4f} cnn {res['cnn']:.4f})",
          flush=True)


ROWS = [
    ("cornell", "cornell-box/scene.pbrt", False),
    ("veach", "veach-mis/scene.pbrt", False),
    ("veach+compat", "veach-mis/scene.pbrt", True),
    ("dragon", "dragon/scene.pbrt", False),
    ("teapot", "teapot/scene.pbrt", False),
    ("teapot+compat", "teapot/scene.pbrt", True),
]


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    spps = [int(a) for a in sys.argv[1:]] or [64, 2048]
    for spp in spps:
        for name, rel, compat in ROWS:
            guard(f"{name}@{spp}", lambda n=name, r=rel, c=compat,
                  s=spp: golden_ssim_blend(n, r, s, compat=c))


if __name__ == "__main__":
    main()
