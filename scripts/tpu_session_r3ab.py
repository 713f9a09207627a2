"""Round-3 TPU session AB: pixel-filter A/B on the goldens.

All four golden scenes declare PixelFilter "triangle" 1.0 (Tungsten's
tent); until now we ignored it (box jitter). SSIM vs the PNG goldens,
same spp as the recorded box numbers:
  cornell 2048 (box: 0.8381), veach-compat 2048 (box: 0.9455),
  teapot raw 512 via wave (box: 0.8789).
The tent is now default-on via the directive, so these renders measure
it; a second cornell pass with the filter forced off isolates the
delta within-session.

Usage: timeout 7200 python scripts/tpu_session_r3ab.py [C V T]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

SAMPLES = "/root/reference/sample_scenes"


def ssim_scene(tag, name, spp, engine=None, scene_mut=None):
    import numpy as np
    from PIL import Image as PILImage

    from rene_tpu.render import render
    from rene_tpu.scene import load_scene
    from rene_tpu.utils.film import to_rgb8
    from rene_tpu.utils.ssim import ssim
    scene = load_scene(f"{SAMPLES}/{name}/scene.pbrt",
                       color_space="srgb-lights")
    if scene_mut:
        scene_mut(scene)
    golden = np.asarray(PILImage.open(
        f"{SAMPLES}/{name}/TungstenRender.png").convert("RGB"),
        np.float32) / 255.0
    t0 = time.time()
    kw = {"engine": engine} if engine else {}
    out = render(scene, spp=spp, seed=0, **kw)
    s = ssim(to_rgb8(out["color"]).astype(np.float32) / 255.0, golden)
    print(f"{tag}: SSIM {s:.4f} ({time.time() - t0:.0f}s)", flush=True)
    return s


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = set(sys.argv[1:]) or {"C", "V", "T"}

    if "C" in todo:
        ssim_scene("AB.cornell tent 2048", "cornell-box", 2048)

        def boxf(scene):
            scene.pixel_filter = ("box", 0.5)
        ssim_scene("AB.cornell box 2048", "cornell-box", 2048,
                   scene_mut=boxf)

    if "V" in todo:
        os.environ["RENE_MF_DIST"] = "beckmann"
        from rene_tpu.scene.overrides import apply_overrides
        from tpu_session_r3b import spec_for

        def compat(scene):
            scene.max_depth_hint = 2
            apply_overrides(scene,
                            spec_for(backdrop=0.55,
                                     fscale=0.95 / math.pi))
        ssim_scene("AB.veach-compat tent 2048", "veach-mis", 2048,
                   scene_mut=compat)
        os.environ.pop("RENE_MF_DIST")

    if "T" in todo:
        ssim_scene("AB.teapot tent 512 wave", "teapot", 512,
                   engine="wave")


if __name__ == "__main__":
    main()
