"""Round-3 TPU session AD: quantify the Sobol sampler on-chip.

The padded Owen-scrambled sampler costs ~30% Mrays/s on the cornell
megakernel (bench 1086 -> 733 with it). Is it worth it per unit time?

  A. cornell @1024^2: MSE vs an 8192-spp reference for
     sobol@256 / prng@256 / prng@340 (equal-time), plus wall times.
  B. veach-compat (beckmann + overrides + maxdepth 2, the
     noise-limited 0.9455@2048 config): SSIM @2048 sobol vs prng.
  C. teapot wave @720p @64spp: golden SSIM sobol vs prng + s/spp.

Usage: timeout 7200 python scripts/tpu_session_r3ad.py [A B C]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

SAMPLES = "/root/reference/sample_scenes"


def load(name, sampler, color_space=None, res=None):
    from rene_tpu.scene import load_scene
    kw = {"color_space": color_space} if color_space else {}
    s = load_scene(f"{SAMPLES}/{name}/scene.pbrt", **kw)
    s.sampler = sampler
    if res:
        s.film.xresolution, s.film.yresolution = res
    return s


def render_timed(tag, scene, spp, **kw):
    from rene_tpu.render import render
    t0 = time.time()
    out = render(scene, spp=spp, seed=kw.pop("seed", 0), **kw)
    dt = time.time() - t0
    print(f"{tag}: {dt:.1f}s", flush=True)
    return out["color"], dt


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = set(sys.argv[1:]) or {"A", "B", "C"}

    if "A" in todo:
        ref, _ = render_timed("A.ref prng@8192",
                              load("cornell-box", "independent"), 8192)
        for tag, smp, n in [("sobol@256", "sobol", 256),
                            ("prng@256", "independent", 256),
                            ("prng@340", "independent", 340)]:
            img, dt = render_timed(f"A.{tag}",
                                   load("cornell-box", smp), n, seed=5)
            mse = float(np.mean((img - ref) ** 2))
            print(f"A.{tag}: MSE {mse:.6f}  ({dt:.1f}s)", flush=True)

    if "B" in todo:
        os.environ["RENE_MF_DIST"] = "beckmann"
        from PIL import Image as PILImage

        from rene_tpu.scene.overrides import apply_overrides
        from rene_tpu.utils.film import to_rgb8
        from rene_tpu.utils.ssim import ssim
        from tpu_session_r3b import spec_for
        golden = np.asarray(PILImage.open(
            f"{SAMPLES}/veach-mis/TungstenRender.png").convert("RGB"),
            np.float32) / 255.0
        for smp in ("sobol", "independent"):
            s = load("veach-mis", smp, color_space="srgb-lights")
            s.max_depth_hint = 2
            apply_overrides(s, spec_for(backdrop=0.55,
                                        fscale=0.95 / math.pi))
            img, dt = render_timed(f"B.{smp}@2048", s, 2048)
            v = ssim(to_rgb8(img).astype(np.float32) / 255.0, golden)
            print(f"B.{smp}@2048: SSIM {v:.4f} ({dt:.0f}s)", flush=True)
        os.environ.pop("RENE_MF_DIST")

    if "C" in todo:
        from PIL import Image as PILImage

        from rene_tpu.utils.film import to_rgb8
        from rene_tpu.utils.ssim import ssim
        golden = np.asarray(PILImage.open(
            f"{SAMPLES}/teapot/TungstenRender.png").convert("RGB"),
            np.float32) / 255.0
        for smp in ("sobol", "independent"):
            s = load("teapot", smp, color_space="srgb-lights")
            img, dt = render_timed(f"C.{smp}@64 wave", s, 64,
                                   engine="wave")
            v = ssim(to_rgb8(img).astype(np.float32) / 255.0, golden)
            print(f"C.{smp}@64: SSIM {v:.4f} ({dt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
