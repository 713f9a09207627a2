"""Round-3 TPU session F: veach compat demo + denoisers on hard scenes.

  V. veach per-surface override sweep @320x180 (r3b R block).
  S. veach golden SSIM @720p, base vs compat overrides (r3b S block).
  T. retrain the U-Net with dragon/teapot/fog added to the corpus
     (the round-2 net never saw the cluster scenes it is most needed on).
  Q. golden SSIM with none/atrous/cnn for all four Bitterli scenes.
  Z. bench.py sanity (primary + new cluster extra metric).

Usage: timeout 5400 python scripts/tpu_session_r3f.py [V S T Q Z]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

SAMPLES = "/root/reference/sample_scenes"
HERE = os.path.dirname(os.path.abspath(__file__))
WEIGHTS = os.path.join(os.path.dirname(HERE),
                       "rene_tpu/models/weights/unet.msgpack")


def retrain(steps=800):
    from rene_tpu.models import train_denoiser as td
    parts = []
    corpus = [
        (f"{SAMPLES}/cornell-box/scene.pbrt", (4, 8, 32), 1024),
        (f"{SAMPLES}/sphere.pbrt", (4, 32), 512),
        (f"{SAMPLES}/cube.pbrt", (4, 32), 512),
        (f"{HERE}/train_scenes/metal_plates.pbrt", (4, 8, 32), 1024),
        # round-3: the hard cluster scenes + a volumetric scene
        (f"{SAMPLES}/dragon/scene.pbrt", (8, 64), 512),
        (f"{SAMPLES}/teapot/scene.pbrt", (8, 64), 512),
        (f"{HERE}/train_scenes/fog_sphere.pbrt", (8, 32), 512),
    ]
    for path, spps, clean in corpus:
        t0 = time.time()
        parts.append(td.render_pairs(path, spps, clean))
        print(f"T. {os.path.basename(os.path.dirname(path) or path)}: "
              f"{parts[-1][0].shape[0]} patches ({time.time()-t0:.0f}s)",
              flush=True)
    parts.append(td.synthetic_pairs(96))
    data = tuple(np.concatenate([p[i] for p in parts]) for i in range(5))
    print(f"T. training on {data[0].shape[0]} patches", flush=True)
    t0 = time.time()
    net, losses = td.train(data, steps=steps, batch=8)
    net.save(WEIGHTS)
    print(f"T. trained {steps} steps in {time.time()-t0:.0f}s; "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}; saved {WEIGHTS}",
          flush=True)


def golden_table():
    sys.path.insert(0, HERE)
    from tpu_session_r2c import golden_ssim
    golden_ssim("cornell-box", "cornell-box/scene.pbrt", 2048,
                ("none", "atrous", "cnn"))
    golden_ssim("veach-mis", "veach-mis/scene.pbrt", 1024,
                ("none", "atrous", "cnn"))
    golden_ssim("dragon", "dragon/scene.pbrt", 64,
                ("none", "atrous", "cnn"))
    golden_ssim("teapot", "teapot/scene.pbrt", 64,
                ("none", "atrous", "cnn"))


def main():
    todo = set(sys.argv[1:]) or {"V", "T", "Q"}
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    sys.path.insert(0, HERE)

    if "V" in todo or "S" in todo:
        import tpu_session_r3b as r3b
        if "V" in todo:
            r3b.main_blocks = None
            sys.argv = ["x", "R"]
            r3b.main()
        if "S" in todo:
            sys.argv = ["x", "S"]
            r3b.main()

    if "T" in todo:
        retrain(int(os.environ.get("RENE_TRAIN_STEPS", "2000")))

    if "Q" in todo:
        golden_table()

    if "Z" in todo:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(HERE),
                                          "bench.py")],
            capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        print("Z. bench:", line[-1] if line else out.stdout[-500:],
              flush=True)
        if line:
            json.loads(line[-1])


if __name__ == "__main__":
    main()
