"""Round-5 TPU session A: refresh stale marginal rates + atlas partition.

The README still quotes round-2 numbers for volpath fog (416 Mrays/s)
and imagemap scenes (~400 Mrays/s marginal) — both predate median
clustering, env-NEE and r4v quad fusion. And the imagemap number has
no cost partition: nobody knows whether texture-heavy scenes are
fetch-bound or trace-bound (VERDICT r4 weak #2). New ablation gate
RENE_MEGA_ABLATE=atlas replaces every paged-VMEM fetch (material slots
+ env background) with a flat 0.5 while keeping the attr application,
so T_base - T_atlas = the fetch share.

  A0 fog_sphere volpath mega @640x480: marginal s/spp + Mrays/s
  A1 textured scene (PFM env-map light + imagemap Kd floor + spheres)
     @640x480: marginal Mrays/s, ablate off
  A2 same scene, RENE_MEGA_ABLATE=atlas  -> fetch share
  A3 same scene, RENE_MEGA_ABLATE=dbltris -> trace share (partition
     sanity: fetch + trace + rest should bracket the base)

Usage: timeout 7200 python scripts/tpu_session_r5a.py [A0 A1 A2 A3]
"""
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402

from tpu_session_r2 import load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def write_pfm(path, img):
    """img: (h, w, 3) float32, row 0 = top. PFM stores bottom-up LE."""
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(np.ascontiguousarray(
            img[::-1].astype("<f4")).tobytes())


def textured_scene_dir():
    """Synthesize the round-2-style textured scene: a PFM env-map
    infinite light, an imagemap Kd floor, an imagemap-Kd matte sphere
    and a substrate sphere (all four in-kernel fetch classes of the
    round-2 measurement: env bg + Kd maps)."""
    d = "/tmp/r5a_textured"
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    # 256x128 lat-long env with a bright band + soft noise
    h, w = 128, 256
    yy = np.linspace(0, np.pi, h)[:, None]
    env = np.stack([
        0.4 + 0.6 * np.sin(yy) * np.ones((h, w)),
        0.3 + 0.5 * np.sin(yy) ** 2 * np.ones((h, w)),
        0.5 + 0.4 * np.cos(yy) ** 2 * np.ones((h, w)),
    ], -1).astype(np.float32)
    env += rng.random((h, w, 3), np.float32) * 0.1
    write_pfm(f"{d}/env.pfm", env)
    # 128x128 wood-ish Kd map
    x = np.linspace(0, 8 * np.pi, 128)
    kd = (0.4 + 0.25 * np.sin(x)[None, :, None]
          * np.ones((128, 128, 3), np.float32))
    kd += rng.random((128, 128, 3), np.float32) * 0.08
    write_pfm(f"{d}/kd.pfm", np.clip(kd, 0.02, 0.95).astype(np.float32))
    scene = """
Integrator "path" "integer maxdepth" [8]
LookAt 0 -7 2  0 0 1  0 0 1
Camera "perspective" "float fov" [42]
Film "image" "integer xresolution" [640] "integer yresolution" [480]
WorldBegin
LightSource "infinite" "string mapname" ["env.pfm"]
Texture "floorkd" "spectrum" "imagemap" "string filename" ["kd.pfm"]
  "float uscale" [4] "float vscale" [4]
AttributeBegin
  Material "matte" "texture Kd" ["floorkd"]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-8 -8 0  -8 8 0  8 8 0  8 -8 0]
    "float uv" [0 0  0 1  1 1  1 0]
AttributeEnd
AttributeBegin
  Material "matte" "texture Kd" ["floorkd"]
  Translate -1.4 0.6 1.1
  Shape "sphere" "float radius" 1.1
AttributeEnd
AttributeBegin
  Material "substrate" "rgb Kd" [.7 .5 .3] "rgb Ks" [.04 .04 .04]
    "float uroughness" [0.02] "float vroughness" [0.02]
    "bool remaproughness" ["false"]
  Translate 1.5 -0.3 0.9
  Shape "sphere" "float radius" 0.9
AttributeEnd
WorldEnd
"""
    with open(f"{d}/scene.pbrt", "w") as f:
        f.write(scene)
    return f"{d}/scene.pbrt"


def measure(tag, scene, spp_a=4, spp_b=16, seed=3, reps=3):
    """Marginal s/spp AND marginal Mrays/s via two chunk sizes."""
    from rene_tpu.integrators import pallas_path as pp
    from rene_tpu.scene.device import build_device_scene
    bn, cfg = build_device_scene(scene)
    run = pp.make_pallas_batch_fn(bn, cfg)
    assert run is not None, f"{tag}: not pallas eligible"
    t0 = time.time()
    out = run(seed, spp_a)
    float(np.asarray(out["rays"]).sum())
    print(f"{tag}: compile+1st({spp_a}spp) {time.time()-t0:.1f}s",
          flush=True)
    best, best_rate = 1e30, 0.0
    for r in range(reps):
        t0 = time.time()
        ra = float(np.asarray(run(seed + r, spp_a)["rays"]).sum())
        ta = time.time() - t0
        t0 = time.time()
        rb = float(np.asarray(run(seed + r, spp_b)["rays"]).sum())
        tb = time.time() - t0
        marg = (tb - ta) / (spp_b - spp_a)
        rate = (rb - ra) / max(tb - ta, 1e-9)
        if marg < best:
            best, best_rate = marg, rate
        print(f"  rep{r}: marginal {marg*1000:.1f} ms/spp  "
              f"{rate/1e6:.0f} Mrays/s", flush=True)
    print(f"{tag}: best marginal {best*1000:.1f} ms/spp  "
          f"{best_rate/1e6:.0f} Mrays/s", flush=True)


def fog(tag):
    scene = load_at(f"{HERE}/train_scenes/fog_sphere.pbrt", 640, 480)
    scene.sampler = "independent"
    measure(tag, scene, spp_a=4, spp_b=16)


def textured(tag, ablate):
    os.environ["RENE_MEGA_ABLATE"] = ablate
    try:
        scene = load_at(textured_scene_dir(), 640, 480)
        scene.sampler = "independent"
        measure(tag + f" (ablate='{ablate}')", scene, spp_a=4, spp_b=16)
    finally:
        os.environ["RENE_MEGA_ABLATE"] = ""


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["A0", "A1", "A2", "A3"]
    if "A0" in todo:
        guard("A0", lambda: fog("A.A0 fog volpath @640x480"))
    if "A1" in todo:
        guard("A1", lambda: textured("A.A1 textured base", ""))
    if "A2" in todo:
        guard("A2", lambda: textured("A.A2 textured no-atlas", "atlas"))
    if "A3" in todo:
        guard("A3", lambda: textured("A.A3 textured dbltris", "dbltris"))


if __name__ == "__main__":
    main()
