"""One-shot TPU measurement session: component timings, batch throughput,
and a real cornell-box render with SSIM vs the Tungsten golden.

Run as a single process so the device claim and compile session are reused.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from rene_tpu.integrators.camera import generate_rays
from rene_tpu.ops import bsdf as B
from rene_tpu.ops import intersect as I
from rene_tpu.ops import rng
from rene_tpu.ops.accel import make_accel
from rene_tpu.render import _batch_fn
from rene_tpu.scene import load_scene
from rene_tpu.scene.device import build_device_scene, to_jax
from rene_tpu.utils.film import rays_to_image, save_png, to_rgb8
from rene_tpu.utils.ssim import ssim


def timeit(name, fn, *args, iters=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} compile+1st {time.time() - t0:7.1f} s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    res = 512
    scene = load_scene("/root/reference/sample_scenes/cornell-box/scene.pbrt")
    scene.film.xresolution = res
    scene.film.yresolution = res
    buffers_np, config = build_device_scene(scene)
    buffers = to_jax(buffers_np)
    accel = make_accel(buffers_np, config)
    n = res * res
    print(f"rays={n} tris={config.num_triangles} "
          f"platform={jax.devices()[0].platform}", flush=True)

    ys, xs = np.mgrid[0:res, 0:res]
    px = jnp.asarray(xs.reshape(-1).astype(np.int32))
    py = jnp.asarray(ys.reshape(-1).astype(np.int32))
    state0 = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32))

    from rene_tpu.ops import vec3 as v3

    @jax.jit
    def piece(buffers, px, py, state):
        org, d, state = generate_rays(buffers, config, px, py, state)
        hit = I.trace(buffers, config, org, d, 1e-3, 1e5, accel=accel)
        wo = -d.normalized()
        normal = hit["normal"].normalized()
        mat_idx = buffers["inst_material"][hit["inst"]]
        onb = v3.Onb.from_w(normal)
        lobes = B.compute_bsdf(buffers, mat_idx, hit["uv"], config)
        wi, f, pdf, state = B.bsdf_sample_f(lobes, onb, wo, state, config)
        lpdf = I.trace_emissive_pdf(buffers, config, hit["position"], wi,
                                    1e-3, 1e5, accel=accel)
        return wi.to_array(), f.to_array(), pdf, lpdf, hit["t"]

    dt = timeit("one full bounce (trace+shade+pdf)", piece, buffers, px, py,
                state0)
    print(f"  -> {2 * n / dt / 1e6:.1f} Mrays/s at full occupancy", flush=True)

    run, _ = _batch_fn(config, accel=accel)
    for s in (16,):
        dtb = timeit(f"batch {s} samples @512", run, buffers, px, py,
                     jnp.uint32(1), s, iters=2)
        out = run(buffers, px, py, jnp.uint32(1), s)
        rays = float(out["rays"])
        print(f"  -> rays={rays / 1e6:.1f}M, {rays / dtb / 1e6:.1f} Mrays/s",
              flush=True)

    # real render: accumulate chunks of 16 to 128 spp, SSIM vs golden @512
    accum = np.zeros((n, 3), np.float32)
    total = 0
    t0 = time.time()
    host = np.random.default_rng(0)
    while total < 128:
        sd = np.uint32(host.integers(0, 2 ** 32, dtype=np.uint32))
        out = run(buffers, px, py, jnp.uint32(sd), 16)
        accum += np.asarray(out["radiance"])
        total += 16
    dt = time.time() - t0
    img = rays_to_image(accum / total, res, res)
    p = save_png("/tmp/cornell_tpu_128.png", to_rgb8(img))
    from PIL import Image as PILImage
    golden = np.asarray(
        PILImage.open("/root/reference/sample_scenes/cornell-box/"
                      "TungstenRender.png").resize((res, res)),
        np.float32)[..., :3] / 255.0
    s = ssim(to_rgb8(img).astype(np.float32) / 255.0, golden)
    print(f"cornell 128spp @512 in {dt:.1f}s -> SSIM {s:.4f} ({p})",
          flush=True)


if __name__ == "__main__":
    main()
