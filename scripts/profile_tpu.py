"""Component-level TPU timing: isolate trace / bsdf / full-bounce costs.

Usage: python scripts/profile_tpu.py [res]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rene_tpu.integrators.camera import generate_rays
from rene_tpu.ops import bsdf as B
from rene_tpu.ops import intersect as I
from rene_tpu.ops import math3d as m3
from rene_tpu.ops import rng
from rene_tpu.scene import load_scene
from rene_tpu.scene.device import build_device_scene, to_jax


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:30s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = load_scene("/root/reference/sample_scenes/cornell-box/scene.pbrt")
    scene.film.xresolution = res
    scene.film.yresolution = res
    buffers_np, config = build_device_scene(scene)
    buffers = to_jax(buffers_np)
    n = res * res
    print(f"rays={n}, tris={config.num_triangles}, "
          f"platform={jax.devices()[0].platform}")

    ys, xs = np.mgrid[0:res, 0:res]
    px = jnp.asarray(xs.reshape(-1).astype(np.int32))
    py = jnp.asarray(ys.reshape(-1).astype(np.int32))
    state0 = rng.pcg_init(jnp.arange(n, dtype=jnp.uint32))

    @jax.jit
    def gen(buffers):
        return generate_rays(buffers, config, px, py, state0)

    org, d, _ = gen(buffers)
    timeit("camera rays", gen, buffers)

    @jax.jit
    def tr(buffers, org, d):
        return I.trace(buffers, config, org, d, 1e-3, 1e5)

    hit = tr(buffers, org, d)
    dt = timeit("trace (closest hit)", tr, buffers, org, d)
    print(f"  -> {n / dt / 1e6:.1f} Mrays/s trace-only")

    @jax.jit
    def occl(buffers, org, d):
        return I.occluded(buffers, config, org, d, 1e-3, 1e5)

    timeit("occlusion", occl, buffers, org, d)

    @jax.jit
    def shade(buffers, hit, d, state):
        wo = -m3.normalize(d)
        normal = m3.normalize(hit["normal"])
        mat_idx = buffers["inst_material"][hit["inst"]]
        onb = m3.onb_from_w(normal)
        lobes = B.compute_bsdf(buffers, mat_idx, hit["uv"])
        wi, f, pdf, state = B.bsdf_sample_f(lobes, onb, wo, state)
        fv = B.bsdf_f(lobes, onb, normal, wo, wi)
        pv = B.bsdf_pdf(lobes, onb, wo, wi)
        return wi, f, pdf, fv, pv

    timeit("bsdf (build+sample+f+pdf)", shade, buffers, hit, d, state0)

    @jax.jit
    def pdf_trace(buffers, org, d):
        return I.trace_emissive_pdf(buffers, config, org, d, 1e-3, 1e5)

    timeit("emissive pdf trace", pdf_trace, buffers, org, d)

    from rene_tpu.ops.accel import make_accel
    from rene_tpu.render import _batch_fn
    accel = make_accel(buffers_np, config)

    @jax.jit
    def tr_mxu(buffers, org, d):
        return I.trace(buffers, config, org, d, 1e-3, 1e5, accel=accel)

    hitm = tr_mxu(buffers, org, d)
    dtm = timeit("trace (MXU accel)", tr_mxu, buffers, org, d)
    print(f"  -> {n / dtm / 1e6:.1f} Mrays/s trace-only (MXU)")

    run, _ = _batch_fn(config, accel=accel)
    for s in (4, 16):
        dt = timeit(f"batch {s} samples (regen)", run, buffers, px, py,
                    jnp.uint32(1), s, iters=2)
        out = run(buffers, px, py, jnp.uint32(1), s)
        rays = float(out["rays"])
        print(f"  -> rays={rays:.0f}, {rays / dt / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
