"""Benchmark: Mrays/s on cornell-box @ 1024x1024 (the BASELINE.md metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the 300 Mrays/s/chip north star (the reference
publishes no numbers of its own, BASELINE.md).

Env overrides: RENE_BENCH_RES (default 1024), RENE_BENCH_SAMPLES (timed
samples, default 8), RENE_BENCH_PLATFORM (force a jax platform),
RENE_BENCH_SCENE (pbrt path).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_MRAYS = 300.0


def main():
    platform = os.environ.get("RENE_BENCH_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    res = int(os.environ.get("RENE_BENCH_RES", "1024"))
    timed_samples = int(os.environ.get("RENE_BENCH_SAMPLES", "32"))
    scene_path = os.environ.get(
        "RENE_BENCH_SCENE",
        "/root/reference/sample_scenes/cornell-box/scene.pbrt")

    from rene_tpu.render import _batch_fn
    from rene_tpu.scene import load_scene
    from rene_tpu.scene.device import build_device_scene, to_jax

    if os.path.exists(scene_path):
        scene = load_scene(scene_path)
    else:
        from __graft_entry__ import _FALLBACK_SCENE
        from rene_tpu.pbrt import parse_pbrt
        from rene_tpu.scene import create_scene
        scene = create_scene(parse_pbrt(_FALLBACK_SCENE), "/tmp")
    scene.film.xresolution = res
    scene.film.yresolution = res

    buffers_np, config = build_device_scene(scene)
    engine = "xla"
    pallas_run = None
    if jax.devices()[0].platform == "tpu":
        from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
        pallas_run = make_pallas_batch_fn(buffers_np, config)
        if pallas_run is not None:
            engine = "pallas"

    if pallas_run is not None:
        # warmup compiles; block_until_ready does not reliably block on this
        # runtime, so timing forces completion through the scalar ray count
        # (which depends on the full kernel). Film readback happens once per
        # sample batch in real renders (the reference reads back once per
        # image, main.rs:1404) and is excluded from the sustained rate.
        np.asarray(pallas_run(0, timed_samples)["radiance"])
        reps = 4
        t0 = time.time()
        total_rays = 0.0
        for r in range(reps):
            out = pallas_run(r + 1, timed_samples)
            total_rays += float(out["rays"])
        dt = time.time() - t0
    else:
        buffers = to_jax(buffers_np)
        from rene_tpu.ops.accel import make_accel
        run, _ = _batch_fn(config, accel=make_accel(buffers_np, config))
        n = res * res
        ys, xs = np.mgrid[0:res, 0:res]
        px = jnp.asarray(xs.reshape(-1).astype(np.int32))
        py = jnp.asarray(ys.reshape(-1).astype(np.int32))
        np.asarray(run(buffers, px, py, jnp.uint32(0), timed_samples)
                   ["radiance"])
        t0 = time.time()
        out = run(buffers, px, py, jnp.uint32(1), timed_samples)
        total_rays = float(out["rays"])
        np.asarray(out["radiance"])
        dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": f"Mrays/s cornell-box @{res}x{res} "
                  f"({jax.devices()[0].platform}/{engine})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
