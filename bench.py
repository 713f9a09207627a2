"""Benchmark: Mrays/s on cornell-box @ 1024x1024 (the BASELINE.md metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the 300 Mrays/s/chip north star (the reference
publishes no numbers of its own, BASELINE.md).

Outage resilience: the documented axon failure mode (CLAUDE.md — the
backend can be `UNAVAILABLE: TPU backend setup/compile error` for hours,
and jax.devices() itself blocks ~25 min retrying before raising; that
cost round 3 its official number, BENCH_r03.json rc=1) is handled by
running the measurement in a CHILD process and retrying with backoff in
the parent for up to RENE_BENCH_RETRY_S seconds (default 9000). If the
chip never returns, the parent emits the last successful result (cached
at docs/bench_last_good.json after every good run) with `"stale": true`
so the round still records a number. This mirrors the reference's
always-produces-a-number per-batch timing discipline
(rene/src/main.rs:1391-1396).

Env overrides: RENE_BENCH_RES (default 1024), RENE_BENCH_SAMPLES (timed
samples, default 8), RENE_BENCH_PLATFORM (force a jax platform),
RENE_BENCH_SCENE (pbrt path), RENE_BENCH_RETRY_S (total retry budget),
RENE_BENCH_ATTEMPT_S (per-attempt timeout, default 2700).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_MRAYS = 300.0
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "docs", "bench_last_good.json")


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
    # throughput metrics stay sampler-independent (apples-to-apples
    # across rounds): Sampler "sobol" costs ~30% Mrays/s for its
    # per-sample variance reduction (RENE_BENCH_SAMPLER overrides)
    scene.sampler = os.environ.get("RENE_BENCH_SAMPLER", "independent")
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
    result = {
        "metric": f"Mrays/s cornell-box @{res}x{res} "
                  f"({jax.devices()[0].platform}/{engine})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }

    # second metric: big-mesh cluster-march throughput (the round-2/3
    # optimization target regresses invisibly on cornell alone). Dragon
    # @320x180 marginal s/spp, TPU only (interpret mode would crawl).
    cl_path = os.environ.get(
        "RENE_BENCH_CLUSTER_SCENE",
        "/root/reference/sample_scenes/dragon/scene.pbrt")
    if (os.environ.get("RENE_BENCH_CLUSTER", "1") != "0"
            and jax.devices()[0].platform == "tpu"
            and os.path.exists(cl_path)):
        try:
            from rene_tpu.integrators.pallas_path import \
                make_pallas_batch_fn
            cscene = load_scene(cl_path)
            cscene.sampler = os.environ.get("RENE_BENCH_SAMPLER",
                                            "independent")
            cscene.set_film_resolution(320, 180)
            cbn, cconfig = build_device_scene(cscene)
            crun = make_pallas_batch_fn(cbn, cconfig)
            if crun is not None:
                # packed runners (spp_mult = pack > 1) count PER-LANE
                # samples; the metric stays s per DELIVERED spp
                mult = getattr(crun, "spp_mult", 1)
                k1, k2 = 2, 6
                # warm BOTH chunk sizes (each num_samples is its own jit)
                np.asarray(crun(0, k1)["radiance"])
                np.asarray(crun(0, k2)["radiance"])
                t0 = time.time()
                float(crun(1, k1)["rays"])
                t1 = time.time()
                float(crun(2, k2)["rays"])
                t2 = time.time()
                marginal = ((t2 - t1) - (t1 - t0)) / ((k2 - k1) * mult)
                result["extra"] = {
                    "metric": "s/spp dragon @320x180 (pallas cluster, "
                              "marginal)",
                    "value": round(marginal, 4),
                    "unit": "s/spp",
                }
        except Exception as e:  # never break the primary metric
            result["extra"] = {"error": f"cluster bench failed: {e}"}

    # third metric: the wavefront engine on the deep cluster scene
    # (teapot) — the round-3 architecture win regresses invisibly
    # otherwise
    wv_path = os.environ.get(
        "RENE_BENCH_WAVE_SCENE",
        "/root/reference/sample_scenes/teapot/scene.pbrt")
    if (os.environ.get("RENE_BENCH_WAVE", "1") != "0"
            and jax.devices()[0].platform == "tpu"
            and os.path.exists(wv_path)):
        try:
            from rene_tpu.integrators.pallas_wave import (
                make_pallas_wave_fn)
            wscene = load_scene(wv_path)
            wscene.sampler = os.environ.get("RENE_BENCH_SAMPLER",
                                            "independent")
            wscene.set_film_resolution(320, 180)
            wbn, wconfig = build_device_scene(wscene)
            wrun = make_pallas_wave_fn(wbn, wconfig)
            if wrun is not None:
                n = wrun.samples_per_wave
                np.asarray(wrun(0, n)["radiance"])  # compile + warm
                t0 = time.time()
                float(wrun(1, n)["rays"])
                t1 = time.time()
                result["extra_wave"] = {
                    "metric": "s/spp teapot @320x180 (pallas wave)",
                    "value": round((t1 - t0) / n, 4),
                    "unit": "s/spp",
                }
        except Exception as e:
            result["extra_wave"] = {"error": f"wave bench failed: {e}"}

    line = json.dumps(result)
    print(line)
    try:  # refresh the stale-fallback cache on every good run
        os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
        with open(CACHE_PATH, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _supervise():
    """Retry the measurement in child processes until it emits a JSON
    line or the budget runs out; then fall back to the cached last-good
    result marked stale. Always exits 0 with exactly one JSON line on
    stdout unless there is neither a measurement nor a cache."""
    import subprocess

    budget = float(os.environ.get("RENE_BENCH_RETRY_S", "9000"))
    attempt_s = float(os.environ.get("RENE_BENCH_ATTEMPT_S", "2700"))
    deadline = time.time() + budget
    backoff = 60.0
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, text=True)
        # first attempt always gets a full window (even under a small
        # budget there must be one real try); later ones fit the budget
        tmo = attempt_s if attempt == 1 else min(
            attempt_s, max(remaining, 60.0))
        try:
            out, _ = proc.communicate(timeout=tmo)
        except subprocess.TimeoutExpired:
            # SIGTERM first (a SIGKILLed process leaves a stale device
            # claim for ~5-10 min, CLAUDE.md); escalate only if stuck
            proc.terminate()
            try:
                out, _ = proc.communicate(timeout=90)
            except subprocess.TimeoutExpired:
                proc.kill()
                out, _ = proc.communicate()
        for ln in (out or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                print(ln)
                return 0
        sys.stderr.write(f"bench attempt {attempt} failed "
                         f"(rc={proc.returncode}); "
                         f"{deadline - time.time():.0f}s left\n")
        if time.time() + backoff >= deadline:
            break
        time.sleep(backoff)
        backoff = min(backoff * 2, 600.0)
    try:
        with open(CACHE_PATH) as f:
            cached = json.loads(f.read())
    except (OSError, ValueError):
        sys.stderr.write("bench: no measurement and no cache\n")
        return 1
    cached["stale"] = True
    cached["stale_reason"] = ("TPU backend unavailable for the whole "
                              f"retry budget ({budget:.0f}s); value is "
                              "the last successful capture")
    print(json.dumps(cached))
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(_supervise())
