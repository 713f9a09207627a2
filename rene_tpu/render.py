"""Top-level render driver: sample batching, tiling, timing, checkpointing.

Replaces the reference's render loop (rene/src/main.rs:1301-1402): N_SAMPLES
batches of full-frame traces with per-batch timing logs. TPU-first changes:
the sample loop is a host loop over a jit-compiled per-sample wavefront
kernel; large films are split into ray tiles to bound device memory; the
accumulated film is a host array and can be checkpointed/resumed per batch
(the reference's VRAM-only film loses all samples on a crash,
SURVEY.md §5).
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Callable, Optional

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from .scene.device import RenderConfig, build_device_scene
from .scene.flatten import FlatScene
from .utils.film import rays_to_image

log = logging.getLogger("rene_tpu.render")

DEFAULT_SPP = 5000  # reference N_SAMPLES, main.rs:80
LOG_EVERY = 100     # reference N_SAMPLES_ITER, main.rs:81


def _wave_default(buffers_np, config) -> bool:
    """auto-engine policy (measured, VALIDATION round 3): the wavefront
    engine wins on DEEP cluster scenes (teapot-class: 0.087 vs 0.168
    s/spp @320x180, 1.45 vs 2.22 @720p) where bounce-ray redistribution
    breaks the SIMT wall, and loses on shallow/miss-dominated ones
    (dragon-class: most paths die within 2 bounces, so the megakernel's
    in-kernel regeneration amortizes better than per-launch overheads).
    maxdepth >= 32 is the cheap prior separating the two on the corpus.
    Holds for volpath too (measured round 4, tpu_session_r4b V1:
    fog-teapot @320x180 wave 0.122 vs mega 0.207 s/spp).
    Override with RENE_WAVE=0/1."""
    ov = os.environ.get("RENE_WAVE")
    if ov is not None:
        return ov != "0"
    from .integrators.pallas_path import MAX_TRIS
    from .integrators.pallas_wave import wave_supported
    maxd = config.max_depth_hint if config.max_depth_hint else 50
    return (config.num_triangles > MAX_TRIS and maxd >= 32
            and wave_supported(buffers_np, config))


def _sample_fn(config: RenderConfig, accel=None):
    import jax

    if config.integrator == "volpath":
        from .integrators.volpath import render_sample
    else:
        from .integrators.path import render_sample

    @functools.partial(jax.jit, static_argnums=())
    def run(buffers, px, py, seed):
        return render_sample(buffers, config, px, py, seed, accel=accel)

    return run


def _batch_fn(config: RenderConfig, accel=None):
    """Jitted multi-sample kernel with path regeneration (path integrator);
    volpath falls back to one-sample calls per chunk."""
    import jax

    if config.integrator == "volpath":
        from .integrators.volpath import render_batch
    else:
        from .integrators.path import render_batch

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(buffers, px, py, seed, num_samples):
        return render_batch(buffers, config, px, py, seed, num_samples,
                            accel=accel)

    return run, LOG_EVERY


def warm_cache(scene: FlatScene, engine: str = "auto") -> int:
    """Pre-compile the scene's render kernels WITHOUT executing them,
    populating the persistent JAX compilation cache
    (JAX_COMPILATION_CACHE_DIR) so a later render process skips the
    multi-minute Mosaic compile. Returns the number of kernels compiled.

    Note: the per-process pallas program-load cost (~1-2 min the first
    time a kernel executes on the axon runtime) is NOT covered — only
    compilation is; a warm second process starts tracing in seconds.
    """
    import jax
    import jax.numpy as jnp

    buffers_np, config = build_device_scene(scene)
    n = 0
    on_tpu = jax.devices()[0].platform == "tpu"
    pallas_run = None
    if engine in ("auto", "pallas") and (on_tpu or engine == "pallas"):
        from .integrators.pallas_path import make_pallas_batch_fn
        pallas_run = make_pallas_batch_fn(buffers_np, config,
                                          interpret=not on_tpu)
    if pallas_run is not None:
        chunk = min(LOG_EVERY, getattr(pallas_run, "chunk_hint",
                                       LOG_EVERY))
        for c in {chunk, 1}:
            log.info("compiling pallas kernel (chunk=%d)...", c)
            pallas_run.lower(0, c).compile()
            n += 1
        return n
    # XLA wavefront fallback: compile the driver's batch shape
    from .ops.accel import make_accel
    from .scene.device import to_jax
    accel = make_accel(buffers_np, config)
    run, max_chunk = _batch_fn(config, accel=accel)
    buffers = to_jax(buffers_np)
    npix = config.film.xresolution * config.film.yresolution
    t = min(1 << 18, npix)
    px = jnp.zeros((t,), jnp.int32)
    py = jnp.zeros((t,), jnp.int32)
    log.info("compiling XLA wavefront kernel (%d rays)...", t)
    run.lower(buffers, px, py, jnp.uint32(0), max_chunk).compile()
    return 1


def render(scene: FlatScene, spp: int = DEFAULT_SPP,
           seed: int = 0, tile_rays: int = 1 << 18,
           checkpoint: Optional[str] = None,
           resume: bool = False,
           progress: Optional[Callable[[int, int, float], None]] = None,
           use_bvh: Optional[bool] = None,
           engine: str = "auto",
           want_var: bool = False):
    """Render a scene; returns dict of (H,W,3) float32 arrays:
    color (averaged), normal, albedo. want_var additionally returns
    "varmean" — the per-pixel variance of the color MEAN estimated from
    the spread of per-chunk means (no extra device work; used by the
    denoiser's convergence-aware blend so denoising can never degrade a
    converged render).

    engine: "auto" uses the Pallas megakernel on TPU for eligible scenes,
    "pallas" forces it (errors if ineligible), "xla" forces the wavefront
    XLA pipeline.
    """
    import jax
    import jax.numpy as jnp

    from .scene.device import to_jax

    buffers_np, config = build_device_scene(scene)
    buffers = to_jax(buffers_np)

    pallas_run = None
    engine_name = "pallas"
    if engine in ("auto", "pallas", "wave"):
        on_tpu = jax.devices()[0].platform == "tpu"
        if engine == "wave" or (engine == "auto" and on_tpu
                                and _wave_default(buffers_np, config)):
            from .integrators.pallas_wave import make_pallas_wave_fn
            pallas_run = make_pallas_wave_fn(buffers_np, config,
                                             interpret=not on_tpu,
                                             spp_hint=spp)
            engine_name = "pallas wavefront"
            if pallas_run is None and engine == "wave":
                raise ValueError("scene not eligible for the wave engine")
        if pallas_run is None and (on_tpu or engine == "pallas"):
            from .integrators.pallas_path import make_pallas_batch_fn
            pallas_run = make_pallas_batch_fn(buffers_np, config,
                                              interpret=not on_tpu)
            engine_name = "pallas megakernel"
            if pallas_run is None and engine == "pallas":
                raise ValueError("scene not eligible for the pallas engine")
    fingerprint = ""
    if checkpoint:
        # fingerprint on the *resolved* engine: pallas/XLA sample streams
        # are not mutually resumable
        from .utils.checkpoint import scene_fingerprint
        fingerprint = scene_fingerprint(
            buffers_np, config, seed,
            "pallas" if pallas_run is not None else "xla")

    if pallas_run is not None:
        log.info("engine: %s", engine_name)
        try:
            return _render_pallas(pallas_run, config, spp, seed,
                                  checkpoint, resume, progress,
                                  fingerprint, want_var=want_var)
        except Exception:
            if engine != "auto" or engine_name != "pallas wavefront":
                raise
            # auto-selected wave engine failed (e.g. a Mosaic lowering
            # regression): restart on the megakernel rather than losing
            # the render; the exception is logged in full
            log.exception("wave engine failed; falling back to the "
                          "megakernel")
            from .integrators.pallas_path import make_pallas_batch_fn
            pallas_run = make_pallas_batch_fn(buffers_np, config,
                                              interpret=not on_tpu)
            if pallas_run is None:
                raise
            return _render_pallas(pallas_run, config, spp, seed,
                                  checkpoint, resume, progress,
                                  fingerprint, want_var=want_var)

    from .ops.accel import make_accel
    force = {None: None, True: "bvh", False: None}[use_bvh]
    accel = make_accel(buffers_np, config, force=force)
    from .ops.bvh import BVH
    xla_max_chunk = LOG_EVERY
    if isinstance(accel.main, BVH):
        # bound the traversal working set and per-call device time — the
        # runtime watchdog kills executions that run for minutes
        tile_rays = min(tile_rays, 1 << 14)
        xla_max_chunk = 4

    w = config.film.xresolution
    h = config.film.yresolution
    n = w * h
    ys, xs = np.mgrid[0:h, 0:w]
    px_all = jnp.asarray(xs.reshape(-1).astype(np.int32))
    py_all = jnp.asarray(ys.reshape(-1).astype(np.int32))

    run, max_chunk = _batch_fn(config, accel=accel)
    max_chunk = min(max_chunk, xla_max_chunk)
    if want_var:  # >=2 chunks so the chunk-mean spread is measurable
        max_chunk = max(1, min(max_chunk, spp // 2))

    accum = {
        "radiance": np.zeros((n, 3), np.float32),
        "normal": np.zeros((n, 3), np.float32),
        "albedo": np.zeros((n, 3), np.float32),
    }
    start_sample = 0
    if checkpoint and resume:
        from .utils.checkpoint import load_checkpoint
        loaded = load_checkpoint(checkpoint, fingerprint)
        if loaded is not None:
            accum, start_sample = loaded
            log.info("resumed from %s at sample %d", checkpoint, start_sample)

    host_rng = np.random.default_rng(seed)
    # consume the seeds of completed chunks when resuming
    consumed = 0
    while consumed < start_sample:
        host_rng.integers(0, 2 ** 32, dtype=np.uint32)
        consumed += min(max_chunk, start_sample - consumed)

    tiles = [(s, min(s + tile_rays, n)) for s in range(0, n, tile_rays)]
    sq_sum = np.zeros((n, 3), np.float32) if want_var else None
    n_chunks = 0
    total_rays = 0.0
    t_batch = time.time()
    t_start = time.time()
    done = start_sample
    while done < spp:
        chunk = min(max_chunk, spp - done)
        chunk_seed = np.uint32(host_rng.integers(0, 2 ** 32,
                                                 dtype=np.uint32))
        for lo, hi in tiles:
            out = run(buffers, px_all[lo:hi], py_all[lo:hi],
                      jnp.uint32(chunk_seed), chunk)
            for k in accum:
                accum[k][lo:hi] += np.asarray(out[k])
            if sq_sum is not None:
                xm = np.asarray(out["radiance"]) / chunk
                sq_sum[lo:hi] += chunk * xm * xm
            total_rays += float(out["rays"])
        done += chunk
        n_chunks += 1
        dt = (time.time() - t_batch) * 1000.0
        log.info("Samples: %d/%d (%.0f ms)", done, spp, dt)
        t_batch = time.time()
        if progress:
            progress(done, spp, dt)
        if checkpoint:
            from .utils.checkpoint import save_checkpoint
            save_checkpoint(checkpoint, accum, done, fingerprint)

    color = accum["radiance"] / max(spp, 1)
    normal = accum["normal"] / max(spp, 1)
    albedo = accum["albedo"] / max(spp, 1)
    result = {
        "color": rays_to_image(color, w, h),
        "normal": rays_to_image(normal, w, h),
        "albedo": rays_to_image(albedo, w, h),
        "config": config,
        "total_rays": total_rays,
        "wall_time": time.time() - t_start,
    }
    if sq_sum is not None:
        result["varmean"] = rays_to_image(
            _var_of_mean(accum["radiance"], sq_sum, spp, n_chunks), w, h)
    return result


def _var_of_mean(sum_x, sq_sum, n_total, n_chunks):
    """Per-pixel variance of the color mean from per-chunk means.

    sum_x = sum of per-sample radiance, sq_sum = sum over chunks of
    n_i * mean_i^2. Unequal-chunk weighted spread, divided once more by
    n_total: Var[mean] ~= (sq_sum - n*mean^2) / ((k-1) * n). One chunk
    -> no estimate (returns +inf so the blend keeps the denoiser)."""
    n_total = max(n_total, 1)
    mean = sum_x / n_total
    if n_chunks < 2:
        return np.full_like(sum_x, np.inf)
    spread = np.maximum(sq_sum - n_total * mean * mean, 0.0)
    return spread / ((n_chunks - 1) * n_total)


def _render_pallas(run, config, spp, seed, checkpoint, resume, progress,
                   fingerprint="", want_var=False):
    """Driver loop for the pallas full-frame megakernel."""
    w = config.film.xresolution
    h = config.film.yresolution
    n = w * h
    accum = {
        "radiance": np.zeros((n, 3), np.float32),
        "normal": np.zeros((n, 3), np.float32),
        "albedo": np.zeros((n, 3), np.float32),
    }
    start_sample = 0
    if checkpoint and resume:
        from .utils.checkpoint import load_checkpoint
        loaded = load_checkpoint(checkpoint, fingerprint)
        if loaded is not None:
            accum, start_sample = loaded
            log.info("resumed from %s at sample %d", checkpoint,
                     start_sample)

    # cluster scenes cap samples per device call (watchdog; see
    # make_pallas_batch_fn.chunk_hint). chunk_hint and run() count
    # PER-LANE samples; a packed runner (spp_mult = pack > 1) delivers
    # chunk * spp_mult samples per pixel per call
    max_chunk = min(LOG_EVERY, getattr(run, "chunk_hint", LOG_EVERY))
    mult = getattr(run, "spp_mult", 1)
    if want_var:  # >=2 chunks so the chunk-mean spread is measurable
        max_chunk = max(1, min(max_chunk, spp // (2 * mult)))
    host_rng = np.random.default_rng(seed)
    consumed = 0
    while consumed < start_sample:
        host_rng.integers(0, 2 ** 31, dtype=np.int32)
        consumed += min(max_chunk * mult, start_sample - consumed)

    total_rays = 0.0
    t_start = time.time()
    t_batch = time.time()
    done = start_sample
    # wave runners accumulate the film ON DEVICE across chunks and read
    # back once (per-chunk readback costs ~0.3-0.6 s over the dev
    # tunnel at 720p); checkpointing needs host sums every chunk, so it
    # keeps the per-chunk path
    dev_accum = (getattr(run, "run_dev", None)
                 if not checkpoint and start_sample == 0
                 and not want_var else None)
    acc = None
    sq_sum = np.zeros((n, 3), np.float32) if want_var else None
    n_chunks = 0
    while done < spp:
        # per-lane chunk; a packed runner may overshoot spp by < mult
        # (the final average divides by the samples actually delivered)
        chunk = min(max_chunk, -(-(spp - done) // mult))
        chunk_seed = int(host_rng.integers(0, 2 ** 31, dtype=np.int32))
        if dev_accum is not None:
            acc = dev_accum(chunk_seed, chunk, acc)
            float(acc[1])  # scalar sync: keep per-chunk timing honest
        else:
            out = run(chunk_seed, chunk)
            for k in accum:
                accum[k] += np.asarray(out[k])
            if sq_sum is not None:
                xm = np.asarray(out["radiance"]) / (chunk * mult)
                sq_sum += (chunk * mult) * xm * xm
            total_rays += float(out["rays"])
        done += chunk * mult
        n_chunks += 1
        dt = (time.time() - t_batch) * 1000.0
        log.info("Samples: %d/%d (%.0f ms)", done, spp, dt)
        t_batch = time.time()
        if progress:
            progress(done, spp, dt)
        if checkpoint:
            from .utils.checkpoint import save_checkpoint
            save_checkpoint(checkpoint, accum, done, fingerprint)
    if acc is not None:
        out = run.read_back(acc)
        for k in accum:
            accum[k] += out[k]
        total_rays += out["rays"]

    result = {
        "color": rays_to_image(accum["radiance"] / max(done, 1), w, h),
        "normal": rays_to_image(accum["normal"] / max(done, 1), w, h),
        "albedo": rays_to_image(accum["albedo"] / max(done, 1), w, h),
        "config": config,
        "total_rays": total_rays,
        "wall_time": time.time() - t_start,
    }
    if sq_sum is not None:
        result["varmean"] = rays_to_image(
            _var_of_mean(accum["radiance"], sq_sum, done, n_chunks),
            w, h)
    return result
