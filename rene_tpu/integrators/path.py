"""Wavefront surface path tracer (the reference's `path` integrator).

Port of main_ray_generation_path (rene-shader/src/lib.rs:141-357) to a
lane-per-ray wavefront: the recursive megakernel's bounce loop becomes a
`lax.while_loop` over the whole ray batch with an `alive` mask — masked lanes
replace warp divergence. Per bounce, matching the reference exactly:

  1. closest-hit trace; on miss add background radiance and retire the lane;
  2. fetch instance tables, build the BSDF lobe stack, add one-sided emitter
     radiance, write normal/albedo AOVs at depth 0;
  3. next-event estimation toward every distant light (shadow trace);
  4. if emitters exist and the BSDF has a diffuse lobe: 50/50 mixture of
     emitter-surface sampling and BSDF sampling, with the light pdf computed
     by a dedicated trace against the emissive-only set and mixed
     0.5/0.5 (lib.rs:274-324); else plain BSDF sampling;
  5. kill on zero throughput / tiny pdf; Russian roulette after depth 12.

Deviations (documented):
* the mixture's BSDF pdf is evaluated as pdf(wo, wi) — the reference calls
  `bsdf.pdf(wi, normal)` (lib.rs:287), an approximation;
* Russian roulette continue probability is clamped to <=1 (the reference
  divides by an unclamped max component, lib.rs:344-354, which is biased);
* every lane uses its own RNG stream — the reference's frame-wide RNG exists
  only to reduce warp divergence, which masked lanes don't suffer from;
* pbrt `maxdepth` is honored when present (the reference parses but ignores
  it, hardcoding 50).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bsdf as B
from ..ops import intersect as I
from ..ops import math3d as m3
from ..ops import rng
from ..scene import types as T
from ..scene.device import RenderConfig
from .camera import generate_rays
from .common import background_radiance, sample_emit_object

TMIN = 1e-3
TMAX = 1e5
RR_START = 12


def max_depth_for(config: RenderConfig) -> int:
    if config.max_depth_hint is not None:
        return max(int(config.max_depth_hint), 1)
    return 50  # reference lib.rs:192


def render_batch(buffers, config: RenderConfig, px, py, seed, num_samples,
                 accel=None):
    """Trace `num_samples` samples per pixel with path regeneration.

    TPU-native persistent-lane design: each lane owns one pixel and streams
    its samples back-to-back — when a path terminates, the lane immediately
    starts the pixel's next sample (fresh camera ray, depth 0) instead of
    idling until the whole wavefront drains. This removes the dead-lane tail
    that dominates a naive bounce loop (with Russian roulette a 1M-lane
    wavefront runs ~60 near-empty iterations per sample; regenerated lanes
    stay ~100% utilized). Because a lane's pixel never changes, radiance
    accumulates in registers — no film scatter.

    Returns summed (not averaged) radiance/normal/albedo over the samples.
    """
    n = px.shape[0]
    w = config.film.xresolution
    pix_index = (py.astype(jnp.uint32) * jnp.uint32(w)
                 + px.astype(jnp.uint32))
    state = rng.pcg_init(pix_index ^ jnp.uint32(seed))

    org, direction, state = generate_rays(buffers, config, px, py, state)

    max_depth = max_depth_for(config)
    num_emit = config.num_emit_objects
    use_rr = max_depth > RR_START + 1

    carry = {
        "state": state,
        "org": org,
        "dir": direction,
        "color": jnp.ones((n, 3), jnp.float32),
        "depth": jnp.zeros((n,), jnp.int32),
        "sample": jnp.zeros((n,), jnp.int32),  # index of the running sample
        "radiance": jnp.zeros((n, 3), jnp.float32),
        "aov_normal": jnp.zeros((n, 3), jnp.float32),
        "aov_albedo": jnp.zeros((n, 3), jnp.float32),
        "rays": jnp.zeros((), jnp.float32),
    }

    def cond(c):
        return jnp.any(c["sample"] < num_samples)

    def body(c):
        state = c["state"]
        active = c["sample"] < num_samples
        color = c["color"]
        radiance = c["radiance"]
        depth = c["depth"]
        rays = c["rays"] + jnp.sum(active.astype(jnp.float32)) \
            * (1.0 + config.num_lights + (1.0 if num_emit > 0 else 0.0))

        hit = I.trace(buffers, config, c["org"], c["dir"], TMIN, TMAX,
                      accel=accel)

        # -- miss: background (lib.rs:209-211)
        bg = background_radiance(buffers, c["dir"], config)
        miss = active & ~hit["hit"]
        radiance = radiance + jnp.where(miss[:, None], color * bg, 0.0)
        path_alive = active & hit["hit"]

        # -- surface setup
        wo = -m3.normalize(c["dir"])
        normal = m3.normalize(hit["normal"])
        position = hit["position"]
        uv = hit["uv"]
        inst = hit["inst"]
        mat_idx = buffers["inst_material"][inst]
        al_idx = buffers["inst_area_light"][inst]

        onb = m3.onb_from_w(normal)
        lobes = B.compute_bsdf(buffers, mat_idx, uv, config)

        # -- emitter hit (one-sided)
        al_color = buffers["area_color"][al_idx]
        al_on = (buffers["area_type"][al_idx] != T.AREA_NULL) \
            & (m3.dot(wo, normal) > 0.0)
        radiance = radiance + jnp.where(
            (path_alive & al_on)[:, None], color * al_color, 0.0)

        # -- AOVs at per-path depth 0, accumulated over samples
        first = path_alive & (depth == 0)
        albedo = B.material_albedo(buffers, mat_idx, uv, config)
        aov_normal = c["aov_normal"] + jnp.where(first[:, None], normal, 0.0)
        aov_albedo = c["aov_albedo"] + jnp.where(first[:, None], albedo, 0.0)

        # -- NEE for distant lights
        for li in range(config.num_lights):
            ldir = buffers["light_dir"][li]
            lcol = buffers["light_color"][li]
            wi_l = jnp.broadcast_to(ldir, position.shape)
            shadowed = I.occluded(buffers, config, position, wi_l, TMIN,
                                  TMAX, accel=accel)
            f_l = B.bsdf_f(lobes, onb, normal, wo, wi_l, config)
            contrib = (color * f_l
                       * jnp.abs(m3.dot(wi_l, normal))[:, None] * lcol)
            radiance = radiance + jnp.where(
                (path_alive & ~shadowed)[:, None], contrib, 0.0)

        # -- scatter: MIS mixture or plain BSDF sampling
        swi, sf, spdf, state = B.bsdf_sample_f(lobes, onb, wo, state, config)
        if num_emit > 0:
            coin, state = rng.next_f32(state)
            ls_wi, state = sample_emit_object(buffers, config, position,
                                              state)
            take_light = coin > 0.5
            use_mis = B.bsdf_contains(lobes, T.KIND_DIFFUSE)
            wi = jnp.where((use_mis & take_light)[:, None], ls_wi, swi)
            f = jnp.where((use_mis & take_light)[:, None],
                          B.bsdf_f(lobes, onb, normal, wo, ls_wi, config),
                          sf)
            pdf_b = jnp.where(use_mis & take_light,
                              B.bsdf_pdf(lobes, onb, wo, ls_wi, config),
                              spdf)
            light_pdf = I.trace_emissive_pdf(
                buffers, config, position, wi, TMIN, TMAX,
                accel=accel) / num_emit
            pdf = jnp.where(use_mis, 0.5 * pdf_b + 0.5 * light_pdf, spdf)
            f = jnp.where(use_mis[:, None], f, sf)
            wi = jnp.where(use_mis[:, None], wi, swi)
        else:
            wi, f, pdf = swi, sf, spdf

        path_alive = path_alive & (pdf >= 1e-5)
        color = color * f * jnp.abs(m3.dot(normal, wi))[:, None] \
            / jnp.maximum(pdf, 1e-20)[:, None]
        path_alive = path_alive & jnp.any(color != 0.0, axis=-1)

        # -- Russian roulette (per-lane depth)
        if use_rr:
            rr, state = rng.next_f32(state)
            p_cont = jnp.clip(jnp.max(color, axis=-1), 0.0, 1.0)
            do_rr = depth > RR_START
            path_alive = path_alive & (~do_rr | (rr <= p_cont))
            color = jnp.where((do_rr & path_alive)[:, None],
                              color / jnp.maximum(p_cont, 1e-20)[:, None],
                              color)

        depth = depth + 1
        path_alive = path_alive & (depth < max_depth)

        # -- regeneration: terminated lanes start their next sample
        finished = active & ~path_alive
        sample = c["sample"] + finished.astype(jnp.int32)
        still_active = sample < num_samples
        regen = finished & still_active
        cam_org, cam_dir, state = generate_rays(buffers, config, px, py,
                                                state)
        new_org = jnp.where(regen[:, None], cam_org,
                            jnp.where(path_alive[:, None], position,
                                      c["org"]))
        new_dir = jnp.where(regen[:, None], cam_dir,
                            jnp.where(path_alive[:, None], wi, c["dir"]))
        color = jnp.where(regen[:, None], 1.0,
                          jnp.where(path_alive[:, None], color, c["color"]))
        depth = jnp.where(regen, 0, jnp.where(path_alive, depth, c["depth"]))

        return {
            "state": state,
            "org": new_org,
            "dir": new_dir,
            "color": color,
            "depth": depth,
            "sample": sample,
            "radiance": radiance,
            "aov_normal": aov_normal,
            "aov_albedo": aov_albedo,
            "rays": rays,
        }

    out = jax.lax.while_loop(cond, body, carry)
    return {
        "radiance": out["radiance"],
        "normal": out["aov_normal"],
        "albedo": out["aov_albedo"],
        "rays": out["rays"],
    }


def render_sample(buffers, config: RenderConfig, px, py, seed, accel=None):
    """Trace one sample for rays at integer pixel coords (px, py).

    seed: uint32 scalar. Returns dict with radiance/normal/albedo (N,3).
    """
    n = px.shape[0]
    w = config.film.xresolution
    pix_index = (py.astype(jnp.uint32) * jnp.uint32(w)
                 + px.astype(jnp.uint32))
    state = rng.pcg_init(pix_index ^ jnp.uint32(seed))

    org, direction, state = generate_rays(buffers, config, px, py, state)

    max_depth = max_depth_for(config)
    num_emit = config.num_emit_objects

    carry = {
        "i": jnp.int32(0),
        "state": state,
        "org": org,
        "dir": direction,
        "color": jnp.ones((n, 3), jnp.float32),
        "radiance": jnp.zeros((n, 3), jnp.float32),
        "alive": jnp.ones((n,), bool),
        "aov_normal": jnp.zeros((n, 3), jnp.float32),
        "aov_albedo": jnp.zeros((n, 3), jnp.float32),
        "rays": jnp.zeros((), jnp.float32),
    }

    def cond(c):
        return (c["i"] < max_depth) & jnp.any(c["alive"])

    def body(c):
        state = c["state"]
        alive = c["alive"]
        color = c["color"]
        radiance = c["radiance"]
        n_alive = jnp.sum(alive.astype(jnp.float32))
        # rays traced this bounce: extension + per-light shadow + pdf ray
        rays = c["rays"] + n_alive * (1.0 + config.num_lights
                                      + (1.0 if num_emit > 0 else 0.0))

        hit = I.trace(buffers, config, c["org"], c["dir"], TMIN, TMAX,
                      accel=accel)

        # -- miss: background (lib.rs:209-211 + main_miss lib.rs:120-139)
        bg = background_radiance(buffers, c["dir"])
        miss = alive & ~hit["hit"]
        radiance = radiance + jnp.where(miss[:, None], color * bg, 0.0)
        alive = alive & hit["hit"]

        # -- surface setup (lib.rs:213-223)
        wo = -m3.normalize(c["dir"])
        normal = m3.normalize(hit["normal"])
        position = hit["position"]
        uv = hit["uv"]
        inst = hit["inst"]
        mat_idx = buffers["inst_material"][inst]
        al_idx = buffers["inst_area_light"][inst]

        onb = m3.onb_from_w(normal)
        lobes = B.compute_bsdf(buffers, mat_idx, uv, config)

        # -- emitter hit (lib.rs:225-227, area_light.rs:66-73 one-sided)
        al_color = buffers["area_color"][al_idx]
        al_on = (buffers["area_type"][al_idx] != T.AREA_NULL) \
            & (m3.dot(wo, normal) > 0.0)
        radiance = radiance + jnp.where(
            (alive & al_on)[:, None], color * al_color, 0.0)

        # -- AOVs at first bounce (lib.rs:229-232)
        first = alive & (c["i"] == 0)
        albedo = B.material_albedo(buffers, mat_idx, uv, config)
        aov_normal = jnp.where(first[:, None], normal, c["aov_normal"])
        aov_albedo = jnp.where(first[:, None], albedo, c["aov_albedo"])

        # -- NEE for distant lights (lib.rs:234-272)
        for li in range(config.num_lights):
            ldir = buffers["light_dir"][li]
            lcol = buffers["light_color"][li]
            wi_l = jnp.broadcast_to(ldir, position.shape)
            # ray_target: position + dir, tmax 1e5 (light.rs:53-55)
            shadowed = I.occluded(buffers, config, position, wi_l, TMIN,
                                  TMAX, accel=accel)
            f_l = B.bsdf_f(lobes, onb, normal, wo, wi_l, config)
            contrib = (color * f_l
                       * jnp.abs(m3.dot(wi_l, normal))[:, None] * lcol)
            radiance = radiance + jnp.where(
                (alive & ~shadowed)[:, None], contrib, 0.0)

        # -- scatter: MIS mixture or plain BSDF sampling
        swi, sf, spdf, state = B.bsdf_sample_f(lobes, onb, wo, state, config)

        if num_emit > 0:
            coin, state = rng.next_f32(state)
            ls_wi, state = sample_emit_object(buffers, config, position,
                                              state)
            take_light = coin > 0.5
            use_mis = B.bsdf_contains(lobes, T.KIND_DIFFUSE)

            wi = jnp.where((use_mis & take_light)[:, None], ls_wi, swi)
            f = jnp.where((use_mis & take_light)[:, None],
                          B.bsdf_f(lobes, onb, normal, wo, ls_wi, config), sf)
            pdf_b = jnp.where(use_mis & take_light,
                              B.bsdf_pdf(lobes, onb, wo, ls_wi, config), spdf)

            light_pdf = I.trace_emissive_pdf(
                buffers, config, position, wi, TMIN, TMAX,
                accel=accel) / num_emit
            pdf_mix = 0.5 * pdf_b + 0.5 * light_pdf

            pdf = jnp.where(use_mis, pdf_mix, spdf)
            f = jnp.where(use_mis[:, None], f, sf)
            wi = jnp.where(use_mis[:, None], wi, swi)
        else:
            wi, f, pdf = swi, sf, spdf

        alive = alive & (pdf >= 1e-5)
        color = color * f * jnp.abs(m3.dot(normal, wi))[:, None] \
            / jnp.maximum(pdf, 1e-20)[:, None]

        new_org = position
        new_dir = wi

        # -- zero-throughput kill (lib.rs:340-342)
        alive = alive & jnp.any(color != 0.0, axis=-1)

        # -- Russian roulette after depth 12 (lib.rs:344-354; clamped)
        if max_depth > RR_START + 1:
            rr, state = rng.next_f32(state)
            p_cont = jnp.clip(jnp.max(color, axis=-1), 0.0, 1.0)
            do_rr = c["i"] > RR_START
            alive = alive & (~do_rr | (rr <= p_cont))
            color = jnp.where((do_rr & alive)[:, None],
                              color / jnp.maximum(p_cont, 1e-20)[:, None],
                              color)

        return {
            "i": c["i"] + 1,
            "state": state,
            "org": jnp.where(alive[:, None], new_org, c["org"]),
            "dir": jnp.where(alive[:, None], new_dir, c["dir"]),
            "color": jnp.where(alive[:, None], color, c["color"]),
            "radiance": radiance,
            "alive": alive,
            "aov_normal": aov_normal,
            "aov_albedo": aov_albedo,
            "rays": rays,
        }

    out = jax.lax.while_loop(cond, body, carry)
    return {
        "radiance": out["radiance"],
        "normal": out["aov_normal"],
        "albedo": out["aov_albedo"],
        "rays": out["rays"],
    }
