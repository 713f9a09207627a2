"""Wavefront volumetric path tracer (the reference's `volpath` integrator).

Port of main_ray_generation_volpath (rene-shader/src/lib.rs:477-803) plus the
`tr`/`tr_emit` transmittance marchers (lib.rs:359-468) to masked wavefront
form. Per bounce:

  1. closest-hit trace; miss -> background, retire;
  2. sample the current medium along the segment (per-channel distance
     sampling); throughput *= medium weight;
  3. medium interaction: phase-function NEE to distant lights through `tr`
     marching, emitter NEE through `tr_emit` (+ pdf trace against the
     emissive set), then Henyey–Greenstein scattering;
  4. surface interaction: like the `path` integrator but with
     transmittance-weighted NEE; `None`-material surfaces pass through;
     the medium index tracks interior/exterior crossings (lib.rs:775-779);
  5. no Russian roulette (disabled in the reference, lib.rs:787-799).

The transmittance marchers are bounded inner while_loops over the wavefront:
they advance through `None`-material boundaries switching media.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bsdf as B
from ..ops import intersect as I
from ..ops import math3d as m3
from ..ops import medium as MD
from ..ops import rng
from ..scene import types as T
from ..scene.device import RenderConfig
from .camera import generate_rays
from .common import background_radiance, sample_emit_object

TMIN = 1e-3
TMAX = 1e5
MAX_TR_MARCH = 32


def max_depth_for(config: RenderConfig) -> int:
    if config.max_depth_hint is not None:
        return max(int(config.max_depth_hint), 1)
    return 80  # reference lib.rs:499


def _tr_march(buffers, config, org, direction, med_idx, accel=None,
              want_emit=False):
    """tr / tr_emit (lib.rs:359-468): march transmittance through
    `None`-material boundaries. Returns the transmittance (tr) or the
    transmittance-weighted emitter radiance (tr_emit)."""
    n = org.shape[0]
    carry = {
        "org": org,
        "med": med_idx,
        "tr": jnp.ones((n, 3), jnp.float32),
        "out": jnp.zeros((n, 3), jnp.float32),
        "live": jnp.ones((n,), bool),
        "k": jnp.int32(0),
    }

    def cond(c):
        return jnp.any(c["live"]) & (c["k"] < MAX_TR_MARCH)

    def body(c):
        hit = I.trace(buffers, config, c["org"], direction, TMIN, TMAX,
                      accel=accel)
        live = c["live"]
        inst = hit["inst"]
        mat_none = buffers["mat_type"][
            buffers["inst_material"][inst]] == T.MAT_NONE
        al_idx = buffers["inst_area_light"][inst]
        is_emitter = buffers["area_type"][al_idx] != T.AREA_NULL

        out = c["out"]
        if want_emit:
            # break tr * emit(-dir, normal) on the first emitter hit
            wo = -m3.normalize(direction)
            nrm = m3.normalize(hit["normal"])
            emit = jnp.where((m3.dot(wo, nrm) > 0.0)[:, None],
                             buffers["area_color"][al_idx], 0.0)
            take = live & hit["hit"] & is_emitter
            out = out + jnp.where(take[:, None], c["tr"] * emit, 0.0)
            stop = ~hit["hit"] | is_emitter | (~is_emitter & ~mat_none)
        else:
            # break tr on miss; break 0 on a real material
            take = live & ~hit["hit"]
            out = out + jnp.where(take[:, None], c["tr"], 0.0)
            stop = ~hit["hit"] | ~mat_none

        # march through a None-material boundary
        seg_tr = MD.med_tr(buffers, c["med"], direction, hit["t"])
        new_tr = jnp.where((live & ~stop)[:, None], c["tr"] * seg_tr,
                           c["tr"])
        crossing_out = m3.dot(direction, hit["normal"]) > 0.0
        new_med = jnp.where(
            live & ~stop,
            jnp.where(crossing_out, buffers["inst_exterior"][inst],
                      buffers["inst_interior"][inst]),
            c["med"])
        new_org = jnp.where((live & ~stop)[:, None], hit["position"],
                            c["org"])
        return {
            "org": new_org,
            "med": new_med,
            "tr": new_tr,
            "out": out,
            "live": live & ~stop,
            "k": c["k"] + 1,
        }

    out = jax.lax.while_loop(cond, body, carry)
    return out["out"]


def render_sample(buffers, config: RenderConfig, px, py, seed, accel=None):
    return render_batch(buffers, config, px, py, seed, 1, accel=accel)


def render_batch(buffers, config: RenderConfig, px, py, seed, num_samples,
                 accel=None):
    """volpath with path regeneration (see path.render_batch): each lane
    streams `num_samples` samples of its own pixel; returns summed outputs.
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
        "state": state,
        "org": org,
        "dir": direction,
        "color": jnp.ones((n, 3), jnp.float32),
        "depth": jnp.zeros((n,), jnp.int32),
        "sample": jnp.zeros((n,), jnp.int32),
        "radiance": jnp.zeros((n, 3), jnp.float32),
        "med": jnp.zeros((n,), jnp.int32),
        "aov_normal": jnp.zeros((n, 3), jnp.float32),
        "aov_albedo": jnp.zeros((n, 3), jnp.float32),
        "rays": jnp.zeros((), jnp.float32),
    }

    def cond(c):
        return jnp.any(c["sample"] < num_samples)

    def body(c):
        state = c["state"]
        alive = c["sample"] < num_samples
        color = c["color"]
        radiance = c["radiance"]
        med = c["med"]
        depth = c["depth"]

        rays = c["rays"] + jnp.sum(alive.astype(jnp.float32)) \
            * (1.0 + config.num_lights + (1.0 if num_emit > 0 else 0.0))

        hit = I.trace(buffers, config, c["org"], c["dir"], TMIN, TMAX,
                      accel=accel)
        bg = background_radiance(buffers, c["dir"])
        miss = alive & ~hit["hit"]
        radiance = radiance + jnp.where(miss[:, None], color * bg, 0.0)
        alive = alive & hit["hit"]

        wo = -m3.normalize(c["dir"])
        normal = m3.normalize(hit["normal"])
        position = hit["position"]
        uv = hit["uv"]
        inst = hit["inst"]
        mat_idx = buffers["inst_material"][inst]
        al_idx = buffers["inst_area_light"][inst]
        mat_none = buffers["mat_type"][mat_idx] == T.MAT_NONE

        # -- medium sampling along the segment (lib.rs:561-565)
        sampled, mpos, mtr, state = MD.med_sample(
            buffers, med, c["org"], c["dir"], hit["t"], state)
        sampled = sampled & alive
        color = jnp.where(alive[:, None], color * mtr, color)

        # =================== medium interaction ===================
        # NEE to distant lights through transmittance (lib.rs:570-597)
        for li in range(config.num_lights):
            ldir = buffers["light_dir"][li]
            lcol = buffers["light_color"][li]
            wi_l = jnp.broadcast_to(ldir, position.shape)
            trv = _tr_march(buffers, config, mpos, wi_l, med, accel=accel)
            phase = MD.med_phase(buffers, med, wo, wi_l)
            radiance = radiance + jnp.where(
                sampled[:, None],
                color * trv * phase[:, None] * lcol, 0.0)

        m_dir, state = MD.med_sample_p(buffers, med, wo, state)
        if num_emit > 0:
            # emitter NEE through tr_emit (lib.rs:599-654)
            ls_wi, state = sample_emit_object(buffers, config, mpos, state)
            epdf = I.trace_emissive_pdf(buffers, config, mpos, ls_wi,
                                        TMIN, TMAX, accel=accel) / num_emit
            tr_e = _tr_march(buffers, config, mpos, ls_wi, med,
                             accel=accel, want_emit=True)
            phase_e = MD.med_phase(buffers, med, wo, ls_wi)
            radiance = radiance + jnp.where(
                (sampled & (epdf > 1e-5))[:, None],
                color * tr_e * phase_e[:, None]
                / jnp.maximum(epdf, 1e-5)[:, None], 0.0)

        # =================== surface interaction ===================
        surf = alive & ~sampled
        onb = m3.onb_from_w(normal)
        lobes = B.compute_bsdf(buffers, mat_idx, uv, config)

        al_color = buffers["area_color"][al_idx]
        al_on = (buffers["area_type"][al_idx] != T.AREA_NULL) \
            & (m3.dot(wo, normal) > 0.0)
        radiance = radiance + jnp.where((surf & al_on)[:, None],
                                        color * al_color, 0.0)

        first = surf & (depth == 0)
        albedo = B.material_albedo(buffers, mat_idx, uv, config)
        aov_normal = c["aov_normal"] + jnp.where(first[:, None], normal, 0.0)
        aov_albedo = c["aov_albedo"] + jnp.where(first[:, None], albedo, 0.0)

        surf_scatter = surf & ~mat_none
        for li in range(config.num_lights):
            ldir = buffers["light_dir"][li]
            lcol = buffers["light_color"][li]
            wi_l = jnp.broadcast_to(ldir, position.shape)
            trv = _tr_march(buffers, config, position, wi_l, med,
                            accel=accel)
            f_l = B.bsdf_f(lobes, onb, normal, wo, wi_l, config)
            radiance = radiance + jnp.where(
                surf_scatter[:, None],
                color * trv * f_l
                * jnp.abs(m3.dot(wi_l, normal))[:, None] * lcol, 0.0)

        swi, sf, spdf, state = B.bsdf_sample_f(lobes, onb, wo, state, config)
        if num_emit > 0:
            coin, state = rng.next_f32(state)
            ls_wi, state = sample_emit_object(buffers, config, position,
                                              state)
            take_light = coin > 0.5
            use_mis = B.bsdf_contains(lobes, T.KIND_DIFFUSE)
            wi_s = jnp.where((use_mis & take_light)[:, None], ls_wi, swi)
            f_s = jnp.where((use_mis & take_light)[:, None],
                            B.bsdf_f(lobes, onb, normal, wo, ls_wi, config), sf)
            pdf_b = jnp.where(use_mis & take_light,
                              B.bsdf_pdf(lobes, onb, wo, ls_wi, config), spdf)
            light_pdf = I.trace_emissive_pdf(
                buffers, config, position, wi_s, TMIN, TMAX,
                accel=accel) / num_emit
            pdf_s = jnp.where(use_mis, 0.5 * pdf_b + 0.5 * light_pdf, spdf)
            f_s = jnp.where(use_mis[:, None], f_s, sf)
            wi_s = jnp.where(use_mis[:, None], wi_s, swi)
        else:
            wi_s, f_s, pdf_s = swi, sf, spdf

        surf_color = color * f_s * jnp.abs(m3.dot(normal, wi_s))[:, None] \
            / jnp.maximum(pdf_s, 1e-20)[:, None]

        # -- select next ray per lane kind
        new_org = jnp.where(sampled[:, None], mpos,
                            jnp.where(surf[:, None], position, c["org"]))
        new_dir = jnp.where(sampled[:, None], m_dir,
                            jnp.where(surf_scatter[:, None], wi_s, c["dir"]))
        color = jnp.where(surf_scatter[:, None], surf_color, color)
        alive = alive & (sampled | (surf & (mat_none | (pdf_s >= 1e-5))))

        # medium interface crossing at surfaces (lib.rs:775-779)
        crossing_out = m3.dot(wo, normal) < 0.0
        new_med = jnp.where(
            surf,
            jnp.where(crossing_out, buffers["inst_exterior"][inst],
                      buffers["inst_interior"][inst]),
            med)

        alive = alive & jnp.any(color != 0.0, axis=-1)

        depth = depth + 1
        alive = alive & (depth < max_depth)

        # -- regeneration: terminated lanes start their next sample
        active = c["sample"] < num_samples
        finished = active & ~alive
        sample = c["sample"] + finished.astype(jnp.int32)
        regen = finished & (sample < num_samples)
        cam_org, cam_dir, state = generate_rays(buffers, config, px, py,
                                                state)
        out_org = jnp.where(regen[:, None], cam_org,
                            jnp.where(alive[:, None], new_org, c["org"]))
        out_dir = jnp.where(regen[:, None], cam_dir,
                            jnp.where(alive[:, None], new_dir, c["dir"]))
        out_color = jnp.where(regen[:, None], 1.0,
                              jnp.where(alive[:, None], color, c["color"]))
        out_depth = jnp.where(regen, 0, jnp.where(alive, depth, c["depth"]))
        out_med = jnp.where(regen, 0, jnp.where(alive, new_med, med))

        return {
            "state": state,
            "org": out_org,
            "dir": out_dir,
            "color": out_color,
            "depth": out_depth,
            "sample": sample,
            "radiance": radiance,
            "med": out_med,
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
