"""Ray-scene intersection: Möller–Trumbore triangles + analytic spheres.

Replaces the reference's Vulkan fixed-function BVH traversal plus its
intersection/closest-hit shaders (rene-shader/src/lib.rs:805-952). Rays are
intersected wavefront-style: a lane per ray, triangles streamed in fixed-size
chunks with a `lax.scan` carrying the running closest hit (dense, branch-free
VPU work). For large meshes `rene_tpu.ops.bvh` narrows the candidate set
first; this module is the ground-truth intersector and the small-scene fast
path.

Hit records are SoA dicts:
  t (N,), hit (N,) bool, inst (N,) i32, kind (N,) i32 (0 tri / 1 sphere),
  prim (N,) i32 (global triangle id or sphere id),
  position/normal (N,3), uv (N,2)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import types as T
from . import math3d as m3

TRI_CHUNK = 512
BIG_T = jnp.float32(1e30)


def _pad_chunks(arr: np.ndarray, chunk: int, fill=0.0):
    n = arr.shape[0]
    pad = (-n) % chunk
    if pad:
        pad_block = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
        arr = jnp.concatenate([jnp.asarray(arr), pad_block], axis=0)
    return jnp.asarray(arr).reshape((-1, chunk) + tuple(arr.shape[1:]))


def moller_trumbore(org, direction, p0, p1, p2, tmin, tmax):
    """Batched ray/triangle test. org,dir: (N,3); p*: (N,C,3) or (C,3).

    Returns (t, u, v, hit) with barycentric weights (1-u-v, u, v) matching
    the Vulkan hit attribute convention (lib.rs:926).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    d = direction[..., None, :]
    o = org[..., None, :]
    pvec = m3.cross(d, e2)
    det = m3.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - p0
    u = m3.dot(tvec, pvec) * inv_det
    qvec = m3.cross(tvec, e1)
    v = m3.dot(d, qvec) * inv_det
    t = m3.dot(e2, qvec) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t >= tmin[..., None]) & (t <= tmax[..., None]))
    return t, u, v, hit


def intersect_triangles(org, direction, tmin, tmax, tri_p,
                        chunk=TRI_CHUNK):
    """Closest triangle hit over all triangles.

    Returns (t, prim_id) with t = BIG_T on miss. tri_p: (T,3,3) numpy/jnp.
    """
    ntri = tri_p.shape[0]
    chunk = min(chunk, max(int(ntri), 1))
    chunks = _pad_chunks(tri_p, chunk)  # (K, C, 3, 3)
    nchunks = chunks.shape[0]
    base_ids = jnp.arange(chunk, dtype=jnp.int32)

    def body(carry, xs):
        best_t, best_id = carry
        tri_chunk, chunk_idx = xs
        t, _, _, hit = moller_trumbore(
            org, direction, tri_chunk[None, :, 0], tri_chunk[None, :, 1],
            tri_chunk[None, :, 2], tmin, jnp.minimum(tmax, best_t))
        ids = chunk_idx * chunk + base_ids
        valid = hit & (ids[None, :] < ntri)
        t = jnp.where(valid, t, BIG_T)
        arg = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        closer = tbest < best_t
        best_id = jnp.where(closer, ids[arg], best_id)
        best_t = jnp.where(closer, tbest, best_t)
        return (best_t, best_id), None

    n = org.shape[0]
    init = (jnp.full((n,), BIG_T), jnp.full((n,), -1, jnp.int32))
    if nchunks == 1:
        (best_t, best_id), _ = body(init, (chunks[0], jnp.int32(0)))
        return best_t, best_id
    (best_t, best_id), _ = jax.lax.scan(
        body, init, (chunks, jnp.arange(nchunks, dtype=jnp.int32)))
    return best_t, best_id


def intersect_spheres(org, direction, tmin, tmax, w2o):
    """Closest analytic unit-sphere hit across instances.

    Port of sphere_intersection (lib.rs:805-839): transform the ray into each
    sphere's object space and solve the quadratic; prefers the near root.
    w2o: (S,3,4). Returns (t, sphere_id).
    """
    o = m3.affine_point(w2o[None, :], org[:, None, :])   # (N,S,3)
    d = m3.affine_vector(w2o[None, :], direction[:, None, :])
    a = m3.dot(d, d)
    half_b = m3.dot(o, d)
    c = m3.dot(o, o) - 1.0
    disc = half_b * half_b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, 1e-20)
    root0 = (-half_b - sq) * inv_a
    root1 = (-half_b + sq) * inv_a
    ok = disc >= 0.0
    r0ok = ok & (root0 >= tmin[:, None]) & (root0 <= tmax[:, None])
    r1ok = ok & (root1 >= tmin[:, None]) & (root1 <= tmax[:, None])
    t = jnp.where(r0ok, root0, jnp.where(r1ok, root1, BIG_T))
    best = jnp.argmin(t, axis=-1)
    tbest = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
    return tbest, best.astype(jnp.int32)


def _main_tri_intersect(buffers, config, org, direction, tminv, tmaxv,
                        accel, want_bary=False):
    """Dispatch the triangle closest-hit over the selected accelerator."""
    from .mxu_intersect import MXUIntersector
    n = org.shape[0]
    main = getattr(accel, "main", None)
    bu = bv = None
    if config.num_triangles <= 0:
        return (jnp.full((n,), BIG_T), jnp.zeros((n,), jnp.int32), bu, bv)
    if isinstance(main, MXUIntersector):
        if want_bary:
            tri_t, tri_id, bu, bv = main.intersect(org, direction, tminv,
                                                   tmaxv, want_bary=True)
        else:
            tri_t, tri_id = main.intersect(org, direction, tminv, tmaxv)
    elif main is not None:  # BVH
        tri_t, tri_id = main.intersect(org, direction, tminv, tmaxv)
    else:
        tri_t, tri_id = intersect_triangles(org, direction, tminv, tmaxv,
                                            buffers["tri_p"])
    return tri_t, tri_id, bu, bv


def trace(buffers, config, org, direction, tmin, tmax, accel=None):
    """Full closest-hit trace with shading attributes.

    Equivalent of tlas_main.trace_ray + the closest-hit shaders.
    """
    n = org.shape[0]
    tminv = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmaxv = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    tri_t, tri_id, bu, bv = _main_tri_intersect(
        buffers, config, org, direction, tminv, tmaxv, accel,
        want_bary=True)
    if config.num_spheres > 0:
        sph_t, sph_id = intersect_spheres(
            org, direction, tminv, tmaxv, buffers["sph_w2o"])
    else:
        sph_t = jnp.full((n,), BIG_T)
        sph_id = jnp.zeros((n,), jnp.int32)

    is_sphere = sph_t < tri_t
    t = jnp.minimum(tri_t, sph_t)
    hit = t < BIG_T

    # triangle shading attributes (lib.rs:892-952)
    tid = jnp.clip(tri_id, 0, max(config.num_triangles - 1, 0))
    tp = buffers["tri_p"][tid]
    tn = buffers["tri_n"][tid]
    tuv = buffers["tri_uv"][tid]
    if bu is None:
        # recompute barycentrics from the winning triangle (BVH/brute paths)
        _, u, v, _ = moller_trumbore(org, direction, tp[:, None, 0],
                                     tp[:, None, 1], tp[:, None, 2],
                                     tminv, jnp.full_like(tminv, 1e30))
        u = u[:, 0]
        v = v[:, 0]
    else:
        u, v = bu, bv
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    w0 = (1.0 - u - v)[:, None]
    tri_pos = w0 * tp[:, 0] + u[:, None] * tp[:, 1] + v[:, None] * tp[:, 2]
    tri_nrm = w0 * tn[:, 0] + u[:, None] * tn[:, 1] + v[:, None] * tn[:, 2]
    tri_uv_i = w0 * tuv[:, 0] + u[:, None] * tuv[:, 1] + v[:, None] * tuv[:, 2]
    tri_inst = buffers["tri_inst"][tid]

    # sphere shading attributes (lib.rs:852-881)
    sid = jnp.clip(sph_id, 0, max(config.num_spheres - 1, 0))
    w2o = buffers["sph_w2o"][sid]
    sph_pos = org + sph_t[:, None] * direction
    obj_pos = m3.affine_point(w2o, sph_pos)
    # normal = W2O^T @ obj_pos (transpose-multiply, lib.rs:874-878)
    sph_nrm = jnp.einsum("nij,ni->nj", w2o[:, :, :3], obj_pos)
    phi = jnp.arctan2(obj_pos[:, 1], obj_pos[:, 0])
    phi = jnp.where(phi < 0.0, phi + m3.TWO_PI, phi)
    theta = jnp.arccos(jnp.clip(obj_pos[:, 2], -1.0, 1.0))
    sph_uv = jnp.stack([phi * 0.5 * m3.INV_PI,
                        (theta - m3.PI) * -m3.INV_PI], axis=-1)
    sph_inst = buffers["sph_inst"][sid]

    sel3 = is_sphere[:, None]
    return {
        "t": t,
        "hit": hit,
        "kind": jnp.where(is_sphere, T.KIND_SPHERE, T.KIND_TRIANGLE
                          ).astype(jnp.int32),
        "prim": jnp.where(is_sphere, sph_id, tri_id),
        "inst": jnp.where(is_sphere, sph_inst, tri_inst),
        "position": jnp.where(sel3, sph_pos, tri_pos),
        "normal": jnp.where(sel3, sph_nrm, tri_nrm),
        "uv": jnp.where(is_sphere[:, None], sph_uv, tri_uv_i),
    }


def occluded(buffers, config, org, direction, tmin, tmax, accel=None):
    """Shadow-ray test: any hit in (tmin, tmax). The reference does a full
    closest-hit trace and checks is_miss (lib.rs:244-260)."""
    n = org.shape[0]
    tminv = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmaxv = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    t = jnp.full((n,), BIG_T)
    if config.num_triangles > 0:
        tri_t, _, _, _ = _main_tri_intersect(
            buffers, config, org, direction, tminv, tmaxv, accel)
        t = jnp.minimum(t, tri_t)
    if config.num_spheres > 0:
        sph_t, _ = intersect_spheres(org, direction, tminv, tmaxv,
                                     buffers["sph_w2o"])
        t = jnp.minimum(t, sph_t)
    return t < BIG_T


def trace_emissive_pdf(buffers, config, org, direction, tmin, tmax,
                       accel=None):
    """Light-pdf ray against the emissive-only set.

    Port of the tlas_emit trace + triangle_closest_hit_pdf /
    sphere_closest_hit_pdf (lib.rs:964-1066): returns the solid-angle pdf of
    the closest emissive hit (0 on miss). NOT yet divided by emit_object_len.
    """
    n = org.shape[0]
    tminv = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmaxv = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))

    tri_t = jnp.full((n,), BIG_T)
    tri_pdf = jnp.zeros((n,))
    if config.num_emit_triangles > 0:
        etri = buffers["emit_tri_ids"]
        emit_accel = getattr(accel, "emit", None)
        if emit_accel is not None:
            tt, eid = emit_accel.intersect(org, direction, tminv, tmaxv)
        else:
            tp = buffers["tri_p"][etri]  # (E,3,3)
            tt, eid = intersect_triangles(org, direction, tminv, tmaxv, tp)
        eid = jnp.clip(eid, 0, config.num_emit_triangles - 1)
        gid = etri[eid]
        p = buffers["tri_p"][gid]
        ab = p[:, 1] - p[:, 0]
        ac = p[:, 2] - p[:, 0]
        gn = m3.normalize(m3.cross(ab, ac))
        area = 0.5 * m3.length(m3.cross(ab, ac))
        hit_pos = org + tt[:, None] * direction
        dist2 = m3.length_squared(org - hit_pos)
        cosine = jnp.abs(m3.dot(m3.normalize(direction), gn))
        prim_count = buffers["inst_prim_count"][
            buffers["tri_inst"][gid]].astype(jnp.float32)
        pdf = dist2 / jnp.maximum(cosine * area, 1e-20) / prim_count
        tri_t = tt
        tri_pdf = pdf

    sph_t = jnp.full((n,), BIG_T)
    sph_pdf = jnp.zeros((n,))
    if config.num_emit_spheres > 0:
        esph = buffers["emit_sph_ids"]
        st, sid = intersect_spheres(org, direction, tminv, tmaxv,
                                    buffers["sph_w2o"][esph])
        sid = jnp.clip(sid, 0, config.num_emit_spheres - 1)
        o2w = buffers["sph_o2w"][esph[sid]]
        # radius approximation from the object-to-world diagonal
        # (sphere_closest_hit_pdf, lib.rs:1053-1056)
        radius = (jnp.abs(o2w[:, 0, 0]) + jnp.abs(o2w[:, 1, 1])
                  + jnp.abs(o2w[:, 2, 2])) / 3.0
        center = o2w[:, :, 3]
        d2 = m3.length_squared(center - org)
        cos_theta_max = jnp.sqrt(jnp.maximum(
            1.0 - radius * radius / jnp.maximum(d2, 1e-20), 0.0))
        solid_angle = m3.TWO_PI * (1.0 - cos_theta_max)
        sph_t = st
        sph_pdf = 1.0 / jnp.maximum(solid_angle, 1e-20)

    use_sph = sph_t < tri_t
    t = jnp.minimum(tri_t, sph_t)
    pdf = jnp.where(use_sph, sph_pdf, tri_pdf)
    return jnp.where(t < BIG_T, pdf, 0.0)
