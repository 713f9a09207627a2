"""Texture table evaluation: Solid / CheckerBoard / ImageMap / Scale.

Port of rene-shader/src/texture.rs to masked SoA evaluation: instead of a
`match` per lane, every variant is evaluated branch-free and selected by the
texture's tag. Checker/Scale reference sub-textures through one level of
non-recursive dispatch (texture.rs:176-211), same as the reference.

ImageMap sampling reproduces the Vulkan combined-image-sampler used by the
reference (linear filter, REPEAT addressing, v flipped, lod 0): bilinear
lookup in the packed RGBA atlas.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene import types as T


def _fract(x):
    return x - jnp.floor(x)


def sample_image(buffers, img_idx, uv):
    """Bilinear sample of image `img_idx` at uv (v flipped), REPEAT wrap."""
    w = buffers["img_width"][img_idx]
    h = buffers["img_height"][img_idx]
    off = buffers["img_offset"][img_idx]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]  # texture.rs:124 samples (u, 1-v)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(w, 1))
        yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(h, 1))
        return buffers["img_atlas"][off + yi * w + xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return (top * (1 - fy) + bot * fy)[..., :3]


def _tex_types(config):
    if config is None:
        return (T.TEX_SOLID, T.TEX_CHECKER, T.TEX_IMAGEMAP, T.TEX_SCALE)
    return config.tex_types


def _color_non_recursive(buffers, idx, uv, tex_types):
    """Solid or ImageMap only; Checker/Scale degrade to white
    (texture.rs:176-190)."""
    ttype = buffers["tex_type"][idx]
    solid = buffers["tex_v0"][idx][..., :3]
    out = jnp.where((ttype == T.TEX_SOLID)[..., None], solid,
                    jnp.ones_like(solid))
    if T.TEX_IMAGEMAP in tex_types:
        img = sample_image(buffers, buffers["tex_u0"][idx][..., 0], uv)
        out = jnp.where((ttype == T.TEX_IMAGEMAP)[..., None], img, out)
    return out


def tex_color(buffers, idx, uv, config=None):
    """Full one-level texture dispatch (texture.rs:192-211), specialized to
    the texture variants present in the scene.

    idx: (N,) int32 texture table indices; uv: (N,2). Returns (N,3).
    """
    tex_types = _tex_types(config)
    ttype = buffers["tex_type"][idx]
    v0 = buffers["tex_v0"][idx]
    out = v0[..., :3]  # solid
    if tex_types == (T.TEX_SOLID,):
        return out
    u0 = buffers["tex_u0"][idx]

    if T.TEX_IMAGEMAP in tex_types:
        img = sample_image(buffers, u0[..., 0], uv)
        out = jnp.where((ttype == T.TEX_IMAGEMAP)[..., None], img, out)

    if T.TEX_CHECKER in tex_types:  # texture.rs:96-119
        xs = uv[..., 0] * v0[..., 0]
        ys = uv[..., 1] * v0[..., 1]
        even = ((xs.astype(jnp.int32) % 2 == 0)
                == (ys.astype(jnp.int32) % 2 == 0))
        sub_idx = jnp.where(even, u0[..., 0], u0[..., 1])
        sub_uv = jnp.stack([_fract(xs), _fract(ys)], axis=-1)
        checker = _color_non_recursive(buffers, sub_idx, sub_uv, tex_types)
        out = jnp.where((ttype == T.TEX_CHECKER)[..., None], checker, out)

    if T.TEX_SCALE in tex_types:
        scale = (_color_non_recursive(buffers, u0[..., 0], uv, tex_types)
                 * _color_non_recursive(buffers, u0[..., 1], uv, tex_types))
        out = jnp.where((ttype == T.TEX_SCALE)[..., None], scale, out)
    return out
