"""Texture table evaluation: Solid / CheckerBoard / ImageMap / Scale.

Port of rene-shader/src/texture.rs to component-SoA masked evaluation:
variants are evaluated branch-free and selected by tag, with absent variants
pruned at compile time via the scene config. Checker/Scale reference
sub-textures through one level of non-recursive dispatch
(texture.rs:176-211), like the reference.

ImageMap sampling reproduces the reference's Vulkan combined-image-sampler
(linear filter, REPEAT addressing, v flipped, lod 0): bilinear lookup in the
transposed (4, npixels) RGBA atlas — the transposed layout keeps gather
results (4, N), fully lane-tiled.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene import types as T
from . import vec3 as v3
from .vec3 import V3


def _fract(x):
    return x - jnp.floor(x)


def sample_image(buffers, img_idx, u, v) -> V3:
    """Bilinear sample of image `img_idx` at (u, v) (v flipped), REPEAT."""
    w = buffers["img_width"][img_idx]
    h = buffers["img_height"][img_idx]
    off = buffers["img_offset"][img_idx]
    atlas = buffers["img_atlasT"]  # (4, npixels)
    x = u * w.astype(jnp.float32) - 0.5
    y = (1.0 - v) * h.astype(jnp.float32) - 0.5  # texture.rs:124
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def texel(xi, yi) -> V3:
        xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(w, 1))
        yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(h, 1))
        flat = off + yi * w + xi
        px = jnp.take(atlas, flat, axis=1)  # (4, N)
        return V3(px[0], px[1], px[2])

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def _tex_types(config):
    if config is None:
        return (T.TEX_SOLID, T.TEX_CHECKER, T.TEX_IMAGEMAP, T.TEX_SCALE)
    return config.tex_types


def _solid(buffers, idx) -> V3:
    tv = buffers["tex_v0T"]  # (4, ntex)
    return V3(jnp.take(tv[0], idx), jnp.take(tv[1], idx),
              jnp.take(tv[2], idx))


def _color_non_recursive(buffers, idx, u, v, tex_types) -> V3:
    """Solid or ImageMap only; Checker/Scale degrade to white
    (texture.rs:176-190)."""
    ttype = buffers["tex_type"][idx]
    out = v3.where(ttype == T.TEX_SOLID, _solid(buffers, idx),
                   V3.ones(ttype.shape))
    if T.TEX_IMAGEMAP in tex_types:
        img = sample_image(buffers, buffers["tex_u0"][idx, 0], u, v)
        out = v3.where(ttype == T.TEX_IMAGEMAP, img, out)
    return out


def tex_color(buffers, idx, uv, config=None) -> V3:
    """Full one-level texture dispatch (texture.rs:192-211), specialized to
    the texture variants present in the scene.

    idx: (N,) int32 table indices; uv: (u, v) scalar pair or (N,2) array.
    """
    if not isinstance(uv, tuple):
        uv = (uv[..., 0], uv[..., 1])
    u, v = uv
    tex_types = _tex_types(config)
    out = _solid(buffers, idx)
    if tex_types == (T.TEX_SOLID,):
        return out
    ttype = buffers["tex_type"][idx]

    if T.TEX_IMAGEMAP in tex_types:
        img = sample_image(buffers, buffers["tex_u0"][idx, 0], u, v)
        out = v3.where(ttype == T.TEX_IMAGEMAP, img, out)

    if T.TEX_CHECKER in tex_types:  # texture.rs:96-119
        tv = buffers["tex_v0T"]
        xs = u * jnp.take(tv[0], idx)
        ys = v * jnp.take(tv[1], idx)
        even = ((xs.astype(jnp.int32) % 2 == 0)
                == (ys.astype(jnp.int32) % 2 == 0))
        sub_idx = jnp.where(even, buffers["tex_u0"][idx, 0],
                            buffers["tex_u0"][idx, 1])
        checker = _color_non_recursive(buffers, sub_idx, _fract(xs),
                                       _fract(ys), tex_types)
        out = v3.where(ttype == T.TEX_CHECKER, checker, out)

    if T.TEX_SCALE in tex_types:
        scale = (_color_non_recursive(buffers, buffers["tex_u0"][idx, 0],
                                      u, v, tex_types)
                 * _color_non_recursive(buffers, buffers["tex_u0"][idx, 1],
                                        u, v, tex_types))
        out = v3.where(ttype == T.TEX_SCALE, scale, out)
    return out
