"""MXU brute-force triangle intersection via Plücker coordinates.

TPU-native replacement for per-triangle Möller–Trumbore: the three edge
side-tests of a ray against a triangle are *linear* in the ray's Plücker
coordinates (d, w = o x d):

    side(edge a->b) = d . (a x b) + w . (b - a)

so testing N rays against C triangles is one (N,6) @ (6,3C) matmul on the
MXU, plus a (N,4) @ (4,2C) matmul for the plane-equation t values
(t = (k - o.n)/(d.n)). A ray hits when all three sides share a sign
(watertight along shared edges up to f32 rounding, no backface culling —
matching the reference's un-culled RT pipeline, main.rs:3078-3105).

Barycentrics for the winning triangle come from the signed side values:
with edges E0: v0->v1, E1: v1->v2, E2: v2->v0,
  bary(v1) = s2/(s0+s1+s2), bary(v2) = s0/(s0+s1+s2)
which equals the Vulkan hit attribute (u, v) convention (lib.rs:926).

Used for scenes below a triangle-count threshold (cornell-box, veach-mis,
sphere/cube); larger scenes go through the BVH.
"""
from __future__ import annotations

import numpy as np

RAY_TILE = 1 << 18
TRI_CHUNK = 512  # columns per matmul chunk (x5 blocks of C)


class MXUIntersector:
    """Precomputed triangle constant matrices + the matmul test."""

    def __init__(self, tri_p: np.ndarray):
        tri_p = np.asarray(tri_p, np.float64)
        ntri = tri_p.shape[0]
        pad = (-ntri) % 128
        self.num_tris = ntri
        self.padded = ntri + pad
        v0 = np.concatenate([tri_p[:, 0], np.zeros((pad, 3))], 0)
        v1 = np.concatenate([tri_p[:, 1], np.zeros((pad, 3))], 0)
        v2 = np.concatenate([tri_p[:, 2], np.ones((pad, 3))], 0)

        def edge_cols(a, b):
            # side = d . (a x b) + (o x d) . (b - a)
            m = np.cross(a, b)      # (C,3) -> dotted with d
            e = b - a               # (C,3) -> dotted with w
            return np.concatenate([m, e], axis=1)  # (C,6)

        # B: (6, 3C) with contiguous blocks [E0 | E1 | E2]
        b = np.concatenate([edge_cols(v0, v1), edge_cols(v1, v2),
                            edge_cols(v2, v0)], axis=0).T
        self.B = np.ascontiguousarray(b, np.float32)

        n = np.cross(v1 - v0, v2 - v0)  # (C,3) geometric normal
        k = np.sum(n * v0, axis=1)      # plane offset
        # P: (4, 2C) -> [o,1] block gives (k - o.n); [d] block gives d.n
        on_cols = np.concatenate([-n, k[:, None]], axis=1)  # (C,4)
        dn_cols = np.concatenate([n, np.zeros((len(n), 1))], axis=1)
        self.P = np.ascontiguousarray(
            np.concatenate([on_cols, dn_cols], axis=0).T, np.float32)
        self._device = None

    def to_device(self):
        import jax.numpy as jnp
        self._device = {
            "B": jnp.asarray(self.B),
            "P": jnp.asarray(self.P),
        }
        return self

    def intersect(self, org, direction, tmin, tmax, want_bary=False):
        """Closest hit: returns (t, prim_id[, u, v]).

        org/direction: V3 component vectors (or (N,3) arrays).
        """
        import jax
        import jax.numpy as jnp

        from .vec3 import V3

        if self._device is None:
            self.to_device()
        d = self._device
        C = self.padded
        if not isinstance(org, V3):
            org = V3.from_array(org)
            direction = V3.from_array(direction)
        n = org.x.shape[0]

        w = org.cross(direction)
        feat = jnp.stack([direction.x, direction.y, direction.z,
                          w.x, w.y, w.z], axis=1)            # (N,6)
        featp = jnp.stack([org.x, org.y, org.z, jnp.ones_like(org.x),
                           direction.x, direction.y, direction.z],
                          axis=1)                            # (N,7)

        s = jnp.dot(feat, d["B"], preferred_element_type=jnp.float32)
        s0 = s[:, :C]
        s1 = s[:, C:2 * C]
        s2 = s[:, 2 * C:]
        pos = (s0 >= 0) & (s1 >= 0) & (s2 >= 0)
        neg = (s0 <= 0) & (s1 <= 0) & (s2 <= 0)

        pp = jnp.dot(featp[:, :4], d["P"][:, :C],
                     preferred_element_type=jnp.float32)      # k - o.n
        dn = jnp.dot(featp[:, 4:7], d["P"][:3, C:],
                     preferred_element_type=jnp.float32)      # d.n
        t = pp / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)

        valid = ((pos | neg) & (jnp.abs(dn) > 1e-12)
                 & (t >= tmin[:, None]) & (t <= tmax[:, None]))
        if self.padded != self.num_tris:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            valid = valid & (col < self.num_tris)
        t = jnp.where(valid, t, jnp.float32(1e30))
        best = jnp.argmin(t, axis=1)
        tbest = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        if not want_bary:
            return tbest, best.astype(jnp.int32)

        bs0 = jnp.take_along_axis(s0, best[:, None], axis=1)[:, 0]
        bs1 = jnp.take_along_axis(s1, best[:, None], axis=1)[:, 0]
        bs2 = jnp.take_along_axis(s2, best[:, None], axis=1)[:, 0]
        denom = bs0 + bs1 + bs2
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        u = bs2 / denom  # bary(v1)
        v = bs0 / denom  # bary(v2)
        return tbest, best.astype(jnp.int32), u, v

    def occluded(self, org, direction, tmin, tmax):
        t, _ = self.intersect(org, direction, tmin, tmax)
        return t < 1e29
