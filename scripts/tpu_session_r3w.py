"""Round-3 TPU session W: probe MXU matmul viability inside the march.

The cluster march's entered-group cost is the statically unrolled
Möller–Trumbore blocks (VPU: ~25 ops x 32 tris per sub-block for 1024
lanes). The Plücker side-tests are linear in the ray's (d, w=o x d)
6-vector (ops/mxu_intersect.py), so a 128-tri cluster against an (8,128)
lane tile is a (384,8)@(8,1024) f32 matmul on the MXU + VPU sign/t
post-processing.

Probes (each its own tiny kernel, timed over reps inside a fori):
  M1. dot_general (384,8)@(8,1024) f32 HIGHEST precision in a kernel —
      compiles? cost per call?
  M2. same at bf16x3 default precision.
  M3. VPU baseline: 12 fused multiply-adds over (8,128) x 128 lanes
      unrolled 32x (MT-like per-sub-block cost).
  M4. correctness: MXU side-test signs vs numpy Plücker on random rays.

Usage: timeout 1800 python scripts/tpu_session_r3w.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("platform:", jax.devices()[0].platform, flush=True)
    REPS = 200

    rng = np.random.default_rng(0)
    B = rng.standard_normal((384, 8)).astype(np.float32)
    R = rng.standard_normal((8, 1024)).astype(np.float32)

    def time_kernel(name, kern, *args, out_shape):
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(a.shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM)
                          for a in args],
                out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            )
            o = np.asarray(f(*[jnp.asarray(a) for a in args]))
            t0 = time.time()
            o = np.asarray(f(*[jnp.asarray(a) for a in args]))
            dt = (time.time() - t0) / REPS * 1e6
            print(f"{name}: {dt:.1f} us/iter  out[0,:2]={o[0, :2]}",
                  flush=True)
            return o
        except Exception as e:  # noqa
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            return None

    def k_mxu_hi(b_ref, r_ref, o_ref):
        def body(i, acc):
            s = jax.lax.dot_general(
                b_ref[...], r_ref[...] + acc[0, 0] * 0.0,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            return s[:8, :]
        o_ref[...] = jax.lax.fori_loop(0, REPS, body,
                                       jnp.zeros((8, 1024), jnp.float32))

    def k_mxu_def(b_ref, r_ref, o_ref):
        def body(i, acc):
            s = jax.lax.dot_general(
                b_ref[...], r_ref[...] + acc[0, 0] * 0.0,
                (((1,), (0,)), ((), ())))
            return s[:8, :]
        o_ref[...] = jax.lax.fori_loop(0, REPS, body,
                                       jnp.zeros((8, 1024), jnp.float32))

    def k_vpu(b_ref, r_ref, o_ref):
        # MT-like cost: 32 tris x ~12 FMA-class vector ops on (8,128)
        def body(i, acc):
            x = acc
            for k in range(32):
                c0 = b_ref[0, k]
                c1 = b_ref[1, k]
                x = x * c0 + c1
                x = jnp.minimum(x * c1 + c0, x)
                x = x * c0 + c1
                x = jnp.maximum(x, x * c1)
                x = x * c0 + c1
                x = jnp.minimum(x, x * c1 + c0)
            return x
        r8 = r_ref[...].reshape(8, 8, 128)[0]
        o_ref[...] = jax.lax.fori_loop(0, REPS, body, r8 * 0.0 + 1.0)

    time_kernel("M1 mxu f32 HIGHEST (384,8)@(8,1024)", k_mxu_hi, B, R,
                out_shape=(8, 1024))
    time_kernel("M2 mxu default  (384,8)@(8,1024)", k_mxu_def, B, R,
                out_shape=(8, 1024))
    time_kernel("M3 vpu 32x12-op MT-like", k_vpu, B, R,
                out_shape=(8, 128))

    # M4 correctness: side-test signs via matmul vs numpy Plücker
    from rene_tpu.ops.mxu_intersect import MXUIntersector
    tri = rng.standard_normal((40, 3, 3)).astype(np.float32)
    mx = MXUIntersector(tri)
    o = rng.standard_normal((16, 3)).astype(np.float32) * 0.1
    d = rng.standard_normal((16, 3)).astype(np.float32)
    w = np.cross(o, d)
    feat = np.concatenate([d, w], axis=1).T  # (6, N)
    sides = mx.B @ feat  # (3C, N)
    C = mx.padded
    s0, s1, s2 = sides[:C][:40], sides[C:2 * C][:40], \
        sides[2 * C:][:40]
    hit_mx = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) \
        | ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
    # numpy MT reference (no tmin/tmax):
    hit_ref = np.zeros_like(hit_mx)
    for ti in range(40):
        v0, v1, v2 = tri[ti]
        e1, e2 = v1 - v0, v2 - v0
        p = np.cross(d, np.broadcast_to(e2, d.shape))
        det = (e1 * p).sum(1)
        tv = o - v0
        u = (tv * p).sum(1) / det
        q = np.cross(tv, np.broadcast_to(e1, d.shape))
        v = (d * q).sum(1) / det
        hit_ref[ti] = (np.abs(det) > 1e-12) & (u >= -1e-5) & \
            (v >= -1e-5) & (u + v <= 1 + 1e-5)
    agree = (hit_mx == hit_ref).mean()
    print(f"M4 sign-test agreement vs MT: {agree * 100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
