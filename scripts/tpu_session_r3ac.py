"""Round-3 TPU session AC: probe Mosaic integer-vector ops for Sobol.

The padded-2D-Sobol sampler needs, on (8,128) int32/uint32 vectors
inside a kernel: XOR, AND, left/right shifts by constants, ADD, MUL
(Laine-Karras hash), bit reversal (shift-mask ladder), and select by
bit test. Bitcasts uint<->f32 are already probed (mantissa trick).

Each probe computes a known function and checks against numpy.

Usage: timeout 1200 python scripts/tpu_session_r3ac.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def rev32_np(x):
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    x = ((x << 16) | (x >> 16)) & 0xFFFFFFFF
    return x


def lk_np(x, seed):
    x = np.uint64(x)
    x = (x + np.uint64(seed)) & np.uint64(0xFFFFFFFF)
    x ^= (x * np.uint64(0x6c50b47c)) & np.uint64(0xFFFFFFFF)
    x ^= (x * np.uint64(0xb82f1e52)) & np.uint64(0xFFFFFFFF)
    x ^= (x * np.uint64(0xc7afe638)) & np.uint64(0xFFFFFFFF)
    x ^= (x * np.uint64(0x8d22f6e6)) & np.uint64(0xFFFFFFFF)
    return np.uint32(x & np.uint64(0xFFFFFFFF))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    xin = rng.integers(0, 2**31, (8, 128), dtype=np.int32)

    def run(name, kern, want):
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )
            got = np.asarray(f(jnp.asarray(xin))).astype(np.uint32)
            ok = np.array_equal(got, want.astype(np.uint32))
            print(f"{name}: {'OK' if ok else 'MISMATCH'}"
                  + ("" if ok else f" got {got[0, :3]} want "
                     f"{want[0, :3]}"), flush=True)
        except Exception as e:  # noqa
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    def k_xorshift(x_ref, o_ref):
        x = x_ref[...].astype(jnp.uint32)
        x = x ^ (x << jnp.uint32(13))
        x = x ^ (x >> jnp.uint32(7))
        o_ref[...] = x.astype(jnp.int32)

    xu = xin.astype(np.uint32)
    w = xu ^ ((xu << 13) & 0xFFFFFFFF)
    w = w ^ (w >> 7)
    run("P1 xor/shift", k_xorshift, w)

    def k_addmul(x_ref, o_ref):
        x = x_ref[...].astype(jnp.uint32)
        x = x + jnp.uint32(0x9E3779B9)
        x = x * jnp.uint32(0x85EBCA6B)
        o_ref[...] = x.astype(jnp.int32)

    w2 = ((xu + 0x9E3779B9) & 0xFFFFFFFF).astype(np.uint64)
    w2 = (w2 * np.uint64(0x85EBCA6B)) & np.uint64(0xFFFFFFFF)
    run("P2 add/mul", k_addmul, w2.astype(np.uint32))

    def k_rev(x_ref, o_ref):
        x = x_ref[...].astype(jnp.uint32)
        x = ((x & jnp.uint32(0x55555555)) << jnp.uint32(1)) \
            | ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
        x = ((x & jnp.uint32(0x33333333)) << jnp.uint32(2)) \
            | ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
        x = ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) \
            | ((x >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F))
        x = ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) \
            | ((x >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF))
        x = (x << jnp.uint32(16)) | (x >> jnp.uint32(16))
        o_ref[...] = x.astype(jnp.int32)

    run("P3 bit-reverse", k_rev, rev32_np(xu.astype(np.uint64)))

    def k_lk(x_ref, o_ref):
        x = x_ref[...].astype(jnp.uint32)
        x = x + jnp.uint32(0x51633e2d)
        x = x ^ (x * jnp.uint32(0x6c50b47c))
        x = x ^ (x * jnp.uint32(0xb82f1e52))
        x = x ^ (x * jnp.uint32(0xc7afe638))
        x = x ^ (x * jnp.uint32(0x8d22f6e6))
        o_ref[...] = x.astype(jnp.int32)

    run("P4 laine-karras", k_lk, lk_np(xu, 0x51633e2d))

    def k_sobol16(x_ref, o_ref):
        # dim-2 Sobol via 16-step XOR ladder keyed on index bits
        idx = x_ref[...].astype(jnp.uint32) & jnp.uint32(0xFFFF)
        M = _sobol2_dirs()
        y = idx * jnp.uint32(0)
        for b in range(16):
            bit = (idx >> jnp.uint32(b)) & jnp.uint32(1)
            y = y ^ (bit * jnp.uint32(M[b]))
        o_ref[...] = y.astype(jnp.int32)

    def _sobol2_dirs():
        # direction numbers for Sobol dimension 2 (primitive poly x+1,
        # m_i built by the classic recurrence -> v_i as 32-bit fracs)
        v = np.zeros(32, np.uint64)
        m = np.zeros(32, np.uint64)
        m[0] = 1
        for i in range(1, 32):
            m[i] = m[i - 1] ^ (m[i - 1] << 1)
            m[i] &= (1 << (i + 1)) - 1
        for i in range(32):
            v[i] = m[i] << (31 - i)
        return [int(x) for x in v]

    dirs = _sobol2_dirs()
    idxs = xu & 0xFFFF
    wy = np.zeros_like(idxs)
    for b in range(16):
        bit = (idxs >> b) & 1
        wy ^= bit * np.uint32(dirs[b] & 0xFFFFFFFF)
    run("P5 sobol16 ladder", k_sobol16, wy)


if __name__ == "__main__":
    main()
