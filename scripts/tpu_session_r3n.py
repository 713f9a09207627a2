"""Round-3 TPU session N: probe Mosaic primitives for octant-ordered
marching (box-table indirection).

Probes, each in one tiny kernel:
  P1. load a (2,128) row slice at a TRACED arbitrary row offset, extract
      a scalar at static (0,126), convert f32->i32 via astype (fptosi),
      use it as a 128-aligned pl.ds lane offset into a VMEM table.
  P2. same but the scalar is an int32 bit-pattern stored as f32 and
      recovered with lax.bitcast_convert_type.
  P3. scalar extraction from a computed (8,128) vector (tile octant from
      lane (0,0) sign tests) -> int scalar -> arithmetic -> dynamic row
      slice offset.

Usage: timeout 1200 python scripts/tpu_session_r3n.py
"""
import os
import sys

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

    # table: 16 "groups" of 2 rows; row0 lane126 carries the group's
    # geometry index (group i -> geom block perm[i]); geom is (8, 16*128)
    # with block j filled with value j.
    nsup, grows = 16, 2
    perm = np.random.default_rng(0).permutation(nsup)
    box = np.zeros((nsup * grows, 128), np.float32)
    box[::grows, 126] = perm.astype(np.float32)                 # P1 value
    box[::grows, 127] = perm.astype(np.int32).view(np.float32)  # P2 bits
    geom = np.zeros((8, nsup * 128), np.float32)
    for j in range(nsup):
        geom[:, j * 128:(j + 1) * 128] = float(j)

    def k_p1(sc, box_ref, geom_ref, o_ref):
        si = sc[0]
        brow = box_ref[pl.ds(si * grows, grows), :]
        g = brow[0, 126].astype(jnp.int32)
        o_ref[...] = geom_ref[:, pl.ds(g * 128, 128)]

    def k_p2(sc, box_ref, geom_ref, o_ref):
        si = sc[0]
        brow = box_ref[pl.ds(si * grows, grows), :]
        g = jax.lax.bitcast_convert_type(brow[0, 127], jnp.int32)
        o_ref[...] = geom_ref[:, pl.ds(g * 128, 128)]

    def k_p3(sc, box_ref, geom_ref, o_ref):
        # direction-like vector; octant of lane (0,0)
        d = geom_ref[:, pl.ds(0, 128)] - 3.0  # block 0 is zeros -> -3.0
        oct_ = (4 * (d[0, 0] < 0).astype(jnp.int32)
                + 2 * (d[0, 0] < 0).astype(jnp.int32)
                + (d[0, 0] < 0).astype(jnp.int32))  # = 7
        si = sc[0] + oct_ - 7
        brow = box_ref[pl.ds(si * grows, grows), :]
        g = brow[0, 126].astype(jnp.int32)
        o_ref[...] = geom_ref[:, pl.ds(g * 128, 128)]

    for name, kern in [("P1 astype", k_p1), ("P2 bitcast", k_p2),
                       ("P3 octant", k_p3)]:
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(box.shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(geom.shape, lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )
            ok = True
            for si in [0, 3, nsup - 1]:
                sc = jnp.asarray([si, 0, 0], jnp.int32)
                out = np.asarray(f(sc, jnp.asarray(box),
                                   jnp.asarray(geom)))
                want = float(perm[si])
                if not np.all(out == want):
                    ok = False
                    print(f"  {name}: si={si} got {out[0, :4]} want "
                          f"{want}", flush=True)
            print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:  # noqa
            msg = str(e).split(chr(10))[0][:200]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
