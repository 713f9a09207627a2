"""Round-3 TPU session C: redistribution-primitive shootout.

The wave engine's sort+gather costs ~85 ms/step at 2^20 lanes (session
r3a) — it dominates the whole wave. Decompose and find the fast path:

  a. argsort(int32 key) alone
  b. take((21,N), perm, axis=1)    — column gather (84B strided x21)
  c. take((N,21), perm, axis=0)    — row gather (84B contiguous)
  d. transpose (N,21)->(21,N)      — layout cost for the kernel
  e. lax.sort((key, iota)) vs argsort
  f. lax.sort with 22 payload operands (fused sort+payload move)
  g. end-to-end candidate: argsort + row-gather + transpose

Usage: timeout 1800 python scripts/tpu_session_r3c.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def bench(tag, f, *args, reps=5):
    out = f(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        np.asarray(o[(0,) * o.ndim])
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        for o in (out if isinstance(out, tuple) else (out,)):
            np.asarray(o[(0,) * o.ndim])
        best = min(best, time.time() - t0)
    print(f"  {tag}: {best*1000:.1f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    print("platform:", jax.devices()[0].platform, flush=True)
    n = 1 << 20
    NR = 21
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 21, n, dtype=np.int32))
    x = jnp.asarray(rng.random((NR, n), np.float32))
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    bench("a. argsort", jax.jit(lambda k: jnp.argsort(k)), key)
    bench("b. take (21,N) axis=1",
          jax.jit(lambda x, p: jnp.take(x, p, axis=1)), x, perm)
    bench("c. take (N,21) axis=0",
          jax.jit(lambda x, p: jnp.take(x, p, axis=0)), xt, perm)
    bench("d. transpose (N,21)->(21,N)",
          jax.jit(lambda x: x.T + 0.0), xt)
    bench("d2. transpose (21,N)->(N,21)",
          jax.jit(lambda x: x.T + 0.0), x)
    bench("e. lax.sort (key, iota)",
          jax.jit(lambda k: jax.lax.sort(
              (k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)), key)
    bench("f. lax.sort 22 operands",
          jax.jit(lambda k, x: jax.lax.sort(
              (k,) + tuple(x[i] for i in range(NR)), num_keys=1)),
          key, x)
    bench("g. argsort + row-gather + transpose",
          jax.jit(lambda k, x: jnp.take(x, jnp.argsort(k), axis=0).T
                  + 0.0), xt)
    bench("h. argsort + row-gather (no transpose)",
          jax.jit(lambda k, x: jnp.take(x, jnp.argsort(k), axis=0)), xt)
    # candidate with key recompute fused on (N,21) layout
    bench("i. full step shape: key->argsort->gather rows",
          jax.jit(lambda x: jnp.take(
              x, jnp.argsort(
                  (x[:, 0] * 64).astype(jnp.int32) & 63), axis=0)), xt)


if __name__ == "__main__":
    main()
