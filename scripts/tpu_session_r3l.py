"""Round-3 TPU session L: shipped-defaults validation.

render() auto-engine on teapot (wave, default schedule/spw/sub_tris)
and dragon (mega) at both resolutions; marginal s/spp from two spp
levels through the real driver.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at


def driver_marginal(tag, scene, spp_a, spp_b):
    from rene_tpu.render import render
    t0 = time.time()
    render(scene, spp=spp_a, seed=3)
    t1 = time.time()
    render(scene, spp=spp_a, seed=4)
    t2 = time.time()
    render(scene, spp=spp_b, seed=5)
    t3 = time.time()
    marg = ((t3 - t2) - (t2 - t1)) / (spp_b - spp_a)
    print(f"{tag}: compile+1st {t1-t0:.0f}s; {spp_a}spp {t2-t1:.2f}s; "
          f"{spp_b}spp {t3-t2:.2f}s; marginal {marg*1000:.0f} ms/spp",
          flush=True)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    driver_marginal("L.teapot@320x180 (auto=wave)",
                    load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180),
                    4, 20)
    driver_marginal("L.teapot@720p (auto=wave)",
                    load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720),
                    2, 8)
    driver_marginal("L.dragon@320x180 (auto=mega)",
                    load_at(f"{SAMPLES}/dragon/scene.pbrt", 320, 180),
                    4, 20)


if __name__ == "__main__":
    main()
