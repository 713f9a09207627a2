"""Round-3 TPU session AB: kernel-key follow-ups.

  E4 teapot @720p spw8, dir_sub=True (sub-octant dominant-axis bits:
     ~45-deg tile cones at the cost of splitting cluster runs).
  E5 dragon @1280x720 wave kernel-key (mega holds 0.125 s/spp there;
     the adaptive origin bins may flip the wave/mega decision).
  E6 teapot profile: per-step ms + alive counts for the kernel-key
     config (RENE_WAVE_PROFILE=1 forces per-step sync).

Usage: timeout 5400 python scripts/tpu_session_r3ab.py [E4 E5 E6]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402


def key_diag(tag, scene):
    """Step one primary launch and histogram the WROW_KEY tag bits —
    proves the cluster-id path is live ON-CHIP (interpret parity can't
    distinguish a silent Morton fallback)."""
    import jax.numpy as jnp
    import numpy as np

    from rene_tpu.integrators import pallas_path as pp

    run = build(scene, samples_per_wave=2)
    state, pix = run.init_state(jnp.int32(3), jnp.int32(2))
    nt = -(-run.n_pad // run.tile)
    state, n_alive = run.kernel_step(1, state, jnp.int32(3),
                                     jnp.int32(0), jnp.int32(nt),
                                     jnp.int32(2))
    keys = np.asarray(state[pp.WROW_KEY]).view(np.int32)
    alive = np.asarray(state[pp.WROW_ALIVE]) > 0.5
    pay = keys & 0x00FFFFFF
    dead = (keys & 0x3F000000) == 0x3F000000
    regen = (~dead) & ((pay & 0x400000) != 0)
    mort = (~dead) & ~regen & ((pay & 0x800000) != 0)
    clus = (~dead) & ~regen & ~mort
    n = keys.size
    print(f"{tag}: alive {alive.sum()/n:.3f} | key tags: cluster "
          f"{clus.sum()/n:.3f} morton {mort.sum()/n:.3f} regen "
          f"{regen.sum()/n:.3f} dead {dead.sum()/n:.3f}; "
          f"distinct cluster ids {np.unique(keys[clus]).size}",
          flush=True)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["E4", "E5", "E6"]

    if "E0" in todo:
        key_diag("AB.E0 teapot key tags",
                 load_at(f"{SAMPLES}/teapot/scene.pbrt", 320, 180))

    if "E4" in todo or "E6" in todo:
        teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    if "E4" in todo:
        run = build(teapot, samples_per_wave=8, dir_sub=True)
        reps("AB.E4 teapot dir_sub", run, 8)
    if "E5" in todo:
        dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        run = build(dragon, samples_per_wave=8)
        reps("AB.E5 dragon wave kernel-key", run, 8)
    if "E6" in todo:
        os.environ["RENE_WAVE_PROFILE"] = "1"
        run = build(teapot, samples_per_wave=8)
        reps("AB.E6 teapot profile", run, 8, n=1)
        os.environ.pop("RENE_WAVE_PROFILE", None)

    if "E7" in todo:
        # dragon @720p MEGA box-vs-MT split (the 0.08 s/spp VERDICT
        # target needs to know which half dominates)
        import time

        import numpy as np

        from rene_tpu.integrators import pallas_path as pp
        from rene_tpu.scene.device import build_device_scene
        dragon = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        bn, cfg = build_device_scene(dragon)
        for skip in (False, True):
            pp._PROFILE_SKIP_MT = skip
            run = pp.make_pallas_batch_fn(bn, cfg)
            k1, k2 = 2, 6
            np.asarray(run(0, k1)["radiance"])
            np.asarray(run(0, k2)["radiance"])
            t0 = time.time()
            float(run(1, k1)["rays"])
            t1 = time.time()
            float(run(2, k2)["rays"])
            marg = ((time.time() - t1) - (t1 - t0)) / (k2 - k1)
            print(f"AB.E7 dragon mega skip_mt={skip}: marginal "
                  f"{marg:.3f} s/spp", flush=True)
        pp._PROFILE_SKIP_MT = False


if __name__ == "__main__":
    main()
