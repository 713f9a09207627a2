"""Round-4 TPU session U: megakernel cost partition via ablation gates.

RENE_MEGA_ABLATE (debug-only, read at kernel-build time) partitions the
megakernel's per-bounce cost on-chip, r4o-style:

  dbltris: + one extra full trace_closest per bounce (CSE/DCE-proof
           perturbed ray) -> T_dbl - T_base = the closest-hit trace's
           share (brute unroll on cornell; box sweeps + MT march on
           cluster scenes).
  nee:     - the emitter-MIS block (sample_emit + trace_emit_pdf +
           second bsdf_eval) -> T_base - T_nee = NEE share.
  remainder = bsdf sample/eval + RNG + regen + film + loop overhead.

Scenes: cornell @1024 (the headline bench metric, 1089 Mrays/s — is it
at the VPU op floor?) and dragon @720p AUTO pack (the 0.0791 record —
how much of what remains is the march?).

  U0/U1/U2 cornell base / dbltris / nee  (seconds for 32 samples)
  U3/U4/U5 dragon @720p AUTO base / dbltris / nee (marginal s/spp)

Usage: timeout 14400 python scripts/tpu_session_r4u.py [U0 U1 ... U5]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4q2 import measure_auto  # noqa: E402

SAMPLES = "/root/reference/sample_scenes"


def cornell_abs(tag, ablate, timed=32, reps=3):
    """Absolute seconds for `timed` samples on cornell @1024 (mirrors
    bench.py's sustained-rate loop, sampler-independent)."""
    from rene_tpu.integrators.pallas_path import make_pallas_batch_fn
    from rene_tpu.scene.device import build_device_scene
    os.environ["RENE_MEGA_ABLATE"] = ablate
    try:
        scene = load_at(f"{SAMPLES}/cornell-box/scene.pbrt", 1024, 1024)
        scene.sampler = "independent"
        bn, cfg = build_device_scene(scene)
        run = make_pallas_batch_fn(bn, cfg)
        t0 = time.time()
        out = run(0, timed)
        rays = float(out["rays"])
        print(f"{tag}: compile+1st {time.time()-t0:.1f}s "
              f"({rays/1e9:.2f} Grays)", flush=True)
        best = 1e30
        for r in range(reps):
            t0 = time.time()
            rays = float(run(r + 1, timed)["rays"])
            dt = time.time() - t0
            best = min(best, dt)
            print(f"  rep{r}: {dt:.3f}s  {rays/dt/1e6:.0f} Mrays/s",
                  flush=True)
        print(f"{tag}: best {best:.3f}s / {timed} samples "
              f"(ablate='{ablate}')", flush=True)
    finally:
        os.environ["RENE_MEGA_ABLATE"] = ""


def dragon_marg(tag, ablate):
    os.environ["RENE_MEGA_ABLATE"] = ablate
    try:
        scene = load_at(f"{SAMPLES}/dragon/scene.pbrt", 1280, 720)
        measure_auto(tag + f" (ablate='{ablate}')", scene,
                     spp_a=1, spp_b=2)
    finally:
        os.environ["RENE_MEGA_ABLATE"] = ""


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["U0", "U1", "U2", "U3", "U4", "U5"]

    if "U0" in todo:
        guard("U0", lambda: cornell_abs("U.U0 cornell base", ""))
    if "U1" in todo:
        guard("U1", lambda: cornell_abs("U.U1 cornell dbltris", "dbltris"))
    if "U2" in todo:
        guard("U2", lambda: cornell_abs("U.U2 cornell nee", "nee"))
    if "U3" in todo:
        guard("U3", lambda: dragon_marg("U.U3 dragon @720p base", ""))
    if "U4" in todo:
        guard("U4", lambda: dragon_marg("U.U4 dragon @720p dbltris",
                                        "dbltris"))
    if "U5" in todo:
        guard("U5", lambda: dragon_marg("U.U5 dragon @720p nee", "nee"))


if __name__ == "__main__":
    main()
