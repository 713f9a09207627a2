"""Round-3 TPU session R: profile the octant-ordered wave on teapot@720p.

Splits the remaining 0.746 s/spp into march-MT vs box-sweep vs
sort/launch cost: per-step timings with RENE_WAVE_PROFILE, then the
same wave with _PROFILE_SKIP_MT=True (boxes marched, MT unrolls
skipped) to bound the box-sweep share.

Also: spw sweep at 720p (12/16 lanes vs the spw8 default) — deeper
waves amortize per-step sort/launch overhead at more HBM state.

Usage: timeout 5400 python scripts/tpu_session_r3r.py [prof skipmt spw]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RENE_WAVE_PROFILE"] = "1"

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402


def run_wave(tag, scene, spp=8):
    from rene_tpu.scene.device import build_device_scene
    from rene_tpu.integrators.pallas_wave import make_pallas_wave_fn
    bn, config = build_device_scene(scene)
    run = make_pallas_wave_fn(bn, config, samples_per_wave=spp)
    t0 = time.time()
    out = run(3, spp)
    print(f"{tag}: 1st wave {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = run(4, spp)
    _ = float(out["rays"])
    dt = time.time() - t0
    print(f"{tag}: rep {dt:.2f}s -> {dt / spp * 1000:.0f} ms/spp",
          flush=True)


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    args = sys.argv[1:] or ["prof", "skipmt"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)

    if "prof" in args:
        run_wave("R.prof", teapot)

    if "skipmt" in args:
        import rene_tpu.integrators.pallas_path as pp
        pp._PROFILE_SKIP_MT = True
        run_wave("R.skipmt", teapot)
        pp._PROFILE_SKIP_MT = False

    if "spw" in args:
        os.environ.pop("RENE_WAVE_PROFILE", None)
        from tpu_session_r3a import measure_wave
        for spw in (12, 16):
            measure_wave(f"R.spw{spw} teapot hi", teapot, spp=spw,
                         samples_per_wave=spw, reps=3)


if __name__ == "__main__":
    main()
