"""Round-4 TPU session I: teapot wave spw sweep under the full r4 stack.

Every r4 teapot wave number used samples_per_wave=8 (the r3 spw sweep
1/2/4/8 -> 2.66/1.45/1.25/1.02 s/spp showed more-is-better and stopped
at 8; r3 tried 12/16 under the PRE-median/gate stack and rejected
them). The auto policy picks min(18, 2^23/npix) = 9 @720p. With the r4
winners stacked (median clustering, xla keys, (1,1,1,2,4) schedule,
sub-gated member march) the per-wave fixed costs (sort, init, sync)
amortize over spw samples — re-sweep the cap:

  IB teapot wave @720p spw=8 — anchor (r4f T1: 0.554 s/spp).
  I0 spw=12.
  I1 spw=16.
  I2 spw=18.
  I3 RENE_WAVE_PROFILE=1 at the best spw — fresh per-step cost
     localization under the gate stack (r4d D2 pre-gate: step1 1422 /
     step2 1072 / step3 589 ms).

Usage: timeout 10800 python scripts/tpu_session_r4i.py [IB I0 I1 I2 I3]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from tpu_session_r2 import SAMPLES, load_at  # noqa: E402
from tpu_session_r3aa import build, reps  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    todo = sys.argv[1:] or ["IB", "I0", "I1", "I2", "I3"]
    teapot = load_at(f"{SAMPLES}/teapot/scene.pbrt", 1280, 720)
    best = {"spw": 8, "t": 1e30}

    def sweep(tag, spw):
        _, t = reps(f"I.{tag} teapot wave @720p spw={spw}",
                    build(teapot, samples_per_wave=spw), spw)
        if t < best["t"]:
            best.update(spw=spw, t=t)

    for tag, spw in (("IB", 8), ("I0", 12), ("I1", 16), ("I2", 18)):
        if tag in todo:
            guard(tag, lambda tag=tag, spw=spw: sweep(tag, spw))
    if "I3" in todo:
        def i3():
            os.environ["RENE_WAVE_PROFILE"] = "1"
            try:
                reps(f"I.I3 teapot profile spw={best['spw']}",
                     build(teapot, samples_per_wave=best["spw"]),
                     best["spw"], n=1)
            finally:
                del os.environ["RENE_WAVE_PROFILE"]
        guard("I3", i3)
    print(f"I: best spw={best['spw']} at {best['t']:.4f} s/spp",
          flush=True)


if __name__ == "__main__":
    main()
