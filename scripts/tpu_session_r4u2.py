"""Round-4 TPU session U2: clean dragon cost partition at pack=16.

r4u's dragon dbltris run was contaminated: under the AUTO pack=64 the
doubled march pushed single packed calls to 78-213 s — deep into the
~1 min watchdog-throttle zone (CLAUDE.md) — so the 0.948 s/spp marginal
is an artifact of device throttling, not the trace's share. And the
"nee" gate is inert on dragon (its only light is DISTANT; E=0, no env,
so base and nee builds are the same kernel — r4u U5 timed identical to
U3 down to the rep because the compile cache served the same binary).

This session re-partitions dragon with RENE_MEGA_PACK=16 (base call
~1.3 s, dbltris ~3 s — both safely under the watchdog) and the new
"dist" gate (drops the distant-light NEE block: shadow trace_any +
bsdf_eval per light):

  W0 dragon @720p pack=16 base
  W1 dragon @720p pack=16 dbltris   (+1 closest trace/bounce)
  W2 dragon @720p pack=16 dist      (-1 any trace, -1 bsdf_eval/bounce)

Usage: timeout 7200 python scripts/tpu_session_r4u2.py [W0 W1 W2]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RENE_MEGA_PACK"] = "16"

from tpu_session_r2 import load_at  # noqa: E402
from tpu_session_r4a import guard  # noqa: E402
from tpu_session_r4q2 import measure_auto  # noqa: E402

SAMPLES = "/root/reference/sample_scenes"


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
    todo = sys.argv[1:] or ["W0", "W1", "W2"]
    if "W0" in todo:
        guard("W0", lambda: dragon_marg("U2.W0 dragon pack16 base", ""))
    if "W1" in todo:
        guard("W1", lambda: dragon_marg("U2.W1 dragon pack16 dbltris",
                                        "dbltris"))
    if "W2" in todo:
        guard("W2", lambda: dragon_marg("U2.W2 dragon pack16 dist",
                                        "dist"))


if __name__ == "__main__":
    main()
