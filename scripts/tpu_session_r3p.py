"""Round-3 TPU session P: Beckmann-distribution diagnosis for the veach
lobe-shape residual (CLAUDE.md round-4 #2).

Round-3 forensics (VALIDATION.md): with the Tungsten-compat overrides
(backdrop 0.925 + conductor 1/pi + maxdepth 2) SSIM reaches 0.8252 with
GGX alpha=r (energy right, highlights too wide) and 0.8430 with GGX
alpha=r^2 (shape closer, energy breaks). Hypothesis: the golden's
distribution is Beckmann (narrower tails than GGX at equal alpha), so
Beckmann + the energy-true overrides may satisfy both.

Experiments (RENE_MF_DIST=beckmann set before the first render; the
flag is read at kernel-build/trace time, process-level):
  B. per-surface ratio sweep @320x180 (linear, vs EXR golden, maxdepth
     2): beckmann+overrides alpha=r / alpha=r^2.
  S. SSIM @720p vs TungstenRender.png: the better variant at 1024 spp.

Usage: timeout 5400 python scripts/tpu_session_r3p.py [B S]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RENE_MF_DIST"] = "beckmann"

from tpu_session_r3b import (golden_ssim_720, per_surface,  # noqa: E402
                             spec_for)


def main():
    import jax
    todo = set(sys.argv[1:]) or {"B", "S"}
    print("platform:", jax.devices()[0].platform,
          "dist:", os.environ["RENE_MF_DIST"], flush=True)

    if "B" in todo:
        per_surface("B.beck+ov alpha=r",
                    spec_for(backdrop=0.925, fscale=1.0 / math.pi),
                    maxdepth=2)
        per_surface("B.beck+ov alpha=r2",
                    spec_for(backdrop=0.925, fscale=1.0 / math.pi,
                             alpha_sq=True),
                    maxdepth=2)

    if "S" in todo:
        for tag, sq in [("beck_ov", False), ("beck_ov_asq", True)]:
            golden_ssim_720(tag,
                            spec_for(backdrop=0.925,
                                     fscale=1.0 / math.pi,
                                     alpha_sq=sq),
                            spp=1024, maxdepth=2, localize=True)


if __name__ == "__main__":
    main()
