"""Summarize the round-4 on-chip session logs into one table.

The autofire chain (/tmp/tpu_autofire.py) writes /tmp/bench_r4.log,
/tmp/r4a.log, /tmp/r4b.log, /tmp/r4c.log, /tmp/quality_r4.log as the
TPU returns. This pulls every headline line (best s/spp, marginal,
init timings, SSIM, bench JSON) so the numbers can be transcribed into
VALIDATION.md quickly and defaults flipped with evidence.

Usage: python scripts/harvest_r4_logs.py
"""
import os
import re

LOGS = ["/tmp/bench_r4.log", "/tmp/r4a.log", "/tmp/r4b.log",
        "/tmp/r4c.log", "/tmp/quality_r4.log"]
PATS = [
    re.compile(r'^\{.*"metric"'),            # bench JSON lines
    re.compile(r"best( marginal)? [0-9.]+ s/spp"),
    re.compile(r"init_state best"),
    re.compile(r"SSIM|ssim"),
    re.compile(r"^\[(\w+)\] (done|FAILED)"),
    re.compile(r"compile\+1st"),
    re.compile(r"step\d.*ms|profile"),
    re.compile(r"^=====|platform:"),
]


def main():
    for path in LOGS:
        print(f"\n########## {path}")
        if not os.path.exists(path):
            print("  (missing)")
            continue
        with open(path, errors="replace") as f:
            for ln in f:
                ln = ln.rstrip()
                if any(p.search(ln) for p in PATS):
                    print(" ", ln)


if __name__ == "__main__":
    main()
