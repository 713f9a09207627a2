"""Film checkpoint/resume: npz snapshots of the accumulation buffers.

The reference keeps its film in VRAM only — a crash loses every sample
(SURVEY.md §5). Here the host-side film is snapshotted every log batch and
`--resume` continues from the last snapshot.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def save_checkpoint(path: str, accum: dict, samples_done: int) -> None:
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, samples_done=samples_done, **accum)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[Tuple[dict, int]]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        accum = {k: z[k] for k in ("radiance", "normal", "albedo")}
        return accum, int(z["samples_done"])
