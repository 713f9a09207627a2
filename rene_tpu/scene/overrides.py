"""Post-flatten scene overrides (`--scene-overrides FILE`).

A JSON file patches specific flattened TLAS instances without editing the
scene sources — a diagnostic/compat layer. Motivating case
(VALIDATION.md, veach forensics): the shipped pbrt ports of the Bitterli
scenes measurably diverge from the Tungsten originals that produced the
goldens (different backdrop albedo, different plate response); an
override file expresses the hypothesized Tungsten-compatible scene so
the divergence analysis can be *demonstrated* with one render instead of
argued from per-surface tables.

Schema::

    {
      "instances": [
        {"index": 4,                       # tlas order (0-based)
         "matte_kd": [0.93, 0.93, 0.93]},  # replace material: matte
        {"index": 0,
         "metal": {"eta": [...], "k": [...],
                   "uroughness": 0.01, "vroughness": 0.01,
                   "remap": false,
                   "alpha_from_roughness": "square",
                   "fresnel_scale": [0.318, 0.318, 0.318]}},
        {"index": 7, "emission_scale": 0.5}  # scale an area light
      ]
    }

``alpha_from_roughness: "square"`` encodes Tungsten's perceptual
convention (alpha = roughness^2) by squaring before storing, with remap
forced off. Indices refer to the flattened instance order (Shape
directives, instancing replays included).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Union

import numpy as np

from . import types as T
from .flatten import FlatScene


def apply_overrides(scene: FlatScene, spec: Union[str, dict]) -> FlatScene:
    """Apply an override spec (path or dict) to a FlatScene in place."""
    if isinstance(spec, str):
        with open(spec) as f:
            spec = json.load(f)
    for ov in spec.get("instances", []):
        idx = int(ov["index"])
        if not 0 <= idx < len(scene.tlas):
            raise ValueError(
                f"override index {idx} out of range "
                f"(scene has {len(scene.tlas)} instances)")
        inst = scene.tlas[idx]
        if "matte_kd" in ov:
            ti = scene._push_texture(
                T.TEX_SOLID, [0, 0, 0, 0],
                [float(c) for c in ov["matte_kd"]][:3] + [0.0])
            mi = scene._push_material(T.MAT_MATTE, u0=[ti, 0, 0, 0])
            scene.tlas[idx] = dataclasses.replace(inst, material_index=mi)
        elif "metal" in ov:
            m = ov["metal"]
            ru = float(m.get("uroughness", 0.1))
            rv = float(m.get("vroughness", ru))
            if m.get("alpha_from_roughness") == "square":
                ru, rv = ru * ru, rv * rv
            te = scene._push_texture(
                T.TEX_SOLID, [0, 0, 0, 0],
                [float(c) for c in m["eta"]][:3] + [0.0])
            tk = scene._push_texture(
                T.TEX_SOLID, [0, 0, 0, 0],
                [float(c) for c in m["k"]][:3] + [0.0])
            tu = scene._push_texture(T.TEX_SOLID, [0, 0, 0, 0],
                                     [ru, ru, ru, 0.0])
            tv = scene._push_texture(T.TEX_SOLID, [0, 0, 0, 0],
                                     [rv, rv, rv, 0.0])
            fs = m.get("fresnel_scale")
            v0 = ([float(c) for c in fs][:3] + [0.0]) if fs \
                else (0.0, 0.0, 0.0, 0.0)
            mi = scene._push_material(
                T.MAT_METAL, u0=[te, tk, tu, tv],
                u1=[1 if m.get("remap", False) else 0, 0, 0, 0],
                v0=v0)
            scene.tlas[idx] = dataclasses.replace(inst, material_index=mi)
        if "emission_scale" in ov:
            ai = scene.tlas[idx].area_light_index
            if ai and scene.area_type[ai] != T.AREA_NULL:
                # clone the row (other instances may share it)
                scene.area_type.append(scene.area_type[ai])
                scene.area_color.append(
                    np.asarray(scene.area_color[ai], np.float32)
                    * float(ov["emission_scale"]))
                scene.tlas[idx] = dataclasses.replace(
                    scene.tlas[idx],
                    area_light_index=len(scene.area_type) - 1)
    return scene
