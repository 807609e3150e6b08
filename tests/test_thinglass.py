"""Thin-glass parity: matching materials stop blocking rays/shadows.

Reference semantics (SURVEY §2.3, src/scene.cpp MakeThinglassSet +
src/scene_intersect.cpp WithThinglass traversals): materials whose
name contains any configured phrase are skipped by traversal; the tint
filter is disabled in the reference's live code, so pass-through is
the complete behavior.
"""

import json

import numpy as np

from rgk_tpu.integrator.path import render_image_round
from rgk_tpu.scene.config import build_scene, load_config


def _cfg(thinglass):
    return {
        "output-file": "t.exr", "output-width": 8, "output-height": 8,
        "multisample": 8, "recursion-max": 1, "russian": -1.0,
        "camera": {"position": [0, 2, 0.001], "lookat": [0, 0, 0],
                   "fov": 40},
        "thinglass": thinglass,
        "materials": [
            {"name": "floor", "brdf": "diffuse", "diffuse": [0.5, 0.5, 0.5]},
            {"name": "pane_glass", "brdf": "diffuse",
             "diffuse": [0.1, 0.1, 0.1]},
        ],
        "scene": [
            {"primitive": "plane", "axis": "Y", "scale": [5, 1, 5],
             "material": "floor"},
            # A pane between light and floor, and between camera & floor
            {"primitive": "plane", "axis": "Y", "translate": [0, 1, 0],
             "scale": [5, 1, 5], "material": "pane_glass"},
        ],
        "lights": [{"position": [0, 3, 0], "color": [1, 1, 1],
                    "intensity": 2.0}],
    }


def _render(tmp_path, cfg_dict, name):
    p = tmp_path / name
    p.write_text(json.dumps(cfg_dict))
    cfg = load_config(str(p))
    arrays, meta, _ = build_scene(cfg, build_bvh=False)
    cam = cfg.get_camera()
    rad, counts, _ = render_image_round(arrays, meta, cfg.settings, cam, 0)
    return np.asarray(rad) / np.asarray(counts)[..., None]


def test_thinglass_passthrough(tmp_path):
    blocked = _render(tmp_path, _cfg([]), "blocked.json")
    passed = _render(tmp_path, _cfg(["glass"]), "passed.json")

    # Without thin-glass the camera sees the dark pane (almost black
    # floor term); with it, the pane vanishes and the lit floor shows.
    expected_floor = 2.0 * (0.5 / np.pi) / 9.0
    c_passed = passed[4, 4].mean()
    c_blocked = blocked[4, 4].mean()
    assert abs(c_passed - expected_floor) / expected_floor < 0.1
    assert c_blocked < c_passed * 0.8  # pane shadows + dark albedo


def test_thinglass_meta_flag(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(_cfg(["glass"])))
    cfg = load_config(str(p))
    arrays, meta, _ = build_scene(cfg, build_bvh=False)
    assert meta.has_thinglass
    pack = np.asarray(arrays.tri_pack)
    assert pack.shape[1] == 13
    assert pack[:, 12].sum() == 2  # the 2 pane triangles
